"""TX chain benchmark — audio in -> SSB-modulated IQ out
(voice bandpass + compressor/ALC + analytic filter + translate), the
`TxProcessor_Run` hot path at fleet scale.

Prints one JSON line.  Usage: python bench_tx.py [CHANNELS] [BLOCK]
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

REF_MSAMPLES_PER_CHIP = 0.048


def main() -> None:
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from uhsdr_tpu.chain import tx

    channels = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    block = int(sys.argv[2]) if len(sys.argv) > 2 else 16384
    steps = int(os.environ.get("BENCH_STEPS", "4"))

    cfg = tx.TxConfig(mode="usb", translate_hz=6000.0, block_len=block)
    params = tx.make_params(cfg)

    # BARRIER-VERIFIED (see bench.py docstring): state created inside jit,
    # each timing ends with a fetched f32 reduction — block_until_ready is
    # not an execution barrier on the axon relay.
    anchor = jax.device_put(np.zeros((), np.float32))
    state = jax.jit(lambda d: tx.init_state(cfg, params, (channels,)))(anchor)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state, audio):
        iq, st, _ = tx.process_block(cfg, params, state, audio)
        return jnp.real(iq), jnp.imag(iq), st

    probe = jax.jit(lambda a: jnp.mean(jnp.abs(a)) * jnp.ones((4,),
                                                              jnp.float32))

    rng = np.random.default_rng(0)
    audio = jax.device_put(
        rng.standard_normal((channels, block)).astype(np.float32) * 0.3)

    i_p, q_p, state = step(state, audio)
    np.asarray(probe(i_p))
    t0 = time.perf_counter()
    for _ in range(steps):
        i_p, q_p, state = step(state, audio)
    checksum = float(np.asarray(probe(i_p))[0])
    dt = time.perf_counter() - t0
    assert np.isfinite(checksum)

    msamps = channels * block * steps / dt / 1e6
    print(json.dumps({
        "metric": f"audio Msamples/s/chip, full SSB TX chain "
                  f"({channels} ch x {block} blk)",
        "value": round(msamps, 1),
        "unit": "Msamples/s/chip",
        "vs_baseline": round(msamps / REF_MSAMPLES_PER_CHIP, 1),
    }))


if __name__ == "__main__":
    main()
