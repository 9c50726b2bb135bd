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

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from uhsdr_tpu.chain import tx

    channels = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    block = int(sys.argv[2]) if len(sys.argv) > 2 else 16384
    steps = int(os.environ.get("BENCH_STEPS", "3"))
    inner = int(os.environ.get("BENCH_INNER", "8"))

    cfg = tx.TxConfig(mode="usb", translate_hz=6000.0, block_len=block)
    params = tx.make_params(cfg)

    # BARRIER-VERIFIED (see bench.py docstring): state created inside jit,
    # each timing ends with a fetched f32 reduction — block_until_ready is
    # not an execution barrier on the axon relay.
    anchor = jax.device_put(np.zeros((), np.float32))
    state = jax.jit(lambda d: tx.init_state(cfg, params, (channels,)))(anchor)

    # BENCH_INNER chained blocks per dispatch (state threads block to
    # block, per-block |IQ| reduction kept live in the carry) — amortizes
    # the ~2.3 ms/dispatch relay overhead, see bench.py docstring.
    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state, audio):
        def body(_, carry):
            st, acc = carry
            iq, st2, _ = tx.process_block(cfg, params, st, audio)
            return st2, acc + jnp.mean(jnp.abs(jnp.real(iq)))

        st2, acc = jax.lax.fori_loop(0, inner, body,
                                     (state, jnp.float32(0.0)))
        return acc, st2

    probe = jax.jit(lambda a: jnp.mean(jnp.abs(a)) * jnp.ones((4,),
                                                              jnp.float32))

    rng = np.random.default_rng(0)
    audio = jax.device_put(
        rng.standard_normal((channels, block)).astype(np.float32) * 0.3)

    acc, state = step(state, audio)
    np.asarray(probe(acc))
    t0 = time.perf_counter()
    for _ in range(steps):
        acc, state = step(state, audio)
    checksum = float(np.asarray(probe(acc))[0])
    dt = time.perf_counter() - t0
    assert np.isfinite(checksum)

    msamps = channels * block * steps * inner / dt / 1e6
    print(json.dumps({
        "metric": f"audio Msamples/s/chip, full SSB TX chain "
                  f"({channels} ch x {block} blk)",
        "value": round(msamps, 1),
        "unit": "Msamples/s/chip",
        "vs_baseline": round(msamps / REF_MSAMPLES_PER_CHIP, 1),
    }))


if __name__ == "__main__":
    main()
