"""Single-chip A/B: sharded-step kernel path vs the single-device chain.

VERDICT round-1 item 3 evidence: on a 1x1 mesh the sharded pipeline
(halo-split front + Pallas body kernel + demod_and_post) must match the
single-device Pallas chain throughput within ~10% — proving the sharded
data path carries kernel-quality compute, not the XLA FFT fallback.

Prints one JSON line with both rates and the ratio.  Same axon barrier
discipline as bench.py (state inside jit, fetch-probe as barrier).
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

def main() -> None:
    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from uhsdr_tpu.chain import rx
    from uhsdr_tpu.parallel import rx_sharded

    channels = int(os.environ.get("BENCH_CHANNELS", "8192"))
    block = int(os.environ.get("BENCH_BLOCK", "16384"))
    steps = int(os.environ.get("BENCH_STEPS", "8"))
    iq_rate = float(os.environ.get("BENCH_IQ_RATE", "96000"))

    cfg = rx.RxConfig(mode="usb", bw_key="2P3KHZ", path_name="LPF",
                      translate_hz=12000.0, block_len=block,
                      iq_rate=iq_rate)
    params = rx.make_params(cfg)
    taps = params.front_fir_re.shape[-1]

    anchor = jax.device_put(np.zeros((), np.float32))
    probe = jax.jit(lambda a: jnp.mean(jnp.abs(a)) * jnp.ones((4,),
                                                             jnp.float32))
    rng = np.random.default_rng(0)
    i_np = rng.standard_normal((channels, block)).astype(np.float32) * 0.1
    q_np = rng.standard_normal((channels, block)).astype(np.float32) * 0.1

    def timed(step_fn, mkstate_fn, i_plane, q_plane):
        state = mkstate_fn(anchor)
        for _ in range(2):                            # compile + settle
            audio, state = step_fn(state, i_plane, q_plane)
            np.asarray(probe(audio))
        t0 = time.perf_counter()
        for _ in range(steps):
            audio, state = step_fn(state, i_plane, q_plane)
        checksum = float(np.asarray(probe(audio))[0])
        dt = time.perf_counter() - t0
        assert np.isfinite(checksum)
        return channels * block * steps / dt / 1e6

    # ---- A: single-device chain ----
    mk_a = jax.jit(lambda d: rx.init_state(cfg, params, (channels,)))

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step_a(state, i_plane, q_plane):
        iq = jax.lax.complex(i_plane, q_plane)
        audio, new_state, _ = rx.process_block(cfg, params, state, iq)
        return audio, new_state

    i_plane = jax.device_put(i_np)
    q_plane = jax.device_put(q_np)
    rate_a = timed(step_a, mk_a, i_plane, q_plane)

    # ---- B: sharded step on a 1x1 mesh (same chip, same kernels,
    # plus the halo edge/body machinery) ----
    mesh = jax.sharding.Mesh(
        np.array(jax.devices()[:1]).reshape(1, 1), ("dp", "sp"))
    step_b, _ = rx_sharded.make_sharded_rx(cfg, mesh)

    def _mk_b(_):
        st = rx.init_state(cfg, params, (channels,))
        return st._replace(front_carry=jnp.zeros(
            (channels, 2, taps - 1), jnp.float32))

    mk_b = jax.jit(_mk_b)
    rate_b = timed(step_b, mk_b, i_plane, q_plane)

    print(json.dumps({
        "metric": "sharded-step vs single-device chain, "
                  f"{channels}ch x {block} @{int(iq_rate)} Hz, 1x1 mesh",
        "single_device_msamps": round(rate_a, 1),
        "sharded_step_msamps": round(rate_b, 1),
        "ratio": round(rate_b / rate_a, 4),
        "unit": "Msamples/s/chip",
    }))


if __name__ == "__main__":
    main()
