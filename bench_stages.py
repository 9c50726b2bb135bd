"""Per-stage microbenchmark of the SSB RX chain at bench shapes.

Times each pipeline stage in isolation (jitted, state donated) so the
optimization target is visible.  Not part of the driver contract —
`bench.py` is; this is the profiling harness (SURVEY §5 "tracing/
profiling" role, the analog of the reference's DWT cycle counters around
chain sections, `misc/profiling.c`).

Usage:  python bench_stages.py  [CHANNELS] [BLOCK]
"""
from __future__ import annotations

import functools
import sys
import time

import numpy as np


def timeit(fn, args, steps=10):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    # rebuild donated args each timing run is unfair; instead alternate two
    # state copies? keep it simple: no donation in stage timings.
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / steps


def main():
    import jax
    import jax.numpy as jnp

    from uhsdr_tpu.chain import rx, eq as eq_mod
    from uhsdr_tpu.demod import ssb as ssb_mod
    from uhsdr_tpu.ops import agc as agc_mod, fir, iir, nco

    C = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 16384

    cfg = rx.RxConfig(mode="usb", bw_key="2P3KHZ", path_name="LPF",
                      translate_hz=6000.0, block_len=T)
    params = rx.make_params(cfg)
    state = rx.init_state(cfg, params, (C,))
    decim = cfg.decim
    Td = T // decim

    rng = np.random.default_rng(0)
    i_np = rng.standard_normal((C, T)).astype(np.float32) * 0.1
    q_np = rng.standard_normal((C, T)).astype(np.float32) * 0.1
    ad_np = rng.standard_normal((C, Td)).astype(np.float32) * 100.0
    i_plane = jax.device_put(i_np)
    q_plane = jax.device_put(q_np)
    audio_dec = jax.device_put(ad_np)

    print(f"{C} ch x {T} samples ({C*T/1e6:.1f} Msamples/block)", flush=True)
    full_ms = None

    def report(name, fn, args):
        nonlocal full_ms
        try:
            v = timeit(fn, args)
        except Exception as e:                              # noqa: BLE001
            print(f"  {name:18s} FAIL {type(e).__name__}: {str(e)[:90]}",
                  flush=True)
            return
        gsps = C * T / v / 1e9
        print(f"  {name:18s} {v*1e3:8.3f} ms   {gsps:8.1f} Gsamples/s (IQ-rate)",
              flush=True)
        if name == "full_chain":
            full_ms = v

    # --- full chain (the bench.py number) ---
    @jax.jit
    def full(state, i, q):
        iq = jax.lax.complex(i, q)
        audio, st, _ = rx.process_block(cfg, params, state, iq)
        return audio, st
    report("full_chain", full, (state, i_plane, q_plane))

    # --- NCO mix ---
    @jax.jit
    def nco_stage(phase, i, q):
        z = jax.lax.complex(i, q)
        z, ph = nco.mix(z, phase, jnp.broadcast_to(jnp.asarray(params.nco_delta),
                                                   phase.shape))
        return jnp.real(z), jnp.imag(z), ph
    report("nco_mix", nco_stage, (state.nco_phase, i_plane, q_plane))

    # --- front FIR decimate (fft; dense only at small shapes — the frame
    # gather materializes (C, T/decim, taps)) ---
    h_np = params.front_fir_re + 1j * params.front_fir_im
    carry = state.front_carry

    def front(method):
        @jax.jit
        def f(carry, i, q):
            z = jax.lax.complex(i, q)
            hh = jax.lax.complex(jnp.asarray(params.front_fir_re),
                                 jnp.asarray(params.front_fir_im))
            y, c = fir.fir_decimate_block(hh, carry, z, decim, method=method)
            return jnp.real(y), jnp.imag(y), c
        return f
    report("front_fir_fft", front("fft"), (carry, i_plane, q_plane))
    if C * T <= 2**22:
        report("front_fir_dense", front("time"), (carry, i_plane, q_plane))

    # --- pallas front ---
    try:
        from uhsdr_tpu.pallas import fir as pallas_fir

        @jax.jit
        def front_pl(carry, i, q):
            z = jax.lax.complex(i, q)
            y, c = pallas_fir.fir_decimate_pallas(h_np, carry, z, decim,
                                                  tile_c=128, tile_t=512)
            return jnp.real(y), jnp.imag(y), c
        report("front_fir_pallas", front_pl, (carry, i_plane, q_plane))
    except Exception as e:                                  # noqa: BLE001
        print(f"  front_fir_pallas   FAIL {type(e).__name__}", flush=True)

    # --- audio bandpass SOS ---
    @jax.jit
    def sos_stage(st, a):
        return iir.biquad_cascade_block(jnp.asarray(params.audio_sos), st, a)
    report("audio_sos", sos_stage, (state.audio_sos_state, audio_dec))

    # --- AGC ---
    @jax.jit
    def agc_stage(st, a):
        return agc_mod.run(params.agc, st, a)
    report("agc", agc_stage, (state.agc, audio_dec))

    # --- EQ biquads (eq1 at dec rate) ---
    @jax.jit
    def eq1_stage(st, a):
        return iir.biquad_cascade_block(jnp.asarray(params.eq1_sos), st, a)
    report("eq1", eq1_stage, (state.eq1, audio_dec))

    # --- interpolation + eq2 at 48k ---
    @jax.jit
    def interp_stage(c, a):
        return fir.fir_interpolate_block(jnp.asarray(params.interp_fir), c, a,
                                         decim)
    report("interp", interp_stage, (state.interp_carry, audio_dec))

    audio48 = jax.device_put(rng.standard_normal((C, T)).astype(np.float32))

    @jax.jit
    def eq2_stage(st, a):
        return iir.biquad_cascade_block(jnp.asarray(params.eq2_sos), st, a)
    report("eq2_48k", eq2_stage, (state.eq2, audio48))


if __name__ == "__main__":
    main()
