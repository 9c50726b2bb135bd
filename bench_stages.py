"""Per-stage microbenchmark of the SSB RX chain at bench shapes —
BARRIER-VERIFIED (see bench.py docstring: block_until_ready is not an
execution barrier on the axon relay; every timing here ends with a
fetched f32 reduction, and all chain state is created inside jit).

Not part of the driver contract — `bench.py` is; this is the profiling
harness (SURVEY §5 "tracing/profiling" role).

Usage:  python bench_stages.py  [CHANNELS] [BLOCK]
"""
from __future__ import annotations

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from uhsdr_tpu.chain import rx
    from uhsdr_tpu.demod import ssb as ssb_mod
    from uhsdr_tpu.ops import agc as agc_mod, fir, iir, nco

    C = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 16384

    cfg = rx.RxConfig(mode="usb", bw_key="2P3KHZ", path_name="LPF",
                      translate_hz=6000.0, block_len=T)
    params = rx.make_params(cfg)
    decim = cfg.decim
    Td = T // decim

    rng = np.random.default_rng(0)
    i_p = jax.device_put(rng.standard_normal((C, T)).astype(np.float32) * 0.1)
    q_p = jax.device_put(rng.standard_normal((C, T)).astype(np.float32) * 0.1)
    ad = jax.device_put((rng.standard_normal((C, Td)) * 100).astype(np.float32))
    a48 = jax.device_put(rng.standard_normal((C, T)).astype(np.float32))
    probe = jax.jit(lambda a: jnp.mean(jnp.abs(a)) * jnp.ones((4,),
                                                              jnp.float32))
    anchor = jax.device_put(np.zeros((), np.float32))

    print(f"{C} ch x {T} samples ({C*T/1e6:.1f} Msamples/block), "
          "barrier-verified", flush=True)

    def bench(tag, fn, args, reps=3):
        try:
            out = fn(*args)
            np.asarray(probe(out))
            t0 = time.perf_counter()
            for _ in range(reps):
                out = fn(*args)
            np.asarray(probe(out))
            dt = (time.perf_counter() - t0) / reps
            gsps = C * T / dt / 1e9
            print(f"  {tag:18s} {dt*1e3:9.2f} ms   {gsps:7.2f} Gs/s (IQ-rate)",
                  flush=True)
        except Exception as e:                          # noqa: BLE001
            print(f"  {tag:18s} FAIL {type(e).__name__}: {str(e)[:70]}",
                  flush=True)

    # full chain
    mkstate = jax.jit(lambda d: rx.init_state(cfg, params, (C,)))

    @jax.jit
    def f_full(state, i, q):
        iq = jax.lax.complex(i, q)
        audio, st, _ = rx.process_block(cfg, params, state, iq)
        return audio
    bench("full_chain", f_full, (mkstate(anchor), i_p, q_p))

    @jax.jit
    def f_nco(i, q):
        z = jax.lax.complex(i, q)
        ph = jnp.zeros(z.shape[:-1], jnp.uint32)
        z2, _ = nco.mix(z, ph, jnp.broadcast_to(
            jnp.asarray(params.nco_delta), ph.shape))
        return jnp.abs(z2)
    bench("nco_mix [XLA baseline; chain fuses NCO into the front kernel]",
          f_nco, (i_p, q_p))

    taps = params.front_fir_re.shape[-1]

    def front(method):
        @jax.jit
        def f(i, q):
            z = jax.lax.complex(i, q)
            h = jax.lax.complex(jnp.asarray(params.front_fir_re),
                                jnp.asarray(params.front_fir_im))
            carry = jax.lax.complex(jnp.zeros((C, taps - 1), jnp.float32),
                                    jnp.zeros((C, taps - 1), jnp.float32))
            zf, _ = fir.fir_decimate_block(h, carry, z, decim, method=method)
            return jnp.abs(zf)
        return f
    bench("front_fir_fft [XLA baseline; chain uses pallas]", front("fft"), (i_p, q_p))

    @jax.jit
    def f_sos(a):
        st = jnp.zeros((params.audio_sos.shape[0], C, 2), jnp.float32)
        y, _ = iir.biquad_cascade_block(jnp.asarray(params.audio_sos), st, a)
        return y
    bench("audio_sos(dec) [XLA baseline; chain uses pallas]", f_sos, (ad,))

    @jax.jit
    def f_agc(a):
        y, _ = agc_mod.run(params.agc,
                           agc_mod.init_state((C,), params.agc), a)
        return y
    bench("agc(dec) [fully-fused pallas kernel v3]", f_agc, (ad,))

    @jax.jit
    def f_interp(a):
        c = jnp.zeros((C, -(-params.interp_fir.shape[-1] // decim) - 1),
                      jnp.float32)
        y, _ = fir.fir_interpolate_block(jnp.asarray(params.interp_fir), c,
                                         a, decim)
        return y
    bench("interp [XLA baseline; chain uses pallas]", f_interp, (ad,))

    @jax.jit
    def f_eq2(a):
        # neutral settings prune eq2 to an empty cascade in the chain;
        # bench a representative 1-section treble shelf at 48k instead
        from uhsdr_tpu.ops import design as _design
        sos = _design.biquad_high_shelf(3500.0, 0.7, 6.0, 48000.0)[None]
        st = jnp.zeros((1, C, 2), jnp.float32)
        y, _ = iir.biquad_cascade_block(jnp.asarray(sos.astype(np.float32)),
                                        st, a)
        return y
    bench("eq2(48k, 1 section) [XLA baseline; chain uses pallas, pruned "
          "when neutral]", f_eq2, (a48,))


if __name__ == "__main__":
    main()
