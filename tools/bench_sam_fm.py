"""Stage-level profile of the SAM and FM chains at fleet shapes —
the two stragglers in the mixed-mode fleet (PARITY: SAM 47.6 ms / FM
43 ms vs USB 17.3 at 8192ch x 16k).  Barrier-verified like bench.py.

Usage: python tools/bench_sam_fm.py [CHANNELS] [BLOCK]
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from uhsdr_tpu.chain import rx
    from uhsdr_tpu.demod import am as am_mod
    from uhsdr_tpu.demod import fm as fm_mod
    from uhsdr_tpu.demod import sam as sam_mod
    from uhsdr_tpu.ops import agc as agc_mod

    C = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 16384

    probe = jax.jit(lambda a: jnp.mean(jnp.abs(a)) * jnp.ones((4,),
                                                             jnp.float32))
    anchor = jax.device_put(np.zeros((), np.float32))
    rng = np.random.default_rng(0)

    def bench(tag, fn, args, reps=3):
        out = fn(*args)
        out0 = out[0] if isinstance(out, tuple) else out
        np.asarray(probe(out0))
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        out0 = out[0] if isinstance(out, tuple) else out
        np.asarray(probe(out0))
        dt = (time.perf_counter() - t0) / reps
        print(f"  {tag:26s} {dt*1e3:8.2f} ms", flush=True)
        return dt

    # ---- whole chains ----
    i_p = jax.device_put(rng.standard_normal((C, T)).astype(np.float32) * .1)
    q_p = jax.device_put(rng.standard_normal((C, T)).astype(np.float32) * .1)
    for mode, bw, path in [("usb", "2P3KHZ", "LPF"),
                           ("am", "5P0KHZ", "AM/SAM"),
                           ("sam", "5P0KHZ", "AM/SAM"),
                           ("fm", "5P0KHZ", "FM")]:
        cfg = rx.RxConfig(mode=mode, bw_key=bw, path_name=path,
                          translate_hz=6000.0, block_len=T)
        params = rx.make_params(cfg)
        state = jax.jit(lambda d, cfg=cfg, params=params:
                        rx.init_state(cfg, params, (C,)))(anchor)

        @jax.jit
        def step(st, i, q, cfg=cfg, params=params):
            a, st2, _ = rx.process_block(cfg, params, st, jax.lax.complex(i, q))
            return a

        bench(f"chain {mode}", step, (state, i_p, q_p))

    # ---- SAM stages (decimated rate) ----
    print("SAM stages @ decimated rate:", flush=True)
    Td = T // 4
    sparams = sam_mod.make_params(12000.0)
    zr = jax.device_put(rng.standard_normal((C, Td)).astype(np.float32))
    zi = jax.device_put(rng.standard_normal((C, Td)).astype(np.float32))
    sstate = jax.jit(lambda d: sam_mod.init_state((C,)))(anchor)

    @jax.jit
    def sam_demod_full(st, a, b):
        audio, _, st2 = sam_mod.demod(sparams, st, jax.lax.complex(a, b))
        return audio

    bench("sam.demod (both)", sam_demod_full, (sstate, zr, zi))

    from uhsdr_tpu.pallas import pll as pallas_pll

    @jax.jit
    def pll_only(st, a, b):
        carry = jnp.stack([st.phs, st.fil_out, st.omega2], axis=0)
        cos_p, sin_p, _ = pallas_pll.pll_pallas(
            float(sparams.g1), float(sparams.g2), float(sparams.omega_min),
            float(sparams.omega_max), carry, jax.lax.complex(a, b))
        return cos_p

    bench("pll kernel only", pll_only, (sstate, zr, zi))

    @jax.jit
    def fade_only(a):
        st = am_mod  # noqa
        from uhsdr_tpu.ops import iir
        y, _ = iir.one_pole_block(
            np.float32(np.exp(-1.0 / (12000.0 * 0.02))),
            np.float32(1.0 - np.exp(-1.0 / (12000.0 * 0.02))),
            jnp.zeros((C,), jnp.float32), a)
        return a - y

    bench("fade leveler", fade_only, (zr,))

    # ---- FM stages (48 kHz full rate) ----
    print("FM stages @48k:", flush=True)
    fparams = fm_mod.make_params(48000.0)
    fstate = jax.jit(lambda d: fm_mod.init_state((C,), fparams))(anchor)

    @jax.jit
    def fm_demod_full(st, a, b):
        audio, st2 = fm_mod.demod(fparams, st, jax.lax.complex(a, b))
        return audio

    bench("fm.demod whole", fm_demod_full, (fstate, i_p, q_p))

    @jax.jit
    def disc_only(a, b):
        z = jax.lax.complex(a, b)
        zprev = jnp.concatenate([z[..., :1], z[..., :-1]], axis=-1)
        return jnp.angle(jnp.conj(zprev) * z)

    bench("discriminator (angle)", disc_only, (i_p, q_p))

    aparams = agc_mod.make_params(48000.0, mode="med", thresh_db=60.0)

    @jax.jit
    def agc48(a):
        y, _ = agc_mod.run(aparams, agc_mod.init_state((C,), aparams), a)
        return y

    bench("AGC @48k", agc48, (i_p,))


if __name__ == "__main__":
    main()
