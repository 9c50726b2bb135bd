"""FM on-TPU conformance bisect (VERDICT r4 #5): per-stage TPU-vs-CPU
SNR through the FM chain, so the 21 dB full-chain drop is attributed to
a named stage instead of "somewhere in the kernels".

Stages tapped (cumulative divergence — the stage where the SNR falls
hardest below its input's SNR is the guilty one):
  front   — the 89-tap lowpass Pallas front kernel output (NCO fused)
  disc    — the discriminator angle (fm_disc_pallas poly-atan2 on TPU)
  audio   — after de-emphasis + HPF one-poles (blocked-matmul path)
  final   — full chain output (squelch gate, FM_RX_SCALING, biquad2)

Usage:  python tools/fm_bisect.py [--front-prec default|highest]
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

import numpy as np

_CHILD = r'''
import sys
if sys.argv[3] == "cpu":
    import jax
    jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax, jax.numpy as jnp
from uhsdr_tpu.chain import rx
from uhsdr_tpu.demod import fm as fm_mod
from uhsdr_tpu.ops import iir

prec = sys.argv[4]
C, T = 1024, 4096
cfg = rx.RxConfig(mode="fm", bw_key="5P0KHZ", translate_hz=6000.0,
                  block_len=T, front_prec=prec)
params = rx.make_params(cfg)
rng = np.random.default_rng(42)
t = np.arange(3 * T) / 48000.0
msg = np.sin(2 * np.pi * 900.0 * t)
phase = (2 * np.pi * 6000.0 * t
         + 2 * np.pi * 2500.0 * np.cumsum(msg) / 48000.0)
sig = 0.4 * np.exp(1j * phase)
sig = sig + 0.01 * (rng.standard_normal(3 * T)
                    + 1j * rng.standard_normal(3 * T))
sig = np.tile(sig, (C, 1)).astype(np.complex64)

anchor = jax.device_put(np.zeros((), np.float32))
state = jax.jit(lambda d: rx.init_state(cfg, params, (C,)))(anchor)


@jax.jit
def step(state, i, q):
    iq = jax.lax.complex(i, q)
    zf, st, _ = rx.process_front(cfg, params, state, iq)

    # tap the discriminator + one-pole internals (mirrors fm_mod.demod)
    fmst = st.fm
    use_disc_pk = (jax.default_backend() != "cpu" and zf.ndim == 2
                   and zf.shape[0] % 128 == 0 and zf.shape[-1] % 512 == 0)
    if use_disc_pk:
        from uhsdr_tpu.pallas import elemwise
        prev_col = jnp.stack([jnp.real(fmst.z_prev),
                              jnp.imag(fmst.z_prev)], axis=-1)
        angle = elemwise.fm_disc_pallas(prev_col, jnp.real(zf),
                                        jnp.imag(zf), tile_c=256,
                                        tile_t=1024)
    else:
        z_d = jnp.concatenate([fmst.z_prev[..., None], zf[..., :-1]],
                              axis=-1)
        prod = jnp.conj(z_d) * zf
        angle = jnp.arctan2(jnp.imag(prod), jnp.real(prod))
    al, ah = fm_mod.LPF_ALPHA, fm_mod.HPF_ALPHA
    deemph, _ = iir.one_pole_block(1.0 - al, al, fmst.lpf, angle)
    a_d = jnp.concatenate([fmst.hpf_a[..., None], deemph[..., :-1]],
                          axis=-1)
    audio_hp, _ = iir.one_pole_block(ah, ah, fmst.hpf_b, deemph - a_d)

    # the real chain continuation (state must advance through the
    # actual demod so later blocks stay on-contract)
    final, st2, _ = rx.demod_and_post(cfg, params, st, zf)
    return (jnp.real(zf), jnp.imag(zf), angle, audio_hp, final), st2


outs = {k: [] for k in ("fr", "fi", "disc", "audio", "final")}
for b in range(3):
    blk = sig[:, b * T:(b + 1) * T]
    (fr, fi, ang, ah, fin), state = step(
        state, jnp.asarray(blk.real.copy()), jnp.asarray(blk.imag.copy()))
    for k, v in zip(("fr", "fi", "disc", "audio", "final"),
                    (fr, fi, ang, ah, fin)):
        outs[k].append(np.asarray(jax.device_get(v))[:2])
np.savez(sys.argv[1],
         **{k: np.concatenate(v, axis=-1) for k, v in outs.items()})
'''


def snr(a, b):
    a = np.asarray(a)[..., 4096:].astype(np.complex128)
    b = np.asarray(b)[..., 4096:].astype(np.complex128)
    err = np.sum(np.abs(a - b) ** 2)
    return 10 * np.log10(np.sum(np.abs(b) ** 2) / max(err, 1e-30))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--front-prec", default="default")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + ":" + env.get("PYTHONPATH", "")
    rows = {}
    with tempfile.TemporaryDirectory() as td:
        script = os.path.join(td, "child.py")
        with open(script, "w") as f:
            f.write(_CHILD)
        outs = {}
        for plat in ("tpu", "cpu"):
            path = os.path.join(td, f"fm_{plat}.npz")
            r = subprocess.run(
                [sys.executable, script, path, "fm", plat,
                 args.front_prec],
                env=env, cwd=repo, capture_output=True, text=True,
                timeout=1800)
            if r.returncode:
                print(f"fm/{plat} FAILED:\n{r.stderr[-2000:]}")
                sys.exit(1)
            outs[plat] = np.load(path)
        a, b = outs["tpu"], outs["cpu"]
        front = snr(a["fr"] + 1j * a["fi"], b["fr"] + 1j * b["fi"])
        rows = {
            "front_prec": args.front_prec,
            "front_db": round(front, 1),
            "disc_db": round(snr(a["disc"], b["disc"]), 1),
            "audio_db": round(snr(a["audio"], b["audio"]), 1),
            "final_db": round(snr(a["final"], b["final"]), 1),
        }
    print(json.dumps(rows))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
