"""TPU-vs-CPU full-chain conformance: runs the same RX chain on the real
TPU (all Pallas kernels engaged) and on the XLA:CPU backend, and reports
the SNR of the difference against the 40 dB bound (BASELINE correctness
criterion; the CPU chain is itself validated against the NumPy golden
port in tests/golden/).

Each backend runs in a subprocess because the backend choice is
process-global (the axon sitecustomize pins the TPU; JAX_PLATFORMS alone
does not override it — jax.config.update must run before backend init).

Usage:  python tools/tpu_conformance.py [mode ...]
        (default: usb am sam fm)
"""
from __future__ import annotations

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
assert jax.default_backend() == sys.argv[3], jax.default_backend()
from uhsdr_tpu.chain import rx

mode = sys.argv[2]
C, T = 1024, 4096
cfg = rx.RxConfig(mode=mode, bw_key="5P0KHZ" if mode in ("am", "sam", "fm")
                  else "2P3KHZ",
                  path_name="LPF" if mode == "usb" else None,
                  translate_hz=6000.0, block_len=T)
params = rx.make_params(cfg)
rng = np.random.default_rng(42)
t = np.arange(3 * T) / 48000.0
if mode == "fm":
    msg = np.sin(2 * np.pi * 900.0 * t)
    phase = 2 * np.pi * 6000.0 * t + 2 * np.pi * 2500.0 * np.cumsum(msg) / 48000.0
    sig = 0.4 * np.exp(1j * phase)
elif mode in ("am", "sam"):
    msg = 0.6 * np.sin(2 * np.pi * 800.0 * t)
    sig = 0.3 * (1.0 + msg) * np.exp(2j * np.pi * 6000.0 * t)
else:
    sig = (0.3 * np.exp(2j * np.pi * 6700.0 * t)
           + 0.2 * np.exp(2j * np.pi * 7500.0 * t))
sig = sig + 0.01 * (rng.standard_normal(3 * T) + 1j * rng.standard_normal(3 * T))
sig = np.tile(sig, (C, 1)).astype(np.complex64)

anchor = jax.device_put(np.zeros((), np.float32))
state = jax.jit(lambda d: rx.init_state(cfg, params, (C,)))(anchor)

@jax.jit
def step(state, i, q):
    iq = jax.lax.complex(i, q)
    a, st, _ = rx.process_block(cfg, params, state, iq)
    return a, st

outs = []
for b in range(3):
    blk = sig[:, b * T:(b + 1) * T]
    a, state = step(state, jnp.asarray(blk.real.copy()),
                    jnp.asarray(blk.imag.copy()))
    outs.append(np.asarray(jax.device_get(a))[:2])
np.save(sys.argv[1], np.concatenate(outs, axis=-1))
'''


def main() -> None:
    modes = sys.argv[1:] or ["usb", "am", "sam", "fm"]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + ":" + env.get("PYTHONPATH", "")
    ok = True
    with tempfile.TemporaryDirectory() as td:
        script = os.path.join(td, "child.py")
        with open(script, "w") as f:
            f.write(_CHILD)
        for mode in modes:
            outs = {}
            for plat in ("tpu", "cpu"):
                path = os.path.join(td, f"{mode}_{plat}.npy")
                r = subprocess.run([sys.executable, script, path, mode, plat],
                                   env=env, cwd=repo, capture_output=True,
                                   text=True, timeout=1800)
                if r.returncode:
                    print(f"{mode}/{plat} FAILED:\n{r.stderr[-1500:]}")
                    sys.exit(1)
                outs[plat] = np.load(path)
            a, b = outs["tpu"].astype(np.float64), outs["cpu"].astype(np.float64)
            # skip the first block (filter/AGC/PLL warm-in transients)
            a, b = a[:, 4096:], b[:, 4096:]
            err = np.sum((a - b) ** 2)
            snr = 10 * np.log10(np.sum(b ** 2) / max(err, 1e-30))
            status = "OK" if snr > 40.0 else "FAIL"
            ok &= snr > 40.0
            print(f"{mode:4s}  TPU-vs-CPU SNR {snr:6.1f} dB  (bound 40)  {status}",
                  flush=True)
    sys.exit(0 if ok else 2)


if __name__ == "__main__":
    main()
