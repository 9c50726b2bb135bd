"""Build + run the reference OFDM golden-vector generator
(`tools/gen_ofdm_ref.c`, compiled against `/root/reference`'s own
`drivers/freedv/ofdm.c`) and pack the result into
`uhsdr_tpu/data/ofdm_ref.npz`:

  bits  (30, 238) int8   — payload bits fed to the reference ofdm_mod
  tx    (30*1280,) c64   — the reference modulator's output samples

Interop oracle for `modems/ofdm.py` (see test_freedv_interop.py).
"""
from __future__ import annotations

import os
import subprocess
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference/mchf-eclipse/drivers/freedv"


def main() -> None:
    srcs = ["ofdm.c", "codec2_fft.c", "kiss_fft.c", "kiss_fftr.c",
            "mpdecode_core.c", "phi0.c", "filter.c"]
    with tempfile.TemporaryDirectory() as td:
        exe = os.path.join(td, "gen")
        subprocess.run(
            ["gcc", "-O2", f"-I{REF}", "-o", exe,
             os.path.join(REPO, "tools", "gen_ofdm_ref.c")]
            + [os.path.join(REF, s) for s in srcs] + ["-lm"],
            check=True)
        subprocess.run([exe], cwd=td, check=True)
        bits = np.fromfile(os.path.join(td, "bits.i32"),
                           np.int32).reshape(30, 238).astype(np.int8)
        tx = np.fromfile(os.path.join(td, "tx.c64"),
                         np.float32).view(np.complex64)
    out = os.path.join(REPO, "uhsdr_tpu", "data", "ofdm_ref.npz")
    np.savez_compressed(out, bits=bits, tx=tx)
    print("wrote", out, bits.shape, tx.shape)


if __name__ == "__main__":
    main()
