"""Import the reference's HRA_112_112 LDPC code tables
(`drivers/freedv/HRA_112_112.c`, generated data) into
`uhsdr_tpu/data/ldpc_ref.npz`:

  H_rows    (336,) uint16 — (max_row_weight=3, 112) column-major,
            1-based data-bit indices per parity check
  H_cols    (336,) uint16
  input     (224,) f64    — the reference's built-in decoder test input
  detected  (224,) uint8  — its expected decoded codeword
"""
from __future__ import annotations

import os
import re

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = ("/root/reference/mchf-eclipse/drivers/freedv/HRA_112_112.c")


def _array(text: str, name: str, dtype):
    m = re.search(name + r"\[\]\s*=\s*\{([^}]*)\}", text, re.S)
    vals = [v.strip() for v in m.group(1).split(",") if v.strip()]
    return np.array([float(v) for v in vals]).astype(dtype)


def main() -> None:
    text = open(SRC).read()
    out = os.path.join(REPO, "uhsdr_tpu", "data", "ldpc_ref.npz")
    np.savez_compressed(
        out,
        H_rows=_array(text, "HRA_112_112_H_rows", np.uint16),
        H_cols=_array(text, "HRA_112_112_H_cols", np.uint16),
        input=_array(text, "HRA_112_112_input", np.float64),
        detected=_array(text, "HRA_112_112_detected_data", np.uint8),
    )
    d = np.load(out)
    print("wrote", out, {k: v.shape for k, v in d.items()})


if __name__ == "__main__":
    main()
