#!/usr/bin/env python3
"""Import the Codec2 scalar LSP quantiser codebooks as data.

Parses the reference's generated `drivers/freedv/codebook.c` (the
`lsp_cb[]` table of 10 scalar codebooks, one per LSP, used by
CODEC2_MODE_1300's `decode_lsps_scalar` / `encode_lsps_scalar`,
`quantise.c:299-352`) into `uhsdr_tpu/data/codec2_cb.npz`:

  lsp_cb_k      (10,) int    — element stride per entry (all 1)
  lsp_cb_bits   (10,) int    — log2(m): bits per index
  lsp_cb_m      (10,) int    — number of entries
  lsp_cb_0..9   (m_i,) f64   — codebook values in Hz

Same treatment as the filter tables (tools/parse_ref_filters.py):
coefficient DATA is imported, algorithms are re-implemented.
"""
from __future__ import annotations

import os
import re

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = "/root/reference/mchf-eclipse/drivers/freedv/codebook.c"


def main() -> None:
    text = open(SRC).read()
    # static const float codesN[] = { ... };
    arrays = {}
    for m in re.finditer(
            r"static const float (codes\d+)\[\]\s*=\s*\{([^}]*)\};", text):
        vals = [float(v) for v in re.findall(r"[-\d.eE+]+", m.group(2))]
        arrays[m.group(1)] = np.array(vals, np.float64)

    # const struct lsp_codebook lsp_cb[] = { { k, log2m, m, codesN }, ... }
    tbl = re.search(r"const struct lsp_codebook lsp_cb\[\]\s*=\s*\{(.*?)\n\};",
                    text, re.S).group(1)
    entries = re.findall(r"\{\s*(\d+),\s*(\d+),\s*(\d+),\s*(codes\d+)\s*\}",
                         tbl)
    assert len(entries) == 10, len(entries)

    out = {}
    ks, bits, ms = [], [], []
    for i, (k, log2m, m_, name) in enumerate(entries):
        ks.append(int(k))
        bits.append(int(log2m))
        ms.append(int(m_))
        cb = arrays[name]
        assert len(cb) == int(m_) * int(k), (name, len(cb), m_, k)
        out[f"lsp_cb_{i}"] = cb
    out["lsp_cb_k"] = np.array(ks)
    out["lsp_cb_bits"] = np.array(bits)
    out["lsp_cb_m"] = np.array(ms)

    dst = os.path.join(REPO, "uhsdr_tpu", "data", "codec2_cb.npz")
    np.savez_compressed(dst, **out)
    print("wrote", dst, "bits:", bits, "sum:", sum(bits))


def _parse_float_arrays(path: str) -> dict[str, np.ndarray]:
    text = open(path).read()
    arrays = {}
    for m in re.finditer(
            r"static const float (codes\d+)\[\]\s*=\s*\{([^}]*)\};", text):
        vals = [float(v) for v in re.findall(r"[-\d.eE+]+", m.group(2))]
        arrays[m.group(1)] = np.array(vals, np.float64)
    return arrays


def main_newamp1() -> None:
    """Import the newamp1 rate-K amplitude VQ (CODEC2_MODE_700C):
    `codebooknewamp1.c` — two-stage K=20 VQ, 512 entries each — and
    `codebooknewamp1_energy.c` — 16-level scalar mean/energy quantiser
    (newamp1.c rate_K_mbest_encode / newamp1_indexes_to_rate_K_vec,
    codec2.c codec2_{encode,decode}_700c)."""
    src = os.path.join(os.path.dirname(SRC), "codebooknewamp1.c")
    arrays = _parse_float_arrays(src)
    vq1 = arrays["codes0"].reshape(512, 20)
    vq2 = arrays["codes1"].reshape(512, 20)
    esrc = os.path.join(os.path.dirname(SRC), "codebooknewamp1_energy.c")
    energy = _parse_float_arrays(esrc)["codes0"]
    assert energy.shape == (16,), energy.shape

    dst = os.path.join(REPO, "uhsdr_tpu", "data", "newamp1_cb.npz")
    np.savez_compressed(dst, vq1=vq1, vq2=vq2, energy=energy)
    print("wrote", dst, vq1.shape, vq2.shape, energy.shape)


if __name__ == "__main__":
    main()
    main_newamp1()
