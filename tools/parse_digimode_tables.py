#!/usr/bin/env python3
"""Import the digital-mode TX tables as data.

Parses three reference coefficient/lookup tables into
`uhsdr_tpu/data/digimode_tables.npz`:

  ascii2baudot (128,) uint8 — `drivers/audio/rtty.c:43` Ascii2Baudot[]:
      ITA2 Baudot codes with the LETTERS/SYMBOLS charset flag in bit 5
      (RTTY_CODE_MODE_MASK), consumed by Rtty_Modulator_Code2Bits.
  psk_varicode (256,) uint16 — `drivers/audio/psk.c:71` psk_varicode[]
      (fldigi pskvaricode.cxx table): BPSK31 varicode, MSB-first,
      consumed by Bpsk_FindCharReversed.
  cw_sm_table (128,) f64 — `drivers/audio/cw/cw_gen.c:255` sm_table[]:
      the CW keying envelope smoothing table (one step per
      CW_SMOOTH_LEN=2 samples on rising/falling edges).

Same treatment as the filter tables (tools/parse_ref_filters.py):
coefficient DATA is imported, algorithms are re-implemented.
"""
from __future__ import annotations

import os
import re

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference/mchf-eclipse/drivers/audio"


def _array_body(text: str, decl: str) -> str:
    m = re.search(re.escape(decl) + r"[^{]*\{", text)
    assert m, decl
    depth = 1
    i = m.end()
    while depth:
        if text[i] == "{":
            depth += 1
        elif text[i] == "}":
            depth -= 1
        i += 1
    return text[m.end(): i - 1]


def main() -> None:
    rtty = open(os.path.join(REF, "rtty.c")).read()
    body = _array_body(rtty, "const uint8_t Ascii2Baudot[128]")
    vals = [int(v, 0) for v in re.findall(r"0b[01]+|\b\d+\b",
                                          re.sub(r"//[^\n]*", "", body))]
    ascii2baudot = np.array(vals, np.uint8)
    assert ascii2baudot.shape == (128,), ascii2baudot.shape

    psk = open(os.path.join(REF, "psk.c")).read()
    body = _array_body(psk, "static const uint16_t psk_varicode[]")
    body = re.sub(r"/\*.*?\*/", "", body, flags=re.S)
    vals = [int(v, 0) for v in re.findall(
        r"0b[01]+|0x[0-9a-fA-F]+|\b\d+\b", re.sub(r"//[^\n]*", "", body))]
    psk_varicode = np.array(vals, np.uint16)
    assert psk_varicode.shape == (256,), psk_varicode.shape

    cw = open(os.path.join(REF, "cw", "cw_gen.c")).read()
    body = _array_body(cw, "static const float sm_table[CW_SMOOTH_TBL_SIZE]")
    vals = [float(v) for v in re.findall(
        r"[-+]?\d*\.\d+|\b\d+\b", re.sub(r"//[^\n]*", "", body))]
    sm_table = np.array(vals, np.float64)
    assert sm_table.shape == (128,), sm_table.shape
    assert sm_table[0] == 0.0 and abs(sm_table[-1] - 1.0) < 1e-3

    dst = os.path.join(REPO, "uhsdr_tpu", "data", "digimode_tables.npz")
    np.savez_compressed(dst, ascii2baudot=ascii2baudot,
                        psk_varicode=psk_varicode, cw_sm_table=sm_table)
    print("wrote", dst, ascii2baudot.shape, psk_varicode.shape,
          sm_table.shape)


if __name__ == "__main__":
    main()
