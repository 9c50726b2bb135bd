#!/usr/bin/env python3
"""Import the reference's FreeDV test vectors + modem coefficient tables
as data (VERDICT round-1 item 2).

  * `drivers/audio/freedv_test_data.c` — 50 frames x 320 complex samples
    of real FreeDV-1600 modem IQ at 8 kHz (the firmware's own DEBUG
    loopback vector, freedv_uhsdr.c:415-430)
  * `drivers/freedv/rn.h` — gt_alpha5_root TX/RX pulse-shaping filter
  * `drivers/freedv/pilot_coeff.h` — pilot LPF coefficients
  * `drivers/freedv/test_bits.h` — the FDMDV known test-bit sequence

Writes uhsdr_tpu/data/freedv_ref.npz.
"""
from __future__ import annotations

import pathlib
import re
import sys

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
REF = pathlib.Path(sys.argv[1] if len(sys.argv) > 1
                   else "/root/reference/mchf-eclipse")

FLOAT_RE = r"[-+]?(?:\d+\.?\d*|\.\d+)(?:[eE][-+]?\d+)?"


def floats(text: str) -> np.ndarray:
    return np.array([float(v) for v in re.findall(FLOAT_RE, text)], np.float64)


def array_body(path: pathlib.Path, name: str) -> str:
    text = path.read_text(errors="replace")
    # use the LAST declaration: pilot_coeff.h declares the array twice
    # inside an #ifdef/#else pair sharing one initializer body
    ms = (list(re.finditer(name + r"\s*\[\s*\]\s*=\s*\{", text))
          or list(re.finditer(name + r"\s*\[[^\]]*\]\s*=\s*\{", text)))
    m = ms[-1]
    i = m.end()
    depth = 1
    while depth:
        if text[i] == "{":
            depth += 1
        elif text[i] == "}":
            depth -= 1
        i += 1
    return text[m.end():i - 1]


def main():
    # test IQ: array of {real, imag} pairs
    body = array_body(REF / "drivers/audio/freedv_test_data.c", "test_buffer")
    vals = floats(body)
    assert vals.size % 2 == 0, vals.size
    iq = vals[0::2] + 1j * vals[1::2]
    assert iq.size % 320 == 0, iq.size   # header says 50 frames; file holds 100

    gt = floats(array_body(REF / "drivers/freedv/rn.h", "gt_alpha5_root"))
    pilot = floats(array_body(REF / "drivers/freedv/pilot_coeff.h",
                              "pilot_coeff"))
    tb = floats(array_body(REF / "drivers/freedv/test_bits.h", "test_bits"))

    out = REPO / "uhsdr_tpu" / "data" / "freedv_ref.npz"
    np.savez_compressed(out, test_iq=iq.astype(np.complex128),
                        gt_alpha5_root=gt, pilot_coeff=pilot,
                        test_bits=tb.astype(np.int32))
    print(f"test_iq {iq.shape}, gt {gt.shape}, pilot {pilot.shape}, "
          f"test_bits {tb.shape} -> {out}")


if __name__ == "__main__":
    main()
