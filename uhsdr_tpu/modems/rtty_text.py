"""Baudot (ITA2) text coding for RTTY — host side.

Reference: `rtty.c:27-40` Baudot->ASCII tables and
`Rtty_Modulator_GenSample` framing (1 start + 5 data (LSB first) +
1.5/2 stop bits).
"""
from __future__ import annotations

import numpy as np

# ITA2 letters and figures shifts (standard tables)
LETTERS = "\0E\nA SIU\rDRJNFCKTZLWHYPQOBG\0MXV\0"
FIGURES = "\x003\n- \x0787\r\x054',!:(5\")2#6019?&\0./;\0"
LTRS = 0x1F
FIGS = 0x1B


class BaudotDecoder:
    def __init__(self):
        self.figures = False
        self.text = []

    def push_codes(self, codes) -> str:
        for c in codes:
            c = int(c)
            if c < 0:
                continue
            if c == LTRS:
                self.figures = False
            elif c == FIGS:
                self.figures = True
            else:
                table = FIGURES if self.figures else LETTERS
                ch = table[c] if c < len(table) else "\0"
                if ch != "\0":
                    self.text.append(ch)
        return "".join(self.text)


def encode(text: str) -> list[int]:
    """ASCII -> Baudot codes with shift handling."""
    codes = [LTRS]
    figures = False
    for ch in text.upper():
        if ch in LETTERS and ch != "\0":
            if figures:
                codes.append(LTRS)
                figures = False
            codes.append(LETTERS.index(ch))
        elif ch in FIGURES and ch != "\0":
            if not figures:
                codes.append(FIGS)
                figures = True
            codes.append(FIGURES.index(ch))
    return codes


def codes_to_bits(codes: list[int], one_bit: int,
                  stopbits: float = 1.5) -> np.ndarray:
    """Expand framed codes to a sample-rate mark/space boolean stream
    (True = mark).  Idle = mark."""
    out = [np.ones(2 * one_bit, bool)]          # idle lead-in
    stop_len = int(one_bit * stopbits)
    for c in codes:
        out.append(np.zeros(one_bit, bool))     # start (space)
        for b in range(5):
            bit = bool((c >> b) & 1)
            out.append(np.full(one_bit, bit, bool))
        out.append(np.ones(stop_len, bool))     # stop (mark)
    out.append(np.ones(4 * one_bit, bool))
    return np.concatenate(out)
