"""PSK31 varicode text coding and TX waveform building (host side).

Varicode (G3PLX standard): each char is a unique bit pattern with no two
consecutive zeros inside; characters separated by '00'.  Differential
BPSK: bit 0 = phase reversal, bit 1 = no change (reference
`Bpsk_DecodeVaricode` / `Psk_Modulator_GenSample`, `psk.c:533-760`).
"""
from __future__ import annotations

import numpy as np

from ._varicode_table import VARICODE

CODE_TO_CHAR = {int(v, 2): chr(i) for i, v in enumerate(VARICODE)}


class VaricodeDecoder:
    def __init__(self):
        self.word = 0
        self.last_bit = 1
        self.text = []

    def push_bits(self, bits) -> str:
        for b in bits:
            b = int(b)
            if self.last_bit == 0 and b == 0 and self.word != 0:
                ch = CODE_TO_CHAR.get(self.word >> 1)
                if ch is not None and ch.isprintable() or ch in "\n\r\t ":
                    self.text.append(ch)
                self.word = 0
            else:
                self.word = (self.word << 1) | b
            self.last_bit = b
        return "".join(self.text)


def encode_bits(text: str, preamble_zeros: int = 32,
                postamble_ones: int = 32) -> np.ndarray:
    """Text -> differential bit stream (incl. 00 separators, preamble of
    reversals, postamble of steady carrier)."""
    bits = [0] * preamble_zeros
    for ch in text:
        code = VARICODE[ord(ch) & 0x7F]
        bits.extend(int(c) for c in code)
        bits.extend([0, 0])
    bits.extend([1] * postamble_ones)
    return np.asarray(bits, np.int32)


def bits_to_waveform_params(bits: np.ndarray, rate: int):
    """Expand a differential bit stream to per-sample (signs, envelope).

    bit 0 -> phase reversal at the middle of the bit with raised-cosine
    amplitude dip (the reference shapes with a cosine envelope generator);
    bit 1 -> steady carrier.
    """
    n = len(bits) * rate
    signs = np.ones(n, np.float32)
    env = np.ones(n, np.float32)
    half = rate // 2
    ramp = 0.5 * (1 + np.cos(np.pi * np.arange(rate) / rate))  # 1 -> 0
    cur = 1.0
    for i, b in enumerate(bits):
        s = i * rate
        if b == 0:
            # cosine dip through zero at mid-bit, then flip sign
            env[s:s + half] = ramp[::2][:half]
            env[s + half:s + rate] = ramp[::2][:rate - half][::-1]
            signs[s:s + half] = cur
            cur = -cur
            signs[s + half:s + rate] = cur
        else:
            signs[s:s + rate] = cur
    return signs, env
