"""OFDM modem — FreeDV 700D's waveform, BIT- AND WAVEFORM-COMPATIBLE
with the reference's `drivers/freedv/ofdm.c`.

Reference waveform (defaults from `ofdm_create`, `ofdm.c:153-230`):

  * Fs 8000, Ts 18 ms -> Rs = 55.5556 Hz symbol/carrier spacing,
    M = Fs/Rs = 144 core samples, Ncp = 16 cyclic-prefix samples
    -> 160 samples/symbol;
  * Nc = 17 QPSK data carriers; the carrier DFT spans Nc+2 = 19 bins at
    frequencies (nlower + col) * Rs with nlower = round(1500/Rs - Nc/2)
    = 19 (`ofdm.c:303-306`), i.e. 1055.6..2055.6 Hz;
  * modem frame = Ns = 8 symbols: row 0 carries BPSK pilots on all 19
    carriers (`pilotvalues`, `ofdm.c:70-79`), rows 1..7 carry Nc QPSK
    symbols each on the middle carriers (edge carriers zero,
    `ofdm_txframe`, `ofdm.c:706-775`);
  * 238 bits/frame; Gray QPSK constellation [1, j, -j, -1] with
    index = (bits[2i] << 1) | bits[2i+1] (`ofdm_mod`, `ofdm.c:839-864`;
    `qpsk_mod/qpsk_demod`, `ofdm.c:127-138`);
  * synthesis = explicit carrier-matrix IDFT scaled 1/M (`idft`,
    `ofdm.c:515-541`), CP = last Ncp samples copied in front.

Interop proof: `tests/test_freedv_interop.py::test_ofdm_reference_
modulator_demodulates` demodulates golden vectors produced by the
reference's own `ofdm_mod` COMPILED FROM `/root/reference` source
(`tools/gen_ofdm_ref.c`) with zero bit errors.

OFDM is the most TPU-friendly waveform here (mod/demod are carrier-
matrix matmuls), but like the FDMDV stack it runs host-side off the hot
IQ path, matching the reference's deferred-processing design.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

FS = 8000.0
TS = 0.018
RS = 1.0 / TS                    # 55.5556 Hz
M = int(FS / RS)                 # 144 core samples
NCP = 16
SYMBOL = M + NCP                 # 160 samples
NC = 17                          # QPSK data carriers
NS = 8                           # symbols per frame (1 pilot + 7 data)
DATA_SYMBOLS = NS - 1
FRAME_SYMBOLS = NS
FRAME_SAMPLES = NS * SYMBOL      # 1280 = 160 ms
BITS_PER_SYMBOL = NC * 2         # 34
BITS_PER_FRAME = DATA_SYMBOLS * BITS_PER_SYMBOL   # 238
# C roundf rounds half AWAY from zero: roundf(18.5) = 19 (Python's
# banker's round would give 18 and shift every carrier one bin)
NLOWER = int(np.floor(1500.0 / RS - NC / 2.0 + 0.5))          # 19

# ofdm.c:70-79 (first Nc+2 entries used)
_PILOTVALUES = np.array([
    -1, -1, 1, 1, -1, -1, -1, 1,
    -1, 1, -1, 1, 1, 1, 1, 1,
    1, 1, 1, -1, -1, 1, -1, 1,
    -1, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, -1, 1, 1, 1, 1,
    1, -1, -1, -1, -1, -1, -1, 1,
    -1, 1, -1, 1, -1, -1, 1, -1,
    1, 1, 1, 1, -1, 1, -1, 1], np.float64)
PILOTS = _PILOTVALUES[:NC + 2].astype(np.complex128)      # (19,)

# Gray QPSK (ofdm.c:60-65)
_QPSK = np.array([1.0, 1.0j, -1.0j, -1.0], np.complex128)

# carrier synthesis matrix: W[col, row] = exp(j*2pi*(NLOWER+col)*row/M)
_COLS = NLOWER + np.arange(NC + 2)
_W = np.exp(2j * np.pi * _COLS[:, None] * np.arange(M)[None, :] / M)


def _synth_symbol(carriers: np.ndarray) -> np.ndarray:
    """(Nc+2,) carrier values -> (SYMBOL,) time samples with CP
    (idft + CP copy, ofdm.c:515-541, 744-762)."""
    core = (carriers @ _W) / M
    return np.concatenate([core[-NCP:], core])


_PILOT_WAVE = _synth_symbol(PILOTS)


def _dft_carriers(core: np.ndarray) -> np.ndarray:
    """(M,) core samples -> (Nc+2,) carrier values (matched to the
    synthesis scaling: a clean symbol returns its carrier values)."""
    return (np.conj(_W) @ core)


@dataclass
class OfdmModulator:
    """One frame per call: bits (238,) -> (1280,) complex baseband —
    sample-exact vs the reference `ofdm_mod`."""

    def modulate_frame(self, bits: np.ndarray) -> np.ndarray:
        bits = np.asarray(bits).astype(int).reshape(-1)
        assert bits.shape == (BITS_PER_FRAME,)
        idx = (bits[0::2] << 1) | bits[1::2]              # (119,)
        syms = _QPSK[idx].reshape(DATA_SYMBOLS, NC)
        out = [_PILOT_WAVE]
        for s in range(DATA_SYMBOLS):
            row = np.zeros(NC + 2, np.complex128)
            row[1:NC + 1] = syms[s]
            out.append(_synth_symbol(row))
        return np.concatenate(out).astype(np.complex64)


def _qpsk_slice(eq: np.ndarray) -> np.ndarray:
    """Equalized symbols (..., NC) -> bits (..., NC, 2) in tx order
    (qpsk_demod, ofdm.c:133-138: rotate +45deg; b_first = imag<0,
    b_second = real<0)."""
    rot = eq * np.exp(1j * np.pi / 4)
    b_first = (rot.imag < 0).astype(np.uint8)
    b_second = (rot.real < 0).astype(np.uint8)
    return np.stack([b_first, b_second], axis=-1)


@dataclass
class OfdmDemodulator:
    """Streaming RX: frame sync by pilot correlation, pilot-aided
    coherent demod of the reference waveform."""
    foff_hz: float = 0.0
    in_sync: bool = False
    _buf: np.ndarray = field(default_factory=lambda: np.zeros(0, np.complex64))
    frames: int = 0

    def _pilot_quality(self, seg: np.ndarray) -> float:
        p = _PILOT_WAVE / np.linalg.norm(_PILOT_WAVE)
        return float(abs(np.vdot(p, seg)) / (np.linalg.norm(seg) + 1e-12))

    def _find_pilot(self, sig: np.ndarray) -> tuple[int, float]:
        n = len(sig) - SYMBOL
        best_off, best_q = 0, -1.0
        for off in range(0, min(n, FRAME_SAMPLES), 4):
            q = self._pilot_quality(sig[off: off + SYMBOL])
            if q > best_q:
                best_q, best_off = q, off
        for off in range(max(0, best_off - 4), min(n, best_off + 5)):
            q = self._pilot_quality(sig[off: off + SYMBOL])
            if q > best_q:
                best_q, best_off = q, off
        return best_off, best_q

    def _cp_freq_estimate(self, sym: np.ndarray) -> float:
        corr = np.vdot(sym[:NCP], sym[M: M + NCP])
        return float(np.angle(corr) / (2 * np.pi * M / FS))

    def demod(self, sig: np.ndarray):
        """Append samples; demodulate every complete synced frame.
        Returns (bits (n_frames, 238) uint8, snr_estimates (n_frames,))."""
        self._buf = np.concatenate([self._buf,
                                    np.asarray(sig, np.complex64)])
        bits_out, snrs = [], []
        while True:
            if not self.in_sync:
                if len(self._buf) < 2 * FRAME_SAMPLES:
                    break
                off, q = self._find_pilot(self._buf[:2 * FRAME_SAMPLES])
                if q < 0.35:       # noise-only floor ~0.08
                    self._buf = self._buf[FRAME_SAMPLES:]
                    continue
                self._buf = self._buf[off:]
                self.in_sync = True
                self.foff_hz = self._cp_freq_estimate(self._buf[:SYMBOL])
            if len(self._buf) < FRAME_SAMPLES + 16:
                break
            # per-frame timing refinement (+-8 samples of drift)
            best_d, best_q = 0, -1.0
            for d in range(-8, 9):
                if d < 0 and self.frames == 0:
                    continue
                seg = self._buf[max(d, 0): max(d, 0) + SYMBOL]
                if len(seg) < SYMBOL:
                    continue
                q = self._pilot_quality(seg)
                if q > best_q:
                    best_q, best_d = q, d
            if best_q < 0.2:
                self.in_sync = False
                self._buf = self._buf[FRAME_SAMPLES:]
                continue
            if best_d > 0:
                self._buf = self._buf[best_d:]
            frame = self._buf[:FRAME_SAMPLES]
            self._buf = self._buf[FRAME_SAMPLES:]

            n = np.arange(FRAME_SAMPLES)
            frame = frame * np.exp(-2j * np.pi * self.foff_hz * n / FS)
            syms = frame.reshape(FRAME_SYMBOLS, SYMBOL)
            self.foff_hz += 0.5 * float(np.mean(
                [self._cp_freq_estimate(s) for s in syms]))

            carr = np.stack([_dft_carriers(s[NCP:]) for s in syms])  # (8,19)
            hest = carr[0] / PILOTS                  # (19,) channel est
            if float(np.mean(np.abs(hest))) < 1e-6:
                self.in_sync = False
                continue
            eq = carr[1:, 1:NC + 1] / hest[None, 1:NC + 1]   # (7, NC)
            bits = _qpsk_slice(eq)                   # (7, NC, 2)
            bits_out.append(bits.reshape(-1))
            idx = (bits[..., 0].astype(int) << 1) | bits[..., 1].astype(int)
            err = eq / np.abs(eq).clip(1e-12) - _QPSK[idx]
            evm = float(np.mean(np.abs(err) ** 2)) + 1e-9
            snrs.append(10 * np.log10(1.0 / evm))
            self.frames += 1
        if not bits_out:
            return (np.zeros((0, BITS_PER_FRAME), np.uint8), np.zeros(0))
        return np.stack(bits_out).astype(np.uint8), np.array(snrs)
