"""OFDM modem (FreeDV 700D's waveform class) — pilot-aided coherent QPSK.

Role in the reference: `drivers/freedv/ofdm.c` carries FreeDV 700D
(`freedv_api.c` mode 700D on F7/H7 boards, `uhsdr_board_config.h:
225-230`).  Independent implementation of the same waveform class:

  * FS 8000, FFT 128 -> 62.5 Hz carrier spacing, 17 QPSK carriers
    centred at 1500 Hz, 32-sample cyclic prefix -> 160 samples/symbol =
    50 symbols/s (the reference's 700D numbers are Nc=17, ~22 ms symbols
    with CP — same mechanism, slightly different clocking);
  * modem frame = 1 known pilot symbol + 7 data symbols = 160 ms;
    7 x 34 = 238 bit slots carrying one LDPC(224,112) codeword + 14
    spare bits;
  * coherent demod: per-carrier channel estimate from the pilot symbol
    (amplitude + phase), held over the frame;
  * sync: frame timing by correlating against the known pilot waveform;
    frequency offset from the pilot's two CP-repeated regions and from
    the channel-estimate phase slope between consecutive frames.

OFDM is the most TPU-friendly waveform here (mod/demod are literal FFTs
over a carriers axis), but like the FDMDV stack it runs host-side off
the hot IQ path, matching the reference's deferred-processing design.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

FS = 8000
NFFT = 128
CP = 32
SYMBOL = NFFT + CP           # 160 samples -> 50 symbols/s
NC = 17                      # QPSK data carriers
FCENTRE = 1500.0
DATA_SYMBOLS = 7
FRAME_SYMBOLS = 1 + DATA_SYMBOLS        # pilot + data
FRAME_SAMPLES = FRAME_SYMBOLS * SYMBOL  # 1280 = 160 ms
BITS_PER_SYMBOL = NC * 2                # 34
BITS_PER_FRAME = DATA_SYMBOLS * BITS_PER_SYMBOL   # 238

# carrier bin indices: NC bins centred on 1500 Hz (bin 24 at 62.5 Hz)
_CENTER_BIN = int(round(FCENTRE / (FS / NFFT)))          # 24
CARRIER_BINS = _CENTER_BIN + np.arange(NC) - NC // 2     # 16..32

# fixed pilot QPSK pattern (seeded, known to both ends)
_rng = np.random.default_rng(0x0FD)
PILOT_SYMBOLS = np.exp(1j * (np.pi / 4 + np.pi / 2 *
                             _rng.integers(0, 4, NC)))

_QPSK = np.exp(1j * (np.pi / 4 + np.pi / 2 * np.arange(4)))
# Gray: bits (b1,b0) -> symbol index
_GRAY = {(0, 0): 0, (0, 1): 1, (1, 1): 2, (1, 0): 3}
_GRAY_REV = {v: k for k, v in _GRAY.items()}


def _ofdm_symbol(spectrum_vals: np.ndarray) -> np.ndarray:
    """NC carrier values -> one time-domain symbol with CP."""
    S = np.zeros(NFFT, complex)
    S[CARRIER_BINS] = spectrum_vals
    x = np.fft.ifft(S) * np.sqrt(NFFT)
    return np.concatenate([x[-CP:], x])


_PILOT_WAVE = _ofdm_symbol(PILOT_SYMBOLS)


@dataclass
class OfdmModulator:
    """One frame per call: bits (238,) -> (1280,) complex baseband."""

    def modulate_frame(self, bits: np.ndarray) -> np.ndarray:
        bits = np.asarray(bits).reshape(DATA_SYMBOLS, NC, 2)
        out = [_PILOT_WAVE]
        for s in range(DATA_SYMBOLS):
            idx = np.array([_GRAY[(int(a), int(b))] for a, b in bits[s]])
            out.append(_ofdm_symbol(_QPSK[idx]))
        sig = np.concatenate(out)
        # normalize to ~unit RMS (per-symbol power = NC/NFFT before this)
        return (sig * np.sqrt(NFFT / NC)).astype(np.complex64)


@dataclass
class OfdmDemodulator:
    """Streaming RX: frame sync by pilot correlation, coherent demod."""
    foff_hz: float = 0.0
    in_sync: bool = False
    _buf: np.ndarray = field(default_factory=lambda: np.zeros(0, np.complex64))
    _skip: int = 0
    frames: int = 0

    def _find_pilot(self, sig: np.ndarray) -> tuple[int, float]:
        """Correlate |sig| against the pilot waveform over one frame span.
        Returns (offset, quality)."""
        n = len(sig) - SYMBOL
        p = _PILOT_WAVE / np.linalg.norm(_PILOT_WAVE)
        best_off, best_q = 0, -1.0
        # coarse stride then refine
        for off in range(0, min(n, FRAME_SAMPLES), 4):
            seg = sig[off: off + SYMBOL]
            e = np.linalg.norm(seg) + 1e-9
            q = abs(np.vdot(p, seg)) / e
            if q > best_q:
                best_q, best_off = q, off
        for off in range(max(0, best_off - 4), min(n, best_off + 5)):
            seg = sig[off: off + SYMBOL]
            e = np.linalg.norm(seg) + 1e-9
            q = abs(np.vdot(p, seg)) / e
            if q > best_q:
                best_q, best_off = q, off
        return best_off, best_q

    def _cp_freq_estimate(self, sym: np.ndarray) -> float:
        """CP-based fractional frequency estimate for one symbol."""
        corr = np.vdot(sym[:CP], sym[NFFT: NFFT + CP])
        return float(np.angle(corr) / (2 * np.pi * NFFT / FS))

    def demod(self, sig: np.ndarray):
        """Append samples; demodulate every complete synced frame.
        Returns (bits (n_frames, 238), snr_estimates (n_frames,))."""
        self._buf = np.concatenate([self._buf,
                                    np.asarray(sig, np.complex64)])
        bits_out, snrs = [], []
        while True:
            if not self.in_sync:
                if len(self._buf) < 2 * FRAME_SAMPLES:
                    break
                off, q = self._find_pilot(self._buf[:2 * FRAME_SAMPLES])
                if q < 0.35:   # noise-only floor ~0.08
                    self._buf = self._buf[FRAME_SAMPLES:]
                    continue
                self._buf = self._buf[off:]
                self.in_sync = True
                # initial freq estimate from the pilot's CP
                self.foff_hz = self._cp_freq_estimate(
                    self._buf[:SYMBOL])
            if len(self._buf) < FRAME_SAMPLES + 16:
                break
            # per-frame timing refinement: the pilot should sit at offset
            # 0; correlate within +-8 samples and trim drift
            p = _PILOT_WAVE / np.linalg.norm(_PILOT_WAVE)
            best_d, best_q = 0, -1.0
            for d in range(-8, 9):
                if d < 0 and self.frames == 0:
                    continue
                seg = self._buf[max(d, 0): max(d, 0) + SYMBOL]
                if len(seg) < SYMBOL:
                    continue
                q = abs(np.vdot(p, seg)) / (np.linalg.norm(seg) + 1e-9)
                if q > best_q:
                    best_q, best_d = q, d
            if best_q < 0.2:
                self.in_sync = False        # lost the pilot: reacquire
                self._buf = self._buf[FRAME_SAMPLES:]
                continue
            if best_d > 0:
                self._buf = self._buf[best_d:]
            frame = self._buf[:FRAME_SAMPLES]
            self._buf = self._buf[FRAME_SAMPLES:]

            # frequency correction
            n = np.arange(FRAME_SAMPLES)
            frame = frame * np.exp(-1j * 2 * np.pi * self.foff_hz * n / FS)

            syms = frame.reshape(FRAME_SYMBOLS, SYMBOL)
            # track freq from CP of all symbols
            self.foff_hz += 0.5 * np.mean(
                [self._cp_freq_estimate(s) for s in syms])

            spect = np.fft.fft(syms[:, CP:], axis=-1) / np.sqrt(NFFT)
            carr = spect[:, CARRIER_BINS]            # (9, NC)
            hest = carr[0] / PILOT_SYMBOLS           # channel estimate
            quality = float(np.mean(np.abs(hest)))
            if quality < 1e-3:
                self.in_sync = False
                continue
            eq = carr[1:] / hest[None, :]            # (7, NC) equalized
            # QPSK decisions
            idx = (np.round((np.angle(eq) - np.pi / 4) /
                            (np.pi / 2)).astype(int)) % 4
            bits = np.array([[_GRAY_REV[int(k)] for k in row]
                             for row in idx]).reshape(DATA_SYMBOLS, NC, 2)
            bits_out.append(bits.reshape(-1))
            # soft SNR estimate from decision distance
            err = eq - _QPSK[idx]
            evm = np.mean(np.abs(err) ** 2) + 1e-9
            snrs.append(10 * np.log10(1.0 / evm))
            self.frames += 1
        if not bits_out:
            return (np.zeros((0, BITS_PER_FRAME), np.uint8),
                    np.zeros(0))
        return np.stack(bits_out).astype(np.uint8), np.array(snrs)

    def soft_llrs(self, eq_symbols: np.ndarray, noise_var: float):
        """Optional: per-bit LLRs for the LDPC decoder from equalized
        QPSK symbols (Gray mapping: b1 from -imag-ish, b0 from real/imag
        quadrant geometry).  eq_symbols: (7, NC)."""
        s = eq_symbols * np.exp(-1j * np.pi / 4)
        llr_b0 = 2 * np.sqrt(2) * s.real / noise_var
        llr_b1 = 2 * np.sqrt(2) * s.imag / noise_var
        # bit order per carrier: (b1, b0) as in _GRAY
        out = np.empty(s.shape + (2,), float)
        out[..., 0] = -llr_b1
        out[..., 1] = -llr_b0
        return out.reshape(-1)
