"""Codec2 CODEC2_MODE_1300 — the vocoder inside FreeDV 1600.

Bit-interoperable re-implementation of the reference's decode path
(`drivers/freedv/codec2.c:1249-1360` `codec2_decode_1300` and the helpers
it calls in quantise.c / interp.c / lsp.c / phase.c / postfilter.c /
sine.c), operating on the SAME 52-bit frames the firmware transmits:

  4 x voicing (1 bit)                       [0:4]
  Wo index (7 bits, linear quantiser)       [4:11]   decode_Wo
  energy index (5 bits, -10..40 dB log)     [11:16]  decode_energy
  10 scalar-quantised LSPs (36 bits)        [16:52]  decode_lsps_scalar

All fields are Gray-coded MSB-first (`pack.c unpack_natural_or_gray`).
The LSP quantiser codebooks are the reference's own tables, imported as
data (`tools/parse_codec2_codebooks.py` -> data/codec2_cb.npz).

Decode pipeline per 40 ms frame (4 x 10 ms subframes):
  unpack -> dequantise Wo/E/LSP -> interpolate 3 intermediate subframes
  (`interp.c`: linear LSPs, voicing-gated Wo, log-domain energy) ->
  LSP->LPC (`lsp.c:lsp_to_lpc` cascade recursion) -> LPC spectrum ->
  per-harmonic amplitudes with the LPC post filter + bass boost
  (`quantise.c:aks_to_M2`/`lpc_post_filter`, beta .2 gamma .5) ->
  zero-order phase synthesis with the reference's own LCG PRNG for
  unvoiced phases (`phase.c`, `sine.c codec2_rand`) -> background-noise
  postfilter (`postfilter.c`) -> frequency-domain sinusoidal synthesis
  with trapezoidal overlap-add (`sine.c synthesise`) -> ear protection.

The PRNG sequence and consumption order are replicated exactly, so the
decoder tracks the reference sample-for-sample (verified against the
compiled reference in tests/test_codec2_golden.py).
"""
from __future__ import annotations

import numpy as np

from .. import data

# defines.h / quantise.h / sine.c c2const_create (Fs=8000, N_S=0.01)
FS = 8000
N_SAMP = 80              # 10 ms subframe
M_PITCH = 320
FFT_ENC = 512
FFT_DEC = 512
LPC_ORD = 10
MAX_AMP = 160
P_MIN, P_MAX = 20, 160
# the reference's PI/TWO_PI macros (defines.h:43-45) are truncated
# decimals, and C2CONST stores Wo_min/max as float32 — model->L = PI/Wo
# truncates differently than exact math (PI/Wo_min = 79.999998 -> 79!),
# and every L feeds the PRNG consumption count, so these roundings are
# replicated exactly
PI_C = 3.141592654
TWO_PI_C = 6.283185307
WO_MIN = float(np.float32(TWO_PI_C / P_MAX))
WO_MAX = float(np.float32(TWO_PI_C / P_MIN))


def _f32(x) -> float:
    return float(np.float32(x))


def _L_of(Wo: float) -> int:
    """model->L = PI/model->Wo (C float truncation semantics)."""
    return int(PI_C / _f32(Wo))
WO_BITS = 7
E_BITS = 5
E_MIN_DB, E_MAX_DB = -10.0, 40.0
TW = 40                  # Fs * TW_S (trapezoidal overlap)
BG_THRESH, BG_BETA, BG_MARGIN = 40.0, 0.1, 6.0   # postfilter.c:47-49
BETA, GAMMA = 0.2, 0.5   # codec2.c codec2_create lpc post filter defaults
CODEC2_RAND_MAX = 32768
FRAME_BITS = 52
SAMPLES_PER_FRAME = 4 * N_SAMP


def _lsp_codebooks():
    cb = data._codec2_cb()
    bits = cb["lsp_cb_bits"]
    return [np.asarray(cb[f"lsp_cb_{i}"], np.float64)
            for i in range(10)], [int(b) for b in bits]


class _Rand:
    """The reference's `codec2_rand` LCG (`sine.c:680-687`) — the
    unvoiced-phase source; replicated so waveforms match exactly."""

    def __init__(self):
        self.next = 1

    def __call__(self) -> int:
        self.next = (self.next * 1103515245 + 12345) & 0xFFFFFFFFFFFFFFFF
        return (self.next // 65536) % 32768


def _gray_to_binary(field: int) -> int:
    t = field ^ (field >> 8)
    t ^= t >> 4
    t ^= t >> 2
    t ^= t >> 1
    return t


class _BitUnpacker:
    """MSB-first field unpacker with Gray decode (pack.c)."""

    def __init__(self, bits52: np.ndarray):
        self.bits = np.asarray(bits52).astype(np.uint8).reshape(-1)
        self.pos = 0

    def take(self, width: int, gray: bool = True) -> int:
        field = 0
        for _ in range(width):
            field = (field << 1) | int(self.bits[self.pos])
            self.pos += 1
        return _gray_to_binary(field) if gray else field


def decode_wo(index: int) -> float:
    """quantise.c decode_Wo — LINEAR quantiser (1300 mode), f32 math."""
    step = _f32((WO_MAX - WO_MIN) / (1 << WO_BITS))
    return _f32(WO_MIN + _f32(step * index))


def decode_energy(index: int) -> float:
    step = (E_MAX_DB - E_MIN_DB) / (1 << E_BITS)
    return 10.0 ** ((E_MIN_DB + step * index) / 10.0)


def decode_lsps_scalar(indexes) -> np.ndarray:
    cbs, _ = _lsp_codebooks()
    lsp_hz = np.array([cbs[i][indexes[i]] for i in range(LPC_ORD)])
    return (np.pi / 4000.0) * lsp_hz


def check_lsp_order(lsp: np.ndarray) -> np.ndarray:
    """quantise.c check_lsp_order — bubble with restart, +-0.1 nudge."""
    lsp = lsp.copy()
    i = 1
    while i < LPC_ORD:
        if lsp[i] < lsp[i - 1]:
            tmp = lsp[i - 1]
            lsp[i - 1] = lsp[i] - 0.1
            lsp[i] = tmp + 0.1
            i = 1
        i += 1
    return lsp


def bw_expand_lsps(lsp: np.ndarray, min_sep_low=50.0,
                   min_sep_high=100.0) -> np.ndarray:
    lsp = lsp.copy()
    r = np.pi / 4000.0
    for i in range(1, 4):
        if lsp[i] - lsp[i - 1] < min_sep_low * r:
            lsp[i] = lsp[i - 1] + min_sep_low * r
    for i in range(4, LPC_ORD):
        if lsp[i] - lsp[i - 1] < min_sep_high * r:
            lsp[i] = lsp[i - 1] + min_sep_high * r
    return lsp


def lsp_to_lpc(lsp: np.ndarray) -> np.ndarray:
    """lsp.c lsp_to_lpc — cascade-of-quadratics reconstruction of
    A(z) = (P(z)+Q(z))/2 driven by an impulse."""
    order = LPC_ORD
    freq = np.cos(lsp)
    Wp = np.zeros(4 * (order // 2) + 2)
    ak = np.zeros(order + 1)
    xin1 = xin2 = 1.0
    for j in range(order + 1):
        for i in range(order // 2):
            n1 = 4 * i
            xout1 = xin1 - 2.0 * freq[2 * i] * Wp[n1] + Wp[n1 + 1]
            xout2 = xin2 - 2.0 * freq[2 * i + 1] * Wp[n1 + 2] + Wp[n1 + 3]
            Wp[n1 + 1] = Wp[n1]
            Wp[n1 + 3] = Wp[n1 + 2]
            Wp[n1] = xin1
            Wp[n1 + 2] = xin2
            xin1, xin2 = xout1, xout2
        n4 = 4 * (order // 2 - 1) + 3
        xout1 = xin1 + Wp[n4 + 1]
        xout2 = xin2 - Wp[n4 + 2]
        ak[j] = (xout1 + xout2) * 0.5
        Wp[n4 + 1] = xin1
        Wp[n4 + 2] = xin2
        xin1 = xin2 = 0.0
    return ak


def _aks_to_M2(ak: np.ndarray, Wo: float, L: int, E: float):
    """quantise.c aks_to_M2 with the LPC post filter + bass boost
    enabled (decoder defaults).  Returns (A[1..L], Aw half-spectrum)."""
    a = np.zeros(FFT_ENC)
    a[: LPC_ORD + 1] = ak
    Aw = np.fft.rfft(a)            # kiss_fftr forward, unscaled
    Pw = 1.0 / (Aw.real[: FFT_ENC // 2] ** 2
                + Aw.imag[: FFT_ENC // 2] ** 2 + 1e-6)

    # lpc_post_filter (quantise.c:735-830)
    x = np.zeros(FFT_ENC)
    x[0] = ak[0]
    coeff = GAMMA
    for i in range(1, LPC_ORD + 1):
        x[i] = ak[i] * coeff
        coeff *= GAMMA
    Ww = np.fft.rfft(x)
    Ww2 = Ww.real[: FFT_ENC // 2] ** 2 + Ww.imag[: FFT_ENC // 2] ** 2
    Rw = np.sqrt(Ww2 * Pw)
    e_before = 1e-4 + np.sum(Pw)
    Pfw = Rw ** BETA
    Pw = Pw * Pfw * Pfw
    e_after = 1e-4 + np.sum(Pw)
    Pw *= (e_before / e_after) * E
    Pw[: FFT_ENC // 8] *= 1.4 * 1.4          # bass boost 0-1 kHz

    # harmonic magnitudes: A_m = sqrt(sum Pw over the band of harmonic m)
    r = 2.0 * np.pi / FFT_ENC
    A = np.zeros(MAX_AMP + 1)
    for m in range(1, L + 1):
        am = int((m - 0.5) * Wo / r + 0.5)
        bm = int((m + 0.5) * Wo / r + 0.5)
        bm = min(bm, FFT_ENC // 2)
        A[m] = np.sqrt(np.sum(Pw[am:bm]))
    return A, Aw


class Codec2Decoder1300:
    """Stateful frame decoder: 52 bits / 40 ms -> 320 samples @8 kHz,
    tracking `codec2_decode_1300` (PRNG, overlap-add and background-
    estimate state included)."""

    def __init__(self):
        # codec2_create init (codec2.c:180-192)
        self.prev_lsps = np.arange(LPC_ORD) * np.pi / (LPC_ORD + 1)
        self.prev_e = 1.0
        self.prev_Wo = WO_MIN
        self.prev_voiced = 0
        self.ex_phase = 0.0
        self.bg_est = 0.0
        self.Sn_ = np.zeros(2 * N_SAMP)
        self.rand = _Rand()
        self.Pn = self._synthesis_window()

    @staticmethod
    def _synthesis_window() -> np.ndarray:
        Pn = np.zeros(2 * N_SAMP)
        n, tw = N_SAMP, TW
        Pn[n // 2 - tw: n // 2 + tw] = np.arange(2 * tw) / (2.0 * tw)
        Pn[n // 2 + tw: 3 * n // 2 - tw] = 1.0
        Pn[3 * n // 2 - tw: 3 * n // 2 + tw] = \
            1.0 - np.arange(2 * tw) / (2.0 * tw)
        return Pn

    def decode_frame(self, bits52: np.ndarray) -> np.ndarray:
        up = _BitUnpacker(bits52)
        voiced = [up.take(1) for _ in range(4)]
        Wo3 = decode_wo(up.take(WO_BITS))
        L3 = _L_of(Wo3)
        e3 = decode_energy(up.take(E_BITS))
        _, cb_bits = _lsp_codebooks()
        lsp_idx = [up.take(cb_bits[i]) for i in range(LPC_ORD)]
        lsps3 = bw_expand_lsps(check_lsp_order(decode_lsps_scalar(lsp_idx)))

        # interpolate the 3 intermediate 10 ms subframes (interp.c)
        lsps, Wos, Ls, es, vs = [], [], [], [], []
        for i in range(3):
            w = 0.25 * (i + 1)
            v = voiced[i]
            # interp_Wo2 voicing trap
            if v and not self.prev_voiced and not voiced[3]:
                v = 0
            if v:
                if self.prev_voiced and voiced[3]:
                    Wo = _f32((1.0 - w) * self.prev_Wo + w * Wo3)
                elif voiced[3]:
                    Wo = Wo3
                elif self.prev_voiced:
                    Wo = self.prev_Wo
                else:
                    Wo = WO_MIN
            else:
                Wo = WO_MIN
            lsps.append((1.0 - w) * self.prev_lsps + w * lsps3)
            Wos.append(Wo)
            Ls.append(_L_of(Wo))
            es.append(10.0 ** ((1.0 - w) * np.log10(self.prev_e)
                               + w * np.log10(e3)))
            vs.append(v)
        lsps.append(lsps3)
        Wos.append(Wo3)
        Ls.append(L3)
        es.append(e3)
        vs.append(voiced[3])

        out = np.zeros(SAMPLES_PER_FRAME, np.int16)
        for i in range(4):
            ak = lsp_to_lpc(lsps[i])
            A, Aw = _aks_to_M2(ak, Wos[i], Ls[i], es[i])
            # apply_lpc_correction (quantise.c)
            if Wos[i] < np.pi * 150.0 / 4000.0:
                A[1] *= 0.032
            out[i * N_SAMP:(i + 1) * N_SAMP] = self._synth_subframe(
                Wos[i], Ls[i], vs[i], A, Aw)

        self.prev_lsps = lsps3
        self.prev_e = e3
        self.prev_Wo = Wo3
        self.prev_voiced = voiced[3]
        return out

    def _synth_subframe(self, Wo, L, voiced, A, Aw) -> np.ndarray:
        # sample_phase (phase.c): synthesis filter phase = conj(A(e^jw))
        r = 2.0 * np.pi / FFT_ENC
        b = (np.arange(1, L + 1) * Wo / r + 0.5).astype(int)
        H = np.conj(Aw[b])

        # phase_synth_zero_order
        self.ex_phase += Wo * N_SAMP
        self.ex_phase -= 2.0 * np.pi * np.floor(
            self.ex_phase / (2.0 * np.pi) + 0.5)
        phi = np.zeros(L + 1)
        for m in range(1, L + 1):
            if voiced:
                Ex = np.exp(1j * self.ex_phase * m)
            else:
                ph = 2.0 * np.pi * self.rand() / CODEC2_RAND_MAX
                Ex = np.exp(1j * ph)
            A_ = H[m - 1] * Ex
            phi[m] = np.arctan2(A_.imag, A_.real + 1e-12)

        # postfilter (postfilter.c)
        e = 1e-12 + np.sum(A[1:L + 1] ** 2)
        e = 10.0 * np.log10(e / L)
        if e < BG_THRESH and not voiced:
            self.bg_est = self.bg_est * (1.0 - BG_BETA) + e * BG_BETA
        if voiced:
            thresh = 10.0 ** ((self.bg_est + BG_MARGIN) / 20.0)
            for m in range(1, L + 1):
                if A[m] < thresh:
                    phi[m] = (2.0 * np.pi / CODEC2_RAND_MAX) * self.rand()

        # synthesise (sine.c): freq-domain placement + irfft + trapezoid
        Sw = np.zeros(FFT_DEC // 2 + 1, np.complex128)
        bdec = (np.arange(1, L + 1) * Wo * FFT_DEC
                / (2.0 * np.pi) + 0.5).astype(int)
        bdec = np.minimum(bdec, FFT_DEC // 2 - 1)
        for m in range(1, L + 1):
            Sw[bdec[m - 1]] = A[m] * np.exp(1j * phi[m])
        sw = np.fft.irfft(Sw, FFT_DEC) * FFT_DEC   # kiss inverse, unscaled

        Sn_ = self.Sn_
        # shift memories
        Sn_[: N_SAMP - 1] = Sn_[N_SAMP: 2 * N_SAMP - 1]
        Sn_[N_SAMP - 1] = 0.0
        Sn_[: N_SAMP - 1] += sw[FFT_DEC - N_SAMP + 1:] * Pn_head(self.Pn)
        Sn_[N_SAMP - 1: 2 * N_SAMP] = sw[: N_SAMP + 1] \
            * self.Pn[N_SAMP - 1: 2 * N_SAMP]

        frame = Sn_[:N_SAMP].copy()
        # ear_protection (codec2.c; note: positive max, no abs)
        mx = frame.max() if len(frame) else 0.0
        over = mx / 30000.0
        if over > 1.0:
            frame *= 1.0 / (over * over)
        # float->short conversion truncates toward zero (C cast)
        return np.trunc(np.clip(frame, -32767, 32767)).astype(np.int16)


def Pn_head(Pn: np.ndarray) -> np.ndarray:
    return Pn[: N_SAMP - 1]
