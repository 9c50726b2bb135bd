"""Host-side filter design.

Produces the coefficient sets the reference carries as pre-baked C tables
(`drivers/audio/filters/iq_rx_filter.c`, `fir_rx_decimate_*.c`,
`iq_tx_filter.c`, IIR lattice `filters/iir_*.c` — see SURVEY.md §2.1).
We design equivalents at runtime with scipy at float64 and cast to f32;
specs (tap counts, bandwidths, sideband-suppression classes) mirror the
reference (`drivers/audio/filters/filters.h:9-16`: 89/199 RX taps, 201 TX).

The reference implements SSB by the phasing method: two real FIRs giving I
+45 deg and Q -45 deg, then I+Q (USB) or I-Q (LSB)
(`drivers/audio/audio_driver.c:2748-2790`).  That is algebraically
``Re{(i + jq) conv h}`` with ``h`` a *complex analytic bandpass* whose
passband covers only positive (USB) or negative (LSB) frequencies.  We
design ``h`` directly: a real lowpass prototype of half the bandwidth,
modulated to the band center.  One complex FIR replaces the pair.
"""
from __future__ import annotations

import functools

import numpy as np
from scipy import signal as sps


# ---------------------------------------------------------------------------
# FIR prototypes
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def lowpass_fir(num_taps: int, cutoff_hz: float, fs: float,
                window: str = "blackmanharris") -> np.ndarray:
    """Linear-phase windowed-sinc lowpass. f64, unit DC gain."""
    h = sps.firwin(num_taps, cutoff_hz, fs=fs, window=window)
    return h.astype(np.float64)


@functools.lru_cache(maxsize=None)
def complex_bandpass_fir(num_taps: int, f_lo: float, f_hi: float,
                         fs: float, window: str = "blackmanharris") -> np.ndarray:
    """One-sided (analytic) complex bandpass covering [f_lo, f_hi] Hz.

    f_lo/f_hi may be negative (LSB).  Passband gain 1.  Equivalent to the
    reference's Hilbert-pair RX filters (`filters/iq_rx_filter.c`) fused
    with its sideband selection.
    """
    if f_hi <= f_lo:
        raise ValueError(f"need f_hi > f_lo, got [{f_lo}, {f_hi}]")
    bw = f_hi - f_lo
    fc = 0.5 * (f_hi + f_lo)
    proto = sps.firwin(num_taps, bw / 2.0, fs=fs, window=window)
    n = np.arange(num_taps) - (num_taps - 1) / 2.0
    h = proto * np.exp(2j * np.pi * fc / fs * n)
    return h.astype(np.complex128)


def hilbert_pair(num_taps: int, f_lo: float, f_hi: float, fs: float,
                 window: str = "blackmanharris") -> tuple[np.ndarray, np.ndarray]:
    """Real (+45, -45) deg FIR pair — the reference's formulation, kept for
    conformance tests.  ``i conv h_i  +/-  q conv h_q`` == USB/LSB demod.
    """
    h = complex_bandpass_fir(num_taps, f_lo, f_hi, fs, window)
    return h.real.copy(), (-h.imag).copy()


@functools.lru_cache(maxsize=None)
def decimation_fir(num_taps: int, decim: int, fs: float,
                   passband_hz: float | None = None,
                   window: str = "blackmanharris") -> np.ndarray:
    """Anti-alias lowpass for decimation by `decim` (reference:
    `fir_rx_decimate_4*.c`, 89/199 taps for /4 to 12 kHz)."""
    fs_out = fs / decim
    cutoff = passband_hz if passband_hz is not None else 0.425 * fs_out
    return lowpass_fir(num_taps, cutoff, fs, window)


@functools.lru_cache(maxsize=None)
def interpolation_fir(num_taps: int, interp: int, fs_out: float,
                      passband_hz: float | None = None,
                      window: str = "blackmanharris") -> np.ndarray:
    """Anti-image lowpass for interpolation by `interp`, designed at the
    OUTPUT rate, gain `interp` (zero-stuffing loses 1/interp energy);
    reference: `fir_rx_interpolate_16*.c` + arm_fir_interpolate_f32."""
    fs_in = fs_out / interp
    cutoff = passband_hz if passband_hz is not None else 0.425 * fs_in
    return interp * lowpass_fir(num_taps, cutoff, fs_out, window)


# ---------------------------------------------------------------------------
# RBJ biquads — the reference's EQ designers
# (`audio_driver.c:831-992` AudioDriver_CalcBandstop/CalcBandpass/
#  CalcHighShelf/CalcLowShelf/CalcNotch — RBJ cookbook formulas)
# ---------------------------------------------------------------------------

def _normalize(b, a):
    b = np.asarray(b, np.float64) / a[0]
    a = np.asarray(a, np.float64) / a[0]
    return np.concatenate([b, a[1:]])  # [b0,b1,b2,a1,a2]


def biquad_passthrough() -> np.ndarray:
    return np.array([1.0, 0, 0, 0, 0])


def biquad_bandstop(f0: float, bw_hz: float, fs: float) -> np.ndarray:
    w0 = 2 * np.pi * f0 / fs
    alpha = np.sin(w0) * np.sinh(np.log(2) / 2 * (bw_hz / f0) * w0 / np.sin(w0))
    b = [1.0, -2 * np.cos(w0), 1.0]
    a = [1 + alpha, -2 * np.cos(w0), 1 - alpha]
    return _normalize(b, a)


def biquad_notch(f0: float, q: float, fs: float) -> np.ndarray:
    w0 = 2 * np.pi * f0 / fs
    alpha = np.sin(w0) / (2 * q)
    b = [1.0, -2 * np.cos(w0), 1.0]
    a = [1 + alpha, -2 * np.cos(w0), 1 - alpha]
    return _normalize(b, a)


def biquad_bandpass(f0: float, bw_hz: float, fs: float) -> np.ndarray:
    """Constant-0dB-peak-gain bandpass."""
    w0 = 2 * np.pi * f0 / fs
    alpha = np.sin(w0) * np.sinh(np.log(2) / 2 * (bw_hz / f0) * w0 / np.sin(w0))
    b = [alpha, 0.0, -alpha]
    a = [1 + alpha, -2 * np.cos(w0), 1 - alpha]
    return _normalize(b, a)


def biquad_low_shelf(f0: float, slope: float, gain_db: float, fs: float) -> np.ndarray:
    A = 10.0 ** (gain_db / 40.0)
    w0 = 2 * np.pi * f0 / fs
    alpha = np.sin(w0) / 2 * np.sqrt((A + 1 / A) * (1 / slope - 1) + 2)
    cw = np.cos(w0)
    two_sqrtA_alpha = 2 * np.sqrt(A) * alpha
    b = [A * ((A + 1) - (A - 1) * cw + two_sqrtA_alpha),
         2 * A * ((A - 1) - (A + 1) * cw),
         A * ((A + 1) - (A - 1) * cw - two_sqrtA_alpha)]
    a = [(A + 1) + (A - 1) * cw + two_sqrtA_alpha,
         -2 * ((A - 1) + (A + 1) * cw),
         (A + 1) + (A - 1) * cw - two_sqrtA_alpha]
    return _normalize(b, a)


def biquad_high_shelf(f0: float, slope: float, gain_db: float, fs: float) -> np.ndarray:
    A = 10.0 ** (gain_db / 40.0)
    w0 = 2 * np.pi * f0 / fs
    alpha = np.sin(w0) / 2 * np.sqrt((A + 1 / A) * (1 / slope - 1) + 2)
    cw = np.cos(w0)
    two_sqrtA_alpha = 2 * np.sqrt(A) * alpha
    b = [A * ((A + 1) + (A - 1) * cw + two_sqrtA_alpha),
         -2 * A * ((A - 1) + (A + 1) * cw),
         A * ((A + 1) + (A - 1) * cw - two_sqrtA_alpha)]
    a = [(A + 1) - (A - 1) * cw + two_sqrtA_alpha,
         2 * ((A - 1) - (A + 1) * cw),
         (A + 1) - (A - 1) * cw - two_sqrtA_alpha]
    return _normalize(b, a)


def biquad_peak(f0: float, bw_hz: float, gain_db: float, fs: float) -> np.ndarray:
    A = 10.0 ** (gain_db / 40.0)
    w0 = 2 * np.pi * f0 / fs
    alpha = np.sin(w0) * np.sinh(np.log(2) / 2 * (bw_hz / f0) * w0 / np.sin(w0))
    b = [1 + alpha * A, -2 * np.cos(w0), 1 - alpha * A]
    a = [1 + alpha / A, -2 * np.cos(w0), 1 - alpha / A]
    return _normalize(b, a)


# ---------------------------------------------------------------------------
# IIR audio bandpass — replaces the reference's ARMA lattice coefficient
# files (`filters/iir_*.c`, arm_iir_lattice_f32 "PreFilter").  We design an
# elliptic cascade-of-biquads with equivalent band edges per filter path;
# SURVEY §7 "hard parts" #6 sanctions a validated biquad re-design.
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def audio_bandpass_sos(f_lo: float, f_hi: float, fs: float,
                       order: int = 10, rp: float = 0.05,
                       rs: float = 60.0) -> np.ndarray:
    """Elliptic bandpass (or lowpass when f_lo <= 0) as (n_sections, 5)
    [b0,b1,b2,a1,a2] rows, f64."""
    nyq = fs / 2
    f_hi = min(f_hi, 0.98 * nyq)
    if f_lo <= 0:
        z, p, k = sps.ellip(order, rp, rs, f_hi / nyq, btype="low", output="zpk")
    else:
        z, p, k = sps.ellip(order // 2, rp, rs, [f_lo / nyq, f_hi / nyq],
                            btype="band", output="zpk")
    sos = sps.zpk2sos(z, p, k)
    return np.concatenate([sos[:, :3], sos[:, 4:]], axis=1)


# ---------------------------------------------------------------------------
# Goertzel coefficient (reference: `audio_filter.c:1281-1303`,
# AudioFilter_CalcGoertzel)
# ---------------------------------------------------------------------------

def goertzel_coeff(freq_hz: float, fs: float) -> float:
    return 2.0 * np.cos(2.0 * np.pi * freq_hz / fs)
