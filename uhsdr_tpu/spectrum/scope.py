"""Spectrum scope / waterfall analytics, dBm estimation, SNAP carrier
tuner, zoom FFT.

Reference: `drivers/ui/lcd/ui_spectrum.c` —
  * display pipeline (`UiSpectrum_RedrawSpectrum:1350-1522`): IQ ring
    buffer -> Hann window -> 256/512/1024-pt cfft -> magnitude -> IIR
    time-averaging -> quadrant reorder -> dBm + SNAP -> scope/waterfall;
  * dBm (`UiSpectrum_CalculateDBm:1990+`): integrate magnitude bins over
    the filter passband; dbm = 19.8*log10(sum) + dbm_constant - 225
    (empirical slope by DL8MBY), dBm/Hz subtracts 10*log10(bandwidth);
  * SNAP (`UiSpectrum_CalculateSnap:1876-1989`): peak bin + 3-point
    Jacobsen-Kootsookos interpolation (P=1.36 for Hann), 0.2/0.8 exponential
    smoothing, CW sidetone / BPSK offset corrections;
  * zoom FFT (`audio_driver.c:1860-1909`): 2..32x magnification by lowpass
    + decimation ahead of the FFT (here: polyphase decimation).

All outputs are per-channel observability signals (the LCD rendering of
the reference becomes data consumers can plot/stream).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import design, fftutil, fir

IQ_RATE = 48000.0
DBM_SLOPE = 19.8
SCOPE_PREAMP_GAIN = 1.0


class ScopeParams(NamedTuple):
    fft_len: int            # 256 | 512 | 1024
    magnify: int            # 0..5 -> 1x..32x zoom
    avg_alpha: float        # spectrum IIR averaging constant
    dbm_constant: float
    translate_hz: float
    f_lo: float             # filter passband (audio Hz)
    f_hi: float
    mode: str               # usb | lsb | am | sam | cw | fm
    zoom_fir: np.ndarray | None


def make_params(fft_len: int = 256, magnify: int = 0,
                avg_alpha: float = 0.25, dbm_constant: float = 0.0,
                translate_hz: float = 6000.0, f_lo: float = 150.0,
                f_hi: float = 2850.0, mode: str = "usb") -> ScopeParams:
    zoom_fir = None
    if magnify > 0:
        decim = 1 << magnify
        zoom_fir = design.decimation_fir(127, decim, IQ_RATE).astype(np.float32)
    return ScopeParams(fft_len, magnify, avg_alpha, dbm_constant,
                       translate_hz, f_lo, f_hi, mode, zoom_fir)


class ScopeState(NamedTuple):
    iq_tail: jnp.ndarray     # (..., fft_len) last IQ samples (post zoom)
    zoom_carry: jnp.ndarray  # (..., taps-1) zoom decimator history
    avg_mag: jnp.ndarray     # (..., fft_len) averaged magnitudes
    snap_freq: jnp.ndarray   # (...,) smoothed carrier estimate (Hz rel. dial)


def init_state(batch_shape, params: ScopeParams) -> ScopeState:
    bs = tuple(batch_shape)
    taps = params.zoom_fir.shape[-1] - 1 if params.zoom_fir is not None else 0
    return ScopeState(
        iq_tail=jnp.zeros(bs + (params.fft_len,), jnp.complex64),
        zoom_carry=jnp.zeros(bs + (taps,), jnp.complex64),
        avg_mag=jnp.zeros(bs + (params.fft_len,), jnp.float32),
        snap_freq=jnp.zeros(bs, jnp.float32))


def _passband_bins(params: ScopeParams):
    """(posbin, Lbin, Ubin, bin_bw) mirroring UiSpectrum_CalculateDBm."""
    n = params.fft_len
    decim = 1 << params.magnify
    bin_bw = IQ_RATE / decim / n
    if params.magnify == 0:
        # with fftshift layout, the dial (translate offset) sits ABOVE the
        # spectrum center by translate_hz
        bin_offset = params.translate_hz / bin_bw
    else:
        bin_offset = 0.0
    posbin = n // 2 + bin_offset     # center after fftshift
    lo, hi = params.f_lo, params.f_hi
    if params.mode in ("am", "sam", "fm"):
        bw_lower, bw_upper = -hi, hi
    elif params.mode == "lsb":
        bw_lower, bw_upper = -hi, -lo
    else:
        bw_lower, bw_upper = lo, hi
    lbin = int(np.clip(round(posbin + bw_lower / bin_bw), 0, n - 1))
    ubin = int(np.clip(round(posbin + bw_upper / bin_bw), lbin + 1, n - 1))
    return posbin, lbin, ubin, bin_bw


def process(params: ScopeParams, state: ScopeState, iq: jnp.ndarray):
    """iq: (..., T) complex64 raw (pre-translate) IQ tap @48 kHz.

    Returns (outputs dict, new_state).  outputs:
      spectrum  (..., fft_len)  averaged linear magnitudes (fftshifted,
                                ascending frequency)
      dbm       (...,)          integrated passband power estimate
      dbm_hz    (...,)
      snap_freq (...,)          carrier offset estimate (Hz, rel. dial)
    """
    zoom_carry = state.zoom_carry
    if params.magnify > 0:
        decim = 1 << params.magnify
        iq, zoom_carry = fir.fir_decimate_block(
            jnp.asarray(params.zoom_fir), zoom_carry, iq, decim)

    n = params.fft_len
    buf = jnp.concatenate([state.iq_tail, iq], axis=-1)[..., -n:]
    win = jnp.asarray(fftutil.hann(n))
    F = fftutil.cfft(buf * win, n)
    mag = jnp.abs(F)
    # fftshift so bins ascend in frequency (reference reorders quadrants)
    mag = jnp.roll(mag, n // 2, axis=-1)

    avg = state.avg_mag + params.avg_alpha * (mag - state.avg_mag)

    posbin, lbin, ubin, bin_bw = _passband_bins(params)
    band = avg[..., lbin:ubin + 1] * SCOPE_PREAMP_GAIN
    sum_db = jnp.sum(band, axis=-1)
    dbm = jnp.where(
        sum_db > 0,
        DBM_SLOPE * jnp.log10(jnp.maximum(sum_db, 1e-20))
        + (params.dbm_constant - 225.0 - (3.0 if n == 1024 else 0.0)),
        -145.0)
    dbm_hz = dbm - 10.0 * np.log10((ubin - lbin) * bin_bw)

    # --- SNAP carrier estimate ---
    rel = jnp.argmax(band, axis=-1)
    maxbin = rel + lbin
    maxbin = jnp.clip(maxbin, 1, n - 2)
    b1 = jnp.take_along_axis(avg, maxbin[..., None] - 1, axis=-1)[..., 0]
    b2 = jnp.take_along_axis(avg, maxbin[..., None], axis=-1)[..., 0]
    b3 = jnp.take_along_axis(avg, maxbin[..., None] + 1, axis=-1)[..., 0]
    denom = jnp.maximum(b1 + b2 + b3, 1e-8)
    delta2 = bin_bw * (1.36 * (b3 - b1)) / denom
    delta2 = jnp.where(jnp.abs(delta2) > bin_bw, 0.0, delta2)
    # (no reference "+1" here: that term compensates its quadrant-reorder
    # indexing, which the fftshift layout doesn't have — validated to
    # <1 Hz on clean carriers)
    delta1 = (maxbin - posbin) * bin_bw
    delta = delta1 + delta2
    snap = 0.2 * delta + 0.8 * state.snap_freq

    new_state = ScopeState(iq_tail=buf, zoom_carry=zoom_carry,
                           avg_mag=avg, snap_freq=snap)
    outputs = {"spectrum": avg, "dbm": dbm, "dbm_hz": dbm_hz,
               "snap_freq": snap}
    return outputs, new_state


def waterfall_row(spectrum: jnp.ndarray, floor_db: float = -20.0,
                  range_db: float = 60.0) -> jnp.ndarray:
    """Log-scale a spectrum row to 0..255 palette indices (the reference's
    waterfall palette mapping, `ui_spectrum.c:1099+`)."""
    db = 20.0 * jnp.log10(jnp.maximum(spectrum, 1e-12))
    scaled = (db - floor_db) / range_db
    return jnp.clip(scaled * 255.0, 0.0, 255.0).astype(jnp.float32)


class WaterfallImage:
    """Rolling waterfall display buffer with automatic floor tracking.

    The reference scrolls palette rows down the LCD and auto-adjusts the
    display floor from the running spectrum statistics
    (`ui_spectrum.c:1099-1348`, floor AGC around `:1466-1500`).  Here the
    "display" is a (rows, fft_len) numpy image of palette indices per
    channel consumer; the floor tracks the 10th percentile of each row
    with one-pole smoothing so weak-signal detail stays visible.
    """

    def __init__(self, fft_len: int, rows: int = 128, range_db: float = 60.0,
                 floor_alpha: float = 0.1):
        self.image = np.zeros((rows, fft_len), np.uint8)
        self.range_db = float(range_db)
        self.floor_alpha = float(floor_alpha)
        self.floor_db = -20.0
        self._filled = 0

    def push(self, spectrum: np.ndarray) -> None:
        """spectrum: (fft_len,) linear magnitudes (one channel)."""
        db = 20.0 * np.log10(np.maximum(np.asarray(spectrum), 1e-12))
        target_floor = float(np.percentile(db, 10.0))
        self.floor_db += self.floor_alpha * (target_floor - self.floor_db)
        row = np.clip((db - self.floor_db) / self.range_db * 255.0,
                      0.0, 255.0).astype(np.uint8)
        self.image = np.roll(self.image, 1, axis=0)
        self.image[0] = row
        self._filled = min(self._filled + 1, self.image.shape[0])


# S-meter: dBm -> S units (the reference's FFT/dBm-based S-meter path,
# `ui_driver.c:241-275` S_Meter_Cal_dbm: S1 = -121 dBm, 6 dB per S-unit
# to S9 = -73 dBm, then 5 dB per displayed "+dB over S9" step)
def dbm_to_s_units(dbm) -> "jnp.ndarray":
    """Returns fractional S-units (1.0 = S1 ... 9.0 = S9; above S9 each
    +5 dB adds 1.0, i.e. 10.0 = S9+5, 11.0 = S9+10 ...)."""
    dbm = jnp.asarray(dbm)
    below = 9.0 + (dbm - (-73.0)) / 6.0          # 6 dB per S-unit
    above = 9.0 + (dbm - (-73.0)) / 5.0          # 5 dB per +step
    s = jnp.where(dbm <= -73.0, below, above)
    return jnp.clip(s, 0.0, 9.0 + 15.0)
