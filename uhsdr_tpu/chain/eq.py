"""Biquad EQ banks — the reference's RX/TX tone controls.

Reference: `AudioDriver_SetRxTxAudioProcessingAudioFilters`
(`audio_driver.c:994-1054`): RX biquad1 = 4-stage cascade (manual notch,
manual peak, bass shelf, +1 spare) at the decimated rate, biquad2 =
treble shelf at 48 kHz after interpolation; TX = bass + treble.
Coefficient designers are the RBJ formulas in `ops.design`
(CalcBandstop/CalcBandpass/CalcHighShelf/CalcLowShelf/CalcNotch,
`audio_driver.c:831-992`).
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..ops import design


@dataclass(frozen=True)
class EqSettings:
    """The reference's tone-control settings (config registry rows)."""
    manual_notch_hz: float = 0.0     # 0 = off
    manual_notch_bw: float = 100.0
    manual_peak_hz: float = 0.0      # 0 = off
    manual_peak_bw: float = 100.0
    bass_gain_db: float = 0.0        # low shelf at 250 Hz
    treble_gain_db: float = 0.0      # high shelf at 3.5 kHz


def rx_biquad1_sos(s: EqSettings, fs_dec: float) -> np.ndarray:
    """Decimated-rate cascade [notch, peak, bass shelf] — the reference's
    4-stage biquad1.  Inactive stages are unity biquads there; here they
    are PRUNED at design time (exact: a unity biquad is y=x in floating
    point too), so neutral tone settings cost nothing — the cascades were
    ~13 ms of a 48 ms chain at 8192ch x 16k."""
    rows = []
    if s.manual_notch_hz > 0:
        rows.append(design.biquad_bandstop(
            min(s.manual_notch_hz, 0.45 * fs_dec), s.manual_notch_bw, fs_dec))
    if s.manual_peak_hz > 0:
        rows.append(design.biquad_peak(
            min(s.manual_peak_hz, 0.45 * fs_dec), s.manual_peak_bw, 12.0,
            fs_dec))
    if s.bass_gain_db != 0.0:
        rows.append(design.biquad_low_shelf(250.0, 0.7, s.bass_gain_db,
                                            fs_dec))
    if not rows:
        return np.zeros((0, 5), np.float32)
    return np.stack(rows).astype(np.float32)


def rx_biquad2_sos(s: EqSettings, fs: float = 48000.0) -> np.ndarray:
    """Treble shelf at the full rate (after interpolation)."""
    if s.treble_gain_db != 0.0:
        return design.biquad_high_shelf(3500.0, 0.7, s.treble_gain_db,
                                        fs)[None].astype(np.float32)
    return np.zeros((0, 5), np.float32)


def tx_eq_sos(s: EqSettings, fs: float = 48000.0) -> np.ndarray:
    rows = []
    if s.bass_gain_db != 0.0:
        rows.append(design.biquad_low_shelf(300.0, 0.7, s.bass_gain_db, fs))
    if s.treble_gain_db != 0.0:
        rows.append(design.biquad_high_shelf(2500.0, 0.7, s.treble_gain_db, fs))
    if not rows:
        return np.zeros((0, 5), np.float32)
    return np.stack(rows).astype(np.float32)
