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
    """4-stage decimated-rate cascade [notch, peak, bass shelf, unity]."""
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
    while len(rows) < 4:
        rows.append(design.biquad_passthrough())
    return np.stack(rows).astype(np.float32)


def rx_biquad2_sos(s: EqSettings, fs: float = 48000.0) -> np.ndarray:
    """Treble shelf at the full rate (after interpolation)."""
    if s.treble_gain_db != 0.0:
        row = design.biquad_high_shelf(3500.0, 0.7, s.treble_gain_db, fs)
    else:
        row = design.biquad_passthrough()
    return row[None].astype(np.float32)


def tx_eq_sos(s: EqSettings, fs: float = 48000.0) -> np.ndarray:
    rows = []
    if s.bass_gain_db != 0.0:
        rows.append(design.biquad_low_shelf(300.0, 0.7, s.bass_gain_db, fs))
    if s.treble_gain_db != 0.0:
        rows.append(design.biquad_high_shelf(2500.0, 0.7, s.treble_gain_db, fs))
    if not rows:
        rows.append(design.biquad_passthrough())
    return np.stack(rows).astype(np.float32)
