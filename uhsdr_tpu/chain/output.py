"""RX audio output stage — the tail of `AudioDriver_RxProcessor`
(`audio_driver.c:2845-2941`): AF gain scaling, mute, keyboard-beep tone
injection (`softdds_addSingleTone`), and saturating conversion to the
output sample range.

The reference runs this per 32-sample block inside the ISR; here it is a
pure jittable block function, batched over channels.  Mute and beep gate
are runtime *array* inputs (not config), matching the reference where
`ads.af_disabled` / `ads.beep_active` flip between blocks without a chain
rebuild.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import nco

IQ_RATE = 48000.0


class OutputParams(NamedTuple):
    gain: np.ndarray          # f32 linear AF gain (incl. 1/full_scale)
    beep_delta: np.ndarray    # uint32 NCO increment for the beep tone
    beep_level: np.ndarray    # f32 additive beep amplitude


class OutputState(NamedTuple):
    beep_phase: jnp.ndarray   # (...,) uint32


def make_params(af_gain: int = 16, beep_freq_hz: float = 1000.0,
                beep_volume: int = 10, fs: float = IQ_RATE,
                input_full_scale: float = 32768.0) -> OutputParams:
    """af_gain 0..30 and beep_volume 0..20 use the registry ranges
    (`core.config`); the reference's volume law is quadratic-ish in the
    encoder value (`audio_driver.c` vol scaling) — modeled as value^2
    normalized to 1.0 at the default.

    input_full_scale: the audio sample value mapped to output 1.0.  The
    RX chain's audio is at the firmware's int16-ish scale (the WDSP AGC
    normalizes to out_target = 4096 of +-32768 full scale,
    `audio_agc.c:209-229`), so the default mirrors the reference's
    float->int16 saturating cast; pass 1.0 for unit-scale audio."""
    g = (float(af_gain) / 16.0) ** 2 / float(input_full_scale)
    beep = 0.1 * (float(beep_volume) / 10.0) ** 2
    return OutputParams(
        gain=np.float32(g),
        beep_delta=nco.freq_to_delta(beep_freq_hz, fs),
        beep_level=np.float32(beep),
    )


def init_state(batch_shape) -> OutputState:
    return OutputState(beep_phase=jnp.zeros(tuple(batch_shape), jnp.uint32))


def output_block(params: OutputParams, state: OutputState, audio: jnp.ndarray,
                 mute=False, beep=False):
    """audio: (..., T) f32.  mute/beep: python bool, or (...,) f32/bool
    arrays gating per channel.  Returns (audio_out clipped to [-1, 1],
    new_state)."""
    T = audio.shape[-1]
    y = audio * params.gain

    mute_f = jnp.asarray(mute, jnp.float32)
    y = y * (1.0 - (mute_f[..., None] if mute_f.ndim else mute_f))

    beep_f = jnp.asarray(beep, jnp.float32)
    tone_blk, new_phase = nco.tone(
        state.beep_phase,
        jnp.broadcast_to(jnp.asarray(params.beep_delta),
                         state.beep_phase.shape), T)
    y = y + tone_blk * params.beep_level * (
        beep_f[..., None] if beep_f.ndim else beep_f)

    # saturating output conversion (the reference's float->int16 clamp)
    y = jnp.clip(y, -1.0, 1.0)
    return y, OutputState(beep_phase=new_phase)
