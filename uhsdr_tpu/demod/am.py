"""AM envelope demodulation with WDSP fade leveler.

Reference: `AudioDriver_DemodSAM` DEMOD_AM branch (`audio_driver.c:2011-2024`)
— envelope ``sqrt(I^2+Q^2)`` per sample, then the fade leveler
(`AudioDriver_FadeLeveler` `audio_driver.c:1911-1923`):

    dc        = mtauR*dc + (1-mtauR)*audio        (tauR = 0.02 s)
    dc_insert = mtauI*dc_insert + (1-mtauI)*corr  (tauI = 1.4 s)
    out       = audio + dc_insert - dc

Both smoothers are linear one-poles -> associative scan, no serial loop.
For plain AM the reference passes corr=0, so dc_insert stays 0 and the
fade leveler is a slow DC tracker/subtractor.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..ops import iir


class FadeLevelerParams(NamedTuple):
    mtauR: jnp.ndarray   # exp(-1/(fs*0.02))
    mtauI: jnp.ndarray   # exp(-1/(fs*1.4))


def fade_leveler_params(fs: float) -> FadeLevelerParams:
    return FadeLevelerParams(
        mtauR=np.float32(np.exp(-1.0 / (fs * 0.02))),
        mtauI=np.float32(np.exp(-1.0 / (fs * 1.4))),
    )


class FadeLevelerState(NamedTuple):
    dc: jnp.ndarray        # (...,)
    dc_insert: jnp.ndarray # (...,)


def fade_leveler_init(batch_shape) -> FadeLevelerState:
    z = jnp.zeros(batch_shape, jnp.float32)
    return FadeLevelerState(dc=z, dc_insert=z)


def fade_leveler(params: FadeLevelerParams, state: FadeLevelerState,
                 audio: jnp.ndarray, corr: jnp.ndarray | None):
    """corr=None means a structurally-zero corr input (plain AM): the
    dc_insert one-pole then has the closed form dci[n] = mtauI^(n+1) *
    dci0 — no filtering pass at all."""
    dc, dc_last = iir.one_pole_block(params.mtauR, 1.0 - params.mtauR,
                                     state.dc, audio)
    if corr is None:
        T = audio.shape[-1]
        decay = jnp.asarray(
            np.power(np.float64(params.mtauI), np.arange(1, T + 1))
            .astype(np.float32))
        dci = state.dc_insert[..., None] * decay
        dci_last = dci[..., -1]
    else:
        dci, dci_last = iir.one_pole_block(params.mtauI, 1.0 - params.mtauI,
                                           state.dc_insert, corr)
    out = audio + dci - dc
    return out, FadeLevelerState(dc=dc_last, dc_insert=dci_last)


def demod(iq: jnp.ndarray, params: FadeLevelerParams,
          state: FadeLevelerState, fade_leveler_on: bool = True):
    """iq: (..., T) complex at decimated rate -> (audio, new_state)."""
    env = jnp.abs(iq)
    if fade_leveler_on:
        return fade_leveler(params, state, env, None)
    return env, state
