"""TX voice compressor / look-ahead ALC (KA7OEI design).

Reference: `TxProcessor_VoiceCompressor` (`tx_processor.c:173-245`) with
constants `audio_driver.h:403-406`: ALC_VAL_MAX=1, ALC_VAL_MIN=0.001,
ALC_ATTACK=0.1, ALC_KNEE=30000.  Per sample:

    alc_var = |x * alc_val|/KNEE - 1
    alc_var < 0:  alc_val -= alc_val * decay  * alc_var    (slow gain-up)
    else:         alc_val -= alc_val * ATTACK * alc_var    (fast gain-down)
    clip alc_val to [MIN, MAX]

The gain is applied to audio *delayed* by a fixed number of samples so the
attack leads the audio (click-free).  The recurrence is nonlinear in
alc_val -> `lax.scan`, with the delay as a block-level carry.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

ALC_VAL_MAX = 1.0
ALC_VAL_MIN = 0.001
ALC_ATTACK = 0.1
ALC_KNEE = 30000.0


class AlcParams(NamedTuple):
    decay: np.float32       # per-sample decay coefficient (menu-settable)
    delay: int              # look-ahead delay in samples
    postfilt_gain: np.float32
    gain_scaling: np.float32


def make_params(decay: float = 0.02, delay: int = 64,
                postfilt_gain: float = 4.0,
                gain_scaling: float = 1.0) -> AlcParams:
    return AlcParams(np.float32(decay), delay,
                     np.float32(postfilt_gain / 2.0 + 0.5),
                     np.float32(gain_scaling))


class AlcState(NamedTuple):
    alc_val: jnp.ndarray    # (...,)
    delay_buf: jnp.ndarray  # (..., delay)


def init_state(batch_shape, params: AlcParams) -> AlcState:
    bs = tuple(batch_shape)
    return AlcState(alc_val=jnp.ones(bs, jnp.float32),
                    delay_buf=jnp.zeros(bs + (params.delay,), jnp.float32))


def run(params: AlcParams, state: AlcState, x: jnp.ndarray):
    """x: (..., T) audio.  Returns (y, new_state)."""
    x = x * params.postfilt_gain

    def step(alc_val, xn):
        alc_var = jnp.abs(xn * alc_val) / ALC_KNEE - 1.0
        below = alc_var < 0
        new_val = jnp.where(
            below,
            alc_val - alc_val * params.decay * alc_var,
            jnp.maximum(alc_val - alc_val * ALC_ATTACK * alc_var,
                        ALC_VAL_MIN))
        new_val = jnp.minimum(new_val, ALC_VAL_MAX)
        return new_val, new_val

    xt = jnp.moveaxis(x, -1, 0)
    alc_f, gains = jax.lax.scan(step, state.alc_val, xt, unroll=8)
    gains = jnp.moveaxis(gains, 0, -1) * params.gain_scaling

    # delayed audio, immediate gain (look-ahead)
    xfull = jnp.concatenate([state.delay_buf, x], axis=-1)
    delayed = xfull[..., : x.shape[-1]]
    y = delayed * gains
    return y, AlcState(alc_val=alc_f, delay_buf=xfull[..., -params.delay:])
