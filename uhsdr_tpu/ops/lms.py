"""Normalized-LMS adaptive filters: automatic notch and "leaky LMS" NR.

Reference: `AudioDriver_NotchFilter` (`audio_driver.c:1746-1774`) wraps
CMSIS `arm_lms_norm_f32` with a decorrelation delay (auto-notch: predict
the tonal component from delayed input, subtract -> error output keeps
speech, kills carriers), and `AudioDriver_LeakyLmsNr`
(`audio_driver.c:521-577`) is the same structure with leakage, output =
prediction (keeps correlated speech, drops noise).

NLMS weight adaptation is inherently per-sample sequential; it runs as a
`lax.scan` over time, vectorized over channels, at the decimated rate.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class LmsParams(NamedTuple):
    num_taps: int
    delay: int
    mu: jnp.ndarray
    leak: jnp.ndarray     # weight leakage (1.0 = none)
    output_error: bool    # True = notch (error out), False = NR (pred out)


def notch_params(num_taps: int = 96, delay: int = 8,
                 mu: float = 0.01) -> LmsParams:
    return LmsParams(num_taps, delay, np.float32(mu), np.float32(1.0), True)


def nr_params(num_taps: int = 64, delay: int = 4, mu: float = 0.02,
              leak: float = 0.9999) -> LmsParams:
    return LmsParams(num_taps, delay, np.float32(mu), np.float32(leak), False)


class LmsState(NamedTuple):
    weights: jnp.ndarray   # (..., num_taps)
    history: jnp.ndarray   # (..., num_taps + delay) recent inputs


def init_state(batch_shape, params: LmsParams) -> LmsState:
    bs = tuple(batch_shape)
    return LmsState(
        weights=jnp.zeros(bs + (params.num_taps,), jnp.float32),
        history=jnp.zeros(bs + (params.num_taps + params.delay,), jnp.float32))


def run(params: LmsParams, state: LmsState, x: jnp.ndarray):
    """x: (..., T).  Returns (y, new_state)."""
    L, D = params.num_taps, params.delay

    def step(carry, xn):
        w, hist = carry
        hist = jnp.concatenate([hist[..., 1:], xn[..., None]], axis=-1)
        ref = hist[..., :L]                 # delayed reference vector
        pred = jnp.sum(w * ref, axis=-1)
        err = xn - pred
        norm = jnp.sum(ref * ref, axis=-1) + 1e-9
        w = params.leak * w + (params.mu * err / norm)[..., None] * ref
        out = err if params.output_error else pred
        return (w, hist), out

    xt = jnp.moveaxis(x, -1, 0)
    (w, hist), ys = jax.lax.scan(step, (state.weights, state.history), xt,
                                 unroll=4)
    return jnp.moveaxis(ys, 0, -1), LmsState(weights=w, history=hist)
