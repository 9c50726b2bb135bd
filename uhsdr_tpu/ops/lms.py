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


# --- WDSP variable-leak LMS ("leaky LMS", audio_driver.c:490-577) --------

class LeakyLmsParams(NamedTuple):
    num_taps: int         # 64
    delay: int            # 16
    two_mu: jnp.ndarray   # 0.0001 ("gain")
    gamma: jnp.ndarray    # 0.1 ("leakage")
    lidx_min: jnp.ndarray
    lidx_max: jnp.ndarray
    den_mult: jnp.ndarray  # 6.25e-10
    lincr: jnp.ndarray
    ldecr: jnp.ndarray
    output_error: bool    # True = notch (error out), False = NR (pred out)


def leaky_lms_params(notch: bool = False, num_taps: int = 64,
                     delay: int = 16, two_mu: float = 1e-4,
                     gamma: float = 0.1) -> LeakyLmsParams:
    """Defaults from AudioDriver_Dsp_Init (audio_driver.c:490-514)."""
    return LeakyLmsParams(
        num_taps=num_taps, delay=delay,
        two_mu=np.float32(two_mu), gamma=np.float32(gamma),
        lidx_min=np.float32(0.0), lidx_max=np.float32(200.0),
        den_mult=np.float32(6.25e-10), lincr=np.float32(1.0),
        ldecr=np.float32(3.0), output_error=notch)


class LeakyLmsState(NamedTuple):
    weights: jnp.ndarray   # (..., num_taps)
    history: jnp.ndarray   # (..., num_taps + delay)
    lidx: jnp.ndarray      # (...,) leakage index walk
    ngamma: jnp.ndarray    # (...,) current leakage


def leaky_lms_init(batch_shape, params: LeakyLmsParams) -> LeakyLmsState:
    bs = tuple(batch_shape)
    return LeakyLmsState(
        weights=jnp.zeros(bs + (params.num_taps,), jnp.float32),
        history=jnp.zeros(bs + (params.num_taps + params.delay,),
                          jnp.float32),
        lidx=jnp.full(bs, 120.0, jnp.float32),
        ngamma=jnp.full(bs, 0.001, jnp.float32))


def leaky_lms_run(params: LeakyLmsParams, state: LeakyLmsState,
                  x: jnp.ndarray):
    """Exact `AudioDriver_LeakyLmsNr` recurrence (audio_driver.c:521-577):
    per-sample NLMS with a variable leakage driven by the nel/nev
    comparison walk of lidx.  x: (..., T) -> (y, new_state)."""
    L = params.num_taps
    two_mu = params.two_mu

    def step(carry, xn):
        w, hist, lidx, ngamma = carry
        hist = jnp.concatenate([hist[..., 1:], xn[..., None]], axis=-1)
        ref = hist[..., :L]                  # delayed by delay..delay+L-1
        y = jnp.sum(w * ref, axis=-1)
        sigma = jnp.sum(ref * ref, axis=-1)
        inv_sigp = 1.0 / (sigma + 1e-10)
        err = xn - y
        out = err if params.output_error else y

        nel = jnp.abs(err * (1.0 - two_mu * sigma * inv_sigp))
        nev = jnp.abs(xn - (1.0 - two_mu * ngamma) * y
                      - two_mu * err * sigma * inv_sigp)
        lidx = jnp.where(nev < nel,
                         jnp.minimum(lidx + params.lincr, params.lidx_max),
                         jnp.maximum(lidx - params.ldecr, params.lidx_min))
        ngamma = params.gamma * (lidx * lidx) * (lidx * lidx) * params.den_mult
        c0 = 1.0 - two_mu * ngamma
        c1 = two_mu * err * inv_sigp
        w = c0[..., None] * w + c1[..., None] * ref
        return (w, hist, lidx, ngamma), out

    xt = jnp.moveaxis(x, -1, 0)
    (w, hist, lidx, ngamma), ys = jax.lax.scan(
        step, (state.weights, state.history, state.lidx, state.ngamma), xt,
        unroll=4)
    return jnp.moveaxis(ys, 0, -1), LeakyLmsState(w, hist, lidx, ngamma)


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
