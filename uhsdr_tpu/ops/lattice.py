"""IIR lattice ARMA filter — the `arm_iir_lattice_f32` analog.

The reference's audio bandpass ("PreFilter") and interpolation anti-alias
stages are lattice ARMA filters with per-bandwidth pk/pv coefficient sets
(`drivers/audio/filters/iir_*.c`, bound in `audio_filter.c:1115-1151`,
run at `audio_driver.c:2475` and `:2583`).  This implements the exact
CMSIS-DSP recurrence (arm_iir_lattice_f32.c scalar path):

    f = x[n]
    for m in 0..N-1:            # pk stored stage-reversed (k_N first)
        g_old    = state[m]
        f        = f - pk[m] * g_old
        g_new[m] = f * pk[m] + g_old
        acc     += g_new[m] * pv[m]
    y[n]  = acc + f * pv[N]
    state = [g_new[1], ..., g_new[N-1], f]      # one-slot shift

TPU mapping: per-sample recurrence -> `lax.scan` over the block axis
with the N-stage inner loop unrolled (N <= 12 in all reference sets);
batched over channels by broadcasting.  State is (..., N) f32.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def init_state(batch_shape, num_stages: int) -> jnp.ndarray:
    return jnp.zeros(tuple(batch_shape) + (num_stages,), jnp.float32)


def iir_lattice_block(pk: np.ndarray, pv: np.ndarray, state: jnp.ndarray,
                      x: jnp.ndarray):
    """x: (..., B) f32; state: (..., N).  Returns (y, new_state).

    pk (N,) / pv (N+1,) are compile-time constants (numpy), in CMSIS
    storage order as imported by `uhsdr_tpu.data.lattice`.
    """
    pk = np.asarray(pk, np.float32)
    pv = np.asarray(pv, np.float32)
    N = pk.shape[0]
    assert pv.shape[0] == N + 1, (pk.shape, pv.shape)
    if N == 0:
        return x, state

    xs = jnp.moveaxis(x, -1, 0)           # (B, ...)

    def step(g, xn):
        f = xn
        acc = xn * pv[N] * 0.0
        new_g = []
        for m in range(N):
            g_old = g[..., m]
            f = f - pk[m] * g_old
            gn = f * pk[m] + g_old
            acc = acc + gn * pv[m]
            new_g.append(gn)
        acc = acc + f * pv[N]
        new_g.append(f)
        g2 = jnp.stack(new_g[1:], axis=-1)
        return g2, acc

    g, ys = jax.lax.scan(step, state, xs)
    return jnp.moveaxis(ys, 0, -1), g


def iir_lattice_ref(pk, pv, x, state=None, dtype=np.float64):
    """Scalar NumPy port — the conformance oracle counterpart.
    dtype=np.float32 reproduces the firmware's float arithmetic exactly
    (needed where a downstream quantizer integrates rounding decisions,
    e.g. the FM TX phase accumulator).  Returns (y, final_state)."""
    pk = np.asarray(pk, dtype)
    pv = np.asarray(pv, dtype)
    N = len(pk)
    g = np.zeros(N, dtype) if state is None \
        else np.asarray(state, dtype).copy()
    y = np.empty(len(x), dtype)
    for n, xn in enumerate(np.asarray(x, dtype)):
        f = xn
        acc = 0.0
        new_g = np.empty(N + 1, dtype)
        for m in range(N):
            g_old = g[m]
            f = f - pk[m] * g_old
            gn = f * pk[m] + g_old
            acc += gn * pv[m]
            new_g[m] = gn
        acc += f * pv[N]
        new_g[N] = f
        g = new_g[1:]
        y[n] = acc
    return y, g
