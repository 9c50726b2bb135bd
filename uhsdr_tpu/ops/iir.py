"""IIR filtering as parallel (associative-scan) linear recurrences.

Replaces the reference's `arm_biquad_cascade_df1_f32` EQ banks
(`audio_driver.c:994-1054`), `arm_iir_lattice_f32` audio bandpass
(`audio_driver.c:2475`), and the many first-order smoothers scattered
through the chain (FM de-emphasis/HPF `audio_driver.c:1544-1737`, fade
leveler `:1911-1923`, squelch averaging, AGC DC blocker
`audio_agc.c:577-594`).

TPU-first design: a biquad is the linear state-space recurrence
``s[n] = A s[n-1] + B x[n]``, ``y[n] = C s[n-1] + D x[n]`` (direct-form II
transposed).  Prefix-composition of the affine maps ``(A, B x[n])`` under
``(A2, b2) o (A1, b1) = (A2 A1, A2 b1 + b2)`` is associative, so the whole
time axis runs in O(log T) depth via `lax.associative_scan` — fully
parallel over channels and time on the VPU, instead of the reference's
per-sample serial loop.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _affine_compose2(e1, e2):
    """Compose batched 2x2 affine maps held COMPONENT-WISE: each element
    is its own (..., T) array, scanned along the last axis.

    LAYOUT NOTE (TPU): carrying the map as stacked (..., T, 2, 2) /
    (..., T, 2) tensors puts the tiny 2x2 in the trailing (tiled) dims —
    XLA pads each (2,2) to a full tile, a measured 64x HBM blowup that
    OOMs at 512ch x 16k on v5e (8 GB temp per pad).  Component arrays
    keep (channels, T) in the trailing dims and tile densely.
    e2 AFTER e1 (associative_scan passes (earlier, later))."""
    a11, a12, a21, a22, c1, c2 = e1
    d11, d12, d21, d22, e1_, e2_ = e2
    r11 = d11 * a11 + d12 * a21
    r12 = d11 * a12 + d12 * a22
    r21 = d21 * a11 + d22 * a21
    r22 = d21 * a12 + d22 * a22
    rb1 = d11 * c1 + d12 * c2 + e1_
    rb2 = d21 * c1 + d22 * c2 + e2_
    return r11, r12, r21, r22, rb1, rb2


def biquad_block(coeffs: jnp.ndarray, state: jnp.ndarray, x: jnp.ndarray):
    """One biquad over a block via associative scan.

    coeffs: (..., 5) [b0,b1,b2,a1,a2] broadcastable against x's batch dims.
    state:  (..., 2) DF2T state [s1, s2].
    x:      (..., T).
    Returns (y (..., T), new_state (..., 2)).
    """
    b0, b1, b2, a1, a2 = [coeffs[..., i] for i in range(5)]
    # DF2T: y = b0 x + s1;  s1' = b1 x - a1 y + s2;  s2' = b2 x - a2 y
    # State transition (s = [s1, s2]):
    #   s1' = -a1 s1 + s2 + (b1 - a1 b0) x
    #   s2' = -a2 s1      + (b2 - a2 b0) x
    a11 = jnp.broadcast_to(jnp.asarray(-a1, x.dtype)[..., None], x.shape)
    a12 = jnp.ones_like(x)
    a21 = jnp.broadcast_to(jnp.asarray(-a2, x.dtype)[..., None], x.shape)
    a22 = jnp.zeros_like(x)
    g1 = b1 - a1 * b0
    g2 = b2 - a2 * b0
    c1 = g1[..., None] * x
    c2 = g2[..., None] * x
    A11, A12, A21, A22, B1, B2 = jax.lax.associative_scan(
        _affine_compose2, (a11, a12, a21, a22, c1, c2), axis=-1)
    # s[n] = As[n] s_init + bs[n]
    s1_0 = state[..., 0:1]
    s2_0 = state[..., 1:2]
    s1 = A11 * s1_0 + A12 * s2_0 + B1      # (..., T)
    s1_prev = jnp.concatenate([s1_0, s1[..., :-1]], axis=-1)
    y = b0[..., None] * x + s1_prev
    s2_last = (A21[..., -1] * state[..., 0] + A22[..., -1] * state[..., 1]
               + B2[..., -1])
    return y, jnp.stack([s1[..., -1], s2_last], axis=-1)


def biquad_cascade_block(sos: jnp.ndarray, state: jnp.ndarray, x: jnp.ndarray):
    """Cascade of biquads.  sos: (n_sections, ..., 5); state: (n_sections, ..., 2)."""
    n_sections = sos.shape[0]

    def body(carry, sec):
        y = carry
        c, s = sec
        y2, s2 = biquad_block(c, s, y)
        return y2, s2

    # small fixed cascade — unrolled python loop keeps XLA fusion simple
    states_out = []
    y = x
    for i in range(n_sections):
        y, s2 = biquad_block(sos[i], state[i], y)
        states_out.append(s2)
    return y, jnp.stack(states_out, axis=0)


def one_pole_block(a: jnp.ndarray, b: jnp.ndarray, state: jnp.ndarray,
                   x: jnp.ndarray):
    """First-order recurrence y[n] = a*y[n-1] + b*x[n] via associative scan.

    a, b broadcastable over x batch dims (scalars or (...,)); state (...,).
    Returns (y (..., T), y[-1]).
    """
    T = x.shape[-1]
    a_full = jnp.broadcast_to(jnp.asarray(a, x.dtype)[..., None], x.shape)
    bx = jnp.asarray(b, x.dtype)[..., None] * x

    def compose(e1, e2):
        a1, c1 = e1
        a2, c2 = e2
        return a2 * a1, a2 * c1 + c2

    As, Cs = jax.lax.associative_scan(compose, (a_full, bx), axis=-1)
    y = As * state[..., None] + Cs
    return y, y[..., -1]


def dc_blocker_block(r: float, state: jnp.ndarray, x: jnp.ndarray):
    """One-pole DC removal y[n] = x[n] - x[n-1] + r*y[n-1]
    (reference AGC AM DC blocker, `audio_agc.c:577-594`, r=0.9999).
    state: (..., 2) = [x_prev, y_prev]."""
    x_prev = state[..., 0]
    y_prev = state[..., 1]
    xd = jnp.concatenate([x_prev[..., None], x], axis=-1)
    diff = xd[..., 1:] - xd[..., :-1]
    y, y_last = one_pole_block(jnp.asarray(r, x.dtype), jnp.asarray(1.0, x.dtype),
                               y_prev, diff)
    new_state = jnp.stack([x[..., -1], y_last], axis=-1)
    return y, new_state


def iir_lattice_block(k_coeffs: jnp.ndarray, v_coeffs: jnp.ndarray,
                      state: jnp.ndarray, x: jnp.ndarray):
    """ARMA lattice-ladder filter (arm_iir_lattice_f32 semantics) — the
    reference's audio "PreFilter" bandpass (`audio_driver.c:2475` with
    pk/pv tables from `filters/iir_*.c`).

    Per-sample lattice is serial in both stage and time; we convert the
    lattice to direct-form (b, a) on the host instead — see
    `design.audio_bandpass_sos` for the preferred re-design.  This function
    implements the exact lattice by scanning time with an inner stage loop;
    use only for conformance testing (slow path).

    k_coeffs: (M,) reflection; v_coeffs: (M+1,) ladder; state: (..., M+1).
    """
    M = k_coeffs.shape[0]

    def step(s, xn):
        # going down the lattice
        f = xn
        g_new = [None] * (M + 1)
        for m in range(M - 1, -1, -1):
            f = f - k_coeffs[m] * s[..., m]
            g_new[m + 1] = k_coeffs[m] * f + s[..., m]
        g_new[0] = f
        g = jnp.stack(g_new, axis=-1)
        y = jnp.sum(g * v_coeffs, axis=-1)
        return g, y

    def scan_fn(s, xn):
        s2, y = step(s, xn)
        return s2, y

    xs = jnp.moveaxis(x, -1, 0)
    state2, ys = jax.lax.scan(scan_fn, state, xs)
    return jnp.moveaxis(ys, 0, -1), state2


def sos_init_state(sos: np.ndarray, batch_shape: tuple[int, ...]) -> jnp.ndarray:
    return jnp.zeros((sos.shape[0],) + batch_shape + (2,), jnp.float32)
