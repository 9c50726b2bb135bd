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


def _shift_right(c: jnp.ndarray, d: int) -> jnp.ndarray:
    """c shifted right by d along the last axis, zero-filled at the left."""
    pad = [(0, 0)] * (c.ndim - 1) + [(d, 0)]
    return jnp.pad(c, pad)[..., : c.shape[-1]]


def biquad_block(coeffs: jnp.ndarray, state: jnp.ndarray, x: jnp.ndarray):
    """One biquad over a block via a dilated (Hillis-Steele) affine scan.

    coeffs: (..., 5) [b0,b1,b2,a1,a2] broadcastable against x's batch dims.
    state:  (..., 2) DF2T state [s1, s2].
    x:      (..., T).
    Returns (y (..., T), new_state (..., 2)).

    PERF NOTE (TPU): the state transition matrix A is constant in TIME, so
    the generic 6-component associative scan (2x2 matrix products + offsets)
    collapses to a log2(T)-level dilated scan over just the TWO offset
    components, with the per-level matrix A^(2^l) obtained by repeated
    squaring of per-channel scalars.  The initial state folds into the
    first offset sample (u[0] += A @ s0), so no matrix-power sequence is
    ever materialized.  Measured ~2.5x over lax.associative_scan at
    2048ch x 4096 on v5e (and it was the former's (...,T,2,2) stacked
    layout that OOMed — component arrays tile densely).
    """
    b0, b1, b2, a1, a2 = [jnp.asarray(coeffs[..., i], x.dtype)
                          for i in range(5)]
    # DF2T: y = b0 x + s1;  s1' = b1 x - a1 y + s2;  s2' = b2 x - a2 y
    # State transition (s = [s1, s2]):
    #   s1' = -a1 s1 + s2 + (b1 - a1 b0) x
    #   s2' = -a2 s1      + (b2 - a2 b0) x
    T = x.shape[-1]
    g1 = b1 - a1 * b0
    g2 = b2 - a2 * b0
    c1 = g1[..., None] * x
    c2 = g2[..., None] * x
    # fold the initial state into the first sample: u[0] += A @ s0
    s1_0 = state[..., 0]
    s2_0 = state[..., 1]
    init1 = -a1 * s1_0 + s2_0                  # (A @ s0)[0]
    init2 = -a2 * s1_0                         # (A @ s0)[1]
    c1 = c1.at[..., 0].add(init1)
    c2 = c2.at[..., 0].add(init2)

    # level-0 matrix A (per-channel scalars; broadcast against batch dims)
    m11, m12 = -a1, jnp.ones_like(a1)
    m21, m22 = -a2, jnp.zeros_like(a2)
    d = 1
    while d < T:
        c1s = _shift_right(c1, d)
        c2s = _shift_right(c2, d)
        c1 = c1 + m11[..., None] * c1s + m12[..., None] * c2s
        c2 = c2 + m21[..., None] * c1s + m22[..., None] * c2s
        m11, m12, m21, m22 = (m11 * m11 + m12 * m21, m11 * m12 + m12 * m22,
                              m21 * m11 + m22 * m21, m21 * m12 + m22 * m22)
        d *= 2
    # c is now s[n] (inclusive); y[n] = b0 x[n] + s1[n-1]
    s1_prev = jnp.concatenate([s1_0[..., None], c1[..., :-1]], axis=-1)
    y = b0[..., None] * x + s1_prev
    return y, jnp.stack([c1[..., -1], c2[..., -1]], axis=-1)


import functools as _functools


@_functools.lru_cache(maxsize=None)
def _cascade_blocked_tables(sos_key: tuple, R: int):
    """Whole-CASCADE chunk tables (f64 host simulation): the S-section
    cascade is one LTI system, so the blocked scheme needs only ONE
    Toeplitz contraction regardless of section count.  Basis = R input
    impulses + 2S unit section-states; record the cascade output y and
    every section's end state.

      M  (R, R):   zero-state Toeplitz of the cascade impulse response
      HS (2S, R):  y response to each unit section-state
      G  (R, 2S):  all end states from an impulse at position r
      F  (2S, 2S): all end states from each unit section-state
    """
    sos = np.asarray(sos_key, np.float64).reshape(-1, 5)
    S = sos.shape[0]
    B = R + 2 * S
    xb = np.zeros((B, R))
    xb[:R] = np.eye(R)
    st = np.zeros((B, S, 2))
    for j in range(2 * S):
        st[R + j, j // 2, j % 2] = 1.0
    ys = np.empty((B, R))
    for n in range(R):
        sig = xb[:, n].copy()
        for k in range(S):
            b0, b1, b2, a1, a2 = sos[k]
            y = b0 * sig + st[:, k, 0]
            st[:, k, 0] = b1 * sig - a1 * y + st[:, k, 1]
            st[:, k, 1] = b2 * sig - a2 * y
            sig = y
        ys[:, n] = sig
    ends = st.reshape(B, 2 * S)
    h = ys[0]
    idx = np.arange(R)
    M = np.where(idx[None, :] >= idx[:, None],
                 h[np.clip(idx[None, :] - idx[:, None], 0, R - 1)], 0.0)
    return (M.astype(np.float32), ys[R:].astype(np.float32),
            ends[:R].astype(np.float32), ends[R:].T.astype(np.float32))


def biquad_cascade_blocked(sos: np.ndarray, state: jnp.ndarray,
                           x: jnp.ndarray, R: int = 128,
                           exact_carry: bool | None = None):
    """Blocked-matmul biquad CASCADE — one MXU Toeplitz pass for the
    whole cascade (see `_cascade_blocked_tables`).  sos: STATIC (S, 5)
    numpy; state (S, ..., 2) per-section DF2T states (exact streaming
    continuity).  Drop-in for `biquad_cascade_block`.

    exact_carry: the chunk-boundary recurrence u[c] = F u[c-1] + s_in[c]
    run as a SEQUENTIAL n-step scan of tiny (2S, 2S) affine maps —
    numerically exact-in-f32 (measured 129 dB on the reference high-Q
    lattice SOS vs 52 dB for the dilated pass, whose host-squared
    F^(2^l) powers are hopeless at cond(F) ~ 1e17).  The scan costs n
    launches of (..., 2S) matvecs, so it defaults on for n <= 32 (the
    decimated-rate stages) and the latency-optimal dilated pass stays
    for long-n 48k stages where its f32 error is below those stages'
    needs (non-resonant EQ shelves)."""
    sos_np = np.asarray(sos, np.float64)
    S = sos_np.shape[0]
    T = x.shape[-1]
    n = T // R
    if exact_carry is None:
        exact_carry = n <= 32
    M_np, HS_np, G_np, F = _cascade_blocked_tables(
        tuple(sos_np.reshape(-1).tolist()), R)
    M, HS, G = jnp.asarray(M_np), jnp.asarray(HS_np), jnp.asarray(G_np)
    # state (S, ..., 2) -> (..., 2S)
    s_vec = jnp.moveaxis(state, 0, -2).reshape(
        state.shape[1:-1] + (2 * S,))
    xc = x.reshape(x.shape[:-1] + (n, R))
    hi = jax.lax.Precision.HIGHEST
    y_loc = jnp.einsum("...nr,rs->...ns", xc, M, precision=hi)
    s_in = jnp.einsum("...nr,rj->...nj", xc, G, precision=hi)  # (..., n, 2S)
    s_vec = s_vec.astype(x.dtype)
    if exact_carry:
        Ft = jnp.asarray(np.asarray(F, np.float32).T)

        def _step(prev, sc):
            cur = sc + jnp.einsum("...j,ji->...i", prev, Ft, precision=hi)
            return cur, cur

        _, u = jax.lax.scan(_step, s_vec,
                            jnp.moveaxis(s_in, -2, 0))
        u = jnp.moveaxis(u, 0, -2)
    else:
        # DILATED log-depth pass with host-precomputed F^(2^l) (a
        # lax.scan here is launch-bound on TPU for large n)
        u = s_in.at[..., 0, :].add(
            jnp.einsum("ij,...j->...i", F, s_vec))
        Fd = np.asarray(F, np.float64)
        d = 1
        while d < n:
            pad = [(0, 0)] * (u.ndim - 2) + [(d, 0), (0, 0)]
            shifted = jnp.pad(u, pad)[..., :n, :]
            u = u + jnp.einsum("ij,...nj->...ni",
                               jnp.asarray(Fd.astype(np.float32)), shifted)
            Fd = Fd @ Fd
            d *= 2
    prevs = jnp.concatenate([s_vec[..., None, :], u[..., :-1, :]],
                            axis=-2)                   # (..., n, 2S)
    y = y_loc + jnp.einsum("...nj,jr->...nr", prevs, HS, precision=hi)
    new_state = jnp.moveaxis(
        u[..., -1, :].reshape(s_vec.shape[:-1] + (S, 2)), -2, 0)
    return y.reshape(x.shape), new_state


def biquad_cascade_block(sos: jnp.ndarray, state: jnp.ndarray, x: jnp.ndarray):
    """Cascade of biquads.  sos: (n_sections, ..., 5); state: (n_sections, ..., 2)."""
    n_sections = sos.shape[0]
    if n_sections == 0:           # pruned-empty cascade (e.g. neutral EQ)
        return x, state

    # small fixed cascade — unrolled python loop keeps XLA fusion simple
    states_out = []
    y = x
    for i in range(n_sections):
        y, s2 = biquad_block(sos[i], state[i], y)
        states_out.append(s2)
    return y, jnp.stack(states_out, axis=0)


def biquad_cascade_dispatch(sos, state, x, impl: str = "auto"):
    """Biquad-cascade backend dispatch shared by the RX and TX chains:
    the Pallas single-HBM-pass kernel (`pallas.iir`) when the (C, T)
    shape tiles cleanly, the XLA dilated affine scan otherwise.

    "auto" resolves to Pallas off-CPU: measured 2.07x on the whole SSB
    chain (357 -> 173 ms/block at 8192ch x 16k on v5e) AND 5x faster
    AOT compile; on CPU the interpreter would crawl, so auto stays with
    the scan there (tests, dryrun).  t_tile=128 measured optimal on v5e
    (7.7 ms vs 14.6 at 2048 for the 5-section bandpass at 8192ch x
    4096): the dilated scan does log2(t_tile) levels of full-tile work,
    so small tiles win."""
    sos = np.asarray(sos) if not isinstance(sos, jnp.ndarray) else sos
    if sos.shape[0] == 0:          # pruned-empty cascade (neutral EQ)
        return x, state
    # blocked-matmul path: static numpy coefficients + chunking shape
    # (see `biquad_cascade_blocked` — MXU Toeplitz instead of a sequential
    # VMEM kernel; wins whenever T is long enough to amortize).
    # impl="precise" (conformance-critical stages: the ref PreFilter /
    # anti-alias) also rides it off-CPU since the exact_carry sequential
    # chunk scan holds ~129 dB on the reference high-Q SOS — the dilated
    # F-power pass that used to cap it at ~52 dB is bypassed there.
    blocked_ok = (isinstance(sos, np.ndarray)
                  and not jnp.iscomplexobj(x)
                  and x.shape[-1] % 128 == 0 and x.shape[-1] >= 256)
    if blocked_ok and (impl == "blocked" or (
            impl in ("auto", "precise")
            and jax.default_backend() != "cpu")):
        return biquad_cascade_blocked(
            sos, state, x, exact_carry=True if impl == "precise" else None)
    use_pallas = impl in ("pallas", "precise") or (
        impl == "auto" and jax.default_backend() != "cpu")
    if impl == "precise" and jax.default_backend() == "cpu":
        use_pallas = False         # sequential scan is the CPU precise path
    if use_pallas and x.ndim == 2:
        C, T = x.shape
        t_tile = min(128, T)
        if (T % t_tile == 0 and (t_tile & (t_tile - 1)) == 0
                and C % min(128, C) == 0):
            from ..pallas import iir as pallas_iir
            return pallas_iir.biquad_cascade_pallas(np.asarray(sos), state, x,
                                                    t_tile=t_tile)
    return biquad_cascade_block(jnp.asarray(sos), state, x)


def _one_pole_blocked(af: float, bf: float, state: jnp.ndarray,
                      x: jnp.ndarray, R: int = 128):
    """Blocked-matmul one-pole: y[n] = a*y[n-1] + b*x[n], exact.

    TPU-first structure: split T into R-sample chunks.  Within a chunk
    the zero-state response is a LOWER-TRIANGULAR TOEPLITZ matmul
    ``y_loc[s] = sum_{r<=s} b a^(s-r) x[r]`` — one (..., n, R) @ (R, R)
    MXU contraction (HIGHEST precision: the f32 matmul costs ~R/2 flops
    per sample, trivial).  The chunk boundary values then follow the
    R-times-slower one-pole ``p_{c+1} = a^R p_c + y_loc[c, -1]`` (a tiny
    T/R-step scan on (...,) vectors), and each chunk adds its carried
    boundary via the closed form ``y += a^(s+1) * p_c``.

    Replaces the earlier Pallas degenerate-biquad path: measured 9.9 ms
    for ONE one-pole at 8192ch x 4096 on v5e (small (128,128) grid
    tiles; launch-bound) vs ~0.5 ms for this (one MXU pass + a 32-step
    scan).  The fade leveler / FM de-emphasis / HPF all ride this.
    """
    T = x.shape[-1]
    n = T // R
    idx = np.arange(R)
    e = idx[None, :] - idx[:, None]          # s - r (col - row)
    M = np.where(e >= 0, bf * np.power(af, np.clip(e, 0, None), dtype=np.float64), 0.0)
    M = jnp.asarray(M.astype(np.float32))
    apow = jnp.asarray(np.power(af, idx + 1.0, dtype=np.float64)
                       .astype(np.float32))   # a^(s+1)
    aR = np.float32(np.float64(af) ** R)
    xc = x.reshape(x.shape[:-1] + (n, R))
    y_loc = jnp.einsum("...nr,rs->...ns", xc, M,
                       precision=jax.lax.Precision.HIGHEST)
    ends = y_loc[..., -1]                            # (..., n)
    # chunk-carry one-pole u[c] = aR*u[c-1] + ends[c] (u[-1] = state) as
    # a DILATED log-depth pass — a lax.scan here is launch-bound on TPU
    # (32 tiny steps measured 6+ ms)
    u = ends.at[..., 0].add(aR * state.astype(x.dtype))
    m = np.float64(aR)
    d = 1
    while d < n:
        u = u + np.float32(m) * _shift_right(u, d)
        m = m * m
        d *= 2
    prev = jnp.concatenate([state.astype(x.dtype)[..., None],
                            u[..., :-1]], axis=-1)   # (..., n) carry-in
    y = (y_loc + prev[..., None] * apow).reshape(x.shape)
    return y, u[..., -1]


def one_pole_block(a: jnp.ndarray, b: jnp.ndarray, state: jnp.ndarray,
                   x: jnp.ndarray):
    """First-order recurrence y[n] = a*y[n-1] + b*x[n] via associative scan.

    a, b broadcastable over x batch dims (scalars or (...,)); state (...,).
    Returns (y (..., T), y[-1]).
    """
    T = x.shape[-1]
    # blocked-matmul fast path for STATIC scalar coefficients (see
    # _one_pole_blocked); exact, so enabled on every backend
    if (np.isscalar(a) or (isinstance(a, np.ndarray) and a.ndim == 0)) and \
       (np.isscalar(b) or (isinstance(b, np.ndarray) and b.ndim == 0)):
        af, bf = float(a), float(b)
        if not jnp.iscomplexobj(x) and T % 128 == 0 and T >= 256:
            return _one_pole_blocked(af, bf, state, x)
    a_arr = jnp.asarray(a, x.dtype)
    c = jnp.asarray(b, x.dtype)[..., None] * x
    # fold the initial state into the first sample (same dilated-scan
    # structure as biquad_block: a is constant in time, so the per-level
    # factor a^(2^l) is a repeated-squared scalar, and only the single
    # offset component is scanned)
    c = c.at[..., 0].add(a_arr * state)
    m = a_arr * jnp.ones_like(c[..., 0])
    d = 1
    while d < T:
        c = c + m[..., None] * _shift_right(c, d)
        m = m * m
        d *= 2
    return c, c[..., -1]


def dc_blocker_block(r: float, state: jnp.ndarray, x: jnp.ndarray):
    """One-pole DC removal y[n] = x[n] - x[n-1] + r*y[n-1]
    (reference AGC AM DC blocker, `audio_agc.c:577-594`, r=0.9999).
    state: (..., 2) = [x_prev, y_prev]."""
    x_prev = state[..., 0]
    y_prev = state[..., 1]
    xd = jnp.concatenate([x_prev[..., None], x], axis=-1)
    diff = xd[..., 1:] - xd[..., :-1]
    y, y_last = one_pole_block(float(r), 1.0, y_prev, diff)
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
