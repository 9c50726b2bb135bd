"""Pallas TPU kernel: biquad-cascade IIR in ONE pass over HBM.

The XLA dilated-scan implementation (`ops.iir.biquad_block`) materializes
every scan level to HBM — log2(T) full passes per section (measured
83 ms for one 48 kHz biquad at 8192ch x 16k on v5e).  This kernel reads
each input tile into VMEM once, runs the whole dilated scan (and the
whole CASCADE of sections) on the VMEM-resident tile, and writes the
output tile once; the 2-word-per-section carry lives in a scratch buffer
that persists across the sequential time-tile sweep.

Layout: time in SUBLANES, channels in LANES — the cross-time shifts of
the dilated scan are then sublane shifts, and the per-channel carry is a
natural lane vector.  Callers hand (C, T); the transposes in/out are two
cheap XLA passes next to the dozens this kernel removes.

Coefficients are Python floats closed over at trace time (one compiled
kernel per chain config, like every other design constant here); the
per-level matrix powers A^(2^l) are computed on the host.

Reference role: `arm_biquad_cascade_df1_f32` (`audio_driver.c:994-1054`)
and the IIR-lattice audio bandpass it replaces (SURVEY §2.1).
"""
from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _level_matrices(b0, b1, b2, a1, a2, n_levels):
    """Host-side: A and its repeated squares for one section."""
    A = np.array([[-a1, 1.0], [-a2, 0.0]], np.float64)
    mats = []
    M = A.copy()
    for _ in range(n_levels):
        mats.append(M.astype(np.float32))
        M = M @ M
    return mats


def _make_kernel(sos: np.ndarray, t_tile: int, n_t: int):
    S = sos.shape[0]
    n_levels = int(np.log2(t_tile))
    assert 2 ** n_levels == t_tile
    sections = []
    for s in range(S):
        b0, b1, b2, a1, a2 = [float(v) for v in sos[s]]
        sections.append((b0, b1, b2, a1, a2,
                         _level_matrices(b0, b1, b2, a1, a2, n_levels)))

    def kernel(x_ref, st_ref, y_ref, stout_ref, scratch):
        ti = pl.program_id(1)

        @pl.when(ti == 0)
        def _init():
            scratch[:] = st_ref[:]

        x = x_ref[:]                       # (t_tile, Cl) f32
        sc = scratch[:]                    # (S, 2, Cl) value — all indexing
        zrow_shape = x.shape[1:]           # below is static value slicing
        new_rows = []
        for s, (b0, b1, b2, a1, a2, mats) in enumerate(sections):
            g1 = np.float32(b1 - a1 * b0)
            g2 = np.float32(b2 - a2 * b0)
            s1_0 = sc[s, 0, :]             # (Cl,)
            s2_0 = sc[s, 1, :]
            c1 = g1 * x
            c2 = g2 * x
            # fold the carried state into row 0: u[0] += A @ s0
            init1 = np.float32(-a1) * s1_0 + s2_0
            init2 = np.float32(-a2) * s1_0
            row0 = c1[0, :] + init1
            c1 = jnp.concatenate([row0[None, :], c1[1:, :]], axis=0)
            row0b = c2[0, :] + init2
            c2 = jnp.concatenate([row0b[None, :], c2[1:, :]], axis=0)
            d = 1
            for M in mats:
                m11, m12 = np.float32(M[0, 0]), np.float32(M[0, 1])
                m21, m22 = np.float32(M[1, 0]), np.float32(M[1, 1])
                z = jnp.zeros((d,) + zrow_shape, jnp.float32)
                c1s = jnp.concatenate([z, c1[:-d, :]], axis=0)
                c2s = jnp.concatenate([z, c2[:-d, :]], axis=0)
                c1, c2 = c1 + m11 * c1s + m12 * c2s, c2 + m21 * c1s + m22 * c2s
                d *= 2
            # y[t] = b0 x[t] + s1[t-1]
            s1_prev = jnp.concatenate([s1_0[None, :], c1[:-1, :]], axis=0)
            y = np.float32(b0) * x + s1_prev
            # NB: negative scalar indices lower to dynamic_slice, which
            # Pallas TPU cannot lower — use explicit static indices
            last = x.shape[0] - 1
            new_rows.append(jnp.stack([c1[last, :], c2[last, :]], axis=0))
            x = y
        new_sc = jnp.stack(new_rows, axis=0)
        scratch[:] = new_sc
        y_ref[:] = x
        stout_ref[:] = new_sc

    return kernel


def _powers(A: np.ndarray, n: int):
    """Host-side: [A^1, A^2, ..., A^n] at f64."""
    out = [A]
    for _ in range(n - 1):
        out.append(out[-1] @ A)
    return out


def _make_kernel_grouped(sos: np.ndarray, t_tile: int, L: int):
    """Work-efficient two-level scan: the Hillis-Steele dilated scan does
    8*log2(t_tile) ops/sample/section; this does
    ~8*(2 + log2(t_tile/L)/L) — split each tile into G = t_tile/L groups
    of L samples, then

      phase 1: sequential local scans within groups (L-1 steps, each a
               (G, Cl) vector op — the sequential axis is SHORT, the
               vector axis is the whole group dim);
      phase 2: dilated scan over the G group-end states with transition
               A^L (log2(G) levels on (G, Cl) — 1/L of the data);
      phase 3: broadcast correction u[g,l] = v[g,l] + A^(l+1) q[g] with
               q = shifted group prefixes (L independent vector ops).

    ~4x less arithmetic at t_tile=2048, L=16 than the dilated kernel.
    """
    S = sos.shape[0]
    G = t_tile // L
    assert G * L == t_tile
    n_levels_g = int(np.log2(G))
    assert 2 ** n_levels_g == G
    sections = []
    for s in range(S):
        b0, b1, b2, a1, a2 = [float(v) for v in np.asarray(sos, np.float64)[s]]
        A = np.array([[-a1, 1.0], [-a2, 0.0]], np.float64)
        Apow = _powers(A, L)                    # A^1 .. A^L
        AL_sq = []                              # (A^L)^(2^k)
        M = Apow[-1].copy()
        for _ in range(n_levels_g):
            AL_sq.append(M.astype(np.float32))
            M = M @ M
        sections.append((b0, b1, b2, a1, a2,
                         [P.astype(np.float32) for P in Apow], AL_sq))

    def kernel(x_ref, st_ref, y_ref, stout_ref, scratch):
        ti = pl.program_id(1)

        @pl.when(ti == 0)
        def _init():
            scratch[:] = st_ref[:]

        x = x_ref[:]                            # (t_tile, Cl)
        sc = scratch[:]
        Cl = x.shape[1]
        new_rows = []
        for s, (b0, b1, b2, a1, a2, Apow, AL_sq) in enumerate(sections):
            g1 = np.float32(b1 - a1 * b0)
            g2 = np.float32(b2 - a2 * b0)
            s1_0 = sc[s, 0, :]
            s2_0 = sc[s, 1, :]
            c1 = g1 * x
            c2 = g2 * x
            init1 = np.float32(-a1) * s1_0 + s2_0
            init2 = np.float32(-a2) * s1_0
            c1 = jnp.concatenate([(c1[0, :] + init1)[None], c1[1:, :]], axis=0)
            c2 = jnp.concatenate([(c2[0, :] + init2)[None], c2[1:, :]], axis=0)
            c1g = c1.reshape(G, L, Cl)
            c2g = c2.reshape(G, L, Cl)
            # phase 1: local scans (unrolled; per-l values as Python list).
            # Only the LAST v2 is live at any step (a22 = 0), which keeps
            # the kernel's VMEM stack at ~2 tile-equivalents.
            a11 = np.float32(-a1)
            a21 = np.float32(-a2)
            v1 = [c1g[:, 0, :]]
            v2_prev = c2g[:, 0, :]
            v2_last = v2_prev
            for l in range(1, L):
                v1.append(c1g[:, l, :] + a11 * v1[-1] + v2_prev)
                v2_last = c2g[:, l, :] + a21 * v1[-2]
                v2_prev = v2_last
            # phase 2: dilated scan over group ends with A^L powers
            e1, e2 = v1[-1], v2_last            # (G, Cl)
            d = 1
            for M in AL_sq:
                m11, m12 = np.float32(M[0, 0]), np.float32(M[0, 1])
                m21, m22 = np.float32(M[1, 0]), np.float32(M[1, 1])
                z = jnp.zeros((d, Cl), jnp.float32)
                e1s = jnp.concatenate([z, e1[:-d, :]], axis=0)
                e2s = jnp.concatenate([z, e2[:-d, :]], axis=0)
                e1, e2 = e1 + m11 * e1s + m12 * e2s, e2 + m21 * e1s + m22 * e2s
                d *= 2
            # q[g] = global end state of group g-1
            zrow = jnp.zeros((1, Cl), jnp.float32)
            q1 = jnp.concatenate([zrow, e1[:-1, :]], axis=0)
            q2 = jnp.concatenate([zrow, e2[:-1, :]], axis=0)
            # phase 3: u[g,l] = v[g,l] + A^(l+1) q[g].  Only the s1
            # component feeds y; s2 is needed only for the final carry.
            u1 = []
            for l in range(L):
                P = Apow[l]                     # A^(l+1)
                p11, p12 = np.float32(P[0, 0]), np.float32(P[0, 1])
                u1.append(v1[l] + p11 * q1 + p12 * q2)
            PL = Apow[L - 1]
            u2_last = (v2_last + np.float32(PL[1, 0]) * q1
                       + np.float32(PL[1, 1]) * q2)
            s1 = jnp.stack(u1, axis=1).reshape(t_tile, Cl)
            # y[t] = b0 x[t] + s1[t-1]
            s1_prev = jnp.concatenate([s1_0[None, :], s1[:-1, :]], axis=0)
            y = np.float32(b0) * x + s1_prev
            # NB: negative scalar indices lower to dynamic_slice, which
            # Pallas TPU cannot lower — use explicit static indices
            new_rows.append(jnp.stack([u1[L - 1][G - 1, :],
                                       u2_last[G - 1, :]], axis=0))
            x = y
        new_sc = jnp.stack(new_rows, axis=0)
        scratch[:] = new_sc
        y_ref[:] = x
        stout_ref[:] = new_sc

    return kernel


def _make_blocked_kernel(S: int):
    """Fused blocked-cascade kernel body (see biquad_cascade_blocked_pallas).

    Per grid step (one R-sample chunk of one channel tile), with u the
    carried per-channel cascade state vector (c_tile, 2S) in VMEM:

        y  = x @ M  + u @ HS      (zero-state Toeplitz + carried-state resp)
        u' = x @ G  + u @ F^T     (chunk end-states)

    Four MXU dots at HIGHEST precision; the sequential chunk recurrence
    rides the grid's time axis, so the whole cascade is ONE read and ONE
    write of HBM per sample.
    """

    def kernel(x_ref, m_ref, g_ref, hs_ref, ft_ref, st_ref,
               y_ref, stout_ref, carry):
        ti = pl.program_id(1)

        @pl.when(ti == 0)
        def _init():
            carry[:] = st_ref[:]

        hi = jax.lax.Precision.HIGHEST
        x = x_ref[:]                        # (c_tile, R)
        u = carry[:]                        # (c_tile, 2S)
        y_ref[:] = (jnp.dot(x, m_ref[:], preferred_element_type=jnp.float32,
                            precision=hi)
                    + jnp.dot(u, hs_ref[:], preferred_element_type=jnp.float32,
                              precision=hi))
        u_new = (jnp.dot(x, g_ref[:], preferred_element_type=jnp.float32,
                         precision=hi)
                 + jnp.dot(u, ft_ref[:], preferred_element_type=jnp.float32,
                           precision=hi))
        carry[:] = u_new
        stout_ref[:] = u_new

    return kernel


def biquad_cascade_blocked_pallas(sos: np.ndarray, state: jnp.ndarray,
                                  x: jnp.ndarray, R: int = 128,
                                  c_tile: int | None = None,
                                  interpret: bool | None = None):
    """Whole-cascade blocked-matmul biquads fused into ONE Pallas pass.

    Same math as `ops.iir.biquad_cascade_blocked(..., exact_carry=True)`
    — the host-precomputed chunk tables (M Toeplitz, G/HS state couplers,
    F chunk transition; `ops.iir._cascade_blocked_tables`) — but instead
    of XLA materializing y_loc / s_in / the scanned carries as separate
    HBM arrays plus T/R tiny scan launches, the chunk sweep rides the
    Pallas grid with the carry vector persistent in VMEM scratch.  The
    chain's audio SOS stage measured 4.2 ms standalone under the XLA
    einsum structure vs a ~0.3 ms HBM/MXU bound (PERF.md); this kernel
    closes that gap while keeping the numerically exact sequential
    chunk-boundary recurrence (~129 dB on the reference high-Q lattice
    SOS, where dilated F-powers collapse to ~52 dB).

    sos: STATIC host numpy (S, 5); state (S, ..., 2); x (..., T) f32 with
    T % R == 0.  Batch dims are flattened to one channel axis.
    Reference role: `arm_biquad_cascade_df1_f32` / `arm_iir_lattice_f32`
    (`audio_driver.c:994-1054`, `:2475`).
    """
    from ..ops.iir import _cascade_blocked_tables
    sos_np = np.asarray(sos, np.float64)
    S = sos_np.shape[0]
    batch_shape = x.shape[:-1]
    T = x.shape[-1]
    C = int(np.prod(batch_shape)) if batch_shape else 1
    assert T % R == 0, (T, R)
    M_np, HS_np, G_np, F_np = _cascade_blocked_tables(
        tuple(sos_np.reshape(-1).tolist()), R)
    n_t = T // R
    if c_tile is None:
        c_tile = next((d for d in (1024, 512, 256, 128, 64, 32, 16, 8)
                       if C % d == 0), C)
    n_c = C // c_tile
    x2 = x.reshape(C, T).astype(jnp.float32)
    # state (S, ..., 2) -> (C, 2S) row vectors (section-major pairs)
    s_vec = jnp.moveaxis(state, 0, -2).reshape(C, 2 * S).astype(jnp.float32)
    kernel = _make_blocked_kernel(S)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    yv, st_out = pl.pallas_call(
        kernel,
        grid=(n_c, n_t),
        in_specs=[
            pl.BlockSpec((c_tile, R), lambda ci, ti: (ci, ti)),
            pl.BlockSpec((R, R), lambda ci, ti: (0, 0)),
            pl.BlockSpec((R, 2 * S), lambda ci, ti: (0, 0)),
            pl.BlockSpec((2 * S, R), lambda ci, ti: (0, 0)),
            pl.BlockSpec((2 * S, 2 * S), lambda ci, ti: (0, 0)),
            pl.BlockSpec((c_tile, 2 * S), lambda ci, ti: (ci, 0)),
        ],
        out_specs=[
            pl.BlockSpec((c_tile, R), lambda ci, ti: (ci, ti)),
            pl.BlockSpec((c_tile, 2 * S), lambda ci, ti: (ci, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((C, T), jnp.float32),
            jax.ShapeDtypeStruct((C, 2 * S), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((c_tile, 2 * S), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(x2, jnp.asarray(M_np), jnp.asarray(G_np),
      jnp.asarray(HS_np), jnp.asarray(F_np.T.copy()), s_vec)
    new_state = jnp.moveaxis(
        st_out.reshape(batch_shape + (S, 2)), -2, 0)
    return yv.reshape(x.shape), new_state


def biquad_cascade_pallas(sos: np.ndarray, state: jnp.ndarray,
                          x: jnp.ndarray, t_tile: int = 128,
                          c_tile: int = 128, impl: str = "dilated",
                          group_len: int = 32):
    """Drop-in for `ops.iir.biquad_cascade_block` (same math/result).

    sos: host numpy (S, 5); state: (S, C, 2) f32; x: (C, T) f32.
    Returns (y (C, T), new_state (S, C, 2)).

    impl: "grouped" (two-level scan, ~4x less arithmetic) or "dilated"
    (plain Hillis-Steele; kept as the cross-check reference).
    """
    sos = np.asarray(sos, np.float64)
    S = sos.shape[0]
    C, T = x.shape
    t_tile = min(t_tile, T)
    assert T % t_tile == 0, (T, t_tile)
    c_tile = min(c_tile, C)
    assert C % c_tile == 0, (C, c_tile)
    n_c = C // c_tile
    n_t = T // t_tile

    xT = jnp.swapaxes(x, 0, 1)                     # (T, C)
    st2 = jnp.swapaxes(state, 1, 2)                # (S, 2, C)

    if impl == "grouped" and t_tile % group_len == 0 and t_tile > group_len:
        kernel = _make_kernel_grouped(sos, t_tile, group_len)
    else:
        kernel = _make_kernel(sos, t_tile, n_t)
    yT, st_out = pl.pallas_call(
        kernel,
        grid=(n_c, n_t),
        in_specs=[
            pl.BlockSpec((t_tile, c_tile), lambda ci, ti: (ti, ci)),
            pl.BlockSpec((S, 2, c_tile), lambda ci, ti: (0, 0, ci)),
        ],
        out_specs=[
            pl.BlockSpec((t_tile, c_tile), lambda ci, ti: (ti, ci)),
            pl.BlockSpec((S, 2, c_tile), lambda ci, ti: (0, 0, ci)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, C), jnp.float32),
            jax.ShapeDtypeStruct((S, 2, C), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((S, 2, c_tile), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=(jax.default_backend() == "cpu"),
    )(xT, st2)
    return jnp.swapaxes(yT, 0, 1), jnp.swapaxes(st_out, 1, 2)
