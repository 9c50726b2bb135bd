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

import functools

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


def biquad_cascade_pallas(sos: np.ndarray, state: jnp.ndarray,
                          x: jnp.ndarray, t_tile: int = 2048,
                          c_tile: int = 128):
    """Drop-in for `ops.iir.biquad_cascade_block` (same math/result).

    sos: host numpy (S, 5); state: (S, C, 2) f32; x: (C, T) f32.
    Returns (y (C, T), new_state (S, C, 2)).
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
