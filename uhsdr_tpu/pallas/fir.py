"""Pallas TPU kernel: batched decimating complex FIR on the MXU.

The RX chain's hottest op is the front-end analytic bandpass + decimate
(199 complex taps over every input sample, SURVEY §7 "speed-of-light
targets").  The XLA path (`ops/fir.py`) either FFTs (VPU-bound, and the
FFT length rounds 1.25x up to a power of two) or gathers frames then
matmuls (materializes a taps-times-larger frame tensor in HBM).  This
kernel:

  * tiles (channels x time) over a grid; each input slab is staged once
    into VMEM with its `taps-1` halo;
  * expresses "decimating FIR" as one (TC, K) @ (K, TT) matmul against a
    shifted-diagonal tap matrix — MXU-native, no frame gather in HBM;
  * complex x complex = 4 real matmuls (real split);
  * streaming carry contract identical to `ops/fir.fir_decimate_block`.

Grid: (C/TC, To/TT) with To = T/decim outputs; each program computes a
(TC, TT) output tile from a (TC, TT*decim + taps - 1) input slab.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fir_kernel(xr_ref, xi_ref, hr_ref, hi_ref, or_ref, oi_ref,
                *, decim: int, taps: int, tile_t: int):
    """One (TC, tile_t) output tile.

    xr/xi: (TC, tile_t*decim + taps-1) input slab (VMEM)
    hr/hi: (taps_pad, tile_t) per-output-phase tap matrix — h arranged so
           out[c, m] = sum_k x[c, m*decim + k] * h[k]; we compute it as
           a (TC, K) @ (K, tile_t) matmul with a shifted-diagonal tap
           matrix, K = tile_t*decim + taps-1 (dense but MXU-native).
    """
    xr = xr_ref[:]
    xi = xi_ref[:]
    hr = hr_ref[:]
    hi = hi_ref[:]
    rr = jnp.dot(xr, hr, preferred_element_type=jnp.float32)
    ii = jnp.dot(xi, hi, preferred_element_type=jnp.float32)
    ri = jnp.dot(xr, hi, preferred_element_type=jnp.float32)
    ir = jnp.dot(xi, hr, preferred_element_type=jnp.float32)
    or_ref[:] = rr - ii
    oi_ref[:] = ri + ir


def _build_tap_matrix(h: np.ndarray, decim: int, tile_t: int,
                      k_pad: int) -> np.ndarray:
    """(k_pad, tile_t), logical K = tile_t*decim + taps-1 rows (rest zero):
    col m holds h reversed at row offset m*decim, so
    (x_slab @ H)[c, m] = sum_k h[k] * x[c, m*decim + taps-1 - k]
    (= causal FIR at output phase m, matching fir_decimate_block).
    k_pad rounds K up to the TPU lane multiple (128); padded rows are
    zero so clamped/garbage slab columns contribute nothing."""
    taps = h.shape[-1]
    H = np.zeros((k_pad, tile_t), h.dtype)
    hrev = h[::-1]
    for m in range(tile_t):
        H[m * decim: m * decim + taps, m] = hrev
    return H


def fir_decimate_pallas(h: jnp.ndarray, carry: jnp.ndarray, x: jnp.ndarray,
                        decim: int, tile_c: int = 8, tile_t: int = 512,
                        interpret: bool = False):
    """Drop-in for `ops.fir.fir_decimate_block` backed by the Pallas MXU
    kernel.  x: (C, B) complex64; carry: (C, taps-1) complex64.
    Requires C % tile_c == 0 and (B//decim) % tile_t == 0."""
    taps = h.shape[-1]
    B = x.shape[-1]
    xfull = jnp.concatenate([carry.astype(x.dtype), x], axis=-1)
    h_np = np.asarray(h)
    C = x.shape[0]
    T_out = B // decim
    n_tt = T_out // tile_t
    slab_logical = tile_t * decim + taps - 1
    slab = -(-slab_logical // 128) * 128     # lane-aligned tile width
    Hr = jnp.asarray(_build_tap_matrix(np.real(h_np).astype(np.float32),
                                       decim, tile_t, slab))
    Hi = jnp.asarray(_build_tap_matrix(np.imag(h_np).astype(np.float32),
                                       decim, tile_t, slab))
    # overlapping slabs: pallas BlockSpec slices are non-overlapping, so
    # pre-frame the input into per-tile slabs with halo (gather clamps at
    # the right edge; those columns hit zero tap-matrix rows)
    starts = np.arange(n_tt) * tile_t * decim
    idx = starts[:, None] + np.arange(slab)[None, :]       # (n_tt, slab)
    idx = np.minimum(idx, xfull.shape[-1] - 1)
    xr_sl = jnp.real(xfull)[:, idx]                        # (C, n_tt, slab)
    xi_sl = jnp.imag(xfull)[:, idx]
    # lay tiles side by side so the (i, j) grid block (tile_c, slab)
    # addresses tile j's slab (BlockSpec slices are non-overlapping)
    xr2 = xr_sl.reshape(C, n_tt * slab)
    xi2 = xi_sl.reshape(C, n_tt * slab)

    grid = (C // tile_c, n_tt)
    out_shape = [jax.ShapeDtypeStruct((C, T_out), jnp.float32),
                 jax.ShapeDtypeStruct((C, T_out), jnp.float32)]
    kernel = functools.partial(_fir_kernel, decim=decim, taps=taps,
                               tile_t=tile_t)
    yr, yi = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_c, slab), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_c, slab), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_c, tile_t), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_c, tile_t), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=out_shape,
        interpret=interpret,
    )(xr2, xi2, Hr, Hi)
    y = jax.lax.complex(yr, yi)
    new_carry = xfull[..., -(taps - 1):]
    return y, new_carry
