"""Pallas TPU kernels for elementwise-with-boundary hot ops.

`fm_disc_pallas` — the FM differential discriminator
``atan2(Im(conj(z[n-1]) z[n]), Re(conj(z[n-1]) z[n]))``
(`AudioDriver_DemodFM`, `audio_driver.c:1544-1737`).  XLA's atan2 at
48 kHz full rate measured 11.75 ms at 8192ch x 16k on v5e; this kernel
reads the raw planes once, forms the one-sample-delayed product with an
in-tile shift (prev-tile halo via a shifted BlockSpec, carried boundary
column for the first tile), applies the polynomial atan2 shared with the
SAM PLL kernel, and writes the audio once — pure HBM-bound.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pll import _atan2


def _disc_kernel(zr_ref, zi_ref, pr_ref, pi_ref, cr_ref, ci_ref, o_ref):
    ti = pl.program_id(1)
    W = zr_ref.shape[1]
    # previous sample column: carried boundary for the first tile, last
    # column of the previous tile (128-wide halo view) otherwise
    prev_r = jnp.where(ti == 0, cr_ref[:], pr_ref[:, -1:])
    prev_i = jnp.where(ti == 0, ci_ref[:], pi_ref[:, -1:])
    zr = zr_ref[:]
    zi = zi_ref[:]
    zr_d = jnp.concatenate([prev_r, zr[:, :W - 1]], axis=1)
    zi_d = jnp.concatenate([prev_i, zi[:, :W - 1]], axis=1)
    re = zr_d * zr + zi_d * zi
    im = zr_d * zi - zi_d * zr
    o_ref[:] = _atan2(im, re)


def fm_disc_pallas(prev_col, zr: jnp.ndarray, zi: jnp.ndarray,
                   tile_c: int = 128, tile_t: int = 512,
                   interpret: bool = False):
    """prev_col: (C, 2) f32 [re, im] of z[-1] (the carried boundary);
    zr/zi: (C, T) f32.  Returns the discriminator audio (C, T) f32.
    Requires C % tile_c == 0, T % tile_t == 0, tile_t % 128 == 0."""
    C, T = zr.shape
    assert C % tile_c == 0 and T % tile_t == 0 and tile_t % 128 == 0
    ratio = tile_t // 128

    def halo_idx(i, j):
        # last 128 columns of the previous tile (j==0 uses the carry)
        return (i, jnp.maximum(j * ratio - 1, 0))

    out, = pl.pallas_call(
        _disc_kernel,
        grid=(C // tile_c, T // tile_t),
        in_specs=[
            pl.BlockSpec((tile_c, tile_t), lambda i, j: (i, j)),
            pl.BlockSpec((tile_c, tile_t), lambda i, j: (i, j)),
            pl.BlockSpec((tile_c, 128), halo_idx),
            pl.BlockSpec((tile_c, 128), halo_idx),
            pl.BlockSpec((tile_c, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((tile_c, 1), lambda i, j: (i, 1)),
        ],
        out_specs=[pl.BlockSpec((tile_c, tile_t), lambda i, j: (i, j))],
        out_shape=[jax.ShapeDtypeStruct((C, T), jnp.float32)],
        interpret=interpret,
    )(zr, zi, zr, zi, prev_col[:, 0:1], prev_col[:, 1:2])
    return out
