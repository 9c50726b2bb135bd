"""Pallas TPU kernel: the SAM (synchronous-AM) PLL recurrence.

Reference: the per-sample Wheatley/WDSP PLL in `AudioDriver_DemodSAM`
(`audio_driver.c:2022-2166`): mix by the loop phase, atan2 phase
detector, clamped 2nd-order loop filter, phase advance by the PREVIOUS
loop output.  Math identical to `demod.sam._pll_scan`'s body.

Same packing as `pallas.agc`: channels as (8 sublanes x 128 lanes) per
sequential step, loop state (phs, fil_out, omega2) in registers across a
`fori_loop`, carried across time tiles in VMEM scratch.  The kernel
emits cos(phs)/sin(phs) per sample — the downstream mixing and sideband
separation need exactly those, so the big transcendental arrays are
computed once, in VMEM.
"""
from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_CARRY = 3   # phs, fil_out, omega2
_TWO_PI = np.float32(2.0 * np.pi)
_HALF_PI = np.float32(0.5 * np.pi)
_PI = np.float32(np.pi)

# atan(t) = t * P(t^2) on [0,1]; Chebyshev LS fit, max |err| 1.4e-7 rad
# in f32 — Mosaic has no atan/atan2 primitive
_ATAN_COEFFS = [np.float32(v) for v in (
    9.9999998808e-01, -3.3333120709e-01, 1.9993714569e-01,
    -1.4213182432e-01, 1.0681361357e-01, -7.5966693572e-02,
    4.3853771637e-02, -1.6826215850e-02, 3.0496316865e-03)]


def _atan2(y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Polynomial atan2 for Pallas kernels (no atan primitive on TPU)."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    hi = jnp.maximum(ax, ay)
    lo = jnp.minimum(ax, ay)
    t = lo / jnp.maximum(hi, np.float32(1e-30))
    s = t * t
    p = _ATAN_COEFFS[-1]
    for c in _ATAN_COEFFS[-2::-1]:
        p = p * s + c
    a = p * t
    a = jnp.where(ay > ax, _HALF_PI - a, a)
    a = jnp.where(x < 0, _PI - a, a)
    return jnp.where(y < 0, -a, a)


def _make_kernel(g1: float, g2: float, om_min: float, om_max: float,
                 t_tile: int):
    g1f, g2f = np.float32(g1), np.float32(g2)
    omn, omx = np.float32(om_min), np.float32(om_max)

    def kernel(zr_ref, zi_ref, st_ref, cos_ref, sin_ref, stout_ref, scratch):
        ti = pl.program_id(1)

        @pl.when(ti == 0)
        def _init():
            scratch[:] = st_ref[:]

        def step(t, carry):
            phs, fil_out, omega2 = carry
            c = jnp.cos(phs)
            s = jnp.sin(phs)
            cos_ref[t] = c
            sin_ref[t] = s
            zr = zr_ref[t]
            zi = zi_ref[t]
            # corr = z * exp(-j*phs)
            corr_re = zr * c + zi * s
            corr_im = zi * c - zr * s
            err = _atan2(corr_im, corr_re)
            del_out = fil_out
            omega2 = jnp.clip(omega2 + g2f * err, omn, omx)
            fil_out = g1f * err + omega2
            phs = jnp.mod(phs + del_out, _TWO_PI)
            return (phs, fil_out, omega2)

        sc = scratch[:]
        carry = jax.lax.fori_loop(0, t_tile, step,
                                  (sc[0], sc[1], sc[2]))
        new_sc = jnp.stack(carry, axis=0)
        scratch[:] = new_sc
        stout_ref[:] = new_sc

    return kernel


N_CARRY_AUDIO = 5   # phs, fil_out, omega2, fade dc, fade dc_insert


def _make_audio_kernel(g1: float, g2: float, om_min: float, om_max: float,
                       mtauR: float, mtauI: float, t_tile: int):
    """PLL + product-detector audio + WDSP fade leveler fused: the
    sideband='both' SAM path needs only ``corr_re`` (already computed
    for the phase detector) run through the two fade one-poles
    (`AudioDriver_DemodSAM` DEMOD_SAM + `AudioDriver_FadeLeveler`,
    `audio_driver.c:1911-1923, 2029-2056`) — one output array instead
    of cos/sin + a separate mix + two filter passes."""
    g1f, g2f = np.float32(g1), np.float32(g2)
    omn, omx = np.float32(om_min), np.float32(om_max)
    mR, mI = np.float32(mtauR), np.float32(mtauI)
    aR, aI = np.float32(1.0 - mtauR), np.float32(1.0 - mtauI)

    def kernel(zr_ref, zi_ref, st_ref, audio_ref, stout_ref, scratch):
        ti = pl.program_id(1)

        @pl.when(ti == 0)
        def _init():
            scratch[:] = st_ref[:]

        def step(t, carry):
            phs, fil_out, omega2, dc, dci = carry
            c = jnp.cos(phs)
            s = jnp.sin(phs)
            zr = zr_ref[t]
            zi = zi_ref[t]
            corr_re = zr * c + zi * s
            corr_im = zi * c - zr * s
            err = _atan2(corr_im, corr_re)
            del_out = fil_out
            omega2 = jnp.clip(omega2 + g2f * err, omn, omx)
            fil_out = g1f * err + omega2
            phs = jnp.mod(phs + del_out, _TWO_PI)
            dc = mR * dc + aR * corr_re
            dci = mI * dci + aI * corr_re
            audio_ref[t] = corr_re + dci - dc
            return (phs, fil_out, omega2, dc, dci)

        sc = scratch[:]
        carry = jax.lax.fori_loop(0, t_tile, step,
                                  (sc[0], sc[1], sc[2], sc[3], sc[4]))
        new_sc = jnp.stack(carry, axis=0)
        scratch[:] = new_sc
        stout_ref[:] = new_sc

    return kernel


def pll_audio_pallas(g1: float, g2: float, om_min: float, om_max: float,
                     mtauR: float, mtauI: float,
                     carry: jnp.ndarray, iq: jnp.ndarray,
                     t_tile: int = 256, sublanes: int = 8):
    """Fused SAM 'both'-sideband demod: carry (5, C) [phs, fil_out,
    omega2, dc, dc_insert]; iq (C, T) complex64.  Returns
    (audio (C, T) f32, new_carry (5, C))."""
    C, T = iq.shape
    w = sublanes * 128
    assert C % w == 0, (C, w)
    t_tile = min(t_tile, T)
    assert T % t_tile == 0, (T, t_tile)
    n_c = C // w
    n_t = T // t_tile
    S = sublanes

    def pack(a):
        return jnp.swapaxes(a, 0, 1).reshape(T, S * n_c, 128)

    zr3 = pack(jnp.real(iq))
    zi3 = pack(jnp.imag(iq))
    st3 = carry.reshape(N_CARRY_AUDIO, S * n_c, 128)

    kernel = _make_audio_kernel(g1, g2, om_min, om_max, mtauR, mtauI,
                                t_tile)
    audio3, st_out = pl.pallas_call(
        kernel,
        grid=(n_c, n_t),
        in_specs=[
            pl.BlockSpec((t_tile, S, 128), lambda ci, ti: (ti, ci, 0)),
            pl.BlockSpec((t_tile, S, 128), lambda ci, ti: (ti, ci, 0)),
            pl.BlockSpec((N_CARRY_AUDIO, S, 128), lambda ci, ti: (0, ci, 0)),
        ],
        out_specs=[
            pl.BlockSpec((t_tile, S, 128), lambda ci, ti: (ti, ci, 0)),
            pl.BlockSpec((N_CARRY_AUDIO, S, 128), lambda ci, ti: (0, ci, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, S * n_c, 128), jnp.float32),
            jax.ShapeDtypeStruct((N_CARRY_AUDIO, S * n_c, 128), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((N_CARRY_AUDIO, S, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=(jax.default_backend() == "cpu"),
    )(zr3, zi3, st3)

    audio = jnp.swapaxes(audio3.reshape(T, C), 0, 1)
    return audio, st_out.reshape(N_CARRY_AUDIO, C)


def pll_pallas(g1: float, g2: float, om_min: float, om_max: float,
               carry: jnp.ndarray, iq: jnp.ndarray, t_tile: int = 256,
               sublanes: int = 8):
    """carry: (3, C) [phs, fil_out, omega2]; iq: (C, T) complex64.
    Returns (cos_phs (C, T), sin_phs (C, T), new_carry (3, C)) where the
    per-sample phase matches `_pll_scan`'s emitted (pre-advance) phases.
    Requires C % (sublanes*128) == 0, T % t_tile == 0.

    sublanes: channels packed per sequential step = sublanes*128.  The
    per-step dependency chain is latency-bound (cos/sin/atan2), so wider
    steps amortize it over more channels when C allows."""
    C, T = iq.shape
    w = sublanes * 128
    assert C % w == 0, (C, w)
    t_tile = min(t_tile, T)
    assert T % t_tile == 0, (T, t_tile)
    n_c = C // w
    n_t = T // t_tile
    S = sublanes

    def pack(a):
        return jnp.swapaxes(a, 0, 1).reshape(T, S * n_c, 128)

    zr3 = pack(jnp.real(iq))
    zi3 = pack(jnp.imag(iq))
    st3 = carry.reshape(N_CARRY, S * n_c, 128)

    kernel = _make_kernel(g1, g2, om_min, om_max, t_tile)
    cos3, sin3, st_out = pl.pallas_call(
        kernel,
        grid=(n_c, n_t),
        in_specs=[
            pl.BlockSpec((t_tile, S, 128), lambda ci, ti: (ti, ci, 0)),
            pl.BlockSpec((t_tile, S, 128), lambda ci, ti: (ti, ci, 0)),
            pl.BlockSpec((N_CARRY, S, 128), lambda ci, ti: (0, ci, 0)),
        ],
        out_specs=[
            pl.BlockSpec((t_tile, S, 128), lambda ci, ti: (ti, ci, 0)),
            pl.BlockSpec((t_tile, S, 128), lambda ci, ti: (ti, ci, 0)),
            pl.BlockSpec((N_CARRY, S, 128), lambda ci, ti: (0, ci, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, S * n_c, 128), jnp.float32),
            jax.ShapeDtypeStruct((T, S * n_c, 128), jnp.float32),
            jax.ShapeDtypeStruct((N_CARRY, S * n_c, 128), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((N_CARRY, S, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=(jax.default_backend() == "cpu"),
    )(zr3, zi3, st3)

    def unpack(a3):
        return jnp.swapaxes(a3.reshape(T, C), 0, 1)

    return unpack(cos3), unpack(sin3), st_out.reshape(N_CARRY, C)
