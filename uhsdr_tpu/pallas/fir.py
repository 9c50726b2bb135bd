"""Pallas TPU kernel: batched decimating complex FIR on the MXU.

The RX chain's hottest op is the front-end analytic bandpass + decimate
(199 complex taps over every input sample, SURVEY §7 "speed-of-light
targets").  The XLA path (`ops/fir.py`) either FFTs (VPU-bound, and the
FFT length rounds 1.25x up to a power of two) or gathers frames then
matmuls (materializes a taps-times-larger frame tensor in HBM).  This
kernel:

  * tiles (channels x time) over a grid; each program reads its input
    block plus a left halo taken from the PREVIOUS grid block via a
    second, shifted BlockSpec (v1 pre-framed overlapping slabs with an
    XLA gather — measured 12 ms of a 25 ms kernel at 8192x16k; reading
    the neighbor block again costs only one extra block fetch);
  * expresses "decimating FIR" as one (TC, K) @ (K, TT) matmul against a
    shifted-diagonal tap matrix — MXU-native, no frame gather in HBM;
  * complex x complex = 4 real matmuls (real split);
  * streaming carry contract identical to `ops/fir.fir_decimate_block`:
    the first grid column takes its halo from the carried block history.

Grid: (C/TC, To/TT) with To = T/decim outputs; each program computes a
(TC, TT) output tile from a (TC, pad_left + TT*decim) slab, where
pad_left = taps-1 rounded up to the 128-lane multiple.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# MXU pass precision for the tap matmuls.  DEFAULT (one bf16 pass with
# f32 accumulation) holds full-chain conformance at ~54-56 dB vs the
# float64 oracle — above the >=50 dB bound — at full MXU rate.
# Precision.HIGHEST (multi-pass f32) lifts conformance to ~90 dB but
# measured 6,352 vs 11,771 Msamples/s on the flagship bench (-46%), and
# its staging VMEM forces halved tiles (TILE_C_DIV) — so DEFAULT ships.
# Flip to HIGHEST for verification runs; TILE_C_DIV adapts the callers'
# channel tiles automatically.
_PREC = jax.lax.Precision.DEFAULT
TILE_C_DIV = 2 if _PREC != jax.lax.Precision.DEFAULT else 1


def _fir_kernel(xr_ref, xi_ref, pr_ref, pi_ref, cr_ref, ci_ref,
                hr_ref, hi_ref, or_ref, oi_ref=None, *, pad_left: int,
                mxu_dtype=None, prec=None):
    """One (TC, tile_t) output tile.

    xr/xi: (TC, W) current input block (W = tile_t*decim)
    pr/pi: (TC, W) previous input block (same array, shifted BlockSpec) —
           its last `pad_left` columns are this tile's left halo
    cr/ci: (TC, pad_left) carried history (used by the first time tile)
    hr/hi: (K, tile_t) shifted-diagonal tap matrix, K = pad_left + W
    """
    ti = pl.program_id(1)
    tail_r = jnp.where(ti == 0, cr_ref[:], pr_ref[:])
    tail_i = jnp.where(ti == 0, ci_ref[:], pi_ref[:])
    xr = jnp.concatenate([tail_r, xr_ref[:]], axis=1)   # (TC, K)
    xi = jnp.concatenate([tail_i, xi_ref[:]], axis=1)
    hr = hr_ref[:]
    hi = hi_ref[:]
    if mxu_dtype is not None:
        xr = xr.astype(mxu_dtype)
        xi = xi.astype(mxu_dtype)
        hr = hr.astype(mxu_dtype)
        hi = hi.astype(mxu_dtype)
    rr = jnp.dot(xr, hr, preferred_element_type=jnp.float32, precision=(prec or _PREC))
    ii = jnp.dot(xi, hi, preferred_element_type=jnp.float32, precision=(prec or _PREC))
    or_ref[:] = rr - ii
    if oi_ref is not None:
        ri = jnp.dot(xr, hi, preferred_element_type=jnp.float32, precision=(prec or _PREC))
        ir = jnp.dot(xi, hr, preferred_element_type=jnp.float32, precision=(prec or _PREC))
        oi_ref[:] = ri + ir


_PHASE_SCALE = np.float32(2.0 * np.pi / 2.0 ** 32)


def _fir_kernel_rt_s(xr_ref, xi_ref, cr_ref, ci_ref, hrt_ref, hrb_ref,
                     or_ref, oi_ref=None, pk_ref=None, tr_s=None,
                     ti_s=None, *, pad_left: int, mxu_dtype=None,
                     nco_ref=None, prec=None, in_scale=None,
                     rk_refs=None):
    """Scratch-halo + split-dot variant of `_fir_kernel_rt`:

      * the left halo lives in VMEM scratch (the previous tile's last
        pad_left ROTATED samples), so the neighbor block is never
        re-fetched from HBM (the shifted-BlockSpec halo cost +12.5% of
        the input) and the ti==0 carry rotation happens once;
      * the tap matrix is split at the halo boundary (H = [H_top;
        H_bot]) and the two dots are summed in f32 — no (TC, K) concat
        copy of the slab in VMEM, the single biggest vector-copy in the
        old kernel.

    Requires sequential time-grid execution (dimension_semantics
    ("arbitrary", "arbitrary") and scratch persistence, like
    `pallas/agc`/`pallas/iir`)."""
    ti = pl.program_id(1)
    xr = xr_ref[:]
    xi = xi_ref[:]
    if in_scale is not None:
        # int16 ingest (the reference codec's native sample width,
        # audio_driver.c ADC path): the HBM block is i16 — HALF the f32
        # input traffic of the dominant chain term — converted to
        # normalized f32 (full scale 1.0) in VMEM on load
        xr = xr.astype(jnp.float32) * in_scale
        xi = xi.astype(jnp.float32) * in_scale
    if pk_ref is not None:
        pk = jnp.maximum(jnp.max(jnp.abs(xr), axis=1, keepdims=True),
                         jnp.max(jnp.abs(xi), axis=1, keepdims=True))
        pk_ref[:] = jnp.broadcast_to(pk, pk_ref.shape)
    W = xr.shape[1]
    if nco_ref is not None:
        if rk_refs is not None:
            # static-delta rotor planes (see `_fir_kernel_rt_s2`): no
            # full-rate transcendentals, one per-tile scalar rotor
            rkc_ref, rks_ref, rkcc_ref, rkcs_ref = rk_refs
            ct, st = _tile_rotor(nco_ref, ti, W)
            c = ct * rkc_ref[:] - st * rks_ref[:]
            s = st * rkc_ref[:] + ct * rks_ref[:]
            cc = ct * rkcc_ref[:] - st * rkcs_ref[:]
            sc = st * rkcc_ref[:] + ct * rkcs_ref[:]
        else:
            k = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
            ang = ((nco_ref[0] + nco_ref[1] * (ti * W + k))
                   .astype(jnp.float32) * _PHASE_SCALE)
            c = jnp.cos(ang)
            s = jnp.sin(ang)
            # ti==0 carry rotation: history sample j is at n=-pad_left+j
            kc = jax.lax.broadcasted_iota(jnp.int32, (1, pad_left), 1)
            angc = ((nco_ref[0] + nco_ref[1] * (kc - pad_left))
                    .astype(jnp.float32) * _PHASE_SCALE)
            cc = jnp.cos(angc)
            sc = jnp.sin(angc)
        xr, xi = xr * c - xi * s, xr * s + xi * c
        cr0 = cr_ref[:] * cc - ci_ref[:] * sc
        ci0 = cr_ref[:] * sc + ci_ref[:] * cc
    else:
        cr0 = cr_ref[:]
        ci0 = ci_ref[:]
    tail_r = jnp.where(ti == 0, cr0, tr_s[:])
    tail_i = jnp.where(ti == 0, ci0, ti_s[:])
    tr_s[:] = xr[:, W - pad_left:]
    ti_s[:] = xi[:, W - pad_left:]
    hrt = hrt_ref[:]
    hrb = hrb_ref[:]
    if mxu_dtype is not None:
        xr = xr.astype(mxu_dtype)
        xi = xi.astype(mxu_dtype)
        tail_r = tail_r.astype(mxu_dtype)
        tail_i = tail_i.astype(mxu_dtype)
        hrt = hrt.astype(mxu_dtype)
        hrb = hrb.astype(mxu_dtype)
    p = prec or _PREC
    or_ref[:] = (jnp.dot(tail_r, hrt, preferred_element_type=jnp.float32,
                         precision=p)
                 + jnp.dot(xr, hrb, preferred_element_type=jnp.float32,
                           precision=p))
    if oi_ref is not None:
        oi_ref[:] = (jnp.dot(tail_i, hrt,
                             preferred_element_type=jnp.float32, precision=p)
                     + jnp.dot(xi, hrb,
                               preferred_element_type=jnp.float32,
                               precision=p))


def _tile_rotor(nco_ref, ti, W):
    """Per-tile scalar rotor e^{j(phase0 + delta*W*ti)} as (1, 1) cos/sin.
    int32 multiply wraps mod 2^32 exactly like the uint32 phase math."""
    ang = ((nco_ref[0] + nco_ref[1] * (ti * W))
           .astype(jnp.float32) * _PHASE_SCALE)
    ang = jnp.full((1, 1), ang, jnp.float32)
    return jnp.cos(ang), jnp.sin(ang)


def _fir_kernel_rt_s2(nco_ref, xr_ref, xi_ref, cr_ref, ci_ref, hrt_ref,
                      hrb_ref, gtr_ref, gbr_ref, gti_ref, gbi_ref,
                      c2r_ref, c2i_ref, o_ref, pk_ref, f2r_ref, f2i_ref,
                      tr_s, ti_s, br_s, bi_s, *, pad_left: int, pad2: int,
                      mxu_dtype=None, prec=None, in_scale=None,
                      rk_refs=None):
    """`_fir_kernel_rt_s` with the ref front's STAGE B fused into the
    epilogue: the 199-tap complex Hilbert-combine FIR at fs_dec
    (`chain.rx.stage_b`, audio_driver.c:2748-2790) runs on the stage-A
    output tile while it is still in VMEM — its decimated IQ planes
    never round-trip HBM (0.2 GB/block at the flagship shape) and the
    kernel emits the REAL demodulated audio directly.

    B's left halo is the previous A-output tile's last pad2 samples
    (VMEM scratch br_s/bi_s; the ti==0 history comes from the carried
    `front2_carry` planes c2r/c2i), and its tap matrix splits at the
    halo boundary like A's.  y = Re(zA (*) g) = ar (*) g_r - ai (*) g_i.
    Specialized to the ref-front SSB/CW chains: NCO fused, ADC peaks
    fused, real audio out + (TC, pad2) A-tail planes for the carry.

    rk_refs: optional (rkc, rks, rkcc, rkcs) VMEM plane refs — the
    STATIC-delta rotor fast path: rkc/rks = cos/sin(delta*k) for k in
    [0, W) and rkcc/rkcs = cos/sin(delta*(j - pad_left)) for the carry,
    precomputed host-side.  The per-sample rotor is then one per-tile
    scalar rotor times the shared plane (angle-sum identity) — the
    full-rate cos/sin transcendental pass over the slab (the PERF.md
    "rotate slab" cost, the kernel's largest VPU term) disappears."""
    ti = pl.program_id(1)
    xr = xr_ref[:]
    xi = xi_ref[:]
    if in_scale is not None:
        # int16 ingest: i16 HBM block -> normalized f32 in VMEM (see
        # `_fir_kernel_rt_s`); halves the chain's dominant HBM term
        xr = xr.astype(jnp.float32) * in_scale
        xi = xi.astype(jnp.float32) * in_scale
    pk = jnp.maximum(jnp.max(jnp.abs(xr), axis=1, keepdims=True),
                     jnp.max(jnp.abs(xi), axis=1, keepdims=True))
    pk_ref[:] = jnp.broadcast_to(pk, pk_ref.shape)
    W = xr.shape[1]
    if rk_refs is not None:
        rkc_ref, rks_ref, rkcc_ref, rkcs_ref = rk_refs
        ct, st = _tile_rotor(nco_ref, ti, W)
        c = ct * rkc_ref[:] - st * rks_ref[:]
        s = st * rkc_ref[:] + ct * rks_ref[:]
        # carry plane: at ti == 0 the tile rotor is exactly e^{j*phase0}
        cc = ct * rkcc_ref[:] - st * rkcs_ref[:]
        sc = st * rkcc_ref[:] + ct * rkcs_ref[:]
    else:
        k = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
        ang = ((nco_ref[0] + nco_ref[1] * (ti * W + k))
               .astype(jnp.float32) * _PHASE_SCALE)
        c = jnp.cos(ang)
        s = jnp.sin(ang)
        kc = jax.lax.broadcasted_iota(jnp.int32, (1, pad_left), 1)
        angc = ((nco_ref[0] + nco_ref[1] * (kc - pad_left))
                .astype(jnp.float32) * _PHASE_SCALE)
        cc = jnp.cos(angc)
        sc = jnp.sin(angc)
    xr, xi = xr * c - xi * s, xr * s + xi * c
    cr0 = cr_ref[:] * cc - ci_ref[:] * sc
    ci0 = cr_ref[:] * sc + ci_ref[:] * cc
    tail_r = jnp.where(ti == 0, cr0, tr_s[:])
    tail_i = jnp.where(ti == 0, ci0, ti_s[:])
    tr_s[:] = xr[:, W - pad_left:]
    ti_s[:] = xi[:, W - pad_left:]
    p = prec or _PREC

    def _c(a):
        return a.astype(mxu_dtype) if mxu_dtype is not None else a

    hrt, hrb = _c(hrt_ref[:]), _c(hrb_ref[:])
    ar = (jnp.dot(_c(tail_r), hrt, preferred_element_type=jnp.float32,
                  precision=p)
          + jnp.dot(_c(xr), hrb, preferred_element_type=jnp.float32,
                    precision=p))
    ai = (jnp.dot(_c(tail_i), hrt, preferred_element_type=jnp.float32,
                  precision=p)
          + jnp.dot(_c(xi), hrb, preferred_element_type=jnp.float32,
                    precision=p))
    TT = ar.shape[1]
    tb_r = jnp.where(ti == 0, c2r_ref[:], br_s[:])
    tb_i = jnp.where(ti == 0, c2i_ref[:], bi_s[:])
    if TT >= pad2:
        a_tail_r = ar[:, TT - pad2:]
        a_tail_i = ai[:, TT - pad2:]
    else:
        # rolling halo (tile_t < pad2, e.g. the MXU-lean tile_t=128):
        # the stage-B window spans several A tiles — shift the kept
        # window left by TT and append this tile's outputs
        a_tail_r = jnp.concatenate([tb_r[:, TT:], ar], axis=1)
        a_tail_i = jnp.concatenate([tb_i[:, TT:], ai], axis=1)
    br_s[:] = a_tail_r
    bi_s[:] = a_tail_i
    f2r_ref[:] = a_tail_r
    f2i_ref[:] = a_tail_i
    gtr, gbr = _c(gtr_ref[:]), _c(gbr_ref[:])
    gti, gbi = _c(gti_ref[:]), _c(gbi_ref[:])
    o_ref[:] = ((jnp.dot(_c(tb_r), gtr, preferred_element_type=jnp.float32,
                         precision=p)
                 + jnp.dot(_c(ar), gbr, preferred_element_type=jnp.float32,
                           precision=p))
                - (jnp.dot(_c(tb_i), gti,
                           preferred_element_type=jnp.float32, precision=p)
                   + jnp.dot(_c(ai), gbi,
                             preferred_element_type=jnp.float32,
                             precision=p)))


def _fir_kernel_rt_s2_mt(nco_ref, xr_ref, xi_ref, cr_ref, ci_ref,
                         hct_ref, hcb_ref, hst_ref, hsb_ref,
                         gtr_ref, gbr_ref, gti_ref, gbi_ref,
                         c2r_ref, c2i_ref, rdc_ref, rds_ref,
                         o_ref, pk_ref, f2r_ref, f2i_ref,
                         tr_s, ti_s, br_s, bi_s, *, pad_left: int,
                         pad2: int, mxu_dtype=None, prec=None,
                         in_scale=None):
    """MODULATED-TAPS variant of `_fir_kernel_rt_s2` (static NCO delta):

    the frequency translation is folded into the stage-A taps host-side
    (h'[k] = h[k]·e^{-j·delta·k}, split into hc = h·cos(delta*k) and
    hs = -h·sin(delta*k)) so the (TC, W) input slab is NEVER rotated —
    the kernel's dominant VPU cost (6 ops/sample over the full-rate
    slab, ~2.6 ms of the 4.4 ms kernel at the flagship shape; the
    rotor-plane fast path only removed the (1, W) transcendentals and
    measured -4%).  The absolute phase e^{j(phase0 + delta*n)} is
    applied to the DECIMATED stage-A output tile instead (1/decim the
    elements), via the static plane rdc/rds = cos/sin(delta*decim*m)
    and the per-tile scalar rotor.  Identity:

      y[m] = sum_k h[k]·x[md-k]·e^{j(phase0+delta*(md-k))}
           = e^{j(phase0+delta*md)} · sum_k (h[k]e^{-j delta k})·x[md-k]

    Stage A costs 4 dot-pairs instead of 2 (the modulated taps are
    complex), but the MXU is ~80% idle in this kernel, so trading the
    slab VPU pass for MXU passes wins.  Raw-IQ carry needs no rotation
    at all (relative phase is in the taps; absolute phase is applied
    after).  Stage B and all carries are unchanged."""
    ti = pl.program_id(1)
    xr = xr_ref[:]
    xi = xi_ref[:]
    if in_scale is not None:
        xr = xr.astype(jnp.float32) * in_scale
        xi = xi.astype(jnp.float32) * in_scale
    pk = jnp.maximum(jnp.max(jnp.abs(xr), axis=1, keepdims=True),
                     jnp.max(jnp.abs(xi), axis=1, keepdims=True))
    pk_ref[:] = jnp.broadcast_to(pk, pk_ref.shape)
    W = xr.shape[1]
    tail_r = jnp.where(ti == 0, cr_ref[:], tr_s[:])
    tail_i = jnp.where(ti == 0, ci_ref[:], ti_s[:])
    tr_s[:] = xr[:, W - pad_left:]
    ti_s[:] = xi[:, W - pad_left:]
    p = prec or _PREC

    def _c(a):
        return a.astype(mxu_dtype) if mxu_dtype is not None else a

    def _dot(a, b):
        return jnp.dot(_c(a), _c(b), preferred_element_type=jnp.float32,
                       precision=p)

    hct, hcb = hct_ref[:], hcb_ref[:]
    hst, hsb = hst_ref[:], hsb_ref[:]
    # w = (x raw) * h'  (complex taps, complex out)
    wr = (_dot(tail_r, hct) + _dot(xr, hcb)
          - _dot(tail_i, hst) - _dot(xi, hsb))
    wi = (_dot(tail_r, hst) + _dot(xr, hsb)
          + _dot(tail_i, hct) + _dot(xi, hcb))
    # absolute rotor at the DECIMATED rate: e^{j(phase0 + delta*(ti*W +
    # m*decim))} = tile_rotor * (rdc + j rds)[m]
    ct, st = _tile_rotor(nco_ref, ti, W)
    c = ct * rdc_ref[:] - st * rds_ref[:]
    s = st * rdc_ref[:] + ct * rds_ref[:]
    ar = wr * c - wi * s
    ai = wr * s + wi * c
    TT = ar.shape[1]
    tb_r = jnp.where(ti == 0, c2r_ref[:], br_s[:])
    tb_i = jnp.where(ti == 0, c2i_ref[:], bi_s[:])
    if TT >= pad2:
        a_tail_r = ar[:, TT - pad2:]
        a_tail_i = ai[:, TT - pad2:]
    else:                       # rolling stage-B halo (see rt_s2)
        a_tail_r = jnp.concatenate([tb_r[:, TT:], ar], axis=1)
        a_tail_i = jnp.concatenate([tb_i[:, TT:], ai], axis=1)
    br_s[:] = a_tail_r
    bi_s[:] = a_tail_i
    f2r_ref[:] = a_tail_r
    f2i_ref[:] = a_tail_i
    o_ref[:] = ((_dot(tb_r, gtr_ref[:]) + _dot(ar, gbr_ref[:]))
                - (_dot(tb_i, gti_ref[:]) + _dot(ai, gbi_ref[:])))


def _fir_nco_kernel(nco_ref, xr_ref, xi_ref, pr_ref, pi_ref, cr_ref, ci_ref,
                    hr_ref, hi_ref, or_ref, oi_ref=None, *, pad_left: int,
                    mxu_dtype=None, prec=None):
    """`_fir_kernel` with the frequency-translation NCO fused in: inputs
    are the RAW IQ planes; the slab is rotated in VMEM by
    ``exp(j*2pi*(phase0 + delta*n)/2^32)`` before the tap matmuls, where
    ``n`` is the absolute sample index within the block (negative for the
    carried history — the uint32 modular arithmetic makes that exact, so
    the rotation of carry samples equals what the previous block's mix
    produced).  Saves a full HBM round-trip of the mixed complex block
    (~10 ms at 8192ch x 16k on v5e, which the separate `nco.mix` stage
    cost).

    nco_ref: SMEM (2,) int32 = [phase0, delta] (uint32 bit patterns).
    """
    ti = pl.program_id(1)
    W = xr_ref.shape[1]
    K = pad_left + W
    tail_r = jnp.where(ti == 0, cr_ref[:], pr_ref[:])
    tail_i = jnp.where(ti == 0, ci_ref[:], pi_ref[:])
    xr = jnp.concatenate([tail_r, xr_ref[:]], axis=1)   # (TC, K)
    xi = jnp.concatenate([tail_i, xi_ref[:]], axis=1)
    # absolute sample index n = ti*W - pad_left + k.  All phase arithmetic
    # is mod-2^32 wrapping, identical in int32 and uint32 bit-wise; Mosaic
    # has no uint32->f32 cast, so stay in int32 — the signed reinterpretation
    # only shifts the angle by -2pi, invisible to cos/sin.
    k = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)
    n = ti * W - pad_left + k
    ang = ((nco_ref[0] + nco_ref[1] * n)
           .astype(jnp.float32) * _PHASE_SCALE)
    c = jnp.cos(ang)
    s = jnp.sin(ang)
    xr_rot = xr * c - xi * s
    xi_rot = xr * s + xi * c
    hr = hr_ref[:]
    hi = hi_ref[:]
    if mxu_dtype is not None:
        xr_rot = xr_rot.astype(mxu_dtype)
        xi_rot = xi_rot.astype(mxu_dtype)
        hr = hr.astype(mxu_dtype)
        hi = hi.astype(mxu_dtype)
    rr = jnp.dot(xr_rot, hr, preferred_element_type=jnp.float32, precision=(prec or _PREC))
    ii = jnp.dot(xi_rot, hi, preferred_element_type=jnp.float32, precision=(prec or _PREC))
    or_ref[:] = rr - ii
    if oi_ref is not None:
        ri = jnp.dot(xr_rot, hi, preferred_element_type=jnp.float32, precision=(prec or _PREC))
        ir = jnp.dot(xi_rot, hr, preferred_element_type=jnp.float32, precision=(prec or _PREC))
        oi_ref[:] = ri + ir


def _rotor_planes(delta_u32: int, W: int, pad_left: int):
    """Static-delta NCO rotor planes for the kernels' fast path:
    (rkc, rks) = cos/sin(delta*k), k in [0, W) and (rkcc, rkcs) =
    cos/sin(delta*(j - pad_left)), j in [0, pad_left) — computed in
    float64 from the exact uint32 modular phase, so the only error vs
    the in-kernel transcendental path is one f32 rounding (~1e-7 rad).
    Shapes (1, n) for VMEM broadcast against (TC, n) slabs."""
    two_pi = 2.0 * np.pi / 2.0 ** 32
    d = int(delta_u32) & 0xFFFFFFFF
    ang = np.array([(d * kk) % (1 << 32) for kk in range(W)],
                   np.float64) * two_pi
    angc = np.array([(d * (j - pad_left)) % (1 << 32)
                     for j in range(pad_left)], np.float64) * two_pi
    return (np.cos(ang).astype(np.float32)[None, :],
            np.sin(ang).astype(np.float32)[None, :],
            np.cos(angc).astype(np.float32)[None, :],
            np.sin(angc).astype(np.float32)[None, :])


def _build_tap_matrix(h: np.ndarray, decim: int, tile_t: int,
                      pad_left: int) -> np.ndarray:
    """(pad_left + tile_t*decim, tile_t): col m holds h reversed at row
    offset pad_left + m*decim - (taps-1), so with slab column j mapping to
    input sample x[tile_start - pad_left + j]:
      (slab @ H)[c, m] = sum_k h[k] * x[c, tile_start + m*decim - k]
    (= causal FIR whose newest sample is x[m*decim], matching
    `fir_decimate_block`'s streaming phase).  Unused rows are zero, so
    the halo's leading (pad_left - taps + 1) columns contribute nothing.
    """
    taps = h.shape[-1]
    K = pad_left + tile_t * decim
    H = np.zeros((K, tile_t), h.dtype)
    hrev = h[::-1]
    for m in range(tile_t):
        off = pad_left + m * decim - (taps - 1)
        H[off: off + taps, m] = hrev
    return H


def fir_decimate_pallas(h: jnp.ndarray, carry: jnp.ndarray, x: jnp.ndarray,
                        decim: int, tile_c: int = 8, tile_t: int = 512,
                        interpret: bool = False, nco=None,
                        mxu_dtype: str | None = None,
                        real_out: bool = False,
                        prec: str | None = None,
                        planes_out: bool = False,
                        peaks_out: bool = False,
                        fuse2=None,
                        in_scale: float | None = None,
                        nco_static_delta: int | None = None):
    """Drop-in for `ops.fir.fir_decimate_block` backed by the Pallas MXU
    kernel.  x: (C, B) complex64 — or an (xr, xi) tuple of f32 planes,
    which (with planes_out=True for the result) skips the interleaved
    complex64 materialization between chained kernels entirely — or an
    (xr, xi) tuple of INT16 planes (the reference codec's native sample
    width): the kernel then reads half the HBM bytes and converts to
    normalized f32 (full scale 1.0 = 32768 counts — the native ring's
    f32 convention, so raw and pre-converted ingest agree exactly — or
    `in_scale` per count if given) in VMEM; output, carries and peaks
    are identical to feeding `x.astype(f32) * in_scale`.  `in_scale` is
    only meaningful for int16 plane inputs and raises for any other
    input dtype (f32/complex inputs must be pre-scaled by the caller).
    carry: (C, taps-1) complex64 (or plane tuple, matching x; always
    the f32/complex domain — int16 inputs still carry f32 history).
    Requires C % tile_c == 0, (B//decim) % tile_t == 0, and
    tile_t*decim >= pad_left (halo fits in one neighbor block).

    nco: optional (phase0, delta) pair of traced uint32 SCALARS — fuses the
    frequency-translation mix (`ops.nco.mix` with uniform phase across
    channels) into the kernel: x and carry are then the RAW pre-mix IQ, and
    the result equals `fir(mix(x))` with mix-domain carry.  The caller
    advances its phase state by `nco.advance(phase0, delta, B)`.

    nco_static_delta: the COMPILE-TIME value of nco's delta when the
    caller knows it (no traced tune offset) — enables the rotor-plane
    fast path: cos/sin(delta*k) planes are precomputed host-side and the
    kernel rotates with one per-tile scalar rotor instead of a full-rate
    transcendental pass over the slab (real-taps kernels only).

    real_out: return only Re(y) as f32 — the SSB demod is exactly
    Re(analytic signal), so the two imaginary-part matmuls (half the
    kernel's MXU work) are skipped entirely for usb/lsb/cw chains."""
    taps = h.shape[-1]
    x_planes = isinstance(x, tuple)
    xr, xi = x if x_planes else (None, None)
    B = (xr if x_planes else x).shape[-1]
    h_np = np.asarray(h)
    C = (xr if x_planes else x).shape[0]
    T_out = B // decim
    n_tt = T_out // tile_t
    W = tile_t * decim
    pad_left = -(-(taps - 1) // 128) * 128
    assert W >= pad_left, (W, pad_left)
    real_taps = not np.iscomplexobj(h_np) or not np.any(np.imag(h_np))
    in_i16 = x_planes and xr.dtype == jnp.int16
    if not in_i16 and in_scale is not None:
        raise ValueError("in_scale applies only to int16 plane inputs; "
                         "pre-scale f32/complex inputs at the caller")
    if in_i16 and in_scale is None:
        in_scale = 1.0 / 32768.0
    if in_i16 and not real_taps:
        # only the real-taps kernels take i16 blocks; convert up front
        # for the complex-taps path (correct, no bandwidth win)
        xr = xr.astype(jnp.float32) * np.float32(in_scale)
        xi = xi.astype(jnp.float32) * np.float32(in_scale)
        in_i16 = False
    kern_scale = np.float32(in_scale) if in_i16 else None

    def _tail_f32(a):
        """carry tail in the f32 domain regardless of the input dtype"""
        return (a.astype(jnp.float32) * kern_scale) if in_i16 else a
    Hr = jnp.asarray(_build_tap_matrix(np.real(h_np).astype(np.float32),
                                       decim, tile_t, pad_left))
    Hi = None if real_taps else jnp.asarray(
        _build_tap_matrix(np.imag(h_np).astype(np.float32),
                          decim, tile_t, pad_left))
    if not x_planes:
        xr = jnp.real(x)
        xi = jnp.imag(x)
    # carried history, left-padded to the lane multiple (the pad columns
    # line up with all-zero tap-matrix rows)
    czeros = jnp.zeros((C, pad_left - (taps - 1)), jnp.float32)
    car, cai = carry if isinstance(carry, tuple) else (
        jnp.real(carry), jnp.imag(carry))
    cr = jnp.concatenate([czeros, car.astype(jnp.float32)], axis=-1)
    ci = jnp.concatenate([czeros, cai.astype(jnp.float32)], axis=-1)

    if fuse2 is not None:
        # stage-B fusion (`_fir_kernel_rt_s2`): complex Hilbert-combine
        # FIR applied to the stage-A output tile in VMEM, real audio out.
        # fuse2 = (g2 complex taps, (c2r, c2i) carried fs_dec history).
        assert real_taps and nco is not None and peaks_out \
            and not real_out, "fuse2: ref-front rt+nco+peaks path only"
        g2_np, (c2r_in, c2i_in) = fuse2
        g2_np = np.asarray(g2_np)
        taps2 = g2_np.shape[-1]
        pad2 = -(-(taps2 - 1) // 128) * 128
        # pad2 > tile_t is fine: the kernels keep a rolling (TC, pad2)
        # stage-B window across A tiles (small tiles cut the dense-K
        # MXU waste of the shifted-diagonal tap matrix)
        G_r = _build_tap_matrix(np.real(g2_np).astype(np.float32), 1,
                                tile_t, pad2)
        G_i = _build_tap_matrix(np.imag(g2_np).astype(np.float32), 1,
                                tile_t, pad2)
        z2 = jnp.zeros((C, pad2 - (taps2 - 1)), jnp.float32)
        c2r = jnp.concatenate([z2, c2r_in.astype(jnp.float32)], axis=-1)
        c2i = jnp.concatenate([z2, c2i_in.astype(jnp.float32)], axis=-1)
        mxu2 = jnp.bfloat16 if mxu_dtype == "bf16" else None
        prec2 = ({"default": jax.lax.Precision.DEFAULT,
                  "high": jax.lax.Precision.HIGH,
                  "highest": jax.lax.Precision.HIGHEST}[prec]
                 if isinstance(prec, str) else prec)
        phase0, delta = nco
        nco_arr = jax.lax.bitcast_convert_type(
            jnp.stack([jnp.asarray(phase0, jnp.uint32),
                       jnp.asarray(delta, jnp.uint32)]), jnp.int32)
        # mt engages only at one-bf16-pass precision (DEFAULT): its tap
        # matrices are pre-cast to bf16 so the 4 stage-A matrices fit
        # VMEM, and the kernel casts the slab to bf16 explicitly — the
        # same arithmetic XLA's DEFAULT f32 dot performs on the MXU.
        # Multi-pass (high/highest) keeps the rotate-slab kernel.
        # MEASURED (r5, v5e flagship): the slab rotation it eliminates
        # is NOT the kernel's binding cost (a bare convert+peaks pass
        # over the same input already takes ~3.2 of the kernel's
        # ~4.4 ms — see CEILINGS_r05.json), and the doubled stage-A
        # dots cost more than the rotation saved: full chain 22,691 vs
        # 24,421 Ms/s.  Ships OFF by default (UHSDR_FRONT_MT=1 to
        # re-enable for experiments); the rotor-PLANE path below keeps
        # the transcendental savings with unchanged dot structure.
        import os as _os
        use_mt = (nco_static_delta is not None
                  and _os.environ.get("UHSDR_FRONT_MT") == "1"
                  and prec2 in (None, jax.lax.Precision.DEFAULT)
                  and _PREC == jax.lax.Precision.DEFAULT)
        if use_mt:
            mxu2 = mxu2 or jnp.bfloat16
            # MODULATED-TAPS fast path (`_fir_kernel_rt_s2_mt`): the
            # static delta is folded into the stage-A taps host-side
            # (h' = h * e^{-j delta k}, exact uint32 modular phase in
            # float64), the slab is never rotated, and the absolute
            # rotor is applied to the decimated output tile via the
            # static (1, tile_t) rdc/rds plane + per-tile scalar.
            # Tap/G matrices are pre-cast to bf16 (what the kernel's
            # MXU pass uses anyway) so the 4 A-matrices fit VMEM.
            two_pi = 2.0 * np.pi / 2.0 ** 32
            d = int(nco_static_delta) & 0xFFFFFFFF
            h_np_r = np.real(h_np).astype(np.float64)
            angk = np.array([(d * kk) % (1 << 32)
                             for kk in range(taps)], np.float64) * two_pi
            hc = (h_np_r * np.cos(angk)).astype(np.float32)
            hs = (-h_np_r * np.sin(angk)).astype(np.float32)
            Hc = _build_tap_matrix(hc, decim, tile_t, pad_left)
            Hs = _build_tap_matrix(hs, decim, tile_t, pad_left)
            angm = np.array([(d * decim * m) % (1 << 32)
                             for m in range(tile_t)], np.float64) * two_pi
            rdc = np.cos(angm).astype(np.float32)[None, :]
            rds = np.sin(angm).astype(np.float32)[None, :]

            def _pc(a):          # pre-cast matrices to the MXU dtype
                return jnp.asarray(np.asarray(a, np.float32)).astype(mxu2)

            kernel2 = functools.partial(
                _fir_kernel_rt_s2_mt, pad_left=pad_left, pad2=pad2,
                mxu_dtype=mxu2, prec=prec2, in_scale=kern_scale)
            mat_in = [_pc(Hc[:pad_left]), _pc(Hc[pad_left:]),
                      _pc(Hs[:pad_left]), _pc(Hs[pad_left:]),
                      _pc(G_r[:pad2]), _pc(G_r[pad2:]),
                      _pc(G_i[:pad2]), _pc(G_i[pad2:])]
            mat_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 8
            tail_in = [c2r, c2i, jnp.asarray(rdc), jnp.asarray(rds)]
            tail_specs = [
                pl.BlockSpec((tile_c, pad2), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_c, pad2), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile_t), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile_t), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
            ]
        else:
            base2 = functools.partial(_fir_kernel_rt_s2,
                                      pad_left=pad_left,
                                      pad2=pad2, mxu_dtype=mxu2,
                                      prec=prec2, in_scale=kern_scale)
            rk_in = []
            rk_specs = []
            if nco_static_delta is not None:
                W2 = tile_t * decim
                rk = _rotor_planes(nco_static_delta, W2, pad_left)
                rk_in = [jnp.asarray(p) for p in rk]
                rk_specs = [pl.BlockSpec(p.shape, lambda i, j: (0, 0),
                                         memory_space=pltpu.VMEM)
                            for p in rk]

                def kernel2(nr, a, b, c_, d, e, f, g, h_, i_, j_, k_,
                            l_, rkc, rks, rkcc, rkcs, o, pk, f2r_,
                            f2i_, s1, s2, s3, s4):
                    base2(nr, a, b, c_, d, e, f, g, h_, i_, j_, k_, l_,
                          o, pk, f2r_, f2i_, s1, s2, s3, s4,
                          rk_refs=(rkc, rks, rkcc, rkcs))
            else:
                kernel2 = base2
            mat_in = [jnp.asarray(Hr[:pad_left]),
                      jnp.asarray(Hr[pad_left:]),
                      jnp.asarray(G_r[:pad2]), jnp.asarray(G_r[pad2:]),
                      jnp.asarray(G_i[:pad2]), jnp.asarray(G_i[pad2:])]
            mat_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6
            tail_in = [c2r, c2i] + rk_in
            tail_specs = [
                pl.BlockSpec((tile_c, pad2), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_c, pad2), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
            ] + rk_specs
        y, pk_tiles, f2r, f2i = pl.pallas_call(
            kernel2,
            grid=(C // tile_c, n_tt),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((tile_c, W), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_c, W), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_c, pad_left), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_c, pad_left), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
            ] + mat_specs + tail_specs,
            out_specs=[
                pl.BlockSpec((tile_c, tile_t), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_c, 128), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_c, pad2), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_c, pad2), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((C, T_out), jnp.float32),
                jax.ShapeDtypeStruct((C, n_tt * 128), jnp.float32),
                jax.ShapeDtypeStruct((C, pad2), jnp.float32),
                jax.ShapeDtypeStruct((C, pad2), jnp.float32),
            ],
            scratch_shapes=[pltpu.VMEM((tile_c, pad_left), jnp.float32),
                            pltpu.VMEM((tile_c, pad_left), jnp.float32),
                            pltpu.VMEM((tile_c, pad2), jnp.float32),
                            pltpu.VMEM((tile_c, pad2), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary")),
            interpret=interpret,
        )(nco_arr, xr, xi, cr, ci, *mat_in, *tail_in)
        if B >= taps - 1:
            nc_pl = (_tail_f32(xr[..., -(taps - 1):]),
                     _tail_f32(xi[..., -(taps - 1):]))
        else:
            nc_pl = (
                jnp.concatenate([car, _tail_f32(xr)],
                                axis=-1)[..., -(taps - 1):],
                jnp.concatenate([cai, _tail_f32(xi)],
                                axis=-1)[..., -(taps - 1):])
        new_carry = (nc_pl if x_planes and not in_i16
                     else jax.lax.complex(*nc_pl))
        return y, new_carry, pk_tiles, (f2r[..., -(taps2 - 1):],
                                        f2i[..., -(taps2 - 1):])

    grid = (C // tile_c, n_tt)
    out_shape = [jax.ShapeDtypeStruct((C, T_out), jnp.float32)]
    if not real_out:
        out_shape.append(jax.ShapeDtypeStruct((C, T_out), jnp.float32))
    if peaks_out:
        # fused raw-input peak (ADC clip detect): per-(channel, time)
        # tile max broadcast over 128 lanes; caller reduces axis -1
        assert real_taps and not real_out, "peaks_out: rt complex path"
        out_shape.append(jax.ShapeDtypeStruct((C, n_tt * 128),
                                              jnp.float32))

    def cur_idx(i, j):
        return (i, j)

    # halo: the LAST pad_left columns of the previous W-window, viewed with
    # block width pad_left (requires W % pad_left == 0) — reading only the
    # halo instead of the whole previous block cuts the kernel's HBM input
    # from 2x to (1 + pad_left/W)x of the signal.  (The real-taps path
    # goes further: its halo lives in VMEM scratch, no re-read at all.)
    assert W % pad_left == 0, (W, pad_left)
    ratio = W // pad_left

    def halo_idx(i, j):
        # block (i, j*ratio - 1) = columns [j*W - pad_left, j*W);
        # at j==0 the kernel selects the carry instead
        return (i, jnp.maximum(j * ratio - 1, 0))

    mxu = jnp.bfloat16 if mxu_dtype == "bf16" else None
    prec_v = ({"default": jax.lax.Precision.DEFAULT,
               "high": jax.lax.Precision.HIGH,
               "highest": jax.lax.Precision.HIGHEST}[prec]
              if isinstance(prec, str) else prec)
    scratch_shapes = []
    if real_taps:
        # scratch-halo + split-dot kernel (`_fir_kernel_rt_s`)
        in_specs = [
            pl.BlockSpec((tile_c, W), cur_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_c, W), cur_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_c, pad_left), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_c, pad_left), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ]
        inputs = [xr, xi, cr, ci, Hr[:pad_left], Hr[pad_left:]]
        scratch_shapes = [pltpu.VMEM((tile_c, pad_left), jnp.float32),
                          pltpu.VMEM((tile_c, pad_left), jnp.float32)]
        base = functools.partial(_fir_kernel_rt_s, pad_left=pad_left,
                                 mxu_dtype=mxu, prec=prec_v,
                                 in_scale=kern_scale)
        n_out = len(out_shape)
        if nco is None:
            if n_out == 1:                      # real_out
                def kernel(a, b, c, d, e, f, o, s1, s2):
                    base(a, b, c, d, e, f, o, None, None, s1, s2)
            elif peaks_out:
                def kernel(a, b, c, d, e, f, o, oi, pk, s1, s2):
                    base(a, b, c, d, e, f, o, oi, pk, s1, s2)
            else:
                def kernel(a, b, c, d, e, f, o, oi, s1, s2):
                    base(a, b, c, d, e, f, o, oi, None, s1, s2)
        else:
            phase0, delta = nco
            nco_arr = jax.lax.bitcast_convert_type(
                jnp.stack([jnp.asarray(phase0, jnp.uint32),
                           jnp.asarray(delta, jnp.uint32)]), jnp.int32)
            if nco_static_delta is not None:
                rk = _rotor_planes(nco_static_delta, W, pad_left)
                inputs += [jnp.asarray(p) for p in rk]
                in_specs += [pl.BlockSpec(p.shape, lambda i, j: (0, 0),
                                          memory_space=pltpu.VMEM)
                             for p in rk]
                if n_out == 1:
                    def kernel(nr, a, b, c, d, e, f, r1, r2, r3, r4, o,
                               s1, s2):
                        base(a, b, c, d, e, f, o, None, None, s1, s2,
                             nco_ref=nr, rk_refs=(r1, r2, r3, r4))
                elif peaks_out:
                    def kernel(nr, a, b, c, d, e, f, r1, r2, r3, r4, o,
                               oi, pk, s1, s2):
                        base(a, b, c, d, e, f, o, oi, pk, s1, s2,
                             nco_ref=nr, rk_refs=(r1, r2, r3, r4))
                else:
                    def kernel(nr, a, b, c, d, e, f, r1, r2, r3, r4, o,
                               oi, s1, s2):
                        base(a, b, c, d, e, f, o, oi, None, s1, s2,
                             nco_ref=nr, rk_refs=(r1, r2, r3, r4))
            elif n_out == 1:
                def kernel(nr, a, b, c, d, e, f, o, s1, s2):
                    base(a, b, c, d, e, f, o, None, None, s1, s2,
                         nco_ref=nr)
            elif peaks_out:
                def kernel(nr, a, b, c, d, e, f, o, oi, pk, s1, s2):
                    base(a, b, c, d, e, f, o, oi, pk, s1, s2, nco_ref=nr)
            else:
                def kernel(nr, a, b, c, d, e, f, o, oi, s1, s2):
                    base(a, b, c, d, e, f, o, oi, None, s1, s2,
                         nco_ref=nr)
            in_specs.insert(0, pl.BlockSpec(memory_space=pltpu.SMEM))
            inputs.insert(0, nco_arr)
    else:
        in_specs = [
            pl.BlockSpec((tile_c, W), cur_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_c, W), cur_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_c, pad_left), halo_idx,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_c, pad_left), halo_idx,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_c, pad_left), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_c, pad_left), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ]
        inputs = [xr, xi, xr, xi, cr, ci, Hr, Hi]
        if nco is None:
            kernel = functools.partial(_fir_kernel, pad_left=pad_left,
                                       mxu_dtype=mxu, prec=prec_v)
        else:
            phase0, delta = nco
            nco_arr = jax.lax.bitcast_convert_type(
                jnp.stack([jnp.asarray(phase0, jnp.uint32),
                           jnp.asarray(delta, jnp.uint32)]), jnp.int32)
            kernel = functools.partial(_fir_nco_kernel, pad_left=pad_left,
                                       mxu_dtype=mxu, prec=prec_v)
            in_specs.insert(0, pl.BlockSpec(memory_space=pltpu.SMEM))
            inputs.insert(0, nco_arr)

    out_specs = [pl.BlockSpec((tile_c, tile_t), lambda i, j: (i, j),
                              memory_space=pltpu.VMEM)
                 for _ in out_shape]
    if peaks_out:
        out_specs[-1] = pl.BlockSpec((tile_c, 128), lambda i, j: (i, j),
                                     memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        # sequential time grid (the scratch halo of the real-taps path
        # depends on it; "arbitrary" is also the TPU default)
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(*inputs)
    outs = list(outs)
    peaks = outs.pop() if peaks_out else None
    if real_out:
        y = outs[0]
    elif planes_out:
        y = (outs[0], outs[1])
    else:
        y = jax.lax.complex(outs[0], outs[1])
    if x_planes:
        if B >= taps - 1:
            new_carry = (_tail_f32(xr[..., -(taps - 1):]),
                         _tail_f32(xi[..., -(taps - 1):]))
        else:
            new_carry = (
                jnp.concatenate([car, _tail_f32(xr)],
                                axis=-1)[..., -(taps - 1):],
                jnp.concatenate([cai, _tail_f32(xi)],
                                axis=-1)[..., -(taps - 1):])
    elif B >= taps - 1:
        new_carry = x[..., -(taps - 1):]
    else:
        new_carry = jnp.concatenate([carry, x], axis=-1)[..., -(taps - 1):]
    if in_i16 and isinstance(new_carry, tuple):
        # int16 ingest keeps the carried history complex f32 (stable
        # RxState pytree; the tail is tiny next to the block)
        new_carry = jax.lax.complex(*new_carry)
    if peaks_out:
        return y, new_carry, peaks
    return y, new_carry


# ---------------------------------------------------------------------------
# Real-input analytic FIR (TX front): audio -> analytic signal, decim=1.
# ---------------------------------------------------------------------------

def _fir_real_kernel(nco_ref, x_ref, p_ref, c_ref, hr_ref, hi_ref,
                     or_ref, oi_ref, *, pad_left: int, conj: bool,
                     use_nco: bool):
    """One (TC, W) complex output tile from a REAL (TC, pad_left + W)
    slab — 2 matmuls instead of the complex kernel's 4 (the TX voice
    signal has no imaginary part).  Optionally conjugates (LSB) and
    applies the post-modulator frequency translation in VMEM
    (`mod.ssb_modulate`'s `nco.mix`), saving its full HBM round-trip."""
    ti = pl.program_id(1)
    W = x_ref.shape[1]
    tail = jnp.where(ti == 0, c_ref[:], p_ref[:])
    x = jnp.concatenate([tail, x_ref[:]], axis=1)       # (TC, K)
    yr = jnp.dot(x, hr_ref[:], preferred_element_type=jnp.float32, precision=_PREC)
    yi = jnp.dot(x, hi_ref[:], preferred_element_type=jnp.float32, precision=_PREC)
    if conj:
        yi = -yi
    if use_nco:
        # output index n = ti*W + m (decim=1); int32 wrap == uint32 wrap
        m = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
        ang = ((nco_ref[0] + nco_ref[1] * (ti * W + m))
               .astype(jnp.float32) * _PHASE_SCALE)
        c = jnp.cos(ang)
        s = jnp.sin(ang)
        yr, yi = yr * c - yi * s, yr * s + yi * c
    or_ref[:] = yr
    oi_ref[:] = yi


def fir_real_analytic_pallas(h: jnp.ndarray, carry: jnp.ndarray,
                             x: jnp.ndarray, tile_c: int = 128,
                             tile_t: int = 512, nco=None,
                             conj: bool = False, interpret: bool = False):
    """Real audio (C, B) f32 -> analytic signal (C, B) complex64 through
    the one-sided complex FIR h, with carried real history (C, taps-1).
    Optionally fuses conjugation (LSB) and the post-FIR NCO mix
    (nco = (phase0, delta) traced uint32 scalars; caller advances phase).
    Requires C % tile_c == 0, B % tile_t == 0, tile_t % pad_left == 0."""
    taps = h.shape[-1]
    h_np = np.asarray(h)
    C, B = x.shape
    W = tile_t
    n_tt = B // W
    pad_left = -(-(taps - 1) // 128) * 128
    assert W % pad_left == 0, (W, pad_left)
    ratio = W // pad_left
    Hr = jnp.asarray(_build_tap_matrix(np.real(h_np).astype(np.float32),
                                       1, tile_t, pad_left))
    Hi = jnp.asarray(_build_tap_matrix(np.imag(h_np).astype(np.float32),
                                       1, tile_t, pad_left))
    czeros = jnp.zeros((C, pad_left - (taps - 1)), jnp.float32)
    c0 = jnp.concatenate([czeros, carry.astype(jnp.float32)], axis=-1)

    if nco is None:
        nco_arr = jnp.zeros((2,), jnp.int32)
    else:
        phase0, delta = nco
        nco_arr = jax.lax.bitcast_convert_type(
            jnp.stack([jnp.asarray(phase0, jnp.uint32),
                       jnp.asarray(delta, jnp.uint32)]), jnp.int32)
    kernel = functools.partial(_fir_real_kernel, pad_left=pad_left,
                               conj=conj, use_nco=nco is not None)
    yr, yi = pl.pallas_call(
        kernel,
        grid=(C // tile_c, n_tt),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tile_c, W), lambda i, j: (i, j)),
            pl.BlockSpec((tile_c, pad_left),
                         lambda i, j: (i, jnp.maximum(j * ratio - 1, 0))),
            pl.BlockSpec((tile_c, pad_left), lambda i, j: (i, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_c, W), lambda i, j: (i, j)),
            pl.BlockSpec((tile_c, W), lambda i, j: (i, j)),
        ],
        out_shape=[jax.ShapeDtypeStruct((C, B), jnp.float32),
                   jax.ShapeDtypeStruct((C, B), jnp.float32)],
        interpret=interpret,
    )(nco_arr, x, x, c0, Hr, Hi)
    if B >= taps - 1:
        new_carry = x[..., -(taps - 1):]
    else:
        new_carry = jnp.concatenate([carry, x], axis=-1)[..., -(taps - 1):]
    return jax.lax.complex(yr, yi), new_carry


# ---------------------------------------------------------------------------
# Polyphase interpolation (real audio): the RX chain's back-to-48k stage.
# ---------------------------------------------------------------------------

def _interp_kernel(x_ref, p_ref, c_ref, h_ref, o_ref, *, pad_left: int,
                   prec=None):
    """One (TC, W_in*interp) output tile from a (TC, pad_left + W_in)
    low-rate input slab (current block + halo from the previous block /
    carried history) — a single real MXU matmul.  p_ref is the narrow
    (TC, pad_left) halo view of the previous block (same array under a
    pad_left-wide shifted BlockSpec, like the decimator kernels), so
    the halo costs pad_left/W extra input instead of re-reading the
    whole neighbor block."""
    ti = pl.program_id(1)
    tail = jnp.where(ti == 0, c_ref[:], p_ref[:])
    x = jnp.concatenate([tail, x_ref[:]], axis=1)       # (TC, K)
    o_ref[:] = jnp.dot(x, h_ref[:], preferred_element_type=jnp.float32,
                       precision=(prec or _PREC))


def _build_interp_tap_matrix(h: np.ndarray, interp: int, tile_t_in: int,
                             pad_left: int) -> np.ndarray:
    """(pad_left + tile_t_in, tile_t_in*interp): column n = m*interp + p
    holds the polyphase taps hpoly[k, p] = h[k*interp + p] so that
      (slab @ H)[c, m*interp + p]
        = sum_j x[c, tile_start + m + j - (sub_len-1)] * hpoly[sub_len-1-j, p]
    — identical streaming phase to `ops.fir.fir_interpolate_block`."""
    taps = h.shape[-1]
    sub_len = -(-taps // interp)
    hp = np.zeros((sub_len * interp,), h.dtype)
    hp[:taps] = h
    hpoly = hp.reshape(sub_len, interp)
    K = pad_left + tile_t_in
    H = np.zeros((K, tile_t_in * interp), h.dtype)
    for m in range(tile_t_in):
        for j in range(sub_len):
            c = pad_left + m + j - (sub_len - 1)
            if 0 <= c < K:
                H[c, m * interp: m * interp + interp] = hpoly[sub_len - 1 - j]
    return H


def fir_interpolate_pallas(h: jnp.ndarray, carry: jnp.ndarray,
                           x: jnp.ndarray, interp: int, tile_c: int = 8,
                           tile_t_in: int = 512, interpret: bool = False,
                           prec: str | None = None):
    """Drop-in for `ops.fir.fir_interpolate_block` (real audio).
    x: (C, B) f32 at the low rate; carry: (C, sub_len-1) f32.
    Returns (y (C, B*interp), new_carry).  Requires C % tile_c == 0,
    B % tile_t_in == 0, tile_t_in >= pad_left."""
    h_np = np.asarray(h, np.float32)
    taps = h_np.shape[-1]
    sub_len = -(-taps // interp)
    C, B = x.shape
    n_tt = B // tile_t_in
    pad_left = -(-(sub_len - 1) // 128) * 128
    assert tile_t_in >= pad_left, (tile_t_in, pad_left)
    assert tile_t_in % pad_left == 0, (tile_t_in, pad_left)
    ratio = tile_t_in // pad_left
    H = jnp.asarray(_build_interp_tap_matrix(h_np, interp, tile_t_in,
                                             pad_left))
    czeros = jnp.zeros((C, pad_left - (sub_len - 1)), jnp.float32)
    c0 = jnp.concatenate([czeros, carry.astype(jnp.float32)], axis=-1)

    prec_v = ({"default": jax.lax.Precision.DEFAULT,
               "highest": jax.lax.Precision.HIGHEST}[prec]
              if isinstance(prec, str) else prec)
    y, = pl.pallas_call(
        functools.partial(_interp_kernel, pad_left=pad_left, prec=prec_v),
        grid=(C // tile_c, n_tt),
        in_specs=[
            pl.BlockSpec((tile_c, tile_t_in), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            # narrow halo: the last pad_left columns of the previous
            # block, viewed at block width pad_left (decimator pattern)
            pl.BlockSpec((tile_c, pad_left),
                         lambda i, j: (i, jnp.maximum(j * ratio - 1, 0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_c, pad_left), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_c, tile_t_in * interp), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((C, B * interp), jnp.float32)],
        interpret=interpret,
    )(x, x, c0, H)
    if B >= sub_len - 1:
        new_carry = x[..., -(sub_len - 1):]
    else:
        new_carry = jnp.concatenate([carry, x], axis=-1)[..., -(sub_len - 1):]
    return y, new_carry
