"""Spectral noise reduction — Ephraim-Malah / Romanin MMSE spectral
subtraction with speech-presence probability.

Reference: `spectral_noise_reduction_3` (`audio_nr.c:1841-2180`), run
deferred in PendSV in the firmware; here it is simply another batched
pipeline stage.  Frame recurrence per reference:

  X        = |FFT(sqrt_hann * frame)|^2                (256-pt, 50% overlap)
  ph1y     = 1 / (1 + pfac * exp(xih1r * X / xt))
  pslp     = ap*pslp + (1-ap)*ph1y
  ph1y     = pslp>psthr ? 1-pnsaf : min(ph1y, 1)
  xt       = ax*xt + (1-ax)*((1-ph1y)*X + ph1y*xt)     (noise estimate)
  SNRpost  = clip(X/xt, snr_prio_min, 1000)
  SNRprio  = max(alpha*Hk_old + (1-alpha)*max(SNRpost-1, 0), 0)
  v        = prio*post/(1+prio)
  Hk       = max(sqrt(0.7212 v + v^2)/post, 0.001)     (in VAD band, else 1)
  Hk_old   = post * Hk^2
  musical-noise smoothing: if in-band power ratio below threshold, moving-
  average Hk over NN = 1+2*round(width*(1-ratio/thresh)) bins
  y        = sqrt_hann * IFFT(Hk .* FFT_frame), overlap-added

Constants (reference values): ax=0.7405 ap=0.8691 (256-pt), psthr=0.99,
pnsaf=0.01, psini=pspri=0.5, asnr=30 dB, snr_prio_min=0.001, width=4,
alpha default 0.94 (menu: 0.799+strength/1000 per `audio_driver.c:1195`).
First 20 frames bootstrap the noise estimate (`audio_nr.c:1997-2012`).

TPU design: frames of a block are formed by `frame_overlap`, the frame
recurrence is a `lax.scan` over the (few) frames per block with all bins
and channels vectorized, and overlap-add emits the block (one frame of
latency, carried in state).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import fftutil

FFT_L = 256
HOP = FFT_L // 2
PSTHR = 0.99
PNSAF = 0.01
PSINI = 0.5
PSPRI = 0.5
SNR_PRIO_MIN = 0.001
AX = 0.7405
AP = 0.8691
ASNR_DB = 30.0
MN_WIDTH = 4
INIT_FRAMES = 20


class NrParams(NamedTuple):
    alpha: jnp.ndarray          # SNR-prio smoothing (0.799 + strength/1000)
    power_threshold: jnp.ndarray
    vad_low: int                # first bin of filter passband
    vad_high: int               # one-past-last bin
    xih1: float
    xih1r: float
    pfac: float


def make_params(fs: float, f_low: float, f_high: float,
                alpha: float = 0.94, power_threshold: float = 0.4) -> NrParams:
    bin_bw = fs / FFT_L
    vad_low = int(np.clip(int(f_low / bin_bw), 1, FFT_L // 2 - 2))
    vad_high = int(np.clip(int(f_high / bin_bw), vad_low + 1, FFT_L // 2))
    xih1 = 10.0 ** (ASNR_DB / 10.0)
    xih1r = 1.0 / (1.0 + xih1) - 1.0
    pfac = (1.0 / PSPRI - 1.0) * (1.0 + xih1)
    return NrParams(alpha=np.float32(alpha),
                    power_threshold=np.float32(power_threshold),
                    vad_low=vad_low, vad_high=vad_high,
                    xih1=xih1, xih1r=xih1r, pfac=pfac)


class NrState(NamedTuple):
    last_half: jnp.ndarray   # (..., HOP) previous input half-frame
    ola_tail: jnp.ndarray    # (..., HOP) pending overlap-add tail
    xt: jnp.ndarray          # (..., FFT_L//2) noise estimate
    pslp: jnp.ndarray        # (..., FFT_L//2)
    hk_old: jnp.ndarray      # (..., FFT_L//2)
    init_count: jnp.ndarray  # (...,) int32 bootstrap frame counter
    nest_acc: jnp.ndarray    # (..., FFT_L//2) bootstrap accumulator


def init_state(batch_shape) -> NrState:
    bs = tuple(batch_shape)
    return NrState(
        last_half=jnp.zeros(bs + (HOP,), jnp.float32),
        ola_tail=jnp.zeros(bs + (HOP,), jnp.float32),
        xt=jnp.full(bs + (FFT_L // 2,), PSINI, jnp.float32),
        pslp=jnp.full(bs + (FFT_L // 2,), 0.5, jnp.float32),
        hk_old=jnp.ones(bs + (FFT_L // 2,), jnp.float32),
        init_count=jnp.zeros(bs, jnp.int32),
        nest_acc=jnp.zeros(bs + (FFT_L // 2,), jnp.float32),
    )


import functools as _functools


@_functools.lru_cache(maxsize=None)
def _mn_avg_matrices(lo: int, hi: int) -> np.ndarray:
    """(nb, MN_WIDTH*nb) stacked moving-average matrices: column
    (w-1)*nb + b of the w-th block averages hk over the NN = 2w+1 bins
    [b-w, b+w], divided by NN (`audio_nr.c:2099-2107`).

    Reference-exact edge handling: only bins in [lo+w, hi-w) receive the
    average — the firmware's apply loop runs `bindx` over
    [VAD_low+NN/2, VAD_high-NN/2) only (`audio_nr.c:2137-2140`); its
    one-sided edge averages are computed into `NR.Nest` scratch that
    `spectral_noise_reduction_3` never copies back to Hk, so edge bins
    keep their unsmoothed value (identity rows here)."""
    nb = FFT_L // 2
    A = np.zeros((nb, MN_WIDTH * nb), np.float32)
    for w in range(1, MN_WIDTH + 1):
        nn = 2 * w + 1
        for b in range(lo, hi):
            col = (w - 1) * nb + b
            if lo + w <= b < hi - w:
                A[b - w: b + w + 1, col] = 1.0 / nn
            else:
                A[b, col] = 1.0
    return A


def _musical_noise_smooth(params: NrParams, hk: jnp.ndarray, X: jnp.ndarray):
    """Dynamic-width moving average of Hk inside the VAD band
    (`audio_nr.c:2077-2135`).

    The window half-width is data-dependent but only takes values
    0..MN_WIDTH, so instead of a cumsum + take_along_axis gather (TPU
    gathers run on the scalar core — measured 1.43 SECONDS at
    8192ch x 33 frames, 97% of the whole NR stage), all MN_WIDTH
    band-clamped moving averages are computed in ONE static matmul and
    the per-(channel, frame) width picks between them with a one-hot
    blend.  Bit-comparable results (same sums, same counts)."""
    lo, hi = params.vad_low, params.vad_high
    nb = FFT_L // 2
    band_np = (np.arange(nb) >= lo) & (np.arange(nb) < hi)
    band = jnp.asarray(band_np)
    pre = jnp.sum(jnp.where(band, X, 0.0), axis=-1)
    post = jnp.sum(jnp.where(band, hk * hk * X, 0.0), axis=-1)
    ratio = post / jnp.maximum(pre, 1e-20)
    apply = ratio <= params.power_threshold
    # reference: NN = 1 + 2*(int)(0.5 + width*(1 - ratio/thresh))
    # (audio_nr.c:2096) — the C (int) cast truncates, i.e. round-half-up
    # for positive x; jnp.round here would inflate the width by 1
    # whenever frac(x) is in (0, 0.5)
    nn_half = jnp.where(
        apply,
        (0.5 + MN_WIDTH * (1.0 - ratio / params.power_threshold))
        .astype(jnp.int32), 0)
    A = jnp.asarray(_mn_avg_matrices(lo, hi))           # (nb, MN_WIDTH*nb)
    # HIGHEST: the gain machine is precision-critical (discrete
    # window-width / threshold decisions amplify rounding) and this
    # matmul is tiny (nb x 4nb) — one-bf16-pass MXU rounding here costs
    # conformance for free perf that doesn't matter at this size
    avg = jnp.matmul(hk, A, precision=jax.lax.Precision.HIGHEST)
    avg = avg.reshape(avg.shape[:-1] + (MN_WIDTH, nb))
    onehot = (nn_half[..., None] ==
              jnp.arange(1, MN_WIDTH + 1)).astype(hk.dtype)
    hk_avg = jnp.sum(onehot[..., None] * avg, axis=-2)
    return jnp.where(band & (nn_half[..., None] > 0), hk_avg, hk)


def _frame_step(params: NrParams, carry, X):
    """One frame of the noise-estimate / speech-presence recurrence.

    Purely elementwise on (..., nb) — the FFTs and the musical-noise
    smoothing are hoisted out of the scan (smoothing does not feed the
    carry), so the sequential part is as thin as possible.
    Returns (carry', (hk pre-smoothing, booting flag))."""
    xt, pslp, hk_old, init_count, nest_acc = carry
    nb = FFT_L // 2

    # bootstrap noise estimate over first INIT_FRAMES frames
    booting = init_count < INIT_FRAMES
    nest_acc = jnp.where(booting[..., None], nest_acc + 0.05 * X, nest_acc)
    xt = jnp.where(booting[..., None], PSINI * nest_acc, xt)

    ph1y = 1.0 / (1.0 + params.pfac * jnp.exp(params.xih1r * X /
                                              jnp.maximum(xt, 1e-20)))
    # pslp / xt / Hk_old are frozen while booting: the reference's
    # recurrence block runs only under `first_time == 3`
    # (`audio_nr.c:2008-2034`) — during the 20 bootstrap frames pslp
    # stays at its 0.5 init and Hk_old at 1.0
    not_boot = ~booting[..., None]
    pslp = jnp.where(not_boot, AP * pslp + (1.0 - AP) * ph1y, pslp)
    ph1y = jnp.where(pslp > PSTHR, 1.0 - PNSAF, jnp.minimum(ph1y, 1.0))
    xtr = (1.0 - ph1y) * X + ph1y * xt
    xt_new = AX * xt + (1.0 - AX) * xtr
    xt = jnp.where(booting[..., None], xt, xt_new)

    snr_post = jnp.clip(X / jnp.maximum(xt, 1e-20), SNR_PRIO_MIN, 1000.0)
    snr_prio = jnp.maximum(
        params.alpha * hk_old +
        (1.0 - params.alpha) * jnp.maximum(snr_post - 1.0, 0.0), 0.0)
    v = snr_prio * snr_post / (1.0 + snr_prio)
    hk_band = jnp.maximum(jnp.sqrt(0.7212 * v + v * v) / snr_post, 0.001)
    idx = jnp.arange(nb)
    band = (idx >= params.vad_low) & (idx < params.vad_high)
    hk = jnp.where(band, hk_band, 1.0)
    hk_old = jnp.where(not_boot & band, snr_post * hk * hk, hk_old)
    init_count = init_count + 1
    return (xt, pslp, hk_old, init_count, nest_acc), (hk, booting)


def process_block(params: NrParams, state: NrState, x: jnp.ndarray):
    """x: (..., T) audio at the NR rate, T % HOP == 0.
    Returns (y (..., T), new_state).  One HOP (128-sample) latency."""
    T = x.shape[-1]
    assert T % HOP == 0, T
    xfull = jnp.concatenate([state.last_half, x], axis=-1)
    frames = fftutil.frame_overlap(xfull, FFT_L, HOP)     # (..., F, 256)
    nb = FFT_L // 2
    # reference-exact SYMMETRIC sqrt-Hann (`SQRT_von_Hann_256`,
    # audio_nr.c:76) — NOT the periodic variant
    win = jnp.asarray(fftutil.sqrt_hann_sym(FFT_L))

    # ALL frame FFTs batched up front (real frames -> rfft; the axon TPU
    # backend lacks complex-input FFT) — only the elementwise noise
    # recurrence runs in the scan
    F = jnp.fft.rfft(frames * win, axis=-1)               # (..., F, 129)
    X = jnp.abs(F[..., :nb]) ** 2                         # (..., F, nb)
    X_t = jnp.moveaxis(X, -2, 0)                          # (F, ..., nb)

    carry0 = (state.xt, state.pslp, state.hk_old,
              state.init_count, state.nest_acc)
    carry, (hk_t, boot_t) = jax.lax.scan(
        lambda c, xf: _frame_step(params, c, xf), carry0, X_t)
    hk = jnp.moveaxis(hk_t, 0, -2)                        # (..., F, nb)
    booting = jnp.moveaxis(boot_t, 0, -1)                 # (..., F)

    # musical-noise smoothing + bootstrap bypass, batched over frames
    hk = _musical_noise_smooth(params, hk, X)
    hk = jnp.where(booting[..., None], 1.0, hk)

    # spectral weighting (rfft half-spectrum; Nyquist bin untouched like the
    # reference, which never mirrors bin N/2), then IFFT + window — all
    # frames batched
    gains = jnp.concatenate([hk, jnp.ones_like(hk[..., :1])], axis=-1)
    ys = jnp.fft.irfft(F * gains, n=FFT_L, axis=-1) * win  # (..., F, 256)

    ola = fftutil.overlap_add(ys, HOP)                    # (..., T + HOP)
    y = ola[..., :T].at[..., :HOP].add(state.ola_tail)
    new_state = NrState(
        last_half=xfull[..., -HOP:],
        ola_tail=ola[..., T:],
        xt=carry[0], pslp=carry[1], hk_old=carry[2],
        init_count=carry[3], nest_acc=carry[4])
    return y, new_state
