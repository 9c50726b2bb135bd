"""Streaming block FIR: overlap-save convolution, polyphase decimation and
interpolation.

Replaces the reference's CMSIS streaming FIR machinery —
`arm_fir_f32` (Hilbert pairs, `audio_driver.c:2751-2752`),
`arm_fir_decimate_f32` (`audio_driver.c:2744-2745`),
`arm_fir_interpolate_f32` (`audio_driver.c:2560-2590`) — whose persistent
`pState` arrays become an explicit carry of the last ``taps-1`` input
samples.  Given the carry, each block is pure:

    y, new_carry = fir_block(h, carry, x)

Two execution strategies, same results:

* ``time``: direct convolution via a dense (frames x taps) gather + matmul
  onto the MXU — best for small tap counts / small blocks.
* ``fft``: overlap-save in the frequency domain — O(log N) per sample,
  independent of tap count; best for the 89/199/201-tap chain filters.
  This generalizes the reference's experimental partitioned-convolution
  path (`audio_convolution.c:480+`) which it only used behind
  `USE_CONVOLUTION`.

All entry points take channel-batched input ``(..., time)`` and work for
real or complex data and taps.
"""
from __future__ import annotations

import functools
from typing import Literal

import jax
import jax.numpy as jnp
import numpy as np

from . import fftutil


def _next_pow2(n: int) -> int:
    return 1 << (n - 1).bit_length()


def init_carry(batch_shape: tuple[int, ...], num_taps: int, dtype) -> jnp.ndarray:
    """Zero history for a streaming FIR (taps-1 samples)."""
    return jnp.zeros(batch_shape + (num_taps - 1,), dtype=dtype)


def _conv_full_halfspec(xw: jnp.ndarray, h: jnp.ndarray,
                        nfft: int) -> jnp.ndarray:
    """Circular convolution of xw (..., nfft) with h (taps,) entirely in
    rfft HALF-SPECTRUM form.

    The axon TPU backend has no complex-input FFT; the generic
    `fftutil.cfft` composition pays for hermitian extension + rolls +
    full-N complex intermediates.  Complex⊛complex only needs the four
    real convolutions  p = a⊛hr − b⊛hi,  q = a⊛hi + b⊛hr, each of which
    lives in (nfft/2+1)-bin half-spectra — half the multiply traffic and
    zero reassembly."""
    cx = jnp.iscomplexobj(xw)
    ch = jnp.iscomplexobj(h)
    if not cx and not ch:
        X = jnp.fft.rfft(xw.astype(jnp.float32), n=nfft, axis=-1)
        H = jnp.fft.rfft(h.astype(jnp.float32), n=nfft)
        return jnp.fft.irfft(X * H, n=nfft, axis=-1)
    if cx:
        A = jnp.fft.rfft(jnp.real(xw), n=nfft, axis=-1)
        B = jnp.fft.rfft(jnp.imag(xw), n=nfft, axis=-1)
    else:
        A = jnp.fft.rfft(xw.astype(jnp.float32), n=nfft, axis=-1)
        B = None
    if ch:
        Hr = jnp.fft.rfft(jnp.real(h), n=nfft)
        Hi = jnp.fft.rfft(jnp.imag(h), n=nfft)
    else:
        Hr = jnp.fft.rfft(h.astype(jnp.float32), n=nfft)
        Hi = None
    if B is None:           # real x, complex h
        p = jnp.fft.irfft(A * Hr, n=nfft, axis=-1)
        q = jnp.fft.irfft(A * Hi, n=nfft, axis=-1)
    elif Hi is None:        # complex x, real h
        p = jnp.fft.irfft(A * Hr, n=nfft, axis=-1)
        q = jnp.fft.irfft(B * Hr, n=nfft, axis=-1)
    else:                   # complex ⊛ complex
        p = jnp.fft.irfft(A * Hr - B * Hi, n=nfft, axis=-1)
        q = jnp.fft.irfft(A * Hi + B * Hr, n=nfft, axis=-1)
    return jax.lax.complex(p, q)


# FFT size cap for overlap-save chunking: one huge FFT (next_pow2 of the
# whole block, e.g. 32k) is slower on TPU than a batch of ~2k-point FFTs
# (N log N work AND VMEM locality) — measured ~2x on the 199-tap front
# filter at 8192 ch x 16k.
_OS_NFFT_CAP = 2048


def _conv_valid_fft(xfull: jnp.ndarray, h: jnp.ndarray, n_out: int) -> jnp.ndarray:
    """'Valid' convolution of xfull (..., L) with h via FFT overlap-save
    (chunked), keeping the last n_out outputs (those with full history).

    h may be (taps,) or batched (..., taps) broadcastable against xfull's
    leading dims (e.g. a (2, taps) stereo USB/LSB filter pair against
    (..., 2, L) input)."""
    taps = h.shape[-1]
    L = xfull.shape[-1]
    nfft_one = _next_pow2(L)
    nfft = min(nfft_one, max(_OS_NFFT_CAP, 2 * _next_pow2(taps)))
    if nfft >= nfft_one:
        y = _conv_full_halfspec(xfull, h, nfft_one)
        return y[..., taps - 1: taps - 1 + n_out]
    # chunked overlap-save: window c starts at input position c*hop and
    # yields valid outputs c*hop + [0, hop); windows overlap by taps-1
    hop = nfft - (taps - 1)
    nchunks = -(-n_out // hop)
    need = (nchunks - 1) * hop + nfft
    if need > L:
        pad = [(0, 0)] * (xfull.ndim - 1) + [(0, need - L)]
        xfull = jnp.pad(xfull, pad)
    idx = jnp.arange(nchunks)[:, None] * hop + jnp.arange(nfft)[None, :]
    windows = xfull[..., idx]                      # (..., nchunks, nfft)
    # batched h: insert a chunk axis so H broadcasts as (..., 1, bins)
    h_b = h[..., None, :] if h.ndim > 1 else h
    yw = _conv_full_halfspec(windows, h_b, nfft)
    yv = yw[..., taps - 1:]                        # (..., nchunks, hop)
    y = yv.reshape(yv.shape[:-2] + (nchunks * hop,))
    return y[..., :n_out]


def _conv_valid_dense(xfull: jnp.ndarray, h: jnp.ndarray, n_out: int,
                      stride: int = 1) -> jnp.ndarray:
    """'Valid' convolution via frame-gather + matmul (MXU path).

    Output m = sum_k h[k] * xfull[taps-1 + m*stride - k].
    """
    taps = h.shape[-1]
    # frames[m, k] = xfull[m*stride + k], k in [0, taps)
    idx = (jnp.arange(n_out) * stride)[:, None] + jnp.arange(taps)[None, :]
    frames = xfull[..., idx]                       # (..., n_out, taps)
    hrev = h[..., ::-1]
    if h.ndim > 1:                                 # batched filters
        dot = lambda f, w: jnp.einsum("...nt,...t->...n", f, w)
    else:
        dot = lambda f, w: f @ w
    if jnp.iscomplexobj(frames) or jnp.iscomplexobj(hrev):
        fr, fi = jnp.real(frames), jnp.imag(frames)
        hr, hi = jnp.real(hrev).astype(jnp.float32), jnp.imag(hrev).astype(jnp.float32)
        yr = dot(fr, hr) - dot(fi, hi)
        yi = dot(fr, hi) + dot(fi, hr)
        return jax.lax.complex(yr, yi)
    return dot(frames, hrev.astype(frames.dtype))


def fir_block(h: jnp.ndarray, carry: jnp.ndarray, x: jnp.ndarray,
              method: Literal["fft", "time"] = "fft"):
    """One streaming FIR block.  x: (..., B); carry: (..., taps-1).
    Returns (y (..., B), new_carry)."""
    taps = h.shape[-1]
    xfull = jnp.concatenate([carry.astype(x.dtype), x], axis=-1)
    B = x.shape[-1]
    if method == "fft":
        y = _conv_valid_fft(xfull, h, B)
    else:
        y = _conv_valid_dense(xfull, h, B)
    # taps==1: canonical empty carry (not the caller's verbatim carry,
    # which could silently persist a malformed non-empty initial value)
    new_carry = xfull[..., -(taps - 1):] if taps > 1 else xfull[..., :0]
    return y, new_carry


def fir_decimate_block(h: jnp.ndarray, carry: jnp.ndarray, x: jnp.ndarray,
                       decim: int, method: Literal["fft", "time"] = "fft"):
    """Streaming FIR + downsample by `decim` (arm_fir_decimate_f32 analog).

    x: (..., B) with B % decim == 0.  Output (..., B//decim).
    Output sample m corresponds to input index m*decim (first output uses
    the first new input sample with full history, matching CMSIS phase).
    """
    taps = h.shape[-1]
    B = x.shape[-1]
    assert B % decim == 0, (B, decim)
    xfull = jnp.concatenate([carry.astype(x.dtype), x], axis=-1)
    n_out = B // decim
    if method == "fft":
        y = _conv_valid_fft(xfull, h, B)[..., ::decim]
    else:
        y = _conv_valid_dense(xfull, h, n_out, stride=decim)
    # taps==1: canonical empty carry (not the caller's verbatim carry,
    # which could silently persist a malformed non-empty initial value)
    new_carry = xfull[..., -(taps - 1):] if taps > 1 else xfull[..., :0]
    return y, new_carry


def fir_interpolate_block(h: jnp.ndarray, carry: jnp.ndarray, x: jnp.ndarray,
                          interp: int):
    """Streaming zero-stuff upsample by `interp` + anti-image FIR
    (arm_fir_interpolate_f32 analog).  Polyphase: no zero multiplies.

    x: (..., B) at the low rate; h designed at the high rate with gain
    `interp` baked in (see design.interpolation_fir).  carry holds
    ceil(taps/interp)-1 low-rate samples.  Output (..., B*interp).
    """
    taps = h.shape[-1]
    sub_len = -(-taps // interp)          # ceil
    pad = sub_len * interp - taps
    hp = jnp.concatenate([h, jnp.zeros((pad,), h.dtype)]) if pad else h
    # polyphase components: phase p uses taps h[p], h[p+interp], ...
    hpoly = hp.reshape(sub_len, interp)    # [k, p] = h[k*interp + p]
    xfull = jnp.concatenate([carry.astype(x.dtype), x], axis=-1)
    B = x.shape[-1]
    # y[m*interp + p] = sum_k hpoly[k, p] * x[m - k]  (streaming index)
    idx = jnp.arange(B)[:, None] + jnp.arange(sub_len)[None, :]
    frames = xfull[..., idx]               # frames[..., m, j] = x[m - (sub_len-1-j)]
    # so with k = sub_len-1-j:  y[.., m, p] = frames @ hpoly[::-1]
    ypoly = frames @ hpoly[::-1, :].astype(frames.dtype)   # (..., B, interp)
    y = ypoly.reshape(x.shape[:-1] + (B * interp,))
    new_carry = xfull[..., -(sub_len - 1):] if sub_len > 1 else carry[..., :0]
    return y, new_carry


# ---------------------------------------------------------------------------
# Frequency-domain streaming filter with precomputed H (for fixed filters
# run every block — avoids re-FFT of taps).
# ---------------------------------------------------------------------------

class OverlapSaveFilter:
    """Precompiled overlap-save filter for a fixed (block_len, taps) config.

    Usage:
        f = OverlapSaveFilter(h, block_len)
        y, carry = f(carry, x)
    """

    def __init__(self, h: np.ndarray, block_len: int):
        self.taps = int(h.shape[-1])
        self.block_len = int(block_len)
        self.nfft = _next_pow2(self.taps - 1 + block_len)
        self.complex = np.iscomplexobj(h)
        if self.complex:
            self.H = jnp.asarray(np.fft.fft(h, n=self.nfft).astype(np.complex64))
        else:
            self.H_r = jnp.asarray(np.fft.rfft(h, n=self.nfft).astype(np.complex64))
            self.H = jnp.asarray(np.fft.fft(h, n=self.nfft).astype(np.complex64))

    def init_carry(self, batch_shape, dtype):
        return init_carry(batch_shape, self.taps, dtype)

    def __call__(self, carry, x):
        xfull = jnp.concatenate([carry.astype(x.dtype), x], axis=-1)
        if self.complex or jnp.iscomplexobj(x):
            X = fftutil.cfft(xfull, self.nfft)
            y = fftutil.icfft(X * self.H)
            if not self.complex and not jnp.iscomplexobj(x):
                y = y.real
        else:
            X = jnp.fft.rfft(xfull, n=self.nfft, axis=-1)
            y = jnp.fft.irfft(X * self.H_r, n=self.nfft, axis=-1)
        y = y[..., self.taps - 1: self.taps - 1 + self.block_len]
        # taps == 1: -(taps-1) == -0 would slice the WHOLE buffer and
        # grow the carry every call; return a canonical empty slice so a
        # malformed non-empty initial carry cannot persist silently
        new_carry = (xfull[..., -(self.taps - 1):] if self.taps > 1
                     else xfull[..., :0])
        return y, new_carry


# ---------------------------------------------------------------------------
# Uniformly-partitioned convolution (low-latency long filters)
# ---------------------------------------------------------------------------

class PartitionedConvolver:
    """Uniformly-partitioned block overlap-save convolution.

    Reference: the experimental WDSP-style `USE_CONVOLUTION` RX path
    (`audio_convolution.c:284-352,480+`): 128-sample blocks, 1024-tap
    filters split into 8 partitions, frequency-domain masks, 2.7 ms
    latency.  The partitioning keeps per-block latency at `block_len`
    samples regardless of filter length — the filter's tail partitions
    multiply *older* input spectra held in a frequency-delay line (FDL).

    TPU shape: the per-block work is one FFT of 2B samples plus a
    (P, bins) x (P, bins) multiply-accumulate over the FDL — fully
    batched over channels, and the FDL update is a roll of a static
    (P, ..., bins) array.

    Usage:
        pc = PartitionedConvolver(h, block_len=128)
        state = pc.init_state(batch_shape, dtype)
        y, state = pc(state, x)      # x: (..., block_len)
    """

    def __init__(self, h: np.ndarray, block_len: int = 128):
        B = int(block_len)
        h = np.asarray(h)
        taps = h.shape[-1]
        P = -(-taps // B)                      # partitions
        pad = P * B - taps
        hp = np.concatenate([h, np.zeros(pad, h.dtype)]) if pad else h
        parts = hp.reshape(P, B)
        self.block_len = B
        self.parts = P
        self.nfft = 2 * B
        self.complex = np.iscomplexobj(h)
        # H[p] = FFT_{2B}(part_p zero-padded); keep both full and rfft
        # spectra so real taps also work on complex input
        self.H_c = jnp.asarray(
            np.fft.fft(parts, n=self.nfft, axis=-1).astype(np.complex64))
        self.H_r = None if self.complex else jnp.asarray(
            np.fft.rfft(parts, n=self.nfft, axis=-1).astype(np.complex64))

    def init_state(self, batch_shape, dtype):
        bins = self.nfft if self.complex or jnp.issubdtype(
            jnp.dtype(dtype), jnp.complexfloating) else self.nfft // 2 + 1
        fdl = jnp.zeros((self.parts,) + tuple(batch_shape) + (bins,),
                        jnp.complex64)
        prev = jnp.zeros(tuple(batch_shape) + (self.block_len,), dtype)
        return (fdl, prev)

    def __call__(self, state, x):
        fdl, prev = state
        B = self.block_len
        buf = jnp.concatenate([prev, x], axis=-1)      # (..., 2B)
        cplx_in = jnp.iscomplexobj(x) or self.complex
        if cplx_in:
            X = fftutil.cfft(buf, self.nfft)
            H = self.H_c
        else:
            X = jnp.fft.rfft(buf, n=self.nfft, axis=-1)
            H = self.H_r
        # FDL: newest spectrum at index 0
        fdl = jnp.roll(fdl, 1, axis=0)
        fdl = fdl.at[0].set(X)
        # expand H across batch dims: (P, 1..., bins)
        Hx = H.reshape((self.parts,) + (1,) * (fdl.ndim - 2) + (H.shape[-1],))
        Y = jnp.sum(fdl * Hx, axis=0)
        if cplx_in:
            y = fftutil.icfft(Y)[..., B:]
        else:
            y = jnp.fft.irfft(Y, n=self.nfft, axis=-1)[..., B:]
        return y, (fdl, x)


# ---------------------------------------------------------------------------
# Pure stateless helpers (for offline / test use)
# ---------------------------------------------------------------------------

def filtfilt_once(h: np.ndarray, x: np.ndarray) -> np.ndarray:
    """Offline zero-state 'same-ish' filtering via numpy (test helper)."""
    return np.convolve(x, h)[: len(x)]
