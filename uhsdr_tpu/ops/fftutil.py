"""Windows and framing helpers for the FFT-based stages (spectral NR,
spectrum scope, zoom FFT).

Reference anchors: sqrt-Hann 50%-overlap framing in the spectral NR
(`audio_nr.c:1852-1856,1963-1967`), Hann window in the spectrum display
(`ui_spectrum.c:1377-1390`).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Complex FFT built from real FFTs.
#
# The axon TPU PJRT backend implements rfft/irfft but NOT complex-input FFT
# (verified empirically: jnp.fft.fft(complex64) -> UNIMPLEMENTED).  For a
# complex signal x = a + jb:  F = RFFT_full(a) + j*RFFT_full(b), where
# RFFT_full extends the half-spectrum hermitian-symmetrically.  Inverse by
# splitting F into its hermitian and anti-hermitian parts.
# ---------------------------------------------------------------------------

def _rfft_full(x: "jnp.ndarray", n: int) -> "jnp.ndarray":
    """Full n-point spectrum of real x via rfft (n even)."""
    H = jnp.fft.rfft(x, n=n, axis=-1)            # (..., n//2+1)
    tail = jnp.conj(H[..., -2:0:-1])             # bins n//2+1 .. n-1
    return jnp.concatenate([H, tail], axis=-1)


def cfft(x: "jnp.ndarray", n: int | None = None) -> "jnp.ndarray":
    """Complex-input FFT along the last axis, TPU-safe (rfft-composed)."""
    if n is None:
        n = x.shape[-1]
    if not jnp.iscomplexobj(x):
        return _rfft_full(x.astype(jnp.float32), n)
    a = jnp.real(x)
    b = jnp.imag(x)
    if a.shape[-1] < n:
        pad = [(0, 0)] * (a.ndim - 1) + [(0, n - a.shape[-1])]
        a = jnp.pad(a, pad)
        b = jnp.pad(b, pad)
    return _rfft_full(a, n) + 1j * _rfft_full(b, n)


def icfft(F: "jnp.ndarray") -> "jnp.ndarray":
    """Inverse of cfft: complex output, TPU-safe."""
    n = F.shape[-1]
    Frev = jnp.conj(jnp.roll(F[..., ::-1], 1, axis=-1))  # conj(F[N-k])
    Fa = 0.5 * (F + Frev)            # hermitian part -> spectrum of Re
    Fb = -0.5j * (F - Frev)          # spectrum of Im
    a = jnp.fft.irfft(Fa[..., : n // 2 + 1], n=n, axis=-1)
    b = jnp.fft.irfft(Fb[..., : n // 2 + 1], n=n, axis=-1)
    return jax.lax.complex(a, b)


@functools.lru_cache(maxsize=None)
def hann(n: int) -> np.ndarray:
    # periodic Hann (DFT-even), suited to overlap-add
    return (0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n) / n)).astype(np.float32)


@functools.lru_cache(maxsize=None)
def sqrt_hann(n: int) -> np.ndarray:
    return np.sqrt(hann(n)).astype(np.float32)


@functools.lru_cache(maxsize=None)
def sqrt_hann_sym(n: int) -> np.ndarray:
    # SYMMETRIC sqrt-Hann — sin(pi*i/(n-1)), zero at BOTH ends: the
    # reference's `SQRT_von_Hann_256` table (`audio_nr.c:76`) used by the
    # spectral NR.  Not exactly COLA at 50% overlap (the firmware lives
    # with the ~0.8% ripple); kept for reference-exact conformance.
    return np.sin(np.pi * np.arange(n) / (n - 1)).astype(np.float32)


def frame_overlap(x: jnp.ndarray, frame_len: int, hop: int) -> jnp.ndarray:
    """Frame (..., T) into (..., n_frames, frame_len) with the given hop.
    T must satisfy (T - frame_len) % hop == 0.

    Gather-free when frame_len % hop == 0 (every NR/scope use: 50%
    overlap): each frame is `frame_len//hop` consecutive hop-chunks, so
    framing is a reshape plus r stacked static slices — TPU gathers run
    on the scalar core (the indexed formulation measured 14 ms at
    8192ch x 33 frames; this is ~1 ms)."""
    T = x.shape[-1]
    n_frames = (T - frame_len) // hop + 1
    if frame_len % hop == 0:
        r = frame_len // hop
        n_chunks = T // hop
        chunks = x[..., : n_chunks * hop].reshape(x.shape[:-1] +
                                                  (n_chunks, hop))
        parts = [chunks[..., k: k + n_frames, :] for k in range(r)]
        return jnp.concatenate(parts, axis=-1)
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(frame_len)[None, :]
    return x[..., idx]


def overlap_add(frames: jnp.ndarray, hop: int) -> jnp.ndarray:
    """Inverse of frame_overlap for windowed frames: sum frames at hop offsets.
    frames: (..., n_frames, frame_len) -> (..., (n_frames-1)*hop + frame_len).

    Scatter-free when frame_len % hop == 0: split each frame into its r
    hop-chunks and add the r chunk-streams at staggered offsets (static
    pads + adds; the scatter-add formulation measured 19 ms at NR bench
    shapes)."""
    n_frames, frame_len = frames.shape[-2], frames.shape[-1]
    T = (n_frames - 1) * hop + frame_len
    if frame_len % hop == 0:
        r = frame_len // hop
        n_out = T // hop                       # = n_frames - 1 + r
        chunks = frames.reshape(frames.shape[:-2] + (n_frames, r, hop))
        out = jnp.zeros(frames.shape[:-2] + (n_out, hop), frames.dtype)
        for k in range(r):
            pad = [(0, 0)] * (out.ndim - 2) + [(k, n_out - n_frames - k),
                                               (0, 0)]
            out = out + jnp.pad(chunks[..., :, k, :], pad)
        return out.reshape(frames.shape[:-2] + (T,))
    out = jnp.zeros(frames.shape[:-2] + (T,), frames.dtype)
    idx = (jnp.arange(n_frames)[:, None] * hop + jnp.arange(frame_len)[None, :])
    flat_idx = idx.reshape(-1)
    flat_frames = frames.reshape(frames.shape[:-2] + (n_frames * frame_len,))
    return out.at[..., flat_idx].add(flat_frames)
