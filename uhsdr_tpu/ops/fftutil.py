"""Windows and framing helpers for the FFT-based stages (spectral NR,
spectrum scope, zoom FFT).

Reference anchors: sqrt-Hann 50%-overlap framing in the spectral NR
(`audio_nr.c:1852-1856,1963-1967`), Hann window in the spectrum display
(`ui_spectrum.c:1377-1390`).
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def hann(n: int) -> np.ndarray:
    # periodic Hann (DFT-even), suited to overlap-add
    return (0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n) / n)).astype(np.float32)


@functools.lru_cache(maxsize=None)
def sqrt_hann(n: int) -> np.ndarray:
    return np.sqrt(hann(n)).astype(np.float32)


def frame_overlap(x: jnp.ndarray, frame_len: int, hop: int) -> jnp.ndarray:
    """Frame (..., T) into (..., n_frames, frame_len) with the given hop.
    T must satisfy (T - frame_len) % hop == 0."""
    T = x.shape[-1]
    n_frames = (T - frame_len) // hop + 1
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(frame_len)[None, :]
    return x[..., idx]


def overlap_add(frames: jnp.ndarray, hop: int) -> jnp.ndarray:
    """Inverse of frame_overlap for windowed frames: sum frames at hop offsets.
    frames: (..., n_frames, frame_len) -> (..., (n_frames-1)*hop + frame_len)."""
    n_frames, frame_len = frames.shape[-2], frames.shape[-1]
    T = (n_frames - 1) * hop + frame_len
    out = jnp.zeros(frames.shape[:-2] + (T,), frames.dtype)
    # scatter-add via segment trick: build index map (n_frames, frame_len)
    idx = (jnp.arange(n_frames)[:, None] * hop + jnp.arange(frame_len)[None, :])
    flat_idx = idx.reshape(-1)
    flat_frames = frames.reshape(frames.shape[:-2] + (n_frames * frame_len,))
    return out.at[..., flat_idx].add(flat_frames)
