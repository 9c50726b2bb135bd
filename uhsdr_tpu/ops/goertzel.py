"""Single-bin tone energy detection.

The reference runs Goertzel recurrences for FM subaudible-tone detection
(3 detectors, `audio_driver.c:1694` + `audio_filter.c:1281-1303`) and the
CW decoder (`cw/cw_decoder.c:128-300`).  The Goertzel algorithm is just a
cheap serial way to evaluate one DFT bin; on TPU the direct projection
``|sum_n x[n] e^{-j w n}|^2`` is a dot product onto the VPU/MXU and is
exactly equivalent — so that is what we compute.  Phase continuity across
blocks is carried so arbitrarily long accumulation windows (the reference
accumulates 400 blocks for subtones, `audio_driver.h:450`) stay coherent.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from . import nco


def goertzel_block(x: jnp.ndarray, phase0: jnp.ndarray, delta: jnp.ndarray):
    """Complex DFT projection of block x (..., T) at the NCO frequency.

    Returns (z (...,) complex64 partial sum for this block, new_phase).
    Accumulate z across blocks then take |z|^2 for tone power.
    """
    T = x.shape[-1]
    ph = nco.phase_ramp(phase0, delta, T)
    zr = jnp.sum(x * jnp.cos(ph), axis=-1)
    zi = -jnp.sum(x * jnp.sin(ph), axis=-1)
    return jax.lax.complex(zr, zi), nco.advance(phase0, delta, T)


def tone_power(x: jnp.ndarray, freq_hz: float, fs: float) -> jnp.ndarray:
    """One-shot normalized tone power of a block: |proj|^2 / (T/2)^2 gives
    amplitude^2 of a unit sine."""
    delta = nco.freq_to_delta(freq_hz, fs)
    z, _ = goertzel_block(x, jnp.zeros(x.shape[:-1], jnp.uint32), delta)
    T = x.shape[-1]
    return (jnp.abs(z) / (T / 2.0)) ** 2
