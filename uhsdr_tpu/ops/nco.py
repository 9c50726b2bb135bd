"""Numerically-controlled oscillator (frequency translation).

Replaces the reference's two `FreqShift` implementations
(`drivers/audio/freq_shift.c:57-103` recursive approximation and `:107+`
exact table mode) and the `softdds` phase-accumulator synth
(`drivers/audio/softdds/softdds.c:26-157`).

TPU-first design: a *uint32 phase accumulator* evaluated in closed form —
``phase[n] = phase0 + n * delta (mod 2^32)`` — so an entire block of phases
is one integer multiply-add (exact, drift-free for unbounded streams, unlike
a float recurrence), then sin/cos on the VPU.  State carried between blocks
is a single uint32 per channel.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

TWO32 = float(2 ** 32)
_PHASE_SCALE = np.float32(2.0 * np.pi / TWO32)


def freq_to_delta(freq_hz, fs) -> np.ndarray:
    """Frequency (Hz, may be negative) -> uint32 phase increment per sample.

    Host-side computation at f64 for exactness.  Returns a NUMPY uint32 so
    it embeds as a compile-time literal when closed over under jit — the
    axon TPU relay cannot device_put non-f32 dtypes (see ARCHITECTURE.md
    "axon dtype constraints")."""
    cycles = np.asarray(freq_hz, np.float64) / float(fs)
    d = np.round(np.mod(cycles, 1.0) * TWO32)
    return d.astype(np.int64).astype(np.uint32)


def phase_ramp(phase0: jnp.ndarray, delta: jnp.ndarray, n: int) -> jnp.ndarray:
    """Phases (radians, f32) for n samples; phase0/delta uint32, any batch shape.

    Returns (..., n) phases and relies on uint32 wraparound for exactness.
    """
    k = jnp.arange(n, dtype=jnp.uint32)
    acc = phase0[..., None] + delta[..., None] * k  # mod 2^32 automatic
    return acc.astype(jnp.float32) * _PHASE_SCALE


def advance(phase0: jnp.ndarray, delta: jnp.ndarray, n: int) -> jnp.ndarray:
    """Phase accumulator state after n samples."""
    return phase0 + delta * jnp.uint32(n)


def osc_block(phase0: jnp.ndarray, delta: jnp.ndarray, n: int) -> jnp.ndarray:
    """``exp(j*phase[k])`` for k in [0, n) — (..., n) complex64.

    For large blocks the rotation is FACTORED: with k = c*R + r,
    ``exp(j*ang(p0 + k*d)) = exp(j*ang(p0 + c*R*d)) * exp(j*ang(r*d))``
    exactly (uint32 wraparound is modular and exp is 2pi-periodic), so
    only C+R = n/R + R transcendental pairs are evaluated per channel
    instead of n (64x fewer at n=16k, R=128) plus one complex multiply
    per sample.  Each factor is a unit-magnitude f32 rotation, so the
    product's amplitude/phase error stays at f32 rounding (~1e-7).
    """
    R = 128
    while R > 1 and n % R:
        R //= 2
    if n < 512 or R < 8:
        ph = phase_ramp(phase0, delta, n)
        return jax.lax.complex(jnp.cos(ph), jnp.sin(ph))
    C = n // R
    r = jnp.arange(R, dtype=jnp.uint32)
    fine_ph = (delta[..., None] * r).astype(jnp.float32) * _PHASE_SCALE
    c = jnp.arange(C, dtype=jnp.uint32) * jnp.uint32(R)
    coarse_ph = ((phase0[..., None] + delta[..., None] * c)
                 .astype(jnp.float32) * _PHASE_SCALE)
    fine = jax.lax.complex(jnp.cos(fine_ph), jnp.sin(fine_ph))
    coarse = jax.lax.complex(jnp.cos(coarse_ph), jnp.sin(coarse_ph))
    osc = coarse[..., :, None] * fine[..., None, :]
    return osc.reshape(osc.shape[:-2] + (n,))


def mix(iq: jnp.ndarray, phase0: jnp.ndarray, delta: jnp.ndarray):
    """Complex mix ``iq * exp(j*phase[n])`` — the RX frequency translation
    (reference `FreqShift`, ±6/±12 kHz or arbitrary).

    iq: (..., n) complex64; phase0/delta: (...,) uint32.
    Returns (shifted_iq, new_phase0).
    """
    n = iq.shape[-1]
    osc = osc_block(phase0, delta, n)
    return iq * osc, advance(phase0, delta, n)


def tone(phase0: jnp.ndarray, delta: jnp.ndarray, n: int):
    """Real sine block (softdds_runIQ single-tone analog).
    Returns (sin_block, new_phase0)."""
    ph = phase_ramp(phase0, delta, n)
    return jnp.sin(ph), advance(phase0, delta, n)


def tone_iq(phase0: jnp.ndarray, delta: jnp.ndarray, n: int):
    """Complex exponential block (softdds_genIQSingleTone analog)."""
    return osc_block(phase0, delta, n), advance(phase0, delta, n)
