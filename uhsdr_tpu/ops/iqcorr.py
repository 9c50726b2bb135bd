"""Automatic IQ imbalance correction (Moseley-Slump) + twin-peaks
detection.

Reference: `AudioDriver_RxHandleIqCorrection` (`audio_driver.c:2254-2316`)
— Moseley & Slump (2006) low-complexity feed-forward compensation:

  per 32-sample block:  teta1 = -lp(sum sign(i)*q),
                        teta2 =  lp(sum sign(i)*i),
                        teta3 =  lp(sum sign(q)*q)
  (one-pole lowpass 0.003/0.997 at block cadence)
  c1 = teta1/teta2,  c2 = sqrt((teta3^2 - teta1^2)/teta2^2)
  correction (order matters): q += c1*i;  i *= c2.

Twin-peaks detection (`AudioDriver_RxHandleTwinpeaks:2173-2253`): the
codec occasionally starts with I/Q misaligned by one sample ("twinpeak
syndrome"); the reference detects an implausible measured I/Q phase and
restarts the codec.  Here the detection emits a per-channel health flag
(the restart action belongs to the ingest runtime).

TPU mapping: the per-block accumulators are segment sums (reshape +
reduce); the cadence lowpass is a short `lax.scan` at 1500 Hz.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

SUBBLOCK = 32           # reference IQ_BLOCK_SIZE
LP_A = 0.997
LP_B = 0.003


class IqCorrState(NamedTuple):
    teta1: jnp.ndarray     # (...,) smoothed accumulators
    teta2: jnp.ndarray
    teta3: jnp.ndarray
    c1: jnp.ndarray
    c2: jnp.ndarray
    twinpeak: jnp.ndarray  # (...,) bool suspicion flag


def init_state(batch_shape) -> IqCorrState:
    z = jnp.zeros(batch_shape, jnp.float32)
    return IqCorrState(teta1=z, teta2=z, teta3=z, c1=z,
                       c2=jnp.ones(batch_shape, jnp.float32),
                       twinpeak=jnp.zeros(batch_shape, bool))


def _sign(x):
    return jnp.where(x > 0, 1.0, jnp.where(x < 0, -1.0, 0.0))


def correct(state: IqCorrState, i_in: jnp.ndarray, q_in: jnp.ndarray):
    """i/q: (..., T), T % 32 == 0.  Returns (i_out, q_out, new_state)."""
    T = i_in.shape[-1]
    nsub = T // SUBBLOCK
    shp = i_in.shape[:-1] + (nsub, SUBBLOCK)
    i_b = i_in[..., : nsub * SUBBLOCK].reshape(shp)
    q_b = q_in[..., : nsub * SUBBLOCK].reshape(shp)

    a1 = jnp.sum(_sign(i_b) * q_b, axis=-1) / SUBBLOCK     # (..., nsub)
    a2 = jnp.sum(jnp.abs(i_b), axis=-1) / SUBBLOCK
    a3 = jnp.sum(jnp.abs(q_b), axis=-1) / SUBBLOCK

    def step(carry, accs):
        # arithmetic-only blends (axon scan-carry PERF NOTE, ops/agc.py)
        t1, t2, t3 = carry
        x1, x2, x3 = accs
        t1 = -LP_B * x1 + LP_A * t1
        t2 = LP_B * x2 + LP_A * t2
        t3 = LP_B * x3 + LP_A * t3
        nz = (jnp.abs(t2) > 1e-20).astype(jnp.float32)
        c1 = nz * t1 * t2 / (t2 * t2 + 1e-20)
        h = (t3 * t3 - t1 * t1) / (t2 * t2 + 1e-20)
        hp = (h > 0).astype(jnp.float32) * nz
        c2 = hp * jnp.sqrt(jnp.maximum(h, 1e-20)) + (1.0 - hp)
        return (t1, t2, t3), (c1, c2)

    (t1f, t2f, t3f), (c1_seq, c2_seq) = jax.lax.scan(
        step, (state.teta1, state.teta2, state.teta3),
        (jnp.moveaxis(a1, -1, 0), jnp.moveaxis(a2, -1, 0),
         jnp.moveaxis(a3, -1, 0)), unroll=4)
    c1 = jnp.moveaxis(c1_seq, 0, -1)     # (..., nsub)
    c2 = jnp.moveaxis(c2_seq, 0, -1)

    # apply per sub-block: q += c1*i, then i *= c2 (order is crucial)
    q_c = q_b + c1[..., None] * i_b
    i_c = i_b * c2[..., None]

    # twin-peaks suspicion: measured I/Q phase far from quadrature —
    # |teta1|/teta2 (≈ tan of the phase error) beyond ~24 deg for the
    # settled estimate (reference restarts the codec at this point)
    phase_err = jnp.abs(t1f) / jnp.maximum(t2f, 1e-12)
    twin = (t2f > 1e-6) & (phase_err > 0.45)

    new_state = IqCorrState(teta1=t1f, teta2=t2f, teta3=t3f,
                            c1=c1[..., -1], c2=c2[..., -1], twinpeak=twin)
    return (i_c.reshape(i_in.shape), q_c.reshape(q_in.shape), new_state)
