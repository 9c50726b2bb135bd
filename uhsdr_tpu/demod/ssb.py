"""SSB demodulation.

The reference does phasing-method SSB: Hilbert-pair FIRs then ``I+Q`` (USB)
or ``I-Q`` (LSB) (`audio_driver.c:2748-2790`).  With the complex analytic
bandpass design (see `ops.design.complex_bandpass_fir`) the sideband
selection already happened in the filter, so demodulation is just the real
part — one op, fully batched.
"""
from __future__ import annotations

import jax.numpy as jnp


def demod(z: jnp.ndarray) -> jnp.ndarray:
    """z: analytic-filtered complex baseband (..., T) -> audio (..., T)."""
    return jnp.real(z)


def demod_pair(i_f: jnp.ndarray, q_f: jnp.ndarray, usb: bool) -> jnp.ndarray:
    """Reference-formulation demod from a real Hilbert pair (conformance)."""
    return i_f + q_f if usb else i_f - q_f
