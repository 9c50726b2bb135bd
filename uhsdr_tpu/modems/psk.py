"""BPSK modem (PSK31/63/125).

Reference: `drivers/audio/psk.c` —
  * RX (`Psk_Demodulator_ProcessSample:606`): IIR bandpass around the
    500 Hz audio offset (`psk.h:17`), product detector against a 500 Hz
    NCO, running sums over one carrier period (PSK_BUF_LEN =
    12000/500 = 24), symbol decision every `rate` samples
    (384/192/96 for 31.25/62.5/125 Bd), differential decode (sign flip =
    0, same sign = 1); the timing error correction term is computed but
    hard-disabled in the reference (`psk.c:661` "rx_err_corr = 0").
  * Varicode per the public G3PLX PSK31 standard (`_varicode_table.py`).
  * TX (`Psk_Modulator_GenSample:706`): phase reversals with
    raised-cosine shaping at bit boundaries for 0-bits.

TPU mapping: with the error correction disabled the symbol clock is
strictly periodic, so the whole demodulator vectorizes: bandpass biquad
(associative scan), NCO product, cumulative-sum moving average, strided
sampling at sub-symbol instants, differential compare.  Only bit->char
varicode assembly is event-driven (host, `psk_text`).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from scipy import signal as sps

from ..ops import iir, nco

PSK_OFFSET = 500.0
RATES = {31: 384, 63: 192, 125: 96}   # samples per symbol @12 kHz


def _bandpass(fs: float, baud: float) -> np.ndarray:
    bw = max(baud, 31.25)
    z, p, k = sps.butter(1, [(PSK_OFFSET - bw) / (fs / 2),
                             (PSK_OFFSET + bw) / (fs / 2)],
                         btype="band", output="zpk")
    sos = sps.zpk2sos(z, p, k)[0]
    return np.concatenate([sos[:3], sos[4:]]).astype(np.float32)


class PskParams(NamedTuple):
    fs: float
    speed: int              # 31 | 63 | 125
    rate: int               # samples per symbol
    buf_len: int            # carrier period in samples
    bpf: np.ndarray


def make_params(fs: float = 12000.0, speed: int = 31) -> PskParams:
    return PskParams(fs=fs, speed=speed, rate=RATES[speed],
                     buf_len=int(fs / PSK_OFFSET),
                     bpf=_bandpass(fs, {31: 31.25, 63: 62.5, 125: 125.0}[speed]))


class PskRxState(NamedTuple):
    bpf_bq: jnp.ndarray      # (..., 2)
    nco_phase: jnp.ndarray   # (...,) uint32
    prod_tail: jnp.ndarray   # (..., buf_len-1) sin-product history
    sample_offset: jnp.ndarray  # (...,) int32 position within symbol
    last_symbol: jnp.ndarray    # (...,) f32
    last_bit: jnp.ndarray       # (...,) int32


def init_state(batch_shape, params: PskParams) -> PskRxState:
    bs = tuple(batch_shape)
    return PskRxState(
        bpf_bq=jnp.zeros(bs + (2,), jnp.float32),
        nco_phase=jnp.zeros(bs, jnp.uint32),
        prod_tail=jnp.zeros(bs + (params.buf_len - 1,), jnp.float32),
        sample_offset=jnp.zeros(bs, jnp.int32),
        last_symbol=jnp.zeros(bs, jnp.float32),
        last_bit=jnp.ones(bs, jnp.int32))


def demodulate(params: PskParams, state: PskRxState, audio: jnp.ndarray):
    """audio (..., T) @12 kHz, T % rate == 0.
    Returns (bits (..., T//rate) int32, new_state)."""
    T = audio.shape[-1]
    assert T % params.rate == 0
    L = params.buf_len

    x, bq = iir.biquad_block(jnp.asarray(params.bpf), state.bpf_bq, audio)
    delta = nco.freq_to_delta(PSK_OFFSET, params.fs)
    ph = nco.phase_ramp(state.nco_phase, jnp.asarray(delta), T)
    sin_mix = jnp.sin(ph) * x
    new_phase = nco.advance(state.nco_phase, jnp.asarray(delta), T)

    # moving average of sin products over one carrier period
    full = jnp.concatenate([state.prod_tail, sin_mix], axis=-1)
    csum = jnp.cumsum(full, axis=-1)
    csum = jnp.concatenate([jnp.zeros_like(csum[..., :1]), csum], axis=-1)
    mavg = (csum[..., L:] - csum[..., :-L]) / L       # (..., T)

    # symbol sampling: every `rate` samples at the carried offset
    n_sym = T // params.rate
    # sample at the last carrier-period boundary of each symbol interval
    sym_idx = (jnp.arange(n_sym) + 1) * params.rate - 1
    symbols = mavg[..., sym_idx]                      # (..., n_sym)

    prev = jnp.concatenate([state.last_symbol[..., None],
                            symbols[..., :-1]], axis=-1)
    bits = jnp.where(prev * symbols < 0, 0, 1).astype(jnp.int32)

    new_state = PskRxState(
        bpf_bq=bq, nco_phase=new_phase,
        prod_tail=full[..., -(L - 1):],
        sample_offset=state.sample_offset,
        last_symbol=symbols[..., -1],
        last_bit=bits[..., -1])
    return bits, new_state


# ---------------------------------------------------------------------------
# TX: varicode bits -> BPSK audio with raised-cosine phase reversals
# ---------------------------------------------------------------------------

def modulate(params: PskParams, phase0: jnp.ndarray, signs: jnp.ndarray,
             envelope: jnp.ndarray):
    """signs/envelope: (..., T) per-sample carrier sign (+-1) and amplitude
    envelope, produced host-side by `psk_text.bits_to_waveform_params`.
    Audio = sign * env * sin(2*pi*f0*t), phase-continuous."""
    T = signs.shape[-1]
    delta = nco.freq_to_delta(PSK_OFFSET, params.fs)
    ph = nco.phase_ramp(phase0, jnp.asarray(delta), T)
    audio = signs * envelope * jnp.sin(ph)
    return audio, nco.advance(phase0, jnp.asarray(delta), T)
