"""FreeDV digital-voice interface (scaffold).

The reference vendors the full Codec2/FreeDV library (~113 kLoC,
`drivers/freedv/`) and glues it to the chain via sample-rate-converted
ring buffers processed off the hot path (`freedv_uhsdr.c:166-320`,
`audio_driver.c:1330-1470`: 48 kHz IQ -> drop-decimate /6 -> 8 kHz modem
<-> 24-tap polyphase x6 interpolation back).  SURVEY §7 scopes the modem
core (FDMDV/OFDM/codec2 vocoder) out of the kernels-first milestones; this
module provides the framework-side contract so a codec2 binding or
re-implementation drops in:

  * the 48k<->8k rate conversion matching the reference glue,
  * the modem interface (`FreeDvModem`),
  * a loopback test modem proving the plumbing.
"""
from __future__ import annotations

from typing import NamedTuple, Protocol

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import design, fir

MODEM_RATE = 8000.0
IQ_RATE = 48000.0
RATIO = 6


class FreeDvModem(Protocol):
    """The contract `freedv_comprx`/`freedv_comptx` fulfil in the
    reference.  Implementations: codec2 binding (future) or test stubs."""

    def demod(self, iq_8k: np.ndarray) -> np.ndarray:
        """complex 8 kHz modem input -> 8 kHz speech (may be empty while
        the modem accumulates a frame)."""
        ...

    def mod(self, speech_8k: np.ndarray) -> np.ndarray:
        """8 kHz speech -> complex 8 kHz modem output."""
        ...


class LoopbackModem:
    """Plumbing-test modem: SSB-like passthrough (audio = Re(iq))."""

    def demod(self, iq_8k: np.ndarray) -> np.ndarray:
        return np.real(iq_8k).astype(np.float32)

    def mod(self, speech_8k: np.ndarray) -> np.ndarray:
        return speech_8k.astype(np.complex64)


class RateConverter:
    """48k <-> 8k conversion for the modem path.

    The reference drop-decimates 48k->8k with modulus counters (no
    anti-alias filter! `audio_driver.c:1340-1341`) and interpolates back
    with a 24-tap polyphase (`:1422-1442`).  Here both directions are
    proper polyphase FIRs (the /6 anti-alias the reference omits is nearly
    free on TPU and strictly improves the modem's input SNR).
    """

    def __init__(self, block_len_48k: int):
        assert block_len_48k % RATIO == 0
        self.block = block_len_48k
        self.h_dec = design.decimation_fir(72, RATIO, IQ_RATE).astype(np.float32)
        self.h_int = design.interpolation_fir(72, RATIO, IQ_RATE).astype(np.float32)
        self._dec_carry_i = None
        self._dec_carry_q = None
        self._int_carry = None

    def down(self, iq_48k: jnp.ndarray) -> jnp.ndarray:
        bs = iq_48k.shape[:-1]
        if self._dec_carry_i is None:
            self._dec_carry_i = fir.init_carry(bs, 72, jnp.float32)
            self._dec_carry_q = fir.init_carry(bs, 72, jnp.float32)
        i_d, self._dec_carry_i = fir.fir_decimate_block(
            jnp.asarray(self.h_dec), self._dec_carry_i, jnp.real(iq_48k), RATIO)
        q_d, self._dec_carry_q = fir.fir_decimate_block(
            jnp.asarray(self.h_dec), self._dec_carry_q, jnp.imag(iq_48k), RATIO)
        return jax.lax.complex(i_d, q_d)

    def up(self, audio_8k: jnp.ndarray) -> jnp.ndarray:
        bs = audio_8k.shape[:-1]
        if self._int_carry is None:
            sub = -(-72 // RATIO)
            self._int_carry = jnp.zeros(bs + (sub - 1,), jnp.float32)
        y, self._int_carry = fir.fir_interpolate_block(
            jnp.asarray(self.h_int), self._int_carry, audio_8k, RATIO)
        return y


def freedv_rx_block(conv: RateConverter, modem: FreeDvModem,
                    iq_48k: jnp.ndarray) -> jnp.ndarray:
    """The RX glue path: 48k IQ -> 8k -> modem -> 8k speech -> 48k audio."""
    iq8 = conv.down(iq_48k)
    speech = modem.demod(np.asarray(iq8))
    return conv.up(jnp.asarray(speech))
