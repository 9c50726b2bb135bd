"""TX modulators: SSB (phasing), AM (dual sideband + carrier), FM (phase
accumulator), CW carrier shaping.

Reference: `tx_processor.c` —
  * SSB `TxProcessor_SSB:467-491`: 201-tap TX Hilbert pair (I/Q swapped for
    LSB) then FreqShift.  Here: one complex analytic FIR; LSB = conjugate.
  * AM `TxProcessor_AM:734-810`: Hilbert pair then in-place both-sideband +
    carrier: i = (I-Q) + 2C, q = (Q-I) - 2C with C = AM_CARRIER_LEVEL,
    then FreqShift.  Note q = -i: the pre-shift signal is a real DSB
    waveform duplicated with opposite signs.
  * FM `TxProcessor_FM:534-600`: one-pole pre-emphasis differentiator
    (alpha 0.05), optional subaudible-tone / tone-burst DDS add, then a
    16-bit integer phase accumulator stepping by (carrier word + scaled
    audio), sin table for I, +90 deg for Q.  Here the accumulator is an
    exact int32 cumulative sum (parallel) with the same 16-bit wrap.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import design, fir, iir, nco

IQ_RATE = 48000.0
TX_TAPS = 201                    # filters.h / audio_filter.c:1239-1249
# Reference AM_CARRIER_LEVEL is 5100 DAC units against ~30000 full-scale
# audio (audio_driver.h:429); in this framework's normalized +/-1.0 audio
# domain the equivalent relative carrier is ~0.5 (100% modulation when the
# phased sideband sum peaks at 1.0).
AM_CARRIER_LEVEL = 0.5

FM_TX_HPF_ALPHA = 0.05
# The reference's FM_MOD_SCALING=16 assumes +/-30000-unit (DAC-scale)
# audio; this framework's audio is normalized +/-1.0, so fold the domain
# ratio into the accumulator scaling (16 * 30000).  A full-scale 1 kHz
# tone then produces ~2.5 kHz deviation, matching tx_processor.c:504.
FM_MOD_SCALING_2K5 = 16.0 * 30000.0
FM_MOD_ACC_BITS = 16
FM_SUBAUDIBLE_SCALE = 0.00045
FM_TONE_BURST_SCALE = FM_MOD_SCALING_2K5 / 4266.0
FM_MOD_AMPLITUDE_SCALING = 0.875


# ---------------------------------------------------------------------------
# SSB
# ---------------------------------------------------------------------------

class SsbModParams(NamedTuple):
    fir_re: np.ndarray
    fir_im: np.ndarray
    nco_delta: np.ndarray   # uint32
    lsb: bool


def ssb_params(f_lo: float = 150.0, f_hi: float = 2850.0,
               translate_hz: float = 6000.0, lsb: bool = False) -> SsbModParams:
    h = design.complex_bandpass_fir(TX_TAPS, f_lo, f_hi, IQ_RATE)
    return SsbModParams(h.real.astype(np.float32), h.imag.astype(np.float32),
                        nco.freq_to_delta(translate_hz, IQ_RATE), lsb)


def _tx_hilbert_pair():
    from .. import data as refdata
    return (refdata.fir("iq_tx_wide_i").astype(np.float32),
            refdata.fir("iq_tx_wide_q").astype(np.float32))


def ssb_params_ref(translate_hz: float = 6000.0,
                   lsb: bool = False) -> SsbModParams:
    """The firmware's 201-tap TX Hilbert pair (filters/iq_tx_filter.c
    iq_tx_wide) as the analytic filter.  The firmware computes
    I = a (*) h_i, Q = a (*) h_q (pair swapped for LSB,
    tx_processor.c:478-480); its h_q LEADS h_i by +90 deg, so in the
    i+jq buffer domain USB content sits BELOW the translate frequency —
    the mcHF's QSE (TX mixer) wiring flips the spectrum between the DAC
    and the antenna, where it emerges as proper USB.  This framework's
    capture convention is the RX one (usb = above carrier), so that
    hardware flip is applied here as a conjugation of the pair:
    usb -> h_i - j h_q, lsb -> h_q - j h_i.  The conformance oracle
    (tests/golden/ref_tx.py) keeps the firmware's literal buffer math and
    the test conjugates at the comparison — one wiring convention,
    documented once."""
    h_i, h_q = _tx_hilbert_pair()
    re, im = (h_q, -h_i) if lsb else (h_i, -h_q)
    return SsbModParams(re, np.ascontiguousarray(im),
                        nco.freq_to_delta(translate_hz, IQ_RATE), False)



class SsbModState(NamedTuple):
    carry: jnp.ndarray      # (..., taps-1) f32 audio history
    phase: jnp.ndarray      # (...,) uint32


def ssb_init(batch_shape) -> SsbModState:
    bs = tuple(batch_shape)
    return SsbModState(carry=jnp.zeros(bs + (TX_TAPS - 1,), jnp.float32),
                       phase=jnp.zeros(bs, jnp.uint32))


def _analytic_fir(fir_re, fir_im, carry, audio):
    """TX Hilbert/analytic FIR dispatch: real audio -> analytic signal.

    Off-CPU, MXU-tiling shapes go through the REAL-input Pallas FIR
    kernel (2 matmuls; the voice signal has no imaginary part) — the TX
    front runs at the FULL 48 kHz rate (no decimation), so it is the
    dominant TX stage on the XLA FFT path.
    """
    use_pallas = (jax.default_backend() != "cpu" and audio.ndim == 2
                  and audio.shape[0] % 8 == 0
                  and audio.shape[-1] % 512 == 0)
    if use_pallas:
        from ..pallas import fir as pallas_fir
        h_np = np.asarray(fir_re) + 1j * np.asarray(fir_im)
        tmax = 128 // pallas_fir.TILE_C_DIV
        tile_c = next((tc for tc in (tmax, 8) if audio.shape[0] % tc == 0), 8)
        return pallas_fir.fir_real_analytic_pallas(
            h_np, carry, audio, tile_c=tile_c, tile_t=512)
    h = jax.lax.complex(jnp.asarray(fir_re), jnp.asarray(fir_im))
    return fir.fir_block(h, carry, audio)


def ssb_modulate(params: SsbModParams, state: SsbModState, audio: jnp.ndarray):
    """audio (..., T) f32 -> (iq (..., T) complex64, new_state)."""
    # fully-fused Pallas path: real-input analytic FIR (2 matmuls instead
    # of 4 — the voice signal has no imaginary part) + LSB conjugation +
    # post-FIR NCO mix, all in one kernel (no intermediate HBM round trips)
    use_pallas = (jax.default_backend() != "cpu" and audio.ndim == 2
                  and audio.shape[0] % 8 == 0 and audio.shape[-1] % 512 == 0)
    if use_pallas:
        from ..pallas import fir as pallas_fir
        tmax = 128 // pallas_fir.TILE_C_DIV
        tile_c = next((tc for tc in (tmax, 8) if audio.shape[0] % tc == 0), 8)
        z, carry = pallas_fir.fir_real_analytic_pallas(
            np.asarray(params.fir_re) + 1j * np.asarray(params.fir_im),
            state.carry, audio, tile_c=tile_c, tile_t=512,
            nco=(state.phase.reshape(-1)[0], jnp.asarray(params.nco_delta)),
            conj=params.lsb)
        phase = nco.advance(
            state.phase,
            jnp.broadcast_to(jnp.asarray(params.nco_delta),
                             state.phase.shape), audio.shape[-1])
        return z, SsbModState(carry=carry, phase=phase)
    z, carry = _analytic_fir(params.fir_re, params.fir_im, state.carry, audio)
    if params.lsb:
        z = jnp.conj(z)
    z, phase = nco.mix(z, state.phase,
                       jnp.broadcast_to(params.nco_delta, state.phase.shape))
    return z, SsbModState(carry=carry, phase=phase)


# ---------------------------------------------------------------------------
# AM
# ---------------------------------------------------------------------------

class AmModParams(NamedTuple):
    fir_re: np.ndarray
    fir_im: np.ndarray
    nco_delta: np.ndarray
    carrier_level: float


def am_params(translate_hz: float = 6000.0,
              carrier_level: float = AM_CARRIER_LEVEL) -> AmModParams:
    h = design.complex_bandpass_fir(TX_TAPS, 150.0, 2850.0, IQ_RATE)
    return AmModParams(h.real.astype(np.float32), h.imag.astype(np.float32),
                       nco.freq_to_delta(translate_hz, IQ_RATE),
                       carrier_level)


def am_params_ref(translate_hz: float = 6000.0) -> AmModParams:
    """Reference AM: TX Hilbert pair + AM_CARRIER_LEVEL=5100 DAC counts
    (audio_driver.h:429) — count-domain audio (ref front)."""
    h_i, h_q = _tx_hilbert_pair()
    return AmModParams(h_i, h_q, nco.freq_to_delta(translate_hz, IQ_RATE),
                       5100.0)


def am_init(batch_shape) -> SsbModState:
    return ssb_init(batch_shape)


def am_modulate(params: AmModParams, state: SsbModState, audio: jnp.ndarray):
    z, carry = _analytic_fir(params.fir_re, params.fir_im, state.carry, audio)
    i_f, q_f = jnp.real(z), jnp.imag(z)
    s = (i_f - q_f) + 2.0 * params.carrier_level
    iq = jax.lax.complex(s, -s)
    iq, phase = nco.mix(iq, state.phase,
                        jnp.broadcast_to(params.nco_delta, state.phase.shape))
    return iq, SsbModState(carry=carry, phase=phase)


# ---------------------------------------------------------------------------
# FM
# ---------------------------------------------------------------------------

class FmModParams(NamedTuple):
    freq_word: np.int32       # carrier shift accumulator step (16-bit domain)
    mod_scale: np.float32     # audio -> accumulator step scaling
    subtone_delta: np.ndarray | None   # uint32 DDS for subaudible tone
    subtone_scale: np.float32
    swap_iq: bool             # negative translate
    table_quant: bool = False  # quantize phase to the firmware's 10-bit
                               # DDS table grid (tx_processor.c:585-588,
                               # softdds/dds_table.c) — the ref-front
                               # conformance mode


def fm_mod_params(translate_hz: float = 6000.0, dev_5khz: bool = False,
                  subtone_hz: float = 0.0,
                  count_domain: bool = False) -> FmModParams:
    """count_domain: audio arrives in int16-count units (the ref-front
    chain scales to the firmware's domain), so the accumulator step is
    the bare FM_MOD_SCALING=16 (tx_processor.c:498) and the phase is
    quantized to the DDS table grid."""
    mult = 2.0 if dev_5khz else 1.0
    word = int(((1 << FM_MOD_ACC_BITS) * abs(translate_hz)) // IQ_RATE)
    sub = nco.freq_to_delta(subtone_hz, IQ_RATE) if subtone_hz > 0 else None
    scale = 16.0 if count_domain else FM_MOD_SCALING_2K5
    return FmModParams(np.int32(word),
                       np.float32(scale * mult),
                       sub, np.float32(FM_SUBAUDIBLE_SCALE * mult),
                       translate_hz < 0, table_quant=count_domain)


class FmModState(NamedTuple):
    hpf_a: jnp.ndarray      # pre-emphasis state
    hpf_b: jnp.ndarray
    accum: jnp.ndarray      # (...,) int32 16-bit phase accumulator
    sub_phase: jnp.ndarray  # (...,) uint32


def fm_mod_init(batch_shape) -> FmModState:
    bs = tuple(batch_shape)
    z = jnp.zeros(bs, jnp.float32)
    return FmModState(hpf_a=z, hpf_b=z,
                      accum=jnp.zeros(bs, jnp.int32),
                      sub_phase=jnp.zeros(bs, jnp.uint32))


def fm_modulate(params: FmModParams, state: FmModState, audio: jnp.ndarray):
    """audio (..., T) -> (iq complex64, new_state)."""
    if params.table_quant:
        # REF-EXACT sequential pre-emphasis (tx_processor.c:543-552):
        # the phase accumulator truncates every sample, so the blocked
        # associative scan's different f32 summation order would flip
        # truncation decisions and integrate into phase noise
        def pe_step(carry, x):
            b_prev, a_prev = carry
            b = np.float32(FM_TX_HPF_ALPHA) * (b_prev + x - a_prev)
            return (b, x), b

        xt = jnp.moveaxis(audio, -1, 0)
        (hpf_b, _), pre_t = jax.lax.scan(pe_step,
                                         (state.hpf_b, state.hpf_a), xt)
        pre = jnp.moveaxis(pre_t, 0, -1)
    else:
        # 6 dB/oct pre-emphasis: b[n] = alpha*(b[n-1] + a[n] - a[n-1])
        a_d = jnp.concatenate([state.hpf_a[..., None], audio[..., :-1]],
                              axis=-1)
        diff = audio - a_d
        pre, hpf_b = iir.one_pole_block(FM_TX_HPF_ALPHA, FM_TX_HPF_ALPHA,
                                        state.hpf_b, diff)
    sub_phase = state.sub_phase
    if params.subtone_delta is not None:
        tone, sub_phase = nco.tone(state.sub_phase,
                                   jnp.broadcast_to(params.subtone_delta,
                                                    state.sub_phase.shape),
                                   audio.shape[-1])
        pre = pre + tone * params.subtone_scale

    # integer phase accumulation, exact (reference 16-bit accumulator).
    # ref mode: the firmware's `acc += word + a*scale` converts the FLOAT
    # sum back to uint EVERY sample — with an integer acc that is exactly
    # floor(word + a*scale) per step (the fractional residue is dropped,
    # not carried), which biases the carrier by ~ -0.5 LSB/sample; round()
    # here would diverge from it as a growing phase ramp
    if params.table_quant:
        # REF-EXACT accumulator: C does `acc = (uint32)((float)acc + word
        # + a*scale) % 2^16` — the f32 SUM (magnitude up to ~73k, ULP
        # 0.0078) is truncated each sample, so this must run as a
        # sequential f32 recurrence, not a cumsum of rounded steps
        rhs = np.float32(float(params.freq_word)) + pre * params.mod_scale

        def acc_step(acc_f, r):
            s = jnp.floor(acc_f + r)
            s = jnp.mod(s, np.float32(1 << FM_MOD_ACC_BITS))
            return s, s

        rt = jnp.moveaxis(rhs, -1, 0)
        acc_last, acc_t = jax.lax.scan(acc_step,
                                       state.accum.astype(jnp.float32), rt)
        acc_f = jnp.moveaxis(acc_t, 0, -1)
        # the firmware indexes a 1024-entry sine table with acc >> 6 —
        # reproduce the 10-bit phase grid exactly (the remaining delta
        # vs the oracle is the table's int16 amplitude rounding, ~-90 dB)
        acc_wrapped = (jnp.floor(acc_f / 64.0) * 64.0).astype(jnp.int32)
        acc_final = acc_last.astype(jnp.int32)
    else:
        steps = (params.freq_word +
                 jnp.round(pre * params.mod_scale).astype(jnp.int32))
        acc = state.accum[..., None] + jnp.cumsum(steps, axis=-1)
        acc_wrapped = jnp.bitwise_and(acc, (1 << FM_MOD_ACC_BITS) - 1)
        acc_final = acc[..., -1] & ((1 << FM_MOD_ACC_BITS) - 1)
    ph = acc_wrapped.astype(jnp.float32) * np.float32(
        2.0 * np.pi / (1 << FM_MOD_ACC_BITS))
    # z = i + jq = e^{j ph}: positive accumulator step -> positive
    # (upper-side) frequency.  The reference's sin/cos(+90 deg) table pair
    # with its i/q swap for negative shifts encodes the same two cases.
    # Ref mode reproduces the firmware's exact table convention:
    # i = DDS[idx] = sin(th), q = DDS[idx + 3N/4] = -cos(th)
    # (tx_processor.c:585-588, softdds_phase_shift90) — a constant -pi/2
    # rotation relative to the e^{j th} form.
    if params.table_quant:
        i_s = jnp.sin(ph)
        q_s = -jnp.cos(ph)
    else:
        i_s = jnp.cos(ph)
        q_s = jnp.sin(ph)
    if params.swap_iq:
        i_s, q_s = q_s, i_s
    iq = jax.lax.complex(i_s, q_s) * np.float32(FM_MOD_AMPLITUDE_SCALING)
    return iq, FmModState(hpf_a=audio[..., -1], hpf_b=hpf_b,
                          accum=acc_final,
                          sub_phase=sub_phase)


# ---------------------------------------------------------------------------
# CW carrier (keyed envelope applied to a tone; the keyer state machine
# lives in modems.cw)
# ---------------------------------------------------------------------------

def cw_carrier(envelope: jnp.ndarray, phase0: jnp.ndarray,
               delta) -> tuple[jnp.ndarray, jnp.ndarray]:
    """envelope (..., T) in [0,1] -> keyed IQ carrier at the sidetone/offset
    frequency (reference: CW TX at translate offset, tx_processor.c:856-889)."""
    osc, phase = nco.tone_iq(phase0, jnp.broadcast_to(jnp.asarray(delta),
                                                      phase0.shape),
                             envelope.shape[-1])
    return envelope * osc, phase


# --- FM tone burst (repeater access) ---------------------------------------
# Reference: `tx_processor.c:519,561-563` adds a NON-pre-emphasized burst
# tone at ~2/3 system modulation while active (suppressing the subaudible
# tone); frequencies 1750 / 2135 Hz (`audio_management.c:328`).
FM_TONE_BURST_FREQS = (0.0, 1750.0, 2135.0)
FM_TONE_BURST_SCALE = np.float32(1.0 / 4266.0)   # of FM_MOD_SCALING units


def fm_tone_burst(phase0: jnp.ndarray, mode: int, n: int,
                  fs: float = IQ_RATE):
    """Generate `n` samples of the tone burst for `mode` (0=off, 1=1750,
    2=2135 Hz).  Returns (audio_addend, new_phase); add the addend to the
    FM modulator's post-pre-emphasis audio while the burst is keyed."""
    freq = FM_TONE_BURST_FREQS[mode]
    if freq == 0.0:
        return jnp.zeros(phase0.shape + (n,), jnp.float32), phase0
    delta = nco.freq_to_delta(freq, fs)
    tone, new_phase = nco.tone(phase0,
                               jnp.broadcast_to(delta, phase0.shape), n)
    return tone * FM_TONE_BURST_SCALE * 4266.0, new_phase
