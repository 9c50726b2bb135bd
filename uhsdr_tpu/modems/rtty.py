"""RTTY modem (45.45/50 Bd Baudot FSK).

Reference: `drivers/audio/rtty.c` —
  * RX (`Rtty_Demodulator_ProcessSample:634`, `RttyDecoder_demodulator:466`):
    two order-2 bandpass IIRs (mark fixed 915 Hz, space 915+shift;
    supported shifts 85/170/200/425/450/850), squared magnitudes, optional
    fldigi ATC (fast-attack/slow-decay `decayavg` envelopes + noise-floor
    clipping, w7ay "Optimal ATC"), order-2 ~50 Hz lowpass, comparator,
    DPLL bit sync (`RttyDecoder_getBitDPLL:558`, +-1/32 bit nudges),
    5x1.5 async frame (1 start, 5 data, 1.5 stop) -> Baudot bytes.
  * TX (`Rtty_Modulator_GenSample:806`): Baudot bitstream keyed between two
    phase-continuous NCOs.

TPU mapping: the filter bank + squaring are batched linear ops
(associative-scan biquads); the ATC envelopes and the DPLL/UART framing are
per-sample recurrences -> one fused `lax.scan` at 12 kHz, vectorized over
channels, emitting (valid, bits) pairs compacted on-device so only a small
fixed-size byte buffer leaves the chip.  Baudot<->ASCII tables live in
`rtty_text` (host side).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from scipy import signal as sps

from ..ops import iir, nco

MARK_FREQ = 915.0
SHIFTS = (85.0, 170.0, 200.0, 425.0, 450.0, 850.0)
SPEEDS = (45.45, 50.0)


def _bandpass_biquad(f0: float, fs: float, q: float = 20.0) -> np.ndarray:
    b, a = sps.iirpeak(f0, q, fs=fs)
    return np.concatenate([b, a[1:]]).astype(np.float32)


def _lowpass_biquad(fc: float, fs: float) -> np.ndarray:
    z, p, k = sps.butter(2, fc / (fs / 2), btype="low", output="zpk")
    sos = sps.zpk2sos(z, p, k)[0]
    return np.concatenate([sos[:3], sos[4:]]).astype(np.float32)


class RttyParams(NamedTuple):
    fs: float
    baud: float
    shift: float
    one_bit: int             # samples per bit
    mark_bp: np.ndarray      # (5,) biquad
    space_bp: np.ndarray
    lpf: np.ndarray
    atc: bool
    stopbits: float          # 1.5 or 2


def make_params(fs: float = 12000.0, baud: float = 45.45,
                shift: float = 170.0, atc: bool = True,
                stopbits: float = 1.5) -> RttyParams:
    return RttyParams(
        fs=fs, baud=baud, shift=shift,
        one_bit=int(round(fs / baud)),
        mark_bp=_bandpass_biquad(MARK_FREQ, fs),
        space_bp=_bandpass_biquad(MARK_FREQ + shift, fs),
        lpf=_lowpass_biquad(50.0, fs),
        atc=atc, stopbits=stopbits)


class RttyRxState(NamedTuple):
    mark_bq: jnp.ndarray     # (..., 2)
    space_bq: jnp.ndarray
    lpf_bq: jnp.ndarray
    atc_env: jnp.ndarray     # (..., 4): mark_env, space_env, mark_noise, space_noise
    # DPLL/UART scan state — all float32 (exact small integers; see the
    # axon scan-carry PERF NOTE in ops/agc.py)
    dpll_phase: jnp.ndarray
    dpll_oldval: jnp.ndarray
    dpll_changed: jnp.ndarray
    run_state: jnp.ndarray   # 0=wait_start 1=bits
    wait_state: jnp.ndarray  # start-bit detector state
    wait_half: jnp.ndarray
    byte_acc: jnp.ndarray
    byte_pos: jnp.ndarray


def init_state(batch_shape) -> RttyRxState:
    bs = tuple(batch_shape)
    z2 = jnp.zeros(bs + (2,), jnp.float32)
    z = jnp.zeros(bs, jnp.float32)
    return RttyRxState(mark_bq=z2, space_bq=z2, lpf_bq=z2,
                       atc_env=jnp.zeros(bs + (4,), jnp.float32),
                       dpll_phase=z, dpll_oldval=z, dpll_changed=z,
                       run_state=z, wait_state=z, wait_half=z,
                       byte_acc=z, byte_pos=z)


def _atc_scan(params: RttyParams, env0: jnp.ndarray, mark2: jnp.ndarray,
              space2: jnp.ndarray):
    """fldigi decayavg envelopes (fast attack / slow decay) + optimal ATC.
    Returns (v1 per sample, final env)."""
    ob = params.one_bit
    # reciprocal weights blended arithmetically (constant-branch selects
    # inside scan carries serialize on the axon TPU backend)
    w_fast = np.float32(4.0 / ob)
    w_slow16 = np.float32(1.0 / (ob * 16))
    w_slow48 = np.float32(1.0 / (ob * 48))

    def decay(avg, x, up_mask, w_up, w_dn):
        w = up_mask * w_up + (1.0 - up_mask) * w_dn
        return (x - avg) * w + avg

    def step(env, ms):
        m, s = ms
        me, se, mn, sn = env[..., 0], env[..., 1], env[..., 2], env[..., 3]
        f32 = jnp.float32
        me = decay(me, m, (m > me).astype(f32), w_fast, w_slow16)
        se = decay(se, s, (s > se).astype(f32), w_fast, w_slow16)
        mn = decay(mn, m, (m < mn).astype(f32), w_fast, w_slow48)
        sn = decay(sn, s, (s < sn).astype(f32), w_fast, w_slow48)
        nf = jnp.minimum(mn, sn)
        mc = jnp.clip(jnp.minimum(m, me), nf, None)
        sc = jnp.clip(jnp.minimum(s, se), nf, None)
        v1 = ((mc - nf) * (me - nf) - (sc - nf) * (se - nf)
              - 0.25 * ((me - nf) ** 2 - (se - nf) ** 2))
        return jnp.stack([me, se, mn, sn], axis=-1), v1

    ms_t = (jnp.moveaxis(mark2, -1, 0), jnp.moveaxis(space2, -1, 0))
    env_f, v1_t = jax.lax.scan(step, env0, ms_t, unroll=8)
    return jnp.moveaxis(v1_t, 0, -1), env_f


def demodulate(params: RttyParams, state: RttyRxState, audio: jnp.ndarray):
    """audio (..., T) at 12 kHz -> (bytes_out (..., MAXB) int32 (-1 = none),
    nbytes (...,), new_state).

    bytes_out holds raw 5-bit Baudot codes in arrival order.
    """
    T = audio.shape[-1]
    # mark/space filter bank (note: reference swaps mark/space in the ATC
    # path, rtty.c:480 "dirty fix" — net effect is mark = mark)
    mark, mbq = iir.biquad_block(jnp.asarray(params.mark_bp), state.mark_bq,
                                 audio)
    space, sbq = iir.biquad_block(jnp.asarray(params.space_bp),
                                  state.space_bq, audio)
    mark2 = mark * mark
    space2 = space * space

    if params.atc:
        v1, atc_env = _atc_scan(params, state.atc_env, mark2, space2)
    else:
        v1 = space2 - mark2
        atc_env = state.atc_env
    v1, lbq = iir.biquad_block(jnp.asarray(params.lpf), state.lpf_bq, v1)
    # bit value: 1 = mark.  ATC v1 > 0 means mark dominant.
    bitval = v1 > 0 if params.atc else v1 <= 0

    # ---- DPLL + async UART framing scan ----
    # All carries float32, all blends arithmetic: scan carries updated via
    # constant-branch selects serialize on the axon TPU backend (see
    # ops/agc.py PERF NOTE).  Integer quantities (phase counter, bit index,
    # accumulated code) are exact small floats; bit packing uses exp2.
    ob = np.float32(params.one_bit)
    ob_half = np.float32(params.one_bit // 2)
    ob_nudge = np.float32(max(params.one_bit // 32, 1))
    nbits = 5.0

    def step(carry, bv):
        (phase, oldval, changed, run, wstate, whalf, acc, pos) = carry
        f32 = jnp.float32
        b = bv.astype(f32)            # 1 = mark
        sp = 1.0 - b                  # 1 = space

        # start-bit waiter (rtty.c:594-632): 0 arm on mark, 1 wait space,
        # 2 load half-bit timer, 3 count down and confirm space
        is_w = (run < 0.5).astype(f32)
        w0 = (wstate < 0.5).astype(f32)
        w1 = ((wstate > 0.5) & (wstate < 1.5)).astype(f32)
        w3 = (wstate > 2.5).astype(f32)
        adv0 = w0 * b                 # arm
        adv1 = w1 * sp                # falling edge seen
        wstate_n = wstate + adv0 + adv1          # 0->1, 1->2
        start_half = ((wstate_n > 1.5) & (wstate_n < 2.5)).astype(f32)
        whalf_n = start_half * ob_half + (1.0 - start_half) * whalf
        wstate_n = wstate_n + start_half         # 2->3
        in_conf = (wstate_n > 2.5).astype(f32)
        whalf_n = whalf_n - in_conf
        confirmed = in_conf * (whalf_n < 0.5).astype(f32)
        got_start = is_w * confirmed * sp
        wstate_n = wstate_n * (1.0 - confirmed)  # reset waiter

        run_n = run + got_start * (1.0 - run)
        phase = phase * (1.0 - got_start)
        acc = acc * (1.0 - got_start)
        pos = pos * (1.0 - got_start)

        # DPLL (active in run==1)
        active = (run > 0.5).astype(f32)
        edge = active * (b != oldval).astype(f32) * (1.0 - changed)
        early = (phase < ob_half).astype(f32)
        phase = phase + edge * (2.0 * early - 1.0) * ob_nudge
        changed_n = jnp.minimum(changed + edge, 1.0)
        phase_n = phase + active
        bit_ready = active * (phase_n > ob - 0.5).astype(f32)
        phase_n = phase_n - bit_ready * ob
        changed_n = changed_n * (1.0 - bit_ready)

        take = bit_ready
        in_data = (pos < nbits - 0.5).astype(f32)
        acc_n = acc + take * in_data * b * jnp.exp2(pos)
        pos_n = pos + take
        done = take * (pos_n > nbits + 0.5).astype(f32)  # 5 data + stop
        emit = done * acc_n + (1.0 - done) * (-1.0)
        run_n = run_n * (1.0 - done)

        new_carry = (phase_n, b, changed_n, run_n,
                     wstate_n * (1.0 - active), whalf_n,
                     acc_n * (1.0 - done), pos_n * (1.0 - done))
        return new_carry, emit

    carry0 = (state.dpll_phase, state.dpll_oldval, state.dpll_changed,
              state.run_state, state.wait_state, state.wait_half,
              state.byte_acc, state.byte_pos)
    bv_t = jnp.moveaxis(bitval, -1, 0)
    carry_f, emits_f = jax.lax.scan(step, carry0, bv_t, unroll=8)
    emits = jnp.moveaxis(emits_f, 0, -1).astype(jnp.int32)  # -1 = none

    # compact: gather emitted codes into a fixed-size per-block buffer
    # (only this small buffer ever leaves the device)
    max_bytes = max(int(T / params.fs * params.baud / 6) + 4, 8)
    valid = emits >= 0
    idx = jnp.cumsum(valid.astype(jnp.int32), axis=-1) - 1
    # invalid slots scatter to the sacrificial last column
    idx = jnp.where(valid, jnp.minimum(idx, max_bytes - 1), max_bytes)
    buf = jnp.full(audio.shape[:-1] + (max_bytes + 1,), -1, jnp.int32)
    bytes_out = _scatter_last(buf, idx, jnp.where(valid, emits, -1))
    nbytes = jnp.sum(valid, axis=-1)

    new_state = RttyRxState(
        mark_bq=mbq, space_bq=sbq, lpf_bq=lbq, atc_env=atc_env,
        dpll_phase=carry_f[0], dpll_oldval=carry_f[1],
        dpll_changed=carry_f[2], run_state=carry_f[3],
        wait_state=carry_f[4], wait_half=carry_f[5],
        byte_acc=carry_f[6], byte_pos=carry_f[7])
    return bytes_out[..., :max_bytes], nbytes, new_state


def _scatter_last(buf: jnp.ndarray, idx: jnp.ndarray, val: jnp.ndarray):
    """buf (..., M); idx/val (..., T): buf[..., idx[t]] = val[t] via
    take_along_axis-compatible scatter."""
    return buf.at[
        tuple(jnp.broadcast_to(
            jnp.arange(s).reshape((1,) * i + (s,) + (1,) * (buf.ndim - i - 1)),
            idx.shape) for i, s in enumerate(buf.shape[:-1])) + (idx,)
    ].set(val, mode="drop")


# ---------------------------------------------------------------------------
# TX: Baudot bitstream -> phase-continuous AFSK audio
# ---------------------------------------------------------------------------

def modulate(params: RttyParams, phase0: jnp.ndarray,
             bits: jnp.ndarray):
    """bits: (..., n_samples) bool (True=mark), already expanded to sample
    rate (use rtty_text.encode + expand_bits).  Returns (audio, new_phase).
    Phase-continuous: one uint32 accumulator, per-sample delta switches."""
    d_mark = nco.freq_to_delta(MARK_FREQ, params.fs)
    d_space = nco.freq_to_delta(MARK_FREQ + params.shift, params.fs)
    deltas = jnp.where(bits, jnp.uint32(d_mark), jnp.uint32(d_space))
    acc = phase0[..., None] + jnp.cumsum(deltas, axis=-1)
    ph = acc.astype(jnp.float32) * np.float32(2 * np.pi / 2 ** 32)
    return jnp.sin(ph), acc[..., -1]
