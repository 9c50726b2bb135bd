"""FM demodulation: differential discriminator, de-emphasis, squelch,
subaudible-tone detection.

Reference: `AudioDriver_DemodFM` (`audio_driver.c:1544-1737`), constants
`:1490-1513` (LPF alpha 0.05, HPF alpha 0.96, squelch smoothing 0.005,
hysteresis 3, subtone ratio threshold 1.75, debounce 2/5, Goertzel window
400 blocks of 32 samples).

TPU-first redesign: the discriminator ``atan2(I'Q - IQ', I'I + QQ')`` is
``angle(conj(z[n-1])*z[n])`` — vectorized with a one-sample carry, no scan.
De-emphasis and HPF are one-pole linear recurrences (associative scan).
The squelch noise estimate samples the HPF'd discriminator at the
reference's 1500 Hz block cadence (every 32 samples) and runs its
hysteresis state machine as a short scan at that cadence; subtone
detection projects onto 3 DFT bins (above/on/below) per accumulation
window and applies the same ratio/debounce logic.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import iir, nco

LPF_ALPHA = 0.05       # de-emphasis (reference FM_RX_LPF_ALPHA)
HPF_ALPHA = 0.96       # audio HPF (FM_RX_HPF_ALPHA)
SQL_SMOOTHING = 0.005  # squelch one-pole (FM_RX_SQL_SMOOTHING)
SQL_HYSTERESIS = 3
SQL_PROC_DECIM = 200   # 1/SQL_SMOOTHING: hysteresis evaluated every 200 sub-blocks
SUBBLOCK = 32          # reference IQ_BLOCK_SIZE cadence for squelch sampling
TONE_DET_ALPHA = 0.9
TONE_THRESHOLD = 1.75
TONE_DEBOUNCE_MAX = 5
TONE_DEBOUNCE_THRESH = 2
GOERTZEL_WINDOW_SAMPLES = 400 * 32   # 400 blocks of 32 @48k


class FmParams(NamedTuple):
    fs: float
    sql_threshold: int          # 0..24, 0 = squelch off
    subtone_hz: float           # 0 = detection off
    squelch_sos: np.ndarray     # HPF for noise estimate
    deltas: np.ndarray | None   # (3,) uint32 NCO deltas [ctr, low, high]


def make_params(fs: float = 48000.0, sql_threshold: int = 0,
                subtone_hz: float = 0.0) -> FmParams:
    # noise HPF above voice band (reference IIR_Squelch_HPF lattice);
    # butterworth HPC at ~5.4 kHz region equivalent
    from scipy import signal as sps
    z, p, k = sps.butter(4, 5400 / (fs / 2), btype="high", output="zpk")
    sos = sps.zpk2sos(z, p, k)
    sos5 = np.concatenate([sos[:, :3], sos[:, 4:]], axis=1).astype(np.float32)
    deltas = None
    if subtone_hz > 0:
        # differential detection: above/below = ±(~4%) like the reference's
        # UiCalcSubaudibleDetFreq high/low offsets
        freqs = np.array([subtone_hz, subtone_hz * 0.95, subtone_hz * 1.05])
        deltas = np.stack([nco.freq_to_delta(float(f), fs) for f in freqs])
    return FmParams(fs=fs, sql_threshold=sql_threshold,
                    subtone_hz=subtone_hz, squelch_sos=sos5, deltas=deltas)


class FmState(NamedTuple):
    z_prev: jnp.ndarray        # (...,) complex64 previous IQ sample
    lpf: jnp.ndarray           # (...,) de-emphasis state
    hpf_a: jnp.ndarray         # (...,)
    hpf_b: jnp.ndarray         # (...,)
    sql_sos_state: jnp.ndarray # (n_sections, ..., 2)
    sql_avg: jnp.ndarray       # (...,)
    sql_count: jnp.ndarray     # (...,) float sub-block counter
    squelched: jnp.ndarray     # (...,) bool
    tone_acc: jnp.ndarray      # (..., 3) complex64 accumulators [ctr, low, high]
    tone_phase: jnp.ndarray    # (..., 3) uint32 NCO phases
    tone_nsamp: jnp.ndarray    # (...,) int32 samples accumulated
    subdet: jnp.ndarray        # (...,) smoothed ratio
    tdet: jnp.ndarray          # (...,) int32 debounce counter
    tone_detected: jnp.ndarray # (...,) bool


def init_state(batch_shape, params: FmParams) -> FmState:
    z = jnp.zeros(batch_shape, jnp.float32)
    zc = jnp.zeros(batch_shape, jnp.complex64)
    zi = jnp.zeros(batch_shape, jnp.int32)
    return FmState(
        z_prev=zc, lpf=z, hpf_a=z, hpf_b=z,
        sql_sos_state=jnp.zeros((params.squelch_sos.shape[0],) +
                                tuple(batch_shape) + (2,), jnp.float32),
        sql_avg=z, sql_count=z,
        squelched=jnp.zeros(batch_shape, bool),
        tone_acc=jnp.zeros(tuple(batch_shape) + (3,), jnp.complex64),
        tone_phase=jnp.zeros(tuple(batch_shape) + (3,), jnp.uint32),
        tone_nsamp=zi, subdet=z, tdet=zi,
        tone_detected=jnp.ones(batch_shape, bool),
    )


def _squelch_scan(params: FmParams, state: FmState, noise_samples: jnp.ndarray):
    """Hysteresis squelch at the 1500 Hz sub-block cadence.

    noise_samples: (..., n_sub) = sqrt(|hpf'd discriminator|) at sub-block
    starts.  Mirrors `audio_driver.c:1596-1661`.
    """
    thr = params.sql_threshold

    # float counter + boolean squelch carry; all blends arithmetic (scan
    # carries through constant-branch selects serialize on the axon TPU)
    def step(carry, ns):
        sql_avg, count, squelched = carry
        sql_avg = (1 - SQL_SMOOTHING) * sql_avg + SQL_SMOOTHING * ns
        count = count + 1.0
        do_eval = count > (SQL_PROC_DECIM - 0.5)
        ev = do_eval.astype(jnp.float32)
        count = count * (1.0 - ev)
        capped = jnp.minimum(sql_avg, 0.175)
        scaled = 22.0 - jnp.minimum(capped * 172.0, 24.0)
        if thr == 0:
            new_squelched = jnp.zeros_like(squelched)
        else:
            open_cond = scaled >= (thr + SQL_HYSTERESIS)
            if thr > SQL_HYSTERESIS:
                close_cond = scaled < (thr - SQL_HYSTERESIS)
            else:
                close_cond = scaled < thr
            new_squelched = jnp.where(squelched, ~open_cond, close_cond)
        squelched = (do_eval & new_squelched) | (~do_eval & squelched)
        sql_avg = ev * capped + (1.0 - ev) * sql_avg
        return (sql_avg, count, squelched), squelched

    ns_t = jnp.moveaxis(noise_samples, -1, 0)
    (sql_avg, count, squelched), sq_seq = jax.lax.scan(
        step, (state.sql_avg, state.sql_count, state.squelched), ns_t,
        unroll=4)
    return sql_avg, count, squelched, jnp.moveaxis(sq_seq, 0, -1)


def demod(params: FmParams, state: FmState, iq: jnp.ndarray):
    """iq (..., T) complex64 at 48 kHz -> (audio (..., T), new_state)."""
    T = iq.shape[-1]
    # discriminator: Pallas fused product+poly-atan2 kernel off-CPU (XLA
    # atan2 at 48 kHz measured 11.75 ms of a 23 ms demod at 8192x16k),
    # XLA arctan2 elsewhere
    use_disc_pk = (jax.default_backend() != "cpu" and iq.ndim == 2
                   and iq.shape[0] % 128 == 0 and T % 512 == 0)
    if use_disc_pk:
        from ..pallas import elemwise
        prev_col = jnp.stack([jnp.real(state.z_prev),
                              jnp.imag(state.z_prev)], axis=-1)
        C = iq.shape[0]
        tile_c = 256 if C % 256 == 0 else 128    # 256x1024 probed best
        tile_t = 1024 if T % 1024 == 0 else 512
        angle = elemwise.fm_disc_pallas(prev_col, jnp.real(iq),
                                        jnp.imag(iq), tile_c=tile_c,
                                        tile_t=tile_t)
    else:
        z_d = jnp.concatenate([state.z_prev[..., None], iq[..., :-1]],
                              axis=-1)
        prod = jnp.conj(z_d) * iq
        angle = jnp.arctan2(jnp.imag(prod), jnp.real(prod))

    # de-emphasis LPF a[n] = a[n-1] + alpha*(angle - a[n-1]) followed by
    # HPF b[n] = alpha*(b[n-1] + a[n] - a[n-1]): two one-poles — both ride
    # the blocked-matmul fast path (ops.iir._one_pole_blocked)
    al, ah = LPF_ALPHA, HPF_ALPHA
    deemph, lpf_last = iir.one_pole_block(1.0 - al, al,
                                          state.lpf, angle)
    a_d = jnp.concatenate([state.hpf_a[..., None], deemph[..., :-1]],
                          axis=-1)
    diff = deemph - a_d
    audio, hpf_last = iir.one_pole_block(ah, ah, state.hpf_b, diff)
    hpf_a_last = deemph[..., -1]

    # --- squelch noise estimate (blocked-matmul cascade off-CPU) ---
    sq, sos_state = iir.biquad_cascade_dispatch(
        params.squelch_sos, state.sql_sos_state, angle)
    n_sub = T // SUBBLOCK
    noise = jnp.sqrt(jnp.abs(sq[..., : n_sub * SUBBLOCK : SUBBLOCK]))
    sql_avg, count, squelched, sq_seq = _squelch_scan(params, state, noise)
    # expand squelch gate to sample rate (sub-block granularity)
    gate_sub = ~sq_seq
    gate = jnp.repeat(gate_sub, SUBBLOCK, axis=-1)
    if gate.shape[-1] < T:
        pad = jnp.broadcast_to(gate[..., -1:], gate.shape[:-1] +
                               (T - gate.shape[-1],))
        gate = jnp.concatenate([gate, pad], axis=-1)

    # --- subaudible tone detection ---
    tone_acc, tone_phase, tone_nsamp = state.tone_acc, state.tone_phase, state.tone_nsamp
    subdet, tdet, tone_detected = state.subdet, state.tdet, state.tone_detected
    if params.deltas is not None:
        ph = nco.phase_ramp(tone_phase, params.deltas, T)  # (..., 3, T)
        proj = jnp.sum(deemph[..., None, :] *
                       jnp.exp(jax.lax.complex(jnp.zeros_like(ph), -ph)), axis=-1)
        tone_acc = tone_acc + proj
        tone_phase = nco.advance(tone_phase, params.deltas, T)
        tone_nsamp = tone_nsamp + T
        window_done = tone_nsamp >= GOERTZEL_WINDOW_SAMPLES
        e = jnp.abs(tone_acc) ** 2                        # (..., 3)
        r = e[..., 0]
        s = e[..., 1] + e[..., 2]
        ratio = r / jnp.maximum(s / 2.0, 1e-12)
        subdet_new = (1 - TONE_DET_ALPHA) * subdet + TONE_DET_ALPHA * ratio
        subdet = jnp.where(window_done, subdet_new, subdet)
        tdet_new = jnp.where(subdet > TONE_THRESHOLD,
                             jnp.minimum(tdet + 1, TONE_DEBOUNCE_MAX),
                             jnp.maximum(tdet - 1, 0))
        tdet = jnp.where(window_done, tdet_new, tdet)
        tone_detected = jnp.where(window_done,
                                  tdet >= TONE_DEBOUNCE_THRESH, tone_detected)
        tone_acc = jnp.where(window_done[..., None],
                             jnp.zeros_like(tone_acc), tone_acc)
        tone_nsamp = jnp.where(window_done, 0, tone_nsamp)

    audio = jnp.where(gate & tone_detected[..., None], audio, 0.0)

    new_state = FmState(
        z_prev=iq[..., -1], lpf=lpf_last, hpf_a=hpf_a_last,
        hpf_b=hpf_last, sql_sos_state=sos_state, sql_avg=sql_avg,
        sql_count=count, squelched=squelched, tone_acc=tone_acc,
        tone_phase=tone_phase, tone_nsamp=tone_nsamp, subdet=subdet,
        tdet=tdet, tone_detected=tone_detected)
    return audio, new_state
