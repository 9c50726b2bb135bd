"""WDSP AGC (Warren Pratt) — look-ahead AGC with 5-state gain machine.

Reference: `AudioAgc_RunAgcWdsp` (`audio_agc.c:349-595`) and setup
(`audio_agc.c:126-347`).  Reference behavior per sample:

* a ring buffer delays audio by ``attack_buffsize`` samples
  (= ceil(fs * n_tau * tau_attack), e.g. 48 @ 12 kHz);
* ``ring_max`` = max |x| over the samples *ahead* of the delayed output
  (look-ahead peak), maintained incrementally;
* two one-pole "back averages" of the delayed |x| (fast + hang);
* a 5-state machine updates the detector voltage ``volts``
  (0 attack / 1 fast decay / 2 hang-active / 3 long decay / 4 hang decay);
* log-domain gain: ``mult = (out_target - slope_constant*min(0, log10(volts/max_input))) / volts``;
* optional DC blocker after the gain (AM modes).

TPU-first decomposition (no per-sample Python loop):
  - the delay line is a block-level concat with a carried tail;
  - the look-ahead max is an exact sliding-window max computed in
    O(log W) dilated-max steps, fully parallel;
  - the back-averages are linear one-poles -> `ops.iir.one_pole_block`
    (associative scan);
  - only the state machine runs as a `lax.scan`, with 5 scalars of state
    per channel and all of its inputs precomputed per-sample.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import iir

ADC_CLIP_WARN_THRESHOLD = 4096.0   # reference max_input/out_targ


class AgcParams(NamedTuple):
    attack_buffsize: int
    attack_mult: jnp.ndarray
    decay_mult: jnp.ndarray
    fast_decay_mult: jnp.ndarray
    hang_decay_mult: jnp.ndarray
    fast_backmult: jnp.ndarray
    hang_backmult: jnp.ndarray
    out_target: jnp.ndarray
    min_volts: jnp.ndarray
    slope_constant: jnp.ndarray
    inv_max_input: jnp.ndarray
    hang_level: jnp.ndarray
    hang_time_samples: jnp.ndarray   # int32
    hang_enable: bool
    pop_ratio: jnp.ndarray
    fixed_gain: jnp.ndarray
    remove_dc: bool
    agc_off: bool


# mode presets: hangtime seconds (reference `audio_agc.c:240-280`) and
# tau_decay ms (config table defaults)
MODE_PRESETS = {
    "very_long": dict(hangtime=3.000, tau_decay=4.000, tau_fast_decay=0.05),
    "long": dict(hangtime=2.000, tau_decay=2.000, tau_fast_decay=0.005),
    "slow": dict(hangtime=1.000, tau_decay=0.500, tau_fast_decay=0.005),
    "med": dict(hangtime=0.250, tau_decay=0.250, tau_fast_decay=0.005),
    "fast": dict(hangtime=0.100, tau_decay=0.050, tau_fast_decay=0.005),
    "off": dict(hangtime=0.250, tau_decay=0.250, tau_fast_decay=0.005),
}


def make_params(fs: float, mode: str = "med", thresh_db: float = 60.0,
                slope_db: float = 6.0, hang_thresh_db: float = -30.0,
                tau_hang_decay: float = 0.100, hang_enable: bool = False,
                remove_dc: bool = False) -> AgcParams:
    p = MODE_PRESETS[mode]
    tau_attack = 0.001
    n_tau = 4
    max_input = ADC_CLIP_WARN_THRESHOLD
    out_targ = ADC_CLIP_WARN_THRESHOLD
    tau_fast_backaverage = 0.250
    tau_hang_backmult = 0.500
    pop_ratio = 5.0
    var_gain = 10.0 ** (slope_db / 20.0 / 10.0)
    max_gain = 10.0 ** (thresh_db / 20.0)
    fixed_gain = max_gain / 10.0

    attack_buffsize = int(np.ceil(fs * n_tau * tau_attack))
    attack_mult = 1.0 - np.exp(-1.0 / (fs * tau_attack))
    decay_mult = 1.0 - np.exp(-1.0 / (fs * p["tau_decay"]))
    fast_decay_mult = 1.0 - np.exp(-1.0 / (fs * p["tau_fast_decay"]))
    fast_backmult = 1.0 - np.exp(-1.0 / (fs * tau_fast_backaverage))
    hang_backmult = 1.0 - np.exp(-1.0 / (fs * tau_hang_backmult))
    hang_decay_mult = 1.0 - np.exp(-1.0 / (fs * tau_hang_decay))

    out_target = out_targ * (1.0 - np.exp(-float(n_tau))) * 0.9999
    min_volts = out_target / (var_gain * max_gain)
    tmpA = np.log10(out_target / (max_input * var_gain * max_gain))
    if tmpA == 0.0:
        tmpA = 1e-16
    slope_constant = (out_target * (1.0 - 1.0 / var_gain)) / tmpA

    if max_input > min_volts:
        convert = 10.0 ** (hang_thresh_db / 20.0)
        tmpB = max((convert - min_volts) / (max_input - min_volts), 1e-8)
        hang_thresh = 1.0 + 0.125 * np.log10(tmpB)
    else:
        hang_thresh = 1.0
    tmpC = 10.0 ** ((hang_thresh - 1.0) / 0.125)
    hang_level = (max_input * tmpC + (out_target / (var_gain * max_gain))
                  * (1.0 - tmpC)) * 0.637

    return AgcParams(
        attack_buffsize=attack_buffsize,
        attack_mult=np.float32(attack_mult),
        decay_mult=np.float32(decay_mult),
        fast_decay_mult=np.float32(fast_decay_mult),
        hang_decay_mult=np.float32(hang_decay_mult),
        fast_backmult=np.float32(fast_backmult),
        hang_backmult=np.float32(hang_backmult),
        out_target=np.float32(out_target),
        min_volts=np.float32(min_volts),
        slope_constant=np.float32(slope_constant),
        inv_max_input=np.float32(1.0 / max_input),
        hang_level=np.float32(hang_level),
        hang_time_samples=np.int32(int(p["hangtime"] * fs)),
        hang_enable=hang_enable,
        pop_ratio=np.float32(pop_ratio),
        fixed_gain=np.float32(fixed_gain),
        remove_dc=remove_dc,
        agc_off=(mode == "off"),
    )


class AgcState(NamedTuple):
    delay: jnp.ndarray            # (..., attack_buffsize) delayed input
    volts: jnp.ndarray            # (...,)
    save_volts: jnp.ndarray
    fast_backaverage: jnp.ndarray
    hang_backaverage: jnp.ndarray
    hang_counter: jnp.ndarray     # int32
    decay_type: jnp.ndarray       # int32
    state: jnp.ndarray            # int32 0..4
    dc: jnp.ndarray               # (..., 2) DC blocker state


def init_state(batch_shape, params: AgcParams) -> AgcState:
    z = jnp.zeros(batch_shape, jnp.float32)
    zi = jnp.zeros(batch_shape, jnp.int32)
    return AgcState(
        delay=jnp.zeros(tuple(batch_shape) + (params.attack_buffsize,),
                        jnp.float32),
        volts=z, save_volts=z, fast_backaverage=z, hang_backaverage=z,
        hang_counter=zi, decay_type=zi, state=zi,
        dc=jnp.zeros(tuple(batch_shape) + (2,), jnp.float32))


def _sliding_max_ahead(absx: jnp.ndarray, w: int) -> jnp.ndarray:
    """m[n] = max(absx[n+1 .. n+w]) over the last axis, where positions past
    the end are ignored (shrinking window at the right edge).

    Matches the reference's ring_max: the max over the `attack_buffsize`
    samples ahead of the delayed output, *including* the newest input
    (`audio_agc.c:409-431`).  Computed with dilated pairwise maxima in
    O(log w) steps.
    """
    # pad right with -inf, shift left by 1, then window max of width w
    neg = jnp.full(absx.shape[:-1] + (w,), -jnp.inf, absx.dtype)
    x = jnp.concatenate([absx[..., 1:], neg], axis=-1)  # x[n] = absx[n+1]
    # forward sliding max of width w starting at n
    m = x
    shift = 1
    total = 1
    while total < w:
        step = min(shift, w - total)
        pad = jnp.full(m.shape[:-1] + (step,), -jnp.inf, m.dtype)
        shifted = jnp.concatenate([m[..., step:], pad], axis=-1)
        m = jnp.maximum(m, shifted)
        total += step
        shift *= 2
    return m[..., : absx.shape[-1]]


def run(params: AgcParams, state: AgcState, x: jnp.ndarray):
    """x: (..., T) audio at decimated rate. Returns (y, new_state)."""
    if params.agc_off:
        y = x * params.fixed_gain
        return y, state

    T = x.shape[-1]
    w = params.attack_buffsize
    # full timeline including delay-line history
    xfull = jnp.concatenate([state.delay, x], axis=-1)   # (..., w+T)
    out_delayed = xfull[..., :T]                          # sample leaving ring
    abs_full = jnp.abs(xfull)
    abs_out = abs_full[..., :T]

    # ring_max[n]: max over the w samples ahead of position n in xfull
    ring_max = _sliding_max_ahead(abs_full, w)[..., :T]

    # back averages of the *delayed* |x| — linear one-poles
    fba, fba_last = iir.one_pole_block(1.0 - params.fast_backmult,
                                       params.fast_backmult,
                                       state.fast_backaverage, abs_out)
    hba, hba_last = iir.one_pole_block(1.0 - params.hang_backmult,
                                       params.hang_backmult,
                                       state.hang_backaverage, abs_out)

    # --- the 5-state gain machine (sequential, tiny state) ---
    def step(carry, inp):
        volts, save_volts, hang_counter, decay_type, st = carry
        rm, fb, hb = inp
        hang_counter = jnp.maximum(hang_counter - 1, 0)

        attack_v = volts + (rm - volts) * params.attack_mult
        fast_v = volts + (rm - volts) * params.fast_decay_mult
        long_v = volts + (rm - volts) * params.decay_mult
        hangd_v = volts + (rm - volts) * params.hang_decay_mult
        attacking = rm >= volts

        hang_trigger = params.hang_enable & (hb > params.hang_level)

        # state 0
        s0_fast = volts > params.pop_ratio * fb
        s0_state = jnp.where(attacking, 0,
                    jnp.where(s0_fast, 1,
                     jnp.where(hang_trigger, 2, 3)))
        s0_volts = jnp.where(attacking, attack_v,
                    jnp.where(s0_fast, fast_v,
                     jnp.where(hang_trigger, volts, long_v)))
        s0_hang = jnp.where(~attacking & ~s0_fast & hang_trigger,
                            params.hang_time_samples, hang_counter)
        s0_decay = jnp.where(~attacking & ~s0_fast,
                             jnp.where(hang_trigger, 1, 0), decay_type)
        s0_save = save_volts

        # state 1
        s1_fastcont = volts > save_volts
        s1_hangwait = hang_counter > 0
        s1_state = jnp.where(attacking, 0,
                    jnp.where(s1_fastcont, 1,
                     jnp.where(s1_hangwait, 2,
                      jnp.where(decay_type == 0, 3, 4))))
        s1_volts = jnp.where(attacking, attack_v,
                    jnp.where(s1_fastcont, fast_v,
                     jnp.where(s1_hangwait, volts,
                      jnp.where(decay_type == 0, long_v, hangd_v))))

        # states 2..4 share: attack -> state 0 + save_volts
        s2_state = jnp.where(attacking, 0,
                    jnp.where(hang_counter == 0, 4, 2))
        s2_volts = jnp.where(attacking, attack_v,
                    jnp.where(hang_counter == 0, hangd_v, volts))
        s3_state = jnp.where(attacking, 0, 3)
        s3_volts = jnp.where(attacking, attack_v, long_v)
        s4_state = jnp.where(attacking, 0, 4)
        s4_volts = jnp.where(attacking, attack_v, hangd_v)

        new_volts = jnp.select(
            [st == 0, st == 1, st == 2, st == 3],
            [s0_volts, s1_volts, s2_volts, s3_volts], s4_volts)
        new_state = jnp.select(
            [st == 0, st == 1, st == 2, st == 3],
            [s0_state, s1_state, s2_state, s3_state], s4_state)
        # save_volts updated when attacking from states 2,3,4
        new_save = jnp.where((st >= 2) & attacking, volts,
                             jnp.where(st == 0, s0_save, save_volts))
        new_hang = jnp.where(st == 0, s0_hang, hang_counter)
        new_decay = jnp.where(st == 0, s0_decay, decay_type)

        new_volts = jnp.maximum(new_volts, params.min_volts)
        return (new_volts, new_save, new_hang, new_decay, new_state), new_volts

    seq = (jnp.moveaxis(ring_max, -1, 0),
           jnp.moveaxis(fba, -1, 0),
           jnp.moveaxis(hba, -1, 0))
    carry0 = (state.volts, state.save_volts, state.hang_counter,
              state.decay_type, state.state)
    (volts_f, save_f, hang_f, decay_f, st_f), volts_seq = jax.lax.scan(
        step, carry0, seq, unroll=8)
    volts_t = jnp.moveaxis(volts_seq, 0, -1)

    vo = jnp.minimum(jnp.log10(params.inv_max_input * volts_t), 0.0)
    mult = (params.out_target - params.slope_constant * vo) / volts_t
    y = out_delayed * mult

    dc_state = state.dc
    if params.remove_dc:
        y, dc_state = iir.dc_blocker_block(0.9999, dc_state, y)

    new_state = AgcState(
        delay=xfull[..., -w:], volts=volts_f, save_volts=save_f,
        fast_backaverage=fba_last, hang_backaverage=hba_last,
        hang_counter=hang_f, decay_type=decay_f, state=st_f, dc=dc_state)
    return y, new_state
