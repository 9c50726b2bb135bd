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
    """thresh_db / slope_db / hang_thresh_db may be (C,)-shaped numpy
    arrays for PER-CHANNEL AGC settings (the reference's per-channel
    menu state, one batched chain instead of one chain per setting) —
    the derived fields then broadcast against the channel axis; the
    Pallas kernels carry (C,)-shaped params as VMEM rows
    (`_chan_rows`), so per-channel settings stay on the kernel path."""
    thresh_db = np.asarray(thresh_db, np.float64)
    slope_db = np.asarray(slope_db, np.float64)
    hang_thresh_db = np.asarray(hang_thresh_db, np.float64)
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
    tmpA = np.where(tmpA == 0.0, 1e-16, tmpA)
    slope_constant = (out_target * (1.0 - 1.0 / var_gain)) / tmpA

    convert = 10.0 ** (hang_thresh_db / 20.0)
    tmpB = np.maximum((convert - min_volts) / (max_input - min_volts),
                      1e-8)
    hang_thresh = np.where(max_input > min_volts,
                           1.0 + 0.125 * np.log10(tmpB), 1.0)
    tmpC = 10.0 ** ((hang_thresh - 1.0) / 0.125)
    hang_level = (max_input * tmpC + (out_target / (var_gain * max_gain))
                  * (1.0 - tmpC)) * 0.637

    def f32c(v):
        return (np.asarray(v, np.float32) if np.ndim(v) > 0
                else np.float32(v))

    return AgcParams(
        attack_buffsize=attack_buffsize,
        attack_mult=np.float32(attack_mult),
        decay_mult=np.float32(decay_mult),
        fast_decay_mult=np.float32(fast_decay_mult),
        hang_decay_mult=np.float32(hang_decay_mult),
        fast_backmult=np.float32(fast_backmult),
        hang_backmult=np.float32(hang_backmult),
        out_target=np.float32(out_target),
        min_volts=f32c(min_volts),
        slope_constant=f32c(slope_constant),
        inv_max_input=np.float32(1.0 / max_input),
        hang_level=f32c(hang_level),
        hang_time_samples=np.int32(int(p["hangtime"] * fs)),
        hang_enable=hang_enable,
        pop_ratio=np.float32(pop_ratio),
        fixed_gain=f32c(fixed_gain),
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
    # all-float state: integer-valued quantities (hang counter, decay type,
    # state id) are carried as exact small floats — see the PERF NOTE in
    # run() about scan carries on the axon TPU backend
    z = jnp.zeros(batch_shape, jnp.float32)
    return AgcState(
        delay=jnp.zeros(tuple(batch_shape) + (params.attack_buffsize,),
                        jnp.float32),
        volts=z, save_volts=z, fast_backaverage=z, hang_backaverage=z,
        hang_counter=z, decay_type=z, state=z,
        dc=jnp.zeros(tuple(batch_shape) + (2,), jnp.float32))


def _pallas_params(params: AgcParams, hang_time: float,
                   fused: bool, scalar: bool = True) -> dict:
    """AgcParams -> the Pallas kernels' scalar-parameter dict (one place
    so the two kernel call sites can't desynchronize).  When scalar is
    False, the per-channel gain-law fields (min_volts / slope_constant /
    hang_level) travel as VMEM rows instead (`_chan_rows`) and their
    dict slots hold unused placeholders."""
    def fl(v):
        return 0.0 if (not scalar and np.ndim(v) > 0) else float(v)
    pp = dict(attack_mult=float(params.attack_mult),
              fast_decay_mult=float(params.fast_decay_mult),
              decay_mult=float(params.decay_mult),
              hang_decay_mult=float(params.hang_decay_mult),
              fast_backmult=float(params.fast_backmult),
              hang_backmult=float(params.hang_backmult),
              pop_ratio=float(params.pop_ratio),
              hang_level=fl(params.hang_level),
              hang_time=float(hang_time),
              hang_enable=bool(params.hang_enable),
              min_volts=fl(params.min_volts))
    if fused:
        pp.update(out_target=float(params.out_target),
                  slope_constant=fl(params.slope_constant),
                  inv_max_input=float(params.inv_max_input))
    return pp


def _machine_carry(state: AgcState) -> jnp.ndarray:
    return jnp.stack([state.volts, state.save_volts, state.hang_counter,
                      state.decay_type, state.state,
                      state.fast_backaverage, state.hang_backaverage],
                     axis=0)


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


def _scalar_params(params: AgcParams) -> bool:
    """True when every derived gain-law field is a scalar.  Per-channel
    (C,) arrays stay ON the kernel path — they are passed to the kernels
    as VMEM-resident parameter rows (`chan`); this predicate only selects
    which calling convention to use."""
    return all(np.ndim(v) == 0 for v in
               (params.min_volts, params.slope_constant,
                params.hang_level, params.fixed_gain))


def _chan_rows(params: AgcParams, C: int, fused: bool):
    """(3, C) [min_volts, slope_constant, hang_level] (fused kernel) or
    (2, C) [min_volts, hang_level] (machine kernel) per-channel blocks."""
    fields = ((params.min_volts, params.slope_constant, params.hang_level)
              if fused else (params.min_volts, params.hang_level))
    return jnp.stack([jnp.broadcast_to(
        jnp.asarray(v, jnp.float32), (C,)) for v in fields])


def _chan(v):
    """Broadcast a per-channel (C,) param against a (..., T) signal."""
    return v[..., None] if np.ndim(v) > 0 else v


# Which implementation the most recent `run()` trace dispatched to — one
# of "off", "pallas_fused", "pallas_fused_padded", "pallas_scan",
# "xla_scan".  The fused kernel needs channels % 1024 == 0 (8 sublanes x
# 128 lanes per tile); channel counts off the gate are PADDED up to it
# (pallas_fused_padded) rather than falling back to the masked-arithmetic
# XLA scan, which measured ~30x slower at 1536 ch (the r4 "fallback
# cliff", BENCH_AGC_PAD row in PERF.md).  Remaining fallback conditions:
# CPU backend, non-2D batch, T % 256 != 0, or look-ahead w > 256.  Tests
# and fleet telemetry read this to confirm which path actually ran for a
# given batch shape.  Set at trace time (the dispatch is static), so it
# is valid under jit.
last_path = None


def _record(path):
    global last_path
    last_path = path


def init_state_stereo(batch_shape, params: AgcParams) -> AgcState:
    """Linked two-channel AGC state (the reference's use_stereo path,
    audio_agc.c:349-595): the DELAY line carries both channels
    (..., 2, w) and the DC blocker is per-channel (..., 2, 2), but the
    detector/machine state is SHARED (one gain for both channels)."""
    z = jnp.zeros(batch_shape, jnp.float32)
    return AgcState(
        delay=jnp.zeros(tuple(batch_shape) + (2, params.attack_buffsize),
                        jnp.float32),
        volts=z, save_volts=z, fast_backaverage=z, hang_backaverage=z,
        hang_counter=z, decay_type=z, state=z,
        dc=jnp.zeros(tuple(batch_shape) + (2, 2), jnp.float32))


def run_stereo(params: AgcParams, state: AgcState, x: jnp.ndarray):
    """Linked stereo AGC: x (..., 2, T) -> (y (..., 2, T), state).

    The reference's use_stereo semantics (AudioAgc_RunAgcWdsp,
    audio_agc.c:383-394, 571-576): the look-ahead detector is fed by
    max(|L|, |R|), one 5-state machine runs, and the SAME log-domain
    gain multiplies both delayed channels.  State from
    `init_state_stereo`."""
    if params.agc_off:
        _record("off")
        return x * _chan(params.fixed_gain), state

    T = x.shape[-1]
    w = params.attack_buffsize
    xfull = jnp.concatenate([state.delay, x], axis=-1)  # (..., 2, w+T)
    out_delayed = xfull[..., :T]
    abs_full = jnp.max(jnp.abs(xfull), axis=-2)         # linked detector
    abs_out = abs_full[..., :T]
    ring_max = _sliding_max_ahead(abs_full, w)[..., :T]
    volts_t, mach = _run_machine(params, state, ring_max, abs_out)
    vo = jnp.minimum(jnp.log10(params.inv_max_input * volts_t), 0.0)
    mult = (params.out_target - _chan(params.slope_constant) * vo) / volts_t
    y = out_delayed * mult[..., None, :]
    dc_state = state.dc
    if params.remove_dc:
        y, dc_state = iir.dc_blocker_block(0.9999, dc_state, y)
    volts_f, save_f, hang_f, decay_f, st_f, fba_last, hba_last = mach
    new_state = AgcState(
        delay=xfull[..., -w:], volts=volts_f, save_volts=save_f,
        fast_backaverage=fba_last, hang_backaverage=hba_last,
        hang_counter=hang_f, decay_type=decay_f, state=st_f, dc=dc_state)
    return y, new_state


def _run_machine(params: AgcParams, state: AgcState,
                 ring_max: jnp.ndarray, abs_out: jnp.ndarray):
    """The sequential detector machine on precomputed (ring_max,
    abs_out): Pallas kernel when the shape tiles, XLA scan otherwise.
    Returns (volts_t, (volts, save, hang, decay, st, fba, hba))."""
    T_steps = ring_max.shape[-1]
    use_pallas = (jax.default_backend() != "cpu" and ring_max.ndim == 2
                  and ring_max.shape[0] % 1024 == 0
                  and T_steps % 256 == 0)
    if use_pallas:
        _record("pallas_scan")
        from ..pallas import agc as pallas_agc
        scalar = _scalar_params(params)
        pp = _pallas_params(params, np.float32(params.hang_time_samples),
                            fused=False, scalar=scalar)
        carry = _machine_carry(state)
        volts_t, carry_out = pallas_agc.agc_scan_pallas(
            pp, carry, ring_max, abs_out,
            chan=None if scalar else _chan_rows(params, ring_max.shape[0],
                                                False))
        return volts_t, tuple(carry_out[i] for i in range(7))
    _record("xla_scan")
    step = _make_xla_step(params)
    fba, fba_last = iir.one_pole_block(1.0 - params.fast_backmult,
                                       params.fast_backmult,
                                       state.fast_backaverage, abs_out)
    hba, hba_last = iir.one_pole_block(1.0 - params.hang_backmult,
                                       params.hang_backmult,
                                       state.hang_backaverage, abs_out)
    seq = (jnp.moveaxis(ring_max, -1, 0),
           jnp.moveaxis(fba, -1, 0),
           jnp.moveaxis(hba, -1, 0))
    carry0 = (state.volts, state.save_volts, state.hang_counter,
              state.decay_type, state.state)
    (volts_f, save_f, hang_f, decay_f, st_f), volts_seq = jax.lax.scan(
        step, carry0, seq)
    volts_t = jnp.moveaxis(volts_seq, 0, -1)
    return volts_t, (volts_f, save_f, hang_f, decay_f, st_f,
                     fba_last, hba_last)


def _make_xla_step(params: AgcParams):
    """The masked-arithmetic scan body (shared by run/run_stereo)."""
    f32 = jnp.float32
    hang_en = np.float32(1.0 if params.hang_enable else 0.0)
    hang_time = np.float32(params.hang_time_samples)

    def step(carry, inp):
        volts, save_volts, hang_counter, decay_type, st = carry
        rm, fb, hb = inp
        hang_counter = jnp.maximum(hang_counter - 1.0, 0.0)

        attack_v = volts + (rm - volts) * params.attack_mult
        fast_v = volts + (rm - volts) * params.fast_decay_mult
        long_v = volts + (rm - volts) * params.decay_mult
        hangd_v = volts + (rm - volts) * params.hang_decay_mult

        att = (rm >= volts).astype(f32)
        natt = 1.0 - att
        is0 = (st < 0.5).astype(f32)
        is1 = ((st > 0.5) & (st < 1.5)).astype(f32)
        is2 = ((st > 1.5) & (st < 2.5)).astype(f32)
        is3 = ((st > 2.5) & (st < 3.5)).astype(f32)
        is4 = (st > 3.5).astype(f32)

        ht = hang_en * (hb > params.hang_level).astype(f32)
        s0_fast = (volts > params.pop_ratio * fb).astype(f32)
        s1_fastc = (volts > save_volts).astype(f32)
        hc_wait = (hang_counter > 0.5).astype(f32)
        hc_zero = 1.0 - hc_wait
        dt1 = decay_type
        dt0 = 1.0 - dt1

        m0a = is0 * att
        m0f = is0 * natt * s0_fast
        m0h = is0 * natt * (1 - s0_fast) * ht
        m0l = is0 * natt * (1 - s0_fast) * (1 - ht)
        m1a = is1 * att
        m1f = is1 * natt * s1_fastc
        m1w = is1 * natt * (1 - s1_fastc) * hc_wait
        m1l = is1 * natt * (1 - s1_fastc) * hc_zero * dt0
        m1h = is1 * natt * (1 - s1_fastc) * hc_zero * dt1
        m2a = is2 * att
        m2d = is2 * natt * hc_zero
        m2s = is2 * natt * hc_wait
        m3a = is3 * att
        m3d = is3 * natt
        m4a = is4 * att
        m4d = is4 * natt

        new_volts = ((m0a + m1a + m2a + m3a + m4a) * attack_v
                     + (m0f + m1f) * fast_v
                     + (m0l + m1l + m3d) * long_v
                     + (m1h + m2d + m4d) * hangd_v
                     + (m0h + m1w + m2s) * volts)
        new_state = ((m0f + m1f) * 1.0 + (m0h + m1w + m2s) * 2.0
                     + (m0l + m1l + m3d) * 3.0 + (m1h + m2d + m4d) * 4.0)
        save_upd = m2a + m3a + m4a
        new_save = save_upd * volts + (1.0 - save_upd) * save_volts
        new_hang = m0h * hang_time + (1.0 - m0h) * hang_counter
        new_decay = m0h * 1.0 + (1.0 - (m0h + m0l)) * decay_type

        new_volts = jnp.maximum(new_volts, params.min_volts)
        return (new_volts, new_save, new_hang, new_decay,
                new_state), new_volts

    return step


def run(params: AgcParams, state: AgcState, x: jnp.ndarray,
        _force_kernel: bool = False):
    """x: (..., T) audio at decimated rate. Returns (y, new_state).

    _force_kernel: test hook — takes the fused Pallas path (interpret
    mode on CPU) even off-TPU, so the channel-padding dispatch is
    exactness-testable hermetically."""
    if params.agc_off:
        _record("off")
        y = x * _chan(params.fixed_gain)
        return y, state

    T = x.shape[-1]
    w = params.attack_buffsize

    # --- fully-fused Pallas path (v3): delay line, |x|, look-ahead
    # sliding max, 5-state machine AND gain application in ONE kernel —
    # the v2 path's pack transposes, XLA max passes and mult/log10 HBM
    # passes all disappear (see pallas/agc.py `_make_fused_kernel`).
    if ((_force_kernel or jax.default_backend() != "cpu") and x.ndim == 2
            and T % 256 == 0 and 256 >= w):
        C0 = x.shape[0]
        pad = (-C0) % 1024
        _record("pallas_fused" if pad == 0 else "pallas_fused_padded")
        from ..pallas import agc as pallas_agc
        scalar = _scalar_params(params)
        pp = _pallas_params(params, params.hang_time_samples, fused=True,
                            scalar=scalar)
        carry = _machine_carry(state)
        delay = state.delay
        if pad:
            # pad channels up to the kernel's 1024 gate (zeros run
            # the machine harmlessly: volts clamps at min_volts) —
            # measured numbers in BENCH_AGC_PAD_r05.json
            x = jnp.pad(x, ((0, pad), (0, 0)))
            delay = jnp.pad(delay, ((0, pad), (0, 0)))
            carry = jnp.pad(carry, ((0, 0), (0, pad)))
        chan = None
        if not scalar:
            chan = _chan_rows(params, C0, True)
            if pad:
                chan = jnp.pad(chan, ((0, 0), (0, pad)),
                               constant_values=1.0)
        # unroll=8: one dynamic VMEM load/store per 8 machine steps
        # (measured 6.43 -> 5.33 ms at 8192ch x 2048 on v5e; the rolled
        # loop is dominated by per-step dynamic indexing, not the VPU
        # ops).  pair: dual independent (8,128) machine chains per
        # program halve the sequential step count (r5: 3.53 vs 3.73 ms
        # standalone; needs t_tile=128 for VMEM).
        use_pair = (x.shape[0] % 2048 == 0 and T % 128 == 0
                    and w <= 128)
        y, carry_out, new_delay = pallas_agc.agc_pallas_fused(
            pp, carry, delay, x, chan=chan, unroll=8, pair=use_pair,
            t_tile=128 if use_pair else 256)
        if pad:
            y = y[:C0]
            carry_out = carry_out[:, :C0]
            new_delay = new_delay[:C0]
        dc_state = state.dc
        if params.remove_dc:
            y, dc_state = iir.dc_blocker_block(0.9999, dc_state, y)
        new_state = AgcState(
            delay=new_delay, volts=carry_out[0], save_volts=carry_out[1],
            fast_backaverage=carry_out[5], hang_backaverage=carry_out[6],
            hang_counter=carry_out[2], decay_type=carry_out[3],
            state=carry_out[4], dc=dc_state)
        return y, new_state

    # full timeline including delay-line history
    xfull = jnp.concatenate([state.delay, x], axis=-1)   # (..., w+T)
    out_delayed = xfull[..., :T]                          # sample leaving ring
    abs_full = jnp.abs(xfull)
    abs_out = abs_full[..., :T]

    # ring_max[n]: max over the w samples ahead of position n in xfull
    ring_max = _sliding_max_ahead(abs_full, w)[..., :T]
    volts_t, (volts_f, save_f, hang_f, decay_f, st_f, fba_last,
              hba_last) = _run_machine(params, state, ring_max, abs_out)
    vo = jnp.minimum(jnp.log10(params.inv_max_input * volts_t), 0.0)
    mult = (params.out_target - _chan(params.slope_constant) * vo) / volts_t
    y = out_delayed * mult

    dc_state = state.dc
    if params.remove_dc:
        y, dc_state = iir.dc_blocker_block(0.9999, dc_state, y)

    new_state = AgcState(
        delay=xfull[..., -w:], volts=volts_f, save_volts=save_f,
        fast_backaverage=fba_last, hang_backaverage=hba_last,
        hang_counter=hang_f, decay_type=decay_f, state=st_f, dc=dc_state)
    return y, new_state
