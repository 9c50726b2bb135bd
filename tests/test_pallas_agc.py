"""Pallas AGC state-machine kernel vs the XLA lax.scan implementation
(`pallas/agc.py` vs the scan body in `ops/agc.py`).  The kernel folds
the two one-pole back-averages into its sequential loop; the reference
here computes them with `ops.iir.one_pole_block` exactly as the XLA
fallback path does."""
import jax
import jax.numpy as jnp
import numpy as np

from uhsdr_tpu.ops import agc, iir
from uhsdr_tpu.pallas import agc as pallas_agc


def _scan_reference(params, carry7, rm, absx):
    """ops.agc's fallback path on the same inputs/state."""
    f32 = jnp.float32
    hang_en = np.float32(1.0 if params.hang_enable else 0.0)
    hang_time = np.float32(params.hang_time_samples)
    fba, fba_last = iir.one_pole_block(1.0 - params.fast_backmult,
                                       params.fast_backmult,
                                       carry7[5], absx)
    hba, hba_last = iir.one_pole_block(1.0 - params.hang_backmult,
                                       params.hang_backmult,
                                       carry7[6], absx)

    def step(carry, inp):
        volts, save_volts, hang_counter, decay_type, st = carry
        rm_, fb_, hb_ = inp
        hang_counter = jnp.maximum(hang_counter - 1.0, 0.0)
        attack_v = volts + (rm_ - volts) * params.attack_mult
        fast_v = volts + (rm_ - volts) * params.fast_decay_mult
        long_v = volts + (rm_ - volts) * params.decay_mult
        hangd_v = volts + (rm_ - volts) * params.hang_decay_mult
        att = (rm_ >= volts).astype(f32)
        natt = 1.0 - att
        is0 = (st < 0.5).astype(f32)
        is1 = ((st > 0.5) & (st < 1.5)).astype(f32)
        is2 = ((st > 1.5) & (st < 2.5)).astype(f32)
        is3 = ((st > 2.5) & (st < 3.5)).astype(f32)
        is4 = (st > 3.5).astype(f32)
        ht = hang_en * (hb_ > params.hang_level).astype(f32)
        s0_fast = (volts > params.pop_ratio * fb_).astype(f32)
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

    seq = tuple(jnp.moveaxis(a, -1, 0) for a in (rm, fba, hba))
    carry0 = tuple(carry7[i] for i in range(5))
    final, volts_seq = jax.lax.scan(step, carry0, seq)
    full = final + (fba_last, hba_last)
    return jnp.moveaxis(volts_seq, 0, -1), jnp.stack(full, axis=0)


def _params_dict(params):
    return dict(attack_mult=float(params.attack_mult),
                fast_decay_mult=float(params.fast_decay_mult),
                decay_mult=float(params.decay_mult),
                hang_decay_mult=float(params.hang_decay_mult),
                fast_backmult=float(params.fast_backmult),
                hang_backmult=float(params.hang_backmult),
                pop_ratio=float(params.pop_ratio),
                hang_level=float(params.hang_level),
                hang_time=float(params.hang_time_samples),
                hang_enable=bool(params.hang_enable),
                min_volts=float(params.min_volts))


def test_agc_kernel_matches_scan():
    C, T = 1024, 1024
    rng = np.random.default_rng(11)
    params = agc.make_params(12000.0, mode="med", hang_enable=True)
    # bursty envelope to exercise attack/hang/decay transitions
    env = np.abs(rng.standard_normal((C, T)).astype(np.float32)) * 500.0
    env[:, 200:400] *= 20.0
    env[:, 700:] *= 0.01
    rm = jnp.asarray(env)
    ax = jnp.asarray(env * 0.8)
    carry = jnp.asarray(rng.uniform(0.1, 2.0, (7, C)).astype(np.float32))
    carry = carry.at[4].set(jnp.floor(carry[4] * 2.0))  # state in {0,1,2}
    carry = carry.at[3].set((carry[3] > 1.0).astype(jnp.float32))

    volts_k, carry_k = pallas_agc.agc_scan_pallas(
        _params_dict(params), carry, rm, ax, t_tile=256)
    volts_s, carry_s = _scan_reference(params, carry, rm, ax)
    np.testing.assert_allclose(np.asarray(volts_k), np.asarray(volts_s),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(carry_k), np.asarray(carry_s),
                               rtol=1e-4, atol=1e-5)


def test_agc_fused_kernel_matches_run():
    """The v3 fully-fused kernel (delay/|x|/sliding-max/machine/gain) vs
    ops.agc.run's XLA fallback path, streamed over two blocks to exercise
    the delay-line and look-ahead halo continuity."""
    C, T = 1024, 512
    rng = np.random.default_rng(7)
    params = agc.make_params(12000.0, mode="med", hang_enable=True)
    pp = _params_dict(params)
    pp.update(out_target=float(params.out_target),
              slope_constant=float(params.slope_constant),
              inv_max_input=float(params.inv_max_input))
    x = rng.standard_normal((C, 2 * T)).astype(np.float32) * 800.0
    x[:, 300:500] *= 25.0
    x[:, 800:] *= 0.02

    state = agc.init_state((C,), params)
    ys_ref = []
    st = state
    for blk in (x[:, :T], x[:, T:]):
        y, st = agc.run(params, st, jnp.asarray(blk))
        ys_ref.append(np.asarray(y))
    y_ref = np.concatenate(ys_ref, axis=-1)

    carry = jnp.zeros((7, C), jnp.float32)
    delay = jnp.zeros((C, params.attack_buffsize), jnp.float32)
    ys = []
    for blk in (x[:, :T], x[:, T:]):
        y, carry, delay = pallas_agc.agc_pallas_fused(
            pp, carry, delay, jnp.asarray(blk), t_tile=256)
        ys.append(np.asarray(y))
    y_fused = np.concatenate(ys, axis=-1)
    np.testing.assert_allclose(y_fused, y_ref, rtol=1e-4, atol=1e-3)


def test_agc_run_dispatch_consistency():
    # ops.agc.run on CPU (scan path) stays the ground truth the chain
    # tests already verify against golden; here just confirm run()
    # still produces identical output with the same inputs/state
    C, T = 8, 256
    rng = np.random.default_rng(5)
    params = agc.make_params(12000.0, mode="fast")
    state = agc.init_state((C,), params)
    x = jnp.asarray(rng.standard_normal((C, T)).astype(np.float32) * 1000.0)
    y1, s1 = agc.run(params, state, x)
    y2, s2 = agc.run(params, state, x)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))


def test_agc_pair_kernel_matches_single():
    """The dual-chain (pair, sub=16) fused kernel vs the sub=8 kernel:
    identical outputs and carries (the two interleaved machine chains
    are independent per-channel recurrences), incl. per-channel
    gain-law rows split across the two halves."""
    C, T = 2048, 256
    rng = np.random.default_rng(11)
    params = agc.make_params(12000.0, mode="med", hang_enable=True)
    pp = _params_dict(params)
    pp.update(out_target=float(params.out_target),
              slope_constant=float(params.slope_constant),
              inv_max_input=float(params.inv_max_input))
    x = jnp.asarray(rng.standard_normal((C, T)).astype(np.float32) * 800)
    carry = jnp.asarray(rng.standard_normal((7, C)).astype(np.float32)
                        ** 2)
    delay = jnp.asarray(
        rng.standard_normal((C, params.attack_buffsize))
        .astype(np.float32) * 100)

    y1, c1, d1 = pallas_agc.agc_pallas_fused(pp, carry, delay, x,
                                             t_tile=128, unroll=8)
    y2, c2, d2 = pallas_agc.agc_pallas_fused(pp, carry, delay, x,
                                             t_tile=128, unroll=8,
                                             pair=True)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y1),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(c2), np.asarray(c1),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(d2), np.asarray(d1))

    # per-channel rows through the pair path
    pc = agc.make_params(12000.0, mode="med",
                         thresh_db=np.linspace(40.0, 80.0, C))
    ppc = agc._pallas_params(pc, pc.hang_time_samples, fused=True,
                             scalar=False)
    chan = agc._chan_rows(pc, C, True)
    y3, c3, _ = pallas_agc.agc_pallas_fused(ppc, carry, delay, x,
                                            t_tile=128, unroll=8,
                                            chan=chan)
    y4, c4, _ = pallas_agc.agc_pallas_fused(ppc, carry, delay, x,
                                            t_tile=128, unroll=8,
                                            chan=chan, pair=True)
    np.testing.assert_allclose(np.asarray(y4), np.asarray(y3),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(c4), np.asarray(c3),
                               rtol=1e-6, atol=1e-6)
