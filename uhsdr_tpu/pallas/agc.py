"""Pallas TPU kernel: the WDSP AGC 5-state gain machine in VMEM.

The XLA `lax.scan` version (`ops.agc.run`) is the single most expensive
stage of the RX chain on TPU (measured 34.6 ms in-chain at 8192ch x 16k —
~1/3 of total): each of the T_dec scan steps round-trips its tiny carry
through HBM-visible buffers and pays the scan's per-iteration overhead.

This kernel runs the WHOLE sequential loop on VMEM-resident tiles:
channels are packed as (8 sublanes x 128 lanes) = 1024 per tile, so every
step of the recurrence is a handful of full-width VPU ops; the state
vectors live in registers across the `fori_loop`, and a scratch buffer
carries them across the sequential time-tile sweep (same pattern as
`pallas.iir`).  The two one-pole back-averages (fast + hang,
`audio_agc.c` backaverage updates) are folded INTO the sequential loop —
they are one multiply-add each here, whereas as XLA dilated affine scans
they cost log2(T) full HBM passes plus an extra packed input transpose
(v1 precomputed them outside; moving them in cut the chain-level AGC
cost).  Only the look-ahead sliding max stays in XLA (a parallel dilated
max it does well).

Reference: `AudioAgc_RunAgcWdsp` 5-state machine (`audio_agc.c:436-551`);
math identical to `ops.agc.run`'s scan body (masked-arithmetic blend).
"""
from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_CARRY = 7   # volts, save_volts, hang_counter, decay_type, state, fba, hba


def _make_machine_step(pp, hang_level=None, min_volts=None):
    """The per-sample 5-state machine body, shared by both kernels.
    Returns step(carry_tuple, rm, ax) -> (new_carry_tuple, new_volts).
    pp: dict of python-float params closed over at trace time.
    hang_level/min_volts: optional (sub, 128) VMEM arrays overriding the
    scalar params — PER-CHANNEL gain-law diversity (the reference's
    per-channel menu state, audio_agc.c:563-574) without leaving the
    kernel path."""
    f32 = np.float32
    attack = f32(pp["attack_mult"])
    fast_d = f32(pp["fast_decay_mult"])
    long_d = f32(pp["decay_mult"])
    hang_d = f32(pp["hang_decay_mult"])
    fast_bm = f32(pp["fast_backmult"])
    hang_bm = f32(pp["hang_backmult"])
    pop_ratio = f32(pp["pop_ratio"])
    hang_level = f32(pp["hang_level"]) if hang_level is None else hang_level
    hang_time = f32(pp["hang_time"])
    hang_en = f32(1.0 if pp["hang_enable"] else 0.0)
    min_volts = f32(pp["min_volts"]) if min_volts is None else min_volts
    one = f32(1.0)

    def step(carry, rm, ax):
        volts, save, hang, decay, st, fba, hba = carry
        # one-pole back-averages of the delayed |x| (in-loop: one
        # multiply-add each vs log2(T) HBM passes as an XLA scan)
        fba = (one - fast_bm) * fba + fast_bm * ax
        hba = (one - hang_bm) * hba + hang_bm * ax
        hang = jnp.maximum(hang - one, f32(0.0))

        att = (rm >= volts).astype(jnp.float32)
        natt = one - att
        is0 = (st < f32(0.5)).astype(jnp.float32)
        is1 = ((st > f32(0.5)) & (st < f32(1.5))).astype(jnp.float32)
        is2 = ((st > f32(1.5)) & (st < f32(2.5))).astype(jnp.float32)
        is3 = ((st > f32(2.5)) & (st < f32(3.5))).astype(jnp.float32)
        is4 = (st > f32(3.5)).astype(jnp.float32)

        ht = hang_en * (hba > hang_level).astype(jnp.float32)
        s0_fast = (volts > pop_ratio * fba).astype(jnp.float32)
        s1_fastc = (volts > save).astype(jnp.float32)
        hc_wait = (hang > f32(0.5)).astype(jnp.float32)

        # Branch masks, differenced instead of multiplied-out: every
        # non-attack state splits as nf = m_taken + m_rest with both
        # factors in {0,1}, so nf - m_taken is exact and each level
        # costs one multiply + one subtract (~25% fewer ops/step than
        # the fully-expanded products, same bit-exact arithmetic).
        nf0 = is0 * natt
        m0f = nf0 * s0_fast
        m0nf = nf0 - m0f
        m0h = m0nf * ht
        m0l = m0nf - m0h
        nf1 = is1 * natt
        m1f = nf1 * s1_fastc
        m1nf = nf1 - m1f
        m1w = m1nf * hc_wait
        m1z = m1nf - m1w
        m1h = m1z * decay
        m1l = m1z - m1h
        n2 = is2 * natt
        m2s = n2 * hc_wait
        m2d = n2 - m2s
        m3d = is3 * natt
        m4d = is4 * natt

        gF = m0f + m1f                       # -> fast decay
        gL = m0l + m1l + m3d                 # -> long decay
        gH = m1h + m2d + m4d                 # -> hang decay
        gW = m0h + m1w + m2s                 # -> hold (k = 0)

        # every volts outcome is volts + (rm - volts) * k with k in
        # {attack, fast, long, hang, 0}, so one blended k replaces the
        # four candidate FMAs + 5-way blend (masks partition unity, so
        # the blend is exact: exactly one term is nonzero)
        keff = att * attack + gF * fast_d + gL * long_d + gH * hang_d
        new_volts = jnp.maximum(volts + (rm - volts) * keff, min_volts)

        new_st = gF + gW * f32(2.0) + gL * f32(3.0) + gH * f32(4.0)
        save_upd = att * (one - (is0 + is1))     # = m2a + m3a + m4a
        new_save = save_upd * volts + (one - save_upd) * save
        new_hang = m0h * hang_time + (one - m0h) * hang
        new_decay = m0h * one + (one - (m0h + m0l)) * decay

        return (new_volts, new_save, new_hang, new_decay, new_st,
                fba, hba), new_volts

    return step


def _make_kernel(pp, t_tile: int, chan: bool = False):
    def kernel(rm_ref, ax_ref, st_ref, *rest):
        if chan:
            pc_ref, y_ref, stout_ref, scratch = rest
            machine_step = _make_machine_step(pp, hang_level=pc_ref[1],
                                              min_volts=pc_ref[0])
        else:
            y_ref, stout_ref, scratch = rest
            machine_step = _make_machine_step(pp)
        ti = pl.program_id(1)

        @pl.when(ti == 0)
        def _init():
            scratch[:] = st_ref[:]

        def step(t, carry):
            new_carry, new_volts = machine_step(carry, rm_ref[t], ax_ref[t])
            y_ref[t] = new_volts
            return new_carry

        # NOTE: an 8x partial unroll of this loop measured identical
        # whole-chain time — the cost is the sequential dependency chain
        # of the recurrence itself, not loop overhead
        sc = scratch[:]                      # (N_CARRY, 8, 128)
        carry0 = tuple(sc[i] for i in range(N_CARRY))
        carry = jax.lax.fori_loop(0, t_tile, step, carry0)
        new_sc = jnp.stack(carry, axis=0)
        scratch[:] = new_sc
        stout_ref[:] = new_sc

    return kernel


def _make_fused_kernel(pp, t_tile: int, w: int, chan: bool = False,
                       unroll: int = 1, pair: bool = False):
    """v3: the WHOLE AGC op in one kernel — |x|, the look-ahead sliding
    max (dilated max on the VMEM slab), the 5-state machine AND the
    log-domain gain application.  The slab trick: xfull (= delay ++ x) at
    output position n needs |xfull[n+1 .. n+w]| for the look-ahead, and
    xfull is x DELAYED by exactly w, so the whole window lives in
    [prev x tile tail, current x tile] — the same left-halo shifted
    BlockSpec as the FIR kernels, no future tile needed.  Replaces the
    v2 path's two pack transposes, log2(w) XLA max passes and the
    mult/log10 passes over HBM (~half the stage's in-chain cost).
    """
    f32 = np.float32
    out_target = f32(pp["out_target"])
    inv_max_input = f32(pp["inv_max_input"])

    def kernel(xc_ref, xp_ref, dl_ref, st_ref, *rest):
        if chan:
            pc_ref, y_ref, stout_ref, scratch, rm_s, od_s = rest
            if pair:
                # per-half param closures for the two machine chains
                machine_step = None
                machine_step_a = _make_machine_step(
                    pp, hang_level=pc_ref[2][:8], min_volts=pc_ref[0][:8])
                machine_step_b = _make_machine_step(
                    pp, hang_level=pc_ref[2][8:], min_volts=pc_ref[0][8:])
            else:
                machine_step = _make_machine_step(pp, hang_level=pc_ref[2],
                                                  min_volts=pc_ref[0])
            slope_constant = pc_ref[1]
        else:
            y_ref, stout_ref, scratch, rm_s, od_s = rest
            machine_step = _make_machine_step(pp)
            machine_step_a = machine_step_b = machine_step
            slope_constant = f32(pp["slope_constant"])
        ti = pl.program_id(1)

        @pl.when(ti == 0)
        def _init():
            scratch[:] = st_ref[:]

        xc = xc_ref[:]                      # (t_tile, 8, 128) current x
        tail = jnp.where(ti == 0, dl_ref[:], xp_ref[t_tile - w:])
        slab = jnp.concatenate([tail, xc], axis=0)   # (t_tile+w, 8, 128)
        a = jnp.abs(slab)
        # rm[j] = max a[j+1 .. j+w]  (dilated sliding max, all in VMEM)
        m = jnp.concatenate([a[1:], jnp.full((1,) + a.shape[1:], -jnp.inf,
                                             jnp.float32)], axis=0)
        total, shift = 1, 1
        while total < w:
            step = min(shift, w - total)
            neg = jnp.full((step,) + m.shape[1:], -jnp.inf, jnp.float32)
            m = jnp.maximum(m, jnp.concatenate([m[step:], neg], axis=0))
            total += step
            shift *= 2
        rm_s[:] = m[:t_tile]
        od_s[:] = slab[:t_tile]             # delayed output samples

        # The sequential loop emits only the volts series; the gain law
        # (log10 + divide — the VPU's multi-cycle ops) is applied in a
        # VECTORIZED epilogue over the whole tile, off the recurrence's
        # critical path.  y_ref doubles as the volts staging buffer.
        sc = scratch[:]
        carry0 = tuple(sc[i] for i in range(N_CARRY))
        if pair:
            # DUAL-CHAIN ILP: the refs carry sub=16 sublanes = TWO
            # independent (8, 128) channel groups; the loop body runs
            # both machines' steps on separate carries, so the VPU can
            # interleave the two dependency chains — the recurrence's
            # per-step latency (the gap to the issue-rate bound,
            # PERF.md r4 AGC row) is hidden across chains.  sub=16 as
            # ONE (16, 128) op-chain is the known toolchain pathology;
            # two (8, 128) chains compile cleanly.
            U = unroll
            carry0a = tuple(c[:8] for c in carry0)
            carry0b = tuple(c[8:] for c in carry0)

            def stepp(tu, carry):
                ca, cb = carry
                base = tu * U
                rm_blk = rm_s[pl.ds(base, U)]       # (U, 16, 128)
                od_blk = od_s[pl.ds(base, U)]
                vs = []
                for u in range(U):
                    ca, nva = machine_step_a(ca, rm_blk[u, :8],
                                             jnp.abs(od_blk[u, :8]))
                    cb, nvb = machine_step_b(cb, rm_blk[u, 8:],
                                             jnp.abs(od_blk[u, 8:]))
                    vs.append(jnp.concatenate([nva, nvb], axis=0))
                y_ref[pl.ds(base, U)] = jnp.stack(vs, axis=0)
                return ca, cb

            ca, cb = jax.lax.fori_loop(0, t_tile // U, stepp,
                                       (carry0a, carry0b))
            carry = tuple(jnp.concatenate([a, b], axis=0)
                          for a, b in zip(ca, cb))
        elif unroll == 1:
            def step(t, carry):
                new_carry, new_volts = machine_step(carry, rm_s[t],
                                                    jnp.abs(od_s[t]))
                y_ref[t] = new_volts
                return new_carry

            carry = jax.lax.fori_loop(0, t_tile, step, carry0)
        else:
            # time-unrolled: ONE dynamic load of U samples per
            # iteration, U machine steps on register values (static
            # indexing), ONE dynamic store — amortizes the per-step
            # dynamic VMEM access cost that dominates the rolled loop
            U = unroll

            def stepu(tu, carry):
                base = tu * U
                rm_blk = rm_s[pl.ds(base, U)]       # (U, sub, 128)
                od_blk = od_s[pl.ds(base, U)]
                vs = []
                for u in range(U):
                    carry, nv = machine_step(carry, rm_blk[u],
                                             jnp.abs(od_blk[u]))
                    vs.append(nv)
                y_ref[pl.ds(base, U)] = jnp.stack(vs, axis=0)
                return carry

            carry = jax.lax.fori_loop(0, t_tile // U, stepu, carry0)
        v = y_ref[:]                         # volts series, whole tile
        vo = jnp.minimum(jnp.log10(inv_max_input * v), f32(0.0))
        y_ref[:] = od_s[:] * ((out_target - slope_constant * vo) / v)
        new_sc = jnp.stack(carry, axis=0)
        scratch[:] = new_sc
        stout_ref[:] = new_sc

    return kernel


def agc_pallas_fused(pp: dict, carry: jnp.ndarray, delay: jnp.ndarray,
                     x: jnp.ndarray, t_tile: int = 256, sub: int = 8,
                     chan: jnp.ndarray | None = None, unroll: int = 1,
                     pair: bool = False):
    """Full AGC op (delay line, look-ahead max, 5-state machine, gain).
    carry: (7, C); delay: (C, w) f32 (the carried delay-line tail);
    x: (C, T) f32.  Returns (y (C, T), new_carry (7, C), new_delay).
    Requires C % (sub*128) == 0 (or C % 1024 with sub reduced), T % t_tile
    == 0, t_tile >= w.

    chan: optional (3, C) f32 per-channel gain-law parameters
    [min_volts, slope_constant, hang_level] — VMEM-resident rows, the
    kernel path for per-channel AGC settings (audio_agc.c:563-574).

    sub = channel sublanes per sequential step.  In principle packing
    more channels per step divides the sequential length, but sub=16
    blocks in fori_loop kernels compile to pathological code on the
    current toolchain (a minimal probe ran 60 s/call; sub=16+ here
    crashed the compile helper) — sub stays 8."""
    C, T = x.shape
    w = delay.shape[-1]
    if pair:
        # dual-chain ILP: sub=16 sublanes per block = TWO independent
        # (8, 128) machine chains per program (see _make_fused_kernel)
        sub = 16
        if C % (sub * 128) != 0:
            pair = False
            sub = 8
    while sub > 8 and C % (sub * 128) != 0:
        sub //= 2
    assert C % (sub * 128) == 0, (C, sub)
    assert T % t_tile == 0 and t_tile >= w, (T, t_tile, w)
    n_c = C // (sub * 128)
    n_t = T // t_tile

    def pack(a, n):   # (C, n) -> (n, sub*n_c, 128)
        return jnp.swapaxes(a, 0, 1).reshape(n, sub * n_c, 128)

    x3 = pack(x, T)
    dl3 = pack(delay, w)
    st3 = carry.reshape(N_CARRY, sub * n_c, 128)

    in_specs = [
        pl.BlockSpec((t_tile, sub, 128), lambda ci, ti: (ti, ci, 0)),
        pl.BlockSpec((t_tile, sub, 128),
                     lambda ci, ti: (jnp.maximum(ti - 1, 0), ci, 0)),
        pl.BlockSpec((w, sub, 128), lambda ci, ti: (0, ci, 0)),
        pl.BlockSpec((N_CARRY, sub, 128), lambda ci, ti: (0, ci, 0)),
    ]
    operands = [x3, x3, dl3, st3]
    if chan is not None:
        in_specs.append(pl.BlockSpec((3, sub, 128),
                                     lambda ci, ti: (0, ci, 0)))
        operands.append(chan.reshape(3, sub * n_c, 128))

    assert t_tile % unroll == 0, (t_tile, unroll)
    kernel = _make_fused_kernel(pp, t_tile, w, chan=chan is not None,
                                unroll=unroll, pair=pair)
    y3, st_out = pl.pallas_call(
        kernel,
        grid=(n_c, n_t),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((t_tile, sub, 128), lambda ci, ti: (ti, ci, 0)),
            pl.BlockSpec((N_CARRY, sub, 128), lambda ci, ti: (0, ci, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, sub * n_c, 128), jnp.float32),
            jax.ShapeDtypeStruct((N_CARRY, sub * n_c, 128), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((N_CARRY, sub, 128), jnp.float32),
                        pltpu.VMEM((t_tile, sub, 128), jnp.float32),
                        pltpu.VMEM((t_tile, sub, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=(jax.default_backend() == "cpu"),
    )(*operands)
    y = jnp.swapaxes(y3.reshape(T, C), 0, 1)
    new_delay = jnp.concatenate([delay, x], axis=-1)[..., -w:] if T < w \
        else x[..., -w:]
    return y, st_out.reshape(N_CARRY, C), new_delay


def agc_scan_pallas(pp: dict, carry: jnp.ndarray, rm: jnp.ndarray,
                    absx: jnp.ndarray, t_tile: int = 256,
                    chan: jnp.ndarray | None = None):
    """Run the AGC machine.  carry: (7, C) — volts, save_volts,
    hang_counter, decay_type, state, fast_backaverage, hang_backaverage;
    rm (look-ahead ring max) and absx (delayed |x|): (C, T) f32.
    Returns (volts (C, T), new_carry (7, C)).
    Requires C % 1024 == 0 (8 sublanes x 128 lanes) and T % t_tile == 0.

    chan: optional (2, C) f32 per-channel [min_volts, hang_level].

    t_tile=256 keeps the input/output (t_tile, 8, 128) f32 blocks with
    double buffering inside the 16 MB VMEM budget.
    """
    C, T = rm.shape
    assert C % 1024 == 0, C
    assert T % t_tile == 0, (T, t_tile)
    n_c = C // 1024
    n_t = T // t_tile

    def pack(a):   # (C, T) -> (T, 8*n_c, 128): row r covers ch [128r,128r+128)
        return jnp.swapaxes(a, 0, 1).reshape(T, 8 * n_c, 128)

    rm3, ax3 = pack(rm), pack(absx)
    st3 = carry.reshape(N_CARRY, 8 * n_c, 128)

    in_specs = [
        pl.BlockSpec((t_tile, 8, 128), lambda ci, ti: (ti, ci, 0)),
        pl.BlockSpec((t_tile, 8, 128), lambda ci, ti: (ti, ci, 0)),
        pl.BlockSpec((N_CARRY, 8, 128), lambda ci, ti: (0, ci, 0)),
    ]
    operands = [rm3, ax3, st3]
    if chan is not None:
        in_specs.append(pl.BlockSpec((2, 8, 128),
                                     lambda ci, ti: (0, ci, 0)))
        operands.append(chan.reshape(2, 8 * n_c, 128))

    kernel = _make_kernel(pp, t_tile, chan=chan is not None)
    y3, st_out = pl.pallas_call(
        kernel,
        grid=(n_c, n_t),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((t_tile, 8, 128), lambda ci, ti: (ti, ci, 0)),
            pl.BlockSpec((N_CARRY, 8, 128), lambda ci, ti: (0, ci, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, 8 * n_c, 128), jnp.float32),
            jax.ShapeDtypeStruct((N_CARRY, 8 * n_c, 128), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((N_CARRY, 8, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=(jax.default_backend() == "cpu"),
    )(*operands)
    volts = jnp.swapaxes(y3.reshape(T, C), 0, 1)
    return volts, st_out.reshape(N_CARRY, C)
