"""Mixed-mode channel fleet — BASELINE config 5: "10k mixed-mode channels
(SSB/AM/FM/RTTY) sharded over hosts".

Channels are grouped by chain configuration (SURVEY §7 hard-part #2: the
idiomatic TPU answer to mixed per-channel modes is grouping per compiled
chain rather than masking every demod for every channel).  Each group is
one jitted RxChain (or sharded step) over its channel batch; groups run
back-to-back per block — XLA queues them asynchronously, so distinct
groups pipeline on-device.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..chain import rx
from ..ops import agc as agc_mod
from ..ops import iir as iir_ops


@dataclass
class _Group:
    cfg: rx.RxConfig
    chain: rx.RxChain
    state: object
    channel_idx: np.ndarray     # global channel numbers of this group


def _agc_batch_key(params: rx.RxParams, audio) -> tuple | None:
    """Groups whose AGC runs share this key can be served by ONE kernel
    invocation over their concatenated channels (cross-group stage
    batching — the sequential 5-state machine's latency floor is paid
    once instead of per group).  Keyed by the decimated block length and
    every time-constant the kernel closes over; the gain-law fields
    (thresh/slope/hang level) may differ per group — they ride as
    per-channel VMEM rows (`ops.agc._chan_rows`)."""
    a = params.agc
    if a.agc_off or audio.ndim != 2:
        return None
    if any(np.ndim(v) > 0 for v in (a.attack_mult, a.decay_mult,
                                    a.fast_decay_mult, a.hang_decay_mult)):
        return None
    return (int(audio.shape[-1]), int(a.attack_buffsize),
            float(a.attack_mult), float(a.decay_mult),
            float(a.fast_decay_mult), float(a.hang_decay_mult),
            float(a.fast_backmult), float(a.hang_backmult),
            float(a.out_target), float(a.inv_max_input),
            int(a.hang_time_samples), bool(a.hang_enable),
            float(a.pop_ratio))


def _merge_agc_params(plist: list, sizes: list[int]) -> agc_mod.AgcParams:
    """One AgcParams over the concatenated channel axis.  Gain-law fields
    become (C_total,) rows when they differ between groups; remove_dc is
    handled per group AFTER the batched kernel (the DC blocker is a cheap
    parallel one-pole, and mixing AM/SSB groups must not change SSB
    output)."""
    p0 = plist[0]

    def same(field):
        v0 = getattr(p0, field)
        return all(np.ndim(getattr(p, field)) == 0
                   and np.ndim(v0) == 0
                   and float(getattr(p, field)) == float(v0)
                   for p in plist)

    def cat(field):
        return np.concatenate([
            np.broadcast_to(np.asarray(getattr(p, field), np.float32), (n,))
            for p, n in zip(plist, sizes)])

    merged = {}
    for field in ("min_volts", "slope_constant", "hang_level", "fixed_gain"):
        if not same(field):
            merged[field] = cat(field)
    return p0._replace(remove_dc=False, **merged)


def _group_by(keyfn, n: int) -> dict:
    out: dict = {}
    for k in range(n):
        out.setdefault(keyfn(k), []).append(k)
    return out


def _make_stage_batched_step(chains: list):
    """Build the fused fleet step with CROSS-GROUP STAGE BATCHING.

    Measured on v5e (6 x 1024ch x 16384): six separately-invoked chains
    inside one jit cost 35 ms device time, while the same 6144 channels
    as ONE batch cost 9.2 ms — per-group kernel launches and the
    sequential kernels' latency floors dominate at fleet group sizes.
    So each stage whose parameters match across groups runs as ONE
    kernel invocation over the concatenated channels:

      * stage A (NCO + decimating front FIR): usb/lsb/cw narrow paths
        share the SAME reference decimator table and translate, so they
        concat for free; AM/SAM differ per bandwidth and stay solo.
      * stage B (Hilbert-combine FIR at fs_dec): usb/cw share the exact
        g = h_i - j*h_q filter (lsb is the conjugate and stays solo).
      * PreFilter SOS: groups with the same table concat.
      * WDSP AGC: one sequential 5-state kernel per rate class, with
        per-channel gain-law rows when settings differ
        (`_merge_agc_params`).
      * interpolation: every /4 path uses the same FirRxInterpolate
        table — all such groups concat.

    IMPORTANT COST RULE (measured): concat/slice ONLY the state leaves a
    stage actually advances.  A full-pytree merge+split at every stage
    boundary (~30 leaves x groups of tiny slice/concat kernels) costs
    more than the batching saves (~20 ms of launch overhead per block);
    the per-stage leaf sets here are 1-3 arrays each.
    """

    def _cat(arrs):
        return arrs[0] if len(arrs) == 1 else jnp.concatenate(arrs, axis=0)

    def _slices(sizes):
        offs = np.cumsum([0] + sizes)
        return [slice(int(offs[j]), int(offs[j + 1]))
                for j in range(len(sizes))]

    def fused(states, planes_in):
        n = len(chains)
        st = list(states)
        cfgs = [c.cfg for c in chains]
        prms = [c.params for c in chains]

        # ---------- stage A: NCO + front kernel ----------
        def akey(k):
            c, p = cfgs[k], prms[k]
            if c.iq_auto_correction:
                return None
            return ("A", p.front_fir_re.tobytes(), p.front_fir_im.tobytes(),
                    np.asarray(p.nco_delta).tobytes(), c.decim,
                    c.mode == "fm", c.front_impl,
                    planes_in[k][0].shape[-1],
                    p.front2_re is None and c.mode in ("usb", "lsb", "cw"))

        zfs = [None] * n
        for key, idxs in _group_by(akey, n).items():
            if key is None or len(idxs) == 1:
                for k in idxs:
                    zfs[k], st[k], _ = rx.process_front(
                        cfgs[k], prms[k], st[k],
                        jax.lax.complex(*planes_in[k]))
                    if isinstance(zfs[k], tuple):   # planes handoff —
                        # the fleet slices/concats zf across groups, so
                        # normalize back to complex here
                        zfs[k] = jax.lax.complex(*zfs[k])
                continue
            sizes = [planes_in[k][0].shape[0] for k in idxs]
            k0 = idxs[0]
            m = st[k0]._replace(
                nco_phase=_cat([st[k].nco_phase for k in idxs]),
                front_carry=_cat([st[k].front_carry for k in idxs]),
                iqcorr=None)
            gi = _cat([planes_in[k][0] for k in idxs])
            gq = _cat([planes_in[k][1] for k in idxs])
            zf, m, _ = rx.process_front(cfgs[k0], prms[k0], m,
                                        jax.lax.complex(gi, gq))
            if isinstance(zf, tuple):
                zf = jax.lax.complex(*zf)
            for sl, k in zip(_slices(sizes), idxs):
                zfs[k] = zf[sl]
                st[k] = st[k]._replace(nco_phase=m.nco_phase[sl],
                                       front_carry=m.front_carry[sl])

        # ---------- stage B: fused Hilbert pair at fs_dec ----------
        def bkey(k):
            p = prms[k]
            if p.front2_re is None or cfgs[k].mode == "fm":
                return None
            return ("B", p.front2_re.tobytes(), p.front2_im.tobytes(),
                    zfs[k].shape[-1])

        for key, idxs in _group_by(bkey, n).items():
            if key is None:
                continue
            if len(idxs) == 1:
                k = idxs[0]
                zfs[k], st[k] = rx.stage_b(cfgs[k], prms[k], st[k], zfs[k])
                continue
            sizes = [zfs[k].shape[0] for k in idxs]
            k0 = idxs[0]
            m = st[k0]._replace(
                front2_carry=_cat([st[k].front2_carry for k in idxs]))
            zf, m = rx.stage_b(cfgs[k0], prms[k0], m, _cat([zfs[k]
                                                            for k in idxs]))
            for sl, k in zip(_slices(sizes), idxs):
                zfs[k] = zf[sl]
                st[k] = st[k]._replace(front2_carry=m.front2_carry[sl])

        # ---------- demod + PreFilter SOS (per group) ----------
        # (rx._demod_sos_pre_agc advances fade/sam/notch/leaky/sos state;
        # ssb demod is a no-op so the SOS kernel is the only real work —
        # same-bandwidth groups share its table via the A/B concats above)
        pre = [None] * n
        for k in range(n):
            if cfgs[k].mode == "fm":
                audio, st[k], _ = rx.demod_pre_agc(cfgs[k], prms[k],
                                                   st[k], zfs[k])
            else:
                audio, st[k], _ = rx._demod_sos_pre_agc(
                    cfgs[k], prms[k], st[k], zfs[k], {})
            pre[k] = audio

        # ---------- AGC: one sequential kernel per rate class ----------
        post_in = [None] * n
        for key, idxs in _group_by(
                lambda k: _agc_batch_key(prms[k], pre[k]), n).items():
            if key is None or len(idxs) == 1:
                for k in idxs:
                    y_g, agc_g = agc_mod.run(prms[k].agc, st[k].agc, pre[k])
                    st[k] = st[k]._replace(agc=agc_g)
                    post_in[k] = y_g
                continue
            sizes = [pre[k].shape[0] for k in idxs]
            merged_p = _merge_agc_params([prms[k].agc for k in idxs], sizes)
            merged_s = jax.tree.map(
                lambda *xs: jnp.concatenate(xs, axis=0),
                *[st[k].agc for k in idxs])
            y_cat, agc_cat = agc_mod.run(merged_p, merged_s,
                                         _cat([pre[k] for k in idxs]))
            for sl, k in zip(_slices(sizes), idxs):
                agc_g = jax.tree.map(lambda x: x[sl], agc_cat)
                y_g = y_cat[sl]
                if prms[k].agc.remove_dc:
                    y_g, dc_g = iir_ops.dc_blocker_block(0.9999, agc_g.dc,
                                                         y_g)
                    agc_g = agc_g._replace(dc=dc_g)
                st[k] = st[k]._replace(agc=agc_g)
                post_in[k] = y_g

        # ---------- decimated-rate post (scale/EQ1/NR — per group) ------
        dec_audio = [None] * n
        for k in range(n):
            if cfgs[k].mode == "fm":
                continue
            dec_audio[k], st[k], _ = rx.post_to_dec(cfgs[k], prms[k],
                                                    st[k], post_in[k], {})

        # ---------- interpolation + 48k post ----------
        def ikey(k):
            c, p = cfgs[k], prms[k]
            if c.mode == "fm" or dec_audio[k] is None:
                return None
            return ("I", p.interp_fir.tobytes(), c.decim,
                    p.aa_sos.tobytes(), p.eq2_sos.tobytes(),
                    dec_audio[k].shape[-1])

        outs = [None] * n
        for key, idxs in _group_by(ikey, n).items():
            if key is None:
                for k in idxs:
                    if cfgs[k].mode == "fm":
                        outs[k], st[k], _ = rx.post_after_agc(
                            cfgs[k], prms[k], st[k], post_in[k])
                    else:
                        outs[k], st[k], _ = rx.interp_stage(
                            cfgs[k], prms[k], st[k], dec_audio[k], {})
                continue
            if len(idxs) == 1:
                k = idxs[0]
                outs[k], st[k], _ = rx.interp_stage(cfgs[k], prms[k],
                                                    st[k], dec_audio[k], {})
                continue
            sizes = [dec_audio[k].shape[0] for k in idxs]
            k0 = idxs[0]
            m = st[k0]._replace(
                interp_carry=_cat([st[k].interp_carry for k in idxs]),
                eq2=_cat([jnp.moveaxis(st[k].eq2, 1, 0) for k in idxs])
                if st[k0].eq2.shape[0] else st[k0].eq2,
                aa=_cat([jnp.moveaxis(st[k].aa, 1, 0) for k in idxs])
                if st[k0].aa.shape[0] else st[k0].aa)
            if st[k0].eq2.shape[0]:
                m = m._replace(eq2=jnp.moveaxis(m.eq2, 0, 1))
            if st[k0].aa.shape[0]:
                m = m._replace(aa=jnp.moveaxis(m.aa, 0, 1))
            a48, m, _ = rx.interp_stage(cfgs[k0], prms[k0], m,
                                        _cat([dec_audio[k] for k in idxs]),
                                        {})
            for sl, k in zip(_slices(sizes), idxs):
                st[k] = st[k]._replace(
                    interp_carry=m.interp_carry[sl],
                    eq2=m.eq2[:, sl] if m.eq2.shape[0] else st[k].eq2,
                    aa=m.aa[:, sl] if m.aa.shape[0] else st[k].aa)
                outs[k] = a48[sl]

        return outs, st

    return fused


class ChannelFleet:
    """A set of virtual receiver channels with per-channel configs,
    processed as per-config groups."""

    def __init__(self, configs: list[rx.RxConfig], assignments: list[int]):
        """configs: distinct chain configs; assignments[ch] = config index."""
        self.assignments = np.asarray(assignments)
        self.n_channels = len(assignments)
        self.groups: list[_Group] = []
        for gi, cfg in enumerate(configs):
            idx = np.flatnonzero(self.assignments == gi)
            if idx.size == 0:
                continue
            chain = rx.RxChain(cfg)
            self.groups.append(_Group(
                cfg=cfg, chain=chain,
                state=chain.init_state((idx.size,)),
                channel_idx=idx))

    def process_block(self, i_plane: np.ndarray, q_plane: np.ndarray):
        """i/q: (n_channels, T) f32.  Returns audio (n_channels, T) f32.

        Group outputs are gathered back into global channel order.
        """
        T = i_plane.shape[-1]
        outs = []
        for g in self.groups:
            gi = jnp.asarray(np.ascontiguousarray(i_plane[g.channel_idx]))
            gq = jnp.asarray(np.ascontiguousarray(q_plane[g.channel_idx]))
            audio, g.state, _ = g.chain(g.state, i=gi, q=gq)
            outs.append((g.channel_idx, audio))
        result = np.empty((self.n_channels, T), np.float32)
        for idx, audio in outs:
            result[idx] = np.asarray(audio)
        return result

    def process_block_device(self, planes: list[tuple]):
        """Device-resident step: planes[k] = (i_plane, q_plane) jax arrays
        for group k (each (group_size, T) f32, already on device).

        Returns the per-group audio arrays WITHOUT fetching to host — the
        production serving path, where decoded outputs (text, S-meter,
        squelch flags) are reduced on-device and only scalars leave the
        chip.  ALL groups run inside ONE jit (`_fused_step`): at fleet
        group sizes (~1k channels) each separately-dispatched chain pays
        a ~4-5 ms fixed cost on the axon relay — six dispatches were
        ~60% of the whole fleet block (measured 2128 aggregate Ms/s as 6
        jits vs the fused step's single fixed cost)."""
        # Execution strategy (both measured on v5e, 6 modes x 16384-blk):
        #  * small groups (~1k ch): ONE fused jit with cross-group stage
        #    batching — per-dispatch cost and the sequential kernels'
        #    per-invocation floors dominate (2,646 vs 2,128 Ms/s for six
        #    separate jits at 1024 ch/group);
        #  * large groups (>=2k ch): per-group jits dispatched
        #    back-to-back — device time dominates and the single giant
        #    fused module hits an XLA scheduling pathology (4,202 fused
        #    vs 5,011 separate at 4096 ch/group; same class of
        #    composition pathology as PARITY's shard_map note).
        big = min(g.channel_idx.size for g in self.groups) >= 2048
        if big:
            if not hasattr(self, "_group_steps"):
                def mk(chain):
                    def step(st, i, q):
                        a, st2, _ = rx.process_block(
                            chain.cfg, chain.params, st,
                            jax.lax.complex(i, q))
                        return a, st2
                    return jax.jit(step)
                self._group_steps = [mk(g.chain) for g in self.groups]
            outs = []
            for g, step, (i_p, q_p) in zip(self.groups, self._group_steps,
                                           planes):
                a, g.state = step(g.state, i_p, q_p)
                outs.append(a)
            return outs
        if not hasattr(self, "_fused_step"):
            chains = [g.chain for g in self.groups]
            self._fused_step = jax.jit(_make_stage_batched_step(chains))
        states = [g.state for g in self.groups]
        outs, new_states = self._fused_step(states, planes)
        for g, st in zip(self.groups, new_states):
            g.state = st
        return outs

    @property
    def group_sizes(self) -> dict[str, int]:
        return {f"{g.cfg.mode}/{g.cfg.bw_key}": g.channel_idx.size
                for g in self.groups}


class WidebandFleet:
    """ONE wideband IQ stream -> polyphase channelizer -> mixed-mode fleet,
    entirely on-device.

    The realistic deployment of the BASELINE "10k channels" target: an
    RF front end delivers one wide capture at fs_wide = M * fs_chan; the
    critically-sampled analysis bank (`ops/channelizer.AnalysisPfb`)
    splits it into M channel streams for the cost of one filter pass +
    one DFT, and contiguous channel ranges feed per-config chain groups
    (static slices — no gathers).  This is the N-channel generalization
    of the reference's front end (mix `freq_shift.c` + decimate
    `audio_driver.c:2744`), which serves exactly one channel.

    configs[k] applies to channels [sum(counts[:k]), sum(counts[:k+1]));
    sum(counts) = M = the channelizer size.  Every config must share
    block_len = wideband_block // M.
    """

    def __init__(self, configs: list[rx.RxConfig], counts: list[int],
                 taps_per_branch: int = 12):
        from ..ops import channelizer as chz

        assert len(configs) == len(counts)
        M = int(sum(counts))
        self.n_channels = M
        self.bank = chz.AnalysisPfb(M, taps_per_branch=taps_per_branch)
        self.bank_state = self.bank.init_state()
        self.block_len = configs[0].block_len
        for c in configs:
            assert c.block_len == self.block_len, "uniform block_len required"
        # contiguous counts are just grouped assignments — reuse
        # ChannelFleet's group construction and dispatch
        assignments = sum(([k] * n for k, n in enumerate(counts)), [])
        self.fleet = ChannelFleet(configs, assignments)
        self.groups = self.fleet.groups

        bank = self.bank

        @jax.jit
        def bank_step(state, i_wide, q_wide):
            x = jax.lax.complex(i_wide, q_wide)
            y, new_state = bank(state, x)        # (M, T) complex64
            return jnp.real(y), jnp.imag(y), new_state

        self._bank_step = bank_step

    @property
    def wideband_block(self) -> int:
        """Wideband samples consumed per step."""
        return self.block_len * self.n_channels

    def process_block_device(self, i_wide, q_wide):
        """i/q_wide: (wideband_block,) f32 device arrays at fs_wide.
        Returns the per-group audio device arrays (serving path — nothing
        is fetched to host)."""
        i_ch, q_ch, self.bank_state = self._bank_step(
            self.bank_state, i_wide, q_wide)
        planes = []
        for g in self.groups:
            lo, hi = int(g.channel_idx[0]), int(g.channel_idx[-1]) + 1
            planes.append((i_ch[lo:hi], q_ch[lo:hi]))   # static slices
        return self.fleet.process_block_device(planes)

    def process_block(self, i_wide: np.ndarray, q_wide: np.ndarray):
        """Host convenience: wideband f32 in, (M, T) audio out."""
        outs = self.process_block_device(jnp.asarray(i_wide),
                                         jnp.asarray(q_wide))
        return np.concatenate([np.asarray(a) for a in outs], axis=0)


class WidebandTxFleet:
    """TX mirror of WidebandFleet: per-channel modulators -> synthesis
    filterbank -> ONE wideband IQ stream at fs_wide = M * 48 kHz.

    The transposed dual of the reference's single-channel TX
    (`TxProcessor_Run` modulates one audio stream to one IQ stream at the
    LO); here M transmit channels each run their own TX chain config and
    the `ops/channelizer.SynthesisPfb` recombines them, placing channel m
    at +m * fs_wide / M — a multi-carrier exciter.
    """

    def __init__(self, configs: list, counts: list[int],
                 taps_per_branch: int = 12):
        from ..chain import tx as tx_chain
        from ..ops import channelizer as chz

        assert len(configs) == len(counts)
        M = int(sum(counts))
        self.n_channels = M
        self.bank = chz.SynthesisPfb(M, taps_per_branch=taps_per_branch)
        self.bank_state = self.bank.init_state()
        self.block_len = configs[0].block_len
        for c in configs:
            assert c.block_len == self.block_len, "uniform block_len required"
        self.groups = []
        self.group_counts = []
        for cfg, n in zip(configs, counts):
            if n == 0:
                continue
            chain = tx_chain.TxChain(cfg)
            self.groups.append((chain, chain.init_state((n,))))
            self.group_counts.append(n)

        bank = self.bank

        @jax.jit
        def bank_step(state, i_ch, q_ch):
            y = jax.lax.complex(i_ch, q_ch)      # (M, T)
            x, new_state = bank(state, y)
            return jnp.real(x), jnp.imag(x), new_state

        self._bank_step = bank_step

    def process_block_device(self, audio_groups: list):
        """audio_groups: LIST of per-group (counts[k], T) f32 device
        arrays of voice/audio.  Returns (i_wide, q_wide) f32 device
        arrays of length T * M."""
        assert isinstance(audio_groups, (list, tuple)), (
            "audio_groups must be a list of per-group arrays, not a "
            "single stacked array")
        assert len(audio_groups) == len(self.groups), (
            len(audio_groups), len(self.groups))
        i_parts, q_parts = [], []
        new_groups = []
        for (chain, state), audio, n in zip(self.groups, audio_groups,
                                            self.group_counts):
            assert audio.shape == (n, self.block_len), (
                audio.shape, (n, self.block_len))
            gi, gq, state = chain(state, audio)
            new_groups.append((chain, state))
            i_parts.append(gi)
            q_parts.append(gq)
        self.groups = new_groups
        i_ch = jnp.concatenate(i_parts, axis=0)
        q_ch = jnp.concatenate(q_parts, axis=0)
        i_wide, q_wide, self.bank_state = self._bank_step(
            self.bank_state, i_ch, q_ch)
        return i_wide, q_wide


class FreeDvFleetGroup:
    """N FreeDV channels as ONE fleet group (the north-star scaling of
    the reference's single FreeDV path, `freedv_uhsdr.c:166-320`).

    Two tiers, mirroring the firmware's IRQ/PendSV split:
      * radio-front tier — per-channel NCO translate + 48k->8k rate
        conversion, BATCHED on-device: one jitted step over the whole
        (C, T) block (the `AudioDriver_RxProcessorFreeDV` role,
        `audio_driver.c:1330-1470`, vectorized over channels);
      * modem tier — BATCHED host NumPy (the PendSV deferral role).
        For mode 1600 the whole stack is array-state batched
        (`modems.fdmdv_batch.FreeDv1600Fleet`: batched FDMDV matched
        filter/timing/decision, batched Golay, batched Codec2 1300 —
        r5; the r4 per-channel modem-object loop is gone, ~30x the
        per-core capacity).  700D batches its dominant cost too
        (`FreeDv700DFleet`: batched Codec2 700C vocoder ~74% of the
        scalar per-channel cost + per-frame LDPC; the thin per-channel
        OFDM sync machines remain — their control flow is ragged by
        nature and ~1% of real time each).  `bench_fleet.py --freedv`
        reports the measured real-time channel capacity of both tiers
        (committed artifact FLEET_FREEDV_r05.json).
    """

    def __init__(self, n_channels: int, mode: str = "freedv1600",
                 block_len_48k: int = 7680,
                 translate_hz: float | np.ndarray = 0.0):
        from ..modems import freedv as freedv_mod
        from ..ops import fir as fir_ops
        from ..ops import design, nco as nco_mod

        assert block_len_48k % freedv_mod.RATIO == 0
        self.n_channels = n_channels
        self.block_len = block_len_48k
        self.mode = mode
        self.modems = None
        if mode == "freedv1600":
            from ..modems.fdmdv_batch import FreeDv1600Fleet
            self._fleet_modem = FreeDv1600Fleet(n_channels)
        else:
            from ..modems.fdmdv_batch import FreeDv700DFleet
            self._fleet_modem = FreeDv700DFleet(n_channels)
        ratio = freedv_mod.RATIO
        h_dec = design.decimation_fir(72, ratio,
                                      freedv_mod.IQ_RATE).astype(np.float32)
        deltas = np.broadcast_to(
            np.asarray([nco_mod.freq_to_delta(-f, freedv_mod.IQ_RATE)
                        for f in np.broadcast_to(translate_hz,
                                                 (n_channels,))],
                       np.uint32), (n_channels,))

        def front(phases, ci, cq, i_plane, q_plane):
            z = jax.lax.complex(i_plane, q_plane)
            z, phases = nco_mod.mix(z, phases, jnp.asarray(deltas))
            i_d, ci = fir_ops.fir_decimate_block(
                jnp.asarray(h_dec), ci, jnp.real(z), ratio)
            q_d, cq = fir_ops.fir_decimate_block(
                jnp.asarray(h_dec), cq, jnp.imag(z), ratio)
            return phases, ci, cq, i_d, q_d

        self._front = jax.jit(front)
        # created inside jit: eager uint32 zeros poison device->host
        # fetches on the axon relay (see bench.py docstring)
        self._phases = jax.jit(
            lambda d: jnp.zeros((n_channels,), jnp.uint32))(
            jnp.zeros((), jnp.float32))
        self._ci = fir_ops.init_carry((n_channels,), 72, jnp.float32)
        self._cq = fir_ops.init_carry((n_channels,), 72, jnp.float32)

    def front_block(self, i_plane, q_plane):
        """Device tier only: (C, T) 48k planes -> (C, T/6) complex64
        8 kHz baseband (host numpy)."""
        self._phases, self._ci, self._cq, i_d, q_d = self._front(
            self._phases, self._ci, self._cq, i_plane, q_plane)
        return np.asarray(i_d) + 1j * np.asarray(q_d)

    def process_block(self, i_plane, q_plane) -> list[np.ndarray]:
        """Full step: device front + batched modem tier.  Returns the
        per-channel decoded speech (int16-scale f32 @8k, possibly empty
        while the modem buffers)."""
        iq8 = self.front_block(i_plane, q_plane)
        return self._fleet_modem.demod(iq8)

    @property
    def stats(self) -> dict:
        return self._fleet_modem.stats
