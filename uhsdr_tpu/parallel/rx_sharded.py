"""Sharded RX pipeline over a (dp, sp) mesh.

Design (SURVEY §2.6 mapping):

  * The IQ front end (NCO mix + analytic-bandpass decimating FIR) is
    parallel in time, so it runs under `shard_map` with the (channels,
    time) grid sharded over (dp, sp).  The streaming-FIR history that the
    reference keeps in CMSIS `pState` arrays (`audio_driver.c:71-97`)
    becomes a **halo**: each time shard needs the previous shard's last
    ``taps-1`` RAW IQ samples, fetched with a right-shift `ppermute` over
    ICI; the first shard consumes the carried block-boundary state.

  * **Halo/compute overlap**: the local FIR is split into a *body* (the
    whole shard computed with zero history — every output from index
    ``E = ceil((taps-1)/decim)`` on is exact) and an *edge* (the first E
    outputs, which need the halo).  Only the tiny edge matmul depends on
    the `ppermute`, so XLA schedules the collective concurrently with
    the body kernel — the ICI transfer hides behind the MXU work instead
    of serializing in front of it.

  * **Kernel-quality data path**: the body runs the same Pallas MXU
    decimating-FIR kernel as the single-chip chain
    (`pallas/fir.fir_decimate_pallas`, NCO fused in VMEM), picked by the
    same auto rule (off-CPU + tiling shapes); small/odd shapes fall back
    to the XLA FFT path so `dryrun_multichip` works on tiny CPU meshes.

  * NCO phase is computed from the GLOBAL sample index (shard base +
    local index, uint32 wrap-exact), so raw-IQ halos can be exchanged
    and rotated by the consuming shard: the rotation equals what the
    producing shard would have applied.

  * Everything after demodulation is per-channel sequential in time (AGC /
    PLL scans), so the pipeline reshards: channels spread over the *whole*
    device set ``P(('dp','sp'))``, time unsharded.  XLA inserts the
    all-to-all at the reshard point.

The streaming carry across blocks needs no collective at all: the new
front-FIR carry is simply the global raw-input tail, a sharded slice.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..chain import rx as rx_chain
from ..ops import fir
from ..pallas import fir as pallas_fir
from . import mesh as mesh_mod

P = jax.sharding.PartitionSpec

_PHASE_SCALE = np.float32(2.0 * np.pi / 2.0 ** 32)


def _edge_tap_matrices(h: np.ndarray, decim: int):
    """(2L, E) real/imag tap matrices for the first E = ceil(L/decim)
    outputs: with slab s = [hist (L), local head (L)],
      edge[m] = sum_k h[k] * s[L + m*decim - k].
    """
    taps = h.shape[-1]
    L = taps - 1
    E = -(-L // decim)
    H = np.zeros((2 * L, E), np.complex64)
    for m in range(E):
        for k in range(taps):
            r = L + m * decim - k
            if 0 <= r < 2 * L:
                H[r, m] = h[k]
    return (np.ascontiguousarray(H.real.astype(np.float32)),
            np.ascontiguousarray(H.imag.astype(np.float32)))


def _rotate(i_pl, q_pl, phase_start, delta, n0: int):
    """NCO-rotate raw planes; sample k has global phase
    phase_start + delta*(n0 + k) (uint32 wrap, matching the Pallas
    kernel's int32 arithmetic)."""
    n = n0 + jax.lax.broadcasted_iota(jnp.int32, (1, i_pl.shape[-1]), 1)
    p0 = jax.lax.bitcast_convert_type(jnp.asarray(phase_start, jnp.uint32),
                                      jnp.int32)
    d = jax.lax.bitcast_convert_type(jnp.asarray(delta, jnp.uint32),
                                     jnp.int32)
    ang = (p0 + d * n).astype(jnp.float32) * _PHASE_SCALE
    c, s = jnp.cos(ang), jnp.sin(ang)
    return i_pl * c - q_pl * s, i_pl * s + q_pl * c


def _front_end_local(params, cfg, n_sp: int, t_local: int, use_pallas: bool,
                     tile_c: int, interpret: bool,
                     phase0, carry, i_plane, q_plane):
    """Per-device front end: runs inside shard_map.

    i/q planes: (C_local, T_local) f32 RAW; carry: (C_local, 2, taps-1)
    f32 RAW IQ (re/im stacked); phase0: (C_local,) uint32 (uniform).
    Returns the decimated front output (real f32 for SSB/CW via the
    kernel's real_out fast path, complex64 otherwise).
    """
    taps = params.front_fir_re.shape[-1]
    L = taps - 1
    decim = ((cfg.decim if cfg.use_ref_front else 1)
             if cfg.mode == "fm" else cfg.decim)
    E = -(-L // decim)
    sp_idx = jax.lax.axis_index("sp")
    delta = jnp.asarray(params.nco_delta)
    translating = bool(np.asarray(params.nco_delta) != 0)
    # ref two-stage front: stage A stays complex; the Hilbert combine
    # (stage B) runs channel-sharded inside demod_and_post after the
    # reshard, where time is unsharded — no extra halo exchange needed
    real_out = (cfg.mode in ("usb", "lsb", "cw")
                and params.front2_re is None)
    h_np = (np.asarray(params.front_fir_re)
            + 1j * np.asarray(params.front_fir_im))

    # global phase of local sample 0 (uint32 wrap-exact)
    shard_phase = phase0[0] + delta * (sp_idx.astype(jnp.uint32)
                                       * jnp.uint32(t_local))

    # ---- 1. halo exchange of RAW IQ tails (right-shift ppermute).
    # Issued first; the body below does not depend on it, so XLA overlaps
    # the ICI transfer with the body kernel. ----
    tail = jnp.stack([i_plane[..., -L:], q_plane[..., -L:]], axis=-2)
    if n_sp > 1:
        halo = jax.lax.ppermute(tail, "sp",
                                [(i, i + 1) for i in range(n_sp - 1)])
    else:
        halo = jnp.zeros_like(tail)
    hist = jnp.where(sp_idx == 0, carry, halo)      # (C, 2, L) raw

    # ---- 2. body: full shard with ZERO history; outputs [E:) exact ----
    if use_pallas:
        zero_c = jnp.zeros((i_plane.shape[0], L), jnp.complex64)
        body, _ = pallas_fir.fir_decimate_pallas(
            h_np, zero_c, jax.lax.complex(i_plane, q_plane), decim,
            tile_c=tile_c, tile_t=256,
            nco=(shard_phase, delta) if translating else None,
            # delta is compile-time here (params.nco_delta is numpy) —
            # engage the rotor-plane fast path (r5, pallas/fir)
            nco_static_delta=(int(params.nco_delta) if translating
                              else None),
            real_out=real_out, interpret=interpret)
    else:
        if translating:
            ir, qi = _rotate(i_plane, q_plane, shard_phase, delta, 0)
        else:
            ir, qi = i_plane, q_plane
        z = jax.lax.complex(ir, qi)
        h = jax.lax.complex(jnp.asarray(params.front_fir_re),
                            jnp.asarray(params.front_fir_im))
        zpad = jnp.zeros(z.shape[:-1] + (L,), z.dtype)
        xfull = jnp.concatenate([zpad, z], axis=-1)
        body = fir._conv_valid_fft(xfull, h, t_local)[..., ::decim]
        if real_out:
            body = jnp.real(body)

    # ---- 3. edge: first E outputs from [hist, local head] ----
    if translating:
        hr, hq = _rotate(hist[..., 0, :], hist[..., 1, :],
                         shard_phase, delta, -L)
        er, eq = _rotate(i_plane[..., :L], q_plane[..., :L],
                         shard_phase, delta, 0)
    else:
        hr, hq = hist[..., 0, :], hist[..., 1, :]
        er, eq = i_plane[..., :L], q_plane[..., :L]
    slab_r = jnp.concatenate([hr, er], axis=-1)     # (C, 2L)
    slab_i = jnp.concatenate([hq, eq], axis=-1)
    Hr, Hi = _edge_tap_matrices(h_np, decim)
    Hr = jnp.asarray(Hr)
    Hi = jnp.asarray(Hi)
    edge_r = slab_r @ Hr - slab_i @ Hi              # (C, E)
    if real_out:
        edge = edge_r
    else:
        edge = jax.lax.complex(edge_r, slab_r @ Hi + slab_i @ Hr)
        if body.dtype != edge.dtype:
            edge = edge.astype(body.dtype)

    return jnp.concatenate([edge, body[..., E:]], axis=-1)


def make_sharded_rx(cfg: rx_chain.RxConfig, mesh: jax.sharding.Mesh,
                    n_channels: int | None = None):
    """Build a jitted sharded RX step.

    Returns (step, init_state_fn) where
      step(state, i_plane, q_plane) -> (audio, new_state)
    with i/q (C, T) f32 sharded (dp, sp); audio (C, T) f32.

    The state is the FULL `chain.rx.RxState`, and everything after the
    halo-exchanged front end runs through `chain.rx.demod_and_post` — the
    sharded pipeline supports every mode and post-chain feature (SAM/FM,
    NR, blanker, notch, EQ) the single-chip chain does, channel-parallel
    over the whole device set.
    """
    assert not cfg.iq_auto_correction, (
        "the Moseley-Slump estimator is a sequential recurrence over "
        "sub-blocks and cannot be time-sharded; apply manual iq_gain/"
        "iq_phase calibration in sharded mode")
    assert cfg.mode != "ssbstereo", (
        "ssbstereo expands a (2,) sideband axis inside the chain; run it "
        "channel-sharded via the single-chip chain under pjit instead")
    params = rx_chain.make_params(cfg)
    n_sp = mesh.shape["sp"]
    n_dp = mesh.shape["dp"]
    taps = params.front_fir_re.shape[-1]
    decim = ((cfg.decim if cfg.use_ref_front else 1)
             if cfg.mode == "fm" else cfg.decim)
    chan_shard = mesh_mod.channel_sharding(mesh)
    grid_shard = mesh_mod.grid_sharding(mesh)
    all_chan = jax.sharding.NamedSharding(mesh, P(("dp", "sp"), None))

    def _resolve_pallas(C_local: int, t_local: int):
        if cfg.front_impl == "xla":
            return False, 8, False
        tmax = 128 // pallas_fir.TILE_C_DIV
        tile_c = next((tc for tc in (tmax, 8) if C_local % tc == 0), None)
        tiles = (tile_c is not None
                 and (t_local // decim) % 256 == 0
                 and 256 * decim >= -(-(taps - 1) // 128) * 128)
        if cfg.front_impl == "pallas":
            assert tiles, (C_local, t_local, taps, decim)
            # interpret mode lets the CPU suite exercise the kernel path
            return True, tile_c, jax.default_backend() == "cpu"
        return (tiles and jax.default_backend() != "cpu"), tile_c or 8, False

    # The step is TWO jits chained at the Python level, NOT one fused
    # module.  Measured on v5e (8192ch x 16k, 1x1 mesh): the fused
    # shard_map(Pallas front) + demod_and_post module compiles but runs
    # at 906 ms/block (vs 7.8 + 9.5 ms for the two pieces — an ~80x
    # XLA/Mosaic composition pathology; hand-built reduced compositions
    # of the same pair even hit Mosaic UNIMPLEMENTED errors).  Splitting
    # costs one extra dispatch and an HBM round-trip of the decimated
    # front output (~0.1 ms) and restores kernel-path throughput.
    def front_step(state: rx_chain.RxState, i_plane, q_plane):
        C, T = i_plane.shape
        t_local = T // n_sp
        L = taps - 1
        use_pallas, tile_c, interpret = _resolve_pallas(C // n_dp, t_local)
        front = jax.shard_map(
            functools.partial(_front_end_local, params, cfg, n_sp, t_local,
                              use_pallas, tile_c, interpret),
            mesh=mesh,
            in_specs=(P("dp"), P("dp", None, None), P("dp", "sp"),
                      P("dp", "sp")),
            out_specs=P("dp", "sp"),
            check_vma=False,
        )
        zf = front(state.nco_phase, state.front_carry, i_plane, q_plane)
        # next-block carry: the global RAW input tail (a sharded slice —
        # no collective, no phase ramp)
        new_carry = jnp.stack([i_plane[..., -L:], q_plane[..., -L:]],
                              axis=-2)
        delta = jnp.asarray(params.nco_delta)
        new_phase = state.nco_phase + delta * jnp.uint32(T)
        if mesh.size > 1:
            # reshard: channels over the whole device set
            zf = jax.lax.with_sharding_constraint(zf, all_chan)
        return zf, new_phase, new_carry

    def post_step(state: rx_chain.RxState, zf, new_phase, new_carry):
        state = state._replace(nco_phase=new_phase, front_carry=new_carry)
        audio48, new_state, _ = rx_chain.demod_and_post(cfg, params, state, zf)
        return audio48, new_state

    if mesh.size > 1:
        jit_front = jax.jit(
            front_step,
            in_shardings=(None, grid_shard, grid_shard),
            out_shardings=(all_chan, None, None),
        )
        jit_post = jax.jit(
            post_step,
            out_shardings=(chan_shard, None),
        )
    else:
        # 1x1 mesh: sharding annotations are semantic no-ops but push
        # the executable down a dramatically slower axon dispatch path
        # (measured 175 vs ~7000 Msamples/s for the same computation);
        # plain jits restore kernel-path throughput
        jit_front = jax.jit(front_step)
        jit_post = jax.jit(post_step)

    def jit_step(state, i_plane, q_plane):
        zf, new_phase, new_carry = jit_front(state, i_plane, q_plane)
        return jit_post(state, zf, new_phase, new_carry)

    def init_state(n_channels: int):
        state = rx_chain.init_state(cfg, params, (n_channels,))
        # the sharded front end carries the FIR history as a stacked
        # (C, 2, taps-1) re/im f32 pair of RAW (pre-NCO) IQ
        state = state._replace(front_carry=jnp.zeros(
            (n_channels, 2, taps - 1), jnp.float32))

        # shard each state leaf on its channel axis (the first axis whose
        # size equals n_channels); leaves without one stay replicated
        def spec_for(leaf):
            spec = [None] * leaf.ndim
            for ax in range(leaf.ndim):
                if leaf.shape[ax] == n_channels:
                    spec[ax] = ("dp", "sp")
                    break
            return jax.sharding.NamedSharding(mesh, P(*spec))

        return jax.device_put(state, jax.tree.map(spec_for, state))

    return jit_step, init_state
