"""Sharded RX pipeline over a (dp, sp) mesh.

Design (SURVEY §2.6 mapping):

  * The IQ front end (NCO mix + analytic-bandpass decimating FIR) is
    parallel in time, so it runs under `shard_map` with the (channels,
    time) grid sharded over (dp, sp).  The streaming-FIR history that the
    reference keeps in CMSIS `pState` arrays becomes a **halo**: each time
    shard needs the previous shard's last ``taps-1`` IQ samples, fetched
    with a right-shift `ppermute` over ICI; the first shard consumes the
    carried block-boundary state instead.

  * Everything after demodulation is per-channel sequential in time (AGC /
    PLL scans), so the pipeline reshards: channels spread over the *whole*
    device set ``P(('dp','sp'))``, time unsharded.  XLA inserts the
    all-to-all at the reshard point.

The streaming carry across blocks needs no collective at all: the new
front-FIR carry is simply the global input tail, a sharded slice.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..chain import rx as rx_chain
from ..demod import am as am_mod
from ..demod import sam as sam_mod
from ..demod import ssb as ssb_mod
from ..ops import agc as agc_mod
from ..ops import fir, iir, nco
from . import mesh as mesh_mod

P = jax.sharding.PartitionSpec


def _front_end_local(params, cfg, n_sp: int, t_local: int,
                     phase0, carry, i_plane, q_plane):
    """Per-device front end: runs inside shard_map.

    i/q planes: (C_local, T_local); carry: (C_local, taps-1) complex as
    re/im pair stacked (..., 2, taps-1); phase0: (C_local,) uint32.
    """
    taps = params.front_fir_re.shape[-1]
    sp_idx = jax.lax.axis_index("sp")
    z = jax.lax.complex(i_plane, q_plane)

    # NCO with per-shard phase offset: shard i starts t_local*i samples in
    delta = jnp.asarray(params.nco_delta)
    shard_phase = phase0 + delta * (sp_idx.astype(jnp.uint32)
                                    * jnp.uint32(t_local))
    ph = nco.phase_ramp(shard_phase, delta, t_local)
    z = z * jnp.exp(jax.lax.complex(jnp.zeros_like(ph), ph))

    # halo: previous shard's last taps-1 *post-NCO* samples.  NCO phase is
    # globally coherent (phase computed from global index), so we can
    # exchange post-NCO samples directly.
    tail = z[..., -(taps - 1):]
    halo = jax.lax.ppermute(tail, "sp",
                            [(i, i + 1) for i in range(n_sp - 1)])
    carry_z = jax.lax.complex(carry[..., 0, :], carry[..., 1, :])
    hist = jnp.where(sp_idx == 0, carry_z, halo)

    h = jax.lax.complex(jnp.asarray(params.front_fir_re),
                        jnp.asarray(params.front_fir_im))
    xfull = jnp.concatenate([hist, z], axis=-1)
    if cfg.decim > 1:
        y = fir._conv_valid_fft(xfull, h, t_local)[..., ::cfg.decim]
    else:
        y = fir._conv_valid_fft(xfull, h, t_local)
    # export this shard's post-NCO tail as the next-block carry candidate;
    # only the LAST sp shard's value is the true carry (selected outside).
    return y, jnp.stack([jnp.real(tail), jnp.imag(tail)], axis=-2)


def make_sharded_rx(cfg: rx_chain.RxConfig, mesh: jax.sharding.Mesh):
    """Build a jitted sharded RX step.

    Returns (step, init_state_fn) where
      step(state, i_plane, q_plane) -> (audio, new_state)
    with i/q (C, T) f32 sharded (dp, sp); audio (C, T) f32.
    """
    params = rx_chain.make_params(cfg)
    n_dp = mesh.shape["dp"]
    n_sp = mesh.shape["sp"]
    taps = params.front_fir_re.shape[-1]
    chan_shard = mesh_mod.channel_sharding(mesh)
    grid_shard = mesh_mod.grid_sharding(mesh)

    def step(state, i_plane, q_plane):
        C, T = i_plane.shape
        t_local = T // n_sp
        front = jax.shard_map(
            functools.partial(_front_end_local, params, cfg, n_sp, t_local),
            mesh=mesh,
            in_specs=(P("dp"), P("dp", None, None), P("dp", "sp"),
                      P("dp", "sp")),
            out_specs=(P("dp", "sp"), P("dp", None, None)),
            check_vma=False,
        )
        zf, _ = front(state["nco_phase"], state["front_carry"],
                      i_plane, q_plane)
        # next-block carry: global post-NCO input tail == mix of raw tail
        # with the *final* phase ramp — recompute cheaply outside:
        delta = jnp.asarray(params.nco_delta)
        tail_ph = nco.phase_ramp(
            state["nco_phase"] + delta * jnp.uint32(T - (taps - 1)),
            delta, taps - 1)
        z_tail = (jax.lax.complex(i_plane[..., -(taps - 1):],
                                  q_plane[..., -(taps - 1):])
                  * jnp.exp(jax.lax.complex(jnp.zeros_like(tail_ph), tail_ph)))
        new_carry = jnp.stack([jnp.real(z_tail), jnp.imag(z_tail)], axis=-2)
        new_phase = state["nco_phase"] + delta * jnp.uint32(T)

        # ---- reshard: channels over the whole device set ----
        zf = jax.lax.with_sharding_constraint(
            zf, jax.sharding.NamedSharding(mesh, P(("dp", "sp"), None)))

        # ---- demod + post at decimated rate (channel-parallel) ----
        if cfg.mode in ("usb", "lsb", "cw"):
            audio = ssb_mod.demod(zf)
            fade_state = state["fade"]
            sam_state = state["sam"]
        elif cfg.mode == "am":
            audio, fade_state = am_mod.demod(zf, params.fade, state["fade"],
                                             cfg.fade_leveler)
            sam_state = state["sam"]
        elif cfg.mode == "sam":
            audio, _, sam_state = sam_mod.demod(params.sam, state["sam"], zf,
                                                sideband=cfg.sam_sideband,
                                                fade_leveler_on=cfg.fade_leveler)
            fade_state = state["fade"]
        else:
            raise ValueError(f"sharded pipeline: unsupported mode {cfg.mode}")

        audio, sos_state = iir.biquad_cascade_block(
            jnp.asarray(params.audio_sos), state["audio_sos_state"], audio)
        audio, agc_state = agc_mod.run(params.agc, state["agc"], audio)
        audio48, interp_carry = fir.fir_interpolate_block(
            jnp.asarray(params.interp_fir), state["interp_carry"], audio,
            cfg.decim)

        new_state = dict(state)
        new_state.update(nco_phase=new_phase, front_carry=new_carry,
                         audio_sos_state=sos_state, agc=agc_state,
                         fade=fade_state, sam=sam_state,
                         interp_carry=interp_carry)
        return audio48, new_state

    jit_step = jax.jit(
        step,
        in_shardings=(None, grid_shard, grid_shard),
        out_shardings=(chan_shard, None),
    )

    def init_state(n_channels: int):
        bs = (n_channels,)
        state = dict(
            nco_phase=jnp.zeros(bs, jnp.uint32),
            front_carry=jnp.zeros(bs + (2, taps - 1), jnp.float32),
            audio_sos_state=jnp.zeros((params.audio_sos.shape[0],) + bs + (2,),
                                      jnp.float32),
            agc=agc_mod.init_state(bs, params.agc),
            fade=am_mod.fade_leveler_init(bs),
            sam=sam_mod.init_state(bs),
            interp_carry=jnp.zeros(
                bs + (-(-params.interp_fir.shape[-1] // cfg.decim) - 1,),
                jnp.float32),
        )

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
