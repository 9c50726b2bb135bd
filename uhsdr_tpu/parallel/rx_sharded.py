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
from ..ops import fir, nco
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
    params = rx_chain.make_params(cfg)
    n_sp = mesh.shape["sp"]
    taps = params.front_fir_re.shape[-1]
    chan_shard = mesh_mod.channel_sharding(mesh)
    grid_shard = mesh_mod.grid_sharding(mesh)
    all_chan = jax.sharding.NamedSharding(mesh, P(("dp", "sp"), None))

    def step(state: rx_chain.RxState, i_plane, q_plane):
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
        zf, _ = front(state.nco_phase, state.front_carry, i_plane, q_plane)
        # next-block carry: global post-NCO input tail == mix of raw tail
        # with the *final* phase ramp — recompute cheaply outside:
        delta = jnp.asarray(params.nco_delta)
        tail_ph = nco.phase_ramp(
            state.nco_phase + delta * jnp.uint32(T - (taps - 1)),
            delta, taps - 1)
        z_tail = (jax.lax.complex(i_plane[..., -(taps - 1):],
                                  q_plane[..., -(taps - 1):])
                  * jnp.exp(jax.lax.complex(jnp.zeros_like(tail_ph), tail_ph)))
        new_carry = jnp.stack([jnp.real(z_tail), jnp.imag(z_tail)], axis=-2)
        new_phase = state.nco_phase + delta * jnp.uint32(T)

        # ---- reshard: channels over the whole device set ----
        zf = jax.lax.with_sharding_constraint(zf, all_chan)

        # ---- demod + post (channel-parallel, shared with chain.rx) ----
        state = state._replace(nco_phase=new_phase, front_carry=new_carry)
        audio48, new_state, _ = rx_chain.demod_and_post(cfg, params, state, zf)
        return audio48, new_state

    jit_step = jax.jit(
        step,
        in_shardings=(None, grid_shard, grid_shard),
        out_shardings=(chan_shard, None),
    )

    def init_state(n_channels: int):
        state = rx_chain.init_state(cfg, params, (n_channels,))
        # the sharded front end carries the FIR history as a stacked
        # (C, 2, taps-1) re/im f32 pair instead of complex64
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
