"""Sharded wideband channelizer: ONE wideband IQ stream, time-sharded
over the whole device set, split into M channel streams that come out
channel-sharded — the scale-out form of `parallel/fleet.WidebandFleet`.

This is the same overlap-save seam as the sharded RX front end
(`rx_sharded.py`, SURVEY §2.6): the analysis bank's streaming history
(K*M wideband samples — the polyphase branch FIR tails) becomes a halo
fetched from the left time-shard with a right-shift `ppermute` over ICI;
shard 0 consumes the carried block-boundary state.  After the bank, the
(M, T) channel grid reshards channels-over-devices (XLA inserts the
all-to-all) so the per-channel chains run channel-parallel, e.g. through
`rx_sharded.make_sharded_rx` or per-group fleet chains.

The per-shard math reuses `ops/channelizer.AnalysisPfb.__call__`
verbatim: its carry argument IS the halo.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops import channelizer as chz

P = jax.sharding.PartitionSpec


def _local_bank(bank: chz.AnalysisPfb, n_shards: int, carry, i_loc, q_loc):
    """Runs inside shard_map over the flattened ('dp','sp') axis pair.

    carry: (2, K*M) f32 re/im (only shard 0 uses it); i/q_loc: (B_local,).
    """
    KM = bank.taps_per_branch * bank.n_channels
    idx = jax.lax.axis_index(("dp", "sp"))
    x = jax.lax.complex(i_loc, q_loc)
    tail = x[..., -KM:]
    halo = jax.lax.ppermute(tail, ("dp", "sp"),
                            [(i, i + 1) for i in range(n_shards - 1)])
    carry_z = jax.lax.complex(carry[0], carry[1])
    hist = jnp.where(idx == 0, carry_z, halo)
    y, _ = bank(hist, x)                     # (M, B_local // M)
    return jnp.real(y), jnp.imag(y)


def make_sharded_channelizer(n_channels: int, mesh: jax.sharding.Mesh,
                             taps_per_branch: int = 12,
                             prototype=None):
    """Build a jitted time-sharded analysis bank over `mesh`.

    Returns (step, init_carry, bank) where
      step(carry, i_wide, q_wide) -> (i_ch, q_ch, new_carry)
    with i/q_wide (B,) f32 time-sharded over all devices
    (B % (P*M) == 0 and B/P >= K*M so the halo is one whole left-
    neighbor tail), and i/q_ch (M, B//M) f32 channel-sharded.
    """
    bank = chz.AnalysisPfb(n_channels, prototype=prototype,
                           taps_per_branch=taps_per_branch)
    M, KM = bank.n_channels, bank.taps_per_branch * bank.n_channels
    n_shards = mesh.devices.size
    time_shard = jax.sharding.NamedSharding(mesh, P(("dp", "sp")))
    chan_shard = jax.sharding.NamedSharding(mesh, P(("dp", "sp"), None))

    def step(carry, i_wide, q_wide):
        B = i_wide.shape[-1]
        assert B % (n_shards * M) == 0, (B, n_shards, M)
        assert B // n_shards >= KM, (
            f"per-shard block {B // n_shards} < halo {KM} "
            f"(= taps_per_branch * n_channels); use longer blocks or "
            f"fewer taps")
        local = jax.shard_map(
            functools.partial(_local_bank, bank, n_shards),
            mesh=mesh,
            in_specs=(P(None, None), P(("dp", "sp")), P(("dp", "sp"))),
            out_specs=(P(None, ("dp", "sp")), P(None, ("dp", "sp"))),
            check_vma=False,
        )
        i_ch, q_ch = local(carry, i_wide, q_wide)
        # next-block carry: global wideband tail (a sharded slice, no
        # collective needed — same trick as rx_sharded)
        new_carry = jnp.stack([i_wide[..., -KM:], q_wide[..., -KM:]])
        # reshard for the channel-parallel chains downstream
        i_ch = jax.lax.with_sharding_constraint(i_ch, chan_shard)
        q_ch = jax.lax.with_sharding_constraint(q_ch, chan_shard)
        return i_ch, q_ch, new_carry

    jit_step = jax.jit(step, in_shardings=(None, time_shard, time_shard),
                       out_shardings=(chan_shard, chan_shard, None))

    def init_carry():
        return jnp.zeros((2, KM), jnp.float32)

    return jit_step, init_carry, bank
