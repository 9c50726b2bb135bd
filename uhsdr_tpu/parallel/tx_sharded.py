"""Sharded TX pipeline — channel parallelism over the whole mesh.

Unlike RX (whose front end is FIR/NCO and therefore time-shardable with a
finite halo, `rx_sharded.py`), the TX chain starts with IIR voice biquads
and the ALC look-ahead recurrence (`chain/tx.py`), whose state has
*infinite* memory — a time shard would need the exact filter state at its
left edge, which depends on every earlier sample.  The idiomatic sharding
for TX is therefore pure channel parallelism: thousands of independent
transmit channels spread over every device, each running the full chain
locally with zero collectives (reference mapping: SURVEY §2.6 "channel
batching").
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..chain import tx as tx_chain
from . import mesh as mesh_mod

P = jax.sharding.PartitionSpec


def make_sharded_tx(cfg: tx_chain.TxConfig, mesh: jax.sharding.Mesh):
    """Returns (step, init_state_fn):
      step(state, audio) -> (i_plane, q_plane, new_state)
    with audio (C, T) f32 channel-sharded over all mesh axes."""
    params = tx_chain.make_params(cfg)
    chan = mesh_mod.channel_sharding(mesh)
    chan_t = jax.sharding.NamedSharding(mesh, P(("dp", "sp"), None))

    def step(state, audio):
        iq, new_state, _ = tx_chain.process_block(cfg, params, state, audio)
        return jnp.real(iq), jnp.imag(iq), new_state

    jit_step = jax.jit(step, in_shardings=(None, chan_t),
                       out_shardings=(chan_t, chan_t, None))

    def init_state(n_channels: int):
        state = tx_chain.init_state(cfg, params, (n_channels,))

        def spec_for(leaf):
            spec = [None] * leaf.ndim
            for ax in range(leaf.ndim):
                if leaf.shape[ax] == n_channels:
                    spec[ax] = ("dp", "sp")
                    break
            return jax.sharding.NamedSharding(mesh, P(*spec))

        return jax.device_put(state, jax.tree.map(spec_for, state))

    return jit_step, init_state
