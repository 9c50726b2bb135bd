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


@dataclass
class _Group:
    cfg: rx.RxConfig
    chain: rx.RxChain
    state: object
    channel_idx: np.ndarray     # global channel numbers of this group


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
        chip.  Groups are dispatched back-to-back so XLA pipelines them.
        """
        outs = []
        for g, (gi, gq) in zip(self.groups, planes):
            audio, g.state, _ = g.chain(g.state, i=gi, q=gq)
            outs.append(audio)
        return outs

    @property
    def group_sizes(self) -> dict[str, int]:
        return {f"{g.cfg.mode}/{g.cfg.bw_key}": g.channel_idx.size
                for g in self.groups}
