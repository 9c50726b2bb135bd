"""Block-streaming runner: scan a chain over many blocks under ONE jit.

The reference's streaming contract is "the ISR calls the processor once
per 32-sample block forever" (`uhsdr_hw_i2s.c:126-160`).  The functional
equivalent is a `lax.scan` over a blocks axis: the chain step
``(state, block) -> (state, audio)`` composes with itself, so a long
capture runs as ONE device program instead of one dispatch per block —
amortizing host->device launch latency (which dominates at small blocks
on a remote-attached chip) and letting XLA pipeline across blocks.

Works with any (params-closed) step function whose state is a pytree —
RX chain, TX chain, or user compositions.
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np


def scan_blocks(step: Callable, state: Any, blocks, *extra):
    """Run `step(state, block, *extra) -> (out, new_state)` over a leading
    blocks axis via lax.scan.

    blocks: array (n_blocks, ..., block_len) or pytree of such.
    Returns (outs stacked (n_blocks, ...), final_state).
    """
    def body(carry, blk):
        out, new_state = step(carry, blk, *extra)
        return new_state, out

    final_state, outs = jax.lax.scan(body, state, blocks)
    return outs, final_state


class StreamRunner:
    """Jitted multi-block runner around an RxChain-style step.

    Usage:
        runner = StreamRunner(lambda st, i, q: chain_step(st, i, q))
        audio, state = runner.run(state, i_blocks, q_blocks)
    where i_blocks/q_blocks are (n_blocks, channels, block_len) f32.
    """

    def __init__(self, step: Callable):
        self._step = step

        @jax.jit
        def _run(state, i_blocks, q_blocks):
            def body(carry, iq):
                i_b, q_b = iq
                out, new_state = self._step(carry, i_b, q_b)
                return new_state, out

            final_state, outs = jax.lax.scan(body, state,
                                             (i_blocks, q_blocks))
            return outs, final_state

        self._jit = _run

    def run(self, state, i_blocks: np.ndarray, q_blocks: np.ndarray):
        return self._jit(state, jnp.asarray(i_blocks),
                         jnp.asarray(q_blocks))


def chunk_capture(i_plane: np.ndarray, q_plane: np.ndarray,
                  block_len: int):
    """Split (..., T) planes into (n_blocks, ..., block_len), dropping the
    partial tail (block lengths must divide the decimation chain)."""
    T = i_plane.shape[-1]
    n = T // block_len
    shp = i_plane.shape[:-1] + (n, block_len)
    i_b = i_plane[..., : n * block_len].reshape(shp)
    q_b = q_plane[..., : n * block_len].reshape(shp)
    # blocks axis to the front
    return (np.moveaxis(i_b, -2, 0), np.moveaxis(q_b, -2, 0))
