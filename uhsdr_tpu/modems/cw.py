"""CW receive: batched keying detection on TPU.

Reference: `CwDecode_RxProcessor` / `CW_Decode_exe`
(`cw/cw_decoder.c:383,160-310`): decimated audio is chopped into blocks of
``blocksize`` (default 88) samples @12 kHz; per block a Goertzel magnitude
at the sidetone frequency is computed (restarted each block), smoothed with
a one-pole (SIGNAL_TAU=0.1), compared against a fixed threshold (or the
fldigi-style decayavg auto-threshold), then debounced (two consecutive
equal samples required).

Signal->symbol runs here, fully batched:
  * the per-block Goertzel is a projection onto cos/sin vectors — one
    matmul over all blocks and channels;
  * the smoother is an associative-scan one-pole;
  * the two-sample debounce is a short scan at block cadence (~136 Hz).

The symbol->text stage (Guenther timing averages, character assembly) is
event-driven control logic at ~136 Hz/channel and runs on the host:
`modems.cw_text.CwTextDecoder` consumes the boolean keying stream this
module produces.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import iir

SIGNAL_TAU = 0.1


class CwRxParams(NamedTuple):
    fs: float
    target_freq: float
    blocksize: int          # samples per decision block (reference default 88)
    thresh: float           # fixed threshold on smoothed magnitude^2
    noisecancel: bool
    cos_v: np.ndarray       # (blocksize,) projection vectors
    sin_v: np.ndarray


def make_params(fs: float = 12000.0, target_freq: float = 700.0,
                blocksize: int = 88, thresh: float = 32000.0,
                noisecancel: bool = True) -> CwRxParams:
    n = np.arange(blocksize)
    w = 2 * np.pi * target_freq / fs
    return CwRxParams(fs, target_freq, blocksize, thresh, noisecancel,
                      np.cos(w * n).astype(np.float32),
                      np.sin(w * n).astype(np.float32))


class CwRxState(NamedTuple):
    siglevel: jnp.ndarray    # (...,) smoothed magnitude
    cw_state: jnp.ndarray    # (...,) bool current debounced state
    change: jnp.ndarray      # (...,) bool debounce pending flag


def init_state(batch_shape) -> CwRxState:
    return CwRxState(
        siglevel=jnp.zeros(batch_shape, jnp.float32),
        cw_state=jnp.zeros(batch_shape, bool),
        change=jnp.zeros(batch_shape, bool))


def keying_detect(params: CwRxParams, state: CwRxState, audio: jnp.ndarray):
    """audio: (..., T) at decimated rate, T % blocksize == 0.
    Returns (keying (..., n_blocks) bool, new_state)."""
    bs = params.blocksize
    T = audio.shape[-1]
    nblk = T // bs
    frames = audio[..., : nblk * bs].reshape(audio.shape[:-1] + (nblk, bs))
    zr = frames @ jnp.asarray(params.cos_v)
    zi = frames @ jnp.asarray(params.sin_v)
    mag2 = zr * zr + zi * zi

    # siglevel[n] = mag2[n]*TAU + (1-TAU)*mag2[n-1]  — the reference smooths
    # with the PREVIOUS raw magnitude (audio_driver-style leaky delay):
    # siglevel = siglevel*TAU + (1-TAU)*old, old = current mag2
    # i.e. y[n] = TAU*m[n] + (1-TAU)*m[n-1]  (an FIR, not IIR!)
    prev = jnp.concatenate([state.siglevel[..., None], mag2[..., :-1]],
                           axis=-1)
    sig = SIGNAL_TAU * mag2 + (1.0 - SIGNAL_TAU) * prev
    newstate = sig >= params.thresh

    if params.noisecancel:
        def step(carry, ns):
            cw, change = carry
            take = change
            cw2 = jnp.where(take, ns, cw)
            change2 = jnp.where(take, jnp.zeros_like(change), ns != cw2)
            return (cw2, change2), cw2

        ns_t = jnp.moveaxis(newstate, -1, 0)
        (cw_f, change_f), keyed = jax.lax.scan(
            step, (state.cw_state, state.change), ns_t, unroll=4)
        keying = jnp.moveaxis(keyed, 0, -1)
    else:
        keying = newstate
        cw_f = newstate[..., -1]
        change_f = state.change

    new_state = CwRxState(siglevel=mag2[..., -1], cw_state=cw_f,
                          change=change_f)
    return keying, new_state
