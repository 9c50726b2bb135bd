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
    atc: bool               # fldigi-style auto-threshold ("use_3_goertzels")
    cos_v: np.ndarray       # (blocksize,) projection vectors
    sin_v: np.ndarray


def make_params(fs: float = 12000.0, target_freq: float = 700.0,
                blocksize: int = 88, thresh: float = 32000.0,
                noisecancel: bool = True, atc: bool = False) -> CwRxParams:
    n = np.arange(blocksize)
    w = 2 * np.pi * target_freq / fs
    return CwRxParams(fs, target_freq, blocksize, thresh, noisecancel, atc,
                      np.cos(w * n).astype(np.float32),
                      np.sin(w * n).astype(np.float32))


class CwRxState(NamedTuple):
    siglevel: jnp.ndarray    # (...,) smoothed magnitude
    cw_state: jnp.ndarray    # (...,) bool current debounced state
    change: jnp.ndarray      # (...,) bool debounce pending flag
    env: jnp.ndarray         # (...,) ATC signal envelope (decayavg)
    noise: jnp.ndarray       # (...,) ATC noise floor (decayavg)


def init_state(batch_shape) -> CwRxState:
    return CwRxState(
        siglevel=jnp.zeros(batch_shape, jnp.float32),
        cw_state=jnp.zeros(batch_shape, bool),
        change=jnp.zeros(batch_shape, bool),
        env=jnp.zeros(batch_shape, jnp.float32),
        noise=jnp.zeros(batch_shape, jnp.float32))


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

    env_f = state.env
    noise_f = state.noise
    if params.atc:
        # fldigi-style automatic threshold ("use_3_goertzels" path,
        # CW_Decode_exe cw_decoder.c:256-283): fast-attack/slow-decay
        # envelope and noise-floor decayavg trackers, clipped magnitude,
        # decision statistic v1 = (clip-noise)*(env-noise) -
        # 0.8*(env-noise)^2, TAU-smoothed against the previous v1,
        # keyed when >= 0.  Data-dependent weights make this a (short,
        # block-cadence ~136 Hz) scan.
        w_fast = np.float32(max(params.thresh / 1000.0 / 4.0, 1.0))
        w_env = np.float32(max(params.thresh / 1000.0 * 16.0, 1.0))
        w_noise = np.float32(max(params.thresh / 1000.0 * 48.0, 1.0))

        def atc_step(carry, m):
            env, noise, old = carry
            env = env + (m - env) / jnp.where(m > env, w_fast, w_env)
            noise = noise + (m - noise) / jnp.where(m < noise, w_fast,
                                                    w_noise)
            clipped = jnp.clip(m, noise, env)
            span = env - noise
            v1 = (clipped - noise) * span - 0.8 * span * span
            sig = SIGNAL_TAU * v1 + (1.0 - SIGNAL_TAU) * old
            return (env, noise, v1), sig >= 0.0

        m_t = jnp.moveaxis(mag2, -1, 0)
        (env_f, noise_f, v1_last), ns_seq = jax.lax.scan(
            atc_step, (state.env, state.noise, state.siglevel), m_t,
            unroll=4)
        newstate = jnp.moveaxis(ns_seq, 0, -1)
    else:
        # siglevel[n] = mag2[n]*TAU + (1-TAU)*mag2[n-1] — the reference
        # smooths with the PREVIOUS raw magnitude (leaky delay):
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

    sig_carry = v1_last if params.atc else mag2[..., -1]
    new_state = CwRxState(siglevel=sig_carry, cw_state=cw_f,
                          change=change_f, env=env_f, noise=noise_f)
    return keying, new_state
