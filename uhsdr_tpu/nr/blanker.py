"""LPC impulse noise blanker ("alternate noise blanking").

Reference: `alt_noise_blanking` (`audio_nr.c:2210-2536`) — per 128-sample
frame at the decimated rate:

1. order-10 autocorrelation of the frame (with carried boundary context);
2. Levinson-Durbin -> prediction-error filter ``e = (1, a1..a10)``;
3. whitening (inverse) filtering with reversed ``e`` then matched
   filtering with ``e`` — impulses stand out of the whitened residual;
4. detection threshold ``(16 - nb_setting) * 0.5 * sqrt(var * P)`` with
   ``P = sum(e[0:order]^2)`` — the reference's ``arm_power_f32(lpcs,
   order, ...)`` (`audio_nr.c:2435`) sums the FIRST `order` coefficients
   (including the leading 1, excluding e[order])
   (`audio_nr.c:2439-2444`);
5. up to 5 impulse positions per frame (the reference scans sequentially
   and skips PL samples after each hit, `audio_nr.c:2446-2460`);
6. each hit is repaired over ``impulse_length = 7`` samples by combining
   an order-10 *forward* LPC prediction (from the 10 samples before) and
   a *backward* prediction (from the 10 samples after), linearly
   cross-faded (`audio_nr.c:2462-2523`).

The reference keeps a 154-sample static ``working_buffer`` whose head is
the previous frame's tail; the output frame is read at offset
``order+PL`` — i.e. the blanker delays audio by 13 samples and repairs
may straddle frame boundaries.  Here that buffer is an explicit carry and
frames advance under `lax.scan`, preserving the exact alignment.

TPU-first re-design (batched channels, no data-dependent shapes):

* autocorrelation and the two 11-tap filters are shift-and-multiply sums
  (fully parallel over channels);
* Levinson-Durbin is a fixed 10-step Python loop of vector ops;
* the sequential scan-with-skip detector becomes: threshold mask AND
  local-max within a +-PL window (same survivors for impulses separated
  by more than PL samples), then rank-limit to the first 5 by position;
* repair slots are a static (5,) axis: gather context, run the fixed
  7-step prediction recurrences, scatter back with one-hot masks —
  empty slots carry zero weight.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

FRAME = 128          # reference NR_FFT_SIZE
ORDER = 10           # LPC order
IMPULSE_LEN = 7      # repaired samples per impulse (odd)
PL = (IMPULSE_LEN - 1) // 2
MAX_IMPULSES = 5
CONTEXT = 2 * ORDER + 2 * PL   # carried history (26)
WB = CONTEXT + FRAME           # working-buffer length (154)
DELAY = ORDER + PL             # output delay in samples (13)


class NbParams(NamedTuple):
    threshold_mult: np.float32   # (16 - nb_setting) * 0.5


def make_params(nb_setting: int = 8) -> NbParams:
    """nb_setting 0..15 (larger = more aggressive), reference
    `ts.dsp.nb_setting` (`audio_nr.c:2434`)."""
    return NbParams(threshold_mult=np.float32((16 - nb_setting) * 0.5))


class NbState(NamedTuple):
    context: jnp.ndarray    # (..., CONTEXT) repaired tail of prev frame


def init_state(batch_shape) -> NbState:
    return NbState(context=jnp.zeros(tuple(batch_shape) + (CONTEXT,),
                                     jnp.float32))


def _autocorr(x: jnp.ndarray, order: int) -> jnp.ndarray:
    """R[i] = sum_n x[n] x[n+i], i = 0..order, over the last axis."""
    n = x.shape[-1]
    rs = [jnp.sum(x * x, axis=-1)]
    for i in range(1, order + 1):
        rs.append(jnp.sum(x[..., :n - i] * x[..., i:], axis=-1))
    return jnp.stack(rs, axis=-1)    # (..., order+1)


def _levinson(R: jnp.ndarray, order: int) -> jnp.ndarray:
    """Levinson-Durbin: R (..., order+1) -> prediction-error filter
    coefficients (..., order+1) with [..., 0] == 1.

    Matches the reference's in-place variant (`audio_nr.c:2393-2421`)
    including the 1e-9 diagonal loading of R[0]."""
    R = R.at[..., 0].multiply(1.0 + 1e-9)
    a = [jnp.ones_like(R[..., 0])] + [jnp.zeros_like(R[..., 0])
                                      for _ in range(order)]
    alfa = R[..., 0]
    for m in range(1, order + 1):
        s = R[..., m]
        for i in range(1, m):
            s = s + a[i] * R[..., m - i]
        k = -s / jnp.maximum(alfa, 1e-30)
        new_a = [a[0]]
        for i in range(1, m):
            new_a.append(a[i] + k * a[m - i])
        new_a.append(k)
        for i in range(m + 1, order + 1):
            new_a.append(a[i])
        a = new_a
        alfa = alfa * (1.0 - k * k)
    return jnp.stack(a, axis=-1)     # (..., order+1)


def _fir_along_last(x: jnp.ndarray, h: jnp.ndarray, taps: int) -> jnp.ndarray:
    """y[n] = sum_k h[..., k] * x[..., n - k] with zero initial history
    (the reference re-inits the FIR state every frame); per-batch taps."""
    n = x.shape[-1]
    y = jnp.zeros_like(x)
    for k in range(taps):
        xk = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(k, 0)])[..., :n]
        y = y + h[..., k, None] * xk
    return y


def _sliding_abs_max(x: jnp.ndarray, half: int) -> jnp.ndarray:
    """max |x| over a +-half window along the last axis."""
    a = jnp.abs(x)
    m = a
    for s in range(1, half + 1):
        left = jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(s, 0)])[..., :a.shape[-1]]
        right = jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, s)])[..., s:]
        m = jnp.maximum(m, jnp.maximum(left, right))
    return m


def _process_frame(params: NbParams, buf: jnp.ndarray) -> jnp.ndarray:
    """buf: (..., WB) working buffer (carried context ++ new frame).
    Returns the repaired working buffer (..., WB)."""
    N = FRAME

    # --- LPC of the frame (reference autocorrelates working_buffer from
    # offset order+PL over Nsam samples, `audio_nr.c:2383-2387`) ---
    seg = buf[..., DELAY: DELAY + N]
    R = _autocorr(seg, ORDER)
    e = _levinson(R, ORDER)                      # (..., 11) error filter
    e_rev = jnp.flip(e, axis=-1)

    # --- whiten + matched filter (`audio_nr.c:2429-2437`) ---
    # x[n] = buf[DELAY+n]; the e_rev*e cascade peaks ORDER samples after
    # an impulse, so detection index n maps the repair-window *start*
    # directly to buf coordinate n (reference: positions stored as
    # search_pos - order, written at working_buffer[order + p]).
    x = buf[..., DELAY:]
    tmp = _fir_along_last(x, e_rev, ORDER + 1)
    tmp = _fir_along_last(tmp, e, ORDER + 1)
    tmp = tmp[..., :N]                            # detection signal

    sigma2 = jnp.var(tmp, axis=-1, ddof=1)   # arm_var_f32 divides by N-1
    lpc_power = jnp.sum(e[..., :ORDER] ** 2, axis=-1)
    thr = params.threshold_mult * jnp.sqrt(
        jnp.maximum(sigma2 * lpc_power, 1e-30))

    # --- impulse candidates: above threshold AND local max in +-PL ---
    athr = jnp.abs(tmp) > thr[..., None]
    ismax = jnp.abs(tmp) >= _sliding_abs_max(tmp, PL)
    cand = athr & ismax
    # reference scans search_pos in [order+PL, N): same lower bound here
    pos_idx = jnp.arange(N)
    cand = cand & (pos_idx >= DELAY)
    rank = jnp.cumsum(cand.astype(jnp.int32), axis=-1) - 1
    cand = cand & (rank < MAX_IMPULSES)

    def slot_positions(c):
        # c: (N,) bool -> (MAX_IMPULSES,) start positions or -1
        r = jnp.cumsum(c.astype(jnp.int32)) - 1
        onehots = (c[None, :] &
                   (r[None, :] == jnp.arange(MAX_IMPULSES)[:, None]))
        found = onehots.any(axis=-1)
        pos = jnp.argmax(onehots, axis=-1)
        return jnp.where(found, pos, -1)

    flat_c = cand.reshape((-1, N))
    slots = jax.vmap(slot_positions)(flat_c)       # (B, MAX_IMPULSES)
    B = flat_c.shape[0]
    fbuf = buf.reshape((B, WB))

    # --- repair (`audio_nr.c:2462-2523`): window = buf[start..start+6],
    # forward context buf[start-10..start-1], backward context
    # buf[start+7..start+16] ---
    a_pred = -e[..., 1:]                           # prediction coeffs
    a_flat = a_pred.reshape((B, ORDER))

    def repair_one(fb, af, start):
        ok = start >= 0
        st = jnp.maximum(start, ORDER)             # safe gather base
        fwd_ctx = jax.lax.dynamic_slice(fb, (st - ORDER,), (ORDER,))
        bwd_ctx = jax.lax.dynamic_slice(fb, (st + IMPULSE_LEN,), (ORDER,))

        def fwd_step(ctx, _):
            nxt = jnp.dot(ctx[::-1], af)           # -sum e[j] x[n-j]
            return jnp.concatenate([ctx[1:], nxt[None]]), nxt

        _, fwd = jax.lax.scan(fwd_step, fwd_ctx, None, length=IMPULSE_LEN)

        def bwd_step(ctx, _):
            nxt = jnp.dot(ctx, af)                 # -sum e[j] x[n+j]
            return jnp.concatenate([nxt[None], ctx[:-1]]), nxt

        _, bwd = jax.lax.scan(bwd_step, bwd_ctx, None, length=IMPULSE_LEN)
        bwd = bwd[::-1]

        w_bwd = jnp.arange(IMPULSE_LEN, dtype=jnp.float32) / (IMPULSE_LEN - 1)
        rep = (1.0 - w_bwd) * fwd + w_bwd * bwd
        idx = st + jnp.arange(IMPULSE_LEN)
        okf = jnp.where(ok, 1.0, 0.0)
        mask = jnp.zeros_like(fb).at[idx].set(okf)
        vals = jnp.zeros_like(fb).at[idx].set(okf * rep)
        return mask, vals

    def repair_channel(fb, af, ps):
        # SEQUENTIAL repair, like the reference's in-place writes into
        # working_buffer (audio_nr.c:2473-2523): when repair windows
        # overlap (impulses can sit as close as PL+1 < IMPULSE_LEN
        # apart), the later window OVERWRITES the earlier one's samples
        # and its predictions read the already-repaired context.  Slots
        # are in ascending-position order (cumsum ranking), matching the
        # reference's left-to-right scan.
        out = fb
        for k in range(MAX_IMPULSES):
            mask, vals = repair_one(out, af, ps[k])
            out = out * (1.0 - mask) + vals
        return out

    fixed = jax.vmap(repair_channel)(fbuf, a_flat, slots)
    return fixed.reshape(buf.shape)


def process_block(params: NbParams, state: NbState, x: jnp.ndarray):
    """x: (..., T) with T % FRAME == 0.  Returns (y, new_state); the
    output is delayed DELAY (=13) samples like the reference."""
    T = x.shape[-1]
    assert T % FRAME == 0, "block length must be a multiple of 128"
    nfr = T // FRAME
    bs = x.shape[:-1]

    frames = jnp.moveaxis(
        x.reshape(bs + (nfr, FRAME)), -2, 0)       # (nfr, ..., FRAME)

    def step(ctx, frame):
        buf = jnp.concatenate([ctx, frame], axis=-1)
        fixed = _process_frame(params, buf)
        out = fixed[..., DELAY: DELAY + FRAME]
        return fixed[..., FRAME:], out

    new_ctx, outs = jax.lax.scan(step, state.context, frames)
    y = jnp.moveaxis(outs, 0, -2).reshape(bs + (T,))
    return y, NbState(context=new_ctx)
