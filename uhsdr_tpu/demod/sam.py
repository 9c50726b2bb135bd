"""Synchronous-AM (SAM) demodulation — Wheatley/cuteSDR + WDSP PLL.

Reference: `AudioDriver_DemodSAM` (`audio_driver.c:2022-2166`) and parameter
setup `AudioDriver_SetSamPllParameters` (`audio_driver.c:709-746`).

Per-sample reference behavior:
  1. NCO mix by the PLL phase: ``corr = (i + jq) * exp(-j*phs)``.
  2. Phase detector ``atan2(Im corr, Re corr)``; 2nd-order loop
     ``omega2 += g2*err`` (clamped to ±2π·pll_fmax/fs),
     ``fil_out = g1*err + omega2``, ``phs += fil_out_prev``.
  3. Sideband separation: 4 paths (delayed(ai), bi, delayed(bq), aq) each
     through a 7-stage cascade of 2nd-order allpasses
     ``y[n] = c*x[n] + x[n-2] - c*y[n-2]`` (coefficient sets c0/c1,
     `audio_driver.c:1932-1953`), combined USB/LSB/stereo.
  4. Fade leveler (see demod.am).

TPU-first split: only step 2 is truly sequential — it runs as a small
`lax.scan` whose state is 3 scalars/channel.  Given phs[n], the mixing is
vectorized, and each allpass stage is a z^-2 biquad (b=[c,0,1], a=[1,0,c])
run by the parallel associative-scan biquad — no per-sample Python-level
loop anywhere.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import iir
from . import am

# sideband-separation allpass coefficients (values from the public
# WDSP/cuteSDR phase-splitter design, as used by the reference)
C0 = np.array([
    -0.328201924180698, -0.744171491539427, -0.923022915444215,
    -0.978490468768238, -0.994128272402075, -0.998458978159551,
    -0.999790306259206], np.float32)
C1 = np.array([
    -0.0991227952747244, -0.565619728761389, -0.857467122550052,
    -0.959123933111275, -0.988739372718090, -0.996959189310611,
    -0.999282492800792], np.float32)

N_STAGES = 7


class SamParams(NamedTuple):
    g1: jnp.ndarray
    g2: jnp.ndarray
    omega_min: jnp.ndarray
    omega_max: jnp.ndarray
    fade: am.FadeLevelerParams


def make_params(fs: float, zeta: float = 0.6, omegaN: float = 200.0,
                pll_fmax: float = 500.0) -> SamParams:
    """PLL presets (reference comments): DX 0.2/70, medium 0.6/200, fast 1.0/500."""
    g1 = 1.0 - np.exp(-2.0 * omegaN * zeta / fs)
    g2 = -g1 + 2.0 * (1 - np.exp(-omegaN * zeta / fs)
                      * np.cos(omegaN / fs * np.sqrt(1.0 - zeta * zeta)))
    om = 2.0 * np.pi * pll_fmax / fs
    return SamParams(
        g1=np.float32(g1), g2=np.float32(g2),
        omega_min=np.float32(-om), omega_max=np.float32(om),
        fade=am.fade_leveler_params(fs),
    )


class SamState(NamedTuple):
    phs: jnp.ndarray       # (...,) PLL phase
    fil_out: jnp.ndarray   # (...,) loop filter output (applied next sample)
    omega2: jnp.ndarray    # (...,) frequency estimate
    # allpass biquad states per path: (4, N_STAGES, ..., 2)
    ap_state: jnp.ndarray
    ds: jnp.ndarray        # (..., 2) one-sample delays [ai, bq]
    fade: am.FadeLevelerState


def init_state(batch_shape, n_audio: int = 1) -> SamState:
    """n_audio=2 for SAM_SIDEBAND_STEREO (two-channel audio out,
    `audio_driver.c:2092-2095`): the fade leveler then runs per audio
    channel (NUM_AUDIO_CHANNELS loop, `audio_driver.c:2108`)."""
    z = jnp.zeros(batch_shape, jnp.float32)
    fade_shape = tuple(batch_shape) + ((n_audio,) if n_audio > 1 else ())
    return SamState(
        phs=z, fil_out=z, omega2=z,
        ap_state=jnp.zeros((4, N_STAGES) + tuple(batch_shape) + (2,), jnp.float32),
        ds=jnp.zeros(tuple(batch_shape) + (2,), jnp.float32),
        fade=am.fade_leveler_init(fade_shape),
    )


def _pll_scan(params: SamParams, state: SamState, iq: jnp.ndarray):
    """Sequential PLL: returns per-sample phases and phase-detector outputs."""

    def step(carry, zn):
        phs, fil_out, omega2 = carry
        # advance phase by previous loop output first? Reference order:
        # mixes with current phs, computes err, updates omega2/fil_out,
        # then phs += del_out (the *previous* fil_out).
        osc = jnp.exp(jax.lax.complex(jnp.zeros_like(phs), -phs))
        corr = zn * osc
        err = jnp.arctan2(jnp.imag(corr), jnp.real(corr))
        del_out = fil_out
        omega2_n = jnp.clip(omega2 + params.g2 * err,
                            params.omega_min, params.omega_max)
        fil_out_n = params.g1 * err + omega2_n
        phs_n = jnp.mod(phs + del_out, 2.0 * jnp.pi)
        return (phs_n, fil_out_n, omega2_n), (phs, omega2_n)

    zt = jnp.moveaxis(iq, -1, 0)
    (phs, fil_out, omega2), (phases, omegas) = jax.lax.scan(
        step, (state.phs, state.fil_out, state.omega2), zt, unroll=8)
    return (jnp.moveaxis(phases, 0, -1), jnp.moveaxis(omegas, 0, -1),
            phs, fil_out, omega2)


# precomputed biquad coefficient rows [b0,b1,b2,a1,a2] for the z^-2 allpasses
_AP_COEFFS = {
    0: np.stack([np.stack([c, np.zeros_like(c), np.ones_like(c),
                           np.zeros_like(c), c], axis=-1)
                 for c in [C0]], axis=0)[0],   # (N_STAGES, 5)
    1: np.stack([np.stack([c, np.zeros_like(c), np.ones_like(c),
                           np.zeros_like(c), c], axis=-1)
                 for c in [C1]], axis=0)[0],
}


def _allpass_chain(coeff_set: int, st: jnp.ndarray, x: jnp.ndarray):
    """7-stage cascade of z^-2 allpasses.  st: (N_STAGES, ..., 2)."""
    coeffs = jnp.asarray(_AP_COEFFS[coeff_set])
    outs = []
    y = x
    for j in range(N_STAGES):
        y, s2 = iir.biquad_block(coeffs[j], st[j], y)
        outs.append(s2)
    return y, jnp.stack(outs, axis=0)


def demod(params: SamParams, state: SamState, iq: jnp.ndarray,
          sideband: str = "usb", fade_leveler_on: bool = True):
    """iq (..., T) complex64 at decimated rate -> (audio, carrier_offset_hz*2pi/fs, new_state).

    sideband: 'usb' | 'lsb' | 'both' | 'stereo' (both = plain product
    detector; stereo = two-channel audio (..., 2, T), channel 0 = LSB,
    channel 1 = USB, matching SAM_SIDEBAND_STEREO
    `audio_driver.c:2092-2095` — state must be built with
    ``init_state(bs, n_audio=2)``).
    """
    # PLL: Pallas kernel off-CPU (loop state in registers, cos/sin of the
    # phase emitted from VMEM — the downstream mixing needs exactly those),
    # XLA scan fallback elsewhere
    use_pll_pk = (jax.default_backend() != "cpu" and iq.ndim == 2
                  and iq.shape[0] % 1024 == 0 and iq.shape[-1] % 256 == 0)
    if use_pll_pk and sideband == "both" and fade_leveler_on:
        # fully-fused fast path: product-detector audio + fade leveler
        # emitted by the PLL kernel itself (one output array; no separate
        # mix or one-pole passes)
        from ..pallas import pll as pallas_pll
        carry = jnp.stack([state.phs, state.fil_out, state.omega2,
                           state.fade.dc, state.fade.dc_insert], axis=0)
        audio, carry_out = pallas_pll.pll_audio_pallas(
            float(params.g1), float(params.g2), float(params.omega_min),
            float(params.omega_max), float(params.fade.mtauR),
            float(params.fade.mtauI), carry, iq)
        new_state = SamState(
            phs=carry_out[0], fil_out=carry_out[1], omega2=carry_out[2],
            ap_state=state.ap_state, ds=state.ds,
            fade=am.FadeLevelerState(dc=carry_out[3],
                                     dc_insert=carry_out[4]))
        return audio, carry_out[2], new_state
    if use_pll_pk:
        from ..pallas import pll as pallas_pll
        carry = jnp.stack([state.phs, state.fil_out, state.omega2], axis=0)
        cos_p, sin_p, carry_out = pallas_pll.pll_pallas(
            float(params.g1), float(params.g2), float(params.omega_min),
            float(params.omega_max), carry, iq)
        phs_f, fil_f, om_f = carry_out[0], carry_out[1], carry_out[2]
    else:
        phases, _, phs_f, fil_f, om_f = _pll_scan(params, state, iq)
        cos_p = jnp.cos(phases)
        sin_p = jnp.sin(phases)
    corr_re = jnp.real(iq) * cos_p + jnp.imag(iq) * sin_p

    if sideband == "both":
        audio = corr_re
        ap_state = state.ap_state
        ds_new = state.ds
    else:
        i_t, q_t = jnp.real(iq), jnp.imag(iq)
        ai = cos_p * i_t
        bi = sin_p * i_t
        aq = cos_p * q_t
        bq = sin_p * q_t
        # path inputs: a = ai delayed 1, b = bi, c = bq delayed 1, d = aq
        ai_d = jnp.concatenate([state.ds[..., 0:1], ai[..., :-1]], axis=-1)
        bq_d = jnp.concatenate([state.ds[..., 1:2], bq[..., :-1]], axis=-1)
        # the two C0 paths (and the two C1 paths) share coefficients, so
        # off-CPU they stack along channels into ONE Pallas biquad-cascade
        # call each (28 XLA dilated-scan sections -> 2 kernel launches)
        use_pk = (jax.default_backend() != "cpu" and iq.ndim == 2
                  and iq.shape[-1] % 128 == 0)
        if use_pk:
            from ..pallas import iir as pallas_iir
            C = iq.shape[0]
            x0 = jnp.concatenate([ai_d, bq_d], axis=0)       # (2C, T)
            x1 = jnp.concatenate([bi, aq], axis=0)
            st0 = jnp.concatenate([state.ap_state[0],
                                   state.ap_state[2]], axis=1)
            st1 = jnp.concatenate([state.ap_state[1],
                                   state.ap_state[3]], axis=1)
            y0, st0o = pallas_iir.biquad_cascade_pallas(
                _AP_COEFFS[0], st0, x0, t_tile=128)
            y1, st1o = pallas_iir.biquad_cascade_pallas(
                _AP_COEFFS[1], st1, x1, t_tile=128)
            a_out, c_out = y0[:C], y0[C:]
            b_out, d_out = y1[:C], y1[C:]
            ap_state = jnp.stack([st0o[:, :C], st1o[:, :C],
                                  st0o[:, C:], st1o[:, C:]], axis=0)
        else:
            a_out, sa = _allpass_chain(0, state.ap_state[0], ai_d)
            b_out, sb = _allpass_chain(1, state.ap_state[1], bi)
            c_out, sc = _allpass_chain(0, state.ap_state[2], bq_d)
            d_out, sd = _allpass_chain(1, state.ap_state[3], aq)
            ap_state = jnp.stack([sa, sb, sc, sd], axis=0)
        ds_new = jnp.stack([ai[..., -1], bq[..., -1]], axis=-1)
        ai_ps, bi_ps, bq_ps, aq_ps = a_out, b_out, c_out, d_out
        usb_a = (ai_ps - bi_ps) + (aq_ps + bq_ps)
        lsb_a = (ai_ps + bi_ps) - (aq_ps - bq_ps)
        if sideband == "usb":
            audio = usb_a
        elif sideband == "lsb":
            audio = lsb_a
        else:  # stereo: LSB-left / USB-right (audio_driver.c:2092-2095)
            audio = jnp.stack([lsb_a, usb_a], axis=-2)

    fade_state = state.fade
    if fade_leveler_on:
        corr_b = (jnp.broadcast_to(corr_re[..., None, :], audio.shape)
                  if audio.ndim == corr_re.ndim + 1 else corr_re)
        audio, fade_state = am.fade_leveler(params.fade, fade_state,
                                            audio, corr_b)

    new_state = SamState(phs=phs_f, fil_out=fil_f, omega2=om_f,
                         ap_state=ap_state, ds=ds_new, fade=fade_state)
    # the last per-sample omega equals the carried omega2 (the scan emits
    # the post-update value), so both PLL paths report the same estimate
    return audio, om_f, new_state
