"""Reference-exact RX chain: the firmware's structure with its EXACT
imported coefficient tables (`uhsdr_tpu/data/`).

This is the conformance twin of `chain.rx`: where `chain.rx` fuses the
front end into one complex analytic-bandpass decimating FIR (the fast
product path, filters re-designed with scipy), this chain replicates the
firmware's stage structure bit-for-bit in sequencing —

  narrow SSB/CW (audio_driver.c:2718-2745):
      FreqShift -> decimate I/Q (FirRxDecimate_sideband_supp)
      -> Hilbert pair @ fs_dec (i_rx_new/q_rx_new) -> I±Q
  wide SSB:
      FreqShift -> Hilbert pair @48k -> I±Q -> decimate audio
  AM/SAM:
      FreqShift -> decimate I/Q with the per-path AM lowpass taps
      -> envelope/SAM-PLL @ fs_dec
  FM:
      FreqShift -> 89-tap lowpass both planes @48k -> discriminator
      -> de-emph/HPF -> FM_RX_SCALING -> AGC

  then the decimated-domain post chain (audio_driver.c:2436-2592):
      IIR-lattice PreFilter -> WDSP AGC -> post-AGC gain scaling
      -> FIR interpolate -> IIR-lattice anti-alias

Everything is jittable, vmap/shard-compatible over a leading channel
axis, and reuses the same demod/AGC/lattice ops as the product chain, so
conformance here validates those components for both chains.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import data
from ..demod import am as am_mod
from ..demod import fm as fm_mod
from ..demod import sam as sam_mod
from ..ops import agc as agc_mod
from ..ops import fir, lattice, nco

IQ_RATE = 48000.0

POST_AGC_GAIN_SCALING_DECIMATE_4 = 3.46     # audio_driver.h:362
POST_AGC_GAIN_SCALING_DECIMATE_2 = 3.46 * 0.6
FM_RX_SCALING_2K5 = 10000.0                 # audio_driver.c:1494
FM_RX_SCALING_5K = FM_RX_SCALING_2K5 / 2.0


@dataclass(frozen=True)
class RefRxConfig:
    mode: str = "usb"               # usb | lsb | cw | am | sam | fm
    bw_key: str = "2P3KHZ"
    path_name: str | None = None
    select_id: int | None = None
    translate_hz: float = 6000.0
    block_len: int = 4096
    agc_mode: str = "med"
    agc_thresh_db: float = 60.0
    fade_leveler: bool = True
    sam_sideband: str = "both"
    fm_dev5: bool = False
    sql_threshold: int = 0

    @property
    def path(self) -> dict:
        return data.find_path(self.mode, self.bw_key,
                              select_id=self.select_id, name=self.path_name)

    @property
    def decim(self) -> int:
        return self.path["decim"]

    @property
    def fs_dec(self) -> float:
        return IQ_RATE / self.decim

    @property
    def uses_decimated_iq(self) -> bool:
        return data.uses_decimated_iq(self.path, self.mode)


class RefRxParams(NamedTuple):
    nco_delta: np.ndarray
    dec_fir: np.ndarray | None      # real decimator taps (both planes)
    hilb: np.ndarray | None         # (2, taps) Hilbert pair [i; q]
    pre_pk: np.ndarray | None
    pre_pv: np.ndarray | None
    interp_fir: np.ndarray | None
    aa_pk: np.ndarray | None
    aa_pv: np.ndarray | None
    agc: agc_mod.AgcParams
    fade: am_mod.FadeLevelerParams
    sam: sam_mod.SamParams
    fm: Any
    post_scale: float


class RefRxState(NamedTuple):
    nco_phase: jnp.ndarray
    dec_carry: jnp.ndarray | None
    hilb_carry: jnp.ndarray | None
    pre_lat: jnp.ndarray | None
    agc: agc_mod.AgcState
    fade: am_mod.FadeLevelerState
    sam: sam_mod.SamState
    fm: Any
    interp_carry: jnp.ndarray | None
    aa_lat: jnp.ndarray | None


def make_params(cfg: RefRxConfig) -> RefRxParams:
    path = cfg.path
    f32 = lambda a: np.ascontiguousarray(a, np.float32)

    dec_fir = hilb = None
    if cfg.mode in ("am", "sam"):
        dec_fir = f32(data.fir(path["fir_i"], path["fir_numtaps"]))
    elif cfg.mode == "fm":
        hilb = f32(np.stack([data.fir(path["fir_i"], path["fir_numtaps"])] * 2))
    else:
        dec_fir = f32(data.decimator(path["dec"]))
        hilb = f32(np.stack([data.fir(path["fir_i"], path["fir_numtaps"]),
                             data.fir(path["fir_q"], path["fir_numtaps"])]))

    pre_pk = pre_pv = aa_pk = aa_pv = interp_fir = None
    if cfg.mode != "fm":
        if path["pre"] is not None:
            pk, pv = data.lattice(path["pre"])
            pre_pk, pre_pv = f32(pk), f32(pv)
        if path["interpolate"] is not None:
            h_int, _ = data.interpolator(path["interpolate"], cfg.decim)
            interp_fir = f32(h_int)
        if path["antialias"] is not None:
            pk, pv = data.lattice(path["antialias"])
            aa_pk, aa_pv = f32(pk), f32(pv)

    fs_post = IQ_RATE if cfg.mode == "fm" else cfg.fs_dec
    fm_params = (fm_mod.make_params(IQ_RATE, cfg.sql_threshold, 0.0)
                 if cfg.mode == "fm" else None)
    post_scale = (POST_AGC_GAIN_SCALING_DECIMATE_4 if cfg.decim == 4
                  else POST_AGC_GAIN_SCALING_DECIMATE_2)
    post_scale *= 0.5 if cfg.mode in ("am", "sam") else 0.333

    return RefRxParams(
        nco_delta=nco.freq_to_delta(-cfg.translate_hz, IQ_RATE),
        dec_fir=dec_fir, hilb=hilb,
        pre_pk=pre_pk, pre_pv=pre_pv,
        interp_fir=interp_fir, aa_pk=aa_pk, aa_pv=aa_pv,
        agc=agc_mod.make_params(fs_post, mode=cfg.agc_mode,
                                thresh_db=cfg.agc_thresh_db,
                                remove_dc=cfg.mode in ("am", "sam")),
        fade=am_mod.fade_leveler_params(cfg.fs_dec),
        sam=sam_mod.make_params(cfg.fs_dec),
        fm=fm_params,
        post_scale=post_scale,
    )


def init_state(cfg: RefRxConfig, params: RefRxParams,
               batch_shape=()) -> RefRxState:
    bs = tuple(batch_shape)
    dec_carry = hilb_carry = None
    if params.dec_fir is not None:
        # narrow paths decimate complex IQ; wide SSB decimates real audio
        dec_dtype = (jnp.complex64 if cfg.uses_decimated_iq
                     else jnp.float32)
        dec_carry = fir.init_carry(bs, params.dec_fir.shape[-1], dec_dtype)
    if params.hilb is not None:
        hilb_carry = fir.init_carry(bs + (2,), params.hilb.shape[-1],
                                    jnp.float32)
    interp_carry = None
    if params.interp_fir is not None:
        sub_len = -(-params.interp_fir.shape[-1] // cfg.decim)
        interp_carry = jnp.zeros(bs + (sub_len - 1,), jnp.float32)
    return RefRxState(
        nco_phase=jnp.zeros(bs, jnp.uint32),
        dec_carry=dec_carry,
        hilb_carry=hilb_carry,
        pre_lat=(lattice.init_state(bs, params.pre_pk.shape[0])
                 if params.pre_pk is not None else None),
        agc=agc_mod.init_state(bs, params.agc),
        fade=am_mod.fade_leveler_init(bs),
        sam=sam_mod.init_state(bs),
        fm=fm_mod.init_state(bs, params.fm) if params.fm is not None else None,
        interp_carry=interp_carry,
        aa_lat=(lattice.init_state(bs, params.aa_pk.shape[0])
                if params.aa_pk is not None else None),
    )


def process_block(cfg: RefRxConfig, params: RefRxParams, state: RefRxState,
                  iq: jnp.ndarray):
    """iq: (..., B) complex64 @48 kHz -> (audio48, new_state)."""
    # --- FreqShift ---
    if cfg.translate_hz != 0.0:
        delta = jnp.broadcast_to(jnp.asarray(params.nco_delta),
                                 state.nco_phase.shape)
        z, nco_phase = nco.mix(iq, state.nco_phase, delta)
    else:
        z, nco_phase = iq, state.nco_phase

    dec_carry = state.dec_carry
    hilb_carry = state.hilb_carry
    fade_state, sam_state, fm_state = state.fade, state.sam, state.fm

    if cfg.mode == "fm":
        x2 = jnp.stack([jnp.real(z), jnp.imag(z)], axis=-2)
        y2, hilb_carry = fir.fir_block(jnp.asarray(params.hilb),
                                       hilb_carry, x2)
        zf = jax.lax.complex(y2[..., 0, :], y2[..., 1, :])
        audio, fm_state = fm_mod.demod(params.fm, state.fm, zf)
        audio = audio * np.float32(FM_RX_SCALING_5K if cfg.fm_dev5
                                   else FM_RX_SCALING_2K5)
        audio, agc_state = agc_mod.run(params.agc, state.agc, audio)
        return audio, state._replace(nco_phase=nco_phase,
                                     hilb_carry=hilb_carry,
                                     agc=agc_state, fm=fm_state)

    if cfg.uses_decimated_iq:
        z, dec_carry = fir.fir_decimate_block(jnp.asarray(params.dec_fir),
                                              dec_carry, z, cfg.decim)

    if cfg.mode in ("usb", "lsb", "cw"):
        x2 = jnp.stack([jnp.real(z), jnp.imag(z)], axis=-2)
        y2, hilb_carry = fir.fir_block(jnp.asarray(params.hilb),
                                       hilb_carry, x2)
        i_b, q_b = y2[..., 0, :], y2[..., 1, :]
        audio = i_b - q_b if cfg.mode == "lsb" else i_b + q_b
    elif cfg.mode == "am":
        audio, fade_state = am_mod.demod(z, params.fade, state.fade,
                                         cfg.fade_leveler)
    elif cfg.mode == "sam":
        audio, _, sam_state = sam_mod.demod(params.sam, state.sam, z,
                                            sideband=cfg.sam_sideband,
                                            fade_leveler_on=cfg.fade_leveler)
    else:
        raise ValueError(cfg.mode)

    if not cfg.uses_decimated_iq:
        audio, dec_carry = fir.fir_decimate_block(
            jnp.asarray(params.dec_fir), dec_carry, audio, cfg.decim)

    # ---- post chain ----
    pre_lat = state.pre_lat
    if params.pre_pk is not None:
        audio, pre_lat = lattice.iir_lattice_block(params.pre_pk,
                                                   params.pre_pv,
                                                   state.pre_lat, audio)
    audio, agc_state = agc_mod.run(params.agc, state.agc, audio)
    audio = audio * np.float32(params.post_scale)

    interp_carry = state.interp_carry
    if params.interp_fir is not None:
        audio, interp_carry = fir.fir_interpolate_block(
            jnp.asarray(params.interp_fir), state.interp_carry, audio,
            cfg.decim)
    aa_lat = state.aa_lat
    if params.aa_pk is not None:
        audio, aa_lat = lattice.iir_lattice_block(params.aa_pk, params.aa_pv,
                                                  state.aa_lat, audio)

    return audio, state._replace(
        nco_phase=nco_phase, dec_carry=dec_carry, hilb_carry=hilb_carry,
        pre_lat=pre_lat, agc=agc_state, fade=fade_state, sam=sam_state,
        interp_carry=interp_carry, aa_lat=aa_lat)


class RefRxChain:
    """One compiled reference-exact chain (see chain.rx.RxChain for the
    f32-planes host-I/O rationale)."""

    def __init__(self, cfg: RefRxConfig):
        self.cfg = cfg
        self.params = make_params(cfg)

        def _run(state, i_plane, q_plane):
            iq = jax.lax.complex(i_plane, q_plane)
            return process_block(self.cfg, self.params, state, iq)

        self._jit = jax.jit(_run)

    def init_state(self, batch_shape=()) -> RefRxState:
        anchor = jnp.zeros((), jnp.float32)
        return jax.jit(
            lambda d: init_state(self.cfg, self.params, batch_shape))(anchor)

    def __call__(self, state, iq=None, i=None, q=None):
        if iq is not None:
            i = jnp.asarray(np.ascontiguousarray(np.real(iq), np.float32))
            q = jnp.asarray(np.ascontiguousarray(np.imag(iq), np.float32))
        return self._jit(state, i, q)
