"""TX signal chain — the TPU equivalent of `TxProcessor_Run`
(`tx_processor.c:891-1078`).

  audio in (48 kHz, batched)
    -> voice conditioning: TX bandpass (2k7 IIR) + voice compressor/ALC
       (`TxProcessor_PrepareVoice` :440, `TxProcessor_VoiceCompressor` :173)
    -> per-mode modulator: SSB / AM / FM / CW  (mod.modulators)
    -> final IQ gain + phase calibration       (`TxProcessor_IqFinalProcessing` :282)
  IQ out (48 kHz complex)
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import data as refdata
from ..mod import alc as alc_mod
from ..mod import modulators as mods
from ..ops import design, iir, latconv, lattice as lattice_mod, nco

IQ_RATE = 48000.0

_INT16_FS = 32767.0


def _lattice_sos5(name: str) -> np.ndarray:
    pk, pv = refdata.lattice(name)
    sos6 = latconv.lattice_to_sos(pk, pv)
    sos6 = np.asarray(sos6, np.float64)
    sos6 = sos6 / sos6[:, 3:4]
    return np.concatenate([sos6[:, :3], sos6[:, 4:]],
                          axis=1).astype(np.float32)


@dataclass(frozen=True)
class TxConfig:
    mode: str = "usb"               # usb | lsb | am | fm | cw
    front: str = "ref"              # "ref": the firmware's imported tables
                                    # (iq_tx_wide Hilbert pair, TX IIR
                                    # lattices, ALC/carrier/DDS constants,
                                    # audio scaled through the int16-count
                                    # domain) — the shipped TX chain is the
                                    # conformant one; "scipy": legacy
                                    # redesigned filters
    translate_hz: float = 6000.0
    block_len: int = 4096
    compressor: bool = True
    alc_decay: float = 0.02
    tx_bandpass: bool = True        # 275-2700 voice bandpass
    fm_dev_5khz: bool = False
    fm_subtone_hz: float = 0.0
    cw_sidetone_hz: float = 700.0
    iq_gain_balance: float = 0.0    # final calibration
    iq_phase_balance: float = 0.0


class TxParams(NamedTuple):
    voice_sos: np.ndarray | None
    alc: Any
    ssb: Any
    am: Any
    fm: Any
    cw_delta: np.ndarray | None
    iq_gain: float
    iq_phase: float
    # front="ref" extras: the chain's unit-domain audio is lifted into
    # the firmware's int16-count domain (where ALC_KNEE=30000 and
    # AM_CARRIER_LEVEL=5100 live), and the IQ is normalized back with
    # the mode's empirical gain compensation (SSB/AM_GAIN_COMP=1.133,
    # audio_driver.h:419-421)
    in_scale: float = 1.0
    out_scale: float = 1.0
    sos_precise: bool = False
    voice_lat: Any = None    # (pk, pv): run the voice bandpass as the
                             # EXACT serial lattice recurrence instead of
                             # its SOS twin — the FM ref path, whose phase
                             # accumulator floors the audio every sample
                             # and so integrates any arithmetic delta


class TxState(NamedTuple):
    voice_sos_state: jnp.ndarray | None
    alc: Any
    mod: Any
    cw_phase: jnp.ndarray | None


def _make_params_ref(cfg: TxConfig) -> TxParams:
    """Reference-table TX products (`TxProcessor_Run` default settings):
    voice lattice IIR_TX_SOPRANO (IIR_TX_2k7_FM for FM) as its exact
    transfer function in SOS form, compression level 2 ALC
    (alc_params[2] -> post-filter gain 4, decay 10^-4.5, the 288-sample
    block-ring look-ahead), iq_tx_wide Hilbert pair, AM carrier and FM
    DDS-table constants."""
    mode = cfg.mode
    voice_sos = None
    voice_lat = None
    if cfg.tx_bandpass and mode in ("usb", "lsb", "am", "fm"):
        if mode == "fm":
            pk, pv = refdata.lattice("IIR_TX_2k7_FM")
            voice_lat = (np.asarray(pk, np.float32),
                         np.asarray(pv, np.float32))
        else:
            voice_sos = _lattice_sos5("IIR_TX_SOPRANO")
    alc = None
    if cfg.compressor and mode in ("usb", "lsb", "am", "fm"):
        alc = alc_mod.make_params(
            decay=10.0 ** (-((10.0 + 35.0) / 10.0)),   # alc_decay_var=10
            delay=288,            # AUDIO_DELAY_BUFSIZE ring at block 32
            postfilt_gain=4.0,    # alc_params[tx_comp_level=2]
            gain_scaling=0.23 if mode == "am" else 1.0)
    gain_comp = 1.133 if mode in ("usb", "lsb", "am") else 1.0
    return TxParams(
        voice_sos=voice_sos,
        alc=alc,
        ssb=mods.ssb_params_ref(cfg.translate_hz, lsb=mode == "lsb")
        if mode in ("usb", "lsb") else None,
        am=mods.am_params_ref(cfg.translate_hz) if mode == "am" else None,
        fm=mods.fm_mod_params(cfg.translate_hz, cfg.fm_dev_5khz,
                              cfg.fm_subtone_hz, count_domain=True)
        if mode == "fm" else None,
        cw_delta=nco.freq_to_delta(cfg.translate_hz + cfg.cw_sidetone_hz,
                                   IQ_RATE) if mode == "cw" else None,
        iq_gain=1.0 + cfg.iq_gain_balance,
        iq_phase=cfg.iq_phase_balance,
        voice_lat=voice_lat,
        in_scale=_INT16_FS if mode != "cw" else 1.0,
        # FM's DDS output is already unit-scale (the oracle's int16 table
        # divided by full-scale); the linear voice modes normalize the
        # count-domain IQ back down
        out_scale=(gain_comp / _INT16_FS if mode in ("usb", "lsb", "am")
                   else 1.0),
        sos_precise=True,
    )


def make_params(cfg: TxConfig) -> TxParams:
    if cfg.front == "ref" and cfg.mode in ("usb", "lsb", "am", "fm"):
        return _make_params_ref(cfg)
    voice_sos = None
    if cfg.tx_bandpass and cfg.mode in ("usb", "lsb", "am", "fm"):
        voice_sos = design.audio_bandpass_sos(275.0, 2700.0, IQ_RATE,
                                              order=6).astype(np.float32)
    return TxParams(
        voice_sos=voice_sos,
        alc=alc_mod.make_params(decay=cfg.alc_decay) if cfg.compressor else None,
        ssb=mods.ssb_params(translate_hz=cfg.translate_hz,
                            lsb=cfg.mode == "lsb")
        if cfg.mode in ("usb", "lsb") else None,
        am=mods.am_params(cfg.translate_hz) if cfg.mode == "am" else None,
        fm=mods.fm_mod_params(cfg.translate_hz, cfg.fm_dev_5khz,
                              cfg.fm_subtone_hz) if cfg.mode == "fm" else None,
        cw_delta=nco.freq_to_delta(cfg.translate_hz + cfg.cw_sidetone_hz,
                                   IQ_RATE) if cfg.mode == "cw" else None,
        iq_gain=1.0 + cfg.iq_gain_balance,
        iq_phase=cfg.iq_phase_balance,
    )


def init_state(cfg: TxConfig, params: TxParams, batch_shape) -> TxState:
    bs = tuple(batch_shape)
    if cfg.mode in ("usb", "lsb", "am"):
        mod_state = mods.ssb_init(bs)
    elif cfg.mode == "fm":
        mod_state = mods.fm_mod_init(bs)
    else:
        mod_state = None
    if params.voice_lat is not None:
        sos0 = lattice_mod.init_state(bs, params.voice_lat[0].shape[0])
    elif params.voice_sos is not None:
        sos0 = jnp.zeros((params.voice_sos.shape[0],) + bs + (2,),
                         jnp.float32)
    else:
        sos0 = None
    return TxState(
        voice_sos_state=sos0,
        alc=alc_mod.init_state(bs, params.alc) if params.alc is not None else None,
        mod=mod_state,
        cw_phase=jnp.zeros(bs, jnp.uint32) if cfg.mode == "cw" else None,
    )


def _voice_sos(sos, state, x, precise: bool = False):
    """Voice-bandpass biquad dispatch (shared Pallas/XLA rule,
    `ops.iir.biquad_cascade_dispatch`); precise pins the sequential path
    for the ref lattice-derived cascade (see ops.iir)."""
    return iir.biquad_cascade_dispatch(sos, state, x,
                                       impl="precise" if precise else "auto")


def process_block(cfg: TxConfig, params: TxParams, state: TxState,
                  audio: jnp.ndarray):
    """audio: (..., T) f32 (for CW: keying envelope in [0,1]).
    Returns (iq (..., T) complex64, new_state, taps).

    ``taps`` carries the monitor streams the reference exports over USB
    audio in its four TX stream modes (`tx_processor.c:1031-1066`):
    "source" = raw input audio, "processed" = post-filter/compressor
    audio (the sidetone-fill source), plus the IQ output itself (the
    digital-IQ stream mode)."""
    taps = {"source": audio}
    sos_state = state.voice_sos_state
    alc_state = state.alc
    if cfg.mode != "cw":
        if params.in_scale != 1.0:
            audio = audio * np.float32(params.in_scale)
        if params.voice_lat is not None:
            audio, sos_state = lattice_mod.iir_lattice_block(
                params.voice_lat[0], params.voice_lat[1], sos_state, audio)
        elif params.voice_sos is not None:
            audio, sos_state = _voice_sos(params.voice_sos, sos_state,
                                          audio, precise=params.sos_precise)
        if params.alc is not None:
            audio, alc_state = alc_mod.run(params.alc, alc_state, audio)
    taps["processed"] = audio

    cw_phase = state.cw_phase
    if cfg.mode in ("usb", "lsb"):
        iq, mod_state = mods.ssb_modulate(params.ssb, state.mod, audio)
    elif cfg.mode == "am":
        iq, mod_state = mods.am_modulate(params.am, state.mod, audio)
    elif cfg.mode == "fm":
        iq, mod_state = mods.fm_modulate(params.fm, state.mod, audio)
    elif cfg.mode == "cw":
        iq, cw_phase = mods.cw_carrier(audio, state.cw_phase, params.cw_delta)
        mod_state = state.mod
    else:
        raise ValueError(cfg.mode)

    # final IQ calibration (TxProcessor_IqFinalProcessing) + the ref
    # front's gain compensation / count-domain normalization
    gain = params.iq_gain * params.out_scale
    i_out = jnp.real(iq) * np.float32(gain)
    q_out = jnp.imag(iq) * np.float32(params.out_scale) \
        + i_out * params.iq_phase
    iq = jax.lax.complex(i_out, q_out)

    return iq, TxState(voice_sos_state=sos_state, alc=alc_state,
                       mod=mod_state, cw_phase=cw_phase), taps


class TxChain:
    """Jitted TX chain; f32 host I/O (returns I and Q planes)."""

    def __init__(self, cfg: TxConfig):
        self.cfg = cfg
        self.params = make_params(cfg)

        def _run(state, audio):
            iq, new_state, _ = process_block(self.cfg, self.params, state,
                                             audio)
            return jnp.real(iq), jnp.imag(iq), new_state

        self._jit = jax.jit(_run)

    def init_state(self, batch_shape=()) -> TxState:
        # inside jit — see RxChain.init_state (axon fetch-poisoning)
        anchor = jnp.zeros((), jnp.float32)
        return jax.jit(
            lambda d: init_state(self.cfg, self.params, batch_shape))(anchor)

    def __call__(self, state: TxState, audio):
        return self._jit(state, audio)
