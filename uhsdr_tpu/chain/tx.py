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

from ..mod import alc as alc_mod
from ..mod import modulators as mods
from ..ops import design, iir, nco

IQ_RATE = 48000.0


@dataclass(frozen=True)
class TxConfig:
    mode: str = "usb"               # usb | lsb | am | fm | cw
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


class TxState(NamedTuple):
    voice_sos_state: jnp.ndarray | None
    alc: Any
    mod: Any
    cw_phase: jnp.ndarray | None


def make_params(cfg: TxConfig) -> TxParams:
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
    return TxState(
        voice_sos_state=jnp.zeros((params.voice_sos.shape[0],) + bs + (2,),
                                  jnp.float32)
        if params.voice_sos is not None else None,
        alc=alc_mod.init_state(bs, params.alc) if params.alc is not None else None,
        mod=mod_state,
        cw_phase=jnp.zeros(bs, jnp.uint32) if cfg.mode == "cw" else None,
    )


def _voice_sos(sos, state, x):
    """Voice-bandpass biquad dispatch (shared Pallas/XLA rule,
    `ops.iir.biquad_cascade_dispatch`)."""
    return iir.biquad_cascade_dispatch(sos, state, x)


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
        if params.voice_sos is not None:
            audio, sos_state = _voice_sos(params.voice_sos, sos_state, audio)
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

    # final IQ calibration (TxProcessor_IqFinalProcessing)
    i_out = jnp.real(iq) * params.iq_gain
    q_out = jnp.imag(iq) + i_out * params.iq_phase
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
