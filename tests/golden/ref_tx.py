"""Full-chain scalar port of `TxProcessor_Run` — the TX conformance
oracle (float64 NumPy, the reference's EXACT imported tables).

Models the voice TX paths (`drivers/audio/tx_processor.c:891-1078`) at
default settings, stage for stage:

  SSB/AM: PrepareVoice (:440) = input gain -> TX IIR-lattice voice
    bandpass (IIR_TX_SOPRANO by default, IIR_TX_2k7_FM for FM; selection
    `tx_processor.c:88-107`) -> [bass/treble biquads neutral] ->
    VoiceCompressor (:173) = post-filter gain (alc_params[tx_comp_level=2]
    -> gain 4/2+0.5) + KA7OEI look-ahead ALC (knee 30000, attack 0.1,
    decay 10^-((10+35)/10)) with the AUDIO_DELAY_BUFSIZE ring delay
  SSB (:467): 201-tap TX Hilbert pair (iq_tx_wide; I/Q swapped for LSB)
    -> FreqShift -> SSB_GAIN_COMP
  AM (:734): Hilbert pair -> i=(I-Q)+2*AM_CARRIER_LEVEL,
    q=(Q-I)-2*AM_CARRIER_LEVEL -> FreqShift -> AM_GAIN_COMP
  FM (:534): 6 dB/oct pre-emphasis differentiator (alpha 0.05) ->
    integer phase-accumulator frequency modulation through the 10-bit
    DDS sine table (FM_MOD_SCALING 16, x2 for 5 kHz deviation;
    FM_MOD_AMPLITUDE_SCALING 0.875) at +translate
"""
from __future__ import annotations

import numpy as np
from scipy import signal

from uhsdr_tpu import data
from uhsdr_tpu.ops.lattice import iir_lattice_ref

IQ_RATE = 48000.0

# audio_driver.h:403-429, tx_processor.c:493-511
ALC_VAL_MAX = 1.0
ALC_VAL_MIN = 0.001
ALC_ATTACK = 0.1
ALC_KNEE = 30000.0
AM_CARRIER_LEVEL = 5100.0
SSB_GAIN_COMP = 1.133
AM_GAIN_COMP = 1.133
FM_MOD_SCALING = 16.0
FM_MOD_AMPLITUDE_SCALING = 0.875
FM_TX_HPF_ALPHA = 0.05
FM_MOD_ACC_MAX = 1 << 16
# default compression level 2 (ref_config.json EEPROM_TX_AUDIO_COMPRESS)
# -> alc_params[2] = {tx_postfilt_gain 4, alc_decay 10}
# (audio_management.c:248-262)
ALC_POSTFILT_GAIN = 4.0
ALC_DECAY_VAR = 10.0
# AUDIO_DELAY_BUFSIZE = IQ_BUFSZ*5 = 2*32*5 (audio_driver.h:516); the
# firmware's blockSize is 32
AUDIO_DELAY_BUFSIZE = 2 * 32 * 5
FW_BLOCK = 32


def voice_compressor(a: np.ndarray, gain_scaling: float = 1.0,
                     dtype=np.float64) -> np.ndarray:
    """TxProcessor_VoiceCompressor (tx_processor.c:173-245)."""
    gain_calc = ALC_POSTFILT_GAIN / 2.0 + 0.5
    alc_decay = 10.0 ** (-((ALC_DECAY_VAR + 35.0) / 10.0))
    a = np.asarray(a, dtype) * dtype(gain_calc)

    alc_val = 1.0       # ads.alc_val init (AudioDriver_Init)
    agc_val = np.empty_like(a)
    for i, x in enumerate(a):
        alc_var = abs(x * alc_val) / ALC_KNEE - 1.0
        if alc_var < 0:
            alc_val -= alc_val * alc_decay * alc_var
        else:
            alc_val -= alc_val * ALC_ATTACK * alc_var
            alc_val = max(alc_val, ALC_VAL_MIN)
        alc_val = min(alc_val, ALC_VAL_MAX)
        agc_val[i] = alc_val * gain_scaling

    # block-ring ALC delay (in/out pointer walk, blockSize=32):
    # outbuf = inbuf + blockSize (mod BUFSIZE) -> the audio is delayed by
    # BUFSIZE - 2*blockSize... replicate the pointer arithmetic literally
    delay = np.zeros(AUDIO_DELAY_BUFSIZE, dtype)
    # zeros, not empty: for lengths not a multiple of FW_BLOCK the block
    # loop leaves a tail unwritten and it must be deterministic (silence),
    # not uninitialized memory.
    out = np.zeros_like(a)
    inptr = 0
    nblk = len(a) // FW_BLOCK
    for b in range(nblk):
        inptr = (inptr + FW_BLOCK) % AUDIO_DELAY_BUFSIZE
        outptr = (inptr + FW_BLOCK) % AUDIO_DELAY_BUFSIZE
        seg = a[b * FW_BLOCK:(b + 1) * FW_BLOCK]
        delay[inptr:inptr + FW_BLOCK] = seg
        out[b * FW_BLOCK:(b + 1) * FW_BLOCK] = \
            delay[outptr:outptr + FW_BLOCK]
    return out * agc_val[: len(out)]


def prepare_voice(audio: np.ndarray, mode: str) -> np.ndarray:
    """TxProcessor_PrepareVoice (:440): voice bandpass lattice +
    compressor.  gain_scaling: SSB 1.0, AM 0.23 (audio_driver.h:417,428).
    Input `audio` is in the firmware's int16-count float domain.

    The FM path runs in float32: its phase accumulator floors the audio
    every sample, so f64-vs-f32 arithmetic differences would flip floor
    decisions and integrate into a phase random walk that caps the
    conformance comparison — matching the firmware's own float width
    removes that artifact."""
    dtype = np.float32 if mode == "fm" else np.float64
    lat = "IIR_TX_2k7_FM" if mode == "fm" else "IIR_TX_SOPRANO"
    pk, pv = data.lattice(lat)
    a, _ = iir_lattice_ref(pk, pv, np.asarray(audio, dtype), dtype=dtype)
    gain = 0.23 if mode == "am" else 1.0
    return voice_compressor(a, gain, dtype=dtype)


def _hilbert_pair(a: np.ndarray):
    h_i = data.fir("iq_tx_wide_i")
    h_q = data.fir("iq_tx_wide_q")
    i_b = signal.lfilter(h_i, [1.0], a)
    q_b = signal.lfilter(h_q, [1.0], a)
    return i_b, q_b


def freq_shift(i_b, q_b, translate_hz: float, fs: float = IQ_RATE):
    z = (i_b + 1j * q_b) * np.exp(
        2j * np.pi * translate_hz * np.arange(len(i_b)) / fs)
    return z.real, z.imag


def ref_tx_chain(audio: np.ndarray, mode: str,
                 translate_hz: float = 6000.0,
                 fm_dev5: bool = False) -> np.ndarray:
    """audio (T,) @48k (int16-count domain) -> IQ (T,) complex.

    Default settings: compression level 2, flat bass/treble, no tune,
    LINE/MIC gains folded into the caller's input scaling."""
    audio = np.asarray(audio, np.float64)

    if mode in ("usb", "lsb"):
        a = prepare_voice(audio, mode)
        i_b, q_b = _hilbert_pair(a)
        if mode == "lsb":       # filters swapped (tx_processor.c:478-480)
            i_b, q_b = q_b, i_b
        # QSE wiring: the firmware's h_q LEADS h_i, so in its i+jq buffer
        # USB content sits BELOW the translate; the mcHF TX mixer wiring
        # mirrors the BASEBAND spectrum between DAC and antenna, which in
        # the RX capture convention (this framework's contract, and what
        # the firmware's own RX demodulates) is a conjugation BEFORE the
        # translate shift.  See mod.modulators.ssb_params_ref.
        q_b = -q_b
        i_b, q_b = freq_shift(i_b, q_b, translate_hz)
        return (i_b + 1j * q_b) * SSB_GAIN_COMP

    if mode == "am":
        a = prepare_voice(audio, mode)
        i_b, q_b = _hilbert_pair(a)
        i_am = (i_b - q_b) + 2 * AM_CARRIER_LEVEL
        q_am = (q_b - i_b) - 2 * AM_CARRIER_LEVEL
        i_b, q_b = freq_shift(i_am, q_am, translate_hz)
        return (i_b + 1j * q_b) * AM_GAIN_COMP

    if mode == "fm":
        a = prepare_voice(audio, mode)
        # 6 dB/oct pre-emphasis differentiator (tx_processor.c:543-552)
        f32 = np.float32
        hpf_a = hpf_b = f32(0.0)
        d = np.empty_like(a, dtype=np.float32)
        for i, x in enumerate(np.asarray(a, np.float32)):
            hpf_b = f32(f32(FM_TX_HPF_ALPHA) * f32(hpf_b + x - hpf_a))
            hpf_a = x
            d[i] = hpf_b
        # integer phase-accumulator DDS modulation (:568-588)
        dds = data.array("dds_table")           # int16 sine, 1024 points
        mult = 2.0 if fm_dev5 else 1.0
        word = (FM_MOD_ACC_MAX * abs(int(translate_hz))) // int(IQ_RATE)
        acc = 0
        i_b = np.empty_like(a)
        q_b = np.empty_like(a)
        for i, x in enumerate(d):
            acc = int(np.float32(acc)
                      + np.float32(word + np.float32(x)
                                   * np.float32(FM_MOD_SCALING * mult))
                      ) % FM_MOD_ACC_MAX
            idx = acc >> 6                      # 16-bit acc -> 10-bit table
            i_b[i] = dds[idx]
            q_b[i] = dds[(idx + 3 * 1024 // 4) % 1024]
        if translate_hz < 0:
            i_b, q_b = q_b, i_b
        return (i_b + 1j * q_b) * FM_MOD_AMPLITUDE_SCALING

    raise ValueError(mode)
