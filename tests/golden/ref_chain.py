"""Full-chain scalar port of `AudioDriver_RxProcessor` with the
reference's EXACT coefficient tables — the conformance oracle.

Models the complete RX path (`audio_driver.c:2603-2942` +
`RxProcessor_DemodAudioPostprocessing` `:2436-2592`) in float64 NumPy,
using coefficient data imported from the reference tree by
`tools/parse_ref_filters.py` (`uhsdr_tpu/data/`).  CMSIS kernel
semantics (h = reversed(pCoeffs); decimator keeps phase 0; interpolator
= zero-stuff + FIR; `arm_iir_lattice_f32` recurrence) are documented in
`uhsdr_tpu.data` / `uhsdr_tpu.ops.lattice`.

Structure switch (`audio_driver.c:2718-2724`): narrow SSB/CW
(i_rx_new Hilbert set) and AM/SAM decimate IQ first and demodulate at
the decimated rate; wide SSB Hilberts at 48 kHz, demodulates, then
decimates the audio; FM stays at 48 kHz throughout.
"""
from __future__ import annotations

import numpy as np
from scipy import signal

from uhsdr_tpu import data
from uhsdr_tpu.ops.lattice import iir_lattice_ref

from . import ref_dsp

IQ_RATE = 48000.0

# audio_driver.h:362-364, gain applied after AGC (audio_driver.c:2517-2527)
POST_AGC_GAIN_SCALING_DECIMATE_4 = 3.46
POST_AGC_GAIN_SCALING_DECIMATE_2 = 3.46 * 0.6
# audio_driver.c:1494-1495
FM_RX_SCALING_2K5 = 10000.0
FM_RX_SCALING_5K = FM_RX_SCALING_2K5 / 2.0


def cmsis_fir(h: np.ndarray, x: np.ndarray) -> np.ndarray:
    """arm_fir_f32 on a whole capture (zero initial state)."""
    return signal.lfilter(np.asarray(h, np.float64), [1.0],
                          np.asarray(x, np.float64))


def cmsis_fir_decimate(h: np.ndarray, x: np.ndarray, m: int) -> np.ndarray:
    """arm_fir_decimate_f32: filter then keep phase 0 (y[k]=filt[k*m])."""
    return cmsis_fir(h, x)[::m]


def cmsis_fir_interpolate(h: np.ndarray, x: np.ndarray, l: int) -> np.ndarray:
    """arm_fir_interpolate_f32: zero-stuff by l then FIR (gain in taps)."""
    up = np.zeros(len(x) * l)
    up[::l] = x
    return cmsis_fir(h, up)


def freq_translate(iq: np.ndarray, translate_hz: float,
                   fs: float = IQ_RATE) -> np.ndarray:
    """FreqShift (exact sin/cos mode, freq_shift.c:107+): shift the
    signal at +translate_hz down to baseband.  Phase starts at 0 on the
    first sample, matching the chain NCO's phase-accumulator origin."""
    n = np.arange(len(iq))
    return iq * np.exp(-2j * np.pi * translate_hz * n / fs)


def am_envelope(i: np.ndarray, q: np.ndarray, fs: float,
                fade_leveler: bool = True) -> np.ndarray:
    """DEMOD_AM branch of AudioDriver_DemodSAM (audio_driver.c:2009-2020):
    envelope + fade leveler with corr = 0."""
    audio = np.sqrt(i * i + q * q)
    if fade_leveler:
        mtauR = np.exp(-1.0 / (fs * 0.02))
        mtauI = np.exp(-1.0 / (fs * 1.4))
        dc = dc_insert = 0.0
        out = np.empty_like(audio)
        for n, a in enumerate(audio):
            dc = mtauR * dc + (1.0 - mtauR) * a
            dc_insert = mtauI * dc_insert + (1.0 - mtauI) * 0.0
            out[n] = a + dc_insert - dc
        audio = out
    return audio


def ref_rx_chain(iq: np.ndarray, mode: str, bw_key: str,
                 path_name: str | None = None,
                 select_id: int | None = None,
                 translate_hz: float = 6000.0,
                 agc_mode: str = "med", agc_thresh_db: float = 60.0,
                 fade_leveler: bool = True, sam_sideband: str = "both",
                 fm_dev5: bool = False,
                 notch_enable: bool = False,
                 leaky_nr_enable: bool = False,
                 nr_enable: bool = False, nr_band=None,
                 nr_strength: int = 141,
                 nb_enable: bool = False, nb_setting: int = 8):
    """iq (T,) complex @48k -> (audio48 (T,), fs_dec).

    Follows the firmware chain stage-for-stage for one channel; flat EQ
    (biquad1/2 identity).  The DSP features insert at the firmware's
    chain positions when enabled (VERDICT r3 item 8):
      notch  — NLMS auto-notch before the PreFilter lattice
               (audio_driver.c:2443-2469);
      nb/nr  — LPC impulse blanker then spectral NR after the AGC
               (audio_driver.c:2509 hand-off; audio_nr.c:357-366 runs
               the blanker on the NR input).  nr_band = (f_low, f_high)
               Hz VAD band (the chain passes its path's audio band).
    """
    path = data.find_path("usb" if mode in ("iq", "ssbstereo") else mode,
                          bw_key, select_id=select_id, name=path_name)
    decim = path["decim"]
    fs_dec = IQ_RATE / decim

    z = freq_translate(np.asarray(iq, np.complex128), translate_hz)
    i_b, q_b = z.real.copy(), z.imag.copy()

    if mode == "fm":
        # FM: 89-tap lowpass on both planes at 48 kHz (same taps, no
        # phase shift), discriminator, de-emph/HPF, scale, AGC, treble
        h = data.fir(path["fir_i"], path["fir_numtaps"])
        i_b = cmsis_fir(h, i_b)
        q_b = cmsis_fir(h, q_b)
        disc = ref_dsp.fm_discriminator(i_b + 1j * q_b)
        audio = ref_dsp.fm_deemph_hpf(disc)
        audio = audio * (FM_RX_SCALING_5K if fm_dev5 else FM_RX_SCALING_2K5)
        audio = ref_dsp.wdsp_agc(audio, IQ_RATE, mode=agc_mode,
                                 thresh_db=agc_thresh_db)
        return audio, IQ_RATE

    if mode in ("iq", "ssbstereo"):
        # two-channel modes (audio_driver.c:2770-2777) on the firmware's
        # narrow SSB path: decimator + Hilbert pair as for SSB, then
        #   iq:        L = filtered I, R = filtered Q       (:2770-2773)
        #   ssbstereo: L = i+q (USB), R = i-q (LSB)         (:2774-2777)
        # and the decimated post chain runs PER AUDIO CHANNEL (the
        # firmware's NUM_AUDIO_CHANNELS loops).
        assert data.uses_decimated_iq(path, "usb"), "narrow paths only"
        h_dec = data.decimator(path["dec"])
        i_b = cmsis_fir_decimate(h_dec, i_b, decim)
        q_b = cmsis_fir_decimate(h_dec, q_b, decim)
        h_i = data.fir(path["fir_i"], path["fir_numtaps"])
        h_q = data.fir(path["fir_q"], path["fir_numtaps"])
        i_f = cmsis_fir(h_i, i_b)
        q_f = cmsis_fir(h_q, q_b)
        if mode == "iq":
            chans = [i_f, q_f]
        else:
            chans = [i_f + q_f, i_f - q_f]
        # per-channel lattice (the firmware's per-audio-channel loops)
        if path["pre"] is not None:
            pk, pv = data.lattice(path["pre"])
            chans = [iir_lattice_ref(pk, pv, a)[0] for a in chans]
        # LINKED stereo AGC: one detector from max(|L|, |R|), one gain
        # for both channels (AudioAgc_RunAgcWdsp use_stereo,
        # audio_agc.c:349-595)
        a2 = ref_dsp.wdsp_agc(np.stack(chans), fs_dec, mode=agc_mode,
                              thresh_db=agc_thresh_db)
        post_scale = (POST_AGC_GAIN_SCALING_DECIMATE_4 if decim == 4
                      else POST_AGC_GAIN_SCALING_DECIMATE_2)
        a2 = a2 * post_scale * 0.333
        outs = []
        for audio in a2:
            if path["interpolate"] is not None:
                h_int, _ = data.interpolator(path["interpolate"], decim)
                audio = cmsis_fir_interpolate(h_int, audio, decim)
            if path["antialias"] is not None:
                pk, pv = data.lattice(path["antialias"])
                audio, _ = iir_lattice_ref(pk, pv, audio)
            outs.append(audio)
        return np.stack(outs), fs_dec

    use_dec_iq = data.uses_decimated_iq(path, mode)

    if use_dec_iq:
        if mode in ("am", "sam"):
            # AM/SAM: the per-path AM lowpass taps ARE the decimator
            # (audio_filter.c:1168-1177)
            h_dec_i = data.fir(path["fir_i"], path["fir_numtaps"])
            h_dec_q = data.fir(path["fir_q"], path["fir_numtaps"])
        else:
            h_dec_i = h_dec_q = data.decimator(path["dec"])
        i_b = cmsis_fir_decimate(h_dec_i, i_b, decim)
        q_b = cmsis_fir_decimate(h_dec_q, q_b, decim)
        fs_iq = fs_dec

    else:
        fs_iq = IQ_RATE

    if mode not in ("am", "sam"):
        # Hilbert pair (+45/-45), at fs_iq (audio_driver.c:2731-2736)
        h_i = data.fir(path["fir_i"], path["fir_numtaps"])
        h_q = data.fir(path["fir_q"], path["fir_numtaps"])
        i_b = cmsis_fir(h_i, i_b)
        q_b = cmsis_fir(h_q, q_b)

    # demod
    if mode in ("usb", "cw"):
        audio = i_b + q_b
    elif mode == "lsb":
        audio = i_b - q_b
    elif mode == "am":
        audio = am_envelope(i_b, q_b, fs_iq, fade_leveler)
    elif mode == "sam":
        audio, _ = ref_dsp.sam_demod(i_b + 1j * q_b, fs_iq,
                                     sideband=sam_sideband,
                                     fade_leveler=fade_leveler)
    else:
        raise ValueError(mode)

    if not use_dec_iq:
        # wide SSB: decimate the demodulated audio (audio_driver.c:2800-2812)
        audio = cmsis_fir_decimate(data.decimator(path["dec"]), audio, decim)

    # ---- decimated-domain post chain (audio_driver.c:2436-2592) ----
    if notch_enable:
        # NLMS auto-notch before the PreFilter (audio_driver.c:2443-2452)
        audio = ref_dsp.nlms_notch(audio)

    if leaky_nr_enable:
        # WDSP variable-leak LMS NR at the firmware's pre-AGC position
        # (AudioDriver_LeakyLmsNr insertion, audio_driver.c:2461-2468)
        audio = ref_dsp.leaky_lms(audio, notch=False)

    # IIR-lattice PreFilter:
    if path["pre"] is not None:
        pk, pv = data.lattice(path["pre"])
        audio, _ = iir_lattice_ref(pk, pv, audio)

    audio = ref_dsp.wdsp_agc(audio, fs_dec, mode=agc_mode,
                             thresh_db=agc_thresh_db,
                             remove_dc=mode in ("am", "sam"))

    if nb_enable or nr_enable:
        from . import ref_nr
        # the deferred NR stage consumes 128-sample frames; pad to the
        # frame multiple and trim after (the streaming chain carries the
        # remainder across blocks instead)
        n0 = len(audio)
        pad = (-n0) % 128
        a = np.concatenate([audio, np.zeros(pad)]) if pad else audio
        if nb_enable:
            a = ref_nr.alt_noise_blanking_ref(a, nb_setting=nb_setting)
        if nr_enable:
            lo, hi = nr_band if nr_band is not None else (275.0, 2625.0)
            bin_bw = fs_dec / 256.0
            vad_low = int(np.clip(int(lo / bin_bw), 1, 126))
            vad_high = int(np.clip(int(hi / bin_bw), vad_low + 1, 128))
            a = ref_nr.spectral_nr_ref(a, vad_low, vad_high,
                                       alpha=0.799 + nr_strength / 1000.0)
        audio = a[:n0]

    post_scale = (POST_AGC_GAIN_SCALING_DECIMATE_4 if decim == 4
                  else POST_AGC_GAIN_SCALING_DECIMATE_2)
    audio = audio * post_scale * (0.5 if mode in ("am", "sam") else 0.333)

    # biquad1: identity at default settings
    # interpolate back to 48 kHz
    if path["interpolate"] is not None:
        h_int, _ = data.interpolator(path["interpolate"], decim)
        audio = cmsis_fir_interpolate(h_int, audio, decim)

    if path["antialias"] is not None:
        pk, pv = data.lattice(path["antialias"])
        audio, _ = iir_lattice_ref(pk, pv, audio)

    # biquad2 (treble shelf): identity at default settings
    return audio, fs_dec
