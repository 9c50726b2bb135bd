"""FreeDV 700D-class stack: LDPC, OFDM modem, 700 bps vocoder, full loop."""
import numpy as np
from scipy.signal import lfilter

from uhsdr_tpu.modems import ldpc, ofdm, vocoder
from uhsdr_tpu.modems.freedv import FreeDv700D


def test_ldpc_roundtrip_and_correction():
    rng = np.random.default_rng(5)
    d = rng.integers(0, 2, ldpc.K)
    cw = ldpc.encode(d)
    assert not (ldpc._H @ cw % 2).any()
    # clean
    dec, ok = ldpc.decode((1 - 2 * cw.astype(float)) * 4.0)
    assert ok and (dec == d).all()
    # AWGN at 4 dB Eb/N0: should be error-free nearly always
    sigma = np.sqrt(1 / (2 * 0.5 * 10 ** 0.4))
    errs = 0
    for _ in range(10):
        d = rng.integers(0, 2, ldpc.K)
        x = 1 - 2 * ldpc.encode(d).astype(float)
        y = x + sigma * rng.standard_normal(ldpc.N)
        dec, _ = ldpc.decode(2 * y / sigma ** 2)
        errs += int((dec != d).sum())
    assert errs <= 5, errs


def test_ofdm_loopback_with_impairments():
    rng = np.random.default_rng(6)
    nframes = 10
    bits = rng.integers(0, 2, (nframes, ofdm.BITS_PER_FRAME))
    mod = ofdm.OfdmModulator()
    sig = np.concatenate([mod.modulate_frame(b) for b in bits])
    t = np.arange(len(sig))
    delayed = np.concatenate([np.zeros(217, np.complex64),
                              sig * np.exp(1j * 2 * np.pi * 9.0 * t / 8000)])
    dem = ofdm.OfdmDemodulator()
    rx, snrs = dem.demod(delayed.astype(np.complex64))
    assert rx.shape[0] >= nframes - 2
    k0 = min(range(3), key=lambda k: (bits[k] != rx[0]).sum())
    n = min(rx.shape[0], nframes - k0)
    errs = sum(int((bits[k0 + i] != rx[i]).sum()) for i in range(n))
    assert errs == 0, errs
    assert abs(dem.foff_hz - 9.0) < 1.0


def test_ofdm_awgn_ber_low():
    rng = np.random.default_rng(7)
    nframes = 10
    bits = rng.integers(0, 2, (nframes, ofdm.BITS_PER_FRAME))
    mod = ofdm.OfdmModulator()
    sig = np.concatenate([mod.modulate_frame(b) for b in bits])
    # noise scaled to the SIGNAL rms (the reference waveform is 1/M
    # scaled, rms ~0.013 — absolute noise levels would swamp it)
    rms = float(np.sqrt(np.mean(np.abs(sig) ** 2)))
    noise = (rng.standard_normal(len(sig)) +
             1j * rng.standard_normal(len(sig))) * np.sqrt(0.5) * rms
    dem = ofdm.OfdmDemodulator()
    rx, _ = dem.demod((sig + 10 ** (-6 / 20) * noise).astype(np.complex64))
    assert rx.shape[0] >= nframes - 2
    k0 = min(range(3), key=lambda k: (bits[k] != rx[0]).sum())
    n = min(rx.shape[0], nframes - k0)
    errs = sum(int((bits[k0 + i] != rx[i]).sum()) for i in range(n))
    assert errs / (n * ofdm.BITS_PER_FRAME) < 0.04


def test_vocoder_700_roundtrip():
    exc = np.zeros(320)
    exc[::80] = 1.0
    sp = lfilter([1], [1, -1.4, 0.8], exc) * 900
    bits = vocoder.encode_frame_700(sp)
    assert bits.shape == (vocoder.BITS_PER_FRAME_700,)
    fr = vocoder.decode_frame_700_bits(bits)
    assert fr.voicing.all()
    assert abs(fr.pitch_lag - 80) <= 4


def test_freedv700d_full_loopback_with_noise():
    rng = np.random.default_rng(8)
    n = 12800
    exc = np.zeros(n)
    exc[::80] = 1.0
    speech = lfilter([1], [1, -1.5, 0.9], exc) * 1000
    sig = FreeDv700D().mod(speech)
    assert len(sig) == (n // 1280) * 1280

    # clean
    rx = FreeDv700D()
    out = rx.demod(sig.astype(np.complex64))
    assert rx.frames_decoded >= 8
    assert rx.fec_failures == 0
    rms = np.sqrt((out[2560:] ** 2).mean())
    in_rms = np.sqrt((speech ** 2).mean())
    assert 0.2 * in_rms < rms < 4.0 * in_rms

    # 6 dB AWGN (relative to the 1/M-scaled waveform rms): FEC keeps it
    # alive
    sig_rms = float(np.sqrt(np.mean(np.abs(sig) ** 2)))
    noise = (rng.standard_normal(len(sig)) +
             1j * rng.standard_normal(len(sig))) * np.sqrt(0.5) * sig_rms
    rx2 = FreeDv700D()
    out2 = rx2.demod((sig + 10 ** (-6 / 20) * noise).astype(np.complex64))
    assert rx2.frames_decoded >= 6
    assert np.isfinite(out2).all()
