"""FreeDV 1600 stack: Golay FEC, FDMDV modem, vocoder, full loopback."""
import numpy as np
import pytest
from scipy.signal import lfilter

from uhsdr_tpu.modems import fdmdv, golay, vocoder
from uhsdr_tpu.modems.freedv import FreeDv1600


def test_golay_corrects_up_to_3_errors():
    rng = np.random.default_rng(3)
    data = rng.integers(0, 4096, 100)
    cw = golay.encode(data)
    corrupted = cw.copy()
    for i in range(len(cw)):
        for b in rng.choice(23, 3, replace=False):
            corrupted[i] ^= 1 << int(b)
    dec, ncorr = golay.decode(corrupted)
    assert (dec == data).all()
    assert (ncorr == 3).all()


def _best_ber(rx, tx, skip=12):
    """Steady-state BER under the unknown modem delay (the matched-filter
    pulse delay is ~6 symbols; framing recovers it via Golay in the
    stack, tests search it)."""
    best = (1e9, 0)
    for off in range(-10, 11):
        errs = cnt = 0
        for i in range(skip, len(rx)):
            j = i + off
            if 0 <= j < len(tx):
                errs += int((rx[i] != tx[j]).sum())
                cnt += 1
        if cnt > 30:
            r = errs / (cnt * fdmdv.BITS_PER_SYMBOL)
            if r < best[0]:
                best = (r, off)
    return best[0]


def test_fdmdv_loopback_clean_and_offset():
    rng = np.random.default_rng(0)
    nsym = 80
    bits = rng.integers(0, 2, (nsym, fdmdv.BITS_PER_SYMBOL))
    sig = fdmdv.FdmdvModulator().modulate_frame(bits)

    for foff in (0.0, 20.0, -53.0):
        chan = sig * np.exp(1j * 2 * np.pi * foff *
                            np.arange(len(sig)) / fdmdv.FS)
        dem = fdmdv.FdmdvDemodulator()
        rx, sync = dem.demod_symbols(chan.astype(np.complex128))
        assert _best_ber(rx, bits) == 0.0, foff
        assert abs(dem.foff_hz - foff) < 4.0
        # pilot flip flag alternates when locked
        assert (np.asarray(sync[-8:])[1::2] !=
                np.asarray(sync[-8:])[0::2]).all()


def test_fdmdv_loopback_awgn():
    rng = np.random.default_rng(1)
    nsym = 80
    bits = rng.integers(0, 2, (nsym, fdmdv.BITS_PER_SYMBOL))
    sig = fdmdv.FdmdvModulator().modulate_frame(bits)
    snr_scale = np.abs(sig).std()
    noise = (rng.standard_normal(len(sig)) +
             1j * rng.standard_normal(len(sig))) * np.sqrt(0.5)
    chan = sig + 10 ** (-12 / 20) * snr_scale * noise
    dem = fdmdv.FdmdvDemodulator()
    rx, _ = dem.demod_symbols(chan.astype(np.complex128))
    assert _best_ber(rx, bits) < 0.01


def test_vocoder_roundtrip_preserves_pitch_and_level():
    fs = 8000
    n = 3200
    pitch = 80
    exc = np.zeros(n)
    exc[::pitch] = 1.0
    sp = lfilter([1], [1, -1.5, 0.9], exc) * 1000
    v = vocoder.Vocoder()
    bits = v.encode(sp)
    assert bits.shape == (10, vocoder.BITS_PER_FRAME)
    fr = vocoder.decode_frame_bits(bits[5])
    assert abs(fr.pitch_lag - pitch) <= 2
    assert fr.voicing.all()
    out = v.decode(bits)
    in_rms = np.sqrt((sp ** 2).mean())
    out_rms = np.sqrt((out[640:] ** 2).mean())
    assert 0.4 * in_rms < out_rms < 2.5 * in_rms


def test_lpc_lsp_roundtrip():
    rng = np.random.default_rng(2)
    x = lfilter([1], [1, -1.2, 0.6], rng.standard_normal(320) * 100)
    a, _ = vocoder._autocorr_lpc(x)
    lsp = vocoder.lpc_to_lsp(a)
    a2 = vocoder.lsp_to_lpc(lsp)
    np.testing.assert_allclose(a, a2, atol=1e-8)
    assert (np.diff(lsp) > 0).all()


def test_freedv1600_full_loopback():
    fs = 8000
    n = 8000
    pitch = 80
    exc = np.zeros(n)
    exc[::pitch] = 1.0
    speech = lfilter([1], [1, -1.5, 0.9], exc) * 1000

    tx = FreeDv1600()
    sig = tx.mod(speech)
    assert len(sig) == (n // 320) * 320

    rx = FreeDv1600()
    pieces = [rx.demod(sig[k:k + 960]) for k in range(0, len(sig), 960)]
    out = np.concatenate([p for p in pieces if p.size])
    assert rx.frames_decoded >= 15
    # post-lock the FEC sees a clean channel
    assert rx.parity_errors <= 3 * 4   # only startup frames may be dirty
    # decoded audio present at sane level
    tail = out[len(out) // 2:]
    rms = np.sqrt((tail ** 2).mean())
    in_rms = np.sqrt((speech ** 2).mean())
    assert 0.2 * in_rms < rms < 4.0 * in_rms


def test_freedv1600_survives_freq_offset_and_noise():
    rng = np.random.default_rng(4)
    n = 8000
    exc = np.zeros(n)
    exc[::100] = 1.0
    speech = lfilter([1], [1, -1.3, 0.7], exc) * 800
    sig = FreeDv1600().mod(speech)
    t = np.arange(len(sig))
    chan = sig * np.exp(1j * 2 * np.pi * 31.0 * t / 8000)
    noise = (rng.standard_normal(len(sig)) +
             1j * rng.standard_normal(len(sig))) * np.sqrt(0.5)
    chan = chan + 10 ** (-10 / 20) * noise
    rx = FreeDv1600()
    _ = rx.demod(chan.astype(np.complex64))
    assert rx.frames_decoded >= 10
    assert abs(rx.demodulator.foff_hz - 31.0) < 2.0
