import numpy as np
import jax.numpy as jnp
import pytest

from uhsdr_tpu.chain import rx


def usb_signal(fs, n, translate, tones, amps, noise=0.0, seed=0):
    """Synthesize a USB 'off-air' IQ capture: audio tones appear at
    translate + f."""
    t = np.arange(n) / fs
    z = np.zeros(n, np.complex128)
    for f, a in zip(tones, amps):
        z += a * np.exp(2j * np.pi * (translate + f) * t)
    if noise:
        rng = np.random.default_rng(seed)
        z += noise * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
    return z.astype(np.complex64)


def tone_snr(y, fs, tones):
    """Power in ±10 Hz around each tone vs everything else (dB)."""
    n = len(y)
    spec = np.abs(np.fft.rfft(y * np.hanning(n))) ** 2
    freqs = np.fft.rfftfreq(n, 1 / fs)
    mask = np.zeros(len(freqs), bool)
    for f in tones:
        mask |= np.abs(freqs - f) < 15
    sig = spec[mask].sum()
    noise = spec[~mask & (freqs > 50)].sum()
    return 10 * np.log10(sig / (noise + 1e-30))


def run_chain(chain, iq, batch=1):
    state = chain.init_state((batch,))
    outs = []
    B = chain.cfg.block_len
    n = (iq.shape[-1] // B) * B
    for i in range(0, n, B):
        blk = jnp.asarray(np.broadcast_to(iq[i:i + B], (batch, B)))
        audio, state, taps = chain(state, blk)
        outs.append(np.asarray(audio))
    return np.concatenate(outs, axis=-1)


def test_ssb_usb_end_to_end():
    fs = 48000
    n = fs * 2
    iq = usb_signal(fs, n, 6000, [700, 1900], [0.5, 0.3], noise=1e-4)
    chain = rx.RxChain(rx.RxConfig(mode="usb", bw_key="2P3KHZ",
                                   path_name="LPF", translate_hz=6000.0))
    y = run_chain(chain, iq)
    tail = y[0, fs:]
    snr = tone_snr(tail, fs, [700, 1900])
    assert snr > 30, snr


def test_ssb_rejects_opposite_sideband():
    fs = 48000
    n = fs
    # LSB-side energy (below carrier) must not appear in USB audio
    iq = usb_signal(fs, n, 6000, [-1000], [0.5])
    chain = rx.RxChain(rx.RxConfig(mode="usb", bw_key="2P3KHZ",
                                   path_name="LPF"))
    y = run_chain(chain, iq)
    rms = np.sqrt(np.mean(y[0, fs // 2:] ** 2))
    # AGC will pump noise floor up; compare against a real signal's level
    iq2 = usb_signal(fs, n, 6000, [1000], [0.5])
    chain2 = rx.RxChain(rx.RxConfig(mode="usb", bw_key="2P3KHZ",
                                    path_name="LPF"))
    y2 = run_chain(chain2, iq2)
    rms2 = np.sqrt(np.mean(y2[0, fs // 2:] ** 2))
    assert rms < 0.05 * rms2, (rms, rms2)


def test_am_end_to_end():
    fs = 48000
    n = fs * 2
    t = np.arange(n) / fs
    mod = (1.0 + 0.6 * np.sin(2 * np.pi * 600 * t))
    iq = (0.5 * mod * np.exp(2j * np.pi * 6000 * t)).astype(np.complex64)
    chain = rx.RxChain(rx.RxConfig(mode="am", bw_key="2P9KHZ",
                                   translate_hz=6000.0))
    y = run_chain(chain, iq)
    snr = tone_snr(y[0, fs:], fs, [600])
    assert snr > 25, snr


def test_sam_end_to_end():
    fs = 48000
    n = fs * 2
    t = np.arange(n) / fs
    mod = (1.0 + 0.6 * np.sin(2 * np.pi * 600 * t))
    # carrier 40 Hz off nominal — SAM PLL must track it
    iq = (0.5 * mod * np.exp(2j * np.pi * 6040 * t)).astype(np.complex64)
    chain = rx.RxChain(rx.RxConfig(mode="sam", bw_key="2P9KHZ",
                                   translate_hz=6000.0))
    y = run_chain(chain, iq)
    snr = tone_snr(y[0, fs:], fs, [600])
    assert snr > 25, snr


def test_fm_end_to_end():
    fs = 48000
    n = fs * 2
    t = np.arange(n) / fs
    audio_tx = np.sin(2 * np.pi * 1000 * t)
    phase = 2 * np.pi * 2500 / fs * np.cumsum(audio_tx)
    iq = (0.5 * np.exp(1j * (2 * np.pi * 6000 * t + phase))).astype(np.complex64)
    chain = rx.RxChain(rx.RxConfig(mode="fm", bw_key="5P0KHZ",
                                   translate_hz=6000.0))
    y = run_chain(chain, iq)
    snr = tone_snr(y[0, fs:], fs, [1000])
    assert snr > 20, snr


def test_nr_chain_suppresses_noise_keeps_speech():
    """The SPP-MMSE estimator treats stationary signals as noise (by
    design — reference constants behave identically), so the probe signal
    must be syllabic: 4 Hz burst-modulated tone.  Assert the noise floor in
    speech gaps is strongly attenuated while burst energy survives."""
    fs = 48000
    n = fs * 4
    t = np.arange(n) / fs
    # 0-1 s noise only (bootstrap) | 1-3 s speech bursts | 3-4 s noise only
    bursts = ((np.sin(2 * np.pi * 4 * t) > 0) & (t >= 1.0) & (t < 3.0))
    z = 0.3 * bursts * np.exp(2j * np.pi * (6000 + 800) * t)
    rng = np.random.default_rng(0)
    z += 0.01 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
    iq = z.astype(np.complex64)
    cfg_nr = rx.RxConfig(mode="usb", bw_key="2P3KHZ", path_name="LPF",
                         nr_enable=True, agc_mode="off")
    cfg_plain = rx.RxConfig(mode="usb", bw_key="2P3KHZ", path_name="LPF",
                            agc_mode="off")
    y_nr = run_chain(rx.RxChain(cfg_nr), iq)[0]
    y_plain = run_chain(rx.RxChain(cfg_plain), iq)[0]
    m = len(y_nr)
    # noise-only tail, after the estimator has converged (~0.5 s)
    noise_win = slice(int(3.5 * fs), m)
    # burst centers
    on = np.zeros(n, bool)
    for k in range(5, 11):
        c1 = int((k + 0.25) * fs / 4)
        on[c1 - 2000:c1 + 2000] = True
    on = on[:m]
    p_gap_nr = np.mean(y_nr[noise_win] ** 2)
    p_gap_plain = np.mean(y_plain[noise_win] ** 2)
    p_on_nr = np.mean(y_nr[on] ** 2)
    p_on_plain = np.mean(y_plain[on] ** 2)
    # >= 6 dB noise suppression, < 6 dB speech loss
    assert p_gap_nr < 0.25 * p_gap_plain, (p_gap_nr, p_gap_plain)
    assert p_on_nr > 0.25 * p_on_plain, (p_on_nr, p_on_plain)


def test_notch_kills_carrier():
    fs = 48000
    n = fs * 2
    # steady carrier (tone) + "speech" (noise in band)
    iq = usb_signal(fs, n, 6000, [1100], [0.5], noise=0.01)
    cfg = rx.RxConfig(mode="usb", bw_key="2P3KHZ", path_name="LPF",
                      notch_enable=True)
    y = run_chain(rx.RxChain(cfg), iq)
    cfgp = rx.RxConfig(mode="usb", bw_key="2P3KHZ", path_name="LPF")
    yp = run_chain(rx.RxChain(cfgp), iq)
    # tone power in the last half second, notch vs plain
    def tone_p(sig):
        spec = np.abs(np.fft.rfft(sig[-fs // 2:]))
        f = np.fft.rfftfreq(fs // 2, 1 / fs)
        return spec[np.abs(f - 1100).argmin()]
    assert tone_p(y[0]) < 0.2 * tone_p(yp[0])


def test_batched_channels_match_single():
    fs = 48000
    n = fs
    iq = usb_signal(fs, n, 6000, [700], [0.4], noise=1e-4)
    chain = rx.RxChain(rx.RxConfig(mode="usb", bw_key="2P3KHZ",
                                   path_name="LPF"))
    y1 = run_chain(chain, iq, batch=1)
    y4 = run_chain(chain, iq, batch=4)
    for c in range(4):
        # AGC output scale is ~4096, allow f32 rounding noise
        np.testing.assert_allclose(y4[c], y1[0], atol=5e-2, rtol=1e-3)


def test_rx_chain_96khz_iq_rate():
    """BASELINE config 1: the chain at 96 kHz IQ (decim scales to keep
    the decimated audio rate)."""
    import numpy as np
    import jax.numpy as jnp
    from uhsdr_tpu.chain import rx as rx_mod
    fs = 96000.0
    cfg = rx_mod.RxConfig(mode="usb", bw_key="2P3KHZ", path_name="LPF",
                          iq_rate=fs, block_len=8192)
    assert cfg.decim == 8 and cfg.fs_dec == 12000.0
    chain = rx_mod.RxChain(cfg)
    state = chain.init_state((1,))
    n = 8192 * 8
    t = np.arange(n) / fs
    iq = (0.5 * np.exp(2j * np.pi * 6700.0 * t)).astype(np.complex64)
    outs = []
    for k in range(0, n, 8192):
        y, state, _ = chain(state, iq[None, k:k + 8192])
        outs.append(np.asarray(y))
    y = np.concatenate(outs, axis=-1)[0][n // 2:]
    spec = np.abs(np.fft.rfft(y * np.hanning(len(y))))
    pk = np.fft.rfftfreq(len(y), 1 / fs)[spec.argmax()]
    assert abs(pk - 700.0) < 10.0, pk


def test_int16_plane_ingest_matches_complex():
    """`process_block` accepts (i16, q16) int16 planes (the codec's
    native sample width; runtime/iq_ingest.cpp ring) and matches the
    complex-f32 chain fed the identically converted signal exactly —
    here on the XLA fallback path; the Pallas kernels' i16 path is
    covered by test_pallas_fir.test_pallas_fir_int16_ingest."""
    cfg = rx.RxConfig(mode="usb", bw_key="2P3KHZ", path_name="LPF",
                      translate_hz=6000.0, block_len=4096)
    params = rx.make_params(cfg)
    rng = np.random.default_rng(3)
    C, B = 2, 4096
    i16 = np.clip(rng.standard_normal((C, 2 * B)) * 3277, -32767,
                  32767).astype(np.int16)
    q16 = np.clip(rng.standard_normal((C, 2 * B)) * 3277, -32767,
                  32767).astype(np.int16)
    sc = np.float32(1.0 / 32768.0)
    zc = (i16.astype(np.float32) * sc
          + 1j * (q16.astype(np.float32) * sc)).astype(np.complex64)

    st16 = rx.init_state(cfg, params, (C,))
    stc = rx.init_state(cfg, params, (C,))
    outs16, outsc = [], []
    for i in range(0, 2 * B, B):
        a16, st16, _ = rx.process_block(
            cfg, params, st16,
            (jnp.asarray(i16[:, i:i + B]), jnp.asarray(q16[:, i:i + B])))
        ac, stc, _ = rx.process_block(cfg, params, stc,
                                      jnp.asarray(zc[:, i:i + B]))
        outs16.append(np.asarray(a16))
        outsc.append(np.asarray(ac))
    np.testing.assert_array_equal(np.concatenate(outs16, -1),
                                  np.concatenate(outsc, -1))
