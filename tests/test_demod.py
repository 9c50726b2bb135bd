import numpy as np
import jax.numpy as jnp
import pytest

from uhsdr_tpu.demod import am, fm, sam, ssb
from uhsdr_tpu.ops import design
from golden import ref_dsp


def make_am_signal(fs, n, carrier_offset=30.0, fm_mod=None, seed=0):
    """AM carrier near DC (post freq-translation) with 400 Hz modulation."""
    t = np.arange(n) / fs
    mod = 1.0 + 0.5 * np.sin(2 * np.pi * 400 * t)
    ph = 2 * np.pi * carrier_offset * t
    return (mod * np.exp(1j * ph)).astype(np.complex64)


def test_am_envelope_matches_golden():
    fs = 12000
    x = make_am_signal(fs, 6000)
    params = am.fade_leveler_params(fs)
    state = am.fade_leveler_init((1,))
    y, _ = am.demod(jnp.asarray(x)[None], params, state)
    y = np.asarray(y)[0]
    # golden: envelope + scalar fade leveler
    mtauR, mtauI = np.exp(-1 / (fs * 0.02)), np.exp(-1 / (fs * 1.4))
    dc = dci = 0.0
    ref = np.zeros(len(x))
    for n, z in enumerate(x):
        audio = abs(z)
        dc = mtauR * dc + (1 - mtauR) * audio
        dci = mtauI * dci + (1 - mtauI) * 0.0
        ref[n] = audio + dci - dc
    np.testing.assert_allclose(y, ref, atol=1e-3)


@pytest.mark.parametrize("sideband", ["usb", "both"])
def test_sam_matches_golden(sideband):
    fs = 12000
    n = 4000
    x = make_am_signal(fs, n, carrier_offset=47.0)
    x = x + 0.01 * (np.random.default_rng(0).standard_normal(n)
                    + 1j * np.random.default_rng(1).standard_normal(n)
                    ).astype(np.complex64)
    x = x.astype(np.complex64)
    ref, ref_omega = ref_dsp.sam_demod(x.astype(np.complex128), fs,
                                       sideband=sideband)
    params = sam.make_params(fs)
    state = sam.init_state((1,))
    # stream in 4 blocks to exercise state carry
    outs = []
    for i in range(0, n, 1000):
        y, omega, state = sam.demod(params, state, jnp.asarray(x[None, i:i+1000]),
                                    sideband=sideband)
        outs.append(np.asarray(y)[0])
    y = np.concatenate(outs)
    # PLL transients are chaotic-ish in float32; compare after lock
    err = y[2000:] - ref[2000:]
    sig = np.sqrt(np.mean(ref[2000:] ** 2))
    snr = 20 * np.log10(sig / (np.sqrt(np.mean(err ** 2)) + 1e-12))
    assert snr > 40, snr


def test_sam_locks_to_carrier():
    """PLL should report the carrier offset in omega."""
    fs = 12000
    n = 12000
    x = make_am_signal(fs, n, carrier_offset=80.0)
    params = sam.make_params(fs)
    state = sam.init_state((1,))
    y, omega, state = sam.demod(params, state, jnp.asarray(x)[None])
    f_locked = float(np.asarray(omega)[0]) * fs / (2 * np.pi)
    assert abs(f_locked - 80.0) < 8.0, f_locked


def test_fm_discriminator_matches_golden():
    fs = 48000
    n = 48000
    t = np.arange(n) / fs
    audio_ref = np.sin(2 * np.pi * 1000 * t)
    dev = 2500.0
    phase = 2 * np.pi * dev / fs * np.cumsum(audio_ref)
    x = np.exp(1j * phase).astype(np.complex64)
    ref_angle = ref_dsp.fm_discriminator(x.astype(np.complex128))
    ref_audio = ref_dsp.fm_deemph_hpf(ref_angle)

    params = fm.make_params(fs, sql_threshold=0, subtone_hz=0.0)
    state = fm.init_state((1,), params)
    outs = []
    for i in range(0, n, 16000):
        y, state = fm.demod(params, state, jnp.asarray(x[None, i:i+16000]))
        outs.append(np.asarray(y)[0])
    y = np.concatenate(outs)
    err = y[1000:] - ref_audio[1000:]
    sig = np.sqrt(np.mean(ref_audio[1000:] ** 2))
    snr = 20 * np.log10(sig / (np.sqrt(np.mean(err ** 2)) + 1e-12))
    assert snr > 45, snr


def test_fm_demod_recovers_tone():
    fs = 48000
    n = 48000
    t = np.arange(n) / fs
    audio_ref = np.sin(2 * np.pi * 1000 * t)
    dev = 2500.0
    phase = 2 * np.pi * dev / fs * np.cumsum(audio_ref)
    x = np.exp(1j * phase).astype(np.complex64)
    params = fm.make_params(fs)
    state = fm.init_state((1,), params)
    y, _ = fm.demod(params, state, jnp.asarray(x)[None])
    y = np.asarray(y)[0, 4000:]
    # dominant frequency should be 1 kHz
    spec = np.abs(np.fft.rfft(y * np.hanning(len(y))))
    fpk = np.argmax(spec) * fs / len(y)
    assert abs(fpk - 1000.0) < 10, fpk


def test_ssb_analytic_filter_demod():
    """End-to-end sideband check: modulated USB signal demods to audio tone;
    LSB image is rejected."""
    fs = 12000
    n = 12000
    t = np.arange(n) / fs
    # simulate a USB signal: audio tone at 700 Hz appears at +700 Hz in IQ
    x_usb = np.exp(2j * np.pi * 700 * t).astype(np.complex64)
    x_lsb = np.exp(-2j * np.pi * 700 * t).astype(np.complex64)
    h = design.complex_bandpass_fir(199, 200, 2900, fs).astype(np.complex64)
    from uhsdr_tpu.ops import fir
    for x, expect in [(x_usb, True), (x_lsb, False)]:
        carry = fir.init_carry((1,), 199, jnp.complex64)
        z, _ = fir.fir_block(jnp.asarray(h), carry, jnp.asarray(x)[None])
        audio = np.asarray(ssb.demod(z))[0][400:]
        p = np.mean(audio ** 2)
        if expect:
            assert p > 0.2, p
        else:
            assert p < 1e-5, p


def test_pll_pallas_matches_scan():
    """Pallas SAM PLL kernel vs the XLA scan (interpret mode), streamed."""
    import jax
    from uhsdr_tpu.pallas import pll as pallas_pll
    fs = 12000.0
    params = sam.make_params(fs)
    rng = np.random.default_rng(9)
    C, T = 1024, 512
    t = np.arange(2 * T) / fs
    x = (0.8 * np.exp(2j * np.pi * 37.0 * t)[None]
         * np.ones((C, 1)) +
         0.05 * (rng.standard_normal((C, 2 * T))
                 + 1j * rng.standard_normal((C, 2 * T)))).astype(np.complex64)

    st = sam.init_state((C,))
    cos_ref, sin_ref = [], []
    stt = st
    for blk in (x[:, :T], x[:, T:]):
        phases, _, phs_f, fil_f, om_f = sam._pll_scan(params, stt,
                                                      jnp.asarray(blk))
        cos_ref.append(np.cos(np.asarray(phases)))
        sin_ref.append(np.sin(np.asarray(phases)))
        stt = stt._replace(phs=phs_f, fil_out=fil_f, omega2=om_f)

    carry = jnp.zeros((3, C), jnp.float32)
    cos_k, sin_k = [], []
    for blk in (x[:, :T], x[:, T:]):
        c, s, carry = pallas_pll.pll_pallas(
            float(params.g1), float(params.g2), float(params.omega_min),
            float(params.omega_max), carry, jnp.asarray(blk), t_tile=256)
        cos_k.append(np.asarray(c))
        sin_k.append(np.asarray(s))
    np.testing.assert_allclose(np.concatenate(cos_k, -1),
                               np.concatenate(cos_ref, -1), atol=2e-4)
    np.testing.assert_allclose(np.concatenate(sin_k, -1),
                               np.concatenate(sin_ref, -1), atol=2e-4)
    np.testing.assert_allclose(np.asarray(carry[2]), np.asarray(stt.omega2),
                               atol=1e-4)


def test_pll_audio_pallas_matches_scan_plus_fade():
    """Fused PLL+audio+fade-leveler kernel (SAM sideband='both' fast
    path) vs the scan PLL + separate mix + am.fade_leveler, streamed
    over two blocks (interpret mode)."""
    import jax
    from uhsdr_tpu.demod import am
    from uhsdr_tpu.pallas import pll as pallas_pll
    fs = 12000.0
    params = sam.make_params(fs)
    rng = np.random.default_rng(11)
    C, T = 1024, 512
    t = np.arange(2 * T) / fs
    x = (0.8 * (1 + 0.4 * np.sin(2 * np.pi * 300 * t))[None]
         * np.exp(2j * np.pi * 25.0 * t)[None] * np.ones((C, 1)) +
         0.03 * (rng.standard_normal((C, 2 * T))
                 + 1j * rng.standard_normal((C, 2 * T)))).astype(np.complex64)

    # reference: scan PLL + mix + fade leveler
    st = sam.init_state((C,))
    fade_st = st.fade
    ref = []
    stt = st
    for blk in (x[:, :T], x[:, T:]):
        phases, _, phs_f, fil_f, om_f = sam._pll_scan(params, stt,
                                                      jnp.asarray(blk))
        cos_p, sin_p = np.cos(np.asarray(phases)), np.sin(np.asarray(phases))
        corr = blk.real * cos_p + blk.imag * sin_p
        audio, fade_st = am.fade_leveler(params.fade, fade_st,
                                         jnp.asarray(corr),
                                         jnp.asarray(corr))
        ref.append(np.asarray(audio))
        stt = stt._replace(phs=phs_f, fil_out=fil_f, omega2=om_f)
    ref = np.concatenate(ref, -1)

    carry = jnp.zeros((5, C), jnp.float32)
    got = []
    for blk in (x[:, :T], x[:, T:]):
        a, carry = pallas_pll.pll_audio_pallas(
            float(params.g1), float(params.g2), float(params.omega_min),
            float(params.omega_max), float(params.fade.mtauR),
            float(params.fade.mtauI), carry, jnp.asarray(blk), t_tile=256)
        got.append(np.asarray(a))
    got = np.concatenate(got, -1)
    np.testing.assert_allclose(got, ref, atol=3e-4)
