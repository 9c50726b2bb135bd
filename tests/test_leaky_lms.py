"""WDSP variable-leak LMS ("leaky LMS") — `AudioDriver_LeakyLmsNr`
(`audio_driver.c:521-577`): scalar-port equivalence + behavior +
chain wiring (VERDICT round-1 items 5/6)."""
import jax.numpy as jnp
import numpy as np

from tests.golden import ref_dsp
from uhsdr_tpu.ops import lms

FS = 12000.0


def test_leaky_lms_matches_scalar_port():
    rng = np.random.default_rng(7)
    n = 3000
    t = np.arange(n) / FS
    x = (200.0 * np.sin(2 * np.pi * 600 * t)
         + 50.0 * rng.standard_normal(n)).astype(np.float32)

    ref = ref_dsp.leaky_lms(x, notch=False)

    params = lms.leaky_lms_params(notch=False)
    state = lms.leaky_lms_init((), params)
    # two blocks: exercises streaming state handoff
    y1, state = lms.leaky_lms_run(params, state, jnp.asarray(x[:1500]))
    y2, state = lms.leaky_lms_run(params, state, jnp.asarray(x[1500:]))
    y = np.concatenate([np.asarray(y1), np.asarray(y2)])

    err = np.abs(y - ref)
    scale = np.abs(ref).max() + 1e-9
    assert err.max() / scale < 5e-4, err.max() / scale


def test_leaky_lms_nr_keeps_tone_drops_noise():
    """NR mode outputs the prediction: correlated (tonal/speech-like)
    content survives, broadband noise is suppressed."""
    rng = np.random.default_rng(1)
    n = 12000
    t = np.arange(n) / FS
    tone = 300.0 * np.sin(2 * np.pi * 700 * t)
    noise = 120.0 * rng.standard_normal(n)
    params = lms.leaky_lms_params(notch=False)
    state = lms.leaky_lms_init((), params)
    y, _ = lms.leaky_lms_run(params, state,
                             jnp.asarray((tone + noise).astype(np.float32)))
    y = np.asarray(y)[n // 2:]

    def tone_noise(sig):
        spec = np.abs(np.fft.rfft(sig * np.hanning(len(sig)))) ** 2
        f = np.fft.rfftfreq(len(sig), 1 / FS)
        tp = spec[np.abs(f - 700) < 40].sum()
        np_ = spec[np.abs(f - 700) >= 40].sum()
        return 10 * np.log10(tp / np_)

    snr_in = tone_noise((tone + noise)[n // 2:])
    snr_out = tone_noise(y)
    assert snr_out > snr_in + 6.0, (snr_in, snr_out)


def test_leaky_lms_notch_attenuates_carrier():
    """Notch mode (error output) adapts to cancel a steady carrier.  The
    reference's two_mu = 1e-4 converges slowly by design (~20% amplitude
    per 4000 samples, verified against the scalar port), so assert the
    monotone decay rather than full cancellation."""
    n = 24000
    t = np.arange(n) / FS
    carrier = 500.0 * np.sin(2 * np.pi * 800 * t).astype(np.float32)
    params = lms.leaky_lms_params(notch=True)
    state = lms.leaky_lms_init((), params)
    y, _ = lms.leaky_lms_run(params, state, jnp.asarray(carrier))
    y = np.asarray(y)
    head = np.abs(y[:4000]).max()
    tail = np.abs(y[-4000:]).max()
    assert tail < 0.5 * head, (head, tail)


def test_chain_wiring_leaky_nr():
    """RxConfig(leaky_nr_enable=True) runs end-to-end and differs from the
    plain chain (the stage is actually in the path)."""
    from uhsdr_tpu.chain import rx as rx_mod

    rng = np.random.default_rng(3)
    n = 8192
    fs = 48000.0
    t = np.arange(n) / fs
    iq = (4000.0 * np.exp(2j * np.pi * 6700.0 * t)
          + 300.0 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
          ).astype(np.complex128)

    out = {}
    for leaky in (False, True):
        cfg = rx_mod.RxConfig(mode="usb", block_len=n, front_impl="xla",
                              leaky_nr_enable=leaky)
        chain = rx_mod.RxChain(cfg)
        state = chain.init_state(batch_shape=(1,))
        audio, _, _ = chain(state, iq=iq[None, :])
        out[leaky] = np.asarray(audio)[0]
    assert np.isfinite(out[True]).all()
    assert not np.allclose(out[True], out[False])
