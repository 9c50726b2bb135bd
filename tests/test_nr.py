"""Spectral NR unit tests (`nr/spectral.py`)."""
import jax
import jax.numpy as jnp
import numpy as np

from uhsdr_tpu.nr import spectral as nr


def _smooth_reference(params, hk, X):
    """The original cumsum + take_along_axis formulation of the
    musical-noise smoothing (replaced by a static matmul — TPU gathers
    measured 1.4 s at bench shapes).  Kept here as the equivalence
    reference."""
    lo, hi = params.vad_low, params.vad_high
    nb = nr.FFT_L // 2
    band = (jnp.arange(nb) >= lo) & (jnp.arange(nb) < hi)
    pre = jnp.sum(jnp.where(band, X, 0.0), axis=-1)
    post = jnp.sum(jnp.where(band, hk * hk * X, 0.0), axis=-1)
    ratio = post / jnp.maximum(pre, 1e-20)
    apply = ratio <= params.power_threshold
    nn_half = jnp.where(
        apply,
        (0.5 + nr.MN_WIDTH * (1.0 - ratio / params.power_threshold))
        .astype(jnp.int32), 0)
    csum = jnp.cumsum(jnp.where(band, hk, 0.0), axis=-1)
    csum = jnp.concatenate([jnp.zeros_like(csum[..., :1]), csum], axis=-1)
    idx = jnp.arange(nb)
    lo_i = jnp.clip(idx - nn_half[..., None], lo, hi - 1)
    hi_i = jnp.clip(idx + nn_half[..., None], lo, hi - 1)
    s = (jnp.take_along_axis(csum, hi_i + 1, axis=-1)
         - jnp.take_along_axis(csum, lo_i, axis=-1))
    cnt = (hi_i - lo_i + 1).astype(jnp.float32)
    hk_avg = s / cnt
    return jnp.where(band & (nn_half[..., None] > 0), hk_avg, hk)


def test_musical_noise_smooth_matmul_equivalence():
    params = nr.make_params(12000.0, 275.0, 2625.0, alpha=0.94)
    rng = np.random.default_rng(3)
    C, F, nb = 16, 7, nr.FFT_L // 2
    hk = jnp.asarray(rng.uniform(0.001, 1.0, (C, F, nb)).astype(np.float32))
    # X spanning quiet and loud frames so both branches (apply / bypass)
    # and several window widths are exercised
    X = jnp.asarray((rng.uniform(0.0, 1.0, (C, F, nb)) ** 4 *
                     rng.uniform(0.1, 100.0, (C, F, 1))).astype(np.float32))
    ref = _smooth_reference(params, hk, X)
    new = nr._musical_noise_smooth(params, hk, X)
    np.testing.assert_allclose(np.asarray(new), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_nr_block_reduces_noise():
    """Bootstrap the noise estimate on noise alone (the reference's
    20-frame init, `audio_nr.c:1997-2012`), then feed tone+noise: the
    output tone-to-noise ratio must improve over the input."""
    fs = 12000.0
    params = nr.make_params(fs, 275.0, 2625.0, alpha=0.94)
    rng = np.random.default_rng(0)
    n = 8192
    t = np.arange(n) / fs
    tone = 300.0 * np.sin(2 * np.pi * 700.0 * t)
    noise = 30.0 * rng.standard_normal(3 * n)
    state = nr.init_state((1,))
    # noise-only bootstrap block
    _, state = nr.process_block(params, state,
                                jnp.asarray(noise[:n].astype(np.float32))[None])
    x = (tone + noise[n:2 * n]).astype(np.float32)[None]
    y, state = nr.process_block(params, state, jnp.asarray(x))
    # NB: evaluate on the FIRST tone block — a tone held stationary for
    # seconds is (correctly) absorbed into the MMSE noise estimate via the
    # pnsaf speech-presence floor (xt -> X with tau ~4 s), same as the
    # reference; NR's promise is for non-stationary signals.
    seg = slice(n // 4, n)        # skip the overlap-add warm-in
    out = np.asarray(y)[0][seg]
    ref = x[0][seg]

    def powers(sig):
        spec = np.abs(np.fft.rfft(sig * np.hanning(len(sig)))) ** 2
        f = np.fft.rfftfreq(len(sig), 1 / fs)
        tone_p = spec[np.abs(f - 700.0) < 30.0].sum()
        inband = spec[(f > 275) & (f < 2625) & (np.abs(f - 700.0) >= 30)].sum()
        return tone_p, inband

    tp_in, nb_in = powers(ref)
    tp_out, nb_out = powers(out)
    assert tp_out > 0.25 * tp_in, (tp_out, tp_in)      # tone survives
    assert nb_out < 0.5 * nb_in, (nb_out, nb_in)       # in-band noise cut
