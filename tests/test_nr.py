"""Spectral NR unit tests (`nr/spectral.py`)."""
import jax
import jax.numpy as jnp
import numpy as np

from uhsdr_tpu.nr import spectral as nr


def _smooth_reference(params, hk, X):
    """Independent pure-NumPy scalar port of the reference's
    musical-noise smoothing (`audio_nr.c:2078-2140`), pinning:
      * NN = 1 + 2*(int)(0.5 + width*(1 - ratio/thresh)) — C (int)
        truncation, i.e. round-half-up for positive operands;
      * the NN-sample symmetric average divided by NN;
      * application to bins [VAD_low+NN/2, VAD_high-NN/2) ONLY — the
        firmware's one-sided edge averages land in `NR.Nest` scratch
        that `spectral_noise_reduction_3` never copies back to Hk, so
        edge bins keep their unsmoothed value.
    """
    lo, hi = int(params.vad_low), int(params.vad_high)
    width = float(nr.MN_WIDTH)
    thresh = float(params.power_threshold)
    hk_np = np.asarray(hk, np.float64)
    x_np = np.asarray(X, np.float64)
    out = hk_np.copy()
    flat_h = hk_np.reshape(-1, hk_np.shape[-1])
    flat_x = x_np.reshape(-1, x_np.shape[-1])
    flat_o = out.reshape(-1, out.shape[-1])
    for c in range(flat_h.shape[0]):
        h, x = flat_h[c], flat_x[c]
        pre = x[lo:hi].sum()
        post = (h[lo:hi] ** 2 * x[lo:hi]).sum()
        ratio = post / max(pre, 1e-20)
        if ratio > thresh:
            continue
        NN = 1 + 2 * int(0.5 + width * (1.0 - ratio / thresh))
        half = NN // 2
        for b in range(lo + half, hi - half):
            flat_o[c, b] = h[b - half: b + half + 1].sum() / NN
    return out.reshape(hk_np.shape)


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
