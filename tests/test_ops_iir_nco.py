import numpy as np
import jax.numpy as jnp
import pytest
from scipy import signal as sps

from uhsdr_tpu.ops import design, iir, nco, goertzel


def test_biquad_block_matches_lfilter():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((4, 2048)).astype(np.float32)
    c = design.biquad_peak(1000, 300, 6.0, 12000).astype(np.float32)
    b = c[:3]
    a = np.concatenate([[1.0], c[3:]])
    state = jnp.zeros((4, 2), jnp.float32)
    outs = []
    for i in range(0, 2048, 512):
        y, state = iir.biquad_block(jnp.asarray(c), state,
                                    jnp.asarray(x[:, i:i + 512]))
        outs.append(np.asarray(y))
    y = np.concatenate(outs, axis=-1)
    ref = sps.lfilter(b, a, x, axis=-1)
    np.testing.assert_allclose(y, ref, atol=1e-3, rtol=1e-3)


def test_biquad_cascade_matches_sosfilt():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 2048)).astype(np.float32)
    sos_np = design.audio_bandpass_sos(300, 2700, 12000, order=10)
    sos = jnp.asarray(sos_np, jnp.float32)
    state = iir.sos_init_state(sos_np, (2,))
    outs = []
    for i in range(0, 2048, 512):
        y, state = iir.biquad_cascade_block(sos, state,
                                            jnp.asarray(x[:, i:i + 512]))
        outs.append(np.asarray(y))
    y = np.concatenate(outs, axis=-1)
    scipy_sos = np.concatenate(
        [sos_np[:, :3], np.ones((sos_np.shape[0], 1)), sos_np[:, 3:]], axis=1)
    ref = sps.sosfilt(scipy_sos, x, axis=-1)
    np.testing.assert_allclose(y, ref, atol=5e-3, rtol=5e-3)


def test_one_pole():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((3, 1000)).astype(np.float32)
    a, b = 0.95, 0.05
    state = jnp.zeros((3,), jnp.float32)
    y, last = iir.one_pole_block(a, b, state, jnp.asarray(x))
    ref = sps.lfilter([b], [1.0, -a], x, axis=-1)
    np.testing.assert_allclose(np.asarray(y), ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(last), ref[:, -1], atol=1e-5)


def test_dc_blocker_removes_dc():
    # r=0.9999 -> tau = 10k samples; give it 6 taus to settle
    fs = 12000
    n = 60000
    t = np.arange(n) / fs
    x = (3.0 + np.sin(2 * np.pi * 700 * t)).astype(np.float32)[None]
    state = jnp.zeros((1, 2), jnp.float32)
    y, _ = iir.dc_blocker_block(0.9999, state, jnp.asarray(x))
    tail = np.asarray(y)[0, 50000:]
    assert abs(tail.mean()) < 0.02
    assert 0.9 < tail.std() * np.sqrt(2) < 1.1  # sine amplitude preserved


def test_iir_lattice_matches_direct_form():
    # design a small IIR, convert to lattice, check equivalence
    b, a = sps.ellip(4, 0.1, 40, 0.3)
    # tf2latc equivalent: use scipy? not available -> verify via impulse resp.
    # Instead test the lattice code against a direct computation of the same
    # lattice in numpy.
    rng = np.random.default_rng(3)
    M = 4
    k = (rng.uniform(-0.5, 0.5, M)).astype(np.float32)
    v = (rng.uniform(-1, 1, M + 1)).astype(np.float32)
    x = rng.standard_normal((2, 64)).astype(np.float32)

    # numpy golden per-sample lattice
    def np_lattice(x1d):
        g = np.zeros(M + 1, np.float64)
        out = np.zeros_like(x1d, np.float64)
        for n, xn in enumerate(x1d):
            f = xn
            gn = np.zeros(M + 1)
            for m in range(M - 1, -1, -1):
                f = f - k[m] * g[m]
                gn[m + 1] = k[m] * f + g[m]
            gn[0] = f
            g = gn
            out[n] = np.dot(gn, v)
        return out

    ref = np.stack([np_lattice(x[i]) for i in range(2)])
    state = jnp.zeros((2, M + 1), jnp.float32)
    y, _ = iir.iir_lattice_block(jnp.asarray(k), jnp.asarray(v), state,
                                 jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y), ref, atol=1e-4)


def test_nco_exactness_and_continuity():
    fs = 96000
    f0 = 12345.678
    delta = nco.freq_to_delta(f0, fs)
    phase = jnp.zeros((), jnp.uint32)
    blocks = []
    for _ in range(4):
        ph = nco.phase_ramp(phase, delta, 1024)
        blocks.append(np.asarray(ph))
        phase = nco.advance(phase, delta, 1024)
    ph_all = np.concatenate(blocks)
    n = np.arange(4096)
    ref = 2 * np.pi * np.mod(np.round(np.mod(f0 / fs, 1.0) * 2**32) * n, 2**32) / 2**32
    np.testing.assert_allclose(ph_all, ref.astype(np.float32), rtol=1e-6, atol=1e-2)


def test_nco_mix_shifts_frequency():
    fs = 48000
    n = 4096
    t = np.arange(n) / fs
    x = np.exp(2j * np.pi * 6000 * t).astype(np.complex64)[None]
    delta = nco.freq_to_delta(-6000.0, fs)
    y, _ = nco.mix(jnp.asarray(x), jnp.zeros((1,), jnp.uint32),
                   jnp.broadcast_to(delta, (1,)))
    y = np.asarray(y)[0]
    # result should be ~DC
    spec = np.abs(np.fft.fft(y * np.hanning(n)))
    assert np.argmax(spec) == 0


def test_goertzel_tone_power():
    fs = 12000
    n = 1200
    t = np.arange(n) / fs
    x = (0.7 * np.sin(2 * np.pi * 700 * t)).astype(np.float32)[None]
    p_on = goertzel.tone_power(jnp.asarray(x), 700, fs)
    p_off = goertzel.tone_power(jnp.asarray(x), 1900, fs)
    np.testing.assert_allclose(np.asarray(p_on)[0], 0.49, rtol=0.05)
    assert np.asarray(p_off)[0] < 0.001


def test_osc_block_factored_matches_direct():
    # the coarse x fine factorization must equal the direct per-sample
    # evaluation to f32 rounding for non-power-of-2-friendly deltas too
    rng = np.random.default_rng(3)
    for n in (512, 2048, 16384, 1000):   # 1000 forces small-R fallback
        phase0 = jnp.asarray(rng.integers(0, 2**32, size=(4,),
                                          dtype=np.uint32))
        delta = jnp.asarray(rng.integers(0, 2**32, size=(4,),
                                         dtype=np.uint32))
        osc = np.asarray(nco.osc_block(phase0, delta, n))
        ph = np.asarray(nco.phase_ramp(phase0, delta, n), np.float64)
        ref = np.exp(1j * ph)
        assert np.max(np.abs(osc - ref)) < 2e-5, n
        assert np.max(np.abs(np.abs(osc) - 1.0)) < 1e-5
