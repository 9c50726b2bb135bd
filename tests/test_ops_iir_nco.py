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


def test_one_pole_df2t_mapping_pallas():
    """The Pallas fast path of one_pole_block maps the direct-form state
    to DF2T (s1 = a*y_prev) and back; validate the mapping by invoking the
    kernel directly (interpret mode on CPU) against the XLA dilated scan,
    streamed over two blocks."""
    from uhsdr_tpu.pallas import iir as pallas_iir
    rng = np.random.default_rng(6)
    C, T = 8, 512
    a, b = 0.98, 0.02
    x = rng.standard_normal((C, 2 * T)).astype(np.float32) * 5.0

    state = jnp.zeros((C,), jnp.float32)
    ys_ref = []
    for blk in (x[:, :T], x[:, T:]):
        y, state = iir.one_pole_block(a, b, state, jnp.asarray(blk))
        ys_ref.append(np.asarray(y))

    sos = np.array([[b, 0.0, 0.0, -a, 0.0]], np.float32)
    y_prev = jnp.zeros((C,), jnp.float32)
    ys = []
    for blk in (x[:, :T], x[:, T:]):
        st = jnp.stack([np.float32(a) * y_prev,
                        jnp.zeros_like(y_prev)], axis=-1)[None]
        y, st_o = pallas_iir.biquad_cascade_pallas(sos, st, jnp.asarray(blk),
                                                   t_tile=128)
        y_prev = st_o[0, ..., 0] / np.float32(a)
        ys.append(np.asarray(y))
    np.testing.assert_allclose(np.concatenate(ys, -1),
                               np.concatenate(ys_ref, -1),
                               rtol=1e-5, atol=1e-4)


def test_fm_deemph_hpf_df2t_mapping():
    """FM's fused 2-section cascade (de-emphasis LPF + audio HPF) with the
    direct-form <-> DF2T state mapping used in demod.fm, vs the two
    one-pole formulation, streamed over two blocks."""
    from uhsdr_tpu.pallas import iir as pallas_iir
    from uhsdr_tpu.demod.fm import LPF_ALPHA as al, HPF_ALPHA as ah
    rng = np.random.default_rng(7)
    C, T = 8, 512
    angle = rng.standard_normal((C, 2 * T)).astype(np.float32)

    # reference: the direct one-pole pair
    lpf = jnp.zeros((C,), jnp.float32)
    hpf_a = jnp.zeros((C,), jnp.float32)
    hpf_b = jnp.zeros((C,), jnp.float32)
    ys_ref = []
    for blk in (angle[:, :T], angle[:, T:]):
        blk = jnp.asarray(blk)
        deemph, lpf = iir.one_pole_block(1.0 - al, al, lpf, blk)
        a_d = jnp.concatenate([hpf_a[..., None], deemph[..., :-1]], axis=-1)
        audio, hpf_b = iir.one_pole_block(ah, ah, hpf_b, deemph - a_d)
        hpf_a = deemph[..., -1]
        ys_ref.append(np.asarray(audio))

    # fused cascade with the mapping from demod.fm
    sos2 = np.array([[al, 0.0, 0.0, -(1.0 - al), 0.0],
                     [ah, -ah, 0.0, -ah, 0.0]], np.float32)
    lpf = jnp.zeros((C,), jnp.float32)
    hpf_a2 = jnp.zeros((C,), jnp.float32)
    hpf_b2 = jnp.zeros((C,), jnp.float32)
    ys = []
    for blk in (angle[:, :T], angle[:, T:]):
        st2 = jnp.stack([
            jnp.stack([(1.0 - al) * lpf, jnp.zeros_like(lpf)], axis=-1),
            jnp.stack([np.float32(ah) * (hpf_b2 - hpf_a2),
                       jnp.zeros_like(hpf_b2)], axis=-1)], axis=0)
        audio, st2o = pallas_iir.biquad_cascade_pallas(sos2, st2,
                                                       jnp.asarray(blk),
                                                       t_tile=128)
        lpf = st2o[0, ..., 0] / np.float32(1.0 - al)
        hpf_a2 = jnp.zeros_like(lpf)
        hpf_b2 = st2o[1, ..., 0] / np.float32(ah)
        ys.append(np.asarray(audio))
    np.testing.assert_allclose(np.concatenate(ys, -1),
                               np.concatenate(ys_ref, -1),
                               rtol=1e-5, atol=1e-4)


def test_one_pole_blocked_matches_dilated():
    """Blocked-matmul one-pole (MXU Toeplitz + chunk scan) vs the dilated
    scan, including streaming state across two blocks."""
    from uhsdr_tpu.ops import iir as iir_mod
    rng = np.random.default_rng(0)
    a, b = 0.995, 0.005
    x = rng.standard_normal((4, 1024)).astype(np.float32) * 100
    # dilated reference (jnp coefficient dodges the blocked fast path)
    y_ref, last_ref = iir_mod.one_pole_block(
        jnp.float32(a), jnp.float32(b), jnp.zeros((4,), jnp.float32),
        jnp.asarray(x))
    st = jnp.zeros((4,), jnp.float32)
    y1, st = iir_mod._one_pole_blocked(a, b, st, jnp.asarray(x[:, :512]))
    y2, st = iir_mod._one_pole_blocked(a, b, st, jnp.asarray(x[:, 512:]))
    y = np.concatenate([np.asarray(y1), np.asarray(y2)], axis=-1)
    np.testing.assert_allclose(y, np.asarray(y_ref), rtol=2e-4, atol=2e-3)
    np.testing.assert_allclose(np.asarray(st), np.asarray(last_ref),
                               rtol=2e-4, atol=2e-3)


def test_biquad_blocked_matches_dilated():
    from scipy import signal
    from uhsdr_tpu.ops import iir as iir_mod
    rng = np.random.default_rng(1)
    sos = signal.butter(4, [0.05, 0.4], btype="band", output="sos")
    sos5 = np.concatenate([sos[:, :3], sos[:, 4:6]],
                          axis=1).astype(np.float32)
    x = rng.standard_normal((4, 1024)).astype(np.float32)
    st0 = jnp.zeros((sos5.shape[0], 4, 2), jnp.float32)
    y_ref, st_ref = iir_mod.biquad_cascade_block(
        jnp.asarray(sos5), st0, jnp.asarray(x))
    st = st0
    y1, st = iir_mod.biquad_cascade_blocked(sos5, st, jnp.asarray(x[:, :512]))
    y2, st = iir_mod.biquad_cascade_blocked(sos5, st, jnp.asarray(x[:, 512:]))
    y = np.concatenate([np.asarray(y1), np.asarray(y2)], axis=-1)
    np.testing.assert_allclose(y, np.asarray(y_ref), rtol=2e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(st), np.asarray(st_ref),
                               rtol=2e-4, atol=1e-4)
