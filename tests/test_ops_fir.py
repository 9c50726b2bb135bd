import numpy as np
import jax.numpy as jnp
import pytest
from scipy import signal as sps

from uhsdr_tpu.ops import design, fir


def _stream(fn, h, x, block, **kw):
    """Run a streaming block fn over x in blocks, concatenating output."""
    taps = h.shape[-1]
    carry = fir.init_carry(x.shape[:-1], taps, x.dtype)
    outs = []
    for i in range(0, x.shape[-1], block):
        y, carry = fn(jnp.asarray(h), carry, jnp.asarray(x[..., i:i + block]), **kw)
        outs.append(np.asarray(y))
    return np.concatenate(outs, axis=-1)


@pytest.mark.parametrize("method", ["fft", "time"])
@pytest.mark.parametrize("taps", [9, 89, 199])
def test_fir_block_matches_lfilter(method, taps):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, 4096)).astype(np.float32)
    h = design.lowpass_fir(taps, 3000, 48000).astype(np.float32)
    y = _stream(fir.fir_block, h, x, 512, method=method)
    ref = sps.lfilter(h, [1.0], x, axis=-1)
    np.testing.assert_allclose(y, ref, atol=2e-5)


@pytest.mark.parametrize("method", ["fft", "time"])
def test_fir_block_complex_taps(method):
    rng = np.random.default_rng(1)
    x = (rng.standard_normal((2, 2048)) + 1j * rng.standard_normal((2, 2048))
         ).astype(np.complex64)
    h = design.complex_bandpass_fir(89, 200, 2900, 48000).astype(np.complex64)
    y = _stream(fir.fir_block, h, x, 256, method=method)
    ref = sps.lfilter(h, [1.0], x, axis=-1)
    np.testing.assert_allclose(y, ref, atol=5e-5)


@pytest.mark.parametrize("method", ["fft", "time"])
@pytest.mark.parametrize("decim", [2, 4])
def test_fir_decimate(method, decim):
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 4096)).astype(np.float32)
    h = design.decimation_fir(89, decim, 48000).astype(np.float32)
    carry = fir.init_carry(x.shape[:-1], 89, x.dtype)
    outs = []
    for i in range(0, 4096, 512):
        y, carry = fir.fir_decimate_block(jnp.asarray(h), carry,
                                          jnp.asarray(x[:, i:i + 512]),
                                          decim, method=method)
        outs.append(np.asarray(y))
    y = np.concatenate(outs, axis=-1)
    full = sps.lfilter(h, [1.0], x, axis=-1)
    ref = full[:, ::decim]
    assert y.shape == ref.shape
    np.testing.assert_allclose(y, ref, atol=2e-5)


def test_fir_interpolate():
    rng = np.random.default_rng(3)
    interp = 4
    fs_out = 48000
    x = rng.standard_normal((2, 1024)).astype(np.float32)
    h = design.interpolation_fir(96, interp, fs_out).astype(np.float32)
    sub_len = -(-96 // interp)
    carry = jnp.zeros((2, sub_len - 1), jnp.float32)
    outs = []
    for i in range(0, 1024, 256):
        y, carry = fir.fir_interpolate_block(jnp.asarray(h), carry,
                                             jnp.asarray(x[:, i:i + 256]), interp)
        outs.append(np.asarray(y))
    y = np.concatenate(outs, axis=-1)
    # reference: zero-stuff + lfilter
    u = np.zeros((2, 1024 * interp), np.float32)
    u[:, ::interp] = x
    ref = sps.lfilter(h, [1.0], u, axis=-1)
    assert y.shape == ref.shape
    np.testing.assert_allclose(y, ref, atol=2e-5)


def test_overlap_save_filter_class():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, 2048)).astype(np.float32)
    h = design.lowpass_fir(199, 3000, 48000).astype(np.float32)
    f = fir.OverlapSaveFilter(h, 512)
    carry = f.init_carry((2,), jnp.float32)
    outs = []
    for i in range(0, 2048, 512):
        y, carry = f(carry, jnp.asarray(x[:, i:i + 512]))
        outs.append(np.asarray(y))
    y = np.concatenate(outs, axis=-1)
    ref = sps.lfilter(h, [1.0], x, axis=-1)
    np.testing.assert_allclose(y, ref, atol=2e-5)


def test_complex_bandpass_selects_sideband():
    """USB filter must pass +1.5 kHz and reject -1.5 kHz (image)."""
    fs = 48000
    n = 8192
    t = np.arange(n) / fs
    h = design.complex_bandpass_fir(199, 200, 2900, fs)
    for f0, expect_pass in [(1500.0, True), (-1500.0, False)]:
        x = np.exp(2j * np.pi * f0 * t)
        y = sps.lfilter(h, [1.0], x)[1000:]
        power = np.mean(np.abs(y) ** 2)
        if expect_pass:
            assert power > 0.5, power
        else:
            assert power < 1e-6, power
