"""Tests: partitioned convolution, twin-peaks monitor, waterfall image."""
import jax.numpy as jnp
import numpy as np

from uhsdr_tpu.control import selftest
from uhsdr_tpu.ops import fir
from uhsdr_tpu.spectrum import scope


def test_partitioned_convolver_matches_direct_real():
    rng = np.random.default_rng(1)
    h = rng.normal(size=1024).astype(np.float32) * 0.03
    x = rng.normal(size=(2, 1024)).astype(np.float32)
    pc = fir.PartitionedConvolver(h, block_len=128)
    assert pc.parts == 8
    st = pc.init_state((2,), np.float32)
    ys = []
    for k in range(0, x.shape[-1], 128):
        y, st = pc(st, jnp.asarray(x[:, k:k + 128]))
        ys.append(np.asarray(y))
    y = np.concatenate(ys, axis=-1)
    ref = np.stack([np.convolve(xi, h)[: x.shape[-1]] for xi in x])
    np.testing.assert_allclose(y, ref, rtol=0, atol=2e-3)


def test_partitioned_convolver_complex_input_real_taps():
    rng = np.random.default_rng(2)
    h = rng.normal(size=300).astype(np.float32) * 0.05
    x = (rng.normal(size=512) + 1j * rng.normal(size=512)).astype(np.complex64)
    pc = fir.PartitionedConvolver(h, block_len=128)
    st = pc.init_state((), np.complex64)
    ys = []
    for k in range(0, 512, 128):
        y, st = pc(st, jnp.asarray(x[k:k + 128]))
        ys.append(np.asarray(y))
    y = np.concatenate(ys)
    ref = np.convolve(x, h)[:512]
    np.testing.assert_allclose(y, ref, rtol=0, atol=5e-3)


def test_twinpeaks_monitor_restart_flow():
    m = selftest.TwinpeaksMonitor(3)
    # settle period: no decisions
    for _ in range(selftest.SETTLE_BLOCKS + 1):
        req = m.update(np.zeros(3), np.ones(3))
    assert (m.status == selftest.TwinpeaksStatus.SAMPLING.value).all()

    # channel 0 healthy (phase ~ 0); channel 1 broken (asin(t1/t3) ~ 90deg);
    # channel 2 borderline-ok (~10 deg < 22.5)
    t1 = np.array([0.0, 0.99, np.sin(np.deg2rad(10))])
    t3 = np.ones(3)
    restart = None
    for _ in range(selftest.PHASE_RUNS):
        restart = m.update(t1, t3)
    assert m.status[0] == selftest.TwinpeaksStatus.DONE.value
    assert m.status[2] == selftest.TwinpeaksStatus.DONE.value
    assert m.status[1] == selftest.TwinpeaksStatus.RESTART_REQUESTED.value
    assert list(restart) == [1]

    # restart doesn't help; after MAX_RESTARTS declares uncorrectable
    for attempt in range(selftest.MAX_RESTARTS - 1):
        m.acknowledge_restart([1])
        for _ in range(selftest.SETTLE_BLOCKS + 1):
            m.update(t1, t3)
        for _ in range(selftest.PHASE_RUNS):
            m.update(t1, t3)
    assert m.status[1] == selftest.TwinpeaksStatus.UNCORRECTABLE.value


def test_waterfall_image_scrolls_and_tracks_floor():
    wf = scope.WaterfallImage(fft_len=64, rows=8)
    spec = np.full(64, 1e-6)
    spec[32] = 1.0
    for _ in range(10):
        wf.push(spec)
    assert wf.image.shape == (8, 64)
    # the carrier column should be the hottest
    assert wf.image[0].argmax() == 32
    assert wf.image[0, 32] > wf.image[0, 0]
