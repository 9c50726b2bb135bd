import os

import numpy as np
import pytest

from uhsdr_tpu.io import ingest


def _make_capture(tmp_path, n=10000, fs=48000):
    t = np.arange(n) / fs
    iq = (0.5 * np.exp(2j * np.pi * 1000 * t)).astype(np.complex64)
    return iq


def test_wav_roundtrip(tmp_path):
    iq = _make_capture(tmp_path)
    p = str(tmp_path / "cap.wav")
    ingest.write_iq_wav(p, iq)
    back = ingest.read_iq_file(p)
    assert len(back) == len(iq)
    np.testing.assert_allclose(np.real(back), np.real(iq), atol=2e-4)


@pytest.mark.parametrize("force_numpy", [True, False])
def test_ingest_blocks(tmp_path, force_numpy):
    if not force_numpy and ingest._LIB is None:
        pytest.skip("native lib not built")
    iq = _make_capture(tmp_path, n=8192)
    p = str(tmp_path / "cap.wav")
    ingest.write_iq_wav(p, iq)
    blocks = []
    with ingest.IqIngest(p, 2048, force_numpy=force_numpy) as src:
        while True:
            b = src.next_block()
            if b is None:
                break
            blocks.append(b[0] + 1j * b[1])
            if len(blocks) > 10:
                break
    z = np.concatenate(blocks)[:8192]
    np.testing.assert_allclose(z.real, iq.real, atol=2e-4)


def test_native_ingest_raw(tmp_path):
    if ingest._LIB is None:
        pytest.skip("native lib not built")
    iq = _make_capture(tmp_path, n=6144)
    raw = np.empty(2 * len(iq), np.int16)
    raw[0::2] = (iq.real * 32767).astype(np.int16)
    raw[1::2] = (iq.imag * 32767).astype(np.int16)
    p = str(tmp_path / "cap.iq")
    raw.tofile(p)
    with ingest.IqIngest(p, 2048) as src:
        b1 = src.next_block()
        b2 = src.next_block()
        b3 = src.next_block()
        b4 = src.next_block()
    assert b4 is None or np.all(b4[0] == 0)
    z = np.concatenate([b1[0] + 1j * b1[1], b2[0] + 1j * b2[1],
                        b3[0] + 1j * b3[1]])
    np.testing.assert_allclose(z.real, iq.real, atol=2e-4)


def test_fleet_ingest_batches_channels(tmp_path):
    import numpy as np
    from uhsdr_tpu.io import ingest
    fs = 48000
    paths = []
    for c in range(3):
        t = np.arange(8192) / fs
        iq = (0.3 * np.exp(2j * np.pi * (500 + 200 * c) * t)).astype(
            np.complex64)
        p = str(tmp_path / f"ch{c}.wav")
        ingest.write_iq_wav(p, iq)
        paths.append(p)
    with ingest.FleetIngest(paths, 4096) as fl:
        blk = fl.next_block()
        assert blk is not None
        i_p, q_p = blk
        assert i_p.shape == (3, 4096) and q_p.shape == (3, 4096)
        # each channel carries its own tone
        for c in range(3):
            z = i_p[c] + 1j * q_p[c]
            spec = np.abs(np.fft.fft(z))
            pk = np.fft.fftfreq(4096, 1 / fs)[spec.argmax()]
            assert abs(pk - (500 + 200 * c)) < 15, (c, pk)
        blk2 = fl.next_block()
        assert blk2 is not None
        assert fl.next_block() is None


@pytest.mark.parametrize("force_numpy", [True, False])
def test_ingest_raw_i16_mode(tmp_path, force_numpy):
    """raw_i16 mode hands the file's int16 samples UNCONVERTED (the
    chain's int16 ingest path scales on-device), native ring and numpy
    fallback alike; the f32 mode of the same capture equals the raw
    planes times the ring's 1/32768 scale exactly."""
    if not force_numpy and (ingest._LIB is None
                            or not getattr(ingest._LIB, "_has_i16", False)):
        pytest.skip("native lib (with raw_i16) not built")
    iq = _make_capture(tmp_path, n=8192)
    p = str(tmp_path / "cap16.wav")
    ingest.write_iq_wav(p, iq)
    want_i, want_q = ingest.read_iq_file_i16(p)

    got_i, got_q = [], []
    with ingest.IqIngest(p, 2048, force_numpy=force_numpy,
                         raw_i16=True) as src:
        while True:
            b = src.next_block()
            if b is None:
                break
            assert b[0].dtype == np.int16 and b[1].dtype == np.int16
            got_i.append(b[0])
            got_q.append(b[1])
    gi = np.concatenate(got_i)[:8192]
    gq = np.concatenate(got_q)[:8192]
    np.testing.assert_array_equal(gi, want_i)
    np.testing.assert_array_equal(gq, want_q)

    # f32 mode of the same stream == raw * (1/32768)
    with ingest.IqIngest(p, 2048, force_numpy=force_numpy) as src:
        f = src.next_block()
    np.testing.assert_array_equal(
        f[0], gi[:2048].astype(np.float32) / 32768.0)
