"""Native audio sink (`runtime/audio_sink.cpp` via `io.ingest.AudioSink`):
the codec-DAC / USB-audio-OUT transport role."""
import time
import wave

import numpy as np
import pytest

from uhsdr_tpu.io import ingest


def _read_wav(path):
    with wave.open(path, "rb") as w:
        nch = w.getnchannels()
        fs = w.getframerate()
        pcm = np.frombuffer(w.readframes(w.getnframes()), np.int16)
    return pcm.reshape(-1, nch).T / 32767.0, fs, nch


@pytest.mark.parametrize("native", [True, False])
def test_sink_roundtrip_mono(tmp_path, native, monkeypatch):
    if native and ingest._SINK_LIB is None:
        pytest.skip("native sink not built")
    if not native:
        monkeypatch.setattr(ingest, "_SINK_LIB", None)
    path = str(tmp_path / "out.wav")
    fs, T = 48000, 4096
    t = np.arange(3 * T) / fs
    audio = (0.5 * np.sin(2 * np.pi * 700.0 * t)).astype(np.float32)
    with ingest.AudioSink(path, fs=fs, block_samples=T) as sink:
        for k in range(3):
            assert sink.push(audio[k * T:(k + 1) * T])
        deadline = time.monotonic() + 10
        while native and sink.written < 3 * T and time.monotonic() < deadline:
            time.sleep(0.01)
    back, fs2, nch = _read_wav(path)
    assert fs2 == fs and nch == 1
    assert back.shape[-1] == 3 * T
    err = np.max(np.abs(back[0] - audio))
    assert err < 2.0 / 32767.0          # int16 quantization only


def test_sink_stereo_and_clipping(tmp_path):
    if ingest._SINK_LIB is None:
        pytest.skip("native sink not built")
    path = str(tmp_path / "st.wav")
    T = 1024
    a = np.stack([np.linspace(-1.5, 1.5, T), np.zeros(T)]).astype(np.float32)
    with ingest.AudioSink(path, fs=48000, channels=2,
                          block_samples=T) as sink:
        assert sink.push(a)
        deadline = time.monotonic() + 10
        while sink.written < T and time.monotonic() < deadline:
            time.sleep(0.01)
        assert sink.dropped == 0
    back, _, nch = _read_wav(path)
    assert nch == 2 and back.shape == (2, T)
    assert np.max(back[0]) <= 1.0 and np.min(back[0]) >= -32768 / 32767
    assert np.max(np.abs(back[1])) == 0.0


def test_sink_overflow_counts_drops(tmp_path):
    if ingest._SINK_LIB is None:
        pytest.skip("native sink not built")
    path = str(tmp_path / "ov.wav")
    T = 1 << 16
    blk = np.zeros(T, np.float32)
    sink = ingest.AudioSink(path, fs=48000, block_samples=T, ring_blocks=2)
    results = [sink.push(blk) for _ in range(64)]
    sink.close()
    # either everything got through (fast disk) or drops were counted
    n_ok = sum(results)
    assert n_ok >= 2
    back, _, _ = _read_wav(path)
    assert back.shape[-1] == n_ok * T
