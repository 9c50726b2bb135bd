import json
import subprocess
import sys

import numpy as np
import pytest

from uhsdr_tpu.modems import keyer
from uhsdr_tpu.utils import profiling


def test_iambic_b_alternates():
    k = keyer.Keyer(mode=keyer.KeyerMode.IAMBIC_B, wpm=20, fs=12000)
    dit = k._dit
    # squeeze both paddles for 20 dit-lengths
    env = k.process(True, True, 20 * dit)
    # expect alternating dit(1) gap(1) dah(3) gap(1) pattern
    # detect elements
    edges = np.flatnonzero(np.diff(np.concatenate([[0.0], env, [0.0]])))
    assert len(edges) >= 6
    lengths = np.diff(edges)[::2]  # mark lengths
    # alternating short/long
    short = lengths.min()
    assert any(l > 2.5 * short for l in lengths)


def test_straight_key():
    k = keyer.Keyer(mode=keyer.KeyerMode.STRAIGHT, fs=12000)
    env = k.process(True, False, 100)
    assert env.all()
    env = k.process(False, False, 100)
    assert not env.any()


def test_digi_buffer():
    b = keyer.DigiTxBuffer(maxlen=4)
    assert b.put("hello") == 4
    assert b.has_data()
    assert b.get() == "h"
    b.clear()
    assert not b.has_data()


def test_profiler():
    p = profiling.EventProfiler()
    with p.event("x"):
        pass
    with p.event("x"):
        pass
    rep = p.report()
    assert rep["x"]["count"] == 2
    tp = profiling.throughput(48000, 10, 1.0)
    assert abs(tp["realtime_channels_48k"] - 10) < 1e-9


def test_cli_tx_rx_roundtrip(tmp_path):
    iq_path = str(tmp_path / "tx.wav")
    audio_path = str(tmp_path / "rx.wav")
    env = dict(JAX_PLATFORMS="cpu")
    import os
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    r1 = subprocess.run(
        [sys.executable, "-m", "uhsdr_tpu.cli", "tx", "--out", iq_path,
         "--mode", "usb"], capture_output=True, text=True, env=env,
        cwd="/root/repo")
    assert r1.returncode == 0, r1.stderr[-2000:]
    r2 = subprocess.run(
        [sys.executable, "-m", "uhsdr_tpu.cli", "rx", "--input", iq_path,
         "--out", audio_path, "--mode", "usb"],
        capture_output=True, text=True, env=env, cwd="/root/repo")
    assert r2.returncode == 0, r2.stderr[-2000:]
    metrics = json.loads(r2.stdout.strip().splitlines()[-1])
    assert metrics["samples"] > 40000
    assert metrics["audio_rms"] > 0
    # recovered tone should be ~700 Hz
    from uhsdr_tpu.io import ingest
    import wave
    with wave.open(audio_path) as w:
        audio = np.frombuffer(w.readframes(w.getnframes()),
                              np.int16).astype(np.float32)
    tail = audio[24000:]
    spec = np.abs(np.fft.rfft(tail * np.hanning(len(tail))))
    pk = np.fft.rfftfreq(len(tail), 1 / 48000)[spec.argmax()]
    assert abs(pk - 700) < 15, pk


def test_cli_rtty_text_roundtrip(tmp_path):
    import os
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    iq = str(tmp_path / "rtty.wav")
    r1 = subprocess.run(
        [sys.executable, "-m", "uhsdr_tpu.cli", "tx", "--out", iq,
         "--mode", "rtty", "--text", "RYRY DE UHSDR"],
        capture_output=True, text=True, env=env, cwd="/root/repo")
    assert r1.returncode == 0, r1.stderr[-2000:]
    r2 = subprocess.run(
        [sys.executable, "-m", "uhsdr_tpu.cli", "rx", "--input", iq,
         "--mode", "rtty", "--decode"],
        capture_output=True, text=True, env=env, cwd="/root/repo")
    assert r2.returncode == 0, r2.stderr[-2000:]
    text = json.loads(r2.stdout.strip().splitlines()[-1])["text"]
    assert "RYRY DE UHSDR" in text, repr(text)


def test_cli_psk_text_roundtrip(tmp_path):
    import os
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    iq = str(tmp_path / "psk.wav")
    r1 = subprocess.run(
        [sys.executable, "-m", "uhsdr_tpu.cli", "tx", "--out", iq,
         "--mode", "psk", "--text", "psk31 de uhsdr"],
        capture_output=True, text=True, env=env, cwd="/root/repo")
    assert r1.returncode == 0, r1.stderr[-2000:]
    r2 = subprocess.run(
        [sys.executable, "-m", "uhsdr_tpu.cli", "rx", "--input", iq,
         "--mode", "psk", "--decode"],
        capture_output=True, text=True, env=env, cwd="/root/repo")
    assert r2.returncode == 0, r2.stderr[-2000:]
    text = json.loads(r2.stdout.strip().splitlines()[-1])["text"]
    assert "psk31 de uhsdr" in text, repr(text)


def test_cli_config_save_show(tmp_path):
    """`config` subcommand = the uhsdr_tool.py role (L11 host tools)."""
    import os
    path = str(tmp_path / "cfg.json")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, "-m", "uhsdr_tpu.cli", "config", "save",
         "--file", path, "--set", "cw_speed_wpm=25",
         "--set", "agc_mode=fast"],
        capture_output=True, text=True, env=env, cwd="/root/repo")
    assert out.returncode == 0, out.stderr
    assert json.loads(out.stdout)["entries"] >= 30

    out = subprocess.run(
        [sys.executable, "-m", "uhsdr_tpu.cli", "config", "show",
         "--file", path],
        capture_output=True, text=True, env=env, cwd="/root/repo")
    vals = json.loads(out.stdout)
    assert vals["cw_speed_wpm"] == 25
    assert vals["agc_mode"] == "fast"
    # clamping semantics survive the round trip
    from uhsdr_tpu.core import config as config_mod
    cfg = config_mod.Config.load(path)
    cfg.set("cw_speed_wpm", 999)
    assert cfg.get("cw_speed_wpm") == 48      # max per registry


def test_cli_channelize_wideband(tmp_path):
    """Wideband capture with a tone in channel 2 -> channelize CLI finds
    exactly one active channel and recovers the audio tone."""
    import os
    M = 8
    fs_wide = M * 48000.0
    n = 4 * 4096 * M
    t = np.arange(n) / fs_wide
    f = 2 * 48000.0 + 6000.0 + 700.0
    x = (0.4 * np.exp(2j * np.pi * f * t)).astype(np.complex64)
    path = str(tmp_path / "wide.iq")
    raw = (np.stack([x.real, x.imag], -1).reshape(-1) * 32767).astype(np.int16)
    raw.tofile(path)
    out = str(tmp_path / "ch.npy")
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    r = subprocess.run(
        [sys.executable, "-m", "uhsdr_tpu.cli", "channelize",
         "--input", path, "--channels", str(M), "--block", "4096",
         "--taps", "8", "--out", out],
        capture_output=True, text=True, env=env, cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-2000:]
    m = json.loads(r.stdout.strip().splitlines()[-1])
    assert m["channels"] == M
    assert m["rms_argmax"] == 2
    assert m["active_channels"] == 1
    a = np.load(out)
    spec = np.abs(np.fft.rfft(a[2, -4096:] * np.hanning(4096)))
    pk = np.fft.rfftfreq(4096, 1 / 48000.0)[spec.argmax()]
    assert abs(pk - 700.0) < 30.0
