"""FreeDV as a selectable radio mode (VERDICT r2 item 4).

In the reference, FreeDV is a demod mode of the radio: the IRQ taps the
translated 48 kHz IQ, drop-decimates /6 into the 8 kHz modem ring buffer,
and upsamples the recovered speech x6 back into the audio path
(`drivers/audio/audio_driver.c:1330-1470`, `freedv_uhsdr.c:166-320`).
Here `modems.freedv.FreeDvRadioMode` is that glue, and it is reachable
from `cli rx/tx --mode freedv1600|freedv700d` and `serve`.

The decisive test: the firmware's own recorded 1600 IQ
(`freedv_test_data.c` via `data.freedv("test_iq")`), embedded into a
48 kHz capture at a translate offset, demodulates through the CLI's
radio-mode path with clean Golay codewords.
"""
from __future__ import annotations

import json
import subprocess
import sys

import numpy as np
import pytest

from uhsdr_tpu import data
from uhsdr_tpu.modems import freedv as fdv

FS = 48000.0
RATIO = 6


def embed_48k(iq8: np.ndarray, translate_hz: float) -> np.ndarray:
    """8 kHz modem IQ -> 48 kHz capture at +translate_hz (the inverse of
    the radio glue: x6 interpolation + up-mix)."""
    from scipy import signal
    up = np.zeros(len(iq8) * RATIO, np.complex128)
    up[::RATIO] = iq8
    h = signal.firwin(96, 3500.0, fs=FS) * RATIO
    z = signal.lfilter(h, [1.0], up)
    n = np.arange(len(z))
    return (z * np.exp(2j * np.pi * translate_hz * n / FS)
            ).astype(np.complex64)


@pytest.fixture(scope="module")
def recorded_capture_48k():
    iq8 = data.freedv("test_iq")
    iq8 = iq8 / (np.max(np.abs(iq8)) + 1e-9)
    return embed_48k(iq8, 6000.0)


def test_radio_mode_demodulates_recorded_iq(recorded_capture_48k):
    """FreeDvRadioMode end-to-end on the firmware's recorded 1600 IQ
    embedded in a 48 kHz capture: frames decode, parity mostly clean."""
    block = 4800
    radio = fdv.FreeDvRadioMode("freedv1600", block, translate_hz=6000.0)
    cap = recorded_capture_48k
    n = (len(cap) // block) * block
    speech = []
    for k in range(0, n, block):
        blk = cap[k:k + block]
        out = radio.rx_block(blk.real.astype(np.float32)[None],
                             blk.imag.astype(np.float32)[None])
        if out.size:
            speech.append(out)
    st = radio.stats
    assert st["frames_decoded"] >= 60, st
    # >=80% of decoded frames carry a clean Golay codeword (the recorded
    # vector starts mid-frame; allow sync acquisition losses)
    assert st["parity_errors"] <= 0.2 * st["frames_decoded"], st
    assert speech and np.concatenate(speech).size > 0


def test_cli_rx_freedv_mode(tmp_path, recorded_capture_48k):
    """`cli rx --mode freedv1600` demodulates the embedded capture."""
    from uhsdr_tpu.io import ingest

    cap_path = tmp_path / "fdv48.wav"
    ingest.write_iq_wav(str(cap_path), recorded_capture_48k * 0.5)
    out_path = tmp_path / "speech.wav"
    r = subprocess.run(
        [sys.executable, "-m", "uhsdr_tpu.cli", "rx",
         "--input", str(cap_path), "--mode", "freedv1600",
         "--out", str(out_path), "--block", "4800"],
        capture_output=True, text=True, timeout=600,
        env={**__import__("os").environ, "JAX_PLATFORMS": "cpu"})
    assert r.returncode == 0, r.stderr[-2000:]
    metrics = json.loads(r.stdout.strip().splitlines()[-1])
    assert metrics["frames_decoded"] >= 60, metrics
    assert out_path.exists() and metrics["samples"] > 0


def test_radio_mode_tx_rx_loopback():
    """TX radio mode -> RX radio mode at 48 kHz with a translate offset:
    the voice frame layer round-trips (modem+FEC loopback through the
    full rate-conversion glue)."""
    block = 4800
    t = np.arange(FS * 1.5) / FS
    speech = (0.3 * np.sin(2 * np.pi * 700 * t)
              + 0.2 * np.sin(2 * np.pi * 1100 * t)).astype(np.float32)
    txr = fdv.FreeDvRadioMode("freedv1600", block, translate_hz=6000.0)
    iq = []
    n = (len(speech) // block) * block
    for k in range(0, n, block):
        out = txr.tx_block(speech[k:k + block])
        if out.size:
            iq.append(out)
    cap = np.concatenate(iq)
    rxr = fdv.FreeDvRadioMode("freedv1600", block, translate_hz=6000.0)
    got = []
    m = (len(cap) // block) * block
    for k in range(0, m, block):
        out = rxr.rx_block(cap[k:k + block].real[None],
                           cap[k:k + block].imag[None])
        if out.size:
            got.append(out)
    st = rxr.stats
    assert st["frames_decoded"] >= 20, st
    assert st["parity_errors"] <= 0.1 * st["frames_decoded"], st
    audio = np.concatenate(got)
    assert np.sqrt(np.mean(audio ** 2)) > 1e-4
