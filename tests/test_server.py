"""Live radio server system test (`control/server.py` + CAT client):
the `mchfMain` main-loop role — continuous RX with CAT retune/mode/PTT
(`src/uhssdr_main.c:388-494`, `radio_management.c:679,910`)."""
import time

import numpy as np
import pytest

from uhsdr_tpu.control import cat as cat_mod
from uhsdr_tpu.control import server as server_mod
from uhsdr_tpu.io import ingest

FS = 48000.0
CENTER = 14_001_000
BLOCK = 2048


def _dominant_hz(x, fs=FS):
    w = np.hanning(len(x))
    spec = np.abs(np.fft.rfft(x * w))
    spec[:8] = 0.0
    return np.fft.rfftfreq(len(x), 1 / fs)[np.argmax(spec)]


@pytest.fixture(scope="module")
def capture(tmp_path_factory):
    """Two USB 'stations': station A at the dial (audio 700 Hz), station B
    2.5 kHz up (audio 1000 Hz when dialed to it)."""
    n = 48000 * 2
    t = np.arange(n) / FS
    iq = (0.4 * np.exp(2j * np.pi * (6000.0 + 700.0) * t)
          + 0.4 * np.exp(2j * np.pi * (6000.0 + 2500.0 + 1000.0) * t)
          ).astype(np.complex64)
    path = str(tmp_path_factory.mktemp("serve") / "capture.wav")
    ingest.write_iq_wav(path, iq, fs=int(FS))
    return path


def test_serve_retune_mode_ptt(capture):
    cfg = server_mod.ServeConfig(iq_path=capture, center_hz=CENTER,
                                 block_len=BLOCK, mode="usb",
                                 bw_key="2P3KHZ", loop=True)
    radio, catsrv = server_mod.serve(cfg)
    client = cat_mod.CatClient(port=catsrv.port)
    try:
        # --- RX at the initial dial: station A (700 Hz) ---
        assert radio.wait_blocks(12), radio.error
        audio = radio.audio()[-6 * BLOCK:]
        assert abs(_dominant_hz(audio) - 700.0) < 30.0
        assert radio.s_meter > 6.0          # strong signal (~S9 by cal)
        assert radio.dbm > -90.0
        # SNAP homes onto the station-A tone (+700 Hz above the carrier
        # point; 0.2/0.8 smoothing is still converging after 12 blocks)
        assert 300.0 < radio.snap_freq_hz < 760.0

        # --- CAT retune +2.5 kHz: station B (1000 Hz), same executable ---
        client.set_frequency(CENTER + 2500)
        f, _ = client.get_frequency()
        assert f == CENTER + 2500
        radio.audio_blocks.clear()
        assert radio.wait_blocks(12), radio.error
        audio = radio.audio()[-6 * BLOCK:]
        assert abs(_dominant_hz(audio) - 1000.0) < 30.0

        # --- CAT mode switch rebuilds the chain between blocks ---
        assert client.set_mode("cw")
        assert radio.wait_blocks(8, timeout=240), radio.error
        assert radio.mode == "cw"

        # --- PTT: TX chain runs, fwd power telemetry appears ---
        radio.queue_tx_text("TEST")
        client.ptt(True)
        assert radio.wait_blocks(4, timeout=240, tx=True), radio.error
        assert radio.ptt and radio.fwd_pwr > 0.0
        tx_iq = radio.tx_iq()
        assert tx_iq.size > 0
        # keyed CW carrier sits at translate + sidetone in TX baseband;
        # use the WHOLE buffer (a 4-block window can land in a Morse
        # inter-element gap and contain only silence)
        assert float(np.mean(np.abs(tx_iq) ** 2)) > 1e-3
        spec = np.abs(np.fft.fft(tx_iq))
        freqs = np.fft.fftfreq(tx_iq.size, 1 / FS)
        peak = freqs[np.argmax(spec)]
        assert abs(peak - (6000.0 + 700.0)) < 50.0

        # --- back to RX ---
        client.ptt(False)
        assert radio.wait_blocks(4, timeout=240), radio.error
        assert not radio.ptt
        assert radio.error is None
    finally:
        client.close()
        radio.stop()
        catsrv.stop()


def test_tune_offset_matches_recompiled_chain():
    """The traced tune-offset path must equal a chain compiled with the
    offset baked into translate_hz."""
    import jax.numpy as jnp

    from uhsdr_tpu.chain import rx

    n = 8 * 2048
    t = np.arange(n) / FS
    iq = (0.4 * np.exp(2j * np.pi * (6000.0 + 1500.0 + 700.0) * t)
          ).astype(np.complex64)

    cfg_dyn = rx.RxConfig(mode="usb", bw_key="2P3KHZ", block_len=2048,
                          translate_hz=6000.0)
    cfg_baked = rx.RxConfig(mode="usb", bw_key="2P3KHZ", block_len=2048,
                            translate_hz=7500.0)
    ch_d, ch_b = rx.RxChain(cfg_dyn), rx.RxChain(cfg_baked)
    st_d, st_b = ch_d.init_state((1,)), ch_b.init_state((1,))
    out_d, out_b = [], []
    for k in range(0, n, 2048):
        blk = iq[None, k:k + 2048]
        a_d, st_d, _ = ch_d(st_d, blk, tune_offset_hz=1500.0)
        a_b, st_b, _ = ch_b(st_b, blk)
        out_d.append(np.asarray(a_d))
        out_b.append(np.asarray(a_b))
    y_d = np.concatenate(out_d, axis=-1)[0][4096:]
    y_b = np.concatenate(out_b, axis=-1)[0][4096:]
    err = np.sqrt(np.mean((y_d - y_b) ** 2))
    ref = np.sqrt(np.mean(y_b ** 2))
    assert err < 1e-3 * max(ref, 1e-9)
    assert abs(_dominant_hz(y_d) - 700.0) < 30.0
