import os

import numpy as np
import jax.numpy as jnp
import pytest

from uhsdr_tpu.chain import rx
from uhsdr_tpu.control import radio
from uhsdr_tpu.core import config as config_mod
from uhsdr_tpu.ops import iqcorr
from uhsdr_tpu.spectrum import scope


def test_spectrum_dbm_and_snap():
    fs = 48000
    n = 4096 * 40   # enough blocks for the 0.2/0.8 SNAP smoother to settle
    t = np.arange(n) / fs
    # carrier at translate+1150 (center of 2.3k passband), modest noise
    f_sig = 6000 + 1150 + 40   # 40 Hz off-center for SNAP
    iq = (0.3 * np.exp(2j * np.pi * f_sig * t)
          + 1e-4 * (np.random.default_rng(0).standard_normal(n)
                    + 1j * np.random.default_rng(1).standard_normal(n))
          ).astype(np.complex64)
    params = scope.make_params(fft_len=256, translate_hz=6000.0,
                               f_lo=150.0, f_hi=2350.0, mode="usb")
    state = scope.init_state((1,), params)
    for k in range(0, n, 4096):
        outs, state = scope.process(params, state, jnp.asarray(iq[None, k:k+4096]))
    snap = float(np.asarray(outs["snap_freq"])[0])
    # SNAP should estimate the carrier's audio offset (1150+40 Hz)
    assert abs(snap - 1190.0) < 40.0, snap
    dbm = float(np.asarray(outs["dbm"])[0])
    # stronger signal -> higher dbm
    iq2 = (10.0 * iq).astype(np.complex64)
    state2 = scope.init_state((1,), params)
    for k in range(0, n, 4096):
        outs2, state2 = scope.process(params, state2,
                                      jnp.asarray(iq2[None, k:k+4096]))
    dbm2 = float(np.asarray(outs2["dbm"])[0])
    assert 15 < dbm2 - dbm < 25    # 20 dB more power (slope 19.8/decade)


def test_spectrum_zoom():
    fs = 48000
    n = 4096 * 8
    t = np.arange(n) / fs
    iq = (0.3 * np.exp(2j * np.pi * 500 * t)).astype(np.complex64)
    params = scope.make_params(fft_len=256, magnify=3, translate_hz=0.0,
                               mode="am", f_lo=0.0, f_hi=2000.0)
    state = scope.init_state((1,), params)
    for k in range(0, n, 4096):
        outs, state = scope.process(params, state,
                                    jnp.asarray(iq[None, k:k + 4096]))
    spec = np.asarray(outs["spectrum"])[0]
    # 8x zoom: bin bw = 48000/8/256 = 23.4 Hz; peak at center + 500/23.4
    pk = np.argmax(spec)
    expect = 128 + round(500 / (fs / 8 / 256))
    assert abs(pk - expect) <= 1, (pk, expect)


def test_config_registry_roundtrip(tmp_path):
    cfg = config_mod.Config()
    cfg["agc_mode"] = "fast"
    cfg["dsp_nr_strength"] = 500    # clamps to 200
    assert cfg["dsp_nr_strength"] == 200
    p = str(tmp_path / "eeprom.json")
    cfg.save(p)
    cfg2 = config_mod.Config.load(p)
    assert cfg2["agc_mode"] == "fast"
    assert cfg2["dsp_nr_strength"] == 200
    with pytest.raises(KeyError):
        cfg2["bogus_key"] = 1


def test_state_checkpoint_roundtrip(tmp_path):
    chain = rx.RxChain(rx.RxConfig(mode="usb", bw_key="2P3KHZ",
                                   path_name="LPF", block_len=2048))
    state = chain.init_state((2,))
    iq = (0.1 * np.exp(2j * np.pi * 6500 *
                       np.arange(2048) / 48000)).astype(np.complex64)
    y1, state, _ = chain(state, np.broadcast_to(iq, (2, 2048)))
    p = str(tmp_path / "state.npz")
    config_mod.save_state(p, state)
    restored = config_mod.load_state(p, state)
    y2a, _, _ = chain(state, np.broadcast_to(iq, (2, 2048)))
    y2b, _, _ = chain(restored, np.broadcast_to(iq, (2, 2048)))
    np.testing.assert_allclose(np.asarray(y2a), np.asarray(y2b), atol=1e-6)


def test_iq_auto_correction_fixes_imbalance():
    fs = 48000
    n = 4096 * 24
    t = np.arange(n) / fs
    z = np.exp(2j * np.pi * 5000 * t)
    # introduce gain + phase imbalance: i' = g*i, q' = q + eps*i
    g, eps = 1.15, 0.12
    i_bad = (g * z.real).astype(np.float32)
    q_bad = (z.imag + eps * z.real).astype(np.float32)
    state = iqcorr.init_state((1,))
    for k in range(0, n, 4096):
        i_c, q_c, state = iqcorr.correct(state, jnp.asarray(i_bad[None, k:k+4096]),
                                         jnp.asarray(q_bad[None, k:k+4096]))
    zc = np.asarray(i_c)[0] + 1j * np.asarray(q_c)[0]
    # image rejection: power at -5 kHz should be far below +5 kHz
    spec = np.abs(np.fft.fft(zc * np.hanning(len(zc))))
    freqs = np.fft.fftfreq(len(zc), 1 / fs)
    p_sig = spec[np.abs(freqs - 5000).argmin()]
    p_img = spec[np.abs(freqs + 5000).argmin()]
    # uncorrected image suppression for these errors is ~20 dB; corrected
    # should be much better
    zb = i_bad + 1j * q_bad
    spec_b = np.abs(np.fft.fft(zb[-len(zc):] * np.hanning(len(zc))))
    img_db_bad = 20 * np.log10(spec_b[np.abs(freqs + 5000).argmin()] /
                               spec_b[np.abs(freqs - 5000).argmin()])
    img_db = 20 * np.log10(p_img / p_sig)
    assert img_db < img_db_bad - 15, (img_db, img_db_bad)


def test_radio_control_plane():
    assert radio.band_for_freq(7.1e6) == "40m"
    assert radio.default_sideband_for_freq(7.1e6) == "lsb"
    assert radio.default_sideband_for_freq(14.2e6) == "usb"
    assert radio.cw_is_lsb(7.0e6)
    assert not radio.cw_is_lsb(14.0e6)
    ts = radio.TuneState(dial_hz=14_050_000, mode="cw", iq_freq_mode=2,
                         cw_sidetone_hz=700)
    tune = radio.dial_to_tune(ts)
    # USB CW: tune = dial - 700 (sidetone) + 6000 (translate -6k mode)
    assert tune == 14_050_000 - 700 + 6000, tune
    st, actions = radio.switch_txrx(radio.TrxState(), True)
    assert st.mode == "tx" and actions[0] == "mute_audio" \
        and actions[-1] == "unmute_audio"
    assert not radio.mode_applicable("fm", 14e6)
    assert radio.mode_applicable("fm", 29.6e6)


def test_snap_tuner_retunes_offset_carrier():
    """SNAP loop: scope carrier estimate -> SnapTuner -> dial correction
    (UiSpectrum_CalculateSnap + auto-retune, ui_spectrum.c:1876-1989)."""
    import jax.numpy as jnp
    from uhsdr_tpu.spectrum import scope
    from uhsdr_tpu.control.radio import SnapTuner

    fs = 48000.0
    offset = 35.0                     # carrier sits 35 Hz off the dial
    # SNAP is gated to carrier modes (cw/am/sam/bpsk) in the
    # reference; AM searches a symmetric band around the dial
    params = scope.make_params(fft_len=256, translate_hz=0.0,
                               mode="am")
    st = scope.init_state((), params)
    tuner = SnapTuner(meas_needed=6)

    t = np.arange(int(3 * fs)) / fs
    z = (0.7 * np.exp(2j * np.pi * offset * t)).astype(np.complex64)

    # closed loop: each correction retunes the (simulated) dial, like the
    # reference's iterative VFO adjustment
    dial = 0.0
    B = 4096
    fired = 0
    for k in range(len(z) // B):
        tb = t[k * B:(k + 1) * B]
        blk = jnp.asarray(z[k * B:(k + 1) * B]
                          * np.exp(-2j * np.pi * dial * tb))
        out, st = scope.process(params, st, blk)
        got = tuner.update(float(out["snap_freq"]), active=True)
        if got is not None:
            dial += got
            fired += 1
            # the reference flushes its spectrum averages after a retune;
            # stale smoothed estimates would otherwise double-correct
            st = scope.init_state((), params)
    assert fired >= 1, "tuner never fired"
    assert abs(dial - offset) < 2.0, dial


def test_snap_tuner_gating_and_consistency():
    from uhsdr_tpu.control.radio import SnapTuner
    tuner = SnapTuner(meas_needed=3)
    # inactive: never fires
    for _ in range(10):
        assert tuner.update(50.0, active=False) is None
    # inconsistent estimates reset the count
    assert tuner.update(50.0) is None
    assert tuner.update(-40.0) is None   # jump > consistency window
    assert tuner.update(-41.0) is None
    got = tuner.update(-42.0)
    assert got is not None and abs(got - (-41.0)) < 1.5
    # dead zone: sub-Hz corrections suppressed
    for v in (0.2, 0.3, 0.25):
        got = tuner.update(v)
    assert got is None
