import numpy as np

from uhsdr_tpu.control import calibration as cal


def test_iq_interpolation_between_anchors():
    c = cal.IqCalibration()
    c.set_anchor(7_000_000, rx_gain=100.0, rx_phase=40.0)
    c.set_anchor(14_000_000, rx_gain=300.0, rx_phase=-40.0)
    ig, qg, ph = c.rx_adjustments(10_500_000)       # midpoint
    # rx gain is negative-signed: adj = -200/4000 = -0.05
    assert abs(ig - 0.95) < 1e-9
    assert abs(qg - 1.05) < 1e-9
    assert abs(ph - 0.0) < 1e-9


def test_iq_off_anchor_borrows_neighbor():
    c = cal.IqCalibration()
    c.set_anchor(7_000_000, rx_gain=cal.IQ_BALANCE_OFF)
    c.set_anchor(14_000_000, rx_gain=200.0)
    ig, _, _ = c.rx_adjustments(8_000_000)
    assert abs(ig - (1.0 - 200.0 / 4000.0)) < 1e-9
    # no anchors with data at all -> neutral
    c2 = cal.IqCalibration()
    ig, qg, ph = c2.rx_adjustments(7_000_000)
    assert (ig, qg, ph) == (1.0, 1.0, 0.0)


def test_soft_tcxo_hysteresis_and_correction():
    t = cal.SoftTcxo()
    changed, ppb = t.update(25.0)
    assert changed
    changed, _ = t.update(25.4)       # same 1-degree bucket
    assert not changed
    changed, _ = t.update(26.2)
    assert changed
    # correction applies multiplicatively
    f = cal.SoftTcxo.apply(14_000_000.0, ppb)
    assert abs(f - 14_000_000.0 * (1 + ppb * 1e-9)) < 1e-6
    # curve shape: near-zero around 50 C, negative far away
    assert cal.default_drift_curve(5.0) < cal.default_drift_curve(50.0)
    assert cal.default_drift_curve(95.0) < cal.default_drift_curve(55.0)
