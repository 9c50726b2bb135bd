"""Power/SWR meter and band power factor (`control/meter.py` vs the
reference math in `radio_management.c:376-520,1698-1797`)."""
import math

import pytest

from uhsdr_tpu.control import meter


def _ref_power(adc, sensor_null_cfg=100, coupling_cfg=100):
    # independent transcription of the reference formula for the test
    val = (sensor_null_cfg - 100.0) / 1000.0 + adc * 3.3 / 4095.0
    if val <= 0.05:
        a, b, c, d = meter.LOW_RF_PWR_COEFF
        p = a + b * val + c * val**2 + d * val**3
    else:
        a, b, c = meter.HIGH_RF_PWR_COEFF
        p = a + b * val + c * val**2
    p = max(p, 0.0)
    dbm = (10 * math.log10(p) if p > 0 else -120.0) + 30 \
        + (coupling_cfg - 100.0) / 10.0
    return 10 ** (dbm / 10) / 1000, dbm


def test_power_from_sensor_laws():
    for adc in (10.0, 40.0, 200.0, 1000.0, 3000.0):
        w, dbm = meter.power_from_sensor(adc)
        w_ref, dbm_ref = _ref_power(adc)
        assert w == pytest.approx(w_ref, rel=1e-9)
        assert dbm == pytest.approx(dbm_ref, rel=1e-9)
    # low/high law switch at val=0.05 -> adc = 0.05*4095/3.3 ~ 62
    w_lo, _ = meter.power_from_sensor(61.0)
    w_hi, _ = meter.power_from_sensor(63.0)
    assert w_lo < w_hi


def test_power_calibration_offsets():
    # +10 coupling units = +1 dB
    _, dbm0 = meter.power_from_sensor(1000.0, coupling_cfg=100)
    _, dbm1 = meter.power_from_sensor(1000.0, coupling_cfg=110)
    assert dbm1 - dbm0 == pytest.approx(1.0, abs=1e-9)
    # sensor null shifts the detector voltage by 1 mV/unit
    w_n, _ = meter.power_from_sensor(1000.0, sensor_null_cfg=120)
    val = 0.020 + 1000.0 * 3.3 / 4095.0
    a, b, c = meter.HIGH_RF_PWR_COEFF
    assert w_n == pytest.approx(a + b * val + c * val * val, rel=1e-9)


def test_swr_meter_averaging_and_vswr():
    m = meter.SwrMeter()
    # fwd 1000 counts, rev chosen for a known reflection
    for _ in range(meter.SWR_SAMPLES_CNT):
        assert not m.update(1000.0, 300.0)
    assert m.update(1000.0, 300.0)   # 6th call produces the measurement
    w_f, _ = _ref_power(1000.0)
    w_r, _ = _ref_power(300.0)
    assert m.fwd_pwr == pytest.approx(w_f, rel=1e-9)
    rho = math.sqrt(w_r / w_f)
    assert m.vswr == pytest.approx((1 + rho) / (1 - rho), rel=1e-9)


def test_swr_swap_and_protection():
    m = meter.SwrMeter(swap_fwd_rev=True, vswr_protection_threshold=2.0)
    for _ in range(meter.SWR_SAMPLES_CNT):
        m.update(300.0, 1000.0)      # swapped: fwd is really 1000
    m.update(300.0, 1000.0)
    assert m.fwd_pwr > m.rev_pwr
    assert m.fwd_pwr >= meter.SWR_MIN_CALC_POWER
    assert m.vswr > 2.0 and m.high_vswr_detected
    # threshold 1.0 = OFF never latches
    m2 = meter.SwrMeter(vswr_protection_threshold=1.0)
    for _ in range(meter.SWR_SAMPLES_CNT + 1):
        m2.update(1000.0, 900.0)
    assert not m2.high_vswr_detected


def test_band_power_factor():
    # coarse: cfg 80 -> 0.80 clamped to 0.55; fine: /400
    assert meter.band_power_factor(80, 0) == pytest.approx(0.55)
    assert meter.band_power_factor(80, 0, reduce_flag=True) \
        == pytest.approx(0.20)
    # 2 W request scales by sqrt(2000/5000)
    assert meter.band_power_factor(40, 2000) \
        == pytest.approx(0.40 * math.sqrt(0.4))
    # generic band: halfway between anchors
    mid = (3_500_000 + 28_000_000) / 2
    assert meter.generic_band_power_factor(mid, 20, 40) \
        == pytest.approx((0.20 + 0.40) / 2)


def test_resolve_power_level():
    assert meter.resolve_power_level("full") == (0, "full")
    assert meter.resolve_power_level("medium") == (2000, "medium")
    # AM capped at 2 W, and full power in AM becomes 2 W
    assert meter.resolve_power_level("full", mode="am") == (2000, "full")
    assert meter.resolve_power_level("high", mode="am") == (2000, "high")
    # out of band
    assert meter.resolve_power_level("high", in_band=False) == (5, "high")
    assert meter.resolve_power_level(
        "high", in_band=False, tx_outside_bands=True) == (50, "high")
