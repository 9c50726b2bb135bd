"""LO frequency planning (`control/osc.py` vs `osc_si570.c`/`osc_si5351a.c`)."""
import math

import pytest

from uhsdr_tpu.control import osc


def test_si570_divider_search_in_range():
    # 14.1 MHz dial -> 56.4 MHz LO: every solution keeps fDCO in range
    for f_mhz in (14.0, 56.4, 120.0, 10.1, 250.0):
        cfg = osc.si570_find_config(f_mhz)
        assert cfg is not None, f_mhz
        assert osc.SI570_FDCO_MIN_MHZ <= cfg.fdco_mhz <= osc.SI570_FDCO_MAX_MHZ
        assert cfg.hsdiv in osc.SI570_HS_DIV
        assert cfg.n1 == 1 or (cfg.n1 % 2 == 0 and cfg.n1 <= 128)
        assert cfg.fdco_mhz == pytest.approx(f_mhz * cfg.n1 * cfg.hsdiv)
        # synthesized frequency = fdco/(n1*hsdiv) = request exactly
        assert cfg.rfreq * osc.SI570_FACTORY_FXTAL_MHZ / (cfg.n1 * cfg.hsdiv) \
            == pytest.approx(f_mhz, rel=1e-12)


def test_si570_register_roundtrip():
    cfg = osc.si570_find_config(56.4)
    regs = osc.si570_config_to_regs(cfg)
    assert len(regs) == 6
    back = osc.si570_regs_to_config(regs, 56.4)
    assert back.hsdiv == cfg.hsdiv and back.n1 == cfg.n1
    # RFREQ quantized to 2^-28
    assert back.rfreq == pytest.approx(cfg.rfreq, abs=2 ** -27)


def test_si570_startup_fxtal_calibration():
    # factory-programmed part at 56.32 MHz: derive fxtal from its regs
    cfg = osc.si570_find_config(56.32, fxtal_mhz=114.2851)
    regs = osc.si570_config_to_regs(cfg)
    dev = osc.Si570(startup_regs=regs, startup_fout_mhz=56.32)
    assert dev.fxtal_mhz == pytest.approx(114.2851, abs=1e-3)


def test_si570_smooth_vs_large_step():
    writes = []
    dev = osc.Si570(reg_writer=lambda r, d: writes.append((r, d)),
                    startup_fout_mhz=56.32)
    assert dev.prepare_next_frequency(14_000_000.0) is osc.OscResult.OK
    assert dev.is_next_step_large()          # far from 56.32*4
    assert dev.change_to_next_frequency() is osc.OscResult.OK
    # +1 kHz dial step: 4 kHz LO step, well within 3500 ppm -> smooth
    assert dev.prepare_next_frequency(14_001_000.0) is osc.OscResult.OK
    assert not dev.is_next_step_large()
    cur = dev.cur
    dev.change_to_next_frequency()
    assert dev.cur.n1 == cur.n1 and dev.cur.hsdiv == cur.hsdiv
    assert len(writes) == 2
    # a band change is a large step again
    dev.prepare_next_frequency(28_000_000.0)
    assert dev.is_next_step_large()


def test_si570_limits_and_ppm():
    dev = osc.Si570()
    # 300 MHz * 4 is out of hard range
    assert dev.prepare_next_frequency(300e6) is osc.OscResult.TUNE_IMPOSSIBLE
    # below soft min but above hard min -> limited
    assert dev.prepare_next_frequency(1e6) is osc.OscResult.TUNE_LIMITED
    # ppm correction rescales the synthesized output by -ppm
    dev.set_ppm(10.0)
    f0 = osc.planned_output_hz(dev, 14e6)
    dev.set_ppm(0.0)
    f1 = osc.planned_output_hz(dev, 14e6)
    # with corrected (larger) fxtal the same request still synthesizes
    # ~14 MHz: rfreq adapts; outputs agree to the RFREQ resolution
    assert f0 == pytest.approx(14e6, rel=1e-9)
    assert f1 == pytest.approx(14e6, rel=1e-9)
    # temperature factor shifts the target like the reference (ref 14 MHz)
    ft = osc.planned_output_hz(dev, 14e6, temp_factor_hz=14.0)
    assert ft == pytest.approx(14e6 * (1 + 1e-6), rel=1e-9)


def test_si5351_plan_quadrature():
    dev = osc.Si5351(quadrature=True)
    # 14 MHz > phase90 minimum -> direct quadrature, even divider <= 126
    assert dev.prepare_next_frequency(14e6) is osc.OscResult.OK
    cfg = dev.next
    assert cfg.phased_output and cfg.multisynth_divider % 2 == 0
    assert cfg.multisynth_divider <= osc.SI5351_MAX_DIVIDER_PHASE90
    assert 15 <= cfg.pll_mult <= 90
    out = osc.planned_output_hz(dev, 14e6)
    assert out == pytest.approx(14e6, abs=30.0)  # 20-bit fraction granularity


def test_si5351_plan_low_freq_4x():
    dev = osc.Si5351(quadrature=True)
    f = 1.8e6   # below phase90 min -> 4x Johnson-counter clock
    assert dev.prepare_next_frequency(f) is osc.OscResult.OK
    cfg = dev.next
    assert not cfg.phased_output
    assert cfg.frequency == 4 * int(f)
    out = osc.planned_output_hz(dev, f)
    assert out == pytest.approx(f, abs=10.0)


def test_si5351_divider_reuse_and_registers():
    writes = {}
    dev = osc.Si5351(reg_writer=lambda r, d: writes.setdefault(r, d),
                     quadrature=True)
    dev.prepare_next_frequency(14.0e6)
    d0 = dev.next.multisynth_divider
    dev.change_to_next_frequency()
    # small step reuses the divider -> no PLL reset needed
    dev.prepare_next_frequency(14.05e6)
    assert dev.next.multisynth_divider == d0
    assert dev.next.pllreset is False
    dev.change_to_next_frequency()
    # register blocks written: PLL A + MS0 + MS1 + CLK1 phase
    assert osc.SI5351_SYNTH_PLL_A in writes
    assert osc.SI5351_SYNTH_MS_0 in writes and osc.SI5351_SYNTH_MS_1 in writes
    assert writes[osc.SI5351_CLK1_PHASE_OFFSET] == bytes([d0])
    # P1 packing of the multisynth: 128*div-512
    ms = writes[osc.SI5351_SYNTH_MS_0]
    p1 = ((ms[2] & 3) << 16) | (ms[3] << 8) | ms[4]
    assert p1 == 128 * d0 - 512


def test_si5351_pll_register_packing():
    regs = osc.si5351_pll_regs(35, 524288, osc.MAX_UINT20)
    fract = int(128.0 * (524288 / osc.MAX_UINT20))
    p1 = 128 * 35 + fract - 512
    p2 = 128 * 524288 - osc.MAX_UINT20 * fract
    p3 = osc.MAX_UINT20
    assert regs[0] == (p3 >> 8) & 0xFF and regs[1] == p3 & 0xFF
    assert ((regs[2] << 16) | (regs[3] << 8) | regs[4]) & 0x3FFFF == p1
    assert regs[5] == (((p3 >> 12) & 0xF0) | ((p2 >> 16) & 0x0F))


def test_synthesis_error_sweep():
    # across the HF bands both synthesizers land within spec of request
    si570 = osc.Si570()
    si5351 = osc.Si5351()
    for f in (3.6e6, 7.1e6, 14.2e6, 21.2e6, 28.5e6):
        assert abs(osc.planned_output_hz(si570, f) - f) < 0.5
        assert abs(osc.planned_output_hz(si5351, f) - f) < 30.0
