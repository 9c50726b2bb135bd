"""CAT (FT-817 + UHSDR extensions) protocol tests."""
import numpy as np

from uhsdr_tpu.control import cat
from uhsdr_tpu.core import config as config_mod


def _proto():
    return cat.CatProtocol(cat.Radio())


def test_freq_set_get_roundtrip():
    p = _proto()
    # 14.074.000 Hz -> BCD 01 40 74 00
    resp = p.handle_frame(bytes([0x01, 0x40, 0x74, 0x00, cat.SET_FREQ]))
    assert resp == b"\x00"
    assert p.radio.dial_hz == 14_074_000
    resp = p.handle_frame(bytes([0, 0, 0, 0, cat.GET_FREQ]))
    assert resp[:4] == bytes([0x01, 0x40, 0x74, 0x00])
    assert resp[4] == 1   # USB


def test_mode_set_all_codes():
    p = _proto()
    for code, mode in [(0, "lsb"), (1, "usb"), (2, "cw"), (3, "cw"),
                       (4, "am"), (8, "fm"), (0x88, "fm")]:
        assert p.handle_frame(bytes([code, 0, 0, 0, cat.MODE_SET])) == b"\x00"
        assert p.radio.mode == mode
    assert p.handle_frame(bytes([0x77, 0, 0, 0, cat.MODE_SET])) == b"\xFF"
    # FM-N turned deviation down
    p.handle_frame(bytes([0x88, 0, 0, 0, cat.MODE_SET]))
    assert not p.radio.fm_dev5khz


def test_ptt_semantics():
    p = _proto()
    calls = []
    p.radio.on_ptt = calls.append
    assert p.handle_frame(bytes([0, 0, 0, 0, cat.PTT_ON])) == b"\x00"
    assert p.handle_frame(bytes([0, 0, 0, 0, cat.PTT_ON])) == b"\xF0"
    assert p.handle_frame(bytes([0, 0, 0, 0, cat.PTT_OFF])) == b"\x00"
    assert p.handle_frame(bytes([0, 0, 0, 0, cat.PTT_OFF])) == b"\xF0"
    assert calls == [True, True, False, False]


def test_uhsdr_identify_and_config_rw():
    p = _proto()
    assert p.handle_frame(bytes([0, 0, 0, 0, cat.UHSDR_ID])) == b"UHSDR"
    entry = config_mod.entry_by_name("dsp_nr_strength")
    addr = 0x8000 | entry.eeprom_id
    # write 150
    p.handle_frame(bytes([addr >> 8, addr & 0xFF, 150, 0, cat.EEPROM_WRITE]))
    assert p.radio.config["dsp_nr_strength"] == 150
    resp = p.handle_frame(bytes([addr >> 8, addr & 0xFF, 0, 0,
                                 cat.EEPROM_READ]))
    assert resp[0] | (resp[1] << 8) == 150
    # string entry over CAT enumeration
    entry = config_mod.entry_by_name("dmod_mode")
    addr = 0x8000 | entry.eeprom_id
    p.handle_frame(bytes([addr >> 8, addr & 0xFF,
                          entry.cat_encode("cw"), 0, cat.EEPROM_WRITE]))
    assert p.radio.config["dmod_mode"] == "cw"


def test_tcp_server_client_roundtrip(tmp_path):
    radio = cat.Radio()
    srv = cat.CatServer(radio).start()
    try:
        c = cat.CatClient(port=srv.port)
        assert c.identify()
        c.set_frequency(7_030_500)
        assert radio.dial_hz == 7_030_500
        f, mode = c.get_frequency()
        assert f == 7_030_500 and mode == "usb"
        c.set_mode("cw")
        assert radio.mode == "cw" and radio.cw_lsb
        c.ptt(True)
        assert radio.ptt
        c.ptt(False)

        # config backup / restore (uhsdr_tool.py analog)
        radio.config["cw_speed_wpm"] = 28
        path = str(tmp_path / "backup.json")
        data = c.backup_config(path)
        assert data["cw_speed_wpm"] == 28
        radio.config["cw_speed_wpm"] = 20
        c.restore_config(path)
        assert radio.config["cw_speed_wpm"] == 28
        c.close()
    finally:
        srv.stop()


def test_registry_mirrors_reference_table():
    """The registry carries the reference's full ConfigEntryInfo table
    (>=144 rows after macro expansion, ui_configuration.c:61-282) with
    the real EEPROM ids, defaults and ranges, imported as data."""
    from uhsdr_tpu.core import config as config_mod

    assert len(config_mod.REGISTRY) >= 144
    ids = [e.eeprom_id for e in config_mod.REGISTRY]
    assert len(set(ids)) == len(ids)
    # spot-check known reference rows (ui_configuration.c)
    by_name = {e.name: e for e in config_mod.REGISTRY}
    agc = by_name["agc_wdsp_thresh_db"]
    assert agc.ref_id is not None            # real firmware id attached
    tp = by_name["band0_5w"]                  # per-band power factor row
    assert tp.min == 0
    sam = by_name["sam_pll_locking_range"] if "sam_pll_locking_range" \
        in by_name else by_name["sam_fmax"]
    assert sam.ref_id is not None
    # defaults respect their own clamps
    for e in config_mod.REGISTRY:
        if e.typ in (int, float) and e.min is not None and e.max is not None:
            assert e.min <= e.clamp(e.default) <= e.max, e.name


def test_band_vfo_memory_cat_clone(tmp_path):
    """Band/VFO memories round-trip through the CAT clone path
    (EEPROM_BAND0_* id ranges, ui_configuration.c:920-923)."""
    radio = cat.Radio()
    srv = cat.CatServer(radio).start()
    try:
        c = cat.CatClient(port=srv.port)
        bm = radio.config.band_memory
        bm.dial["A"][3] = 14_074_000
        bm.mode["A"][3] = 1
        bm.dial["B"][5] = 21_200_123
        path = str(tmp_path / "clone.json")
        c.backup_config(path)

        # wipe, then restore over CAT and check the memories came back
        from uhsdr_tpu.core.config import BandMemories
        radio.config.band_memory = BandMemories()
        assert radio.config.band_memory.dial["A"][3] != 14_074_000
        c.restore_config(path)
        assert radio.config.band_memory.dial["A"][3] == 14_074_000
        assert radio.config.band_memory.mode["A"][3] == 1
        assert radio.config.band_memory.dial["B"][5] == 21_200_123
        c.close()
    finally:
        srv.stop()
