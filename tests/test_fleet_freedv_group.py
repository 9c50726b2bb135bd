"""FreeDvFleetGroup: N FreeDV channels, batched device front +
per-channel modems (VERDICT r3 item 4)."""
from __future__ import annotations

import numpy as np
import pytest


def test_freedv_fleet_group_decodes_channels():
    from uhsdr_tpu.modems import freedv
    from uhsdr_tpu.parallel.fleet import FreeDvFleetGroup

    fs = 8000
    n_ch = 3
    # one clean 1600 transmission, replicated to every channel at a
    # DIFFERENT RF offset; the group's per-channel NCO must translate
    # each back to baseband
    t8 = np.arange(fs * 4) / fs
    f0 = 120 + 25 * np.sin(2 * np.pi * 1.1 * t8)
    speech = (5000 * np.sin(np.cumsum(2 * np.pi * f0 / fs))).astype(
        np.float32)
    tx = freedv.FreeDv1600(vocoder="codec2")
    iq8 = tx.mod(speech)

    # upsample x6 to 48k (zero-stuff + the modem glue's own filter role
    # is exercised by RateConverter on the way back down)
    from scipy.signal import resample_poly
    iq48 = resample_poly(iq8, 6, 1).astype(np.complex64)
    offsets = [0.0, 700.0, -1200.0]
    T = 7680 * (len(iq48) // 7680)
    n48 = np.arange(T)
    planes = np.stack([iq48[:T] * np.exp(2j * np.pi * f * n48 / 48000.0)
                       for f in offsets])

    grp = FreeDvFleetGroup(n_ch, block_len_48k=7680,
                           translate_hz=np.asarray(offsets))
    outs = [[] for _ in range(n_ch)]
    for s in range(0, T, 7680):
        blk = planes[:, s:s + 7680]
        res = grp.process_block(
            np.ascontiguousarray(blk.real).astype(np.float32),
            np.ascontiguousarray(blk.imag).astype(np.float32))
        for c in range(n_ch):
            outs[c].append(res[c])

    # r5: the modem tier is the BATCHED FreeDv1600Fleet (array state,
    # no per-channel modem objects) — per-channel counts live there
    per_ch = grp._fleet_modem.frames_per_channel
    for c in range(n_ch):
        assert per_ch[c] >= 10, (c, per_ch[c])
        speech_out = np.concatenate(outs[c])
        assert np.isfinite(speech_out).all()
        rms = float(np.sqrt(np.mean(speech_out.astype(np.float64) ** 2)))
        assert 10.0 < rms < 20000.0, (c, rms)
    assert grp.stats["frames_decoded"] >= 30
