"""Batched Codec2 700C decoder + 700D fleet stack vs the scalar
per-channel path, channel-for-channel."""
import numpy as np
import pytest

from uhsdr_tpu.modems import codec2_700c as c7
from uhsdr_tpu.modems.codec2_700c_batch import Codec2FleetDecoder700C


def _frame_streams(C, n_frames, seed=0):
    """Realistic encoded 700C frames (varied per channel) + random-bit
    frames (odd Wo/voicing/VQ combinations)."""
    rng = np.random.default_rng(seed)
    streams = np.empty((C, n_frames, 28), np.uint8)
    enc = c7.Codec2Encoder700C()
    t = np.arange(n_frames * 320) / 8000.0
    for ci in range(C):
        if ci % 2 == 0:
            f0 = 90.0 + 23.0 * ci
            sp = (3000 * np.sin(2 * np.pi * f0 * t)
                  * (0.5 + 0.5 * np.sin(2 * np.pi * 1.7 * t))
                  + 40 * rng.standard_normal(t.size))
            for k in range(n_frames):
                streams[ci, k] = enc.encode_frame(sp[k * 320:(k + 1) * 320])
        else:
            streams[ci] = rng.integers(0, 2, (n_frames, 28),
                                       dtype=np.uint8)
    return streams


def test_batched_700c_decoder_matches_scalar_stream():
    C, n_frames = 5, 8
    streams = _frame_streams(C, n_frames)
    scalars = [c7.Codec2Decoder700C() for _ in range(C)]
    batch = Codec2FleetDecoder700C(C)

    ref = np.empty((C, n_frames * 320), np.int16)
    out = np.empty_like(ref)
    for k in range(n_frames):
        for ci in range(C):
            ref[ci, k * 320:(k + 1) * 320] = scalars[ci].decode_frame(
                streams[ci, k])
        out[:, k * 320:(k + 1) * 320] = batch.decode_frames(streams[:, k])

    diff = np.abs(out.astype(np.int32) - ref.astype(np.int32))
    assert np.mean(diff == 0) > 0.99, np.mean(diff == 0)
    assert diff.max() <= 2, diff.max()
    for ci in range(C):
        assert int(batch.rand_state[ci]) == scalars[ci].rand.next, ci


def test_batched_700c_subset_decode():
    """Ragged frame arrival: decoding a channel subset must advance only
    that subset's state (bit-compare against the full-batch order)."""
    C = 4
    streams = _frame_streams(C, 4, seed=3)
    b1 = Codec2FleetDecoder700C(C)
    b2 = Codec2FleetDecoder700C(C)
    outs1, outs2 = [], []
    for k in range(4):
        outs1.append(b1.decode_frames(streams[:, k]))
        # same frames via two subset calls
        o = np.zeros((C, 320), np.int16)
        o[::2] = b2.decode_frames(streams[::2, k], idx=np.arange(0, C, 2))
        o[1::2] = b2.decode_frames(streams[1::2, k],
                                   idx=np.arange(1, C, 2))
        outs2.append(o)
    np.testing.assert_array_equal(np.concatenate(outs1, axis=-1),
                                  np.concatenate(outs2, axis=-1))


def test_fleet_700d_stack_matches_scalar():
    from uhsdr_tpu.modems import freedv as freedv_mod
    from uhsdr_tpu.modems.fdmdv_batch import FreeDv700DFleet

    fs8 = 8000
    t8 = np.arange(fs8 * 4) / fs8
    speech = (5000 * np.sin(np.cumsum(
        2 * np.pi * (120 + 25 * np.sin(2 * np.pi * 1.1 * t8)) / fs8))
    ).astype(np.float32)
    tx = freedv_mod.FreeDv700D()
    iq8 = tx.mod(speech)
    C = 3
    blk = 1280 * 4
    n = len(iq8) // blk * blk
    sig = np.stack([iq8[:n]] * C)

    scalars = [freedv_mod.FreeDv700D() for _ in range(C)]
    fleet = FreeDv700DFleet(C)
    ref = [[] for _ in range(C)]
    out = [[] for _ in range(C)]
    for s in range(0, n, blk):
        for c in range(C):
            ref[c].append(scalars[c].demod(sig[c, s:s + blk]))
        sp = fleet.demod(sig[:, s:s + blk])
        for c in range(C):
            out[c].append(sp[c])
    assert fleet.frames_decoded == sum(s.frames_decoded for s in scalars)
    assert fleet.frames_decoded >= C * 10
    for c in range(C):
        r = np.concatenate(ref[c])
        o = np.concatenate(out[c])
        assert len(r) == len(o), (c, len(r), len(o))
        diff = np.abs(r - o)
        assert np.mean(diff == 0) > 0.99, (c, np.mean(diff == 0))
        assert diff.max() <= 2.0, (c, diff.max())
