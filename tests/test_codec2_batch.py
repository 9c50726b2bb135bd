"""Batched Codec2 1300 decoder (`codec2_1300_batch`) vs the scalar
decoder, channel-for-channel over multi-frame streams — including the
PRNG-consuming unvoiced/postfilter paths, the soft-mute branch, and
state carry (overlap-add, bg_est, ex_phase, prev-frame interpolation).
"""
import numpy as np

from uhsdr_tpu.modems import codec2_1300 as c2
from uhsdr_tpu.modems.codec2_1300_batch import Codec2FleetDecoder1300


def _snr(ref, out):
    ref = ref.astype(np.float64)
    err = out.astype(np.float64) - ref
    p = np.sum(ref ** 2)
    return 10 * np.log10(p / max(np.sum(err ** 2), 1e-12)) \
        if p > 0 else np.inf


def _frame_streams(C, n_frames, seed=0):
    """Per-channel frame streams: realistic encoded speech frames with
    per-channel differing content, plus random-bit frames (hits odd
    Wo/L combinations and the unvoiced PRNG path)."""
    rng = np.random.default_rng(seed)
    streams = np.empty((C, n_frames, 52), np.uint8)
    enc = c2.Codec2Encoder1300()
    t = np.arange(n_frames * 320) / 8000.0
    for ci in range(C):
        if ci % 2 == 0:
            f0 = 100.0 + 17.0 * ci
            sp = (3000 * np.sin(2 * np.pi * f0 * t)
                  * (0.5 + 0.5 * np.sin(2 * np.pi * 1.3 * t))
                  + 50 * rng.standard_normal(t.size))
            for k in range(n_frames):
                streams[ci, k] = enc.encode_frame(sp[k * 320:(k + 1) * 320])
        else:
            streams[ci] = rng.integers(0, 2, (n_frames, 52),
                                       dtype=np.uint8)
    return streams


def test_batched_decoder_matches_scalar_stream():
    C, n_frames = 6, 8
    streams = _frame_streams(C, n_frames)
    ber = np.zeros(C)
    ber[3] = 0.2          # soft-mute branch on one channel

    scalars = [c2.Codec2Decoder1300() for _ in range(C)]
    batch = Codec2FleetDecoder1300(C)

    ref = np.empty((C, n_frames * 320), np.int16)
    out = np.empty_like(ref)
    for k in range(n_frames):
        for ci in range(C):
            ref[ci, k * 320:(k + 1) * 320] = scalars[ci].decode_frame(
                streams[ci, k], ber_est=float(ber[ci]))
        out[:, k * 320:(k + 1) * 320] = batch.decode_frames(
            streams[:, k], ber_est=ber)

    for ci in range(C):
        snr = _snr(ref[ci], out[ci])
        # float64 band-sum order differs (cumsum); everything else is
        # op-for-op identical incl. the PRNG sequence
        assert snr > 60.0 or np.array_equal(ref[ci], out[ci]), (ci, snr)
    # PRNG states must track the scalar decoders exactly (consumption
    # counts are data-dependent — any drift breaks later frames)
    for ci in range(C):
        assert int(batch.rand_state[ci]) == scalars[ci].rand.next, ci


def test_batched_decoder_bit_level_agreement_rate():
    """Sample-level agreement: beyond SNR, the overwhelming majority of
    int16 samples must be EXACTLY equal (the only tolerated diffs are
    +-1 LSB from summation-order rounding at trunc boundaries)."""
    C, n_frames = 4, 6
    streams = _frame_streams(C, n_frames, seed=7)
    scalars = [c2.Codec2Decoder1300() for _ in range(C)]
    batch = Codec2FleetDecoder1300(C)
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
