"""Codec2 1300-mode vocoder interop (VERDICT r2 item 2).

The REFERENCE's own codec (drivers/freedv/codec2.c + its DSP sources,
compiled from /root/reference via tools/gen_codec2_ref.c) encodes
synthetic speech to 52-bit frames and decodes them; this repo's
independent decoder (`modems/codec2_1300.py`) consumes the SAME bit
stream and must reproduce the reference decoder's waveform — including
its LCG-driven unvoiced phases, which requires the PRNG sequence, the
consumption order, and even the reference's float32 `L = PI/Wo`
truncation (PI/Wo_min = 79.999998 -> 79) to match.
"""
from __future__ import annotations

import os
import shutil
import subprocess

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference/mchf-eclipse/drivers/freedv"

SRCS = ["codec2.c", "sine.c", "nlp.c", "lpc.c", "lsp.c", "quantise.c",
        "interp.c", "phase.c", "postfilter.c", "pack.c", "codebook.c",
        "codebookd.c", "codebookjvm.c", "codebookge.c", "kiss_fft.c",
        "kiss_fftr.c", "codec2_fft.c", "newamp1.c", "newamp2.c",
        "mbest.c", "codebooknewamp1.c", "codebooknewamp1_energy.c",
        "codebooknewamp2.c", "codebooknewamp2_energy.c", "c2wideband.c",
        "codebookmel.c", "codebooklspmelvq.c", "dct2.c"]


def _make_speech(n_frames: int = 50) -> np.ndarray:
    """Speech-like: pitched buzz with drifting f0, AM envelope, noise
    bursts (voiced/unvoiced alternation exercises the PRNG paths)."""
    fs = 8000
    n = 320 * n_frames
    t = np.arange(n) / fs
    f0 = 110 + 30 * np.sin(2 * np.pi * 0.7 * t)
    phase = np.cumsum(2 * np.pi * f0 / fs)
    voiced = np.sin(2 * np.pi * 1.1 * t) > -0.3
    sig = (np.sin(phase) + 0.5 * np.sin(2 * phase)
           + 0.3 * np.sin(3 * phase)) * 6000
    rng = np.random.default_rng(0)
    sig = np.where(voiced, sig, 1500 * rng.standard_normal(n))
    sig = sig * (0.6 + 0.4 * np.sin(2 * np.pi * 2.3 * t))
    return sig.astype(np.int16)


@pytest.fixture(scope="module")
def golden(tmp_path_factory):
    if shutil.which("gcc") is None or not os.path.isdir(REF):
        pytest.skip("reference tree or gcc unavailable")
    td = tmp_path_factory.mktemp("c2ref")
    exe = str(td / "gen")
    subprocess.run(
        ["gcc", "-O2", f"-I{REF}", "-o", exe,
         os.path.join(REPO, "tools", "gen_codec2_ref.c")]
        + [os.path.join(REF, s) for s in SRCS] + ["-lm"],
        check=True, capture_output=True)
    _make_speech().tofile(td / "speech_in.i16")
    subprocess.run([exe], cwd=td, check=True, capture_output=True)
    bits = np.fromfile(td / "enc_bits.u8", np.uint8).reshape(-1, 7)
    b52 = np.unpackbits(bits, axis=1)[:, :52]
    dec_pcm = np.fromfile(td / "dec_pcm.i16", np.int16)
    feat = np.fromfile(td / "feat.f32", np.float32).reshape(-1, 23)
    return b52, dec_pcm, feat


def test_decoder_matches_reference_waveform(golden):
    """Reference-encoded bits -> our decoder == reference decoder output
    (sample-aligned SNR; the PRNG tracking makes even the unvoiced noise
    phases match)."""
    from uhsdr_tpu.modems.codec2_1300 import Codec2Decoder1300

    b52, ref_pcm, _ = golden
    dec = Codec2Decoder1300()
    ours = np.concatenate([dec.decode_frame(b52[i])
                           for i in range(len(b52))]).astype(np.float64)
    ref = ref_pcm[: len(ours)].astype(np.float64)
    err = ref - ours
    snr = 10 * np.log10(np.mean(ref ** 2) / (np.mean(err ** 2) + 1e-12))
    assert snr >= 25.0, f"decoder SNR vs reference {snr:.1f} dB"

    # and segment-level: the decoder must TRACK, not just average out
    seg_snrs = []
    for s in range(0, len(ref) - 320, 320):
        r, e = ref[s:s + 320], err[s:s + 320]
        if np.mean(r ** 2) > 100.0:
            seg_snrs.append(10 * np.log10(np.mean(r ** 2)
                                          / (np.mean(e ** 2) + 1e-12)))
    assert np.median(seg_snrs) >= 30.0, np.median(seg_snrs)
    assert min(seg_snrs) >= 10.0, min(seg_snrs)


def test_parameter_recovery_exact(golden):
    """Unpack + dequantise + LSP->LPC against the reference's own
    per-subframe feature dump (lsps, e, Wo, voicing, ak)."""
    import uhsdr_tpu.modems.codec2_1300 as c2

    b52, _, feat = golden
    _, cb_bits = c2._lsp_codebooks()
    for fi in range(min(20, len(b52))):
        up = c2._BitUnpacker(b52[fi])
        [up.take(1) for _ in range(4)]
        Wo3 = c2.decode_wo(up.take(c2.WO_BITS))
        e3 = c2.decode_energy(up.take(c2.E_BITS))
        idx = [up.take(cb_bits[i]) for i in range(10)]
        lsps3 = c2.bw_expand_lsps(
            c2.check_lsp_order(c2.decode_lsps_scalar(idx)))
        ak = c2.lsp_to_lpc(lsps3)
        r = feat[fi * 4 + 3]
        np.testing.assert_allclose(Wo3, r[11], rtol=1e-5)
        np.testing.assert_allclose(e3, r[10], rtol=1e-4)
        np.testing.assert_allclose(lsps3, r[:10], atol=1e-5)
        np.testing.assert_allclose(ak[1:], r[13:23], atol=1e-4)


def test_freedv1600_codec2_path_on_recorded_iq():
    """The firmware's recorded 1600 IQ through FreeDv1600 with the
    codec2 vocoder: real off-air FreeDV now decodes to the reference's
    SPEECH, not just its bits."""
    from uhsdr_tpu import data
    from uhsdr_tpu.modems import freedv

    iq = data.freedv("test_iq")
    iq = iq / (np.max(np.abs(iq)) + 1e-9)
    rx = freedv.FreeDv1600(vocoder="codec2")
    out = rx.demod(iq.astype(np.complex128))
    assert rx.frames_decoded >= 60
    assert out.size > 0 and np.isfinite(out).all()
    # decoded speech at a sane int16-scale level (the recorded vector is
    # a real codec2 bit stream, so the decoder output is actual speech)
    rms = np.sqrt(np.mean(out.astype(np.float64) ** 2))
    assert 10.0 < rms < 20000.0, rms


def test_encoder_interop_with_reference_decoder(golden, tmp_path_factory):
    """Our 1300 ENCODER's bit streams through the REFERENCE decoder
    (compiled from /root/reference via tools/gen_codec2_dec.c):
    parameter-level parity with the reference encoder (voicing, Wo) and
    round-trip quality at least matching the reference encoder's own."""
    import uhsdr_tpu.modems.codec2_1300 as c2
    from uhsdr_tpu.modems.codec2_1300 import (Codec2Decoder1300,
                                              Codec2Encoder1300)

    td = tmp_path_factory.mktemp("c2enc")
    exe = str(td / "dec")
    subprocess.run(
        ["gcc", "-O2", f"-I{REF}", "-o", exe,
         os.path.join(REPO, "tools", "gen_codec2_dec.c")]
        + [os.path.join(REF, s) for s in SRCS] + ["-lm"],
        check=True, capture_output=True)

    sig = _make_speech(40).astype(np.float64)
    enc = Codec2Encoder1300()
    b52 = np.stack([enc.encode_frame(sig[i * 320:(i + 1) * 320])
                    for i in range(40)])
    packed = np.packbits(np.concatenate(
        [b52, np.zeros((40, 4), np.uint8)], axis=1), axis=1)
    packed.tofile(td / "in_bits.u8")
    subprocess.run([exe], cwd=td, check=True, capture_output=True)
    ref_dec = np.fromfile(td / "ref_dec.i16", np.int16).astype(np.float64)

    # 1) the reference decoder renders our stream == our decoder does
    dec = Codec2Decoder1300()
    ours = np.concatenate([dec.decode_frame(b)
                           for b in b52]).astype(np.float64)
    m = min(len(ref_dec), len(ours))
    snr = 10 * np.log10(np.mean(ref_dec[:m] ** 2)
                        / (np.mean((ref_dec[:m] - ours[:m]) ** 2) + 1e-9))
    assert snr >= 25.0, snr

    # 2) parameter parity with the reference ENCODER on the same speech
    ref_bits, _, _ = golden
    n = min(len(ref_bits), len(b52))
    agree_v = agree_wo = 0
    for i in range(n):
        ur = c2._BitUnpacker(ref_bits[i])
        uo = c2._BitUnpacker(b52[i])
        vr = [ur.take(1) for _ in range(4)]
        vo = [uo.take(1) for _ in range(4)]
        agree_v += sum(a == b for a, b in zip(vr, vo))
        agree_wo += abs(ur.take(c2.WO_BITS) - uo.take(c2.WO_BITS)) <= 3
    assert agree_v >= 0.9 * 4 * n, (agree_v, 4 * n)
    assert agree_wo >= 0.85 * n, (agree_wo, n)


def test_decode_soft_mute_branch():
    """codec2.c:1297 — ber_est > 0.15 forces all-unvoiced, quiet energy
    (index 10) and 200/200 Hz bandwidth expansion, squelching corrupted
    frames instead of rendering them."""
    from uhsdr_tpu.modems.codec2_1300 import (Codec2Decoder1300,
                                              Codec2Encoder1300)
    # encode loud wideband noise: the LPC residual energy (what the
    # energy index quantizes) stays high, so the normal decode is loud
    rng = np.random.default_rng(7)
    speech = (6000.0 * rng.standard_normal(320 * 4)).astype(np.float32)
    enc = Codec2Encoder1300()
    frames = [enc.encode_frame(speech[i * 320:(i + 1) * 320])
              for i in range(4)]

    loud = np.concatenate([Codec2Decoder1300().decode_frame(f)
                           for f in [frames[-1]] * 3])
    dec = Codec2Decoder1300()
    muted = np.concatenate([dec.decode_frame(f, ber_est=0.2)
                            for f in [frames[-1]] * 3])
    rms = lambda x: float(np.sqrt(np.mean(x.astype(np.float64) ** 2)))
    assert rms(loud) > 200.0          # sanity: the tone decodes loud
    assert rms(muted) < 0.1 * rms(loud), (rms(muted), rms(loud))


# ---------------------------------------------------------------------------
# Codec2 700C (the 700D radio mode's vocoder) — VERDICT r3 item 1
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def golden700(tmp_path_factory):
    if shutil.which("gcc") is None or not os.path.isdir(REF):
        pytest.skip("reference tree or gcc unavailable")
    td = tmp_path_factory.mktemp("c2ref700")
    exe = str(td / "gen")
    subprocess.run(
        ["gcc", "-O2", f"-I{REF}", "-o", exe,
         os.path.join(REPO, "tools", "gen_codec2_ref.c")]
        + [os.path.join(REF, s) for s in SRCS] + ["-lm"],
        check=True, capture_output=True)
    _make_speech().tofile(td / "speech_in.i16")
    subprocess.run([exe, "700C"], cwd=td, check=True, capture_output=True)
    bits = np.fromfile(td / "enc_bits.u8", np.uint8).reshape(-1, 4)
    b28 = np.unpackbits(bits, axis=1)[:, :28]
    dec_pcm = np.fromfile(td / "dec_pcm.i16", np.int16)
    return b28, dec_pcm


def test_700c_decoder_matches_reference_waveform(golden700):
    """Reference-encoded 28-bit newamp1 frames -> our decoder tracks the
    reference decoder's waveform (same bound family as 1300)."""
    from uhsdr_tpu.modems.codec2_700c import Codec2Decoder700C

    b28, ref_pcm = golden700
    dec = Codec2Decoder700C()
    ours = np.concatenate([dec.decode_frame(b28[i])
                           for i in range(len(b28))]).astype(np.float64)
    ref = ref_pcm[: len(ours)].astype(np.float64)
    err = ref - ours
    snr = 10 * np.log10(np.mean(ref ** 2) / (np.mean(err ** 2) + 1e-12))
    assert snr >= 25.0, f"700C decoder SNR vs reference {snr:.1f} dB"

    seg_snrs = []
    for s in range(0, len(ref) - 320, 320):
        r, e = ref[s:s + 320], err[s:s + 320]
        if np.mean(r ** 2) > 100.0:
            seg_snrs.append(10 * np.log10(np.mean(r ** 2)
                                          / (np.mean(e ** 2) + 1e-12)))
    assert np.median(seg_snrs) >= 30.0, np.median(seg_snrs)
    assert min(seg_snrs) >= 10.0, min(seg_snrs)


def test_700c_encoder_interop_with_reference_decoder(golden700,
                                                     tmp_path_factory):
    """Our 700C ENCODER's bit streams render the same through the
    compiled reference decoder as through ours, and agree with the
    reference encoder's voicing decisions on the same speech."""
    from uhsdr_tpu.modems.codec2_700c import (Codec2Decoder700C,
                                              Codec2Encoder700C)

    td = tmp_path_factory.mktemp("c2enc700")
    exe = str(td / "dec")
    subprocess.run(
        ["gcc", "-O2", f"-I{REF}", "-o", exe,
         os.path.join(REPO, "tools", "gen_codec2_dec.c")]
        + [os.path.join(REF, s) for s in SRCS] + ["-lm"],
        check=True, capture_output=True)

    nfr = 40
    sig = _make_speech(nfr).astype(np.float64)
    enc = Codec2Encoder700C()
    b28 = np.stack([enc.encode_frame(sig[i * 320:(i + 1) * 320])
                    for i in range(nfr)])
    packed = np.packbits(np.concatenate(
        [b28, np.zeros((nfr, 4), np.uint8)], axis=1), axis=1)
    packed.tofile(td / "in_bits.u8")
    subprocess.run([exe, "700C"], cwd=td, check=True, capture_output=True)
    ref_dec = np.fromfile(td / "ref_dec.i16", np.int16).astype(np.float64)

    dec = Codec2Decoder700C()
    ours = np.concatenate([dec.decode_frame(b)
                           for b in b28]).astype(np.float64)
    m = min(len(ref_dec), len(ours))
    snr = 10 * np.log10(np.mean(ref_dec[:m] ** 2)
                        / (np.mean((ref_dec[:m] - ours[:m]) ** 2) + 1e-9))
    assert snr >= 25.0, snr

    # voicing-bit (Wo index == 0) parity vs the reference encoder
    ref_bits, _ = golden700
    n = min(len(ref_bits), len(b28))
    import uhsdr_tpu.modems.codec2_1300 as c2
    agree = 0
    for i in range(n):
        ur = c2._BitUnpacker(ref_bits[i])
        uo = c2._BitUnpacker(b28[i])
        [ur.take(9, gray=False), ur.take(9, gray=False),
         ur.take(4, gray=False)]
        [uo.take(9, gray=False), uo.take(9, gray=False),
         uo.take(4, gray=False)]
        agree += (ur.take(6, gray=False) == 0) \
            == (uo.take(6, gray=False) == 0)
    assert agree >= 0.9 * n, (agree, n)
