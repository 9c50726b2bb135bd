"""FreeDV 1600 bit-interoperability with the reference firmware
(VERDICT round-1 item 2).

The decisive evidence: `uhsdr_tpu/data/freedv_ref.npz::test_iq` is the
firmware's own recorded FreeDV-1600 modem IQ (4 s @8 kHz,
`drivers/audio/freedv_test_data.c`, played into the firmware's RX in
DEBUG_FREEDV mode, `freedv_uhsdr.c:415-430`).  Our FDMDV demodulator +
Golay(23,12) + the reference's 64-bit frame layout must recover frames
whose Golay codewords CHECK — 12 data + 11 parity bits scattered across
each 40 ms frame can only be consistent if every layer (carrier
frequencies, DQPSK mapping, matched filter, symbol timing, frame
packing, FEC polynomial and bit order) matches the reference's.
"""
from __future__ import annotations

import numpy as np

from uhsdr_tpu import data
from uhsdr_tpu.modems import fdmdv, freedv, golay


def _demod_bits(iq: np.ndarray, chunk: int = 5 * fdmdv.M):
    dem = fdmdv.FdmdvDemodulator()
    bits, sync = [], []
    for s in range(0, len(iq) - chunk + 1, chunk):
        b, sy = dem.demod_symbols(iq[s:s + chunk])
        bits.append(b)
        sync.append(sy)
    return np.concatenate(bits), np.concatenate(sync)


def test_reference_vectors_demodulate_with_valid_golay():
    """>=90% of the 40 ms frames in the firmware's recorded vector must
    carry zero-syndrome Golay codewords under the reference frame
    layout."""
    iq = data.freedv("test_iq")
    bits, _ = _demod_bits(iq)
    assert len(bits) >= 180, len(bits)

    best = (-1, None)
    for ph in (0, 1):
        nfr = (len(bits) - ph) // 2
        clean = 0
        for fr in range(nfr):
            b64 = np.concatenate([bits[ph + 2 * fr], bits[ph + 2 * fr + 1]])
            _, ncorr = golay.decode_bits(freedv.frame_codeword(b64)[None, :])
            clean += int(ncorr[0] == 0)
        if clean > best[0]:
            best = (clean, ph, nfr)
    clean, ph, nfr = best
    assert clean / nfr >= 0.90, f"{clean}/{nfr} clean frames (phase {ph})"


def test_reference_vectors_wrong_layout_fails():
    """Negative control: the same demodulated bits with a WRONG Golay
    data placement (contiguous [0:12] instead of [0:8]+[11:15]) must NOT
    check — i.e. the test above actually pins the layout."""
    iq = data.freedv("test_iq")[: 32000 // 2]
    bits, _ = _demod_bits(iq)
    worst = 0
    for ph in (0, 1):
        nfr = (len(bits) - ph) // 2
        clean = 0
        for fr in range(nfr):
            b64 = np.concatenate([bits[ph + 2 * fr], bits[ph + 2 * fr + 1]])
            cw = np.concatenate([b64[0:12], b64[52:63]])
            _, ncorr = golay.decode_bits(cw[None, :])
            clean += int(ncorr[0] == 0)
        worst = max(worst, clean / max(nfr, 1))
    assert worst < 0.5, worst


def test_tx_rx_loopback_bit_exact():
    """Our bit-compatible TX through our RX: zero bit errors after the
    acquisition preamble."""
    rng = np.random.default_rng(5)
    nsym = 80
    bits = rng.integers(0, 2, (nsym, fdmdv.BITS_PER_SYMBOL))
    sig = fdmdv.FdmdvModulator().modulate_frame(bits)
    rx_bits, _ = _demod_bits(sig.astype(np.complex128))
    assert len(rx_bits) >= nsym - 15

    # find the (delay) alignment, then demand zero steady-state errors
    best = (1e9, 0)
    for off in range(-8, 9):
        errs = 0
        cnt = 0
        for i in range(10, len(rx_bits)):
            j = i + off
            if 0 <= j < nsym:
                errs += int((rx_bits[i] != bits[j]).sum())
                cnt += 1
        if cnt > 30 and errs < best[0]:
            best = (errs, off)
    assert best[0] == 0, best


def test_tx_rx_loopback_freq_offset_and_noise():
    """Robustness: +-60 Hz offset and moderate AWGN still decode with
    low BER (the acquisition/tracking path)."""
    rng = np.random.default_rng(6)
    nsym = 80
    bits = rng.integers(0, 2, (nsym, fdmdv.BITS_PER_SYMBOL))
    sig = fdmdv.FdmdvModulator().modulate_frame(bits).astype(np.complex128)
    n = np.arange(len(sig))
    for foff in (-60.0, 45.0):
        ch = sig * np.exp(2j * np.pi * foff * n / fdmdv.FS)
        ch = ch + 0.05 * np.abs(sig).std() * (
            rng.standard_normal(len(sig))
            + 1j * rng.standard_normal(len(sig)))
        rx_bits, _ = _demod_bits(ch)
        best = 1e9
        for off in range(-8, 9):
            errs = cnt = 0
            for i in range(12, len(rx_bits)):
                j = i + off
                if 0 <= j < nsym:
                    errs += int((rx_bits[i] != bits[j]).sum())
                    cnt += 1
            if cnt > 30:
                best = min(best, errs / (cnt * fdmdv.BITS_PER_SYMBOL))
        assert best < 0.02, (foff, best)


def test_full_stack_voice_frame_roundtrip():
    """FreeDv1600 end-to-end: speech -> vocoder+Golay+FDMDV -> channel ->
    demod+FEC+synth -> speech; frames decode with zero parity errors."""
    fs = 8000.0
    t = np.arange(8000 * 2) / fs
    speech = (3000 * np.sin(2 * np.pi * 210 * t)
              * (0.6 + 0.4 * np.sin(2 * np.pi * 3 * t))).astype(np.float32)
    tx = freedv.FreeDv1600()
    sig = tx.mod(speech)
    assert sig.size > 0
    rx = freedv.FreeDv1600()
    out = rx.demod(sig.astype(np.complex128))
    assert rx.frames_decoded >= 30, rx.frames_decoded
    assert rx.parity_errors == 0, rx.parity_errors
    assert out.size > 0 and np.isfinite(out).all()


def test_ofdm_700d_reference_modulator_interop():
    """700D OFDM waveform interop: `uhsdr_tpu/data/ofdm_ref.npz` holds
    30 frames of payload bits modulated by the REFERENCE's own ofdm_mod
    (drivers/freedv/ofdm.c compiled from /root/reference by
    tools/build_ofdm_ref.py).  Our modulator must match the waveform at
    f32 precision and our demodulator must recover the bits with zero
    errors."""
    from uhsdr_tpu.modems import ofdm

    d = data.freedv_ofdm()
    bits_ref, tx = d["bits"], d["tx"]

    mod = ofdm.OfdmModulator()
    ours = np.concatenate([mod.modulate_frame(b) for b in bits_ref])
    assert np.abs(ours - tx).max() < 1e-5       # sample-exact (f32)

    dem = ofdm.OfdmDemodulator()
    bits, snr = dem.demod(tx)
    assert len(bits) >= 28, len(bits)
    ber = np.mean(bits != (bits_ref[:len(bits)] & 1))
    assert ber == 0.0, ber
    assert snr.mean() > 40, snr.mean()


def test_ldpc_hra112_reference_code_interop():
    """The LDPC code IS the reference's HRA_112_112: the accumulator
    encoder satisfies the imported H, and min-sum BP decodes the
    reference's own built-in test vector (HRA_112_112_input) to its
    expected output (HRA_112_112_detected_data) exactly."""
    from uhsdr_tpu.modems import ldpc

    d = data.ldpc()
    # decoder vector: whole-codeword agreement
    bits, ok = ldpc.decode(np.asarray(d["input"]))
    assert ok
    np.testing.assert_array_equal(bits, d["detected"][:ldpc.K])

    # encoder: random payloads produce zero-syndrome codewords under the
    # imported H, and survive a 4 dB-ish noisy channel
    rng = np.random.default_rng(3)
    for _ in range(5):
        payload = rng.integers(0, 2, ldpc.K)
        cw = ldpc.encode(payload)
        assert not (ldpc._H @ cw % 2).any()
        llr = (1.0 - 2.0 * cw) * 2.0 + rng.standard_normal(ldpc.N) * 1.2
        dec, ok = ldpc.decode(llr)
        assert ok
        np.testing.assert_array_equal(dec, payload)
