"""Reference-exact TX conformance (VERDICT r2 item 7): the shipped TX
chain (`chain.tx`, default front="ref") against the float64 scalar port
of `TxProcessor_Run` (`tests/golden/ref_tx.py`) — SSB/AM/FM voice paths
at default settings (compression level 2, SOPRANO voice lattice,
iq_tx_wide Hilbert pair, AM carrier 5100, FM DDS phase accumulator).
"""
from __future__ import annotations

import numpy as np
import pytest

from tests.golden import ref_tx as gold

FS = 48000.0
T_TOTAL = 48000 * 2
BLOCK = 4096
SKIP = 24000
INT16_FS = 32767.0


def make_voice(seed: int = 0) -> np.ndarray:
    """Speech-band test signal in the chain's unit domain."""
    rng = np.random.default_rng(seed)
    t = np.arange(T_TOTAL) / FS
    v = (0.35 * np.sin(2 * np.pi * 700 * t)
         + 0.2 * np.sin(2 * np.pi * 1500 * t)
         + 0.1 * np.sin(2 * np.pi * 2300 * t))
    v = v * (0.6 + 0.4 * np.sin(2 * np.pi * 2.1 * t))
    return (v + 0.002 * rng.standard_normal(T_TOTAL)).astype(np.float32)


def run_chain(mode: str, audio_u: np.ndarray) -> np.ndarray:
    from uhsdr_tpu.chain import tx as tx_mod

    cfg = tx_mod.TxConfig(mode=mode, translate_hz=6000.0, block_len=BLOCK)
    assert cfg.front == "ref"
    chain = tx_mod.TxChain(cfg)
    state = chain.init_state((1,))
    outs = []
    for s in range(0, len(audio_u), BLOCK):
        i, q, state = chain(state, audio_u[None, s:s + BLOCK])
        outs.append(np.asarray(i)[0] + 1j * np.asarray(q)[0])
    return np.concatenate(outs)


def snr_db(ref: np.ndarray, test: np.ndarray) -> float:
    r, t = ref[SKIP:], test[SKIP:]
    err = r - t
    return 10.0 * np.log10((np.mean(np.abs(r) ** 2))
                           / (np.mean(np.abs(err) ** 2) + 1e-30))


CASES = [("usb", 50.0), ("lsb", 50.0), ("am", 50.0), ("fm", 50.0)]


@pytest.mark.parametrize("mode,bound", CASES, ids=[m for m, _ in CASES])
def test_tx_chain_matches_reference_math(mode, bound):
    audio_u = make_voice()
    # oracle runs in the firmware's int16-count domain; the chain lifts
    # unit audio by the same factor internally (chain.tx in_scale) and
    # normalizes the IQ back, so chain_out * 32767 == oracle output.
    # SSB: the oracle keeps the firmware's literal buffer convention
    # (USB below the translate in i+jq space — the QSE wiring flips it
    # on air); the chain uses the framework's capture convention, one
    # conjugation apart (see mod.modulators.ssb_params_ref)
    ref_iq = gold.ref_tx_chain(audio_u.astype(np.float64) * INT16_FS, mode)
    out = run_chain(mode, audio_u) * INT16_FS
    s = snr_db(ref_iq, out)
    assert s >= bound, f"TX {mode}: SNR {s:.1f} dB < {bound}"


def test_tx_block_invariance():
    from uhsdr_tpu.chain import tx as tx_mod

    audio_u = make_voice()

    def run(blk):
        cfg = tx_mod.TxConfig(mode="usb", block_len=blk)
        chain = tx_mod.TxChain(cfg)
        state = chain.init_state((1,))
        outs = []
        for s in range(0, len(audio_u), blk):
            i, q, state = chain(state, audio_u[None, s:s + blk])
            outs.append(np.asarray(i)[0] + 1j * np.asarray(q)[0])
        return np.concatenate(outs)

    a, b = run(4096), run(2048)
    assert snr_db(a, b) > 80.0


# ---------------------------------------------------------------------------
# Digital-mode TX rows (VERDICT r3 item 7): CW / RTTY / PSK against the
# scalar ports of TxProcessor_Cw/Rtty/Psk + their generators
# ---------------------------------------------------------------------------

def _run_digi_chain(tone_48k: np.ndarray) -> np.ndarray:
    """Our chain's digital path: generator tone -> USB voice chain with
    bandpass ON, compressor OFF, translate 0 (TxProcessor_Rtty/Psk call
    TxProcessor_SSB with 0 shift, tx_processor.c:818/841)."""
    from uhsdr_tpu.chain import tx as tx_mod

    cfg = tx_mod.TxConfig(mode="usb", translate_hz=0.0, block_len=BLOCK,
                          compressor=False)
    chain = tx_mod.TxChain(cfg)
    state = chain.init_state((1,))
    outs = []
    audio_u = (tone_48k / INT16_FS).astype(np.float32)
    n = (len(audio_u) // BLOCK) * BLOCK
    for s in range(0, n, BLOCK):
        i, q, state = chain(state, audio_u[None, s:s + BLOCK])
        outs.append(np.asarray(i)[0] + 1j * np.asarray(q)[0])
    return np.concatenate(outs) * INT16_FS


def test_rtty_tx_matches_reference():
    """Tone generator bit-exact vs the Rtty_Modulator_GenSample port;
    full TX chain >= 50 dB vs the TxProcessor_Rtty oracle."""
    from uhsdr_tpu.modems import rtty_text

    n = 48000 * 2
    text = "CQ CQ DE UHSDR"
    oracle_tone = gold.RttyTxOracle(text).gen(n)
    our_tone = rtty_text.gen_tx_tone_ref(text, n)
    np.testing.assert_array_equal(our_tone, oracle_tone)

    ref_iq = gold.rtty_tx_oracle(text, n)
    out = _run_digi_chain(our_tone)
    s = snr_db(ref_iq[: len(out)], out)
    assert s >= 50.0, f"TX rtty: SNR {s:.1f} dB"


def test_psk_tx_matches_reference():
    """Tone generator bit-exact vs the Psk_Modulator_GenSample port
    (preamble, varicode, postamble, envelope DDS); full TX chain >=
    50 dB vs the TxProcessor_Psk oracle."""
    from uhsdr_tpu.modems import psk_text

    n = 48000 * 3
    text = "cq de uhsdr"
    oracle_tone = gold.PskTxOracle(text).gen(n)
    our_tone = psk_text.gen_tx_tone_ref(text, n)
    np.testing.assert_array_equal(our_tone, oracle_tone)

    ref_iq = gold.psk_tx_oracle(text, n)
    out = _run_digi_chain(our_tone)
    s = snr_db(ref_iq[: len(out)], out)
    assert s >= 50.0, f"TX psk: SNR {s:.1f} dB"


def test_cw_tx_envelope_matches_reference():
    """Keying envelope BIT-EXACT vs the CwGen_ProcessIambic text-entry
    oracle (element/pause/char timing in 1500 Hz blocks + sm_table edge
    shaping), for several texts and speeds; and the chain's keyed IQ
    magnitude reproduces that envelope."""
    from uhsdr_tpu.chain import tx as tx_mod
    from uhsdr_tpu.modems import cw_text

    nb = 1500 * 4
    for text, wpm in [("CQ TEST", 20), ("K", 35)]:
        o = gold.CwTextTxOracle(text, wpm=wpm)
        _, gain = o.process_blocks(nb)
        env = cw_text.text_to_keying_ref(text, wpm, n_blocks=nb)
        np.testing.assert_array_equal(env, gain)

    # the chain's CW mode keys a unit carrier with this envelope: |IQ|
    # must reproduce it (the carrier is the framework's exact NCO; the
    # firmware's table DDS differs only by its -50 dBc phase-truncation
    # spurs, documented in ops/softdds.py)
    env = cw_text.text_to_keying_ref("CQ", 20, n_blocks=1500)
    cfg = tx_mod.TxConfig(mode="cw", translate_hz=6000.0, block_len=BLOCK)
    chain = tx_mod.TxChain(cfg)
    state = chain.init_state((1,))
    outs = []
    n = (len(env) // BLOCK) * BLOCK
    for s in range(0, n, BLOCK):
        i, q, state = chain(state, env[None, s:s + BLOCK]
                            .astype(np.float32))
        outs.append(np.asarray(i)[0] + 1j * np.asarray(q)[0])
    mag = np.abs(np.concatenate(outs))
    err = mag - env[:n]
    pk = np.max(np.abs(err))
    assert pk < 2e-3, pk
