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
