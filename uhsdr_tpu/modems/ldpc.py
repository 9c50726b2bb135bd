"""LDPC (224,112) rate-1/2 code with min-sum belief-propagation decoding.

Role in the reference: `drivers/freedv/mpdecode_core.c` decodes the
HRA_112_112 LDPC code protecting FreeDV 700D frames.  Independent
implementation: a seeded column-weight-3 parity-check matrix built
4-cycle-free with balanced check degrees (PEG-lite — short random codes
without girth conditioning decode terribly under BP), decoded with
normalized min-sum BP on log-likelihood ratios.  Encoding solves
H x = 0 via a precomputed information-set reduction, so the SPARSE H is
used untouched for decoding.  Same (n, k) and rate as the reference's
code; not the same parity matrix (no interoperability, consistent with
the rest of the FreeDV-class stack).
"""
from __future__ import annotations

import numpy as np

N = 224
K = 112
M = N - K
COL_WEIGHT = 3
_SEED = 0x700D


def _gf2_reduce(H: np.ndarray):
    """Row-reduce a copy of H with column pivoting.  Returns
    (piv_cols (M,), data_cols (K,), Enc (M, K)) with parity values
    x[piv_cols] = Enc @ x[data_cols] mod 2, or None if rank < M."""
    R = H.astype(np.uint8).copy()
    piv_cols = []
    r = 0
    for c in range(N):
        if r == M:
            break
        rows = np.nonzero(R[r:, c])[0]
        if len(rows) == 0:
            continue
        pr = rows[0] + r
        R[[r, pr]] = R[[pr, r]]
        for rr in range(M):
            if rr != r and R[rr, c]:
                R[rr] ^= R[r]
        piv_cols.append(c)
        r += 1
    if r < M:
        return None
    piv_cols = np.array(piv_cols)
    data_cols = np.array(sorted(set(range(N)) - set(piv_cols.tolist())))
    # with pivot columns reduced to identity: x[piv[i]] = sum of
    # R[i, data_cols] * x[data_cols]
    Enc = R[:, data_cols].copy()
    return piv_cols, data_cols, Enc


def _make_code(seed: int = _SEED):
    rng = np.random.default_rng(seed)
    for _attempt in range(200):
        H = np.zeros((M, N), np.uint8)
        row_deg = np.zeros(M, np.int32)
        used_pairs: set[tuple[int, int]] = set()
        ok = True
        for c in rng.permutation(N):
            chosen: list[int] = []
            order = np.argsort(row_deg + rng.random(M) * 0.5)
            for r in order:
                r = int(r)
                if any(((min(r, o), max(r, o)) in used_pairs)
                       for o in chosen):
                    continue
                chosen.append(r)
                if len(chosen) == COL_WEIGHT:
                    break
            if len(chosen) < COL_WEIGHT:
                ok = False
                break
            for i in range(len(chosen)):
                for j in range(i + 1, len(chosen)):
                    a, b = chosen[i], chosen[j]
                    used_pairs.add((min(a, b), max(a, b)))
            H[chosen, c] = 1
            row_deg[chosen] += 1
        if not ok or (H.sum(axis=1) < 2).any():
            continue
        red = _gf2_reduce(H)
        if red is None:
            continue
        piv_cols, data_cols, Enc = red
        return H, piv_cols, data_cols, Enc
    raise RuntimeError("LDPC construction failed")


_H, _PIV_COLS, _DATA_COLS, _ENC = _make_code()
_CHECK_BITS = [np.nonzero(_H[m])[0] for m in range(M)]


def encode(data_bits: np.ndarray) -> np.ndarray:
    """data_bits: (..., K) 0/1 -> (..., N) codeword (data bits live at
    _DATA_COLS, parity at _PIV_COLS)."""
    d = np.asarray(data_bits, np.uint8)
    x = np.zeros(d.shape[:-1] + (N,), np.uint8)
    x[..., _DATA_COLS] = d
    x[..., _PIV_COLS] = d @ _ENC.T % 2
    return x


def extract_data(codeword_bits: np.ndarray) -> np.ndarray:
    return np.asarray(codeword_bits)[..., _DATA_COLS]


def decode(llr: np.ndarray, max_iter: int = 50,
           alpha: float = 0.8) -> tuple[np.ndarray, bool]:
    """Normalized min-sum BP.  llr: (N,) log-likelihood ratios (positive
    = bit 0 more likely).  Returns (data_bits (K,), converged)."""
    llr = np.asarray(llr, np.float64)
    msg = [np.zeros(len(_CHECK_BITS[m])) for m in range(M)]
    total = llr.copy()
    for _ in range(max_iter):
        total = llr.copy()
        for m in range(M):
            total[_CHECK_BITS[m]] += msg[m]
        hard = (total < 0).astype(np.uint8)
        if not (_H @ hard % 2).any():
            return hard[_DATA_COLS], True
        for m in range(M):
            bits = _CHECK_BITS[m]
            ext = total[bits] - msg[m]          # bit->check messages
            sgn = np.where(ext >= 0, 1.0, -1.0)
            mag = np.abs(ext)
            prod_sgn = np.prod(sgn)
            order = np.argsort(mag)
            min1 = mag[order[0]]
            min2 = mag[order[1]] if len(mag) > 1 else min1
            newmsg = np.empty_like(ext)
            for j in range(len(bits)):
                other_min = min2 if j == order[0] else min1
                newmsg[j] = alpha * prod_sgn * sgn[j] * other_min
            msg[m] = newmsg
    hard = (total < 0).astype(np.uint8)
    return hard[_DATA_COLS], False
