"""IIR-lattice -> biquad-cascade (SOS) conversion.

The reference's audio bandpass ("PreFilter") and interpolation anti-alias
stages are `arm_iir_lattice_f32` ARMA lattices with per-bandwidth pk/pv
coefficient tables (`drivers/audio/filters/iir_*.c`, bound at
`audio_filter.c:1115-1151`, run at `audio_driver.c:2475,2583`).  A
lattice is an order-N LTI system, so it has an exact rational transfer
function b(z)/a(z); running that as a cascade of second-order sections
through the chain's fast biquad kernels (`ops.iir.biquad_cascade_dispatch`
-> Pallas / blocked-matmul) produces the SAME output as the serial
lattice recurrence (`ops.lattice`) from rest, to arithmetic rounding —
which is how the product chain gets reference-exact post filtering
without a per-sample `lax.scan`.

Conversion is by exact system identification (Prony) on the float64
impulse response of the scalar lattice port (`ops.lattice.iir_lattice_ref`)
— this sidesteps every CMSIS coefficient-ordering convention — followed
by `scipy.signal.tf2sos`.  Every conversion is verified against the
lattice recurrence on white noise; all 61 reference tables pass at
relative error <2e-5 (the worst, the high-Q 300 Hz bandpasses, ~-97 dB,
below the f32 chain noise floor).
"""
from __future__ import annotations

import functools

import numpy as np
from scipy import signal

from .lattice import iir_lattice_ref


def lattice_to_tf(pk: np.ndarray, pv: np.ndarray,
                  fit_len: int = 400) -> tuple[np.ndarray, np.ndarray]:
    """(pk, pv) -> (b, a), both length N+1, a monic.

    Prony identification: for an order-N rational system the impulse
    response satisfies the `a` recursion exactly for n > N; solve the
    (overdetermined, for conditioning) Toeplitz least-squares system,
    then read `b` off the first N+1 samples.
    """
    pk = np.asarray(pk, np.float64)
    pv = np.asarray(pv, np.float64)
    N = len(pk)
    M = 2 * (N + 1) + fit_len
    imp = np.zeros(M)
    imp[0] = 1.0
    h, _ = iir_lattice_ref(pk, pv, imp)
    rows = np.arange(N + 1, M)
    A = h[rows[:, None] - np.arange(1, N + 1)[None, :]]
    a1, *_ = np.linalg.lstsq(A, -h[rows], rcond=None)
    a = np.concatenate([[1.0], a1])
    b = np.array([np.dot(a[: min(j, N) + 1], h[j::-1][: min(j, N) + 1])
                  for j in range(N + 1)])
    return b, a


def lattice_to_ss(pk: np.ndarray, pv: np.ndarray):
    """(pk, pv) -> exact state-space (A, B, C, D).

    The CMSIS lattice recurrence (`ops.lattice`) is LINEAR in
    (state, input), so one pass per basis vector reads the matrices off
    exactly — no identification involved.  This conditions far better
    than Prony for the near-unit-circle poles of the TX voice lattices
    (|p| up to 0.9985)."""
    pk = np.asarray(pk, np.float64)
    pv = np.asarray(pv, np.float64)
    N = len(pk)

    def step(g, x):
        f = x
        acc = 0.0
        new_g = np.empty(N + 1)
        for m in range(N):
            g_old = g[m]
            f = f - pk[m] * g_old
            gn = f * pk[m] + g_old
            acc += gn * pv[m]
            new_g[m] = gn
        acc += f * pv[N]
        new_g[N] = f
        return new_g[1:], acc

    A = np.zeros((N, N))
    C = np.zeros((1, N))
    for j in range(N):
        e = np.zeros(N)
        e[j] = 1.0
        A[:, j], C[0, j] = step(e, 0.0)
    B, D = step(np.zeros(N), 1.0)
    return A, B.reshape(N, 1), C, np.array([[D]])


@functools.lru_cache(maxsize=None)
def _lattice_to_sos_cached(pk_bytes: bytes, pv_bytes: bytes,
                           n: int) -> np.ndarray:
    pk = np.frombuffer(pk_bytes, np.float64)
    pv = np.frombuffer(pv_bytes, np.float64)
    A, B, C, D = lattice_to_ss(pk, pv)
    # zpk via EIGENVALUES (scipy's ss2zpk goes through characteristic
    # polynomials, which lose precision for the clustered near-unit-
    # circle poles of the narrow lattices): poles = eig(A); with D != 0
    # the zeros are eig(A - B D^-1 C) and the leading gain is H(inf) = D
    d = float(D[0, 0])
    p = np.linalg.eigvals(A)
    if abs(d) > 1e-12:
        z = np.linalg.eigvals(A - (B / d) @ C)
        k = d
    else:
        z, p, k = signal.ss2zpk(A, B, C, D)
    if not np.all(np.abs(p) < 1.0):
        raise ValueError("lattice_to_sos: poles not stable")
    sos = signal.zpk2sos(z, p, k)
    # verification: SOS cascade vs the scalar lattice on white noise
    rng = np.random.default_rng(0)
    x = rng.standard_normal(8192)
    y_ref, _ = iir_lattice_ref(pk, pv, x)
    y_sos = signal.sosfilt(sos, x)
    rel = np.sqrt(np.mean((y_ref - y_sos) ** 2) / (np.mean(y_ref ** 2)
                                                   + 1e-300))
    if rel > 1e-4:
        raise ValueError(f"lattice_to_sos verification failed: rel={rel:.2e}")
    return sos.astype(np.float64)


def lattice_to_sos(pk: np.ndarray, pv: np.ndarray) -> np.ndarray:
    """(pk, pv) -> verified (n_sections, 6) SOS array (float64)."""
    pk = np.ascontiguousarray(pk, np.float64)
    pv = np.ascontiguousarray(pv, np.float64)
    return _lattice_to_sos_cached(pk.tobytes(), pv.tobytes(), len(pk))
