"""Wideband polyphase channelizer — analysis/synthesis DFT filterbanks.

The reference firmware is a ONE-channel radio: its front end mixes a
single 48 kHz I/Q stream to baseband (`FreqShift`, `freq_shift.c`) and
decimates it (`arm_fir_decimate_f32`, `audio_driver.c:2744-2745`); the
zoom FFT (`AudioDriver_SpectrumZoomProcessSamples`,
`audio_driver.c:1860-1909`) is the same mix+decimate idea aimed at one
display slice.  At fleet scale (the BASELINE north star is >=10k
simultaneous channels) a real deployment does not receive 10k separate
IQ streams — it receives ONE wideband capture and must split it.  The
critically-sampled DFT filterbank below is the N-channel generalization
of the reference's mix+decimate front end: one prototype lowpass,
M channels for the cost of ONE filter pass plus one FFT — against M
separate NCO+FIR chains, an O(M) saving.

Math (analysis).  With prototype ``h`` of length ``K*M`` (K taps per
branch) the m-th channel output is EXACTLY the reference-style chain
"mix by -2*pi*m/M, lowpass by h, decimate by M" evaluated at input
indices ``n*M``:

    y_m[n] = sum_l h[l] x[nM - l] e^{+j 2 pi m l / M}
           = M * IFFT_M{ u_p[n] }[m],
    u_p[n] = sum_k h[kM+p] x[(n-k)M - p]      (branch FIR, K taps)

so the whole bank is: reshape the stream into M-sample frames, run K
shifted multiply-adds (the branch FIRs, vectorized over all branches),
and one length-M inverse DFT per output sample.  No gathers anywhere —
the branch/commutator structure is reshapes and K static slices (TPU
gather costs ~1000x data volume; see PARITY.md).

Synthesis is the exact transpose: per-channel streams -> length-M
inverse DFT -> K-tap branch FIRs -> interleave to the wide rate:

    x[nM+p] = sum_k g[kM+p] t_p[n-k],   t_p[n] = M * IFFT_M{ y_c[n] }[p]

Both are streaming block ops in the framework's carry style
(`ops/fir.py`): state is the last K-1 frames, blocks are pure.

Channel m is centered at +m * fs_wide / M (m > M/2 wraps negative).
Conformance to the direct form is tested sample-exactly in
``tests/test_channelizer.py``.
"""
from __future__ import annotations

from typing import Literal, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from scipy import signal as sps

from . import fftutil


# ---------------------------------------------------------------------------
# Prototype design
# ---------------------------------------------------------------------------

def design_prototype(n_channels: int, taps_per_branch: int = 12,
                     cutoff_scale: float = 1.0, beta: float = 9.0) -> np.ndarray:
    """Kaiser-window lowpass prototype for an M-channel bank.

    cutoff = cutoff_scale / M in Nyquist units (1.0 = exactly the channel
    half-width: adjacent channels cross at their edges).  Returns
    (K*M,) float32, unit DC gain.
    """
    M, K = n_channels, taps_per_branch
    h = sps.firwin(K * M, cutoff_scale / M, window=("kaiser", beta))
    return (h / h.sum()).astype(np.float32)


# ---------------------------------------------------------------------------
# DFT across the branch axis
# ---------------------------------------------------------------------------

def _ifft_m(u: jnp.ndarray, M: int, impl: str) -> jnp.ndarray:
    """M * IFFT along the last axis (size M).  impl 'matmul' uses a dense
    IDFT matrix on the MXU (wins for small/medium M on TPU); 'fft' uses
    the rfft-composed complex FFT (axon has no complex-input FFT)."""
    if impl == "matmul":
        k = np.arange(M)
        W = np.exp(2j * np.pi * np.outer(k, k) / M).astype(np.complex64)
        ur, ui = jnp.real(u), jnp.imag(u)
        Wr = jnp.asarray(W.real)
        Wi = jnp.asarray(W.imag)
        return jax.lax.complex(ur @ Wr.T - ui @ Wi.T, ur @ Wi.T + ui @ Wr.T)
    return fftutil.icfft(u) * M


def _pick_impl(M: int, impl: Literal["auto", "fft", "matmul"]) -> str:
    if impl != "auto":
        return impl
    # dense IDFT = 4*M MACs/sample on the MXU vs an O(M log M) VPU-heavy
    # composed FFT; the matmul wins up to a few hundred channels
    return "matmul" if M <= 512 else "fft"


# ---------------------------------------------------------------------------
# Analysis bank
# ---------------------------------------------------------------------------

class AnalysisPfb:
    """Critically-sampled M-channel analysis filterbank (streaming).

    Input blocks (..., B) complex at the wide rate, B % M == 0; output
    (..., M, B//M) complex at fs_wide/M — channel-major, ready to be a
    fleet batch dim.  Output frame n of channel m equals the direct chain
    ``decimate_M(lowpass_h(x * exp(-j*2pi*m/M * i)))`` at input index
    n*M, with CMSIS phase convention (first output uses the first new
    sample with full history), matching `ops/fir.fir_decimate_block`.
    """

    def __init__(self, n_channels: int, prototype: np.ndarray | None = None,
                 taps_per_branch: int = 12,
                 dft_impl: Literal["auto", "fft", "matmul"] = "auto"):
        M = int(n_channels)
        if prototype is None:
            prototype = design_prototype(M, taps_per_branch)
        h = np.asarray(prototype, np.float32)
        assert h.size % M == 0, (h.size, M)
        K = h.size // M
        self.n_channels = M
        self.taps_per_branch = K
        self.prototype = h
        # hpoly[k, p] = h[k*M + p]
        self.hpoly = h.reshape(K, M)
        self.dft_impl = _pick_impl(M, dft_impl)

    def init_state(self, batch_shape: tuple[int, ...] = ()) -> jnp.ndarray:
        """Carry = last K*M wide-rate samples (complex64).

        (One more than the K*M-1 strictly needed: the extra leading
        sample keeps the carry an exact whole number of M-frames so the
        block reshape needs no dynamic alignment.)

        Created INSIDE jit on an f32 anchor: eager complex64 creation
        poisons all later device->host fetches on the axon relay
        (ARCHITECTURE.md axon dtype constraints)."""
        KM = self.taps_per_branch * self.n_channels
        shape = tuple(batch_shape) + (KM,)
        return jax.jit(lambda d: jnp.zeros(shape, jnp.complex64))(
            jnp.zeros((), jnp.float32))

    def __call__(self, state: jnp.ndarray, x: jnp.ndarray):
        """x: (..., B) complex64, B % M == 0.
        Returns (y (..., M, B//M) complex64, new_state)."""
        M, K = self.n_channels, self.taps_per_branch
        B = x.shape[-1]
        assert B % M == 0, (B, M)
        T = B // M
        xfull = jnp.concatenate([state.astype(x.dtype), x], axis=-1)
        lead = xfull.shape[:-1]
        # R[j, p'] = xfull[j*M + p'];  z[i] := xfull[K*M + i] (first new
        # sample at i=0), so R[j, p'] = z[(j-K)*M + p'].
        R = xfull.reshape(lead + (K + T, M))
        # branch streams V[j', p] = z[j'*M - p] for j' = -(K-1) .. T-1:
        #   p = 0     -> R[j' + K,     0]
        #   p >= 1    -> R[j' + K - 1, M - p]
        col0 = R[..., 1:, :1]                                # (..., K-1+T, 1)
        rest = jnp.flip(R[..., :-1, 1:], axis=-1)            # (..., K-1+T, M-1)
        V = jnp.concatenate([col0, rest], axis=-1)           # V[j, p], j = j'+K-1
        # branch FIRs: u[n, p] = sum_k hpoly[k, p] * V[n + (K-1) - k, p]
        hp = jnp.asarray(self.hpoly)
        u = jnp.zeros(lead + (T, M), x.dtype)
        for k in range(K):
            u = u + hp[k] * V[..., (K - 1 - k):(K - 1 - k + T), :]
        y = _ifft_m(u, M, self.dft_impl)                     # (..., T, M)
        y = jnp.moveaxis(y, -1, -2)                          # (..., M, T)
        new_state = xfull[..., -K * M:]
        return y, new_state


# ---------------------------------------------------------------------------
# Synthesis bank
# ---------------------------------------------------------------------------

class SynthesisPfb:
    """Critically-sampled M-channel synthesis filterbank (streaming).

    Input (..., M, T) complex channel streams at fs_wide/M; output
    (..., T*M) complex wideband.  Output equals the direct form
    ``sum_m upsample_M(y_m) conv g * exp(+j*2pi*m/M * i)`` with the
    group delay of g absorbed the CMSIS way (first output sample is the
    first wide-rate sample affected by the first new input frame).

    The prototype should be designed at the wide rate with gain M baked
    in (interpolator convention, `ops/design.interpolation_fir`); the
    default uses M * design_prototype(M).
    """

    def __init__(self, n_channels: int, prototype: np.ndarray | None = None,
                 taps_per_branch: int = 12,
                 dft_impl: Literal["auto", "fft", "matmul"] = "auto"):
        M = int(n_channels)
        if prototype is None:
            prototype = M * design_prototype(M, taps_per_branch)
        g = np.asarray(prototype, np.float32)
        assert g.size % M == 0, (g.size, M)
        self.n_channels = M
        self.taps_per_branch = g.size // M
        self.prototype = g
        self.gpoly = g.reshape(self.taps_per_branch, M)      # [k, p] = g[kM+p]
        self.dft_impl = _pick_impl(M, dft_impl)

    def init_state(self, batch_shape: tuple[int, ...] = ()) -> jnp.ndarray:
        """Carry = last K-1 branch frames t_p[n]: (..., K-1, M) complex64.
        Created inside jit (axon fetch-poisoning, see AnalysisPfb)."""
        K, M = self.taps_per_branch, self.n_channels
        shape = tuple(batch_shape) + (K - 1, M)
        return jax.jit(lambda d: jnp.zeros(shape, jnp.complex64))(
            jnp.zeros((), jnp.float32))

    def __call__(self, state: jnp.ndarray, y: jnp.ndarray):
        """y: (..., M, T) complex64. Returns (x (..., T*M), new_state)."""
        M, K = self.n_channels, self.taps_per_branch
        T = y.shape[-1]
        yt = jnp.moveaxis(y, -1, -2)                         # (..., T, M)
        t = _ifft_m(yt, M, self.dft_impl)                    # t[n, p]
        tfull = jnp.concatenate([state.astype(t.dtype), t], axis=-2)
        # x[nM + p] = sum_k g[kM+p] * t[n-k, p]
        gp = jnp.asarray(self.gpoly)
        xf = jnp.zeros(y.shape[:-2] + (T, M), t.dtype)
        for k in range(K):
            xf = xf + gp[k] * tfull[..., (K - 1 - k):(K - 1 - k + T), :]
        x = xf.reshape(y.shape[:-2] + (T * M,))
        new_state = tfull[..., -(K - 1):, :] if K > 1 else state
        return x, new_state


def channel_center_hz(m: int | np.ndarray, n_channels: int,
                      fs_wide: float) -> np.ndarray:
    """Center frequency of channel m (wrapped to (-fs/2, fs/2])."""
    f = np.asarray(m) * fs_wide / n_channels
    return np.where(f > fs_wide / 2, f - fs_wide, f)
