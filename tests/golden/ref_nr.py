"""Scalar float64 ports of the reference's two NR recurrences — the
golden oracles for `nr/spectral.py` and `nr/blanker.py` (VERDICT
round-1 item 8: the highest-risk recurrences without math-level
validation).

* `spectral_nr_ref` — `spectral_noise_reduction_3` (`audio_nr.c:1841-2180`):
  MMSE spectral subtraction with speech-presence probability, 256-pt FFT,
  50% overlap, symmetric sqrt-Hann (`SQRT_von_Hann_256`, `audio_nr.c:76`),
  20-frame noise bootstrap, musical-noise dynamic averaging.
* `alt_noise_blanking_ref` — `alt_noise_blanking` (`audio_nr.c:2210-2536`):
  order-10 LPC + Levinson-Durbin, whitening + matched filtering, threshold
  detection with sequential PL-skip scan, forward/backward LPC repair over
  7-sample windows in a 154-sample working buffer (13-sample delay).

Deliberately unvectorized per-bin / per-sample loops so the code can be
line-checked against the C.
"""
from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# spectral_noise_reduction_3
# ---------------------------------------------------------------------------

FFT_L = 256
HOP = FFT_L // 2
NB = FFT_L // 2


def _sqrt_von_hann_256() -> np.ndarray:
    # the table at audio_nr.c:76 is sin(pi*i/255) to 9 digits
    return np.sin(np.pi * np.arange(FFT_L) / (FFT_L - 1))


def spectral_nr_ref(x: np.ndarray, vad_low: int, vad_high: int,
                    alpha: float = 0.94, power_threshold: float = 0.40,
                    width: int = 4, asnr_db: float = 30.0,
                    collect_hk: bool = False):
    """x: (T,) audio at the NR rate, T % 128 == 0.  Returns y (T,)
    (one-hop latency like the in-place firmware loop) and, when
    `collect_hk`, the per-frame post-smoothing Hk rows.

    Port of audio_nr.c:1841-2180 with `first_time` starting at 1 (fresh
    NR enable) and NR_FFT_LOOP_NO collapsed into the frame loop.
    """
    assert len(x) % HOP == 0
    n_frames = len(x) // HOP
    W = _sqrt_von_hann_256()

    psthr, pnsaf, psini, pspri = 0.99, 0.01, 0.5, 0.5
    ax, ap = 0.7405, 0.8691
    xih1 = 10.0 ** (asnr_db / 10.0)
    xih1r = 1.0 / (1.0 + xih1) - 1.0
    pfac = (1.0 / pspri - 1.0) * (1.0 + xih1)
    snr_prio_min = 0.001

    # first_time == 1 init (audio_nr.c:1922-1937)
    last_half = np.zeros(HOP)
    last_ifft = np.zeros(HOP)
    hk = np.ones(NB)
    hk_old = np.ones(NB)
    pslp = np.full(NB, 0.5)
    nest0 = np.zeros(NB)
    xt = np.zeros(NB)
    init_counter = 0
    first_time = 2

    y = np.empty_like(x, dtype=np.float64)
    hk_rows = []

    for k in range(n_frames):
        xk = np.asarray(x[k * HOP:(k + 1) * HOP], np.float64)
        frame = np.concatenate([last_half, xk])
        last_half = xk.copy()
        F = np.fft.rfft(frame * W)             # 129 bins; conj-symmetric
        X = np.abs(F[:NB]) ** 2

        if first_time == 2:
            # 20-frame bootstrap (audio_nr.c:1997-2012)
            nest0 = nest0 + 0.05 * X
            xt = psini * nest0
            init_counter += 1
            if init_counter > 19:
                first_time = 3
        elif first_time == 3:
            ph1y = 1.0 / (1.0 + pfac * np.exp(xih1r * X / xt))
            pslp = ap * pslp + (1.0 - ap) * ph1y
            ph1y = np.where(pslp > psthr, 1.0 - pnsaf,
                            np.minimum(ph1y, 1.0))
            xtr = (1.0 - ph1y) * X + ph1y * xt
            xt = ax * xt + (1.0 - ax) * xtr

            snr_post = np.maximum(np.minimum(X / xt, 1000.0), snr_prio_min)
            snr_prio = np.maximum(
                alpha * hk_old + (1.0 - alpha) *
                np.maximum(snr_post - 1.0, 0.0), 0.0)

            for b in range(vad_low, vad_high):
                v = snr_prio[b] * snr_post[b] / (1.0 + snr_prio[b])
                hk[b] = max(np.sqrt(0.7212 * v + v * v) / snr_post[b], 0.001)
                hk_old[b] = snr_post[b] * hk[b] * hk[b]

            # musical-noise dynamic averaging (audio_nr.c:2078-2140)
            pre = X[vad_low:vad_high].sum()
            post = (hk[vad_low:vad_high] ** 2 * X[vad_low:vad_high]).sum()
            ratio = post / pre
            if ratio > power_threshold:
                nn = 1
            else:
                nn = 1 + 2 * int(0.5 + width *
                                 (1.0 - ratio / power_threshold))
            nest = np.zeros(NB)
            for b in range(vad_low + nn // 2, vad_high - nn // 2):
                nest[b] = hk[b - nn // 2: b + nn // 2 + 1].sum() / nn
            # edge one-sided averages land in scratch never copied back
            for b in range(vad_low + nn // 2, vad_high - nn // 2):
                hk[b] = nest[b]

        if collect_hk:
            hk_rows.append(hk.copy())

        # FINAL SPECTRAL WEIGHTING, band bins + conjugates only
        Fw = F.copy()
        Fw[vad_low:vad_high] *= hk[vad_low:vad_high]
        out = np.fft.irfft(Fw, n=FFT_L) * W
        y[k * HOP:(k + 1) * HOP] = out[:HOP] + last_ifft
        last_ifft = out[HOP:].copy()

    if collect_hk:
        return y, np.array(hk_rows)
    return y


# ---------------------------------------------------------------------------
# alt_noise_blanking
# ---------------------------------------------------------------------------

NB_FRAME = 128
ORDER = 10
IMPULSE_LEN = 7
PL = (IMPULSE_LEN - 1) // 2
CONTEXT = 2 * ORDER + 2 * PL     # 26
DELAY = ORDER + PL               # 13


def _levinson_ref(R: np.ndarray, order: int) -> np.ndarray:
    """audio_nr.c:2393-2421 — returns the (order+1,) error filter."""
    R = R.copy()
    R[0] = R[0] * (1.0 + 1.0e-9)
    lpcs = np.zeros(order + 1)
    lpcs[0] = 1.0
    alfa = R[0]
    for m in range(1, order + 1):
        s = 0.0
        for u in range(1, m):
            s = s + lpcs[u] * R[m - u]
        k = -(R[m] + s) / alfa
        any_ = np.empty(order + 1)
        for v in range(1, m):
            any_[v] = lpcs[v] + k * lpcs[m - v]
        for w in range(1, m):
            lpcs[w] = any_[w]
        lpcs[m] = k
        alfa = alfa * (1.0 - k * k)
    return lpcs


def alt_noise_blanking_ref(x: np.ndarray, nb_setting: int = 8,
                           collect_positions: bool = False):
    """x: (T,) with T % 128 == 0.  Returns the repaired audio, delayed
    DELAY=13 samples like the firmware's working-buffer read-out.

    Port of audio_nr.c:2210-2536, one frame at a time with the
    154-float `working_buffer` carried across frames.
    """
    assert len(x) % NB_FRAME == 0
    wb = np.zeros(CONTEXT + NB_FRAME)
    y = np.empty_like(x, dtype=np.float64)
    positions_log = []

    for k in range(len(x) // NB_FRAME):
        frame = np.asarray(x[k * NB_FRAME:(k + 1) * NB_FRAME], np.float64)
        wb[CONTEXT:] = frame                           # audio_nr.c:2368

        seg = wb[DELAY: DELAY + NB_FRAME]
        R = np.empty(ORDER + 1)
        for i in range(ORDER + 1):                     # audio_nr.c:2383-2387
            R[i] = np.dot(seg[: NB_FRAME - i], seg[i: NB_FRAME])
        lpcs = _levinson_ref(R, ORDER)
        reverse_lpcs = lpcs[::-1].copy()

        # whitening with reversed coeffs, then matched filter (zero
        # initial FIR state both times, audio_nr.c:2423-2431)
        tmp = np.convolve(seg, reverse_lpcs)[:NB_FRAME]
        tmp = np.convolve(tmp, lpcs)[:NB_FRAME]

        sigma2 = np.var(tmp, ddof=1)                   # arm_var_f32: /(N-1)
        lpc_power = np.sum(lpcs[:ORDER] ** 2)          # arm_power_f32(.., order)
        thr = (16 - nb_setting) * 0.5 * np.sqrt(sigma2 * lpc_power)

        # sequential scan with PL skip (audio_nr.c:2446-2460)
        positions = []
        search_pos = ORDER + PL
        while search_pos < NB_FRAME and len(positions) < 5:
            if abs(tmp[search_pos]) > thr:
                positions.append(search_pos - ORDER)
                search_pos += PL
            search_pos += 1
        positions_log.append([p + ORDER for p in positions])

        # repair (audio_nr.c:2462-2523); prediction coeffs = -lpcs[1:]
        a_fwd = -reverse_lpcs[:ORDER]      # negated reverse coeffs
        a_bwd = -lpcs[1:ORDER + 1]
        wfw = np.empty(IMPULSE_LEN)
        wbw = np.empty(IMPULSE_LEN)
        for i in range(IMPULSE_LEN):
            wbw[i] = 1.0 * i / (IMPULSE_LEN - 1)
            wfw[IMPULSE_LEN - i - 1] = wbw[i]

        for p in positions:
            rfw = np.empty(IMPULSE_LEN + ORDER)
            rbw = np.empty(IMPULSE_LEN + ORDER)
            for kk in range(ORDER):
                rfw[kk] = wb[p + kk]
                rbw[IMPULSE_LEN + kk] = wb[ORDER + PL + p + PL + kk + 1]
            for i in range(IMPULSE_LEN):
                rfw[i + ORDER] = np.dot(a_fwd, rfw[i: i + ORDER])
                rbw[IMPULSE_LEN - i - 1] = np.dot(
                    a_bwd, rbw[IMPULSE_LEN - i: IMPULSE_LEN - i + ORDER])
            rep = wfw * rfw[ORDER:] + wbw * rbw[:IMPULSE_LEN]
            wb[ORDER + p: ORDER + p + IMPULSE_LEN] = rep

        y[k * NB_FRAME:(k + 1) * NB_FRAME] = wb[DELAY: DELAY + NB_FRAME]
        wb[:CONTEXT] = wb[NB_FRAME:]                   # audio_nr.c:2534

    if collect_positions:
        return y, positions_log
    return y
