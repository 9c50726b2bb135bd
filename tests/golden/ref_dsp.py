"""Pure-NumPy scalar ports of the reference firmware's per-sample DSP math.

This plays the role the GNURadio model plays for the reference (SURVEY §4):
an independent, legible implementation of the same equations used as the
conformance oracle for the TPU pipeline.  Each function documents the
reference source location it models.  Scalar loops, no vectorization —
clarity over speed.
"""
from __future__ import annotations

import numpy as np

# --- SAM PLL (audio_driver.c:2022-2166) ------------------------------------

SAM_C0 = [-0.328201924180698, -0.744171491539427, -0.923022915444215,
          -0.978490468768238, -0.994128272402075, -0.998458978159551,
          -0.999790306259206]
SAM_C1 = [-0.0991227952747244, -0.565619728761389, -0.857467122550052,
          -0.959123933111275, -0.988739372718090, -0.996959189310611,
          -0.999282492800792]


def sam_demod(iq: np.ndarray, fs: float, zeta: float = 0.6,
              omegaN: float = 200.0, pll_fmax: float = 500.0,
              sideband: str = "usb", fade_leveler: bool = True):
    """Scalar SAM demod; returns (audio, final_omega2)."""
    g1 = 1.0 - np.exp(-2.0 * omegaN * zeta / fs)
    g2 = -g1 + 2.0 * (1 - np.exp(-omegaN * zeta / fs)
                      * np.cos(omegaN / fs * np.sqrt(1.0 - zeta * zeta)))
    omega_min = -2.0 * np.pi * pll_fmax / fs
    omega_max = 2.0 * np.pi * pll_fmax / fs
    mtauR = np.exp(-1 / (fs * 0.02))
    onem_mtauR = 1.0 - mtauR
    mtauI = np.exp(-1 / (fs * 1.4))
    onem_mtauI = 1.0 - mtauI

    OUT_IDX = 3 * 7
    a = np.zeros(OUT_IDX + 3)
    b = np.zeros(OUT_IDX + 3)
    c = np.zeros(OUT_IDX + 3)
    d = np.zeros(OUT_IDX + 3)
    dsI = dsQ = 0.0
    phs = fil_out = omega2 = 0.0
    dc = dc_insert = 0.0
    out = np.zeros(len(iq))
    for n, z in enumerate(iq):
        i_s, q_s = z.real, z.imag
        Sin, Cos = np.sin(phs), np.cos(phs)
        ai, bi = Cos * i_s, Sin * i_s
        aq, bq = Cos * q_s, Sin * q_s
        corr0, corr1 = ai + bq, -bi + aq

        if sideband != "both":
            a[0], b[0], c[0], d[0] = dsI, bi, dsQ, aq
            dsI, dsQ = ai, bq
            for j in range(7):
                k = 3 * j
                a[k + 3] = SAM_C0[j] * (a[k] - a[k + 5]) + a[k + 2]
                b[k + 3] = SAM_C1[j] * (b[k] - b[k + 5]) + b[k + 2]
                c[k + 3] = SAM_C0[j] * (c[k] - c[k + 5]) + c[k + 2]
                d[k + 3] = SAM_C1[j] * (d[k] - d[k + 5]) + d[k + 2]
            ai_ps, bi_ps = a[OUT_IDX], b[OUT_IDX]
            bq_ps, aq_ps = c[OUT_IDX], d[OUT_IDX]
            for arr in (a, b, c, d):
                arr[1:] = arr[:-1]
            if sideband == "usb":
                audio = (ai_ps - bi_ps) + (aq_ps + bq_ps)
            else:
                audio = (ai_ps + bi_ps) - (aq_ps - bq_ps)
        else:
            audio = corr0

        if fade_leveler:
            dc = mtauR * dc + onem_mtauR * audio
            dc_insert = mtauI * dc_insert + onem_mtauI * corr0
            audio = audio + dc_insert - dc
        out[n] = audio

        phzerror = np.arctan2(corr1, corr0)
        del_out = fil_out
        omega2 = np.clip(omega2 + g2 * phzerror, omega_min, omega_max)
        fil_out = g1 * phzerror + omega2
        phs = np.mod(phs + del_out, 2 * np.pi)
    return out, omega2


# --- WDSP AGC (audio_agc.c:349-595) ----------------------------------------

def wdsp_agc(x: np.ndarray, fs: float, mode: str = "med",
             thresh_db: float = 60.0, slope_db: float = 6.0,
             hang_enable: bool = False, hang_thresh_db: float = -30.0,
             remove_dc: bool = False) -> np.ndarray:
    presets = {"very_long": (3.0, 4.0, 0.05), "long": (2.0, 2.0, 0.005),
               "slow": (1.0, 0.5, 0.005), "med": (0.25, 0.25, 0.005),
               "fast": (0.1, 0.05, 0.005)}
    hangtime, tau_decay, tau_fast_decay = presets[mode]
    tau_attack, n_tau = 0.001, 4
    max_input = out_targ = 4096.0
    tau_fast_backaverage, tau_hang_backmult = 0.25, 0.5
    tau_hang_decay = 0.1
    pop_ratio = 5.0
    var_gain = 10.0 ** (slope_db / 20.0 / 10.0)
    max_gain = 10.0 ** (thresh_db / 20.0)

    absize = int(np.ceil(fs * n_tau * tau_attack))
    attack_mult = 1 - np.exp(-1 / (fs * tau_attack))
    decay_mult = 1 - np.exp(-1 / (fs * tau_decay))
    fast_decay_mult = 1 - np.exp(-1 / (fs * tau_fast_decay))
    fast_backmult = 1 - np.exp(-1 / (fs * tau_fast_backaverage))
    hang_backmult = 1 - np.exp(-1 / (fs * tau_hang_backmult))
    hang_decay_mult = 1 - np.exp(-1 / (fs * tau_hang_decay))
    out_target = out_targ * (1 - np.exp(-n_tau)) * 0.9999
    min_volts = out_target / (var_gain * max_gain)
    tmpA = np.log10(out_target / (max_input * var_gain * max_gain)) or 1e-16
    slope_constant = (out_target * (1 - 1 / var_gain)) / tmpA
    convert = 10.0 ** (hang_thresh_db / 20.0)
    tmpB = max((convert - min_volts) / (max_input - min_volts), 1e-8)
    hang_thresh = 1.0 + 0.125 * np.log10(tmpB)
    tmpC = 10.0 ** ((hang_thresh - 1.0) / 0.125)
    hang_level = (max_input * tmpC +
                  (out_target / (var_gain * max_gain)) * (1 - tmpC)) * 0.637
    hang_time_samples = int(hangtime * fs)

    RB = 4 * absize  # generous ring (reference AGC_WDSP_RB_SIZE=192 @12k)
    # (nch, T) input = the reference's use_stereo path
    # (AudioAgc_RunAgcWdsp audio_agc.c:349-595): ONE detector fed by
    # max(|L|, |R|), the same gain applied to both channels
    x2 = np.atleast_2d(np.asarray(x, np.float64))
    nch, T = x2.shape
    ring = np.zeros((nch, RB))
    abs_ring = np.zeros(RB)
    out_index = -1
    in_index = (absize + out_index) % RB
    ring_max = volts = save_volts = 0.0
    fast_ba = hang_ba = 0.0
    hang_counter = 0
    decay_type = 0
    state = 0
    y2 = np.zeros_like(x2)
    wold = np.zeros(nch)
    for i in range(T):
        xi = x2[:, i]
        out_index = (out_index + 1) % RB
        in_index = (in_index + 1) % RB
        out_sample = ring[:, out_index]
        abs_out = abs_ring[out_index]
        ring[:, in_index] = xi
        abs_ring[in_index] = np.max(np.abs(xi))

        fast_ba = fast_backmult * abs_out + (1 - fast_backmult) * fast_ba
        hang_ba = hang_backmult * abs_out + (1 - hang_backmult) * hang_ba

        if abs_out >= ring_max and abs_out > 0.0:
            ring_max = 0.0
            k = out_index
            for _ in range(absize):
                k = (k + 1) % RB
                ring_max = max(ring_max, abs_ring[k])
        ring_max = max(ring_max, abs_ring[in_index])

        if hang_counter > 0:
            hang_counter -= 1

        if state == 0:
            if ring_max >= volts:
                volts += (ring_max - volts) * attack_mult
            elif volts > pop_ratio * fast_ba:
                state = 1
                volts += (ring_max - volts) * fast_decay_mult
            elif hang_enable and hang_ba > hang_level:
                state = 2
                hang_counter = hang_time_samples
                decay_type = 1
            else:
                state = 3
                volts += (ring_max - volts) * decay_mult
                decay_type = 0
        elif state == 1:
            if ring_max >= volts:
                state = 0
                volts += (ring_max - volts) * attack_mult
            elif volts > save_volts:
                volts += (ring_max - volts) * fast_decay_mult
            elif hang_counter > 0:
                state = 2
            elif decay_type == 0:
                state = 3
                volts += (ring_max - volts) * decay_mult
            else:
                state = 4
                volts += (ring_max - volts) * hang_decay_mult
        elif state == 2:
            if ring_max >= volts:
                state = 0
                save_volts = volts
                volts += (ring_max - volts) * attack_mult
            elif hang_counter == 0:
                state = 4
                volts += (ring_max - volts) * hang_decay_mult
        elif state == 3:
            if ring_max >= volts:
                state = 0
                save_volts = volts
                volts += (ring_max - volts) * attack_mult
            else:
                volts += (ring_max - volts) * decay_mult
        else:  # state 4
            if ring_max >= volts:
                state = 0
                save_volts = volts
                volts += (ring_max - volts) * attack_mult
            else:
                volts += (ring_max - volts) * hang_decay_mult

        volts = max(volts, min_volts)
        vo = min(np.log10(volts / max_input), 0.0)
        mult = (out_target - slope_constant * vo) / volts
        y2[:, i] = out_sample * mult

    if remove_dc:
        out = np.zeros_like(y2)
        for i in range(T):
            w = y2[:, i] + wold * 0.9999
            out[:, i] = w - wold
            wold = w
        y2 = out
    y = y2[0] if np.ndim(x) == 1 else y2
    return y


# --- WDSP variable-leak LMS (audio_driver.c:521-577) -----------------------

def leaky_lms(x: np.ndarray, notch: bool = False, n_taps: int = 64,
              delay: int = 16, two_mu: float = 1e-4,
              gamma: float = 0.1) -> np.ndarray:
    """Scalar port of AudioDriver_LeakyLmsNr, ring buffer and all.
    Defaults per AudioDriver_Dsp_Init (audio_driver.c:490-514)."""
    dline_size = 512                      # LEAKYLMSDLINE_SIZE
    mask = dline_size - 1
    d = np.zeros(dline_size)
    w = np.zeros(n_taps)
    in_idx = 0
    lidx, lidx_min, lidx_max = 120.0, 0.0, 200.0
    ngamma, den_mult, lincr, ldecr = 0.001, 6.25e-10, 1.0, 3.0
    out = np.empty(len(x))
    for i, xn in enumerate(np.asarray(x, np.float64)):
        d[in_idx] = xn
        idx = (in_idx + delay + np.arange(n_taps)) & mask
        ref = d[idx]
        y = float(w @ ref)
        sigma = float(ref @ ref)
        inv_sigp = 1.0 / (sigma + 1e-10)
        err = xn - y
        out[i] = err if notch else y
        nel = abs(err * (1.0 - two_mu * sigma * inv_sigp))
        nev = abs(xn - (1.0 - two_mu * ngamma) * y
                  - two_mu * err * sigma * inv_sigp)
        if nev < nel:
            lidx = min(lidx + lincr, lidx_max)
        else:
            lidx = max(lidx - ldecr, lidx_min)
        ngamma = gamma * (lidx * lidx) * (lidx * lidx) * den_mult
        w = (1.0 - two_mu * ngamma) * w + (two_mu * err * inv_sigp) * ref
        in_idx = (in_idx + mask) & mask
    return out


# --- FM discriminator (audio_driver.c:1544-1610) ---------------------------

def fm_discriminator(iq: np.ndarray) -> np.ndarray:
    i_prev = q_prev = 0.0
    out = np.zeros(len(iq))
    for n, z in enumerate(iq):
        i_s, q_s = z.real, z.imag
        y = i_prev * q_s - i_s * q_prev
        x = i_prev * i_s + q_s * q_prev
        out[n] = np.arctan2(y, x)
        i_prev, q_prev = i_s, q_s
    return out


def fm_deemph_hpf(angle: np.ndarray, lpf_alpha: float = 0.05,
                  hpf_alpha: float = 0.96) -> np.ndarray:
    lpf_prev = hpf_a = hpf_b = 0.0
    out = np.zeros(len(angle))
    for n, ang in enumerate(angle):
        a = lpf_prev + lpf_alpha * (ang - lpf_prev)
        lpf_prev = a
        b = hpf_alpha * (hpf_b + a - hpf_a)
        hpf_a, hpf_b = a, b
        out[n] = b
    return out


def nlms_notch(x: np.ndarray, num_taps: int = 96, delay: int = 8,
               mu: float = 0.01) -> np.ndarray:
    """NLMS automatic notch, scalar (the `AudioDriver_NotchFilter` role,
    audio_driver.c:1746-1774: predict the tonal component from a
    decorrelation-delayed reference and output the prediction ERROR —
    speech passes, carriers cancel).  Same structure/parameters as
    `ops/lms.notch_params`.

    float32 weights/history deliberately: NLMS weight adaptation is
    chaotic (a 1e-7 perturbation decorrelates the trajectory within a
    second), so a float64 oracle would diverge from ANY f32
    implementation including the firmware's own — the conformance row
    scores the integration (insertion point, delay, state handoff) with
    matched-precision adaptation."""
    x32 = np.asarray(x, np.float32)
    f32 = np.float32
    w = np.zeros(num_taps, np.float32)
    hist = np.zeros(num_taps + delay, np.float32)
    y = np.empty(len(x32), np.float64)
    for n, xn in enumerate(x32):
        hist[:-1] = hist[1:]
        hist[-1] = xn
        ref = hist[:num_taps]
        pred = f32(np.dot(w, ref))
        err = f32(xn - pred)
        norm = f32(np.dot(ref, ref) + f32(1e-9))
        w += (f32(mu) * err / norm) * ref
        y[n] = err
    return y
