"""RX signal chain — the TPU equivalent of `AudioDriver_RxProcessor`
(`audio_driver.c:2603-2942`) plus its decimated-domain post-processing
(`RxProcessor_DemodAudioPostprocessing` `audio_driver.c:2436-2592`).

Stage order mirrors the reference:

  IQ in (48 kHz complex, batched over channels)
    -> IQ gain/phase correction                 (audio_driver.c:2254-2316)
    -> spectrum tap (raw ring buffer analog)    (:2691)
    -> frequency translation (NCO mix)          (:2696, freq_shift.c)
    -> analytic bandpass + decimation (fused Hilbert pair + sideband
       selection + anti-alias)                  (:2744-2790)
    -> demod: SSB real part | AM envelope | SAM PLL | FM discriminator
    -> decimated-domain post: LMS notch -> audio bandpass (SOS) ->
       WDSP AGC -> spectral NR -> EQ biquads    (:2436-2556)
    -> interpolation back to 48 kHz             (:2560-2590)
  audio out (48 kHz real)

Everything is a pure function of (params, state, block); `process_block`
is jittable and vmap/shard-compatible over a leading channel axis.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import data as refdata
from ..demod import am as am_mod
from ..demod import fm as fm_mod
from ..demod import sam as sam_mod
from ..demod import ssb as ssb_mod
from ..nr import blanker as nb_mod
from ..nr import spectral as nr_mod
from ..ops import agc as agc_mod
from ..ops import design, fir, iir, iqcorr, latconv, lms, nco
from ..pallas import fir as pallas_fir
from . import eq as eq_mod
from . import filterpaths

IQ_RATE = 48000.0

_EMPTY_SOS = np.zeros((0, 5), np.float32)

# reference tap counts: filters.h:9-16 — RX 89/199, AM lowpass 89
RX_TAPS_HI = 199
RX_TAPS_LO = 89

# post-AGC output scaling (audio_driver.h:362-364, audio_driver.c:2517-2527
# and :1494-1495) — reproduced so product-chain output levels match the
# firmware's
POST_AGC_GAIN_SCALING_DECIMATE_4 = 3.46
POST_AGC_GAIN_SCALING_DECIMATE_2 = 3.46 * 0.6
FM_RX_SCALING_2K5 = 10000.0
FM_RX_SCALING_5K = FM_RX_SCALING_2K5 / 2.0


def _reference_post_scale(cfg: "RxConfig") -> float:
    """The firmware's net post-AGC gain for this mode/path.

    For non-FM modes: scale_gain (3.46 or 2.076, x0.5 AM/SAM else
    x0.333) TIMES the reference interpolation filter's net gain
    (its tables do not embed the zero-stuff compensation — net ~0.29 at
    /4; our `design.interpolation_fir` is amplitude-preserving, so the
    ratio is folded in here to land at the firmware's absolute level).
    """
    if cfg.mode == "fm":
        return FM_RX_SCALING_5K if cfg.fm_dev5 else FM_RX_SCALING_2K5
    ref_decim = cfg.path.decim      # 48k-based rate = the firmware's
    base = (POST_AGC_GAIN_SCALING_DECIMATE_4 if ref_decim == 4
            else POST_AGC_GAIN_SCALING_DECIMATE_2)
    base *= 0.5 if cfg.mode in ("am", "sam") else 0.333
    try:
        row = refdata.find_path(cfg.mode, cfg.bw_key)
        if row["interpolate"] is not None:
            g_ref = refdata.interp_passband_gain(row["interpolate"],
                                                 ref_decim)
            base *= g_ref / ref_decim
    except KeyError:
        pass                        # no reference analog for this path
    return base


@dataclass(frozen=True)
class RxConfig:
    """Static per-chain configuration (one compiled chain per config;
    channels sharing a config are batched)."""
    mode: str = "usb"              # usb | lsb | cw | am | sam | fm
                                   # | iq | ssbstereo (two-channel audio,
                                   # audio_driver.c:2618,2770-2777)
    bw_key: str = "2P3KHZ"
    path_name: str | None = None   # sub-path; None = first applicable
    front: str = "ref"             # "ref": front filters + post lattices are
                                   # the firmware's EXACT imported tables
                                   # (iq_rx_filter.c / fir_rx_decimate_*.c /
                                   # iir_*.c via uhsdr_tpu.data) — the chain
                                   # that is benchmarked IS the chain that
                                   # is conformant; "scipy": the legacy
                                   # redesigned single-stage front
    ref_select_id: int | None = None  # FilterPathInfo row selector (ref)
    translate_hz: float = 6000.0   # reference: ±6k/±12k (audio_driver.c:445)
    block_len: int = 4096          # 48 kHz samples per block
    high_taps: bool = True         # 199- vs 89-tap front filter
    agc_mode: str = "med"
    agc_thresh_db: float = 60.0
    nr_enable: bool = False
    nr_strength: int = 141         # alpha = 0.799 + strength/1000 (:1195)
    nb_enable: bool = False        # LPC impulse noise blanker
    nb_setting: int = 8            # 0..15 (audio_nr.c:2434)
    notch_enable: bool = False
    leaky_nr_enable: bool = False  # WDSP variable-leak LMS NR, pre-AGC
                                   # (AudioDriver_LeakyLmsNr,
                                   # audio_driver.c:521-577; inserted at
                                   # the reference's pre-AGC position,
                                   # :2461-2468)
    leaky_notch: bool = False      # leaky-LMS in notch mode replaces the
                                   # NLMS auto-notch (:2446-2452)
    sql_threshold: int = 0         # FM squelch
    subtone_hz: float = 0.0        # FM subaudible tone detect
    sam_sideband: str = "both"     # SAM: both | usb | lsb
    fade_leveler: bool = True
    cw_offset_hz: float = 700.0    # CW sidetone / passband center
    iq_auto_correction: bool = False  # Moseley-Slump feed-forward estimator
    fm_dev5: bool = False          # FM deviation 5 kHz (else 2.5 kHz)
    front_impl: str = "auto"       # auto | xla | pallas front FIR backend
    front_prec: str = "default"    # MXU pass precision for the front tap
                                   # matmuls: "default" = one bf16 pass
                                   # (~54-56 dB on-TPU conformance) or
                                   # "highest" = multi-pass f32 (~90 dB,
                                   # slower) — the measured ladder lives
                                   # in TPU_CONFORMANCE (PERF.md)
    iir_impl: str = "auto"         # auto | scan | pallas biquad backend
    iq_rate: float = IQ_RATE       # 48 kHz (reference) or 96 kHz (BASELINE
                                   # config 1 captures); decim keeps the
                                   # same decimated AUDIO rate per path
    eq: eq_mod.EqSettings = eq_mod.EqSettings()   # tone controls
    nr_prec_escalate: bool = True  # NR chains escalate the front to
                                   # multi-pass f32 (see
                                   # effective_front_prec); False keeps
                                   # the one-pass bf16 front for NR
                                   # chains — the r5 measurement knob
                                   # for scoping the escalation cost

    @property
    def effective_front_prec(self) -> str:
        """The precision the kernels actually run at.  Measured ladder
        (TPU v5e, kernels engaged, vs the float64 oracle — r4):
        default (one bf16 pass) base rows 52.9-54.6 dB @ 15,993 Ms/s;
        highest (multi-pass f32) 72.0 dB @ 7,801 Ms/s (-51%).  One-pass
        bf16 ships for plain chains (>=3 dB headroom over the 50 dB
        bound); spectral-NR chains AUTO-ESCALATE to highest — the MMSE
        gain machine amplifies the bf16 floor nonlinearly (32.2 dB,
        breaching the bound; 53.7 dB at highest).  FM chains escalate
        too (r5): the r4 fm TPU row lost 21 dB vs CPU and the bisect
        (`tools/fm_bisect.py`) pinned ALL of it on the bf16 front
        (front 61.9 dB, discriminator tracking it at 60.8, no later
        stage adding error; at highest the full FM chain measures
        129.7 dB TPU-vs-CPU).  FM's front is the decim-1 89-tap lowpass
        at 48 kHz — not the flagship bench path — so the escalation
        costs only FM-fleet throughput (measured delta in PERF.md)."""
        if self.front_prec == "default" and (
                (self.nr_enable and self.nr_prec_escalate)
                or self.mode == "fm"):
            return "highest"
        return self.front_prec

    @property
    def path(self) -> filterpaths.FilterPath:
        return filterpaths.find_path(self.mode, self.bw_key, self.path_name)

    @property
    def use_ref_front(self) -> bool:
        """Reference-table front engaged.  r5: the two-channel modes
        (DEMOD_IQ / DEMOD_SSBSTEREO, audio_driver.c:2770-2777) now get
        imported-table fronts too on the narrow (decimated-IQ) SSB
        paths — the firmware runs its normal decimator + Hilbert pair
        and only the final combine differs, so both channels fold into
        complex FIRs on the same tables (see _make_params_ref); wide
        paths keep the scipy designs."""
        if self.front != "ref":
            return False
        if self.mode in ("usb", "lsb", "cw", "am", "sam", "fm"):
            return True
        if self.mode in ("iq", "ssbstereo"):
            try:
                return refdata.uses_decimated_iq(self.ref_path, "usb")
            except KeyError:
                return False
        return False

    @property
    def ref_path(self) -> dict:
        """The firmware FilterPathInfo row (audio_filter.c:147-928).
        DEMOD_IQ/SSBSTEREO run the firmware's SSB paths (the demod-mode
        branch happens after the filters, audio_driver.c:2757-2777)."""
        mode = "usb" if self.mode in ("iq", "ssbstereo") else self.mode
        return refdata.find_path(mode, self.bw_key,
                                 select_id=self.ref_select_id)

    @property
    def rate_mult(self) -> int:
        """iq_rate / 48 kHz — >48k captures pre-decimate by this factor
        through a fused wideband anti-alias so the per-path chain runs at
        the reference's rates."""
        k = self.iq_rate / IQ_RATE
        if k != int(k) or k < 1:
            raise ValueError(f"iq_rate must be a multiple of 48 kHz, "
                             f"got {self.iq_rate}")
        return int(k)

    @property
    def n_audio(self) -> int:
        """1 (mono) or 2: IQ-as-stereo, LSB/USB stereo, SAM stereo —
        the reference's USE_TWO_CHANNEL_AUDIO modes (audio_driver.c:2618)."""
        if self.mode in ("iq", "ssbstereo"):
            return 2
        if self.mode == "sam" and self.sam_sideband == "stereo":
            return 2
        return 1

    @property
    def front_pair(self) -> bool:
        """Front filter is a (2, taps) pair feeding the two audio
        channels: ssbstereo always; iq when the ref-table front is
        engaged (legacy scipy iq uses one symmetric lowpass and splits
        Re/Im at demod instead)."""
        return (self.mode == "ssbstereo"
                or (self.mode == "iq" and self.use_ref_front))

    @property
    def decim(self) -> int:
        # scale the path's 48k-based decimation so the decimated audio
        # rate is rate-independent (96 kHz IQ -> /8 instead of /4)
        base = self.ref_path["decim"] if self.use_ref_front \
            else self.path.decim
        return int(base * self.iq_rate / IQ_RATE)

    @property
    def fs_dec(self) -> float:
        return self.iq_rate / self.decim


class RxParams(NamedTuple):
    """Host-side (numpy) design products for one chain config.

    Kept as NUMPY so they embed as compile-time literals when the chain is
    traced under jit — the axon TPU relay cannot device_put non-f32 dtypes,
    and literal embedding avoids all runtime host->device transfers.
    Complex FIRs are stored as separate re/im f32 planes and combined with
    `lax.complex` inside the traced function.
    """
    nco_delta: np.ndarray         # uint32 scalar
    front_fir_re: np.ndarray      # f32 (taps,)
    front_fir_im: np.ndarray      # f32 (taps,)
    audio_sos: np.ndarray         # (n_sections, 5) decimated-rate bandpass
    interp_fir: np.ndarray        # (taps,) anti-image, gain=interp
    agc: agc_mod.AgcParams
    fade: am_mod.FadeLevelerParams
    sam: sam_mod.SamParams
    fm: Any                       # fm_mod.FmParams or None
    nr: Any                       # nr_mod.NrParams or None
    nb: Any                       # nb_mod.NbParams or None
    notch: Any                    # lms.LmsParams or None
    leaky: Any                    # lms.LeakyLmsParams or None
    iq_gain: float
    iq_phase: float
    post_scale: float             # firmware-level output scaling
    eq1_sos: np.ndarray           # decimated-rate EQ cascade (biquad1)
    eq2_sos: np.ndarray           # 48k treble shelf (biquad2)
    # --- front="ref" extras (None/empty otherwise) ---
    front2_re: Any = None         # stage-B Hilbert-combine FIR @fs_dec
    front2_im: Any = None         #   (narrow SSB/CW: i_rx_new ∓ j·q_rx_new)
    aa_sos: np.ndarray = _EMPTY_SOS   # post-interp anti-alias lattice→SOS


class RxState(NamedTuple):
    iqcorr: Any
    nco_phase: jnp.ndarray
    front_carry: jnp.ndarray
    audio_sos_state: jnp.ndarray
    agc: agc_mod.AgcState
    fade: am_mod.FadeLevelerState
    sam: sam_mod.SamState
    fm: Any
    nr: Any
    nb: Any
    notch: Any
    leaky: Any
    interp_carry: jnp.ndarray
    eq1: jnp.ndarray
    eq2: jnp.ndarray
    front2_carry: Any = None
    aa: Any = None


def _upsample(h: np.ndarray, k: int) -> np.ndarray:
    """Zero-stuff h by k (the multirate noble identity's rate lift)."""
    if k == 1:
        return h
    u = np.zeros(k * (len(h) - 1) + 1, h.dtype)
    u[::k] = h
    return u


def _rate_adapt_front(h: np.ndarray, k: int, iq_rate: float) -> np.ndarray:
    """Lift a 48k-rate front filter to a k·48k input rate: the fused
    (wideband anti-alias) ⊛ upsample_k(h) is ONE decimating filter at the
    capture rate — decimate-by-k then h then decimate-by-R equals this
    filter then decimate-by-(kR), exactly (noble identity).  The
    anti-alias only has to kill h's spectral images around multiples of
    48 kHz (transition 20k→40k), so it stays short."""
    if k == 1:
        return h
    hb = design.lowpass_fir(32 * k - 1, 20000.0, iq_rate)
    return np.convolve(hb, _upsample(h, k))


def _sos5(sos6: np.ndarray) -> np.ndarray:
    """scipy (n,6) SOS -> the chain's normalized (n,5) [b0 b1 b2 a1 a2]."""
    sos6 = np.asarray(sos6, np.float64)
    sos6 = sos6 / sos6[:, 3:4]
    return np.concatenate([sos6[:, :3], sos6[:, 4:]],
                          axis=1).astype(np.float32)


def _lattice_sos5(name: str | None) -> np.ndarray:
    if name is None:
        return _EMPTY_SOS
    pk, pv = refdata.lattice(name)
    return _sos5(latconv.lattice_to_sos(pk, pv))


def _make_params_ref(cfg: RxConfig) -> RxParams:
    """Front + post products from the firmware's imported tables.

    Front structure (audio_driver.c:2718-2812, audio_filter.c:1134-1226):
      narrow SSB/CW: decimate IQ (FirRxDecimate[_sideband_supp]) -> Hilbert
        pair at fs_dec -> I±Q.  Stage A here is the real decimator (complex
        in/out, NCO fused); stage B (``front2``) is the Hilbert pair fused
        into ONE complex FIR g = h_i ∓ j·h_q whose real response IS I±Q
        (Re(z⊛g) = i⊛h_i ± q⊛h_q), run at fs_dec in `demod_and_post`.
      wide SSB: Hilbert at 48k -> I±Q -> decimate audio.  Because the
        decimator D is real it commutes with Re(·), so the whole front is
        ONE complex decimating FIR g_h ⊛ D with real output.
      AM/SAM: the per-path AM lowpass IS the decimator (both planes).
      FM: the 89-tap lowpass at 48k, no decimation.
    Post chain: PreFilter / anti-alias lattices run as their EXACT
    transfer functions converted to SOS cascades (`ops.latconv`), and the
    interpolator uses the firmware's taps, so no gain fudge is needed —
    `post_scale` is the firmware's bare constant.
    """
    rp = cfg.ref_path
    k = cfg.rate_mult
    mode = cfg.mode
    f32 = lambda a: np.ascontiguousarray(a, np.float32)

    front2 = None
    sgn = 1.0 if mode == "lsb" else -1.0      # g = h_i ∓ j·h_q
    if mode in ("am", "sam", "fm"):
        front = refdata.fir(rp["fir_i"], rp["fir_numtaps"]).astype(complex)
    elif mode in ("iq", "ssbstereo"):
        # two-channel modes on the firmware's narrow SSB path
        # (audio_driver.c:2770-2777): the decimator + Hilbert pair are
        # the SSB front's; only the final combine differs, and both
        # output channels are Re(z (*) g_k) for complex g built from
        # the imported h_i/h_q tables —
        #   ssbstereo: g0 = h_i - j h_q (-> i(*)h_i + q(*)h_q = USB),
        #              g1 = h_i + j h_q (-> LSB)          (:2774-2777)
        #   iq:        g0 = h_i (-> filtered I),
        #              g1 = -j h_q (Re((-j)(a+jb)) = b -> filtered Q)
        #                                                  (:2770-2773)
        # folded with the decimator into ONE input-rate (2, taps)
        # filter pair via the noble identity (like the wide-SSB front).
        h_i = refdata.fir(rp["fir_i"], rp["fir_numtaps"])
        h_q = refdata.fir(rp["fir_q"], rp["fir_numtaps"])
        dec = refdata.decimator(rp["dec"])
        if mode == "ssbstereo":
            gs = (h_i - 1j * h_q, h_i + 1j * h_q)
        else:
            gs = (h_i.astype(complex), -1j * h_q)
        front = np.stack([np.convolve(dec, _upsample(g, rp["decim"]))
                          for g in gs])
    elif refdata.uses_decimated_iq(rp, mode):   # narrow SSB/CW
        front = refdata.decimator(rp["dec"]).astype(complex)
        front2 = (refdata.fir(rp["fir_i"], rp["fir_numtaps"])
                  + 1j * sgn * refdata.fir(rp["fir_q"], rp["fir_numtaps"]))
    else:                                       # wide SSB
        g_h = (refdata.fir(rp["fir_i"], rp["fir_numtaps"])
               + 1j * sgn * refdata.fir(rp["fir_q"], rp["fir_numtaps"]))
        front = np.convolve(g_h, refdata.decimator(rp["dec"]))
    if front.ndim == 2:
        front = np.stack([_rate_adapt_front(f, k, cfg.iq_rate)
                          for f in front])
    else:
        front = _rate_adapt_front(front, k, cfg.iq_rate)

    fs_dec = cfg.fs_dec                  # rate-independent (decim scales)
    if mode == "fm":
        fs_dec = IQ_RATE                 # ref FM chain runs at 48 kHz

    interp_fir = np.zeros(1, np.float64)
    if rp["interpolate"] is not None:
        h_int, _ = refdata.interpolator(rp["interpolate"], rp["decim"])
        if k > 1:
            # lift the 48k-out interpolator to the capture rate: extra
            # zero-stuff by k compensated by a gain-k image filter
            hb = design.lowpass_fir(32 * k - 1, 20000.0, cfg.iq_rate) * k
            h_int = np.convolve(hb, _upsample(h_int, k))
        interp_fir = h_int
    aa_sos = _EMPTY_SOS
    if rp["antialias"] is not None:
        if k != 1:
            raise ValueError(
                f"post anti-alias lattice is 48k-rate only (iq_rate="
                f"{cfg.iq_rate}, mode={cfg.mode!r}, "
                f"antialias={rp['antialias']!r})")
        aa_sos = _lattice_sos5(rp["antialias"])

    post_scale = _reference_post_scale_exact(cfg)

    nr_params = None
    if cfg.nr_enable:
        lo, hi = cfg.path.audio_band
        nr_params = nr_mod.make_params(fs_dec, lo, hi,
                                       alpha=0.799 + cfg.nr_strength / 1000.0)
    fm_params = None
    if mode == "fm":
        fm_params = fm_mod.make_params(IQ_RATE, cfg.sql_threshold,
                                       cfg.subtone_hz)
    notch_params = (lms.notch_params() if cfg.notch_enable
                    and not cfg.leaky_notch else None)
    leaky_params = None
    if cfg.leaky_nr_enable or (cfg.notch_enable and cfg.leaky_notch):
        leaky_params = lms.leaky_lms_params(
            notch=cfg.notch_enable and cfg.leaky_notch)

    return RxParams(
        nco_delta=nco.freq_to_delta(-cfg.translate_hz, cfg.iq_rate),
        front_fir_re=f32(front.real),
        front_fir_im=f32(front.imag),
        audio_sos=_lattice_sos5(rp["pre"]),
        interp_fir=f32(interp_fir),
        agc=agc_mod.make_params(fs_dec, mode=cfg.agc_mode,
                                thresh_db=cfg.agc_thresh_db,
                                remove_dc=mode in ("am", "sam")),
        fade=am_mod.fade_leveler_params(cfg.fs_dec),
        sam=sam_mod.make_params(cfg.fs_dec),
        fm=fm_params,
        nr=nr_params,
        nb=nb_mod.make_params(cfg.nb_setting) if cfg.nb_enable else None,
        notch=notch_params,
        leaky=leaky_params,
        iq_gain=1.0,
        iq_phase=0.0,
        post_scale=post_scale,
        eq1_sos=eq_mod.rx_biquad1_sos(cfg.eq, fs_dec),
        eq2_sos=eq_mod.rx_biquad2_sos(cfg.eq, cfg.iq_rate),
        front2_re=f32(front2.real) if front2 is not None else None,
        front2_im=f32(front2.imag) if front2 is not None else None,
        aa_sos=aa_sos,
    )


def _reference_post_scale_exact(cfg: RxConfig) -> float:
    """Firmware post-AGC scaling, exact (audio_driver.c:2517-2527,
    :1494-1495) — used with the reference interpolator tables."""
    if cfg.mode == "fm":
        return FM_RX_SCALING_5K if cfg.fm_dev5 else FM_RX_SCALING_2K5
    base = (POST_AGC_GAIN_SCALING_DECIMATE_4 if cfg.ref_path["decim"] == 4
            else POST_AGC_GAIN_SCALING_DECIMATE_2)
    return base * (0.5 if cfg.mode in ("am", "sam") else 0.333)


def make_params(cfg: RxConfig) -> RxParams:
    if cfg.use_ref_front:
        return _make_params_ref(cfg)
    path = cfg.path
    taps = RX_TAPS_HI if cfg.high_taps else RX_TAPS_LO
    lo, hi = path.audio_band
    if cfg.mode == "usb":
        h = design.complex_bandpass_fir(taps, max(lo, 50.0), hi, cfg.iq_rate)
    elif cfg.mode in ("lsb", "cw"):
        # CW: reference picks sideband by CW mode; default LSB-like USB
        # handling is applied by caller flipping translate; use USB band for
        # cw (sidetone offset band), LSB mirror for lsb.
        if cfg.mode == "lsb":
            h = design.complex_bandpass_fir(taps, -hi, -max(lo, 50.0), cfg.iq_rate)
        else:
            h = design.complex_bandpass_fir(taps, max(lo, 50.0), hi, cfg.iq_rate)
    elif cfg.mode in ("am", "sam", "iq"):
        # symmetric IQ lowpass, cutoff = the AM coefficient-set class the
        # reference selects for this bandwidth (audio_filter.c:704-880);
        # DEMOD_IQ passes the (filtered) I/Q planes straight to L/R
        cut = min(max(hi, 2300.0), 10000.0)
        h = design.complex_bandpass_fir(taps, -cut, cut, cfg.iq_rate)
    elif cfg.mode == "ssbstereo":
        # DEMOD_SSBSTEREO (audio_driver.c:2774-2777): USB and LSB demodulated
        # simultaneously to the two audio channels — a (2, taps) filter pair
        h_u = design.complex_bandpass_fir(taps, max(lo, 50.0), hi, cfg.iq_rate)
        h_l = design.complex_bandpass_fir(taps, -hi, -max(lo, 50.0), cfg.iq_rate)
        h = np.stack([h_u, h_l])
    elif cfg.mode == "fm":
        cut = path.width / 2 if path.width >= 5000 else 5000.0
        h = design.complex_bandpass_fir(taps, -cut, cut, cfg.iq_rate)
    else:
        raise ValueError(cfg.mode)

    fs_dec = cfg.fs_dec
    audio_sos = design.audio_bandpass_sos(lo if lo > 60 else 0.0,
                                          min(hi, 0.45 * fs_dec), fs_dec)
    interp_fir = design.interpolation_fir(16 * cfg.decim, cfg.decim, cfg.iq_rate)

    nr_params = None
    if cfg.nr_enable:
        nr_params = nr_mod.make_params(fs_dec, lo, hi,
                                       alpha=0.799 + cfg.nr_strength / 1000.0)
    fm_params = None
    if cfg.mode == "fm":
        fm_params = fm_mod.make_params(cfg.iq_rate, cfg.sql_threshold,
                                       cfg.subtone_hz)
    notch_params = (lms.notch_params() if cfg.notch_enable
                    and not cfg.leaky_notch else None)
    leaky_params = None
    if cfg.leaky_nr_enable or (cfg.notch_enable and cfg.leaky_notch):
        leaky_params = lms.leaky_lms_params(
            notch=cfg.notch_enable and cfg.leaky_notch)

    return RxParams(
        nco_delta=nco.freq_to_delta(-cfg.translate_hz, cfg.iq_rate),
        front_fir_re=np.ascontiguousarray(h.real.astype(np.float32)),
        front_fir_im=np.ascontiguousarray(h.imag.astype(np.float32)),
        audio_sos=audio_sos.astype(np.float32),
        interp_fir=interp_fir.astype(np.float32),
        agc=agc_mod.make_params(fs_dec, mode=cfg.agc_mode,
                                thresh_db=cfg.agc_thresh_db,
                                remove_dc=cfg.mode in ("am", "sam")),
        fade=am_mod.fade_leveler_params(fs_dec),
        sam=sam_mod.make_params(fs_dec),
        fm=fm_params,
        nr=nr_params,
        nb=nb_mod.make_params(cfg.nb_setting) if cfg.nb_enable else None,
        notch=notch_params,
        leaky=leaky_params,
        iq_gain=1.0,
        iq_phase=0.0,
        post_scale=_reference_post_scale(cfg),
        eq1_sos=eq_mod.rx_biquad1_sos(cfg.eq, fs_dec),
        eq2_sos=eq_mod.rx_biquad2_sos(cfg.eq, cfg.iq_rate),
    )


def init_state(cfg: RxConfig, params: RxParams, batch_shape) -> RxState:
    bs = tuple(batch_shape)
    taps = params.front_fir_re.shape[-1]
    # two-channel audio modes: the demodulated-audio post chain runs per
    # audio channel — its state carries an extra (2,) axis (the reference's
    # NUM_AUDIO_CHANNELS loops); the front end stays per RF channel except
    # ssbstereo, which filters with a (2, taps) USB/LSB pair
    bs_post = bs + ((cfg.n_audio,) if cfg.n_audio > 1 else ())
    bs_front = bs + ((2,) if cfg.front_pair else ())
    return RxState(
        iqcorr=iqcorr.init_state(bs) if cfg.iq_auto_correction else None,
        nco_phase=jnp.zeros(bs, jnp.uint32),
        front_carry=fir.init_carry(bs_front, taps, jnp.complex64),
        audio_sos_state=jnp.zeros((params.audio_sos.shape[0],) + bs_post + (2,),
                                  jnp.float32),
        # two-channel modes: LINKED stereo AGC (one detector from
        # max(|L|,|R|), one gain — AudioAgc_RunAgcWdsp use_stereo,
        # audio_agc.c:383-394,571-576), not independent per-channel AGC
        agc=(agc_mod.init_state_stereo(bs, params.agc) if cfg.n_audio > 1
             else agc_mod.init_state(bs_post, params.agc)),
        fade=am_mod.fade_leveler_init(bs_post),
        sam=sam_mod.init_state(bs, n_audio=cfg.n_audio),
        fm=fm_mod.init_state(bs, params.fm) if params.fm is not None else None,
        nr=nr_mod.init_state(bs_post) if params.nr is not None else None,
        nb=nb_mod.init_state(bs_post) if params.nb is not None else None,
        notch=lms.init_state(bs_post, params.notch) if params.notch is not None else None,
        leaky=(lms.leaky_lms_init(bs_post, params.leaky)
               if params.leaky is not None else None),
        interp_carry=jnp.zeros(
            bs_post + (-(-params.interp_fir.shape[-1] // cfg.decim) - 1,),
            jnp.float32),
        eq1=jnp.zeros((params.eq1_sos.shape[0],) + bs_post + (2,), jnp.float32),
        eq2=jnp.zeros((params.eq2_sos.shape[0],) + bs_post + (2,), jnp.float32),
        front2_carry=(fir.init_carry(bs, params.front2_re.shape[-1],
                                     jnp.complex64)
                      if params.front2_re is not None else None),
        aa=jnp.zeros((params.aa_sos.shape[0],) + bs_post + (2,), jnp.float32),
    )


def _biquad_cascade(cfg: RxConfig, sos, state, x, precise: bool = False):
    """Biquad cascade dispatch (shared Pallas/XLA rule,
    `ops.iir.biquad_cascade_dispatch`).  precise=True pins the
    conformance-critical sequential path (ref lattice-derived cascades)."""
    impl = "precise" if (precise and cfg.iir_impl == "auto") else cfg.iir_impl
    return iir.biquad_cascade_dispatch(sos, state, x, impl=impl)


def _tune_offset_delta(offset_hz, fs: float) -> jnp.ndarray:
    """Traced f32 tune offset (Hz) -> uint32 NCO delta, computed in-graph.

    Split into two 16-bit halves so each f32->uint32 conversion stays well
    below 2^24 (exact in f32); the recombined uint32 wraps correctly when
    added to the compile-time translate delta.  Resolution ~3 uHz.
    """
    frac = jnp.mod(-offset_hz / np.float32(fs), 1.0)
    hi = jnp.floor(frac * 65536.0)
    lo = jnp.floor((frac * 65536.0 - hi) * 65536.0)
    return (hi.astype(jnp.uint32) * jnp.uint32(65536)
            + lo.astype(jnp.uint32))


def process_front(cfg: RxConfig, params: RxParams, state: RxState,
                  iq: jnp.ndarray, tune_offset_hz=None):
    """Front half of the chain: IQ correction, clip/spectrum taps, NCO
    translate, and the stage-A decimating FIR kernel.  Returns
    (zf, new_state, taps_dict) where zf is the decimated front output
    (real audio when the Hilbert combine is fused into stage A, complex
    IQ otherwise).  `process_block` = process_front + demod_and_post;
    fleets call the halves separately to batch post stages across groups
    (`parallel.fleet`)."""
    taps_out = {}
    front_fir = jax.lax.complex(jnp.asarray(params.front_fir_re),
                                jnp.asarray(params.front_fir_im))

    # --- int16 ingest (the codec's native sample width) ---
    # iq may be an (i16, q16) tuple of int16 planes straight off the
    # ADC/ingest ring (audio_driver.c ISR hands 16-bit codec frames; the
    # native ring's raw_i16 mode, io.ingest.IqIngest, hands exactly
    # these planes unconverted).  The Pallas front
    # kernel reads the i16 block directly — HALF the HBM bytes of the
    # chain's dominant input term — and converts to normalized f32 in
    # VMEM.  Every non-kernel consumer sees the lazily-converted complex
    # view below (XLA drops it when only the kernel path is live).
    i16 = q16 = None
    if isinstance(iq, tuple) and iq[0].dtype == jnp.int16:
        i16, q16 = iq
        sc = np.float32(1.0 / 32768.0)
        iq = jax.lax.complex(i16.astype(jnp.float32) * sc,
                             q16.astype(jnp.float32) * sc)
    elif isinstance(iq, tuple):
        iq = jax.lax.complex(*iq)

    # --- IQ imbalance correction (audio_driver.c:2254-2316) ---
    iqc_state = state.iqcorr
    if cfg.iq_auto_correction:
        i_, q_, iqc_state = iqcorr.correct(state.iqcorr, jnp.real(iq),
                                           jnp.imag(iq))
        z = jax.lax.complex(i_, q_)
    elif params.iq_gain == 1.0 and params.iq_phase == 0.0:
        # identity calibration: skip the arithmetic OUTRIGHT — XLA does
        # not fold `q + i*0.0` (mul-by-zero changes NaN/Inf semantics),
        # so the no-op correction materialized a full elementwise pass
        # (~2.4 ms of HBM at the flagship shape, measured)
        i_, q_ = jnp.real(iq), jnp.imag(iq)
        z = iq
    else:
        i_ = jnp.real(iq) * params.iq_gain
        q_ = jnp.imag(iq) + i_ * params.iq_phase
        z = jax.lax.complex(i_, q_)

    taps_out["spectrum_iq"] = z    # pre-translate tap for the scope display

    # --- frequency translation ---
    translating = cfg.translate_hz != 0.0 or tune_offset_hz is not None

    # Pallas MXU front end: "auto" resolves to it off-CPU when the shape
    # tiles (C % 8, T_out % 256) — measured 1.72x on the WHOLE chain
    # (777 -> 1340 Msamples/s at 8192ch x 16k on v5e; the front FIR is
    # ~85% of chain time on the XLA FFT path).  The earlier remote-AOT
    # compile blowup no longer reproduces (41 s cold, in-session).
    # FM stays at 48 kHz (ref decim 1; only the >48k capture pre-decimation
    # applies); all other modes decimate by cfg.decim in the front kernel
    fm_decim = (cfg.decim if cfg.use_ref_front else 1) \
        if cfg.mode == "fm" else cfg.decim
    use_pallas = cfg.front_impl != "xla" and not cfg.front_pair
    if use_pallas and cfg.front_impl == "auto":
        use_pallas = (jax.default_backend() != "cpu" and z.ndim == 2
                      and z.shape[0] % 8 == 0
                      and (z.shape[-1] // fm_decim) % 256 == 0)

    delta = None
    # the compile-time delta value, when no traced tune offset rides on
    # top — enables the front kernels' precomputed-rotor fast path
    # (pallas/fir nco_static_delta: no full-rate cos/sin pass)
    static_delta = (int(params.nco_delta) if tune_offset_hz is None
                    else None)
    if translating:
        delta = jnp.asarray(params.nco_delta)
        if tune_offset_hz is not None:
            delta = delta + _tune_offset_delta(tune_offset_hz, cfg.iq_rate)

    # When the Pallas front end is active, the NCO mix is FUSED into the
    # FIR kernel (the slab is rotated in VMEM; the carry holds raw IQ) —
    # the separate mix stage is a pure HBM round-trip of the full complex
    # block (~10 ms of a 48 ms chain at 8192ch x 16k).  Phase is uniform
    # across channels in a chain (all init to 0, same delta), so the
    # kernel takes it as a scalar.
    fuse_nco = use_pallas and translating
    # raw int16 planes go to the kernel only when they truly ARE its
    # input domain: identity calibration (no correction arithmetic ran)
    # and either a fused NCO (the kernel rotates the raw slab itself)
    # or no translation at all
    i16_direct = (i16 is not None and not cfg.iq_auto_correction
                  and params.iq_gain == 1.0 and params.iq_phase == 0.0
                  and (fuse_nco or not translating))
    z_raw = z
    if translating and not fuse_nco:
        z, nco_phase = nco.mix(z, state.nco_phase,
                               jnp.broadcast_to(delta,
                                                state.nco_phase.shape))
    elif fuse_nco:
        nco_phase = nco.advance(
            state.nco_phase,
            jnp.broadcast_to(delta, state.nco_phase.shape), z.shape[-1])
    else:
        nco_phase = state.nco_phase

    def _raw_tail(n_keep: int) -> jnp.ndarray:
        """front_carry contract: when translating, the carry is RAW
        (pre-mix) IQ — the NCO-fused Pallas kernel's convention.  The
        XLA fallback must store the same domain, otherwise a mid-stream
        shape fallback (e.g. a trailing partial block whose T_out stops
        tiling) would hand raw history to a mixed-domain filter (round-4
        bug: the flagship conformance tail collapsed to 16 dB)."""
        if z_raw.shape[-1] >= n_keep:
            tail = z_raw[..., -n_keep:]
        else:
            prev = state.front_carry
            if prev.ndim > z_raw.ndim:       # ssbstereo (…, 2, n) carry:
                prev = prev[..., 0, :]       # both planes share the raw RF
            tail = jnp.concatenate([prev, z_raw], axis=-1)[..., -n_keep:]
        if state.front_carry.ndim > tail.ndim:
            tail = jnp.broadcast_to(tail[..., None, :],
                                    state.front_carry.shape)
        return tail

    def _mixed_carry(n_keep: int) -> jnp.ndarray:
        """Rotate the RAW carry into the mixed domain for the XLA
        filter: carry sample j sits at absolute index n = -(n_keep - j),
        so its phase is phase0 - delta*(n_keep - j) (uint32 wrap)."""
        if not translating:
            return state.front_carry
        back = jnp.arange(n_keep, 0, -1, dtype=jnp.uint32)
        ang = (state.nco_phase[..., None]
               - jnp.asarray(delta, jnp.uint32) * back).astype(
            jnp.float32) * np.float32(2.0 * np.pi / 2.0 ** 32)
        rot = jax.lax.complex(jnp.cos(ang), jnp.sin(ang))
        if state.front_carry.ndim > rot.ndim:
            rot = rot[..., None, :]          # ssbstereo filter-pair axis
        return state.front_carry * rot

    # --- FM branch: full-rate demod, no decimation path ---
    if cfg.mode == "fm":
        if use_pallas:
            C = z.shape[0]
            tmax = 128 // pallas_fir.TILE_C_DIV
            tile_c = next((tc for tc in (tmax, 8) if C % tc == 0), 8)
            zf, front_carry = pallas_fir.fir_decimate_pallas(
                np.asarray(params.front_fir_re)
                + 1j * np.asarray(params.front_fir_im),
                state.front_carry, (i16, q16) if i16_direct else z,
                fm_decim, tile_c=tile_c, tile_t=256,
                nco=((state.nco_phase.reshape(-1)[0], delta)
                     if fuse_nco else None),
                nco_static_delta=static_delta if fuse_nco else None,
                prec=(None if cfg.effective_front_prec == "default"
                      else cfg.effective_front_prec))
        elif fm_decim > 1:
            n_keep = state.front_carry.shape[-1]
            zf, _ = fir.fir_decimate_block(
                front_fir, _mixed_carry(n_keep), z, fm_decim)
            front_carry = _raw_tail(n_keep)
        else:
            n_keep = state.front_carry.shape[-1]
            zf, _ = fir.fir_block(front_fir, _mixed_carry(n_keep), z)
            front_carry = _raw_tail(n_keep)
        state = state._replace(iqcorr=iqc_state, nco_phase=nco_phase,
                               front_carry=front_carry)
        return zf, state, taps_out

    # --- analytic bandpass + decimate ---
    if cfg.front_pair:
        # duplicate the RF stream across the (2,) stereo axis; the (2, taps)
        # filter pair then produces both audio channels in one pass
        z = jnp.broadcast_to(z[..., None, :], z.shape[:-1] + (2, z.shape[-1]))
    front2_new = None
    if use_pallas:
        C = z.shape[0]
        # Tile choice (swept on v5e at the 96k flagship, 8192ch x 16k):
        # with the real-taps 2-matmul kernel, decim 8 runs best as
        # (tile_c 128, tile_t 256) — 4.82 vs 5.02 ms for (256, 128)
        # best-of-3 standalone; complex-taps fronts (wide SSB) keep the
        # round-3 sweep's (256, 128) at decim 8 and (256, 256) below.
        # High-precision MXU passes (pallas.fir._PREC) halve tile_c.
        front_real = not np.any(params.front_fir_im)
        if cfg.decim >= 8:
            tile_c_max, tile_t = ((128, 256) if front_real else (256, 128))
        else:
            tile_c_max, tile_t = 256, 256
        tile_c_max //= pallas_fir.TILE_C_DIV
        if cfg.effective_front_prec in ("high", "highest"):
            tile_c_max = max(tile_c_max // 2, 8)   # multi-pass staging VMEM
        tile_c = next((tc for tc in (tile_c_max, 128, 64, 8)
                       if tc <= tile_c_max and C % tc == 0), 8)
        # SSB demod is exactly Re(analytic signal): the kernel skips the
        # imaginary-part matmuls (half its MXU work) and hands the real
        # audio straight to the post chain (demod_and_post passes real
        # input through for ssb modes).  With the ref two-stage front the
        # Hilbert combine happens in stage B, so stage A stays complex.
        real_out = (cfg.mode in ("usb", "lsb", "cw")
                    and params.front2_re is None)
        # when stage B follows (narrow SSB/CW two-stage ref front), hand
        # the decimated IQ over as separate f32 PLANES — the interleaved
        # complex64 materialization + strided re-split between the two
        # pallas calls is pure HBM waste
        planes = params.front2_re is not None
        # fuse the ADC peak/clip taps into the kernel when possible: the
        # separate XLA max-|i|/|q| reduction costs ~1.7 ms of pure HBM
        # re-read at the flagship shape (audio_driver.c:2660-2685 role)
        peaks_fused = front_real and not real_out
        # stage-B fusion (`pallas.fir._fir_kernel_rt_s2`): the ref
        # front's fs_dec Hilbert-combine FIR runs in the stage-A
        # kernel's epilogue on the VMEM-resident output tile — the
        # decimated IQ planes never round-trip HBM and the kernel hands
        # the post chain REAL audio directly (stage_b then no-ops)
        taps2 = (params.front2_re.shape[-1]
                 if params.front2_re is not None else 0)
        pad2 = -(-(taps2 - 1) // 128) * 128 if taps2 else 0
        fuse_b = (front_real and taps2 > 0 and fuse_nco
                  and peaks_fused and pad2 <= tile_t
                  and cfg.mode != "ssbstereo")
        prec_arg = (None if cfg.effective_front_prec == "default"
                    else cfg.effective_front_prec)
        front2_new = None
        if fuse_b:
            c2 = state.front2_carry
            zf, front_carry, pk_tiles, (f2r, f2i) = \
                pallas_fir.fir_decimate_pallas(
                    np.asarray(params.front_fir_re)
                    + 1j * np.asarray(params.front_fir_im),
                    state.front_carry, (i16, q16) if i16_direct else z,
                    cfg.decim, tile_c=tile_c,
                    tile_t=tile_t,
                    nco=(state.nco_phase.reshape(-1)[0], delta),
                    nco_static_delta=static_delta,
                    peaks_out=True, prec=prec_arg,
                    fuse2=(np.asarray(params.front2_re)
                           + 1j * np.asarray(params.front2_im),
                           (jnp.real(c2), jnp.imag(c2))))
            front2_new = jax.lax.complex(f2r, f2i)
        else:
            res = pallas_fir.fir_decimate_pallas(
                np.asarray(params.front_fir_re)
                + 1j * np.asarray(params.front_fir_im),
                state.front_carry, (i16, q16) if i16_direct else z,
                cfg.decim, tile_c=tile_c,
                tile_t=tile_t,
                nco=((state.nco_phase.reshape(-1)[0], delta)
                     if fuse_nco else None),
                nco_static_delta=static_delta if fuse_nco else None,
                real_out=real_out, planes_out=planes,
                peaks_out=peaks_fused, prec=prec_arg)
            if peaks_fused:
                zf, front_carry, pk_tiles = res
            else:
                zf, front_carry = res
        if fuse_b or peaks_fused:
            pk = jnp.max(pk_tiles, axis=-1)
            taps_out["adc_peak"] = pk
            taps_out["adc_clip"] = pk > 0.985
            taps_out["adc_half_clip"] = pk > 0.5
            taps_out["adc_quarter_clip"] = pk > 0.25
    else:
        n_keep = state.front_carry.shape[-1]
        zf, _ = fir.fir_decimate_block(front_fir, _mixed_carry(n_keep),
                                       z, cfg.decim)
        front_carry = _raw_tail(n_keep)

    if "adc_peak" not in taps_out:
        # ADC clip / signal-level detect (audio_driver.c:2660-2685:
        # ads.adc_clip/half/quarter feed the RF-gain auto-adjust) — the
        # XLA fallback when the kernel didn't fuse it; input full scale
        # is 1.0 instead of the codec's int16 counts
        peak = jnp.maximum(jnp.max(jnp.abs(i_), axis=-1),
                           jnp.max(jnp.abs(q_), axis=-1))
        taps_out["adc_peak"] = peak
        taps_out["adc_clip"] = peak > 0.985
        taps_out["adc_half_clip"] = peak > 0.5
        taps_out["adc_quarter_clip"] = peak > 0.25

    state = state._replace(iqcorr=iqc_state, nco_phase=nco_phase,
                           front_carry=front_carry)
    if front2_new is not None:
        state = state._replace(front2_carry=front2_new)
    return zf, state, taps_out


def process_block(cfg: RxConfig, params: RxParams, state: RxState,
                  iq: jnp.ndarray, tune_offset_hz=None):
    """iq: (..., block_len) complex64 @48k.  Returns (audio48k, new_state, taps_dict).

    tune_offset_hz: optional TRACED f32 scalar — an extra frequency shift
    added to the compile-time translate NCO.  This is the live-retune path
    (the reference's LO step, `RadioManagement_ChangeFrequency`
    `radio_management.c:679`): dial changes re-run the same compiled chain
    with a new scalar instead of recompiling, emulating the LO move as a
    baseband shift of the capture."""
    zf, state, taps_out = process_front(cfg, params, state, iq,
                                        tune_offset_hz=tune_offset_hz)
    return demod_and_post(cfg, params, state, zf, taps_out)


def demod_pre_agc(cfg: RxConfig, params: RxParams, state: RxState,
                  zf: jnp.ndarray, taps_out: dict | None = None):
    """Stage B + demodulation + notch/leaky LMS + audio bandpass —
    everything up to (excluding) the WDSP AGC.  Split out of
    `demod_and_post` so mixed-mode fleets can run ONE batched AGC kernel
    across same-rate groups (`parallel.fleet` cross-group stage
    batching); for FM this is the full-rate discriminator + FM_RX_SCALING
    (the reference applies AGC after the scale, audio_driver.c:2824-2836).
    Returns (audio_at_agc_input, new_state, taps)."""
    if taps_out is None:
        taps_out = {}

    if cfg.mode == "fm":
        audio, fm_state = fm_mod.demod(params.fm, state.fm, zf)
        audio = audio * np.float32(params.post_scale)
        return audio, state._replace(fm=fm_state), taps_out

    zf, state = stage_b(cfg, params, state, zf)
    return _demod_sos_pre_agc(cfg, params, state, zf, taps_out)


def stage_b(cfg: RxConfig, params: RxParams, state: RxState,
            zf: jnp.ndarray):
    """Ref-front stage B: the firmware's Hilbert pair at fs_dec fused
    into one complex FIR with real output (= I±Q sideband combine,
    audio_driver.c:2748-2790); stage A delivered the decimated IQ.
    No-op when the front has no second stage.  Exposed separately so
    mixed-mode fleets can batch it across same-filter groups."""
    front2_carry = state.front2_carry
    if params.front2_re is not None:
        if not isinstance(zf, tuple) and not jnp.iscomplexobj(zf):
            # already REAL audio: the front kernel fused stage B into
            # its epilogue (`process_front` fuse_b) and updated
            # front2_carry itself
            return zf, state
        g2_np = (np.asarray(params.front2_re)
                 + 1j * np.asarray(params.front2_im))
        z0 = zf[0] if isinstance(zf, tuple) else zf
        use_pallas2 = (jax.default_backend() != "cpu" and z0.ndim == 2
                       and z0.shape[0] % 8 == 0
                       and z0.shape[-1] % 256 == 0
                       and 256 >= g2_np.shape[-1] - 1)
        if use_pallas2:
            C = z0.shape[0]
            tmax = 256 // pallas_fir.TILE_C_DIV
            tile_c = next((tc for tc in (tmax, 128, 64, 8)
                           if tc <= tmax and C % tc == 0), 8)
            zf, front2_carry = pallas_fir.fir_decimate_pallas(
                g2_np, state.front2_carry, zf, 1, tile_c=tile_c,
                tile_t=256, real_out=True,
                prec=(None if cfg.effective_front_prec == "default"
                      else cfg.effective_front_prec))
            if isinstance(front2_carry, tuple):
                # RxState.front2_carry stays complex (stable pytree)
                front2_carry = jax.lax.complex(*front2_carry)
        else:
            if isinstance(zf, tuple):
                zf = jax.lax.complex(*zf)
            g2 = jax.lax.complex(jnp.asarray(params.front2_re),
                                 jnp.asarray(params.front2_im))
            y2, front2_carry = fir.fir_block(g2, state.front2_carry, zf)
            zf = jnp.real(y2)
    elif isinstance(zf, tuple):
        zf = jax.lax.complex(*zf)
    return zf, state._replace(front2_carry=front2_carry)


def _demod_sos_pre_agc(cfg: RxConfig, params: RxParams, state: RxState,
                       zf: jnp.ndarray, taps_out: dict):
    """Demod + notch/leaky + audio bandpass (post-stage-B part of
    `demod_pre_agc`)."""
    # --- demodulation at decimated rate ---
    fade_state = state.fade
    sam_state = state.sam
    if cfg.mode in ("usb", "lsb", "cw"):
        audio = ssb_mod.demod(zf)
    elif cfg.mode == "ssbstereo":
        # zf is (..., 2, T) from the USB/LSB filter pair; taking the real
        # part of each analytic signal IS the two demodulated sidebands
        # (DEMOD_SSBSTEREO, audio_driver.c:2774-2777): ch0=USB, ch1=LSB
        audio = ssb_mod.demod(zf)
    elif cfg.mode == "iq":
        # DEMOD_IQ (audio_driver.c:2770-2773): filtered I/Q straight to
        # L/R.  Ref front: the (2, taps) pair (h_i, -j*h_q) already
        # routed the planes, both channels are Re(zf) (see
        # _make_params_ref); scipy front: one symmetric lowpass on the
        # complex signal, split Re/Im here.
        if cfg.front_pair:
            audio = ssb_mod.demod(zf)
        else:
            audio = jnp.stack([jnp.real(zf), jnp.imag(zf)], axis=-2)
    elif cfg.mode == "am":
        audio, fade_state = am_mod.demod(zf, params.fade, state.fade,
                                         cfg.fade_leveler)
    elif cfg.mode == "sam":
        audio, _, sam_state = sam_mod.demod(params.sam, state.sam, zf,
                                            sideband=cfg.sam_sideband,
                                            fade_leveler_on=cfg.fade_leveler)
    else:
        raise ValueError(cfg.mode)

    # --- decimated-domain post-processing ---
    notch_state = state.notch
    if params.notch is not None:
        audio, notch_state = lms.run(params.notch, state.notch, audio)

    # leaky-LMS (notch-mode replaces the NLMS auto-notch; NR-mode is the
    # reference's pre-AGC DSP_NR instance, audio_driver.c:2446-2468)
    leaky_state = state.leaky
    if params.leaky is not None:
        audio, leaky_state = lms.leaky_lms_run(params.leaky, state.leaky,
                                               audio)

    audio, sos_state = _biquad_cascade(cfg, params.audio_sos,
                                       state.audio_sos_state, audio,
                                       precise=cfg.use_ref_front)

    new_state = state._replace(
        audio_sos_state=sos_state, fade=fade_state, sam=sam_state,
        notch=notch_state, leaky=leaky_state)
    return audio, new_state, taps_out


def post_after_agc(cfg: RxConfig, params: RxParams, state: RxState,
                   audio: jnp.ndarray, taps_out: dict | None = None):
    """Post-AGC half of the chain: noise blanker, spectral NR, post-AGC
    gain scaling, EQ biquad1, interpolation to the IQ rate, anti-alias
    lattice, treble biquad2.  (FM: treble biquad2 only — the FM chain
    stays at 48 kHz.)  Returns (audio48, new_state, taps)."""
    if taps_out is None:
        taps_out = {}

    if cfg.mode == "fm":
        audio, eq2_state = _biquad_cascade(cfg, params.eq2_sos, state.eq2,
                                           audio)
        return audio, state._replace(eq2=eq2_state), taps_out

    audio, state, taps_out = post_to_dec(cfg, params, state, audio,
                                         taps_out)
    return interp_stage(cfg, params, state, audio, taps_out)


def post_to_dec(cfg: RxConfig, params: RxParams, state: RxState,
                audio: jnp.ndarray, taps_out: dict):
    """Decimated-rate post-AGC stages: noise blanker, spectral NR,
    post-AGC gain scaling, EQ biquad1 (everything before interpolation).
    Exposed for the fleet's cross-group interpolation batching."""
    # --- LPC impulse noise blanker (alt_noise_blanking, runs on the NR
    # input in the reference: audio_nr.c:357-366) ---
    nb_state = state.nb
    if params.nb is not None:
        audio, nb_state = nb_mod.process_block(params.nb, state.nb, audio)

    nr_state = state.nr
    if params.nr is not None:
        audio, nr_state = nr_mod.process_block(params.nr, state.nr, audio)

    # post-AGC gain scaling (audio_driver.c:2517-2527 + the reference
    # interpolator's net gain — see _reference_post_scale)
    audio = audio * np.float32(params.post_scale)

    # --- EQ biquad1 (notch/peak/bass, audio_driver.c:2527) ---
    audio, eq1_state = _biquad_cascade(cfg, params.eq1_sos, state.eq1, audio)

    taps_out["audio_dec"] = audio   # decimated-rate tap (modem decoders)
    return audio, state._replace(nr=nr_state, nb=nb_state,
                                 eq1=eq1_state), taps_out


def interp_stage(cfg: RxConfig, params: RxParams, state: RxState,
                 audio: jnp.ndarray, taps_out: dict):
    """Interpolation back to the IQ rate + anti-alias lattice + treble
    biquad2 — the final 48 kHz stages."""
    # --- interpolation back to 48 kHz + treble shelf (biquad2) ---
    # Pallas single-matmul polyphase kernel off-CPU (the XLA path
    # materializes a sub_len-wide frame tensor; measured 16 ms in-chain
    # at 8192ch x 16k) — falls back for stereo (3D) / non-tiling shapes
    use_pallas_interp = (jax.default_backend() != "cpu"
                         and audio.ndim == 2 and audio.shape[0] % 8 == 0
                         and audio.shape[-1] % 512 == 0)
    if use_pallas_interp:
        C = audio.shape[0]
        tmax = 256 // pallas_fir.TILE_C_DIV
        tile_c = next((tc for tc in (tmax, 128, 64, 8)
                       if tc <= tmax and C % tc == 0), 8)
        audio48, interp_carry = pallas_fir.fir_interpolate_pallas(
            params.interp_fir, state.interp_carry, audio, cfg.decim,
            tile_c=tile_c, tile_t_in=512,
            prec=(None if cfg.effective_front_prec == "default"
                  else cfg.effective_front_prec))
    else:
        audio48, interp_carry = fir.fir_interpolate_block(
            params.interp_fir, state.interp_carry, audio, cfg.decim)
    # post-interpolation anti-alias lattice (audio_driver.c:2583), as its
    # exact transfer function in SOS form (ops.latconv)
    aa_state = state.aa
    if params.aa_sos.shape[0]:
        audio48, aa_state = _biquad_cascade(cfg, params.aa_sos, state.aa,
                                            audio48, precise=True)
    audio48, eq2_state = _biquad_cascade(cfg, params.eq2_sos, state.eq2,
                                         audio48)

    new_state = state._replace(
        interp_carry=interp_carry, eq2=eq2_state, aa=aa_state)
    return audio48, new_state, taps_out


def demod_and_post(cfg: RxConfig, params: RxParams, state: RxState,
                   zf: jnp.ndarray, taps_out: dict | None = None):
    """Demodulation + decimated-domain post-processing, shared between the
    single-chip chain and the sharded pipeline (`parallel.rx_sharded`,
    which computes the front end under `shard_map` with halo exchange and
    hands the decimated analytic signal here).  The front-end fields of
    ``state`` (iqcorr/nco_phase/front_carry) must already be updated by the
    caller.  Returns (audio48, new_state, taps)."""
    audio, state, taps_out = demod_pre_agc(cfg, params, state, zf, taps_out)
    if cfg.n_audio > 1:
        # linked stereo AGC (see init_state): shared detector + gain
        audio, agc_state = agc_mod.run_stereo(params.agc, state.agc,
                                              audio)
    else:
        audio, agc_state = agc_mod.run(params.agc, state.agc, audio)
    state = state._replace(agc=agc_state)
    return post_after_agc(cfg, params, state, audio, taps_out)


class RxChain:
    """Convenience wrapper: one compiled RX chain for a static config,
    batched over a leading channel axis.

    Host I/O is restricted to float32 (the axon TPU relay cannot transfer
    complex64): pass I and Q as separate f32 planes, or a complex array
    which is split host-side.  int16 planes (the codec's native width,
    e.g. `io.ingest.IqIngest(raw_i16=True)`) are also accepted and flow
    to the front kernel unconverted (jit specializes per dtype).
    """

    def __init__(self, cfg: RxConfig):
        self.cfg = cfg
        self.params = make_params(cfg)

        def _as_iq(i_plane, q_plane):
            if i_plane.dtype == jnp.int16:
                return (i_plane, q_plane)
            return jax.lax.complex(i_plane, q_plane)

        def _run(state, i_plane, q_plane):
            return process_block(self.cfg, self.params, state,
                                 _as_iq(i_plane, q_plane))

        self._jit = jax.jit(_run)

        def _run_tuned(state, i_plane, q_plane, tune_offset_hz):
            return process_block(self.cfg, self.params, state,
                                 _as_iq(i_plane, q_plane),
                                 tune_offset_hz=tune_offset_hz)

        # live-retune variant: the dial offset is a traced f32 scalar, so
        # every dial position reuses ONE compiled executable
        self._jit_tuned = jax.jit(_run_tuned)

    def init_state(self, batch_shape=()) -> RxState:
        # created INSIDE jit: eagerly creating complex64/uint32 arrays
        # permanently breaks device->host fetches on the axon relay
        # (ARCHITECTURE.md "axon dtype constraints")
        anchor = jnp.zeros((), jnp.float32)
        return jax.jit(
            lambda d: init_state(self.cfg, self.params, batch_shape))(anchor)

    def __call__(self, state: RxState, iq=None, i=None, q=None,
                 tune_offset_hz=None):
        if iq is not None:
            if np.iscomplexobj(iq):
                i = jnp.asarray(np.ascontiguousarray(np.real(iq), np.float32)) \
                    if isinstance(iq, np.ndarray) else jnp.real(iq)
                q = jnp.asarray(np.ascontiguousarray(np.imag(iq), np.float32)) \
                    if isinstance(iq, np.ndarray) else jnp.imag(iq)
            else:
                raise ValueError("pass complex iq or i=/q= f32 planes")
        if tune_offset_hz is not None:
            return self._jit_tuned(state, i, q,
                                   jnp.float32(tune_offset_hz))
        return self._jit(state, i, q)
