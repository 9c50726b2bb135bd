#!/usr/bin/env python3
"""Import the reference firmware's filter coefficient tables as data.

Parses the UHSDR reference tree's coefficient files
(`drivers/audio/filters/*.c` — plain float arrays, CMSIS instance
structs) and the filter-path registry (`audio_filter.c:147-928`
``FilterPathInfo``) into two committed data artifacts:

  uhsdr_tpu/data/ref_filters.npz   — every coefficient array by name
  uhsdr_tpu/data/ref_paths.json    — the 87-row path table, resolved

These are DATA (published filter designs bound to the GPL firmware's
behavior), imported so the TPU chain can be conformance-checked against
the reference's exact math (VERDICT.md round-1, item 1).  No code is
translated here; the structures parsed are described in SURVEY.md §2.1.

Usage:  python tools/parse_ref_filters.py [--ref /root/reference/mchf-eclipse]
"""
from __future__ import annotations

import argparse
import json
import pathlib
import re
import sys

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
OUT_DIR = REPO / "uhsdr_tpu" / "data"

FLOAT_RE = r"[-+]?(?:\d+\.?\d*|\.\d+)(?:[eE][-+]?\d+)?"


def _strip_if0(text: str) -> str:
    """Remove `#if 0 ... [#else kept] ... #endif` regions (keeps the
    active #else branch)."""
    out = []
    stack = []          # per open #if: emitting?
    for line in text.splitlines(keepends=True):
        s = line.strip()
        if s.startswith("#if"):
            stack.append(not s.startswith("#if 0"))
            continue
        if s.startswith("#else") and stack:
            stack[-1] = not stack[-1]
            continue
        if s.startswith("#endif") and stack:
            stack.pop()
            continue
        if all(stack):
            out.append(line)
    return "".join(out)


def strip_comments(text: str) -> str:
    text = re.sub(r"/\*.*?\*/", " ", text, flags=re.S)
    text = re.sub(r"//[^\n]*", " ", text)
    return text


def parse_defines(text: str) -> dict[str, int]:
    out = {}
    for m in re.finditer(r"#define\s+(\w+)\s+\(?\s*(\d+)\s*\)?", text):
        out[m.group(1)] = int(m.group(2))
    return out


def parse_float_list(body: str) -> np.ndarray:
    vals = re.findall(FLOAT_RE, body)
    return np.array([float(v) for v in vals], dtype=np.float64)


def parse_plain_arrays(text: str) -> dict[str, np.ndarray]:
    """const float NAME[...] = { ... };"""
    out = {}
    for m in re.finditer(
            r"const\s+float(?:32_t)?\s+(\w+)\s*\[[^\]]*\]\s*=\s*\{(.*?)\}\s*;",
            text, flags=re.S):
        out[m.group(1)] = parse_float_list(m.group(2))
    return out


def _find_struct_bodies(text: str, typename: str):
    """Yield (name, body) for `const <typename> NAME = { body };` handling
    nested braces."""
    for m in re.finditer(r"const\s+" + typename + r"\s+(\w+)\s*=\s*\{", text):
        name = m.group(1)
        i = m.end()
        depth = 1
        while depth and i < len(text):
            if text[i] == "{":
                depth += 1
            elif text[i] == "}":
                depth -= 1
            i += 1
        yield name, text[m.end():i - 1]


def _field_array(body: str, field: str) -> np.ndarray | None:
    m = re.search(r"\." + field + r"\s*=\s*\(float\s*\*\)\s*\(const\s+float\s*\[\]\s*\)\s*\{", body)
    if m is None:
        return None
    i = m.end()
    depth = 1
    while depth and i < len(body):
        if body[i] == "{":
            depth += 1
        elif body[i] == "}":
            depth -= 1
        i += 1
    return parse_float_list(body[m.end():i - 1])


def _field_int(body: str, field: str, defines: dict[str, int]) -> int | None:
    m = re.search(r"\." + field + r"\s*=\s*(\w+)", body)
    if m is None:
        return None
    tok = m.group(1)
    return int(tok) if tok.isdigit() else defines.get(tok)


def parse_filter_dir(filters_dir: pathlib.Path):
    arrays: dict[str, np.ndarray] = {}
    instances: dict[str, dict] = {}
    global_defines: dict[str, int] = {}

    files = sorted(filters_dir.glob("*.c")) + sorted(filters_dir.glob("*.h"))
    for f in files:
        global_defines.update(parse_defines(
            strip_comments(f.read_text(errors="replace"))))

    for f in files:
        text = strip_comments(f.read_text(errors="replace"))
        defines = {**global_defines, **parse_defines(text)}
        arrays.update(parse_plain_arrays(text))

        for name, body in _find_struct_bodies(text, r"arm_fir_decimate_instance_f32"):
            coeffs = _field_array(body, "pCoeffs")
            if coeffs is None:
                continue
            instances[name] = {"kind": "fir_decimate",
                               "numTaps": _field_int(body, "numTaps", defines)
                               or len(coeffs)}
            arrays[name + "__pCoeffs"] = coeffs

        for name, body in _find_struct_bodies(text, r"arm_fir_interpolate_instance_f32"):
            coeffs = _field_array(body, "pCoeffs")
            if coeffs is None:
                continue
            instances[name] = {"kind": "fir_interpolate",
                               "phaseLength": _field_int(body, "phaseLength",
                                                         defines)}
            arrays[name + "__pCoeffs"] = coeffs

        for name, body in _find_struct_bodies(text, r"arm_iir_lattice_instance_f32"):
            pk = _field_array(body, "pkCoeffs")
            pv = _field_array(body, "pvCoeffs")
            if pk is None or pv is None:
                continue
            instances[name] = {"kind": "iir_lattice",
                               "numStages": _field_int(body, "numStages",
                                                       defines) or len(pk)}
            arrays[name + "__pk"] = pk
            arrays[name + "__pv"] = pv

    return arrays, instances, global_defines


# --- FilterPathInfo table (audio_filter.c:147-928) --------------------------

MASKS = {
    "FILTER_MASK_CW": ["cw"], "FILTER_MASK_SSB": ["ssb"],
    "FILTER_MASK_AM": ["am"], "FILTER_MASK_FM": ["fm"],
    "FILTER_MASK_SAM": ["sam"],
    "FILTER_MASK_ALL": ["cw", "ssb", "am", "fm"],
    "FILTER_MASK_NOFM": ["cw", "ssb", "am"],
    "FILTER_MASK_SSBAM": ["ssb", "am"],
    "FILTER_MASK_SSBAMCW": ["ssb", "am", "cw"],
    "FILTER_MASK_SSBSAM": ["ssb", "am", "sam"],
    "FILTER_MASK_SSBSAMCW": ["ssb", "am", "sam", "cw"],
    "FILTER_MASK_AMSAM": ["am", "sam"],
    "FILTER_MASK_SSBCW": ["ssb", "cw"],
    "FILTER_MASK_AMFM": ["am", "fm"],
    "FILTER_MASK_NONE": [],
    "FILTER_MASK_SSBAMFM": ["ssb", "am", "fm"],
}

RATES = {"RX_DECIMATION_RATE_8KHZ": 6, "RX_DECIMATION_RATE_12KHZ": 4,
         "RX_DECIMATION_RATE_24KHZ": 2, "RX_DECIMATION_RATE_48KHZ": 1}


def parse_filter_paths(audio_filter_c: pathlib.Path, defines: dict[str, int]):
    raw = audio_filter_c.read_text(errors="replace")
    # resolve the small-filter macro before stripping (filter list uses
    # FIR_RX_DECIMATE_PTR; non-F4 default is the 199.. er, 83-tap
    # sideband-suppression decimator, audio_filter.c:138-145)
    raw = raw.replace("FIR_RX_DECIMATE_PTR", "&FirRxDecimate_sideband_supp")
    text = strip_comments(raw)
    m = re.search(r"FilterPathInfo\s*\[[^\]]*\]\s*=\s*\{", text)
    if not m:
        raise RuntimeError("FilterPathInfo not found")
    i = m.end()
    depth = 1
    start = i
    while depth:
        if text[i] == "{":
            depth += 1
        elif text[i] == "}":
            depth -= 1
        i += 1
    body = text[start:i - 1]

    rows = []
    for rm in re.finditer(r"\{(.*?)\}", body, flags=re.S):
        fields = [f.strip() for f in rm.group(1).split(",")]
        if len(fields) != 13:
            raise RuntimeError(f"path row with {len(fields)} fields: {fields}")
        (fid, name, mask, sel, ntaps, fir_i, fir_q, dec, rate, pre, interp,
         aa, offset) = fields

        def deref(tok):
            tok = tok.lstrip("&").strip()
            return None if tok == "NULL" else tok

        rows.append({
            "bw_id": fid,
            "name": name.strip('"'),
            "modes": MASKS[mask],
            "select_id": int(sel),
            "fir_numtaps": int(ntaps) if ntaps.isdigit() else defines.get(ntaps),
            "fir_i": deref(fir_i),
            "fir_q": deref(fir_q),
            "dec": deref(dec),
            "decim": RATES.get(rate, 1),  # AUDIO_OFF dummy row carries 0
            "pre": deref(pre),
            "interpolate": deref(interp),
            "antialias": deref(aa),
            "offset_hz": int(offset),
        })
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default="/root/reference/mchf-eclipse")
    args = ap.parse_args()
    ref = pathlib.Path(args.ref)
    filters_dir = ref / "drivers" / "audio" / "filters"

    arrays, instances, defines = parse_filter_dir(filters_dir)
    paths = parse_filter_paths(ref / "drivers" / "audio" / "audio_filter.c",
                               defines)

    # sanity: every symbol a path row references must have been parsed
    missing = set()
    for row in paths:
        for key, suffix in (("fir_i", ""), ("fir_q", ""),
                            ("dec", "__pCoeffs"), ("pre", "__pk"),
                            ("interpolate", "__pCoeffs"), ("antialias", "__pk")):
            sym = row[key]
            if sym is not None and sym + suffix not in arrays:
                missing.add(sym + suffix)
        if row["fir_numtaps"] is None and row["fir_i"] is not None:
            raise RuntimeError(f"unresolved tap count in row {row}")
    if missing:
        raise RuntimeError(f"unresolved symbols: {sorted(missing)}")

    # tap-count sanity vs filters.h constants
    for row in paths:
        if row["fir_i"] is None:
            continue
        fir_i = arrays[row["fir_i"]]
        if len(fir_i) < row["fir_numtaps"]:
            raise RuntimeError(
                f"{row['fir_i']} has {len(fir_i)} taps < {row['fir_numtaps']}")

    # --- TX Hilbert pair (iq_tx_wide, filters/iq_tx_filter.c) ---
    # the file carries obsolete variants inside `#if 0` blocks; the ACTIVE
    # descriptor is the `#else` branch (fir 201-tap wide pair,
    # `AudioFilter_SetTxHilbertFIR` audio_filter.c:1230-1249 always
    # selects iq_tx_wide)
    tx_text = (filters_dir / "iq_tx_filter.c").read_text()
    tx_text = _strip_if0(tx_text)
    m = re.search(r"iq_tx_wide\s*=\s*\{(.*?)\n\s*\};", tx_text, re.S)
    if not m:
        raise RuntimeError("iq_tx_wide not found")
    body = m.group(1)
    mi = re.search(r"\.i\s*=\s*\(const float32_t\[\]\)\s*\{(.*?)\}",
                   body, re.S)
    mq = re.search(r"\.q\s*=\s*\(const float32_t\[\]\)\s*\{(.*?)\}",
                   body, re.S)
    arrays["iq_tx_wide_i"] = parse_float_list(mi.group(1))
    arrays["iq_tx_wide_q"] = parse_float_list(mq.group(1))
    assert len(arrays["iq_tx_wide_i"]) == len(arrays["iq_tx_wide_q"]) == 201, (
        len(arrays["iq_tx_wide_i"]), len(arrays["iq_tx_wide_q"]))

    # --- soft DDS sine table (softdds/dds_table.c, int16 full wave) —
    # the FM TX phase-accumulator modulator indexes it directly
    # (tx_processor.c:575-588)
    dds_text = strip_comments(
        (ref / "drivers" / "audio" / "softdds" / "dds_table.c").read_text())
    m = re.search(r"DDS_TABLE\[DDS_TBL_SIZE\]\s*=\s*\{(.*?)\};",
                  dds_text, re.S)
    vals = [int(v) for v in re.findall(r"-?\d+", m.group(1))]
    assert len(vals) == 1024, len(vals)
    arrays["dds_table"] = np.array(vals, np.float64)

    # --- Codec2 NLP pitch-estimator decimation FIR (drivers/freedv/
    # nlp.c:72, 48 taps) — the 1300-mode encoder's pitch front end
    nlp_text = strip_comments(
        (ref / "drivers" / "freedv" / "nlp.c").read_text())
    m = re.search(r"nlp_fir\[\]\s*=\s*\{(.*?)\};", nlp_text, re.S)
    arrays["nlp_fir"] = parse_float_list(m.group(1))
    assert len(arrays["nlp_fir"]) == 48, len(arrays["nlp_fir"])

    OUT_DIR.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(OUT_DIR / "ref_filters.npz",
                        **{k: v.astype(np.float64) for k, v in arrays.items()})
    meta = {"instances": instances,
            "defines": {k: v for k, v in defines.items()
                        if k.startswith(("IQ_", "RX_"))},
            "paths": paths}
    (OUT_DIR / "ref_paths.json").write_text(json.dumps(meta, indent=1))
    print(f"parsed {len(arrays)} arrays, {len(instances)} instances, "
          f"{len(paths)} filter paths -> {OUT_DIR}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
