#!/usr/bin/env python3
"""Import the reference's 144-row config registry as data
(VERDICT round-1 item 5).

Parses `drivers/ui/ui_configuration.c` `ConfigEntryInfo[]` (rows 61-282
including the macro-generated per-band TX power-factor and IQ-balance
rows), resolves the EEPROM ids from `ui_configuration.h` and the
default/min/max macro tokens from the reference headers, and writes
`uhsdr_tpu/data/ref_config.json`.

Build defines honored: USE_LMS_AUTONOTCH on; OBSOLETE_AGC / OBSOLETE_NR
off (the firmware's default F7/H7 configuration, uhsdr_board_config.h).
"""
from __future__ import annotations

import json
import pathlib
import re
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
REF = pathlib.Path(sys.argv[1] if len(sys.argv) > 1
                   else "/root/reference/mchf-eclipse")

ACTIVE_DEFINES = {"USE_LMS_AUTONOTCH"}
INACTIVE = {"OBSOLETE_AGC", "OBSOLETE_NR"}


def strip_comments(text: str) -> str:
    text = re.sub(r"/\*.*?\*/", " ", text, flags=re.S)
    text = re.sub(r"//[^\n]*", " ", text)
    return text


def apply_ifdefs(text: str) -> str:
    """Minimal #ifdef filter for the table region."""
    out = []
    stack = [True]
    for line in text.splitlines():
        ls = line.strip()
        if ls.startswith("#ifdef"):
            sym = ls.split()[1] if len(ls.split()) > 1 else ""
            stack.append(stack[-1] and sym in ACTIVE_DEFINES)
        elif ls.startswith("#ifndef"):
            sym = ls.split()[1] if len(ls.split()) > 1 else ""
            stack.append(stack[-1] and sym not in ACTIVE_DEFINES)
        elif ls.startswith("#if "):          # #if <expr>: pass through
            stack.append(stack[-1])
        elif ls.startswith("#else"):
            if len(stack) > 1:
                stack[-1] = (not stack[-1]) and stack[-2]
        elif ls.startswith("#endif"):
            if len(stack) > 1:
                stack.pop()
        elif stack[-1]:
            out.append(line)
    return "\n".join(out)


def collect_numeric_defines() -> dict[str, str]:
    """NAME -> replacement-text for simple #defines across the reference
    driver headers (values resolved recursively later)."""
    defs: dict[str, str] = {}
    pats = (list((REF / "drivers").rglob("*.h"))
            + list((REF / "hardware").rglob("*.h"))
            + list((REF / "misc").rglob("*.h"))
            + list((REF / "src").rglob("*.h"))
            + [REF / "drivers/ui/radio_management.c"])
    for f in pats:
        try:
            text = strip_comments(f.read_text(errors="replace"))
        except OSError:
            continue
        for m in re.finditer(
                r"#define\s+([A-Za-z_]\w*)\s+([^\n]+)", text):
            name, val = m.group(1), m.group(2).strip()
            if "(" in name or not val or val.startswith("\\"):
                continue
            defs.setdefault(name, val)
    return defs


ENUM_RE = re.compile(r"enum\s*\w*\s*\{([^}]*)\}", re.S)
TYPEDEF_ENUM_RE = re.compile(r"typedef\s+enum\s*\w*\s*\{([^}]*)\}", re.S)


def parse_enums() -> dict[str, object]:
    """Enum member -> int value, or expression string for members whose
    initializer is symbolic (resolved later by Resolver)."""
    vals: dict[str, object] = {}
    files = (list((REF / "drivers").rglob("*.h"))
             + list((REF / "hardware").rglob("*.h"))
             + list((REF / "misc").rglob("*.h"))
             + list((REF / "src").rglob("*.h")))
    for f in files:
        try:
            text = strip_comments(f.read_text(errors="replace"))
        except OSError:
            continue
        for m in list(ENUM_RE.finditer(text)) + \
                list(TYPEDEF_ENUM_RE.finditer(text)):
            body = m.group(1)
            cur: object = 0
            for item in body.split(","):
                item = item.strip()
                if not item:
                    continue
                if "=" in item:
                    name, _, expr = item.partition("=")
                    name = name.strip()
                    expr = expr.strip()
                    try:
                        cur = int(expr, 0)
                    except ValueError:
                        cur = expr            # symbolic; resolve later
                else:
                    name = item
                if not re.fullmatch(r"[A-Za-z_]\w*", name):
                    cur = cur + 1 if isinstance(cur, int) else None
                    continue
                if cur is not None:
                    vals.setdefault(name, cur)
                cur = (cur + 1 if isinstance(cur, int)
                       else (f"({cur})+1" if isinstance(cur, str) else None))
    return vals


class Resolver:
    def __init__(self):
        self.defines = collect_numeric_defines()
        self.enums = parse_enums()
        self.builtin = {
            "INT32_MIN": -2**31, "INT32_MAX": 2**31 - 1,
            "UINT16_MAX": 65535, "UINT8_MAX": 255,
        }
        self._cache: dict[str, object] = {}

    def resolve(self, tok: str, depth: int = 0):
        tok = tok.strip()
        if tok in self._cache:
            return self._cache[tok]
        v = self._resolve(tok, depth)
        self._cache[tok] = v
        return v

    def _resolve(self, tok: str, depth: int = 0):
        tok = tok.strip()
        if depth > 12 or not tok:
            return None
        try:
            return int(tok, 0)
        except ValueError:
            pass
        try:
            return float(tok)
        except ValueError:
            pass
        if tok in self.builtin:
            return self.builtin[tok]
        if tok in self.enums:
            v = self.enums[tok]
            return v if isinstance(v, (int, float)) else \
                self._resolve(v, depth + 1)
        if tok in self.defines:
            return self.resolve(self.defines[tok], depth + 1)
        # CONFIG_UINT8x2_COMBINE(a, b) = a | (b << 8) (uhsdr_types.h)
        m = re.fullmatch(r"CONFIG_UINT8x2_COMBINE\s*\((.*),(.*)\)", tok)
        if m:
            a = self.resolve(m.group(1), depth + 1)
            b = self.resolve(m.group(2), depth + 1)
            return None if a is None or b is None else (a | (b << 8))
        # simple arithmetic expressions over known symbols
        expr = tok
        for sym in sorted(set(re.findall(r"\b[A-Za-z_]\w*", expr)),
                          key=len, reverse=True):
            v = self.resolve(sym, depth + 1)
            if v is None:
                return None
            expr = re.sub(r"\b" + re.escape(sym) + r"\b", str(v), expr)
        expr = expr.replace("/", "//") if "." not in expr else expr
        try:
            return eval(expr, {"__builtins__": {}}, {})  # noqa: S307
        except Exception:
            return None


def expand_macros(body: str) -> str:
    """Expand the table's local function-like macros (UI_C_*)."""
    # join continuation lines first, then macros are single-line
    body = body.replace("\\\n", " ")
    macros = {}
    def_lines = []
    for line in body.splitlines():
        m = re.match(r"\s*#define\s+(UI_C_\w+)\(([^)]*)\)\s+(.*)", line)
        if m:
            macros[m.group(1)] = (
                [p.strip() for p in m.group(2).split(",")], m.group(3))
        else:
            def_lines.append(line)
    body = "\n".join(def_lines)

    def repl(m):
        name = m.group(1)
        args = [a.strip() for a in m.group(2).split(",")]
        if name not in macros:
            return m.group(0)
        params, mbody = macros[name]
        out = mbody
        for p, a in zip(params, args):
            out = re.sub(r"##\s*" + re.escape(p) + r"\s*##", a, out)
            out = re.sub(r"##\s*" + re.escape(p) + r"\b", a, out)
            out = re.sub(r"\b" + re.escape(p) + r"\s*##", a, out)
            out = re.sub(r"\b" + re.escape(p) + r"\b", a, out)
        return out

    prev = None
    while prev != body:
        prev = body
        body = re.sub(r"\b(UI_C_\w+)\(([^)]*)\)", repl, body)
    return body


def main():
    raw = (REF / "drivers/ui/ui_configuration.c").read_text(errors="replace")
    # everything up to the table's end: the UI_C_EEPROM_BAND_*_PF macros
    # are defined near the top of the file (line 46-47), the UI_C_*_IQ_ADJ
    # ones inline; the row regex only matches ConfigEntry rows
    end = raw.index("ConfigEntry_Stop")
    chunk = raw[:end]
    chunk = apply_ifdefs(chunk)
    chunk = expand_macros(chunk)
    chunk = strip_comments(chunk)

    res = Resolver()

    # EEPROM ids from the header
    hdr = strip_comments(
        (REF / "drivers/ui/ui_configuration.h").read_text(errors="replace"))
    ee_ids = {}
    for m in re.finditer(r"#define\s+(EEPROM_\w+)\s+(\d+)", hdr):
        ee_ids[m.group(1)] = int(m.group(2))

    # rows the generic field-splitter/resolver cannot handle (nested
    # parens in CONFIG_UINT8x2_COMBINE; values defined in board code):
    FALLBACKS = {
        "EEPROM_SMETER_ALPHAS": {   # audio_driver.h:293-296
            "default": 50 | (5 << 8), "min": 1 | (1 << 8),
            "max": 100 | (100 << 8)},
        "EEPROM_RTC_CALIB": {"max": 488},   # uhsdr_rtc.h RTC_CALIB_PPM_MAX
        "EEPROM_CW_DECODER_BLOCKSIZE": {"min": 8},  # cw_decoder.h:11
    }

    rows = []
    unresolved = []
    for m in re.finditer(
            r"\{\s*(ConfigEntry_\w+(?:\s*\|\s*\w+)?)\s*,\s*(EEPROM_\w+)\s*,"
            r"\s*&([^,]+),([^,]+),([^,]+),([^}]+)\}", chunk):
        typ, ee, target, dflt, mn, mx = (g.strip() for g in m.groups())
        row = {
            "type": typ.split("|")[0].strip(),
            "calib": "Calib_Val" in typ,
            "eeprom_name": ee,
            "eeprom_id": ee_ids.get(ee),
            "target": target.strip(),
            "default_tok": dflt, "min_tok": mn, "max_tok": mx,
            "default": res.resolve(dflt),
            "min": res.resolve(mn),
            "max": res.resolve(mx),
        }
        fb = FALLBACKS.get(ee, {})
        for k in ("default", "min", "max"):
            if row[k] is None and k in fb:
                row[k] = fb[k]
            if row[k] is None:
                unresolved.append((ee, row[k + "_tok"]))
        rows.append(row)

    # band/VFO memory block (ui_configuration.c:920-923): per band i and
    # VFO A/B a mode word and a 32-bit dial frequency
    band_mem = {
        "num_bands": res.resolve("MAX_BAND_NUM") or 17,
        "ids": {k: ee_ids[k] for k in (
            "EEPROM_BAND0_MODE_A", "EEPROM_BAND0_FREQ_HIGH_A",
            "EEPROM_BAND0_FREQ_LOW_A", "EEPROM_BAND0_MODE_B",
            "EEPROM_BAND0_FREQ_HIGH_B", "EEPROM_BAND0_FREQ_LOW_B")
            if k in ee_ids},
    }

    out = {"rows": rows, "band_memory": band_mem,
           "unresolved": [u[0] for u in unresolved]}
    (REPO / "uhsdr_tpu/data/ref_config.json").write_text(
        json.dumps(out, indent=1))
    n_missing = sum(1 for r in rows
                    for k in ("default", "min", "max") if r[k] is None)
    print(f"{len(rows)} rows ({n_missing} unresolved values across "
          f"{len(set(u for u in out['unresolved']))} rows); "
          f"band mem ids: {band_mem['ids']}")


if __name__ == "__main__":
    main()
