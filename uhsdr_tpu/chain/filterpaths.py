"""Filter-path registry — the reference's 87-row `FilterPathInfo` table
(`audio_filter.c:147-928`, struct `audio_filter.h:108-140`) rebuilt as a
generated, semantic registry.

The reference's table rows each bind: a bandwidth ID (31 values 300 Hz..10 kHz,
`FilterInfo` `audio_filter.c:47-80`), display name, mode applicability mask,
Hilbert/decimation FIR coefficient set, decimated sample rate (12/24/48 kHz),
an IIR-lattice audio bandpass ("PreFilter") whose band is encoded in its
name, an interpolator, and the path's audio center frequency ("offset").

Here each path carries *specs*, and the actual coefficient sets are designed
on demand (`ops.design`):
  * RX front filter: complex analytic bandpass (replaces Hilbert pair +
    sideband combine) whose band covers the path's audio band on the
    selected sideband; for AM/SAM a symmetric lowpass of the IQ bandwidth.
  * decimation anti-alias is folded into the same complex FIR.
  * audio bandpass: elliptic SOS with the path's [lo, hi] edges (replaces
    the arm_iir_lattice pk/pv tables).
"""
from __future__ import annotations

import functools
from dataclasses import dataclass
from enum import IntFlag

import numpy as np

IQ_RATE = 48000.0

# bandwidth catalogue: (key, name, width_hz) — FilterInfo semantics
FILTER_INFO = [
    ("300HZ", "300Hz", 300), ("500HZ", "500Hz", 500), ("1P4KHZ", "1.4k", 1400),
    ("1P6KHZ", "1.6k", 1600), ("1P8KHZ", "1.8k", 1800), ("2P1KHZ", "2.1k", 2100),
    ("2P3KHZ", "2.3k", 2300), ("2P5KHZ", "2.5k", 2500), ("2P7KHZ", "2.7k", 2700),
    ("2P9KHZ", "2.9k", 2900), ("3P2KHZ", "3.2k", 3200), ("3P4KHZ", "3.4k", 3400),
    ("3P6KHZ", "3.6k", 3600), ("3P8KHZ", "3.8k", 3800), ("4P0KHZ", "4.0k", 4000),
    ("4P2KHZ", "4.2k", 4200), ("4P4KHZ", "4.4k", 4400), ("4P6KHZ", "4.6k", 4600),
    ("4P8KHZ", "4.8k", 4800), ("5P0KHZ", "5.0k", 5000), ("5P5KHZ", "5.5k", 5500),
    ("6P0KHZ", "6.0k", 6000), ("6P5KHZ", "6.5k", 6500), ("7P0KHZ", "7.0k", 7000),
    ("7P5KHZ", "7.5k", 7500), ("8P0KHZ", "8.0k", 8000), ("8P5KHZ", "8.5k", 8500),
    ("9P0KHZ", "9.0k", 9000), ("9P5KHZ", "9.5k", 9500), ("10P0KHZ", "10.0k", 10000),
]
WIDTH = {k: w for k, _, w in FILTER_INFO}


class ModeMask(IntFlag):
    NONE = 0
    CW = 1
    SSB = 2
    AM = 4
    FM = 8
    SAM = 16
    SSBCW = SSB | CW
    AMSAM = AM | SAM


@dataclass(frozen=True)
class FilterPath:
    index: int
    bw_key: str           # bandwidth ID, e.g. "2P3KHZ"
    name: str             # sub-path display name, e.g. "1.4k" / "LPF" / "BPF"
    modes: ModeMask
    decim: int            # 1 (48k), 2 (24k), 4 (12k)
    offset: float         # audio center frequency (Hz)

    @property
    def width(self) -> float:
        return float(WIDTH[self.bw_key])

    @property
    def fs_dec(self) -> float:
        return IQ_RATE / self.decim

    @property
    def audio_band(self) -> tuple[float, float]:
        """[lo, hi] audio band edges of the path's bandpass."""
        lo = self.offset - self.width / 2
        hi = self.offset + self.width / 2
        return (max(lo, 0.0), hi)


def _ssbcw_rows():
    """SSB/CW rows mirroring the reference's sub-path layout:
    (bw_key, [(name, offset), ...]) per `audio_filter.c:190-700`."""
    return [
        ("300HZ", ModeMask.SSBCW, 4, [("500Hz", 500), ("550Hz", 550),
         ("600Hz", 600), ("650Hz", 650), ("700Hz", 700), ("750Hz", 750),
         ("800Hz", 800), ("850Hz", 850), ("900Hz", 900), ("950Hz", 950)]),
        ("500HZ", ModeMask.SSBCW, 4, [("550Hz", 550), ("650Hz", 650),
         ("750Hz", 750), ("850Hz", 850), ("950Hz", 950)]),
        ("1P4KHZ", ModeMask.SSBCW, 4, [("LPF", 700), ("BPF", 775)]),
        ("1P6KHZ", ModeMask.SSBCW, 4, [("LPF", 800), ("BPF", 875)]),
        ("1P8KHZ", ModeMask.SSBCW, 4, [("1.1k", 1125), ("1.3k", 1275),
         ("1.4k", 1425), ("1.6k", 1575), ("1.7k", 1725), ("LPF", 900)]),
        ("2P1KHZ", ModeMask.SSBCW, 4, [("LPF", 1050), ("BPF", 1125)]),
        ("2P3KHZ", ModeMask.SSBCW, 4, [("1.3k", 1275), ("1.4k", 1412),
         ("1.6k", 1562), ("1.7k", 1712), ("LPF", 1150)]),
        ("2P5KHZ", ModeMask.SSB, 4, [("LPF", 1250), ("BPF", 1325)]),
        ("2P7KHZ", ModeMask.SSB, 4, [("LPF", 1350), ("BPF", 1425)]),
        ("2P9KHZ", ModeMask.SSB, 4, [("LPF", 1450), ("BPF", 1525)]),
        ("3P2KHZ", ModeMask.SSB, 4, [("LPF", 1600), ("BPF", 1675)]),
        ("3P4KHZ", ModeMask.SSB, 4, [("LPF", 1700), ("BPF", 1775)]),
        ("3P6KHZ", ModeMask.SSB, 4, [("LPF", 1800), ("BPF", 1875)]),
        ("3P8KHZ", ModeMask.SSB, 4, [("LPF", 1900), ("BPF", 1975)]),
        ("4P0KHZ", ModeMask.SSB, 4, [("LPF", 2000)]),
        ("4P2KHZ", ModeMask.SSB, 4, [("LPF", 2100)]),
        ("4P4KHZ", ModeMask.SSB, 4, [("LPF", 2200)]),
        ("4P6KHZ", ModeMask.SSB, 4, [("LPF", 2300)]),
        ("4P8KHZ", ModeMask.SSB, 4, [("LPF", 2400)]),
        ("5P0KHZ", ModeMask.SSB, 2, [("LPF", 2500)]),
        ("5P5KHZ", ModeMask.SSB, 2, [("LPF", 2750)]),
        ("6P0KHZ", ModeMask.SSB, 2, [("LPF", 3000)]),
        ("6P5KHZ", ModeMask.SSB, 2, [("LPF", 3250)]),
        ("7P0KHZ", ModeMask.SSB, 2, [("LPF", 3500)]),
        ("7P5KHZ", ModeMask.SSB, 2, [("LPF", 3750)]),
        ("8P0KHZ", ModeMask.SSB, 2, [("LPF", 4000)]),
        ("8P5KHZ", ModeMask.SSB, 2, [("LPF", 4250)]),
        ("9P0KHZ", ModeMask.SSB, 2, [("LPF", 4500)]),
        ("9P5KHZ", ModeMask.SSB, 2, [("LPF", 4750)]),
        ("10P0KHZ", ModeMask.SSB, 2, [("LPF", 5000)]),
    ]


def _amsam_rows():
    """AM/SAM rows (`audio_filter.c:704-880`)."""
    rows = [("1P4KHZ", 4, 700), ("1P6KHZ", 4, 800), ("1P8KHZ", 4, 900),
            ("2P1KHZ", 4, 1050), ("2P3KHZ", 4, 1150), ("2P5KHZ", 4, 1250),
            ("2P7KHZ", 4, 1350), ("2P9KHZ", 4, 1450), ("3P2KHZ", 4, 1600),
            ("3P4KHZ", 4, 1700), ("3P6KHZ", 4, 1800), ("3P8KHZ", 4, 1900),
            ("4P0KHZ", 4, 2000), ("4P2KHZ", 4, 2100), ("4P4KHZ", 4, 2200),
            ("4P6KHZ", 4, 2300), ("4P8KHZ", 4, 2400), ("5P0KHZ", 2, 2500),
            ("6P0KHZ", 2, 3000), ("7P5KHZ", 2, 3750), ("10P0KHZ", 2, 5000)]
    return [(bw, ModeMask.AMSAM, dec, [("AM/SAM", off)]) for bw, dec, off in rows]


def _fm_rows():
    return [("3P6KHZ", ModeMask.FM, 1, [("FM", 0)]),
            ("5P0KHZ", ModeMask.FM, 1, [("FM", 0)]),
            ("6P0KHZ", ModeMask.FM, 1, [("FM", 0)])]


@functools.lru_cache(maxsize=1)
def all_paths() -> tuple[FilterPath, ...]:
    paths = []
    idx = 0
    for group in (_fm_rows(), _ssbcw_rows(), _amsam_rows()):
        for bw_key, mask, decim, subs in group:
            for name, offset in subs:
                paths.append(FilterPath(index=idx, bw_key=bw_key, name=name,
                                        modes=mask, decim=decim,
                                        offset=float(offset)))
                idx += 1
    return tuple(paths)


def paths_for_mode(mode: str) -> list[FilterPath]:
    mask = {"cw": ModeMask.CW, "usb": ModeMask.SSB, "lsb": ModeMask.SSB,
            "am": ModeMask.AM, "sam": ModeMask.SAM, "fm": ModeMask.FM,
            "digi": ModeMask.SSB,
            # two-channel audio modes (USE_TWO_CHANNEL_AUDIO): SSBSTEREO
            # rides the SSB paths, IQ passthrough the symmetric AM paths
            "ssbstereo": ModeMask.SSB, "iq": ModeMask.AM}[mode]
    return [p for p in all_paths() if p.modes & mask]


def find_path(mode: str, bw_key: str, name: str | None = None) -> FilterPath:
    cands = [p for p in paths_for_mode(mode) if p.bw_key == bw_key
             and (name is None or p.name == name)]
    if not cands:
        raise KeyError(f"no path for mode={mode} bw={bw_key} name={name}")
    return cands[0]
