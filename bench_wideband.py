"""Wideband front-end benchmark: ONE wideband IQ stream -> polyphase
channelizer (`ops/channelizer.AnalysisPfb`) -> mixed-mode fleet, all
on-device.  This is the realistic shape of the BASELINE "10k channels"
deployment: the input is fs_wide = M * 48 kHz of spectrum, not M
separate streams.

Prints one JSON line with the aggregate wideband rate.  Usage:
    python bench_wideband.py [M_CHANNELS] [BLOCK_PER_CHANNEL]
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from uhsdr_tpu.chain import rx
    from uhsdr_tpu.parallel import fleet

    M = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    steps = int(os.environ.get("BENCH_STEPS", "6"))

    # 2/3 SSB + 1/3 AM fleet behind one M-channel bank
    n_usb = (2 * M) // 3
    configs = [
        rx.RxConfig(mode="usb", bw_key="2P3KHZ", path_name="LPF",
                    translate_hz=6000.0, block_len=T),
        rx.RxConfig(mode="am", bw_key="5P0KHZ", path_name="AM/SAM",
                    translate_hz=6000.0, block_len=T),
    ]
    wf = fleet.WidebandFleet(configs, [n_usb, M - n_usb])

    B = wf.wideband_block
    rng = np.random.default_rng(0)
    i_wide = jax.device_put(rng.standard_normal(B).astype(np.float32) * 0.1)
    q_wide = jax.device_put(rng.standard_normal(B).astype(np.float32) * 0.1)

    # BARRIER-VERIFIED (see bench.py): fetch a small reduction each step
    probe = jax.jit(lambda a: jnp.mean(jnp.abs(a)) * jnp.ones((4,),
                                                              jnp.float32))

    def run_step():
        outs = wf.process_block_device(i_wide, q_wide)
        return float(np.asarray(probe(outs[-1]))[0])

    run_step()          # compile
    t0 = time.perf_counter()
    acc = 0.0
    for _ in range(steps):
        acc += run_step()
    dt = time.perf_counter() - t0

    wide_msps = B * steps / dt / 1e6
    print(json.dumps({
        "metric": "wideband_channelizer_fleet_Msamples_per_s_per_chip",
        "value": round(wide_msps, 1),
        "unit": "Msamples/s/chip (wideband IQ)",
        "n_channels": M,
        "block_per_channel": T,
        "vs_baseline": round(wide_msps / 0.048, 1),
        "acc": acc,
    }))


if __name__ == "__main__":
    main()
