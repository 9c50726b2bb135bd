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

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from uhsdr_tpu.chain import rx
    from uhsdr_tpu.parallel import fleet

    M = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    steps = int(os.environ.get("BENCH_STEPS", "3"))
    inner = int(os.environ.get("BENCH_INNER", "8"))

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

    # BARRIER-VERIFIED (see bench.py): one fetched f32 reduction forces
    # every chained step.  The whole wideband pipeline — channelizer bank
    # + every chain group — runs `inner` chained blocks inside ONE jit
    # (states thread block-to-block, per-block audio reductions live in
    # the carry), amortizing the ~2.3 ms/dispatch relay overhead.
    import functools

    slices = [(int(g.channel_idx[0]), int(g.channel_idx[-1]) + 1)
              for g in wf.groups]
    chains = [g.chain for g in wf.groups]

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(states, i_w, q_w):
        def body(_, carry):
            (bank_st, gsts), acc = carry
            x = jax.lax.complex(i_w, q_w)
            y, bank_st2 = wf.bank(bank_st, x)        # (M, T) complex64
            gsts2 = []
            for ch, (lo, hi), gst in zip(chains, slices, gsts):
                audio, gst2, _ = rx.process_block(
                    ch.cfg, ch.params, gst, y[lo:hi])
                gsts2.append(gst2)
                acc = acc + jnp.mean(jnp.abs(audio))
            return (bank_st2, gsts2), acc

        (bank_st2, gsts2), acc = jax.lax.fori_loop(
            0, inner, body, (states, jnp.float32(0.0)))
        return (bank_st2, gsts2), acc

    probe = jax.jit(lambda a: jnp.mean(jnp.abs(a)) * jnp.ones((4,),
                                                              jnp.float32))
    states = (wf.bank_state, [g.state for g in wf.groups])
    states, acc0 = step(states, i_wide, q_wide)     # compile + warm
    np.asarray(probe(acc0))
    t0 = time.perf_counter()
    acc = 0.0
    for _ in range(steps):
        states, acc_d = step(states, i_wide, q_wide)
    acc = float(np.asarray(probe(acc_d))[0])
    dt = time.perf_counter() - t0
    assert np.isfinite(acc)

    wide_msps = B * steps * inner / dt / 1e6
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
