"""Benchmark: IQ Msamples/s/chip through the full SSB RX chain.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline (BASELINE.md): the reference firmware sustains 0.048 complex
Msamples/s per chip (48 kHz x 1 channel, the hard real-time contract of
the STM32 ISR chain).  vs_baseline = our Msamples/s / 0.048.

MEASUREMENT HONESTY (axon relay): `jax.block_until_ready` is NOT an
execution barrier on the axon backend — dispatches are acknowledged
before the chip runs them, so loop-and-block timing measures dispatch
rate (we observed 2500x inflation).  The ONLY reliable barrier is a
device->host fetch of a value data-dependent on the result.  Two rules:
  * all chain state must be created INSIDE jit — eagerly creating any
    non-f32 array (complex64/uint32 zeros) permanently breaks every
    subsequent fetch in the process (relay bug);
  * each timed iteration ends with a fetch of a small f32 reduction of
    the final state/audio, which transitively forces every step.
  * dispatch itself costs ~2.3 ms per jit call through the relay
    (measured: a jitted (8,8) add times at 2.3 ms/call) — pure host/
    transport overhead a production TPU host does not pay per block.
    The timed step therefore chains BENCH_INNER blocks inside ONE jit
    (state threads block-to-block, exactly the streaming deployment
    model), with a per-block |audio| reduction accumulated in the loop
    carry so no block's audio path is dead code — every block is fully
    computed and the relay overhead amortizes to ~0.3 ms/block.
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

REF_MSAMPLES_PER_CHIP = 0.048   # 48 kHz, 1 channel, 1x real time


def main() -> None:
    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from uhsdr_tpu.chain import rx

    channels = int(os.environ.get("BENCH_CHANNELS", "8192"))
    block = int(os.environ.get("BENCH_BLOCK", "16384"))
    # pinned steps/warmup (VERDICT r1 weak #3): 3 timed dispatches of
    # BENCH_INNER chained blocks each (24 blocks total) after 2 warm
    # dispatches; the inner chaining amortizes the ~2.3 ms/dispatch
    # relay overhead (see module docstring)
    steps = int(os.environ.get("BENCH_STEPS", "3"))
    warm = int(os.environ.get("BENCH_WARM", "2"))
    # residual-dispatch amortization ladder (r5, quiet host): inner
    # 16 -> 25,827, 32 -> 27,085, 64 -> 27,949, 128 -> 28,453 Ms/s —
    # the per-dispatch relay overhead keeps paying down; 64 ships as
    # the default (one dispatch = ~0.3 s of chained compute; per-block
    # math identical at every inner, fori body traced once)
    inner = int(os.environ.get("BENCH_INNER", "64"))
    # BASELINE flagship config: 96 kHz IQ (the north-star scale target is
    # "10k simultaneous SSB channels @96 kHz"); decimation scales so the
    # decimated audio rate matches the reference paths
    iq_rate = float(os.environ.get("BENCH_IQ_RATE", "96000"))
    # MXU pass precision for the front tap matmuls (the VERDICT r3
    # item-5 ladder: default = one bf16 pass; highest = multi-pass f32)
    front_prec = os.environ.get("BENCH_FRONT_PREC", "default")
    # ingest sample width: int16 = the reference codec's native ADC
    # width (audio_driver.c ISR frames; runtime/iq_ingest.cpp ring) —
    # the front kernel reads the i16 block directly, HALVING the
    # chain's dominant HBM input term; f32 = pre-converted planes
    in_dtype = os.environ.get("BENCH_IN_DTYPE", "int16")

    # BENCH_NR=1: the spectral-NR-enabled chain (auto-escalates the
    # front to multi-pass f32 — see RxConfig.effective_front_prec; the
    # r5 artifact row for the NR-on throughput at the precision that
    # actually holds the conformance bound)
    nr_on = os.environ.get("BENCH_NR") == "1"
    cfg = rx.RxConfig(mode="usb", bw_key="2P3KHZ", path_name="LPF",
                      translate_hz=12000.0, block_len=block,
                      iq_rate=iq_rate, front_prec=front_prec,
                      nr_enable=nr_on)
    params = rx.make_params(cfg)

    # state created INSIDE jit (anchored on a dummy f32 arg): eager
    # complex64/uint32 creation would poison all later fetches
    anchor = jax.device_put(np.zeros((), np.float32))
    mkstate = jax.jit(lambda d: rx.init_state(cfg, params, (channels,)))

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state, i_plane, q_plane):
        """`inner` chained blocks in one dispatch.  The |audio| sum is
        accumulated in the carry so every block's full audio path stays
        live (state alone would let XLA drop the post-interp output of
        intermediate blocks); the accumulated probe is also the value
        the barrier fetch reads."""
        iq = ((i_plane, q_plane) if i_plane.dtype == jnp.int16
              else jax.lax.complex(i_plane, q_plane))

        def body(_, carry):
            st, acc = carry
            audio, st2, _ = rx.process_block(cfg, params, st, iq)
            return st2, acc + jnp.mean(jnp.abs(audio))

        new_state, acc = jax.lax.fori_loop(0, inner, body,
                                           (state, jnp.float32(0.0)))
        return acc, new_state

    # true barrier: small f32 reduction of the final audio, fetched
    probe = jax.jit(lambda a: jnp.mean(jnp.abs(a)) * jnp.ones((4,),
                                                              jnp.float32))

    rng = np.random.default_rng(0)
    i_np = rng.standard_normal((channels, block)).astype(np.float32) * 0.1
    q_np = rng.standard_normal((channels, block)).astype(np.float32) * 0.1
    if in_dtype == "int16":
        i_np = np.clip(np.round(i_np * 32767.0), -32767,
                       32767).astype(np.int16)
        q_np = np.clip(np.round(q_np * 32767.0), -32767,
                       32767).astype(np.int16)
    i_plane = jax.device_put(i_np)
    q_plane = jax.device_put(q_np)

    # warmup / compile (incl. the probe fetch path)
    state = mkstate(anchor)
    for _ in range(warm):
        acc, state = step(state, i_plane, q_plane)
        np.asarray(probe(acc))

    t0 = time.perf_counter()
    for _ in range(steps):
        acc, state = step(state, i_plane, q_plane)
    checksum = float(np.asarray(probe(acc))[0])   # forces all steps
    dt = time.perf_counter() - t0
    assert np.isfinite(checksum)

    msamps = channels * block * steps * inner / dt / 1e6
    tag = "full SSB RX chain" if not nr_on else \
        "spectral-NR-enabled SSB RX chain (front escalated to f32)"
    print(json.dumps({
        "metric": f"IQ Msamples/s/chip, {tag} "
                  f"({channels} ch x {block} blk @{int(cfg.iq_rate)} Hz IQ, "
                  "barrier-verified)",
        "value": round(msamps, 3),
        "unit": "Msamples/s/chip",
        "vs_baseline": round(msamps / REF_MSAMPLES_PER_CHIP, 1),
    }))


if __name__ == "__main__":
    main()
