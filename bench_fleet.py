"""Mixed-mode fleet benchmark — BASELINE config 5 ("10k mixed-mode
channels sharded"): one chip runs a heterogeneous fleet of SSB/CW/AM/SAM/FM
channels grouped per chain config (`parallel/fleet.py`), all groups
dispatched back-to-back so XLA pipelines them on-device.

Prints one JSON line with the aggregate rate.  Usage:
    python bench_fleet.py [TOTAL_CHANNELS] [BLOCK]
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


    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from uhsdr_tpu.chain import rx
    from uhsdr_tpu.parallel import fleet

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if "--freedv" in sys.argv and not args:
        # freedv-only run: skip the mixed-mode fleet
        freedv_row()
        return
    # default = the BASELINE config-5 scale ("10k mixed-mode channels"):
    # 24,576 channels (4096/group x 6 modes) = 1.18 G complex samples/s
    # of 48 kHz IQ, ~2.4x the 10k-channel real-time target on ONE chip
    total = int(args[0]) if len(args) > 0 else 24576
    block = int(args[1]) if len(args) > 1 else 16384
    steps = int(os.environ.get("BENCH_STEPS", "3"))

    configs = [
        rx.RxConfig(mode="usb", bw_key="2P3KHZ", path_name="LPF",
                    translate_hz=6000.0, block_len=block),
        rx.RxConfig(mode="lsb", bw_key="2P7KHZ", path_name="LPF",
                    translate_hz=6000.0, block_len=block),
        rx.RxConfig(mode="cw", bw_key="500HZ", path_name="750Hz",
                    translate_hz=6000.0, block_len=block),
        # AM/SAM on the /4 paths (fs_dec 12 kHz like the SSB/CW groups)
        # so five of six groups share one AGC rate class — the fleet step
        # then runs their sequential AGC machine as ONE kernel invocation
        # (cross-group stage batching, parallel/fleet.py)
        rx.RxConfig(mode="am", bw_key="2P5KHZ", path_name="AM/SAM",
                    translate_hz=6000.0, block_len=block),
        rx.RxConfig(mode="sam", bw_key="2P3KHZ", path_name="AM/SAM",
                    translate_hz=6000.0, block_len=block),
        rx.RxConfig(mode="fm", bw_key="5P0KHZ", path_name="FM",
                    translate_hz=6000.0, block_len=block),
    ]
    per = total // len(configs)
    assignments = sum(([k] * per for k in range(len(configs))), [])
    fl = fleet.ChannelFleet(configs, assignments)

    rng = np.random.default_rng(0)
    planes = []
    for g in fl.groups:
        n = g.channel_idx.size
        planes.append((
            jax.device_put(rng.standard_normal((n, block)).astype(np.float32) * 0.1),
            jax.device_put(rng.standard_normal((n, block)).astype(np.float32) * 0.1),
        ))

    # BARRIER-VERIFIED (see bench.py): block_until_ready is not a real
    # barrier on axon; fetch a small reduction of every group's output.
    # Each group's jit chains BENCH_INNER blocks (state threads block to
    # block, per-block |audio| reduction accumulated in the carry so no
    # block's audio path is dead code) — amortizing the ~2.3 ms/dispatch
    # relay overhead that six per-group dispatches per block would pay
    # (see bench.py docstring; production serving pipelines blocks
    # on-device exactly like this).
    import functools

    import jax.numpy as jnp
    inner = int(os.environ.get("BENCH_INNER", "8"))
    probe = jax.jit(lambda a: jnp.mean(jnp.abs(a)) * jnp.ones((4,),
                                                              jnp.float32))

    def mk(chain):
        @functools.partial(jax.jit, donate_argnums=(0,))
        def gstep(st, i, q):
            iq = jax.lax.complex(i, q)

            def body(_, carry):
                s, acc = carry
                audio, s2, _ = rx.process_block(chain.cfg, chain.params,
                                                s, iq)
                return s2, acc + jnp.mean(jnp.abs(audio))

            st2, acc = jax.lax.fori_loop(0, inner, body,
                                         (st, jnp.float32(0.0)))
            return acc, st2
        return gstep

    gsteps = [mk(g.chain) for g in fl.groups]

    def run_all():
        accs = []
        for g, gstep, (i_p, q_p) in zip(fl.groups, gsteps, planes):
            acc, g.state = gstep(g.state, i_p, q_p)
            accs.append(acc)
        return accs

    accs = run_all()                                # compile + warm
    for a in accs:
        np.asarray(probe(a))
    t0 = time.perf_counter()
    for _ in range(steps):
        accs = run_all()
    for a in accs:
        assert np.isfinite(np.asarray(probe(a))[0])
    dt = time.perf_counter() - t0

    n_ch = per * len(configs)
    msamps = n_ch * block * steps * inner / dt / 1e6
    print(json.dumps({
        "metric": f"mixed-mode fleet ({n_ch} ch: usb/lsb/cw/am/sam/fm)",
        "value": round(msamps, 1),
        "unit": "Msamples/s/chip",
        "groups": fl.group_sizes,
    }))

    if "--freedv" in sys.argv:
        freedv_row()


def freedv_row() -> None:
    """FreeDV 1600 fleet row (VERDICT r4 #3): N channels through
    FreeDvFleetGroup — batched on-device NCO+rate-conversion front, then
    the BATCHED host modem tier (`modems.fdmdv_batch.FreeDv1600Fleet`:
    array-state FDMDV matched filter/timing/decision + batched Golay +
    batched Codec2 1300 — the r4 per-channel modem-object loop is gone).
    Reports real-time channel capacity of each tier: the device front is
    the chip-bound tier, the modem tier scales across host cores
    (numbers here are ONE core).  Set FLEET_FREEDV_OUT to persist the
    row as a JSON artifact."""
    import jax
    import jax.numpy as jnp

    from uhsdr_tpu.modems import freedv as freedv_mod
    from uhsdr_tpu.parallel.fleet import FreeDvFleetGroup

    n_ch = int(os.environ.get("FREEDV_CHANNELS", "512"))
    mode = os.environ.get("FREEDV_MODE", "freedv1600")
    block = 7680 * 4
    fs8 = 8000

    # a real 1600 transmission on every channel (modem must lock+decode)
    t8 = np.arange(fs8 * 4) / fs8
    speech = (5000 * np.sin(np.cumsum(
        2 * np.pi * (120 + 25 * np.sin(2 * np.pi * 1.1 * t8)) / fs8))
    ).astype(np.float32)
    tx = (freedv_mod.FreeDv1600(vocoder="codec2")
          if mode == "freedv1600" else freedv_mod.FreeDv700D())
    iq8 = tx.mod(speech)
    from scipy.signal import resample_poly
    iq48 = resample_poly(iq8, 6, 1).astype(np.complex64)
    T = block * (len(iq48) // block)
    i_np = np.broadcast_to(iq48[:T].real, (n_ch, T)).astype(np.float32)
    q_np = np.broadcast_to(iq48[:T].imag, (n_ch, T)).astype(np.float32)

    grp = FreeDvFleetGroup(n_ch, mode=mode, block_len_48k=block)
    probe = jax.jit(lambda a: jnp.mean(jnp.abs(a)) * jnp.ones(
        (4,), jnp.float32))

    # tier 1: device front (NCO + decimate x6), barrier-verified
    i_d = jax.device_put(i_np[:, :block])
    q_d = jax.device_put(q_np[:, :block])
    grp.front_block(i_d, q_d)          # warm
    t0 = time.perf_counter()
    reps = 8
    for _ in range(reps):
        grp._phases, grp._ci, grp._cq, i8, q8 = grp._front(
            grp._phases, grp._ci, grp._cq, i_d, q_d)
    assert np.isfinite(np.asarray(probe(i8))[0])
    dt_front = (time.perf_counter() - t0) / reps
    front_rt = n_ch * (block / 48000.0) / dt_front

    # tier 2: full step incl. per-channel modems (host, one core)
    frames = 0
    t0 = time.perf_counter()
    for s in range(0, T, block):
        grp.process_block(np.ascontiguousarray(i_np[:, s:s + block]),
                          np.ascontiguousarray(q_np[:, s:s + block]))
    dt_full = time.perf_counter() - t0
    frames = grp.stats["frames_decoded"]
    full_rt = n_ch * (T / 48000.0) / dt_full
    assert frames >= n_ch * (10 if mode == "freedv1600" else 5), frames

    row = {
        "metric": f"FreeDV fleet ({mode}, {n_ch} ch, real decode, "
                  "batched modem tier)",
        "front_realtime_channels_per_chip": round(front_rt, 1),
        "full_realtime_channels_one_host_core": round(full_rt, 1),
        "frames_decoded": int(frames),
        "unit": "x real-time channels",
        "modem_tier": ("fdmdv_batch.FreeDv1600Fleet (array state; "
                       "batched MF/timing/DQPSK + batched Golay + "
                       "batched Codec2 1300)" if mode == "freedv1600"
                       else "fdmdv_batch.FreeDv700DFleet (per-channel "
                       "OFDM sync + LDPC, batched Codec2 700C)"),
    }
    print(json.dumps(row))
    out_path = os.environ.get("FLEET_FREEDV_OUT")
    if out_path:
        with open(out_path, "w") as f:
            json.dump(row, f, indent=1)


if __name__ == "__main__":
    main()
