"""Multi-chip scaling-efficiency harness (BASELINE target: >=85% from
1 chip to N hosts at >=10k channels).

Real multi-chip hardware is not attached in this environment, so by
default this runs on N virtual CPU devices
(`--xla_force_host_platform_device_count`) to validate the sharded
pipeline end-to-end and demonstrate the measurement methodology; on a
real slice the same script reports true ICI-scaling numbers (run with
JAX_PLATFORMS unset so the TPU backend loads).

Methodology: weak scaling — fix the per-device channel count, grow the
mesh, measure aggregate samples/s; efficiency(N) = rate(N) / (N * rate(1)).

Prints one JSON line per mesh size plus a summary line.
"""
from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    n_dev = int(os.environ.get("SCALING_DEVICES", "8"))
    if os.environ.get("SCALING_BACKEND", "cpu") == "cpu":
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                                   f" --xla_force_host_platform_device_count={n_dev}").strip()
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax
    import numpy as np

    if os.environ.get("SCALING_BACKEND", "cpu") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from uhsdr_tpu.chain import rx
    from uhsdr_tpu.parallel import mesh as mesh_mod
    from uhsdr_tpu.parallel import rx_sharded

    per_dev_channels = int(os.environ.get("SCALING_CH_PER_DEV", "16"))
    block = int(os.environ.get("SCALING_BLOCK", "4096"))
    steps = int(os.environ.get("SCALING_STEPS", "5"))

    devices = jax.devices()
    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= len(devices)]
    results = []
    artifact = {"backend": os.environ.get("SCALING_BACKEND", "cpu"),
                "per_dev_channels": per_dev_channels, "block": block,
                "steps": steps, "rows": []}
    for n in sizes:
        cfg = rx.RxConfig(mode="usb", bw_key="2P3KHZ", path_name="LPF",
                          translate_hz=6000.0, block_len=block)
        # mesh layout: sp=2 time-shards the front (halo ppermute); sp=1
        # is pure channel parallelism.  SCALING_SP overrides for layout
        # diagnostics (the r5 retention analysis runs both).
        n_sp = int(os.environ.get("SCALING_SP",
                                  "2" if n % 2 == 0 else "1"))
        if n % n_sp:
            n_sp = 1
        mesh = mesh_mod.make_mesh(n // n_sp, n_sp, devices=devices[:n])
        step, init_state = rx_sharded.make_sharded_rx(cfg, mesh)
        C = per_dev_channels * n
        state = init_state(C)
        grid = mesh_mod.grid_sharding(mesh)
        rng = np.random.default_rng(0)
        i_p = jax.device_put(
            rng.standard_normal((C, block)).astype(np.float32), grid)
        q_p = jax.device_put(
            rng.standard_normal((C, block)).astype(np.float32), grid)
        audio, state = step(state, i_p, q_p)        # compile+warm
        jax.block_until_ready(audio)
        t0 = time.perf_counter()
        for _ in range(steps):
            audio, state = step(state, i_p, q_p)
        jax.block_until_ready(audio)
        dt = time.perf_counter() - t0
        rate = C * block * steps / dt / 1e6

        # CONTROL (VERDICT r4 item 4): N INDEPENDENT single-device jits
        # over the same cores — the collective-free upper bound the
        # sharded step is judged against.  Each device runs its own
        # C/N-channel chain with its own state; all N dispatches are
        # async, one block at the end.  (The r3/r4 control — ONE
        # GSPMD-partitioned collective-free jit over the mesh —
        # collapsed at 4/8 virtual devices to BELOW the sharded step:
        # XLA:CPU runs a partitioned computation's per-device programs
        # through a shared executor whose cross-device synchronization
        # serializes the batch-partitioned scan stages, so the control
        # measured its own pathology, not the workload; independent
        # jits have no such coupling.)
        import jax.numpy as jnp
        params_c = rx.make_params(cfg)

        def _plain(state_c, i, q):
            a, st2, _ = rx.process_block(cfg, params_c, state_c,
                                         jax.lax.complex(i, q))
            return a, st2

        per_C = C // n
        i_np, q_np = np.asarray(i_p), np.asarray(q_p)
        plain_d, states_d, planes_d = [], [], []
        for d in range(n):
            dev = devices[d]
            sh = jax.sharding.SingleDeviceSharding(dev)
            plain_d.append(jax.jit(_plain, out_shardings=sh))
            anchor = jax.device_put(np.zeros((), np.float32), dev)
            states_d.append(jax.jit(
                lambda dd: rx.init_state(cfg, params_c, (per_C,)),
                out_shardings=sh)(anchor))
            lo = d * per_C
            planes_d.append((
                jax.device_put(i_np[lo:lo + per_C], dev),
                jax.device_put(q_np[lo:lo + per_C], dev)))
        outs = []
        for d in range(n):                      # compile + warm
            a, states_d[d] = plain_d[d](states_d[d], *planes_d[d])
            outs.append(a)
        jax.block_until_ready(outs)
        t0 = time.perf_counter()
        for _ in range(steps):
            outs = []
            for d in range(n):
                a, states_d[d] = plain_d[d](states_d[d], *planes_d[d])
                outs.append(a)
        jax.block_until_ready(outs)
        ctrl_rate = C * block * steps / (time.perf_counter() - t0) / 1e6

        # SERIAL CONTROL: ONE jit over ALL C channels on ONE device.
        # r5 diagnosis: on a virtual-CPU mesh, XLA executes the
        # partitions of a sharded computation sequentially (the sharded
        # aggregate is FLAT ~3-5 Ms/s at every mesh size, sp=1 or 2),
        # while N independent jits pipeline across the physical cores —
        # so sharded_vs_control conflates the machinery overhead with
        # serialized-vs-parallel host execution.  sharded/serial_control
        # isolates the machinery overhead under EQUAL serialization.
        dev0 = devices[0]
        sh0 = jax.sharding.SingleDeviceSharding(dev0)
        plain_s = jax.jit(_plain, out_shardings=sh0)
        st_s = jax.jit(lambda dd: rx.init_state(cfg, params_c, (C,)),
                       out_shardings=sh0)(
            jax.device_put(np.zeros((), np.float32), dev0))
        i_s = jax.device_put(i_np, dev0)
        q_s = jax.device_put(q_np, dev0)
        a, st_s = plain_s(st_s, i_s, q_s)
        jax.block_until_ready(a)
        t0 = time.perf_counter()
        for _ in range(steps):
            a, st_s = plain_s(st_s, i_s, q_s)
        jax.block_until_ready(a)
        serial_rate = C * block * steps / (time.perf_counter() - t0) / 1e6

        results.append((n, rate, ctrl_rate, serial_rate))
        row = {"devices": n, "channels": C, "n_sp": n_sp,
               "Msamples_per_s": round(rate, 1),
               "control_Msamples_per_s": round(ctrl_rate, 1),
               "serial_control_Msamples_per_s": round(serial_rate, 1),
               "sharded_vs_control": round(rate / ctrl_rate, 3),
               "sharded_vs_serial_control": round(rate / serial_rate, 3)}
        artifact["rows"].append(row)
        print(json.dumps(row))

    if os.environ.get("SCALING_BACKEND", "cpu") == "cpu":
        # Virtual devices SHARE the host's physical cores, so aggregate
        # throughput cannot grow with mesh size — the meaningful CPU-mesh
        # metric is RETENTION: aggregate(N) / aggregate(1).  Ideal = 1.0
        # (flat aggregate = the sharding machinery adds no overhead: the
        # same silicon does the same per-channel work through the
        # shard_map/halo path).  A collapse here (as in the r02 artifact,
        # 9.4 -> 0.5 at 16ch x 4k: collective-dominated toy load) flags
        # sharding overhead, which compute-dominated loads must not show.
        base = results[0][1]
        summary = {"mode": "cpu-validation",
                   "meshes_validated": [r[0] for r in results],
                   "aggregate_retention_vs_1dev": {
                       r[0]: round(r[1] / base, 3) for r in results[1:]},
                   "sharded_vs_control_retention": {
                       r[0]: round(r[1] / r[2], 3) for r in results},
                   "sharded_vs_serial_control": {
                       r[0]: round(r[1] / r[3], 3) for r in results},
                   "note": "virtual devices share physical cores AND "
                           "XLA:CPU executes a sharded computation's "
                           "partitions serially (measured: the sharded "
                           "aggregate is flat at every mesh size, with "
                           "sp=1 or sp=2 layouts alike), while N "
                           "independent jits (control) pipeline "
                           "asynchronously across the physical cores — "
                           "so sharded_vs_control conflates machinery "
                           "overhead with serial-vs-parallel host "
                           "execution and is a pessimistic lower "
                           "bound.  sharded_vs_serial_control (vs ONE "
                           "jit over ALL channels on ONE device) "
                           "isolates the sharding machinery's overhead "
                           "under equal serialization — that is the "
                           ">=0.85-comparable number on this backend.  "
                           "Run with SCALING_BACKEND=tpu on a real "
                           "slice for true ICI efficiency."}
    else:
        base = results[0][1]
        summary = {"mode": "tpu",
                   "efficiency_vs_1dev": {
                       r[0]: round(r[1] / (r[0] * base), 3)
                       for r in results[1:]},
                   "sharded_vs_control_retention": {
                       r[0]: round(r[1] / r[2], 3) for r in results}}
    artifact["summary"] = summary
    print(json.dumps(summary))
    out_path = os.environ.get("SCALING_OUT")
    if out_path:
        with open(out_path, "w") as f:
            json.dump(artifact, f, indent=1)


if __name__ == "__main__":
    main()
