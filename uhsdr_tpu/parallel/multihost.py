"""Multi-host (DCN) layer: `jax.distributed` process mesh + per-host IQ
ingest for the sharded RX pipeline.

SURVEY §2.6 "distributed communication backend": the reference's data
transports are I2S DMA and USB streams into ONE core; the TPU-native
equivalent at pod scale is a process group over DCN — each host feeds
the IQ capture slices for ITS devices (`host_local_to_global`), the
`(dp, sp)` mesh spans every process's devices, and XLA routes the
channel-axis collectives over ICI within a slice / DCN across hosts.

Topology policy: the ``sp`` (time/halo) axis is laid out WITHIN a
process's devices (ICI — the `ppermute` halo is latency-sensitive),
while ``dp`` (independent channels) spans processes (DCN tolerant:
channels never communicate, so the only cross-host traffic is ingest).

Validated without real multi-host hardware by
`tools/run_multihost_demo.py`, which spawns N coordinator-connected
processes on localhost (CPU devices) and runs the full sharded RX step
over the cross-process global mesh — the same code path a real
multi-host slice runs.
"""
from __future__ import annotations

import jax
import numpy as np

P = jax.sharding.PartitionSpec


def initialize(coordinator_address: str, num_processes: int,
               process_id: int) -> None:
    """Join the process group (DCN bootstrap).  On real pods the three
    values come from the scheduler's environment; `jax.distributed`
    then exposes every host's devices in `jax.devices()`."""
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def make_global_mesh(n_sp: int = 1) -> jax.sharding.Mesh:
    """(dp, sp) mesh over ALL processes' devices, with sp kept inside
    each process (halo ppermute stays on ICI, never DCN)."""
    devs = np.array(jax.devices())
    n = devs.size
    assert n % n_sp == 0, (n, n_sp)
    per_proc = len(jax.local_devices())
    assert per_proc % n_sp == 0, (per_proc, n_sp)
    # order devices process-major so rows (dp) group cleanly: jax.devices()
    # is already process-major by construction
    return jax.sharding.Mesh(devs.reshape(n // n_sp, n_sp), ("dp", "sp"))


def host_local_to_global(mesh: jax.sharding.Mesh, local_iq: np.ndarray,
                         spec: P | None = None):
    """Per-host IQ ingest: each process holds the (C_local, T) slice of
    the global (C, T) capture for its OWN channels; assemble the global
    sharded array without any host ever materializing the whole capture
    (`jax.make_array_from_process_local_data`).

    Default spec = the sharded-RX input grid P("dp", "sp"): channels
    over dp (process-major, so a host's rows stay on its devices) and
    time over sp (within the host)."""
    if spec is None:
        spec = P("dp", "sp")
    sharding = jax.sharding.NamedSharding(mesh, spec)
    global_shape = (local_iq.shape[0] * jax.process_count(),
                    local_iq.shape[1])
    return jax.make_array_from_process_local_data(
        sharding, local_iq, global_shape)
