"""Device mesh construction for the sharded SDR pipeline.

Axes:
  * ``dp`` — channel parallelism: virtual receiver channels are
    independent; this is the main scaling axis (SURVEY §2.6 "channel
    batching").
  * ``sp`` — sequence (time) parallelism: the IQ time axis is sharded and
    streaming-FIR history crosses shard boundaries as a halo exchanged
    over ICI with `ppermute` (SURVEY §2.6: the overlap-save seam).
"""
from __future__ import annotations

import jax
import numpy as np

P = jax.sharding.PartitionSpec


def make_mesh(n_dp: int | None = None, n_sp: int = 1,
              devices=None) -> jax.sharding.Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_dp is None:
        n_dp = n // n_sp
    assert n_dp * n_sp == n, (n_dp, n_sp, n)
    dev_array = np.asarray(devices).reshape(n_dp, n_sp)
    return jax.sharding.Mesh(dev_array, ("dp", "sp"))


def channel_sharding(mesh) -> jax.sharding.NamedSharding:
    """Channels split over every device (dp x sp collapsed)."""
    return jax.sharding.NamedSharding(mesh, P(("dp", "sp")))


def grid_sharding(mesh) -> jax.sharding.NamedSharding:
    """(channels, time) split over (dp, sp)."""
    return jax.sharding.NamedSharding(mesh, P("dp", "sp"))
