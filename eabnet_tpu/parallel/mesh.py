"""Device-mesh utilities — the SPMD replacement for the reference's
NCCL/DDP layer (reference: train_distributed.py:159-204).

The reference spawns one process per GPU, wraps the model in DDP (gradient
all-reduce hooks) and shards data with DistributedSampler. Here a single
process drives all local devices through one jitted step function:

- params carry a fully-replicated NamedSharding,
- batches are sharded along the leading axis over the 'data' mesh axis,
- XLA then inserts the gradient all-reduce (psum over ICI) automatically
  during SPMD partitioning — no hand-written collectives in the step.

Multi-host extension: `jax.distributed.initialize()` before `make_mesh()`
turns the same code into a DCN-spanning mesh; per-host data feeding uses
`host_local_slice` below (the DistributedSampler analog).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axes: Sequence[str] = ("data",),
              devices: Optional[Sequence] = None,
              sizes: Optional[Sequence[int]] = None) -> Mesh:
    """1-D (or reshaped n-D) mesh over the available devices.

    ``sizes`` pins each axis's extent (one entry may be -1 to absorb the
    rest); without it the leading axis takes all devices. E.g. the
    batch-1 latency-serving mesh: ``make_mesh(("data", "freq"),
    sizes=(1, -1))`` — all chips on the model's frequency axis.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if sizes is not None:
        sizes = list(sizes)
        if -1 in sizes:
            known = int(np.prod([s for s in sizes if s != -1]))
            sizes[sizes.index(-1)] = n // known
        if int(np.prod(sizes)) != n:
            raise ValueError(f"mesh sizes {sizes} != {n} devices")
        dev_array = np.array(devices).reshape(sizes)
    elif len(axes) == 1:
        dev_array = np.array(devices)
    else:
        # fill trailing axes greedily; leading axis absorbs the rest
        sizes = [1] * len(axes)
        sizes[0] = n
        dev_array = np.array(devices).reshape(sizes)
    return Mesh(dev_array, tuple(axes))


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Sharding for batch-leading arrays."""
    return NamedSharding(mesh, P(axis))


def replicate(mesh: Mesh):
    """Fully-replicated sharding (params, scalars)."""
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place a host batch pytree onto the mesh, sharded on axis 0."""
    sharding = data_sharding(mesh, axis)
    return jax.tree.map(
        lambda x: jax.device_put(x, sharding), batch
    )


def host_local_slice(global_index: int, world: int, n: int) -> range:
    """Index range this host feeds (DistributedSampler analog for
    multi-host meshes): contiguous shard of the dataset."""
    per = (n + world - 1) // world
    lo = global_index * per
    return range(lo, min(lo + per, n))
