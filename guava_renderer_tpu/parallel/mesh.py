"""Device-mesh helpers.

The reference's entire parallelism story is single-node data-parallel DDP
over NCCL (ref: main/trainer.py:40-58, SURVEY §2.14). The TPU-native
equivalent: one `jax.sharding.Mesh` over the chips, batch sharded on a
'data' axis, parameters replicated, gradients psum'd over ICI inside a
shard_map'd train step. Multi-host is the same program over a larger mesh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_parallel_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), ("data",))


def shard_batch(batch, mesh: Mesh):
    """Place a host batch with the leading axis sharded over 'data'."""
    sharding = NamedSharding(mesh, P("data"))

    def put(x):
        x = jnp.asarray(x)
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, batch)


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
