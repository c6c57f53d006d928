"""Multi-chip scaling: env-batch sharding over a device mesh.

The reference scales by forking one OS process per env and shuttling
observations over pipes (ref Gymnasium AsyncVectorEnv, selected at
metaworld/__init__.py:481-483). Here scaling is a sharding annotation: the
env-batch axis of the vectorized state pytree is partitioned across devices
(ICI within a host, DCN across hosts) and XLA inserts the collectives —
observations arrive at the learner via all_gather, metric reductions ride
psum. No transport code exists anywhere.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ENV_AXIS = "env"


def make_env_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D mesh over the env-batch axis. For >1 host, pass the global device
    list; the axis spans ICI then DCN automatically."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (ENV_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 (the env batch) of every leaf; replicate scalars."""
    return NamedSharding(mesh, P(ENV_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(tree, mesh: Mesh):
    """Place a batched pytree with the env axis partitioned over the mesh.
    Leaves whose first dim is not divisible by the mesh size are replicated
    (per-group scalars, tables)."""
    n = mesh.devices.size
    bsh = batch_sharding(mesh)
    rep = replicated(mesh)

    def place(x):
        x = jnp.asarray(x)
        if x.ndim >= 1 and x.shape[0] % n == 0 and x.shape[0] > 0:
            return jax.device_put(x, bsh)
        return jax.device_put(x, rep)

    return jax.tree.map(place, tree)


def constrain_batch(tree, mesh: Mesh):
    """In-graph sharding constraint on the env axis (use inside jit)."""
    n = mesh.devices.size
    bsh = batch_sharding(mesh)

    def c(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] % n == 0 and x.shape[0] > 0:
            return jax.lax.with_sharding_constraint(x, bsh)
        return x

    return jax.tree.map(c, tree)
