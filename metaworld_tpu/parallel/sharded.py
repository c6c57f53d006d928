"""Zero-communication multi-chip env engine: shard_map over local batches.

The reference scales with one OS process per env and pipe IPC (ref Gymnasium
AsyncVectorEnv, selected at metaworld/__init__.py:481-483). The TPU-native
layout: every device runs the SAME fused step program on its own local env
batch (a miniature of the global task-group structure), so the per-task
observation/reward slices inside the fused step stay device-local and XLA
emits no collectives at all — stepping is embarrassingly parallel, and
cross-device traffic happens only where the learner wants it (metric psums,
obs all_gathers the user writes themselves).

Naively `jax.device_put`-sharding the global fused batch instead makes the
per-task-group slices straddle shard boundaries and XLA has to reshard on
every step (~60x slower on an 8-way mesh; see scripts/scaling_bench.py).
"""

from __future__ import annotations

import jax
from jax.sharding import PartitionSpec as P

from metaworld_tpu.parallel.mesh import ENV_AXIS, make_env_mesh

try:  # jax >= 0.4.35
    from jax import shard_map as _shard_map

    def _smap(f, mesh, in_specs, out_specs):
        return _shard_map(f, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs, check_vma=False)
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map as _shard_map

    def _smap(f, mesh, in_specs, out_specs):
        return _shard_map(f, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs, check_rep=False)


class ShardedEnvs:
    """A device-mesh-wide env batch: `envs_per_task` slots per task, evenly
    divided over the mesh; each device steps its local slice independently.

    The global state/obs/reward arrays are ordinary sharded jax arrays with
    the env axis partitioned over the mesh, so they compose with a pjit
    learner directly (feed obs in, constrain shardings, let XLA place the
    collectives).
    """

    def __init__(self, bench, envs_per_task: int, mesh=None, split="train",
                 **kwargs):
        from metaworld_tpu import vector

        self.mesh = mesh if mesh is not None else make_env_mesh()
        n = self.mesh.devices.size
        assert envs_per_task % n == 0, (
            f"envs_per_task={envs_per_task} must divide over the "
            f"{n}-device mesh")
        self.local = vector.from_benchmark(
            bench, split=split, envs_per_task=envs_per_task // n, **kwargs)
        self.n_shards = n
        self.num_envs = self.local.num_envs * n
        self.obs_dim = self.local.obs_dim
        self.task_names = self.local.task_names

        local = self.local
        mesh_ = self.mesh

        def _reset_local(keys):
            state, obs = local.reset(keys[0])
            return state, obs

        def _step_local(state, actions):
            return local.step(state, actions)

        self._reset_sm = jax.jit(_smap(
            _reset_local, mesh_, in_specs=P(ENV_AXIS),
            out_specs=(P(ENV_AXIS), P(ENV_AXIS))))
        self._step_sm = jax.jit(_smap(
            _step_local, mesh_, in_specs=(P(ENV_AXIS), P(ENV_AXIS)),
            out_specs=(P(ENV_AXIS), P(ENV_AXIS))))

    def reset(self, key):
        keys = jax.random.split(key, self.n_shards)
        return self._reset_sm(keys)

    def step(self, state, actions):
        return self._step_sm(state, actions)
