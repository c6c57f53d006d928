"""Lockstep vectorized engine — the TPU replacement for Gymnasium's
Sync/AsyncVectorEnv (ref metaworld/__init__.py:481-483: per-env python loops
or one OS process per env with pipe IPC).

Here the whole benchmark batch is a single pytree stepped by one jitted
function: envs are grouped by task (task assignment per slot is static, as in
the reference where each sub-env owns one task), each group is vmapped, and
group results are concatenated. Autoreset happens in-graph with
Gymnasium-style NEXT_STEP semantics: a finished env returns its final
observation, and the next step() call resets it (action ignored), sampling a
fresh goal row from the device-resident goal table (the functional equivalent
of RandomTaskSelectWrapper, ref wrappers.py:91-143).

The batch axis is shard-ready: state and actions are plain pytrees, so
`jax.sharding`/`shard_map` can partition env slots across chips and hosts
(see metaworld_tpu.parallel).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from metaworld_tpu.envs.core import TaskSpec, env_reset, env_step
from metaworld_tpu.types import MAX_PATH_LENGTH


def _tree_select(mask, a, b):
    """Per-env select between two batched pytrees (mask: (n,) bool)."""

    def sel(x, y):
        m = mask.reshape(mask.shape + (1,) * (x.ndim - 1))
        return jnp.where(m, x, y)

    return jax.tree.map(sel, a, b)


@struct.dataclass
class GroupState:
    env: object          # EnvState, batched (n, ...)
    key: jnp.ndarray     # (n, 2) per-slot PRNG keys
    pending_reset: jnp.ndarray   # (n,) bool — reset on the next step call
    episode_return: jnp.ndarray  # (n,)
    episode_length: jnp.ndarray  # (n,) int32
    goal_idx: jnp.ndarray        # (n,) int32 — pinned goal row per slot
                                 # (consumed only under task_select=
                                 # "pseudorandom"; random mode ignores it)


@struct.dataclass
class VectorState:
    groups: tuple        # tuple[GroupState, ...]


class BatchedEnvs:
    """A fixed batch of envs: `counts[i]` slots running `specs[i]`.

    All methods are pure; `reset`/`step` are jitted once per instance.
    """

    def __init__(
        self,
        specs: Sequence[TaskSpec],
        counts: Sequence[int],
        goal_tables: Sequence[np.ndarray],
        goal_visible: Sequence[bool] | bool = True,
        one_hot: bool = False,
        num_tasks: int | None = None,
        task_indices: Sequence[int] | None = None,
        terminate_on_success: bool = False,
        max_episode_steps: int = MAX_PATH_LENGTH,
        autoreset: bool = True,
        task_select: str = "random",
    ):
        assert len(specs) == len(counts) == len(goal_tables)
        self.specs = list(specs)
        self.counts = list(counts)
        self.num_envs = int(sum(counts))
        if isinstance(goal_visible, bool):
            goal_visible = [goal_visible] * len(specs)
        self.goal_visible = [float(v) for v in goal_visible]
        self.goal_tables = [jnp.asarray(t) for t in goal_tables]
        self.terminate_on_success = terminate_on_success
        self.max_episode_steps = int(max_episode_steps)
        self.autoreset = autoreset
        # task_select="pseudorandom" pins each slot to a goal row that only
        # sample_tasks() advances — the in-graph analogue of the reference's
        # PseudoRandomTaskSelectWrapper with sample_tasks_on_reset=False
        # (ref wrappers.py:145-204, evaluation.py:114-125)
        assert task_select in ("random", "pseudorandom")
        self.task_select = task_select
        self._prg_rng = np.random.default_rng(0)
        self._prg_perm = [None] * len(self.specs)   # per group: (count, n_goals)
        self._prg_cursor = [None] * len(self.specs)

        # one-hot task id block (ref OneHotWrapper, wrappers.py:14-32)
        self.one_hot = one_hot
        if one_hot:
            n = num_tasks if num_tasks is not None else len(specs)
            idx = task_indices if task_indices is not None else range(len(specs))
            rows = []
            for i, c in zip(idx, counts):
                oh = np.zeros((c, n), dtype=np.float32)
                oh[:, i] = 1.0
                rows.append(oh)
            self._one_hot_block = jnp.asarray(np.concatenate(rows, axis=0))
            self.obs_dim = 39 + n
        else:
            self._one_hot_block = None
            self.obs_dim = 39

        self._reset_jit = jax.jit(self._reset_impl)
        self._step_jit = jax.jit(self._step_impl)

    @property
    def task_names(self) -> list[str]:
        return [s.name for s in self.specs]

    def env_task_names(self) -> list[str]:
        out = []
        for s, c in zip(self.specs, self.counts):
            out.extend([s.name] * c)
        return out

    # ------------------------------------------------------------------
    def _sample_goal(self, spec_i: int, key, goal_idx):
        table = self.goal_tables[spec_i]
        if self.task_select == "pseudorandom":
            idx = goal_idx
        else:
            idx = jax.random.randint(key, (), 0, table.shape[0])
        return table[idx]

    def _reset_one(self, spec_i: int, key, goal_idx):
        spec = self.specs[spec_i]
        k_goal, k_env, k_next = jax.random.split(key, 3)
        rand_vec = self._sample_goal(spec_i, k_goal, goal_idx)
        state, obs = env_reset(spec, rand_vec, k_env, self.goal_visible[spec_i])
        return state, obs, k_next

    def _reset_impl(self, key, goal_idx):
        groups = []
        all_obs = []
        start = 0
        for i, (spec, count) in enumerate(zip(self.specs, self.counts)):
            key, sub = jax.random.split(key)
            keys = jax.random.split(sub, count)
            gidx = jax.lax.dynamic_slice_in_dim(goal_idx, start, count, axis=0)
            start += count
            state, obs, nkeys = jax.vmap(functools.partial(self._reset_one, i))(
                keys, gidx)
            groups.append(
                GroupState(
                    env=state,
                    key=nkeys,
                    pending_reset=jnp.zeros(count, dtype=bool),
                    episode_return=jnp.zeros(count),
                    episode_length=jnp.zeros(count, dtype=jnp.int32),
                    goal_idx=gidx,
                )
            )
            all_obs.append(obs)
        obs = jnp.concatenate(all_obs, axis=0)
        return VectorState(groups=tuple(groups)), self._augment(obs)

    def _goal_idx_of(self, vstate) -> jnp.ndarray:
        if vstate is None:
            return jnp.zeros(self.num_envs, dtype=jnp.int32)
        if isinstance(vstate, VectorState):
            return jnp.concatenate([g.goal_idx for g in vstate.groups])
        return vstate.goal_idx

    def sample_tasks(self, vstate):
        """Advance every slot's pinned goal: cycle through a per-slot
        shuffled permutation of the goal table, reshuffling on wrap (the
        reference's PseudoRandomTaskSelectWrapper.sample_tasks, ref
        wrappers.py:178-189). Host-side bookkeeping; returns a state with
        the new pinned indices (takes effect on the next reset)."""
        assert self.task_select == "pseudorandom"
        idx_groups = []
        for i, count in enumerate(self.counts):
            n_goals = int(self.goal_tables[i].shape[0])
            if self._prg_perm[i] is None:
                self._prg_perm[i] = np.stack([
                    self._prg_rng.permutation(n_goals) for _ in range(count)])
                self._prg_cursor[i] = np.zeros(count, dtype=int)
            idx = np.empty(count, dtype=np.int32)
            for j in range(count):
                if self._prg_cursor[i][j] >= n_goals:
                    self._prg_perm[i][j] = self._prg_rng.permutation(n_goals)
                    self._prg_cursor[i][j] = 0
                idx[j] = self._prg_perm[i][j][self._prg_cursor[i][j]]
                self._prg_cursor[i][j] += 1
            idx_groups.append(idx)
        if isinstance(vstate, VectorState):
            groups = tuple(
                g.replace(goal_idx=jnp.asarray(idx))
                for g, idx in zip(vstate.groups, idx_groups)
            )
            return VectorState(groups=groups)
        return vstate.replace(goal_idx=jnp.asarray(np.concatenate(idx_groups)))

    def _augment(self, obs):
        if self._one_hot_block is not None:
            return jnp.concatenate([obs, self._one_hot_block], axis=1)
        return obs

    def _step_impl(self, vstate: VectorState, actions):
        new_groups = []
        outs = {k: [] for k in (
            "obs", "reward", "terminated", "truncated", "success",
            "near_object", "grasp_success", "grasp_reward", "in_place_reward",
            "obj_to_target", "unscaled_reward", "episode_return",
            "episode_length", "done",
        )}
        start = 0
        for i, (spec, count) in enumerate(zip(self.specs, self.counts)):
            g = vstate.groups[i]
            act = jax.lax.dynamic_slice_in_dim(actions, start, count, axis=0)
            start += count

            stepped_env, out = jax.vmap(functools.partial(env_step, spec))(g.env, act)
            truncated = out.truncated | (
                stepped_env.path_length >= self.max_episode_steps
            )
            terminated = out.terminated
            if self.terminate_on_success:
                terminated = terminated | (out.success > 0)

            # fresh resets for slots flagged last step (NEXT_STEP autoreset)
            rstate, robs, rkeys = jax.vmap(functools.partial(self._reset_one, i))(
                g.key, g.goal_idx)

            if self.autoreset:
                env2 = _tree_select(g.pending_reset, rstate, stepped_env)
                obs2 = jnp.where(g.pending_reset[:, None], robs, out.obs)
                key2 = jnp.where(g.pending_reset[:, None], rkeys, g.key)
                reward2 = jnp.where(g.pending_reset, 0.0, out.reward)
                terminated = jnp.where(g.pending_reset, False, terminated)
                truncated2 = jnp.where(g.pending_reset, False, truncated)
            else:
                env2, obs2, key2 = stepped_env, out.obs, g.key
                reward2, truncated2 = out.reward, truncated

            done = terminated | truncated2
            ep_ret = jnp.where(g.pending_reset, 0.0, g.episode_return) + reward2
            ep_len = jnp.where(g.pending_reset, 0, g.episode_length) + 1

            new_groups.append(
                GroupState(
                    env=env2,
                    key=key2,
                    pending_reset=done if self.autoreset else jnp.zeros_like(done),
                    episode_return=ep_ret,
                    episode_length=ep_len,
                    goal_idx=g.goal_idx,
                )
            )
            outs["obs"].append(obs2)
            outs["reward"].append(reward2)
            outs["terminated"].append(terminated)
            outs["truncated"].append(truncated2)
            outs["done"].append(done)
            outs["episode_return"].append(ep_ret)
            outs["episode_length"].append(ep_len)
            # On an autoreset step the slot's obs come from the fresh reset,
            # so the stale env's step metrics must not leak: Gymnasium's
            # NEXT_STEP autoreset returns reset-infos (no step metrics) there.
            # Unmasked, a terminate_on_success env would re-report success=1
            # on the first step of every following episode.
            for k in ("success", "near_object", "grasp_success", "grasp_reward",
                      "in_place_reward", "obj_to_target", "unscaled_reward"):
                v = getattr(out, k)
                if self.autoreset:
                    v = jnp.where(g.pending_reset, 0.0, v)
                outs[k].append(v)

        cat = {k: jnp.concatenate(v, axis=0) for k, v in outs.items()}
        cat["obs"] = self._augment(cat["obs"])
        return VectorState(groups=tuple(new_groups)), cat

    # ------------------------------------------------------------------
    def reset(self, key, vstate=None):
        """Fresh reset. Pass the previous `vstate` to preserve pinned goal
        indices (pseudorandom mode resets onto the SAME tasks, the
        reference's sample_tasks_on_reset=False semantics)."""
        return self._reset_jit(key, self._goal_idx_of(vstate))

    def step(self, vstate, actions):
        return self._step_jit(vstate, actions)


@struct.dataclass
class FusedState:
    env: object                  # EnvState, batched over the FULL batch
    key: jnp.ndarray             # (n, 2)
    pending_reset: jnp.ndarray   # (n,)
    episode_return: jnp.ndarray  # (n,)
    episode_length: jnp.ndarray  # (n,) int32
    goal_idx: jnp.ndarray        # (n,) int32 pinned goal rows (see GroupState)


class FusedBatchedEnvs(BatchedEnvs):
    """Single-program variant: physics for ALL tasks runs as one full-width
    lane-oriented step over per-slot scene rows (scenes-as-data); only the
    cheap per-task observation/reward tail runs per task group. Autoreset
    work is gated behind a batch-level lax.cond, so its cost is paid only on
    the ~1/500 steps where some episode actually ended.

    `physics` selects the batched step implementation:
      * "lanes"  — engine_lanes.control_step under plain XLA (works on any
        backend; the substep mega-fuses into a few elementwise kernels)
      * "pallas" — the Pallas TPU kernel (physics/pallas_step.py): all 5
        substeps run on-chip out of VMEM, one HBM read/write of the packed
        state per control step
      * "auto"   — "pallas" on TPU backends, "lanes" elsewhere (default)
    """

    def __init__(self, *args, physics: str = "auto", pallas_block: int = 2048,
                 **kwargs):
        super().__init__(*args, **kwargs)
        # per-slot scene rows: gather each spec's scene for its slots
        rows = []
        for spec, count in zip(self.specs, self.counts):
            row = jax.tree.map(lambda x: np.broadcast_to(np.asarray(x),
                                                         (count,) + np.shape(x)),
                               spec.scene)
            rows.append(row)
        self._scene_slots = jax.tree.map(
            lambda *xs: jnp.asarray(np.concatenate(xs, axis=0)), *rows
        )
        self._offsets = np.cumsum([0] + list(self.counts))
        assert physics in ("auto", "lanes", "pallas")
        if physics == "auto":
            physics = ("pallas" if jax.default_backend() == "tpu" else "lanes")
        self.physics = physics
        self.pallas_block = int(pallas_block)
        if physics == "pallas":
            from metaworld_tpu.physics import pallas_step
            self._scene_rows = pallas_step.pack_scene_rows(self._scene_slots)
            n_pad = -(-self.num_envs // self.pallas_block) * self.pallas_block
            # per-block specialization ids: blocks are task-contiguous, so
            # most run a reduced substep variant (see pallas_step._VARIANTS)
            self._pallas_variants = pallas_step.block_variants(
                self._scene_slots, n_pad, self.pallas_block)
        else:
            self._scene_rows = None
            self._pallas_variants = None

    def _slice(self, tree, i):
        a, b = int(self._offsets[i]), int(self._offsets[i + 1])
        return jax.tree.map(lambda x: x[a:b], tree)

    def _reset_all(self, keys, goal_idx):
        """Per-slot resets (grouped per task), concatenated."""
        states, obss, nkeys = [], [], []
        for i in range(len(self.specs)):
            a, b = int(self._offsets[i]), int(self._offsets[i + 1])
            s, o, k = jax.vmap(functools.partial(self._reset_one, i))(
                keys[a:b], goal_idx[a:b])
            states.append(s)
            obss.append(o)
            nkeys.append(k)
        env = jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *states)
        return env, jnp.concatenate(obss, axis=0), jnp.concatenate(nkeys, axis=0)

    def _reset_impl(self, key, goal_idx):
        # same per-group key derivation as the grouped engine so both
        # variants sample identical goals from the same seed
        parts = []
        for count in self.counts:
            key, sub = jax.random.split(key)
            parts.append(jax.random.split(sub, count))
        keys = jnp.concatenate(parts, axis=0)
        env, obs, nkeys = self._reset_all(keys, goal_idx)
        n = self.num_envs
        state = FusedState(
            env=env,
            key=nkeys,
            pending_reset=jnp.zeros(n, dtype=bool),
            episode_return=jnp.zeros(n),
            episode_length=jnp.zeros(n, dtype=jnp.int32),
            goal_idx=goal_idx,
        )
        return state, self._augment(obs)

    def _step_impl(self, vstate: FusedState, actions):
        from metaworld_tpu.envs.core import post_step
        from metaworld_tpu.physics import engine_lanes

        env = vstate.env
        # full-width physics over per-slot scene rows (lane-oriented step —
        # natively batched, no vmap; see physics/engine_lanes.py)
        if self.physics == "pallas":
            from metaworld_tpu.physics import pallas_step
            sim = pallas_step.control_step(
                self._scene_slots, self._scene_rows, env.sim, actions,
                block=self.pallas_block, variants=self._pallas_variants)
        else:
            sim = engine_lanes.control_step(self._scene_slots, env.sim, actions)
        # sim-instability guard, vectorized (ref _did_see_sim_exception,
        # sawyer_xyz_env.py:235,603-619): unstable slots keep their last
        # stable sim state and report reward 0 below
        stable = (jnp.isfinite(sim.hand).all(-1)
                  & jnp.isfinite(sim.obj_pos).reshape(sim.hand.shape[0], -1).all(-1)
                  & jnp.isfinite(sim.joint_q).all(-1)
                  & jnp.isfinite(sim.gripper))
        sim = jax.tree.map(
            lambda new, old: jnp.where(
                stable.reshape((-1,) + (1,) * (new.ndim - 1)), new, old),
            sim, env.sim)
        env = env.replace(sim=sim, path_length=env.path_length + 1)

        # per-task obs/reward tails
        obss, outs = [], []
        for i, spec in enumerate(self.specs):
            st_i = self._slice(env, i)
            act_i = self._slice(actions, i)
            st2, out = jax.vmap(functools.partial(post_step, spec))(st_i, act_i)
            obss.append((st2, out))
        env = jax.tree.map(
            lambda *xs: jnp.concatenate(xs, axis=0), *[s for s, _ in obss]
        )
        out = jax.tree.map(
            lambda *xs: jnp.concatenate(xs, axis=0), *[o for _, o in obss]
        )
        out = out.replace(
            reward=jnp.where(stable, out.reward, 0.0),
            unscaled_reward=jnp.where(stable, out.unscaled_reward, 0.0),
        )

        truncated = out.truncated | (env.path_length >= self.max_episode_steps)
        terminated = out.terminated
        if self.terminate_on_success:
            terminated = terminated | (out.success > 0)

        pending = vstate.pending_reset

        def with_resets(operand):
            env, obs, keys = operand
            renv, robs, rkeys = self._reset_all(keys, vstate.goal_idx)
            env2 = _tree_select(pending, renv, env)
            obs2 = jnp.where(pending[:, None], robs, obs)
            keys2 = jnp.where(pending[:, None], rkeys, keys)
            return env2, obs2, keys2

        if self.autoreset:
            env, obs, keys = jax.lax.cond(
                pending.any(), with_resets, lambda op: op,
                (env, out.obs, vstate.key),
            )
            reward = jnp.where(pending, 0.0, out.reward)
            terminated = jnp.where(pending, False, terminated)
            truncated = jnp.where(pending, False, truncated)
            # mask the stale env's step metrics on autoreset slots (see the
            # grouped variant: NEXT_STEP autoreset returns reset-infos there)
            out = out.replace(**{
                k: jnp.where(pending, 0.0, getattr(out, k))
                for k in ("success", "near_object", "grasp_success",
                          "grasp_reward", "in_place_reward", "obj_to_target",
                          "unscaled_reward")
            })
        else:
            obs, keys, reward = out.obs, vstate.key, out.reward

        done = terminated | truncated
        ep_ret = jnp.where(pending, 0.0, vstate.episode_return) + reward
        ep_len = jnp.where(pending, 0, vstate.episode_length) + 1

        new_state = FusedState(
            env=env,
            key=keys,
            pending_reset=done if self.autoreset else jnp.zeros_like(done),
            episode_return=ep_ret,
            episode_length=ep_len,
            goal_idx=vstate.goal_idx,
        )
        cat = {
            "obs": self._augment(obs),
            "reward": reward,
            "terminated": terminated,
            "truncated": truncated,
            "done": done,
            "episode_return": ep_ret,
            "episode_length": ep_len,
            "success": out.success,
            "near_object": out.near_object,
            "grasp_success": out.grasp_success,
            "grasp_reward": out.grasp_reward,
            "in_place_reward": out.in_place_reward,
            "obj_to_target": out.obj_to_target,
            "unscaled_reward": out.unscaled_reward,
        }
        return new_state, cat


def from_benchmark(bench, split: str = "train", envs_per_task: int = 1,
                   fused: bool = True, reward_function_version: str = "v2",
                   **kwargs) -> BatchedEnvs:
    """Build a batch from a Benchmark: `envs_per_task` slots per env class,
    goals drawn from that env's goal table (the reference's one-sub-env-per-
    task vector layout, ref make_mt_envs __init__.py:460-513).
    `reward_function_version` selects "v2" (default) or the legacy "v1"
    reward family (ref sawyer_xyz_env.py:187)."""
    from metaworld_tpu.envs import registry

    classes = bench.train_classes if split == "train" else bench.test_classes
    tasks = bench.train_tasks if split == "train" else bench.test_tasks
    names = list(classes.keys())
    if reward_function_version == "v2":
        specs = [classes[n] for n in names]
    else:
        specs = [registry.get_spec(n, reward_function_version) for n in names]
    counts = [envs_per_task] * len(names)
    tables = [bench.goal_table(n, split) for n in names]
    visible = [not any(t.partially_observable for t in tasks if t.env_name == n)
               for n in names]
    cls = FusedBatchedEnvs if fused else BatchedEnvs
    return cls(specs, counts, tables, goal_visible=visible, **kwargs)
