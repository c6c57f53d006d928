"""Gymnasium-compatible adapter + public env factories.

Gives users of the reference the same surface (ref metaworld/__init__.py:
460-823): `make_mt_envs`, `make_ml_envs{,_train,_test}`, `register_mw_envs`
(gym.make("Meta-World/MT1") etc.), plus single-env `SawyerEnv` with the
reference's step/reset/set_task API. Under the hood everything calls the
jitted functional core; the adapter only shuttles numpy at the boundary.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import numpy as np

from metaworld_tpu import benchmarks
from metaworld_tpu.envs import registry
from metaworld_tpu.envs.core import env_reset, env_step
from metaworld_tpu.types import MAX_PATH_LENGTH, MAX_RAND, info_dict

try:
    import gymnasium as gym
    from gymnasium.spaces import Box

    _HAS_GYM = True
except Exception:  # pragma: no cover
    _HAS_GYM = False


_COMPILED: dict[int, tuple] = {}


def _compiled_fns(spec):
    """One jitted step/reset pair per TaskSpec instance (registry-cached) —
    envs of the same task share the XLA compilation instead of re-tracing
    per object. Keyed by identity: TaskSpec holds numpy arrays."""
    key = id(spec)
    if key not in _COMPILED:
        _COMPILED[key] = (jax.jit(functools.partial(env_step, spec)),
                          jax.jit(functools.partial(env_reset, spec)))
    return _COMPILED[key]


class SawyerEnv(gym.Env if _HAS_GYM else object):
    """Single-env Gymnasium API over the jitted core (the compatibility shim
    for parity testing against the reference; training should use
    metaworld_tpu.vector instead).

    Matches ref SawyerXYZEnv semantics: 4-dim action, 39-dim obs, set_task
    required before step, truncation at 500 steps.
    """

    metadata = {"render_modes": ["rgb_array", "depth_array", "human"],
                "render_fps": 80}

    def __init__(self, env_name: str, seed: int | None = None,
                 render_mode: str | None = None,
                 camera_name: str | None = None,
                 width: int = 480, height: int = 480,
                 reward_function_version: str = "v2", **_ignored):
        self.env_name = env_name
        self.task_name = env_name
        self.reward_function_version = reward_function_version
        self.spec_ = registry.get_spec(env_name, reward_function_version)
        self.render_mode = render_mode
        self.camera_name = camera_name or "topview"
        self.width = int(width)
        self.height = int(height)
        self.max_path_length = MAX_PATH_LENGTH

        self._step_jit, self._reset_jit = _compiled_fns(self.spec_)

        self._rng = np.random.default_rng(seed)
        self._key = jax.random.PRNGKey(seed if seed is not None else 0)
        self._task_vec: np.ndarray | None = None
        self._goal_visible = 1.0
        self._state = None
        self._set_task_called = False
        self.seeded_rand_vec = seed is not None

        if _HAS_GYM:
            self.action_space = Box(-np.ones(4, np.float32),
                                    np.ones(4, np.float32))
            from metaworld_tpu.envs.core import obs_bounds

            lo, hi = obs_bounds(self.spec_, True)
            self.observation_space = Box(lo.astype(np.float64),
                                         hi.astype(np.float64))

    # -- reference API ---------------------------------------------------
    def seed(self, seed: int):
        self._rng = np.random.default_rng(seed)
        self._key = jax.random.PRNGKey(seed)
        self.seeded_rand_vec = True
        return [seed]

    def set_task(self, task: benchmarks.Task) -> None:
        assert task.env_name == self.env_name
        self._task_vec = np.asarray(task.rand_vec)
        self._goal_visible = 0.0 if task.partially_observable else 1.0
        self._set_task_called = True

    def _sample_vec(self) -> np.ndarray:
        """Seeded-env goal sampling replays the reference's np_random
        stream exactly: double reset_model draw + per-task rejection
        (ref sawyer_xyz_env.py:697-710; reset :664-682)."""
        return benchmarks.draw_reset_vec(self.spec_, self.env_name, self._rng)

    def reset(self, seed: int | None = None, options=None):
        if seed is not None:
            self.seed(seed)
        vec = self._task_vec if self._task_vec is not None else self._sample_vec()
        padded = np.zeros(MAX_RAND)
        padded[: vec.shape[0]] = vec
        self._key, sub = jax.random.split(self._key)
        self._state, obs = self._reset_jit(jnp.asarray(padded), sub,
                                           self._goal_visible)
        self.curr_path_length = 0
        return np.asarray(obs, dtype=np.float64), {}

    def step(self, action):
        if not self._set_task_called and self._task_vec is None \
                and not self.seeded_rand_vec:
            raise RuntimeError("You must call env.set_task or seed the env "
                               "before stepping (ref sawyer_xyz_env.py:161-173)")
        assert self._state is not None, "call reset() first"
        if self.curr_path_length >= self.max_path_length:
            raise ValueError("You must reset the env manually once truncate==True")
        self._state, out = self._step_jit(self._state, jnp.asarray(action))
        self.curr_path_length += 1
        info = {k: float(np.asarray(v)) for k, v in info_dict(out).items()}
        return (
            np.asarray(out.obs, dtype=np.float64),
            float(out.reward),
            bool(out.terminated),
            bool(out.truncated),
            info,
        )

    # -- state get/set + pickling (ref SawyerMocapBase, sawyer_xyz_env.py:
    # 87-131: get_env_state/set_env_state/__getstate__/__setstate__) -------
    def get_env_state(self):
        """Snapshot of the full env state (the reference returns
        (qpos, qvel); here the whole EnvState pytree serializes exactly)."""
        from flax import serialization

        return (serialization.to_bytes(self._state), self.curr_path_length,
                np.asarray(jax.device_get(self._key)))

    def set_env_state(self, snapshot) -> None:
        from flax import serialization

        blob, path_length, key = snapshot
        assert self._state is not None, "reset() once before set_env_state"
        self._state = serialization.from_bytes(self._state, blob)
        self.curr_path_length = path_length
        self._key = jnp.asarray(key)

    def __getstate__(self):
        state = None
        if self._state is not None:
            state = self.get_env_state()
        return {
            "env_name": self.env_name,
            "render_mode": self.render_mode,
            "camera_name": self.camera_name,
            "reward_function_version": self.reward_function_version,
            "task_vec": self._task_vec,
            "goal_visible": self._goal_visible,
            "set_task_called": self._set_task_called,
            "seeded_rand_vec": self.seeded_rand_vec,
            "rng": self._rng,
            "key": np.asarray(jax.device_get(self._key)),
            "env_state": state,
        }

    def __setstate__(self, d):
        self.__init__(d["env_name"], render_mode=d["render_mode"],
                      camera_name=d["camera_name"],
                      reward_function_version=d["reward_function_version"])
        self._task_vec = d["task_vec"]
        self._goal_visible = d["goal_visible"]
        self._set_task_called = d["set_task_called"]
        self.seeded_rand_vec = d["seeded_rand_vec"]
        self._rng = d["rng"]
        self._key = jnp.asarray(d["key"])
        if d["env_state"] is not None:
            self.reset()
            self.set_env_state(d["env_state"])

    def render(self):
        """rgb_array / depth_array from the configured camera (ref cameras
        topview/corner/corner2/corner3/corner4/behindGripper/gripperPOV,
        xyz_base.xml:16-20,152-153; width/height per _init_each_env,
        ref __init__.py:407-410). "human" displays the frame and returns
        None (gymnasium semantics, ref docs/rendering/rendering.md): a
        matplotlib window when a GUI display exists, else frames are
        written under ./renders/<env>/ — the headless-TPU stand-in for
        the reference's GLFW viewer."""
        from metaworld_tpu.render import render_camera

        depth = self.render_mode == "depth_array"
        cam = self.camera_name
        if depth and cam == "topview":
            cam = "corner"
        img = render_camera(self.spec_, self._state, camera=cam, depth=depth,
                            width=self.width, height=self.height)
        if self.render_mode != "human":
            return img
        self._human_frame_idx = getattr(self, "_human_frame_idx", -1) + 1
        try:
            import os
            if os.environ.get("DISPLAY"):
                import matplotlib.pyplot as plt
                if not hasattr(self, "_human_fig"):
                    plt.ion()
                    self._human_fig, ax = plt.subplots()
                    self._human_im = ax.imshow(img)
                    ax.set_axis_off()
                else:
                    self._human_im.set_data(img)
                self._human_fig.canvas.draw_idle()
                self._human_fig.canvas.flush_events()
                return None
        except Exception:  # no GUI backend — fall through to file frames
            pass
        import pathlib

        import numpy as _np
        out = pathlib.Path("renders") / self.env_name
        out.mkdir(parents=True, exist_ok=True)
        try:
            from PIL import Image
            Image.fromarray(_np.asarray(img)).save(
                out / f"{self._human_frame_idx:06d}.png")
        except Exception:
            _np.save(out / f"{self._human_frame_idx:06d}.npy",
                     _np.asarray(img))
        return None


# ---------------------------------------------------------------------------
# goal-hidden / goal-observable factories (ref env_dict.py:130-212)
# ---------------------------------------------------------------------------


def make_goal_hidden(env_name: str, seed: int | None = None) -> SawyerEnv:
    """Env whose goal is hidden from the observation and frozen per reset
    seed (ref _create_hidden_goal_envs)."""
    env = SawyerEnv(env_name, seed=seed)
    env._goal_visible = 0.0
    return env


def make_goal_observable(env_name: str, seed: int | None = None) -> SawyerEnv:
    """(ref _create_observable_goal_envs)"""
    env = SawyerEnv(env_name, seed=seed)
    env._goal_visible = 1.0
    return env


# ---------------------------------------------------------------------------
# vector factories (ref metaworld/__init__.py:460-604)
# ---------------------------------------------------------------------------


_PIPELINE_KWARGS = ("reward_normalization_method", "normalize_observations",
                    "recurrent_info_in_obs", "normalize_rnn_reward",
                    "reward_norm_gamma")


def _split_pipeline_kwargs(kwargs):
    return {k: kwargs.pop(k) for k in list(kwargs) if k in _PIPELINE_KWARGS}


def _maybe_pipeline(envs, pipe_kwargs):
    """Assemble the reference's wrapper stack around the engine when any of
    _init_each_env's normalization/augmentation kwargs are requested
    (ref metaworld/__init__.py:398-457)."""
    if not pipe_kwargs:
        return envs
    from metaworld_tpu.wrappers import EnvPipeline

    return EnvPipeline(envs, **pipe_kwargs)


def make_mt_envs(name: str, seed: int | None = None, num_goals: int = 50,
                 envs_per_task: int = 1, use_one_hot: bool = False,
                 terminate_on_success: bool = False,
                 max_episode_steps: int = MAX_PATH_LENGTH, **kwargs):
    """MT benchmark batch (ref make_mt_envs :460-513). `name` is an env name
    (-> MT1) or one of MT10/MT25/MT50. Accepts the reference's wrapper-stack
    kwargs (reward_normalization_method, normalize_observations,
    recurrent_info_in_obs) and returns an EnvPipeline when any are set."""
    from metaworld_tpu import vector

    if name in ("MT10", "MT25", "MT50"):
        bench = getattr(benchmarks, name)(seed=seed, num_goals=num_goals)
    else:
        bench = benchmarks.MT1(name, seed=seed, num_goals=num_goals)
    pk = _split_pipeline_kwargs(kwargs)
    envs = vector.from_benchmark(
        bench,
        envs_per_task=envs_per_task,
        one_hot=use_one_hot,
        terminate_on_success=terminate_on_success,
        max_episode_steps=max_episode_steps,
        **kwargs,
    )
    return _maybe_pipeline(envs, pk)


def make_ml_envs(name: str, seed: int | None = None,
                 meta_batch_size: int = 20, split: str = "train",
                 num_goals: int = 50, **kwargs):
    """ML benchmark batch (ref make_ml_envs :565-593): `meta_batch_size` env
    slots striped over the split's envs (ref task striping :540)."""
    from metaworld_tpu import vector

    if name in ("ML10", "ML25", "ML45"):
        bench = getattr(benchmarks, name)(seed=seed, num_goals=num_goals)
    else:
        bench = benchmarks.ML1(name, seed=seed, num_goals=num_goals)
    classes = bench.train_classes if split == "train" else bench.test_classes
    n_envs = len(classes)
    assert meta_batch_size % n_envs == 0, (
        "meta_batch_size must be divisible by the number of envs "
        "(ref __init__.py:518-524)"
    )
    pk = _split_pipeline_kwargs(kwargs)
    envs = vector.from_benchmark(
        bench, split=split, envs_per_task=meta_batch_size // n_envs, **kwargs
    )
    return _maybe_pipeline(envs, pk)


# the reference partials pin pseudorandom task selection for the meta
# protocol (ref __init__.py:594-603)
make_ml_envs_train = functools.partial(
    make_ml_envs, split="train", terminate_on_success=False,
    task_select="pseudorandom")
make_ml_envs_test = functools.partial(
    make_ml_envs, split="test", terminate_on_success=True,
    task_select="pseudorandom")



class GymVectorBatch(gym.vector.VectorEnv if _HAS_GYM else object):
    """gymnasium.vector.VectorEnv facade over a batched engine/pipeline —
    numpy in/out, device state held internally, in-graph autoreset. Lets the
    jitted batch drop into code written for the reference's
    `gym.make_vec("Meta-World/MT10", ...)` (ref register_mw_envs
    __init__.py:630-779)."""

    def __init__(self, envs, seed=None):
        if _HAS_GYM:
            try:
                self.metadata = {"autoreset_mode":
                                 gym.vector.AutoresetMode.NEXT_STEP}
            except AttributeError:  # older gymnasium
                self.metadata = {}
        self.envs = envs
        self.num_envs = envs.num_envs
        if _HAS_GYM:
            from gymnasium.spaces import Box

            self.single_action_space = Box(-np.ones(4, np.float32),
                                           np.ones(4, np.float32))
            d = envs.obs_dim
            self.single_observation_space = Box(
                np.full(d, -np.inf, np.float64), np.full(d, np.inf, np.float64))
            from gymnasium.vector.utils import batch_space

            self.action_space = batch_space(self.single_action_space,
                                            self.num_envs)
            self.observation_space = batch_space(self.single_observation_space,
                                                 self.num_envs)
        self._key = jax.random.PRNGKey(seed if seed is not None else 0)
        self._state = None

    def reset(self, *, seed=None, options=None):
        if seed is not None:
            self._key = jax.random.PRNGKey(seed)
        # split so repeated unseeded resets sample fresh goals (gymnasium
        # semantics: only an explicit seed pins the episode sequence)
        self._key, sub = jax.random.split(self._key)
        # pseudorandom task select resets onto the pinned goals (the
        # reference's sample_tasks_on_reset=False semantics)
        vstate = self._state if getattr(self._engine(), "task_select",
                                        "random") == "pseudorandom" else None
        self._state, obs = self.envs.reset(sub, vstate=vstate)             if vstate is not None else self.envs.reset(sub)
        return np.asarray(obs), {}

    def _engine(self):
        e = self.envs
        while not hasattr(e, "task_select") and hasattr(e, "envs"):
            e = e.envs
        return e

    def step(self, actions):
        assert self._state is not None, "call reset() first"
        self._state, out = self.envs.step(self._state,
                                          jnp.asarray(np.asarray(actions)))
        infos = {k: np.asarray(v) for k, v in out.items()
                 if k not in ("obs", "reward", "terminated", "truncated")}
        # the reference's eval loops read final_info at done steps
        # (ref metaworld/evaluation.py:78-82); the engine's episode_return
        # at the done step already holds the full episode total
        infos["final_info"] = {
            "episode": {"r": infos["episode_return"],
                        "l": infos["episode_length"]},
            "success": infos["success"],
        }
        return (np.asarray(out["obs"]), np.asarray(out["reward"]),
                np.asarray(out["terminated"]), np.asarray(out["truncated"]),
                infos)

    def get_attr(self, name):
        if name == "task_name":
            return self.envs.env_task_names()
        if name == "terminate_on_success":
            return [self.envs.terminate_on_success] * self.num_envs
        return getattr(self.envs, name)

    def call(self, method, *args):
        """`.call` support for the reference's evaluation protocols
        (toggle_terminate_on_success ref evaluation.py:54,96; sample_tasks
        + toggle_sample_tasks_on_reset ref evaluation.py:114-125)."""
        if method == "sample_tasks":
            engine = self._engine()
            assert engine.task_select == "pseudorandom", (
                "sample_tasks needs task_select='pseudorandom' envs "
                "(ref PseudoRandomTaskSelectWrapper)")
            assert self._state is not None, "call reset() first"
            self._state = engine.sample_tasks(self._state)
            return [None] * self.num_envs
        if method == "toggle_sample_tasks_on_reset":
            # pinned (pseudorandom) mode never resamples on reset; random
            # mode always does — the flag is the mode itself, so this is
            # a consistency assertion rather than a mutation
            want = bool(args[0])
            have = self._engine().task_select == "random"
            assert want == have or not want, (
                "toggle_sample_tasks_on_reset(True) requires "
                "task_select='random' envs")
            return [None] * self.num_envs
        if method == "toggle_terminate_on_success":
            engine = self.envs
            while not hasattr(engine, "terminate_on_success"):
                engine = engine.envs     # unwrap EnvPipeline
            flag = bool(args[0])
            # the flag is compiled into the step program; keep one compiled
            # program per flag value so toggling is cheap after the first
            # time (the reference's toggle is a free attribute write,
            # ref evaluation.py:54,96 — a full re-trace per toggle would
            # discard the XLA cache every eval round)
            cache = getattr(engine, "_step_jit_by_flag", None)
            if cache is None:
                cache = engine._step_jit_by_flag = {
                    engine.terminate_on_success: engine._step_jit}
            if flag not in cache:
                engine.terminate_on_success = flag
                cache[flag] = jax.jit(engine._step_impl)
            engine.terminate_on_success = flag
            engine._step_jit = cache[flag]
            return [None] * self.num_envs
        raise AttributeError(method)

    def close(self):
        pass


def register_mw_envs() -> None:
    """Registers the reference's Gymnasium IDs (ref register_mw_envs
    :607-823): Meta-World/MT1, Meta-World/goal_hidden, Meta-World/goal_observable
    for single envs via gym.make; the MT/ML batches are exposed as factories
    because they are jitted batch engines, not per-process python envs."""
    if not _HAS_GYM:
        return
    from gymnasium.envs.registration import register, registry as gym_registry

    if "Meta-World/MT1" in gym_registry:
        return
    register(
        id="Meta-World/MT1",
        entry_point=lambda env_name, seed=None, **kw: SawyerEnv(
            env_name, seed=seed, **kw
        ),
    )
    register(
        id="Meta-World/goal_hidden",
        entry_point=lambda env_name, seed=None, **kw: make_goal_hidden(
            env_name, seed
        ),
    )
    register(
        id="Meta-World/goal_observable",
        entry_point=lambda env_name, seed=None, **kw: make_goal_observable(
            env_name, seed
        ),
    )
    # The reference registers the MT/ML batches as gym.make_vec vector specs
    # (ref register_mw_envs :630-823). Our batches are jitted batch engines,
    # not per-process python envs, so these IDs resolve through gym.make and
    # return the engine (or EnvPipeline) directly.
    def _vec(factory):
        def entry(*args, num_envs=None, **kw):
            seed = kw.pop("seed", None)
            return GymVectorBatch(factory(*args, seed=seed, **kw), seed=seed)
        return entry

    for mt in ("MT10", "MT25", "MT50"):
        register(
            id=f"Meta-World/{mt}",
            vector_entry_point=(lambda _mt: _vec(
                lambda seed=None, **kw: make_mt_envs(_mt, seed=seed, **kw)))(mt),
        )
    register(
        id="Meta-World/ML1-train",
        vector_entry_point=_vec(lambda env_name, seed=None, **kw:
                                make_ml_envs_train(env_name, seed=seed, **kw)),
    )
    register(
        id="Meta-World/ML1-test",
        vector_entry_point=_vec(lambda env_name, seed=None, **kw:
                                make_ml_envs_test(env_name, seed=seed, **kw)),
    )
    for ml in ("ML10", "ML25", "ML45"):
        for split, fn in (("train", make_ml_envs_train),
                          ("test", make_ml_envs_test)):
            register(
                id=f"Meta-World/{ml}-{split}",
                vector_entry_point=(lambda _ml, _fn: _vec(
                    lambda seed=None, **kw: _fn(_ml, seed=seed, **kw)))(ml, fn),
            )
    register(
        id="Meta-World/custom-mt-envs",
        vector_entry_point=_vec(lambda envs_list, seed=None, **kw:
                                _custom_mt(envs_list, seed, **kw)),
    )
    register(
        id="Meta-World/custom-ml-envs",
        vector_entry_point=_vec(
            lambda train_envs, test_envs, seed=None, split="train", **kw:
            _custom_ml(train_envs, test_envs, seed, split, **kw)),
    )


def _custom_mt(envs_list, seed=None, **kw):
    """(ref custom-mt-envs registration :780-800)"""
    from metaworld_tpu import vector

    bench = benchmarks._mt(list(envs_list), seed)
    pk = _split_pipeline_kwargs(kw)
    return _maybe_pipeline(vector.from_benchmark(bench, **kw), pk)


def _custom_ml(train_envs, test_envs, seed=None, split="train", **kw):
    """(ref custom-ml-envs registration :801-823)"""
    from metaworld_tpu import vector

    bench = benchmarks.CustomML(list(train_envs), list(test_envs), seed)
    pk = _split_pipeline_kwargs(kw)
    return _maybe_pipeline(vector.from_benchmark(bench, split=split, **kw), pk)
