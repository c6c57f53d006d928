"""Functional wrapper equivalents of the reference's wrapper stack
(ref metaworld/wrappers.py + the assembly in __init__.py:398-457).

The reference wraps each env instance in up to 9 stateful python wrappers.
Here every wrapper is a pure state transform over the batched engine:
its state is a pytree carried next to the VectorState, so the whole stack
jits into the step and checkpoints by serialization.

Mapping (reference -> here):
  OneHotWrapper                -> BatchedEnvs(one_hot=True)       (vector.py)
  RandomTaskSelectWrapper      -> in-graph goal-table sampling    (vector.py)
  PseudoRandomTaskSelectWrapper-> PseudoRandomGoals (this module)
  AutoTerminateOnSuccessWrapper-> BatchedEnvs(terminate_on_success=True)
  NormalizeRewardsExponential  -> ExponentialRewardNorm
  gymnasium NormalizeReward    -> DiscountedRewardNorm
  gymnasium NormalizeObservation -> ObservationNorm
  RNNBasedMetaRLWrapper        -> RNNMetaRLAugment
  CheckpointWrapper            -> checkpoint()/restore() (pytrees)
  RecordEpisodeStatistics      -> episode_return/length in step infos
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


# ---------------------------------------------------------------------------
# reward normalizers
# ---------------------------------------------------------------------------


@struct.dataclass
class RunningStat:
    mean: jnp.ndarray
    var: jnp.ndarray
    count: jnp.ndarray

    @classmethod
    def create(cls, shape=()):
        return cls(mean=jnp.zeros(shape), var=jnp.ones(shape),
                   count=jnp.asarray(1e-4))

    def update(self, batch):
        b_mean = batch.mean(axis=0)
        b_var = batch.var(axis=0)
        b_count = batch.shape[0]
        delta = b_mean - self.mean
        tot = self.count + b_count
        mean = self.mean + delta * b_count / tot
        m_a = self.var * self.count
        m_b = b_var * b_count
        m2 = m_a + m_b + jnp.square(delta) * self.count * b_count / tot
        return RunningStat(mean=mean, var=m2 / tot, count=tot)


@struct.dataclass
class DiscountedRewardNormState:
    returns: jnp.ndarray   # (n,) running discounted return
    stat: RunningStat


class DiscountedRewardNorm:
    """Gymnasium-style NormalizeReward: scales rewards by the std of the
    discounted return (the reference's reward_normalization_method=
    "gymnasium", __init__.py:430-436)."""

    def __init__(self, num_envs: int, gamma: float = 0.99, eps: float = 1e-8):
        self.gamma = gamma
        self.eps = eps
        self.num_envs = num_envs

    def init(self):
        return DiscountedRewardNormState(
            returns=jnp.zeros(self.num_envs), stat=RunningStat.create()
        )

    def __call__(self, state, reward, done):
        returns = state.returns * self.gamma * (1.0 - done) + reward
        stat = state.stat.update(returns)
        norm = reward / jnp.sqrt(stat.var + self.eps)
        return DiscountedRewardNormState(returns=returns, stat=stat), norm


@struct.dataclass
class ExponentialRewardNormState:
    mean: jnp.ndarray
    var: jnp.ndarray
    initialized: jnp.ndarray


class ExponentialRewardNorm:
    """EMA mean/var normalizer (ref NormalizeRewardsExponential,
    wrappers.py:233-258)."""

    def __init__(self, alpha: float = 0.001, eps: float = 1e-8):
        self.alpha = alpha
        self.eps = eps

    def init(self):
        return ExponentialRewardNormState(
            mean=jnp.zeros(()), var=jnp.ones(()), initialized=jnp.zeros((), bool)
        )

    def __call__(self, state, reward, done=None):
        b_mean = reward.mean()
        b_var = reward.var()
        mean = jnp.where(state.initialized,
                         (1 - self.alpha) * state.mean + self.alpha * b_mean,
                         b_mean)
        var = jnp.where(state.initialized,
                        (1 - self.alpha) * state.var + self.alpha * b_var,
                        jnp.maximum(b_var, self.eps))
        norm = (reward - mean) / jnp.sqrt(var + self.eps)
        return ExponentialRewardNormState(
            mean=mean, var=var, initialized=jnp.ones((), bool)
        ), norm


@struct.dataclass
class ObservationNormState:
    stat: RunningStat


class ObservationNorm:
    """Running mean/var observation whitening (the reference's
    normalize_observations=True path, __init__.py:438-443)."""

    def __init__(self, obs_dim: int, eps: float = 1e-8):
        self.obs_dim = obs_dim
        self.eps = eps

    def init(self):
        return ObservationNormState(stat=RunningStat.create((self.obs_dim,)))

    def __call__(self, state, obs):
        stat = state.stat.update(obs)
        norm = (obs - stat.mean) / jnp.sqrt(stat.var + self.eps)
        return ObservationNormState(stat=stat), norm


# ---------------------------------------------------------------------------
# RNN meta-RL observation augmentation
# ---------------------------------------------------------------------------


@struct.dataclass
class RNNMetaRLState:
    prev_action: jnp.ndarray  # (n, 4)
    prev_reward: jnp.ndarray  # (n,)
    prev_done: jnp.ndarray    # (n,)


class RNNMetaRLAugment:
    """Appends [prev_action(4), prev_reward(1), done(1)] to the observation
    for RNN meta-learners (ref RNNBasedMetaRLWrapper, wrappers.py:50-88)."""

    def __init__(self, num_envs: int, normalize_reward: bool = False):
        self.num_envs = num_envs
        self.scale = 0.1 if normalize_reward else 1.0
        self.extra_dims = 6

    def init(self):
        return RNNMetaRLState(
            prev_action=jnp.zeros((self.num_envs, 4)),
            prev_reward=jnp.zeros(self.num_envs),
            prev_done=jnp.zeros(self.num_envs),
        )

    def augment(self, state, obs):
        return jnp.concatenate(
            [obs, state.prev_action,
             (state.prev_reward * self.scale)[:, None],
             state.prev_done[:, None]],
            axis=1,
        )

    def update(self, state, action, reward, done):
        return RNNMetaRLState(
            prev_action=action, prev_reward=reward, prev_done=done.astype(jnp.float32)
        )


# ---------------------------------------------------------------------------
# pseudo-random (cycling) goal selection
# ---------------------------------------------------------------------------


@struct.dataclass
class PseudoRandomGoalState:
    perm: jnp.ndarray     # (n, n_goals) per-env goal permutation
    cursor: jnp.ndarray   # (n,) next index into perm
    key: jnp.ndarray      # (n, 2)


class PseudoRandomGoals:
    """Cycles each env through all goals without repetition, reshuffling each
    epoch (ref PseudoRandomTaskSelectWrapper, wrappers.py:145-204)."""

    def __init__(self, num_envs: int, n_goals: int):
        self.num_envs = num_envs
        self.n_goals = n_goals

    def init(self, key):
        keys = jax.random.split(key, self.num_envs)
        perm = jax.vmap(lambda k: jax.random.permutation(k, self.n_goals))(keys)
        nkeys = jax.vmap(lambda k: jax.random.split(k)[1])(keys)
        return PseudoRandomGoalState(
            perm=perm, cursor=jnp.zeros(self.num_envs, jnp.int32), key=nkeys
        )

    def next_goal(self, state, advance_mask):
        """Returns (new_state, goal_idx (n,)). Envs with advance_mask move
        their cursor; wrapping reshuffles their permutation."""
        idx = jnp.take_along_axis(state.perm, state.cursor[:, None], axis=1)[:, 0]
        cursor = jnp.where(advance_mask, state.cursor + 1, state.cursor)
        wrap = cursor >= self.n_goals

        def reshuffle(k, p):
            k1, k2 = jax.random.split(k)
            return k2, jax.random.permutation(k1, self.n_goals)

        nk, nperm = jax.vmap(reshuffle)(state.key, state.perm)
        perm = jnp.where(wrap[:, None], nperm, state.perm)
        key = jnp.where(wrap[:, None], nk, state.key)
        cursor = jnp.where(wrap, 0, cursor)
        return PseudoRandomGoalState(perm=perm, cursor=cursor, key=key), idx


# ---------------------------------------------------------------------------
# checkpointing
# ---------------------------------------------------------------------------


def checkpoint(vstate, wrapper_states=None) -> bytes:
    """Serialize the full batch state (+ wrapper states) to bytes.

    The reference needs three layers of bespoke pickling (CheckpointWrapper +
    base64 task lists + 4 RNG streams, ref wrappers.py:275-322); here the
    entire environment is a pytree, so a checkpoint is exact by construction.
    """
    from flax import serialization

    payload = {"vstate": vstate}
    if wrapper_states is not None:
        payload["wrappers"] = wrapper_states
    return serialization.to_bytes(payload)


def restore(template_vstate, data: bytes, wrapper_templates=None):
    """Inverse of checkpoint(); templates supply the pytree structure."""
    from flax import serialization

    payload = {"vstate": template_vstate}
    if wrapper_templates is not None:
        payload["wrappers"] = wrapper_templates
    out = serialization.from_bytes(payload, data)
    if wrapper_templates is not None:
        return out["vstate"], out["wrappers"]
    return out["vstate"]


# ---------------------------------------------------------------------------
# wrapper-stack assembly
# ---------------------------------------------------------------------------


class EnvPipeline:
    """The reference's per-env wrapper assembly as ONE jitted state
    transform (ref metaworld/__init__.py:398-457, `_init_each_env`).

    Wrapper order matches the reference's nesting (inner -> outer):
    engine (TimeLimit + AutoTerminateOnSuccess + OneHot are engine flags)
    -> RNN meta-RL obs augmentation -> reward normalization -> observation
    normalization. The RNN wrapper therefore sees raw rewards, and the
    observation normalizer whitens the augmented observation, exactly like
    the reference's stack.

    State is the tuple (vstate, rnorm_state, onorm_state, rnn_state) — a
    pytree, so the whole stack checkpoints via `checkpoint()`/`restore()`
    and jits into a single XLA program.
    """

    def __init__(self, envs, reward_normalization_method: str | None = None,
                 normalize_observations: bool = False,
                 recurrent_info_in_obs: bool = False,
                 normalize_rnn_reward: bool = False,
                 reward_norm_gamma: float = 0.99):
        assert reward_normalization_method in (None, "none", "gymnasium",
                                               "exponential"), \
            reward_normalization_method
        self.envs = envs
        self.num_envs = envs.num_envs
        self.rnorm = None
        if reward_normalization_method == "gymnasium":
            self.rnorm = DiscountedRewardNorm(envs.num_envs,
                                              gamma=reward_norm_gamma)
        elif reward_normalization_method == "exponential":
            self.rnorm = ExponentialRewardNorm()
        self.rnn = (RNNMetaRLAugment(envs.num_envs, normalize_rnn_reward)
                    if recurrent_info_in_obs else None)
        self.obs_dim = envs.obs_dim + (self.rnn.extra_dims if self.rnn else 0)
        self.onorm = (ObservationNorm(self.obs_dim)
                      if normalize_observations else None)

    # -- state plumbing ----------------------------------------------------

    def reset(self, key):
        vstate, obs = self.envs.reset(key)
        rnorm_s = self.rnorm.init() if self.rnorm else None
        rnn_s = self.rnn.init() if self.rnn else None
        if self.rnn:
            obs = self.rnn.augment(rnn_s, obs)
        onorm_s = self.onorm.init() if self.onorm else None
        if self.onorm:
            onorm_s, obs = self.onorm(onorm_s, obs)
        return (vstate, rnorm_s, onorm_s, rnn_s), obs

    def step(self, state, actions):
        vstate, rnorm_s, onorm_s, rnn_s = state
        vstate, out = self.envs.step(vstate, actions)
        out = dict(out)
        done = jnp.logical_or(out["terminated"], out["truncated"])
        raw_reward = out["reward"]
        if self.rnn:
            rnn_s = self.rnn.update(rnn_s, jnp.asarray(actions), raw_reward,
                                    done)
            out["obs"] = self.rnn.augment(rnn_s, out["obs"])
        if self.rnorm:
            rnorm_s, out["reward"] = self.rnorm(rnorm_s, raw_reward,
                                                done.astype(jnp.float32))
        if self.onorm:
            onorm_s, out["obs"] = self.onorm(onorm_s, out["obs"])
        return (vstate, rnorm_s, onorm_s, rnn_s), out

    def __getattr__(self, name):
        # delegate everything else (task_names, goal tables, ...) to the
        # underlying engine, like a gymnasium wrapper would
        return getattr(self.envs, name)
