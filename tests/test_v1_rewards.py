"""Parity tests for the legacy v1 reward family against reference traces.

tests/golden_v1/*.npz are scripted rollouts of the reference envs built
with reward_function_version="v1" (ref sawyer_xyz_env.py:187), recording
per-step obs/action/reward plus tcp_center. The test evaluates OUR v1
reward function on the reference's own post-step observation and tcp and
demands per-step agreement.

Tolerances: v1 rewards are O(1000) with hard gates at reachDist==0.05, so
a few boundary steps can legitimately flip when our finger-site model
differs from the reference by fractions of a millimetre — a 1% step budget
absorbs that. Rotating-body geometry is read from the live quaternions
(hammer head from obs[7:11]) or injected sim state (nut COM), so every
task holds the default envelope.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metaworld_tpu.envs import registry
from metaworld_tpu.envs.core import env_reset
from metaworld_tpu.rewards.v1 import V1_REWARDS

GOLD = "tests/golden_v1"

# (max fraction of mismatching steps, max p95 relative error) — every
# task now holds the default envelope; the nut-COM injection makes
# assembly/disassemble exact too (measured 0.0000 frac, p95 <= 1.1e-3)
_BOUNDS = {}
# these rewards read the nut COM via sim.obj_pos; the replay injects the
# recorded reference nut_com trace for it
_QPOS_OBJ = {"assembly-v3", "disassemble-v3"}
_DEFAULT_BOUNDS = (0.01, 5e-3)

# the reference door policies mutate the recorded obs in place (see
# tests/test_golden_parity.py); undo before replaying

def _load(name):
    try:
        return np.load(f"{GOLD}/{name}.npz")
    except FileNotFoundError:
        pytest.skip(f"no v1 golden trace for {name}")


@pytest.mark.parametrize("name", sorted(V1_REWARDS))
def test_v1_reward_parity(name):
    d = _load(name)
    spec = registry.get_spec(name, reward_function_version="v1")
    rand = np.zeros(12)
    rv = d["attr_last_rand_vec"]
    rand[: rv.shape[0]] = rv
    state, _ = env_reset(spec, jnp.asarray(rand), jax.random.PRNGKey(0), 1.0)

    obs = d["obs"].copy()
    if name == "hammer-v3":
        # our obs[11:14] IS the nailHead site; the reference's is the
        # nail_link body com — substitute the recorded site
        obs[:, 11:14] = d["nail_head"]
    QPOS = d["nut_com"] if (name in _QPOS_OBJ and "nut_com" in d) else None

    def one(o, a, tcp, qp):
        sim = state.sim.replace(hand=tcp)
        if qp is not None:
            sim = sim.replace(obj_pos=sim.obj_pos.at[0].set(qp))
        st = state.replace(sim=sim)
        return spec.reward_fn(spec, st, o, a).reward

    f = jax.jit(jax.vmap(one, in_axes=(0, 0, 0, None if QPOS is None else 0)))
    qp_arg = None if QPOS is None else jnp.asarray(QPOS[1:])
    # reward[t] is computed from the POST-step obs (ref sawyer_xyz_env.py
    # step(): evaluate_state(self._last_stable_obs)), i.e. obs[t+1]
    ours = np.asarray(f(jnp.asarray(obs[1:]), jnp.asarray(d["action"][:-1]),
                        jnp.asarray(d["tcp"][1:]), qp_arg))
    ref = d["reward"][:-1]

    err = np.abs(ours - ref)
    rel = err / np.maximum(1.0, np.abs(ref))
    bad = (rel > 5e-3) & (err > 0.5)
    max_frac, max_p95 = _BOUNDS.get(name, _DEFAULT_BOUNDS)
    assert bad.mean() <= max_frac, (
        f"{name}: {bad.mean():.1%} of steps mismatch "
        f"(worst abs {err.max():.2f} at t={int(err.argmax())})")
    assert np.percentile(rel, 95) <= max_p95, (
        f"{name}: p95 relative error {np.percentile(rel, 95):.3e}")
    # the reward trajectory must track the reference shape-wise too
    # (gate-boundary flips excluded — the reference itself chatters
    # between -reachDist and the full bonus on consecutive steps)
    ok = ~bad
    if ref[ok].std() > 1.0:
        corr = np.corrcoef(ours[ok], ref[ok])[0, 1]
        assert corr > 0.99, f"{name}: trace correlation {corr:.4f}"


def test_v1_spec_distinct_and_cached():
    v2 = registry.get_spec("reach-v3")
    v1 = registry.get_spec("reach-v3", reward_function_version="v1")
    assert v1.reward_fn is V1_REWARDS["reach-v3"]
    assert v2.reward_fn is not v1.reward_fn
    assert registry.get_spec("reach-v3", "v1") is v1
    with pytest.raises(ValueError):
        registry.get_spec("reach-v3", "v0")


def test_v1_sawyer_env_step():
    from metaworld_tpu import benchmarks
    from metaworld_tpu.gym_adapter import SawyerEnv

    env = SawyerEnv("reach-v3", seed=7, reward_function_version="v1")
    env.set_task(benchmarks.MT1("reach-v3", seed=7).train_tasks[0])
    obs, _ = env.reset()
    obs, r, term, trunc, info = env.step(np.zeros(4))
    # v1 reach reward = max(1000*(margin - d) + exp bonuses, 0): with the
    # hand still at its settle point, margin ~= d, so a small positive value
    assert 0.0 <= r < 100.0
    assert set(info) >= {"success", "near_object", "unscaled_reward"}
    # drive toward the goal for a while: the shaped reward must grow large
    for _ in range(120):
        delta = obs[36:39] - obs[:3]
        obs, r, *_ , info = env.step(
            np.clip(np.array([*(delta * 20.0), 0.0]), -1, 1))
    assert r > 500.0


def test_v1_vector_batch():
    from metaworld_tpu import benchmarks, vector

    bench = benchmarks.MT1("push-v3", seed=3, num_goals=5)
    envs = vector.from_benchmark(bench, envs_per_task=4,
                                 reward_function_version="v1")
    state, obs = envs.reset(jax.random.PRNGKey(0))
    state, out = envs.step(state, np.zeros((envs.num_envs, 4)))
    r = np.asarray(out["reward"])
    assert r.shape == (4,)
    # v1 push reward with no bonus is -reachDist (small negative)
    assert np.all(r < 0.5)
