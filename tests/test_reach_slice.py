"""End-to-end slice tests for reach-v3: reward parity against golden
reference traces, and a closed-loop scripted-policy rollout on our engine."""

import jax
import jax.numpy as jnp
import numpy as np

from metaworld_tpu.envs import registry
from metaworld_tpu.envs.core import env_reset, env_step
from metaworld_tpu.policies import get_policy
from metaworld_tpu.rewards import utils as reward_utils


def test_reward_parity_reach(golden):
    """Feed reference tcp/target into our reward math: must match the
    recorded rewards (ref sawyer_reach_v3.py:140-162)."""
    d = golden("reach-v3")
    tcp = d["tcp"]          # recorded at obs time t
    target = d["attr_target_pos"]
    hand_init = d["attr_hand_init_pos"]
    rewards = d["reward"]   # reward for transition t -> t+1 (uses tcp at t+1)

    dist = np.linalg.norm(tcp[1:] - target, axis=1)
    margin = np.linalg.norm(hand_init - target)
    in_place = reward_utils.tolerance(
        jnp.asarray(dist), bounds=(0, 0.05), margin=margin, sigmoid="long_tail"
    )
    ours = 10.0 * np.asarray(in_place)
    np.testing.assert_allclose(ours, rewards[:-1], rtol=2e-5, atol=2e-5)


def test_policy_parity_reach(golden):
    """Our jnp policy must reproduce the reference policy's actions on
    reference observations."""
    d = golden("reach-v3")
    pol = jax.jit(jax.vmap(get_policy("reach-v3")))
    acts = np.asarray(pol(jnp.asarray(d["obs"])))
    np.testing.assert_allclose(acts, d["action"], rtol=1e-5, atol=1e-5)


def test_reach_rollout_success(golden):
    """Closed-loop on our engine with the golden task vector: the scripted
    policy must succeed (reference succeeds at step ~41)."""
    d = golden("reach-v3")
    spec = registry.get_spec("reach-v3")
    rand = np.zeros(12)
    rv = d["attr_last_rand_vec"]
    rand[: rv.shape[0]] = rv

    policy = get_policy("reach-v3")

    @jax.jit
    def rollout(rand_vec, key):
        state, obs = env_reset(spec, rand_vec, key, goal_visible=1.0)

        def body(carry, _):
            state, obs = carry
            a = policy(obs)
            state, out = env_step(spec, state, a)
            return (state, out.obs), (out.reward, out.success)

        (state, obs), (rews, succ) = jax.lax.scan(body, (state, obs), None, length=150)
        return rews, succ, obs

    rews, succ, obs = rollout(jnp.asarray(rand), jax.random.PRNGKey(0))
    assert float(jnp.max(succ)) == 1.0, "policy never reached the target"
    first = int(np.argmax(np.asarray(succ) > 0))
    assert first < 80, f"took too long: {first}"
    # obs sanity: hand stays in the hand space
    ref0 = d["obs0"]
    # goal visible: last 3 entries must equal the target
    np.testing.assert_allclose(np.asarray(obs)[-3:], d["attr_target_pos"], atol=1e-5)


def test_reset_obs_matches_reference(golden):
    """Reset-time observation must match the reference's (same task vector):
    hand at hand_init, gripper open, object at rand_vec[:3], frame-stacked."""
    d = golden("reach-v3")
    spec = registry.get_spec("reach-v3")
    rand = np.zeros(12)
    rv = d["attr_last_rand_vec"]
    rand[: rv.shape[0]] = rv
    state, obs = env_reset(spec, jnp.asarray(rand), jax.random.PRNGKey(0), 1.0)
    obs = np.asarray(obs)
    ref = d["obs0"]
    # hand position: within a few mm of the reference's settled hand
    np.testing.assert_allclose(obs[:3], ref[:3], atol=8e-3)
    # gripper open
    assert obs[3] > 0.98
    # object pos exact (we place it exactly; reference sets qpos directly)
    np.testing.assert_allclose(obs[4:7], ref[4:7], atol=1e-6)
    # frame stack seeded with current frame
    np.testing.assert_allclose(obs[18:36], obs[:18], atol=0)
    # goal
    np.testing.assert_allclose(obs[36:39], ref[36:39], atol=1e-6)
