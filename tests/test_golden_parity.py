"""Generic parity tests against the golden reference traces, parametrized
over every implemented task. New task modules get covered automatically."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metaworld_tpu.envs import registry
from metaworld_tpu.envs.core import env_reset, env_step
from metaworld_tpu.policies import get_policy, implemented_policies


def _implemented():
    return registry.implemented_envs()


@pytest.mark.parametrize("name", implemented_policies())
def test_policy_parity(name, golden):
    """Our branchless policy must reproduce the reference policy's actions on
    the reference's own observations. Near decision boundaries f32 vs f64 can
    flip a branch, so we demand 98% of steps agree tightly.

    (The golden generator passes the reference policies a COPY of the obs —
    the two door policies mutate the obs array in place through numpy views,
    ref sawyer_door_close_v3_policy.py:40 — so the recorded obs are pristine.)
    """
    d = golden(name)
    pol = jax.jit(jax.vmap(get_policy(name)))
    obs_in = d["obs"]
    ours = np.asarray(pol(jnp.asarray(obs_in)))
    ref = d["action"]
    err = np.abs(ours - ref).max(axis=1)
    frac_bad = float((err > 1e-4).mean())
    assert frac_bad < 0.02, f"{name}: {frac_bad:.1%} of steps mismatch (max {err.max():.4f})"


@pytest.mark.parametrize("name", _implemented())
def test_closed_loop_success(name, golden):
    """The scripted expert must solve the task on OUR engine with the golden
    task vector — the reference's behavioral gold standard
    (ref tests/.../test_scripted_policies.py asserts >= 0.80 over 50 goals;
    here: the recorded goal must succeed)."""
    d = golden(name)
    spec = registry.get_spec(name)
    rand = np.zeros(12)
    rv = d["attr_last_rand_vec"]
    rand[: rv.shape[0]] = rv
    policy = get_policy(name)

    @jax.jit
    def rollout(rand_vec, key):
        state, obs = env_reset(spec, rand_vec, key, goal_visible=1.0)

        def body(carry, _):
            state, obs = carry
            state, out = env_step(spec, state, policy(obs))
            return (state, out.obs), out.success

        (_, _), succ = jax.lax.scan(body, (state, obs), None, length=500)
        return succ

    succ = rollout(jnp.asarray(rand), jax.random.PRNGKey(0))
    assert float(jnp.max(succ)) == 1.0, f"{name}: scripted policy failed on our engine"


@pytest.mark.parametrize("name", _implemented())
def test_obs_layout(name, golden):
    """Obs layout invariants (ref tests/helpers.py:4-33): hand, gripper,
    object block, frame stack, goal."""
    d = golden(name)
    spec = registry.get_spec(name)
    rand = np.zeros(12)
    rv = d["attr_last_rand_vec"]
    rand[: rv.shape[0]] = rv
    state, obs = env_reset(spec, jnp.asarray(rand), jax.random.PRNGKey(0), 1.0)
    obs = np.asarray(obs)
    assert obs.shape == (39,)
    ref0 = d["obs0"]
    np.testing.assert_allclose(obs[:3], ref0[:3], atol=8e-3)
    assert 0.0 <= obs[3] <= 1.0
    # object block: within 2 cm of the reference at reset.
    # window-close is exempt: the reference's reset observation reads the
    # handle site BEFORE mj_forward, so its obs0 reflects the stale q=0
    # pose (off by the full 0.2 slide); ours is fresh.
    if name != "window-close-v3":
        np.testing.assert_allclose(obs[4:7], ref0[4:7], atol=2e-2)
    np.testing.assert_allclose(obs[18:36], obs[:18], atol=0)
    # goal: reference pins target z to the settled obj geom height (~2.7e-5
    # below the nominal 0.02 for pucks), so allow sub-mm slack
    np.testing.assert_allclose(obs[36:39], ref0[36:39], atol=5e-4)
