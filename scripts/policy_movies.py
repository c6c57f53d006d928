"""Render scripted-policy rollout movies (GIF) for any task and camera.

The TPU-native equivalent of the reference's
scripts/scripted_policy_movies.ipynb (trajectory_generator +
env.sim.render per step): rolls the jitted env with its scripted expert,
renders every k-th frame through metaworld_tpu.render.render_camera, and
writes an animated GIF via PIL. Optional gaussian action noise as a
percentage of the action range, matching the notebook's
`act_noise_pct` knob.

Usage:
  python scripts/policy_movies.py --env door-open-v3 --camera corner
  python scripts/policy_movies.py --env pick-place-v3 --camera gripperPOV \
      --noise 0.1 --out /tmp/movies --width 320 --height 240
"""

from __future__ import annotations

import argparse
import os
from functools import partial

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from PIL import Image  # noqa: E402

from metaworld_tpu import benchmarks  # noqa: E402
from metaworld_tpu.envs import registry  # noqa: E402
from metaworld_tpu.envs.core import env_reset, env_step  # noqa: E402
from metaworld_tpu.policies import get_policy  # noqa: E402
from metaworld_tpu.render import render_camera  # noqa: E402


def rollout_frames(name, camera, width, height, noise_pct, seed, goal,
                   every, quit_on_success=True, max_steps=500):
    spec = registry.get_spec(name)
    bench = benchmarks.MT1(name, seed=seed, num_goals=goal + 1)
    tbl = bench.goal_table(name)
    rand = np.zeros(12)
    rv = np.asarray(tbl[goal])
    rand[: rv.shape[0]] = rv

    step = jax.jit(partial(env_step, spec))
    pol = jax.jit(get_policy(name))
    rng = np.random.default_rng(seed)
    state, obs = env_reset(spec, jnp.asarray(rand), jax.random.PRNGKey(seed),
                           1.0)
    frames = []
    for t in range(max_steps):
        a = np.asarray(pol(obs))
        if noise_pct > 0:
            a = rng.normal(a, noise_pct * 2.0)  # action range is [-1, 1]
        state, out = step(state, jnp.asarray(a))
        obs = out.obs
        if t % every == 0:
            rgb = np.asarray(
                render_camera(spec, state, camera=camera, width=width,
                              height=height))
            frames.append(rgb.astype(np.uint8))
        if quit_on_success and float(out.success) > 0:
            rgb = np.asarray(
                render_camera(spec, state, camera=camera, width=width,
                              height=height))
            frames.append(rgb.astype(np.uint8))
            break
    return frames, t + 1


def write_gif(frames, path, fps):
    imgs = [Image.fromarray(f) for f in frames]
    imgs[0].save(path, save_all=True, append_images=imgs[1:],
                 duration=int(1000 / fps), loop=0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--env", default="pick-place-v3")
    ap.add_argument("--camera", default="corner",
                    help="topview/corner/corner2/corner3/corner4/"
                         "behindGripper/gripperPOV")
    ap.add_argument("--width", type=int, default=240)
    ap.add_argument("--height", type=int, default=180)
    ap.add_argument("--noise", type=float, default=0.0,
                    help="action noise as fraction of the action range")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--goal", type=int, default=0)
    ap.add_argument("--every", type=int, default=4,
                    help="render every k-th control step")
    ap.add_argument("--fps", type=int, default=20)
    ap.add_argument("--out", default="/tmp/mw_movies")
    ap.add_argument("--all", action="store_true",
                    help="render every one of the 50 tasks")
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    names = registry.ALL_V3_ENVIRONMENTS if args.all else [args.env]
    for name in names:
        frames, steps = rollout_frames(
            name, args.camera, args.width, args.height, args.noise,
            args.seed, args.goal, args.every)
        path = os.path.join(args.out, f"{name}-{args.camera}.gif")
        write_gif(frames, path, args.fps)
        print(f"{name}: {steps} steps, {len(frames)} frames -> {path}",
              flush=True)


if __name__ == "__main__":
    main()
