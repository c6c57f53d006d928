"""metaworld_tpu: a TPU-native Meta-World.

A from-scratch reimplementation of the Meta-World benchmark (50 Sawyer
manipulation tasks, MT/ML benchmarks, scripted experts, evaluation
protocols) as a batched pure-JAX framework: one jitted, vmapped step for
thousands of env instances per chip, sharded across device meshes.

Public API mirrors the reference (ref metaworld/__init__.py):

    import metaworld_tpu as mw
    bench = mw.MT10(seed=42)                  # benchmarks
    envs  = mw.make_mt_envs("MT10", seed=42)  # batched vector engine
    env   = mw.SawyerEnv("reach-v3", seed=1)  # single-env Gymnasium shim
"""

from metaworld_tpu.benchmarks import (  # noqa: F401
    ML1,
    ML10,
    ML25,
    ML45,
    MT1,
    MT10,
    MT25,
    MT50,
    Benchmark,
    CustomML,
    Task,
)
from metaworld_tpu import evaluation, parallel, vector, wrappers  # noqa: F401
from metaworld_tpu.envs.registry import ALL_V3_ENVIRONMENTS  # noqa: F401
from metaworld_tpu.gym_adapter import (  # noqa: F401
    SawyerEnv,
    make_goal_hidden,
    make_goal_observable,
    make_ml_envs,
    make_ml_envs_test,
    make_ml_envs_train,
    make_mt_envs,
    register_mw_envs,
)

__version__ = "0.1.0"
