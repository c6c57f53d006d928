"""metaworld_tpu: a TPU-native Meta-World.

A from-scratch reimplementation of the Meta-World benchmark (50 Sawyer
manipulation tasks, MT/ML benchmarks, scripted experts, evaluation
protocols) as a batched pure-JAX framework: one jitted, vmapped step for
thousands of env instances per chip, sharded across device meshes.
"""

__version__ = "0.1.0"
