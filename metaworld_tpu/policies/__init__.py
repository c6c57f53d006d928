"""Scripted expert policies (ref metaworld/policies/__init__.py ENV_POLICY_MAP).

Each policy is a pure function obs(39,) -> action(4,). Registered lazily per
task module under metaworld_tpu/policies/impl_*.py.
"""

from __future__ import annotations

import importlib
from typing import Callable

_POLICIES: dict[str, Callable] = {}


def register_policy(name: str):
    def deco(fn):
        _POLICIES[name] = fn
        return fn

    return deco


def get_policy(name: str) -> Callable:
    if name not in _POLICIES:
        mod = "metaworld_tpu.policies.impl_" + name.replace("-", "_")
        importlib.import_module(mod)
    return _POLICIES[name]


def implemented_policies() -> list[str]:
    from metaworld_tpu.envs.registry import ALL_V3_ENVIRONMENTS

    out = []
    for name in ALL_V3_ENVIRONMENTS:
        try:
            get_policy(name)
            out.append(name)
        except (ImportError, KeyError, ModuleNotFoundError):
            pass
    return out
