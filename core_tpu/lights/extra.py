"""Registry for additional light types (spot, directional, sun, sphere,
mesh, IES, background-importance).  They register themselves on import."""
from __future__ import annotations

_REGISTRY: dict[type, object] = {}


def register(cls, module):
    _REGISTRY[cls] = module


def module_for(light):
    for cls, mod in _REGISTRY.items():
        if isinstance(light, cls):
            return mod
    raise TypeError(f"unknown light type {type(light)}")
