"""core_tpu — a TPU-native differentiable path tracer (JAX/XLA/Pallas).

A from-scratch reimplementation of the capabilities of the YafaRay-family
C++ render engine surveyed in SURVEY.md (TheBounty, /root/reference), designed
TPU-first: SoA scene tables, wavefront integrator loops, deterministic
scatter-add film, pjit/shard_map multi-chip scaling.
"""

__version__ = "0.1.0"

from core_tpu import mathutils  # noqa: F401
