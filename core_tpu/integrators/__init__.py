from core_tpu.integrators import common, direct  # noqa: F401
