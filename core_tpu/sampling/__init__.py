from core_tpu.sampling import qmc, utils  # noqa: F401
