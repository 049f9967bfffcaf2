from core_tpu.materials.base import (  # noqa: F401
    BSDF, MatType, MaterialTable, MaterialDef, build_material_table, gather_params,
)
from core_tpu.materials import dispatch  # noqa: F401
