from core_tpu.geometry.mesh import GeomData, MeshAssembler  # noqa: F401
from core_tpu.geometry import intersect  # noqa: F401
