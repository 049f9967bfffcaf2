from core_tpu.lights.base import LightSample, dirac, n_samples, can_intersect  # noqa: F401
from core_tpu.lights.base import illum_sample, illuminate, intersect_light, illum_pdf  # noqa: F401
from core_tpu.lights.area import AreaLight, make_area_light  # noqa: F401
from core_tpu.lights.point import PointLight, make_point_light  # noqa: F401
