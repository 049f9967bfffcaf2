from core_tpu.photon.map import (  # noqa: F401
    PhotonMap, shoot_photons, build_photon_grid, gather_photons,
    estimate_irradiance,
)
