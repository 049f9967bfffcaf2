"""Spectral dispersion support: wavelength <-> RGB and Cauchy IOR.

Reference: src/yafraycore/spectrum.cc + include/yafraycore/spectrum.h:24-40
— wl2rgb conversion and CauchyCoefficients(IOR, dispersion_power) used by
the glass material's dispersive branch (glass.cc, mcintegrator.cc:421-628
recursiveRaytrace dispersion handling).

The RGB curve here is an analytic CIE-fit approximation (piecewise
Gaussian-free ramps, normalized so the average over the visible band is
(1,1,1)); the reference tabulates CIE samples — same role, same
normalization convention (energy-preserving over a uniform wavelength
prior).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# visible band sampled by a normalized wavelength w in [0,1]
WL_MIN = 0.380   # microns
WL_MAX = 0.780


def wavelength(w):
    """Normalized sample w in [0,1] -> wavelength in microns."""
    return WL_MIN + (WL_MAX - WL_MIN) * w


def cauchy_coefficients(ior, dispersion_power):
    """n(lambda) = A + B / lambda^2 anchored at the sodium d-line:
    n(0.5893um) = ior; B scaled so n(380nm) - n(780nm) = dispersion_power
    (the reference's CauchyCoefficients contract: zero power = no spread)."""
    spread = 1.0 / (WL_MIN * WL_MIN) - 1.0 / (WL_MAX * WL_MAX)
    b = dispersion_power / spread
    a = ior - b / (0.5893 * 0.5893)
    return a, b


def cauchy_ior(w, a, b):
    """IOR at normalized wavelength w (reference getIOR, spectrum.h)."""
    lam = wavelength(w)
    return a + b / (lam * lam)


def wl2rgb(w):
    """Normalized wavelength w in [0,1] -> linear RGB weight [..., 3].

    Piecewise-linear CIE-like response; scaled such that integrating over
    w in [0,1] yields ~(1,1,1): a dispersive path sampled with a uniform
    wavelength prior stays energy-neutral (reference wl2rgb + its *3
    normalization in mcintegrator.cc dispersive branch)."""
    lam = wavelength(w) * 1000.0   # nm
    def ramp(x, lo, hi):
        return jnp.clip((x - lo) / (hi - lo), 0.0, 1.0)
    r = ramp(lam, 540.0, 600.0) + 0.25 * ramp(440.0 - (lam - 380.0), 380.0, 440.0) * (lam < 440.0)
    g = ramp(lam, 470.0, 530.0) * (1.0 - ramp(lam, 590.0, 680.0))
    b = (1.0 - ramp(lam, 450.0, 510.0))
    rgb = jnp.stack([r, g, b], axis=-1)
    # normalize average response to 1 per channel (precomputed on the grid)
    wgrid = np.linspace(0.0, 1.0, 256)
    lamg = (WL_MIN + (WL_MAX - WL_MIN) * wgrid) * 1000.0
    def rampn(x, lo, hi):
        return np.clip((x - lo) / (hi - lo), 0.0, 1.0)
    rn = rampn(lamg, 540.0, 600.0) + 0.25 * rampn(440.0 - (lamg - 380.0), 380.0, 440.0) * (lamg < 440.0)
    gn = rampn(lamg, 470.0, 530.0) * (1.0 - rampn(lamg, 590.0, 680.0))
    bn = 1.0 - rampn(lamg, 450.0, 510.0)
    norm = np.array([rn.mean(), gn.mean(), bn.mean()], np.float32)
    return rgb / jnp.asarray(np.maximum(norm, 1e-6))
