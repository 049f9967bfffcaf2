"""Glossy-branch recursive raytrace (mcintegrator.cc:487-527).

Round-2 verdict: directlighting/photonmapping handled only perfect
specular chains, so glossy (non-as_diffuse) materials got no indirect
reflection.  These tests pin the new glossy branch in
integrators/raytrace.py.
"""
import dataclasses

import numpy as np
import jax.numpy as jnp

from core_tpu.scenes import cornell_box
from core_tpu.render import RenderOptions, render_image
from core_tpu.integrators.direct import DirectOptions
from core_tpu.materials.base import MatType


def _glossy_cornell(as_diffuse: bool):
    """Cornell box with a glossy tall block; as_diffuse toggles whether
    the AS lobe is integrated as diffuse (declines the glossy branch)."""
    scene = cornell_box(resx=20, resy=20, light_samples=2,
                        block_materials=("white", "glossy"))
    mt = scene.materials
    is_glossy = np.asarray(mt.mtype) == int(MatType.GLOSSY)
    ad = np.asarray(mt.as_diffuse).copy()
    ad[is_glossy] = as_diffuse
    # strong, tight lobe so the indirect reflection is unmistakable
    gr = np.asarray(mt.glossy_reflect).copy()
    gr[is_glossy] = 0.9
    return dataclasses.replace(
        scene, materials=mt._replace(
            as_diffuse=jnp.asarray(ad),
            glossy_reflect=jnp.asarray(gr)))


def _render(scene, raydepth):
    opts = RenderOptions(integrator="directlight",
                         integrator_opts=DirectOptions(raydepth=raydepth),
                         aa_samples=4, spp_chunk=2)
    img, _ = render_image(scene, opts)
    return np.asarray(img)[..., :3]


def test_glossy_indirect_under_directlighting():
    """A glossy block reflects the lit walls: raydepth>0 must add energy
    over raydepth=0 (which shades the block with direct light only)."""
    scene = _glossy_cornell(as_diffuse=False)
    img0 = _render(scene, 0)
    img3 = _render(scene, 3)
    assert np.isfinite(img3).all()
    assert img3.mean() > img0.mean() * 1.01, (img3.mean(), img0.mean())


def test_as_diffuse_glossy_declines_branch():
    """as_diffuse glossy lobes are integrated by the diffuse machinery
    (reference: they report BSDF_DIFFUSE); the glossy chain must NOT
    double-add for them — raydepth only changes the image within noise."""
    scene = _glossy_cornell(as_diffuse=True)
    img0 = _render(scene, 0)
    img3 = _render(scene, 3)
    # identical QMC streams, no specular/glossy branch taken -> tiny diff
    assert np.abs(img3 - img0).mean() < 5e-3, np.abs(img3 - img0).mean()
