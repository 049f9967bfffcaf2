"""Bidirectional integrator, debug integrator, checkpoint/resume, progress.

BDPT correctness anchor (SURVEY §4 plan): on the Cornell box the BDPT
estimator must agree with the unidirectional path tracer in expectation —
checked loosely on mean image brightness at small sample counts.
"""
import os

import numpy as np
import jax.numpy as jnp

from core_tpu.scenes import cornell_box
from core_tpu.render import RenderOptions, render_image
from core_tpu.integrators.bidir import BidirOptions
from core_tpu.integrators.path import PathOptions
from core_tpu.integrators.debug import DebugOptions


def test_bidir_matches_path_brightness():
    scene = cornell_box(resx=32, resy=32, light_samples=2,
                        with_blocks=False, intersector="brute")
    img_bd, _ = render_image(scene, RenderOptions(
        integrator="bidirectional",
        integrator_opts=BidirOptions(eye_depth=3, light_depth=3),
        aa_samples=4, spp_chunk=2))
    img_pt, _ = render_image(scene, RenderOptions(
        integrator="pathtracing",
        integrator_opts=PathOptions(path_samples=4, bounces=3, raydepth=0),
        aa_samples=4, spp_chunk=2))
    m_bd = float(jnp.mean(img_bd[..., :3]))
    m_pt = float(jnp.mean(img_pt[..., :3]))
    assert np.isfinite(m_bd) and m_bd > 0
    # loose agreement: same scene energy to within 40% at tiny sample counts
    assert abs(m_bd - m_pt) / m_pt < 0.4, (m_bd, m_pt)


def test_debug_integrator_normals():
    scene = cornell_box(resx=16, resy=16, light_samples=1,
                        with_blocks=False, intersector="brute")
    img, _ = render_image(scene, RenderOptions(
        integrator="debug", integrator_opts=DebugOptions(debug_type="N")))
    img = np.asarray(img)
    assert np.all(np.isfinite(img))
    # remapped normals live in [0,1]; back wall (facing camera, -z) is dark blue
    assert img[..., :3].min() >= 0.0 and img[..., :3].max() <= 1.0


def test_checkpoint_resume_bit_exact(tmp_path, monkeypatch):
    import shutil
    from core_tpu import checkpoint as ck_mod
    scene = cornell_box(resx=16, resy=16, light_samples=1,
                        with_blocks=False, intersector="brute")
    opts = RenderOptions(aa_passes=2, aa_samples=2, aa_inc_samples=2,
                         spp_chunk=2)
    ck = str(tmp_path / "film.ckpt")
    ck_pass1 = str(tmp_path / "film_pass1.ckpt")

    # full render with checkpointing; keep a copy of the pass-1 checkpoint
    orig_save = ck_mod.save_checkpoint

    def save_and_copy(path, film, pass_idx, sample_offs, meta=None):
        orig_save(path, film, pass_idx, sample_offs, meta)
        if pass_idx == 1:
            shutil.copy(path, ck_pass1)

    monkeypatch.setattr(ck_mod, "save_checkpoint", save_and_copy)
    img_full, _ = render_image(scene, opts, checkpoint_path=ck)
    monkeypatch.setattr(ck_mod, "save_checkpoint", orig_save)

    # resume from the mid-render (pass-1) checkpoint -> identical image
    img_resumed, _ = render_image(scene, opts, checkpoint_path=ck_pass1)
    np.testing.assert_allclose(np.asarray(img_resumed),
                               np.asarray(img_full), rtol=1e-5, atol=1e-6)


def test_progress_bar_ticks():
    from core_tpu.utils.monitor import CallbackProgressBar
    scene = cornell_box(resx=16, resy=16, light_samples=1,
                        with_blocks=False, intersector="brute")
    ticks = []
    pb = CallbackProgressBar(lambda d, t, tag: ticks.append((d, t)))
    render_image(scene, RenderOptions(aa_samples=4, spp_chunk=2), progress=pb)
    assert ticks and ticks[-1][0] == ticks[-1][1]
