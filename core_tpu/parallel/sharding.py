"""Multi-chip / multi-host sharding of the render and train loops.

The reference's entire parallelism stack is single-node pthreads over image
tiles pulled from a work queue (renderWorker_t / imageSpliter_t,
src/yafraycore/integrator.cc:45-227, src/yafraycore/imagesplitter.cc).
TPU-native equivalent: a 2-D device mesh

    ("tiles", "spp")   — pixel-row blocks x sample blocks

with the render step `shard_map`ped over it.  Each device traces the ray
wavefront for (its row block) x (its slice of samples-per-pixel) and splats
into a full-size local film; films are `psum`med over the mesh, which rides
ICI.  Static tile assignment replaces the mutex work queue: every row block
costs the same wavefront shape, so there is no load imbalance to steal.

Gradients: the train step is jax.grad *through* shard_map; the transpose of
the film psum distributes the cotangent, and scene-parameter gradients are
psum-reduced across the mesh — XLA overlaps these collectives with the
backward sweep (BASELINE config #5).
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from core_tpu import film as film_mod
from core_tpu.film import Film
from core_tpu.render import RenderOptions, render_chunk, scene_material_types
from core_tpu.diff import apply_params


def make_mesh(n_devices: Optional[int] = None, spp_parallel: int = 1) -> Mesh:
    """Mesh over ("tiles", "spp").  spp_parallel devices share each tile and
    split the per-pixel sample load (the reference's adaptive-pass sample
    decomposition, integrator.cc:157-164, mapped onto chips)."""
    devs = jax.devices()
    n = len(devs) if n_devices is None else n_devices
    if len(devs) < n:
        # single-accelerator dev box: validate sharding on the virtual CPU
        # mesh (xla_force_host_platform_device_count)
        devs = jax.devices("cpu")
    if len(devs) < n:
        raise ValueError(f"need {n} devices, have {len(devs)}")
    devs = devs[:n]
    if n % spp_parallel != 0:
        raise ValueError(f"{n} devices not divisible by spp_parallel={spp_parallel}")
    arr = np.asarray(devs).reshape(n // spp_parallel, spp_parallel)
    return Mesh(arr, ("tiles", "spp"))


def _row_block(h: int, n_tiles: int) -> int:
    if h % n_tiles != 0:
        raise ValueError(f"image height {h} not divisible by {n_tiles} tile shards")
    return h // n_tiles


def render_chunk_sharded(scene, types_present, opts: RenderOptions,
                         film: Film, mesh: Mesh, pass_offs: int, spp: int,
                         sample0: int) -> Film:
    """One sharded wavefront launch: every device renders its (row block,
    spp block) and the films are psum-reduced.  Must run inside jit with
    the mesh's devices available."""
    # the pallas intersector only runs on TPU devices; CPU validation
    # meshes fall back to the jnp brute force
    import dataclasses
    if (scene.intersector == "pallas"
            and mesh.devices.flat[0].platform != "tpu"):
        scene = dataclasses.replace(scene, intersector="brute")
    h, w = scene.camera.resy, scene.camera.resx
    n_tiles = mesh.shape["tiles"]
    n_spp = mesh.shape["spp"]
    rows = _row_block(h, n_tiles)
    if spp % n_spp != 0:
        raise ValueError(f"spp {spp} not divisible by spp shards {n_spp}")
    spp_local = spp // n_spp

    def worker(scene, film):
        ti = jax.lax.axis_index("tiles")
        si = jax.lax.axis_index("spp")
        y0 = ti * rows
        local = film_mod.make_film(h, w)
        local = render_chunk(scene, types_present, opts, local, pass_offs,
                             spp_local, sample0 + si * spp_local, None,
                             y0=y0, rows=rows)
        contrib = jax.lax.psum(local, ("tiles", "spp"))
        return jax.tree.map(lambda a, b: a + b, film, contrib)

    # check_vma=False: the pixel grid is derived from axis_index inside the
    # body, which the varying-axes checker can't prove replicated; the psum
    # at the end makes the output replicated by construction.
    return jax.shard_map(worker, mesh=mesh, in_specs=(P(), P()),
                         out_specs=P(), check_vma=False)(scene, film)


def render_sharded(scene, opts: RenderOptions, mesh: Mesh, spp: int):
    """Full sharded single-pass render -> image [H,W,4] (replicated)."""
    types_present = scene_material_types(scene)
    cam = scene.camera

    @jax.jit
    def go(scene):
        film = film_mod.make_film(cam.resy, cam.resx)
        film = render_chunk_sharded(scene, types_present, opts, film, mesh,
                                    0, spp, 0)
        return film_mod.normalized(film)

    return go(scene)


# ---------------------------------------------------------------------------
# Row-sharded film (the scalable design): each device accumulates ONLY its
# row block (+filter halo) across all sample chunks; the only collectives
# are a per-pass psum over the "spp" axis, one halo ppermute exchange, and
# one all_gather of the owned rows at flush.  Comm/memory per device is
# O(H*W / n_tiles), vs the full-image psum per chunk above (round-2 verdict
# "What's missing" #1; SURVEY §5 Distributed communication backend).
# ---------------------------------------------------------------------------

def _halo_rows(opts: RenderOptions) -> int:
    """Filter footprint overflow outside a row block, in whole rows."""
    fw = film_mod.effective_filterw(opts.filter_size, opts.filter_type)
    return max(1, int(np.ceil(fw - 0.5 + 1e-6)))


def _rowshard_worker(scene, types_present, opts, mesh, spp, pass_offs,
                     sample0, h, w, rows, halo):
    """Per-device body: render own rows into a local (rows+2*halo) film,
    psum over spp shards, exchange halos over the tiles ring.  Returns the
    device's OWNED row block film ([rows, w])."""
    n_tiles = mesh.shape["tiles"]
    n_spp = mesh.shape["spp"]
    spp_local = spp // n_spp
    ti = jax.lax.axis_index("tiles")
    si = jax.lax.axis_index("spp")
    y0 = ti * rows
    local = film_mod.make_film(rows + 2 * halo, w)
    done = 0
    while done < spp_local:
        chunk = min(opts.spp_chunk, spp_local - done)
        local = render_chunk(scene, types_present, opts, local, pass_offs,
                             chunk, sample0 + si * spp_local + done, None,
                             y0=y0, rows=rows, splat_y0=y0 - halo)
        done += chunk
    if n_spp > 1:
        local = jax.lax.psum(local, "spp")

    def _rows(a, sl):
        # Film.n_density is 0-d (scalar path counter) — pass it through;
        # rgba/weight/density slice on the row axis
        return a[sl] if a.ndim else a

    own = jax.tree.map(lambda a: _rows(a, slice(halo, halo + rows)), local)
    if n_tiles > 1 and halo > 0:
        # my top halo rows belong to tile ti-1 (they land at the END of its
        # own block); my bottom halo rows belong to tile ti+1 (its start)
        top = jax.tree.map(lambda a: _rows(a, slice(None, halo)), local)
        bottom = jax.tree.map(lambda a: _rows(a, slice(halo + rows, None)),
                              local)
        from_next = jax.lax.ppermute(
            top, "tiles", [(t, t - 1) for t in range(1, n_tiles)])
        from_prev = jax.lax.ppermute(
            bottom, "tiles", [(t, t + 1) for t in range(n_tiles - 1)])
        own = jax.tree.map(
            lambda o, nx, pv: (o.at[rows - halo:].add(nx).at[:halo].add(pv)
                               if o.ndim else o),
            own, from_next, from_prev)
    return own


def render_rowsharded(scene, opts: RenderOptions, mesh: Mesh, spp: int,
                      pass_offs: int = 0, sample0: int = 0):
    """Row-sharded single-pass render -> image [H,W,4] (replicated).

    Ragged heights are padded up to n_tiles row blocks and cropped at
    flush, so any (h, n_tiles) combination works.
    """
    import dataclasses
    if (scene.intersector == "pallas"
            and mesh.devices.flat[0].platform != "tpu"):
        scene = dataclasses.replace(scene, intersector="brute")
    types_present = scene_material_types(scene)
    h, w = scene.camera.resy, scene.camera.resx
    n_tiles = mesh.shape["tiles"]
    n_spp = mesh.shape["spp"]
    if spp % n_spp != 0:
        raise ValueError(f"spp {spp} not divisible by spp shards {n_spp}")
    rows = -(-h // n_tiles)
    halo = _halo_rows(opts)

    def worker(scene):
        own = _rowshard_worker(scene, types_present, opts, mesh, spp,
                               pass_offs, sample0, h, w, rows, halo)
        img_own = film_mod.normalized(own)            # [rows, w, 4]
        full = jax.lax.all_gather(img_own, "tiles", axis=0, tiled=True)
        return full[:h]

    @jax.jit
    def go(scene):
        return jax.shard_map(worker, mesh=mesh, in_specs=P(),
                             out_specs=P(), check_vma=False)(scene)

    return go(scene)


def make_train_step_rowsharded(scene, opts: RenderOptions, mesh: Mesh,
                               spp: int, lr: float = 0.1):
    """Sharded inverse-rendering step with a row-sharded film: the loss is
    reduced per shard and psum'd — NO full image is ever materialized, so
    per-device film memory and comm stay O(H*W / n_tiles).  Gradient psum
    over scene params rides the shard_map transpose (BASELINE config #5).
    """
    import dataclasses
    if (scene.intersector == "pallas"
            and mesh.devices.flat[0].platform != "tpu"):
        scene = dataclasses.replace(scene, intersector="brute")
    types_present = scene_material_types(scene)
    h, w = scene.camera.resy, scene.camera.resx
    n_tiles = mesh.shape["tiles"]
    n_spp = mesh.shape["spp"]
    if spp % n_spp != 0:
        raise ValueError(f"spp {spp} not divisible by spp shards {n_spp}")
    rows = -(-h // n_tiles)
    halo = _halo_rows(opts)

    def loss_fn(params, target):
        sc = apply_params(scene, params)

        def worker(sc, target):
            ti = jax.lax.axis_index("tiles")
            own = _rowshard_worker(sc, types_present, opts, mesh, spp,
                                   0, 0, h, w, rows, halo)
            img_own = film_mod.normalized(own)        # [rows, w, 4]
            tgt_own = jax.lax.dynamic_slice_in_dim(
                jnp.pad(target, ((0, rows * n_tiles - h), (0, 0), (0, 0))),
                ti * rows, rows, axis=0)
            row_ids = ti * rows + jnp.arange(rows)
            valid = (row_ids < h).astype(jnp.float32)[:, None, None]
            d = (img_own[..., :3] - tgt_own[..., :3]) * valid
            sq = jnp.sum(d * d) / (h * w * 3)
            # the film was already psum'd over "spp", so every spp shard
            # holds an identical row block: psum over both axes counts each
            # tile's loss n_spp times — divide it back out
            return jax.lax.psum(sq, ("tiles", "spp")) / n_spp

        return jax.shard_map(worker, mesh=mesh, in_specs=(P(), P()),
                             out_specs=P(), check_vma=False)(sc, target)

    @jax.jit
    def step(params, target):
        loss, grads = jax.value_and_grad(loss_fn)(params, target)
        new_params = jax.tree_util.tree_map(lambda p, g: p - lr * g,
                                            params, grads)
        return loss, new_params

    return step


def make_train_step(scene, opts: RenderOptions, mesh: Mesh, spp: int,
                    lr: float = 0.1):
    """Sharded inverse-rendering step (BASELINE config #5 shape).

    Returns step(params, target) -> (loss, new_params); jit-compiled over
    the mesh, gradient psum handled by shard_map's transpose.
    """
    import dataclasses
    if (scene.intersector == "pallas"
            and mesh.devices.flat[0].platform != "tpu"):
        scene = dataclasses.replace(scene, intersector="brute")
    types_present = scene_material_types(scene)
    cam = scene.camera

    def loss_fn(params, target):
        sc = apply_params(scene, params)
        film = film_mod.make_film(cam.resy, cam.resx)
        film = render_chunk_sharded(sc, types_present, opts, film, mesh,
                                    0, spp, 0)
        img = film_mod.normalized(film)
        d = img[..., :3] - target[..., :3]
        return jnp.mean(d * d)

    @jax.jit
    def step(params, target):
        loss, grads = jax.value_and_grad(loss_fn)(params, target)
        new_params = jax.tree_util.tree_map(lambda p, g: p - lr * g,
                                            params, grads)
        return loss, new_params

    return step


def train_step_sharded(scene, opts: RenderOptions, mesh: Mesh, spp: int,
                       params, target, lr: float = 0.1):
    """One-shot convenience wrapper around make_train_step."""
    return make_train_step(scene, opts, mesh, spp, lr)(params, target)
