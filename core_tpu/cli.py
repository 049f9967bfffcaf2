"""CLI frontend — the reference's thebounty-xml loader.

Mirrors src/xml_loader/xml-loader.cc:39-287 flag-for-flag where meaningful:
output format/path, threads (-> device note), z-buffer, verbosity, and
CLI overrides layered over XML render params.

    python -m core_tpu scene.xml [output] [-f png|hdr|tga] [-z] [-v N]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time


def build_argparser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="core_tpu",
        description="TPU-native renderer: render a scene XML file")
    ap.add_argument("input", help="scene XML file (reference schema)")
    ap.add_argument("output", nargs="?", default="rendered",
                    help="output file base name")
    ap.add_argument("-f", "--format", default="png",
                    choices=["png", "hdr", "tga"], help="output format")
    ap.add_argument("-z", "--z-buffer", action="store_true",
                    help="also write a z-buffer image")
    ap.add_argument("-a", "--alpha", action="store_true",
                    help="write alpha channel")
    ap.add_argument("-v", "--verbosity", type=int, default=2,
                    help="0 mute, 1 errors, 2 info, 3 debug")
    ap.add_argument("--spp", type=int, default=None,
                    help="override AA_minsamples")
    ap.add_argument("--passes", type=int, default=None,
                    help="override AA_passes")
    ap.add_argument("--resx", type=int, default=None)
    ap.add_argument("--resy", type=int, default=None)
    ap.add_argument("--devices", type=int, default=0,
                    help="shard render over N devices (0 = single)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("-t", "--threads", type=int, default=-1,
                    help="reference -t flag; on TPU this maps to device "
                         "count (-1 = all, like pthreads auto-detect)")
    ap.add_argument("--version", action="version",
                    version="core_tpu %s" % __import__("core_tpu").__version__)
    ap.add_argument("-dp", "--draw-params", action="store_true",
                    help="burn render-settings badge into the image "
                         "(reference xml-loader.cc -dp)")
    ap.add_argument("--custom-string", default="",
                    help="extra badge text (reference customString)")
    ap.add_argument("--profile", default=None, metavar="DIR",
                    help="capture a jax.profiler device trace of the "
                         "render into DIR (xprof format)")
    ap.add_argument("--multihost", action="store_true",
                    help="join/initialize the jax.distributed process "
                         "group (CORE_TPU_COORDINATOR/NUM_PROCESSES/"
                         "PROCESS_ID env or pod autodetect) and shard "
                         "the film rows over all hosts' devices")
    return ap


def main(argv=None) -> int:
    args = build_argparser().parse_args(argv)
    if args.devices == 0 and args.threads > 1:
        args.devices = args.threads   # -t N == shard over N devices
    from core_tpu.utils.logger import logger, set_verbosity
    set_verbosity(args.verbosity)
    from core_tpu.utils.timer import timer

    with timer("parse"):
        from core_tpu.io.xml_loader import parse_xml_scene
        scene, opts = parse_xml_scene(args.input)
    import dataclasses
    if args.spp:
        opts = dataclasses.replace(opts, aa_samples=args.spp)
    if args.passes:
        opts = dataclasses.replace(opts, aa_passes=args.passes)
    if args.resx or args.resy:
        cam = dataclasses.replace(
            scene.camera, resx=args.resx or scene.camera.resx,
            resy=args.resy or scene.camera.resy)
        scene = dataclasses.replace(scene, camera=cam)

    logger.info("scene: %d triangles, %d lights, %d materials",
                scene.geom.n_tris, len(scene.lights),
                scene.materials.mtype.shape[0])
    logger.info("render: %dx%d, integrator=%s, AA %d passes x %d samples",
                scene.camera.resx, scene.camera.resy, opts.integrator,
                opts.aa_passes, opts.aa_samples)

    import contextlib
    prof = contextlib.nullcontext()
    if args.profile:
        from core_tpu.utils.profiler import profile_trace
        prof = profile_trace(args.profile)
    with timer("render"), prof:
        if args.multihost:
            from core_tpu.parallel.distributed import (init_distributed,
                                                       global_mesh)
            init_distributed()
            from core_tpu.parallel.sharding import render_image_rowsharded
            mesh = global_mesh()
            img = render_image_rowsharded(scene, opts, mesh,
                                          verbose=args.verbosity >= 2)
        elif args.devices > 1:
            from core_tpu.parallel.sharding import (make_mesh,
                                                    render_image_rowsharded)
            mesh = make_mesh(args.devices)
            img = render_image_rowsharded(scene, opts, mesh,
                                          verbose=args.verbosity >= 2)
        else:
            from core_tpu.render import render_image
            img, _ = render_image(scene, opts, verbose=args.verbosity >= 2)

    import numpy as np
    img = np.asarray(img)
    if args.draw_params:
        from core_tpu.io.badge import draw_badge, badge_lines
        from core_tpu import __version__
        rt = dict(timer.events()).get("render", 0.0)
        aa = f"AA {opts.aa_passes};{opts.aa_samples};{opts.aa_inc_samples}"
        img = draw_badge(img, badge_lines(__version__, opts.integrator, aa,
                                          rt, args.custom_string))
    out = args.output
    if not out.endswith("." + args.format):
        out = out + "." + args.format

    from core_tpu.io import image as img_io
    with timer("write"):
        if args.format == "hdr":
            img_io.write_hdr(out, img[..., :3])
        elif args.format == "tga":
            img_io.write_tga(out, img, alpha=args.alpha)
        else:
            img_io.write_png(out, img, alpha=args.alpha)
    logger.info("wrote %s", out)

    if args.z_buffer:
        from core_tpu.render import render_zbuffer
        z = np.asarray(render_zbuffer(scene))
        zimg = np.repeat(z[..., None], 3, axis=-1)
        zout = out.rsplit(".", 1)[0] + "_zbuffer." + args.format
        if args.format == "hdr":
            img_io.write_hdr(zout, zimg)
        elif args.format == "tga":
            img_io.write_tga(zout, zimg)
        else:
            img_io.write_png(zout, zimg)
        logger.info("wrote %s", zout)
    for name, secs in timer.events():
        logger.info("%-8s %.3fs", name, secs)
    return 0


if __name__ == "__main__":
    sys.exit(main())
