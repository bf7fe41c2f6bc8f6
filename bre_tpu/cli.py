"""Command-line renderer: ``python -m bre_tpu.cli scene.pbrt``.

Reference: /root/reference/src/main/pbrt.cpp:74-162 — flags --outfile,
--quick, --quiet, --nthreads (accepted for compatibility; the device mesh
replaces the thread pool), --cat (reformatted scene to stdout) and --toply
(same, converting large trianglemeshes to .ply files) — scene/cat.py.
Flow mirrors pbrtInit -> ParseFile -> render -> write (api.cpp:1361-1417).
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="bre_tpu",
        description="TPU-native volumetric photon-mapping renderer (pbrt-compatible scenes)",
    )
    ap.add_argument("scene", help=".pbrt scene file")
    ap.add_argument("--outfile", "-o", default=None, help="override output image path")
    ap.add_argument("--quick", action="store_true",
                    help="reduce iteration counts 16x (pbrt --quick)")
    ap.add_argument("--quiet", action="store_true")
    ap.add_argument("--nthreads", type=int, default=0,
                    help="accepted for pbrt compatibility (mesh-parallel instead)")
    ap.add_argument("--kernel", default=None, choices=["bre", "compat"],
                    help="photonbeam estimator kernel: 'bre' (physically "
                         "normalized, default) or 'compat' (the reference's "
                         "unnormalized 1e-5 kernel + reference-exact photon "
                         "walk, for seed-matched image comparison)")
    ap.add_argument("--cat", action="store_true",
                    help="print reformatted scene to stdout and exit (pbrt --cat)")
    ap.add_argument("--toply", action="store_true",
                    help="like --cat, converting large triangle meshes to PLY "
                         "files next to the scene (pbrt --toply)")
    args = ap.parse_args(argv)

    if args.cat or args.toply:
        from pathlib import Path

        from .scene.cat import cat_scene

        scene_path = Path(args.scene)
        try:
            text = scene_path.read_text()
        except FileNotFoundError:
            print(f"error: scene file not found: {args.scene}", file=sys.stderr)
            return 1
        sys.stdout.write(cat_scene(
            text, include_dir=scene_path.parent,
            toply_dir=scene_path.parent if args.toply else None,
        ))
        return 0

    import numpy as np

    from .io.image import write_image
    from .scene.parser import parse_file
    from .utils.compile_cache import enable_persistent_cache

    # Spec renders are compile-dominated (BASELINE.md round-4: ~97% of the
    # config-3 wall was XLA compile); persist executables across processes.
    enable_persistent_cache()

    t0 = time.time()
    try:
        ps = parse_file(args.scene)
    except FileNotFoundError:
        print(f"error: scene file not found: {args.scene}", file=sys.stderr)
        return 1
    scene = ps.build()
    if ps.camera is None:
        print("error: scene has no Camera directive", file=sys.stderr)
        return 1
    if not args.quiet:
        print(
            f"bre_tpu: parsed {args.scene}: {scene.n_spheres} spheres, "
            f"{scene.n_triangles} triangles, {scene.n_lights} lights, "
            f"{scene.n_media} media; integrator={ps.integrator_name} "
            f"{ps.width}x{ps.height}"
        )

    p = ps.integrator_params
    name = ps.integrator_name

    def geti(key, default):
        v = p.get(key, default)
        return int(v[0] if isinstance(v, list) else v)

    def getf(key, default):
        v = p.get(key, default)
        return float(v[0] if isinstance(v, list) else v)

    quick = 16 if args.quick else 1

    if name == "photonbeam":
        from .integrators.photonbeam import PhotonBeamConfig, render_photonbeam

        iters = max(1, geti("iterations", geti("numiterations", 64)) // quick)
        cfg = PhotonBeamConfig(
            iterations=iters,
            startiteration=geti("startiteration", 0),
            enditeration=geti("enditeration", iters),
            maxdepth=geti("maxdepth", 5),
            photonsperiteration=geti("photonsperiteration", -1),
            imagewritefrequency=geti("imagewritefrequency", 1 << 31),
            initialbeamradius=getf("initialbeamradius", 1.0),
            alpha=getf("alpha", 0.5),
            rendersurfaces=bool(p.get("rendersurfaces", True)),
            rendermedia=bool(p.get("rendermedia", True)),
            kernel=args.kernel or "bre",
        )
        img, stats = render_photonbeam(scene, ps.camera, ps.width, ps.height, cfg)
    elif name == "vsppm":
        from .integrators.vsppm import VSPPMConfig, render_vsppm

        cfg = VSPPMConfig(
            iterations=max(1, geti("iterations", geti("numiterations", 64)) // quick),
            maxdepth=geti("maxdepth", 5),
            photonsperiteration=geti("photonsperiteration", -1),
            radius=getf("radius", 1.0),
            rendersurfaces=bool(p.get("rendersurfaces", True)),
            rendermedia=bool(p.get("rendermedia", True)),
        )
        img, stats = render_vsppm(scene, ps.camera, ps.width, ps.height, cfg)
    elif name in ("volpath", "path", "whitted", "directlighting"):
        from .integrators.volpath import VolPathConfig, render_volpath

        spp = 16
        if isinstance(ps.sampler_params.get("pixelsamples"), (int, float, list)):
            v = ps.sampler_params["pixelsamples"]
            spp = int(v[0] if isinstance(v, list) else v)
        known = ("random", "stratified", "02sequence", "sobol", "maxmindist",
                 "halton")
        cfg = VolPathConfig(
            maxdepth=geti("maxdepth", 5), spp=max(1, spp // quick),
            sampler=ps.sampler_name if ps.sampler_name in known else "random",
            maxsampleluminance=ps.max_sample_luminance,
            # pbrt volpath defaults to the spatial voxel cache
            # (CreateVolPathIntegrator, volpath.cpp:~300)
            lightsamplestrategy=str(
                p.get("lightsamplestrategy", "spatial")).strip('"'),
            # whitted/directlighting: specular-only continuations; the
            # directlighting integrator defaults to strategy "all"
            # (CreateDirectLightingIntegrator, directlighting.cpp:~110)
            indirect="specular" if name in ("whitted", "directlighting")
            else "full",
            samplealllights=(
                name == "directlighting"
                and str(p.get("strategy", "all")).strip('"') == "all"),
        )
        img = render_volpath(scene, ps.camera, ps.width, ps.height, cfg)
        stats = {}
    elif name == "bdpt":
        from .integrators.bdpt import BDPTConfig, render_bdpt

        spp = 16
        if isinstance(ps.sampler_params.get("pixelsamples"), (int, float, list)):
            v = ps.sampler_params["pixelsamples"]
            spp = int(v[0] if isinstance(v, list) else v)
        cfg = BDPTConfig(maxdepth=geti("maxdepth", 5), spp=max(1, spp // quick))
        img = render_bdpt(scene, ps.camera, ps.width, ps.height, cfg)
        stats = {}
    elif name == "mlt":
        from .integrators.mlt import MLTConfig, render_mlt

        cfg = MLTConfig(
            maxdepth=geti("maxdepth", 5),
            bootstrapsamples=geti("bootstrapsamples", 4096) // quick,
            chains=geti("chains", 256),
            mutationsperpixel=max(1, geti("mutationsperpixel", 100) // quick),
            largestepprobability=getf("largestepprobability", 0.3),
            sigma=getf("sigma", 0.01),
        )
        img = render_mlt(scene, ps.camera, ps.width, ps.height, cfg)
        stats = {}
    else:
        print(f"error: integrator '{name}' not supported yet", file=sys.stderr)
        return 1

    img = np.asarray(img)
    # Film post-ops (film.cpp): crop window -> cropped pixel bounds
    # (pMin = ceil(res * c0), pMax = ceil(res * c1), film.cpp:~60), scale
    # multiplies written values (film.cpp WriteImage).
    if ps.crop is not None:
        x0, x1, y0, y1 = ps.crop
        px0 = int(np.ceil(ps.width * x0))
        px1 = int(np.ceil(ps.width * x1))
        py0 = int(np.ceil(ps.height * y0))
        py1 = int(np.ceil(ps.height * y1))
        img = img[py0:py1, px0:px1]
    if ps.film_scale != 1.0:
        img = img * np.float32(ps.film_scale)
    out = args.outfile or ps.filename
    write_image(out, img)
    if not args.quiet:
        dt = time.time() - t0
        print(f"bre_tpu: wrote {out} ({dt:.1f}s)")
        for k, v in (stats or {}).items():
            print(f"  {k}: {v}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
