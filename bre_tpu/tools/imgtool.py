"""imgtool: image utilities (diff / cat / convert / assemble).

Reference: /root/reference/src/tools/imgtool.cpp — ``assemble`` (:190),
``cat`` (:287), ``diff`` with MSE (:334), convert/tonemap; the ``diff``
command is the allclose harness for image comparison (BASELINE
"image+grad allclose vs a reference pbrt CPU run").
Usage: ``python -m bre_tpu.tools.imgtool diff a.pfm b.pfm [--tol 0.01]``.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from ..io.image import read_image, write_image


def cmd_diff(args) -> int:
    """MSE/MRSE diff (imgtool.cpp:334-417)."""
    a = read_image(args.image1).astype(np.float64)
    b = read_image(args.image2).astype(np.float64)
    if a.shape != b.shape:
        print(f"imgtool: size mismatch {a.shape} vs {b.shape}", file=sys.stderr)
        return 1
    diff = a - b
    mse = float((diff * diff).mean())
    mrse = float(((diff * diff) / np.maximum(b * b, 1e-10)).mean())
    avg_a, avg_b = float(a.mean()), float(b.mean())
    delta = 100.0 * (avg_a - avg_b) / avg_b if avg_b != 0 else float("inf")
    n_diff = int((diff != 0).sum())
    print(
        f"imgtool: {n_diff} pixels differ ({100.0 * n_diff / diff.size:.2f}%)\n"
        f"  avg {avg_a:.6g} vs {avg_b:.6g} (delta {delta:+.3f}%)\n"
        f"  MSE {mse:.6g}, MRSE {mrse:.6g}"
    )
    if args.outfile:
        write_image(args.outfile, np.abs(diff).astype(np.float32))
    if args.tol is not None:
        return 1 if mse > args.tol else 0
    # no tolerance: exit 1 on ANY difference (imgtool.cpp diff semantics)
    return 1 if n_diff > 0 else 0


def cmd_cat(args) -> int:
    """Print pixel values (imgtool.cpp:287-332)."""
    img = read_image(args.image)
    h, w = img.shape[:2]
    print(f"{args.image}: {w} x {h}")
    for y in range(h):
        for x in range(w):
            px = img[y, x]
            print(f"({x}, {y}): ({px[0]:.6g}, {px[1]:.6g}, {px[2]:.6g})")
    return 0


def cmd_convert(args) -> int:
    """Convert between formats with the reference's post-ops
    (imgtool.cpp convert: -scale, -tonemap/-maxluminance, -bloom*,
    -repeatpix, -flipy)."""
    img = read_image(args.infile).astype(np.float32)
    img = img * args.scale

    if args.bloomlevel < float("inf"):
        # imgtool.cpp:~430-470: pixels above bloomlevel are blurred
        # (bloomiters box passes of half-width bloomwidth) and blended in
        bloom = np.where(
            (img.max(-1, keepdims=True) > args.bloomlevel), img, 0.0)
        w = max(1, int(args.bloomwidth))
        for _ in range(max(1, args.bloomiters)):
            k = np.ones(2 * w + 1, np.float32) / (2 * w + 1)
            for ax in (0, 1):
                bloom = np.apply_along_axis(
                    lambda v: np.convolve(v, k, mode="same"), ax, bloom)
        img = img + args.bloomscale * bloom

    if args.tonemap:
        # imgtool.cpp tonemap: scale by maxluminance then Reinhard-style
        img = img / max(args.maxluminance, 1e-9)
        img = img / (1.0 + img)
    if args.repeatpix > 1:
        img = np.repeat(np.repeat(img, args.repeatpix, 0), args.repeatpix, 1)
    if args.flipy:
        img = img[::-1]
    write_image(args.outfile, img)
    print(f"imgtool: wrote {args.outfile}")
    return 0


def cmd_assemble(args) -> int:
    """Merge non-overlapping crops into one image (imgtool.cpp:190-285).

    Crops are full-size images that are zero outside their window; assemble
    sums them (our film writes full frames, so this is a sum-merge).
    """
    imgs = [read_image(f).astype(np.float64) for f in args.images]
    base = np.zeros_like(imgs[0])
    for im in imgs:
        if im.shape != base.shape:
            print("imgtool: size mismatch in assemble", file=sys.stderr)
            return 1
        base += im
    write_image(args.outfile, base.astype(np.float32))
    print(f"imgtool: wrote {args.outfile}")
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="imgtool")
    sub = ap.add_subparsers(dest="cmd", required=True)
    d = sub.add_parser("diff")
    d.add_argument("image1")
    d.add_argument("image2")
    d.add_argument("--outfile", "-o", default=None)
    d.add_argument("--tol", type=float, default=None,
                   help="exit 1 if MSE exceeds this")
    c = sub.add_parser("cat")
    c.add_argument("image")
    v = sub.add_parser("convert")
    v.add_argument("infile")
    v.add_argument("outfile")
    v.add_argument("--scale", type=float, default=1.0)
    v.add_argument("--tonemap", action="store_true")
    v.add_argument("--maxluminance", type=float, default=1.0,
                   help="luminance mapped to white by --tonemap")
    v.add_argument("--bloomlevel", type=float, default=float("inf"),
                   help="pixels above this bloom (imgtool convert -bloomlevel)")
    v.add_argument("--bloomwidth", type=int, default=15)
    v.add_argument("--bloomscale", type=float, default=0.3)
    v.add_argument("--bloomiters", type=int, default=5)
    v.add_argument("--repeatpix", type=int, default=1,
                   help="replicate each pixel NxN")
    v.add_argument("--flipy", action="store_true")
    a = sub.add_parser("assemble")
    a.add_argument("outfile")
    a.add_argument("images", nargs="+")
    s = sub.add_parser("makesky", help="analytic daylight sky map "
                       "(Hosek-Wilkie; reference imgtool.cpp:87-188)")
    s.add_argument("--outfile", "-o", default="sky.pfm")
    s.add_argument("--resolution", type=int, default=512)
    s.add_argument("--elevation", type=float, default=30.0,
                   help="sun elevation above the horizon, degrees")
    s.add_argument("--turbidity", type=float, default=3.0)
    s.add_argument("--albedo", type=float, default=0.5,
                   help="ground albedo in [0,1] (Hosek model only)")
    s.add_argument("--model", choices=["hosek", "preetham"],
                   default="hosek",
                   help="hosek = reference ArHosekSkyModel behavior; "
                        "preetham = closed-form fallback, no data tables")
    s.add_argument("--layout", choices=["equalarea", "equirect"],
                   default="equalarea")
    args = ap.parse_args(argv)
    if args.cmd == "makesky":
        from .sky import cmd_makesky

        return cmd_makesky(args)
    return {"diff": cmd_diff, "cat": cmd_cat, "convert": cmd_convert,
            "assemble": cmd_assemble}[args.cmd](args)


if __name__ == "__main__":
    sys.exit(main())
