"""obj2pbrt: Wavefront OBJ -> .pbrt trianglemesh converter.

Reference: /root/reference/src/tools/obj2pbrt.cpp (rply/obj reader emitting
pbrt shapes).  Usage: ``python -m bre_tpu.tools.obj2pbrt in.obj out.pbrt``.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path


def obj_to_pbrt(obj_path, out_path) -> int:
    verts = []
    faces = []
    for line in Path(obj_path).read_text().splitlines():
        t = line.split()
        if not t:
            continue
        if t[0] == "v":
            verts.append(tuple(float(x) for x in t[1:4]))
        elif t[0] == "f":
            idx = [int(v.split("/")[0]) for v in t[1:]]
            idx = [i - 1 if i > 0 else len(verts) + i for i in idx]
            # fan-triangulate polygons
            for k in range(1, len(idx) - 1):
                faces.append((idx[0], idx[k], idx[k + 1]))
    with open(out_path, "w") as f:
        f.write(f"# converted from {obj_path}: {len(verts)} verts, {len(faces)} tris\n")
        f.write('Shape "trianglemesh"\n  "integer indices" [ ')
        for a, b, c in faces:
            f.write(f"{a} {b} {c} ")
        f.write(']\n  "point P" [ ')
        for v in verts:
            f.write(f"{v[0]} {v[1]} {v[2]} ")
        f.write("]\n")
    print(f"obj2pbrt: {len(verts)} vertices, {len(faces)} triangles -> {out_path}")
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="obj2pbrt")
    ap.add_argument("obj")
    ap.add_argument("pbrt")
    args = ap.parse_args(argv)
    return obj_to_pbrt(args.obj, args.pbrt)


if __name__ == "__main__":
    sys.exit(main())
