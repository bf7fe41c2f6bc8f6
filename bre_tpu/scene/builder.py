"""Declarative scene builder: Python lists -> frozen Scene pytree.

Replaces the reference's stateful graphics-state API
(/root/reference/src/core/api.cpp: ``pbrtShape`` :1157, ``pbrtMakeNamedMedium``
:955, ``pbrtLightSource``/``pbrtAreaLightSource``, ``pbrtMaterial``,
``pbrtWorldEnd`` :1361) with an explicit builder object; parameter names match
the reference ParamSet keys (src/core/paramset.h) so .pbrt-derived configs
translate 1:1.  ``build()`` freezes everything into SoA jnp arrays.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np
import jax.numpy as jnp

from .scene import (
    LIGHT_DIFFUSE_AREA,
    LIGHT_DISTANT,
    LIGHT_INFINITE,
    LIGHT_POINT,
    LIGHT_SPOT,
    MAT_GLASS,
    MAT_MATTE,
    MAT_MIRROR,
    MEDIUM_GRID,
    MEDIUM_HOMOGENEOUS,
    SHAPE_SPHERE,
    SHAPE_TRIANGLE,
    Lights,
    Materials,
    Media,
    Scene,
    Spheres,
    Triangles,
)


def _rgb(v) -> np.ndarray:
    a = np.asarray(v, np.float32)
    if a.shape == ():
        a = np.full(3, float(a), np.float32)
    return a


class SceneBuilder:
    def __init__(self) -> None:
        self._sph: List[dict] = []
        self._tri: List[dict] = []
        self._mat: List[dict] = []
        self._light: List[dict] = []
        self._med: List[dict] = []
        self._grid_density: Optional[np.ndarray] = None
        self._grid_world_to_medium: Optional[np.ndarray] = None
        self._grid_medium_index = -1
        self.camera_medium = -1

    # --- materials (reference src/materials/{matte,mirror,glass}.cpp) ---
    def matte(self, kd=(0.5, 0.5, 0.5), sigma=0.0) -> int:
        self._mat.append(
            dict(mtype=MAT_MATTE, kd=_rgb(kd), ks=_rgb(0), eta=1.0, roughness=sigma)
        )
        return len(self._mat) - 1

    def mirror(self, kr=(0.9, 0.9, 0.9)) -> int:
        self._mat.append(
            dict(mtype=MAT_MIRROR, kd=_rgb(kr), ks=_rgb(0), eta=1.0, roughness=0.0)
        )
        return len(self._mat) - 1

    def glass(self, kr=(1.0, 1.0, 1.0), kt=(1.0, 1.0, 1.0), eta=1.5) -> int:
        self._mat.append(
            dict(mtype=MAT_GLASS, kd=_rgb(kr), ks=_rgb(kt), eta=eta, roughness=0.0)
        )
        return len(self._mat) - 1

    # --- media (reference src/media/{homogeneous,grid}.cpp) ---
    def homogeneous_medium(self, sigma_a=(1, 1, 1), sigma_s=(1, 1, 1), g=0.0) -> int:
        self._med.append(
            dict(mtype=MEDIUM_HOMOGENEOUS, sigma_a=_rgb(sigma_a), sigma_s=_rgb(sigma_s), g=g)
        )
        return len(self._med) - 1

    def grid_medium(
        self, density: np.ndarray, world_to_medium, sigma_a=(1, 1, 1), sigma_s=(1, 1, 1), g=0.0
    ) -> int:
        """density: (nz, ny, nx); world_to_medium maps world->[0,1]^3."""
        if self._grid_density is not None:
            raise ValueError("only one grid-density medium supported per scene")
        self._med.append(
            dict(mtype=MEDIUM_GRID, sigma_a=_rgb(sigma_a), sigma_s=_rgb(sigma_s), g=g)
        )
        self._grid_density = np.asarray(density, np.float32)
        self._grid_world_to_medium = np.asarray(world_to_medium, np.float32)
        self._grid_medium_index = len(self._med) - 1
        return self._grid_medium_index

    # --- shapes (reference src/shapes/{sphere,triangle}.cpp) ---
    def sphere(
        self,
        center=(0, 0, 0),
        radius=1.0,
        material: int = -1,
        medium_inside: int = -1,
        medium_outside: int = -1,
        _area_light: int = -1,
    ) -> int:
        self._sph.append(
            dict(
                center=_rgb(center),
                radius=float(radius),
                material=material,
                mi=medium_inside,
                mo=medium_outside,
                al=_area_light,
            )
        )
        return len(self._sph) - 1

    def triangle(
        self,
        p0,
        p1,
        p2,
        material: int = -1,
        medium_inside: int = -1,
        medium_outside: int = -1,
        _area_light: int = -1,
    ) -> int:
        self._tri.append(
            dict(
                p0=_rgb(p0),
                p1=_rgb(p1),
                p2=_rgb(p2),
                material=material,
                mi=medium_inside,
                mo=medium_outside,
                al=_area_light,
            )
        )
        return len(self._tri) - 1

    def quad(self, p0, p1, p2, p3, **kw) -> Sequence[int]:
        """Two triangles (p0,p1,p2) and (p0,p2,p3)."""
        return self.triangle(p0, p1, p2, **kw), self.triangle(p0, p2, p3, **kw)

    def box(self, lo, hi, **kw) -> None:
        """Axis-aligned box as 12 triangles with consistently OUTWARD normals.

        Normal orientation matters: medium_inside is the medium on the side
        opposite the geometric normal (see scene.Triangles).  Equivalent to a
        pbrt trianglemesh box with outward winding.
        """
        lx, ly, lz = (float(v) for v in lo)
        hx, hy, hz = (float(v) for v in hi)
        self.quad((lx, ly, lz), (lx, hy, lz), (hx, hy, lz), (hx, ly, lz), **kw)  # z=lo
        self.quad((lx, ly, hz), (hx, ly, hz), (hx, hy, hz), (lx, hy, hz), **kw)  # z=hi
        self.quad((lx, ly, lz), (hx, ly, lz), (hx, ly, hz), (lx, ly, hz), **kw)  # y=lo
        self.quad((lx, hy, lz), (lx, hy, hz), (hx, hy, hz), (hx, hy, lz), **kw)  # y=hi
        self.quad((lx, ly, lz), (lx, ly, hz), (lx, hy, hz), (lx, hy, lz), **kw)  # x=lo
        self.quad((hx, ly, lz), (hx, hy, lz), (hx, hy, hz), (hx, ly, hz), **kw)  # x=hi

    # --- lights (reference src/lights/*) ---
    def point_light(self, position=(0, 0, 0), intensity=(1, 1, 1), medium: int = -1) -> int:
        self._light.append(
            dict(
                ltype=LIGHT_POINT,
                position=_rgb(position),
                direction=np.zeros(3, np.float32),
                emit=_rgb(intensity),
                shape_kind=-1,
                shape_index=-1,
                two_sided=0,
                medium=medium,
            )
        )
        return len(self._light) - 1

    def distant_light(self, direction=(0, 0, -1), radiance=(1, 1, 1)) -> int:
        w = np.asarray(direction, np.float32)
        w = w / np.linalg.norm(w)
        self._light.append(
            dict(
                ltype=LIGHT_DISTANT,
                position=np.zeros(3, np.float32),
                direction=w,
                emit=_rgb(radiance),
                shape_kind=-1,
                shape_index=-1,
                two_sided=0,
                medium=-1,
            )
        )
        return len(self._light) - 1

    def infinite_light(self, radiance=(1, 1, 1)) -> int:
        """Constant environment light (src/lights/infinite.cpp, constant L)."""
        self._light.append(
            dict(
                ltype=LIGHT_INFINITE,
                position=np.zeros(3, np.float32),
                direction=np.zeros(3, np.float32),
                emit=_rgb(radiance),
                shape_kind=-1,
                shape_index=-1,
                two_sided=0,
                medium=-1,
            )
        )
        return len(self._light) - 1

    def area_light_sphere(self, center, radius, radiance, material: int = -1,
                          two_sided=False, medium: int = -1, medium_inside: int = -1) -> int:
        """Diffuse area light over a sphere (src/lights/diffuse.cpp)."""
        light_id = len(self._light)
        sidx = self.sphere(
            center, radius, material=material, _area_light=light_id,
            medium_inside=medium_inside, medium_outside=medium,
        )
        self._light.append(
            dict(
                ltype=LIGHT_DIFFUSE_AREA,
                position=_rgb(center),
                direction=np.zeros(3, np.float32),
                emit=_rgb(radiance),
                shape_kind=SHAPE_SPHERE,
                shape_index=sidx,
                two_sided=int(two_sided),
                medium=medium,
            )
        )
        return light_id

    def area_light_quad(self, p0, p1, p2, p3, radiance, material: int = -1,
                        two_sided=False, medium: int = -1) -> int:
        """Diffuse area light over two triangles; returns first light id."""
        ids = []
        for tri in [(p0, p1, p2), (p0, p2, p3)]:
            light_id = len(self._light)
            tidx = self.triangle(*tri, material=material, _area_light=light_id,
                                 medium_inside=medium, medium_outside=medium)
            self._light.append(
                dict(
                    ltype=LIGHT_DIFFUSE_AREA,
                    position=np.mean(np.stack([_rgb(p) for p in tri]), 0),
                    direction=np.zeros(3, np.float32),
                    emit=_rgb(radiance),
                    shape_kind=SHAPE_TRIANGLE,
                    shape_index=tidx,
                    two_sided=int(two_sided),
                    medium=medium,
                )
            )
            ids.append(light_id)
        return ids[0]

    # --- freeze ---
    def build(self) -> Scene:
        def stack(rows, key, dtype=np.float32, dim3=True):
            if not rows:
                return jnp.zeros((0, 3) if dim3 else (0,), dtype)
            return jnp.asarray(np.stack([np.asarray(r[key], dtype) for r in rows]))

        def col(rows, key, dtype=np.int32):
            if not rows:
                return jnp.zeros((0,), dtype)
            return jnp.asarray(np.array([r[key] for r in rows], dtype))

        spheres = Spheres(
            center=stack(self._sph, "center"),
            radius=col(self._sph, "radius", np.float32),
            material=col(self._sph, "material"),
            medium_inside=col(self._sph, "mi"),
            medium_outside=col(self._sph, "mo"),
            area_light=col(self._sph, "al"),
        )
        triangles = Triangles(
            p0=stack(self._tri, "p0"),
            p1=stack(self._tri, "p1"),
            p2=stack(self._tri, "p2"),
            material=col(self._tri, "material"),
            medium_inside=col(self._tri, "mi"),
            medium_outside=col(self._tri, "mo"),
            area_light=col(self._tri, "al"),
        )
        materials = Materials(
            mtype=col(self._mat, "mtype"),
            kd=stack(self._mat, "kd"),
            ks=stack(self._mat, "ks"),
            eta=col(self._mat, "eta", np.float32),
            roughness=col(self._mat, "roughness", np.float32),
        )
        lights = Lights(
            ltype=col(self._light, "ltype"),
            position=stack(self._light, "position"),
            direction=stack(self._light, "direction"),
            emit=stack(self._light, "emit"),
            shape_kind=col(self._light, "shape_kind"),
            shape_index=col(self._light, "shape_index"),
            two_sided=col(self._light, "two_sided"),
            medium=col(self._light, "medium"),
        )
        density = (
            jnp.asarray(self._grid_density)
            if self._grid_density is not None
            else jnp.zeros((1, 1, 1), jnp.float32)
        )
        w2m = (
            jnp.asarray(self._grid_world_to_medium)
            if self._grid_world_to_medium is not None
            else jnp.eye(4, dtype=jnp.float32)
        )
        media = Media(
            mtype=col(self._med, "mtype"),
            sigma_a=stack(self._med, "sigma_a"),
            sigma_s=stack(self._med, "sigma_s"),
            g=col(self._med, "g", np.float32),
            density=density,
            world_to_medium=w2m,
            grid_medium=jnp.int32(self._grid_medium_index),
        )
        # world bounds
        pts = []
        for s in self._sph:
            pts.append(s["center"] - s["radius"])
            pts.append(s["center"] + s["radius"])
        for t in self._tri:
            pts.extend([t["p0"], t["p1"], t["p2"]])
        for l in self._light:
            if l["ltype"] in (LIGHT_POINT, LIGHT_SPOT):
                pts.append(l["position"])
        if pts:
            allp = np.stack(pts)
            wmin, wmax = allp.min(0), allp.max(0)
        else:
            wmin = np.full(3, -1.0, np.float32)
            wmax = np.full(3, 1.0, np.float32)
        return Scene(
            spheres=spheres,
            triangles=triangles,
            materials=materials,
            lights=lights,
            media=media,
            camera_medium=jnp.int32(self.camera_medium),
            world_min=jnp.asarray(wmin, jnp.float32),
            world_max=jnp.asarray(wmax, jnp.float32),
        )
