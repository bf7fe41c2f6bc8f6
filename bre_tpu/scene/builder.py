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

from ..textures import (
    TEX_CHECKERBOARD,
    TEX_CONSTANT,
    TEX_DOTS,
    TEX_FBM,
    TEX_MARBLE,
    TEX_MIX,
    TEX_SCALE,
    TEX_UV,
    TEX_WINDY,
    TEX_WRINKLED,
    Textures,
)
from .scene import (
    LIGHT_DIFFUSE_AREA,
    LIGHT_DISTANT,
    LIGHT_GONIOMETRIC,
    LIGHT_INFINITE,
    LIGHT_POINT,
    LIGHT_PROJECTION,
    LIGHT_SPOT,
    MAT_GLASS,
    MAT_MATTE,
    MAT_METAL,
    MAT_MIRROR,
    MAT_PLASTIC,
    MAT_SUBSTRATE,
    MAT_TRANSLUCENT,
    MAT_UBER,
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

# Triangle count at which SceneBuilder builds an LBVH over the mesh instead
# of leaving the dense (R, N) masked-min sweep: below this the dense sweep
# wins on TPU (zero divergence, no gathers); above it the per-ray traversal's
# O(log N) node visits win.  Tests override this to exercise both paths.
BVH_MIN_TRIANGLES = 16384


def _tex_graph_depth(tex_list) -> int:
    """Max nesting depth of the texture DAG (0 = flat table).  Children
    always precede parents (enforced in _add_tex), so one forward pass
    suffices."""
    depth = [0] * len(tex_list)
    for i, t in enumerate(tex_list):
        for ch in (t.get("child0", -1), t.get("child1", -1)):
            if ch is not None and ch >= 0:
                depth[i] = max(depth[i], depth[ch] + 1)
    return max(depth, default=0)


# pbrt's default triangle UVs (triangle.cpp GetUVs)
_UV_DEFAULT = (np.array([0.0, 0.0], np.float32),
               np.array([1.0, 0.0], np.float32),
               np.array([1.0, 1.0], np.float32))


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
        self._tex: List[dict] = []
        self._images: List[list] = []  # MIPMap pyramids for imagemap textures
        self._light_images: List[list] = []  # pyramids for image-backed lights
        self._bss_tables: List[dict] = []  # beam-diffusion tables (bssrdf.py)
        self._bss_keys: dict = {}  # (g, eta) -> table index
        self._fourier_tables: List = []  # FourierTable rows (fourier.py)
        self.camera_medium = -1

    # --- materials (reference src/materials/*.cpp) ---
    def _add_mat(self, mtype, kd, ks, eta=1.0, roughness=0.0,
                 metal_eta=(1.0, 1.0, 1.0), metal_k=(0.0, 0.0, 0.0),
                 kd_tex=-1, mix_m1=-1, mix_m2=-1,
                 mix_amount=(0.5, 0.5, 0.5), beta_n=0.3,
                 hair_alpha=2.0, bss_sigma_a=(0, 0, 0), bss_sigma_s=(0, 0, 0),
                 bss_table=-1, fourier=-1) -> int:
        self._mat.append(dict(
            mtype=mtype, kd=_rgb(kd), ks=_rgb(ks), eta=eta, roughness=roughness,
            metal_eta=_rgb(metal_eta), metal_k=_rgb(metal_k), kd_tex=kd_tex,
            mix_m1=mix_m1, mix_m2=mix_m2, mix_amount=_rgb(mix_amount),
            beta_n=beta_n, hair_alpha=hair_alpha,
            bss_sigma_a=_rgb(bss_sigma_a), bss_sigma_s=_rgb(bss_sigma_s),
            bss_table=bss_table, fourier=fourier,
        ))
        return len(self._mat) - 1

    def _bss_table_for(self, g: float, eta: float) -> int:
        """One beam-diffusion table per unique (g, eta) pair
        (ComputeBeamDiffusionBSSRDF, bssrdf.cpp:145-176; materials cache
        their table the same way via member `table`)."""
        key = (round(float(g), 6), round(float(eta), 6))
        if key not in self._bss_keys:
            from ..bssrdf import compute_beam_diffusion_bssrdf

            self._bss_keys[key] = len(self._bss_tables)
            self._bss_tables.append(compute_beam_diffusion_bssrdf(g, eta))
        return self._bss_keys[key]

    def subsurface(self, name=None, sigma_a=None, sigma_s=None, g=0.0,
                   eta=1.33, scale=1.0, kr=(1.0, 1.0, 1.0),
                   kt=(1.0, 1.0, 1.0)) -> int:
        """SubsurfaceMaterial (src/materials/subsurface.cpp:46-137): smooth
        dielectric BSDF + TabulatedBSSRDF.  `name` looks up the measured
        scattering table (medium.cpp:49-181) and forces g=0 (the database
        stores reduced coefficients); defaults are Wholemilk's sigmas."""
        from ..bssrdf import get_medium_scattering_properties
        from .scene import MAT_SUBSURFACE

        sa = np.asarray((0.0011, 0.0024, 0.014), np.float32)
        ss = np.asarray((2.55, 3.21, 3.77), np.float32)
        if name is not None:
            props = get_medium_scattering_properties(name)
            if props is None:
                import warnings

                warnings.warn(f'named scattering material "{name}" not found; '
                              "using defaults")
            else:
                ss, sa = props
                g = 0.0
        if sigma_a is not None:
            sa = _rgb(sigma_a)
        if sigma_s is not None:
            ss = _rgb(sigma_s)
        tab = self._bss_table_for(g, eta)
        return self._add_mat(MAT_SUBSURFACE, kd=kr, ks=kt, eta=eta,
                             bss_sigma_a=scale * sa, bss_sigma_s=scale * ss,
                             bss_table=tab)

    def kdsubsurface(self, kd=(0.5, 0.5, 0.5), mfp=(1.0, 1.0, 1.0), g=0.0,
                     eta=1.33, scale=1.0, kr=(1.0, 1.0, 1.0),
                     kt=(1.0, 1.0, 1.0)) -> int:
        """KdSubsurfaceMaterial (src/materials/kdsubsurface.cpp:44-124):
        sigma_a/sigma_s inverted from a diffuse color + mean free path via
        SubsurfaceFromDiffuse (bssrdf.cpp:177-186)."""
        from ..bssrdf import subsurface_from_diffuse
        from .scene import MAT_KDSUBSURFACE

        tab = self._bss_table_for(g, eta)
        sa, ss = subsurface_from_diffuse(self._bss_tables[tab], _rgb(kd),
                                         scale * _rgb(mfp))
        return self._add_mat(MAT_KDSUBSURFACE, kd=kr, ks=kt, eta=eta,
                             bss_sigma_a=sa, bss_sigma_s=ss, bss_table=tab)

    def hair(self, sigma_a=None, color=None, eumelanin=None, pheomelanin=0.0,
             beta_m=0.3, beta_n=0.3, alpha=2.0, eta=1.55) -> int:
        """HairMaterial (src/materials/hair.cpp CreateHairMaterial):
        absorption given directly (sigma_a), via a target reflectance color
        (SigmaAFromReflectance), or via melanin concentrations
        (SigmaAFromConcentration); defaults per the reference."""
        from .scene import MAT_HAIR

        if sigma_a is None:
            if color is not None:
                c = np.clip(_rgb(color), 1e-4, 0.999)
                denom = (5.969 - 0.215 * beta_n + 2.532 * beta_n**2
                         - 10.73 * beta_n**3 + 5.574 * beta_n**4
                         + 0.245 * beta_n**5)
                sigma_a = (np.log(c) / denom) ** 2
            elif eumelanin is not None:
                eum = np.array([0.419, 0.697, 1.37], np.float32)
                pheo = np.array([0.187, 0.4, 1.05], np.float32)
                sigma_a = eumelanin * eum + pheomelanin * pheo
            else:
                eum = np.array([0.419, 0.697, 1.37], np.float32)
                sigma_a = 1.3 * eum  # reference default eumelanin 1.3
        return self._add_mat(MAT_HAIR, kd=sigma_a, ks=(0, 0, 0), eta=eta,
                             roughness=beta_m, beta_n=beta_n,
                             hair_alpha=alpha)

    def mix(self, m1: int, m2: int, amount=(0.5, 0.5, 0.5)) -> int:
        """MixMaterial (src/materials/mixmat.cpp): amount * m1 +
        (1-amount) * m2.  One level of nesting (sub-materials must not
        themselves be mixes — pbrt allows arbitrary nesting; single-level
        covers the shipped scenes)."""
        from .scene import MAT_MIX

        return self._add_mat(MAT_MIX, kd=(0, 0, 0), ks=(0, 0, 0),
                             mix_m1=m1, mix_m2=m2, mix_amount=amount)

    def matte(self, kd=(0.5, 0.5, 0.5), sigma=0.0, kd_tex=-1) -> int:
        return self._add_mat(MAT_MATTE, kd, (0, 0, 0), roughness=sigma, kd_tex=kd_tex)

    def mirror(self, kr=(0.9, 0.9, 0.9)) -> int:
        return self._add_mat(MAT_MIRROR, kr, (0, 0, 0))

    def glass(self, kr=(1.0, 1.0, 1.0), kt=(1.0, 1.0, 1.0), eta=1.5) -> int:
        return self._add_mat(MAT_GLASS, kr, kt, eta=eta)

    def metal(self, eta=None, k=None, roughness=0.01, tint=(1.0, 1.0, 1.0)) -> int:
        """GGX conductor (metal.cpp; default copper)."""
        from ..materials import COPPER_ETA, COPPER_K

        return self._add_mat(
            MAT_METAL, (0, 0, 0), tint, roughness=roughness,
            metal_eta=eta if eta is not None else COPPER_ETA,
            metal_k=k if k is not None else COPPER_K,
        )

    def plastic(self, kd=(0.25, 0.25, 0.25), ks=(0.25, 0.25, 0.25),
                roughness=0.1, kd_tex=-1) -> int:
        return self._add_mat(MAT_PLASTIC, kd, ks, eta=1.5, roughness=roughness,
                             kd_tex=kd_tex)

    def uber(self, kd=(0.25,) * 3, ks=(0.25,) * 3, roughness=0.1, eta=1.5,
             kd_tex=-1) -> int:
        return self._add_mat(MAT_UBER, kd, ks, eta=eta, roughness=roughness,
                             kd_tex=kd_tex)

    def substrate(self, kd=(0.5,) * 3, ks=(0.5,) * 3, roughness=0.1) -> int:
        return self._add_mat(MAT_SUBSTRATE, kd, ks, roughness=roughness)

    def translucent(self, kd=(0.25,) * 3, kt=(0.25,) * 3) -> int:
        return self._add_mat(MAT_TRANSLUCENT, kd, kt)

    # --- textures (reference src/textures/*; bre_tpu/textures.py) ---
    def _add_tex(self, ttype, c0=(1, 1, 1), c1=(0, 0, 0), scale=1.0,
                 octaves=6, omega=0.5, img=-1, uv_scale=(1.0, 1.0),
                 uv_delta=(0.0, 0.0), tex1=-1, tex2=-1) -> int:
        # nested texture graphs: children must be registered before parents
        # (guarantees a DAG; the evaluator recurses to the static depth)
        for ch in (tex1, tex2):
            if ch >= len(self._tex):
                raise ValueError("sub-texture must be registered first")
        self._tex.append(dict(ttype=ttype, c0=_rgb(c0), c1=_rgb(c1),
                              scale=scale, octaves=octaves, omega=omega,
                              img=img,
                              uv_scale=np.asarray(uv_scale, np.float32),
                              uv_delta=np.asarray(uv_delta, np.float32),
                              child0=int(tex1), child1=int(tex2)))
        return len(self._tex) - 1

    def tex_imagemap(self, image, scale=(1, 1, 1), uscale=1.0, vscale=1.0,
                     udelta=0.0, vdelta=0.0) -> int:
        """Image-map texture with a MIPMap pyramid (src/textures/imagemap.cpp,
        src/core/mipmap.h).  ``image``: (H, W, 3) or (H, W) array."""
        from ..textures import build_pyramid

        self._images.append(build_pyramid(np.asarray(image, np.float32)))
        from ..textures import TEX_IMAGE

        return self._add_tex(TEX_IMAGE, c0=scale, img=len(self._images) - 1,
                             uv_scale=(uscale, vscale),
                             uv_delta=(udelta, vdelta))

    def tex_constant(self, c) -> int:
        return self._add_tex(TEX_CONSTANT, c)

    def tex_checkerboard(self, c0=(1, 1, 1), c1=(0, 0, 0), scale=1.0,
                         tex1=-1, tex2=-1) -> int:
        """3D checker; ``tex1``/``tex2``: optional sub-texture slots for
        the two cells (pbrt texture-valued tex1/tex2 params)."""
        return self._add_tex(TEX_CHECKERBOARD, c0, c1, scale,
                             tex1=tex1, tex2=tex2)

    def tex_uv(self) -> int:
        return self._add_tex(TEX_UV)

    def tex_fbm(self, c=(1, 1, 1), scale=1.0, octaves=6, omega=0.5) -> int:
        return self._add_tex(TEX_FBM, c, scale=scale, octaves=octaves, omega=omega)

    def tex_wrinkled(self, c=(1, 1, 1), scale=1.0, octaves=6, omega=0.5) -> int:
        return self._add_tex(TEX_WRINKLED, c, scale=scale, octaves=octaves, omega=omega)

    def tex_marble(self, c0=(0.9, 0.9, 0.9), c1=(0.2, 0.2, 0.3), scale=1.0,
                   omega=0.5) -> int:
        return self._add_tex(TEX_MARBLE, c0, c1, scale, omega=omega)

    def tex_windy(self, c=(1, 1, 1), scale=1.0) -> int:
        return self._add_tex(TEX_WINDY, c, scale=scale)

    def tex_dots(self, c0=(1, 1, 1), c1=(0, 0, 0)) -> int:
        return self._add_tex(TEX_DOTS, c0, c1)

    def tex_bilerp(self, v00=(0, 0, 0), v01=(1, 1, 1), v10=(0, 0, 0),
                   v11=(1, 1, 1)) -> int:
        """4-corner bilinear interpolation over uv (bilerp.cpp); corners
        are constants (the reference's texture-valued corners degrade to
        their constant values here)."""
        from ..textures import TEX_BILERP

        i = self._add_tex(TEX_BILERP, v00, v11)
        self._tex[i]["c2"] = _rgb(v01)
        self._tex[i]["c3"] = _rgb(v10)
        return i

    def tex_scale(self, c0=(1, 1, 1), c1=(1, 1, 1), tex1=-1, tex2=-1) -> int:
        """Product texture (scale.cpp): tex1 * tex2, constants where a
        sub-texture slot is -1."""
        return self._add_tex(TEX_SCALE, c0, c1, tex1=tex1, tex2=tex2)

    def tex_mix(self, c0=(0, 0, 0), c1=(1, 1, 1), amount=0.5,
                tex1=-1, tex2=-1) -> int:
        """Lerp texture (mix.cpp): (1-amount)*tex1 + amount*tex2."""
        return self._add_tex(TEX_MIX, c0, c1, scale=amount,
                             tex1=tex1, tex2=tex2)

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
        tangent=None,
        n0=None,
        n1=None,
        n2=None,
        uv0=None,
        uv1=None,
        uv2=None,
    ) -> int:
        """``n0/n1/n2``: optional per-vertex shading normals (pbrt
        trianglemesh "normal N", triangle.cpp shading geometry); None =
        faceted (geometric normal).  ``uv0/uv1/uv2``: optional per-vertex
        texture coordinates ("float uv"/"float st"); None = pbrt defaults
        (0,0)/(1,0)/(1,1) (triangle.cpp GetUVs).

        ``tangent`` defaults to pbrt's dpdu from the UVs (triangle.cpp's
        dpdu solve), which for the default UVs reduces exactly to
        ``p1 - p0`` — the BSDF frame's ``ss`` axis.  Curve/hair
        tessellation passes the fiber direction explicitly (curve.cpp dpdu
        is the curve tangent)."""
        if tangent is None:
            if uv0 is not None:
                # dpdu from explicit UVs (triangle.cpp:149-162): solve
                # [dp02 dp12] = dpdu*[duv02 duv12]
                a0, a1, a2 = (np.asarray(u, np.float32)
                              for u in (uv0, uv1, uv2))
                duv02, duv12 = a0 - a2, a1 - a2
                dp02 = _rgb(p0) - _rgb(p2)
                dp12 = _rgb(p1) - _rgb(p2)
                det = duv02[0] * duv12[1] - duv02[1] * duv12[0]
                e = (duv12[1] * dp02 - duv02[1] * dp12) / det \
                    if abs(det) > 1e-12 else _rgb(p1) - _rgb(p0)
            else:
                e = _rgb(p1) - _rgb(p0)
            ln = float(np.linalg.norm(e))
            tangent = e / ln if ln > 1e-12 else None
        z3 = np.zeros(3, np.float32)
        self._tri.append(
            dict(
                p0=_rgb(p0),
                p1=_rgb(p1),
                p2=_rgb(p2),
                material=material,
                mi=medium_inside,
                mo=medium_outside,
                al=_area_light,
                tangent=_rgb(tangent) if tangent is not None else z3,
                n0=_rgb(n0) if n0 is not None else z3,
                n1=_rgb(n1) if n1 is not None else z3,
                n2=_rgb(n2) if n2 is not None else z3,
                **({} if uv0 is None else dict(
                    uv0=np.asarray(uv0, np.float32),
                    uv1=np.asarray(uv1, np.float32),
                    uv2=np.asarray(uv2, np.float32))),
            )
        )
        return len(self._tri) - 1

    def _revolve(self, profile, axis_o, axis_z, n_u: int, closed_bottom=None,
                 closed_top=None, **kw) -> None:
        """Tessellate a surface of revolution: profile = [(r_i, z_i), ...].

        TPU-first shape strategy: quadrics (disk/cylinder/cone/paraboloid/
        hyperboloid, reference src/shapes/*.cpp) tessellate into the shared
        triangle SoA at build time — one intersection kernel serves every
        shape, no per-type traversal code.
        """
        import numpy as _np

        o = _np.asarray(axis_o, _np.float32)
        z = _np.asarray(axis_z, _np.float32)
        z = z / max(_np.linalg.norm(z), 1e-9)
        x = _np.array([1.0, 0, 0], _np.float32)
        if abs(float(_np.dot(x, z))) > 0.9:
            x = _np.array([0, 1.0, 0], _np.float32)
        x = _np.cross(z, x)
        x /= max(_np.linalg.norm(x), 1e-9)
        y = _np.cross(z, x)
        ang = _np.linspace(0, 2 * _np.pi, n_u, endpoint=False)
        rings = []
        for r, h in profile:
            ring = (o[None, :] + r * (_np.cos(ang)[:, None] * x
                                      + _np.sin(ang)[:, None] * y)
                    + h * z[None, :])
            rings.append(ring)
        for k in range(len(rings) - 1):
            a, bq = rings[k], rings[k + 1]
            for i in range(n_u):
                j = (i + 1) % n_u
                if not _np.allclose(a[i], a[j]):
                    self.triangle(a[i], a[j], bq[j], **kw)
                if not _np.allclose(bq[i], bq[j]):
                    self.triangle(a[i], bq[j], bq[i], **kw)
        if closed_bottom is not None:
            c = o + closed_bottom * z
            ring = rings[0]
            for i in range(n_u):
                self.triangle(c, ring[(i + 1) % n_u], ring[i], **kw)
        if closed_top is not None:
            c = o + closed_top * z
            ring = rings[-1]
            for i in range(n_u):
                self.triangle(c, ring[i], ring[(i + 1) % n_u], **kw)

    def disk(self, center=(0, 0, 0), normal=(0, 0, 1), radius=1.0,
             inner_radius=0.0, n_u: int = 32, **kw) -> None:
        """Disk (src/shapes/disk.cpp), tessellated (fan when solid)."""
        if inner_radius <= 0.0:
            import numpy as _np

            o = _np.asarray(center, _np.float32)
            z = _np.asarray(normal, _np.float32)
            z = z / max(_np.linalg.norm(z), 1e-9)
            x = _np.array([1.0, 0, 0], _np.float32)
            if abs(float(_np.dot(x, z))) > 0.9:
                x = _np.array([0, 1.0, 0], _np.float32)
            x = _np.cross(z, x)
            x /= max(_np.linalg.norm(x), 1e-9)
            y = _np.cross(z, x)
            ang = _np.linspace(0, 2 * _np.pi, n_u, endpoint=False)
            ring = o[None, :] + radius * (_np.cos(ang)[:, None] * x
                                          + _np.sin(ang)[:, None] * y)
            for i in range(n_u):
                self.triangle(o, ring[i], ring[(i + 1) % n_u], **kw)
        else:
            prof = [(inner_radius, 0.0), (radius, 0.0)]
            self._revolve(prof, center, normal, n_u, **kw)

    def cylinder(self, center=(0, 0, 0), axis=(0, 0, 1), radius=1.0,
                 zmin=-1.0, zmax=1.0, n_u: int = 32, **kw) -> None:
        """Cylinder (src/shapes/cylinder.cpp), tessellated (open ends)."""
        self._revolve([(radius, zmin), (radius, zmax)], center, axis, n_u, **kw)

    def cone(self, center=(0, 0, 0), axis=(0, 0, 1), radius=1.0, height=1.0,
             n_u: int = 32, **kw) -> None:
        """Cone (src/shapes/cone.cpp), tessellated."""
        self._revolve([(radius, 0.0), (1e-5, height)], center, axis, n_u, **kw)

    def paraboloid(self, center=(0, 0, 0), axis=(0, 0, 1), radius=1.0,
                   zmax=1.0, n_v: int = 8, n_u: int = 32, **kw) -> None:
        """Paraboloid z = zmax*(r/radius)^2 (src/shapes/paraboloid.cpp)."""
        import numpy as _np

        prof = [(radius * _np.sqrt(t), zmax * t) for t in _np.linspace(1e-4, 1.0, n_v)]
        self._revolve(prof, center, axis, n_u, **kw)

    def hyperboloid(self, center=(0, 0, 0), axis=(0, 0, 1), r1=0.5, r2=1.0,
                    zmin=0.0, zmax=1.0, n_v: int = 8, n_u: int = 32, **kw) -> None:
        """Hyperboloid of revolution (src/shapes/hyperboloid.cpp)."""
        import numpy as _np

        prof = [(r1 + (r2 - r1) * t * t, zmin + (zmax - zmin) * t)
                for t in _np.linspace(0.0, 1.0, n_v)]
        self._revolve(prof, center, axis, n_u, **kw)

    def heightfield(self, z: "np.ndarray", origin=(0, 0, 0), size=(1.0, 1.0),
                    **kw) -> None:
        """Heightfield grid -> triangles (src/shapes/heightfield.cpp)."""
        import numpy as _np

        z = _np.asarray(z, _np.float32)
        ny, nx = z.shape
        ox, oy, oz = (float(v) for v in origin)
        sx, sy = (float(v) for v in size)
        xs = _np.linspace(0, sx, nx) + ox
        ys = _np.linspace(0, sy, ny) + oy
        for j in range(ny - 1):
            for i in range(nx - 1):
                p00 = (xs[i], ys[j], oz + z[j, i])
                p10 = (xs[i + 1], ys[j], oz + z[j, i + 1])
                p01 = (xs[i], ys[j + 1], oz + z[j + 1, i])
                p11 = (xs[i + 1], ys[j + 1], oz + z[j + 1, i + 1])
                self.triangle(p00, p10, p11, **kw)
                self.triangle(p00, p11, p01, **kw)

    def curve(self, control_points, width0=0.01, width1=0.01,
              n_segments: int = 16, n_sides: int = 4, ctype: str = "cylinder",
              n0=None, n1=None, facing=None, **kw) -> None:
        """Cubic Bezier curve (src/shapes/curve.cpp) tessellated at build into
        the shared triangle SoA (one intersection kernel for all geometry;
        the reference intersects curves analytically per ray).

        ``ctype`` mirrors the reference's CurveType (curve.h:60-70):

        - ``"cylinder"`` — tube of ``n_sides`` facets, linearly
          interpolated width;
        - ``"ribbon"`` — oriented flat strip: the orientation normal is the
          sin-weighted interpolation of the endpoint normals ``n0``/``n1``
          (curve.cpp:301-309 ``sin((1-u)θ)/sinθ · n0 + sin(uθ)/sinθ · n1``),
          and the strip spans ``normalize(cross(n_u, dpdu)) * width``
          (curve.cpp:335-336 dpdv);
        - ``"flat"`` — a ribbon that faces the viewer: the reference orients
          it per-ray; the static tessellation faces the ``facing`` point
          (the camera position when driven by the parser) — exact for
          primary rays, approximate for secondary.
        """
        import numpy as _np

        cp = _np.asarray(control_points, _np.float32).reshape(4, 3)
        if ctype in ("flat", "ribbon"):
            self._curve_strip(cp, width0, width1, n_segments, ctype,
                              n0, n1, facing, **kw)
            return
        ts = _np.linspace(0.0, 1.0, n_segments + 1, dtype=_np.float32)
        # Bezier evaluation + derivative
        def bez(t):
            u = 1.0 - t
            return (u**3)[:, None] * cp[0] + (3*u*u*t)[:, None] * cp[1] + \
                   (3*u*t*t)[:, None] * cp[2] + (t**3)[:, None] * cp[3]
        def bez_d(t):
            u = 1.0 - t
            return (3*u*u)[:, None] * (cp[1]-cp[0]) + (6*u*t)[:, None] * (cp[2]-cp[1]) + \
                   (3*t*t)[:, None] * (cp[3]-cp[2])
        p = bez(ts)
        d = bez_d(ts)
        widths = width0 + (width1 - width0) * ts
        # stable frame transport along the curve
        rings = []
        prev_n = None
        for i in range(n_segments + 1):
            tangent = d[i] / max(_np.linalg.norm(d[i]), 1e-9)
            if prev_n is None:
                ref = _np.array([0, 0, 1.0], _np.float32)
                if abs(float(_np.dot(ref, tangent))) > 0.9:
                    ref = _np.array([1.0, 0, 0], _np.float32)
                n = _np.cross(tangent, ref)
            else:
                n = prev_n - tangent * float(_np.dot(prev_n, tangent))
            n = n / max(_np.linalg.norm(n), 1e-9)
            prev_n = n
            bn = _np.cross(tangent, n)
            ang = _np.linspace(0, 2*_np.pi, n_sides, endpoint=False)
            r = 0.5 * widths[i]
            ring = p[i][None, :] + r * (_np.cos(ang)[:, None] * n
                                        + _np.sin(ang)[:, None] * bn)
            rings.append(ring)
        for k in range(n_segments):
            a, bq = rings[k], rings[k + 1]
            # fiber tangent for the hair BSDF frame (curve dpdu)
            seg_t = p[k + 1] - p[k]
            seg_t = seg_t / max(_np.linalg.norm(seg_t), 1e-9)
            kw_t = dict(kw, tangent=seg_t) if "tangent" not in kw else kw
            for i in range(n_sides):
                j = (i + 1) % n_sides
                self.triangle(a[i], a[j], bq[j], **kw_t)
                self.triangle(a[i], bq[j], bq[i], **kw_t)

    def _curve_strip(self, cp, width0, width1, n_segments, ctype,
                     n0, n1, facing, **kw):
        """Flat / ribbon curve tessellation (see ``curve``): a two-triangle
        strip per segment, side direction from the interpolated orientation
        normal (ribbon, curve.cpp:301-309,335) or the facing point (flat)."""
        import numpy as _np

        ts = _np.linspace(0.0, 1.0, n_segments + 1, dtype=_np.float32)
        u = 1.0 - ts
        p = ((u**3)[:, None] * cp[0] + (3*u*u*ts)[:, None] * cp[1]
             + (3*u*ts*ts)[:, None] * cp[2] + (ts**3)[:, None] * cp[3])
        d = ((3*u*u)[:, None] * (cp[1]-cp[0]) + (6*u*ts)[:, None] * (cp[2]-cp[1])
             + (3*ts*ts)[:, None] * (cp[3]-cp[2]))
        widths = width0 + (width1 - width0) * ts

        if ctype == "ribbon":
            if n0 is None or n1 is None:
                raise ValueError(
                    'ribbon curves need two normals ("N", curve.cpp:429)')
            na = _np.asarray(n0, _np.float32)
            nb = _np.asarray(n1, _np.float32)
            na /= max(_np.linalg.norm(na), 1e-9)
            nb /= max(_np.linalg.norm(nb), 1e-9)
            cosang = float(_np.clip(_np.dot(na, nb), 0.0, 1.0))
            ang = _np.arccos(cosang)  # normalAngle (curve.cpp:85)
            inv_sin = 1.0 / max(_np.sin(ang), 1e-6)
        else:
            face_pt = _np.asarray(
                facing if facing is not None else (0.0, 0.0, 0.0), _np.float32)

        verts = []
        for i in range(n_segments + 1):
            tangent = d[i] / max(_np.linalg.norm(d[i]), 1e-9)
            if ctype == "ribbon":
                if ang < 1e-5:
                    n_u = na
                else:
                    n_u = (_np.sin((1.0 - ts[i]) * ang) * inv_sin * na
                           + _np.sin(ts[i] * ang) * inv_sin * nb)
                side = _np.cross(n_u, tangent)
            else:  # flat: face the viewer
                view = face_pt - p[i]
                side = _np.cross(view, tangent)
            side_n = _np.linalg.norm(side)
            if side_n < 1e-9:  # degenerate: pick any perpendicular
                ref = _np.array([0, 0, 1.0], _np.float32)
                if abs(float(_np.dot(ref, tangent))) > 0.9:
                    ref = _np.array([1.0, 0, 0], _np.float32)
                side = _np.cross(ref, tangent)
                side_n = max(_np.linalg.norm(side), 1e-9)
            side = side / side_n * (0.5 * widths[i])
            verts.append((p[i] - side, p[i] + side))
        for k in range(n_segments):
            (a0, a1), (b0, b1) = verts[k], verts[k + 1]
            seg_t = p[k + 1] - p[k]
            seg_t = seg_t / max(_np.linalg.norm(seg_t), 1e-9)
            kw_t = dict(kw, tangent=seg_t) if "tangent" not in kw else kw
            self.triangle(a0, a1, b1, **kw_t)
            self.triangle(a0, b1, b0, **kw_t)

    def loopsubdiv(self, indices, P, nlevels: int = 2, **kw) -> None:
        """Loop subdivision surface (src/shapes/loopsubdiv.cpp) applied at
        build: ``nlevels`` rounds of 4-1 triangle split with Loop's vertex
        smoothing rules (beta weights for interior vertices, 1/8-3/4-1/8 for
        edge midpoints), then emitted as triangles."""
        import numpy as _np

        V = _np.asarray(P, _np.float32).reshape(-1, 3)
        F = _np.asarray(indices, _np.int64).reshape(-1, 3)
        for _ in range(nlevels):
            # edge midpoint indexing
            edges = {}
            new_faces = []
            mids = []

            def edge_key(a, b):
                return (min(a, b), max(a, b))

            # adjacency for vertex rule
            neighbors = [set() for _ in range(len(V))]
            for f in F:
                for a, b in ((f[0], f[1]), (f[1], f[2]), (f[2], f[0])):
                    neighbors[a].add(b)
                    neighbors[b].add(a)
            # opposite vertices per edge for the 1/8 weights
            opp = {}
            for f in F:
                for a, b, c in ((f[0], f[1], f[2]), (f[1], f[2], f[0]),
                                (f[2], f[0], f[1])):
                    opp.setdefault(edge_key(a, b), []).append(c)
            mid_pos = {}
            for (a, b), cs in opp.items():
                if len(cs) == 2:
                    mp = 0.375 * (V[a] + V[b]) + 0.125 * (V[cs[0]] + V[cs[1]])
                else:  # boundary edge
                    mp = 0.5 * (V[a] + V[b])
                mid_pos[(a, b)] = mp
            # smoothed original vertices (Loop beta rule)
            V_new = V.copy()
            for i in range(len(V)):
                n = len(neighbors[i])
                if n < 3:
                    continue
                beta = (0.625 - (0.375 + 0.25 * _np.cos(2 * _np.pi / n)) ** 2) / n
                V_new[i] = (1 - n * beta) * V[i] + beta * sum(
                    (V[j] for j in neighbors[i]), _np.zeros(3, _np.float32))
            # assign midpoint indices
            base = len(V_new)
            mid_idx = {}
            mid_list = []
            for k in mid_pos:
                mid_idx[k] = base + len(mid_list)
                mid_list.append(mid_pos[k])
            V = _np.concatenate([V_new, _np.asarray(mid_list, _np.float32)
                                 if mid_list else _np.zeros((0, 3), _np.float32)])
            F2 = []
            for f in F:
                m01 = mid_idx[edge_key(f[0], f[1])]
                m12 = mid_idx[edge_key(f[1], f[2])]
                m20 = mid_idx[edge_key(f[2], f[0])]
                F2 += [(f[0], m01, m20), (f[1], m12, m01),
                       (f[2], m20, m12), (m01, m12, m20)]
            F = _np.asarray(F2, _np.int64)
        for f in F:
            self.triangle(V[f[0]], V[f[1]], V[f[2]], **kw)

    def nurbs(self, nu: int, nv: int, uorder: int, vorder: int,
              uknots, vknots, P, w=None, n_eval: int = 24, **kw) -> None:
        """NURBS patch (src/shapes/nurbs.cpp): Cox-de Boor basis evaluation on
        an ``n_eval`` x ``n_eval`` grid at build, emitted as triangles.
        ``P``: (nu*nv, 3) control points; ``w``: optional rational weights."""
        import numpy as _np

        P = _np.asarray(P, _np.float32).reshape(nu * nv, 3)
        w = (_np.asarray(w, _np.float32).reshape(nu * nv)
             if w is not None else _np.ones(nu * nv, _np.float32))
        uk = _np.asarray(uknots, _np.float32)
        vk = _np.asarray(vknots, _np.float32)

        def basis(knots, order, n_cp, t):
            """Cox-de Boor: returns (n_cp,) basis values at parameter t."""
            k = order  # order = degree + 1 (pbrt convention)
            N = _np.zeros((len(knots) - 1,), _np.float32)
            # degree-0
            for i in range(len(knots) - 1):
                if knots[i] <= t < knots[i + 1]:
                    N[i] = 1.0
            if t >= knots[-1] - 1e-6:
                # clamp the end of the domain
                for i in range(len(knots) - 2, -1, -1):
                    if knots[i] < knots[i + 1]:
                        N[i] = 1.0
                        break
            for d in range(1, k):
                N_next = _np.zeros_like(N)
                for i in range(len(N) - d):
                    left = 0.0
                    if knots[i + d] > knots[i]:
                        left = (t - knots[i]) / (knots[i + d] - knots[i]) * N[i]
                    right = 0.0
                    if knots[i + d + 1] > knots[i + 1]:
                        right = (knots[i + d + 1] - t) / (
                            knots[i + d + 1] - knots[i + 1]) * N[i + 1]
                    N_next[i] = left + right
                N = N_next
            return N[:n_cp]

        u0, u1 = float(uk[uorder - 1]), float(uk[nu])
        v0, v1 = float(vk[vorder - 1]), float(vk[nv])
        us = _np.linspace(u0, u1, n_eval, dtype=_np.float32)
        vs = _np.linspace(v0, v1, n_eval, dtype=_np.float32)
        grid = _np.zeros((n_eval, n_eval, 3), _np.float32)
        for iu, uu in enumerate(us):
            Bu = basis(uk, uorder, nu, uu)
            for iv, vv in enumerate(vs):
                Bv = basis(vk, vorder, nv, vv)
                wts = _np.outer(Bu, Bv).reshape(-1) * w
                denom = max(float(wts.sum()), 1e-9)
                grid[iu, iv] = (wts[:, None] * P).sum(0) / denom
        for iu in range(n_eval - 1):
            for iv in range(n_eval - 1):
                a = grid[iu, iv]
                bq = grid[iu + 1, iv]
                c = grid[iu + 1, iv + 1]
                d_ = grid[iu, iv + 1]
                self.triangle(a, bq, c, **kw)
                self.triangle(a, c, d_, **kw)

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
    def _add_light(self, **kw) -> int:
        base = dict(shape_kind=-1, shape_index=-1, two_sided=0, medium=-1,
                    cos_falloff_start=1.0, cos_total_width=1.0,
                    direction=np.zeros(3, np.float32), img=-1,
                    world_to_light=np.eye(4, dtype=np.float32))
        base.update(kw)
        self._light.append(base)
        return len(self._light) - 1

    def _add_light_image(self, image) -> int:
        from ..textures import build_pyramid

        self._light_images.append(build_pyramid(np.asarray(image, np.float32)))
        return len(self._light_images) - 1

    def goniometric_light(self, position=(0, 0, 0), intensity=(1, 1, 1),
                          image=None, world_to_light=None,
                          medium: int = -1) -> int:
        """Goniophotometric point light (src/lights/goniometric.cpp): intensity
        scaled by an angular image map indexed by spherical coords of the
        emitted direction in light space."""
        img = self._add_light_image(image) if image is not None else -1
        w2l = (np.asarray(world_to_light, np.float32)
               if world_to_light is not None else np.eye(4, dtype=np.float32))
        return self._add_light(ltype=LIGHT_GONIOMETRIC, position=_rgb(position),
                               emit=_rgb(intensity), medium=medium, img=img,
                               world_to_light=w2l)

    def projection_light(self, position=(0, 0, 0), intensity=(1, 1, 1),
                         image=None, fov=45.0, target=(0, 0, 1),
                         medium: int = -1) -> int:
        """Slide-projector light (src/lights/projection.cpp): point light
        emitting the image through a perspective frustum of the given fov
        toward ``target``; zero outside the frustum."""
        img = self._add_light_image(image) if image is not None else -1
        w = _rgb(target) - _rgb(position)
        w = w / max(np.linalg.norm(w), 1e-9)
        # light space: +z along the projection axis; pick a non-parallel up
        from ..core import transform as tfm

        up = (0.0, 1.0, 0.0) if abs(float(w[1])) < 0.99 else (1.0, 0.0, 0.0)
        l2w = np.asarray(tfm.look_at(_rgb(position), _rgb(position) + w, up),
                         np.float32)
        w2l = np.linalg.inv(l2w).astype(np.float32)
        # the frustum's corner cone bound (projection.cpp cosTotalWidth)
        half_d = np.deg2rad(fov) * 0.5
        cos_total = float(np.cos(np.arctan(np.tan(half_d) * np.sqrt(2.0))))
        return self._add_light(ltype=LIGHT_PROJECTION, position=_rgb(position),
                               direction=w, emit=_rgb(intensity),
                               medium=medium, img=img, world_to_light=w2l,
                               cos_total_width=cos_total,
                               cos_falloff_start=float(np.cos(half_d)))

    def point_light(self, position=(0, 0, 0), intensity=(1, 1, 1), medium: int = -1) -> int:
        return self._add_light(ltype=LIGHT_POINT, position=_rgb(position),
                               emit=_rgb(intensity), medium=medium)

    def spot_light(self, position=(0, 0, 0), target=(0, 0, 1), intensity=(1, 1, 1),
                   coneangle=30.0, conedeltaangle=5.0, medium: int = -1) -> int:
        """Spot light (src/lights/spot.cpp; params coneangle/conedeltaangle)."""
        w = _rgb(target) - _rgb(position)
        w = w / max(np.linalg.norm(w), 1e-9)
        return self._add_light(
            ltype=LIGHT_SPOT, position=_rgb(position), direction=w,
            emit=_rgb(intensity), medium=medium,
            cos_falloff_start=float(np.cos(np.deg2rad(coneangle - conedeltaangle))),
            cos_total_width=float(np.cos(np.deg2rad(coneangle))),
        )

    def distant_light(self, direction=(0, 0, -1), radiance=(1, 1, 1)) -> int:
        w = np.asarray(direction, np.float32)
        w = w / np.linalg.norm(w)
        return self._add_light(ltype=LIGHT_DISTANT, position=np.zeros(3, np.float32),
                               direction=w, emit=_rgb(radiance))

    def infinite_light(self, radiance=(1, 1, 1), image=None,
                       world_to_light=None) -> int:
        """Environment light (src/lights/infinite.cpp): constant L, or an
        equirectangular radiance map (importance-sampled via the map's 2D
        luminance distribution, infinite.cpp:~50-70 Distribution2D build)."""
        img = self._add_light_image(image) if image is not None else -1
        w2l = (np.asarray(world_to_light, np.float32)
               if world_to_light is not None else np.eye(4, dtype=np.float32))
        return self._add_light(ltype=LIGHT_INFINITE,
                               position=np.zeros(3, np.float32),
                               emit=_rgb(radiance), img=img,
                               world_to_light=w2l)

    def area_light_sphere(self, center, radius, radiance, material: int = -1,
                          two_sided=False, medium: int = -1, medium_inside: int = -1) -> int:
        """Diffuse area light over a sphere (src/lights/diffuse.cpp)."""
        light_id = len(self._light)
        sidx = self.sphere(
            center, radius, material=material, _area_light=light_id,
            medium_inside=medium_inside, medium_outside=medium,
        )
        self._add_light(
            ltype=LIGHT_DIFFUSE_AREA, position=_rgb(center), emit=_rgb(radiance),
            shape_kind=SHAPE_SPHERE, shape_index=sidx, two_sided=int(two_sided),
            medium=medium,
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
            self._add_light(
                ltype=LIGHT_DIFFUSE_AREA,
                position=np.mean(np.stack([_rgb(p) for p in tri]), 0),
                emit=_rgb(radiance), shape_kind=SHAPE_TRIANGLE, shape_index=tidx,
                two_sided=int(two_sided), medium=medium,
            )
            ids.append(light_id)
        return ids[0]

    def fourier_material(self, bsdffile=None, table=None) -> int:
        """FourierMaterial (src/materials/fourier.cpp:200-230): tabulated
        BSDF from a SCATFUN `.bsdf` file (param ``bsdffile``) or an
        in-memory FourierTable (e.g. from fourier.project_bsdf_table)."""
        from ..fourier import read_bsdf_file
        from .scene import MAT_FOURIER

        if table is None:
            if bsdffile is None:
                raise ValueError("fourier material needs bsdffile= or table=")
            table = read_bsdf_file(bsdffile)
        idx = len(self._fourier_tables)
        self._fourier_tables.append(table)
        return self._add_mat(MAT_FOURIER, kd=(0, 0, 0), ks=(0, 0, 0),
                             eta=table.eta, fourier=idx)

    def _frozen_fourier_tables(self):
        from ..fourier import empty_fourier_tables, stack_fourier_tables

        if not self._fourier_tables:
            return empty_fourier_tables()
        return stack_fourier_tables(self._fourier_tables)

    def _frozen_bss_tables(self):
        from ..bssrdf import BSSRDFTables, empty_bssrdf_tables

        if not self._bss_tables:
            return empty_bssrdf_tables()
        return BSSRDFTables(
            rho=jnp.asarray(np.stack([t["rho"] for t in self._bss_tables])),
            radius=jnp.asarray(np.stack([t["radius"] for t in self._bss_tables])),
            profile=jnp.asarray(np.stack([t["profile"] for t in self._bss_tables])),
            rho_eff=jnp.asarray(np.stack([t["rho_eff"] for t in self._bss_tables])),
            cdf=jnp.asarray(np.stack([t["cdf"] for t in self._bss_tables])),
        )

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
            tangent=stack(self._tri, "tangent"),
            n0=jnp.asarray(np.stack(
                [t.get("n0", np.zeros(3, np.float32)) for t in self._tri])
                if self._tri else np.zeros((0, 3), np.float32)),
            n1=jnp.asarray(np.stack(
                [t.get("n1", np.zeros(3, np.float32)) for t in self._tri])
                if self._tri else np.zeros((0, 3), np.float32)),
            n2=jnp.asarray(np.stack(
                [t.get("n2", np.zeros(3, np.float32)) for t in self._tri])
                if self._tri else np.zeros((0, 3), np.float32)),
            uv0=jnp.asarray(np.stack(
                [t.get("uv0", _UV_DEFAULT[0]) for t in self._tri])
                if self._tri else np.zeros((0, 2), np.float32)),
            uv1=jnp.asarray(np.stack(
                [t.get("uv1", _UV_DEFAULT[1]) for t in self._tri])
                if self._tri else np.zeros((0, 2), np.float32)),
            uv2=jnp.asarray(np.stack(
                [t.get("uv2", _UV_DEFAULT[2]) for t in self._tri])
                if self._tri else np.zeros((0, 2), np.float32)),
        )
        materials = Materials(
            mtype=col(self._mat, "mtype"),
            kd=stack(self._mat, "kd"),
            ks=stack(self._mat, "ks"),
            eta=col(self._mat, "eta", np.float32),
            roughness=col(self._mat, "roughness", np.float32),
            metal_eta=stack(self._mat, "metal_eta"),
            metal_k=stack(self._mat, "metal_k"),
            kd_tex=col(self._mat, "kd_tex"),
            mix_m1=col(self._mat, "mix_m1"),
            mix_m2=col(self._mat, "mix_m2"),
            mix_amount=stack(self._mat, "mix_amount"),
            beta_n=col(self._mat, "beta_n", np.float32),
            hair_alpha=col(self._mat, "hair_alpha", np.float32),
            bss_sigma_a=stack(self._mat, "bss_sigma_a"),
            bss_sigma_s=stack(self._mat, "bss_sigma_s"),
            bss_table=col(self._mat, "bss_table"),
            bss_tables=self._frozen_bss_tables(),
            fourier=col(self._mat, "fourier"),
            fourier_tables=self._frozen_fourier_tables(),
        )
        from ..textures import pack_atlas

        atlas_np, img_offs = pack_atlas(self._images)
        n_tex = len(self._tex)
        t_off = np.full(n_tex, -1, np.int32)
        t_w = np.zeros(n_tex, np.int32)
        t_h = np.zeros(n_tex, np.int32)
        t_nl = np.zeros(n_tex, np.int32)
        for i, t in enumerate(self._tex):
            img = t.get("img", -1)
            if img >= 0:
                py = self._images[img]
                t_off[i] = img_offs[img]
                t_h[i], t_w[i] = py[0].shape[:2]
                t_nl[i] = len(py)
        textures = Textures(
            ttype=col(self._tex, "ttype"),
            c0=stack(self._tex, "c0"),
            c1=stack(self._tex, "c1"),
            scale=col(self._tex, "scale", np.float32),
            octaves=col(self._tex, "octaves"),
            omega=col(self._tex, "omega", np.float32),
            img_off=jnp.asarray(t_off),
            img_w=jnp.asarray(t_w),
            img_h=jnp.asarray(t_h),
            n_levels=jnp.asarray(t_nl),
            uv_scale=stack(self._tex, "uv_scale") if self._tex else jnp.zeros((0, 2)),
            uv_delta=stack(self._tex, "uv_delta") if self._tex else jnp.zeros((0, 2)),
            atlas=jnp.asarray(atlas_np),
            child0=col(self._tex, "child0"),
            child1=col(self._tex, "child1"),
            nest=jnp.zeros((_tex_graph_depth(self._tex),)),
            c2=jnp.asarray(np.stack(
                [t.get("c2", np.zeros(3, np.float32)) for t in self._tex])
                if self._tex else np.zeros((0, 3), np.float32)),
            c3=jnp.asarray(np.stack(
                [t.get("c3", np.zeros(3, np.float32)) for t in self._tex])
                if self._tex else np.zeros((0, 3), np.float32)),
        )
        l_atlas_np, l_offs = pack_atlas(self._light_images)
        n_l = len(self._light)
        l_off = np.full(n_l, -1, np.int32)
        l_w = np.zeros(n_l, np.int32)
        l_h = np.zeros(n_l, np.int32)
        l_mean = np.ones((n_l, 3), np.float32)
        env_light = -1
        for i, l in enumerate(self._light):
            img = l.get("img", -1)
            if img >= 0:
                py = self._light_images[img]
                l_off[i] = l_offs[img]
                l_h[i], l_w[i] = py[0].shape[:2]
                l_mean[i] = py[0].reshape(-1, 3).mean(0)
                if l["ltype"] == LIGHT_INFINITE:
                    env_light = i
        # env-map importance distribution (infinite.cpp ctor: Distribution2D
        # over luminance * sin(theta))
        if env_light >= 0:
            env0 = self._light_images[self._light[env_light]["img"]][0]
            lum = env0 @ np.array([0.212671, 0.715160, 0.072169], np.float32)
            He, We = lum.shape
            sin_t = np.sin(np.pi * (np.arange(He) + 0.5) / He).astype(np.float32)
            func = np.maximum(lum * sin_t[:, None], 0.0).astype(np.float32)
            row_int = func.mean(axis=1)  # per-row integral (unnormalized)
            cond = np.concatenate(
                [np.zeros((He, 1), np.float32), np.cumsum(func, axis=1) / We], 1)
            cond = cond / np.maximum(row_int[:, None], 1e-30)
            marg = np.concatenate(
                [np.zeros(1, np.float32), np.cumsum(row_int) / He])
            marg_int = marg[-1]
            marg = marg / max(marg_int, 1e-30)
            env_func = jnp.asarray(func)
            env_marg_cdf = jnp.asarray(marg.astype(np.float32))
            env_cond_cdf = jnp.asarray(cond.astype(np.float32))
        else:
            env_func = jnp.zeros((1, 1))
            env_marg_cdf = jnp.zeros((2,))
            env_cond_cdf = jnp.zeros((1, 2))
        lights = Lights(
            ltype=col(self._light, "ltype"),
            position=stack(self._light, "position"),
            direction=stack(self._light, "direction"),
            emit=stack(self._light, "emit"),
            shape_kind=col(self._light, "shape_kind"),
            shape_index=col(self._light, "shape_index"),
            two_sided=col(self._light, "two_sided"),
            medium=col(self._light, "medium"),
            cos_falloff_start=col(self._light, "cos_falloff_start", np.float32),
            cos_total_width=col(self._light, "cos_total_width", np.float32),
            img_off=jnp.asarray(l_off),
            img_w=jnp.asarray(l_w),
            img_h=jnp.asarray(l_h),
            img_mean=jnp.asarray(l_mean),
            world_to_light=(stack(self._light, "world_to_light")
                            if self._light else jnp.zeros((0, 4, 4))),
            atlas=jnp.asarray(l_atlas_np),
            env_light=jnp.int32(env_light),
            env_func=env_func,
            env_marg_cdf=env_marg_cdf,
            env_cond_cdf=env_cond_cdf,
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
        # LBVH over the triangle soup for large meshes (the analog of pbrt
        # wrapping primitives in a BVHAccel, api.cpp:1419-1428); small scenes
        # keep the dense sweep (faster on TPU at those sizes).
        tri_bvh = None
        if len(self._tri) >= BVH_MIN_TRIANGLES:
            from ..accel.lbvh import build_lbvh

            p0 = np.asarray(triangles.p0)
            p1 = np.asarray(triangles.p1)
            p2 = np.asarray(triangles.p2)
            bmin = np.minimum(np.minimum(p0, p1), p2)
            bmax = np.maximum(np.maximum(p0, p1), p2)
            tri_bvh = build_lbvh(
                jnp.asarray(bmin), jnp.asarray(bmax),
                jnp.ones((p0.shape[0],), bool),
            )
        return Scene(
            spheres=spheres,
            triangles=triangles,
            materials=materials,
            lights=lights,
            media=media,
            textures=textures,
            camera_medium=jnp.int32(self.camera_medium),
            world_min=jnp.asarray(wmin, jnp.float32),
            world_max=jnp.asarray(wmax, jnp.float32),
            tri_bvh=tri_bvh,
        )
