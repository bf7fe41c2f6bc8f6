"""Vectorized ray-scene intersection.

Reference: /root/reference/src/core/scene.h:64-66 (``Scene::Intersect`` /
``IntersectP``), src/shapes/sphere.cpp:117-230 (ray-sphere quadratic),
src/shapes/triangle.cpp:156-296 (watertight ray-triangle), and the BVH
traversal in src/accelerators/bvh.cpp.

TPU-first design: pbrt dispatches per-ray through a BVH with virtual
``Shape::Intersect`` calls.  Here a whole *batch* of rays tests a whole batch
of primitives as one dense broadcasted computation — a (R, N) masked min —
which is the right trade on TPU for the BASELINE scene sizes (tens of
primitives): zero divergence, full VPU utilization, trivially differentiable.
Above ``_PRIM_CHUNK`` primitives the sweep runs as a ``lax.scan`` over
primitive chunks with a running nearest-hit carry, bounding memory at
O(rays x chunk) for large tessellations (plymesh/loopsubdiv/nurbs grids).
Meshes past ``builder.BVH_MIN_TRIANGLES`` get the shared LBVH
(bre_tpu/accel/lbvh.py, the same module photon structures use): the builder
stores it on ``Scene.tri_bvh`` and ``intersect``/``intersect_p`` switch to a
per-ray stack traversal (``_tri_bvh_traverse``) — O(log N) node visits per
ray instead of the O(N) sweep, the analog of pbrt wrapping all primitives in
a BVHAccel (api.cpp:1419-1428).

All functions take ``(R, 3)`` ray batches and return SoA ``Hit`` arrays.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.math import cross, dot, normalize
from .scene import SHAPE_SPHERE, SHAPE_TRIANGLE, Scene

_BIG = jnp.float32(1e30)
_EPS = jnp.float32(1e-7)


class Hit(NamedTuple):
    """SoA hit record (analog of pbrt SurfaceInteraction, geometry subset)."""

    valid: jnp.ndarray  # (R,) bool
    t: jnp.ndarray  # (R,) hit distance (in units of |d|)
    p: jnp.ndarray  # (R, 3) hit point
    n: jnp.ndarray  # (R, 3) outward geometric normal (unit)
    material: jnp.ndarray  # (R,) int32
    medium_inside: jnp.ndarray  # (R,) int32
    medium_outside: jnp.ndarray  # (R,) int32
    area_light: jnp.ndarray  # (R,) int32
    prim_kind: jnp.ndarray  # (R,) int32 SHAPE_*
    prim_index: jnp.ndarray  # (R,) int32
    uv: jnp.ndarray  # (R,2) surface parameterization (sphere phi/theta,
    #                  triangle barycentrics) — pbrt SurfaceInteraction::uv
    tangent: jnp.ndarray  # (R,3) shading tangent (hair fiber dir; zeros else)
    # shading normal (pbrt SurfaceInteraction::shading.n): barycentric
    # interpolation of per-vertex normals when the mesh has them, else the
    # geometric normal.  BSDF evaluation uses ns; ray offsets and medium
    # entering/exit tests stay on the geometric n.
    ns: jnp.ndarray = None  # (R,3)


def ray_sphere(o, d, center, radius, t_min, t_max):
    """Ray-sphere ts: (R,3),(R,3) x (N,3),(N,) -> (R,N) t or BIG.

    Stable quadratic (reference sphere.cpp:117-170 without EFloat bounds;
    float32 + spawn-point epsilons stand in for pbrt's running error).
    Returns nearest t in (t_min, t_max); both roots considered.
    """
    oc = o[:, None, :] - center[None, :, :]  # (R,N,3)
    a = jnp.sum(d * d, -1)[:, None]  # (R,1)
    b = 2.0 * jnp.sum(oc * d[:, None, :], -1)  # (R,N)
    c = jnp.sum(oc * oc, -1) - (radius * radius)[None, :]
    disc = b * b - 4.0 * a * c
    # radius > 0 also rejects zero-radius padding spheres, whose huge center
    # coordinates can make disc spuriously positive via f32 cancellation
    ok = (disc > 0.0) & (radius > 0.0)[None, :]
    # double-where: sqrt'(0) = inf would leak NaN into the backward through
    # the miss lanes even though their value is masked below
    sqrt_d = jnp.sqrt(jnp.where(ok, disc, 1.0))
    # numerically stable roots (pbrt Quadratic, pbrt.h:1049-1069)
    sign_b = jnp.where(b >= 0.0, 1.0, -1.0)  # copysign; jnp.sign(0)=0 breaks b=0
    q = -0.5 * (b + sign_b * sqrt_d)
    t0 = q / a
    t1 = c / jnp.where(q == 0.0, 1.0, q)
    t1 = jnp.where(q == 0.0, t0, t1)  # degenerate: grazing root
    lo = jnp.minimum(t0, t1)
    hi = jnp.maximum(t0, t1)
    tmn = t_min[:, None]
    tmx = t_max[:, None]
    use_lo = (lo > tmn) & (lo < tmx)
    use_hi = (hi > tmn) & (hi < tmx)
    t = jnp.where(use_lo, lo, jnp.where(use_hi, hi, _BIG))
    return jnp.where(ok, t, _BIG)


def ray_triangle(o, d, p0, p1, p2, t_min, t_max):
    """Moller-Trumbore ray-triangle: returns (R,N) t or BIG.

    (Reference uses the watertight transform at triangle.cpp:156-296; MT in
    float32 with an epsilon determinant test is the standard GPU/TPU choice.)
    """
    e1 = (p1 - p0)[None, :, :]  # (1,N,3)
    e2 = (p2 - p0)[None, :, :]
    dv = d[:, None, :]  # (R,1,3)
    pv = cross(dv, e2)  # (R,N,3)
    det = jnp.sum(e1 * pv, -1)  # (R,N)
    ok = jnp.abs(det) > _EPS
    inv_det = 1.0 / jnp.where(ok, det, 1.0)
    tv = o[:, None, :] - p0[None, :, :]
    u = jnp.sum(tv * pv, -1) * inv_det
    qv = cross(tv, e1)
    v = jnp.sum(dv * qv, -1) * inv_det
    t = jnp.sum(e2 * qv, -1) * inv_det
    inside = (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
    in_range = (t > t_min[:, None]) & (t < t_max[:, None])
    return jnp.where(ok & inside & in_range, t, _BIG)


# Primitives per dense sweep chunk: bounds the (R, chunk) intermediates so
# large meshes (plymesh / loopsubdiv tessellations) stay within HBM instead
# of materializing (R, N) for the whole scene.  Small scenes (every BASELINE
# config) take the single-chunk fast path with zero overhead.
_PRIM_CHUNK = 8192


def _nearest_over_chunks(prim_ts, N: int, t_min, t_max):
    """Running (best_t, best_idx) of ``prim_ts(lo, size) -> (R, size)`` over
    primitive chunks via ``lax.scan`` (memory O(R * chunk)).

    best_t comes from ``jnp.min`` rather than take_along_axis(argmin): the
    row gather is latency-bound on TPU and its AD transpose is a scatter-add;
    the min's transpose is an elementwise eq-mask (same value, same gradient
    target — ties broken identically by argmin's first-min convention)."""
    if N <= _PRIM_CHUNK:
        ts = prim_ts(0, N)
        return jnp.min(ts, axis=1), jnp.argmin(ts, axis=1).astype(jnp.int32)

    n_chunks = -(-N // _PRIM_CHUNK)
    R = t_min.shape[0]

    def body(carry, ci):
        best_t, best_i = carry
        lo = ci * _PRIM_CHUNK
        ts = prim_ts(lo, _PRIM_CHUNK)  # padded tail yields _BIG
        tb = jnp.min(ts, axis=1)
        i = jnp.argmin(ts, axis=1)
        better = tb < best_t
        best_t = jnp.where(better, tb, best_t)
        best_i = jnp.where(better, lo + i.astype(jnp.int32), best_i)
        return (best_t, best_i), None

    init = (jnp.full((R,), _BIG), jnp.zeros((R,), jnp.int32))
    (best_t, best_i), _ = jax.lax.scan(body, init, jnp.arange(n_chunks))
    return best_t, best_i


def _pad_prims(arr, N: int):
    """Pad a primitive array to a chunk multiple with far-away degenerates."""
    if N <= _PRIM_CHUNK:
        return arr
    Np = (-(-N // _PRIM_CHUNK)) * _PRIM_CHUNK
    if Np == N:
        return arr
    pad = jnp.full((Np - N,) + arr.shape[1:], jnp.float32(1e9), arr.dtype)
    return jnp.concatenate([arr, pad], 0)


def _pad_prims_zero(arr, N: int):
    if N <= _PRIM_CHUNK:
        return arr
    Np = (-(-N // _PRIM_CHUNK)) * _PRIM_CHUNK
    if Np == N:
        return arr
    return jnp.concatenate(
        [arr, jnp.zeros((Np - N,) + arr.shape[1:], arr.dtype)], 0)


def _ray_tri_pairwise(o, d, p0, p1, p2, t_min, t_max):
    """Elementwise Moller-Trumbore: ray i vs triangle i -> (R,) t or BIG."""
    e1 = p1 - p0
    e2 = p2 - p0
    pv = cross(d, e2)
    det = jnp.sum(e1 * pv, -1)
    ok = jnp.abs(det) > _EPS
    inv_det = 1.0 / jnp.where(ok, det, 1.0)
    tv = o - p0
    u = jnp.sum(tv * pv, -1) * inv_det
    qv = cross(tv, e1)
    v = jnp.sum(d * qv, -1) * inv_det
    t = jnp.sum(e2 * qv, -1) * inv_det
    inside = (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
    in_range = (t > t_min) & (t < t_max)
    return jnp.where(ok & inside & in_range, t, _BIG)


def _tri_bvh_traverse(scene: Scene, o, d, t_min, t_max, any_hit: bool,
                      max_stack: int = 64):
    """Per-ray LBVH traversal over the triangle soup.

    The TPU analog of pbrt's iterative BVH walk with a 64-deep local stack
    (bvh.cpp BVHAccel::Intersect; same structure as the fork's beam BVH at
    photonbeambvh.cpp:685-723): a ``lax.while_loop`` with an explicit
    register stack, ``vmap``-ed over rays so lanes run in lockstep.  Node
    boxes are pruned against the running nearest t (slab test).

    Discrete by construction: all inputs are stop-gradiented and the caller
    recomputes the winning t differentiably from the returned index, so
    ``jax.grad`` never sees the while_loop (fixed-structure gradients, the
    same convention the beam gather uses for BVH topology).

    Returns (best_t (R,), best_idx (R,) int32) — for ``any_hit`` best_t is
    the first accepted hit (traversal exits early) and only occlusion
    (best_t < BIG) is meaningful.
    """
    bvh = scene.tri_bvh
    sg = jax.lax.stop_gradient
    o, d, t_min, t_max = sg(o), sg(d), sg(t_min), sg(t_max)
    p0 = sg(scene.triangles.p0)
    p1 = sg(scene.triangles.p1)
    p2 = sg(scene.triangles.p2)
    # For shadow rays, boundary-only surfaces (no material) never occlude
    # (scene.cpp:63-92 IntersectTr skips null-BSDF interfaces).
    occludes = scene.triangles.material >= 0 if any_hit else None

    def one_ray(oo, dd, tmn, tmx):
        safe_d = jnp.where(jnp.abs(dd) < 1e-20, jnp.float32(1e-20), dd)
        inv_d = 1.0 / safe_d

        def box_hit(bmin, bmax, best):
            lo = (bmin - oo) * inv_d
            hi = (bmax - oo) * inv_d
            tn = jnp.maximum(jnp.max(jnp.minimum(lo, hi)), tmn)
            tf = jnp.minimum(jnp.min(jnp.maximum(lo, hi)),
                             jnp.minimum(best, tmx))
            return tn <= tf

        def tri_t(pid):
            e1 = p1[pid] - p0[pid]
            e2 = p2[pid] - p0[pid]
            pv = jnp.cross(dd, e2)
            det = jnp.dot(e1, pv)
            ok = jnp.abs(det) > _EPS
            inv_det = 1.0 / jnp.where(ok, det, 1.0)
            tv = oo - p0[pid]
            u = jnp.dot(tv, pv) * inv_det
            qv = jnp.cross(tv, e1)
            v = jnp.dot(dd, qv) * inv_det
            t = jnp.dot(e2, qv) * inv_det
            good = (ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                    & (t > tmn) & (t < tmx))
            if any_hit:
                good &= occludes[pid]
            return jnp.where(good, t, _BIG)

        def handle_child(c, stack, sp, best_t, best_i):
            is_leaf = c < 0
            leaf = jnp.where(is_leaf, ~c, 0)
            internal = jnp.where(is_leaf, 0, c)
            pid = bvh.prim_ids[leaf]
            t = tri_t(pid)
            better = is_leaf & (t < best_t)
            best_t = jnp.where(better, t, best_t)
            best_i = jnp.where(better, pid, best_i)
            push = (~is_leaf) & box_hit(bvh.node_min[internal],
                                        bvh.node_max[internal], best_t)
            can = sp < max_stack
            stack = jnp.where(push & can,
                              stack.at[jnp.minimum(sp, max_stack - 1)].set(c),
                              stack)
            sp = sp + jnp.where(push & can, 1, 0)
            return stack, sp, best_t, best_i

        def body(carry):
            stack, sp, best_t, best_i = carry
            sp = sp - 1
            node = stack[sp]
            stack, sp, best_t, best_i = handle_child(
                bvh.left_child[node], stack, sp, best_t, best_i)
            stack, sp, best_t, best_i = handle_child(
                bvh.right_child[node], stack, sp, best_t, best_i)
            if any_hit:  # early exit once occluded
                sp = jnp.where(best_t < _BIG, 0, sp)
            return stack, sp, best_t, best_i

        stack = jnp.zeros((max_stack,), jnp.int32)  # stack[0] = root node 0
        sp = jnp.where(box_hit(bvh.node_min[0], bvh.node_max[0], _BIG),
                       jnp.int32(1), jnp.int32(0))
        _, _, best_t, best_i = jax.lax.while_loop(
            lambda c: c[1] > 0, body,
            (stack, sp, jnp.asarray(_BIG), jnp.int32(0)))
        return best_t, best_i

    return jax.vmap(one_ray)(o, d, t_min, t_max)


def _use_tri_bvh(scene: Scene) -> bool:
    return scene.tri_bvh is not None and scene.tri_bvh.n_leaves > 1


def intersect(scene: Scene, o: jnp.ndarray, d: jnp.ndarray, t_max=None,
              t_min=None) -> Hit:
    """Nearest-hit query for a ray batch (Scene::Intersect, scene.cpp:37-44)."""
    R = o.shape[0]
    if t_max is None:
        t_max = jnp.full((R,), _BIG)
    if t_min is None:
        t_min = jnp.full((R,), jnp.float32(1e-4))
    best_t = jnp.full((R,), _BIG)
    best_kind = jnp.full((R,), -1, jnp.int32)
    best_idx = jnp.zeros((R,), jnp.int32)

    if scene.n_spheres > 0:
        Ns = scene.n_spheres
        c_p = _pad_prims(scene.spheres.center, Ns)
        r_p = _pad_prims_zero(scene.spheres.radius, Ns)

        def sphere_ts(lo, size):
            sl = lambda x: jax.lax.dynamic_slice_in_dim(x, lo, size, 0)
            return ray_sphere(o, d, sl(c_p), sl(r_p), t_min, t_max)

        tbest, i = _nearest_over_chunks(sphere_ts, Ns, t_min, t_max)
        better = tbest < best_t
        best_t = jnp.where(better, tbest, best_t)
        best_kind = jnp.where(better, SHAPE_SPHERE, best_kind)
        best_idx = jnp.where(better, jnp.minimum(i, Ns - 1), best_idx)

    if scene.n_triangles > 0:
        Nt = scene.n_triangles
        if _use_tri_bvh(scene):
            t_ng, i = _tri_bvh_traverse(scene, o, d, t_min, t_max,
                                        any_hit=False)
            # Differentiable recompute of the winning t from the discrete
            # index (the traversal itself is stop-gradiented); matches the
            # dense path's gradient w.r.t. the selected triangle's vertices.
            t_re = _ray_tri_pairwise(o, d, scene.triangles.p0[i],
                                     scene.triangles.p1[i],
                                     scene.triangles.p2[i], t_min, t_max)
            tbest = jnp.where(t_ng < _BIG, t_re, _BIG)
        else:
            p0_p = _pad_prims(scene.triangles.p0, Nt)
            p1_p = _pad_prims(scene.triangles.p1, Nt)
            p2_p = _pad_prims(scene.triangles.p2, Nt)

            def tri_ts(lo, size):
                sl = lambda x: jax.lax.dynamic_slice_in_dim(x, lo, size, 0)
                return ray_triangle(o, d, sl(p0_p), sl(p1_p), sl(p2_p),
                                    t_min, t_max)

            tbest, i = _nearest_over_chunks(tri_ts, Nt, t_min, t_max)
        better = tbest < best_t
        best_t = jnp.where(better, tbest, best_t)
        best_kind = jnp.where(better, SHAPE_TRIANGLE, best_kind)
        best_idx = jnp.where(better, jnp.minimum(i, Nt - 1), best_idx)

    valid = best_t < _BIG
    p = o + best_t[:, None] * d

    # Gather per-primitive attributes by (kind, idx); -1 defaults when miss.
    def gather(sph_arr, tri_arr, default):
        out = jnp.full_like(best_idx, default)
        if scene.n_spheres > 0:
            out = jnp.where(best_kind == SHAPE_SPHERE, sph_arr[best_idx], out)
        if scene.n_triangles > 0:
            out = jnp.where(best_kind == SHAPE_TRIANGLE, tri_arr[best_idx], out)
        return out

    material = gather(
        scene.spheres.material if scene.n_spheres else None,
        scene.triangles.material if scene.n_triangles else None,
        -1,
    )
    medium_inside = gather(
        scene.spheres.medium_inside if scene.n_spheres else None,
        scene.triangles.medium_inside if scene.n_triangles else None,
        -1,
    )
    medium_outside = gather(
        scene.spheres.medium_outside if scene.n_spheres else None,
        scene.triangles.medium_outside if scene.n_triangles else None,
        -1,
    )
    area_light = gather(
        scene.spheres.area_light if scene.n_spheres else None,
        scene.triangles.area_light if scene.n_triangles else None,
        -1,
    )

    # Outward geometric normal + surface UV.
    n = jnp.zeros_like(p)
    uv = jnp.zeros((R, 2))
    if scene.n_spheres > 0:
        c = scene.spheres.center[best_idx]
        n_s = normalize(p - c)
        n = jnp.where((best_kind == SHAPE_SPHERE)[:, None], n_s, n)
        # sphere UV (sphere.cpp: phi/phiMax, theta range)
        phi = jnp.arctan2(n_s[:, 1], n_s[:, 0])
        phi = jnp.where(phi < 0, phi + 2.0 * jnp.pi, phi)
        theta = jnp.arccos(jnp.clip(n_s[:, 2], -1.0, 1.0))
        uv_s = jnp.stack([phi / (2.0 * jnp.pi), theta / jnp.pi], -1)
        uv = jnp.where((best_kind == SHAPE_SPHERE)[:, None], uv_s, uv)
    bary = None
    if scene.n_triangles > 0:
        ii = best_idx
        e1 = scene.triangles.p1[ii] - scene.triangles.p0[ii]
        e2 = scene.triangles.p2[ii] - scene.triangles.p0[ii]
        n_t = normalize(cross(e1, e2))
        n = jnp.where((best_kind == SHAPE_TRIANGLE)[:, None], n_t, n)
        # barycentrics of the hit point
        rel = p - scene.triangles.p0[ii]
        d11 = jnp.sum(e1 * e1, -1)
        d12 = jnp.sum(e1 * e2, -1)
        d22 = jnp.sum(e2 * e2, -1)
        dr1 = jnp.sum(rel * e1, -1)
        dr2 = jnp.sum(rel * e2, -1)
        det = jnp.maximum(d11 * d22 - d12 * d12, 1e-20)
        b1 = (d22 * dr1 - d12 * dr2) / det
        b2 = (d11 * dr2 - d12 * dr1) / det
        bary = (b1, b2)
        # hit UV = barycentric interpolation of the per-vertex UVs
        # (triangle.cpp:171: uvHit = b0*uv[0] + b1*uv[1] + b2*uv[2]; the
        # builder stores pbrt's defaults (0,0)/(1,0)/(1,1) for meshes
        # without "float uv"/"st", so the default hit UV is (b1+b2, b2))
        uv_t = ((1.0 - b1 - b2)[:, None] * scene.triangles.uv0[ii]
                + b1[:, None] * scene.triangles.uv1[ii]
                + b2[:, None] * scene.triangles.uv2[ii])
        uv = jnp.where((best_kind == SHAPE_TRIANGLE)[:, None], uv_t, uv)

    tangent = jnp.zeros_like(p)
    if scene.n_triangles > 0:
        tangent = jnp.where((best_kind == SHAPE_TRIANGLE)[:, None],
                            scene.triangles.tangent[best_idx], tangent)
    if scene.n_spheres > 0:
        # sphere dpdu (sphere.cpp:137: Vector3f(-phiMax*pHit.y, phiMax*
        # pHit.x, 0) in object space; spheres are stored world-axis-aligned
        # so only the center translation applies).  The BSDF frame's ss
        # axis; zero at the poles falls back to coordinate_system.
        rel_s = p - scene.spheres.center[best_idx]
        t_s = jnp.stack(
            [-rel_s[:, 1], rel_s[:, 0], jnp.zeros_like(rel_s[:, 0])], -1)
        t_len = jnp.sqrt(jnp.sum(t_s * t_s, -1, keepdims=True))
        t_s = jnp.where(t_len > 1e-9, t_s / jnp.maximum(t_len, 1e-12), 0.0)
        tangent = jnp.where((best_kind == SHAPE_SPHERE)[:, None], t_s,
                            tangent)

    # shading normal: barycentric vertex-normal interpolation where the
    # mesh carries normals (triangle.cpp shading geometry).  The AUTHORED
    # shading-normal orientation is kept, and the geometric normal is
    # forward-faced into its hemisphere — reference semantics
    # (Triangle::Intersect: `isect->n = Faceforward(isect->n, ns)` when the
    # mesh has per-vertex normals), so meshes authored with inward normals
    # keep their sidedness.
    ns = n
    if scene.n_triangles > 0 and scene.triangles.n0.shape[0]:
        vn0 = scene.triangles.n0[best_idx]
        vn1 = scene.triangles.n1[best_idx]
        vn2 = scene.triangles.n2[best_idx]
        has_vn = jnp.sum(jnp.abs(vn0), -1) > 0.0
        b1v, b2v = bary
        ns_t = ((1.0 - b1v - b2v)[:, None] * vn0
                + b1v[:, None] * vn1 + b2v[:, None] * vn2)
        ns_t = normalize(ns_t)
        use_vn = (best_kind == SHAPE_TRIANGLE) & has_vn
        flip_n = jnp.where(jnp.sum(ns_t * n, -1) < 0.0, -1.0, 1.0)
        n = jnp.where(use_vn[:, None], n * flip_n[:, None], n)
        ns = jnp.where(use_vn[:, None], ns_t, ns)

    return Hit(
        valid=valid,
        t=jnp.where(valid, best_t, t_max),
        p=p,
        n=n,
        material=material,
        medium_inside=medium_inside,
        medium_outside=medium_outside,
        area_light=area_light,
        prim_kind=best_kind,
        prim_index=best_idx,
        uv=uv,
        tangent=tangent,
        ns=ns,
    )


def intersect_p(scene: Scene, o: jnp.ndarray, d: jnp.ndarray, t_max) -> jnp.ndarray:
    """Any-hit (shadow) query, ignoring boundary-only surfaces with no
    material (pbrt treats null-BSDF interface surfaces as invisible for
    visibility via IntersectTr; plain IntersectP counts them, but our shadow
    rays must pass through medium boundaries as the reference's VisibilityTester
    with media does — see scene.cpp:63-92 IntersectTr)."""
    R = o.shape[0]
    t_min = jnp.full((R,), jnp.float32(1e-4))
    occluded = jnp.zeros((R,), bool)

    def any_over_chunks(hit_fn, N):
        if N <= _PRIM_CHUNK:
            return jnp.any(hit_fn(0, N), axis=1)
        n_chunks = -(-N // _PRIM_CHUNK)

        def body(acc, ci):
            return acc | jnp.any(hit_fn(ci * _PRIM_CHUNK, _PRIM_CHUNK), 1), None

        acc, _ = jax.lax.scan(body, jnp.zeros((R,), bool), jnp.arange(n_chunks))
        return acc

    if scene.n_spheres > 0:
        Ns = scene.n_spheres
        c_p = _pad_prims(scene.spheres.center, Ns)
        r_p = _pad_prims_zero(scene.spheres.radius, Ns)
        m_p = _pad_prims_zero((scene.spheres.material >= 0), Ns)

        def sphere_hits(lo, size):
            sl = lambda x: jax.lax.dynamic_slice_in_dim(x, lo, size, 0)
            ts = ray_sphere(o, d, sl(c_p), sl(r_p), t_min, t_max)
            return (ts < _BIG) & sl(m_p)[None, :]

        occluded |= any_over_chunks(sphere_hits, Ns)
    if scene.n_triangles > 0:
        Nt = scene.n_triangles
        if _use_tri_bvh(scene):
            t_any, _ = _tri_bvh_traverse(scene, o, d, t_min, t_max,
                                         any_hit=True)
            occluded |= t_any < _BIG
        else:
            p0_p, p1_p, p2_p = (_pad_prims(x, Nt) for x in
                                (scene.triangles.p0, scene.triangles.p1,
                                 scene.triangles.p2))
            m_p = _pad_prims_zero((scene.triangles.material >= 0), Nt)

            def tri_hits(lo, size):
                sl = lambda x: jax.lax.dynamic_slice_in_dim(x, lo, size, 0)
                ts = ray_triangle(o, d, sl(p0_p), sl(p1_p), sl(p2_p),
                                  t_min, t_max)
                return (ts < _BIG) & sl(m_p)[None, :]

            occluded |= any_over_chunks(tri_hits, Nt)
    return occluded


def hit_dpduv(scene: Scene, h: Hit):
    """Surface partial derivatives (dp/du, dp/dv) at hit points, for ray-
    differential texture footprints (SurfaceInteraction::ComputeDifferentials,
    interaction.cpp:~150-200 consumes these; shapes define them in
    sphere.cpp:~150 and triangle.cpp:~190).

    Sphere (uv = phi/2pi, theta/pi): dpdu = 2pi(-l_y, l_x, 0),
    dpdv = pi(l_z cos phi, l_z sin phi, -r sin theta) with l = p - center.
    Triangle (uv = barycentric b1, b2): dpdu = p1 - p0, dpdv = p2 - p0.
    Returns (dpdu (R,3), dpdv (R,3)).
    """
    R = h.p.shape[0]
    dpdu = jnp.zeros((R, 3))
    dpdv = jnp.zeros((R, 3))
    if scene.n_spheres > 0:
        c = scene.spheres.center[h.prim_index]
        r = scene.spheres.radius[h.prim_index]
        l = h.p - c
        du = 2.0 * jnp.pi * jnp.stack(
            [-l[:, 1], l[:, 0], jnp.zeros((R,))], -1)
        zr = jnp.sqrt(jnp.maximum(l[:, 0] ** 2 + l[:, 1] ** 2, 1e-12))
        cos_phi = l[:, 0] / zr
        sin_phi = l[:, 1] / zr
        dv = jnp.pi * jnp.stack(
            [l[:, 2] * cos_phi, l[:, 2] * sin_phi, -zr], -1)
        is_s = (h.prim_kind == SHAPE_SPHERE)[:, None]
        dpdu = jnp.where(is_s, du, dpdu)
        dpdv = jnp.where(is_s, dv, dpdv)
    if scene.n_triangles > 0:
        ii = h.prim_index
        du = scene.triangles.p1[ii] - scene.triangles.p0[ii]
        dv = scene.triangles.p2[ii] - scene.triangles.p0[ii]
        is_t = (h.prim_kind == SHAPE_TRIANGLE)[:, None]
        dpdu = jnp.where(is_t, du, dpdu)
        dpdv = jnp.where(is_t, dv, dpdv)
    return dpdu, dpdv


def compute_uv_differentials(scene: Scene, h: Hit, o, d, rx_o, rx_d, ry_o, ry_d):
    """SurfaceInteraction::ComputeDifferentials (interaction.cpp:~150-200):
    intersect the two offset rays with the tangent plane at the hit and
    solve the least-squares 2x2 system dp = dpdu * du + dpdv * dv.

    Returns (duv_dx (R,2), duv_dy (R,2)); zero where the hit is invalid or
    the offset rays are parallel to the surface.
    """
    n = h.n
    pn = jnp.sum(h.p * n, -1)

    def plane_hit(oo, dd):
        dn = jnp.sum(dd * n, -1)
        tt = (pn - jnp.sum(oo * n, -1)) / jnp.where(jnp.abs(dn) < 1e-9, 1.0, dn)
        ok = jnp.abs(dn) >= 1e-9
        return oo + tt[:, None] * dd, ok

    px, okx = plane_hit(rx_o, rx_d)
    py, oky = plane_hit(ry_o, ry_d)
    dpdx = px - h.p
    dpdy = py - h.p
    dpdu, dpdv = hit_dpduv(scene, h)
    # normal-equation solve of [dpdu dpdv] [du dv]^T = dp
    a11 = jnp.sum(dpdu * dpdu, -1)
    a12 = jnp.sum(dpdu * dpdv, -1)
    a22 = jnp.sum(dpdv * dpdv, -1)
    det = a11 * a22 - a12 * a12
    ok = okx & oky & h.valid & (det > 1e-18)
    inv_det = 1.0 / jnp.where(ok, det, 1.0)

    def solve(dp):
        b1 = jnp.sum(dpdu * dp, -1)
        b2 = jnp.sum(dpdv * dp, -1)
        du = (a22 * b1 - a12 * b2) * inv_det
        dv = (a11 * b2 - a12 * b1) * inv_det
        return jnp.stack([du, dv], -1)

    duv_dx = jnp.where(ok[:, None], solve(dpdx), 0.0)
    duv_dy = jnp.where(ok[:, None], solve(dpdy), 0.0)
    return duv_dx, duv_dy
