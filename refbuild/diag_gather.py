"""Diagnostic: literal NumPy transliteration of the reference camera gather
(photonbeam.cpp:442-557, media-only path) run over OUR compat tracer's beams,
compared against (a) the reference pbrt render and (b) our compat render.

Usage: JAX_PLATFORMS=cpu python refbuild/diag_gather.py
"""
import numpy as np
import jax.numpy as jnp

from bre_tpu.scene.parser import parse_file
from bre_tpu.lights import light_power_distribution
from bre_tpu.integrators.photon_trace import trace_photon_beams_compat
from bre_tpu.scene.camera import generate_rays, pixel_centers
from bre_tpu.scene.intersect import intersect
from bre_tpu.core.rng import pcg32_init, pcg32_next_f32
from bre_tpu.io.image import read_image

ps = parse_file('examples/fog_cube.pbrt')
scene = ps.build()
W = H = 64
R = W * H

# --- beams: our compat tracer, iteration 0, radius 0.25 ---
ld = light_power_distribution(scene)
idx = jnp.arange(10000, dtype=jnp.uint32)
beams, stats = trace_photon_beams_compat(scene, ld, idx, 5, jnp.float32(0.25))
v = np.asarray(beams.valid)
b0 = np.asarray(beams.start)[v]
b1 = np.asarray(beams.end)[v]
pe = np.asarray(beams.power_end)[v]
brad = np.asarray(beams.radius)[v]
print(f"beams: {v.sum()}")

# --- camera segments: same jitter stream as camera_pass (iter 0) ---
pix = pixel_centers(W, H)
stream_ids = jnp.arange(R, dtype=jnp.uint32)
rng = pcg32_init(stream_ids)
rng, jx = pcg32_next_f32(rng)
rng, jy = pcg32_next_f32(rng)
jitter = jnp.stack([jx, jy], -1) - 0.5
o, d = generate_rays(ps.camera, pix + jitter)

# camera path: up to 3 segments (seg1 vacuum, seg2 fog, seg3 vacuum), with
# null-boundary hops, exactly the media-only reference walk
CUR_RADIUS = 0.25
Ld = np.zeros((R, 3), np.float32)

o_j, d_j = o, d
alive = np.ones((R,), bool)
GAMMA3 = 2.0 * 1.7881393e-7

blen = np.linalg.norm(b1 - b0, axis=-1)
bdir = (b1 - b0) / np.maximum(blen, 1e-30)[:, None]
# reference WorldBound quirk: SIGNED dir component (photonbeambvh.h:66-68)
half = 0.5 * np.abs(bdir * blen[:, None]
                    + 2 * brad[:, None] * np.sqrt(np.maximum(1 - bdir * bdir, 0)))
center = 0.5 * (b0 + b1)
bmin = center - half
bmax = center + half


def gather_one(o_np, d_np, tmax):
    """Literal reference gather for ONE camera segment (numpy, loops over
    beam array vectorized)."""
    # slab test (Bounds3f::IntersectP with ray.tMax)
    with np.errstate(divide='ignore', invalid='ignore'):
        inv = 1.0 / d_np
        tA = (bmin - o_np) * inv
        tB = (bmax - o_np) * inv
    t_lo = np.minimum(tA, tB)
    t_hi = np.maximum(tA, tB) * (1 + GAMMA3)
    # d==0 axes: pass iff origin inside slab (pbrt NaN quirk approximated)
    zero = np.abs(d_np) < 1e-20
    inside = (o_np >= bmin) & (o_np <= bmax)
    t_lo = np.where(zero, -1e30, t_lo)
    t_hi = np.where(zero, 1e30, t_hi)
    bad = zero & ~inside
    t0 = t_lo.max(-1)
    t1 = t_hi.min(-1)
    hit = (t0 <= t1) & (t0 < tmax) & (t1 > 0) & ~bad.any(-1)

    # ComputeClosestPoints (photonbeam.cpp:87-186), literal
    a0 = o_np
    a1 = o_np + tmax * d_np
    A = a1 - a0
    magA = np.linalg.norm(A)
    An = A / magA
    crs = np.cross(np.broadcast_to(An, bdir.shape), bdir)
    denom = (crs * crs).sum(-1)
    par = denom == 0.0
    t = b0 - a0
    detA = (t * np.cross(bdir, crs)).sum(-1)
    detB = (t * np.cross(np.broadcast_to(An, bdir.shape), crs)).sum(-1)
    dsafe = np.where(par, 1.0, denom)
    t0c = detA / dsafe
    t1c = detB / dsafe
    pA = a0 + An * t0c[:, None]
    pB = b0 + bdir * t1c[:, None]
    pA = np.where((t0c < 0)[:, None], a0, pA)
    pA = np.where((t0c > magA)[:, None], a1, pA)
    a_cl = (t0c < 0) | (t0c > magA)
    dot_b = np.clip((bdir * (pA - b0)).sum(-1), 0, blen)
    pB = np.where(a_cl[:, None], b0 + bdir * dot_b[:, None], pB)
    b_out = (t1c < 0) | (t1c > blen)
    dot_a = np.clip((An * (pB - a0)).sum(-1), 0, magA)
    pA = np.where(b_out[:, None], a0 + An * dot_a[:, None], pA)
    valid = ~par

    dist = np.linalg.norm(pA - pB, axis=-1)
    maxd = CUR_RADIUS + brad
    r = dist / maxd
    ok = hit & valid & (dist < maxd)
    w = 1e-5 * np.sqrt(np.maximum(1 - r * r, 0))
    return (ok[:, None] * w[:, None] * pe).sum(0)


# march the camera paths (media-only: break at first real surface)
o_cur = np.asarray(o_j)
d_cur = np.asarray(d_j)
for step in range(5):
    h = intersect(scene, jnp.asarray(o_cur), jnp.asarray(d_cur))
    hv = np.asarray(h.valid)
    ht = np.asarray(h.t)
    hmat = np.asarray(h.material)
    hn = np.asarray(h.n)
    hp = o_cur + ht[:, None] * d_cur
    live = alive & hv
    print(f"step {step}: live {live.sum()}")
    idxs = np.nonzero(live)[0]
    for i in idxs:
        Ld[i] += gather_one(o_cur[i], d_cur[i], ht[i])
    is_null = live & (hmat < 0)
    # continue only boundary hops (rendersurfaces=false)
    alive = is_null
    off = np.sign((d_cur * hn).sum(-1))[:, None] * hn * 1e-4
    o_cur = np.where(is_null[:, None], hp + off, o_cur)
    if not alive.any():
        break

img_lit = Ld.reshape(H, W, 3)
a = np.asarray(read_image('refbuild/out/fog1.pfm'))
b = np.asarray(read_image('refbuild/out/fog1_tpu.pfm'))
print('ref mean', a.mean((0, 1)))
print('ours mean', b.mean((0, 1)))
print('literal mean', img_lit.mean((0, 1)))
ra = a.reshape(8, 8, 8, 8, 3).mean(axis=(1, 3))[..., 0]
rb = b.reshape(8, 8, 8, 8, 3).mean(axis=(1, 3))[..., 0]
rl = img_lit.reshape(8, 8, 8, 8, 3).mean(axis=(1, 3))[..., 0]
print('literal/ref:')
print(np.round(rl / np.maximum(ra, 1e-6), 3))
print('ours/literal:')
print(np.round(rb / np.maximum(rl, 1e-6), 3))
