"""LBVH: Morton-sorted linear BVH built entirely under ``jit``.

Reference: /root/reference/src/core/photonbeambvh.{h,cpp} — conservative
radius-inflated beam AABBs (photonbeambvh.h:48-73), Morton encode + radix sort
(photonbeambvh.cpp:109-182), flattened 32-byte linear nodes (:97-106,
:663-682), stack traversal (:685-723).  Same role as pbrt's ``BVHAccel`` HLBVH
path (src/accelerators/bvh.cpp).

TPU-first design: the pointer-free build is Karras 2012 ("Maximally Parallel
Construction of Linear BVHs") — every internal node's child range is a pure
function of the sorted Morton codes, so the whole hierarchy materializes as
flat int32 arrays in O(N) vectorized ops (``jnp.argsort`` replaces the radix
sort; XLA's sort is already parallel).  Node AABBs come from a doubling
sparse table of prefix min/max over the sorted leaf boxes (each Karras node
covers a contiguous sorted-leaf range), avoiding the bottom-up atomic-flag
pass GPUs use.  Queries are **tile-based**: one traversal per camera-ray
tile (coherent pixels) collects candidate leaf ids into a fixed-capacity
buffer; the dense tile x candidate math then runs on the VPU (see
beam_gather).  Overflow is counted, never silent.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class LBVH(NamedTuple):
    """Flat LBVH over N primitives (N >= 1). Internal nodes 0..N-2; node i's
    children are encoded with leaf flag in the high bit."""

    # sorted primitive order
    prim_ids: jnp.ndarray  # (N,) int32 original primitive index per sorted leaf
    # internal node topology (Karras): children as (is_leaf, index)
    left_child: jnp.ndarray  # (N-1,) int32; >=0 internal idx, <0 -> leaf ~x
    right_child: jnp.ndarray  # (N-1,) int32
    # AABBs
    node_min: jnp.ndarray  # (N-1, 3) internal node bounds
    node_max: jnp.ndarray  # (N-1, 3)
    leaf_min: jnp.ndarray  # (N, 3) sorted leaf bounds
    leaf_max: jnp.ndarray  # (N, 3)

    @property
    def n_leaves(self) -> int:
        return self.prim_ids.shape[0]


def _expand_bits(v: jnp.ndarray) -> jnp.ndarray:
    """Spread 10 bits to every 3rd position (Morton; photonbeambvh.cpp's
    LeftShift3 equivalent / bvh.cpp:~190)."""
    v = jnp.asarray(v, jnp.uint32)
    v = (v * jnp.uint32(0x00010001)) & jnp.uint32(0xFF0000FF)
    v = (v * jnp.uint32(0x00000101)) & jnp.uint32(0x0F00F00F)
    v = (v * jnp.uint32(0x00000011)) & jnp.uint32(0xC30C30C3)
    v = (v * jnp.uint32(0x00000005)) & jnp.uint32(0x49249249)
    return v


def morton3(p01: jnp.ndarray) -> jnp.ndarray:
    """(N,3) in [0,1] -> 30-bit Morton codes (uint32)."""
    q = jnp.clip(p01 * 1024.0, 0.0, 1023.0).astype(jnp.uint32)
    return (
        (_expand_bits(q[..., 2]) << 2)
        | (_expand_bits(q[..., 1]) << 1)
        | _expand_bits(q[..., 0])
    )


def _popcount32(v: jnp.ndarray) -> jnp.ndarray:
    v = jnp.asarray(v, jnp.uint32)
    v = v - ((v >> 1) & jnp.uint32(0x55555555))
    v = (v & jnp.uint32(0x33333333)) + ((v >> 2) & jnp.uint32(0x33333333))
    v = (v + (v >> 4)) & jnp.uint32(0x0F0F0F0F)
    return ((v * jnp.uint32(0x01010101)) >> 24).astype(jnp.int32)


def _clz32(x: jnp.ndarray) -> jnp.ndarray:
    """Exact count-leading-zeros via bit smearing + popcount (float log2 is
    wrong above 2^24 in f32)."""
    v = jnp.asarray(x, jnp.uint32)
    v = v | (v >> 1)
    v = v | (v >> 2)
    v = v | (v >> 4)
    v = v | (v >> 8)
    v = v | (v >> 16)
    return 32 - _popcount32(v)


def _common_prefix(codes_aug: jnp.ndarray, i: jnp.ndarray, j: jnp.ndarray, n: int):
    """delta(i,j): common-prefix length of augmented 64-bit keys; -1 if j out
    of range (Karras sec. 4).  Keys are (morton << 32) | index to break ties.
    Implemented on uint32 pairs (no x64)."""
    valid = (j >= 0) & (j < n)
    j_c = jnp.clip(j, 0, n - 1)
    x_hi = codes_aug[0][i] ^ codes_aug[0][j_c]
    x_lo = codes_aug[1][i] ^ codes_aug[1][j_c]
    prefix = jnp.where(x_hi == 0, 32 + _clz32(x_lo), _clz32(x_hi))
    return jnp.where(valid, prefix, -1)


def build_lbvh(
    aabb_min: jnp.ndarray, aabb_max: jnp.ndarray, valid: jnp.ndarray
) -> LBVH:
    """Build from per-primitive AABBs (invalid prims get far-away boxes that
    never intersect queries).  Fully jittable; static N."""
    n = aabb_min.shape[0]
    big = jnp.float32(1e16)
    amin = jnp.where(valid[:, None], aabb_min, big)
    amax = jnp.where(valid[:, None], aabb_max, big)

    # scene bounds over valid prims
    any_valid = jnp.any(valid)
    smin = jnp.min(jnp.where(valid[:, None], aabb_min, jnp.inf), axis=0)
    smax = jnp.max(jnp.where(valid[:, None], aabb_max, -jnp.inf), axis=0)
    smin = jnp.where(any_valid, smin, 0.0)
    smax = jnp.where(any_valid, smax, 1.0)
    extent = jnp.maximum(smax - smin, 1e-12)

    centroid = 0.5 * (amin + amax)
    codes = morton3((centroid - smin) / extent)
    codes = jnp.where(valid, codes, jnp.uint32(0xFFFFFFFF))  # invalid at the end
    order = jnp.argsort(codes).astype(jnp.int32)
    sorted_codes = codes[order]
    # augmented keys break ties (Karras sec. 4): (code, index) as uint32 pair
    codes_aug = (sorted_codes, jnp.arange(n, dtype=jnp.uint32))

    leaf_min = amin[order]
    leaf_max = amax[order]

    if n == 1:
        return LBVH(
            prim_ids=order,
            left_child=jnp.zeros((0,), jnp.int32),
            right_child=jnp.zeros((0,), jnp.int32),
            node_min=jnp.zeros((0, 3)),
            node_max=jnp.zeros((0, 3)),
            leaf_min=leaf_min,
            leaf_max=leaf_max,
        )

    i = jnp.arange(n - 1, dtype=jnp.int32)
    d_plus = _common_prefix(codes_aug, i, i + 1, n)
    d_minus = _common_prefix(codes_aug, i, i - 1, n)
    d = jnp.where(d_plus > d_minus, 1, -1).astype(jnp.int32)
    delta_min = _common_prefix(codes_aug, i, i - d, n)

    # find range end via exponential + binary search (Karras fig. 4)
    def find_lmax(carry):
        lmax, cont = carry
        test = _common_prefix(codes_aug, i, i + lmax * d, n) > delta_min
        new_lmax = jnp.where(test & cont, lmax * 2, lmax)
        return new_lmax, cont & test

    lmax = jnp.full((n - 1,), 2, jnp.int32)
    cont = jnp.ones((n - 1,), bool)
    for _ in range(32):  # covers n up to 2^32
        lmax, cont = find_lmax((lmax, cont))

    l = jnp.zeros((n - 1,), jnp.int32)
    t = lmax // 2
    for _ in range(32):
        cand = l + t
        ok = _common_prefix(codes_aug, i, i + cand * d, n) > delta_min
        l = jnp.where((t > 0) & ok, cand, l)
        t = t // 2
    j = i + l * d  # other end of the range

    # find split position (binary search on prefix with delta_node)
    delta_node = _common_prefix(codes_aug, i, j, n)
    s = jnp.zeros((n - 1,), jnp.int32)
    t = (l + 1) // 2  # ceil(l/2) first step per Karras div=2
    # iterate t = ceil(l/2^k) for k = 1..30 until t==1 was processed
    # (k capped at 30 keeps 1<<k an int32; supports n < 2^30 primitives)
    for k in range(1, 31):
        cand = s + t
        ok = _common_prefix(codes_aug, i, i + cand * d, n) > delta_node
        s = jnp.where((t > 0) & ok, cand, s)
        shift = min(k + 1, 30)
        t = jnp.where(t > 1, (l + (1 << shift) - 1) >> shift, 0)
    # ensure at least one more check at t==1 (Karras does do-while with t>=1)
    gamma = i + s * d + jnp.minimum(d, 0)

    left_is_leaf = jnp.minimum(i, j) == gamma
    right_is_leaf = jnp.maximum(i, j) == gamma + 1
    left_child = jnp.where(left_is_leaf, ~gamma, gamma)
    right_child = jnp.where(right_is_leaf, ~(gamma + 1), gamma + 1)

    # node ranges: [min(i,j), max(i,j)] contiguous in sorted leaves.
    lo = jnp.minimum(i, j)
    hi = jnp.maximum(i, j)
    node_min, node_max = _range_minmax(leaf_min, leaf_max, lo, hi)

    return LBVH(
        prim_ids=order,
        left_child=left_child,
        right_child=right_child,
        node_min=node_min,
        node_max=node_max,
        leaf_min=leaf_min,
        leaf_max=leaf_max,
    )


def _range_minmax(leaf_min, leaf_max, lo, hi):
    """Range min/max of leaf AABBs over [lo, hi] via sparse tables (doubling).

    O(N log N) build, O(1) per query — replaces the GPU bottom-up refit.
    """
    n = leaf_min.shape[0]
    levels = max(1, (n - 1).bit_length())
    mins = [leaf_min]
    maxs = [leaf_max]
    for k in range(1, levels + 1):
        half = 1 << (k - 1)
        prev_min, prev_max = mins[-1], maxs[-1]
        idx = jnp.minimum(jnp.arange(n) + half, n - 1)
        mins.append(jnp.minimum(prev_min, prev_min[idx]))
        maxs.append(jnp.maximum(prev_max, prev_max[idx]))
    mins_t = jnp.stack(mins)  # (levels+1, N, 3)
    maxs_t = jnp.stack(maxs)
    span = hi - lo + 1
    # largest power-of-two block <= span: floor(log2(span)) = 31 - clz(span)
    k = 31 - _clz32(jnp.maximum(span, 1).astype(jnp.uint32))
    k = jnp.clip(k, 0, levels)
    second = jnp.clip(hi - (1 << k) + 1, 0, n - 1)
    node_min = jnp.minimum(mins_t[k, lo], mins_t[k, second])
    node_max = jnp.maximum(maxs_t[k, lo], maxs_t[k, second])
    return node_min, node_max


def query_aabb_collect(
    bvh: LBVH,
    q_min: jnp.ndarray,  # (Q,3) query box mins
    q_max: jnp.ndarray,  # (Q,3)
    max_candidates: int,
    max_stack: int = 64,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """For each query AABB, collect primitive ids of overlapping leaves.

    Returns (candidates (Q, K) int32 [-1 padded], counts (Q,), overflow (Q,)).
    Traversal: per-query explicit stack in a ``lax.while_loop`` (the
    reference's 64-deep local stack, photonbeambvh.cpp:693-722), vmapped over
    queries — lanes run in lockstep, masked when done.
    """
    n = bvh.n_leaves
    K = max_candidates

    if n == 1:
        # single leaf: test directly
        hit = jnp.all(q_max >= bvh.leaf_min[0]) & jnp.all(q_min <= bvh.leaf_max[0])
        # vectorize over Q
        hit = jnp.all(q_max >= bvh.leaf_min[0][None, :], -1) & jnp.all(
            q_min <= bvh.leaf_max[0][None, :], -1
        )
        cand = jnp.where(hit[:, None], bvh.prim_ids[0], -1).astype(jnp.int32)
        cand = jnp.concatenate(
            [cand, jnp.full((q_min.shape[0], K - 1), -1, jnp.int32)], axis=1
        )
        return cand, hit.astype(jnp.int32), jnp.zeros_like(hit, jnp.int32)

    def one_query(qmin, qmax):
        stack = jnp.zeros((max_stack,), jnp.int32)
        sp = jnp.int32(1)  # stack[0] = 0 (root)
        cand = jnp.full((K,), -1, jnp.int32)
        count = jnp.int32(0)
        overflow = jnp.int32(0)

        def overlaps_node(idx):
            return jnp.all(qmax >= bvh.node_min[idx]) & jnp.all(qmin <= bvh.node_max[idx])

        def overlaps_leaf(idx):
            return jnp.all(qmax >= bvh.leaf_min[idx]) & jnp.all(qmin <= bvh.leaf_max[idx])

        def body(carry):
            stack, sp, cand, count, overflow = carry
            sp = sp - 1
            node = stack[sp]

            def handle_child(child, stack, sp, cand, count, overflow):
                is_leaf = child < 0
                leaf_idx = jnp.where(is_leaf, ~child, 0)
                int_idx = jnp.where(is_leaf, 0, child)
                hit = jnp.where(is_leaf, overlaps_leaf(leaf_idx), overlaps_node(int_idx))
                # leaf hit -> append candidate
                add_leaf = hit & is_leaf
                can_add = count < K
                cand = jnp.where(
                    add_leaf & can_add,
                    cand.at[jnp.minimum(count, K - 1)].set(bvh.prim_ids[leaf_idx]),
                    cand,
                )
                count = count + jnp.where(add_leaf & can_add, 1, 0)
                overflow = overflow + jnp.where(add_leaf & ~can_add, 1, 0)
                # internal hit -> push
                push = hit & ~is_leaf
                can_push = sp < max_stack
                stack = jnp.where(
                    push & can_push, stack.at[jnp.minimum(sp, max_stack - 1)].set(child), stack
                )
                sp = sp + jnp.where(push & can_push, 1, 0)
                overflow = overflow + jnp.where(push & ~can_push, 1, 0)
                return stack, sp, cand, count, overflow

            stack, sp, cand, count, overflow = handle_child(
                bvh.left_child[node], stack, sp, cand, count, overflow
            )
            stack, sp, cand, count, overflow = handle_child(
                bvh.right_child[node], stack, sp, cand, count, overflow
            )
            return stack, sp, cand, count, overflow

        def cond(carry):
            return carry[1] > 0

        # root overlap check
        root_hit = overlaps_node(jnp.int32(0))
        sp = jnp.where(root_hit, sp, 0)
        stack, sp, cand, count, overflow = jax.lax.while_loop(
            cond, body, (stack, sp, cand, count, overflow)
        )
        return cand, count, overflow

    return jax.vmap(one_query)(q_min, q_max)
