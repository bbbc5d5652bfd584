"""The path-tracing megakernel: the full bounce loop fused into one Pallas
TPU kernel.

This is the TPU-native realization of the reference's single compute
megakernel (RayTracing/assets/shaders/RayTracing.shader:651-722 main/traceRay
and everything it calls).  The first TPU port expressed each bounce as XLA
ops around a Pallas intersection sweep; profiling showed >90% of frame time
went to XLA-side attribute gathers, texture sampling and per-bounce HBM
round-trips.  Here the entire sample — camera jitter, PCG RNG, sphere +
triangle nearest-hit sweeps, winner attribute fetch, scatter
(diffuse/specular/dielectric), emission accumulation — runs inside one
kernel per ray tile, with all per-ray state resident in VMEM/registers.

Design (see SURVEY.md §7 hard part #1):

  * rays live on the LANE axis: every per-ray quantity is a (1, R) row, so
    scatter/RNG/shading run at full vector width; triangles/spheres live on
    the SUBLANE axis in clusters of 128/8, so each pairwise intersection
    term is one broadcasted (128, R) VPU op;
  * per-cluster AABBs + the carried best-t give tile-uniform cluster
    culling (a `lax.cond` skips clusters no live ray can improve on) — the
    TPU-shaped stand-in for divergent per-ray BVH traversal; triangles are
    Morton-ordered at scene build so clusters are spatially tight;
  * the winning primitive's 32 shading attributes are fetched with a
    one-hot (T',R) matrix against the attribute table on the MXU —
    exact in f32 (precision=HIGHEST splits attrs into bf16 chunks whose
    one-hot products reconstruct losslessly) — replacing XLA gathers;
  * PCG RNG (ops/rng.py semantics) runs in-kernel on uint32 lanes,
    bit-exact with the reference's seed stream; the uint->float conversion
    keeps the top 24 bits (f32 mantissa), |err| <= 6e-8 vs the shader's
    float(seed)/UINT_MAX;
  * TPU Mosaic has no per-lane gather, so the two texture-map consumers are
    *deferred*: the kernel emits per-bounce records (emission-known terms ×
    material-albedo partial products, plus uv/texid) and per-sample miss
    records (direction + contribution), and a single XLA post-pass
    reconstructs  color = Σ_b E_b ⊙ Π_{k<b} A_k  exactly via a cumulative
    product over texture albedos, with ONE flattened-take gather per
    (ray, bounce) — textures/sky never enter VMEM.

Numerics: f32 (the reference's f64 triangle test needs shaderFloat64;
TPU has no fast f64 — tolerance study in tests/test_intersect.py).
atan2/asin don't lower in Mosaic, so sphere UVs are computed in the
post-pass from the recorded sphere normal.
"""
from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import RenderConfig
from ...models.camera import CameraSpec
from ...models.scene import TracerScene
from ..intersect import DET_EPS
from ..shade import OFFSET, env_radiance, sample_texture_quads

U32 = jnp.uint32
BIG = np.float32(1e30)          # in-kernel "miss" sentinel (< FLT_MAX to keep
                                # arithmetic finite)
# The v5e core has ~128MB of physical VMEM; Mosaic's DEFAULT scoped limit
# is 16MB, which rounds 3-4 mistook for the hardware ceiling (scenes
# beyond ~2k triangles "blew VMEM").  Measured round 5: a 120MB scratch
# compiles and runs with vmem_limit_bytes raised.  100MB leaves margin
# for the pipelining buffers of grid inputs/outputs.
VMEM_LIMIT_BYTES = 100 * 2 ** 20
CLUSTER = 128                   # triangles per cull cluster (sublane tiles)
DEFAULT_RAY_TILE = 512   # rays per grid step (lane axis; best measured tile)
PI = np.float32(np.pi)
TWO_PI = np.float32(2.0 * np.pi)
SEED_STRIDE = np.uint32(735529)                      # shader:697
U2F = np.float32(256.0 / 4294967295.0)               # (s>>8) -> [0,1]

# attribute-table rows (32 x T')
_A_NX, _A_NY, _A_NZ = 0, 1, 2
_A_ALR, _A_ALG, _A_ALB = 3, 4, 5
_A_EMR, _A_EMG, _A_EMB = 6, 7, 8
_A_EMP, _A_ROUGH, _A_METAL, _A_REFR, _A_TEX = 9, 10, 11, 12, 13
_A_LAX, _A_LAY, _A_LAZ = 14, 15, 16
_A_ABX, _A_ABY, _A_ABZ = 17, 18, 19
_A_ACX, _A_ACY, _A_ACZ = 20, 21, 22
_A_U0, _A_V0, _A_U1, _A_V1, _A_U2, _A_V2 = 23, 24, 25, 26, 27, 28
_A_GNX, _A_GNY, _A_GNZ, _A_GAN = 29, 30, 31, 32   # geometric n, dot(A,n):
NUM_ATTRS = 40                                     # exact-t recovery

# sphere-table columns (S' x 16): quadratic inputs + joined material
_S_CX, _S_CY, _S_CZ, _S_R = 0, 1, 2, 3
_S_ALR, _S_ALG, _S_ALB = 4, 5, 6
_S_EMR, _S_EMG, _S_EMB = 7, 8, 9
_S_EMP, _S_ROUGH, _S_METAL, _S_REFR, _S_TEX = 10, 11, 12, 13, 14

# triangle feature columns (T' x 16) — see ops/intersect.py factoring.
# (An MXU formulation of these determinants — each is linear in the ray
# 10-vector (o,d,w,1) — was tried and measured SLOWER: the contraction
# dim K=10 leaves 92% of the 128x128 systolic array idle, so the
# latency-bound matmuls lose to full-width VPU broadcasts.)
_F_NX, _F_NY, _F_NZ, _F_AN = 0, 1, 2, 3
_F_ABX, _F_ABY, _F_ABZ = 4, 5, 6
_F_ACX, _F_ACY, _F_ACZ = 7, 8, 9
_F_G1X, _F_G1Y, _F_G1Z = 10, 11, 12
_F_G2X, _F_G2Y, _F_G2Z = 13, 14, 15


# ---------------------------------------------------------------------------
# Scene packing
# ---------------------------------------------------------------------------

class MegaPack(NamedTuple):
    """Device-layout scene tables for the megakernel (all jnp arrays)."""

    tri_feats: jax.Array | None    # (T', 16) f32, cluster-padded
    tri_attrs: jax.Array | None    # (3, 40, T') bf16 Dekker 3-split of the
    #   f32 attribute table: attrs == split[0]+split[1]+split[2] to f32
    #   rounding, so the one-hot extraction is 3 native bf16 MXU passes
    #   instead of a 6-pass HIGHEST f32 matmul (the round-1 hot spot)
    boxes: jax.Array | None        # (C, 8) f32 cluster AABBs [lo3, hi3, 0, 0]
    spheres: jax.Array | None      # (S', 16) f32
    n_clusters: int
    n_spheres_padded: int
    # static cluster layout in the padded tables: per-cluster (row offset,
    # padded width).  Widths are 8-sublane multiples; variable when the
    # scene carries a SAH treelet cut (accel/clusters.py), uniform 128
    # otherwise.
    cluster_offsets: tuple = ()
    cluster_widths: tuple = ()
    # (T',) i32: padded-table row -> scene triangle id, -1 for padding —
    # lets the XLA side gather scene leaves from a kernel argmin index
    padded_to_real: jax.Array | None = None

    @property
    def n_padded_tris(self) -> int:
        return sum(self.cluster_widths)


def megakernel_fits(scene: TracerScene,
                    ray_tile: int = DEFAULT_RAY_TILE) -> bool:
    """VMEM feasibility of the megakernel for this scene.

    The kernel's VMEM residents scale with the padded triangle count T':
    the one-hot attribute-extraction operands ((T', r) bf16, double-
    buffered) dominate at ~4r B/tri, plus ~304 B/tri of feature/attr
    tables.  Anchored at a measured compile OOM: the 62.7k-triangle
    dragon grid used 143.96M of the v5e's 128M VMEM (est here: 147M).
    Callers fall back to wavefront2 (whose sweep streams triangle chunks
    through the grid) above the bound — a LOUD auto-fallback in
    render_dispatch, mirroring the trav/mxu table-limit contracts."""
    tp = int(scene.num_triangles * 1.06) + 128
    est = tp * (2 * 2 * ray_tile + 304)
    return est <= 115 * 2 ** 20


def build_mega_pack(scene: TracerScene) -> MegaPack:
    """Pack the flattened scene into megakernel tables.  Pure jnp — traced
    inside the render jit, so scene-parameter gradients are N/A here (the
    megakernel is the forward/production path; autodiff uses the XLA path).

    Clusters follow the scene's SAH treelet cut when present (tight,
    variable-width — the production acceleration structure), else fixed
    128-triangle slices of the stored order.
    """
    t = scene.num_triangles
    if t > 0:
        slices = scene.cluster_slices or tuple(
            (i * CLUSTER, min((i + 1) * CLUSTER, t))
            for i in range(-(-t // CLUSTER)))
        c_count = len(slices)

        a, b, c = scene.tri_wa, scene.tri_wb, scene.tri_wc     # (T,3)
        ab = b - a
        ac = c - a
        n = jnp.cross(ab, ac)
        an = jnp.sum(a * n, axis=-1)
        g1 = jnp.cross(ac, a)
        g2 = jnp.cross(ab, a)

        feats = jnp.stack([n[:, 0], n[:, 1], n[:, 2], an,
                           ab[:, 0], ab[:, 1], ab[:, 2],
                           ac[:, 0], ac[:, 1], ac[:, 2],
                           g1[:, 0], g1[:, 1], g1[:, 2],
                           g2[:, 0], g2[:, 1], g2[:, 2]], axis=1)  # (T,16)

        mats = scene.materials
        tm = scene.tri_mat
        alb = jnp.take(mats.albedo, tm, axis=0)
        emc = jnp.take(mats.emission_color, tm, axis=0)
        emp = jnp.take(mats.emission_power, tm)
        rough = jnp.take(mats.roughness, tm)
        metal = jnp.take(mats.metallic, tm)
        refr = jnp.take(mats.refraction_ratio, tm)
        texid = jnp.take(mats.texture_id, tm).astype(jnp.float32)

        la, lab, lac = scene.tri_la, scene.tri_lab, scene.tri_lac
        uv = scene.tri_uv                                        # (T,3,2)
        rows = [scene.tri_normal[:, 0], scene.tri_normal[:, 1],
                scene.tri_normal[:, 2],
                alb[:, 0], alb[:, 1], alb[:, 2],
                emc[:, 0], emc[:, 1], emc[:, 2],
                emp, rough, metal, refr, texid,
                la[:, 0], la[:, 1], la[:, 2],
                lab[:, 0], lab[:, 1], lab[:, 2],
                lac[:, 0], lac[:, 1], lac[:, 2],
                uv[:, 0, 0], uv[:, 0, 1], uv[:, 1, 0], uv[:, 1, 1],
                uv[:, 2, 0], uv[:, 2, 1],
                # geometric plane for exact-t recovery of the winner
                n[:, 0], n[:, 1], n[:, 2], an]
        rows += [jnp.zeros((t,), jnp.float32)] * (NUM_ATTRS - len(rows))
        attrs = jnp.stack(rows, axis=0)                          # (40, T)

        verts = jnp.stack([a, b, c], axis=1)                     # (T,3,3)
        vmin = verts.min(axis=1)
        vmax = verts.max(axis=1)

        # assemble padded cluster segments: width -> 8-sublane multiple;
        # padding triangles have n = 0 (det==0 fails the gate) and
        # texid = -1 so dead extractions read "no texture"
        offs, widths = [], []
        f_parts, a_parts, box_rows = [], [], []
        off = 0
        for lo, hi in slices:
            w_real = hi - lo
            w_pad = max(8, -(-w_real // 8) * 8)
            fseg = jnp.pad(feats[lo:hi], ((0, w_pad - w_real), (0, 0)))
            aseg = jnp.pad(attrs[:, lo:hi], ((0, 0), (0, w_pad - w_real)))
            if w_pad > w_real:
                aseg = aseg.at[_A_TEX, w_real:].set(-1.0)
            f_parts.append(fseg)
            a_parts.append(aseg)
            box_rows.append(jnp.concatenate(
                [vmin[lo:hi].min(axis=0), vmax[lo:hi].max(axis=0),
                 jnp.zeros((2,), jnp.float32)]))
            offs.append(off)
            widths.append(w_pad)
            off += w_pad
        feats = jnp.concatenate(f_parts, axis=0)                 # (T',16)
        attrs = jnp.concatenate(a_parts, axis=1)                 # (40,T')
        # Dekker 3-split: each bf16 chunk captures the next 8 mantissa
        # bits; the residual subtractions are exact, so the chunks sum
        # back to the f32 table (one-hot products are then exact per pass)
        a1 = attrs.astype(jnp.bfloat16)
        r1 = attrs - a1.astype(jnp.float32)
        a2 = r1.astype(jnp.bfloat16)
        a3 = (r1 - a2.astype(jnp.float32)).astype(jnp.bfloat16)
        attrs = jnp.stack([a1, a2, a3], axis=0)                  # (3,40,T')
        boxes = jnp.stack(box_rows, axis=0)                      # (C,8)
        offs, widths = tuple(offs), tuple(widths)
        p2r = np.full(sum(widths), -1, np.int32)
        for (lo, hi), off_ in zip(slices, offs):
            p2r[off_:off_ + (hi - lo)] = np.arange(lo, hi)
        p2r = jnp.asarray(p2r)
    else:
        feats = attrs = boxes = None
        c_count = 0
        offs = widths = ()
        p2r = None

    s = scene.num_spheres
    if s > 0:
        sp = max(8, -(-s // 8) * 8)
        mats = scene.materials
        sm = scene.sph_mat
        cols = [scene.sph_pos[:, 0], scene.sph_pos[:, 1], scene.sph_pos[:, 2],
                scene.sph_radius,
                jnp.take(mats.albedo, sm, axis=0)[:, 0],
                jnp.take(mats.albedo, sm, axis=0)[:, 1],
                jnp.take(mats.albedo, sm, axis=0)[:, 2],
                jnp.take(mats.emission_color, sm, axis=0)[:, 0],
                jnp.take(mats.emission_color, sm, axis=0)[:, 1],
                jnp.take(mats.emission_color, sm, axis=0)[:, 2],
                jnp.take(mats.emission_power, sm),
                jnp.take(mats.roughness, sm),
                jnp.take(mats.metallic, sm),
                jnp.take(mats.refraction_ratio, sm),
                jnp.take(mats.texture_id, sm).astype(jnp.float32),
                jnp.zeros((s,), jnp.float32)]
        sph = jnp.stack(cols, axis=1)                            # (S,16)
        sph = jnp.pad(sph, ((0, sp - s), (0, 0)))
        # padding spheres parked far away with r=0: can never be hit
        sph = sph.at[s:, _S_CX:_S_CZ + 1].set(BIG)
        sph = sph.at[s:, _S_TEX].set(-1.0)
    else:
        sph = None
        sp = 0

    return MegaPack(feats, attrs, boxes, sph, c_count, sp, offs, widths, p2r)


# ---------------------------------------------------------------------------
# Ray-slot ordering: 8x8 pixel blocks
# ---------------------------------------------------------------------------
# A row-major 512-ray tile is a full image row at the headline 512-wide
# config — rays fanning across the whole horizontal FOV, whose cluster-test
# UNION defeats the tile-uniform cull even for coherent camera rays.
# Dispatch slots therefore walk the frame in 8x8 pixel blocks (exactly the
# reference's compute workgroup, RayTracing.shader:13 / VulkanPipeline.cpp:
# 162-168): a 512-ray tile becomes an 8-block 64x8-pixel strip.

def use_block8(width: int, height: int) -> bool:
    return width % 8 == 0 and height % 8 == 0


def slot_to_xy(lin, width: int):
    """Dispatch slot -> pixel (x, y) under 8x8-block order (any int array)."""
    t = lin // 64
    j = lin % 64
    bx = t % (width // 8)
    by = t // (width // 8)
    return bx * 8 + j % 8, by * 8 + j // 8


def pixel_to_slot(p, width: int):
    """Row-major pixel id -> dispatch slot (inverse of slot_to_xy)."""
    x = p % width
    y = p // width
    return ((y // 8) * (width // 8) + x // 8) * 64 + (y % 8) * 8 + x % 8


def image_to_slots(img, width: int, height: int):
    """(H, W, C) row-major -> (W*H, C) slot order — exact inverse of
    slots_to_image (same reshape/transpose, no gather)."""
    c = img.shape[-1]
    v = img.reshape(height // 8, 8, width // 8, 8, c)
    return v.transpose(0, 2, 1, 3, 4).reshape(width * height, c)


def slots_to_image(color, width: int, height: int):
    """(W*H, C) slot-order -> (H, W, C) row-major as a pure layout op.

    The slot order is (block_y, block_x, y%8, x%8) row-major, so the inverse
    permutation is a reshape/transpose — NOT a take: a 262k-row take is a
    latency-bound gather (~4ms/frame at 512^2) while this lowers to an XLA
    transpose."""
    c = color.shape[-1]
    img = color.reshape(height // 8, width // 8, 8, 8, c)
    return img.transpose(0, 2, 1, 3, 4).reshape(height, width, c)


# ---------------------------------------------------------------------------
# In-kernel helpers (componentwise 3-vectors as (1,R) row tuples)
# ---------------------------------------------------------------------------

def _pcg(s):
    state = s * U32(747796405) + U32(2891336453)
    shift = (state >> U32(28)) + U32(4)
    word = ((state >> shift) ^ state) * U32(277803737)
    return (word >> U32(22)) ^ word


def _rand(s):
    """(uniform [0,1] f32, new_seed) — reference fastRandom (shader:130-134);
    uses top 24 bits (Mosaic has no u32->f32 cast), |err| <= 6e-8."""
    s = _pcg(s)
    return (s >> U32(8)).astype(jnp.int32).astype(jnp.float32) * U2F, s


def _dot(ax, ay, az, bx, by, bz):
    return ax * bx + ay * by + az * bz


def _cross(ax, ay, az, bx, by, bz):
    return (ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx)


def _normalize(x, y, z):
    inv = jax.lax.rsqrt(jnp.maximum(x * x + y * y + z * z, 1e-20))
    return x * inv, y * inv, z * inv


def _select(m, a, b):
    return jnp.where(m, a, b)


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------

def _safe_inv_dirs(dx, dy, dz):
    """NaN-safe slab reciprocals: clamp |d| away from 0 (sign-preserving).
    d==0 would give inf, and (lo-o)*inf = NaN when o sits exactly on the
    bound, which the min/max chain resolves to a FALSE cull (missed
    intersection).  With the clamp, |d|<eps rays see (+/-)huge slab
    bounds: inside the box -> pass, outside -> empty — exactly the true
    d==0 limit."""
    eps = jnp.float32(1e-12)
    dxs = _select(jnp.abs(dx) < eps, _select(dx >= 0.0, eps, -eps), dx)
    dys = _select(jnp.abs(dy) < eps, _select(dy >= 0.0, eps, -eps), dy)
    dzs = _select(jnp.abs(dz) < eps, _select(dz >= 0.0, eps, -eps), dz)
    return 1.0 / dxs, 1.0 / dys, 1.0 / dzs


def _slab_near(lox, loy, loz, hix, hiy, hiz, ox, oy, oz,
               inv_dx, inv_dy, inv_dz):
    """Per-ray conservative entry distance to an AABB ((1,R) f32, BIG on
    miss) — the cull test of the reference's bvhTraverse hitBox
    (RayTracing.shader:305-322) vectorized over the lane axis."""
    t1x = (lox - ox) * inv_dx
    t2x = (hix - ox) * inv_dx
    t1y = (loy - oy) * inv_dy
    t2y = (hiy - oy) * inv_dy
    t1z = (loz - oz) * inv_dz
    t2z = (hiz - oz) * inv_dz
    tn = jnp.maximum(
        jnp.maximum(jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)),
        jnp.minimum(t1z, t2z))
    tf = jnp.minimum(
        jnp.minimum(jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)),
        jnp.maximum(t1z, t2z))
    return _select((tf >= 0.0) & (tn <= tf), tn, BIG)


def _tri_sweep(feats, boxes, offsets, widths, ray_tile,
               ox, oy, oz, dx, dy, dz, wx, wy, wz, alive, cull,
               t_ref, i_ref, npass_ref=None):
    """Nearest-triangle sweep over variable-width SAH clusters.

    All lanes visit a cluster together; a tile-uniform AABB test skips
    clusters no live ray can improve on (the TPU-shaped stand-in for the
    reference's per-thread BVH traversal, shader:324-484).

    Writes the running best into VMEM scratch refs — t_ref (1,R) f32
    approx-ordering distance, i_ref (1,R) i32 padded-table index — and the
    skip is a `pl.when` REGION around the stores.  A value-carried
    `lax.cond` looks equivalent but Mosaic lowers vector-carried conds by
    predication (both branches execute), which silently disabled the cull:
    measured cull-on == cull-off == always-pass at the headline config.
    With refs + pl.when the branch is real scalar control flow.

    npass_ref: optional (1,1) i32 SMEM scratch incremented per cluster
    pass — the cull-effectiveness probe (debug heatmaps / tests).
    Shared by the megakernel and the wavefront bounce kernels.
    """
    r = ray_tile
    t_ref[:, :] = jnp.full((1, r), BIG)
    i_ref[:, :] = jnp.full((1, r), -1, jnp.int32)
    if npass_ref is not None:
        npass_ref[0, 0] = 0
    if cull:
        inv_dx, inv_dy, inv_dz = _safe_inv_dirs(dx, dy, dz)

    def cluster_pass(off, wdt):
        lane = slice(off, off + wdt)
        f = lambda j: feats[lane, j:j + 1]                    # (W,1)
        det = -(dx * f(_F_NX) + dy * f(_F_NY) + dz * f(_F_NZ))
        tdet = (ox * f(_F_NX) + oy * f(_F_NY)
                + oz * f(_F_NZ)) - f(_F_AN)
        udet = (wx * f(_F_ACX) + wy * f(_F_ACY) + wz * f(_F_ACZ)) \
            - (dx * f(_F_G1X) + dy * f(_F_G1Y) + dz * f(_F_G1Z))
        vdet = (dx * f(_F_G2X) + dy * f(_F_G2Y) + dz * f(_F_G2Z)) \
            - (wx * f(_F_ABX) + wy * f(_F_ABY) + wz * f(_F_ABZ))
        wdet = det - udet - vdet
        # validity as one min-chain: det > eps and all other dets >= 0
        # (shader:301-303 gates)
        m = jnp.minimum(jnp.minimum(det - DET_EPS, tdet),
                        jnp.minimum(jnp.minimum(udet, vdet), wdet))
        valid = m >= 0.0
        # approximate reciprocal is ordering-only: the winner's exact t
        # is recovered from its plane equation after extraction
        ta = tdet * pl.reciprocal(jnp.maximum(det, DET_EPS), approx=True)
        tt = _select(valid, ta, BIG)                          # (W,R)
        crow = jax.lax.broadcasted_iota(jnp.int32, (wdt, r), 0)
        cmin = jnp.min(tt, axis=0, keepdims=True)
        cand = jnp.min(_select(tt == cmin, crow, jnp.int32(2 ** 30)),
                       axis=0, keepdims=True)
        t_prev = t_ref[:, :]
        better = cmin < t_prev
        t_ref[:, :] = _select(better, cmin, t_prev)
        i_ref[:, :] = _select(better, cand + off, i_ref[:, :])
        if npass_ref is not None:
            npass_ref[0, 0] += 1

    for ci, (off, wdt) in enumerate(zip(offsets, widths)):
        if cull:
            near = _slab_near(boxes[ci, 0], boxes[ci, 1], boxes[ci, 2],
                              boxes[ci, 3], boxes[ci, 4], boxes[ci, 5],
                              ox, oy, oz, inv_dx, inv_dy, inv_dz)
            improves = jnp.any((near < t_ref[:, :]) & alive)

            @pl.when(improves)
            def _(off=off, wdt=wdt):
                cluster_pass(off, wdt)
        else:
            cluster_pass(off, wdt)


KEY_LANES = 128        # ordered sweep: cluster-key row width (max clusters)


def _tri_sweep_ordered(feats, boxes, meta, offsets, widths, ray_tile,
                       ox, oy, oz, dx, dy, dz, wx, wy, wz, alive,
                       t_ref, i_ref, keys_ref, npass_ref=None):
    """Nearest-first culled cluster sweep (the production traversal order).

    The static-order sweep (_tri_sweep) visits clusters in table order, so
    the carried best-t is still BIG when the early clusters are tested and
    they all pass (measured 68% cluster pass rate at the headline config).
    The reference's per-thread BVH traversal wins precisely by visiting
    children *near-to-far* with t-pruning (RayTracing.shader:438-479).
    This is that idea at cluster granularity, tile-uniformly:

      1. per bounce, compute every cluster's per-ray slab entry distance
         and reduce it to a tile key = min over live rays (BIG when no
         live ray enters the box);
      2. a fori_loop pops the smallest-key cluster (argmin over the keys
         row in VMEM scratch), recomputes its near row, and sweeps it only
         if some live ray could still improve on the carried best-t;
      3. since best-t only shrinks and near rows are fixed, a cluster that
         fails the improves test once can never pass later — popping is a
         permanent discard, and after the nearest hits are found the
         remaining (far) clusters all fail in a few vector ops each.

    feats rows are indexed dynamically (pl.ds) with the popped cluster's
    offset read from the SMEM meta table (C,2)=[row offset, padded width];
    one static branch per DISTINCT padded width keeps the dynamic slice
    size static.  Numerics are identical to _tri_sweep (same slab test,
    same approx-reciprocal ordering).
    """
    r = ray_tile
    n_c = len(offsets)
    assert n_c <= KEY_LANES
    t_ref[:, :] = jnp.full((1, r), BIG)
    i_ref[:, :] = jnp.full((1, r), -1, jnp.int32)
    if npass_ref is not None:
        npass_ref[0, 0] = 0
    inv_dx, inv_dy, inv_dz = _safe_inv_dirs(dx, dy, dz)
    ciota = jax.lax.broadcasted_iota(jnp.int32, (1, KEY_LANES), 1)

    keys_row = jnp.full((1, KEY_LANES), BIG)
    for ci in range(n_c):
        near = _slab_near(boxes[ci, 0], boxes[ci, 1], boxes[ci, 2],
                          boxes[ci, 3], boxes[ci, 4], boxes[ci, 5],
                          ox, oy, oz, inv_dx, inv_dy, inv_dz)
        key = jnp.min(jnp.where(alive, near, BIG))
        keys_row = jnp.where(ciota == ci, key, keys_row)
    keys_ref[:, :] = keys_row

    def cluster_pass(off, wdt):
        """off: dynamic scalar i32 row offset; wdt: static padded width."""
        lane = pl.ds(off, wdt)
        fseg = feats[lane, :]                                 # (W,16)
        f = lambda j: fseg[:, j:j + 1]                        # (W,1)
        det = -(dx * f(_F_NX) + dy * f(_F_NY) + dz * f(_F_NZ))
        tdet = (ox * f(_F_NX) + oy * f(_F_NY)
                + oz * f(_F_NZ)) - f(_F_AN)
        udet = (wx * f(_F_ACX) + wy * f(_F_ACY) + wz * f(_F_ACZ)) \
            - (dx * f(_F_G1X) + dy * f(_F_G1Y) + dz * f(_F_G1Z))
        vdet = (dx * f(_F_G2X) + dy * f(_F_G2Y) + dz * f(_F_G2Z)) \
            - (wx * f(_F_ABX) + wy * f(_F_ABY) + wz * f(_F_ABZ))
        wdet = det - udet - vdet
        m = jnp.minimum(jnp.minimum(det - DET_EPS, tdet),
                        jnp.minimum(jnp.minimum(udet, vdet), wdet))
        valid = m >= 0.0
        ta = tdet * pl.reciprocal(jnp.maximum(det, DET_EPS), approx=True)
        tt = _select(valid, ta, BIG)                          # (W,R)
        crow = jax.lax.broadcasted_iota(jnp.int32, (wdt, r), 0)
        cmin = jnp.min(tt, axis=0, keepdims=True)
        cand = jnp.min(_select(tt == cmin, crow, jnp.int32(2 ** 30)),
                       axis=0, keepdims=True)
        t_prev = t_ref[:, :]
        better = cmin < t_prev
        t_ref[:, :] = _select(better, cmin, t_prev)
        i_ref[:, :] = _select(better, cand + off, i_ref[:, :])
        if npass_ref is not None:
            npass_ref[0, 0] += 1

    width_set = tuple(sorted(set(widths)))

    def pop(rank, _):
        keys = keys_ref[:, :]
        kmin = jnp.min(keys)

        @pl.when(kmin < BIG)
        def _():
            cidx = jnp.min(jnp.where(keys == kmin, ciota,
                                     jnp.int32(KEY_LANES)))
            keys_ref[:, :] = jnp.where(ciota == cidx, BIG, keys)
            near = _slab_near(
                boxes[cidx, 0], boxes[cidx, 1], boxes[cidx, 2],
                boxes[cidx, 3], boxes[cidx, 4], boxes[cidx, 5],
                ox, oy, oz, inv_dx, inv_dy, inv_dz)
            improves = jnp.any((near < t_ref[:, :]) & alive)

            @pl.when(improves)
            def _():
                off = meta[cidx, 0]
                cw = meta[cidx, 1]
                for w in width_set:
                    @pl.when(cw == w)
                    def _(w=w):
                        cluster_pass(off, w)
        return 0

    jax.lax.fori_loop(0, n_c, pop, 0)


def _make_kernel(*, ray_tile, cluster_offsets, cluster_widths, n_sph,
                 max_bounces, max_frames, textured, cull, width, height,
                 order="near", probe=""):
    """Returns the kernel fn closed over all static configuration.

    probe: perf-triage builds (scripts/kernel_probe.py) — "" production;
    "noextract" zeroes the one-hot attribute fetch (sweep kept live);
    "noshade" replaces the scatter with a mirror bounce (no RNG draws);
    "nosweep" skips the triangle sweep (extraction still runs on -1).
    """
    r = ray_tile
    have_tris = len(cluster_widths) > 0
    tp_total = sum(cluster_widths)
    have_sph = n_sph > 0
    ordered = (cull and order == "near" and have_tris
               and len(cluster_widths) <= KEY_LANES)

    def kernel(*refs):
        it = iter(refs)
        camf = next(it)                       # (1,64) f32 SMEM
        fidx = next(it)                       # (1,1)  u32 SMEM
        pix0 = next(it)                       # (1,1)  i32 SMEM: first pixel
                                              # id of this dispatch (sharded
                                              # row bands pass rank*band)
        feats = next(it) if have_tris else None
        attrs = next(it) if have_tris else None
        boxes = next(it) if have_tris else None
        meta = next(it) if ordered else None  # (C,2) i32 SMEM [off, width]
        sph = next(it) if have_sph else None
        color_ref = next(it)                  # (8, R)
        miss_ref = next(it)                   # (8*max_frames, R)
        rec_ref = next(it) if textured else None  # (8*F*B, R)
        t_scr = next(it) if have_tris else None   # (1, R) f32 sweep scratch
        i_scr = next(it) if have_tris else None   # (1, R) i32
        keys_scr = next(it) if ordered else None  # (1, KEY_LANES) f32

        if textured:
            # pre-fill the record block: bounces skipped by the all-dead
            # early-exit cond never store, and the post-pass needs their
            # S-terms to be zero and their texid to read "no texture" (-1 —
            # a zeroed texid would alias texture 0 and poison the
            # albedo product)
            rec_ref[:, :] = jnp.zeros((8 * max_frames * max_bounces, r),
                                      jnp.float32)
            for fb in range(max_frames * max_bounces):
                rec_ref[fb * 8 + 6:fb * 8 + 7, :] = jnp.full(
                    (1, r), -1.0, jnp.float32)

        # camera scalars (host packs: invP(16), invV(16), pos(3), focusDist,
        # defocus, blur) — column-major 4x4: m[i,j] at base + j*4 + i
        def P(i, j):
            return camf[0, j * 4 + i]

        def V(i, j):
            return camf[0, 16 + j * 4 + i]

        posx, posy, posz = camf[0, 32], camf[0, 33], camf[0, 34]
        focus_d, defocus, blur = camf[0, 35], camf[0, 36], camf[0, 37]
        wf, hf = np.float32(width), np.float32(height)
        frame_index = fidx[0, 0]

        # pixel ids for this tile (8x8-block slot order when aligned)
        base = pl.program_id(0) * r + pix0[0, 0]
        lin = jax.lax.broadcasted_iota(jnp.int32, (1, r), 1) + base
        if use_block8(width, height):
            xpix, ypix = slot_to_xy(lin, width)
        else:
            xpix = lin % width
            ypix = lin // width
        # seeds use the ROW-MAJOR pixel id (shader:697 parity)
        lin_u = (ypix * width + xpix).astype(U32)

        # camera ray basis (shader:684-691): per-pixel focus point
        px = xpix.astype(jnp.float32) / wf
        py = ypix.astype(jnp.float32) / hf
        nx = 2.0 * px - 1.0
        ny = 2.0 * py - 1.0
        cx = P(0, 0) * nx + P(0, 1) * ny + P(0, 2) + P(0, 3)
        cy = P(1, 0) * nx + P(1, 1) * ny + P(1, 2) + P(1, 3)
        cz = P(2, 0) * nx + P(2, 1) * ny + P(2, 2) + P(2, 3)
        cw = P(3, 0) * nx + P(3, 1) * ny + P(3, 2) + P(3, 3)
        inv_w = 1.0 / cw
        cx, cy, cz = cx * inv_w, cy * inv_w, cz * inv_w
        dx0 = (V(0, 0) * cx + V(0, 1) * cy + V(0, 2) * cz) * focus_d
        dy0 = (V(1, 0) * cx + V(1, 1) * cy + V(1, 2) * cz) * focus_d
        dz0 = (V(2, 0) * cx + V(2, 1) * cy + V(2, 2) * cz) * focus_d
        fpx, fpy, fpz = posx + dx0, posy + dy0, posz + dz0
        rtx, rty, rtz = V(0, 0), V(1, 0), V(2, 0)      # camera right
        upx, upy, upz = V(0, 1), V(1, 1), V(2, 1)      # camera up

        col_r = jnp.zeros((1, r), jnp.float32)
        col_g = jnp.zeros((1, r), jnp.float32)
        col_b = jnp.zeros((1, r), jnp.float32)

        if have_tris:
            tri_rows = jax.lax.broadcasted_iota(jnp.int32, (tp_total, r), 0)
        if have_sph:
            srow = jax.lax.broadcasted_iota(jnp.int32, (n_sph, r), 0)

        for frame in range(1, max_frames + 1):
            # seed schedule (shader:697)
            seed = lin_u + U32(frame) * frame_index * SEED_STRIDE
            # focus jitter (defocus) + deviation jitter (blur), shader:699-706
            r1, seed = _rand(seed)
            ang = r1 * TWO_PI
            r2, seed = _rand(seed)
            rad = jnp.sqrt(r2)
            fjx = jnp.cos(ang) * rad / wf * defocus
            fjy = jnp.sin(ang) * rad / hf * defocus
            r3, seed = _rand(seed)
            ang2 = r3 * TWO_PI
            r4, seed = _rand(seed)
            rad2 = jnp.sqrt(r4)
            djx = jnp.cos(ang2) * rad2 / wf * blur
            djy = jnp.sin(ang2) * rad2 / hf * blur

            ox = posx + fjx * rtx + fjy * upx
            oy = posy + fjx * rty + fjy * upy
            oz = posz + fjx * rtz + fjy * upz
            tx = fpx + djx * rtx + djy * upx
            ty = fpy + djx * rty + djy * upy
            tz = fpz + djx * rtz + djy * upz
            dx, dy, dz = _normalize(tx - ox, ty - oy, tz - oz)

            ctr_r = jnp.ones((1, r), jnp.float32)   # material-albedo partial
            ctr_g = jnp.ones((1, r), jnp.float32)   # product ("P^m")
            ctr_b = jnp.ones((1, r), jnp.float32)
            alive = jnp.ones((1, r), jnp.bool_)
            m_dx = jnp.zeros((1, r), jnp.float32)
            m_dy = jnp.zeros((1, r), jnp.float32)
            m_dz = jnp.zeros((1, r), jnp.float32)
            m_cr = jnp.zeros((1, r), jnp.float32)
            m_cg = jnp.zeros((1, r), jnp.float32)
            m_cb = jnp.zeros((1, r), jnp.float32)

            carry = (ox, oy, oz, dx, dy, dz, seed, ctr_r, ctr_g, ctr_b,
                     alive, m_dx, m_dy, m_dz, m_cr, m_cg, m_cb,
                     col_r, col_g, col_b)

            for b in range(max_bounces):
                def bounce_body(carry, b=b, frame=frame):
                    (ox, oy, oz, dx, dy, dz, seed, ctr_r, ctr_g, ctr_b,
                     alive, m_dx, m_dy, m_dz, m_cr, m_cg, m_cb,
                     col_r, col_g, col_b) = carry
                    seed = seed + U32(b)                       # shader:659

                    # ---- nearest triangle: SAH-cluster sweep -------------
                    wx, wy, wz = _cross(ox, oy, oz, dx, dy, dz)
                    t_tri = jnp.full((1, r), BIG)
                    i_tri = jnp.full((1, r), -1, jnp.int32)
                    if have_tris and probe != "nosweep":
                        if ordered:
                            _tri_sweep_ordered(
                                feats, boxes, meta, cluster_offsets,
                                cluster_widths, r, ox, oy, oz, dx, dy, dz,
                                wx, wy, wz, alive, t_scr, i_scr, keys_scr)
                        else:
                            _tri_sweep(
                                feats, boxes, cluster_offsets,
                                cluster_widths, r, ox, oy, oz, dx, dy, dz,
                                wx, wy, wz, alive, cull, t_scr, i_scr)
                        t_tri = t_scr[:, :]
                        i_tri = i_scr[:, :]

                    # ---- nearest sphere (shader:486-524) -----------------
                    t_sph = jnp.full((1, r), BIG)
                    if have_sph:
                        g = lambda j: sph[:, j:j + 1]            # (S',1)
                        ocx = ox - g(_S_CX)
                        ocy = oy - g(_S_CY)
                        ocz = oz - g(_S_CZ)
                        a_q = dx * dx + dy * dy + dz * dz
                        b_q = 2.0 * (ocx * dx + ocy * dy + ocz * dz)
                        c_q = (ocx * ocx + ocy * ocy + ocz * ocz
                               - g(_S_R) * g(_S_R))
                        delta = b_q * b_q - 4.0 * a_q * c_q
                        okd = delta >= 0.0
                        tq = (-b_q - jnp.sqrt(_select(okd, delta, 0.0))) \
                            / (2.0 * a_q)
                        ok = okd & (tq >= 0.0)
                        ts = _select(ok, tq, BIG)                # (S',R)
                        t_sph = jnp.min(ts, axis=0, keepdims=True)
                        scand = jnp.min(
                            _select(ts == t_sph, srow, jnp.int32(2 ** 30)),
                            axis=0, keepdims=True)
                        s_onehot = (srow == scand) & (t_sph < BIG)

                    # sphere wins ties (reference checks triangles with
                    # strict < after spheres)
                    use_tri = t_tri < t_sph
                    t_hit = _select(use_tri, t_tri, t_sph)
                    hit = t_hit < BIG

                    # ---- attribute fetch ---------------------------------
                    if have_tris and probe == "noextract":
                        # keep the sweep live: fold its outputs into t_hit
                        zero = jnp.zeros((1, r), jnp.float32)
                        e = lambda j: zero + 1e-7 * i_tri.astype(jnp.float32)
                    elif have_tris:
                        onehot = ((tri_rows == i_tri) & use_tri & alive
                                  ).astype(jnp.bfloat16)         # (T',R)
                        # 3 native bf16 passes reconstruct the exact f32
                        # attribute (Dekker split in build_mega_pack)
                        ext = (jnp.dot(attrs[0], onehot,
                                       preferred_element_type=jnp.float32)
                               + jnp.dot(attrs[1], onehot,
                                         preferred_element_type=jnp.float32)
                               + jnp.dot(attrs[2], onehot,
                                         preferred_element_type=jnp.float32))
                        e = lambda j: ext[j:j + 1, :]            # (1,R)
                        # exact hit distance of the winner from its plane
                        # equation (the sweep's t was approx-reciprocal,
                        # ordering-only)
                        gden = -(dx * e(_A_GNX) + dy * e(_A_GNY)
                                 + dz * e(_A_GNZ))
                        t_ex = (ox * e(_A_GNX) + oy * e(_A_GNY)
                                + oz * e(_A_GNZ) - e(_A_GAN)) \
                            / _select(gden == 0.0, jnp.float32(1.0), gden)
                        t_hit = _select(use_tri & alive, t_ex, t_hit)
                    else:
                        zero = jnp.zeros((1, r), jnp.float32)
                        e = lambda j: zero

                    t_safe = _select(hit, t_hit, 0.0)
                    hx = ox + t_safe * dx
                    hy = oy + t_safe * dy
                    hz = oz + t_safe * dz

                    if have_sph:
                        smask = (s_onehot & (~use_tri)).astype(jnp.float32)
                        sx = lambda j: jnp.sum(smask * g(j), axis=0,
                                               keepdims=True)    # (1,R)
                    else:
                        zero_s = jnp.zeros((1, r), jnp.float32)
                        sx = lambda j: zero_s

                    use_t = use_tri.astype(jnp.float32)
                    use_s = (hit & (~use_tri)).astype(jnp.float32)

                    # normal: triangle shader-normal / sphere (hit-c)/|.|
                    if have_sph:
                        scx, scy, scz = sx(_S_CX), sx(_S_CY), sx(_S_CZ)
                        snx, sny, snz = _normalize(hx - scx, hy - scy,
                                                   hz - scz)
                    else:
                        snx = sny = snz = jnp.zeros((1, r), jnp.float32)
                    nxh = e(_A_NX) * use_t + snx * use_s
                    nyh = e(_A_NY) * use_t + sny * use_s
                    nzh = e(_A_NZ) * use_t + snz * use_s

                    alr = e(_A_ALR) * use_t + sx(_S_ALR) * use_s
                    alg = e(_A_ALG) * use_t + sx(_S_ALG) * use_s
                    alb = e(_A_ALB) * use_t + sx(_S_ALB) * use_s
                    emr = e(_A_EMR) * use_t + sx(_S_EMR) * use_s
                    emg = e(_A_EMG) * use_t + sx(_S_EMG) * use_s
                    emb = e(_A_EMB) * use_t + sx(_S_EMB) * use_s
                    emp = e(_A_EMP) * use_t + sx(_S_EMP) * use_s
                    rough = e(_A_ROUGH) * use_t + sx(_S_ROUGH) * use_s
                    metal = e(_A_METAL) * use_t + sx(_S_METAL) * use_s
                    refr = e(_A_REFR) * use_t + sx(_S_REFR) * use_s
                    texid = (e(_A_TEX) * use_t + sx(_S_TEX) * use_s
                             + (-1.0) * (1.0 - use_t - use_s))

                    live = alive & hit
                    miss_now = alive & (~hit)

                    # first (and only) miss: record dir + P^m for sky
                    m_dx = _select(miss_now, dx, m_dx)
                    m_dy = _select(miss_now, dy, m_dy)
                    m_dz = _select(miss_now, dz, m_dz)
                    m_cr = _select(miss_now, ctr_r, m_cr)
                    m_cg = _select(miss_now, ctr_g, m_cg)
                    m_cb = _select(miss_now, ctr_b, m_cb)

                    if textured:
                        has_tex = (texid > -0.5) & live
                        livef = live.astype(jnp.float32)
                        htf = has_tex.astype(jnp.float32)
                        # S_b = P^m ⊙ (tex ? emp : emc*emp)  (shader:575-585)
                        s_r = ctr_r * _select(has_tex, emp, emr * emp) * livef
                        s_g = ctr_g * _select(has_tex, emp, emg * emp) * livef
                        s_b_ = ctr_b * _select(has_tex, emp, emb * emp) * livef
                        # uv: tri -> reference's space-mixed barycentrics
                        # (shader:257-268); sphere -> normal (uv in post)
                        aox = ox - e(_A_LAX)
                        aoy = oy - e(_A_LAY)
                        aoz = oz - e(_A_LAZ)
                        dax, day, daz = _cross(aox, aoy, aoz, dx, dy, dz)
                        nvx, nvy, nvz = _cross(
                            e(_A_ABX), e(_A_ABY), e(_A_ABZ),
                            e(_A_ACX), e(_A_ACY), e(_A_ACZ))
                        detl = -(dx * nvx + dy * nvy + dz * nvz)
                        invl = 1.0 / _select(detl == 0.0, jnp.float32(1.0),
                                             detl)
                        ub = (e(_A_ACX) * dax + e(_A_ACY) * day
                              + e(_A_ACZ) * daz) * invl
                        vb = -(e(_A_ABX) * dax + e(_A_ABY) * day
                               + e(_A_ABZ) * daz) * invl
                        wb = 1.0 - ub - vb
                        uu = (e(_A_U0) * wb + e(_A_U1) * ub + e(_A_U2) * vb)
                        vv = (e(_A_V0) * wb + e(_A_V1) * ub + e(_A_V2) * vb)
                        # record (a,b,c): tri (u,v,0) / sphere normal
                        ra = uu * use_t + snx * use_s
                        rb = vv * use_t + sny * use_s
                        rc = snz * use_s
                        row = ((frame - 1) * max_bounces + b) * 8
                        rec_ref[row + 0:row + 1, :] = s_r
                        rec_ref[row + 1:row + 2, :] = s_g
                        rec_ref[row + 2:row + 3, :] = s_b_
                        rec_ref[row + 3:row + 4, :] = ra
                        rec_ref[row + 4:row + 5, :] = rb
                        rec_ref[row + 5:row + 6, :] = rc
                        rec_ref[row + 6:row + 7, :] = _select(
                            has_tex, texid, jnp.float32(-1.0))
                        rec_ref[row + 7:row + 8, :] = use_s * htf
                        # P^m *= (tex ? 1 : albedo)
                        keep = 1.0 - livef * (1.0 - htf)
                        ctr_r = ctr_r * (keep + livef * (1.0 - htf) * alr)
                        ctr_g = ctr_g * (keep + livef * (1.0 - htf) * alg)
                        ctr_b = ctr_b * (keep + livef * (1.0 - htf) * alb)
                    else:
                        livef = live.astype(jnp.float32)
                        col_r = col_r + emr * emp * ctr_r * livef
                        col_g = col_g + emg * emp * ctr_g * livef
                        col_b = col_b + emb * emp * ctr_b * livef
                        ctr_r = ctr_r * (1.0 - livef + livef * alr)
                        ctr_g = ctr_g * (1.0 - livef + livef * alg)
                        ctr_b = ctr_b * (1.0 - livef + livef * alb)

                    # ---- scatter (shader:590-649) ------------------------
                    if probe == "noshade":
                        # perf-triage: mirror bounce, no RNG draws
                        ddnp = _dot(dx, dy, dz, nxh, nyh, nzh)
                        ox = _select(live, hx + nxh * OFFSET, ox)
                        oy = _select(live, hy + nyh * OFFSET, oy)
                        oz = _select(live, hz + nzh * OFFSET, oz)
                        dx = _select(live, dx - 2.0 * ddnp * nxh, dx)
                        dy = _select(live, dy - 2.0 * ddnp * nyh, dy)
                        dz = _select(live, dz - 2.0 * ddnp * nzh, dz)
                        alive = live
                        return (ox, oy, oz, dx, dy, dz, seed,
                                ctr_r, ctr_g, ctr_b, alive,
                                m_dx, m_dy, m_dz, m_cr, m_cg, m_cb,
                                col_r, col_g, col_b)
                    d_dot_n = _dot(dx, dy, dz, nxh, nyh, nzh)
                    is_refract = refr > 1.0
                    is_front = d_dot_n < 0.0
                    rt = _select(is_front,
                                 1.0 / _select(refr == 0.0,
                                               jnp.float32(1.0), refr),
                                 refr)
                    hnx = _select(is_front, nxh, -nxh)
                    hny = _select(is_front, nyh, -nyh)
                    hnz = _select(is_front, nzh, -nzh)
                    cos_t = jnp.minimum(-_dot(dx, dy, dz, hnx, hny, hnz),
                                        1.0)
                    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t,
                                                 1e-12))
                    cannot = rt * sin_t > 1.0
                    r0 = ((1.0 - rt) / (1.0 + rt)) ** 2
                    omc = 1.0 - cos_t
                    r0p = r0 + (1.0 - r0) * omc * omc * omc * omc * omc
                    rr, seed_refr = _rand(seed)
                    do_refl = cannot | (r0p > rr)
                    # reflect(d, hn)
                    ddh = _dot(dx, dy, dz, hnx, hny, hnz)
                    rfx = dx - 2.0 * ddh * hnx
                    rfy = dy - 2.0 * ddh * hny
                    rfz = dz - 2.0 * ddh * hnz
                    # refract(d, hn, rt) with TIR -> 0
                    kk = 1.0 - rt * rt * (1.0 - ddh * ddh)
                    sq = jnp.sqrt(jnp.maximum(kk, 1e-12))
                    rxx = rt * dx - (rt * ddh + sq) * hnx
                    rxy = rt * dy - (rt * ddh + sq) * hny
                    rxz = rt * dz - (rt * ddh + sq) * hnz
                    okk = kk >= 0.0
                    rxx = _select(okk, rxx, 0.0)
                    rxy = _select(okk, rxy, 0.0)
                    rxz = _select(okk, rxz, 0.0)
                    o_rx = _select(do_refl, hx + hnx * OFFSET,
                                   hx - hnx * OFFSET)
                    o_ry = _select(do_refl, hy + hny * OFFSET,
                                   hy - hny * OFFSET)
                    o_rz = _select(do_refl, hz + hnz * OFFSET,
                                   hz - hnz * OFFSET)
                    d_rx = _select(do_refl, rfx, rxx)
                    d_ry = _select(do_refl, rfy, rxy)
                    d_rz = _select(do_refl, rfz, rxz)

                    # diffuse/specular branch (6 draws)
                    u1, s1 = _rand(seed)
                    u2, s2 = _rand(s1)
                    u3, s3 = _rand(s2)
                    ddx, ddy, ddz = _normalize(nxh + 2.0 * u1 - 1.0,
                                               nyh + 2.0 * u2 - 1.0,
                                               nzh + 2.0 * u3 - 1.0)
                    u4, s4 = _rand(s3)
                    u5, s5 = _rand(s4)
                    u6, s6 = _rand(s5)
                    ddn2 = _dot(dx, dy, dz, nxh, nyh, nzh)
                    sp_x = dx - 2.0 * ddn2 * nxh + (2.0 * u4 - 1.0) * (1.0 - metal)
                    sp_y = dy - 2.0 * ddn2 * nyh + (2.0 * u5 - 1.0) * (1.0 - metal)
                    sp_z = dz - 2.0 * ddn2 * nzh + (2.0 * u6 - 1.0) * (1.0 - metal)
                    spx, spy, spz = _normalize(sp_x, sp_y, sp_z)
                    dfx, dfy, dfz = _normalize(ddx * (1.0 - rough) + spx * rough,
                                               ddy * (1.0 - rough) + spy * rough,
                                               ddz * (1.0 - rough) + spz * rough)

                    n_ox = _select(is_refract, o_rx, hx + nxh * OFFSET)
                    n_oy = _select(is_refract, o_ry, hy + nyh * OFFSET)
                    n_oz = _select(is_refract, o_rz, hz + nzh * OFFSET)
                    n_dx = _select(is_refract, d_rx, dfx)
                    n_dy = _select(is_refract, d_ry, dfy)
                    n_dz = _select(is_refract, d_rz, dfz)
                    n_seed = _select(is_refract, seed_refr, s6)

                    ox = _select(live, n_ox, ox)
                    oy = _select(live, n_oy, oy)
                    oz = _select(live, n_oz, oz)
                    dx = _select(live, n_dx, dx)
                    dy = _select(live, n_dy, dy)
                    dz = _select(live, n_dz, dz)
                    seed = jnp.where(live, n_seed, seed)
                    alive = live
                    return (ox, oy, oz, dx, dy, dz, seed,
                            ctr_r, ctr_g, ctr_b, alive,
                            m_dx, m_dy, m_dz, m_cr, m_cg, m_cb,
                            col_r, col_g, col_b)

                # (an early_exit flag — tile-uniform skip once every
                # lane terminated — shipped dead/default-False for three
                # rounds: Mosaic miscompiles a cond over this 20-value
                # carry, and the per-lane retirement that actually works
                # lives in the round-4 trav/mxu kernels.  Deleted per
                # VERDICT r3 task 6.)
                carry = bounce_body(carry)

            (ox, oy, oz, dx, dy, dz, seed, ctr_r, ctr_g, ctr_b, alive,
             m_dx, m_dy, m_dz, m_cr, m_cg, m_cb,
             col_r, col_g, col_b) = carry

            frow = (frame - 1) * 8
            miss_ref[frow + 0:frow + 1, :] = m_dx
            miss_ref[frow + 1:frow + 2, :] = m_dy
            miss_ref[frow + 2:frow + 3, :] = m_dz
            miss_ref[frow + 3:frow + 4, :] = m_cr
            miss_ref[frow + 4:frow + 5, :] = m_cg
            miss_ref[frow + 5:frow + 6, :] = m_cb
            miss_ref[frow + 6:frow + 7, :] = (
                (m_dx * m_dx + m_dy * m_dy + m_dz * m_dz) > 0.0
            ).astype(jnp.float32)
            miss_ref[frow + 7:frow + 8, :] = jnp.zeros((1, r), jnp.float32)

        color_ref[0:1, :] = col_r
        color_ref[1:2, :] = col_g
        color_ref[2:3, :] = col_b
        for j in range(3, 8):
            color_ref[j:j + 1, :] = jnp.zeros((1, r), jnp.float32)

    return kernel


# ---------------------------------------------------------------------------
# Host-side driver: pallas_call + XLA post-pass
# ---------------------------------------------------------------------------

def _pack_camera(cam: CameraSpec):
    """Pack camera scalars into the (1,64) SMEM block — matrices stored
    column-major (kernel reads m[i,j] at j*4+i)."""
    camf = jnp.zeros((1, 64), jnp.float32)
    camf = camf.at[0, 0:16].set(jnp.asarray(cam.inv_projection).T.reshape(-1))
    camf = camf.at[0, 16:32].set(jnp.asarray(cam.inv_view).T.reshape(-1))
    camf = camf.at[0, 32:35].set(cam.position)
    camf = camf.at[0, 35].set(cam.focus_distance)
    camf = camf.at[0, 36].set(cam.defocus_strength)
    camf = camf.at[0, 37].set(cam.blur_strength)
    return camf


def render_megakernel(scene: TracerScene, cam: CameraSpec, frame_index,
                      cfg: RenderConfig, ray_tile: int = DEFAULT_RAY_TILE,
                      cull: bool = True, interpret: bool = False,
                      order: str = "static"):
    """Full-frame forward dispatch through the megakernel.

    Returns (H, W, 3) f32 radiance averaged over cfg.max_frames samples —
    same contract as ops.trace_ref.render_dispatch.  Forward-only (the
    autodiff path uses the XLA renderer).

    order defaults to "static": the round-3 A/B (scripts/order_ab.py,
    512^2x8 on chip) measured near-512 148.4 ms vs static-512 146.0 —
    the in-kernel pop-argmin buys nothing because tile-uniform culling is
    saturated regardless (census, scripts/census_schemes.py), settling
    the round-2 near-vs-static contradiction.
    """
    color = render_rays_megakernel(
        scene, cam, frame_index, cfg, pixel_offset=jnp.int32(0),
        n_rays=cfg.width * cfg.height, ray_tile=ray_tile, cull=cull,
        interpret=interpret, order=order)
    if use_block8(cfg.width, cfg.height):
        return slots_to_image(color, cfg.width, cfg.height)
    return color.reshape(cfg.height, cfg.width, 3)


def render_rays_megakernel(scene: TracerScene, cam: CameraSpec, frame_index,
                           cfg: RenderConfig, pixel_offset, n_rays: int,
                           ray_tile: int = DEFAULT_RAY_TILE,
                           cull: bool = True, interpret: bool = False,
                           skip_postpass: bool = False,
                           order: str = "static", probe: str = ""):
    """Trace dispatch slots [pixel_offset, pixel_offset + n_rays) of the
    cfg.width x cfg.height grid — the unit the multi-chip sharded renderer
    dispatches per device band (parallel/sharding.py).  Returns (n_rays, 3)
    in SLOT order: slots walk the frame in 8x8 pixel blocks when both
    dimensions are 8-aligned (slot_to_xy), else row-major; full-frame
    callers invert with pixel_to_slot.
    """
    w, h = cfg.width, cfg.height
    n = n_rays
    r = ray_tile
    n_pad = -(-n // r) * r
    n_tiles = n_pad // r
    bounces = cfg.max_bounces
    frames = cfg.max_frames
    textured = scene.any_textured

    pack = build_mega_pack(scene)
    camf = _pack_camera(cam)
    fidx = jnp.asarray(frame_index, jnp.uint32).reshape(1, 1)

    const = lambda i: (0, 0)
    in_specs = [
        pl.BlockSpec((1, 64), const, memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1), const, memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1), const, memory_space=pltpu.SMEM),
    ]
    pix0 = jnp.asarray(pixel_offset, jnp.int32).reshape(1, 1)
    inputs = [camf, fidx, pix0]
    ordered = (cull and order == "near" and pack.n_clusters > 0
               and pack.n_clusters <= KEY_LANES)
    if pack.n_clusters > 0:
        tp = pack.n_padded_tris
        in_specs += [
            pl.BlockSpec((tp, 16), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((3, NUM_ATTRS, tp), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((pack.n_clusters, 8), const,
                         memory_space=pltpu.SMEM),
        ]
        inputs += [pack.tri_feats, pack.tri_attrs, pack.boxes]
        if ordered:
            in_specs.append(pl.BlockSpec((pack.n_clusters, 2), const,
                                         memory_space=pltpu.SMEM))
            inputs.append(jnp.asarray(
                np.stack([pack.cluster_offsets, pack.cluster_widths],
                         axis=1), jnp.int32))
    if pack.n_spheres_padded > 0:
        in_specs.append(pl.BlockSpec((pack.n_spheres_padded, 16), const,
                                     memory_space=pltpu.VMEM))
        inputs.append(pack.spheres)

    out_shape = [jax.ShapeDtypeStruct((8, n_pad), jnp.float32),
                 jax.ShapeDtypeStruct((8 * frames, n_pad), jnp.float32)]
    out_specs = [pl.BlockSpec((8, r), lambda i: (0, i),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec((8 * frames, r), lambda i: (0, i),
                              memory_space=pltpu.VMEM)]
    if textured:
        out_shape.append(jax.ShapeDtypeStruct(
            (8 * frames * bounces, n_pad), jnp.float32))
        out_specs.append(pl.BlockSpec((8 * frames * bounces, r),
                                      lambda i: (0, i),
                                      memory_space=pltpu.VMEM))

    kernel = _make_kernel(
        ray_tile=r, cluster_offsets=pack.cluster_offsets,
        cluster_widths=pack.cluster_widths,
        n_sph=pack.n_spheres_padded, max_bounces=bounces,
        max_frames=frames, textured=textured, cull=cull,
        width=w, height=h, order=order, probe=probe)

    try:
        cparams = pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=VMEM_LIMIT_BYTES)
    except TypeError:                                   # older jax
        cparams = None

    scratch = []
    if pack.n_clusters > 0:
        scratch = [pltpu.VMEM((1, r), jnp.float32),
                   pltpu.VMEM((1, r), jnp.int32)]
        if ordered:
            scratch.append(pltpu.VMEM((1, KEY_LANES), jnp.float32))

    outs = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=scratch,
        interpret=interpret,
        **({"compiler_params": cparams} if cparams else {}),
    )(*inputs)

    if textured:
        main, miss, rec = outs
    else:
        main, miss = outs
        rec = None

    color = main[0:3, :n].T                              # (N,3)
    if skip_postpass:
        # perf-triage probe: raw in-kernel radiance, texture/sky
        # reconstruction skipped (scripts/postpass_breakdown.py).  The
        # epsilon terms keep miss/rec consumed: fully-dead pallas outputs
        # have been seen to get scoped-VMEM allocations (OOM at 512^2)
        extra = jnp.sum(miss[:1, :1])
        if rec is not None:
            extra = extra + jnp.sum(rec[:1, :1])
        return color + extra * jnp.float32(1e-30)
    return mega_postpass(color, miss, rec, scene, cfg, n)


def mega_postpass(color, miss, rec, scene: TracerScene, cfg: RenderConfig,
                  n: int):
    """The XLA texture/sky reconstruction over the kernel's deferred
    records.  Routes textured scenes to the round-5 compacted form
    (mega_postpass_compact) — ~2.4x cheaper on the headline frame — with
    an in-graph fallback to the dense form when a frame's significant
    record count exceeds the compact capacity.  `RTM_DENSE_POSTPASS=1`
    forces the dense form (A/B and debugging)."""
    if (scene.any_textured and cfg.max_bounces > 1
            and not os.environ.get("RTM_DENSE_POSTPASS")):
        return mega_postpass_compact(color, miss, rec, scene, cfg, n)
    return mega_postpass_dense(color, miss, rec, scene, cfg, n)


def mega_postpass_dense(color, miss, rec, scene: TracerScene,
                        cfg: RenderConfig, n: int):
    """The original dense reconstruction: one texture tap per
    (ray, bounce) slot — B*N gather rows of which only the textured
    fraction (11% on the headline scene) are real (module-level so
    scripts can profile/tune it in isolation)."""
    frames = cfg.max_frames
    bounces = cfg.max_bounces
    textured = scene.any_textured
    draw_env = jnp.float32(1.0 if cfg.draw_environment else 0.0)

    for f in range(frames):
        if textured:
            # Phase 1: per-bounce uv/id prep (elementwise) -> ONE stacked
            # (B, N) texture tap.  The tap is latency-bound on random table
            # rows; batching all bounces into a single take lets the
            # gather pipeline every bounce's requests together instead of
            # draining per bounce.
            uus, vvs, tids, texs = [], [], [], []
            for b in range(bounces):
                row = (f * bounces + b) * 8
                ra = rec[row + 3, :n]
                rb = rec[row + 4, :n]
                rc = rec[row + 5, :n]
                texid = rec[row + 6, :n]
                sflag = rec[row + 7, :n]
                has_tex = texid > -0.5
                if int(scene.sph_pos.shape[0]) == 0:
                    # no spheres in the scene (static shape info): the
                    # sphere-normal -> equirect branch can never fire, so
                    # skip its arctan2/arcsin over all B*N lanes
                    uu, vv = ra, rb
                else:
                    # sphere lanes: (ra,rb,rc) is the unit normal ->
                    # equirect uv
                    uu = jnp.where(
                        sflag > 0.5,
                        jnp.arctan2(rc, ra) / TWO_PI + 0.5, ra)
                    vv = jnp.where(
                        sflag > 0.5,
                        jnp.arcsin(jnp.clip(rb, -1.0 + 1e-6, 1.0 - 1e-6))
                        / PI + 0.5, rb)
                # untextured lanes: collapse the tap onto row 0
                uus.append(jnp.where(has_tex, uu, 0.0))
                vvs.append(jnp.where(has_tex, vv, 0.0))
                tids.append(jnp.where(has_tex, texid.astype(jnp.int32), 0))
                texs.append(has_tex)
            tex_all = sample_texture_quads(
                scene.tex_quads, scene.tex_size,
                scene.textures.shape[1], scene.textures.shape[2],
                jnp.stack(tids), jnp.stack(uus), jnp.stack(vvs))  # (B,N,3)

            # Phase 2: emission/albedo chain (shader:575-586 semantics)
            pt = jnp.ones((n, 3), jnp.float32)           # Π texture albedos
            for b in range(bounces):
                row = (f * bounces + b) * 8
                s_term = rec[row:row + 3, :n].T          # (N,3)
                has_tex = texs[b]
                tex_rgb = tex_all[b]
                t_alb = jnp.where(has_tex[:, None], tex_rgb, 1.0)
                term = s_term * pt
                color = color + jnp.where(has_tex[:, None],
                                          term * tex_rgb, term)
                pt = pt * t_alb
        frow = f * 8
        mdir = miss[frow:frow + 3, :n].T
        mctr = miss[frow + 3:frow + 6, :n].T
        mmask = miss[frow + 6, :n] > 0.5
        mdir = jnp.where(mmask[:, None], mdir,
                         jnp.array([1.0, 0.0, 0.0], jnp.float32))
        sky_rgb = env_radiance(scene, mdir)
        sky_term = mctr * sky_rgb * draw_env
        if textured:
            sky_term = sky_term * pt
        color = color + jnp.where(mmask[:, None], sky_term, 0.0)

    color = color / jnp.float32(frames)                  # shader:711
    return color


def _seg_scan8(first, v3, bounces: int, op: str):
    """Segmented inclusive Hillis-Steele scan of (L, 3) values, op
    'add' or 'mul'.

    `first` marks segment starts; segments are <= `bounces` elements long
    (one per recorded bounce of one ray), so ceil(log2(bounces)) masked
    shift steps complete the scan — 3 elementwise passes for the 8-bounce
    headline instead of an 18-level associative_scan over the whole axis.
    Within-segment combination is tree-ordered (vs the dense form's
    sequential bounce order): <= bounces terms, ulp-level difference.
    """
    ident = np.float32(0.0 if op == "add" else 1.0)
    stop = first
    d = 1
    while d < bounces:
        # element j-d's running values, identity-filled for j < d
        sh_v = jnp.concatenate(
            [jnp.full((d, 3), ident, v3.dtype), v3[:-d]])
        sh_f = jnp.concatenate([jnp.ones((d,), jnp.bool_), stop[:-d]])
        keep = jnp.where(stop[:, None], ident, sh_v)
        v3 = v3 + keep if op == "add" else v3 * keep
        stop = stop | sh_f
        d *= 2
    return v3


def mega_postpass_compact(color, miss, rec, scene: TracerScene,
                          cfg: RenderConfig, n: int, cap: int | None = None):
    """Compacted texture/sky reconstruction (round 5, VERDICT r4 task 1).

    The dense post-pass pays one latency-bound gather row per
    (ray, bounce) slot — B*N taps, ~89% of them dead on the headline
    frame (untextured slots collapse onto row 0 but still cost the
    ~10 ns/row gather-engine issue slot).  This form taps only the REAL
    records:

      1. a SIGNIFICANT mask per slot — textured (needs a texel) or
         emissive (contributes s_term * pt) — built elementwise;
      2. ONE single-operand `lax.sort` of the ray-major slot ids with a
         "not significant" high bit: the first cap sorted keys ARE the
         compact slot list, grouped by ray with bounces ascending
         (the r4 gather matrix priced sort-compaction as break-even only
         because it scattered results back to (B, N) at ~24 ms — this
         form never scatters; ~3.4 ms fused in-frame);
      3. one gather of the packed 8-field records at those slots, one
         texture tap per compact slot (sample_texture_quads), and the
         emission/albedo chain of shader:575-586 evaluated IN COMPACT
         ORDER with a segmented scan (_seg_scan8): per-ray texture-color
         sum and albedo product land on each segment's last element;
      4. per-ray results read back with ONE n-row gather at
         start[r] + cnt[r] - 1 (cnt/start are a dense reduce + cumsum) —
         no scatter anywhere.

    Capacity: `cap` = n slots (1 significant record per ray on average;
    headline frame runs ~13% slot occupancy).  A frame whose n_sig
    exceeds cap falls back to the dense form via `lax.cond`, so the
    result is always exact — both branches are compiled, neither is
    silent.  Everything is shared by the megakernel/trav/mxu drivers
    (they emit the same record layout).

    Reference semantics unchanged: RayTracing.shader:575-586 (albedo
    chain), :663-666 (sky at miss).  Cost on the headline frame
    (scripts/postpass_compact_probe.py, POSTPASS_r05.json): the 2^21-key
    sort + 3 compact gathers replace 2.1M dense taps.
    """
    frames = cfg.max_frames
    bounces = cfg.max_bounces
    assert scene.any_textured
    draw_env = jnp.float32(1.0 if cfg.draw_environment else 0.0)
    nb = n * bounces
    bits = max(int(np.ceil(np.log2(max(nb, 2)))), 1)
    assert bits <= 30, "slot id + sentinel bit must fit i32"
    if cap is None:
        cap = n
    have_sph = int(scene.sph_pos.shape[0]) > 0

    for f in range(frames):
        rblk = rec[f * bounces * 8:(f + 1) * bounces * 8, :n]
        rt = rblk.reshape(bounces, 8, n)
        texid_b = rt[:, 6]                                # (B, n)
        s_abs = jnp.abs(rt[:, 0]) + jnp.abs(rt[:, 1]) + jnp.abs(rt[:, 2])
        sig = (texid_b > -0.5) | (s_abs > 0.0)            # (B, n)

        sig_rays = sig.T                                  # (n, B)
        cnt = jnp.sum(sig_rays.astype(jnp.int32), axis=1)     # (n,)
        start = jnp.cumsum(cnt) - cnt
        n_sig = start[-1] + cnt[-1]

        def compact_branch(rt=rt, sig_rays=sig_rays, cnt=cnt, start=start,
                           color=color):
            slot = jnp.arange(nb, dtype=jnp.int32)
            key = slot | jnp.where(sig_rays.reshape(-1), 0,
                                   jnp.int32(1) << bits)
            # Compaction primitive: single-operand lax.sort, sliced.
            # lax.top_k(-key, cap) computes the same thing and its
            # STANDALONE micro reads 4x faster (3.5 vs 13.7 ms,
            # POSTPASS_r05.json) — but that number is a DCE illusion
            # (only element 0 was consumed); consuming all cap elements
            # in-frame, sort wins the back-to-back headline bench 39.0
            # vs 40.9 ms.  RTM_COMPACT_PRIM=topk keeps the top_k form
            # for A/B.
            if os.environ.get("RTM_COMPACT_PRIM") == "topk":
                skey = -jax.lax.top_k(-key, cap)[0]
            else:
                skey = jax.lax.sort(key, is_stable=False)[:cap]
            valid = skey < (jnp.int32(1) << bits)
            perm = skey & ((jnp.int32(1) << bits) - 1)

            rec_t = rt.transpose(2, 0, 1).reshape(nb, 8)
            crec = jnp.take(rec_t, perm, axis=0)          # (cap, 8)
            sterm = crec[:, 0:3]
            ra, rb2, rc2 = crec[:, 3], crec[:, 4], crec[:, 5]
            texid_c = crec[:, 6]
            has_tex = (texid_c > -0.5) & valid
            if have_sph:
                sflag = crec[:, 7] > 0.5
                uu = jnp.where(sflag,
                               jnp.arctan2(rc2, ra) / TWO_PI + 0.5, ra)
                vv = jnp.where(
                    sflag,
                    jnp.arcsin(jnp.clip(rb2, -1.0 + 1e-6, 1.0 - 1e-6))
                    / PI + 0.5, rb2)
            else:
                uu, vv = ra, rb2
            uu = jnp.where(has_tex, uu, 0.0)
            vv = jnp.where(has_tex, vv, 0.0)
            tid = jnp.where(has_tex, texid_c.astype(jnp.int32), 0)
            tex_c = sample_texture_quads(
                scene.tex_quads, scene.tex_size,
                scene.textures.shape[1], scene.textures.shape[2],
                tid, uu, vv)                              # (cap, 3)

            htf = has_tex[:, None]
            f_c = jnp.where(htf, tex_c, 1.0)              # albedo factor
            # segment starts: first element, or a new ray id.  Invalid
            # tail slots carry contrib 0 / factor 1 — harmless wherever
            # their segments land (the end-gather below never points at
            # them: start/cnt index only the valid prefix).
            ray_c = perm // bounces
            first = jnp.concatenate(
                [jnp.ones((1,), jnp.bool_), ray_c[1:] != ray_c[:-1]])
            incl_p = _seg_scan8(first, f_c, bounces, "mul")
            # exclusive albedo product: previous element's inclusive,
            # reset to 1 at segment starts
            excl_p = jnp.where(
                first[:, None], 1.0,
                jnp.concatenate([jnp.ones((1, 3), jnp.float32),
                                 incl_p[:-1]]))
            contrib = sterm * excl_p * jnp.where(htf, tex_c, 1.0)
            incl_s = _seg_scan8(first, contrib, bounces, "add")
            res = jnp.concatenate([incl_s, incl_p], axis=1)   # (cap, 6)

            end_idx = jnp.clip(start + cnt - 1, 0, cap - 1)
            r6 = jnp.take(res, end_idx, axis=0)           # (n, 6)
            got = (cnt > 0)[:, None]
            out = color + jnp.where(got, r6[:, 0:3], 0.0)
            ptfin = jnp.where(got, r6[:, 3:6], 1.0)
            return out, ptfin

        def dense_branch(rt=rt, color=color):
            # the per-frame body of mega_postpass_dense, returning
            # (color with texture terms added, final albedo product)
            uus, vvs, tids, texs = [], [], [], []
            for b in range(bounces):
                ra = rt[b, 3]
                rb2 = rt[b, 4]
                rc2 = rt[b, 5]
                texid = rt[b, 6]
                sflag = rt[b, 7]
                has_tex = texid > -0.5
                if not have_sph:
                    uu, vv = ra, rb2
                else:
                    uu = jnp.where(sflag > 0.5,
                                   jnp.arctan2(rc2, ra) / TWO_PI + 0.5, ra)
                    vv = jnp.where(
                        sflag > 0.5,
                        jnp.arcsin(jnp.clip(rb2, -1.0 + 1e-6, 1.0 - 1e-6))
                        / PI + 0.5, rb2)
                uus.append(jnp.where(has_tex, uu, 0.0))
                vvs.append(jnp.where(has_tex, vv, 0.0))
                tids.append(jnp.where(has_tex, texid.astype(jnp.int32), 0))
                texs.append(has_tex)
            tex_all = sample_texture_quads(
                scene.tex_quads, scene.tex_size,
                scene.textures.shape[1], scene.textures.shape[2],
                jnp.stack(tids), jnp.stack(uus), jnp.stack(vvs))
            out = color
            pt = jnp.ones((n, 3), jnp.float32)
            for b in range(bounces):
                s_term = rt[b, 0:3].T
                has_tex = texs[b]
                tex_rgb = tex_all[b]
                t_alb = jnp.where(has_tex[:, None], tex_rgb, 1.0)
                term = s_term * pt
                out = out + jnp.where(has_tex[:, None],
                                      term * tex_rgb, term)
                pt = pt * t_alb
            return out, pt

        color, pt = jax.lax.cond(n_sig <= cap, compact_branch, dense_branch)

        frow = f * 8
        mdir = miss[frow:frow + 3, :n].T
        mctr = miss[frow + 3:frow + 6, :n].T
        mmask = miss[frow + 6, :n] > 0.5
        mdir = jnp.where(mmask[:, None], mdir,
                         jnp.array([1.0, 0.0, 0.0], jnp.float32))
        sky_rgb = env_radiance(scene, mdir)
        sky_term = mctr * sky_rgb * draw_env * pt
        color = color + jnp.where(mmask[:, None], sky_term, 0.0)

    return color / jnp.float32(frames)                   # shader:711
