"""Per-LANE BVH traversal path-tracing kernel — the O(log T) forward
path for scenes beyond the mxu kernel's brute-force table limits
(round 3; round 4 added persistent per-lane bounce scheduling).

Round 2's fused megakernel sweeps SAH treelet clusters with tile-uniform
culling; a measured census (scripts/census_schemes.py) shows that cull
saturating after the first diffuse bounce: every 64-to-512-ray group needs
essentially the whole scene (1100-1300 of 1856 padded pair tests per
ray-bounce under every grouping/sorting scheme tried), while a per-ray
traversal needs ~50-170.  The reference wins with per-thread BVH descent
(RayTracing/assets/shaders/RayTracing.shader:324-484); this kernel is that
algorithm on the VPU, one ray per vector LANE:

  * rays live on a full (8, 128) vreg: 1024 rays per grid step, every
    elementwise op serves all of them;
  * Mosaic's `tpu.dynamic_gather` (jnp.take_along_axis over one vreg,
    axis=1) gives each lane its own 128-entry table lookup; tables wider
    than 128 entries are chunked (one gather per 128-entry chunk + a
    select) — measured support matrix in scripts/probe_dyngather2.py;
  * the acceleration structure is a skip-link ("threaded") BVH over a
    <=K_LEAF-triangle SAH leaf cut (accel/trav.py, built from the same
    bit-parity binned-SAH hierarchy as the reference's BVH.cpp) —
    stackless per-lane descent `cur = hit ? cur+1 : skip[cur]` with
    per-lane best-t box pruning;
  * traversal runs PHASED: a node phase walks every lane to its next
    overlapping leaf (lanes park), then a leaf phase tests triangle k of
    every lane's own leaf for k = 0..K_LEAF-1 (k is loop-uniform, so the
    16 triangle features are one chunked gather each; lanes mask off past
    their leaf's count);
  * the winner's geometry (plane n, a.n) is carried from the test's own
    registers; its shading normal + material id are gathered on improve
    (pl.when-gated); material/texture attributes are fetched AFTER the
    loop from <=128-entry side tables (materials; textured triangles) —
    no one-hot MXU extraction, no (T', R) work anywhere;
  * traversal state lives in VMEM scratch refs and the loops carry only a
    scalar continue flag (Mosaic miscompiles vector-carried conds — the
    round-2 lesson, megakernel.py `_tri_sweep` docstring).

Everything else — camera jitters, bit-exact PCG RNG, scatter, deferred
texture/sky records — is the megakernel's logic reshaped to (8, 128); the
XLA post-pass (megakernel.mega_postpass) is shared unchanged.

Numerics: identical to the megakernel (f32 features, approx-reciprocal
ordering t with exact plane-equation recovery of the winner, DET_EPS
backface gate).  Limits: <=1024 BVH nodes, <=512 leaves, <=128 materials,
<=128 textured triangles, <=128 spheres — render_dispatch falls back to
the megakernel beyond them (the leaf size adapts to keep scenes <=64k
triangles inside).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import RenderConfig
from ...models.camera import CameraSpec
from ..intersect import DET_EPS
from .megakernel import (BIG, SEED_STRIDE, U32, _cross, _normalize,
                         _pack_camera, _safe_inv_dirs, _select,
                         mega_postpass, slot_to_xy, use_block8)
from .vreg_common import (M_ROWS, NO_TEX, SP_ROWS, X_ROWS, _M_ALB, _M_ALG,
                          _M_ALR, _M_EMB, _M_EMG, _M_EMP, _M_EMR, _M_METAL,
                          _M_REFR, _M_ROUGH, _M_TEX, _SP_ALB, _SP_ALG,
                          _SP_ALR, _SP_CX, _SP_CY, _SP_CZ, _SP_EMB, _SP_EMG,
                          _SP_EMP, _SP_EMR, _SP_METAL, _SP_R, _SP_REFR,
                          _SP_ROUGH, _SP_TEX, _X_ABX, _X_ABY, _X_ABZ,
                          _X_ACX, _X_ACY, _X_ACZ, _X_LAX, _X_LAY, _X_LAZ,
                          _X_U0, _X_U1, _X_U2, _X_V0, _X_V1, _X_V2,
                          camera_frame, fetch_mat_attrs, fetch_sph_attrs,
                          jittered_ray, scatter_step, sphere_nearest_smem,
                          tex_uv)

RAY_TILE = 1024              # rays per grid step: one (8,128) vreg
# Every vector->scalar while-cond costs a VPU pipeline drain (measured
# ~0.5-1us, scripts/probe_loop_cost.py + trav_bench iteration math), so
# the node phase runs as FIXED bursts with no inner cond: lanes that park
# early idle (masked) inside the burst; lanes still walking after it get
# picked up by the next round's burst.  Correct for any burst size — it
# only shifts work between rounds.
NODE_BURST = 12              # node steps per round, cond-free
MAX_NODES = 1024             # 8 lane chunks
MAX_LEAVES = 512             # 4 lane chunks

# triangle feature rows (trav_tri_feat leading axis): vertex A and the
# local edges only — each per-lane f32 costs one dynamic_gather (~7-10ns,
# scripts/probe_loop_cost.py), so the Moller-Trumbore determinant features
# (n, a.n, g1, g2 — megakernel _F_*) are DERIVED in registers from 9
# gathered floats instead of gathering 16
_TF_AX, _TF_AY, _TF_AZ = 0, 1, 2
_TF_ABX, _TF_ABY, _TF_ABZ = 3, 4, 5
_TF_ACX, _TF_ACY, _TF_ACZ = 6, 7, 8
_TF_SNX, _TF_SNY, _TF_SNZ = 9, 10, 11      # shading normal (improve-gated)
TF_ROWS = 12

# material / texture-side / sphere table row indices live in vreg_common
# (shared with the mxu kernel, round 4)


class TravArrays(NamedTuple):
    """GEOMETRY tables for the traversal kernel (a pytree of arrays stored
    on TracerScene; built host-side at scene build — the structure is
    data-dependent and cannot be traced).  Material/texture/sphere tables
    are rebuilt TRACED per dispatch from the live scene fields (so the
    inverse-rendering path optimizing material values never renders stale
    tables); only vertex edits require a scene rebuild.

    Gather tables are chunked by 128 entries and replicated across the 8
    sublanes so a lookup is `take_along_axis(chunk, idx, axis=1)` per
    chunk (tpu.dynamic_gather semantics: out[s,l] = x[s, idx[s,l]])."""

    node_box: np.ndarray     # (6, NC, 8, 128) f32 lox loy loz hix hiy hiz
    node_info: np.ndarray    # (NC, 8, 128) i32: skip | (leaf+1)<<10 | cnt<<20
    tri_feat: np.ndarray     # (TF_ROWS, K, LC, 8, 128) f32
    tri_info: np.ndarray     # (K, LC, 8, 128) i32: mat | texslot<<8


class TravMeta(NamedTuple):
    """Static (hashable) traversal metadata — a TracerScene static field
    so kernels can specialize on it under jit."""

    n_nodes: int             # DONE sentinel
    n_leaves: int
    leaf_k: int              # K (padded leaf width)
    n_spheres: int
    supported: bool          # fits all table limits
    textured_rows: tuple     # scene triangle rows with a textured material


class TravTables(NamedTuple):
    arrays: TravArrays
    meta: TravMeta


def _pack_box_bf16(node_box: np.ndarray) -> np.ndarray:
    """(6, N) f32 [lo3, hi3] -> (3, N) i32 with per-axis (lo, hi) as a
    CONSERVATIVE bf16 pair (lo in the low 16 bits rounded down-ish, hi in
    the high 16 rounded up-ish): a 2^-7 relative margin before
    round-to-nearest guarantees bf16(lo') <= lo and bf16(hi') >= hi (bf16
    nearest-rounding error is <= 2^-9 relative), so the slab test stays
    conservative — boxes get <=1.6% looser, hits are never missed.  Halves
    the node-fetch gathers (6 f32 -> 3 i32 lookups + cheap unpacks)."""
    import ml_dtypes
    m = np.float32(2.0 ** -7)
    tiny = np.float32(1e-37)
    lo = node_box[0:3]
    hi = node_box[3:6]
    lo_c = (lo - np.abs(lo) * m - tiny).astype(ml_dtypes.bfloat16)
    hi_c = (hi + np.abs(hi) * m + tiny).astype(ml_dtypes.bfloat16)
    assert np.all(lo_c.astype(np.float32) <= lo)
    assert np.all(hi_c.astype(np.float32) >= hi)
    lo_b = lo_c.view(np.uint16).astype(np.uint32)
    hi_b = hi_c.view(np.uint16).astype(np.uint32)
    return (lo_b | (hi_b << 16)).view(np.int32)


def _chunk_rep(values: np.ndarray, chunk_lanes: int = 128) -> np.ndarray:
    """(rows..., E) -> (rows..., C, 8, 128) 128-entry chunks replicated
    across sublanes."""
    e = values.shape[-1]
    c = max(1, -(-e // chunk_lanes))
    pad = c * chunk_lanes - e
    v = np.pad(values, [(0, 0)] * (values.ndim - 1) + [(0, pad)])
    v = v.reshape(values.shape[:-1] + (c, 1, chunk_lanes))
    return np.broadcast_to(
        v, values.shape[:-1] + (c, 8, chunk_lanes)).copy()


def build_trav_tables(tri_wa, tri_wb, tri_wc, tri_normal, tri_mat,
                      mat_texture_id, n_materials: int, n_spheres: int,
                      max_leaf_tris: int = 16) -> TravTables:
    """Build the GEOMETRY tables + static meta from host (numpy) arrays.
    Material/texture/sphere tables are traced per dispatch (see
    TravArrays docstring)."""
    from ...accel.trav import build_trav

    t = len(tri_wa)
    m_cnt = n_materials
    s_cnt = n_spheres

    # adaptive leaf size: prefer <=128 leaves (single-gather triangle
    # tables) and <=256 nodes (2-chunk node fetch); grow the leaf until
    # the structure fits, hard-capped by MAX_LEAVES/MAX_NODES.  The SAH
    # hierarchy is built ONCE and re-CUT per k (the cut is cheap; the
    # binned-SAH build dominates — advisor r3)
    k = max_leaf_tris
    trav = None
    bvh = None
    n_nodes = n_leaves = 0
    if t > 0:
        from ...accel.bvh import build_bvh
        from ...models.mesh import Mesh

        verts = np.stack([tri_wa, tri_wb, tri_wc],
                         axis=1).astype(np.float32)
        bvh = build_bvh(Mesh(verts, None))
        while True:
            trav = build_trav(verts, max_leaf_tris=k, bvh=bvh)
            n_nodes, n_leaves = trav.num_nodes, trav.num_leaves
            if (n_leaves <= 128 and n_nodes <= 256) or k >= 256:
                break
            k += 8
        # beyond ~32k tris accept chunked tables rather than huge leaves
        while n_leaves > MAX_LEAVES - 8:
            k *= 2
            trav = build_trav(verts, max_leaf_tris=k, bvh=bvh)
            n_nodes, n_leaves = trav.num_nodes, trav.num_leaves

    # n_nodes strictly < MAX_NODES: node_info packs the skip link into 10
    # bits and skip can equal n_nodes (the DONE sentinel) — at exactly
    # 1024 nodes the sentinel wraps to 0 and the traversal loops forever
    # (advisor r3)
    supported = (n_nodes < MAX_NODES and n_leaves <= MAX_LEAVES
                 and m_cnt <= 128 and s_cnt <= 128)
    # VMEM budget: tri_feat is (TF+1 incl. info, K, LC, 8, 128) resident
    # per grid step; a scene can pass the count limits yet blow the ~16MB
    # core VMEM at pallas_call compile instead of falling back to the
    # megakernel as documented (advisor r3).  Conservative 10MB bound on
    # the resident tables (outputs/scratch/accumulators take the rest).
    lanes_b = 8 * 128 * 4
    lc_est = max(1, -(-n_leaves // 128))
    nc_est = max(1, -(-n_nodes // 128))
    tbl_bytes = (k * lc_est * (TF_ROWS + 1) * lanes_b    # tri_feat+tri_info
                 + nc_est * 4 * lanes_b                  # node_box+node_info
                 + (M_ROWS + X_ROWS + SP_ROWS) * lanes_b)
    # The v5e core has ~128MB physical VMEM; rounds 3-4 ran against
    # Mosaic's DEFAULT 16MB scoped limit and sized a conservative 10MB
    # table bound to it.  Round 5 raises vmem_limit_bytes
    # (megakernel.VMEM_LIMIT_BYTES = 100MB, measured: 120MB scratch
    # compiles) — an 88MB table bound admits ~100k-triangle scenes
    # (the 62.7k dragon grid's 59MB tables verified compiling + running
    # on hardware, BENCH_BIGSCENE_r05.json).
    supported = supported and tbl_bytes <= 88 * 2 ** 20

    tex_id = np.asarray(mat_texture_id).astype(np.int64)
    # textured-triangle side table: scene row -> slot (or NO_TEX)
    textured_rows = (np.nonzero(tex_id[tri_mat] >= 0)[0]
                     if t > 0 else np.zeros(0, np.int64))
    if len(textured_rows) > 128:
        supported = False
        textured_rows = textured_rows[:128]
    slot_of_row = np.full(max(t, 1), NO_TEX, np.int64)
    slot_of_row[textured_rows] = np.arange(len(textured_rows))

    if t > 0 and supported:
        nc = -(-n_nodes // 128)
        lc = -(-n_leaves // 128)
        node_box = np.zeros((6, n_nodes), np.float32)
        node_box[0:3] = trav.lo.T
        node_box[3:6] = trav.hi.T
        leaf1 = trav.leaf_id + 1
        cnt = np.zeros(n_nodes, np.int64)
        for nid in range(n_nodes):
            if trav.leaf_id[nid] >= 0:
                s, e = trav.slices[trav.leaf_id[nid]]
                cnt[nid] = e - s
        info = (trav.skip.astype(np.int64) | (leaf1.astype(np.int64) << 10)
                | (cnt << 20)).astype(np.int32)

        # per-(k, leaf) triangle tables in BVH order.  Padding slots get
        # a degenerate triangle (all-zero edges -> det == 0 fails the
        # gate).
        a = tri_wa[trav.order].astype(np.float32)
        b = tri_wb[trav.order].astype(np.float32)
        c3 = tri_wc[trav.order].astype(np.float32)
        nsh = tri_normal[trav.order].astype(np.float32)
        mat = tri_mat[trav.order].astype(np.int64)
        slot = slot_of_row[trav.order]
        ab = b - a
        ac = c3 - a
        feat_t = np.stack([a[:, 0], a[:, 1], a[:, 2],
                           ab[:, 0], ab[:, 1], ab[:, 2],
                           ac[:, 0], ac[:, 1], ac[:, 2],
                           nsh[:, 0], nsh[:, 1], nsh[:, 2]])   # (TF, T)
        info_t = (mat | (slot << 8)).astype(np.int32)          # (T,)

        feat_kl = np.zeros((TF_ROWS, k, n_leaves), np.float32)
        info_kl = np.full((k, n_leaves), NO_TEX << 8, np.int32)
        for li, (s, e) in enumerate(trav.slices):
            w = e - s
            feat_kl[:, :w, li] = feat_t[:, s:e]
            info_kl[:w, li] = info_t[s:e]

        node_box_r = _chunk_rep(_pack_box_bf16(node_box))   # (3,NC,8,128)
        node_info_r = _chunk_rep(info[None])[0]             # (NC,8,128)
        # layout (K, LC, TF, 8, 128): the k-step takes ONE dynamic
        # sub-ref at [k, c] and reads features at static offsets — nine
        # separate [j, k, c] accesses cost nine scalar-unit dynamic
        # address computations per step (measured dominant)
        tri_feat_r = np.ascontiguousarray(
            _chunk_rep(feat_kl).transpose(1, 2, 0, 3, 4))   # (K,LC,TF,8,128)
        tri_info_r = _chunk_rep(info_kl)                    # (K,LC,8,128)
        assert node_box_r.shape[1] == nc and tri_feat_r.shape[1] == lc
    else:
        k = max(k, 1)
        node_box_r = np.zeros((3, 1, 8, 128), np.int32)
        node_info_r = np.zeros((1, 8, 128), np.int32)
        tri_feat_r = np.zeros((k, 1, TF_ROWS, 8, 128), np.float32)
        tri_info_r = np.full((k, 1, 8, 128), NO_TEX << 8, np.int32)

    return TravTables(
        TravArrays(node_box_r, node_info_r, tri_feat_r, tri_info_r),
        TravMeta(n_nodes, n_leaves, k, s_cnt, supported,
                 tuple(int(r) for r in textured_rows)))


# ---------------------------------------------------------------------------
# Traced side tables (material / texture / sphere values stay LIVE:
# the inverse-rendering path optimizes them without a scene rebuild)
# ---------------------------------------------------------------------------

def _rep128(rows):
    """(R, E<=128) jnp -> (R, 8, 128) sublane-replicated gather table."""
    r, e = rows.shape
    v = jnp.pad(rows, ((0, 0), (0, 128 - e)))
    return jnp.broadcast_to(v[:, None, :], (r, 8, 128))


def traced_mat_tab(materials):
    """(M_ROWS, 8, 128) f32 from the live Materials pytree."""
    m = materials.albedo.shape[0]
    rows = jnp.zeros((M_ROWS, m), jnp.float32)
    rows = rows.at[_M_ALR:_M_ALB + 1].set(materials.albedo.T)
    rows = rows.at[_M_EMR:_M_EMB + 1].set(materials.emission_color.T)
    rows = rows.at[_M_EMP].set(materials.emission_power)
    rows = rows.at[_M_ROUGH].set(materials.roughness)
    rows = rows.at[_M_METAL].set(materials.metallic)
    rows = rows.at[_M_REFR].set(materials.refraction_ratio)
    rows = rows.at[_M_TEX].set(materials.texture_id.astype(jnp.float32))
    return _rep128(rows)


def traced_tex_tab(scene, textured_rows: tuple):
    """(X_ROWS, 8, 128) f32 uv/local-barycentric side table from the live
    scene (megakernel textured-block parity: shader:257-268,575-580)."""
    rows = jnp.zeros((X_ROWS, 128), jnp.float32)
    if textured_rows:
        r = jnp.asarray(textured_rows, jnp.int32)
        w = len(textured_rows)
        rows = rows.at[_X_LAX:_X_LAZ + 1, :w].set(scene.tri_la[r].T)
        rows = rows.at[_X_ABX:_X_ABZ + 1, :w].set(scene.tri_lab[r].T)
        rows = rows.at[_X_ACX:_X_ACZ + 1, :w].set(scene.tri_lac[r].T)
        uv = scene.tri_uv[r]                                 # (w,3,2)
        rows = rows.at[_X_U0, :w].set(uv[:, 0, 0])
        rows = rows.at[_X_V0, :w].set(uv[:, 0, 1])
        rows = rows.at[_X_U1, :w].set(uv[:, 1, 0])
        rows = rows.at[_X_V1, :w].set(uv[:, 1, 1])
        rows = rows.at[_X_U2, :w].set(uv[:, 2, 0])
        rows = rows.at[_X_V2, :w].set(uv[:, 2, 1])
    return _rep128(rows)


def traced_sph_tabs(scene):
    """((SP_ROWS,8,128) gather table, (S_pad,16) SMEM twin) from the live
    scene — padding spheres parked at BIG with r=0 can never hit
    (megakernel parity)."""
    s_cnt = scene.sph_pos.shape[0]
    sp = max(8, -(-max(s_cnt, 1) // 8) * 8)
    rows = jnp.zeros((SP_ROWS, sp), jnp.float32)
    rows = rows.at[_SP_CX:_SP_CZ + 1].set(BIG)
    rows = rows.at[_SP_TEX].set(-1.0)
    if s_cnt:
        m = scene.materials
        sm = scene.sph_mat
        rows = rows.at[_SP_CX:_SP_CZ + 1, :s_cnt].set(scene.sph_pos.T)
        rows = rows.at[_SP_R, :s_cnt].set(scene.sph_radius)
        rows = rows.at[_SP_ALR:_SP_ALB + 1, :s_cnt].set(m.albedo[sm].T)
        rows = rows.at[_SP_EMR:_SP_EMB + 1, :s_cnt].set(
            m.emission_color[sm].T)
        rows = rows.at[_SP_EMP, :s_cnt].set(m.emission_power[sm])
        rows = rows.at[_SP_ROUGH, :s_cnt].set(m.roughness[sm])
        rows = rows.at[_SP_METAL, :s_cnt].set(m.metallic[sm])
        rows = rows.at[_SP_REFR, :s_cnt].set(m.refraction_ratio[sm])
        rows = rows.at[_SP_TEX, :s_cnt].set(
            m.texture_id[sm].astype(jnp.float32))
    return _rep128(rows), rows.T


# ---------------------------------------------------------------------------
# In-kernel chunked per-lane table lookup
# ---------------------------------------------------------------------------

def _mk_lookup(idx, n_chunks):
    """Returns lk(get_chunk) -> (8,128) per-lane T[idx] for a table stored
    as n_chunks (8,128) sublane-replicated 128-entry chunks.

    idx (8,128) i32 in [0, 128*n_chunks).  One tpu.dynamic_gather per
    chunk + one select; the lane index and chunk masks are shared by every
    lookup made through the same `lk`."""
    lane = jnp.bitwise_and(idx, 127)
    sels = [idx >= (c * 128) for c in range(1, n_chunks)]

    def lk(get_chunk):
        g = jnp.take_along_axis(get_chunk(0), lane, axis=1)
        for c in range(1, n_chunks):
            gc = jnp.take_along_axis(get_chunk(c), lane, axis=1)
            g = jnp.where(sels[c - 1], gc, g)
        return g

    return lk


def _slab_near8(lox, loy, loz, hix, hiy, hiz, ox, oy, oz,
                inv_dx, inv_dy, inv_dz):
    """(8,128) slab entry distance, BIG on miss (megakernel _slab_near)."""
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


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------

def _make_trav_kernel(*, n_nodes, n_leaves, leaf_k, nc, lc, n_sph_pad,
                      have_tris, have_sph, max_bounces, max_frames,
                      textured, width, height):
    """Kernel fn closed over all static configuration.

    Round-4 PERSISTENT PER-LANE scheduling (VERDICT r3 task 1): the
    bounce loop is FUSED into the traversal rounds.  Round 3 ran
    `for b: while_rounds(traverse); shade` — every bounce paid the
    tile-max leaf-visit count (~16) while the per-lane mean is ~4.4, and
    terminated lanes idled through the remaining bounces.  Now ONE
    while-loop runs rounds of [node burst | leaf phase | completion]:

      * a lane whose traversal reaches DONE immediately shades, scatters
        (vreg_common.scatter_step, masked by the completion set), bumps
        its per-lane bounce counter and re-enters traversal with its new
        ray in the SAME loop — rounds are bounded by the max over lanes
        of the TOTAL leaf visits across that lane's whole path (a sum
        that concentrates) instead of the per-bounce max summed over
        bounces;
      * dead lanes (missed into the sky / bounce budget spent) retire:
        they stop contributing to the round count entirely;
      * the winner's shading normal + (mat | texslot) are carried DURING
        the leaf k-step (4 extra gathers, improve-gated selects), which
        deletes the old per-bounce fetch_k pass — per-round completion
        only fetches material attributes from the <=128-entry tables;
      * textured records land in their (frame, bounce) rows via
        bounce-one-hot masked writes (the rec layout is unchanged, so
        mega_postpass is shared verbatim);
      * all per-lane path state (ray, seed, contribution, bounce index,
        pending flag, miss registers, accumulated color) lives in VMEM
        scratch refs — the while carries only a scalar flag (Mosaic
        miscompiles vector-carried conds, the round-2 lesson).

    In-kernel counters (color_ref rows 3/4/5): node-phase iterations,
    leaf k-steps issued (rounds * leaf_k), and REAL per-lane useful
    k-steps — the padded-vs-real ratio of the r3 verdict's done
    criterion is rows[4]/rows[5].
    """
    shape = (8, 128)
    NDONE = max(n_nodes, 1)

    # f32 per-lane state rows (st_f)
    _OX, _OY, _OZ, _DXR, _DYR, _DZR = 0, 1, 2, 3, 4, 5
    _CTR, _CTG, _CTB, _TSPH = 6, 7, 8, 9
    _MDX, _MDY, _MDZ, _MCR, _MCG, _MCB = 10, 11, 12, 13, 14, 15
    _CLR, _CLG, _CLB = 16, 17, 18
    # i32 per-lane state rows (st_i)
    _IB, _IPEND, _ISIDX, _IUSE = 0, 1, 2, 3

    def kernel(*refs):
        it = iter(refs)
        camf = next(it)                       # (1,64) f32 SMEM
        fidx = next(it)                       # (1,1)  u32 SMEM
        pix0 = next(it)                       # (1,1)  i32 SMEM
        if have_tris:
            node_box = next(it)               # (3,NC,8,128) i32 bf16-pairs
            node_info = next(it)              # (NC,8,128) i32
            tri_feat = next(it)               # (K,LC,TF,8,128) f32
            tri_info = next(it)               # (K,LC,8,128) i32
        mat_tab = next(it)                    # (M_ROWS,8,128) f32
        if textured:
            tex_tab = next(it)                # (X_ROWS,8,128) f32
        if have_sph:
            sph_tab = next(it)                # (SP_ROWS,8,128) f32
            sph_smem = next(it)               # (S_pad,16) f32 SMEM
        color_ref = next(it)                  # (8,8,128)
        miss_ref = next(it)                   # (8*F,8,128)
        rec_ref = next(it) if textured else None   # (8*F*B,8,128)
        # traversal + path state in REFS (scalar-only loop carries)
        cur_r = next(it)                      # (8,128) i32
        cnt_r = next(it)                      # (8,128) i32
        leaf_r = next(it)                     # (8,128) i32
        best_r = next(it)                     # (8,128) f32
        got_r = next(it)                      # (8,128) i32 (0/1)
        wfe_r = next(it)                      # (8, 8,128) f32 carried winner
        #   rows: 0=tdet 1=det 4-6=shading normal
        winfo_r = next(it)                    # (8,128) i32 mat|texslot<<8
        st_f = next(it)                       # (F_ROWS,8,128) f32 path state
        st_i = next(it)                       # (4,8,128) i32 path state
        seed_r = next(it)                     # (8,128) u32
        nsteps = next(it)                     # (1,1) i32 SMEM stats
        ksteps = next(it)                     # (1,1) i32 SMEM stats

        if textured:
            rec_ref[:, :, :] = jnp.zeros(
                (8 * max_frames * max_bounces,) + shape, jnp.float32)
            for fb in range(max_frames * max_bounces):
                rec_ref[fb * 8 + 6] = jnp.full(shape, -1.0, jnp.float32)
        nsteps[0, 0] = 0
        ksteps[0, 0] = 0
        st_i[_IUSE] = jnp.zeros(shape, jnp.int32)
        st_f[_CLR] = jnp.zeros(shape, jnp.float32)
        st_f[_CLG] = jnp.zeros(shape, jnp.float32)
        st_f[_CLB] = jnp.zeros(shape, jnp.float32)

        frame_index = fidx[0, 0]

        srow = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        lrow = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        base = pl.program_id(0) * RAY_TILE + pix0[0, 0]
        lin = base + srow * 128 + lrow
        if use_block8(width, height):
            xpix, ypix = slot_to_xy(lin, width)
        else:
            xpix = lin % width
            ypix = lin // width
        lin_u = (ypix * width + xpix).astype(U32)            # shader:697

        # camera basis (shader:684-691) — megakernel parity (vreg_common)
        basis = camera_frame(camf, width, height, xpix, ypix)

        def sphere_for(ox, oy, oz, dx, dy, dz):
            if have_sph:
                return sphere_nearest_smem(
                    sph_smem, n_sph_pad, shape, ox, oy, oz, dx, dy, dz)
            return (jnp.full(shape, BIG), jnp.zeros(shape, jnp.int32))

        def node_step(ox, oy, oz, inv_dx, inv_dy, inv_dz):
            cur = cur_r[:, :]
            active = (cur < NDONE) & (cnt_r[:, :] == 0)
            idx = jnp.clip(cur, 0, NDONE - 1)
            lk = _mk_lookup(idx, nc)
            info = lk(lambda c: node_info[c])
            wx_ = lk(lambda c: node_box[0, c])
            wy_ = lk(lambda c: node_box[1, c])
            wz_ = lk(lambda c: node_box[2, c])

            def unpk(w):
                lo = jax.lax.bitcast_convert_type(
                    jax.lax.shift_left(w, 16), jnp.float32)
                hi = jax.lax.bitcast_convert_type(
                    jnp.bitwise_and(w, jnp.int32(-65536)), jnp.float32)
                return lo, hi

            lox, hix = unpk(wx_)
            loy, hiy = unpk(wy_)
            loz, hiz = unpk(wz_)
            near = _slab_near8(
                lox, loy, loz, hix, hiy, hiz,
                ox, oy, oz, inv_dx, inv_dy, inv_dz)
            hit = active & (near < best_r[:, :])
            skip = info & 0x3FF
            leaf1 = (info >> 10) & 0x3FF
            c_ = jax.lax.shift_right_logical(info, 20)
            is_leaf = leaf1 > 0
            enter = hit & is_leaf
            leaf_r[:, :] = _select(enter, leaf1 - 1, leaf_r[:, :])
            cnt_r[:, :] = _select(enter, c_, cnt_r[:, :])
            cur_r[:, :] = _select(
                active, _select(hit & (~is_leaf), idx + 1, skip), cur)
            nsteps[0, 0] += 1

        def leaf_k_step(k, ox, oy, oz, dx, dy, dz):
            # 13 gathers: A + edges (9, Moller-Trumbore features derived
            # in registers), shading normal (3) and the packed info (1)
            # carried on improve — this deletes the round-3 per-bounce
            # fetch_k pass, which would otherwise run (masked) every
            # ROUND under persistent scheduling
            m = cnt_r[:, :] > k
            lk = _mk_lookup(jnp.clip(leaf_r[:, :], 0, n_leaves - 1), lc)
            subs = [tri_feat.at[k, c] for c in range(lc)]
            f = [lk(lambda c, j=j: subs[c][j]) for j in range(12)]
            info = lk(lambda c: tri_info[k, c])
            aox = ox - f[_TF_AX]
            aoy = oy - f[_TF_AY]
            aoz = oz - f[_TF_AZ]
            nx_t, ny_t, nz_t = _cross(f[_TF_ABX], f[_TF_ABY],
                                      f[_TF_ABZ], f[_TF_ACX],
                                      f[_TF_ACY], f[_TF_ACZ])
            det = -(dx * nx_t + dy * ny_t + dz * nz_t)
            tdet = aox * nx_t + aoy * ny_t + aoz * nz_t
            dax, day, daz = _cross(aox, aoy, aoz, dx, dy, dz)
            udet = f[_TF_ACX] * dax + f[_TF_ACY] * day + f[_TF_ACZ] * daz
            vdet = -(f[_TF_ABX] * dax + f[_TF_ABY] * day
                     + f[_TF_ABZ] * daz)
            wdet = det - udet - vdet
            mm = jnp.minimum(jnp.minimum(det - DET_EPS, tdet),
                             jnp.minimum(jnp.minimum(udet, vdet), wdet))
            ta = tdet * pl.reciprocal(jnp.maximum(det, DET_EPS),
                                      approx=True)
            better = m & (mm >= 0.0) & (ta < best_r[:, :])
            best_r[:, :] = _select(better, ta, best_r[:, :])
            got_r[:, :] = got_r[:, :] | better.astype(jnp.int32)
            wfe_r[0] = _select(better, tdet, wfe_r[0])
            wfe_r[1] = _select(better, det, wfe_r[1])
            wfe_r[4] = _select(better, f[_TF_SNX], wfe_r[4])
            wfe_r[5] = _select(better, f[_TF_SNY], wfe_r[5])
            wfe_r[6] = _select(better, f[_TF_SNZ], wfe_r[6])
            winfo_r[:, :] = _select(better, info, winfo_r[:, :])
            st_i[_IUSE] = st_i[_IUSE] + m.astype(jnp.int32)
            ksteps[0, 0] += 1

        def completion(frame):
            """Shade + scatter lanes whose traversal just finished, then
            retire them or re-launch their next bounce."""
            pend = st_i[_IPEND] > 0
            done = pend & (cur_r[:, :] >= NDONE) & (cnt_r[:, :] == 0)
            ox = st_f[_OX]
            oy = st_f[_OY]
            oz = st_f[_OZ]
            dx = st_f[_DXR]
            dy = st_f[_DYR]
            dz = st_f[_DZR]
            t_sph = st_f[_TSPH]
            s_idx = st_i[_ISIDX]
            seed = seed_r[:, :]
            b_r = st_i[_IB]

            if have_tris:
                use_tri = (got_r[:, :] > 0) & done
                t_ex = wfe_r[0] / jnp.maximum(wfe_r[1], DET_EPS)
                t_hit = _select(use_tri, t_ex, t_sph)
            else:
                use_tri = jnp.zeros(shape, jnp.bool_)
                t_hit = t_sph

            hit = done & (t_hit < BIG)
            t_safe = _select(hit, t_hit, 0.0)
            hx = ox + t_safe * dx
            hy = oy + t_safe * dy
            hz = oz + t_safe * dz

            use_t = use_tri.astype(jnp.float32)
            use_s = (hit & (~use_tri)).astype(jnp.float32)

            if have_tris:
                mid = winfo_r[:, :] & 0xFF
                mlk = _mk_lookup(mid, 1)
                (t_al_r, t_al_g, t_al_b, t_em_r, t_em_g, t_em_b,
                 t_emp, t_rough, t_metal, t_refr,
                 t_tex) = fetch_mat_attrs(mlk, mat_tab)
            else:
                zero = jnp.zeros(shape, jnp.float32)
                t_al_r = t_al_g = t_al_b = zero
                t_em_r = t_em_g = t_em_b = zero
                t_emp = t_rough = t_metal = t_refr = zero
                t_tex = zero - 1.0

            if have_sph:
                slk = _mk_lookup(s_idx, 1)
                (scx, scy, scz, s_al_r, s_al_g, s_al_b, s_em_r, s_em_g,
                 s_em_b, s_emp, s_rough, s_metal, s_refr,
                 s_tex) = fetch_sph_attrs(slk, sph_tab)
                snx, sny, snz = _normalize(hx - scx, hy - scy, hz - scz)
            else:
                zero = jnp.zeros(shape, jnp.float32)
                s_al_r = s_al_g = s_al_b = zero
                s_em_r = s_em_g = s_em_b = zero
                s_emp = s_rough = s_metal = s_refr = zero
                s_tex = zero - 1.0
                snx = sny = snz = zero

            if have_tris:
                nxh = wfe_r[4] * use_t + snx * use_s
                nyh = wfe_r[5] * use_t + sny * use_s
                nzh = wfe_r[6] * use_t + snz * use_s
            else:
                nxh, nyh, nzh = snx * use_s, sny * use_s, snz * use_s

            alr = t_al_r * use_t + s_al_r * use_s
            alg = t_al_g * use_t + s_al_g * use_s
            alb = t_al_b * use_t + s_al_b * use_s
            emr = t_em_r * use_t + s_em_r * use_s
            emg = t_em_g * use_t + s_em_g * use_s
            emb = t_em_b * use_t + s_em_b * use_s
            emp = t_emp * use_t + s_emp * use_s
            rough = t_rough * use_t + s_rough * use_s
            metal = t_metal * use_t + s_metal * use_s
            refr = t_refr * use_t + s_refr * use_s
            texid = (t_tex * use_t + s_tex * use_s
                     + (-1.0) * (1.0 - use_t - use_s))

            live = hit
            miss_now = done & (~hit)

            st_f[_MDX] = _select(miss_now, dx, st_f[_MDX])
            st_f[_MDY] = _select(miss_now, dy, st_f[_MDY])
            st_f[_MDZ] = _select(miss_now, dz, st_f[_MDZ])
            st_f[_MCR] = _select(miss_now, st_f[_CTR], st_f[_MCR])
            st_f[_MCG] = _select(miss_now, st_f[_CTG], st_f[_MCG])
            st_f[_MCB] = _select(miss_now, st_f[_CTB], st_f[_MCB])

            ctr_r = st_f[_CTR]
            ctr_g = st_f[_CTG]
            ctr_b = st_f[_CTB]
            if textured:
                has_tex = (texid > -0.5) & live
                livef = live.astype(jnp.float32)
                htf = has_tex.astype(jnp.float32)
                s_r = ctr_r * _select(has_tex, emp, emr * emp) * livef
                s_g = ctr_g * _select(has_tex, emp, emg * emp) * livef
                s_b_ = ctr_b * _select(has_tex, emp, emb * emp) * livef
                if have_tris:
                    slot = jnp.clip(
                        jax.lax.shift_right_logical(winfo_r[:, :], 8),
                        0, 127)
                    xlk = _mk_lookup(slot, 1)
                    uu, vv = tex_uv(xlk, tex_tab, ox, oy, oz, dx, dy, dz)
                else:
                    uu = vv = jnp.zeros(shape, jnp.float32)
                ra = uu * use_t + snx * use_s
                rb = vv * use_t + sny * use_s
                rc = snz * use_s
                vals = (s_r, s_g, s_b_, ra, rb, rc,
                        _select(has_tex, texid, jnp.float32(-1.0)),
                        use_s * htf)
                # bounce-one-hot record landing: each completing lane
                # writes its own (frame, bounce) rows
                for bb in range(max_bounces):
                    selb = live & (b_r == bb)
                    row = ((frame - 1) * max_bounces + bb) * 8
                    for j in range(8):
                        rec_ref[row + j] = _select(selb, vals[j],
                                                   rec_ref[row + j])
                keep = 1.0 - livef * (1.0 - htf)
                st_f[_CTR] = ctr_r * (keep + livef * (1.0 - htf) * alr)
                st_f[_CTG] = ctr_g * (keep + livef * (1.0 - htf) * alg)
                st_f[_CTB] = ctr_b * (keep + livef * (1.0 - htf) * alb)
            else:
                livef = live.astype(jnp.float32)
                st_f[_CLR] = st_f[_CLR] + emr * emp * ctr_r * livef
                st_f[_CLG] = st_f[_CLG] + emg * emp * ctr_g * livef
                st_f[_CLB] = st_f[_CLB] + emb * emp * ctr_b * livef
                st_f[_CTR] = ctr_r * (1.0 - livef + livef * alr)
                st_f[_CTG] = ctr_g * (1.0 - livef + livef * alg)
                st_f[_CTB] = ctr_b * (1.0 - livef + livef * alb)

            # ---- scatter (shader:590-649) — shared vreg_common ---------
            n_ox, n_oy, n_oz, n_dx, n_dy, n_dz, n_seed = scatter_step(
                dx, dy, dz, nxh, nyh, nzh, hx, hy, hz,
                rough, metal, refr, seed)

            nb = b_r + 1
            cont = live & (nb < max_bounces) & pend
            # shader:659 — the next bounce offsets the carried seed by
            # its bounce index
            st_f[_OX] = _select(cont, n_ox, ox)
            st_f[_OY] = _select(cont, n_oy, oy)
            st_f[_OZ] = _select(cont, n_oz, oz)
            st_f[_DXR] = _select(cont, n_dx, dx)
            st_f[_DYR] = _select(cont, n_dy, dy)
            st_f[_DZR] = _select(cont, n_dz, dz)
            seed_r[:, :] = jnp.where(
                cont, n_seed + nb.astype(U32), seed)
            st_i[_IB] = _select(done, nb, b_r)
            st_i[_IPEND] = _select(done, cont.astype(jnp.int32),
                                   st_i[_IPEND])

            # re-launch traversal for continuing lanes
            t_sph2, s_idx2 = sphere_for(
                st_f[_OX], st_f[_OY], st_f[_OZ],
                st_f[_DXR], st_f[_DYR], st_f[_DZR])
            st_f[_TSPH] = _select(cont, t_sph2, st_f[_TSPH])
            st_i[_ISIDX] = _select(cont, s_idx2, st_i[_ISIDX])
            best_r[:, :] = _select(cont, st_f[_TSPH], best_r[:, :])
            got_r[:, :] = _select(cont, jnp.int32(0), got_r[:, :])
            winfo_r[:, :] = _select(
                cont, jnp.full(shape, NO_TEX << 8, jnp.int32),
                winfo_r[:, :])
            cnt_r[:, :] = _select(cont, jnp.int32(0), cnt_r[:, :])
            # spheres-only scenes have no traversal: relaunched lanes go
            # straight back to DONE so the next round completes them
            cur_r[:, :] = _select(
                cont, jnp.int32(0 if have_tris else NDONE), cur_r[:, :])

        for frame in range(1, max_frames + 1):
            seed0 = lin_u + U32(frame) * frame_index * SEED_STRIDE
            ox, oy, oz, dx, dy, dz, seed = jittered_ray(seed0, basis)
            # bounce 0: shader:659 adds U32(0) — no-op
            st_f[_OX] = ox
            st_f[_OY] = oy
            st_f[_OZ] = oz
            st_f[_DXR] = dx
            st_f[_DYR] = dy
            st_f[_DZR] = dz
            seed_r[:, :] = seed
            st_f[_CTR] = jnp.ones(shape, jnp.float32)
            st_f[_CTG] = jnp.ones(shape, jnp.float32)
            st_f[_CTB] = jnp.ones(shape, jnp.float32)
            for j in (_MDX, _MDY, _MDZ, _MCR, _MCG, _MCB):
                st_f[j] = jnp.zeros(shape, jnp.float32)
            st_i[_IB] = jnp.zeros(shape, jnp.int32)
            st_i[_IPEND] = jnp.ones(shape, jnp.int32)
            t_sph, s_idx = sphere_for(ox, oy, oz, dx, dy, dz)
            st_f[_TSPH] = t_sph
            st_i[_ISIDX] = s_idx
            best_r[:, :] = t_sph
            got_r[:, :] = jnp.zeros(shape, jnp.int32)
            cnt_r[:, :] = jnp.zeros(shape, jnp.int32)
            leaf_r[:, :] = jnp.zeros(shape, jnp.int32)
            winfo_r[:, :] = jnp.full(shape, NO_TEX << 8, jnp.int32)
            cur_r[:, :] = (jnp.zeros(shape, jnp.int32)
                           if have_tris else
                           jnp.full(shape, NDONE, jnp.int32))

            def one_round():
                if have_tris:
                    ox_ = st_f[_OX]
                    oy_ = st_f[_OY]
                    oz_ = st_f[_OZ]
                    dx_ = st_f[_DXR]
                    dy_ = st_f[_DYR]
                    dz_ = st_f[_DZR]
                    inv_dx, inv_dy, inv_dz = _safe_inv_dirs(dx_, dy_, dz_)
                    for _ in range(NODE_BURST):
                        node_step(ox_, oy_, oz_, inv_dx, inv_dy, inv_dz)

                    def k_body(k, _):
                        leaf_k_step(k, ox_, oy_, oz_, dx_, dy_, dz_)
                        return 0

                    # (a jnp.max(cnt) dynamic bound was measured a
                    # wash here: the ~1us vector->scalar sync per round
                    # cancels the saved k-steps — static trip keeps the
                    # round sync-free)
                    jax.lax.fori_loop(0, leaf_k, k_body, 0)
                    cnt_r[:, :] = jnp.zeros(shape, jnp.int32)
                # completion every round: an alternate-round variant
                # (finished lanes wait <=1 round, completion cost halved)
                # measured 133 vs 129 ms — the waiting rounds cost more
                # than the ~15%-of-round completion block they save
                completion(frame)

            def outer_body(_):
                one_round()
                return jnp.any(st_i[_IPEND] > 0)

            jax.lax.while_loop(lambda f_: f_, outer_body,
                               jnp.any(st_i[_IPEND] > 0))

            frow = (frame - 1) * 8
            m_dx = st_f[_MDX]
            m_dy = st_f[_MDY]
            m_dz = st_f[_MDZ]
            miss_ref[frow + 0] = m_dx
            miss_ref[frow + 1] = m_dy
            miss_ref[frow + 2] = m_dz
            miss_ref[frow + 3] = st_f[_MCR]
            miss_ref[frow + 4] = st_f[_MCG]
            miss_ref[frow + 5] = st_f[_MCB]
            miss_ref[frow + 6] = (
                (m_dx * m_dx + m_dy * m_dy + m_dz * m_dz) > 0.0
            ).astype(jnp.float32)
            miss_ref[frow + 7] = jnp.zeros(shape, jnp.float32)

        color_ref[0] = st_f[_CLR]
        color_ref[1] = st_f[_CLG]
        color_ref[2] = st_f[_CLB]
        # rows 3/4: per-tile traversal counters; row 5: per-lane REAL
        # useful k-steps (padded-vs-real = row4*lanes / sum(row5))
        color_ref[3] = jnp.full(shape, 1.0) * nsteps[0, 0].astype(jnp.float32)
        color_ref[4] = jnp.full(shape, 1.0) * ksteps[0, 0].astype(jnp.float32)
        color_ref[5] = st_i[_IUSE].astype(jnp.float32)
        for j in range(6, 8):
            color_ref[j] = jnp.zeros(shape, jnp.float32)

    return kernel


# ---------------------------------------------------------------------------
# Host-side driver: pallas_call + shared XLA post-pass
# ---------------------------------------------------------------------------

def render_rays_trav(scene, cam: CameraSpec, frame_index, cfg: RenderConfig,
                     pixel_offset, n_rays: int, interpret: bool = False,
                     skip_postpass: bool = False, with_stats: bool = False):
    """Trace dispatch slots [pixel_offset, pixel_offset + n_rays) — same
    contract as megakernel.render_rays_megakernel: returns (n_rays, 3) in
    slot order (8x8 pixel blocks when aligned, slot_to_xy).

    Requires scene.trav (TravTables with supported=True) — built by
    models.scene.build_tracer_scene.  with_stats: also return the per-tile
    (node-phase iterations, leaf k-steps) counters summed over tiles."""
    w, h = cfg.width, cfg.height
    n = n_rays
    n_pad = -(-n // RAY_TILE) * RAY_TILE
    n_tiles = n_pad // RAY_TILE
    bounces = cfg.max_bounces
    frames = cfg.max_frames
    textured = scene.any_textured

    ta = scene.trav_arrays
    tm = scene.trav_meta
    assert ta is not None and tm.supported, "scene unsupported by trav"
    have_tris = tm.n_nodes > 0
    have_sph = tm.n_spheres > 0

    camf = _pack_camera(cam)
    fidx = jnp.asarray(frame_index, jnp.uint32).reshape(1, 1)
    pix0 = jnp.asarray(pixel_offset, jnp.int32).reshape(1, 1)

    const2 = lambda i: (0, 0)
    in_specs = [
        pl.BlockSpec((1, 64), const2, memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1), const2, memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1), const2, memory_space=pltpu.SMEM),
    ]
    inputs = [camf, fidx, pix0]

    def vmem_full(arr):
        nd = arr.ndim
        in_specs.append(pl.BlockSpec(
            arr.shape, lambda i, nd=nd: (0,) * nd, memory_space=pltpu.VMEM))
        inputs.append(jnp.asarray(arr))

    nc = lc = 1
    if have_tris:
        nc = ta.node_box.shape[1]
        lc = ta.tri_feat.shape[1]
        vmem_full(ta.node_box)
        vmem_full(ta.node_info)
        vmem_full(ta.tri_feat)
        vmem_full(ta.tri_info)
    vmem_full(traced_mat_tab(scene.materials))
    if textured:
        vmem_full(traced_tex_tab(scene, tm.textured_rows))
    n_sph_pad = 0
    if have_sph:
        sph_tab, sph_smem = traced_sph_tabs(scene)
        n_sph_pad = sph_smem.shape[0]
        vmem_full(sph_tab)
        in_specs.append(pl.BlockSpec((n_sph_pad, 16), const2,
                                     memory_space=pltpu.SMEM))
        inputs.append(sph_smem)

    out_shape = [jax.ShapeDtypeStruct((8, n_tiles * 8, 128), jnp.float32),
                 jax.ShapeDtypeStruct((8 * frames, n_tiles * 8, 128),
                                      jnp.float32)]
    out_specs = [pl.BlockSpec((8, 8, 128), lambda i: (0, i, 0),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec((8 * frames, 8, 128), lambda i: (0, i, 0),
                              memory_space=pltpu.VMEM)]
    if textured:
        out_shape.append(jax.ShapeDtypeStruct(
            (8 * frames * bounces, n_tiles * 8, 128), jnp.float32))
        out_specs.append(pl.BlockSpec((8 * frames * bounces, 8, 128),
                                      lambda i: (0, i, 0),
                                      memory_space=pltpu.VMEM))

    kernel = _make_trav_kernel(
        n_nodes=tm.n_nodes, n_leaves=max(tm.n_leaves, 1),
        leaf_k=tm.leaf_k, nc=nc, lc=lc,
        n_sph_pad=n_sph_pad,
        have_tris=have_tris, have_sph=have_sph,
        max_bounces=bounces, max_frames=frames, textured=textured,
        width=w, height=h)

    scratch = [
        pltpu.VMEM((8, 128), jnp.int32),     # cur
        pltpu.VMEM((8, 128), jnp.int32),     # cnt
        pltpu.VMEM((8, 128), jnp.int32),     # leaf
        pltpu.VMEM((8, 128), jnp.float32),   # best
        pltpu.VMEM((8, 128), jnp.int32),     # got
        pltpu.VMEM((8, 8, 128), jnp.float32),  # winner features
        pltpu.VMEM((8, 128), jnp.int32),     # winfo
        pltpu.VMEM((19, 8, 128), jnp.float32),  # per-lane path state f32
        pltpu.VMEM((4, 8, 128), jnp.int32),  # per-lane path state i32
        pltpu.VMEM((8, 128), jnp.uint32),    # per-lane seed
        pltpu.SMEM((1, 1), jnp.int32),       # node-step counter
        pltpu.SMEM((1, 1), jnp.int32),       # leaf k-step counter
    ]

    try:
        from .megakernel import VMEM_LIMIT_BYTES
        cparams = pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=VMEM_LIMIT_BYTES)
    except TypeError:                                     # older jax
        cparams = None

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
        rec = rec.reshape(8 * frames * bounces, n_pad)
    else:
        main, miss = outs
        rec = None
    main = main.reshape(8, n_pad)
    miss = miss.reshape(8 * frames, n_pad)

    color = main[0:3, :n].T                              # (N,3)
    # per-tile counters: node iterations, issued k-steps, and the summed
    # per-lane REAL k-steps (padded-vs-real = ksteps*RAY_TILE / useful)
    stats = (main[3, ::RAY_TILE], main[4, ::RAY_TILE],
             main[5].reshape(n_tiles, RAY_TILE).sum(axis=1))
    if skip_postpass:
        extra = jnp.sum(miss[:1, :1])
        if rec is not None:
            extra = extra + jnp.sum(rec[:1, :1])
        out = color + extra * jnp.float32(1e-30)
    else:
        out = mega_postpass(color, miss, rec, scene, cfg, n)
    if with_stats:
        return out, stats
    return out


def render_trav(scene, cam: CameraSpec, frame_index, cfg: RenderConfig,
                interpret: bool = False):
    """Full-frame forward dispatch through the traversal kernel. Returns
    (H, W, 3) f32 radiance — same contract as render_megakernel."""
    from .megakernel import slots_to_image
    color = render_rays_trav(
        scene, cam, frame_index, cfg, pixel_offset=jnp.int32(0),
        n_rays=cfg.width * cfg.height, interpret=interpret)
    if use_block8(cfg.width, cfg.height):
        return slots_to_image(color, cfg.width, cfg.height)
    return color.reshape(cfg.height, cfg.width, 3)
