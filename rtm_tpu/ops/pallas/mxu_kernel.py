"""MXU brute-force path-tracing kernel — the round-4 forward path for
small scenes (<= 2047 triangles).

Round 3 proved per-lane BVH traversal correct but gather-latency-bound:
each leaf k-step costs 9 `tpu.dynamic_gather`s (~7-10 ns each) and the
lockstep rounds pay the tile-max leaf count.  The round-4 experiment
(scripts/mxu_prefilter.py, MXU_PREFILTER_r04.json) showed the
until-then-idle MXU runs the ray-triangle pair test as a matmul:

  the Moller-Trumbore quantities are LINEAR in a 10-dim ray feature
  vector f = [d, o x d, o, 1] (Pluecker form), so one
  (Q*128, KS=48) @ (48, 1024) bf16x3-stacked matmul per 128-triangle
  chunk computes s1, s2, s3 (edge side tests; their sum is det = -d.n)
  and tdet = (o - a).n for ALL pairs — f32-grade (see KS below),
  validated EXACT vs the production M-T sweep (mask parity 1.0) at
  ~16 us/tile-bounce for 1856 triangles where the megakernel's
  tile-uniform VPU sweep pays ~55 us.  Morton-ordered chunks are culled
  per (tile, bounce) against their bboxes with one scalar bitmask.

Per bounce, per (S,128)-vreg ray tile (S = tile/128 sublanes; the tile
width auto-picks the widest of 4096/2048/1024 dividing the dispatch —
wider tiles amortize the per-bounce serial phases, MXU_SPLIT_r05.json):
  1. spheres: scalar SMEM loop (vreg_common.sphere_nearest_smem);
  2. ray features written to a (16, 8, 128) scratch, read back as the
     (16, 1024) matmul operand (one relayout per bounce);
  3. fori over 128-triangle chunks: matmul -> (Q*128, 1024) scratch;
     VPU min-chain with the triangle id packed into the t mantissa's low
     11 bits so argmin rides the same min (t ordering approximated at
     2^-12 + approx-reciprocal 2^-8; the winner is re-tested EXACTLY);
  4. winner attributes (geometric n, a.n, shading normal, mat|texslot)
     by chunked per-lane gather; exact t = ((o.n) - a.n)/(-d.n)
     recovered in f32 — megakernel parity (exact plane recovery);
  5. shade/scatter/records: the shared vreg_common semantics, identical
     to the trav kernel; postpass shared (megakernel.mega_postpass).

Brute force is O(T) with no tree, no lockstep waste and no per-pair
gathers: the right trade exactly when T is small (the reference's own
scenes are 2-1856 triangles).  render_dispatch auto-falls back to the
megakernel/trav beyond the table limits (<= 2047 tris for the 11-bit
index pack, <= 128 materials/textured-tris/spheres).

Reference parity citations: RayTracing/assets/shaders/RayTracing.shader
:285-303 (triangle test semantics), :486-548 (sphere + nearest-hit
order: sphere wins ties), :550-673 (shading/scatter/sky), numerics
identical to ops/pallas/megakernel.py.
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
from ..intersect import DET_EPS
from .megakernel import (BIG, SEED_STRIDE, U32, _cross, _pack_camera,
                         _safe_inv_dirs, _select, mega_postpass, slot_to_xy,
                         use_block8)
from .trav_kernel import (_chunk_rep, _mk_lookup, traced_mat_tab,
                          traced_sph_tabs, traced_tex_tab)
from .vreg_common import (NO_TEX, camera_frame, fetch_mat_attrs,
                          fetch_sph_attrs, jittered_ray, scatter_step,
                          sphere_nearest_smem, tex_uv)

# Rays per grid step.  1024 = one (8,128) vreg of rays; the r5 width A/B
# (scripts/mxu_probe.py tile sweep) measures wider tiles: the chunk
# matmul+sweep phase is at its FLOPs/op floor, but the per-bounce serial
# phases (winner gathers, scatter, shading — long dependency chains of
# 1-vreg ops) amortize over tile width because each instruction then
# covers S=TILE/128 vregs back-to-back.
RAY_TILE = int(os.environ.get("RTM_MXU_TILE", "1024"))
K = 16                       # ray feature depth: [d, oxd, o, 1] pad 10->16
# Matmul precision: the MXU multiplies in bf16.  A single bf16 pass flips
# ~4e-5 of near-edge side signs (measured: +3% radiance drift at 512^2);
# Mosaic supports only DEFAULT/HIGHEST dot precision, and HIGHEST (full
# f32, 6 passes) measured 2.4x the whole-frame cost.  So the kernel runs
# the classic bf16x3 split MANUALLY, folded into ONE matmul by stacking
# the contraction axis: lhs [A_hi | A_hi | A_lo] (static, host-built)
# against rays [B_hi; B_lo; B_hi] — error ~2^-17 relative (f32-grade for
# this geometry; the winner is exactly re-tested in f32 regardless).
KS = 3 * K                   # stacked contraction depth
Q = 4                        # matmul rows per tri: s1, s2, s3, tdet
MAX_TRIS = 2047              # 11-bit index pack in the t mantissa
IDX_MASK = 0x7FF

# hitrec packing (diff/replay.py record-replay gradients): bits 0..11 the
# winning primitive index, bit 14 triangle, bit 15 sphere, 0 = miss
HR_TRI = 1 << 14
HR_SPH = 1 << 15
HR_IDX = 0xFFF


# attribute gather table rows (mxu_attr)
_A_NX, _A_NY, _A_NZ, _A_ANDOT = 0, 1, 2, 3
_A_SNX, _A_SNY, _A_SNZ = 4, 5, 6
A_ROWS = 8


class MxuArrays(NamedTuple):
    """Static GEOMETRY tables (host-built; vertex edits rebuild the
    scene — material/texture/sphere side tables are traced per dispatch,
    shared with the trav kernel)."""

    pair: np.ndarray         # (NC, Q*128, KS) bf16 matmul lhs rows
    attr: np.ndarray         # (A_ROWS, NC, 8, 128) f32 gather chunks
    info: np.ndarray         # (NC, 8, 128) i32: mat | texslot<<8
    cbox: np.ndarray         # (NC, 8) f32 chunk bbox lo3 hi3 (SMEM culling)


class MxuMeta(NamedTuple):
    n_tris: int
    nc: int                  # 128-triangle chunks
    supported: bool
    textured_rows: tuple     # scene rows with a textured material


class MxuTables(NamedTuple):
    arrays: MxuArrays
    meta: MxuMeta


def _morton3(vals: np.ndarray) -> np.ndarray:
    """(T,3) centroids -> 30-bit Morton codes (10 bits/axis)."""
    lo = vals.min(axis=0)
    ext = np.maximum(vals.max(axis=0) - lo, 1e-12)
    q = np.clip(((vals - lo) / ext * 1023.0), 0, 1023).astype(np.uint64)

    def spread(x):
        x = (x | (x << 16)) & np.uint64(0x030000FF)
        x = (x | (x << 8)) & np.uint64(0x0300F00F)
        x = (x | (x << 4)) & np.uint64(0x030C30C3)
        x = (x | (x << 2)) & np.uint64(0x09249249)
        return x

    return (spread(q[:, 0]) | (spread(q[:, 1]) << np.uint64(1))
            | (spread(q[:, 2]) << np.uint64(2)))


def build_mxu_tables(tri_wa, tri_wb, tri_wc, tri_normal, tri_mat,
                     mat_texture_id, n_materials: int,
                     n_spheres: int) -> MxuTables:
    """Pack the pair-test matmul rows + attribute gather tables from host
    numpy arrays.  Triangles are MORTON-ordered so 128-tri chunks are
    spatially compact — the kernel culls whole chunks per (tile, bounce)
    against the chunk bbox (cbox) with one scalar bitmask."""
    t = len(tri_wa)
    supported = (t <= MAX_TRIS and n_materials <= 128 and n_spheres <= 128)

    tex_id = np.asarray(mat_texture_id).astype(np.int64)
    textured_rows = (np.nonzero(tex_id[np.asarray(tri_mat,
                                                  np.int64)] >= 0)[0]
                     if t > 0 else np.zeros(0, np.int64))
    if len(textured_rows) > 128:
        supported = False
        textured_rows = textured_rows[:128]
    slot_of_row = np.full(max(t, 1), NO_TEX, np.int64)
    slot_of_row[textured_rows] = np.arange(len(textured_rows))

    if t > 0 and supported:
        wa = np.asarray(tri_wa, np.float64)
        wb = np.asarray(tri_wb, np.float64)
        wc = np.asarray(tri_wc, np.float64)
        order = np.argsort(_morton3((wa + wb + wc) / 3.0), kind="stable")
        tri_mat_o = np.asarray(tri_mat, np.int64)[order]
        slot_o = slot_of_row[order]
        nsh_o = np.asarray(tri_normal, np.float32)[order]

        nc = -(-t // 128)
        tp = nc * 128
        a = np.zeros((tp, 3), np.float64)
        b = np.zeros((tp, 3), np.float64)
        c3 = np.zeros((tp, 3), np.float64)
        a[:t] = wa[order]
        b[:t] = wb[order]
        c3[:t] = wc[order]
        n = np.cross(b - a, c3 - a)          # zero rows for padding: det=0

        # per-chunk bounding boxes for the in-kernel cull (padding rows
        # collapse to the chunk's real extent)
        cbox = np.zeros((nc, 8), np.float32)
        for c in range(nc):
            s, e = c * 128, min((c + 1) * 128, t)
            vs = np.concatenate([a[s:e], b[s:e], c3[s:e]], axis=0)
            cbox[c, 0:3] = vs.min(axis=0)
            cbox[c, 3:6] = vs.max(axis=0)

        # pair rows: reversed edges (c->b),(a->c),(b->a) make the side
        # sum equal -d.n = det (the repo's backface gate); tdet = (o-a).n
        rows = np.zeros((tp, Q, K), np.float64)
        for qi, (p, qq) in enumerate(((c3, b), (a, c3), (b, a))):
            rows[:, qi, 0:3] = np.cross(p, qq)      # on d
            rows[:, qi, 3:6] = qq - p               # on m = o x d
        rows[:, 3, 6:9] = n                         # tdet: + o.n
        rows[:, 3, 9] = -(a * n).sum(-1)            # ... - a.n
        # padding rows: all-zero features give s=td=0, which would PASS
        # a min-chain-only mask — park their constant tdet term at -1 so
        # the mask needs no separate det>eps compare (the min-sweep's
        # only remaining det use is the ordering reciprocal; a real pair
        # with 0 < det <= eps loses the exact f32 winner retest exactly
        # as the production M-T rejects it)
        rows[t:, 3, 9] = -1.0
        # chunk layout: (nc, Q*128, K) with the 128-tri chunk minor,
        # then the bf16x3 K-stack [A_hi | A_hi | A_lo] (see KS above)
        pair_f32 = (rows.reshape(nc, 128, Q, K).transpose(0, 2, 1, 3)
                    .reshape(nc, Q * 128, K).astype(np.float32))
        import ml_dtypes
        a_hi = pair_f32.astype(ml_dtypes.bfloat16)
        a_lo = (pair_f32 - a_hi.astype(np.float32)).astype(ml_dtypes.bfloat16)
        pair = np.concatenate([a_hi, a_hi, a_lo], axis=2)   # (nc,Q*128,KS)

        nsh = np.zeros((tp, 3), np.float32)
        nsh[:t] = nsh_o
        attr_rows = np.zeros((A_ROWS, tp), np.float32)
        attr_rows[_A_NX:_A_NZ + 1] = n.T.astype(np.float32)
        attr_rows[_A_ANDOT] = (a * n).sum(-1).astype(np.float32)
        attr_rows[_A_SNX:_A_SNZ + 1] = nsh.T
        attr = _chunk_rep(attr_rows)                # (A_ROWS, NC, 8, 128)

        info_rows = np.full((tp,), NO_TEX << 8, np.int64)
        # bits 0..7 material, 8..15 texture slot, 16..26 the ORIGINAL
        # (pre-Morton-sort) triangle index — the hitrec replay path
        # (diff gradients) needs scene-order ids, not table positions
        info_rows[:t] = tri_mat_o | (slot_o << 8) | (order << 16)
        info = _chunk_rep(info_rows[None].astype(np.int32))[0]
    else:
        import ml_dtypes
        nc = 1
        pair = np.zeros((1, Q * 128, KS), ml_dtypes.bfloat16)
        attr = np.zeros((A_ROWS, 1, 8, 128), np.float32)
        info = np.full((1, 8, 128), NO_TEX << 8, np.int32)
        cbox = np.zeros((1, 8), np.float32)

    return MxuTables(
        MxuArrays(pair, attr, info, cbox),
        MxuMeta(t, nc, supported,
                tuple(int(r) for r in textured_rows)))


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------

def _make_mxu_kernel(*, n_tris, nc, n_sph_pad, have_tris, have_sph,
                     max_bounces, max_frames, textured, width, height,
                     emit_hitrec=False, ray_tile=None):
    ray_tile = ray_tile or RAY_TILE
    s_sub = ray_tile // 128
    shape = (s_sub, 128)
    # internal-split probe (scripts/mxu_probe.py): disables one stage per
    # build (comma-separated to combine) so wall-clock deltas isolate
    # stages.  Production = unset.
    _probe = frozenset(
        p for p in os.environ.get("RTM_MXU_PROBE", "").split(",") if p)

    class _P:
        def __eq__(self, other):
            return other in _probe

        def __ne__(self, other):
            return other not in _probe

    probe = _P()

    def kernel(*refs):
        it = iter(refs)
        camf = next(it)                       # (1,64) f32 SMEM
        fidx = next(it)                       # (1,1)  u32 SMEM
        pix0 = next(it)                       # (1,1)  i32 SMEM
        if have_tris:
            pair_ref = next(it)               # (NC, Q*128, KS) bf16
            attr_ref = next(it)               # (A_ROWS, NC, 8, 128) f32
            info_ref = next(it)               # (NC, 8, 128) i32
            cbox_ref = next(it)               # (NC, 8) f32 SMEM chunk boxes
        mat_tab = next(it)                    # (M_ROWS,8,128) f32
        if textured:
            tex_tab = next(it)                # (X_ROWS,8,128) f32
        if have_sph:
            sph_tab = next(it)                # (SP_ROWS,8,128) f32
            sph_smem = next(it)               # (S_pad,16) f32 SMEM
        color_ref = next(it)                  # (8,8,128)
        miss_ref = next(it)                   # (8*F,8,128)
        rec_ref = next(it) if textured else None   # (8*F*B,8,128)
        hitrec_ref = next(it) if emit_hitrec else None  # (F*B,8,128) i32
        rayf = next(it)                       # (K,8,128) f32 scratch
        rayb = next(it)                       # (KS,8,128) bf16 scratch
        acc_ref = next(it)                    # (Q*128,1024) f32 scratch
        best_ref = next(it)                   # (8,1024) f32 scratch
        wattr_ref = next(it)                  # (A_ROWS,S,128) f32 scratch
        winf_ref = next(it)                   # (S,128) i32 scratch

        if textured:
            rec_ref[:, :, :] = jnp.zeros(
                (8 * max_frames * max_bounces,) + shape, jnp.float32)
            for fb in range(max_frames * max_bounces):
                rec_ref[fb * 8 + 6] = jnp.full(shape, -1.0, jnp.float32)

        frame_index = fidx[0, 0]
        srow = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        lrow = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        base = pl.program_id(0) * ray_tile + pix0[0, 0]
        lin = base + srow * 128 + lrow
        if use_block8(width, height):
            xpix, ypix = slot_to_xy(lin, width)
        else:
            xpix = lin % width
            ypix = lin // width
        lin_u = (ypix * width + xpix).astype(U32)            # shader:697

        basis = camera_frame(camf, width, height, xpix, ypix)
        if have_tris:
            rayf[9] = jnp.ones(shape, jnp.float32)
            for j in range(10, K):
                rayf[j] = jnp.zeros(shape, jnp.float32)
            rowi = jax.lax.broadcasted_iota(jnp.int32, (8, ray_tile), 0)

        col_r = jnp.zeros(shape, jnp.float32)
        col_g = jnp.zeros(shape, jnp.float32)
        col_b = jnp.zeros(shape, jnp.float32)

        def nearest_tri_mxu(ox, oy, oz, dx, dy, dz, alive):
            """All-pairs matmul sweep with per-chunk culling: returns
            (got, win_idx) as (8,128) values in ray-vreg layout.

            Culling: Morton-ordered chunks are spatially compact, so a
            slab test of every live lane against each chunk bbox builds a
            per-lane chunk bitmask; an OR-tree over lanes/sublanes (lane
            rolls) collapses it to ONE scalar read, and chunks no live
            lane can touch skip their matmul + min-sweep entirely (the
            round-2 census: secondary bounces still need ~65-70% of the
            scene, but primary tiles need only the chunks their frustum
            crosses)."""
            mx, my, mz = _cross(ox, oy, oz, dx, dy, dz)
            rayf[0] = dx
            rayf[1] = dy
            rayf[2] = dz
            rayf[3] = mx
            rayf[4] = my
            rayf[5] = mz
            rayf[6] = ox
            rayf[7] = oy
            rayf[8] = oz
            # bf16x3 ray-side stack [B_hi; B_lo; B_hi] (see KS docstring)
            b32 = rayf[...]
            b_hi = b32.astype(jnp.bfloat16)
            b_lo = (b32 - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            rayb[0:K] = b_hi
            rayb[K:2 * K] = b_lo
            rayb[2 * K:3 * K] = b_hi
            rm = rayb[...].reshape(KS, ray_tile)
            best_ref[...] = jnp.full((8, ray_tile), BIG, jnp.float32)

            # ---- chunk cull mask (one scalar sync per bounce) ----------
            inv_dx, inv_dy, inv_dz = _safe_inv_dirs(dx, dy, dz)
            lanemask = jnp.zeros(shape, jnp.int32)
            for c in range(nc if probe != "nocull" else 0):
                t1x = (cbox_ref[c, 0] - ox) * inv_dx
                t2x = (cbox_ref[c, 3] - ox) * inv_dx
                t1y = (cbox_ref[c, 1] - oy) * inv_dy
                t2y = (cbox_ref[c, 4] - oy) * inv_dy
                t1z = (cbox_ref[c, 2] - oz) * inv_dz
                t2z = (cbox_ref[c, 5] - oz) * inv_dz
                tn = jnp.maximum(
                    jnp.maximum(jnp.minimum(t1x, t2x),
                                jnp.minimum(t1y, t2y)),
                    jnp.minimum(t1z, t2z))
                tf = jnp.minimum(
                    jnp.minimum(jnp.maximum(t1x, t2x),
                                jnp.maximum(t1y, t2y)),
                    jnp.maximum(t1z, t2z))
                hit_c = (tf >= 0.0) & (tn <= tf) & alive
                lanemask = jnp.bitwise_or(
                    lanemask, hit_c.astype(jnp.int32) << c)
            if probe != "nocull":
                for sh in (1, 2, 4, 8, 16, 32, 64):
                    lanemask = jnp.bitwise_or(
                        lanemask, jnp.roll(lanemask, sh, axis=1))
                sh = 1
                while sh < s_sub:
                    lanemask = jnp.bitwise_or(
                        lanemask, jnp.roll(lanemask, sh, axis=0))
                    sh *= 2
                cmask = lanemask[0, 0]

            def matmul_into(dst, c):
                # bf16 inputs, f32 accumulate: one MXU pass over the
                # KS-stacked operands IS the bf16x3 algorithm (the KS
                # docstring above); measured f32-parity radiance where
                # the naive f32 DEFAULT (bf16x1) drifted +3%
                dst[...] = jax.lax.dot_general(
                    pair_ref[c], rm, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)

            def sweep8(acc, c, best):
                """16x8-row min-chain over one chunk's matmul output."""
                for t0 in range(0, 128, 8):
                    s1 = acc[t0:t0 + 8]
                    s2 = acc[128 + t0:128 + t0 + 8]
                    s3 = acc[256 + t0:256 + t0 + 8]
                    td = acc[384 + t0:384 + t0 + 8]
                    det = s1 + s2 + s3
                    m = jnp.minimum(jnp.minimum(s1, s2),
                                    jnp.minimum(s3, td))
                    # clamp BELOW the 1e29 got-threshold: extreme td with
                    # det clamped at eps can overflow the approx
                    # reciprocal product to +inf, and inf survives the
                    # index-OR as NaN, which jnp.minimum PROPAGATES —
                    # turning every real hit for that ray into a miss
                    # (advisor r4).  1e28 keeps such degenerate grazers
                    # ordered and finite.
                    tt = jnp.minimum(
                        td * pl.reciprocal(
                            jnp.maximum(det, DET_EPS), approx=True),
                        np.float32(1e28))
                    # no det>eps here: padding rows self-exclude via their
                    # tdet=-1 constant (build_mxu_tables), and grazing
                    # det<=eps survivors are rejected by the exact winner
                    # retest like the production M-T
                    ok = m >= 0.0
                    ti = rowi + (c * 128 + t0)
                    packed = jax.lax.bitcast_convert_type(
                        jnp.bitwise_or(
                            jnp.bitwise_and(
                                jax.lax.bitcast_convert_type(
                                    tt, jnp.int32),
                                jnp.int32(~IDX_MASK)),
                            ti), jnp.float32)
                    best = jnp.minimum(best, jnp.where(ok, packed, BIG))
                return best

            if probe != "nocull":
                def chunk_bit(c):
                    return jnp.bitwise_and(
                        jax.lax.shift_right_logical(cmask, c), 1) != 0

            # Scheduling note (VERDICT r4 task 6, measured on the headline
            # frame): two restructures of this loop LOSE — (a) running the
            # min-chain as full (128, RAY_TILE) slab ops with a 128-row
            # best accumulator: 40.5 vs 39.9 ms (the 16x8 loop is already
            # element-bound, not overhead-bound); (b) double-buffering acc
            # so chunk c+1's matmul issues before chunk c's sweep: 45.1 vs
            # 39.9 ms (the pl.when chunk-cull blocks compile to scf.if
            # regions that serialize, so no MXU/VPU overlap materializes
            # and the extra control flow costs 13%).  Ledger:
            # ROOFLINE_r05.json.
            def chunk_work(c):
                if probe != "nomm":
                    matmul_into(acc_ref, c)
                if probe == "nosweep":
                    # consume ONE 8-row group so the matmul is not dead
                    best_ref[0:8] = jnp.minimum(best_ref[0:8],
                                                acc_ref[0:8])
                else:
                    best_ref[0:8] = sweep8(acc_ref, c, best_ref[0:8])

            if probe == "nocull":
                def chunk_body(c, _):
                    chunk_work(c)
                    return 0
            else:
                def chunk_body(c, _):
                    @pl.when(chunk_bit(c))
                    def _():
                        matmul_into(acc_ref, c)
                        best_ref[0:8] = sweep8(acc_ref, c, best_ref[0:8])
                    return 0

            jax.lax.fori_loop(0, nc, chunk_body, 0)
            bmin = jnp.min(best_ref[0:8].reshape(8, s_sub, 128), axis=0)
            got = bmin < np.float32(1e29)
            win = jnp.bitwise_and(
                jax.lax.bitcast_convert_type(bmin, jnp.int32),
                jnp.int32(IDX_MASK))
            cbit = None if probe == "nocull" else chunk_bit
            return got, jnp.clip(win, 0, max(n_tris - 1, 0)), cbit

        for frame in range(1, max_frames + 1):
            seed = lin_u + U32(frame) * frame_index * SEED_STRIDE
            ox, oy, oz, dx, dy, dz, seed = jittered_ray(seed, basis)

            ctr_r = jnp.ones(shape, jnp.float32)
            ctr_g = jnp.ones(shape, jnp.float32)
            ctr_b = jnp.ones(shape, jnp.float32)
            alive = jnp.ones(shape, jnp.bool_)
            m_dx = jnp.zeros(shape, jnp.float32)
            m_dy = jnp.zeros(shape, jnp.float32)
            m_dz = jnp.zeros(shape, jnp.float32)
            m_cr = jnp.zeros(shape, jnp.float32)
            m_cg = jnp.zeros(shape, jnp.float32)
            m_cb = jnp.zeros(shape, jnp.float32)

            for b in range(max_bounces):
                seed = seed + U32(b)                         # shader:659

                if have_sph and probe != "nosph":
                    t_sph, s_idx = sphere_nearest_smem(
                        sph_smem, n_sph_pad, shape, ox, oy, oz, dx, dy, dz)
                else:
                    t_sph = jnp.full(shape, BIG)
                    s_idx = jnp.zeros(shape, jnp.int32)

                if have_tris:
                    got, win, cbit = nearest_tri_mxu(ox, oy, oz, dx, dy,
                                                     dz, alive)
                    # winner attributes + EXACT t recovery (the packed t
                    # was approx-reciprocal + 11 masked mantissa bits,
                    # ordering-only).  NOTE the rejection scope (advisor
                    # r4): when the min-sweep winner fails the exact
                    # retest below (det_w <= eps or tdet_w < 0), the
                    # WHOLE ray falls back to its sphere/miss result for
                    # this bounce — the production M-T would instead
                    # return the second-best triangle.  Window ~2^-17
                    # grazing incidence; pinned by
                    # tests/test_mxu.py::test_grazing_winner_rejection.
                    if probe == "cheapgather":
                        # keep the DATAFLOW of the winner-attribute fetch
                        # (depends on win + the tables, feeds the same
                        # consumers with non-constant values) but replace
                        # the per-lane gathers with 2 cheap vreg ops each,
                        # so the delta vs full isolates the gather OPs
                        # without letting the compiler constant-fold the
                        # downstream shading (the nogather lesson).
                        wf = win.astype(jnp.float32) * 1e-30
                        w_nx = attr_ref[_A_NX, 0] + wf
                        w_ny = attr_ref[_A_NY, 0] + wf
                        w_nz = attr_ref[_A_NZ, 0] + wf
                        w_an = attr_ref[_A_ANDOT, 0] + wf
                        w_snx = attr_ref[_A_SNX, 0] + wf
                        w_sny = attr_ref[_A_SNY, 0] + wf
                        w_snz = attr_ref[_A_SNZ, 0] + wf
                        w_info = info_ref[0] + win
                    elif probe == "nogather":
                        one = jnp.ones(shape, jnp.float32)
                        zero0 = jnp.zeros(shape, jnp.float32)
                        w_nx = w_ny = zero0
                        w_nz = one
                        w_an = zero0
                        w_snx = w_sny = zero0
                        w_snz = one
                        w_info = jnp.full(shape, NO_TEX << 8, jnp.int32)
                    elif probe == "ghalf":
                        # marginal-cost probe: 5 of 8 lookups real, the
                        # shading normal faked cheaply — if the section
                        # cost is linear in lookup count, this lands at
                        # full - 3/8 * gather_section.
                        wlk = _mk_lookup(win, nc)
                        w_nx = wlk(lambda c: attr_ref[_A_NX, c])
                        w_ny = wlk(lambda c: attr_ref[_A_NY, c])
                        w_nz = wlk(lambda c: attr_ref[_A_NZ, c])
                        w_an = wlk(lambda c: attr_ref[_A_ANDOT, c])
                        w_snx = w_nx * 0.5
                        w_sny = w_ny * 0.5
                        w_snz = w_nz * 0.5
                        w_info = wlk(lambda c: info_ref[c])
                    elif probe == "gtree":
                        # ILP-friendly variant of _mk_lookup: all chunk
                        # gathers are independent, the merge is a masked
                        # AND/OR tree on the bitcast i32 values instead of
                        # the 15-deep serial where-chain.
                        lane_ = jnp.bitwise_and(win, 127)
                        wc_ = jax.lax.shift_right_logical(win, 7)
                        masks = [(wc_ == c).astype(jnp.int32) * (-1)
                                 for c in range(nc)]

                        def tree_lookup(get_chunk, as_f32=True):
                            parts = []
                            for c in range(nc):
                                g = jnp.take_along_axis(
                                    get_chunk(c), lane_, axis=1)
                                if as_f32:
                                    g = jax.lax.bitcast_convert_type(
                                        g, jnp.int32)
                                parts.append(
                                    jnp.bitwise_and(g, masks[c]))
                            while len(parts) > 1:
                                parts = [
                                    jnp.bitwise_or(parts[i],
                                                   parts[i + 1])
                                    if i + 1 < len(parts) else parts[i]
                                    for i in range(0, len(parts), 2)]
                            out = parts[0]
                            if as_f32:
                                out = jax.lax.bitcast_convert_type(
                                    out, jnp.float32)
                            return out

                        w_nx = tree_lookup(lambda c: attr_ref[_A_NX, c])
                        w_ny = tree_lookup(lambda c: attr_ref[_A_NY, c])
                        w_nz = tree_lookup(lambda c: attr_ref[_A_NZ, c])
                        w_an = tree_lookup(
                            lambda c: attr_ref[_A_ANDOT, c])
                        w_snx = tree_lookup(lambda c: attr_ref[_A_SNX, c])
                        w_sny = tree_lookup(lambda c: attr_ref[_A_SNY, c])
                        w_snz = tree_lookup(lambda c: attr_ref[_A_SNZ, c])
                        w_info = tree_lookup(lambda c: info_ref[c],
                                             as_f32=False)
                    elif probe == "gloop":
                        # pressure-minimizing variant: gather-accumulate
                        # through VMEM scratch, one chunk at a time, no
                        # lane-position state kept live across chunks.
                        wattr_ref[...] = jnp.zeros(
                            (A_ROWS,) + shape, jnp.float32)
                        winf_ref[...] = jnp.zeros(shape, jnp.int32)
                        wc_ = jax.lax.shift_right_logical(win, 7)
                        lane_ = jnp.bitwise_and(win, 127)

                        def gbody2(c, _):
                            inc = wc_ == c
                            for row in range(7):
                                g = jnp.take_along_axis(
                                    attr_ref[row, c], lane_, axis=1)
                                wattr_ref[row] = jnp.where(
                                    inc, g, wattr_ref[row])
                            gi = jnp.take_along_axis(
                                info_ref[c], lane_, axis=1)
                            winf_ref[...] = jnp.where(
                                inc, gi, winf_ref[...])
                            return 0

                        jax.lax.fori_loop(0, nc, gbody2, 0)
                        w_nx = wattr_ref[_A_NX]
                        w_ny = wattr_ref[_A_NY]
                        w_nz = wattr_ref[_A_NZ]
                        w_an = wattr_ref[_A_ANDOT]
                        w_snx = wattr_ref[_A_SNX]
                        w_sny = wattr_ref[_A_SNY]
                        w_snz = wattr_ref[_A_SNZ]
                        w_info = winf_ref[...]
                    elif probe == "gcull" and cbit is not None:
                        # chunk-CULLED winner-attribute fetch: a chunk no
                        # live lane can touch (cmask bit 0) cannot hold
                        # any ray's winner, so its 8 gathers are skipped
                        # entirely — the same mask that already skips its
                        # matmul + sweep.
                        wattr_ref[...] = jnp.zeros(
                            (A_ROWS,) + shape, jnp.float32)
                        winf_ref[...] = jnp.zeros(shape, jnp.int32)
                        wc_ = jax.lax.shift_right_logical(win, 7)
                        lane_ = jnp.bitwise_and(win, 127)

                        def gbody(c, _):
                            @pl.when(cbit(c))
                            def _():
                                inc = wc_ == c
                                for row in range(7):
                                    g = jnp.take_along_axis(
                                        attr_ref[row, c], lane_, axis=1)
                                    wattr_ref[row] = jnp.where(
                                        inc, g, wattr_ref[row])
                                gi = jnp.take_along_axis(
                                    info_ref[c], lane_, axis=1)
                                winf_ref[...] = jnp.where(
                                    inc, gi, winf_ref[...])
                            return 0

                        jax.lax.fori_loop(0, nc, gbody, 0)
                        w_nx = wattr_ref[_A_NX]
                        w_ny = wattr_ref[_A_NY]
                        w_nz = wattr_ref[_A_NZ]
                        w_an = wattr_ref[_A_ANDOT]
                        w_snx = wattr_ref[_A_SNX]
                        w_sny = wattr_ref[_A_SNY]
                        w_snz = wattr_ref[_A_SNZ]
                        w_info = winf_ref[...]
                    else:
                        wlk = _mk_lookup(win, nc)
                        w_nx = wlk(lambda c: attr_ref[_A_NX, c])
                        w_ny = wlk(lambda c: attr_ref[_A_NY, c])
                        w_nz = wlk(lambda c: attr_ref[_A_NZ, c])
                        w_an = wlk(lambda c: attr_ref[_A_ANDOT, c])
                        w_snx = wlk(lambda c: attr_ref[_A_SNX, c])
                        w_sny = wlk(lambda c: attr_ref[_A_SNY, c])
                        w_snz = wlk(lambda c: attr_ref[_A_SNZ, c])
                        w_info = wlk(lambda c: info_ref[c])
                    det_w = -(dx * w_nx + dy * w_ny + dz * w_nz)
                    tdet_w = ox * w_nx + oy * w_ny + oz * w_nz - w_an
                    t_ex = tdet_w / jnp.maximum(det_w, DET_EPS)
                    # sphere wins ties: triangle improve is strict <
                    use_tri = (got & alive & (det_w > DET_EPS)
                               & (tdet_w >= 0.0) & (t_ex < t_sph))
                    t_hit = _select(use_tri, t_ex, t_sph)
                    winfo = _select(use_tri, w_info,
                                    jnp.full(shape, NO_TEX << 8, jnp.int32))
                else:
                    use_tri = jnp.zeros(shape, jnp.bool_)
                    t_hit = t_sph
                    winfo = jnp.full(shape, NO_TEX << 8, jnp.int32)

                hit = alive & (t_hit < BIG)
                if emit_hitrec:
                    # packed winner identity for the record-replay
                    # differentiable path (diff/replay.py): bits 0..11 the
                    # primitive index, bit 14 = triangle, bit 15 = sphere
                    hr = jnp.zeros(shape, jnp.int32)
                    if have_tris:
                        orig = jnp.bitwise_and(
                            jax.lax.shift_right_logical(winfo, 16), 0x7FF)
                        hr = jnp.where(use_tri & alive,
                                       jnp.int32(HR_TRI) | orig, hr)
                    if have_sph:
                        hr = jnp.where(hit & (~use_tri),
                                       jnp.int32(HR_SPH) | s_idx, hr)
                    hitrec_ref[(frame - 1) * max_bounces + b] = hr
                t_safe = _select(hit, t_hit, 0.0)
                hx = ox + t_safe * dx
                hy = oy + t_safe * dy
                hz = oz + t_safe * dz

                use_t = use_tri.astype(jnp.float32)
                use_s = (hit & (~use_tri)).astype(jnp.float32)

                if have_tris:
                    mid = winfo & 0xFF
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
                    from .megakernel import _normalize
                    snx, sny, snz = _normalize(hx - scx, hy - scy, hz - scz)
                else:
                    zero = jnp.zeros(shape, jnp.float32)
                    s_al_r = s_al_g = s_al_b = zero
                    s_em_r = s_em_g = s_em_b = zero
                    s_emp = s_rough = s_metal = s_refr = zero
                    s_tex = zero - 1.0
                    snx = sny = snz = zero

                if have_tris:
                    nxh = w_snx * use_t + snx * use_s
                    nyh = w_sny * use_t + sny * use_s
                    nzh = w_snz * use_t + snz * use_s
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

                live = alive & hit
                miss_now = alive & (~hit)

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
                    s_r = ctr_r * _select(has_tex, emp, emr * emp) * livef
                    s_g = ctr_g * _select(has_tex, emp, emg * emp) * livef
                    s_b_ = ctr_b * _select(has_tex, emp, emb * emp) * livef
                    if have_tris:
                        slot = jnp.clip(jnp.bitwise_and(
                            jax.lax.shift_right_logical(winfo, 8), 0xFF),
                            0, 127)
                        xlk = _mk_lookup(slot, 1)
                        uu, vv = tex_uv(xlk, tex_tab, ox, oy, oz,
                                        dx, dy, dz)
                    else:
                        uu = vv = jnp.zeros(shape, jnp.float32)
                    ra = uu * use_t + snx * use_s
                    rb = vv * use_t + sny * use_s
                    rc = snz * use_s
                    row = ((frame - 1) * max_bounces + b) * 8
                    rec_ref[row + 0] = s_r
                    rec_ref[row + 1] = s_g
                    rec_ref[row + 2] = s_b_
                    rec_ref[row + 3] = ra
                    rec_ref[row + 4] = rb
                    rec_ref[row + 5] = rc
                    rec_ref[row + 6] = _select(has_tex, texid,
                                               jnp.float32(-1.0))
                    rec_ref[row + 7] = use_s * htf
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

                if probe == "mirrorscatter":
                    # dataflow-preserving cheap scatter: mirror reflect
                    # (depends on normal + hit point, no RNG draws)
                    ddn_p = dx * nxh + dy * nyh + dz * nzh
                    n_ox, n_oy, n_oz = hx, hy, hz
                    n_dx = dx - 2.0 * ddn_p * nxh
                    n_dy = dy - 2.0 * ddn_p * nyh
                    n_dz = dz - 2.0 * ddn_p * nzh
                    n_seed = seed + U32(1)
                elif probe == "noscatter":
                    n_ox, n_oy, n_oz = hx, hy, hz
                    n_dx, n_dy, n_dz, n_seed = dx, dy, dz, seed
                else:
                    (n_ox, n_oy, n_oz, n_dx, n_dy, n_dz,
                     n_seed) = scatter_step(
                        dx, dy, dz, nxh, nyh, nzh, hx, hy, hz,
                        rough, metal, refr, seed)

                ox = _select(live, n_ox, ox)
                oy = _select(live, n_oy, oy)
                oz = _select(live, n_oz, oz)
                dx = _select(live, n_dx, dx)
                dy = _select(live, n_dy, dy)
                dz = _select(live, n_dz, dz)
                seed = jnp.where(live, n_seed, seed)
                alive = live

            frow = (frame - 1) * 8
            miss_ref[frow + 0] = m_dx
            miss_ref[frow + 1] = m_dy
            miss_ref[frow + 2] = m_dz
            miss_ref[frow + 3] = m_cr
            miss_ref[frow + 4] = m_cg
            miss_ref[frow + 5] = m_cb
            miss_ref[frow + 6] = (
                (m_dx * m_dx + m_dy * m_dy + m_dz * m_dz) > 0.0
            ).astype(jnp.float32)
            miss_ref[frow + 7] = jnp.zeros(shape, jnp.float32)

        color_ref[0] = col_r
        color_ref[1] = col_g
        color_ref[2] = col_b
        for j in range(3, 8):
            color_ref[j] = jnp.zeros(shape, jnp.float32)

    return kernel


# ---------------------------------------------------------------------------
# Host-side driver: pallas_call + shared XLA post-pass
# ---------------------------------------------------------------------------

def render_rays_mxu(scene, cam: CameraSpec, frame_index, cfg: RenderConfig,
                    pixel_offset, n_rays: int, interpret: bool = False,
                    skip_postpass: bool = False, return_hitrec: bool = False,
                    ray_tile: int | None = None):
    """Trace dispatch slots [pixel_offset, pixel_offset + n_rays) — same
    contract as megakernel.render_rays_megakernel / render_rays_trav.

    return_hitrec=True additionally returns the (F*B, n_rays) i32 packed
    winner records (HR_TRI|idx / HR_SPH|idx / 0) that drive the
    record-replay differentiable path (diff/replay.py)."""
    w, h = cfg.width, cfg.height
    n = n_rays
    if ray_tile is None:
        if os.environ.get("RTM_MXU_TILE"):
            ray_tile = RAY_TILE
        else:
            # widest tile that divides the dispatch (no padding waste):
            # the r5 width A/B (MXU_SPLIT_r05.json) measured 4096 ~1.5 ms
            # faster than 1024 at the headline config — the per-bounce
            # serial phases amortize over S=tile/128 sublanes.
            ray_tile = next((t for t in (4096, 2048, 1024)
                             if n % t == 0), 1024)
    s_sub = ray_tile // 128
    n_pad = -(-n // ray_tile) * ray_tile
    n_tiles = n_pad // ray_tile
    bounces = cfg.max_bounces
    frames = cfg.max_frames
    textured = scene.any_textured

    ma = scene.mxu_arrays
    mm = scene.mxu_meta
    assert ma is not None and mm.supported, "scene unsupported by mxu"
    have_tris = mm.n_tris > 0
    have_sph = int(scene.sph_pos.shape[0]) > 0

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

    def rep_sub(tab):
        """Gather tables are sublane-REPLICATED (all 8 sublanes equal);
        widen the replication to the s_sub-sublane ray tile."""
        if s_sub == 8:
            return tab
        tab = jnp.asarray(tab)
        shp = tab.shape[:-2] + (s_sub, tab.shape[-1])
        return jnp.broadcast_to(tab[..., :1, :], shp)

    if have_tris:
        vmem_full(ma.pair)
        vmem_full(rep_sub(ma.attr))
        vmem_full(rep_sub(ma.info))
        in_specs.append(pl.BlockSpec(ma.cbox.shape, const2,
                                     memory_space=pltpu.SMEM))
        inputs.append(jnp.asarray(ma.cbox))
    vmem_full(rep_sub(traced_mat_tab(scene.materials)))
    if textured:
        vmem_full(rep_sub(traced_tex_tab(scene, mm.textured_rows)))
    n_sph_pad = 0
    if have_sph:
        sph_tab, sph_smem = traced_sph_tabs(scene)
        n_sph_pad = sph_smem.shape[0]
        vmem_full(rep_sub(sph_tab))
        in_specs.append(pl.BlockSpec((n_sph_pad, 16), const2,
                                     memory_space=pltpu.SMEM))
        inputs.append(sph_smem)

    out_shape = [jax.ShapeDtypeStruct((8, n_tiles * s_sub, 128),
                                      jnp.float32),
                 jax.ShapeDtypeStruct((8 * frames, n_tiles * s_sub, 128),
                                      jnp.float32)]
    out_specs = [pl.BlockSpec((8, s_sub, 128), lambda i: (0, i, 0),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec((8 * frames, s_sub, 128),
                              lambda i: (0, i, 0),
                              memory_space=pltpu.VMEM)]
    if textured:
        out_shape.append(jax.ShapeDtypeStruct(
            (8 * frames * bounces, n_tiles * s_sub, 128), jnp.float32))
        out_specs.append(pl.BlockSpec((8 * frames * bounces, s_sub, 128),
                                      lambda i: (0, i, 0),
                                      memory_space=pltpu.VMEM))
    if return_hitrec:
        out_shape.append(jax.ShapeDtypeStruct(
            (frames * bounces, n_tiles * s_sub, 128), jnp.int32))
        out_specs.append(pl.BlockSpec((frames * bounces, s_sub, 128),
                                      lambda i: (0, i, 0),
                                      memory_space=pltpu.VMEM))

    kernel = _make_mxu_kernel(
        n_tris=mm.n_tris, nc=mm.nc, n_sph_pad=n_sph_pad,
        have_tris=have_tris, have_sph=have_sph,
        max_bounces=bounces, max_frames=frames, textured=textured,
        width=w, height=h, emit_hitrec=return_hitrec,
        ray_tile=ray_tile)

    scratch = [
        pltpu.VMEM((K, s_sub, 128), jnp.float32),   # ray features f32
        pltpu.VMEM((KS, s_sub, 128), jnp.bfloat16),  # bf16x3 K-stack
        pltpu.VMEM((Q * 128, ray_tile), jnp.float32),   # matmul chunk out
        pltpu.VMEM((8, ray_tile), jnp.float32),     # packed best (8 rows)
        pltpu.VMEM((A_ROWS, s_sub, 128), jnp.float32),  # winner attrs
        pltpu.VMEM((s_sub, 128), jnp.int32),        # winner info
    ]

    try:
        cparams = pltpu.CompilerParams(dimension_semantics=("arbitrary",))
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

    outs = list(outs)
    hitrec = None
    if return_hitrec:
        hitrec = outs.pop().reshape(frames * bounces, n_pad)[:, :n]
    if textured:
        main, miss, rec = outs
        rec = rec.reshape(8 * frames * bounces, n_pad)
    else:
        main, miss = outs
        rec = None
    main = main.reshape(8, n_pad)
    miss = miss.reshape(8 * frames, n_pad)

    color = main[0:3, :n].T                              # (N,3)
    if skip_postpass:
        extra = jnp.sum(miss[:1, :1])
        if rec is not None:
            extra = extra + jnp.sum(rec[:1, :1])
        out = color + extra * jnp.float32(1e-30)
    else:
        out = mega_postpass(color, miss, rec, scene, cfg, n)
    if return_hitrec:
        return out, hitrec
    return out


def render_mxu(scene, cam: CameraSpec, frame_index, cfg: RenderConfig,
               interpret: bool = False):
    """Full-frame forward dispatch through the MXU kernel. Returns
    (H, W, 3) f32 radiance — same contract as render_megakernel."""
    from .megakernel import slots_to_image
    color = render_rays_mxu(
        scene, cam, frame_index, cfg, pixel_offset=jnp.int32(0),
        n_rays=cfg.width * cfg.height, interpret=interpret)
    if use_block8(cfg.width, cfg.height):
        return slots_to_image(color, cfg.width, cfg.height)
    return color.reshape(cfg.height, cfg.width, 3)
