"""Wavefront path tracing: per-bounce Pallas dispatch with ray sorting.

The fused megakernel (ops/pallas/megakernel.py) sweeps every triangle
cluster against every ray tile each bounce; its per-cluster cull is
*tile-uniform*, so it is only effective while the 512 rays of a tile agree
on which clusters matter.  Measured on the Cornell scene, the cull skips
most clusters at bounce 0 (coherent camera rays) but passes 90%+ of them
after the first diffuse bounce — the per-ray useful fraction is only ~29%
(README roadmap).  This module is roadmap step 1: a *wavefront* formulation
(the standard GPU decomposition — e.g. Laine et al., "Megakernels
Considered Harmful", HPG 2013 — re-shaped for TPU):

  * one Pallas kernel per bounce, processing ALL rays of the frame;
  * between bounces, XLA sorts the ray stream by a locality key
    (4-bit-per-axis Morton cell of the origin x direction octant), so the
    rays sharing a kernel tile traverse similar geometry and the
    tile-uniform cluster cull approaches per-ray effectiveness;
  * terminated rays sort to the end — whole tiles of dead rays skip every
    cluster pass via the same cull cond;
  * per-ray state (origin, direction, PCG seed, material-albedo partial
    product, alive mask) is a (16, N) f32 band in HBM, streamed through
    VMEM tile by tile; the u32 seed rides bitcast in an f32 row;
  * shading records (the megakernel's deferred-texture encoding) are
    consumed by XLA immediately after each bounce: texture/sky gathers,
    which Mosaic cannot express (no per-lane gather), run per bounce at
    full XLA gather throughput, and the sky term uses the running texture
    partial product at the *miss* bounce (identical semantics to the
    megakernel's end-of-frame reconstruction).

Numeric semantics are the megakernel's bit-for-bit: same PCG stream
(shader:123-151 / ops/rng.py), same seed schedule (shader:659,697), same
Möller-Trumbore factoring and approx-reciprocal ordering with exact-t
recovery, same scatter/dielectric rules (shader:590-649).  Sorting only
permutes lanes; per-ray arithmetic is order-independent, so wavefront and
megakernel images agree to f32 tolerance.

Forward-only (like the megakernel); autodiff uses the XLA path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import RenderConfig
from ...models.camera import CameraSpec
from ...models.scene import TracerScene
from .. import rng
from ..intersect import DET_EPS
from ..shade import OFFSET, sample_texture_quads, sky_color_quads
from .megakernel import (BIG, CLUSTER, NUM_ATTRS, PI, TWO_PI, U32,
                         _A_ABX, _A_ABY, _A_ABZ, _A_ACX, _A_ACY, _A_ACZ,
                         _A_ALB, _A_ALG, _A_ALR, _A_EMB, _A_EMG, _A_EMP,
                         _A_EMR, _A_GAN, _A_GNX, _A_GNY, _A_GNZ, _A_LAX,
                         _A_LAY, _A_LAZ, _A_METAL, _A_NX, _A_NY, _A_NZ,
                         _A_REFR, _A_ROUGH, _A_TEX, _A_U0, _A_U1, _A_U2,
                         _A_V0, _A_V1, _A_V2, _F_ABX, _F_ABY, _F_ABZ,
                         _F_ACX, _F_ACY, _F_ACZ, _F_AN, _F_G1X, _F_G1Y,
                         _F_G1Z, _F_G2X, _F_G2Y, _F_G2Z, _F_NX, _F_NY,
                         _F_NZ, _S_ALB, _S_ALG, _S_ALR, _S_CX, _S_CY, _S_CZ,
                         _S_EMB, _S_EMG, _S_EMP, _S_EMR, _S_METAL, _S_R,
                         _S_REFR, _S_ROUGH, _S_TEX, _cross, _dot, _normalize,
                         _pack_camera, _rand, _select, _tri_sweep,
                         build_mega_pack, slot_to_xy, slots_to_image,
                         use_block8)
from ..trace_ref import camera_ray_basis

DEFAULT_RAY_TILE = 512

# state-band rows (16, N) f32
_R_OX, _R_OY, _R_OZ = 0, 1, 2
_R_DX, _R_DY, _R_DZ = 3, 4, 5
_R_SEED = 6                 # u32 bitcast in f32 bits
_R_CR, _R_CG, _R_CB = 7, 8, 9
_R_ALIVE = 10               # 1.0 alive / 0.0 dead
STATE_ROWS = 16

# record rows (8, N): the megakernel's deferred-texture encoding
_REC_SR, _REC_SG, _REC_SB = 0, 1, 2     # S_b = P^m * emission-known term
_REC_A, _REC_B, _REC_C = 3, 4, 5        # tri (u,v,0) / sphere unit normal
_REC_TEX = 6                            # texture id or -1
_REC_SFLAG = 7                          # sphere-with-texture flag


def _make_bounce_kernel(*, ray_tile, cluster_offsets, cluster_widths, n_sph,
                        cull):
    """One path-tracing bounce over a tile of the sorted ray stream."""
    r = ray_tile
    have_tris = len(cluster_widths) > 0
    tp_total = sum(cluster_widths)
    have_sph = n_sph > 0

    def kernel(*refs):
        it = iter(refs)
        bidx = next(it)                       # (1,1) u32 SMEM: bounce number
        feats = next(it) if have_tris else None
        attrs = next(it) if have_tris else None
        boxes = next(it) if have_tris else None
        sph = next(it) if have_sph else None
        st = next(it)                         # (16, r) state in
        out = next(it)                        # (16, r) state out
        rec = next(it)                        # (8, r)  shading record
        t_scr = next(it) if have_tris else None   # (1, r) f32 sweep scratch
        i_scr = next(it) if have_tris else None   # (1, r) i32

        ox, oy, oz = st[0:1, :], st[1:2, :], st[2:3, :]
        dx, dy, dz = st[3:4, :], st[4:5, :], st[5:6, :]
        seed = pltpu.bitcast(st[_R_SEED:_R_SEED + 1, :], U32)
        ctr_r = st[_R_CR:_R_CR + 1, :]
        ctr_g = st[_R_CG:_R_CG + 1, :]
        ctr_b = st[_R_CB:_R_CB + 1, :]
        alive = st[_R_ALIVE:_R_ALIVE + 1, :] > 0.5
        seed = seed + bidx[0, 0]                              # shader:659

        if have_tris:
            tri_rows = jax.lax.broadcasted_iota(jnp.int32, (tp_total, r), 0)
        if have_sph:
            srow = jax.lax.broadcasted_iota(jnp.int32, (n_sph, r), 0)

        # ---- nearest triangle: culled SAH-cluster sweep (shared helper) --
        wx, wy, wz = _cross(ox, oy, oz, dx, dy, dz)
        t_tri = jnp.full((1, r), BIG)
        i_tri = jnp.full((1, r), -1, jnp.int32)
        if have_tris:
            _tri_sweep(
                feats, boxes, cluster_offsets, cluster_widths, r,
                ox, oy, oz, dx, dy, dz, wx, wy, wz, alive, cull,
                t_scr, i_scr)
            t_tri = t_scr[:, :]
            i_tri = i_scr[:, :]

        # ---- nearest sphere (shader:486-524) -----------------------------
        t_sph = jnp.full((1, r), BIG)
        if have_sph:
            g = lambda j: sph[:, j:j + 1]                      # (S',1)
            ocx = ox - g(_S_CX)
            ocy = oy - g(_S_CY)
            ocz = oz - g(_S_CZ)
            a_q = dx * dx + dy * dy + dz * dz
            b_q = 2.0 * (ocx * dx + ocy * dy + ocz * dz)
            c_q = ocx * ocx + ocy * ocy + ocz * ocz - g(_S_R) * g(_S_R)
            delta = b_q * b_q - 4.0 * a_q * c_q
            okd = delta >= 0.0
            tq = (-b_q - jnp.sqrt(_select(okd, delta, 0.0))) / (2.0 * a_q)
            ok = okd & (tq >= 0.0)
            ts = _select(ok, tq, BIG)                          # (S',R)
            t_sph = jnp.min(ts, axis=0, keepdims=True)
            scand = jnp.min(_select(ts == t_sph, srow, jnp.int32(2 ** 30)),
                            axis=0, keepdims=True)
            s_onehot = (srow == scand) & (t_sph < BIG)

        use_tri = t_tri < t_sph
        t_hit = _select(use_tri, t_tri, t_sph)
        hit = t_hit < BIG

        # ---- attribute fetch (one-hot MXU extraction) --------------------
        if have_tris:
            onehot = ((tri_rows == i_tri) & use_tri & alive
                      ).astype(jnp.bfloat16)                   # (T',R)
            # 3 native bf16 passes reconstruct the exact f32 attribute
            # (Dekker split in build_mega_pack)
            ext = (jnp.dot(attrs[0], onehot,
                           preferred_element_type=jnp.float32)
                   + jnp.dot(attrs[1], onehot,
                             preferred_element_type=jnp.float32)
                   + jnp.dot(attrs[2], onehot,
                             preferred_element_type=jnp.float32))
            e = lambda j: ext[j:j + 1, :]                      # (1,R)
            gden = -(dx * e(_A_GNX) + dy * e(_A_GNY) + dz * e(_A_GNZ))
            t_ex = (ox * e(_A_GNX) + oy * e(_A_GNY) + oz * e(_A_GNZ)
                    - e(_A_GAN)) / _select(gden == 0.0, jnp.float32(1.0),
                                           gden)
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
            sx = lambda j: jnp.sum(smask * g(j), axis=0, keepdims=True)
        else:
            zero_s = jnp.zeros((1, r), jnp.float32)
            sx = lambda j: zero_s

        use_t = use_tri.astype(jnp.float32)
        use_s = (hit & (~use_tri)).astype(jnp.float32)

        if have_sph:
            scx, scy, scz = sx(_S_CX), sx(_S_CY), sx(_S_CZ)
            snx, sny, snz = _normalize(hx - scx, hy - scy, hz - scz)
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

        # ---- shading record (megakernel textured encoding) ---------------
        has_tex = (texid > -0.5) & live
        livef = live.astype(jnp.float32)
        htf = has_tex.astype(jnp.float32)
        s_r = ctr_r * _select(has_tex, emp, emr * emp) * livef
        s_g = ctr_g * _select(has_tex, emp, emg * emp) * livef
        s_b_ = ctr_b * _select(has_tex, emp, emb * emp) * livef
        aox = ox - e(_A_LAX)
        aoy = oy - e(_A_LAY)
        aoz = oz - e(_A_LAZ)
        dax, day, daz = _cross(aox, aoy, aoz, dx, dy, dz)
        nvx, nvy, nvz = _cross(e(_A_ABX), e(_A_ABY), e(_A_ABZ),
                               e(_A_ACX), e(_A_ACY), e(_A_ACZ))
        detl = -(dx * nvx + dy * nvy + dz * nvz)
        invl = 1.0 / _select(detl == 0.0, jnp.float32(1.0), detl)
        ub = (e(_A_ACX) * dax + e(_A_ACY) * day + e(_A_ACZ) * daz) * invl
        vb = -(e(_A_ABX) * dax + e(_A_ABY) * day + e(_A_ABZ) * daz) * invl
        wb = 1.0 - ub - vb
        uu = e(_A_U0) * wb + e(_A_U1) * ub + e(_A_U2) * vb
        vv = e(_A_V0) * wb + e(_A_V1) * ub + e(_A_V2) * vb
        ra = uu * use_t + snx * use_s
        rb = vv * use_t + sny * use_s
        rc = snz * use_s
        rec[_REC_SR:_REC_SR + 1, :] = s_r
        rec[_REC_SG:_REC_SG + 1, :] = s_g
        rec[_REC_SB:_REC_SB + 1, :] = s_b_
        rec[_REC_A:_REC_A + 1, :] = ra
        rec[_REC_B:_REC_B + 1, :] = rb
        rec[_REC_C:_REC_C + 1, :] = rc
        rec[_REC_TEX:_REC_TEX + 1, :] = _select(has_tex, texid,
                                                jnp.float32(-1.0))
        rec[_REC_SFLAG:_REC_SFLAG + 1, :] = use_s * htf

        # P^m *= (tex ? 1 : albedo)
        keep = 1.0 - livef * (1.0 - htf)
        ctr_r = ctr_r * (keep + livef * (1.0 - htf) * alr)
        ctr_g = ctr_g * (keep + livef * (1.0 - htf) * alg)
        ctr_b = ctr_b * (keep + livef * (1.0 - htf) * alb)

        # ---- scatter (shader:590-649) -------------------------------------
        d_dot_n = _dot(dx, dy, dz, nxh, nyh, nzh)
        is_refract = refr > 1.0
        is_front = d_dot_n < 0.0
        rt = _select(is_front,
                     1.0 / _select(refr == 0.0, jnp.float32(1.0), refr),
                     refr)
        hnx = _select(is_front, nxh, -nxh)
        hny = _select(is_front, nyh, -nyh)
        hnz = _select(is_front, nzh, -nzh)
        cos_t = jnp.minimum(-_dot(dx, dy, dz, hnx, hny, hnz), 1.0)
        sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 1e-12))
        cannot = rt * sin_t > 1.0
        r0 = ((1.0 - rt) / (1.0 + rt)) ** 2
        omc = 1.0 - cos_t
        r0p = r0 + (1.0 - r0) * omc * omc * omc * omc * omc
        rr, seed_refr = _rand(seed)
        do_refl = cannot | (r0p > rr)
        ddh = _dot(dx, dy, dz, hnx, hny, hnz)
        rfx = dx - 2.0 * ddh * hnx
        rfy = dy - 2.0 * ddh * hny
        rfz = dz - 2.0 * ddh * hnz
        kk = 1.0 - rt * rt * (1.0 - ddh * ddh)
        sq = jnp.sqrt(jnp.maximum(kk, 1e-12))
        rxx = rt * dx - (rt * ddh + sq) * hnx
        rxy = rt * dy - (rt * ddh + sq) * hny
        rxz = rt * dz - (rt * ddh + sq) * hnz
        okk = kk >= 0.0
        rxx = _select(okk, rxx, 0.0)
        rxy = _select(okk, rxy, 0.0)
        rxz = _select(okk, rxz, 0.0)
        o_rx = _select(do_refl, hx + hnx * OFFSET, hx - hnx * OFFSET)
        o_ry = _select(do_refl, hy + hny * OFFSET, hy - hny * OFFSET)
        o_rz = _select(do_refl, hz + hnz * OFFSET, hz - hnz * OFFSET)
        d_rx = _select(do_refl, rfx, rxx)
        d_ry = _select(do_refl, rfy, rxy)
        d_rz = _select(do_refl, rfz, rxz)

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

        out[0:1, :] = _select(live, n_ox, ox)
        out[1:2, :] = _select(live, n_oy, oy)
        out[2:3, :] = _select(live, n_oz, oz)
        out[3:4, :] = _select(live, n_dx, dx)
        out[4:5, :] = _select(live, n_dy, dy)
        out[5:6, :] = _select(live, n_dz, dz)
        out[_R_SEED:_R_SEED + 1, :] = pltpu.bitcast(
            jnp.where(live, n_seed, seed), jnp.float32)
        out[_R_CR:_R_CR + 1, :] = ctr_r
        out[_R_CG:_R_CG + 1, :] = ctr_g
        out[_R_CB:_R_CB + 1, :] = ctr_b
        out[_R_ALIVE:_R_ALIVE + 1, :] = livef
        for j in range(_R_ALIVE + 1, STATE_ROWS):
            out[j:j + 1, :] = jnp.zeros((1, r), jnp.float32)

    return kernel


def _bounce_call(pack, state, bounce, *, ray_tile, cull, interpret):
    """Dispatch one bounce kernel over the whole (16, Np) state band."""
    n_pad = state.shape[1]
    n_tiles = n_pad // ray_tile
    const = lambda i: (0, 0)
    in_specs = [pl.BlockSpec((1, 1), const, memory_space=pltpu.SMEM)]
    inputs = [jnp.asarray(bounce, jnp.uint32).reshape(1, 1)]
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
    if pack.n_spheres_padded > 0:
        in_specs.append(pl.BlockSpec((pack.n_spheres_padded, 16), const,
                                     memory_space=pltpu.VMEM))
        inputs.append(pack.spheres)
    in_specs.append(pl.BlockSpec((STATE_ROWS, ray_tile), lambda i: (0, i),
                                 memory_space=pltpu.VMEM))
    inputs.append(state)

    kernel = _make_bounce_kernel(
        ray_tile=ray_tile, cluster_offsets=pack.cluster_offsets,
        cluster_widths=pack.cluster_widths,
        n_sph=pack.n_spheres_padded, cull=cull)

    try:
        cparams = pltpu.CompilerParams(dimension_semantics=("arbitrary",))
    except TypeError:                                         # older jax
        cparams = None

    scratch = []
    if pack.n_clusters > 0:
        scratch = [pltpu.VMEM((1, ray_tile), jnp.float32),
                   pltpu.VMEM((1, ray_tile), jnp.int32)]

    new_state, rec = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=(pl.BlockSpec((STATE_ROWS, ray_tile), lambda i: (0, i),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((8, ray_tile), lambda i: (0, i),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((STATE_ROWS, n_pad), jnp.float32),
                   jax.ShapeDtypeStruct((8, n_pad), jnp.float32)),
        scratch_shapes=scratch,
        interpret=interpret,
        **({"compiler_params": cparams} if cparams else {}),
    )(*inputs)
    return new_state, rec


def _scene_bounds(scene: TracerScene):
    """World AABB for the sort-key grid (traced; tiny)."""
    los, his = [], []
    if scene.num_triangles > 0:
        v = jnp.concatenate([scene.tri_wa, scene.tri_wb, scene.tri_wc], 0)
        los.append(v.min(axis=0))
        his.append(v.max(axis=0))
    if scene.num_spheres > 0:
        r = scene.sph_radius[:, None]
        los.append((scene.sph_pos - r).min(axis=0))
        his.append((scene.sph_pos + r).max(axis=0))
    if not los:
        return jnp.zeros((3,)), jnp.ones((3,))
    lo = functools.reduce(jnp.minimum, los)
    hi = functools.reduce(jnp.maximum, his)
    return lo, hi


def _sort_perm(state, lo, hi):
    """Locality permutation: Morton(origin cell, 4 bits/axis) x direction
    octant; dead rays to the end.  Returns perm (Np,) i32."""
    n = state.shape[1]
    o = state[0:3, :]
    d = state[3:6, :]
    alive = state[_R_ALIVE, :] > 0.5
    ext = jnp.maximum(hi - lo, 1e-6)
    cell = jnp.clip(((o - lo[:, None]) / ext[:, None] * 16.0)
                    .astype(jnp.int32), 0, 15)                # (3,N)
    m = jnp.zeros((n,), jnp.int32)
    for bit in range(4):
        for ax in range(3):
            m = m | (((cell[ax] >> bit) & 1) << (3 * bit + ax))
    octant = ((d[0] > 0).astype(jnp.int32)
              | ((d[1] > 0).astype(jnp.int32) << 1)
              | ((d[2] > 0).astype(jnp.int32) << 2))
    key = (m << 3) | octant
    key = jnp.where(alive, key, jnp.int32(2 ** 30))
    iota = jax.lax.iota(jnp.int32, n)
    _, perm = jax.lax.sort((key, iota), num_keys=1)
    return perm


def render_rays_wavefront(scene: TracerScene, cam: CameraSpec, frame_index,
                          cfg: RenderConfig, pixel_offset, n_rays: int,
                          ray_tile: int = DEFAULT_RAY_TILE,
                          cull: bool = True, sort_from: int = 1,
                          interpret: bool = False):
    """Trace row-major pixels [pixel_offset, pixel_offset + n_rays) with the
    wavefront pipeline.  Returns (n_rays, 3) radiance averaged over
    cfg.max_frames samples — same contract as render_rays_megakernel.
    sort_from: first bounce before which the ray stream is re-sorted
    (camera rays are already coherent, so the default skips bounce 0).
    """
    w, h = cfg.width, cfg.height
    n = n_rays
    r = ray_tile
    n_pad = -(-n // r) * r
    frames = cfg.max_frames
    textured = scene.any_textured
    draw_env = jnp.float32(1.0 if cfg.draw_environment else 0.0)

    pack = build_mega_pack(scene)
    lo, hi = _scene_bounds(scene)
    frame_index = jnp.asarray(frame_index, jnp.uint32)

    lin = jnp.arange(n_pad, dtype=jnp.int32) + jnp.asarray(pixel_offset,
                                                           jnp.int32)
    if use_block8(w, cfg.height):
        x, y = slot_to_xy(lin, w)      # 8x8-block slot order (megakernel.py)
    else:
        x = lin % w
        y = lin // w
    in_range = jax.lax.iota(jnp.int32, n_pad) < n
    focus_point, right, up, position = camera_ray_basis(cam, cfg, x, y)
    res = jnp.array([w, h], jnp.float32)

    out_color = jnp.zeros((3, n_pad), jnp.float32)
    for frame in range(1, frames + 1):
        # camera jitters: bit-exact reference stream (shader:695-706)
        seed = rng.pixel_seed(x, y, w, frame, frame_index)
        focus_jitter, seed = rng.random_circle_point(seed)
        focus_jitter = focus_jitter / res * cam.defocus_strength
        dev_jitter, seed = rng.random_circle_point(seed)
        dev_jitter = dev_jitter / res * cam.blur_strength
        dev_focus = (focus_point
                     + dev_jitter[:, :1] * right[None, :]
                     + dev_jitter[:, 1:2] * up[None, :])
        origin = (position[None, :]
                  + focus_jitter[:, :1] * right[None, :]
                  + focus_jitter[:, 1:2] * up[None, :])
        delta = dev_focus - origin
        dnorm = delta / jnp.linalg.norm(delta, axis=-1, keepdims=True)

        state = jnp.zeros((STATE_ROWS, n_pad), jnp.float32)
        state = state.at[0:3, :].set(origin.T)
        state = state.at[3:6, :].set(dnorm.T)
        state = state.at[_R_SEED, :].set(
            jax.lax.bitcast_convert_type(seed, jnp.float32))
        state = state.at[_R_CR:_R_CB + 1, :].set(1.0)
        state = state.at[_R_ALIVE, :].set(in_range.astype(jnp.float32))

        color = jnp.zeros((3, n_pad), jnp.float32)
        ptex = jnp.ones((3, n_pad), jnp.float32)
        pix = jax.lax.iota(jnp.int32, n_pad)

        for b in range(cfg.max_bounces):
            if b >= sort_from:
                perm = _sort_perm(state, lo, hi)
                state = jnp.take(state, perm, axis=1)
                color = jnp.take(color, perm, axis=1)
                ptex = jnp.take(ptex, perm, axis=1)
                pix = jnp.take(pix, perm)

            prev_alive = state[_R_ALIVE, :] > 0.5
            new_state, rec = _bounce_call(pack, state, b, ray_tile=r,
                                          cull=cull, interpret=interpret)
            new_alive = new_state[_R_ALIVE, :] > 0.5

            # emission + texture reconstruction (megakernel post-pass,
            # applied per bounce)
            s_term = rec[0:3, :]                               # (3,N)
            term = s_term * ptex
            if textured:
                ra = rec[_REC_A, :]
                rb = rec[_REC_B, :]
                rc = rec[_REC_C, :]
                texid = rec[_REC_TEX, :]
                sflag = rec[_REC_SFLAG, :]
                has_tex = texid > -0.5
                uu = jnp.where(sflag > 0.5,
                               jnp.arctan2(rc, ra) / TWO_PI + 0.5, ra)
                vv = jnp.where(
                    sflag > 0.5,
                    jnp.arcsin(jnp.clip(rb, -1.0 + 1e-6, 1.0 - 1e-6))
                    / PI + 0.5, rb)
                # untextured lanes: tap row 0 (random-row gathers are
                # latency-bound — see megakernel post-pass)
                uu = jnp.where(has_tex, uu, 0.0)
                vv = jnp.where(has_tex, vv, 0.0)
                tid = jnp.where(has_tex, texid.astype(jnp.int32), 0)
                tex_rgb = sample_texture_quads(
                    scene.tex_quads, scene.tex_size,
                    scene.textures.shape[1], scene.textures.shape[2],
                    tid, uu, vv).T                              # (3,N)
                color = color + jnp.where(has_tex[None, :],
                                          term * tex_rgb, term)
                ptex = ptex * jnp.where(has_tex[None, :], tex_rgb, 1.0)
            else:
                color = color + term

            # sky on this bounce's misses (shader:663-666); direction and
            # P^m are untouched by the kernel for missed lanes
            miss_now = prev_alive & ~new_alive
            mdir = jnp.where(miss_now[None, :], new_state[3:6, :],
                             jnp.array([[1.0], [0.0], [0.0]], jnp.float32))
            mctr = new_state[_R_CR:_R_CB + 1, :]
            sky_rgb = sky_color_quads(mdir.T, scene.sky_quads,
                                      scene.sky.shape[0],
                                      scene.sky.shape[1]).T    # (3,N)
            sky_term = mctr * sky_rgb * draw_env * ptex
            color = color + jnp.where(miss_now[None, :], sky_term, 0.0)
            state = new_state

        out_color = out_color.at[:, pix].add(color)

    return (out_color[:, :n] / jnp.float32(frames)).T          # shader:711


def render_wavefront(scene: TracerScene, cam: CameraSpec, frame_index,
                     cfg: RenderConfig, ray_tile: int = DEFAULT_RAY_TILE,
                     cull: bool = True, sort_from: int = 1,
                     interpret: bool = False):
    """Full-frame wavefront dispatch.  Returns (H, W, 3) f32 — same contract
    as render_megakernel / render_dispatch."""
    color = render_rays_wavefront(
        scene, cam, frame_index, cfg, pixel_offset=jnp.int32(0),
        n_rays=cfg.width * cfg.height, ray_tile=ray_tile, cull=cull,
        sort_from=sort_from, interpret=interpret)
    if use_block8(cfg.width, cfg.height):
        return slots_to_image(color, cfg.width, cfg.height)
    return color.reshape(cfg.height, cfg.width, 3)
