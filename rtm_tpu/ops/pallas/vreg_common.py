"""Shared (8,128)-vreg bounce semantics for the per-lane Pallas kernels.

The trav kernel (round 3) and the mxu kernel (round 4) share everything
except the nearest-triangle search: camera ray generation with both
jitters (shader:684-706), the bit-exact PCG jitter draws, the
scatter step (shader:590-649), the material/sphere attribute-row fetch,
and the textured-UV recovery (shader:257-268).  Round 2 retired the
original wavefront backend precisely because three synchronized copies of
these semantics were maintenance drag — this module keeps the per-lane
copy SINGLE.  All functions are pure maps over (8,128) f32/i32 values
(one vreg = 1024 rays) and run identically under Pallas interpret mode.

Reference citations live with each function; semantics match
ops/pallas/megakernel.py's tile code paths bit-for-bit (same _rand
stream, same op order).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .megakernel import (BIG, TWO_PI, U32, _cross, _dot, _normalize, _rand,
                         _select)
from ..shade import OFFSET

# material table rows (traced_mat_tab)
_M_ALR, _M_ALG, _M_ALB = 0, 1, 2
_M_EMR, _M_EMG, _M_EMB = 3, 4, 5
_M_EMP, _M_ROUGH, _M_METAL, _M_REFR, _M_TEX = 6, 7, 8, 9, 10
M_ROWS = 12

# textured-triangle side table rows (traced_tex_tab): local A, AB, AC, uvs
_X_LAX, _X_LAY, _X_LAZ = 0, 1, 2
_X_ABX, _X_ABY, _X_ABZ = 3, 4, 5
_X_ACX, _X_ACY, _X_ACZ = 6, 7, 8
_X_U0, _X_V0, _X_U1, _X_V1, _X_U2, _X_V2 = 9, 10, 11, 12, 13, 14
X_ROWS = 15

# sphere table rows (traced_sph_tabs; SMEM twin for the scalar loop)
_SP_CX, _SP_CY, _SP_CZ, _SP_R = 0, 1, 2, 3
_SP_ALR, _SP_ALG, _SP_ALB = 4, 5, 6
_SP_EMR, _SP_EMG, _SP_EMB = 7, 8, 9
_SP_EMP, _SP_ROUGH, _SP_METAL, _SP_REFR, _SP_TEX = 10, 11, 12, 13, 14
SP_ROWS = 16

NO_TEX = 255                 # texslot sentinel in packed (mat | slot<<8)


def camera_frame(camf, width: int, height: int, xpix, ypix):
    """Per-lane camera basis (shader:684-691): returns (posx, posy, posz,
    fpx, fpy, fpz, rtx, rty, rtz, upx, upy, upz, defocus, blur, wf, hf).

    camf is the (1,64) SMEM row from megakernel._pack_camera."""

    def P(i, j):
        return camf[0, j * 4 + i]

    def V(i, j):
        return camf[0, 16 + j * 4 + i]

    posx, posy, posz = camf[0, 32], camf[0, 33], camf[0, 34]
    focus_d, defocus, blur = camf[0, 35], camf[0, 36], camf[0, 37]
    wf, hf = np.float32(width), np.float32(height)

    px = xpix.astype(jnp.float32) / wf
    py = ypix.astype(jnp.float32) / hf
    nx_ = 2.0 * px - 1.0
    ny_ = 2.0 * py - 1.0
    cx = P(0, 0) * nx_ + P(0, 1) * ny_ + P(0, 2) + P(0, 3)
    cy = P(1, 0) * nx_ + P(1, 1) * ny_ + P(1, 2) + P(1, 3)
    cz = P(2, 0) * nx_ + P(2, 1) * ny_ + P(2, 2) + P(2, 3)
    cw = P(3, 0) * nx_ + P(3, 1) * ny_ + P(3, 2) + P(3, 3)
    inv_w = 1.0 / cw
    cx, cy, cz = cx * inv_w, cy * inv_w, cz * inv_w
    dx0 = (V(0, 0) * cx + V(0, 1) * cy + V(0, 2) * cz) * focus_d
    dy0 = (V(1, 0) * cx + V(1, 1) * cy + V(1, 2) * cz) * focus_d
    dz0 = (V(2, 0) * cx + V(2, 1) * cy + V(2, 2) * cz) * focus_d
    fpx, fpy, fpz = posx + dx0, posy + dy0, posz + dz0
    rtx, rty, rtz = V(0, 0), V(1, 0), V(2, 0)
    upx, upy, upz = V(0, 1), V(1, 1), V(2, 1)
    return (posx, posy, posz, fpx, fpy, fpz, rtx, rty, rtz,
            upx, upy, upz, defocus, blur, wf, hf)


def jittered_ray(seed, frame_basis):
    """Defocus + blur disk jitters (shader:699-706): returns
    (ox, oy, oz, dx, dy, dz, seed') — consumes 4 _rand draws."""
    (posx, posy, posz, fpx, fpy, fpz, rtx, rty, rtz,
     upx, upy, upz, defocus, blur, wf, hf) = frame_basis
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
    return ox, oy, oz, dx, dy, dz, seed


def sphere_nearest_smem(sph_smem, n_sph_pad: int, shape,
                        ox, oy, oz, dx, dy, dz):
    """Nearest sphere (shader:486-524) via a scalar SMEM loop: (t, idx).
    Padding spheres parked at BIG (r=0) can never hit."""
    t_sph = jnp.full(shape, BIG)
    s_idx = jnp.zeros(shape, jnp.int32)
    for s in range(n_sph_pad):
        ocx = ox - sph_smem[s, _SP_CX]
        ocy = oy - sph_smem[s, _SP_CY]
        ocz = oz - sph_smem[s, _SP_CZ]
        rr_ = sph_smem[s, _SP_R]
        a_q = dx * dx + dy * dy + dz * dz
        b_q = 2.0 * (ocx * dx + ocy * dy + ocz * dz)
        c_q = ocx * ocx + ocy * ocy + ocz * ocz - rr_ * rr_
        delta = b_q * b_q - 4.0 * a_q * c_q
        okd = delta >= 0.0
        tq = (-b_q - jnp.sqrt(_select(okd, delta, 0.0))) / (2.0 * a_q)
        ok = okd & (tq >= 0.0) & (tq < t_sph)
        t_sph = _select(ok, tq, t_sph)
        s_idx = _select(ok, jnp.int32(s), s_idx)
    return t_sph, s_idx


def fetch_mat_attrs(mlk, mat_tab):
    """11 material attributes via one shared per-lane lookup closure."""
    return (mlk(lambda c: mat_tab[_M_ALR]), mlk(lambda c: mat_tab[_M_ALG]),
            mlk(lambda c: mat_tab[_M_ALB]), mlk(lambda c: mat_tab[_M_EMR]),
            mlk(lambda c: mat_tab[_M_EMG]), mlk(lambda c: mat_tab[_M_EMB]),
            mlk(lambda c: mat_tab[_M_EMP]), mlk(lambda c: mat_tab[_M_ROUGH]),
            mlk(lambda c: mat_tab[_M_METAL]), mlk(lambda c: mat_tab[_M_REFR]),
            mlk(lambda c: mat_tab[_M_TEX]))


def fetch_sph_attrs(slk, sph_tab):
    """Sphere center + 11 material attributes (traced_sph_tabs rows)."""
    return (slk(lambda c: sph_tab[_SP_CX]), slk(lambda c: sph_tab[_SP_CY]),
            slk(lambda c: sph_tab[_SP_CZ]), slk(lambda c: sph_tab[_SP_ALR]),
            slk(lambda c: sph_tab[_SP_ALG]), slk(lambda c: sph_tab[_SP_ALB]),
            slk(lambda c: sph_tab[_SP_EMR]), slk(lambda c: sph_tab[_SP_EMG]),
            slk(lambda c: sph_tab[_SP_EMB]), slk(lambda c: sph_tab[_SP_EMP]),
            slk(lambda c: sph_tab[_SP_ROUGH]),
            slk(lambda c: sph_tab[_SP_METAL]),
            slk(lambda c: sph_tab[_SP_REFR]), slk(lambda c: sph_tab[_SP_TEX]))


def tex_uv(xlk, tex_tab, ox, oy, oz, dx, dy, dz):
    """Space-mixed barycentric UV of the winning textured triangle
    (shader:257-268) from the <=128-entry side table."""
    lax_ = xlk(lambda c: tex_tab[_X_LAX])
    lay_ = xlk(lambda c: tex_tab[_X_LAY])
    laz_ = xlk(lambda c: tex_tab[_X_LAZ])
    abx_ = xlk(lambda c: tex_tab[_X_ABX])
    aby_ = xlk(lambda c: tex_tab[_X_ABY])
    abz_ = xlk(lambda c: tex_tab[_X_ABZ])
    acx_ = xlk(lambda c: tex_tab[_X_ACX])
    acy_ = xlk(lambda c: tex_tab[_X_ACY])
    acz_ = xlk(lambda c: tex_tab[_X_ACZ])
    u0 = xlk(lambda c: tex_tab[_X_U0])
    v0 = xlk(lambda c: tex_tab[_X_V0])
    u1 = xlk(lambda c: tex_tab[_X_U1])
    v1 = xlk(lambda c: tex_tab[_X_V1])
    u2 = xlk(lambda c: tex_tab[_X_U2])
    v2 = xlk(lambda c: tex_tab[_X_V2])
    aox = ox - lax_
    aoy = oy - lay_
    aoz = oz - laz_
    dax, day, daz = _cross(aox, aoy, aoz, dx, dy, dz)
    nvx, nvy, nvz = _cross(abx_, aby_, abz_, acx_, acy_, acz_)
    detl = -(dx * nvx + dy * nvy + dz * nvz)
    invl = 1.0 / _select(detl == 0.0, jnp.float32(1.0), detl)
    ub = (acx_ * dax + acy_ * day + acz_ * daz) * invl
    vb = -(abx_ * dax + aby_ * day + abz_ * daz) * invl
    wb = 1.0 - ub - vb
    uu = u0 * wb + u1 * ub + u2 * vb
    vv = v0 * wb + v1 * ub + v2 * vb
    return uu, vv


def scatter_step(dx, dy, dz, nxh, nyh, nzh, hx, hy, hz,
                 rough, metal, refr, seed):
    """Scatter (shader:590-649): returns (n_ox, n_oy, n_oz, n_dx, n_dy,
    n_dz, n_seed) — refractive branch consumes 1 draw, diffuse/specular 6;
    the per-lane select keeps the chosen branch's seed (megakernel
    parity, same _rand order)."""
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

    u1_, s1 = _rand(seed)
    u2_, s2 = _rand(s1)
    u3_, s3 = _rand(s2)
    ddx, ddy, ddz = _normalize(nxh + 2.0 * u1_ - 1.0,
                               nyh + 2.0 * u2_ - 1.0,
                               nzh + 2.0 * u3_ - 1.0)
    u4_, s4 = _rand(s3)
    u5_, s5 = _rand(s4)
    u6_, s6 = _rand(s5)
    ddn2 = _dot(dx, dy, dz, nxh, nyh, nzh)
    sp_x = dx - 2.0 * ddn2 * nxh + (2.0 * u4_ - 1.0) * (1.0 - metal)
    sp_y = dy - 2.0 * ddn2 * nyh + (2.0 * u5_ - 1.0) * (1.0 - metal)
    sp_z = dz - 2.0 * ddn2 * nzh + (2.0 * u6_ - 1.0) * (1.0 - metal)
    spx, spy, spz = _normalize(sp_x, sp_y, sp_z)
    dfx, dfy, dfz = _normalize(
        ddx * (1.0 - rough) + spx * rough,
        ddy * (1.0 - rough) + spy * rough,
        ddz * (1.0 - rough) + spz * rough)

    n_ox = _select(is_refract, o_rx, hx + nxh * OFFSET)
    n_oy = _select(is_refract, o_ry, hy + nyh * OFFSET)
    n_oz = _select(is_refract, o_rz, hz + nzh * OFFSET)
    n_dx = _select(is_refract, d_rx, dfx)
    n_dy = _select(is_refract, d_ry, dfy)
    n_dz = _select(is_refract, d_rz, dfz)
    n_seed = _select(is_refract, seed_refr, s6)
    return n_ox, n_oy, n_oz, n_dx, n_dy, n_dz, n_seed
