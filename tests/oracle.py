"""Shader-literal NumPy oracle renderer.

An *independent* implementation of the reference device kernel
(RayTracing/assets/shaders/RayTracing.shader), transcribed line-by-line from
the GLSL with per-primitive Python loops and vectorized pixel lanes.  Used to
validate rtm_tpu's fused/feature-factored renderer: same RNG bit stream, same
branch semantics, selectable float precision for the triangle test (the
reference uses f64 there — shader:285-303).
"""
from __future__ import annotations

import numpy as np

FLT_MAX = np.float32(3.402823466e38)
UINT_MAX = np.float32(4294967295.0)
PI = np.float32(np.pi)


def pcg_hash(seed):
    state = seed * np.uint32(747796405) + np.uint32(2891336453)
    word = ((state >> ((state >> np.uint32(28)) + np.uint32(4))) ^ state) * np.uint32(277803737)
    return (word >> np.uint32(22)) ^ word


def fast_random(seed):
    seed = pcg_hash(seed)
    return seed.astype(np.float32) / UINT_MAX, seed


def fast_random3(seed):
    x, seed = fast_random(seed)
    y, seed = fast_random(seed)
    z, seed = fast_random(seed)
    return np.stack([x, y, z], -1), seed


def random_circle_point(seed):
    r1, seed = fast_random(seed)
    angle = r1 * np.float32(2.0) * PI
    r2, seed = fast_random(seed)
    return np.stack([np.cos(angle), np.sin(angle)], -1) * np.sqrt(r2)[..., None], seed


def random_unit_sphere(seed):
    v, seed = fast_random3(seed)
    return np.float32(2.0) * v - np.float32(1.0), seed


def dot(a, b):
    return np.sum(a * b, axis=-1)


def normalize(v):
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


def reflect(d, n):
    return d - 2.0 * dot(d, n)[..., None] * n


def refract(i, n, eta):
    ndi = dot(n, i)[..., None]
    k = 1.0 - eta[..., None] ** 2 * (1.0 - ndi * ndi)
    out = eta[..., None] * i - (eta[..., None] * ndi + np.sqrt(np.maximum(k, 0.0))) * n
    return np.where(k >= 0.0, out, 0.0)


def sphere_hit(origin, direction, center, radius):
    """shader:486-508, vectorized over rays."""
    oc = origin - center
    a = dot(direction, direction)
    b = 2.0 * dot(oc, direction)
    c = dot(oc, oc) - np.float32(radius) ** 2
    delta = b * b - 4.0 * a * c
    t = (-b - np.sqrt(np.maximum(delta, 0.0))) / (2.0 * a)
    return np.where((delta >= 0.0) & (t >= 0.0), t.astype(np.float32), FLT_MAX)


def triangle_hit(origin, direction, a, b, c, dtype=np.float64):
    """shader:285-303 in selectable precision (reference: f64)."""
    eps = np.finfo(dtype).eps
    a = a.astype(dtype); b = b.astype(dtype); c = c.astype(dtype)
    o = origin.astype(dtype); d = direction.astype(dtype)
    edge_ab = b - a
    edge_ac = c - a
    ao = o - a
    n = np.cross(edge_ab, edge_ac)
    dao = np.cross(ao, d)
    det = -dot(d, n)
    with np.errstate(divide="ignore", invalid="ignore"):
        inv_det = 1.0 / det
        t = dot(ao, n) * inv_det
        u = dot(edge_ac, dao) * inv_det
        v = -dot(edge_ab, dao) * inv_det
    w = 1.0 - u - v
    hit = (det > eps) & (t >= 0) & (u >= 0) & (v >= 0) & (w >= 0)
    return np.where(hit, t.astype(np.float32), FLT_MAX)


def bilinear(img, u, v, wrap):
    h, w = img.shape[:2]
    x = u * w - 0.5
    y = v * h - 0.5
    x0 = np.floor(x); y0 = np.floor(y)
    fx = (x - x0)[..., None]; fy = (y - y0)[..., None]
    x0 = x0.astype(np.int64); y0 = y0.astype(np.int64)
    x1, y1 = x0 + 1, y0 + 1
    if wrap == "repeat":
        x0 %= w; x1 %= w; y0 %= h; y1 %= h
    else:
        x0 = np.clip(x0, 0, w - 1); x1 = np.clip(x1, 0, w - 1)
        y0 = np.clip(y0, 0, h - 1); y1 = np.clip(y1, 0, h - 1)
    top = img[y0, x0] * (1 - fx) + img[y0, x1] * fx
    bot = img[y1, x0] * (1 - fx) + img[y1, x1] * fx
    return top * (1 - fy) + bot * fy


def sky_color(direction, sky):
    u = np.arctan2(direction[..., 2], direction[..., 0]) / (2.0 * PI) + 0.5
    v = np.arcsin(np.clip(direction[..., 1], -1 + 1e-6, 1 - 1e-6)) / PI + 0.5
    return bilinear(sky, u, v, "clamp").astype(np.float32)


class NpScene:
    """Plain-numpy snapshot of a TracerScene."""

    def __init__(self, ts):
        g = lambda x: np.asarray(x)
        self.alb = g(ts.materials.albedo); self.emc = g(ts.materials.emission_color)
        self.rough = g(ts.materials.roughness); self.metal = g(ts.materials.metallic)
        self.emp = g(ts.materials.emission_power); self.refr = g(ts.materials.refraction_ratio)
        self.texid = g(ts.materials.texture_id)
        self.sph_pos = g(ts.sph_pos); self.sph_r = g(ts.sph_radius); self.sph_mat = g(ts.sph_mat)
        self.wa = g(ts.tri_wa); self.wb = g(ts.tri_wb); self.wc = g(ts.tri_wc)
        self.la = g(ts.tri_la); self.lab = g(ts.tri_lab); self.lac = g(ts.tri_lac)
        self.tnrm = g(ts.tri_normal); self.tuv = g(ts.tri_uv); self.tmat = g(ts.tri_mat)
        self.sky = g(ts.sky); self.textures = g(ts.textures); self.tex_size = g(ts.tex_size)


def render_oracle(ts, cam, cfg, frame_index, tri_dtype=np.float64):
    """Full dispatch oracle; returns (H,W,3) f32 (pre-accumulation)."""
    sc = NpScene(ts)
    w, h = cfg.width, cfg.height
    n = w * h
    inv_proj = np.asarray(cam.inv_projection, np.float32)
    inv_view = np.asarray(cam.inv_view, np.float32)
    position = np.asarray(cam.position, np.float32)
    lin = np.arange(n)
    x = (lin % w).astype(np.int64)
    y = (lin // w).astype(np.int64)

    px = x.astype(np.float32) / np.float32(w)
    py = y.astype(np.float32) / np.float32(h)
    ndc = np.stack([2 * px - 1, 2 * py - 1, np.ones_like(px), np.ones_like(px)], -1)
    coord = ndc @ inv_proj.T
    c3 = coord[:, :3] / coord[:, 3:4]
    d4 = np.concatenate([c3, np.zeros_like(c3[:, :1])], -1)
    direction = (d4 @ inv_view.T)[:, :3] * np.float32(cam.focus_distance)
    focus_point = position + direction
    right = inv_view[:3, 0]
    up = inv_view[:3, 1]
    draw_env = np.float32(1.0 if cfg.draw_environment else 0.0)
    res = np.array([w, h], np.float32)

    incoming = np.zeros((n, 3), np.float32)
    for frame in range(1, cfg.max_frames + 1):
        seed = (y.astype(np.uint32) * np.uint32(w) + x.astype(np.uint32)
                + np.uint32(frame) * np.uint32(frame_index) * np.uint32(735529))
        fj, seed = random_circle_point(seed)
        fj = fj / res * np.float32(cam.defocus_strength)
        dj, seed = random_circle_point(seed)
        dj = dj / res * np.float32(cam.blur_strength)
        dev_focus = focus_point + dj[:, :1] * right + dj[:, 1:2] * up
        o = position + fj[:, :1] * right + fj[:, 1:2] * up
        o = np.broadcast_to(o, (n, 3)).astype(np.float32).copy()
        d = normalize(dev_focus - o).astype(np.float32)

        color = np.zeros((n, 3), np.float32)
        contrib = np.ones((n, 3), np.float32)
        alive = np.ones(n, bool)
        for bounce in range(cfg.max_bounces):
            seed = seed + np.uint32(bounce)
            # --- bounceRay ---
            best_t = np.full(n, FLT_MAX)
            best_kind = np.full(n, -1)   # -1 none, 0 sphere, 1 tri
            best_idx = np.full(n, -1)
            for si in range(len(sc.sph_pos)):
                t = sphere_hit(o, d, sc.sph_pos[si], sc.sph_r[si])
                upd = t < best_t
                best_t = np.where(upd, t, best_t)
                best_kind = np.where(upd, 0, best_kind)
                best_idx = np.where(upd, si, best_idx)
            for ti in range(len(sc.wa)):
                t = triangle_hit(o, d, sc.wa[ti], sc.wb[ti], sc.wc[ti], tri_dtype)
                upd = t < best_t
                best_t = np.where(upd, t, best_t)
                best_kind = np.where(upd, 1, best_kind)
                best_idx = np.where(upd, ti, best_idx)

            hit = best_kind >= 0
            miss_now = alive & ~hit
            color = np.where(miss_now[:, None],
                             color + sky_color(d, sc.sky) * contrib * draw_env, color)

            live = alive & hit
            hp = o + best_t[:, None] * d
            idx = np.clip(best_idx, 0, None)
            is_sph = best_kind == 0
            # payload
            nrm = np.zeros((n, 3), np.float32)
            uu = np.zeros(n, np.float32)
            vv = np.zeros(n, np.float32)
            mat = np.zeros(n, np.int64)
            if len(sc.sph_pos):
                sidx = np.clip(idx, 0, len(sc.sph_pos) - 1)
                snrm = normalize(hp - sc.sph_pos[sidx])
                su = np.arctan2(snrm[:, 2], snrm[:, 0]) / (2 * PI) + 0.5
                sv = np.arcsin(np.clip(snrm[:, 1], -1 + 1e-6, 1 - 1e-6)) / PI + 0.5
                nrm = np.where(is_sph[:, None], snrm, nrm)
                uu = np.where(is_sph, su, uu)
                vv = np.where(is_sph, sv, vv)
                mat = np.where(is_sph, sc.sph_mat[sidx], mat)
            if len(sc.wa):
                tidx = np.clip(idx, 0, len(sc.wa) - 1)
                is_tri = best_kind == 1
                nrm = np.where(is_tri[:, None], sc.tnrm[tidx], nrm)
                # shader closestHit UV quirk: world ray x local verts
                la, lab, lac = sc.la[tidx], sc.lab[tidx], sc.lac[tidx]
                nvec = np.cross(lab, lac)
                ao = o - la
                dao = np.cross(ao, d)
                with np.errstate(divide="ignore", invalid="ignore"):
                    inv_det = 1.0 / (-dot(d, nvec))
                    tu = dot(lac, dao) * inv_det
                    tv = -dot(lab, dao) * inv_det
                tw = 1.0 - tu - tv
                uvs = sc.tuv[tidx]
                tex_uv = uvs[:, 0] * tw[:, None] + uvs[:, 1] * tu[:, None] + uvs[:, 2] * tv[:, None]
                uu = np.where(is_tri, np.nan_to_num(tex_uv[:, 0]), uu)
                vv = np.where(is_tri, np.nan_to_num(tex_uv[:, 1]), vv)
                mat = np.where(is_tri, sc.tmat[tidx], mat)

            m_rough = sc.rough[mat]; m_metal = sc.metal[mat]
            m_refr = sc.refr[mat]; m_alb = sc.alb[mat]
            m_emc = sc.emc[mat]; m_emp = sc.emp[mat]; m_tex = sc.texid[mat]

            # --- scatter ---
            is_refract = m_refr > 1.0
            is_front = dot(d, nrm) < 0.0
            rt = np.where(is_front, 1.0 / np.where(m_refr != 0, m_refr, 1.0), m_refr).astype(np.float32)
            hn = np.where(is_front[:, None], nrm, -nrm)
            cos_t = np.minimum(dot(-d, hn), 1.0)
            sin_t = np.sqrt(np.maximum(1.0 - cos_t * cos_t, 0.0))
            cannot = rt * sin_t > 1.0
            r0 = ((1.0 - rt) / (1.0 + rt)) ** 2
            r0p = r0 + (1.0 - r0) * (1.0 - cos_t) ** 5
            rnd, seed_refr = fast_random(seed)
            do_reflect = cannot | (r0p > rnd)
            o_refr = np.where(do_reflect[:, None], hp + hn * np.float32(1e-4),
                              hp - hn * np.float32(1e-4))
            d_refr = np.where(do_reflect[:, None], reflect(d, hn), refract(d, hn, rt))

            r3a, s1 = random_unit_sphere(seed)
            diffuse = normalize(nrm + r3a)
            r3b, s2 = random_unit_sphere(s1)
            spec = normalize(reflect(d, nrm) + r3b * (1.0 - m_metal)[:, None])
            ddir = normalize(diffuse * (1.0 - m_rough[:, None]) + spec * m_rough[:, None])
            o_refl = hp + nrm * np.float32(1e-4)

            no = np.where(is_refract[:, None], o_refr, o_refl)
            nd = np.where(is_refract[:, None], d_refr, ddir)
            nseed = np.where(is_refract, seed_refr, s2)

            # --- accumulateColor ---
            if cfg.max_bounces == 1:
                light_dir = np.float32(np.array([-1, -1, -1]) / np.sqrt(3))
                shade = m_alb * (np.minimum(np.float32(0.5), dot(-nrm, light_dir)) + 0.5)[:, None]
                color = np.where(live[:, None], shade.astype(np.float32), color)
            else:
                has_tex = m_tex >= 0
                tid = np.clip(m_tex, 0, len(sc.textures) - 1)
                th = sc.tex_size[tid, 0].astype(np.float32)
                tw_ = sc.tex_size[tid, 1].astype(np.float32)
                xt = uu * tw_ - 0.5
                yt = vv * th - 0.5
                x0 = np.floor(xt); y0 = np.floor(yt)
                fx = (xt - x0)[:, None]; fy = (yt - y0)[:, None]
                hi = sc.tex_size[tid, 0]; wi = sc.tex_size[tid, 1]
                x0i = np.mod(x0.astype(np.int64), wi); x1i = np.mod(x0.astype(np.int64) + 1, wi)
                y0i = np.mod(y0.astype(np.int64), hi); y1i = np.mod(y0.astype(np.int64) + 1, hi)
                c00 = sc.textures[tid, y0i, x0i]; c01 = sc.textures[tid, y0i, x1i]
                c10 = sc.textures[tid, y1i, x0i]; c11 = sc.textures[tid, y1i, x1i]
                alb_tex = ((c00 * (1 - fx) + c01 * fx) * (1 - fy)
                           + (c10 * (1 - fx) + c11 * fx) * fy).astype(np.float32)
                emis = np.where(has_tex[:, None], alb_tex * m_emp[:, None],
                                m_emc * m_emp[:, None])
                albedo = np.where(has_tex[:, None], alb_tex, m_alb)
                color = np.where(live[:, None], color + emis * contrib, color)
                contrib = np.where(live[:, None], contrib * albedo, contrib)

            o = np.where(live[:, None], no, o).astype(np.float32)
            d = np.where(live[:, None], nd, d).astype(np.float32)
            seed = np.where(live, nseed, seed)
            alive = live

        incoming += color
    incoming /= np.float32(cfg.max_frames)
    return incoming.reshape(h, w, 3)
