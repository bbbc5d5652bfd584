"""Cull-scheme census: measured pair-test counts per ray-bounce for the
candidate sweep architectures, on the headline scene (3: Cornell + dragon).

For every bounce of a real 8-bounce trace (XLA reference path, slot order =
the kernel's 8x8 pixel blocks), records per (ray, cluster):

  near_rc  slab entry distance to the cluster AABB (BIG on miss)
  t_rc     nearest VALID triangle hit within the cluster (BIG on none)

then simulates each sweep scheme's cluster-visit decisions offline:

  A  static order, 512-ray tile-uniform cull        (round-2 default)
  B  near order + t-pruning, 512-ray tile            (VERDICT r3 task 1b)
  C  near order + t-pruning, 128-lane groups         (4 groups per tile)
  D  C after intra-tile sort by direction octant     (in-kernel regroup)
  E  D with Morton-of-origin minor key
  F  per-ray ideal near-order traversal              (lower bound)

Output: pair tests per live ray-bounce (padded widths, like the kernel
pays) per bounce and total, for each scheme.

Run: python scripts/census_schemes.py [res] [bounces]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# host sitecustomize imports jax before env vars apply -> config.update
jax.config.update("jax_platforms", os.environ.get("RTM_BENCH_PLATFORM",
                                                  "cpu"))

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from rtm_tpu import Camera, RenderConfig, build_tracer_scene, load_scene
from rtm_tpu.ops import rng
from rtm_tpu.ops.intersect import FLT_MAX, TriFeatures, triangle_hits
from rtm_tpu.ops.pallas.megakernel import build_mega_pack, slot_to_xy
from rtm_tpu.ops.trace_ref import (bounce_payload, camera_ray_basis,
                                   shade_bounce)

BIG = np.float32(1e30)


def slab_near(o, d, lo, hi):
    """(N,3) rays vs one AABB -> (N,) conservative entry distance."""
    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-12,
                          jnp.where(d >= 0, 1e-12, -1e-12), d)
    t1 = (lo[None, :] - o) * inv
    t2 = (hi[None, :] - o) * inv
    tn = jnp.max(jnp.minimum(t1, t2), axis=1)
    tf = jnp.min(jnp.maximum(t1, t2), axis=1)
    return jnp.where((tf >= 0) & (tn <= tf), tn, BIG)


def main():
    res = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    bounces = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    cfg = RenderConfig(width=res, height=res, max_bounces=bounces,
                       max_frames=1, draw_environment=True)
    cam = Camera().spec(res, res)
    scene = build_tracer_scene(load_scene(3))
    pack = build_mega_pack(scene)
    C = pack.n_clusters
    widths = np.asarray(pack.cluster_widths)
    slices = scene.cluster_slices
    boxes = np.asarray(jax.device_get(pack.boxes))          # (C,8)
    print(f"# scene 3: {scene.num_triangles} tris, {C} clusters, "
          f"padded widths sum {widths.sum()}", flush=True)

    n = res * res
    lin = jnp.arange(n, dtype=jnp.int32)
    x, y = slot_to_xy(lin, res)
    focus_point, right, up, position = camera_ray_basis(cam, cfg, x, y)
    resv = jnp.array([res, res], jnp.float32)
    seed = rng.pixel_seed(x, y, res, 1, jnp.uint32(1))
    fj, seed = rng.random_circle_point(seed)
    fj = fj / resv * cam.defocus_strength
    dj, seed = rng.random_circle_point(seed)
    dj = dj / resv * cam.blur_strength
    dev_focus = (focus_point + dj[:, :1] * right[None, :]
                 + dj[:, 1:2] * up[None, :])
    o = (position[None, :] + fj[:, :1] * right[None, :]
         + fj[:, 1:2] * up[None, :])
    delta = dev_focus - o
    d = delta / jnp.linalg.norm(delta, axis=-1, keepdims=True)

    feats_per_cluster = []
    for lo_, hi_ in slices:
        feats_per_cluster.append(TriFeatures.build(
            scene.tri_wa[lo_:hi_], scene.tri_wb[lo_:hi_],
            scene.tri_wc[lo_:hi_]))
    feats_all = TriFeatures.build(scene.tri_wa, scene.tri_wb, scene.tri_wc)

    @jax.jit
    def per_cluster_info(o, d):
        nears, ts = [], []
        for ci in range(C):
            lo_b = jnp.asarray(boxes[ci, 0:3])
            hi_b = jnp.asarray(boxes[ci, 3:6])
            nears.append(slab_near(o, d, lo_b, hi_b))
            t = triangle_hits(o, d, feats_per_cluster[ci])   # FLT_MAX miss
            ts.append(jnp.minimum(jnp.min(t, axis=1), BIG))
        return jnp.stack(nears, 1), jnp.stack(ts, 1)        # (N,C)

    color = jnp.zeros((n, 3), jnp.float32)
    contrib = jnp.ones((n, 3), jnp.float32)
    alive = jnp.ones((n,), bool)
    draw_env = jnp.float32(1.0)
    sd = seed

    rec = []
    for b in range(bounces):
        sd = sd + jnp.uint32(b)
        near_rc, t_rc = per_cluster_info(o, d)
        rec.append((np.asarray(o), np.asarray(d), np.asarray(alive),
                    np.asarray(near_rc), np.asarray(t_rc)))
        p = bounce_payload(scene, feats_all, o, d, chunk=512)
        o, d, sd, color, contrib, alive = shade_bounce(
            scene, cfg, draw_env, o, d, sd, color, contrib, alive, p)
        print(f"# traced bounce {b}, live {int(np.asarray(alive).sum())}",
              flush=True)

    # ---- scheme simulations (NumPy) ------------------------------------
    def simulate(group, order, sort_key=None, label=""):
        """group: rays per cull group; order: 'static'|'near';
        sort_key(o, d) -> per-ray key for intra-512-tile regroup."""
        tile = 512
        tot_pairs = 0
        tot_live = 0
        per_bounce = []
        for b, (ob, db, al, near, trc) in enumerate(rec):
            pairs_b = 0
            if sort_key is not None:
                ordr = np.arange(n)
                for t0 in range(0, n, tile):
                    sl = slice(t0, t0 + tile)
                    k = sort_key(ob[sl], db[sl], al[sl])
                    ordr[sl] = t0 + np.argsort(k, kind="stable")
                ob, db, al = ob[ordr], db[ordr], al[ordr]
                near, trc = near[ordr], trc[ordr]
            best = np.full(n, BIG, np.float32)
            for g0 in range(0, n, group):
                sl = slice(g0, g0 + group)
                if not al[sl].any():
                    continue
                if order == "static":
                    visit = range(C)
                else:
                    key = np.where(al[sl, None], near[sl], BIG).min(0)
                    visit = np.argsort(key)
                for c in visit:
                    if order == "near" and \
                            np.where(al[sl], near[sl, c], BIG).min() >= BIG:
                        break
                    improves = (al[sl] & (near[sl, c] < best[sl])).any()
                    if improves:
                        pairs_b += int(widths[c]) * group
                        best[sl] = np.minimum(best[sl], trc[sl, c])
            live = max(int(al.sum()), 1)
            per_bounce.append(pairs_b / live)
            tot_pairs += pairs_b
            tot_live += live
        ppr = tot_pairs / max(tot_live, 1)
        pb = " ".join(f"{v:7.0f}" for v in per_bounce)
        print(f"{label:34s} pairs/live-ray-bounce {ppr:8.1f}  "
              f"per-bounce [{pb}]", flush=True)
        return ppr

    def ideal():
        tot_pairs = 0
        tot_live = 0
        per_bounce = []
        for (ob, db, al, near, trc) in rec:
            idx = np.argsort(near, axis=1)
            near_s = np.take_along_axis(near, idx, 1)
            t_s = np.take_along_axis(trc, idx, 1)
            w_s = widths[idx]
            best = np.full(n, BIG, np.float32)
            pairs = np.zeros(n, np.int64)
            for c in range(C):
                need = al & (near_s[:, c] < best)
                pairs += np.where(need, w_s[:, c], 0)
                best = np.where(need, np.minimum(best, t_s[:, c]), best)
            live = max(int(al.sum()), 1)
            per_bounce.append(int(pairs.sum()) / live)
            tot_pairs += int(pairs.sum())
            tot_live += live
        pb = " ".join(f"{v:7.0f}" for v in per_bounce)
        print(f"{'F per-ray ideal':34s} pairs/live-ray-bounce "
              f"{tot_pairs / tot_live:8.1f}  per-bounce [{pb}]", flush=True)

    def octant_key(o, d, al):
        k = ((d[:, 0] > 0).astype(np.int64)
             | ((d[:, 1] > 0).astype(np.int64) << 1)
             | ((d[:, 2] > 0).astype(np.int64) << 2))
        return np.where(al, k, 1 << 30)

    def octant_morton_key(o, d, al):
        lo = o.min(0)
        ext = np.maximum(o.max(0) - lo, 1e-6)
        cell = np.clip(((o - lo) / ext * 4).astype(np.int64), 0, 3)
        m = cell[:, 0] | (cell[:, 1] << 2) | (cell[:, 2] << 4)
        return np.where(al, (octant_key(o, d, al) << 6) | m, 1 << 30)

    simulate(512, "static", label="A static 512-tile (r2 default)")
    simulate(512, "near", label="B near+prune 512-tile")
    simulate(128, "near", label="C near+prune 128-group")
    simulate(128, "near", octant_key, "D C + octant intra-tile sort")
    simulate(128, "near", octant_morton_key, "E D + morton minor key")
    simulate(64, "near", octant_morton_key, "E64 64-group variant")
    ideal()


if __name__ == "__main__" and not os.environ.get("RTM_CENSUS_PERLANE"):
    main()


# ---------------------------------------------------------------------------
# Per-lane traversal simulation (round-3 kernel design input)
# ---------------------------------------------------------------------------

def perlane_sim(res: int = 128, bounces: int = 8, leaf_tris: int = 16,
                tiles=(128, 1024)):
    """Simulate per-LANE leaf iteration over a leaf_tris-wide SAH cut:

      static : leaves visited in DFS order, per-ray t-pruned
               (threaded-BVH skip-link traversal, no ordering)
      near   : leaves visited in per-ray near order, per-ray t-pruned
               (priority traversal — the reference's ordered descent)

    Reports mean leaves/ray-bounce and the TILE-MAX (all lanes of a tile
    step together, so the tile pays max over its lanes) for each tile size.
    """
    import rtm_tpu.models.scene as msc
    cfg = RenderConfig(width=res, height=res, max_bounces=bounces,
                       max_frames=1, draw_environment=True)
    cam = Camera().spec(res, res)
    scene = build_tracer_scene(load_scene(3), cluster_max_tris=leaf_tris)
    slices = scene.cluster_slices
    L = len(slices)
    print(f"# leaf={leaf_tris}: {L} leaves", flush=True)

    # leaf boxes
    va = np.asarray(scene.tri_wa)
    vb = np.asarray(scene.tri_wb)
    vc = np.asarray(scene.tri_wc)
    v = np.stack([va, vb, vc], 1)
    los = np.stack([v[lo:hi].reshape(-1, 3).min(0) for lo, hi in slices])
    his = np.stack([v[lo:hi].reshape(-1, 3).max(0) for lo, hi in slices])

    feats_per = [TriFeatures.build(scene.tri_wa[lo:hi], scene.tri_wb[lo:hi],
                                   scene.tri_wc[lo:hi]) for lo, hi in slices]
    feats_all = TriFeatures.build(scene.tri_wa, scene.tri_wb, scene.tri_wc)

    n = res * res
    lin = jnp.arange(n, dtype=jnp.int32)
    x, y = slot_to_xy(lin, res)
    focus_point, right, up, position = camera_ray_basis(cam, cfg, x, y)
    resv = jnp.array([res, res], jnp.float32)
    seed = rng.pixel_seed(x, y, res, 1, jnp.uint32(1))
    fj, seed = rng.random_circle_point(seed)
    fj = fj / resv * cam.defocus_strength
    dj, seed = rng.random_circle_point(seed)
    dj = dj / resv * cam.blur_strength
    dev_focus = (focus_point + dj[:, :1] * right[None, :]
                 + dj[:, 1:2] * up[None, :])
    o = (position[None, :] + fj[:, :1] * right[None, :]
         + fj[:, 1:2] * up[None, :])
    delta = dev_focus - o
    d = delta / jnp.linalg.norm(delta, axis=-1, keepdims=True)

    @jax.jit
    def per_leaf_info(o, d):
        nears, ts = [], []
        for ci in range(L):
            nears.append(slab_near(o, d, jnp.asarray(los[ci]),
                                   jnp.asarray(his[ci])))
            t = triangle_hits(o, d, feats_per[ci])
            ts.append(jnp.minimum(jnp.min(t, axis=1), BIG))
        return jnp.stack(nears, 1), jnp.stack(ts, 1)

    color = jnp.zeros((n, 3), jnp.float32)
    contrib = jnp.ones((n, 3), jnp.float32)
    alive = jnp.ones((n,), bool)
    sd = seed
    stats = {k: dict(mean=0.0, live=0, tmax={t: 0.0 for t in tiles})
             for k in ("static", "near")}
    for b in range(bounces):
        sd = sd + jnp.uint32(b)
        near, trc = (np.asarray(a) for a in per_leaf_info(o, d))
        al = np.asarray(alive)
        for mode in ("static", "near"):
            if mode == "near":
                idx = np.argsort(near, axis=1)
                near_s = np.take_along_axis(near, idx, 1)
                t_s = np.take_along_axis(trc, idx, 1)
            else:
                near_s, t_s = near, trc
            best = np.full(n, BIG, np.float32)
            visits = np.zeros(n, np.int64)
            for j in range(L):
                need = al & (near_s[:, j] < best)
                visits += need
                best = np.where(need, np.minimum(best, t_s[:, j]), best)
            live = max(int(al.sum()), 1)
            stats[mode]["mean"] += float(visits[al].sum())
            stats[mode]["live"] += live
            for t in tiles:
                vt = visits.reshape(-1, t).max(1)          # per-tile max
                stats[mode]["tmax"][t] += float(vt.sum() * t)
        p = bounce_payload(scene, feats_all, o, d, chunk=512)
        o, d, sd, color, contrib, alive = shade_bounce(
            scene, cfg, jnp.float32(1.0), o, d, sd, color, contrib, alive, p)
    for mode in ("static", "near"):
        s = stats[mode]
        m = s["mean"] / s["live"]
        line = f"perlane {mode:6s} leaves/ray-bounce {m:6.2f}"
        for t in tiles:
            line += f"  tilemax{t}={s['tmax'][t] / (n * bounces):6.2f}"
        print(line, flush=True)


if __name__ == "__main__" and os.environ.get("RTM_CENSUS_PERLANE"):
    perlane_sim(int(sys.argv[1]) if len(sys.argv) > 1 else 128,
                int(sys.argv[2]) if len(sys.argv) > 2 else 8,
                leaf_tris=int(os.environ.get("RTM_CENSUS_LEAF", 16)))
