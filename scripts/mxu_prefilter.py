"""The K=128-rays x 128-tris bf16 MXU pair-test experiment (VERDICT r3
task 2) — measured, either way.

Question: can the MXU (idle in every round-1..3 kernel) run the
ray-triangle pair tests that dominate the forward path?  The pair test is
LINEAR in a 10-dim ray feature vector f = [d, m=o x d, o, 1] (Pluecker
form), so a (tris, K) @ (K, rays) matmul computes, for every pair:

    s1, s2, s3  — edge side tests (d . m_e + m . e per edge; their SUM is
                  the Moller-Trumbore determinant: s1+s2+s3 = det = -d.n
                  for inward edge moments),
    tdet        — (o - a) . n (the repo's M-T numerator, intersect.py),

i.e. 4 matmul output rows per triangle; hit = min(s1,s2,s3,tdet) >= 0 &
det > eps, t = tdet/det — leaving only a short VPU min-chain per pair and
a min-reduction over triangles (with the classic t-low-bits index pack so
argmin rides the same min chain).

What this script measures on the real chip, at the headline scene's
shapes (1856 padded tris, 1024-ray tiles):

  1. correctness: the Pluecker mask/t against ops.intersect.triangle_hits
     (the production M-T sweep) on random rays — f32 and bf16 feature
     variants;
  2. the matmul: `lax.dot_general((Q*T_c, K) , (K, 8, 128))` per-chunk
     rate in a Pallas kernel, bf16 and f32 features, including the
     (K, 8, 128) ray-feature relayout the kernel must pay per bounce;
  3. the VPU post: the min-chain + pack + min-accumulate sweep rate;
  4. an end-to-end per-tile-bounce cost, extrapolated to the 512x512x8
     headline frame and compared against the measured megakernel/trav
     numbers.

Timing uses in-kernel repeat SLOPES (difference of two trip counts), the
only honest protocol under the ~1 ms axon tunnel dispatch overhead
(memory: tpu-axon-environment).

Result (TPU v5e, 2026-08-21, committed in MXU_PREFILTER_r04.json): NO-GO
for brute force.  The arithmetic is K-bound: the pair test is a rank-10
(pad-16) computation, so at best 16/128 of MXU depth does useful work.
Measured end-to-end cost/frame sits near the megakernel's — far from the
>=3x needed — and the VPU post alone exceeds the per-lane traversal's
useful-work bound (~53 pair tests/ray-bounce vs brute force's 1856).
The MXU stays reserved for shapes where K is honest (dense attribute
extraction was already retired for the same reason, megakernel.py).

Usage: python scripts/mxu_prefilter.py [--cpu]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if "--cpu" in sys.argv or os.environ.get("RTM_BENCH_PLATFORM"):
    jax.config.update("jax_platforms",
                      os.environ.get("RTM_BENCH_PLATFORM", "cpu"))
jax.config.update("jax_compilation_cache_dir", "/tmp/rtm_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = np.float32(1e30)
DET_EPS = np.float32(1e-12)
K = 16          # ray feature depth: [d(3), m(3), o(3), 1] padded 10 -> 16
Q = 4           # matmul quantities per tri: s1, s2, s3, tdet


def tri_feature_rows(va, vb, vc):
    """(T,3)x3 -> (T, Q, K) matmul lhs rows (Pluecker edges + tdet row).

    Edge moments oriented so that s1+s2+s3 == det == -d.n with
    n = cross(ab, ac) — matching ops.intersect.triangle_hits' backface
    gate (det > eps keeps front faces).
    """
    t = len(va)
    n = np.cross(vb - va, vc - va)
    rows = np.zeros((t, Q, K), np.float64)
    # side of edge (p -> q): s = d . (p x q) + (o x d) . (q - p).
    # REVERSED edges (c->b), (a->c), (b->a): forward edges sum to +d.n,
    # so the reversed orientation gives s1+s2+s3 = -d.n = det, matching
    # the repo's backface gate det > eps (checked by check_correctness)
    for qi, (p, qq) in enumerate(((vc, vb), (va, vc), (vb, va))):
        rows[:, qi, 0:3] = np.cross(p, qq)          # on d
        rows[:, qi, 3:6] = qq - p                    # on m = o x d
    rows[:, 3, 6:9] = n                              # tdet = (o-a).n:
    rows[:, 3, 9] = -(va * n).sum(-1)                # o.n - a.n
    return rows


def ray_features(o, d):
    """(N,3)x2 -> (N, K) f64."""
    n = len(o)
    f = np.zeros((n, K), np.float64)
    f[:, 0:3] = d
    f[:, 3:6] = np.cross(o, d)
    f[:, 6:9] = o
    f[:, 9] = 1.0
    return f


def check_correctness(rng, n_rays=4096, n_tris=512, dtype=np.float32):
    """Pluecker mask/t vs the production M-T sweep (ops.intersect)."""
    from rtm_tpu.ops.intersect import TriFeatures, triangle_hits

    va = rng.uniform(-2, 2, (n_tris, 3))
    vb = va + rng.uniform(-1, 1, (n_tris, 3))
    vc = va + rng.uniform(-1, 1, (n_tris, 3))
    o = rng.uniform(-3, 3, (n_rays, 3))
    d = rng.normal(size=(n_rays, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)

    rows = tri_feature_rows(va, vb, vc).astype(dtype).astype(np.float32)
    f = ray_features(o, d).astype(np.float32)
    s = np.einsum("tqk,nk->ntq", rows, f)           # (N, T, Q)
    det = s[..., 0] + s[..., 1] + s[..., 2]
    m = np.minimum(np.minimum(s[..., 0], s[..., 1]),
                   np.minimum(s[..., 2], s[..., 3]))
    hit = (m >= 0.0) & (det > DET_EPS)
    t_p = np.where(hit, s[..., 3] / np.where(hit, det, 1.0), BIG)

    feats = TriFeatures.build(jnp.asarray(va, jnp.float32),
                              jnp.asarray(vb, jnp.float32),
                              jnp.asarray(vc, jnp.float32))
    w = jnp.cross(jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32))
    t_ref = np.asarray(triangle_hits(jnp.asarray(o, jnp.float32),
                                     jnp.asarray(d, jnp.float32), feats, w))
    ref_hit = t_ref < 1e30

    agree = (hit == ref_hit).mean()
    both = hit & ref_hit
    t_err = (np.abs(t_p - t_ref)[both]
             / np.maximum(t_ref[both], 1e-6)) if both.any() else np.zeros(1)
    return {"dtype": str(np.dtype(dtype)), "mask_agree": float(agree),
            "t_relerr_max": float(t_err.max()),
            "hit_rate": float(ref_hit.mean())}


# ---------------------------------------------------------------------------
# Pallas kernels (timed by repeat slopes)
# ---------------------------------------------------------------------------

def make_kernel(n_chunks, reps, feat_dtype, do_post=True, do_mm=True):
    """One 1024-ray tile vs n_chunks*128 triangles, repeated `reps` times.

    Inputs: rays (K, 8, 128) f32 (native vreg layout — the relayout to the
    (K, 1024) matmul operand is part of the measured cost), triB
    (n_chunks, Q*128, K) feat_dtype.  Output: packed best score (8, 128).
    """

    def kernel(rays_ref, tri_ref, out_ref, acc_ref):
        def one_rep(rep, _):
            rays = rays_ref[...]
            # the (K,8,128)->(K,1024) relayout is part of the per-bounce
            # price: ray features are produced in vreg layout by camera/
            # scatter code but the matmul wants a 2-D operand
            rm = rays.reshape(K, 1024) + rep * 0.0       # defeat hoisting
            if feat_dtype == jnp.bfloat16:
                rm = rm.astype(jnp.bfloat16)
            # per-sublane-row partial min: rows of a (Q*128, 1024) matmul
            # output are triangles, so 8-row blocks are native vregs and
            # the min accumulates 8 partial bests per ray (folded at the
            # end) — the argmin rides the min chain via the classic
            # low-mantissa index pack
            best = jnp.full((8, 1024), BIG, jnp.float32)
            rowi = jax.lax.broadcasted_iota(jnp.int32, (8, 1024), 0)

            for c in range(n_chunks):
                if do_mm:
                    acc_ref[...] = jax.lax.dot_general(
                        tri_ref[c], rm, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                if do_post:
                    for t0 in range(0, 128, 8):
                        s1 = acc_ref[t0:t0 + 8]
                        s2 = acc_ref[128 + t0:128 + t0 + 8]
                        s3 = acc_ref[256 + t0:256 + t0 + 8]
                        td = acc_ref[384 + t0:384 + t0 + 8]
                        det = s1 + s2 + s3
                        m = jnp.minimum(jnp.minimum(s1, s2),
                                        jnp.minimum(s3, td))
                        tt = td * pl.reciprocal(
                            jnp.maximum(det, DET_EPS), approx=True)
                        ok = (m >= 0.0) & (det > DET_EPS)
                        ti = rowi + jnp.int32(c * 128 + t0)
                        packed = jax.lax.bitcast_convert_type(
                            jnp.bitwise_or(
                                jnp.bitwise_and(
                                    jax.lax.bitcast_convert_type(
                                        tt, jnp.int32),
                                    jnp.int32(~0x7FF)),
                                ti), jnp.float32)
                        best = jnp.minimum(
                            best, jnp.where(ok, packed, BIG))
            # fold the 8 per-row partial bests -> per-ray best
            out_ref[...] = jnp.min(
                best.reshape(8, 8, 128), axis=0)
            return 0

        jax.lax.fori_loop(0, reps, one_rep, 0)

    return kernel


def run_variant(name, rays, tri_b, n_chunks, reps, feat_dtype,
                do_post=True, do_mm=True, interpret=False):
    acc = pltpu.VMEM((Q * 128, 1024), jnp.float32)
    fn = pl.pallas_call(
        make_kernel(n_chunks, reps, feat_dtype, do_post, do_mm),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[acc],
        interpret=interpret,
    )
    f = jax.jit(fn)
    out = f(rays, tri_b)
    _ = np.asarray(out)
    t0 = time.perf_counter()
    out = f(rays, tri_b)
    _ = np.asarray(out)
    dt = time.perf_counter() - t0
    return out, dt


def main():
    rng = np.random.default_rng(7)
    results = {"config": "1024-ray tile, 1856-tri scene-equivalent "
                         "(15 chunks of 128), K=16, Q=4",
               "correctness": [], "timing": []}

    print("== correctness (Pluecker vs production M-T) ==")
    for dt_ in (np.float32, "bfloat16"):
        import ml_dtypes
        d = ml_dtypes.bfloat16 if dt_ == "bfloat16" else dt_
        r = check_correctness(rng, dtype=d)
        print(r)
        results["correctness"].append(r)

    platform = jax.devices()[0].platform
    interpret = platform != "tpu"
    n_chunks = 15                                   # 1920 >= 1856 tris
    va = rng.uniform(-2, 2, (n_chunks * 128, 3))
    vb = va + rng.uniform(-1, 1, (n_chunks * 128, 3))
    vc = va + rng.uniform(-1, 1, (n_chunks * 128, 3))
    rows = tri_feature_rows(va, vb, vc)             # (T, Q, K)
    tri_b32 = jnp.asarray(
        rows.transpose(1, 0, 2).reshape(Q, n_chunks, 128, K)
        .transpose(1, 0, 2, 3).reshape(n_chunks, Q * 128, K), jnp.float32)
    o = rng.uniform(-3, 3, (1024, 3))
    dvec = rng.normal(size=(1024, 3))
    dvec /= np.linalg.norm(dvec, axis=1, keepdims=True)
    rays = jnp.asarray(ray_features(o, dvec).T.reshape(K, 8, 128),
                       jnp.float32)

    print(f"== timing on {platform} (interpret={interpret}) ==")
    # slopes need each timed call well above the ~1 ms tunnel dispatch
    # jitter: 256 vs 768 reps puts the difference at ~tens of ms
    reps_lo, reps_hi = (1, 2) if interpret else (256, 768)
    for name, fd, dm, dp in (
            ("mm+post f32", jnp.float32, True, True),
            ("mm only f32", jnp.float32, True, False),
            ("post only", jnp.float32, False, True),
            ("mm+post bf16", jnp.bfloat16, True, True),
            ("mm only bf16", jnp.bfloat16, True, False)):
        tri_b = (tri_b32.astype(jnp.bfloat16)
                 if fd == jnp.bfloat16 else tri_b32)
        _, t_lo = run_variant(name, rays, tri_b, n_chunks, reps_lo, fd,
                              do_post=dp, do_mm=dm, interpret=interpret)
        _, t_hi = run_variant(name, rays, tri_b, n_chunks, reps_hi, fd,
                              do_post=dp, do_mm=dm, interpret=interpret)
        per_tile_us = (t_hi - t_lo) / (reps_hi - reps_lo) * 1e6
        frame_ms = per_tile_us * 256 * 8 / 1e3      # 512^2, 8 bounces
        row = {"variant": name, "us_per_tile_bounce": round(per_tile_us, 2),
               "frame_ms_512_8b_extrapolated": round(frame_ms, 1)}
        print(row)
        results["timing"].append(row)

    results["baselines_ms"] = {"megakernel_r4_session": 112.2,
                               "trav_r4_session": 185.9}
    mm_post = [r for r in results["timing"] if r["variant"] == "mm+post bf16"]
    if mm_post and not interpret:
        f_ms = mm_post[0]["frame_ms_512_8b_extrapolated"]
        go = f_ms < 112.2 / 3
        results["verdict"] = (
            ("GO" if go else "NO-GO")
            + f": bf16 mm+post extrapolates to {f_ms} ms/frame vs the 37.4 "
            "ms (>=3x megakernel) bar. The pair test is rank-10 (K=16 "
            "padded), so 7/8 of MXU depth is idle by construction; the VPU "
            "min-chain post over all T pairs/ray is the second wall — "
            "brute force pays 1856 pair tests/ray-bounce where the per-lane "
            "traversal needs ~53.")
        print(results["verdict"])

    with open("MXU_PREFILTER_r04.json", "w") as f:
        json.dump(results, f, indent=1)
    print("wrote MXU_PREFILTER_r04.json")


if __name__ == "__main__":
    main()
