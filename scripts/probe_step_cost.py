"""Measure the trav kernel's EXACT step bodies in isolation: ns per
leaf k-step and per node step, via iteration-count slope in a dedicated
tiny kernel (so the full-kernel 5-minute compiles aren't needed to tune).

Run: python scripts/probe_step_cost.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rtm_tpu.ops.intersect import DET_EPS

S = (8, 128)


def slope(name, make_kernel, inputs, scratch, lo=512, hi=4608, reps=30):
    ts = {}
    for iters in (lo, hi):
        @jax.jit
        def run(*a, it=iters):
            return pl.pallas_call(
                make_kernel(it),
                out_shape=jax.ShapeDtypeStruct(S, jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(a),
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=scratch,
            )(*a)
        try:
            out = run(*inputs)
            _ = float(np.asarray(out).ravel()[0])
        except Exception as e:
            print(f"{name:22s} FAIL {str(e).splitlines()[0][:90]}",
                  flush=True)
            return
        t0 = time.perf_counter()
        for _ in range(reps):
            out = run(*inputs)
        _ = float(np.asarray(out).ravel()[0])
        ts[iters] = (time.perf_counter() - t0) / reps
    per = (ts[hi] - ts[lo]) / (hi - lo)
    print(f"{name:22s} {per*1e9:8.1f} ns/step", flush=True)


def main():
    rng = np.random.default_rng(0)
    K, LC = 24, 1
    tri_feat = jnp.asarray(rng.standard_normal((12, K, LC, 8, 128)),
                           jnp.float32)
    tri_info = jnp.asarray(rng.integers(0, 1 << 16, (K, LC, 8, 128)),
                           jnp.int32)
    node_box = jnp.asarray(rng.integers(-(1 << 30), 1 << 30,
                                        (3, 2, 8, 128)), jnp.int32)
    node_info = jnp.asarray(rng.integers(0, 1 << 24, (2, 8, 128)),
                            jnp.int32)
    rays = jnp.asarray(rng.standard_normal((8, 8, 128)), jnp.float32)

    scratch = [pltpu.VMEM(S, jnp.float32),   # best
               pltpu.VMEM(S, jnp.int32),     # leaf / cur
               pltpu.VMEM(S, jnp.int32),     # cnt
               pltpu.VMEM((8, 8, 128), jnp.float32)]  # win regs

    # --- the leaf k-step, verbatim shape -------------------------------
    def mk_kstep(iters):
        def kernel(tf, ti, r, o_ref, best_r, leaf_r, cnt_r, wfe_r):
            ox, oy, oz = r[0], r[1], r[2]
            dx, dy, dz = r[3], r[4], r[5]
            best_r[:, :] = jnp.abs(r[6]) + 10.0
            leaf_r[:, :] = (jnp.abs(r[7]) * 50).astype(jnp.int32) % 122
            cnt_r[:, :] = (jnp.abs(r[6]) * 20).astype(jnp.int32) % 24

            def body(k, _):
                kk = k % K
                m = cnt_r[:, :] > kk
                lane = jnp.bitwise_and(leaf_r[:, :], 127)
                f = [jnp.take_along_axis(tf[j, kk, 0], lane, axis=1)
                     for j in range(9)]
                aox = ox - f[0]
                aoy = oy - f[1]
                aoz = oz - f[2]
                nx = f[4] * f[8] - f[5] * f[7]
                ny = f[5] * f[6] - f[3] * f[8]
                nz = f[3] * f[7] - f[4] * f[6]
                det = -(dx * nx + dy * ny + dz * nz)
                tdet = aox * nx + aoy * ny + aoz * nz
                dax = aoy * dz - aoz * dy
                day = aoz * dx - aox * dz
                daz = aox * dy - aoy * dx
                udet = f[6] * dax + f[7] * day + f[8] * daz
                vdet = -(f[3] * dax + f[4] * day + f[5] * daz)
                wdet = det - udet - vdet
                mm = jnp.minimum(jnp.minimum(det - DET_EPS, tdet),
                                 jnp.minimum(jnp.minimum(udet, vdet), wdet))
                ta = tdet * pl.reciprocal(jnp.maximum(det, DET_EPS),
                                          approx=True)
                better = m & (mm >= 0.0) & (ta < best_r[:, :])
                best_r[:, :] = jnp.where(better, ta, best_r[:, :])

                @pl.when(jnp.any(better))
                def _():
                    wfe_r[0] = jnp.where(better, tdet, wfe_r[0])
                    wfe_r[1] = jnp.where(better, det, wfe_r[1])
                    wfe_r[4] = jnp.where(better, jnp.take_along_axis(
                        tf[9, kk, 0], lane, axis=1), wfe_r[4])
                    wfe_r[5] = jnp.where(better, jnp.take_along_axis(
                        tf[10, kk, 0], lane, axis=1), wfe_r[5])
                    wfe_r[6] = jnp.where(better, jnp.take_along_axis(
                        tf[11, kk, 0], lane, axis=1), wfe_r[6])
                return 0

            jax.lax.fori_loop(0, iters, body, 0)
            o_ref[:, :] = best_r[:, :]
        return kernel

    slope("k-step (9g+MT)", mk_kstep, [tri_feat, tri_info, rays], scratch)

    # --- k-step with gathers replaced by static reads ------------------
    def mk_kstep_nog(iters):
        def kernel(tf, ti, r, o_ref, best_r, leaf_r, cnt_r, wfe_r):
            ox, oy, oz = r[0], r[1], r[2]
            dx, dy, dz = r[3], r[4], r[5]
            best_r[:, :] = jnp.abs(r[6]) + 10.0
            cnt_r[:, :] = (jnp.abs(r[6]) * 20).astype(jnp.int32) % 24

            def body(k, _):
                kk = k % K
                m = cnt_r[:, :] > kk
                f = [tf[j, kk, 0] for j in range(9)]
                aox = ox - f[0]
                aoy = oy - f[1]
                aoz = oz - f[2]
                nx = f[4] * f[8] - f[5] * f[7]
                ny = f[5] * f[6] - f[3] * f[8]
                nz = f[3] * f[7] - f[4] * f[6]
                det = -(dx * nx + dy * ny + dz * nz)
                tdet = aox * nx + aoy * ny + aoz * nz
                dax = aoy * dz - aoz * dy
                day = aoz * dx - aox * dz
                daz = aox * dy - aoy * dx
                udet = f[6] * dax + f[7] * day + f[8] * daz
                vdet = -(f[3] * dax + f[4] * day + f[5] * daz)
                wdet = det - udet - vdet
                mm = jnp.minimum(jnp.minimum(det - DET_EPS, tdet),
                                 jnp.minimum(jnp.minimum(udet, vdet), wdet))
                ta = tdet * pl.reciprocal(jnp.maximum(det, DET_EPS),
                                          approx=True)
                better = m & (mm >= 0.0) & (ta < best_r[:, :])
                best_r[:, :] = jnp.where(better, ta, best_r[:, :])

                @pl.when(jnp.any(better))
                def _():
                    wfe_r[0] = jnp.where(better, tdet, wfe_r[0])
                    wfe_r[1] = jnp.where(better, det, wfe_r[1])
                return 0

            jax.lax.fori_loop(0, iters, body, 0)
            o_ref[:, :] = best_r[:, :]
        return kernel

    slope("k-step (0 gathers)", mk_kstep_nog, [tri_feat, tri_info, rays],
          scratch)

    # --- k-step without the pl.when gate --------------------------------
    def mk_kstep_nowhen(iters):
        def kernel(tf, ti, r, o_ref, best_r, leaf_r, cnt_r, wfe_r):
            ox, oy, oz = r[0], r[1], r[2]
            dx, dy, dz = r[3], r[4], r[5]
            best_r[:, :] = jnp.abs(r[6]) + 10.0
            leaf_r[:, :] = (jnp.abs(r[7]) * 50).astype(jnp.int32) % 122
            cnt_r[:, :] = (jnp.abs(r[6]) * 20).astype(jnp.int32) % 24

            def body(k, _):
                kk = k % K
                m = cnt_r[:, :] > kk
                lane = jnp.bitwise_and(leaf_r[:, :], 127)
                f = [jnp.take_along_axis(tf[j, kk, 0], lane, axis=1)
                     for j in range(9)]
                det = -(dx * f[0] + dy * f[1] + dz * f[2])
                ta = det * pl.reciprocal(jnp.maximum(det, DET_EPS),
                                         approx=True)
                better = m & (ta < best_r[:, :])
                best_r[:, :] = jnp.where(better, ta, best_r[:, :])
                return 0

            jax.lax.fori_loop(0, iters, body, 0)
            o_ref[:, :] = best_r[:, :]
        return kernel

    slope("9 gathers + tiny math", mk_kstep_nowhen,
          [tri_feat, tri_info, rays], scratch)

    # --- node step, verbatim shape --------------------------------------
    def mk_node(iters):
        def kernel(nb, ni, r, o_ref, best_r, cur_r, cnt_r, wfe_r):
            ox, oy, oz = r[0], r[1], r[2]
            idx0 = (jnp.abs(r[7]) * 100).astype(jnp.int32) % 243
            cur_r[:, :] = idx0
            best_r[:, :] = jnp.abs(r[6]) + 10.0
            inv_dx, inv_dy, inv_dz = r[3], r[4], r[5]

            def body(k, _):
                idx = jnp.clip(cur_r[:, :], 0, 242)
                lane = jnp.bitwise_and(idx, 127)
                sel = idx >= 128

                def lk(get):
                    g = jnp.take_along_axis(get(0), lane, axis=1)
                    return jnp.where(sel, jnp.take_along_axis(
                        get(1), lane, axis=1), g)

                info = lk(lambda c: ni[c])
                wx = lk(lambda c: nb[0, c])
                wy = lk(lambda c: nb[1, c])
                wz = lk(lambda c: nb[2, c])

                def unpk(w):
                    lo = jax.lax.bitcast_convert_type(
                        jax.lax.shift_left(w, 16), jnp.float32)
                    hi = jax.lax.bitcast_convert_type(
                        jnp.bitwise_and(w, jnp.int32(-65536)), jnp.float32)
                    return lo, hi

                lox, hix = unpk(wx)
                loy, hiy = unpk(wy)
                loz, hiz = unpk(wz)
                t1x = (lox - ox) * inv_dx
                t2x = (hix - ox) * inv_dx
                t1y = (loy - oy) * inv_dy
                t2y = (hiy - oy) * inv_dy
                t1z = (loz - oz) * inv_dz
                t2z = (hiz - oz) * inv_dz
                tn = jnp.maximum(jnp.maximum(
                    jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)),
                    jnp.minimum(t1z, t2z))
                tf_ = jnp.minimum(jnp.minimum(
                    jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)),
                    jnp.maximum(t1z, t2z))
                near = jnp.where((tf_ >= 0.0) & (tn <= tf_), tn, 1e30)
                hit = near < best_r[:, :]
                skip = info & 0x3FF
                leaf1 = (info >> 10) & 0x3FF
                is_leaf = leaf1 > 0
                cur_r[:, :] = jnp.where(
                    hit & (~is_leaf), idx + 1,
                    jnp.where(skip > idx, skip, idx + 1)) % 243
                return 0

            jax.lax.fori_loop(0, iters, body, 0)
            o_ref[:, :] = best_r[:, :]
        return kernel

    slope("node step (4g 2ch)", mk_node, [node_box, node_info, rays],
          scratch)


if __name__ == "__main__":
    main()
