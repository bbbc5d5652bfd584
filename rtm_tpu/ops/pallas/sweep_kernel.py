"""Intersection-only cluster-sweep kernel: the slim Pallas half of the
sorted-wavefront renderer (ops/wavefront2.py).

Round-1 profiling of the fused kernels showed the nearest-triangle sweep is
the only part of a bounce that *needs* Pallas: shading attribute fetch,
texture/sky sampling, scatter and RNG are all gather/elementwise work XLA
runs at full speed through the flat-table fast path — while inside Mosaic
the attribute fetch costs a one-hot MXU matmul per bounce (~40% of
megakernel time at the headline config) because TPU vectors have no
per-lane gather.  So this kernel does the VPU-shaped part only:

  * rays on the 128-lane axis as (1, R) rows, SAH treelet clusters
    (accel/clusters.py) on sublanes — the shared `_tri_sweep` sweep with
    tile-uniform AABB+alive culling (megakernel.py);
  * input is an (8, N) ray band [ox oy oz dx dy dz alive -], output an
    (8, N) hit band [t_approx, i_padded (bitcast), n_cluster_passes, -];
  * t is the approx-reciprocal ORDERING distance; the exact hit distance
    is recovered differentiably in XLA from the winner's plane equation
    (ops/trace_ref._triangle_t_from_idx) — which also makes the whole
    renderer around this kernel autodiff-able with detached hit topology
    (SURVEY.md Phase 4);
  * i_padded indexes the padded cluster tables; MegaPack.padded_to_real
    maps it back to scene triangle ids for the XLA gathers;
  * n_cluster_passes is the tile-uniform cull probe: rendered by the
    debug heatmap mode (reference's BVH-depth visualizations,
    RayTracing.shader:345-374) and asserted by cull tests.

Replaces the reference's per-thread BVH traversal + f64 triangle test
(RayTracing.shader:324-484, 285-303) as the production hot loop.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .megakernel import MegaPack, _cross, _tri_sweep

DEFAULT_RAY_TILE = 512


def _make_kernel(*, ray_tile, cluster_offsets, cluster_widths, cull):
    r = ray_tile

    def kernel(feats, boxes, st, out, t_scr, i_scr, npass_scr):
        ox, oy, oz = st[0:1, :], st[1:2, :], st[2:3, :]
        dx, dy, dz = st[3:4, :], st[4:5, :], st[5:6, :]
        alive = st[6:7, :] > 0.5
        wx, wy, wz = _cross(ox, oy, oz, dx, dy, dz)
        _tri_sweep(
            feats, boxes, cluster_offsets, cluster_widths, r,
            ox, oy, oz, dx, dy, dz, wx, wy, wz, alive, cull,
            t_scr, i_scr, npass_ref=npass_scr)
        out[0:1, :] = t_scr[:, :]
        out[1:2, :] = pltpu.bitcast(i_scr[:, :], jnp.float32)
        out[2:3, :] = pltpu.bitcast(
            jnp.full((1, r), 1, jnp.int32) * npass_scr[0, 0], jnp.float32)
        for j in range(3, 8):
            out[j:j + 1, :] = jnp.zeros((1, r), jnp.float32)

    return kernel


def sweep_call(pack: MegaPack, state8, *, ray_tile: int = DEFAULT_RAY_TILE,
               cull: bool = True, interpret: bool = False):
    """Run the sweep over an (8, Np) ray band (Np % ray_tile == 0).

    Returns (t_approx (Np,) f32, i_padded (Np,) i32, n_passes (Np,) i32).
    """
    n_pad = state8.shape[1]
    n_tiles = n_pad // ray_tile
    const = lambda i: (0, 0)
    tp = pack.n_padded_tris
    kernel = _make_kernel(ray_tile=ray_tile,
                          cluster_offsets=pack.cluster_offsets,
                          cluster_widths=pack.cluster_widths, cull=cull)
    try:
        cparams = pltpu.CompilerParams(dimension_semantics=("arbitrary",))
    except TypeError:                                         # older jax
        cparams = None
    def run(feats, boxes, st):
        return pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((tp, 16), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((pack.n_clusters, 8), const,
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((8, ray_tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((8, ray_tile), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, n_pad), jnp.float32),
            scratch_shapes=[pltpu.VMEM((1, ray_tile), jnp.float32),
                            pltpu.VMEM((1, ray_tile), jnp.int32),
                            pltpu.SMEM((1, 1), jnp.int32)],
            interpret=interpret,
            **({"compiler_params": cparams} if cparams else {}),
        )(feats, boxes, st)

    # the sweep is an argmin ORACLE: hit topology is detached from autodiff
    # (SURVEY.md Phase 4), and pallas_call has no JVP rule — a custom_vjp
    # with zero cotangents makes the renderer around it differentiable
    run_detached = jax.custom_vjp(run)
    run_detached.defvjp(
        lambda f, b, s: (run(f, b, s), None),
        lambda _, g: (jnp.zeros((tp, 16), jnp.float32),
                      jnp.zeros((pack.n_clusters, 8), jnp.float32),
                      jnp.zeros((8, n_pad), jnp.float32)))
    out = run_detached(pack.tri_feats, pack.boxes, state8)
    t = out[0, :]
    i_padded = jax.lax.bitcast_convert_type(out[1, :], jnp.int32)
    npass = jax.lax.bitcast_convert_type(out[2, :], jnp.int32)
    return t, i_padded, npass
