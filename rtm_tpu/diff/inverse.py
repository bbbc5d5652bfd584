"""Inverse rendering: recover scene parameters from a target image.

BASELINE config 5: "recover sphere albedo/position + light emission from
target image via pixel-gradient descent".  The loss is pixel L2 between a
rendered frame and the target; gradients flow through the full bounce scan
(with optional per-bounce rematerialization) and the optimizer is Adam
(optax).  The same `loss_and_grad` is what the multi-chip training step
shards over the pixel grid (parallel/sharding.py) with a psum over
parameter gradients.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import optax

from ..config import RenderConfig
from ..models.camera import CameraSpec
from ..models.scene import TracerScene
from ..ops.trace_ref import render_dispatch
from .params import SceneParams, apply_params, extract_params


@partial(jax.jit, static_argnames=("cfg", "backend", "remat",
                                   "rebuild_tri_geometry", "soft_tau",
                                   "bands"))
def render_loss(params: SceneParams, scene: TracerScene, cam: CameraSpec,
                target, frame_index, cfg: RenderConfig, backend: str = "xla",
                remat: bool = True, rebuild_tri_geometry: bool = True,
                soft_tau: float = 0.0, bands: int = 1):
    """Mean squared pixel error of a single dispatch against `target`.

    soft_tau > 0 enables soft primary visibility (diff/silhouette.py):
    geometry gradients pick up the silhouette edge term the detached
    argmin drops, at the cost of a ~tau-wide soft edge band in the loss.

    bands > 1 (wavefront2 only): evaluate the loss as a lax.scan over
    `bands` contiguous dispatch-slot bands.  Numerically identical (the
    per-band partial L2 sums are exact), but the fwd+bwd graph compiles
    ONE band instead of the whole frame — the fix for the round-3
    blocker where the 512^2 wavefront2 fwd+bwd compile exceeded the
    10-minute remote-compile window (VERDICT r3 task 7).
    """
    full = apply_params(scene, params, rebuild_tri_geometry)
    if backend.startswith("mxu"):
        # the record-replay differentiable path (VERDICT r4 task 2): the
        # fast mxu forward emits winner records, XLA replays the shading
        # graph from them.  LOUD on unsupported configs — the r3 lesson:
        # a grad backend must never silently reroute.
        if soft_tau > 0.0:
            raise ValueError(
                "render_loss(backend='mxu'): soft primary visibility "
                "(soft_tau) is not supported on the record-replay path; "
                "use backend='xla'")
        if cfg.max_bounces <= 1:
            raise ValueError(
                "render_loss(backend='mxu'): MaxBounces==1 flat-shade has "
                "no mxu path; use backend='xla'")
        mm = scene.mxu_meta
        if mm is None or not mm.supported:
            raise ValueError(
                "render_loss(backend='mxu'): scene exceeds the mxu table "
                "limits (<=2047 tris / <=128 materials/spheres); use "
                "backend='wavefront2' or 'xla'")
        from ..ops.trace_ref import render_mxu_replay
        img = render_mxu_replay(full, cam, frame_index, cfg,
                                interpret=backend.endswith("_interpret"),
                                remat=remat)
        return jnp.mean((img - target) ** 2)
    if (bands > 1 and backend.startswith("wavefront2")
            and cfg.max_bounces > 1 and soft_tau == 0.0):
        from ..ops.pallas.megakernel import image_to_slots, use_block8
        from ..ops.wavefront2 import render_rays_wavefront2
        n = cfg.num_pixels
        band = -(-n // bands)
        if use_block8(cfg.width, cfg.height):
            tgt = image_to_slots(target, cfg.width, cfg.height)
        else:
            tgt = target.reshape(-1, 3)
        pad = band * bands - n
        if pad:
            tgt = jnp.concatenate([tgt, jnp.zeros((pad, 3), jnp.float32)])
        mask = (jnp.arange(band * bands) < n).astype(jnp.float32)
        offs = jnp.arange(bands, dtype=jnp.int32) * band

        def body(acc, xs):
            off, t_b, m_b = xs
            img = render_rays_wavefront2(
                full, cam, frame_index, cfg, pixel_offset=off,
                n_rays=band,
                interpret=backend.endswith("_interpret"))
            return acc + jnp.sum(m_b[:, None] * (img - t_b) ** 2), None

        loss, _ = jax.lax.scan(
            body, jnp.float32(0.0),
            (offs, tgt.reshape(bands, band, 3),
             mask.reshape(bands, band)))
        return loss / jnp.float32(n * 3)
    if soft_tau > 0.0:
        from ..ops.trace_ref import pixel_grid
        from .silhouette import render_soft_primary
        x, y = pixel_grid(cfg.width, cfg.height)
        img = render_soft_primary(full, cam, x, y, frame_index, cfg,
                                  tau=soft_tau, backend=backend,
                                  remat=remat)
        img = img.reshape(cfg.height, cfg.width, 3)
    else:
        img = render_dispatch(full, cam, frame_index, cfg, backend=backend,
                              remat=remat)
    return jnp.mean((img - target) ** 2)


loss_and_grad = jax.jit(
    jax.value_and_grad(render_loss),
    static_argnames=("cfg", "backend", "remat", "rebuild_tri_geometry",
                     "soft_tau", "bands"))


@dataclass(frozen=True)
class InverseRenderConfig:
    steps: int = 100
    learning_rate: float = 2e-2
    remat: bool = True
    backend: str = "xla"
    rebuild_tri_geometry: bool = True
    vary_seed: bool = True   # new RNG stream per step (stochastic gradients)


def inverse_render(scene: TracerScene, cam: CameraSpec, target,
                   cfg: RenderConfig, opt_cfg: InverseRenderConfig,
                   init_params: SceneParams | None = None,
                   param_mask=None, callback=None):
    """Adam descent on scene parameters toward `target`.

    param_mask: optional SceneParams of 0/1 floats freezing entries (grads
    are multiplied by it) — e.g. optimize only one sphere's position.
    Returns (final SceneParams, list of losses).
    """
    params = init_params if init_params is not None else extract_params(scene)
    opt = optax.adam(opt_cfg.learning_rate)
    opt_state = opt.init(params)
    losses = []

    @partial(jax.jit, static_argnames=())
    def step(params, opt_state, frame_index):
        loss, grads = loss_and_grad(params, scene, cam, target, frame_index,
                                    cfg, opt_cfg.backend, opt_cfg.remat,
                                    opt_cfg.rebuild_tri_geometry)
        if param_mask is not None:
            grads = jax.tree.map(lambda g, m: g * m, grads, param_mask)
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    for i in range(opt_cfg.steps):
        fi = jnp.uint32(1 + (i if opt_cfg.vary_seed else 0))
        params, opt_state, loss = step(params, opt_state, fi)
        losses.append(float(loss))
        if callback is not None:
            callback(i, losses[-1], params)
    return params, losses
