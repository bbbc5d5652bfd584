"""Gradient correctness: autodiff vs central finite differences.

BASELINE.md gradient targets: material (albedo/roughness/emission) and
geometry (sphere center/radius, vertex) parameters.  Hit topology is
detached (argmin), so FD agreement is checked on smooth configurations; the
tolerance for geometry params absorbs silhouette-pixel noise.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rtm_tpu import (Camera, Material, Mesh, MeshInstance, RenderConfig,
                     Scene, SphereDef, Triangle, build_tracer_scene)
from rtm_tpu.diff import (InverseRenderConfig, SceneParams, apply_params,
                          extract_params, inverse_render, render_loss)
from rtm_tpu.models import scenes as builtin


def _scene():
    s = Scene(sky=builtin._procedural_sky())
    s.add_material(Material((0.7, 0.4, 0.2), (1, 1, 1), 0.3, 0.2, 0, 1.0, -1))
    s.add_material(Material((1, 1, 1), (0.9, 0.8, 0.7), 0, 0, 2.0, 1.0, -1))
    s.add_sphere(SphereDef((0, 0, -2.5), 1.0, 0))
    s.add_sphere(SphereDef((0, -101, -2), 100.0, 0))
    s.add_sphere(SphereDef((1.5, 2.0, -2.0), 0.8, 1))
    s.add_mesh(Mesh.from_triangles([
        Triangle((-2.5, -0.8, -4), (2.5, -0.8, -4), (0, 2.5, -4))]))
    s.add_object(MeshInstance(mesh_id=0, material_id=0))
    return build_tracer_scene(s)


CFG = RenderConfig(width=24, height=20, max_bounces=3, draw_environment=True)
FI = jnp.uint32(1)


def _loss_fn(ts, cam):
    target = jnp.zeros((CFG.height, CFG.width, 3), jnp.float32)

    def f(params):
        return render_loss(params, ts, cam, target, FI, CFG, remat=False)
    return f


def _fd_check(setup, get, set_, eps, tol):
    """Central finite difference along one scalar coordinate, against the
    autodiff gradient computed once for the whole module."""
    ts, cam, f, params, g = setup
    auto = float(get(g))
    p_plus = set_(params, get(params) + eps)
    p_minus = set_(params, get(params) - eps)
    fd = (float(f(p_plus)) - float(f(p_minus))) / (2 * eps)
    denom = max(abs(fd), abs(auto), 1e-8)
    rel = abs(auto - fd) / denom
    assert rel < tol, f"autodiff {auto} vs fd {fd} (rel {rel:.4f})"
    assert abs(auto) > 0, "gradient identically zero — parameter unused?"


@pytest.fixture(scope="module")
def setup():
    ts = _scene()
    cam = Camera().spec(CFG.width, CFG.height)
    f = _loss_fn(ts, cam)
    params = extract_params(ts)
    g = jax.grad(f)(params)   # one backward compile for the whole module
    return ts, cam, f, params, g


def test_grad_albedo(setup):
    p = setup[3]
    _fd_check(setup,
              lambda q: q.albedo[0, 0],
              lambda q, v: q.__class__(**{**q.__dict__, "albedo": q.albedo.at[0, 0].set(v)}),
              eps=1e-3, tol=2e-2)


def test_grad_emission_power(setup):
    p = setup[3]
    _fd_check(setup,
              lambda q: q.emission_power[1],
              lambda q, v: q.__class__(**{**q.__dict__, "emission_power": q.emission_power.at[1].set(v)}),
              eps=1e-3, tol=2e-2)


def test_grad_emission_color(setup):
    p = setup[3]
    _fd_check(setup,
              lambda q: q.emission_color[1, 1],
              lambda q, v: q.__class__(**{**q.__dict__, "emission_color": q.emission_color.at[1, 1].set(v)}),
              eps=1e-3, tol=2e-2)


def test_grad_roughness(setup):
    p = setup[3]
    _fd_check(setup,
              lambda q: q.roughness[0],
              lambda q, v: q.__class__(**{**q.__dict__, "roughness": q.roughness.at[0].set(v)}),
              eps=1e-3, tol=5e-2)


def test_grad_sphere_center_smooth_component(setup):
    """z-coordinate of the big diffuse sphere: shading-dominated, so the
    detached-topology gradient matches FD."""
    _fd_check(setup,
              lambda q: q.sph_pos[0, 2],
              lambda q, v: q.__class__(**{**q.__dict__, "sph_pos": q.sph_pos.at[0, 2].set(v)}),
              eps=2e-2, tol=0.2)


@pytest.fixture(scope="module")
def interior_setup():
    """Geometry-gradient rig: loss over a pixel window strictly interior to
    the sphere's projection, so silhouette (visibility-discontinuity) terms
    vanish and FD probes only the continuous gradient component that
    detached-topology autodiff models.  (Full silhouette gradients need
    soft-visibility/edge reparameterization — SURVEY.md hard part #4,
    documented future work.)"""
    s = Scene(sky=builtin._procedural_sky())
    s.add_material(Material((0.7, 0.4, 0.2), (1, 1, 1), 0.0, 0.0, 0, 1.0, -1))
    s.add_material(Material((1, 1, 1), (0.9, 0.8, 0.7), 0, 0, 2.0, 1.0, -1))
    s.add_sphere(SphereDef((0, 1.0, -1.0), 1.0, 0))      # fills view center
    s.add_sphere(SphereDef((3.0, 4.0, -1.0), 1.0, 1))    # off-axis light
    ts = build_tracer_scene(s)
    cam = Camera().spec(CFG.width, CFG.height)

    def f(params):
        full = apply_params(ts, params, rebuild_tri_geometry=False)
        from rtm_tpu.ops.trace_ref import render_dispatch
        img = render_dispatch(full, cam, FI, CFG)
        win = img[8:12, 10:14]   # strictly interior to the sphere image
        return jnp.mean(win ** 2)

    params = extract_params(ts)
    g = jax.grad(f)(params)
    return ts, cam, f, params, g


def test_grad_sphere_center_interior(interior_setup):
    _fd_check(interior_setup,
              lambda q: q.sph_pos[0, 1],
              lambda q, v: q.__class__(**{**q.__dict__, "sph_pos": q.sph_pos.at[0, 1].set(v)}),
              eps=2e-2, tol=0.2)


def test_grad_sphere_radius_interior(interior_setup):
    _fd_check(interior_setup,
              lambda q: q.sph_radius[0],
              lambda q, v: q.__class__(**{**q.__dict__, "sph_radius": q.sph_radius.at[0].set(v)}),
              eps=2e-2, tol=0.2)


def test_grad_vertex(setup):
    p = setup[3]
    _fd_check(setup,
              lambda q: q.tri_verts[0, 2, 1],
              lambda q, v: q.__class__(**{**q.__dict__, "tri_verts": q.tri_verts.at[0, 2, 1].set(v)}),
              eps=2e-3, tol=0.15)


# ---------------------------------------------------------------------------
# mxu record-replay gradients (round 5): the fast forward's grad path
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def mxu_setup():
    """Same rig as `setup` but through render_loss(backend='mxu_interpret')
    — the record-replay path (ops/trace_ref.py render_mxu_replay)."""
    ts = _scene()
    cam = Camera().spec(CFG.width, CFG.height)
    target = jnp.zeros((CFG.height, CFG.width, 3), jnp.float32)

    def f(params):
        return render_loss(params, ts, cam, target, FI, CFG,
                           backend="mxu_interpret", remat=False)

    params = extract_params(ts)
    g = jax.grad(f)(params)
    return ts, cam, f, params, g


def test_mxu_replay_grads_match_xla(setup, mxu_setup):
    """The replay gradient equals the reference xla-backend gradient on
    every parameter (same detached-topology convention, same semantics)."""
    g_xla = setup[4]
    g_mxu = mxu_setup[4]
    for k in vars(g_xla):
        a, b = np.asarray(getattr(g_xla, k)), np.asarray(getattr(g_mxu, k))
        np.testing.assert_allclose(b, a, rtol=1e-3, atol=1e-5,
                                   err_msg=f"param {k}")


def test_mxu_grad_albedo_fd(mxu_setup):
    _fd_check(mxu_setup,
              lambda q: q.albedo[0, 0],
              lambda q, v: q.__class__(**{**q.__dict__, "albedo": q.albedo.at[0, 0].set(v)}),
              eps=1e-3, tol=2e-2)


def test_mxu_grad_emission_power_fd(mxu_setup):
    _fd_check(mxu_setup,
              lambda q: q.emission_power[1],
              lambda q, v: q.__class__(**{**q.__dict__, "emission_power": q.emission_power.at[1].set(v)}),
              eps=1e-3, tol=2e-2)


def test_mxu_grad_roughness_fd(mxu_setup):
    _fd_check(mxu_setup,
              lambda q: q.roughness[0],
              lambda q, v: q.__class__(**{**q.__dict__, "roughness": q.roughness.at[0].set(v)}),
              eps=1e-3, tol=5e-2)


def test_mxu_grad_sphere_center_fd(mxu_setup):
    _fd_check(mxu_setup,
              lambda q: q.sph_pos[0, 2],
              lambda q, v: q.__class__(**{**q.__dict__, "sph_pos": q.sph_pos.at[0, 2].set(v)}),
              eps=2e-2, tol=0.2)


def test_mxu_grad_vertex_fd(mxu_setup):
    _fd_check(mxu_setup,
              lambda q: q.tri_verts[0, 2, 1],
              lambda q, v: q.__class__(**{**q.__dict__, "tri_verts": q.tri_verts.at[0, 2, 1].set(v)}),
              eps=2e-3, tol=0.15)


def test_mxu_grad_loud_on_unsupported():
    """The grad dispatch must raise, never silently reroute (VERDICT r4
    weak #5): flat-shade preview and soft_tau have no mxu replay path."""
    ts = _scene()
    cam = Camera().spec(CFG.width, CFG.height)
    target = jnp.zeros((CFG.height, CFG.width, 3), jnp.float32)
    p = extract_params(ts)
    cfg1 = RenderConfig(width=CFG.width, height=CFG.height, max_bounces=1,
                        draw_environment=True)
    with pytest.raises(ValueError, match="flat-shade"):
        render_loss(p, ts, cam, target, FI, cfg1, backend="mxu_interpret")
    with pytest.raises(ValueError, match="soft"):
        render_loss(p, ts, cam, target, FI, CFG, backend="mxu_interpret",
                    soft_tau=0.05)


def test_remat_grads_match(setup):
    """jax.checkpoint over the bounce scan must not change gradients."""
    ts, cam, f, p, _ = setup
    target = jnp.zeros((CFG.height, CFG.width, 3), jnp.float32)
    g_plain = jax.grad(lambda q: render_loss(q, ts, cam, target, FI, CFG,
                                             remat=False))(p)
    g_remat = jax.grad(lambda q: render_loss(q, ts, cam, target, FI, CFG,
                                             remat=True))(p)
    for a, b in zip(jax.tree.leaves(g_plain), jax.tree.leaves(g_remat)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_apply_params_roundtrip(setup):
    ts, cam, f, p, _ = setup
    ts2 = apply_params(ts, p)
    np.testing.assert_allclose(np.asarray(ts2.tri_normal),
                               np.asarray(ts.tri_normal), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(ts2.sph_pos), np.asarray(ts.sph_pos))


def test_apply_params_roundtrip_instanced_scene3():
    """Vertex-optimization parity on a scene with non-identity instance
    transforms (scene 3's rotated+scaled dragons): rebuilding triangle
    geometry from unchanged world vertices must reproduce the build-time
    local-space UV-quirk arrays and shader normals through the stored
    world->local transforms (scene.tri_inv_model)."""
    ts = build_tracer_scene(builtin.load_scene(3))
    p = extract_params(ts)
    ts2 = apply_params(ts, p, rebuild_tri_geometry=True)
    for name in ("tri_la", "tri_lab", "tri_lac"):
        a = np.asarray(getattr(ts, name))
        b = np.asarray(getattr(ts2, name))
        scale = np.maximum(np.abs(a).max(), 1.0)
        np.testing.assert_allclose(b, a, atol=2e-5 * scale, err_msg=name)
    # normals: direction agreement (f32 recompute amplifies only on
    # near-degenerate slivers; measured worst cos 0.9985 on a 1e-9-area tri)
    cos = (np.asarray(ts.tri_normal) * np.asarray(ts2.tri_normal)).sum(-1)
    assert cos.min() > 0.99


def test_grad_vertex_instanced_transform():
    """Vertex gradients flow (finite, nonzero) through a mesh with a
    NON-IDENTITY instance transform — the configuration the identity-only
    rebuild of round 1 silently mis-handled.  (Scene 3 itself has a.e.
    ZERO vertex gradient at low bounce counts: the box is closed so the
    sky is unreachable after bounce 0, emission is constant, and the
    checker albedo is piecewise-constant — the only geometry dependence
    is the detached hit topology.  Under an open sky the shading normal
    gives a smooth, nonzero path.)"""
    s = Scene(sky=builtin._procedural_sky())
    s.add_material(Material((0.7, 0.6, 0.5), (1, 1, 1), 0.2, 0, 0, 1.0, -1))
    s.add_mesh(Mesh.from_triangles([
        Triangle((-1, -0.5, -1), (1, -0.5, -1), (0, 1, -1))]))
    s.add_object(MeshInstance(mesh_id=0, material_id=0,
                              position=np.array([0.2, 0.8, -2.0]),
                              rotation=np.array([0.0, 35.0, 0.0]),
                              scale=np.array([1.5, 1.5, 1.5])))
    ts = build_tracer_scene(s)
    cam = Camera().spec(CFG.width, CFG.height)
    target = jnp.zeros((CFG.height, CFG.width, 3), jnp.float32)

    def f(params):
        return render_loss(params, ts, cam, target, FI, CFG)

    g = jax.grad(f)(extract_params(ts)).tri_verts
    g = np.asarray(g)
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 0.0


@pytest.mark.slow
def test_inverse_render_recovers_albedo_and_emission():
    """BASELINE config 5 (reduced): recover perturbed albedo + light
    emission power from the target image."""
    ts = _scene()
    cam = Camera().spec(CFG.width, CFG.height)
    true_params = extract_params(ts)
    from rtm_tpu.ops.trace_ref import render_dispatch
    target = render_dispatch(ts, cam, FI, CFG)

    # perturb
    p0 = true_params.__class__(**{
        **true_params.__dict__,
        "albedo": true_params.albedo.at[0].set(jnp.asarray([0.3, 0.6, 0.6])),
        "emission_power": true_params.emission_power.at[1].set(1.0),
    })
    opt_cfg = InverseRenderConfig(steps=150, learning_rate=4e-2, remat=False,
                                  vary_seed=False)
    # optimize only albedo + emission power (geometry frozen via mask)
    mask = jax.tree.map(jnp.zeros_like, p0)
    mask = mask.__class__(**{**mask.__dict__,
                             "albedo": jnp.ones_like(p0.albedo),
                             "emission_power": jnp.ones_like(p0.emission_power)})
    p_fit, losses = inverse_render(ts, cam, target, CFG, opt_cfg,
                                   init_params=p0, param_mask=mask)
    assert losses[-1] < losses[0] * 0.05, (losses[0], losses[-1])
    np.testing.assert_allclose(np.asarray(p_fit.albedo[0]),
                               np.asarray(true_params.albedo[0]), atol=0.08)
    assert abs(float(p_fit.emission_power[1]) - 2.0) < 0.3


# ---------------------------------------------------------------------------
# Silhouette gradients (SURVEY Phase 4 hard part #4): soft primary
# visibility removes the round-1 "interior-only" caveat.
# ---------------------------------------------------------------------------

def _silhouette_scene():
    """One sphere floating against the sky: every edge pixel is a
    primary-visibility silhouette — the exact configuration where the
    detached-topology gradient is zero."""
    s = Scene(sky=builtin._procedural_sky())
    s.add_material(Material((0.8, 0.3, 0.2), (1, 1, 1), 0.1, 0, 0, 1.0, -1))
    s.add_sphere(SphereDef((0.0, 1.0, -3.0), 0.7, 0))
    return build_tracer_scene(s)


def test_silhouette_sphere_center_fd():
    """Autodiff of the soft-primary render matches central finite
    differences INCLUDING silhouette pixels (no interior-only masking)."""
    from rtm_tpu.diff.silhouette import render_soft_primary
    from rtm_tpu.ops.trace_ref import pixel_grid

    ts = _silhouette_scene()
    cfg = RenderConfig(width=24, height=20, max_bounces=2,
                       draw_environment=True)
    cam = Camera().spec(cfg.width, cfg.height)
    x, y = pixel_grid(cfg.width, cfg.height)
    tau = 0.05

    def loss(cx):
        sc = ts.__class__(**{**ts.__dict__,
                             "sph_pos": ts.sph_pos.at[0, 0].set(cx)})
        img = render_soft_primary(sc, cam, x, y, FI, cfg, tau=tau)
        return jnp.mean(img ** 2)

    c0 = ts.sph_pos[0, 0]
    g = float(jax.grad(loss)(c0))
    eps = 1e-3
    fd = (float(loss(c0 + eps)) - float(loss(c0 - eps))) / (2 * eps)
    # the hard detached-topology gradient of this scene is ~0 by
    # construction; the soft gradient must be nonzero and FD-consistent
    assert abs(fd) > 1e-4, fd
    np.testing.assert_allclose(g, fd, rtol=0.08, atol=1e-4)


def test_silhouette_radius_fd():
    from rtm_tpu.diff.silhouette import render_soft_primary
    from rtm_tpu.ops.trace_ref import pixel_grid

    ts = _silhouette_scene()
    cfg = RenderConfig(width=24, height=20, max_bounces=2,
                       draw_environment=True)
    cam = Camera().spec(cfg.width, cfg.height)
    x, y = pixel_grid(cfg.width, cfg.height)

    def loss(r):
        sc = ts.__class__(**{**ts.__dict__,
                             "sph_radius": ts.sph_radius.at[0].set(r)})
        img = render_soft_primary(sc, cam, x, y, FI, cfg, tau=0.05)
        return jnp.mean(img ** 2)

    r0 = ts.sph_radius[0]
    g = float(jax.grad(loss)(r0))
    eps = 1e-3
    fd = (float(loss(r0 + eps)) - float(loss(r0 - eps))) / (2 * eps)
    assert abs(fd) > 1e-4
    np.testing.assert_allclose(g, fd, rtol=0.08, atol=1e-4)


def test_soft_primary_converges_to_hard():
    """tau -> 0 recovers the hard render away from the edge band."""
    from rtm_tpu.diff.silhouette import render_soft_primary
    from rtm_tpu.ops.trace_ref import pixel_grid, render_pixels

    ts = _silhouette_scene()
    cfg = RenderConfig(width=24, height=20, max_bounces=2,
                       draw_environment=True)
    cam = Camera().spec(cfg.width, cfg.height)
    x, y = pixel_grid(cfg.width, cfg.height)
    hard = np.asarray(render_pixels(ts, cam, x, y, FI, cfg))
    soft = np.asarray(render_soft_primary(ts, cam, x, y, FI, cfg, tau=1e-4))
    frac_diff = (np.abs(hard - soft).max(axis=-1) > 1e-3).mean()
    assert frac_diff < 0.02          # only the 1-2 px edge band may differ


def test_silhouette_occluder_over_object_fd():
    """Object-over-OBJECT silhouette (r2 review item 6): a sphere edge in
    front of a bright triangle.  The soft blend must target the occluded
    triangle's shaded radiance (not sky), so autodiff of the edge term
    matches finite differences in the sphere center."""
    from rtm_tpu.diff.silhouette import render_soft_primary
    from rtm_tpu.models.mesh import Mesh, MeshInstance, Triangle
    from rtm_tpu.ops.trace_ref import pixel_grid

    s = Scene(sky=builtin._procedural_sky())
    s.add_material(Material((0.8, 0.3, 0.2), (1, 1, 1), 0.1, 0, 0, 1.0, -1))
    # bright emissive triangle BEHIND the sphere: de-occluded radiance is
    # very different from the sky, so a sky-biased blend would fail FD
    s.add_material(Material((1, 1, 1), (1.0, 0.9, 0.2), 0, 0, 5.0, 1.0, -1))
    s.add_sphere(SphereDef((0.0, 1.0, -3.0), 0.7, 0))
    s.add_mesh(Mesh.from_triangles([
        Triangle((-3.0, -1.0, -6.0), (3.0, -1.0, -6.0), (0.0, 4.0, -6.0))]))
    s.add_object(MeshInstance(mesh_id=0, material_id=1))
    ts = build_tracer_scene(s)

    cfg = RenderConfig(width=24, height=20, max_bounces=2,
                       draw_environment=True)
    cam = Camera().spec(cfg.width, cfg.height)
    x, y = pixel_grid(cfg.width, cfg.height)

    def loss(cx):
        sc = ts.__class__(**{**ts.__dict__,
                             "sph_pos": ts.sph_pos.at[0, 0].set(cx)})
        img = render_soft_primary(sc, cam, x, y, FI, cfg, tau=0.05)
        return jnp.mean(img ** 2)

    c0 = ts.sph_pos[0, 0]
    g = float(jax.grad(loss)(c0))
    eps = 1e-3
    fd = (float(loss(c0 + eps)) - float(loss(c0 - eps))) / (2 * eps)
    assert abs(fd) > 1e-4, fd
    np.testing.assert_allclose(g, fd, rtol=0.08, atol=1e-4)


def test_inverse_render_mxu_replay_recovers_albedo():
    """BASELINE config 5 through the PRODUCTION grad path: the optimizer
    loop driven by the mxu record-replay gradients (round 5) recovers a
    perturbed albedo — end-to-end, not just a grad-parity check."""
    ts = _scene()
    cam = Camera().spec(CFG.width, CFG.height)
    true_params = extract_params(ts)
    from rtm_tpu.ops.trace_ref import render_dispatch
    target = render_dispatch(ts, cam, FI, CFG)

    p0 = true_params.__class__(**{
        **true_params.__dict__,
        "albedo": true_params.albedo.at[0].set(
            jnp.asarray([0.3, 0.6, 0.6])),
    })
    opt_cfg = InverseRenderConfig(steps=80, learning_rate=4e-2,
                                  remat=False, vary_seed=False,
                                  backend="mxu_interpret")
    mask = jax.tree.map(jnp.zeros_like, p0)
    mask = mask.__class__(**{**mask.__dict__,
                             "albedo": jnp.ones_like(p0.albedo)})
    p_fit, losses = inverse_render(ts, cam, target, CFG, opt_cfg,
                                   init_params=p0, param_mask=mask)
    assert losses[-1] < losses[0] * 0.1, (losses[0], losses[-1])
    np.testing.assert_allclose(np.asarray(p_fit.albedo[0]),
                               np.asarray(true_params.albedo[0]),
                               atol=0.08)
