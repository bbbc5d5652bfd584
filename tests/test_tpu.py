"""On-hardware assertions (RTM_TPU_TESTS=1 + the axon TPU attached):
the fused kernels' TPU lowerings vs their CPU oracles — the bf16-split /
dynamic_gather / custom-vjp paths are exercised on the real chip here
(round-2 review item 9: no recorded hardware test pass existed).

Run: RTM_TPU_TESTS=1 python -m pytest tests/test_tpu.py -v
(the conftest keeps cpu as the default platform; these tests opt in to
the TPU with jax.default_device).  Compile-heavy: minutes on first run,
cached afterwards.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rtm_tpu import Camera, RenderConfig, build_tracer_scene, load_scene
from rtm_tpu.ops.trace_ref import render_dispatch

pytestmark = pytest.mark.tpu

CFG = RenderConfig(width=64, height=64, max_bounces=3, max_frames=1,
                   draw_environment=True)


def _tpu():
    devs = [d for d in jax.devices("axon") if d.platform != "cpu"]
    assert devs, "no TPU attached"
    return devs[0]


@pytest.fixture(scope="module")
def scene3():
    return build_tracer_scene(load_scene(3))


def test_megakernel_tpu_matches_xla_cpu(scene3, image_compare):
    cam = Camera().spec(CFG.width, CFG.height)
    ref = np.asarray(render_dispatch(scene3, cam, jnp.uint32(1), CFG,
                                     backend="xla"))
    with jax.default_device(_tpu()):
        got = np.asarray(render_dispatch(scene3, cam, jnp.uint32(1), CFG,
                                         backend="megakernel"))
    image_compare(ref, got)


def test_mxu_tpu_matches_xla_cpu(scene3, image_compare):
    """The round-4 headline backend on hardware: the bf16x3 K-stacked
    pair-test matmul, the t-mantissa index pack and the chunk-cull
    OR-tree vs the XLA oracle."""
    cam = Camera().spec(CFG.width, CFG.height)
    ref = np.asarray(render_dispatch(scene3, cam, jnp.uint32(1), CFG,
                                     backend="xla"))
    with jax.default_device(_tpu()):
        got = np.asarray(render_dispatch(scene3, cam, jnp.uint32(1), CFG,
                                         backend="mxu"))
    image_compare(ref, got)


def test_trav_tpu_matches_xla_cpu(scene3, image_compare):
    """The per-lane traversal kernel's dynamic_gather lowering + value-
    carried loops on real hardware vs the XLA oracle."""
    cam = Camera().spec(CFG.width, CFG.height)
    ref = np.asarray(render_dispatch(scene3, cam, jnp.uint32(1), CFG,
                                     backend="xla"))
    with jax.default_device(_tpu()):
        got = np.asarray(render_dispatch(scene3, cam, jnp.uint32(1), CFG,
                                         backend="trav"))
    image_compare(ref, got)


def test_wavefront2_grad_on_tpu(scene3):
    """The custom-vjp detached sweep differentiates ON HARDWARE and its
    material gradients match the CPU XLA path."""
    from rtm_tpu.diff.inverse import loss_and_grad
    from rtm_tpu.diff.params import extract_params
    cfg = RenderConfig(width=32, height=32, max_bounces=2, max_frames=1,
                       draw_environment=True)
    scene = build_tracer_scene(load_scene(2))
    cam = Camera().spec(cfg.width, cfg.height)
    params = extract_params(scene)
    target = jnp.full((cfg.height, cfg.width, 3), 0.3, jnp.float32)
    l_ref, g_ref = loss_and_grad(params, scene, cam, target, jnp.uint32(1),
                                 cfg, "xla", False, False)
    with jax.default_device(_tpu()):
        l_tpu, g_tpu = loss_and_grad(params, scene, cam, target,
                                     jnp.uint32(1), cfg, "wavefront2",
                                     False, False)
    np.testing.assert_allclose(float(l_tpu), float(l_ref), rtol=2e-3)
    for a, b in zip(jax.tree.leaves(g_tpu), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=1e-5)


def test_mxu_tpu_scene2_textured_open_sky(image_compare):
    """Round-5 risk surface (VERDICT r4 weak #4): the textured-material
    path + open-sky chunk culling through the mxu kernel ON HARDWARE —
    interpret mode cannot see the bf16x3 matmul behavior."""
    cfg = RenderConfig(width=48, height=48, max_bounces=3, max_frames=1,
                       draw_environment=True)
    scene = build_tracer_scene(load_scene(2))
    cam = Camera().spec(cfg.width, cfg.height)
    ref = np.asarray(render_dispatch(scene, cam, jnp.uint32(1), cfg,
                                     backend="xla"))
    with jax.default_device(_tpu()):
        got = np.asarray(render_dispatch(scene, cam, jnp.uint32(1), cfg,
                                         backend="mxu"))
    image_compare(ref, got)


def test_mxu_tpu_scene4(image_compare):
    cfg = RenderConfig(width=48, height=48, max_bounces=3, max_frames=1,
                       draw_environment=True)
    scene = build_tracer_scene(load_scene(4))
    cam = Camera().spec(cfg.width, cfg.height)
    ref = np.asarray(render_dispatch(scene, cam, jnp.uint32(1), cfg,
                                     backend="xla"))
    with jax.default_device(_tpu()):
        got = np.asarray(render_dispatch(scene, cam, jnp.uint32(1), cfg,
                                         backend="mxu"))
    image_compare(ref, got)


def test_mxu_tpu_spp2_accumulation(scene3, image_compare):
    """max_frames=2 (two samples per dispatch) through the mxu kernel on
    hardware: the per-frame record rows + miss rows + postpass frames
    loop."""
    cfg = RenderConfig(width=48, height=48, max_bounces=3, max_frames=2,
                       draw_environment=True)
    cam = Camera().spec(cfg.width, cfg.height)
    ref = np.asarray(render_dispatch(scene3, cam, jnp.uint32(1), cfg,
                                     backend="xla"))
    with jax.default_device(_tpu()):
        got = np.asarray(render_dispatch(scene3, cam, jnp.uint32(1), cfg,
                                         backend="mxu"))
    image_compare(ref, got)


def test_mxu_sharded_mesh1_on_tpu(scene3, image_compare):
    """render_sharded(backend='mxu') on the REAL chip with a 1-device
    mesh: the band-dispatch contract (pixel_offset slots, shard_map around
    the pallas_call) exercised on hardware (VERDICT r4 task 4a)."""
    from rtm_tpu.parallel.sharding import make_mesh, render_sharded
    cam = Camera().spec(CFG.width, CFG.height)
    ref = np.asarray(render_dispatch(scene3, cam, jnp.uint32(1), CFG,
                                     backend="xla"))
    dev = _tpu()
    mesh = make_mesh(devices=[dev])
    with jax.default_device(dev):
        got = np.asarray(render_sharded(scene3, cam, jnp.uint32(1), CFG,
                                        mesh, backend="mxu"))
    image_compare(ref, got)


def test_mxu_replay_grad_on_tpu():
    """The round-5 record-replay grad path differentiates ON HARDWARE:
    kernel hit records + XLA replay; material gradients match CPU xla."""
    from rtm_tpu.diff.inverse import loss_and_grad
    from rtm_tpu.diff.params import extract_params
    cfg = RenderConfig(width=32, height=32, max_bounces=2, max_frames=1,
                       draw_environment=True)
    scene = build_tracer_scene(load_scene(2))
    cam = Camera().spec(cfg.width, cfg.height)
    params = extract_params(scene)
    target = jnp.full((cfg.height, cfg.width, 3), 0.3, jnp.float32)
    l_ref, g_ref = loss_and_grad(params, scene, cam, target, jnp.uint32(1),
                                 cfg, "xla", False, False)
    with jax.default_device(_tpu()):
        l_tpu, g_tpu = loss_and_grad(params, scene, cam, target,
                                     jnp.uint32(1), cfg, "mxu",
                                     False, False)
    np.testing.assert_allclose(float(l_tpu), float(l_ref), rtol=2e-3)
    for a, b in zip(jax.tree.leaves(g_tpu), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=1e-5)
