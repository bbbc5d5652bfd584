"""CLI entry (C1), measure harness (C29) and checkpoint/resume (§5.4)."""
from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from rtm_tpu import Camera, RenderConfig, build_tracer_scene, load_scene
from rtm_tpu.__main__ import main as cli_main
from rtm_tpu.bench.measure import run_measure, summarize
from rtm_tpu.bench.view_perf import load as vp_load, main as vp_main
from rtm_tpu.runtime.checkpoint import (load_pytree, load_render_state,
                                        save_pytree, save_render_state)


def test_cli_scenes(capsys):
    assert cli_main(["scenes"]) == 0
    out = capsys.readouterr().out
    assert "Cornell box" in out and out.count(":") >= 5


def test_cli_render(tmp_path):
    out = tmp_path / "r.png"
    rc = cli_main(["render", "--scene", "1", "--width", "16", "--height",
                   "16", "--bounces", "2", "--frames", "2",
                   "--backend", "xla", "--out", str(out)])
    assert rc == 0 and out.exists() and out.stat().st_size > 50


def test_measure_and_viewperf(tmp_path, capsys):
    scene = build_tracer_scene(load_scene(1))
    cfg = RenderConfig(width=16, height=16, max_bounces=2, max_frames=1,
                       draw_environment=True)
    path = str(tmp_path / "Measure.txt")
    arr = run_measure(scene, cfg, out_path=path, angle_step=60.0,
                      frames_per_sample=2)
    assert arr.shape == (6, 2)
    stats = summarize(arr)
    assert stats["min_fps"] <= stats["mean_fps"] <= stats["max_fps"]
    # round-trip through the viewPerf-parity reader
    arr2 = vp_load(path)
    np.testing.assert_allclose(arr2[:, 0], arr[:, 0])
    vp_main(path, plot=False)
    assert "Mean:" in capsys.readouterr().out


def test_checkpoint_pytree_roundtrip(tmp_path):
    scene = build_tracer_scene(load_scene(1))
    p = str(tmp_path / "ckpt.npz")
    save_pytree(p, scene, extra={"note": "x"})
    restored, extra = load_pytree(p, scene)
    assert extra["note"] == "x"
    np.testing.assert_array_equal(np.asarray(restored.sph_pos),
                                  np.asarray(scene.sph_pos))
    np.testing.assert_array_equal(np.asarray(restored.materials.albedo),
                                  np.asarray(scene.materials.albedo))


def test_checkpoint_bf16_leaf_roundtrip(tmp_path):
    """Regression for the npz void-dtype widening fix (commit a0c9510):
    bfloat16 leaves must survive save/load with dtype AND values intact
    (np.savez can't store bf16 natively; checkpoint.py widens to f32 and
    casts back on load)."""
    tree = {
        "w_bf16": jnp.asarray(np.linspace(-3, 3, 17), jnp.bfloat16),
        "w_f32": jnp.asarray(np.linspace(0, 1, 5), jnp.float32),
        "n_i32": jnp.arange(4, dtype=jnp.int32),
    }
    p = str(tmp_path / "bf16.npz")
    save_pytree(p, tree)
    restored, _ = load_pytree(p, tree)
    assert restored["w_bf16"].dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(restored["w_bf16"].astype(jnp.float32)),
        np.asarray(tree["w_bf16"].astype(jnp.float32)))
    assert restored["n_i32"].dtype == jnp.int32
    np.testing.assert_array_equal(np.asarray(restored["n_i32"]),
                                  np.asarray(tree["n_i32"]))


def test_checkpoint_render_state_resume(tmp_path):
    """Progressive accumulation survives a save/load (reference resets on
    any interruption — SURVEY §5.4; we must not)."""
    from rtm_tpu.runtime.renderer import accumulate_step

    scene = build_tracer_scene(load_scene(1))
    cam = Camera().spec(16, 16)
    cfg = RenderConfig(width=16, height=16, max_bounces=2, max_frames=1,
                       draw_environment=True)
    accum = jnp.zeros((16, 16, 3), jnp.float32)
    for fi in range(1, 4):
        accum, out = accumulate_step(scene, cam, accum, np.uint32(fi), cfg)
    p = str(tmp_path / "render.npz")
    save_render_state(p, accum, 3, scene=scene)
    like = {"accum": accum, "scene": scene}
    state, frame_index = load_render_state(p, like)
    assert frame_index == 3
    # resuming produces the same image as an uninterrupted run
    a_resumed, out_resumed = accumulate_step(
        state["scene"], cam, jnp.asarray(state["accum"]), np.uint32(4), cfg)
    a_direct, out_direct = accumulate_step(scene, cam, accum, np.uint32(4),
                                           cfg)
    np.testing.assert_allclose(np.asarray(out_resumed),
                               np.asarray(out_direct), atol=1e-6)


def test_nan_guards():
    """SURVEY §5.2 numeric validation layer: checkify float_checks flags a
    poisoned scene, passes a clean one; output assertion likewise."""
    import dataclasses

    import pytest

    from rtm_tpu import Camera, RenderConfig, build_tracer_scene, load_scene
    from rtm_tpu.utils.guards import (assert_image_finite,
                                      checked_render_dispatch)

    scene = build_tracer_scene(load_scene(1))
    cam = Camera().spec(12, 12)
    cfg = RenderConfig(width=12, height=12, max_bounces=2, max_frames=1,
                       draw_environment=True)
    img = checked_render_dispatch(scene, cam, jnp.uint32(1), cfg)
    assert_image_finite(img)

    bad = dataclasses.replace(
        scene, sph_pos=scene.sph_pos.at[0, 0].set(jnp.nan))
    with pytest.raises(Exception) as ei:
        checked_render_dispatch(bad, cam, jnp.uint32(1), cfg)
    assert "nan" in str(ei.value).lower()

    with pytest.raises(FloatingPointError):
        assert_image_finite(jnp.array([1.0, jnp.inf, 2.0]))
