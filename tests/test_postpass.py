"""The compacted texture post-pass (megakernel.mega_postpass_compact,
round 5): parity with the dense form on real kernel records, the
capacity-overflow fallback branch, and multi-frame accumulation.

The routing itself (mega_postpass -> compact for textured bounces>1) is
exercised by every textured-scene oracle test; these pin the pieces the
oracle tests cannot reach — the lax.cond dense fallback and the cap knob.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rtm_tpu import Camera, RenderConfig, build_tracer_scene, load_scene
import rtm_tpu.ops.pallas.megakernel as M
import rtm_tpu.ops.pallas.mxu_kernel as MX


@pytest.fixture(scope="module")
def records():
    """Real (color, miss, rec) from one mxu-interpret dispatch on the
    textured Cornell scene."""
    cfg = RenderConfig(width=32, height=32, max_bounces=4, max_frames=2,
                       draw_environment=True)
    cam = Camera().spec(32, 32)
    scene = build_tracer_scene(load_scene(3))
    outs = {}
    orig = M.mega_postpass

    def capture(color, miss, rec, scene_, cfg_, n_):
        outs["c"], outs["m"], outs["r"] = color, miss, rec
        return orig(color, miss, rec, scene_, cfg_, n_)

    MX.mega_postpass = capture
    try:
        _ = np.asarray(MX.render_rays_mxu(
            scene, cam, jnp.uint32(1), cfg, pixel_offset=jnp.int32(0),
            n_rays=32 * 32, interpret=True))
    finally:
        MX.mega_postpass = orig
    return scene, cfg, outs["c"], outs["m"], outs["r"]


def test_compact_matches_dense(records):
    scene, cfg, color, miss, rec = records
    n = cfg.width * cfg.height
    a = np.asarray(M.mega_postpass_dense(color, miss, rec, scene, cfg, n))
    b = np.asarray(M.mega_postpass_compact(color, miss, rec, scene, cfg, n))
    np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-5)


def test_overflow_falls_back_to_dense(records):
    """cap smaller than the significant-record count must take the lax.cond
    dense branch and still produce the exact dense result."""
    scene, cfg, color, miss, rec = records
    n = cfg.width * cfg.height
    # sanity: the tiny cap really is below the significant count
    r = np.asarray(rec)
    texid = r[6::8, :n]
    s_abs = np.abs(r[0::8, :n]) + np.abs(r[1::8, :n]) + np.abs(r[2::8, :n])
    n_sig = int(((texid > -0.5) | (s_abs > 0)).sum())
    assert n_sig > 8
    a = np.asarray(M.mega_postpass_dense(color, miss, rec, scene, cfg, n))
    b = np.asarray(M.mega_postpass_compact(color, miss, rec, scene, cfg, n,
                                           cap=8))
    np.testing.assert_allclose(b, a, rtol=1e-6, atol=1e-6)


def test_dense_env_override(records, monkeypatch):
    """RTM_DENSE_POSTPASS=1 must route mega_postpass to the dense form."""
    scene, cfg, color, miss, rec = records
    n = cfg.width * cfg.height
    monkeypatch.setenv("RTM_DENSE_POSTPASS", "1")
    a = np.asarray(M.mega_postpass(color, miss, rec, scene, cfg, n))
    monkeypatch.delenv("RTM_DENSE_POSTPASS")
    b = np.asarray(M.mega_postpass_dense(color, miss, rec, scene, cfg, n))
    np.testing.assert_allclose(a, b, rtol=0, atol=0)


def test_seg_scan8_matches_numpy():
    """Segmented inclusive scan vs a per-segment numpy reference."""
    rng = np.random.default_rng(3)
    L, B = 257, 8
    first_np = rng.random(L) < 0.3
    first_np[::B] = True          # _seg_scan8 contract: runs <= B elements
    vals = rng.random((L, 3)).astype(np.float32) + 0.5
    for op, combine, init in (("add", np.add, 0.0), ("mul", np.multiply,
                                                     1.0)):
        got = np.asarray(M._seg_scan8(
            jnp.asarray(first_np), jnp.asarray(vals), B, op))
        want = np.empty_like(vals)
        run = np.full(3, init, np.float64)
        seg_len = 0
        for j in range(L):
            if first_np[j]:
                run = np.full(3, init, np.float64)
                seg_len = 0
            seg_len += 1
            assert seg_len <= B, "test segments must respect the contract"
            run = combine(run, vals[j].astype(np.float64))
            want[j] = run
        np.testing.assert_allclose(got, want.astype(np.float32),
                                   rtol=1e-5, atol=1e-6)
