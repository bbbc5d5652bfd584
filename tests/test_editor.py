"""Scene editor CRUD (C26 parity) + scene save/load round-trip.

The reference's ImGui panels mutate the host scene and push partial or
realloc'd GPU updates (RayTracing/src/RayTracing.cpp:164-463); every edit
resets progressive accumulation.  SceneEditor reproduces that protocol over
plain-dict ops (the viewer's POST /edit payloads)."""
from __future__ import annotations

import json
import urllib.request

import numpy as np
import pytest

from rtm_tpu import Camera, RenderConfig, build_tracer_scene, load_scene
from rtm_tpu.io.scene_io import load_scene_file, save_scene
from rtm_tpu.models.material import Material
from rtm_tpu.models.mesh import Mesh, MeshInstance
from rtm_tpu.models.scene import Scene, SphereDef
from rtm_tpu.runtime.editor import SceneEditor
from rtm_tpu.runtime.renderer import ProgressiveRenderer
from rtm_tpu.ops.trace_ref import render_dispatch

import jax.numpy as jnp

CFG = RenderConfig(width=24, height=24, max_bounces=3, max_frames=1,
                   draw_environment=True, accumulate=True)


def small_scene() -> Scene:
    s = Scene(sky=np.full((4, 8, 3), 0.5, np.float32))
    s.add_material(Material((0.8, 0.2, 0.2)))
    s.add_material(Material((1, 1, 1), (1, 1, 1), 0, 0, 2.0))
    s.add_sphere(SphereDef((0.0, 0.0, -2.0), 0.7, 0))
    s.add_sphere(SphereDef((0.0, 2.0, -2.0), 0.5, 1))
    return s


def render(scene: Scene) -> np.ndarray:
    ts = build_tracer_scene(scene)
    cam = Camera().spec(CFG.width, CFG.height)
    return np.asarray(render_dispatch(ts, cam, jnp.uint32(1), CFG))


def test_editor_material_edit_changes_image():
    scene = small_scene()
    ed = SceneEditor(scene)
    before = render(scene)
    ed.apply({"op": "set_material", "index": 0, "albedo": [0.1, 0.9, 0.1]})
    after = render(scene)
    assert not np.allclose(before, after)
    assert scene.materials[0].albedo == (0.1, 0.9, 0.1)


def test_editor_sphere_crud():
    scene = small_scene()
    ed = SceneEditor(scene)
    i = ed.apply({"op": "add_sphere", "position": [1, 0, -2],
                  "radius": 0.3, "material_id": 1})
    assert i == 2 and len(scene.spheres) == 3
    ed.apply({"op": "set_sphere", "index": i, "radius": 0.6})
    assert scene.spheres[i].radius == 0.6
    ed.apply({"op": "remove_sphere", "index": 0})
    assert len(scene.spheres) == 2
    # structural edit still renders (count change = realloc path)
    img = render(scene)
    assert np.isfinite(img).all()


def test_editor_instance_crud():
    scene = small_scene()
    tri = np.array([[[-1, -1, -3], [1, -1, -3], [0, 1, -3]]], np.float32)
    ed = SceneEditor(scene)
    mid = ed.add_mesh(tri)
    i = ed.apply({"op": "add_instance", "mesh_id": mid, "material_id": 0,
                  "position": [0, 0, 0]})
    assert len(scene.objects) == 1
    before = render(scene)
    ed.apply({"op": "set_instance", "index": i, "position": [0, 0, -1],
              "rotation": [0, 45, 0]})
    after = render(scene)
    assert not np.allclose(before, after)
    ed.apply({"op": "remove_instance", "index": i})
    assert scene.objects == []


def test_editor_remove_material_repoints():
    scene = small_scene()
    ed = SceneEditor(scene)
    ed.remove_material(0)
    assert all(s.material_id == 0 for s in scene.spheres)


def test_editor_resets_renderer_accumulation():
    scene = small_scene()
    renderer = ProgressiveRenderer(build_tracer_scene(scene), Camera(), CFG)
    renderer.step()
    renderer.step()
    assert renderer.frame_index == 2
    ed = SceneEditor(scene, renderer)
    ed.apply({"op": "set_material", "index": 0, "roughness": 0.5})
    assert renderer.frame_index == 0          # edit resets accumulation
    renderer.step()
    assert renderer.frame_index == 1


def test_editor_rejects_unknown_op_and_fields():
    ed = SceneEditor(small_scene())
    with pytest.raises(KeyError):
        ed.apply({"op": "drop_tables"})
    with pytest.raises(KeyError):
        ed.apply({"op": "set_material", "index": 0, "shininess": 3})


def test_scene_save_load_roundtrip(tmp_path):
    scene = small_scene()
    tri = np.array([[[-1, -1, -3], [1, -1, -3], [0, 1, -3]]], np.float32)
    scene.add_mesh(Mesh(tri, None))
    scene.add_object(MeshInstance(mesh_id=0, material_id=1,
                                  position=np.array([0.0, 0.5, 0.0]),
                                  rotation=np.array([0.0, 30.0, 0.0])))
    scene.textures.append(np.random.default_rng(0)
                          .random((8, 8, 3)).astype(np.float32))
    cam = Camera()
    cam.position = np.array([0.0, 1.5, 4.0])
    path = save_scene(tmp_path / "demo", scene, camera=cam, cfg=CFG)
    assert path.exists()

    loaded, lcam, lcfg = load_scene_file(path)
    assert len(loaded.materials) == len(scene.materials)
    assert len(loaded.spheres) == len(scene.spheres)
    assert len(loaded.objects) == len(scene.objects)
    assert lcfg == CFG
    np.testing.assert_allclose(lcam.position, cam.position)
    # pixel-identical render after round-trip
    np.testing.assert_array_equal(render(scene), render(loaded))


def test_scene_save_load_builtin(tmp_path):
    """Built-in scene 2 (spheres + textured plane + dielectric) survives a
    save/load round-trip bit-exactly."""
    scene = load_scene(2)
    path = save_scene(tmp_path / "s2", scene)
    loaded, _, _ = load_scene_file(path)
    np.testing.assert_array_equal(render(scene), render(loaded))


def test_viewer_edit_endpoint():
    scene = small_scene()
    renderer = ProgressiveRenderer(build_tracer_scene(scene), Camera(), CFG)
    from rtm_tpu.viewer import ViewerServer
    server = ViewerServer(renderer, host_scene=scene)
    import threading
    threading.Thread(target=server._httpd.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{server.port}"
    try:
        snap = json.loads(urllib.request.urlopen(base + "/scene").read())
        assert len(snap["materials"]) == 2 and len(snap["spheres"]) == 2
        req = urllib.request.Request(
            base + "/edit", data=json.dumps(
                {"op": "set_sphere", "index": 0, "radius": 0.9}).encode(),
            method="POST")
        resp = json.loads(urllib.request.urlopen(req).read())
        assert resp["ok"] and scene.spheres[0].radius == 0.9
        # bad op -> 400, scene untouched
        req = urllib.request.Request(
            base + "/edit", data=json.dumps({"op": "nope"}).encode(),
            method="POST")
        with pytest.raises(urllib.error.HTTPError):
            urllib.request.urlopen(req)
    finally:
        server._httpd.shutdown()
