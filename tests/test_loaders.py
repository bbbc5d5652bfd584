"""Mesh/image loader tests (MeshLoader parity, SURVEY C23/C14)."""
import struct
import zlib

import numpy as np
import pytest

from rtm_tpu.io.assets import asset_path, have_reference_assets
from rtm_tpu.io.image import (load_hdr_ldr, load_radiance_hdr, save_png,
                              stb_hdr_to_ldr, to_u8)
from rtm_tpu.io.mesh_loader import load_gltf, load_mesh, load_obj


def test_obj_triangles_and_quads(tmp_path):
    obj = tmp_path / "m.obj"
    obj.write_text("""
# comment
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
vt 0 0
vt 1 0
vt 1 1
vt 0 1
f 1/1 2/2 3/3 4/4
""")
    mesh = load_obj(obj)
    assert mesh.num_triangles == 2  # quad split
    np.testing.assert_array_equal(mesh.verts[0], [[0, 0, 0], [1, 0, 0], [1, 1, 0]])
    # quad split order (A, C, D) — MeshLoader.cpp:358-369
    np.testing.assert_array_equal(mesh.verts[1], [[0, 0, 0], [1, 1, 0], [0, 1, 0]])
    np.testing.assert_array_equal(mesh.uvs[0], [[0, 0], [1, 0], [1, 1]])


def test_obj_double_slash_and_plain(tmp_path):
    obj = tmp_path / "m.obj"
    obj.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1//1 2//1 3//1\nf 1 2 3\n")
    mesh = load_obj(obj)
    assert mesh.num_triangles == 2
    np.testing.assert_array_equal(mesh.uvs, np.zeros((2, 3, 2)))


def _write_minimal_glb(path, positions, indices):
    pos = np.asarray(positions, np.float32)
    idx = np.asarray(indices, np.uint16)
    bin_chunk = pos.tobytes() + idx.tobytes()
    pad = (-len(bin_chunk)) % 4
    bin_chunk += b"\x00" * pad
    gltf = {
        "asset": {"version": "2.0"},
        "buffers": [{"byteLength": len(bin_chunk)}],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": pos.nbytes},
            {"buffer": 0, "byteOffset": pos.nbytes, "byteLength": idx.nbytes},
        ],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": len(pos),
             "type": "VEC3", "min": pos.min(0).tolist(), "max": pos.max(0).tolist()},
            {"bufferView": 1, "componentType": 5123, "count": len(idx),
             "type": "SCALAR"},
        ],
        "meshes": [{"primitives": [{"attributes": {"POSITION": 0},
                                    "indices": 1, "mode": 4}]}],
    }
    import json
    j = json.dumps(gltf).encode()
    j += b" " * ((-len(j)) % 4)
    total = 12 + 8 + len(j) + 8 + len(bin_chunk)
    blob = struct.pack("<III", 0x46546C67, 2, total)
    blob += struct.pack("<II", len(j), 0x4E4F534A) + j
    blob += struct.pack("<II", len(bin_chunk), 0x004E4942) + bin_chunk
    path.write_bytes(blob)


def test_glb_minimal(tmp_path):
    p = tmp_path / "tri.glb"
    _write_minimal_glb(p, [[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]],
                       [0, 1, 2, 2, 1, 3])
    mesh = load_gltf(p)
    assert mesh.num_triangles == 2
    np.testing.assert_array_equal(mesh.verts[0], [[0, 0, 0], [1, 0, 0], [0, 1, 0]])
    # glTF UVs zeroed (reference quirk, MeshLoader.cpp:138-140)
    np.testing.assert_array_equal(mesh.uvs, np.zeros((2, 3, 2)))
    # volume from accessor min/max
    np.testing.assert_array_equal(mesh.volume_min, [0, 0, 0])
    np.testing.assert_array_equal(mesh.volume_max, [1, 1, 0])


@pytest.mark.skipif(not have_reference_assets(), reason="reference assets absent")
def test_dragon_glb_loads():
    mesh = load_mesh(asset_path("models", "tinyStanfordDragon.glb"))
    assert mesh.num_triangles > 100
    assert np.isfinite(mesh.verts).all()
    assert (mesh.volume_min < mesh.volume_max).all()
    # all triangles inside declared volume (accessor min/max parity)
    flat = mesh.verts.reshape(-1, 3)
    assert (flat >= mesh.volume_min - 1e-4).all()
    assert (flat <= mesh.volume_max + 1e-4).all()


def test_hdr_roundtrip(tmp_path):
    """Write a flat (non-RLE) Radiance file and decode it."""
    h, w = 4, 8
    rng = np.random.RandomState(0)
    img = rng.rand(h, w, 3).astype(np.float32) * 2.0
    # encode RGBE
    maxc = img.max(axis=-1)
    e = np.zeros((h, w), np.int32)
    mant = np.zeros((h, w, 3), np.uint8)
    nz = maxc >= 1e-32
    e[nz] = np.floor(np.log2(maxc[nz])).astype(np.int32) + 1
    scale = np.where(nz, 256.0 / np.exp2(e.astype(np.float64)), 0.0)
    mant = np.clip(img * scale[..., None], 0, 255).astype(np.uint8)
    rgbe = np.concatenate([mant, (e + 128)[..., None].astype(np.uint8)], -1)
    rgbe[~nz] = 0
    raw = b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n" + f"-Y {h} +X {w}\n".encode()
    raw += rgbe.tobytes()
    p = tmp_path / "t.hdr"
    p.write_bytes(raw)
    dec = load_radiance_hdr(p)
    assert dec.shape == (h, w, 3)
    np.testing.assert_allclose(dec, img, rtol=0.01, atol=0.01)


@pytest.mark.skipif(not have_reference_assets(), reason="reference assets absent")
def test_reference_sky_hdr():
    sky = load_hdr_ldr(asset_path("skyMaps", "evening_road_01_puresky_1k.hdr"))
    assert sky.ndim == 3 and sky.shape[2] == 3
    assert sky.shape[0] >= 256
    assert 0.0 <= sky.min() and sky.max() <= 1.0
    # LDR quantization: all values are k/255
    assert np.allclose(sky * 255.0, np.round(sky * 255.0), atol=1e-4)


def test_stb_hdr_to_ldr_formula():
    hdr = np.array([[[0.0, 0.5, 4.0]]], np.float32)
    ldr = stb_hdr_to_ldr(hdr)
    want = np.clip(np.power([0.0, 0.5, 4.0], 1 / 2.2) * 255 + 0.5, 0, 255).astype(np.uint8) / 255.0
    np.testing.assert_allclose(ldr[0, 0], want, atol=1e-6)


def test_png_save(tmp_path):
    img = np.random.RandomState(0).rand(8, 8, 3).astype(np.float32)
    p = tmp_path / "x.png"
    save_png(p, img)
    from PIL import Image
    back = np.asarray(Image.open(p))
    np.testing.assert_array_equal(back, to_u8(img))
