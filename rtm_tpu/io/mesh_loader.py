"""Mesh loaders: glTF (.gltf/.glb) and OBJ.

Parity with the reference MeshLoader (Engine/src/External/Render/Common/
MeshLoader.cpp): loaders produce a triangle soup + AABB volume.

glTF semantics preserved (MeshLoader.cpp:63-152,154-188):
  * only TRIANGLES primitives with indices and a float VEC3 POSITION;
  * indices read via component-size byte mask (u8/u16/u32);
  * **UVs are zeroed** — the reference never reads TEXCOORD (:138-140);
  * volume from accessor min/max values, not recomputed from vertices.

OBJ semantics preserved (MeshLoader.cpp:250-377): v/vt/f lines; faces of 3 or
4 vertices (quads split as (A,C,D)); `v//vn` and `v/vt` forms; vn ignored.

Pure Python/NumPy — the reference's tinygltf dependency is replaced by a
~100-line JSON+binary-chunk parser (glTF 2.0 is JSON + flat buffers).
"""
from __future__ import annotations

import base64
import json
import struct
from pathlib import Path

import numpy as np

from ..models.mesh import Mesh

_COMPONENT_DTYPE = {
    5120: np.int8, 5121: np.uint8, 5122: np.int16,
    5123: np.uint16, 5125: np.uint32, 5126: np.float32,
}
_TYPE_SIZE = {"SCALAR": 1, "VEC2": 2, "VEC3": 3, "VEC4": 4, "MAT4": 16}


def _parse_glb(data: bytes):
    magic, version, _length = struct.unpack_from("<III", data, 0)
    if magic != 0x46546C67:
        raise ValueError("not a GLB file")
    pos = 12
    gltf = None
    buffers = []
    while pos < len(data):
        clen, ctype = struct.unpack_from("<II", data, pos)
        pos += 8
        chunk = data[pos:pos + clen]
        pos += clen
        if ctype == 0x4E4F534A:  # 'JSON'
            gltf = json.loads(chunk)
        elif ctype == 0x004E4942:  # 'BIN'
            buffers.append(chunk)
    return gltf, buffers


def _load_buffers(gltf, bin_chunks, base_dir: Path):
    out = []
    for i, buf in enumerate(gltf.get("buffers", [])):
        uri = buf.get("uri")
        if uri is None:
            out.append(bin_chunks[0] if bin_chunks else b"")
        elif uri.startswith("data:"):
            out.append(base64.b64decode(uri.split(",", 1)[1]))
        else:
            out.append((base_dir / uri).read_bytes())
    return out


def _read_accessor(gltf, buffers, acc_idx):
    acc = gltf["accessors"][acc_idx]
    view = gltf["bufferViews"][acc["bufferView"]]
    dtype = _COMPONENT_DTYPE[acc["componentType"]]
    ncomp = _TYPE_SIZE[acc["type"]]
    count = acc["count"]
    offset = view.get("byteOffset", 0) + acc.get("byteOffset", 0)
    buf = buffers[view["buffer"]]
    stride = view.get("byteStride", 0) or ncomp * np.dtype(dtype).itemsize
    raw = np.frombuffer(buf, np.uint8,
                        count=stride * (count - 1) + ncomp * np.dtype(dtype).itemsize,
                        offset=offset)
    # strided view -> contiguous (handles interleaved buffers)
    rows = np.lib.stride_tricks.as_strided(
        raw, shape=(count, ncomp * np.dtype(dtype).itemsize), strides=(stride, 1))
    arr = rows.copy().view(dtype).reshape(count, ncomp)
    return arr, acc


def load_gltf(path) -> Mesh:
    path = Path(path)
    data = path.read_bytes()
    if path.suffix.lower() == ".glb":
        gltf, bin_chunks = _parse_glb(data)
    else:
        gltf, bin_chunks = json.loads(data), []
    buffers = _load_buffers(gltf, bin_chunks, path.parent)

    tri_parts = []
    vmin = np.full(3, np.finfo(np.float32).max)
    vmax = np.full(3, -np.finfo(np.float32).max)
    for mesh in gltf.get("meshes", []):
        for prim in mesh.get("primitives", []):
            if prim.get("mode", 4) != 4:            # TRIANGLES only
                continue
            if "indices" not in prim or "POSITION" not in prim.get("attributes", {}):
                continue
            pos_acc_idx = prim["attributes"]["POSITION"]
            pos_meta = gltf["accessors"][pos_acc_idx]
            if pos_meta["componentType"] != 5126 or pos_meta["type"] != "VEC3":
                continue
            positions, pos_acc = _read_accessor(gltf, buffers, pos_acc_idx)
            indices, _ = _read_accessor(gltf, buffers, prim["indices"])
            idx = indices.reshape(-1).astype(np.uint32)
            ntris = idx.shape[0] // 3
            tris = positions[idx[: ntris * 3]].reshape(ntris, 3, 3).astype(np.float32)
            tri_parts.append(tris)
            vmin = np.minimum(vmin, np.asarray(pos_acc["min"], np.float32))
            vmax = np.maximum(vmax, np.asarray(pos_acc["max"], np.float32))

    if not tri_parts:
        verts = np.zeros((0, 3, 3), np.float32)
    else:
        verts = np.concatenate(tri_parts)
    uvs = np.zeros((len(verts), 3, 2), np.float32)  # reference zeroes glTF UVs
    return Mesh(verts, uvs, volume_min=vmin.astype(np.float32),
                volume_max=vmax.astype(np.float32))


def load_obj(path) -> Mesh:
    vertices: list = []
    texcoords: list = []
    tri_v: list = []
    tri_uv: list = []

    def parse_vertex(tok: str):
        if "//" in tok:
            v_idx = int(tok.split("//")[0])
            return vertices[v_idx - 1], (0.0, 0.0)
        if "/" in tok:
            parts = tok.split("/")
            v_idx, vt_idx = int(parts[0]), int(parts[1])
            return vertices[v_idx - 1], texcoords[vt_idx - 1]
        return vertices[int(tok) - 1], (0.0, 0.0)

    for line in Path(path).read_text().splitlines():
        parts = line.split()
        if not parts or parts[0] == "#":
            continue
        if parts[0] == "v":
            vertices.append(tuple(float(x) for x in parts[1:4]))
        elif parts[0] == "vt":
            texcoords.append(tuple(float(x) for x in parts[1:3]))
        elif parts[0] == "f":
            corners = [parse_vertex(tok) for tok in parts[1:]]
            if len(corners) >= 3:
                a, b, c = corners[0], corners[1], corners[2]
                tri_v.append((a[0], b[0], c[0]))
                tri_uv.append((a[1], b[1], c[1]))
            if len(corners) >= 4:  # quad split (A,C,D) — MeshLoader.cpp:358-369
                a, c, d = corners[0], corners[2], corners[3]
                tri_v.append((a[0], c[0], d[0]))
                tri_uv.append((a[1], c[1], d[1]))

    verts = np.asarray(tri_v, np.float32).reshape(-1, 3, 3)
    uvs = np.asarray(tri_uv, np.float32).reshape(-1, 3, 2)
    return Mesh(verts, uvs)


_LOADERS = {".gltf": load_gltf, ".glb": load_gltf, ".obj": load_obj}


def load_mesh(path) -> Mesh:
    """Extension-dispatched load (ref MeshLoader.cpp:387-408)."""
    ext = Path(path).suffix.lower()
    if ext not in _LOADERS:
        raise ValueError(f"unsupported mesh format: {ext}")
    return _LOADERS[ext](path)
