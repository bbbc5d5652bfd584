"""Asset path resolution.

The reference resolves assets relative to the CWD (`assets/...`,
RayTracing.cpp:974).  Here: $RTM_ASSETS, else ./assets, else the read-only
reference checkout's asset directory when present (models/skyMaps/textures).
Scenes fall back to procedural stand-ins when a file is missing, so the test
suite runs without any external data.
"""
from __future__ import annotations

import os
from pathlib import Path

_CANDIDATES = [
    os.environ.get("RTM_ASSETS"),
    "assets",
    "/root/reference/RayTracing/assets",
]


def asset_dir() -> Path | None:
    for c in _CANDIDATES:
        if c and Path(c).is_dir():
            return Path(c)
    return None


def asset_path(*parts) -> Path | None:
    """Return the first existing asset path for e.g. ('models', 'x.glb')."""
    for c in _CANDIDATES:
        if not c:
            continue
        p = Path(c).joinpath(*parts)
        if p.exists():
            return p
    return None


def have_reference_assets() -> bool:
    return asset_path("models", "tinyStanfordDragon.glb") is not None
