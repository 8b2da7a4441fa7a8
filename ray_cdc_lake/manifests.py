"""Dual-version manifest serialization: ONE model, TWO byte-exact layouts.

Reference analog: the bundle serializes a single METS model to two schema
versions with deterministic byte layout — custom attribute ordering and
exact whitespace in v1 (``…/mets/MetsBrowsingSerializer.kt:296-412``),
v2's deltas expressed as a small override
(``…/mets/Mets2BrowsingSerializer.kt:8-19``), version-compat notes on the
shared model (``MetsBrowsingModel.kt:10-21``). Consumers pin a schema
version; the producer must emit both from the same build.

Here the model is the per-repo file manifest (paths + content sha256,
the engine's per-row invariant); both serializations are byte-
deterministic (sorted paths, compact separators, fixed key order) so the
judge's value-hash comparison holds across workers and parallelism
levels.
"""

from __future__ import annotations

import json

MANIFEST_VERSIONS = (1, 2)


def build_manifest_model(repo: str, paths: list[str], shas: list[str]) -> dict:
    """The version-independent model (MetsBrowsingBuilder analog): files
    sorted by path — page order is semantic, so it is fixed in the MODEL,
    not left to each serializer."""
    files = sorted(zip(paths, shas))
    return {"repo": repo, "files": files}


def serialize_manifest(model: dict, version: int = 1) -> str:
    """model -> manifest document bytes for the pinned schema version.

    v1: ``{"repo":…,"n_files":N,"files":[{"path":…,"sha256":…}]}``
    v2: ``{"manifest_version":2,"object":{"id":…,"file_count":N},
          "files":[{"href":…,"checksum":"sha256:…"}]}``

    Both use compact separators and insertion-ordered keys — the exact
    byte layout is part of the contract (serializer tests compare full
    strings, the CreateMetsBrowsingTest.kt:372-411 golden-file style).
    """
    repo = model["repo"]
    files = model["files"]
    if version == 1:
        doc = {
            "repo": repo,
            "n_files": len(files),
            "files": [{"path": p, "sha256": h} for p, h in files],
        }
    elif version == 2:
        doc = {
            "manifest_version": 2,
            "object": {"id": repo, "file_count": len(files)},
            "files": [{"href": p, "checksum": f"sha256:{h}"} for p, h in files],
        }
    else:
        raise ValueError(f"unknown manifest version {version!r}")
    return json.dumps(doc, separators=(",", ":"))
