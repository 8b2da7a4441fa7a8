"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata,
decoded / feature-extracted by an actor-pool stage.

Reference analog: the JHOVE processor treats images as opaque files and
extracts typed metadata (width/height/resolution) via a per-worker-loaded
toolchain (``Jhove.kt:148-217`` one-time init, ``JhoveParser.kt:12-184``
extraction). Here the payload is a ``binary`` column; the real image/audio
decoders are not installed in this container, so ``decode_image`` is
gated behind an import-try and the pipeline runs a clearly-marked
deterministic fake decoder — the Ray-side plumbing (schema, batch size,
actor signature, output layout) is real and tested.

Scale notes: binary payloads make rows wide — the stage runs with a small
``batch_size`` and ``batch_format='pyarrow'`` (binary columns do not
round-trip pandas cleanly), exactly the knobs a real 100 TB image pipeline
needs.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
from .sources import read_table

BINARY_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.int64()),
        pa.field("payload", pa.binary()),
        pa.field("media_type", pa.string()),
        pa.field("n_bytes", pa.int64()),
    ]
)


def encode_payloads(batch: pa.Table) -> pa.Table:
    """documents -> multimodal rows: utf-8 payload bytes + typed metadata
    (the synthetic stand-in for image/audio blobs)."""
    texts = batch["text"].to_pylist()
    payloads = [t.encode("utf-8") for t in texts]
    return pa.Table.from_arrays(
        [
            batch["doc_id"],
            pa.array(payloads, type=pa.binary()),
            pa.array(["text/plain"] * len(payloads), type=pa.string()),
            pa.array([len(p) for p in payloads], type=pa.int64()),
        ],
        schema=BINARY_SCHEMA,
    )


def decode_image(payload: bytes) -> tuple[int, int]:
    """REAL decode path — requires an image library that is not installed
    in this container. Gated so the pipeline shape is honest about where a
    production decoder plugs in."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover - PIL absent here
        raise NotImplementedError(
            "image decoding requires Pillow; this container has no image "
            "libraries — use FakeDecoder for the deterministic test path"
        ) from exc
    import io

    from PIL import Image

    img = Image.open(io.BytesIO(payload))
    return img.width, img.height


class FakeDecoder:
    """Actor-pool decode stage with a DETERMINISTIC FAKE decode: metadata
    derived from the payload bytes only (stable across workers/runs). The
    actor signature (__init__ loads the 'model', __call__ maps batches) is
    the production shape."""

    def __init__(self):
        # one-time per-actor setup (the Jhove.init() analog): nothing heavy
        # for the fake, but the hook is where a real decoder/model loads
        self.ready = True

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        n = np.array([len(p) for p in payloads], dtype=np.int64)
        widths = n % 640 + 64
        heights = (n * 7) % 480 + 48
        sha = [hashlib.sha256(p).hexdigest() for p in payloads]
        return pa.Table.from_arrays(
            [
                batch["doc_id"],
                batch["n_bytes"],
                pa.array(widths),
                pa.array(heights),
                pa.array(sha, type=pa.string()),
            ],
            names=["doc_id", "n_bytes", "fake_width", "fake_height", "bin_sha256"],
        )


def q_mm_decode_meta(sf_dir: str):
    import ray.data as rd

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    bins = docs.map_batches(encode_payloads, batch_format="pyarrow")
    # small batch_size: binary payloads are wide rows
    return bins.map_batches(
        FakeDecoder, batch_format="pyarrow", batch_size=256, concurrency=2
    )


SQL = {
    # strlen() = BYTE length in DuckDB (length() is chars); payload is the
    # utf-8 encoding of text, and sha256(text) hashes the same utf-8 bytes
    "mm_decode_meta": """
        SELECT doc_id,
               CAST(strlen(text) AS BIGINT) AS n_bytes,
               CAST(strlen(text) % 640 + 64 AS BIGINT) AS fake_width,
               CAST((strlen(text) * 7) % 480 + 48 AS BIGINT) AS fake_height,
               sha256(text) AS bin_sha256
        FROM documents""",
}


def registry():
    queries = {"mm_decode_meta": q_mm_decode_meta}
    return queries, dict(SQL)
