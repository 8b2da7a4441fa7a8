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


class RealDecoder:
    """Actor-pool decode stage with a REAL image decode (Pillow).  Same
    output schema as FakeDecoder — real_* dims replace the fake ones
    column-for-column, so the two are drop-in interchangeable.
    ``__init__`` imports PIL ONCE per actor and fails fast when the
    library is absent (the same env gate as decode_image); ``__call__``
    decodes each payload.  Exercised by a skipif-gated test so the gate
    is TESTED wherever image libraries exist, not just documented."""

    def __init__(self):
        try:
            from PIL import Image
        except ImportError as exc:
            raise NotImplementedError(
                "RealDecoder requires Pillow; use FakeDecoder in "
                "containers without image libraries"
            ) from exc
        self._Image = Image

    def __call__(self, batch: pa.Table) -> pa.Table:
        import io

        payloads = batch["payload"].to_pylist()
        widths, heights, sha = [], [], []
        for p in payloads:
            img = self._Image.open(io.BytesIO(p))
            widths.append(img.width)
            heights.append(img.height)
            sha.append(hashlib.sha256(p).hexdigest())
        return pa.Table.from_arrays(
            [
                batch["doc_id"],
                batch["n_bytes"],
                pa.array(widths, type=pa.int64()),
                pa.array(heights, type=pa.int64()),
                pa.array(sha, type=pa.string()),
            ],
            names=["doc_id", "n_bytes", "fake_width", "fake_height", "bin_sha256"],
        )


def q_mm_decode_meta(sf_dir: str):
    import ray.data as rd

    from .sources import actor_pool_size

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    bins = docs.map_batches(encode_payloads, batch_format="pyarrow")
    # small batch_size: binary payloads are wide rows
    return bins.map_batches(
        FakeDecoder,
        batch_format="pyarrow",
        batch_size=256,
        concurrency=actor_pool_size(),
    )


FRAME_BYTES = 256
FRAME_STRIDE = 4  # sample every 4th frame
MAX_FRAMES = 64  # bound shared with the SQL oracle's range(); guarded below


def q_mm_frame_sample(sf_dir: str):
    """Frame sampling over a binary payload column: the payload is treated
    as a stream of fixed-size frames; every FRAME_STRIDE-th frame is
    emitted as its own row (offset, length, sha256) — the video
    frame-sample plumbing with a deterministic byte-window stand-in for
    the codec (real decoders aren't in this container). One input row
    fans out to ceil(n_bytes/FRAME_BYTES)/FRAME_STRIDE rows; batch_size
    kept small because rows are wide."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    bins = docs.map_batches(encode_payloads, batch_format="pyarrow")

    def sample(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        payloads = batch["payload"].to_pylist()
        out_id, out_idx, out_off, out_len, out_sha = [], [], [], [], []
        for d, p in zip(ids, payloads):
            if not p.isascii():  # fail loudly, never diverge silently:
                # the SQL oracle frames by CHARACTER offsets (substr), the
                # engine by BYTE offsets — equal only for ASCII payloads
                raise ValueError(
                    f"doc {d}: non-ASCII payload — byte-offset frames would "
                    "silently diverge from the char-based SQL oracle; "
                    "rebuild the oracle on encode(text) byte offsets first"
                )
            n_frames = (len(p) + FRAME_BYTES - 1) // FRAME_BYTES
            if n_frames > MAX_FRAMES:  # fail loudly, never diverge silently
                raise ValueError(
                    f"doc {d}: {n_frames} frames exceeds MAX_FRAMES="
                    f"{MAX_FRAMES} (raise it and the oracle range together)"
                )
            for fi in range(0, n_frames, FRAME_STRIDE):
                off = fi * FRAME_BYTES
                chunk = p[off : off + FRAME_BYTES]
                out_id.append(d)
                out_idx.append(fi)
                out_off.append(off)
                out_len.append(len(chunk))
                out_sha.append(hashlib.sha256(chunk).hexdigest())
        return pa.Table.from_arrays(
            [
                pa.array(out_id, type=pa.int64()),
                pa.array(out_idx, type=pa.int64()),
                pa.array(out_off, type=pa.int64()),
                pa.array(out_len, type=pa.int64()),
                pa.array(out_sha, type=pa.string()),
            ],
            names=["doc_id", "frame_idx", "byte_offset", "frame_len", "frame_sha256"],
        )

    return bins.map_batches(sample, batch_format="pyarrow", batch_size=256)


RESIZE_TARGET = 128  # fake-resize output budget in bytes (shared with oracle)


class FakeResizer:
    """Actor-pool RESIZE stage with a deterministic byte-stride stand-in
    for the image scaler: keep every ``stride``-th payload byte where
    stride = ceil(n_bytes / RESIZE_TARGET), so output size is bounded by
    the target whatever the input size (the thumbnailing contract). The
    actor signature is the production shape — a real scaler loads its
    codec in ``__init__`` and maps batches in ``__call__``."""

    def __init__(self, target: int = RESIZE_TARGET):
        self.target = target  # a real resizer would load its codec here

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        payloads = batch["payload"].to_pylist()
        out_n, out_stride, out_len, out_sha = [], [], [], []
        for d, p in zip(ids, payloads):
            if not p.isascii():  # oracle extracts by CHAR offsets (substr)
                raise ValueError(
                    f"doc {d}: non-ASCII payload — byte-stride resize would "
                    "silently diverge from the char-based SQL oracle"
                )
            if not p:  # oracle's range() join omits empty docs entirely
                raise ValueError(f"doc {d}: empty payload — fix the oracle first")
            stride = max(1, -(-len(p) // self.target))  # ceil
            small = p[::stride]
            out_n.append(len(p))
            out_stride.append(stride)
            out_len.append(len(small))
            out_sha.append(hashlib.sha256(small).hexdigest())
        return pa.Table.from_arrays(
            [
                batch["doc_id"],
                pa.array(out_n, type=pa.int64()),
                pa.array(out_stride, type=pa.int64()),
                pa.array(out_len, type=pa.int64()),
                pa.array(out_sha, type=pa.string()),
            ],
            names=["doc_id", "n_bytes", "stride", "n_bytes_out", "out_sha256"],
        )


def q_mm_resize(sf_dir: str):
    from .sources import actor_pool_size

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    bins = docs.map_batches(encode_payloads, batch_format="pyarrow")
    return bins.map_batches(
        FakeResizer,
        batch_format="pyarrow",
        batch_size=256,
        concurrency=actor_pool_size(),
    )


class ByteHistogramExtractor:
    """Actor-pool FEATURE-EXTRACT stage: per-payload 256-bin byte
    histogram, computed for the whole batch in ONE scatter-add (rows
    repeated per byte, no per-row Python). Emits the l1-normalized
    histogram as ``features: list<float32>`` (the ANN-ready shape that
    composes with the knn/kmeans ops) plus exact-oracle scalars."""

    BINS = 256

    def __init__(self):
        self.ready = True  # a real extractor loads its model here

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        n = len(payloads)
        for d, p in zip(batch["doc_id"].to_pylist(), payloads):
            # same loud guards as FakeResizer: the oracle counts CHARS
            # (string_split), equal to bytes only for non-empty ASCII —
            # DuckDB's string_split('', '') even yields [''] (1 "char")
            if not p.isascii():
                raise ValueError(
                    f"doc {d}: non-ASCII payload — byte histogram would "
                    "silently diverge from the char-based SQL oracle"
                )
            if not p:
                raise ValueError(f"doc {d}: empty payload — fix the oracle first")
        lens = np.fromiter((len(p) for p in payloads), dtype=np.int64, count=n)
        allbytes = np.frombuffer(b"".join(payloads), dtype=np.uint8)
        row_of = np.repeat(np.arange(n, dtype=np.int64), lens)
        flat = np.zeros(n * self.BINS, dtype=np.int64)
        np.add.at(flat, row_of * self.BINS + allbytes, 1)
        hist = flat.reshape(n, self.BINS)
        denom = np.maximum(lens, 1).astype(np.float64)
        feat = (hist / denom[:, None]).astype(np.float32)
        feat_col = pa.ListArray.from_arrays(
            pa.array(np.arange(0, (n + 1) * self.BINS, self.BINS, dtype=np.int32)),
            pa.array(feat.reshape(-1)),
        )
        return pa.Table.from_arrays(
            [
                batch["doc_id"],
                pa.array(lens),
                pa.array((hist > 0).sum(axis=1).astype(np.int64)),
                feat_col,
            ],
            names=["doc_id", "n_bytes", "n_distinct_bytes", "features"],
        )


def mm_features_ds(sf_dir: str):
    """Full feature-extract pipeline (with the vector column) for
    composition with the similarity ops; unit-tested against a pure-python
    reference."""
    from .sources import actor_pool_size

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    bins = docs.map_batches(encode_payloads, batch_format="pyarrow")
    return bins.map_batches(
        ByteHistogramExtractor,
        batch_format="pyarrow",
        batch_size=256,
        concurrency=actor_pool_size(),
    )


def q_mm_feature_extract(sf_dir: str):
    """Oracle-facing projection: the scalar columns are DERIVED from the
    histogram the extractor computed (n_distinct_bytes = nonzero bins), so
    the exact SQL comparison checks the kernel itself; the vector column
    is dropped only because list columns don't hash-compare."""
    return mm_features_ds(sf_dir).map_batches(
        lambda t: t.select(["doc_id", "n_bytes", "n_distinct_bytes"]),
        batch_format="pyarrow",
    )


SQL = {
    # frames are byte windows; text is ASCII in the corpus, so DuckDB's
    # char-based substr equals the byte window and sha256(substr) hashes
    # the same bytes
    "mm_frame_sample": f"""
        WITH frames AS (
          SELECT d.doc_id, CAST(f.range AS BIGINT) AS frame_idx,
                 CAST(f.range * {FRAME_BYTES} AS BIGINT) AS byte_offset,
                 substr(d.text, CAST(f.range * {FRAME_BYTES} + 1 AS BIGINT), {FRAME_BYTES}) AS chunk
          FROM documents d
          CROSS JOIN range(0, {MAX_FRAMES}) f
          WHERE f.range * {FRAME_BYTES} < strlen(d.text)
            AND f.range % {FRAME_STRIDE} = 0)
        SELECT doc_id, frame_idx, byte_offset,
               CAST(strlen(chunk) AS BIGINT) AS frame_len,
               sha256(chunk) AS frame_sha256
        FROM frames""",
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


SQL["mm_resize"] = f"""
    WITH kept AS (
      SELECT d.doc_id, strlen(d.text) AS n,
             CAST(CEIL(strlen(d.text) / {RESIZE_TARGET}.0) AS BIGINT) AS stride,
             CAST(r.range AS BIGINT) AS i,
             substr(d.text,
                    CAST(r.range * CAST(CEIL(strlen(d.text) / {RESIZE_TARGET}.0) AS BIGINT) + 1 AS BIGINT),
                    1) AS ch
      FROM documents d
      CROSS JOIN range(0, {RESIZE_TARGET}) r
      WHERE r.range * CAST(CEIL(strlen(d.text) / {RESIZE_TARGET}.0) AS BIGINT) < strlen(d.text))
    SELECT doc_id,
           CAST(max(n) AS BIGINT) AS n_bytes,
           max(stride) AS stride,
           CAST(count(*) AS BIGINT) AS n_bytes_out,
           sha256(string_agg(ch, '' ORDER BY i)) AS out_sha256
    FROM kept GROUP BY doc_id"""

SQL["mm_feature_extract"] = """
    SELECT doc_id,
           CAST(strlen(any_value(text)) AS BIGINT) AS n_bytes,
           CAST(count(DISTINCT c) AS BIGINT) AS n_distinct_bytes
    FROM (SELECT doc_id, text, unnest(string_split(text, '')) AS c
          FROM documents)
    GROUP BY doc_id"""


def registry():
    queries = {
        "mm_decode_meta": q_mm_decode_meta,
        "mm_frame_sample": q_mm_frame_sample,
        "mm_resize": q_mm_resize,
        "mm_feature_extract": q_mm_feature_extract,
    }
    return queries, dict(SQL)
