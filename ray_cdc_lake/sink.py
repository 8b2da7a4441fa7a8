"""Exactly-once Parquet lake sink: staged writes + atomic commit manifests.

Reference analog: the two-phase stage/commit/rollback rename protocol of
``RenameDiskUtils.kt:32-105`` (phase 1: move to temp; phase 2: move to
final; reverse on failure) and ``RenameS3Utils.kt:35-135`` (stage -> commit
-> cleanup with rollback at each step) — generalized to a distributed lake:

* workers write data files to ``_staging/<txn_id>/`` (phase 1),
* the staging dir is atomically renamed to ``data/<txn_id>/`` (phase 2),
* the commit POINT is a single atomic manifest publish on the driver
  (``os.replace`` of the CURRENT pointer) — everything before it is
  invisible; a crash at any earlier point leaves only unreferenced files,
* re-running a committed txn_id is a no-op (idempotent commit), so
  at-least-once replays cannot duplicate rows.

Lake layout (resumable, partition-pruned):

    lake/
      _staging/<txn_id>/bucket=K/*.parquet     # phase-1 area
      data/<txn_id>/bucket=K/*.parquet         # immutable committed files
      _manifests/manifest-<version>.json       # full snapshot description
      _manifests/CURRENT                       # atomic pointer (os.replace)

Each txn rewrites the complete state of every bucket it touched
(copy-on-write per bucket); the manifest maps bucket -> owning txn. Rows
carry an ``op`` column; tombstones are KEPT in the data files (LSM-style)
so later incremental merges cannot resurrect deleted keys from stale
events — readers filter ``op != 'delete'``.

Per-bucket high watermarks are read from the staged files' Parquet footer
statistics (no data scan).
"""

from __future__ import annotations

import errno
import json
import os
import time
import dataclasses
from dataclasses import dataclass, field
from typing import TYPE_CHECKING

import pyarrow.compute as pc
import pyarrow.parquet as pq

from .kernels import _winner_per_key
# module scope, not lazy: the strip() UDF below references this inside a
# Ray worker, where a runtime relative import can fail when the driving
# process isn't cwd'd to the repo (self-contained pickling only covers
# module-scope references).
from .transforms import key_hash_u64

if TYPE_CHECKING:
    import ray.data

MANIFEST_DIR = "_manifests"
STAGING_DIR = "_staging"
DATA_DIR = "data"

# payload-column bounds recorded in the manifest are truncated to this
# many characters (Iceberg's truncate(16) analog) — long enough to prune
# commit-hash / language / prefix predicates, short enough that per-file
# stats stay O(bytes) however wide the payload is
_BOUND_TRUNC = 16


def _bound_lower(v):
    """Manifest-safe LOWER bound for a payload column min: a string prefix
    sorts <= the full value, so truncation alone stays conservative.
    Non-JSON-safe scalars (bytes, decimals, ...) record no bound."""
    if isinstance(v, str):
        return v[:_BOUND_TRUNC]
    if isinstance(v, (int, float, bool)):
        return v
    return None


def _bound_upper(v):
    """Manifest-safe UPPER bound: a truncated string must be rounded UP
    past the truncation point (increment the last incrementable char) or
    the bound is dropped — a bare prefix would sort BELOW the value and
    prune files that actually match."""
    if isinstance(v, (int, float, bool)) and not isinstance(v, str):
        return v
    if not isinstance(v, str):
        return None
    if len(v) <= _BOUND_TRUNC:
        return v
    t = v[:_BOUND_TRUNC]
    for i in range(len(t) - 1, -1, -1):
        o = ord(t[i]) + 1
        if o <= 0x10FFFF and not (0xD800 <= o <= 0xDFFF):
            return t[:i] + chr(o)
    return None  # every char at the cap — no finite upper bound


def _bloom_build(h) -> dict:
    """Bloom filter over a file's 64-bit key hashes, sized to ~10 bits per
    key (fpr ≈ 1%), stored base64 in the manifest's per-file stats. The
    two double-hashing halves come from the one stable key hash the
    engine already computes (transforms.key_hash_u64), so membership is
    checkable from the manifest alone — a point lookup that bloom-misses
    every candidate file touches ZERO storage (the at-scale win: min/max
    ranges of multi-txn bucket files overlap, blooms don't)."""
    import base64

    import numpy as np

    n = max(1, len(h))
    m = 1 << max(11, int(np.ceil(np.log2(10 * n))))  # >= 2048 bits
    m = min(m, 1 << 20)  # cap: 128 KiB of bits per file
    k = max(1, min(8, round(0.693 * m / n)))
    h = np.asarray(h, dtype=np.uint64)
    h1 = h & np.uint64(0xFFFFFFFF)
    h2 = (h >> np.uint64(32)) | np.uint64(1)
    bits = np.zeros(m // 8, dtype=np.uint8)
    for i in range(k):
        pos = (h1 + np.uint64(i) * h2) % np.uint64(m)
        np.bitwise_or.at(
            bits,
            (pos >> np.uint64(3)).astype(np.int64),
            np.left_shift(np.uint8(1), (pos & np.uint64(7)).astype(np.uint8)),
        )
    return {"m": int(m), "k": int(k), "bits": base64.b64encode(bits.tobytes()).decode()}


def _bloom_maybe_contains(bloom: dict | None, h: int) -> bool:
    """True when the key hash MAY be in the file (no false negatives);
    missing/legacy stats conservatively return True."""
    if not bloom:
        return True
    import base64

    m, k = bloom["m"], bloom["k"]
    bits = base64.b64decode(bloom["bits"])
    h1, h2 = h & 0xFFFFFFFF, (h >> 32) | 1
    for i in range(k):
        pos = (h1 + i * h2) % m
        if not (bits[pos >> 3] >> (pos & 7)) & 1:
            return False
    return True


class LakeStore:
    """Filesystem abstraction for all sink I/O, backed by a
    ``pyarrow.fs.FileSystem`` for the bulk operations, with the TWO
    primitives that need store-specific atomicity isolated as methods:

    * ``claim_with_content(tmp, dst)`` — publish-exactly-once: atomically
      create ``dst`` with ``tmp``'s bytes, raising ``FileExistsError`` if
      ``dst`` already exists. Local impl: ``os.link`` (O_CREAT|O_EXCL
      fallback). S3 impl: conditional PUT with ``If-None-Match: *`` —
      the reference's staged-copy-then-commit dance
      (RenameS3Utils.kt:35-135) exists because S3 lacked this primitive.
    * ``replace_dir(src, dst)`` — atomic directory move. Local:
      ``os.replace``. S3: prefix copy + delete under a txn marker (keys
      are invisible anyway until the manifest references them, so
      non-atomicity there is safe — the manifest is the commit point).

    Everything else (mkdirs, rmtree, listdir, open) goes through the
    pyarrow FileSystem so an S3 backend is ``LakeStore(S3FileSystem(...))``
    plus those two overrides. Ray's ``write_parquet`` accepts the same
    ``filesystem`` object for the staged data write.
    """

    # Parallelism for the commit-time per-bucket footer/stat reads.
    # Local filesystems: 1 — the reads are sub-ms and GIL-bound work
    # (bloom build, key hashing) dominates, so threads only add contention
    # (measured: 64-bucket stat pass 255 ms serial vs 470-530 ms pooled).
    # Object stores: each stat is 1-2 network round trips, so the pool
    # hides latency — ObjectStoreLakeStore raises this.
    stat_concurrency = 1

    def __init__(self, fs=None):
        if fs is None:
            from pyarrow.fs import LocalFileSystem

            fs = LocalFileSystem()
        self.fs = fs

    # ---- bulk ops (generic over pyarrow.fs) --------------------------
    def makedirs(self, path: str) -> None:
        self.fs.create_dir(path, recursive=True)

    def rmtree(self, path: str) -> None:
        from pyarrow.fs import FileType

        if self.fs.get_file_info(path).type != FileType.NotFound:
            self.fs.delete_dir(path)

    def exists(self, path: str) -> bool:
        from pyarrow.fs import FileType

        return self.fs.get_file_info(path).type != FileType.NotFound

    def isdir(self, path: str) -> bool:
        from pyarrow.fs import FileType

        return self.fs.get_file_info(path).type == FileType.Directory

    def listdir(self, path: str) -> list[str]:
        from pyarrow.fs import FileSelector

        infos = self.fs.get_file_info(FileSelector(path, recursive=False))
        return sorted(i.base_name for i in infos)

    def read_text(self, path: str) -> str:
        with self.fs.open_input_stream(path) as f:
            return f.read().decode("utf-8")

    def write_text(self, path: str, content: str) -> None:
        with self.fs.open_output_stream(path) as f:
            f.write(content.encode("utf-8"))

    def delete_file(self, path: str) -> None:
        self.fs.delete_file(path)

    def parquet_metadata(self, path: str):
        with self.fs.open_input_file(path) as f:
            return pq.ParquetFile(f).metadata

    def newest_mtime(self, path: str) -> float | None:
        """Newest file mtime (epoch seconds) under ``path``, recursive —
        vacuum's orphan-age probe. None when the store reports no mtimes
        (callers must then treat the dir as too young to reclaim)."""
        from pyarrow.fs import FileSelector, FileType

        infos = self.fs.get_file_info(FileSelector(path, recursive=True))
        ts = [
            i.mtime.timestamp()
            for i in infos
            if i.type == FileType.File and i.mtime is not None
        ]
        return max(ts) if ts else None

    # ---- atomic primitives (store-specific) --------------------------
    def replace_file(self, src: str, dst: str) -> None:
        """Atomic file replace (CURRENT pointer flip). Local os.replace;
        an S3 backend overrides with PUT (single-key PUT is atomic)."""
        os.replace(src, dst)

    def replace_dir(self, src: str, dst: str) -> None:
        os.replace(src, dst)

    def claim_with_content(self, tmp: str, dst: str) -> None:
        """Atomically create ``dst`` with ``tmp``'s content; raise
        FileExistsError when dst exists (exactly one creator wins)."""
        try:
            os.link(tmp, dst)
        except OSError as exc:
            if exc.errno == errno.EEXIST:
                raise FileExistsError(dst) from exc
            # no hard-link support (overlay/NFS): O_CREAT|O_EXCL keeps
            # the claim semantics; content lands just after the claim, so
            # a racing loser may briefly read a partial file — it then
            # raises and retries, never publishes over it
            fd = os.open(dst, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            try:
                with open(tmp, "rb") as src:
                    os.write(fd, src.read())
            finally:
                os.close(fd)


class ObjectStoreLakeStore(LakeStore):
    """LakeStore with OBJECT-STORE semantics: a flat key space with no
    rename and no hard links — every primitive is expressed in verbs an
    S3-class store actually has (the reference's MinIO surface,
    S3TestBase.kt:22-47, RenameS3Utils.kt:35-135):

    * ``replace_file``: single-key PUT (atomic per key on S3/GCS/ABS) —
      copy bytes to the destination key, delete the source key.
    * ``claim_with_content``: conditional PUT (``If-None-Match: *``) —
      exactly one creator wins. pyarrow's S3FileSystem exposes no
      conditional header, so a real S3 deployment passes ``conditional_put``
      (e.g. a boto3 put_object closure); the built-in emulation uses an
      O_CREAT|O_EXCL create against a LocalFileSystem-backed bucket dir,
      which has the identical win/lose contract.
    * ``replace_dir``: PREFIX COPY + DELETE — deliberately NON-ATOMIC,
      exactly like S3. Safe because the manifest publish is the commit
      point: keys under ``data/<txn>/`` are invisible until a manifest
      references them; a crash mid-copy leaves both prefixes unreferenced
      and commit_txn's retry discards and redoes them
      (RenameS3Utils.kt:88-135 rollback analog). ``fail_after_copies``
      injects that crash for tests.

    Works over any ``pyarrow.fs.FileSystem``; the default
    (LocalFileSystem + a directory as the bucket) drives the full commit
    protocol through object-store-legal operations only — no ``os.replace``
    / ``os.link`` on any lake path — so CI exercises the exact override
    surface a live S3 backend needs.
    """

    COPY_CHUNK = 8 << 20  # 8 MiB streamed copies
    stat_concurrency = 16  # latency-bound footer round trips — pool them

    def __init__(self, fs=None, conditional_put=None):
        super().__init__(fs)
        self._conditional_put = conditional_put
        self.fail_after_copies: int | None = None  # test fault injection

    def _copy_file(self, src: str, dst: str) -> None:
        with self.fs.open_input_stream(src) as r, self.fs.open_output_stream(
            dst
        ) as w:
            while True:
                chunk = r.read(self.COPY_CHUNK)
                if not chunk:
                    break
                w.write(chunk)

    def replace_file(self, src: str, dst: str) -> None:
        # single-key PUT then DELETE of the temp key (PUT visibility is
        # atomic on every major object store)
        self._copy_file(src, dst)
        self.fs.delete_file(src)

    def claim_with_content(self, tmp: str, dst: str) -> None:
        if self._conditional_put is not None:
            with self.fs.open_input_stream(tmp) as r:
                data = r.read()
            self._conditional_put(dst, data)  # raises FileExistsError on 412
            return
        from pyarrow.fs import LocalFileSystem

        if not isinstance(self.fs, LocalFileSystem):
            raise NotImplementedError(
                "pass conditional_put= (an If-None-Match:* PUT) for "
                "non-local object stores"
            )
        # local emulation of the conditional PUT: O_EXCL create is the
        # same exactly-one-creator contract
        fd = os.open(dst, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        try:
            with self.fs.open_input_stream(tmp) as r:
                os.write(fd, r.read())
        finally:
            os.close(fd)

    def replace_dir(self, src: str, dst: str) -> None:
        from pyarrow.fs import FileSelector, FileType

        infos = self.fs.get_file_info(FileSelector(src, recursive=True))
        files = sorted(i.path for i in infos if i.type == FileType.File)
        self.rmtree(dst)
        copied = 0
        for p in files:
            rel = p[len(src) :].lstrip("/")
            target = f"{dst}/{rel}"
            if self.fail_after_copies is not None and copied >= self.fail_after_copies:
                raise ConnectionError(
                    f"injected object-store failure after {copied} copies "
                    f"in replace_dir({src!r})"
                )
            parent = os.path.dirname(target)
            if parent:
                self.fs.create_dir(parent, recursive=True)
            self._copy_file(p, target)
            copied += 1
        self.fs.delete_dir(src)


_DEFAULT_STORE = LakeStore()


@dataclass
class Manifest:
    version: int = 0
    # bucket (as str, JSON keys) -> {"txn_id": ..., "hwm_lsn": int, "rows": int}
    buckets: dict[str, dict] = field(default_factory=dict)
    txns: list[str] = field(default_factory=list)
    schema_version: int = 0
    schema_fields: list[list[str]] = field(default_factory=list)  # [name, type_str]
    # the key-hash modulus this lake was bucketed with (0 = unrecorded;
    # point lookups then fall back to a dense-keyspace heuristic)
    num_buckets: int = 0
    # txn_id -> ingest DELTA metrics recorded at commit time (the
    # north-star's "per-partition lineage + metrics" observability half):
    # {"applied_rows", "applied_upserts", "applied_tombstones",
    #  "hwm_lsn"} — applied = rows this txn actually changed (lsn above
    # the bucket's previous watermark), NOT the copy-on-write rewrite
    # size. Old manifests without the key read back as {}.
    metrics: dict[str, dict] = field(default_factory=dict)
    # predicate-delete files (merge-on-read, Iceberg-v2-equality-delete
    # shape): each entry {"txn_id", "column", "op", "value", "owners"}
    # filters matching rows AT READ TIME from every bucket whose owning
    # txn still equals owners[bucket] (the snapshot taken when the delete
    # committed). A later apply rewrites its buckets with deletes applied
    # (read_lake is the merge input), so the entry deactivates there and
    # freshly upserted matching rows correctly SURVIVE. Entries with no
    # active bucket left are pruned at the next commit; compact()
    # materializes and clears all of them. Old manifests read back as [].
    deletes: list[dict] = field(default_factory=list)
    # MERGE-ON-READ delta entries (Iceberg-v2 data-sequencing shape, the
    # row-level twin of ``deletes``): bucket id -> ORDERED list of entries
    # shaped exactly like a bucket entry ({"txn_id", "hwm_lsn", "rows",
    # "files": [...]}) committed by apply_incremental(mode="mor"). A MOR
    # apply writes ONLY its micro-batch's winners (O(delta) bytes, never
    # the bucket's base) and appends here; readers merge base + deltas
    # LWW per key at scan time, so commit cost is independent of bucket
    # size — the micro-batch latency path a 100 TB lake needs. Invariant:
    # every key here is also in ``buckets`` (the first write to a bucket
    # commits as its base). A copy-on-write rewrite of a bucket (apply,
    # compact, fold) clears its delta list — the rewrite merged them in.
    # Old manifests read back as {}.
    deltas: dict[str, list[dict]] = field(default_factory=dict)
    # declarative table CHECK constraints (the Delta ALTER TABLE ADD
    # CONSTRAINT analog): [{"name", "column", "op", "value"}] — enforced
    # on every apply's incoming events (checkpoint._gate_constraints).
    # Ops: not_null, in, <=, >=, max_len. Value constraints follow SQL
    # CHECK three-valued logic: NULL passes (not_null is the null catcher).
    # Old manifests read back as []. Metadata-only commits
    # (set_constraint / drop_constraint) add or remove entries.
    constraints: list[dict] = field(default_factory=list)
    # in-flight ONLINE RESCALE state (None = not rescaling):
    # {"to": target modulus, "split": sorted old-bucket ids already split}.
    # While set, bucket assignment is MIXED: a key whose OLD bucket
    # (hash % num_buckets) is in "split" lives at hash % to; otherwise it
    # still lives at its old id. Bucket ids >= num_buckets are always
    # new-modulus ids; an id < num_buckets is a new-modulus id iff that id
    # is in "split" (splitting old bucket b under to = f*M yields exactly
    # {b + M*j, j < f} — bucket-local, so each split step rewrites only
    # its own buckets with NO cross-bucket shuffle). rescale.finalize (or
    # the last rescale_step, or compact) flips num_buckets to "to" and
    # clears this. Old manifests read back as None.
    rescale: dict | None = None

    def hwm(self) -> dict[int, int]:
        """Per-bucket high watermark across the base AND its merge-on-read
        deltas — the dedup filter, delta metrics and delete-entry lsn
        snapshots must all see the true newest committed lsn."""
        out = {int(b): info["hwm_lsn"] for b, info in self.buckets.items()}
        for b, entries in self.deltas.items():
            ib = int(b)
            for e in entries:
                out[ib] = max(out.get(ib, -1), e["hwm_lsn"])
        return out

    def data_dirs(self, lake_dir: str) -> list[str]:
        """One directory per live (txn, bucket) — input paths for read."""
        out = []
        for b, info in sorted(self.buckets.items(), key=lambda kv: int(kv[0])):
            out.append(os.path.join(lake_dir, DATA_DIR, info["txn_id"], f"bucket={b}"))
        return out


def _manifest_from_dict(d: dict) -> Manifest:
    """One decode path for every manifest read — keys absent from old
    manifests get their dataclass defaults (forward-compatible reads)."""
    return Manifest(
        version=d["version"],
        buckets=d["buckets"],
        txns=d["txns"],
        schema_version=d.get("schema_version", 0),
        schema_fields=d.get("schema_fields", []),
        num_buckets=d.get("num_buckets", 0),
        metrics=d.get("metrics", {}),
        deletes=d.get("deletes", []),
        deltas=d.get("deltas", {}),
        constraints=d.get("constraints", []),
        rescale=d.get("rescale"),
    )


def bucket_ids_mixed(h, num_buckets: int, rescale: dict | None):
    """Vectorized bucket assignment honoring an in-flight online rescale.

    ``h`` is the uint64 stable key hash array (transforms.key_hash_u64).
    No rescale: plain ``h % num_buckets``. Mid-rescale: keys whose old
    bucket is already split live at ``h % rescale["to"]``; the rest stay
    at their old id — the ONE rule every reader and writer (apply,
    read_key, read_lake's delete scoping) must share, or a key would be
    written to one bucket and looked up in another."""
    import numpy as np

    old = (h % np.uint64(num_buckets)).astype(np.int64)
    if not rescale:
        return old
    new = (h % np.uint64(rescale["to"])).astype(np.int64)
    is_split = np.zeros(num_buckets, dtype=bool)
    split = rescale.get("split", [])
    if split:
        is_split[np.asarray(split, dtype=np.int64)] = True
    return np.where(is_split[old], new, old)


def _manifest_path(lake_dir: str, version: int, branch: str | None = None) -> str:
    if branch is None or branch == "main":
        return os.path.join(lake_dir, MANIFEST_DIR, f"manifest-{version:06d}.json")
    return os.path.join(lake_dir, MANIFEST_DIR, f"manifest-{branch}-{version:06d}.json")


def _pointer_name(branch: str | None) -> str:
    """Pointer file for a branch head. ``None``/'main' = CURRENT (the
    default branch every existing lake already has)."""
    if branch is None or branch == "main":
        return "CURRENT"
    import re

    if not re.fullmatch(r"[A-Za-z0-9._-]{1,64}", branch) or ".tmp-" in branch:
        # '.tmp-' would collide with crashed pointer temp files, which
        # list_branches (and therefore vacuum's live set) must skip
        raise ValueError(f"invalid branch name {branch!r}")
    return f"BRANCH-{branch}"


def read_manifest(
    lake_dir: str,
    store: LakeStore | None = None,
    version: int | None = None,
    branch: str | None = None,
) -> Manifest:
    """Read the CURRENT manifest, a pinned historical ``version``, or a
    ``branch`` head — manifests are immutable once claimed, so any
    version still on disk is a consistent snapshot (time travel).
    Retention caveat: ``vacuum`` keeps only txns referenced by the
    CURRENT manifest's txn list; txns accumulate across incremental
    applies, so history stays readable until a ``compact`` (which
    collapses the txn list) plus vacuum."""
    store = store or _DEFAULT_STORE
    if version is not None and branch not in (None, "main"):
        raise ValueError("pass version OR branch, not both")
    if version is None:
        cur = os.path.join(lake_dir, MANIFEST_DIR, _pointer_name(branch))
        if not store.exists(cur):
            if branch is not None and branch != "main":
                raise FileNotFoundError(f"no branch {branch!r} in {lake_dir}")
            return Manifest()
        raw = store.read_text(cur).strip()
        mpath = (
            _manifest_path(lake_dir, int(raw))
            if raw.isdigit()
            else os.path.join(lake_dir, MANIFEST_DIR, raw)
        )
    else:
        mpath = _manifest_path(lake_dir, version)
    d = json.loads(store.read_text(mpath))
    return _manifest_from_dict(d)


class CommitConflict(RuntimeError):
    """Another writer published this manifest version first. The loser's
    txn data is unreferenced (vacuumable); retry by re-reading the
    manifest and re-applying — Delta-style optimistic concurrency."""


def _publish(
    lake_dir: str,
    m: Manifest,
    store: LakeStore | None = None,
    branch: str | None = None,
) -> None:
    """The atomic commit point with optimistic concurrency: the manifest
    content is fully written to a temp file, then claimed to
    manifest-<v>.json via ``store.claim_with_content`` — an atomic
    claim-with-content (os.link locally; an object store's conditional
    PUT; Delta-style: exactly one writer wins a version). If the version
    is already claimed by an IDENTICAL manifest, this is our own crashed
    earlier attempt and we just finish the pointer update; a different
    manifest raises CommitConflict (the loser's staged data stays
    unreferenced and vacuumable). Finally the CURRENT pointer is
    atomically replaced (the RenameDiskUtils phase-2 analog)."""
    store = store or _DEFAULT_STORE
    mdir = os.path.join(lake_dir, MANIFEST_DIR)
    store.makedirs(mdir)
    mpath = _manifest_path(lake_dir, m.version, branch)
    payload = {
        "version": m.version,
        "buckets": m.buckets,
        "txns": m.txns,
        "schema_version": m.schema_version,
        "schema_fields": m.schema_fields,
        "num_buckets": m.num_buckets,
        "metrics": m.metrics,
        "deletes": m.deletes,
        "deltas": m.deltas,
        "constraints": m.constraints,
        "rescale": m.rescale,
        "committed_at": time.time(),
    }
    tmp = mpath + f".tmp-{os.getpid()}"
    store.write_text(tmp, json.dumps(payload, indent=1, sort_keys=True))
    try:
        try:
            store.claim_with_content(tmp, mpath)
        except FileExistsError:
            existing = json.loads(store.read_text(mpath))

            def _cmp(d):
                return {k: v for k, v in d.items() if k != "committed_at"}

            if _cmp(existing) != _cmp(payload):
                raise CommitConflict(
                    f"manifest version {m.version} already published by "
                    "another writer"
                )
            # identical content: our own crashed attempt claimed it — fall
            # through and finish the CURRENT pointer update
    finally:
        if store.exists(tmp):
            store.delete_file(tmp)
    _finish_pointer(lake_dir, m, store, branch)


def _finish_pointer(
    lake_dir: str, m: Manifest, store: LakeStore, branch: str | None
) -> None:
    """Atomically move the branch head pointer to manifest ``m`` (the
    last step of a publish; also the recovery step when a crashed
    publish claimed the manifest but never moved the pointer)."""
    mdir = os.path.join(lake_dir, MANIFEST_DIR)
    mpath = _manifest_path(lake_dir, m.version, branch)
    pointer = _pointer_name(branch)
    cur_tmp = os.path.join(mdir, f"{pointer}.tmp-{os.getpid()}")
    content = str(m.version) if pointer == "CURRENT" else os.path.basename(mpath)
    store.write_text(cur_tmp, content)
    store.replace_file(cur_tmp, os.path.join(mdir, pointer))


def create_branch(
    lake_dir: str,
    name: str,
    from_version: int | None = None,
    store: LakeStore | None = None,
) -> int:
    """Branch = a named pointer into the immutable manifest chain (the
    same primitive as time travel, made writable). Creating an existing
    branch raises. Returns the version the branch points at."""
    store = store or _DEFAULT_STORE
    pointer = _pointer_name(name)
    if pointer == "CURRENT":
        raise ValueError("'main' is the default branch — it always exists")
    m = read_manifest(lake_dir, store=store, version=from_version)
    if m.version == 0:
        raise FileNotFoundError(f"no committed state in {lake_dir}")
    mdir = os.path.join(lake_dir, MANIFEST_DIR)
    tmp = os.path.join(mdir, f"{pointer}.tmp-{os.getpid()}")
    # the pointer stores the manifest FILENAME: branch commits claim in
    # their own manifest-<branch>-<v> namespace, so an int would be
    # ambiguous between chains
    store.write_text(tmp, os.path.basename(_manifest_path(lake_dir, m.version)))
    try:
        store.claim_with_content(tmp, os.path.join(mdir, pointer))
    except FileExistsError:
        raise CommitConflict(f"branch {name!r} already exists") from None
    finally:
        if store.exists(tmp):
            store.delete_file(tmp)
    return m.version


def list_branches(lake_dir: str, store: LakeStore | None = None) -> dict[str, int]:
    """All branch heads (incl. 'main') -> manifest version."""
    store = store or _DEFAULT_STORE
    mdir = os.path.join(lake_dir, MANIFEST_DIR)
    out: dict[str, int] = {}
    if not store.exists(mdir):
        return out
    import re

    def _ver(raw: str) -> int:
        raw = raw.strip()
        if raw.isdigit():
            return int(raw)
        m = re.search(r"(\d+)\.json$", raw)
        if m is None:
            raise ValueError(f"unparseable pointer content {raw!r}")
        return int(m.group(1))

    for fn in store.listdir(mdir):
        if fn == "CURRENT":
            out["main"] = _ver(store.read_text(os.path.join(mdir, fn)))
        elif fn.startswith("BRANCH-") and ".tmp-" not in fn:
            out[fn[len("BRANCH-") :]] = _ver(store.read_text(os.path.join(mdir, fn)))
    return out


def delete_branch(lake_dir: str, name: str, store: LakeStore | None = None) -> None:
    """Remove the pointer AND the branch's claimed manifest files — a
    stale claimed version would make a recreated branch of the same name
    permanently unwritable (its first commit loses the claim forever).
    Data dirs are left for vacuum (they may be shared with main)."""
    store = store or _DEFAULT_STORE
    pointer = _pointer_name(name)
    if pointer == "CURRENT":
        raise ValueError("cannot delete the default branch")
    mdir = os.path.join(lake_dir, MANIFEST_DIR)
    p = os.path.join(mdir, pointer)
    if not store.exists(p):
        raise FileNotFoundError(f"no branch {name!r} in {lake_dir}")
    store.delete_file(p)
    import re

    pat = re.compile(rf"^manifest-{re.escape(name)}-\d+\.json$")
    for fn in store.listdir(mdir):
        if pat.match(fn):
            store.delete_file(os.path.join(mdir, fn))


def merge_branch(lake_dir: str, name: str, store: LakeStore | None = None) -> Manifest:
    """FAST-FORWARD merge of branch ``name`` into main: allowed only when
    main has not advanced past the branch point (main's txn list is a
    prefix-subset of the branch's — every main txn is already part of the
    branch's state). A diverged main raises CommitConflict; the caller
    re-applies the branch's txns on top of main (the engine's idempotent
    applies make that safe). Mirrors git's ff-only merge — no three-way
    data merge is invented here. The merge REPUBLISHES the branch head as
    main's next version through the normal claim, so a concurrently
    advancing main loses the claim and conflicts instead of being
    silently overwritten."""
    store = store or _DEFAULT_STORE
    b = read_manifest(lake_dir, store=store, branch=name)
    main = read_manifest(lake_dir, store=store)
    if not set(main.txns) <= set(b.txns):
        raise CommitConflict(
            f"main diverged from branch {name!r} "
            f"(main txns {sorted(set(main.txns) - set(b.txns))} are not on "
            "the branch) — re-apply the branch txns on top of main instead"
        )
    merged = Manifest(
        version=main.version + 1,
        buckets=b.buckets,
        txns=b.txns,
        schema_version=b.schema_version,
        schema_fields=b.schema_fields,
        num_buckets=b.num_buckets,
        metrics=b.metrics,
        deletes=b.deletes,
        deltas=b.deltas,
        constraints=b.constraints,
        rescale=b.rescale,
    )
    _publish(lake_dir, merged, store=store)
    return merged


def commit_txn(
    lake_dir: str,
    txn_id: str,
    winners: "ray.data.Dataset",
    fail_before_publish: bool = False,
    store: LakeStore | None = None,
    expected_version: int | None = None,
    num_buckets: int | None = None,
    record_metrics: bool = True,
    branch: str | None = None,
    merge_on_read: bool = False,
    empty_buckets: "dict[str, int] | None" = None,
    extra_metrics: "dict | None" = None,
) -> Manifest:
    """Write the winners dataset (must contain 'bucket' and 'op' columns)
    as transaction ``txn_id`` and atomically publish the new manifest.

    ``merge_on_read=True`` commits the rows as DELTA entries against
    buckets that already hold a base (manifest ``deltas``; readers merge
    base + deltas LWW at scan time) instead of replacing the bucket —
    O(delta) write cost regardless of bucket size. Buckets written for
    the first time still commit as base entries. The winners must be the
    micro-batch's OWN LWW winners (tombstones included); they must NOT
    have been merged against prior state (that would duplicate carried
    rows into the delta chain).

    ``empty_buckets`` ({bucket: hwm_lsn}) declares buckets whose REWRITTEN
    state is legitimately empty (e.g. a fold over a bucket a predicate
    delete wiped clean): the write produces no file for them, so without
    the declaration the old entry — and its delta chain and active delete
    entries — would survive. Declared buckets the write DID produce data
    for are ignored; the rest commit as an explicit empty entry
    (``rows: 0, files: []``) preserving the watermark, so hwm dedup still
    drops re-deliveries of the wiped rows.

    Idempotent: if ``txn_id`` is already committed, returns the current
    manifest untouched (re-delivered batch = no-op, the exactly-once
    guarantee the reference approximates with staged S3 renames,
    RenameS3Utils.kt:23-33).

    ``fail_before_publish`` injects a crash between the data move and the
    manifest publish (for resume tests — the window where data files exist
    but are invisible).
    """
    store = store or _DEFAULT_STORE
    if "--" in txn_id:
        # '--' is reserved as the branch-namespace separator: a main apply
        # whose literal id is e.g. 'dev--txn-0002' would alias the merged
        # branch txn and be silently idempotency-skipped as a different
        # logical txn
        raise ValueError(
            f"txn id {txn_id!r} contains the reserved branch separator '--'"
        )
    if branch is not None and not store.exists(
        os.path.join(lake_dir, MANIFEST_DIR, _pointer_name(branch))
    ):
        raise FileNotFoundError(
            f"no branch {branch!r} in {lake_dir} — create_branch first"
        )
    manifest = read_manifest(lake_dir, store=store, branch=branch)
    # branch commits namespace their PHYSICAL txn dir: the same logical
    # txn id re-applied on another branch merges against a different base
    # (different winners), and _write_txn_data discards a pre-existing
    # final dir — without the prefix, a main re-apply would clobber data
    # files the branch's manifest still references
    if branch is not None and branch != "main":
        txn_id = f"{branch}--{txn_id}"
    if txn_id in manifest.txns:
        return manifest
    # crash-after-claim recovery: if the NEXT version's manifest is
    # already claimed by THIS txn (the publish crashed between the claim
    # and the pointer move), the data files that manifest references are
    # in place — finish the pointer update instead of rewriting the data
    # dir (a rewrite would mint new file names and orphan the claimed
    # manifest's per-file stats)
    nxt_path = _manifest_path(lake_dir, manifest.version + 1, branch)
    if store.exists(nxt_path):
        d = json.loads(store.read_text(nxt_path))
        if d.get("txns") == [*manifest.txns, txn_id]:
            nxt = _manifest_from_dict(d)
            _finish_pointer(lake_dir, nxt, store, branch)
            return nxt
    # optimistic-concurrency pin: a caller that MERGED against manifest
    # version V must not publish over a newer version — its winners were
    # computed from stale prior state and would silently drop the other
    # writer's rows in shared buckets (copy-on-write rewrites the whole
    # bucket). The manifest-claim race below only catches ties on the
    # SAME version number; this check catches the merge-window race.
    if expected_version is not None and manifest.version != expected_version:
        raise CommitConflict(
            f"manifest moved from v{expected_version} to v{manifest.version} "
            "since the merge began — re-read and re-merge"
        )
    if merge_on_read and manifest.rescale:
        # mid-rescale the mixed rule moves keys between bucket ids as
        # splits land; a delta entry appended under a pre-split id would
        # detach from its base when the split rewrites it. Deltas and
        # in-flight rescales are mutually exclusive by construction
        # (rescale_start refuses while deltas exist, and vice versa here).
        raise ValueError(
            "merge-on-read commit refused while an online rescale is in "
            "flight — finish the rescale (or compact) first"
        )

    bucket_stats = _write_txn_data(lake_dir, txn_id, winners, store=store)
    for b, w in (empty_buckets or {}).items():
        if b not in bucket_stats:
            bucket_stats[b] = {
                "txn_id": txn_id,
                "hwm_lsn": int(w),
                "rows": 0,
                "files": [],
            }

    metrics = dict(manifest.metrics)
    if record_metrics:
        metrics[txn_id] = _txn_delta_metrics(
            lake_dir, txn_id, manifest.hwm(), store
        )
        if extra_metrics:
            # caller-supplied per-txn counters (e.g. the validation
            # gate's applied_invalid_dropped) — must be deterministic
            # across crash retries like everything else in the manifest
            metrics[txn_id] = {**metrics[txn_id], **extra_metrics}
    metrics = _retain_metrics(metrics)

    if fail_before_publish:
        raise RuntimeError(f"injected failure before publish of {txn_id}")

    # commit point: version+1 in the BRANCH's own manifest-file namespace —
    # two writers racing on the same head claim the same filename, and
    # claim_with_content arbitrates exactly one winner (the loser retries)
    if merge_on_read:
        # MOR commit: buckets already holding a base keep it untouched and
        # gain a delta entry (readers merge LWW at scan time); buckets
        # this txn writes FIRST commit as ordinary base entries, keeping
        # the invariant deltas.keys() <= buckets.keys()
        base_new = {b: st for b, st in bucket_stats.items() if b not in manifest.buckets}
        new_buckets = {**manifest.buckets, **base_new}
        new_deltas = {b: list(es) for b, es in manifest.deltas.items()}
        for b, st in bucket_stats.items():
            if b in manifest.buckets:
                new_deltas.setdefault(b, []).append(st)
    else:
        new_buckets = {**manifest.buckets, **bucket_stats}
        # a copy-on-write rewrite merged the bucket's deltas in (read_lake
        # is the merge input), so its delta list clears here
        new_deltas = {
            b: list(es)
            for b, es in manifest.deltas.items()
            if b not in bucket_stats
        }
    new = Manifest(
        version=manifest.version + 1,
        buckets=new_buckets,
        txns=[*manifest.txns, txn_id],
        schema_version=manifest.schema_version,
        schema_fields=manifest.schema_fields,
        num_buckets=num_buckets if num_buckets is not None else manifest.num_buckets,
        metrics=metrics,
        # a rewritten bucket was merged from a read WITH deletes applied,
        # so its entry deactivates there; fully-inactive entries drop out
        deletes=[
            e for e in manifest.deletes if _active_delete_buckets(e, new_buckets)
        ],
        deltas=new_deltas,
        constraints=manifest.constraints,
        # an in-flight online rescale rides through ordinary applies
        # untouched — the apply bucketed its winners with the mixed rule
        rescale=manifest.rescale,
    )
    _publish(lake_dir, new, store=store, branch=branch)
    return new


#: predicate operators delete_where supports ('==' exact match, 'prefix'
#: string prefix). Small on purpose: every op must be evaluable both as an
#: Arrow kernel at read time and by downstream SQL oracles.
DELETE_OPS = ("==", "prefix")


def _active_delete_buckets(entry: dict, buckets: dict[str, dict]) -> list[str]:
    """Buckets a predicate-delete entry still applies to: those whose
    owning txn is unchanged since the delete committed (a rewritten
    bucket was merged with the delete already applied)."""
    return [
        b
        for b, owner in entry.get("owners", {}).items()
        if buckets.get(b, {}).get("txn_id") == owner
    ]


def _delete_predicate_mask(t, entry: dict):
    """Boolean mask (Arrow) of rows MATCHING the delete predicate —
    nulls in the predicate column never match (they survive)."""
    col = t[entry["column"]]
    if entry["op"] == "==":
        mask = pc.equal(col, entry["value"])
    elif entry["op"] == "prefix":
        mask = pc.starts_with(col, entry["value"])
    else:  # manifest written by a newer engine version — fail loudly
        raise ValueError(f"unknown delete predicate op {entry['op']!r}")
    return pc.fill_null(mask, False)


def delete_where(
    lake_dir: str,
    txn_id: str,
    column: str,
    op: str,
    value: str,
    store: LakeStore | None = None,
    branch: str | None = None,
    max_attempts: int = 5,
) -> Manifest:
    """METADATA-ONLY predicate delete (merge-on-read): commit a delete
    file ``column op value`` into the manifest without touching any data
    file — O(manifest), not O(data). Matching rows disappear from every
    read (read_lake, read_key, and therefore every later merge input)
    immediately; each bucket physically materializes the delete the next
    time an apply or compact() rewrites it, at which point the entry
    deactivates for that bucket — so a LATER upsert of a matching key
    correctly survives (Iceberg-v2 equality-delete sequencing).

    Exactly-once by txn id like commit_txn; optimistic-concurrency
    retries internally (metadata-only, so a retry is cheap).

    The instant-wipe half of the reference's delete-by-prefix processor
    (DeleteAllS3ObjectsByPrefix.kt:25-129): where checkpoint.delete_by_prefix
    tombstones each key through the merge (per-key feed, audit trail in
    the event log), this removes an arbitrary predicate's rows in one
    manifest write — the GDPR-eraser shape that must not rewrite 100 TB."""
    store = store or _DEFAULT_STORE
    if "--" in txn_id:
        raise ValueError(
            f"txn id {txn_id!r} contains the reserved branch separator '--'"
        )
    if op not in DELETE_OPS:
        raise ValueError(f"op must be one of {DELETE_OPS}, got {op!r}")
    if branch is not None and branch != "main":
        if not store.exists(
            os.path.join(lake_dir, MANIFEST_DIR, _pointer_name(branch))
        ):
            raise FileNotFoundError(
                f"no branch {branch!r} in {lake_dir} — create_branch first"
            )
        txn_id = f"{branch}--{txn_id}"

    last: Exception | None = None
    for _ in range(max_attempts):
        manifest = read_manifest(lake_dir, store=store, branch=branch)
        if txn_id in manifest.txns:
            return manifest  # re-delivered delete = no-op
        entry = {
            "txn_id": txn_id,
            "column": column,
            "op": op,
            "value": value,
            "owners": {
                b: info["txn_id"] for b, info in manifest.buckets.items()
            },
            # per-bucket lsn snapshot at delete time (base AND deltas):
            # the delete applies only to rows with lsn <= this bound, so
            # a LATER merge-on-read upsert of a matching key survives
            # even though the bucket's base owner never changes. Rows a
            # COW bucket holds are always <= its snapshot, so this is a
            # no-op narrowing for copy-on-write lakes (legacy entries
            # without the key behave exactly as before).
            "hwms": {str(b): w for b, w in manifest.hwm().items()},
        }
        new = Manifest(
            version=manifest.version + 1,
            buckets=manifest.buckets,
            txns=[*manifest.txns, txn_id],
            schema_version=manifest.schema_version,
            schema_fields=manifest.schema_fields,
            num_buckets=manifest.num_buckets,
            metrics=manifest.metrics,
            deletes=[
                e
                for e in manifest.deletes
                if _active_delete_buckets(e, manifest.buckets)
            ]
            + [entry],
            deltas=manifest.deltas,
            constraints=manifest.constraints,
            rescale=manifest.rescale,
        )
        try:
            _publish(lake_dir, new, store=store, branch=branch)
            return new
        except CommitConflict as exc:  # another writer won this version
            last = exc
    raise last


#: CHECK-constraint operators. Small on purpose (mirrors DELETE_OPS):
#: every op must be evaluable as a vectorized Arrow kernel at apply time
#: AND by the downstream SQL oracles. Value ops use SQL three-valued
#: logic (NULL passes); ``not_null`` is the null catcher.
CONSTRAINT_OPS = ("not_null", "in", "<=", ">=", "max_len")


def set_constraint(
    lake_dir: str,
    name: str,
    column: str,
    op: str,
    value=None,
    store: LakeStore | None = None,
    branch: str | None = None,
    max_attempts: int = 5,
) -> Manifest:
    """Register a declarative CHECK constraint (the Delta ``ALTER TABLE
    ADD CONSTRAINT`` analog) as a METADATA-ONLY commit: manifest v+1
    carries the entry; every subsequent ``apply_incremental`` enforces
    it against incoming events (checkpoint._gate_constraints) — raise or
    drop-and-count per the apply's ``on_violation``. Existing committed
    data is NOT retro-checked (same contract as Delta: the constraint
    governs writes from its commit forward). Re-registering the same
    name replaces the entry (idempotent for identical specs)."""
    if op not in CONSTRAINT_OPS:
        raise ValueError(f"op must be one of {CONSTRAINT_OPS}, got {op!r}")
    if op == "not_null" and value is not None:
        raise ValueError("not_null takes no value")
    if op == "in" and not isinstance(value, (list, tuple)):
        raise ValueError("'in' needs a list value")
    if op in ("<=", ">=", "max_len") and value is None:
        raise ValueError(f"{op!r} needs a value")
    store = store or _DEFAULT_STORE
    entry = {
        "name": name,
        "column": column,
        "op": op,
        "value": list(value) if isinstance(value, tuple) else value,
    }
    last: Exception | None = None
    for _ in range(max_attempts):
        m = read_manifest(lake_dir, store=store, branch=branch)
        if entry in m.constraints:
            return m  # identical spec already registered
        kept = [c for c in m.constraints if c["name"] != name]
        new = Manifest(
            version=m.version + 1,
            buckets=m.buckets,
            txns=m.txns,
            schema_version=m.schema_version,
            schema_fields=m.schema_fields,
            num_buckets=m.num_buckets,
            metrics=m.metrics,
            deletes=m.deletes,
            deltas=m.deltas,
            constraints=[*kept, entry],
            rescale=m.rescale,
        )
        try:
            _publish(lake_dir, new, store=store, branch=branch)
            return new
        except CommitConflict as exc:
            last = exc
    raise last


def drop_constraint(
    lake_dir: str,
    name: str,
    store: LakeStore | None = None,
    branch: str | None = None,
    max_attempts: int = 5,
) -> Manifest:
    """Remove a registered CHECK constraint (metadata-only commit;
    dropping an unknown name is a no-op returning the current manifest)."""
    store = store or _DEFAULT_STORE
    last: Exception | None = None
    for _ in range(max_attempts):
        m = read_manifest(lake_dir, store=store, branch=branch)
        kept = [c for c in m.constraints if c["name"] != name]
        if len(kept) == len(m.constraints):
            return m
        new = Manifest(
            version=m.version + 1,
            buckets=m.buckets,
            txns=m.txns,
            schema_version=m.schema_version,
            schema_fields=m.schema_fields,
            num_buckets=m.num_buckets,
            metrics=m.metrics,
            deletes=m.deletes,
            deltas=m.deltas,
            constraints=kept,
            rescale=m.rescale,
        )
        try:
            _publish(lake_dir, new, store=store, branch=branch)
            return new
        except CommitConflict as exc:
            last = exc
    raise last


# Per-txn lineage metrics kept IN the manifest. Without a bound every
# manifest write/read on a long-running micro-batch tail is O(all txns
# ever) — compaction collapses the txn list but deliberately keeps
# metrics, so they are the one unbounded component. Oldest entries age
# out in manifest insertion order (== commit order).
METRICS_RETAIN_TXNS = 512


def _retain_metrics(metrics: dict[str, dict]) -> dict[str, dict]:
    if len(metrics) <= METRICS_RETAIN_TXNS:
        return metrics
    drop = len(metrics) - METRICS_RETAIN_TXNS
    return {k: v for i, (k, v) in enumerate(metrics.items()) if i >= drop}


def _delta_counts_one_bucket(files, prev_hwm: int, fs) -> tuple[int, int, int]:
    """(applied_rows, applied_tombstones, max_lsn) for one committed
    bucket dir: rows with lsn above the bucket's PREVIOUS watermark are
    the ones this txn actually changed (everything below is the
    copy-on-write carry-over of prior state). Column-pruned read of
    (op, lsn) only — never the content bytes."""
    import pyarrow.compute as pc

    applied = tombs = 0
    mx = -1
    for f in files:
        t = pq.read_table(f, columns=["op", "lsn"], filesystem=fs)
        if t.num_rows == 0:
            continue
        mx = max(mx, pc.max(t["lsn"]).as_py())
        new = t.filter(pc.greater(t["lsn"], prev_hwm))
        applied += new.num_rows
        tombs += pc.sum(
            pc.cast(pc.equal(new["op"], "delete"), "int64")
        ).as_py() or 0
    return applied, tombs, mx


_DELTA_COUNTS_REMOTE = None


def _delta_counts_remote():
    """Memoized ray.remote wrapper so repeated commits (tail_replay's
    per-micro-batch txns, bench loops) reuse one exported function
    instead of re-pickling it per commit. Built lazily to keep module
    import Ray-free."""
    global _DELTA_COUNTS_REMOTE
    if _DELTA_COUNTS_REMOTE is None:
        import ray

        _DELTA_COUNTS_REMOTE = ray.remote(num_cpus=0.5)(_delta_counts_one_bucket)
    return _DELTA_COUNTS_REMOTE


def _txn_delta_metrics(
    lake_dir: str, txn_id: str, prev_hwm: dict[int, int], store: LakeStore
) -> dict:
    """Ingest metrics for one committed txn, computed from the just-moved
    data dir BEFORE the manifest publish (one parallel Ray task per
    bucket; at 100 TB op+lsn are a sliver of the content-dominated
    files). Deterministic — identical across crashed retries, so the
    idempotent-publish content comparison still holds."""
    import ray

    final_dir = os.path.join(lake_dir, DATA_DIR, txn_id)
    fn = _delta_counts_remote()
    refs = []
    for entry in store.listdir(final_dir):
        if not entry.startswith("bucket="):
            continue
        b = int(entry.split("=", 1)[1])
        bdir = os.path.join(final_dir, entry)
        files = [
            os.path.join(bdir, f)
            for f in store.listdir(bdir)
            if f.endswith(".parquet")
        ]
        refs.append(fn.remote(files, prev_hwm.get(b, -1), store.fs))
    applied = tombs = 0
    mx = -1
    for a, t, m in ray.get(refs):
        applied += a
        tombs += t
        mx = max(mx, m)
    return {
        "applied_rows": applied,
        "applied_upserts": applied - tombs,
        "applied_tombstones": tombs,
        "hwm_lsn": mx,
    }


def _write_txn_data(
    lake_dir: str, txn_id: str, winners, store: LakeStore | None = None
) -> dict[str, dict]:
    """Phase 1+2 of a txn WITHOUT the manifest publish: staged distributed
    write partitioned by bucket, per-bucket footer stats, atomic move of
    the staging dir into data/. Everything written here stays invisible
    until some manifest references it."""
    store = store or _DEFAULT_STORE
    staging = os.path.join(lake_dir, STAGING_DIR, txn_id)
    final_dir = os.path.join(lake_dir, DATA_DIR, txn_id)
    # a previous crashed attempt may have left either dir — both are
    # unreferenced (txn not in manifest), so discard and redo (the
    # "temp dir always deleted" cleanup of RenameDiskUtils.kt:102-104)
    for d in (staging, final_dir):
        store.rmtree(d)
    store.makedirs(staging)

    # phase 1: staged distributed write, partitioned by bucket (workers
    # write through the SAME filesystem object the store wraps)
    # zstd over the default snappy: ~20% smaller committed files at equal
    # write time (A/B in BASELINE.md) — at 100 TB that is storage AND read
    # bandwidth; text content is the dominant column and compresses well
    winners.write_parquet(
        staging, partition_cols=["bucket"], filesystem=store.fs, compression="zstd"
    )

    # gather per-bucket AND per-file stats from parquet footers (no data
    # scan). The per-file key/lsn ranges go into the manifest so point
    # lookups and range scans can prune files from METADATA alone — at
    # 100 TB the footer-open round trips are the point-lookup cost, and
    # the manifest is already in hand. The per-bucket work (one footer
    # open + one key-columns read per staged file) is independent; on an
    # object store the round trips are the commit-latency floor, so it
    # runs on a thread pool sized by store.stat_concurrency (1 on local
    # filesystems, where the pool measurably HURTS — see LakeStore).
    def _bucket_stat(entry: str) -> tuple[str, dict]:
        b = entry.split("=", 1)[1]
        hwm = -1
        rows = 0
        file_stats: list[dict] = []
        bdir = os.path.join(staging, entry)
        for fn in store.listdir(bdir):
            if not fn.endswith(".parquet"):
                continue
            md = store.parquet_metadata(os.path.join(bdir, fn))
            rows += md.num_rows
            # UNCOMPRESSED bytes (sum of row-group total_byte_size, free —
            # the footer is already in hand) so scan planning right-sizes
            # read blocks from the manifest alone in the same in-memory
            # units checkpoint's delta coalesce uses; on-disk zstd bytes
            # would understate decoded text 3-5x right at the threshold
            raw = sum(
                md.row_group(rg).total_byte_size for rg in range(md.num_row_groups)
            )
            fstat: dict = {"name": fn, "rows": int(md.num_rows), "bytes": int(raw)}
            mins: dict[str, object] = {}
            maxs: dict[str, object] = {}
            for rg in range(md.num_row_groups):
                col_md = md.row_group(rg)
                for ci in range(col_md.num_columns):
                    c = col_md.column(ci)
                    if c.path_in_schema == "lsn" and c.statistics is not None:
                        hwm = max(hwm, c.statistics.max)
                    if (
                        "." not in c.path_in_schema  # top-level columns only
                        and c.statistics is not None
                        and c.statistics.has_min_max
                    ):
                        n, st = c.path_in_schema, c.statistics
                        mins[n] = st.min if n not in mins else min(mins[n], st.min)
                        maxs[n] = st.max if n not in maxs else max(maxs[n], st.max)
            for n in mins:  # column-wise bounds (conservative prune)
                if n in ("repo", "path", "lsn"):
                    # key/watermark columns: exact bounds (short by
                    # construction; read_key's range probe needs them)
                    fstat[f"{n}_min"] = mins[n]
                    fstat[f"{n}_max"] = maxs[n]
                else:
                    # payload columns (commit, lang, evolved adds, even
                    # content): Iceberg-style truncated bounds — lower
                    # is a prefix (<= value), upper is rounded UP past
                    # the truncation point, else dropped. Keeps manifest
                    # entries O(16 chars) per column while every scan
                    # ranges= predicate on any column can file-prune.
                    lo = _bound_lower(mins[n])
                    hi = _bound_upper(maxs[n])
                    if lo is not None:
                        fstat[f"{n}_min"] = lo
                    if hi is not None:
                        fstat[f"{n}_max"] = hi
            if {"repo", "path"} <= set(md.schema.names) and md.num_rows:
                # per-file key bloom: one key-columns-only read per staged
                # file at commit time (content bytes never move) buys
                # storage-free negative point lookups forever after —
                # min/max ranges of multi-txn bucket files overlap, the
                # bloom still prunes (read_key checks it after the ranges)
                with store.fs.open_input_file(os.path.join(bdir, fn)) as kf:
                    kt = pq.read_table(kf, columns=["repo", "path"])
                fstat["key_bloom"] = _bloom_build(
                    key_hash_u64(
                        kt["repo"].combine_chunks(), kt["path"].combine_chunks()
                    )
                )
            file_stats.append(fstat)
        return b, {
            "txn_id": txn_id,
            "hwm_lsn": int(hwm),
            "rows": int(rows),
            "files": sorted(file_stats, key=lambda f: f["name"]),
        }

    entries = [e for e in store.listdir(staging) if e.startswith("bucket=")]
    bucket_stats: dict[str, dict] = {}
    workers = min(getattr(store, "stat_concurrency", 1), max(len(entries), 1))
    if workers > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=workers) as ex:
            for b, st in ex.map(_bucket_stat, entries):
                bucket_stats[b] = st
    else:
        for entry in entries:
            b, st = _bucket_stat(entry)
            bucket_stats[b] = st

    # phase 2: atomic move staging -> data
    store.makedirs(os.path.dirname(final_dir))
    store.replace_dir(staging, final_dir)
    return bucket_stats


# ONE right-sized-block notion across the merge pipeline, in IN-MEMORY
# (uncompressed Arrow) bytes: checkpoint's delta coalesce divides
# Dataset.size_bytes() by it, and scan planning below compares the
# manifest's recorded uncompressed file bytes against it — a planned
# scan at or under 2x this reads as ceil(bytes / target) blocks (1-2)
# instead of Ray's CPU-derived fan. checkpoint imports this constant;
# do not redeclare the literal elsewhere.
TARGET_BLOCK_BYTES = 128 << 20
_SMALL_SCAN_BYTES = TARGET_BLOCK_BYTES


def _plan_scan(
    m: "Manifest", lake_dir: str, ranges: dict[str, tuple] | None
) -> tuple[list[str], dict[str, int]]:
    """Scan planning from manifest METADATA alone: enumerate the data files
    the current manifest references and, when ``ranges`` is given, prune
    whole buckets (by ``hwm_lsn``) and whole files (by the per-file
    column min/max recorded at commit) whose stats cannot overlap.  Zero
    storage round trips for pruned files — at object-store scale the
    footer opens ARE the scan-planning cost, and an incremental consumer
    tailing ``lsn > watermark`` should touch only the buckets written
    since.  Files/buckets without recorded stats are kept (conservative).

    Returns (files, accounting) where accounting counts total vs pruned.
    Reference analog: the manifest-driven folder selection in
    ReorderFiles.kt — the file set comes from metadata, not a LIST."""
    acct = {
        "buckets_total": 0,
        "buckets_pruned": 0,
        "files_total": 0,
        "files_pruned": 0,
        # total bytes of the SELECTED files, when every one has recorded
        # bytes (None otherwise — legacy manifests prevent sizing); lets
        # the reader pick a block count from metadata instead of Ray's
        # CPU-derived default (which fans an 87-row bucket to 64 blocks)
        "bytes_planned": 0,
    }

    def _overlaps(stats: dict, prefix: str, lo, hi) -> bool:
        smin, smax = stats.get(f"{prefix}_min"), stats.get(f"{prefix}_max")
        if smin is None or smax is None:
            return True  # no stats recorded — cannot prune
        if lo is not None and smax < lo:
            return False
        if hi is not None and smin > hi:
            return False
        return True

    files: list[str] = []
    for b, info in sorted(m.buckets.items(), key=lambda kv: int(kv[0])):
        acct["buckets_total"] += 1
        fstats = info.get("files")
        n_bucket_files = len(fstats) if fstats is not None else 0
        acct["files_total"] += n_bucket_files
        if ranges and "lsn" in ranges and info.get("hwm_lsn", -1) >= 0:
            lo, _hi = ranges["lsn"]
            if lo is not None and info["hwm_lsn"] < lo:
                acct["buckets_pruned"] += 1
                acct["files_pruned"] += n_bucket_files
                continue
        d = os.path.join(lake_dir, DATA_DIR, info["txn_id"], f"bucket={b}")
        if fstats is None:
            # legacy manifest without file stats: caller falls back to a
            # dir listing for this bucket (signalled by the sentinel)
            files.append(os.path.join(d, "*"))
            acct["bytes_planned"] = None
            continue
        for f in fstats:
            if ranges and not all(
                _overlaps(f, col, lo, hi) for col, (lo, hi) in ranges.items()
            ):
                acct["files_pruned"] += 1
                continue
            files.append(os.path.join(d, f["name"]))
            if acct["bytes_planned"] is not None:
                fb = f.get("bytes")
                acct["bytes_planned"] = (
                    None if fb is None else acct["bytes_planned"] + int(fb)
                )
    return files, acct


def _ranges_expression(ranges: dict[str, tuple]):
    """The exact row-level predicate matching a ``ranges`` spec, as a
    pyarrow.dataset expression (pushed down to row-group pruning inside
    the surviving files, then applied exactly per row)."""
    import pyarrow.dataset as pads

    expr = None
    for col, (lo, hi) in ranges.items():
        for bound, op in ((lo, "ge"), (hi, "le")):
            if bound is None:
                continue
            f = pads.field(col)
            e = (f >= bound) if op == "ge" else (f <= bound)
            expr = e if expr is None else (expr & e)
    return expr


def version_at_lsn(
    lake_dir: str,
    lsn: int,
    store: LakeStore | None = None,
    branch: str | None = None,
) -> int:
    """Resolve a LOG POSITION to a manifest version: the largest committed
    version whose maximum per-bucket watermark (delta chains included) is
    at or below ``lsn`` — i.e. the snapshot that had consumed the binlog
    exactly up to that point. Committed watermarks are monotone in the
    version chain (every apply only raises them), so this is a binary
    search over O(log V) manifest reads — metadata only, no data touched.
    Raises ValueError when even version 1 is past ``lsn``. The
    CDC-native time-travel coordinate: consumers think in offsets, not
    in the sink's commit counter."""
    store = store or _DEFAULT_STORE
    head = read_manifest(lake_dir, store=store, branch=branch)

    def hmax(v: int) -> int:
        m = read_manifest(lake_dir, store=store, version=v, branch=branch)
        hw = m.hwm()
        return max(hw.values()) if hw else -1

    # the chain may be TRIMMED by expire_snapshots: search only the
    # retained versions (one listdir; expired history raises explicitly
    # below, never resolves silently to a later snapshot)
    mdir = os.path.join(lake_dir, MANIFEST_DIR)
    retained = sorted(
        v
        for fn in store.listdir(mdir)
        for parsed in [_parse_manifest_name(fn)]
        if parsed is not None and parsed[0] == (branch or "main")
        for v in [parsed[1]]
        if v <= head.version
    )
    first = retained[0] if retained else 1
    if hmax(first) > lsn:
        raise ValueError(
            f"no retained version of {lake_dir} is at or below lsn {lsn}"
            + (" (older history expired)" if first > 1 else "")
        )
    lo, hi = first, head.version  # invariant: hmax(lo) <= lsn
    while lo < hi:
        mid = (lo + hi + 1) // 2
        if hmax(mid) <= lsn:
            lo = mid
        else:
            hi = mid - 1
    return lo


def read_lake(
    lake_dir: str,
    live_only: bool = True,
    store: LakeStore | None = None,
    version: int | None = None,
    columns: list[str] | None = None,
    filter=None,
    branch: str | None = None,
    ranges: dict[str, tuple] | None = None,
    buckets: "set[int] | None" = None,
    asof_lsn: int | None = None,
) -> "ray.data.Dataset":
    """Read the committed lake state (only files referenced by the current
    manifest — uncommitted/crashed txn files are invisible). Pass
    ``version`` to time-travel to a historical snapshot (see
    read_manifest for the retention caveat), or ``asof_lsn`` to time
    travel by LOG POSITION (resolved via ``version_at_lsn`` — a binary
    search over the manifest chain's monotone watermarks).

    ``columns`` prunes at the parquet read (only those columns leave
    storage — at 100 TB a consumer that needs (repo, lsn) must not ship
    content bytes); ``filter`` is a ``pyarrow.dataset`` expression pushed
    down to row-group pruning (the files are key-sorted within buckets,
    so key-range filters skip whole row groups via footer min/max).

    ``ranges`` is a first-class range predicate ``{column: (lo, hi)}``
    (inclusive; None = open bound) over the stats columns recorded in the
    manifest (``repo``/``path``/``lsn``): files whose manifest min/max
    cannot overlap are skipped WITHOUT any storage round trip (no footer
    open, no LIST), buckets whose ``hwm_lsn`` is below an ``lsn`` lower
    bound are skipped wholesale, and the same predicate is pushed down
    exactly over the surviving files.  This is the scan-side twin of
    read_key's manifest pruning — an incremental consumer reading
    ``ranges={"lsn": (watermark + 1, None)}`` plans its scan from the
    manifest alone.

    ``buckets`` restricts the read to an explicit set of bucket ids —
    metadata-only pruning (non-listed buckets never reach scan planning).
    This is the incremental-apply fast path: a micro-batch that touches K
    of B committed buckets merges against K buckets of prior state, not
    the whole lake (copy-on-write rewrites are per-bucket, so untouched
    buckets keep their manifest entries verbatim)."""
    import pyarrow.compute as pc
    import ray.data as rd

    store = store or _DEFAULT_STORE
    if asof_lsn is not None:
        # time travel by LOG POSITION instead of commit counter
        if version is not None:
            raise ValueError("pass version= or asof_lsn=, not both")
        version = version_at_lsn(lake_dir, asof_lsn, store=store, branch=branch)
    m = read_manifest(lake_dir, store=store, version=version, branch=branch)
    if buckets is not None:
        keep = {str(int(b)) for b in buckets}
        m = dataclasses.replace(
            m,
            buckets={k: v for k, v in m.buckets.items() if k in keep},
            deltas={k: v for k, v in m.deltas.items() if k in keep},
        )
    # predicate-delete files still active under THIS manifest (version
    # pinning gives each snapshot its own consistent delete set)
    active_deletes = []
    for e in m.deletes:
        ab = _active_delete_buckets(e, m.buckets)
        if ab:
            active_deletes.append((e, sorted(ab)))
    dirs = m.data_dirs(lake_dir)
    if not dirs:
        if m.version == 0:
            raise FileNotFoundError(f"no committed state in {lake_dir}")
        # a committed-but-EMPTY lake (e.g. a tail whose first micro-batch
        # carried no events still publishes its txn manifest) reads as an
        # empty dataset with the lake row schema — not an error
        import pyarrow as pa

        from .schemas import LAKE_SCHEMA

        fields = list(LAKE_SCHEMA) + [
            pa.field("op", pa.string()),
            # hive-partition column, selectable like on a non-empty lake;
            # Ray's hive inference yields STRING for partition values
            pa.field("bucket", pa.string()),
        ]
        sch = pa.schema(fields)
        if columns is None:
            sch = pa.schema([f for f in fields if f.name != "bucket"])
        else:
            missing = [c for c in columns if sch.get_field_index(c) == -1]
            if missing:
                # manifest.schema_fields would carry evolved columns; it is
                # not populated yet, so unknown selections fail loudly
                # instead of returning a silently narrower schema
                raise KeyError(
                    f"columns {missing} not in the base lake schema — the "
                    "empty-lake read path cannot reconstruct evolved columns"
                )
            sch = pa.schema([sch.field(c) for c in columns])
        return rd.from_arrow(sch.empty_table())
    # MERGE-ON-READ split: buckets carrying delta entries must be merged
    # LWW (base + deltas) before any row-level predicate can apply — a
    # predicate pushed into their file reads could drop the WINNING
    # version of a key and let a stale base row through. They are read
    # through the merge branch below; every other bucket takes the plain
    # pruned-scan path untouched. The merge cost is bounded by the
    # uncompacted delta-bucket volume — checkpoint.compact_deltas is the
    # fold that returns a bucket to the plain path.
    delta_ids = sorted((b for b, es in m.deltas.items() if es), key=int)
    m_plain = m
    if delta_ids:
        dset = set(delta_ids)
        m_plain = dataclasses.replace(
            m,
            buckets={b: v for b, v in m.buckets.items() if b not in dset},
            deltas={},
        )
    # ray.data.read_parquet expands a single dir but treats LIST entries as
    # files — enumerate the data files explicitly, from the MANIFEST's
    # per-file stats when recorded (zero LIST requests against storage; at
    # object-store scale the listing round trips are the scan-planning
    # cost), falling back to a dir listing for legacy manifests.  With
    # ``ranges``, _plan_scan additionally prunes buckets/files whose
    # manifest stats cannot overlap.
    planned, _scan_acct = _plan_scan(m_plain, lake_dir, ranges)
    files = []
    for p in planned:
        if p.endswith("*"):  # legacy bucket without file stats: LIST it
            d = os.path.dirname(p)
            files += [
                os.path.join(d, fn)
                for fn in store.listdir(d)
                if fn.endswith(".parquet")
            ]
        else:
            files.append(p)
    if ranges:
        expr = _ranges_expression(ranges)
        if expr is not None:
            filter = expr if filter is None else (filter & expr)
        if not files and not delta_ids:
            # every file pruned from metadata: empty result with the
            # selected schema, zero storage reads
            import pyarrow as pa

            from .schemas import LAKE_SCHEMA

            fields = list(LAKE_SCHEMA) + [pa.field("op", pa.string())]
            sch = pa.schema(fields)
            if columns is not None:
                sch = pa.schema([sch.field(c) for c in columns])
            return rd.from_arrow(sch.empty_table())
    read_cols = None
    if columns is not None:
        # the live filter needs 'op' even when the caller didn't ask for
        # it — read it, drop it again in strip(). Active predicate
        # deletes likewise need their predicate column plus the key
        # columns (bucket scoping recomputes the stable key hash when
        # hive inference doesn't surface the partition column).
        read_cols = list(columns)
        if live_only and "op" not in read_cols:
            read_cols.append("op")
        if active_deletes:
            need = {"repo", "path"} | {e["column"] for e, _ in active_deletes}
            if any("hwms" in e for e, _ in active_deletes):
                # lsn-scoped deletes (merge-on-read sequencing) compare
                # row lsn against the entry's per-bucket snapshot
                need.add("lsn")
            for extra in sorted(need):
                if extra not in read_cols:
                    read_cols.append(extra)
        if delta_ids:
            # the LWW merge of base + delta files needs the key columns
            # and the full (lsn, op, commit) ordering contract regardless
            # of selection; strip() re-narrows to the caller's columns
            for extra in ("repo", "path", "lsn", "op", "commit"):
                if extra not in read_cols:
                    read_cols.append(extra)
    read_kwargs = {}
    pb = _scan_acct.get("bytes_planned")
    if pb is not None and pb <= 2 * _SMALL_SCAN_BYTES:
        # SMALL scan proven from manifest metadata: cap the block fan.
        # Ray's default parallelism target is CPU-derived (~2x cores), so
        # a 1-file 87-row touched-bucket read fans to 64 near-empty
        # blocks and every downstream groupby/sort schedules that many
        # partitions — measured 2x slower sparse applies at 32 CPUs than
        # at 8. Large scans keep Ray's default splitting untouched.
        read_kwargs["override_num_blocks"] = max(1, -(-pb // _SMALL_SCAN_BYTES))
    parts = []
    if files:
        parts.append(
            rd.read_parquet(
                files,
                filesystem=store.fs,
                columns=read_cols,
                filter=filter,
                **read_kwargs,
            )
        )
    if delta_ids:
        from .merge import _group_winners

        mfiles: list[str] = []
        mbytes: int | None = 0
        for b in delta_ids:
            base = m.buckets.get(b)
            chain = ([base] if base is not None else []) + list(m.deltas[b])
            for entry in chain:
                d = os.path.join(
                    lake_dir, DATA_DIR, entry["txn_id"], f"bucket={b}"
                )
                fstats = entry.get("files")
                if fstats is None:  # legacy base without file stats
                    mfiles += [
                        os.path.join(d, fn)
                        for fn in store.listdir(d)
                        if fn.endswith(".parquet")
                    ]
                    mbytes = None
                else:
                    for f in fstats:
                        mfiles.append(os.path.join(d, f["name"]))
                        if mbytes is not None:
                            fb = f.get("bytes")
                            mbytes = None if fb is None else mbytes + int(fb)
        mkwargs = {}
        if mbytes is not None and mbytes <= 2 * _SMALL_SCAN_BYTES:
            mkwargs["override_num_blocks"] = max(1, -(-mbytes // _SMALL_SCAN_BYTES))
        # NO predicate pushdown here: every version of a key must reach
        # the LWW reduce before any row filter — the caller's predicate
        # (including the exact ranges expression already folded into
        # ``filter``) applies to the merged winners below.
        # the hive 'bucket' partition column only surfaces under an
        # explicit selection if asked for — the groupby below needs it
        mcols = None if read_cols is None else [*read_cols, "bucket"]
        merged = rd.read_parquet(
            mfiles, filesystem=store.fs, columns=mcols, **mkwargs
        )
        if read_cols is None:
            merged = merged.groupby("bucket").map_groups(
                lambda g: _group_winners(g, ["repo", "path"]),
                batch_format="pyarrow",
            )
        else:
            # align with the plain branch's schema for the union (an
            # explicit selection suppresses hive inference there); strip
            # recomputes the bucket from the key hash where it needs it
            merged = merged.groupby("bucket").map_groups(
                lambda g: _group_winners(g, ["repo", "path"]).drop_columns(
                    ["bucket"]
                ),
                batch_format="pyarrow",
            )
        if filter is not None:
            post_filter = filter

            def _apply_filter(t):
                import pyarrow.dataset as pads

                return pads.dataset(t).to_table(filter=post_filter)

            merged = merged.map_batches(_apply_filter, batch_format="pyarrow")
        parts.append(merged)
    if not parts:
        # every manifest entry is an explicit empty bucket (rows wiped by
        # a materialized predicate delete): empty result, zero reads
        import pyarrow as pa

        from .schemas import LAKE_SCHEMA

        fields = list(LAKE_SCHEMA) + [pa.field("op", pa.string())]
        sch = pa.schema(fields)
        if columns is not None:
            sch = pa.schema([sch.field(c) for c in columns])
        return rd.from_arrow(sch.empty_table())
    ds = parts[0] if len(parts) == 1 else parts[0].union(*parts[1:])
    num_buckets_hint = m.num_buckets or (
        max((int(b) for b in m.buckets), default=0) + 1
    )

    def strip(t):
        import pyarrow as pa

        if active_deletes:
            # scope each delete to the buckets it is still active for
            if "bucket" in t.column_names:
                bvals = pc.cast(t["bucket"], pa.string())
            else:

                hh = key_hash_u64(t["repo"], t["path"])
                bvals = pc.cast(
                    pa.array(bucket_ids_mixed(hh, num_buckets_hint, m.rescale)),
                    pa.string(),
                )
            drop = None
            for e, ab in active_deletes:
                d = pc.and_(
                    pc.is_in(bvals, value_set=pa.array(ab, type=pa.string())),
                    _delete_predicate_mask(t, e),
                )
                hwms = e.get("hwms") or {}
                if hwms and "lsn" in t.column_names:
                    # lsn-scoped delete (see delete_where): only rows at
                    # or below the entry's per-bucket snapshot die — a
                    # later merge-on-read upsert of a matching key
                    # survives. Active buckets without a recorded bound
                    # (legacy entries) keep the unscoped behavior.
                    import numpy as np

                    ib = pc.cast(bvals, pa.int64()).to_numpy(
                        zero_copy_only=False
                    )
                    size = int(ib.max()) + 1 if len(ib) else 1
                    bound = np.full(size, np.iinfo(np.int64).max)
                    for bb in ab:
                        w = hwms.get(str(bb))
                        if w is not None and int(bb) < size:
                            bound[int(bb)] = w
                    lsn = t["lsn"].to_numpy(zero_copy_only=False)
                    d = pc.and_(d, pa.array(lsn <= bound[ib]))
                drop = d if drop is None else pc.or_(drop, d)
            t = t.filter(pc.invert(drop))
        # hive-partition inference re-adds 'bucket' from the dir name;
        # drop it (merge stages recompute it from the stable key hash)
        if "bucket" in t.column_names and (columns is None or "bucket" not in columns):
            t = t.drop_columns(["bucket"])
        if live_only:
            t = t.filter(pc.not_equal(t["op"], "delete"))
        if columns is not None:
            t = t.select(columns)
        return t

    return ds.map_batches(strip, batch_format="pyarrow")


def read_key(
    lake_dir: str,
    repo: str,
    path: str,
    num_buckets: int | None = None,
    store: LakeStore | None = None,
    branch: str | None = None,
):
    """Point lookup: the LIVE row for one (repo, path), or None.

    Cost model at any scale: the stable key hash names ONE bucket, the
    manifest names that bucket's ONE owning txn directory, and the
    parquet read pushes the key predicate down so only row groups whose
    (repo, path) statistics can match are decoded — the data files are
    key-sorted within each bucket (the LWW reduce emits winners in key
    order), so this is O(files-in-one-bucket) footer reads + one row
    group. No Dataset, no scan. Reference analog: the S3 point lookup
    ``statObject`` (S3Utils.kt:27-33)."""
    import numpy as np
    import pyarrow as pa

    store = store or _DEFAULT_STORE
    m = read_manifest(lake_dir, store=store, branch=branch)
    if not m.buckets:
        return None
    if num_buckets is None:
        if m.num_buckets > 0:
            num_buckets = m.num_buckets  # recorded at commit — exact
        else:
            # legacy manifests: dense-keyspace heuristic (wrong whenever
            # the highest-index bucket holds no keys) — pass num_buckets
            # explicitly for lakes committed before it was recorded
            num_buckets = max(int(b) for b in m.buckets) + 1
    h = key_hash_u64(pa.array([repo]), pa.array([path]))
    # mid-rescale the key may already live at its new-modulus id (mixed
    # rule shared with every writer — see bucket_ids_mixed)
    bucket = int(bucket_ids_mixed(h, num_buckets, m.rescale)[0])
    info = m.buckets.get(str(bucket))
    dchain = m.deltas.get(str(bucket), [])
    if info is None and not dchain:
        return None
    # candidate files across the bucket's base AND its merge-on-read
    # delta chain — each entry carries the same per-file stats, so the
    # range + bloom pruning below applies uniformly; a key absent from
    # the whole chain still normally touches zero storage.
    hk = int(h[0])
    flt = [("repo", "==", repo), ("path", "==", path)]
    rows = []
    for entry in ([info] if info is not None else []) + list(dchain):
        bdir = os.path.join(
            lake_dir, DATA_DIR, entry["txn_id"], f"bucket={bucket}"
        )
        fstats = entry.get("files")
        if fstats is not None:
            # manifest-recorded per-file key ranges + key bloom: name the
            # candidate files and prune by column-wise (repo, path)
            # bounds, then by bloom membership, WITHOUT touching storage —
            # no dir listing, no footer opens for pruned files. The
            # bounds are COLUMN-WISE (conservative): a (repo, path) pair
            # can sit inside both ranges yet not exist in the file; the
            # bloom prunes exactly those (fpr ~1% at 10 bits/key).
            names = [
                f["name"]
                for f in fstats
                if ("repo_min" not in f or f["repo_min"] <= repo <= f["repo_max"])
                and ("path_min" not in f or f["path_min"] <= path <= f["path_max"])
                and _bloom_maybe_contains(f.get("key_bloom"), hk)
            ]
        else:  # legacy manifest without file stats: list the bucket dir
            if not store.isdir(bdir):
                continue
            names = [fn for fn in store.listdir(bdir) if fn.endswith(".parquet")]
        for fn in names:
            with store.fs.open_input_file(os.path.join(bdir, fn)) as f:
                t = pq.read_table(f, filters=flt)
            if t.num_rows:
                rows.append(t)
    if not rows:
        return None
    t = pa.concat_tables(rows, promote_options="permissive")
    # LWW among the bucket's (rare) multi-file survivors, tombstone-aware
    w = _winner_per_key(t, ["repo", "path"])
    if w.num_rows == 0 or w["op"][0].as_py() == "delete":
        return None
    out = {c: w[c][0].as_py() for c in w.column_names}
    # predicate-delete files (merge-on-read) hide the row from point
    # lookups exactly like from scans — same bucket-owner scoping plus
    # the lsn snapshot (a later MOR upsert of a matching key survives)
    for e in m.deletes:
        if (
            info is not None
            and e.get("owners", {}).get(str(bucket)) == info["txn_id"]
            and e["column"] in out
            and _delete_predicate_mask(w, e)[0].as_py()
        ):
            bound = (e.get("hwms") or {}).get(str(bucket))
            if bound is not None and out.get("lsn", 0) > bound:
                continue  # row upserted after the delete's snapshot
            return None
    return out


def vacuum(
    lake_dir: str,
    store: LakeStore | None = None,
    grace_s: float = 86400.0,
    reclaim: "set[str] | None" = None,
) -> list[str]:
    """Remove unreferenced txn dirs and leftover staging dirs.

    ``grace_s`` is the orphan-removal age threshold (Iceberg's
    remove_orphan_files ``older_than`` analog): an unreferenced dir
    younger than it — or whose age the store cannot report — is KEPT.
    A committing writer is unreferenced on purpose between its data
    move and its manifest publish, and a staging dir is unreferenced
    while its txn stages; vacuuming either mid-flight would let the
    writer publish a manifest pointing at deleted files. Reference
    analog: the swap-safety rule that originals which are also finals
    must not be deleted (RenameS3Utils.kt:124-127) — never reclaim
    what a concurrent commit may still be about to reference.
    ``grace_s=0`` restores unconditional reclaim (single-writer
    maintenance windows, tests).

    ``reclaim`` names txn ids KNOWN superseded by the caller (compact
    passes the txn list its commit just replaced): those skip the age
    gate — their manifest race is already decided — but never override
    the live set."""
    import time as _time

    store = store or _DEFAULT_STORE
    m = read_manifest(lake_dir, store=store)
    removed = []
    live = set(m.txns)
    for name in list_branches(lake_dir, store=store):
        if name != "main":
            live |= set(read_manifest(lake_dir, store=store, branch=name).txns)

    def _old_enough(path: str) -> bool:
        if grace_s <= 0:
            return True
        ts = store.newest_mtime(path)
        if ts is None:
            return False  # age unknown — keep (store without mtimes)
        return (_time.time() - ts) >= grace_s

    data_root = os.path.join(lake_dir, DATA_DIR)
    if store.isdir(data_root):
        for t in store.listdir(data_root):
            if t in live:
                continue
            if t in (reclaim or ()) or _old_enough(os.path.join(data_root, t)):
                store.rmtree(os.path.join(data_root, t))
                removed.append(f"data/{t}")
    stage_root = os.path.join(lake_dir, STAGING_DIR)
    if store.isdir(stage_root):
        for t in store.listdir(stage_root):
            if _old_enough(os.path.join(stage_root, t)):
                store.rmtree(os.path.join(stage_root, t))
                removed.append(f"_staging/{t}")
    return removed


def _consumer_file(name: str) -> str:
    import re

    if not re.fullmatch(r"[A-Za-z0-9._-]+", name):
        raise ValueError(
            f"consumer name {name!r} must match [A-Za-z0-9._-]+ "
            "(it becomes a manifest-dir filename)"
        )
    return f"CONSUMER-{name}"


def register_consumer(
    lake_dir: str, name: str, version: int, store: LakeStore | None = None
) -> int:
    """Record an incremental consumer's applied watermark: the highest
    source manifest version it has FULLY applied. ``expire_snapshots``
    refuses (without ``force``) to expire any manifest a registered
    consumer still needs — version ``W`` itself stays required, it is the
    ``m_old`` of the consumer's next step. Monotonic: a write below the
    recorded watermark is ignored (a stale writer can only be
    conservative, never un-protect the window). Returns the recorded
    watermark. Reference analog: the swap-safety discipline of
    RenameS3Utils.kt:124-127 — originals that are also someone's finals
    must not be deleted."""
    store = store or _DEFAULT_STORE
    mdir = os.path.join(lake_dir, MANIFEST_DIR)
    store.makedirs(mdir)
    path = os.path.join(mdir, _consumer_file(name))
    cur = -1
    if store.exists(path):
        cur = int(store.read_text(path).strip())
    if version <= cur:
        return cur
    tmp = path + f".tmp-{os.getpid()}"
    store.write_text(tmp, str(int(version)))
    store.replace_file(tmp, path)
    return int(version)


def list_consumers(lake_dir: str, store: LakeStore | None = None) -> dict[str, int]:
    """Registered consumer name -> applied source version."""
    store = store or _DEFAULT_STORE
    mdir = os.path.join(lake_dir, MANIFEST_DIR)
    out: dict[str, int] = {}
    if not store.isdir(mdir):
        return out
    for fn in store.listdir(mdir):
        if fn.startswith("CONSUMER-") and ".tmp-" not in fn:
            out[fn[len("CONSUMER-") :]] = int(
                store.read_text(os.path.join(mdir, fn)).strip()
            )
    return out


def deregister_consumer(
    lake_dir: str, name: str, store: LakeStore | None = None
) -> None:
    """Remove a consumer registration (its lag no longer pins retention)."""
    store = store or _DEFAULT_STORE
    path = os.path.join(lake_dir, MANIFEST_DIR, _consumer_file(name))
    if store.exists(path):
        store.delete_file(path)


_MANIFEST_FILE_RE = None  # compiled lazily (module import stays light)


def _parse_manifest_name(fn: str) -> tuple[str, int] | None:
    """'manifest-000003.json' -> ('main', 3);
    'manifest-dev-000002.json' -> ('dev', 2); else None."""
    global _MANIFEST_FILE_RE
    if _MANIFEST_FILE_RE is None:
        import re

        # branch names may themselves contain '-'; the greedy group takes
        # everything up to the final -NNNNNN
        _MANIFEST_FILE_RE = re.compile(r"^manifest-(?:(.+)-)?(\d{6})\.json$")
    m = _MANIFEST_FILE_RE.match(fn)
    if m is None:
        return None
    return (m.group(1) or "main", int(m.group(2)))


def expire_snapshots(
    lake_dir: str,
    keep_last: int = 1,
    store: LakeStore | None = None,
    force: bool = False,
) -> dict:
    """Iceberg-style snapshot retention: delete manifest versions older
    than the newest ``keep_last`` of each chain (main and every branch),
    then reclaim data-txn dirs that no RETAINED manifest's bucket entries
    reference.

    Contract:

    * Time travel to any retained version stays FULLY readable (the
      sweep keeps every txn dir some retained manifest still owns a
      bucket in) — unlike plain ``vacuum``, whose live set is only the
      branch heads and which therefore leaves older snapshots dangling
      after a compaction.
    * Reading an expired version raises (the manifest file is gone) —
      history disappears explicitly, never silently-corrupt.
    * Any manifest a branch pointer references is pinned regardless of
      age (a fresh branch can point at an old MAIN-chain version).
    * The exactly-once ledger is untouched: committed txn IDs live in
      the CURRENT manifest's ``txns`` list, so a re-delivered old txn is
      still a no-op after its data was expired.
    * Claimed-but-unpointed next versions (a crashed publish) are above
      every head, hence never expired, and their data stays live.
    * Registered incremental consumers (``register_consumer`` — e.g. a
      replica updated by ``replicate(consumer=...)``) pin the chain back
      to their applied watermark: expiring a version a lagged consumer
      still needs raises instead of silently breaking its next catch-up
      run. Pass ``force=True`` to expire anyway (explicitly breaking the
      replica, which must then re-seed).

    This is the storage-reclaim path for a long-running incremental tail
    that does NOT want a full compaction rewrite: applies accumulate one
    txn dir per touched bucket forever; expiry drops the dirs whose
    buckets every retained snapshot has since rewritten. Returns
    ``{"manifests_removed": [...], "data_removed": [...]}``.
    Reference analog: the retention half of DeleteAllS3ObjectsByPrefix —
    bulk-delete superseded objects while the live manifest stays intact
    (S3Utils.kt:75-90)."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    store = store or _DEFAULT_STORE
    mdir = os.path.join(lake_dir, MANIFEST_DIR)
    out: dict = {"manifests_removed": [], "data_removed": []}
    if not store.isdir(mdir):
        return out

    entries = store.listdir(mdir)
    pinned: set[str] = set()  # manifest filenames a pointer references
    heads: dict[str, int] = {}  # chain -> head version (own-chain only)
    for fn in entries:
        if fn == "CURRENT":
            raw = store.read_text(os.path.join(mdir, fn)).strip()
            name = (
                os.path.basename(_manifest_path(lake_dir, int(raw)))
                if raw.isdigit()
                else raw
            )
            pinned.add(name)
            parsed = _parse_manifest_name(name)
            if parsed is not None:
                heads[parsed[0]] = parsed[1]
        elif fn.startswith("BRANCH-") and ".tmp-" not in fn:
            raw = store.read_text(os.path.join(mdir, fn)).strip()
            pinned.add(raw)
            parsed = _parse_manifest_name(raw)
            # pin only; a branch pointing into the MAIN chain pins that
            # file but does not define main's head
            if parsed is not None and parsed[0] != "main":
                heads[parsed[0]] = parsed[1]

    # replication-lag retention contract: versions <= head - keep_last
    # are about to go; a consumer at applied watermark W still reads
    # manifest W (the m_old of its next step) and everything above it
    if not force:
        main_head = heads.get("main")
        if main_head is not None:
            for cname, w in sorted(list_consumers(lake_dir, store=store).items()):
                if main_head - keep_last >= w:
                    raise ValueError(
                        f"expire_snapshots(keep_last={keep_last}) would drop "
                        f"manifest version {w}, which registered consumer "
                        f"{cname!r} (applied watermark {w}, head {main_head}) "
                        "still needs for its next incremental step — raise "
                        "keep_last, let the consumer catch up, deregister it, "
                        "or pass force=True to break it explicitly"
                    )

    for fn in entries:
        parsed = _parse_manifest_name(fn)
        if parsed is None or fn in pinned:
            continue
        chain, ver = parsed
        head = heads.get(chain)
        if head is None:
            continue  # orphan chain (no pointer) — leave for inspection
        if ver <= head - keep_last:
            store.delete_file(os.path.join(mdir, fn))
            out["manifests_removed"].append(fn)

    # sweep: a txn dir is live iff some REMAINING manifest's bucket map
    # still owns a bucket in it (ownership, not the txns ledger — the
    # ledger records idempotency history, not file references). Applies
    # are copy-on-write PER BUCKET, so a still-live txn dir can hold
    # bucket=k subdirs that every retained manifest has since rewritten
    # in a newer txn — the second sweep reclaims those at bucket
    # granularity (pure deletion, no data rewrite: the bounded-work
    # storage-reclaim a long-running tail needs between full compactions).
    owned: set[tuple[str, str]] = set()  # (txn_id, bucket) pairs retained
    for fn in store.listdir(mdir):
        if _parse_manifest_name(fn) is None:
            continue
        d = json.loads(store.read_text(os.path.join(mdir, fn)))
        owned |= {(info["txn_id"], b) for b, info in d.get("buckets", {}).items()}
        # merge-on-read delta entries reference their txn dirs exactly
        # like bucket owners do — a retained snapshot needs its whole
        # base + delta chain readable
        owned |= {
            (e["txn_id"], b)
            for b, es in d.get("deltas", {}).items()
            for e in es
        }
    live = {t for t, _ in owned}
    data_root = os.path.join(lake_dir, DATA_DIR)
    if store.isdir(data_root):
        for t in store.listdir(data_root):
            if t not in live:
                store.rmtree(os.path.join(data_root, t))
                out["data_removed"].append(f"data/{t}")
                continue
            for entry in store.listdir(os.path.join(data_root, t)):
                if not entry.startswith("bucket="):
                    continue
                if (t, entry.split("=", 1)[1]) not in owned:
                    store.rmtree(os.path.join(data_root, t, entry))
                    out["data_removed"].append(f"data/{t}/{entry}")
    return out
