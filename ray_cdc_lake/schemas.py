"""Arrow schemas and constants for the CDC engine.

Reference analog: the FlowFile attribute map + change-batch JSON of
nifi-tekst-bundle (``ReorderFiles.kt:359-366``, ``RenameInstruction.kt:3-6``)
re-expressed as fixed Arrow schemas (SURVEY.md §1.2).
"""

from __future__ import annotations

import pyarrow as pa

# The source table per BASELINE.json input_hint.
SOURCE_SCHEMA = pa.schema(
    [
        pa.field("repo", pa.string()),
        pa.field("path", pa.string()),
        pa.field("commit", pa.string()),
        pa.field("lang", pa.string()),
        pa.field("content", pa.large_string()),
        # event time, informational (FIXTURES.md §2): deterministic
        # 2024-01-01 + lsn microseconds so the oracle can derive it too
        pa.field("ts", pa.timestamp("us")),
    ]
)

# The change-event log (binlog). ``new_path`` only for op='rename'
# (reference analog: RenameInstruction(originalName, newName),
# RenameInstruction.kt:3-6).
EVENT_SCHEMA = pa.schema(
    [
        pa.field("lsn", pa.int64()),
        pa.field("op", pa.string()),  # insert | update | delete | rename
        pa.field("repo", pa.string()),
        pa.field("path", pa.string()),
        pa.field("new_path", pa.string()),
        pa.field("commit", pa.string()),
        pa.field("lang", pa.string()),
        pa.field("content", pa.large_string()),
        # event time, informational (FIXTURES.md §2): deterministic
        # 2024-01-01 + lsn microseconds so the oracle derives it too
        pa.field("ts", pa.timestamp("us")),
    ]
)

# Compiled changes: renames exploded into delete+insert at the same LSN
# (reference analog: swap/cycle-safe two-phase rename,
# RenameS3Utils.kt:62-66,120-127 — applied as a set, not sequentially).
COMPILED_SCHEMA = pa.schema(
    [
        pa.field("lsn", pa.int64()),
        pa.field("op", pa.string()),  # insert | update | delete
        pa.field("repo", pa.string()),
        pa.field("path", pa.string()),
        pa.field("commit", pa.string()),
        pa.field("lang", pa.string()),
        pa.field("content", pa.large_string()),
    ]
)

# A lake row: final upserted state plus lineage columns. ``content_sha256``
# is the per-row invariant the judge checks (reference analog: MD5 checksums
# carried in METS file entries, CreateMetsBrowsing.kt:314-324).
LAKE_SCHEMA = pa.schema(
    [
        pa.field("repo", pa.string()),
        pa.field("path", pa.string()),
        pa.field("commit", pa.string()),
        pa.field("lang", pa.string()),
        pa.field("content", pa.large_string()),
        pa.field("content_sha256", pa.string()),
        pa.field("lsn", pa.int64()),
    ]
)

OPS = ("insert", "update", "delete", "rename")

# Default number of hash buckets for the merge shuffle. Sized so that at
# 100 TB / 256 nodes each bucket is a few GB; at test scale it just means
# a handful of small groups. One partitioning key, reused across stages.
DEFAULT_NUM_BUCKETS = 64

# Epoch count for the deterministic correctness-scale event derivation
# (see events.py); bench overrides with a larger value.
DEFAULT_EPOCHS = 4
