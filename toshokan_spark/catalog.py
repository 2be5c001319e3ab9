"""Filesystem manifest catalog.

Replaces the reference's PostgreSQL catalog
(`/root/reference/migrations/0001_base.up.sql:1-21`: tables
``indexes(name, config)`` and ``index_files(id, index_name,
file_name, len, footer_len)``) with a JSON manifest on the same
storage the data lives on — the Delta-log pattern, minus the
dependency. Works identically on a local fs or an object store
mounted path.

Guarantees preserved from the reference:

* **commit order**: segment data is fully written *before* the
  manifest references it (`src/commands/mod.rs:147-187`) — a crash
  leaves an orphan directory, never a dangling manifest entry;
* **atomic manifest updates**: write-temp + ``os.replace`` (the
  reference gets this from Postgres transactions); single writer per
  index, as in the reference CLI model;
* **search reads only manifested segments** — and unlike the
  reference, filtered by index name (the reference opens every file of
  every index, `src/commands/mod.rs:107` has no WHERE clause; SURVEY
  §3.1 flags it as a latent bug — we fix it and regression-test it).

At 100 TB the manifest stays tiny (one JSON line per segment, i.e.
per committed write batch), and listing is O(manifest), never a
recursive object-store LIST.
"""

from __future__ import annotations

import json
import os
import secrets
import shutil
import time
from dataclasses import asdict, dataclass
from typing import Optional

from toshokan_spark.config import IndexConfig


def uuid7() -> str:
    """Time-ordered UUIDv7 (RFC 9562) — segment ids sort by creation
    time, like the reference's uuid7 batch ids
    (`src/commands/index.rs:96`)."""
    ms = int(time.time() * 1000)
    rand_a = secrets.randbits(12)
    rand_b = secrets.randbits(62)
    b = ms.to_bytes(6, "big") + (
        (0x7 << 12 | rand_a).to_bytes(2, "big")
    ) + ((0b10 << 62 | rand_b).to_bytes(8, "big"))
    h = b.hex()
    return f"{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:]}"


@dataclass
class SegmentEntry:
    """One committed write batch (≈ one reference 'unified index file',
    `migrations/0001_base.up.sql:10-16`)."""

    id: str
    file_name: str  # segment directory name under the index path
    num_rows: int
    created_at_ms: int
    #: stream micro-batch id that produced this segment (None for
    #: batch ingestion). Replaying a checkpointed batch after a crash
    #: finds its id already manifested and skips the commit — upgrading
    #: the reference's at-least-once offset contract
    #: (`kafka_source.rs:380-394`: duplicates possible on crash between
    #: upload and checkpoint save) to exactly-once segments.
    batch_id: Optional[str] = None


class CatalogError(RuntimeError):
    pass


class FsCatalog:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(os.path.join(root, "indexes"), exist_ok=True)
        os.makedirs(os.path.join(root, "manifests"), exist_ok=True)

    # -- paths ---------------------------------------------------------
    def _config_path(self, name: str) -> str:
        return os.path.join(self.root, "indexes", f"{name}.json")

    def _manifest_path(self, name: str) -> str:
        return os.path.join(self.root, "manifests", f"{name}.json")

    @staticmethod
    def _atomic_write(path: str, payload: str) -> None:
        tmp = f"{path}.tmp.{secrets.token_hex(4)}"
        with open(tmp, "w", encoding="utf-8") as f:
            f.write(payload)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)

    # -- index lifecycle (`src/commands/create.rs`, `drop.rs`) ---------
    def create_index(self, config: IndexConfig) -> None:
        p = self._config_path(config.name)
        if os.path.exists(p):
            raise CatalogError(f"index {config.name!r} already exists")
        self._atomic_write(p, json.dumps(config.to_dict(), indent=2))
        self._atomic_write(self._manifest_path(config.name), json.dumps({"segments": []}))

    def get_index(self, name: str) -> IndexConfig:
        p = self._config_path(name)
        if not os.path.exists(p):
            raise CatalogError(f"no such index {name!r}")
        with open(p, encoding="utf-8") as f:
            return IndexConfig.from_dict(json.load(f))

    def index_exists(self, name: str) -> bool:
        return os.path.exists(self._config_path(name))

    def list_indexes(self) -> list[str]:
        d = os.path.join(self.root, "indexes")
        return sorted(f[:-5] for f in os.listdir(d) if f.endswith(".json"))

    def drop_index(self, name: str) -> None:
        """Delete catalog rows, then best-effort data deletion — leaked
        files are tolerated and never re-read, exactly the reference's
        stance (`src/commands/drop.rs:11-48`)."""
        config = self.get_index(name)
        os.remove(self._config_path(name))
        mp = self._manifest_path(name)
        if os.path.exists(mp):
            os.remove(mp)
        data_dir = _strip_file_scheme(config.path)
        if data_dir and os.path.isdir(data_dir):
            shutil.rmtree(data_dir, ignore_errors=True)

    # -- segment manifest ----------------------------------------------
    def segments(self, name: str) -> list[SegmentEntry]:
        mp = self._manifest_path(name)
        if not os.path.exists(mp):
            return []
        with open(mp, encoding="utf-8") as f:
            doc = json.load(f)
        return [SegmentEntry(**s) for s in doc.get("segments", [])]

    def _write_segments(self, name: str, segs: list[SegmentEntry]) -> None:
        self._atomic_write(
            self._manifest_path(name),
            json.dumps({"segments": [asdict(s) for s in segs]}, indent=1),
        )

    def commit_segment(self, name: str, entry: SegmentEntry) -> bool:
        """Append one segment (data must already be on storage —
        data-first, manifest-second, `src/commands/mod.rs:178-187`).
        Returns False (no-op) when the entry's ``batch_id`` is already
        manifested — the idempotence that makes a replayed stream
        micro-batch exactly-once."""
        segs = self.segments(name)
        if entry.batch_id is not None and any(
            s.batch_id == entry.batch_id for s in segs
        ):
            return False
        segs.append(entry)
        self._write_segments(name, segs)
        return True

    def has_batch(self, name: str, batch_id: str) -> bool:
        return any(s.batch_id == batch_id for s in self.segments(name))

    def swap_segments(
        self, name: str, remove_ids: list[str], add: Optional[SegmentEntry]
    ) -> None:
        """Atomic replace used by merge/compaction: new segment in, old
        segments out, one manifest write (the reference does this in
        one Postgres transaction, `src/commands/merge.rs:63-66`)."""
        segs = [s for s in self.segments(name) if s.id not in set(remove_ids)]
        if add is not None:
            segs.append(add)
        self._write_segments(name, segs)

    def segment_paths(self, name: str) -> list[str]:
        config = self.get_index(name)
        base = _strip_file_scheme(config.path)
        return [os.path.join(base, s.file_name) for s in self.segments(name)]


def _strip_file_scheme(path: str) -> str:
    return path[len("file://"):] if path.startswith("file://") else path
