"""Checkpoint / snapshot storage — SURVEY.md §7.4 (S3, S5, S6, T2).

An Iceberg-shaped table layout on plain parquet: every committed batch is
a set of immutable snapshot directories plus ONE atomic manifest-pointer
swap (`os.replace`), giving all-or-nothing commits and time travel on a
filesystem with atomic rename — the sandbox has no Iceberg runtime jar
(SURVEY.md §0.3); on a real cluster the same call sites swap to
``df.writeTo(...)`` Iceberg commits behind ``storage="iceberg"``.

Layout::

    ckpt/
      manifest.json                 # atomic pointer: current batch + table→snapshot
      manifests/manifest-<b>.json   # history (time travel / lineage)
      frontier/snap-<b>/*.parquet   # base snapshot (written at compaction)
      frontier/delta-<b>/*.parquet  # changed rows only; manifest key
                                    # "frontier_deltas" lists committed deltas
      url_seen/snap-<b>/*.parquet   # bloom shards (base)
      url_seen/delta-<b>/*.parquet  # touched shards only ("url_seen_deltas")
      results/batch=<b>/*.parquet   # append-only, manifest lists valid batches
      counters/batch=<b>/*.parquet
      seen_keys/batch=<b>/*.parquet # append-only (O(new keys)/batch); the
                                    # manifest key "seen_batches" lists the
                                    # committed appends readers may union

Resume = read manifest, bind scans to pinned snapshots; snapshot dirs not
referenced by any manifest are uncommitted garbage and ignored
("runs resume exactly" — BASELINE.json:6,14).
"""

from __future__ import annotations

import json
import os
import shutil
from pathlib import Path

SNAPSHOT_TABLES = ("frontier", "url_seen")
# seen_keys is append-only: rewriting the full URL-seen key set every
# batch is O(history) per batch — fatal at 10^10 keys.  Readers union
# the committed per-batch append dirs (manifest key "seen_batches").
APPEND_TABLES = ("results", "counters", "seen_keys")


class Checkpoint:
    def __init__(self, root: str | Path):
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)
        (self.root / "manifests").mkdir(exist_ok=True)

    @property
    def manifest_path(self) -> Path:
        return self.root / "manifest.json"

    def manifest(self) -> dict | None:
        if not self.manifest_path.exists():
            return None
        return json.loads(self.manifest_path.read_text())

    def current_batch(self) -> int:
        m = self.manifest()
        return -1 if m is None else m["batch_id"]

    # --- paths ---------------------------------------------------------
    def snapshot_dir(self, table: str, batch_id: int) -> str:
        return str(self.root / table / f"snap-{batch_id}")

    def append_dir(self, table: str, batch_id: int) -> str:
        return str(self.root / table / f"batch={batch_id}")

    def delta_dir(self, table: str, batch_id: int) -> str:
        """Per-batch delta of a snapshot table (incremental commits: the
        batch writes only changed rows/shards; readers merge base +
        deltas latest-wins; compaction folds deltas back into a new base
        snapshot).  Like snapshots, a delta dir is garbage unless the
        manifest's ``<table>_deltas`` list references it."""
        return str(self.root / table / f"delta-{batch_id}")

    def table_path(self, table: str) -> str:
        """Path of ``table`` pinned at the current manifest."""
        m = self.manifest()
        if m is None:
            raise FileNotFoundError(f"no manifest committed yet in {self.root}")
        return str(self.root / m["tables"][table])

    def append_paths(self, table: str) -> list[str]:
        """All committed append dirs for results/counters (for reads)."""
        m = self.manifest()
        if m is None:
            return []
        return [str(self.root / table / f"batch={b}") for b in m["batches"]]

    # --- commit --------------------------------------------------------
    def commit(self, batch_id: int, snapshot_tables: dict[str, int],
               extra: dict | None = None, append_batch: bool = True) -> dict:
        """Atomically publish batch ``batch_id``.

        ``snapshot_tables`` maps table name → the batch id of its current
        snapshot (tables untouched this batch keep their old snapshot id).
        All parquet under the new snapshot/append dirs must already be
        fully written — this is the Iceberg-style "data first, pointer
        last" protocol.
        """
        prev = self.manifest()
        m = {
            "batch_id": batch_id,
            "tables": {t: f"{t}/snap-{b}" for t, b in snapshot_tables.items()},
            "batches": ([] if prev is None else list(prev["batches"]))
            + ([batch_id] if append_batch else []),
            "parent": None if prev is None else prev["batch_id"],
            **(extra or {}),
        }
        hist = self.root / "manifests" / f"manifest-{batch_id}.json"
        hist.write_text(json.dumps(m, indent=1))
        tmp = self.root / "manifest.json.tmp"
        tmp.write_text(json.dumps(m, indent=1))
        os.replace(tmp, self.manifest_path)  # the atomic pointer swap
        return m

    def manifest_at(self, batch_id: int) -> dict:
        """Time travel: the manifest as of a committed batch."""
        p = self.root / "manifests" / f"manifest-{batch_id}.json"
        return json.loads(p.read_text())

    def manifest_history(self) -> list[int]:
        """Committed manifest batch ids, ascending (time-travel points)."""
        return sorted(
            int(p.stem.split("-", 1)[1])
            for p in (self.root / "manifests").glob("manifest-*.json")
        )

    # --- maintenance ---------------------------------------------------
    def expire_snapshots(self, keep_last: int = 2) -> dict:
        """Iceberg-parity snapshot expiry (``expireSnapshots`` semantics):
        retain the newest ``keep_last`` committed manifests as time-travel
        / resume points, then delete (a) older manifest files and (b) any
        snapshot/delta directory of the SNAPSHOT_TABLES that no retained
        manifest references.  Without this a long crawl accumulates every
        superseded base snapshot forever — at 10^10-frontier scale each
        base is ~1 TB, so unbounded history is an operational failure, not
        just clutter (VERDICT r4 item 2).

        Safety rules (why expiry can run between batches of a live drain):

        - the CURRENT manifest is always retained, so every path a
          resume — or the next batch's merge-on-read view — can bind to
          survives (base snapshot + every delta in ``<table>_deltas``);
        - directories with ``batch id >= current`` are never touched: an
          in-flight batch writes its data dirs BEFORE its manifest commit
          ("data first, pointer last"), and those ids are > current;
        - append tables (results / counters / seen_keys) are never
          expired: they are the crawl's output and its dedup history —
          every manifest's ``batches``/``seen_batches`` lists are
          cumulative, so all committed appends stay referenced.

        Returns ``{"removed_dirs": [...], "removed_manifests": [...],
        "freed_bytes": int}``; a no-op when history ≤ keep_last."""
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        cur = self.manifest()
        if cur is None:
            return {"removed_dirs": [], "removed_manifests": [], "freed_bytes": 0}
        hist = [b for b in self.manifest_history() if b <= cur["batch_id"]]
        retained = set(hist[-keep_last:]) | {cur["batch_id"]}
        keep_paths: set[str] = set()
        for b in retained:
            m = self.manifest_at(b)
            keep_paths.update(m["tables"].values())
            for t in SNAPSHOT_TABLES:
                for db in m.get(f"{t}_deltas", []):
                    keep_paths.add(f"{t}/delta-{db}")
        removed_dirs: list[str] = []
        freed = 0
        for t in SNAPSHOT_TABLES:
            tdir = self.root / t
            if not tdir.exists():
                continue
            for d in sorted(tdir.iterdir()):
                kind, _, bid_s = d.name.partition("-")
                if not d.is_dir() or kind not in ("snap", "delta") or not bid_s.isdigit():
                    continue
                rel = f"{t}/{d.name}"
                if rel in keep_paths or int(bid_s) >= cur["batch_id"]:
                    continue
                freed += sum(f.stat().st_size for f in d.rglob("*") if f.is_file())
                shutil.rmtree(d)
                removed_dirs.append(rel)
        removed_manifests = [b for b in hist if b not in retained]
        for b in removed_manifests:
            (self.root / "manifests" / f"manifest-{b}.json").unlink()
        return {"removed_dirs": removed_dirs,
                "removed_manifests": removed_manifests, "freed_bytes": freed}
