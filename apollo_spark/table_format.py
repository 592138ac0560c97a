"""Manifest-committed parquet tables: a minimal Delta/Iceberg-flavored
transactional layer over plain parquet (the round-2 "table formats" open
item, built from first principles — no Delta/Iceberg dependency exists in
this environment).

Why a manifest layer at 100 TB:
* **Atomic visibility** — a Spark parquet write is a directory of part
  files that appear one by one; a reader listing the directory mid-write
  sees a torn table. Here data lands under an invisible ``data/txn-<uuid>/``
  prefix and becomes visible only when a single manifest file commits — one
  atomic filesystem op, readers see all-or-nothing.
* **No directory listing on read** — the manifest enumerates exact file
  paths. On object stores (S3-style) LIST is slow, rate-limited, and
  eventually consistent; manifest reads are one GET + N direct opens.
* **Time travel / auditable history** — every commit is an immutable
  numbered manifest; ``read(version=K)`` reproduces any past snapshot
  (the property training-data pipelines need to pin exactly which corpus
  snapshot a model saw).
* **Exactly-once streaming** — commits record (app_id, batch_id); a
  replayed foreachBatch after a checkpoint restart is recognized and
  skipped, so the sink is idempotent without overwrite tricks.

Commit protocol (optimistic, lock-free):
  1. write part files under ``data/txn-<uuid>/`` (invisible),
  2. read the current max version N,
  3. write the new manifest to a temp name, then ``os.link`` it to
     ``_commits/<N+1>.json`` — link fails atomically if another writer
     claimed N+1 first, in which case re-read N and retry (the data files
     need no rewrite). This is the same compare-and-swap shape Delta uses
     on its log (conditional put / rename-no-overwrite); on a real object
     store, swap os.link for a conditional PUT.

Reference parity note: apollo's sinks (db/db.go:79-111) append rows to
Postgres with an overwrite-once lifecycle; this module is the lake-native
analog of that lifecycle with snapshot isolation added.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


class CommitConflict(RuntimeError):
    """Another writer claimed the target version (after retries)."""


def _schema_key(schema: StructType) -> list[list[str]]:
    """Order-sensitive (name, type) pairs — nullability deliberately ignored
    (it flips freely across writers and engines)."""
    return [[f.name, f.dataType.simpleString()] for f in schema.fields]


class TxTable:
    """A transactional parquet table rooted at ``path``.

    ``write(df, mode)`` commits a new version; ``read(spark, version=...)``
    opens any snapshot; ``history()`` lists commits newest-first.
    """

    MAX_RETRIES = 20

    def __init__(self, path: str):
        self.root = Path(path)
        self.data_dir = self.root / "data"
        self.commits_dir = self.root / "_commits"
        self.data_dir.mkdir(parents=True, exist_ok=True)
        self.commits_dir.mkdir(parents=True, exist_ok=True)

    # -- manifest bookkeeping ------------------------------------------------

    def _versions(self) -> list[int]:
        return sorted(
            int(p.stem) for p in self.commits_dir.glob("*.json") if p.stem.isdigit()
        )

    def current_version(self) -> int | None:
        vs = self._versions()
        return vs[-1] if vs else None

    def _manifest(self, version: int) -> dict:
        return json.loads((self.commits_dir / f"{version}.json").read_text())

    def history(self) -> list[dict]:
        """Commit metadata newest-first (without the file lists)."""
        out = []
        for v in reversed(self._versions()):
            m = self._manifest(v)
            out.append(
                {
                    "version": m["version"],
                    "mode": m["mode"],
                    "n_files": len(m["files"]),
                    "ts": m["ts"],
                    "txn_app": m.get("txn_app"),
                    "txn_batch": m.get("txn_batch"),
                }
            )
        return out

    def _committed_batches(self) -> set[tuple[str, int]]:
        return {
            (m["txn_app"], m["txn_batch"])
            for v in self._versions()
            if (m := self._manifest(v)).get("txn_app") is not None
        }

    # -- write path ----------------------------------------------------------

    def write(
        self,
        df: DataFrame,
        mode: str = "append",
        txn_app: str | None = None,
        txn_batch: int | None = None,
    ) -> int:
        """Commit ``df`` as a new version; returns the committed version.

        ``mode``: 'append' adds to the current snapshot, 'overwrite' replaces
        it. ``(txn_app, txn_batch)`` makes the commit idempotent: if a commit
        with the same pair already exists the write is skipped (returns the
        current version) — the exactly-once contract for streaming replays.
        """
        if mode not in ("append", "overwrite"):
            raise ValueError(f"mode must be append|overwrite, got {mode!r}")
        if (txn_app is None) != (txn_batch is None):
            raise ValueError("txn_app and txn_batch must be given together")
        if txn_app is not None and (txn_app, txn_batch) in self._committed_batches():
            return self.current_version()  # replayed batch: already visible

        txn = uuid.uuid4().hex
        txn_dir = self.data_dir / f"txn-{txn}"
        df.write.mode("errorifexists").parquet(str(txn_dir))
        new_files = sorted(
            str(p.relative_to(self.root)) for p in txn_dir.glob("*.parquet")
        )
        schema_key = _schema_key(df.schema)

        for _ in range(self.MAX_RETRIES):
            cur = self.current_version()
            if mode == "append" and cur is not None:
                prev = self._manifest(cur)
                if prev["schema_key"] != schema_key:
                    raise ValueError(
                        f"append schema mismatch: table has {prev['schema_key']}, "
                        f"write has {schema_key}"
                    )
                files = prev["files"] + new_files
            else:
                files = list(new_files)
            target = (cur or 0) + 1
            # idempotence re-check under the new version (a concurrent writer
            # may have just committed our batch id)
            if txn_app is not None and (txn_app, txn_batch) in self._committed_batches():
                return self.current_version()
            manifest = {
                "version": target,
                "mode": mode,
                "files": files,
                "schema": df.schema.json(),
                "schema_key": schema_key,
                "txn": txn,
                "txn_app": txn_app,
                "txn_batch": txn_batch,
                "ts": time.time(),
            }
            tmp = self.commits_dir / f".tmp-{txn}-{target}.json"
            tmp.write_text(json.dumps(manifest))
            try:
                os.link(tmp, self.commits_dir / f"{target}.json")  # atomic CAS
                return target
            except FileExistsError:
                continue  # lost the race: re-read the head and retry
            finally:
                tmp.unlink(missing_ok=True)
        raise CommitConflict(f"could not commit after {self.MAX_RETRIES} attempts")

    def foreach_batch(self, mode: str = "append", app_id: str = "stream"):
        """Streaming sink: ``writeStream.foreachBatch(table.foreach_batch())``.
        Exactly-once across checkpoint restarts — the (app_id, batch_id) pair
        rides the manifest, so a replayed micro-batch commits nothing."""

        def _sink(batch_df: DataFrame, batch_id: int) -> None:
            self.write(batch_df, mode=mode, txn_app=app_id, txn_batch=int(batch_id))

        return _sink

    # -- read path -----------------------------------------------------------

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        """Open a snapshot (default: latest). Reads exactly the committed
        file list — no directory listing, torn writes invisible."""
        if version is None:
            version = self.current_version()
        if version is None:
            raise FileNotFoundError(f"no commits at {self.root}")
        m = self._manifest(version)
        schema = StructType.fromJson(json.loads(m["schema"]))
        if not m["files"]:
            return spark.createDataFrame([], schema)
        return spark.read.schema(schema).parquet(
            *[str(self.root / f) for f in m["files"]]
        )

    # -- maintenance ---------------------------------------------------------

    def vacuum(self, retain_last: int = 1) -> list[str]:
        """Delete data files referenced by NO retained manifest (the last
        ``retain_last`` versions are retained; older manifests are dropped,
        ending time travel past them). Returns deleted file paths."""
        if retain_last < 1:
            raise ValueError("retain_last must be >= 1")
        vs = self._versions()
        keep_vs = vs[-retain_last:]
        live: set[str] = set()
        for v in keep_vs:
            live.update(self._manifest(v)["files"])
        deleted = []
        for p in self.data_dir.glob("txn-*/*.parquet"):
            rel = str(p.relative_to(self.root))
            if rel not in live:
                p.unlink()
                deleted.append(rel)
        for v in vs[:-retain_last]:
            (self.commits_dir / f"{v}.json").unlink()
        # drop now-empty txn dirs (best-effort)
        for d in self.data_dir.glob("txn-*"):
            if not any(d.glob("*.parquet")):
                for leftover in d.iterdir():
                    leftover.unlink()
                d.rmdir()
        return sorted(deleted)
