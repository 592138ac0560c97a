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


def _file_stats(path: Path) -> dict[str, list] | None:
    """Per-column [min, max] from the parquet footer (row-group statistics
    aggregated) — the manifest-side scan-pruning index, Iceberg-style. One
    footer read per NEW file at commit time (never the old files); columns
    without stats (nested, all-null) are simply absent. Returns None when
    the footer is unreadable."""
    try:
        import pyarrow.parquet as pq

        md = pq.ParquetFile(str(path)).metadata
    except Exception:
        return None
    mins: dict[str, object] = {}
    maxs: dict[str, object] = {}
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            col = g.column(ci)
            st = col.statistics
            if st is None or not st.has_min_max:
                continue
            name = col.path_in_schema
            if "." in name:  # nested leaves: skip (not prunable columns here)
                continue
            lo, hi = st.min, st.max
            if isinstance(lo, bytes) or isinstance(hi, bytes):
                continue  # undecoded physical bytes: not comparable portably
            mins[name] = lo if name not in mins else min(mins[name], lo)
            maxs[name] = hi if name not in maxs else max(maxs[name], hi)
    out = {k: [_json_safe(mins[k]), _json_safe(maxs[k])] for k in mins}
    # "#" is not a legal character in the column paths recorded above, so
    # this key can never collide with a real column's [min, max] entry
    out["#rows"] = [md.num_rows, md.num_rows]
    return out


def _json_safe(v):
    import datetime
    import decimal

    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, (datetime.date, datetime.datetime)):
        return v.isoformat()
    return v


def _merge_schemas(old: StructType, new: StructType) -> StructType:
    """Additive (Delta ``mergeSchema``-style) evolution: the union keeps every
    old column in place and appends new-only columns in the writer's order.
    A column present in both must have the identical type — silent widening
    would corrupt old-file reads. Old files read under the evolved schema get
    NULL for appended columns (parquet by-name resolution); narrower writers
    are likewise legal, their files read back with NULLs."""
    by_name = {f.name: f for f in old.fields}
    for f in new.fields:
        if f.name in by_name:
            if by_name[f.name].dataType != f.dataType:
                raise ValueError(
                    f"schema evolution cannot change column {f.name!r}: "
                    f"{by_name[f.name].dataType} -> {f.dataType}"
                )
        else:
            by_name[f.name] = f
    return StructType(
        [by_name[f.name] for f in old.fields]
        + [f for f in new.fields if f.name not in {g.name for g in old.fields}]
    )


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
        merge_schema: bool = False,
    ) -> int:
        """Commit ``df`` as a new version; returns the committed version.

        ``mode``: 'append' adds to the current snapshot, 'overwrite' replaces
        it. ``(txn_app, txn_batch)`` makes the commit idempotent: if a commit
        with the same pair already exists the write is skipped (returns the
        current version) — the exactly-once contract for streaming replays.
        ``merge_schema``: additive schema evolution for appends — new columns
        are appended to the table schema (old files read back NULL for them);
        existing columns must keep their exact type, and a writer missing
        columns is legal (its files read back NULL there too). Without the
        flag any schema drift is a hard error, the safe default.
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
        new_stats = {
            f: s for f in new_files if (s := _file_stats(self.root / f)) is not None
        }
        schema_key = _schema_key(df.schema)

        for _ in range(self.MAX_RETRIES):
            cur = self.current_version()
            schema_json = df.schema.json()
            commit_key = schema_key
            if mode == "append" and cur is not None:
                prev = self._manifest(cur)
                if prev["schema_key"] != schema_key:
                    if not merge_schema:
                        raise ValueError(
                            f"append schema mismatch: table has {prev['schema_key']}, "
                            f"write has {schema_key} (pass merge_schema=True to evolve)"
                        )
                    evolved = _merge_schemas(
                        StructType.fromJson(json.loads(prev["schema"])), df.schema
                    )
                    schema_json = evolved.json()
                    commit_key = _schema_key(evolved)
                files = prev["files"] + new_files
                stats = {**prev.get("stats", {}), **new_stats}
            else:
                files = list(new_files)
                stats = dict(new_stats)
            target = (cur or 0) + 1
            # idempotence re-check under the new version (a concurrent writer
            # may have just committed our batch id)
            if txn_app is not None and (txn_app, txn_batch) in self._committed_batches():
                return self.current_version()
            manifest = {
                "version": target,
                "mode": mode,
                "files": files,
                "stats": stats,
                "schema": schema_json,
                "schema_key": commit_key,
                "txn": txn,
                "txn_app": txn_app,
                "txn_batch": txn_batch,
                "ts": time.time(),
            }
            if self._try_commit(manifest, target, txn):
                return target
        raise CommitConflict(f"could not commit after {self.MAX_RETRIES} attempts")

    def _try_commit(self, manifest: dict, target: int, txn: str) -> bool:
        """One CAS attempt: link a temp manifest to the target version name.
        False = another writer claimed the version first."""
        tmp = self.commits_dir / f".tmp-{txn}-{target}.json"
        tmp.write_text(json.dumps(manifest))
        try:
            os.link(tmp, self.commits_dir / f"{target}.json")  # atomic CAS
            return True
        except FileExistsError:
            return False
        finally:
            tmp.unlink(missing_ok=True)

    def merge(
        self,
        spark: SparkSession,
        source: DataFrame,
        key_cols: list[str],
        when_matched: str = "update",
        when_not_matched: str = "insert",
    ) -> int:
        """Delta-style MERGE INTO (copy-on-write upsert); returns the new
        version.

        * ``when_matched``: 'update' replaces the whole target row with the
          source row; 'delete' removes matched target rows.
        * ``when_not_matched``: 'insert' adds source rows with no target
          match; 'ignore' drops them.

        Scale shape: only files that actually CONTAIN a matching key are
        rewritten — a left-semi join of the snapshot (tagged with
        ``input_file_name``) against the distinct source keys yields the
        touched-file list (bounded collect: file names, never rows), the
        manifest stats prune files whose [min,max] on the first key can't
        intersect the source's key range before that scan, and every
        untouched file is carried into the new manifest by reference. A
        merge touching 0.1% of a 100 TB table rewrites ~0.1% of it.

        Concurrency: serializable-and-honest — the commit CAS targets
        base_version + 1; if any writer commits in between, CommitConflict
        is raised rather than silently merging over a moved snapshot
        (Delta's conflict-resolution matrix is a compatible extension).
        Duplicate keys in ``source`` are rejected (ambiguous upsert)."""
        from pyspark.sql import functions as F

        if when_matched not in ("update", "delete"):
            raise ValueError(f"when_matched must be update|delete, got {when_matched!r}")
        if when_not_matched not in ("insert", "ignore"):
            raise ValueError(f"when_not_matched must be insert|ignore, got {when_not_matched!r}")
        cur = self.current_version()
        if cur is None:
            if when_not_matched == "insert":
                return self.write(source, mode="append")
            raise FileNotFoundError(f"no commits at {self.root}")
        man = self._manifest(cur)
        needs_full_schema = when_matched == "update" or when_not_matched == "insert"
        if needs_full_schema and man["schema_key"] != _schema_key(source.schema):
            # a delete+ignore merge may pass a keys-only source; anything
            # that writes source rows must match the table schema
            raise ValueError(
                f"merge schema mismatch: table has {man['schema_key']}, "
                f"source has {_schema_key(source.schema)}"
            )

        dup = source.groupBy(*key_cols).count().filter("count > 1").limit(1).collect()
        if dup:
            raise ValueError(f"duplicate source keys in merge: {dup[0].asDict()}")
        skeys = source.select(*key_cols).distinct()

        # stats-prune candidate files on the first key column, then find the
        # files that truly contain a matching key
        k0 = key_cols[0]
        bounds = source.agg(F.min(k0).alias("lo"), F.max(k0).alias("hi")).collect()[0]
        cand = self.files_for(cur, prune={k0: (bounds["lo"], bounds["hi"])})
        schema = StructType.fromJson(json.loads(man["schema"]))
        touched_rel: list[str] = []
        if cand:
            tagged = (
                spark.read.schema(schema)
                .parquet(*[str(self.root / f) for f in cand])
                .withColumn("__file", F.input_file_name())
            )
            touched_uris = {
                r["__file"]
                for r in tagged.join(F.broadcast(skeys), key_cols, "left_semi")
                .select("__file")
                .distinct()
                .collect()
            }
            touched_rel = [
                f for f in cand if any(u.endswith(str(Path(f))) for u in touched_uris)
            ]
        kept = [f for f in man["files"] if f not in set(touched_rel)]

        # matching keys can only live in the touched files, so the
        # matched/insert splits join against THOSE keys — never a second
        # full-table scan
        parts = []
        if touched_rel:
            base = spark.read.schema(schema).parquet(
                *[str(self.root / f) for f in touched_rel]
            )
            tkeys = base.select(*key_cols).distinct()
            parts.append(base.join(F.broadcast(skeys), key_cols, "left_anti"))
            if when_matched == "update":
                parts.append(source.join(tkeys, key_cols, "left_semi"))
            if when_not_matched == "insert":
                parts.append(source.join(tkeys, key_cols, "left_anti"))
        elif when_not_matched == "insert":
            parts.append(source)

        txn = uuid.uuid4().hex
        new_files: list[str] = []
        new_stats: dict = {}
        if parts:
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
            out = out.select(*[f.name for f in schema.fields])
            txn_dir = self.data_dir / f"txn-{txn}"
            out.write.mode("errorifexists").parquet(str(txn_dir))
            new_files = sorted(
                str(p.relative_to(self.root)) for p in txn_dir.glob("*.parquet")
            )
            new_stats = {
                f: s for f in new_files if (s := _file_stats(self.root / f)) is not None
            }
        old_stats = man.get("stats", {})
        manifest = {
            "version": cur + 1,
            "mode": "merge",
            "files": kept + new_files,
            "stats": {**{f: old_stats[f] for f in kept if f in old_stats}, **new_stats},
            "schema": man["schema"],
            "schema_key": man["schema_key"],
            "txn": txn,
            "txn_app": None,
            "txn_batch": None,
            "ts": time.time(),
        }
        if not self._try_commit(manifest, cur + 1, txn):
            raise CommitConflict(
                f"concurrent commit moved {self.root} past version {cur} during merge"
            )
        return cur + 1

    def delete_where(self, spark: SparkSession, predicate) -> int:
        """Predicate DELETE (copy-on-write); returns the new version.

        ``predicate`` is a Column or SQL string selecting the rows to
        REMOVE. Kept rows are those where the predicate is false OR null
        (standard DELETE WHERE semantics — an unknown predicate does not
        delete).

        Scale shape mirrors :meth:`merge`: one snapshot scan tagged with
        ``input_file_name`` finds the files that actually contain a matching
        row (bounded collect of file names, never rows); only those files
        are rewritten with the matching rows filtered out, every untouched
        file is carried into the new manifest by reference, and the commit
        CAS targets base_version + 1 (CommitConflict on any interleaved
        writer). A delete hitting 0.1% of a 100 TB table rewrites ~0.1%.
        """
        from pyspark.sql import Column
        from pyspark.sql import functions as F

        pred = F.expr(predicate) if isinstance(predicate, str) else predicate
        if not isinstance(pred, Column):
            raise TypeError(f"predicate must be a Column or SQL string, got {type(predicate)}")
        cur = self.current_version()
        if cur is None:
            raise FileNotFoundError(f"no commits at {self.root}")
        man = self._manifest(cur)
        schema = StructType.fromJson(json.loads(man["schema"]))
        files = list(man["files"])
        touched_rel: list[str] = []
        if files:
            tagged = (
                spark.read.schema(schema)
                .parquet(*[str(self.root / f) for f in files])
                .withColumn("__file", F.input_file_name())
            )
            hit_uris = {
                r["__file"]
                for r in tagged.filter(pred).select("__file").distinct().collect()
            }
            touched_rel = [f for f in files if any(u.endswith(str(Path(f))) for u in hit_uris)]
        kept = [f for f in files if f not in set(touched_rel)]

        txn = uuid.uuid4().hex
        new_files: list[str] = []
        new_stats: dict = {}
        if touched_rel:
            base = spark.read.schema(schema).parquet(
                *[str(self.root / f) for f in touched_rel]
            )
            survivors = base.filter(~F.coalesce(pred, F.lit(False))).select(
                *[f.name for f in schema.fields]
            )
            txn_dir = self.data_dir / f"txn-{txn}"
            survivors.write.mode("errorifexists").parquet(str(txn_dir))
            new_files = sorted(
                str(p.relative_to(self.root)) for p in txn_dir.glob("*.parquet")
            )
            new_stats = {
                f: s for f in new_files if (s := _file_stats(self.root / f)) is not None
            }
        old_stats = man.get("stats", {})
        manifest = {
            "version": cur + 1,
            "mode": "delete",
            "files": kept + new_files,
            "stats": {**{f: old_stats[f] for f in kept if f in old_stats}, **new_stats},
            "schema": man["schema"],
            "schema_key": man["schema_key"],
            "txn": txn,
            "txn_app": None,
            "txn_batch": None,
            "ts": time.time(),
        }
        if not self._try_commit(manifest, cur + 1, txn):
            raise CommitConflict(
                f"concurrent commit moved {self.root} past version {cur} during delete"
            )
        return cur + 1

    def compact(
        self,
        spark: SparkSession,
        num_files: int = 1,
        sort_by: list[str] | None = None,
    ) -> int:
        """Rewrite the current snapshot into ``num_files`` files (the
        small-files OPTIMIZE: thousands of streaming micro-batch files become
        a handful of scan-friendly ones), optionally range-clustered on
        ``sort_by`` — clustered files have disjoint key ranges, so the
        manifest stats turn point/range reads into single-file opens.

        Logically a no-op: the new version holds identical rows. Concurrency:
        the commit requires the head to still be the version that was read
        (compacting over a concurrent append would silently drop it) —
        a lost race raises CommitConflict and the caller just re-runs;
        orphaned rewrite files are vacuum()-able.
        """
        base = self.current_version()
        if base is None:
            raise FileNotFoundError(f"no commits at {self.root}")
        df = self.read(spark, version=base)
        if sort_by:
            df = df.repartitionByRange(num_files, *sort_by).sortWithinPartitions(*sort_by)
        else:
            df = df.coalesce(num_files)
        txn = uuid.uuid4().hex
        txn_dir = self.data_dir / f"txn-{txn}"
        df.write.mode("errorifexists").parquet(str(txn_dir))
        new_files = sorted(str(p.relative_to(self.root)) for p in txn_dir.glob("*.parquet"))
        prev = self._manifest(base)
        manifest = {
            "version": base + 1,
            "mode": "compact",
            "files": new_files,
            "stats": {
                f: s for f in new_files if (s := _file_stats(self.root / f)) is not None
            },
            "schema": prev["schema"],
            "schema_key": prev["schema_key"],
            "txn": txn,
            "txn_app": None,
            "txn_batch": None,
            "ts": time.time(),
        }
        if not self._try_commit(manifest, base + 1, txn):
            raise CommitConflict(
                f"concurrent commit during compact of v{base}; re-run compact"
            )
        return base + 1

    def foreach_batch(self, mode: str = "append", app_id: str = "stream"):
        """Streaming sink: ``writeStream.foreachBatch(table.foreach_batch())``.
        Exactly-once across checkpoint restarts — the (app_id, batch_id) pair
        rides the manifest, so a replayed micro-batch commits nothing."""

        def _sink(batch_df: DataFrame, batch_id: int) -> None:
            self.write(batch_df, mode=mode, txn_app=app_id, txn_batch=int(batch_id))

        return _sink

    # -- read path -----------------------------------------------------------

    def files_for(
        self,
        version: int | None = None,
        prune: dict[str, tuple] | None = None,
    ) -> list[str]:
        """The snapshot's file list, optionally pruned by manifest stats:
        ``prune`` maps column -> (lo, hi) (either bound None = unbounded);
        a file is skipped iff its recorded [min, max] cannot intersect the
        requested range. Files without stats are always kept — pruning is
        sound (never drops a matching row), the caller still applies the
        real filter."""
        if version is None:
            version = self.current_version()
        if version is None:
            raise FileNotFoundError(f"no commits at {self.root}")
        m = self._manifest(version)
        if not prune:
            return list(m["files"])
        stats = m.get("stats", {})
        keep = []
        for f in m["files"]:
            s = stats.get(f)
            skip = False
            if s:
                for col, (lo, hi) in prune.items():
                    cs = s.get(col)
                    if cs is None:
                        continue
                    f_lo, f_hi = cs
                    if (hi is not None and f_lo is not None and f_lo > hi) or (
                        lo is not None and f_hi is not None and f_hi < lo
                    ):
                        skip = True
                        break
            if not skip:
                keep.append(f)
        return keep

    def row_count(self, version: int | None = None) -> int | None:
        """COUNT(*) from manifest metadata alone — zero data files opened,
        the same trick Delta/Iceberg use to answer bare counts on 100 TB
        tables instantly. Returns None when any committed file predates
        row-count recording (caller falls back to a scan); never guesses."""
        if version is None:
            version = self.current_version()
        if version is None:
            raise FileNotFoundError(f"no commits at {self.root}")
        m = self._manifest(version)
        stats = m.get("stats", {})
        total = 0
        for f in m["files"]:
            n = stats.get(f, {}).get("#rows")
            if n is None:
                return None
            total += int(n[0])
        return total

    def read(
        self,
        spark: SparkSession,
        version: int | None = None,
        prune: dict[str, tuple] | None = None,
    ) -> DataFrame:
        """Open a snapshot (default: latest). Reads exactly the committed
        file list — no directory listing, torn writes invisible. ``prune``
        applies manifest-stats file skipping (see files_for); the returned
        frame still contains every row of the surviving files, so apply the
        actual predicate on top."""
        if version is None:
            version = self.current_version()
        if version is None:
            raise FileNotFoundError(f"no commits at {self.root}")
        m = self._manifest(version)
        schema = StructType.fromJson(json.loads(m["schema"]))
        files = self.files_for(version, prune)
        if not files:
            return spark.createDataFrame([], schema)
        return spark.read.schema(schema).parquet(*[str(self.root / f) for f in files])

    def files_added(self, since_version: int, until_version: int | None = None) -> list[str]:
        """Files present in ``until_version`` (default latest) but not in
        ``since_version`` — the appended increment. Raises on any OVERWRITE
        or compaction commit inside the range: after a rewrite, "new files"
        no longer means "new rows", and silently returning them would feed
        duplicates to an incremental consumer."""
        if until_version is None:
            until_version = self.current_version()
        if until_version is None:
            raise FileNotFoundError(f"no commits at {self.root}")
        if since_version > until_version:
            raise ValueError(f"since {since_version} > until {until_version}")
        for v in range(since_version + 1, until_version + 1):
            mode = self._manifest(v).get("mode")
            if mode != "append":
                raise ValueError(
                    f"version {v} is a {mode!r} commit — incremental file diff is "
                    "only row-accurate across pure appends; re-read the snapshot"
                )
        base = set(self._manifest(since_version)["files"]) if since_version > 0 else set()
        cur = self._manifest(until_version)["files"]
        return [f for f in cur if f not in base]

    def read_changes(
        self,
        spark: SparkSession,
        since_version: int,
        until_version: int | None = None,
    ) -> DataFrame:
        """Incremental read: exactly the rows appended after
        ``since_version`` up to ``until_version`` (default latest) — the CDC
        primitive a downstream incremental job consumes instead of
        re-scanning the snapshot (at lake scale the snapshot is TBs, the
        increment is one micro-batch). Append-only ranges only; an
        overwrite/compact inside the range raises (see files_added). Since
        appends never rewrite files, file-diff == row-diff."""
        if until_version is None:
            until_version = self.current_version()
        if until_version is None:
            raise FileNotFoundError(f"no commits at {self.root}")
        m = self._manifest(until_version)
        schema = StructType.fromJson(json.loads(m["schema"]))
        files = self.files_added(since_version, until_version)
        if not files:
            return spark.createDataFrame([], schema)
        return spark.read.schema(schema).parquet(*[str(self.root / f) for f in files])

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


def train_or_load_table(spark, path: str, build):
    """Generic build-once/read-many artifact: reuse the TxTable at ``path``
    if it has a committed snapshot, else call ``build()`` (returning a
    DataFrame), commit it, and read it back. The shared shape behind
    ops.dedup.train_or_load_components and
    ops.text.train_or_load_langid_model; use it for any expensive
    deterministic intermediate a pipeline consumes more than once.

    Concurrency: two racers that both see an empty table both PAY the
    build (the compute is not coordinated), but the fixed
    ``(txn_app, txn_batch)`` pair makes the commit idempotent — the CAS
    loser's write is skipped inside the retry loop and it reads the
    winner's snapshot, so exactly ONE version ever lands (no duplicate
    history, safe because builds are deterministic)."""
    from apollo_spark.ops.cache import release_caches

    t = TxTable(path)
    if t.current_version() is None:
        built = build()
        t.write(built, mode="overwrite", txn_app="train_or_load", txn_batch=0)
        # the write is the builder frame's terminal action: release any
        # persist scope the builder op attached so it cannot leak into
        # session storage (the read-back below is a fresh parquet scan)
        release_caches(built)
    return t.read(spark)
