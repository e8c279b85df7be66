"""IceTable: a minimal Iceberg-semantics table format over plain parquet.

The north-rule contract is "checkpoint manifests written to Iceberg" with
lineage and time travel; this sandbox ships no Iceberg runtime, so this
module implements the load-bearing subset of the spec's semantics from
scratch (no copied code — the layout mirrors the PUBLIC Iceberg spec's
concepts: snapshot log, manifest file lists, stats-based scan pruning):

Layout::

    table/
      data/<commit-uuid>-<n>.parquet        immutable data files
      metadata/snap-<seq 10 digits>.json    snapshot: parent, operation,
                                            FULL file list + per-file
                                            per-column min/max/null stats
      metadata/version-hint.text            current sequence (atomic rename)

Semantics carried over from Iceberg:

- **Atomic commits, snapshot isolation**: data files land first; the
  snapshot JSON is written with EXCLUSIVE CREATE (``open(..., "x")``) so two
  concurrent committers racing for the same sequence number conflict
  explicitly, and the loser retries on top of the winner (optimistic
  concurrency, like Iceberg's metadata-pointer CAS). Readers resolve the
  current snapshot via version-hint but fall back to the highest committed
  snap file, so a torn hint is harmless. Uncommitted data files are
  invisible (never listed in any snapshot).
- **Time travel**: ``read(spark, snapshot_id=...)`` reconstructs any
  historical file list; ``history()`` is the lineage (snapshot → parent).
- **Incremental reads**: ``read_incremental(s1, s2)`` = files added by
  snapshots in (s1, s2] — the streaming-backfill pattern.
- **Scan pruning**: every commit records per-file column min/max/null-count
  harvested from the parquet FOOTERS (pyarrow row-group statistics — real
  stats, not recomputed by a second scan); ``scan`` drops files whose
  stats exclude a predicate before Spark ever opens them. At 100 TB this is
  the difference between listing 10^6 files and reading 10^2.
- **Schema pinning**: the first commit records the schema DDL; later commits
  must match or explicitly evolve via ``allow_schema_change=True`` (adding
  columns only) — resuming a job with a drifted schema fails loudly.
- **Rollback**: ``rollback(snapshot_id)`` commits a NEW snapshot whose file
  list is the old one (history is append-only, like Iceberg — no snapshot
  is ever destroyed).
- **Row-level ops (copy-on-write)**: ``delete_where`` and ``merge_upsert``
  rewrite ONLY the files whose manifest stats may contain affected rows;
  all other files carry over by reference — file-granular CoW, the Iceberg
  ``DELETE FROM`` / ``MERGE INTO`` shape.
- **Maintenance**: ``expire_snapshots(keep_last=k)`` deletes expired
  snapshots and the data files only they reference (storage reclamation
  after overwrite/delete/compaction churn).

jobs/resumable.py keeps its wave-level manifest (per-bucket throughput
metrics feed); IceTable is the table-level commit/lineage layer underneath
the same two-step protocol. scripts/curate_job.py composes both.

Scale note (honest boundary): per-file metadata harvest — parquet footer
stats and Bloom sidecar construction — runs on the COMMITTING DRIVER here,
one small column read per new file (the same shape as the footer harvest).
That is the correct cost model for commit-sized batches (a commit touches
its own new files only, never the table), but a production writer at
10^12-turn scale would fold both into the executor write tasks (as
Iceberg's writers do) so commit latency stays flat in file count. The
READ-side contract (manifest pruning above the engine, lazy sidecar loads)
is unchanged either way.
"""

from __future__ import annotations

import base64
import hashlib
import json
import math
import os
import shutil
import time
import uuid

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_STATS_KINDS = ("long", "int", "short", "byte", "double", "float", "string",
                "date", "timestamp")


def _file_stats(path: str) -> tuple[int, dict[str, dict]]:
    """Row count + per-column {min,max,nulls} from the parquet footer
    (merged across row groups). Columns without footer stats (nested types,
    binary) simply get no entry → never pruned on."""
    meta = pq.ParquetFile(path).metadata
    stats: dict[str, dict] = {}
    for rg in range(meta.num_row_groups):
        g = meta.row_group(rg)
        for ci in range(g.num_columns):
            col = g.column(ci)
            s = col.statistics
            name = col.path_in_schema
            if "." in name or s is None or not s.has_min_max:
                continue
            mn, mx = s.min, s.max
            if isinstance(mn, bytes):
                try:
                    mn, mx = mn.decode("utf-8"), mx.decode("utf-8")
                except UnicodeDecodeError:
                    continue
            elif hasattr(mn, "isoformat"):
                # datetime/date → ISO strings: JSON-safe, and lexicographic
                # order equals chronological order so pruning comparisons
                # hold (predicate literals must be same-format strings)
                mn, mx = mn.isoformat(), mx.isoformat()
            cur = stats.get(name)
            if cur is None:
                stats[name] = {"min": mn, "max": mx,
                               "nulls": int(s.null_count or 0)}
            else:
                cur["min"] = min(cur["min"], mn)
                cur["max"] = max(cur["max"], mx)
                cur["nulls"] += int(s.null_count or 0)
    return meta.num_rows, stats


class CommitConflict(RuntimeError):
    """Another writer committed the same sequence first (and retries ran out)."""


# ---------------------------------------------------------------------------
# Per-file Bloom filters (the Iceberg Puffin-sidecar analogue). min/max stats
# prune range predicates but are USELESS for point lookups on
# high-cardinality unordered keys (uuid-ish conv_ids: every file's [min,max]
# spans the whole keyspace). A per-file Bloom answers "could key k be in this
# file?" with no false negatives — at 10^12 turns it is the difference
# between reading one file and reading the table for `conv_id = X`.
# Stored as sidecar files under metadata/puffin/ (like Iceberg's Puffin
# blobs), NOT inline in the snapshot JSON: manifests stay small, sidecars
# load lazily and only for the predicate column.
# ---------------------------------------------------------------------------

_BLOOM_FPP = 0.01


def _bloom_hashes(value: str, m: int, k: int) -> list[int]:
    """k bit indexes via double hashing over the two md5 halves —
    deterministic across processes (no PYTHONHASHSEED dependence)."""
    d = hashlib.md5(value.encode("utf-8")).digest()
    h1 = int.from_bytes(d[:8], "little")
    h2 = int.from_bytes(d[8:], "little") | 1  # odd: full-period stride
    return [(h1 + i * h2) % m for i in range(k)]


def _build_bloom(values: list[str]) -> dict:
    n = max(len(values), 1)
    m = max(64, int(math.ceil(-n * math.log(_BLOOM_FPP) / (math.log(2) ** 2))))
    k = max(1, round(m / n * math.log(2)))
    bits = bytearray((m + 7) // 8)
    for v in values:
        for idx in _bloom_hashes(v, m, k):
            bits[idx >> 3] |= 1 << (idx & 7)
    return {"m": m, "k": k, "fpp": _BLOOM_FPP, "n_values": len(values),
            "bits": base64.b64encode(bytes(bits)).decode("ascii")}


def _bloom_may_contain(bloom: dict, value: str) -> bool:
    bits = bloom["bits"]
    if isinstance(bits, str):  # raw sidecar json (not via _load_bloom)
        bits = base64.b64decode(bits)
    return all(
        bits[idx >> 3] & (1 << (idx & 7))
        for idx in _bloom_hashes(value, bloom["m"], bloom["k"])
    )


class IceTable:
    def __init__(self, path: str) -> None:
        self.path = path
        self.data_dir = os.path.join(path, "data")
        self.meta_dir = os.path.join(path, "metadata")

    # -- snapshot resolution --------------------------------------------

    def _snap_path(self, seq: int) -> str:
        return os.path.join(self.meta_dir, f"snap-{seq:010d}.json")

    def _committed_seqs(self) -> list[int]:
        if not os.path.isdir(self.meta_dir):
            return []
        return sorted(
            int(fn[5:15]) for fn in os.listdir(self.meta_dir)
            if fn.startswith("snap-") and fn.endswith(".json")
        )

    def current_seq(self) -> int:
        """0 = empty table. Version-hint is advisory; the snap files are the
        source of truth (a torn/stale hint self-heals)."""
        seqs = self._committed_seqs()
        return seqs[-1] if seqs else 0

    def snapshot(self, seq: int | None = None) -> dict:
        seq = self.current_seq() if seq is None else seq
        if seq == 0:
            return {"sequence": 0, "parent": None, "operation": "create",
                    "files": [], "schema": None, "snapshot_id": None}
        with open(self._snap_path(seq)) as f:
            return json.load(f)

    def history(self) -> list[dict]:
        """Lineage, oldest first: [{sequence, snapshot_id, parent, operation,
        added_files, total_files, total_rows, ts_ms}]."""
        out = []
        for seq in self._committed_seqs():
            s = self.snapshot(seq)
            out.append({
                "sequence": s["sequence"], "snapshot_id": s["snapshot_id"],
                "parent": s["parent"], "operation": s["operation"],
                "added_files": len(s.get("added", [])),
                "total_files": len(s["files"]),
                "total_rows": sum(f["rows"] for f in s["files"]),
                "ts_ms": s.get("ts_ms"),
            })
        return out

    # -- commits ---------------------------------------------------------

    def _write_data_files(self, df: DataFrame,
                          partition_by: str | None = None,
                          sort_by: list[str] | None = None,
                          sort_files: int | None = None,
                          bloom_cols: list[str] | None = None) -> list[dict]:
        """Stage df as immutable parquet files under data/ (commit-uuid
        prefix — never visible until a snapshot lists them), harvest footer
        stats per file. With ``partition_by``, files land in Hive-style
        ``col=value`` subdirs (Iceberg identity partitioning) and each
        manifest entry records its partition value for exact-match pruning;
        readers re-derive the column from the path (basePath discovery).

        ``sort_by`` range-clusters the write (Spark's global sort = range
        partition + local sort, the Iceberg write-order analogue): each file
        covers a narrow, near-disjoint [min,max] on the sort keys, which is
        what makes footer-stats pruning actually bite on those columns.
        ``bloom_cols`` writes a per-file Bloom sidecar (metadata/puffin/)
        per listed column for point-lookup pruning on keys where min/max
        can't help."""
        os.makedirs(self.data_dir, exist_ok=True)
        commit = uuid.uuid4().hex[:12]
        staging = os.path.join(self.path, f"_staging-{commit}")
        if sort_by:
            # global sort = range partition + local sort; an explicit
            # ``sort_files`` pins the range-partition count (AQE otherwise
            # coalesces small writes into one file, defeating per-file
            # range disjointness)
            df = (
                df.repartitionByRange(sort_files, *sort_by)
                .sortWithinPartitions(*sort_by)
                if sort_files
                else df.sort(*sort_by)
            )
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(partition_by)
        writer.parquet(staging)
        entries = []
        n = 0
        if partition_by:
            # layout: data/<col>=<value>/<commit>-<n>.parquet — the kv dir
            # sits DIRECTLY under basePath (Spark's partition discovery
            # rejects mixed-depth structures), the commit id lives in the
            # file name; files stay immutable across commits
            for pdir in sorted(os.listdir(staging)):
                if not pdir.startswith(f"{partition_by}="):
                    continue
                value = pdir.split("=", 1)[1]
                os.makedirs(os.path.join(self.data_dir, pdir), exist_ok=True)
                for fn in sorted(os.listdir(os.path.join(staging, pdir))):
                    if not fn.endswith(".parquet"):
                        continue
                    rel = f"{pdir}/{commit}-{n:05d}.parquet"
                    os.rename(os.path.join(staging, pdir, fn),
                              os.path.join(self.data_dir, rel))
                    rows, stats = _file_stats(os.path.join(self.data_dir, rel))
                    entry = {"path": rel, "rows": rows, "stats": stats,
                             "partition": {partition_by: value}}
                    if bloom_cols:
                        entry["bloom"] = self._write_bloom_sidecars(
                            rel, bloom_cols)
                    entries.append(entry)
                    n += 1
        else:
            for fn in sorted(os.listdir(staging)):
                if not fn.endswith(".parquet"):
                    continue
                final = f"{commit}-{n:05d}.parquet"
                os.rename(os.path.join(staging, fn),
                          os.path.join(self.data_dir, final))
                rows, stats = _file_stats(os.path.join(self.data_dir, final))
                entry = {"path": final, "rows": rows, "stats": stats}
                if bloom_cols:
                    entry["bloom"] = self._write_bloom_sidecars(
                        final, bloom_cols)
                entries.append(entry)
                n += 1
        shutil.rmtree(staging, ignore_errors=True)
        return entries

    def _write_bloom_sidecars(self, rel: str,
                              cols: list[str]) -> dict[str, str]:
        """One Bloom sidecar per (data file, column) under metadata/puffin/,
        built from the file's DISTINCT values (stringified with str(), the
        same canonicalization plan_files applies to predicate literals).
        Returns {column: sidecar path relative to metadata/}."""
        puffin = os.path.join(self.meta_dir, "puffin")
        os.makedirs(puffin, exist_ok=True)
        tbl = pq.read_table(os.path.join(self.data_dir, rel), columns=cols)
        out: dict[str, str] = {}
        for col in cols:
            values = [
                str(v) for v in tbl.column(col).unique().to_pylist()
                if v is not None
            ]
            blob = _build_bloom(values)
            blob["data_file"] = rel
            blob["column"] = col
            side = f"puffin/{rel.replace('/', '__')}.{col}.bloom.json"
            with open(os.path.join(self.meta_dir, side), "w") as f:
                json.dump(blob, f)
            out[col] = side
        return out

    def _load_bloom(self, side: str) -> dict:
        cache = getattr(self, "_bloom_cache", None)
        if cache is None:
            cache = self._bloom_cache = {}
        if side not in cache:
            with open(os.path.join(self.meta_dir, side)) as f:
                blob = json.load(f)
            # decode once per table handle: planning probes every candidate
            # file's sidecar, so per-probe b64 decode would be O(files) work
            # repeated per predicate
            blob["bits"] = base64.b64decode(blob["bits"])
            cache[side] = blob
        return cache[side]

    def _check_partition_spec(self, prev: dict,
                              partition_by: str | None) -> None:
        """The partition spec is table metadata (as in Iceberg): every
        commit must use the spec the table was created with — Spark's
        partition discovery cannot mix Hive-layout and flat files under one
        basePath, and a silent mix would corrupt reads."""
        if prev["files"]:
            prev_spec = prev.get("partition_by")
            if prev_spec != partition_by:
                raise ValueError(
                    f"partition spec drift: table uses partition_by="
                    f"{prev_spec!r}, commit brings {partition_by!r}"
                )

    def _check_schema(self, prev: dict, ddl: str, allow_change: bool) -> str:
        if prev["schema"] is None or prev["schema"] == ddl:
            return ddl
        if not allow_change:
            raise ValueError(
                f"schema drift: table has [{prev['schema']}], commit brings "
                f"[{ddl}]; pass allow_schema_change=True to evolve (add-only)"
            )
        prev_cols = dict(c.split(" ", 1) for c in prev["schema"].split(","))
        new_cols = dict(c.split(" ", 1) for c in ddl.split(","))
        for name, typ in prev_cols.items():
            if new_cols.get(name) != typ:
                raise ValueError(
                    f"schema evolution may only ADD columns: existing column "
                    f"{name.strip()} changed or dropped"
                )
        return ddl

    def _commit(self, operation: str, added: list[dict],
                files: list[dict], schema: str, retries: int = 5,
                extra: dict | None = None) -> dict:
        os.makedirs(self.meta_dir, exist_ok=True)
        for _ in range(retries):
            seq = self.current_seq() + 1
            snap = {
                "sequence": seq,
                "snapshot_id": uuid.uuid4().hex[:16],
                "parent": self.snapshot(seq - 1)["snapshot_id"],
                "operation": operation,
                "schema": schema,
                "added": [f["path"] for f in added],
                "files": files,
                "ts_ms": int(time.time() * 1000),
                **(extra or {}),
            }
            try:
                # exclusive create = the CAS: exactly one writer wins seq
                with open(self._snap_path(seq), "x") as f:
                    json.dump(snap, f)
            except FileExistsError:
                continue  # lost the race — re-resolve parent and retry
            hint_tmp = os.path.join(self.meta_dir, "version-hint.tmp")
            with open(hint_tmp, "w") as f:
                f.write(str(seq))
            os.rename(hint_tmp,
                      os.path.join(self.meta_dir, "version-hint.text"))
            return snap
        raise CommitConflict(
            f"lost {retries} commit races on {self.path}; concurrent writer storm"
        )

    def append(self, df: DataFrame, allow_schema_change: bool = False,
               extra: dict | None = None,
               partition_by: str | None = None,
               sort_by: list[str] | None = None,
               sort_files: int | None = None,
               bloom_cols: list[str] | None = None) -> dict:
        """Append-files commit (Iceberg ``append``): new snapshot = parent's
        files + this df's files. ``partition_by`` = identity partitioning
        (Hive-layout files, per-file partition value in the manifest);
        ``sort_by`` = write-order clustering (tight per-file min/max);
        ``bloom_cols`` = per-file Bloom sidecars for point-lookup pruning."""
        prev = self.snapshot()
        ddl = self._check_schema(prev, _ddl(df), allow_schema_change)
        self._check_partition_spec(prev, partition_by)
        added = self._write_data_files(df, partition_by=partition_by,
                                       sort_by=sort_by, sort_files=sort_files,
                                       bloom_cols=bloom_cols)
        return self._commit("append", added, prev["files"] + added, ddl,
                            extra={**(extra or {}),
                                   "partition_by": partition_by,
                                   "sort_by": sort_by})

    def overwrite(self, df: DataFrame, allow_schema_change: bool = False,
                  sort_by: list[str] | None = None,
                  sort_files: int | None = None,
                  bloom_cols: list[str] | None = None) -> dict:
        """Replace-all commit (Iceberg ``overwrite``): new snapshot lists
        ONLY this df's files. Old files stay on disk for time travel.
        ``sort_by``/``sort_files``/``bloom_cols`` as in :meth:`append`;
        left unset, the table's previous sort order is reapplied so a
        versioned table (e.g. publish_curated) keeps its clustering across
        versions without every caller re-stating it."""
        prev = self.snapshot()
        ddl = self._check_schema(prev, _ddl(df), allow_schema_change)
        spec = prev.get("partition_by") if prev["files"] else None
        if sort_by is None and prev["files"]:
            sort_by = prev.get("sort_by")
        added = self._write_data_files(df, partition_by=spec,
                                       sort_by=sort_by, sort_files=sort_files,
                                       bloom_cols=bloom_cols)
        return self._commit("overwrite", added, added, ddl,
                            extra={"partition_by": spec, "sort_by": sort_by})

    def compact(self, spark: SparkSession, target_files: int = 1) -> dict:
        """Small-file compaction (Iceberg ``rewrite_data_files``): rewrite
        the CURRENT file list into ``target_files`` files in one replace
        commit. Data is bit-identical; old files stay for time travel. At
        100 TB a streaming ingest lands thousands of per-trigger files —
        without periodic compaction, scan planning and footer reads dominate
        query latency long before the data does."""
        prev = self.snapshot()
        if not prev["files"]:
            return prev
        spec = prev.get("partition_by")
        df = self._reader(spark, prev["schema"]).parquet(
            *self._paths(prev["files"])).coalesce(target_files)
        added = self._write_data_files(df, partition_by=spec)
        return self._commit("replace", added, added, prev["schema"],
                            extra={"partition_by": spec})

    def streaming_sink(self, query_tag: str = "stream"):
        """foreachBatch sink with exactly-once semantics over retried
        micro-batches: each commit records (query_tag, epoch_id); a retried
        epoch (Structured Streaming re-runs a batch after failure BEFORE the
        checkpoint advances) is detected against the snapshot log and
        skipped, so rows land exactly once even though foreachBatch itself
        is at-least-once. Usage::

            stream.writeStream.foreachBatch(tbl.streaming_sink("extract"))
        """

        def sink(batch_df: DataFrame, epoch_id: int) -> None:
            for seq in reversed(self._committed_seqs()):
                s = self.snapshot(seq)
                if s.get("stream_query") == query_tag:
                    if int(s["stream_epoch"]) >= int(epoch_id):
                        return  # retried epoch: already committed
                    break
            self.append(batch_df, extra={"stream_query": query_tag,
                                         "stream_epoch": int(epoch_id)})

        return sink

    def delete_where(self, spark: SparkSession,
                     predicate: tuple[str, str, object]) -> dict:
        """Copy-on-write row-level DELETE (Iceberg ``DELETE FROM … WHERE``
        with copy-on-write): manifest stats select the candidate files that
        MAY contain matching rows; ONLY those are read and rewritten with
        the complement filter, every other file carries over by reference —
        at 100 TB a targeted delete rewrites a handful of files, not the
        table. Rows where the predicate is NULL are retained (SQL DELETE
        semantics: only rows where the condition is TRUE are removed).
        Old files stay on disk for time travel (expire_snapshots reclaims).
        """
        prev = self.snapshot()
        if not prev["files"]:
            return prev
        candidates, _ = self.plan_files(predicate)
        cand_paths = {f["path"] for f in candidates}
        carried = [f for f in prev["files"] if f["path"] not in cand_paths]
        spec = prev.get("partition_by")
        col, op, lit = predicate
        added: list[dict] = []
        if candidates:
            df = self._reader(spark, prev["schema"]).parquet(
                *self._paths(candidates))
            kept = df.where(
                f"NOT coalesce({col} {'==' if op == '=' else op} {lit!r}, false)"
            )
            added = [f for f in self._write_data_files(kept, partition_by=spec)
                     if f["rows"] > 0]
        return self._commit(
            "delete", added, carried + added, prev["schema"],
            extra={"partition_by": spec, "rewrote_files": len(candidates),
                   "carried_files": len(carried)})

    def merge_upsert(self, spark: SparkSession, source: DataFrame,
                     key_cols: str | list[str]) -> dict:
        """Copy-on-write MERGE (Iceberg ``MERGE INTO`` upsert): target rows
        whose key matches a source row are REPLACED by the source row;
        source rows with unmatched keys are INSERTED. Candidate files come
        from manifest stats on the first key column (range overlap with the
        source's key span); only candidates are read, anti-joined against
        the source keys, and rewritten together with the source — untouched
        files carry over by reference. The anti-join is a plain Spark join,
        so Catalyst broadcasts a small source and sort-merges a big one —
        the same physical strategy Iceberg's Spark MERGE uses."""
        prev = self.snapshot()
        ddl = self._check_schema(prev, _ddl(source), False)
        spec = prev.get("partition_by") if prev["files"] else None
        keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
        lo, hi = source.agg(F.min(keys[0]), F.max(keys[0])).first()
        if lo is None:
            return prev  # empty source: MERGE is a no-op
        carried, candidates = [], []
        for f in prev["files"]:
            s = f["stats"].get(keys[0])
            if s is not None and (s["max"] < lo or s["min"] > hi):
                carried.append(f)  # key span can't overlap: file untouched
            else:
                candidates.append(f)
        if candidates:
            tgt = self._reader(spark, prev["schema"]).parquet(
                *self._paths(candidates))
            survivors = tgt.join(
                source.select(*keys).distinct(), on=keys, how="left_anti")
            merged = survivors.unionByName(source)
        else:
            merged = source
        added = [f for f in self._write_data_files(merged, partition_by=spec)
                 if f["rows"] > 0]
        return self._commit(
            "merge", added, carried + added, ddl,
            extra={"partition_by": spec, "rewrote_files": len(candidates),
                   "carried_files": len(carried)})

    def expire_snapshots(self, keep_last: int = 1) -> dict:
        """Snapshot expiry (Iceberg ``expire_snapshots``): drop all but the
        newest ``keep_last`` snapshots and physically delete data files
        referenced ONLY by expired ones. Time travel to expired sequences is
        gone afterwards — that is the contract; after overwrite/compaction/
        delete churn, unreferenced files dominate storage, and at 100 TB
        expiry IS the storage-reclamation path."""
        seqs = self._committed_seqs()
        retain = set(seqs[-keep_last:]) if keep_last > 0 else set()
        live: set[str] = set()
        live_sidecars: set[str] = set()
        for seq in retain:
            for f in self.snapshot(seq)["files"]:
                live.add(f["path"])
                live_sidecars.update((f.get("bloom") or {}).values())
        deleted_files = 0
        if os.path.isdir(self.data_dir):
            for root, _dirs, files in os.walk(self.data_dir, topdown=False):
                for fn in files:
                    full = os.path.join(root, fn)
                    rel = os.path.relpath(full, self.data_dir)
                    if fn.endswith(".parquet") and rel not in live:
                        os.remove(full)
                        deleted_files += 1
                if not os.listdir(root) and root != self.data_dir:
                    os.rmdir(root)  # empty partition dir after reclamation
        puffin = os.path.join(self.meta_dir, "puffin")
        deleted_sidecars = 0
        if os.path.isdir(puffin):
            for fn in os.listdir(puffin):
                if f"puffin/{fn}" not in live_sidecars:
                    os.remove(os.path.join(puffin, fn))
                    deleted_sidecars += 1
        expired = 0
        for seq in seqs:
            if seq not in retain:
                os.remove(self._snap_path(seq))
                expired += 1
        return {"expired_snapshots": expired, "deleted_files": deleted_files,
                "deleted_sidecars": deleted_sidecars,
                "retained_seqs": sorted(retain)}

    def rollback(self, seq: int) -> dict:
        """Commit a new snapshot replaying an ancestor's file list (history
        stays append-only; nothing is deleted)."""
        target = self.snapshot(seq)
        return self._commit("rollback", [], target["files"], target["schema"],
                            extra={"partition_by": target.get("partition_by")})

    # -- reads -----------------------------------------------------------

    def _paths(self, files: list[dict]) -> list[str]:
        return [os.path.join(self.data_dir, f["path"]) for f in files]

    def _reader(self, spark: SparkSession, schema: str):
        """basePath keeps Hive-partition discovery working on explicit file
        lists, so identity-partition columns re-derive from the path; it is
        harmless for unpartitioned files."""
        return spark.read.schema(schema).option("basePath", self.data_dir)

    def read(self, spark: SparkSession, seq: int | None = None) -> DataFrame:
        """Snapshot read (current, or time travel to ``seq``)."""
        snap = self.snapshot(seq)
        if not snap["files"]:
            return spark.createDataFrame([], schema=snap["schema"] or "dummy int")
        return self._reader(spark, snap["schema"]).parquet(
            *self._paths(snap["files"]))

    def read_incremental(self, spark: SparkSession, after_seq: int,
                         until_seq: int | None = None) -> DataFrame:
        """Rows in files ADDED by snapshots in (after_seq, until_seq] — the
        incremental-consumption pattern (overwrite/rollback snapshots
        contribute only their newly added files)."""
        until_seq = self.current_seq() if until_seq is None else until_seq
        snap = self.snapshot(until_seq)
        added: list[dict] = []
        for seq in range(after_seq + 1, until_seq + 1):
            s = self.snapshot(seq)
            if s["operation"] == "replace":
                continue  # compaction rewrites carry no new rows — skipping
                # them keeps incremental consumers exactly-once
            by_path = {f["path"]: f for f in s["files"]}
            added += [by_path[p] for p in s.get("added", []) if p in by_path]
        if not added:
            return spark.createDataFrame([], schema=snap["schema"] or "dummy int")
        return self._reader(spark, snap["schema"]).parquet(*self._paths(added))

    def _file_may_match(self, f: dict, predicate: tuple) -> bool:
        """Conservative single-predicate survival test for one manifest
        entry: identity-partition value, then Bloom sidecar (equality on a
        bloom_cols column — the point-lookup path min/max can't serve), then
        footer min/max. A file with no usable metadata always survives."""
        col, op, lit = predicate
        part = f.get("partition") or {}
        if col in part:
            # identity-partition pruning: exact string match only; range ops
            # on the dir-string would be lexicographic lies for numeric
            # values, so they conservatively keep the file
            return not (op == "=" and part[col] != str(lit))
        if op == "=":
            side = (f.get("bloom") or {}).get(col)
            if side is not None and not _bloom_may_contain(
                    self._load_bloom(side), str(lit)):
                return False  # definite miss: no false negatives
        s = f["stats"].get(col)
        if s is None:
            return True
        mn, mx = s["min"], s["max"]
        return {
            "=": mn <= lit <= mx,
            "<": mn < lit, "<=": mn <= lit,
            ">": mx > lit, ">=": mx >= lit,
        }[op]

    def plan_files(self, predicate=None,
                   seq: int | None = None) -> tuple[list[dict], int]:
        """Manifest-level scan planning: (surviving files, pruned count).
        ``predicate`` = (column, op, literal) with op in =, <, <=, >, >= —
        or a LIST of such triples, conjunctive (a file survives only if it
        may match EVERY predicate). Conservative: a file with no stats for a
        column always survives that predicate."""
        files = self.snapshot(seq)["files"]
        if predicate is None:
            return files, 0
        preds = predicate if isinstance(predicate, list) else [predicate]
        keep = [
            f for f in files
            if all(self._file_may_match(f, p) for p in preds)
        ]
        return keep, len(files) - len(keep)

    def scan(self, spark: SparkSession,
             predicate=None,
             seq: int | None = None) -> DataFrame:
        """Pruned snapshot read: files excluded by manifest metadata
        (partition values, Bloom sidecars, footer min/max) are never given
        to Spark (manifest pruning ABOVE the engine's own row-group
        pushdown). ``predicate`` = one (col, op, lit) triple or a
        conjunctive list. Each predicate is re-applied as a real filter so
        results are exact, and Catalyst still pushes it into the surviving
        scans."""
        keep, _pruned = self.plan_files(predicate, seq)
        snap = self.snapshot(seq)
        if not keep:
            return spark.createDataFrame([], schema=snap["schema"] or "dummy int")
        df = self._reader(spark, snap["schema"]).parquet(*self._paths(keep))
        if predicate is not None:
            preds = predicate if isinstance(predicate, list) else [predicate]
            for col, op, lit in preds:
                df = df.where(f"{col} {'==' if op == '=' else op} {lit!r}")
        return df


def _ddl(df: DataFrame) -> str:
    return ",".join(f"{f.name} {f.dataType.simpleString()}"
                    for f in df.schema.fields)
