"""IceTable: a minimal Iceberg-semantics table format over plain parquet.

The north-rule contract is "checkpoint manifests written to Iceberg" with
lineage and time travel; this sandbox ships no Iceberg runtime, so this
module implements the load-bearing subset of the spec's semantics from
scratch (no copied code — the layout mirrors the PUBLIC Iceberg spec's
concepts: snapshot log, manifest list + manifest files, stats-based scan
pruning at both levels):

Layout::

    table/
      data/<commit-uuid>-<n>.parquet        immutable data files
      metadata/manifest-<uuid>.json         immutable MANIFEST FILE: the
                                            per-file entries (path, rows,
                                            per-column min/max/null stats,
                                            partition value, Bloom refs)
                                            for one group of data files
      metadata/snap-<seq 10 digits>.json    snapshot: parent, operation,
                                            schema, and the MANIFEST LIST —
                                            references to manifest files
                                            with per-manifest aggregate
                                            stats, NOT the file entries
      metadata/puffin/*.bloom.json          per-(file, column) Bloom sidecars
      metadata/version-hint.text            current sequence (atomic rename)

Why two metadata levels (the round-3 scale boundary, now closed): with the
file list inline in every snapshot, a 1-file append to a 10^6-file table
re-serializes 10^6 entries — commit cost O(table), metadata O(snapshots ×
files). With a manifest list, an append writes ONE new manifest holding only
its own files plus a snapshot whose manifest list grows by one reference:
commit metadata is O(added files + number of manifests). Row-level ops
rewrite only the manifests whose files they touch; untouched manifests carry
over by reference. ``rewrite_manifests()`` (Iceberg's procedure of the same
name) compacts a long manifest list back to one manifest in a metadata-only
commit.

Semantics carried over from Iceberg:

- **Atomic commits, snapshot isolation**: data files land first; the
  snapshot JSON is written with EXCLUSIVE CREATE (``open(..., "x")``) so two
  concurrent committers racing for the same sequence number conflict
  explicitly. A losing ``append``/``overwrite``/``compact``/``rollback``
  RE-READS the winner's snapshot and rebuilds its manifest list on top of it
  (optimistic concurrency, like Iceberg's metadata-pointer CAS — the
  winner's files are never lost). A losing ``delete_where``/``merge_upsert``
  raises :class:`CommitConflict` instead: their rewrite plan was computed
  against a snapshot that is no longer current, and silently rebasing could
  resurrect deleted rows. Readers resolve the current snapshot via
  version-hint but fall back to the highest committed snap file, so a torn
  hint is harmless. Uncommitted data files are invisible (never listed in
  any manifest reachable from a snapshot).
- **Time travel**: ``read(spark, seq=...)`` reconstructs any historical file
  list from its manifest list; ``history()`` is the lineage (snapshot →
  parent) and needs only the manifest-list aggregates, no manifest loads.
- **Incremental reads**: ``read_incremental(s1, s2)`` = files added by
  snapshots in (s1, s2] — the streaming-backfill pattern — resolved from
  each snapshot's ``added_manifests`` alone.
- **Scan pruning, two-level**: each manifest file records per-file column
  min/max/null-count harvested from the parquet FOOTERS; the manifest LIST
  records per-manifest aggregates of the same stats plus the partition
  values it covers. ``plan_files`` prunes whole manifests from the snapshot
  alone (never opening them), then prunes files inside the survivors. At
  100 TB this is the difference between reading 10^6 manifest entries and
  reading 10^2.
- **Schema pinning**: the first commit records the schema DDL; later commits
  must match or explicitly evolve via ``allow_schema_change=True`` (adding
  columns only) — resuming a job with a drifted schema fails loudly. The
  DDL comparison is bracket-aware, so nested types (struct/array/map,
  decimal) evolve correctly.
- **Rollback**: ``rollback(snapshot_id)`` commits a NEW snapshot whose
  manifest list is the old one (history is append-only, like Iceberg — no
  snapshot is ever destroyed).
- **Row-level ops, copy-on-write AND merge-on-read**: ``delete_where`` and
  ``merge_upsert`` default to CoW — rewrite ONLY the files whose manifest
  stats may contain affected rows (merge intersects the ranges of ALL key
  columns and consults Bloom sidecars for small sources); all other files
  carry over by reference. With ``mode="mor"`` they instead write Iceberg
  v2-style DELETE FILES: positional deletes ((file_path, pos) rows bound
  to exact target files) for DELETE, equality deletes (key tuples applied
  to data files with ``data_seq < delete_seq``) for MERGE — no data file
  is rewritten, a point delete writes O(matching rows) bytes. Snapshots
  carry a separate ``delete_manifests`` list; readers bind deletes to
  files at plan time and anti-join only the affected files; ``compact()``
  folds deletes in physically and ``overwrite`` drops them.
- **Named refs (tags)**: ``tag(name)`` pins a snapshot under an immutable
  name (``read(spark, tag="v1")`` = VERSION AS OF by name); tagged
  snapshots are retained through expiry until ``delete_tag`` — the
  Iceberg ref-retention contract (refs live under ``metadata/refs/``).
- **Branches + write-audit-publish**: ``create_branch(name)`` forks the
  current snapshot into a branch-local lineage (``metadata/branches/<n>/``)
  sharing data files and manifests with main; branch commits leave main
  untouched and readable; ``fast_forward(name)`` publishes the audited
  branch tip to main as a metadata-only commit, refusing when main moved
  past the fork point. Expiry retains everything any live branch
  references; ``delete_branch`` releases it.
- **Maintenance**: ``expire_snapshots(keep_last=k)`` deletes expired
  snapshots, the manifests only they reference, and the data files only
  they reference (storage reclamation after overwrite/delete/compaction
  churn) — except snapshots pinned by tags.

Metadata harvest runs ON THE WRITE EXECUTORS (as Iceberg's writers do):
after the staged files are renamed into place, a Spark job fans the new
file list out over the cluster; each task reads its files' parquet footers,
builds and writes the Bloom sidecars, and returns one manifest row — the
driver receives O(added) small JSON rows, never payload bytes, so commit
latency stays flat in table size AND in per-commit data volume. Commits of
≤ ``_DRIVER_HARVEST_MAX`` files skip the job-scheduling overhead and run
the IDENTICAL harvest function on the driver.

jobs/resumable.py keeps its wave-level manifest (per-bucket throughput
metrics feed); IceTable is the table-level commit/lineage layer underneath
the same two-step protocol. scripts/curate_job.py composes both.
"""

from __future__ import annotations

import base64
import hashlib
import json
import math
import re
import os
import shutil
import time
import uuid
from functools import reduce

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Commits with at most this many new files harvest footer stats / Bloom
# sidecars on the driver (same function, no Spark job) — the job-scheduling
# overhead would dominate for tiny commits. Larger commits fan the harvest
# out over the executors.
_DRIVER_HARVEST_MAX = 4

# A manifest-list entry stops recording its covered partition values past
# this many distinct values (pruning falls back to the per-file checks).
_MAX_MANIFEST_PARTITIONS = 64


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
                # hold (predicate literals are normalized the same way)
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
    """Another writer committed first and this commit cannot be rebased
    (row-level ops), or append retries ran out under a writer storm."""


# ---------------------------------------------------------------------------
# Per-file Bloom filters (the Iceberg Puffin-sidecar analogue). min/max stats
# prune range predicates but are USELESS for point lookups on
# high-cardinality unordered keys (uuid-ish conv_ids: every file's [min,max]
# spans the whole keyspace). A per-file Bloom answers "could key k be in this
# file?" with no false negatives — at 10^12 turns it is the difference
# between reading one file and reading the table for `conv_id = X`.
# Stored as sidecar files under metadata/puffin/ (like Iceberg's Puffin
# blobs), NOT inline in the manifests: manifests stay small, sidecars
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


# ---------------------------------------------------------------------------
# Metadata harvest — runs on write EXECUTORS for large commits (driver for
# tiny ones): parquet footer stats + Bloom sidecar construction per new data
# file. Module-level so Spark tasks can pickle it without a table handle.
# ---------------------------------------------------------------------------


def _write_bloom_sidecars(data_dir: str, meta_dir: str, rel: str,
                          cols: list[str]) -> dict[str, str]:
    """One Bloom sidecar per (data file, column) under metadata/puffin/,
    built from the file's DISTINCT values (stringified with str(), the
    same canonicalization plan_files applies to predicate literals).
    Returns {column: sidecar path relative to metadata/}."""
    puffin = os.path.join(meta_dir, "puffin")
    os.makedirs(puffin, exist_ok=True)
    tbl = pq.read_table(os.path.join(data_dir, rel), columns=cols)
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
        with open(os.path.join(meta_dir, side), "w") as f:
            json.dump(blob, f)
        out[col] = side
    return out


def _harvest_entry(data_dir: str, meta_dir: str, rel: str,
                   partition_by: str | None,
                   bloom_cols: list[str] | None) -> dict:
    """One manifest entry for one committed data file: footer stats, the
    partition value re-derived from the Hive path, Bloom sidecars written
    as a side effect. Pure function of the file — safe to run anywhere."""
    rows, stats = _file_stats(os.path.join(data_dir, rel))
    entry: dict = {"path": rel, "rows": rows, "stats": stats}
    if partition_by:
        pdir = rel.split("/", 1)[0]
        entry["partition"] = {partition_by: pdir.split("=", 1)[1]}
    if bloom_cols:
        entry["bloom"] = _write_bloom_sidecars(data_dir, meta_dir, rel,
                                               bloom_cols)
    return entry


def _split_ddl(ddl: str) -> dict[str, str]:
    """{column: type} from a ``name type,name type`` DDL string, splitting
    on commas at bracket depth 0 only — nested types (struct<a:int,b:str>,
    map<...>, decimal(10,2)) contain commas that a naive split would eat."""
    cols: dict[str, str] = {}
    depth, start = 0, 0
    parts: list[str] = []
    for i, ch in enumerate(ddl):
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(ddl[start:i])
            start = i + 1
    parts.append(ddl[start:])
    for p in parts:
        name, typ = p.strip().split(" ", 1)
        cols[name] = typ.strip()
    return cols


_PRED_OPS = ("=", "<", "<=", ">", ">=")


def _pred_column(col: str, op: str, lit):
    """Predicate as a Column expression — never SQL-string splicing, so
    quote-bearing string literals and reserved-word columns are safe."""
    c = F.col(col)
    if op == "in":
        return c.isin(list(lit))
    if op == "isnull":
        return c.isNull()
    if op == "notnull":
        return c.isNotNull()
    return {"=": c == F.lit(lit), "<": c < F.lit(lit), "<=": c <= F.lit(lit),
            ">": c > F.lit(lit), ">=": c >= F.lit(lit)}[op]


def _norm_lit(lit):
    """Predicate literal in stats space: date/datetime → ISO string, the
    same canonicalization _file_stats applies to footer min/max. An ``in``
    value list normalizes element-wise."""
    if isinstance(lit, (list, tuple, set, frozenset)):
        return [v.isoformat() if hasattr(v, "isoformat") else v for v in lit]
    return lit.isoformat() if hasattr(lit, "isoformat") else lit


def _range_may_match(mn, mx, op, lit) -> bool:
    if op == "in":
        return any(mn <= v <= mx for v in lit)
    return {"=": mn <= lit <= mx,
            "<": mn < lit, "<=": mn <= lit,
            ">": mx > lit, ">=": mx >= lit}[op]


def _merge_entry_stats(entries: list[dict]) -> dict[str, dict]:
    """Per-column {min,max} aggregated across entries — recorded only for
    columns EVERY entry has stats for (a stats-less file must never be
    pruned, so the manifest aggregate may not claim to cover it)."""
    if not entries:
        return {}
    common = set(entries[0]["stats"])
    for e in entries[1:]:
        common &= set(e["stats"])
    return {
        col: {"min": min(e["stats"][col]["min"] for e in entries),
              "max": max(e["stats"][col]["max"] for e in entries),
              "nulls": sum(e["stats"][col].get("nulls", 0)
                           for e in entries)}
        for col in sorted(common)
    }


def _pos_target_sets(dels: list[dict]) -> dict[str, set]:
    """Per positional-delete file, the set of data-file paths it targets."""
    return {d["path"]: set(d["targets"]) for d in dels if d["kind"] == "pos"}


def _delete_applies(f: dict, d: dict, tsets: dict[str, set]) -> bool:
    """Whether delete entry ``d`` may affect data file ``f`` (the per-file
    delete binding computed at plan time): positional deletes by exact
    target path; equality deletes by ``data_seq < delete_seq`` plus
    key-range disjointness from the footer stats."""
    if d["kind"] == "pos":
        return f["path"] in tsets[d["path"]]
    if (f.get("data_seq") or 0) >= d["delete_seq"]:
        return False  # file written at/after the delete committed
    for k in d.get("eq_cols", []):
        fs = (f.get("stats") or {}).get(k)
        ds = (d.get("stats") or {}).get(k)
        if fs and ds and (fs["max"] < ds["min"] or fs["min"] > ds["max"]):
            return False  # key ranges disjoint: no row can match
    return True


def _delete_binding(f: dict, dels: list[dict],
                    tsets: dict[str, set]) -> tuple[str, ...]:
    """The (sorted) delete-file paths applicable to ``f`` — the file's
    delete-binding signature. Two snapshots bind a carried file
    identically iff these tuples are equal."""
    return tuple(sorted(d["path"] for d in dels
                        if _delete_applies(f, d, tsets)))


def _manifest_partitions(entries: list[dict]) -> dict[str, list[str]] | None:
    """Partition values covered by a manifest ({col: sorted values}), or
    None when any entry is unpartitioned or the value set is too large to
    inline in the manifest list."""
    if not entries or any("partition" not in e for e in entries):
        return None
    out: dict[str, set[str]] = {}
    for e in entries:
        for col, val in e["partition"].items():
            out.setdefault(col, set()).add(val)
    if any(len(v) > _MAX_MANIFEST_PARTITIONS for v in out.values()):
        return None
    return {col: sorted(v) for col, v in out.items()}


class IceTable:
    def __init__(self, path: str, branch: str | None = None) -> None:
        self.path = path
        self.data_dir = os.path.join(path, "data")
        self.meta_dir = os.path.join(path, "metadata")
        self.branch_name = branch
        # snapshots live per branch; data files, manifests, Bloom sidecars
        # and refs are SHARED across branches (a branch commit only writes
        # branch-local snapshot JSON — Iceberg's branch model)
        self._snap_dir = (
            os.path.join(self.meta_dir, "branches", branch)
            if branch else self.meta_dir)

    # -- snapshot resolution --------------------------------------------

    def _snap_path(self, seq: int) -> str:
        return os.path.join(self._snap_dir, f"snap-{seq:010d}.json")

    def _committed_seqs(self) -> list[int]:
        if not os.path.isdir(self._snap_dir):
            return []
        return sorted(
            int(fn[5:15]) for fn in os.listdir(self._snap_dir)
            if fn.startswith("snap-") and fn.endswith(".json")
        )

    def current_seq(self) -> int:
        """0 = empty table. Version-hint is advisory; the snap files are the
        source of truth (a torn/stale hint self-heals)."""
        seqs = self._committed_seqs()
        return seqs[-1] if seqs else 0

    def _raw_snapshot(self, seq: int | None = None) -> dict:
        """The snapshot JSON as committed: manifest list, NO file entries
        (legacy pre-manifest snapshots carry an inline ``files`` list and
        are handled transparently everywhere)."""
        seq = self.current_seq() if seq is None else seq
        if seq == 0:
            return {"sequence": 0, "parent": None, "operation": "create",
                    "manifests": [], "schema": None, "snapshot_id": None}
        with open(self._snap_path(seq)) as f:
            return json.load(f)

    def _load_manifest(self, path: str) -> list[dict]:
        """File entries of one manifest — cached per handle (manifests are
        immutable; expire_snapshots creates new handles' problems only for
        already-expired history, which is the documented contract)."""
        cache = getattr(self, "_manifest_cache", None)
        if cache is None:
            cache = self._manifest_cache = {}
        if path not in cache:
            with open(os.path.join(self.meta_dir, path)) as f:
                cache[path] = json.load(f)["entries"]
        return cache[path]

    def _snap_files(self, raw: dict) -> list[dict]:
        """Materialize a snapshot's full file-entry list from its manifests
        (or the inline list of a legacy snapshot)."""
        if "files" in raw:
            return raw["files"]
        out: list[dict] = []
        for ref in raw.get("manifests", []):
            out.extend(self._load_manifest(ref["path"]))
        return out

    def snapshot(self, seq: int | None = None) -> dict:
        """Snapshot dict with the file-entry list materialized under
        ``files`` (resolved from the manifest list; the on-disk snapshot
        stores only manifest references)."""
        raw = self._raw_snapshot(seq)
        if "files" not in raw:
            raw["files"] = self._snap_files(raw)
        return raw

    def history(self) -> list[dict]:
        """Lineage, oldest first: [{sequence, snapshot_id, parent, operation,
        added_files, total_files, total_rows, ts_ms}] — computed from the
        manifest-list aggregates alone (no manifest loads)."""
        out = []
        for seq in self._committed_seqs():
            s = self._raw_snapshot(seq)
            if "files" in s:  # legacy inline snapshot
                total_files = len(s["files"])
                total_rows = sum(f["rows"] for f in s["files"])
            else:
                total_files = sum(m["n_files"] for m in s["manifests"])
                total_rows = sum(m["rows"] for m in s["manifests"])
            out.append({
                "sequence": s["sequence"], "snapshot_id": s["snapshot_id"],
                "parent": s["parent"], "operation": s["operation"],
                "added_files": len(s.get("added", [])),
                "total_files": total_files,
                "total_rows": total_rows,
                "ts_ms": s.get("ts_ms"),
            })
        return out

    # -- commits ---------------------------------------------------------

    def _write_manifest(self, entries: list[dict]) -> dict:
        """Write one immutable manifest file; return its manifest-list
        reference carrying the aggregates two-level planning prunes on."""
        name = f"manifest-{uuid.uuid4().hex[:16]}.json"
        os.makedirs(self.meta_dir, exist_ok=True)
        with open(os.path.join(self.meta_dir, name), "w") as f:
            json.dump({"entries": entries}, f)
        ref = {"path": name, "n_files": len(entries),
               "rows": sum(e["rows"] for e in entries),
               "stats": _merge_entry_stats(entries)}
        parts = _manifest_partitions(entries)
        if parts is not None:
            ref["partitions"] = parts
        cache = getattr(self, "_manifest_cache", None)
        if cache is None:
            cache = self._manifest_cache = {}
        cache[name] = entries
        return ref

    def _carry_manifests(self, raw: dict) -> list[dict]:
        """A parent snapshot's manifest list, upgrading a legacy inline
        snapshot to one written manifest on first carry."""
        if "manifests" in raw:
            return raw["manifests"]
        files = raw.get("files") or []
        return [self._write_manifest(files)] if files else []

    @staticmethod
    def _zorder_column(df: DataFrame, cols: list[str],
                       bits: int = 16) -> DataFrame:
        """Add a ``__zvalue`` long interleaving the bit-planes of each
        column's min-max-scaled bucket id (Morton / Z-order curve) — the
        multi-dimensional clustering key Databricks' OPTIMIZE ZORDER uses.
        Sorting by it gives EVERY listed column file-level locality, where
        plain sort_by only clusters the sort prefix. The min/max bounds are
        one model-sized agg; the interleave is a pure column expression
        (whole-stage-codegen'd, no UDF). k columns use k*floor(48/k) bits."""
        from pyspark.sql.types import DateType, NumericType, TimestampType

        if not 1 <= len(cols) <= 4:
            raise ValueError("zorder_by takes 1-4 columns")
        for c in cols:
            dt = df.schema[c].dataType
            if not isinstance(dt, (NumericType, DateType, TimestampType)):
                raise ValueError(
                    f"zorder_by column {c!r} is {dt.simpleString()}: only "
                    "numeric/date/timestamp columns have a meaningful "
                    "min-max bucket space (a string column would silently "
                    "collapse to one bucket)")
        k = len(cols)
        use_bits = min(bits, 48 // k)
        top = (1 << use_bits) - 1

        def as_double(c: str):
            dt = df.schema[c].dataType
            if isinstance(dt, (DateType, TimestampType)):
                return F.col(c).cast("timestamp").cast("double")
            return F.col(c).cast("double")

        bounds = df.agg(
            *[F.min(as_double(c)).alias(f"mn_{i}")
              for i, c in enumerate(cols)],
            *[F.max(as_double(c)).alias(f"mx_{i}")
              for i, c in enumerate(cols)],
        ).first()
        buckets = []
        for i, c in enumerate(cols):
            mn, mx = bounds[f"mn_{i}"], bounds[f"mx_{i}"]
            if mn is None or mx is None or mx <= mn:
                buckets.append(F.lit(0).cast("long"))
                continue
            scaled = (
                (F.coalesce(as_double(c), F.lit(mn)) - F.lit(mn))
                / F.lit(mx - mn) * F.lit(float(top))
            )
            buckets.append(
                F.least(F.lit(top).cast("long"),
                        F.greatest(F.lit(0).cast("long"),
                                   F.floor(scaled).cast("long"))))
        z = F.lit(0).cast("long")
        for bit in range(use_bits):
            for j, b in enumerate(buckets):
                plane = F.shiftright(b, bit).bitwiseAND(F.lit(1).cast("long"))
                z = z.bitwiseOR(F.shiftleft(plane, bit * k + j))
        return df.withColumn("__zvalue", z)

    def _write_data_files(self, df: DataFrame,
                          partition_by: str | None = None,
                          sort_by: list[str] | None = None,
                          sort_files: int | None = None,
                          bloom_cols: list[str] | None = None,
                          zorder_by: list[str] | None = None) -> list[dict]:
        """Stage df as immutable parquet files under data/ (commit-uuid
        prefix — never visible until a manifest reachable from a snapshot
        lists them), then harvest each file's manifest entry. The harvest
        (footer stats + Bloom sidecars) runs as a Spark job over the new
        file list — executor-side, like Iceberg's write tasks — so the
        driver receives only O(added) manifest rows and commit latency is
        flat in both table size and commit data volume. Commits of ≤
        ``_DRIVER_HARVEST_MAX`` files run the same function driver-side to
        skip job overhead.

        With ``partition_by``, files land in Hive-style ``col=value``
        subdirs (Iceberg identity partitioning) and each manifest entry
        records its partition value for exact-match pruning; readers
        re-derive the column from the path (basePath discovery).

        ``sort_by`` range-clusters the write (Spark's global sort = range
        partition + local sort, the Iceberg write-order analogue): each file
        covers a narrow, near-disjoint [min,max] on the sort keys, which is
        what makes footer-stats pruning actually bite on those columns.
        ``bloom_cols`` writes a per-file Bloom sidecar (metadata/puffin/)
        per listed column for point-lookup pruning on keys where min/max
        can't help."""
        os.makedirs(self.data_dir, exist_ok=True)
        spark = df.sparkSession
        commit = uuid.uuid4().hex[:12]
        staging = os.path.join(self.path, f"_staging-{commit}")
        if zorder_by:
            if sort_by:
                raise ValueError("zorder_by and sort_by are exclusive")
            n_files = sort_files or 8
            df = (
                self._zorder_column(df, zorder_by)
                .repartitionByRange(n_files, "__zvalue")
                .sortWithinPartitions("__zvalue")
                .drop("__zvalue")
            )
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
        rels: list[str] = []
        n = 0
        if partition_by:
            # layout: data/<col>=<value>/<commit>-<n>.parquet — the kv dir
            # sits DIRECTLY under basePath (Spark's partition discovery
            # rejects mixed-depth structures), the commit id lives in the
            # file name; files stay immutable across commits
            for pdir in sorted(os.listdir(staging)):
                if not pdir.startswith(f"{partition_by}="):
                    continue
                os.makedirs(os.path.join(self.data_dir, pdir), exist_ok=True)
                for fn in sorted(os.listdir(os.path.join(staging, pdir))):
                    if not fn.endswith(".parquet"):
                        continue
                    rel = f"{pdir}/{commit}-{n:05d}.parquet"
                    os.rename(os.path.join(staging, pdir, fn),
                              os.path.join(self.data_dir, rel))
                    rels.append(rel)
                    n += 1
        else:
            for fn in sorted(os.listdir(staging)):
                if not fn.endswith(".parquet"):
                    continue
                rel = f"{commit}-{n:05d}.parquet"
                os.rename(os.path.join(staging, fn),
                          os.path.join(self.data_dir, rel))
                rels.append(rel)
                n += 1
        shutil.rmtree(staging, ignore_errors=True)
        return self._harvest(spark, rels, partition_by, bloom_cols)

    def _harvest(self, spark: SparkSession, rels: list[str],
                 partition_by: str | None,
                 bloom_cols: list[str] | None) -> list[dict]:
        """Manifest entries for the newly renamed files — executor-side
        above _DRIVER_HARVEST_MAX files, driver-side (identical code) below."""
        if not rels:
            return []
        data_dir, meta_dir = self.data_dir, self.meta_dir
        if len(rels) <= _DRIVER_HARVEST_MAX:
            return [_harvest_entry(data_dir, meta_dir, r, partition_by,
                                   bloom_cols) for r in rels]

        def harvest(batches):
            import pandas as pd  # noqa: PLC0415 — executor-side import

            for pdf in batches:
                yield pd.DataFrame({
                    "entry": [
                        json.dumps(_harvest_entry(
                            data_dir, meta_dir, rel, partition_by, bloom_cols))
                        for rel in pdf["rel"]
                    ]
                })

        par = min(len(rels), spark.sparkContext.defaultParallelism)
        rows = (
            spark.createDataFrame([(r,) for r in rels], "rel string")
            .repartition(par)
            .mapInPandas(harvest, "entry string")
            .collect()
        )
        return sorted((json.loads(r.entry) for r in rows),
                      key=lambda e: e["path"])

    def _check_partition_spec(self, prev: dict,
                              partition_by: str | None,
                              allow_spec_change: bool = False) -> None:
        """The partition spec is table metadata (as in Iceberg): a commit
        that silently changes it would corrupt the mixed-layout read, so a
        drift raises unless the caller opts into PARTITION EVOLUTION
        (``allow_spec_change=True``, Iceberg's spec-evolution semantics):
        existing files keep their old layout forever, new files land under
        the new spec, and the readers split the two eras (Hive-layout files
        derive the partition column from the path; pre-evolution files
        carry it in the data) and union them."""
        if prev.get("manifests") or prev.get("files"):
            prev_spec = prev.get("partition_by")
            if prev_spec != partition_by and not allow_spec_change:
                raise ValueError(
                    f"partition spec drift: table uses partition_by="
                    f"{prev_spec!r}, commit brings {partition_by!r}; pass "
                    "allow_spec_change=True to evolve the spec"
                )

    def _check_schema(self, prev: dict, ddl: str, allow_change: bool) -> str:
        if prev["schema"] is None or prev["schema"] == ddl:
            return ddl
        if not allow_change:
            raise ValueError(
                f"schema drift: table has [{prev['schema']}], commit brings "
                f"[{ddl}]; pass allow_schema_change=True to evolve (add-only)"
            )
        prev_cols = _split_ddl(prev["schema"])
        new_cols = _split_ddl(ddl)
        for name, typ in prev_cols.items():
            if new_cols.get(name) != typ:
                raise ValueError(
                    f"schema evolution may only ADD columns: existing column "
                    f"{name} changed or dropped"
                )
        return ddl

    def _commit(self, operation: str, added: list[dict], schema: str,
                manifests_fn, retries: int = 5, extra: dict | None = None,
                retryable: bool = True,
                planned_parent: tuple | None = None,
                delete_manifests_fn=None) -> dict:
        """Optimistic-concurrency commit. ``manifests_fn(parent_raw)`` builds
        the manifest list ON TOP OF the parent observed in that attempt — a
        retried append therefore carries the racing winner's manifests
        instead of silently dropping them. Non-rebasable operations
        (rewrites whose manifest list was computed from a SPECIFIC parent:
        delete_where, merge_upsert, compact, rewrite_manifests) pass
        ``retryable=False`` plus ``planned_parent=(sequence, snapshot_id)``
        of the snapshot they planned against; if the parent observed at
        commit time differs — even when no same-sequence file collision
        occurs, i.e. a writer landed between planning and commit —
        :class:`CommitConflict` is raised instead of silently dropping the
        racing writer's files.

        ``delete_manifests_fn(parent_raw)`` builds the snapshot's DELETE
        manifest list (merge-on-read row-level deletes, Iceberg v2); the
        default carries the parent's delete manifests unchanged. Rewriting
        operations that materialize delete effects (overwrite, compact)
        pass ``lambda _parent: []``."""
        if delete_manifests_fn is None:
            def delete_manifests_fn(parent):
                return parent.get("delete_manifests", [])
        os.makedirs(self.meta_dir, exist_ok=True)
        os.makedirs(self._snap_dir, exist_ok=True)
        for _ in range(retries):
            seq = self.current_seq() + 1
            parent = self._raw_snapshot(seq - 1)
            if planned_parent is not None and (
                    (parent.get("sequence", 0), parent.get("snapshot_id"))
                    != tuple(planned_parent)):
                raise CommitConflict(
                    f"{operation} on {self.path} planned against snapshot "
                    f"{planned_parent[1]} (seq {planned_parent[0]}) but the "
                    f"current parent is {parent.get('snapshot_id')} (seq "
                    f"{parent.get('sequence', 0)}); a concurrent writer "
                    f"committed since planning — re-plan against the current "
                    f"snapshot"
                )
            snap = {
                "sequence": seq,
                "snapshot_id": uuid.uuid4().hex[:16],
                "parent": parent["snapshot_id"],
                "operation": operation,
                "schema": schema,
                "added": [f["path"] for f in added],
                "manifests": manifests_fn(parent),
                "delete_manifests": delete_manifests_fn(parent),
                "ts_ms": int(time.time() * 1000),
                **(extra or {}),
            }
            try:
                # exclusive create = the CAS: exactly one writer wins seq
                with open(self._snap_path(seq), "x") as f:
                    json.dump(snap, f)
            except FileExistsError:
                if not retryable:
                    raise CommitConflict(
                        f"{operation} on {self.path} planned against seq "
                        f"{seq - 1} but a concurrent writer committed seq "
                        f"{seq}; re-plan against the current snapshot"
                    ) from None
                continue  # lost the race — rebase on the winner and retry
            hint_tmp = os.path.join(self._snap_dir, "version-hint.tmp")
            with open(hint_tmp, "w") as f:
                f.write(str(seq))
            os.rename(hint_tmp,
                      os.path.join(self._snap_dir, "version-hint.text"))
            snap["files"] = self._snap_files(snap)  # in-memory convenience
            return snap
        raise CommitConflict(
            f"lost {retries} commit races on {self.path}; concurrent writer storm"
        )

    def append(self, df: DataFrame, allow_schema_change: bool = False,
               extra: dict | None = None,
               partition_by: str | None = None,
               sort_by: list[str] | None = None,
               sort_files: int | None = None,
               bloom_cols: list[str] | None = None,
               zorder_by: list[str] | None = None,
               allow_spec_change: bool = False) -> dict:
        """Append-files commit (Iceberg ``append``): new snapshot = parent's
        manifests + one new manifest holding this df's files — commit
        metadata is O(added files), never O(table). ``partition_by`` =
        identity partitioning (Hive-layout files, per-file partition value
        in the manifest); ``sort_by`` = write-order clustering (tight
        per-file min/max); ``bloom_cols`` = per-file Bloom sidecars for
        point-lookup pruning; ``zorder_by`` = Morton-curve multi-dimensional
        clustering (every listed column gets file-level min/max locality,
        not just the sort prefix — exclusive with sort_by)."""
        prev = self._raw_snapshot()
        ddl = self._check_schema(prev, _ddl(df), allow_schema_change)
        self._check_partition_spec(prev, partition_by, allow_spec_change)
        added = self._write_data_files(df, partition_by=partition_by,
                                       sort_by=sort_by, sort_files=sort_files,
                                       bloom_cols=bloom_cols,
                                       zorder_by=zorder_by)
        state: dict = {"seq": None, "ref": None}

        def manifests_fn(parent: dict) -> list[dict]:
            # re-validate against the parent ACTUALLY observed this attempt:
            # a rebase onto a racing winner must satisfy the same invariants
            self._check_schema(parent, ddl, allow_schema_change)
            self._check_partition_spec(parent, partition_by, allow_spec_change)
            carried = self._carry_manifests(parent)
            if not added:
                return carried
            # stamp each entry's data sequence with the sequence THIS attempt
            # commits at (Iceberg's data sequence number): equality deletes
            # apply only to files with data_seq < delete_seq, so a retried
            # append that rebases past a merge-on-read commit must re-stamp —
            # a stale lower data_seq would wrongly subject its rows to the
            # racing equality delete. Lost attempts' manifests are orphans
            # reclaimed by expire_snapshots.
            seq = parent.get("sequence", 0) + 1
            if state["seq"] != seq:
                for e in added:
                    e["data_seq"] = seq
                state["ref"] = self._write_manifest(added)
                state["seq"] = seq
            # snap's dict literal evaluates "manifests": manifests_fn(parent)
            # BEFORE unpacking **extra, so this attempt's ref lands in the
            # committed snapshot even after a rebase
            extra_dyn["added_manifests"] = [state["ref"]["path"]]
            return carried + [state["ref"]]

        extra_dyn = {**(extra or {}),
                     "added_manifests": [],
                     "partition_by": partition_by,
                     "sort_by": sort_by,
                     "zorder_by": zorder_by}
        return self._commit("append", added, ddl, manifests_fn,
                            extra=extra_dyn)

    def overwrite(self, df: DataFrame, allow_schema_change: bool = False,
                  sort_by: list[str] | None = None,
                  sort_files: int | None = None,
                  bloom_cols: list[str] | None = None) -> dict:
        """Replace-all commit (Iceberg ``overwrite``): new snapshot lists
        ONLY this df's manifest. Old files stay on disk for time travel.
        ``sort_by``/``sort_files``/``bloom_cols`` as in :meth:`append`;
        left unset, the table's previous sort order is reapplied so a
        versioned table (e.g. publish_curated) keeps its clustering across
        versions without every caller re-stating it. A lost commit race
        retries cleanly: overwrite replaces whatever is current."""
        prev = self._raw_snapshot()
        ddl = self._check_schema(prev, _ddl(df), allow_schema_change)
        has_data = bool(prev.get("manifests") or prev.get("files"))
        spec = prev.get("partition_by") if has_data else None
        if sort_by is None and has_data:
            sort_by = prev.get("sort_by")
        added = self._write_data_files(df, partition_by=spec,
                                       sort_by=sort_by, sort_files=sort_files,
                                       bloom_cols=bloom_cols)
        # planned data_seq; a lost race lands later, but that staleness is
        # harmless here — overwrite DROPS every prior delete manifest, and
        # any future equality delete carries a strictly higher delete_seq
        for e in added:
            e["data_seq"] = prev.get("sequence", 0) + 1
        refs = [self._write_manifest(added)] if added else []
        return self._commit("overwrite", added, ddl, lambda _parent: refs,
                            delete_manifests_fn=lambda _parent: [],
                            extra={"added_manifests": [r["path"] for r in refs],
                                   "partition_by": spec, "sort_by": sort_by})

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
        # read WITH merge-on-read deletes applied, then drop every delete
        # manifest: compaction is where delete files get folded in
        # physically (Iceberg rewrite_data_files' delete compaction)
        df = self._read_with_deletes(
            spark, prev["schema"], prev["files"], prev).coalesce(target_files)
        added = self._write_data_files(df, partition_by=spec)
        for e in added:
            e["data_seq"] = prev.get("sequence", 0) + 1
        refs = [self._write_manifest(added)] if added else []
        return self._commit("replace", added, prev["schema"],
                            lambda _parent: refs,
                            retryable=False,
                            planned_parent=(prev.get("sequence", 0),
                                            prev.get("snapshot_id")),
                            delete_manifests_fn=lambda _parent: [],
                            extra={"added_manifests": [],
                                   "partition_by": spec})

    def rewrite_manifests(self) -> dict:
        """Metadata-only manifest-list compaction (Iceberg
        ``rewrite_manifests``): fold the current manifest list into ONE
        manifest in a new snapshot. Data files are untouched and no rows
        are added — incremental consumers skip it — but subsequent commits
        and scans plan against one manifest instead of one per historical
        append. At streaming-ingest rates this bounds manifest-list growth
        the same way compact() bounds file growth."""
        prev = self._raw_snapshot()
        entries = self._snap_files(prev)
        ref = self._write_manifest(entries) if entries else None
        return self._commit(
            "rewrite-manifests", [], prev["schema"],
            lambda _parent: [ref] if ref else [],
            retryable=False,
            planned_parent=(prev.get("sequence", 0),
                            prev.get("snapshot_id")),
            extra={"added_manifests": [],
                   "partition_by": prev.get("partition_by"),
                   "sort_by": prev.get("sort_by")})

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
                s = self._raw_snapshot(seq)
                if s.get("stream_query") == query_tag:
                    if int(s["stream_epoch"]) >= int(epoch_id):
                        return  # retried epoch: already committed
                    break
            self.append(batch_df, extra={"stream_query": query_tag,
                                         "stream_epoch": int(epoch_id)})

        return sink

    def delete_where(self, spark: SparkSession,
                     predicate: tuple[str, str, object],
                     mode: str = "cow") -> dict:
        """Row-level DELETE (Iceberg ``DELETE FROM … WHERE``), two modes:

        ``mode="cow"`` (copy-on-write, the default): manifest-list
        aggregates prune whole manifests, per-file stats select the
        candidate files that MAY contain matching rows; ONLY those are
        read and rewritten with the complement filter. Untouched manifests
        carry over by reference; a manifest that loses some files is
        rewritten minus them (O(manifest), not O(table)). Best when
        deletes are bulky (a whole partition): reads stay join-free.

        ``mode="mor"`` (merge-on-read, Iceberg v2 positional delete
        files): matching row positions are written to a small delete file;
        NO data file is rewritten — a 1-row delete into a 10 GB file
        writes O(matching rows) bytes. Readers anti-join the delete rows
        onto exactly the targeted files; :meth:`compact` folds deletes in
        physically. Best for point deletes into hot partitions at 100 TB,
        where CoW would rewrite whole files per deleted row.

        Rows where the predicate is NULL are retained in both modes (SQL
        DELETE semantics: only rows where the condition is TRUE are
        removed). Old files stay on disk for time travel
        (expire_snapshots reclaims).

        Reference analogue: idempotent deterministic-id re-runs
        (deepdoctection annotation.py:154-169) — here made transactional.
        """
        if mode not in ("cow", "mor"):
            raise ValueError(f"mode must be 'cow' or 'mor', got {mode!r}")
        if mode == "mor":
            return self._delete_where_mor(spark, predicate)
        prev = self._raw_snapshot()
        refs = self._carry_manifests(prev)
        if not refs:
            return self.snapshot()
        spec = prev.get("partition_by")
        col, op, lit = predicate
        carried_refs: list[dict] = []
        candidates: list[dict] = []
        n_carried_files = 0
        for ref in refs:
            if not self._manifest_may_match(ref, predicate):
                carried_refs.append(ref)
                n_carried_files += ref["n_files"]
                continue
            entries = self._load_manifest(ref["path"])
            cand = [e for e in entries
                    if self._file_may_match(e, predicate)]
            if not cand:
                carried_refs.append(ref)
                n_carried_files += ref["n_files"]
                continue
            candidates.extend(cand)
            cand_paths = {e["path"] for e in cand}
            survivors = [e for e in entries if e["path"] not in cand_paths]
            n_carried_files += len(survivors)
            if survivors:
                carried_refs.append(self._write_manifest(survivors))
        added: list[dict] = []
        if candidates:
            # apply pending MoR deletes while rewriting: the new files
            # materialize their effect, and their fresh data_seq/path keeps
            # the carried delete manifests from re-applying to them
            df = self._read_with_deletes(spark, prev["schema"], candidates,
                                         prev)
            kept = df.where(
                ~F.coalesce(_pred_column(col, op, lit), F.lit(False)))
            added = [f for f in self._write_data_files(kept, partition_by=spec)
                     if f["rows"] > 0]
            for e in added:
                e["data_seq"] = prev.get("sequence", 0) + 1
        new_refs = [self._write_manifest(added)] if added else []
        return self._commit(
            "delete", added, prev["schema"],
            lambda _parent: carried_refs + new_refs,
            retryable=False,
            planned_parent=(prev.get("sequence", 0),
                            prev.get("snapshot_id")),
            extra={"added_manifests": [r["path"] for r in new_refs],
                   "partition_by": spec, "sort_by": prev.get("sort_by"),
                   "rewrote_files": len(candidates),
                   "carried_files": n_carried_files})

    def _delete_where_mor(self, spark: SparkSession,
                          predicate: tuple[str, str, object]) -> dict:
        """Positional-delete DELETE (see :meth:`delete_where` mode="mor"):
        stats-pruned candidate files are scanned once for matching row
        positions via the parquet reader's generated ``_metadata`` columns
        (no payload rewrite), the (file_path, pos) rows land in a delete
        file, and the commit carries EVERY data manifest by reference —
        data bytes written are O(matching rows)."""
        prev = self._raw_snapshot()
        col, op, lit = predicate
        candidates = self.plan(predicate)["files"]
        if not candidates:
            return self.snapshot()
        # read with pending deletes applied so already-masked rows don't
        # land in the new delete file again (exact delete_rows accounting)
        df = self._read_with_deletes(spark, prev["schema"], candidates,
                                     prev, lineage=True)
        matches = df.where(
            F.coalesce(_pred_column(col, op, lit), F.lit(False))
        ).select(F.col("__ice_file").alias("file_path"),
                 F.col("__ice_pos").alias("pos"))
        dentries = [e for e in self._write_data_files(matches)
                    if e["rows"] > 0]
        if not dentries:
            return self.snapshot()  # predicate matched no live row
        # exact target binding: only files that actually lost rows pay the
        # read-time anti-join (the delete file itself is tiny — reading it
        # back for the distinct set is O(deleted rows))
        targets = sorted(
            r[0] for r in spark.read.parquet(
                *[os.path.join(self.data_dir, e["path"]) for e in dentries]
            ).select("file_path").distinct().collect())
        dels = [{"path": e["path"], "rows": e["rows"], "kind": "pos",
                 "targets": targets, "stats": e.get("stats") or {}}
                for e in dentries]
        dref = self._write_manifest(dels)
        carried = self._carry_manifests(prev)
        return self._commit(
            "delete", [], prev["schema"],
            lambda _parent: carried,
            retryable=False,
            planned_parent=(prev.get("sequence", 0),
                            prev.get("snapshot_id")),
            delete_manifests_fn=lambda parent: (
                parent.get("delete_manifests", []) + [dref]),
            extra={"added_manifests": [],
                   "added_delete_manifests": [dref["path"]],
                   "row_op_mode": "merge-on-read",
                   "partition_by": prev.get("partition_by"),
                   "sort_by": prev.get("sort_by"),
                   "rewrote_files": 0,
                   "carried_files": sum(r["n_files"] for r in carried),
                   "delete_rows": sum(e["rows"] for e in dentries),
                   "delete_targets": len(targets)})

    def merge_upsert(self, spark: SparkSession, source: DataFrame,
                     key_cols: str | list[str], mode: str = "cow") -> dict:
        """MERGE (Iceberg ``MERGE INTO`` upsert): target rows whose key
        matches a source row are REPLACED by the source row; source rows
        with unmatched keys are INSERTED.

        ``mode="mor"`` (merge-on-read, Iceberg v2 equality deletes) never
        reads or rewrites a target file: the source lands as new data
        files and the matched keys are masked by an equality-delete file
        applied at read to older data files — commit cost O(source), the
        shape for continuous small upserts into a 100 TB table. See
        :meth:`_merge_upsert_mor`.

        ``mode="cow"`` (the default): candidate files are
        pruned by intersecting the manifest stats of EVERY key column with
        the source's key span (a file is untouched if ANY key column proves
        disjointness — compound keys prune far better than key[0] alone),
        and, for small sources, by per-file Bloom sidecars on the key
        columns. Date/timestamp keys compare in the same ISO-string space
        the footer stats are stored in. Only candidates are read,
        anti-joined against the source keys, and rewritten together with
        the source — untouched files carry over by reference (manifests
        that lose files are rewritten minus them). The anti-join is a plain
        Spark join, so Catalyst broadcasts a small source and sort-merges a
        big one — the same physical strategy Iceberg's Spark MERGE uses."""
        if mode not in ("cow", "mor"):
            raise ValueError(f"mode must be 'cow' or 'mor', got {mode!r}")
        if mode == "mor":
            return self._merge_upsert_mor(spark, source, key_cols)
        prev = self._raw_snapshot()
        ddl = self._check_schema(prev, _ddl(source), False)
        has_data = bool(prev.get("manifests") or prev.get("files"))
        spec = prev.get("partition_by") if has_data else None
        keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
        bounds = source.agg(
            *[F.min(k).alias(f"lo_{i}") for i, k in enumerate(keys)],
            *[F.max(k).alias(f"hi_{i}") for i, k in enumerate(keys)],
        ).first()
        if bounds[0] is None:
            return self.snapshot()  # empty source: MERGE is a no-op
        lo = {k: _norm_lit(bounds[i]) for i, k in enumerate(keys)}
        hi = {k: _norm_lit(bounds[len(keys) + i])
              for i, k in enumerate(keys)}
        bloom_keys = self._collect_small_keys(source, keys)

        def file_disjoint(entry: dict) -> bool:
            for k in keys:
                s = entry["stats"].get(k)
                if s is not None and (s["max"] < lo[k] or s["min"] > hi[k]):
                    return True  # this key column alone proves no overlap
            if bloom_keys is not None:
                for k in keys:
                    side = (entry.get("bloom") or {}).get(k)
                    if side is None:
                        continue
                    blob = self._load_bloom(side)
                    if not any(_bloom_may_contain(blob, str(kv[k]))
                               for kv in bloom_keys):
                        return True  # no source key can live in this file
            return False

        carried_refs: list[dict] = []
        candidates: list[dict] = []
        n_carried_files = 0
        for ref in self._carry_manifests(prev):
            m_stats = ref.get("stats") or {}
            if any(k in m_stats
                   and (m_stats[k]["max"] < lo[k] or m_stats[k]["min"] > hi[k])
                   for k in keys):
                carried_refs.append(ref)  # whole manifest out of key range
                n_carried_files += ref["n_files"]
                continue
            entries = self._load_manifest(ref["path"])
            cand = [e for e in entries if not file_disjoint(e)]
            if not cand:
                carried_refs.append(ref)
                n_carried_files += ref["n_files"]
                continue
            candidates.extend(cand)
            cand_paths = {e["path"] for e in cand}
            survivors = [e for e in entries if e["path"] not in cand_paths]
            n_carried_files += len(survivors)
            if survivors:
                carried_refs.append(self._write_manifest(survivors))
        if candidates:
            tgt = self._read_with_deletes(spark, prev["schema"], candidates,
                                          prev)
            survivors_df = tgt.join(
                source.select(*keys).distinct(), on=keys, how="left_anti")
            merged = survivors_df.unionByName(source)
        else:
            merged = source
        added = [f for f in self._write_data_files(merged, partition_by=spec)
                 if f["rows"] > 0]
        for e in added:
            e["data_seq"] = prev.get("sequence", 0) + 1
        new_refs = [self._write_manifest(added)] if added else []
        return self._commit(
            "merge", added, ddl,
            lambda _parent: carried_refs + new_refs,
            retryable=False,
            planned_parent=(prev.get("sequence", 0),
                            prev.get("snapshot_id")),
            extra={"added_manifests": [r["path"] for r in new_refs],
                   "partition_by": spec, "sort_by": prev.get("sort_by"),
                   "rewrote_files": len(candidates),
                   "carried_files": n_carried_files})

    def _merge_upsert_mor(self, spark: SparkSession, source: DataFrame,
                          key_cols: str | list[str]) -> dict:
        """Equality-delete MERGE (see :meth:`merge_upsert` mode="mor"):
        the source lands as new data files (stamped with this commit's
        data_seq) and ONE equality-delete file of the distinct source key
        tuples masks matching rows in every OLDER data file
        (``data_seq < delete_seq``) at read. No target file is read or
        rewritten; per-file key-range disjointness against the delete
        file's footer stats keeps non-overlapping files on the clean scan
        path. Incremental consumers see exactly the source rows (the only
        added data manifest)."""
        prev = self._raw_snapshot()
        ddl = self._check_schema(prev, _ddl(source), False)
        has_data = bool(prev.get("manifests") or prev.get("files"))
        spec = prev.get("partition_by") if has_data else None
        keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
        for k in keys:
            if k not in source.columns:
                raise ValueError(f"key column {k!r} not in source")
        planned_seq = prev.get("sequence", 0) + 1
        added = [f for f in self._write_data_files(source, partition_by=spec)
                 if f["rows"] > 0]
        if not added:
            return self.snapshot()  # empty source: MERGE is a no-op
        for e in added:
            e["data_seq"] = planned_seq
        new_data_ref = self._write_manifest(added)
        dref = None
        n_delete_rows = 0
        if has_data:
            dkeys = source.select(*keys).distinct()
            dentries = [e for e in self._write_data_files(dkeys)
                        if e["rows"] > 0]
            dels = [{"path": e["path"], "rows": e["rows"], "kind": "eq",
                     "eq_cols": keys, "delete_seq": planned_seq,
                     "stats": e.get("stats") or {}} for e in dentries]
            n_delete_rows = sum(d["rows"] for d in dels)
            dref = self._write_manifest(dels) if dels else None
        carried = self._carry_manifests(prev)
        return self._commit(
            "merge", added, ddl,
            lambda _parent: carried + [new_data_ref],
            retryable=False,
            planned_parent=(prev.get("sequence", 0),
                            prev.get("snapshot_id")),
            delete_manifests_fn=lambda parent: (
                parent.get("delete_manifests", [])
                + ([dref] if dref else [])),
            extra={"added_manifests": [new_data_ref["path"]],
                   "added_delete_manifests": [dref["path"]] if dref else [],
                   "row_op_mode": "merge-on-read",
                   "partition_by": spec, "sort_by": prev.get("sort_by"),
                   "rewrote_files": 0,
                   "carried_files": sum(r["n_files"] for r in carried),
                   "delete_rows": n_delete_rows})

    _MERGE_BLOOM_MAX_KEYS = 1024

    def _collect_small_keys(self, source: DataFrame,
                            keys: list[str]) -> list[dict] | None:
        """Distinct source key tuples when there are few enough to test
        against per-file Blooms (point-update pattern); None for large
        sources — collecting their keyspace would move the join driver-side,
        which is exactly the anti-pattern the anti-join avoids."""
        rows = (source.select(*keys).distinct()
                .limit(self._MERGE_BLOOM_MAX_KEYS + 1).collect())
        if len(rows) > self._MERGE_BLOOM_MAX_KEYS:
            return None
        return [r.asDict() for r in rows]

    def _live_sets(
        self, seqs: set[int]
    ) -> tuple[set[str], set[str], set[str]]:
        """(data-file rels, Bloom-sidecar rels, manifest filenames)
        referenced by the given main-branch sequences PLUS every snapshot of
        every branch — branch snapshots share data/manifests with main, so
        anything any branch references stays live until the branch is
        deleted. Merge-on-read delete files live in data/ and their
        manifests in metadata/; both are live while a referencing snapshot
        lists them."""
        live: set[str] = set()
        live_sidecars: set[str] = set()
        live_manifests: set[str] = set()
        live_raws = [self._raw_snapshot(seq) for seq in seqs]
        for bname in self.branches():
            b = IceTable(self.path, branch=bname)
            live_raws.extend(b._raw_snapshot(s) for s in b._committed_seqs())
        for raw in live_raws:
            live_manifests.update(
                m["path"] for m in raw.get("manifests", []))
            for f in self._snap_files(raw):
                live.add(f["path"])
                live_sidecars.update((f.get("bloom") or {}).values())
            live_manifests.update(
                m["path"] for m in raw.get("delete_manifests", []))
            for d in self._delete_entries(raw):
                live.add(d["path"])
        return live, live_sidecars, live_manifests

    def remove_orphans(self, dry_run: bool = False) -> dict:
        """Iceberg ``remove_orphan_files``: find (and unless ``dry_run``,
        delete) physical files under the table location that NO committed
        snapshot on any branch references. Orphans accumulate from torn
        writes and lost optimistic-commit races — the loser of a commit race
        rebases, but the data files and manifests of its failed attempt are
        never referenced by any snapshot (see ``_commit``). Unlike
        :meth:`expire_snapshots` (which reclaims files referenced ONLY by
        expired snapshots and destroys time travel to them), orphan removal
        never changes what ANY snapshot reads — safe on a live table, and at
        100 TB it is routine maintenance after crashed writer fleets.

        Main-handle-only for the same shared-directory reason as expiry:
        a branch handle's snapshot view is partial."""
        if self.branch_name is not None:
            raise ValueError(
                "remove_orphans must run on the main table handle, not a "
                f"branch ({self.branch_name!r}): data files and manifests "
                "are shared across branches and a branch-local view would "
                "misclassify files referenced only by main"
            )
        live, live_sidecars, live_manifests = self._live_sets(
            set(self._committed_seqs()))
        orphan_data: list[str] = []
        if os.path.isdir(self.data_dir):
            for root, _dirs, files in os.walk(self.data_dir):
                for fn in files:
                    full = os.path.join(root, fn)
                    rel = os.path.relpath(full, self.data_dir)
                    if rel not in live:
                        orphan_data.append(rel)
        puffin = os.path.join(self.meta_dir, "puffin")
        orphan_sidecars = [
            fn for fn in (os.listdir(puffin) if os.path.isdir(puffin) else [])
            if f"puffin/{fn}" not in live_sidecars
        ]
        orphan_manifests = [
            fn for fn in os.listdir(self.meta_dir)
            if fn.startswith("manifest-") and fn.endswith(".json")
            and fn not in live_manifests
        ]
        if not dry_run:
            for rel in orphan_data:
                os.remove(os.path.join(self.data_dir, rel))
            for root, _dirs, files in os.walk(self.data_dir, topdown=False):
                if not os.listdir(root) and root != self.data_dir:
                    os.rmdir(root)
            for fn in orphan_sidecars:
                os.remove(os.path.join(puffin, fn))
            for fn in orphan_manifests:
                os.remove(os.path.join(self.meta_dir, fn))
        return {
            "orphan_data_files": sorted(orphan_data),
            "orphan_sidecars": sorted(orphan_sidecars),
            "orphan_manifests": sorted(orphan_manifests),
            "n_orphans": (len(orphan_data) + len(orphan_sidecars)
                          + len(orphan_manifests)),
            "dry_run": dry_run,
        }

    def expire_snapshots(self, keep_last: int = 1) -> dict:
        """Snapshot expiry (Iceberg ``expire_snapshots``): drop all but the
        newest ``keep_last`` snapshots and physically delete the manifests
        and data files referenced ONLY by expired ones. Time travel to
        expired sequences is gone afterwards — that is the contract; after
        overwrite/compaction/delete churn, unreferenced files dominate
        storage, and at 100 TB expiry IS the storage-reclamation path.

        Main-handle-only: data/, puffin/ and manifests are SHARED across
        branches, but a branch handle resolves snapshots against its
        branch-local dir — running the deletion sweep from one would treat
        everything referenced only by main as dead. (Main already retains
        everything any branch references, so expiry from main is safe.)"""
        if self.branch_name is not None:
            raise ValueError(
                "expire_snapshots must run on the main table handle, not a "
                f"branch ({self.branch_name!r}): data files and manifests "
                "are shared across branches and the sweep would delete "
                "files referenced only by main"
            )
        seqs = self._committed_seqs()
        retain = set(seqs[-keep_last:]) if keep_last > 0 else set()
        retain.update(self.tags().values())  # named refs pin their snapshots
        live, live_sidecars, live_manifests = self._live_sets(retain)
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
        deleted_manifests = 0
        for fn in os.listdir(self.meta_dir):
            if (fn.startswith("manifest-") and fn.endswith(".json")
                    and fn not in live_manifests):
                os.remove(os.path.join(self.meta_dir, fn))
                deleted_manifests += 1
        expired = 0
        for seq in seqs:
            if seq not in retain:
                os.remove(self._snap_path(seq))
                expired += 1
        return {"expired_snapshots": expired, "deleted_files": deleted_files,
                "deleted_sidecars": deleted_sidecars,
                "deleted_manifests": deleted_manifests,
                "retained_seqs": sorted(retain)}

    # -- named refs (Iceberg tags) ----------------------------------------

    @property
    def _refs_dir(self) -> str:
        return os.path.join(self.meta_dir, "refs")

    def tag(self, name: str, seq: int | None = None) -> dict:
        """Create an immutable named snapshot ref (Iceberg tag): a version
        a consumer can read by name ('v1', 'prod') while the table moves on.
        Tagged snapshots are RETAINED by expire_snapshots regardless of
        keep_last — the Iceberg ref-retention contract — so 'pin the corpus
        a model trained on' survives storage reclamation. Exclusive-create:
        re-tagging an existing name raises (delete_tag first)."""
        if not re.fullmatch(r"[A-Za-z0-9._-]{1,64}", name):
            raise ValueError(f"bad tag name {name!r}")
        seq = self.current_seq() if seq is None else seq
        self._raw_snapshot(seq)  # must exist
        os.makedirs(self._refs_dir, exist_ok=True)
        ref = {"name": name, "seq": seq,
               "ts_ms": int(time.time() * 1000)}
        with open(os.path.join(self._refs_dir, f"{name}.json"), "x") as f:
            json.dump(ref, f)
        return ref

    def tags(self) -> dict[str, int]:
        """{tag name: snapshot seq} for all named refs."""
        if not os.path.isdir(self._refs_dir):
            return {}
        out = {}
        for fn in sorted(os.listdir(self._refs_dir)):
            if fn.endswith(".json"):
                with open(os.path.join(self._refs_dir, fn)) as f:
                    ref = json.load(f)
                out[ref["name"]] = ref["seq"]
        return out

    def delete_tag(self, name: str) -> None:
        path = os.path.join(self._refs_dir, f"{name}.json")
        if not os.path.exists(path):
            raise ValueError(f"no such tag {name!r}")
        os.remove(path)

    # -- branches (Iceberg branch refs + write-audit-publish) -------------

    def create_branch(self, name: str) -> "IceTable":
        """Fork a branch at the CURRENT snapshot: the branch gets its own
        snapshot lineage (seeded with a copy of the current snap file, so
        time travel/incremental reads work within the branch) while data
        files, manifests and Bloom sidecars stay shared — a branch commit
        writes only branch-local snapshot JSON. This is the Iceberg WAP
        shape: write to the branch, audit it, then :meth:`fast_forward`
        main. Returns a handle onto the branch."""
        if self.branch_name is not None:
            raise ValueError("create_branch from the main handle only")
        if not re.fullmatch(r"[A-Za-z0-9._-]{1,64}", name):
            raise ValueError(f"bad branch name {name!r}")
        bdir = os.path.join(self.meta_dir, "branches", name)
        if os.path.isdir(bdir):
            raise ValueError(f"branch {name!r} already exists")
        os.makedirs(bdir)
        seq = self.current_seq()
        base = self._raw_snapshot(seq)
        if seq > 0:
            shutil.copyfile(self._snap_path(seq),
                            os.path.join(bdir, f"snap-{seq:010d}.json"))
        with open(os.path.join(bdir, "base.json"), "w") as f:
            json.dump({"main_seq": seq,
                       "main_snapshot_id": base["snapshot_id"]}, f)
        return IceTable(self.path, branch=name)

    def branch(self, name: str) -> "IceTable":
        """Handle onto an existing branch."""
        if not os.path.isdir(os.path.join(self.meta_dir, "branches", name)):
            raise ValueError(f"no such branch {name!r}")
        return IceTable(self.path, branch=name)

    def branches(self) -> list[str]:
        broot = os.path.join(self.meta_dir, "branches")
        return sorted(os.listdir(broot)) if os.path.isdir(broot) else []

    def delete_branch(self, name: str) -> None:
        """Drop a branch ref (its exclusive data files become reclaimable
        by the next expire_snapshots)."""
        bdir = os.path.join(self.meta_dir, "branches", name)
        if not os.path.isdir(bdir):
            raise ValueError(f"no such branch {name!r}")
        shutil.rmtree(bdir)

    def fast_forward(self, name: str) -> dict:
        """Publish a branch to main (Iceberg ``fast_forward``): commit the
        branch's CURRENT manifest list as a new main snapshot — metadata
        only, no data movement. Strict WAP safety: refuses when main has
        moved past the branch's fork point (the audited data was staged
        against a main that no longer exists → re-branch and re-audit)."""
        if self.branch_name is not None:
            raise ValueError("fast_forward from the main handle only")
        bdir = os.path.join(self.meta_dir, "branches", name)
        if not os.path.isdir(bdir):
            raise ValueError(f"no such branch {name!r}")
        with open(os.path.join(bdir, "base.json")) as f:
            base = json.load(f)
        cur = self._raw_snapshot()
        if cur["snapshot_id"] != base["main_snapshot_id"]:
            raise CommitConflict(
                f"fast_forward({name!r}): main moved past the branch fork "
                f"point (forked at {base['main_snapshot_id']}, main is at "
                f"{cur['snapshot_id']}); re-branch, re-audit, re-publish")
        b = IceTable(self.path, branch=name)
        tip = b._raw_snapshot()
        refs = self._carry_manifests(tip)
        return self._commit(
            "fast-forward", [], tip["schema"], lambda _parent: refs,
            delete_manifests_fn=lambda _parent: tip.get(
                "delete_manifests", []),
            extra={"added_manifests": [], "from_branch": name,
                   "partition_by": tip.get("partition_by"),
                   "sort_by": tip.get("sort_by")})

    def rollback(self, seq: int) -> dict:
        """Commit a new snapshot replaying an ancestor's manifest list
        (history stays append-only; nothing is deleted)."""
        target = self._raw_snapshot(seq)
        refs = self._carry_manifests(target)
        return self._commit("rollback", [], target["schema"],
                            lambda _parent: refs,
                            delete_manifests_fn=lambda _parent: target.get(
                                "delete_manifests", []),
                            extra={"added_manifests": [],
                                   "partition_by": target.get("partition_by"),
                                   "sort_by": target.get("sort_by")})

    # -- reads -----------------------------------------------------------

    def _paths(self, files: list[dict]) -> list[str]:
        return [os.path.join(self.data_dir, f["path"]) for f in files]

    def _reader(self, spark: SparkSession, schema: str):
        """basePath keeps Hive-partition discovery working on explicit file
        lists, so identity-partition columns re-derive from the path; it is
        harmless for unpartitioned files."""
        return spark.read.schema(schema).option("basePath", self.data_dir)

    def _rel_file_expr(self):
        """Column expression: a scanned row's data-file path relative to
        data/ — the same key positional delete files store. Both the
        delete writer and the reader derive it with THIS expression, so
        the anti-join key is consistent by construction."""
        pat = re.escape(os.path.abspath(self.data_dir) + "/")
        return F.element_at(F.split(F.col("_metadata.file_path"), pat), -1)

    def _read_files(self, spark: SparkSession, schema: str,
                    files: list[dict], lineage: bool = False) -> DataFrame:
        """Read an explicit manifest-entry list, PARTITION-EVOLUTION-safe:
        Hive-layout entries (they carry a manifest partition value) derive
        the partition column from the path via basePath discovery;
        pre-evolution flat entries carry the column in the data and read
        without basePath (Spark rejects a single mixed-depth read). The two
        eras union by name — one extra scan node, no shuffle.

        ``lineage`` adds ``__ice_file`` (path relative to data/) and
        ``__ice_pos`` (row position within the file) from the scan's
        ``_metadata`` columns — generated JVM-side by the parquet reader,
        no payload cost — the binding keys for positional deletes."""

        def tag(df: DataFrame) -> DataFrame:
            if not lineage:
                return df
            return df.select(
                "*",
                self._rel_file_expr().alias("__ice_file"),
                F.col("_metadata.row_index").alias("__ice_pos"))

        hive = [f for f in files if f.get("partition")]
        flat = [f for f in files if not f.get("partition")]
        parts = []
        if flat:
            parts.append(
                tag(spark.read.schema(schema).parquet(*self._paths(flat))))
        if hive:
            parts.append(
                tag(self._reader(spark, schema).parquet(*self._paths(hive))))
        df = parts[0]
        for extra_df in parts[1:]:
            df = df.unionByName(extra_df)
        return df

    # Delete sides at or below this many rows get an explicit broadcast
    # hint: a point delete's (file, pos) set is model-sized next to the
    # data scan it masks, and a shuffle there would dominate the read.
    _BROADCAST_DELETE_ROWS = 4_000_000

    def _delete_entries(self, raw: dict) -> list[dict]:
        """Delete-file entries (positional + equality) reachable from a
        snapshot's delete manifest list."""
        out: list[dict] = []
        for ref in raw.get("delete_manifests", []):
            out.extend(self._load_manifest(ref["path"]))
        return out

    def _read_with_deletes(self, spark: SparkSession, schema: str,
                           files: list[dict], raw: dict,
                           lineage: bool = False) -> DataFrame:
        """Delete-aware read — the Iceberg v2 merge-on-read reader shape:
        each file is bound to its applicable delete files at PLAN time
        (positional deletes by exact target path; equality deletes by
        ``data_seq < delete_seq`` plus key-range disjointness from the
        footer stats), files with no applicable delete scan clean, and
        only the bound files pay the anti-joins. Tables with no delete
        manifests take the identical code path as before MoR existed."""
        dels = self._delete_entries(raw)
        if not files:
            return spark.createDataFrame(
                [], schema=schema or "dummy int")
        tsets = _pos_target_sets(dels)

        def applies(f: dict, d: dict) -> bool:
            return _delete_applies(f, d, tsets)

        dirty = [f for f in files if any(applies(f, d) for d in dels)]
        if not dirty:
            return self._read_files(spark, schema, files, lineage=lineage)
        clean = [f for f in files
                 if not any(applies(f, d) for d in dels)]
        df = self._read_files(spark, schema, dirty, lineage=True)
        pos = [d for d in dels if d["kind"] == "pos"
               and any(applies(f, d) for f in dirty)]
        eqs = [d for d in dels if d["kind"] == "eq"
               and any(applies(f, d) for f in dirty)]
        if pos:
            pdel = spark.read.parquet(
                *[os.path.join(self.data_dir, d["path"]) for d in pos]
            ).select(F.col("file_path").alias("__ice_file"),
                     F.col("pos").alias("__ice_pos"))
            if sum(d["rows"] for d in pos) <= self._BROADCAST_DELETE_ROWS:
                pdel = F.broadcast(pdel)
            df = df.join(pdel, ["__ice_file", "__ice_pos"], "left_anti")
        if eqs:
            # per-row data_seq via a files-sized broadcast map — the same
            # per-task state an Iceberg reader carries per FileScanTask
            seq_map = spark.createDataFrame(
                [(f["path"], int(f.get("data_seq") or 0)) for f in dirty],
                "__ice_file string, __ice_dseq long")
            df = df.join(F.broadcast(seq_map), "__ice_file", "left")
            # one equality delete spans several key files (the distinct-key
            # write shuffles); group by (delete_seq, eq_cols) so each
            # DELETE pays ONE anti-join however many files hold its keys
            groups: dict[tuple, list[dict]] = {}
            for d in eqs:
                groups.setdefault(
                    (int(d["delete_seq"]), tuple(d["eq_cols"])), []
                ).append(d)
            for (dseq, cols), grp in sorted(groups.items()):
                ed = spark.read.parquet(
                    *[os.path.join(self.data_dir, d["path"]) for d in grp]
                ).select(*cols)
                if sum(d["rows"] for d in grp) <= self._BROADCAST_DELETE_ROWS:
                    ed = F.broadcast(ed)
                # equality deletes match NULL keys null-safely (Iceberg
                # equality-delete semantics); the data_seq guard keeps
                # rows written after the delete untouched
                cond = F.col("__ice_dseq") < F.lit(dseq)
                for k in cols:
                    cond = cond & df[k].eqNullSafe(ed[k])
                df = df.join(ed, cond, "left_anti")
            df = df.drop("__ice_dseq")
        if not lineage:
            df = df.drop("__ice_file", "__ice_pos")
        if clean:
            df = self._read_files(
                spark, schema, clean, lineage=lineage).unionByName(df)
        return df

    def read(self, spark: SparkSession, seq: int | None = None,
             tag: str | None = None) -> DataFrame:
        """Snapshot read (current, time travel to ``seq``, or a named
        ``tag`` — VERSION AS OF semantics by name)."""
        if tag is not None:
            if seq is not None:
                raise ValueError("pass seq or tag, not both")
            refs = self.tags()
            if tag not in refs:
                raise ValueError(f"no such tag {tag!r}")
            seq = refs[tag]
        snap = self.snapshot(seq)
        if not snap["files"]:
            return spark.createDataFrame([], schema=snap["schema"] or "dummy int")
        return self._read_with_deletes(spark, snap["schema"], snap["files"],
                                       snap)

    def read_incremental(self, spark: SparkSession, after_seq: int,
                         until_seq: int | None = None) -> DataFrame:
        """Rows in files ADDED by snapshots in (after_seq, until_seq] — the
        incremental-consumption pattern (overwrite/rollback snapshots
        contribute only their newly added files), resolved from each
        snapshot's added manifests without materializing any file list."""
        until_seq = self.current_seq() if until_seq is None else until_seq
        snap = self._raw_snapshot(until_seq)
        added: list[dict] = []
        for seq in range(after_seq + 1, until_seq + 1):
            s = self._raw_snapshot(seq)
            if s["operation"] in ("replace", "rewrite-manifests"):
                continue  # rewrites carry no new rows — skipping them
                # keeps incremental consumers exactly-once
            if "added_manifests" in s:
                for mpath in s["added_manifests"]:
                    added.extend(self._load_manifest(mpath))
            else:  # legacy inline snapshot
                by_path = {f["path"]: f for f in s["files"]}
                added += [by_path[p] for p in s.get("added", [])
                          if p in by_path]
        if not added:
            return spark.createDataFrame([], schema=snap["schema"] or "dummy int")
        # the until-snapshot's deletes apply to the added files too, so an
        # incremental consumer never re-surfaces rows a later-in-window
        # merge-on-read delete already masked
        return self._read_with_deletes(spark, snap["schema"], added, snap)

    def _bloom_cache_get(self):
        cache = getattr(self, "_bloom_cache", None)
        if cache is None:
            cache = self._bloom_cache = {}
        return cache

    def _load_bloom(self, side: str) -> dict:
        cache = self._bloom_cache_get()
        if side not in cache:
            with open(os.path.join(self.meta_dir, side)) as f:
                blob = json.load(f)
            # decode once per table handle: planning probes every candidate
            # file's sidecar, so per-probe b64 decode would be O(files) work
            # repeated per predicate
            blob["bits"] = base64.b64decode(blob["bits"])
            cache[side] = blob
        return cache[side]

    def _manifest_may_match(self, ref: dict, predicate: tuple) -> bool:
        """Manifest-level survival test from the manifest-LIST aggregates
        alone (no manifest load): covered partition values, then aggregate
        min/max. Conservative: missing metadata always survives."""
        col, op, lit = predicate
        if op in ("isnull", "notnull"):
            s = (ref.get("stats") or {}).get(col)
            if op == "isnull" and s is not None and s.get("nulls", 1) == 0:
                return False  # zero nulls across every file in the manifest
            return True
        parts = ref.get("partitions") or {}
        if col in parts:
            if op == "=" and str(lit) not in parts[col]:
                return False
            if op == "in" and not {str(v) for v in lit} & set(parts[col]):
                return False
            return True
        s = (ref.get("stats") or {}).get(col)
        if s is None:
            return True
        return _range_may_match(s["min"], s["max"], op, _norm_lit(lit))

    def _file_may_match(self, f: dict, predicate: tuple) -> bool:
        """Conservative single-predicate survival test for one manifest
        entry: identity-partition value, then Bloom sidecar (equality on a
        bloom_cols column — the point-lookup path min/max can't serve), then
        footer min/max. A file with no usable metadata always survives."""
        col, op, lit = predicate
        if op in ("isnull", "notnull"):
            # null pruning from the footer null counts: nulls == 0 means no
            # IS NULL row can exist in this file. notnull stays conservative
            # (an all-null column records no min/max, hence no stats entry).
            s = f["stats"].get(col)
            if op == "isnull" and s is not None and s.get("nulls", 1) == 0:
                return False
            return True
        part = f.get("partition") or {}
        if col in part:
            # identity-partition pruning: exact (set-)match only; range ops
            # on the dir-string would be lexicographic lies for numeric
            # values, so they conservatively keep the file
            if op == "=":
                return part[col] == str(lit)
            if op == "in":
                return part[col] in {str(v) for v in lit}
            return True
        if op == "=":
            side = (f.get("bloom") or {}).get(col)
            if side is not None and not _bloom_may_contain(
                    self._load_bloom(side), str(lit)):
                return False  # definite miss: no false negatives
        elif op == "in":
            side = (f.get("bloom") or {}).get(col)
            if side is not None and not any(
                    _bloom_may_contain(self._load_bloom(side), str(v))
                    for v in lit):
                return False
        s = f["stats"].get(col)
        if s is None:
            return True
        return _range_may_match(s["min"], s["max"], op, _norm_lit(lit))

    def plan(self, predicate=None, seq: int | None = None) -> dict:
        """Two-level scan planning detail: ``{"files", "pruned_files",
        "scanned_manifests", "pruned_manifests"}``. A pruned manifest is
        dropped from the snapshot's manifest-list aggregates alone — its
        file entries are never read; its files count as pruned."""
        raw = self._raw_snapshot(seq)
        preds = ([] if predicate is None
                 else predicate if isinstance(predicate, list)
                 else [predicate])
        if "files" in raw:  # legacy inline snapshot: single-level planning
            keep = [f for f in raw["files"]
                    if all(self._file_may_match(f, p) for p in preds)]
            return {"files": keep,
                    "pruned_files": len(raw["files"]) - len(keep),
                    "scanned_manifests": 0, "pruned_manifests": 0}
        keep: list[dict] = []
        pruned_files = scanned_m = pruned_m = 0
        for ref in raw.get("manifests", []):
            if preds and not all(self._manifest_may_match(ref, p)
                                 for p in preds):
                pruned_m += 1
                pruned_files += ref["n_files"]
                continue
            scanned_m += 1
            for f in self._load_manifest(ref["path"]):
                if all(self._file_may_match(f, p) for p in preds):
                    keep.append(f)
                else:
                    pruned_files += 1
        return {"files": keep, "pruned_files": pruned_files,
                "scanned_manifests": scanned_m, "pruned_manifests": pruned_m}

    def plan_files(self, predicate=None,
                   seq: int | None = None) -> tuple[list[dict], int]:
        """Manifest-level scan planning: (surviving files, pruned count).
        ``predicate`` = (column, op, literal) with op in =, <, <=, >, >=,
        in (literal = a value list) — or a LIST of such triples, conjunctive
        (a file survives only if it may match EVERY predicate). Conservative: a file with no stats for a
        column always survives that predicate. See :meth:`plan` for the
        manifest-level pruning detail."""
        p = self.plan(predicate, seq)
        return p["files"], p["pruned_files"]

    def scan(self, spark: SparkSession,
             predicate=None,
             seq: int | None = None) -> DataFrame:
        """Pruned snapshot read: manifests excluded by their list-level
        aggregates and files excluded by manifest metadata (partition
        values, Bloom sidecars, footer min/max) are never given to Spark
        (manifest pruning ABOVE the engine's own row-group pushdown).
        ``predicate`` = one (col, op, lit) triple or a conjunctive list.
        Each predicate is re-applied as a real Column-expression filter so
        results are exact, and Catalyst still pushes it into the surviving
        scans."""
        keep, _pruned = self.plan_files(predicate, seq)
        raw = self._raw_snapshot(seq)
        if not keep:
            return spark.createDataFrame([], schema=raw["schema"] or "dummy int")
        df = self._read_with_deletes(spark, raw["schema"], keep, raw)
        if predicate is not None:
            preds = predicate if isinstance(predicate, list) else [predicate]
            df = df.where(reduce(
                lambda a, b: a & b,
                (_pred_column(col, op, lit) for col, op, lit in preds)))
        return df

    def metadata_agg(self, spark: SparkSession,
                     cols: list[str] | None = None,
                     seq: int | None = None) -> DataFrame:
        """Metadata-only aggregation (Iceberg's metadata-table scan shape):
        per-partition file count, row count, and per-column min/max/null
        count answered ENTIRELY from manifest entries — zero data-file
        reads. At 100 TB this turns ``SELECT count(*) … GROUP BY partition``
        from a full scan into a driver-side walk of O(#files) manifest rows
        (the same rows commit planning already reads).

        Exact-by-construction: footer row counts are exact, and min/max/
        null-count per file are parquet footer statistics merged across
        files. Refuses snapshots that carry merge-on-read delete files
        (their matched rows are unknowable without reading data — compact
        first) and requested columns that some file lacks stats for (a
        stats-less file must never be silently claimed covered)."""
        raw = self._raw_snapshot(seq)
        if self._delete_entries(raw):
            raise ValueError(
                "metadata_agg: snapshot carries merge-on-read delete files; "
                "their effect requires reading data — compact() first")
        cols = cols or []
        groups: dict[str, dict] = {}
        for f in self._snap_files(raw):
            part = f.get("partition") or {}
            key = next(iter(part.values()), "<all>")
            g = groups.setdefault(
                key, {"n_files": 0, "n_rows": 0,
                      **{c: None for c in cols}})
            g["n_files"] += 1
            g["n_rows"] += f["rows"]
            for c in cols:
                s = f.get("stats", {}).get(c)
                if s is None:
                    raise ValueError(
                        f"metadata_agg: file {f['path']} has no footer "
                        f"stats for column {c!r}")
                cur = g[c]
                if cur is None:
                    g[c] = dict(s)
                else:
                    cur["min"] = min(cur["min"], s["min"])
                    cur["max"] = max(cur["max"], s["max"])
                    cur["nulls"] += s.get("nulls", 0)
        rows = [
            tuple([k, g["n_files"], g["n_rows"]]
                  + [v for c in cols
                     for v in (g[c]["min"], g[c]["max"], g[c]["nulls"])])
            for k, g in sorted(groups.items())
        ]
        names = ["partition", "n_files", "n_rows"] + [
            f"{c}_{suffix}" for c in cols
            for suffix in ("min", "max", "nulls")
        ]
        return spark.createDataFrame(rows, names)

    def compaction_plan(self, spark: SparkSession, target_rows: int,
                        stat_col: str, seq: int | None = None,
                        with_paths: bool = False) -> DataFrame:
        """Metadata-only compaction planning (the scheduling half of
        Iceberg's ``rewrite_data_files`` binpack strategy): group the
        snapshot's small files into rewrite bins of ~``target_rows`` rows
        WITHOUT reading any data — the decision of *what to compact* comes
        from the same O(#files) manifest rows commit planning already
        reads, so a maintenance daemon can run it continuously against a
        100 TB table for free and only pay I/O for the bins it accepts.

        Deterministic strategy (differentially testable, unlike a greedy
        first-fit whose output depends on iteration order): files sort by
        (rows DESC, footer-min of ``stat_col`` ASC — a total order, since
        paths are not stable identities), files already at/over
        ``target_rows`` are excluded with ``bin_id = -1`` (rewriting a
        right-sized file is wasted I/O), and the rest split at cumulative-
        row-count multiples of ``target_rows`` — each bin rewrites to ~one
        target-sized file via :meth:`compact` on its file subset.

        Refuses snapshots carrying merge-on-read delete files for the same
        reason :meth:`metadata_agg` does: footer row counts over-count
        deleted rows, so bins would be mis-sized — fold deletes first.

        Returns (file_rank, file_rows, stat_min, bin_id), one row per data
        file; ``with_paths=True`` appends the file path so a maintenance
        job can hand each bin straight to :meth:`rewrite_files` (the
        oracle-checked query keeps the default — paths are temp-dir-local,
        not comparable)."""
        raw = self._raw_snapshot(seq)
        if self._delete_entries(raw):
            raise ValueError(
                "compaction_plan: snapshot carries merge-on-read delete "
                "files; footer row counts over-count — compact() first")
        entries = []
        for f in self._snap_files(raw):
            s = f.get("stats", {}).get(stat_col)
            if s is None:
                raise ValueError(
                    f"compaction_plan: file {f['path']} has no footer "
                    f"stats for tie-break column {stat_col!r}")
            entries.append((f["rows"], s["min"], f["path"]))
        entries.sort(key=lambda e: (-e[0], e[1]))
        rows, cum = [], 0
        for rank, (n, smin, path) in enumerate(entries, start=1):
            if n >= target_rows:
                rows.append((rank, n, smin, -1, path))
            else:
                rows.append((rank, n, smin, cum // target_rows, path))
                cum += n
        schema = "file_rank long, file_rows long, stat_min long, bin_id long"
        if with_paths:
            return spark.createDataFrame(
                [(int(a), int(b), int(c), int(d), p)
                 for a, b, c, d, p in rows],
                schema + ", path string",
            )
        return spark.createDataFrame(
            [(int(a), int(b), int(c), int(d)) for a, b, c, d, _p in rows],
            schema,
        )

    def rewrite_files(self, spark: SparkSession, paths: list[str],
                      target_files: int = 1) -> dict:
        """Execute ONE compaction bin (Iceberg ``rewrite_data_files`` over
        an explicit file subset — the execution half of
        :meth:`compaction_plan`): read ONLY the named data files, with any
        pending merge-on-read deletes bound to them folded in physically,
        rewrite them as ``target_files`` file(s), and carry every
        untouched manifest by reference — I/O and commit cost are O(bin),
        never O(table), so a maintenance daemon can drain bins
        continuously against a 100 TB table. A manifest that loses only
        some files is rewritten minus them (O(manifest)), same as the CoW
        delete path.

        Delete-file semantics: rewritten rows materialize their pending
        deletes (the new files' fresh paths are outside every carried
        delete file's target set, so nothing re-applies); delete files
        targeting files NOT in ``paths`` are carried untouched and keep
        masking them. Unknown paths raise — a stale plan must fail loudly
        rather than silently skip (the commit itself also aborts on a
        raced parent via planned_parent, like every row-level op).

        Old files stay on disk for time travel; ``expire_snapshots``
        reclaims them."""
        prev = self._raw_snapshot()
        refs = self._carry_manifests(prev)
        wanted = set(paths)
        if not wanted:
            return self.snapshot()
        carried_refs: list[dict] = []
        candidates: list[dict] = []
        n_carried = 0
        for ref in refs:
            entries = self._load_manifest(ref["path"])
            cand = [e for e in entries if e["path"] in wanted]
            if not cand:
                carried_refs.append(ref)
                n_carried += ref["n_files"]
                continue
            candidates.extend(cand)
            survivors = [e for e in entries if e["path"] not in wanted]
            n_carried += len(survivors)
            if survivors:
                carried_refs.append(self._write_manifest(survivors))
        missing = wanted - {e["path"] for e in candidates}
        if missing:
            raise ValueError(
                f"rewrite_files: {sorted(missing)} not in the current "
                "snapshot — re-plan against HEAD")
        spec = prev.get("partition_by")
        df = self._read_with_deletes(
            spark, prev["schema"], candidates, prev).coalesce(target_files)
        added = [f for f in self._write_data_files(df, partition_by=spec)
                 if f["rows"] > 0]
        for e in added:
            e["data_seq"] = prev.get("sequence", 0) + 1
        new_refs = [self._write_manifest(added)] if added else []
        return self._commit(
            "replace", added, prev["schema"],
            lambda _parent: carried_refs + new_refs,
            retryable=False,
            planned_parent=(prev.get("sequence", 0),
                            prev.get("snapshot_id")),
            extra={"added_manifests": [r["path"] for r in new_refs],
                   "partition_by": spec, "sort_by": prev.get("sort_by"),
                   "rewrote_files": len(candidates),
                   "carried_files": n_carried})

    def changes(self, spark: SparkSession, from_seq: int,
                to_seq: int | None = None) -> DataFrame:
        """Net row-level changelog between two snapshots (the Iceberg CDC /
        changelog-table surface): the table schema plus ``_change_type`` ∈
        {'insert','delete'} — rows visible at ``to_seq`` but not at
        ``from_seq`` are inserts, the reverse are deletes (multiset
        semantics: k extra copies ⇒ k change rows).

        File-identity short-circuit (the 100 TB property): a data file
        present in BOTH snapshots with an UNCHANGED delete binding
        contributes nothing and is NEVER read — the diff costs O(changed
        files), not O(table). Files only in one snapshot, plus carried
        files whose merge-on-read delete binding changed, are read at
        their respective snapshots and netted with exceptAll in both
        directions, so a copy-on-write rewrite that merely moved rows
        between files emits nothing. Schema evolution across the window is
        refused (a changelog row needs one schema)."""
        raw_a = self._raw_snapshot(from_seq)
        raw_b = self._raw_snapshot(to_seq)
        if raw_a["schema"] != raw_b["schema"]:
            raise ValueError(
                "changes: schema evolved across the window "
                f"({raw_a['schema']!r} -> {raw_b['schema']!r})")
        dels_a, dels_b = self._delete_entries(raw_a), self._delete_entries(raw_b)
        ts_a, ts_b = _pos_target_sets(dels_a), _pos_target_sets(dels_b)
        fa = {f["path"]: f for f in self._snap_files(raw_a)}
        fb = {f["path"]: f for f in self._snap_files(raw_b)}
        side_a = [f for p, f in fa.items() if p not in fb]
        side_b = [f for p, f in fb.items() if p not in fa]
        for p in fa.keys() & fb.keys():
            if (_delete_binding(fa[p], dels_a, ts_a)
                    != _delete_binding(fb[p], dels_b, ts_b)):
                side_a.append(fa[p])
                side_b.append(fb[p])
        schema = raw_b["schema"]
        old = self._read_with_deletes(spark, schema, side_a, raw_a)
        new = self._read_with_deletes(spark, schema, side_b, raw_b)
        return (
            old.exceptAll(new).withColumn("_change_type", F.lit("delete"))
            .unionByName(
                new.exceptAll(old).withColumn("_change_type", F.lit("insert")))
        )


def _ddl(df: DataFrame) -> str:
    return ",".join(f"{f.name} {f.dataType.simpleString()}"
                    for f in df.schema.fields)
