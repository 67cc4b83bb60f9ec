"""GraphStore — Parquet table layer with MERGE semantics + stage manifests.

The reference persists to Neo4j with idempotent Cypher MERGE
(/root/reference/ingestMD.py:327-646). Iceberg jars are not available in
this environment, so we emulate Iceberg-style row-level MERGE and snapshot
checkpoints on plain Parquet (SURVEY.md §7.0 fallback):

- each table lives at ``<root>/<name>``; writes go to a new versioned
  subdirectory ``v=<k>`` followed by an atomic manifest update — readers
  always see a complete snapshot (the manifest points at the last fully
  written version);
- MERGE INTO is union + key-window dedup + rewrite (idempotent);
- every stage commit records a JSON manifest with row counts (collected
  via ``df.observe`` style aggregates), the input fingerprint, and the
  stage name -> resuming a killed run skips stages whose manifest matches
  the current input fingerprint (north-rule resumability).

On a real cluster this class is swapped for Iceberg
(``MERGE INTO``/snapshots); the call sites are written against the same
verbs (merge_nodes/merge_edges/...) so only this module changes.
"""

from __future__ import annotations

import json
import os
import shutil
import threading
import time
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


class GraphStore:
    def __init__(self, root: str, spark: SparkSession,
                 keep_versions: int = 1):
        self.root = root
        self.spark = spark
        # Iceberg-style snapshot retention: how many committed versions
        # of each table stay on disk. 1 (default) = current behavior —
        # a commit supersedes and deletes its parent. >1 enables
        # time-travel reads (read(name, version=...)) over the retained
        # window; expire_snapshots()/the commit path prune beyond it.
        self.keep_versions = max(1, keep_versions)
        # (name, version) -> DataFrame handle: skips re-listing + parquet
        # footer schema inference on repeated reads of the same snapshot
        # (the version key self-invalidates on every commit)
        self._df_cache: dict[tuple[str, str], DataFrame] = {}
        self._df_cache_lock = threading.Lock()
        os.makedirs(root, exist_ok=True)

    # ---------- snapshot plumbing ----------

    def _tdir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _manifest_path(self, name: str) -> str:
        return os.path.join(self._tdir(name), "_manifest.json")

    def manifest(self, name: str) -> dict | None:
        try:
            with open(self._manifest_path(name)) as f:
                return json.load(f)
        except (OSError, json.JSONDecodeError):
            return None

    def exists(self, name: str) -> bool:
        m = self.manifest(name)
        return m is not None and os.path.isdir(
            os.path.join(self._tdir(name), m["version"])
        )

    def read(self, name: str) -> DataFrame:
        m = self.manifest(name)
        if not m:
            raise FileNotFoundError(f"table {name} has no committed snapshot")
        key = (name, m["version"])
        # run_pipeline's tail stage reads/writes tables from a
        # ThreadPoolExecutor, so cache mutation must be atomic: build the
        # replacement dict privately and swap it in with one assignment
        # (never mutate the live dict another thread may be iterating)
        df = self._df_cache.get(key)
        if df is None:
            path = os.path.join(self._tdir(name), m["version"])
            if m.get("catalog_table"):
                df = self._read_bucketed(m, path)
            else:
                df = self.spark.read.parquet(path)
            with self._df_cache_lock:
                fresh = {}
                superseded = []
                for k, v in self._df_cache.items():
                    if k[0] != name:
                        fresh[k] = v
                    else:  # drop superseded snapshots
                        superseded.append(v)
                fresh[key] = df
                self._df_cache = fresh
            # a superseded handle may carry the read path's sticky
            # serving persist — evict it so the cache dies with its
            # snapshot (lazy import: retrieval imports nothing from
            # here, but keep the store importable standalone)
            if superseded:
                from neo4j_document_pipeline_spark.operators.retrieval import (
                    evict_persisted)
                for v in superseded:
                    evict_persisted(v)
        return df

    def read_matching(self, name: str, keys_df: DataFrame,
                      key_col: str) -> DataFrame | None:
        """Point-lookup read: rows of ``name`` whose ``key_col`` appears in
        ``keys_df`` (a one-column frame of lookup keys). On a bucketed
        table this opens ONLY the bucket files the keys hash into —
        O(affected buckets), never a table scan — which is what makes
        per-batch state lookups (committed line counts, LSH signatures)
        O(delta) on the incremental ingest path. Non-bucketed tables fall
        back to a full-scan semi-join (correct, just not pruned). Returns
        None when the table has no committed snapshot.

        Soundness mirrors _merge_write's bucket scoping: bucketed writes
        partition by pmod(Murmur3(key), n), so every row of a key lives in
        that key's bucket file(s)."""
        m = self.manifest(name)
        if not m or not self.exists(name):
            return None
        keys = keys_df.select(F.col(key_col).alias(key_col)).distinct()
        scoped = bool(m.get("bucket_by") == key_col and m.get("catalog_table"))
        files_by: dict[int, list[str]] = {}
        if scoped:
            for p in m.get("partitions") or []:
                b = self._bucket_of_file(p["file"])
                if b is None:
                    scoped = False
                    break
                files_by.setdefault(b, []).append(p["file"])
        if not scoped:
            return self.read(name).join(keys, key_col, "left_semi")
        n = m["n_buckets"]
        affected = sorted({
            r["b"] for r in keys
            .select(F.pmod(F.hash(F.col(key_col)), F.lit(n)).alias("b"))
            .distinct().collect()})
        base = os.path.join(self._tdir(name), m["version"])
        paths = [os.path.join(base, f) for b in affected
                 for f in files_by.get(b, [])]
        if not paths:
            return self.read(name).limit(0)
        return self.spark.read.parquet(*paths).join(keys, key_col, "left_semi")

    def _read_bucketed(self, m: dict, path: str) -> DataFrame:
        """Read a bucketed snapshot THROUGH the catalog — bucket layout
        lives in table metadata, not in the parquet files, so a plain
        path read would lose the shuffle-free join property. A fresh
        session re-registers the external table from the manifest (the
        durable source of truth), Iceberg-style."""
        tbl = m["catalog_table"]
        if not self.spark.catalog.tableExists(tbl):
            schema = self.spark.read.parquet(path).schema
            ddl = ", ".join(f"`{f.name}` {f.dataType.simpleString()}"
                            for f in schema.fields)
            # IF NOT EXISTS: two concurrent readers may both pass the
            # tableExists probe; the loser must not fail the read
            self.spark.sql(
                f"CREATE TABLE IF NOT EXISTS {tbl} ({ddl}) USING PARQUET "
                f"CLUSTERED BY (`{m['bucket_by']}`) "
                f"SORTED BY (`{m['bucket_by']}`) "
                f"INTO {m['n_buckets']} BUCKETS "
                f"LOCATION '{path}'")
        return self.spark.table(tbl)

    def write(self, name: str, df: DataFrame, *, input_fingerprint: str = "",
              stage: str = "", extra_metrics: dict | None = None,
              partition_by: list[str] | None = None,
              stats_cols: list[str] | None = None,
              extra_files: dict[str, bytes] | None = None) -> dict:
        """Write a new snapshot version and commit it atomically via the
        manifest. Returns the manifest dict (with row count metric).

        ``stats_cols``: record per-file [min, max] bounds for these
        columns in the manifest (from parquet footer row-group
        statistics — what an Iceberg manifest stores for scan-level file
        skipping via ``read_where``). Useful when the layout clusters
        the column (range partitioning, sortWithinPartitions, time-ordered
        appends); meaningless on hash-bucketed keys, where every file
        spans the full range.

        ``extra_files``: sidecar payloads (relative name -> bytes) written
        into the version directory BEFORE the manifest commit, so they are
        part of the atomic snapshot (Iceberg metadata-file analogue).
        Names must start with '_' so Spark scans and the partition lineage
        ignore them."""
        if partition_by and stats_cols:
            clash = set(partition_by) & set(stats_cols)
            if clash:
                # hive partitioning strips these columns from the data
                # files — their footer stats can never exist; partition
                # DIRECTORIES already prune them better than stats could
                raise ValueError(
                    f"stats_cols {sorted(clash)} are partition columns: "
                    "hive layout removes them from data files (partition "
                    "pruning already covers them)")
        tdir = self._tdir(name)
        os.makedirs(tdir, exist_ok=True)
        version = f"v-{uuid.uuid4().hex[:12]}"
        path = os.path.join(tdir, version)
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(path)
        self._write_extra_files(path, extra_files)
        extra_man = {}
        if partition_by:
            extra_man["partition_by"] = partition_by
        if stats_cols:
            extra_man["stats_cols"] = stats_cols
        if extra_files:
            extra_man["sidecar_files"] = sorted(extra_files)
        return self._commit_snapshot(
            name, version, path, stage=stage,
            input_fingerprint=input_fingerprint,
            extra_metrics=extra_metrics,
            extra_manifest=extra_man or None,
            stats_cols=stats_cols)

    def write_preserving_layout(self, name: str, df: DataFrame,
                                **kw) -> dict:
        """Re-commit a table keeping whatever physical layout its current
        snapshot has (bucket spec or hive partitioning) — the writer for
        paths that update EXISTING tables (incremental merge, compaction)
        and must not silently degrade a layout a full run chose."""
        m = self.manifest(name) or {}
        if m.get("bucket_by"):
            return self.write_bucketed(name, df, bucket_by=m["bucket_by"],
                                       n_buckets=m["n_buckets"], **kw)
        if m.get("partition_by"):
            return self.write(name, df, partition_by=m["partition_by"],
                              stats_cols=m.get("stats_cols"), **kw)
        return self.write(name, df, stats_cols=m.get("stats_cols"), **kw)

    def write_bucketed(self, name: str, df: DataFrame, *, bucket_by: str,
                       n_buckets: int = 16, input_fingerprint: str = "",
                       stage: str = "",
                       extra_metrics: dict | None = None,
                       extra_files: dict[str, bytes] | None = None) -> dict:
        """Snapshot write with a bucket(bucket_by) physical layout — the
        Iceberg `bucket(N, entity_id)` storage-partitioned-join layout
        from SURVEY §1.3/§4 on plain parquet + the session catalog.

        Two tables bucketed into the same N on their join keys equi-join
        with NO shuffle on either side (storage-partitioned join): the
        scan's output partitioning already satisfies the join's required
        distribution. At 100 TB that removes the biggest read-path
        exchange (edges ⋈ nodes). Bucket metadata lives in the catalog;
        the manifest records (bucket_by, n_buckets, catalog_table) so a
        fresh session re-registers the external table and keeps the
        property (see _read_bucketed)."""
        tdir = self._tdir(name)
        os.makedirs(tdir, exist_ok=True)
        version = f"v-{uuid.uuid4().hex[:12]}"
        path = os.path.join(tdir, version)
        tbl = self._catalog_table(name, version)
        # one file per bucket: repartition by the bucket key first (both
        # use Murmur3, so task partitions align with buckets), so the
        # write does not emit (input-partitions × buckets) small files.
        # sortBy gives in-file ordering; the scan only ELIDES its sort
        # under spark.sql.legacy.bucketedTableScan.outputOrdering — the
        # win this layout targets is the removed shuffle, which needs no
        # legacy flag
        (df.repartition(n_buckets, F.col(bucket_by))
         .write.mode("overwrite").format("parquet").option("path", path)
         .bucketBy(n_buckets, bucket_by).sortBy(bucket_by)
         .saveAsTable(tbl))
        self._write_extra_files(path, extra_files)
        extra_man = {"bucket_by": bucket_by, "n_buckets": n_buckets,
                     "catalog_table": tbl}
        if extra_files:
            extra_man["sidecar_files"] = sorted(extra_files)
        return self._commit_snapshot(
            name, version, path, stage=stage,
            input_fingerprint=input_fingerprint,
            extra_metrics=extra_metrics,
            extra_manifest=extra_man)

    @staticmethod
    def _write_extra_files(path: str, extra_files: dict[str, bytes] | None):
        """Drop sidecar payloads into a version dir pre-commit. Underscore
        names keep them invisible to Spark scans and footer lineage."""
        for rel, payload in (extra_files or {}).items():
            if not os.path.basename(rel).startswith("_"):
                raise ValueError(
                    f"sidecar file {rel!r} must start with '_' (Spark "
                    "reads and partition lineage must skip it)")
            full = os.path.join(path, rel)
            os.makedirs(os.path.dirname(full), exist_ok=True)
            with open(full, "wb") as f:
                f.write(payload)

    def _catalog_table(self, name: str, version: str) -> str:
        """Session-catalog identifier for a bucketed snapshot: unique per
        (store root, table, version) so two stores in one session never
        collide."""
        import hashlib
        import re
        root_sig = hashlib.sha256(
            os.path.abspath(self.root).encode()).hexdigest()[:8]
        safe = re.sub(r"[^A-Za-z0-9_]", "_", name)
        return f"kg_{root_sig}_{safe}_{version.replace('-', '_')}"

    def _commit_snapshot(self, name: str, version: str, path: str, *,
                         stage: str, input_fingerprint: str,
                         extra_metrics: dict | None,
                         extra_manifest: dict | None = None,
                         stats_cols: list[str] | None = None) -> dict:
        tdir = self._tdir(name)
        # per-partition lineage (north rule): one entry per committed data
        # file with its row count — the same information an Iceberg
        # manifest records. Parquet FOOTERS already carry num_rows, so
        # the counts come from driver-side metadata reads (exactly how
        # Iceberg builds its manifests — O(files) footer reads, no
        # table-scan job); the Spark read-back job is only the fallback
        # for filesystems pyarrow can't reach.
        partitions = self._footer_lineage(path, version,
                                          stats_cols=stats_cols)
        if partitions is None:
            from urllib.parse import unquote
            per_file = (
                self.spark.read.parquet(path)
                .groupBy(F.input_file_name().alias("file"))
                .count().collect()
            )
            # unquote: input_file_name returns URI-encoded paths
            # ('lang=pt%20BR'), the footer path raw filesystem names —
            # manifests must not differ by which environment committed
            partitions = sorted(
                ({"file": unquote(r["file"]).split(version + "/", 1)[-1],
                  "rows": r["count"]} for r in per_file),
                key=lambda d: d["file"])
        rows = sum(p["rows"] for p in partitions)
        prev = self.manifest(name)
        man = {
            "table": name,
            "version": version,
            "stage": stage or name,
            "rows": rows,
            "n_files": len(partitions),
            "partitions": partitions,
            "input_fingerprint": input_fingerprint,
            "committed_at_unix": int(time.time()),
            "parent_version": prev["version"] if prev else None,
            "metrics": extra_metrics or {},
            **(extra_manifest or {}),
        }
        tmp = self._manifest_path(name) + f".tmp-{uuid.uuid4().hex[:6]}"
        with open(tmp, "w") as f:
            json.dump(man, f, indent=1)
        os.replace(tmp, self._manifest_path(name))  # atomic commit point
        # snapshot log (Iceberg metadata-log analogue): every committed
        # manifest appends here; retention below prunes DATA beyond
        # keep_versions but the log keeps the full lineage chain. A torn
        # tail (crash mid-append) must not swallow this commit's line, so
        # start on a fresh line whenever the log doesn't end with one.
        hist_path = os.path.join(tdir, "_history.jsonl")
        prefix = ""
        try:
            with open(hist_path, "rb") as f:
                f.seek(-1, os.SEEK_END)
                if f.read(1) != b"\n":
                    prefix = "\n"
        except OSError:
            pass
        with open(hist_path, "a") as f:
            f.write(prefix + json.dumps(man) + "\n")
        self._prune_versions(name, keep=self.keep_versions)
        return man

    def history(self, name: str) -> list[dict]:
        """Commit log for a table, oldest first (snapshot id, parent,
        rows, timestamp — the SELECT * FROM t.snapshots analogue)."""
        path = os.path.join(self._tdir(name), "_history.jsonl")
        out = []
        try:
            with open(path) as f:
                for line in f:
                    line = line.strip()
                    if not line:
                        continue
                    try:
                        out.append(json.loads(line))
                    except json.JSONDecodeError:
                        # torn append (crash mid-write): the manifest is
                        # the atomic commit point, so a partial history
                        # line must never brick reads/writes — skip it
                        continue
        except OSError:
            pass
        return out

    def _prune_versions(self, name: str, keep: int):
        """Expire snapshot DATA beyond the last ``keep`` commits (the
        expire_snapshots maintenance action). The history log is never
        truncated."""
        hist = self.history(name)
        if not hist:
            return
        retained = {m["version"] for m in hist[-max(1, keep):]}
        cur = self.manifest(name)
        if cur:
            retained.add(cur["version"])  # never expire the live pointer
        by_version = {m["version"]: m for m in hist}
        tdir = self._tdir(name)
        # expire only versions KNOWN COMMITTED (in the history log): a
        # v-* directory absent from the log may be another writer's
        # in-flight uncommitted snapshot — deleting it would corrupt a
        # concurrent job mid-write
        for v, m in by_version.items():
            if v not in retained and os.path.isdir(os.path.join(tdir, v)):
                self._drop_catalog_entry(m)
                shutil.rmtree(os.path.join(tdir, v), ignore_errors=True)

    def expire_snapshots(self, name: str, keep: int = 1):
        """Explicit maintenance: keep only the newest ``keep`` snapshots'
        data files for ``name``."""
        self._prune_versions(name, keep=keep)

    def vacuum(self, name: str, grace_seconds: int = 3 * 86400) -> list[str]:
        """remove_orphan_files maintenance: delete version directories
        that no commit (history or live manifest) references — the debris
        of writes that crashed before their manifest commit. Only dirs
        whose ENTIRE TREE is older than ``grace_seconds`` go: an
        in-flight Spark write keeps touching files under
        ``_temporary/``, so its newest mtime stays fresh however long
        the job runs. Default grace is 3 days (Iceberg's
        remove_orphan_files default, for the same reason). Returns the
        version names actually removed (verified gone)."""
        tdir = self._tdir(name)
        if not os.path.isdir(tdir):
            return []
        known = {h["version"] for h in self.history(name)}
        cur = self.manifest(name)
        if cur:
            known.add(cur["version"])
        removed = []
        now = time.time()
        for v in list(os.listdir(tdir)):
            full = os.path.join(tdir, v)
            if not (v.startswith("v-") and v not in known
                    and os.path.isdir(full)):
                continue
            newest = os.path.getmtime(full)
            for dp, dns, fns in os.walk(full):
                for entry in dns + fns:
                    try:
                        newest = max(newest, os.path.getmtime(
                            os.path.join(dp, entry)))
                    except OSError:
                        pass
            if now - newest > grace_seconds:
                shutil.rmtree(full, ignore_errors=True)
                if not os.path.isdir(full):  # report only verified removal
                    removed.append(v)
        return removed

    def read_version(self, name: str, version: str) -> DataFrame:
        """Time-travel read of a retained snapshot (read of t VERSION AS
        OF v). Raises if the snapshot's data has been expired."""
        m = next((h for h in self.history(name) if h["version"] == version),
                 None)
        cur = self.manifest(name)
        if m is None and cur and cur["version"] == version:
            m = cur
        if m is None:
            raise FileNotFoundError(
                f"table {name} has no committed snapshot {version}")
        path = os.path.join(self._tdir(name), version)
        if not os.path.isdir(path):
            raise FileNotFoundError(
                f"snapshot {version} of {name} has been expired "
                f"(keep_versions={self.keep_versions})")
        if m.get("catalog_table"):
            return self._read_bucketed(m, path)
        return self.spark.read.parquet(path)

    def compact(self, name: str, target_file_mb: int = 128) -> dict:
        """Small-file compaction (the OPTIMIZE / rewrite_data_files
        maintenance action): rewrite the current snapshot into
        ceil(bytes / target_file_mb) files. Content-identical; the input
        fingerprint carries over so stage resume still treats the table
        as current, and ``content_root_version`` records the last
        content-CHANGING snapshot this rewrite preserves (transitively,
        so chained compactions keep pointing at the same root) — read-
        side index freshness keys on it explicitly instead of inferring
        content-identity from a fingerprint+row-count heuristic that a
        content-changing same-shape rewrite could satisfy. Bucketed
        tables rewrite under the SAME bucket spec (compaction must never
        silently drop the join layout)."""
        m = self.manifest(name)
        if not m:
            raise FileNotFoundError(f"table {name} has no committed snapshot")
        path = os.path.join(self._tdir(name), m["version"])
        total_bytes = sum(
            os.path.getsize(os.path.join(dp, fn))
            for dp, _, fns in os.walk(path) for fn in fns)
        df = self.read(name)
        kw = dict(
            input_fingerprint=m.get("input_fingerprint", ""),
            stage=m.get("stage", name),
            extra_metrics={**(m.get("metrics") or {}),
                           "compacted_from": m["version"],
                           "content_root_version":
                               (m.get("metrics") or {}).get(
                                   "content_root_version") or m["version"]})
        # sidecar payloads (e.g. the ANN quantizer parquet) are part of
        # the snapshot — a maintenance rewrite must carry them forward
        sidecars = {}
        for rel in m.get("sidecar_files") or []:
            try:
                with open(os.path.join(path, rel), "rb") as f:
                    sidecars[rel] = f.read()
            except OSError:
                pass
        kw["extra_files"] = sidecars or None
        if m.get("bucket_by"):
            return self.write_bucketed(
                name, df, bucket_by=m["bucket_by"],
                n_buckets=m["n_buckets"], **kw)
        if m.get("partition_by"):
            # hive-partitioned tables keep their layout: cluster rows by
            # the partition columns so each partition value lands in one
            # task → one file per value
            pcols = m["partition_by"]
            return self.write(name, df.repartition(*[F.col(c) for c in pcols]),
                              partition_by=pcols,
                              stats_cols=m.get("stats_cols"), **kw)
        n_files = max(1, -(-total_bytes // (target_file_mb * 1024 * 1024)))
        return self.write(name, df.repartition(n_files),
                          stats_cols=m.get("stats_cols"), **kw)

    @staticmethod
    def _footer_lineage(path: str, version: str,
                        stats_cols: list[str] | None = None
                        ) -> list[dict] | None:
        """Per-file row counts from parquet footer metadata (local
        filesystem paths only — returns None for scheme URIs, a missing
        snapshot dir, zero discovered files, or any read error,
        signalling the caller to fall back to the Spark read-back job,
        which fails LOUDLY on a path that holds no data)."""
        if "://" in path or not os.path.isdir(path):
            return None
        try:
            import pyarrow.parquet as pq
            parts = []
            for dp, _, fns in os.walk(path):
                for fn in fns:
                    if not fn.endswith(".parquet") or fn.startswith((".", "_")):
                        continue
                    full = os.path.join(dp, fn)
                    md = pq.ParquetFile(full).metadata
                    entry = {
                        "file": full.split(version + "/", 1)[-1],
                        "rows": md.num_rows,
                    }
                    if stats_cols:
                        stats = GraphStore._column_bounds(md, stats_cols)
                        if stats:
                            entry["stats"] = stats
                    parts.append(entry)
            # no parquet files under an existing dir: ambiguous (writer
            # that emits nothing for empty frames vs data landing
            # elsewhere) — let the Spark fallback adjudicate
            return sorted(parts, key=lambda d: d["file"]) or None
        except Exception:
            return None

    @staticmethod
    def _stat_value(v):
        """Canonical JSON-safe representation of a footer statistic:
        temporals → ISO strings (lexicographic order == temporal order),
        Decimal → float, bytes → utf-8 (None if undecodable). The SAME
        mapping is applied to read_where probes, so committed bounds and
        query bounds always compare in one domain."""
        import datetime
        import decimal
        if isinstance(v, bytes):
            try:
                return v.decode()
            except UnicodeDecodeError:
                return None
        if isinstance(v, (datetime.datetime, datetime.date)):
            return v.isoformat()
        if isinstance(v, decimal.Decimal):
            return float(v)
        return v

    @staticmethod
    def _column_bounds(md, stats_cols: list[str]) -> dict:
        """[min, max] per requested column across a file's row groups
        (parquet footer statistics). Columns without stats are omitted.
        Columns are matched by full dotted path, so a nested struct leaf
        never shadows a top-level column of the same name."""
        name_to_idx = {md.schema.column(i).path: i
                       for i in range(md.num_columns)}
        out = {}
        for col in stats_cols:
            idx = name_to_idx.get(col)
            if idx is None:
                continue
            lo = hi = None
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                if st is None or not st.has_min_max:
                    lo = hi = None
                    break
                mn = GraphStore._stat_value(st.min)
                mx = GraphStore._stat_value(st.max)
                if mn is None or mx is None:
                    lo = hi = None
                    break
                lo = mn if lo is None else min(lo, mn)
                hi = mx if hi is None else max(hi, mx)
            if lo is not None:
                out[col] = [lo, hi]
        return out

    def read_where(self, name: str, col: str, lo, hi=None) -> DataFrame:
        """Manifest-based FILE SKIPPING (the Iceberg scan-planning step):
        read only the data files whose committed [min, max] bounds for
        ``col`` overlap [lo, hi] (hi defaults to lo — point lookup), then
        apply the residual row filter. Files without committed stats are
        conservatively read. Falls back to a full filtered read when the
        snapshot carries no stats for ``col``."""
        hi = lo if hi is None else hi
        m = self.manifest(name)
        if not m:
            raise FileNotFoundError(f"table {name} has no committed snapshot")
        base = os.path.join(self._tdir(name), m["version"])
        parts = m.get("partitions") or []
        have_stats = [p for p in parts if (p.get("stats") or {}).get(col)]
        pred = (F.col(col) >= F.lit(lo)) & (F.col(col) <= F.lit(hi))
        if not have_stats:
            return self.read(name).filter(pred)
        # compare in the committed bound domain (temporals are ISO
        # strings, Decimals floats) — see _stat_value
        clo, chi = self._stat_value(lo), self._stat_value(hi)
        keep = []
        for p in parts:
            b = (p.get("stats") or {}).get(col)
            if b is None or not (b[1] < clo or b[0] > chi):
                keep.append(os.path.join(base, p["file"]))
        if not keep:
            return self.read(name).filter(pred).limit(0)
        # basePath keeps hive partition columns in the schema when the
        # kept files live under partition directories
        return (self.spark.read.option("basePath", base)
                .parquet(*keep).filter(pred))

    def _drop_catalog_entry(self, m: dict | None):
        if m and m.get("catalog_table"):
            try:
                self.spark.sql(
                    f"DROP TABLE IF EXISTS {m['catalog_table']}")
            except Exception:
                pass  # catalog entry may belong to a dead session

    def update_metrics(self, name: str, metrics: dict):
        """Attach post-action metrics (df.observe results) to a committed
        stage manifest."""
        m = self.manifest(name)
        if not m:
            return
        m["metrics"].update(metrics)
        tmp = self._manifest_path(name) + f".tmp-{uuid.uuid4().hex[:6]}"
        with open(tmp, "w") as f:
            json.dump(m, f, indent=1)
        os.replace(tmp, self._manifest_path(name))

    def is_current(self, name: str, input_fingerprint: str) -> bool:
        """True when the table's committed snapshot was built from the same
        input — the stage can be skipped on resume."""
        m = self.manifest(name)
        return bool(
            m and m.get("input_fingerprint") == input_fingerprint
            and os.path.isdir(os.path.join(self._tdir(name), m["version"]))
        )

    # ---------- MERGE INTO emulations ----------

    def _merged(self, name: str, updates: DataFrame, merge_fn) -> DataFrame:
        if self.exists(name):
            return merge_fn(self.read(name), updates)
        return merge_fn(None, updates)

    _BUCKET_FILE_RE = None  # compiled lazily below

    @staticmethod
    def _bucket_of_file(fname: str) -> int | None:
        """Bucket id encoded in a Spark bucketed data file name
        (``part-00000-<uuid>_00003.c000.snappy.parquet`` -> 3)."""
        import re
        if GraphStore._BUCKET_FILE_RE is None:
            GraphStore._BUCKET_FILE_RE = re.compile(r"_(\d{5})\.c\d+\.")
        m = GraphStore._BUCKET_FILE_RE.search(os.path.basename(fname))
        return int(m.group(1)) if m else None

    def _merge_write(self, name: str, updates: DataFrame, merge_fn, *,
                     stage: str = "", extra_metrics: dict | None = None,
                     input_fingerprint: str = "",
                     metrics_fn=None) -> dict:
        """MERGE ``updates`` into the committed table and commit the new
        snapshot — rewriting ONLY the affected bucket files when the
        table has a bucket layout (the Iceberg ``MERGE INTO`` touch-
        matching-files-only behavior): an incremental batch whose keys
        hash into k of N buckets reads and rewrites k files; the other
        N-k data files are HARDLINKED into the new snapshot unchanged
        (Iceberg reuses unchanged files by reference; hardlinks are the
        plain-filesystem equivalent — the data survives expiry of the old
        version because the link count keeps it alive). Scoping is sound
        because every merge key contains the bucket key, so all rows of
        a key live in that key's bucket. Falls back to full merge +
        layout-preserving rewrite for non-bucketed tables, and whenever
        any committed file's bucket id can't be derived.

        ``metrics_fn(existing, updates) -> dict``: optional delta-scoped
        metric computation evaluated against the SAME frames the merge
        reads (on the bucket path ``existing`` covers only the affected
        buckets — which is sufficient for any metric about the update
        keys, since a key's prior rows can only live in its own bucket);
        the result is committed into the snapshot's metrics. This is how
        callers derive e.g. per-label new-row counts in O(delta) instead
        of re-aggregating the whole table after the merge."""
        m = self.manifest(name)
        scoped = bool(m and m.get("bucket_by") and m.get("catalog_table"))
        files_by = {}
        if scoped:
            for p in m.get("partitions") or []:
                b = self._bucket_of_file(p["file"])
                if b is None:
                    scoped = False
                    break
                files_by.setdefault(b, []).append(p["file"])
        if not scoped:
            existing = self.read(name) if self.exists(name) else None
            extra = dict(extra_metrics or {})
            if metrics_fn is not None:
                extra.update(metrics_fn(existing, updates))
            return self.write_preserving_layout(
                name, merge_fn(existing, updates),
                stage=stage, extra_metrics=extra,
                input_fingerprint=input_fingerprint)
        key, n = m["bucket_by"], m["n_buckets"]
        base = os.path.join(self._tdir(name), m["version"])
        # the updates frame is evaluated twice (bucket probe + merged
        # write) — persist it so the per-batch update-building work
        # (build_nodes/build_edges joins+aggs) runs once, not per action
        updates = updates.persist()
        try:
            # F.hash is Murmur3(seed 42) — the same function bucketed
            # writes partition by: each update key's bucket, exactly
            affected = sorted({
                r["b"] for r in updates
                .select(F.pmod(F.hash(F.col(key)), F.lit(n)).alias("b"))
                .distinct().collect()})
            aff = set(affected)
            old_aff = [f for b in affected for f in files_by.get(b, [])]
            keep = [f for b, fs in files_by.items()
                    if b not in aff for f in fs]
            existing = (
                self.spark.read.parquet(*[os.path.join(base, f)
                                          for f in old_aff])
                if old_aff else None)
            merged = merge_fn(existing, updates)
            delta_metrics = metrics_fn(existing, updates) \
                if metrics_fn is not None else {}
            version = f"v-{uuid.uuid4().hex[:12]}"
            path = os.path.join(self._tdir(name), version)
            tbl = self._catalog_table(name, version)
            # bucketed write of the merged subset: rows hash only into
            # the affected buckets, so exactly those files are produced
            (merged.repartition(n, F.col(key))
             .write.mode("overwrite").format("parquet").option("path", path)
             .bucketBy(n, key).sortBy(key).saveAsTable(tbl))
        finally:
            updates.unpersist()
        for f in keep:
            dst = os.path.join(path, f)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            try:
                os.link(os.path.join(base, f), dst)
            except OSError:
                shutil.copy2(os.path.join(base, f), dst)
        return self._commit_snapshot(
            name, version, path, stage=stage,
            input_fingerprint=input_fingerprint,
            extra_metrics={**(extra_metrics or {}), **delta_metrics,
                           "merge_scope": "bucket",
                           "rewritten_buckets": len(affected),
                           "reused_files": len(keep)},
            extra_manifest={"bucket_by": key, "n_buckets": n,
                            "catalog_table": tbl})

    @staticmethod
    def _hive_dir_of_file(fname: str,
                          partition_by: list[str]) -> tuple | None:
        """Partition-value tuple encoded in a hive-layout data file path
        (``label=Goal/cell=3/part-*`` -> ('Goal', '3')), values unquoted.
        None when any partition column is missing from the path (or holds
        the hive null sentinel — scoping bails out rather than reason
        about null-partition encodings)."""
        from urllib.parse import unquote
        vals: dict[str, str] = {}
        for seg in fname.split("/")[:-1]:
            if "=" in seg:
                k, v = seg.split("=", 1)
                vals[k] = unquote(v)
        out = []
        for c in partition_by:
            v = vals.get(c)
            if v is None or v == "__HIVE_DEFAULT_PARTITION__":
                return None
            out.append(v)
        return tuple(out)

    def merge_write_hive(self, name: str, updates: DataFrame, merge_fn, *,
                         partition_by: list[str], stage: str = "",
                         extra_metrics: dict | None = None,
                         input_fingerprint: str = "",
                         extra_files: dict[str, bytes] | None = None) -> dict:
        """MERGE ``updates`` into a hive-partitioned table, rewriting ONLY
        the partition directories the updates land in and hardlinking
        every other committed data file into the new snapshot — the
        partition-dir twin of ``_merge_write``'s bucket scoping (Iceberg
        MERGE INTO over an identity-partitioned table touches only
        matching partitions). Soundness requires the caller's invariant
        that an update key's PRIOR row lives in one of the updates' own
        partition values (true for the ANN index: an entity's (label,
        cell) is a pure function of its entity_id under a fixed
        quantizer — label and embedding derive from the id, see
        operators/graph.py module docstring — and any quantizer change
        forces a full rebuild instead of a merge). Falls back to a full
        merge + partitioned rewrite when the committed snapshot doesn't
        carry this exact hive layout, any file's partition values can't
        be parsed, or an update holds a null partition value."""
        m = self.manifest(name)
        scoped = bool(m and m.get("partition_by") == list(partition_by)
                      and not m.get("bucket_by"))
        files_by: dict[tuple, list[str]] = {}
        if scoped:
            for p in m.get("partitions") or []:
                t = self._hive_dir_of_file(p["file"], list(partition_by))
                if t is None:
                    scoped = False
                    break
                files_by.setdefault(t, []).append(p["file"])
        updates = updates.persist()
        try:
            if scoped:
                probe = updates.select(*partition_by).distinct().collect()
                if any(r[c] is None for r in probe for c in partition_by):
                    scoped = False
                else:
                    affected = {tuple(str(r[c]) for c in partition_by)
                                for r in probe}
            if not scoped:
                existing = self.read(name) if self.exists(name) else None
                return self.write(
                    name, merge_fn(existing, updates),
                    partition_by=list(partition_by), stage=stage,
                    extra_metrics=extra_metrics,
                    input_fingerprint=input_fingerprint,
                    extra_files=extra_files)
            base = os.path.join(self._tdir(name), m["version"])
            old_aff = [f for t in affected for f in files_by.get(t, [])]
            keep = [f for t, fs in files_by.items()
                    if t not in affected for f in fs]
            existing = (
                self.spark.read.option("basePath", base)
                .parquet(*[os.path.join(base, f) for f in old_aff])
                if old_aff else None)
            merged = merge_fn(existing, updates)
            version = f"v-{uuid.uuid4().hex[:12]}"
            path = os.path.join(self._tdir(name), version)
            # merged rows carry only affected partition values, so the
            # partitioned write produces exactly those directories
            (merged.repartition(*[F.col(c) for c in partition_by])
             .write.mode("overwrite").partitionBy(*partition_by)
             .parquet(path))
            self._write_extra_files(path, extra_files)
        finally:
            updates.unpersist()
        for f in keep:
            dst = os.path.join(path, f)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            try:
                os.link(os.path.join(base, f), dst)
            except OSError:
                shutil.copy2(os.path.join(base, f), dst)
        extra_man: dict = {"partition_by": list(partition_by)}
        if extra_files:
            extra_man["sidecar_files"] = sorted(extra_files)
        return self._commit_snapshot(
            name, version, path, stage=stage,
            input_fingerprint=input_fingerprint,
            extra_metrics={**(extra_metrics or {}),
                           "merge_scope": "partition",
                           "rewritten_partitions": len(affected),
                           "reused_files": len(keep)},
            extra_manifest=extra_man)

    def merge_write_nodes(self, updates: DataFrame, **kw) -> dict:
        return self._merge_write("nodes", updates, self._nodes_merge_fn(),
                                 **kw)

    def merge_write_edges(self, updates: DataFrame,
                          max_sources: int | None = None, **kw) -> dict:
        return self._merge_write("edges", updates,
                                 self._edges_merge_fn(max_sources), **kw)

    def merge_write_mentions(self, updates: DataFrame, **kw) -> dict:
        return self._merge_write("mentions", updates,
                                 self._mentions_merge_fn(), **kw)

    def merge_write_embeddings(self, updates: DataFrame, **kw) -> dict:
        return self._merge_write("embeddings_cache", updates,
                                 self._embeddings_merge_fn(), **kw)

    def merge_write_documents(self, updates: DataFrame, **kw) -> dict:
        return self._merge_write("documents_final", updates,
                                 self._documents_merge_fn(), **kw)

    def merge_write(self, name: str, updates: DataFrame, merge_fn,
                    **kw) -> dict:
        """Public MERGE entry for tables with caller-supplied semantics
        (e.g. the committed read-side indexes) — bucket-scoped when the
        table has a bucket layout, full merge otherwise."""
        return self._merge_write(name, updates, merge_fn, **kw)

    def merge_nodes(self, updates: DataFrame) -> DataFrame:
        """MERGE by entity_id: last write wins for embedding (reference
        overwrites node embedding on match, ingestMD.py:507,511); coalesce
        keeps start/end."""
        return self._merged("nodes", updates, self._nodes_merge_fn())

    @staticmethod
    def _nodes_merge_fn():
        def fn(existing, new):
            new = new.withColumn("_src", F.lit(1))
            if existing is None:
                allr = new
            else:
                allr = existing.withColumn("_src", F.lit(0)).unionByName(new)
            w = Window.partitionBy("entity_id").orderBy(F.col("_src").desc())
            return (
                allr.withColumn(
                    "start", F.first("start", ignorenulls=True).over(
                        w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
                .withColumn(
                    "end", F.first("end", ignorenulls=True).over(
                        w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
                .withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .drop("_rn", "_src")
            )
        return fn

    def merge_edges(self, updates: DataFrame,
                    max_sources: int | None = None) -> DataFrame:
        """MERGE by (src_id, rel_type, term, dst_id): sources append-if-
        absent (array_union), source_text_full/count/embedding last-write-
        wins, created_at preserved, updated_at bumped
        (ingestMD.py:513-547). ``max_sources`` re-applies the bounded-state
        cap after the union (cfg.max_sources_per_edge) so accumulation
        never regrows past it; lexicographic keep = idempotent."""
        return self._merged("edges", updates,
                            self._edges_merge_fn(max_sources))

    @staticmethod
    def _edges_merge_fn(max_sources: int | None = None):
        merged_sources = F.array_sort(
            F.array_distinct(F.flatten(F.collect_list("sources"))))
        if max_sources:
            merged_sources = F.slice(merged_sources, 1, max_sources)

        def fn(existing, new):
            new = new.withColumn("_src", F.lit(1))
            if existing is None:
                allr = new
            else:
                allr = existing.withColumn("_src", F.lit(0)).unionByName(new)
            g = allr.withColumn("term_k", F.coalesce(F.col("term"), F.lit("")))
            return (
                g.groupBy("src_id", "rel_type", "term_k", "dst_id")
                .agg(
                    merged_sources.alias("sources"),
                    # last NON-EMPTY write wins: the reference only sets
                    # source_text_full when the incoming chunk text is
                    # non-empty (ingestMD.py:543-547) — a batch built
                    # without chunk text must not erase the stored snippet
                    F.max_by("source_text_full", F.struct(
                        (F.col("source_text_full").isNotNull()
                         & (F.col("source_text_full") != "")).alias("nn"),
                        F.col("_src"))).alias("source_text_full"),
                    F.max_by("count", "_src").alias("count"),
                    F.max_by("embedding", "_src").alias("embedding"),
                    F.max_by("term", "_src").alias("term"),
                    F.min("created_at").alias("created_at"),
                    F.max("updated_at").alias("updated_at"),
                )
                .drop("term_k")
                .select("src_id", "dst_id", "rel_type", "term", "count",
                        "embedding", "sources", "source_text_full",
                        "created_at", "updated_at")
            )
        return fn

    def merge_documents(self, updates: DataFrame) -> DataFrame:
        """MERGE by doc_id with coalesce-style title/path (first write
        sticks, ingestMD.py:528-536) into the accumulated documents_final
        table. n_chunks takes any non-null value: doc_id is a content
        hash, so the same doc always has the same chunk count — this
        back-fills rows that were committed before their count was known."""
        return self._merged("documents_final", updates,
                            self._documents_merge_fn())

    @staticmethod
    def _documents_merge_fn():
        def fn(existing, new):
            new = new.withColumn("_src", F.lit(1))
            if existing is None:
                allr = new
            else:
                allr = existing.withColumn("_src", F.lit(0)).unionByName(new)
            w = Window.partitionBy("doc_id").orderBy(F.col("_src").asc())
            wall = Window.partitionBy("doc_id")
            return (
                allr.withColumn("_nc", F.max("n_chunks").over(wall))
                .withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .withColumn("n_chunks", F.col("_nc"))
                .drop("_rn", "_src", "_nc")
            )
        return fn

    def merge_mentions(self, updates: DataFrame) -> DataFrame:
        return self._merged("mentions", updates, self._mentions_merge_fn())

    @staticmethod
    def _mentions_merge_fn():
        def fn(existing, new):
            if existing is None:
                return new.dropDuplicates(["doc_id", "entity_id"])
            return existing.unionByName(new).dropDuplicates(["doc_id", "entity_id"])
        return fn

    def merge_embeddings(self, updates: DataFrame) -> DataFrame:
        return self._merged("embeddings_cache", updates,
                            self._embeddings_merge_fn())

    @staticmethod
    def _embeddings_merge_fn():
        # embeddings are a pure function of their key, so either side of
        # a duplicate pair carries the same vector — keep-any is exact
        def fn(existing, new):
            if existing is None:
                return new.dropDuplicates(["key"])
            return existing.unionByName(new).dropDuplicates(["key"])
        return fn

    # ---------- admin (main.py:118-155, clean.py) ----------

    def truncate(self, name: str):
        """DETACH DELETE analogue — O(metadata), no batched deletes needed
        (clean.py:15-72's 100k-row batching exists only because of Neo4j
        transaction memory; a snapshot store just drops the pointer)."""
        for m in self.history(name) + [self.manifest(name)]:
            self._drop_catalog_entry(m)
        with self._df_cache_lock:
            dropped = [v for k, v in self._df_cache.items() if k[0] == name]
            self._df_cache = {k: v for k, v in self._df_cache.items()
                              if k[0] != name}
        if dropped:
            from neo4j_document_pipeline_spark.operators.retrieval import (
                evict_persisted)
            for v in dropped:
                evict_persisted(v)
        shutil.rmtree(self._tdir(name), ignore_errors=True)

    def drop_all(self):
        for name in list(os.listdir(self.root)):
            self.truncate(name)
