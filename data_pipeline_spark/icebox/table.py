"""Snapshot-committed Parquet table with bucket partitioning.

On-disk layout (all paths relative to the table root):

    metadata/CURRENT            -> "snap-00000007.json" (atomic-rename swap)
    metadata/snap-00000007.json -> full manifest (immutable, never edited)
    data/snap-00000007/_b=3/*.parquet   (files of buckets rewritten at s7)
    data/snap-00000007/lineage/*.parquet

Manifest (JSON):
    snapshot_id, parent_id, tag, committed_tags (cumulative),
    n_buckets, current_schema_id, schemas {id: spark-schema-json},
    buckets {bucket: {"path": <leaf dir>, "schema_id": id}},
    lineage_paths [ ... cumulative ... ], summary {...}

Invariants:
  * data files are immutable; a snapshot's file set is fully described by
    its own manifest → time travel = read an old manifest;
  * a bucket maps to exactly ONE leaf dir (the snapshot that last rewrote
    it) because merges are copy-on-write per bucket;
  * commit = write manifest file (new name) then os.replace CURRENT —
    atomic on POSIX; a crash anywhere earlier leaves orphans only.

Driver-side work per commit is O(#touched buckets), never O(#events).
"""

from __future__ import annotations

import json
import os
import uuid

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

# Hidden per-row merge metadata, the engine's analog of Iceberg/Hudi
# sequence numbers: _lsn is the LSN of the event that produced the row,
# _tombstone marks a deleted key (retained so a LATE-arriving older event
# can never resurrect it — makes batch apply order-independent).
INTERNAL_FIELDS = [
    StructField("_lsn", LongType(), True),
    StructField("_tombstone", BooleanType(), True),
]
INTERNAL_NAMES = [f.name for f in INTERNAL_FIELDS]


class SchemaEvolutionError(ValueError):
    pass


class ConcurrentCommitError(RuntimeError):
    """Another writer committed since this handle's snapshot was loaded.

    The table layer is optimistic-concurrency single-winner, like
    Iceberg's atomic swap: commits from a stale handle are rejected
    instead of silently clobbering the other writer's snapshot. Reload
    the table and re-apply."""


# widenings allowed, mirroring Iceberg's promotion rules
_WIDEN_OK = {
    (IntegerType(), LongType()),
    (FloatType(), DoubleType()),
}


def _is_widening(old, new) -> bool:
    return (old, new) in _WIDEN_OK


def bucket_expr(n_buckets: int, key: str = "doc_id"):
    """Partition transform: pmod(xxhash64(key), n) — the engine's analog of
    the reference's PlusCode grid bucketing
    (/root/reference/grid-and-attrs/footprint.js:117-118)."""
    return F.pmod(F.xxhash64(F.col(key)), F.lit(n_buckets)).cast("int")


class IceboxTable:
    def __init__(self, spark: SparkSession, root: str, manifest: dict):
        self.spark = spark
        self.root = root
        self.manifest = manifest

    # ---------- lifecycle ----------

    @staticmethod
    def create(
        spark: SparkSession,
        root: str,
        schema: StructType,
        n_buckets: int = 32,
        key: str = "doc_id",
    ) -> "IceboxTable":
        meta_dir = os.path.join(root, "metadata")
        os.makedirs(meta_dir, exist_ok=False)
        os.makedirs(os.path.join(root, "data"), exist_ok=True)
        manifest = {
            "snapshot_id": 0,
            "parent_id": None,
            "tag": None,
            "committed_tags": [],
            "key": key,
            "n_buckets": n_buckets,
            "current_schema_id": 0,
            "schemas": {"0": schema.json()},
            "buckets": {},
            "lineage_paths": [],
            "summary": {"operation": "create"},
        }
        t = IceboxTable(spark, root, manifest)
        t._write_manifest(manifest)
        return t

    @staticmethod
    def load(spark: SparkSession, root: str, snapshot_id: int | None = None) -> "IceboxTable":
        meta_dir = os.path.join(root, "metadata")
        if snapshot_id is None:
            with open(os.path.join(meta_dir, "CURRENT")) as f:
                name = f.read().strip()
        else:
            name = f"snap-{snapshot_id:08d}.json"
        with open(os.path.join(meta_dir, name)) as f:
            return IceboxTable(spark, root, json.load(f))

    # ---------- introspection ----------

    @property
    def key(self) -> str:
        return self.manifest["key"]

    @property
    def n_buckets(self) -> int:
        return self.manifest["n_buckets"]

    @property
    def snapshot_id(self) -> int:
        return self.manifest["snapshot_id"]

    @property
    def schema(self) -> StructType:
        sid = str(self.manifest["current_schema_id"])
        return StructType.fromJson(json.loads(self.manifest["schemas"][sid]))

    def has_tag(self, tag: str) -> bool:
        return tag in self.manifest["committed_tags"]

    @property
    def total_rows(self) -> int:
        """Physical row count (incl. tombstones) from bucket metadata;
        0 for pre-row-tracking manifests (heuristics treat that as
        'unknown, assume small')."""
        return sum(e.get("rows", 0) for e in self.manifest["buckets"].values())

    def bucket_of(self):
        return bucket_expr(self.n_buckets, self.key)

    # ---------- schema evolution ----------

    def evolve_schema(self, new_schema: StructType) -> None:
        """Add-nullable-column and int→long/float→double widen only.

        Mirrors the reference's tolerant column-add probe
        (/root/reference/footprint-res/resolve-footprints.scala:84).
        Existing data files are NOT rewritten — readers reconcile.
        """
        cur = self.schema
        cur_by_name = {f.name: f for f in cur.fields}
        merged_fields = list(cur.fields)
        changed = False
        for f in new_schema.fields:
            old = cur_by_name.get(f.name)
            if old is None:
                merged_fields.append(StructField(f.name, f.dataType, True))
                changed = True
            elif old.dataType != f.dataType:
                if _is_widening(old.dataType, f.dataType):
                    i = [x.name for x in merged_fields].index(f.name)
                    merged_fields[i] = StructField(f.name, f.dataType, True)
                    changed = True
                elif _is_widening(f.dataType, old.dataType):
                    pass  # incoming is narrower → current schema already covers it
                else:
                    raise SchemaEvolutionError(
                        f"illegal type change for {f.name}: {old.dataType} -> {f.dataType}"
                    )
        if not changed:
            return
        new_id = max(int(k) for k in self.manifest["schemas"]) + 1
        self.manifest["schemas"][str(new_id)] = StructType(merged_fields).json()
        self.manifest["current_schema_id"] = new_id
        # schema change is metadata-only; it rides along with the next commit

    # ---------- read ----------

    def read(self, buckets: list[int] | None = None, internal: bool = False) -> DataFrame:
        """Read the table at this snapshot, optionally pruned to buckets.

        Files written under older schemas are read with THEIR schema and
        cast/backfilled to the current one (null for added columns) —
        the P2 probe-and-backfill pattern, vectorized by Spark's parquet
        reader per schema group, one scan per schema generation.

        internal=True exposes merge metadata (_lsn, _tombstone) and
        INCLUDES tombstone rows — the merge path needs them; normal reads
        see only live rows and logical columns.
        """
        cur_schema = self.schema
        phys_target = StructType([*cur_schema.fields, *INTERNAL_FIELDS])
        entries = self.manifest["buckets"]
        if buckets is not None:
            wanted = {str(b) for b in buckets}
            entries = {b: e for b, e in entries.items() if b in wanted}
        by_schema: dict[str, list[str]] = {}
        for e in entries.values():
            by_schema.setdefault(str(e["schema_id"]), []).append(
                os.path.join(self.root, e["path"])
            )
        parts = []
        for sid, paths in sorted(by_schema.items()):
            logical = StructType.fromJson(json.loads(self.manifest["schemas"][sid]))
            file_schema = StructType([*logical.fields, *INTERNAL_FIELDS])
            df = self.spark.read.schema(file_schema).parquet(*paths)
            parts.append(_conform(df, phys_target))
        if not parts:
            out = self.spark.createDataFrame([], phys_target)
        else:
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
        if internal:
            return out
        return out.filter(~F.coalesce(F.col("_tombstone"), F.lit(False))).drop(
            *INTERNAL_NAMES
        )

    def read_lineage(self) -> DataFrame:
        paths = [os.path.join(self.root, p) for p in self.manifest["lineage_paths"]]
        if not paths:
            return self.spark.createDataFrame([], LINEAGE_SCHEMA)
        return self.spark.read.schema(LINEAGE_SCHEMA).parquet(*paths)

    # ---------- write / commit ----------

    def commit_rewrite(
        self,
        merged: DataFrame,
        touched_buckets: list[int],
        tag: str | None = None,
        lineage: "DataFrame | list[tuple] | None" = None,
        summary: dict | None = None,
        repartition: bool = True,
    ) -> "IceboxTable":
        """Copy-on-write commit: `merged` holds the COMPLETE new contents of
        `touched_buckets` (with a `_b` bucket column; merge metadata
        _lsn/_tombstone defaulted if absent); all other buckets carry over
        untouched. Returns the table at the new snapshot.

        repartition=False when the caller already clustered by `_b`
        (the merge path does) — avoids a second exchange before the write.
        """
        if tag is not None and self.has_tag(tag):
            return self  # exactly-once: replay of a committed tag is a no-op
        self._check_current()
        sid = self.snapshot_id + 1
        snap_dirname = f"snap-{sid:08d}-{uuid.uuid4().hex[:8]}"
        snap_rel = os.path.join("data", snap_dirname)
        snap_abs = os.path.join(self.root, snap_rel)

        have = set(merged.columns)
        for f in INTERNAL_FIELDS:
            if f.name not in have:
                default = F.lit(-1).cast(f.dataType) if f.name == "_lsn" else F.lit(False)
                merged = merged.withColumn(f.name, default)
        cols = [f.name for f in self.schema.fields] + INTERNAL_NAMES
        out = merged.select("_b", *cols)
        if repartition:
            out = out.repartition(max(len(touched_buckets), 1), "_b")
        (
            # sort by (_b, key): satisfies the dynamic-partition writer's
            # required ordering AND clusters rows by key inside each file —
            # the reference's orderBy(grid) output clustering
            # (resolve-footprints.scala:205)
            out.sortWithinPartitions("_b", self.key)
            .write.partitionBy("_b")
            .mode("overwrite")
            .parquet(snap_abs)
        )

        written = {
            int(d.split("=", 1)[1])
            for d in os.listdir(snap_abs)
            if d.startswith("_b=")
        }
        new_buckets = dict(self.manifest["buckets"])
        cur_sid = self.manifest["current_schema_id"]
        for b in touched_buckets:
            if b in written:
                bdir = os.path.join(snap_abs, f"_b={b}")
                new_buckets[str(b)] = {
                    "path": os.path.join(snap_rel, f"_b={b}"),
                    "schema_id": cur_sid,
                    # row count from parquet footers (driver O(#files),
                    # footer-only reads) — feeds the merge-strategy
                    # heuristic (batch size vs table size)
                    "rows": _parquet_rows(bdir),
                }
            else:
                new_buckets.pop(str(b), None)  # bucket emptied by deletes

        lineage_paths = list(self.manifest["lineage_paths"])
        if lineage is not None:
            if isinstance(lineage, DataFrame):
                lineage = [tuple(r) for r in lineage.collect()]
            lin_rel = os.path.join(snap_rel, "lineage")
            _write_lineage_local(os.path.join(self.root, lin_rel), lineage)
            lineage_paths.append(lin_rel)

        manifest = {
            **self.manifest,
            "snapshot_id": sid,
            "parent_id": self.snapshot_id,
            "tag": tag,
            "committed_tags": self.manifest["committed_tags"] + ([tag] if tag else []),
            "buckets": new_buckets,
            "lineage_paths": lineage_paths,
            "summary": summary or {},
        }
        self._write_manifest(manifest)
        return IceboxTable(self.spark, self.root, manifest)

    def expire_snapshots(self, keep_last: int = 5) -> dict:
        """Iceberg-style maintenance: drop manifests older than the last
        `keep_last` snapshots and delete data directories no kept
        manifest references (copy-on-write carries old dirs forward, so
        the reference set is the union over KEPT manifests, not just the
        current one). Tags survive — `committed_tags` is cumulative in
        every manifest, so exactly-once replay detection is unaffected.

        Returns {"removed_dirs": n, "removed_manifests": m}.
        """
        import shutil

        meta_dir = os.path.join(self.root, "metadata")
        snaps = sorted(
            int(f[5:13])
            for f in os.listdir(meta_dir)
            if f.startswith("snap-") and f.endswith(".json")
        )
        keep_ids = set(snaps[-keep_last:]) | {self.snapshot_id}
        referenced: set[str] = set()
        for sid in keep_ids:
            with open(os.path.join(meta_dir, f"snap-{sid:08d}.json")) as f:
                m = json.load(f)
            for e in m["buckets"].values():
                referenced.add(e["path"].split(os.sep)[1])  # data/<dir>/_b=k
            for p in m["lineage_paths"]:
                referenced.add(p.split(os.sep)[1])
        data_dir = os.path.join(self.root, "data")
        removed_dirs = 0
        for d in os.listdir(data_dir):
            if d not in referenced:
                shutil.rmtree(os.path.join(data_dir, d), ignore_errors=True)
                removed_dirs += 1
        removed_manifests = 0
        for sid in snaps:
            if sid not in keep_ids:
                os.remove(os.path.join(meta_dir, f"snap-{sid:08d}.json"))
                removed_manifests += 1
        return {"removed_dirs": removed_dirs, "removed_manifests": removed_manifests}

    def overwrite_all(self, df: DataFrame, tag: str | None = None) -> "IceboxTable":
        """Full rewrite of every bucket (initial load path)."""
        merged = df.withColumn("_b", self.bucket_of())
        return self.commit_rewrite(
            merged, list(range(self.n_buckets)), tag=tag, summary={"operation": "overwrite"}
        )

    def _check_current(self) -> None:
        cur_path = os.path.join(self.root, "metadata", "CURRENT")
        with open(cur_path) as f:
            current = f.read().strip()
        expected = f"snap-{self.snapshot_id:08d}.json"
        if current != expected:
            raise ConcurrentCommitError(
                f"table at {self.root} moved to {current} while this handle "
                f"holds {expected}; reload and re-apply"
            )

    def _write_manifest(self, manifest: dict) -> None:
        meta_dir = os.path.join(self.root, "metadata")
        name = f"snap-{manifest['snapshot_id']:08d}.json"
        path = os.path.join(meta_dir, name)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)
        cur_tmp = os.path.join(meta_dir, "CURRENT.tmp")
        with open(cur_tmp, "w") as f:
            f.write(name)
            f.flush()
            os.fsync(f.fileno())
        os.replace(cur_tmp, os.path.join(meta_dir, "CURRENT"))
        self.manifest = manifest


LINEAGE_SCHEMA = StructType(
    [
        StructField("batch_id", IntegerType()),
        StructField("partition_id", IntegerType()),
        StructField("events_applied", LongType()),
        StructField("rows_upserted", LongType()),
        StructField("rows_deleted", LongType()),
        StructField("lsn_watermark", LongType()),
    ]
)


def _parquet_rows(bucket_dir: str) -> int:
    import pyarrow.parquet as pq

    n = 0
    for f in os.listdir(bucket_dir):
        if f.endswith(".parquet"):
            n += pq.read_metadata(os.path.join(bucket_dir, f)).num_rows
    return n


def _write_lineage_local(dir_path: str, rows: list[tuple]) -> None:
    """Lineage is O(#buckets) rows — write it driver-side with pyarrow
    (a Spark job for a 64-row file costs seconds of fixed overhead).
    Read back by read_lineage with LINEAGE_SCHEMA (types match)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    schema = pa.schema(
        [
            ("batch_id", pa.int32()),
            ("partition_id", pa.int32()),
            ("events_applied", pa.int64()),
            ("rows_upserted", pa.int64()),
            ("rows_deleted", pa.int64()),
            ("lsn_watermark", pa.int64()),
        ]
    )
    cols = list(zip(*rows)) if rows else [[] for _ in schema]
    t = pa.Table.from_arrays(
        [pa.array(c, type=f.type) for c, f in zip(cols, schema)], schema=schema
    )
    os.makedirs(dir_path, exist_ok=True)
    pq.write_table(t, os.path.join(dir_path, "lineage.parquet"))


def _conform(df: DataFrame, target: StructType) -> DataFrame:
    """Project df onto target schema: missing columns → typed nulls,
    narrower numerics → cast (the read-side half of schema evolution)."""
    have = {f.name for f in df.schema.fields}
    cols = []
    for f in target.fields:
        if f.name in have:
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(*cols)
