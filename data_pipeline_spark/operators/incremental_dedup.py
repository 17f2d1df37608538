"""Incremental near-duplicate dedup against a STANDING corpus — the
point where the dedup library meets the CDC spine.

All other dedup operators (operators/dedup.py) are whole-corpus batch
passes: adding one micro-batch of documents would recompute O(corpus)
signatures. This module maintains a persisted MinHash/LSH *band index*
(an LSM-style parquet dataset, hash-partitioned by band-bucket) and
probes each incoming batch against it:

  per batch:
    1. MinHash signatures + per-band bucket keys for the BATCH only
       (O(batch) signature work — corpus signatures are never
       recomputed);
    2. probe = band-bucket equi-join of the batch's bucket keys against
       the index, reading ONLY the index partitions the batch's bucket
       keys hash into (driver-side partition pruning over the segment
       list — no job, no full-index scan);
    3. hot-bucket cap: candidates per bucket are rank-limited by a
       deterministic hash, so a degenerate bucket (boilerplate header
       shared by millions of docs) contributes at most `cap` candidates
       — per-batch candidate volume is O(batch · bands · cap), never
       O(batch · bucket_size);
    4. verify: exact signature-agreement (est. Jaccard) on the capped
       candidates; a new doc's rep_id = min over confirmed earlier
       neighbors' rep_ids (first-seen wins), else itself;
    5. append the batch's band rows (with assigned reps) as a new
       segment; `compact()` periodically folds all segments into one
       file set per partition so probe I/O stays O(index ∩ touched
       partitions), independent of how many batches have been applied.

This is the reference's core incremental loop — incoming rows probed
against the accumulated master, master rows win, only non-colliding
newcomers union in (/root/reference/footprint-res/
resolve-footprints.scala:121-188) — with LSH band buckets replacing the
shifted-grid cells and signature agreement replacing the exact polygon
intersect, made PERSISTENT so the probe is incremental across batches.

Exactly-once: each applied batch records its segment + assignment table
in STATE (atomic JSON swap, same posture as the icebox manifest);
replaying an applied batch_id returns the stored assignment without
touching the index. A crash mid-apply leaves an orphan segment that is
NOT in STATE — invisible to probes, reclaimed by the next compact().

100 TB shape: per-batch compute is O(batch · bands · cap); probe I/O is
O(index ∩ touched partitions) after compaction (the same LSM read-tax /
compact trade as the icebox MoR path, with `n_parts` as the pruning
grain); nothing ever shuffles or rescans the whole corpus. Verified by
tests/test_incremental_dedup.py (probe-path pruning + compaction
assertions) and the dedup_incremental oracle query (DuckDB replays the
same batches over the same band/cap/verify logic).
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql.types import ArrayType, LongType, StructField, StructType

from ..functions.portable import h64
from .dedup import minhash_signature


class IncrementalDeduper:
    """A persisted MinHash/LSH band index with per-batch probe + append.

    Parameters mirror minhash_lsh_rep: k signature components in
    `bands` bands of k//bands rows; `cap` bounds candidates per bucket;
    `min_agree` is the signature-agreement verify threshold (matched
    components out of k ≈ estimated Jaccard × k).
    """

    STATE = "STATE.json"

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        k: int = 8,
        bands: int = 4,
        shingle: int = 5,
        n_parts: int = 16,
        cap: int = 16,
        min_agree: int = 4,
        id_col: str = "doc_id",
        text_col: str = "text",
    ):
        if k % bands:
            raise ValueError("k must be a multiple of bands")
        self.spark = spark
        self.root = root
        self.k, self.bands, self.shingle = k, bands, shingle
        self.n_parts, self.cap, self.min_agree = n_parts, cap, min_agree
        self.id_col, self.text_col = id_col, text_col
        self.last_probe_paths: list[str] = []  # probe-pruning observability
        os.makedirs(root, exist_ok=True)
        state_path = os.path.join(root, self.STATE)
        if os.path.exists(state_path):
            with open(state_path) as f:
                self._state = json.load(f)
        else:
            self._state = {"segments": [], "batches": {}, "id_ddl": None}
            self._write_state()

    # ---------- internals ----------

    def _write_state(self) -> None:
        tmp = os.path.join(self.root, f"{self.STATE}.tmp-{uuid.uuid4().hex[:8]}")
        with open(tmp, "w") as f:
            json.dump(self._state, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, os.path.join(self.root, self.STATE))

    def _id_type(self):
        from pyspark.sql.types import _parse_datatype_string

        return _parse_datatype_string(self._state["id_ddl"])

    def _index_schema(self) -> StructType:
        idt = self._id_type()
        return StructType(
            [
                StructField("bkey", LongType()),
                StructField(self.id_col, idt),
                StructField("rep_id", idt),
                StructField("sig", ArrayType(LongType())),
            ]
        )

    def _band_rows(self, docs: DataFrame) -> DataFrame:
        """(id, sig, bkey) — one row per (doc, band). bkey folds the band
        number into the hash so band spaces never alias each other."""
        rows = self.k // self.bands
        sig_df = minhash_signature(
            docs, self.id_col, self.text_col, k=self.k, shingle=self.shingle
        )
        bkeys = []
        for b in range(self.bands):
            vals = [
                F.element_at("sig", b * rows + r + 1).cast("string")
                for r in range(rows)
            ]
            bkeys.append(h64(F.concat_ws(",", F.lit(str(b)), *vals)))
        return sig_df.select(
            F.col(self.id_col), F.col("sig"), F.explode(F.array(*bkeys)).alias("bkey")
        )

    def _probe_paths(self, pbs: list[int]) -> list[str]:
        """Index dirs to scan for these band-bucket partitions: committed
        segments only (orphans from crashed applies are invisible),
        restricted to the touched pb= partitions. Driver metadata only."""
        paths = []
        for seg in self._state["segments"]:
            for p in pbs:
                d = os.path.join(self.root, seg, f"pb={p}")
                if os.path.isdir(d):
                    paths.append(d)
        return paths

    def _read_assign(self, tag: str) -> DataFrame:
        rel = self._state["batches"][tag]
        idt = self._id_type()
        schema = StructType(
            [StructField(self.id_col, idt), StructField("rep_id", idt)]
        )
        return self.spark.read.schema(schema).parquet(os.path.join(self.root, rel))

    # ---------- API ----------

    def apply_batch(self, docs: DataFrame, batch_id: int | str) -> DataFrame:
        """Probe `docs` against the standing index, assign reps, append
        the batch to the index. Returns (id_col, rep_id) — materialized
        (reading the stored assignment), so the result is stable even as
        later batches grow the index. Replaying an applied batch_id
        returns the stored assignment (exactly-once)."""
        tag = str(batch_id)
        if tag in self._state["batches"]:
            return self._read_assign(tag)
        if self._state["id_ddl"] is None:
            self._state["id_ddl"] = docs.schema[self.id_col].dataType.simpleString()

        bb = self._band_rows(docs).persist()  # batch-sized (O(batch·bands))
        try:
            pbs = sorted(
                r["pb"]
                for r in bb.select(
                    F.pmod("bkey", F.lit(self.n_parts)).alias("pb")
                )
                .distinct()
                .collect()
            )
            paths = self._probe_paths(pbs)
            self.last_probe_paths = paths
            if paths:
                index = self.spark.read.schema(self._index_schema()).parquet(*paths)
                # restrict ranking/verify work to buckets the batch
                # actually probes (index rows sharing a pb but not a
                # bucket are irrelevant); the batch key set is
                # O(batch·bands) longs — broadcastable by construction
                index = index.join(
                    F.broadcast(bb.select("bkey").distinct()), "bkey", "left_semi"
                )
            else:
                index = self.spark.createDataFrame([], self._index_schema())

            icol = F.col(self.id_col)
            pool = index.select(
                "bkey",
                icol.alias("_cid"),
                F.col("rep_id").alias("_crep"),
                F.col("sig").alias("_csig"),
                F.lit(0).alias("_cnew"),
            ).unionByName(
                bb.select(
                    "bkey",
                    icol.alias("_cid"),
                    icol.alias("_crep"),
                    F.col("sig").alias("_csig"),
                    F.lit(1).alias("_cnew"),
                )
            )
            # hot-bucket cap: deterministic hash rank, so the capped set
            # is a pure function of the visible docs (oracle-replayable)
            w = Window.partitionBy("bkey").orderBy(
                h64(F.col("_cid").cast("string"), salt="icap"), F.col("_cid")
            )
            capped = (
                pool.withColumn("_r", F.row_number().over(w))
                .filter(F.col("_r") <= self.cap)
                .drop("_r")
            )
            pairs = bb.select(
                "bkey", icol.alias("_nid"), F.col("sig").alias("_nsig")
            ).join(capped, "bkey").filter(
                (F.col("_cid") != F.col("_nid"))
                & ((F.col("_cnew") == 0) | (F.col("_cid") < F.col("_nid")))
            )
            agree = F.size(
                F.filter(
                    F.zip_with("_nsig", "_csig", lambda a, b: a == b), lambda x: x
                )
            )
            matches = (
                pairs.filter(agree >= self.min_agree)
                .groupBy("_nid")
                .agg(F.min("_crep").alias("_mrep"))
            )
            assign = (
                docs.select(icol)
                .join(matches, icol == F.col("_nid"), "left")
                .select(icol, F.coalesce("_mrep", icol).alias("rep_id"))
            )

            seg = f"seg-{tag}-{uuid.uuid4().hex[:8]}"
            assign_rel = os.path.join("assign", seg)
            assign.write.mode("overwrite").parquet(
                os.path.join(self.root, assign_rel)
            )
            assign_done = self._read_assign_path(assign_rel)
            (
                bb.join(assign_done, self.id_col)
                .select(
                    F.pmod("bkey", F.lit(self.n_parts)).alias("pb"),
                    "bkey",
                    icol,
                    F.col("rep_id"),
                    "sig",
                )
                # cluster by pb BEFORE the dynamic-partition write (same
                # layout compact() uses): ≤ n_parts write tasks each
                # emitting whole pb= dirs — one file per partition per
                # segment instead of (#tasks × #pbs) splinters, and no
                # per-task dynamic-partition sort of all 16 dirs
                .repartition(self.n_parts, "pb")
                .sortWithinPartitions("pb", "bkey")
                .write.partitionBy("pb")
                .mode("overwrite")
                .parquet(os.path.join(self.root, seg))
            )
        finally:
            bb.unpersist()
        # STATE swap is the commit point: a crash before this leaves
        # orphan dirs no probe will ever read
        self._state["segments"].append(seg)
        self._state["batches"][tag] = assign_rel
        self._write_state()
        return self._read_assign(tag)

    def _read_assign_path(self, rel: str) -> DataFrame:
        idt = self._id_type()
        schema = StructType(
            [StructField(self.id_col, idt), StructField("rep_id", idt)]
        )
        return self.spark.read.schema(schema).parquet(os.path.join(self.root, rel))

    def compact_if_needed(self, max_segments: int) -> int:
        """Fold segments when the LSM has at least `max_segments` of
        them — the probe-I/O growth policy (icebox.compact_if_needed's
        twin on the dedup index). Returns segments folded (0 = no-op)."""
        if len(self._state["segments"]) >= max_segments:
            return self.compact()
        return 0

    def compact(self, orphan_grace: float = 3600.0) -> int:
        """Fold every committed segment into ONE file set per pb
        partition (rows sorted by bkey for row-group pruning) so probe
        I/O is O(touched partitions), independent of applied-batch
        count — the LSM compaction twin of icebox.compact_if_needed.
        Returns the number of segments folded; safe to re-run (crash
        before the STATE swap leaves old segments authoritative).

        Also reclaims ORPHANS: segment/assign dirs on disk but absent
        from STATE — left by a crash between the segment write and the
        STATE swap (or between a previous compact's STATE swap and its
        rmtree loop). Probes never read them, but they accumulate
        forever on a long stream without this. Same posture as icebox
        snapshot expiry: an unreferenced dir is indistinguishable from a
        concurrent apply's not-yet-committed write, so only dirs older
        than `orphan_grace` seconds are removed."""
        self._reclaim_orphans(orphan_grace)
        segs = self._state["segments"]
        if len(segs) <= 1:
            return 0
        # partition discovery needs one basePath per root — read each
        # segment with its own, then union (multi-root discovery raises
        # CONFLICTING_DIRECTORY_STRUCTURES)
        full_schema = StructType(
            [*self._index_schema().fields, StructField("pb", LongType())]
        )
        df = None
        for s in segs:
            p = os.path.join(self.root, s)
            part = (
                self.spark.read.schema(full_schema)
                .option("basePath", p)
                .parquet(p)
            )
            df = part if df is None else df.unionByName(part)
        new_seg = f"compact-{uuid.uuid4().hex[:8]}"
        (
            df.repartition(self.n_parts, "pb")
            .sortWithinPartitions("pb", "bkey")
            .write.partitionBy("pb")
            .mode("overwrite")
            .parquet(os.path.join(self.root, new_seg))
        )
        old = list(segs)
        self._state["segments"] = [new_seg]
        self._write_state()
        for s in old:  # reclaim superseded segments (post-commit)
            shutil.rmtree(os.path.join(self.root, s), ignore_errors=True)
        return len(old)

    def _reclaim_orphans(self, grace: float) -> int:
        """Delete segment/assign dirs not referenced by STATE and older
        than `grace` seconds (mtime). Driver-side listdir only."""
        import time

        now = time.time()
        live_segs = set(self._state["segments"])
        live_assign = {
            os.path.basename(rel) for rel in self._state["batches"].values()
        }
        removed = 0

        def _stale(path: str) -> bool:
            try:
                return now - os.path.getmtime(path) >= grace
            except OSError:
                return False

        for name in os.listdir(self.root):
            if not (name.startswith("seg-") or name.startswith("compact-")):
                continue
            p = os.path.join(self.root, name)
            if name not in live_segs and os.path.isdir(p) and _stale(p):
                shutil.rmtree(p, ignore_errors=True)
                removed += 1
        assign_root = os.path.join(self.root, "assign")
        if os.path.isdir(assign_root):
            for name in os.listdir(assign_root):
                p = os.path.join(assign_root, name)
                if name not in live_assign and os.path.isdir(p) and _stale(p):
                    shutil.rmtree(p, ignore_errors=True)
                    removed += 1
        return removed
