"""The extract → resolve → build pipeline (reference G1 as a Spark DAG).

Stage boundaries are checkpointed parquet tables (Iceberg-shaped layout —
one directory per stage table; swap ``_write``/``_read`` for
``writeTo(...).append()`` when an Iceberg catalog is configured).  A stage
whose output already exists is NOT recomputed — that is the resume contract
(north_rule): kill the job after any stage and rerun; finished stages load
from their checkpoint, mirroring the reference's file-hash skip
(extraction_pipeline.py:303-307) at stage granularity.

Per-stage, per-partition lineage rows (rows_out, conv range, checksum) are
appended to ``<out>/lineage``.
"""
from __future__ import annotations

import os
import sys
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators import extract, infer, materialize

STAGES = ("extractions", "raw_triples", "nodes", "edges", "forms",
          "aliases", "mentions")


@dataclass
class PipelineResult:
    tables: dict = field(default_factory=dict)

    def __getattr__(self, name):
        try:
            return self.tables[name]
        except KeyError:
            raise AttributeError(name)

    def triples(self) -> DataFrame:
        return materialize.triples_view(self.tables["edges"], self.tables["nodes"])


_DONE_MARKER = "_KG_DONE"


def _done(path: str) -> bool:
    # The stage is complete only once the engine's own marker exists — it is
    # written AFTER the lineage append, so a crash between the parquet job's
    # _SUCCESS and the lineage write reruns the stage (overwrite) instead of
    # silently skipping a stage whose lineage rows are missing.
    return os.path.exists(os.path.join(path, _DONE_MARKER))


class KGPipeline:
    def __init__(self, spark: SparkSession, out_dir: str | None = None,
                 threshold: float = 0.8, max_block: int = 200,
                 lineage: bool = True):
        self.spark = spark
        self.out_dir = out_dir
        self.threshold = threshold
        self.max_block = max_block
        self.lineage = lineage and out_dir is not None

    def _path(self, stage: str) -> str:
        return os.path.join(self.out_dir, stage)

    def _checkpoint(self, build, stage: str,
                    conv_col: str | None = "conv_id") -> DataFrame:
        """Materialize a stage once; resume loads the table without even
        building the stage plan (``build`` is a thunk).

        Without an out_dir the stage is pinned with an eager
        localCheckpoint() — every stage output has multiple consumers, and
        empirically cache() leaves some downstream plans recomputing the
        extraction UDF (cache-lookup misses on re-aliased scans), while the
        checkpoint cuts the plan outright.
        """
        if callable(build):
            df = None
        else:
            df, build = build, lambda: df  # accept a plain DataFrame too
        if self.out_dir is None:
            t0 = time.time()
            out = build().localCheckpoint()
            if os.environ.get("KG_TIMING"):
                print(f"[kg-timing] {stage}: {time.time() - t0:.1f}s",
                      file=sys.stderr, flush=True)
            return out
        path = self._path(stage)
        if not _done(path):
            out = build()
            out.write.mode("overwrite").parquet(path)
            if self.lineage and conv_col and conv_col in out.columns:
                # Lineage lands in a per-stage partition dir with OVERWRITE
                # semantics, BEFORE the stage's done-marker: a crash anywhere
                # in between reruns the whole stage idempotently (both writes
                # overwrite), so lineage can neither go missing nor duplicate.
                persisted = self.spark.read.parquet(path)
                (materialize.lineage_for(persisted, stage, conv_col)
                 .drop("stage")  # carried by the partition directory
                 .write.mode("overwrite")
                 .parquet(os.path.join(self.out_dir, "lineage", f"stage={stage}")))
            open(os.path.join(path, _DONE_MARKER), "w").close()
        return self.spark.read.parquet(path)

    def run(self, transcripts: DataFrame,
            side_tables: bool = True) -> PipelineResult:
        """side_tables=False skips aliases/mentions (not needed for the
        triple output path; they are derived views over checkpointed stages
        and can be produced later from the same checkpoints)."""
        r = PipelineResult()

        ext = self._checkpoint(lambda: extract.extract_stage(transcripts),
                               "extractions")
        # The extraction UDF ran wide (4 partitions/core) for compute balance;
        # its OUTPUT is small (a few hundred bytes per extraction record), so
        # narrow the partition count back to the core count before fan-out —
        # every downstream stage otherwise schedules 4x the tasks for no work.
        ext = ext.coalesce(self.spark.sparkContext.defaultParallelism)
        r.tables["extractions"] = ext

        # raw_triples feeds the edge relabel join AND the needed-names
        # broadcast filter, so it is pinned (tiny table, two consumers).
        raw = self._checkpoint(infer.infer_stage(ext), "raw_triples")
        r.tables["raw_triples"] = raw

        if (self.out_dir is not None and _done(self._path("forms"))
                and _done(self._path("nodes"))):
            forms_c = self.spark.read.parquet(self._path("forms"))
            nodes = self.spark.read.parquet(self._path("nodes"))
        else:
            forms_c, nodes = materialize.canonical_map(
                ext, threshold=self.threshold, max_block=self.max_block)
            forms_c = self._checkpoint(forms_c, "forms", conv_col=None)
            nodes = self._checkpoint(nodes, "nodes", conv_col=None)
        r.tables["forms"] = forms_c
        r.tables["nodes"] = nodes

        needed = raw.select(F.lower("subj").alias("name_l")).unionAll(
            raw.select(F.lower("obj").alias("name_l")))
        mention_map = materialize.mention_component_map(ext, forms_c, needed)
        edges = self._checkpoint(
            materialize.materialize_edges(raw, mention_map), "edges",
            conv_col="provenance_doc_id")
        r.tables["edges"] = edges

        if side_tables:
            r.tables["aliases"] = self._checkpoint(
                materialize.aliases_table(ext, forms_c), "aliases", conv_col=None)
            r.tables["mentions"] = self._checkpoint(
                materialize.mentions_table(ext, forms_c), "mentions")
        return r


def run_pipeline(spark: SparkSession, transcripts: DataFrame,
                 out_dir: str | None = None, side_tables: bool = True,
                 **kw) -> PipelineResult:
    return KGPipeline(spark, out_dir=out_dir, **kw).run(
        transcripts, side_tables=side_tables)
