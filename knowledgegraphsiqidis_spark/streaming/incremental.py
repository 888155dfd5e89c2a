"""Cross-batch incremental entity resolution for streaming ingest.

The reference resolves every new document against the continuously growing
store (extraction_pipeline.py:615-733).  This module is that semantics at
micro-batch granularity: each batch's NEW surface forms are resolved against
the cumulative form vocabulary (old forms as stored candidates, exactly like
the SQLite store) and the results append to ONE graph — not per-batch
``batch=<id>`` islands.

Equivalence guarantee (tested in test_resume_and_streaming): a corpus split
into monotonic micro-batches produces the IDENTICAL triple set as a single
batch run.  Why incrementality is exact here:

* form keys are global ``conv_id#seq`` strings, so with monotonic batches
  (every new conv_id sorts after all processed ones — asserted, never
  assumed) new forms sort strictly after old forms;
* the accepted match-edge set is an argmax forest pointing later → earlier,
  so old forms never re-resolve when new forms arrive (a new form can only
  be a later ``key_b``, and cluster canonicals are the earliest member, which
  appending members never changes) — prior edges are final;
* per-conversation occurrence re-resolution (materialize.occurrence_map)
  only consults clusters stored BEFORE an occurrence (avail_key < occ_key),
  so later batches cannot rewrite earlier conversations' resolutions.

Hence per batch only the candidate pairs whose LATER side is a new form are
scored — the per-batch ER cost is proportional to the new forms, not the
store (the store side enters through the df-capped block-key join, the same
way the reference's LIKE index bounds its candidate scan).

Scale design: state lives in parquet directory tables (extractions, match
edges, per-batch edge outputs) that an Iceberg catalog can replace 1:1; the
cumulative-forms aggregation is one groupBy over the extraction store and
the nodes table is a cheap agg rebuild — both shrink to metadata-only
incremental merges on a real lakehouse, and neither touches text columns.
"""
from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..operators import extract, infer, materialize
from ..operators.resolve import (DEFAULT_MAX_BLOCK, MATCH_THRESHOLD,
                                 _forest_roots, _pair_score, candidate_pairs,
                                 entity_forms)

_STATE = "_incremental_state.json"


def incremental_match_edges(forms: DataFrame, new_keys: DataFrame,
                            prior_edges: DataFrame | None,
                            threshold: float = MATCH_THRESHOLD,
                            max_block: int = DEFAULT_MAX_BLOCK,
                            canonical_rounds: int = 3) -> DataFrame:
    """resolve.match_edges restricted to pairs whose later side (key_b) is a
    NEW form; prior edges are carried through unchanged (they are final —
    module docstring).  Returns the FULL edge set (prior ∪ new), equal to
    ``match_edges(forms)`` on the cumulative vocabulary.
    """
    spark = forms.sparkSession
    if prior_edges is None:
        prior_edges = spark.createDataFrame([], "key_a string, key_b string")
    prior_edges = prior_edges.localCheckpoint()
    pairs = (candidate_pairs(forms, max_block)
             .join(new_keys.select(F.col("form_key").alias("key_b")),
                   "key_b", "left_semi")
             .localCheckpoint())

    def best(scored: DataFrame) -> DataFrame:
        w = Window.partitionBy("key_b").orderBy(F.desc("score"),
                                                F.asc("canon_key"))
        return (scored.filter(F.col("score") >= threshold)
                .withColumn("_rk", F.row_number().over(w))
                .filter(F.col("_rk") == 1)
                .select(F.col("canon_key").alias("key_a"), "key_b"))

    new_edges = best(pairs.withColumn("canon_key", F.col("key_a"))
                     .withColumn("canon_name", F.col("name_a")))
    prev_sig = None
    from pyspark.sql import Observation
    for _ in range(canonical_rounds):
        obs = Observation()
        new_edges = new_edges.observe(
            obs, F.count(F.lit(1)).alias("n"),
            F.coalesce(F.expr("bit_xor(xxhash64(key_a, key_b))"),
                       F.lit(0)).alias("h")).localCheckpoint()
        sig = (obs.get["n"], obs.get["h"])
        if sig == prev_sig:
            break
        prev_sig = sig
        canon_of = _forest_roots(prior_edges.unionByName(new_edges))
        canon_names = forms.select(F.col("form_key").alias("canon_key"),
                                   F.col("name").alias("canon_name"))
        relabeled = (pairs
                     .join(canon_of.withColumnRenamed("form_key", "key_a"),
                           "key_a", "left")
                     .withColumn("canon_key",
                                 F.coalesce("canon_key", F.col("key_a")))
                     .join(canon_names, "canon_key"))
        unchanged = relabeled.filter(F.col("canon_key") == F.col("key_a"))
        chained = (relabeled.filter(F.col("canon_key") != F.col("key_a"))
                   .withColumn("score", _pair_score("canon_name", "name_b",
                                                    "etype_b")))
        new_edges = best(unchanged.unionByName(chained))
    return prior_edges.unionByName(new_edges.select("key_a", "key_b"))


class IncrementalKG:
    """Streaming-state KG builder: one graph, batch-incremental ER."""

    def __init__(self, spark: SparkSession, out_dir: str,
                 threshold: float = MATCH_THRESHOLD,
                 max_block: int = DEFAULT_MAX_BLOCK):
        self.spark = spark
        self.out_dir = out_dir
        self.threshold = threshold
        self.max_block = max_block
        os.makedirs(out_dir, exist_ok=True)

    # -- state ------------------------------------------------------------
    def _state(self) -> dict:
        p = os.path.join(self.out_dir, _STATE)
        if os.path.exists(p):
            with open(p) as f:
                return json.load(f)
        return {"n_batches": 0, "max_conv_id": ""}

    def _save_state(self, st: dict) -> None:
        with open(os.path.join(self.out_dir, _STATE), "w") as f:
            json.dump(st, f)

    def _path(self, name: str) -> str:
        return os.path.join(self.out_dir, name)

    def _read(self, name: str) -> DataFrame:
        return self.spark.read.parquet(self._path(name))

    # -- per-batch ingest --------------------------------------------------
    def process_batch(self, batch_df: DataFrame, batch_id: int | None = None) -> None:
        if batch_df.isEmpty():
            return
        st = self._state()
        bid = st["n_batches"] if batch_id is None else batch_id

        ext_b = extract.extract_stage(batch_df).localCheckpoint()
        lo, hi = (batch_df.agg(F.min("conv_id"), F.max("conv_id"))
                  .collect()[0])
        if st["max_conv_id"] and lo is not None and lo <= st["max_conv_id"]:
            raise ValueError(
                f"non-monotonic batch: conv_id {lo!r} <= already-processed "
                f"{st['max_conv_id']!r} — incremental ER requires arrival in "
                "conv_id order (reprocess from scratch otherwise)")

        ext_b.write.mode("overwrite").parquet(
            os.path.join(self._path("extractions"), f"batch={bid}"))
        ext_all = self._read("extractions").localCheckpoint()

        forms = entity_forms(ext_all).localCheckpoint()
        # a form is NEW iff its earliest mention is in this batch — with
        # monotonic batches that is exactly "form_key >= this batch's lo"
        new_keys = forms.filter(
            F.substring_index("form_key", "#", 1) >= F.lit(lo or ""))
        prior = self._read("matches") if os.path.exists(
            self._path("matches")) else None
        matches = incremental_match_edges(
            forms, new_keys, prior, threshold=self.threshold,
            max_block=self.max_block).localCheckpoint()
        matches.write.mode("overwrite").parquet(self._path("matches_next"))
        # atomic-ish swap: matches_next -> matches (both parquet dirs)
        final = self._path("matches")
        tmp_old = self._path("matches_old")
        if os.path.exists(final):
            os.rename(final, tmp_old)
        os.rename(self._path("matches_next"), final)
        if os.path.exists(tmp_old):
            import shutil
            shutil.rmtree(tmp_old)
        matches = self._read("matches")

        # canonicalization + node rebuild over the cumulative vocabulary
        from ..operators.resolve import forest_components
        comp = forest_components(matches)
        forms_c = (forms.join(comp, forms.form_key == comp.node, "left")
                   .withColumn("component",
                               F.coalesce("component", "form_key"))
                   .drop("node").localCheckpoint())
        reps = (forms_c.groupBy("component")
                .agg(F.min_by("name", "form_key").alias("canonical_name"),
                     F.min_by("er_type", "form_key").alias("type"),
                     F.sum("n_mentions").alias("n_mentions")))
        nodes = (reps.select(F.col("component").alias("id"), "type",
                             "canonical_name",
                             F.lit("confirmed").alias("confidence"),
                             F.lit("active").alias("status"), "n_mentions")
                 .unionByName(materialize.fact_nodes(ext_all)))
        nodes.write.mode("overwrite").parquet(self._path("nodes_next"))
        final_n = self._path("nodes")
        tmp_old = self._path("nodes_old")
        if os.path.exists(final_n):
            os.rename(final_n, tmp_old)
        os.rename(self._path("nodes_next"), final_n)
        if os.path.exists(tmp_old):
            import shutil
            shutil.rmtree(tmp_old)

        # this batch's triples through the same relabel path as the batch
        # pipeline — occurrence re-resolution consults the cumulative store
        # (cumulative forms/clusters) but only needs THIS batch's occurrences
        # (earlier conversations' resolutions are immutable, see module
        # docstring), so its cost is bounded by the batch, not the store
        occ = materialize.occurrence_map(
            ext_b, forms, forms_c, self._read("nodes"), matches,
            threshold=self.threshold, max_block=self.max_block)
        facts_in = (ext_b.filter(F.col("kind") == "fact")
                    .select("conv_id", "fact_type",
                            F.col("definition").alias("text"),
                            F.col("related").alias("related_entities")))
        raw = (infer.infer_stage(ext_b)
               .unionByName(infer.infer_facts_stage(ext_b, facts_in))
               .localCheckpoint())
        targets = (raw.select("conv_id", F.lower("subj").alias("name_l"))
                   .unionAll(raw.select("conv_id",
                                        F.lower("obj").alias("name_l")))
                   .unionAll(ext_b.filter(F.col("kind") == "fact")
                             .select("conv_id",
                                     F.explode("related").alias("rel"))
                             .select("conv_id",
                                     F.lower("rel").alias("name_l"))))
        mention_map = materialize.resolve_names(
            targets, ext_all, forms_c, occ_map=occ).localCheckpoint()
        edges = (materialize.materialize_edges(raw, mention_map)
                 .unionByName(materialize.fact_about_edges(ext_b,
                                                           mention_map)))
        edges.write.mode("overwrite").parquet(
            os.path.join(self._path("edges"), f"batch={bid}"))

        st["n_batches"] = max(st["n_batches"], bid + 1)
        if hi is not None:
            st["max_conv_id"] = max(st["max_conv_id"], hi)
        self._save_state(st)

    # -- read side ---------------------------------------------------------
    def nodes(self) -> DataFrame:
        return self._read("nodes")

    def edges(self) -> DataFrame:
        return self._read("edges")

    def triples(self) -> DataFrame:
        return materialize.triples_view(self.edges(), self.nodes())
