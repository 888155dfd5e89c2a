"""Self-consistency tests for the training-data operators (dedup, similarity,
text analysis, multimodal plumbing) on constructed corpora with known
ground truth.
"""
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),        # exact dup of 0
        (2, "the quick brown fox jumps over the lazy cat"),        # near dup of 0
        (3, "completely different content about spark engines"),
        (4, "der schnelle braune fuchs springt und ist nicht mit"),
        (5, "le renard brun rapide saute et est un pour les"),
        (6, "the quick brown fox jumps over the lazy dog today"),  # near dup of 0
        (7, "el zorro marrón rápido salta y es un por los que"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_duplicates(spark, docs):
    from knowledgegraphsiqidis_spark.operators.dedup import (
        dedup_keep_first, exact_duplicates)
    groups = exact_duplicates(docs).collect()
    assert len(groups) == 1
    assert groups[0]["n_docs"] == 2 and groups[0]["min_doc_id"] == 0
    kept = dedup_keep_first(docs)
    assert kept.count() == 7
    assert kept.filter(F.col("doc_id") == 1).count() == 0


def test_ngram_jaccard_pairs(spark, docs):
    from knowledgegraphsiqidis_spark.operators.dedup import ngram_jaccard_pairs
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in ngram_jaccard_pairs(docs, n=3, threshold=0.5).collect()}
    assert pairs[(0, 1)] == 1.0           # exact dup
    assert (0, 2) in pairs                # near dup shares most shingles
    assert (0, 3) not in pairs


def test_ngram_sizes_join_strategy_invariant(spark, docs, monkeypatch):
    """The df-capped path picks its sizes-join strategy from the sizes
    rowcount (broadcast when small, sort-merge pin otherwise).  Strategy
    must never change results: force EACH branch and compare the full
    (id_a, id_b, jaccard) sets."""
    from knowledgegraphsiqidis_spark.operators import dedup

    def run():
        return {(r["id_a"], r["id_b"], round(r["jaccard"], 6))
                for r in dedup.ngram_jaccard_pairs(
                    docs, n=3, threshold=0.2, max_df=100).collect()}

    monkeypatch.setattr(dedup, "_SIZES_BROADCAST_MAX_DOCS", 1_000_000)
    bcast = run()
    monkeypatch.setattr(dedup, "_SIZES_BROADCAST_MAX_DOCS", 0)
    merge = run()
    assert bcast == merge
    assert bcast  # non-trivial pair set on the fixture corpus


def test_minhash_lsh_finds_near_dups(spark, docs):
    from knowledgegraphsiqidis_spark.operators.dedup import minhash_lsh_pairs
    pairs = {(r["id_a"], r["id_b"]): r["est_jaccard"]
             for r in minhash_lsh_pairs(docs, threshold=0.5).collect()}
    assert pairs[(0, 1)] == 1.0
    assert (0, 3) not in pairs


def test_simhash_near_pairs(spark, docs):
    from knowledgegraphsiqidis_spark.operators.dedup import (
        simhash, simhash_near_pairs)
    fp = {r["id"]: r["simhash"] for r in simhash(docs).collect()}
    assert fp[0] == fp[1]
    pairs = {(r["id_a"], r["id_b"]) for r in
             simhash_near_pairs(docs, max_hamming=16).collect()}
    assert (0, 1) in pairs
    hamming_03 = bin(fp[0] ^ fp[3]).count("1")
    assert hamming_03 > 16  # unrelated docs stay far apart


def test_language_id(spark, docs):
    from knowledgegraphsiqidis_spark.operators.textanalysis import language_id
    pred = {r["doc_id"]: r["pred_lang"] for r in language_id(docs).collect()}
    assert pred[0] == "en" and pred[4] == "de" and pred[5] == "fr" \
        and pred[7] == "es"


def test_token_stats_and_quality(spark, docs):
    from knowledgegraphsiqidis_spark.operators.textanalysis import (
        quality_score, token_stats)
    ts = {r["doc_id"]: r for r in token_stats(docs).collect()}
    assert ts[0]["n_tokens"] == 9
    q = {r["doc_id"]: r["quality"] for r in quality_score(docs).collect()}
    assert all(0.0 <= v <= 1.0 for v in q.values())


def test_cosine_topk_exact(spark):
    from knowledgegraphsiqidis_spark.operators.similarity import cosine_topk
    vecs = [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 1.0]), (3, [-1.0, 0.0])]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    q = spark.createDataFrame([(0, [1.0, 0.0])],
                              "query_id long, query_vec array<double>")
    top = cosine_topk(emb, q, k=3).collect()
    assert [r["vec_id"] for r in sorted(top, key=lambda r: r["rank"])] == [1, 2, 3]


def test_lsh_cosine_pairs(spark):
    from knowledgegraphsiqidis_spark.operators.similarity import lsh_cosine_pairs
    import math
    vecs = []
    for i in range(20):
        angle = (i % 5) * 0.7
        vecs.append((i, [math.cos(angle), math.sin(angle)]))
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    pairs = lsh_cosine_pairs(emb, dim=2, n_planes=4, threshold=0.99)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    # identical-angle vectors (i ≡ j mod 5) must be found
    assert (0, 5) in got and (1, 6) in got
    assert all(a % 5 == b % 5 for a, b in got)


def test_lsh_cosine_pairs_max_bucket(spark):
    """The hot-bucket occupancy cap (the ER max_block analogue): capped
    output is pairs among the EARLIEST max_bucket ids of each (band,
    bucket) — a deterministic subset of the uncapped pair set that still
    connects every clique's first members — and the default (None) stays
    the exact uncapped set the CORRECTNESS oracle replicates."""
    from knowledgegraphsiqidis_spark.operators.similarity import lsh_cosine_pairs
    import math
    vecs = []
    for i in range(20):
        # two ANTIPODAL cliques of 10 identical vectors each: every plane
        # separates them (sign(p·v) != sign(p·-v)), so each (band, bucket)
        # holds exactly one clique and the capped set is predictable
        angle = (i % 2) * math.pi
        vecs.append((i, [math.cos(angle), math.sin(angle)]))
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    full = {(r["id_a"], r["id_b"]) for r in
            lsh_cosine_pairs(emb, dim=2, n_planes=4,
                             threshold=0.99).collect()}
    capped = {(r["id_a"], r["id_b"]) for r in
              lsh_cosine_pairs(emb, dim=2, n_planes=4, threshold=0.99,
                               max_bucket=3).collect()}
    assert capped <= full
    # each clique (even ids / odd ids) keeps exactly its first 3 members
    # -> C(3,2) = 3 pairs per clique
    assert capped == {(0, 2), (0, 4), (2, 4), (1, 3), (1, 5), (3, 5)}
    # uncapped: every within-clique pair (2 * C(10,2))
    assert len(full) == 90


def test_multimodal_plumbing(spark, docs):
    from knowledgegraphsiqidis_spark.operators.multimodal import (
        extract_features, synth_media)
    media = synth_media(spark, docs)
    feats = extract_features(media)
    rows = feats.collect()
    assert len(rows) == docs.count()
    assert all(len(r["feature"]) == 8 for r in rows)
    assert all(0.0 <= v <= 1.0 for r in rows for v in r["feature"])
    # deterministic: same payload -> same hash/feature
    by_id = {r["media_id"]: r for r in rows}
    assert by_id["m-0"]["content_hash"] == by_id["m-1"]["content_hash"]


def test_ivf_full_probe_equals_bruteforce(spark):
    """n_probe >= n_centroids probes every cell, so IVF must reproduce the
    exhaustive cosine_topk row-for-row (ranks, ids, rounded cosines)."""
    import numpy as np
    from knowledgegraphsiqidis_spark.operators.similarity import (
        cosine_topk, ivf_topk)
    rng = np.random.RandomState(0)
    vecs = [(i, (rng.standard_normal(8)).tolist()) for i in range(40)]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    qs = spark.createDataFrame([(i, vecs[i][1]) for i in (0, 7, 23)],
                               "query_id long, query_vec array<double>")
    brute = sorted(map(tuple, cosine_topk(emb, qs, k=5).collect()))
    ivf = sorted(map(tuple, ivf_topk(emb, qs, k=5, n_centroids=8,
                                     n_probe=8).collect()))
    assert ivf == brute and len(brute) == 15


def test_ivf_probed_recall_and_determinism(spark):
    """Well-separated clusters: probing 1 of 6 cells keeps high recall vs
    brute force; repeated runs are bit-identical (seeded training)."""
    import numpy as np
    from knowledgegraphsiqidis_spark.operators.similarity import (
        cosine_topk, ivf_topk)
    rng = np.random.RandomState(1)
    centers = np.eye(3)
    vecs = []
    for c in range(3):
        for j in range(12):
            v = centers[c] + 0.05 * rng.standard_normal(3)
            vecs.append((c * 12 + j, (v / np.linalg.norm(v)).tolist()))
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    qs = spark.createDataFrame(
        [(100 + c, centers[c].tolist()) for c in range(3)],
        "query_id long, query_vec array<double>")
    kw = dict(k=5, n_centroids=6, n_probe=1)
    got = {(r["query_id"], r["vec_id"]) for r in
           ivf_topk(emb, qs, **kw).collect()}
    want = {(r["query_id"], r["vec_id"]) for r in
            cosine_topk(emb, qs, k=5).collect()}
    recall = len(got & want) / len(want)
    assert recall >= 0.8, recall
    again = {(r["query_id"], r["vec_id"]) for r in
             ivf_topk(emb, qs, **kw).collect()}
    assert again == got


def test_embedding_near_dup(spark, docs):
    """Semantic near-dup completes the dedup family: exact + near pairs
    found, cross-language/content pairs rejected, pairs agree with the
    driver-side kernel cosine."""
    from knowledgegraphsiqidis_spark.functions.embedding import (
        cosine, hash_embedding)
    from knowledgegraphsiqidis_spark.operators.dedup import embedding_near_dup
    got = {(r["id_a"], r["id_b"]): r["cosine"]
           for r in embedding_near_dup(docs, threshold=0.85).collect()}
    assert got[(0, 1)] == 1.0                       # exact dup
    assert (0, 6) in got                            # near dup (kernel 0.945)
    assert all({a, b} <= {0, 1, 2, 6} for a, b in got)  # no cross-content
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for (a, b), c in got.items():
        k = cosine(hash_embedding(texts[a]), hash_embedding(texts[b]))
        assert c == pytest.approx(k, abs=1e-4), (a, b)
