"""ANN recall vs exact brute force, and centroid exactness."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from set_sketch_paper_spark.operators.similarity import (
    cosine_near_dup_pairs,
    cosine_near_dup_pairs_ann,
    cosine_topk_bruteforce,
    hyperplane_ann_topk,
    label_centroids_quantized,
)


@pytest.fixture(scope="module")
def emb_df(spark):
    rng = np.random.RandomState(11)
    n, dim, n_clusters = 400, 32, 12
    centers = rng.standard_normal((n_clusters, dim)) * 3
    labels = rng.randint(0, n_clusters, size=n)
    vecs = centers[labels] + rng.standard_normal((n, dim))
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(n),
            "embedding": [v.astype(np.float32).tolist() for v in vecs],
            "label": labels.astype(np.int32),
        }
    )
    return spark.createDataFrame(pdf)


def test_ann_recall_vs_bruteforce(emb_df):
    k = 5
    exact = cosine_topk_bruteforce(emb_df, k=k).collect()
    approx = hyperplane_ann_topk(emb_df, k=k, n_bits=6, n_tables=8).collect()
    truth = {(r["query_id"], r["neighbor_id"]) for r in exact}
    got = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(truth & got) / len(truth)
    # clustered data + 8 tables of 6 bits: near neighbors share buckets whp
    assert recall >= 0.8, recall


def test_ann_scores_match_exact_for_found_pairs(emb_df):
    exact = {
        (r["query_id"], r["neighbor_id"]): r["cos_q"]
        for r in cosine_topk_bruteforce(emb_df, k=5).collect()
    }
    for r in hyperplane_ann_topk(emb_df, k=5, n_bits=6, n_tables=8).collect():
        key = (r["query_id"], r["neighbor_id"])
        if key in exact:
            assert r["cos_q"] == exact[key], key


def test_ann_near_dup_recall_and_exact_scores(emb_df):
    """cosine_near_dup_pairs_ann: pairs are a high-recall subset of the
    exact crossJoin twin, with BIT-IDENTICAL cos_q on every emitted pair
    (shared _cos_q expression), and zero false positives."""
    threshold = 800_000
    exact = {
        (r["id1"], r["id2"]): r["cos_q"]
        for r in cosine_near_dup_pairs(emb_df, threshold_q=threshold).collect()
    }
    assert len(exact) > 10  # the clustered fixture plants plenty of near-dups
    got = {
        (r["id1"], r["id2"]): r["cos_q"]
        for r in cosine_near_dup_pairs_ann(
            emb_df, threshold_q=threshold, n_bits=6, n_tables=8
        ).collect()
    }
    assert set(got) <= set(exact)  # never invents a pair
    recall = len(set(got) & set(exact)) / len(exact)
    assert recall >= 0.95, recall
    for key, cos_q in got.items():
        assert cos_q == exact[key], key


def test_ann_bucket_cap_engages(emb_df):
    """bucket_cap=1 drops every bucket (all candidate pairs vanish)."""
    got = cosine_near_dup_pairs_ann(
        emb_df, threshold_q=0, n_bits=6, n_tables=2, bucket_cap=1
    ).count()
    assert got == 0


def test_label_centroids_exact(emb_df):
    got = {
        (r["label"], r["pos"]): (r["sum_q"], r["n"])
        for r in label_centroids_quantized(emb_df).collect()
    }
    pdf = emb_df.toPandas()
    for label, grp in pdf.groupby("label"):
        mat = np.vstack(
            [np.round(np.asarray(v, dtype=np.float64) * 1000).astype(np.int64)
             for v in grp["embedding"]]
        )
        sums = mat.sum(axis=0)
        for pos in range(mat.shape[1]):
            assert got[(int(label), pos)] == (int(sums[pos]), len(grp))


def test_ivf_recall_vs_bruteforce(emb_df):
    """IVF coarse quantizer on clustered data: probing a quarter of the
    cells recovers most true neighbors (near neighbors co-assign whp)."""
    from set_sketch_paper_spark.operators.similarity import ivf_ann_topk

    k = 5
    exact = cosine_topk_bruteforce(emb_df, k=k).collect()
    approx = ivf_ann_topk(emb_df, k=k, n_cells=16, n_probe=4).collect()
    truth = {(r["query_id"], r["neighbor_id"]) for r in exact}
    got = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(truth & got) / len(truth)
    assert recall >= 0.6, recall
    # and scores on found pairs are bit-equal (shared _cos_q expression)
    ex = {
        (r["query_id"], r["neighbor_id"]): r["cos_q"] for r in exact
    }
    for r in approx:
        key = (r["query_id"], r["neighbor_id"])
        if key in ex:
            assert r["cos_q"] == ex[key], key


def test_ivf_exhaustive_probe_equals_bruteforce(emb_df):
    """n_probe == n_cells probes every cell, so IVF must return EXACTLY the
    brute-force top-k (same _cos_q scores, same deterministic tie-break) —
    the strongest equivalence gate on the candidate machinery."""
    from set_sketch_paper_spark.operators.similarity import ivf_ann_topk

    k = 5
    exact = sorted(
        tuple(r) for r in cosine_topk_bruteforce(emb_df, k=k)
        .select("query_id", "neighbor_id", "rank", "cos_q").collect()
    )
    full = sorted(
        tuple(r) for r in ivf_ann_topk(emb_df, k=k, n_cells=8, n_probe=8)
        .select("query_id", "neighbor_id", "rank", "cos_q").collect()
    )
    assert exact == full


def test_ivf_recall_monotone_in_probes(emb_df):
    """More probed cells never lose neighbors: recall is monotone in
    n_probe (candidate sets are nested by construction)."""
    from set_sketch_paper_spark.operators.similarity import ivf_ann_topk

    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk_bruteforce(emb_df, k=5).collect()
    }
    recalls = []
    for npb in (1, 4, 16):
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in ivf_ann_topk(emb_df, k=5, n_cells=16, n_probe=npb).collect()
        }
        recalls.append(len(truth & got) / len(truth))
    assert recalls == sorted(recalls), recalls
    assert recalls[-1] == 1.0, recalls


def test_ivf_queries_param_matches_filtered_full_run(emb_df):
    """Restricting the probe side via ``queries`` returns exactly the
    unrestricted run's rows for those query ids (probe restriction changes
    WHO asks, never the answers)."""
    from set_sketch_paper_spark.operators.similarity import ivf_ann_topk

    full = [
        tuple(r)
        for r in ivf_ann_topk(emb_df, k=5, n_cells=16, n_probe=4)
        .filter(F.col("query_id") < 40)
        .select("query_id", "neighbor_id", "rank", "cos_q").collect()
    ]
    sub = [
        tuple(r)
        for r in ivf_ann_topk(
            emb_df, k=5, n_cells=16, n_probe=4,
            queries=emb_df.filter(F.col("vec_id") < 40),
        )
        .select("query_id", "neighbor_id", "rank", "cos_q").collect()
    ]
    assert sorted(full) == sorted(sub)
