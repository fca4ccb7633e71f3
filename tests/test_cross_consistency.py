"""Cross-estimator consistency gates at the QUERY level (VERDICT r2 #5).

The sketch queries are `no_oracle` in the driver's DuckDB gate (register
state is not SQL-expressible), so each is statistically verified in
isolation elsewhere.  Here they are tied to their ORACLE-GREEN exact twins
on the same sf0.01 corpus: every sketch estimate must agree with the exact
quantity the twin computes — bounds bracket exact jaccards, joint estimates
track them, sketch cardinalities track exact distinct counts, and the
ANN-routed pair set embeds into the exact pair set with bit-equal scores.
"""

from __future__ import annotations

import numpy as np
import pytest

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def q():
    return entry.queries()


def _rows(q, spark, name, cols):
    df = q[name](spark, SF_DIR)
    return [tuple(r[c] for c in cols) for r in df.select(*cols).collect()]


@pytest.fixture(scope="module")
def exact_jaccard(q, spark):
    """(id1, id2) -> exact n-gram jaccard from the oracle-green twin."""
    return {
        (i1, i2): jq / 1e6
        for i1, i2, jq in _rows(q, spark, "ngram_jaccard_pairs", ["id1", "id2", "jaccard_q"])
    }


def test_ghll_bounds_bracket_exact_jaccard(q, spark, exact_jaccard):
    """ghll_jaccard_bounds (sketch.hpp:701-719) vs exact ngram_jaccard_pairs:
    on every shared pair the closed-form [lower, upper] interval must cover
    the exact jaccard up to the bounds' own statistical slack (m=256)."""
    bounds = {
        (i1, i2): (lo, up)
        for i1, i2, lo, up in _rows(
            q, spark, "ghll_jaccard_bounds", ["id1", "id2", "jaccard_lower", "jaccard_upper"]
        )
    }
    shared = set(bounds) & set(exact_jaccard)
    assert len(shared) >= 10, "corpora out of sync: too few shared pairs"
    slack = 5.0 / np.sqrt(256)  # ~5 sigma of the equal-register fraction
    ok = sum(
        1
        for p in shared
        if bounds[p][0] - slack <= exact_jaccard[p] <= bounds[p][1] + slack
    )
    assert ok / len(shared) >= 0.95, (ok, len(shared))


def test_ghll_joint_tracks_exact_jaccard(q, spark, exact_jaccard):
    """ghll_joint_pairs' ML estimate vs the exact jaccard per shared pair."""
    est = {
        (i1, i2): j
        for i1, i2, j in _rows(q, spark, "ghll_joint_pairs", ["id1", "id2", "est_jaccard"])
    }
    shared = set(est) & set(exact_jaccard)
    assert len(shared) >= 10
    errs = np.array([est[p] - exact_jaccard[p] for p in shared])
    assert np.mean(np.abs(errs)) < 0.10, np.mean(np.abs(errs))
    assert np.max(np.abs(errs)) < 0.30, np.max(np.abs(errs))


def test_ghll_refine_decisions_track_exact(q, spark, exact_jaccard):
    """ghll_joint_refine (bounds prefilter + ML band) decides >= 0.5; the
    decision must agree with the exact jaccard for every shared pair whose
    exact value sits clear of the threshold (|J - 0.5| > 0.1 — inside that
    band the sketch's statistical error legitimately flips decisions)."""
    dec = {
        (i1, i2): p
        for i1, i2, p in _rows(q, spark, "ghll_joint_refine", ["id1", "id2", "passed"])
    }
    shared = [p for p in set(dec) & set(exact_jaccard) if abs(exact_jaccard[p] - 0.5) > 0.1]
    assert len(shared) >= 10
    agree = sum(1 for p in shared if dec[p] == (exact_jaccard[p] >= 0.5))
    assert agree == len(shared), (agree, len(shared))


def test_minhash_cardinality_tracks_exact_counts(q, spark):
    """minhash_est_cardinality carries BOTH the exact per-doc shingle count
    (n_shingles) and the m=128 harmonic estimate — rel RMSE must sit inside
    the 1/sqrt(m-2) theory band (sketch.hpp:1383-1389)."""
    rows = _rows(q, spark, "minhash_est_cardinality", ["n_shingles", "est_shingles"])
    rel = np.array([(e - n) / n for n, e in rows if n >= 30])
    assert len(rel) >= 100
    th = 1.0 / np.sqrt(128 - 2)
    rmse = float(np.sqrt(np.mean(rel**2)))
    assert rmse < 2.0 * th, (rmse, th)
    assert abs(float(np.mean(rel))) < 4.0 * th / np.sqrt(len(rel)) + 0.02


@pytest.mark.parametrize("qname,m", [
    ("ghll_distinct_users", 1024),
    ("setsketch_distinct_users", 1024),
])
def test_sketch_distinct_users_track_exact(q, spark, qname, m):
    """The distributed sketch aggregates vs the oracle-green exact
    countDistinct twin, per event_type group."""
    exact = dict(_rows(q, spark, "distinct_users_exact", ["event_type", "n_users"]))
    est = dict(_rows(q, spark, qname, ["event_type", "est_users"]))
    assert set(est) == set(exact)
    th = np.sqrt((3.0 * np.log(2.0) - 1.0) / m)  # b=2 theory rel-RMSE
    for k, n in exact.items():
        rel = abs(est[k] - n) / n
        assert rel < 5.0 * th, (qname, k, est[k], n, rel)


def test_register_cardinalities_track_exact_shingle_counts(q, spark):
    """setsketch_doc_cardinality + hmh_doc_cardinality (m=256 / p=10) vs the
    exact per-doc shingle counts carried by minhash_est_cardinality — all
    three queries shingle with the identical DOC_PCFG config, so the sketch
    estimates target exactly those counts."""
    exact = {}
    for r in q["minhash_est_cardinality"](spark, SF_DIR).collect():
        exact[r["doc_id"]] = r["n_shingles"]
    for qname, m in (("setsketch_doc_cardinality", 256), ("hmh_doc_cardinality", 1024)):
        est = dict(_rows(q, spark, qname, ["doc_id", "est_shingles"]))
        assert set(est) == set(exact)
        rel = np.array(
            [(est[d] - n) / n for d, n in exact.items() if n >= 30]
        )
        th = np.sqrt((3.0 * np.log(2.0) - 1.0) / m)
        rmse = float(np.sqrt(np.mean(rel**2)))
        assert rmse < 2.5 * th, (qname, rmse, th)


def test_ann_pairs_subset_of_exact_with_bitequal_scores(q, spark):
    """embedding_near_dup_pairs_ann ⊆ embedding_near_dup_pairs with
    bit-equal cos_q (identical _cos_q expression), recall >= 0.95."""
    exact = {
        (i1, i2): c
        for i1, i2, c in _rows(q, spark, "embedding_near_dup_pairs", ["id1", "id2", "cos_q"])
    }
    ann = {
        (i1, i2): c
        for i1, i2, c in _rows(q, spark, "embedding_near_dup_pairs_ann", ["id1", "id2", "cos_q"])
    }
    assert set(ann) <= set(exact)
    for p, c in ann.items():
        assert c == exact[p], p
    assert len(ann) / len(exact) >= 0.95


def test_winnow_pairs_superset_of_substring_blocks(q, spark):
    """winnow_substring_pairs (sampled fingerprints, k=8/window=4) must
    cover every pair the oracle-green substring_block_pairs twin finds with
    >= 3 shared full k=16 grams: a 16-byte shared substring contains 9
    k=8 grams, so winnowing's min-per-window sampling keeps >= 1 shared
    print per block at these parameters."""
    wp = {(r["id1"], r["id2"]) for r in q["winnow_substring_pairs"](spark, SF_DIR).collect()}
    sp = {(r["id1"], r["id2"]) for r in q["substring_block_pairs"](spark, SF_DIR).collect()}
    assert len(sp) >= 10
    assert sp <= wp, sorted(sp - wp)[:5]


def test_hmh_joint_tracks_exact_jaccard(q, spark, exact_jaccard):
    """hmh_joint_pairs (collision-corrected HyperMinHash original estimator,
    sketch.hpp:1785-1821) vs exact n-gram jaccard on shared pairs."""
    est = {
        (i1, i2): j
        for i1, i2, j in _rows(q, spark, "hmh_joint_pairs", ["id1", "id2", "est_jaccard"])
    }
    shared = set(est) & set(exact_jaccard)
    assert len(shared) >= 10
    errs = np.array([est[p] - exact_jaccard[p] for p in shared])
    assert np.mean(np.abs(errs)) < 0.03, np.mean(np.abs(errs))
    assert np.max(np.abs(errs)) < 0.10, np.max(np.abs(errs))


def test_minhash_near_dup_pairs_track_exact(q, spark, exact_jaccard):
    """minhash_near_dup_pairs (OPH + LSH + verification at t=0.5) vs the
    exact twin: every exact pair clear above threshold (J >= 0.6) is found,
    no found pair has exact J below 0.35, and the estimates track."""
    est = {
        (i1, i2): j
        for i1, i2, j in _rows(
            q, spark, "minhash_near_dup_pairs", ["id1", "id2", "est_jaccard"]
        )
    }
    clear_hi = {p for p, j in exact_jaccard.items() if j >= 0.6}
    assert len(clear_hi) >= 10
    assert clear_hi <= set(est), sorted(clear_hi - set(est))[:5]
    for p in set(est) & set(exact_jaccard):
        assert exact_jaccard[p] >= 0.35, (p, exact_jaccard[p])
    errs = np.array([est[p] - exact_jaccard[p] for p in set(est) & set(exact_jaccard)])
    assert np.max(np.abs(errs)) < 0.15, np.max(np.abs(errs))


def test_bbit_signatures_bracket_exact_jaccard(q, spark, exact_jaccard):
    """bbit_signatures (8-bit compacted dense m=128 registers): the
    collision-corrected equal-register fraction (frac - 2^-b)/(1 - 2^-b)
    (Li & Koenig) must track exact jaccard on the exact twin's pairs."""
    bb = {
        r["doc_id"]: np.frombuffer(bytes(r["bbit_sig"]), dtype=np.uint8)
        for r in q["bbit_signatures"](spark, SF_DIR).collect()
    }
    pairs = [(p, j) for p, j in exact_jaccard.items() if p[0] in bb and p[1] in bb]
    assert len(pairs) >= 10
    errs = []
    for (i1, i2), j in pairs:
        frac = float((bb[i1] == bb[i2]).mean())
        errs.append((frac - 1.0 / 256) / (1.0 - 1.0 / 256) - j)
    errs = np.array(errs)
    assert np.mean(np.abs(errs)) < 0.05, np.mean(np.abs(errs))
    assert np.max(np.abs(errs)) < 0.12, np.max(np.abs(errs))


def test_clear_dup_pairs_coclustered_in_minhash_clusters(q, spark, exact_jaccard):
    """Every pair the oracle-green exact twin marks as a clear near-dup
    (exact n-gram jaccard >= 0.6, well above the t=0.5 config) must land in
    ONE cluster in dup_clusters_minhash — the cluster assignments match the
    exact pair structure, not just the pair estimates (the north rule's
    cluster-assignment criterion at query level; sf0.01 has no
    byte-identical docs, so near-dup pairs are the strongest fixture)."""
    clear = [p for p, j in exact_jaccard.items() if j >= 0.6]
    assert len(clear) >= 10
    # file_id = xxhash64(doc_id) (with_file_id); recover the doc_id mapping
    from pyspark.sql import functions as F

    id_map = {
        r["doc_id"]: r["fid"]
        for r in entry._docs(spark, SF_DIR)
        .select("doc_id", F.xxhash64("doc_id").alias("fid"))
        .collect()
    }
    cl = dict(_rows(q, spark, "dup_clusters_minhash", ["file_id", "cluster_id"]))
    for i1, i2 in clear:
        assert cl[id_map[i1]] == cl[id_map[i2]], (i1, i2)


def test_lsh_candidates_cover_verified_pairs(q, spark):
    """lsh_candidates must cover every pair that survives verification in
    minhash_near_dup_pairs (same DOC_PCFG config): the banding stage's
    recall gate at query level."""
    cand = {(r["id1"], r["id2"]) for r in q["lsh_candidates"](spark, SF_DIR).collect()}
    ver = {(r["id1"], r["id2"]) for r in q["minhash_near_dup_pairs"](spark, SF_DIR).collect()}
    assert len(ver) >= 10
    assert ver <= cand, sorted(ver - cand)[:5]


def test_ann_clusters_refine_exact_clusters(q, spark):
    """embedding_near_dup_clusters_ann vs the oracle-green recursive-CTE
    exact twin: ANN co-clustered pairs are a subset of exact co-clustered
    pairs (LSH can only MISS edges, never invent them — scores are
    bit-equal) at recall >= 0.9."""
    def co_pairs(rows):
        import itertools

        groups = {}
        for r in rows:
            groups.setdefault(r["cluster_id"], []).append(r["vec_id"])
        return {
            tuple(sorted(p))
            for g in groups.values()
            for p in itertools.combinations(g, 2)
        }

    pe = co_pairs(q["embedding_near_dup_clusters"](spark, SF_DIR).collect())
    pa = co_pairs(q["embedding_near_dup_clusters_ann"](spark, SF_DIR).collect())
    assert len(pe) >= 10
    assert pa <= pe, sorted(pa - pe)[:5]
    assert len(pa) / len(pe) >= 0.9, (len(pa), len(pe))


def test_simhash_pairs_are_exact_near_dups(q, spark, exact_jaccard):
    """Every simhash pair (64-bit token-profile fingerprints at the query's
    hamming cap) must appear in the exact n-gram twin's pair set with high
    exact jaccard — simhash collisions at small hamming distance imply
    near-identical token profiles on this corpus."""
    sh = [
        (tuple(sorted((r["id1"], r["id2"]))), r["hamming"])
        for r in q["simhash_pairs"](spark, SF_DIR).collect()
    ]
    assert len(sh) >= 8
    for p, h in sh:
        assert p in exact_jaccard, (p, h)
        assert exact_jaccard[p] >= 0.9, (p, h, exact_jaccard[p])


def test_incremental_near_dup_matches_full_pair_set(q, spark):
    """incremental_near_dup (odd ids = new batch, even = snapshot) vs the
    full-corpus minhash_near_dup_pairs under the SAME config: the
    incremental path must produce EXACTLY the full pair set restricted to
    pairs involving at least one new id, with bit-equal estimates — the
    batch-vs-corpus factorization loses nothing and invents nothing."""
    inc = {
        (r["id1"], r["id2"]): r["est_jaccard"]
        for r in q["incremental_near_dup"](spark, SF_DIR).collect()
    }
    full = {
        (r["id1"], r["id2"]): r["est_jaccard"]
        for r in q["minhash_near_dup_pairs"](spark, SF_DIR).collect()
    }
    want = {p: j for p, j in full.items() if p[0] % 2 == 1 or p[1] % 2 == 1}
    assert len(want) >= 5
    assert set(inc) == set(want), (
        sorted(set(want) - set(inc))[:5], sorted(set(inc) - set(want))[:5]
    )
    for p in want:
        assert inc[p] == want[p], (p, inc[p], want[p])


def test_incremental_exact_dedup_complements_snapshot(q, spark):
    """Survivors of incremental_exact_dedup + new docs whose text already
    exists in the snapshot partition the whole new batch (by group)."""
    import __spark_entry__ as em
    from pyspark.sql import functions as F

    docs = em._docs(spark, SF_DIR)
    new_texts = {r["text"] for r in docs.filter(F.col("doc_id") % 2 == 1).collect()}
    old_texts = {r["text"] for r in docs.filter(F.col("doc_id") % 2 == 0).collect()}
    surv = q["incremental_exact_dedup"](spark, SF_DIR).count()
    assert surv == len(new_texts - old_texts)


def test_ivf_topk_subset_of_exact_with_bitequal_scores(q, spark):
    """ann_ivf_topk vs the oracle-green brute-force twin on the sf0.01
    embeddings: every IVF hit for the exact twin's query subset carries a
    bit-equal cos_q (shared scoring expression), and recall over the twin's
    true top-k is high at n_probe=8/16."""
    exact = {
        (r["query_id"], r["neighbor_id"]): r["cos_q"]
        for r in q["ann_topk"](spark, SF_DIR).collect()
    }
    ivf = {
        (r["query_id"], r["neighbor_id"]): r["cos_q"]
        for r in q["ann_ivf_topk"](spark, SF_DIR).collect()
    }
    qids = {p[0] for p in exact}
    # ann_topk is k=10 over vec_id<32 queries; ann_ivf_topk is k=5 over all
    truth5 = {p for p, _ in exact.items()}  # top-10 superset of top-5
    shared = {p for p in ivf if p[0] in qids}
    hits = {p for p in shared if p in truth5}
    for p in hits:
        assert ivf[p] == exact[p], p
    assert len(shared) >= 50
    assert len(hits) / len(shared) >= 0.9, (len(hits), len(shared))


def test_minhash_signatures_bitequal_numpy_oracle(q, spark):
    """minhash_signatures (the Arrow-UDF production path) vs the single-node
    numpy oracle at the IDENTICAL DOC_PCFG config: every register buffer and
    shingle count must be BIT-EQUAL — the signature state itself is gated,
    not just downstream pair/cluster agreement (VERDICT r4 #5)."""
    from set_sketch_paper_spark.sketchlib.minhash import minhash_batch
    from set_sketch_paper_spark.sketchlib.shingle import shingle_sets_batch

    pcfg = entry.DOC_PCFG
    docs = entry._docs(spark, SF_DIR).select("doc_id", "text").toPandas()
    docs = docs.sort_values("doc_id").reset_index(drop=True)
    values, offsets = shingle_sets_batch(
        docs["text"].tolist(),
        pcfg.shingle.k,
        pcfg.shingle.token_pattern,
        pcfg.shingle.lowercase,
        pcfg.shingle.seed,
    )
    want_sigs, want_sizes = minhash_batch(
        values, offsets, pcfg.minhash.num_registers, pcfg.minhash.seed,
        pcfg.minhash.algo,
    )
    got = {
        r["doc_id"]: (bytes(r["sig"]), r["n_shingles"])
        for r in q["minhash_signatures"](spark, SF_DIR).collect()
    }
    assert len(got) == len(docs)
    for i, doc_id in enumerate(docs["doc_id"]):
        sig, n = got[doc_id]
        assert n == int(want_sizes[i]), (doc_id, n, want_sizes[i])
        assert sig == want_sigs[i].astype("<u8").tobytes(), doc_id


def test_ann_lsh_topk_recall_vs_exact(q, spark):
    """ann_lsh_topk (hyperplane LSH, n_bits=6/n_tables=6) vs the
    oracle-green brute-force twin, gated where LSH's guarantee applies.

    The sf0.01 embeddings are near-isotropic (median exact-top-10 cosine
    ~0.29): global top-k over noise-level similarities has NO sublinear
    structure, so flat top-k is the IVF path's job (gated >= 0.9 in
    test_ivf_topk_subset_of_exact_with_bitequal_scores).  Hyperplane
    collision probability is monotone in cosine — (1 - theta/pi)^n_bits
    per table — so THIS gate asserts (a) every LSH hit inside the exact
    top-10 carries a bit-equal cos_q (shared _cos_q scoring expression)
    and (b) recall stratified by cosine sits in its deterministic band
    (seeded hyperplanes + fixed corpus: these numbers are exact
    reproductions, not statistics — any drift means the hashing or
    scoring code changed)."""
    exact = {
        (r["query_id"], r["neighbor_id"]): r["cos_q"]
        for r in q["ann_topk"](spark, SF_DIR).collect()
    }
    lsh = {
        (r["query_id"], r["neighbor_id"]): r["cos_q"]
        for r in q["ann_lsh_topk"](spark, SF_DIR).collect()
    }
    hits = set(lsh) & set(exact)
    assert len(hits) >= 30
    for p in hits:
        assert lsh[p] == exact[p], p

    def recall(lo):
        sel = [p for p, c in exact.items() if c >= lo]
        return sum(1 for p in sel if p in lsh) / len(sel), len(sel)

    # measured bands on this corpus/seed: 0.36 @ >=0.35, 0.625 @ >=0.40,
    # against ~0.09 for a random candidate set of the same size
    r35, n35 = recall(350_000)
    r40, n40 = recall(400_000)
    assert n35 >= 20 and r35 >= 0.30, (r35, n35)
    assert n40 >= 5 and r40 >= 0.50, (r40, n40)


def test_token_topk_mg_exact_at_large_capacity(q, spark):
    """With capacity >= any partition's distinct-token count the MG sketch
    makes zero decrements, so token_topk_mg == the oracle-green vocab_topk
    twin bit-for-bit (same tokens, same order, count_min == count_max == n)."""
    from set_sketch_paper_spark.operators.freq import token_topk_mg

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = token_topk_mg(docs, k=50, capacity=1 << 20).collect()
    want = _rows(q, spark, "vocab_topk", ["token", "n"])
    assert [(r.token, r.count_min) for r in got] == want
    assert all(r.count_min == r.count_max for r in got)


def test_token_topk_mg_brackets_exact_at_small_capacity(q, spark):
    """At sketch-sized capacity the brackets must hold: count_min <= true n
    <= count_max for every reported token, and the production query's
    top ranks agree with the exact twin's wherever brackets don't overlap."""
    exact = dict(_rows(q, spark, "vocab_topk", ["token", "n"]))
    got = q["token_topk_mg"](spark, SF_DIR).collect()
    # sf0.001's vocabulary may be smaller than k; match the exact twin's size
    assert len(got) == len(exact)
    for r in got:
        if r.token in exact:
            assert r.count_min <= exact[r.token] <= r.count_max, r.token
    # provable-rank-1: when the leader's lower bound clears the runner-up's
    # upper bound, it must be the exact twin's top token
    top_exact = [t for t, _ in sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))]
    if got[0].count_min > got[1].count_max:
        assert got[0].token == top_exact[0]
