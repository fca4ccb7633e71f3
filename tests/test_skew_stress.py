"""Boilerplate mega-band skew stress (VERDICT r5 #2, SURVEY §7.3 hazard).

A real crawl concentrates hot keys far beyond the 5% the synthetic fixture
plants: here ~10% of a 2,000-doc corpus shares one 200-token license header
(the "mega-band"), with genuine near-duplicate pairs planted among the
NON-boilerplate docs.  Asserts, at that concentration:

(a) band_cap / gram_cap keep candidate-pair counts bounded — the ~200-member
    boilerplate buckets would contribute ~C(200,2) = 19,900 pairs EACH
    uncapped, and the capped outputs must not contain the blow-up;
(b) recall for the planted non-boilerplate near-dups stays >= 0.99 through
    the capped LSH path (their bands are not hot, so the cap cannot touch
    them);
(c) the skipped-mass side channels report exactly what was dropped
    (hot band hashes with their sizes; hot grams with their frequencies).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from set_sketch_paper_spark.config import LSHConfig, MinHashConfig, PipelineConfig, ShingleConfig
from set_sketch_paper_spark.operators import lsh as lsh_ops
from set_sketch_paper_spark.operators.dedup import (
    minhash_near_dup_pairs,
    ngram_jaccard_pairs,
    shared_key_pair_counts,
)
from set_sketch_paper_spark.operators.signatures import with_minhash_signature

N_DOCS = 2_000
BOILER_FRAC = 10  # every 10th doc carries the license header
HEADER_TOKENS = 200

PCFG = PipelineConfig(
    shingle=ShingleConfig(k=3),
    minhash=MinHashConfig(num_registers=128, algo="oph"),
    lsh=LSHConfig(num_bands=32, rows_per_band=4, band_cap=100),
    jaccard_threshold=0.5,
)


def _corpus():
    """(doc_id, text) rows + the planted near-dup truth pairs."""
    rng = np.random.RandomState(1234)
    header = " ".join(f"lic{v}" for v in rng.randint(0, 5_000, size=HEADER_TOKENS))
    rows, truth = [], []
    for i in range(N_DOCS):
        if i % BOILER_FRAC == 0:
            # mega-band member: shared header + 20 unique tail tokens
            tail = " ".join(f"t{i}w{j}" for j in range(20))
            rows.append((i, f"{header} {tail}"))
        elif i % BOILER_FRAC == 1 and i + 1 < N_DOCS and (i + 1) % BOILER_FRAC == 2:
            # planted near-dup pair (i, i+1): 100 shared tokens, 4 mutated
            base = [f"d{i}x{j}" for j in range(100)]
            mut = list(base)
            for j in rng.choice(100, size=4, replace=False):
                mut[j] = f"m{i}x{j}"
            rows.append((i, " ".join(base)))
            rows.append((i + 1, " ".join(mut)))
            truth.append((i, i + 1))
        elif i % BOILER_FRAC == 2:
            continue  # emitted as the near-dup partner above
        else:
            rows.append((i, " ".join(f"b{i}u{j}" for j in range(60))))
    return rows, truth


@pytest.fixture(scope="module")
def skew(spark):
    rows, truth = _corpus()
    return spark.createDataFrame(rows, "doc_id long, text string"), truth


def test_band_cap_bounds_candidates_and_reports_skipped(spark, skew):
    docs, truth = skew
    signed = with_minhash_signature(
        docs.withColumnRenamed("text", "content"), PCFG
    ).select("doc_id", "sig", "bands").localCheckpoint(eager=True)
    boiler_members = len([i for i in range(N_DOCS) if i % BOILER_FRAC == 0])
    uncapped = lsh_ops.candidate_pairs(
        signed, LSHConfig(num_bands=32, rows_per_band=4, band_cap=10**9),
        id_col="doc_id",
    ).count()
    capped, skipped = lsh_ops.candidate_pairs(
        signed, LSHConfig(num_bands=32, rows_per_band=4, band_cap=16),
        id_col="doc_id", with_skipped=True,
    )
    n_capped = capped.count()
    # (a) the mega-band's C(200,2) ~ 19,900 quadratic expansion exists
    # uncapped and is removed by the cap — the capped candidate set is the
    # planted/background structure plus sub-cap fragments only
    assert uncapped >= boiler_members * (boiler_members - 1) // 2, uncapped
    assert n_capped <= uncapped - 15_000, (n_capped, uncapped)
    # (c) the skipped report names the hot bands at (near-)full mega-band
    # size: every band whose modal value the header dominates
    sk = skipped.collect()
    assert len(sk) >= PCFG.lsh.num_bands // 2
    assert max(r["bucket_size"] for r in sk) > boiler_members // 2
    assert all(r["bucket_size"] > 16 for r in sk)


def test_recall_on_non_boilerplate_dups_survives_cap(spark, skew):
    docs, truth = skew
    found = {
        (r["id1"], r["id2"])
        for r in minhash_near_dup_pairs(
            docs.withColumnRenamed("text", "content"), PCFG, content_col="content"
        ).collect()
    }
    hit = sum(1 for p in truth if p in found)
    assert len(truth) >= 100  # the fixture actually plants a population
    assert hit / len(truth) >= 0.99, (hit, len(truth))


def test_gram_cap_drops_only_the_mega_band_mass(spark, skew):
    docs, truth = skew
    boiler_members = len([i for i in range(N_DOCS) if i % BOILER_FRAC == 0])
    # cap below the header's doc-frequency: header grams go hot and are
    # dropped; planted dup grams (doc-frequency 2) are untouched
    out = {
        (r["id1"], r["id2"])
        for r in ngram_jaccard_pairs(
            docs, k=3, threshold_num=1, threshold_den=2, gram_cap=boiler_members - 1
        ).collect()
    }
    for p in truth:
        assert p in out  # exact J of the planted pairs ~ 0.92 >> 0.5
    # boilerplate docs share only header grams (all hot) -> no pair between
    # two distinct mega-band members survives
    assert not any(
        a % BOILER_FRAC == 0 and b % BOILER_FRAC == 0 for a, b in out
    ), sorted(out)[:5]
    # (c) the skipped-key report carries the header grams at true frequency
    toks = docs.select(F.col("doc_id").alias("_id"), F.split("text", " ").alias("t"))
    ex = toks.select(
        "_id",
        F.explode(F.expr("transform(sequence(0, size(t) - 3), j -> "
                         "concat_ws('', slice(t, j + 1, 3)))")).alias("gs"),
    ).select("_id", F.xxhash64("gs").alias("g")).dropDuplicates(["_id", "g"])
    _, skipped = shared_key_pair_counts(
        ex, boiler_members - 1, 1, with_skipped=True
    )
    sizes = {r["bucket_size"] for r in skipped.collect()}
    assert sizes == {boiler_members}  # exactly the header grams, full mass
