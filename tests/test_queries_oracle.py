"""Driver-contract validation: every queries() entry runs, and every
oracle_sql() entry matches the Spark result exactly (row count + columns +
order-insensitive values) — the same comparison the driver makes at sf0.01,
run here at sf0.001 for speed.
"""

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _normalize(pdf: pd.DataFrame) -> list[tuple]:
    pdf = pdf[sorted(pdf.columns)]
    rows = [tuple(str(v) for v in row) for row in pdf.itertuples(index=False)]
    return sorted(rows)


ORACLE_KEYS = sorted(entrymod.oracle_sql().keys())
ALL_KEYS = sorted(entrymod.queries().keys())
ROWS_ONLY_KEYS = sorted(set(ALL_KEYS) - set(ORACLE_KEYS))


def test_oracle_keys_subset_of_queries():
    assert set(ORACLE_KEYS) <= set(ALL_KEYS)


def test_oracle_backed_queries_lead_the_dict():
    """The driver records correctness rows for only the FIRST 50 queries()
    entries (verified round 4) — every oracle-backed query must sit inside
    that window, and the leading block must be exactly the oracle set so no
    reordering silently drops an oracle query out of driver coverage."""
    ordered = list(entrymod.queries().keys())
    oracle = set(entrymod.oracle_sql().keys())
    assert set(ordered[: len(oracle)]) == oracle, (
        "oracle-backed queries must occupy the leading dict positions"
    )
    assert len(oracle) <= 50


# queries whose oracle gate is vacuous when empty (a 0==0 match would not
# exercise the join path — ADVICE r4 on decontaminate_docs); their probe
# construction guarantees hits at every SF, and this pins that guarantee
MUST_BE_NONEMPTY = {
    "decontaminate_docs",
    "training_corpus_build",
    # kmv estimator / jaccard gates are vacuous without rows
    "kmv_doc_cardinality",
    "kmv_jaccard_pairs",
    "kmv_distinct_users",
    "kmv_setops_pairs",
    "quality_quantiles",
    "calibrated_quality_filter",
    "corpus_health_by_source",
}


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_query_matches_oracle(spark, duck, name):
    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    got = q(spark, SF_DIR).toPandas()
    want = duck.execute(sql).fetchdf()
    if name in MUST_BE_NONEMPTY:
        assert len(got) > 0, f"{name}: oracle gate is vacuous on empty output"
    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: columns {sorted(got.columns)} != {sorted(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: {len(got)} rows vs oracle {len(want)}"
    g, w = _normalize(got), _normalize(want)
    mismatches = [(a, b) for a, b in zip(g, w) if a != b][:5]
    assert g == w, f"{name}: first value mismatches {mismatches}"


@pytest.mark.parametrize("name", ROWS_ONLY_KEYS)
def test_rows_only_query_runs(spark, name):
    q = entrymod.queries()[name]
    df = q(spark, SF_DIR)
    # materialize ALL columns (toPandas), never count(): Catalyst prunes
    # unreferenced Python-UDF columns under count(), so a broken UDF would
    # pass a count()-based check without ever executing (the round-1
    # minhash_est_cardinality escape)
    pdf = df.toPandas()
    assert len(pdf) >= 0
    assert len(pdf.columns) > 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"file_id", "cluster_id"}


def test_bench_query_names_resolve():
    """Every bench.py HEADLINE / ORACLE_TWINS name must be a queries() key —
    a rename that breaks the benchmark should fail here, not in the
    driver's sf0.1 run."""
    import bench

    missing = [n for n in bench.HEADLINE + bench.ORACLE_TWINS if n not in ALL_KEYS]
    assert not missing, missing
