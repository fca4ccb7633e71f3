"""Chunking coverage/overlap invariants and decontamination semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from set_sketch_paper_spark.operators.chunking import chunk_documents, flag_contaminated


def _chunks(spark, text, chunk_tokens, overlap):
    df = spark.createDataFrame([(0, text)], ["doc_id", "text"])
    rows = (
        chunk_documents(df, chunk_tokens=chunk_tokens, overlap=overlap)
        .orderBy("chunk_idx")
        .collect()
    )
    return [(r["chunk_idx"], r["chunk_text"], r["n_chunk_tokens"]) for r in rows]


def test_chunk_coverage_and_overlap(spark):
    toks = [f"w{i}" for i in range(50)]
    out = _chunks(spark, " ".join(toks), 16, 4)
    # stride 12: starts 0,12,24,36 (48 dropped: 48 >= 50-4)
    assert [c[0] for c in out] == [0, 1, 2, 3]
    seen = []
    for idx, text, n in out:
        words = text.split(" ")
        assert len(words) == n
        start = idx * 12
        assert words == toks[start:start + 16]
        seen.extend(words)
    assert set(seen) == set(toks)  # every token in >= 1 chunk
    # consecutive chunks share exactly `overlap` tokens when both are full
    for (i1, t1, n1), (i2, t2, n2) in zip(out, out[1:]):
        if n1 == 16 and n2 == 16:
            assert t1.split(" ")[-4:] == t2.split(" ")[:4]


def test_chunk_short_doc_single_chunk(spark):
    out = _chunks(spark, "a b c", 16, 4)
    assert out == [(0, "a b c", 3)]


def test_chunk_no_redundant_tail(spark):
    # 20 tokens, chunk 16 stride 12: starts 0, 12; a start at 24 >= n never
    # exists; start 12 contributes tokens 12..19 (unseen 16..19) -> kept
    toks = [f"t{i}" for i in range(20)]
    out = _chunks(spark, " ".join(toks), 16, 4)
    assert [c[0] for c in out] == [0, 1]
    assert out[1][2] == 8  # 20 - 12


def test_chunk_overlap_validation(spark):
    df = spark.createDataFrame([(0, "a b")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=8, overlap=8)


def test_flag_contaminated_counts_shared_distinct_grams(spark):
    corpus = spark.createDataFrame(
        [
            (1, "a b c d e f g h"),      # shares grams with probe 100
            (2, "z y x w v u t s"),      # clean
            (3, "a b c d e a b c d e"),  # duplicated gram counts once
        ],
        ["doc_id", "text"],
    )
    probes = spark.createDataFrame([(100, "a b c d e f")], ["doc_id", "text"])
    got = {
        r["doc_id"]: r["hit_grams"]
        for r in flag_contaminated(corpus, probes, k=5).collect()
    }
    # probe grams: 'a b c d e', 'b c d e f'
    assert got == {1: 2, 3: 1}
