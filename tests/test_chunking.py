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


def test_pack_chunks_offsets_contiguous_per_bucket(spark):
    from set_sketch_paper_spark.operators.chunking import pack_chunks

    rows = [(d, i, 10 + (d + i) % 7) for d in range(20) for i in range((d % 3) + 1)]
    chunks = spark.createDataFrame(rows, ["doc_id", "chunk_idx", "n_chunk_tokens"])
    out = (
        pack_chunks(chunks, seq_tokens=32, n_buckets=4)
        .orderBy("bucket", "doc_id", "chunk_idx")
        .collect()
    )
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r["bucket"], []).append(r)
    assert set(by_bucket) == {0, 1, 2, 3}
    for b, rs in by_bucket.items():
        off = 0
        for r in rs:
            assert r["bucket"] == r["doc_id"] % 4
            assert r["offset_tokens"] == off          # stream is gap-free
            assert r["seq_idx"] == off // 32          # concat-and-cut rule
            off += r["n_chunk_tokens"]
        # seq_idx non-decreasing within the bucket stream
        seqs = [r["seq_idx"] for r in rs]
        assert seqs == sorted(seqs)


def test_pii_redaction_planted(spark):
    from set_sketch_paper_spark.operators.textstats import with_pii_redacted

    df = spark.createDataFrame(
        [
            (1, "contact bob@example.com or alice@test.org today"),
            (2, "server at 192.168.1.1 and id 123-45-6789 leaked"),
            (3, "clean text with no sensitive content at all"),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in with_pii_redacted(df).collect()}
    assert got[1]["n_email"] == 2 and got[1]["redacted"] == "contact <EMAIL> or <EMAIL> today"
    assert got[2]["n_ipv4"] == 1 and got[2]["n_id_number"] == 1
    assert got[2]["redacted"] == "server at <IP> and id <ID> leaked"
    assert got[3]["redacted"] == got[3]["text"]
    assert got[3]["n_email"] == got[3]["n_ipv4"] == got[3]["n_id_number"] == 0
