"""Unit tests for text-stats operators: language-ID (incl. planted CJK),
PII redaction NULL handling.

Reference parity: the reference repo has no lang-ID/PII operators; these are
LLM-pipeline additions.  The oracle queries (`lang_id`, `pii_redaction`)
hash-gate them against DuckDB; these units pin the corners the bench corpus
cannot reach (real Han-script text, NULL/empty documents).
"""

from __future__ import annotations

from set_sketch_paper_spark.operators.textstats import (
    CJK_RATIO_DEN,
    with_lang_id,
    with_pii_redacted,
)

# real Han-script sentences (public-domain classical openings)
ZH_DOCS = [
    "学而时习之 不亦说乎",
    "道可道 非常道 名可名 非常名",
    "子曰 三人行必有我师焉",
]


def _pred(spark, rows):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = with_lang_id(df).select("doc_id", "pred_lang").collect()
    return {r["doc_id"]: r["pred_lang"] for r in out}


def test_lang_id_detects_planted_cjk(spark):
    rows = [(i, t) for i, t in enumerate(ZH_DOCS)]
    rows += [
        (10, "the cat and the dog sat in the garden"),
        (11, "der Hund und die Katze ist von hier"),
        (12, "el perro y la casa de que es un gato"),
        (13, "le chat et les chiens des villes est une"),
    ]
    got = _pred(spark, rows)
    for i in range(len(ZH_DOCS)):
        assert got[i] == "zh", f"doc {i} ({ZH_DOCS[i]!r}) -> {got[i]}"
    assert got[10] == "en" and got[11] == "de" and got[12] == "es" and got[13] == "fr"


def test_lang_id_cjk_ratio_threshold(spark):
    """A mostly-Latin doc with a stray ideograph stays Latin; the zh branch
    fires only at >= 1/CJK_RATIO_DEN Han-character ratio."""
    latin = "the quick brown fox jumps over the lazy dog " * 3  # ~132 chars
    sprinkled = latin + "道"  # 1 Han char, ratio << 1/20
    dense = "道" * CJK_RATIO_DEN  # ratio 1.0
    got = _pred(spark, [(0, sprinkled), (1, dense)])
    assert got[0] == "en"
    assert got[1] == "zh"


def test_lang_id_null_and_empty_not_zh(spark):
    got = _pred(spark, [(0, None), (1, ""), (2, "   ")])
    # 0 CJK chars out of max(n,1) never reaches the threshold
    assert got[0] != "zh" and got[1] != "zh" and got[2] != "zh"


def test_pii_redacted_null_text(spark):
    """NULL text must behave as empty: zero counts, empty redacted (ADVICE
    r4 — without the coalesce, counts were -1 and redacted NULL)."""
    df = spark.createDataFrame(
        [(0, None), (1, "mail a@b.com ip 10.0.0.1 id 123-45-6789")],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in with_pii_redacted(df).collect()}
    assert rows[0]["n_email"] == 0
    assert rows[0]["n_ipv4"] == 0
    assert rows[0]["n_id_number"] == 0
    assert rows[0]["redacted"] == ""
    assert rows[1]["n_email"] == 1 and rows[1]["n_ipv4"] == 1
    assert rows[1]["n_id_number"] == 1
    assert rows[1]["redacted"] == "mail <EMAIL> ip <IP> id <ID>"


def test_internal_repeats_matches_per_row_twin(spark):
    """with_internal_repeats (Arrow-batched SA+LCP UDF) == per-row python
    repeat_stats on real corpus docs + planted edge rows; the kernels
    themselves are hypothesis-gated vs O(n^2) brute force in test_suffix.py."""
    from set_sketch_paper_spark.operators.textstats import with_internal_repeats
    from set_sketch_paper_spark.sketchlib.suffix import repeat_stats

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(60)
    extra = spark.createDataFrame(
        [
            (9001, ""),
            (9002, "x"),
            (9003, "ab" * 40),
            (9004, "once upon a time " * 5 + "unique tail"),
            (9005, "ünïcödé rëpëàt " * 3),  # multi-byte utf-8
        ],
        "doc_id long, text string",
    )
    df = docs.select("doc_id", "text").unionByName(extra)
    got = {
        r.doc_id: (r.longest_repeat_len, r.n_repeat_positions)
        for r in with_internal_repeats(df, "text", min_len=20).collect()
    }
    for row in df.collect():
        want = repeat_stats((row.text or "").encode("utf-8"), 20)
        assert got[row.doc_id] == want, (row.doc_id, got[row.doc_id], want)


def test_internal_repeats_udf_evaluated_once(spark):
    """Both struct fields must come from ONE ArrowEvalPython node — a
    duplicated SA pass would double the operator's cost."""
    from set_sketch_paper_spark.operators.textstats import with_internal_repeats

    df = spark.createDataFrame([(1, "abcabc")], "doc_id long, text string")
    plan = (
        with_internal_repeats(df, "text")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("ArrowEvalPython") == 1, plan


def test_score_quantiles_matches_brute_force(spark):
    """percentile_disc semantics: smallest score with cum*den >= num*n,
    against a direct sorted-list reading, plus the histogram-window plan
    never sorting raw rows."""
    from set_sketch_paper_spark.operators.textstats import score_quantiles

    scores = {"a": [1, 2, 2, 3, 10, 10, 50, 50, 50, 100], "b": [7, 7, 7]}
    rows = [(g, s) for g, vals in scores.items() for s in vals]
    df = spark.createDataFrame(rows, "lang string, score long")
    got = {r["lang"]: r.asDict() for r in score_quantiles(df, "score", "lang").collect()}

    def disc(vals, num, den):
        vals = sorted(vals)
        n = len(vals)
        return next(v for i, v in enumerate(vals) if (i + 1) * den >= num * n)

    for g, vals in scores.items():
        assert got[g]["n_docs"] == len(vals)
        for label, num, den in ((10, 1, 10), (25, 1, 4), (50, 1, 2), (75, 3, 4), (90, 9, 10)):
            assert got[g][f"p{label}_q"] == disc(vals, num, den), (g, label)


def test_repetition_stats_arrow_udf_edges(spark):
    """The r6 Arrow rewrite of with_repetition_stats must keep the exact
    expression-form semantics on the edge inputs: NULL text behaves as
    empty, split keeps interior/trailing empty tokens (multi-space), and
    the single-token guard zeroes the bigram terms."""
    from set_sketch_paper_spark.operators.textstats import with_repetition_stats

    df = spark.createDataFrame(
        [(0, None), (1, ""), (2, "a  b"), (3, "x x")], ["doc_id", "text"]
    )
    got = {r["doc_id"]: r for r in with_repetition_stats(df).collect()}
    # NULL -> '' -> split gives [''] : 1 token, top covers it fully
    for d in (0, 1):
        r = got[d]
        assert (r["n_tokens"], r["dup_token_q"], r["top_token_q"],
                r["dup_bigram_q"], r["top_bigram_q"]) == (1, 0, 1_000_000, 0, 0)
    # 'a  b' -> ['a','','b']: 3 distinct tokens, 2 distinct bigrams
    r = got[2]
    assert (r["n_tokens"], r["dup_token_q"], r["top_token_q"]) == (3, 0, 333_333)
    assert (r["dup_bigram_q"], r["top_bigram_q"]) == (0, 500_000)
    # 'x x': 2 tokens 1 distinct; bigram 'x x' once
    r = got[3]
    assert (r["n_tokens"], r["dup_token_q"], r["top_token_q"]) == (2, 500_000, 1_000_000)
    assert (r["dup_bigram_q"], r["top_bigram_q"]) == (0, 1_000_000)
