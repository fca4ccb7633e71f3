"""Text analysis operators for training-data pipelines: token counting,
quality scoring, language ID, fingerprinting.

Everything here is built-in column expressions (whole-stage codegen,
no Python), and every output is either an integer or a quantized integer
(round(1e6 * ratio)) so results hash-match an ANSI-SQL oracle exactly —
float aggregation order never enters the comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import LongType

# marker stopwords per language for the n-gram/stopword language-ID heuristic
# (space-delimited languages only; CJK scripts are detected by character
# ratio — see CJK_PATTERN below — because Chinese text is not
# whitespace-tokenizable)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that"],
    "de": ["der", "die", "das", "und", "ist", "von", "ein", "nicht"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es"],
    "fr": ["le", "la", "et", "les", "des", "un", "une", "est"],
}

# CJK Unified Ideographs (Han script) as a literal char-class range; the
# literal characters (not \u escapes) keep the pattern byte-identical under
# Java regex and RE2, so the zh branch stays oracle-expressible.
CJK_PATTERN = "[一-鿿]"
# a doc is zh when >= 5% of its characters are Han ideographs
CJK_RATIO_DEN = 20

_Q = 1_000_000


def _q6(num, den):
    """round-half-up(1e6 * num/den) as floor((2e6*num + den)/(2*den)) over
    exact integer inputs.  Both engines evaluate the identical IEEE double
    division then floor, so results hash-match an ANSI-SQL oracle — no
    engine-specific round() tie-breaking in the comparison path."""
    num = num.cast(LongType())
    den = den.cast(LongType())
    return F.floor((F.lit(2 * _Q) * num + den) / (F.lit(2) * den)).cast(LongType())


def with_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """n_tokens (whitespace), n_chars, avg token length and punctuation /
    digit ratios as quantized integers."""
    toks = F.split(F.col(text_col), " ")
    n_tokens = F.size(toks)
    n_chars = F.length(F.col(text_col))
    n_punct = n_chars - F.length(F.regexp_replace(F.col(text_col), r"[^\w\s]", ""))
    n_digit = n_chars - F.length(F.regexp_replace(F.col(text_col), r"[0-9]", ""))
    return (
        df.withColumn("n_tokens", n_tokens)
        .withColumn("n_chars", n_chars)
        .withColumn("avg_token_len_q", _q6(n_chars - (n_tokens - 1), n_tokens))
        .withColumn("punct_ratio_q", _q6(n_punct, n_chars))
        .withColumn("digit_ratio_q", _q6(n_digit, n_chars))
    )


def with_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Composite quality heuristic (all integer arithmetic): docs are
    penalized for being very short, punctuation-heavy or digit-heavy.
    score_q in [0, 1e6]."""
    d = with_token_stats(df, text_col)
    len_ok = F.when(F.col("n_tokens") >= 20, F.lit(_Q)).otherwise(
        F.col("n_tokens") * int(_Q / 20)
    )
    punct_pen = F.greatest(F.lit(0), F.lit(_Q) - F.col("punct_ratio_q") * 4)
    digit_pen = F.greatest(F.lit(0), F.lit(_Q) - F.col("digit_ratio_q") * 4)
    return d.withColumn(
        "quality_q",
        F.floor((len_ok + punct_pen + digit_pen) / 3).cast(LongType()),
    )


# (label, num, den): quantile p = num/den, labeled p{label}_q in the output.
# Shared with the DuckDB oracle builder so the two cannot diverge.
QUANTILE_PROBS = ((10, 1, 10), (25, 1, 4), (50, 1, 2), (75, 3, 4), (90, 9, 10))


def score_quantiles(
    df: DataFrame,
    score_col: str,
    strata_col: str,
    probs=QUANTILE_PROBS,
) -> DataFrame:
    """Per-stratum EXACT discrete quantiles of an integer score column —
    the calibration step before a quality filter ("drop everything below
    this stratum's p10") is applied at corpus scale.

    probs entries are (label, num, den): the p-th quantile is the smallest
    score whose cumulative count satisfies cum * den >= num * n — the SQL
    percentile_disc definition restated in pure integer arithmetic, so the
    DuckDB oracle hash-matches bit-for-bit (no interpolation, no floats).

    Scale shape: ONE map-side-combinable groupBy(strata, score) collapses
    the corpus to its score histogram (<= |strata| * 1e6+1 rows for
    quantized scores), and the running-sum window + final min-aggregate run
    over that histogram — never over raw rows.  A 100 TB corpus with 30
    languages costs one count-shuffle plus window work on a few million
    histogram rows."""
    from pyspark.sql import Window

    hist = df.groupBy(strata_col, score_col).agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy(strata_col).orderBy(score_col)
    wn = Window.partitionBy(strata_col)
    cum = hist.withColumn("cum", F.sum("c").over(w)).withColumn(
        "n", F.sum("c").over(wn)
    )
    aggs = [F.max("n").cast(LongType()).alias("n_docs")] + [
        F.min(
            F.when(
                F.col("cum") * F.lit(den) >= F.lit(num) * F.col("n"),
                F.col(score_col),
            )
        )
        .cast(LongType())
        .alias(f"p{label}_q")
        for label, num, den in probs
    ]
    return cum.groupBy(strata_col).agg(*aggs)


def with_lang_id(df: DataFrame, text_col: str = "text", langs=None) -> DataFrame:
    """Language ID, two-stage:

    1. CJK script detection by character ratio: if >= 1/CJK_RATIO_DEN of the
       doc's characters are Han ideographs (CJK_PATTERN), predict ``zh`` —
       Chinese is not whitespace-tokenizable, so stopword markers can never
       fire on it (the round-4 pinyin placeholder could not either; this is
       the honest fix).
    2. Otherwise stopword-marker argmax over the space-delimited languages
       (array_intersect on the distinct token set), deterministic
       first-in-list tie-breaking.

    All built-in expressions (whole-stage codegen, zero Python, zero
    shuffle); the CJK branch is exact integer arithmetic so the result
    hash-matches the DuckDB oracle."""
    langs = langs or list(LANG_MARKERS)
    txt = F.coalesce(F.col(text_col), F.lit(""))
    toks = F.array_distinct(F.split(txt, " "))
    d = df
    for lang in langs:
        markers = F.array(*[F.lit(w) for w in LANG_MARKERS[lang]])
        d = d.withColumn(f"_score_{lang}", F.size(F.array_intersect(toks, markers)))
    pred = F.lit(langs[-1])
    for lang in reversed(langs[:-1]):
        # first-in-list wins ties: lang beats later langs when >= their score
        later = [F.col(f"_score_{l2}") for l2 in langs[langs.index(lang) + 1:]]
        cond = F.col(f"_score_{lang}") >= F.greatest(*later) if len(later) > 1 else (
            F.col(f"_score_{lang}") >= later[0]
        )
        pred = F.when(cond, F.lit(lang)).otherwise(pred)
    n_chars = F.length(txt)
    n_cjk = n_chars - F.length(F.regexp_replace(txt, CJK_PATTERN, ""))
    # strict vs greatest(n_chars,1): empty text has n_cjk=0 and must NOT be zh
    pred = F.when(
        n_cjk * F.lit(CJK_RATIO_DEN) >= F.greatest(n_chars, F.lit(1)), F.lit("zh")
    ).otherwise(pred)
    d = d.withColumn("pred_lang", pred)
    return d.drop(*[f"_score_{lang}" for lang in langs])


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whole-document fingerprint: md5 (portable across engines) of the
    text; plus a 64-bit xxhash64 for compact joins (Spark-side only)."""
    return df.withColumn("fingerprint_md5", F.md5(F.col(text_col))).withColumn(
        "fingerprint64", F.xxhash64(F.col(text_col))
    )


def with_repetition_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition quality signals (Rae et al. 2021 §A1.1, the
    standard LLM-corpus repetition filters), token-level:

    - ``dup_token_q``   — fraction of token occurrences that are repeats
      (1 - distinct/total), quantized.
    - ``top_token_q``   — coverage of the single most frequent token.
    - ``dup_bigram_q``  — fraction of bigram occurrences that are repeats.
    - ``top_bigram_q``  — coverage of the most frequent bigram.

    High values flag boilerplate / template / spam documents that survive
    exact and near dedup (they repeat *internally*, not across docs).

    ONE Arrow pass per partition (make_repetition_stats_udf): map-only,
    zero shuffles, O(n_tokens) per row.  The previous pure-expression form
    computed the top-frequency terms with nested interpreted higher-order
    lambdas whose inner ``toks`` reference re-evaluated split(text) per
    distinct token (interpreted eval has no common-subexpression
    elimination) — O(distinct x n_tokens x |text|) per row, measured ~900 s
    single-task at sf1.0 scale whenever the columns were actually
    materialized (count() column-pruning had hidden the cost from the
    bench).  The UDF mirrors the exact integer/_q6 arithmetic
    (hand-computed cases + the sf0.01 oracle hash pin the bit-identity).
    NULL text is treated as empty.
    """
    from ..functions.textstats_udfs import make_repetition_stats_udf

    # asNondeterministic stops the optimizer duplicating the UDF around the
    # 5 struct-field projections (two ArrowEvalPython nodes otherwise).
    # No widen_if_narrow: this operator keeps the map-only zero-Exchange
    # contract (test_plans pins it); the Counter pass is O(n_tokens)/row,
    # cheap enough that narrow local scans don't need rescue.
    s = make_repetition_stats_udf().asNondeterministic()(F.col(text_col))
    return (
        df
        .withColumn("_rs", s)
        .withColumn("n_tokens", F.col("_rs.n_tokens"))
        .withColumn("dup_token_q", F.col("_rs.dup_token_q"))
        .withColumn("top_token_q", F.col("_rs.top_token_q"))
        .withColumn("dup_bigram_q", F.col("_rs.dup_bigram_q"))
        .withColumn("top_bigram_q", F.col("_rs.top_bigram_q"))
        .drop("_rs")
    )


# (name, pattern, replacement) applied in order.  Patterns restricted to
# constructs Java regex (Spark) and RE2 (DuckDB/Trino) match IDENTICALLY —
# explicit character classes, bounded repetition, no backtracking-dependent
# alternation — so redaction output hash-matches a SQL oracle.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"([0-9]{1,3}\.){3}[0-9]{1,3}", "<IP>"),
    ("id_number", r"[0-9]{3}-[0-9]{2}-[0-9]{4}", "<ID>"),
]


def with_pii_redacted(df: DataFrame, text_col: str = "text") -> DataFrame:
    """PII scrubbing (the C4/CCNet-style pre-training hygiene pass):
    replace emails, IPv4 addresses and SSN-shaped id numbers with typed
    placeholders and count matches per doc.

    Pure ``regexp_replace`` / ``regexp_count`` column expressions — narrow,
    zero shuffle, whole-stage codegen.  Counts are taken on the ORIGINAL
    text; replacements apply in PII_PATTERNS order on a running column.
    Output adds: redacted (string), n_email / n_ipv4 / n_id_number (long).
    NULL text is treated as empty (without the coalesce,
    size(regexp_extract_all(NULL)) yields -1 counts and a NULL redacted
    column — inconsistent with the NULL handling in chunk_documents /
    with_repetition_stats).
    """
    txt = F.coalesce(F.col(text_col), F.lit(""))
    red = txt
    out = df
    for name, pat, repl in PII_PATTERNS:
        out = out.withColumn(
            f"n_{name}",
            F.size(F.regexp_extract_all(txt, F.lit(pat), 0)).cast(LongType()),
        )
        red = F.regexp_replace(red, pat, repl)
    return out.withColumn("redacted", red)


def token_count_bpe_ish(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Sub-word-ish token count: alphanumeric runs and individual
    punctuation both count (a cheap stand-in for BPE token counting; the
    regex is engine-portable)."""
    return df.withColumn(
        "n_subtokens",
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"), 0)),
    )

def with_internal_repeats(
    df: DataFrame, text_col: str = "text", min_len: int = 20
) -> DataFrame:
    """Exact per-document internal-repeat signals via suffix array + LCP
    (sketchlib/suffix.py): ``longest_repeat_len`` (longest substring
    occurring >= 2 times, overlaps allowed) and ``n_repeat_positions``
    (suffix positions repeating >= min_len bytes elsewhere in the doc).

    The character-exact complement of with_repetition_stats' token-level
    ratios: catches templated spans that token frequency ratios miss (long
    repeats of rare tokens) and is the per-document twin of the cross-doc
    lcs_substring_pairs diagonal-island pass (operators/dedup.py).

    Arrow-batched pandas UDF, no shuffle — per-row bounded O(n log n)
    compute, embarrassingly parallel at any scale.  Rows-only (a suffix
    array is not SQL-expressible at feasible cost); semantics pinned vs
    O(n^2) brute force in tests/test_suffix.py + tests/test_textstats.py.
    """
    from ..functions.textstats_udfs import make_internal_repeats_udf

    r = make_internal_repeats_udf(min_len)(F.col(text_col))
    return df.withColumns(
        {
            "longest_repeat_len": r["longest_repeat_len"],
            "n_repeat_positions": r["n_repeat_positions"],
        }
    )
