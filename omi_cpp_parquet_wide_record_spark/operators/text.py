"""Text analysis for training-data pipelines, as pure Column expressions.

Everything here compiles to JVM-side Catalyst expressions (whole-stage
codegen, no Python in the hot path): language-ID by marker-token counting,
quality scoring from length/punctuation/stopword ratios, token counting with
both whitespace and a BPE-ish regex tokenizer, and document fingerprinting.
Each builder returns Columns so callers compose them into any projection.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def trunc6(col: Column) -> Column:
    """floor-truncation at 6dp — deterministic across Spark and DuckDB
    (their round() rounding modes differ)."""
    return F.floor(col * 1e6) / 1e6

# marker stopwords per language for the n-gram/marker heuristic; on the
# engine's own corpus (fixtures.py) the per-lang vocab prefixes make this
# exact, on real text they are the usual suspects
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of"],
    "de": ["der", "und", "die"],
    "fr": ["le", "et", "les"],
    "es": ["el", "de", "los"],
}

STOPWORDS_EN = ["the", "a", "of", "and", "to", "in", "is", "on", "for"]


def word_count(text: Column, word: str) -> Column:
    """#whole-word occurrences, JVM-side regexp with word boundaries.

    Replaces the r2 space-padded length-difference trick, which missed
    tokens at string start/end and undercounted ADJACENT stopwords (a
    non-overlapping replace of ' of ' consumed the space that delimited
    the following ' the '). Zero-width \\b matches have no overlap
    problem; both Java regex (Spark) and RE2 (the DuckDB oracle) support
    it identically for ASCII words."""
    return F.regexp_count(text, F.lit(rf"\b{word}\b")).cast("long")


def lang_id(text: Column, markers: dict[str, list[str]] | None = None) -> Column:
    """Predicted language = argmax of marker-token counts ('und' if none).

    The greatest/when cascade keeps ties deterministic (first lang in dict
    order wins at equal score)."""
    markers = markers or LANG_MARKERS
    scores = {lang: sum_cols([word_count(text, m) for m in toks])
              for lang, toks in markers.items()}
    best = F.greatest(*scores.values()) if len(scores) > 1 \
        else next(iter(scores.values()))
    pred = F.lit("und")
    for lang in reversed(list(scores)):
        pred = F.when((scores[lang] > 0) & (scores[lang] == best),
                      F.lit(lang)).otherwise(pred)
    return pred


def sum_cols(cols: list[Column]) -> Column:
    out = cols[0]
    for c in cols[1:]:
        out = out + c
    return out


def token_count_ws(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(F.split(text, r"\s+"))


def token_count_bpe_ish(text: Column) -> Column:
    """BPE-ish subword proxy: alphanumeric runs + standalone punctuation
    each count as one token (the usual pre-tokenizer split). Pattern kept
    lookaround-free so the DuckDB (RE2) oracle computes the same thing."""
    return F.size(F.regexp_extract_all(
        text, F.lit(r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"), 0))


def punct_ratio(text: Column) -> Column:
    punct = F.length(text) - F.length(
        F.regexp_replace(text, r"[\.,;:!\?\"'()\[\]{}]", ""))
    return trunc6(punct / F.greatest(F.length(text), F.lit(1)))


def stopword_ratio(text: Column, stopwords: list[str] | None = None) -> Column:
    sw = stopwords or STOPWORDS_EN
    hits = sum_cols([word_count(text, w) for w in sw])
    return trunc6(hits / F.greatest(token_count_ws(text), F.lit(1)))


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality score: length band + low punctuation noise +
    healthy mean word length. Deterministic, SQL-expressible."""
    n = F.length(text)
    len_score = F.when(n < 100, n / F.lit(100.0)) \
        .when(n > 20000, F.lit(0.5)).otherwise(F.lit(1.0))
    wordlen = n / F.greatest(token_count_ws(text), F.lit(1))
    wl_score = F.when((wordlen >= 3) & (wordlen <= 12), F.lit(1.0)) \
        .otherwise(F.lit(0.5))
    noise = punct_ratio(text)
    noise_score = F.when(noise > 0.1, F.lit(0.3)).otherwise(F.lit(1.0))
    return trunc6((len_score + wl_score + noise_score) / F.lit(3.0))


def fingerprint(text: Column) -> Column:
    """Whitespace-normalized md5 document fingerprint (near-exact dedup
    key; the rolling-hash analogue with a stock hash both engines share)."""
    return F.md5(F.lower(F.regexp_replace(text, r"\s+", " ")))


def text_profile(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """One row per doc: the full analysis projection.

    The input is spread to cluster parallelism first (guide §2.5): the
    ~20 regex scans per document are the whole cost of this operator, and
    a small single-row-group parquet source would otherwise run them all
    on one core. Row order is immaterial (pure projection)."""
    from omi_cpp_parquet_wide_record_spark.operators.etl import spread_input
    df = spread_input(df)
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        F.length(t).alias("n_chars"),
        token_count_ws(t).alias("n_tokens_ws"),
        token_count_bpe_ish(t).alias("n_tokens_bpe"),
        punct_ratio(t).alias("punct_ratio"),
        stopword_ratio(t).alias("stopword_ratio"),
        quality_score(t).alias("quality"),
        lang_id(t).alias("lang_pred"),
        fingerprint(t).alias("fp"),
    )
