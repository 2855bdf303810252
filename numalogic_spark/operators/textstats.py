"""Text analysis for training-data pipelines: quality stats, token counting,
language-ID heuristic, document fingerprinting.

All stat/metric columns are JVM-side expressions (split / regexp /
higher-order array functions) — no Python in the scan path. Language ID is
a stopword-hit heuristic (n-gram-free but same spirit as public langid
approaches); fingerprint is a polynomial rolling hash over the word stream
in modular arithmetic sized to avoid ANSI long overflow.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# "BPE-ish" tokenizer regex: word pieces, numbers, single punctuation marks
TOKEN_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]"

# minimal stopword inventories for the language-ID heuristic
_STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "is", "in", "that", "it", "for"],
    "de": ["der", "die", "und", "ist", "das", "ein", "zu", "nicht", "mit", "sich"],
    "fr": ["le", "la", "et", "est", "un", "une", "des", "que", "pour", "dans"],
    "es": ["el", "la", "y", "es", "un", "una", "que", "de", "por", "con"],
}


def words_expr(text_col: str) -> Column:
    # drop empty tokens from leading/trailing whitespace
    return F.array_remove(F.split(F.lower(F.col(text_col)), r"\s+"), "")


def text_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-doc quality metrics: char/word/token counts, type-token ratio,
    mean word length, punctuation & whitespace ratios, quality score."""
    words = words_expr(text_col)
    t = F.col(text_col)
    n_chars = F.length(t)
    n_words = F.size(words)
    n_distinct = F.size(F.array_distinct(words))
    n_tokens = F.size(F.regexp_extract_all(F.lower(t), F.lit(TOKEN_RE), F.lit(0)))
    n_punct = n_chars - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    n_space = n_chars - F.length(F.regexp_replace(t, r"\s", ""))
    ttr = n_distinct / n_words
    mean_word_len = (n_chars - n_space) / n_words
    # quality score: bounded composite (longer docs with diverse vocab and
    # sane punctuation score higher) — a standard heuristic shape
    quality = (
        F.least(n_words / F.lit(100.0), F.lit(1.0)) * F.lit(0.4)
        + F.least(ttr, F.lit(1.0)) * F.lit(0.4)
        + (F.lit(1.0) - F.least(n_punct / F.greatest(n_chars, F.lit(1)), F.lit(1.0))) * F.lit(0.2)
    )
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_words.alias("n_words"),
        n_distinct.alias("n_distinct_words"),
        n_tokens.alias("n_tokens"),
        n_punct.alias("n_punct"),
        ttr.alias("ttr"),
        mean_word_len.alias("mean_word_len"),
        quality.alias("quality_score"),
    )


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-hit language ID: argmax over per-language hit counts of the
    doc's distinct words; 'und' (undetermined) when no stopword matches.
    Pure array_intersect — one narrow stage."""
    words = F.array_distinct(words_expr(text_col))
    hits = {
        lang: F.size(F.array_intersect(words, F.lit(sw).cast("array<string>")))
        for lang, sw in _STOPWORDS.items()
    }
    best_count = F.greatest(*hits.values())
    pred = F.lit("und")
    for lang in reversed(list(_STOPWORDS)):  # earlier langs win ties
        pred = F.when(hits[lang] == best_count, F.lit(lang)).otherwise(pred)
    pred = F.when(best_count == 0, F.lit("und")).otherwise(pred)
    cols = [F.col(id_col), pred.alias("lang_pred")]
    cols += [hits[lang].alias(f"hits_{lang}") for lang in _STOPWORDS]
    return df.select(*cols)


def doc_fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Order-sensitive rolling polynomial hash over the word stream:
    fp = Σ h(w_i)·B^(n-1-i) mod M, computed as a left fold
    fp_i = (fp_{i-1}·B + h(w_i)) mod M with M=2^31-1, B=1000003 (products
    stay < 2^63 → safe under ANSI arithmetic). h is the portable character
    fold shared with the dedup hash family, so the driver's DuckDB oracle
    recomputes fingerprints exactly. Same-words-different-order docs get
    different fingerprints, unlike the word-set hash."""
    from numalogic_spark.operators.dedup import _CHAR_MULT_1, _word_char_fold

    M, B = 2147483647, 1000003
    words = words_expr(text_col)
    fp = F.aggregate(
        words,
        F.lit(0).cast("long"),
        lambda acc, w: (acc * B + _word_char_fold(w, _CHAR_MULT_1)) % M,
    )
    return df.select(F.col(id_col), fp.alias("fingerprint"))
