"""Text-analysis operators for corpus curation — all native Spark SQL
expressions (no UDF): language-ID heuristic, quality scoring, token
counting, rolling-hash document fingerprinting.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kgspark.functions.text import tokenize

# tiny per-language stopword gazetteers for the n-gram/stopword heuristic
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it", "for", "was"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"],
    "fr": ["le", "la", "les", "et", "est", "une", "des", "que", "pour", "dans"],
    "es": ["el", "la", "los", "las", "es", "una", "del", "que", "por", "para"],
}


def lang_scores(text: Column) -> Column:
    """MAP<lang, hits>: stopword-marker hit counts per language."""
    toks = tokenize(text)
    entries = []
    for lang, markers in _LANG_MARKERS.items():
        marker_arr = F.array(*[F.lit(m) for m in markers])
        hits = F.size(F.filter(toks, lambda t: F.array_contains(marker_arr, t)))
        entries.append(F.struct(F.lit(lang).alias("lang"), hits.alias("hits")))
    return F.map_from_entries(F.array(*entries))


def detect_lang(text: Column) -> Column:
    """argmax language by marker hits; 'und' (undetermined) when no hits."""
    entries = []
    for lang, markers in _LANG_MARKERS.items():
        marker_arr = F.array(*[F.lit(m) for m in markers])
        hits = F.size(F.filter(tokenize(text), lambda t: F.array_contains(marker_arr, t)))
        entries.append(F.struct(hits.alias("hits"), F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*entries))
    return F.when(best.getField("hits") > 0, best.getField("lang")).otherwise(F.lit("und"))


def token_count(text: Column) -> Column:
    return F.size(tokenize(text))


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-flavored token estimate: word-piece split on case/digit
    boundaries + punctuation as its own token (regex segmentation)."""
    pieces = F.split(
        F.regexp_replace(text, r"([a-z])([A-Z])|(\d+)|([^\w\s]+)", r"$1 $2$3$4 "),
        r"\s+",
    )
    return F.size(F.filter(pieces, lambda t: t != ""))


def quality_features(df: DataFrame, text_col: str) -> DataFrame:
    """Length / punctuation / stopword-ratio / repetition quality signals."""
    text = F.col(text_col)
    toks = tokenize(text)
    n_toks = F.size(toks)
    n_chars = F.length(text)
    stop_arr = F.array(*[F.lit(m) for m in _LANG_MARKERS["en"]])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    n_punct = n_chars - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    n_distinct = F.size(F.array_distinct(toks))
    return df.withColumns({
        "n_chars": n_chars,
        "n_tokens": n_toks,
        "mean_word_len": F.round(
            F.when(n_toks > 0, (n_chars - n_toks + 1) / n_toks).otherwise(F.lit(0.0)), 3),
        "stopword_ratio": F.round(
            F.when(n_toks > 0, n_stop / n_toks).otherwise(F.lit(0.0)), 3),
        "punct_ratio": F.round(
            F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0)), 3),
        "distinct_ratio": F.round(
            F.when(n_toks > 0, n_distinct / n_toks).otherwise(F.lit(0.0)), 3),
    })


def quality_score(df: DataFrame, text_col: str) -> DataFrame:
    """Composite [0,1] quality score from the features (fixed weights,
    deterministic — a stand-in for a learned quality model)."""
    feats = quality_features(df, text_col)
    score = (
        F.least(F.col("n_tokens") / 100.0, F.lit(1.0)) * 0.3
        + F.least(F.col("stopword_ratio") * 4.0, F.lit(1.0)) * 0.3
        + (1.0 - F.least(F.col("punct_ratio") * 5.0, F.lit(1.0))) * 0.2
        + F.col("distinct_ratio") * 0.2
    )
    return feats.withColumn("quality", F.round(score, 4))


def fingerprint64(text: Column) -> Column:
    """Order-sensitive 64-bit document fingerprint: xxhash64 chained over
    word-4-gram hashes (a rolling-hash analogue, pure SQL)."""
    from kgspark.functions.minhash import word_shingles

    grams = word_shingles(tokenize(text), 4)
    return F.aggregate(
        F.transform(grams, lambda g: F.xxhash64(g)),
        F.lit(0).cast("long"),
        lambda acc, h: F.xxhash64(acc.cast("string"), h.cast("string")),
    )
