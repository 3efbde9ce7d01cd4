"""Corpus-curation operators beyond near-dup: benchmark decontamination,
repetition (quality) signals, URL canonicalization + URL-level dedup.

All pure Spark SQL expressions — no UDFs, everything stays inside
whole-stage codegen. Public-knowledge designs:

- decontamination: the n-gram-overlap eval-set filter popularized by the
  GPT-3 appendix-C / Llama-2 training cards (13-gram there; parameterized
  here, default 8 to fit the short synthetic docs). Scale plan: the
  benchmark n-gram dictionary is tiny (eval suites are MBs) → distinct it
  once and BROADCAST; the 100-TB document side only ever does a map-side
  hash probe of its exploded n-grams plus one partial-aggregable count —
  no corpus-sized shuffle.
- repetition signals: duplicate-n-gram fractions in the style of the
  Gopher quality filters (Rae et al. 2021, §A1.1), as reused by
  Dolma / RefinedWeb. Computed with explode → two-level aggregate so the
  per-gram counting is map-side combinable and linear in corpus size
  (never the O(tokens²) nested-array-scan formulation).
- URL canonicalization: scheme/host folding, default-port and fragment
  stripping, tracking-parameter removal (utm_*/gclid/fbclid), trailing
  '/' normalization — the standard crawl-dedup key. url-level dedup is
  one hash-partitioned groupBy on the canonical key (min_by keeps the
  earliest capture), map-side combinable.

The reference (markalosey/graphiti) has no corpus-curation surface; these
are the driver-brief "training-data pipeline" operators. Oracle parity for
all three lives in __spark_entry__.py (DuckDB replays the same token /
n-gram / regexp pipelines).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kgspark.functions.text import tokenize

# ------------------------------------------------------------------ n-grams


def _all_ngrams(toks: Column, n: int) -> Column:
    """ALL word n-gram occurrences (order-preserving, NOT distinct —
    repetition counting needs multiplicity). Empty array when the doc is
    shorter than n tokens."""
    m = F.size(toks)
    idx = F.sequence(F.lit(0), m - n)
    return F.when(m >= n, F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
                  ).otherwise(F.array().cast("array<string>"))


# ------------------------------------------------------- decontamination


def benchmark_ngram_dict(bench: DataFrame, text_col: str = "text", n: int = 8) -> DataFrame:
    """Distinct word n-grams of the benchmark / eval corpus → ``(gram)``.

    This is the broadcast side: eval suites are small by construction, so
    the distinct() shuffle is negligible and the result ships to every
    executor once.
    """
    return (
        bench.select(F.explode(_all_ngrams(tokenize(F.col(text_col)), n)).alias("gram"))
        .distinct()
    )


def decontaminate(docs: DataFrame, bench: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", n: int = 8) -> DataFrame:
    """Flag training documents that share any word ``n``-gram with the
    benchmark corpus → ``(id_col, n_hits)`` with n_hits = count of DISTINCT
    contaminated n-grams, only rows with n_hits > 0.

    Plan shape (verified with .explain): exploded doc grams → broadcast
    hash join against the gram dictionary (map-side, zero shuffle of the
    corpus) → partial-agg count by doc id (the only exchange, and it
    carries hit rows only — contamination is rare by definition).
    """
    grams = docs.select(
        F.col(id_col),
        F.explode(F.array_distinct(_all_ngrams(tokenize(F.col(text_col)), n))).alias("gram"),
    )
    dictionary = benchmark_ngram_dict(bench, text_col=text_col, n=n)
    return (
        grams.join(F.broadcast(dictionary), "gram")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_hits"))
    )


# --------------------------------------------------- repetition signals


def repetition_signals(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Gopher-style per-document repetition fractions →
    ``(id_col, dup_2gram_frac, dup_3gram_frac, top_2gram_frac)``:

    - dup_Ngram_frac: fraction of N-gram occurrences that are repeats
      (1 - distinct/total) — high on boilerplate / template spam.
    - top_2gram_frac: occurrences of the most frequent 2-gram / total —
      high on "click here click here ..." degenerate pages.

    One explode per N tagged with a literal, one (id, n, gram) count (the
    map-side-combinable heavy agg), one tiny per-(id, n) rollup, then a
    conditional-agg pivot back to one row per document. Docs shorter than
    N tokens get 0.0 (no n-grams → nothing repeated).
    """
    did = F.col(id_col)
    parts = []
    for n in (2, 3):
        parts.append(
            docs.select(
                did,
                F.lit(n).alias("n"),
                F.explode_outer(_all_ngrams(tokenize(F.col(text_col)), n)).alias("gram"),
            )
        )
    grams = parts[0].unionByName(parts[1])
    per_gram = grams.groupBy(id_col, "n", "gram").agg(F.count("*").alias("c"))
    per_doc_n = per_gram.groupBy(id_col, "n").agg(
        # explode_outer null marker (doc shorter than n) contributes a
        # single null-gram row; count/c of it must not pollute totals
        F.sum(F.when(F.col("gram").isNotNull(), F.col("c")).otherwise(0)).alias("total"),
        F.sum(F.when(F.col("gram").isNotNull() & (F.col("c") > 1), F.col("c"))
              .otherwise(0)).alias("dup_occ"),
        F.max(F.when(F.col("gram").isNotNull(), F.col("c")).otherwise(0)).alias("top"),
    )

    def frac(num: Column, den: Column) -> Column:
        return F.round(F.when(den > 0, num / den).otherwise(F.lit(0.0)), 4)

    return per_doc_n.groupBy(id_col).agg(
        F.max(F.when(F.col("n") == 2, frac(F.col("dup_occ"), F.col("total")))).alias("dup_2gram_frac"),
        F.max(F.when(F.col("n") == 3, frac(F.col("dup_occ"), F.col("total")))).alias("dup_3gram_frac"),
        F.max(F.when(F.col("n") == 2, frac(F.col("top"), F.col("total")))).alias("top_2gram_frac"),
    )


# ------------------------------------------------ URL canonicalization


def canonicalize_url(url: Column) -> Column:
    """Canonical crawl-dedup key for a URL, pure regexp chain:

    1. drop the fragment (``#...``)
    2. drop the scheme (http/https, any case)
    3. lowercase the authority, strip a leading ``www.`` and default
       ``:80`` / ``:443`` ports (path/query case is preserved — path case
       is significant per RFC 3986)
    4. remove tracking query params (utm_*, gclid, fbclid) wherever they
       sit in the query string, then tidy dangling ``?`` / ``&``
    5. strip one trailing ``/`` from the path
    """
    u = F.regexp_replace(url, r"#.*$", "")
    u = F.regexp_replace(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://", "")
    host = F.lower(F.regexp_extract(u, r"^([^/?]*)", 1))
    host = F.regexp_replace(host, r"^www\.", "")
    host = F.regexp_replace(host, r":(80|443)$", "")
    rest = F.regexp_replace(u, r"^[^/?]*", "")
    # boundary-anchored with a captured [?&] prefix (kept via $1) rather
    # than lookbehind, so the DuckDB oracle (RE2: no lookbehind) can replay
    # it. Each pass removes one param per run of consecutive tracking
    # params (the scanner consumes the following separator), so apply
    # three times — handles runs of up to 3, plenty for real crawls.
    _track = r"([?&])(utm_[A-Za-z0-9_]*|gclid|fbclid)=[^&#]*&?"
    rest = F.regexp_replace(rest, _track, r"$1")
    rest = F.regexp_replace(rest, _track, r"$1")
    rest = F.regexp_replace(rest, _track, r"$1")
    rest = F.regexp_replace(rest, r"[?&]+$", "")
    rest = F.regexp_replace(rest, r"\?&", "?")
    rest = F.regexp_replace(rest, r"^(/[^?]*?)/(\?|$)", r"$1$2")
    rest = F.regexp_replace(rest, r"^/$", "")
    return F.concat(host, rest)


# ------------------------------------------------------------ PII scrub

# RE2-compatible (no lookarounds/backrefs) so the DuckDB oracle replays
# them verbatim; Java regex treats them identically.
_PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"(\+?\d{1,2}[- ]?)?\(?\d{3}\)?[- ]\d{3}[- ]\d{4}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def pii_signals(text: Column) -> dict[str, Column]:
    """Per-document PII occurrence counts — {'n_email': Col, 'n_phone':
    Col, 'n_ipv4': Col}. regexp_extract_all + size (not regexp_count) so
    the exact same expression replays in DuckDB (len(regexp_extract_all)).
    Pure codegen'd string ops: embarrassingly parallel, no shuffle."""
    return {
        f"n_{k}": F.size(F.regexp_extract_all(text, F.lit(p), 0))
        for k, p in _PII_PATTERNS.items()
    }


def redact_pii(text: Column) -> Column:
    """Replace emails / phone numbers / IPv4s with typed placeholders
    (<EMAIL>, <PHONE>, <IPV4>) — the standard pre-training scrub pass
    (order matters: emails first so user@host IPv4-lookalikes inside
    addresses aren't split by the IP pass)."""
    out = text
    for k in ("email", "phone", "ipv4"):
        out = F.regexp_replace(out, _PII_PATTERNS[k], f"<{k.upper()}>")
    return out


def dedup_by_url(pages: DataFrame, url_col: str = "url",
                 order_col: str = "warc_ts") -> DataFrame:
    """Keep one capture per canonical URL (the earliest by ``order_col``;
    ties broken by the raw URL for determinism). One hash-partitioned,
    map-side-combinable groupBy on the canonical key — the standard first
    pass of a crawl-dedup pipeline, linear at any corpus size."""
    key = canonicalize_url(F.col(url_col)).alias("url_norm")
    ord_key = F.struct(F.col(order_col), F.col(url_col))
    aggs = [F.min_by(c, ord_key).alias(c) for c in pages.columns] + [
        F.count("*").alias("n_dupes")
    ]
    return pages.groupBy(key).agg(*aggs)
