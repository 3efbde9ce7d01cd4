"""Corpus-curation ops (datapipe/curate.py): decontamination, repetition
signals, URL canonicalization + crawl dedup. Driver-brief operators (the
reference has no curation surface); oracle parity lives in
__spark_entry__.py (decontaminate / repetition_signals / url_dedup)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from kgspark.datapipe.curate import (
    canonicalize_url,
    decontaminate,
    dedup_by_url,
    pii_signals,
    redact_pii,
    repetition_signals,
)


URL_CASES = [
    # (raw, canonical)
    ("https://www.Example.COM/a/b", "example.com/a/b"),
    ("HTTP://example.com:80/a/b/", "example.com/a/b"),
    ("https://example.com:443/", "example.com"),
    ("https://example.com", "example.com"),
    ("https://example.com/a?utm_source=x&id=3#frag", "example.com/a?id=3"),
    ("https://example.com/a?id=3&utm_campaign=x", "example.com/a?id=3"),
    ("https://example.com/a?utm_a=1&utm_b=2&utm_c=3", "example.com/a"),
    ("https://example.com/a?gclid=abc&fbclid=def&id=9", "example.com/a?id=9"),
    # non-tracking params that merely contain 'utm_' mid-name survive
    ("https://example.com/a?xutm_foo=1", "example.com/a?xutm_foo=1"),
    # path case is significant (RFC 3986) — only the authority folds
    ("https://EXAMPLE.com/CaseSensitive", "example.com/CaseSensitive"),
    ("ftp://example.com/f", "example.com/f"),
    ("https://example.com:8080/a", "example.com:8080/a"),  # non-default port kept
]


def test_canonicalize_url_cases(spark):
    df = spark.createDataFrame([(raw,) for raw, _ in URL_CASES], "url string")
    got = [r.c for r in df.select(canonicalize_url(F.col("url")).alias("c")).collect()]
    assert got == [want for _, want in URL_CASES]


def test_dedup_by_url_keeps_earliest(spark):
    pages = spark.createDataFrame(
        [
            Row(url="https://www.a.com/x?utm_s=1", ts=3, body="late"),
            Row(url="http://a.com/x/", ts=1, body="first"),
            Row(url="HTTPS://A.com/x", ts=2, body="mid"),
            Row(url="https://a.com/y", ts=5, body="solo"),
        ]
    )
    out = {r.url_norm: r for r in dedup_by_url(pages, order_col="ts").collect()}
    assert set(out) == {"a.com/x", "a.com/y"}
    assert out["a.com/x"].n_dupes == 3 and out["a.com/x"].body == "first"
    assert out["a.com/y"].n_dupes == 1 and out["a.com/y"].body == "solo"


def test_decontaminate_flags_planted_overlap(spark):
    bench = spark.createDataFrame(
        [(0, "the secret eval answer is forty two exactly")], "doc_id long, text string"
    )
    docs = spark.createDataFrame(
        [
            (1, "prefix words then the secret eval answer is forty two exactly suffix"),
            (2, "completely unrelated content about spark shuffles and joins"),
            (3, "eval answer is forty two words reordered answer eval is"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.n_hits for r in decontaminate(docs, bench, n=8).collect()}
    # the 8-token bench doc has exactly one 8-gram; doc 1 embeds it verbatim,
    # doc 3 shares only shorter runs, doc 2 nothing
    assert set(out) == {1} and out[1] == 1


def test_decontaminate_is_broadcast_join(spark):
    docs = spark.createDataFrame([(i, f"w{i} w w w w") for i in range(8)],
                                 "doc_id long, text string")
    plan = decontaminate(docs, docs.limit(2), n=2)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # corpus side must not shuffle for the probe


def test_pii_detect_and_redact(spark):
    docs = spark.createDataFrame(
        [
            (1, "mail a.b+c@sub.example.org and d@e.io, server 192.168.0.1 up"),
            (2, "call +1 (555) 010-1234 or 555 010-9999 today"),
            (3, "no pii here at all"),
            (4, "version 1.2.3 is not an ip, nor is 1.2.3.4.5 a clean one"),
        ],
        "doc_id long, text string",
    )
    sig = pii_signals(F.col("text"))
    out = {
        r.doc_id: r
        for r in docs.select(
            "doc_id", *[c.alias(k) for k, c in sig.items()],
            redact_pii(F.col("text")).alias("red"),
        ).collect()
    }
    assert (out[1].n_email, out[1].n_ipv4) == (2, 1)
    assert out[1].red == "mail <EMAIL> and <EMAIL>, server <IPV4> up"
    assert out[2].n_phone == 2
    assert out[2].red == "call <PHONE> or <PHONE> today"
    assert (out[3].n_email, out[3].n_phone, out[3].n_ipv4) == (0, 0, 0)
    assert out[3].red == "no pii here at all"
    # dotted version strings: 1.2.3 has no 4th octet; 1.2.3.4.5 — the
    # first four octets form a \b-delimited match (documented behavior
    # of the simple pattern, same in both engines)
    assert out[4].n_ipv4 == 1


def test_repetition_signals_crafted(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b a b a b"),          # 2-grams: ab ba ab ba ab -> all dup
            (2, "one two three four"),   # no repeats at all
            (3, "x"),                    # shorter than any n-gram
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in repetition_signals(docs).collect()}
    assert set(out) == {1, 2, 3}
    # doc 1: 5 two-gram occurrences, every one a repeat; top ('a b') = 3/5
    assert out[1].dup_2gram_frac == 1.0
    assert out[1].top_2gram_frac == 0.6
    # 3-grams of doc 1: aba bab aba bab -> all dup
    assert out[1].dup_3gram_frac == 1.0
    assert out[2].dup_2gram_frac == 0.0 and out[2].dup_3gram_frac == 0.0
    # 4 tokens -> 3 two-grams, all unique, top = 1/3
    assert out[2].top_2gram_frac == pytest.approx(0.3333)
    assert out[3].dup_2gram_frac == 0.0 and out[3].top_2gram_frac == 0.0
