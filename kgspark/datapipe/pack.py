"""Training-data assembly: context-window chunking and greedy sequence
packing — the two steps between a curated corpus and model-ready shards.

- ``chunk_documents``: overlapping token windows (the standard
  HF-style stride chunking for long documents). Pure Spark SQL —
  tokenize → ``sequence`` of window starts → explode → ``slice`` — so
  it stays inside whole-stage codegen, costs one narrow map (no
  shuffle), and pushes column pruning to the scan.
- ``pack_sequences``: first-fit sequential packing of documents into
  fixed token budgets (one bin ≈ one training sequence / shard file).
  Packing is inherently sequential per stream, so the corpus is first
  hash-sharded (``doc_id % n_shards`` — at 100 TB, size n_shards so a
  shard's (id, n_tokens) pairs fit one executor: the packer only ever
  sees two ints per doc, ~16 bytes/doc, so even 10^9-doc shards are
  fine), then each shard packs independently inside one
  ``applyInPandas`` group — linear, deterministic (ordered by doc_id),
  restart-safe. Output clusters by (shard, seq_bin): writing training
  shards is a partitioned write with no further shuffle.

Both are exact-integer/string outputs with full DuckDB oracles
(__spark_entry__.py): chunking replays via generate_series + list_slice,
packing via a per-shard recursive CTE that walks the same greedy rule.
Oversized docs (n_tokens > budget) take a bin alone — the packer never
splits a document; chunk first if that matters.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgspark.functions.text import tokenize


def chunk_documents(
    docs: DataFrame,
    window: int = 128,
    stride: int = 96,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """→ ``(doc_id, chunk_id, start_tok, n_tokens, chunk_text)``.

    Window starts at 0, stride, 2·stride, … while start < total tokens;
    the final window may be shorter (never empty). stride < window
    gives ``window - stride`` tokens of overlap between neighbors.
    """
    if not 0 < stride <= window:
        raise ValueError("need 0 < stride <= window")
    toks = docs.select(
        F.col(id_col).alias("doc_id"), tokenize(F.col(text_col)).alias("toks")
    ).withColumn("n", F.size("toks")).where(F.col("n") > 0)
    return (
        toks.select(
            "doc_id", "toks",
            F.posexplode(F.sequence(F.lit(0), F.col("n") - 1, F.lit(stride)))
             .alias("chunk_id", "start_tok"),
        )
        .select(
            "doc_id",
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.col("start_tok").cast("long").alias("start_tok"),
            F.slice("toks", F.col("start_tok") + 1, window).alias("c"),
        )
        .select(
            "doc_id", "chunk_id", "start_tok",
            F.size("c").cast("long").alias("n_tokens"),
            F.concat_ws(" ", "c").alias("chunk_text"),
        )
    )


def pack_sequences(
    docs: DataFrame,
    budget: int = 2048,
    n_shards: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """→ ``(doc_id, shard, seq_bin, n_tokens)``: greedy first-fit
    sequential packing of whole documents into ``budget``-token bins,
    independently per hash shard, docs visited in ascending id order."""

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        bins, fill, b = [], 0, 0
        for t in pdf["n_tokens"]:
            if fill and fill + t > budget:
                b, fill = b + 1, 0
            fill += t
            bins.append(b)
        pdf["seq_bin"] = pd.Series(bins, dtype="int64")
        return pdf[["doc_id", "shard", "seq_bin", "n_tokens"]]

    slim = docs.select(
        F.col(id_col).alias("doc_id"),
        # pmod keeps shards in [0, n_shards) for negative ids too — the
        # range the shard-sizing model and partitioned writes assume
        F.pmod(F.col(id_col), F.lit(n_shards)).cast("int").alias("shard"),
        F.size(tokenize(F.col(text_col))).cast("long").alias("n_tokens"),
        # size(NULL) is -1 under Spark's legacy sizeOfNull default: a
        # NULL-text doc would enter the packer with n_tokens=-1 and
        # silently shrink the running fill, shifting every later bin in
        # the shard (and the DuckDB oracle yields NULL there). Drop such
        # rows — matching the oracle's `WHERE text IS NOT NULL`.
    ).where(F.col("n_tokens") >= 0)
    return slim.groupBy("shard").applyInPandas(
        _pack, "doc_id long, shard int, seq_bin long, n_tokens long"
    )


def pack_sequences_oracle_sql(
    docs_sql: str, budget: int = 2048, n_shards: int = 64
) -> str:
    """DuckDB replay of :func:`pack_sequences`'s greedy rule as a
    per-shard recursive CTE walking docs in id order. ``docs_sql`` must
    yield (doc_id, text)."""
    return f"""
        WITH RECURSIVE t AS (
          SELECT doc_id,
                 CAST(((doc_id % {n_shards}) + {n_shards}) % {n_shards}
                      AS INT) AS shard,
                 CAST(len(list_filter(
                     string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> x <> '')) AS BIGINT) AS n_tokens,
                 row_number() OVER (
                     PARTITION BY ((doc_id % {n_shards}) + {n_shards}) % {n_shards}
                     ORDER BY doc_id) AS rn
          FROM ({docs_sql}) WHERE text IS NOT NULL
        ),
        packed AS (
          SELECT doc_id, shard, n_tokens, rn,
                 CAST(0 AS BIGINT) AS seq_bin, n_tokens AS fill
          FROM t WHERE rn = 1
          UNION ALL
          SELECT t.doc_id, t.shard, t.n_tokens, t.rn,
                 CASE WHEN p.fill > 0 AND p.fill + t.n_tokens > {budget}
                      THEN p.seq_bin + 1 ELSE p.seq_bin END,
                 CASE WHEN p.fill > 0 AND p.fill + t.n_tokens > {budget}
                      THEN t.n_tokens ELSE p.fill + t.n_tokens END
          FROM t JOIN packed p ON t.shard = p.shard AND t.rn = p.rn + 1
        )
        SELECT doc_id, shard, seq_bin, n_tokens FROM packed ORDER BY doc_id
    """
