"""Streaming operators beyond foreachBatch ingest: a watermarked
event-time windowed aggregation (late-data handling) and a custom
stateful operator via ``applyInPandasWithState``.

Both are the idiomatic Structured-Streaming forms of jobs a crawl-fed
KG pipeline runs continuously:

- ``ingest_rate_stats``: per-(event-time window, lang) page counts with
  a watermark so state for closed windows is dropped and late arrivals
  beyond the watermark are discarded — the monitoring/metrics leg.
- ``first_seen``: emit each key (url) only the FIRST time it is ever
  seen across all micro-batches — streaming crawl dedup that drops
  re-crawls *before* the expensive extraction stage. State per key is a
  single flag; at cluster scale the state store is partitioned by the
  grouping key across executors (use the RocksDB state store provider
  for 10^10-key crawls so state spills off-heap), and processing-time
  timeouts can evict keys after a re-crawl horizon.

The reference has no streaming surface (its AsyncWorker queue feeds
add_episode one episode at a time, server/graph_service/routers/
ingest.py:17-52); these follow the public Structured Streaming
programming guide patterns instead.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from kgspark.schemas import PAGES


def ingest_rate_stats(pages: DataFrame, window_dur: str = "1 minute",
                      slide: str | None = None,
                      watermark: str = "2 minutes") -> DataFrame:
    """Event-time ingest metrics: (window_start, window_end, lang,
    n_pages, n_urls_approx) per tumbling (or sliding) window over
    ``warc_ts``, watermarked so rows later than ``watermark`` are
    dropped and window state is bounded. approx_count_distinct because
    exact distinct aggregation is unsupported (and unnecessary — it's a
    monitoring metric) on streams."""
    win = F.window("warc_ts", window_dur, slide) if slide else F.window("warc_ts", window_dur)
    return (
        pages.withWatermark("warc_ts", watermark)
        .groupBy(win.alias("win"), "lang")
        .agg(
            F.count("*").alias("n_pages"),
            F.approx_count_distinct("url").alias("n_urls_approx"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "lang", "n_pages", "n_urls_approx",
        )
    )


_FIRST_SEEN_STATE = T.StructType([T.StructField("seen", T.IntegerType(), True)])


def _first_seen_fn(key: Any, pdfs: Iterator[pd.DataFrame],
                   state: GroupState) -> Iterator[pd.DataFrame]:
    """Emit the earliest-warc_ts row for this key iff the key has never
    been seen in any earlier micro-batch; flag it seen either way."""
    if state.exists:
        for _ in pdfs:  # drain (required by the contract), emit nothing
            pass
        return
    batch = pd.concat(list(pdfs), ignore_index=True)
    state.update((1,))
    yield batch.sort_values(["warc_ts", "url"], kind="stable").head(1)


def first_seen(pages: DataFrame, key_col: str = "url") -> DataFrame:
    """Streaming first-seen dedup: one output row per ``key_col``, ever —
    the earliest capture in the first micro-batch that contains the key;
    later re-crawls are swallowed. Custom stateful operator via
    applyInPandasWithState (Arrow-batched; per-key state = one int)."""
    return pages.groupBy(key_col).applyInPandasWithState(
        _first_seen_fn,
        outputStructType=PAGES,
        stateStructType=_FIRST_SEEN_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
