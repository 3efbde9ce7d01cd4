"""Watermarked windowed aggregation + applyInPandasWithState first-seen
dedup (kgspark/streaming/stateful.py). Each test drains one file per
availableNow run against the SAME checkpoint, so micro-batch order is
deterministic and cross-batch state / watermark late-drop are genuinely
exercised (file-source mtime ordering is not guaranteed, so a single
drain with maxFilesPerTrigger can't pin the order)."""

import os
from datetime import datetime

from pyspark.sql import Row

from kgspark.schemas import PAGES
from kgspark.streaming.stateful import first_seen, ingest_rate_stats


def _page(url, ts, text="body words here", lang="en"):
    return Row(url=url, warc_ts=ts, html=None, text=text, lang=lang)


def _run_batches(spark, tmp_path, batches, make_stream):
    """Write batch i, drain it, write batch i+1, drain ... — one
    micro-batch per availableNow run; streaming state (first-seen flags,
    watermark) carries across runs via the checkpoint."""
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir, exist_ok=True)
    collected = []
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, PAGES).coalesce(1).write.parquet(
            os.path.join(in_dir, f"b{i}"))
        pages = (
            spark.readStream.schema(PAGES)
            .option("recursiveFileLookup", "true")
            .parquet(in_dir)
        )
        q = (
            make_stream(pages).writeStream.foreachBatch(
                lambda df, bid, i=i: collected.append((i, df.collect())))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return collected


def test_first_seen_across_batches(spark, tmp_path):
    b0 = [
        _page("u/a", datetime(2024, 6, 1, 10, 0, 30)),
        _page("u/a", datetime(2024, 6, 1, 10, 0, 10)),  # earlier dup in-batch
        _page("u/b", datetime(2024, 6, 1, 10, 0, 40)),
    ]
    b1 = [
        _page("u/a", datetime(2024, 6, 1, 10, 5, 0)),   # re-crawl: swallowed
        _page("u/c", datetime(2024, 6, 1, 10, 6, 0)),
    ]
    collected = _run_batches(spark, tmp_path, [b0, b1], first_seen)

    rows = [r for _, batch in collected for r in batch]
    assert sorted(r.url for r in rows) == ["u/a", "u/b", "u/c"]
    by_url = {r.url: r for r in rows}
    # earliest capture of u/a (10:00:10), not the later in-batch row —
    # and the batch-1 re-crawl emitted nothing
    assert by_url["u/a"].warc_ts == datetime(2024, 6, 1, 10, 0, 10)
    batch1_urls = [r.url for i, batch in collected if i == 1 for r in batch]
    assert batch1_urls == ["u/c"]


def test_windowed_stats_drop_late_rows(spark, tmp_path):
    b0 = [
        _page("u/1", datetime(2024, 6, 1, 10, 0, 10)),
        _page("u/2", datetime(2024, 6, 1, 10, 0, 50)),
        _page("u/3", datetime(2024, 6, 1, 10, 2, 5)),
    ]
    b1 = [
        # 9:50 is behind the post-batch-0 watermark (10:02:05 - 2min
        # = 10:00:05): its window [9:50, 9:51) is already closed -> dropped
        _page("u/late", datetime(2024, 6, 1, 9, 50, 0)),
        _page("u/4", datetime(2024, 6, 1, 10, 3, 0)),
    ]
    collected = _run_batches(
        spark, tmp_path, [b0, b1],
        lambda pages: ingest_rate_stats(pages, "1 minute", watermark="2 minutes"),
    )

    final = {}
    for _, batch in collected:  # update mode: later emissions win
        for r in batch:
            final[(r.window_start, r.lang)] = r.n_pages
    starts = sorted(ws for ws, _ in final)
    assert datetime(2024, 6, 1, 9, 50) not in starts  # late row dropped
    assert final[(datetime(2024, 6, 1, 10, 0), "en")] == 2
    assert final[(datetime(2024, 6, 1, 10, 2), "en")] == 1
    assert final[(datetime(2024, 6, 1, 10, 3), "en")] == 1
