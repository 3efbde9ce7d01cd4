"""Chunking + sequence packing (kgspark/datapipe/pack.py)."""

import pytest

from kgspark.datapipe.pack import (
    chunk_documents,
    pack_sequences,
    pack_sequences_oracle_sql,
)


def _chunks(spark, rows, **kw):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = chunk_documents(df, **kw).collect()
    return sorted((r["doc_id"], r["chunk_id"], r["start_tok"],
                   r["n_tokens"], r["chunk_text"]) for r in out)


def test_chunk_windows_and_overlap(spark):
    # 10 tokens, window 4, stride 3 → starts 0,3,6,9
    text = "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"
    got = _chunks(spark, [(1, text)], window=4, stride=3)
    assert got == [
        (1, 0, 0, 4, "t0 t1 t2 t3"),
        (1, 1, 3, 4, "t3 t4 t5 t6"),
        (1, 2, 6, 4, "t6 t7 t8 t9"),
        (1, 3, 9, 1, "t9"),
    ]
    # neighbors share window - stride = 1 token
    assert got[0][4].split()[-1] == got[1][4].split()[0]


def test_chunk_short_and_empty_docs(spark):
    got = _chunks(spark, [(1, "only two"), (2, "!!! ...")], window=16, stride=8)
    assert got == [(1, 0, 0, 2, "only two")]  # empty-token doc dropped


def test_chunk_is_shuffle_free(spark):
    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    plan = chunk_documents(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_chunk_rejects_bad_stride(spark):
    df = spark.createDataFrame([(1, "a")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        chunk_documents(df, window=4, stride=5)
    with pytest.raises(ValueError):
        chunk_documents(df, window=4, stride=0)


def _pack(spark, texts, **kw):
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = pack_sequences(df, **kw).collect()
    return {r["doc_id"]: (r["shard"], r["seq_bin"], r["n_tokens"]) for r in out}


def test_pack_first_fit_sequential(spark):
    # token counts 3,3,3,5,1 with budget 6, one shard:
    # bin0 = {0,1} (3+3=6 exactly), bin1 = {2} (+5 would burst),
    # bin2 = {3} (5; +1 fits) also takes 4
    texts = ["a b c", "d e f", "g h i", "j k l m n", "o"]
    got = _pack(spark, texts, budget=6, n_shards=1)
    assert {d: b for d, (_, b, _) in got.items()} == {0: 0, 1: 0, 2: 1, 3: 2, 4: 2}


def test_pack_oversized_doc_gets_own_bin(spark):
    texts = ["a b", "x " * 50, "c d"]  # 2, 50, 2 tokens; budget 8
    got = _pack(spark, texts, budget=8, n_shards=1)
    bins = {d: b for d, (_, b, _) in got.items()}
    assert bins[1] not in (bins[0], bins[2])  # alone, never split
    assert got[1][2] == 50


def test_pack_shards_are_independent(spark):
    texts = [f"w{i} " * (i % 5 + 1) for i in range(40)]
    got = _pack(spark, texts, budget=8, n_shards=4)
    assert all(s == d % 4 for d, (s, _, _) in got.items())
    # every bin within a shard must respect the budget unless it holds
    # exactly one (possibly oversized) doc
    from collections import defaultdict
    per_bin = defaultdict(list)
    for d, (s, b, n) in got.items():
        per_bin[(s, b)].append(n)
    for toks in per_bin.values():
        assert sum(toks) <= 8 or len(toks) == 1


def test_pack_negative_ids_shard_in_range_and_match_oracle(spark):
    import duckdb

    rows = [(i, "tok " * 5) for i in (-7, -3, -1, 2, 6)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = pack_sequences(df, budget=8, n_shards=4).collect()
    assert all(0 <= r["shard"] < 4 for r in out)
    con = duckdb.connect()
    con.execute("CREATE TABLE docs (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", rows)
    sql = pack_sequences_oracle_sql("SELECT doc_id, text FROM docs",
                                    budget=8, n_shards=4)
    want = {r[0]: (r[1], r[2]) for r in con.execute(sql).fetchall()}
    got = {r["doc_id"]: (r["shard"], r["seq_bin"]) for r in out}
    assert {d: (int(s), int(b)) for d, (s, b) in want.items()} == got


def test_pack_null_text_dropped_not_corrupting(spark):
    """size(tokenize(NULL)) = -1 under legacy sizeOfNull: an unguarded
    packer would feed n_tokens=-1 into the running fill and shift every
    later bin in the shard. NULL-text docs must be dropped, and the
    remaining docs must bin exactly as if the NULL row never existed."""
    import duckdb

    rows = [(0, "a b c"), (1, None), (2, "d e f"), (3, "g h i")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = pack_sequences(df, budget=6, n_shards=1).collect()
    got = {r["doc_id"]: (r["seq_bin"], r["n_tokens"]) for r in out}
    # doc 1 gone; 0+2 fill bin 0 (3+3=6), 3 starts bin 1 — identical to
    # packing [0, 2, 3] alone
    assert got == {0: (0, 3), 2: (0, 3), 3: (1, 3)}
    con = duckdb.connect()
    con.execute("CREATE TABLE docs (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", rows)
    sql = pack_sequences_oracle_sql("SELECT doc_id, text FROM docs",
                                    budget=6, n_shards=1)
    want = {r[0]: (int(r[2]), int(r[3])) for r in con.execute(sql).fetchall()}
    assert want == got


def test_pack_oracle_matches_spark_in_duckdb(spark):
    import duckdb

    texts = [f"tok " * (3 + (i * 7) % 11) for i in range(30)]
    rows = [(i, t) for i, t in enumerate(texts)]
    con = duckdb.connect()
    con.execute("CREATE TABLE docs (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", rows)
    sql = pack_sequences_oracle_sql("SELECT doc_id, text FROM docs",
                                    budget=16, n_shards=4)
    want = {r[0]: (r[1], r[2], r[3]) for r in con.execute(sql).fetchall()}
    got = _pack(spark, texts, budget=16, n_shards=4)
    assert {d: (int(s), int(b), int(n)) for d, (s, b, n) in want.items()} == got
