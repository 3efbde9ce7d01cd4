"""Deterministic stratified sampling (kgspark/datapipe/sample.py)."""

import pytest

from kgspark.datapipe.sample import (
    RESOLUTION,
    stratified_sample,
    stratified_sample_oracle_sql,
)

ROWS = [(i, "en" if i % 3 else "de") for i in range(600)]


def _mix(spark, weights, **kw):
    df = spark.createDataFrame(ROWS, ["doc_id", "lang"])
    out = stratified_sample(df, weights, **kw).collect()
    return [(r["doc_id"], r["lang"], r["copy"]) for r in out]


def test_integer_weights_are_exact_copies(spark):
    got = _mix(spark, {"en": 2.0, "de": 1.0})
    per_doc = {}
    for d, lang, c in got:
        per_doc.setdefault((d, lang), []).append(c)
    for (d, lang), copies in per_doc.items():
        assert sorted(copies) == list(range(2 if lang == "en" else 1))
    assert len(per_doc) == len(ROWS)  # nothing dropped at weight >= 1


def test_fractional_rate_hits_expected_share(spark):
    got = _mix(spark, {"en": 0.5, "de": 0.0})
    assert all(lang == "en" for _, lang, _ in got)
    n_en = sum(1 for _, lang in ROWS if lang == "en")
    # md5-uniform: binomial(400, .5) stays within 5 sigma of the mean
    assert abs(len(got) - 0.5 * n_en) < 5 * (n_en * 0.25) ** 0.5


def test_deterministic_and_salt_independent(spark):
    a = _mix(spark, {"en": 0.3}, salt="s1")
    b = _mix(spark, {"en": 0.3}, salt="s1")
    c = _mix(spark, {"en": 0.3}, salt="s2")
    assert a == b  # retry-stable: same salt, same sample
    assert {d for d, _, _ in a} != {d for d, _, _ in c}  # salt switches it


def test_default_weight_and_validation(spark):
    got = _mix(spark, {"en": 0.0}, default_weight=1.0)
    assert got and all(lang == "de" for _, lang, _ in got)
    with pytest.raises(ValueError):
        _mix(spark, {"en": -0.1})


def test_upsampling_fraction(spark):
    got = _mix(spark, {"en": 2.25, "de": 0.0})
    per_doc = {}
    for d, _, _ in got:
        per_doc[d] = per_doc.get(d, 0) + 1
    n_en = sum(1 for _, lang in ROWS if lang == "en")
    assert set(per_doc.values()) <= {2, 3}
    third = sum(1 for v in per_doc.values() if v == 3)
    assert abs(third - 0.25 * n_en) < 5 * (n_en * 0.25 * 0.75) ** 0.5


def test_oracle_matches_spark_in_duckdb(spark):
    import duckdb

    con = duckdb.connect()
    con.execute("CREATE TABLE docs (doc_id BIGINT, lang VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", ROWS)
    sql = stratified_sample_oracle_sql(
        "SELECT doc_id, lang FROM docs", {"en": 1.4, "de": 0.6})
    want = sorted((int(r[0]), r[1], int(r[2])) for r in con.execute(sql).fetchall())
    got = sorted(_mix(spark, {"en": 1.4, "de": 0.6}))
    assert want == got


def test_null_id_keeps_floor_copies_and_matches_oracle(spark):
    import duckdb

    rows = [(None, "de"), (1, "de"), (2, "en")]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    weights = {"de": 1.5, "en": 0.5}
    got = sorted(
        ((r["doc_id"], r["lang"], r["copy"])
         for r in stratified_sample(df, weights).collect()),
        key=str)
    # the NULL-id row can't hash: it keeps floor(1.5) = 1 copy, never
    # the fractional extra
    assert (None, "de", 0) in got and (None, "de", 1) not in got
    con = duckdb.connect()
    con.execute("CREATE TABLE docs (doc_id BIGINT, lang VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", rows)
    want = sorted(
        ((r[0], r[1], int(r[2])) for r in con.execute(
            stratified_sample_oracle_sql("SELECT doc_id, lang FROM docs",
                                         weights)).fetchall()),
        key=str)
    assert want == got


def test_empty_weights_oracle_sql_is_valid(spark):
    import duckdb

    con = duckdb.connect()
    con.execute("CREATE TABLE docs (doc_id BIGINT, lang VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", ROWS[:10])
    sql = stratified_sample_oracle_sql("SELECT doc_id, lang FROM docs",
                                       {}, default_weight=1.0)
    assert len(con.execute(sql).fetchall()) == 10


def test_reserved_output_columns_raise_instead_of_clobbering(spark):
    df = spark.createDataFrame([(1, "en", 9)], ["doc_id", "lang", "copy"])
    with pytest.raises(ValueError, match="copy"):
        stratified_sample(df, {"en": 1.0})
    df2 = spark.createDataFrame([(1, "en", 9)], ["doc_id", "lang", "_n"])
    with pytest.raises(ValueError, match="_n"):
        stratified_sample(df2, {"en": 1.0})


def test_oracle_sql_escapes_quotes_in_keys_and_salt(spark):
    import duckdb

    rows = [(1, "o'brien"), (2, "en")]
    con = duckdb.connect()
    con.execute("CREATE TABLE docs (doc_id BIGINT, lang VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", rows)
    weights, salt = {"o'brien": 1.0}, "mix'v1"
    sql = stratified_sample_oracle_sql("SELECT doc_id, lang FROM docs",
                                       weights, salt=salt)
    want = sorted((int(r[0]), r[1], int(r[2]))
                  for r in con.execute(sql).fetchall())
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    got = sorted((r["doc_id"], r["lang"], r["copy"])
                 for r in stratified_sample(df, weights, salt=salt).collect())
    assert want == got == [(1, "o'brien", 0)]


def test_resolution_quantization():
    assert RESOLUTION == 1_000_000  # weights quantized at 1e-6 — the
    # documented contract for oracle-exact CASE thresholds
