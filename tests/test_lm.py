"""Bigram-LM quality scoring (datapipe.lm) — deterministic CCNet-style
perplexity filter. Cross-engine value parity is covered by the `lm_nll`
oracle; here: ranking behavior, unseen-bigram floor, short-doc edge."""

import math

from kgspark.datapipe.lm import bigram_lm, lm_nll_scores


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_self_trained_ranks_garbage_above_prose(spark):
    common = "the quick brown fox jumps over the lazy dog"
    corpus = [(i, common) for i in range(8)]
    corpus.append((100, "zx qv jk wp mn bt lf gd rs"))  # unique-token garbage
    out = {r["doc_id"]: r["nll"] for r in
           lm_nll_scores(_df(spark, corpus)).collect()}
    prose_nll = max(v for k, v in out.items() if k < 100)
    assert out[100] > prose_nll + 1.0  # rare continuations score clearly worse


def test_external_train_unseen_floor(spark):
    train = _df(spark, [(0, "alpha beta gamma delta alpha beta")])
    seen = _df(spark, [(0, "alpha beta")])
    unseen = _df(spark, [(1, "alpha zzz")])  # seen w1, unseen bigram
    novel = _df(spark, [(2, "qqq zzz")])     # unseen w1 entirely
    s = lm_nll_scores(seen, train=train).collect()[0]["nll"]
    u = lm_nll_scores(unseen, train=train).collect()[0]["nll"]
    n = lm_nll_scores(novel, train=train).collect()[0]["nll"]
    # add-alpha: unseen bigram after a FREQUENT w1 is rarest (denominator
    # c(w1)+alpha*V); a wholly-novel w1 falls back to the alpha*V floor
    assert s < n < u
    # novel-w1 floor is exactly ln(1/V) = -ln(4): alpha cancels
    assert abs(n - math.log(4)) < 1e-3


def test_short_docs_absent_and_counts(spark):
    df = _df(spark, [(0, "only"), (1, ""), (2, "a b c")])
    rows = {r["doc_id"]: r for r in lm_nll_scores(df).collect()}
    assert set(rows) == {2}
    assert rows[2]["n_bigrams"] == 2


def test_bigram_lm_probabilities_sum_consistent(spark):
    # c("a b")=2, c("a c")=1, c(a)=3, V=3: p(b|a)=(2+.5)/(3+1.5), p(c|a)=1.5/4.5
    train = _df(spark, [(0, "a b"), (1, "a b"), (2, "a c")])
    lm = {(r["w1"], r["w2"]): r["lp_micro"] for r in
          bigram_lm(train, "doc_id", "text").collect()}
    assert lm[("a", "b")] == round(math.log(2.5 / 4.5) * 1e6)
    assert lm[("a", "c")] == round(math.log(1.5 / 4.5) * 1e6)
