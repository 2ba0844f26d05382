"""Corpus-quality gates (operators/quality.py) and the bigram LM filter
(operators/lm.py) against hand-computed fixtures.  The full DuckDB oracle
parity for q62/q63/q64 runs in test_queries_oracle.py."""

import math

import pytest
from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_gopher_repetition_hand_computed(spark):
    from adavnceseo_crawler_spark.operators.quality import gopher_repetition

    long_doc = " ".join(f"w{i}" for i in range(60))
    df = _docs(
        spark,
        [
            (1, "a b a b a b"),   # bigrams ab×3 ba×2; trigrams aba×2 bab×2
            (2, long_doc),        # 60 distinct words, passes every gate
            (3, "1 2 3"),         # no alphabetic words
            (4, "x"),             # single word: no grams at all
            (5, ""),              # empty text
        ],
    )
    out = {r["doc_id"]: r.asDict() for r in gopher_repetition(df).collect()}

    assert out[1]["n_words"] == 6
    assert out[1]["top_bigram_frac"] == 0.6          # 3 of 5 bigrams
    assert out[1]["dup_trigram_frac"] == 1.0         # all 4 trigrams dup
    assert out[1]["keep"] is False                   # n_words < 50

    assert out[2]["n_words"] == 60
    assert out[2]["top_bigram_frac"] == round(1 / 59, 6)
    assert out[2]["dup_trigram_frac"] == 0.0
    assert out[2]["alpha_word_frac"] == 1.0
    assert out[2]["keep"] is True

    assert out[3]["alpha_word_frac"] == 0.0
    assert out[3]["top_bigram_frac"] == 0.5          # 2 distinct of 2
    assert out[3]["keep"] is False

    for d in (4, 5):                                 # gram-free docs
        assert out[d]["top_bigram_frac"] == 0.0
        assert out[d]["dup_trigram_frac"] == 0.0
        assert out[d]["keep"] is False
    assert out[4]["n_words"] == 1 and out[5]["n_words"] == 0


def test_decontaminate_planted_overlap(spark):
    from adavnceseo_crawler_spark.operators.quality import decontaminate

    bench = _docs(spark, [(100, "p q r s t u v w x")])
    corpus = _docs(
        spark,
        [
            (1, "z z q r s t z"),  # shares exactly {q r s t}
            (2, "m n o p"),        # clean
            (3, "p q r s t"),      # shares {p q r s, q r s t}
            (4, "hi"),             # too short for any 4-gram
        ],
    )
    out = {r["doc_id"]: (r["n_shared"], r["contaminated"])
           for r in decontaminate(corpus, bench, n=4).collect()}
    assert out == {1: (1, True), 2: (0, False), 3: (2, True), 4: (0, False)}


def test_bigram_lm_hand_computed(spark):
    from adavnceseo_crawler_spark.operators.lm import (
        bigram_lm_fit,
        bigram_lm_score,
    )

    train = _docs(spark, [(0, "a b a b")])  # c2: ab 2, ba 1; c1: a 2, b 1; V=3
    c2, c1, v = bigram_lm_fit(train)
    assert {(r["bg"], r["c2"]) for r in c2.collect()} == {("a b", 2), ("b a", 1)}
    assert {(r["ctx"], r["c1"]) for r in c1.collect()} == {("a", 2), ("b", 1)}
    assert v.collect()[0]["v"] == 3

    corpus = _docs(spark, [(1, "a b c"), (2, "z")])
    out = {r["doc_id"]: (r["n_bigrams"], r["avg_nll"])
           for r in bigram_lm_score(corpus, c2, c1, v).collect()}
    # P(b|a) = (2+1)/(2+3) = 0.6 ; P(c|b) = (0+1)/(1+3) = 0.25
    want = round((-math.log(0.6) - math.log(0.25)) / 2, 6)
    assert out[1] == (2, want)
    assert out[2] == (0, None)


def test_decontaminate_broadcasts_benchmark(spark):
    """The benchmark gram set must reach the corpus stream as a broadcast
    join — the corpus side never shuffles on the gram key."""
    from adavnceseo_crawler_spark.operators.quality import decontaminate

    bench = _docs(spark, [(100, "p q r s t u v w x")])
    corpus = _docs(spark, [(1, "z z q r s t z")])
    plan = decontaminate(corpus, bench, n=4)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_repeated_passages_planted(spark):
    """Planted shared passage: docs 1 and 2 share one 4-gram ("a b c d"),
    doc 3 shares nothing, doc 4 is too short for any 4-gram."""
    from adavnceseo_crawler_spark.operators.quality import repeated_passages

    df = spark.createDataFrame(
        [
            (1, "a b c d x y z"),
            (2, "p q a b c d"),
            (3, "one two three four five"),
            (4, "too short"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in repeated_passages(df, n=4).collect()}
    assert rows[1]["n_grams"] == 4 and rows[1]["n_shared"] == 1
    assert rows[2]["n_grams"] == 3 and rows[2]["n_shared"] == 1
    assert rows[3]["n_grams"] == 2 and rows[3]["n_shared"] == 0
    assert rows[4]["n_grams"] == 0 and rows[4]["shared_frac"] == 0.0
    assert abs(rows[1]["shared_frac"] - 0.25) < 1e-9


def test_repeated_passages_within_doc_repeat_not_shared(spark):
    """A gram repeated WITHIN one doc is not cross-doc shared (distinct
    grams per doc before the doc-frequency count)."""
    from adavnceseo_crawler_spark.operators.quality import repeated_passages

    df = spark.createDataFrame(
        [(1, "a b c d a b c d"), (2, "nothing in common here at all")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in repeated_passages(df, n=4).collect()}
    assert rows[1]["n_shared"] == 0


def test_url_template_traps_planted(spark):
    """Planted trap: 60 calendar URLs collapse to one template on one host;
    3 article URLs on another host stay under threshold.  Hex session ids
    collapse to H."""
    from pyspark.sql import functions as F
    from adavnceseo_crawler_spark.operators.urlmine import mine_url_templates

    cal = spark.range(60).select(
        F.concat(
            F.lit("https://trap.example.com/cal/2024/"),
            F.col("id").cast("string"),
        ).alias("url")
    )
    art = spark.createDataFrame(
        [
            ("https://ok.example.com/about",),
            ("https://ok.example.com/contact",),
            ("https://ok.example.com/s/0123456789abcdef0123456789abcdef",),
        ],
        "url string",
    )
    out = {
        (r["host"], r["template"]): r
        for r in mine_url_templates(cal.union(art), threshold=50).collect()
    }
    trap = out[("trap.example.com", "/cal/N/N")]
    assert trap["n_urls"] == 60 and trap["trap"]
    assert ("ok.example.com", "/s/H") in out
    assert not out[("ok.example.com", "/s/H")]["trap"]
    assert not out[("ok.example.com", "/about")]["trap"]


def test_repeated_passages_single_gram_pass(spark):
    """Doc frequency rides a window over the gram partitioning — the gram
    stream is generated ONCE and shuffled at most 3 times ((doc_id,gram)
    distinct, gram window, doc_id rollup).  A groupBy+join-back shape
    regresses to two Generate nodes and 6 exchanges."""
    from adavnceseo_crawler_spark.operators.quality import repeated_passages

    df = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "c d e f g h")], "doc_id long, text string"
    )
    plan = (
        repeated_passages(df, n=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Generate explode") == 1, plan
    assert plan.count("Exchange hashpartitioning") <= 4, plan


def test_scrub_pii_planted(spark):
    from adavnceseo_crawler_spark.operators.scrub import scrub_pii

    df = spark.createDataFrame(
        [
            (1, "mail a.b@x.co then ip 10.0.3.5 call +15551234 end"),
            (2, "date 2024-01-02 version 1.2.3.4.5 nothing"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in scrub_pii(df).collect()}
    r1 = rows[1]
    assert (r1["n_emails"], r1["n_ips"], r1["n_phones"]) == (1, 1, 1)
    assert r1["scrubbed"] == "mail <EMAIL> then ip <IP> call <PHONE> end"
    r2 = rows[2]
    # 1.2.3.4.5: the first dotted quad matches (\b boundaries are digits
    # vs dot); dates and bare numbers never do
    assert r2["n_emails"] == 0 and r2["n_phones"] == 0


def test_nfc_normalize_composes(spark):
    from adavnceseo_crawler_spark.operators.scrub import nfc_normalize

    df = spark.createDataFrame(
        [(1, "café"), (2, "plain")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in nfc_normalize(df).collect()}
    assert rows[1]["normalized"] == "café"
    assert rows[1]["changed"] and rows[1]["n_chars_before"] == 5
    assert rows[1]["n_chars_after"] == 4
    assert not rows[2]["changed"]
