"""Chunking + token-budget mixing (operators/curation.py)."""

import pytest

from adavnceseo_crawler_spark.operators.curation import (
    chunk_documents,
    token_budget_mix,
)


def test_chunk_windows_and_overlap(spark):
    # 10 words, chunk 4, overlap 2 -> starts 0,2,4,6,8
    text = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(
        chunk_documents(df, chunk_words=4, overlap=2).collect(),
        key=lambda r: r["chunk_id"],
    )
    assert [r["chunk_id"] for r in rows] == [0, 1, 2, 3, 4]
    assert rows[0]["chunk"] == "w0 w1 w2 w3"
    assert rows[1]["chunk"] == "w2 w3 w4 w5"
    assert rows[4]["chunk"] == "w8 w9" and rows[4]["n_words"] == 2


def test_chunk_short_and_empty_docs(spark):
    df = spark.createDataFrame(
        [(1, "only three words"), (2, "   "), (3, "")],
        "doc_id long, text string",
    )
    rows = chunk_documents(df, chunk_words=64, overlap=16).collect()
    assert len(rows) == 1  # doc 1: one short chunk; empty docs: none
    assert rows[0]["doc_id"] == 1 and rows[0]["n_words"] == 3


def test_chunk_rejects_bad_overlap(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_words=4, overlap=4)


def test_token_budget_mix_crossing_doc_included(spark):
    """Budget semantics: docs taken in md5-rank order; the doc that crosses
    the budget is kept, everything after is dropped; every non-empty source
    contributes at least one doc."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, "s%d" % (i % 2), "w " * 10) for i in range(10)],
        "doc_id long, source string, text string",
    )
    out = token_budget_mix(df, budget_tokens=25)
    rows = out.collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    for src, rs in by_src.items():
        # 10-token docs, budget 25 -> exactly 3 docs (cum 10,20,30)
        assert len(rs) == 3, (src, rs)
        assert max(r["cum_tokens"] for r in rs) == 30
    # determinism: same result twice
    assert sorted(r["doc_id"] for r in out.collect()) == sorted(
        r["doc_id"] for r in rows
    )


def test_token_budget_mix_tiny_budget_keeps_one(spark):
    df = spark.createDataFrame(
        [(1, "a", "x " * 50), (2, "a", "y " * 50)],
        "doc_id long, source string, text string",
    )
    rows = token_budget_mix(df, budget_tokens=1).collect()
    assert len(rows) == 1  # first-ranked doc crosses and is kept


def test_pack_sequences_greedy_fill_and_oversize(spark):
    """Greedy contiguous fill in doc_id order; an oversize doc sits alone in
    an oversize pack; fill resets on overflow."""
    from adavnceseo_crawler_spark.operators.curation import pack_sequences

    docs = [
        (1, "s", "w " * 60),   # 60 -> pack 0 (fill 60)
        (2, "s", "w " * 60),   # 60 -> pack 0 (fill 120)
        (3, "s", "w " * 20),   # 20 -> overflow -> pack 1 (fill 20)
        (4, "s", "w " * 200),  # 200 > cap -> pack 2 alone (fill 200)
        (5, "s", "w " * 5),    # pack 3 (fill 5): oversize pack never reused
        (6, "t", "w " * 10),   # other shard packs independently from 0
    ]
    df = spark.createDataFrame(docs, "doc_id long, source string, text string")
    rows = {r["doc_id"]: r for r in pack_sequences(df, capacity=128).collect()}
    assert (rows[1]["pack_id"], rows[1]["pack_fill"]) == (0, 60)
    assert (rows[2]["pack_id"], rows[2]["pack_fill"]) == (0, 120)
    assert (rows[3]["pack_id"], rows[3]["pack_fill"]) == (1, 20)
    assert (rows[4]["pack_id"], rows[4]["pack_fill"]) == (2, 200)
    assert (rows[5]["pack_id"], rows[5]["pack_fill"]) == (3, 5)
    assert (rows[6]["pack_id"], rows[6]["pack_fill"]) == (0, 10)


def test_pack_sequences_empty_text_joins_current_pack(spark):
    from adavnceseo_crawler_spark.operators.curation import pack_sequences

    df = spark.createDataFrame(
        [(1, "s", "w w w"), (2, "s", "   "), (3, "s", "w")],
        "doc_id long, source string, text string",
    )
    rows = {r["doc_id"]: r for r in pack_sequences(df, capacity=4).collect()}
    assert (rows[2]["pack_id"], rows[2]["pack_fill"]) == (0, 3)  # 0 tokens
    assert (rows[3]["pack_id"], rows[3]["pack_fill"]) == (0, 4)
