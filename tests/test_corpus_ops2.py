"""Round-4 second-batch corpus operators: recrawl scheduling, boilerplate
stripping, importance sampling."""

import hashlib
from datetime import datetime

from pyspark.sql import functions as F


def test_change_rate_priority_hand_computed(spark):
    from adavnceseo_crawler_spark.operators.recrawl import change_rate_priority

    d = datetime
    rows = [
        # page 1: 4 obs, values 1,1,2,2 -> 1 change / 3 opportunities
        (1, d(2024, 1, 1), 1, 1.0),
        (2, d(2024, 1, 2), 1, 1.0),
        (3, d(2024, 1, 3), 1, 2.0),
        (4, d(2024, 1, 4), 1, 2.0),
        # page 2: 3 obs, every value differs -> rate 1.0, last seen Jan 3
        (5, d(2024, 1, 1), 2, 1.0),
        (6, d(2024, 1, 2), 2, 2.0),
        (7, d(2024, 1, 3), 2, 3.0),
        # page 3: 1 obs -> rate 0 (no opportunity), priority 0
        (8, d(2024, 1, 1), 3, 9.0),
    ]
    ev = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long, value double")
    out = {r["user_id"]: r for r in change_rate_priority(ev).collect()}
    assert out[1]["n_obs"] == 4 and out[1]["n_changes"] == 1
    assert abs(out[1]["change_rate"] - 1 / 3) < 1e-6
    assert out[1]["age_days"] == 0.0 and out[1]["priority"] == 0.0
    assert out[2]["change_rate"] == 1.0
    assert out[2]["age_days"] == 1.0  # now = Jan 4 (page 1's last obs)
    assert out[2]["priority"] == 1.0
    assert out[3]["n_changes"] == 0 and out[3]["priority"] == 0.0


def test_change_rate_order_ties_on_event_id(spark):
    from adavnceseo_crawler_spark.operators.recrawl import change_rate_priority

    d = datetime(2024, 1, 1)
    # same timestamp: event_id breaks the tie, so values run 1,2,1 = 2 changes
    ev = spark.createDataFrame(
        [(1, d, 7, 1.0), (2, d, 7, 2.0), (3, d, 7, 1.0)],
        "event_id long, ts timestamp, user_id long, value double",
    )
    r = change_rate_priority(ev).collect()[0]
    assert r["n_changes"] == 2 and r["change_rate"] == 1.0


def test_boilerplate_strip_frequency_rule(spark):
    from adavnceseo_crawler_spark.operators.dedup import boilerplate_strip

    rows = []
    for i in range(10):
        text = f"unique body {i}\nCOOKIE BANNER"
        if i < 3:
            text += "\nrare promo"  # 30% < 50% threshold -> kept
        rows.append((i, "a", text))
    # a second source where the same banner text is RARE -> kept there
    rows.append((100, "b", "other body\nCOOKIE BANNER"))
    rows.append((101, "b", "other body 2"))
    d = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r["doc_id"]: r for r in boilerplate_strip(d, min_frac=0.5).collect()}
    assert out[0]["new_text"] == "unique body 0\nrare promo"
    assert out[5]["new_text"] == "unique body 5"
    assert out[5]["n_lines"] == 2 and out[5]["kept_lines"] == 1
    # per-group threshold + min_docs floor: source b's single banner copy
    # survives (df 1 < max(50% of 2, 2) = 2)
    assert out[100]["new_text"] == "other body\nCOOKIE BANNER"
    assert out[101]["new_text"] == "other body 2"


def test_boilerplate_strip_removes_all_copies(spark):
    from adavnceseo_crawler_spark.operators.dedup import boilerplate_strip

    d = spark.createDataFrame(
        [(0, "s", "x\nnav"), (1, "s", "y\nnav"), (2, "s", "nav")],
        "doc_id long, source string, text string",
    )
    out = {r["doc_id"]: r for r in boilerplate_strip(d, min_frac=0.5).collect()}
    # unlike line_dedup, even the FIRST occurrence is removed
    assert out[0]["new_text"] == "x"
    assert out[2]["new_text"] == "" and out[2]["kept_lines"] == 0


def _md5_u(i: int) -> float:
    return int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) / 0xFFFFFFFF


def test_importance_sample_deterministic_and_weighted(spark):
    from adavnceseo_crawler_spark.operators.sampling import importance_sample

    d = spark.createDataFrame(
        [(i, 0.5) for i in range(200)], "doc_id long, p double"
    )
    out = importance_sample(d, F.col("p"), "doc_id")
    kept = sorted(r["doc_id"] for r in out.collect())
    expected = sorted(i for i in range(200) if _md5_u(i) < 0.5)
    assert kept == expected
    assert 60 < len(kept) < 140  # ~Binomial(200, .5)
    r0 = out.filter(F.col("doc_id") == kept[0]).collect()[0]
    assert r0["weight"] == 2.0 and r0["p_keep"] == 0.5


def test_importance_sample_p_one_keeps_all(spark):
    from adavnceseo_crawler_spark.operators.sampling import importance_sample

    d = spark.createDataFrame([(i,) for i in range(50)], "doc_id long")
    out = importance_sample(d, F.lit(1.0), "doc_id")
    assert out.count() == 50
    assert out.select(F.min("weight"), F.max("weight")).collect()[0] == (1.0, 1.0)


def test_passage_scrub_removes_hot_spans_only(spark):
    from adavnceseo_crawler_spark.operators.quality import passage_scrub

    hot = "alpha beta gamma delta"  # one 4-gram, planted in 5 docs
    # prefix words are doc-UNIQUE so boundary grams never reach min_df
    rows = [(i, f"u{i} w{i} h{i} " + hot) for i in range(5)]
    rows.append((10, "completely fresh text alpha beta gamma"))  # only 3 of 4
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in passage_scrub(d, n=4, min_df=5).collect()}
    for i in range(5):
        assert out[i]["n_removed"] == 4
        assert out[i]["new_text"] == f"u{i} w{i} h{i}"
    # sub-threshold doc untouched (its grams never reach df 5)
    assert out[10]["n_removed"] == 0
    assert out[10]["new_text"] == "completely fresh text alpha beta gamma"


def test_passage_scrub_overlapping_coverage(spark):
    from adavnceseo_crawler_spark.operators.quality import passage_scrub

    # the hot 4-gram occurs twice, overlapping coverage must not double-count
    body = "a b c d"
    rows = [(i, f"x{i} {body} mid{i} {body} y{i}") for i in range(6)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in passage_scrub(d, n=4, min_df=6).collect()}
    for i in range(6):
        assert out[i]["n_tokens"] == 11
        assert out[i]["n_removed"] == 8
        assert out[i]["new_text"] == f"x{i} mid{i} y{i}"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_recrawl_plan_single_data_shuffle(spark):
    """The lag window and the per-entity aggregate share the user_id
    exchange; the only other exchange is the 1-row corpus-"now" aggregate
    (SinglePartition), and "now" rides as a broadcast — no extra job."""
    from datetime import datetime

    from adavnceseo_crawler_spark.operators.recrawl import change_rate_priority

    ev = spark.createDataFrame(
        [(1, datetime(2024, 1, 1), 1, 1.0)],
        "event_id long, ts timestamp, user_id long, value double",
    )
    plan = _plan(change_rate_priority(ev))
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Exchange SinglePartition") == 1
    assert "BroadcastExchange" in plan


def test_boilerplate_plan_broadcasts_flags(spark):
    """The flagged-template set and per-group totals are broadcast; the
    corpus line stream never hash-shuffles for the removal join — only the
    doc-frequency aggregate and the per-doc reassembly shuffle."""
    from adavnceseo_crawler_spark.operators.dedup import boilerplate_strip

    d = spark.createDataFrame(
        [(0, "s", "a\nb")], "doc_id long, source string, text string"
    )
    plan = _plan(boilerplate_strip(d))
    assert plan.count("BroadcastExchange") >= 2  # totals + flags
    # the five data shuffles are the canonical distinct-aggregate chain
    # ((s,l,d) partial, (s,l) final, per-source totals) plus the doc-keyed
    # reassembly and the base re-join; the removal join itself contributes
    # NONE (broadcast left_anti)
    assert plan.count("Exchange hashpartitioning") <= 5


def test_importance_sample_plan_no_shuffle(spark):
    from pyspark.sql import functions as F

    from adavnceseo_crawler_spark.operators.sampling import importance_sample

    d = spark.createDataFrame([(1,)], "doc_id long")
    plan = _plan(importance_sample(d, F.lit(0.5), "doc_id"))
    assert "Exchange" not in plan  # pure map-side: filter sits on the scan


def test_boilerplate_strip_blank_lines_are_chrome(spark):
    """Blank lines (e.g. from paragraph spacing) occur in most documents,
    cross the frequency threshold, and are stripped like any template line
    — documented behavior, matches the C4 convention of dropping empties."""
    from adavnceseo_crawler_spark.operators.dedup import boilerplate_strip

    d = spark.createDataFrame(
        [(i, "s", f"para one {i}\n\npara two {i}") for i in range(4)],
        "doc_id long, source string, text string",
    )
    out = {r["doc_id"]: r for r in boilerplate_strip(d, min_frac=0.5).collect()}
    assert out[0]["n_lines"] == 3 and out[0]["kept_lines"] == 2
    assert out[0]["new_text"] == "para one 0\npara two 0"


def test_passage_scrub_short_docs_untouched(spark):
    from adavnceseo_crawler_spark.operators.quality import passage_scrub

    d = spark.createDataFrame(
        [(i, "too short") for i in range(8)] + [(99, "")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in passage_scrub(d, n=4, min_df=2).collect()}
    assert out[0]["n_tokens"] == 2 and out[0]["n_removed"] == 0
    assert out[0]["new_text"] == "too short"
    assert out[99]["n_tokens"] == 0 and out[99]["new_text"] == ""


def _scrub_reference(docs, n, min_df):
    """Pure-Python reference for passage_scrub: same gram rule, same
    coverage rule, no Spark."""
    words = {i: t.split() for i, t in docs}
    gdocs = {}
    for i, ws in words.items():
        for s in range(len(ws) - n + 1):
            gdocs.setdefault(" ".join(ws[s : s + n]), set()).add(i)
    hot = {g for g, ds in gdocs.items() if len(ds) >= min_df}
    out = {}
    for i, ws in words.items():
        cov = set()
        for s in range(len(ws) - n + 1):
            if " ".join(ws[s : s + n]) in hot:
                cov.update(range(s, s + n))
        kept = [w for p, w in enumerate(ws) if p not in cov]
        out[i] = (len(ws), len(ws) - len(kept), " ".join(kept))
    return out


def test_passage_scrub_random_corpora_match_reference(spark):
    """Randomized cross-check: tiny vocabulary forces organic gram
    collisions (not just planted ones); the Spark operator must equal the
    pure-Python reference on every doc."""
    import random

    rng = random.Random(7)
    vocab = ["a", "b", "c", "d", "e"]
    for trial in range(3):
        docs = [
            (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 12))))
            for i in range(30)
        ]
        from adavnceseo_crawler_spark.operators.quality import passage_scrub

        sdf = spark.createDataFrame(docs, "doc_id long, text string")
        got = {
            r["doc_id"]: (r["n_tokens"], r["n_removed"], r["new_text"])
            for r in passage_scrub(sdf, n=3, min_df=3).collect()
        }
        want = _scrub_reference(docs, 3, 3)
        assert got == want, f"trial {trial}"
