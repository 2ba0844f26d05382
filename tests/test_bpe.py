"""Distributed BPE fit/encode (functions/bpe.py) vs a transparent
pure-Python reference with identical tie-breaks."""

from collections import Counter

from pyspark.sql import functions as F

from adavnceseo_crawler_spark.functions.bpe import (
    EOW,
    bpe_encode,
    bpe_encode_word,
    fit_bpe,
)


def fit_ref(word_counts: dict[str, int], n_merges: int, min_count: int = 2):
    """Spec implementation: same pair counting (overlapping pairs count),
    same greedy left-to-right merge, same (count desc, pair asc) tie-break."""
    vocab = {w: list(w) + [EOW] for w in word_counts}
    merges = []
    for _ in range(n_merges):
        pc: Counter = Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += word_counts[w]
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), c = best
        if c < min_count:
            break
        merges.append((a, b))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges


CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "the quicker they come the quicker they go",
    "low lower lowest slow slower slowest",
    "new newer newest knew renew",
    "the low new dog jumps low",
]


def test_fit_matches_reference_merge_list(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    wc = Counter(w for t in CORPUS for w in t.split())
    ref = fit_ref(dict(wc), n_merges=20)
    got = fit_bpe(df, n_merges=20)
    assert got == ref, (got, ref)
    assert len(got) == 20  # corpus is rich enough that no early stop fires


def test_fit_early_stop_on_min_count(spark):
    df = spark.createDataFrame([("ab cd ef",)], "text string")
    # every pair occurs once -> below min_count=2 -> no merges at all
    assert fit_bpe(df, n_merges=5, min_count=2) == []


def test_encode_matches_pure_python_and_roundtrips(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )
    merges = fit_bpe(df, n_merges=12)
    ranks = {p: i for i, p in enumerate(merges)}
    out = {r["doc_id"]: r for r in bpe_encode(df, merges).collect()}
    for i, t in enumerate(CORPUS):
        words = t.split()
        expect = [s for w in words for s in bpe_encode_word(w, ranks)]
        assert list(out[i]["tokens"]) == expect
        assert out[i]["n_words"] == len(words)
        assert out[i]["n_tokens"] == len(expect)
        # lossless: stripping EOW re-yields the original words
        rebuilt = "".join(out[i]["tokens"]).split(EOW)
        assert [w for w in rebuilt if w] == words


def test_merges_actually_compress(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )
    merges = fit_bpe(df, n_merges=15)
    enc = bpe_encode(df, merges)
    total = enc.agg(F.sum("n_tokens")).first()[0]
    # chars+EOW per word is the unmerged token count
    char_tokens = sum(len(w) + 1 for t in CORPUS for w in t.split())
    assert total < char_tokens


def test_q76_merge_constant_matches_fit(spark):
    """The hard-coded pretrained merge table in queries.py IS what fit_bpe
    learns from the sf0.01 corpus — one derivation, no silent desync."""
    from adavnceseo_crawler_spark.queries import _Q76_MERGES

    d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    assert fit_bpe(d, n_merges=8) == _Q76_MERGES
