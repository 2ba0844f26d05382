"""Property tests (SURVEY.md §5.7): canonicalizer idempotence, robots
longest-prefix, bloom no-false-negatives, politeness budget — pure Python,
hypothesis-driven, no Spark session needed."""

import hashlib
import string

from hypothesis import given, settings
from hypothesis import strategies as st

from adavnceseo_crawler_spark.functions.urls import (
    canonicalize_url,
    resolve_and_canonicalize,
)
from adavnceseo_crawler_spark.synth import robots_allows

_host = st.from_regex(r"[a-zA-Z0-9][a-zA-Z0-9\-]{0,20}(\.[a-zA-Z]{2,6}){1,2}", fullmatch=True)
_path = st.lists(
    st.text(alphabet=string.ascii_letters + string.digits + "-._~%", min_size=1, max_size=8),
    max_size=5,
).map(lambda segs: "/" + "/".join(segs))
_query = st.lists(
    st.tuples(
        st.text(alphabet=string.ascii_lowercase, min_size=1, max_size=5),
        st.text(alphabet=string.ascii_lowercase + string.digits, max_size=5),
    ),
    max_size=4,
).map(lambda kvs: "&".join(f"{k}={v}" for k, v in kvs))


@st.composite
def urls(draw):
    scheme = draw(st.sampled_from(["http", "https", "HTTP", "Https"]))
    host = draw(_host)
    port = draw(st.sampled_from(["", ":80", ":443", ":8080"]))
    path = draw(_path)
    q = draw(_query)
    frag = draw(st.sampled_from(["", "#x", "#frag-1"]))
    return f"{scheme}://{host}{port}{path}" + (f"?{q}" if q else "") + frag


@settings(max_examples=300, deadline=None)
@given(urls())
def test_canonicalize_idempotent(u):
    c = canonicalize_url(u)
    if c is not None:
        assert canonicalize_url(c) == c
        assert c.startswith(("http://", "https://"))
        assert "#" not in c


@settings(max_examples=200, deadline=None)
@given(urls(), st.text(alphabet=string.ascii_letters + "/.-", max_size=20))
def test_resolve_never_crashes(base, href):
    out = resolve_and_canonicalize(base, href)
    assert out is None or out.startswith(("http://", "https://"))


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(st.booleans(), st.text(alphabet="/abc", min_size=1, max_size=6)),
        max_size=6,
    ),
    st.text(alphabet="/abc", min_size=1, max_size=10),
)
def test_robots_longest_prefix(rules, path):
    got = robots_allows(rules, path)
    matching = [(len(p), a) for a, p in rules if path.startswith(p)]
    if not matching:
        assert got is True  # permissive default (url_frontier.py:153-158)
    else:
        best_len = max(m[0] for m in matching)
        # ties at equal length: allow (least-restrictive) wins, RFC 9309
        allows = [a for l, a in matching if l == best_len]
        assert got == (True in allows)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.text(min_size=1, max_size=30), min_size=1, max_size=200, unique=True))
def test_bloom_bits_no_false_negative(items):
    """Pure bit-level property of the shard math (operators/bloom.py)."""
    import numpy as np

    from adavnceseo_crawler_spark.operators.bloom import (
        BloomParams,
        _bit_positions,
        _test_and_set,
    )

    p = BloomParams(capacity=10_000, fpr=0.001, buckets=4)
    arr = np.zeros((p.m_bits + 7) // 8, dtype=np.uint8)
    hashes = [hashlib.sha256(i.encode()).hexdigest() for i in items]
    for h in hashes:
        _test_and_set(arr, _bit_positions(h, p.k_hashes, p.m_bits))
    for h in hashes:  # every inserted item must test present
        present = all(
            (arr[pos >> 3] >> (pos & 7)) & 1
            for pos in _bit_positions(h, p.k_hashes, p.m_bits)
        )
        assert present
