"""Host-graph PageRank (operators/graph.py) vs a pure-Python reference
power iteration.  DuckDB oracle parity for q65 runs in
test_queries_oracle.py."""


def _py_pagerank(edges, iters=3, d=0.85):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    n = len(nodes)
    deg = {}
    for u, _ in edges:
        deg[u] = deg.get(u, 0) + 1
    r = {h: 1.0 / n for h in nodes}
    for _ in range(iters):
        contrib = {h: 0.0 for h in nodes}
        for u, v in edges:
            contrib[v] += r[u] / deg[u]
        r = {h: (1.0 - d) / n + d * contrib[h] for h in nodes}
    return {h: round(x, 6) for h, x in r.items()}


def test_pagerank_matches_python_reference(spark):
    from adavnceseo_crawler_spark.operators.graph import host_pagerank

    edges = [("a", "b"), ("b", "a"), ("a", "c"), ("c", "c"), ("d", "a")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["host"]: r["rank"] for r in host_pagerank(df, iters=3).collect()}
    assert got == _py_pagerank(edges, iters=3)
    # sink-heavy self-loop node accumulates, dangling-source d stays at base
    assert got["c"] > got["d"]


def test_pagerank_duplicate_edges_collapse(spark):
    """Input edges are DISTINCT-ed: repeating a link must not change ranks."""
    from adavnceseo_crawler_spark.operators.graph import host_pagerank

    base = [("a", "b"), ("b", "a")]
    df1 = spark.createDataFrame(base, "src string, dst string")
    df2 = spark.createDataFrame(base * 3, "src string, dst string")
    r1 = {r["host"]: r["rank"] for r in host_pagerank(df1, iters=2).collect()}
    r2 = {r["host"]: r["rank"] for r in host_pagerank(df2, iters=2).collect()}
    assert r1 == r2
