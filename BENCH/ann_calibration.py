"""ANN recall-vs-cost calibration (VERDICT r2 #3).

Sweeps the multi-table sign-LSH configuration (n_tables × n_bits) and the
IVF-flat probe count on the planted-near-neighbor fixture
(synth.gen_planted_vectors: every query has a known cluster of ~0.95-cosine
true neighbors — the operating regime ANN dedup/search actually targets;
the random near-orthogonal embeddings table remains the documented worst
case, tests/test_similarity_ops.py).

The sweep replays the ENGINE'S OWN deterministic algorithm in numpy — the
md5-derived Rademacher hyperplanes and sign bucketing are identical
functions of (table, bit, dim); the Spark operator is separately asserted
to reach ≥0.9 recall at the published HIGH_RECALL preset
(tests/test_similarity_ops.py::test_lsh_high_recall_preset_on_planted).

Outputs BENCH/ann_recall.json + a markdown table on stdout.
Reproduce: python BENCH/ann_calibration.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from adavnceseo_crawler_spark.operators.similarity import (  # noqa: E402
    rademacher_planes,
)
from adavnceseo_crawler_spark.synth import gen_planted_vectors  # noqa: E402

K = 3


def lsh_buckets(X: np.ndarray, planes) -> np.ndarray:
    """(n, L) packed sign buckets — same math as make_multi_bucket_udf."""
    mats = np.asarray(planes, dtype=np.float64)  # (L, b, dim)
    L, b, dim = mats.shape
    flat = mats.reshape(L * b, dim)
    prods = X[:, None, :].astype(np.float64) * flat[None, :, :]
    dots = np.cumsum(prods, axis=2)[:, :, -1]
    signs = (dots > 0).reshape(X.shape[0], L, b)
    weights = (1 << np.arange(b)).astype(np.int64)
    return signs @ weights


def brute_topk(index_vecs, query_vecs, k):
    a = index_vecs.astype(np.float64)
    q = query_vecs.astype(np.float64)
    cos = (q @ a.T) / (
        np.linalg.norm(q, axis=1)[:, None] * np.linalg.norm(a, axis=1)[None, :]
    )
    return np.argsort(-cos, axis=1, kind="stable")[:, :k], cos


def sweep_lsh(index_vecs, query_vecs, truth, dim):
    rows = []
    n_index = index_vecs.shape[0]
    for n_tables in (2, 4, 8, 16):
        for n_bits in (4, 6, 8, 10):
            planes = rademacher_planes(n_tables, n_bits, dim)
            bi = lsh_buckets(index_vecs, planes)  # (n, L)
            bq = lsh_buckets(query_vecs, planes)  # (m, L)
            hits = 0
            cand_total = 0
            for qi in range(query_vecs.shape[0]):
                cand = np.where((bi == bq[qi][None, :]).any(axis=1))[0]
                cand_total += cand.size
                hits += np.isin(truth[qi], cand).sum()
            rows.append(
                {
                    "n_tables": n_tables,
                    "n_bits": n_bits,
                    "recall": round(hits / truth.size, 3),
                    "mean_candidates": round(cand_total / query_vecs.shape[0], 1),
                    "candidate_frac": round(
                        cand_total / query_vecs.shape[0] / n_index, 3
                    ),
                }
            )
    return rows


def sweep_ivf(index_vecs, query_vecs, truth, n_cells=24):
    """Data-sampled coarse quantizer (the engine's q49 shape: centroids =
    first n_cells index vectors), n_probe sweep, recall@K after exact
    rerank of probed cells only."""
    cents = index_vecs[:n_cells].astype(np.float64)
    a = index_vecs.astype(np.float64)
    d2 = ((a[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    cells = np.argmin(d2, axis=1)  # (n,)
    qd2 = ((query_vecs.astype(np.float64)[:, None, :] - cents[None, :, :]) ** 2).sum(
        axis=2
    )
    probe_order = np.argsort(qd2, axis=1, kind="stable")  # (m, n_cells)
    rows = []
    for n_probe in (1, 2, 4, 8, 16, n_cells):
        hits = 0
        cand_total = 0
        for qi in range(query_vecs.shape[0]):
            probed = set(probe_order[qi, :n_probe].tolist())
            cand = np.where(np.isin(cells, list(probed)))[0]
            cand_total += cand.size
            hits += np.isin(truth[qi], cand).sum()
        rows.append(
            {
                "n_probe": n_probe,
                "recall_upper": round(hits / truth.size, 3),
                "mean_candidates": round(cand_total / query_vecs.shape[0], 1),
            }
        )
    return rows


def main() -> None:
    ids, index_vecs, qids, query_vecs = gen_planted_vectors()
    dim = index_vecs.shape[1]
    truth, cos = brute_topk(index_vecs, query_vecs, K)
    planted_cos = float(np.median(np.sort(cos, axis=1)[:, -K:]))
    lsh = sweep_lsh(index_vecs, query_vecs, truth, dim)
    ivf = sweep_ivf(index_vecs, query_vecs, truth)
    out = {
        "fixture": {
            "n_index": len(ids), "n_queries": len(qids), "dim": dim, "k": K,
            "median_true_neighbor_cos": round(planted_cos, 3),
        },
        "lsh_sweep": lsh,
        "ivf_sweep": ivf,
    }
    with open(os.path.join(REPO, "BENCH", "ann_recall.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("| tables | bits | recall@3 | mean cand | cand frac |")
    print("|---|---|---|---|---|")
    for r in lsh:
        print(
            f"| {r['n_tables']} | {r['n_bits']} | {r['recall']} "
            f"| {r['mean_candidates']} | {r['candidate_frac']} |"
        )
    print()
    print("| n_probe | recall@3 (upper) | mean cand |")
    print("|---|---|---|")
    for r in ivf:
        print(f"| {r['n_probe']} | {r['recall_upper']} | {r['mean_candidates']} |")


if __name__ == "__main__":
    main()
