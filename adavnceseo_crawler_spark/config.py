"""Crawl configuration.

Mirrors the knobs of the reference's ``crawler/config/settings.py`` that have
meaning in the iterative-batch model (SURVEY.md §0 "adopted semantics"):

* ``politeness_budget``  — per-host fetches per round.  The reference enforces a
  wall-clock gap ``POLITENESS_DELAY`` between hits on a host
  (url_frontier.py:93-99, settings.py:18); in batch rounds this becomes a
  per-host token budget per round (budget = round_wall_secs / POLITENESS_DELAY).
* ``batch_size``         — global per-round dequeue cap, from the reference's
  ``URL_BATCH_SIZE`` (settings.py:58) / ``get_next_urls(batch_size)``
  (url_frontier.py:76).
* ``bloom_capacity`` / ``bloom_fpr`` — the reference's
  ``BloomFilter(max_elements=10_000_000, error_rate=0.001)`` (url_frontier.py:24).
* ``max_retries``        — settings.py:35.
* ``user_agent``         — settings.py:64-66.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class CrawlConfig:
    # politeness / round sizing
    politeness_budget: int = 5
    batch_size: int = 1000
    max_rounds: int = 5
    # 'priority' = intended zrange dequeue (url_frontier.py:82-88);
    # 'fifo' = live-path LPOP (url_frontier.py:240-252)
    dequeue_mode: str = "priority"

    # URL-seen structure
    use_bloom: bool = False  # False => exact anti-join (the small-scale oracle path)
    # exact-path join strategy: True => scan url_seen and semi-probe it with
    # the broadcast candidate hashes, then broadcast-anti the hits back
    # (url_seen is SCANNED, never shuffled — it grows O(total crawled) while
    # both broadcasts stay bounded by one round's candidate set).  False =>
    # classic shuffle left-anti.  Rounds beyond ~10^7 candidates should use
    # use_bloom instead (sharded, no broadcast at all).
    dedup_probe: bool = True
    bloom_capacity: int = 10_000_000
    bloom_fpr: float = 0.001
    bloom_buckets: int = 64

    # skew handling: salted two-stage per-host top-k (SURVEY.md §4.1)
    salt_buckets: int = 8

    # retry policy (fetcher/crawler.py:124-126, settings.py:35)
    max_retries: int = 3

    # fetch operator: "synthetic" = equi-join vs the catalog's web table
    # (deterministic; tests/bench), "http" = real batched HTTP per partition
    # (operators/httpfetch.py — the cluster path).  http_base_rewrite swaps a
    # URL prefix on the way out/back so fixtures can serve canonical URLs.
    fetch_mode: str = "synthetic"
    http_base_rewrite: tuple[str, str] | None = None
    request_timeout: float = 30.0  # settings.py:19
    http_inflight_retries: int = 3  # in-request retries (settings.py:35)
    http_retry_delay: float = 1.0  # backoff base (crawler.py:124-126)
    # wall-clock sleep between same-host requests inside the http fetch stage
    # (settings.py:18 POLITENESS_DELAY=1.0, crawler.py:82).  The reference
    # default is 1.0s; tests/benches against the loopback fixture set a small
    # value.  Only the "http" fetch path sleeps — the synthetic join models
    # politeness purely through politeness_budget.
    politeness_delay: float = 1.0

    # persist the full ParsedPage table every round (the analytics surface
    # reads it); throughput benches may disable it — pages/crawl_log/frontier
    # state are always committed
    store_parsed: bool = True

    # merge-on-read maintenance interval for the mutable state tables
    # (url_metadata, frontier).  Normal rounds commit O(delta) appends —
    # url_metadata gains this round's upsert rows, the frontier gains
    # adds (new links + retries) plus consumed tombstones — and readers
    # reconcile (catalog.resolve_latest / plans.round.read_frontier).
    # Every ``compact_every`` rounds the round's commit rewrites the
    # compacted base instead (Iceberg's MoR + periodic rewrite_data_files
    # shape).  1 = compact every round (the copy-on-write behavior).
    compact_every: int = 8
    # read-side tombstone anti-join: broadcast the consumed set only while it
    # is genuinely small (≤ this many rows, known from the checkpoint-carried
    # count), else take the shuffle join.  The broadcast build is
    # driver-serial — measured ~10 s flat at 1.5M tombstones REGARDLESS of
    # core count (BENCH/BASELINE.md round-3 decomposition), exactly the kind
    # of fixed cost the scaling criterion punishes — while the shuffle path
    # distributes; and at web scale consumed grows to compact_every ×
    # round-batch and could never be broadcast anyway
    consumed_broadcast_rows: int = 100_000

    # crawler-trap guard (operators/urlmine wired into the scheduler —
    # SURVEY §2 frontier-scheduling extension; reference analog is the
    # hygiene filter html_parser.py:140-155, which has no template-level
    # guard).  A (host, url-template) cell holding more than
    # trap_template_threshold frontier URLs admits at most
    # trap_admit_per_round of them per round; the rest stay in the frontier
    # (politeness-deferral semantics).  None = off (default: byte-identical
    # scheduling to rounds 1-4, sim parity preserved).
    trap_template_threshold: int | None = None
    trap_admit_per_round: int = 5

    # freshness-driven re-crawl (operators/recrawl wired into the round
    # plan — Cho & Garcia-Molina refresh ordering over the crawl_log
    # observation history).  Every recrawl_every rounds, the recrawl_top
    # already-crawled URLs with the highest (change_rate × age, then age)
    # re-enter the frontier; their priority rides the frontier ``score``
    # column and is blended into the scheduling score with weight
    # recrawl_weight (the enrich stage adds score_carried × weight — zero
    # for normal links, whose carried score is NULL).  None = off.
    recrawl_every: int | None = None
    recrawl_top: int = 1000
    recrawl_weight: float = 1.0

    user_agent: str = (
        "Mozilla/5.0 (compatible; CustomCrawler/1.0; +http://example.com/bot)"
    )
