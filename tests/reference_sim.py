"""Pure-Python single-threaded reference simulator — the crawl-semantics oracle.

Implements the adopted deterministic semantics (SURVEY.md §0) with the exact
cited formulas from the reference:

* priority score           prioritizer.py:35-169
* dedup-on-enqueue         url_frontier.py:52-63
* politeness budget        url_frontier.py:93-99 + settings.py:18 (per-round
                           token budget form)
* robots longest-prefix    url_frontier.py:139-163 (permissive on missing)
* link filtering           html_parser.py:27-33,140-155
* text extraction          html_parser.py:120-132 (via synth ground truth,
                           built by construction — independent of any parser)
* quality score            processor.py:217-236
* domain score aggregate   url_frontier.py:198-216 (adopted aggregate form)

It consumes the same deterministic synthetic web as the Spark engine
(adavnceseo_crawler_spark.synth pure functions), runs the whole crawl in
milliseconds at test scale, and exposes per-round scheduled order, fetch sets,
and the final URL-seen set for parity assertions.
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field
from urllib.parse import urlsplit

from adavnceseo_crawler_spark import synth
from adavnceseo_crawler_spark.config import CrawlConfig

PATH_PATTERNS = synth.PATH_PATTERNS  # dict order matters (prioritizer.py:25-33)


# -- scoring (prioritizer.py) -------------------------------------------------
def base_score(path: str, depth: int, domain_score: float | None) -> float:
    score = 1.0 * (domain_score if domain_score is not None else 1.0)
    for pat, w in PATH_PATTERNS:
        if re.search(pat, path):
            score *= w
            break
    if depth > 3:
        score *= 1.0 / math.log2(depth)
    return score


def popularity_score(stats: dict | None) -> float:
    score = 1.0
    if stats:
        if stats["total_count"] > 0:
            score *= 0.5 + stats["success_count"] / stats["total_count"]
        act = stats.get("avg_crawl_time")
        if act is not None and act > 0:
            score *= min(1.0, 1.0 / math.log2(1.0 + act))
    return score


def relevance_score(stats: dict | None) -> float:
    score = 1.0
    if stats and (stats.get("avg_content_length") or 0) > 5000:
        score *= 1.2
    return score


def freshness_score(age_seconds: float | None) -> float:
    """prioritizer.py:98-118 — only non-1.0 for fetch-failed retries here."""
    if age_seconds is None:
        return 1.0
    if age_seconds < 3600:
        return 0.2
    if age_seconds < 86400:
        return 0.4
    if age_seconds < 7 * 86400:
        return 0.6
    if age_seconds < 30 * 86400:
        return 0.8
    return 1.0


def final_score(
    url: str, stats: dict | None, age_seconds: float | None = None
) -> float:
    path = urlsplit(url).path or "/"
    # damping depth = path-segment count (prioritizer.py:92), not crawl depth
    pdepth = len([p for p in path.split("/") if p])
    b = base_score(path, pdepth, stats["domain_score"] if stats else None)
    f = freshness_score(age_seconds)
    r = relevance_score(stats)
    p = popularity_score(stats)
    return b * 0.3 + f * 0.2 + r * 0.3 + p * 0.2


def quality_of(text: str) -> float:
    """processor.py:217-236; the synthetic template always has h1 + meta."""
    q = 1.0
    n = len(text)
    if n > 1000:
        q *= 1.2
    elif n < 100:
        q *= 0.8
    q *= 1.1  # has h1
    q *= 1.1  # description + keywords present
    return min(q, 2.0)


@dataclass
class RoundResult:
    round_no: int
    scheduled: list[str]  # priority order (score desc, url asc)
    fetched: list[str]
    failed: list[str]
    blocked: list[str]
    new_urls: set[str] = field(default_factory=set)


@dataclass
class SimResult:
    rounds: list[RoundResult]
    seen: set[str]
    frontier: dict
    texts: dict  # url -> ground-truth extracted text
    log: list


def simulate(
    n_pages: int,
    n_hosts: int,
    cfg: CrawlConfig,
    max_rounds: int | None = None,
) -> SimResult:
    max_rounds = max_rounds if max_rounds is not None else cfg.max_rounds
    web = {synth.url_of(p, n_hosts): p for p in range(n_pages)}
    robots = {h: r for h, r, _ in synth.robots_rows(n_hosts)}

    # seeding (main.py:84-108): normalize scheme, canonicalize, dedup
    from adavnceseo_crawler_spark.functions.urls import canonicalize_url

    frontier: dict[str, dict] = {}
    seen: set[str] = set()
    for s in synth.seed_urls(n_pages, n_hosts):
        if not re.match(r"^https?://", s):
            s = "https://" + s
        c = canonicalize_url(s)
        if c and c not in seen:
            seen.add(c)
            frontier[c] = {"depth": 0, "retries": 0}

    log: list[dict] = []
    texts: dict[str, str] = {}
    rounds: list[RoundResult] = []
    last_crawled: dict[str, int] = {}  # url -> round of last fetch attempt

    for r in range(max_rounds):
        if not frontier:
            break
        # domain stats from successes so far (adopted A9 aggregate)
        host_rows: dict[str, list[dict]] = {}
        for e in log:
            if e["success"]:
                host_rows.setdefault(e["host"], []).append(e)
        host_totals: dict[str, dict] = {}
        for e in log:
            if e.get("error") == "robots_disallowed":
                continue
            t = host_totals.setdefault(
                e["host"], {"success_count": 0, "total_count": 0}
            )
            t["total_count"] += 1
            t["success_count"] += 1 if e["success"] else 0
        stats: dict[str, dict] = {}
        for h, t in host_totals.items():
            rows = host_rows.get(h, [])
            act = sum(x["crawl_time"] for x in rows) / len(rows) if rows else None
            acl = (
                sum(x["content_length"] for x in rows) / len(rows) if rows else None
            )
            aq = sum(x["quality_score"] for x in rows) / len(rows) if rows else None
            ds = 1.0
            if aq is not None:
                ds *= 1.0 + aq
            if act is not None and act > 0:
                ds *= min(1.0, 1.0 / act)
            if acl is not None and acl > 5000:
                ds *= 1.2
            stats[h] = {
                **t,
                "avg_crawl_time": act,
                "avg_content_length": acl,
                "domain_score": min(ds, 2.0),
            }

        # score + robots
        scored, blocked = [], []
        for url, st in frontier.items():
            host = urlsplit(url).hostname
            path = urlsplit(url).path or "/"
            if not synth.robots_allows(robots.get(host), path):
                blocked.append(url)
                log.append(
                    {
                        "round": r, "url": url, "host": host, "success": False,
                        "error": "robots_disallowed", "crawl_time": None,
                        "content_length": None, "quality_score": None,
                    }
                )
                continue
            age = (
                (r - last_crawled[url]) * 3600.0 if url in last_crawled else None
            )
            sc = final_score(url, stats.get(host), age)
            scored.append((url, host, sc, st))
        for url in blocked:
            del frontier[url]

        # politeness per-host top-k then global top-batch (F4/W1)
        by_host: dict[str, list] = {}
        for item in scored:
            by_host.setdefault(item[1], []).append(item)
        survivors = []
        for h, items in by_host.items():
            items.sort(key=lambda x: (-x[2], x[0]))
            survivors.extend(items[: cfg.politeness_budget])
        survivors.sort(key=lambda x: (-x[2], x[0]))
        scheduled = survivors[: cfg.batch_size]

        fetched, failed_urls = [], []
        discovered: dict[str, int] = {}
        for url, host, sc, st in scheduled:
            last_crawled[url] = r
            if url in web:
                pid = web[url]
                text = synth.text_of(pid, n_pages, n_hosts)
                texts[url] = text
                fetched.append(url)
                log.append(
                    {
                        "round": r, "url": url, "host": host, "success": True,
                        "error": None,
                        "crawl_time": synth.crawl_time_of(url),
                        "content_length": len(text),
                        "quality_score": quality_of(text),
                    }
                )
                for t in synth.link_targets_of(pid, n_pages):
                    lu = synth.url_of(t, n_hosts)
                    d = st["depth"] + 1
                    if lu not in discovered or d < discovered[lu]:
                        discovered[lu] = d
                del frontier[url]
            else:
                failed_urls.append(url)
                log.append(
                    {
                        "round": r, "url": url, "host": host, "success": False,
                        "error": "fetch_failed", "crawl_time": None,
                        "content_length": None, "quality_score": None,
                    }
                )
                st["retries"] += 1
                if st["retries"] > cfg.max_retries:
                    del frontier[url]

        new_urls = set()
        for lu, d in discovered.items():
            if lu not in seen:
                seen.add(lu)
                frontier[lu] = {"depth": d, "retries": 0}
                new_urls.add(lu)

        rounds.append(
            RoundResult(
                r, [x[0] for x in scheduled], fetched, failed_urls, blocked, new_urls
            )
        )

    return SimResult(rounds, seen, frontier, texts, log)
