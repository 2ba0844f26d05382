"""Pure-Python tests (no Spark): canonicalizer, HTML parse, synth invariants."""

import pytest

from adavnceseo_crawler_spark import synth
from adavnceseo_crawler_spark.functions.htmlparse import extract_text, parse_page
from adavnceseo_crawler_spark.functions.urls import (
    canonicalize_url,
    resolve_and_canonicalize,
)

N_PAGES, N_HOSTS = 300, 12


class TestCanonicalize:
    @pytest.mark.parametrize(
        "raw,expected",
        [
            ("https://Example.COM/a/b", "https://example.com/a/b"),
            ("https://example.com:443/a", "https://example.com/a"),
            ("http://example.com:80/a", "http://example.com/a"),
            ("http://example.com:8080/a", "http://example.com:8080/a"),
            ("https://example.com/a#frag", "https://example.com/a"),
            ("https://example.com/a?b=2&a=1", "https://example.com/a?a=1&b=2"),
            ("https://example.com/%69tem", "https://example.com/item"),
            ("https://example.com/a%2Fb", "https://example.com/a%2Fb"),
            ("https://example.com/a%2fb", "https://example.com/a%2Fb"),
            ("https://example.com/a/./b/../c", "https://example.com/a/c"),
            ("https://example.com", "https://example.com/"),
            ("javascript:void(0)", None),
            ("#anchor", None),
            ("ftp://example.com/x", None),
        ],
    )
    def test_cases(self, raw, expected):
        assert canonicalize_url(raw) == expected

    def test_idempotent_on_synth_urls(self):
        for pid in range(N_PAGES):
            u = synth.url_of(pid, N_HOSTS)
            assert canonicalize_url(u) == u, u  # canonical fixed point
            assert canonicalize_url(canonicalize_url(u)) == canonicalize_url(u)

    def test_messy_forms_resolve_to_canonical(self):
        for pid in range(100):
            base = synth.url_of(pid, N_HOSTS)
            for href, _ in synth.links_of(pid, N_PAGES, N_HOSTS):
                got = resolve_and_canonicalize(base, href)
                assert got in {synth.url_of(t, N_HOSTS) for t in
                               synth.link_targets_of(pid, N_PAGES)}, (href, got)


class TestHtmlParse:
    def test_text_byte_identical(self):
        """The input_hint invariant: extracted text == ground truth, per url."""
        for pid in range(N_PAGES):
            html = synth.html_of(pid, N_PAGES, N_HOSTS).decode()
            expected = synth.text_of(pid, N_PAGES, N_HOSTS)
            assert extract_text(html) == expected, pid

    def test_parsed_page_fields(self):
        pid = 7
        url = synth.url_of(pid, N_HOSTS)
        page = parse_page(url, synth.html_of(pid, N_PAGES, N_HOSTS))
        comps = synth.components_of(pid, N_PAGES, N_HOSTS)
        assert page["title"] == comps["title"]
        assert page["description"] == comps["desc"]
        # links: filtered (no nav/anchor/js/pdf), resolved+raw-absolute forms
        assert all(not l.startswith("javascript:") for l in page["links"])
        assert all(not l.lower().endswith(".pdf") for l in page["links"])
        # nav links are inside a removed subtree -> absent
        assert not any(l.rstrip("/").endswith("example.com") for l in page["links"])
        assert not any(l.endswith("/about") for l in page["links"])
        # canonical resolution round-trip covers the whole target set
        canon = {canonicalize_url(l) for l in page["links"]}
        expected = {
            synth.url_of(t, N_HOSTS)
            for t in synth.link_targets_of(pid, N_PAGES)
        }
        assert canon == expected
        # metadata / headers / images / keywords
        assert page["metadata"]["description"] == comps["desc"]
        assert page["metadata"]["og:type"] == "website"
        assert page["headers"]["h1"] == [comps["h1"]]
        assert page["headers"]["h2"] == [comps["h2"]]
        assert len(page["images"]) == 1
        assert page["images"][0]["url"].endswith(f"/img/{pid}.png")
        assert page["images"][0]["alt"] == comps["alt"]
        kw = set(page["keywords"])
        for k in comps["keywords"]:
            assert k in kw

    def test_title_fallback_and_desc_fallback(self):
        page = parse_page(
            "https://x.com/", "<html><body><h1>H One</h1><p>First para.</p></body></html>"
        )
        assert page["title"] == "H One"
        assert page["description"] == "First para."

    def test_pre_exclusion_channel(self):
        """Reference parse ORDER (html_parser.py:41-58): title/description/
        keywords come from the tree BEFORE the script/style/header/footer/nav
        decompose; text/links/headers come after."""
        html = (
            "<html><body>"
            "<header><h1>Hero Headline</h1></header>"
            "<nav><p>Nav blurb here.</p><a href='/in-nav'>n</a></nav>"
            "<div>Visible body text.</div>"
            "</body></html>"
        )
        page = parse_page("https://x.com/", html)
        # h1 inside <header> feeds the title fallback and keywords
        assert page["title"] == "Hero Headline"
        assert {"hero", "headline"} <= set(page["keywords"])
        # first <p> inside <nav> feeds the description fallback
        assert page["description"] == "Nav blurb here."
        # ...but none of them reach text / links / headers (post-decompose)
        assert page["text"] == "Visible body text."
        assert page["links"] == []
        assert page["headers"]["h1"] == []

    def test_empty_title_tag_blocks_fallback(self):
        # reference: soup.find('title') truthy -> returns "" with no h1 fallback
        page = parse_page(
            "https://x.com/",
            "<html><head><title></title></head><body><h1>H</h1></body></html>",
        )
        assert page["title"] == ""

    def test_empty_meta_description_blocks_fallback(self):
        page = parse_page(
            "https://x.com/",
            '<html><head><meta name="description" content=""></head>'
            "<body><p>Para.</p></body></html>",
        )
        assert page["description"] == ""

    def test_invalid_port_returns_none(self):
        # ADVICE: parts.port raises ValueError for out-of-range/non-numeric
        # ports; must map to the None-for-unparseable contract, not crash
        assert canonicalize_url("http://h.com:123456/x") is None
        assert canonicalize_url("http://h.com:abc/x") is None
        assert resolve_and_canonicalize("https://a.com/", "//h.com:999999/y") is None


class TestSynth:
    def test_urls_unique(self):
        urls = {synth.url_of(p, N_HOSTS) for p in range(N_PAGES)}
        assert len(urls) == N_PAGES

    def test_zipf_skew(self):
        hosts = [synth.host_idx_of(p, N_HOSTS) for p in range(2000)]
        top = max(hosts.count(h) for h in set(hosts))
        assert top > 2000 / N_HOSTS * 2  # hot host clearly over uniform share

    def test_robots_semantics(self):
        rows = {h: r for h, r, _ in synth.robots_rows(N_HOSTS)}
        assert not synth.robots_allows(rows["host0.example.com"], "/tag/x")
        assert synth.robots_allows(rows["host0.example.com"], "/article/x")
        assert synth.robots_allows(rows["host1.example.com"], "/tag/x")
        assert synth.robots_allows(None, "/anything")  # permissive

    def test_seeds_have_messy_and_dupes(self):
        seeds = synth.seed_urls(N_PAGES, N_HOSTS)
        assert any(not s.startswith("https://") for s in seeds)
        assert len(seeds) != len(set(seeds))
