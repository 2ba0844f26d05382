"""WARC source/sink (sources/warc.py): roundtrip, gzip members, skip/truncate."""

import gzip

from pyspark.sql import functions as F

from adavnceseo_crawler_spark.sources.warc import (
    build_record,
    parse_warc_stream,
    read_warc,
    write_warc,
)


def test_roundtrip_pages_to_warc_and_back(spark, tmp_path):
    out = str(tmp_path / "warcs")
    pages = spark.range(25).select(
        F.concat(F.lit("https://h"), (F.col("id") % 5).cast("string"),
                 F.lit(".test/p"), F.col("id").cast("string")).alias("url"),
        F.concat(F.lit("<html>page "), F.col("id").cast("string"),
                 F.lit("</html>")).alias("payload"),
    ).repartition(3)
    nfiles = write_warc(pages, out)
    assert 1 <= nfiles <= 3

    back = read_warc(spark, out)
    rows = {r["url"]: r for r in back.collect()}
    orig = {r["url"]: r["payload"] for r in pages.collect()}
    assert set(rows) == set(orig)
    for url, r in rows.items():
        assert bytes(r["payload"]).decode() == orig[url]
        assert r["http_status"] == 200 and r["mime"] == "text/html"
        assert r["record_id"].startswith("<urn:uuid:")
        assert r["src_file"].endswith(".warc.gz")


def test_multi_member_gzip_and_plain(spark, tmp_path):
    recs = [build_record(f"https://x/{i}", f"body{i}".encode()) for i in range(3)]
    gz = b"".join(gzip.compress(r) for r in recs)  # member per record
    (tmp_path / "a.warc.gz").write_bytes(gz)
    (tmp_path / "b.warc").write_bytes(b"".join(recs))
    (tmp_path / "ignored.txt").write_bytes(b"junk")
    df = read_warc(spark, str(tmp_path))
    got = sorted((r["src_file"].rsplit("/", 1)[-1], r["url"])
                 for r in df.collect())
    assert [u for _, u in got if _ == "a.warc.gz"] == [f"https://x/{i}" for i in range(3)]
    assert [u for _, u in got if _ == "b.warc"] == [f"https://x/{i}" for i in range(3)]


def test_skips_non_response_and_truncated_records():
    info = (b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n\r\n"
            b"robo\r\n\r\n")
    req = (b"WARC/1.0\r\nWARC-Type: request\r\nWARC-Target-URI: https://x/\r\n"
           b"Content-Length: 0\r\n\r\n\r\n\r\n")
    good = build_record("https://x/keep", b"ok body", http_status=404,
                        mime="text/plain")
    truncated = build_record("https://x/cut", b"full payload here")[:-20]
    rows = list(parse_warc_stream(info + req + good + truncated))
    assert len(rows) == 1
    r = rows[0]
    assert r["url"] == "https://x/keep" and r["http_status"] == 404
    assert r["mime"] == "text/plain" and r["payload"] == b"ok body"


def test_binary_payload_and_date_column(spark, tmp_path):
    out = str(tmp_path / "w")
    payload = bytes(range(256))
    df = spark.createDataFrame(
        [("https://h/bin", bytearray(payload), "2021-06-01T12:00:00Z")],
        "url string, payload binary, fetched_at string",
    )
    write_warc(df, out, date_col="fetched_at", compress=False)
    r = read_warc(spark, out).collect()[0]
    assert bytes(r["payload"]) == payload
    assert r["warc_date"] == "2021-06-01T12:00:00Z"
