"""WARC source tests: valid WARC/1.0 synthesis, raw + per-record-gzip
parsing, non-response record skipping, and the Spark path producing the
pages schema with byte-identical text extraction downstream."""

from __future__ import annotations

import datetime as dt

from anno_spark.sources.warc import (
    _parse_warc_bytes,
    make_warc,
    make_warc_record,
    pages_from_warc,
)

HTML_A = b"<html><title>T</title><body><p>Hello WARC world.</p></body></html>"
HTML_B = b"<html><body><p>Second page.</p></body></html>"
RECS = [
    ("https://a.test/1", "2024-03-01T10:00:00Z", HTML_A),
    ("https://b.test/2", "2024-03-02T11:30:00Z", HTML_B),
]


class TestWarcParse:
    def test_raw_and_gzipped_agree(self):
        raw = list(_parse_warc_bytes(make_warc(RECS, gzip_members=False)))
        gz = list(_parse_warc_bytes(make_warc(RECS, gzip_members=True)))
        assert raw == gz
        assert [u for u, _, _ in raw] == [u for u, _, _ in RECS]
        assert raw[0][2] == HTML_A and raw[1][2] == HTML_B
        assert raw[0][1] == dt.datetime(2024, 3, 1, 10, 0, 0)

    def test_non_response_records_skipped(self):
        rec = make_warc_record("https://a.test/1", "2024-03-01T10:00:00Z", HTML_A)
        info = rec.replace(b"WARC-Type: response", b"WARC-Type: warcinfo")
        out = list(_parse_warc_bytes(info + rec))
        assert len(out) == 1 and out[0][0] == "https://a.test/1"

    def test_truncated_tail_is_ignored(self):
        blob = make_warc(RECS, gzip_members=False) + b"WARC/1.0\r\ngarbage"
        assert len(list(_parse_warc_bytes(blob))) == 2


class TestWarcSpark:
    def test_pages_from_warc_end_to_end(self, spark, tmp_path):
        from anno_spark.core.textops import extract_text_from_html

        d = tmp_path / "warcs"
        d.mkdir()
        (d / "part1.warc.gz").write_bytes(make_warc(RECS[:1]))
        (d / "part2.warc").write_bytes(make_warc(RECS[1:], gzip_members=False))

        pages = pages_from_warc(spark, str(d))
        rows = {r["url"]: r for r in pages.collect()}
        assert set(rows) == {u for u, _, _ in RECS}
        a = rows["https://a.test/1"]
        # byte-identical extraction contract holds through the source
        assert a["text"] == extract_text_from_html(HTML_A.decode())
        assert bytes(a["html"]) == HTML_A
        assert a["warc_ts"] == dt.datetime(2024, 3, 1, 10, 0, 0)
        assert a["lang"] == "en"

    def test_feeds_the_extraction_pipeline(self, spark, tmp_path):
        from anno_spark.operators import extract as ex

        d = tmp_path / "warcs2"
        d.mkdir()
        html = (
            b"<html><body><p>Tim Cook works for Apple Inc in California."
            b"</p></body></html>"
        )
        (d / "one.warc.gz").write_bytes(
            make_warc([("https://c.test/3", "2024-01-01T00:00:00Z", html)])
        )
        triples = ex.triples_table(
            ex.extract_documents(pages_from_warc(spark, str(d)))
        ).collect()
        assert any(
            t["subj_text"] == "Tim Cook" and t["pred"] == "WORKS_FOR"
            for t in triples
        )
