"""Synthetic corpus invariants (FIXTURES.md §1)."""

from anno_spark.core.document import extract_document
from anno_spark.core.textops import extract_text_from_html
from anno_spark.corpus import generate_pages_pandas, is_held_out, page_record


class TestCorpus:
    def test_deterministic(self):
        a = page_record(7)
        b = page_record(7)
        assert a == b

    def test_unique_urls(self):
        urls = [page_record(i)["url"] for i in range(50)]
        assert len(set(urls)) == 50

    def test_text_matches_oracle_extractor(self):
        for i in range(40):
            rec = page_record(i)
            assert rec["text"] == extract_text_from_html(rec["html"].decode("utf-8"))

    def test_pages_yield_entities_and_triples(self):
        n_triples = 0
        n_mentions = 0
        for i in range(60):
            out = extract_document(page_record(i)["text"])
            n_mentions += len(out.mentions)
            n_triples += len(out.triples)
        assert n_mentions > 100
        assert n_triples > 10

    def test_held_out_fraction(self):
        urls = [page_record(i)["url"] for i in range(500)]
        frac = sum(is_held_out(u) for u in urls) / len(urls)
        assert 0.1 < frac < 0.3

    def test_pandas_generation(self):
        df = generate_pages_pandas(range(10))
        assert list(df.columns) == ["url", "warc_ts", "html", "text", "lang"]
        assert len(df) == 10

    def test_cross_doc_variants_present(self):
        # variants of the same identity appear across different docs
        texts = [page_record(i)["text"] for i in range(300)]
        joined = "\n".join(texts)
        assert "Apple Inc." in joined and "Apple" in joined
        assert "Tesla" in joined
