"""T2 preprocessing flags through extract_documents (VERDICT r02 next
#8): clean/normalize opt-ins matching extract.rs:118-133 →
preprocessor.rs:60-129, with parity tests for both paths and a
golden-path-unchanged gate."""

from __future__ import annotations

from anno_spark.core.textops import clean_whitespace, normalize_unicode_basic, prepare


class TestPrepareCore:
    def test_normalize_strips_zero_width_only(self):
        s = "a​b‌c‍d﻿e  f"
        assert normalize_unicode_basic(s) == "abcde  f"  # whitespace untouched

    def test_clean_collapses_runs_reference_loop(self):
        # preprocessor.rs:94-113 exact semantics:
        assert clean_whitespace("a   b") == "a b"
        assert clean_whitespace("a \n\n b") == "a \nb"   # run starts with ' '
        assert clean_whitespace("a\n\nb") == "a\nb"      # double newline → one
        assert clean_whitespace("a\n \nb") == "a\nb"
        assert clean_whitespace("a\r\nb\rc") == "a\nb\nc"
        assert clean_whitespace("  padded  ") == "padded"
        assert clean_whitespace("a\t\nb") == "a \nb"     # ' ' then late '\n'

    def test_prepare_flag_order(self):
        # normalize runs before clean (prepare(), preprocessor.rs:67-119)
        s = "x​   y"
        assert prepare(s, normalize=True) == "x   y"
        assert prepare(s, clean=True) == "x​ y"
        assert prepare(s, clean=True, normalize=True) == "x y"
        assert prepare(s) == s  # both off → identity


class TestSparkFlags:
    _TEXTS = [
        "Angela Merkel  visited\r\nBerlin​ today.",
        "Contact  bob@example.com\n\n\non 2024-01-05.",
        "plain text with no noise",
        "",
    ]

    def _pages(self, spark):
        return spark.createDataFrame(
            [(f"u{i}", t) for i, t in enumerate(self._TEXTS)],
            "url string, text string",
        )

    def _mention_tuples(self, ext):
        from anno_spark.operators.extract import mentions_table

        rows = mentions_table(ext).collect()
        out: dict = {}
        for r in rows:
            out.setdefault(r["url"], []).append(
                (r["text"], r["entity_type"], r["start"], r["end"])
            )
        return out

    def test_flagged_extraction_matches_local_prepare(self, spark):
        from anno_spark.core.document import extract_document
        from anno_spark.operators.extract import extract_documents

        for clean, normalize in ((True, False), (False, True), (True, True)):
            got = self._mention_tuples(
                extract_documents(self._pages(spark), clean=clean, normalize=normalize)
            )
            for i, t in enumerate(self._TEXTS):
                expect = [
                    (m.text, m.entity_type, m.start, m.end)
                    for m in extract_document(prepare(t, clean=clean, normalize=normalize)).mentions
                ]
                assert got.get(f"u{i}", []) == expect, (clean, normalize, i)

    def test_golden_path_unchanged(self, spark):
        """Default flags extract the RAW text byte-identically — offsets
        differ from the cleaned path wherever noise was removed."""
        from anno_spark.core.document import extract_document
        from anno_spark.operators.extract import extract_documents

        got = self._mention_tuples(extract_documents(self._pages(spark)))
        for i, t in enumerate(self._TEXTS):
            expect = [
                (m.text, m.entity_type, m.start, m.end)
                for m in extract_document(t).mentions
            ]
            assert got.get(f"u{i}", []) == expect, i
        # sanity: the flags actually change something on the noisy docs
        cleaned = self._mention_tuples(
            extract_documents(self._pages(spark), clean=True, normalize=True)
        )
        assert cleaned != got
