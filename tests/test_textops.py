"""T1/T2/T3 parity tests (reference: anno/src/ingest/url_resolver.rs:45-170,
preprocessor.rs:60-129, lang.rs:54-120) + hypothesis property tests."""

from hypothesis import given, settings
from hypothesis import strategies as st

from anno_spark.core.textops import detect_language, extract_text_from_html, preprocess


class TestHtmlExtractor:
    def test_strips_tags(self):
        assert extract_text_from_html("<p>Hello</p>") == "Hello"

    def test_script_body_skipped(self):
        assert extract_text_from_html("<script>var a = 1;</script>after") == "after"

    def test_style_body_skipped(self):
        assert extract_text_from_html("<style>p{color:red}</style>after") == "after"

    def test_script_with_attrs(self):
        # tag name stops at whitespace → "script" matches exactly
        assert extract_text_from_html('<script type="text/js">x</script>ok') == "ok"

    def test_block_tag_inserts_space(self):
        assert extract_text_from_html("a<p>b") == "a b"
        assert extract_text_from_html("a<div>b") == "a b"
        assert extract_text_from_html("a<br>b") == "a b"
        assert extract_text_from_html("a<h1>b") == "a b"

    def test_closing_block_tag_no_space(self):
        # url_resolver.rs:90-97 — "/p" is not in the block list
        assert extract_text_from_html("a</p>b") == "ab"

    def test_no_space_when_empty_or_space_terminated(self):
        assert extract_text_from_html("<p>b") == "b"
        assert extract_text_from_html("a <p>b") == "a b"

    def test_inline_tag_no_space(self):
        assert extract_text_from_html("a<span>b</span>c") == "abc"

    def test_named_entities(self):
        assert extract_text_from_html("&amp;&lt;&gt;&quot;&apos;&#39;") == "&<>\"''"
        assert extract_text_from_html("a&nbsp;b") == "a\xa0b".replace("\xa0", " ")

    def test_smart_quote_entities(self):
        assert extract_text_from_html("&#8220;x&#8221;&#8217;") == "“x”’"

    def test_decimal_numeric_entity(self):
        assert extract_text_from_html("&#65;&#97;") == "Aa"

    def test_hex_entity_kept_verbatim(self):
        # url_resolver.rs:136-144 — no hex support
        assert extract_text_from_html("&#x41;") == "&#x41;"

    def test_unknown_entity_kept_verbatim(self):
        assert extract_text_from_html("&unknown;") == "&unknown;"

    def test_unterminated_entity_consumes_terminator(self):
        # url_resolver.rs:111-120,151-155 — '<' consumed into the entity
        # buffer and echoed, so the following "b>" is plain text, not a tag.
        assert extract_text_from_html("a&foo<b>c") == "a&foo<b>c"

    def test_unterminated_entity_whitespace(self):
        assert extract_text_from_html("&foo bar") == "&foo bar"

    def test_entity_invalid_codepoint(self):
        assert extract_text_from_html("&#55296;") == "&#55296;"  # surrogate
        assert extract_text_from_html("&#99999999999;") == "&#99999999999;"

    def test_whitespace_cleanup(self):
        assert extract_text_from_html("  line1  \n\n  line2  \n") == "line1\nline2"

    def test_crlf(self):
        assert extract_text_from_html("a\r\nb") == "a\nb"

    def test_full_page(self):
        html = (
            "<html><head><title>T</title><style>p{}</style>"
            "<script>var a = 1;</script></head><body><h1>H</h1><p>body text</p></body></html>"
        )
        assert extract_text_from_html(html) == "T H body text"

    def test_lt_inside_script_swallows_closing_tag(self):
        # Quirk: '<' inside a script body consumes through the next '>' —
        # including the closing </script> — so the rest stays in-script
        # (url_resolver.rs:60-85).
        html = "<title>T</title><script>1<2</script><p>never seen</p>"
        assert extract_text_from_html(html) == "T"

    def test_empty(self):
        assert extract_text_from_html("") == ""

    def test_gt_outside_tag_kept(self):
        assert extract_text_from_html("a > b") == "a > b"

    @given(st.text(max_size=300))
    @settings(max_examples=200, deadline=None)
    def test_never_raises(self, html):
        extract_text_from_html(html)

    @given(st.text(alphabet=st.characters(blacklist_characters="<>&"), max_size=200))
    @settings(max_examples=100, deadline=None)
    def test_idempotent_on_plain_text(self, text):
        once = extract_text_from_html(text)
        assert extract_text_from_html(once) == once


class TestPreprocess:
    def test_zero_width_removed(self):
        assert preprocess("a​b") == "ab"

    def test_crlf_to_lf(self):
        assert preprocess("a\r\nb") == "a\nb"

    def test_collapse_spaces(self):
        assert preprocess("a   b") == "a b"

    def test_paragraph_break_preserved(self):
        assert preprocess("a\n\n\nb") == "a\n\nb"


class TestDetectLanguage:
    def test_english(self):
        assert detect_language("Hello world, this is a test.") == "en"

    def test_german_diacritics(self):
        assert detect_language("straße über München") == "de"

    def test_french(self):
        assert detect_language("être à côté de l'école") == "fr"

    def test_spanish(self):
        assert detect_language("mañana señor") == "es"

    def test_russian(self):
        assert detect_language("Привет мир") == "ru"

    def test_chinese(self):
        assert detect_language("中国北京上海") == "zh"

    def test_japanese_kana_wins_over_han(self):
        # lang.rs:111-114 — Han + kana → Japanese
        assert detect_language("これは日本語です") == "ja"

    def test_korean(self):
        assert detect_language("안녕하세요") == "ko"

    def test_empty_defaults_english(self):
        assert detect_language("") == "en"
        assert detect_language("12345 !!!") == "en"
