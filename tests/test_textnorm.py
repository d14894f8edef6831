"""Normalizer goldens -- ported 1:1 in spirit from the reference's
util_test.go:67-183 (casefold/NFC/ctrl/lang-remap/unquote edge cases)."""

from wikidata_qrank_ray.functions import (
    normalize_text,
    normalize_text_sql_parity,
    remap_lang,
    unquote,
)


def test_casefold():
    assert normalize_text("Straße") == "strasse"  # casefold, not lower
    assert normalize_text("HELLO World") == "hello world"


def test_nfc():
    # e + combining acute -> precomposed e-acute
    assert normalize_text("Café") == "café"


def test_control_chars():
    assert normalize_text("a\x00b\x1fc\x7fd") == "a_b_c_d"
    assert normalize_text("x\x85y") == "x_y"  # U+0085 NEL (issue #3 regression class)


def test_turkic_lowercase():
    assert normalize_text("DIŞ", lang="tr") == "dış"
    assert normalize_text("İstanbul", lang="tr") == "istanbul"
    # non-turkic: plain casefold
    assert normalize_text("DIS", lang="en") == "dis"


def test_sql_parity_variant():
    # lower (not casefold): ß survives
    assert normalize_text_sql_parity("Straße") == "straße"
    assert normalize_text_sql_parity("Café") == "café"


def test_remap_lang():
    assert remap_lang("als") == "gsw"
    assert remap_lang("zh-min-nan") == "nan"
    assert remap_lang("simple") == "en-x-simple"
    assert remap_lang("no") == "nb"
    assert remap_lang("bat-smg") == "sgs"
    assert remap_lang("be-x-old") == "be-tarask"
    assert remap_lang("fr") == "fr"  # identity for unmapped


def test_unquote_basic():
    assert unquote("hello\\nworld") == "hello\nworld"
    assert unquote('say \\"hi\\"') == 'say "hi"'
    assert unquote("a\\tb") == "a\tb"


def test_unquote_surrogate_pair():
    # U+1F600 as a surrogate pair
    assert unquote("\\ud83d\\ude00") == "\U0001f600"


def test_unquote_lone_surrogate_coerced():
    out = unquote("\\ud800x")
    assert "\ud800" not in out
    assert out.endswith("x")


def test_unquote_malformed():
    out = unquote("bad\\q")
    assert "bad" in out  # never raises


def test_url_query_unescape_goldens():
    """Go url.QueryUnescape semantics (pageviews.go:280-290): +

    -> space, %XX decode, malformed escape -> raw fallback, invalid UTF-8
    after decode -> None (row dropped)."""
    from wikidata_qrank_ray.functions.textnorm import url_query_unescape

    assert url_query_unescape("Fu%C3%9Fball") == "Fußball"
    assert url_query_unescape("caf%C3%A9") == "café"
    assert url_query_unescape("a+b") == "a b"
    assert url_query_unescape("plain_title") == "plain_title"
    assert url_query_unescape("%41%42c") == "ABc"
    # malformed escapes fall back to the raw string
    assert url_query_unescape("100%") == "100%"
    assert url_query_unescape("%zz") == "%zz"
    assert url_query_unescape("%4") == "%4"
    # lone continuation byte decodes to invalid UTF-8 -> None
    assert url_query_unescape("%C3") is None


def test_format_line_does_not_remap_extension_codes():
    """'no' / 'bh' / 'nah' are NOT formatLine cases -- format_line must
    emit them verbatim (byte-parity with the reference), while remap_lang
    still canonicalizes them as a documented extension."""
    from wikidata_qrank_ray.functions.textnorm import format_line, remap_lang

    assert format_line("no", "wikipedia", "Oslo", "7") == "no.wikipedia/oslo 7"
    assert format_line("bh", "wikipedia", "X", "1") == "bh.wikipedia/x 1"
    assert remap_lang("no") == "nb"
    assert remap_lang("bh") == "bho"
    assert remap_lang("als") == "gsw"
