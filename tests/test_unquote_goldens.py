"""unquote + ISO-week goldens ported from util_test.go:162-195 (the
reference passes the quoted literal; our unquote takes the body)."""

import datetime

from wikidata_qrank_ray.functions.textnorm import (
    iso_week_start,
    parse_iso_week,
    unquote,
)

UNQUOTE_GOLDENS = [
    ("Foo:Bar", "Foo:Bar"),
    (r"a\\a", "a\\a"),
    (r"a\/a", "a/a"),
    (r"a\"a", 'a"a'),
    ("a'a", "a'a"),
    (r"a\ba", "a\ba"),
    (r"a\na", "a\na"),
    (r"a\ra", "a\ra"),
    (r"a\ta", "a\ta"),
    # \uXXXX escape sequences decode to the CJK/Hangul strings
    ("\\uc11c\\uacbd\\uc8fc\\uc5ed", "서경주역"),
    ("\\u897f\\u6176\\u5dde\\u99c5", "西慶州駅"),
    ("\\u897f\\u5e86\\u5dde\\u7ad9", "西庆州站"),
]


def test_unquote_goldens():
    for body, expected in UNQUOTE_GOLDENS:
        assert unquote(body) == expected, body


def test_parse_iso_week():
    assert parse_iso_week("2023-W07") == (2023, 7)


def test_parse_iso_week_invalid():
    import pytest

    for bad in ["2023-07", "2023W07", "23-W07", ""]:
        with pytest.raises(ValueError):
            parse_iso_week(bad)


def test_iso_week_start():
    assert iso_week_start(2023, 7) == datetime.date(2023, 2, 13)  # a Monday
    assert iso_week_start(2023, 7).isoweekday() == 1
