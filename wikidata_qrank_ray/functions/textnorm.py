"""Text normalization -- the `formatLine` / `unquote` analogue.

Reference semantics reimplemented from scratch (not ported):
- canonical key normalization: Unicode case-fold + NFC + control chars -> "_"
  (reference: cmd/qrank-builder/util.go:115-117,232-250).
- language-code remap table incl. als->gsw, simple->en-x-simple, locale-aware
  Turkish/Azeri lowercasing (reference: cmd/qrank-builder/util.go:119-230,
  golden-tested at util_test.go:67-161).
- JSON string unquoting with surrogate-pair handling (reference:
  cmd/qrank-builder/util.go:253-405).

All functions here are pure and vectorization-friendly; the Dataset stage
wrapping them lives in stages/normalize.py.
"""

from __future__ import annotations

import json
import re
import unicodedata

# Language-code remap matching the reference's formatLine switch
# (util.go:119-230, golden-tested at util_test.go:67-161). Keys accept both
# dash and underscore spellings (normalized before lookup). This table
# contains ONLY the reference's cases -- format_line uses it verbatim so
# its output stays byte-compatible with the reference's line format.
_LANG_REMAP = {
    "als": "gsw",
    "bat-smg": "sgs",
    "be-x-old": "be-tarask",
    "cbk-zam": "cbk-x-zam",
    "fiu-vro": "vro",
    "map-bms": "jv-x-bms",  # Banyumasan dialect of Javanese
    "nds-nl": "nds-NL",
    "roa-rup": "rup",
    "roa-tara": "nap-x-tara",  # Tarantino dialect of Neapolitan
    "simple": "en-x-simple",
    "zh-classical": "lzh",
    "zh-min-nan": "nan",
    "zh-yue": "yue",
}

# Extensions BEYOND the reference's formatLine (general wiki-code
# canonicalization); applied only by remap_lang, never by format_line --
# 'no' is a major wiki code and remapping it inside format_line would give
# every Norwegian-Wikipedia line a different sort key than the reference.
_EXTENDED_REMAP = {
    "bh": "bho",
    "no": "nb",
    "nah": "nci",
}

# wiki "languages" that are really projects: lang -> (und, canonical site)
_UND_SITES = {
    "commons": "commons",
    "media": "mediawiki",
    "meta": "metawiki",
    "sources": "wikisource",
    "species": "wikispecies",
}

# Locale-special lowercasing: Turkish / Azeri dotted-I rules
# (reference util.go:131-132, 211-212).
_TURKIC_LANGS = {"tr", "az"}

_CTRL_RE = re.compile(r"[\x00-\x1f\x7f-\x9f]")


def remap_lang(code: str) -> str:
    """Canonicalize a wiki language code: the reference's formatLine cases
    (util.go:119-230) plus documented extensions (_EXTENDED_REMAP)."""
    code = code.strip().lower()
    return _LANG_REMAP.get(code, _EXTENDED_REMAP.get(code, code))


def _turkic_lower(s: str) -> str:
    # Turkish/Azeri: I -> dotless i, dotted capital I -> i.
    return s.replace("İ", "i").replace("I", "ı").replace("İ", "i").lower()


def normalize_text(s: str, lang: str | None = None) -> str:
    """Canonical text normalization (util.go:115-117,232-250 semantics):
    case-fold (locale-aware for tr/az), NFC normalize, control chars -> "_".
    """
    if lang is not None and remap_lang(lang).split("-")[0] in _TURKIC_LANGS:
        s = _turkic_lower(s)
    else:
        s = s.casefold()
    s = unicodedata.normalize("NFC", s)
    return _CTRL_RE.sub("_", s)


def normalize_text_sql_parity(s: str) -> str:
    """Simple-lowercase + NFC variant with exact DuckDB parity:
    ``nfc_normalize(lower(s))``. Used by oracle-checked queries; the full
    case-fold variant above is golden-tested instead (casefold has no exact
    ANSI-SQL equivalent, e.g. casefold('ß') == 'ss' but lower('ß') == 'ß').
    """
    return unicodedata.normalize("NFC", s.lower())


def format_line(lang: str, site: str, title: str, value: str) -> str:
    """Canonical sort-key line builder -- the full `formatLine` analogue
    (util.go:119-251), reproducing every golden case of
    util_test.go:67-161: ``<lang>.<site>/<normalized title> <value>``.

    Rules: project pseudo-languages map to und.<canonical site>; empty lang
    is und with wikidatawiki/wikimaniawiki site shortening; incubator
    Wp/<code>/<title> paths split out their real language; tr/az titles
    take locale-special lowercasing before the case-fold; titles are
    case-folded, NFC-normalized, and every char <= U+0020 becomes '_'.
    """
    key = lang.replace("_", "-")
    if lang == "":
        lang = "und"
        site = {"wikidatawiki": "wikidata", "wikimaniawiki": "wikimania"}.get(site, site)
    elif key in _UND_SITES:
        lang, site = "und", _UND_SITES[key]
    elif lang == "incubator":
        parts = title.split("/", 2)
        if len(parts) == 3 and parts[0] in ("Wp", "wp") and len(parts[1]) < 20:
            lang = parts[1].lower()
            title = parts[2]
    elif lang in _TURKIC_LANGS:
        title = _turkic_lower(title)
    elif key in _LANG_REMAP:
        lang = _LANG_REMAP[key]

    folded = unicodedata.normalize("NFC", title.casefold())
    norm_title = "".join("_" if c <= "\x20" else c for c in folded)
    return f"{lang}.{site}/{norm_title} {value}"


_HEX = set("0123456789abcdefABCDEF")


def url_query_unescape(s: str) -> str | None:
    """URL query unescape with the reference's exact semantics
    (pageviews.go:280-290 + Go url.QueryUnescape): '+' -> space, %XX hex
    decode over bytes; ANY malformed escape -> return the input unchanged
    (the reference's fall-back-to-raw); a decode that yields invalid UTF-8
    -> None (the reference drops such rows via utf8.ValidString)."""
    if "%" not in s and "+" not in s:
        return s
    out = bytearray()
    b = s.encode("utf-8")
    i, n = 0, len(b)
    while i < n:
        c = b[i]
        if c == 0x25:  # '%'
            if i + 2 >= n or chr(b[i + 1]) not in _HEX or chr(b[i + 2]) not in _HEX:
                return s  # malformed escape: fall back to the raw string
            out.append(int(b[i + 1:i + 3].decode("ascii"), 16))
            i += 3
        elif c == 0x2B:  # '+'
            out.append(0x20)
            i += 1
        else:
            out.append(c)
            i += 1
    try:
        return out.decode("utf-8")
    except UnicodeDecodeError:
        return None


_SURROGATE_RE = re.compile(r"[\ud800-\udfff]")


def unquote(s: str) -> str:
    """Decode a JSON string body (without surrounding quotes), tolerating
    malformed escapes and lone surrogates by coercing to U+FFFD
    (util.go:253-405 semantics: never fail, coerce malformed input).
    """
    try:
        out = json.loads('"' + s + '"')
    except (json.JSONDecodeError, ValueError):
        # Fall back: unescape what we can, replace broken escapes.
        out = ""
        i, n = 0, len(s)
        while i < n:
            c = s[i]
            if c != "\\":
                out += c
                i += 1
                continue
            if i + 1 >= n:
                out += "�"
                break
            e = s[i + 1]
            simple = {"n": "\n", "t": "\t", "r": "\r", "b": "\b", "f": "\f",
                      '"': '"', "\\": "\\", "/": "/"}
            if e in simple:
                out += simple[e]
                i += 2
            elif e == "u" and i + 6 <= n:
                try:
                    cp = int(s[i + 2:i + 6], 16)
                    out += chr(cp)
                except ValueError:
                    out += "�"
                i += 6
            else:
                out += "�"
                i += 2
    # Coerce any lone surrogates that survived decoding.
    return _SURROGATE_RE.sub("�", out)


def parse_iso_week(s: str) -> tuple[int, int]:
    """'2023-W07' -> (2023, 7) (util.go:407-420 semantics)."""
    m = re.fullmatch(r"(\d{4})-W(\d{2})", s)
    if not m:
        raise ValueError(f"bad ISO week: {s!r}")
    return int(m.group(1)), int(m.group(2))


def iso_week_start(year: int, week: int):
    """Monday of the given ISO week (util.go:422-435 semantics)."""
    import datetime

    return datetime.date.fromisocalendar(year, week, 1)
