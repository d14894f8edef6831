"""PII redaction stage: counts and redacted text, vectorized Arrow kernels."""

import pyarrow as pa
import ray.data

from wikidata_qrank_ray.stages.pii import PII_PATTERNS, redact_pii


def _run(texts):
    ds = ray.data.from_arrow(
        pa.table({"doc_id": list(range(len(texts))), "text": texts})
    )
    out = redact_pii(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
    return out


def test_email_ip_phone_redacted():
    out = _run(
        [
            "write to bob.smith+x@mail.example.org today",
            "server at 192.168.0.1 and 10.0.0.255 responded",
            "call +1-555-0199 now",
            "clean text with no pii at all",
        ]
    )
    assert out.loc[0, "n_email"] == 1
    assert out.loc[0, "redacted"] == "write to <EMAIL> today"
    assert out.loc[1, "n_ip"] == 2
    assert out.loc[1, "redacted"] == "server at <IP> and <IP> responded"
    assert out.loc[2, "n_phone"] == 1
    assert out.loc[2, "redacted"] == "call <PHONE> now"
    assert out.loc[3, ["n_email", "n_ip", "n_phone"]].sum() == 0
    assert out.loc[3, "redacted"] == "clean text with no pii at all"


def test_null_text_and_mixed():
    out = _run([None, "a@b.co from 1.2.3.4 dial +44-555-1234"])
    assert out.loc[0, "redacted"] == ""
    assert out.loc[1, "n_email"] == 1
    assert out.loc[1, "n_ip"] == 1
    assert out.loc[1, "n_phone"] == 1
    assert out.loc[1, "redacted"] == "<EMAIL> from <IP> dial <PHONE>"


def test_passes_do_not_interfere():
    # a redacted <EMAIL> token contains no digits, so later IP/phone passes
    # cannot match inside it; counts are taken on the ORIGINAL text.
    out = _run(["u1@h1.io 9.9.9.9"])
    assert out.loc[0, "n_email"] == 1
    assert out.loc[0, "n_ip"] == 1
    assert out.loc[0, "redacted"] == "<EMAIL> <IP>"


def test_patterns_are_re2_safe_strings():
    # shared verbatim with the SQL oracle: plain strings, no Python-only
    # constructs (lookbehind etc.) that RE2/DuckDB would reject.
    import re

    for _, pat, _ in PII_PATTERNS:
        re.compile(pat)
        assert "(?<" not in pat and "(?=" not in pat and "(?!" not in pat
