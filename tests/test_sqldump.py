"""SQL-dump text source: reference-golden parity (sqlreader_test.go) +
round-trip property + the distributed read path."""

import gzip
import os

import pyarrow as pa
import pytest

from wikidata_qrank_ray.sources.sqldump import (
    SqlInsertParser,
    _unescape,
    encode_sql_dump_batch,
    parse_insert_rows,
    read_sql_dump,
    sniff_sql_columns,
)

REF = "/root/reference/cmd/qrank-builder/testdata"
PAGE_PROPS_COLS = ["pp_page", "pp_propname", "pp_value", "pp_sortkey"]


def _read_dump(path):
    """Sequential twin of the distributed path: sniff + per-line parse
    (reference readSQL, sqlreader_test.go:20-55)."""
    op = gzip.open if path.endswith(".gz") else open
    with op(path, "rt", encoding="utf-8") as f:
        txt = f.read()
    cols = sniff_sql_columns(txt)
    rows = []
    for line in txt.splitlines():
        if "INSERT" in line:
            rows.extend(parse_insert_rows(line))
    return cols, ["|".join(r) for r in rows]


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference testdata absent")
def test_reference_page_props_golden():
    # golden: sqlreader_test.go TestSQLReader (rmwiki page_props)
    cols, table = _read_dump(
        f"{REF}/dumps/rmwiki/20240301/rmwiki-20240301-page_props.sql.gz"
    )
    assert cols == PAGE_PROPS_COLS
    assert table == [
        "1|wikibase_item|Q5296|",
        "799|page_image_free|Karte_Gemeinde_Zürich_2007.png|",
        "799|wikibase_item|Q72|",
        "3824|page_image_free|Karte_Gemeinde_Obergesteln_2007.png|",
        "3824|wikibase_item|Q662541|",
        "14564|unexpectedUnconnectedPage|-10|-10",
    ]


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference testdata absent")
def test_reference_empty_and_multi_insert_goldens():
    # goldens: TestSQLReader_EmptyTable + TestSQLReader_MultipleInserts
    cols, table = _read_dump(
        f"{REF}/dumps/loginwiki/20240501/loginwiki-20240501-page_props.sql.gz"
    )
    assert cols == PAGE_PROPS_COLS and table == []
    cols, table = _read_dump(f"{REF}/multiple-inserts.sql")
    assert cols == PAGE_PROPS_COLS
    assert table == [
        "1|wikibase_item|Q1|",
        "2|wikibase_item|Q2|",
        "3|wikibase_item|Q3|",
        "4|wikibase_item|Q4|",
    ]


def test_lexer_string_goldens():
    # goldens: sqlreader_test.go TestSQLLexer string cases
    assert _unescape(r"fo\'o", "keep") == "fo'o"
    assert _unescape(r"ba\327r", "keep") == r"ba\327r"  # kept escaped
    # full mode inverts the mysqldump escape set
    assert _unescape(r"a\\b\nc\td\Z\0", "full") == "a\\b\nc\td\x1a\x00"
    # unknown escape: backslash is ignored (MySQL semantics)
    assert _unescape(r"\q", "full") == "q"


def test_parse_semantics():
    line = ("INSERT INTO `t` VALUES (1,'a',NULL,-2.5),(2,'b\\'c',0.1,7);"
            " INSERT INTO `t` VALUES (3,NULL,'x',.7);")
    rows = parse_insert_rows(line)
    assert rows == [
        ["1", "a", "", "-2.5"],
        ["2", "b'c", "0.1", "7"],
        ["3", "", "x", ".7"],
    ]
    assert parse_insert_rows(line, nulls="none")[0][2] is None
    # statement split across lines is the documented loud failure
    with pytest.raises(ValueError):
        parse_insert_rows("INSERT INTO `t` VALUES (1,'a'")
    # a value the reference's lexer also rejects (hex blob literal)
    with pytest.raises(ValueError):
        parse_insert_rows("INSERT INTO `t` VALUES (0x1A);")


def test_create_sniff_constraints_and_nested_parens():
    txt = """
-- comment line
/* block
   comment */
DROP TABLE IF EXISTS `x`;
CREATE TABLE `x` (
  `a` int(10) unsigned NOT NULL,
  `b` varbinary(60) NOT NULL DEFAULT '',
  `c` float DEFAULT NULL,
  PRIMARY KEY (`a`,`b`),
  UNIQUE KEY `k` (`b`,`c`,`a`)
) ENGINE=InnoDB;
"""
    assert sniff_sql_columns(txt) == ["a", "b", "c"]


def test_roundtrip_nasty_strings():
    nasty = ["it's", "a\\b", "line1\nline2", "\r\t\x00\x1a", "\\n kept",
             "", None, "quote\\'mix", "\x0b ", "'", "\\"]
    t = pa.table({
        "id": pa.array(range(len(nasty)), pa.int64()),
        "txt": pa.array(nasty, pa.string()),
    })
    rows = []
    for ln in encode_sql_dump_batch(t, "docs", rows_per_stmt=4):
        assert "\n" not in ln  # one statement per line, always
        rows.extend(parse_insert_rows(ln, unescape="full", nulls="none"))
    assert [r[1] for r in rows] == nasty
    assert [int(r[0]) for r in rows] == list(range(len(nasty)))


def test_read_sql_dump_distributed(tmp_path):
    """End-to-end file path: plain + gzip, through ray.data.read_text and
    the actor-pool parser stage."""
    header = (
        "-- MySQL dump\n"
        "CREATE TABLE `docs` (\n"
        "  `id` int(10) NOT NULL,\n"
        "  `txt` blob NOT NULL,\n"
        "  PRIMARY KEY (`id`)\n"
        ") ENGINE=InnoDB;\n"
    )
    t = pa.table({
        "id": pa.array([1, 2, 3], pa.int64()),
        "txt": pa.array(["x'y", None, "z\\327w"], pa.string()),
    })
    body = "\n".join(encode_sql_dump_batch(t, "docs", rows_per_stmt=2)) + "\n"
    # a raw server-written octal-ish escape (hewikiquote style), NOT
    # encoder output: keep mode must preserve it verbatim
    body += "INSERT INTO `docs` VALUES (4,'a\\327b');\n"
    plain = tmp_path / "docs.sql"
    plain.write_text(header + body, encoding="utf-8")
    gz = tmp_path / "docs.sql.gz"
    with gzip.open(gz, "wt", encoding="utf-8") as f:
        f.write(header + body)

    for path in (str(plain), str(gz)):
        out = read_sql_dump(path).to_pandas().sort_values("id")
        assert list(out.columns) == ["id", "txt"]
        assert out["id"].tolist() == ["1", "2", "3", "4"]
        # reference (keep) mode: NULL -> "", \' unescapes, every other
        # backslash pair stays escaped -- the encoder's doubled backslash
        # included; the raw \327 survives verbatim
        assert out["txt"].tolist() == ["x'y", "", "z\\\\327w", "a\\327b"]


def test_parser_stage_empty_and_width_check():
    p = SqlInsertParser(["a", "b"])
    out = p(pa.table({"text": pa.array([], pa.string())}))
    assert out.num_rows == 0 and out.schema.names == ["a", "b"]
    with pytest.raises(ValueError):
        p(pa.table({"text": pa.array(["INSERT INTO `t` VALUES (1,2,3);"])}))


from hypothesis import given, settings, strategies as st


@settings(max_examples=200, deadline=None)
@given(st.lists(
    st.one_of(st.none(), st.text(min_size=0, max_size=40)),
    min_size=1, max_size=8,
))
def test_roundtrip_property(texts):
    """encode -> parse(full unescape) is a lossless identity for ANY
    unicode text (quotes, backslashes, newlines, control chars,
    surrogate-free unicode) and for NULLs."""
    t = pa.table({
        "id": pa.array(range(len(texts)), pa.int64()),
        "txt": pa.array(texts, pa.string()),
    })
    rows = []
    for ln in encode_sql_dump_batch(t, "d", rows_per_stmt=3):
        assert "\n" not in ln and "\r" not in ln
        rows.extend(parse_insert_rows(ln, unescape="full", nulls="none"))
    assert [r[1] for r in rows] == texts


def test_schema_stamp_returns_typed_empty():
    """The registry-wide zero-block guard: a stamped query whose Dataset
    result has zero rows returns the recorded typed empty frame instead of
    a column-less one (the round-4 dedup_savings failure class)."""
    import pandas as pd
    import ray.data

    from wikidata_qrank_ray.pipelines.queries import _schema_stamped
    from wikidata_qrank_ray.pipelines.result_schemas import SCHEMAS_IPC

    assert len(SCHEMAS_IPC) >= 140  # regenerate after reshaping queries

    name = "sessionize"  # any stamped entry

    def fake_query(sf_dir):
        # a pipeline that yields zero blocks (schema lost without stamp)
        return ray.data.from_items([{"x": 1}]).filter(lambda r: False)

    wrapped = _schema_stamped(name, fake_query)
    out = wrapped("unused")
    assert isinstance(out, pd.DataFrame) and len(out) == 0
    assert sorted(out.columns) == sorted(
        ["user_id", "session_id", "n_events", "session_start", "session_end"])

    def nonempty_query(sf_dir):
        return ray.data.from_items([{"x": 1}, {"x": 2}])

    out2 = _schema_stamped(name, nonempty_query)("unused")
    assert isinstance(out2, ray.data.Dataset) and out2.count() == 2
    # non-Dataset results pass through untouched
    df = pd.DataFrame({"a": [1]})
    assert _schema_stamped(name, lambda s: df)("unused") is df
