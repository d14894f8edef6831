import numpy as np
import pytest

from wikidata_qrank_ray.functions import format_qid, parse_qid, qid_num


def test_roundtrip():
    for s in ["Q72", "Q1", "Q123456789", "L123"]:
        assert format_qid(parse_qid(s)) == s


def test_lexeme_bit_sorts_after_items():
    assert parse_qid("L1") > parse_qid("Q999999999")


def test_invalid():
    for bad in ["", "Q", "X12", "Q12x", "12"]:
        with pytest.raises(ValueError):
            parse_qid(bad)


def test_qid_num_vectorized():
    out = qid_num(np.array(["Q10", "Q2", "Q100"], dtype=object))
    assert out.tolist() == [10, 2, 100]
    assert out.dtype == np.int64
