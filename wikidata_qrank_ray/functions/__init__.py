from .textnorm import normalize_text, normalize_text_sql_parity, remap_lang, unquote
from .qid import parse_qid, format_qid, qid_num
from .hashing import stable_hash64, minhash_signature, simhash64, rolling_fingerprint

__all__ = [
    "normalize_text",
    "normalize_text_sql_parity",
    "remap_lang",
    "unquote",
    "parse_qid",
    "format_qid",
    "qid_num",
    "stable_hash64",
    "minhash_signature",
    "simhash64",
    "rolling_fingerprint",
]
