"""Parallel bzip2 splitting (reference SplitWikidataDump semantics):
exact line recovery across split counts, multistream, giant spanning
lines, false-positive rejection, and the distributed read path."""

import bz2

import pytest

from wikidata_qrank_ray.sources.bzsplit import (
    BLOCK_MAGIC,
    find_block_offsets,
    iter_section_bytes,
    read_bz2_lines,
    section_lines,
)


def _mklines(n=40000):
    return [f'{{"type":"item","id":"Q{i}","x":"{"ab" * ((i * 7) % 40)}"}}'
            for i in range(n)]


def _roundtrip(path, n):
    offs = find_block_offsets(path, n)
    got = []
    for i, s in enumerate(offs):
        e = offs[i + 1] if i + 1 < len(offs) else None
        got.extend(section_lines(path, s, e, i == 0))
    return offs, got


def test_exact_line_recovery_across_split_counts(tmp_path):
    raw = ("\n".join(_mklines()) + "\n").encode()
    path = str(tmp_path / "d.bz2")
    open(path, "wb").write(bz2.compress(raw, compresslevel=1))
    for n in (1, 2, 4, 7, 16):
        offs, got = _roundtrip(path, n)
        assert b"\n".join(got) + b"\n" == raw, (n, len(got))
    # byte-aligned blocks are ~1/8 of blocks: more splits may map to the
    # same verified offsets (deduped), never to wrong data
    assert offs[0] == 0


def test_multistream_and_levels(tmp_path):
    raw = ("\n".join(_mklines()) + "\n").encode()
    path = str(tmp_path / "m.bz2")
    half = len(raw) // 2
    open(path, "wb").write(
        bz2.compress(raw[:half], 1) + bz2.compress(raw[half:], 1))
    assert b"".join(iter_section_bytes(path, 0, None)) == raw
    _, got = _roundtrip(path, 5)
    assert b"\n".join(got) + b"\n" == raw
    # level 9 (the real dump level): bigger blocks, same exactness
    open(path, "wb").write(bz2.compress(raw, 9))
    _, got = _roundtrip(path, 8)
    assert b"\n".join(got) + b"\n" == raw


def test_giant_line_spanning_blocks(tmp_path):
    raw = b"start\n" + b"X" * 3_000_000 + b"\n" + b"end\n"
    path = str(tmp_path / "g.bz2")
    open(path, "wb").write(bz2.compress(raw, 1))
    _, got = _roundtrip(path, 4)
    assert b"\n".join(got) + b"\n" == raw
    # and the loud cap: a line longer than max_line_bytes raises
    offs = find_block_offsets(path, 4)
    if len(offs) > 1:
        with pytest.raises(ValueError):
            section_lines(path, offs[0], offs[1], True, max_line_bytes=1000)


def test_false_positive_magic_rejected(tmp_path):
    """The pi magic embedded in DATA must not create a split (the probe
    decompression fails there -- entities.go:103-115 semantics)."""
    filler = b"".join(
        bytes([(i * 37 + j) % 251]) for i in range(300) for j in range(97))
    raw = (b"A" * 50 + BLOCK_MAGIC + b"B" * 50 + b"\n") * 200 + filler + b"\n"
    path = str(tmp_path / "fp.bz2")
    open(path, "wb").write(bz2.compress(raw, 1))
    comp = open(path, "rb").read()
    offs = find_block_offsets(path, 6)
    for off in offs[1:]:
        assert comp[off:off + 6] == BLOCK_MAGIC
    _, got = _roundtrip(path, 6)
    assert b"\n".join(got) + b"\n" == raw


def test_read_bz2_lines_distributed(tmp_path):
    lines = _mklines(20000)
    raw = ("\n".join(lines) + "\n").encode()
    path = str(tmp_path / "r.bz2")
    open(path, "wb").write(bz2.compress(raw, 1))
    out = read_bz2_lines(path, num_splits=6).to_pandas()
    assert sorted(out["text"].tolist()) == sorted(lines)


def test_scan_chunk_boundaries(tmp_path, monkeypatch):
    """Offsets must be identical under a tiny scan chunk (magic sequences
    constantly spanning chunk boundaries -- the reference's 6-byte carry
    scenario, entities.go:84-88)."""
    import wikidata_qrank_ray.sources.bzsplit as B

    raw = ("\n".join(_mklines(20000)) + "\n").encode()
    path = str(tmp_path / "c.bz2")
    open(path, "wb").write(bz2.compress(raw, 1))
    offs_default = find_block_offsets(path, 6)
    monkeypatch.setattr(B, "_SCAN_CHUNK", 64)
    offs_small = B.find_block_offsets(path, 6)
    assert offs_small == offs_default
    _, got = _roundtrip(path, 6)
    assert b"\n".join(got) + b"\n" == raw
