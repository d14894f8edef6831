import pandas as pd
import pyarrow as pa
import ray
import ray.data

from wikidata_qrank_ray.stages.mentions import GazetteerMatcher, detect_mentions


def _gaz():
    return pd.DataFrame(
        {
            "qid": ["Q1", "Q2", "Q3"],
            "surface": ["spark", "merge", "new york"],
            "prior": [100, 50, 10],
        }
    )


def _turns_table():
    return pa.table(
        {
            "conv_id": ["c0", "c0", "c1"],
            "turn_idx": pa.array([0, 1, 0], type=pa.int32()),
            "text": ["spark merge spark", "nothing here", "merge  spark"],
            "tool": ["", "", "calc"],
        }
    )


def test_matcher_direct_smoke():
    # actor __init__ errors surface late in pipelines; smoke the class directly
    m = GazetteerMatcher(_gaz(), mode="mentions")
    out = m(_turns_table()).to_pandas()
    got = set(map(tuple, out[["conv_id", "turn_idx", "qid"]].to_numpy()))
    assert got == {("c0", 0, "Q1"), ("c0", 0, "Q2"), ("c1", 0, "Q1"), ("c1", 0, "Q2")}


def test_matcher_occurrence_counts():
    m = GazetteerMatcher(_gaz(), mode="partial_counts")
    out = m(_turns_table()).to_pandas().set_index("qid")["cnt"].to_dict()
    assert out == {"Q1": 3, "Q2": 2}


def test_multi_token_greedy_match():
    from wikidata_qrank_ray.stages.mentions import PhraseGazetteerMatcher

    m = PhraseGazetteerMatcher(
        pd.DataFrame(
            {"qid": ["Q9", "Q1"], "surface": ["new york", "york"], "prior": [5, 50]}
        )
    )
    t = pa.table(
        {
            "conv_id": ["c0"],
            "turn_idx": pa.array([0], type=pa.int32()),
            "text": ["in new york today york"],
        }
    )
    out = m(t).to_pandas()
    got = set(map(tuple, out[["qid", "surface"]].to_numpy()))
    # greedy: "new york" consumes york at pos 2; the trailing bare "york"
    # still matches the unigram
    assert got == {("Q9", "new york"), ("Q1", "york")}


def test_phrase_run_parity_overlap():
    """Overlapping bigram candidates: 'a b', 'b c', 'c d' are all phrases;
    greedy left-to-right takes 'a b' then 'c d' (run parity), never 'b c'."""
    from wikidata_qrank_ray.stages.mentions import PhraseGazetteerMatcher

    m = PhraseGazetteerMatcher(
        pd.DataFrame(
            {
                "qid": ["Q1", "Q2", "Q3"],
                "surface": ["a b", "b c", "c d"],
                "prior": [1, 1, 1],
            }
        )
    )
    t = pa.table(
        {
            "conv_id": ["c0", "c0"],
            "turn_idx": pa.array([0, 1], type=pa.int32()),
            "text": ["a b c d", "x b c y"],
        }
    )
    out = m(t).to_pandas()
    got = set(map(tuple, out[["turn_idx", "qid"]].to_numpy()))
    assert got == {(0, "Q1"), (0, "Q3"), (1, "Q2")}


def test_phrase_not_across_turn_boundary():
    from wikidata_qrank_ray.stages.mentions import PhraseGazetteerMatcher

    m = PhraseGazetteerMatcher(
        pd.DataFrame({"qid": ["Q1"], "surface": ["new york"], "prior": [1]})
    )
    t = pa.table(
        {
            "conv_id": ["c0", "c0"],
            "turn_idx": pa.array([0, 1], type=pa.int32()),
            "text": ["ends with new", "york starts here"],
        }
    )
    assert len(m(t)) == 0


def test_linking_prior_tiebreak():
    # ambiguous surface: higher prior wins; equal prior -> lower qid
    gaz = pd.DataFrame(
        {
            "qid": ["Q7", "Q3", "Q12", "Q5"],
            "surface": ["x", "x", "y", "y"],
            "prior": [10, 90, 4, 4],
        }
    )
    m = GazetteerMatcher(gaz)
    assert m.best["x"][0] == "Q3"
    assert m.best["y"][0] == "Q5"


def test_detect_mentions_dataset():
    ds = ray.data.from_arrow(_turns_table())
    out = detect_mentions(ds, ray.put(_gaz()), concurrency=1).to_pandas()
    assert len(out) == 4
    assert set(out.columns) == {"conv_id", "turn_idx", "qid", "surface"}


def test_bigram_counts_ignore_whitespace_padding():
    import pyarrow as pa

    from wikidata_qrank_ray.sources.gazetteer import _partial_bigram_counts

    t = pa.table({"text": [" alpha beta ", "alpha beta", "  "]})
    out = _partial_bigram_counts(t).to_pandas()
    got = dict(zip(out["surface"], out["cnt"]))
    # padded and unpadded rows contribute the SAME bigram; no phantom
    # ""-token pairs like " alpha" / "beta "
    assert got == {"alpha beta": 2}


def test_maximal_munch_arbitrary_length_phrases():
    """Planted 3- and 4-token surfaces: longest match wins at each position,
    consumed spans block shorter matches inside them, matching resumes
    right after a taken span (PhraseGazetteerMatcher greedy walk)."""
    from wikidata_qrank_ray.stages.mentions import PhraseGazetteerMatcher

    gaz = pd.DataFrame(
        {
            "qid": ["Q1", "Q101", "Q201", "Q301"],
            "surface": ["york", "new york", "new york city", "the big apple city"],
            "prior": [100, 50, 25, 10],
        }
    )
    m = PhraseGazetteerMatcher(gaz)
    t = pa.table(
        {
            "conv_id": ["a", "b", "c", "d"],
            "turn_idx": pa.array([0, 0, 0, 0], type=pa.int32()),
            # a: quad at pos 1..4 consumes "city" -> no trigram/bigram inside
            "text": [
                "x the big apple city new york city y",
                "new york city",      # trigram beats bigram+unigram
                "new new york",       # no bigram at 0 ("new new"); bigram at 1 taken
                "york new york city", # unigram at 0, trigram at 1
            ],
        }
    )
    out = m(t).to_pandas()
    got = {
        (c, q, s)
        for c, q, s in zip(out["conv_id"], out["qid"], out["surface"])
    }
    assert got == {
        ("a", "Q301", "the big apple city"),
        ("a", "Q201", "new york city"),
        ("b", "Q201", "new york city"),
        ("c", "Q101", "new york"),
        ("d", "Q1", "york"),
        ("d", "Q201", "new york city"),
    }


def test_maximal_munch_consumed_span_blocks_inner_match():
    """A taken long match must also block matches STARTING inside its span:
    'new york city' at pos 0 consumes pos 1-2, so 'york' (pos 1) never
    fires even though it is in the dictionary."""
    from wikidata_qrank_ray.stages.mentions import PhraseGazetteerMatcher

    gaz = pd.DataFrame(
        {
            "qid": ["Q1", "Q2", "Q201"],
            "surface": ["york", "city", "new york city"],
            "prior": [100, 90, 10],
        }
    )
    m = PhraseGazetteerMatcher(gaz)
    t = pa.table(
        {
            "conv_id": ["a"],
            "turn_idx": pa.array([0], type=pa.int32()),
            "text": ["new york city city"],
        }
    )
    out = m(t).to_pandas()
    got = {(q, s) for q, s in zip(out["qid"], out["surface"])}
    # trailing second "city" is outside the span -> unigram fires there
    assert got == {("Q201", "new york city"), ("Q2", "city")}
