"""Unit tests for the shared rule module (the specification both the
Spark UDFs and the oracle execute)."""

from mongo2neo_spark import rules


def test_mention_spans_exact():
    text = "ok then Alice Smith works at Acme Corp . done"
    ms = rules.extract_mentions(text)
    assert [(m.surface, m.span_start, m.span_end) for m in ms] == [
        ("Alice Smith", 8, 19),
        ("Acme Corp", 29, 38),
    ]
    assert [m.norm for m in ms] == ["alice smith", "acme corp"]


def test_mention_kinds():
    assert rules.infer_kind("acme corp") == "org"
    assert rules.infer_kind("alice smith") == "person"
    assert rules.infer_kind("berlin") == "place"
    assert rules.infer_kind("toolforge") == "tool"
    assert rules.infer_kind("widget") == "artifact"


def test_triple_between_adjacent_mentions():
    text = "Alice Smith works at Acme Corp ."
    ms = rules.extract_mentions(text)
    ts = rules.extract_triples(text, ms)
    assert len(ts) == 1
    assert ts[0].pred == "works at"
    assert (ts[0].subj_idx, ts[0].obj_idx) == (0, 1)


def test_no_triple_when_gap_is_not_predicate():
    text = "Alice Smith randomly near Acme Corp ."
    ms = rules.extract_mentions(text)
    assert rules.extract_triples(text, ms) == []


def test_multiple_triples_in_one_turn():
    text = "Alice Smith works at Acme Corp . Bob Jones lives in Berlin ."
    ms = rules.extract_mentions(text)
    ts = rules.extract_triples(text, ms)
    # "Acme Corp . Bob Jones" gap is ". " -> not a predicate; two triples
    assert [(t.subj_idx, t.pred, t.obj_idx) for t in ts] == [
        (0, "works at", 1),
        (2, "lives in", 3),
    ]


def test_pair_score_bounds_and_symmetry():
    assert rules.pair_score("alice smith", "alice smith") == 1.0
    s = rules.pair_score("alice smith", "alicee smith")
    assert 0.0 < s < 1.0
    assert s == rules.pair_score("alicee smith", "alice smith")
    assert rules.pair_score("alice smith", "zzz qqq") < rules.LINK_THRESHOLD


def test_normalize_collapses_whitespace():
    assert rules.normalize("  Alice   Smith ") == "alice smith"


def test_empty_text():
    assert rules.extract_mentions("") == []
    assert rules.extract_triples("", []) == []
