"""Property-based tests (hypothesis) for the shared rule/hash layer —
the invariants the whole pipeline's determinism rests on."""

from hypothesis import given, settings
from hypothesis import strategies as st

from mongo2neo_spark import rules
from mongo2neo_spark.functions import hashing

text_st = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF),
    max_size=400,
)


@given(text_st)
@settings(max_examples=200, deadline=None)
def test_mention_spans_are_consistent(text):
    for m in rules.extract_mentions(text):
        assert 0 <= m.span_start < m.span_end <= len(text)
        assert text[m.span_start : m.span_end] == m.surface
        assert m.norm == rules.normalize(m.surface)


@given(text_st)
@settings(max_examples=200, deadline=None)
def test_triples_index_into_mentions(text):
    ms = rules.extract_mentions(text)
    for t in rules.extract_triples(text, ms):
        assert 0 <= t.subj_idx < len(ms)
        assert 0 <= t.obj_idx < len(ms)
        assert t.pred in rules.PREDICATE_SET


@given(st.text(max_size=100))
@settings(max_examples=200, deadline=None)
def test_normalize_idempotent(s):
    assert rules.normalize(rules.normalize(s)) == rules.normalize(s)


@given(st.text(max_size=60), st.text(max_size=60))
@settings(max_examples=100, deadline=None)
def test_pair_score_symmetric_and_bounded(a, b):
    s = rules.pair_score(rules.normalize(a), rules.normalize(b))
    assert 0.0 <= s <= 1.0
    assert s == rules.pair_score(rules.normalize(b), rules.normalize(a))


@given(st.text(min_size=1, max_size=40))
@settings(max_examples=100, deadline=None)
def test_identical_norm_scores_one(s):
    n = rules.normalize(s)
    assert rules.pair_score(n, n) == 1.0


@given(st.sets(st.text(min_size=1, max_size=12), min_size=0, max_size=50))
@settings(max_examples=100, deadline=None)
def test_minhash_batch_equals_scalar(tokens):
    sig = hashing.minhash_signature(tokens)
    batch = hashing.minhash_signatures_batch([tokens])
    assert list(batch[0]) == sig
    assert len(sig) == hashing.NUM_HASHES
    assert all(0 <= v <= hashing.MERSENNE_P for v in sig)


@given(st.text(max_size=200))
@settings(max_examples=100, deadline=None)
def test_fingerprint_deterministic(text):
    assert hashing.rolling_fingerprint(text) == hashing.rolling_fingerprint(text)
    assert 0 <= hashing.rolling_fingerprint(text) < hashing.FP_MOD
