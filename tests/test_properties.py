"""Hypothesis property tests for the pure scalar layer (no Spark)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from nilinker_spark.functions.normalize import extract_text, norm_form, tokenize_entity
from nilinker_spark.functions.similarity import lev_ratio, levenshtein, token_sort_ratio

text_st = st.text(max_size=60)
word_st = st.text(alphabet="abcdefghijklmnopqrstuvwxyz", min_size=0, max_size=12)


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=200))
def test_extract_text_total_and_idempotent(b):
    out = extract_text(b)
    assert isinstance(out, str)
    # extraction of already-extracted text is stable (no tags remain)
    assert extract_text(out.encode("utf-8")) == out


@settings(max_examples=200, deadline=None)
@given(text_st)
def test_norm_form_idempotent(s):
    assert norm_form(norm_form(s)) == norm_form(s)


@settings(max_examples=200, deadline=None)
@given(text_st)
def test_tokenize_always_two(s):
    tl, tr = tokenize_entity(s)
    assert isinstance(tl, str) and isinstance(tr, str)
    if s.strip(" "):
        toks = [t for t in s.split(" ") if t]
        assert tl == toks[0]


@settings(max_examples=150, deadline=None)
@given(word_st, word_st)
def test_levenshtein_metric_properties(a, b):
    d = levenshtein(a, b)
    assert d == levenshtein(b, a)  # symmetry
    assert (d == 0) == (a == b)  # identity
    assert d <= max(len(a), len(b))  # upper bound
    assert d >= abs(len(a) - len(b))  # lower bound


@settings(max_examples=100, deadline=None)
@given(word_st, word_st, word_st)
def test_levenshtein_triangle(a, b, c):
    assert levenshtein(a, c) <= levenshtein(a, b) + levenshtein(b, c)


@settings(max_examples=150, deadline=None)
@given(word_st, word_st)
def test_ratios_bounded(a, b):
    assert 0.0 <= lev_ratio(a, b) <= 1.0
    assert 0.0 <= token_sort_ratio(a, b) <= 1.0


@settings(max_examples=100, deadline=None)
@given(st.lists(word_st.filter(bool), min_size=1, max_size=4))
def test_token_sort_order_invariant(tokens):
    import itertools

    s1 = " ".join(tokens)
    for perm in itertools.permutations(tokens):
        assert token_sort_ratio(s1, " ".join(perm)) == 1.0
        break
