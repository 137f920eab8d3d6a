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


def _naive_extract(url, text, gazetteer):
    """Round-1 greedy scan, no memo, no probe gates — the semantics the
    optimized extract_mentions must reproduce exactly."""
    from nilinker_spark.oracle import MAX_MENTION_TOKENS, mention_id

    toks = text.split(" ")
    norm_toks = [norm_form(t) for t in toks]
    out = []
    i, n = 0, len(toks)
    while i < n:
        matched = False
        for length in range(min(MAX_MENTION_TOKENS, n - i), 0, -1):
            if " ".join(norm_toks[i : i + length]) in gazetteer:
                cand = " ".join(toks[i : i + length])
                out.append((mention_id(url, i, cand), cand, i))
                i += length
                matched = True
                break
        if not matched:
            i += 1
    return out


# adversarial alphabet: punctuation that normalizes away, ':' (maps to
# '_' then to space -> multi-word tokens), digits, hyphens
_adv_word = st.text(alphabet="ab1-.,':x ", min_size=1, max_size=8)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(_adv_word, min_size=0, max_size=30),
    st.lists(_adv_word, min_size=1, max_size=8),
)
def test_extract_mentions_gates_are_exact(doc_words, gaz_surfaces):
    """The memo + first-word + word-count probe gates only skip probes
    that provably cannot match: output identical to the naive greedy scan
    for ANY text and ANY normalized gazetteer — including tokens that
    normalize to several words or to nothing."""
    from nilinker_spark.oracle import extract_mentions

    text = " ".join(doc_words)
    gazetteer = {norm_form(s) for s in gaz_surfaces}
    gazetteer.discard("")
    want = _naive_extract("u", text, gazetteer)
    got = extract_mentions("u", text, gazetteer, {}, None)
    assert got == want


@given(
    st.lists(
        st.tuples(
            st.text(alphabet="abcdefg üé日\x00", max_size=14),
            st.text(alphabet="abcdefg üé日\x00", max_size=14),
        ),
        max_size=40,
    )
)
@settings(max_examples=150, deadline=None)
def test_jaro_winkler_batch_bit_exact_vs_scalar(pairs):
    """The numpy-vectorized scoring hot path must equal the pure-Python
    oracle twin bit-for-bit on arbitrary unicode inputs — including NUL
    characters, which the padded matrix must not mistake for padding
    (ADVICE r3: codepoints are stored +1 so 0 uniquely means pad)."""
    import numpy as np

    from nilinker_spark.functions.similarity import jaro_winkler, jaro_winkler_batch

    a = [p[0] for p in pairs]
    b = [p[1] for p in pairs]
    got = jaro_winkler_batch(a, b)
    want = np.array([jaro_winkler(x, y) for x, y in pairs], dtype=np.float64)
    assert got.shape == want.shape and (got == want).all()
