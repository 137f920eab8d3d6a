"""Unit tests for the pure scalar functions (SURVEY.md §5 'Unit' tier)."""

from __future__ import annotations

import numpy as np

from nilinker_spark.functions.model import l2_normalize, phrase_vectors
from nilinker_spark.functions.normalize import (
    extract_text,
    ngrams,
    norm_form,
    singularize,
    tokenize_entity,
)
from nilinker_spark.functions.similarity import (
    fuzzy_best_match,
    lev_ratio,
    levenshtein,
    token_sort_ratio,
)


def test_extract_text_pure_and_byte_stable():
    html = b"<html><body>hello   world</body></html>"
    assert extract_text(html) == "hello world"
    assert extract_text(html) == extract_text(html)
    # invalid utf-8 must not throw
    assert isinstance(extract_text(b"<p>\xff\xfe</p>"), str)


def test_norm_form():
    assert norm_form("Hello, World's") == "hello worlds"
    assert norm_form("A:B  c") == "a_b c" or norm_form("A:B  c") == "a b c"
    assert norm_form("  x  ") == "x"


def test_tokenize_entity_tt_rule():
    # single token duplicated [t, t] (utils.py:372-375)
    assert tokenize_entity("cell") == ("cell", "cell")
    assert tokenize_entity("red cell") == ("red", "cell")
    # only first two tokens used (utils.py:437)
    assert tokenize_entity("a b c d") == ("a", "b")
    assert tokenize_entity("") == ("", "")


def test_singularize():
    assert singularize("cells") == "cell"
    assert singularize("glass") == "glass"
    assert singularize("abs") == "abs"  # len <= 3 untouched


def test_levenshtein_matches_known():
    assert levenshtein("kitten", "sitting") == 3
    assert levenshtein("", "abc") == 3
    assert lev_ratio("abc", "abc") == 1.0
    assert lev_ratio("", "") == 1.0


def test_token_sort_ratio_order_free():
    assert token_sort_ratio("red cell", "cell red") == 1.0


def test_fuzzy_best_match_deterministic_tiebreak():
    # two equally-distant words -> lexicographically smaller wins
    assert fuzzy_best_match("ab", ["aa", "bb"]) == "aa"


def test_ngrams():
    assert ngrams("abcd", 3) == ["abc", "bcd"]
    assert ngrams("ab", 3) == ["ab"]
    assert ngrams("", 3) == []


def test_phrase_vectors_hand_oracle():
    """Attention math vs a tiny hand-computed case (D=2, one candidate)."""
    from nilinker_spark.functions.model import ModelWeights

    W_a = np.eye(2, dtype=np.float32)
    b_a = np.zeros((1, 2), dtype=np.float32)
    W_c = np.ones((4, 2), dtype=np.float32)
    b_c = np.zeros((1, 2), dtype=np.float32)
    word_embeds = np.array([[1.0, 0.0], [0.0, 1.0]], dtype=np.float32)
    cand_embeds = np.array([[0.5, 0.5]], dtype=np.float32)
    w = ModelWeights(W_a, b_a, W_c, b_c, word_embeds, cand_embeds)

    pv = phrase_vectors(
        np.array([0]), np.array([1]),
        np.array([[0]]), np.array([[0]]),
        w,
    )
    # by hand: wl+wr=[1,1]; single candidate -> att=1 -> agg=[.5,.5] each,
    # agg_l+agg_r=[1,1]; concat=[1,1,1,1] @ ones(4,2) = [4,4]; tanh -> ~[.9993,.9993]
    # l2-normalized -> [0.7071, 0.7071]
    assert np.allclose(pv[0], [0.70710678, 0.70710678], atol=1e-6)


def test_l2_normalize_zero_row_safe():
    out = l2_normalize(np.zeros((1, 4), dtype=np.float32))
    assert not np.isnan(out).any()


def test_model_weights_npz_roundtrip(tmp_path):
    """H5-weights-scan analog (≙ predict_nilinker.py:27-33): the scorer
    fixture persists and reloads bit-identically."""
    import numpy as np

    from nilinker_spark.fixtures.kb import make_kb
    from nilinker_spark.functions.model import ModelWeights

    kb = make_kb(seed=42, n_concepts=50)
    path = str(tmp_path / "best.npz")
    np.savez(path, **kb.weights.to_npz_dict())
    loaded = ModelWeights.from_npz(path)
    for key, arr in kb.weights.to_npz_dict().items():
        assert (getattr(loaded, key) == arr).all(), key
