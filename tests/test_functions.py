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


def test_jaro_winkler_known_values():
    """Classic published Jaro-Winkler examples (Winkler 1990 / SoftTF-IDF
    literature) + boundary cases."""
    import pytest

    from nilinker_spark.functions.similarity import jaro, jaro_winkler

    assert jaro("martha", "marhta") == pytest.approx(0.9444444444444445)
    assert jaro_winkler("martha", "marhta") == pytest.approx(0.9611111111111111)
    assert jaro("dwayne", "duane") == pytest.approx(0.8222222222222223)
    assert jaro_winkler("dwayne", "duane") == pytest.approx(0.8400000000000001)
    assert jaro_winkler("same", "same") == 1.0
    assert jaro_winkler("", "abc") == 0.0
    assert jaro_winkler("abc", "") == 0.0
    # matching window = max(len)//2 - 1 = 0 for 2-char strings: no
    # cross-position matches (standard Jaro semantics, same as jellyfish)
    assert jaro("ab", "ba") == 0.0
    assert jaro("dixon", "dicksonx") == pytest.approx(0.7666666666666666)
    assert jaro_winkler("dixon", "dicksonx") == pytest.approx(0.8133333333333332)


def test_jaro_winkler_prefix_cap():
    """Prefix boost caps at 4 chars (standard parameterization)."""
    from nilinker_spark.functions.similarity import jaro, jaro_winkler

    a, b = "abcdefgh", "abcdefxy"
    j = jaro(a, b)
    assert jaro_winkler(a, b) == j + 4 * 0.1 * (1 - j)


def test_fuzzy_cache_scoped_by_kb_fingerprint(spark):
    """Two KBs with different vocabularies in ONE session must resolve
    independently — the per-worker fuzzy memo is keyed by the KB
    fingerprint (a shared memo would poison the second pipeline)."""
    from nilinker_spark.fixtures.kb import make_kb
    from nilinker_spark.operators.blocking import phrase_vectors_df

    kb1 = make_kb(seed=42, n_concepts=60)
    kb2 = make_kb(seed=43, n_concepts=60)
    assert kb1.fingerprint != kb2.fingerprint

    forms = spark.createDataFrame([("zzqx",)], "norm string")  # OOV everywhere
    pv1 = phrase_vectors_df(spark, forms, kb1).collect()[0]["pv"]
    pv2 = phrase_vectors_df(spark, forms, kb2).collect()[0]["pv"]
    # same OOV token, different vocab -> different fuzzy resolution target
    # (would be identical if the memo leaked across KBs)
    import math

    d = sum((x - y) ** 2 for x, y in zip(pv1, pv2))
    assert not math.isclose(d, 0.0), "phrase vectors identical across different KBs"

    # and re-running kb1 is stable (memo correctness, not just isolation)
    pv1b = phrase_vectors_df(spark, forms, kb1).collect()[0]["pv"]
    assert pv1 == pv1b
