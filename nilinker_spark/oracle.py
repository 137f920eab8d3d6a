"""Single-process reference implementation (the "reference clusters").

This is the behavior the distributed pipeline must match at pairwise
F1 >= 0.99 (BASELINE.json north_rule).  It re-implements, in plain
Python/numpy over the fixture:

- gazetteer mention extraction   (the pipeline's S1)
- token blocking                 (≙ WC-dict candidate blocks, utils.py:265-331)
- OOV fuzzy fallback             (≙ rapidfuzz scan, utils.py:321-327)
- attention phrase vectors       (same numpy code as the pipeline UDF)
- blended pair scoring           (cosine + levenshtein ratio)
- union-find transitive closure  (≙ the collective-resolution step that
                                   replaces REEL's per-doc PPR,
                                   ppr_for_ned_all.java:338-439)

It shares every scalar function with the pipeline (nilinker_spark.functions)
so parity is exact by construction, not tuned.
"""

from __future__ import annotations

import hashlib

import numpy as np

from nilinker_spark.fixtures.kb import KBFixture
from nilinker_spark.functions.model import phrase_vectors
from nilinker_spark.functions.normalize import norm_form, singularize, tokenize_entity
from nilinker_spark.functions.similarity import fuzzy_best_match, jaro_winkler, levenshtein

MAX_MENTION_TOKENS = 4
ALPHA = 0.6  # cosine weight in the blended score
# Edge threshold.  Tuned WITH the Jaro-Winkler term in the string feature:
# JW shifts same-block pair scores up (prefix boost), so 0.82 restores the
# lev-only operating point — full-fixture gold F1 at the (w=0.5, 0.82)
# setting equals the best the lev-only blend achieved at any threshold.
TAU = 0.82
MAX_BLOCK_FORMS = 64  # sub-block target size for salted hot blocks
N_ANCHORS = 8  # replicated members keeping salted sub-blocks connectable
PAD_CANDS = 16  # candidate block width fed to the attention (top ids)


def salt_of(norm: str, n_salts: int) -> int:
    """Deterministic md5-derived salt — the same formula as the Spark side
    (pairs._salt60), so salted pair sets are identical everywhere."""
    return int(hashlib.md5(norm.encode()).hexdigest()[:15], 16) % n_salts


def mention_id(url: str, pos: int, surface: str) -> str:
    """Stable mention key — md5, not monotonically_increasing_id (SURVEY §4)."""
    return hashlib.md5(f"{url}|{pos}|{surface}".encode()).hexdigest()[:16]


def gazetteer_index(gazetteer: set[str]) -> tuple[set[str], set[int]]:
    """(first_words, probe_word_counts) — two *sound* probe gates.

    - first word: a probe at position i is ``" ".join(norm_toks[i:i+l])``,
      whose first word is the first word of ``norm_toks[i]``; a match
      needs a gazetteer entry opening with that word.  (Word, not token —
      a messy raw token may normalize to several words.)
    - word count: the probe's word count equals ``sum(wc(norm_toks[i:
      i+l]))`` exactly (the join adds l-1 spaces), so lengths whose word
      sum is absent from the gazetteer's word-count set cannot match.

    Both gates only *skip provably-failing probes*; greedy order and
    output are identical with or without them (asserted in tests).
    """
    return (
        {e.split(" ", 1)[0] for e in gazetteer},
        {e.count(" ") + 1 for e in gazetteer},
    )


def extract_mentions(
    url: str,
    text: str,
    gazetteer: set[str],
    _norm_cache: dict[str, tuple[str, int]] | None = None,
    _gaz_index: tuple[set[str], set[int]] | None = None,
) -> list[tuple[str, str, int]]:
    """Greedy longest-match gazetteer scan -> [(mention_id, surface, pos)].

    Pure function of (url, text, gazetteer); shared verbatim with the
    pipeline's mapInPandas stage and the streaming path.

    Hot-loop costs (this is the corpus-sized stage — everything here is
    measured, see BASELINE.md):
    - tokens are normalized ONCE per doc and memoized across docs via
      ``_norm_cache`` (token → (norm, word_count)); norm_form is a pure
      KB-independent function so a persistent per-worker dict can never
      go stale, and the Zipf-bounded vocabulary makes the hit rate → 1;
    - probes are gated by the two sound filters of
      :func:`gazetteer_index`, so most positions cost a set lookup
      instead of MAX_MENTION_TOKENS string joins + hashes.
    """
    toks = text.split(" ")
    if _gaz_index is None:
        _gaz_index = gazetteer_index(gazetteer)
    first_words, wcset = _gaz_index
    if _norm_cache is None:
        _norm_cache = {}
    cache_get = _norm_cache.get
    norm_toks: list[str] = []
    wcs: list[int] = []
    for t in toks:
        e = cache_get(t)
        if e is None:
            nt = norm_form(t)
            e = (nt, nt.count(" ") + 1)
            _norm_cache[t] = e
        norm_toks.append(e[0])
        wcs.append(e[1])
    out: list[tuple[str, str, int]] = []
    i = 0
    n = len(toks)
    while i < n:
        nt = norm_toks[i]
        fw = nt if wcs[i] == 1 else nt.split(" ", 1)[0]
        if fw not in first_words:
            i += 1
            continue
        lim = min(MAX_MENTION_TOKENS, n - i)
        s = 0
        wsum = []
        for length in range(lim):
            s += wcs[i + length]
            wsum.append(s)
        matched = False
        for length in range(lim, 0, -1):
            if wsum[length - 1] in wcset and " ".join(norm_toks[i : i + length]) in gazetteer:
                cand = " ".join(toks[i : i + length])
                out.append((mention_id(url, i, cand), cand, i))
                i += length
                matched = True
                break
        if not matched:
            i += 1
    return out


def block_keys(nf: str) -> list[str]:
    """Blocking keys of a normalized form: each >=3-char token and its
    singular (so plural variants land in the singular's block)."""
    keys: set[str] = set()
    for tok in nf.split(" "):
        if len(tok) >= 3:
            keys.add(tok)
            keys.add(singularize(tok))
    return sorted(keys)


def resolve_word_id(token: str, kb: KBFixture, _cache: dict | None = None) -> int:
    """Vocab id with deterministic fuzzy OOV fallback."""
    if token in kb.word2id:
        return kb.word2id[token]
    if _cache is not None and token in _cache:
        return _cache[token]
    best = fuzzy_best_match(token, kb.vocab_sorted)
    wid = kb.word2id[best]
    if _cache is not None:
        _cache[token] = wid
    return wid


def form_phrase_vector(nf: str, kb: KBFixture, _cache: dict | None = None) -> np.ndarray:
    """Phrase vector for one normalized surface form (oracle path)."""
    tl, tr = tokenize_entity(nf)
    wl = resolve_word_id(tl, kb, _cache)
    wr = resolve_word_id(tr, kb, _cache)
    vocab = kb.vocab_sorted
    cl = kb.wc.get(vocab[wl], [])[:PAD_CANDS]
    cr = kb.wc.get(vocab[wr], [])[:PAD_CANDS]

    def pad(ids: list[int]) -> np.ndarray:
        arr = np.full((1, PAD_CANDS), -1, dtype=np.int64)
        arr[0, : len(ids)] = ids
        return arr

    pv = phrase_vectors(
        np.array([wl]), np.array([wr]), pad(cl), pad(cr), kb.weights
    )
    return pv[0]


def blended_score(
    pv_a: np.ndarray, pv_b: np.ndarray, nf_a: str, nf_b: str, alpha: float = ALPHA
) -> float:
    """ALPHA*cosine + (1-ALPHA)*levenshtein ratio, float64 accumulation.

    The dot product is a SEQUENTIAL left-to-right float64 fold — the same
    rounding order as Spark's ``aggregate(zip_with(...))`` — so a pair
    score landing exactly on TAU clusters identically on both sides by
    construction (np.dot uses BLAS pairwise summation, whose different
    rounding order could flip a boundary case).

    String feature = mean of Levenshtein ratio and Jaro-Winkler — the
    north_star's "Jaro-Winkler/Levenshtein string features".  The
    float-op ORDER here mirrors the Spark expression in
    operators/scoring.py exactly (0.5*lev + 0.5*jw, then the alpha
    blend), so scores are bit-identical cross-side."""
    cos = 0.0
    for x, y in zip(pv_a, pv_b):
        cos += float(x) * float(y)
    m = max(len(nf_a), len(nf_b))
    lev = 1.0 if m == 0 else 1.0 - levenshtein(nf_a, nf_b) / m
    strf = 0.5 * lev + 0.5 * jaro_winkler(nf_a, nf_b)
    return alpha * cos + (1.0 - alpha) * strf


class UnionFind:
    def __init__(self) -> None:
        self.parent: dict[str, str] = {}

    def find(self, x: str) -> str:
        p = self.parent.setdefault(x, x)
        if p != x:
            self.parent[x] = p = self.find(p)
        return p

    def union(self, a: str, b: str) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # min representative -> deterministic cluster ids
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            self.parent[hi] = lo


def similarity_edge_list(
    forms: list[str],
    kb: KBFixture,
    alpha: float = ALPHA,
    tau: float = TAU,
    max_block: int = MAX_BLOCK_FORMS,
    metrics_out: dict | None = None,
) -> list[tuple[str, str]]:
    """Thresholded similarity edges over distinct forms, sorted.

    Blocking + scoring, no transitive closure: the edge list is the
    hand-off point where the oracle's Python scoring ends and an
    INDEPENDENT engine (DuckDB's recursive CTE in the er_resolve contract
    query, or :class:`UnionFind` below) derives the components."""
    forms = sorted(set(forms))
    fcache: dict[str, int] = {}
    pvs = {f: form_phrase_vector(f, kb, fcache) for f in forms}

    blocks: dict[str, list[str]] = {}
    for f in forms:
        for k in block_keys(f):
            blocks.setdefault(k, []).append(f)

    pairs: set[tuple[str, str]] = set()
    salt_rows: list[tuple[str, int, int]] = []
    for key, members in sorted(blocks.items()):
        members = sorted(set(members))
        n = len(members)
        if n <= max_block:
            for i in range(n):
                for j in range(i + 1, n):
                    pairs.add((members[i], members[j]))
        else:
            # salted sub-blocks + replicated anchors (mirrors pairs.py)
            n_salts = -(-n // max_block)
            salt_rows.append((key, n, n_salts))
            subs: dict[int, list[str]] = {}
            for m in members:
                subs.setdefault(salt_of(m, n_salts), []).append(m)
            for grp in subs.values():
                for i in range(len(grp)):
                    for j in range(i + 1, len(grp)):
                        pairs.add((grp[i], grp[j]))
            for anchor in members[:N_ANCHORS]:
                for m in members:
                    if m != anchor:
                        pairs.add((min(anchor, m), max(anchor, m)))
    if metrics_out is not None:
        # twin of pairs.py's salt_metrics (block_key, members, n_salts)
        metrics_out["block_salt_rows"] = salt_rows
    return [
        (a, b)
        for a, b in sorted(pairs)
        if blended_score(pvs[a], pvs[b], a, b, alpha=alpha) >= tau
    ]


def cluster_forms(
    forms: list[str],
    kb: KBFixture,
    alpha: float = ALPHA,
    tau: float = TAU,
    max_block: int = MAX_BLOCK_FORMS,
    metrics_out: dict | None = None,
) -> dict[str, str]:
    """Distinct normalized forms -> cluster id (min form in component).

    Blocking, scoring, and transitive closure over *distinct* forms —
    the same distinct-surface memoization the pipeline uses (≙ the
    reference's kb_cache, REEL/pre_process.py:250-307, done relationally).
    """
    forms = sorted(set(forms))
    uf = UnionFind()
    for f in forms:
        uf.find(f)
    for a, b in similarity_edge_list(
        forms, kb, alpha=alpha, tau=tau, max_block=max_block, metrics_out=metrics_out
    ):
        uf.union(a, b)
    return {f: uf.find(f) for f in forms}


def run_oracle(
    webtext_rows: list[tuple], kb: KBFixture
) -> tuple[list[tuple[str, str, str, int, str, str]], dict[str, str]]:
    """Full reference pipeline over raw webtext rows.

    Returns (mentions, form_clusters) where mentions is
    [(url, mention_id, surface, pos, norm_form, cluster_id)].
    """
    gazetteer = {norm_form(s) for s, _, _ in kb.surface_forms}
    mentions: list[tuple[str, str, str, int, str]] = []
    from nilinker_spark.functions.normalize import extract_text

    for url, _ts, html, _text, lang in webtext_rows:
        if lang != "en":
            continue
        text = extract_text(html)
        for mid, surface, pos in extract_mentions(url, text, gazetteer):
            mentions.append((url, mid, surface, pos, norm_form(surface)))

    clusters = cluster_forms([m[4] for m in mentions], kb)
    out = [(u, mid, s, p, nf, clusters[nf]) for (u, mid, s, p, nf) in mentions]
    return out, clusters
