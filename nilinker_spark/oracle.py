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
from nilinker_spark.functions.similarity import fuzzy_best_match, levenshtein

MAX_MENTION_TOKENS = 4
ALPHA = 0.6  # cosine weight in the blended score
TAU = 0.80  # edge threshold
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


def extract_mentions(url: str, text: str, gazetteer: set[str]) -> list[tuple[str, str, int]]:
    """Greedy longest-match gazetteer scan -> [(mention_id, surface, pos)].

    Pure function of (url, text, gazetteer); shared verbatim with the
    pipeline's mapInPandas stage and the streaming path.

    Tokens are normalized ONCE per document and candidate n-grams are
    joins of normalized tokens — not norm_form() over every probe span,
    which would cost up to MAX_MENTION_TOKENS regex passes per position
    (measured ~4x the whole scan).  Gazetteer entries are normalized
    forms, so matching is exact.
    """
    toks = text.split(" ")
    norm_toks = [norm_form(t) for t in toks]
    out: list[tuple[str, str, int]] = []
    i = 0
    n = len(toks)
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


def blended_score(pv_a: np.ndarray, pv_b: np.ndarray, nf_a: str, nf_b: str) -> float:
    """ALPHA*cosine + (1-ALPHA)*levenshtein ratio, float64 accumulation
    (matches Spark's aggregate-over-double semantics on float arrays)."""
    cos = float(np.dot(pv_a.astype(np.float64), pv_b.astype(np.float64)))
    m = max(len(nf_a), len(nf_b))
    lev = 1.0 if m == 0 else 1.0 - levenshtein(nf_a, nf_b) / m
    return ALPHA * cos + (1.0 - ALPHA) * lev


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


def cluster_forms(forms: list[str], kb: KBFixture) -> dict[str, str]:
    """Distinct normalized forms -> cluster id (min form in component).

    Blocking, scoring, and transitive closure over *distinct* forms —
    the same distinct-surface memoization the pipeline uses (≙ the
    reference's kb_cache, REEL/pre_process.py:250-307, done relationally).
    """
    forms = sorted(set(forms))
    fcache: dict[str, int] = {}
    pvs = {f: form_phrase_vector(f, kb, fcache) for f in forms}

    blocks: dict[str, list[str]] = {}
    for f in forms:
        for k in block_keys(f):
            blocks.setdefault(k, []).append(f)

    uf = UnionFind()
    for f in forms:
        uf.find(f)
    pairs: set[tuple[str, str]] = set()
    for _key, members in sorted(blocks.items()):
        members = sorted(set(members))
        n = len(members)
        if n <= MAX_BLOCK_FORMS:
            for i in range(n):
                for j in range(i + 1, n):
                    pairs.add((members[i], members[j]))
        else:
            # salted sub-blocks + replicated anchors (mirrors pairs.py)
            n_salts = -(-n // MAX_BLOCK_FORMS)
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
    for a, b in sorted(pairs):
        if blended_score(pvs[a], pvs[b], a, b) >= TAU:
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
