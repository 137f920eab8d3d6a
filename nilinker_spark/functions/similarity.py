"""String-similarity primitives.

The pipeline keeps similarity **JVM-side** wherever Spark has a native
function (``F.levenshtein``); these pure-Python twins exist so the
oracle computes the identical quantity, and for the fuzzy OOV fallback
(≙ rapidfuzz process.extract at /root/reference/src/utils/utils.py:321-327)
where a deterministic tie-break is required for cluster stability.
"""

from __future__ import annotations


def levenshtein(a: str, b: str) -> int:
    """Classic DP edit distance — same semantics as Spark's F.levenshtein."""
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def lev_ratio(a: str, b: str) -> float:
    """1 - lev/max(len) in [0,1]; 1.0 for two empty strings."""
    m = max(len(a), len(b))
    if m == 0:
        return 1.0
    return 1.0 - levenshtein(a, b) / m


def jaro(a: str, b: str) -> float:
    """Jaro similarity in [0,1] — the classic public algorithm (matching
    window = max(len)/2 - 1, transposition count over matched chars)."""
    if a == b:
        return 1.0
    la, lb = len(a), len(b)
    if not la or not lb:
        return 0.0
    window = max(la, lb) // 2 - 1
    if window < 0:
        window = 0
    match_a = [False] * la
    match_b = [False] * lb
    m = 0
    for i, ca in enumerate(a):
        lo = max(0, i - window)
        hi = min(lb, i + window + 1)
        for j in range(lo, hi):
            if not match_b[j] and b[j] == ca:
                match_a[i] = match_b[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(la):
        if match_a[i]:
            while not match_b[k]:
                k += 1
            if a[i] != b[k]:
                t += 1
            k += 1
    t //= 2
    return (m / la + m / lb + (m - t) / m) / 3.0


def jaro_winkler(a: str, b: str, p: float = 0.1, max_prefix: int = 4) -> float:
    """Jaro-Winkler: Jaro boosted by the common prefix (<= ``max_prefix``).

    The second string feature of the scoring blend (north_star:
    "Jaro-Winkler/Levenshtein string features"; reference's fuzzy family
    = rapidfuzz/jellyfish, requirements.txt:4-5).  Pure Python on BOTH
    sides (pipeline pandas UDF + oracle), so parity is by construction.
    """
    j = jaro(a, b)
    l = 0
    for ca, cb in zip(a, b):
        if ca != cb or l >= max_prefix:
            break
        l += 1
    return j + l * p * (1.0 - j)


def token_sort_ratio(a: str, b: str) -> float:
    """rapidfuzz-style token_sort_ratio in [0,1]: sort tokens, join, ratio.

    ≙ scorer used for the reference's fuzzy candidate joins
    (/root/reference/src/utils/utils.py:322-325).
    """
    sa = " ".join(sorted(a.split()))
    sb = " ".join(sorted(b.split()))
    return lev_ratio(sa, sb)


def fuzzy_best_match(word: str, vocab: list[str]) -> str:
    """Deterministic nearest vocab word for an OOV token.

    Tie-break: (score desc, word asc) — required so cluster output is
    identical under any partitioning (SURVEY.md §4 item 3).  ``vocab``
    must be pre-sorted ascending by the caller for the tie-break to be
    order-free.
    """
    best_word = ""
    best_score = -1.0
    for w in vocab:  # vocab sorted asc → first max wins ties
        s = token_sort_ratio(word, w)
        if s > best_score:
            best_score = s
            best_word = w
    return best_word
