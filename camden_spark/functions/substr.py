"""Substring-overlap kernels: winnowing fingerprints + suffix-array LCS.

Candidate generation uses winnowing (Schleimer/Wilkerson/Aiken, SIGMOD'03):
rolling hashes of char g-grams, keep the min hash of every w-length window.
Two docs sharing a common substring of ≥ g + w - 1 chars are guaranteed to
share a fingerprint.  Verification computes the true longest common substring
with a suffix array (doubling construction) + Kasai LCP over the concatenated
pair — the "suffix-array substring-overlap pass" of the north rule.

Pure numpy — called from pandas UDF / applyInPandas wrappers in
``operators.substr``.
"""

from __future__ import annotations

import numpy as np

_B = np.uint64(1099511628211)  # FNV prime, odd → invertible mod 2^64
_BINV = np.uint64(pow(int(_B), -1, 1 << 64))


def rolling_hashes(data: bytes, g: int) -> np.ndarray:
    """uint64 polynomial hash of every g-byte window, fully vectorized.

    h[i] = Σ_{j<g} data[i+j] * B^(g-1-j)  (mod 2^64)
         = B^(i+g-1) * (P[i+g-1] - P[i-1])  with  P[i] = Σ_{j≤i} c[j] B^(-j).
    """
    c = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
    n = c.shape[0]
    if n < g:
        return np.empty(0, dtype=np.uint64)
    binv_pows = np.cumprod(np.full(n, _BINV, dtype=np.uint64)) * _B  # B^-i
    P = np.cumsum(c * binv_pows)  # wraps mod 2^64
    b_pows = np.cumprod(np.full(n, _B, dtype=np.uint64)) * _BINV  # B^i
    diff = P[g - 1 :].copy()
    diff[1:] -= P[: n - g]
    return diff * b_pows[g - 1 :]


def winnow_fingerprints(text: str, g: int, w: int) -> np.ndarray:
    """Distinct winnowed fingerprints of ``text`` (utf-8 bytes).

    Guarantee: any common substring of ≥ g + w - 1 chars (ascii) between two
    texts yields at least one shared fingerprint.
    """
    data = text.encode("utf-8")
    h = rolling_hashes(data, g)
    if h.shape[0] == 0:
        return np.empty(0, dtype=np.uint64)
    if h.shape[0] <= w:
        return np.unique(h.min(keepdims=True))
    wins = np.lib.stride_tricks.sliding_window_view(h, w)
    return np.unique(wins.min(axis=1))


def suffix_array(s: np.ndarray) -> np.ndarray:
    """Suffix array of an int array, O(n log² n) doubling with numpy argsort."""
    n = s.shape[0]
    rank = np.asarray(s, dtype=np.int64)
    # densify ranks
    order = np.argsort(rank, kind="stable")
    dense = np.empty(n, dtype=np.int64)
    dense[order] = np.cumsum(np.concatenate(([0], (np.diff(rank[order]) != 0))))
    rank = dense
    k = 1
    sa = order
    while k < n:
        second = np.full(n, -1, dtype=np.int64)
        second[: n - k] = rank[k:]
        key = rank * (n + 1) + (second + 1)
        sa = np.argsort(key, kind="stable")
        sorted_key = key[sa]
        new_rank = np.empty(n, dtype=np.int64)
        new_rank[sa] = np.cumsum(
            np.concatenate(([0], (np.diff(sorted_key) != 0)))
        )
        rank = new_rank
        if rank[sa[-1]] == n - 1:
            break
        k *= 2
    return sa


def kasai_lcp(s: np.ndarray, sa: np.ndarray) -> np.ndarray:
    """LCP array (lcp[i] = common prefix of sa[i], sa[i+1]) via Kasai."""
    n = s.shape[0]
    rank = np.empty(n, dtype=np.int64)
    rank[sa] = np.arange(n)
    lcp = np.zeros(max(n - 1, 0), dtype=np.int64)
    h = 0
    for i in range(n):
        r = rank[i]
        if r == n - 1:
            h = 0
            continue
        j = sa[r + 1]
        while i + h < n and j + h < n and s[i + h] == s[j + h]:
            h += 1
        lcp[r] = h
        if h:
            h -= 1
    return lcp


def longest_common_substring(a: str, b: str) -> int:
    """Length (in bytes) of the longest common substring of a and b, via
    suffix array + LCP of ``a · SEP · b`` (SEP outside byte range)."""
    ab = a.encode("utf-8")
    bb = b.encode("utf-8")
    if not ab or not bb:
        return 0
    s = np.concatenate(
        [
            np.frombuffer(ab, dtype=np.uint8).astype(np.int64),
            np.array([256], dtype=np.int64),
            np.frombuffer(bb, dtype=np.uint8).astype(np.int64),
        ]
    )
    sa = suffix_array(s)
    lcp = kasai_lcp(s, sa)
    boundary = len(ab)  # index of SEP
    from_a = sa < boundary
    # adjacent suffixes from different sides of SEP
    straddle = from_a[:-1] != from_a[1:]
    if not straddle.any():
        return 0
    return int(lcp[straddle].max())
