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
import pandas as pd

from camden_spark.functions.hashing import pow_array

_B = np.uint64(1099511628211)  # FNV prime, odd → invertible mod 2^64
_BINV = np.uint64(pow(int(_B), -1, 1 << 64))


def rolling_hashes(data: bytes, g: int) -> np.ndarray:
    """uint64 polynomial hash of every g-byte window, fully vectorized.

    h[i] = Σ_{j<g} data[i+j] * B^(g-1-j)  (mod 2^64)
         = B^(i+g-1) * (P[i+g-1] - P[i-1])  with  P[i] = Σ_{j≤i} c[j] B^(-j).
    """
    c = np.frombuffer(data, dtype=np.uint8)
    n = c.shape[0]
    if n < g:
        return np.empty(0, dtype=np.uint64)
    binv_pows = pow_array(_BINV, n)
    P = np.cumsum(np.multiply(c, binv_pows, dtype=np.uint64))
    b_pows = pow_array(_B, n)
    diff = P[g - 1 :].copy()
    diff[1:] -= P[: n - g]
    return diff * b_pows[g - 1 :]


def sliding_min(a: np.ndarray, w: int) -> np.ndarray:
    """out[i] = min(a[i:i+w]) — sparse-table doubling, O(n log w)."""
    n = a.shape[0]
    if n < w:
        return np.empty(0, dtype=a.dtype)
    p = 1
    sp = a
    while p * 2 <= w:
        sp = np.minimum(sp[:-p], sp[p:])
        p *= 2
    # sp[i] = min(a[i:i+p]); window w = min(sp[i], sp[i+w-p])
    return np.minimum(sp[: n - w + 1], sp[w - p : w - p + n - w + 1])


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
    return np.unique(sliding_min(h, w))


def batch_winnow(
    texts: "pd.Series[str]", g: int, w: int
) -> tuple[np.ndarray, np.ndarray]:
    """(fingerprints uint64[M], per-doc counts int64[nd]) for a whole Arrow
    batch — one buffer, one rolling-hash pass, one sliding-min, no per-doc
    Python.  Same values as ``winnow_fingerprints`` per doc for
    newline-free texts (the normalized pipeline path).

    Windows crossing doc boundaries are masked out via the '\\n' separator.
    Texts CONTAINING newlines (possible only with collapse_whitespace=False)
    follow masked-window semantics: g-windows and w-windows crossing an
    in-text newline are excluded, and a doc left with valid g-windows but no
    complete w-window falls back to the min over its valid g-hashes — it
    always fingerprints, but the values differ from ``winnow_fingerprints``,
    which hashes straight through newlines.
    """
    n = len(texts)
    joined = "\n".join(t if isinstance(t, str) else "" for t in texts)
    data = joined.encode("utf-8")
    c = np.frombuffer(data, dtype=np.uint8)
    m = c.shape[0]
    counts = np.zeros(n, dtype=np.int64)
    if m < g:
        return np.empty(0, dtype=np.uint64), counts
    h = rolling_hashes(data, g)  # h[i] covers bytes [i, i+g)
    nl_pos = np.flatnonzero(c == 10)
    nl_cum = np.zeros(m + 1, dtype=np.int64)
    np.cumsum(c == 10, out=nl_cum[1:])
    # g-window at i is intra-doc iff no newline in [i, i+g)
    H = h.shape[0]
    g_valid = (nl_cum[g:] - nl_cum[: H]) == 0  # len H
    # doc extents in BYTE space (h indexes bytes — char offsets would read the
    # wrong hash segments for any non-ASCII text).  Common path: exactly n-1
    # separators → derive byte lengths from them.  If a text itself contains
    # '\n' (possible only with collapse_whitespace=False), fall back to
    # re-encoding per doc; windows crossing in-text newlines stay masked.
    if nl_pos.shape[0] == n - 1:
        bounds = np.concatenate(
            (np.array([-1], dtype=np.int64), nl_pos, np.array([m], dtype=np.int64))
        )
        doc_starts = bounds[:-1] + 1
        doc_lens = bounds[1:] - doc_starts
    else:
        doc_lens = np.fromiter(
            (len(t.encode("utf-8")) if isinstance(t, str) else 0 for t in texts),
            dtype=np.int64,
            count=n,
        )
        doc_starts = np.zeros(n, dtype=np.int64)
        np.cumsum(doc_lens[:-1] + 1, out=doc_starts[1:])
    doc_of = np.searchsorted(doc_starts, np.arange(H), side="right") - 1
    # short docs (len < g+w-1 but >= g... also docs shorter than g) need the
    # single-min fallback; handle docs with any valid g-window but fewer than
    # w of them below.  First the common path: w-windows of valid g-hashes.
    span = w + g - 1  # byte span of a w-window of g-grams
    fps_parts: list[np.ndarray] = []
    doc_parts: list[np.ndarray] = []
    covered = np.zeros(n, dtype=bool)  # docs served by the windowed path
    if H >= w:
        wm = sliding_min(h, w)  # len H-w+1
        W = wm.shape[0]
        # valid iff entire byte span [i, i+span) intra-doc
        w_valid = (nl_cum[span:][:W] - nl_cum[:W]) == 0
        vals = wm[w_valid]
        vdocs = doc_of[:W][w_valid]
        covered[vdocs] = True
        # pre-drop adjacent repeats (the same min spans many neighboring
        # windows) — shrinks the global sort by ~w x
        if vals.shape[0]:
            first = np.empty(vals.shape[0], dtype=bool)
            first[0] = True
            first[1:] = (vals[1:] != vals[:-1]) | (vdocs[1:] != vdocs[:-1])
            vals, vdocs = vals[first], vdocs[first]
        fps_parts.append(vals)
        doc_parts.append(vdocs)
    # fallback: any doc with ≥ 1 VALID g-window that got nothing from the
    # windowed path takes the min over its valid g-hashes.  Classified by
    # valid-g-window coverage, NOT byte length: with in-text newlines
    # (collapse_whitespace=False) a doc of byte length ≥ span can still have
    # every complete w-window masked — byte-length classification would give
    # such docs ZERO fingerprints and exempt them from the substring pass.
    # For newline-free texts this reduces exactly to byte length in
    # [g, span), the old classification.
    g_count = np.bincount(doc_of[g_valid[:H]], minlength=n)
    short = np.flatnonzero((g_count > 0) & ~covered)
    if short.shape[0]:
        # per short doc: min over its valid g-hashes (few docs; small loop)
        mins = []
        sdocs = []
        for d in short:
            s = doc_starts[d]
            e = s + doc_lens[d] - g + 1
            seg = h[s:e][g_valid[s:e]]
            if seg.shape[0]:
                mins.append(seg.min())
                sdocs.append(d)
        if mins:
            fps_parts.append(np.asarray(mins, dtype=np.uint64))
            doc_parts.append(np.asarray(sdocs, dtype=np.int64))
    if not fps_parts:
        return np.empty(0, dtype=np.uint64), counts
    fps = np.concatenate(fps_parts)
    docs_idx = np.concatenate(doc_parts)
    order = np.lexsort((fps, docs_idx))
    d_s, f_s = docs_idx[order], fps[order]
    keep = np.empty(d_s.shape[0], dtype=bool)
    if keep.shape[0]:
        keep[0] = True
        keep[1:] = (d_s[1:] != d_s[:-1]) | (f_s[1:] != f_s[:-1])
    return f_s[keep], np.bincount(d_s[keep], minlength=n).astype(np.int64)


def has_common_substring(a: bytes, b: bytes, L: int) -> bool:
    """True iff a and b share some substring of length ≥ L — one O(n)
    rolling-hash pass + set intersection (vanishing false-positive rate;
    callers confirm positives with the exact suffix-array LCS)."""
    if L <= 0 or len(a) < L or len(b) < L:
        return False
    ha = rolling_hashes(a, L)
    hb = rolling_hashes(b, L)
    return np.intersect1d(ha, hb, assume_unique=False).shape[0] > 0


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
