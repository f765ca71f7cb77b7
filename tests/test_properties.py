"""Property-based kernel tests (hypothesis) — the reference's test strategy
(planted inputs → exact expected outputs, src/scanner.rs:110-143) extended
with generated inputs: algebraic guarantees must hold for ARBITRARY text,
not just the seeded corpus.

Pure numpy/python — no SparkSession, so this file runs in seconds.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from camden_spark.functions.hashing import batch_shingle_hashes, shingle_hashes_np
from camden_spark.functions.substr import (
    batch_winnow,
    longest_common_substring,
    winnow_fingerprints,
)
from camden_spark.oracle import normalize, shingle_set

# text with heavy multi-byte coverage: ascii, latin-1 accents, CJK, emoji
TEXT = st.text(
    alphabet=st.characters(
        codec="utf-8", categories=("L", "N", "P", "Zs"), include_characters=" "
    ),
    max_size=400,
)


@settings(max_examples=150, deadline=None)
@given(st.lists(TEXT, max_size=8))
def test_batch_shingles_equal_per_doc_oracle(texts):
    """Flat-batch shingle hashing must (a) equal its own per-doc result under
    any batching, and (b) produce exactly as many distinct shingles as the
    string-level python oracle, for arbitrary unicode."""
    norm = [normalize(t) for t in texts]
    flat, counts = batch_shingle_hashes(pd.Series(norm, dtype="object"), 5)
    assert counts.sum() == flat.shape[0]
    per_doc = shingle_hashes_np(pd.Series(norm, dtype="object"), 5)
    # (a) identical values regardless of batch composition
    singles = [shingle_hashes_np(pd.Series([t], dtype="object"), 5)[0] for t in norm]
    for got, single in zip(per_doc, singles):
        assert np.array_equal(np.sort(got), np.sort(single))
    # (b) cardinality matches the python-set oracle
    for t, cnt in zip(norm, counts):
        assert cnt == len(shingle_set(t, 5)), t


@settings(max_examples=100, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=6))
def test_batch_winnow_equals_per_doc(texts):
    """Winnowing a batch must give each doc exactly its standalone
    fingerprints — byte offsets, short-doc fallback and all — for arbitrary
    unicode (newlines are the batch separator; normalize() removes them)."""
    norm = [normalize(t) for t in texts]
    flat, counts = batch_winnow(pd.Series(norm, dtype="object"), 20, 10)
    pos = 0
    for t, cnt in zip(norm, counts):
        single = np.unique(winnow_fingerprints(t, 20, 10))
        got = np.sort(flat[pos : pos + cnt].astype(np.uint64))
        pos += cnt
        assert np.array_equal(single, got), (t, cnt)


@settings(max_examples=80, deadline=None)
@given(TEXT, TEXT, TEXT)
def test_winnow_shares_fingerprint_on_common_substring(prefix, common, suffix):
    """The winnowing guarantee (SIGMOD'03): two texts sharing a substring of
    ≥ g + w − 1 bytes share at least one fingerprint."""
    g, w = 8, 4
    # make `common` long enough in BYTES and embed it in different contexts
    common = (common + "x" * (g + w)) * 2
    a = prefix + common
    b = common + suffix
    fa = winnow_fingerprints(a, g, w)
    fb = winnow_fingerprints(b, g, w)
    assert np.intersect1d(fa, fb).shape[0] >= 1


@settings(max_examples=100, deadline=None)
@given(
    st.text(alphabet="abcdé日", max_size=60),
    st.text(alphabet="abcdé日", max_size=60),
)
def test_lcs_matches_difflib(a, b):
    """Suffix-array/Kasai LCS equals difflib's longest match, in BYTES."""
    from difflib import SequenceMatcher

    ab, bb = a.encode("utf-8"), b.encode("utf-8")
    m = SequenceMatcher(None, ab, bb, autojunk=False).find_longest_match(
        0, len(ab), 0, len(bb)
    )
    assert longest_common_substring(a, b) == m.size


@settings(max_examples=60, deadline=None)
@given(st.lists(st.lists(st.integers(0, 40), max_size=30), min_size=1, max_size=5))
def test_minhash_permutation_invariance(shingle_lists):
    """MinHash signatures depend only on the SET of shingle hashes — order
    and duplicates must not matter (reduceat layout correctness)."""
    from camden_spark.functions.hashing import minhash_signatures_np

    sets = [np.unique(np.asarray(s, dtype=np.uint64)) for s in shingle_lists]
    shuffled = [np.random.RandomState(1).permutation(s) for s in sets]
    a = minhash_signatures_np(sets, 32, seed=7)
    b = minhash_signatures_np(shuffled, 32, seed=7)
    assert np.array_equal(a, b)
