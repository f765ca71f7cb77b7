"""Pure-numpy kernel tests — no Spark needed."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from camden_spark.functions.hashing import (
    hamming64_np,
    minhash_signatures_np,
    shingle_hashes_np,
    simhash_np,
)
from camden_spark.functions.substr import (
    longest_common_substring,
    rolling_hashes,
    winnow_fingerprints,
)
from camden_spark import oracle


def test_shingles_deterministic_and_distinct():
    texts = pd.Series(["a b c d e f g", "a b c d e f g", "x y z"])
    s1 = shingle_hashes_np(texts, 5)
    s2 = shingle_hashes_np(texts, 5)
    assert all(np.array_equal(a, b) for a, b in zip(s1, s2))
    assert np.array_equal(s1[0], s1[1])
    assert len(np.intersect1d(s1[0], s1[2])) == 0
    # 7 tokens, k=5 → 3 shingles
    assert len(s1[0]) == 3


def test_shingles_short_and_empty():
    s = shingle_hashes_np(pd.Series(["a b", "", None]), 5)
    assert len(s[0]) == 1  # shorter than k → single shingle
    assert len(s[1]) == 0
    assert len(s[2]) == 0


def test_minhash_estimates_jaccard():
    rng = np.random.RandomState(0)
    vocab = [f"w{i}" for i in range(500)]
    base = [vocab[i] for i in rng.randint(0, 500, 300)]
    edited = list(base)
    for p in rng.choice(300, 6, replace=False):
        edited[p] = vocab[rng.randint(0, 500)]
    texts = pd.Series([" ".join(base), " ".join(edited)])
    sh = shingle_hashes_np(texts, 5)
    true_j = oracle.jaccard(set(sh[0].tolist()), set(sh[1].tolist()))
    sig = minhash_signatures_np(sh, 256, 42)
    est = float((sig[0] == sig[1]).mean())
    assert abs(est - true_j) < 0.12
    # identical → identical signatures
    sig2 = minhash_signatures_np([sh[0], sh[0]], 256, 42)
    assert np.array_equal(sig2[0], sig2[1])


def test_minhash_int64_safe():
    sh = shingle_hashes_np(pd.Series(["a b c d e f g h i j"]), 5)
    sig = minhash_signatures_np(sh, 64, 42)
    assert sig.max() < np.uint64(1 << 63)


def test_simhash_near_for_perturbed_text():
    rng = np.random.RandomState(1)
    vocab = [f"w{i}" for i in range(500)]
    base = " ".join(vocab[i] for i in rng.randint(0, 500, 400))
    toks = base.split()
    toks[5] = "zzz"
    near = " ".join(toks)
    far = " ".join(vocab[i] for i in rng.randint(0, 500, 400))
    sh = shingle_hashes_np(pd.Series([base, near, far]), 5)
    sims = simhash_np(sh)
    d_near = hamming64_np(sims[0:1], sims[1:2])[0]
    d_far = hamming64_np(sims[0:1], sims[2:3])[0]
    assert d_near < d_far
    assert hamming64_np(sims[0:1], sims[0:1])[0] == 0


def test_rolling_hash_window_equality():
    h = rolling_hashes(b"abcabcabc", 3)
    assert h[0] == h[3] == h[6]
    assert h[0] != h[1]
    assert len(h) == 7


def test_winnowing_guarantee():
    a = "x" * 0 + "the shared span of text that is long enough to matter " * 4
    fa = winnow_fingerprints("PREFIX " + a + " SUF1", 20, 15)
    fb = winnow_fingerprints("OTHER " + a + " SUF2", 20, 15)
    assert len(np.intersect1d(fa, fb)) > 0
    fc = winnow_fingerprints("completely different content with no overlap at all", 20, 15)
    assert len(np.intersect1d(fa, fc)) == 0


@pytest.mark.parametrize(
    "a,b,expected",
    [
        ("abcdef", "abcdef", 6),
        ("abcdef", "xyzuvw", 0),
        ("", "abc", 0),
        ("hello world foo", "say hello world bar", len("hello world ")),
    ],
)
def test_lcs_suffix_array(a, b, expected):
    assert longest_common_substring(a, b) == expected


def test_lcs_matches_difflib_fuzz():
    from difflib import SequenceMatcher

    rng = np.random.RandomState(7)
    alpha = "abcd "
    for _ in range(20):
        a = "".join(alpha[i] for i in rng.randint(0, len(alpha), 80))
        b = "".join(alpha[i] for i in rng.randint(0, len(alpha), 80))
        m = SequenceMatcher(None, a, b, autojunk=False).find_longest_match(
            0, len(a), 0, len(b)
        )
        assert longest_common_substring(a, b) == m.size


def test_batch_shingles_match_per_doc():
    """Flat batch kernel ≡ naive per-doc shingling (strings → sets)."""
    from camden_spark.functions.hashing import batch_shingle_hashes

    rng = np.random.RandomState(11)
    vocab = [f"w{i}" for i in range(200)]
    texts = [
        " ".join(vocab[i] for i in rng.randint(0, 200, rng.randint(0, 30)))
        for _ in range(100)
    ] + ["", "a b", "a b c d e f g"]
    flat, counts = batch_shingle_hashes(pd.Series(texts), 5)
    assert int(counts.sum()) == flat.shape[0]
    pos = 0
    for t, cnt in zip(texts, counts):
        got = flat[pos : pos + cnt]
        pos += cnt
        toks = t.split()
        if not toks:
            assert cnt == 0
            continue
        expected_n = len(oracle.shingle_set(t, 5))
        assert cnt == expected_n, t
        # within-doc sorted & distinct
        assert np.all(np.diff(got.astype(np.uint64)) > 0) or cnt <= 1
    # same shingle text in different docs → same hash
    f2, c2 = batch_shingle_hashes(pd.Series(["a b c d e", "x a b c d e y"]), 5)
    d0, d1 = f2[: c2[0]], f2[c2[0] :]
    assert len(np.intersect1d(d0, d1)) == 1


def test_batch_winnow_matches_per_doc():
    from camden_spark.functions.substr import batch_winnow

    rng = np.random.RandomState(12)
    vocab = [f"tok{i}" for i in range(500)]
    texts = [
        " ".join(vocab[i] for i in rng.randint(0, 500, rng.randint(0, 80)))
        for _ in range(60)
    ] + ["", "tiny", "z" * 49, "z" * 50, "q" * 300]
    flat, counts = batch_winnow(pd.Series(texts), 50, 40)
    pos = 0
    for t, cnt in zip(texts, counts):
        single = np.unique(winnow_fingerprints(t, 50, 40))
        got = np.sort(flat[pos : pos + cnt].astype(np.uint64))
        pos += cnt
        assert np.array_equal(single, got), (len(t), cnt, len(single))


def test_batch_winnow_newline_doc_still_fingerprints():
    """A long doc whose in-text newlines (collapse_whitespace=False path)
    mask every complete w-window must still produce fingerprints via the
    valid-g-window fallback — byte-length classification would give it ZERO
    fingerprints and silently exempt it from the substring pass."""
    import pandas as pd

    from camden_spark.functions.substr import batch_winnow

    g, w = 8, 10  # span = 17
    # 8 lines of 12 chars: byte length 103 >= span, but every 17-byte window
    # crosses a newline; each line still holds 5 valid g-windows
    doc = "\n".join(f"line{i:02d}abcdef" for i in range(8))
    assert len(doc.encode()) >= g + w - 1
    flat, counts = batch_winnow(pd.Series([doc, "x" * 40]), g, w)
    assert counts[0] > 0, "newline-masked doc lost all fingerprints"
    assert counts[1] > 0
    # and a clean short doc (the old byte-length class) still fingerprints
    flat2, counts2 = batch_winnow(pd.Series(["y" * 20]), g, w)
    assert counts2[0] == 1  # single min over its valid g-hashes


def test_batch_winnow_non_ascii_matches_per_doc():
    """Byte-vs-char offsets: multi-byte UTF-8 docs must produce the same
    fingerprints batched as per-doc (doc extents are byte-space; char-space
    offsets would read the wrong hash segments and misclassify short docs)."""
    from camden_spark.functions.substr import batch_winnow

    rng = np.random.RandomState(7)
    vocab = ["münchen", "straße", "日本語", "données", "café", "niño", "ascii"]
    texts = [
        " ".join(vocab[i] for i in rng.randint(0, len(vocab), rng.randint(0, 60)))
        for _ in range(40)
    ] + [
        "é" * 30,          # 60 bytes, 30 chars: short in chars, long in bytes
        "日" * 20,          # 60 bytes
        "ü" * 25,          # 50 bytes — exactly g
        "日本語" * 40,       # long multi-byte doc
        "",
    ]
    flat, counts = batch_winnow(pd.Series(texts), 50, 40)
    assert counts.sum() == flat.shape[0]
    pos = 0
    for t, cnt in zip(texts, counts):
        single = np.unique(winnow_fingerprints(t, 50, 40))
        got = np.sort(flat[pos : pos + cnt].astype(np.uint64))
        pos += cnt
        assert np.array_equal(single, got), (t[:20], len(t), cnt, len(single))


def test_rolling_hash_screen_agrees_with_lcs():
    """The O(n) has_common_substring screen (used memoized inside
    verify_pairs_substr) must never reject a pair whose true LCS meets the
    threshold, and in practice accepts none below it (hash collisions are
    the only false-positive source; none at these sizes)."""
    from camden_spark.functions.substr import (
        has_common_substring,
        longest_common_substring,
    )

    rng = np.random.RandomState(7)
    alpha = "abcdefghijklmnopqrstuvwxyz"
    for trial in range(30):
        core = "".join(rng.choice(list(alpha), size=rng.randint(5, 60)))
        a = "".join(rng.choice(list(alpha), size=rng.randint(0, 40))) + core
        b = core + "".join(rng.choice(list(alpha), size=rng.randint(0, 40)))
        lcs = longest_common_substring(a, b)
        for L in (1, 5, lcs, lcs + 1, lcs + 10):
            got = has_common_substring(a.encode(), b.encode(), L)
            assert got == (0 < L <= lcs), (a, b, L, lcs)
