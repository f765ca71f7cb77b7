"""Vectorized hashing kernels (pure numpy/pandas — no Spark imports).

These are the batch kernels the pandas UDFs in ``functions.shingles`` call.
All arithmetic is uint64 with silent wraparound (mod 2^64); token hashing uses
pandas' C-level ``hash_array`` (xxHash-style, keyed) pinned to an explicit
16-byte key so results are stable across processes, pandas versions, and the
driver/executor boundary — the determinism the reference never had (its group
order was thread-race-dependent, reference src/scanner.rs:62).

No per-row Python in the Spark hot path: callers pass whole Arrow batches and
everything here is O(batch) numpy.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from camden_spark.config import HASH_KEY

#: odd multiplier for the rolling shingle combine (splitmix64's constant)
_SHINGLE_MULT = np.uint64(0x9E3779B97F4A7C15)

#: sentinel signature value for docs with no shingles (empty/whitespace text);
#: int64-max so empty docs never collide with real signatures in LSH.
EMPTY_SLOT = np.uint64(0x7FFFFFFFFFFFFFFF)


def token_hashes(tokens: list[str]) -> np.ndarray:
    """uint64 hash per token, vectorized (one C call for the whole list)."""
    if not tokens:
        return np.empty(0, dtype=np.uint64)
    arr = np.asarray(tokens, dtype=object)
    return pd.util.hash_array(arr, hash_key=HASH_KEY, categorize=False)


def rolling_shingles(th: np.ndarray, k: int) -> np.ndarray:
    """Combine k consecutive token hashes into shingle hashes.

    sh[i] = Σ_j th[i+j] * M^(k-1-j)  (mod 2^64), i ∈ [0, n-k].
    Docs shorter than k tokens yield a single shingle over all tokens.
    """
    n = th.shape[0]
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    kk = min(k, n)
    out = th[: n - kk + 1].copy()
    for j in range(1, kk):
        out *= _SHINGLE_MULT
        out += th[j : n - kk + 1 + j]
    return out


def shingle_hashes_np(texts: "pd.Series[str]", k: int = 5) -> list[np.ndarray]:
    """Per-doc arrays of DISTINCT shingle hashes for a batch of texts.

    Tokenizes (whitespace split of pre-normalized text), hashes all tokens of
    the batch in ONE ``hash_array`` call, then rolls k-grams per doc.
    """
    token_lists = [t.split() if isinstance(t, str) else [] for t in texts]
    lens = np.fromiter((len(tl) for tl in token_lists), dtype=np.int64)
    flat: list[str] = [tok for tl in token_lists for tok in tl]
    all_hashes = token_hashes(flat)
    out: list[np.ndarray] = []
    pos = 0
    for n in lens:
        th = all_hashes[pos : pos + n]
        pos += n
        out.append(np.unique(rolling_shingles(th, k)))
    return out


def minhash_params(num_perms: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """(a, b) parameter vectors for the multiply-add hash family, a odd."""
    rng = np.random.RandomState(seed)
    a = rng.randint(1, 1 << 62, size=num_perms).astype(np.uint64) * np.uint64(2) + np.uint64(1)
    b = rng.randint(0, 1 << 62, size=num_perms).astype(np.uint64)
    return a, b


def minhash_signatures_np(
    shingle_arrays: list[np.ndarray], num_perms: int, seed: int
) -> np.ndarray:
    """(ndocs, num_perms) uint64 MinHash signatures.

    Vectorized across the whole batch: all docs' shingles are concatenated and
    each permutation's min is taken with ``np.minimum.reduceat`` over doc
    offsets — no per-doc Python beyond building offsets.  Permutations run in
    blocks to bound transient memory at ~(total_shingles * block * 8) bytes.
    """
    a, b = minhash_params(num_perms, seed)
    ndocs = len(shingle_arrays)
    sig = np.full((ndocs, num_perms), EMPTY_SLOT, dtype=np.uint64)
    sizes = np.fromiter((s.shape[0] for s in shingle_arrays), dtype=np.int64)
    nonempty = sizes > 0
    if not nonempty.any():
        return sig
    S = np.concatenate([s for s in shingle_arrays if s.shape[0] > 0])
    offsets = np.zeros(int(nonempty.sum()), dtype=np.int64)
    np.cumsum(sizes[nonempty][:-1], out=offsets[1:])
    block = max(1, min(num_perms, (1 << 24) // max(1, S.shape[0])))
    mins = np.empty((offsets.shape[0], num_perms), dtype=np.uint64)
    for lo in range(0, num_perms, block):
        hi = min(lo + block, num_perms)
        # (M, blk) hashed values mod 2^64, min per doc segment
        vals = S[:, None] * a[None, lo:hi] + b[None, lo:hi]
        mins[:, lo:hi] = np.minimum.reduceat(vals, offsets, axis=0)
    sig[nonempty] = mins
    # keep signatures in int64-safe range for Spark LongType round-trip
    sig >>= np.uint64(1)
    return sig


def simhash_np(shingle_arrays: list[np.ndarray]) -> np.ndarray:
    """(ndocs,) uint64 64-bit SimHash over shingle hashes (unit weights).

    bit b of the output is 1 iff ≥ half the doc's shingles have bit b set.
    Vectorized via unpackbits + add.reduceat over the concatenated batch.
    """
    ndocs = len(shingle_arrays)
    out = np.zeros(ndocs, dtype=np.uint64)
    sizes = np.fromiter((s.shape[0] for s in shingle_arrays), dtype=np.int64)
    nonempty = sizes > 0
    if not nonempty.any():
        return out
    S = np.concatenate([s for s in shingle_arrays if s.shape[0] > 0])
    offsets = np.zeros(int(nonempty.sum()), dtype=np.int64)
    np.cumsum(sizes[nonempty][:-1], out=offsets[1:])
    bits = np.unpackbits(S.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little")
    counts = np.add.reduceat(bits.astype(np.int64), offsets, axis=0)  # (nd, 64)
    majority = (2 * counts) >= sizes[nonempty][:, None]
    weights = (np.uint64(1) << np.arange(64, dtype=np.uint64))[None, :]
    out[nonempty] = np.where(majority, weights, np.uint64(0)).sum(
        axis=1, dtype=np.uint64
    )
    return out


def hamming64_np(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Element-wise Hamming distance between uint64 arrays."""
    x = np.bitwise_xor(a, b)
    bits = np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1)
    return bits.sum(axis=1)
