"""JVM-only signature stage: shingles, MinHash, SimHash with zero python
workers (north rule F1/F2 + G, reference semantics src/scanner.rs:81-95
generalized; the Arrow-UDF twin lives in functions/shingles.py).

Why this exists: the measured 2→8-core scaling miss (BENCH/BASELINE.md,
round 3) decomposes into 1.63x task-time inflation from JVM↔python-worker
Arrow socket traffic in the signature stage.  This module removes the python
worker from the hot path entirely — every expression below is a Catalyst
builtin, so the stage stays inside whole-stage codegen.

Design notes (each the result of a measured failure mode):

* **No per-row higher-order functions in the O(corpus·perms) loop.**  HOFs
  (``transform``/``aggregate``) are CodegenFallback — interpreted, ~100ns per
  element — so 128 permutations x ~300 shingles per doc would cost
  milliseconds/doc.  Instead the per-doc shingle SET is exploded to rows and
  the 128 minimum slots + 64 SimHash bit counts are computed by ONE codegen
  HashAggregate (mod-arithmetic permutations, ~cheap ALU ops per row).
* **The exchange this introduces carries exactly the signature bytes** (one
  partially-aggregated row per url — explode keeps a doc's shingles inside
  one partition, so map-side partial aggregation completes per url before
  the shuffle).  That is the same order of bytes as the band-explode shuffle
  immediately downstream, so the extra exchange does not change the
  pipeline's asymptotic shuffle profile at 10^12 docs — unlike the Arrow
  path it replaces, whose loopback-socket traffic was the measured scaling
  bottleneck on co-located workers.
* **Let-binding via single-element ``transform``**: projection collapse
  inlines array-building expressions into consumer lambdas where CSE cannot
  reach (the documented O(n²) blowup, entry_queries.py) — ``split`` would
  re-tokenize the whole doc once per shingle window.  Wrapping the tokens
  array as ``transform(array(tokens_expr), toks -> ...)`` makes Catalyst
  evaluate ``tokens_expr`` exactly once per row regardless of optimizer
  rewrites, because the lambda variable is bound, not substituted.
* **ANSI-safe permutation family**: Spark 4 runs ANSI mode, where signed-64
  multiply overflow throws.  The permutation is the classic universal family
  ``(a*x + b) mod p`` over p = 2^31 - 1 with a < 2^30 (same family and
  bounds as functions/hashing.small_minhash_params, which the driver-green
  ``minhash_signatures_bounded`` query hash-verifies): every intermediate
  stays below 2^61 + 2^31, provably inside signed-64.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from camden_spark.config import DedupConfig
from camden_spark.functions.hashing import SQL_MINHASH_P, small_minhash_params


def shingle_set_expr(text_col: Column, k: int) -> Column:
    """array<long> of DISTINCT shingle hashes for a single-space-normalized
    text column — pure builtins, one pass per row.

    Shingle hash = xxhash64 over the k-token string slice (Spark's builtin
    XXH64 accepts array<string>, hashing each element's bytes in order), so
    shingles never materialize concatenated strings.  Semantics mirror the
    Arrow kernel (functions/hashing.batch_shingle_hashes): k-token windows
    that do not cross docs; docs with 1..k-1 tokens yield ONE shingle over
    all their tokens; empty docs yield an empty array.
    """
    toks = F.split(text_col, " ")
    # let-bind: evaluate `toks` once per row no matter how Catalyst collapses
    # projections (see module docstring).
    return F.get(
        F.transform(
            F.array(
                F.when(F.length(text_col) > 0, toks).otherwise(
                    F.array().cast("array<string>")
                )
            ),
            lambda t: F.when(F.size(t) == 0, F.array().cast("array<long>"))
            .otherwise(
                F.array_distinct(
                    F.transform(
                        F.sequence(
                            F.lit(1),
                            F.greatest(F.size(t) - (k - 1), F.lit(1)),
                        ),
                        lambda i: F.xxhash64(
                            F.slice(t, i, F.least(F.lit(k), F.size(t)))
                        ),
                    )
                )
            ),
        ),
        F.lit(0),
    )


def _minhash_aggs(cfg: DedupConfig) -> list[Column]:
    """128 codegen min-slots over the exploded shingle rows.

    Permutation j over shingle hash s: min((a_j * (s mod p) + b_j) mod p),
    p = 2^31 - 1.  ``sp`` (= pmod(s, p)) is precomputed in the explode
    projection so the 128 slots share it.
    """
    a, b = small_minhash_params(cfg.minhash_perms, cfg.minhash_seed)
    p = F.lit(SQL_MINHASH_P)
    return [
        F.min((F.lit(int(a[j])) * F.col("sp") + F.lit(int(b[j]))) % p).alias(
            f"mh{j}"
        )
        for j in range(cfg.minhash_perms)
    ]


def _simhash_bit_aggs() -> list[Column]:
    """64 bit-count sums over the exploded shingle hashes (majority vote is
    applied per doc after the aggregate)."""
    return [
        F.sum(
            F.shiftrightunsigned(F.col("s"), bit).bitwiseAND(F.lit(1)).cast(
                "long"
            )
        ).alias(f"sb{bit}")
        for bit in range(64)
    ]


def _simhash_from_bits(n_col: Column) -> Column:
    """Fold the 64 majority votes into one long — bitwiseOR chain (no
    arithmetic, so bit 63 needs no overflow care)."""
    out = F.lit(0).cast("long")
    for bit in range(64):
        vote = F.when(
            F.lit(2) * F.col(f"sb{bit}") >= n_col,
            F.shiftleft(F.lit(1).cast("long"), bit),
        ).otherwise(F.lit(0).cast("long"))
        out = out.bitwiseOR(vote)
    return out


def with_signatures_jvm(
    pages: DataFrame,
    cfg: DedupConfig | None = None,
    text_col: str = "norm_text",
) -> DataFrame:
    """(url, n_shingles, minhash array<long>, simhash long) for every doc
    with at least one shingle — all JVM builtins, no python workers.

    Zero-shingle docs (empty/whitespace-only) do not appear in the output:
    they are excluded from every near-dup stage by policy (they cluster only
    via the exact stage), which downstream code expresses as a
    ``n_shingles > 0`` filter this function has already applied.

    MinHash values are from the (a*x+b) mod 2^31-1 family — the SAME family
    the driver-green ``minhash_signatures_bounded`` query verifies against
    DuckDB — over xxhash64 5-gram shingle hashes; SimHash is the standard
    per-bit majority over the same distinct-shingle set, mirroring the Arrow
    kernel's construction (functions/hashing.simhash_flat).
    """
    cfg = cfg or DedupConfig()
    exploded = pages.select(
        "url",
        F.explode(shingle_set_expr(F.col(text_col), cfg.shingle_k)).alias("s"),
    ).withColumn("sp", F.pmod(F.col("s"), F.lit(SQL_MINHASH_P)))
    agg = exploded.groupBy("url").agg(
        F.count("*").alias("n_shingles"),
        *_minhash_aggs(cfg),
        *_simhash_bit_aggs(),
    )
    return agg.select(
        "url",
        "n_shingles",
        F.array(*[F.col(f"mh{j}") for j in range(cfg.minhash_perms)]).alias(
            "minhash"
        ),
        _simhash_from_bits(F.col("n_shingles")).alias("simhash"),
    )


def with_shingles_jvm(
    pages: DataFrame,
    cfg: DedupConfig | None = None,
    text_col: str = "norm_text",
) -> DataFrame:
    """(url, shingles array<long>) — the JVM twin of with_shingles, used for
    exact-Jaccard candidate verification.  Interpreted HOF per row is fine
    here: this runs only on the few-% of docs that appear in candidate
    pairs, never corpus-wide."""
    cfg = cfg or DedupConfig()
    return pages.select(
        "url",
        shingle_set_expr(F.col(text_col), cfg.shingle_k).alias("shingles"),
    )
