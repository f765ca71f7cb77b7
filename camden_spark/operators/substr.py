"""Substring-overlap candidate pass (north rule F5).

Stage layout:

1. **Fingerprint** — vectorized pandas UDF adds a ``fingerprints`` column of
   winnowed rolling-hash values (functions/substr.py).  Arrow batches only.
2. **Candidate join** — explode fingerprints, equi-self-join on the value
   (same mega-group capping + explicit repartition as the LSH band join).
3. **Verify** — ``applyInPandas`` over candidate pairs computes the TRUE
   longest common substring with the suffix-array + Kasai LCP kernel; pairs
   with overlap ≥ cfg.min_overlap_chars survive.  Runs ONLY on candidate
   pairs, never globally — the suffix array sees O(pair text) bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from camden_spark.config import DedupConfig
from camden_spark.functions.substr import (
    longest_common_substring,
    winnow_fingerprints,
)


def with_fingerprints(
    pages: DataFrame, cfg: DedupConfig | None = None, text_col: str = "norm_text"
) -> DataFrame:
    """Add ``fingerprints: array<long>`` (winnowed substring fingerprints)."""
    cfg = cfg or DedupConfig()
    g, w = cfg.substr_ngram, cfg.substr_window

    @F.pandas_udf(ArrayType(LongType()))
    def fp_udf(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for texts in it:
            yield pd.Series(
                [
                    winnow_fingerprints(t if isinstance(t, str) else "", g, w)
                    .view(np.int64)
                    for t in texts
                ]
            )

    return pages.withColumn("fingerprints", fp_udf(F.col(text_col)))


def candidate_pairs_substr(
    fp: DataFrame, cfg: DedupConfig | None = None
) -> tuple[DataFrame, DataFrame]:
    """Fingerprint-equality candidate pairs (url_a < url_b) + metrics row."""
    cfg = cfg or DedupConfig()
    exploded = fp.select("url", F.explode("fingerprints").alias("fp"))
    sized = exploded.groupBy("fp").agg(F.count("*").alias("group_size"))
    metrics = sized.agg(
        F.count("*").cast("long").alias("fingerprints_total"),
        F.sum(
            (F.col("group_size") > cfg.max_fingerprint_group).cast("long")
        ).alias("fingerprints_dropped"),
    )
    keep = sized.filter(
        (F.col("group_size") > 1)
        & (F.col("group_size") <= cfg.max_fingerprint_group)
    ).select("fp")
    joinable = exploded.join(keep, "fp", "left_semi").repartition(
        cfg.band_partitions, "fp"
    )
    left, right = joinable.alias("l"), joinable.alias("r")
    pairs = (
        left.join(
            right,
            on=[
                F.col("l.fp") == F.col("r.fp"),
                F.col("l.url") < F.col("r.url"),
            ],
        )
        .select(F.col("l.url").alias("url_a"), F.col("r.url").alias("url_b"))
        .dropDuplicates(["url_a", "url_b"])
    )
    return pairs, metrics


_VERIFY_SCHEMA = StructType(
    [
        StructField("url_a", StringType(), False),
        StructField("url_b", StringType(), False),
        StructField("overlap_chars", LongType(), False),
    ]
)


def verify_pairs_substr(
    pairs: DataFrame,
    pages: DataFrame,
    cfg: DedupConfig | None = None,
    text_col: str = "norm_text",
) -> DataFrame:
    """Suffix-array LCS verification of candidate pairs.

    Texts are joined in (two shuffle joins on url), then pairs are spread
    across partitions by pair hash and verified batch-wise with
    ``mapInPandas`` — each Arrow batch loops pairs in numpy-backed suffix-array
    code (no global structure, memory bounded by batch).
    """
    cfg = cfg or DedupConfig()
    texts = pages.select("url", F.col(text_col).alias("_t"))
    a = texts.select(F.col("url").alias("url_a"), F.col("_t").alias("text_a"))
    b = texts.select(F.col("url").alias("url_b"), F.col("_t").alias("text_b"))
    joined = (
        pairs.join(a, "url_a")
        .join(b, "url_b")
        .repartition(cfg.band_partitions, "url_a", "url_b")
    )
    min_overlap = cfg.min_overlap_chars
    min_frac = cfg.min_overlap_frac

    def verify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            lens, fracs = [], []
            for ta, tb in zip(pdf["text_a"], pdf["text_b"]):
                ta, tb = ta or "", tb or ""
                lcs = longest_common_substring(ta, tb)
                shorter = min(len(ta.encode()), len(tb.encode()))
                lens.append(lcs)
                fracs.append(lcs / shorter if shorter else 0.0)
            out = pd.DataFrame(
                {
                    "url_a": pdf["url_a"],
                    "url_b": pdf["url_b"],
                    "overlap_chars": pd.array(lens, dtype="int64"),
                    "_frac": fracs,
                }
            )
            yield out.loc[
                (out["overlap_chars"] >= min_overlap) & (out["_frac"] >= min_frac),
                ["url_a", "url_b", "overlap_chars"],
            ]

    return joined.mapInPandas(verify, schema=_VERIFY_SCHEMA)
