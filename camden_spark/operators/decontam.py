"""Cross-corpus decontamination — flag training docs that leak evaluation
(benchmark) content, the standard pre-training hygiene step (remove test-set
text from the training corpus before it poisons the benchmark).

Semantics: a corpus doc is contaminated by a benchmark doc when it contains
at least ``min_containment`` of the benchmark doc's distinct word-n-gram
shingles (containment = |A ∩ B| / |B| — the right metric when the corpus
doc may be much longer than the benchmark snippet; Jaccard is reported
alongside).

Scale shape — INVERTED INDEX, never corpus × benchmark pairs:

* the benchmark side is tiny by nature (an eval set), so its exploded
  (shingle → bench_id) index **broadcasts under AQE's measured-size rule**
  — no hard-coded hint: a million-row eval suite whose exploded index
  exceeds executor memory flips to a shuffled join instead of OOMing
  (same de-hinting as ``dedup_incremental`` / ``ivf_topk``, with the same
  plan-flip test in tests/test_plans.py);
* the corpus side streams through one ``explode`` → broadcast hash join →
  partial-aggregated ``groupBy(doc_id, bench_id)``, i.e. ONE shuffle whose
  key space is only the docs that share ≥ 1 shingle with some benchmark
  doc (sparse);
* per-doc shingle counts ride along the exploded rows (``first(na)``)
  instead of a second join back to the corpus.

Reference parity: this generalizes the reference's duplicate-detection
dataflow (scan → hash → group → filter, src/main.rs:13-56) to a
two-corpus setting; the shingle semantics are exactly the engine's
word-5-gram kernel (entry_queries._word_5gram_shingles).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    *,
    corpus_id: str = "doc_id",
    bench_id: str = "bench_id",
    shingles_col: str = "shingles",
    min_containment: float = 0.5,
) -> DataFrame:
    """(corpus_id, bench_id, inter, containment, jaccard) for every corpus
    doc holding ≥ ``min_containment`` of a benchmark doc's shingles.

    Both inputs carry an id column and a pre-built DISTINCT-shingle array
    column (build with the same shingler on both sides, or containment is
    meaningless).  Filter compares the UNROUNDED ratio; the emitted ratios
    are rounded to 6 places for cross-engine comparability.
    """
    grams_a = corpus.select(
        F.col(corpus_id),
        F.size(shingles_col).alias("na"),
        F.explode(shingles_col).alias("g"),
    )
    grams_b = benchmark.select(
        F.col(bench_id),
        F.size(shingles_col).alias("nb"),
        F.explode(shingles_col).alias("g"),
    )
    inter = F.count(F.lit(1))
    hits = (
        grams_a.join(grams_b, "g")
        .groupBy(corpus_id, bench_id)
        .agg(
            F.first("na").alias("na"),
            F.first("nb").alias("nb"),
            inter.alias("inter"),
        )
    )
    containment = F.col("inter").cast("double") / F.col("nb").cast("double")
    jaccard = F.col("inter").cast("double") / (
        F.col("na") + F.col("nb") - F.col("inter")
    ).cast("double")
    return (
        hits.filter(containment >= F.lit(min_containment))
        .select(
            corpus_id,
            bench_id,
            F.col("inter").cast("long").alias("inter"),
            F.round(containment, 6).alias("containment"),
            F.round(jaccard, 6).alias("jaccard"),
        )
    )
