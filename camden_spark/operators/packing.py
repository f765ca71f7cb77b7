"""Sequence packing — assign documents to fixed-capacity training sequences
(context windows), the step between a deduped corpus and a token-budgeted
training run.

Deterministic NEXT-FIT discipline so the layout is reproducible (and
oracle-statable): docs are sharded by ``id % n_shards``, each shard packs
independently in id order, and a doc opens a new bin exactly when adding it
would overflow ``capacity``.  A doc longer than ``capacity`` still gets its
own bin (flagged via ``n_tokens > capacity`` downstream — packing never
drops rows).

Scale shape: ONE shuffle (groupBy shard), carrying only (id, n_tokens) —
16 bytes/doc, so even a 10⁶-doc shard group is ~16 MB in the pandas fold
(``applyInPandas`` materializes the group; the TEXT never enters this
shuffle — join the layout back to the corpus afterwards).  The fold itself
is inherently sequential — next-fit is a running reset-cumsum with no
closed form — so parallelism is governed entirely by ``n_shards``: at
100 TB you run 10⁵ shards, each an independent Arrow-batched pandas group.
Bin ids are globally unique as (shard, bin) pairs; no cross-shard
coordination exists by construction.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import LongType, StructField, StructType

PACKED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("shard", LongType(), False),
        StructField("bin", LongType(), False),
        StructField("pos", LongType(), False),
        StructField("n_tokens", LongType(), False),
    ]
)


def pack_sequences(
    docs: DataFrame,
    *,
    capacity: int,
    n_shards: int,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """(doc_id, shard, bin, pos, n_tokens): next-fit packing of ``docs``
    (id + token count columns) into bins of ``capacity`` tokens, sharded by
    ``id % n_shards``; ``pos`` is the doc's 0-based slot inside its bin."""
    cap = int(capacity)

    def fold(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            if not len(pdf):
                yield pd.DataFrame({f.name: [] for f in PACKED_SCHEMA.fields})
                continue
            pdf = pdf.sort_values(id_col, kind="stable")
            toks = pdf[tokens_col].to_numpy()
            bins = []
            poss = []
            b, p, fill = 0, 0, 0
            first = True
            for t in toks:
                t = int(t)
                if first:
                    first = False
                elif fill + t <= cap:
                    p += 1
                else:
                    b += 1
                    p = 0
                    fill = 0
                fill += t
                bins.append(b)
                poss.append(p)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64").to_numpy(),
                    "shard": pdf["shard"].astype("int64").to_numpy(),
                    "bin": pd.array(bins, dtype="int64"),
                    "pos": pd.array(poss, dtype="int64"),
                    "n_tokens": pdf[tokens_col].astype("int64").to_numpy(),
                }
            )

    sharded = docs.select(
        F.col(id_col),
        (F.col(id_col) % F.lit(int(n_shards))).cast("long").alias("shard"),
        F.col(tokens_col),
    )
    return sharded.groupBy("shard").applyInPandas(fold_wrapper(fold), PACKED_SCHEMA)


def fold_wrapper(fold):
    """applyInPandas hands each GROUP as one pdf (not an iterator); adapt the
    iterator-style fold so the sequential kernel is testable standalone."""

    def apply(pdf: pd.DataFrame) -> pd.DataFrame:
        return next(iter(fold(iter([pdf]))))

    return apply
