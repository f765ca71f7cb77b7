"""JVM-builtin signature backend (functions/jvm_sig.py): parity with the
Arrow kernel on shingle-set semantics, determinism, and full-pipeline recall.

The two backends use different hash families (xxhash64/mod-p vs the numpy
polynomial/mod-2^64 kernel), so signature VALUES differ by design; what must
match exactly is the shingle-set semantics — the distinct k-token windows —
which both Jaccard values and n_shingles counts witness.
"""

from __future__ import annotations

import itertools

import pyspark.sql.functions as F
import pytest

from camden_spark.config import DedupConfig
from camden_spark.functions.jvm_sig import (
    with_shingles_jvm,
    with_signatures_jvm,
)
from camden_spark.functions.shingles import with_shingles, with_signatures
from camden_spark.plans.pipeline import DedupPipeline
from camden_spark.sources.pages import normalize_pages
from camden_spark import oracle

CFG = DedupConfig(sig_backend="jvm")


@pytest.fixture(scope="module")
def norm_df(spark, pages_df):
    df = normalize_pages(pages_df).select("url", "norm_text")
    df.cache().count()
    return df


def test_n_shingles_parity_with_arrow(norm_df):
    """Both backends count the same DISTINCT k-token windows per doc."""
    jvm = {
        r["url"]: r["n_shingles"]
        for r in with_signatures_jvm(norm_df, CFG).collect()
    }
    arrow = {
        r["url"]: r["n_shingles"]
        for r in with_signatures(norm_df, CFG, include_shingles=False)
        .select("url", "n_shingles")
        .collect()
    }
    arrow_nonzero = {u: n for u, n in arrow.items() if n > 0}
    assert jvm == arrow_nonzero


def test_jaccard_parity_with_arrow(norm_df):
    """Exact shingle-set Jaccard is identical across backends for every pair
    (the hash families differ but the SETS they fingerprint are the same)."""
    sub = norm_df.limit(120)
    sh_j = {r["url"]: set(r["shingles"]) for r in with_shingles_jvm(sub, CFG).collect()}
    sh_a = {r["url"]: set(r["shingles"]) for r in with_shingles(sub, CFG).collect()}

    def jac(sets, ua, ub):
        union = sets[ua] | sets[ub]
        return len(sets[ua] & sets[ub]) / len(union) if union else 0.0

    urls = sorted(sh_j)
    for ua, ub in itertools.combinations(urls[:60], 2):
        assert jac(sh_j, ua, ub) == pytest.approx(jac(sh_a, ua, ub), abs=0)


def test_jvm_signatures_deterministic_and_partition_invariant(norm_df):
    a = with_signatures_jvm(norm_df, CFG).collect()
    b = with_signatures_jvm(norm_df.repartition(7), CFG).collect()
    key = lambda r: (r["url"], tuple(r["minhash"]), r["simhash"])
    assert sorted(map(key, a)) == sorted(map(key, b))
    row = a[0]
    assert len(row["minhash"]) == CFG.minhash_perms
    assert all(0 <= v < (1 << 31) - 1 for v in row["minhash"])


def test_jvm_short_and_empty_docs(spark):
    """<k tokens → ONE shingle over all tokens; empty/whitespace → excluded."""
    df = spark.createDataFrame(
        [("a", "one two"), ("b", ""), ("c", "x y z w v u")],
        ["url", "norm_text"],
    )
    rows = {r["url"]: r for r in with_signatures_jvm(df, CFG).collect()}
    assert set(rows) == {"a", "c"}
    assert rows["a"]["n_shingles"] == 1
    assert rows["c"]["n_shingles"] == 2  # 6 tokens, k=5 → 2 windows
    sh = {r["url"]: r["shingles"] for r in with_shingles_jvm(df, CFG).collect()}
    assert sh["b"] == []
    assert len(sh["a"]) == 1


@pytest.mark.parametrize("backend", ["jvm", "arrow"])
def test_pipeline_recall_both_backends(spark, pages_df, corpus, backend):
    """Full pipeline meets the north rule's dup-pair recall ≥ 0.99 against
    planted ground truth on BOTH signature backends (the default-backend run
    is also covered by test_near_dup.test_full_pipeline_recall)."""
    result = DedupPipeline(cfg=DedupConfig(sig_backend=backend)).run(pages_df)
    labels = {r["url"]: r["cluster_id"] for r in result.clusters.collect()}
    truth = corpus.true_pairs()
    hit = sum(1 for a, b in truth if labels[a] == labels[b])
    recall = hit / len(truth)
    result.release()
    assert recall >= 0.99, f"{backend}-backend pipeline dup-pair recall {recall}"
