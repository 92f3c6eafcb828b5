"""Volume stress test of the LLM dedup/similarity family (opt-in: set
SPARK_GRAFT_STRESS=1). Blows the sf0.1 documents corpus up 10× (50k docs
with re-keyed ids, each replica slightly perturbed so replicas are
near- but not exact duplicates of the original), then runs the three
near-dup paths and asserts the invariants the small tests check — shape
and boundedness at volume, not just the sample size."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from meteomatics_e2e_data_pipeline_spark.operators import neardup
from meteomatics_e2e_data_pipeline_spark.sources.tables import load_table

pytestmark = pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_STRESS") != "1",
    reason="stress test; set SPARK_GRAFT_STRESS=1 to run")

REPLICAS = 10


def _blowup(spark):
    docs = load_table(spark, "/root/testdata/sf0.1", "documents")
    n = docs.count()
    parts = []
    for r in range(REPLICAS):
        suffix = F.lit("") if r == 0 else F.lit(f" replica{r}")
        parts.append(docs.select(
            (F.col("doc_id") + r * n).alias("doc_id"),
            F.concat(F.col("text"), suffix).alias("text")))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out, n


def test_near_dup_family_at_volume(spark):
    docs, n = _blowup(spark)
    assert docs.count() == REPLICAS * n

    t0 = time.time()
    pairs = neardup.near_dup_pairs(docs, threshold=0.5)
    n_pairs = pairs.count()
    t_lsh = time.time() - t0
    # every replica pair of the same base doc shares all but the last
    # shingles → Jaccard near 1; the family count must scale ~quadratic
    # in replicas per base doc, and the run must stay minutes, not hours
    assert n_pairs >= n * (REPLICAS * (REPLICAS - 1)) // 4
    assert t_lsh < 600

    t0 = time.time()
    sh_pairs = neardup.simhash_pairs(docs)
    n_sh = sh_pairs.count()
    t_sh = time.time() - t0
    assert n_sh > 0 and t_sh < 600

    # jaccard prefix join at a high threshold: the exact path must agree
    # with LSH on the high-similarity tail it is guaranteed to recall
    t0 = time.time()
    exact = neardup.jaccard_prefix_pairs(docs, threshold=0.9)
    n_exact = exact.count()
    t_ex = time.time() - t0
    high_lsh = pairs.filter(F.col("jaccard") >= 0.9).count()
    assert n_exact >= high_lsh          # exact ⊇ any sketch's findings
    assert t_ex < 600
    print(f"stress: {REPLICAS * n} docs, lsh {n_pairs} pairs {t_lsh:.1f}s, "
          f"simhash {n_sh} pairs {t_sh:.1f}s, exact@0.9 {n_exact} {t_ex:.1f}s")
