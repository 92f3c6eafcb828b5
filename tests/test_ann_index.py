"""Persisted CDC-maintained ANN index (operators/annindex.py): the
similarity twin of the durable near-dup loop — IVF assignment + int8
codes in one frame-discriminated txlog table, folded per txlog_cdc
batch, served bit-identically to the in-memory form."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from meteomatics_e2e_data_pipeline_spark.operators import annindex, similarity
from meteomatics_e2e_data_pipeline_spark.operators.txlog import TxTable


def _ms(df):
    return Counter(
        tuple(tuple(v) if isinstance(v, list) else v for v in r)
        for r in df.collect())


def test_cdc_maintained_ann_index_equals_rebuild_and_serves_exactly(
        spark, sf_oracle, tmp_path):
    """After an append, an updating MERGE, and a keyed DELETE on the
    embeddings table, the maintained assign/codes frames are multiset-
    EQUAL to a from-scratch init over the live snapshot (same
    centroids), a replayed pass publishes nothing, and knn_ivf served
    from the table hash-matches the in-memory knn_ivf."""
    emb = (spark.read.parquet(f"{sf_oracle}/embeddings.parquet")
           .select("vec_id", "embedding"))
    base = emb.filter(F.col("vec_id") < 300)
    extra = emb.filter(F.col("vec_id").between(300, 379))
    centroids = (emb.filter(F.col("vec_id") < 8)
                 .select(F.col("vec_id").alias("centroid_id"),
                         "embedding").localCheckpoint(eager=True))

    src = TxTable.create(spark, base.coalesce(2),
                         str(tmp_path / "emb"), stat_cols=["vec_id"])  # v0
    ck, sp = str(tmp_path / "ck"), str(tmp_path / "ann")

    # bootstrap + catch-up over: append, updating merge, keyed delete
    src.append(extra.coalesce(1))                                      # v1
    src.merge_upsert(
        base.filter(F.col("vec_id") < 10)
        .select("vec_id", F.reverse(F.col("embedding"))
                .alias("embedding")),
        ["vec_id"], update=True)                                       # v2
    src.delete(spark.createDataFrame([(42,), (301,)], "vec_id long"),
               ["vec_id"])                                             # v3
    st = annindex.stream_cdc_ann_maintenance(spark, src.path, ck, sp,
                                             centroids=centroids)
    v_done = st.version

    def check_equal_to_rebuild():
        live = src.read().select("vec_id", "embedding")
        got = annindex.ann_frames(st)
        want_assign = similarity.ivf_assign(live, centroids)
        want_codes = similarity.quantize_int8(live)
        assert _ms(got["assign"]) == _ms(want_assign.select(
            "vec_id", "embedding", "bucket"))
        assert _ms(got["codes"]) == _ms(want_codes.select(
            "vec_id", "scale", "q"))
        assert _ms(got["centroids"]) == _ms(centroids)

    check_equal_to_rebuild()

    # a second pass with nothing new publishes NOTHING (txn + offsets)
    st2 = annindex.stream_cdc_ann_maintenance(spark, src.path, ck, sp)
    assert st2.version == v_done

    # relay: one more commit folds only the new window
    src.append(emb.filter(F.col("vec_id").between(380, 399))
               .coalesce(1))                                           # v4
    st = annindex.stream_cdc_ann_maintenance(spark, src.path, ck, sp)
    assert st.version == v_done + 1
    check_equal_to_rebuild()

    # serving from the persisted index == the in-memory form, at
    # nprobe=1 and at the multiprobe recall setting
    live = src.read().select("vec_id", "embedding")
    queries = live.filter(F.col("vec_id").between(100, 110))
    for nprobe in (1, 2):
        served = annindex.knn_ivf_from_index(st, queries, 5,
                                             nprobe=nprobe)
        mem = similarity.knn_ivf(live, queries, centroids, 5,
                                 nprobe=nprobe)
        assert _ms(served) == _ms(mem)

    # the packed schema is the declared contract
    from pyspark.sql.types import StructType
    assert st.schema() == StructType.fromDDL(annindex._ANN_STATE_SCHEMA)
