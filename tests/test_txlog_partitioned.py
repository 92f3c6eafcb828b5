"""Partition-aware txlog: hive ``key=value`` layouts as first-class
tables (the public Delta ``partitionValues`` add-action shape, reader
protocol 2). Coverage contract (VERDICT r12 directive #1):

- ``TxTable.convert`` ADOPTS the reference's own lake layout — the
  hive-partitioned directories the S5 writer produces
  (``sources/ingest.py write_partitioned_json`` / Spark ``partitionBy``,
  reference ``meteomatics_get_data.py:116-133``) — in one stats scan,
  zero data movement;
- snapshot reads apply partition pruning BEFORE stat pruning
  (``inputFiles()``-asserted);
- keyed DML (MERGE/DELETE/UPDATE/apply_changes) plans through
  ``partitionValues`` as exact stats and rewrites files back into
  their partitions;
- the CDC fold invariant holds across partitioned DML;
- exotic partition values (escapes, nulls, typed ints) round-trip.
"""

from __future__ import annotations

from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as hs
from pyspark.sql import functions as F

from meteomatics_e2e_data_pipeline_spark.operators.txlog import TxTable


def _lake_df(spark):
    return spark.createDataFrame(
        [("DE", 2021, i, i * 10) for i in range(6)]
        + [("EE", 2022, i, i * 10) for i in range(6, 12)],
        "country string, year int, k int, v int")


def _multiset(df):
    return Counter(map(tuple, df.collect()))


def _heavy_test_create_partitioned_prunes_and_dmls(spark, tmp_path):
    t = TxTable.create(spark, _lake_df(spark), str(tmp_path / "t"),
                       stat_cols=["k"], partition_cols=["country"])
    d = t.detail()
    assert d["partition_cols"] == ["country"]
    assert d["protocol"] == {"minReader": 2, "minWriter": 2}
    assert all("country=" in p for p in t.live_files())
    # log-side partition pruning: ONLY that country's files are planned
    de = t.read(partition_values={"country": "DE"})
    assert de.count() == 6
    assert de.inputFiles() and all("country=DE" in f
                                   for f in de.inputFiles())
    with pytest.raises(ValueError, match="not partitioned by"):
        t.read(partition_values={"k": 1})
    # keyed DML: partitionValues act as exact stats in the planner
    rk = t.read_keys(spark.createDataFrame([("EE", 7)],
                                           "country string, k int"),
                     ["country", "k"])
    assert rk.count() == 1
    assert all("country=EE" in f for f in rk.inputFiles())
    schema = "country string, year int, k int, v int"
    t.merge_upsert(spark.createDataFrame([("DE", 2021, 0, 111)], schema),
                   ["k"], update=True)
    assert t.read().filter("k = 0").collect()[0]["v"] == 111
    t.delete(spark.createDataFrame([(11,)], "k int"), ["k"])
    assert t.read().count() == 11
    # UPDATE keeps rows in their partitions; moving them is refused
    t.update("k = 1", {"v": "v + 1"})
    assert t.read().filter("k = 1").collect()[0]["v"] == 11
    with pytest.raises(ValueError, match="partition columns"):
        t.update("k = 1", {"country": "'FR'"})
    # rewrites landed back inside key=value dirs, never at the root
    assert all("country=" in p for p in t.live_files())
    audit = t.fsck(verify_row_counts=True)
    assert audit["ok"], audit


def _heavy_test_convert_adopts_spark_partitioned_lake(spark, tmp_path):
    """The flagship adoption story: a plain ``partitionBy`` lake — part
    numbers COLLIDE across partition dirs, which is why planners key
    files by relative path — becomes a txlog table in one stats scan,
    with every capability (pruned reads, DML, time travel, evolution,
    CDC) live on the adopted files."""
    lake = str(tmp_path / "lake")
    _lake_df(spark).repartition(4).write.partitionBy(
        "country", "year").parquet(lake)
    t = TxTable.convert(spark, lake, stat_cols=["k"])
    assert t.detail()["partition_cols"] == ["country", "year"]
    assert t.detail()["protocol"]["minReader"] == 2
    assert t.read().count() == 12
    # discovery typed the partition columns (year=2021 -> int)
    assert t.schema()["year"].dataType.typeName() == "integer"
    de = t.read(partition_values={"country": "DE"})
    assert de.count() == 6 and all("country=DE" in f
                                   for f in de.inputFiles())
    # DML on adopted files (zero were rewritten at convert time)
    before = set(t.live_files())
    schema = t.read().schema
    t.merge_upsert(
        spark.createDataFrame([(2021, 0, 111, "DE")],
                              "year int, k int, v int, country string")
        .select(*[f.name for f in schema.fields]), ["k"], update=True)
    assert t.read().filter("k = 0").collect()[0]["v"] == 111
    t.delete(spark.createDataFrame([(11,)], "k int"), ["k"])
    assert t.read().count() == 11
    # schema evolution null-fills adopted files
    extra = t.read().limit(0).sparkSession.createDataFrame(
        [(2023, 50, 500, "FR", "x")],
        "year int, k int, v int, country string, note string")
    t.append(extra, merge_schema=True)
    assert t.read().filter("k = 50").collect()[0]["note"] == "x"
    assert t.read(partition_values={"country": "FR"}).count() == 1
    # time travel back to the exact adopted state reads the ORIGINAL
    # files (adoption moved nothing; DML superseded, never destroyed)
    v0 = t.read(version=0)
    assert v0.count() == 12
    assert {f.rsplit(f"{lake}/", 1)[-1] for f in v0.inputFiles()} \
        == before
    audit = t.fsck(verify_row_counts=True)
    assert audit["ok"], audit


def _heavy_test_partitioned_cdc_fold_invariant_and_optimize(
        spark, tmp_path):
    t = TxTable.create(spark, _lake_df(spark), str(tmp_path / "t"),
                       stat_cols=["k"], partition_cols=["country"])
    schema = "country string, year int, k int, v int"
    t.append(spark.createDataFrame([("FR", 2023, 50, 500)], schema))
    t.merge_upsert(spark.createDataFrame([("EE", 2022, 7, 777)], schema),
                   ["k"], update=True)
    t.delete(spark.createDataFrame([(3,)], "k int"), ["k"])
    v_before = t.version
    # OPTIMIZE packs WITHIN partitions, layout-only
    t.optimize(target_rows=1000)
    assert all("country=" in p for p in t.live_files())
    assert t.read_changes(v_before).count() == 0  # compaction is silent
    for frm in range(t.version + 1):
        ch = t.read_changes(frm)
        ins = _multiset(ch.filter("_change_type = 'insert'")
                        .drop("_change_type"))
        dels = _multiset(ch.filter("_change_type = 'delete'")
                         .drop("_change_type"))
        assert _multiset(t.read(version=frm)) + ins - dels \
            == _multiset(t.read()), f"fold invariant broke at {frm}"


def _heavy_test_partition_values_roundtrip_exotic(spark, tmp_path):
    """Escaped values (Spark writes ``a b/c`` as ``a b%2Fc``), NULL
    (``__HIVE_DEFAULT_PARTITION__``) and typed ints all round-trip
    through partitionValues, pruning, and keyed DML."""
    df = spark.createDataFrame(
        [("a b/c", 1, 5), (None, 2, 6), ("x%20y", 3, 7)],
        "tag string, k int, v int")
    t = TxTable.create(spark, df, str(tmp_path / "t"), stat_cols=["k"],
                       partition_cols=["tag"])
    assert _multiset(t.read()) == _multiset(df)
    got = t.read(partition_values={"tag": "a b/c"})
    assert [r["k"] for r in got.collect()] == [1]
    t.delete(spark.createDataFrame([(2,)], "k int"), ["k"])
    rows = t.read().collect()
    assert sorted(r["k"] for r in rows) == [1, 3]
    assert t.fsck(verify_row_counts=True)["ok"]
    # typed selectors: recorded partitionValues are typed, so a string
    # against an int partition column is CAST through the hive decoder
    # (never silently matching zero files), and an uncastable or
    # wrong-typed value raises instead of reading empty / overwriting
    # nothing.
    ty = TxTable.create(spark, _lake_df(spark), str(tmp_path / "ty"),
                        stat_cols=["k"], partition_cols=["year"])
    assert ty.read(partition_values={"year": "2021"}).count() == 6
    with pytest.raises(ValueError, match="declared type"):
        ty.read(partition_values={"year": "20x1"})
    with pytest.raises(ValueError, match="declared type"):
        ty.read(partition_values={"year": 20.5})
    with pytest.raises(ValueError, match="declared type"):
        ty.overwrite_partitions(
            spark.createDataFrame([("DE", 2021, 0, 0)],
                                  "country string, year int, k int, v int"),
            {"year": True})
    # ... and the cast selector actually REPLACES (6 -> 1 rows in 2021)
    ty.overwrite_partitions(
        spark.createDataFrame([("DE", 2021, 0, 0)],
                              "country string, year int, k int, v int"),
        {"year": "2021"})
    assert ty.read(partition_values={"year": 2021}).count() == 1
    assert ty.read().count() == 7


def _heavy_test_overwrite_partitions_replacewhere(spark, tmp_path):
    """Partition-scoped INSERT OVERWRITE (Delta replaceWhere at
    partition grain): only the target partitions' files are replaced,
    out-of-partition batch rows refuse loudly, other partitions'
    files are untouched BY REFERENCE (not rewritten), and the CDC
    window nets to exactly the row diff."""
    t = TxTable.create(spark, _lake_df(spark), str(tmp_path / "t"),
                       stat_cols=["k"], partition_cols=["country"])
    ee_files = {p for p in t.live_files() if "country=EE" in p}
    v0 = t.version
    fresh = spark.createDataFrame(
        [("DE", 2024, 100, 1000), ("DE", 2024, 101, 1010)],
        "country string, year int, k int, v int")
    t.overwrite_partitions(fresh, {"country": "DE"})
    assert _multiset(t.read(partition_values={"country": "DE"})) \
        == _multiset(fresh)
    # EE untouched by reference: same physical files live
    assert {p for p in t.live_files() if "country=EE" in p} == ee_files
    assert t.read().count() == 6 + 2
    # batch rows OUTSIDE the target partitions refuse
    with pytest.raises(ValueError, match="outside the target"):
        t.overwrite_partitions(
            spark.createDataFrame([("FR", 2024, 1, 1)],
                                  "country string, year int, k int, v int"),
            {"country": "DE"})
    # CDC across the overwrite nets to the row diff
    ch = t.read_changes(v0)
    ins = _multiset(ch.filter("_change_type = 'insert'")
                    .drop("_change_type"))
    dels = _multiset(ch.filter("_change_type = 'delete'")
                     .drop("_change_type"))
    assert _multiset(t.read(version=v0)) + ins - dels == _multiset(t.read())
    # unpartitioned tables refuse (use overwrite())
    flat = TxTable.create(spark, spark.createDataFrame([(1, 1)],
                                                       "k int, v int"),
                          str(tmp_path / "flat"), stat_cols=["k"])
    with pytest.raises(ValueError, match="not partitioned"):
        flat.overwrite_partitions(flat.read(), {"k": 1})
    assert t.fsck(verify_row_counts=True)["ok"]


def _heavy_test_partitioned_datasources(spark, tmp_path):
    """The plain-IO tiers over a partitioned table: the batch DataSource
    fills partition columns from partitionValues and PRUNES files on
    partition predicates before any task launches; the CDC stream tags
    partitioned inserts/deletes with path-derived partition values."""
    from meteomatics_e2e_data_pipeline_spark.sources import (txlog_batch,
                                                             txlog_stream)
    txlog_batch.register(spark)
    txlog_stream.register(spark)
    lake = str(tmp_path / "lake")
    _lake_df(spark).repartition(2).write.partitionBy("country").parquet(
        lake)
    t = TxTable.convert(spark, lake, stat_cols=["k"])
    full = spark.read.format("txlog").option("path", t.path).load()
    assert full.count() == 12
    assert _multiset(full.select("country", "year", "k", "v")) \
        == _multiset(_lake_df(spark))
    # partition predicate prunes at the file level (fresh load per scan)
    ee = (spark.read.format("txlog").option("path", t.path).load()
          .filter("country = 'EE'"))
    assert ee.count() == 6
    # the V2 writer stages per-partition files with typed
    # partitionValues (partition columns EXCLUDED from file data) —
    # and the whole txlog tier reads them back
    fresh = spark.createDataFrame([(2024, 50, 500, "FR"),
                                   (2024, 51, 510, "DE")],
                                  "year int, k int, v int, country string")
    (fresh.select(*full.columns).coalesce(1)
     .write.format("txlog").mode("append").option("path", t.path).save())
    newest = [a["add"] for a in t.history()[t.version] if "add" in a]
    assert {a["partitionValues"]["country"] for a in newest} \
        == {"FR", "DE"}
    assert all("country=" in a["path"] for a in newest)
    fr = t.read(partition_values={"country": "FR"})
    assert [(r["k"], r["v"]) for r in fr.collect()] == [(50, 500)]
    assert (spark.read.format("txlog").option("path", t.path).load()
            .filter("k >= 50").count()) == 2
    # CDC stream: a delete inside one partition streams the rewrite
    # with partition columns filled from paths
    t.delete(spark.createDataFrame([(7,)], "k int"), ["k"])
    q = (spark.readStream.format("txlog_cdc").option("path", t.path)
         .load().writeStream.format("memory").queryName("cdc_part_ds")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = spark.sql("select * from cdc_part_ds").collect()
    assert all(r["country"] in ("DE", "EE", "FR") for r in rows)
    net = Counter()
    for r in rows:
        key = (r["country"], r["year"], r["k"], r["v"])
        net[key] += 1 if r["_change_type"] == "insert" else -1
    # net feed = the V2-written rows (inserts) + exactly the deleted row
    assert {k for k, n in net.items() if n > 0} \
        == {("FR", 2024, 50, 500), ("DE", 2024, 51, 510)}
    assert {k for k, n in net.items() if n < 0} == {("EE", 2022, 7, 70)}


def _heavy_test_partitioned_streaming_sink(spark, tmp_path):
    """Streaming ingest INTO a partitioned lake: the exactly-once V2
    stream sink stages per-(task, partition) files with typed
    partitionValues; every reader tier sees the rows in their
    partitions."""
    from meteomatics_e2e_data_pipeline_spark.sources import txlog_batch
    txlog_batch.register(spark)
    t = TxTable.create(spark, _lake_df(spark).limit(0),
                       str(tmp_path / "t"), stat_cols=["k"],
                       partition_cols=["country"])
    src = str(tmp_path / "src")
    _lake_df(spark).coalesce(2).write.parquet(src)
    q = (spark.readStream.schema(_lake_df(spark).schema).parquet(src)
         .writeStream.format("txlog").option("path", t.path)
         .option("txnAppId", "part_sink")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    assert _multiset(t.read()) == _multiset(_lake_df(spark))
    assert all("country=" in p for p in t.live_files())
    adds = [a["add"] for c in t.history() for a in c if "add" in a]
    assert {a["partitionValues"]["country"] for a in adds} == {"DE", "EE"}
    de = t.read(partition_values={"country": "DE"})
    assert de.count() == 6 and all("country=DE" in f
                                   for f in de.inputFiles())
    assert t.fsck(verify_row_counts=True)["ok"]


# ---------------------------------------------------------------------------
# Randomized equivalence: a partitioned table and its FLAT twin answer
# every DML sequence identically. This is the broadest guard on the
# partition tier's riskiest code — staging into key=value subpaths,
# partitionValues-as-stats pruning, relpath file identification, and
# dv/partition composition — under arbitrary interleavings.
# ---------------------------------------------------------------------------

def _pk(spark, lo, hi, mul=2):
    return (spark.range(lo, hi)
            .selectExpr("cast(id % 3 as int) as p", "id as k",
                        f"id*{mul} as v").coalesce(1))


def _twin_apply(spark, part, flat, op):
    kind = op[0]
    if kind == "append":
        _, lo, hi, mul = op
        batch = _pk(spark, lo, hi, mul)
        # first-wins on both (plain append would duplicate keys)
        part.merge_upsert(batch, ["k"])
        flat.merge_upsert(batch, ["k"])
    elif kind == "merge":
        _, lo, hi, mul = op
        batch = _pk(spark, lo, hi, mul)
        part.merge_upsert(batch, ["k"], update=True)
        flat.merge_upsert(batch, ["k"], update=True)
    elif kind in ("delete", "dv_delete"):
        _, lo, hi, _ = op
        keys = spark.range(lo, hi).selectExpr("id as k")
        part.delete(keys, ["k"],
                    mode="dv" if kind == "dv_delete" else "cow")
        flat.delete(keys, ["k"])  # flat twin: content-equal cow
    elif kind == "update":
        _, lo, _hi, mul = op
        part.update(f"k >= {lo}", {"v": f"v + {mul}"})
        flat.update(f"k >= {lo}", {"v": f"v + {mul}"})
    elif kind == "replace_part":
        _, pid, _hi, mul = op
        pid = pid % 3
        new = (part.read(partition_values={"p": pid})
               .withColumn("v", F.col("v") * mul)
               .localCheckpoint(eager=True))
        part.overwrite_partitions(new, {"p": pid})
        # flat emulation: keyed delete of the partition + append
        old_keys = (flat.read().filter(F.col("p") == pid)
                    .select("k").localCheckpoint(eager=True))
        flat.delete(old_keys, ["k"])
        if not new.isEmpty():
            flat.append(new)
    else:  # optimize
        part.optimize(target_rows=1_000_000)
        flat.optimize(target_rows=1_000_000)


def _twin_race(spark, base, ops):
    part = TxTable.create(spark, _pk(spark, 0, 12), f"{base}/part",
                          stat_cols=["k"], partition_cols=["p"])
    flat = TxTable.create(spark, _pk(spark, 0, 12), f"{base}/flat",
                          stat_cols=["k"])
    for op in ops:
        _twin_apply(spark, part, flat, op)
        assert _multiset(part.read()) == _multiset(flat.read()), op
        assert all("p=" in f for f in part.live_files())
    # fold invariant holds across the whole partitioned history
    end = _multiset(part.read())
    for frm in range(part.version + 1):
        ch = part.read_changes(frm)
        ins = _multiset(ch.filter("_change_type = 'insert'")
                        .drop("_change_type"))
        dels = _multiset(ch.filter("_change_type = 'delete'")
                         .drop("_change_type"))
        assert _multiset(part.read(version=frm)) + ins - dels == end, frm
    assert part.fsck(verify_row_counts=True)["ok"]


def _heavy_test_partitioned_flat_twin_exemplar(spark, tmp_path):
    """Fixed exemplar in the default lane: the four riskiest op kinds
    composed (merge rewrite into partitions, dv tombstones, replaceWhere,
    dv materialization); append/cow-delete/update on partitioned tables
    are covered by the dedicated tests above, and the full op mix runs
    randomized in the slow-lane sweep below."""
    ops = [("merge", 5, 15, 7), ("dv_delete", 8, 11, 1),
           ("replace_part", 1, 0, 3), ("optimize", 0, 0, 1)]
    _twin_race(spark, str(tmp_path), ops)


_TWIN_OP = hs.tuples(
    hs.sampled_from(["append", "merge", "delete", "dv_delete", "update",
                     "replace_part", "optimize"]),
    hs.integers(min_value=0, max_value=30),
    hs.integers(min_value=1, max_value=12),
    hs.integers(min_value=1, max_value=9),
).map(lambda o: (o[0], o[1], o[1] + o[2], o[3]))


@settings(max_examples=8, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(hs.data())
def test_partitioned_dml_equals_flat_twin_property(spark, data):
    """Randomized 3-5 op sequences: the partitioned table and its flat
    twin stay multiset-identical after every op, files always live in
    their partitions, and the CDC fold invariant holds end to end."""
    import tempfile

    ops = data.draw(hs.lists(_TWIN_OP, min_size=3, max_size=5))
    with tempfile.TemporaryDirectory(prefix="ptwin_") as base:
        _twin_race(spark, base, ops)


_POOLED = {n: fn for n, fn in [
    ("test_create_partitioned_prunes_and_dmls",
     _heavy_test_create_partitioned_prunes_and_dmls),
    ("test_convert_adopts_spark_partitioned_lake",
     _heavy_test_convert_adopts_spark_partitioned_lake),
    ("test_partitioned_cdc_fold_invariant_and_optimize",
     _heavy_test_partitioned_cdc_fold_invariant_and_optimize),
    ("test_partition_values_roundtrip_exotic",
     _heavy_test_partition_values_roundtrip_exotic),
    ("test_overwrite_partitions_replacewhere",
     _heavy_test_overwrite_partitions_replacewhere),
    ("test_partitioned_datasources",
     _heavy_test_partitioned_datasources),
    ("test_partitioned_streaming_sink",
     _heavy_test_partitioned_streaming_sink),
    ("test_partitioned_flat_twin_exemplar",
     _heavy_test_partitioned_flat_twin_exemplar),
]}


@pytest.fixture(scope="module")
def partitioned_pool(_heavy_pool):
    futs = {n: _heavy_pool["tests.test_txlog_partitioned::" + n]
            for n in _POOLED}
    return {n: f.result() for n, f in futs.items()}


def _shim(name):
    def test(partitioned_pool):
        ex = partitioned_pool[name]
        if ex is not None:
            raise ex
    test.__name__ = name
    return test


for _n in _POOLED:
    globals()[_n] = _shim(_n)
del _n
