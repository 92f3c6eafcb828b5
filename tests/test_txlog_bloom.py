"""Per-file Bloom membership filters on the txlog tier (the public
Delta bloom-filter-index idea): range stats cannot prune point lookups
on keys whose per-file ranges overlap — interleaved/hash-distributed
writes make every file a range candidate — so declared columns carry a
per-file bitset that proves ABSENCE. Exactness contract: pruning is
only ever exact-negative (a cleared bit proves the key absent); a
saturated or missing filter degrades to keeping the file, never to a
wrong answer."""

from __future__ import annotations

import base64

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as hs

from meteomatics_e2e_data_pipeline_spark.operators.txlog import TxTable


def _interleaved(spark, parity, n=60):
    """Keys of one parity: full range span, so [min,max] overlaps the
    other parity's file completely — range pruning is blind here."""
    return (spark.range(n).selectExpr(f"id * 2 + {parity} as k",
                                      "id as v").coalesce(1))


def _make(spark, tmp_path, name="b", **kw):
    t = TxTable.create(spark, _interleaved(spark, 0),
                       str(tmp_path / name), stat_cols=["k"],
                       bloom_cols=["k"], **kw)
    t.append(_interleaved(spark, 1))
    return t


def _heavy_test_bloom_prunes_where_ranges_cannot(spark, tmp_path):
    """Both files span [0..119] in k, so a keyed DELETE of one key
    range-matches both; the bloom proves the key absent from the other
    parity's file and exactly one file is rewritten."""
    t = _make(spark, tmp_path)
    v = t.delete(spark.createDataFrame([(8,)], "k long"), ["k"])
    removed = [a["remove"]["path"] for a in t.history()[v] if "remove" in a]
    assert len(removed) == 1  # range prune alone would rewrite both
    assert t.read().count() == 119
    # same via the read-side probe: only one file is scanned
    hit = t.read_keys(spark.createDataFrame([(7,)], "k long"), ["k"])
    assert [r["k"] for r in hit.collect()] == [7]
    assert len(hit.inputFiles()) == 1


def _heavy_test_bloom_has_no_false_negatives(spark, tmp_path):
    """Every key actually present must pass its file's stored filter —
    the Spark-side hash (md5 of CAST AS STRING) and the Python probe
    hash must agree bit-for-bit for every live key."""
    t = _make(spark, tmp_path)
    _, meta, live = t._snapshot()
    spec = meta["bloom"]
    m, k = spec["m"], spec["k"]
    for path, add in live.items():
        bits = base64.b64decode(add["bloom"]["k"])
        keys = [r["k"] for r in
                t.spark.read.parquet(f"{t.path}/{path}").collect()]
        assert keys
        for key in keys:
            assert all(bits[p // 8] >> (p % 8) & 1
                       for p in TxTable._bloom_positions(str(key), m, k)), \
                f"false negative for k={key} in {path}"


def _heavy_test_saturated_bloom_degrades_to_no_pruning(spark, tmp_path):
    """An undersized (8-bit) filter saturates: results stay exact, the
    filter just stops excluding files."""
    t = _make(spark, tmp_path, name="sat", bloom_bits=8, bloom_hashes=2)
    t.merge_upsert(spark.createDataFrame([(8, 999)], "k long, v long"),
                   ["k"], update=True)
    rows = {r["k"]: r["v"] for r in t.read().collect()}
    assert rows[8] == 999 and len(rows) == 120


def _heavy_test_bulk_probe_skips_bloom_path(spark, tmp_path):
    """Above the point-lookup threshold the probe is never collected —
    the range path serves bulk merges; results identical."""
    t = _make(spark, tmp_path, name="bulk")
    big = (spark.range(3000).selectExpr("id as k", "id + 5 as v")
           .coalesce(2))
    t.merge_upsert(big, ["k"], update=True)
    rows = {r["k"]: r["v"] for r in t.read().collect()}
    assert rows[100] == 105 and rows[2999] == 3004


def _heavy_test_bloom_survives_convert_and_schema_evolution(spark, tmp_path):
    p = str(tmp_path / "conv")
    (spark.range(100).selectExpr("id as k", "id as v")
     .repartitionByRange(2, "v").write.parquet(p))
    t = TxTable.convert(spark, p, stat_cols=["k"], bloom_cols=["k"])
    assert all("bloom" in a for a in t._snapshot()[2].values())
    # widening keeps the spec; new files still carry filters
    t.append(spark.createDataFrame([(500, 1, "x")],
                                   "k long, v long, note string"),
             merge_schema=True)
    assert t._snapshot()[1]["bloom"]["cols"] == ["k"]
    newest = [a for a in t.history()[t.version] if "add" in a]
    assert all("bloom" in a["add"] for a in newest)
    hit = t.read_keys(spark.createDataFrame([(500,)], "k long"), ["k"])
    assert len(hit.inputFiles()) == 1


def _heavy_test_bloom_rejects_unhashable_and_unknown_columns(spark, tmp_path):
    df = spark.range(5).selectExpr("id as k", "cast(id as double) as x")
    with pytest.raises(ValueError, match="hash portably"):
        TxTable.create(spark, df, str(tmp_path / "f1"), bloom_cols=["x"])
    with pytest.raises(ValueError, match="not in schema"):
        TxTable.create(spark, df, str(tmp_path / "f2"),
                       bloom_cols=["nope"])
    # k > 4 would slice past the 32-hex md5 digest BOTH hash sides cut
    # 8-hex words from (write: SUBSTRING over md5(); probe:
    # _bloom_positions) — rejected at declaration, not a crash at
    # create/read_keys time
    with pytest.raises(ValueError, match="bloom_hashes <= 4"):
        TxTable.create(spark, df, str(tmp_path / "f3"), bloom_cols=["k"],
                       bloom_hashes=5)


@settings(max_examples=15, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(hs.data())
def test_bloom_pruning_equivalence_property(spark, data):
    """Randomized: any key distribution, any (m, k) sizing — a bloomed
    table and its bloom-less twin answer every keyed DELETE and
    read_keys probe identically, and no live key is ever a false
    negative against its file's stored filter. This is the exactness
    half of the bloom contract under fuzzing; the pruning half is the
    deterministic interleaved-parity test above."""
    import base64
    import tempfile

    keys = sorted(data.draw(hs.sets(
        hs.integers(min_value=-10_000, max_value=10_000),
        min_size=4, max_size=60)))
    n_files = data.draw(hs.integers(min_value=1, max_value=4))
    m = data.draw(hs.sampled_from([16, 64, 256, 2048]))
    k = data.draw(hs.integers(min_value=1, max_value=4))
    probe = data.draw(hs.lists(
        hs.one_of(hs.sampled_from(keys),
                  hs.integers(min_value=-10_000, max_value=10_000)),
        min_size=1, max_size=8, unique=True))
    df = spark.createDataFrame([(x, x % 7) for x in keys], "k long, v long")
    with tempfile.TemporaryDirectory(prefix="bloomprop_") as base:
        bloomed = TxTable.create(spark, df.repartition(n_files),
                                 f"{base}/b", stat_cols=["k"],
                                 bloom_cols=["k"], bloom_bits=m,
                                 bloom_hashes=k)
        plain = TxTable.create(spark, df.repartition(n_files),
                               f"{base}/p", stat_cols=["k"])
        # no false negatives, whatever the sizing
        _, meta, live = bloomed._snapshot()
        for path, add in live.items():
            bits = base64.b64decode(add["bloom"]["k"])
            for r in spark.read.parquet(f"{bloomed.path}/{path}").collect():
                assert all(bits[p // 8] >> (p % 8) & 1
                           for p in TxTable._bloom_positions(
                               str(r["k"]), m, k))
        probe_df = spark.createDataFrame([(x,) for x in probe], "k long")
        got_b = sorted(map(tuple,
                           bloomed.read_keys(probe_df, ["k"]).collect()))
        got_p = sorted(map(tuple,
                           plain.read_keys(probe_df, ["k"]).collect()))
        assert got_b == got_p == sorted(
            (x, x % 7) for x in probe if x in set(keys))
        bloomed.delete(probe_df, ["k"])
        plain.delete(probe_df, ["k"])
        assert sorted(map(tuple, bloomed.read().collect())) \
            == sorted(map(tuple, plain.read().collect()))


# Pooled heavy bodies (see conftest.pool_bodies).
_POOLED = {n: fn for n, fn in [
    ("test_bloom_prunes_where_ranges_cannot", _heavy_test_bloom_prunes_where_ranges_cannot),
    ("test_bloom_has_no_false_negatives", _heavy_test_bloom_has_no_false_negatives),
    ("test_saturated_bloom_degrades_to_no_pruning", _heavy_test_saturated_bloom_degrades_to_no_pruning),
    ("test_bulk_probe_skips_bloom_path", _heavy_test_bulk_probe_skips_bloom_path),
    ("test_bloom_survives_convert_and_schema_evolution", _heavy_test_bloom_survives_convert_and_schema_evolution),
    ("test_bloom_rejects_unhashable_and_unknown_columns", _heavy_test_bloom_rejects_unhashable_and_unknown_columns),
]}


@pytest.fixture(scope="module")
def bloom_pool(_heavy_pool):
    futs = {n: _heavy_pool["tests.test_txlog_bloom::" + n]
            for n in _POOLED}
    return {n: f.result() for n, f in futs.items()}


def _shim(name):
    def test(bloom_pool):
        ex = bloom_pool[name]
        if ex is not None:
            raise ex
    test.__name__ = name
    return test


for _n in _POOLED:
    globals()[_n] = _shim(_n)
del _n
