"""Scale-path features: bucketed co-located joins (no Exchange), the
vectorized cosine path, and property-based Snowflake/DuckDB parity of the
scalar function library."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from meteomatics_e2e_data_pipeline_spark.operators import similarity
from meteomatics_e2e_data_pipeline_spark.operators.bucketing import (
    cobucketed_join, write_bucketed,
)
from meteomatics_e2e_data_pipeline_spark.sources.tables import load_table


def test_cobucketed_join_has_no_exchange(spark, tmp_path):
    li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    write_bucketed(li.select("l_orderkey", "l_quantity"), "li_b",
                   str(tmp_path / "li_b"), ["l_orderkey"], 8,
                   sort_cols=["l_orderkey"])
    write_bucketed(orders.select("o_orderkey", "o_totalprice")
                   .withColumnRenamed("o_orderkey", "l_orderkey"), "ord_b",
                   str(tmp_path / "ord_b"), ["l_orderkey"], 8,
                   sort_cols=["l_orderkey"])
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = cobucketed_join(spark, "li_b", "ord_b", ["l_orderkey"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS ord_b")


def test_vectorized_knn_matches_builtin(spark, sf_oracle):
    emb = load_table(spark, sf_oracle, "embeddings")
    q = emb.filter(F.col("vec_id") < 3)
    a = {(r["query_id"], r["rank"]): (r["neighbor_id"], r["cos_sim"])
         for r in similarity.knn_bruteforce(emb, q, 10).collect()}
    b = {(r["query_id"], r["rank"]): (r["neighbor_id"], r["cos_sim"])
         for r in similarity.knn_bruteforce_vectorized(emb, q, 10).collect()}
    assert set(a) == set(b)
    for k in a:
        assert a[k][0] == b[k][0]
        assert abs(a[k][1] - b[k][1]) <= 1e-6


def test_kmeans_training_improves_cohesion(spark, sf_oracle):
    """Trained IVF centroids must (a) be deterministic across reruns and
    (b) pull vectors closer to their centroid than the untrained
    first-k-vectors quantizer."""
    from pyspark.sql import functions as F2
    emb = load_table(spark, sf_oracle, "embeddings")

    def cohesion(centroids):
        assigned = similarity.ivf_assign(emb, centroids)
        cent = centroids.select(F2.col("centroid_id").alias("bucket"),
                                F2.col("embedding").alias("cv"))
        return (assigned.join(cent, "bucket")
                .select(similarity.cosine(F2.col("embedding"), F2.col("cv"))
                        .alias("c"))
                .agg(F2.avg("c")).first()[0])

    naive = (emb.filter(F2.col("vec_id") < 8)
             .select(F2.col("vec_id").alias("centroid_id"), "embedding"))
    trained = similarity.train_ivf_centroids(emb, k=8, iters=3)
    assert trained.count() == 8
    assert cohesion(trained) > cohesion(naive)

    again = similarity.train_ivf_centroids(emb, k=8, iters=3)
    a = sorted(map(repr, trained.collect()))
    b = sorted(map(repr, again.collect()))
    assert a == b  # deterministic


def test_approx_distinct_within_tolerance(spark, sf_oracle):
    from meteomatics_e2e_data_pipeline_spark.plans.analytics import (
        q_event_user_reach_approx,
    )
    approx = {r["event_type"]: r["approx_users"]
              for r in q_event_user_reach_approx(spark, sf_oracle).collect()}
    exact = {r["event_type"]: r["n"]
             for r in load_table(spark, sf_oracle, "events")
             .groupBy("event_type")
             .agg(F.countDistinct("user_id").alias("n")).collect()}
    assert set(approx) == set(exact)
    for k in exact:
        assert abs(approx[k] - exact[k]) / exact[k] <= 0.05


# ---------------------------------------------------------------------------
# Property-based parity: scalar library vs DuckDB on arbitrary inputs
# ---------------------------------------------------------------------------


@settings(max_examples=10, deadline=None)
@given(st.lists(st.dates(min_value=__import__("datetime").date(1990, 1, 5),
                         max_value=__import__("datetime").date(2100, 12, 28)),
                min_size=1, max_size=40, unique=True))
def test_calendar_functions_match_duckdb(spark, dates):
    from meteomatics_e2e_data_pipeline_spark.functions.dates import (
        date_key, is_weekend, week_number, weekday_name,
    )
    df = spark.createDataFrame([(d,) for d in dates], "d date")
    got = {r["d"]: (r["k"], r["w"], r["we"], r["wn"]) for r in df.select(
        "d", date_key(F.col("d")).alias("k"),
        weekday_name(F.col("d")).alias("w"),
        is_weekend(F.col("d")).alias("we"),
        week_number(F.col("d")).alias("wn")).collect()}
    con = duckdb.connect()
    for d in dates:
        k, w, we, wn = con.execute(f"""
            SELECT strftime(DATE '{d}', '%Y%m%d')::INT,
                   dayname(DATE '{d}'),
                   isodow(DATE '{d}') IN (6,7),
                   (datediff('day',
                      date_trunc('week', make_date({d.year}, 1, 1)),
                      date_trunc('week', DATE '{d}')) // 7 + 1)::INT
        """).fetchone()
        assert got[d] == (k, w, we, wn), f"mismatch for {d}"
    con.close()


@settings(max_examples=10, deadline=None)
@given(st.lists(
    st.one_of(st.none(),
              st.text(alphabet=st.characters(blacklist_categories=("Cs",)),
                      max_size=30)),
    min_size=1, max_size=20))
def test_surrogate_key_matches_duckdb(spark, values):
    from meteomatics_e2e_data_pipeline_spark.functions.keys import (
        surrogate_key, surrogate_key_sql,
    )
    df = spark.createDataFrame([(v,) for v in values], "s string")
    got = [r["k"] for r in
           df.select(surrogate_key("s").alias("k")).collect()]
    con = duckdb.connect()
    con.register("t", __import__("pandas").DataFrame({"s": values}))
    want = [r[0] for r in con.execute(
        f"SELECT {surrogate_key_sql('s')} AS k FROM t").fetchall()]
    con.close()
    assert got == want


def test_lsh_assign_empty_corpus_and_simhash_guard(spark):
    from meteomatics_e2e_data_pipeline_spark.operators.neardup import (
        simhash_pairs,
    )
    from meteomatics_e2e_data_pipeline_spark.operators.similarity import (
        knn_lsh, lsh_assign,
    )

    empty = spark.createDataFrame([], "vec_id int, embedding array<double>")
    assert lsh_assign(empty).count() == 0          # no crash, empty out
    assert knn_lsh(empty, empty, 5).count() == 0

    docs = spark.createDataFrame([(1, "a b c")], "doc_id int, text string")
    import pytest as _pytest
    with _pytest.raises(ValueError, match="max_hamming"):
        simhash_pairs(docs, max_hamming=4)         # bands no longer exact


def test_ivf_nprobe_recall_monotone(spark, sf_smoke):
    """nprobe is the IVF recall dial: recall vs exact brute force must be
    monotone in nprobe, and probing every bucket must equal brute force."""
    from meteomatics_e2e_data_pipeline_spark.operators.similarity import (
        knn_bruteforce, knn_ivf,
    )
    from meteomatics_e2e_data_pipeline_spark.sources.tables import load_table

    emb = load_table(spark, sf_smoke, "embeddings")
    n_cent = 8
    centroids = (emb.filter(F.col("vec_id") < n_cent)
                 .select(F.col("vec_id").alias("centroid_id"), "embedding"))
    queries = emb.filter(F.col("vec_id") < 20)
    exact = {(r["query_id"], r["neighbor_id"])
             for r in knn_bruteforce(emb, queries, 5).collect()}

    def recall(nprobe):
        got = {(r["query_id"], r["neighbor_id"])
               for r in knn_ivf(emb, queries, centroids, 5,
                                nprobe=nprobe).collect()}
        return len(got & exact) / len(exact)

    r1, r2, r_all = recall(1), recall(2), recall(n_cent)
    assert r1 <= r2 <= r_all
    assert r2 > r1 * 0.99          # probing more buckets never hurts
    assert r_all == 1.0            # all buckets == exact brute force


def test_range_clustered_layout_files_are_disjoint(spark, tmp_path):
    """Every output file must cover a non-overlapping slice of the
    cluster key — that disjointness is exactly what parquet min/max
    pruning needs to skip files on a selective scan."""
    from meteomatics_e2e_data_pipeline_spark.operators.bucketing import (
        write_range_clustered,
    )

    df = spark.range(0, 10_000).select(
        (F.col("id") * 37 % 10_000).alias("k"), F.col("id").alias("v"))
    out = str(tmp_path / "clustered")
    write_range_clustered(df, out, ["k"], n_files=8)

    import glob
    spans = []
    for f in glob.glob(out + "/part-*.parquet"):
        r = spark.read.parquet(f).agg(F.min("k"), F.max("k")).first()
        spans.append((r[0], r[1]))
    spans.sort()
    assert len(spans) >= 4
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2          # non-overlapping ranges across files
    assert spark.read.parquet(out).count() == 10_000


@settings(max_examples=15, deadline=None)
@given(st.integers(min_value=1, max_value=60),    # n tokens
       st.integers(min_value=1, max_value=12),    # chunk_size
       st.integers(min_value=1, max_value=12))    # stride
def test_chunk_tokens_properties(spark, n, chunk_size, stride):
    """Chunking invariants across the parameter space: chunk count
    matches the documented formula, every token is covered when
    stride <= chunk_size, chunks start every `stride` tokens, and no
    emitted chunk is a strict subset of its predecessor."""
    import math

    from meteomatics_e2e_data_pipeline_spark.operators.textops import (
        chunk_tokens,
    )

    toks = [f"t{i}" for i in range(n)]
    df = spark.createDataFrame([(toks,)], "tok array<string>")
    chunks = df.select(
        chunk_tokens(F.col("tok"), chunk_size, stride).alias("c")
    ).first()["c"]

    overlap = chunk_size - stride
    want_count = max(1, min(math.ceil((n - overlap) / stride),
                            math.ceil(n / stride)))
    assert len(chunks) == want_count
    split = [c.split(" ") for c in chunks]
    for i, ch in enumerate(split):
        assert ch == toks[i * stride: i * stride + chunk_size]
    if stride <= chunk_size:
        covered = {t for ch in split for t in ch}
        assert covered == set(toks)              # full coverage
    for prev, cur in zip(split, split[1:]):
        assert not set(cur) <= set(prev) or cur == prev  # no subset tails


def test_zorder_key_matches_python_morton_and_prunes_both_dims(spark, tmp_path):
    """zorder_key must equal a reference Morton interleave, and a
    z-ordered range-clustered layout must give DISJOINT per-file z-spans
    (the property parquet min/max pruning needs) while bounding BOTH
    dimensions per file — the two-dimensional pruning win that
    single-key range clustering cannot provide."""
    from meteomatics_e2e_data_pipeline_spark.operators.bucketing import (
        write_range_clustered, zorder_key)

    df = spark.range(0, 4096).select(
        (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("long").alias("y"))
    out_df = df.withColumn("z", zorder_key([F.col("x"), F.col("y")], 6))
    rows = out_df.collect()

    def morton(x, y, bits=6):
        z = 0
        for b in range(bits):
            z |= ((x >> b) & 1) << (2 * b)
            z |= ((y >> b) & 1) << (2 * b + 1)
        return z

    for r in rows:
        assert r["z"] == morton(r["x"], r["y"])

    out = str(tmp_path / "zordered")
    write_range_clustered(out_df, out, ["z"], n_files=16)
    import glob
    spans = []
    for f in glob.glob(out + "/part-*.parquet"):
        r = spark.read.parquet(f).agg(
            F.min("z"), F.max("z"), F.min("x"), F.max("x"),
            F.min("y"), F.max("y")).first()
        spans.append(tuple(r))
    spans.sort()
    assert len(spans) >= 8
    for a, b in zip(spans, spans[1:]):
        assert a[1] <= b[0]            # z-spans disjoint across files
    # both dims bounded per file: each file's x- and y-extent must be a
    # fraction of the full 64-wide domain (a row-id sort would give full
    # x coverage in every file)
    for zlo, zhi, xlo, xhi, ylo, yhi in spans:
        assert xhi - xlo <= 32
        assert yhi - ylo <= 32

    with pytest.raises(ValueError):
        zorder_key([F.col("x"), F.col("y")], 32)


def test_dynamic_partition_pruning_fires_on_partitioned_layout(spark, tmp_path):
    """Hive-partitioned layout + a selectively FILTERED dim must trigger
    Catalyst's dynamic partition pruning (the runtime analog of the
    static pruning the clustered-layout sink exists for): the fact
    scan's PartitionFilters carry a dynamicpruning subquery, so at
    100 TB only the months surviving the dim filter are read. (The dim
    must be a real source with its own filter — a limit over the fact
    itself does not qualify as a pruning side.)"""
    from meteomatics_e2e_data_pipeline_spark.sources.tables import load_table

    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    (orders.withColumn("om", F.date_format("o_orderdate", "yyyy-MM"))
     .write.partitionBy("om").parquet(str(tmp_path / "fact")))
    (orders.select(F.date_format("o_orderdate", "yyyy-MM").alias("om"))
     .distinct().withColumn("flag", (F.crc32("om") % 2).cast("int"))
     .write.parquet(str(tmp_path / "dim")))
    fact = spark.read.parquet(str(tmp_path / "fact"))
    dim = spark.read.parquet(str(tmp_path / "dim")) \
        .filter(F.col("flag") == 1)
    joined = fact.join(dim, "om").groupBy("om").count()
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    assert joined.count() > 0


def test_zvalue_interleaves_bits():
    """Known Morton codes: x bits land at even positions, y at odd.
    z(5, 3) = x0 + y0<<1 + y1<<3 + x2<<4 = 1 + 2 + 8 + 16 = 27."""
    def ref(x, y, bits=12):
        z = 0
        for i in range(bits):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    assert ref(5, 3) == 27
    assert ref(0, 0) == 0
    assert ref(2**12 - 1, 0) == sum(1 << (2 * i) for i in range(12))


def test_zorder_buckets_are_aligned_squares(spark, sf_oracle):
    """The data-skipping guarantee: every z-bucket of 2^(2m) curve
    values is one ALIGNED 2^m x 2^m (user, day) square — min and max
    of each dimension share their high bits within any bucket, and the
    witness columns equal those high bits. Then the pruning bound a
    min/max footer gives: a rectangle predicate touches at most
    (spanned x-squares) x (spanned y-squares) buckets."""
    from meteomatics_e2e_data_pipeline_spark.plans.analytics import (
        Z_SQUARE_BITS, q_events_zorder_stats)

    rows = q_events_zorder_stats(spark, sf_oracle).collect()
    assert rows
    m = Z_SQUARE_BITS
    for r in rows:
        assert r["min_uid"] >> m == r["max_uid"] >> m == r["sq_x"]
        assert r["min_day"] >> m == r["max_day"] >> m == r["sq_y"]
    # zbucket is a bijection onto (sq_x, sq_y) pairs present
    assert len({r["zbucket"] for r in rows}) == \
        len({(r["sq_x"], r["sq_y"]) for r in rows})
    # rectangle pruning bound: users 100-179, days 5-14
    u1, u2, d1, d2 = 100, 179, 5, 14
    touched = [r for r in rows
               if r["max_uid"] >= u1 and r["min_uid"] <= u2
               and r["max_day"] >= d1 and r["min_day"] <= d2]
    bound = ((u2 >> m) - (u1 >> m) + 1) * ((d2 >> m) - (d1 >> m) + 1)
    assert 0 < len(touched) <= bound


def _parquet_boxes(d, x_col, y_col):
    """Per-file (min_x, max_x, min_y, max_y) from REAL parquet footers."""
    import glob

    import pyarrow.parquet as pq

    out = {}
    for f in sorted(glob.glob(str(d) + "/part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        names = [md.schema.column(i).name for i in range(md.num_columns)]
        xi, yi = names.index(x_col), names.index(y_col)
        lo_x = hi_x = lo_y = hi_y = None
        for rg in range(md.num_row_groups):
            sx = md.row_group(rg).column(xi).statistics
            sy = md.row_group(rg).column(yi).statistics
            lo_x = sx.min if lo_x is None else min(lo_x, sx.min)
            hi_x = sx.max if hi_x is None else max(hi_x, sx.max)
            lo_y = sy.min if lo_y is None else min(lo_y, sy.min)
            hi_y = sy.max if hi_y is None else max(hi_y, sy.max)
        out[f.rsplit("/", 1)[-1]] = (lo_x, hi_x, lo_y, hi_y)
    return out


def test_zorder_write_path_prunes_files(spark, tmp_path, sf_oracle):
    """The realized write path must actually skip files: write events
    z-clustered via zorder_write, read the REAL parquet footers, and
    check that a min/max-stats reader skips most files for rectangle
    predicates on (user_id, day) — while the same data written
    round-robin is unprunable. Also ties the Spark read back to the
    footer math: the files that contribute rows under the predicate
    are exactly a subset of the footer-surviving files."""
    from meteomatics_e2e_data_pipeline_spark.operators.zorder import (
        zorder_write,
    )
    from meteomatics_e2e_data_pipeline_spark.sources.tables import load_table

    ev = load_table(spark, sf_oracle, "events")
    day = F.datediff(F.col("ts").cast("date"),
                     F.to_date(F.lit("2024-01-01"))).cast("long")
    df = ev.select("user_id", day.alias("day"))
    zdir, rdir = str(tmp_path / "zorder"), str(tmp_path / "roundrobin")
    zorder_write(df, zdir, "user_id", "day", bits=12, n_files=16)
    df.repartition(16).write.parquet(rdir)

    zb = _parquet_boxes(zdir, "user_id", "day")
    rb = _parquet_boxes(rdir, "user_id", "day")
    assert len(zb) > 1 and len(rb) > 1

    def survivors(boxes, u1, u2, d1, d2):
        return {f for f, (lx, hx, ly, hy) in boxes.items()
                if hx >= u1 and lx <= u2 and hy >= d1 and ly <= d2}

    for (u1, u2, d1, d2), max_frac in (((100, 179, 5, 14), 0.5),
                                       ((0, 49, 0, 3), 0.5)):
        sz = survivors(zb, u1, u2, d1, d2)
        sr = survivors(rb, u1, u2, d1, d2)
        # z-order: a stats reader skips most files; round-robin: none
        assert 0 < len(sz) <= max_frac * len(zb), (u1, u2, d1, d2)
        assert len(sr) == len(rb)
        # Spark read under the predicate touches only surviving files
        got = {r[0].rsplit("/", 1)[-1] for r in
               spark.read.parquet(zdir)
               .filter((F.col("user_id").between(u1, u2))
                       & (F.col("day").between(d1, d2)))
               .select(F.input_file_name()).distinct().collect()}
        assert got <= sz


def test_zvalue_column_matches_python_reference(spark):
    """The Spark shift/mask expression equals the integer reference on
    a corner-heavy grid (0, 1, alternating bits, max)."""
    from meteomatics_e2e_data_pipeline_spark.operators.zorder import zvalue

    vals = [0, 1, 2, 3, 0b101010101010, 0b010101010101, 2**12 - 1, 29, 1499]
    df = spark.createDataFrame([(x, y) for x in vals for y in vals],
                               "x long, y long")
    got = {(r["x"], r["y"]): r["z"]
           for r in df.select("x", "y",
                              zvalue(F.col("x"), F.col("y")).alias("z"))
           .collect()}

    def ref(x, y, bits=12):
        z = 0
        for i in range(bits):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    assert got == {(x, y): ref(x, y) for x in vals for y in vals}


def test_zvalue_raises_on_out_of_domain_inputs(spark):
    """Values >= 2**bits (or negative) must RAISE, not silently mask
    their high bits — masking would collapse distinct points onto one
    z-value and break the aligned-square pruning invariant (r8 advisor
    finding)."""
    import pytest

    from meteomatics_e2e_data_pipeline_spark.operators.zorder import zvalue

    for x, y in ((2**12, 0), (0, 2**12), (-1, 5)):
        df = spark.createDataFrame([(x, y)], "x long, y long")
        with pytest.raises(Exception, match="zvalue"):
            df.select(zvalue(F.col("x"), F.col("y")).alias("z")).collect()


def test_dup_span_bloom_tier_is_exact_with_no_false_negatives(
        spark, sf_smoke):
    """The Bloom-prefiltered dup-span tier (operators/neardup.py:
    _dup_span_starts bloom=True) must return EXACTLY the default
    count-join tier's rows, and the Bloom itself must pass every member
    of the count>=2 set (no false negatives — the property that makes
    the verify join sufficient for exactness)."""
    from meteomatics_e2e_data_pipeline_spark.operators import neardup

    docs = load_table(spark, sf_smoke, "documents")
    base = neardup._dup_span_starts(docs, "doc_id", "text", 8, bloom=False)
    tier = neardup._dup_span_starts(docs, "doc_id", "text", 8, bloom=True)
    a = sorted(map(tuple, base.collect()))
    b = sorted(map(tuple, tier.collect()))
    assert a == b and len(a) > 0
    # direct no-FN assertion: every count>=2 hash passes its own probes
    sp = docs.select(
        "doc_id",
        F.explode(neardup.shingle_hash_array(F.col("text"), 8)).alias("hv"))
    dup_set = (sp.groupBy("hv").agg(F.count(F.lit(1)).alias("c"))
               .filter(F.col("c") >= 2).select("hv"))
    words = F.lit(neardup.bloom_words_from_hv(dup_set))
    misses = dup_set.filter(
        ~neardup.bloom_probe(words, F.col("hv"))).count()
    assert misses == 0


def test_exact_substring_scrub_removes_repeats_and_keeps_uniques(spark):
    """Scrub semantics on a hand-built corpus: a window repeated across
    two docs is removed from BOTH (conservative multiplicity variant),
    within-doc repeats are removed, unique text survives verbatim, and a
    fully-duplicated doc survives as an empty row."""
    from meteomatics_e2e_data_pipeline_spark.operators import neardup

    span = " ".join(f"w{i}" for i in range(8))          # the dup window
    uniq_a = " ".join(f"a{i}" for i in range(5))
    uniq_b = " ".join(f"b{i}" for i in range(5))
    docs = spark.createDataFrame(
        [(1, f"{uniq_a} {span}"),            # cross-doc dup + unique head
         (2, f"{span} {uniq_b}"),            # cross-doc dup + unique tail
         (3, span),                          # fully duplicated
         (4, f"{span} {span}"),              # within-doc repeat
         (5, "lone words only here")],       # untouched
        ["doc_id", "text"])
    got = {r["doc_id"]: r for r in
           neardup.exact_substring_scrub(docs, span_len=8).collect()}
    assert got[1]["clean_text"] == uniq_a and got[1]["n_removed"] == 8
    assert got[2]["clean_text"] == uniq_b and got[2]["n_removed"] == 8
    assert got[3]["clean_text"] == "" and got[3]["n_removed"] == 8
    assert got[4]["clean_text"] == "" and got[4]["n_removed"] == 16
    assert got[5]["clean_text"] == "lone words only here"
    assert got[5]["n_removed"] == 0
    assert all(r["n_tokens"] - r["n_removed"] ==
               (len(r["clean_text"].split()) if r["clean_text"] else 0)
               for r in got.values())


def test_scrub_fixpoint_residual_non_increasing_and_converges(spark):
    """Iterated-scrub ladder semantics (directive r10 #4, Lee et al.
    iterate): on a plain pairwise-dup corpus residual coverage is
    NON-INCREASING and hits 0 within 2 passes; and the ladder reports
    the seam case HONESTLY — pass 1's removal can make two
    previously-distinct documents IDENTICAL, a new (even LARGER)
    cross-doc duplicate only pass 2 can see, so the transient residual
    is allowed to rise before converging. That transient spike is
    exactly why one pass is a contraction, not a fixpoint, and why the
    ladder (not a single after-number) is the right observable."""
    from meteomatics_e2e_data_pipeline_spark.operators import neardup

    span = " ".join(f"s{i}" for i in range(4))           # the planted dup

    # plain pairwise corpus (no seams): monotone, converged by pass 1
    pair = spark.createDataFrame(
        [(1, f"{span} x1 x2"), (2, f"y1 y2 {span}"), (3, "z1 z2 z3 z4 z5")],
        ["doc_id", "text"])
    ladder = [r["coverage"] for r in sorted(
        neardup.exact_substring_scrub_fixpoint(
            pair, span_len=4, passes=2).collect(),
        key=lambda r: r["pass_no"])]
    assert ladder[0] > 0 and ladder[1] == 0.0 and ladder[2] == 0.0
    assert all(a >= b for a, b in zip(ladder, ladder[1:])), ladder

    # seam corpus: doc 1 minus the span EQUALS doc 3, so pass 1 creates
    # a brand-new full-document duplicate (residual spikes), pass 2
    # removes it, pass 3 certifies the fixpoint
    docs = spark.createDataFrame(
        [(1, f"c1 c2 c3 {span} d1 d2 d3"),   # loses span in pass 1 ...
         (2, span),                          # ... because it repeats here
         (3, "c1 c2 c3 d1 d2 d3"),           # == doc 1 AFTER pass 1
         (4, "u1 u2 u3 u4 u5")],             # untouched control
        ["doc_id", "text"])
    seam = {r["pass_no"]: r for r in
            neardup.exact_substring_scrub_fixpoint(
                docs, span_len=4, passes=3).collect()}
    cov = [seam[p]["coverage"] for p in range(4)]
    assert cov[0] > 0 and cov[1] > cov[0], cov   # the honest transient
    assert cov[2] == 0.0 and cov[3] == 0.0, cov  # fixpoint in 2 passes
    toks = [seam[p]["tokens"] for p in range(4)]
    assert all(a >= b for a, b in zip(toks, toks[1:])), toks  # tokens only shrink
