"""As-of join semantics on a hand-computable fixture: strict vs
allow_exact boundary behavior, missing-match NULLs, multi-column payload
atomicity."""

from __future__ import annotations

from meteomatics_e2e_data_pipeline_spark.operators.asof import asof_join


def test_asof_strict_and_exact(spark):
    left = spark.createDataFrame(
        [(1, 10), (1, 20), (1, 5), (2, 15)], "k int, ts int")
    right = spark.createDataFrame(
        [(1, 5, "a", 100), (1, 18, "b", 200), (2, 99, "c", 300)],
        "k int, ts int, v string, w int")

    strict = {(r["k"], r["ts"]): (r["asof_v"], r["asof_w"]) for r in
              asof_join(left, right, ["k"], "ts", "ts", ["v", "w"]).collect()}
    # ts=5: the equal-ts quote is NOT visible under strict (>)
    assert strict[(1, 5)] == (None, None)
    assert strict[(1, 10)] == ("a", 100)
    assert strict[(1, 20)] == ("b", 200)
    assert strict[(2, 15)] == (None, None)   # right row is in the future

    exact = {(r["k"], r["ts"]): (r["asof_v"], r["asof_w"]) for r in
             asof_join(left, right, ["k"], "ts", "ts", ["v", "w"],
                       allow_exact=True).collect()}
    assert exact[(1, 5)] == ("a", 100)       # >= admits the equal-ts row
    assert exact[(1, 10)] == ("a", 100)


def test_asof_payload_is_atomic(spark):
    # two right rows at the SAME ts: whichever wins, v and w must come
    # from the same row (struct payload), never mixed
    left = spark.createDataFrame([(1, 10)], "k int, ts int")
    right = spark.createDataFrame(
        [(1, 5, "a", 100), (1, 5, "z", 999)], "k int, ts int, v string, w int")
    r = asof_join(left, right, ["k"], "ts", "ts", ["v", "w"]).first()
    assert (r["asof_v"], r["asof_w"]) in {("a", 100), ("z", 999)}


from hypothesis import given, settings, strategies as st


@settings(max_examples=12, deadline=None)
@given(st.data())
def test_asof_matches_duckdb_on_random_data(spark, data):
    """Property check against DuckDB's native ASOF JOIN over randomized
    keys/timestamps (including equal-timestamp collisions, keys with no
    match, and multiple right rows per instant is excluded by
    construction — the operator contract is latest-unique-per-ts)."""
    import duckdb

    ts_vals = st.integers(min_value=0, max_value=50)
    keys = ["a", "b", "c"]
    left_rows = data.draw(st.lists(
        st.tuples(st.sampled_from(keys), ts_vals),
        min_size=1, max_size=25))
    right_raw = data.draw(st.lists(
        st.tuples(st.sampled_from(keys), ts_vals,
                  st.integers(min_value=0, max_value=999)),
        min_size=1, max_size=25))
    # contract: right side has one row per (key, ts)
    seen, right_rows = set(), []
    for k, t, v in right_raw:
        if (k, t) not in seen:
            seen.add((k, t))
            right_rows.append((k, t, v))

    left = spark.createDataFrame(
        [(k, float(t)) for k, t in left_rows], "k string, ts double")
    right = spark.createDataFrame(
        [(k, float(t), v) for k, t, v in right_rows],
        "k string, ts double, v int")
    got = sorted(
        (r["k"], r["ts"], r["asof_v"])
        for r in asof_join(left, right, ["k"], "ts", "ts", ["v"],
                           allow_exact=True).collect())

    con = duckdb.connect()
    con.execute("CREATE TABLE l (k VARCHAR, ts DOUBLE)")
    con.executemany("INSERT INTO l VALUES (?, ?)",
                    [(k, float(t)) for k, t in left_rows])
    con.execute("CREATE TABLE r (k VARCHAR, ts DOUBLE, v INT)")
    con.executemany("INSERT INTO r VALUES (?, ?, ?)",
                    [(k, float(t), v) for k, t, v in right_rows])
    want = sorted(map(tuple, con.execute(
        "SELECT l.k, l.ts, r.v FROM l ASOF LEFT JOIN r "
        "ON l.k = r.k AND l.ts >= r.ts").fetchall()))
    assert got == want
