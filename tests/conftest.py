from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from meteomatics_e2e_data_pipeline_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.01")

# The weekly lane (pytest -m slow): randomized hypothesis SWEEPS whose
# operators all keep first-class default-lane coverage — a DuckDB mirror
# entry at sf0.01 (docs_jaccard_join, docs_containment_pairs,
# docs_domain_cap, docs_chunked, dim_date_spine, dim_geo,
# parts_abc_classes, customer_spend_quartiles, events_last_error_asof,
# parts_hierarchy_rollup, docs_dup_clusters_incremental, ...) and/or a
# deterministic exactness test. Deliberately NOT listed (they run every
# time): the union-find components oracle, the ExactSubstr sequential-
# reference pin, and this round's scrub-fixpoint convergence proof.
SLOW_PROPERTY_SWEEPS = {
    "test_incremental_cluster_maintenance_property",
    "test_jaccard_prefix_pairs_property",
    "test_containment_prefix_pairs_property",
    "test_containment_df_cap_is_lossless",
    "test_cap_per_group_skew_safe_property",
    "test_kcore_matches_true_fixpoint_on_random_graphs",
    "test_gram_array_fast_and_chained_forms_identical",
    "test_calendar_functions_match_duckdb",
    "test_surrogate_key_matches_duckdb",
    "test_chunk_tokens_properties",
    "test_global_ntile_property_matches_window",
    "test_global_running_sum_property_matches_window",
    "test_asof_matches_duckdb_on_random_data",
    "test_ancestor_rollup_matches_python_walk",
    # round 12: randomized concurrent-writer serializability sweep (its
    # fixed-seed two-writer exemplar runs in the default lane)
    "test_concurrent_mixed_dml_history_is_serializable",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        name = getattr(item, "originalname", None) or item.name
        if name in SLOW_PROPERTY_SWEEPS:
            item.add_marker(pytest.mark.slow)


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    s = get_spark("tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_smoke() -> str:
    return SF_SMOKE


@pytest.fixture(scope="session")
def sf_oracle() -> str:
    return SF_ORACLE


def pool_bodies(fns: "dict[str, object]", max_workers: int = 8):
    """Run independent heavy test bodies concurrently (the suite's
    runtime-budget lever): Spark job submission is thread-safe and these
    bodies are latency-bound (many small jobs), so overlapping them cuts
    wall-clock without touching any verdict — each body's exception is
    stored and re-raised in its own pytest row. Bodies must not mutate
    process-global state (class attributes, spark conf); tests that do
    stay unpooled."""
    from concurrent.futures import ThreadPoolExecutor

    def run(fn):
        try:
            fn()
            return None
        except BaseException as ex:  # re-raised by the owning test row
            return ex

    with ThreadPoolExecutor(max_workers=min(max_workers, len(fns))) as pool:
        futs = {n: pool.submit(run, f) for n, f in fns.items()}
        return {n: f.result() for n, f in futs.items()}



#: Modules that export a ``_POOLED`` registry of heavy bodies
#: (name -> fn(spark, tmp_path)) or, for test_llm_operators, a
#: ``_POOLED_HEAVY`` registry of (fn, argnames). ONE session-scoped
#: pool runs every registered body together: per-module pools each
#: formed a serial barrier (module A's pool drains before module B's
#: starts); merging them lets the whole suite's heavy tail overlap on
#: 8 threads once, at first touch.
_POOLED_MODULES = (
    "tests.test_star_lakehouse",
    "tests.test_e2e_ingest",
    "tests.test_txlog_maintenance",
    "tests.test_txlog_stream",
    "tests.test_streaming_ops",
    "tests.test_txlog",
    "tests.test_api_datasource",
    "tests.test_ingest_and_runner",
    "tests.test_llm_operators",
)


@pytest.fixture(scope="session")
def heavy_session_results(spark):
    import importlib
    import tempfile
    from pathlib import Path

    ctx = {"spark": spark, "sf_oracle": SF_ORACLE}
    bodies = {}
    for modname in _POOLED_MODULES:
        mod = importlib.import_module(modname)
        for n, item in getattr(mod, "_POOLED", {}).items():
            fn = item
            bodies[f"{modname}::{n}"] = (
                lambda fn=fn: fn(ctx["spark"],
                                 Path(tempfile.mkdtemp(prefix="pool_"))))
        for n, (fn, argnames) in getattr(mod, "_POOLED_HEAVY", {}).items():
            bodies[f"{modname}::{n}"] = (
                lambda fn=fn, a=tuple(argnames): fn(*[ctx[x] for x in a]))
    return pool_bodies(bodies, max_workers=12)
