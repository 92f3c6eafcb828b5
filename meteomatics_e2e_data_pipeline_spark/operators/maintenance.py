"""Lake maintenance: small-file compaction.

Incremental appends (``upsert_by_key``/``append_only``) accrete one file
set per batch; after months of daily runs a partition holds hundreds of
tiny files and scan cost is dominated by per-file overhead. Compaction
rewrites a partition's data into a bounded file count.

Safety protocol on plain parquet (no transactional log): write the
compacted copy to a sibling temp dir first, then swap directories — a
crash before the swap leaves the original untouched; a crash during the
swap leaves the temp dir for manual recovery. On Delta/Iceberg, use the
format's OPTIMIZE instead; this operator is the vanilla-parquet
equivalent.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def compact_parquet(spark: SparkSession, path: str,
                    target_files: int = 1) -> dict[str, int]:
    """Rewrite the parquet data at ``path`` into ``target_files`` files
    (per partition directory if the layout is partitioned — the
    repartition key is the partition column set, preserved by the
    partitioned rewrite). Returns {'files_before', 'files_after',
    'rows'} for observability."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(conf)

    def count_files(p) -> int:
        it = fs.listFiles(p, True)
        n = 0
        while it.hasNext():
            f = it.next()
            if f.getPath().getName().endswith(".parquet"):
                n += 1
        return n

    before = count_files(hpath)
    df = spark.read.parquet(path)
    rows = df.count()
    # Detect hive partition columns by walking ONE leaf file's path and
    # collecting every col=value segment between the root and the file —
    # inspecting only the first directory level would rewrite a
    # multi-level layout (e.g. country=/city=) with just the outer column,
    # silently collapsing the inner level into data files and losing its
    # partition pruning.
    part_cols: list[str] = []
    it = fs.listFiles(hpath, True)
    root_uri = hpath.getFileSystem(conf).makeQualified(hpath).toString()
    while it.hasNext():
        f = it.next()
        p = f.getPath()
        if not p.getName().endswith(".parquet"):
            continue
        rel = p.toString()[len(root_uri):].strip("/")
        part_cols = [seg.split("=", 1)[0]
                     for seg in rel.split("/")[:-1] if "=" in seg]
        break

    tmp = path.rstrip("/") + "__compacting"
    writer = df.repartition(target_files) if not part_cols else \
        df.repartition(target_files, *part_cols)
    w = writer.write.mode("overwrite")
    if part_cols:
        w = w.partitionBy(*part_cols)
    w.parquet(tmp)

    backup = jvm.org.apache.hadoop.fs.Path(path.rstrip("/") + "__precompact")
    tmp_p = jvm.org.apache.hadoop.fs.Path(tmp)
    fs.rename(hpath, backup)
    fs.rename(tmp_p, hpath)
    fs.delete(backup, True)
    after = count_files(hpath)
    return {"files_before": before, "files_after": after, "rows": rows}


def profile_table(df, cols=None):
    """Data-quality profile: one output row per column with row count,
    null count, null fraction, and exact distinct count — the summary a
    warehouse surfaces as ``DESCRIBE``/``ANALYZE`` statistics and the
    first artifact a curation pipeline materializes per ingest.

    Scale shapes: a SINGLE aggregation pass computes every column's
    metrics (Spark plans the multi-distinct via one Expand — ~|cols|×
    row duplication map-side, one shuffle keyed on the expand id; for
    very wide tables at extreme scale swap exact distincts for
    approx_count_distinct per column). The per-column unpivot happens on
    the 1-row aggregate, so it is free. Values (min/max/avg) are left
    out deliberately: stringified extremes are type- and engine-
    dependent, while the count metrics are exact and portable.
    """
    from pyspark.sql import functions as F

    cols = list(cols or df.columns)
    # Names are interpolated into the stack() SQL below — reject
    # anything that could misparse there (quotes, backticks, spaces)
    # with a clear error instead of a malformed expression.
    import re
    bad = [c for c in cols if not re.fullmatch(r"[A-Za-z0-9_]+", c)]
    if bad:
        raise ValueError(
            f"profile_table requires [A-Za-z0-9_]+ column names, got {bad}")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
                    .cast("bigint").alias(f"__nulls_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"__nd_{c}"))
    one = df.agg(*aggs)
    stack = ", ".join(
        f"'{c}', __nulls_{c}, __nd_{c}" for c in cols)
    return (
        one.select(
            F.col("__n").alias("n_rows"),
            F.expr(f"stack({len(cols)}, {stack})")
            .alias("column", "n_nulls", "n_distinct"))
        .select("column", "n_rows", "n_nulls", "n_distinct",
                F.round(F.col("n_nulls") / F.col("n_rows"), 6)
                .alias("null_frac"))
    )


def conform_schema(df, target_schema):
    """Schema conformance for evolved lakes: project ``df`` onto
    ``target_schema`` — missing columns appear as typed NULLs, present
    columns are cast to the target type, extra columns are dropped, and
    output column order matches the target. Combined with
    ``spark.read.option("mergeSchema", "true")`` this is the read-side
    half of schema evolution: old files (written before a column
    existed) and new files conform to one contract without rewriting
    history. Row-local projection — zero shuffles at any scale.
    """
    from pyspark.sql import functions as F

    cols = []
    have = {f.name for f in df.schema.fields}
    for field in target_schema.fields:
        if field.name in have:
            cols.append(F.col(field.name).cast(field.dataType)
                        .alias(field.name))
        else:
            cols.append(F.lit(None).cast(field.dataType)
                        .alias(field.name))
    return df.select(*cols)
