"""Text-analysis building blocks for the LLM-data-pipeline operators.

All pure built-in expressions (whole-stage codegen, no Python in the hot
path). The md5-derived 48-bit base hash is chosen for *cross-engine
reproducibility*: Spark's ``xxhash64``/``hash`` and DuckDB's ``hash`` are
different functions, but ``md5`` hex is identical everywhere, and 12 hex
digits fit a BIGINT exactly the same way on both sides — so every
downstream sketch (MinHash, SimHash) is oracle-checkable bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Modulus for MinHash permutations: a prime below 2^48 so that
# a*h + b (a < 2^6, h < 2^48) stays well inside BIGINT range.
MINHASH_P = 281474976710597

# Small multilingual stopword tables for the language-ID heuristic.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to", "in", "is"),
    "de": ("der", "die", "das", "und", "ist", "ein", "nicht"),
    "es": ("el", "la", "los", "que", "y", "es", "una"),
    "fr": ("le", "la", "les", "et", "est", "une", "pas"),
    "zh": ("的", "是", "了", "在", "我", "有", "不"),
}
# Deterministic priority when scores tie (argmax order).
LANG_ORDER = ("en", "de", "es", "fr", "zh")


def spread_for_fanout(df, key: str):
    """Repartition a too-narrow input before CPU-heavy fan-out.

    Shingling/hashing uses higher-order functions that Spark evaluates
    interpreted (not codegen), and media extraction runs Python batches —
    per-core throughput is the bottleneck, so a single-file scan would pin
    the whole chain to one task. Only rebalances when the scan has fewer
    partitions than cores: on a real lake (many files / AQE-planned
    splits) this is a no-op, so the extra shuffle is never paid at the
    scale where it would hurt.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    # Decide from the SOURCE file listing, not df.rdd.getNumPartitions():
    # converting to an RDD forces full physical planning (and under AQE
    # can execute stages) just to ask a question. File count is a cheap
    # proxy — it under-counts splits of huge files (maxPartitionBytes
    # would split them anyway), so the worst case is one redundant
    # key-hash shuffle on a few-files source, paid only where the
    # downstream is CPU-bound fan-out work.
    try:
        n_files = len(df.inputFiles())
    except Exception:  # noqa: BLE001 - treat as unknown source shape
        n_files = 0
    if n_files == 0:
        # non-file source (createDataFrame, in-memory relation): file
        # count says nothing, so fall back to asking the RDD — these
        # frames are small/test-shaped, where the planning cost is noise
        # but losing the spread would serialize the Python fan-out stage
        n_parts = df.rdd.getNumPartitions()
        return df.repartition(target, F.col(key)) if n_parts < target else df
    if n_files < target:
        return df.repartition(target, F.col(key))
    return df


def normalize_text(c: Column) -> Column:
    """Canonical form for exact dedup: lowercase, collapse runs of
    whitespace, trim. Collapse happens BEFORE trim — Spark's ``trim``
    strips only 0x20 spaces, so a leading/trailing tab or newline would
    otherwise survive collapse as a stray space and split a dedup
    group."""
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def content_hash(c: Column) -> Column:
    """Exact-dedup key: md5 of the normalized text."""
    return F.md5(normalize_text(c))


def tokens(c: Column) -> Column:
    """Whitespace tokenization (array<string>)."""
    return F.split(F.trim(c), r"\s+")


def base_hash48(c: Column) -> Column:
    """48-bit integer hash of a string via md5 — identical in DuckDB as
    ``('0x' || substr(md5(s), 1, 12))::BIGINT``."""
    return F.conv(F.substring(F.md5(c), 1, 12), 16, 10).cast("bigint")


BASE_HASH48_SQL = "('0x' || substr(md5({c}), 1, 12))::BIGINT"


def chunk_tokens(tok: Column, chunk_size: int, stride: int) -> Column:
    """Array of overlapping token chunks (each rejoined with spaces) —
    the standard training-data chunking shape: windows of ``chunk_size``
    tokens starting every ``stride`` tokens (overlap = chunk_size −
    stride). The trailing partial window is kept. Row-local (the chunk
    fan-out is an explode, not a shuffle)."""
    if stride <= 0 or chunk_size <= 0:
        raise ValueError("chunk_size and stride must be positive")
    overlap = chunk_size - stride
    # starts: 0, stride, 2*stride, ... — but a start whose window would
    # be a strict SUBSET of the previous chunk (possible whenever
    # n mod stride <= overlap) is not emitted: such a tail chunk adds no
    # new tokens and would duplicate training content. Chunk count is
    # ceil((n - overlap) / stride), min 1 — capped at ceil(n / stride)
    # because with stride > chunk_size (gap sampling, negative overlap)
    # the first formula counts a start past the end of the array, which
    # would emit an empty chunk (found by the hypothesis property test).
    n_chunks = F.greatest(
        F.least(F.ceil((F.size(tok) - overlap) / stride),
                F.ceil(F.size(tok) / stride)).cast("int"),
        F.lit(1))
    return F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.concat_ws(
            " ", F.slice(tok, i * stride + 1, chunk_size)),
    )


def lang_score(tok: Column, lang: str) -> Column:
    """Stopword-hit count for one language over the token array."""
    arr = F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])
    return F.size(F.filter(tok, lambda t: F.array_contains(arr, t)))


def lang_guess(tok: Column) -> Column:
    """Argmax language by stopword hits; 'und' (undetermined) when every
    score is zero. Ties resolve to the earliest LANG_ORDER entry — the
    same CASE shape the DuckDB oracle uses, so results match exactly."""
    scores = {lang: lang_score(tok, lang) for lang in LANG_ORDER}
    best = F.greatest(*scores.values())
    out = F.lit("und")
    for lang in reversed(LANG_ORDER):
        out = F.when(scores[lang] == best, F.lit(lang)).otherwise(out)
    return F.when(best == 0, F.lit("und")).otherwise(out)
