"""Skew-handling operators (north rule: "codec/sr_hz skew handled via
salted repartitioning and AQE").

Three mechanisms, each matched to where skew actually bites this engine:

1. AQE (session.py): skew-join splitting + partition coalescing — the
   built-in half, covers joins and post-shuffle sizes.
2. `salted_repartition` — spread a skewed low-cardinality key (codec:
   ~80% pcm16) across `salt` x tasks for stages with no co-location
   requirement (bulk writes, the storage layout's bucket column —
   sources/tables.py write_clips_layout uses an id-hash bucket, the
   write-time form of the same idea).
3. `chunked_window_cols` — the hard case. Sequence windows
   (lag / rolling stats) hash-partition by the table's partition key:
   ONE task per partition, so at 10^12 rows a hot partition is a
   straggler no matter how many executors exist, and AQE cannot split a
   running window. The scale pattern: bucket the sequence axis into
   fixed chunks, replicate each chunk's last `frame_rows` PRESENT rows
   into the next NON-EMPTY chunk, evaluate the window inside
   (partition, chunk) — parallelism becomes rows/chunk_size per
   partition — then drop the replicas. Exact for frames up to
   `frame_rows` trailing rows provided every non-empty chunk holds
   >= frame_rows rows (empty chunks — seq gaps wider than chunk_size —
   are handled by the chunk directory; verified exactly vs the global
   window, including the gap case, in tests/test_operators_misc.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F


def salted_repartition(
    df: DataFrame,
    key_col: str,
    *,
    salt: int = 16,
    spread_cols: tuple[str, ...] = (),
    num_partitions: int | None = None,
) -> DataFrame:
    """Repartition by (key, per-ROW salt) so one heavy key value fans out
    over up to `salt` tasks.

    The salt is `pmod(xxhash64(key, spread...), salt)` — a per-row
    expression, NOT anything derived from the input partition id: a hot
    key concentrated in few input partitions (the typical skew case —
    data already clustered by key) must still spread over all `salt`
    buckets.

    ``spread_cols`` should be a STABLE row key (e.g. clip_id, event_id):
    the salt is then deterministic under recomputation, which matters at
    scale — a stage retry after a shuffle-fetch failure recomputes map
    tasks, and a nondeterministic salt would route the recomputed rows
    to different buckets (the SPARK-23207 class of duplicated/lost
    rows). With no ``spread_cols`` the fallback spread is
    xxhash64 over ALL the row's columns — derived from row CONTENT, so
    it is retry-stable too; fully identical rows share a bucket, which
    only matters if one duplicated row dominates the key's volume.
    """
    spread = (
        [F.col(c) for c in spread_cols]
        if spread_cols
        else [F.xxhash64(*[F.col(c) for c in df.columns])]
    )
    salt_col = F.pmod(F.xxhash64(F.col(key_col), *spread), F.lit(salt))
    if num_partitions is not None:
        return df.repartition(num_partitions, F.col(key_col), salt_col)
    return df.repartition(F.col(key_col), salt_col)


def chunked_cusum_cols(
    df: DataFrame,
    *,
    partition_col: str,
    seq_col: str,
    key_col: str,
    y_cols: dict[str, Column],
    chunk_size: int,
) -> DataFrame:
    """Exact distributed CUSUM statistics without one-task-per-partition.

    For each entry ``name → y`` computes ``__{name}`` = the CUSUM value
    S_t = P_t − min(0, min_{j≤t} P_j) over prefix sums P of ``y`` in
    (seq, key) order — the same closed form the compiler's single-window
    path evaluates — but as a TWO-LEVEL prefix decomposition (the
    functions/packing.py idiom), so a 10^12-row partition is processed
    by rows/chunk_size parallel tasks instead of one straggler:

    1. per (partition, chunk): in-chunk prefix sum p and running min m —
       parallel across chunks;
    2. chunk directory (one row per non-empty chunk — tiny): exclusive
       cumulative offsets O_c = Σ T_{c'<c} and prefix mins
       G_c = min_{c'<c}(O_{c'} + M_{c'}) over per-chunk totals/mins;
    3. broadcast the directory back: P = O_c + p,
       S = P − least(0, G_c, O_c + m).

    Unlike the bounded-frame replica trick (chunked_window_cols), this
    decomposition is exact UNCONDITIONALLY — prefix sums and prefix
    mins split perfectly at any chunk boundary, empty chunks (seq gaps)
    simply don't appear in the directory, and decimal arithmetic keeps
    every value bit-equal to the single-window plan (asserted across
    chunk sizes in tests/test_cusum_rule.py). Rows whose y is NULL get
    a NULL in-chunk prefix where the global plan would carry the prior
    sum — those are exactly the never-flagged NULL-value rows, so the
    violation sets are identical.
    """
    if chunk_size < 1:
        raise ValueError("chunk_size must be >= 1")
    zero = F.lit(0).cast("decimal(38,6)")
    base = df.withColumn("__chunk", F.floor(F.col(seq_col) / chunk_size))
    w_in = (
        Window.partitionBy(partition_col, "__chunk")
        .orderBy(seq_col, key_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    base = base.select(
        "*",
        *[
            F.sum(y).over(w_in).cast("decimal(38,6)").alias(f"__p_{n}")
            for n, y in y_cols.items()
        ],
    )
    base = base.select(
        "*",
        *[F.min(f"__p_{n}").over(w_in).alias(f"__m_{n}") for n in y_cols],
    )

    # chunk directory: per-chunk total (prefix value at the chunk's last
    # present row — trailing NULL-y rows don't move it) and per-chunk
    # min — ONE row per non-empty chunk, so the two window layers below
    # run over a relation of rows/chunk_size entries (tiny), exactly the
    # packing.py subtotal-rollup shape
    last = F.struct(F.col(seq_col), F.col(key_col))
    directory = base.groupBy(partition_col, "__chunk").agg(
        *[F.max_by(f"__p_{n}", last).alias(f"__T_{n}") for n in y_cols],
        *[F.min(f"__p_{n}").alias(f"__M_{n}") for n in y_cols],
    )
    w_prev = (
        Window.partitionBy(partition_col)
        .orderBy("__chunk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # layer 1: exclusive offsets O_c; layer 2: G_c = min_{c'<c}(O + M)
    for n in y_cols:
        directory = directory.withColumn(
            f"__O_{n}",
            F.coalesce(F.sum(f"__T_{n}").over(w_prev).cast("decimal(38,6)"), zero),
        )
    for n in y_cols:
        directory = directory.withColumn(
            f"__G_{n}", F.min(F.col(f"__O_{n}") + F.col(f"__M_{n}")).over(w_prev)
        )
    slim = directory.select(
        partition_col,
        "__chunk",
        *[F.col(f"__O_{n}") for n in y_cols],
        *[F.col(f"__G_{n}") for n in y_cols],
    )

    base = base.join(F.broadcast(slim), [partition_col, "__chunk"], "left")
    for n in y_cols:
        p_glob = F.col(f"__O_{n}") + F.col(f"__p_{n}")
        floor_min = F.least(
            zero, F.col(f"__G_{n}"), F.col(f"__O_{n}") + F.col(f"__m_{n}")
        )
        base = base.withColumn(f"__{n}", (p_glob - floor_min).cast("decimal(38,6)"))
    drop = ["__chunk"]
    for n in y_cols:
        drop += [f"__p_{n}", f"__m_{n}", f"__O_{n}", f"__G_{n}"]
    return base.drop(*drop)


def chunked_window_cols(
    df: DataFrame,
    *,
    partition_col: str,
    seq_col: str,
    frame_rows: int,
    chunk_size: int,
    cols_builder: Callable[[WindowSpec], list[Column]],
) -> DataFrame:
    """Evaluate trailing-frame window columns without one-task-per-key.

    ``cols_builder(window_spec)`` returns the window Column expressions
    (lag / avg / stddev over ``rowsBetween`` frames bounded by
    ``frame_rows`` trailing rows). The columns are computed over a
    (partition, chunk) window where each chunk is ``chunk_size`` wide on
    the sequence axis and is prefixed with a replica of the previous
    NON-EMPTY chunk's last ``frame_rows`` present rows, so every
    non-replica row sees its full trailing frame even across seq gaps
    wider than a chunk. Replica rows are dropped before returning —
    output rows == input rows, with the window columns attached,
    identical to the global window provided each non-empty chunk
    contains >= frame_rows rows.
    """
    if chunk_size <= frame_rows:
        raise ValueError("chunk_size must exceed frame_rows")

    chunk = F.floor(F.col(seq_col) / chunk_size)
    own = df.withColumn("__chunk", chunk).withColumn("__replica", F.lit(False))

    # Chunk directory: each NON-EMPTY chunk's successor non-empty chunk.
    # Tails must replicate into the next chunk that actually has rows —
    # chunk+1 may be empty (a seq gap wider than chunk_size: exactly the
    # data a GapRule violation describes), and routing the tail there
    # would leave the next present row with a NULL lag instead of its
    # true predecessor. The directory is rows/chunk_size entries (tiny
    # relative to the data; chunk_size is chosen ≫ frame_rows), so the
    # join back is a broadcast.
    w_next = Window.partitionBy(partition_col).orderBy("__chunk0")
    nxt = (
        df.select(F.col(partition_col), chunk.alias("__chunk0"))
        .distinct()
        .withColumn("__next", F.lead("__chunk0").over(w_next))
        .filter(F.col("__next").isNotNull())
    )

    # last `frame_rows` PRESENT rows of each chunk (row_number over the
    # chunk-local window — still skew-free: keyed by (partition, chunk))
    w_tail = Window.partitionBy(partition_col, "__chunk0").orderBy(F.desc(seq_col))
    tail = (
        df.withColumn("__chunk0", chunk)
        .withColumn("__rn", F.row_number().over(w_tail))
        .filter(F.col("__rn") <= frame_rows)
        .drop("__rn")
        .join(F.broadcast(nxt), [partition_col, "__chunk0"])
        .withColumn("__chunk", F.col("__next"))
        .drop("__chunk0", "__next")
        .withColumn("__replica", F.lit(True))
    )

    u = own.unionByName(tail)
    w = Window.partitionBy(partition_col, "__chunk").orderBy(seq_col)
    out = u.select("*", *cols_builder(w))
    return out.filter(~F.col("__replica")).drop("__chunk", "__replica")
