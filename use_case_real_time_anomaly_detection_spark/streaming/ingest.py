"""Streaming corpus ingestion: dedup-before-append as a stream sink.

The reference's copy pipes make data visible only after dedup
(≙ `tinybird/pipes/dedup_log.pipe:4-6` — new rows anti-joined against
the target before the append). This sink applies the same contract to
a document stream feeding a training corpus: each micro-batch passes
through `functions/incremental.dedup_gate` (exact + near gates against
the corpus built so far AND within the batch), and only admitted docs —
plus their slim signature-index rows — are committed.

Exactly-once effect without a transactional table format: every table
(corpus, hash index, band index) is partitioned by micro-batch id and
written with dynamic partition overwrite, so a replayed batch (failure
between sink write and stream-checkpoint commit) overwrites its own
partition instead of appending duplicates — the same idempotence
mechanism as `streaming/checkpoint.py`. On Iceberg the three writes
would instead be one MERGE commit (`sources/tables.IcebergCatalog`).

Scale: per batch, corpus-side cost is two index scans (slim relations)
plus text of near-candidate docs only; the batch side is broadcast
everywhere (see `functions/incremental` docstring). Doc ids are assumed
globally unique across batches (producer-assigned — same assumption the
reference's event stream makes for event keys).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.dedup import (
    N_HASHES,
    ROWS_PER_BAND,
    SHINGLE_N,
    _signatures_from_shingles,
    band_frame,
    shingles,
)
from ..functions.incremental import SignatureIndex, admit, dedup_gate
from ..sources.tables import ParquetCatalog

CORPUS_TABLE = "corpus"
HASH_TABLE = "corpus_hashes"
BAND_TABLE = "corpus_bands"


def ingest_batch(
    batch_df: DataFrame,
    batch_id: int,
    catalog: ParquetCatalog,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float | None = 0.5,
    n_hashes: int = N_HASHES,
    rows_per_band: int = ROWS_PER_BAND,
    shingle_n: int = SHINGLE_N,
) -> DataFrame:
    """Gate one batch against the corpus-so-far and commit the
    admitted docs + their index rows. Returns the gate verdicts
    (materialized — safe to inspect after the writes).

    Usable directly for batch backfills; `stream_corpus_ingest` wires it
    into foreachBatch."""
    have_corpus = catalog.exists(CORPUS_TABLE)
    corpus = catalog.read(CORPUS_TABLE) if have_corpus else None
    index = (
        SignatureIndex(
            hashes=catalog.read(HASH_TABLE), bands=catalog.read(BAND_TABLE)
        )
        if have_corpus
        else None
    )
    # localCheckpoint BEFORE any write: the gate's corpus/index reads
    # must finish while the tables are still the pre-batch snapshot —
    # a lazy plan evaluated after the first commit below would list the
    # table mid-update (self-referential read-under-write).
    gate = dedup_gate(
        batch_df,
        corpus,
        index=index,
        id_col=id_col,
        text_col=text_col,
        threshold=threshold,
        n_hashes=n_hashes,
        rows_per_band=rows_per_band,
        shingle_n=shingle_n,
    ).localCheckpoint()
    admitted = admit(batch_df, gate, id_col=id_col).localCheckpoint()

    tagged = admitted.withColumn("__batch", F.lit(batch_id))
    catalog.overwrite_partitions(tagged, CORPUS_TABLE, partition_by=["__batch"])
    # index rows for the admitted docs (batch-sized recompute; the
    # corpus-sized index is never rebuilt)
    hashes = admitted.select(
        F.col(id_col), F.md5(F.col(text_col)).alias("text_hash")
    ).withColumn("__batch", F.lit(batch_id))
    catalog.overwrite_partitions(hashes, HASH_TABLE, partition_by=["__batch"])
    sig = _signatures_from_shingles(
        shingles(admitted, id_col, text_col, shingle_n),
        id_col=id_col,
        n_hashes=n_hashes,
    )
    bands = band_frame(
        sig, id_col=id_col, n_hashes=n_hashes, rows_per_band=rows_per_band
    ).withColumn("__batch", F.lit(batch_id))
    catalog.overwrite_partitions(bands, BAND_TABLE, partition_by=["__batch"])
    return gate


def stream_corpus_ingest(
    doc_stream: DataFrame,
    catalog: ParquetCatalog,
    *,
    checkpoint_dir: str,
    threshold: float | None = 0.5,
    available_now: bool = True,
    on_batch=None,
    **gate_params,
):
    """Continuous dedup-gated corpus ingestion from a streaming source.
    ``on_batch(gate_df, batch_id)`` (optional) observes each batch's
    verdicts — e.g. to log admission rates."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        gate = ingest_batch(
            batch_df, batch_id, catalog, threshold=threshold, **gate_params
        )
        if on_batch is not None:
            on_batch(gate, batch_id)

    writer = (
        doc_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime="1 minute")
    return writer.start()
