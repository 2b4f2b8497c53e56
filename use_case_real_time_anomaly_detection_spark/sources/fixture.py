"""Wide sensor-matrix fixture — the reference's CSV dataset-to-file sink.

≙ `data-generator/anomaly-dataset-to-file.py:169-180` (S7 in SURVEY §2):
the reference assembles one row per timestamp with a column per sensor
("Timestamp", "sensor 1", …, "sensor N") and writes a header CSV used as
a test/demo fixture. Spark-first rendition: the long (id, ts, value)
fact table pivots to the wide matrix (groupBy(ts).pivot(id)), which is
also a generally useful export shape (feature matrix per timestamp).

`max(value)` (not first) aggregates duplicate (id, ts) reports so the
matrix is deterministic — the reference generator never emits such
duplicates, making the two semantics identical on its data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sensor_matrix(
    events: DataFrame,
    *,
    id_col: str = "id",
    ts_col: str = "ts",
    value_col: str = "value",
    ids: list | None = None,
) -> DataFrame:
    """One row per timestamp, one column per sensor id (column name =
    the id's string form, matching SQL PIVOT naming). Pass ``ids`` to
    skip the distinct-values job Spark otherwise runs to plan the pivot
    (at scale the sensor list is a known dimension, not a discovery)."""
    g = events.groupBy(ts_col)
    piv = g.pivot(id_col, ids) if ids is not None else g.pivot(id_col)
    return piv.agg(F.max(value_col))


def write_csv_fixture(
    events: DataFrame,
    path: str,
    *,
    id_col: str = "id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> None:
    """Write the reference's wide CSV fixture: header
    ``Timestamp, sensor <id>, ...``, rows ordered by timestamp.

    Fixture-sized by contract (≙ the reference's generator writes ONE
    csv file): the sensor list collects to the driver to fix column
    order, and the output coalesces to a single part file. At scale the
    wide matrix itself (`sensor_matrix`) stays distributed — only this
    single-file CSV rendering is inherently small."""
    ids = [r[0] for r in events.select(id_col).distinct().orderBy(id_col).collect()]
    wide = (
        sensor_matrix(
            events, id_col=id_col, ts_col=ts_col, value_col=value_col, ids=ids
        )
        .select(
            F.col(ts_col).alias("Timestamp"),
            *[F.col(str(i)).alias(f"sensor {i}") for i in ids],
        )
        .orderBy("Timestamp")
    )
    wide.coalesce(1).write.option("header", True).mode("overwrite").csv(path)
