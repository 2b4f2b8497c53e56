"""Endpoint response envelope — the reference's visible API surface.

≙ the JSON body every reference endpoint returns
(tutorials/z-score.md:195-225): a ``meta`` array of (name, type), the
``data`` rows, ``rows``, and a ``statistics`` object (elapsed /
rows_read / bytes_read). This is a presentation-layer helper: the caller
passes an endpoint-sized DataFrame (the reference's endpoints are
filtered/aggregated result sets, not table scans), and the collect here
is the API response materialization, not a compute step.
"""

from __future__ import annotations

import time
from typing import Any

from pyspark.sql import DataFrame

# Spark simpleString → ClickHouse-style type names used by the reference
# envelope's meta block (best-effort; unmapped types pass through).
_TYPE_NAMES = {
    "bigint": "Int64",
    "int": "Int32",
    "smallint": "Int16",
    "tinyint": "Int8",
    "double": "Float64",
    "float": "Float32",
    "string": "String",
    "boolean": "UInt8",
    "timestamp": "DateTime",
    "timestamp_ntz": "DateTime",
    "date": "Date",
}


def response_envelope(
    df: DataFrame,
    *,
    rows_read: int | None = None,
    bytes_read: int | None = None,
) -> dict[str, Any]:
    """Materialize ``df`` as the reference's endpoint response envelope.

    ``rows_read`` is the SOURCE scan count in the reference's envelope,
    not the result size — callers that know it pass it; when unknown it
    is omitted rather than faked from len(data). Boolean columns are
    labeled UInt8 in meta, so their data values are emitted as 1/0 to
    match (the reference never serializes true/false under UInt8)."""
    t0 = time.time()
    rows = df.collect()
    elapsed = time.time() - t0
    bool_cols = {f.name for f in df.schema.fields if f.dataType.simpleString() == "boolean"}
    data = []
    for r in rows:
        d = r.asDict(recursive=True)
        for k, v in d.items():
            if hasattr(v, "isoformat"):  # DateTime → the envelope's string form
                d[k] = v.isoformat(sep=" ")
            elif k in bool_cols and v is not None:
                d[k] = int(v)
        data.append(d)
    statistics: dict[str, Any] = {"elapsed": elapsed}
    if rows_read is not None:
        statistics["rows_read"] = rows_read
    statistics["bytes_read"] = bytes_read if bytes_read is not None else 0
    return {
        "meta": [
            {
                "name": f.name,
                "type": _TYPE_NAMES.get(f.dataType.simpleString(), f.dataType.simpleString()),
            }
            for f in df.schema.fields
        ],
        "data": data,
        "rows": len(data),
        "statistics": statistics,
    }
