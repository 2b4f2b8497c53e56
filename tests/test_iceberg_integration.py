"""Skip-gated Iceberg integration: executes the IcebergCatalog path
(sources/tables.py) end-to-end the moment an iceberg-spark-runtime jar is
obtainable — create with a years(ts) partition transform
(≙ tinybird/datasources/incoming_data.datasource:8 toYear(timestamp)),
append, MERGE-based dedup (≙ tinybird/pipes/dedup_log.pipe:4-6), and a
partition-pruned read.

This container ships no Iceberg jar and has no network (verified each
round — SURVEY.md §7.3), so the test SKIPS cleanly here; it turns the
"Iceberg-ready, parquet-verified" scope into executable proof wherever a
jar exists. The flow runs in a SUBPROCESS because the jar must be on the
driver JVM classpath at session-construction time — the shared test
session cannot load it retroactively.
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys
import textwrap

import pytest


def _find_iceberg_jar() -> str | None:
    """Locate an iceberg-spark-runtime jar: explicit env override first,
    then the places a real deployment would have one."""
    env = os.environ.get("ICEBERG_SPARK_JAR")
    if env and os.path.exists(env):
        return env
    candidates: list[str] = []
    try:
        import pyspark

        candidates.append(
            os.path.join(os.path.dirname(pyspark.__file__), "jars")
        )
    except ImportError:  # pragma: no cover
        pass
    if os.environ.get("SPARK_HOME"):
        candidates.append(os.path.join(os.environ["SPARK_HOME"], "jars"))
    candidates += [
        os.path.expanduser("~/.ivy2"),
        os.path.expanduser("~/.m2"),
        "/opt/spark/jars",
        "/usr/share/java",
    ]
    for root in candidates:
        hits = glob.glob(
            os.path.join(root, "**", "iceberg-spark-runtime*.jar"),
            recursive=True,
        )
        if hits:
            return hits[0]
    return None


_JAR = _find_iceberg_jar()

_SUBPROCESS_FLOW = textwrap.dedent(
    """
    import json, sys
    sys.path.insert(0, {repo_root!r})
    from pyspark.sql import SparkSession, functions as F

    warehouse = {warehouse!r}
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("iceberg-integration")
        .config("spark.jars", {jar!r})
        .config(
            "spark.sql.extensions",
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
        )
        .config("spark.sql.catalog.local", "org.apache.iceberg.spark.SparkCatalog")
        .config("spark.sql.catalog.local.type", "hadoop")
        .config("spark.sql.catalog.local.warehouse", warehouse)
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from use_case_real_time_anomaly_detection_spark.sources.tables import (
        IcebergCatalog, get_catalog, iceberg_available,
    )

    out = {{"iceberg_available": iceberg_available(spark)}}
    cat = get_catalog(spark, warehouse)
    out["catalog_class"] = type(cat).__name__

    # three years of (id, ts, value, anomaly_type) log rows
    rows = [
        (i % 5, f"{{2021 + i % 3}}-0{{1 + i % 9}}-15 12:00:0{{i % 10}}",
         float(i), "out-of-range")
        for i in range(300)
    ]
    df = spark.createDataFrame(
        rows, "id int, ts string, value double, anomaly_type string"
    ).withColumn("ts", F.to_timestamp("ts"))

    # S3/F10: create partitioned by years(ts)  (toYear analog)
    cat.create_partitioned(df, "log", [F.partitioning.years("ts")])
    out["created_rows"] = cat.read("log").count()

    # S4: append a second batch
    cat.append(df.limit(10).withColumn("value", F.col("value") + 1000), "log")
    out["after_append"] = cat.read("log").count()

    # S5/S6: MERGE dedup — re-sending an overlapping batch inserts nothing
    cat.merge_dedup(df.limit(50), "log", ["ts", "id", "anomaly_type"])
    out["after_merge"] = cat.read("log").count()

    # partition-pruned read: year filter must prune Iceberg data files
    pruned = cat.read("log").filter(
        F.col("ts") >= F.lit("2023-01-01").cast("timestamp")
    )
    out["pruned_rows"] = pruned.count()
    plan = pruned.queryExecution if False else pruned._jdf.queryExecution()
    out["scan_plan"] = plan.executedPlan().toString()[:4000]
    print("RESULT:" + json.dumps(out))
    spark.stop()
    """
)


@pytest.mark.skipif(
    _JAR is None,
    reason="no iceberg-spark-runtime jar on this machine (offline container; "
    "SURVEY.md §7.3) — set ICEBERG_SPARK_JAR to enable",
)
def test_iceberg_catalog_end_to_end(tmp_path):
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = _SUBPROCESS_FLOW.format(
        repo_root=repo_root, warehouse=str(tmp_path / "wh"), jar=_JAR
    )
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=600,
        env={**os.environ, "PYTHONPATH": repo_root},
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("RESULT:")][-1]
    out = json.loads(line[len("RESULT:"):])
    assert out["iceberg_available"] is True
    assert out["catalog_class"] == "IcebergCatalog"
    assert out["created_rows"] == 300
    assert out["after_append"] == 310
    # overlapping keys already present → MERGE inserted nothing
    assert out["after_merge"] == 310
    assert 0 < out["pruned_rows"] < 310
    # the year filter reached the Iceberg scan (file pruning evidence)
    assert "Iceberg" in out["scan_plan"] or "iceberg" in out["scan_plan"]


def test_iceberg_flow_script_compiles():
    """Runs everywhere (no jar needed): the subprocess flow and the
    IcebergCatalog methods it drives must at least be syntactically valid
    and importable, so jar acquisition is the ONLY missing piece."""
    compile(
        _SUBPROCESS_FLOW.format(repo_root=".", warehouse="/tmp/x", jar="x.jar"),
        "<iceberg-flow>",
        "exec",
    )
    from use_case_real_time_anomaly_detection_spark.sources.tables import (
        IcebergCatalog,
    )

    for meth in (
        "create_partitioned",
        "append",
        "read",
        "overwrite_partitions",
        "merge_dedup",
        "qualified",
    ):
        assert callable(getattr(IcebergCatalog, meth))
