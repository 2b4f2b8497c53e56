"""HTTP publication layer (serving.py) — end-to-end over a live server.

≙ the reference's API surface: endpoint URLs + params
(/root/reference/readme.md:36-40), pipe-scoped tokens
(pipes/out_of_range.pipe:6-8), template-time error()
(out_of_range.pipe:28), Events API NDJSON append with
successful/quarantined row counts
(data-generator/anomaly-dataset-live.py:204-208).
"""

from __future__ import annotations

import json
import urllib.error
import urllib.request

import pytest

from use_case_real_time_anomaly_detection_spark.plans import detectors as D
from use_case_real_time_anomaly_detection_spark.serving import (
    AnalyticsAPIServer,
    EventStore,
    ParamSpec,
    PipeError,
    TokenAuth,
    default_pipes,
)

NDJSON = "\n".join(
    json.dumps(e)
    for e in [
        # sensor 1: steady values then a spike (out-of-range + z-score bait)
        {"id": 1, "timestamp": "2024-01-01T00:00:00", "value": "100.0"},
        {"id": 1, "timestamp": "2024-01-01T00:01:00", "value": "101.0"},
        {"id": 1, "timestamp": "2024-01-01T00:02:00", "value": "99.0"},
        {"id": 1, "timestamp": "2024-01-01T00:03:00", "value": "100.5"},
        {"id": 1, "timestamp": "2024-01-01T00:04:00", "value": "900.0"},
        # sensor 2: stopped reporting early (timeout bait)
        {"id": 2, "timestamp": "2024-01-01T00:00:30", "value": "50.0"},
        # malformed rows -> quarantined by the declared-schema parse
        {"id": "not-an-int", "timestamp": "2024-01-01T00:05:00", "value": "1"},
        {"id": 3, "timestamp": "garbage", "value": "1"},
    ]
)
N_GOOD, N_BAD = 6, 2


def _get(url: str, token: str | None = None):
    req = urllib.request.Request(url)
    if token:
        req.add_header("Authorization", f"Bearer {token}")
    with urllib.request.urlopen(req) as r:
        return r.status, json.loads(r.read())


def _get_err(url: str, token: str | None = None):
    try:
        return _get(url, token)
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _post(url: str, body: str, token: str | None = None):
    req = urllib.request.Request(url, data=body.encode(), method="POST")
    if token:
        req.add_header("Authorization", f"Bearer {token}")
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


@pytest.fixture(scope="module")
def server(spark, tmp_path_factory):
    store = EventStore(spark, str(tmp_path_factory.mktemp("events") / "pq"))
    auth = TokenAuth(
        {
            "admin-secret": {"ADMIN"},
            "oor-read": {"PIPES:READ:out_of_range"},
            "append-only": {"DATASOURCES:APPEND:incoming_data"},
        }
    )
    srv = AnalyticsAPIServer(store, auth=auth).start()
    yield srv
    srv.shutdown()


@pytest.fixture(scope="module")
def base(server):
    return f"http://127.0.0.1:{server.port}"


@pytest.fixture(scope="module")
def ingested(base):
    code, resp = _post(
        f"{base}/v0/events?name=incoming_data", NDJSON, token="append-only"
    )
    assert code == 200
    return resp


def test_events_api_counts(ingested):
    assert ingested == {
        "successful_rows": N_GOOD,
        "quarantined_rows": N_BAD,
    }


def test_endpoint_envelope_and_rows(base, ingested):
    code, body = _get(
        f"{base}/v0/pipes/out_of_range.json"
        "?min_value=0&max_value=200&detect_window_seconds=600",
        token="oor-read",
    )
    assert code == 200
    # the reference's response envelope shape (tutorials/z-score.md:195-225)
    assert set(body) == {"meta", "data", "rows", "statistics"}
    assert body["rows"] == 1
    (row,) = body["data"]
    assert row["id"] == 1 and row["value"] == 900.0
    assert {m["name"] for m in body["meta"]} == {
        "id", "ts", "value", "min_value", "max_value",
    }
    assert "elapsed" in body["statistics"]


def test_endpoint_matches_direct_plan(spark, base, server, ingested):
    """Server result == calling the plan function directly."""
    code, body = _get(
        f"{base}/v0/pipes/timeout.json?seconds=120", token="admin-secret"
    )
    assert code == 200
    ev = server.store.events()
    direct = D.timeout(ev, D.frontier_ts(ev), seconds=120).collect()
    assert body["rows"] == len(direct) == 1
    assert body["data"][0]["id"] == direct[0]["id"] == 2


def test_param_coercion_error_is_400(base, ingested):
    code, body = _get_err(
        f"{base}/v0/pipes/timeout.json?seconds=abc", token="admin-secret"
    )
    assert code == 400 and "seconds" in body["error"]


def test_template_error_no_thresholds_is_400(base, ingested):
    # ≙ out_of_range.pipe:28 {{ error(...) }} when neither bound given
    code, body = _get_err(
        f"{base}/v0/pipes/out_of_range.json", token="oor-read"
    )
    assert code == 400 and "threshold" in body["error"]


def test_unknown_pipe_404(base):
    code, body = _get_err(f"{base}/v0/pipes/nope.json", token="admin-secret")
    assert code == 404


def test_token_scope_enforced(base, ingested):
    # no token
    code, _ = _get_err(f"{base}/v0/pipes/out_of_range.json?min_value=0")
    assert code == 403
    # wrong scope: read token cannot append
    code, _ = _post(f"{base}/v0/events?name=incoming_data", "{}", token="oor-read")
    assert code == 403
    # append token cannot read other pipes
    code, _ = _get_err(
        f"{base}/v0/pipes/most_recent.json", token="append-only"
    )
    assert code == 403
    # pipe-scoped token reads its own pipe only
    code, _ = _get(
        f"{base}/v0/pipes/out_of_range.json?min_value=0", token="oor-read"
    )
    assert code == 200
    code, _ = _get_err(f"{base}/v0/pipes/ui_ids.json", token="oor-read")
    assert code == 403


def test_sensor_id_filter(base, ingested):
    code, body = _get(
        f"{base}/v0/pipes/get_data.json?minutes=600&sensor_id=2",
        token="admin-secret",
    )
    assert code == 200
    assert body["rows"] == 1 and body["data"][0]["id"] == 2


def test_monitor_logs_computes_fused_log(base, ingested):
    """monitor/get_anomalies fall back to the fused violations_log."""
    code, body = _get(
        f"{base}/v0/pipes/get_anomalies.json?hours=48", token="admin-secret"
    )
    assert code == 200
    types = {r["anomaly_type"] for r in body["data"]}
    # the spike trips out-of-range (default bounds) at minimum
    assert "out-of-range" in types
    # anomaly_type String param filters
    code, body = _get(
        f"{base}/v0/pipes/get_anomalies.json?hours=48&anomaly_type=out-of-range",
        token="admin-secret",
    )
    assert {r["anomaly_type"] for r in body["data"]} == {"out-of-range"}


def test_pipe_listing(base):
    code, body = _get(f"{base}/v0/pipes", token="admin-secret")
    assert code == 200
    names = {p["name"] for p in body["pipes"]}
    assert {"out_of_range", "rate_of_change", "timeout", "z_score", "iqr",
            "most_recent", "ui_ids", "get_data", "data", "monitor_logs",
            "get_anomalies"} <= names


def test_paramspec_binding_unit():
    p = ParamSpec("x", "Int16", default=5)
    assert p.bind(None) == 5 and p.bind("7") == 7
    with pytest.raises(PipeError):
        p.bind("99999")  # out of Int16 range
    with pytest.raises(PipeError):
        ParamSpec("y", "Int32", required=True).bind(None)


def test_driver_events_shape_store(spark, tmp_path):
    """EventStore reads the driver's events.parquet shape (user_id->id)."""
    store = EventStore(spark, "/root/testdata/sf0.001/events.parquet")
    ev = store.events()
    assert set(ev.columns) == {"id", "ts", "value", "event_id"}
    pipes = default_pipes()
    df = pipes["ui_ids"].builder(store, {})
    assert df.count() > 0


def test_materialized_copy_log_cycle(spark, tmp_path):
    """The copy-pipe architecture: tick() materializes detections, the
    consumer endpoint reads the materialization (NOT a per-request
    recompute), and re-ticking is idempotent (at-least-once append +
    key dedup, the copy_log contract)."""
    from use_case_real_time_anomaly_detection_spark.serving import (
        AnalyticsAPIServer,
        EventStore,
        MaterializedCopyLog,
    )

    store = EventStore(spark, str(tmp_path / "ev"))
    store.append_ndjson(NDJSON)
    mat = MaterializedCopyLog(store, str(tmp_path / "copylog"))
    n1 = mat.tick()
    assert n1 > 0
    assert mat.tick() == 0  # idempotent: same detections, nothing new
    srv = AnalyticsAPIServer(store, copy_log=mat).start()
    try:
        base = f"http://127.0.0.1:{srv.port}"
        code, body = _get(f"{base}/v0/pipes/get_anomalies.json?hours=48")
        assert code == 200 and body["rows"] == n1
        # endpoint reads the MATERIALIZATION: new events don't surface
        # until the next tick
        store.append_ndjson(
            json.dumps({"id": 9, "timestamp": "2024-01-01T00:04:30",
                        "value": "99999"})
        )
        code, body2 = _get(f"{base}/v0/pipes/get_anomalies.json?hours=48")
        assert body2["rows"] == n1
        n2 = mat.tick()
        assert n2 > 0  # the out-of-range spike materializes on tick
        code, body3 = _get(f"{base}/v0/pipes/get_anomalies.json?hours=48")
        assert body3["rows"] == n1 + n2
    finally:
        srv.shutdown()
