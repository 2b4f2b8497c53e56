"""Regression tests for the round-5 session-2 self-review findings:
serving-layer races/restart/auth/empty-store, Benford non-finite
handling, image/video note NULL-propagation, VolumeRule count-frame
reuse, AVI top-down DIBs and headers-only containers.
"""

from __future__ import annotations

import json
import math
import threading
import urllib.request

import numpy as np
import pytest
from pyspark.sql import functions as F

from use_case_real_time_anomaly_detection_spark.operators.compiler import compile_rules
from use_case_real_time_anomaly_detection_spark.operators.rules import (
    BenfordRule,
    ImageDecodeRule,
    VideoDecodeRule,
    VolumeRule,
)


# ------------------------------------------------------------ serving layer


def test_event_store_seq_resumes_across_instances(spark, tmp_path):
    from use_case_real_time_anomaly_detection_spark.serving import EventStore

    path = str(tmp_path / "pq")
    line = '{"id": 1, "timestamp": "2024-01-01T00:00:00", "value": "1"}'
    s1 = EventStore(spark, path)
    s1.append_ndjson("\n".join([line] * 5))
    # a NEW instance (server restart) must not reissue ids 0..4
    s2 = EventStore(spark, path)
    s2.append_ndjson("\n".join([line] * 3))
    ids = [r["event_id"] for r in s2.events().collect()]
    assert sorted(ids) == list(range(8))  # unique, contiguous across restarts


def test_event_store_concurrent_appends_lose_nothing(spark, tmp_path):
    from use_case_real_time_anomaly_detection_spark.serving import EventStore

    store = EventStore(spark, str(tmp_path / "pq"))
    line = '{"id": %d, "timestamp": "2024-01-01T00:00:00", "value": "1"}'
    results = []

    def post(k):
        body = "\n".join(line % (k * 100 + i) for i in range(20))
        results.append(store.append_ndjson(body))

    threads = [threading.Thread(target=post, args=(k,)) for k in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert all(r == (20, 0) for r in results)
    ev = store.events()
    assert ev.count() == 80  # no append clobbered another's files
    assert ev.select("event_id").distinct().count() == 80


def test_empty_store_serves_empty_not_500(spark, tmp_path):
    from use_case_real_time_anomaly_detection_spark.serving import (
        AnalyticsAPIServer,
        EventStore,
    )

    srv = AnalyticsAPIServer(EventStore(spark, str(tmp_path / "never"))).start()
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}/v0/pipes/most_recent.json"
        ) as r:
            body = json.loads(r.read())
        assert r.status == 200 and body["rows"] == 0
    finally:
        srv.shutdown()


def test_pipe_listing_requires_a_known_token(spark, tmp_path):
    from use_case_real_time_anomaly_detection_spark.serving import (
        AnalyticsAPIServer,
        EventStore,
        TokenAuth,
    )

    srv = AnalyticsAPIServer(
        EventStore(spark, str(tmp_path / "pq")),
        auth=TokenAuth({"s": {"PIPES:READ:ui_ids"}}),
    ).start()
    try:
        base = f"http://127.0.0.1:{srv.port}"
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(f"{base}/v0/pipes")
        assert ei.value.code == 403  # anonymous enumeration refused
        with urllib.request.urlopen(f"{base}/v0/pipes?token=s") as r:
            assert r.status == 200  # any known token may list
    finally:
        srv.shutdown()


# ----------------------------------------------------------------- benford


def test_benford_ignores_nan_and_infinity(spark):
    rows = [("p", str(i), 10.0 ** (i % 4)) for i in range(200)]
    rows += [("p", f"n{i}", float("nan")) for i in range(300)]
    rows += [("p", f"i{i}", float("inf")) for i in range(300)]
    df = spark.createDataFrame(
        rows, "partition_key string, clip_id string, x double"
    )
    # digits are ALL '1' (powers of ten) -> conforming share on digit 1
    # would be destroyed if the 600 NaN/Inf rows counted as usable
    plan = compile_rules(df, [BenfordRule("x", min_count=100, max_mad=0.2)])
    v = plan.violations.filter(F.col("detector") == "benford-x").collect()
    # all-ones: mad = (|1-e1| + sum(e2..e9))/9 ~ 0.147 < 0.2 -> no flag
    e = [math.log10(1 + 1 / d) for d in range(1, 10)]
    expected_mad = (abs(1 - e[0]) + sum(e[1:])) / 9
    assert expected_mad < 0.2
    assert v == []  # NaN/Inf rows neither flag nor dilute


# --------------------------------------------- note NULL-propagation fixes


def test_video_note_survives_null_declared_metadata(spark):
    from use_case_real_time_anomaly_detection_spark.functions.multimodal import (
        avi_encode,
    )

    good = avi_encode([np.zeros((8, 9, 3), np.uint8)] * 2)
    df = spark.createDataFrame(
        [("p", "a", bytes(good[:30]), "avi", None, None, None)],
        "partition_key string, clip_id string, payload binary, codec string,"
        " n_frames int, width int, height int",
    )
    plan = compile_rules(df, [VideoDecodeRule(bytes_column="payload")])
    (row,) = plan.violations.collect()
    assert row["note"] is not None
    assert "truncated avi chunk" in row["note"]
    assert "declared:?x?@?" in row["note"]


def test_image_note_survives_null_declared_dims(spark):
    df = spark.createDataFrame(
        [("p", "a", b"not a png", "png", None, None)],
        "partition_key string, clip_id string, payload binary, codec string,"
        " width int, height int",
    )
    plan = compile_rules(df, [ImageDecodeRule(bytes_column="payload")])
    (row,) = plan.violations.collect()
    assert row["note"] is not None and "bad png signature" in row["note"]


# --------------------------------------------------------- volume reuse


def test_volume_rule_shares_one_count_subtree(spark):
    df = spark.createDataFrame(
        [("p", str(i)) for i in range(30)] + [("q", f"q{i}") for i in range(5)],
        "partition_key string, clip_id string",
    )
    plan = compile_rules(df, [VolumeRule(min_rows=10)])
    assert {r["partition_key"] for r in plan.violations.collect()} == {"q"}
    # the violations plan contains exactly ONE count-aggregate subtree
    # (the shared frame), not one per consumer
    ps = plan.violations._jdf.queryExecution().optimizedPlan().toString()
    assert ps.count("count(1)") <= 2  # partial+final of one aggregate


# ------------------------------------------------------------------- avi


def test_avi_topdown_dib_decodes_right_side_up():
    from use_case_real_time_anomaly_detection_spark.functions.multimodal import (
        avi_demux,
        avi_encode,
    )
    import struct as _s

    img = (np.arange(8 * 9 * 3).reshape(8, 9, 3) % 256).astype(np.uint8)
    payload = bytearray(avi_encode([img]))
    # flip strf biHeight to negative AND rewrite the frame rows in
    # top-down order (first image row first)
    strf_at = bytes(payload).index(b"strf") + 8
    _, bw, bh = _s.unpack_from("<Iii", bytes(payload), strf_at)
    _s.pack_into("<i", payload, strf_at + 8, -bh)
    frame_at = bytes(payload).index(b"00db") + 8
    rowsz = (bw * 3 + 3) & ~3
    pad = b"\x00" * (rowsz - bw * 3)
    body = b"".join(img[y, :, ::-1].tobytes() + pad for y in range(bh))
    payload[frame_at : frame_at + rowsz * bh] = body
    w, h, frames = avi_demux(bytes(payload))
    assert (w, h) == (9, 8)
    assert np.array_equal(frames[0], img)  # not vertically flipped


def test_video_frames_headers_only_container_stays_accountable(spark):
    from use_case_real_time_anomaly_detection_spark.functions.multimodal import (
        avi_encode,
        video_frames,
    )

    good = avi_encode([np.zeros((8, 9, 3), np.uint8)])
    # excise the single '00db' frame chunk from the movi list
    idx = good.index(b"00db")
    import struct as _s

    (sz,) = _s.unpack_from("<I", good, idx + 4)
    cut = 8 + sz + (sz % 2)
    empty = bytearray(good)
    del empty[idx : idx + cut]
    # fix the RIFF and movi LIST sizes
    _s.pack_into("<I", empty, 4, _s.unpack_from("<I", empty, 4)[0] - cut)
    movi_at = bytes(empty).index(b"movi") - 8
    _s.pack_into(
        "<I", empty, movi_at + 4,
        _s.unpack_from("<I", empty, movi_at + 4)[0] - cut,
    )
    df = spark.createDataFrame(
        [("a", bytes(empty), "avi")],
        "item_id string, payload binary, codec string",
    )
    rows = video_frames(df).collect()
    assert len(rows) == 1  # one accountable row, not a vanished item
    assert rows[0]["demux_error"] == "no frames in container"
