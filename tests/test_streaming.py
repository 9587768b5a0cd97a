"""Structured Streaming tests: file-source replay through the full
pipeline into the keyed upsert sink, plus event-time windows and
stateful dedup. (No Kafka broker in the container — the Kafka builders
are config-only and exercised at the plan level elsewhere.)"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from unimib_simpss_spark.sources.csv_dim import read_sensor_group_mapping
from unimib_simpss_spark.streaming.pipeline import (
    file_replay_source,
    start_sensor_ingest,
    windowed_stats,
)

DIM_CSV = "sensor_id,group_id\n120,g1\n121,g1\n122,g2\n123,g2\n"


def _write_log(dirpath, name, rows):
    (dirpath / name).write_text("\n".join(json.dumps(r) for r in rows) + "\n")


@pytest.fixture()
def dim(spark, tmp_path):
    p = tmp_path / "sensor_group.csv"
    p.write_text(DIM_CSV)
    return read_sensor_group_mapping(spark, str(p))


def test_streaming_file_replay_to_keyed_sink(spark, dim, tmp_path):
    """EP1+EP2 end-to-end on a stream: replay two log files (ST6), run
    the shared pipeline, upsert into the keyed sink, checkpointed."""
    logdir = tmp_path / "logs"
    logdir.mkdir()
    base = {"uptime": 1, "T": 900, "P": 400, "H": 50, "Ix": 0, "Iy": 0, "Iz": 0, "M": 0}
    _write_log(logdir, "a.json", [dict(base, id=120, uptime=10), dict(base, id=121, uptime=20)])
    _write_log(logdir, "b.json", [dict(base, id=122, uptime=30), dict(base, id=120, uptime=10)])

    sink = str(tmp_path / "sensor_data")
    ckpt = str(tmp_path / "ckpt")
    stream = file_replay_source(spark, str(logdir), max_files_per_trigger=1)
    assert stream.isStreaming
    q = start_sensor_ingest(
        stream, dim, sink, ckpt,
        # deterministic event time so the re-delivered 120 row hits the same PK
        ts_col=F.to_timestamp(F.lit("2024-01-01 00:00:00")),
        available_now=True,
    )
    q.awaitTermination(120)

    stored = spark.read.parquet(sink)
    rows = {r.sensor_id: r for r in stored.collect()}
    # 4 messages, one a PK duplicate → 3 stored rows (upsert semantics)
    assert set(rows) == {120, 121, 122}
    assert rows[120].sensor_group == "g1" and rows[122].sensor_group == "g2"


def test_streaming_windowed_stats(spark, dim, tmp_path):
    """ST7: event-time tumbling window aggregation on a stream, results
    collected via memory sink in complete mode."""
    logdir = tmp_path / "logs"
    logdir.mkdir()
    base = {"T": 900, "P": 400, "H": 50, "Ix": 0, "Iy": 0, "Iz": 0, "M": 0}
    # uptime carries the event-time offset for this test
    _write_log(logdir, "a.json", [dict(base, id=120, uptime=0), dict(base, id=121, uptime=60),
                                  dict(base, id=122, uptime=660)])

    from unimib_simpss_spark.operators.sensor_pipeline import sensor_pipeline

    stream = file_replay_source(spark, str(logdir), max_files_per_trigger=10)
    persisted, _ = sensor_pipeline(
        stream, dim,
        ts_col=F.to_timestamp(F.lit("2024-01-01 00:00:00")) + F.make_interval(secs=F.col("uptime")),
        on_unknown="deadletter",
    )
    agg = windowed_stats(persisted, window="10 minutes", watermark="1 minute",
                         keys=("sensor_group",))
    q = (
        agg.writeStream.format("memory").queryName("winstats")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    out = {(r.window_start.isoformat(), r.sensor_group): r.n_readings
           for r in spark.sql("select * from winstats").collect()}
    # sensors 120+121 (g1) in window 0; 122 (g2) at +11min in window 1
    assert out[("2024-01-01T00:00:00", "g1")] == 2
    assert out[("2024-01-01T00:10:00", "g2")] == 1
