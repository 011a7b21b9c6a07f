"""Structured-Streaming validation: same compiled plan over readStream,
watermarked windowed violation counts, clean/quarantine routing."""

from __future__ import annotations

import pytest

from oblate_spark import Schema, fields
from oblate_spark import validate as V
from oblate_spark.streaming import (
    valid_invalid_split,
    validate_stream,
    violation_counts_windowed,
)


class EventRow(Schema):
    event_id = fields.Integer()
    ts = fields.Timestamp()
    user_id = fields.Integer()
    event_type = fields.Literal("click", "view", "purchase", "signup", "logout")
    value = fields.Float(validators=[V.Range(0, 100)])


@pytest.fixture(scope="module")
def events_source(spark, sf001_dir, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("stream_src"))
    df = spark.read.parquet(f"{sf001_dir}/events.parquet").drop("props")
    df.coalesce(2).write.mode("overwrite").parquet(src)
    return src, df


def test_stream_matches_batch(spark, events_source):
    src, batch_df = events_source
    stream = spark.readStream.schema(batch_df.schema).parquet(src)
    annotated = validate_stream(stream, EventRow, row_id="event_id")
    assert annotated.isStreaming

    q = (
        annotated.writeStream.format("memory")
        .queryName("stream_validation")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT count(*) AS n, sum(CASE WHEN _valid THEN 1 ELSE 0 END) AS ok "
        "FROM stream_validation"
    ).collect()[0]

    batch_res = EventRow.validate(batch_df, row_id="event_id")
    exp = batch_res.metrics()
    assert got["n"] == exp["rows"]
    assert got["ok"] == exp["passed"]


def test_windowed_violation_counts(spark, events_source):
    src, batch_df = events_source
    stream = spark.readStream.schema(batch_df.schema).parquet(src)
    annotated = validate_stream(stream, EventRow, row_id="event_id")
    windowed = violation_counts_windowed(annotated, ts_col="ts", window="1 day", watermark="2 days")
    q = (
        windowed.writeStream.format("memory")
        .queryName("windowed_violations")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM windowed_violations").collect()
    assert rows
    total_from_windows = sum(r["cnt"] for r in rows if r["error_code"] != "__ok__")
    batch_total = EventRow.validate(batch_df, row_id="event_id").violations.count()
    assert total_from_windows == batch_total


def test_valid_invalid_split(spark, events_source):
    src, batch_df = events_source
    stream = spark.readStream.schema(batch_df.schema).parquet(src)
    annotated = validate_stream(stream, EventRow, row_id="event_id")
    clean, quarantine = valid_invalid_split(annotated)
    assert clean.isStreaming and quarantine.isStreaming
    assert "_violations" not in clean.columns
    q = (
        clean.writeStream.format("memory")
        .queryName("clean_rows")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    n_clean = spark.sql("SELECT count(*) c FROM clean_rows").collect()[0]["c"]
    exp = EventRow.validate(batch_df, row_id="event_id").metrics()
    assert n_clean == exp["passed"]
