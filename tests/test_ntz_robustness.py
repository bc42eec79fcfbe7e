"""Timestamp-encoding robustness (regression for the round-2 data drift).

The driver regenerated events.parquet between rounds and the ``ts``
column flipped from TIMESTAMP(NANOS) to ``timestamp[us]`` with no UTC
flag — which Spark 3.4+ infers as TIMESTAMP_NTZ, a type ``unix_millis``,
``window`` and ``withWatermark`` all reject at analysis.  That single
writer-side change zeroed four queries and the whole bench.

These tests pin the fix: the SAME rows written under all three parquet
timestamp encodings must flow through every events-consuming operator
family (sessionize, asof join, interval join, funnel, streaming
watermark agg) and produce IDENTICAL results.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from etl_opensky_spark.queries import QUERIES, _events


def _events_pdf() -> pd.DataFrame:
    ts = pd.to_datetime("2024-01-15") + pd.to_timedelta(
        [(i * 137) % (3 * 86400) for i in range(300)], unit="s"
    )
    return pd.DataFrame(
        {
            "event_id": pd.array(range(300), dtype="int64"),
            "ts": ts,
            "user_id": pd.array([i % 7 for i in range(300)], dtype="int64"),
            "event_type": [
                ["view", "click", "purchase"][i % 3] for i in range(300)
            ],
            "value": [float(i % 50) for i in range(300)],
            "props": ["{}"] * 300,
        }
    )


ENCODINGS = ["ntz_us", "ltz_us", "nanos"]


def _write_events(pdf: pd.DataFrame, directory, encoding: str) -> str:
    table = pa.Table.from_pandas(pdf, preserve_index=False)
    idx = table.schema.get_field_index("ts")
    if encoding == "ntz_us":  # timestamp[us], no UTC flag -> Spark NTZ inference
        target = pa.timestamp("us")
    elif encoding == "ltz_us":  # UTC-flagged -> plain TIMESTAMP everywhere
        target = pa.timestamp("us", tz="UTC")
    else:  # TIMESTAMP(NANOS) -> Spark only reads via legacy nanosAsLong
        target = pa.timestamp("ns")
    table = table.set_column(idx, "ts", table.column("ts").cast(target))
    path = directory / encoding
    path.mkdir()
    pq.write_table(
        table, path / "events.parquet", coerce_timestamps=None, version="2.6"
    )
    return str(path)


@pytest.fixture(scope="module")
def encoded_dirs(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("ts_encodings")
    pdf = _events_pdf()
    return {enc: _write_events(pdf, base, enc) for enc in ENCODINGS}


def test_events_reader_normalizes_every_encoding(spark, encoded_dirs):
    results = {}
    for enc, d in encoded_dirs.items():
        df = _events(spark, d)
        assert dict(df.dtypes)["ts"] == "timestamp", (
            f"{enc}: _events must yield plain TIMESTAMP, got {dict(df.dtypes)['ts']}"
        )
        results[enc] = sorted(
            (r.event_id, r.ts.isoformat()) for r in df.select("event_id", "ts").collect()
        )
    assert results["ntz_us"] == results["ltz_us"] == results["nanos"]


#: every events-consuming operator family with a time-typed hot path
CONSUMER_QUERIES = [
    "q21_sessionize",       # unix_millis + lag window
    "q33_asof_join",        # time-ordered asof
    "q25_interval_join",    # unix_micros bucketed range join
    "q45_funnel",           # ordered step matching
    "q85_event_transitions",  # lag over event time
    "q17_events_daily",     # date_trunc aggregation
    "q98_pagerank",         # lead window over event time feeds the graph
]


@pytest.mark.parametrize("qname", CONSUMER_QUERIES)
def test_consumers_identical_across_encodings(spark, encoded_dirs, qname):
    outs = {}
    for enc, d in encoded_dirs.items():
        df = QUERIES[qname](spark, d)
        outs[enc] = sorted(tuple(r) for r in df.collect())
    assert outs["ntz_us"] == outs["ltz_us"], f"{qname}: ntz != ltz"
    assert outs["ntz_us"] == outs["nanos"], f"{qname}: ntz != nanos"


@pytest.mark.parametrize("enc", ENCODINGS)
def test_streaming_watermark_survives_encoding(spark, encoded_dirs, enc):
    """withWatermark rejects TIMESTAMP_NTZ outright — the streaming reader
    path must normalize before the watermark is applied."""
    out = QUERIES["q30_stream_daily_counts"](spark, encoded_dirs[enc])
    assert out.count() > 0
