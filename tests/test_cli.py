"""CLI surface tests: arg validation (reference parity) + an end-to-end
subcommand run against a temp warehouse."""

from __future__ import annotations

import json

import pytest

from etl_opensky_spark.cli import build_parser, main, parse_date


def test_date_validation():
    parser = build_parser()
    with pytest.raises(SystemExit):
        parser.parse_args(["load-dim-dates", "2018-13-01", "2018-01-02"])
    args = parser.parse_args(["load-dim-dates", "2018-01-01", "2018-01-02"])
    assert args.start_date.isoformat() == "2018-01-01"


def test_unknown_command_rejected():
    with pytest.raises(SystemExit):
        build_parser().parse_args(["frobnicate"])


def test_load_dim_dates_cli_runs(spark, capsys):
    # session fixture already holds the temp warehouse; CLI reuses it via
    # getOrCreate
    rc = main(["load-dim-dates", "2019-01-01", "2019-01-10"])
    assert rc == 0
    assert "load-dim-dates" in capsys.readouterr().out
    assert spark.table("dim_dates").filter("year = 2019").count() == 10


def test_load_dim_airports_cli_runs(spark, tmp_path, capsys):
    payload = {
        "rows": [
            {"name": "A", "iata": "AAA", "icao": "AAAA", "country": "X",
             "lat": 7, "lon": 8.5, "alt": 100},
        ]
    }
    p = tmp_path / "airports.json"
    p.write_text(json.dumps(payload))
    rc = main(["load-dim-airports", "--airports-json", str(p)])
    assert rc == 0
    assert spark.table("dim_airports").count() == 1
