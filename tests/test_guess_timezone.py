"""guess-timezone(): wall-clock stamps without zone info are assigned
the candidate zone that lands nearest the receive time."""

from __future__ import annotations

import datetime as dt

from axosyslog_spark.operators.rewrite import guess_timezone


def test_guess_timezone(spark):
    # stamp parsed naively as 12:00; actually written in Budapest
    # (UTC+1 in January) and received at 11:00:03 UTC
    rows = [
        (0, dt.datetime(2024, 1, 10, 12, 0, 0), dt.datetime(2024, 1, 10, 11, 0, 3)),
        # tokyo writer (+9): wall 20:00, received 11:00:05 UTC
        (1, dt.datetime(2024, 1, 10, 20, 0, 0), dt.datetime(2024, 1, 10, 11, 0, 5)),
        # already UTC
        (2, dt.datetime(2024, 1, 10, 11, 0, 0), dt.datetime(2024, 1, 10, 11, 0, 1)),
    ]
    df = spark.createDataFrame(rows, "id int, ts timestamp, recvd timestamp")
    got = {r.id: r for r in guess_timezone(df, "ts", "recvd").collect()}
    assert got[0].guessed_tz == "Europe/Budapest"
    assert got[1].guessed_tz == "Asia/Tokyo"
    assert got[2].guessed_tz == "UTC"
    assert got[0].ts_fixed == dt.datetime(2024, 1, 10, 11, 0, 0)
    assert got[1].ts_fixed == dt.datetime(2024, 1, 10, 11, 0, 0)
