"""MaxMind DB reader/writer roundtrip + geoip2() wiring.

The reader is the modules/geoip2/maxminddb-helper.c analog: a
config-time parse of the binary format into interval rows for the
broadcast range join. The writer produces real spec-format bytes so
no binary fixtures are checked in.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from axosyslog_spark.operators.mmdb import (
    MmdbError,
    MmdbReader,
    load_mmdb_intervals,
    write_mmdb,
)

NETWORKS = [
    ("10.0.0.0/8", {"country": {"iso_code": "XA", "names": {"en": "Region A"}}}),
    ("172.16.0.0/12", {"country": {"iso_code": "XB", "names": {"en": "Region B"}}}),
    ("192.168.1.0/24", {"country": {"iso_code": "XC", "names": {"en": "Region C"}}}),
    # two networks sharing one data record (dedup in the data section)
    ("192.168.2.0/24", {"country": {"iso_code": "XC", "names": {"en": "Region C"}}}),
    ("203.0.113.5/32", {"city": {"names": {"en": "Fixture City"}}, "accuracy": 7.5}),
]


def _ip(s: str) -> int:
    a, b, c, d = (int(x) for x in s.split("."))
    return (a << 24) | (b << 16) | (c << 8) | d


@pytest.fixture(scope="module", params=[4, 6], ids=["v4tree", "v6tree"])
def db_path(request, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("mmdb") / f"fixture_v{request.param}.mmdb")
    write_mmdb(p, NETWORKS, ip_version=request.param, build_epoch=1700000000)
    return p


def test_metadata_roundtrip(db_path):
    r = MmdbReader.open(db_path)
    assert r.metadata["binary_format_major_version"] == 2
    assert r.metadata["record_size"] == 24
    assert r.metadata["build_epoch"] == 1700000000
    assert r.metadata["description"] == {"en": "fixture database"}
    assert r.metadata["languages"] == ["en"]


def test_intervals_roundtrip(db_path):
    got = {(lo, hi): data for lo, hi, data in MmdbReader.open(db_path).ipv4_intervals()}
    assert (_ip("10.0.0.0"), _ip("10.255.255.255")) in got
    assert (_ip("172.16.0.0"), _ip("172.31.255.255")) in got
    assert (_ip("192.168.1.0"), _ip("192.168.1.255")) in got
    assert (_ip("203.0.113.5"), _ip("203.0.113.5")) in got
    assert len(got) == 5
    assert got[(_ip("10.0.0.0"), _ip("10.255.255.255"))]["country"]["iso_code"] == "XA"
    rec = got[(_ip("203.0.113.5"), _ip("203.0.113.5"))]
    assert rec["city"]["names"]["en"] == "Fixture City"
    assert rec["accuracy"] == 7.5


def test_load_fields(db_path):
    rows = load_mmdb_intervals(db_path, fields=["country.iso_code", "country.names.en"])
    by_lo = {lo: (a, b) for lo, hi, a, b in rows}
    assert by_lo[_ip("10.0.0.0")] == ("XA", "Region A")
    assert by_lo[_ip("203.0.113.5")] == (None, None)  # city-only record
    # default field resolution: country -> city -> flat name
    names = {lo: name for lo, hi, name in load_mmdb_intervals(db_path)}
    assert names[_ip("192.168.2.0")] == "Region C"
    assert names[_ip("203.0.113.5")] == "Fixture City"


def test_overlap_rejected(tmp_path):
    with pytest.raises(MmdbError, match="overlaps"):
        write_mmdb(
            str(tmp_path / "bad.mmdb"),
            [("10.0.0.0/8", {"name": "a"}), ("10.1.0.0/16", {"name": "b"})],
        )


def test_not_an_mmdb(tmp_path):
    p = tmp_path / "junk.bin"
    p.write_bytes(b"\x00" * 64)
    with pytest.raises(MmdbError, match="marker"):
        MmdbReader.open(str(p))


def test_geoip2_operator(spark, db_path):
    """The geoip2() config-shape wrapper: prefix columns, plan-time
    file parse, broadcast join."""
    from axosyslog_spark.operators.enrich import geoip2

    df = spark.createDataFrame([("10.1.2.3",), ("8.8.8.8",)], "ip string")
    out = geoip2(df, spark, db_path, fields=["country.iso_code"])
    assert out.columns == ["ip", "geoip2.country_iso_code"]
    got = {r.ip: r["geoip2.country_iso_code"] for r in out.collect()}
    assert got == {"10.1.2.3": "XA", "8.8.8.8": None}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_geoip_range_join_from_mmdb(spark, db_path):
    """End-to-end geoip2(): mmdb -> broadcast interval join, same plan
    as op_geoip_range but with intervals sourced from the binary file."""
    from axosyslog_spark.operators.filters import ip_to_long

    dim = spark.createDataFrame(
        load_mmdb_intervals(db_path), "lo bigint, hi bigint, geo_name string"
    )
    df = spark.createDataFrame(
        [("10.20.30.40",), ("172.20.0.1",), ("192.168.1.77",),
         ("203.0.113.5",), ("8.8.8.8",)],
        "ip string",
    ).withColumn("ip_num", ip_to_long(F.col("ip")))
    out = {
        r.ip: r.geo_name
        for r in df.join(
            F.broadcast(dim),
            (F.col("ip_num") >= F.col("lo")) & (F.col("ip_num") <= F.col("hi")),
            "left",
        ).collect()
    }
    assert out == {
        "10.20.30.40": "Region A",
        "172.20.0.1": "Region B",
        "192.168.1.77": "Region C",
        "203.0.113.5": "Fixture City",
        "8.8.8.8": None,
    }
