"""linux-kmsg-format parser + $(graphite-output) / $(getent).

Reference: modules/linux-kmsg-format/linux-kmsg-format.c (header
comment's record grammar + kmsg_parse_device_*),
modules/graphite/graphite-output.c, modules/getent.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from axosyslog_spark.operators.kmsg import kmsg_parser

KMSG_BLOCK = (
    "6,339,5140900,-;usb 3-2: USB disconnect\n"
    " SUBSYSTEM=usb\n"
    " DEVICE=+usb:3-2\n"
)
KMSG_DEV = "4,22,1234,-;sda: unit attention\n DEVICE=b8:0\n"
KMSG_NET = "5,23,5678,-;eth0: link up\n DEVICE=n2\n"


def test_kmsg_parser_fields_and_device(spark):
    df = spark.createDataFrame(
        [(0, KMSG_BLOCK), (1, KMSG_DEV), (2, KMSG_NET), (3, "not kmsg")],
        "id int, text string",
    )
    out = {r["id"]: r.asDict() for r in kmsg_parser(df).collect()}
    a = out[0]
    assert a["kmsg_ok"] and a["pri"] == 6
    assert a["severity"] == 6 and a["facility"] == 0
    assert a["kmsg_seq"] == 339 and a["kmsg_ts_us"] == 5140900
    assert a["message"] == "usb 3-2: USB disconnect"
    assert a["kmsg_nv"][".linux.SUBSYSTEM"] == "usb"
    # '+subsys:name' device form
    assert a["kmsg_nv"][".linux.DEVICE.type"] == "usb"
    assert a["kmsg_nv"][".linux.DEVICE.name"] == "3-2"
    d = out[1]["kmsg_nv"]
    assert d[".linux.DEVICE.type"] == "block"
    assert d[".linux.DEVICE.major"] == "8" and d[".linux.DEVICE.minor"] == "0"
    n = out[2]["kmsg_nv"]
    assert n[".linux.DEVICE.type"] == "netdev"
    assert n[".linux.DEVICE.index"] == "2"
    assert not out[3]["kmsg_ok"]


def test_graphite_output_and_getent(spark):
    import datetime as dt

    from axosyslog_spark.functions.template_compiler import (
        TemplateContext,
        compile_template,
    )

    df = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1, 0, 0, 0), "42", "7")],
        "ts timestamp, cpu string, mem string",
    )
    ctx = TemplateContext(
        columns={"CPU": F.col("cpu"), "MEM": F.col("mem")},
        stamp=F.col("ts"),
    )
    out = df.select(
        compile_template(
            "$(graphite-output vmstat.cpu=${CPU} vmstat.mem=${MEM})", ctx
        ).alias("g"),
        compile_template("$(getent passwd 0)", ctx).alias("root_name"),
        compile_template("$(getent passwd 0 shell)", ctx).alias("root_shell"),
        compile_template("$(getent group 0)", ctx).alias("root_group"),
    ).first()
    ts = 1704067200
    assert out["g"] == f"vmstat.cpu 42 {ts}\nvmstat.mem 7 {ts}\n"
    assert out["root_name"] == "root"
    assert out["root_shell"].endswith("sh")
    assert out["root_group"] in ("root", "wheel")
