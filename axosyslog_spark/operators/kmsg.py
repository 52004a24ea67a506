"""linux-kmsg-format: /dev/kmsg records into typed columns + NV pairs.

Reference: modules/linux-kmsg-format/linux-kmsg-format.c — a record is

    <pri>,<seq>,<monotonic_us>[,flags...];<message>\\n
     KEY=value\\n
     DEVICE=+b8:1\\n

header fields comma-separated before the first ';'; continuation lines
(space/tab-indented) carry KEY=value pairs stored as ``.linux.KEY``;
the DEVICE value decodes by its first char (kmsg_parse_device_*):
``b<maj>:<min>`` block, ``c<maj>:<min>`` char, ``n<ifindex>`` netdev,
``+<subsys>:<name>`` subsystem, anything else ``<unknown>``.

One projection, pure column algebra.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from axosyslog_spark.operators.kvscan import entries_to_map

_DEV_KEY = ".linux.DEVICE."


def _entry(k: str, v: Column) -> Column:
    return F.struct(F.lit(k).alias("key"), v.alias("value"))


def _device_entries(dv: Column) -> Column:
    """DEVICE value -> array of decoded .linux.DEVICE.* entries."""
    first = F.substring(dv, 1, 1)
    rest = F.substring(dv, 2, 2_000_000_000)
    major = F.substring_index(rest, ":", 1)
    minor = F.substring(
        rest, F.length(major) + 2, F.lit(2_000_000_000)
    )
    dev_t = lambda t: F.array(  # noqa: E731
        _entry(_DEV_KEY + "type", F.lit(t)),
        _entry(_DEV_KEY + "major", major),
        _entry(_DEV_KEY + "minor", minor),
    )
    return (
        F.when(dv.isNull(), F.array().cast("array<struct<key:string,value:string>>"))
        .when(first == "b", dev_t("block"))
        .when(first == "c", dev_t("char"))
        .when(
            first == "n",
            F.array(
                _entry(_DEV_KEY + "type", F.lit("netdev")),
                _entry(_DEV_KEY + "index", rest),
            ),
        )
        .when(
            first == "+",
            F.array(
                _entry(_DEV_KEY + "type", F.substring_index(rest, ":", 1)),
                _entry(
                    _DEV_KEY + "name",
                    F.substring(
                        rest,
                        F.length(F.substring_index(rest, ":", 1)) + 2,
                        F.lit(2_000_000_000),
                    ),
                ),
            ),
        )
        .otherwise(
            F.array(
                _entry(_DEV_KEY + "type", F.lit("<unknown>")),
                _entry(_DEV_KEY + "name", dv),
            )
        )
    )


def kmsg_parser(df: DataFrame, src_col: str = "text") -> DataFrame:
    """Adds kmsg_ok, pri/severity/facility, kmsg_seq,
    kmsg_ts_us (monotonic microseconds since boot — the reference
    turns this into an absolute stamp with the reader host's boot
    time, which a batch table doesn't have), message, and
    kmsg_nv: map<string,string> of ``.linux.*`` pairs with the DEVICE
    decode applied."""
    src = F.col(src_col)
    ok = src.contains(";")
    header = F.substring_index(src, ";", 1)
    h = F.split(header, ",")
    pri = F.try_element_at(h, F.lit(1)).try_cast("int")
    body = F.substring(src, F.length(header) + 2, F.lit(2_000_000_000))
    lines = F.split(body, "\n")
    cont = F.filter(
        F.slice(lines, 2, F.greatest(F.size(lines) - 1, F.lit(0))),
        lambda l: l.rlike(r"^[ \t].+="),
    )
    kv = F.transform(
        cont,
        lambda l: F.struct(
            F.ltrim(F.substring_index(l, "=", 1)).alias("key"),
            F.substring(
                l, F.length(F.substring_index(l, "=", 1)) + 2, F.lit(2_000_000_000)
            ).alias("value"),
        ),
    )
    plain = F.transform(
        F.filter(kv, lambda e: e["key"] != "DEVICE"),
        lambda e: F.struct(
            F.concat(F.lit(".linux."), e["key"]).alias("key"),
            e["value"].alias("value"),
        ),
    )
    # dup-safe (map_from_entries aborts on a repeated continuation
    # key under mapKeyDedupPolicy=EXCEPTION; hostile input can repeat)
    dv = F.try_element_at(entries_to_map(kv), F.lit("DEVICE"))
    entries = F.concat(
        plain,
        F.when(dv.isNotNull(), _device_entries(dv)).otherwise(
            F.array().cast("array<struct<key:string,value:string>>")
        ),
    )
    return df.withColumns(
        {
            "kmsg_ok": ok & (pri.isNotNull()),
            "pri": F.when(ok, pri),
            "severity": F.when(ok, pri % 8),
            "facility": F.when(ok, (pri / 8).cast("int")),
            "kmsg_seq": F.when(ok, F.try_element_at(h, F.lit(2))).try_cast("bigint"),
            "kmsg_ts_us": F.when(ok, F.try_element_at(h, F.lit(3))).try_cast("bigint"),
            "message": F.when(ok, F.element_at(lines, 1)),
            "kmsg_nv": F.when(ok, entries_to_map(entries)),
        }
    )
