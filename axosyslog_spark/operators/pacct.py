"""Linux process-accounting (pacct) v3 binary record parser.

Reference: modules/pacctformat/pacct-format.c — fixed 64-byte
``struct acct_v3`` records (public kernel UAPI <linux/acct.h>) framed
by a binary record server, each decoded into ``.pacct.ac_*`` string
values. scl/pacct/plugin.conf is just file(format("pacct")) +
tags(".pacct") over this format.

Faithful details worth naming:

- comp_t (13-bit mantissa, 3-bit base-8 exponent) decodes as
  ``(x & 0x1fff) << (((x >> 13) & 0x7) * 3)`` (pacct-format.c:62).
- The reference renders every value to a STRING with printf formats:
  ac_flag '%02x'; ac_btime/ac_utime/ac_stime '%lu.00' (literal .00);
  ac_etime '%9.2f' (width-9, space-padded — acct_v3 stores etime as a
  float); the rest '%u'/'%lu'. We reproduce those strings exactly.
- ac_btime runs through the comp_t conversion in the reference even
  though acct_v3 declares it __u32 (pacct-format.c:143) — mirrored,
  quirk and all, so outputs match byte-for-byte.
- Undersized records and versions != 3 turn into an error MESSAGE
  instead of fields (pacct-format.c:109-130).

Decode is numpy-vectorized over Arrow batches (np.frombuffer with a
structured dtype — no per-row Python), the same justified
mapInPandas shape as the other binary readers (BMP/WAV/mmdb).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import MapType, StringType, StructField, StructType

RECORD_SIZE = 64
ACCT_COMM = 16

_V3_DTYPE = [
    ("ac_flag", "u1"), ("ac_version", "u1"), ("ac_tty", "<u2"),
    ("ac_exitcode", "<u4"), ("ac_uid", "<u4"), ("ac_gid", "<u4"),
    ("ac_pid", "<u4"), ("ac_ppid", "<u4"), ("ac_btime", "<u4"),
    ("ac_etime", "<f4"), ("ac_utime", "<u2"), ("ac_stime", "<u2"),
    ("ac_mem", "<u2"), ("ac_io", "<u2"), ("ac_rw", "<u2"),
    ("ac_minflt", "<u2"), ("ac_majflt", "<u2"), ("ac_swaps", "<u2"),
    ("ac_comm", f"S{ACCT_COMM}"),
]


def _comp_to_ulong(x: int) -> int:
    """comp_t decode (pacct-format.c:62)."""
    return (x & 0x1FFF) << (((x >> 13) & 0x7) * 3)


def _decode_record(data: bytes) -> tuple[dict | None, str | None]:
    """One acct record -> ({'.pacct.ac_*': str}, None) or (None, err)."""
    import numpy as np

    if len(data) < RECORD_SIZE:
        return None, (
            "Error parsing process accounting record, record too small; "
            f"rec_size='{len(data)}', expected_size='{RECORD_SIZE}'"
        )
    rec = np.frombuffer(data[:RECORD_SIZE], dtype=np.dtype(_V3_DTYPE))[0]
    version = int(rec["ac_version"])
    if version != 3:
        return None, (
            "Error parsing process accounting record, only the v3 format "
            f"is supported; version='{version}'"
        )
    comm = rec["ac_comm"]
    # pacct-format.c:155-159: NUL-terminated unless all 16 bytes used
    comm = comm.split(b"\x00", 1)[0].decode("latin-1")
    p = ".pacct."
    out = {
        p + "ac_flag": "%02x" % int(rec["ac_flag"]),
        p + "ac_tty": "%u" % int(rec["ac_tty"]),
        p + "ac_exitcode": "%u" % int(rec["ac_exitcode"]),
        p + "ac_uid": "%u" % int(rec["ac_uid"]),
        p + "ac_gid": "%u" % int(rec["ac_gid"]),
        p + "ac_pid": "%u" % int(rec["ac_pid"]),
        p + "ac_ppid": "%u" % int(rec["ac_ppid"]),
        p + "ac_btime": "%lu.00".replace("%lu", "%d")
        % _comp_to_ulong(int(rec["ac_btime"])),
        p + "ac_etime": "%9.2f" % float(rec["ac_etime"]),
        p + "ac_utime": "%d.00" % _comp_to_ulong(int(rec["ac_utime"])),
        p + "ac_stime": "%d.00" % _comp_to_ulong(int(rec["ac_stime"])),
        p + "ac_mem": "%d" % _comp_to_ulong(int(rec["ac_mem"])),
        p + "ac_io": "%d" % _comp_to_ulong(int(rec["ac_io"])),
        p + "ac_rw": "%d" % _comp_to_ulong(int(rec["ac_rw"])),
        p + "ac_minflt": "%d" % _comp_to_ulong(int(rec["ac_minflt"])),
        p + "ac_majflt": "%d" % _comp_to_ulong(int(rec["ac_majflt"])),
        p + "ac_swaps": "%d" % _comp_to_ulong(int(rec["ac_swaps"])),
        p + "ac_comm": comm,
    }
    return out, None


def split_pacct_blob(df: DataFrame, blob_col: str = "payload") -> DataFrame:
    """The binary-record-server framing analog: split a pacct file blob
    into one row per fixed-size record (record_idx preserves file
    order). Pure column algebra — no Python in the split."""
    n = (F.length(F.col(blob_col)) / RECORD_SIZE).cast("int")
    idx = F.explode(F.sequence(F.lit(0), n - 1)).alias("record_idx")
    out = df.select("*", idx)
    return out.withColumn(
        blob_col,
        F.expr(f"substring({blob_col}, record_idx * {RECORD_SIZE} + 1, "
               f"{RECORD_SIZE})"),
    )


def pacct_parse(df: DataFrame, src_col: str = "payload") -> DataFrame:
    """Decode one acct_v3 record per row (mapInPandas, Arrow batches).

    Adds: ``pacct`` (map of .pacct.ac_* -> formatted string, NULL on
    error), ``message`` (the reference's error text for undersized /
    non-v3 records, else NULL), ``msgformat`` ('linux:pacct')."""
    fields = [f for f in df.schema.fields]
    schema = StructType(
        fields
        + [
            StructField("pacct", MapType(StringType(), StringType())),
            StructField("message", StringType()),
            StructField("msgformat", StringType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            maps, errs = [], []
            for data in pdf[src_col]:
                data = bytes(data) if data is not None else b""
                m, err = _decode_record(data)
                maps.append(m)
                errs.append(err)
            pdf = pdf.copy()
            pdf["pacct"] = maps
            pdf["message"] = errs
            pdf["msgformat"] = "linux:pacct"
            yield pdf

    return df.mapInPandas(run, schema=schema)
