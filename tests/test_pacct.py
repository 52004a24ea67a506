"""pacct (process accounting) v3 binary record parser tests —
pacct-format.c semantics over hand-packed acct_v3 records."""

from __future__ import annotations

import struct

from axosyslog_spark.operators.pacct import (
    RECORD_SIZE,
    _comp_to_ulong,
    pacct_parse,
    split_pacct_blob,
)


def pack_v3(flag=0x02, version=3, tty=0, exitcode=0, uid=1000, gid=100,
            pid=4242, ppid=1, btime=1234, etime=123.456, utime=0, stime=0,
            mem=0, io=0, rw=0, minflt=0, majflt=0, swaps=0, comm=b"bash"):
    rec = struct.pack(
        "<BBHIIIIIIfHHHHHHHH",
        flag, version, tty, exitcode, uid, gid, pid, ppid, btime,
        etime, utime, stime, mem, io, rw, minflt, majflt, swaps,
    )
    rec += comm.ljust(16, b"\x00")[:16]
    assert len(rec) == RECORD_SIZE
    return rec


def test_comp_t_decode():
    # 13-bit mantissa, 3-bit base-8 exponent (pacct-format.c:62)
    assert _comp_to_ulong(100) == 100
    assert _comp_to_ulong(0x1FFF) == 8191
    assert _comp_to_ulong((1 << 13) | 100) == 100 << 3
    assert _comp_to_ulong((7 << 13) | 1) == 1 << 21


def test_pacct_parse_fields(spark):
    # utime comp: exponent 1, mantissa 50 -> 400
    rows = [
        (0, bytearray(pack_v3(flag=0x1A, uid=7, pid=99,
                              utime=(1 << 13) | 50, mem=123,
                              etime=42.5, comm=b"sixteen_bytes_xx"))),
        (1, bytearray(b"short")),
        (2, bytearray(pack_v3(version=2))),
    ]
    df = spark.createDataFrame(rows, "id int, payload binary")
    out = {r["id"]: r for r in pacct_parse(df).collect()}
    m = out[0]["pacct"]
    assert m[".pacct.ac_flag"] == "1a"
    assert m[".pacct.ac_uid"] == "7" and m[".pacct.ac_pid"] == "99"
    assert m[".pacct.ac_utime"] == "400.00"
    assert m[".pacct.ac_mem"] == "123"
    # %9.2f: width-9, space-padded (the reference's printf format)
    assert m[".pacct.ac_etime"] == "    42.50"
    # 16-byte comm with no NUL uses all 16 bytes (pacct-format.c:155)
    assert m[".pacct.ac_comm"] == "sixteen_bytes_xx"
    assert out[0]["msgformat"] == "linux:pacct"
    assert out[0]["message"] is None
    assert "record too small" in out[1]["message"]
    assert out[1]["pacct"] is None
    assert "only the v3 format" in out[2]["message"]


def test_split_blob_framing(spark):
    blob = pack_v3(pid=1) + pack_v3(pid=2) + pack_v3(pid=3)
    df = spark.createDataFrame([(bytearray(blob),)], "payload binary")
    out = pacct_parse(split_pacct_blob(df)).orderBy("record_idx").collect()
    assert [r["pacct"][".pacct.ac_pid"] for r in out] == ["1", "2", "3"]
