"""MaxMind DB (.mmdb) binary format: a pure-Python, driver-side,
config-time reader that turns a database file into the interval rows
the broadcast range-join geoip analog consumes (the round-2 gap:
`geoip2()` only accepted pre-built interval tables).

Reference behavior: modules/geoip2/maxminddb-helper.c +
modules/geoip2/geoip-parser.c (which delegate to libmaxminddb).
Format re-implemented from the PUBLIC MaxMind DB file-format spec
(maxmind.github.io/MaxMind-DB): a binary search tree over IP bits,
a type-tagged data section, and a metadata map after the
``\\xab\\xcd\\xefMaxMind.com`` marker.

Scale shape: the .mmdb is parsed ONCE on the driver at plan time into
a list of (lo, hi, values) intervals — a small dimension that is then
``F.broadcast()``-joined against the fact table, so executors never
touch the file and the join stays shuffle-free.

A minimal writer (`write_mmdb`) is included so fixtures and tests can
produce real databases without shipping binary blobs; the
reader/writer pair is roundtrip-tested in tests/test_mmdb.py.
"""

from __future__ import annotations

import struct
import time
from dataclasses import dataclass

METADATA_MARKER = b"\xab\xcd\xefMaxMind.com"

# data-section type codes (spec §"Output Data Section")
_T_PTR, _T_STR, _T_DOUBLE, _T_BYTES = 1, 2, 3, 4
_T_U16, _T_U32, _T_MAP = 5, 6, 7
_T_I32, _T_U64, _T_U128, _T_ARRAY = 8, 9, 10, 11
_T_BOOL, _T_FLOAT = 14, 15


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


class MmdbError(ValueError):
    pass


class _Decoder:
    """Type-tagged value decoder over the data section."""

    def __init__(self, buf: bytes, base: int):
        self.buf = buf
        self.base = base  # absolute offset of the data section start

    def decode(self, offset: int):
        """Decode the value at absolute ``offset``; returns (value, next_offset)."""
        ctrl = self.buf[offset]
        offset += 1
        dtype = ctrl >> 5
        if dtype == 0:  # extended type
            dtype = self.buf[offset] + 7
            offset += 1
        if dtype == _T_PTR:
            ss = (ctrl >> 3) & 0x3
            v = ctrl & 0x7
            if ss == 0:
                ptr = (v << 8) | self.buf[offset]
                offset += 1
            elif ss == 1:
                ptr = (v << 16) | (self.buf[offset] << 8) | self.buf[offset + 1]
                ptr += 2048
                offset += 2
            elif ss == 2:
                ptr = (v << 24) | int.from_bytes(self.buf[offset:offset + 3], "big")
                ptr += 526336
                offset += 3
            else:
                ptr = int.from_bytes(self.buf[offset:offset + 4], "big")
                offset += 4
            value, _ = self.decode(self.base + ptr)
            return value, offset
        size = ctrl & 0x1F
        if size == 29:
            size = 29 + self.buf[offset]
            offset += 1
        elif size == 30:
            size = 285 + int.from_bytes(self.buf[offset:offset + 2], "big")
            offset += 2
        elif size == 31:
            size = 65821 + int.from_bytes(self.buf[offset:offset + 3], "big")
            offset += 3
        if dtype == _T_STR:
            return self.buf[offset:offset + size].decode("utf-8"), offset + size
        if dtype == _T_BYTES:
            return self.buf[offset:offset + size], offset + size
        if dtype == _T_DOUBLE:
            if size != 8:
                raise MmdbError("double must be 8 bytes")
            return struct.unpack(">d", self.buf[offset:offset + 8])[0], offset + 8
        if dtype == _T_FLOAT:
            if size != 4:
                raise MmdbError("float must be 4 bytes")
            return struct.unpack(">f", self.buf[offset:offset + 4])[0], offset + 4
        if dtype in (_T_U16, _T_U32, _T_U64, _T_U128):
            return int.from_bytes(self.buf[offset:offset + size], "big"), offset + size
        if dtype == _T_I32:
            return int.from_bytes(self.buf[offset:offset + size], "big", signed=True), offset + size
        if dtype == _T_BOOL:
            return bool(size), offset
        if dtype == _T_MAP:
            out = {}
            for _ in range(size):
                k, offset = self.decode(offset)
                v, offset = self.decode(offset)
                out[k] = v
            return out, offset
        if dtype == _T_ARRAY:
            items = []
            for _ in range(size):
                v, offset = self.decode(offset)
                items.append(v)
            return items, offset
        raise MmdbError(f"unknown mmdb data type {dtype}")


@dataclass
class MmdbReader:
    """Parsed .mmdb: metadata + flattened IPv4 interval list."""

    metadata: dict
    node_count: int
    record_size: int
    _buf: bytes

    @classmethod
    def open(cls, path: str) -> "MmdbReader":
        with open(path, "rb") as f:
            buf = f.read()
        marker_at = buf.rfind(METADATA_MARKER)
        if marker_at < 0:
            raise MmdbError("no MaxMind.com metadata marker — not an mmdb file")
        meta_dec = _Decoder(buf, 0)
        metadata, _ = meta_dec.decode(marker_at + len(METADATA_MARKER))
        if metadata.get("binary_format_major_version") != 2:
            raise MmdbError(
                f"unsupported mmdb major version "
                f"{metadata.get('binary_format_major_version')!r}"
            )
        return cls(
            metadata=metadata,
            node_count=metadata["node_count"],
            record_size=metadata["record_size"],
            _buf=buf,
        )

    # -- tree walking --------------------------------------------------------

    def _read_record(self, node: int, right: bool) -> int:
        rs = self.record_size
        node_bytes = rs * 2 // 8
        at = node * node_bytes
        b = self._buf
        if rs == 24:
            o = at + (3 if right else 0)
            return int.from_bytes(b[o:o + 3], "big")
        if rs == 28:
            if right:
                return ((b[at + 3] & 0x0F) << 24) | int.from_bytes(b[at + 4:at + 7], "big")
            return ((b[at + 3] >> 4) << 24) | int.from_bytes(b[at:at + 3], "big")
        if rs == 32:
            o = at + (4 if right else 0)
            return int.from_bytes(b[o:o + 4], "big")
        raise MmdbError(f"unsupported record size {rs}")

    def _ipv4_root(self) -> int:
        """Root node for the IPv4 space: in an ip_version 6 tree, IPv4
        sits under 96 leading zero bits (spec §"IPv4 addresses in an
        IPv6 tree")."""
        node = 0
        if self.metadata.get("ip_version") == 6:
            for _ in range(96):
                if node >= self.node_count:
                    return node
                node = self._read_record(node, right=False)
        return node

    def ipv4_intervals(self) -> list[tuple[int, int, dict]]:
        """Every IPv4 network in the tree as (lo, hi, data) with lo/hi
        uint32 bounds — the dimension rows for the broadcast range join.
        Iterative DFS; data decoded once per distinct leaf offset."""
        data_base = self.node_count * (self.record_size * 2 // 8) + 16
        dec = _Decoder(self._buf, data_base)
        cache: dict[int, dict] = {}
        out: list[tuple[int, int, dict]] = []
        root = self._ipv4_root()
        if root >= self.node_count:
            return out
        stack: list[tuple[int, int, int]] = [(root, 0, 0)]  # node, prefix, depth
        while stack:
            node, prefix, depth = stack.pop()
            for right in (1, 0):
                rec = self._read_record(node, right=bool(right))
                child_prefix = (prefix << 1) | right
                if rec == self.node_count:
                    continue  # empty branch
                if rec < self.node_count:
                    if depth + 1 > 32:
                        raise MmdbError("tree deeper than 32 bits in IPv4 space")
                    stack.append((rec, child_prefix, depth + 1))
                    continue
                # leaf: pointer into the data section
                ptr = rec - self.node_count - 16
                if ptr not in cache:
                    value, _ = dec.decode(data_base + ptr)
                    if not isinstance(value, dict):
                        value = {"value": value}
                    cache[ptr] = value
                lo = child_prefix << (32 - (depth + 1))
                hi = lo + (1 << (32 - (depth + 1))) - 1
                out.append((lo, hi, cache[ptr]))
        out.sort(key=lambda t: t[0])
        return out


def load_mmdb_intervals(
    path: str, fields: list[str] | None = None
) -> list[tuple]:
    """Driver-side, config-time: .mmdb file -> flat interval rows
    (lo, hi, field...) ready for ``spark.createDataFrame`` and a
    broadcast range join. ``fields`` are dotted paths into each
    record's data map (e.g. 'country.names.en'); default: single
    'name' column from country.names.en / city.names.en / a flat
    'name' key, in that order."""
    reader = MmdbReader.open(path)

    def dig(d: dict, dotted: str):
        cur = d
        for part in dotted.split("."):
            if not isinstance(cur, dict) or part not in cur:
                return None
            cur = cur[part]
        return cur

    rows = []
    for lo, hi, data in reader.ipv4_intervals():
        if fields:
            rows.append((lo, hi, *[dig(data, f) for f in fields]))
        else:
            name = (
                dig(data, "country.names.en")
                or dig(data, "city.names.en")
                or data.get("name")
            )
            rows.append((lo, hi, name))
    return rows


# ---------------------------------------------------------------------------
# writer (fixture / tooling support)
# ---------------------------------------------------------------------------


class _Encoder:
    """Minimal data-section encoder: strings, uint16/32/64, double,
    bool, maps, arrays — enough for geoip-shaped records + metadata."""

    @staticmethod
    def _ctrl(dtype: int, size: int) -> bytes:
        if size > 28:
            if size - 29 <= 0xFF:
                head, ext = 29, (size - 29).to_bytes(1, "big")
            elif size - 285 <= 0xFFFF:
                head, ext = 30, (size - 285).to_bytes(2, "big")
            else:
                head, ext = 31, (size - 65821).to_bytes(3, "big")
        else:
            head, ext = size, b""
        if dtype <= 7:
            return bytes([(dtype << 5) | head]) + ext
        return bytes([head, dtype - 7]) + ext

    def encode(self, value) -> bytes:
        if isinstance(value, bool):
            return self._ctrl(_T_BOOL, 1 if value else 0)
        if isinstance(value, str):
            raw = value.encode("utf-8")
            return self._ctrl(_T_STR, len(raw)) + raw
        if isinstance(value, bytes):
            return self._ctrl(_T_BYTES, len(value)) + value
        if isinstance(value, float):
            return self._ctrl(_T_DOUBLE, 8) + struct.pack(">d", value)
        if isinstance(value, int):
            if value < 0:
                return self._ctrl(_T_I32, 4) + value.to_bytes(4, "big", signed=True)
            if value <= 0xFFFF:
                raw = value.to_bytes((value.bit_length() + 7) // 8, "big")
                return self._ctrl(_T_U16, len(raw)) + raw
            if value <= 0xFFFFFFFF:
                raw = value.to_bytes((value.bit_length() + 7) // 8, "big")
                return self._ctrl(_T_U32, len(raw)) + raw
            raw = value.to_bytes((value.bit_length() + 7) // 8, "big")
            return self._ctrl(_T_U64, len(raw)) + raw
        if isinstance(value, dict):
            body = b"".join(self.encode(k) + self.encode(v) for k, v in value.items())
            return self._ctrl(_T_MAP, len(value)) + body
        if isinstance(value, (list, tuple)):
            body = b"".join(self.encode(v) for v in value)
            return self._ctrl(_T_ARRAY, len(value)) + body
        raise MmdbError(f"cannot encode {type(value).__name__}")


def write_mmdb(
    path: str,
    networks: list[tuple[str, dict]],
    database_type: str = "axosyslog-spark-fixture",
    ip_version: int = 4,
    build_epoch: int | None = None,
) -> None:
    """Write a minimal spec-conformant .mmdb (record_size 24) from
    [('10.0.0.0/8', {...data map...}), ...] IPv4 CIDR entries.
    ip_version 6 wraps the IPv4 tree under 96 zero bits, like real
    GeoLite2 databases."""
    # 1. binary trie over the network bits
    nodes: list[list] = [[None, None]]  # child: None | ('n', idx) | ('d', data_idx)
    datas: list[dict] = []
    data_index: dict[bytes, int] = {}
    enc = _Encoder()

    v4_depth_base = 96 if ip_version == 6 else 0

    for cidr, data in networks:
        ip_s, _, plen_s = cidr.partition("/")
        plen = int(plen_s or "32")
        parts = [int(x) for x in ip_s.split(".")]
        if len(parts) != 4 or not 0 <= plen <= 32:
            raise MmdbError(f"bad IPv4 CIDR {cidr!r}")
        ip = (parts[0] << 24) | (parts[1] << 16) | (parts[2] << 8) | parts[3]
        key = enc.encode(data)
        if key not in data_index:
            data_index[key] = len(datas)
            datas.append(data)
        didx = data_index[key]
        node = 0
        total = v4_depth_base + plen
        for depth in range(total):
            if depth < v4_depth_base:
                bit = 0
            else:
                bit = (ip >> (31 - (depth - v4_depth_base))) & 1
            if depth == total - 1:
                if nodes[node][bit] is not None:
                    raise MmdbError(f"network {cidr} overlaps an earlier entry")
                nodes[node][bit] = ("d", didx)
            else:
                child = nodes[node][bit]
                if child is not None and child[0] == "d":
                    raise MmdbError(f"network {cidr} overlaps an earlier entry")
                if child is None:
                    nodes.append([None, None])
                    nodes[node][bit] = ("n", len(nodes) - 1)
                node = nodes[node][bit][1]

    node_count = len(nodes)

    # 2. data section: encode each distinct record, remember offsets
    data_blobs: list[bytes] = []
    data_offsets: list[int] = []
    at = 0
    for d in datas:
        raw = enc.encode(d)
        data_offsets.append(at)
        data_blobs.append(raw)
        at += len(raw)

    # 3. serialize the tree (24-bit records)
    def record_value(child) -> int:
        if child is None:
            return node_count  # "no data" sentinel
        kind, idx = child
        if kind == "n":
            return idx
        return node_count + 16 + data_offsets[idx]

    tree = bytearray()
    for left, right in nodes:
        tree += record_value(left).to_bytes(3, "big")
        tree += record_value(right).to_bytes(3, "big")

    metadata = {
        "binary_format_major_version": 2,
        "binary_format_minor_version": 0,
        "build_epoch": build_epoch if build_epoch is not None else int(time.time()),
        "database_type": database_type,
        "description": {"en": "fixture database"},
        "ip_version": ip_version,
        "languages": ["en"],
        "node_count": node_count,
        "record_size": 24,
    }
    with open(path, "wb") as f:
        f.write(bytes(tree))
        f.write(b"\x00" * 16)  # data section separator
        f.write(b"".join(data_blobs))
        f.write(METADATA_MARKER)
        f.write(enc.encode(metadata))
