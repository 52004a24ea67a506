"""Pure-Python MD4 (RFC 1320) for the $(md4) template function.

The reference ships $(md4) in modules/cryptofuncs/cryptofuncs.c; the
JVM and OpenSSL 3 both dropped MD4 as a legacy digest, so this is a
from-the-RFC implementation. It backs a pandas UDF (Arrow-batched),
which is fine here: $(md4) exists for parity with legacy log fields
(NTLM-era hashes), never on a throughput-critical path — use
$(sha256)/$(md5) (JVM-side) for new configs.

Verified against every test vector in RFC 1320 §A.5.
"""

from __future__ import annotations

import struct

_MASK = 0xFFFFFFFF


def _rol(x: int, s: int) -> int:
    x &= _MASK
    return ((x << s) | (x >> (32 - s))) & _MASK


def md4_digest(data: bytes) -> bytes:
    a, b, c, d = 0x67452301, 0xEFCDAB89, 0x98BADCFE, 0x10325476

    msg = data + b"\x80"
    msg += b"\x00" * ((56 - len(msg) % 64) % 64)
    msg += struct.pack("<Q", (len(data) * 8) & 0xFFFFFFFFFFFFFFFF)

    for off in range(0, len(msg), 64):
        x = struct.unpack("<16I", msg[off:off + 64])
        aa, bb, cc, dd = a, b, c, d

        # round 1: F(x,y,z) = (x & y) | (~x & z)
        for i in range(0, 16, 4):
            a = _rol(a + ((b & c) | (~b & d)) + x[i], 3)
            d = _rol(d + ((a & b) | (~a & c)) + x[i + 1], 7)
            c = _rol(c + ((d & a) | (~d & b)) + x[i + 2], 11)
            b = _rol(b + ((c & d) | (~c & a)) + x[i + 3], 19)

        # round 2: G(x,y,z) = (x & y) | (x & z) | (y & z), k = 0x5A827999
        for i in range(4):
            a = _rol(a + ((b & c) | (b & d) | (c & d)) + x[i] + 0x5A827999, 3)
            d = _rol(d + ((a & b) | (a & c) | (b & c)) + x[i + 4] + 0x5A827999, 5)
            c = _rol(c + ((d & a) | (d & b) | (a & b)) + x[i + 8] + 0x5A827999, 9)
            b = _rol(b + ((c & d) | (c & a) | (d & a)) + x[i + 12] + 0x5A827999, 13)

        # round 3: H(x,y,z) = x ^ y ^ z, k = 0x6ED9EBA1
        for i in (0, 2, 1, 3):
            a = _rol(a + (b ^ c ^ d) + x[i] + 0x6ED9EBA1, 3)
            d = _rol(d + (a ^ b ^ c) + x[i + 8] + 0x6ED9EBA1, 9)
            c = _rol(c + (d ^ a ^ b) + x[i + 4] + 0x6ED9EBA1, 11)
            b = _rol(b + (c ^ d ^ a) + x[i + 12] + 0x6ED9EBA1, 15)

        a = (a + aa) & _MASK
        b = (b + bb) & _MASK
        c = (c + cc) & _MASK
        d = (d + dd) & _MASK

    return struct.pack("<4I", a, b, c, d)


def md4_hex(data: bytes) -> str:
    return md4_digest(data).hex()
