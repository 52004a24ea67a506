"""secure-logging: forward-secure sealed log chains ($(slog) analog).

Reference: modules/secure-logging/slog.c — each log entry is encrypted
and MAC'd with a key that EVOLVES after every entry (k_{i+1} = H(k_i),
evolveKey), so an attacker who compromises the host at time T cannot
forge or silently truncate entries sealed before T; an aggregated MAC
chains the per-entry MACs, and slogverify replays the evolution from
k_0 to detect tampering/truncation/reordering.

Primitive substitution, documented: the reference uses AES-256-GCM +
AES-CMAC (OpenSSL). This container has no OpenSSL/cryptography
bindings, so the same PROTOCOL runs over hashlib primitives —
SHA-256 key evolution, HMAC-SHA-256 entry MACs, a SHA-256-keystream
XOR cipher for confidentiality, HMAC aggregation. The forward-security
and verification semantics (what slogverify checks) are preserved;
the cipher/MAC algorithms are not AES — swap _keystream/_mac for an
AES backend where one exists.

Spark shape: a chain is inherently sequential (entry i needs k_i),
so sealing runs as ONE applyInPandas pass per chain key ordered by
the sequence column — the same justified Python-on-hot-path shape as
the smart-multi-line FSM; everything per-batch is Arrow-vectorized
I/O with a tight Python loop over the chain.
"""

from __future__ import annotations

import hashlib
import hmac as hmac_mod

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

KEY_LEN = 32


def evolve_key(k: bytes) -> bytes:
    """k_{i+1} = H(k_i) (slog.c evolveKey)."""
    return hashlib.sha256(k + b"axo-slog-evolve").digest()


def derive_key(k0: bytes, n: int) -> bytes:
    """k_n from k_0 — the slogkey utility's fast-forward."""
    k = k0
    for _ in range(n):
        k = evolve_key(k)
    return k


def _subkeys(k: bytes) -> tuple[bytes, bytes]:
    """(encKey, MACKey) from the entry key (slog.c deriveSubKeys)."""
    return (
        hashlib.sha256(k + b"\x36" * 16).digest(),
        hashlib.sha256(k + b"\x5c" * 16).digest(),
    )


def _keystream(enc_key: bytes, ctr: int, n: int) -> bytes:
    out = b""
    i = 0
    while len(out) < n:
        out += hashlib.sha256(
            enc_key + ctr.to_bytes(8, "big") + i.to_bytes(4, "big")
        ).digest()
        i += 1
    return out[:n]


def _seal_one(k: bytes, ctr: int, agg: bytes, msg: bytes) -> tuple[str, str, str]:
    enc_key, mac_key = _subkeys(k)
    ct = bytes(a ^ b for a, b in zip(msg, _keystream(enc_key, ctr, len(msg))))
    mac = hmac_mod.new(
        mac_key, ctr.to_bytes(8, "big") + ct, hashlib.sha256
    ).digest()
    new_agg = hmac_mod.new(mac_key, agg + mac, hashlib.sha256).digest()
    return ct.hex(), mac.hex(), new_agg


def seal_chain(key0_hex: str, msgs: list[str], start: int = 0) -> list[dict]:
    """Seal an ordered message list; driver-side core shared by the
    Spark operator and tests (slogencrypt analog)."""
    k = derive_key(bytes.fromhex(key0_hex), start)
    agg = b"\x00" * KEY_LEN
    out = []
    for i, m in enumerate(msgs):
        ctr = start + i
        ct, mac, agg = _seal_one(k, ctr, agg, m.encode())
        out.append({"ctr": ctr, "ct": ct, "mac": mac, "agg": agg.hex()})
        k = evolve_key(k)
    return out


def verify_chain(key0_hex: str, entries: list[dict]) -> tuple[bool, list[str]]:
    """slogverify analog: replay the key evolution from k_0, recompute
    every entry MAC + the aggregate; reports tamper/reorder (MAC
    mismatch), truncation (aggregate mismatch at the tail), and
    decrypts as it goes. Returns (ok, recovered_messages)."""
    k = bytes.fromhex(key0_hex)
    agg = b"\x00" * KEY_LEN
    msgs: list[str] = []
    for i, e in enumerate(entries):
        if e["ctr"] != i:
            return False, msgs
        enc_key, mac_key = _subkeys(k)
        ct = bytes.fromhex(e["ct"])
        mac = hmac_mod.new(
            mac_key, i.to_bytes(8, "big") + ct, hashlib.sha256
        ).digest()
        if mac.hex() != e["mac"]:
            return False, msgs
        agg = hmac_mod.new(mac_key, agg + mac, hashlib.sha256).digest()
        if agg.hex() != e["agg"]:
            return False, msgs
        msgs.append(
            bytes(
                a ^ b for a, b in zip(ct, _keystream(enc_key, i, len(ct)))
            ).decode()
        )
        k = evolve_key(k)
    return True, msgs


def slog_seal(
    df: DataFrame,
    key0_hex: str,
    chain_col: str = "conv_id",
    order_col: str = "turn_idx",
    src_col: str = "text",
) -> DataFrame:
    """Seal every chain (one per ``chain_col`` value, ordered by
    ``order_col``) with its own evolution starting at k_0: adds
    slog_ctr / slog_ct / slog_mac / slog_agg columns. One
    applyInPandas pass per chain — the per-entry loop is the protocol,
    not an implementation shortcut (entry i's key depends on entry
    i-1)."""
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
    )

    schema = StructType(
        df.schema.fields
        + [
            StructField("slog_ctr", LongType()),
            StructField("slog_ct", StringType()),
            StructField("slog_mac", StringType()),
            StructField("slog_agg", StringType()),
        ]
    )

    def seal(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col).reset_index(drop=True)
        sealed = seal_chain(key0_hex, pdf[src_col].fillna("").tolist())
        pdf["slog_ctr"] = [e["ctr"] for e in sealed]
        pdf["slog_ct"] = [e["ct"] for e in sealed]
        pdf["slog_mac"] = [e["mac"] for e in sealed]
        pdf["slog_agg"] = [e["agg"] for e in sealed]
        return pdf

    return df.groupBy(chain_col).applyInPandas(seal, schema)
