#!/usr/bin/env python3
"""Regenerate src/main/scala/graft/etl/PosPinned.scala — the frozen
VALUES oracle for q_pos_generate.

Usage:
  sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/out q_pos_generate,q_pos_source"
  python3 tools/gen_pos_oracle.py /tmp/out/q_pos_generate PosPinned
  python3 tools/gen_pos_oracle.py /tmp/out/q_pos_source PosSourcePinned

The generator is deterministic (seeded murmur3 column expressions), but
no SQL engine replays Spark's murmur3 — so the oracle is a pinned
capture. Run this ONLY after a deliberate generator change; an oracle
mismatch otherwise means the generator's output drifted, which is what
the pin exists to catch.  Dev-tool only — not part of the shipped
library.
"""
import glob
import re
import sys

import duckdb

M32 = 0xFFFFFFFF


def _rotl(x, r):
    x &= M32
    return ((x << r) | (x >> (32 - r))) & M32


def _mix_k1(k1):
    k1 = (k1 * 0xCC9E2D51) & M32
    k1 = _rotl(k1, 15)
    return (k1 * 0x1B873593) & M32


def _mix_h1(h1, k1):
    h1 = (h1 ^ k1) & M32
    h1 = _rotl(h1, 13)
    return (h1 * 5 + 0xE6546B64) & M32


def _fmix(h1, length):
    h1 = (h1 ^ length) & M32
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & M32
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & M32
    h1 ^= h1 >> 16
    return h1


def _hash_long(v, seed):
    """Spark Murmur3_x86_32.hashLong: low word then high word."""
    h1 = _mix_h1(seed & M32, _mix_k1(v & M32))
    h1 = _mix_h1(h1, _mix_k1((v >> 32) & M32))
    return _fmix(h1, 8)


def _hash_bytes(b, seed):
    """Spark Murmur3_x86_32.hashUnsafeBytes: 4-byte little-endian words,
    then a SIGNED byte-at-a-time tail (Spark's own non-standard variant,
    kept for compatibility since 2.3)."""
    h1 = seed & M32
    aligned = len(b) - len(b) % 4
    for i in range(0, aligned, 4):
        h1 = _mix_h1(h1, _mix_k1(int.from_bytes(b[i:i + 4], "little")))
    for i in range(aligned, len(b)):
        byte = b[i] if b[i] < 0x80 else b[i] - 256  # signed, as getByte
        h1 = _mix_h1(h1, _mix_k1(byte & M32))
    return _fmix(h1, len(b))


def _scala_string_hash(s, seed=0xF7CA7FD2):
    """Scala MurmurHash3.stringHash: UTF-16 chars mixed two at a time."""
    h = seed & M32
    i = 0
    while i + 1 < len(s):
        h = _mix_h1(h, _mix_k1((ord(s[i]) << 16) + ord(s[i + 1])))
        i += 2
    if i < len(s):
        h = (h ^ _mix_k1(ord(s[i]))) & M32  # mixLast: no rotate/mul
    return _fmix(h, len(s))


def _signed32(v):
    v &= M32
    return v - (1 << 32) if v >= (1 << 31) else v


def _spark_hash(seed_long, tag, row_id):
    """Spark hash(lit(seed), lit(tag), col(id)) — seed 42, chained."""
    h = _hash_long(seed_long, 42)
    h = _hash_bytes(tag.encode("utf-8"), h)
    return _signed32(_hash_long(row_id, h))


def _pmod(a, n):
    r = a % n if a >= 0 else -((-a) % n)  # Java % truncates toward zero
    return r + n if r < 0 else r


STORES = ["SFO-001", "NYC-014", "AUS-002"]
SKUS = ["SKU-APPLE", "SKU-MILK", "SKU-BREAD", "SKU-COFFEE", "SKU-RICE"]
PRICES = [199, 299, 399, 599, 899]
TENDERS = ["cash", "card", "ebt"]


def cross_check(df, scenario="ok"):
    """Independent replay of PosGenerator's murmur3 field derivations
    (graft.etl.PosGenerator.h / pick): the pin is captured from the
    engine's own dump, so without this a bug present at capture time
    would be frozen into the oracle. Every row's hash-derived fields are
    recomputed here from a from-scratch murmur3 (Spark variant for the
    field hashes, Scala variant for the seed) and must match the dump
    BEFORE the capture is written."""
    for _, r in df.iterrows():
        m = re.fullmatch(r"(.+)-txn-(\d{6,})", r.txn_id)
        if not m:
            raise SystemExit(f"unparseable txn_id {r.txn_id!r}")
        run_id, row_id = m.group(1), int(m.group(2))
        seed = _scala_string_hash(f"{run_id}::{scenario}") & M32

        def pick(tag, values):
            return values[_pmod(_spark_hash(seed, tag, row_id), len(values))]

        expect = {
            "store_id": pick("store", STORES),
            "sku": pick("sku", SKUS),
            "quantity": _pmod(_spark_hash(seed, "qty", row_id), 5) + 1,
            "unit_price_cents": pick("price", PRICES),
            "tender_type": pick("tender", TENDERS),
        }
        for k, want in expect.items():
            got = r[k]
            if (int(got) if k in ("quantity", "unit_price_cents") else got) != want:
                raise SystemExit(
                    f"cross-check FAILED {r.txn_id} {k}: dump={got!r} "
                    f"independent-murmur3={want!r} — do NOT pin this capture")
    print(f"cross-check OK: {len(df)} rows match the independent murmur3 replay")


def main(dump_dir: str, obj: str = "PosPinned", scenario: str = "ok") -> None:
    files = glob.glob(f"{dump_dir}/*.parquet")
    if not files:
        raise SystemExit(f"no parquet under {dump_dir}")
    con = duckdb.connect()
    df = con.execute(
        f"SELECT * FROM read_parquet({files!r}) ORDER BY txn_id").df()
    cross_check(df, scenario)

    def q(s):
        return "'" + str(s).replace("'", "''") + "'"

    rows = []
    for _, r in df.iterrows():
        cust = "NULL" if r.customer_id is None or isinstance(
            r.customer_id, float) else q(r.customer_id)
        rows.append(
            f"(TIMESTAMP '{r.event_time}', {q(r.txn_id)}, {q(r.store_id)}, "
            f"{q(r.sku)}, {int(r.quantity)}, {int(r.unit_price_cents)}, "
            f"{q(r.tender_type)}, {cust})")
    body = ",\n      |  ".join(rows)
    scala = f'''package graft.etl

/** GENERATED pinned oracle rows ({obj}) — the 200 deterministic wire
  * transactions of the seeded POS source (murmur3 derivations have no
  * SQL replay, so the oracle is a frozen VALUES capture). Regenerate
  * with `tools/gen_pos_oracle.py` ONLY after a deliberate generator
  * change — a hash mismatch here means the output drifted, which is
  * exactly what the pin exists to catch.
  */
object {obj} {{
  val valuesSql: String =
    """(VALUES
      |  {body})
      | AS t(event_time, txn_id, store_id, sku, quantity,
      |      unit_price_cents, tender_type, customer_id)""".stripMargin
}}
'''
    out = f"src/main/scala/graft/etl/{obj}.scala"
    with open(out, "w") as f:
        f.write(scala)
    print(f"wrote {out} ({len(rows)} rows)")


if __name__ == "__main__":
    # usage: gen_pos_oracle.py <dump_dir> [ObjectName] [scenario]
    # the scenario must match the one the dump was captured under -- the
    # generator seed folds it in, so replaying "ok" against a drift/dupe
    # capture hard-fails the cross-check even when the capture is valid
    main(sys.argv[1], sys.argv[2] if len(sys.argv) > 2 else "PosPinned",
         sys.argv[3] if len(sys.argv) > 3 else "ok")
