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
import sys

import duckdb


def main(dump_dir: str, obj: str = "PosPinned") -> None:
    files = glob.glob(f"{dump_dir}/*.parquet")
    if not files:
        raise SystemExit(f"no parquet under {dump_dir}")
    con = duckdb.connect()
    df = con.execute(
        f"SELECT * FROM read_parquet({files!r}) ORDER BY txn_id").df()

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
    main(sys.argv[1], sys.argv[2] if len(sys.argv) > 2 else "PosPinned")
