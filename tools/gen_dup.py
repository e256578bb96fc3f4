#!/usr/bin/env python3
"""Duplicate-heavy variant of a (possibly gen_scale-tiled) sf dir for
the r17 contraction-gate A/B (judge ask #4).

Plants, per row-group-sized tile of the source corpus, one exact-dup
group of COPIES_A copies and one of COPIES_B copies — the "40+25-copy
corpus" shape the DedupSpec labels≡full-relation pins use — in BOTH
documents (text copied verbatim -> identical shingle fingerprints) and
embeddings (vector copied bit-exact -> identical sign-LSH buckets and
unit cosines). New rows get fresh ids above the source id range so the
clean rows' ids (and therefore cluster reps) are unchanged.

Usage: tools/gen_dup.py <srcSfDir> <outDir> [copiesA=40] [copiesB=25]

Dev-tool only (pyarrow/pandas are driver-side); the generated dir is a
bench artifact, not test input.
"""
import os
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def plant(df: pd.DataFrame, id_col: str, tile_rows: int,
          copies_a: int, copies_b: int) -> pd.DataFrame:
    n = len(df)
    tiles = max(1, n // tile_rows)
    next_id = int(df[id_col].max()) + 1
    extra = []
    rng = np.random.default_rng(77)
    for t in range(tiles):
        lo, hi = t * tile_rows, min((t + 1) * tile_rows, n)
        for copies in (copies_a, copies_b):
            src = df.iloc[int(rng.integers(lo, hi))]
            block = pd.DataFrame([src] * (copies - 1))
            block[id_col] = np.arange(next_id, next_id + copies - 1)
            next_id += copies - 1
            extra.append(block)
    out = pd.concat([df] + extra, ignore_index=True)
    return out


def main(src: str, out: str, copies_a: int, copies_b: int) -> None:
    os.makedirs(out, exist_ok=True)

    docs = pq.read_table(f"{src}/documents.parquet").to_pandas()
    # tile size = the gen_scale row-group unit (5000 at the driver's
    # sf0.1); for un-tiled dirs this is just "the whole corpus once"
    docs_out = plant(docs, "doc_id", 5000, copies_a, copies_b)
    pq.write_table(pa.Table.from_pandas(docs_out, preserve_index=False),
                   f"{out}/documents.parquet", row_group_size=5000)
    print(f"documents: {len(docs)} -> {len(docs_out)} rows")

    emb = pq.read_table(f"{src}/embeddings.parquet").to_pandas()
    emb_out = plant(emb, "vec_id", 2000, copies_a, copies_b)
    pq.write_table(pa.Table.from_pandas(emb_out, preserve_index=False),
                   f"{out}/embeddings.parquet", row_group_size=2000)
    print(f"embeddings: {len(emb)} -> {len(emb_out)} rows")

    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events"]:
        dst = f"{out}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(os.path.realpath(f"{src}/{t}.parquet"), dst)
    print(f"symlinked TPC-H tables from {src}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         int(sys.argv[3]) if len(sys.argv) > 3 else 40,
         int(sys.argv[4]) if len(sys.argv) > 4 else 25)
