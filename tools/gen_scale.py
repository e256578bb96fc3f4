#!/usr/bin/env python3
"""Structure-preserving scale-up of the documents/embeddings tables for
the BENCH_NOTES scale curve (sf0.1 -> sfN with N x the rows).

Usage: python3 tools/gen_scale.py <srcSfDir> <outDir> <tiles>

The driver's testdata stops at sf0.1; measuring one decade of scaling
needs an sf1-sized corpus whose PER-TILE structure matches the driver's
generator exactly. Each of the <tiles> tiles is the source corpus under
a tile-specific transform chosen so that

 - documents: every letter is mapped through a tile-seeded substitution
   cipher (a-z permutation; digits/whitespace unchanged). Token
   lengths, n_chars, gram counts, and the planted near-dup pair
   structure are preserved EXACTLY within a tile, while a cross-tile
   8-gram survives only when the composed permutation fixes every
   distinct letter in it (~26^-k, negligible) — so dup density (pairs
   per doc) stays constant as the corpus grows, which is how a real
   corpus scales (more docs, same dup rate), and banded dedup work
   grows linearly, not quadratically. (The earlier Caesar-shift
   variant aliased tiles k and k+26 into exact duplicates, capping the
   method at 26 tiles; the permutation removes the cap.)
 - embeddings: a tile-seeded SIGNED PERMUTATION of the dimensions
   (permute dims, then flip signs). Orthogonal and exact in float
   (values move, they are never recombined), so intra-tile cosines —
   and hence the per-tile cluster structure k-means/PQ sees — are
   bit-preserved, while cross-tile cosines decorrelate. (The earlier
   diagonal-sign variant used `(dim*101 + k*37) % 2`, which collapses
   to `(dim + k) % 2`: only TWO distinct patterns, so every third
   tile was a bit-exact copy. Pure diagonal signs are also weak even
   when distinct — a heavy coordinate keeps self-pair cosines high
   under any sign pattern; the permutation mixes coordinates.)

The remaining TPC-H tables are symlinked from the source dir (the bench
warm-up reads them; the heavy tier under measurement does not).

Dev-tool only (pyarrow/pandas are driver-side) — not part of the
shipped library; the generated dir is a bench artifact, not test input.
"""
import os
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def tile_cipher(k: int) -> dict:
    """Tile-seeded a-z substitution cipher as a str.translate table."""
    perm = np.random.default_rng(20_000 + k).permutation(26)
    return str.maketrans(
        "abcdefghijklmnopqrstuvwxyz",
        "".join(chr(97 + int(p)) for p in perm))


def main(src: str, out: str, tiles: int) -> None:
    os.makedirs(out, exist_ok=True)

    docs = pq.read_table(f"{src}/documents.parquet").to_pandas()
    n_docs = len(docs)
    doc_tiles = []
    for k in range(tiles):
        t = docs.copy()
        t["doc_id"] = t["doc_id"] + k * n_docs
        if k:
            table = tile_cipher(k)
            t["text"] = t["text"].map(lambda s, table=table:
                                      s.translate(table))
        doc_tiles.append(t)
    all_docs = pd.concat(doc_tiles, ignore_index=True)
    assert (all_docs["n_chars"] == all_docs["text"].str.len()).all()
    # one row group per tile: Spark splits parquet at row-group
    # boundaries, so a single jumbo group would serialize the scan
    pq.write_table(pa.Table.from_pandas(all_docs, preserve_index=False),
                   f"{out}/documents.parquet", row_group_size=n_docs)
    print(f"documents: {len(all_docs)} rows ({tiles} x {n_docs})")

    emb = pq.read_table(f"{src}/embeddings.parquet").to_pandas()
    n_vec = len(emb)
    mat = np.stack(emb["embedding"].to_numpy())  # (n, d) float32
    d = mat.shape[1]
    emb_tiles = []
    for k in range(tiles):
        t = emb.copy()
        t["vec_id"] = t["vec_id"] + k * n_vec
        if k:
            # tile-seeded signed permutation: exactly orthogonal, and each
            # coordinate is exact in float (no recombination) — but a
            # permutation reorders the terms of every downstream dot-product
            # sum, and float addition is not associative at the ULP level,
            # so intra-tile cosines are preserved up to float summation
            # reorder (near-threshold pair/rank decisions may flip per
            # tile), while cross-tile cosines decorrelate
            rng = np.random.default_rng(30_000 + k)
            perm = rng.permutation(d)
            signs = (rng.integers(0, 2, d) * 2 - 1).astype(np.float32)
            flipped = mat[:, perm] * signs
            t["embedding"] = list(flipped)
        emb_tiles.append(t)
    all_emb = pd.concat(emb_tiles, ignore_index=True)
    pq.write_table(pa.Table.from_pandas(all_emb, preserve_index=False),
                   f"{out}/embeddings.parquet", row_group_size=n_vec)
    print(f"embeddings: {len(all_emb)} rows ({tiles} x {n_vec})")

    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events"]:
        dst = f"{out}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{src}/{t}.parquet", dst)
    print(f"symlinked TPC-H tables from {src}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]))
