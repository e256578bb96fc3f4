#!/usr/bin/env python3
"""Band-bucket skew analysis for the four media near-dup families
(r16 OOM investigation): replicates the engine's synthetic content +
fingerprint formulas (Multimodal.scala blockValue/jpegBlockValue/
sampleValue/framePixel, dHash/aHash/vHash delta-sign packing) in numpy
and reports, per modality and corpus size, the 16-bit-band bucket
histogram: distinct hashes, the largest bucket K, and the candidate
pair count sum C(K,2) the phashPairs equi-join must materialize.

Dev-tool only (analysis, not product code).

Usage: mm_band_skew.py [n_docs ...]   (default 2000 20000 200000)
"""
import sys
from collections import Counter

import numpy as np


def luma(v):
    """Color luma for RGB/palette color types: (77R+150G+29B)>>8."""
    return (77 * v + 150 * ((v + 31) % 256) + 29 * ((v + 97) % 256)) >> 8


def image_hashes(n):
    """PNG dHash per doc; drops quarantined (d%91==0 trunc, d%97 CRC)."""
    d = np.arange(n, dtype=np.int64)
    keep = (d % 91 != 0) & (d % 97 != 0)
    d = d[keep]
    g = d // 4
    ct = g % 5  # 0 gray, 1 palette, 2 rgb, 4 rgba (palette/rgb/rgba same luma)
    bx = np.arange(9)
    by = np.arange(8)
    BX, BY = np.meshgrid(bx, by, indexing="ij")  # (9, 8)
    m = ((g[:, None, None] * 72 + BY * 9 + BX) % 509)
    v = (m ** 3) % 509
    pert = np.where((BX + BY * 9 + d[:, None, None]) % 23 == 0,
                    (d % 4)[:, None, None] * 8, 0)
    val = (v + pert) % 256
    gray = ct[:, None, None] == 0
    L = np.where(gray, val, luma(val))
    return d, pack_dhash(L)


def jpeg_hashes(n):
    """JPEG dHash per doc. 72x64, 9x8 grid cell == one 8x8 block of the
    SAME blockValue mosaic as PNG (Multimodal.jpegImageAssets); drops
    d%91 truncated. APPROXIMATION: color modes' decoded luma passes the
    YCbCr fold (chromaCb/Cr shift it) — modeled here as the raw Y
    plane, so distinct-hash counts are a lower bound of the same order;
    the skew SHAPE (buckets ~ content diversity, not corpus size) is
    exact."""
    d = np.arange(n, dtype=np.int64)
    d = d[d % 91 != 0]
    g = d // 4
    bx = np.arange(9)
    by = np.arange(8)
    BX, BY = np.meshgrid(bx, by, indexing="ij")
    m = ((g[:, None, None] * 72 + BY * 9 + BX) % 509)
    v = (m ** 3) % 509
    pert = np.where((BX + BY * 9 + d[:, None, None]) % 23 == 0,
                    (d % 4)[:, None, None] * 8, 0)
    val = (v + pert) % 256
    return d, pack_dhash(val)


def pack_dhash(L):
    """L: (n, 9, 8) luma grid -> (hi, lo) per doc."""
    n = L.shape[0]
    hi = np.zeros(n, dtype=np.uint64)
    lo = np.zeros(n, dtype=np.uint64)
    for byy in range(8):
        for bxx in range(8):
            pos = byy * 8 + bxx
            bit = (L[:, bxx + 1, byy] > L[:, bxx, byy]).astype(np.uint64)
            if pos >= 32:
                hi |= bit << np.uint64(pos - 32)
            else:
                lo |= bit << np.uint64(pos)
    return hi, lo


def delta_sign(e):
    """e: (n, 65) energies -> (hi, lo)."""
    n = e.shape[0]
    hi = np.zeros(n, dtype=np.uint64)
    lo = np.zeros(n, dtype=np.uint64)
    for f in range(64):
        bit = (e[:, f + 1] > e[:, f]).astype(np.uint64)
        if f >= 32:
            hi |= bit << np.uint64(f - 32)
        else:
            lo |= bit << np.uint64(f)
    return hi, lo


def audio_hashes(n, chunk=20000):
    d_all = np.arange(n, dtype=np.int64)
    d_all = d_all[d_all % 89 != 0]  # truncated WAVs quarantine
    his, los = [], []
    s = np.arange(65 * 32, dtype=np.int64)
    for c0 in range(0, len(d_all), chunk):
        d = d_all[c0:c0 + chunk]
        m = ((d[:, None] // 4) * 97 + s) % 509
        val = ((m ** 3) % 509)
        pert = np.where((s + d[:, None]) % 37 == 0, (d % 4)[:, None] * 16, 0)
        sample = (val + pert) % 1024 - 512
        e = np.abs(sample).reshape(len(d), 65, 32).sum(axis=2)
        hi, lo = delta_sign(e)
        his.append(hi)
        los.append(lo)
    return d_all, (np.concatenate(his), np.concatenate(los))


def video_hashes(n, chunk=20000):
    d_all = np.arange(n, dtype=np.int64)
    d_all = d_all[d_all % 83 != 0]  # truncated MP4s quarantine
    his, los = [], []
    idx = np.arange(65 * 32, dtype=np.int64)  # f*32 + i
    for c0 in range(0, len(d_all), chunk):
        d = d_all[c0:c0 + chunk]
        m = ((d[:, None] // 4) * 103 + idx) % 509
        val = (m ** 3) % 509
        pert = np.where((idx + d[:, None]) % 43 == 0, (d % 4)[:, None] * 8, 0)
        px = (val + pert) % 256
        e = px.reshape(len(d), 65, 32).sum(axis=2)
        hi, lo = delta_sign(e)
        his.append(hi)
        los.append(lo)
    return d_all, (np.concatenate(his), np.concatenate(los))


def bands(hi, lo):
    return [lo & np.uint64(0xFFFF), lo >> np.uint64(16),
            hi & np.uint64(0xFFFF), hi >> np.uint64(16)]


def analyze(name, ids, hilo):
    hi, lo = hilo
    full = [(int(h), int(l)) for h, l in zip(hi, lo)]
    n_distinct = len(set(full))
    print(f"\n== {name}: {len(ids)} decodable docs, "
          f"{n_distinct} distinct hashes ==")
    total_cand = 0
    worst = 0
    for b, bv in enumerate(bands(hi, lo)):
        cnt = Counter(bv.tolist())
        top = cnt.most_common(3)
        cand = sum(k * (k - 1) // 2 for k in cnt.values())
        total_cand += cand
        worst = max(worst, top[0][1])
        print(f"  band {b}: {len(cnt)} buckets, top sizes "
              f"{[k for _, k in top]}, sum C(K,2) = {cand:,}")
    print(f"  TOTAL candidate rows (pre-distinct) = {total_cand:,}; "
          f"largest single bucket K = {worst:,} "
          f"(=> {worst * (worst - 1) // 2:,} pairs in ONE join task)")


def main(ns):
    for n in ns:
        print(f"\n######## corpus n_docs = {n} ########")
        analyze("image/png dHash", *image_hashes(n))
        analyze("image/jpeg dHash", *jpeg_hashes(n))
        analyze("audio aHash", *audio_hashes(n))
        analyze("video vHash", *video_hashes(n))


if __name__ == "__main__":
    ns = [int(a) for a in sys.argv[1:]] or [2000, 20000, 200000]
    main(ns)
