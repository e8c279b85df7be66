"""Perceptual average-hash near-dup (operators/multimodal.ahash_*)."""

from __future__ import annotations

import numpy as np

from deepdoctection_spark.operators import multimodal as mm


def _slow_ahash_bits(a: np.ndarray) -> list[int]:
    """Independent per-cell replay of the documented definition."""
    h, w, _ = a.shape
    gray = a.astype(np.int64).sum(axis=2)
    total_sum, total_n = int(gray.sum()), gray.size
    bits = []
    for gy in range(8):
        for gx in range(8):
            s = n = 0
            for y in range(h):
                for x in range(w):
                    if (y * 8) // h == gy and (x * 8) // w == gx:
                        s += int(gray[y, x]); n += 1
            bits.append(1 if s * total_n > total_sum * n else 0)
    return bits


def test_kernel_matches_slow_replay(spark):
    mid = 7
    w, h, c = mm._img_dims(mid)
    raw = mm.fimg_encode(mid % 256, w, h, c)
    img = mm.fimg_decode(raw)
    expect = _slow_ahash_bits(img)
    media = spark.createDataFrame(
        [(mid, "image/fimg", w, h, c, raw)],
        mm.IMG_SCHEMA.replace(" long", " long").replace(" int", " int"),
    )
    row = mm.ahash_bands(media).collect()[0]
    got_bits = []
    for k in range(4):
        v = row[f"b{k}"]
        got_bits += [(v >> (15 - j)) & 1 for j in range(16)]
    assert got_bits == expect and row["error"] is None


def test_planted_copies_recovered_and_exact_dups_zero(spark, sf_small):
    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    imgs = mm.synth_images(docs).unionByName(mm.synth_images_perturbed(docs))
    pairs = mm.ahash_neardup(mm.ahash_bands(imgs)).collect()
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs}
    n_docs = docs.count()
    for d in range(min(15, n_docs)):
        assert (d, d + 100000) in got, f"planted copy of {d} not recovered"
        assert got[(d, d + 100000)] <= 6
    # identical params -> identical image -> hamming 0
    ident = [(a, b) for (a, b), hd in got.items()
             if hd == 0 and b - a == 256 and b < 100000]
    for a, b in ident:
        assert a % 256 == b % 256


def test_poison_payload_quarantines(spark):
    media = spark.createDataFrame(
        [(1, "image/fimg", 4, 4, 3, b"NOTANIMAGE")],
        "media_id long, media_type string, width int, height int, "
        "channels int, content binary",
    )
    rows = mm.ahash_bands(media).collect()
    assert len(rows) == 1 and rows[0]["error"] is not None
    assert mm.ahash_neardup(mm.ahash_bands(media)).count() == 0
