"""Property test: the perceptual-hash dedup pipeline equals a direct
sequential reference.

media_dhash composes a zero-padded key-frame extraction, a 2x2 block
downsample, the ring-difference bit rule, and the band packing;
phash_near_pairs adds the pigeonhole band join and the per-band
bit_count(xor) Hamming verify. The reference recomputes all of it in
plain Python over random byte payloads (including empty, short, and
constant frames), so any divergence in padding, block geometry, ring
wraparound, band layout, banding completeness, or the Hamming sum
shows up.
"""

from __future__ import annotations

import hypo
from hypothesis import given, strategies as st

from demo_apache_flink_streaming_mode_spark.operators import multimodal

payloads_strategy = st.lists(
    st.binary(min_size=0, max_size=300), min_size=2, max_size=14)


def _ref_bands(payload: bytes) -> tuple[int, ...]:
    fs = multimodal.PHASH_W * multimodal.PHASH_H
    grid, blk = multimodal.PHASH_GRID, multimodal.PHASH_W // multimodal.PHASH_GRID
    px = list(payload[:fs]) + [0] * (fs - min(len(payload), fs))
    bs = [[sum(px[(r * blk + dr) * multimodal.PHASH_W + c * blk + dc]
               for dr in range(blk) for dc in range(blk))
           for c in range(grid)] for r in range(grid)]
    bits = [[1 if bs[r][c] > bs[r][(c + 1) % grid] else 0
             for c in range(grid)] for r in range(grid)]
    return tuple(
        sum(bits[2 * k + dr][c] << (dr * grid + c)
            for dr in range(2) for c in range(grid))
        for k in range(multimodal.PHASH_BANDS))


def _ref_pairs(sigs: dict[int, tuple[int, ...]], max_h: int):
    out = {}
    ids = sorted(sigs)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            # candidate iff some band collides (the pigeonhole gate)
            if not any(x == y for x, y in zip(sigs[a], sigs[b])):
                continue
            h = sum(bin(x ^ y).count("1")
                    for x, y in zip(sigs[a], sigs[b]))
            if h <= max_h:
                out[(a, b)] = h
    return out


@hypo.budget(15)
@given(payloads=payloads_strategy)
def test_phash_pipeline_matches_sequential_reference(spark, payloads):
    media = spark.createDataFrame(
        [(i, bytearray(p)) for i, p in enumerate(payloads)],
        "doc_id long, media binary")
    sigs = {r.doc_id: (r.b0, r.b1, r.b2, r.b3)
            for r in multimodal.media_dhash(media).collect()}
    assert sigs == {i: _ref_bands(p) for i, p in enumerate(payloads)}
    got = {(r.doc_a, r.doc_b): r.hamming
           for r in multimodal.phash_near_pairs(media).collect()}
    assert got == _ref_pairs(sigs, multimodal.PHASH_MAX_HAMMING)
