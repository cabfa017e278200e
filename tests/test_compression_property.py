"""Property tests: the from-scratch gzip (RFC 1952) and bzip2 codecs,
held to the r10 DEFLATE standard — bitstream conformance proven BOTH
WAYS against the independent stdlib implementations (gzip/zlib and
bz2/libbzip2), plus structural round-trips for the internal stages
(CRC-32 vs zlib.crc32 bit-for-bit, forward/inverse BWT, RLE1) and
fail-fast rejection of corrupted streams. No Spark session: these
drive the codec functions directly so hypothesis can shrink.
"""

from __future__ import annotations

import bz2
import gzip
import io
import struct
import zlib

import pytest
import hypo
from hypothesis import given, strategies as st

from demo_apache_flink_streaming_mode_spark.operators import (
    compression as cz)

# codec-hostile payload shapes: empty, runs (RLE1 boundaries at 4 and
# 259), alternating extremes, full byte alphabet, high-entropy-ish
payloads = st.one_of(
    st.binary(min_size=0, max_size=2000),
    st.sampled_from([
        b"", b"a", b"x" * 3, b"x" * 4, b"x" * 5, b"x" * 251 + b"y",
        b"x" * 255, b"x" * 259, b"x" * 260, b"x" * 1000,
        bytes([0, 255] * 300), bytes(range(256)) * 3,
        b"ab" * 500, b"banana" * 100,
    ]),
)


# --- CRC-32 ---------------------------------------------------------------

@hypo.budget(60)
@given(st.binary(min_size=0, max_size=4000))
def test_crc32_matches_zlib_bit_for_bit(data):
    """The from-scratch reflected CRC-32 (RFC 1952) is the same
    function stdlib zlib exposes — pinned on arbitrary payloads."""
    assert cz._crc32(data) == zlib.crc32(data)


# --- gzip -----------------------------------------------------------------

@hypo.budget(60)
@given(st.binary(min_size=0, max_size=20000), st.integers(0, 9))
def test_gunzip_interop_stdlib_streams_any_level(data, level):
    """The from-scratch gzip member parser decodes streams produced by
    an INDEPENDENT implementation (stdlib gzip) at every compression
    level, agreeing with gzip.decompress byte-for-byte."""
    z = gzip.compress(data, level, mtime=0)
    assert cz._gunzip(z) == (data, 1)
    assert gzip.decompress(z) == data


@hypo.budget(60)
@given(st.binary(min_size=0, max_size=20000))
def test_gzip_interop_stdlib_decodes_our_streams(data):
    """Inverse direction: stdlib gzip.decompress accepts every member
    the from-scratch emitter produces (raw-DEFLATE body + from-scratch
    CRC-32/ISIZE trailer), and _gunzip agrees."""
    z = cz._gzip(data)
    assert gzip.decompress(z) == data
    assert cz._gunzip(z) == (data, 1)


@hypo.budget(40)
@given(st.lists(st.binary(min_size=0, max_size=300), min_size=1,
                max_size=4))
def test_gzip_multi_member_concatenation(parts):
    """RFC 1952 streams concatenate; the parser walks every member and
    reports the count."""
    blob = b"".join(cz._gzip(p) for p in parts)
    assert cz._gunzip(blob) == (b"".join(parts), len(parts))


def test_gunzip_full_header_grammar_and_rejection():
    payload = b"header grammar target" * 8
    # FNAME via the stdlib file writer
    buf = io.BytesIO()
    with gzip.GzipFile(filename="n.txt", mode="wb", fileobj=buf,
                       mtime=0) as f:
        f.write(payload)
    assert cz._gunzip(buf.getvalue()) == (payload, 1)
    # hand-built member with FEXTRA + FNAME + FCOMMENT + FHCRC
    body = cz._deflate_raw(payload)
    hdr = bytearray(b"\x1f\x8b\x08" + bytes([cz._FEXTRA | cz._FNAME
                                             | cz._FCOMMENT | cz._FHCRC])
                    + struct.pack("<I", 0) + b"\x00\xff")
    hdr += struct.pack("<H", 4) + b"ABCD"          # FEXTRA
    hdr += b"name\x00" + b"comment\x00"            # FNAME, FCOMMENT
    hdr += struct.pack("<H", cz._crc32(bytes(hdr)) & 0xFFFF)
    blob = (bytes(hdr) + body
            + struct.pack("<II", cz._crc32(payload), len(payload)))
    assert cz._gunzip(blob) == (payload, 1)
    good = cz._gzip(payload)
    for mutate in (
        lambda b: b[:4],                            # truncated header
        lambda b: b"\x1e" + b[1:],                  # bad magic
        lambda b: b[:2] + b"\x07" + b[3:],          # CM != 8
        lambda b: b[:3] + b"\x20" + b[4:],          # reserved FLG bit
        lambda b: b[:-9] + bytes([b[-9] ^ 1]) + b[-8:],  # DEFLATE body
        lambda b: b[:-8] + bytes([b[-8] ^ 1]) + b[-7:],  # CRC-32
        lambda b: b[:-1] + bytes([b[-1] ^ 1]),      # ISIZE
        lambda b: b[:-3],                           # truncated trailer
    ):
        with pytest.raises(ValueError):
            cz._gunzip(mutate(good))
    # bad FHCRC
    bad = bytearray(blob)
    bad[len(hdr) - 1] ^= 0xFF
    with pytest.raises(ValueError):
        cz._gunzip(bytes(bad))


# --- bzip2 internal stages ------------------------------------------------

@hypo.budget(40)
@given(payloads)
def test_rle1_roundtrip(data):
    assert cz._rle1_decode(cz._rle1_encode(data)) == data


@hypo.budget(40)
@given(st.binary(min_size=1, max_size=600))
def test_bwt_forward_inverse_roundtrip(data):
    """The prefix-doubling rotation sort and the counting-sort inverse
    are exact inverses for any byte string, including all-equal inputs
    where every rotation ties."""
    last, ptr = cz._bwt_forward(data)
    assert cz._bwt_inverse(last, ptr) == data


@hypo.budget(30)
@given(st.lists(st.integers(0, 1 << 30), min_size=2, max_size=40))
def test_huffman_lengths_complete_and_capped(freqs):
    """The frequency-halving loop always lands inside libbzip2's
    17-bit encoder cap, and the code is complete (Kraft sum == 1) so
    every symbol — observed or not — decodes."""
    from fractions import Fraction
    lens = cz._huffman_lengths(freqs, cz._BZ_MAX_ENC_LEN)
    assert all(1 <= ln <= cz._BZ_MAX_ENC_LEN for ln in lens)
    assert sum(Fraction(1, 2 ** ln) for ln in lens) == 1


def test_huffman_halving_loop_fires_on_fibonacci_freqs():
    # Fibonacci-ish frequencies force maximal tree depth > 17 on the
    # first pass; the halving loop must still converge to <= 17
    a, b = 1, 1
    freqs = []
    for _ in range(40):
        freqs.append(a)
        a, b = b, a + b
    lens = cz._huffman_lengths(freqs, cz._BZ_MAX_ENC_LEN)
    assert max(lens) <= cz._BZ_MAX_ENC_LEN


# --- bzip2 both-ways interop ----------------------------------------------

@hypo.budget(50)
@given(st.binary(min_size=0, max_size=20000), st.integers(1, 9))
def test_bunzip2_interop_stdlib_streams_any_level(data, level):
    """The from-scratch bzip2 decoder consumes bitstreams produced by
    an INDEPENDENT implementation (stdlib bz2 / libbzip2) at every
    block-size level, agreeing with bz2.decompress byte-for-byte and
    reporting the parsed structure."""
    z = bz2.compress(data, level)
    got, lvl, n_blocks = cz._bunzip2(z)
    assert got == data == bz2.decompress(z)
    assert lvl == level
    assert n_blocks == (0 if not data else 1)


@hypo.budget(40)
@given(payloads)
def test_bzip2_interop_stdlib_decodes_our_streams(data):
    """Inverse direction: stdlib bz2.decompress accepts every stream
    the from-scratch compressor emits (RLE1 + BWT + MTF/RLE2 + real
    Huffman + both CRC layers), and _bunzip2 agrees."""
    z = cz._bzip2(data)
    assert bz2.decompress(z) == data
    got, lvl, n_blocks = cz._bunzip2(z)
    assert got == data and lvl == 9
    assert n_blocks == (0 if not data else 1)


def test_bzip2_multi_block_both_directions():
    import random
    rnd = random.Random(11)
    data = bytes(rnd.choices(b"abcdefgh ", k=200_000))
    ours = cz._bzip2(data, level=1)        # 80k chunks -> 3 blocks
    assert bz2.decompress(ours) == data
    assert cz._bunzip2(ours) == (data, 1, 3)
    theirs = bz2.compress(bytes(rnd.choices(bytes(range(256)),
                                            k=250_000)), 1)
    got, lvl, n_blocks = cz._bunzip2(theirs)
    assert got == bz2.decompress(theirs) and lvl == 1 and n_blocks >= 3


@hypo.budget(30)
@given(st.lists(st.binary(min_size=0, max_size=400), min_size=1,
                max_size=3),
       st.lists(st.integers(1, 9), min_size=3, max_size=3))
def test_bunzip2_concatenated_streams_parity_with_stdlib(parts, levels):
    """stdlib bz2.decompress accepts concatenated streams; so does the
    from-scratch decoder — same payload, blocks summed, first stream's
    level reported."""
    blob = b"".join(bz2.compress(p, lv)
                    for p, lv in zip(parts, levels))
    want = b"".join(parts)
    assert bz2.decompress(blob) == want
    got, lvl, n_blocks = cz._bunzip2(blob)
    assert got == want
    assert lvl == levels[0]
    assert n_blocks == sum(1 for p in parts if p)


def test_bunzip2_trailing_data_semantics_match_stdlib():
    # non-stream leftovers after >=1 good stream: IGNORED (CPython's
    # documented bz2.decompress behavior)
    blob = bz2.compress(b"payload", 9) + b"garbage"
    assert bz2.decompress(blob) == b"payload"
    assert cz._bunzip2(blob)[0] == b"payload"
    # but a leftover that LOOKS like a stream and is truncated: error
    bad = bz2.compress(b"payload", 9) + bz2.compress(b"more", 9)[:8]
    with pytest.raises(Exception):
        bz2.decompress(bad)
    with pytest.raises(ValueError):
        cz._bunzip2(bad)


def test_bzip2_empty_stream_identical_to_libbzip2():
    # zero-block streams: header + EOS magic + combined CRC 0 — the
    # two implementations agree byte-for-byte
    assert cz._bzip2(b"") == bz2.compress(b"", 9)


def test_bzip2_compresses_repetitive_content():
    rep = b"training corpus boilerplate " * 200
    assert len(cz._bzip2(rep)) < len(rep) / 5


# --- zip ------------------------------------------------------------------

# clean path segments only: a trailing "/" or a ".." segment changes
# meaning for the stdlib readers (directory entries, normalization)
member_names = st.from_regex(r"[a-z][a-z0-9_.]{0,8}(/[a-z0-9_]{1,8}){0,2}",
                             fullmatch=True)


@hypo.budget(40)
@given(st.lists(st.tuples(member_names,
                          st.binary(min_size=0, max_size=2000)),
                min_size=0, max_size=6, unique_by=lambda m: m[0]))
def test_zip_interop_stdlib_reads_our_archives(members):
    """stdlib zipfile accepts every archive the from-scratch writer
    emits (raw-DEFLATE members + central directory + EOCD), member
    names, order, and bytes intact — and _unzip agrees."""
    import zipfile
    blob = cz._zip(members)
    with zipfile.ZipFile(io.BytesIO(blob)) as z:
        assert z.testzip() is None
        got = [(i.filename, z.read(i)) for i in z.infolist()]
    assert got == members
    assert cz._unzip(blob) == members


@hypo.budget(40)
@given(st.lists(st.tuples(member_names,
                          st.binary(min_size=0, max_size=2000)),
                min_size=0, max_size=6, unique_by=lambda m: m[0]),
       st.sampled_from([0, 8]), st.binary(min_size=0, max_size=40))
def test_unzip_interop_stdlib_archives(members, method, comment):
    """The from-scratch parser decodes archives an INDEPENDENT
    implementation (stdlib zipfile) produces — deflated and stored
    members, with and without a trailing archive comment (exercising
    the EOCD back-scan)."""
    import zipfile
    m = (zipfile.ZIP_DEFLATED if method == 8 else zipfile.ZIP_STORED)
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", m) as z:
        for name, data in members:
            z.writestr(name, data)
        z.comment = comment
    assert cz._unzip(buf.getvalue()) == members


def test_unzip_rejects_corruption():
    import zipfile
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("m.txt", b"corruption target" * 64)
    good = buf.getvalue()
    with pytest.raises(ValueError):
        cz._unzip(good[:-10])                      # EOCD gone
    with pytest.raises(ValueError):
        cz._unzip(good[:30])                       # no directory at all
    bad = bytearray(good)
    bad[0] ^= 0xFF                                 # local header sig
    with pytest.raises(ValueError):
        cz._unzip(bytes(bad))
    # flip one byte of the member's DEFLATE body
    bad = bytearray(good)
    bad[40] ^= 0xFF
    with pytest.raises(ValueError):
        cz._unzip(bytes(bad))


# --- tar ------------------------------------------------------------------

@hypo.budget(40)
@given(st.lists(st.tuples(member_names,
                          st.binary(min_size=0, max_size=2000)),
                min_size=0, max_size=6, unique_by=lambda m: m[0]))
def test_tar_interop_stdlib_reads_our_archives(members):
    """stdlib tarfile accepts every ustar archive the from-scratch
    writer emits (octal fields, spaces-substituted checksum, 512-byte
    padding, terminator blocks) — and _untar agrees."""
    import tarfile
    blob = cz._tar(members)
    with tarfile.open(fileobj=io.BytesIO(blob), mode="r:") as t:
        got = [(m.name, t.extractfile(m).read()) for m in t.getmembers()]
    assert got == members
    assert cz._untar(blob) == members


@hypo.budget(40)
@given(st.lists(st.tuples(member_names,
                          st.binary(min_size=0, max_size=2000)),
                min_size=0, max_size=6, unique_by=lambda m: m[0]),
       st.sampled_from(["ustar", "gnu", "pax"]))
def test_untar_interop_stdlib_archives_all_formats(members, fmt):
    """The from-scratch parser decodes archives stdlib tarfile
    produces in ALL THREE of its formats (ustar, GNU, pax)."""
    import tarfile
    f = {"ustar": tarfile.USTAR_FORMAT, "gnu": tarfile.GNU_FORMAT,
         "pax": tarfile.PAX_FORMAT}[fmt]
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=f) as t:
        for name, data in members:
            ti = tarfile.TarInfo(name)
            ti.size = len(data)
            ti.mtime = 0
            t.addfile(ti, io.BytesIO(data))
    assert cz._untar(buf.getvalue()) == members


def test_untar_pax_long_name_and_skips_directories():
    import tarfile
    long = "dir/" + "n" * 150 + ".txt"   # >100 bytes: forces a pax
    buf = io.BytesIO()                   # 'x' header with a path record
    with tarfile.open(fileobj=buf, mode="w",
                      format=tarfile.PAX_FORMAT) as t:
        d = tarfile.TarInfo("somedir")
        d.type = tarfile.DIRTYPE
        t.addfile(d)
        ti = tarfile.TarInfo(long)
        ti.size = 5
        ti.mtime = 0
        t.addfile(ti, io.BytesIO(b"12345"))
    assert cz._untar(buf.getvalue()) == [(long, b"12345")]


@hypo.budget(30)
@given(st.lists(st.tuples(member_names,
                          st.binary(min_size=0, max_size=1500)),
                min_size=0, max_size=4, unique_by=lambda m: m[0]))
def test_targz_composed_stack_decodes_stdlib(members):
    """The composed judged-path stack: stdlib packs tar.gz; the
    from-scratch _gunzip + _untar decode both layers."""
    import tarfile
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w:gz") as t:
        for name, data in members:
            ti = tarfile.TarInfo(name)
            ti.size = len(data)
            ti.mtime = 0
            t.addfile(ti, io.BytesIO(data))
    raw, n = cz._gunzip(buf.getvalue())
    assert n == 1
    assert cz._untar(raw) == members


def test_untar_rejects_corruption():
    blob = cz._tar([("m.txt", b"corruption target" * 40)])
    bad = bytearray(blob)
    bad[130] ^= 0x04                     # size field digit
    with pytest.raises(ValueError):
        cz._untar(bytes(bad))
    bad = bytearray(blob)
    bad[5] ^= 0xFF                       # name byte: checksum mismatch
    with pytest.raises(ValueError):
        cz._untar(bytes(bad))
    with pytest.raises(ValueError):
        cz._untar(blob[:700])            # truncated member data
    with pytest.raises(ValueError):
        cz._untar(blob[:-1024])          # terminator blocks removed
    with pytest.raises(ValueError):
        cz._tar([("x" * 150, b"")])      # name over the ustar limit


def test_bunzip2_rejects_corruption():
    good = bz2.compress(b"corruption target" * 64, 9)
    with pytest.raises(ValueError):
        cz._bunzip2(b"BZx" + good[3:])             # bad magic
    with pytest.raises(ValueError):
        cz._bunzip2(good[:3] + b"0" + good[4:])    # level byte 0
    with pytest.raises(ValueError):
        cz._bunzip2(good[:12])                     # truncated
    bad = bytearray(good)
    bad[11] ^= 0xFF                                # block CRC bits
    with pytest.raises(ValueError):
        cz._bunzip2(bytes(bad))
    bad = bytearray(good)
    bad[-2] ^= 0xFF                                # stream CRC bits
    with pytest.raises(ValueError):
        cz._bunzip2(bytes(bad))
    bad = bytearray(good)
    bad[4] ^= 0x40                                 # block magic bits
    with pytest.raises(ValueError):
        cz._bunzip2(bytes(bad))
