"""The from-scratch Parquet footer reader (Thrift compact protocol +
FileMetaData parse) cross-checked against pyarrow — a THIRD
independent reader besides the judged query's DuckDB oracle and the
parquet-cpp writer that produced the testdata. Also: constructed
multi-row-group / null-bearing files (shapes the single-row-group
testdata never produces), footer-only I/O verification, and
fail-fast rejection of corrupted footers.
"""

from __future__ import annotations

import glob
import struct

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from demo_apache_flink_streaming_mode_spark.operators import parquet_meta as pm


def _pyarrow_view(path):
    md = pq.ParquetFile(path).metadata
    stats = [md.row_group(g).column(0).statistics
             for g in range(md.num_row_groups)]
    return {
        "num_rows": md.num_rows,
        "n_cols": md.num_columns,
        "n_row_groups": md.num_row_groups,
        "col_names": [md.schema.column(i).name
                      for i in range(md.num_columns)],
        "key_min": min(s.min for s in stats),
        "key_max": max(s.max for s in stats),
        "key_nulls": sum(s.null_count for s in stats),
        "created_by": md.created_by or "",
    }


def test_footer_agrees_with_pyarrow_on_all_testdata(sf_dir):
    files = sorted(glob.glob(f"{sf_dir}/*.parquet"))
    assert len(files) == 10
    for f in files:
        got = pm.read_footer_from_file(f)
        want = _pyarrow_view(f)
        for k, v in want.items():
            assert got[k] == v, (f, k, got[k], v)


def test_footer_multi_row_group_and_nulls(tmp_path):
    # shapes the testdata never produces: several row groups, nulls in
    # the key column, a key range not starting at 0
    path = str(tmp_path / "mrg.parquet")
    n = 1000
    ids = [None if i % 97 == 0 else i + 500 for i in range(n)]
    tbl = pa.table({"k": pa.array(ids, pa.int64()),
                    "v": pa.array([f"v{i}" for i in range(n)])})
    pq.write_table(tbl, path, row_group_size=128)
    got = pm.read_footer_from_file(path)
    want = _pyarrow_view(path)
    assert got["n_row_groups"] == want["n_row_groups"] >= 7
    for k, v in want.items():
        assert got[k] == v, (k, got[k], v)
    assert got["key_nulls"] == sum(1 for i in ids if i is None) > 0
    assert got["key_min"] == 501 and got["key_max"] == n - 1 + 500


def test_footer_int32_key_and_small_probe(tmp_path):
    path = str(tmp_path / "i32.parquet")
    tbl = pa.table({"k": pa.array(range(-5, 7), pa.int32())})
    pq.write_table(tbl, path)
    # a probe smaller than the footer forces the widening second read
    got = pm.read_footer_from_file(path, probe_bytes=16)
    assert (got["key_min"], got["key_max"]) == (-5, 6)
    assert got["key_physical"] == "INT32"
    assert got["num_rows"] == 12 and got["n_cols"] == 1


def test_footer_rejects_corruption(tmp_path):
    path = str(tmp_path / "c.parquet")
    pq.write_table(pa.table({"k": pa.array(range(50), pa.int64())}), path)
    blob = open(path, "rb").read()
    with pytest.raises(ValueError):
        pm.read_footer(blob[:-1])            # magic truncated
    with pytest.raises(ValueError):
        pm.read_footer(blob[:-4] + b"PARX")  # wrong magic
    # declared footer length exceeding the provided tail
    bad = bytearray(blob)
    struct.pack_into("<I", bad, len(bad) - 8, 1 << 30)
    with pytest.raises(ValueError):
        pm.read_footer(bytes(bad))
    # a flipped byte inside the thrift body either derails the grammar
    # (ValueError) or yields fields that break the structural checks;
    # sweep every footer byte and require NO silent wrong answer
    (flen,) = struct.unpack_from("<I", blob, len(blob) - 8)
    start = len(blob) - 8 - flen
    good = pm.read_footer(blob)
    silent = 0
    for i in range(start, len(blob) - 8):
        bad = bytearray(blob)
        bad[i] ^= 0xFF
        try:
            got = pm.read_footer(bytes(bad))
        except (ValueError, IndexError, OverflowError, AttributeError,
                UnicodeDecodeError, MemoryError, KeyError, TypeError):
            continue    # detected: the flip broke grammar or checks
        if (got["num_rows"], got["key_min"], got["key_max"]) != (
                good["num_rows"], good["key_min"], good["key_max"]):
            silent += 1
    # some bytes are genuinely inert (padding nibbles, created_by
    # text, unread stat payload tails); what must NEVER happen is a
    # large fraction of flips silently changing the core answers
    assert silent <= flen // 10, (silent, flen)


def test_footer_reads_only_the_tail(tmp_path, monkeypatch):
    # the operator's scale contract: footer-only I/O. Count bytes
    # actually read through the real code path.
    import os
    path = str(tmp_path / "big.parquet")
    n = 50_000
    tbl = pa.table({"k": pa.array(range(n), pa.int64()),
                    "pad": pa.array([os.urandom(96) for _ in range(n)])})
    pq.write_table(tbl, path, row_group_size=n // 4)
    import builtins
    read_bytes = []
    real_open = builtins.open

    class Counting:
        def __init__(self, f):
            self._f = f

        def __getattr__(self, a):
            return getattr(self._f, a)

        def read(self, *a):
            b = self._f.read(*a)
            read_bytes.append(len(b))
            return b

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return self._f.__exit__(*a)

    def counting_open(p, *a, **kw):
        f = real_open(p, *a, **kw)
        return Counting(f) if str(p) == path else f

    monkeypatch.setattr(builtins, "open", counting_open)
    got = pm.read_footer_from_file(path)
    assert got["num_rows"] == n and got["n_row_groups"] == 4
    size = os.path.getsize(path)
    assert sum(read_bytes) <= 160 * 1024 < size // 10, (
        sum(read_bytes), size)


def test_thrift_compact_value_grammar():
    # hand-built compact stream covering the types the footer walk
    # relies on: varint boundaries, zigzag negatives, long-form list
    # sizes, nested structs, bool-in-field-header
    def vint(v):
        out = b""
        while True:
            b = v & 0x7F
            v >>= 7
            if v:
                out += bytes([b | 0x80])
            else:
                return out + bytes([b])

    def zz(v):
        return vint((v << 1) ^ (v >> 63) if v >= 0 else ((-v) << 1) - 1)

    # struct { 1: i64 = -7; 2: list<i32> (16 elems, long form);
    #          3: string "ab"; 4: bool true; 5: struct {1: i16 = 300} }
    blob = (bytes([0x16]) + zz(-7)
            + bytes([0x19, (15 << 4) | 5]) + vint(16)
            + b"".join(zz(i) for i in range(16))
            + bytes([0x18]) + vint(2) + b"ab"
            + bytes([0x11])
            + bytes([0x1C]) + bytes([0x14]) + zz(300) + bytes([0x00])
            + bytes([0x00]))
    got = pm._ThriftCompact(blob).struct()
    assert got[1] == -7
    assert got[2] == list(range(16))
    assert got[3] == b"ab"
    assert got[4] is True
    assert got[5] == {1: 300}
