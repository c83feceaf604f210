"""Spec deletion-vector codec round-trips (VERDICT r12 next-item 2):
z85, RoaringBitmapArray portable serialization against hand-built
byte fixtures, file framing + CRC, inline vectors, path derivation,
and the corrupt-vector validation contract."""

from __future__ import annotations

import os
import struct
import uuid
import zlib

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from cdc_pipe_line_spark import dvbitmap as dv


# ------------------------------------------------------------- z85


def test_z85_known_vector():
    # the ZeroMQ spec's reference vector: 0x86 0x4F 0xD2 0x6F 0xB5
    # 0x59 0xF7 0x5B encodes to "HelloWorld"
    assert dv.z85_encode(bytes([0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B])) == "HelloWorld"
    assert dv.z85_decode("HelloWorld") == bytes(
        [0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B]
    )


def test_z85_uuid_is_20_chars():
    u = uuid.uuid4()
    enc = dv.z85_encode(u.bytes)
    assert len(enc) == 20
    assert dv.z85_decode(enc, length=16) == u.bytes


@given(st.binary(min_size=0, max_size=200))
@settings(max_examples=200, deadline=None)
def test_z85_roundtrip_any_bytes(data):
    enc = dv.z85_encode(data)
    assert dv.z85_decode(enc, length=len(data)) == data


def test_z85_rejects_garbage():
    with pytest.raises(ValueError):
        dv.z85_decode("abcd")  # not a multiple of 5
    with pytest.raises(ValueError):
        dv.z85_decode('abc"d')  # character outside the alphabet


# ------------------------------------------------------- roaring


def test_roaring_handbuilt_array_container():
    # one bitmap, one array container with values {1, 5, 65534}
    payload = dv.encode_dv(np.array([1, 5, 65534], dtype=np.uint64))
    magic, n_bitmaps = struct.unpack_from("<iq", payload, 0)
    assert magic == 1681511377
    assert n_bitmaps == 1
    cookie, n_containers = struct.unpack_from("<ii", payload, 12)
    assert cookie == 12346  # SERIAL_COOKIE_NO_RUNCONTAINER
    assert n_containers == 1
    key, card_m1 = struct.unpack_from("<HH", payload, 20)
    assert key == 0 and card_m1 == 2
    (offset,) = struct.unpack_from("<I", payload, 24)
    assert offset == 16  # 4 cookie + 4 size + 4 header + 4 offset
    vals = struct.unpack_from("<3H", payload, 12 + offset)
    assert vals == (1, 5, 65534)


def test_roaring_bitmap_container_and_high_keys():
    # > 4096 values in one 16-bit span forces a bitmap container
    dense = np.arange(5000, dtype=np.uint64)
    sparse = np.array([1 << 16, (1 << 16) + 7], dtype=np.uint64)
    idx = np.concatenate([dense, sparse])
    out = dv.decode_dv(dv.encode_dv(idx))
    assert np.array_equal(out, np.unique(idx))


def test_roaring_empty_and_gap_bitmaps():
    # values straddling 2^32 spans with an EMPTY middle bitmap
    idx = np.array([5, (2 << 32) + 9], dtype=np.uint64)
    payload = dv.encode_dv(idx)
    _, n_bitmaps = struct.unpack_from("<iq", payload, 0)
    assert n_bitmaps == 3  # bitmap 1 serialized empty
    assert np.array_equal(dv.decode_dv(payload), idx)


def test_roaring_run_container_read():
    # hand-build a cookie-12347 bitmap with one run container holding
    # [10, 14] — this writer never emits runs but the reader must parse
    n = 1
    bitmap = struct.pack("<i", (((n - 1) << 16) | 12347))
    bitmap += bytes([0b1])  # run flag for container 0
    bitmap += struct.pack("<HH", 0, 5 - 1)  # key 0, cardinality 5
    # n < 4 → no offset header for the run cookie
    bitmap += struct.pack("<H", 1)  # one run
    bitmap += struct.pack("<HH", 10, 4)  # start 10, length+1 = 5 values
    payload = struct.pack("<iq", dv.MAGIC, 1) + bitmap
    assert np.array_equal(
        dv.decode_dv(payload), np.arange(10, 15, dtype=np.uint64)
    )


@given(
    st.lists(
        st.integers(min_value=0, max_value=(1 << 33) + 70000),
        min_size=0,
        max_size=400,
    )
)
@settings(max_examples=150, deadline=None)
def test_roaring_roundtrip_property(vals):
    idx = np.array(vals, dtype=np.uint64)
    assert np.array_equal(dv.decode_dv(dv.encode_dv(idx)), np.unique(idx))


def test_decode_rejects_bad_magic():
    with pytest.raises(ValueError, match="magic"):
        dv.decode_dv(struct.pack("<iq", 123, 0))
    with pytest.raises(ValueError, match="too short"):
        dv.decode_dv(b"\x01\x02")


# --------------------------------------------------- files + paths


def test_inline_descriptor_roundtrip(tmp_path):
    idx = np.array([3, 9, 100], dtype=np.uint64)
    d = dv.make_descriptor(str(tmp_path), idx)
    assert d["storageType"] == "i"
    assert d["cardinality"] == 3
    assert "offset" not in d
    assert not os.listdir(tmp_path)  # nothing written
    assert np.array_equal(dv.read_dv(str(tmp_path), d), idx)


def test_file_descriptor_roundtrip_and_framing(tmp_path):
    # enough scattered values to exceed the inline budget
    idx = np.unique(
        np.arange(0, 400_000, 13, dtype=np.uint64)
    )
    d = dv.make_descriptor(str(tmp_path), idx)
    assert d["storageType"] == "u"
    assert d["offset"] == 1
    assert len(d["pathOrInlineDv"]) == 20  # bare z85 uuid, no prefix
    rel = dv.dv_file_relpath(d)
    full = os.path.join(str(tmp_path), rel)
    assert os.path.exists(full)
    raw = open(full, "rb").read()
    assert raw[0] == 1  # format version byte
    (size,) = struct.unpack_from(">i", raw, 1)
    assert size == d["sizeInBytes"]
    data = raw[5 : 5 + size]
    (crc,) = struct.unpack_from(">I", raw, 5 + size)
    assert crc == (zlib.crc32(data) & 0xFFFFFFFF)
    assert np.array_equal(dv.read_dv(str(tmp_path), d), idx)


def test_path_derivation_with_prefix(tmp_path):
    idx = np.arange(0, 300_000, 7, dtype=np.uint64)
    d = dv.make_descriptor(str(tmp_path), idx, prefix="ab")
    rel = dv.dv_file_relpath(d)
    assert rel.startswith("ab" + os.sep)
    assert os.path.basename(rel).startswith("deletion_vector_")
    assert rel.endswith(".bin")
    assert d["pathOrInlineDv"].startswith("ab/")
    assert np.array_equal(dv.read_dv(str(tmp_path), d), idx)


def test_legacy_parquet_sidecar_still_reads(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(tmp_path / "_deletion_vectors")
    rel = os.path.join("_deletion_vectors", "dv-legacy.parquet")
    pq.write_table(
        pa.table({"row_index": pa.array([4, 11], type=pa.int64())}),
        str(tmp_path / rel),
    )
    d = {
        "storageType": "u",
        "pathOrInlineDv": rel,
        "sizeInBytes": os.path.getsize(str(tmp_path / rel)),
        "cardinality": 2,
    }
    assert dv.dv_file_relpath(d) == rel
    assert np.array_equal(
        dv.read_dv(str(tmp_path), d), np.array([4, 11], dtype=np.uint64)
    )


# ------------------------------------------------------ validation


def test_read_rejects_truncated_file(tmp_path):
    idx = np.arange(0, 300_000, 7, dtype=np.uint64)
    d = dv.make_descriptor(str(tmp_path), idx)
    full = os.path.join(str(tmp_path), dv.dv_file_relpath(d))
    raw = open(full, "rb").read()
    open(full, "wb").write(raw[: len(raw) // 2])
    with pytest.raises(ValueError, match="truncated|CRC"):
        dv.read_dv(str(tmp_path), d)


def test_read_rejects_corrupt_payload(tmp_path):
    idx = np.arange(0, 300_000, 7, dtype=np.uint64)
    d = dv.make_descriptor(str(tmp_path), idx)
    full = os.path.join(str(tmp_path), dv.dv_file_relpath(d))
    raw = bytearray(open(full, "rb").read())
    raw[100] ^= 0xFF
    open(full, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="CRC"):
        dv.read_dv(str(tmp_path), d)


def test_read_rejects_cardinality_mismatch(tmp_path):
    idx = np.arange(0, 300_000, 7, dtype=np.uint64)
    d = dv.make_descriptor(str(tmp_path), idx)
    d["cardinality"] = int(d["cardinality"]) - 1
    with pytest.raises(ValueError, match="cardinality"):
        dv.read_dv(str(tmp_path), d)
    di = dv.make_descriptor(str(tmp_path), np.array([1, 2], dtype=np.uint64))
    di["cardinality"] = 3
    with pytest.raises(ValueError, match="cardinality"):
        dv.read_dv(str(tmp_path), di)


def test_read_rejects_size_mismatch(tmp_path):
    idx = np.arange(0, 300_000, 7, dtype=np.uint64)
    d = dv.make_descriptor(str(tmp_path), idx)
    d["sizeInBytes"] = int(d["sizeInBytes"]) + 4
    with pytest.raises(ValueError, match="sizeInBytes"):
        dv.read_dv(str(tmp_path), d)
