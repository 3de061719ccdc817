"""GGUF ingestion edge cases: v2 files, odd alignment, truncation, corrupt
headers, nested arrays, huge offsets — hermetic armor for the real-checkpoint
day (the reference validates by loading 8 real GGUFs in CI, which a
zero-egress environment can't; these tests pin the parser semantics of
/root/reference/src/main/java/org/beehive/gpullama3/tensor/GGUF.java:276-311
against hand-corrupted files instead)."""
import struct

import numpy as np
import pytest

from llamatpu.gguf import GGMLType, GGUFReader
from llamatpu.gguf.writer import GGUFWriter


def _tiny_file(path, alignment=32):
    w = GGUFWriter(alignment=alignment)
    w.add("general.architecture", "llama")
    w.add("llama.block_count", 1)
    w.add("f.pi", 3.25)
    w.add("flag", True)
    w.add("tokens", ["a", "b", "c"])
    w.add("scores", [0.5, 1.5])
    w.add("ids", np.arange(5, dtype=np.int32))
    w.add_tensor("t0", np.arange(64, dtype=np.float32).reshape(2, 32))
    w.add_tensor("t1", np.arange(96, dtype=np.float32).reshape(3, 32),
                 GGMLType.Q8_0)
    w.write(str(path))
    return path


def test_roundtrip_baseline(tmp_path):
    p = _tiny_file(tmp_path / "m.gguf")
    with GGUFReader(p) as r:
        assert r.version == 3
        assert r.metadata["general.architecture"] == "llama"
        assert r.metadata["flag"] is True
        assert list(r.metadata["tokens"]) == ["a", "b", "c"]
        np.testing.assert_array_equal(r.metadata["ids"], np.arange(5))
        assert r.tensor_infos["t0"].shape == (2, 32)
        np.testing.assert_allclose(r.tensor_f32("t0"),
                                   np.arange(64, dtype=np.float32).reshape(2, 32))


def test_gguf_v2_parses(tmp_path):
    """Version 2 differs only in the version field for the subset we emit
    (v2's u32 string lengths predate GGUF's 2023-08 spec change; every v2
    file in the wild since uses u64 — the reference reads u64 for both)."""
    p = _tiny_file(tmp_path / "m.gguf")
    raw = bytearray(p.read_bytes())
    struct.pack_into("<I", raw, 4, 2)
    p2 = tmp_path / "v2.gguf"
    p2.write_bytes(raw)
    with GGUFReader(p2) as r:
        assert r.version == 2
        np.testing.assert_allclose(r.tensor_f32("t0").reshape(-1),
                                   np.arange(64, dtype=np.float32))


@pytest.mark.parametrize("version", [0, 1, 4, 99])
def test_unsupported_version_rejected(tmp_path, version):
    p = _tiny_file(tmp_path / "m.gguf")
    raw = bytearray(p.read_bytes())
    struct.pack_into("<I", raw, 4, version)
    p2 = tmp_path / "bad.gguf"
    p2.write_bytes(raw)
    with pytest.raises(ValueError, match="version"):
        GGUFReader(p2)


def test_big_endian_rejected(tmp_path):
    """BE files keep the 'GGUF' magic bytes but byte-swap every integer."""
    p = _tiny_file(tmp_path / "m.gguf")
    raw = bytearray(p.read_bytes())
    struct.pack_into(">I", raw, 4, 3)  # version 3, big-endian
    p2 = tmp_path / "be.gguf"
    p2.write_bytes(raw)
    with pytest.raises(ValueError, match="big-endian"):
        GGUFReader(p2)


def test_not_gguf_rejected(tmp_path):
    p = tmp_path / "x.gguf"
    p.write_bytes(b"\x7fELF" + b"\0" * 64)
    with pytest.raises(ValueError, match="not a GGUF"):
        GGUFReader(p)


def test_truncations_fail_cleanly(tmp_path):
    """EVERY proper prefix of a valid file must raise ValueError (diagnosable
    'truncated'/'exceeds file size'), never struct.error / IndexError, and
    never parse silently."""
    p = _tiny_file(tmp_path / "m.gguf")
    raw = p.read_bytes()
    r0 = GGUFReader(p)
    data_start = r0.data_start
    t1 = r0.tensor_infos["t1"]
    last_real_byte = t1.offset + t1.n_bytes  # beyond this is only padding
    for cut in list(range(0, min(len(raw), 200))) + [data_start - 1,
                                                     data_start + 7,
                                                     last_real_byte - 1]:
        p2 = tmp_path / "cut.gguf"
        p2.write_bytes(raw[:cut])
        if cut == 0:
            with pytest.raises(ValueError):
                GGUFReader(p2)
            continue
        with pytest.raises(ValueError):
            GGUFReader(p2)


@pytest.mark.parametrize("alignment", [8, 64, 4096])
def test_non_default_alignment(tmp_path, alignment):
    p = _tiny_file(tmp_path / "m.gguf", alignment=alignment)
    with GGUFReader(p) as r:
        assert r.alignment == alignment
        assert r.data_start % alignment == 0
        np.testing.assert_allclose(r.tensor_f32("t0").reshape(-1),
                                   np.arange(64, dtype=np.float32))
        # Q8_0 tensor at index 1 exercises the aligned running offset
        np.testing.assert_allclose(r.tensor_f32("t1").reshape(-1),
                                   np.arange(96, dtype=np.float32), atol=0.5)


@pytest.mark.parametrize("alignment", [0, 3, 48])
def test_bad_alignment_rejected(tmp_path, alignment):
    with pytest.raises(ValueError, match="power of two"):
        GGUFWriter(alignment=alignment).write(str(tmp_path / "x.gguf"))
    # and a file CLAIMING a bad alignment is rejected by the reader
    p = _tiny_file(tmp_path / "m.gguf")
    raw = bytearray(p.read_bytes())
    # append won't work (offsets shift); instead craft a minimal file
    w = bytearray()
    w += struct.pack("<IIQQ", 0x46554747, 3, 0, 1)
    key = b"general.alignment"
    w += struct.pack("<Q", len(key)) + key
    w += struct.pack("<Ii", 5, alignment)  # INT32
    p2 = tmp_path / "badalign.gguf"
    p2.write_bytes(bytes(w))
    with pytest.raises(ValueError, match="power of two"):
        GGUFReader(p2)


def test_string_length_overflow_rejected(tmp_path):
    """A key whose declared length runs past EOF must not silently truncate
    (the old parser sliced short and misparsed everything after)."""
    w = bytearray()
    w += struct.pack("<IIQQ", 0x46554747, 3, 0, 1)
    w += struct.pack("<Q", 1 << 40) + b"k"
    p = tmp_path / "s.gguf"
    p.write_bytes(bytes(w))
    with pytest.raises(ValueError, match="truncated"):
        GGUFReader(p)


def test_array_count_overflow_rejected(tmp_path):
    w = bytearray()
    w += struct.pack("<IIQQ", 0x46554747, 3, 0, 1)
    key = b"arr"
    w += struct.pack("<Q", len(key)) + key
    w += struct.pack("<I", 9)               # ARRAY
    w += struct.pack("<IQ", 6, 1 << 50)     # FLOAT32 x 2^50
    p = tmp_path / "a.gguf"
    p.write_bytes(bytes(w))
    with pytest.raises(ValueError, match="truncated"):
        GGUFReader(p)


def test_unknown_value_type_rejected(tmp_path):
    w = bytearray()
    w += struct.pack("<IIQQ", 0x46554747, 3, 0, 1)
    key = b"k"
    w += struct.pack("<Q", len(key)) + key
    w += struct.pack("<I", 77)
    p = tmp_path / "u.gguf"
    p.write_bytes(bytes(w))
    with pytest.raises(ValueError, match="unknown GGUF value type"):
        GGUFReader(p)


def test_unknown_tensor_type_rejected(tmp_path):
    p = _tiny_file(tmp_path / "m.gguf")
    raw = bytearray(p.read_bytes())
    # find tensor info for "t0": name length 2 + "t0", then u32 ndims...
    ix = raw.find(b"\x02" + b"\0" * 7 + b"t0")
    assert ix > 0
    type_off = ix + 8 + 2 + 4 + 2 * 8  # name + ndims + 2 dims
    struct.pack_into("<I", raw, type_off, 9999)
    p2 = tmp_path / "ut.gguf"
    p2.write_bytes(raw)
    with pytest.raises(ValueError, match="unknown ggml type"):
        GGUFReader(p2)


def test_tensor_beyond_eof_rejected(tmp_path):
    """A tensor whose offset+size exceeds the file must fail at PARSE time,
    not return garbage views later."""
    p = _tiny_file(tmp_path / "m.gguf")
    raw = bytearray(p.read_bytes())
    ix = raw.find(b"\x02" + b"\0" * 7 + b"t1")
    assert ix > 0
    off_off = ix + 8 + 2 + 4 + 2 * 8 + 4
    struct.pack_into("<Q", raw, off_off, 1 << 30)
    p2 = tmp_path / "eof.gguf"
    p2.write_bytes(raw)
    with pytest.raises(ValueError, match="exceeds file size"):
        GGUFReader(p2)


def test_misaligned_tensor_offset_rejected(tmp_path):
    p = _tiny_file(tmp_path / "m.gguf")
    raw = bytearray(p.read_bytes())
    ix = raw.find(b"\x02" + b"\0" * 7 + b"t1")
    off_off = ix + 8 + 2 + 4 + 2 * 8 + 4
    struct.pack_into("<Q", raw, off_off, 7)
    p2 = tmp_path / "mis.gguf"
    p2.write_bytes(raw)
    with pytest.raises(ValueError, match="aligned"):
        GGUFReader(p2)


def test_duplicate_tensor_name_rejected(tmp_path):
    w = GGUFWriter()
    w.add("general.architecture", "llama")
    w.add_tensor("dup", np.zeros((1, 32), np.float32))
    w.add_tensor("dup", np.ones((1, 32), np.float32))
    p = tmp_path / "d.gguf"
    w.write(str(p))
    with pytest.raises(ValueError, match="duplicate tensor"):
        GGUFReader(p)


def test_nested_and_bool_arrays(tmp_path):
    """Array-of-array and bool-array values (legal per spec; the reference
    reads them via recursive readArray) parse without error."""
    w = bytearray()
    w += struct.pack("<IIQQ", 0x46554747, 3, 0, 2)
    key = b"nested"
    w += struct.pack("<Q", len(key)) + key
    w += struct.pack("<I", 9)            # ARRAY
    w += struct.pack("<IQ", 9, 2)        # of ARRAY x2
    for vals in ([1, 2], [3]):
        w += struct.pack("<IQ", 5, len(vals))  # INT32 array
        for v in vals:
            w += struct.pack("<i", v)
    key = b"bools"
    w += struct.pack("<Q", len(key)) + key
    w += struct.pack("<I", 9)
    w += struct.pack("<IQ", 7, 3) + bytes([1, 0, 1])
    p = tmp_path / "n.gguf"
    p.write_bytes(bytes(w))
    with GGUFReader(p) as r:
        nested = r.metadata["nested"]
        assert [list(a) for a in nested] == [[1, 2], [3]]
        assert r.metadata["bools"] == [True, False, True]


def test_sparse_multi_gb_offsets(tmp_path):
    """Tensor data past 2^31 (the int32 cliff that bit the reference's Java
    mmap slicing) resolves correctly — sparse file, no real disk cost."""
    w = bytearray()
    w += struct.pack("<IIQQ", 0x46554747, 3, 1, 1)
    key = b"general.architecture"
    w += struct.pack("<Q", len(key)) + key
    w += struct.pack("<I", 8) + struct.pack("<Q", 5) + b"llama"
    name = b"big"
    w += struct.pack("<Q", len(name)) + name
    w += struct.pack("<I", 2)                       # 2 dims
    w += struct.pack("<QQ", 32, 2)                  # ne = [32, 2] -> shape (2, 32)
    w += struct.pack("<I", 0)                       # F32
    rel = (1 << 31) + 1024                          # > 2 GB into the data section
    w += struct.pack("<Q", rel)
    header = bytes(w)
    data_start = (len(header) + 31) // 32 * 32
    p = tmp_path / "big.gguf"
    with open(p, "wb") as f:
        f.write(header)
        f.seek(data_start + rel)
        f.write(np.arange(64, dtype="<f4").tobytes())
    with GGUFReader(p) as r:
        info = r.tensor_infos["big"]
        assert info.offset == data_start + rel
        np.testing.assert_allclose(r.tensor_f32("big").reshape(-1),
                                   np.arange(64, dtype=np.float32))
