"""Native (C++) loader vs pure-Python reference implementations —
bit-identical outputs required."""

import io

import numpy as np
import pytest

from ldm_tf2_tpu.data import native
from ldm_tf2_tpu.data.example_proto import encode_example
from ldm_tf2_tpu.data.tfrecord import TFRecordWriter, crc32c as py_crc32c
from ldm_tf2_tpu.data.dataset import process_image

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no g++?)"
)


def test_native_crc32c_matches_python():
    for data in (b"", b"a", b"123456789", bytes(range(256)) * 7):
        assert native.crc32c(data) == py_crc32c(data)


def test_native_record_file(tmp_path):
    path = str(tmp_path / "t.tfrecord")
    records = [b"one", b"", b"x" * 5000]
    with TFRecordWriter(path) as w:
        for r in records:
            w.write(r)
    rf = native.NativeRecordFile(path, verify_crc=True)
    assert list(rf) == records
    rf.close()


def test_native_scan_index_and_pread(tmp_path):
    """C++ framing scan == Python build_index; pread == seek+read."""
    from ldm_tf2_tpu.data.indexed import build_index

    path = str(tmp_path / "t.tfrecord")
    records = [b"one", b"", b"x" * 5000, b"tail"]
    with TFRecordWriter(path) as w:
        for r in records:
            w.write(r)

    scanned = native.scan_index(path)
    assert scanned is not None

    native.set_enabled(False)
    try:
        expected = build_index([path])  # pure-Python scanner
    finally:
        native.set_enabled(True)
    np.testing.assert_array_equal(scanned, expected[:, 1:])
    # build_index with native enabled agrees too (incl. file_idx column)
    np.testing.assert_array_equal(build_index([path]), expected)

    for (off, length), rec in zip(scanned, records):
        assert native.pread(path, int(off), int(length)) == rec
    assert native.scan_index(str(tmp_path / "missing")) is None


def test_native_example_parse():
    rec = encode_example({"image": b"jpegbytes", "caption": [101, 7592, 102]})
    assert native.example_image_bytes(rec) == b"jpegbytes"
    cap = native.example_caption(rec, max_len=5)
    np.testing.assert_array_equal(cap, [101, 7592, 102, 0, 0])


def test_native_decode_matches_python():
    from PIL import Image

    rng = np.random.RandomState(0)
    for size in [(20, 30), (31, 17), (16, 16)]:
        arr = rng.randint(0, 256, (size[1], size[0], 3), dtype=np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, "JPEG", quality=95)
        jpeg = buf.getvalue()

        # decode with PIL (python path input) to isolate the transform
        decoded = np.asarray(Image.open(io.BytesIO(jpeg)).convert("RGB"))
        expected = process_image(decoded, 16)
        got = native.decode_and_process(jpeg, 16)
        assert got is not None
        np.testing.assert_allclose(got, expected, atol=1e-6)
