"""Image IO round-trip tests (mirrors reference tests/imageio.cpp)."""

import numpy as np

from bre_tpu.io.image import read_pfm, write_exr, write_pfm, write_png


def test_pfm_roundtrip(tmp_path):
    img = np.random.RandomState(0).rand(7, 5, 3).astype(np.float32)
    p = tmp_path / "t.pfm"
    write_pfm(p, img)
    back = read_pfm(p)
    np.testing.assert_array_equal(back, img)


def test_png_writes_valid_signature(tmp_path):
    img = np.random.RandomState(1).rand(4, 4, 3).astype(np.float32)
    p = tmp_path / "t.png"
    write_png(p, img)
    data = p.read_bytes()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    assert b"IHDR" in data and b"IDAT" in data and b"IEND" in data


def test_exr_writes_magic_and_is_parseable(tmp_path):
    img = np.random.RandomState(2).rand(3, 6, 3).astype(np.float32)
    p = tmp_path / "t.exr"
    write_exr(p, img)
    data = p.read_bytes()
    assert data[:4] == bytes([0x76, 0x2F, 0x31, 0x01])  # EXR magic 20000630
    # try OpenEXR if available in the image (optional)
    try:
        import OpenEXR  # noqa

        f = OpenEXR.InputFile(str(p))
        assert f.header() is not None
    except ImportError:
        pass
