"""Image IO round-trip tests (mirrors reference tests/imageio.cpp)."""

import struct
import zlib

import numpy as np
import pytest

from bre_tpu.io.image import (
    read_exr,
    read_image,
    read_pfm,
    read_png,
    read_tga,
    write_exr,
    write_pfm,
    write_png,
)


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


@pytest.mark.parametrize("compression", ["none", "zip"])
def test_exr_roundtrip(tmp_path, compression):
    img = np.random.RandomState(3).rand(21, 13, 3).astype(np.float32) * 4.0
    p = tmp_path / "t.exr"
    write_exr(p, img, compression=compression)
    back = read_exr(p)
    np.testing.assert_array_equal(back, img)


def test_exr_zip_actually_compresses(tmp_path):
    img = np.zeros((32, 64, 3), np.float32) + 0.25  # highly compressible
    a, b = tmp_path / "a.exr", tmp_path / "b.exr"
    write_exr(a, img, compression="none")
    write_exr(b, img, compression="zip")
    assert b.stat().st_size < a.stat().st_size / 4


def test_exr_half_channels(tmp_path):
    """Hand-built uncompressed EXR with HALF channels (the layout OpenEXR's
    RgbaOutputFile — what pbrt uses — produces)."""
    h, w = 3, 5
    rng = np.random.RandomState(4)
    img = rng.rand(h, w, 3).astype(np.float16)  # half-representable values

    def attr(name, typ, data):
        return name + b"\x00" + typ + b"\x00" + struct.pack("<I", len(data)) + data

    def chan(name):
        return name + b"\x00" + struct.pack("<iBBBBii", 1, 0, 0, 0, 0, 1, 1)

    channels = chan(b"B") + chan(b"G") + chan(b"R") + b"\x00"
    box = struct.pack("<iiii", 0, 0, w - 1, h - 1)
    header = (
        attr(b"channels", b"chlist", channels)
        + attr(b"compression", b"compression", b"\x00")
        + attr(b"dataWindow", b"box2i", box)
        + attr(b"displayWindow", b"box2i", box)
        + attr(b"lineOrder", b"lineOrder", b"\x00")
        + attr(b"pixelAspectRatio", b"float", struct.pack("<f", 1.0))
        + attr(b"screenWindowCenter", b"v2f", struct.pack("<ff", 0.0, 0.0))
        + attr(b"screenWindowWidth", b"float", struct.pack("<f", 1.0))
        + b"\x00"
    )
    magic = struct.pack("<I", 20000630) + struct.pack("<I", 2)
    start = len(magic) + len(header) + 8 * h
    line = 8 + w * 2 * 3
    offsets = b"".join(struct.pack("<Q", start + y * line) for y in range(h))
    lines = []
    for y in range(h):
        blk = (img[y, :, 2].astype("<f2").tobytes()
               + img[y, :, 1].astype("<f2").tobytes()
               + img[y, :, 0].astype("<f2").tobytes())
        lines.append(struct.pack("<ii", y, len(blk)) + blk)
    p = tmp_path / "half.exr"
    p.write_bytes(magic + header + offsets + b"".join(lines))
    back = read_exr(p)
    np.testing.assert_array_equal(back, img.astype(np.float32))


def _encode_png(img8: np.ndarray, filters) -> bytes:
    """Independent PNG encoder using explicit per-row filter types, to
    exercise the reader's Sub/Up/Average/Paeth reconstruction."""
    h, w, nch = img8.shape
    fbpp = nch
    raw = bytearray()
    prev = np.zeros(w * nch, np.int32)
    for y in range(h):
        cur = img8[y].reshape(-1).astype(np.int32)
        ft = filters[y % len(filters)]
        raw.append(ft)
        line = np.empty_like(cur)
        for i in range(cur.size):
            a = cur[i - fbpp] if i >= fbpp else 0
            b = prev[i]
            c = prev[i - fbpp] if i >= fbpp else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) >> 1
            else:
                pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            line[i] = (cur[i] - pred) & 0xFF
        raw += line.astype(np.uint8).tobytes()
        prev = cur

    def chunk(tag, data):
        c = struct.pack(">I", len(data)) + tag + data
        return c + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2 if nch == 3 else 6, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))


def test_png_roundtrip_all_filters(tmp_path):
    rng = np.random.RandomState(5)
    img8 = (rng.rand(9, 7, 3) * 255).astype(np.uint8)
    p = tmp_path / "t.png"
    p.write_bytes(_encode_png(img8, filters=[0, 1, 2, 3, 4]))
    back = read_png(p, gamma=False)
    np.testing.assert_allclose(back, img8.astype(np.float32) / 255.0, atol=1e-6)


def test_png_rgba_and_write_read(tmp_path):
    rng = np.random.RandomState(6)
    rgba = (rng.rand(5, 4, 4) * 255).astype(np.uint8)
    p = tmp_path / "rgba.png"
    p.write_bytes(_encode_png(rgba, filters=[4, 2]))
    back = read_png(p, gamma=False)
    np.testing.assert_allclose(
        back, rgba[..., :3].astype(np.float32) / 255.0, atol=1e-6)
    # writer -> reader round trip (through sRGB gamma, 8-bit quantization)
    img = rng.rand(6, 6, 3).astype(np.float32)
    q = tmp_path / "w.png"
    write_png(q, img)
    back = read_image(q)
    np.testing.assert_allclose(back, img, atol=1.5 / 255.0)


def _encode_tga(img8: np.ndarray, rle: bool, top_origin: bool) -> bytes:
    h, w, _ = img8.shape
    bgr = img8[..., ::-1]
    if not top_origin:
        bgr = bgr[::-1]
    hdr = bytearray(18)
    hdr[2] = 10 if rle else 2
    struct.pack_into("<HH", hdr, 12, w, h)
    hdr[16] = 24
    hdr[17] = 0x20 if top_origin else 0
    body = bytearray()
    if rle:
        flat = bgr.reshape(-1, 3)
        i = 0
        while i < len(flat):
            run = 1
            while (run < 128 and i + run < len(flat)
                   and (flat[i + run] == flat[i]).all()):
                run += 1
            if run > 1:
                body.append(0x80 | (run - 1))
                body += flat[i].tobytes()
                i += run
            else:
                body.append(0)
                body += flat[i].tobytes()
                i += 1
    else:
        body = bgr.tobytes()
    return bytes(hdr) + bytes(body)


@pytest.mark.parametrize("rle", [False, True])
@pytest.mark.parametrize("top_origin", [False, True])
def test_tga_roundtrip(tmp_path, rle, top_origin):
    rng = np.random.RandomState(7)
    img8 = (rng.rand(6, 5, 3) * 255).astype(np.uint8)
    img8[2:4, 1:4] = 77  # a run for RLE
    p = tmp_path / "t.tga"
    p.write_bytes(_encode_tga(img8, rle, top_origin))
    back = read_tga(p, gamma=False)
    np.testing.assert_allclose(back, img8.astype(np.float32) / 255.0, atol=1e-6)


def test_png_python_fallback_matches_native(tmp_path, monkeypatch):
    rng = np.random.RandomState(8)
    img8 = (rng.rand(5, 6, 3) * 255).astype(np.uint8)
    p = tmp_path / "t.png"
    p.write_bytes(_encode_png(img8, filters=[1, 4, 3, 2, 0]))
    native = read_png(p, gamma=False)
    import bre_tpu.io.image as im
    monkeypatch.setattr("bre_tpu.native.png_unfilter_native",
                        lambda *a: None)
    fallback = im.read_png(p, gamma=False)
    np.testing.assert_array_equal(native, fallback)


def test_imgtool_diff_on_exr(tmp_path, capsys):
    from bre_tpu.tools.imgtool import main as imgtool_main

    rng = np.random.RandomState(9)
    img = rng.rand(8, 8, 3).astype(np.float32)
    a, b = tmp_path / "a.exr", tmp_path / "b.exr"
    write_exr(a, img)
    write_exr(b, img + 0.25)
    assert imgtool_main(["diff", str(a), str(b)]) != 0
    assert imgtool_main(["diff", str(a), str(a)]) == 0


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
