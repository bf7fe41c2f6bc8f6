"""Image I/O: PFM (byte-exact diffable), PNG (zlib stdlib encoder), EXR write.

Reference: /root/reference/src/core/imageio.cpp — extension dispatch at
:46-60 (read) / :81-122 (write), PFM reader/writer at :~200-330, PNG via
lodepng, EXR via OpenEXR.  Host-side numpy (image I/O is not device work).
"""

from __future__ import annotations

import struct
import zlib
from pathlib import Path

import numpy as np

__all__ = ["write_image", "read_image", "write_pfm", "read_pfm", "write_png", "write_exr"]


def write_pfm(path, img: np.ndarray) -> None:
    """Write float32 RGB (H,W,3) or gray (H,W) PFM; scanlines bottom-up,
    little-endian (negative scale), matching pbrt's WriteImagePFM
    (imageio.cpp:~300-330)."""
    img = np.asarray(img, np.float32)
    color = img.ndim == 3
    h, w = img.shape[:2]
    with open(path, "wb") as f:
        f.write(b"PF\n" if color else b"Pf\n")
        f.write(f"{w} {h}\n".encode())
        f.write(b"-1\n")  # little-endian
        f.write(np.flipud(img).astype("<f4").tobytes())


def read_pfm(path) -> np.ndarray:
    with open(path, "rb") as f:
        header = f.readline().strip()
        color = header == b"PF"
        w, h = map(int, f.readline().split())
        scale = float(f.readline())
        data = np.frombuffer(f.read(), "<f4" if scale < 0 else ">f4")
    img = data.reshape(h, w, 3) if color else data.reshape(h, w)
    return np.flipud(img).copy()


def _gamma_encode(img: np.ndarray) -> np.ndarray:
    """sRGB gamma (pbrt GammaCorrect, pbrt.h:1086-1090)."""
    img = np.clip(img, 0.0, 1.0)
    return np.where(img <= 0.0031308, 12.92 * img, 1.055 * img ** (1.0 / 2.4) - 0.055)


def write_png(path, img: np.ndarray, gamma: bool = True) -> None:
    """Minimal RGB8 PNG encoder (replaces vendored lodepng, src/ext/lodepng).

    img: float (H,W,3) linear radiance (gamma-encoded here) or uint8.
    """
    img = np.asarray(img)
    if img.ndim == 2:
        img = np.repeat(img[:, :, None], 3, axis=2)
    if img.dtype != np.uint8:
        x = _gamma_encode(img.astype(np.float32)) if gamma else np.clip(img, 0, 1)
        img = (x * 255.0 + 0.5).astype(np.uint8)
    h, w, _ = img.shape
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))

    def chunk(tag: bytes, data: bytes) -> bytes:
        c = struct.pack(">I", len(data)) + tag + data
        return c + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )
    Path(path).write_bytes(png)


def write_exr(path, img: np.ndarray) -> None:
    """Minimal uncompressed scanline EXR 2.0 writer, float32 RGB.

    Stands in for the OpenEXR submodule (reference .gitmodules:1-3,
    imageio.cpp:124-162); readable by any EXR tool.
    """
    img = np.asarray(img, np.float32)
    h, w, _ = img.shape

    def attr(name: bytes, typ: bytes, data: bytes) -> bytes:
        return name + b"\x00" + typ + b"\x00" + struct.pack("<I", len(data)) + data

    def chan(name: bytes) -> bytes:
        # name, pixel type (2=float), pLinear, reserved, xSampling, ySampling
        return name + b"\x00" + struct.pack("<iBBBBii", 2, 0, 0, 0, 0, 1, 1)

    channels = chan(b"B") + chan(b"G") + chan(b"R") + b"\x00"
    box = struct.pack("<iiii", 0, 0, w - 1, h - 1)
    header = (
        attr(b"channels", b"chlist", channels)
        + attr(b"compression", b"compression", b"\x00")  # NO_COMPRESSION
        + attr(b"dataWindow", b"box2i", box)
        + attr(b"displayWindow", b"box2i", box)
        + attr(b"lineOrder", b"lineOrder", b"\x00")
        + attr(b"pixelAspectRatio", b"float", struct.pack("<f", 1.0))
        + attr(b"screenWindowCenter", b"v2f", struct.pack("<ff", 0.0, 0.0))
        + attr(b"screenWindowWidth", b"float", struct.pack("<f", 1.0))
        + b"\x00"
    )
    magic = struct.pack("<I", 20000630) + struct.pack("<I", 2)
    offset_table_pos = len(magic) + len(header)
    data_start = offset_table_pos + 8 * h
    line_size = 8 + w * 4 * 3  # y + size prefix + 3 channels float
    offsets = b"".join(struct.pack("<Q", data_start + y * line_size) for y in range(h))
    lines = []
    for y in range(h):
        px = img[y]
        block = (
            px[:, 2].astype("<f4").tobytes()
            + px[:, 1].astype("<f4").tobytes()
            + px[:, 0].astype("<f4").tobytes()
        )
        lines.append(struct.pack("<ii", y, len(block)) + block)
    Path(path).write_bytes(magic + header + offsets + b"".join(lines))


def write_image(path, img: np.ndarray) -> None:
    """Dispatch by extension (imageio.cpp:81-122)."""
    s = str(path).lower()
    if s.endswith(".pfm"):
        write_pfm(path, img)
    elif s.endswith(".png"):
        write_png(path, img)
    elif s.endswith(".exr"):
        write_exr(path, img)
    else:
        raise ValueError(f"unsupported image extension: {path}")


def read_image(path) -> np.ndarray:
    s = str(path).lower()
    if s.endswith(".pfm"):
        return read_pfm(path)
    raise ValueError(f"unsupported image extension for read: {path}")
