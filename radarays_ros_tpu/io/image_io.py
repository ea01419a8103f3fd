"""Polar-image output: the `radar/image` publisher surface, file-backed.

The reference emits frames as mono8 sensor_msgs/Image over ROS
(radar_simulator.cpp:179-180, RadarCPU.cpp:555-561). Without ROS, a frame is
a uint8 (n_cells, n_angles) array; this module writes/reads them as

  * 8-bit grayscale PNG (dependency-free encoder/decoder: zlib + struct),
  * .npy via numpy,

and converts polar frames to Cartesian point clouds (the radar_img_to_pcl
helper used in launch/tests/radar_sim_test.launch).
"""

from __future__ import annotations

import struct
import zlib
from pathlib import Path

import numpy as np


def write_png_gray(path, img: np.ndarray) -> None:
    """Write a (H, W) uint8 array as an 8-bit grayscale PNG."""
    img = np.ascontiguousarray(img, np.uint8)
    if img.ndim != 2:
        raise ValueError(f"expected (H, W) image, got {img.shape}")
    h, w = img.shape
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # 8-bit grayscale
    png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", zlib.compress(raw, 6)) + chunk(b"IEND", b""))
    Path(path).write_bytes(png)


def write_png_rgb(path, img: np.ndarray) -> None:
    """Write a (H, W, 3) uint8 array as an 8-bit RGB PNG."""
    img = np.ascontiguousarray(img, np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError(f"expected (H, W, 3) image, got {img.shape}")
    h, w = img.shape[:2]
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", zlib.compress(raw, 6)) + chunk(b"IEND", b""))
    Path(path).write_bytes(png)


def read_image_gray(path) -> np.ndarray:
    """Read ANY common image as (H, W) uint8 grayscale: the in-tree PNG
    reader for our own mono8 frames, with a PIL fallback for external
    color images (e.g. the reference's published figure,
    dat/kaist02_radarays_papercolor.png)."""
    try:
        return read_png_gray(path)
    except ValueError:
        try:
            from PIL import Image
        except ImportError as e:  # pragma: no cover - env without PIL
            raise ValueError(
                f"{path}: not an 8-bit grayscale PNG and PIL is "
                "unavailable for conversion") from e
        return np.asarray(Image.open(path).convert("L"), np.uint8)


def read_png_gray(path) -> np.ndarray:
    """Read an 8-bit grayscale PNG written by write_png_gray (filter 0/none,
    also unfilters sub/up/average/paeth for externally produced files)."""
    data = Path(path).read_bytes()
    if data[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError(f"{path}: not a PNG")
    pos, w = 8, 0
    h = bit_depth = color_type = None
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        payload = data[pos + 8:pos + 8 + length]
        if tag == b"IHDR":
            w, h, bit_depth, color_type = struct.unpack(">IIBB", payload[:10])
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + length
    if bit_depth != 8 or color_type != 0:
        raise ValueError(f"{path}: only 8-bit grayscale supported")
    raw = zlib.decompress(idat)
    stride = w + 1
    img = np.empty((h, w), np.uint8)
    prev = np.zeros(w, np.int32)
    for y in range(h):
        row = raw[y * stride:(y + 1) * stride]
        filt, line = row[0], np.frombuffer(row[1:], np.uint8).astype(np.int32)
        if filt == 0:
            out = line
        elif filt == 2:  # up
            out = (line + prev) & 0xFF
        elif filt in (1, 3, 4):  # sub / average / paeth need sequential scan
            out = np.zeros(w, np.int32)
            for x in range(w):
                a = out[x - 1] if x else 0
                b = prev[x]
                c = prev[x - 1] if x else 0
                if filt == 1:
                    pred = a
                elif filt == 3:
                    pred = (a + b) // 2
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                out[x] = (line[x] + pred) & 0xFF
        else:
            raise ValueError(f"{path}: unsupported filter {filt}")
        img[y] = out.astype(np.uint8)
        prev = out
    return img


def polar_to_points(img: np.ndarray, resolution: float,
                    threshold: int = 1, scroll: int = 0) -> np.ndarray:
    """Convert a (n_cells, n_angles) polar frame to (N, 4) [x, y, z=0, value].

    The radar_img_to_pcl workflow of launch/tests/radar_sim_test.launch:
    cell r in column a maps to range r*resolution at azimuth
    theta_a = -2*pi*a/A (utils/transforms.py:azimuth_angles).
    """
    n_cells, A = img.shape
    cells, cols = np.nonzero(img >= threshold)
    ang = -(2.0 * np.pi) * ((cols - scroll) % A) / A
    r = cells.astype(np.float32) * resolution
    return np.stack(
        [r * np.cos(ang), r * np.sin(ang), np.zeros_like(r),
         img[cells, cols].astype(np.float32)], axis=-1)


def save_frame(path, img: np.ndarray) -> None:
    """Write a frame by extension: .png or .npy."""
    path = Path(path)
    if path.suffix == ".png":
        write_png_gray(path, img)
    elif path.suffix == ".npy":
        np.save(path, np.asarray(img))
    else:
        raise ValueError(f"unsupported frame format {path.suffix}")
