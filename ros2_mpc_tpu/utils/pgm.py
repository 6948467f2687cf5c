"""PGM map image I/O + synthetic map generation.

The reference ships a cartographer-built map (maps/map_carto.pgm, trinary:
254 free / 0 occupied / 205 unknown, maps/map_carto.yaml) and loads it with
OpenCV (core/map_server.py:14-15). Here PGM P2/P5 parsing is ~40 lines of
stdlib, and a deterministic synthetic indoor map generator provides the test
asset (no binary blobs in the repo, nothing copied from the reference)."""

from __future__ import annotations

import numpy as np
import yaml


def read_pgm(path: str) -> np.ndarray:
    """Read a P2 (ASCII) or P5 (binary) PGM as uint8/uint16 (H, W)."""
    with open(path, "rb") as fh:
        data = fh.read()

    # Tokenize the header, skipping '#' comments.
    tokens = []
    i = 0
    while len(tokens) < 4 and i < len(data):
        if data[i : i + 1] == b"#":
            while i < len(data) and data[i : i + 1] != b"\n":
                i += 1
        elif data[i : i + 1].isspace():
            i += 1
        else:
            j = i
            while j < len(data) and not data[j : j + 1].isspace() and data[j : j + 1] != b"#":
                j += 1
            tokens.append(data[i:j])
            i = j
    magic, w, h, maxval = tokens[0].decode(), int(tokens[1]), int(tokens[2]), int(tokens[3])
    dtype = np.dtype(np.uint8) if maxval < 256 else np.dtype(">u2")
    if magic == "P5":
        i += 1  # single whitespace after maxval
        img = np.frombuffer(data[i : i + w * h * dtype.itemsize], dtype=dtype, count=w * h)
    elif magic == "P2":
        img = np.array(data[i:].split()[: w * h], dtype=int).astype(dtype)
    else:
        raise ValueError(f"unsupported PGM magic {magic!r}")
    return img.reshape(h, w)


def write_pgm(path: str, img: np.ndarray) -> None:
    """Write uint8 (H, W) as binary P5."""
    img = np.asarray(img, dtype=np.uint8)
    h, w = img.shape
    with open(path, "wb") as fh:
        fh.write(f"P5\n{w} {h}\n255\n".encode())
        fh.write(img.tobytes())


def load_map_yaml(path: str) -> dict:
    """map_server-style map metadata (maps/map_carto.yaml format)."""
    with open(path, "r") as fh:
        meta = yaml.safe_load(fh)
    return {
        "resolution": float(meta["resolution"]),
        "origin": [float(meta["origin"][0]), float(meta["origin"][1])],
        "image": meta.get("image"),
    }


def synthetic_indoor_map(h: int = 250, w: int = 250, seed: int = 7) -> np.ndarray:
    """Deterministic trinary map in the cartographer convention the reference
    map uses (254 free, 0 occupied, 205 unknown): an outer wall, a few rooms
    with door gaps, and scattered pillars."""
    rng = np.random.default_rng(seed)
    img = np.full((h, w), 205, dtype=np.uint8)  # unknown border region
    img[10 : h - 10, 10 : w - 10] = 254  # free interior

    # outer walls
    img[10:12, 10 : w - 10] = 0
    img[h - 12 : h - 10, 10 : w - 10] = 0
    img[10 : h - 10, 10:12] = 0
    img[10 : h - 10, w - 12 : w - 10] = 0

    # interior walls with door gaps
    mid_r, mid_c = h // 2, w // 2
    img[mid_r : mid_r + 2, 10 : w - 10] = 0
    img[mid_r : mid_r + 2, mid_c - 14 : mid_c + 14] = 254  # central door
    img[10:mid_r, mid_c : mid_c + 2] = 0
    img[mid_r - 40 : mid_r - 16, mid_c : mid_c + 2] = 254  # upper door

    # pillars
    for _ in range(6):
        r = int(rng.integers(25, h - 30))
        c = int(rng.integers(25, w - 30))
        if abs(r - mid_r) < 8:  # keep doors clear
            continue
        img[r : r + 4, c : c + 4] = 0
    return img


DEFAULT_MAP_INFO = {"resolution": 0.05, "origin": [-6.25, -6.25]}
