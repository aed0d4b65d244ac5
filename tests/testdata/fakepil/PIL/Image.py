"""Minimal ``PIL.Image`` stand-in: decodes binary PGM (P5, maxval 255).

Interface mirror of what ``_decode_image_real`` uses — ``open`` returning
a context manager whose ``convert("L")`` result is numpy-convertible.
Undecodable input raises OSError, like Pillow's ``UnidentifiedImageError``
(an OSError subclass), so the operator's corrupt-blob handling is
exercised for real.
"""

import re

import numpy as np

_HEADER = re.compile(rb"P5\s+(\d+)\s+(\d+)\s+(\d+)\s")


class _PGMImage:
    def __init__(self, arr):
        self._arr = arr

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False

    def convert(self, mode):
        if mode != "L":
            raise ValueError(f"unsupported mode {mode!r}")
        return self

    def __array__(self, dtype=None, copy=None):
        arr = self._arr
        if dtype is not None:
            arr = arr.astype(dtype)
        return arr


def open(fp):  # noqa: A001 - mirrors PIL.Image.open
    data = fp.read()
    m = _HEADER.match(data)
    if not m:
        raise OSError("cannot identify image file")
    w, h, maxval = (int(g) for g in m.groups())
    if maxval != 255 or w <= 0 or h <= 0:
        raise OSError("unsupported PGM variant")
    raster = data[m.end() :]
    if len(raster) < w * h:
        raise OSError("truncated raster")
    return _PGMImage(np.frombuffer(raster[: w * h], dtype=np.uint8).reshape(h, w))
