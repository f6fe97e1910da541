"""Planar YUV file I/O (HM TVideoIOYuv.cpp semantics: little-endian samples,
1 byte <=8-bit, 2 bytes otherwise, planes Y then Cb then Cr)."""

from __future__ import annotations

import numpy as np


def write_yuv_frame(f, planes, bit_depths):
    for plane, bd in zip(planes, bit_depths):
        dt = np.uint8 if bd <= 8 else np.uint16
        f.write(np.ascontiguousarray(plane, dtype=dt).tobytes())


def read_yuv_frame(f, width, height, chroma_format_idc=1, file_bit_depth=8):
    dt = np.uint8 if file_bit_depth <= 8 else np.uint16
    bypp = 1 if file_bit_depth <= 8 else 2
    sx = 1 if chroma_format_idc in (1, 2) else 0
    sy = 1 if chroma_format_idc == 1 else 0
    planes = []
    dims = [(height, width)]
    if chroma_format_idc != 0:
        dims += [(height >> sy, width >> sx)] * 2
    for (h, w) in dims:
        buf = f.read(h * w * bypp)
        if len(buf) < h * w * bypp:
            return None
        planes.append(np.frombuffer(buf, dtype=dt).reshape(h, w).astype(np.int32))
    return planes
