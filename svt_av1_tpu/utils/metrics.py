"""Quality metrics (ref: Source/Lib/Encoder/Codec/EbPsnr.c)."""
from __future__ import annotations

import numpy as np


def sse(a: np.ndarray, b: np.ndarray) -> float:
    d = a.astype(np.int64) - b.astype(np.int64)
    return float((d * d).sum())


def psnr(a: np.ndarray, b: np.ndarray, peak: int = 255) -> float:
    """svt_aom_sse_to_psnr semantics."""
    s = sse(a, b)
    if s == 0:
        return 99.0
    n = a.size
    return min(10.0 * np.log10(peak * peak * n / s), 99.0)


def frame_psnr(src_planes, rec_planes, peak: int = 255):
    """Returns (y, u, v, combined) PSNR like the reference stat report."""
    ps = [psnr(s, r, peak) for s, r in zip(src_planes, rec_planes)]
    total_sse = sum(sse(s, r) for s, r in zip(src_planes, rec_planes))
    total_n = sum(p.size for p in src_planes)
    comb = 99.0 if total_sse == 0 else min(
        10.0 * np.log10(peak * peak * total_n / total_sse), 99.0)
    return (*ps, comb)
