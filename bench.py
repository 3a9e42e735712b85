#!/usr/bin/env python
"""Round benchmark: 720p all-intra encode throughput on the real chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The encoder under test is the product path: frame-batched open-loop mode
decision (all 13 intra modes x 7 block shapes per block) and CDEF
search+apply run as jitted device programs on the TPU; the serial
conformant finish runs through the fused native block kernel; streams
decode bit-exactly on the reference SvtAv1DecApp (conformance suite).

Baseline provenance: SvtAv1EncApp (v0.8.6, COMPILE_C_ONLY build — no
SIMD) measured on this host at 0.417 fps for the same config (1280x720
synthetic clip, preset 8, keyint 1, q 40, all-intra). The C-only build
understates the reference's AVX2 speed by roughly an order of
magnitude. Separately, the axon TPU tunnel adds ~30 ms per device call
and ~30 ns/byte of transfer that a directly-attached chip does not pay.
"""
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent))

from svt_av1_tpu.api import Encoder                     # noqa: E402
from svt_av1_tpu.config import EncoderConfig            # noqa: E402

BASELINE_FPS = 0.417   # SvtAv1EncApp C-only, same host/config (docstring)

W, H, N_FRAMES, QP = 1280, 720, 6, 40


def synthetic_frames(n):
    rng = np.random.default_rng(7)
    frames = []
    yy, xx = np.mgrid[0:H, 0:W]
    for i in range(n):
        y = (110 + 70 * np.sin(xx / 17 + i * 0.3)
             + 50 * np.cos(yy / 23 + i * 0.1)
             + rng.integers(-10, 11, (H, W))).clip(0, 255).astype(np.uint8)
        u = (128 + 40 * np.sin(yy[:H // 2, :W // 2] / 9 + i * 0.05)
             ).clip(0, 255).astype(np.uint8)
        v = (128 - 40 * np.cos(xx[:H // 2, :W // 2] / 13)
             ).clip(0, 255).astype(np.uint8)
        frames.append((y, u, v))
    return frames


def main():
    frames = synthetic_frames(N_FRAMES)
    cfg = EncoderConfig(source_width=W, source_height=H, qp=QP)
    enc = Encoder(cfg)
    # warmup (first frame triggers the device-program compiles)
    enc.encode_frame(frames[0])
    t0 = time.time()
    total = 0
    for f in frames:
        total += len(enc.encode_frame(f))
    dt = time.time() - t0
    fps = N_FRAMES / dt
    print(json.dumps({
        "metric": "hd720_allintra_encode_fps",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
