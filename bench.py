#!/usr/bin/env python
"""Round benchmark: all-intra CIF encode throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline provenance: SvtAv1EncApp (v0.8.6, COMPILE_C_ONLY build — no SIMD)
measured on the build host at 2.503 fps for the same config
(352x288 synthetic clip, 30 frames, preset 8, keyint 1, q 40, all-intra).
The C-only build understates the reference's AVX2 speed by roughly an
order of magnitude; vs_baseline here tracks progress against the
measurable local baseline until multi-frame pipelining and the batched
TPU compute path land.
"""
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent))

from svt_av1_tpu.api import Encoder                     # noqa: E402
from svt_av1_tpu.config import EncoderConfig            # noqa: E402

BASELINE_FPS = 2.503   # SvtAv1EncApp C-only, same host/config (see docstring)

W, H, N_FRAMES, QP = 352, 288, 8, 40


def synthetic_frames(n):
    rng = np.random.default_rng(7)
    frames = []
    for i in range(n):
        yy, xx = np.mgrid[0:H, 0:W]
        y = (110 + 70 * np.sin(xx / 17 + i * 0.3) + 50 * np.cos(yy / 23 + i * 0.1)
             + rng.integers(-10, 11, (H, W))).clip(0, 255).astype(np.uint8)
        u = (128 + 40 * np.sin(yy[:H // 2, :W // 2] / 9 + i * 0.05)).clip(0, 255).astype(np.uint8)
        v = (128 - 40 * np.cos(xx[:H // 2, :W // 2] / 13)).clip(0, 255).astype(np.uint8)
        frames.append((y, u, v))
    return frames


def main():
    frames = synthetic_frames(N_FRAMES)
    cfg = EncoderConfig(source_width=W, source_height=H, qp=QP)
    enc = Encoder(cfg)
    # warmup (first frame may trigger table loads / jit)
    enc.encode_frame(frames[0])
    t0 = time.time()
    total = 0
    for f in frames:
        total += len(enc.encode_frame(f))
    dt = time.time() - t0
    fps = N_FRAMES / dt
    print(json.dumps({
        "metric": "cif_allintra_encode_fps",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
