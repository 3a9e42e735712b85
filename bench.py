#!/usr/bin/env python
"""Round benchmark: 1080p all-intra encode throughput on the real chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The encoder under test is the product path at preset 8: the frame-batched
open-loop mode decision runs as a jitted device program (prefetched on a
worker thread, one picture in flight), the conformant coding pass runs
as one native-C call per tile replaying the device plan, and the DLF
level search + CDEF strength search + apply run as ONE fused jitted
device program per frame.  Streams decode bit-exactly on the reference
SvtAv1DecApp (conformance suite).

Baseline provenance (same host, single core, measured 2026-08-17 on the
identical synthetic 1080p clip, preset 8, q 40, --keyint 0 --lp 1):
  - SvtAv1EncApp v0.8.6 SIMD build (AVX2/SSE intrinsics enabled;
    the 13 .asm files replaced by C twins via tools/build_ref_simd.sh;
    output byte-identical to the C-only build): 0.589 fps  <- baseline
  - SvtAv1EncApp v0.8.6 COMPILE_C_ONLY build:   0.105 fps
  - this encoder, round 2 (720p bench scaled):  ~0.45 fps
Note the axon TPU tunnel adds ~30 ms per device call and ~30 ns/byte of
transfer that a directly-attached chip does not pay.
"""
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent))

from svt_av1_tpu.api import Encoder                     # noqa: E402
from svt_av1_tpu.config import EncoderConfig            # noqa: E402

BASELINE_FPS = 0.589   # SvtAv1EncApp SIMD build, same host/clip (docstring)

W, H, N_FRAMES, QP = 1920, 1080, 8, 40


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
    # warmup (compiles the device programs, fills the 1-frame pipeline)
    enc.send_picture(frames[0])
    enc.send_picture(frames[1])
    t0 = time.time()
    total = 0
    for f in frames[2:]:
        total += sum(len(p) for p in enc.send_picture(f))
    total += sum(len(p) for p in enc.flush())
    dt = time.time() - t0
    fps = (N_FRAMES - 2) / dt
    print(json.dumps({
        "metric": "hd1080_allintra_encode_fps",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
