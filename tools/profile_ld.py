#!/usr/bin/env python
"""Profile the 1080p low-delay preset-8 path: per-stage latency table.

Usage: python tools/profile_ld.py [n_frames] [width height]
"""
import faulthandler
import json
import sys
import time
from pathlib import Path

faulthandler.dump_traceback_later(45, repeat=True, file=sys.stderr)

sys.path.insert(0, str(Path(__file__).parent.parent))
sys.path.insert(0, str(Path(__file__).parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

from svt_av1_tpu.api import Encoder
from svt_av1_tpu.config import EncoderConfig


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 17
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 1920
    h = int(sys.argv[3]) if len(sys.argv) > 3 else 1080
    from quality_compare import synth_clip
    frames = synth_clip(w, h, n)
    cfg = EncoderConfig(source_width=w, source_height=h, qp=40,
                        enc_mode=8, intra_period_length=n)
    enc = Encoder(cfg)
    t0 = time.time()
    total = 0
    for i, f in enumerate(frames):
        t1 = time.time()
        total += sum(len(p) for p in enc.send_picture(f))
        print(f"frame {i}: {time.time()-t1:.2f}s", file=sys.stderr)
    total += sum(len(p) for p in enc.flush())
    dt = time.time() - t0
    print(enc.prof.format_report(n), file=sys.stderr)
    print(json.dumps({"frames": n, "fps": round(n / dt, 3),
                      "bytes": total}))


if __name__ == "__main__":
    main()
