#!/usr/bin/env python
"""Per-frame bits + PSNR comparison vs the reference encoder at one QP
(the drill-down behind quality_compare's aggregate BD-rate)."""
import argparse
import os
import struct
import subprocess
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))
sys.path.insert(0, str(Path(__file__).parent))

from quality_compare import synth_clip, write_y4m, run_ours

REFBIN = os.environ.get("SVT_REFBIN", "/tmp/refbin")


def ivf_sizes(path):
    data = Path(path).read_bytes()
    off, sizes = 32, []
    while off < len(data):
        sz, = struct.unpack("<I", data[off:off + 4])
        off += 12 + sz
        sizes.append(sz)
    return sizes


def per_frame_psnr(yuv, frames, w, h):
    data = Path(yuv).read_bytes()
    fsz = w * h * 3 // 2
    out = []
    for i in range(min(len(data) // fsz, len(frames))):
        raw = np.frombuffer(data[i * fsz:(i + 1) * fsz], np.uint8)
        y = raw[:w * h].reshape(h, w).astype(np.float64)
        se = ((y - frames[i][0]) ** 2).mean()
        out.append(99.0 if se == 0 else 10 * np.log10(255 ** 2 / se))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--qp", type=int, default=40)
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=360)
    ap.add_argument("--preset", type=int, default=8)
    args = ap.parse_args()
    w, h, n = args.width, args.height, args.frames
    frames = synth_clip(w, h, n)
    tmp = Path(tempfile.mkdtemp(prefix="fcmp_"))
    y4m = tmp / "src.y4m"
    write_y4m(y4m, frames, w, h)
    env = dict(os.environ, LD_LIBRARY_PATH=REFBIN)
    subprocess.run([f"{REFBIN}/SvtAv1EncApp", "-i", str(y4m), "-b",
                    str(tmp / "ref.ivf"), "--preset", str(args.preset),
                    "-q", str(args.qp), "--keyint", str(n + 1),
                    "--lp", "1"], check=True, capture_output=True,
                   env=env)
    run_ours(frames, tmp / "our.ivf", args.qp, args.preset, n + 1, w, h)
    for tag in ("ref", "our"):
        subprocess.run([f"{REFBIN}/SvtAv1DecApp", "-i",
                        str(tmp / f"{tag}.ivf"), "-o",
                        str(tmp / f"{tag}.yuv")], check=True,
                       capture_output=True, env=env)
    rs = ivf_sizes(tmp / "ref.ivf")
    os_ = ivf_sizes(tmp / "our.ivf")
    rp = per_frame_psnr(tmp / "ref.yuv", frames, w, h)
    op = per_frame_psnr(tmp / "our.yuv", frames, w, h)
    print(f"{'i':>3} {'ref_B':>7} {'our_B':>7} {'ref_dB':>7} {'our_dB':>7}")
    for i in range(max(len(rs), len(os_))):
        print(f"{i:>3} {rs[i] if i < len(rs) else 0:>7}"
              f" {os_[i] if i < len(os_) else 0:>7}"
              f" {rp[i] if i < len(rp) else 0:>7.2f}"
              f" {op[i] if i < len(op) else 0:>7.2f}")
    print(f"sum {sum(rs):>7} {sum(os_):>7} {np.mean(rp):>7.2f}"
          f" {np.mean(op):>7.2f}")


if __name__ == "__main__":
    main()
