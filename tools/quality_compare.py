#!/usr/bin/env python
"""Quality comparison vs the reference encoder: PSNR at matched
bitrates (BD-rate), the check BASELINE.md demands ("PSNR >= SVT-AV1 at
matched bitrate").  Ref machinery analog: test/e2e_test/
SvtAv1E2EFramework.h:152-176 + EbPsnr.c.

Encodes the same clip with the reference SvtAv1EncApp (oracle build)
and with this encoder over a QP ladder, decodes both with the
reference decoder, computes global PSNR vs the source, and reports
BD-rate (piecewise-log interpolation).  Writes QUALITY_r{N}.json.

Usage: python tools/quality_compare.py [--round 3] [--frames 20]
       [--width 640 --height 360] [--gop ai|ld] [--preset 8]
"""
import argparse
import json
import math
import os
import subprocess
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

REFBIN = os.environ.get("SVT_REFBIN", "/tmp/refbin")


def synth_clip(w, h, n, seed=3):
    """Natural-ish synthetic content: moving textured fore/background,
    gradients, sharp edges, mild sensor noise."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    tex = rng.normal(0, 12, (h * 2, w * 2))
    frames = []
    for i in range(n):
        dx, dy = int(3.1 * i) % w, int(1.7 * i) % h
        bg = 90 + 50 * np.sin((xx + 2 * i) / 37) + 25 * np.cos(yy / 29)
        t = tex[dy:dy + h, dx:dx + w]
        y = bg + t
        # moving rectangle with sharp edges
        x0 = (40 + 5 * i) % (w - 80)
        y0 = (30 + 3 * i) % (h - 60)
        y[y0:y0 + 60, x0:x0 + 80] = 190 - (xx[:60, :80] % 17) * 4
        y = (y + rng.normal(0, 2, (h, w))).clip(0, 255).astype(np.uint8)
        u = (120 + 30 * np.sin((yy[:h // 2, :w // 2] + i) / 23)
             ).clip(0, 255).astype(np.uint8)
        v = (130 - 30 * np.cos((xx[:h // 2, :w // 2] + 2 * i) / 31)
             ).clip(0, 255).astype(np.uint8)
        frames.append((y, u, v))
    return frames


def write_y4m(path, frames, w, h):
    with open(path, "wb") as f:
        f.write(b"YUV4MPEG2 W%d H%d F30:1 Ip A0:0 C420jpeg\n" % (w, h))
        for y, u, v in frames:
            f.write(b"FRAME\n")
            f.write(y.tobytes())
            f.write(u.tobytes())
            f.write(v.tobytes())


def psnr_vs_source(yuv_path, frames, w, h):
    """Global PSNR (all planes pooled) of a decoded yuv vs the source."""
    data = Path(yuv_path).read_bytes()
    fsz = w * h * 3 // 2
    n = len(data) // fsz
    se = 0.0
    cnt = 0
    for i in range(min(n, len(frames))):
        raw = np.frombuffer(data[i * fsz:(i + 1) * fsz], np.uint8)
        y = raw[:w * h].reshape(h, w).astype(np.float64)
        u = raw[w * h:w * h * 5 // 4].reshape(h // 2, w // 2).astype(np.float64)
        v = raw[w * h * 5 // 4:].reshape(h // 2, w // 2).astype(np.float64)
        sy, su, sv = frames[i]
        se += ((y - sy) ** 2).sum() + ((u - su) ** 2).sum() \
            + ((v - sv) ** 2).sum()
        cnt += y.size + u.size + v.size
    mse = se / cnt
    return 99.0 if mse == 0 else 10 * math.log10(255.0 * 255.0 / mse)


def run_reference(y4m, ivf, qp, preset, keyint, lp=1):
    cmd = [f"{REFBIN}/SvtAv1EncApp", "-i", str(y4m), "-b", str(ivf),
           "--preset", str(preset), "-q", str(qp), "--keyint", str(keyint),
           "--lp", str(lp)]
    env = dict(os.environ, LD_LIBRARY_PATH=REFBIN)
    subprocess.run(cmd, check=True, capture_output=True, env=env)


def run_ours(frames, ivf, qp, preset, keyint, w, h):
    from svt_av1_tpu.api import Encoder
    from svt_av1_tpu.config import EncoderConfig
    from svt_av1_tpu.io.ivf import IvfWriter
    cfg = EncoderConfig(source_width=w, source_height=h, qp=qp,
                        enc_mode=preset,
                        intra_period_length=keyint - 1 if keyint > 0 else -2)
    enc = Encoder(cfg)
    pkts = []
    for f in frames:
        pkts += enc.send_picture(f)
    pkts += enc.flush()
    with open(ivf, "wb") as fh:
        wtr = IvfWriter(fh, w, h)
        for i, p in enumerate(pkts):
            wtr.write_frame(p, i)
        wtr.close()


def decode_ref(ivf, yuv):
    env = dict(os.environ, LD_LIBRARY_PATH=REFBIN)
    subprocess.run([f"{REFBIN}/SvtAv1DecApp", "-i", str(ivf), "-o",
                    str(yuv)], check=True, capture_output=True, env=env)


def bd_rate(anchor, test):
    """BD-rate (%) of test vs anchor from (bits, psnr) ladders —
    piecewise-linear integration over the overlapping PSNR range
    (positive = test needs more bits)."""
    a = sorted(anchor, key=lambda x: x[1])
    t = sorted(test, key=lambda x: x[1])
    lo = max(a[0][1], t[0][1])
    hi = min(a[-1][1], t[-1][1])
    if hi <= lo:
        return None

    def log_rate_at(ladder, p):
        for i in range(len(ladder) - 1):
            (b0, p0), (b1, p1) = ladder[i], ladder[i + 1]
            if p0 <= p <= p1:
                w_ = 0.0 if p1 == p0 else (p - p0) / (p1 - p0)
                return math.log(b0) + w_ * (math.log(b1) - math.log(b0))
        return None

    n = 64
    acc = 0.0
    for k in range(n + 1):
        p = lo + (hi - lo) * k / n
        la = log_rate_at(a, p)
        lt = log_rate_at(t, p)
        wgt = 0.5 if k in (0, n) else 1.0
        acc += wgt * (lt - la)
    avg = acc / n
    return (math.exp(avg) - 1) * 100.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=3)
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=360)
    ap.add_argument("--gop", default="ai", choices=("ai", "ld"))
    ap.add_argument("--preset", type=int, default=8)
    ap.add_argument("--qps", default="30,40,50,55")
    ap.add_argument("--our-qps", default="")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    w, h, n = args.width, args.height, args.frames
    keyint = 0 if args.gop == "ai" else n + 1
    our_keyint = 1 if args.gop == "ai" else n + 1
    frames = synth_clip(w, h, n)
    qps = [int(q) for q in args.qps.split(",")]
    our_qps = [int(q) for q in args.our_qps.split(",")] \
        if args.our_qps else qps
    tmp = Path(tempfile.mkdtemp(prefix="qual_"))
    y4m = tmp / "src.y4m"
    write_y4m(y4m, frames, w, h)

    result = {"clip": {"w": w, "h": h, "frames": n, "gop": args.gop},
              "preset": args.preset, "qps": qps, "our_qps": our_qps,
              "reference": [], "ours": []}
    for qp in qps:
        ivf = tmp / f"ref_q{qp}.ivf"
        yuv = tmp / f"ref_q{qp}.yuv"
        run_reference(y4m, ivf, qp, args.preset, keyint)
        decode_ref(ivf, yuv)
        bits = ivf.stat().st_size * 8
        p = psnr_vs_source(yuv, frames, w, h)
        result["reference"].append({"qp": qp, "bits": bits,
                                    "psnr": round(p, 4)})
        print(f"ref  qp={qp}: {bits} bits, {p:.3f} dB", flush=True)
    for qp in our_qps:
        ivf = tmp / f"our_q{qp}.ivf"
        yuv = tmp / f"our_q{qp}.yuv"
        run_ours(frames, ivf, qp, args.preset, our_keyint, w, h)
        decode_ref(ivf, yuv)
        bits = ivf.stat().st_size * 8
        p = psnr_vs_source(yuv, frames, w, h)
        result["ours"].append({"qp": qp, "bits": bits, "psnr": round(p, 4)})
        print(f"ours qp={qp}: {bits} bits, {p:.3f} dB", flush=True)

    bd = bd_rate([(r["bits"], r["psnr"]) for r in result["reference"]],
                 [(r["bits"], r["psnr"]) for r in result["ours"]])
    result["bd_rate_pct_vs_reference"] = None if bd is None else round(bd, 2)
    out = args.out or f"QUALITY_r{args.round:02d}_{args.gop}" \
                      f"_p{args.preset}.json"
    Path(out).write_text(json.dumps(result, indent=1))
    print(f"BD-rate vs reference: {bd if bd is None else round(bd, 2)}% "
          f"-> {out}")


if __name__ == "__main__":
    main()
