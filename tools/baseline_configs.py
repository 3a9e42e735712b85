#!/usr/bin/env python
"""Measure the driver's BASELINE.json configs 1-3 against the
reference encoder: fps + quality per config, written to
BASELINE_r{N}.json.

  config1: 720p 8-bit IPP low-delay (single fwd ref), fps + BD-rate
  config2: 1080p 10-bit 5-layer hierarchical + alt-ref TF, quality at
           matched QPs
  config3: 4K 10-bit multi-tile with CDEF + LR + film grain:
           conformant encode + fps

The reference runs SvtAv1EncApp (SIMD build when present) at --lp 1 on
this 1-vCPU host; 40-vCPU estimates scale linearly (generous to the
reference).
"""
import argparse
import json
import os
import subprocess
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))
sys.path.insert(0, str(Path(__file__).parent))

from quality_compare import synth_clip, write_y4m, bd_rate

REFBIN = os.environ.get("SVT_REFBIN", "/tmp/refbin")
REFSIMD = os.environ.get("SVT_REFSIMD", "/tmp/refsimd-bin")


def _refenc():
    return f"{REFSIMD}/SvtAv1EncApp" if Path(REFSIMD).exists() \
        else f"{REFBIN}/SvtAv1EncApp"


def synth_clip10(w, h, n):
    f8 = synth_clip(w, h, n)
    return [tuple((p.astype(np.uint16) << 2) for p in f) for f in f8]


def write_y4m10(path, frames, w, h):
    with open(path, "wb") as f:
        f.write(b"YUV4MPEG2 W%d H%d F30:1 Ip A0:0 C420p10\n" % (w, h))
        for y, u, v in frames:
            f.write(b"FRAME\n")
            for p in (y, u, v):
                f.write(p.astype("<u2").tobytes())


def encode_ours(frames, w, h, qp, ivf, **kw):
    from svt_av1_tpu.api import Encoder
    from svt_av1_tpu.config import EncoderConfig
    from svt_av1_tpu.io.ivf import IvfWriter
    cfg = EncoderConfig(source_width=w, source_height=h, qp=qp,
                        enc_mode=8, **kw)
    enc = Encoder(cfg)
    pkts = []
    t0 = time.time()
    for f in frames:
        pkts += enc.send_picture(f)
    pkts += enc.flush()
    dt = time.time() - t0
    with open(ivf, "wb") as fh:
        wtr = IvfWriter(fh, w, h)
        for i, p in enumerate(pkts):
            wtr.write_frame(p, i)
        wtr.close()
    return len(frames) / dt


def ref_encode(y4m, ivf, qp, extra=()):
    env = dict(os.environ, LD_LIBRARY_PATH=REFBIN)
    t0 = time.time()
    subprocess.run([_refenc(), "-i", str(y4m), "-b", str(ivf),
                    "--preset", "8", "-q", str(qp), "--lp", "1",
                    *extra], check=True, capture_output=True, env=env)
    return time.time() - t0


def decode_psnr(ivf, frames, w, h, bd=8):
    env = dict(os.environ, LD_LIBRARY_PATH=REFBIN)
    yuv = str(ivf) + ".yuv"
    subprocess.run([f"{REFBIN}/SvtAv1DecApp", "-i", str(ivf), "-o", yuv],
                   check=True, capture_output=True, env=env)
    data = Path(yuv).read_bytes()
    bpp = 2 if bd > 8 else 1
    fsz = w * h * 3 // 2 * bpp
    mx = (1 << bd) - 1
    se = cnt = 0
    n = min(len(data) // fsz, len(frames))
    assert n > 0, "decode produced no frames"
    for i in range(n):
        raw = np.frombuffer(data[i * fsz:(i + 1) * fsz],
                            np.uint16 if bpp == 2 else np.uint8)
        y = raw[:w * h].astype(np.float64)
        sy = np.asarray(frames[i][0]).reshape(-1).astype(np.float64)
        se += ((y - sy) ** 2).sum()
        cnt += y.size
    os.unlink(yuv)
    return 10 * np.log10(mx * mx / (se / cnt))


def config1(tmp, frames_n=24):
    """720p IPP low-delay: fps + BD-rate."""
    w, h = 1280, 720
    frames = synth_clip(w, h, frames_n)
    y4m = tmp / "c1.y4m"
    write_y4m(y4m, frames, w, h)
    ref, ours = [], []
    fps_ours = fps_ref = None
    for qp in (35, 45, 55):
        rivf = tmp / f"c1r{qp}.ivf"
        dt = ref_encode(y4m, rivf, qp,
                        ("--keyint", str(frames_n + 1)))
        if qp == 45:
            fps_ref = frames_n / dt
        ref.append((rivf.stat().st_size * 8,
                    decode_psnr(rivf, frames, w, h)))
        oivf = tmp / f"c1o{qp}.ivf"
        fps = encode_ours(frames, w, h, qp, oivf,
                          intra_period_length=frames_n,
                          hierarchical_levels=0)
        if qp == 45:
            fps_ours = fps
        ours.append((oivf.stat().st_size * 8,
                     decode_psnr(oivf, frames, w, h)))
    bd = bd_rate(ref, ours)
    return dict(name="720p_ipp_lowdelay", frames=frames_n,
                fps_ours=round(fps_ours, 3),
                fps_ref_1core=round(fps_ref, 3),
                vs_40vcpu_estimate=round(fps_ours / (fps_ref * 40), 4),
                bd_rate_pct=None if bd is None else round(bd, 2),
                ladder_ref=[(b, round(p, 3)) for b, p in ref],
                ladder_ours=[(b, round(p, 3)) for b, p in ours])


def config2(tmp, frames_n=16):
    """1080p 10-bit 5-layer hierarchical + TF: quality at matched QP."""
    w, h = 1920, 1080
    frames = synth_clip10(w, h, frames_n)
    y4m = tmp / "c2.y4m"
    write_y4m10(y4m, frames, w, h)
    # 5 temporal layers == hierarchical-levels 4 (the reference's max)
    out = dict(name="1080p10_5layer_tf", frames=frames_n, points=[])
    for qp in (40, 50):
        rivf = tmp / f"c2r{qp}.ivf"
        ref_encode(y4m, rivf, qp, ("--keyint", str(frames_n + 1),
                                   "--input-depth", "10",
                                   "--hierarchical-levels", "4"))
        oivf = tmp / f"c2o{qp}.ivf"
        fps = encode_ours(frames, w, h, qp, oivf,
                          intra_period_length=frames_n,
                          encoder_bit_depth=10,
                          hierarchical_levels=4)
        out["points"].append(dict(
            qp=qp,
            ref_bits=rivf.stat().st_size * 8,
            ref_psnr=round(decode_psnr(rivf, frames, w, h, 10), 3),
            our_bits=oivf.stat().st_size * 8,
            our_psnr=round(decode_psnr(oivf, frames, w, h, 10), 3),
            our_fps=round(fps, 3)))
    return out


def config3(tmp, frames_n=4):
    """4K 10-bit multi-tile + CDEF + LR + film grain: conformant
    encode + fps."""
    w, h = 3840, 2160
    frames = synth_clip10(w, h, frames_n)
    oivf = tmp / "c3o.ivf"
    fps = encode_ours(frames, w, h, 45, oivf,
                      intra_period_length=frames_n,
                      encoder_bit_depth=10, tile_columns=1, tile_rows=1,
                      cdef_level=1, enable_restoration=1,
                      film_grain_denoise_strength=4)
    psnr = decode_psnr(oivf, frames, w, h, 10)
    return dict(name="4k10_multitile_cdef_lr_grain", frames=frames_n,
                fps_ours=round(fps, 3), bits=oivf.stat().st_size * 8,
                psnr_grain_on=round(float(psnr), 3),
                conformant_on_ref_decoder=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=4)
    ap.add_argument("--configs", default="1,2,3")
    args = ap.parse_args()
    tmp = Path(tempfile.mkdtemp(prefix="basecfg_"))
    out = {}
    for c in args.configs.split(","):
        fn = {"1": config1, "2": config2, "3": config3}[c]
        print(f"running config{c}...", flush=True)
        out[f"config{c}"] = fn(tmp)
        print(json.dumps(out[f"config{c}"]), flush=True)
    path = f"BASELINE_r{args.round:02d}.json"
    Path(path).write_text(json.dumps(out, indent=1))
    print("->", path)


if __name__ == "__main__":
    main()
