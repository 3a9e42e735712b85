"""End-to-end conformance tests (analog of test/e2e_test/SvtAv1E2EFramework):
encode synthetic clips, verify (a) our decoder reproduces the encoder's
recon exactly, (b) the reference SvtAv1DecApp decodes our bitstream to the
same pictures bit-exactly."""
import os
import subprocess
from pathlib import Path

import numpy as np
import pytest

from svt_av1_tpu.api import decode_ivf, encode_ivf
from svt_av1_tpu.config import EncoderConfig
from svt_av1_tpu.constants import PredictionMode as P
from svt_av1_tpu.pipeline.frame_codec import ModeDecider

REF_DECAPP = Path("/tmp/refbin/SvtAv1DecApp")
needs_refdec = pytest.mark.skipif(not REF_DECAPP.exists(),
                                  reason="reference DecApp not built")

ALL_MODES = [P.DC_PRED, P.V_PRED, P.H_PRED, P.D45_PRED, P.D135_PRED,
             P.D113_PRED, P.D157_PRED, P.D203_PRED, P.D67_PRED,
             P.SMOOTH_PRED, P.SMOOTH_V_PRED, P.SMOOTH_H_PRED, P.PAETH_PRED]


def synthetic_clip(w, h, n, seed=0):
    rng = np.random.default_rng(seed)
    frames = []
    for i in range(n):
        yy, xx = np.mgrid[0:h, 0:w]
        y = (110 + 70 * np.sin(xx / 17 + i * 0.5) + 50 * np.cos(yy / 23 + i)
             + rng.integers(-10, 11, (h, w))).clip(0, 255).astype(np.uint8)
        u = (128 + 40 * np.sin(yy[:h // 2, :w // 2] / 9)).clip(0, 255).astype(np.uint8)
        v = (128 - 40 * np.cos(xx[:h // 2, :w // 2] / 13)).clip(0, 255).astype(np.uint8)
        frames.append((y, u, v))
    return frames


def ref_decode(path, w, h):
    env = dict(os.environ, LD_LIBRARY_PATH=str(REF_DECAPP.parent))
    out = str(path) + ".ref.yuv"
    r = subprocess.run([str(REF_DECAPP), "-i", str(path), "-o", out],
                       env=env, capture_output=True, timeout=120)
    assert Path(out).exists(), r.stderr.decode()[-500:]
    data = Path(out).read_bytes()
    fsz = w * h * 3 // 2
    frames = []
    for i in range(len(data) // fsz):
        off = i * fsz
        y = np.frombuffer(data[off:off + w * h], np.uint8).reshape(h, w)
        u = np.frombuffer(data[off + w * h:off + w * h + fsz // 6],
                          np.uint8).reshape(h // 2, w // 2)
        v = np.frombuffer(data[off + w * h + fsz // 6:off + fsz],
                          np.uint8).reshape(h // 2, w // 2)
        frames.append((y, u, v))
    return frames


def run_roundtrip(tmp_path, w, h, n_frames, qp, block_size, modes,
                  check_ref=True, seed=0):
    frames = synthetic_clip(w, h, n_frames, seed)
    cfg = EncoderConfig(source_width=w, source_height=h, qp=qp)
    path = tmp_path / f"clip_{w}x{h}_q{qp}_b{block_size}.ivf"
    recons = encode_ivf(frames, cfg, str(path),
                        ModeDecider(block_size=block_size, modes=modes))
    ours, _ = decode_ivf(str(path))
    assert len(ours) == n_frames
    for i, (o, r) in enumerate(zip(ours, recons)):
        for p in range(3):
            np.testing.assert_array_equal(o[p], r[p],
                                          err_msg=f"self frame {i} plane {p}")
    if check_ref and REF_DECAPP.exists():
        refs = ref_decode(path, w, h)
        assert len(refs) == n_frames
        for i, (o, r) in enumerate(zip(ours, refs)):
            for p in range(3):
                np.testing.assert_array_equal(
                    o[p], r[p], err_msg=f"ref frame {i} plane {p}")
    return frames, ours


def test_e2e_small_dc_only(tmp_path):
    run_roundtrip(tmp_path, 64, 64, 2, 40, 32, [P.DC_PRED], check_ref=False)


@needs_refdec
def test_e2e_conformance_64(tmp_path):
    run_roundtrip(tmp_path, 64, 64, 2, 40, 32, ALL_MODES)


@needs_refdec
def test_e2e_conformance_cif_partial_sbs(tmp_path):
    """352x288: fractional superblocks at right/bottom edges."""
    frames, ours = run_roundtrip(tmp_path, 352, 288, 2, 40, 32, ALL_MODES)
    # quality sanity: recon should track the source
    err = np.abs(ours[0][0].astype(int) - frames[0][0].astype(int)).mean()
    assert err < 8


@needs_refdec
def test_e2e_conformance_16x16_blocks_ext_tx(tmp_path):
    """16x16 partitions exercise ext-tx-type signaling."""
    run_roundtrip(tmp_path, 128, 128, 2, 35, 16, ALL_MODES)


@needs_refdec
def test_e2e_conformance_high_qp_skip(tmp_path):
    """qp 63 drives most blocks to skip."""
    run_roundtrip(tmp_path, 96, 64, 2, 63, 32, ALL_MODES)


@needs_refdec
def test_e2e_conformance_low_qp(tmp_path):
    run_roundtrip(tmp_path, 64, 96, 1, 8, 32, ALL_MODES)


@needs_refdec
def test_e2e_odd_sizes(tmp_path):
    """Dimensions not multiples of the block size."""
    run_roundtrip(tmp_path, 200, 120, 1, 40, 32, ALL_MODES)


# ---------------------------------------------------------------- inter ----

def moving_clip(w, h, n, seed=3):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    for i in range(n):
        y = (110 + 70 * np.sin((xx + 2.7 * i) / 17)
             + 50 * np.cos((yy + 1.3 * i) / 23)
             + rng.integers(-6, 7, (h, w))).clip(0, 255).astype(np.uint8)
        u = (128 + 40 * np.sin((yy[:h // 2, :w // 2] + i) / 9)).clip(0, 255).astype(np.uint8)
        v = (128 - 40 * np.cos((xx[:h // 2, :w // 2] + 2 * i) / 13)).clip(0, 255).astype(np.uint8)
        frames.append((y, u, v))
    return frames


def run_ipp(tmp_path, w, h, n, qp, check_ref=True, seed=3):
    frames = moving_clip(w, h, n, seed)
    cfg = EncoderConfig(source_width=w, source_height=h, qp=qp,
                        intra_period_length=-1, enc_mode=8)
    path = tmp_path / f"ipp_{w}x{h}_q{qp}.ivf"
    recons = encode_ivf(frames, cfg, str(path))
    ours, _ = decode_ivf(str(path))
    assert len(ours) == n
    for i, (o, r) in enumerate(zip(ours, recons)):
        for p in range(3):
            np.testing.assert_array_equal(o[p], r[p],
                                          err_msg=f"self frame {i} plane {p}")
    if check_ref and REF_DECAPP.exists():
        refs = ref_decode(path, w, h)
        assert len(refs) == n
        for i, (o, r) in enumerate(zip(ours, refs)):
            for p in range(3):
                np.testing.assert_array_equal(
                    o[p], r[p], err_msg=f"ref frame {i} plane {p}")
    return frames, ours


@needs_refdec
def test_e2e_conformance_small_blocks(tmp_path):
    """Fixed 8x8 and 16x16 partitions: partition signaling at every
    bsize down to 8 (and forced 4x4 boundary leaves)."""
    run_roundtrip(tmp_path, 120, 88, 1, 40, 8, ALL_MODES)
    run_roundtrip(tmp_path, 120, 88, 1, 40, 16, ALL_MODES)


@needs_refdec
@pytest.mark.parametrize("keyint", [-2, -1], ids=["allintra", "ipp"])
def test_e2e_partition_rd_conformance(tmp_path, keyint):
    """PartitionRdoDecider (preset<=4): variable NONE/SPLIT trees chosen
    by trial-coded RD must still produce conformant streams."""
    frames = moving_clip(128, 96, 3)
    cfg = EncoderConfig(source_width=128, source_height=96, qp=40,
                        intra_period_length=keyint, enc_mode=4)
    path = tmp_path / f"partrd_{keyint}.ivf"
    recons = encode_ivf(frames, cfg, str(path))
    ours, _ = decode_ivf(str(path))
    refs = ref_decode(path, 128, 96)
    assert len(ours) == len(refs) == 3
    for i in range(3):
        for p in range(3):
            np.testing.assert_array_equal(ours[i][p], recons[i][p])
            np.testing.assert_array_equal(ours[i][p], refs[i][p])


def tenbit_clip(w, h, n, seed=5):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    for i in range(n):
        y = (440 + 280 * np.sin((xx + 2.7 * i) / 17)
             + 200 * np.cos((yy + 1.3 * i) / 23)
             + rng.integers(-24, 25, (h, w))).clip(0, 1023).astype(np.uint16)
        u = (512 + 160 * np.sin((yy[:h // 2, :w // 2] + i) / 9)).clip(0, 1023).astype(np.uint16)
        v = (512 - 160 * np.cos((xx[:h // 2, :w // 2] + 2 * i) / 13)).clip(0, 1023).astype(np.uint16)
        frames.append((y, u, v))
    return frames


def ref_decode_10bit(path, w, h):
    env = dict(os.environ, LD_LIBRARY_PATH=str(REF_DECAPP.parent))
    out = str(path) + ".ref.yuv"
    r = subprocess.run([str(REF_DECAPP), "-i", str(path), "-o", out,
                        "-bit-depth", "10"],
                       env=env, capture_output=True, timeout=120)
    assert Path(out).exists(), r.stderr.decode()[-500:]
    data = Path(out).read_bytes()
    fsz = w * h * 3                      # 2 bytes/sample * 3/2 samples/px
    frames = []
    for i in range(len(data) // fsz):
        off = i * fsz
        y = np.frombuffer(data[off:off + w * h * 2], "<u2").reshape(h, w)
        u = np.frombuffer(data[off + w * h * 2:off + w * h * 2 + fsz // 6],
                          "<u2").reshape(h // 2, w // 2)
        v = np.frombuffer(data[off + w * h * 2 + fsz // 6:off + fsz],
                          "<u2").reshape(h // 2, w // 2)
        frames.append((y, u, v))
    return frames


@needs_refdec
@pytest.mark.parametrize("keyint", [-2, -1], ids=["allintra", "ipp"])
def test_e2e_10bit_conformance(tmp_path, keyint):
    """10-bit 4:2:0 streams (high_bitdepth sequence header) decode
    bit-exactly on the reference; reference EbAppMain.c 10-bit I/O."""
    w, h, n = 128, 96, 3
    frames = tenbit_clip(w, h, n)
    cfg = EncoderConfig(source_width=w, source_height=h, qp=40,
                        encoder_bit_depth=10, intra_period_length=keyint,
                        enc_mode=8)
    path = tmp_path / f"tenbit_{keyint}.ivf"
    recons = encode_ivf(frames, cfg, str(path))
    ours, _ = decode_ivf(str(path))
    refs = ref_decode_10bit(path, w, h)
    assert len(ours) == len(refs) == n
    for i in range(n):
        for p in range(3):
            np.testing.assert_array_equal(ours[i][p], recons[i][p])
            np.testing.assert_array_equal(ours[i][p], refs[i][p])


def test_ipp_selfconsistent(tmp_path):
    run_ipp(tmp_path, 64, 64, 3, 45, check_ref=False)


@needs_refdec
def test_ipp_conformance_small(tmp_path):
    run_ipp(tmp_path, 128, 96, 4, 45)


@needs_refdec
def test_ipp_conformance_cif(tmp_path):
    frames, ours = run_ipp(tmp_path, 352, 288, 4, 40)
    err = np.abs(ours[2][0].astype(int) - frames[2][0].astype(int)).mean()
    assert err < 8


@needs_refdec
def test_ipp_conformance_high_qp(tmp_path):
    run_ipp(tmp_path, 96, 96, 4, 60)


@needs_refdec
def test_ipp_conformance_keyint(tmp_path):
    """Periodic key frames between P frames."""
    frames = moving_clip(96, 64, 5)
    cfg = EncoderConfig(source_width=96, source_height=64, qp=45,
                        intra_period_length=1, enc_mode=8)
    path = tmp_path / "keyint.ivf"
    recons = encode_ivf(frames, cfg, str(path))
    ours, _ = decode_ivf(str(path))
    refs = ref_decode(path, 96, 64)
    for i in range(5):
        for p in range(3):
            np.testing.assert_array_equal(ours[i][p], refs[i][p])
            np.testing.assert_array_equal(ours[i][p], recons[i][p])


@needs_refdec
@pytest.mark.parametrize("qp", [20, 40])
def test_filter_intra_conformance(tmp_path, qp):
    """Filter-intra in key AND inter frames, incl. nonzero-residual FI
    blocks (exercises the fimode_to_intradir tx-type cdf context,
    EbCommonUtils.h:103 / EbDecParseBlock.c:1623)."""
    rng = np.random.default_rng(3)
    w, h = 176, 144
    base = rng.integers(0, 255, (h * 2, w * 2)).astype(np.uint8)
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    for i in range(5):
        y = (0.5 * np.roll(base, i, 1)[:h, :w]
             + 0.5 * (100 + 80 * np.sin(xx / 25 + i))
             ).clip(0, 255).astype(np.uint8)
        u = np.full((h // 2, w // 2), 120, np.uint8)
        v = np.full((h // 2, w // 2), 130, np.uint8)
        frames.append((y, u, v))
    cfg = EncoderConfig(source_width=w, source_height=h, qp=qp,
                        enc_mode=4, intra_period_length=3,
                        hierarchical_levels=2, filter_intra_level=1)
    path = tmp_path / "fi.ivf"
    encode_ivf(frames, cfg, str(path))
    ours, _ = decode_ivf(str(path))
    refs = ref_decode(path, w, h)
    for i, (o, r) in enumerate(zip(ours, refs)):
        for p in range(3):
            np.testing.assert_array_equal(o[p], r[p],
                                          err_msg=f"f{i} p{p}")
