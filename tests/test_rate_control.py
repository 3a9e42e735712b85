"""Rate control: VBR accuracy + CQP ladder invariants (the analog of the
reference's RC behavior checks; rate_control_kernel
EbRateControlProcess.c:7175)."""
import os

import numpy as np
import pytest

from svt_av1_tpu.api import encode_ivf
from svt_av1_tpu.config import EncoderConfig, RateControlMode
from svt_av1_tpu.pipeline.rate_control import RateControl


def test_cqp_ladder_monotone_layers():
    cfg = EncoderConfig(source_width=64, source_height=64, qp=40)
    rc = RateControl(cfg, 30.0)
    qs = [rc.pick_qindex(False, layer) for layer in range(4)]
    assert qs == sorted(qs)
    assert rc.pick_qindex(True, 0) < qs[0]


def test_cqp_nonref_leaves_code_at_base():
    """Non-reference leaves take the base operating point exactly
    (cqp_qindex_calc_tpl_la: is_intrl_arf_boost requires
    is_used_as_reference_flag), never a finer chained qindex."""
    from svt_av1_tpu.bitstream.headers import QUANTIZER_TO_QINDEX
    cfg = EncoderConfig(source_width=64, source_height=64, qp=40)
    rc = RateControl(cfg, 30.0)
    base = QUANTIZER_TO_QINDEX[40]
    # simulate coded refs at boosted (lower) qindex
    rc.note_coded(0, base - 45, 0, True)
    rc.note_coded(2, base - 23, 1, False)
    leaf_q = rc.pick_qindex(False, 2, display=1, ref_displays=(0, 2),
                            n_deps=0)
    assert leaf_q == base
    # a referenced mid-layer frame still chains below base
    mid_q = rc.pick_qindex(False, 1, display=2, ref_displays=(0,),
                           n_deps=2)
    assert mid_q < base


def test_cqp_all_intra_uses_exact_qp():
    cfg = EncoderConfig(source_width=64, source_height=64, qp=40)
    rc = RateControl(cfg, 30.0, all_intra=True)
    from svt_av1_tpu.bitstream.headers import QUANTIZER_TO_QINDEX
    assert rc.pick_qindex(True, 0) == QUANTIZER_TO_QINDEX[40]


@pytest.mark.slow
@pytest.mark.parametrize("target", [200_000, 600_000])
def test_vbr_hits_target(tmp_path, target):
    # tolerance mirrors the reference's under/over_shoot_pct defaults (25%)
    rng = np.random.default_rng(3)
    w, h, n = 176, 144, 25
    frames = []
    for i in range(n):
        yy, xx = np.mgrid[0:h, 0:w]
        y = (120 + 60 * np.sin(xx / 13 + i * .4)
             + rng.integers(-15, 16, (h, w))).clip(0, 255).astype(np.uint8)
        u = np.full((h // 2, w // 2), 128, np.uint8)
        v = np.full((h // 2, w // 2), 128, np.uint8)
        frames.append((y, u, v))
    cfg = EncoderConfig(source_width=w, source_height=h, qp=40,
                        intra_period_length=-1, hierarchical_levels=2,
                        enc_mode=8, rate_control_mode=RateControlMode.VBR,
                        target_bit_rate=target, frame_rate=30)
    path = tmp_path / "vbr.ivf"
    encode_ivf(frames, cfg, str(path))
    kbps = os.path.getsize(path) * 8 * 30 / n
    assert abs(kbps - target) / target < 0.25, (kbps, target)


def test_two_pass_scene_change_and_weights():
    from svt_av1_tpu.pipeline.first_pass import (analyze_frame,
                                                 complexity_weights,
                                                 detect_scene_changes,
                                                 read_stats, write_stats)
    rng = np.random.default_rng(3)
    w, h = 176, 144
    yy, xx = np.mgrid[0:h, 0:w]
    stats, prev = [], None
    for i in range(12):
        if i < 6:
            y = (110 + 70 * np.sin(xx / 17 + i * 0.2)
                 + rng.integers(-8, 9, (h, w))).clip(0, 255).astype(np.uint8)
        else:
            y = (40 + 90 * np.cos(yy / 7 + i * 0.3)
                 + rng.integers(-8, 9, (h, w))).clip(0, 255).astype(np.uint8)
        stats.append(analyze_frame(y, prev))
        prev = y
    assert detect_scene_changes(stats) == [6]
    wts = complexity_weights(stats)
    assert abs(np.mean(wts) - 1.0) < 1e-9
    assert wts[6] > wts[3]               # cut frame costs more


def test_stats_roundtrip(tmp_path):
    from svt_av1_tpu.pipeline.first_pass import read_stats, write_stats
    stats = [{"intra": 5.0, "inter": 2.5}, {"intra": 7.1, "inter": 9.9}]
    p = str(tmp_path / "s.jsonl")
    write_stats(p, stats)
    assert read_stats(p) == stats


@pytest.mark.parametrize("mode", [RateControlMode.VBR,
                                  RateControlMode.CVBR])
@pytest.mark.slow
def test_three_scene_rate_accuracy(tmp_path, mode):
    """VBR/CVBR within +-10% of target across a 3-scene clip (the
    reference's under/over_shoot_pct defaults allow 25%)."""
    rng = np.random.default_rng(11)
    w, h, n = 176, 144, 30
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    for i in range(n):
        scene = i // 10
        if scene == 0:
            y = (110 + 70 * np.sin(xx / 17 + i * .2)).astype(np.float64)
        elif scene == 1:
            y = (60 + 90 * np.cos(yy / 5 + i * .4)
                 + rng.normal(0, 12, (h, w)))
        else:
            y = (140 + 50 * np.sin((xx + yy) / 11 + i * .1))
        frames.append(((y + rng.integers(-6, 7, (h, w))).clip(0, 255)
                       .astype(np.uint8),
                       np.full((h // 2, w // 2), 128, np.uint8),
                       np.full((h // 2, w // 2), 128, np.uint8)))
    target = 400_000
    cfg = EncoderConfig(source_width=w, source_height=h, qp=40,
                        intra_period_length=-1, hierarchical_levels=2,
                        rate_control_mode=mode, target_bit_rate=target,
                        frame_rate=30, under_shoot_pct=10,
                        over_shoot_pct=10)
    path = str(tmp_path / "rc3.ivf")
    encode_ivf(frames, cfg, path)
    import os
    realized = os.path.getsize(path) * 8 * 30 / n
    assert 0.90 * target < realized < 1.12 * target, realized
