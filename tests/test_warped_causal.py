"""WARPED_CAUSAL local warp: motion_mode syntax + normative parameter
derivation from neighbour samples, conformant vs the reference decoder
(read_motion_mode / find_warp_samples / svt_find_projection)."""
import numpy as np
import pytest

from svt_av1_tpu.api import encode_ivf, decode_ivf
from svt_av1_tpu.config import EncoderConfig
from test_e2e import ref_decode, REF_DECAPP

needs_refdec = pytest.mark.skipif(not REF_DECAPP.exists(),
                                  reason="reference DecApp not built")


def _zoom_clip(w, h, n, seed=4):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 255, (h * 2, w * 2)).astype(np.float32)
    k = np.ones(3) / 3
    for ax in (0, 1):
        base = np.apply_along_axis(
            lambda r: np.convolve(r, k, mode="same"), ax, base)
    frames = []
    for i in range(n):
        s = 1.0 + 0.004 * i
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        ys = (yy - h / 2) / s + h / 2 + h / 2
        xs = (xx - w / 2) / s + w / 2 + w / 2
        y = base[np.clip(ys.astype(int), 0, 2 * h - 1),
                 np.clip(xs.astype(int), 0, 2 * w - 1)].astype(np.uint8)
        u = np.full((h // 2, w // 2), 120, np.uint8)
        v = np.full((h // 2, w // 2), 135, np.uint8)
        frames.append((y, u, v))
    return frames


@needs_refdec
def test_warped_causal_conformance(tmp_path):
    import svt_av1_tpu.pipeline.frame_codec as fc

    warped = [0]
    orig = fc.FrameCodec._code_motion_mode

    def cmm(self, decision, mi_row, mi_col, w4, h4, bw, bh):
        out = orig(self, decision, mi_row, mi_col, w4, h4, bw, bh)
        if not self.io.is_decoder and out == 2:
            warped[0] += 1
        return out

    fc.FrameCodec._code_motion_mode = cmm
    try:
        w, h = 176, 144
        frames = _zoom_clip(w, h, 4)
        cfg = EncoderConfig(source_width=w, source_height=h, qp=40,
                            enc_mode=5, intra_period_length=-1,
                            hierarchical_levels=0, pred_structure=2,
                            enable_global_motion=False)
        path = tmp_path / "wc.ivf"
        encode_ivf(frames, cfg, str(path))
    finally:
        fc.FrameCodec._code_motion_mode = orig
    assert warped[0] > 0, "no WARPED_CAUSAL blocks coded"
    ours, _ = decode_ivf(str(path))
    refs = ref_decode(path, w, h)
    for i, (o, r) in enumerate(zip(ours, refs)):
        for p in range(3):
            np.testing.assert_array_equal(o[p], r[p], err_msg=f"f{i} p{p}")


@needs_refdec
def test_obmc_conformance(tmp_path):
    """OBMC_CAUSAL overlapped prediction with divergent motion halves
    (dec_build_obmc_inter_predictors_sb parity)."""
    import svt_av1_tpu.pipeline.frame_codec as fc

    hist = {0: 0, 1: 0, 2: 0}
    orig = fc.FrameCodec._code_motion_mode

    def cmm(self, decision, mi_row, mi_col, w4, h4, bw, bh):
        out = orig(self, decision, mi_row, mi_col, w4, h4, bw, bh)
        if not self.io.is_decoder:
            hist[out] = hist.get(out, 0) + 1
        return out

    fc.FrameCodec._code_motion_mode = cmm
    try:
        rng = np.random.default_rng(8)
        h, w = 144, 176
        base = rng.integers(0, 255, (h * 2, w * 2)).astype(np.float32)
        k = np.ones(3) / 3
        for ax in (0, 1):
            base = np.apply_along_axis(
                lambda r: np.convolve(r, k, mode="same"), ax, base)
        frames = []
        for i in range(4):
            y = np.zeros((h, w), np.uint8)
            y[:h // 2] = base[20:20 + h // 2,
                              30 + 2 * i:30 + 2 * i + w].astype(np.uint8)
            y[h // 2:] = base[120:120 + h // 2,
                              60 - 2 * i:60 - 2 * i + w].astype(np.uint8)
            u = np.full((h // 2, w // 2), 120, np.uint8)
            v = np.full((h // 2, w // 2), 135, np.uint8)
            frames.append((y, u, v))
        cfg = EncoderConfig(source_width=w, source_height=h, qp=40,
                            enc_mode=5, intra_period_length=-1,
                            hierarchical_levels=0, pred_structure=2,
                            enable_global_motion=False)
        path = tmp_path / "ob.ivf"
        encode_ivf(frames, cfg, str(path))
    finally:
        fc.FrameCodec._code_motion_mode = orig
    assert hist[1] > 0, f"no OBMC blocks coded: {hist}"
    ours, _ = decode_ivf(str(path))
    refs = ref_decode(path, w, h)
    for i, (o, r) in enumerate(zip(ours, refs)):
        for p in range(3):
            np.testing.assert_array_equal(o[p], r[p], err_msg=f"f{i} p{p}")
