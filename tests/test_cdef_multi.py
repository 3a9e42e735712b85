"""Multi-strength CDEF (cdef_bits > 0): per-64x64 preset indices.

Parity targets: finish_cdef_search / joint_strength_search_dual
(EbEncCdef.c:1140), read_cdef (EbDecParseBlock.c:332).
"""
import numpy as np
import pytest

from svt_av1_tpu.config import EncoderConfig
from svt_av1_tpu.ops import cdef as cdef_ops
from svt_av1_tpu.pipeline import frame_codec as fcmod

from test_e2e import REF_DECAPP, encode_ivf, decode_ivf, ref_decode


def _hetero_clip(w, h, n, seed=1):
    """Smooth gradient left, strong texture right: per-fb cdef winners
    differ, so the preset search pays for cdef_bits > 0."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    for i in range(n):
        y = (60 + xx // 3 + yy // 6).astype(np.int32)
        tex = (128 + 90 * np.sin(xx * 1.1) * np.cos(yy * 0.9)
               + rng.integers(-25, 26, (h, w))).astype(np.int32)
        y[:, w // 2:] = tex[:, w // 2:]
        y = np.roll(y, i * 2, axis=1)
        u = np.full((h // 2, w // 2), 120, np.uint8)
        v = np.full((h // 2, w // 2), 130, np.uint8)
        frames.append((np.clip(y, 0, 255).astype(np.uint8), u, v))
    return frames


def test_frame_multi_single_preset_matches_scalar():
    rng = np.random.default_rng(0)
    mi_r, mi_c = 36, 44
    fw, fh = mi_c * 4, mi_r * 4
    planes = [rng.integers(0, 255, (fh, fw)).astype(np.int32),
              rng.integers(0, 255, (fh // 2, fw // 2)).astype(np.int32),
              rng.integers(0, 255, (fh // 2, fw // 2)).astype(np.int32)]
    skips = np.zeros((mi_r, mi_c), np.int32)
    a = cdef_ops.cdef_frame(planes, skips, mi_r, mi_c, 25, 9, 3, 8)
    idx = np.zeros(((fh + 63) // 64, (fw + 63) // 64), np.int32)
    b = cdef_ops.cdef_frame_multi(planes, skips, mi_r, mi_c, (25,), (9,),
                                  idx, 3, 8)
    for x, y in zip(a, b):
        assert np.array_equal(np.asarray(x), np.asarray(y))


def test_joint_search_prefers_split_on_bimodal_mse():
    n_fb, nc = 24, 32
    my = np.full((n_fb, nc), 1e5)
    muv = np.zeros((n_fb, nc))
    # half the fbs want combo 3, the other half combo 17
    my[:12, 3] = 10.0
    my[12:, 17] = 10.0
    lev_y, lev_uv, tot = cdef_ops.joint_strength_search_dual(my, muv, 2)
    assert {int(lev_y[0]), int(lev_y[1])} == {3, 17}
    assert tot == pytest.approx(240.0)


@pytest.mark.parametrize("ipl", [0, -1])
def test_cdef_multi_e2e_conformant(tmp_path, ipl):
    w, h, n = 352, 288, 3
    frames = _hetero_clip(w, h, n)
    seen = []
    orig = fcmod.FrameCodec.search_and_apply_cdef_multi

    def spy(self, lam):
        got = orig(self, lam)
        seen.append(self.fh.cdef_bits)
        return got

    fcmod.FrameCodec.search_and_apply_cdef_multi = spy
    try:
        cfg = EncoderConfig(source_width=w, source_height=h, qp=50,
                            intra_period_length=ipl, enc_mode=5)
        path = str(tmp_path / "cm.ivf")
        recons = encode_ivf(frames, cfg, path)
        ours, _ = decode_ivf(path)
        for i, (a, b) in enumerate(zip(recons, ours)):
            for p in range(3):
                assert np.array_equal(a[p], b[p]), (i, p)
        assert max(seen) > 0, "search never chose cdef_bits > 0"
        if REF_DECAPP.exists():
            ref = ref_decode(path, w, h)
            for i, (a, b) in enumerate(zip(recons, ref)):
                for p in range(3):
                    assert np.array_equal(np.asarray(a[p]),
                                          np.asarray(b[p])), ("ref", i, p)
    finally:
        fcmod.FrameCodec.search_and_apply_cdef_multi = orig
