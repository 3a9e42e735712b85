"""Masked compound (wedge/diffwtd) + inter-intra conformance.

Forces each tool onto eligible blocks of an RA GOP at a quality preset
(seq flags on below enc_mode 5), then checks: our decoder reproduces
the encoder's recon bit-exactly AND the reference SvtAv1DecApp decodes
the stream to the same pictures.  Reference semantics:
EbInterPrediction.c svt_av1_init_wedge_masks / combine_interintra /
build_masked_compound_no_round; syntax EbEntropyCoding.c:5896-6010.
"""
import numpy as np
import pytest

from svt_av1_tpu.api import decode_ivf, encode_ivf
from svt_av1_tpu.config import EncoderConfig
from svt_av1_tpu.ops import masks as mk
from svt_av1_tpu.pipeline.frame_codec import ModeDecider

from test_e2e import REF_DECAPP, ref_decode
from test_interp_filter import moving_clip

W, H, N = 128, 96, 5


def _force(kind):
    """Wrap decide_inter to impose one masked tool on eligible wins."""
    orig = ModeDecider.decide_inter
    count = {"n": 0}

    def run(self, codec, x, y, bw, bh, mi_row, mi_col, w4, h4=None):
        d = orig(self, codec, x, y, bw, bh, mi_row, mi_col, w4, h4)
        if not d.is_inter:
            return d
        if kind in ("wedge", "diffwtd") and d.ref1 > 0 \
                and d.motion_mode == 0:
            if kind == "wedge" and mk.wedge_used(bw, bh):
                d.compound_type = 1
                d.wedge_index = (x // bw + y // bh) % 16
                d.wedge_sign = (x // bw) & 1
                count["n"] += 1
            elif kind == "diffwtd":
                d.compound_type = 2
                d.mask_type = (y // bh) & 1
                count["n"] += 1
        if kind == "interintra" and d.ref1 == 0 and not d.use_intrabc \
                and 8 <= bw <= 32 and 8 <= bh <= 32 \
                and (bw, bh) not in ((8, 32), (32, 8)) \
                and d.inter_mode <= 16:     # single inter modes only
            d.interintra = True
            d.interintra_mode = (x // bw) % 4
            if mk.wedge_used(bw, bh) and (y // bh) & 1:
                d.wedge_interintra = True
                d.interintra_wedge_index = (x // bw) % 16
            d.motion_mode = 0
            count["n"] += 1
        return d

    return run, count


@pytest.mark.parametrize("kind", ["wedge", "diffwtd", "interintra"])
def test_forced_tool_roundtrip(tmp_path, monkeypatch, kind):
    run, count = _force(kind)
    monkeypatch.setattr(ModeDecider, "decide_inter", run)
    frames = moving_clip(W, H, N)
    cfg = EncoderConfig(source_width=W, source_height=H, qp=40,
                        enc_mode=4, intra_period_length=N)
    path = tmp_path / f"{kind}.ivf"
    recons = encode_ivf(frames, cfg, str(path))
    assert count["n"] > 0, f"no {kind} blocks were coded"
    ours, _ = decode_ivf(str(path))
    for i, (o, r) in enumerate(zip(ours, recons)):
        for p in range(3):
            np.testing.assert_array_equal(o[p], r[p],
                                          err_msg=f"frame {i} plane {p}")
    if REF_DECAPP.exists():
        refs = ref_decode(path, W, H)
        for i, (o, r) in enumerate(zip(ours, refs)):
            for p in range(3):
                np.testing.assert_array_equal(
                    o[p], r[p], err_msg=f"ref frame {i} plane {p}")


def test_auto_trials_roundtrip(tmp_path):
    """The unforced searches run (masked compound + interintra trials
    fire where they win) and the stream stays conformant."""
    frames = moving_clip(W, H, N, seed=9)
    cfg = EncoderConfig(source_width=W, source_height=H, qp=45,
                        enc_mode=4, intra_period_length=N)
    path = tmp_path / "auto.ivf"
    recons = encode_ivf(frames, cfg, str(path))
    ours, _ = decode_ivf(str(path))
    for i, (o, r) in enumerate(zip(ours, recons)):
        for p in range(3):
            np.testing.assert_array_equal(o[p], r[p],
                                          err_msg=f"frame {i} plane {p}")
    if REF_DECAPP.exists():
        refs = ref_decode(path, W, H)
        for i, (o, r) in enumerate(zip(ours, refs)):
            for p in range(3):
                np.testing.assert_array_equal(
                    o[p], r[p], err_msg=f"ref frame {i} plane {p}")
