"""Open-loop ME + cross-frame prefetch determinism.

The batched plan at the fastest preset MEs against reference SOURCES
(the reference's open-loop ME process, EbMotionEstimationProcess.c), so
the next frame's plan can run while the host codes the current one.
The bitstream must be byte-identical whether the prefetch fires, misses,
or is disabled — the plan inputs are the same either way.
"""
import numpy as np

from svt_av1_tpu.api import Encoder
from svt_av1_tpu.config import EncoderConfig
from svt_av1_tpu.pipeline.batched_inter import BatchedDecider

from test_interp_filter import moving_clip


def _encode(frames, w, h, disable_prefetch=False, monkeypatch=None):
    cfg = EncoderConfig(source_width=w, source_height=h, qp=40,
                        enc_mode=8, intra_period_length=len(frames))
    enc = Encoder(cfg)
    if disable_prefetch:
        enc._maybe_prefetch_inter = lambda job, nxt, fh, planes: None
    out = b""
    for f in frames:
        for p in enc.send_picture(f):
            out += p
    for p in enc.flush():
        out += p
    return out


def test_prefetch_matches_inline():
    frames = moving_clip(192, 128, 8)
    a = _encode(frames, 192, 128, disable_prefetch=False)
    b = _encode(frames, 192, 128, disable_prefetch=True)
    assert a == b


def test_prefetch_fires(monkeypatch):
    """The prefetch path is actually exercised (at least one submit and
    one hit) on a plain low-delay run."""
    hits = {"submit": 0, "hit": 0}
    orig_submit = BatchedDecider.prefetch_inter
    orig_take = BatchedDecider._take_prefetched_inter

    def submit(self, *a, **k):
        hits["submit"] += 1
        return orig_submit(self, *a, **k)

    def take(self, codec, key):
        got = orig_take(self, codec, key)
        if got is not None:
            hits["hit"] += 1
        return got

    monkeypatch.setattr(BatchedDecider, "prefetch_inter", submit)
    monkeypatch.setattr(BatchedDecider, "_take_prefetched_inter", take)
    frames = moving_clip(192, 128, 8)
    _encode(frames, 192, 128)
    assert hits["submit"] > 0
    assert hits["hit"] > 0
