"""Rate control: picture-level qindex selection and bit-budget tracking.

The analog of the reference's rate_control_kernel
(EbRateControlProcess.c:7175): mode 0 CQP with a per-layer qindex ladder
(cqp path), mode 1/2 VBR/CVBR with a buffer model adapting qindex from
realized vs target bits (the reference uses libaom-style GF-group budgets,
pass2_strategy.c; here a single-pass leaky-bucket controller over
mini-GOPs with per-layer spread).

No bitstream coupling beyond base_q_idx: the controller runs entirely in
the host orchestration layer and consumes packet sizes as feedback, like
the reference's packetization -> RC feedback port (EbEncHandle.c:673).
"""
from __future__ import annotations

import dataclasses

import numpy as np

from ..bitstream.headers import QUANTIZER_TO_QINDEX
from ..config import EncoderConfig, RateControlMode

# per-layer qindex offsets relative to the picture-type base
KEY_OFFSET = -12
LAYER_OFFSETS = (-8, 8, 14, 18, 22, 24)


def _qp_to_qindex(qp: float) -> int:
    qp = float(np.clip(qp, 0, 63))
    lo = int(qp)
    hi = min(lo + 1, 63)
    frac = qp - lo
    v = (1 - frac) * QUANTIZER_TO_QINDEX[lo] + frac * QUANTIZER_TO_QINDEX[hi]
    return int(np.clip(round(v), 1, 255))


@dataclasses.dataclass
class RcState:
    bits_spent: int = 0
    frames_done: int = 0
    qp: float = 32.0               # running operating point (qp domain)


class RateControl:
    """Picture-level rate controller."""

    def __init__(self, cfg: EncoderConfig, fps: float,
                 all_intra: bool = False):
        self.tpl_offsets = {}
        self.cfg = cfg
        self.mode = cfg.rate_control_mode
        self.all_intra = all_intra
        self.fps = max(fps, 1e-6)
        self.target_bpf = cfg.target_bit_rate / self.fps
        qp0 = float(cfg.qp if cfg.qp else 40)
        if self.mode != RateControlMode.CQP:
            # seed the operating point from bits-per-pixel (the analog of
            # the reference's active-worst-quality estimate)
            bpp = self.target_bpf / max(cfg.source_width *
                                        cfg.source_height, 1)
            qp0 = 32.5 - 5.0 * np.log2(max(bpp, 1e-4) / 0.1)
            qp0 = float(np.clip(qp0, cfg.min_qp_allowed, cfg.max_qp_allowed))
        self.state = RcState(qp=qp0)
        self.ema_bits = None           # recent realized bits/frame
        self.weights = None            # per-display 2-pass weights
        # leaky-bucket fullness in bits (positive = under budget)
        self.fullness = 0.0
        # CVBR runs a tighter (decoder-buffer) window; vbv_bufsize
        # overrides both (EbRateControlProcess.c buffer semantics)
        if cfg.vbv_bufsize > 0:
            self.buffer_size = cfg.vbv_bufsize
        elif self.mode == RateControlMode.CVBR:
            self.buffer_size = cfg.target_bit_rate // 2
        else:
            self.buffer_size = cfg.target_bit_rate      # ~1s window
        # allowed deviation band before corrective pressure ramps up
        shoot = max(cfg.under_shoot_pct, cfg.over_shoot_pct)
        self.band = max(self.buffer_size * shoot / 100.0, 1.0)

    # -- qindex selection ---------------------------------------------------

    tpl_offsets: dict

    def peek_qindex(self, is_key: bool, layer: int,
                    display: int | None = None):
        """Side-effect-free qindex prediction for pipeline prefetch;
        None when the mode's qindex depends on yet-unknown feedback."""
        if self.mode == RateControlMode.CQP:
            return self.pick_qindex(is_key, layer, display)
        return None

    def pick_qindex(self, is_key: bool, layer: int,
                    display: int | None = None) -> int:
        if self.mode == RateControlMode.CQP:
            base = QUANTIZER_TO_QINDEX[self.cfg.qp]
            if base == 0 or self.all_intra:
                return base
            if is_key:
                off = KEY_OFFSET
            else:
                off = LAYER_OFFSETS[min(layer, 5)]
                # TPL modulation (cqp_qindex_calc_tpl_la analog): the
                # propagated dependency boost deepens the ladder for
                # heavily-referenced frames; leaves stay put
                off += self.tpl_offsets.get(display, 0)
            return int(np.clip(base + off, 1, 255))
        # VBR/CVBR: operating qp adjusted by buffer fullness; the
        # correction stays gentle inside the configured shoot band and
        # ramps up quadratically beyond it (under/over_shoot_pct
        # honored; the reference clamps per-frame deviation similarly)
        qp = self.state.qp
        err = -self.fullness
        band_err = err / self.band
        qp += 5.0 * band_err + 8.0 * np.sign(band_err) * max(
            abs(band_err) - 1.0, 0.0)
        qp = float(np.clip(qp, self.cfg.min_qp_allowed,
                           self.cfg.max_qp_allowed))
        base = _qp_to_qindex(qp)
        off = KEY_OFFSET * 2 if is_key else LAYER_OFFSETS[min(layer, 5)]
        if self.weights is not None and display is not None \
                and display < len(self.weights):
            # 2-pass GOP allocation: easy frames (weight < 1) ride at
            # higher q, hard frames get budget (pass2_strategy.c's
            # GF-group boost shape, folded into the qindex domain)
            off += int(np.clip(round(-10 * np.log2(
                max(self.weights[display], 1e-3))), -24, 24))
        lo = QUANTIZER_TO_QINDEX[self.cfg.min_qp_allowed]
        hi = QUANTIZER_TO_QINDEX[self.cfg.max_qp_allowed]
        return int(np.clip(base + off, max(lo, 1), max(hi, 1)))

    # -- feedback ------------------------------------------------------------

    def update(self, is_key: bool, layer: int, bits: int) -> None:
        if self.mode == RateControlMode.CQP:
            return
        st = self.state
        st.bits_spent += bits
        st.frames_done += 1
        self.fullness += self.target_bpf - bits
        self.fullness = float(np.clip(self.fullness, -self.buffer_size,
                                      self.buffer_size))
        # EMA of realized bits drives a log-ratio trim of the operating
        # point (keyframes/alt-refs intentionally overshoot; the EMA
        # absorbs the spread across a GOP)
        a = 0.3
        self.ema_bits = bits if self.ema_bits is None else \
            (1 - a) * self.ema_bits + a * bits
        ratio = self.ema_bits / max(self.target_bpf, 1.0)
        step = float(np.clip(1.8 * np.log2(max(ratio, 1e-3)), -3.5, 3.5))
        st.qp = float(np.clip(st.qp + step, self.cfg.min_qp_allowed,
                              self.cfg.max_qp_allowed))
