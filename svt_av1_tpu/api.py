"""Public encode/decode API.

The analog of the reference's C API surface (Source/API/EbSvtAv1Enc.h
svt_av1_enc_* / EbSvtAv1Dec.h svt_av1_dec_*): an Encoder accepting frames
and emitting OBU packets, and a Decoder mapping OBU payloads to pictures.

Current capability: all-intra CQP 8-bit 4:2:0 (BASELINE config[0] class);
each frame is a shown key frame (intra_period -2/CRA paths land here for
the all-intra configuration).
"""
from __future__ import annotations

import dataclasses
import hashlib

import numpy as np

from .bitstream.bits import BitWriter, BitReader
from .bitstream.headers import (FrameHeader, SequenceHeader,
                                QUANTIZER_TO_QINDEX, iter_obus,
                                parse_frame_header, parse_sequence_header,
                                temporal_delimiter_obu, wrap_obu,
                                write_frame_header, write_sequence_header)
from .config import EncoderConfig
from .constants import FrameType, ObuType
from .pipeline.frame_codec import FrameCodec, ModeDecider


class Encoder:
    """All-intra encoder: send_picture -> packets of OBU bytes."""

    def __init__(self, cfg: EncoderConfig, decider: ModeDecider | None = None):
        self.cfg = cfg
        if decider is None:
            # preset ladder: slower presets buy full-RD mode decision
            # (the reference's MD-stage funnel analog, pipeline/rdo.py)
            sig = __import__("svt_av1_tpu.config", fromlist=["derive_signals"]
                             ).derive_signals(cfg)
            if cfg.enc_mode <= 4:
                from .pipeline.rdo import PartitionRdoDecider
                decider = PartitionRdoDecider(
                    min_rd_bsize=8 if cfg.enc_mode <= 2 else 16,
                    n_full_rd=sig.md_stage_nics[2],
                    try_angle_delta=cfg.enc_mode <= 4)
            elif cfg.enc_mode <= 6:
                from .pipeline.rdo import RdoDecider
                decider = RdoDecider(n_full_rd=sig.md_stage_nics[2],
                                     try_angle_delta=False)
            else:
                decider = ModeDecider()
        self.decider = decider
        sig = __import__("svt_av1_tpu.config", fromlist=["derive_signals"]
                         ).derive_signals(cfg)
        self.seq = SequenceHeader(
            max_frame_width=cfg.source_width,
            max_frame_height=cfg.source_height,
            use_128x128_superblock=cfg.super_block_size == 128,
            bit_depth=cfg.encoder_bit_depth,
            enable_filter_intra=False,
            enable_intra_edge_filter=True,
            enable_cdef=sig.cdef_level > 0 and cfg.qp > 0,
        )
        self.frame_count = 0
        self.last_recon = None
        self._ref_planes = None          # DPB slot 0 (post-loop-filter)

    def _is_key_frame(self) -> bool:
        period = self.cfg.intra_period_length
        if self.frame_count == 0 or self._ref_planes is None:
            return True
        if period == -2:
            return True                  # all-intra (auto default for now)
        if period == -1:
            return False                 # single key frame then IPP
        return self.frame_count % (period + 1) == 0

    def _frame_header(self, is_key: bool) -> FrameHeader:
        from .ops.dlf import filter_levels_from_qindex

        qindex = QUANTIZER_TO_QINDEX[self.cfg.qp]
        # hbd loop-filter kernels pending: signal level 0 at 10-bit
        dlf_off = self.cfg.disable_dlf or self.cfg.encoder_bit_depth > 8
        lvl = 0 if dlf_off else filter_levels_from_qindex(
            qindex, self.cfg.encoder_bit_depth)
        return FrameHeader(
            frame_type=FrameType.KEY_FRAME if is_key else FrameType.INTER_FRAME,
            show_frame=True,
            frame_width=self.cfg.source_width,
            frame_height=self.cfg.source_height,
            base_q_idx=qindex,
            filter_level=(lvl, lvl),
            filter_level_uv=(lvl, lvl),
            # damping ramps with q like the reference search seed
            # (EbCdefProcess.c: 3 + (base_q_idx >> 6))
            cdef_damping=min(3 + (qindex >> 6), 6),
        )

    def encode_frame(self, planes) -> bytes:
        """Encode one (y, u, v) frame; returns the temporal unit bytes
        (TD + [sequence header] + frame OBU)."""
        is_key = self._is_key_frame()
        fh = self._frame_header(is_key)
        codec = FrameCodec(self.seq, fh, source_planes=planes,
                           refs=None if is_key else [self._ref_planes])
        tile_data = codec.encode_tile(self.decider)
        codec.apply_loop_filter()
        codec.search_cdef()
        codec.apply_cdef()
        self.last_recon = codec.cropped_recon()
        # DPB stores the VISIBLE picture: the spec's MC edge semantics
        # replicate from the visible frame edge, not the coded overhang
        self._ref_planes = [p.astype(np.int32) for p in self.last_recon]

        w = BitWriter()
        write_frame_header(w, self.seq, fh)
        w.byte_align()
        frame_payload = w.bytes() + tile_data

        out = temporal_delimiter_obu()
        if self.frame_count == 0:
            out += wrap_obu(ObuType.OBU_SEQUENCE_HEADER,
                            write_sequence_header(self.seq))
        out += wrap_obu(ObuType.OBU_FRAME, frame_payload)
        self.frame_count += 1
        return out


class Decoder:
    """All-intra decoder: OBU payloads -> pictures."""

    def __init__(self):
        self.seq: SequenceHeader | None = None
        self.md5 = hashlib.md5()
        self._ref_planes = None

    def decode_frame(self, data: bytes):
        """Decode one temporal unit; returns (y, u, v) planes or None."""
        planes = None
        for obu_type, payload in iter_obus(data):
            if obu_type == ObuType.OBU_TEMPORAL_DELIMITER:
                continue
            if obu_type == ObuType.OBU_SEQUENCE_HEADER:
                self.seq = parse_sequence_header(payload)
            elif obu_type == ObuType.OBU_FRAME:
                planes = self._decode_frame_obu(payload)
            elif obu_type == ObuType.OBU_FRAME_HEADER:
                raise NotImplementedError("separate frame header OBUs")
        return planes

    def _decode_frame_obu(self, payload: bytes):
        assert self.seq is not None, "no sequence header seen"
        r = BitReader(payload)
        fh = parse_frame_header(r, self.seq)
        tile_data = payload[r.byte_pos:]
        is_key = fh.frame_type == FrameType.KEY_FRAME
        codec = FrameCodec(self.seq, fh,
                           refs=None if is_key else [self._ref_planes])
        codec.decode_tile(tile_data)
        codec.apply_loop_filter()
        codec.apply_cdef()
        planes = codec.cropped_recon()
        self._ref_planes = [p.astype(np.int32) for p in planes]
        for p in planes:
            self.md5.update(np.ascontiguousarray(p).tobytes())
        return planes


def encode_ivf(frames, cfg: EncoderConfig, path: str,
               decider: ModeDecider | None = None) -> list[bytes]:
    """Convenience: encode frames to an IVF file; returns recon frames."""
    from fractions import Fraction

    from .io import IvfWriter

    enc = Encoder(cfg, decider)
    recons = []
    with IvfWriter(path, cfg.source_width, cfg.source_height,
                   cfg.frame_rate) as w:
        for i, planes in enumerate(frames):
            payload = enc.encode_frame(planes)
            w.write_frame(payload, pts=i)
            recons.append(enc.last_recon)
    return recons


def decode_ivf(path: str):
    """Decode an IVF file; returns (frames, md5hex)."""
    from .io import IvfReader

    dec = Decoder()
    frames = []
    r = IvfReader(path)
    for payload, _pts in r:
        planes = dec.decode_frame(payload)
        if planes is not None:
            frames.append(planes)
    r.close()
    return frames, dec.md5.hexdigest()
