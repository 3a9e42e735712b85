"""Configuration validation tests (analog of SvtAv1EncParamsTest.cc)."""
import pytest

from svt_av1_tpu.config import (
    ConfigError,
    EncoderConfig,
    RateControlMode,
    derive_signals,
)


def test_default_config_valid():
    cfg = EncoderConfig(source_width=352, source_height=288)
    assert cfg.sb_cols == 3 and cfg.sb_rows == 3
    assert cfg.mi_cols == 88 and cfg.mi_rows == 72


@pytest.mark.parametrize(
    "kwargs",
    [
        dict(enc_mode=9),
        dict(enc_mode=-3),
        dict(qp=64),
        dict(source_width=351, source_height=288),
        dict(source_width=352, source_height=287),
        dict(encoder_bit_depth=12),
        dict(super_block_size=32),
        dict(hierarchical_levels=6),
        dict(tile_columns=7),
        dict(min_qp_allowed=50, max_qp_allowed=10),
        dict(rate_control_mode=RateControlMode.VBR, target_bit_rate=0),
    ],
)
def test_invalid_configs_rejected(kwargs):
    base = dict(source_width=352, source_height=288)
    base.update(kwargs)
    with pytest.raises(ConfigError):
        EncoderConfig(**base)


def test_preset_ladder_monotone():
    """Faster presets must never enable more tools than slower ones."""
    prev = None
    for m in range(-2, 9):
        sig = derive_signals(EncoderConfig(enc_mode=m, source_width=64, source_height=64))
        if prev is not None:
            assert sig.md_stage_nics[0] <= prev.md_stage_nics[0]
        prev = sig


def test_signal_overrides():
    cfg = EncoderConfig(enc_mode=8, source_width=64, source_height=64,
                        enable_paeth=1, cdef_level=3)
    sig = derive_signals(cfg)
    assert sig.enable_paeth is True
    assert sig.cdef_level == 3


def test_api_surface():
    import numpy as np
    import pytest
    from svt_av1_tpu.api import (ApiError, Decoder, Encoder, ErrorCode)
    from svt_av1_tpu.config import EncoderConfig

    cfg = EncoderConfig(source_width=64, source_height=64, qp=40,
                        recon_enabled=True)
    enc = Encoder(cfg)
    hdr = enc.stream_header()
    assert hdr[:1] != b"" and len(hdr) > 4
    info = enc.get_stream_info()
    assert info["width"] == 64 and info["bit_depth"] == 8
    with pytest.raises(ApiError) as e:
        enc.get_recon(0)
    assert e.value.code == ErrorCode.NO_OUTPUT
    y = np.full((64, 64), 100, np.uint8)
    c = np.full((32, 32), 128, np.uint8)
    enc.send_picture((y, c, c))
    enc.flush()                      # one picture stays in flight
    rec = enc.get_recon(0)
    assert rec[0].shape == (64, 64)

    cfg2 = EncoderConfig(source_width=64, source_height=64, qp=40)
    with pytest.raises(ApiError):
        Encoder(cfg2).get_recon(0)

    dec = Decoder()
    with pytest.raises(ApiError):
        dec.get_stream_info()


def test_decoder_typed_errors():
    import pytest
    from svt_av1_tpu.api import ApiError, Decoder, ErrorCode

    dec = Decoder()
    with pytest.raises(ApiError) as e:
        dec.decode_frame(b"\x12\x00garbage-not-obus\xff\xff\xff")
    assert e.value.code in (ErrorCode.DECODE_ERROR,
                            ErrorCode.UNSUPPORTED_BITSTREAM)
