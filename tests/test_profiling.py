"""Tracing/profiling subsystem: SVT_LOG analog + per-stage latency
report (svt_log.c; EncApp --enable-stat-report)."""
import io

import numpy as np

from svt_av1_tpu import profiling as pr
from svt_av1_tpu.api import Encoder
from svt_av1_tpu.config import EncoderConfig


def test_svt_log_levels_and_formatting():
    buf = io.StringIO()
    lg = pr.SvtLog(level=pr.LOG_WARN, stream=buf)
    lg.debug("no")
    lg.info("no")
    lg.warn("w %d", 7)
    lg.error("e %s", "x")
    assert buf.getvalue() == "Svt[warn]: w 7\nSvt[error]: e x\n"


def test_svt_log_env_default(monkeypatch):
    monkeypatch.setenv("SVT_LOG", "3")
    assert pr.SvtLog().level == pr.LOG_ERROR
    monkeypatch.setenv("SVT_LOG", "bogus")
    assert pr.SvtLog().level == pr.LOG_INFO


def test_stage_timer_report():
    t = pr.StageTimer()
    with t("a"):
        pass
    with t("a"):
        pass
    t.add("b", 0.25)
    rep = t.report(n_frames=2)
    assert rep["a"]["calls"] == 2
    assert rep["b"]["ms_total"] == 250.0
    assert rep["b"]["ms_per_frame"] == 125.0
    assert rep["_wall"]["fps"] > 0
    txt = t.format_report(2)
    assert "b" in txt and "ms/frame" in txt and "fps" in txt


def test_encoder_perf_report_covers_pipeline_stages():
    rng = np.random.default_rng(0)
    frames = [(rng.integers(0, 255, (64, 128), dtype=np.uint8),
               np.full((32, 64), 120, np.uint8),
               np.full((32, 64), 130, np.uint8)) for _ in range(4)]
    enc = Encoder(EncoderConfig(source_width=128, source_height=64,
                                qp=40, intra_period_length=2))
    for f in frames:
        enc.send_picture(f)
    enc.flush()
    rep = enc.perf_report()
    for stage in ("encode_tiles", "dlf_cdef", "packetize",
                  "temporal_filter"):
        assert stage in rep, rep.keys()
    assert rep["encode_tiles"]["ms_total"] > 0
    assert rep["encode_tiles"]["calls"] == 4
    assert rep["_wall"]["fps"] > 0
