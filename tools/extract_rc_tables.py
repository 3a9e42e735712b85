#!/usr/bin/env python
"""Extract the reference encoder's rate-control calibration curves.

The kf/arf "minq" ladders (EbRateControlProcess.c:4928-5280) are
libaom-derived calibration data: for each worst-quality qindex they give
the lowest qindex a boosted key/golden frame may use.  They are tuning
curves (generated offline from quantizer-step polynomials), not code —
extracted here as data like the spec tables in extract_ref_tables.py.

Run:  python tools/extract_rc_tables.py
Writes svt_av1_tpu/pipeline/data/rc_tables.npz.
"""
from __future__ import annotations

import re
from pathlib import Path

import numpy as np

REF = Path("/root/reference/Source/Lib/Encoder/Codec/EbRateControlProcess.c")
OUT = Path(__file__).resolve().parent.parent / "svt_av1_tpu" / "pipeline" \
    / "data" / "rc_tables.npz"

NAMES = [
    "kf_low_motion_minq_cqp_8", "kf_low_motion_minq_cqp_10",
    "kf_high_motion_minq_cqp_8", "kf_high_motion_minq_cqp_10",
    "kf_high_motion_minq_8", "kf_high_motion_minq_10",
    "arfgf_low_motion_minq_8", "arfgf_low_motion_minq_10",
    "arfgf_high_motion_minq_8", "arfgf_high_motion_minq_10",
    "inter_minq_8", "inter_minq_10",
]


def main():
    text = REF.read_text()
    text = re.sub(r"/\*.*?\*/", " ", text, flags=re.S)
    text = re.sub(r"//[^\n]*", " ", text)
    tables = {}
    for name in NAMES:
        m = re.search(rf"static int {name}\[QINDEX_RANGE\]\s*=\s*\{{(.*?)\}};",
                      text, re.S)
        assert m, name
        vals = [int(v) for v in re.findall(r"-?\d+", m.group(1))]
        assert len(vals) == 256, (name, len(vals))
        tables[name] = np.array(vals, np.int32)
    OUT.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(OUT, **tables)
    print(f"wrote {len(tables)} tables -> {OUT}")


if __name__ == "__main__":
    main()
