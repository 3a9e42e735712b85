#!/usr/bin/env python
"""Extract spec-mandated AV1 constant tables from the reference tree.

The AV1 bitstream specification fixes large numeric tables (default CDF
probability models, quantizer step lookups, coefficient scan orders).
Every conformant implementation ships byte-identical copies of these
constants; they are data, not design.  This tool parses them out of the
reference sources (/root/reference, read-only) into
``svt_av1_tpu/entropy/data/av1_tables.npz`` so the codebase itself carries
no transcribed C.

CDF tables are stored in AOM "inverse CDF" layout with a trailing
adaptation counter (see svt_av1_tpu/entropy/ec.py).

Run:  python tools/extract_ref_tables.py
"""
from __future__ import annotations

import re
import sys
from pathlib import Path

import numpy as np

REF = Path("/root/reference/Source/Lib/Common/Codec")
OUT = Path(__file__).resolve().parent.parent / "svt_av1_tpu" / "entropy" / "data" / "av1_tables.npz"

_CDF_CALL = re.compile(r"AOM_CDF(\d+)\s*\(")
_DECL = re.compile(
    r"(?:static\s+)?(?:const\s+)?(?:DECLARE_ALIGNED\s*\(\s*\d+\s*,\s*)?"
    r"(?:static\s+)?(?:const\s+)?(AomCdfProb|InterpKernel|int16_t|int32_t|uint16_t|uint8_t|int8_t|int)\s*,?\s*"
    r"(\w+)\s*((?:\[[^\]]*\]\s*)+)\)?\s*=\s*\{",
    re.S,
)


def _strip_comments(text: str) -> str:
    text = re.sub(r"/\*.*?\*/", " ", text, flags=re.S)
    text = re.sub(r"//[^\n]*", " ", text)
    return text


def _expand_cdf_macros(body: str) -> str:
    """AOM_CDFn(a0..an-2) -> (32768-a0), ..., (32768-an-2), 0, 0"""
    while True:
        m = _CDF_CALL.search(body)
        if not m:
            return body
        n = int(m.group(1))
        # find matching close paren
        depth = 1
        i = m.end()
        while depth:
            if body[i] == "(":
                depth += 1
            elif body[i] == ")":
                depth -= 1
            i += 1
        args = body[m.end():i - 1]
        vals = [a.strip() for a in args.split(",")]
        assert len(vals) == n - 1, (n, vals)
        repl = ", ".join(f"(32768 - ({v}))" for v in vals) + ", 0, 0"
        body = body[:m.start()] + repl + body[i:]


def _parse_braces(body: str):
    """Parse a C brace initializer into nested python lists of ints."""
    pos = 0

    def parse_group():
        nonlocal pos
        assert body[pos] == "{"
        pos += 1
        items = []
        buf = ""

        def flush():
            nonlocal buf
            s = buf.strip()
            buf = ""
            if s:
                items.append(int(eval(s, {"__builtins__": {}})))

        while True:
            ch = body[pos]
            if ch == "{":
                flush()
                items.append(parse_group())
            elif ch == "}":
                flush()
                pos += 1
                return items
            elif ch == ",":
                flush()
                pos += 1
            else:
                buf += ch
                pos += 1

    start = body.index("{")
    pos = start
    return parse_group()


def _leaf_width(nested) -> int:
    if nested and isinstance(nested[0], list):
        return max(_leaf_width(x) for x in nested)
    return len(nested)


def _pad_leaves(nested, width: int):
    if nested and isinstance(nested[0], list):
        for x in nested:
            _pad_leaves(x, width)
    else:
        nested.extend([0] * (width - len(nested)))
    return nested


def _pad_ragged(nested):
    """Zero-pad ragged innermost lists to the table-wide max length,
    matching C's zero-fill of partially initialized rows (e.g. partition
    CDFs where boundary contexts have fewer symbols than the bound)."""
    if not isinstance(nested, list):
        return nested
    return _pad_leaves(nested, _leaf_width(nested))


def _to_array(nested, name: str) -> np.ndarray:
    arr = np.array(_pad_ragged(nested), dtype=np.int64)
    if arr.dtype == object:
        raise ValueError(f"{name}: ragged initializer")
    return arr


def extract_tables(path: Path, names: set[str] | None = None) -> dict[str, np.ndarray]:
    text = _strip_comments(path.read_text())
    out = {}
    for m in _DECL.finditer(text):
        ctype, name, _dims = m.group(1), m.group(2), m.group(3)
        if names is not None and name not in names:
            continue
        # capture initializer body up to matching closing brace + ';'
        depth = 1
        i = m.end()
        while depth:
            if text[i] == "{":
                depth += 1
            elif text[i] == "}":
                depth -= 1
            i += 1
        body = text[m.end() - 1:i]
        body = _expand_cdf_macros(body)
        try:
            nested = _parse_braces(body)
            arr = _to_array(nested, name)
        except Exception as e:  # ragged or non-numeric: skip
            print(f"  skip {name}: {e}", file=sys.stderr)
            continue
        dtype = np.uint16 if ctype in ("AomCdfProb", "uint16_t") else np.int32
        if ctype in ("int16_t", "InterpKernel"):
            dtype = np.int16
        elif ctype == "int8_t":
            dtype = np.int8
        out[name] = arr.astype(dtype)
    return out


def main():
    tables: dict[str, np.ndarray] = {}

    print("extracting default CDFs from EbCabacContextModel.c")
    tables.update(extract_tables(REF / "EbCabacContextModel.c"))

    print("extracting scan orders from EbCoefficients.h")
    tables.update(extract_tables(REF / "EbCoefficients.h"))

    print("extracting quantizer lookups from EbInvTransforms.c")
    tables.update(extract_tables(
        REF / "EbInvTransforms.c",
        {"dc_qlookup_q3", "dc_qlookup_10_q3", "dc_qlookup_12_q3",
         "ac_qlookup_q3", "ac_qlookup_10_q3", "ac_qlookup_12_q3"}))

    print("extracting intra tables from EbIntraPrediction.c")
    tables.update(extract_tables(
        REF / "EbIntraPrediction.c",
        {"sm_weight_arrays", "eb_dr_intra_derivative"}))
    # top-right / bottom-left availability bit tables (spec z-scan order)
    intra_text = (REF / "EbIntraPrediction.c").read_text()
    has_names = set(re.findall(r"(has_(?:tr|bl)(?:_vert)?_\w+)\s*\[", intra_text))
    has_names = {n for n in has_names if not n.endswith("_tables")}
    tables.update(extract_tables(REF / "EbIntraPrediction.c", has_names))
    intra_taps = extract_tables(
        REF.parent.parent / "Common" / "C_DEFAULT" / "filterintra_c.c",
        {"eb_av1_filter_intra_taps"})
    if not intra_taps:  # taps table may live elsewhere
        for cand in (REF / "EbIntraPrediction.c",
                     REF.parent.parent / "Common" / "C_DEFAULT" / "filterintra_c.c"):
            intra_taps = extract_tables(cand, {"eb_av1_filter_intra_taps"})
            if intra_taps:
                break
    tables.update(intra_taps)

    print("extracting interp filter kernels from EbInterPrediction.c")
    tables.update(extract_tables(
        REF / "EbInterPrediction.c",
        {"sub_pel_filters_8", "sub_pel_filters_4", "sub_pel_filters_8sharp",
         "sub_pel_filters_8smooth", "bilinear_filters",
         "sub_pel_filters_4smooth"}))

    print("extracting obmc masks from EbInterPrediction.c")
    tables.update(extract_tables(
        REF / "EbInterPrediction.c",
        {"obmc_mask_1", "obmc_mask_2", "obmc_mask_4", "obmc_mask_8",
         "obmc_mask_16", "obmc_mask_32", "obmc_mask_64"}))

    print("extracting warped motion tables from EbWarpedMotion.c")
    tables.update(extract_tables(
        REF / "EbWarpedMotion.c", {"div_lut"}))
    # eb_warped_filter's body has preprocessor branches; keep the
    # WARPEDPIXEL_PREC_BITS == 6 branch (the build default)
    wm_text = (REF / "EbWarpedMotion.c").read_text()
    m = re.search(r"eb_warped_filter\[[^\]]*\]\[8\]\s*=\s*\{.*?"
                  r"#if WARPEDPIXEL_PREC_BITS == 6(.*?)#elif",
                  wm_text, re.S)
    body6 = _strip_comments(m.group(1)).replace("- ", "-")
    nums = [int(v) for v in re.findall(r"-?\d+", body6)]
    assert len(nums) == 193 * 8, len(nums)
    tables["eb_warped_filter"] = np.array(nums, np.int16).reshape(193, 8)

    OUT.parent.mkdir(parents=True, exist_ok=True)
    print("extracting film grain gaussian sequence from grainSynthesis.c")
    tables.update(extract_tables(
        REF / "grainSynthesis.c", {"gaussian_sequence"}))

    print("extracting superres upscale filters from EbSuperRes.h")
    sr_text = (REF / "EbSuperRes.h").read_text()
    m = re.search(r"av1_resize_filter_normative[^=]*=\s*\{(.*?)\n\};",
                  sr_text, re.S)
    body = re.sub(r"#[^\n]*", "", m.group(1))
    nums = [int(v) for v in re.findall(r"-?\d+", body)]
    assert len(nums) == 64 * 8, len(nums)
    tables["av1_resize_filter_normative"] = \
        np.array(nums, np.int16).reshape(64, 8)

    print("extracting self-guided restoration tables from EbRestoration.c")
    tables.update(extract_tables(
        REF / "EbRestoration.c", {"eb_x_by_xplus1", "eb_one_by_x"}))
    sgr_text = _strip_comments((REF / "EbRestoration.c").read_text())
    m = re.search(r"eb_sgr_params\[SGRPROJ_PARAMS\]\s*=\s*\{(.*?)\n\};",
                  sgr_text, re.S)
    nums = [int(v) for v in re.findall(r"-?\d+", m.group(1))]
    assert len(nums) == 16 * 4, len(nums)
    tables["eb_sgr_params"] = np.array(nums, np.int32).reshape(16, 4)

    np.savez_compressed(OUT, **tables)
    total = sum(t.size for t in tables.values())
    print(f"wrote {len(tables)} tables, {total} values -> {OUT}")


if __name__ == "__main__":
    main()
