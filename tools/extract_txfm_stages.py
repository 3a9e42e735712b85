#!/usr/bin/env python
"""Extract the AV1 1-D transform butterfly networks as data tables.

The AV1 spec fixes the integer butterfly networks for DCT4..64 and
ADST8/16 (inverse normatively; forward by libaom convention).  Each
network is a sequence of stages, each stage a list of per-output
statements drawn from a 3-op grammar:

  COPY:  out[i] = s * in[j]
  ADD :  out[i] = s0 * in[j] + s1 * in[k]        (clamped in inverse)
  BTF :  out[i] = round_shift(c0 * in[j] + c1 * in[k], cos_bit)
         with c0/c1 entries of the cospi table (signed indices)

This tool parses the reference's C butterflies
(/root/reference/.../EbInvTransforms.c, EbTransforms.c) into per-function
statement tables stored in svt_av1_tpu/ops/data/txfm_stages.npz, along
with the cospi/sinpi constant tables.  The vectorized engine in
svt_av1_tpu/ops/transforms.py interprets these tables over batched
arrays; ADST4 (sinpi network) and the identity transforms are implemented
directly in the engine.

Statement encoding (int32, one row per output):
  [kind, a_coef, a_idx, b_coef, b_idx]
  kind: 0=COPY/ADD (a_coef/b_coef in {-1,0,1}), 1=BTF (coefs are
        sign*(cospi_index+1))
Stage boundaries are stored as offsets into the statement array.

Run:  python tools/extract_txfm_stages.py
"""
from __future__ import annotations

import re
from pathlib import Path

import numpy as np

REF = Path("/root/reference/Source/Lib")
OUT = Path(__file__).resolve().parent.parent / "svt_av1_tpu" / "ops" / "data" / "txfm_stages.npz"

FUNCS = {
    # name in npz: (file, c function)
    "idct4": ("Common/Codec/EbInvTransforms.c", "svt_av1_idct4_new"),
    "idct8": ("Common/Codec/EbInvTransforms.c", "svt_av1_idct8_new"),
    "idct16": ("Common/Codec/EbInvTransforms.c", "svt_av1_idct16_new"),
    "idct32": ("Common/Codec/EbInvTransforms.c", "svt_av1_idct32_new"),
    "idct64": ("Common/Codec/EbInvTransforms.c", "svt_av1_idct64_new"),
    "iadst8": ("Common/Codec/EbInvTransforms.c", "svt_av1_iadst8_new"),
    "iadst16": ("Common/Codec/EbInvTransforms.c", "svt_av1_iadst16_new"),
    "fdct4": ("Encoder/Codec/EbTransforms.c", "svt_av1_fdct4_new"),
    "fdct8": ("Encoder/Codec/EbTransforms.c", "svt_av1_fdct8_new"),
    "fdct16": ("Encoder/Codec/EbTransforms.c", "svt_av1_fdct16_new"),
    "fdct32": ("Encoder/Codec/EbTransforms.c", "svt_av1_fdct32_new"),
    "fdct64": ("Encoder/Codec/EbTransforms.c", "svt_av1_fdct64_new"),
    "fadst8": ("Encoder/Codec/EbTransforms.c", "svt_av1_fadst8_new"),
    "fadst16": ("Encoder/Codec/EbTransforms.c", "svt_av1_fadst16_new"),
}

KIND_LIN = 0
KIND_BTF = 1

_TERM = re.compile(r"^(-?)\s*(?:bf0|input)\[(\d+)\]$")
_BTF = re.compile(
    r"^half_btf\(\s*(-?)cospi\[(\d+)\]\s*,\s*bf0\[(\d+)\]\s*,\s*"
    r"(-?)cospi\[(\d+)\]\s*,\s*bf0\[(\d+)\]\s*,\s*cos_bit\s*\)$")
_ASSIGN = re.compile(r"bf1\[(\d+)\]\s*=\s*(.+)$")
_STAGE_SWAP = re.compile(r"bf1\s*=\s*(output|step|\w+)\s*;")


def _function_body(text: str, fname: str) -> str:
    m = re.search(rf"void {re.escape(fname)}\s*\([^)]*\)\s*\{{", text)
    if not m:
        raise KeyError(fname)
    depth = 1
    i = m.end()
    while depth:
        if text[i] == "{":
            depth += 1
        elif text[i] == "}":
            depth -= 1
        i += 1
    return text[m.end():i - 1]


def _parse_statement(expr: str):
    expr = expr.strip().rstrip(";").strip()
    clamp = False
    m = re.match(r"^clamp_value\((.+),\s*stage_range\[stage\]\)$", expr)
    if m:
        expr = m.group(1).strip()
        clamp = True
    b = _BTF.match(expr)
    if b:
        s0, i0, j0, s1, i1, j1 = b.groups()
        c0 = (int(i0) + 1) * (-1 if s0 == "-" else 1)
        c1 = (int(i1) + 1) * (-1 if s1 == "-" else 1)
        return (KIND_BTF, c0, int(j0), c1, int(j1)), clamp
    # linear: one or two ± terms
    parts = re.split(r"(?<=\])\s*([+-])\s*", expr)
    first = _TERM.match(parts[0].strip())
    if not first:
        raise ValueError(f"unparsed statement: {expr!r}")
    s0 = -1 if first.group(1) == "-" else 1
    j0 = int(first.group(2))
    if len(parts) == 1:
        return (KIND_LIN, s0, j0, 0, 0), clamp
    assert len(parts) == 3, expr
    sign = -1 if parts[1] == "-" else 1
    second = _TERM.match(parts[2].strip())
    if not second:
        raise ValueError(f"unparsed statement: {expr!r}")
    s1 = sign * (-1 if second.group(1) == "-" else 1)
    j1 = int(second.group(2))
    return (KIND_LIN, s0, j0, s1, j1), clamp


def parse_function(text: str, fname: str):
    body = _function_body(text, fname)
    body = re.sub(r"/\*.*?\*/", " ", body, flags=re.S)
    body = re.sub(r"//[^\n]*", " ", body)
    stages: list[list] = []
    clamps: list[list] = []
    current: dict[int, tuple] = {}
    cur_clamp: dict[int, bool] = {}

    def flush():
        nonlocal current, cur_clamp
        if current:
            n = max(current) + 1
            assert sorted(current) == list(range(n)), f"{fname}: sparse stage"
            stages.append([current[i] for i in range(n)])
            clamps.append([cur_clamp[i] for i in range(n)])
            current, cur_clamp = {}, {}

    for raw in body.split(";"):
        stmt = raw.strip()
        if not stmt:
            continue
        if _STAGE_SWAP.match(stmt + ";"):
            flush()
            continue
        m = _ASSIGN.match(stmt.replace("\n", " "))
        if m:
            idx = int(m.group(1))
            parsed, clamp = _parse_statement(m.group(2))
            current[idx] = parsed
            cur_clamp[idx] = clamp
    flush()
    return stages, clamps


def main():
    data: dict[str, np.ndarray] = {}
    texts = {}
    for key, (rel, fname) in FUNCS.items():
        path = REF / rel
        if path not in texts:
            texts[path] = path.read_text()
        stages, clamps = parse_function(texts[path], fname)
        stmts, offs, clamp_flat = [], [0], []
        for st, cl in zip(stages, clamps):
            stmts.extend(st)
            clamp_flat.extend(cl)
            offs.append(len(stmts))
        data[f"{key}_stmts"] = np.asarray(stmts, dtype=np.int32)
        data[f"{key}_offsets"] = np.asarray(offs, dtype=np.int32)
        data[f"{key}_clamp"] = np.asarray(clamp_flat, dtype=np.int8)
        n_out = len(stages[-1])
        print(f"{key}: {len(stages)} stages, {len(stmts)} stmts, {n_out} outputs")

    # cospi / sinpi constant tables (cos_bit 10..16 rows)
    inv_c = (REF / "Common/Codec/EbInvTransforms.c").read_text()
    for tbl in ("eb_av1_cospi_arr_data", "eb_av1_sinpi_arr_data"):
        m = re.search(rf"{tbl}\s*\[7\]\s*\[\d+\]\s*=\s*\{{", inv_c)
        depth, i = 1, m.end()
        while depth:
            depth += {"{": 1, "}": -1}.get(inv_c[i], 0)
            i += 1
        body = "[" + inv_c[m.end():i - 1].replace("{", "[").replace("}", "]") + "]"
        data[tbl.replace("eb_av1_", "")] = np.asarray(eval(body), dtype=np.int32)

    OUT.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(OUT, **data)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
