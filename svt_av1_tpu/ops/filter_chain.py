"""Fused per-frame filter chain: DLF level search + apply, then CDEF
strength search + apply, in ONE jitted device program.

The reference runs these as separate thread-pool stages over segment
grids (EbDlfProcess.c:89, EbCdefProcess.c:479); the TPU build fuses the
whole post-recon filter chain into a single device dispatch so the
recon round-trips host<->device once per frame instead of once per
stage.  Both stage bodies reuse the already-equivalence-tested traced
forms (ops/dlf.py loop_filter_plane_full, ops/cdef.py search/apply);
tests/test_filter_chain.py asserts the fused outputs equal the
sequential host path bit for bit.
"""
from __future__ import annotations

import functools

import numpy as np

from . import cdef as cdef_ops
from . import dlf as dlf_ops

PRI_SET = (0, 1, 2, 4, 6, 8, 12, 15)
SEC_SET = (0, 1, 2, 3)
# fast-preset subset (the reference's reduced cdef search at high
# presets, cdef_pick_method fast levels)
PRI_SET_FAST = (0, 2, 4, 8, 15)
SEC_SET_FAST = (0, 1, 2)


@functools.lru_cache(maxsize=8)
def _jit_chain(shapes: tuple, vis: tuple, sharpness: int, bd: int,
               n_cand: int, fw: int, fh: int, nplanes: int,
               pri_set: tuple = PRI_SET, sec_set: tuple = SEC_SET):
    import jax
    import jax.numpy as jnp

    def run(cands, nonskip, damping, src_y, src_u, src_v, *args):
        # ---- DLF: luma level search + apply (ops/dlf.py run) ----
        planes = []
        params = []
        for i in range(3):
            planes.append(args[5 * i])
            params.append(args[5 * i + 1:5 * i + 5])
        vw, vh = vis[0]
        y = planes[0].astype(jnp.int32)
        src_y32 = src_y.astype(jnp.int32)
        sses = [jnp.sum(((y - src_y32)[:vh, :vw]).astype(jnp.float32) ** 2)]
        filtered = [y]
        for k in range(n_cand):
            lv = cands[k]
            fy = dlf_ops.loop_filter_plane_full(y, *params[0], vw, vh, lv,
                                                lv, sharpness, bd, jnp)
            sses.append(jnp.sum(((fy - src_y32)[:vh, :vw])
                                .astype(jnp.float32) ** 2))
            filtered.append(fy)
        best = jnp.argmin(jnp.stack(sses))
        level = jnp.where(best == 0, 0, cands[jnp.maximum(best - 1, 0)])
        dlf_out = [jnp.stack(filtered)[best]]
        for p in (1, 2):
            vw_c, vh_c = vis[p]
            pl = planes[p].astype(jnp.int32)
            fp = dlf_ops.loop_filter_plane_full(pl, *params[p], vw_c, vh_c,
                                                level, level, sharpness,
                                                bd, jnp)
            dlf_out.append(jnp.where(best == 0, pl, fp))

        # ---- CDEF on the deblocked planes (ops/cdef.py run) ----
        rec = [dlf_out[i][: fh >> (1 if i else 0), : fw >> (1 if i else 0)]
               for i in range(nplanes)]
        srcs = [s[: fh >> (1 if i else 0), : fw >> (1 if i else 0)]
                .astype(jnp.int32)
                for i, s in enumerate((src_y, src_u, src_v)[:nplanes])]
        cs = max(bd - 8, 0)
        padded_y = cdef_ops.pad_very_large(rec[0], fw, fh, 8, jnp)
        dirs, var = cdef_ops.find_dir_grid(
            cdef_ops._units_of(padded_y, fw, fh, 8, jnp), cs, jnp)
        err_y, err_uv = cdef_ops.cdef_search_errs(
            srcs, rec, dirs, var, nonskip, fw, fh, damping, bd,
            pri_set, sec_set, jnp)
        if err_uv is None:
            err_uv = jnp.zeros_like(err_y)
        pris = jnp.asarray(np.array(pri_set, np.int32))
        secs = jnp.asarray(np.array(sec_set, np.int32))

        def pick(err):
            i = jnp.argmin(err.ravel())
            return pris[i // len(sec_set)] * cdef_ops.CDEF_SEC_STRENGTHS \
                + secs[i % len(sec_set)]

        ystr = pick(err_y)
        uvstr = pick(err_uv) if nplanes > 1 else jnp.int32(0)
        cdef_out = cdef_ops._cdef_apply_traced(rec, nonskip, ystr, uvstr,
                                               damping, fw, fh, bd, jnp)
        odt = jnp.uint8 if bd == 8 else jnp.uint16
        outs = []
        for i in range(nplanes):
            full = dlf_out[i].at[: fh >> (1 if i else 0),
                                 : fw >> (1 if i else 0)].set(cdef_out[i])
            outs.append(full.astype(odt).ravel())
        outs.append(level.astype(odt)[None])
        outs.append(ystr.astype(odt)[None])
        outs.append(uvstr.astype(odt)[None])
        return jnp.concatenate(outs)

    return jax.jit(run)


def dlf_cdef_chain(codec):
    """Run the fused chain for one frame; fills fh.filter_level and
    fh.cdef_*_strengths and replaces codec.recon.  Returns True when it
    ran, False when the caller must use the sequential path."""
    fh, seq = codec.fh, codec.seq
    if codec.source is None or codec.num_planes != 3:
        return False
    if fh.coded_lossless or fh.allow_intrabc:
        return False
    if seq.enable_restoration:          # LR needs the deblocked copy
        return False
    if not seq.enable_cdef:
        return False
    if max(fh.filter_level) == 0:
        return False
    if getattr(fh, "dlf_level_searched", False):
        return False
    from ..pipeline.frame_codec import _device_filters
    if not _device_filters():
        return False
    ns = cdef_ops.nonskip_grid(codec.skips, codec.mi_rows, codec.mi_cols)
    if not ns.any():
        return False

    base_level = max(fh.filter_level)
    cands = sorted({max(base_level // 2, 1), max(base_level, 1),
                    min(3 * base_level // 2, dlf_ops.MAX_LOOP_FILTER)})
    # fixed candidate count = one compiled program per geometry (a
    # duplicated level is a no-op in the argmin)
    while len(cands) < 3:
        cands.append(cands[-1])
    fast = bool(getattr(codec, "cdef_fast", False))
    pri_set = PRI_SET_FAST if fast else PRI_SET
    sec_set = SEC_SET_FAST if fast else SEC_SET
    bd = seq.bit_depth
    dt = np.uint8 if bd == 8 else np.uint16
    fw, fh_px = codec.mi_cols * 4, codec.mi_rows * 4
    args = []
    shapes = []
    vis_dims = []
    for p in range(3):
        sx = 1 if p else 0
        vw = (fh.frame_width + sx) >> sx
        vh = (fh.frame_height + sx) >> sx
        vis_dims.append((vw, vh))
        tx_w, tx_h = codec.tx_w_grid[p], codec.tx_h_grid[p]
        av, fv, ah, fh_ = dlf_ops.edge_params(
            tx_w, tx_h, codec.skip_grid[p], codec.bedge_x[p],
            codec.bedge_y[p], vw, vh, p > 0)
        args += [np.ascontiguousarray(codec.recon[p]).astype(dt),
                 av, fv, ah, fh_]
        shapes.append(codec.recon[p].shape)
    fn = _jit_chain(tuple(shapes), tuple(vis_dims), fh.sharpness, bd,
                    len(cands), fw, fh_px, 3, pri_set, sec_set)
    # the batched planner uploads the frame's source once per frame
    # (codec.dev_source); reuse those device-resident planes here
    srcs = getattr(codec, "dev_source", None)
    if srcs is None or any(s.shape != shapes[p]
                           for p, s in enumerate(srcs)):
        srcs = [np.ascontiguousarray(codec.source[p]).astype(dt)
                for p in range(3)]
    flat = np.asarray(fn(np.asarray(cands, np.int32), ns,
                         np.int32(fh.cdef_damping), *srcs, *args))
    off = 0
    for p in range(3):
        h, w = shapes[p]
        codec.recon[p] = flat[off:off + h * w].reshape(h, w)\
            .astype(np.int32)
        off += h * w
    level = int(flat[off])
    ystr, uvstr = int(flat[off + 1]), int(flat[off + 2])
    fh.filter_level = (level, level)
    fh.filter_level_uv = (level, level)
    fh.dlf_level_searched = True
    fh.cdef_y_strengths = (ystr,)
    fh.cdef_uv_strengths = (uvstr,)
    return True
