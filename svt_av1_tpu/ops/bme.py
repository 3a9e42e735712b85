"""Batched frame-level motion estimation (the TPU HME/ME path).

The reference runs 3-level HME + integer search per superblock inside a
thread pool (EbMotionEstimation.c hme_level_0:852, integer_search_sb:
1868, 8x8 SAD pyramid).  Here the whole frame searches at once:

  1. SB-level coarse search on the /8 decimated pair as full-plane
     shifted absolute differences (one elementwise op per offset, box
     summed per SB) — no gathers, pure VPU work.
  2. One window gather per SB around its coarse winner, then the 8x8
     SAD pyramid over the refinement window via static slice sums.
  3. Aggregation of the 8x8 surfaces into every decision shape
     (integer_search_sb's pyramid trick) and per-shape argmin.

Everything runs under numpy or jax.numpy (xp); MVs are full-pel.
"""
from __future__ import annotations

import numpy as np

SB = 64
COARSE_R = 8            # +-8 at /8 => +-64 full-pel
# full-res refinement reach around the coarse winner.  16 (not 8)
# because the /8 coarse SAD only sees the dominant low-frequency
# layer: when a fine-textured layer moves differently (the classic
# two-layer pan), its motion lies beyond +-8 of the coarse winner and
# only a wide full-resolution search recovers it (the reference's
# integer_search_sb runs a 48x48 area around the HME winner,
# EbMotionEstimation.c:1868)
REFINE_R = 16
MARGIN = 8              # keep MC windows (incl. chroma taps) in-frame


def _decimate8(plane, xp):
    """/8 box decimation (means keep SAD comparable)."""
    H, W = plane.shape
    h8, w8 = H // 8, W // 8
    p = plane[:h8 * 8, :w8 * 8].reshape(h8, 8, w8, 8)
    return (p.sum((1, 3)) >> 6).astype(xp.int32)


def coarse_sb_search(src, ref, xp=np, row0: int = 0,
                     coarse_r: int = COARSE_R):
    """SB-level full search on /8 planes: returns mv [n_sby, n_sbx, 2]
    (full-pel, (row, col)) minimizing the /8-domain SAD.

    ``coarse_r``: /8-domain reach (full-pel range = 8 * coarse_r);
    callers scale it with the reference distance — far references need
    proportionally larger ranges (the reference's HME level-0 covers
    its whole decimated search region, EbMotionEstimation.c:852).

    ``row0``: global pixel row of src's first row when src is a stripe
    of a taller frame whose full reference is ``ref`` (spatial sharding:
    the reference picture is replicated across shards)."""
    s8 = _decimate8(src, xp)
    r8 = _decimate8(ref, xp)
    h8, w8 = s8.shape
    n_sby, n_sbx = h8 // 8, w8 // 8
    COARSE = int(coarse_r)
    pad = xp.pad(r8, COARSE, mode="edge")
    r0_8 = row0 // 8
    npos = 2 * COARSE + 1
    if xp is not np:
        # lax.scan over the offset grid: identical arithmetic and
        # first-minimum tie-break as the numpy twin below, but the graph
        # stays one iteration deep (the unrolled form blows XLA's
        # compile time up by ~300x)
        from jax import lax

        def body(carry, i):
            best, bdy, bdx = carry
            dy = i // npos - COARSE
            dx = i % npos - COARSE
            sh = lax.dynamic_slice(
                pad, (r0_8 + COARSE + dy, COARSE + dx), (h8, w8))
            d = xp.abs(s8 - sh)
            cost = d[:n_sby * 8, :n_sbx * 8] \
                .reshape(n_sby, 8, n_sbx, 8).sum((1, 3))
            # slight center bias keeps flat areas at zero motion
            cost = cost + (xp.abs(dy) + xp.abs(dx))
            take = cost < best
            return (xp.where(take, cost, best),
                    xp.where(take, dy, bdy).astype(xp.int32),
                    xp.where(take, dx, bdx).astype(xp.int32)), None

        # derive the init from the (possibly shard_map-varying) source
        # so the scan carry's varying-ness matches the body's outputs
        # (JAX vma check under shard_map)
        vary0 = (s8[:n_sby * 8:8, :n_sbx * 8:8] * 0).astype(xp.int32)
        init = (vary0 + np.int32(2 ** 31 - 1), vary0, vary0)
        (best, bdy, bdx), _ = lax.scan(body, init,
                                       xp.arange(npos * npos))
        return xp.stack([bdy * 8, bdx * 8], axis=-1)
    best = None
    bdy = None
    bdx = None
    for dy in range(-COARSE, COARSE + 1):
        for dx in range(-COARSE, COARSE + 1):
            sh = pad[COARSE + r0_8 + dy:COARSE + r0_8 + dy + h8,
                     COARSE + dx:COARSE + dx + w8]
            d = xp.abs(s8 - sh)
            cost = d[:n_sby * 8, :n_sbx * 8] \
                .reshape(n_sby, 8, n_sbx, 8).sum((1, 3))
            # slight center bias keeps flat areas at zero motion
            cost = cost + (abs(dy) + abs(dx))
            if best is None:
                best, bdy, bdx = cost, xp.full(cost.shape, dy, xp.int32), \
                    xp.full(cost.shape, dx, xp.int32)
            else:
                take = cost < best
                best = xp.where(take, cost, best)
                bdy = xp.where(take, dy, bdy)
                bdx = xp.where(take, dx, bdx)
    return xp.stack([bdy * 8, bdx * 8], axis=-1)


def sb_windows(ref, origins, win: int, xp=np):
    """Gather [N, win, win] reference windows at per-SB origins
    (one gather per frame+ref — the only gather in the ME path)."""
    r = origins[:, 0][:, None, None] + np.arange(win)[None, :, None]
    c = origins[:, 1][:, None, None] + np.arange(win)[None, None, :]
    if xp is np:
        return ref[r, c]
    return xp.asarray(ref)[xp.asarray(r), xp.asarray(c)]


def sad8_surfaces(src_sbs, windows, xp=np):
    """8x8 SAD pyramid base over the refinement window.

    src_sbs: [N, 64, 64] source superblocks; windows: [N, W, W] with
    W = 64 + 2*REFINE_R.  Returns [N, 8, 8, ny, nx] int32 where
    (ny, nx) = (2R+1, 2R+1) spans candidate offsets."""
    n = src_sbs.shape[0]
    R = REFINE_R
    npos = 2 * R + 1
    s = src_sbs.astype(xp.int32)
    w = windows.astype(xp.int32)
    if xp is not np:
        # scan over offsets (same values/order as the numpy twin, tiny
        # graph instead of 289 unrolled slices)
        from jax import lax

        def body(_, i):
            dy = i // npos
            dx = i % npos
            ws = lax.dynamic_slice(w, (0, dy, dx), (n, SB, SB))
            d = xp.abs(s - ws)
            sad8 = d.reshape(n, 8, 8, 8, 8).transpose(0, 1, 3, 2, 4) \
                .sum((-1, -2))               # [N, 8, 8]
            return None, sad8

        _, ys = lax.scan(body, None, xp.arange(npos * npos))
        return ys.transpose(1, 2, 3, 0).reshape(n, 8, 8, npos, npos)
    # diff for every offset via static slices of the window
    out = []
    for dy in range(npos):
        row = []
        for dx in range(npos):
            d = xp.abs(s - w[:, dy:dy + SB, dx:dx + SB])
            sad8 = d.reshape(n, 8, 8, 8, 8).transpose(0, 1, 3, 2, 4) \
                .sum((-1, -2))               # [N, 8, 8]
            row.append(sad8)
        out.append(xp.stack(row, axis=-1))
    return xp.stack(out, axis=-2)            # [N, 8, 8, ny, nx]


def aggregate(sad8, fy: int, fx: int, xp=np):
    """Sum the 8x8 grid into (8*fy)x(8*fx) block SADs:
    [N, 8//fy, 8//fx, ny, nx]."""
    n, gy, gx, ny, nx = sad8.shape
    oy, ox = gy // fy, gx // fx
    return sad8.reshape(n, oy, fy, ox, fx, ny, nx).sum((2, 4))


def best_offsets(sads, xp=np):
    """argmin over the offset plane: returns (mv_dy, mv_dx, sad) each
    [...] shaped like sads without the last two axes; offsets are
    full-pel relative to the window center (REFINE_R)."""
    shp = sads.shape[:-2]
    ny, nx = sads.shape[-2:]
    flat = sads.reshape(shp + (ny * nx,))
    idx = xp.argmin(flat, axis=-1)
    sad = xp.min(flat, axis=-1)
    dy = (idx // nx).astype(xp.int32) - REFINE_R
    dx = (idx % nx).astype(xp.int32) - REFINE_R
    return dy, dx, sad


ME_SHAPES = ((8, 8), (16, 16), (32, 32), (16, 8), (8, 16),
             (32, 16), (16, 32), (64, 64))


def coarse_r_for_dist(dist: int) -> int:
    """/8-domain coarse reach by reference distance: +-64 px for
    near refs, growing to +-192 px at distance >= 8 (content moving
    d px/frame needs d*dist reach)."""
    d = abs(int(dist))
    if d <= 2:
        return 8
    if d <= 4:
        return 12
    if d <= 8:
        return 16
    return 24


def frame_me(src, ref, xp=np, row0: int = 0, coarse_r: int = COARSE_R):
    """Full-frame single-reference ME.

    With ``row0`` > 0 (spatial sharding), ``src`` is a stripe whose
    first row sits at global row ``row0`` of the frame while ``ref`` is
    the FULL reference plane (replicated across shards); all outputs are
    bit-identical to the same rows of the unsharded run.

    Refines around TWO candidate origins per SB — the coarse /8 winner
    and the zero MV (the reference similarly carries the HME candidate
    alongside (0,0); on low-structure content the decimated search is
    unreliable) — and merges by per-block SAD.

    Returns dict {(w, h): (mv_rows, mv_cols, sad)} per SB-nested grids,
    plus "origins" (list of [N, 2] per candidate), "windows" (list of
    [N, win, win]), "win16" ([N, 4, 4] winning candidate per 16x16),
    and "grid".  MVs are full-pel pixel units relative to each block's
    own position; every proposed MC window stays MARGIN px in-frame.
    """
    H, W = ref.shape                 # frame dims (== src dims unsharded)
    n_sby, n_sbx = src.shape[0] // SB, src.shape[1] // SB
    coarse = coarse_sb_search(src, ref, xp, row0, coarse_r)
    win = SB + 2 * REFINE_R

    sy = np.arange(n_sby) * SB
    sx = np.arange(n_sbx) * SB
    gy, gx = np.meshgrid(sy, sx, indexing="ij")
    pos = np.stack([gy.ravel(), gx.ravel()], axis=-1)      # [N, 2]
    posv = xp.asarray(pos)
    if not (isinstance(row0, (int, np.integer)) and row0 == 0):
        posv = xp.stack([posv[:, 0] + row0, posv[:, 1]], axis=-1)
    # windows may start up to REFINE_R before the frame (edge-replicated
    # reference pad): edge superblocks must reach small negative MVs —
    # without this the whole first SB row/column loses its motion.  The
    # conformant replay rejects the rare proposals whose tap windows
    # would cross the frame edge.
    PR = REFINE_R
    ref_pad = xp.pad(ref, PR, mode="edge")
    lo = -PR
    hi_y = H - win + PR
    hi_x = W - win + PR

    def origins_for(cvec):
        return xp.stack([
            xp.clip(posv[:, 0] + cvec[:, 0] - REFINE_R, lo, hi_y),
            xp.clip(posv[:, 1] + cvec[:, 1] - REFINE_R, lo, hi_x),
        ], axis=-1)

    src_sbs = src.reshape(n_sby, SB, n_sbx, SB).transpose(0, 2, 1, 3) \
        .reshape(-1, SB, SB)
    if xp is not np:
        src_sbs = xp.asarray(src_sbs)

    cands = [coarse.reshape(-1, 2),
             xp.zeros((n_sby * n_sbx, 2), xp.int32)]
    origins_l, windows_l, sad8_l = [], [], []
    for cvec in cands:
        origins = origins_for(cvec)
        windows = sb_windows(ref_pad, origins + PR, win, xp)
        origins_l.append(origins)
        windows_l.append(windows)
        sad8_l.append(sad8_surfaces(src_sbs, windows, xp))

    out = {}
    # per-candidate SB-level winners: sub-block argmins are biased
    # toward them so the MV field stays coherent (larger merged blocks,
    # cheaper MVDs — the reference gets this via its MVP-centered search)
    sb_best = []
    for k in range(len(cands)):
        agg64 = aggregate(sad8_l[k], 8, 8, xp)
        d64y, d64x, _ = best_offsets(agg64, xp)
        sb_best.append((d64y, d64x))
    ramp = xp.asarray(np.arange(-REFINE_R, REFINE_R + 1))

    for (w, h) in ME_SHAPES:
        fy, fx = h // 8, w // 8
        area = (8 * fy) * (8 * fx)
        best = None
        for k in range(len(cands)):
            agg = aggregate(sad8_l[k], fy, fx, xp)
            d64y, d64x = sb_best[k]
            bias_y = xp.abs(ramp[None, :, None] - d64y[..., None, None])
            bias_x = xp.abs(ramp[None, None, :] - d64x[..., None, None])
            agg = agg + area * (bias_y + bias_x)
            dy, dx, sad = best_offsets(agg, xp)
            # report the raw SAD (selection used the biased surface)
            sad = sad - area * (xp.abs(dy - d64y) + xp.abs(dx - d64x))
            oy = dy.shape[1]
            mv_r = origins_l[k][:, 0][:, None, None] + REFINE_R + dy \
                - posv[:, 0][:, None, None]
            mv_c = origins_l[k][:, 1][:, None, None] + REFINE_R + dx \
                - posv[:, 1][:, None, None]
            if best is None:
                best = [mv_r, mv_c, sad,
                        xp.zeros(sad.shape, xp.int32)]
            else:
                take = sad < best[2]
                best = [xp.where(take, mv_r, best[0]),
                        xp.where(take, mv_c, best[1]),
                        xp.where(take, sad, best[2]),
                        xp.where(take, k, best[3])]
        out[(w, h)] = tuple(best[:3])
        if (w, h) == (16, 16):
            out["win16"] = best[3]
    out["origins"] = origins_l
    out["windows"] = windows_l
    out["grid"] = (n_sby, n_sbx)
    return out


SUBPEL_DELTAS = (-4, -2, 0, 2, 4)       # quarter-pel grid in 1/8 units


def subpel_refine16(src, ref, mv_r16, mv_c16, buf_w, buf_h, bd=8, xp=np,
                    row0: int = 0):
    """Quarter-pel refinement per 16x16 block around the full-pel ME
    winner, using the exact REGULAR 8-tap interpolation the conformant
    MC codes (ops/inter.py convolve_2d_sr) — the batched twin of the
    reference's half/quarter-pel stage (EbMotionEstimation.c:2912).

    src: the stripe [rows, buf_w] whose first row is global row ``row0``
    (0 when unsharded, so src covers [buf_h, buf_w] and ref == frame);
    ref: the FULL reference plane; mv_r16/mv_c16: [nr16_local, nc16]
    full-pel MVs for the stripe's blocks.  Returns (mvq8_r, mvq8_c,
    pred) with MVs in 1/8-pel units and pred the assembled
    best-candidate prediction for the stripe."""
    from . import inter as inter_ops

    PRS = REFINE_R + 8                  # full-pel range + tap context
    refp = xp.pad(xp.asarray(ref), PRS, mode="edge")
    nr16 = src.shape[0] // 16
    nc16 = buf_w // 16
    n16 = nr16 * nc16
    gy, gx = np.meshgrid(np.arange(nr16) * 16, np.arange(nc16) * 16,
                         indexing="ij")
    base_y = xp.asarray(gy.ravel()) + row0 + mv_r16.reshape(-1)
    base_x = xp.asarray(gx.ravel()) + mv_c16.reshape(-1)
    oy = xp.clip(base_y - 4 + PRS, 0, buf_h + 2 * PRS - 25)
    ox = xp.clip(base_x - 4 + PRS, 0, buf_w + 2 * PRS - 25)
    rows = oy[:, None, None] + xp.asarray(np.arange(25))[None, :, None]
    cols = ox[:, None, None] + xp.asarray(np.arange(25))[None, None, :]
    patch = refp[rows, cols]            # [n16, 25, 25]
    src16 = xp.asarray(src).reshape(nr16, 16, nc16, 16) \
        .transpose(0, 2, 1, 3).reshape(n16, 16, 16).astype(xp.int32)

    best_sad = None
    best_dy = best_dx = None
    best_pred = None
    for dy8 in SUBPEL_DELTAS:
        for dx8 in SUBPEL_DELTAS:
            sy = 4 + (dy8 >> 3)         # arithmetic shift: floor
            sx = 4 + (dx8 >> 3)
            p = inter_ops.convolve_2d_sr(patch, sx, sy, 16, 16,
                                         (dx8 & 7) * 2, (dy8 & 7) * 2,
                                         bd=bd, xp=xp)
            sad = xp.abs(src16 - p).sum((-1, -2)) \
                + 2 * (abs(dy8) + abs(dx8))
            if best_sad is None:
                best_sad = sad
                best_dy = xp.full(sad.shape, dy8, xp.int32)
                best_dx = xp.full(sad.shape, dx8, xp.int32)
                best_pred = p
            else:
                take = sad < best_sad
                best_sad = xp.where(take, sad, best_sad)
                best_dy = xp.where(take, dy8, best_dy)
                best_dx = xp.where(take, dx8, best_dx)
                best_pred = xp.where(take[:, None, None], p, best_pred)

    mvq8_r = (mv_r16 * 8 + best_dy.reshape(nr16, nc16)).astype(xp.int32)
    mvq8_c = (mv_c16 * 8 + best_dx.reshape(nr16, nc16)).astype(xp.int32)
    pred = best_pred.reshape(nr16, nc16, 16, 16).transpose(0, 2, 1, 3) \
        .reshape(nr16 * 16, buf_w)
    return mvq8_r, mvq8_c, pred


def to_block_maps(me_out, buf_w: int, buf_h: int):
    """Reorder frame_me's per-SB-nested results into frame block grids:
    {(w, h): (mv_r [nr, nc], mv_c, sad)} as numpy arrays."""
    n_sby, n_sbx = me_out["grid"]
    maps = {}
    for key, val in me_out.items():
        if not isinstance(key, tuple):
            continue
        w, h = key
        mv_r, mv_c, sad = (np.asarray(v) for v in val)
        n, oy, ox = mv_r.shape
        nr, nc = n_sby * oy, n_sbx * ox

        def expand(a):
            return a.reshape(n_sby, n_sbx, oy, ox) \
                .transpose(0, 2, 1, 3).reshape(nr, nc)

        maps[(w, h)] = (expand(mv_r), expand(mv_c), expand(sad))
    return maps
