"""Full-plane (device-form) DLF vs the per-line host loop."""
import numpy as np
import pytest

from svt_av1_tpu.ops import dlf


def _mk_grids(h4, w4, rng, chroma=False):
    """Random but self-consistent tx/skip/block-edge grids."""
    tx_w = np.zeros((h4, w4), np.int32)
    tx_h = np.zeros((h4, w4), np.int32)
    bex = np.zeros((h4, w4), bool)
    bey = np.zeros((h4, w4), bool)
    skip = rng.integers(0, 2, (h4, w4)).astype(bool)
    sizes = (4, 8, 16) if not chroma else (4, 8, 16)
    y = 0
    while y < h4:
        x = 0
        bh = int(rng.choice(sizes)) >> 2
        while x < w4:
            bw = int(rng.choice(sizes)) >> 2
            bw = min(bw, w4 - x)
            bh2 = min(bh, h4 - y)
            tx_w[y:y + bh2, x:x + bw] = bw * 4
            tx_h[y:y + bh2, x:x + bw] = bh2 * 4
            bex[y:y + bh2, x] = True
            bey[y, x:x + bw] = True
            # skip uniform within a block (as the encoder records it)
            skip[y:y + bh2, x:x + bw] = skip[y, x]
            x += bw
        y += bh
    return tx_w, tx_h, skip, bex, bey


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("chroma", [False, True])
@pytest.mark.parametrize("bd", [8, 10])
def test_full_matches_per_line(seed, chroma, bd):
    rng = np.random.default_rng(seed)
    W, H = 96, 64
    vis_w, vis_h = (W - 3, H - 2) if seed % 2 else (W, H)
    mx = (1 << bd) - 1
    plane = rng.integers(0, mx + 1, (H, W)).astype(np.int32)
    tx_w, tx_h, skip, bex, bey = _mk_grids(H // 4, W // 4, rng, chroma)
    lv, lh = (28, 17) if seed < 2 else (63, 63)
    sharp = seed % 3

    ref = plane.copy()
    dlf.loop_filter_plane(ref, tx_w, tx_h, skip, bex, bey, vis_w, vis_h,
                          lv, lh, sharp, chroma, bd)

    av, fv, ah, fh_ = dlf.edge_params(tx_w, tx_h, skip, bex, bey,
                                      vis_w, vis_h, chroma)
    got = dlf.loop_filter_plane_full(plane.copy(), av, fv, ah, fh_,
                                     vis_w, vis_h, lv, lh, sharp, bd)
    np.testing.assert_array_equal(np.asarray(got), ref)


def test_full_matches_jax():
    import jax.numpy as jnp
    rng = np.random.default_rng(9)
    W, H = 64, 64
    plane = rng.integers(0, 256, (H, W)).astype(np.int32)
    tx_w, tx_h, skip, bex, bey = _mk_grids(16, 16, rng)
    av, fv, ah, fh_ = dlf.edge_params(tx_w, tx_h, skip, bex, bey,
                                      W, H, False)
    a = dlf.loop_filter_plane_full(plane.copy(), av, fv, ah, fh_,
                                   W, H, 24, 24, 0, 8, np)
    b = dlf.loop_filter_plane_full(jnp.asarray(plane), av, fv, ah, fh_,
                                   W, H, 24, 24, 0, 8, jnp)
    np.testing.assert_array_equal(np.asarray(b), a)
