"""Film grain synthesis: param signaling roundtrip + end-to-end
conformance against the reference decoder, incl. AR-lag grain."""
import numpy as np
import pytest

from svt_av1_tpu.ops.film_grain import FilmGrainParams, apply_grain


def _clip(w=176, h=144, n=3, sigma=8):
    rng = np.random.default_rng(5)
    yy, xx = np.mgrid[0:h, 0:w]
    out = []
    for i in range(n):
        y = (120 + 50 * np.sin(xx / 9 + i * .3)
             + rng.normal(0, sigma, (h, w))).clip(0, 255).astype(np.uint8)
        u = (128 + 30 * np.sin(yy[:h // 2, :w // 2] / 5)).astype(np.uint8)
        v = (128 - 20 * np.cos(xx[:h // 2, :w // 2] / 7)).astype(np.uint8)
        out.append((y, u, v))
    return out


def test_grain_deterministic_and_nonzero():
    fg = FilmGrainParams(apply_grain=True, grain_seed=1234,
                         scaling_points_y=[(0, 40), (255, 40)],
                         ar_coeff_lag=0, ar_coeffs_cb=[0], ar_coeffs_cr=[0],
                         scaling_points_cb=[(0, 20), (255, 20)],
                         scaling_points_cr=[(0, 20), (255, 20)])
    planes = (np.full((64, 64), 128, np.uint8),
              np.full((32, 32), 128, np.uint8),
              np.full((32, 32), 128, np.uint8))
    a = apply_grain(fg, planes)
    b = apply_grain(fg, planes)
    assert np.array_equal(a[0], b[0])
    assert np.abs(a[0].astype(int) - 128).mean() > 1.0


def test_grain_ar_lag_changes_texture():
    base = dict(apply_grain=True, grain_seed=7,
                scaling_points_y=[(0, 60), (255, 60)],
                scaling_points_cb=[], scaling_points_cr=[])
    white = FilmGrainParams(**base, ar_coeff_lag=0,
                            ar_coeffs_cb=[0], ar_coeffs_cr=[0])
    ar = FilmGrainParams(**base, ar_coeff_lag=1,
                         ar_coeffs_y=[20, 30, 20, 25],
                         ar_coeffs_cb=[0] * 5, ar_coeffs_cr=[0] * 5)
    planes = (np.full((64, 64), 128, np.uint8),
              np.full((32, 32), 128, np.uint8),
              np.full((32, 32), 128, np.uint8))
    a = apply_grain(white, planes)[0].astype(float)
    b = apply_grain(ar, planes)[0].astype(float)
    # AR grain is spatially correlated: lag-1 autocovariance much higher
    def lag1(x):
        x = x - x.mean()
        return (x[:, 1:] * x[:, :-1]).mean() / max((x * x).mean(), 1e-9)
    assert lag1(b) > lag1(a) + 0.2


def test_film_grain_e2e_conformance(tmp_path):
    from svt_av1_tpu.api import encode_ivf, decode_ivf
    from svt_av1_tpu.config import EncoderConfig
    from test_e2e import ref_decode, REF_DECAPP

    frames = _clip()
    cfg = EncoderConfig(source_width=176, source_height=144, qp=45,
                        enc_mode=8, intra_period_length=-1,
                        hierarchical_levels=1,
                        film_grain_denoise_strength=8)
    path = str(tmp_path / "fg.ivf")
    encode_ivf(frames, cfg, path)
    ours, _ = decode_ivf(path)
    assert len(ours) == len(frames)
    if REF_DECAPP.exists():
        refs = ref_decode(path, 176, 144)
        for i, (o, r) in enumerate(zip(ours, refs)):
            for p in range(3):
                np.testing.assert_array_equal(o[p], r[p],
                                              err_msg=f"f{i} p{p}")


def test_film_grain_ar_lag_e2e(tmp_path):
    """Force AR-lag-2 grain params through the pipeline."""
    import svt_av1_tpu.api as api
    from svt_av1_tpu.api import encode_ivf, decode_ivf
    from svt_av1_tpu.config import EncoderConfig
    from test_e2e import ref_decode, REF_DECAPP

    def forced(self, job, planes):
        npos = 2 * 2 * 3
        return FilmGrainParams(
            apply_grain=True, grain_seed=991 + job.display,
            scaling_points_y=[(0, 30), (128, 50), (255, 30)],
            scaling_points_cb=[(0, 20), (255, 20)],
            scaling_points_cr=[(0, 25), (255, 15)],
            ar_coeff_lag=2,
            ar_coeffs_y=[5, -10, 12, 8, -3, 7, 9, -6, 11, 4, -8, 6],
            ar_coeffs_cb=[2] * (npos + 1), ar_coeffs_cr=[-2] * (npos + 1),
            clip_to_restricted_range=True)

    orig = api.Encoder._estimate_film_grain
    api.Encoder._estimate_film_grain = forced
    try:
        frames = _clip(n=2)
        cfg = EncoderConfig(source_width=176, source_height=144, qp=45,
                            enc_mode=8, film_grain_denoise_strength=1)
        path = str(tmp_path / "fgar.ivf")
        encode_ivf(frames, cfg, path)
        ours, _ = decode_ivf(path)
        if REF_DECAPP.exists():
            refs = ref_decode(path, 176, 144)
            for i, (o, r) in enumerate(zip(ours, refs)):
                for p in range(3):
                    np.testing.assert_array_equal(o[p], r[p],
                                                  err_msg=f"f{i} p{p}")
    finally:
        api.Encoder._estimate_film_grain = orig
