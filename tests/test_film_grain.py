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


def test_ar_noise_model_recovers_known_grain():
    """Synthesize AR grain with known coefficients via our own
    conformant generator, fit with the noise model, and require the
    recovered AR coefficients and energy to match (noise_model.c:1756
    estimation parity, self-oracle)."""
    from svt_av1_tpu.ops.film_grain import (FilmGrainParams, apply_grain,
                                            generate_grain, scaling_lut)
    from svt_av1_tpu.pipeline.noise_model import fit_film_grain

    true = FilmGrainParams(
        apply_grain=True, grain_seed=4321,
        scaling_points_y=[(0, 96), (255, 96)],
        ar_coeff_lag=2,
        ar_coeffs_y=[0, 0, 0, 0, 0, 0, 0, 0, 12, 0, 0, 44],
        ar_coeffs_cb=[0] * 13, ar_coeffs_cr=[0] * 13)
    rng = np.random.default_rng(5)
    h, w = 256, 384
    yy, xx = np.mgrid[0:h, 0:w]
    base = (110 + 60 * np.sin(xx / 71) + 40 * np.cos(yy / 53)
            ).clip(16, 235).astype(np.uint8)
    u = np.full((h // 2, w // 2), 128, np.uint8)
    v = np.full((h // 2, w // 2), 128, np.uint8)
    grainy = apply_grain(true, (base, u, v), bd=8)

    got = fit_film_grain(np.asarray(grainy[0]), seed=777, strength=8,
                         lag=2)
    assert got is not None
    # dominant AR taps recovered (left and above neighbors)
    assert abs(got.ar_coeffs_y[11] - 44) <= 12
    assert abs(got.ar_coeffs_y[8] - 12) <= 12
    for k in (0, 1, 2, 3, 5, 6):     # far taps stay small
        assert abs(got.ar_coeffs_y[k]) <= 10
    # synthesized energy matches the true grain's energy within 20%
    def grain_sigma(params):
        tmpl, _, _ = generate_grain(params, 8)
        lut = scaling_lut(params.scaling_points_y)
        s = float(lut[128]) / 256.0
        return float(tmpl[3:, 3:-3].std()) * s
    sig_true = grain_sigma(true)
    sig_got = grain_sigma(got)
    assert abs(sig_got - sig_true) / sig_true < 0.20, (sig_true, sig_got)
