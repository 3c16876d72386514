"""Scaler parity tests (reference data/Scaler.py quirks kept: shift is
(high - |low|) // 2 = 238 for (-1024, 1500), NOT the range midpoint)."""

import numpy as np

from contrast_gan_3d_tpu.data.scaler import FactorZeroCenterScaler, Scaler, ZeroCenterScaler


def test_zero_center_shift_value():
    s = ZeroCenterScaler(-1024, 1500)
    assert s.shift == 238


def test_factor_scaler_roundtrip(rng):
    s = FactorZeroCenterScaler(-1024, 1500, factor=600)
    x = rng.integers(-1024, 1500, size=(32, 32)).astype(np.float32)
    np.testing.assert_allclose(s.unscale(s(x)), x, atol=1e-4)


def test_factor_scaler_values():
    s = FactorZeroCenterScaler(-1024, 1500, factor=600)
    assert s(238.0) == 0.0
    assert s(838.0) == 1.0
    np.testing.assert_allclose(s(np.float32(-362.0)), -1.0)


def test_identity_scaler():
    s = Scaler()
    assert s(5) == 5 and s.unscale(5) == 5


def test_hu_bounds_scaling():
    # reference train.py:146 scales DESIRED_HU_BOUNDS through the scaler
    s = FactorZeroCenterScaler(-1024, 1500, factor=600)
    lo, hi = s(350.0), s(450.0)
    np.testing.assert_allclose([lo, hi], [(350 - 238) / 600, (450 - 238) / 600])
