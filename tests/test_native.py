"""Native fast point-file parser tests."""

import numpy as np
import pytest

from prifit_tpu.native import _get_lib, fast_loadtxt


@pytest.fixture
def txt(tmp_path, rng):
    data = rng.normal(size=(500, 7)).astype(np.float32)
    p = tmp_path / "pts.txt"
    np.savetxt(str(p), data, fmt="%.6f")
    return str(p), data


class TestFastLoadtxt:
    def test_matches_numpy(self, txt):
        path, data = txt
        out = fast_loadtxt(path)
        assert out.dtype == np.float32
        np.testing.assert_allclose(out, data, atol=2e-6)

    def test_comma_separated(self, tmp_path, rng):
        data = rng.normal(size=(50, 6)).astype(np.float32)
        p = str(tmp_path / "c.txt")
        np.savetxt(p, data, fmt="%.6f", delimiter=",")
        np.testing.assert_allclose(fast_loadtxt(p), data, atol=2e-6)

    def test_explicit_ncols(self, txt):
        path, data = txt
        out = fast_loadtxt(path, ncols=7)
        assert out.shape == data.shape

    def test_exponent_and_nan_fallback(self, tmp_path):
        p = str(tmp_path / "e.txt")
        with open(p, "w") as f:
            f.write("1e3 -2.5E-2 nan\n-0.5 +4.25 7\n")
        out = fast_loadtxt(p)
        assert out.shape == (2, 3)
        np.testing.assert_allclose(out[0, :2], [1000.0, -0.025])
        assert np.isnan(out[0, 2])
        np.testing.assert_allclose(out[1], [-0.5, 4.25, 7.0])

    def test_native_library_builds(self):
        # g++ is part of the supported toolchain; the fast path must be on
        assert _get_lib() is not None

    def test_large_values_roundtrip(self, tmp_path):
        p = str(tmp_path / "big.txt")
        vals = np.array([[123456.789062, -0.000001, 42.0]])
        np.savetxt(p, vals, fmt="%.6f")
        np.testing.assert_allclose(fast_loadtxt(p), vals, rtol=1e-6)
