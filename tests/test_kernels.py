"""Gaussian tap parity: closed form vs the reference's scipy-loop procedure
(flowdenoising.py:34-45)."""

import numpy as np
import pytest
import scipy.ndimage

from flowdenoising_tpu.kernels import get_gaussian_kernel


def reference_get_gaussian_kernel(sigma):
    """Literal re-execution of the reference's grow-until-two-zeros loop."""
    number_of_coeffs = 3
    number_of_zeros = 0
    while number_of_zeros < 2:
        delta = np.zeros(number_of_coeffs)
        delta[delta.size // 2] = 1
        coeffs = scipy.ndimage.gaussian_filter1d(delta, sigma=sigma)
        number_of_zeros = coeffs.size - np.count_nonzero(coeffs)
        number_of_coeffs += 1
    return coeffs[1:-1]


@pytest.mark.parametrize("sigma", [0.5, 1.0, 1.5, 2.0, 2.5, 3.0, 4.0, 5.0])
def test_taps_match_reference(sigma):
    ours = get_gaussian_kernel(sigma)
    ref = reference_get_gaussian_kernel(sigma)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=0, atol=1e-15)


@pytest.mark.parametrize("sigma,expected_len", [(0.5, 5), (1.0, 9), (2.0, 17), (3.0, 25), (4.0, 33)])
def test_tap_length_law(sigma, expected_len):
    assert len(get_gaussian_kernel(sigma)) == expected_len


def test_taps_normalized_and_odd():
    for sigma in (0.7, 1.3, 2.2):
        k = get_gaussian_kernel(sigma)
        assert len(k) % 2 == 1
        assert abs(k.sum() - 1.0) < 1e-12
        assert np.all(k > 0)


def test_invalid_sigma():
    with pytest.raises(ValueError):
        get_gaussian_kernel(0.0)
