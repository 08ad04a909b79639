import numpy as np

from flowdenoising_tpu.utils.metrics import psnr, ssim


def test_psnr_identity_and_scaling():
    a = np.random.default_rng(0).normal(size=(4, 16, 16)).astype(np.float32)
    assert psnr(a, a) == float("inf")
    noisy = a + 0.01
    p1 = psnr(a, noisy)
    noisier = a + 0.1
    p2 = psnr(a, noisier)
    assert p1 > p2
    assert abs((p1 - p2) - 20.0) < 1e-2  # 10x noise = 20 dB (f32 rounding)


def test_ssim_identity_and_monotonicity():
    rng = np.random.default_rng(1)
    a = rng.normal(size=(32, 32)).astype(np.float64)
    assert abs(ssim(a, a) - 1.0) < 1e-12
    s1 = ssim(a, a + rng.normal(scale=0.05, size=a.shape))
    s2 = ssim(a, a + rng.normal(scale=0.5, size=a.shape))
    assert 0 < s2 < s1 < 1


def test_ssim_volume():
    rng = np.random.default_rng(2)
    a = rng.normal(size=(3, 24, 24))
    b = a + rng.normal(scale=0.1, size=a.shape)
    s = ssim(a, b)
    assert 0 < s < 1
