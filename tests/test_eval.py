"""FID harness tests: closed-form Fréchet distances + the VGG featurizer."""

import jax
import jax.numpy as jnp
import numpy as np

from ldm_tf2_tpu.eval import (
    compute_statistics,
    fid_from_features,
    frechet_distance,
    vgg_feature_extractor,
)


def test_frechet_identical_is_zero(rng):
    x = rng.randn(500, 8)
    mu, sigma = compute_statistics(x)
    assert frechet_distance(mu, sigma, mu, sigma) < 1e-10


def test_frechet_closed_form_univariate():
    # d^2 between N(m1, s1^2) and N(m2, s2^2) = (m1-m2)^2 + (s1-s2)^2
    d2 = frechet_distance(
        np.array([1.0]), np.array([[4.0]]),
        np.array([3.0]), np.array([[9.0]]),
    )
    np.testing.assert_allclose(d2, (1 - 3) ** 2 + (2 - 3) ** 2, rtol=1e-10)


def test_frechet_closed_form_diagonal():
    # Diagonal covariances: d^2 = sum (mu_i - nu_i)^2 + (sqrt(a_i)-sqrt(b_i))^2
    mu1, mu2 = np.array([0.0, 1.0]), np.array([2.0, -1.0])
    a, b = np.array([1.0, 4.0]), np.array([9.0, 16.0])
    expected = np.sum((mu1 - mu2) ** 2) + np.sum((np.sqrt(a) - np.sqrt(b)) ** 2)
    d2 = frechet_distance(mu1, np.diag(a), mu2, np.diag(b))
    np.testing.assert_allclose(d2, expected, rtol=1e-10)


def test_fid_orders_distributions(rng):
    base = rng.randn(400, 16)
    near = rng.randn(400, 16) + 0.1
    far = rng.randn(400, 16) + 2.0
    fid_near = fid_from_features(base, near)
    fid_far = fid_from_features(base, far)
    assert 0 <= fid_near < fid_far
    assert fid_far > 3.0  # mean shift of 2 in 16 dims -> d^2 >= 4*16 approx


def test_vgg_feature_extractor_shapes(rng):
    from ldm_tf2_tpu.models import LPIPS

    lpips = LPIPS()
    x = jnp.zeros((1, 32, 32, 3))
    params = lpips.init(jax.random.PRNGKey(0), x, x)["params"]
    features = vgg_feature_extractor(params, batch_size=2)
    images = rng.randn(3, 32, 32, 3).astype(np.float32) * 0.3
    out = features(images)
    assert out.shape == (3, 1024)
    assert np.all(np.isfinite(out))
    # deterministic featurizer: identical sets -> FID 0
    assert fid_from_features(out, out) < 1e-6
