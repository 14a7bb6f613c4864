"""FID/KID/IS metric correctness tests."""

import jax
import numpy as np

from b_pinn_kalman_filter_tpu.train import evaluation


def test_fid_zero_for_identical_sets():
  rng = np.random.default_rng(0)
  x = rng.standard_normal((500, 16))
  assert abs(evaluation.frechet_distance(x, x.copy())) < 1e-6


def test_fid_closed_form_gaussians():
  """FID between N(0,I) and N(m, I) samples ~ ||m||^2."""
  rng = np.random.default_rng(1)
  d = 8
  x = rng.standard_normal((20000, d))
  m = np.full(d, 0.5)
  y = rng.standard_normal((20000, d)) + m
  fid = evaluation.frechet_distance(x, y)
  assert abs(fid - d * 0.25) < 0.1, fid


def test_kid_zero_for_same_distribution():
  rng = np.random.default_rng(2)
  x = rng.standard_normal((2000, 8))
  y = rng.standard_normal((2000, 8))
  kid = evaluation.kernel_distance(x, y)
  assert abs(kid) < 0.05


def test_inception_score_bounds():
  # Uniform logits -> IS ~ 1; one-hot confident and diverse -> IS ~ C.
  n, c = 1000, 10
  uniform = np.zeros((n, c))
  assert abs(evaluation.inception_score(uniform) - 1.0) < 1e-3
  confident = np.eye(c)[np.arange(n) % c] * 50.0
  assert evaluation.inception_score(confident) > 8.0


def test_compute_metrics_pipeline():
  feature_fn = evaluation.make_random_feature_fn(
      jax.random.PRNGKey(0), (8, 8, 1), feature_dim=32, logits_dim=16)
  rng = np.random.default_rng(3)
  a = rng.random((128, 8, 8, 1)).astype(np.float32)
  b = rng.random((128, 8, 8, 1)).astype(np.float32)
  same = evaluation.compute_metrics(feature_fn, a, a)
  diff = evaluation.compute_metrics(feature_fn, a, np.clip(b + 0.4, 0, 1))
  assert same['fid'] < 1e-4
  assert diff['fid'] > same['fid']
  assert np.isfinite(diff['kid'])
  assert np.isfinite(diff['inception_score'])
