"""Op tests: upfirdn2d (fused vs literal reference), grid_sample vs torch
oracle, fused activation, FIR resampling identities."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from b_pinn_kalman_filter_tpu.ops import fused_act, grid_sample, resample, upfirdn2d


class TestUpFirDn2d:

  @pytest.mark.parametrize("up,down,pad,ksize", [
      (1, 1, (0, 0), 3),
      (2, 1, (2, 1), 4),
      (1, 2, (1, 1), 4),
      (2, 2, (3, 2), 5),
      (3, 1, (2, 2), 3),
      (1, 1, (-1, -1), 3),   # negative pad = crop
  ])
  def test_fused_matches_reference(self, up, down, pad, ksize):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 12, 12, 3)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((ksize, ksize)), jnp.float32)
    fused = upfirdn2d.upfirdn2d(x, k, up=up, down=down, pad=pad)
    ref = upfirdn2d.upfirdn2d_ref(x, k, up, up, down, down,
                                  pad[0], pad[1], pad[0], pad[1])
    np.testing.assert_allclose(fused, ref, rtol=1e-4, atol=1e-5)

  def test_identity(self):
    x = jnp.asarray(np.random.default_rng(1).standard_normal((1, 8, 8, 2)),
                    jnp.float32)
    k = jnp.asarray([[1.0]])
    np.testing.assert_allclose(upfirdn2d.upfirdn2d(x, k), x, rtol=1e-6)

  def test_upsample_nearest_equivalence(self):
    """upsample_2d with box kernel == nearest-neighbor upsample."""
    x = jnp.asarray(np.random.default_rng(2).standard_normal((2, 6, 6, 3)),
                    jnp.float32)
    out = resample.upsample_2d(x, k=[1, 1], factor=2)
    np.testing.assert_allclose(out, resample.naive_upsample_2d(x, 2),
                               rtol=1e-5, atol=1e-6)

  def test_downsample_avgpool_equivalence(self):
    x = jnp.asarray(np.random.default_rng(3).standard_normal((2, 8, 8, 3)),
                    jnp.float32)
    out = resample.downsample_2d(x, k=[1, 1], factor=2)
    np.testing.assert_allclose(out, resample.naive_downsample_2d(x, 2),
                               rtol=1e-5, atol=1e-6)

  def test_gradients_exist_to_second_order(self):
    x = jnp.ones((1, 6, 6, 1))
    k = jnp.asarray(upfirdn2d.setup_kernel([1, 3, 3, 1]))
    f = lambda x: jnp.sum(upfirdn2d.upfirdn2d(x, k, up=2, pad=(2, 1)) ** 2)
    g = jax.grad(f)(x)
    h = jax.grad(lambda x: jnp.sum(jax.grad(f)(x) ** 2))(x)
    assert np.isfinite(np.asarray(g)).all()
    assert np.isfinite(np.asarray(h)).all()

  def test_fused_resample_conv_shapes(self):
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 2)), jnp.float32)
    w_up = jnp.asarray(rng.standard_normal((3, 3, 2, 4)), jnp.float32)
    out = resample.upsample_conv_2d(x, w_up, k=[1, 3, 3, 1])
    assert out.shape == (1, 16, 16, 4)
    w_down = jnp.asarray(rng.standard_normal((3, 3, 4, 2)), jnp.float32)
    out2 = resample.conv_downsample_2d(out, w_down, k=[1, 3, 3, 1])
    assert out2.shape == (1, 8, 8, 2)

  def test_upsample_conv_matches_torch_reference_algorithm(self):
    """Exact parity with the reference pipeline: torch conv_transpose2d of
    the flipped/permuted weight, then upfirdn
    (reference up_or_down_sampling.py:72-141)."""
    import torch
    import torch.nn.functional as F
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((1, 12, 12, 2)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 2, 3)), jnp.float32)
    k = [1, 3, 3, 1]
    fused = resample.upsample_conv_2d(x, w, k=k)

    xt = torch.from_numpy(np.asarray(x).transpose(0, 3, 1, 2).copy())
    wt = torch.from_numpy(np.asarray(w).transpose(3, 2, 0, 1).copy())
    kk = upfirdn2d.setup_kernel(k) * 4
    p = (kk.shape[0] - 2) - (3 - 1)
    W2 = torch.flip(wt, [2, 3]).permute(1, 0, 2, 3)
    xt2 = F.conv_transpose2d(xt, W2, stride=2, padding=0)
    ref = upfirdn2d.upfirdn2d_ref(
        jnp.asarray(xt2.numpy().transpose(0, 2, 3, 1)), jnp.asarray(kk),
        1, 1, 1, 1, (p + 1) // 2 + 1, p // 2 + 1,
        (p + 1) // 2 + 1, p // 2 + 1)
    np.testing.assert_allclose(fused, ref, rtol=1e-5, atol=1e-5)


class TestGridSample:

  @pytest.mark.parametrize("padding_mode", ['zeros', 'border'])
  @pytest.mark.parametrize("align_corners", [True, False])
  def test_matches_torch_2d(self, padding_mode, align_corners):
    import torch
    import torch.nn.functional as F
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, 9, 11)).astype(np.float32)   # NCHW
    grid = (rng.random((2, 5, 7, 2)).astype(np.float32) * 2.4 - 1.2)

    expected = F.grid_sample(torch.from_numpy(x), torch.from_numpy(grid),
                             mode='bilinear', padding_mode=padding_mode,
                             align_corners=align_corners).numpy()
    got = grid_sample.grid_sample_2d(
        jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(grid),
        padding_mode=padding_mode, align_corners=align_corners)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2),
                               expected, rtol=1e-4, atol=1e-5)

  @pytest.mark.parametrize("padding_mode", ['zeros', 'border'])
  def test_matches_torch_3d(self, padding_mode):
    import torch
    import torch.nn.functional as F
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 2, 4, 5, 6)).astype(np.float32)  # NCDHW
    grid = (rng.random((1, 3, 3, 3, 3)).astype(np.float32) * 2.2 - 1.1)

    expected = F.grid_sample(torch.from_numpy(x), torch.from_numpy(grid),
                             mode='bilinear', padding_mode=padding_mode,
                             align_corners=True).numpy()
    got = grid_sample.grid_sample_3d(
        jnp.asarray(x.transpose(0, 2, 3, 4, 1)), jnp.asarray(grid),
        padding_mode=padding_mode, align_corners=True)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 4, 1, 2, 3),
                               expected, rtol=1e-4, atol=1e-5)

  def test_second_order_gradients(self):
    """The whole reason the reference has a 668-line CUDA kernel: grad2
    through the warp must exist and be finite (SURVEY §2.1 N3)."""
    x = jnp.asarray(np.random.default_rng(2).standard_normal((1, 6, 6, 1)),
                    jnp.float32)
    grid = grid_sample.make_normalized_grid(1, 6, 6)

    def loss(g):
      out = grid_sample.grid_sample_2d(x, g, padding_mode='border')
      return jnp.sum(out ** 2)

    g1 = jax.grad(loss)(grid)
    g2 = jax.grad(lambda g: jnp.sum(jax.grad(loss)(g) ** 2))(grid)
    assert np.isfinite(np.asarray(g1)).all()
    assert np.isfinite(np.asarray(g2)).all()

  def test_identity_grid_returns_input(self):
    x = jnp.asarray(np.random.default_rng(3).standard_normal((2, 7, 5, 3)),
                    jnp.float32)
    grid = grid_sample.make_normalized_grid(2, 7, 5)
    out = grid_sample.grid_sample_2d(x, grid, align_corners=True)
    np.testing.assert_allclose(out, x, rtol=1e-5, atol=1e-5)


class TestFusedAct:

  def test_fused_leaky_relu_formula(self):
    x = jnp.asarray([[-1.0, 2.0], [0.5, -0.25]])
    bias = jnp.asarray([0.5, -0.5])
    out = fused_act.fused_leaky_relu(x, bias)
    expected = jax.nn.leaky_relu(x + bias, 0.2) * np.sqrt(2)
    np.testing.assert_allclose(out, expected, rtol=1e-6)

  def test_module_has_bias_param(self):
    m = fused_act.FusedLeakyReLU(channel=4)
    x = jnp.ones((2, 3, 3, 4))
    variables = m.init(jax.random.PRNGKey(0), x)
    assert variables['params']['bias'].shape == (4,)
    out = m.apply(variables, x)
    assert out.shape == x.shape


class TestCorrelationPallas:

  def test_pallas_kernel_matches_xla(self):
    from b_pinn_kalman_filter_tpu.ops.correlation import correlation
    from b_pinn_kalman_filter_tpu.ops.correlation_pallas import correlation_pallas
    rng = np.random.default_rng(0)
    f1 = jnp.asarray(rng.standard_normal((2, 16, 24, 8)), jnp.float32)
    f2 = jnp.asarray(rng.standard_normal((2, 16, 24, 8)), jnp.float32)
    a = correlation(f1, f2, 1)
    b = correlation_pallas(f1, f2, 1, interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

  def test_auto_detects_batching_trace(self):
    # vmap multiplies the Pallas block VMEM footprint by the mapped width,
    # which the unbatched-shape check can't see (chip_logs/ukf.log: 8 MC
    # draws -> 40.19M > 16M scoped VMEM at server-side compile).  The auto
    # dispatcher must see the batching trace and take the XLA path.
    from b_pinn_kalman_filter_tpu.ops import correlation_pallas as cp
    seen = []

    def probe(f1, f2):
      seen.append(cp._under_batching(f1))
      return cp.correlation_auto(f1, f2, 1)

    rng = np.random.default_rng(1)
    f1 = jnp.asarray(rng.standard_normal((4, 2, 8, 8, 8)), jnp.float32)
    f2 = jnp.asarray(rng.standard_normal((4, 2, 8, 8, 8)), jnp.float32)
    out = jax.vmap(probe)(f1, f2)
    assert seen == [True]
    assert cp._under_batching(f1[0]) is False
    # vmap-of-auto must still equal the plain XLA correlation per slice.
    from b_pinn_kalman_filter_tpu.ops.correlation import correlation
    np.testing.assert_allclose(np.asarray(out[2]),
                               np.asarray(correlation(f1[2], f2[2], 1)),
                               atol=1e-6)
