"""Correctness pins for the single-pass Pallas BN kernels (ops/pallas_bn).

Interpret mode on the CPU mesh: the kernels' numerics (f32 blockwise
accumulation) must match jnp reductions, the custom-vjp forward must match
flax nn.BatchNorm, and the hand-written backward must match autodiff of
the pure-f32 reference BN. Real-chip compile + speed verdicts come from
the bench A/B (BENCH_NOTES), same contract as every kernel.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unet_tpu.ops import pallas_bn


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(11)


class TestKernels:
    def test_sum_and_sumsq_matches_jnp(self, rng):
        x = jnp.asarray(rng.normal(size=(1024, 96)).astype(np.float32) * 3)
        got = pallas_bn.sum_and_sumsq(x, interpret=True)
        np.testing.assert_allclose(got[0], jnp.sum(x, axis=0), rtol=1e-5)
        np.testing.assert_allclose(got[1], jnp.sum(x * x, axis=0), rtol=1e-5)

    def test_sum_and_sumsq_bf16_input(self, rng):
        x32 = rng.normal(size=(512, 128)).astype(np.float32)
        x = jnp.asarray(x32, jnp.bfloat16)
        got = pallas_bn.sum_and_sumsq(x, interpret=True)
        want = jnp.sum(x.astype(jnp.float32), axis=0)
        np.testing.assert_allclose(got[0], want, rtol=1e-5)

    def test_bwd_sums_match_jnp(self, rng):
        n, c = 768, 64
        x = jnp.asarray(rng.normal(size=(n, c)).astype(np.float32))
        g = jnp.asarray(rng.normal(size=(n, c)).astype(np.float32))
        mean = jnp.mean(x, axis=0)
        inv = jax.lax.rsqrt(jnp.var(x, axis=0) + 1e-5)
        got = pallas_bn.bn_bwd_sums(g, x, mean, inv, interpret=True)
        xhat = (x - mean) * inv
        # sums of ±normals can land near zero: accumulation-order noise
        # needs an absolute term alongside rtol
        np.testing.assert_allclose(got[0], jnp.sum(g, axis=0), rtol=1e-5,
                                   atol=1e-3)
        np.testing.assert_allclose(got[1], jnp.sum(g * xhat, axis=0),
                                   rtol=1e-4, atol=1e-3)

    def test_row_block_and_supported(self):
        assert pallas_bn.supported(1024, 128)
        assert pallas_bn.supported(24 * 128 * 128, 99)
        assert not pallas_bn.supported(1021, 128)  # prime rows
        assert not pallas_bn.supported(1024, 4)    # skinny channels


class TestCustomVjp:
    def _ref_bn(self, x, scale, bias, eps=1e-5):
        """Pure-f32 reference BN (flax fast-variance semantics)."""
        axes = tuple(range(x.ndim - 1))
        mean = jnp.mean(x, axis=axes)
        var = jnp.mean(x * x, axis=axes) - mean * mean
        inv = jax.lax.rsqrt(var + eps)
        return (x - mean) * inv * scale + bias

    def test_forward_matches_flax(self, rng):
        x = jnp.asarray(rng.normal(size=(4, 16, 16, 32)).astype(np.float32))
        scale = jnp.asarray(rng.normal(size=(32,)).astype(np.float32))
        bias = jnp.asarray(rng.normal(size=(32,)).astype(np.float32))
        y, mean, var = pallas_bn.batch_norm_train(
            x, scale, bias, 1e-5, jnp.float32, True)
        bn = nn.BatchNorm(use_running_average=False, epsilon=1e-5,
                          dtype=jnp.float32, param_dtype=jnp.float32)
        variables = bn.init(jax.random.PRNGKey(0), x)
        variables["params"] = {"scale": scale, "bias": bias}
        want, _ = bn.apply(variables, x, mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(y), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(mean, jnp.mean(x, axis=(0, 1, 2)),
                                   rtol=1e-5, atol=1e-6)

    def test_gradients_match_autodiff(self, rng):
        x = jnp.asarray(rng.normal(size=(2, 8, 16, 64)).astype(np.float32))
        scale = jnp.asarray(1 + rng.normal(size=(64,)).astype(np.float32) * .1)
        bias = jnp.asarray(rng.normal(size=(64,)).astype(np.float32) * .1)
        w = jnp.asarray(rng.normal(size=x.shape).astype(np.float32))

        def loss_pallas(x, s, b):
            y, _, _ = pallas_bn.batch_norm_train(x, s, b, 1e-5,
                                                 jnp.float32, True)
            return jnp.sum(y * w)

        def loss_ref(x, s, b):
            return jnp.sum(self._ref_bn(x, s, b) * w)

        gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, scale, bias)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
        for a, b_, name in zip(gp, gr, ("dx", "dscale", "dbias")):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=2e-3, atol=2e-3, err_msg=name)


class TestModule:
    def test_module_matches_flax_and_same_tree(self, rng, monkeypatch):
        from unet_tpu.models.layers import PallasStatsBatchNorm

        # the test env runs 8 virtual CPU devices; opt in to the pallas
        # branch anyway (execution here is single-device)
        monkeypatch.setenv("UNET_TPU_BN_MULTIDEVICE", "1")
        x = jnp.asarray(rng.normal(size=(2, 8, 8, 32)).astype(np.float32))
        mod_p = PallasStatsBatchNorm(use_running_average=False,
                                     momentum=0.9, dtype=jnp.float32)
        mod_f = nn.BatchNorm(use_running_average=False, momentum=0.9,
                             dtype=jnp.float32, param_dtype=jnp.float32)
        vp = mod_p.init(jax.random.PRNGKey(0), x)
        vf = mod_f.init(jax.random.PRNGKey(0), x)
        assert jax.tree_util.tree_structure(vp) == \
            jax.tree_util.tree_structure(vf)
        yp, mp = mod_p.apply(vp, x, mutable=["batch_stats"])
        yf, mf = mod_f.apply(vf, x, mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(yp), np.asarray(yf),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(mp["batch_stats"]["mean"]),
            np.asarray(mf["batch_stats"]["mean"]), rtol=1e-5, atol=1e-6)

    def test_eval_path_uses_running_stats(self, rng):
        from unet_tpu.models.layers import PallasStatsBatchNorm

        x = jnp.asarray(rng.normal(size=(2, 8, 8, 32)).astype(np.float32))
        mod = PallasStatsBatchNorm(use_running_average=True,
                                   dtype=jnp.float32)
        v = mod.init(jax.random.PRNGKey(0), x)
        y = mod.apply(v, x)  # zeros mean, ones var -> y ≈ x (scale 1 bias 0)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), rtol=1e-4,
                                   atol=1e-4)

    def test_ragged_fallback_matches_flax(self, rng):
        # prime row count: supported() is False, inline flax math runs
        from unet_tpu.models.layers import PallasStatsBatchNorm

        x = jnp.asarray(rng.normal(size=(1, 7, 31, 32)).astype(np.float32))
        assert not pallas_bn.supported(x.size // 32, 32)
        mod = PallasStatsBatchNorm(use_running_average=False,
                                   dtype=jnp.float32)
        v = mod.init(jax.random.PRNGKey(0), x)
        yp, _ = mod.apply(v, x, mutable=["batch_stats"])
        bn = nn.BatchNorm(use_running_average=False, dtype=jnp.float32,
                          param_dtype=jnp.float32)
        yf, _ = bn.apply(v, x, mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(yp), np.asarray(yf),
                                   rtol=1e-4, atol=1e-4)

    def test_multidevice_guard_takes_flax_branch(self, rng, monkeypatch):
        """pallas_call has no GSPMD partitioning rule: on multi-device hosts
        (this test env runs 8 virtual CPU devices) the module must take the
        flax-exact branch even for kernel-supported shapes, unless the
        single-device override is set."""
        from unet_tpu.models.layers import PallasStatsBatchNorm
        from unet_tpu.ops import pallas_bn as pbn

        assert jax.device_count() > 1, "test env should expose 8 devices"
        monkeypatch.delenv("UNET_TPU_BN_MULTIDEVICE", raising=False)

        def boom(*a, **k):
            raise AssertionError("pallas branch ran on a multi-device host")

        monkeypatch.setattr(pbn, "batch_norm_train", boom)
        x = jnp.asarray(rng.normal(size=(2, 8, 8, 32)).astype(np.float32))
        assert pbn.supported(x.size // 32, 32)  # shape alone would qualify
        mod = PallasStatsBatchNorm(use_running_average=False,
                                   dtype=jnp.float32)
        v = mod.init(jax.random.PRNGKey(0), x)
        yp, _ = mod.apply(v, x, mutable=["batch_stats"])  # must not raise
        bn = nn.BatchNorm(use_running_average=False, dtype=jnp.float32,
                          param_dtype=jnp.float32)
        yf, _ = bn.apply(v, x, mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(yp), np.asarray(yf),
                                   rtol=1e-4, atol=1e-4)
