import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unet_tpu.models import ARCHS, DynamicUnet, XResNetBody, build_unet
from unet_tpu.models.layers import (
    avg_pool_ceil,
    icnr_init,
    max_pool_torch,
    pixel_shuffle,
    replication_blur,
)


class TestLayerPrimitives:
    def test_pixel_shuffle_matches_torch(self):
        import torch

        x = np.random.default_rng(0).normal(size=(2, 8, 3, 5)).astype(np.float32)  # NCHW
        want = torch.nn.functional.pixel_shuffle(torch.from_numpy(x), 2).numpy()
        got = pixel_shuffle(jnp.moveaxis(jnp.asarray(x), 1, 3), 2)
        np.testing.assert_allclose(np.moveaxis(np.asarray(got), 3, 1), want, rtol=1e-4, atol=1e-6)

    def test_mxu_permutation_convs_bit_exact(self):
        # The one-hot conv formulations must match the reshape/transpose
        # references bit-for-bit (layers.py space_to_depth_mxu /
        # depth_to_space_mxu), including odd channel counts and bf16.
        from unet_tpu.models.layers import (depth_to_space,
                                            depth_to_space_mxu,
                                            space_to_depth,
                                            space_to_depth_mxu)

        rng = np.random.default_rng(2)
        for c, dtype in [(3, np.float32), (64, np.float32), (12, jnp.bfloat16)]:
            x = jnp.asarray(rng.normal(size=(2, 6, 10, c)), dtype)
            np.testing.assert_array_equal(
                np.asarray(space_to_depth_mxu(x, 2), np.float32),
                np.asarray(space_to_depth(x, 2), np.float32))
            y = jnp.asarray(rng.normal(size=(2, 6, 10, c * 4)), dtype)
            np.testing.assert_array_equal(
                np.asarray(depth_to_space_mxu(y, 2), np.float32),
                np.asarray(depth_to_space(y, 2), np.float32))

    def test_icnr_subkernels_equal(self):
        k = icnr_init()(jax.random.PRNGKey(0), (1, 1, 16, 32))
        k = np.asarray(k).reshape(16, 8, 4)
        for j in range(4):
            np.testing.assert_array_equal(k[:, :, j], k[:, :, 0])

    def test_avg_pool_ceil_matches_torch(self):
        import torch

        x = np.random.default_rng(1).normal(size=(1, 4, 25, 25)).astype(np.float32)
        want = torch.nn.AvgPool2d(2, ceil_mode=True)(torch.from_numpy(x)).numpy()
        got = avg_pool_ceil(jnp.moveaxis(jnp.asarray(x), 1, 3), 2)
        np.testing.assert_allclose(np.moveaxis(np.asarray(got), 3, 1), want, rtol=1e-4, atol=1e-6)

    def test_max_pool_matches_torch(self):
        import torch

        x = np.random.default_rng(2).normal(size=(1, 3, 101, 100)).astype(np.float32)
        want = torch.nn.MaxPool2d(3, 2, padding=1)(torch.from_numpy(x)).numpy()
        got = max_pool_torch(jnp.moveaxis(jnp.asarray(x), 1, 3), 3, 2)
        np.testing.assert_allclose(np.moveaxis(np.asarray(got), 3, 1), want, rtol=1e-4, atol=1e-6)

    def test_blur_matches_torch(self):
        import torch

        x = np.random.default_rng(3).normal(size=(1, 2, 10, 10)).astype(np.float32)
        t = torch.nn.ReplicationPad2d((1, 0, 1, 0))(torch.from_numpy(x))
        want = torch.nn.AvgPool2d(2, stride=1)(t).numpy()
        got = replication_blur(jnp.moveaxis(jnp.asarray(x), 1, 3))
        np.testing.assert_allclose(np.moveaxis(np.asarray(got), 3, 1), want, rtol=1e-4, atol=1e-6)


class TestXResNet:
    @pytest.mark.parametrize("arch,exp_c", [("xresnet18", 512), ("xresnet34", 512), ("xresnet50", 2048)])
    def test_feature_and_skip_shapes(self, arch, exp_c):
        m = XResNetBody(arch=arch, c_in=4, dtype=jnp.float32)
        x = jnp.zeros((1, 64, 64, 4))
        (feats, skips), _ = m.init_with_output(jax.random.PRNGKey(0), x)
        assert feats.shape == (1, 2, 2, exp_c)  # /32
        assert [s.shape[1] for s in skips] == [4, 8, 16, 32]  # /16 /8 /4 /2 deepest-first

    def test_xresnet34_skip_channels(self):
        m = XResNetBody(arch="xresnet34", c_in=3, dtype=jnp.float32)
        (feats, skips), _ = m.init_with_output(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
        assert [s.shape[-1] for s in skips] == [256, 128, 64, 64]


class TestDynamicUnet:
    def _init(self, model, shape):
        x = jnp.zeros(shape, jnp.float32)
        vars_ = model.init(jax.random.PRNGKey(0), x, train=False)
        return vars_, x

    def test_output_shape_pow2(self):
        m = build_unet("xresnet18", n_out=3, c_in=4, dtype=jnp.float32)
        v, x = self._init(m, (2, 64, 64, 4))
        y = m.apply(v, x, train=False)
        assert y.shape == (2, 64, 64, 3)
        assert y.dtype == jnp.float32

    def test_output_shape_nonpow2(self):
        # 100 → 50/25/13/7/4 with odd sizes stressing the resize paths
        m = build_unet("xresnet18", n_out=2, c_in=3, dtype=jnp.float32)
        v, x = self._init(m, (1, 100, 100, 3))
        y = m.apply(v, x, train=False)
        assert y.shape == (1, 100, 100, 2)

    def test_self_attention_param_exists(self):
        m = build_unet("xresnet18", n_out=2, c_in=3, self_attention=True, dtype=jnp.float32)
        v, x = self._init(m, (1, 64, 64, 3))
        # SA goes in the third-from-last UnetBlock: up_1 of 4
        assert "sa" in v["params"]["up_1"]
        y = m.apply(v, x, train=False)
        assert y.shape == (1, 64, 64, 2)

    def test_self_attention_spectral_norm(self):
        """fastai wraps the SA projections in torch spectral_norm
        (layers.SelfAttention docstring): power iteration must converge to
        the true top singular value, u persists in batch_stats, and the
        gamma=0 init keeps SA an identity."""
        from unet_tpu.models.layers import SelfAttention

        sa = SelfAttention(dtype=jnp.float32)
        x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 8, 8, 32)),
                        jnp.float32)
        v = sa.init(jax.random.PRNGKey(0), x, False)
        assert set(v["batch_stats"]) == {"query_u", "key_u", "value_u"}
        np.testing.assert_allclose(sa.apply(v, x, False), x, atol=1e-6)

        step = jax.jit(lambda vars_, x: sa.apply(vars_, x, True,
                                                 mutable=["batch_stats"]))
        stats = v["batch_stats"]
        for _ in range(40):
            _, mut = step({"params": v["params"], "batch_stats": stats}, x)
            stats = mut["batch_stats"]
        k = np.asarray(v["params"]["value_kernel"])
        u = np.asarray(stats["value_u"])
        kv = k @ u
        kv /= np.linalg.norm(kv)
        sigma = kv @ k @ u
        true = np.linalg.svd(k, compute_uv=False)[0]
        np.testing.assert_allclose(sigma, true, rtol=1e-4)

    def test_train_mode_updates_batch_stats(self):
        m = build_unet("xresnet18", n_out=2, c_in=3, dtype=jnp.float32)
        v, _ = self._init(m, (2, 32, 32, 3))
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
        y, mutated = m.apply(v, x, train=True, mutable=["batch_stats"])
        before = jax.tree_util.tree_leaves(v["batch_stats"])
        after = jax.tree_util.tree_leaves(mutated["batch_stats"])
        assert any(not np.allclose(b, a) for b, a in zip(before, after))

    def test_gradients_flow_to_all_params(self):
        """Every parameter receives gradient after one update.

        At initialization the Bag-of-Tricks zero-init gammas (BatchZero)
        exactly block gradients into each residual conv path — by design.
        After one step those gammas become non-zero and gradient flows
        everywhere, which is what this asserts.
        """
        m = build_unet("xresnet18", n_out=2, c_in=3, dtype=jnp.float32)
        v, _ = self._init(m, (2, 32, 32, 3))
        x = jax.random.normal(jax.random.PRNGKey(2), (2, 32, 32, 3))

        def loss_fn(params):
            y = m.apply({"params": params, "batch_stats": v["batch_stats"]}, x,
                        train=True, mutable=["batch_stats"])[0]
            return jnp.mean(y ** 2)

        g1 = jax.grad(loss_fn)(v["params"])
        params2 = jax.tree_util.tree_map(lambda p, g: p - 0.5 * g, v["params"], g1)
        g2 = jax.grad(loss_fn)(params2)
        zero_grads = [
            jax.tree_util.keystr(p)
            for p, g in jax.tree_util.tree_leaves_with_path(g2)
            if np.all(np.asarray(g) == 0.0)  # exact zeros = truly dead path
        ]
        assert not zero_grads, f"dead parameters: {zero_grads[:5]}"

    def test_decoder_channel_walk_xresnet34(self):
        """Decoder widths must match the fastai-derived walk:
        512 → UB(512) → UB(384) → UB(256) → UB(96) → head."""
        m = build_unet("xresnet34", n_out=3, c_in=5, dtype=jnp.float32)
        v, x = self._init(m, (1, 64, 64, 5))
        p = v["params"]
        assert p["up_0"]["conv1"]["conv"]["kernel"].shape[-1] == 512
        assert p["up_1"]["conv1"]["conv"]["kernel"].shape[-1] == 384
        assert p["up_2"]["conv1"]["conv"]["kernel"].shape[-1] == 256
        assert p["up_3"]["conv1"]["conv"]["kernel"].shape[-1] == 96
        # last_cross operates on 96 + c_in channels
        assert p["last_cross"]["conv1"]["conv"]["kernel"].shape[-2] == 96 + 5
        assert p["head"]["kernel"].shape == (1, 1, 96 + 5, 3)

    def test_bad_arch_raises(self):
        with pytest.raises(ValueError, match="Unknown architecture"):
            build_unet("resnet999")


class TestDeepVariant:
    def test_xresnet34_deep_unet(self):
        """34_deep has 6 stages → 6 skips → 6 UnetBlocks; the general
        skip-derivation rule must handle it."""
        from unet_tpu.models import XResNetBody

        m = XResNetBody(arch="xresnet34_deep", c_in=3, dtype=jnp.float32)
        (feats, skips), _ = m.init_with_output(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))
        assert feats.shape[1] == 1  # /128
        assert [s.shape[1] for s in skips] == [2, 4, 8, 16, 32, 64]
        u = build_unet("xresnet34_deep", n_out=2, c_in=3, dtype=jnp.float32)
        v = u.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)), train=False)
        y = u.apply(v, jnp.zeros((1, 128, 128, 3)), train=False)
        assert y.shape == (1, 128, 128, 2)


class TestShuffleConvEquivalence:
    """PixelShuffleICNR's transposed-conv compute must be bit-equal to the
    conv1x1+pixel_shuffle formulation it replaced (same parameters, no 6-D
    transpose — the parity topology's largest non-FLOP cost)."""

    def test_matches_conv_plus_shuffle(self):
        from unet_tpu.models.layers import _ShuffleConv, pixel_shuffle

        rng = np.random.default_rng(0)
        ni, nf = 7, 5
        x = jnp.asarray(rng.normal(size=(2, 6, 8, ni)).astype(np.float32))
        m = _ShuffleConv(nf * 4, dtype=jnp.float32)
        k = jnp.asarray(rng.normal(size=(1, 1, ni, nf * 4)).astype(np.float32))
        b = jnp.asarray(rng.normal(size=(nf * 4,)).astype(np.float32))
        got = m.apply({"params": {"kernel": k, "bias": b}}, x)
        ref = jnp.einsum("bhwc,co->bhwo", x, k[0, 0]) + b
        ref = pixel_shuffle(ref, 2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=0, atol=1e-6)

    def test_param_tree_unchanged(self):
        """Round-2 bundles must keep loading: shuf/conv/{kernel,bias} with
        the (1,1,ni,4nf) ICNR shape."""
        from unet_tpu.models.layers import PixelShuffleICNR

        m = PixelShuffleICNR(8, dtype=jnp.float32)
        vs = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 4, 16)))
        assert set(vs["params"]) == {"conv"}
        assert vs["params"]["conv"]["kernel"].shape == (1, 1, 16, 32)
        assert vs["params"]["conv"]["bias"].shape == (32,)
        # ICNR property: the 4 phase sub-kernels start identical
        kk = np.asarray(vs["params"]["conv"]["kernel"]).reshape(16, 8, 4)
        assert np.allclose(kk - kk[:, :, :1], 0)


class TestFusedStatsBatchNorm:
    """FusedStatsBatchNorm (UNET_TPU_BN=fused): one variadic reduce for
    (sum, sum-of-squares) must reproduce nn.BatchNorm's fast-variance
    numerics, parameter tree, and running-stat updates."""

    def _pair(self, train, x):
        import flax.linen as nn_
        from unet_tpu.models.layers import FusedStatsBatchNorm

        ref = nn_.BatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5, dtype=jnp.float32,
                            param_dtype=jnp.float32)
        fused = FusedStatsBatchNorm(use_running_average=not train,
                                    dtype=jnp.float32)
        vr = ref.init(jax.random.PRNGKey(0), x)
        vf = fused.init(jax.random.PRNGKey(0), x)
        assert jax.tree_util.tree_structure(vr) == jax.tree_util.tree_structure(vf)
        return ref, fused, vr

    def test_train_mode_matches_flax(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(2.0, 3.0, (4, 8, 8, 5)).astype(np.float32))
        ref, fused, v = self._pair(True, x)
        # non-trivial scale/bias
        v = {"params": {"scale": jnp.asarray(rng.random(5), jnp.float32),
                        "bias": jnp.asarray(rng.random(5), jnp.float32)},
             "batch_stats": v["batch_stats"]}
        yr, ur = ref.apply(v, x, mutable=["batch_stats"])
        yf, uf = fused.apply(v, x, mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(yf), np.asarray(yr),
                                   rtol=1e-5, atol=1e-5)
        for k in ("mean", "var"):
            np.testing.assert_allclose(
                np.asarray(uf["batch_stats"][k]),
                np.asarray(ur["batch_stats"][k]), rtol=1e-5, atol=1e-6)

    def test_eval_mode_matches_flax(self):
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(0, 1, (2, 4, 4, 3)).astype(np.float32))
        ref, fused, v = self._pair(False, x)
        v = {"params": v["params"],
             "batch_stats": {"mean": jnp.asarray(rng.random(3), jnp.float32),
                             "var": jnp.asarray(0.5 + rng.random(3), jnp.float32)}}
        np.testing.assert_allclose(np.asarray(fused.apply(v, x)),
                                   np.asarray(ref.apply(v, x)),
                                   rtol=1e-5, atol=1e-6)

    def test_env_switch_same_param_tree(self, monkeypatch):
        from unet_tpu.models import build_unet

        x = jnp.zeros((1, 32, 32, 3), jnp.float32)
        m = build_unet("xresnet18", n_out=2, c_in=3, dtype=jnp.float32)
        v_flax = jax.jit(lambda k: m.init(k, x, train=False))(jax.random.PRNGKey(0))
        monkeypatch.setenv("UNET_TPU_BN", "fused")
        v_fused = m.init(jax.random.PRNGKey(0), x, train=False)
        assert jax.tree_util.tree_structure(v_flax) == \
            jax.tree_util.tree_structure(v_fused)
        # and the model runs under the fused implementation
        y, _ = m.apply(v_fused, x, train=True, mutable=["batch_stats"])
        assert y.shape == (1, 32, 32, 2)


class TestSliceStatsBatchNorm:
    """SliceStatsBatchNorm (UNET_TPU_BN=slice[:k]) — ghost-/slice-BN whose
    training statistics come from the first k batch samples (VERDICT r4
    next #3). Param tree identical to nn.BatchNorm; k >= N reproduces
    flax's fast-variance numerics; k < N uses exactly x[:k] statistics."""

    def test_full_slice_matches_flax(self):
        import flax.linen as nn_
        from unet_tpu.models.layers import SliceStatsBatchNorm

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(2.0, 3.0, (4, 8, 8, 5)).astype(np.float32))
        ref = nn_.BatchNorm(use_running_average=False, momentum=0.9,
                            epsilon=1e-5, dtype=jnp.float32,
                            param_dtype=jnp.float32)
        sl = SliceStatsBatchNorm(use_running_average=False, n_stat=8,
                                 dtype=jnp.float32)
        v = ref.init(jax.random.PRNGKey(0), x)
        assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(
            sl.init(jax.random.PRNGKey(0), x))
        v = {"params": {"scale": jnp.asarray(rng.random(5), jnp.float32),
                        "bias": jnp.asarray(rng.random(5), jnp.float32)},
             "batch_stats": v["batch_stats"]}
        yr, ur = ref.apply(v, x, mutable=["batch_stats"])
        ys, us = sl.apply(v, x, mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(ys), np.asarray(yr),
                                   rtol=1e-5, atol=1e-5)
        for k in ("mean", "var"):
            np.testing.assert_allclose(
                np.asarray(us["batch_stats"][k]),
                np.asarray(ur["batch_stats"][k]), rtol=1e-5, atol=1e-6)

    def test_partial_slice_uses_first_k_samples(self):
        from unet_tpu.models.layers import SliceStatsBatchNorm

        rng = np.random.default_rng(1)
        x = rng.normal(1.0, 2.0, (6, 4, 4, 3)).astype(np.float32)
        sl = SliceStatsBatchNorm(use_running_average=False, n_stat=2,
                                 dtype=jnp.float32)
        v = sl.init(jax.random.PRNGKey(0), jnp.asarray(x))
        y, upd = sl.apply(v, jnp.asarray(x), mutable=["batch_stats"])
        xs = x[:2].reshape(-1, 3).astype(np.float64)
        mean = xs.mean(0)
        var = np.maximum((xs * xs).mean(0) - mean * mean, 0.0)
        # normalize applies slice stats to the WHOLE batch
        exp = (x - mean.astype(np.float32)) / np.sqrt(
            var.astype(np.float32) + 1e-5)
        np.testing.assert_allclose(np.asarray(y), exp, rtol=1e-4, atol=1e-4)
        # running averages update from the slice stats
        np.testing.assert_allclose(np.asarray(upd["batch_stats"]["mean"]),
                                   0.1 * mean, rtol=1e-5, atol=1e-6)

    def test_eval_uses_running_stats(self):
        import flax.linen as nn_
        from unet_tpu.models.layers import SliceStatsBatchNorm

        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.normal(0, 1, (3, 4, 4, 3)).astype(np.float32))
        ref = nn_.BatchNorm(use_running_average=True, epsilon=1e-5,
                            dtype=jnp.float32, param_dtype=jnp.float32)
        sl = SliceStatsBatchNorm(use_running_average=True, n_stat=1,
                                 dtype=jnp.float32)
        v = {"params": ref.init(jax.random.PRNGKey(0), x)["params"],
             "batch_stats": {"mean": jnp.asarray(rng.random(3), jnp.float32),
                             "var": jnp.asarray(0.5 + rng.random(3), jnp.float32)}}
        np.testing.assert_allclose(np.asarray(sl.apply(v, x)),
                                   np.asarray(ref.apply(v, x)),
                                   rtol=1e-5, atol=1e-6)

    def test_factory_selects_slice_variant(self, monkeypatch):
        from unet_tpu.models.layers import SliceStatsBatchNorm, batch_norm

        monkeypatch.setenv("UNET_TPU_BN", "slice:4")
        bn = batch_norm(train=True)
        assert isinstance(bn, SliceStatsBatchNorm) and bn.n_stat == 4
        monkeypatch.setenv("UNET_TPU_BN", "slice")
        assert batch_norm(train=True).n_stat == 8


class TestGroupNormAsBN:
    """GroupNormAsBN (UNET_TPU_BN=group[:g]) — the batch-stat-free point in
    the round-5 normalization A/B. Param/stat tree identical to
    nn.BatchNorm (running stats kept but never read); statistics per
    (sample, group); train and eval numerics identical."""

    def test_tree_matches_flax_bn(self):
        import flax.linen as nn_
        from unet_tpu.models.layers import GroupNormAsBN

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(0, 1, (2, 8, 8, 6)).astype(np.float32))
        ref = nn_.BatchNorm(use_running_average=False, dtype=jnp.float32,
                            param_dtype=jnp.float32)
        gn = GroupNormAsBN(use_running_average=False, dtype=jnp.float32)
        assert jax.tree_util.tree_structure(
            ref.init(jax.random.PRNGKey(0), x)) == jax.tree_util.tree_structure(
            gn.init(jax.random.PRNGKey(0), x))

    def test_matches_flax_groupnorm(self):
        import flax.linen as nn_
        from unet_tpu.models.layers import GroupNormAsBN

        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(1.5, 2.5, (3, 8, 8, 8)).astype(np.float32))
        gn = GroupNormAsBN(use_running_average=False, groups=4,
                           dtype=jnp.float32)
        v = gn.init(jax.random.PRNGKey(0), x)
        v = {"params": {"scale": jnp.asarray(rng.random(8), jnp.float32),
                        "bias": jnp.asarray(rng.random(8), jnp.float32)},
             "batch_stats": v["batch_stats"]}
        ref = nn_.GroupNorm(num_groups=4, epsilon=1e-5, dtype=jnp.float32,
                            param_dtype=jnp.float32)
        rv = {"params": v["params"]}
        y, upd = gn.apply(v, x, mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref.apply(rv, x)),
                                   rtol=2e-4, atol=2e-4)
        # running stats never move (kept only for tree/bundle compat)
        np.testing.assert_array_equal(np.asarray(upd["batch_stats"]["mean"]),
                                      np.zeros(8, np.float32))
        np.testing.assert_array_equal(np.asarray(upd["batch_stats"]["var"]),
                                      np.ones(8, np.float32))

    def test_train_eval_identical_and_divisor_clamp(self):
        from unet_tpu.models.layers import GroupNormAsBN

        rng = np.random.default_rng(2)
        # C=6 with groups=4 → largest divisor ≤ 4 is 3
        x = jnp.asarray(rng.normal(0, 1, (2, 4, 4, 6)).astype(np.float32))
        tr = GroupNormAsBN(use_running_average=False, groups=4,
                           dtype=jnp.float32)
        ev = GroupNormAsBN(use_running_average=True, groups=4,
                           dtype=jnp.float32)
        v = tr.init(jax.random.PRNGKey(0), x)
        yt, _ = tr.apply(v, x, mutable=["batch_stats"])
        ye = ev.apply(v, x)
        np.testing.assert_array_equal(np.asarray(yt), np.asarray(ye))
        # per-group normalization: each (sample, group) is standardized
        yg = np.asarray(yt).reshape(2, 4, 4, 3, 2)
        for n in range(2):
            for g in range(3):
                vals = yg[n, :, :, g, :]
                assert abs(vals.mean()) < 1e-5
                assert abs(vals.std() - 1.0) < 1e-2

    def test_factory_selects_group_variant(self, monkeypatch):
        from unet_tpu.models.layers import GroupNormAsBN, batch_norm

        monkeypatch.setenv("UNET_TPU_BN", "group:16")
        bn = batch_norm(train=True)
        assert isinstance(bn, GroupNormAsBN) and bn.groups == 16
        monkeypatch.setenv("UNET_TPU_BN", "group")
        assert batch_norm(train=True).groups == 32
