import jax.numpy as jnp
import numpy as np
import pytest

from unet_tpu.train import losses, metrics, schedule


def _rand_logits_targets(rng, b=2, h=8, w=8, c=4):
    logits = rng.normal(size=(b, h, w, c)).astype(np.float32)
    targets = rng.integers(0, c, size=(b, h, w)).astype(np.int32)
    return logits, targets


class TestLossesVsTorch:
    def test_weighted_cross_entropy(self, rng):
        import torch
        import torch.nn.functional as F

        logits, targets = _rand_logits_targets(rng)
        weight = np.array([0.1, 1.0, 2.0, 0.5], np.float32)
        # torch layout: (B, C, H, W)
        want = F.cross_entropy(
            torch.from_numpy(np.moveaxis(logits, 3, 1)),
            torch.from_numpy(targets).long(),
            weight=torch.from_numpy(weight),
        ).item()
        got = losses.cross_entropy(jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(weight))
        assert got == pytest.approx(want, rel=1e-5)

    def test_unweighted_cross_entropy(self, rng):
        import torch
        import torch.nn.functional as F

        logits, targets = _rand_logits_targets(rng)
        want = F.cross_entropy(
            torch.from_numpy(np.moveaxis(logits, 3, 1)), torch.from_numpy(targets).long()
        ).item()
        got = losses.cross_entropy(jnp.asarray(logits), jnp.asarray(targets))
        assert got == pytest.approx(want, rel=1e-5)

    def test_focal_loss(self, rng):
        import torch
        import torch.nn.functional as F

        logits, targets = _rand_logits_targets(rng)
        gamma = 2.0
        ce = F.cross_entropy(
            torch.from_numpy(np.moveaxis(logits, 3, 1)),
            torch.from_numpy(targets).long(),
            reduction="none",
        )
        want = (((1 - torch.exp(-ce)) ** gamma) * ce).mean().item()
        got = losses.focal_loss(jnp.asarray(logits), jnp.asarray(targets), gamma)
        assert got == pytest.approx(want, rel=1e-4)

    def test_mse_l1(self, rng):
        p = rng.normal(size=(2, 8, 8, 1)).astype(np.float32)
        t = rng.normal(size=(2, 8, 8, 1)).astype(np.float32)
        assert losses.mse_loss(jnp.asarray(p), jnp.asarray(t)) == pytest.approx(np.mean((p - t) ** 2), rel=1e-5)
        assert losses.l1_loss(jnp.asarray(p), jnp.asarray(t)) == pytest.approx(np.mean(abs(p - t)), rel=1e-5)

    def test_dice_loss_perfect_prediction_near_zero(self):
        targets = np.zeros((1, 4, 4), np.int32)
        targets[:, 2:, :] = 1
        logits = np.full((1, 4, 4, 2), -20.0, np.float32)
        logits[..., 0] = np.where(targets == 0, 20.0, -20.0)
        logits[..., 1] = np.where(targets == 1, 20.0, -20.0)
        val = losses.dice_loss(jnp.asarray(logits), jnp.asarray(targets))
        assert float(val) == pytest.approx(0.0, abs=1e-4)

    def test_build_loss_defaults(self):
        assert losses.build_loss(None, regression=True) is losses.mse_loss
        fn = losses.build_loss(None, regression=False, weight=jnp.ones(3))
        logits = jnp.zeros((1, 2, 2, 3))
        targets = jnp.zeros((1, 2, 2), jnp.int32)
        assert np.isfinite(float(fn(logits, targets)))

    def test_build_loss_unknown_raises(self):
        with pytest.raises(ValueError):
            losses.build_loss("nope")


class TestDiceMulti:
    def test_perfect_prediction_is_one(self, rng):
        logits, targets = _rand_logits_targets(rng, c=3)
        logits = np.eye(3, dtype=np.float32)[targets] * 10
        st = metrics.dice_multi_init(3)
        st = metrics.dice_multi_update(st, jnp.asarray(logits), jnp.asarray(targets))
        assert float(metrics.dice_multi_value(st)) == pytest.approx(1.0)

    def test_batch_accumulation_matches_fastai_formula(self, rng):
        n_c = 3
        st = metrics.dice_multi_init(n_c)
        all_p, all_t = [], []
        for _ in range(4):
            logits, targets = _rand_logits_targets(rng, c=n_c)
            st = metrics.dice_multi_update(st, jnp.asarray(logits), jnp.asarray(targets))
            all_p.append(np.argmax(logits, -1).ravel())
            all_t.append(targets.ravel())
        p, t = np.concatenate(all_p), np.concatenate(all_t)
        dices = []
        for c in range(n_c):
            inter = np.sum((p == c) & (t == c))
            union = np.sum(p == c) + np.sum(t == c)
            dices.append(2 * inter / union if union > 0 else np.nan)
        assert float(metrics.dice_multi_value(st)) == pytest.approx(np.nanmean(dices), rel=1e-6)

    def test_absent_class_excluded(self):
        # class 2 never appears in pred or target → excluded from the mean
        logits = np.zeros((1, 2, 2, 3), np.float32)
        logits[..., 0] = 10
        targets = np.zeros((1, 2, 2), np.int32)
        st = metrics.dice_multi_init(3)
        st = metrics.dice_multi_update(st, jnp.asarray(logits), jnp.asarray(targets))
        assert float(metrics.dice_multi_value(st)) == pytest.approx(1.0)  # only class 0 present


class TestRegressionMetrics:
    def test_r2_matches_sklearn(self, rng):
        from sklearn.metrics import r2_score

        y = rng.normal(size=500).astype(np.float32)
        p = y + 0.3 * rng.normal(size=500).astype(np.float32)
        st = metrics.regression_init()
        for i in range(0, 500, 100):  # batched accumulation
            st = metrics.regression_update(st, jnp.asarray(p[i:i+100]), jnp.asarray(y[i:i+100]))
        assert float(metrics.r2_value(st)) == pytest.approx(r2_score(y, p), rel=1e-4)
        assert float(metrics.rmse_value(st)) == pytest.approx(np.sqrt(np.mean((p - y) ** 2)), rel=1e-5)

    def test_foreground_acc(self):
        logits = np.zeros((1, 2, 2, 3), np.float32)
        logits[..., 1] = 5  # predict class 1 everywhere
        targets = np.array([[[0, 1], [1, 2]]], np.int32)
        acc = metrics.foreground_acc(jnp.asarray(logits), jnp.asarray(targets), bkg_idx=0)
        assert float(acc) == pytest.approx(2 / 3)


class TestSchedules:
    def test_one_cycle_endpoints(self):
        s = schedule.one_cycle_lr(1e-3, 1000)
        assert s(0) == pytest.approx(1e-3 / 25)
        assert s(250) == pytest.approx(1e-3, rel=1e-6)
        assert s(1000) == pytest.approx(1e-3 / 1e5, rel=1e-3)

    def test_momentum_cycle(self):
        m = schedule.one_cycle_momentum(100)
        assert m(0) == pytest.approx(0.95)
        assert m(25) == pytest.approx(0.85)
        assert m(100) == pytest.approx(0.95)

    def test_even_mults(self):
        got = schedule.even_mults(1e-5, 1e-3, 3)
        np.testing.assert_allclose(got, [1e-5, 1e-4, 1e-3], rtol=1e-9)

    def test_discriminative(self):
        lrs = schedule.discriminative_lrs(1e-3, 10.0, 3)
        assert lrs[0] == pytest.approx(1e-4)
        assert lrs[-1] == pytest.approx(1e-3)

    def test_jnp_schedule_matches_host(self):
        from unet_tpu.train.optimizer import jnp_combined_cos

        host = schedule.combined_cos(0.25, 1.0, 5.0, 0.1, 200)
        dev = jnp_combined_cos(0.25, 1.0, 5.0, 0.1, 200)
        for step in [0, 10, 50, 120, 200]:
            assert float(dev(jnp.asarray(step))) == pytest.approx(host(step), rel=1e-5)

    def test_lr_suggesters_reasonable(self):
        lrs = schedule.lr_finder_lrs(1e-6, 1.0, 80)
        # synthetic loss curve: plateau, descent, blow-up
        losses_curve = np.concatenate([
            np.full(30, 2.0) + np.random.default_rng(0).normal(0, .01, 30),
            np.linspace(2.0, 0.5, 30),
            np.linspace(0.5, 6.0, 20),
        ])
        for m in ("minimum", "steep", "valley", "slide"):
            lr = schedule.suggest_lr(lrs, losses_curve, m)
            assert 1e-7 < lr < 1.0


class TestOptimizer:
    def test_matches_torch_adamw_constant_lr(self, rng):
        """With constant lr/mom and ndim>1 params, fastai Adam == torch AdamW
        (eps outside sqrt ~ torch's eps inside denom after sqrt: same form)."""
        import torch

        from unet_tpu.train.optimizer import constant_lr_adam

        w0 = rng.normal(size=(4, 4)).astype(np.float32)
        params = {"w": jnp.asarray(w0)}
        tx = constant_lr_adam(params, lambda s: jnp.asarray(1e-2), mom=0.9, wd=0.01)
        st = tx.init(params)

        tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
        topt = torch.optim.AdamW([tw], lr=1e-2, betas=(0.9, 0.99), eps=1e-5, weight_decay=0.01)

        for i in range(5):
            g = rng.normal(size=(4, 4)).astype(np.float32)
            upd, st = tx.update({"w": jnp.asarray(g)}, st, params)
            params = {"w": params["w"] + upd["w"]}
            tw.grad = torch.from_numpy(g.copy())
            topt.step()
        np.testing.assert_allclose(np.asarray(params["w"]), tw.detach().numpy(), rtol=2e-4, atol=1e-6)

    def test_group_labels(self):
        from unet_tpu.train.optimizer import label_params

        params = {
            "encoder": {"stem_0": {"conv": {"kernel": jnp.zeros((3, 3, 3, 32))}},
                        "stage_0_block_0": {"conv1": {"conv": {"kernel": jnp.zeros((3, 3, 32, 64))}}}},
            "head": {"kernel": jnp.zeros((1, 1, 99, 2))},
        }
        labels = label_params(params)
        assert labels["encoder"]["stem_0"]["conv"]["kernel"] == 0
        assert labels["encoder"]["stage_0_block_0"]["conv1"]["conv"]["kernel"] == 1
        assert labels["head"]["kernel"] == 2

    def test_no_wd_on_bias(self, rng):
        from unet_tpu.train.optimizer import constant_lr_adam

        params = {"b": jnp.asarray(np.full(4, 5.0, np.float32))}
        tx = constant_lr_adam(params, lambda s: jnp.asarray(1e-2), wd=0.5)
        st = tx.init(params)
        upd, st = tx.update({"b": jnp.zeros(4)}, st, params)
        # zero grad + no wd on 1-D params → no movement
        np.testing.assert_allclose(np.asarray(upd["b"]), 0.0, atol=1e-8)


class TestFoldedLossLayout:
    """losses.fold_loss_layout: computing any loss on pre-pixel-shuffle
    (folded) logits must equal the full-resolution value exactly — pixel
    shuffle is a permutation and every loss reduces over all pixels."""

    def _pair(self, seed=0, b=2, h=8, w=8, c=3):
        from unet_tpu.models.layers import pixel_shuffle

        rng = np.random.default_rng(seed)
        # start from the folded layout and derive full-res via the model's
        # own pixel_shuffle — the exact relationship the train path relies on
        folded = rng.standard_normal((b, h // 2, w // 2, 4 * c)).astype(np.float32)
        full = pixel_shuffle(jnp.asarray(folded), 2)
        targets = rng.integers(0, c, (b, h, w)).astype(np.int32)
        return full, jnp.asarray(folded), jnp.asarray(targets)

    def test_cross_entropy_exact(self):
        from unet_tpu.train.losses import cross_entropy, fold_loss_layout

        full, folded, t = self._pair()
        lg, tf = fold_loss_layout(folded, t)
        np.testing.assert_allclose(float(cross_entropy(full, t)),
                                   float(cross_entropy(lg, tf)), rtol=1e-6)
        w = jnp.asarray([0.2, 0.5, 0.3])
        np.testing.assert_allclose(float(cross_entropy(full, t, w)),
                                   float(cross_entropy(lg, tf, w)), rtol=1e-6)

    def test_focal_and_dice_exact(self):
        from unet_tpu.train.losses import dice_loss, focal_loss, fold_loss_layout

        full, folded, t = self._pair(seed=3)
        lg, tf = fold_loss_layout(folded, t)
        np.testing.assert_allclose(float(focal_loss(full, t)),
                                   float(focal_loss(lg, tf)), rtol=1e-6)
        np.testing.assert_allclose(float(dice_loss(full, t)),
                                   float(dice_loss(lg, tf)), rtol=1e-6)

    def test_model_fold_matches_shuffle(self):
        """DynamicUnet(fold_logits=True) output folds to exactly the
        pixel-shuffled full-res logits."""
        from functools import partial

        import jax

        from unet_tpu.models import build_unet
        from unet_tpu.train.losses import cross_entropy, fold_loss_layout

        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.integers(0, 255, (1, 32, 32, 3)).astype(np.float32))
        t = jnp.asarray(rng.integers(0, 2, (1, 32, 32)).astype(np.int32))
        m = build_unet("xresnet18", n_out=2, c_in=3, tpu_opt=True,
                       dtype=jnp.float32)
        v = jax.jit(partial(m.init, train=False))(jax.random.PRNGKey(0), x)
        full, _ = m.apply(v, x, train=True, mutable=["batch_stats"])
        folded, _ = m.apply(v, x, train=True, fold_logits=True,
                            mutable=["batch_stats"])
        assert folded.shape == (1, 16, 16, 8)
        lg, tf = fold_loss_layout(folded, t)
        np.testing.assert_allclose(float(cross_entropy(full, t)),
                                   float(cross_entropy(lg, tf)), rtol=1e-6)


def test_fold_loss_layout_regression_mse_exact():
    """Regression under tpu_opt: MSE on the folded layout must equal the
    full-resolution value (same permutation argument as CE/focal — this
    covers the n_out=1 channel ordering the breadth regression gate runs)."""
    from unet_tpu.models.layers import pixel_shuffle
    from unet_tpu.train.losses import fold_loss_layout, mse_loss

    rng = np.random.default_rng(9)
    b, h, w = 2, 8, 8
    folded = rng.standard_normal((b, h // 2, w // 2, 4)).astype(np.float32)
    full = pixel_shuffle(jnp.asarray(folded), 2)  # (b, h, w, 1)
    targets = jnp.asarray(rng.standard_normal((b, h, w)).astype(np.float32))
    lg, tf = fold_loss_layout(jnp.asarray(folded), targets)
    want = float(mse_loss(full[..., 0], targets))
    got = float(mse_loss(lg[..., 0], tf))
    np.testing.assert_allclose(got, want, rtol=1e-6)
