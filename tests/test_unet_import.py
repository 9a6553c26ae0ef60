"""Full-model import: fastai DynamicUnet state_dict → Flax forward parity.

Builds a torch replica of fastai's DynamicUnet exactly as the reference
constructs it (unet_learner_MS, /root/reference/train.py:99-146: blur=True,
blur_final=True, last_cross=True, bottle=False, y_range=None and the
norm_type=NormType *class* quirk that strips every decoder norm and enables
conv bias), randomizes all weights and BN statistics, converts the
state_dict with ``convert_unet_state_dict``, and asserts our DynamicUnet
produces the same logits — proving decoder numerics against torch end to
end, not just the encoder.

The replica mirrors fastai's module layout key-for-key (``layers.N...``,
SequentialEx ModuleList) so a real reference export walks the same path.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from unet_tpu.models import build_unet
from unet_tpu.models.torch_import import (convert_unet_state_dict,
                                          load_unet_state_dict)
from golden_weights import conv_layer, torch_xresnet_body
from test_torch_import import torch_xresnet18_body


def dec_conv(ni, nf, ks=3, act=True):
    """Decoder ConvLayer under the reference's norm-broken quirk: bare conv
    WITH bias (+ ReLU) — fastai ConvLayer(norm_type=<NormType class>)."""
    layers = [tnn.Conv2d(ni, nf, ks, 1, (ks - 1) // 2, bias=True)]
    if act:
        layers.append(tnn.ReLU())
    return tnn.Sequential(*layers)


class TorchPixelShuffleICNR(tnn.Sequential):
    """fastai PixelShuffle_ICNR: ConvLayer(ks=1) → PixelShuffle(2) [→ blur]."""

    def __init__(self, ni, nf=None, blur=False):
        nf = nf or ni
        layers = [dec_conv(ni, nf * 4, ks=1), tnn.PixelShuffle(2)]
        if blur:
            layers += [tnn.ReplicationPad2d((1, 0, 1, 0)),
                       tnn.AvgPool2d(2, stride=1)]
        super().__init__(*layers)


class TorchSelfAttention(tnn.Module):
    """fastai layers.SelfAttention: spectral-normed 1-d conv projections,
    softmax over source tokens, gamma-gated residual."""

    def __init__(self, n_channels):
        super().__init__()

        def _c(nf):  # fastai _conv = ConvLayer(..., ndim=1) → Sequential
            return tnn.Sequential(tnn.utils.spectral_norm(
                tnn.Conv1d(n_channels, nf, 1, bias=False)))

        self.query = _c(n_channels // 8)
        self.key = _c(n_channels // 8)
        self.value = _c(n_channels)
        self.gamma = tnn.Parameter(torch.zeros(1))

    def forward(self, x):
        size = x.size()
        x = x.view(*size[:2], -1)
        f, g, h = self.query(x), self.key(x), self.value(x)
        beta = torch.softmax(torch.bmm(f.transpose(1, 2), g), dim=1)
        o = self.gamma * torch.bmm(h, beta) + x
        return o.view(*size).contiguous()


class TorchUnetBlock(tnn.Module):
    def __init__(self, up_in_c, x_in_c, final_div=True, blur=False, sa=False):
        super().__init__()
        self.shuf = TorchPixelShuffleICNR(up_in_c, up_in_c // 2, blur=blur)
        self.bn = tnn.BatchNorm2d(x_in_c)
        ni = up_in_c // 2 + x_in_c
        nf = ni if final_div else ni // 2
        self.conv1 = dec_conv(ni, nf)
        conv2 = [tnn.Conv2d(nf, nf, 3, 1, 1, bias=True), tnn.ReLU()]
        if sa:
            conv2.append(TorchSelfAttention(nf))  # ConvLayer xtra → index 2
        self.conv2 = tnn.Sequential(*conv2)
        self.relu = tnn.ReLU()
        self.out_c = nf

    def forward(self, up_in, s):
        up_out = self.shuf(up_in)
        cat = self.relu(torch.cat([up_out, self.bn(s)], dim=1))
        return self.conv2(self.conv1(cat))


class TorchResBlockNC(tnn.Module):
    """last_cross ResBlock under the norm-broken quirk (ni == nf when
    bottle=False, so the identity path is empty)."""

    def __init__(self, ni, nf):
        super().__init__()
        self.convpath = tnn.Sequential(dec_conv(ni, nf),
                                       dec_conv(nf, nf, act=False))
        self.idpath = tnn.Sequential()
        self.act = tnn.ReLU()

    def forward(self, x):
        return self.act(self.convpath(x) + self.idpath(x))


class TorchBottleneckBlock(tnn.Module):
    """fastai ResBlock (expansion 4): 1x1 → 3x3(stride) → 1x1 zero-BN."""

    def __init__(self, ni, nf, stride=1):
        super().__init__()
        self.convpath = tnn.Sequential(
            conv_layer(ni, nf, 1),
            conv_layer(nf, nf, 3, stride),
            conv_layer(nf, nf * 4, 1, act=False, zero_bn=True),
        )
        idlayers = []
        if stride != 1:
            idlayers.append(tnn.AvgPool2d(2, ceil_mode=True))
        if ni != nf * 4:
            idlayers.append(conv_layer(ni, nf * 4, 1, act=False))
        self.idpath = tnn.Sequential(*idlayers)
        self.act = tnn.ReLU()

    def forward(self, x):
        return self.act(self.convpath(x) + self.idpath(x))


def torch_xresnet50_body(c_in=3, layers=(3, 4, 6, 3)):
    """fastai create_body(xresnet50/101): same stem/stage layout as
    expansion-1, bottleneck blocks with 4x output channels."""
    stem = [conv_layer(c_in, 32, stride=2), conv_layer(32, 32),
            conv_layer(32, 64)]
    widths = [64, 128, 256, 512]
    stages = []
    ni = 64
    for s, n in enumerate(layers):
        nf = widths[s]
        blocks = [TorchBottleneckBlock(ni if b == 0 else nf * 4, nf,
                                       stride=1 if (s == 0 or b > 0) else 2)
                  for b in range(n)]
        stages.append(tnn.Sequential(*blocks))
        ni = nf * 4
    return tnn.Sequential(*stem, tnn.MaxPool2d(3, 2, 1), *stages)


# final encoder channels + skip channels (deepest hook first) per arch
ARCH_DECODER = {
    "xresnet18": (512, [256, 128, 64, 64]),
    "xresnet34": (512, [256, 128, 64, 64]),
    "xresnet50": (2048, [1024, 512, 256, 64]),
    "xresnet101": (2048, [1024, 512, 256, 64]),
}


class TorchDynamicUnet(tnn.Module):
    """fastai DynamicUnet over an xresnet18 body, reference-effective config.

    ModuleList indices mirror fastai SequentialEx: 0 encoder, 1 BatchNorm,
    2 ReLU, 3 middle_conv, 4-7 UnetBlocks, 8 PixelShuffle_ICNR,
    9 ResizeToOrig, 10 MergeLayer, 11 ResBlock, 12 head.
    """

    SKIP_IDXS = (6, 5, 4, 2)  # encoder children hooked, deepest first

    def __init__(self, c_in=3, n_out=3, self_attention=False,
                 arch="xresnet18"):
        super().__init__()
        if arch == "xresnet50":
            encoder = torch_xresnet50_body(c_in)
        elif arch == "xresnet101":
            encoder = torch_xresnet50_body(c_in, layers=(3, 4, 23, 3))
        else:
            # both expansion-1 bodies share widths/skip channels; layout is
            # identical to test_torch_import.torch_xresnet18_body
            encoder = torch_xresnet_body(arch, c_in)
        ni, skip_cs = ARCH_DECODER[arch]
        middle = tnn.Sequential(dec_conv(ni, ni * 2), dec_conv(ni * 2, ni))
        blocks, x_c = [], ni
        n = len(skip_cs)
        for i, sc in enumerate(skip_cs):
            not_final = i != n - 1
            blk = TorchUnetBlock(
                x_c, sc, final_div=not_final,
                blur=True,  # blur=True + blur_final=True → every block
                sa=self_attention and i == n - 3)
            blocks.append(blk)
            x_c = blk.out_c
        final_shuf = TorchPixelShuffleICNR(x_c, blur=False)
        ni2 = x_c + c_in  # MergeLayer(dense=True) concats the input
        self.layers = tnn.ModuleList([
            encoder, tnn.BatchNorm2d(ni), tnn.ReLU(), middle, *blocks,
            final_shuf, tnn.Identity(), tnn.Identity(),
            TorchResBlockNC(ni2, ni2),
            tnn.Sequential(tnn.Conv2d(ni2, n_out, 1, bias=True)),
        ])

    def forward(self, x):
        orig = x
        skips = {}
        y = x
        for i, child in enumerate(self.layers[0]):
            y = child(y)
            if i in self.SKIP_IDXS:
                skips[i] = y
        y = self.layers[3](self.layers[2](self.layers[1](y)))
        for j, idx in enumerate(self.SKIP_IDXS):
            y = self.layers[4 + j](y, skips[idx])
        y = self.layers[8](y)  # final PixelShuffle_ICNR back to full res
        y = torch.cat([y, orig], dim=1)  # ResizeToOrig no-op (even sizes)
        return self.layers[12](self.layers[11](y))


def make_torch_unet(c_in=3, n_out=3, self_attention=False, seed=0,
                    arch="xresnet18"):
    torch.manual_seed(seed)
    m = TorchDynamicUnet(c_in, n_out, self_attention, arch)
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, tnn.BatchNorm2d):
                mod.weight.mul_(0.5).add_(0.3)
                mod.bias.add_(torch.randn_like(mod.bias) * 0.1)
                mod.running_mean.add_(torch.randn_like(mod.running_mean) * 0.2)
                mod.running_var.mul_(1.5)
        # gamma = 0 would hide the attention path entirely
        for mod in m.modules():
            if isinstance(mod, TorchSelfAttention):
                mod.gamma.add_(0.7)
    if self_attention:
        # converge the spectral-norm power iteration so torch's stored (u, v)
        # pair is self-consistent — our import keeps u and recomputes v
        m.train()
        with torch.no_grad():
            for _ in range(30):
                m(torch.randn(2, c_in, 64, 64))
    m.eval()
    return m


def flax_from_torch(m, c_in, n_out, self_attention, arch="xresnet18"):
    sd = {k: v.numpy() for k, v in m.state_dict().items()}
    model = build_unet(arch, n_out=n_out, c_in=c_in,
                       self_attention=self_attention, dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, c_in)), train=False)
    variables = jax.tree_util.tree_map(np.asarray, variables)
    return model, load_unet_state_dict(variables, sd)


class TestFullModelParity:
    def test_forward_parity(self):
        m = make_torch_unet(c_in=3, n_out=3)
        x = np.random.default_rng(7).normal(size=(2, 3, 64, 64)).astype(np.float32)
        with torch.no_grad():
            want = m(torch.from_numpy(x)).numpy()
        model, variables = flax_from_torch(m, 3, 3, False)
        got = model.apply(variables, jnp.asarray(np.moveaxis(x, 1, 3)),
                          train=False)
        got = np.moveaxis(np.asarray(got), 3, 1)
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-3)

    def test_forward_parity_multispectral_sa(self):
        """5-band input + self-attention: the converter must carry the SA
        spectral-norm kernels/u-vectors and the 5-channel stem verbatim."""
        m = make_torch_unet(c_in=5, n_out=4, self_attention=True, seed=1)
        x = np.random.default_rng(8).normal(size=(1, 5, 64, 64)).astype(np.float32)
        with torch.no_grad():
            want = m(torch.from_numpy(x)).numpy()
        model, variables = flax_from_torch(m, 5, 4, True)
        got = model.apply(variables, jnp.asarray(np.moveaxis(x, 1, 3)),
                          train=False)
        got = np.moveaxis(np.asarray(got), 3, 1)
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-3)

    def test_forward_parity_xresnet34(self):
        """The reference's DEFAULT arch (params_and_main.py:99): full
        DynamicUnet over an xresnet34 body, inferred from the weights."""
        m = make_torch_unet(c_in=3, n_out=3, seed=6, arch="xresnet34")
        sd = {k: v.numpy() for k, v in m.state_dict().items()}
        _, _, meta = convert_unet_state_dict(sd)
        assert meta["arch"] == "xresnet34"
        x = np.random.default_rng(10).normal(
            size=(1, 3, 64, 64)).astype(np.float32)
        with torch.no_grad():
            want = m(torch.from_numpy(x)).numpy()
        model, variables = flax_from_torch(m, 3, 3, False, arch="xresnet34")
        got = model.apply(variables, jnp.asarray(np.moveaxis(x, 1, 3)),
                          train=False)
        got = np.moveaxis(np.asarray(got), 3, 1)
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-3)

    def test_forward_parity_xresnet50(self):
        """Expansion-4 migration: bottleneck encoder (convpath.2 conv3),
        2048-channel decoder walk."""
        m = make_torch_unet(c_in=3, n_out=2, seed=7, arch="xresnet50")
        sd = {k: v.numpy() for k, v in m.state_dict().items()}
        _, _, meta = convert_unet_state_dict(sd)
        assert meta["arch"] == "xresnet50"
        x = np.random.default_rng(11).normal(
            size=(1, 3, 64, 64)).astype(np.float32)
        with torch.no_grad():
            want = m(torch.from_numpy(x)).numpy()
        model, variables = flax_from_torch(m, 3, 2, False, arch="xresnet50")
        got = model.apply(variables, jnp.asarray(np.moveaxis(x, 1, 3)),
                          train=False)
        got = np.moveaxis(np.asarray(got), 3, 1)
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-3)

    def test_forward_parity_xresnet101(self):
        """Deepest supported encoder: 23-block stage-3, same expansion-4
        conversion path as 50 — meta inference must separate them by depth."""
        m = make_torch_unet(c_in=3, n_out=2, seed=8, arch="xresnet101")
        sd = {k: v.numpy() for k, v in m.state_dict().items()}
        _, _, meta = convert_unet_state_dict(sd)
        assert meta["arch"] == "xresnet101"
        x = np.random.default_rng(13).normal(
            size=(1, 3, 64, 64)).astype(np.float32)
        with torch.no_grad():
            want = m(torch.from_numpy(x)).numpy()
        model, variables = flax_from_torch(m, 3, 2, False, arch="xresnet101")
        got = model.apply(variables, jnp.asarray(np.moveaxis(x, 1, 3)),
                          train=False)
        got = np.moveaxis(np.asarray(got), 3, 1)
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-3)

    def test_meta_inference(self):
        m = make_torch_unet(c_in=5, n_out=4, self_attention=True, seed=2)
        sd = {k: v.numpy() for k, v in m.state_dict().items()}
        _, _, meta = convert_unet_state_dict(sd)
        assert meta == {"arch": "xresnet18", "c_in": 5, "n_out": 4,
                        "self_attention": True, "n_blocks": 4}

    def test_rejects_tpu_opt_target(self):
        m = make_torch_unet()
        sd = {k: v.numpy() for k, v in m.state_dict().items()}
        model = build_unet("xresnet18", n_out=3, c_in=3, tpu_opt=True,
                           dtype=jnp.float32)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 3)), train=False)
        with pytest.raises(ValueError, match="tpu_opt|line up"):
            load_unet_state_dict(
                jax.tree_util.tree_map(np.asarray, variables), sd)

    def test_rejects_encoder_only_state_dict(self):
        body = torch_xresnet18_body()
        sd = {k: v.numpy() for k, v in body.state_dict().items()}
        with pytest.raises(ValueError, match="learn.model.state_dict"):
            convert_unet_state_dict(sd)


class TestInferArch:
    def test_all_variants(self):
        """Arch inference must distinguish every supported xresnet from its
        encoder key structure alone (expansion via the third convpath conv,
        depth via stage/block key presence)."""
        from unet_tpu.models.torch_import import _infer_arch
        from unet_tpu.models.xresnet import ARCHS

        for name, (expansion, layers) in ARCHS.items():
            sd = {}
            for s, n_blocks in enumerate(layers):
                for b in range(n_blocks):
                    sd[f"{4 + s}.{b}.convpath.0.0.weight"] = None
                    if expansion == 4:
                        sd[f"{4 + s}.{b}.convpath.2.0.weight"] = None
            assert _infer_arch(sd) == name, name

    def test_unknown_structure_rejected(self):
        from unet_tpu.models.torch_import import _infer_arch

        with pytest.raises(ValueError, match="no known architecture"):
            _infer_arch({"4.0.convpath.0.0.weight": None})


class TestImportModelCLI:
    def test_pth_to_bundle_to_prediction(self, tmp_path):
        from unet_tpu.models.torch_import import import_model_cli
        from unet_tpu.train.checkpoint import load_bundle

        m = make_torch_unet(c_in=3, n_out=2, seed=3)
        pth = tmp_path / "model_sd.pth"
        torch.save(m.state_dict(), pth)

        bundle = tmp_path / "imported_model"
        out = import_model_cli(str(pth), str(bundle), patch_size=64,
                               codes=["background", "tree"])
        model, variables, manifest = load_bundle(out)
        assert manifest["ARCHITECTURE"] == "xresnet18"
        assert manifest["n_out"] == 2 and manifest["number_of_bands"] == 3
        assert manifest["patch_size"] == 64 and not manifest["tpu_opt"]

        # the bundle predicts what the torch model predicts
        x = np.random.default_rng(9).normal(size=(1, 3, 64, 64)).astype(np.float32)
        with torch.no_grad():
            want = m(torch.from_numpy(x)).numpy().argmax(1)
        got = model.apply(variables, jnp.asarray(np.moveaxis(x, 1, 3)),
                          train=False)
        got = np.asarray(got).argmax(-1)
        assert (got == want).mean() > 0.99

    def test_regression_import_predicts_values(self, tmp_path):
        """A migrated regression model (n_out=1, --regression) drives the
        value-map prediction path: Predictor picks enable_regression up
        from the manifest and returns continuous values, not argmax."""
        from unet_tpu.models.torch_import import import_model_cli
        from unet_tpu.predict.predict import Predictor

        m = make_torch_unet(c_in=3, n_out=1, seed=9)
        pth = tmp_path / "sd.pth"
        torch.save(m.state_dict(), pth)
        out = import_model_cli(str(pth), str(tmp_path / "reg"),
                               patch_size=64, regression=True,
                               dtype_str="float32")
        p = Predictor(out, batch_size=2)
        assert p.regression and p.scale == 1.0

        x = np.random.default_rng(14).normal(
            size=(2, 3, 64, 64)).astype(np.float32)
        with torch.no_grad():
            want = m(torch.from_numpy(x)).numpy()  # (2, 1, 64, 64)
        got = p.predict_batch(np.moveaxis(x, 1, 3))  # (2, 64, 64, 1)
        assert got.shape == (2, 64, 64, 1)
        got = np.moveaxis(got, 3, 1)
        # the rebuilt bundle runs bf16 — compare values loosely but assert
        # they are the torch model's values, not class indices
        rel = np.abs(got - want).mean() / (np.abs(want).mean() + 1e-9)
        assert rel < 0.05, rel
        assert np.unique(got).size > 100  # continuous, not argmax

    def test_continue_training_from_imported_bundle(self, tmp_path, capsys):
        """The reference's existing_model workflow (train.py:225 load_learner
        then keep training) applied to a MIGRATED model: import-model bundle
        → Trainer(existing_model=...) adopts the bundle topology and starts
        from the imported weights."""
        from unet_tpu.geo import write_raster
        from unet_tpu.models.torch_import import import_model_cli
        from unet_tpu.tiling import split_raster
        from unet_tpu.train import TrainerConfig, train_model
        from unet_tpu.train.checkpoint import load_bundle

        m = make_torch_unet(c_in=3, n_out=2, seed=4)
        pth = tmp_path / "sd.pth"
        torch.save(m.state_dict(), pth)
        imported = import_model_cli(str(pth), str(tmp_path / "imported"),
                                    patch_size=32, dtype_str="uint8",
                                    codes=["bg", "target"])

        rng = np.random.default_rng(12)
        img = rng.integers(1, 100, size=(3, 64, 64)).astype(np.uint8)
        bright = rng.random(size=(64, 64)) < 0.5
        img[0][bright] = 200
        T = (500000.0, 0.5, 0.0, 5400000.0, 0.0, -0.5)
        write_raster(tmp_path / "s.tif", img, transform=T, crs="EPSG:25832")
        write_raster(tmp_path / "m.tif", bright.astype(np.uint8)[None],
                     transform=T, crs="EPSG:25832")
        base = tmp_path / "tiles"
        split_raster(str(tmp_path / "s.tif"), str(tmp_path / "m.tif"),
                     str(base), patch_size=32, patch_overlap=0,
                     split=[0.75, 0.25], max_empty=1.0, seed=3)

        cfg = TrainerConfig(
            data_path=base, model_path=tmp_path / "models",
            description="continued", batch_size=2, epochs=1, lr=1e-3,
            arch="xresnet34",  # wrong on purpose: bundle topology must win
            codes=["bg", "target"], bf16=False, seed=0,
            visualize_data_example=False, existing_model=imported)
        bundle = train_model(cfg)
        out = capsys.readouterr().out
        assert "adopting bundle topology" in out

        _, _, manifest = load_bundle(bundle)
        assert manifest["ARCHITECTURE"] == "xresnet18"
        assert manifest["tpu_opt"] is False
