"""Flax ResNet trunk parity vs a locally built torch ResNet (torchvision
layer naming; torchvision itself is unavailable in this image)."""
import numpy as np
import pytest
import torch
import torch.nn as tnn

from pyvisim_tpu.models.resnet import (
    ResNetTrunk,
    init_params,
    params_from_torch_state_dict,
)


class TorchBasicBlock(tnn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(cout)
        self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride, bias=False), tnn.BatchNorm2d(cout)
            )
        self.relu = tnn.ReLU(inplace=True)

    def forward(self, x):
        idt = x
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        if self.downsample is not None:
            idt = self.downsample(x)
        return self.relu(y + idt)


class TorchResNet18Trunk(tnn.Module):
    def __init__(self, n_stages=4):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU(inplace=True)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        widths = [64, 128, 256, 512]
        cin = 64
        for s in range(n_stages):
            blocks = []
            for b in range(2):
                stride = 2 if s > 0 and b == 0 else 1
                blocks.append(TorchBasicBlock(cin, widths[s], stride))
                cin = widths[s]
            setattr(self, f"layer{s + 1}", tnn.Sequential(*blocks))
        self.n_stages = n_stages

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        for s in range(self.n_stages):
            x = getattr(self, f"layer{s + 1}")(x)
        return x


@pytest.mark.parametrize("n_stages", [2, 4])
def test_resnet18_matches_torch(n_stages, rng):
    torch.manual_seed(0)
    tm = TorchResNet18Trunk(n_stages)
    tm.eval()
    # randomize BN running stats so the test exercises them
    for m in tm.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.uniform_(-0.5, 0.5)
            m.running_var.uniform_(0.5, 1.5)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    variables = params_from_torch_state_dict(sd, "resnet18", n_stages=n_stages)

    x = rng.random((2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    model = ResNetTrunk(cfg_name="resnet18", n_stages=n_stages)
    got = np.asarray(model.apply(variables, x))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_resnet_as_deep_conv_feature():
    from pyvisim_tpu.features import DeepConvFeature

    model = ResNetTrunk(cfg_name="resnet18", n_stages=2)
    variables = init_params("resnet18", n_stages=2, image_size=64)
    ext = DeepConvFeature(module=model, params=variables, image_size=64)
    assert ext.output_dim == 128 + 2
    img = (np.random.default_rng(0).random((80, 60, 3)) * 255).astype(np.uint8)
    desc = ext(img)
    assert desc.shape == (8 * 8, 130)
    assert np.isfinite(desc).all()


def test_resnet50_bottleneck_shapes():
    model = ResNetTrunk(cfg_name="resnet50", n_stages=2)
    variables = init_params("resnet50", n_stages=2, image_size=64)
    import jax.numpy as jnp

    out = model.apply(variables, jnp.zeros((1, 64, 64, 3)))
    assert out.shape == (1, 8, 8, 512)  # 128 * 4 bottleneck expansion
    assert model.out_channels == 512


def test_resnet_int8_fidelity_and_param_compat():
    """int8 ResNet blocks share the float path's parameter tree and stay
    within the same encoding-fidelity envelope as the VGG int8 path.
    (Perf note: on v5e, resnet50 bf16 measures 11.8k img/s and int8 does
    NOT improve it — bandwidth-bound; the option defaults off.)"""
    import jax
    import jax.numpy as jnp

    from pyvisim_tpu.models import resnet as R

    params = R.init_params("resnet50", image_size=64)
    m_f = R.ResNetTrunk(cfg_name="resnet50", dtype=jnp.float32)
    m_q = R.ResNetTrunk(
        cfg_name="resnet50", dtype=jnp.float32, int8=True,
        int8_min_spatial=1, int8_max_spatial=64,
    )
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 64, 64, 3))
    a = np.asarray(m_f.apply(params, x)).reshape(2, -1)
    b = np.asarray(m_q.apply(params, x)).reshape(2, -1)
    cos = (a * b).sum(1) / (
        np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1) + 1e-12
    )
    assert (cos > 0.995).all(), cos
