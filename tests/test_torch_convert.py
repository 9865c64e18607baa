"""torch -> flax conversion parity: a torch ResNet-18 (torchvision layout)
and the converted flax backbone agree on eval-mode feature outputs."""
import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
from torch import nn
import torch.nn.functional as F

from centernet_lightning_tpu.models.backbones import build_backbone
from centernet_lightning_tpu.utils.torch_convert import convert_resnet_state_dict


class TorchBasicBlock(nn.Module):
    def __init__(self, c_in, c_out, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(c_in, c_out, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(c_out)
        self.conv2 = nn.Conv2d(c_out, c_out, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(c_out)
        self.downsample = None
        if stride != 1 or c_in != c_out:
            self.downsample = nn.Sequential(
                nn.Conv2d(c_in, c_out, 1, stride, bias=False),
                nn.BatchNorm2d(c_out),
            )

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        y = F.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return F.relu(y + idn)


class TorchResNet18(nn.Module):
    """torchvision-naming ResNet-18 feature extractor."""

    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        chans = [64, 128, 256, 512]
        c_in = 64
        for s, c in enumerate(chans):
            blocks = []
            for b in range(2):
                blocks.append(TorchBasicBlock(c_in, c, 2 if (s > 0 and b == 0) else 1))
                c_in = c
            setattr(self, f"layer{s + 1}", nn.Sequential(*blocks))

    def forward(self, x):
        x = self.maxpool(F.relu(self.bn1(self.conv1(x))))
        feats = []
        for s in range(4):
            x = getattr(self, f"layer{s + 1}")(x)
            feats.append(x)
        return feats


def test_resnet18_conversion_parity(rng):
    tm = TorchResNet18().eval()
    # randomize BN running stats so eval-mode parity is a real test
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 2.0)
                m.weight.normal_(1, 0.2)
                m.bias.normal_(0, 0.2)

    params, stats = convert_resnet_state_dict(
        tm.state_dict(), stage_sizes=(2, 2, 2, 2), bottleneck=False
    )

    x = rng.normal(size=(1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        torch_feats = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))

    bb = build_backbone("resnet18")
    variables = {"params": params, "batch_stats": stats}
    flax_feats = bb.apply(variables, jnp.asarray(x), train=False)

    assert len(torch_feats) == len(flax_feats) == 4
    for tf_, ff in zip(torch_feats, flax_feats):
        t = tf_.numpy().transpose(0, 2, 3, 1)
        f = np.asarray(ff)
        np.testing.assert_allclose(t, f, rtol=1e-3, atol=1e-4)
