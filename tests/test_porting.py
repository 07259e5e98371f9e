"""Numerical parity of ported torch checkpoints vs the clean-room flax models.

These tests instantiate *randomly initialized* public torch reference
architectures (torchvision resnet50, HF VitPose), port their state dicts, and
require the flax forward to match the torch forward to fp32 tolerance. This
validates every layout convention (NHWC kernels, BN stats, flatten order,
position-embedding folding) without needing the actual pretrained files.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from prpe_tpu.models import porting  # noqa: E402
from prpe_tpu.nn.resnet import ResNetTrunk  # noqa: E402
from prpe_tpu.nn.vit import ViTPose  # noqa: E402


class _TorchBottleneck(torch.nn.Module):
    """Minimal torch transcription of the public torchvision-v1.5 bottleneck
    (stride on the 3x3 conv), with torchvision's state-dict key names.
    torchvision itself is not installed in this image."""

    def __init__(self, in_ch, width, stride):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(in_ch, width, 1, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(width)
        self.conv2 = torch.nn.Conv2d(width, width, 3, stride, 1, bias=False)
        self.bn2 = torch.nn.BatchNorm2d(width)
        self.conv3 = torch.nn.Conv2d(width, width * 4, 1, bias=False)
        self.bn3 = torch.nn.BatchNorm2d(width * 4)
        self.relu = torch.nn.ReLU()
        if in_ch != width * 4 or stride != 1:
            self.downsample = torch.nn.Sequential(
                torch.nn.Conv2d(in_ch, width * 4, 1, stride, bias=False),
                torch.nn.BatchNorm2d(width * 4),
            )
        else:
            self.downsample = None

    def forward(self, x):
        s = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return self.relu(y + s)


class _TorchResNet50Trunk(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(64)
        self.relu = torch.nn.ReLU()
        self.maxpool = torch.nn.MaxPool2d(3, 2, 1)
        sizes = (3, 4, 6, 3)
        in_ch, width = 64, 64
        for i, n in enumerate(sizes):
            blocks = []
            for b in range(n):
                stride = 2 if (i > 0 and b == 0) else 1
                blocks.append(_TorchBottleneck(in_ch, width, stride))
                in_ch = width * 4
            setattr(self, f"layer{i + 1}", torch.nn.Sequential(*blocks))
            width *= 2

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        return self.layer4(self.layer3(self.layer2(self.layer1(x))))


def test_resnet50_forward_parity(rng):
    tm = _TorchResNet50Trunk()
    tm.eval()
    # random-but-nontrivial BN stats to catch mean/var mix-ups
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.8, 1.2)

    variables = porting.port_resnet50(tm.state_dict())
    x = rng.normal(0, 1, size=(2, 3, 64, 64)).astype(np.float32)

    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy().transpose(0, 2, 3, 1)  # -> NHWC

    model = ResNetTrunk()
    got = np.asarray(model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_vitpose_forward_parity(rng):
    from transformers import VitPoseConfig, VitPoseForPoseEstimation
    from transformers.models.vitpose_backbone import VitPoseBackboneConfig

    bc = VitPoseBackboneConfig(
        num_hidden_layers=2, hidden_size=32, num_attention_heads=2,
        intermediate_size=128, image_size=[64, 48], num_channels=3,
    )
    cfg = VitPoseConfig(backbone_config=bc)
    tm = VitPoseForPoseEstimation(cfg)
    tm.eval()
    with torch.no_grad():
        # non-zero pos-embed so folding is exercised
        tm.backbone.embeddings.position_embeddings.normal_(0, 0.02)

    x = rng.normal(0, 1, size=(2, 3, 64, 48)).astype(np.float32)
    with torch.no_grad():
        want = tm(pixel_values=torch.from_numpy(x)).heatmaps.numpy()

    variables = porting.port_vitpose(tm.state_dict())
    model = ViTPose(
        image_size=(64, 48), num_keypoints=cfg.num_labels, hidden=32,
        layers=2, heads=2, mlp_ratio=4,
    )
    got = np.asarray(model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1))))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_merge_variables_shape_check():
    base = {"params": {"a": np.zeros((2, 2)), "b": np.zeros(3)}}
    ported = {"params": {"a": np.ones((2, 2))}}
    merged = porting.merge_variables(base, ported)
    np.testing.assert_allclose(merged["params"]["a"], 1.0)
    np.testing.assert_allclose(merged["params"]["b"], 0.0)

    bad = {"params": {"a": np.ones((3, 3))}}
    with pytest.raises(ValueError):
        porting.merge_variables(base, bad)


def test_patch_embed_matches_conv(rng):
    """PatchEmbed's patchify+matmul must equal the stride==kernel nn.Conv it
    replaces (HF patch_embeddings.projection semantics: k=16, s=16, pad=2) —
    same params, same output, for both ViTPose geometries."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from prpe_tpu.nn.vit import PatchEmbed

    for h, w in ((256, 192), (320, 320)):
        x = jnp.asarray(rng.standard_normal((2, h, w, 3)), jnp.float32)
        pe = PatchEmbed(hidden=768, patch=16, padding=2)
        params = pe.init(jax.random.key(0), x)
        conv = nn.Conv(768, (16, 16), strides=(16, 16),
                       padding=[(2, 2), (2, 2)])
        got = pe.apply(params, x)
        gh, gw = got.shape[1], got.shape[2]
        want = conv.apply(params, x)
        assert want.shape == (2, gh, gw, 768)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-4, rtol=1e-4)
