"""Pure-torch EfficientNet-B0 feature extractor with torchvision's
state_dict key layout (features.{i}.{j}.block...).

torchvision is not installed in this environment, so this replica stands in
for `torchvision.models.efficientnet_b0().features` (the reference backbone,
Models/model_components/backbone.py:9) to validate both our flax
implementation and the torchvision-format weight importer.
"""
from __future__ import annotations

import torch
import torch.nn as nn

B0_STAGES = (
    (1, 16, 1, 1, 3),
    (6, 24, 2, 2, 3),
    (6, 40, 2, 2, 5),
    (6, 80, 3, 2, 3),
    (6, 112, 3, 1, 5),
    (6, 192, 4, 2, 5),
    (6, 320, 1, 1, 3),
)


def conv_norm_act(cin, cout, k, s, groups=1, act=True):
    layers = [
        nn.Conv2d(cin, cout, k, s, (k - 1) // 2, groups=groups, bias=False),
        nn.BatchNorm2d(cout),
    ]
    if act:
        layers.append(nn.SiLU(inplace=True))
    return nn.Sequential(*layers)


class SqueezeExcitation(nn.Module):
    def __init__(self, ch, squeeze):
        super().__init__()
        self.avgpool = nn.AdaptiveAvgPool2d(1)
        self.fc1 = nn.Conv2d(ch, squeeze, 1)
        self.fc2 = nn.Conv2d(squeeze, ch, 1)
        self.activation = nn.SiLU(inplace=True)
        self.scale_activation = nn.Sigmoid()

    def forward(self, x):
        s = self.avgpool(x)
        s = self.activation(self.fc1(s))
        s = self.scale_activation(self.fc2(s))
        return x * s


class MBConv(nn.Module):
    def __init__(self, cin, cout, expand, k, s):
        super().__init__()
        ce = cin * expand
        layers = []
        if expand != 1:
            layers.append(conv_norm_act(cin, ce, 1, 1))
        layers.append(conv_norm_act(ce, ce, k, s, groups=ce))
        layers.append(SqueezeExcitation(ce, max(1, cin // 4)))
        layers.append(conv_norm_act(ce, cout, 1, 1, act=False))
        self.block = nn.Sequential(*layers)
        self.use_res = s == 1 and cin == cout

    def forward(self, x):
        y = self.block(x)
        return x + y if self.use_res else y


class EfficientNetB0Features(nn.Module):
    """`.features` equivalent: indexable stages 0..8."""

    def __init__(self):
        super().__init__()
        stages = [conv_norm_act(3, 32, 3, 2)]
        cin = 32
        for t, c, n, s, k in B0_STAGES:
            blocks = []
            for j in range(n):
                blocks.append(MBConv(cin, c, t, k, s if j == 0 else 1))
                cin = c
            stages.append(nn.Sequential(*blocks))
        stages.append(conv_norm_act(320, 1280, 1, 1))
        self.features = nn.Sequential(*stages)

    def forward(self, x):
        feats = []
        for stage in self.features:
            x = stage(x)
            feats.append(x)
        # reference Backbone returns [l0, l2, l3, l4, l8]
        return [feats[0], feats[2], feats[3], feats[4], feats[8]]


class TorchBackbone(nn.Module):
    """Mirror of the reference Backbone wrapper (attribute name 'encoder')."""

    def __init__(self):
        super().__init__()
        self.encoder = EfficientNetB0Features().features

    def forward(self, image):
        l = [image]
        for stage in self.encoder:
            l.append(stage(l[-1]))
        return [l[1], l[3], l[4], l[5], l[9]]


def randomize_bn_stats(module, seed=0):
    """Give BN layers non-trivial running stats so parity tests are strict."""
    g = torch.Generator().manual_seed(seed)
    for m in module.modules():
        if isinstance(m, nn.BatchNorm2d):
            with torch.no_grad():
                m.running_mean.normal_(0, 0.5, generator=g)
                m.running_var.uniform_(0.5, 1.5, generator=g)
                m.weight.normal_(1.0, 0.2, generator=g)
                m.bias.normal_(0, 0.2, generator=g)
