"""Minimal PyTorch IR/IR-SE reference used ONLY by tests.

Generates statedicts in the canonical AdaFace-zoo Sequential naming
(input_layer / body.<k> / output_layer) plus golden forward activations, so
the flax backbone and the checkpoint importer can be validated numerically
without real pretrained weights. This is an original test fixture, not a
vendored model.
"""

import torch
import torch.nn as nn

STAGE_CHANNELS = (64, 128, 256, 512)


class _SE(nn.Module):
    def __init__(self, ch, reduction=16):
        super().__init__()
        self.fc1 = nn.Conv2d(ch, ch // reduction, 1, bias=False)
        self.fc2 = nn.Conv2d(ch // reduction, ch, 1, bias=False)

    def forward(self, x):
        s = x.mean((2, 3), keepdim=True)
        s = torch.sigmoid(self.fc2(torch.relu(self.fc1(s))))
        return x * s


class _Block(nn.Module):
    def __init__(self, in_ch, depth, stride, use_se):
        super().__init__()
        if in_ch == depth:
            self.shortcut_layer = nn.MaxPool2d(1, stride)
        else:
            self.shortcut_layer = nn.Sequential(
                nn.Conv2d(in_ch, depth, 1, stride, bias=False), nn.BatchNorm2d(depth)
            )
        layers = [
            nn.BatchNorm2d(in_ch),
            nn.Conv2d(in_ch, depth, 3, 1, 1, bias=False),
            nn.BatchNorm2d(depth),
            nn.PReLU(depth),
            nn.Conv2d(depth, depth, 3, stride, 1, bias=False),
            nn.BatchNorm2d(depth),
        ]
        if use_se:
            layers.append(_SE(depth))
        self.res_layer = nn.Sequential(*layers)

    def forward(self, x):
        return self.res_layer(x) + self.shortcut_layer(x)


class TorchIRRef(nn.Module):
    def __init__(self, units, use_se=False, embedding_dim=512):
        super().__init__()
        self.input_layer = nn.Sequential(
            nn.Conv2d(3, 64, 3, 1, 1, bias=False), nn.BatchNorm2d(64), nn.PReLU(64)
        )
        blocks = []
        in_ch = 64
        for n_units, depth in zip(units, STAGE_CHANNELS):
            for u in range(n_units):
                blocks.append(_Block(in_ch, depth, 2 if u == 0 else 1, use_se))
                in_ch = depth
        self.body = nn.Sequential(*blocks)
        self.output_layer = nn.Sequential(
            nn.BatchNorm2d(512),
            nn.Dropout(0.4),
            nn.Flatten(),
            nn.Linear(512 * 7 * 7, embedding_dim),
            nn.BatchNorm1d(embedding_dim, affine=False),
        )

    def forward(self, x):
        x = self.input_layer(x)
        x = self.body(x)
        x = self.output_layer(x)
        norm = torch.norm(x, 2, 1, True)
        return x / norm, norm


def make_reference(units, use_se=False, seed=0):
    """Randomly-initialized eval-mode reference with non-trivial BN stats."""
    torch.manual_seed(seed)
    model = TorchIRRef(units, use_se=use_se)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, (nn.BatchNorm2d, nn.BatchNorm1d)):
                m.running_mean.normal_(0, 0.02)
                m.running_var.uniform_(0.5, 1.5)
                if m.affine:
                    m.weight.normal_(1.0, 0.05)
                    m.bias.normal_(0, 0.02)
    model.eval()
    return model
