"""Golden torch models for the checkpoint-import parity tests.

These implement the documented SRGAN-paper architectures (SURVEY.md §2.1)
in torch with the same state-dict key structure the reference produces, so
tools/import_torch_checkpoint.py can be round-trip tested: a torch model's
forward must equal the flax model's forward with imported weights.

Numerical golden VALUES for the ops/loss layers live in
tests/goldens/reference_goldens.npz (see tests/goldens/README.md) — they
were generated once from torch-CPU implementations of the documented
formulas and are loaded by the tests directly.
"""

from __future__ import annotations

import math

import torch


class _TorchRCB(torch.nn.Module):
    def __init__(self, channels):
        super().__init__()
        self.rcb = torch.nn.Sequential(
            torch.nn.Conv2d(channels, channels, 3, 1, 1, bias=False),
            torch.nn.BatchNorm2d(channels),
            torch.nn.PReLU(),
            torch.nn.Conv2d(channels, channels, 3, 1, 1, bias=False),
            torch.nn.BatchNorm2d(channels),
        )

    def forward(self, x):
        return x + self.rcb(x)


class _TorchUpsample(torch.nn.Module):
    def __init__(self, channels, r):
        super().__init__()
        self.upsample_block = torch.nn.Sequential(
            torch.nn.Conv2d(channels, channels * r * r, 3, 1, 1),
            torch.nn.PixelShuffle(r),
            torch.nn.PReLU(),
        )

    def forward(self, x):
        return self.upsample_block(x)


class TorchSRResNet(torch.nn.Module):
    """SRGAN-paper generator, state-dict-compatible with the reference."""

    def __init__(self, in_ch=3, out_ch=3, channels=64, num_rcb=16, upscale=4):
        super().__init__()
        self.conv1 = torch.nn.Sequential(
            torch.nn.Conv2d(in_ch, channels, 9, 1, 4), torch.nn.PReLU()
        )
        self.trunk = torch.nn.Sequential(*[_TorchRCB(channels) for _ in range(num_rcb)])
        self.conv2 = torch.nn.Sequential(
            torch.nn.Conv2d(channels, channels, 3, 1, 1, bias=False),
            torch.nn.BatchNorm2d(channels),
        )
        ups = []
        if upscale in (2, 4, 8):
            for _ in range(int(math.log2(upscale))):
                ups.append(_TorchUpsample(channels, 2))
        elif upscale == 3:
            ups.append(_TorchUpsample(channels, 3))
        self.upsampling = torch.nn.Sequential(*ups)
        self.conv3 = torch.nn.Conv2d(channels, out_ch, 9, 1, 4)

    def forward(self, x):
        c1 = self.conv1(x)
        x = self.trunk(c1)
        x = self.conv2(x)
        x = x + c1
        x = self.upsampling(x)
        x = self.conv3(x)
        return torch.clamp(x, 0.0, 1.0)


class TorchSRGANDiscriminator(torch.nn.Module):
    """SRGAN-paper discriminator, state-dict-compatible with the reference."""

    def __init__(self, in_ch=3, channels=64, out_ch=1):
        super().__init__()
        c = channels
        layers = [torch.nn.Conv2d(in_ch, c, 3, 1, 1, bias=True),
                  torch.nn.LeakyReLU(0.2, True)]
        specs = [(c, c, 2), (c, 2 * c, 1), (2 * c, 2 * c, 2), (2 * c, 4 * c, 1),
                 (4 * c, 4 * c, 2), (4 * c, 8 * c, 1), (8 * c, 8 * c, 2)]
        for cin, cout, s in specs:
            layers += [torch.nn.Conv2d(cin, cout, 3, s, 1, bias=False),
                       torch.nn.BatchNorm2d(cout),
                       torch.nn.LeakyReLU(0.2, True)]
        self.features = torch.nn.Sequential(*layers)
        self.classifier = torch.nn.Sequential(
            torch.nn.Linear(8 * c * 6 * 6, 1024),
            torch.nn.LeakyReLU(0.2, True),
            torch.nn.Linear(1024, out_ch),
        )

    def forward(self, x):
        out = self.features(x)
        out = torch.flatten(out, 1)
        return self.classifier(out)
