"""Golden-value generators for parity tests.

These are independent torch-CPU implementations of the *formulas* the
reference uses (SURVEY.md §2.2-2.3 documents them with file:line cites).
They exist so the JAX ops can be tested against the exact PyTorch operator
semantics (conv2d 'same' padding, F.unfold ordering, F.interpolate bicubic,
torch.min tie-breaking) without depending on CUDA or torchvision.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn.functional as F


def torch_gaussian_kernel(sigma, also_dg=False, radius=None):
    if radius is None:
        radius = max(int(4 * sigma + 0.5), 1)
    x = torch.arange(-radius, radius + 1)
    sigma2 = (sigma * sigma) + 1e-12
    phi_x = torch.exp(-0.5 / sigma2 * x**2)
    phi_x = phi_x / phi_x.sum()
    if also_dg:
        return phi_x, (phi_x * -x / sigma2)
    return phi_x


def torch_structure_tensor(im: torch.Tensor, sigma: float, rho: float) -> torch.Tensor:
    """im: (1, H, W) -> (3, H, W), the reference's six-conv2d pipeline."""
    g, dg = torch_gaussian_kernel(sigma, also_dg=True)
    h = (1, 1, -1, 1)
    w = (1, 1, 1, -1)
    ix = F.conv2d(im.unsqueeze(0), dg.reshape(h), padding="same")
    ix = F.conv2d(ix, g.reshape(w), padding="same")
    iy = F.conv2d(im.unsqueeze(0), g.reshape(h), padding="same")
    iy = F.conv2d(iy, dg.reshape(w), padding="same")
    k = torch_gaussian_kernel(rho)
    jxx = F.conv2d(F.conv2d(ix**2, k.reshape(h), padding="same"), k.reshape(w), padding="same")
    jyy = F.conv2d(F.conv2d(iy**2, k.reshape(h), padding="same"), k.reshape(w), padding="same")
    jxy = F.conv2d(F.conv2d(ix * iy, k.reshape(h), padding="same"), k.reshape(w), padding="same")
    return torch.cat((jxx.squeeze(0), jyy.squeeze(0), jxy.squeeze(0)), dim=0)


def torch_st_normalize(s: torch.Tensor, eps: float = 1e-12) -> torch.Tensor:
    d = s[0] * s[1] - s[2] ** 2
    return s / torch.sqrt(d + eps)


def torch_inv_s1_x_s2(s1, s2, normalize=True):
    if normalize:
        s1 = torch_st_normalize(s1)
        s2 = torch_st_normalize(s2)
    a = s1[1] * s2[0] - s1[2] * s2[2]
    b = s1[0] * s2[1] - s1[2] * s2[2]
    c = s1[1] * s2[2] - s1[2] * s2[1]
    d = s1[0] * s2[2] - s1[2] * s2[0]
    out = torch.stack((a, b, c, d), dim=1)
    return out.permute(1, 0, 2)


def torch_eigenvalues(m, eps=1e-12):
    apb = m[0] + m[1]
    disc = apb**2 - 4 * (m[0] * m[1] - m[2] * m[3])
    disc = torch.clamp(disc, min=eps)
    r = torch.sqrt(disc)
    return torch.stack((0.5 * (apb - r), 0.5 * (apb + r)), dim=1)


def torch_distance(lam, eps=1e-12):
    lam = torch.clamp(lam, min=1)
    lam = torch.log(lam) ** 2
    lam = lam.permute(1, 0, 2)
    return torch.sqrt(lam.sum(dim=0) + eps)


def torch_pairwise_distance(x, y=None, dist_norm="l1"):
    b, n, d = x.size()
    if dist_norm == "l1":
        x_norm = x.view(b, n, 1, d)
        y_norm = (y if y is not None else x).view(b, 1, -1, d)
        return torch.abs(x_norm - y_norm).sum(dim=3)
    if dist_norm == "l2":
        x_norm = (x**2).sum(dim=2).view(b, n, 1)
        if y is not None:
            m = y.size(1)
            y_t = torch.transpose(y, 1, 2)
            y_norm = (y**2).sum(dim=2).view(b, 1, m)
        else:
            y_t = torch.transpose(x, 1, 2)
            y_norm = x_norm.view(b, 1, n)
        dist = x_norm + y_norm - 2.0 * torch.bmm(x, y_t)
        if y is None:
            dist = dist - torch.diag_embed(
                torch.diagonal(dist, dim1=-2, dim2=-1), dim1=-2, dim2=-1
            )
        return torch.clamp(dist, 0.0, np.inf)
    raise NotImplementedError


def torch_matlab_bicubic(x: torch.Tensor, scale: float) -> torch.Tensor:
    """(B, C, H, W) MATLAB-style bicubic, the reference Bicubic.forward math
    (bicubic.py:27-106), including the final round(255*x)/255."""

    def cubic(v):
        absx = torch.abs(v)
        absx2 = absx * absx
        absx3 = absx2 * absx
        c1 = (absx <= 1).to(torch.float32)
        c2 = ((1 < absx) & (absx <= 2)).to(torch.float32)
        return (1.5 * absx3 - 2.5 * absx2 + 1) * c1 + (
            -0.5 * absx3 + 2.5 * absx2 - 4 * absx + 2
        ) * c2

    def contribute(in_size, out_size):
        kernel_width = 4.0
        if scale < 1:
            kernel_width = 4.0 / scale
        x0 = torch.arange(start=1, end=out_size[0] + 1).to(torch.float32)
        x1 = torch.arange(start=1, end=out_size[1] + 1).to(torch.float32)
        u0 = x0 / scale + 0.5 * (1 - 1 / scale)
        u1 = x1 / scale + 0.5 * (1 - 1 / scale)
        left0 = torch.floor(u0 - kernel_width / 2)
        left1 = torch.floor(u1 - kernel_width / 2)
        p = int(np.ceil(kernel_width)) + 2
        indice0 = left0.unsqueeze(1) + torch.arange(start=0, end=p).to(torch.float32).unsqueeze(0)
        indice1 = left1.unsqueeze(1) + torch.arange(start=0, end=p).to(torch.float32).unsqueeze(0)
        mid0 = u0.unsqueeze(1) - indice0.unsqueeze(0)
        mid1 = u1.unsqueeze(1) - indice1.unsqueeze(0)
        if scale < 1:
            weight0 = scale * cubic(mid0 * scale)
            weight1 = scale * cubic(mid1 * scale)
        else:
            weight0 = cubic(mid0)
            weight1 = cubic(mid1)
        weight0 = weight0 / (torch.sum(weight0, 2).unsqueeze(2))
        weight1 = weight1 / (torch.sum(weight1, 2).unsqueeze(2))
        indice0 = torch.min(
            torch.max(torch.FloatTensor([1]), indice0), torch.FloatTensor([in_size[0]])
        ).unsqueeze(0)
        indice1 = torch.min(
            torch.max(torch.FloatTensor([1]), indice1), torch.FloatTensor([in_size[1]])
        ).unsqueeze(0)
        kill0 = torch.eq(weight0, 0)[0][0]
        kill1 = torch.eq(weight1, 0)[0][0]
        weight0 = weight0[:, :, kill0 == 0]
        weight1 = weight1[:, :, kill1 == 0]
        indice0 = indice0[:, :, kill0 == 0]
        indice1 = indice1[:, :, kill1 == 0]
        return weight0, weight1, indice0, indice1

    b, c, h, w = x.shape
    weight0, weight1, indice0, indice1 = contribute([h, w], [int(h * scale), int(w * scale)])
    weight0 = weight0[0].to(torch.float32)
    indice0 = indice0[0].long()
    out = x[:, :, (indice0 - 1), :] * (weight0.unsqueeze(0).unsqueeze(1).unsqueeze(4))
    out = torch.sum(out, dim=3)
    a = out.permute(0, 1, 3, 2)
    weight1 = weight1[0].to(torch.float32)
    indice1 = indice1[0].long()
    out = a[:, :, (indice1 - 1), :] * (weight1.unsqueeze(0).unsqueeze(1).unsqueeze(4))
    out = torch.round(255 * torch.sum(out, dim=3).permute(0, 1, 3, 2)) / 255
    return out


# ---------------------------------------------------------------------------
# Loss-forward goldens (reference loss.py formulas, torchvision-free)

def torch_grayscale(x: torch.Tensor) -> torch.Tensor:
    """torchvision transforms.Grayscale on (..., 3, H, W)."""
    r, g, b = x.unbind(dim=-3)
    return (0.2989 * r + 0.587 * g + 0.114 * b).unsqueeze(-3)


def torch_best_buddy_loss(x, gt, alpha=1.0, beta=1.0, ksize=3, pad=0, stride=3,
                          dist_norm="l2", criterion="l1"):
    """Reference loss.py:115-141."""
    crit = torch.nn.L1Loss() if criterion == "l1" else torch.nn.MSELoss()
    p1 = F.unfold(x, kernel_size=ksize, padding=pad, stride=stride)
    b, c, h = p1.size()
    p1 = p1.permute(0, 2, 1).contiguous()
    p2 = F.unfold(gt, kernel_size=ksize, padding=pad, stride=stride).permute(0, 2, 1).contiguous()
    gt_2 = F.interpolate(gt, scale_factor=0.5, mode="bicubic", align_corners=False)
    p2_2 = F.unfold(gt_2, kernel_size=ksize, padding=pad, stride=stride).permute(0, 2, 1).contiguous()
    gt_4 = F.interpolate(gt, scale_factor=0.25, mode="bicubic", align_corners=False)
    p2_4 = F.unfold(gt_4, kernel_size=ksize, padding=pad, stride=stride).permute(0, 2, 1).contiguous()
    p2_cat = torch.cat([p2, p2_2, p2_4], 1)
    score = alpha * torch_pairwise_distance(p1, p2_cat, dist_norm)
    score = score + beta * torch_pairwise_distance(p2, p2_cat, dist_norm)
    _, ind = torch.min(score, dim=2)
    index = ind.unsqueeze(-1).expand([-1, -1, c])
    sel_p2 = torch.gather(p2_cat, dim=1, index=index)
    return crit(p1, sel_p2)


def _torch_unfold_patch_grids(x, ksize):
    """Reference loss.py:193-195 nested-unfold gymnastics -> (B, N, 3, k, k)."""
    b = x.shape[0]
    x = x.unfold(1, 3, ksize).unfold(2, ksize, ksize).unfold(3, ksize, ksize)
    x = x.squeeze()
    return x.reshape(b, -1, 3, ksize, ksize)


def torch_gram_loss(x, gt, alpha=1.0, beta=1.0, ksize=3, dist_norm="l2", criterion="l1"):
    """Reference loss.py:180-225."""
    crit = torch.nn.L1Loss() if criterion == "l1" else torch.nn.MSELoss()

    def gram_matrix(inp):
        b, c, d = inp.size()
        features = inp.reshape(b, c * d)
        g = torch.mm(features, features.t())
        return g.div(b * c * d)

    def compute_patches(z):
        b = z.shape[0]
        p = _torch_unfold_patch_grids(z, ksize)
        batched = torch.func.vmap(torch.func.vmap(gram_matrix))
        return batched(p).reshape(b, -1, ksize * ksize)

    p1 = compute_patches(x)
    _, _, w = p1.size()
    p2 = compute_patches(gt)
    p2_2 = compute_patches(F.interpolate(gt, scale_factor=0.5, mode="bicubic", align_corners=False))
    p2_4 = compute_patches(F.interpolate(gt, scale_factor=0.25, mode="bicubic", align_corners=False))
    p2_cat = torch.cat([p2, p2_2, p2_4], 1)
    score = alpha * torch_pairwise_distance(p1, p2_cat, dist_norm)
    score = score + beta * torch_pairwise_distance(p2, p2_cat, dist_norm)
    _, ind = torch.min(score, dim=2)
    sel_p2 = torch.gather(p2_cat, dim=1, index=ind.unsqueeze(-1).expand([-1, -1, w]))
    return crit(p1, sel_p2)


def torch_patchwise_st_loss(x, gt, sigma=0.5, rho=2.0, alpha=1.0, beta=1.0,
                            ksize=3, dist_norm="l2", criterion="l1"):
    """Reference loss.py:330-375."""
    crit = torch.nn.L1Loss() if criterion == "l1" else torch.nn.MSELoss()

    def s_norm(z):
        z = torch_grayscale(z)
        s = torch_structure_tensor(z, sigma=sigma, rho=rho)
        return s / torch.sqrt(s[0] * s[1] - s[2] ** 2 + 1e-12)

    def compute_patches(z):
        b = z.shape[0]
        p = _torch_unfold_patch_grids(z, ksize)
        batched = torch.func.vmap(torch.func.vmap(s_norm))
        return batched(p).reshape(b, -1, 3 * ksize * ksize)

    p1 = compute_patches(x)
    _, _, w = p1.size()
    p2 = compute_patches(gt)
    p2_2 = compute_patches(F.interpolate(gt, scale_factor=0.5, mode="bicubic", align_corners=False))
    p2_4 = compute_patches(F.interpolate(gt, scale_factor=0.25, mode="bicubic", align_corners=False))
    p2_cat = torch.cat([p2, p2_2, p2_4], 1)
    score = alpha * torch_pairwise_distance(p1, p2_cat, dist_norm)
    score = score + beta * torch_pairwise_distance(p2, p2_cat, dist_norm)
    _, ind = torch.min(score, dim=2)
    sel_p2 = torch.gather(p2_cat, dim=1, index=ind.unsqueeze(-1).expand([-1, -1, w]))
    return crit(p1, sel_p2)


def torch_st_loss(x, gt, sigma=0.5, rho=2.0, normalize=True):
    """Reference loss.py:399-413."""

    def st_loss_single(a, b):
        a = torch_grayscale(a)
        b = torch_grayscale(b)
        s_a = torch_structure_tensor(a, sigma=sigma, rho=rho)
        s_b = torch_structure_tensor(b, sigma=sigma, rho=rho)
        m = torch_inv_s1_x_s2(s_a, s_b, normalize)
        lam = torch_eigenvalues(m)
        return torch_distance(lam).mean()

    return torch.vmap(st_loss_single)(x, gt).mean()


# ---------------------------------------------------------------------------
# Golden torch models (the documented reference architectures, SURVEY.md
# §2.1, built with the same state-dict key structure so the import shim in
# tools/import_torch_checkpoint.py can be round-trip tested).

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
        import math

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
