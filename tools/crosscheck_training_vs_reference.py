"""Trajectory parity: the ASSEMBLED training loop vs the executed reference.

Every op/loss is already pinned bit-exactly against the executed reference
(tools/crosscheck_goldens_vs_reference.py) and model forwards match torch
via the import shim (tests/test_import.py). This tool closes the remaining
gap: it runs the reference's OWN model/loss/optimizer code
(/root/reference/{model,loss,bicubic,config}.py — executed, not
transcribed) through the reference's train-loop semantics
(warmup.py:74-96, train.py:116-164) AND the same schedule through
`srgan_st_tpu.train.steps` from identical weights on identical data, then
compares per-step loss trajectories and final parameters.

What this catches that per-op tests cannot: BN momentum/eps conventions
compounding over steps, the D BN-stat updates that happen during the G
forward (train.py:130-136), Adam(eps=1e-4) bias-correction semantics,
MultiStepLR epoch-boundary behavior, D-update cadence (batch_num resets
per epoch), and loss-term accumulation order.

Environment shims (forced by this host, math-neutral):
  * `.cuda()` no-op + torchvision stub (as in crosscheck_goldens);
  * `torch.compile` skipped (reference train.py:55 — an optimization,
    not semantics);
  * data is procedural uint8 noise (no image files exist here) fed
    identically to both sides; the reference's per-sample CPU bicubic
    degradation (dataset.py:27-28) runs via its own Bicubic module.

Both sides run fp32 on CPU (set JAX_PLATFORMS=cpu; torch is CPU-only
here) so residual divergence is fp reassociation only, which compounds
through Adam; the tool reports the growth curve.

Usage:
    JAX_PLATFORMS=cpu python tools/crosscheck_training_vs_reference.py \
        [--warmup-steps 200] [--gan-steps 200] [--batch 8]
        [--steps-per-epoch 20] [--d-interval 7] [--milestone 5]
        [--small] [--emit-golden tests/goldens/training_trajectory.npz]

--emit-golden runs the SMALL config for 20+20 steps and stores the torch
init state dicts, per-step losses, and final state dicts, from which
tests/test_trajectory.py replays the JAX side with no torch/reference
dependency on the critical path.
"""

from __future__ import annotations

import argparse
import atexit
import os
import shutil
import sys
import tempfile
import types

import numpy as np

REFERENCE = "/root/reference"
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_TOOLS = os.path.join(_REPO, "tools")
for _p in (_REPO, _TOOLS):
    if _p not in sys.path:
        sys.path.insert(0, _p)


# ---------------------------------------------------------------------------
# reference-import shims (same as tools/crosscheck_goldens_vs_reference.py)

class _Grayscale:
    def __init__(self, num_output_channels: int = 1):
        assert num_output_channels == 1

    def __call__(self, x):
        r, g, b = x.unbind(dim=-3)
        return (0.2989 * r + 0.587 * g + 0.114 * b).unsqueeze(dim=-3)


class _Normalize:
    """transforms.Normalize for batched (N, C, H, W) tensors: channelwise
    (x - mean) / std, exactly torchvision's arithmetic."""

    def __init__(self, mean, std):
        self.mean, self.std = mean, std

    def __call__(self, x):
        import torch

        mean = torch.as_tensor(self.mean, dtype=x.dtype).view(-1, 1, 1)
        std = torch.as_tensor(self.std, dtype=x.dtype).view(-1, 1, 1)
        return (x - mean) / std


def _make_feature_extractor_shim():
    """Hook-based create_feature_extractor(model, return_nodes): returns a
    module whose forward yields {node_name: activation}. For module-level
    node names (the only kind the reference uses — "features.N"), forward
    hooks produce exactly the FX extractor's tap activations; the only
    difference is that layers after the last tap still execute, which
    cannot change the returned values. The wrapped model is exposed as
    `.model` (registered submodule, so .eval()/.parameters() reach it)."""
    import torch

    class _FeatureExtractor(torch.nn.Module):
        def __init__(self, model, return_nodes):
            super().__init__()
            self.model = model
            self._names = list(return_nodes)
            missing = [n for n in self._names
                       if n not in dict(model.named_modules())]
            assert not missing, f"unknown tap nodes: {missing}"

        def forward(self, x):
            feats: dict = {}
            handles = []
            modules = dict(self.model.named_modules())
            try:
                for name in self._names:
                    def _hook(_m, _i, out, _name=name):
                        feats[_name] = out
                    handles.append(modules[name].register_forward_hook(_hook))
                self.model(x)
            finally:
                for h in handles:
                    h.remove()
            return feats

    return _FeatureExtractor


def _make_vgg19_stub():
    """torchvision.models.vgg19 replacement: the published VGG19 `features`
    trunk (same Sequential indices as torchvision — conv/ReLU interleaved,
    MaxPool2d between blocks) with DETERMINISTIC random weights (no
    pretrained artifact exists on this host; reference loss.py:46). The
    reference's ContentLossVGG code then executes verbatim, and parity
    holds because the identical weights are exported to the jax side
    (out['vgg0'])."""
    import torch
    from torch import nn

    def vgg19(weights=None, **_kw):
        del weights  # IMAGENET1K_V1 artifact unavailable; see docstring
        layout = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
                  512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]
        rng_state = torch.random.get_rng_state()
        try:
            torch.manual_seed(97)  # deterministic, isolated from callers
            mods: list = []
            cin = 3
            for v in layout:
                if v == "M":
                    mods.append(nn.MaxPool2d(2, 2))
                else:
                    mods.append(nn.Conv2d(cin, v, 3, padding=1))
                    mods.append(nn.ReLU())
                    cin = v
            class _VGG(nn.Module):
                """Forward runs only `features` (the hook-based extractor
                calls model(x); taps are all features.* nodes, so the real
                VGG's avgpool/classifier tail is irrelevant here)."""

                def __init__(self, features):
                    super().__init__()
                    self.features = features

                def forward(self, x):
                    return self.features(x)

            m = _VGG(nn.Sequential(*mods))
        finally:
            torch.random.set_rng_state(rng_state)
        return m

    return vgg19


def _install_shims() -> None:
    import torch

    torch.Tensor.cuda = lambda self, *a, **k: self  # type: ignore[assignment]
    tv = types.ModuleType("torchvision")
    tv_models = types.ModuleType("torchvision.models")
    tv_models.feature_extraction = types.ModuleType(
        "torchvision.models.feature_extraction"
    )
    tv_models.feature_extraction.create_feature_extractor = (
        _make_feature_extractor_shim()
    )
    tv_models.vgg19 = _make_vgg19_stub()

    class _VGG19Weights:
        IMAGENET1K_V1 = "IMAGENET1K_V1"

    tv_models.VGG19_Weights = _VGG19Weights
    tv_transforms = types.ModuleType("torchvision.transforms")
    tv_transforms.Grayscale = _Grayscale
    tv_transforms.Normalize = _Normalize
    tv_utils = types.ModuleType("torchvision.utils")
    tv_utils.make_grid = None
    tv_io = types.ModuleType("torchvision.io")
    tv_io.read_image = None
    tv.models, tv.transforms, tv.utils, tv.io = (
        tv_models, tv_transforms, tv_utils, tv_io,
    )
    for name, mod in [
        ("torchvision", tv), ("torchvision.models", tv_models),
        ("torchvision.models.feature_extraction", tv_models.feature_extraction),
        ("torchvision.transforms", tv_transforms),
        ("torchvision.utils", tv_utils), ("torchvision.io", tv_io),
    ]:
        sys.modules[name] = mod


# ---------------------------------------------------------------------------
# data

def make_batches(n_steps: int, batch: int, size: int, seed: int) -> np.ndarray:
    """(n_steps, B, size, size, 3) uint8 — identical feed for both sides."""
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (n_steps, batch, size, size, 3), dtype=np.uint8)


# ---------------------------------------------------------------------------
# torch side: the reference's own modules driven with its loop semantics

def _ref_cache_path(args, perturb: bool) -> str | None:
    if not args.cache_dir:
        return None
    key = (f"w{args.warmup_steps}_g{args.gan_steps}_b{args.batch}"
           f"_spe{args.steps_per_epoch}_d{args.d_interval}"
           f"_m{args.milestone}_{'small' if args.small else 'full'}"
           f"{'' if _recipe(args) == 'st' else '_' + _recipe(args)}"
           f"{'_p' if perturb else ''}")
    return os.path.join(args.cache_dir, f"ref_{key}.npz")


def _recipe(args) -> str:
    return getattr(args, "recipe", "st")


_STATE_PARTS = ("g0", "g_warm", "d0", "g_final", "d_final", "cd0", "vgg0")
_TRACE_PARTS = ("warm_losses", "gan_g_losses", "gan_d_losses")


def _save_ref(path: str, ref: dict) -> None:
    flat = {t: ref[t] for t in _TRACE_PARTS}
    for part in _STATE_PARTS:
        for k, v in ref.get(part, {}).items():
            flat[f"{part}/{k}"] = v
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez(path, **flat)


def _load_ref(path: str) -> dict:
    data = np.load(path)
    ref: dict = {t: data[t] for t in _TRACE_PARTS}
    for part in _STATE_PARTS:
        prefix = part + "/"
        sub = {k[len(prefix):]: data[k] for k in data.files
               if k.startswith(prefix)}
        # cd0 / vgg0 only exist for recipe=flagship / gram-vgg
        if sub or part not in ("cd0", "vgg0"):
            ref[part] = sub
    return ref


def cached_reference(args, warm_data, gan_data, perturb: bool = False):
    """run_reference with an npz cache — the torch side is deterministic
    and takes ~15 min at full size, so reruns during tolerance iteration
    shouldn't pay it twice."""
    path = _ref_cache_path(args, perturb)
    if path and os.path.exists(path):
        print(f"  (reference run loaded from cache {path})")
        return _load_ref(path)
    ref = run_reference(args, warm_data, gan_data, perturb)
    if path:
        _save_ref(path, ref)
    return ref


def run_reference(args, warm_data: np.ndarray, gan_data: np.ndarray,
                  perturb: bool = False):
    import torch

    _install_shims()
    sys.dont_write_bytecode = True  # /root/reference is read-only
    sys.path.insert(0, REFERENCE)
    import bicubic as ref_bicubic
    import config as ref_config_mod
    import loss as ref_loss
    import model as ref_model

    cfg = ref_config_mod.Config()
    cfg.DEVICE = "cpu"
    cfg.DATA.BATCH_SIZE = args.batch
    if args.small:
        cfg.MODEL.G_N_RCB = 2
        cfg.MODEL.G_N_CHANNEL = 16
        cfg.MODEL.D_N_CHANNEL = 4

    bic = ref_bicubic.Bicubic()
    mse = torch.nn.MSELoss()
    bce = torch.nn.BCEWithLogitsLoss()
    st = ref_loss.StructureTensorLoss()  # defaults: sigma 0.5, rho 2, norm

    def prepare(gt_u8: np.ndarray):
        # dataset.py:27-31: float()/255 then Bicubic(scale=1/upscale)
        gt = torch.from_numpy(gt_u8).permute(0, 3, 1, 2).float() / 255.0
        if perturb:
            # 1-ulp input perturbation: running the SAME reference code on
            # it measures the trajectory's chaotic amplification rate —
            # the noise floor any cross-framework fp32 comparison lives on
            gt[0, 0, 0, 0] += 2.0 ** -24
        with torch.no_grad():
            lr = bic(gt, scale=1.0 / cfg.DATA.UPSCALE_FACTOR)
        return gt, lr

    out: dict[str, np.ndarray | dict] = {}

    # ---- warmup (warmup.py:74-96: Pixel MSE, Adam, NO scheduler) --------
    torch.manual_seed(0)
    G = ref_model.Generator(cfg)
    out["g0"] = {k: v.numpy().copy() for k, v in G.state_dict().items()}
    g_opt = torch.optim.Adam(
        G.parameters(), lr=cfg.SOLVER.G_BASE_LR,
        betas=(cfg.SOLVER.G_BETA1, cfg.SOLVER.G_BETA2),
        eps=cfg.SOLVER.G_EPS, weight_decay=cfg.SOLVER.G_WEIGHT_DECAY,
    )
    G.train()
    warm_losses = []
    for step in range(args.warmup_steps):
        gt, lr = prepare(warm_data[step])
        G.zero_grad()
        sr = G(lr)
        loss = mse(sr, gt) * 1.0
        loss.backward()
        g_opt.step()
        warm_losses.append(loss.item())
    out["warm_losses"] = np.asarray(warm_losses, np.float64)
    out["g_warm"] = {k: v.numpy().copy() for k, v in G.state_dict().items()}

    # ---- GAN phase (train.py:104-188) -----------------------------------
    torch.manual_seed(1)
    D = ref_model.Discriminator(cfg)
    out["d0"] = {k: v.numpy().copy() for k, v in D.state_dict().items()}
    pst = closs = gram = bb = None
    if _recipe(args) == "flagship":
        # the flagship research recipe: Adv + Pixel + PatchwiseST +
        # ContentDiscriminator (reference config.py:66-86 weights; the
        # content D is a FRESH random Discriminator captured at
        # construction, loss.py:263, run eval-mode with frozen params)
        pst = ref_loss.PatchwiseStructureTensorLoss()
        torch.manual_seed(2)
        closs = ref_loss.ContentLossDiscriminator(cfg)
        out["cd0"] = {
            k: v.numpy().copy()
            for k, v in closs.feature_extractor.model.state_dict().items()
        }
    elif _recipe(args) == "gram-vgg":
        # the GramGAN recipe: Adv + Pixel + Gram + ContentVGG (reference
        # config.py weights 0.001 / 1.0 / 500.0 / 1.0). ContentLossVGG is
        # the reference's OWN code (loss.py:238-287) running on the
        # torchvision-stub's deterministic random VGG19 trunk (no
        # pretrained artifact on this host); the trunk's weights are
        # exported so the jax side runs weight-identical features
        gram = ref_loss.GramLoss()
        closs = ref_loss.ContentLossVGG(cfg)
        out["vgg0"] = {
            k: v.numpy().copy()
            for k, v in closs.feature_extractor.model.state_dict().items()
        }
    elif _recipe(args) == "bb":
        # the Best-Buddy GAN recipe: Adv + Pixel + BestBuddy (reference
        # config.py CRITERION_WEIGHTS 0.001 / 1.0 / 50.0). BestBuddyLoss
        # defaults: alpha=beta=1, ksize=stride=3, pad=0, l2 distance,
        # l1 criterion, with the two torch-interpolate bicubic
        # downscales of gt inside the loss (loss.py:78-140)
        bb = ref_loss.BestBuddyLoss()
    g_opt = torch.optim.Adam(  # fresh optimizers (train.py:62-76)
        G.parameters(), lr=cfg.SOLVER.G_BASE_LR,
        betas=(cfg.SOLVER.G_BETA1, cfg.SOLVER.G_BETA2),
        eps=cfg.SOLVER.G_EPS, weight_decay=cfg.SOLVER.G_WEIGHT_DECAY,
    )
    d_opt = torch.optim.Adam(
        D.parameters(), lr=cfg.SOLVER.D_BASE_LR,
        betas=(cfg.SOLVER.D_BETA1, cfg.SOLVER.D_BETA2),
        eps=cfg.SOLVER.D_EPS, weight_decay=cfg.SOLVER.D_WEIGHT_DECAY,
    )
    from torch.optim import lr_scheduler

    g_sched = lr_scheduler.MultiStepLR(g_opt, [args.milestone], gamma=0.5)
    d_sched = lr_scheduler.MultiStepLR(d_opt, [args.milestone], gamma=0.5)
    G.train()
    D.train()
    real_label = torch.full([args.batch, 1], 1.0 - cfg.EXP.LABEL_SMOOTHING)
    fake_label = torch.full([args.batch, 1], 0.0)

    g_losses, d_losses = [], []
    for step in range(args.gan_steps):
        batch_num = step % args.steps_per_epoch  # resets per epoch
        gt, lr = prepare(gan_data[step])

        # G update (train.py:122-146); criterion order Adv, Pixel, then
        # the recipe's content terms (summation order mirrored in run_jax)
        for p in D.parameters():
            p.requires_grad = False
        G.zero_grad()
        sr = G(lr)
        g_loss = torch.tensor(0.0)
        g_loss = g_loss + bce(D(sr), real_label) * 0.001
        g_loss = g_loss + mse(sr, gt) * 1.0
        if _recipe(args) == "flagship":
            g_loss = g_loss + pst(sr, gt) * 100.0
            g_loss = g_loss + closs(sr, gt) * 2000.0
        elif _recipe(args) == "gram-vgg":
            g_loss = g_loss + gram(sr, gt) * 500.0
            g_loss = g_loss + closs(sr, gt) * 1.0
        elif _recipe(args) == "bb":
            g_loss = g_loss + bb(sr, gt) * 50.0
        else:
            g_loss = g_loss + st(sr, gt) * (1.0 / 3.0)
        g_loss.backward()
        g_opt.step()
        g_losses.append(g_loss.item())

        # D update every D_UPDATE_INTERVAL batches (train.py:148-166)
        if batch_num % args.d_interval == 0:
            for p in D.parameters():
                p.requires_grad = True
            D.zero_grad()
            pred_gt = D(gt)
            loss_real = bce(pred_gt, real_label)
            pred_sr = D(sr.detach().clone())
            loss_fake = bce(pred_sr, fake_label)
            d_loss = loss_real + loss_fake
            d_loss.backward()
            d_opt.step()
            d_losses.append(d_loss.item())
        else:
            d_losses.append(np.nan)

        if batch_num == args.steps_per_epoch - 1:  # epoch boundary
            g_sched.step()
            d_sched.step()

    out["gan_g_losses"] = np.asarray(g_losses, np.float64)
    out["gan_d_losses"] = np.asarray(d_losses, np.float64)
    out["g_final"] = {k: v.numpy().copy() for k, v in G.state_dict().items()}
    out["d_final"] = {k: v.numpy().copy() for k, v in D.state_dict().items()}
    return out


# ---------------------------------------------------------------------------
# jax side: srgan_st_tpu.train.steps driven with the same schedule

def run_jax(args, warm_data: np.ndarray, gan_data: np.ndarray,
            g0: dict, d0: dict, g_warm: dict | None = None,
            cd0: dict | None = None, vgg0: dict | None = None,
            require_cpu: bool = True, config_mutate=None):
    """Replays the same two-phase schedule through the framework's train
    steps from the torch init weights. Returns losses + final variables.
    Importable by tests (no /root/reference dependency).

    `require_cpu=False` skips the CPU pin so the replay runs on whatever
    backend is live — used by tools/onchip_trajectory_smoke.py to pin the
    REAL TPU backend's numerics (incl. its default loss kernels) against
    the same goldens, at a measured looser tolerance (TPU f32 matmuls are
    bf16 MXU passes).

    `config_mutate(config)`, if given, runs after the recipe config is
    built and before any model/step construction — the smoke tool's hook
    for replaying the goldens under the SHIPPING bf16 configuration
    (TPU.COMPUTE_DTYPE="bfloat16", trunk auto -> xpack)."""
    import jax

    # parity runs MUST be fp32-exact: force CPU (the axon TPU plugin wins
    # over the JAX_PLATFORMS env var, and TPU fp32 matmuls are bf16 MXU
    # passes). The config update works as long as no backend has been
    # initialized yet; then verify.
    if require_cpu:
        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:  # pragma: no cover - backend already up (tests)
            pass
        if jax.default_backend() != "cpu":
            raise RuntimeError(
                "trajectory crosscheck must run on the CPU backend; got "
                f"{jax.default_backend()} — run in a fresh process"
            )

    import jax.numpy as jnp

    from srgan_st_tpu.core.config import Config
    from srgan_st_tpu.losses.registry import (
        build_criterions,
        build_warmup_criterions,
    )
    from srgan_st_tpu.models.discriminator import Discriminator
    from srgan_st_tpu.models.generator import Generator
    from srgan_st_tpu.train import steps as S

    from import_torch_checkpoint import import_discriminator, import_generator

    config = Config()
    config.DATA.BATCH_SIZE = args.batch
    config.SCHEDULER.MILESTONES = [args.milestone]
    config.SOLVER.D_UPDATE_INTERVAL = args.d_interval
    if args.small:
        config.MODEL.G_N_RCB = 2
        config.MODEL.G_N_CHANNEL = 16
        config.MODEL.D_N_CHANNEL = 4
    if _recipe(args) == "flagship":
        # same insertion (= summation) order as the torch side; weights
        # from the shared defaults (0.001 / 1.0 / 100.0 / 2000.0)
        config.MODEL.G_LOSS.CRITERIONS = {
            "Adversarial": {"kind": "adversarial"},
            "Pixel": {"kind": "pixel", "criterion": "mse"},
            "PatchwiseST": {"kind": "patchwise_st"},
            "ContentDiscriminator": {"kind": "content_disc"},
        }
        assert cd0 is not None, "flagship recipe needs the torch content-D"
        from import_torch_checkpoint import import_discriminator as _imp_d

        from srgan_st_tpu.train.checkpoint import save_variables_npz

        cd_vars = _imp_d(cd0, channels=config.MODEL.D_N_CHANNEL)
        cd_dir = tempfile.mkdtemp(prefix="srgan_traj_cd_")
        atexit.register(shutil.rmtree, cd_dir, ignore_errors=True)
        cd_path = os.path.join(cd_dir, "content_d.npz")
        save_variables_npz(cd_path, cd_vars)
        config.MODEL.G_LOSS.DISC_FEATURES_WEIGHTS = cd_path
    elif _recipe(args) == "gram-vgg":
        assert vgg0 is not None, "gram-vgg recipe needs the torch VGG weights"
        vgg_dir = tempfile.mkdtemp(prefix="srgan_traj_vgg_")
        atexit.register(shutil.rmtree, vgg_dir, ignore_errors=True)
        vgg_path = os.path.join(vgg_dir, "vgg_rand.npz")
        # the converter's npz layout: features.N.weight HWIO, bias as-is
        np.savez(vgg_path, **{
            k: (np.asarray(v).transpose(2, 3, 1, 0)
                if np.asarray(v).ndim == 4 else np.asarray(v))
            for k, v in vgg0.items()
        })
        # same insertion (= summation) order as the torch side; weights
        # from the shared defaults (0.001 / 1.0 / 500.0 / 1.0)
        config.MODEL.G_LOSS.CRITERIONS = {
            "Adversarial": {"kind": "adversarial"},
            "Pixel": {"kind": "pixel", "criterion": "mse"},
            "Gram": {"kind": "gram"},
            "ContentVGG": {"kind": "content_vgg", "weights": vgg_path},
        }
    elif _recipe(args) == "bb":
        # same insertion (= summation) order as the torch side; weights
        # from the shared defaults (0.001 / 1.0 / 50.0)
        config.MODEL.G_LOSS.CRITERIONS = {
            "Adversarial": {"kind": "adversarial"},
            "Pixel": {"kind": "pixel", "criterion": "mse"},
            "BestBuddy": {"kind": "best_buddy"},
        }
    else:
        config.MODEL.G_LOSS.CRITERIONS = {
            "Adversarial": {"kind": "adversarial"},
            "Pixel": {"kind": "pixel", "criterion": "mse"},
            "ST": {"kind": "st"},
        }  # weights: defaults 0.001 / 1.0 / (1/3) — reference config.py:77-86

    if config_mutate is not None:
        config_mutate(config)
    g_model = Generator.from_config(config)
    d_model = Discriminator.from_config(config)
    num_rcb = config.MODEL.G_N_RCB

    out: dict[str, np.ndarray | dict] = {}

    # ---- warmup ----------------------------------------------------------
    gv = import_generator(g0, num_rcb=num_rcb)
    g_tx = S.make_g_optimizer(config, args.steps_per_epoch, milestones=False)
    state = S.GANTrainState(
        g_params=gv["params"], g_stats=gv["batch_stats"],
        g_opt=g_tx.init(gv["params"]),
    )
    warm_step = jax.jit(S.make_warmup_step(
        config, g_model, build_warmup_criterions(config), g_tx,
    ))
    warm_losses = []
    for step in range(args.warmup_steps):
        state, metrics = warm_step(state, jnp.asarray(warm_data[step]))
        warm_losses.append(float(metrics["G_Loss"]))
    out["warm_losses"] = np.asarray(warm_losses, np.float64)
    out["g_warm_vars"] = jax.device_get(
        {"params": state.g_params, "batch_stats": state.g_stats}
    )

    # ---- GAN phase -------------------------------------------------------
    gv = (import_generator(g_warm, num_rcb=num_rcb) if g_warm is not None
          else out["g_warm_vars"])
    dv = import_discriminator(d0, channels=config.MODEL.D_N_CHANNEL)
    g_tx = S.make_g_optimizer(config, args.steps_per_epoch)
    d_tx = S.make_d_optimizer(config, args.steps_per_epoch)
    state = S.GANTrainState(
        g_params=gv["params"], g_stats=gv["batch_stats"],
        g_opt=g_tx.init(gv["params"]),
        d_params=dv["params"], d_stats=dv["batch_stats"],
        d_opt=d_tx.init(dv["params"]),
    )
    g_step, d_step = S.make_gan_steps(
        config, g_model, d_model, build_criterions(config), g_tx, d_tx,
    )
    g_step, d_step = jax.jit(g_step), jax.jit(d_step)

    g_losses, d_losses = [], []
    for step in range(args.gan_steps):
        batch_num = step % args.steps_per_epoch
        batch = jnp.asarray(gan_data[step])
        state, sr, g_metrics = g_step(state, batch)
        g_losses.append(float(g_metrics["G_Loss"]))
        if batch_num % args.d_interval == 0:
            state, d_metrics = d_step(state, batch, sr)
            d_losses.append(float(d_metrics["D_Loss"]))
        else:
            d_losses.append(np.nan)
    out["gan_g_losses"] = np.asarray(g_losses, np.float64)
    out["gan_d_losses"] = np.asarray(d_losses, np.float64)
    out["g_final_vars"] = jax.device_get(
        {"params": state.g_params, "batch_stats": state.g_stats}
    )
    out["d_final_vars"] = jax.device_get(
        {"params": state.d_params, "batch_stats": state.d_stats}
    )

    # functional endpoint: eval-mode SR / D-logit outputs of the final
    # models on a held-out probe batch. apply_fns are returned so the
    # caller can run the torch-final weights through the SAME graph.
    from srgan_st_tpu.ops.resize import resize_bicubic

    probe = make_batches(1, args.batch, 96, seed=424242)[0]
    gt = jnp.asarray(probe).astype(jnp.float32) / 255.0
    lr_img = resize_bicubic(gt, 1.0 / 4.0, method="matlab")

    def g_eval(variables):
        return np.asarray(g_model.apply(
            {"params": variables["params"],
             "batch_stats": variables["batch_stats"]},
            lr_img, train=False,
        ))

    def d_eval(variables):
        return np.asarray(d_model.apply(
            {"params": variables["params"],
             "batch_stats": variables["batch_stats"]},
            gt, train=False,
        ))

    out["g_eval"] = g_eval
    out["d_eval"] = d_eval
    out["probe_sr"] = g_eval(out["g_final_vars"])
    out["probe_d_logits"] = d_eval(out["d_final_vars"])
    return out


# ---------------------------------------------------------------------------
# comparison

def rel_err(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return np.abs(a - b) / np.maximum(np.maximum(np.abs(a), np.abs(b)), 1e-12)


def trace_err(ref: np.ndarray, got: np.ndarray) -> dict[str, float]:
    mask = ~np.isnan(ref)
    r = rel_err(ref[mask], got[mask])
    n = r.size
    return {
        "first10": float(r[: min(10, n)].max()) if n else 0.0,
        "mid": float(r[: max(1, n // 2)].max()) if n else 0.0,
        "full": float(r.max()) if n else 0.0,
    }


def compare_traces(name: str, ref: np.ndarray, got: np.ndarray,
                   failures: list[str], tol: float,
                   floor: float = 0.0) -> None:
    """`floor` is the same metric measured between the reference and a
    1-ulp-perturbed rerun of itself — the chaotic amplification level.
    The effective tolerance is max(tol, 30 * floor): cross-framework
    divergence within ~an order of magnitude of self-divergence is fp
    chaos, not a semantic difference."""
    mask = ~np.isnan(ref)
    assert (mask == ~np.isnan(got)).all(), f"{name}: NaN pattern differs"
    segs = trace_err(ref, got)
    tol_eff = max(tol, 30.0 * floor)
    ok = segs["full"] <= tol_eff
    print(f"{'PASS' if ok else 'FAIL'}  {name:16s} "
          f"rel-err first10={segs['first10']:.2e} "
          f"half={segs['mid']:.2e} full={segs['full']:.2e} "
          f"(tol {tol_eff:g}, 1-ulp self-noise {floor:.2e})")
    if not ok:
        failures.append(name)


def _param_metric(want, got, travel: float) -> dict[str, tuple[float, str]]:
    """worst per-class (kernel/scale vs bias-like) normalized leaf diff."""
    import jax

    worst = {"kernel": (0.0, ""), "bias": (0.0, "")}
    for (pw, w), (pg, g) in zip(
        jax.tree_util.tree_flatten_with_path(want)[0],
        jax.tree_util.tree_flatten_with_path(got)[0],
    ):
        assert pw == pg, f"tree mismatch {pw} vs {pg}"
        key = jax.tree_util.keystr(pw)
        denom = max(float(np.abs(w).max()), travel, 1e-12)
        d = float(np.abs(np.asarray(w) - np.asarray(g)).max()) / denom
        klass = ("bias" if ("bias" in key or "mean" in key or "alpha" in key)
                 else "kernel")
        if d > worst[klass][0]:
            worst[klass] = (d, key)
    return worst


def compare_params(name: str, torch_state: dict, jax_vars: dict,
                   import_fn, failures: list[str], tol: float,
                   travel: float, perturbed_state: dict | None = None,
                   **import_kw) -> None:
    """Per-leaf max |diff| normalized by max(|leaf|_max, travel), where
    `travel` = lr * n_steps bounds how far Adam can move a parameter
    (|update| <= ~lr per step).

    Gated on KERNEL/SCALE leaves only. Bias leaves are reported but not
    gated: bias gradients are near-cancelling reductions (absolute fp
    noise ~1e-5 on an O(1e-6) value), and Adam's eps-normalization turns
    that relative noise directly into update direction — two torch runs
    with different reduction orders diverge on those leaves the same way.
    The functional endpoint check (final-model outputs) is the binding
    assertion that the noise stays functionally irrelevant."""
    want = import_fn(torch_state, **import_kw)
    worst = _param_metric(want, jax_vars, travel)
    floor = 0.0
    if perturbed_state is not None:
        floor = _param_metric(
            want, import_fn(perturbed_state, **import_kw), travel
        )["kernel"][0]
    tol_eff = max(tol, 30.0 * floor)
    ok = worst["kernel"][0] <= tol_eff
    print(f"{'PASS' if ok else 'FAIL'}  {name:16s} "
          f"kernel/scale {worst['kernel'][0]:.2e} at {worst['kernel'][1]} "
          f"(tol {tol_eff:g}, 1-ulp self-noise {floor:.2e}); bias-class "
          f"{worst['bias'][0]:.2e} at {worst['bias'][1]} (diagnostic)")
    if not ok:
        failures.append(name)


def compare_functional(name: str, ref_out: np.ndarray, got_out: np.ndarray,
                       failures: list[str], tol: float,
                       floor: float = 0.0) -> None:
    d = float(np.abs(ref_out.astype(np.float64) - got_out.astype(np.float64)).max())
    tol_eff = max(tol, 30.0 * floor)
    ok = d <= tol_eff
    print(f"{'PASS' if ok else 'FAIL'}  {name:16s} final-model output "
          f"max|diff| {d:.2e} (tol {tol_eff:g}, 1-ulp self-noise {floor:.2e})")
    if not ok:
        failures.append(name)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--warmup-steps", type=int, default=200)
    p.add_argument("--gan-steps", type=int, default=200)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--steps-per-epoch", type=int, default=20)
    p.add_argument("--d-interval", type=int, default=7)
    p.add_argument("--milestone", type=int, default=5,
                   help="LR decay epoch (reference hard-codes [10]; 5 puts "
                        "the boundary mid-run for both sides)")
    p.add_argument("--small", action="store_true",
                   help="reduced model (2 RCB / 16 ch G, 4 ch D)")
    p.add_argument("--recipe", choices=("st", "flagship", "gram-vgg", "bb"),
                   default="st",
                   help="GAN-phase loss recipe: st = Adv+Pixel+ST; "
                        "flagship = Adv+Pixel+PatchwiseST+"
                        "ContentDiscriminator; gram-vgg = Adv+Pixel+Gram+"
                        "ContentVGG on a shared random VGG19 trunk; "
                        "bb = Adv+Pixel+BestBuddy "
                        "(all at the reference's default weights)")
    p.add_argument("--loss-tol", type=float, default=2e-2,
                   help="max relative per-step loss error over the full run")
    p.add_argument("--param-tol", type=float, default=2e-2,
                   help="max relative final-param error (kernel/scale leaves)")
    p.add_argument("--func-tol", type=float, default=5e-3,
                   help="max abs final-G output diff on the probe batch "
                        "([0,1] image scale)")
    p.add_argument("--noise-floor", action="store_true", default=True,
                   help="also run the reference on 1-ulp-perturbed input "
                        "to measure the chaotic amplification floor")
    p.add_argument("--no-noise-floor", dest="noise_floor",
                   action="store_false")
    p.add_argument("--cache-dir", default="/tmp/srgan_traj_cache",
                   help="cache dir for the (deterministic) torch reference "
                        "runs ('' disables)")
    p.add_argument("--emit-golden", default=None,
                   help="write a distilled golden npz (forces --small, 20+20)")
    args = p.parse_args()

    if args.emit_golden:
        args.small = True
        args.warmup_steps = min(args.warmup_steps, 20)
        args.gan_steps = min(args.gan_steps, 20)

    warm_data = make_batches(args.warmup_steps, args.batch, 96, seed=1234)
    gan_data = make_batches(args.gan_steps, args.batch, 96, seed=5678)

    print(f"running reference (torch CPU): {args.warmup_steps} warmup + "
          f"{args.gan_steps} GAN steps, batch {args.batch} ...")
    ref = cached_reference(args, warm_data, gan_data)

    if args.emit_golden:
        # the 1-ulp-perturbed rerun's traces ship WITH the golden: they
        # are the measured chaotic amplification at each step, i.e. the
        # tolerance any fp32 replay of this trajectory can be held to
        print("measuring 1-ulp noise floor for the golden ...")
        ref_p = cached_reference(args, warm_data, gan_data, perturb=True)
        # g_warm ships too: the replay re-bases its GAN phase on the
        # post-warmup torch weights, so each 20-step window only
        # accumulates its own divergence instead of chaos-amplifying the
        # warmup window's fp seed through the GAN feedback loop
        flat = {}
        for part in _STATE_PARTS:
            if part == "vgg0":
                continue  # ~80 MB of random floats: the test reconstructs
                # them from the deterministic vgg19 stub (seed 97) and
                # validates against the digest stored below
            for k, v in ref.get(part, {}).items():
                flat[f"{part}/{k}"] = v
        if ref.get("vgg0"):
            w0 = np.concatenate([np.asarray(v, np.float64).ravel()
                                 for v in ref["vgg0"].values()])
            flat["vgg0_digest"] = np.asarray(
                [float(w0.size), float(np.abs(w0).sum()), float(w0[:8].sum())]
            )
        np.savez_compressed(
            args.emit_golden,
            warm_losses=ref["warm_losses"],
            gan_g_losses=ref["gan_g_losses"],
            gan_d_losses=ref["gan_d_losses"],
            p_warm_losses=ref_p["warm_losses"],
            p_gan_g_losses=ref_p["gan_g_losses"],
            p_gan_d_losses=ref_p["gan_d_losses"],
            meta=np.asarray([args.warmup_steps, args.gan_steps, args.batch,
                             args.steps_per_epoch, args.d_interval,
                             args.milestone]),
            recipe=np.asarray(_recipe(args)),
            **flat,
        )
        print(f"wrote golden to {args.emit_golden}")
        return

    floors = {"warm": 0.0, "g": 0.0, "d": 0.0, "func": 0.0}
    ref_p = None
    if args.noise_floor:
        print("running reference AGAIN with a 1-ulp input perturbation "
              "(chaos noise floor) ...")
        ref_p = cached_reference(args, warm_data, gan_data, perturb=True)
        floors["warm"] = trace_err(ref["warm_losses"], ref_p["warm_losses"])["full"]
        floors["g"] = trace_err(ref["gan_g_losses"], ref_p["gan_g_losses"])["full"]
        floors["d"] = trace_err(ref["gan_d_losses"], ref_p["gan_d_losses"])["full"]

    print("running srgan_st_tpu (jax CPU) ...")
    got = run_jax(args, warm_data, gan_data, ref["g0"], ref["d0"],
                  cd0=ref.get("cd0"), vgg0=ref.get("vgg0"))

    from import_torch_checkpoint import import_discriminator, import_generator

    num_rcb = 2 if args.small else 16
    d_ch = 4 if args.small else 64
    if ref_p is not None:
        floors["func"] = float(np.abs(
            got["g_eval"](import_generator(ref["g_final"], num_rcb=num_rcb))
            - got["g_eval"](import_generator(ref_p["g_final"], num_rcb=num_rcb))
        ).max())
    failures: list[str] = []
    compare_traces("warmup G loss", ref["warm_losses"], got["warm_losses"],
                   failures, args.loss_tol, floor=floors["warm"])
    compare_traces("GAN G loss", ref["gan_g_losses"], got["gan_g_losses"],
                   failures, args.loss_tol, floor=floors["g"])
    compare_traces("GAN D loss", ref["gan_d_losses"], got["gan_d_losses"],
                   failures, args.loss_tol, floor=floors["d"])
    lr = 1e-4  # SOLVER.G_BASE_LR == D_BASE_LR (reference config.py:103,110)
    compare_params("G after warmup", ref["g_warm"], got["g_warm_vars"],
                   import_generator, failures, args.param_tol,
                   travel=lr * args.warmup_steps, num_rcb=num_rcb,
                   perturbed_state=ref_p["g_warm"] if ref_p else None)
    compare_params("G final", ref["g_final"], got["g_final_vars"],
                   import_generator, failures, args.param_tol,
                   travel=lr * (args.warmup_steps + args.gan_steps),
                   num_rcb=num_rcb,
                   perturbed_state=ref_p["g_final"] if ref_p else None)
    compare_params("D final", ref["d_final"], got["d_final_vars"],
                   import_discriminator, failures, args.param_tol,
                   travel=lr * args.gan_steps, channels=d_ch,
                   perturbed_state=ref_p["d_final"] if ref_p else None)
    # binding endpoint: the final models must be functionally identical
    # (up to the measured chaotic amplification of 1-ulp fp noise)
    compare_functional(
        "G(probe)", got["g_eval"](import_generator(ref["g_final"],
                                                   num_rcb=num_rcb)),
        got["probe_sr"], failures, args.func_tol, floor=floors["func"],
    )
    compare_functional(
        "D(probe)", got["d_eval"](import_discriminator(ref["d_final"],
                                                       channels=d_ch)),
        got["probe_d_logits"], failures, args.func_tol * 100,
        floor=floors["func"] * 10,
    )  # D logits are pre-sigmoid scores with O(10) dynamic range
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("trajectory parity OK")


if __name__ == "__main__":
    main()
