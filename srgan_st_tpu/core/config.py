"""Config system.

Mirrors the reference's code-as-config `Config` class and its field groups
(EXP / DATA / MODEL / SOLVER / SCHEDULER; reference config.py:15-139), the
criterion registry mutators `add_g_criterion` / `remove_g_criterion`
(reference config.py:122-131), the TensorBoard provenance dump
`get_all_params` (reference config.py:133-139), and the `job_index`
experiment hook (reference main.py:27-30).

Differences from the reference, by design:
  * criterions are stored as *loss specs* (name -> dict of constructor
    kwargs), not live module objects — losses are pure functions built once
    per train step by `srgan_st_tpu.losses.build_criterions`.
  * device fields are JAX meshes/shardings, not a "cuda:0" string.
  * scheduler milestones are an explicit config field (the reference
    hard-codes `milestones=[10]` in train.py:78-87 and ignores
    SCHEDULER.STEP_SIZE; we default to [10] and make it configurable).
"""

from __future__ import annotations

import os


class dotdict(dict):
    """dict with attribute access, so config groups read like the reference's."""

    __getattr__ = dict.__getitem__
    __setattr__ = dict.__setitem__
    __delattr__ = dict.__delitem__
    __dir__ = dict.keys
    __repr__ = dict.__repr__

    def copy(self) -> "dotdict":
        return dotdict({k: (v.copy() if isinstance(v, dict) else v) for k, v in self.items()})


def get_jobindex(fallback: int = 0) -> int:
    """Job index set by the cluster scheduler (reference main.py:27-30)."""
    num = os.getenv("job_index")
    return int(num) if num else fallback


class Config:
    """Experiment configuration. Instances are independent and mutable."""

    def __init__(self) -> None:
        # ------------------------------------------------------------------
        # Experiment (reference config.py:19-24)
        self.EXP = dotdict()
        self.EXP.NAME = "experiment-name"   # experiment name; output dirs are keyed by this
        self.EXP.START_EPOCH = 0            # resume epoch (0 = fresh start)
        # Restore results/<NAME>/last automatically when present, even with
        # START_EPOCH=0 — so a crashed run relaunched with the default
        # config resumes instead of silently restarting (the true epoch is
        # derived from the checkpoint's step counter; incompatible
        # checkpoints are skipped with a warning). Set False for strict
        # reference semantics (reference never auto-loads *_last).
        self.EXP.AUTO_RESUME = True
        # Save full train states via orbax instead of npz pytrees. npz is
        # the default (~0.02 s saves vs orbax's ~1 s + slow first save on
        # some hosts); orbax is the multi-host option — its saves are
        # collective across processes (train/checkpoint.py).
        self.EXP.ORBAX_CHECKPOINTS = False
        self.EXP.N_EPOCHS = 40              # number of training epochs
        self.EXP.LABEL_SMOOTHING = 0.1      # one-sided label smoothing: real label = 1 - s

        # Logging periods (reference config.py:27-30)
        self.LOG_TRAIN_PERIOD = 100         # batches between train-loss log lines
        self.LOG_VALIDATION_PERIOD = 1      # epochs between validation log lines
        self.D_CHECKPOINT_INTERVAL = 100    # epochs between periodic D snapshots
        self.G_CHECKPOINT_INTERVAL = 100    # epochs between periodic G snapshots

        # ------------------------------------------------------------------
        # Data (reference config.py:33-42)
        self.DATA = dotdict()
        self.DATA.TRAIN_GT_IMAGES_DIR = "data/train"
        self.DATA.TEST_SET = "Set5"
        self.DATA.TEST_GT_IMAGES_DIR = f"data/{self.DATA.TEST_SET}/GTmod12"
        self.DATA.TEST_LR_IMAGES_DIR = f"data/{self.DATA.TEST_SET}/LRbicx4"
        self.DATA.TEST_SR_IMAGES_DIR = "results/_test"
        self.DATA.SEED = 0
        self.DATA.UPSCALE_FACTOR = 4
        self.DATA.BATCH_SIZE = 16           # *global* batch size (sharded over the data mesh axis)
        self.DATA.GT_IMAGE_SIZE = 96
        # TPU additions (no reference equivalent): the input pipeline.
        self.DATA.SYNTHETIC = False         # use an on-device synthetic dataset (tests/bench)
        self.DATA.SYNTHETIC_N_BATCHES = 64  # synthetic batches per epoch
        self.DATA.PREFETCH = 2              # host->device prefetch depth
        self.DATA.AUGMENT = False           # full 8-way dihedral augmentation (reference has none)
        # Host tile size shipped to the device (None -> GT_IMAGE_SIZE). Tiling
        # larger (prepare_dataset --output_size 120) enables per-sample random
        # GT_IMAGE_SIZE^2 crops on device, deterministic across resume.
        self.DATA.TILE_SIZE = None
        self.DATA.NUM_WORKERS = 4           # decode worker threads
        # HBM-resident packed dataset: stage the pack on-device once and
        # gather batches there (host ships only int32 indices). "auto"
        # enables it when the pack fits DEVICE_CACHE_BUDGET bytes/device.
        self.DATA.DEVICE_CACHE = "auto"
        self.DATA.DEVICE_CACHE_BUDGET = 4 << 30

        # ------------------------------------------------------------------
        # Model (reference config.py:45-96)
        self.MODEL = dotdict()
        self.MODEL.G_CONTINUE_FROM_WARMUP = False
        self.MODEL.G_WARMUP_WEIGHTS = ""
        self.MODEL.D_CONTINUE_FROM_WARMUP = False
        self.MODEL.D_WARMUP_WEIGHTS = ""

        self.MODEL.G_IN_CHANNEL = 3
        self.MODEL.G_OUT_CHANNEL = 3
        self.MODEL.G_N_CHANNEL = 64
        self.MODEL.G_N_RCB = 16

        self.MODEL.G_LOSS = dotdict()
        # VGG19 tap points and weights used by ContentLossVGG
        # (reference config.py:60-64; torchvision node "features.17" == our
        # named tap "relu3_4" etc., see srgan_st_tpu/models/vgg.py).
        self.MODEL.G_LOSS.VGG19_LAYERS = {
            "features.17": 1 / 8,
            "features.26": 1 / 4,
            "features.35": 1 / 2,
        }
        # Discriminator tap points for ContentLossDiscriminator
        # (reference config.py:66-69).
        self.MODEL.G_LOSS.DISC_FEATURES_LOSS_LAYERS = {
            "features.4": 1 / 4,
            "features.10": 1 / 2,
        }
        # Generator criterions: name -> spec dict ({"kind": ..., **kwargs}).
        # Default matches the reference: adversarial only (config.py:71-73).
        self.MODEL.G_LOSS.CRITERIONS = {
            "Adversarial": {"kind": "adversarial"},
        }
        self.MODEL.G_LOSS.CRITERION_WEIGHTS = {
            "Adversarial": 0.001,
            "ContentVGG": 1.0,
            "ContentDiscriminator": 2000.0,
            "Pixel": 1.0,
            "BestBuddy": 50.0,
            "Gram": 500.0,
            "PatchwiseST": 100.0,
            "ST": 1 / 3,
        }
        # Warmup criterions (reference config.py:88-93): pixel MSE only.
        self.MODEL.G_LOSS.WARMUP_CRITERIONS = {
            "Pixel": {"kind": "pixel", "criterion": "mse"},
        }
        self.MODEL.G_LOSS.WARMUP_WEIGHTS = {"Pixel": 1.0}
        # Path to converted VGG19 IMAGENET1K_V1 weights (see tools/convert_vgg19.py).
        self.MODEL.G_LOSS.VGG19_WEIGHTS = "weights/vgg19_imagenet.npz"
        # Path to pretrained D weights for ContentLossDiscriminator (the
        # reference instantiates a *fresh random* D unless loaded, loss.py:263).
        self.MODEL.G_LOSS.DISC_FEATURES_WEIGHTS = ""

        self.MODEL.D_IN_CHANNEL = 3
        self.MODEL.D_OUT_CHANNEL = 1
        self.MODEL.D_N_CHANNEL = 64

        # ------------------------------------------------------------------
        # Solver (reference config.py:99-114)
        self.SOLVER = dotdict()
        self.SOLVER.D_UPDATE_INTERVAL = 100
        self.SOLVER.D_OPTIMIZER = "Adam"
        self.SOLVER.D_BASE_LR = 1e-4
        self.SOLVER.D_BETA1 = 0.9
        self.SOLVER.D_BETA2 = 0.999
        self.SOLVER.D_WEIGHT_DECAY = 0.0
        self.SOLVER.D_EPS = 1e-4
        self.SOLVER.G_OPTIMIZER = "Adam"
        self.SOLVER.G_BASE_LR = 1e-4
        self.SOLVER.G_BETA1 = 0.9
        self.SOLVER.G_BETA2 = 0.999
        self.SOLVER.G_WEIGHT_DECAY = 0.0
        self.SOLVER.G_EPS = 1e-4

        # ------------------------------------------------------------------
        # Scheduler (reference config.py:117-119; milestones hard-coded to
        # [10] by the reference's train.py:78-87).
        self.SCHEDULER = dotdict()
        self.SCHEDULER.MILESTONES = [10]    # epochs at which LR is multiplied by GAMMA
        self.SCHEDULER.GAMMA = 0.5

        # ------------------------------------------------------------------
        # TPU execution (no reference equivalent; replaces DEVICE="cuda:0").
        self.TPU = dotdict()
        self.TPU.MESH_SHAPE = None          # None -> 1-D ('data',) mesh over all devices
        self.TPU.MESH_AXES = ("data",)
        # Explicit-SPMD training: wrap the chunk step in jax.shard_map with
        # lax.pmean gradient reduction and axis_name sync-BN, instead of the
        # default GSPMD path (jit over sharded arrays). Needed for peak
        # multi-chip throughput when Pallas kernels are enabled — GSPMD
        # cannot propagate shardings through custom calls. Numerics match
        # GSPMD when augmentation/tiled-crop are off
        # (test_train.py::test_shard_map_step_matches_gspmd); with
        # DATA.AUGMENT or DATA.TILE_SIZE active the crop/augment keys fold
        # in lax.axis_index, so draws differ per shard from the GSPMD path
        # at the same seed (still fully deterministic).
        self.TPU.SHARD_MAP = False
        self.TPU.SHARD_MAP_AXIS = None      # set by the drivers from MESH_AXES
        # Per-shard BatchNorm normalization stats under shard_map (torch
        # DistributedDataParallel's default BN semantics) instead of the
        # sync-BN default. Running stats still accumulate the global
        # moments, so checkpoints/replication are unaffected; the BN
        # pmeans move off the differentiated path (no backward collectives,
        # forward pmeans only feed the EMA and can overlap compute) and the
        # packed Pallas trunk (TPU.TRUNK_MODE="packed") becomes eligible
        # on multi-chip meshes.
        # Only meaningful with TPU.SHARD_MAP; normalization numerics
        # differ per shard from the sync-BN/GSPMD path (deterministically).
        self.TPU.LOCAL_BN = False
        # "bfloat16" is a validated fast option: converges identically to
        # fp32 on the convergence study (PSNR 25.88 both, 60-epoch warmup)
        # since TPU fp32 convs already use bf16 MXU passes; fp32 stays the
        # default for strict reference parity.
        self.TPU.COMPUTE_DTYPE = "float32"
        self.TPU.DONATE = True              # donate state buffers in jitted steps
        self.TPU.REMAT = False              # jax.checkpoint the generator trunk
        # Generator trunk execution path: None = auto (see
        # models/generator.py Generator._trunk_mode), or force "unfused" /
        # "fused" / "packed" (the lane-packed Pallas fwd+bwd pair,
        # kernels/packed_trunk.py).
        self.TPU.TRUNK_MODE = None
        # Generator conv1 stem formulation: None = direct 9x9 conv (the
        # bit-exact reference path; right for training, where the batch
        # fills the MXU), "s2d" = space-to-depth(4)-factored conv
        # (ops/subpixel_conv.py) for batch-1 serving, where the 3-channel
        # input starves the implicit GEMM. Parameter tree is identical
        # either way (models/common.py TapConv), so checkpoints are
        # interchangeable. See tools/bench_serving.py for the on-chip A/B.
        self.TPU.STEM_MODE = None
        # Inner s2d factoring of the generator's fused reconstruction
        # conv: None = auto (the Pallas VMEM-relayout kernel where it is
        # GSPMD-safe AND training-scale — the one-block envelope; see
        # models/generator.py conv3_inner), 1 = plain coarse conv, 2 =
        # XLA inner s2d (measured slower at training shapes), "pallas" =
        # force the one-block kernel, "pallas-tiled" = opt into the
        # H-tiled serving-size kernel (measured 2.3x END-TO-END LOSS at
        # 4K from layout poisoning around the custom call,
        # ONCHIP_r05_serving.log — microbench/diagnostic use only).
        self.TPU.CONV3_INNER = None
        # Serving tail: None = the composed eval tail (last upsample
        # block + the fused reconstruction conv), "fused" = the single
        # H-tiled Pallas kernel (kernels/serving_tail.py — up-conv +
        # PReLU + doubly-coarse conv3; the 256-channel pre-shuffle
        # activation never touches HBM). Eval-only, shape-gated with a
        # safe fallback; parameter tree identical either way. See
        # tools/bench_serving.py ("tail") for the on-chip A/B.
        self.TPU.TAIL_MODE = None
        # Batches per device dispatch (lax.scan chunk). None -> the natural
        # interval (D_UPDATE_INTERVAL for GAN, LOG_TRAIN_PERIOD for warmup);
        # 1 -> per-batch stepping. Host dispatch of the ~700-leaf train state
        # costs ~ms, so chunking matters at SR step sizes.
        self.TPU.CHUNK_STEPS = None
        # Halo-tiled eval inference: one compiled shape for any image size
        # (fixes per-shape recompiles on heterogeneous test sets like
        # Urban100) and mesh-shardable tiles. Exact vs whole-image.
        self.TPU.TILED_EVAL = False
        # Geometric ×8 self-ensemble at eval time (eval/ensemble.py):
        # average the inverse-transformed outputs over the dihedral group.
        # The standard SISR inference booster (~0.1-0.2 dB at 8x cost);
        # composes with TILED_EVAL. Off by default (reference parity).
        self.TPU.SELF_ENSEMBLE = False
        # Wrap train steps with a TPU-side finite-metrics check (prints a
        # warning on NaN/Inf without host syncs); for loss bring-up.
        self.TPU.NAN_GUARD = False

    # ----------------------------------------------------------------------
    # Criterion registry mutators (reference config.py:122-131)
    def add_g_criterion(self, name: str, spec: dict, weight: float = 1.0) -> None:
        """Add a generator criterion spec; see srgan_st_tpu.losses for kinds."""
        self.MODEL.G_LOSS.CRITERIONS[name] = spec
        self.MODEL.G_LOSS.CRITERION_WEIGHTS[name] = weight

    def remove_g_criterion(self, name: str) -> None:
        if name in self.MODEL.G_LOSS.CRITERIONS:
            del self.MODEL.G_LOSS.CRITERIONS[name]
            del self.MODEL.G_LOSS.CRITERION_WEIGHTS[name]

    def get_all_params(self) -> str:
        """Stringify every config group for experiment provenance logging
        (reference config.py:133-139)."""
        params = [
            getattr(self, attr)
            for attr in sorted(dir(self))
            if not callable(getattr(self, attr)) and not attr.startswith("__")
        ]
        return str(params)


def _coerce_like(raw: str, current) -> object:
    """Parse a CLI string as the type of the field it replaces."""
    if isinstance(current, bool):  # before int: bool is an int subclass
        lowered = raw.lower()
        if lowered in ("1", "true", "yes", "on"):
            return True
        if lowered in ("0", "false", "no", "off"):
            return False
        raise ValueError(f"expected a boolean, got {raw!r}")
    if isinstance(current, int):
        return int(raw)
    if isinstance(current, float):
        return float(raw)
    if isinstance(current, str):
        return raw
    # None / lists / dicts: accept any python literal ("none" -> None)
    import ast

    if raw.lower() in ("none", "null"):
        return None
    try:
        return ast.literal_eval(raw)
    except (ValueError, SyntaxError):
        return raw


def parse_driver_cli(argv, description: str,
                     set_example: str = "--set TPU.COMPUTE_DTYPE=bfloat16") -> Config:
    """Shared flag surface of the train/warmup driver CLIs.

    Common knobs get first-class flags; ``--set GROUP.FIELD=value``
    reaches everything else (`apply_overrides`). Returns the built Config.
    """
    import argparse

    parser = argparse.ArgumentParser(description=description)
    parser.add_argument("--exp_name", type=str, default=None)
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--batch_size", type=int, default=None)
    parser.add_argument("--train_dir", type=str, default=None,
                        help="training GT images/patches directory")
    parser.add_argument("--set", action="append", default=[],
                        metavar="GROUP.FIELD=VALUE",
                        help="override any config field (repeatable), e.g. "
                        f"{set_example}")
    args = parser.parse_args(argv)

    config = Config()
    if args.exp_name is not None:
        config.EXP.NAME = args.exp_name
    if args.epochs is not None:
        config.EXP.N_EPOCHS = args.epochs
    if args.batch_size is not None:
        config.DATA.BATCH_SIZE = args.batch_size
    if args.train_dir is not None:
        config.DATA.TRAIN_GT_IMAGES_DIR = args.train_dir
    return apply_overrides(config, args.set)


def _descend(path: str, parts, depth: int, obj, part: str):
    """Resolve one component of a ``--set`` path with friendly errors.

    Indexes plain dicts (so ``MODEL.G_LOSS.CRITERION_WEIGHTS.Pixel``
    reaches dict entries) and getattr's config groups; a traversal into a
    scalar (``DATA.BATCH_SIZE.X``) or a missing key exits with the actual
    siblings of the node where resolution failed.
    """
    prefix = ".".join(parts[:depth]) or "the config root"
    if isinstance(obj, dict):
        if part in obj:
            return obj[part]
        valid = ", ".join(map(str, obj))
        raise SystemExit(
            f"--set {path}: {prefix} has no entry {part!r} (entries: {valid})"
        )
    if not hasattr(obj, "__dict__"):
        raise SystemExit(
            f"--set {path}: {prefix} is a plain {type(obj).__name__} value "
            f"and has no sub-field {part!r}"
        )
    try:
        return getattr(obj, part)
    except AttributeError:
        valid = ", ".join(k for k in vars(obj) if not k.startswith("_"))
        raise SystemExit(
            f"--set {path}: no such config field (siblings: {valid})"
        ) from None


def apply_overrides(config: Config, assignments) -> Config:
    """Apply ``GROUP.FIELD=value`` CLI overrides onto a Config in place.

    The dotted path must name an EXISTING field (typo protection: the
    config is code-as-config, so an unknown key is a user error, never a
    new setting) and the value is parsed as the type of the field it
    replaces. Paths may traverse dict-valued fields by key. Returns the
    config for chaining.
    """
    for assignment in assignments or ():
        path, sep, raw = assignment.partition("=")
        if not sep:
            raise SystemExit(f"--set expects PATH=VALUE, got {assignment!r}")
        parts = path.split(".")
        obj = config
        for depth, part in enumerate(parts[:-1]):
            obj = _descend(path, parts, depth, obj, part)
        leaf = parts[-1]
        current = _descend(path, parts, len(parts) - 1, obj, leaf)
        try:
            value = _coerce_like(raw, current)
        except ValueError as e:
            raise SystemExit(f"--set {path}={raw!r}: {e}") from None
        if isinstance(obj, dict):
            obj[leaf] = value
        else:
            setattr(obj, leaf, value)
    return config
