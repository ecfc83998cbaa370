"""Experiment orchestration entry point.

Counterpart of the reference's main.py: experiments are functions that
mutate a Config by `job_index` (read from the environment — array-job
compatible, reference main.py:27-47), then run warmup/train/test. The
LSF array-job pattern (train.sh) maps to any scheduler that sets
`job_index`; runs never communicate (experiment-level parallelism), while
each run data-parallelizes over its own TPU mesh.

Example:
    job_index=2 python -m srgan_st_tpu.main
"""

from __future__ import annotations

from srgan_st_tpu.core.config import Config, apply_overrides, get_jobindex
from srgan_st_tpu.eval.validate import test
from srgan_st_tpu.train.train import train


def warmup_gan(config: Config, epochs: int = 5) -> Config:
    """Warmup the generator / train SRResNet (reference main.py:33-38)."""
    config.EXP.N_EPOCHS = epochs
    config.EXP.NAME = f"resnet{epochs}"
    config.G_CHECKPOINT_INTERVAL = 5
    return config


# The loss-comparison sweep the reference was built for (SURVEY.md §2.8,
# tensorboard-visualization.ipynb variants): Patchwise-ST vs ST, each with
# VGG or D content loss, +/- pixel loss.
def st_experiment(config: Config, i: int) -> Config:
    variants = [
        ("patchwise-st-vgg", "PatchwiseST", "ContentVGG"),
        ("patchwise-st-disc", "PatchwiseST", "ContentDiscriminator"),
        ("st-vgg", "ST", "ContentVGG"),
        ("st-disc", "ST", "ContentDiscriminator"),
        ("pixel-baseline", "Pixel", None),
    ]
    name, main_loss, content = variants[i % len(variants)]
    config.EXP.NAME = name
    config.add_g_criterion(
        main_loss, {"kind": {"PatchwiseST": "patchwise_st", "ST": "st",
                             "Pixel": "pixel"}[main_loss]},
        config.MODEL.G_LOSS.CRITERION_WEIGHTS[main_loss],
    )
    if content == "ContentVGG":
        config.add_g_criterion("ContentVGG", {"kind": "content_vgg"}, 1.0)
    elif content == "ContentDiscriminator":
        config.add_g_criterion("ContentDiscriminator", {"kind": "content_disc"}, 2000.0)
    return config


def main(argv=None) -> None:
    import argparse

    parser = argparse.ArgumentParser(
        description="Run one experiment of the ST-comparison sweep, "
        "selected by job index (array-job compatible)."
    )
    parser.add_argument("--job_index", type=int, default=None,
                        help="experiment index; default: the job_index "
                        "environment variable set by the scheduler")
    parser.add_argument("--set", action="append", default=[],
                        metavar="GROUP.FIELD=VALUE",
                        help="override any config field (repeatable), "
                        "applied AFTER the job-index experiment mutator")
    args = parser.parse_args(argv)

    job_index = get_jobindex() if args.job_index is None else args.job_index
    print(f"Running job: {job_index}")

    config = Config()
    config = st_experiment(config, job_index)
    config = apply_overrides(config, args.set)

    train(config)
    test(config, save_images=True)

    print(f"Finished job: {job_index}")


if __name__ == "__main__":
    main()
