"""Experiment logging.

Same observability contract as the reference (SURVEY.md §5): a TensorBoard
writer per experiment at `tensorboard/{EXP.NAME}` with identical scalar
names (Train/G_Loss, Train/G_{criterion}, Train/D_Loss,
Train/D(GT)_Probability, Train/D(SR)_Probability, Test/PSNR, Test/SSIM) and
the full config text dump under Config/Params (reference train.py:100-101,
174-179, 200-201). Falls back to a JSONL writer when tensorboard isn't
available.
"""

from __future__ import annotations

import json
import os
import time


class ExperimentWriter:
    def __init__(self, config, log_dir: str | None = None):
        # multi-host: only process 0 writes (one event file per experiment)
        from srgan_st_tpu.parallel.distributed import is_coordinator

        self._tb = self._jsonl = None
        self._enabled = is_coordinator()
        if not self._enabled:
            return
        self.log_dir = log_dir or os.path.join("tensorboard", config.EXP.NAME)
        os.makedirs(self.log_dir, exist_ok=True)
        try:
            from tensorboardX import SummaryWriter

            self._tb = SummaryWriter(self.log_dir)
        except Exception:
            self._jsonl = open(os.path.join(self.log_dir, "scalars.jsonl"), "a")
        self.add_text("Config/Params", config.get_all_params())

    def add_scalar(self, tag: str, value, step: int) -> None:
        if not self._enabled:
            return
        value = float(value)
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)
        else:
            self._jsonl.write(
                json.dumps({"ts": time.time(), "tag": tag, "value": value, "step": step})
                + "\n"
            )

    def add_text(self, tag: str, text: str) -> None:
        if self._tb is not None:
            self._tb.add_text(tag, text)

    def flush(self) -> None:
        if self._tb is not None:
            self._tb.flush()
        elif self._jsonl is not None:
            self._jsonl.flush()

    def close(self) -> None:
        if self._tb is not None:
            self._tb.close()
        elif self._jsonl is not None:
            self._jsonl.close()
