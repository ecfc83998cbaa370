"""On-chip drive check: bf16 warmup training under the DEFAULT trunk path.

Runs the real warmup step (on-device degradation included) on synthetic
data on whatever backend is live (the real TPU under axon), asserts the
trunk auto-resolves to xpack for bf16, and gates that the pixel loss
decreases over a dozen steps. Used by the round-4 verification queue
(tools/run_onchip_r4c.sh); exits nonzero on failure.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from srgan_st_tpu.core.config import Config
from srgan_st_tpu.losses.registry import build_warmup_criterions
from srgan_st_tpu.models.generator import Generator
from srgan_st_tpu.train.steps import (
    create_generator_state,
    make_g_optimizer,
    make_warmup_step,
)


def main() -> None:
    print("backend:", jax.default_backend(), jax.devices())
    cfg = Config()
    cfg.DATA.SYNTHETIC = True
    cfg.DATA.BATCH_SIZE = 16
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    gm = Generator.from_config(cfg)
    mode = gm._trunk_mode(True)
    assert mode == "xpack", mode
    tx = make_g_optimizer(cfg, 8, milestones=False)
    crits = build_warmup_criterions(cfg)
    state = create_generator_state(cfg, gm, tx)
    step = jax.jit(make_warmup_step(cfg, gm, crits, tx))
    rng = np.random.default_rng(1)
    losses = []
    for _ in range(12):
        batch = jnp.asarray(rng.integers(0, 256, (16, 96, 96, 3)), jnp.uint8)
        state, metrics = step(state, batch)
        losses.append(float(metrics["G_Loss"]))
    print("warmup losses:", " ".join(f"{v:.5f}" for v in losses))
    assert np.isfinite(losses).all(), losses
    assert losses[-1] < losses[0], losses
    print("VERIFY PASS: bf16 xpack warmup loss decreased "
          f"({losses[0]:.5f} -> {losses[-1]:.5f})")


if __name__ == "__main__":
    main()
