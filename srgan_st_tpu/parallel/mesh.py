"""Device-mesh and sharding utilities.

The reference is strictly single-device ("cuda:0", reference config.py:17;
SURVEY.md §2.10) — this module is the TPU-native replacement: a
`jax.sharding.Mesh` over all local devices with a 1-D ('data',) axis for
data-parallel GAN training. Batches are sharded along 'data'; parameters
and optimizer state are replicated; XLA inserts the psum gradient
reductions over ICI automatically under jit (GSPMD). The mesh API accepts
arbitrary shapes/axes so tensor-parallel axes are expressible (unused by
default — G is 1.5M params; SURVEY.md §2.10).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(config=None, devices=None, shape=None, axes=None) -> Mesh:
    """Build a device mesh. Default: 1-D ('data',) over all devices."""
    devices = devices if devices is not None else jax.devices()
    if config is not None:
        shape = shape or config.TPU.MESH_SHAPE
        axes = axes or tuple(config.TPU.MESH_AXES)
    axes = axes or ("data",)
    shape = tuple(shape) if shape else (len(devices),)
    if int(np.prod(shape)) != len(devices):
        raise ValueError(f"mesh shape {shape} != {len(devices)} devices")
    return Mesh(np.asarray(devices).reshape(shape), axes)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Device-put a host batch sharded over the data axis.

    Multi-process: `batch` is this process's contiguous slice of the
    global batch (see parallel.distributed.process_slice); the slices are
    assembled into one global jax.Array."""
    sharding = batch_sharding(mesh, axis)
    if jax.process_count() > 1:
        batch = np.asarray(batch)
        global_shape = (batch.shape[0] * jax.process_count(),) + batch.shape[1:]
        return jax.make_array_from_process_local_data(sharding, batch, global_shape)
    return jax.device_put(batch, sharding)


def shard_map_step(fn, mesh: Mesh, in_specs, out_specs):
    """Wrap a train-step function in explicit-SPMD `jax.shard_map`.

    The GSPMD path (plain jit over sharded arrays) is the default — XLA
    derives the psum/all-gather collectives from shardings. This explicit
    path exists because Pallas custom calls (kernels/{buddy_select,
    coarse_conv}.py) are opaque to GSPMD's sharding propagation: on a
    multi-chip mesh GSPMD would all-gather their operands. Under shard_map
    every kernel runs on the per-shard batch and the step's own
    lax.pmean calls (train/steps.py `_pmean_if_sharded`, flax BatchNorm
    `axis_name`) perform the gradient / batch-stat reductions explicitly —
    the SURVEY §2.10 design. check_vma off: custom_vjp + pallas calls
    aren't varying-axis annotated."""
    return jax.shard_map(
        fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_vma=False
    )


def shard_map_gan_chunk(chunk_step, mesh: Mesh, axis: str = "data"):
    """shard_map a GAN chunk step (state, chunk, do_d_update) — state
    replicated, chunk batch-sharded on dim 1. `do_d_update` stays a static
    python bool (two wrapped variants)."""
    variants = {
        do_d: shard_map_step(
            lambda state, chunk, _d=do_d: chunk_step(state, chunk, _d),
            mesh, in_specs=(P(), P(None, axis)), out_specs=(P(), P()),
        )
        for do_d in (False, True)
    }

    def wrapped(state, chunk, do_d_update: bool = True):
        return variants[bool(do_d_update)](state, chunk)

    return wrapped


def shard_map_warmup_chunk(chunk_step, mesh: Mesh, axis: str = "data"):
    """shard_map a warmup chunk step (state, chunk)."""
    return shard_map_step(
        chunk_step, mesh, in_specs=(P(), P(None, axis)), out_specs=(P(), P())
    )


def shard_chunk(chunk, mesh: Mesh, axis: str = "data"):
    """Device-put a (K, B, ...) stacked chunk of batches, sharding the
    batch dimension (axis 1) over the data axis. Multi-process: `chunk`
    holds this process's slice of every batch (K, B_local, ...)."""
    sharding = NamedSharding(mesh, P(None, axis))
    if jax.process_count() > 1:
        chunk = np.asarray(chunk)
        global_shape = (
            chunk.shape[0], chunk.shape[1] * jax.process_count(),
        ) + chunk.shape[2:]
        return jax.make_array_from_process_local_data(sharding, chunk, global_shape)
    return jax.device_put(chunk, sharding)
