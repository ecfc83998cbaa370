"""Fused best-buddy selection as a tiled Pallas TPU kernel.

Computes, per batch element,

    idx[n] = argmin_m  alpha*||p1[n]-bank[m]||^2 + beta*||p2[n]-bank[m]||^2
    sel[n] = bank[idx[n]]

— the shared machinery of BestBuddy / Gram / PatchwiseST losses (reference
loss.py:132-137: two batch_pairwise_distance calls + torch.min + gather).

Fusion rationale: the XLA path materializes two (B, N, M) score tensors in
HBM (~88 MB each at the training shapes, ~1.4 GB each at 192px GT tiles)
before reducing them to N indices. Here only (Nt, Mt) score TILES ever
exist, in VMEM; the distance computations ride the MXU as (Nt, d) @ (d, Mt)
contractions and a running (score, index) pair carried across bank tiles
keeps the VMEM working set bounded for ANY (N, M). The kernel emits ONLY
the (N,) int32 winners; the value gather runs outside as an exact XLA
`take_along_axis` (round-4 redesign — the earlier in-kernel one-hot matmul
gather both cost a (Nt, Mt) intermediate and rounded the gathered values
through MXU passes, which is what made the round-3 value-level comparison
read as 0.0000 agreement, ONCHIP_r03.log).

Tie-breaking matches the reference (torch.min / jnp.argmin: FIRST
occurrence) exactly, by construction at both levels:
  * within a tile, the winner index is computed as min(col where score ==
    tile_min) — measured necessary: Mosaic's native argmin does NOT
    guarantee first-occurrence on v5e (0.23 agreement on duplicate-heavy
    banks before this fix, tools/bench_buddy.py);
  * across tiles, each M step folds its tile winner into VMEM scratch with
    a strict `<`, so the earlier tile keeps exact-score ties.
Inputs are zero-padded up to the tile grid outside the kernel and padded
bank columns are masked to +inf before the reduction, so padding can never
be selected; padded output rows are sliced off on return.

Score precision resolves by input dtype (see `buddy_select`): f32 inputs
run full-f32 MXU passes (`precision=HIGHEST`) — measured FREE at d=27
(2.49 vs 2.58 ms at the 96px-GT shape, the removed gather matmul more
than pays for the extra passes) and required for selection parity with
the f32 reference: at the backend-default bf16 passes, ~0.6% of rows
select a different (near-tie) bank entry (f64-ground-truth agreement
0.9944 vs 1.0000; measured final state: ONCHIP_r04_buddy.log — index
agreement 1.0000 on normal data at all shapes, 0.9999 on duplicate-heavy
data with residual disagreements at relative score gaps ~1e-8, i.e.
genuine f32-vs-f64 rounding ties, identical to the XLA-f32 path's own
behavior; and the two paths are bit-exact against each other on-chip).
bf16 inputs (the bf16 training step) contract the raw bf16 operands in
ONE MXU pass — bit-identical to HIGHEST for bf16-valued operands (the
split passes only add exact zeros; measured def==hi 1.0000 on-chip) and
faster in steady state: 0.47 vs 0.79 ms/call at the d=9/d=27 gt=96
shapes, measured with an IN-GRAPH fori_loop chain that amortizes the
axon tunnel's ~1-2 ms per-dispatch RPC (ONCHIP_r05_buddy.log; the
per-dispatch chain numbers in the same log are RPC-dominated and
direction-unreliable for sub-ms kernels — see PERF.md §3b).

The selection is gradient-free by construction (argmin has no gradient and
the bank derives from ground truth, so the reference's gather backward is
dead code — see losses/functions.py); the wrapper stops gradients
explicitly, keeping the kernel forward-only.

MEASURED (v5e single chip): in the full flagship GAN step the kernel is
throughput-neutral vs the XLA path at training shapes (3515 vs 3522
patches/s/chip, round 2); standalone it is 15-23x faster at 96-192px GT
shapes (ONCHIP_r03.log) because the XLA path is HBM-bound on its (B, N, M)
score tensors. It is the TPU default for the bounded working set;
`pallas=False` on the buddy losses forces the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _buddy_kernel(
    p1_ref, p2_ref, bank_ref, out_ref, score_ref, arg_ref,
    *, alpha, beta, dist_norm, m_total, m_tile, precision, raw_dot,
):
    j = pl.program_id(2)
    p1 = p1_ref[0].astype(jnp.float32)  # (Nt, d)
    p2 = p2_ref[0].astype(jnp.float32)
    bank = bank_ref[0].astype(jnp.float32)  # (Mt, d)
    nt = p1.shape[0]
    mt = bank.shape[0]

    # columns of this tile that are real bank entries (the last M tile and
    # any Pallas block padding are masked out of the reduction)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, mt), dimension=1)
    valid = (cols + j * m_tile) < m_total  # (1, Mt)

    if dist_norm == "l2":
        bank_norm = jnp.sum(bank * bank, axis=1)[None, :]  # (1, Mt)
        # bf16 inputs: contract the RAW bf16 operands — Mosaic's native
        # single-pass MXU path with an f32 accumulator, exact for bf16
        # values (bit-identical selection to HIGHEST-on-f32-casts,
        # asserted in-suite and on-chip).
        bank_t = bank_ref[0].T if raw_dot else bank.T

        def l2(p_f32, p_ref):
            p_norm = jnp.sum(p_f32 * p_f32, axis=1)[:, None]  # (Nt, 1)
            cross = jax.lax.dot_general(
                p_ref[0] if raw_dot else p_f32, bank_t,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=None if raw_dot else precision,
            )
            return jnp.clip(p_norm + bank_norm - 2.0 * cross, 0.0, None)

        score = alpha * l2(p1, p1_ref) + beta * l2(p2, p2_ref)
    elif dist_norm == "l1":
        # L1 has no matmul form; accumulate per-feature |p - bank| planes so
        # VMEM holds (Nt, Mt) running sums, never an (Nt, Mt, d) cube
        d = p1.shape[1]
        s1 = jnp.zeros((nt, mt), jnp.float32)
        s2 = jnp.zeros((nt, mt), jnp.float32)
        for k in range(d):
            bk = bank[:, k][None, :]
            s1 = s1 + jnp.abs(p1[:, k][:, None] - bk)
            s2 = s2 + jnp.abs(p2[:, k][:, None] - bk)
        score = alpha * s1 + beta * s2
    else:
        raise NotImplementedError(dist_norm)

    score = jnp.where(valid, score, jnp.inf)
    tile_min = jnp.min(score, axis=1, keepdims=True)  # (Nt, 1)
    # FIRST-occurrence winner: min column index among score == tile_min.
    # (Mosaic's argmin tie-break is unspecified on TPU — measured picking
    # later duplicates; torch.min/jnp.argmin pick the first.)
    cols_nm = jax.lax.broadcasted_iota(jnp.int32, (nt, mt), dimension=1)
    tile_arg = jnp.min(
        jnp.where(score == tile_min, cols_nm, jnp.int32(2**30)), axis=1
    )
    tile_idx = (tile_arg + j * m_tile)[:, None].astype(jnp.int32)  # (Nt, 1)

    @pl.when(j == 0)
    def _init():
        score_ref[...] = tile_min
        arg_ref[...] = tile_idx

    @pl.when(j > 0)
    def _merge():
        better = tile_min < score_ref[...]  # strict: earlier tile wins ties
        score_ref[...] = jnp.where(better, tile_min, score_ref[...])
        arg_ref[...] = jnp.where(better, tile_idx, arg_ref[...])

    @pl.when(j == pl.num_programs(2) - 1)
    def _emit():
        out_ref[0] = arg_ref[...]


def buddy_select(
    p1: jnp.ndarray,
    p2: jnp.ndarray,
    bank: jnp.ndarray,
    alpha: float = 1.0,
    beta: float = 1.0,
    dist_norm: str = "l2",
    interpret: bool = False,
    n_tile: int | None = None,
    m_tile: int | None = None,
    return_index: bool = False,
    precision=None,
) -> jnp.ndarray:
    """p1, p2: (B, N, d); bank: (B, M, d) -> selected (B, N, d).

    Equivalent to the XLA path in losses/functions._buddy_select; gradients
    are stopped (the selection is inherently gradient-free). Default tiles
    (1024, 1536) cover the 96px-GT training shapes in a single tile (no
    merge overhead) and bound the VMEM working set at any shape.

    The kernel computes the winning bank INDEX per row (first-occurrence
    tie-break, f32-exact scores by default — see module docstring); the
    value gather is an exact XLA `take_along_axis` outside the kernel.
    `return_index=True` additionally returns the (B, N) int32 indices —
    the selection-identity observable the on-chip correctness sweep
    compares (tools/bench_buddy.py). `precision` feeds the two l2 score
    contractions; None (default) resolves by input dtype:

      * f32 inputs -> HIGHEST: full f32 MXU passes, matches the
        CPU/f32-reference selection on near-tie rows (at the backend
        default ~0.6% of rows flip, ONCHIP_r04_buddy.log);
      * bf16 inputs (the bf16 training step) -> DEFAULT, implemented as
        a contraction of the RAW bf16 operands: a single MXU pass with
        an f32 accumulator, BIT-IDENTICAL to HIGHEST-on-f32-casts (bf16
        products are exact in f32; HIGHEST's extra split passes only add
        exact zeros — asserted in-suite and measured on-chip, def==hi
        1.0000 at d=9/27). Perf note: at these tiny d the selection is
        reduction-bound, so the pass count barely moves steady-state
        time (~0.10 raw vs ~0.13 ms HIGHEST at d=9); earlier readings of
        15-25x differences between these variants were the axon tunnel's
        background-compile warmup bleed, not kernel cost (PERF.md
        "bench methodology").
    """
    all_bf16 = all(t.dtype == jnp.bfloat16 for t in (p1, p2, bank))
    if precision is None:
        precision = (jax.lax.Precision.DEFAULT if all_bf16
                     else jax.lax.Precision.HIGHEST)
    # DEFAULT + bf16 inputs -> contract the raw bf16 refs in-kernel (the
    # single-pass MXU path); DEFAULT never reaches f32 operands.
    raw_dot = all_bf16 and precision == jax.lax.Precision.DEFAULT
    p1 = jax.lax.stop_gradient(p1)
    p2 = jax.lax.stop_gradient(p2)
    bank = jax.lax.stop_gradient(bank)
    b, n, d = p1.shape
    m = bank.shape[1]

    nt = min(n, n_tile or 1024)
    mt = min(m, m_tile or 1536)
    n_pad = -(-n // nt) * nt
    m_pad = -(-m // mt) * mt
    p1p, p2p = p1, p2
    if n_pad != n:
        pad = [(0, 0), (0, n_pad - n), (0, 0)]
        p1p = jnp.pad(p1, pad)
        p2p = jnp.pad(p2, pad)
    bankp = bank
    if m_pad != m:
        bankp = jnp.pad(bank, [(0, 0), (0, m_pad - m), (0, 0)])

    kernel = functools.partial(
        _buddy_kernel, alpha=alpha, beta=beta, dist_norm=dist_norm,
        m_total=m, m_tile=mt, precision=precision, raw_dot=raw_dot,
    )
    idx = pl.pallas_call(
        kernel,
        grid=(b, n_pad // nt, m_pad // mt),
        in_specs=[
            pl.BlockSpec((1, nt, d), lambda b_, i, j: (b_, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nt, d), lambda b_, i, j: (b_, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mt, d), lambda b_, i, j: (b_, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, nt, 1), lambda b_, i, j: (b_, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, 1), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((nt, 1), jnp.float32),
            pltpu.VMEM((nt, 1), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            # actual padded working set: ~4 (Nt, Mt) f32/i32 planes (two l2
            # scores, the column iota, the tie-break where) + the (Nt, d)
            # and (Mt, d) blocks at d rounded up to the 128-lane tile (d
            # can exceed one tile: ksize>=7 gives d=3*ksize^2 > 128),
            # double-buffered. The default 16 MB scoped limit is ~200 KB
            # short at the default (1024, 1536) tiles; v5e VMEM allows far
            # more (packed_trunk runs at 110 MB).
            vmem_limit_bytes=min(
                110 * 1024 * 1024,
                4 * nt * mt * 4
                + 8 * (2 * nt + mt) * (-(-d // 128) * 128) * 4
                + 8 * 1024 * 1024,
            ),
        ),
        interpret=interpret,
    )(p1p, p2p, bankp)
    idx = idx[:, :n, 0]
    sel = jnp.take_along_axis(bank, idx[..., None], axis=1)
    if return_index:
        return sel, idx
    return sel
