"""Fused serving tail: last upsample conv + PReLU + doubly-coarse
reconstruction conv as ONE H-tiled Pallas kernel.

The serving (batch-1 whole-image eval) frame at 4K spends ~22 of its 69
ms in the tail (ONCHIP_r05_serving.log): the last upsample block's 3x3
64->256 conv (~4 ms, whose (1, 1080, 1920, 256) bf16 activation is a
~1 GB HBM round-trip) followed by the reconstruction conv, which the
XLA fallback runs as the 5x5 C=256->N=12 coarse conv at 12/128 MXU
lanes (~17.8 ms) — and the standalone H-tiled Pallas coarse conv
(kernels/coarse_conv.py) is no answer there: its custom-call operand
layout poisons XLA's layout assignment around it, a measured 2.3x
END-TO-END loss (159.2 vs 69.2 ms/frame, ONCHIP_r05_serving.log).

This kernel fuses the whole tail so the 256-channel activation never
touches HBM and every contraction is MXU-shaped:

  stage 1 — the upsample conv on W-parity lane-packed operands
    (kernels/xpack_trunk.py's A-form): fine (H, W, 64) viewed as offset-
    packed (H, W/2+1, 128); each output row is 6 dots
    (W/2, 128) @ (128, 512) (3 qy taps x 2 source columns) + packed
    bias + PReLU (single shared slope — commutes with the elided
    pixel-shuffle, models/generator.py UpsampleBlock).
  stage 2 — the doubly-coarse conv3 (same algebra as
    kernels/coarse_conv.py): the stage-1 tile IS the (rx, c)-packed
    view of the pre-shuffle activation (the A-form output lane layout
    and the parity-pack lane layout coincide); 18 dots
    (th*W/2, 512) @ (512, 48) accumulate the quarter-res output.

H tiling with double-buffered window DMA: the packed input stays in HBM
(`pl.ANY`); tile j+1's (2*th+6)-fine-row halo window copies into its
VMEM slot while tile j computes. Stage 1 runs as a fori_loop over
coarse scratch rows writing a (th+2, 2, wc+2, 512) parity-split VMEM
buffer — per-iteration ref slices keep live values to one row's f32
accumulator (loading the whole window as a value spilled ~100 MB of
vregs and made Mosaic's compile pathological; ROUND5.md "TPU wedge
note").

Output is the (B, H/2, W/2, 48) quarter-res tensor in `_coarse_kernel`
channel order; the caller depth-to-spaces twice and adds the conv3 bias
(ops/subpixel_conv.py conventions). No backward — this is a serving
(eval-only) path; training never reaches it (models/generator.py gates
tail_mode to train=False).

Reference semantics reproduced: model.py:118-127 (the last
`_UpsampleBlock` + the 9x9 reconstruction conv) in eval mode, at the
serving surface validate.py:73-77.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from srgan_st_tpu.kernels.packed_trunk import pack_conv_blocks


# per-core VMEM budget for the double-buffered working set (2 window
# slots + the parity-split stage-1 scratch + live values + the f32 out
# block + weights); kept under the ~128 MB physical VMEM with headroom
# for Mosaic's own temporaries (the call raises the 16 MB scoped default
# via CompilerParams, as kernels/coarse_conv.py does)
TAIL_BUDGET_BYTES = 80 * 2**20


def _kernel(y_ref, wu_ref, bu_ref, w3_ref, out_ref, ywin, tbuf, sems, *,
            th, wc, wp8, c2u, n3, nh, h_fine):
    """One (batch, H-tile) grid step.

    y_ref:  (b, h_fine+6, wp8, 128) cdt, HBM — offset-packed input; 3
            zero rows front/back (stage-1 conv halo + stage-2 SAME halo).
    wu_ref: (3, 2, 128, c2u)   — stage-1 A-form q-blocks.
    bu_ref: (2, c2u) f32       — row 0: packed upsample bias; row 1: the
            PReLU slope broadcast (operand, not closure: it is a traced
            network parameter).
    w3_ref: (3, 2, 3, c2u, n3) — stage-2 doubly-coarse blocks, K=(rx, c).
    out_ref:(1, th, wc, n3) cdt — quarter-res output block.
    ywin:   (2, 2*th+6, wp8, 128) VMEM — double-buffered input windows.
    tbuf:   (th+2, 2, wc, c2u) VMEM — stage-1 output, parity-split
            rows (the stage-2 SAME halo cols are padded onto the value).
    """
    i = pl.program_id(0)  # batch element
    j = pl.program_id(1)  # H tile

    def window_copy(jj, slot):
        return pltpu.make_async_copy(
            y_ref.at[i, pl.ds(2 * th * jj, 2 * th + 6)],
            ywin.at[slot],
            sems.at[slot],
        )

    @pl.when(j == 0)
    def _():
        window_copy(0, 0).start()

    @pl.when(j + 1 < nh)
    def _():
        window_copy(j + 1, (j + 1) % 2).start()

    window_copy(j, j % 2).wait()

    bu = bu_ref[0]      # (c2u,) f32
    alpha = bu_ref[1]   # (c2u,) f32, constant across lanes

    def stage1(slot):
        # fine t rows for this tile: global r = 2*th*j - 2 + k for local
        # k in [0, 2*th+4); y taps for row r live at window-local rows
        # k..k+2 (the window starts at padded row 2*th*j = fine row
        # 2*th*j - 3). Rows outside the image are zeroed (they are the
        # coarse conv's SAME padding, NOT conv-of-zero rows: bias+PReLU
        # of zero input is nonzero).
        def body(ci, _):
            for ry in range(2):  # two fine parities per scratch row
                k = 2 * ci + ry
                r = 2 * th * j - 2 + k
                valid = jnp.logical_and(r >= 0, r < h_fine)
                acc = jnp.zeros((wc, c2u), jnp.float32)
                for qy in range(3):
                    # ref slices, not value slices: load each (wc, 128)
                    # operand straight from scratch (coarse_conv idiom)
                    acc += jnp.dot(
                        ywin[slot, k + qy, pl.ds(0, wc), :], wu_ref[qy, 0],
                        preferred_element_type=jnp.float32,
                    )
                    acc += jnp.dot(
                        ywin[slot, k + qy, pl.ds(1, wc), :], wu_ref[qy, 1],
                        preferred_element_type=jnp.float32,
                    )
                acc = acc + bu
                acc = jnp.where(acc >= 0, acc, alpha * acc)
                acc = jnp.where(valid, acc, 0.0)
                # sublane-ALIGNED store (offset 0, full extent): Mosaic
                # mis-lowered the earlier offset-1 halo-col store / the
                # unaligned scratch-ref slab slices in stage 2 (the dump
                # harness proved stage 1 exact while the composition was
                # garbage, tools/debug_tail_onchip.py); the W halo is
                # now padded onto the VALUE in stage 2 instead.
                tbuf[ci, ry] = acc.astype(tbuf.dtype)
            return 0

        lax.fori_loop(0, th + 2, body, 0)

    # body duplicated under pl.when per buffer slot so no value load
    # indexes a ref dynamically (kernels/coarse_conv._kernel_tiled idiom)
    @pl.when(j % 2 == 0)
    def _():
        stage1(0)

    @pl.when(j % 2 == 1)
    def _():
        stage1(1)

    # stage 2 on a VALUE with free-view slices, exactly like the proven
    # one-block kernel (coarse_conv._kernel): load tbuf once, pad the W
    # halo in-register, slice per (qy, ry, qx)
    tval = tbuf[:, :, :, :]  # (th+2, 2, wc, c2u)
    tpad = jnp.pad(tval, ((0, 0), (0, 0), (1, 1), (0, 0)))
    acc2 = jnp.zeros((th * wc, n3), jnp.float32)
    for qy in range(3):
        for ry in range(2):
            for qx in range(3):
                slab = lax.slice(
                    tpad, (qy, ry, qx, 0), (qy + th, ry + 1, qx + wc, c2u)
                )
                acc2 += jnp.dot(
                    slab.reshape(th * wc, c2u), w3_ref[qy, ry, qx],
                    preferred_element_type=jnp.float32,
                )
    # emit in the compute dtype: the f32 48-lane block would double the
    # bytes through the downstream HR permutation (measured pool,
    # ONCHIP_r05_tail.log profiles)
    out_ref[0] = acc2.reshape(th, wc, n3).astype(out_ref.dtype)


def _pick_tile(hc: int, wc: int, c2u: int, n3: int) -> int | None:
    """Largest divisor th of hc whose working set — 2 input window slots
    + the parity-split stage-1 scratch + a few live row/slab values + the
    f32 out block + weights — fits TAIL_BUDGET_BYTES."""
    wp8 = -(-(wc + 3) // 8) * 8
    for th in sorted((d for d in range(1, min(hc, 64) + 1) if hc % d == 0),
                     reverse=True):
        window = (2 * th + 6) * wp8 * 128 * 2          # cdt slot (bf16)
        t_scr = (th + 2) * 2 * wc * c2u * 2            # stage-1 scratch
        row_acc = 4 * wc * c2u * 4                     # live f32 rows
        slab = 4 * th * wc * c2u * 2                   # live stage-2 slabs
        out_blk = 2 * th * wc * n3 * 4
        weights = (6 * 128 * c2u + 18 * c2u * n3) * 2
        if (2 * window + t_scr + row_acc + slab + out_blk + weights
                <= TAIL_BUDGET_BYTES):
            return th
    return None


def fits_budget(h: int, w: int, c_in: int, n_up: int, n_out: int) -> bool:
    """Trace-time feasibility of `serving_tail` for a fine (_, h, w, c_in)
    input, an n_up-channel upsample conv and an n_out-channel fine conv3:
    even dims, full-lane packing (2*c_in == 128), and `_pick_tile` finds
    an H tile. Single source of truth for dispatch gates (callers must
    not approximate the working-set formula — models/generator.py)."""
    if h % 2 or w % 2 or 2 * c_in != 128 or h < 2:
        return False
    return _pick_tile(h // 2, w // 2, 2 * n_up, 16 * n_out) is not None


def serving_tail(y: jnp.ndarray, w_up: jnp.ndarray, b_up: jnp.ndarray,
                 alpha, w3: jnp.ndarray, b3: jnp.ndarray,
                 interpret: bool = False) -> jnp.ndarray:
    """Fused eval tail: pixel_shuffle(2) ∘ PReLU ∘ conv3x3(w_up, b_up)
    followed by the kxk fine conv3 (w3, b3) — computed as [stage-1
    packed conv + PReLU] + [doubly-coarse conv3] + two depth-to-spaces
    + bias, the same dot products as the XLA composition reassociated.

    y:     (B, H, W, C) input of the LAST upsample block (C=64).
    w_up:  (3, 3, C, N_up) upsample kernel (N_up = C*4 pre-shuffle).
    b_up:  (N_up,) bias;  alpha: PReLU slope (scalar / shape (1,)).
    w3:    (kh, kw, N_up//4, n) fine reconstruction kernel (9x9 64->3).
    b3:    (n,) bias.
    Returns the fine HR (B, 2H, 2W, n) tensor (pre-clamp), matching
    ops/subpixel_conv.conv2d_subpixel_pre_shuffled's composition to f32
    accumulation-order rounding (gates:
    tests/test_kernels.py::TestServingTail).
    """
    from srgan_st_tpu.kernels.coarse_conv import _w3_blocks
    from srgan_st_tpu.ops.subpixel_conv import _coarse_kernel, depth_to_space

    b, h, w, c = y.shape
    n_up = w_up.shape[-1]
    if h % 2 or w % 2:
        raise ValueError(f"serving_tail needs even H, W; got {(h, w)}")
    if 2 * c != 128:
        raise ValueError(f"serving_tail needs C=64 (full lane pack), got {c}")
    cdt = y.dtype
    hc, wc = h // 2, w // 2
    c2u = 2 * n_up
    n3 = 4 * 4 * w3.shape[-1]
    th = _pick_tile(hc, wc, c2u, n3)
    if th is None:
        raise ValueError(
            f"serving_tail: no H tile of hc={hc} fits VMEM at wc={wc} — "
            "use the unfused tail (tail_mode=None)"
        )
    nh = hc // th

    # offset-packed input (xpack_trunk conventions): packed col j = fine
    # cols (2j-1, 2j); width padded to wp8 8-aligned sublanes for the
    # window DMA; 3 zero rows front/back cover stage-1's conv halo (1)
    # + stage-2's SAME halo (2 fine rows) at the image edges.
    wp8 = -(-(wc + 3) // 8) * 8
    yp = jnp.pad(
        y.astype(cdt), ((0, 0), (3, 3), (1, 2 * wp8 - w - 1), (0, 0))
    )
    yq = yp.reshape(b, h + 6, wp8, 2 * c)

    wq = pack_conv_blocks(w_up.astype(cdt))             # (3, 2, 128, c2u)
    scal = jnp.concatenate([
        jnp.concatenate([b_up, b_up]).astype(jnp.float32)[None],
        jnp.broadcast_to(
            jnp.asarray(alpha, jnp.float32).reshape(-1)[:1], (1, c2u)
        ),
    ])                                                  # (2, c2u) f32
    w2 = _coarse_kernel(w3, 2)                          # (5, 5, 4C, 4n)
    wb = _w3_blocks(w2).astype(cdt)                     # (3, 2, 3, c2u, n3)

    kernel = functools.partial(
        _kernel, th=th, wc=wc, wp8=wp8, c2u=c2u, n3=n3, nh=nh, h_fine=h,
    )
    z = pl.pallas_call(
        kernel,
        grid=(b, nh),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((3, 2, 2 * c, c2u), lambda i, j: (0, 0, 0, 0)),
            pl.BlockSpec((2, c2u), lambda i, j: (0, 0)),
            pl.BlockSpec((3, 2, 3, c2u, n3), lambda i, j: (0, 0, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, th, wc, n3), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, hc, wc, n3), cdt),
        scratch_shapes=[
            pltpu.VMEM((2, 2 * th + 6, wp8, 2 * c), cdt),
            pltpu.VMEM((th + 2, 2, wc, c2u), cdt),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 2**20,
            # the j-1 -> j double-buffer protocol requires IN-ORDER grid
            # steps; "arbitrary" pins both dims sequential (Mosaic may
            # otherwise reorder/parallelize a "parallel"-inferred dim)
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(yq, wq.astype(cdt), scal, wb)

    # undo the inner factoring AND the elided shuffle pair in ONE
    # composite transpose (d2s∘d2s as two 6-D transposes measured 11.2
    # ms/frame of the 98.5 ms tail variant — reshape.23 + copy.507,
    # SERVE_VARIANT=tail profile; lanes are (n, py, px, ry, rx) where
    # (py, px) are the coarse-kernel phases and (ry, rx) the inner ones:
    # HR row = 4*i + 2*ry + py, col = 4*j + 2*rx + px)
    n = w3.shape[-1]
    zc = z.reshape(b, hc, wc, n, 2, 2, 2, 2)
    zc = zc.transpose(0, 1, 6, 4, 2, 7, 5, 3)  # b, hc, ry, py, wc, rx, px, n
    out = zc.reshape(b, 4 * hc, 4 * wc, n)
    return out + b3.astype(cdt)
