"""On-chip buddy-select correctness (argmin-INDEX level) + timing sweep.

Round-3 verdict: the value-level `row-agree` metric (|sel_xla - sel_pallas|
< 1e-5) printed 0.0000 at every shape on the real chip — but that metric is
confounded: any matmul that runs bf16 MXU passes (the TPU default for f32)
perturbs either the scores (flipping near-tie argmins) or the gathered
values themselves. This sweep measures what training actually consumes —
WHICH bank entry each row selects:

  * ground truth = f64 numpy argmin of the exact score formula (host);
  * four on-chip variants: {XLA, Pallas} x {default precision, HIGHEST};
  * for every disagreeing row, the f64 RELATIVE score gap between the two
    chosen bank entries — a true selection bug shows gaps at full scale,
    precision tie-noise shows gaps ~1e-6.

Shapes are the buddy-loss patch shapes induced by GT tile sizes 96/144/192
px (ksize=stride=3, 3-scale bank, d=3*3*3): N=(gt/3)^2, M=N+(gt/6)^2+
(gt/12)^2. Data: random normal, plus a 1/255-quantized low-entropy variant
(real image patches produce exact duplicate bank entries; exercises the
first-occurrence tie-break at scale).

Timing uses data-dependent chains (CLAUDE.md: independent dispatches get
pipelined by the axon tunnel).

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/bench_buddy.py
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from srgan_st_tpu.kernels.buddy_select import buddy_select

B, D = 16, 27
ITERS = 20


def host_scores_f64(p1, p2, bank, alpha=1.0, beta=1.0):
    """Exact f64 combined l2 scores, (B, N, M)."""
    p1, p2, bank = (np.asarray(x, np.float64) for x in (p1, p2, bank))

    def l2(p):
        pn = (p**2).sum(-1)[:, :, None]
        bn = (bank**2).sum(-1)[:, None, :]
        cross = np.einsum("bnd,bmd->bnm", p, bank)
        return np.clip(pn + bn - 2.0 * cross, 0.0, None)

    return alpha * l2(p1) + beta * l2(p2)


def xla_indices(p1, p2, bank, precision):
    def l2(p):
        pn = (p**2).sum(-1)[:, :, None]
        bn = (bank**2).sum(-1)[:, None, :]
        cross = jnp.einsum("bnd,bmd->bnm", p, bank, precision=precision)
        return jnp.clip(pn + bn - 2.0 * cross, 0.0, None)

    return jnp.argmin(l2(p1) + l2(p2), axis=2).astype(jnp.int32)


def gap_stats(ind, ref_ind, scores64):
    """Agreement vs f64 ground truth + relative score gap on disagreements."""
    ind = np.asarray(ind)
    agree = float((ind == ref_ind).mean())
    dis = np.nonzero(ind != ref_ind)
    if dis[0].size == 0:
        return agree, 0.0, 0.0
    s_got = scores64[dis[0], dis[1], ind[dis]]
    s_ref = scores64[dis[0], dis[1], ref_ind[dis]]
    rel = np.abs(s_got - s_ref) / np.maximum(s_ref, 1e-300)
    return agree, float(np.median(rel)), float(rel.max())


def chain(fn, p1, p2, bank, n):
    # Timing discipline (PERF.md "bench methodology", learned in r4):
    #  * the chain threads REAL values (scaled add — a 0.0*x link gets
    #    folded and the chain DCE'd/deduped);
    #  * warmup counts DISPATCHES and ENDS WITH A VALUE FETCH — on the
    #    axon tunnel `block_until_ready` is a no-op until a fetch has
    #    finalized the executable's background compile (a 1-call warmup
    #    once read this kernel as "50 ms/call"; steady state is ~0.1 ms).
    #    After that fetch, block_until_ready is reliable and cheaper than
    #    a fetch (no device->host payload), so the timed region uses it.
    sel = fn(p1, p2, bank)
    for _ in range(15):
        p1 = p1 + (0.1 * sel).astype(p1.dtype)
        sel = fn(p1, p2, bank)
    float(jnp.sum(sel.astype(jnp.float32)))  # fetch barrier: finalize
    t0 = time.perf_counter()
    for _ in range(n):
        p1 = p1 + (0.1 * sel).astype(p1.dtype)
        sel = fn(p1, p2, bank)
    jax.block_until_ready(sel)
    return (time.perf_counter() - t0) / n * 1e3  # ms


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--check", action="store_true",
                   help="regression-gate mode: exit nonzero unless the "
                   "REAL kernel's index agreement vs f64 ground truth is "
                   ">= 0.999 at HIGHEST precision and plc-hi==xla-hi >= "
                   "0.999 at every shape (the measured r4 envelope is "
                   "1.0000 normal / 0.9999 quantized, ONCHIP_r04_buddy.log)")
    p.add_argument("--quick", action="store_true",
                   help="96px shape only, no timing (CI/regression use)")
    args = p.parse_args(argv)

    print("devices:", jax.devices())
    hi = jax.lax.Precision.HIGHEST
    rng = np.random.default_rng(0)
    worst_hi, worst_cross = 1.0, 1.0

    for gt in (96,) if args.quick else (96, 144, 192):
        n = (gt // 3) ** 2
        m = n + (gt // 6) ** 2 + (gt // 12) ** 2
        for tag in ("normal", "quantized"):
            p1 = rng.standard_normal((B, n, D)).astype(np.float32)
            p2 = rng.standard_normal((B, n, D)).astype(np.float32)
            bank = rng.standard_normal((B, m, D)).astype(np.float32)
            if tag == "quantized":
                # 1/255 grid + duplicated bank block: exact ties guaranteed
                p1, p2, bank = (np.round(x * 32) / 255 for x in (p1, p2, bank))
                bank[:, m // 2:] = bank[:, : m - m // 2]
            s64 = host_scores_f64(p1, p2, bank)
            ref_ind = np.argmin(s64, axis=2)  # first occurrence

            jp1, jp2, jbank = map(jnp.asarray, (p1, p2, bank))
            variants = {
                "xla-def": jax.jit(lambda a, b, c: xla_indices(a, b, c, None)),
                "xla-hi": jax.jit(lambda a, b, c: xla_indices(a, b, c, hi)),
                "plc-def": jax.jit(lambda a, b, c: buddy_select(
                    a, b, c, return_index=True, precision=None)[1]),
                "plc-hi": jax.jit(lambda a, b, c: buddy_select(
                    a, b, c, return_index=True, precision=hi)[1]),
            }
            inds = {k: np.asarray(f(jp1, jp2, jbank))
                    for k, f in variants.items()}
            cells = []
            for k, ind in inds.items():
                agree, med, mx = gap_stats(ind, ref_ind, s64)
                cells.append(f"{k} {agree:.4f} (gap med {med:.1e} max {mx:.1e})")
            cross = float((inds["plc-hi"] == inds["xla-hi"]).mean())
            print(f"gt={gt:3d} N={n:5d} M={m:5d} {tag:9s} | "
                  + " | ".join(cells) + f" | plc-hi==xla-hi {cross:.4f}")
            worst_hi = min(worst_hi, gap_stats(inds["plc-hi"], ref_ind, s64)[0])
            worst_cross = min(worst_cross, cross)

        if args.quick:
            continue
        # timing at the training-value path (selection vectors, not indices)
        p1 = jnp.asarray(rng.standard_normal((B, n, D)).astype(np.float32))
        p2 = jnp.asarray(rng.standard_normal((B, n, D)).astype(np.float32))
        bank = jnp.asarray(rng.standard_normal((B, m, D)).astype(np.float32))
        from srgan_st_tpu.losses.functions import _buddy_select

        rows = {
            "xla": jax.jit(lambda a, b, c: _buddy_select(
                a, b, c, 1.0, 1.0, "l2", pallas=False)),
            "plc-def": jax.jit(lambda a, b, c: buddy_select(
                a, b, c, precision=None)),
            "plc-hi": jax.jit(lambda a, b, c: buddy_select(
                a, b, c, precision=hi)),
        }
        times = {k: chain(f, p1, p2, bank, ITERS) for k, f in rows.items()}
        print(f"gt={gt:3d} timing  | " + "  ".join(
            f"{k} {v:8.2f} ms" for k, v in times.items()))

    # bf16 input dtype (the bf16 training step): the dtype-resolved
    # precision default (kernels/buddy_select.py) must select
    # BIT-identically to HIGHEST — bf16 x bf16 products are exact in the
    # f32 accumulator; HIGHEST's split passes add exact zeros — while
    # running one MXU pass instead of six. d=9 is the Gram selection
    # (the round-4 profile measured ~385 us/step of pass-multiplier waste
    # there), d=27 the BestBuddy/PatchwiseST one.
    worst_bf16 = 1.0
    for d in (9, 27):
        gt = 96
        n = (gt // 3) ** 2
        m = n + (gt // 6) ** 2 + (gt // 12) ** 2
        mk = lambda: jnp.asarray(  # noqa: E731
            rng.standard_normal((B, n, d)).astype(np.float32)
        ).astype(jnp.bfloat16)
        p1, p2 = mk(), mk()
        bank = jnp.asarray(
            rng.standard_normal((B, m, d)).astype(np.float32)
        ).astype(jnp.bfloat16)
        f_def = jax.jit(lambda a, b, c: buddy_select(
            a, b, c, return_index=True, precision=None)[1])
        f_hi = jax.jit(lambda a, b, c: buddy_select(
            a, b, c, return_index=True,
            precision=jax.lax.Precision.HIGHEST)[1])
        i_def = np.asarray(f_def(p1, p2, bank))
        i_hi = np.asarray(f_hi(p1, p2, bank))
        ident = float((i_def == i_hi).mean())
        worst_bf16 = min(worst_bf16, ident)
        line = f"bf16 d={d:2d} N={n:5d} M={m:5d} | def==hi {ident:.4f}"
        if not args.quick:
            sel_def = jax.jit(lambda a, b, c: buddy_select(
                a, b, c, precision=None))
            sel_hi = jax.jit(lambda a, b, c: buddy_select(
                a, b, c, precision=jax.lax.Precision.HIGHEST))
            t_def = chain(sel_def, p1, p2, bank, ITERS)
            t_hi = chain(sel_hi, p1, p2, bank, ITERS)
            line += f" | def {t_def:8.2f} ms  hi {t_hi:8.2f} ms"
        print(line)

    if args.check:
        ok = (worst_hi >= 0.999 and worst_cross >= 0.999
              and worst_bf16 == 1.0)
        print(f"CHECK {'PASS' if ok else 'FAIL'}: worst plc-hi agreement "
              f"{worst_hi:.4f}, worst plc-hi==xla-hi {worst_cross:.4f} "
              f"(gates 0.999), bf16 def==hi {worst_bf16:.4f} (gate 1.0)")
        sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
