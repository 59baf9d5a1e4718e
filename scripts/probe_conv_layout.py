#!/usr/bin/env python
"""Conv-layout scheduling probe (r4 VERDICT Next #6 — the bounded probe).

The batch-64 roofline (ARCHITECTURE.md) puts the whole remaining single-
chip headroom inside conv scheduling (133.5 -> ~167 TFLOPS at 85% MXU).
This probe asks whether any ALTERNATIVE lowering layout of the dominant
convolutions beats the NHWC/HWIO form flax emits today:

- input/output layout: NHWC (current) vs NCHW
- kernel layout: HWIO (current) vs OIHW vs OHWI

for the generator's dominant gate-conv shapes at the winner operating
point (effective batch 128 = doubled batch 64, bf16), measured fwd-only
and fwd+bwd (the backward is where the r3 roofline found the <25%-MXU
weight-gradient convs).

Honest clock: each (shape, layout) cell is ONE jitted executable applying
the conv ``--iters`` times against per-iteration-scaled weights (defeats
CSE without adding meaningful work) and reducing every result into one
scalar; the timing fetches that VALUE, so it cannot resolve before all
iterations executed on the chip. Layout transposes of the operands happen
OUTSIDE the timed executable (inputs are materialized in the target
layout), so the cell times the conv schedule itself, not host-side
re-layout.

Result protocol: any layout >5% faster on a dominant shape graduates to a
full-step A/B via bench_probe; otherwise the rows go to ARCHITECTURE.md's
dead-end list and single-chip perf is declared CLOSED.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")

import jax
import jax.numpy as jnp
import numpy as np

# Dominant generator conv shapes at the winner point (batch 64 -> effective
# 128 after the fused prior+posterior doubling), from the SAVPCell
# architecture (ngf=32, 3 scales, 5x5 gates, split layout):
#   name                 (B,   H,  W, Cin) -> Cout, k, stride
SHAPES = [
    ("dec_rnn0.gates_x", (128, 64, 64, 64), 128, 5, 1),   # biggest flops/step
    ("enc_rnn1.gates_x", (128, 32, 32, 64), 256, 5, 1),
    ("dec_rnn1.gates_x", (128, 32, 32, 128), 256, 5, 1),
    ("enc_rnn2.gates_x", (128, 16, 16, 128), 512, 5, 1),
    ("down1.conv", (128, 64, 64, 32), 64, 3, 1),          # conv_pool2d's full-res conv
    ("up0.conv", (128, 64, 64, 64), 32, 3, 1),            # post-resize decoder conv
]

LAYOUTS = [
    ("NHWC/HWIO", ("NHWC", "HWIO", "NHWC")),
    ("NCHW/OIHW", ("NCHW", "OIHW", "NCHW")),
    ("NHWC/OHWI", ("NHWC", "OHWI", "NHWC")),
]


def _materialize(x_nhwc: np.ndarray, w_hwio: np.ndarray, dn):
    """Re-layout operands host-side so the timed cell sees its native form."""
    lhs_spec, rhs_spec, _ = dn
    x = x_nhwc if lhs_spec == "NHWC" else np.transpose(x_nhwc, (0, 3, 1, 2))
    perm = {"HWIO": (0, 1, 2, 3), "OIHW": (3, 2, 0, 1), "OHWI": (3, 0, 1, 2)}[rhs_spec]
    w = np.transpose(w_hwio, perm)
    return jnp.asarray(x, jnp.bfloat16), jnp.asarray(w, jnp.bfloat16)


def time_cell(x, w, dn, stride, iters, rounds, backward):
    """One jitted fori_loop applying the conv ``iters`` times.

    A fori_loop, NOT a Python unroll: the remote compile helper on this
    box takes ~3-4 MINUTES per executable regardless of size (measured
    r5 — a 4-conv unrolled cell compiled in 180 s, a 16-iter fori_loop
    in 246 s; a 30-conv unroll never returned inside 21 min), so the
    loop body must stay one conv. The loop-carried ``acc`` chains every
    iteration and the per-index weight scale defeats CSE; the final
    value fetch is the only sync, so the clock stays honest.
    """

    def conv(xx, ww):
        return jax.lax.conv_general_dilated(
            xx, ww, window_strides=(stride, stride), padding="SAME", dimension_numbers=dn
        )

    if backward:
        def one(ww):
            return conv(x, ww).astype(jnp.float32).mean()

        vg = jax.value_and_grad(one)

        @jax.jit
        def cell(w):
            def body(i, acc):
                ww = (w.astype(jnp.float32) * (1.0 + 1e-6 * i.astype(jnp.float32))).astype(w.dtype)
                v, g = vg(ww)
                return acc + v + g.astype(jnp.float32).mean()

            return jax.lax.fori_loop(0, iters, body, jnp.zeros((), jnp.float32))
    else:
        @jax.jit
        def cell(w):
            def body(i, acc):
                ww = (w * (1.0 + 1e-6 * i.astype(jnp.float32))).astype(w.dtype)
                return acc + conv(x, ww).astype(jnp.float32).mean()

            return jax.lax.fori_loop(0, iters, body, jnp.zeros((), jnp.float32))

    t0 = time.perf_counter()
    float(cell(w))  # compile + first run
    compile_s = time.perf_counter() - t0
    dt = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        float(cell(w))  # single executable; value fetch = real sync
        dt = min(dt, time.perf_counter() - t0)
    return dt / iters, compile_s


def main():
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--iters", type=int, default=16)
    p.add_argument("--rounds", type=int, default=3)
    p.add_argument("--fwd_only", action="store_true")
    p.add_argument(
        "--shapes",
        default="",
        help="comma-separated substring filter over shape names (empty = all); "
        "use to bound the run — each (shape, layout, pass) cell costs a "
        "~3-4 min remote compile on this box",
    )
    args = p.parse_args()

    from video_prediction_tpu.utils.watchdog import device_init_or_die

    device_init_or_die()
    rng = np.random.RandomState(0)
    passes = ("fwd",) if args.fwd_only else ("fwd", "fwd+bwd")
    wanted = [s for s in args.shapes.split(",") if s]
    shapes = [
        row for row in SHAPES if not wanted or any(sub in row[0] for sub in wanted)
    ]
    for name, (b, h, w_, cin), cout, k, stride in shapes:
        x_nhwc = rng.rand(b, h, w_, cin).astype(np.float32)
        w_hwio = (rng.rand(k, k, cin, cout).astype(np.float32) - 0.5) * 0.1
        flops = 2 * b * (h // stride) * (w_ // stride) * k * k * cin * cout
        for backward in (bp == "fwd+bwd" for bp in passes):
            label = "fwd+bwd" if backward else "fwd"
            base_ms = None
            for lname, dn in LAYOUTS:
                x, w = _materialize(x_nhwc, w_hwio, dn)
                sec, compile_s = time_cell(x, w, dn, stride, args.iters, args.rounds, backward)
                eff = flops * (3 if backward else 1) / sec / 1e12
                if base_ms is None:
                    base_ms = sec * 1e3
                print(
                    f"RESULT shape={name} pass={label} layout={lname} "
                    f"ms={sec * 1e3:.3f} tflops={eff:.1f} "
                    f"vs_nhwc={sec * 1e3 / base_ms:.3f} compile_s={compile_s:.1f}",
                    flush=True,
                )


if __name__ == "__main__":
    main()
