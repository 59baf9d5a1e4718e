#!/usr/bin/env python
"""Chipless AOT memory probe: per-device HBM of the SAVP train step.

Compiles — never runs — the flagship train step against a COMPILE-ONLY
TPU topology (``jax.experimental.topologies``; no chip needed, works even
when the tunnel is down) and prints the executable's per-device memory
breakdown from ``compiled.memory_analysis()``. This is the same
TpuAotCompiler path whose OOM reports produced the measured full-unroll
memory map (batch 64 fp32 gates = 16.38G of 15.75G, 80/96/128 bf16 =
18.33/21.53/22.35G — ARCHITECTURE.md), so numbers are directly
comparable.

Primary use: validating spatial partitioning's memory claim (r4 VERDICT
next #4) — does dp1 x sp2 sharding actually halve the per-device
activation term and move the OOM wall?

    # the known-OOM unsharded point (expect ~18.3G total)
    python scripts/aot_memory.py --batch 80
    # the same batch spatially sharded over 2 devices (expect ~half the temp)
    python scripts/aot_memory.py --batch 80 --spatial 2

Caveats: the smallest v5e compile-only topology this libtpu accepts is
2x2 (4 devices); unsharded rows compile on a 1-device submesh and
sharded rows on a (data x spatial) submesh of it. Compilation happens
locally (one core) — full-unroll graphs take several minutes each.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

# allow `python scripts/<tool>.py` from anywhere: put the repo root on sys.path
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

GIB = 1024.0**3
V5E_HBM_GIB = 15.75  # usable HBM reported by the runtime on this chip


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--batch", type=int, required=True, help="GLOBAL batch size")
    p.add_argument("--data", type=int, default=1, help="data-parallel mesh axis")
    p.add_argument("--spatial", type=int, default=1, help="spatial (model) mesh axis")
    p.add_argument("--unroll", type=int, default=0, help="scan_unroll (0 = full unroll)")
    p.add_argument("--gate", choices=("merged", "split"), default="split")
    p.add_argument("--gate_dtype", choices=("float32", "bfloat16"), default="bfloat16")
    p.add_argument("--sequence_length", type=int, default=12)
    p.add_argument("--context_frames", type=int, default=2)
    p.add_argument("--size", type=int, default=64)
    p.add_argument("--topology", default="v5e:2x2", help="compile-only topology name")
    p.add_argument("--hparams", default="", help="extra k=v,... ModelHparams overrides")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from video_prediction_tpu.bench_common import savp_bench_hparams
    from video_prediction_tpu.models import get_model_class
    from video_prediction_tpu.parallel.mesh import batch_shardings, spatial_trace_mesh
    from video_prediction_tpu.train import create_train_state, make_train_step

    n_dev = args.data * args.spatial
    topo = topologies.get_topology_desc(args.topology, platform="tpu")
    if len(topo.devices) < n_dev:
        raise SystemExit(f"topology {args.topology} has {len(topo.devices)} devices < {n_dev}")
    devs = np.asarray(topo.devices)[:n_dev].reshape(args.data, args.spatial)
    mesh = Mesh(devs, ("data", "model"))

    hp = savp_bench_hparams(
        args.batch,
        scan_unroll=args.unroll,
        lstm_gate_conv=args.gate,
        gate_dtype=args.gate_dtype,
        sequence_length=args.sequence_length,
        context_frames=args.context_frames,
        extra=args.hparams,
    )
    model = get_model_class("savp")(hp)

    # abstract TrainState via eval_shape — no real init compute, no devices
    example = {
        "images": np.zeros(
            (2, args.sequence_length, args.size, args.size, 3), np.float32
        )
    }
    ts_shape = jax.eval_shape(
        lambda rng: create_train_state(model, rng, example), jax.random.PRNGKey(0)
    )
    repl = NamedSharding(mesh, P())
    ts_struct = jax.tree_util.tree_map(
        lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=repl), ts_shape
    )
    batch_struct = {
        "images": jax.ShapeDtypeStruct(
            (args.batch, args.sequence_length, args.size, args.size, 3), jnp.float32
        )
    }
    shardings = batch_shardings(batch_struct, mesh)
    batch_struct = {
        k: jax.ShapeDtypeStruct(v.shape, v.dtype, sharding=shardings[k])
        for k, v in batch_struct.items()
    }

    # the REAL step function (donation included — the runtime donates the
    # TrainState, which memory accounting must alias); sharding rides the
    # input structs, so plain jit targets the compile-only topology
    step = make_train_step(model, mesh=None)

    t0 = time.perf_counter()
    # spatial runs need the trace context so disc/posterior re-constrain
    # to data-parallel exactly as train/step.py does at runtime
    with spatial_trace_mesh(mesh if args.spatial > 1 else None):
        lowered = step.lower(ts_struct, batch_struct)
    compiled = lowered.compile()
    dt = time.perf_counter() - t0

    ma = compiled.memory_analysis()
    arg = ma.argument_size_in_bytes
    out = ma.output_size_in_bytes
    tmp = ma.temp_size_in_bytes
    alias = ma.alias_size_in_bytes
    code = ma.generated_code_size_in_bytes
    total = arg + out + tmp + code - alias
    print(
        f"RESULT batch={args.batch} mesh=dp{args.data}xsp{args.spatial} "
        f"unroll={args.unroll} gate={args.gate} gate_dtype={args.gate_dtype} "
        f"per_device: args={arg / GIB:.2f}G out={out / GIB:.2f}G "
        f"temp={tmp / GIB:.2f}G aliased={alias / GIB:.2f}G code={code / GIB:.2f}G "
        f"total={total / GIB:.2f}G of {V5E_HBM_GIB}G "
        f"({'FITS' if total / GIB <= V5E_HBM_GIB else 'OOM'}) compile_s={dt:.0f}",
        flush=True,
    )


if __name__ == "__main__":
    main()
