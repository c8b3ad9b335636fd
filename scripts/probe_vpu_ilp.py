"""VPU ILP probe — VERDICT r4 weak #3 / next-round #3.

The round-4 roofline (docs/PERF.md) measured 14.7 TF/s for a dependency-
chained f32 FMA stream vs 36.6 TF/s for 8 interleaved independent chains.
The df32 kernel runs at 1.79 TF/s = 12% of the chained ceiling.  Question:
does interleaving S independent lane-chunks inside the kernel body recover
the ILP ceiling for (a) plain FMA chains and (b) the two-float compensated
FMA (tf_mul + tf_add) that the df32 kernel is made of?

Each probe kernel holds a (32, blk) f32 plane (the grouped df32 kernel's
state geometry at g=8), splits it into S lane-chunks, and advances each
chunk through n_iter chained (tf-)FMAs — S independent dependency chains
in one instruction stream.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_vpu_ilp.py
"""
from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/psa_tpu_jax_cache")

import numpy as np

ROWS = 32           # (4*g) rows of the grouped df32 kernel
N_ITER = 500_000
FLOPS_FMA = 2       # per element per iter
FLOPS_TF = 32       # tf_mul (21) + tf_add (11) f32 ops per element per iter


def make_probe(blk: int, S: int, kind: str):
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from psa_simulation_ode_rk_mvp_dispersion_tpu.ops.twofloat import (
        TF, tf_add, tf_mul,
    )

    w = blk // S

    def kernel(a_ref, x_ref, o_ref):
        a = a_ref[:, :]
        if kind == "fma":
            chunks = [x_ref[:, i * w:(i + 1) * w] for i in range(S)]
            ca = [a[:, i * w:(i + 1) * w] for i in range(S)]

            def body(_i, cs):
                return tuple(c * ai + jnp.float32(1e-7)
                             for c, ai in zip(cs, ca))

            chunks = lax.fori_loop(0, N_ITER, body, tuple(chunks))
            o_ref[:, :] = jnp.concatenate(list(chunks), axis=1)
        else:  # tf: two-float FMA chain y = y*a + b
            chunks = [
                TF(x_ref[:, i * w:(i + 1) * w],
                   jnp.zeros((ROWS, w), jnp.float32))
                for i in range(S)
            ]
            ca = [TF(a[:, i * w:(i + 1) * w],
                     jnp.zeros((ROWS, w), jnp.float32)) for i in range(S)]
            b = TF(jnp.full((ROWS, w), 1e-7, jnp.float32),
                   jnp.zeros((ROWS, w), jnp.float32))

            def body(_i, cs):
                out = []
                for c, ai in zip(cs, ca):
                    r = tf_add(tf_mul(TF(*c), ai), b)
                    out.append((r.hi, r.lo))
                return tuple(out)

            chunks = lax.fori_loop(
                0, N_ITER, body, tuple((c.hi, c.lo) for c in chunks)
            )
            o_ref[:, :] = jnp.concatenate(
                [c[0] + c[1] for c in chunks], axis=1
            )

    def call(a, x):
        return pl.pallas_call(
            kernel,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((ROWS, blk), jnp.float32),
        )(a, x)

    return jax.jit(call)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from psa_simulation_ode_rk_mvp_dispersion_tpu.utils.precision import (
        enable_compile_cache,
    )

    enable_compile_cache()
    print(f"# backend={jax.default_backend()}", file=sys.stderr)

    # tf-only: the fma ceilings are the round-4 probes (14.7 / 36.6 TF/s
    # chained / 8-chain, docs/PERF.md); the open question is whether the
    # COMPENSATED chain gains from interleaving independent chains.
    combos = [
        ("tf", 512, 1), ("tf", 512, 2), ("tf", 512, 4), ("tf", 512, 8),
    ]
    with jax.enable_x64(False):
        for kind, blk, S in combos:
            rec = {"kind": kind, "blk": blk, "S": S}
            try:
                f = make_probe(blk, S, kind)
                a = jnp.full((ROWS, blk), 0.9999, jnp.float32)
                x = jnp.full((ROWS, blk), 1.0, jnp.float32)
                t0 = time.perf_counter()
                np.asarray(f(a, x))
                rec["compile_s"] = round(time.perf_counter() - t0, 1)
                ts = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    np.asarray(f(a, x))   # fetch: the only real barrier
                    ts.append(time.perf_counter() - t0)
                el = float(np.median(ts))
                flops_per = FLOPS_FMA if kind == "fma" else FLOPS_TF
                total = ROWS * blk * N_ITER * flops_per
                rec["t_ms"] = round(el * 1e3, 2)
                rec["tflops"] = round(total / el / 1e12, 2)
                # the tunnel RTT (~25-35 ms) dominates these tiny kernels;
                # report an RTT-corrected number too using the fastest rep
                # as a lower bound on overhead is NOT safe -- instead scale
                # N_ITER so compute >> RTT: redo with 20x iters if fast
                rec["ts"] = [round(t * 1e3, 1) for t in ts]
            except Exception as e:  # noqa: BLE001
                rec["error"] = str(e)[:300]
            print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
