"""VPU op-throughput calibration for the roofline audit (ROOFLINE.md).

Measures the sustained rate of the exact op mix the DP kernel is made of —
int32 max chains, add chains, compare+select chains, and sublane shifts —
with a tiny Pallas kernel that keeps everything in registers (no memory
traffic beyond one block in/out).  The resulting ops/s ceiling is what the
per-cell op counts in ROOFLINE.md divide against.

Methodology matches bench.py: rounds stacked inside one program, inputs
rotated, and the window's programs chained asynchronously with ONE
terminal sync — the round-trip appears once per window, not once per
sample.  (The round-4 per-sample RTT-subtraction under-measured by ~2x in
slow tunnel phases — short samples were RTT-dominated, which made the
calibration contradict the kernel's own sustained rate; VERDICT r4
weak #2.)
"""

# runnable standalone (no PYTHONPATH needed)
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
from darwin_tpu.utils.platform import force_platform_from_env
force_platform_from_env()
import json
import time

import numpy as np


_CALL_SEED = [0]   # advances per probe() call: the tunnel caches
                   # identical executions, so repeated probe() calls
                   # (one per bench window) must never replay a stack


def probe(modes=("max", "add", "sel", "shift", "max4"), samples: int = 5):
    """Measure sustained int32 VPU op throughput (Tops) for the given op
    mixes; returns {"platform": ..., mode: {"tops": ..., "ms": ...}}.

    Exposed as a library so BENCH artifacts can embed a concurrent
    calibration sample (the shared chip's phase is visible in-artifact:
    GCUPS alongside the attainable Tops measured seconds apart).

    Cache hygiene: the warm-up program uses a dedicated throwaway input
    (never re-timed), and stack contents advance across probe() calls —
    otherwise the tunnel's execution cache serves repeated programs in
    ~0 time and inflates the measured Tops (round-5 review finding)."""
    import functools

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from darwin_tpu.pipeline.align import enable_compile_cache

    enable_compile_cache()
    platform = jax.devices()[0].platform
    interp = platform == "cpu"

    QT, LANES = 384, 128
    REPS = 64          # chain length per grid step per variant


    def probe_kernel(x_ref, o_ref, *, mode):
        x = x_ref[:]
        y = x + 1
        if mode == "max":
            for _ in range(REPS):
                x = jnp.maximum(x, y)
                y = y + x            # serial dependency, no CSE
        elif mode == "add":
            for _ in range(REPS):
                x = x + y
                y = y ^ x
        elif mode == "sel":
            for _ in range(REPS):
                m = x > y
                x = jnp.where(m, y, x) + 1
                y = y + 1
        elif mode == "shift":
            pad = jnp.zeros((1, LANES), jnp.int32)
            for _ in range(REPS):
                x = jnp.maximum(jnp.concatenate([pad, x[:-1]], 0), y)
                y = y + x
        elif mode == "max4":
            # 4 independent chains — the ILP the DP kernel's live set has
            a, b, c, d = x, y, x + 3, y ^ 5
            for _ in range(REPS // 2):
                a = jnp.maximum(a, b)
                b = b + 1
                c = jnp.maximum(c, d)
                d = d + 3
            x, y = a + c, b + d
        o_ref[:] = x + y

    def build(mode, grid):
        kern = functools.partial(probe_kernel, mode=mode)
        call = pl.pallas_call(
            kern,
            grid=(grid,),
            in_specs=[pl.BlockSpec((QT, LANES), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((QT, LANES), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((QT, LANES), jnp.int32),
            interpret=interp,
        )

        @jax.jit
        def rounds(xs):
            def body(acc, x):
                return acc + jnp.sum(call(x)), None
            acc, _ = jax.lax.scan(body, jnp.int32(0), xs)
            return acc
        return rounds

    NBUF = 8 if platform != "cpu" else 1
    GRID = 8192 if platform != "cpu" else 4
    _CALL_SEED[0] += 1
    rng = np.random.default_rng(_CALL_SEED[0])
    # ops per element per program: 2 vector ops per rep (x and y updates)
    elems = QT * LANES * GRID * NBUF
    ops_per = 2 * REPS

    out = {"platform": platform}
    # ops/rep by mode: max/add/max4 2, sel 4, shift 3 — tops below are
    # normalized to ops_per=2*REPS; scale sel by 2 and shift by 1.5
    for mode in modes:
        f = build(mode, GRID)
        stacks = [jnp.asarray(rng.integers(0, 1 << 20,
                                           size=(NBUF, QT, LANES)),
                              jnp.int32) for _ in range(samples + 1)]
        jax.block_until_ready(stacks)
        int(f(stacks[0]))          # compile+warm (throwaway, never timed)
        stacks = stacks[1:]
        # one long window: enqueue every sample's program, sync once on
        # the last scalar (in-order device stream => all completed); the
        # tunnel round-trip is amortized over the whole chain instead of
        # being subtracted per short sample
        t0 = time.perf_counter()
        accs = [f(s) for s in stacks]
        int(accs[-1])
        dt = max(time.perf_counter() - t0, 1e-9)
        out[mode] = {"tops": round(elems * ops_per * len(stacks)
                                   / dt / 1e12, 3),
                     "ms": round(dt / len(stacks) * 1e3, 3),
                     "window_ms": round(dt * 1e3, 1)}
    return out


def main():
    print(json.dumps(probe()))


if __name__ == "__main__":
    main()
