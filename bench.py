"""Benchmark: GACT tile DP throughput (GCUPS) on the available device.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is measured against the project north-star target of
100 GCUPS/chip (BASELINE.json; the reference repo publishes no numbers,
BASELINE.md).  GCUPS = batch * ref_size * query_size / kernel_seconds,
counting every DP cell of the dispatch (including traceback + trace-matrix
materialization — the full production path, not a stripped DP loop).
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from darwin_tpu.config import Config
    from darwin_tpu.ops import gact

    cfg = Config()
    params = gact.make_params(cfg)
    T = cfg.tile_size            # 384, the production extend-tile geometry
    platform = jax.devices()[0].platform
    B = 512 if platform != "cpu" else 32

    rng = np.random.default_rng(0)
    rcodes = rng.integers(0, 4, size=(B, T)).astype(np.uint8)
    # queries = noisy copies of the refs: realistic DP work (matches + gaps)
    qcodes = rcodes.copy()
    sub = rng.random((B, T)) < 0.10
    qcodes[sub] = (qcodes[sub] + rng.integers(1, 4, sub.sum())) % 4
    qlens = np.full(B, T, np.int32)
    rlens = np.full(B, T, np.int32)
    start_end = np.ones(B, bool)

    args = (jnp.asarray(qcodes), jnp.asarray(rcodes), jnp.asarray(qlens),
            jnp.asarray(rlens), jnp.asarray(start_end), params)

    def step():
        out = gact.align_and_traceback(*args, max_tb_steps=2 * T)
        jax.block_until_ready(out["score"])
        return out

    step()  # compile
    iters = 10 if platform != "cpu" else 2
    t0 = time.perf_counter()
    for _ in range(iters):
        step()
    dt = (time.perf_counter() - t0) / iters

    cells = B * T * T
    gcups = cells / dt / 1e9
    print(json.dumps({
        "metric": "gact_gcups",
        "value": round(gcups, 3),
        "unit": "GCUPS",
        "vs_baseline": round(gcups / 100.0, 4),
    }))


if __name__ == "__main__":
    main()
