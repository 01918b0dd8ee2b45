"""Micro-probe for the csr index build's hot device ops.

The two streaming passes (index/minimizers.py: _csr_count_accum /
_csr_fill_accum) lean on XLA ops whose TPU throughput is not obvious from
first principles:

  * scatter-add of ~2.1 M random indices into a 2^28-entry counts array,
  * scatter-set of ~2.1 M positions into a multi-hundred-M-entry buffer,
  * one 2^28 cumsum (offsets).

This prints one JSON line with measured Mupdates/s (and the cumsum
seconds) so a pathological lowering (e.g. serialized scatter) is visible
BEFORE the 3.2 Gbp bigref_w3 build spends its timeout discovering it.
A tunnel-cache-safe harness: every repetition uses distinct indices and
all reps run inside one jitted scan.
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


def main():
    import jax
    import jax.numpy as jnp

    NB = 1 << 28          # bucket count at k=14
    M = 1 << 21           # ~one row batch's emission slots
    REPS = 8
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, NB, size=(REPS, M), dtype=np.int64)
                      .astype(np.int32))

    @jax.jit
    def count_pass(counts, idx):
        def body(c, i):
            return c.at[i].add(1, mode="drop"), jnp.int32(0)
        c, _ = jax.lax.scan(body, counts, idx)
        return c

    counts = jnp.zeros((NB + 1,), jnp.int32)
    counts = count_pass(counts, idx)            # compile + warm
    jax.block_until_ready(counts)
    t0 = time.perf_counter()
    counts = count_pass(counts, idx)
    jax.block_until_ready(counts)
    dt_add = (time.perf_counter() - t0) / REPS

    NP = 1 << 27          # fill-buffer stand-in (0.5 GB; shape-representative)
    slots = jnp.asarray(rng.integers(0, NP, size=(REPS, M), dtype=np.int64)
                        .astype(np.int32))
    vals = jnp.asarray(rng.integers(0, 1 << 32, size=(REPS, M),
                                    dtype=np.uint32))

    @jax.jit
    def fill_pass(buf, slots, vals):
        def body(b, sv):
            s, v = sv
            return b.at[s].set(v, mode="drop"), jnp.int32(0)
        b, _ = jax.lax.scan(body, buf, (slots, vals))
        return b

    buf = jnp.zeros((NP,), jnp.uint32)
    buf = fill_pass(buf, slots, vals)
    jax.block_until_ready(buf)
    t0 = time.perf_counter()
    buf = fill_pass(buf, slots, vals)
    jax.block_until_ready(buf)
    dt_set = (time.perf_counter() - t0) / REPS

    @jax.jit
    def cumsum(c):
        return jnp.cumsum(c)

    o = cumsum(counts[:NB])
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    o = cumsum(counts[:NB] + 1)                 # different input (cache)
    jax.block_until_ready(o)
    dt_cum = time.perf_counter() - t0

    print(json.dumps({
        "metric": "csr_build_probe",
        "platform": jax.devices()[0].platform,
        "scatter_add_mups": round(M / dt_add / 1e6, 1),
        "scatter_set_mups": round(M / dt_set / 1e6, 1),
        "cumsum_2e28_s": round(dt_cum, 3),
        "est_count_pass_s_3gbp": round(1600 * dt_add, 1),
        "est_fill_pass_s_3gbp": round(1600 * dt_set, 1),
    }))


if __name__ == "__main__":
    main()
