"""Component-level GCUPS breakdown of the GACT dispatch on the real chip:
DP(no-trace), DP(trace), traceback sweep, and the full dispatch.  Same
methodology as bench.py (stacked rounds in one program, rotated inputs,
RTT-subtracted, best-of-N)."""

# runnable standalone (no PYTHONPATH needed)
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
from darwin_tpu.utils.platform import force_platform_from_env
force_platform_from_env()
import json
import time

import numpy as np


def sample(fn, stacks, rstack, nbuf, rtt):
    dt = float("inf")
    for q2 in stacks:
        t0 = time.perf_counter()
        int(fn(q2, rstack))
        dt = min(dt, max(time.perf_counter() - t0 - rtt, 1e-9) / nbuf)
    return dt


def main():
    import jax
    import jax.numpy as jnp
    from darwin_tpu.config import Config
    from darwin_tpu.ops import gact, dispatch
    from darwin_tpu.pipeline.align import enable_compile_cache

    enable_compile_cache()
    from darwin_tpu.ops import gact_pallas as kp

    cfg = Config()
    params = gact.make_params(cfg)
    T = cfg.tile_size
    platform = jax.devices()[0].platform
    B = 512 if platform != "cpu" else 32
    NBUF = 16 if platform != "cpu" else 2
    interp = platform == "cpu"

    rng = np.random.default_rng(0)
    bufs = []
    for _ in range(NBUF):
        rcodes = rng.integers(0, 4, size=(B, T)).astype(np.uint8)
        qcodes = rcodes.copy()
        sub = rng.random((B, T)) < 0.10
        qcodes[sub] = (qcodes[sub] + rng.integers(1, 4, sub.sum())) % 4
        bufs.append((jax.device_put(qcodes), jax.device_put(rcodes)))
    jax.block_until_ready(bufs)
    qlens = jnp.full(B, T, jnp.int32)
    rlens = jnp.full(B, T, jnp.int32)
    start_end = jnp.ones(B, bool)
    qstack = jnp.stack([b[0] for b in bufs])
    rstack = jnp.stack([b[1] for b in bufs])

    def mk(fn):
        @jax.jit
        def rounds(qs, rs):
            def body(acc, qr):
                q, r = qr
                return acc + fn(q, r), None
            acc, _ = jax.lax.scan(body, jnp.int32(0), (qs, rs))
            return acc
        return rounds

    def dp_notrace(q, r):
        out = kp.batch_align(q, r, qlens, rlens, start_end, params,
                             with_trace=False, all_start_end=True,
                             interpret=interp)
        return jnp.sum(out["score"])

    def dp_trace(q, r):
        out = kp.batch_align(q, r, qlens, rlens, start_end, params,
                             with_trace=True, all_start_end=True,
                             interpret=interp)
        return jnp.sum(out["score"]) + jnp.sum(out["trace"][0, 0].astype(
            jnp.int32))

    def full(q, r):
        out = kp.align_and_traceback_device(
            q, r, qlens, rlens, start_end, params, 2 * T,
            all_start_end=True, interpret=interp)
        return (jnp.sum(out["rec"]) + jnp.sum(out["q_steps_all"])
                + jnp.sum(out["score"]))

    fns = {"dp_notrace": mk(dp_notrace), "dp_trace": mk(dp_trace),
           "full": mk(full)}
    for name, f in fns.items():
        int(f(qstack, rstack))  # compile

    rng2 = np.random.default_rng(1)
    stacks = []
    for s in range(5):
        q2 = np.asarray(qstack).copy()
        flip = rng2.random(q2.shape) < 0.05
        q2[flip] = (q2[flip] + 1 + s) % 4
        stacks.append(jax.device_put(q2))
    jax.block_until_ready(stacks)

    @jax.jit
    def tiny(x):
        return x + 1
    int(tiny(jnp.int32(0)))
    t0 = time.perf_counter()
    int(tiny(jnp.int32(1)))
    rtt = time.perf_counter() - t0

    cells = B * T * T
    out = {}
    for name, f in fns.items():
        dt = sample(f, stacks, rstack, NBUF, rtt)
        out[name] = {"ms": round(dt * 1e3, 3),
                     "gcups": round(cells / dt / 1e9, 2)}
    out["tb_ms"] = round(out["full"]["ms"] - out["dp_trace"]["ms"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
