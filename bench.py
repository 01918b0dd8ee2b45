"""Benchmark: GACT tile DP + traceback throughput (GCUPS).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline measures against the project north-star of 100 GCUPS/chip
(BASELINE.json; the reference repo publishes no numbers, BASELINE.md).
GCUPS = batch * ref_size * query_size / seconds for the FULL production
dispatch (tile DP + trace materialization + batched traceback).

Methodology notes: inputs rotate across iterations (the axon tunnel caches
identical executions) and iterations are queued asynchronously with a single
terminal sync (tunnel round-trips would otherwise dominate).
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

from darwin_tpu.utils.platform import force_platform_from_env
force_platform_from_env()


def wait_for_device() -> bool:
    """The axon tunnel can flap; a bare ``jax.devices()`` then hangs this
    process indefinitely.  Probe in a subprocess (killable) and retry for
    up to DARWIN_TPU_TUNNEL_WAIT seconds (default 1800) so a transient
    outage at bench time doesn't lose the round's artifact.  Returns False
    if the backend never came up."""
    deadline = time.time() + float(
        os.environ.get("DARWIN_TPU_TUNNEL_WAIT", "1800"))
    probe = "import jax; d = jax.devices(); print(d[0].platform)"
    while True:
        try:
            proc = subprocess.run([sys.executable, "-c", probe],
                                  capture_output=True, text=True,
                                  timeout=120)
            if proc.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        if time.time() >= deadline:
            return False
        sys.stderr.write("bench: device backend unreachable; retrying\n")
        time.sleep(60)


def run_smoke(platform: str) -> str:
    """Real-hardware Mosaic gate: run tools/tpu_smoke.py (Pallas vs lax
    bit-identity on representative shapes) before benchmarking, so a
    lowering regression fails loudly here instead of surfacing as a wrong
    GCUPS number.  Returns "pass"/"skipped"; exits non-zero on failure."""
    if platform == "cpu" or os.environ.get("DARWIN_TPU_SKIP_SMOKE"):
        return "skipped"
    root = os.path.dirname(os.path.abspath(__file__))
    env = dict(os.environ)
    env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, os.path.join(root, "tools", "tpu_smoke.py")],
        capture_output=True, text=True, timeout=3600, env=env)
    lines = [l for l in proc.stdout.strip().splitlines() if l.strip()]
    try:
        info = json.loads(lines[-1]) if lines else {}
    except json.JSONDecodeError:
        info = {"ok": False, "raw": lines[-1][:200]}
    if proc.returncode != 0 or not info.get("ok"):
        print(json.dumps({
            "metric": "gact_gcups", "value": 0.0, "unit": "GCUPS",
            "vs_baseline": 0.0, "smoke": "fail",
            "smoke_detail": info.get("failures", info),
        }))
        sys.stderr.write(proc.stderr[-2000:])
        sys.exit(1)
    return "pass"


def make_dispatch_bench(params, kernel_mod, T: int):
    """Shared tunnel-safe measurement harness: NBUF rotated input buffers
    per device program (the tunnel caches identical executions), rounds
    scanned inside ONE program (RTT cannot pollute), RTT floor subtracted,
    median of the samples reported with min/max.  Any methodology change
    lands here once, for every GCUPS benchmark (bench.py,
    tools/bench_generic.py).

    Returns sample(n, seed) -> list of per-program GCUPS samples, so the
    compiled program can be re-sampled across spaced windows without
    recompiling (the self-calibration loop in main)."""
    import jax
    import jax.numpy as jnp

    platform = jax.devices()[0].platform
    B = 512 if platform != "cpu" else 32
    NBUF = 16 if platform != "cpu" else 2

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

    # All rounds run inside ONE device program (lax.scan over stacked
    # inputs) so host/tunnel round-trip latency cannot pollute the timing;
    # per-round inputs differ so nothing can be memoized.
    qstack = jnp.stack([b[0] for b in bufs])
    rstack = jnp.stack([b[1] for b in bufs])

    @jax.jit
    def rounds(qs, rs):
        def body(acc, qr):
            q, r = qr
            if hasattr(kernel_mod, "align_and_traceback_device"):
                out = kernel_mod.align_and_traceback_device(
                    q, r, qlens, rlens, start_end, params, 2 * T,
                    all_start_end=True)
                acc2 = jnp.sum(out["rec"]) + jnp.sum(out["q_steps_all"])
            else:
                out = kernel_mod.align_and_traceback(
                    q, r, qlens, rlens, start_end, params, 2 * T,
                    all_start_end=True)
                acc2 = jnp.sum(out["n_ops"])
            return acc + acc2 + jnp.sum(out["score"]), None
        acc, _ = jax.lax.scan(body, jnp.int32(0), (qs, rs))
        return acc

    int(rounds(qstack, rstack))  # compile + warm

    qstack_np = np.asarray(qstack)
    cells = B * T * T

    def sample(n: int, seed: int = 1):
        # fresh stacks with different values per call (the tunnel caches
        # identical executions)
        rng2 = np.random.default_rng(seed)
        stacks = []
        for s in range(n):
            q2 = qstack_np.copy()
            flip = rng2.random(q2.shape) < 0.05
            q2[flip] = (q2[flip] + 1 + s) % 4
            stacks.append(jax.device_put(q2))
        jax.block_until_ready(stacks)

        # estimate the host<->device round-trip floor and subtract it
        @jax.jit
        def tiny(x):
            return x + 1
        int(tiny(jnp.int32(seed)))
        t0 = time.perf_counter()
        int(tiny(jnp.int32(seed + 1)))
        rtt = time.perf_counter() - t0

        times = []
        for q2 in stacks:
            t0 = time.perf_counter()
            int(rounds(q2, rstack))
            times.append(max(time.perf_counter() - t0 - rtt, 1e-9) / NBUF)
        return [cells / t / 1e9 for t in times]

    return sample


def measure_dispatch(params, kernel_mod, T: int, samples: int = 10) -> dict:
    """One-shot wrapper over make_dispatch_bench: the shared tunnel's
    phase swings are +-20%, so the median is the honest "typical" number;
    min/max are reported alongside."""
    vals = sorted(make_dispatch_bench(params, kernel_mod, T)(samples))
    return {
        "value": round(float(np.median(vals)), 3),
        "unit": "GCUPS",
        "n_samples": len(vals),
        "min": round(vals[0], 3),
        "max": round(vals[-1], 3),
    }


def main():
    if not wait_for_device():
        print(json.dumps({
            "metric": "gact_gcups", "value": 0.0, "unit": "GCUPS",
            "vs_baseline": 0.0, "smoke": "tunnel_down",
        }))
        sys.exit(1)
    import jax
    from darwin_tpu.config import Config
    from darwin_tpu.ops import gact, dispatch

    if dispatch.use_pallas():
        from darwin_tpu.ops import gact_pallas as kernel_mod
    else:
        kernel_mod = gact

    cfg = Config()
    params = gact.make_params(cfg)
    platform = jax.devices()[0].platform
    smoke = run_smoke(platform)
    sample = make_dispatch_bench(params, kernel_mod, cfg.tile_size)

    # self-calibrating capture: >=3 spaced windows, each pairing a GCUPS
    # sample with a concurrent VPU attainable-Tops probe (the exact op mix
    # the DP kernel issues, tools/vpu_probe.py / ROOFLINE.md), so a slow
    # shared-chip phase is visible IN the artifact as a low calib_tops with
    # an unchanged gcups_per_top ratio — and a kernel regression as a
    # dropped ratio.
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from tools.vpu_probe import probe

    n_win = 3 if platform != "cpu" else 1
    per_win = 4 if platform != "cpu" else 2
    windows, all_vals = [], []
    for w in range(n_win):
        if w:
            time.sleep(20)
        tops = probe(modes=("max4",), samples=3)["max4"]["tops"]
        vals = sample(per_win, seed=w + 1)
        all_vals += vals
        med = float(np.median(vals))
        windows.append({
            "gcups": round(med, 3),
            "calib_tops": tops,
            "gcups_per_top": round(med / tops, 3) if tops else None,
        })
    all_vals.sort()
    gcups = float(np.median(all_vals))
    print(json.dumps({
        "metric": "gact_gcups",
        "value": round(gcups, 3),
        "unit": "GCUPS",
        "vs_baseline": round(gcups / 100.0, 4),
        "smoke": smoke,
        "n_samples": len(all_vals),
        "min": round(all_vals[0], 3),
        "max": round(all_vals[-1], 3),
        "windows": windows,
        "calib": "max4 int32 Tops (tools/vpu_probe.py) sampled "
                 "immediately before each window; ROOFLINE.md's attainable "
                 "full-dispatch ceiling is ~11-13 GCUPS/Top",
    }))


if __name__ == "__main__":
    main()
