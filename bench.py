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
    scanned inside ONE program (RTT cannot pollute), and the window's
    programs CHAINED asynchronously with a single terminal sync — host
    round-trip latency appears once per window instead of once per
    program (round-4 review: per-program RTT subtraction under-measured
    in slow tunnel phases).  Any methodology change lands here once, for
    every GCUPS benchmark (bench.py, tools/bench_generic.py).

    Returns sample(n, seed, with_trace=True) -> {"gcups", "window_s",
    "programs"}: n chained programs measured as one long window.
    with_trace=False runs the DP-only (no traceback) variant of the SAME
    kernel — the full/no-trace ratio is the chip-phase-immune self-check
    ROOFLINE.md audits (both numbers move with the shared chip's phase;
    only a kernel regression moves their ratio)."""
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

    @jax.jit
    def rounds_notrace(qs, rs):
        def body(acc, qr):
            q, r = qr
            out = kernel_mod.batch_align(
                q, r, qlens, rlens, start_end, params,
                with_trace=False, all_start_end=True)
            return acc + jnp.sum(out["score"]), None
        acc, _ = jax.lax.scan(body, jnp.int32(0), (qs, rs))
        return acc

    int(rounds(qstack, rstack))  # compile + warm
    has_notrace = hasattr(kernel_mod, "batch_align")
    if has_notrace:
        int(rounds_notrace(qstack, rstack))

    qstack_np = np.asarray(qstack)
    cells = B * T * T

    def sample(n: int, seed: int = 1, with_trace: bool = True):
        # fresh stacks with different values per call (the tunnel caches
        # identical executions)
        fn = rounds if with_trace or not has_notrace else rounds_notrace
        rng2 = np.random.default_rng(seed)
        stacks = []
        for s in range(n):
            q2 = qstack_np.copy()
            flip = rng2.random(q2.shape) < 0.05
            q2[flip] = (q2[flip] + 1 + s) % 4
            stacks.append(jax.device_put(q2))
        jax.block_until_ready(stacks)

        # one long window: enqueue every program, sync once on the last
        # scalar (programs execute in enqueue order on the single device
        # stream, so the last result completing implies all completed)
        t0 = time.perf_counter()
        accs = [fn(q2, rstack) for q2 in stacks]
        int(accs[-1])
        dt = max(time.perf_counter() - t0, 1e-9)
        return {"gcups": cells * NBUF * n / dt / 1e9,
                "window_s": round(dt, 3), "programs": n}

    return sample


def measure_dispatch(params, kernel_mod, T: int, samples: int = 48,
                     chains: int = 3) -> dict:
    """One-shot wrapper over make_dispatch_bench: ``chains`` long windows
    of samples/chains programs each; the shared tunnel's phase swings are
    +-20%, so the median window is the honest "typical" number, min/max
    alongside.  16 programs/window ~ 0.8 s of chained compute — the
    plateau of ROOFLINE.md section 5's window-size sweep (shorter windows
    under-measure ~15% via the fixed enqueue ramp)."""
    sample = make_dispatch_bench(params, kernel_mod, T)
    per = max(samples // chains, 1)
    vals = sorted(sample(per, seed=i + 1)["gcups"] for i in range(chains))
    return {
        "value": round(float(np.median(vals)), 3),
        "unit": "GCUPS",
        # stats are over the per-window aggregates, not per program
        "n_windows": chains,
        "programs_per_window": per,
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

    # self-calibrating capture: >=3 spaced windows, each pairing the full
    # dispatch (DP + trace + sweep) with the SAME kernel's no-trace DP and
    # a VPU attainable-Tops probe (tools/vpu_probe.py).  The
    # full/no-trace RATIO is the chip-phase-immune regression check: both
    # numerator and denominator run the same kernel family seconds apart,
    # so a slow shared-chip phase cancels; ROOFLINE.md's op audit pins the
    # expected ratio band (full ~83 ops/cell incl. sweep vs no-trace ~47
    # -> ~0.50-0.60 measured).  A window with in-band ratio but low
    # absolute GCUPS is a degraded chip phase, not a kernel regression.
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from tools.vpu_probe import probe

    n_win = 3 if platform != "cpu" else 1
    # ~0.8 s of chained compute per window: the per-window fixed overhead
    # (~20 ms enqueue ramp, measured by the window-size sweep in
    # ROOFLINE.md section 5) amortizes below 3%
    per_win = 16 if platform != "cpu" else 2
    RATIO_BAND = (0.40, 0.80)
    NOTRACE_OPS_PER_CELL = 47          # ROOFLINE.md section 2 audit
    windows, all_vals = [], []
    for w in range(n_win):
        if w:
            time.sleep(20)
        tops = probe(modes=("max4",), samples=3)["max4"]["tops"]
        full = sample(per_win, seed=w + 1)
        nt = sample(max(per_win // 2, 1), seed=100 + w, with_trace=False)
        all_vals.append(full["gcups"])
        ratio = full["gcups"] / nt["gcups"] if nt["gcups"] else None
        # op-bound consistency: no-trace GCUPS x audited ops/cell vs the
        # independently probed Tops.  >= ~0.9 rules out a DP regression;
        # > 1 is the degraded-phase signature (the probe's serial-ALU mix
        # degrades harder than the DP mix — ROOFLINE.md section 5)
        implied = nt["gcups"] * NOTRACE_OPS_PER_CELL / 1e3
        windows.append({
            "gcups": round(full["gcups"], 3),
            "window_s": full["window_s"],
            "notrace_gcups": round(nt["gcups"], 3),
            "full_over_notrace": round(ratio, 3) if ratio else None,
            "ratio_in_band": (RATIO_BAND[0] <= ratio <= RATIO_BAND[1]
                              if ratio else None),
            "calib_tops": tops,
            "notrace_implied_tops": round(implied, 3),
            "kernel_vs_probe": (round(implied / tops, 3) if tops
                                else None),
            "gcups_per_top": (round(full["gcups"] / tops, 3)
                              if tops else None),
        })
    all_vals.sort()
    gcups = float(np.median(all_vals))
    print(json.dumps({
        "metric": "gact_gcups",
        "value": round(gcups, 3),
        "unit": "GCUPS",
        "vs_baseline": round(gcups / 100.0, 4),
        "smoke": smoke,
        # median/min/max are over the n_windows per-window aggregate
        # GCUPS values (each window = programs_per_window chained
        # programs timed as one sync), NOT over individual programs
        "n_windows": n_win,
        "programs_per_window": per_win,
        "min": round(all_vals[0], 3),
        "max": round(all_vals[-1], 3),
        "windows": windows,
        "calib": "per window: chained ~0.8s windows (one sync each, "
                 "RTT-immune).  Primary check: full/no-trace ratio of "
                 f"the same kernel, band {RATIO_BAND} (audit predicts "
                 "~0.57) — phase cancels, a trace/sweep regression drops "
                 "it.  kernel_vs_probe = no-trace GCUPS x 47 ops/cell / "
                 "probed Tops: >= ~0.9 rules out a DP regression; > 1 is "
                 "the degraded-phase signature (ROOFLINE.md section 5)",
    }))


if __name__ == "__main__":
    main()
