"""Real-TPU Mosaic smoke gate: compile + run the Pallas DP and traceback
kernels on representative shapes and compare bit-for-bit against the lax
reference implementation.  Catches Mosaic lowering regressions without a
full benchmark run.  Prints one JSON line; exit 0 = pass.

Shapes: filter tile (128, max-cell, no trace), extend tile (384,
start_end, trace + traceback), large escalation tile (strip kernel).
"""

# runnable standalone (no PYTHONPATH needed)
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
from darwin_tpu.utils.platform import force_platform_from_env
force_platform_from_env()
import json
import os
import sys

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from darwin_tpu.config import Config
    from darwin_tpu.ops import gact, gact_pallas as kp
    from darwin_tpu.pipeline.align import enable_compile_cache

    enable_compile_cache()
    platform = jax.devices()[0].platform
    cfg = Config()
    params = gact.make_params(cfg)
    rng = np.random.default_rng(0)
    failures = []

    def make(B, QT, RT):
        r = rng.integers(0, 4, size=(B, RT)).astype(np.uint8)
        q = np.full((B, QT), 4, np.uint8)
        n = min(QT, RT)
        q[:, :n] = r[:, :n]
        flip = rng.random((B, QT)) < 0.12
        q[flip] = (q[flip] + 1) % 4
        qlens = rng.integers(max(1, QT // 2), QT + 1, B).astype(np.int32)
        rlens = rng.integers(max(1, RT // 2), RT + 1, B).astype(np.int32)
        return (jnp.asarray(q), jnp.asarray(r), jnp.asarray(qlens),
                jnp.asarray(rlens))

    def check(name, ok):
        if not ok:
            failures.append(name)

    # 1. filter shape: max-cell, no trace
    q, r, ql, rl = make(32, 128, 128)
    se = jnp.zeros(32, bool)
    ref = gact.batch_align(q, r, ql, rl, se, params, with_trace=False)
    pal = kp.batch_align(q, r, ql, rl, se, params, with_trace=False)
    for k in ("score", "query_max_pos", "ref_max_pos"):
        check(f"filter:{k}",
              np.array_equal(np.asarray(ref[k]), np.asarray(pal[k])))

    # 2. extend shape: start_end + full traceback
    q, r, ql, rl = make(32, 384, 384)
    se = jnp.ones(32, bool)
    ref = gact.align_and_traceback(q, r, ql, rl, se, params, 768,
                                   all_start_end=True)
    pal = kp.align_and_traceback(q, r, ql, rl, se, params, 768,
                                 all_start_end=True)
    check("extend:score", np.array_equal(np.asarray(ref["score"]),
                                         np.asarray(pal["score"])))
    check("extend:n_ops", np.array_equal(np.asarray(ref["n_ops"]),
                                         np.asarray(pal["n_ops"])))
    ops_ok = all(
        np.array_equal(np.asarray(ref["ops"])[b, :int(ref["n_ops"][b])],
                       np.asarray(pal["ops"])[b, :int(ref["n_ops"][b])])
        for b in range(32))
    check("extend:ops", ops_ok)

    # 2b. the safe (while-based) traceback sweep — the per-lane spill
    # recovery path — must also lower and agree (the fast kernel only
    # spills on exact gap-lane ties, so a lowering regression here would
    # otherwise surface mid-bigref, not in any routine run)
    res2 = kp.batch_align(q, r, ql, rl, se, params, with_trace=True,
                          all_start_end=True)
    rec_s, qs_s, rs_s, _sp = kp._tb_call(
        res2["trace"], ql - 1, rl - 1, 768, False, safe=True)
    rec_s = np.asarray(rec_s)
    ops_s, n_ops_s = kp._expand_records(
        rec_s, 32, min(384 + rec_s.shape[0], 2 * 768))
    check("safe:n_ops", np.array_equal(np.asarray(ref["n_ops"]), n_ops_s))
    safe_ops_ok = all(
        np.array_equal(np.asarray(ref["ops"])[b, :int(ref["n_ops"][b])],
                       ops_s[b, :int(ref["n_ops"][b])])
        for b in range(32))
    check("safe:ops", safe_ops_ok)

    # 3. large escalation tile: strip kernel
    q, r, ql, rl = make(8, 1984, 960)
    se = jnp.ones(8, bool)
    ref = gact.align_and_traceback(q, r, ql, rl, se, params, 2 * 1984,
                                   all_start_end=True)
    pal = kp.align_and_traceback(q, r, ql, rl, se, params, 2 * 1984,
                                 all_start_end=True)
    check("large:score", np.array_equal(np.asarray(ref["score"]),
                                        np.asarray(pal["score"])))
    check("large:n_ops", np.array_equal(np.asarray(ref["n_ops"]),
                                        np.asarray(pal["n_ops"])))

    # 4. mesh path (1-device mesh on the real chip): full pipeline through
    # the shard_map'd Pallas kernels incl. per-device speculation must be
    # byte-identical to the direct dispatch path
    from darwin_tpu.genome import GenomeStore, make_read
    from darwin_tpu.parallel.shard import make_mesh
    from darwin_tpu.pipeline.align import Aligner
    from darwin_tpu.utils.simulate import simulate_reads
    cfg2 = Config()
    cfg2.seed_size = 10
    cfg2.dsoft_threshold = 20
    cfg2.min_overlap = 400
    store = GenomeStore()
    store.add_chromosome(
        "chrA", rng.choice(list(b"ACGT"), size=60000).astype(np.uint8))
    store.finalize()
    sim = simulate_reads(store, 8, 3000, seed=2)
    reads = [make_read(n, s) for n, s, _ in sim]
    single_al = Aligner(cfg2, store)
    single = single_al.align_batch(reads)
    meshed = Aligner(cfg2, store, mesh=make_mesh(1)).align_batch(reads)
    check("mesh:identical", single == meshed)
    check("mesh:nonempty", len(single) >= 4)

    # csr seed-table layout on the real chip (scatter-built offsets +
    # gather-resolved buckets) must reproduce the pairs path byte-for-byte
    # BEFORE bigref_w3 commits hours to a 3.2 Gbp csr build
    csr = Aligner(cfg2, store,
                  index_layout="csr").align_batch(reads)
    check("csr:identical", single == csr)

    # record-packing widths on the real chip: 16/8/4 must be byte-identical
    # (8 is the default every artifact runs; 4 is the A/B candidate — both
    # depend on the overflow-flag + wide-rerun path being exact on-device)
    prior = os.environ.get("DARWIN_TPU_RECBITS")
    try:
        os.environ["DARWIN_TPU_RECBITS"] = "16"
        rec16 = Aligner(cfg2, store).align_batch(reads)
        os.environ["DARWIN_TPU_RECBITS"] = "4"
        rec4 = Aligner(cfg2, store).align_batch(reads)
    finally:
        if prior is None:
            os.environ.pop("DARWIN_TPU_RECBITS", None)
        else:
            os.environ["DARWIN_TPU_RECBITS"] = prior
    check("recbits:identical", single == rec16 and single == rec4)

    # 5. speculation telemetry: on this straight-line workload the
    # device-predicted chain requests should almost always match the host
    # decode (K=12 chains are pointless otherwise)
    h = single_al.counters["num_spec_hits"]
    m = single_al.counters["num_spec_misses"]
    check("spec:ran", h + m > 0)
    # hit rate is a statistical property of the simulated workload, not a
    # bit-identity check — report it (and warn below 0.8) without failing
    # the bench gate over a benign K/stop_thr/workload shift
    rate = h / (h + m) if h + m else 0.0
    warnings = [] if rate > 0.8 else [f"spec hit rate {rate:.2f} <= 0.8"]

    print(json.dumps({"platform": platform, "ok": not failures,
                      "failures": failures, "spec_hit_rate": round(rate, 3),
                      "warnings": warnings}))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
