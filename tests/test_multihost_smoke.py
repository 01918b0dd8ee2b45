"""2-process jax.distributed smoke test of run_multihost: exercises the
coordinator handshake, streamed read-shard slicing, per-rank output shards,
the collective output sync, rank-0 shard merge, and the allgathered global
counters — everything the single-process tests can't reach.

The merged output must equal the single-process pipeline's byte-for-byte.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference/software/data/sample_ref.fa"


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_run_multihost(tmp_path):
    from darwin_tpu.io.fasta import load_genome
    from darwin_tpu.utils.simulate import simulate_reads
    from darwin_tpu.config import Config
    from darwin_tpu.pipeline import align as align_mod

    store = load_genome(REF)
    sim = simulate_reads(store, 6, 2000, seed=3)
    reads_path = tmp_path / "reads.fa"
    with open(reads_path, "w") as f:
        for n, s, _ in sim:
            seq = bytes(np.asarray(s, np.uint8)).decode()
            f.write(f">{n}\n{seq}\n")

    # single-process expected output
    expect = tmp_path / "single.sam"
    with open(expect, "w") as out, open(tmp_path / "single.err", "w") as err:
        align_mod.run(REF, str(reads_path), False, out=out, err=err)

    out_path = tmp_path / "multi.sam"
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ, PYTHONPATH=REPO + os.pathsep
               + os.environ.get("PYTHONPATH", ""))
    procs = []
    logs = []
    for pid in range(2):
        log = open(tmp_path / f"rank{pid}.err", "w")
        logs.append(log)
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "mh_child.py"),
             str(pid), "2", coord, REF, str(reads_path), str(out_path),
             "0"],
            env=env, stdout=log, stderr=subprocess.STDOUT))
    try:
        rcs = [p.wait(timeout=420) for p in procs]
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
        for log in logs:
            log.close()
    rank_logs = [(tmp_path / f"rank{p}.err").read_text() for p in range(2)]
    if any(rc != 0 for rc in rcs):
        if any("does not support" in t or "Unimplemented" in t
               for t in rank_logs):
            pytest.skip("multi-process CPU backend unavailable here")
        raise AssertionError(f"ranks failed rc={rcs}\n{rank_logs[0][-2000:]}"
                             f"\n{rank_logs[1][-2000:]}")

    assert out_path.read_bytes() == expect.read_bytes()
    # the shards must really have been split across ranks
    assert "reads [0, 3)" in rank_logs[0]
    assert "reads [3, 6)" in rank_logs[1]
    # allgathered global counters printed by rank 0
    assert "global counters:" in rank_logs[0]
    assert "num_reads=6" in rank_logs[0]
