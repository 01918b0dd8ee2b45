"""CPU coverage of the TPU-only fused dispatch path (interpret mode).

On hardware the extension loop runs through the fused Pallas dispatch
programs (ops/dispatch.py::_extend_round_pallas / _extend_round_spec_pallas:
gather + DP + sweep + packed int16 results + K-tile speculative chains).
CPU test runs normally bypass all of that — use_pallas() is False off-TPU —
so until now those programs were only exercised by the on-chip smoke gate.
DARWIN_TPU_PALLAS_INTERPRET=1 runs the same dispatch programs with their
Pallas kernels in interpret mode, giving the speculative chain, the result
packing, and the rerun paths byte-level coverage without a chip.

The oracle is the lax backend, itself locked to the reference binary
byte-for-byte (tests/test_ref_e2e.py)."""

import numpy as np
import pytest

from darwin_tpu.config import Config
from darwin_tpu.genome import make_read
from darwin_tpu.io.fasta import load_genome
from darwin_tpu.ops import dispatch
from darwin_tpu.pipeline.align import Aligner, new_counters

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


@pytest.fixture(autouse=True)
def _interpret_env(monkeypatch):
    monkeypatch.setenv("DARWIN_TPU_PALLAS_INTERPRET", "1")
    # bound the interpret-mode work per dispatch; resolver correctness is
    # K-invariant by construction (levels accepted only on request match)
    monkeypatch.setattr(dispatch, "SPEC_K", 4)
    yield
    # the kernel-selection memo was poisoned with the forced backend;
    # clear it after monkeypatch restores the env (nothing reads it in
    # between — teardown here runs before the monkeypatch finalizer)
    dispatch.use_pallas.cache_clear()


def _mutate(rng, frag, sub=0.03, ind=0.01):
    out = []
    for b in frag:
        r = rng.random()
        if r < ind:                      # deletion
            continue
        if r < 2 * ind:                  # insertion
            out.append(int(rng.choice(BASES)))
        if rng.random() < sub:           # substitution
            out.append(int(rng.choice(BASES)))
        else:
            out.append(int(b))
    return np.asarray(out, np.uint8)


@pytest.fixture
def tiny_workload(tmp_path, rng):
    genome = rng.choice(BASES, size=20000)
    ref = tmp_path / "ref.fa"
    with open(ref, "w") as f:
        f.write(">chr1\n" + genome.tobytes().decode() + "\n")
    reads = []
    for i in range(3):
        start = int(rng.integers(0, genome.size - 900))
        frag = genome[start:start + 800]
        seq = _mutate(rng, frag)
        if i == 2:                       # one reverse-strand read
            seq = make_read("t", seq).rc_seq
        reads.append(make_read(f"read{i}", seq))
    return str(ref), reads


def _small_cfg():
    # small tiles keep interpret-mode cost low while still producing
    # multi-tile extensions (and therefore speculative chains)
    cfg = Config()
    cfg.tile_size = 64
    cfg.tile_overlap = 16
    cfg.first_tile_size = 32
    cfg.first_tile_score_threshold = 20
    return cfg


def _align(ref_path, reads, backend, monkeypatch):
    monkeypatch.setenv("DARWIN_TPU_KERNEL", backend)
    dispatch.use_pallas.cache_clear()
    store = load_genome(ref_path)
    aligner = Aligner(_small_cfg(), store)
    cnt = new_counters()
    lines = aligner.align_batch(reads, cnt)
    return lines, cnt


def test_spec_dispatch_byte_identity(tiny_workload, monkeypatch):
    ref_path, reads = tiny_workload
    lax_lines, lax_cnt = _align(ref_path, reads, "lax", monkeypatch)
    pl_lines, pl_cnt = _align(ref_path, reads, "pallas", monkeypatch)

    assert lax_cnt["num_extend_tiles"] > 0          # workload is non-trivial
    assert pl_lines == lax_lines                    # byte-identical SAM
    # the speculative chain actually ran (and mostly hit) on the fused path
    trials = pl_cnt["num_spec_hits"] + pl_cnt["num_spec_misses"]
    assert trials > 0
    assert pl_cnt["num_spec_hits"] > 0
    # the reference-visible work counters agree across backends
    for key in ("num_filter_tiles", "num_extend_requests",
                "num_slope_filtered", "num_extend_tiles",
                "num_active_tiles", "num_large_tiles"):
        assert pl_cnt[key] == lax_cnt[key], key
