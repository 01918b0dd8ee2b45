"""End-to-end edge cases: inputs the reference tolerates must not crash or
mis-align here — N runs inside reads, unmappable (random) reads, reads at
chromosome boundaries, tiny/empty inputs."""

import io

import numpy as np
import pytest

from darwin_tpu.config import Config
from darwin_tpu.pipeline import align as align_mod


ACGT = np.frombuffer(b"ACGT", np.uint8)


@pytest.fixture(scope="module")
def genome_files(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("edge")
    rng = np.random.default_rng(7)
    genome = rng.choice(ACGT, size=30000)
    ref = tmp / "ref.fa"
    ref.write_text(">chrE\n" + genome.tobytes().decode() + "\n")
    return tmp, genome, ref


def _run(ref, reads_fa, cfg=None):
    out = io.StringIO()
    err = io.StringIO()
    align_mod.run(str(ref), str(reads_fa), False, cfg=cfg or Config(),
                  out=out, err=err)
    return [l for l in out.getvalue().splitlines() if not l.startswith("@")]


def test_reads_with_n_runs(genome_files):
    tmp, genome, ref = genome_files
    rng = np.random.default_rng(1)
    r = genome[5000:7000].copy()
    r[400:450] = ord("N")          # N run inside the read
    r[0:5] = ord("N")              # N start
    reads = tmp / "n_reads.fa"
    reads.write_text(">nrun\n" + r.tobytes().decode() + "\n")
    body = _run(ref, reads)
    assert len(body) == 1
    assert abs(int(body[0].split("\t")[3]) - 1 - 5000) < 20


def test_unmappable_read(genome_files):
    tmp, genome, ref = genome_files
    rng = np.random.default_rng(2)
    reads = tmp / "junk.fa"
    junk = rng.choice(ACGT, size=1500)
    reads.write_text(">junk\n" + junk.tobytes().decode() + "\n")
    body = _run(ref, reads)
    assert body == []              # no spurious alignment


def test_boundary_reads(genome_files):
    tmp, genome, ref = genome_files
    reads = tmp / "bounds.fa"
    first = genome[:1500]
    last = genome[-1500:]
    reads.write_text(">head\n" + first.tobytes().decode() + "\n"
                     ">tail\n" + last.tobytes().decode() + "\n")
    body = _run(ref, reads)
    assert len(body) == 2
    pos = sorted(int(l.split("\t")[3]) for l in body)
    assert pos[0] == 1
    assert abs(pos[1] - 1 - (len(genome) - 1500)) < 20


def test_empty_and_tiny_reads(genome_files):
    tmp, genome, ref = genome_files
    reads = tmp / "tiny.fa"
    # <=64bp reads are skipped (software/main.cpp:655); file with only
    # skippable reads must run cleanly and emit nothing
    reads.write_text(">t1\nACGT\n>t2\n" + "A" * 64 + "\n")
    assert _run(ref, reads) == []
    empty = tmp / "empty.fa"
    empty.write_text("")
    assert _run(ref, empty) == []
