"""Multi-host helpers + the macro-pipelined driver.

True multi-process runs need a pod; these tests pin down the pieces that
are host-count-independent: read sharding arithmetic, shard merging
(header dedup), and that the pipelined (depth>1) driver emits output
byte-identical to the sequential one.
"""

import io
import os

import numpy as np
import pytest

from darwin_tpu.config import Config
from darwin_tpu.parallel import multihost as mh
from darwin_tpu.pipeline import align as align_mod


@pytest.fixture
def sample_inputs(tmp_path):
    """Small synthetic genome + 4 mutated reads, written as FASTA files."""
    rng = np.random.default_rng(11)
    genome = rng.choice(np.frombuffer(b"ACGT", np.uint8), size=20000)
    ref_fa = tmp_path / "ref.fa"
    ref_fa.write_text(">chrT\n" + genome.tobytes().decode() + "\n")
    from darwin_tpu.io.fasta import load_genome
    from darwin_tpu.utils.simulate import simulate_reads, write_fasta
    store = load_genome(str(ref_fa))
    reads = simulate_reads(store, 4, 1200, seed=3)
    reads_fa = tmp_path / "reads.fa"
    write_fasta(str(reads_fa), reads)
    return ref_fa, reads_fa


def test_shard_reads_partition():
    for n in (0, 1, 7, 16, 100):
        for p in (1, 2, 3, 8):
            spans = [mh.shard_reads(n, i, p) for i in range(p)]
            # exact cover, in order, sizes within 1
            assert spans[0][0] == 0 and spans[-1][1] == n
            for (a0, a1), (b0, b1) in zip(spans, spans[1:]):
                assert a1 == b0
            sizes = [b - a for a, b in spans]
            assert max(sizes) - min(sizes) <= 1


def test_merge_shards_header_dedup(tmp_path):
    out = str(tmp_path / "out.sam")
    shard_lines = [
        b"@HD\tVN:1.4\n@SQ\tSN:c\tLN:9\nr0\t0\tc\n",
        b"@HD\tVN:1.4\n@SQ\tSN:c\tLN:9\nr1\t0\tc\n",
        b"r2\t0\tc\n",
    ]
    for p, data in enumerate(shard_lines):
        with open(mh.shard_path(out, p), "wb") as f:
            f.write(data)
    mh.merge_shards(out, 3)
    got = open(out, "rb").read()
    assert got == (b"@HD\tVN:1.4\n@SQ\tSN:c\tLN:9\n"
                   b"r0\t0\tc\nr1\t0\tc\nr2\t0\tc\n")
    assert not os.path.exists(mh.shard_path(out, 0))


def test_merge_shards_header_from_later_shard(tmp_path):
    """An empty rank-0 shard must not eat the header of the first shard
    that has one."""
    out = str(tmp_path / "out.sam")
    shards = [b"", b"@HD\tVN:1.4\nr1\t0\tc\n", b"@HD\tVN:1.4\nr2\t0\tc\n"]
    for p, data in enumerate(shards):
        with open(mh.shard_path(out, p), "wb") as f:
            f.write(data)
    mh.merge_shards(out, 3)
    assert open(out, "rb").read() == b"@HD\tVN:1.4\nr1\t0\tc\nr2\t0\tc\n"


def test_pipelined_run_identical(tmp_path, sample_inputs):
    """pipeline_depth=2 (two read batches in flight) must be output- and
    counter-identical to the sequential driver."""
    ref_fa, reads_fa = sample_inputs
    outs = []
    for depth in (1, 2):
        out = io.StringIO()
        err = io.StringIO()
        align_mod.run(str(ref_fa), str(reads_fa), do_overlap=False,
                      cfg=Config(), out=out, err=err, reads_per_batch=2,
                      pipeline_depth=depth)
        outs.append((out.getvalue(), err.getvalue()))
    assert outs[0][0] == outs[1][0]
    # counters block of stderr identical
    tail0 = [l for l in outs[0][1].splitlines() if l.startswith("#")]
    tail1 = [l for l in outs[1][1].splitlines() if l.startswith("#")]
    assert tail0 == tail1 and len(tail0) == 7


def test_fastq_quality_lines_starting_with_at(tmp_path):
    """FASTQ quality strings may begin with '@' or '+'; the parser must
    count quality bytes instead of sniffing leading characters."""
    from darwin_tpu.io.fasta import iter_fasta
    fq = tmp_path / "r.fq"
    fq.write_bytes(
        b"@r1 desc\nACGTACGT\n+\n@IIIIIII\n"      # qual starts with '@'
        b"@r2\nACGT\nACGT\n+r2\n+@II\nIIII\n"     # multi-line seq + qual
        b"@r3\nGGGG\n+\nIIII\n")
    recs = [(n, bytes(s)) for n, s in iter_fasta(str(fq))]
    assert recs == [("r1", b"ACGTACGT"),
                    ("r2", b"ACGTACGT"),
                    ("r3", b"GGGG")]
