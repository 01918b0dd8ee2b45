"""Streaming read input: the chunked native-scanner path and the batch
iterator must reproduce load_reads exactly (bounded-memory analog of the
reference's wrap-around DRAM read cursor, software/main.cpp:655-698)."""

import numpy as np

from darwin_tpu.io import fasta


def _write_fasta(path, rng, n=50):
    with open(path, "w") as f:
        for i in range(n):
            seq = "".join("ACGT"[c] for c in rng.integers(0, 4, 300 + i))
            f.write(f">r{i} extra stuff\n")
            for j in range(0, len(seq), 60):
                f.write(seq[j:j + 60] + "\n")


def test_chunked_scan_matches_oneshot(tmp_path, rng):
    path = str(tmp_path / "reads.fa")
    _write_fasta(path, rng)
    a = list(fasta.iter_fasta(path))
    b = list(fasta.iter_fasta(path, chunk_bytes=256))  # many chunk cuts
    assert len(a) == len(b) == 50
    for (n1, s1), (n2, s2) in zip(a, b):
        assert n1 == n2
        np.testing.assert_array_equal(s1, s2)


def test_batch_iterator_slicing(tmp_path, rng):
    path = str(tmp_path / "reads.fa")
    _write_fasta(path, rng)
    reads = fasta.load_reads(path)
    got = [r for batch in fasta.iter_read_batches(path, 7, start=5, stop=31)
           for r in batch]
    exp = reads[5:31]
    assert [r.name for r in got] == [r.name for r in exp]
    for g, e in zip(got, exp):
        np.testing.assert_array_equal(g.seq, e.seq)
        np.testing.assert_array_equal(g.rc_seq, e.rc_seq)
    assert fasta.count_reads(path) == len(reads)
    sizes = [len(b) for b in fasta.iter_read_batches(path, 8)]
    assert sizes == [8] * 6 + [2]


def test_gzip_fastq_roundtrip(tmp_path, rng):
    """gzip sniffing + FASTQ parsing (quality lines may start with '@' or
    '+'; length-counted like kseq)."""
    import gzip
    path = str(tmp_path / "reads.fq.gz")
    seqs = []
    with gzip.open(path, "wt") as f:
        for i in range(6):
            seq = "".join("ACGT"[c] for c in rng.integers(0, 4, 200 + i))
            seqs.append(seq)
            qual = "@" + "+" * (len(seq) - 1)   # adversarial quality chars
            f.write(f"@q{i} desc\n{seq}\n+\n{qual}\n")
    got = list(fasta.iter_fasta(path))
    assert [n for n, _ in got] == [f"q{i}" for i in range(6)]
    for (n, s), exp in zip(got, seqs):
        assert bytes(s).decode() == exp
