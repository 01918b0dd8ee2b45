"""Long-read simulator.

The reference repo's bundled sample reads file is a stripped large blob
(/root/reference/.MISSING_LARGE_BLOBS), so test/benchmark reads are
regenerated from the bundled reference (yeast sacCer3 chrI) with a simple
PacBio-like error model (substitutions + short indels), on both strands.
"""

from __future__ import annotations

import numpy as np

from darwin_tpu.genome import GenomeStore, revcomp_bytes

_ACGT = np.frombuffer(b"ACGT", np.uint8)


def mutate_read(rng, seq: np.ndarray, sub_p=0.04, ins_p=0.03,
                del_p=0.03) -> np.ndarray:
    r = rng.random(len(seq))
    keep = r >= del_p
    out = seq[keep].copy()
    subs = rng.random(len(out)) < sub_p
    out[subs] = _ACGT[(rng.integers(1, 4, subs.sum())
                       + np.searchsorted(_ACGT, out[subs])) % 4]
    ins_mask = rng.random(len(out)) < ins_p
    if ins_mask.any():
        pieces = []
        prev = 0
        for i in np.nonzero(ins_mask)[0]:
            pieces.append(out[prev:i + 1])
            pieces.append(_ACGT[rng.integers(0, 4, 1)])
            prev = i + 1
        pieces.append(out[prev:])
        out = np.concatenate(pieces)
    return out


def simulate_reads(store: GenomeStore, n_reads: int, read_len: int,
                   seed: int = 0, error=(0.04, 0.03, 0.03)):
    """Returns list of (name, seq_bytes, truth) where truth =
    (chr_name, start0, strand)."""
    rng = np.random.default_rng(seed)
    total = sum(c.length_unpadded for c in store.chromosomes)
    weights = [c.length_unpadded / total for c in store.chromosomes]
    out = []
    for i in range(n_reads):
        ci = int(rng.choice(len(store.chromosomes), p=weights))
        c = store.chromosomes[ci]
        ln = min(read_len, c.length_unpadded - 1)
        start = int(rng.integers(0, max(c.length_unpadded - ln, 1)))
        seq = store.bases[c.start + start:c.start + start + ln]
        seq = mutate_read(rng, seq, *error)
        strand = "+" if rng.random() < 0.5 else "-"
        if strand == "-":
            seq = revcomp_bytes(seq)
        out.append((f"read{i}_{c.name}_{start}_{strand}", seq,
                    (c.name, start, strand)))
    return out


def write_fasta(path: str, reads):
    with open(path, "w") as f:
        for name, seq, _ in reads:
            f.write(f">{name}\n{seq.tobytes().decode()}\n")
