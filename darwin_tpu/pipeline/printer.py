"""Output stage: SAM (reference-guided) and MHAP-like (overlap) emission.

Replicates printer_body (software/printer.cpp) exactly: sort orders,
secondary-alignment suppression, CIGAR assembly with soft clips, flags,
tags, and the MHAP 90%-end filter / per-(read,target) dedup / min_overlap
gate.  One divergence, documented: the reference's cross-batch output order
is TBB-scheduler-dependent; we emit read batches in reader order.
"""

from __future__ import annotations

from typing import List

import numpy as np

from darwin_tpu.genome import GenomeStore
from darwin_tpu.pipeline.extend import ExtendAlignment


def sam_header(store: GenomeStore) -> str:
    lines = ["@HD\tVN:1.6\tSO:coordinate"]
    for c in store.chromosomes:
        lines.append(f"@SQ\tSN:{c.name}\tLN:{c.length_unpadded}")
    return "\n".join(lines) + "\n"


def _cigar(e: ExtendAlignment) -> str:
    """CIGAR from the aligned strings (printer.cpp:219-292) — vectorized
    run-length encoding (the per-character loop was ~1.6 ms per 10 kb
    read, a visible host cost at full throughput)."""
    out = []
    if e.query_start_offset > 0:
        out.append(f"{e.query_start_offset}S")
    ref = np.frombuffer(bytes(e.aligned_reference), np.uint8)
    q = np.frombuffer(bytes(e.aligned_query), np.uint8)
    assert len(ref) == len(q)
    if len(ref):
        dash = np.uint8(ord("-"))
        ops = np.where(ref == dash, np.uint8(ord("I")),
                       np.where(q == dash, np.uint8(ord("D")),
                                np.uint8(ord("M"))))
        bounds = np.concatenate(
            ([0], np.nonzero(np.diff(ops))[0] + 1, [len(ops)]))
        lens = np.diff(bounds)
        chars = ops[bounds[:-1]]
        out.extend(f"{int(l)}{chr(c)}" for l, c in zip(lens, chars))
    tail = e.query_length - e.query_end_offset - 1
    if tail > 0:
        out.append(f"{tail}S")
    return "".join(out) if out else "*"


def sam_lines(alignments: List[ExtendAlignment], reads,
              store: GenomeStore) -> List[str]:
    """software/printer.cpp:7-98 (minus the header, emitted separately)."""
    als = sorted(alignments, key=lambda e: (e.read_num, -e.score))
    # suppress secondaries overlapping >50% of a better alignment (:23-48)
    for i, e1 in enumerate(als):
        if not e1.do_print:
            continue
        s1, e_1 = e1.query_start_offset, e1.query_end_offset
        for j in range(i + 1, len(als)):
            e2 = als[j]
            if not e2.do_print:
                continue
            if e2.read_num != e1.read_num:
                break
            s2, e_2 = e2.query_start_offset, e2.query_end_offset
            s, e = max(s1, s2), min(e_1, e_2)
            overlap = e - s if e > s else 0
            if 2 * overlap > (e_2 - s2):
                e2.do_print = False

    out = []
    for e in als:
        if not e.do_print:
            continue
        read = reads[e.read_num]
        flag = (16 if e.strand == "-" else 0) + 64
        seq = (read.rc_seq if e.strand == "-" else read.seq).tobytes().decode()
        out.append("\t".join([
            read.name, str(flag), store.chromosomes[e.chr_id].name,
            str(1 + e.reference_start_offset), "60", _cigar(e), "*", "0",
            "0", seq, "*", f"AS:i:{e.score}", f"ZS:i:{e.score}",
        ]) + "\n")
    return out


def mhap_lines(alignments: List[ExtendAlignment], reads,
               store: GenomeStore, cfg) -> List[str]:
    """software/printer.cpp:100-180."""
    als = sorted(alignments, key=lambda e: (e.read_num, e.chr_id, -e.score))
    for i, e1 in enumerate(als):
        ref_end = 1 + e1.reference_end_offset
        query_end = 1 + e1.query_end_offset
        if (ref_end < (9 * e1.reference_length) // 10
                and query_end < (9 * e1.query_length) // 10):
            e1.do_print = False
        if not e1.do_print:
            continue
        for j in range(i + 1, len(als)):
            e2 = als[j]
            if not e2.do_print:
                continue
            if e2.read_num != e1.read_num:
                break
            if e1.chr_id != e2.chr_id:
                break
            e2.do_print = False

    out = []
    for e in als:
        if not e.do_print:
            continue
        read = reads[e.read_num]
        r1 = store.chromosomes[e.chr_id].name
        r2 = read.name
        strand = 1 if e.strand == "-" else 0
        ar = e.aligned_reference.decode()
        aq = e.aligned_query.decode()
        # vectorized match count (printer.cpp:159-166's per-char loop is
        # measurable at assembly scale): bytes.upper() + uint8 compare
        matches = int(np.count_nonzero(
            np.frombuffer(e.aligned_reference.upper(), np.uint8)
            == np.frombuffer(e.aligned_query.upper(), np.uint8)))
        ral = e.reference_end_offset + 1 - e.reference_start_offset
        qal = e.query_end_offset + 1 - e.query_start_offset
        ovl = (ral + qal) // 2
        if ovl < cfg.min_overlap or r1 == r2:
            continue
        # the reference narrows to float32 before printf re-promotes
        # (printer.cpp:166 `float error = ...`); the narrowing moves
        # half-ulp cases across the %.3f rounding boundary (e.g.
        # 147/1200: double 0.12249999... -> "0.122", float32
        # 0.12250000238 -> "0.123")
        error = float(np.float32((1.0 * (ovl - matches)) / ovl))
        rs, re = 1 + e.reference_start_offset, 1 + e.reference_end_offset
        qs, qe = 1 + e.query_start_offset, 1 + e.query_end_offset
        rlen = store.chromosomes[e.chr_id].length_unpadded
        qlen = read.length
        out.append(f"{r1} {r2} {error:.3f} {matches} 0 {rs} {re} {rlen} "
                   f"{strand} {qs} {qe} {qlen}\n")
        out.append(ar + "\n")
        out.append(aq + "\n")
        out.append(f"{r2} {r1} {error:.3f} {matches} {strand} {qs} {qe} "
                   f"{qlen} 0 {rs} {re} {rlen}\n")
        out.append(aq + "\n")
        out.append(ar + "\n")
    return out
