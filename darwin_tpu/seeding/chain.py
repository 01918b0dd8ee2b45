"""Host-side anchor chaining (SeedPosTable::DSOFT tail,
software/seed_pos_table.cpp:391-552).

Runs over the device-sorted hit arrays.  Per candidate anchor: gather hits
whose bin lies in [curr_bin - sv, curr_bin + sv) (:409, sv_num_bins = 4096 /
bin_size in reference-guided mode, 1 in overlap mode :394), split into
left (<= anchor) / right (>= anchor) by the packed (hit<<32)|offset key,
greedy collinear filtering from the anchor outward with chain score
min(dh, do) - |dh - do| / 10 (:443-459, :472-487), then sort all anchors by
(chain length desc, hit_offset asc) (:506-510).

Kept on the host: chain lists drive the host extension state machine, and
per-anchor work is tiny.  (A C++ fast path can drop in here later.)
"""

from __future__ import annotations

import dataclasses
from typing import List

import numpy as np


@dataclasses.dataclass
class Anchor:
    hit: int                 # absolute reference position
    offset: int              # query position
    num_chained_hits: int
    anchor_score: int
    left_chained: np.ndarray   # uint64 (hit<<32)|offset, ascending
    right_chained: np.ndarray  # uint64, DESCENDING (reference reverses :488)

    @property
    def hit_offset(self) -> int:
        return (self.hit << 32) | self.offset


def chain_anchors(hits_bin, hits_off, hits_pos, n_hits,
                  anc_pos, anc_off, anc_bin, n_anchors,
                  bin_size: int, overlap: bool) -> List[Anchor]:
    """hits_* : int arrays (valid prefix of length n_hits, sorted by
    (bin, offset)); anc_* : anchors in bin-ascending order."""
    from darwin_tpu.seeding.dsoft import sv_bins
    sv = sv_bins(bin_size, overlap)  # must equal the device pruning window

    from darwin_tpu import native
    res = native.chain_anchors_native(hits_bin, hits_off, hits_pos, n_hits,
                                      anc_pos, anc_off, anc_bin, n_anchors,
                                      sv)
    if res is not None:
        left, loff, right, roff, nch, sc = res
        out = [Anchor(hit=int(anc_pos[a]), offset=int(anc_off[a]),
                      num_chained_hits=int(nch[a]), anchor_score=int(sc[a]),
                      left_chained=left[loff[a]:loff[a + 1]].copy(),
                      right_chained=right[roff[a]:roff[a + 1]].copy())
               for a in range(n_anchors)]
        out.sort(key=lambda x: (-x.num_chained_hits, x.hit_offset))
        return out
    hb = np.asarray(hits_bin[:n_hits], np.int64)
    ho = np.asarray(hits_off[:n_hits], np.uint64)
    # positions use the full uint32 address width; keys pack in uint64
    hp = np.asarray(hits_pos[:n_hits], np.int64).astype(np.uint64)
    hkey = ((hp << np.uint64(32)) | ho).astype(np.uint64)

    out: List[Anchor] = []
    for a in range(n_anchors):
        curr_bin = int(anc_bin[a])
        akey = np.uint64((int(anc_pos[a]) << 32) | int(anc_off[a]))
        lo = int(np.searchsorted(hb, curr_bin - sv, side="left"))
        hi = int(np.searchsorted(hb, curr_bin + sv, side="left"))
        wkey = hkey[lo:hi]

        left = np.sort(wkey[wkey <= akey])
        right = np.sort(wkey[wkey >= akey])
        assert len(left) > 0 and len(right) > 0  # :430-431

        score = 0

        # left collinear: walk from the anchor (largest) down (:440-459)
        keep = [left[-1]]
        cur = int(left[-1])
        for h in range(len(left) - 2, -1, -1):
            cand = int(left[h])
            h1, o1 = cur >> 32, cur & 0xFFFFFFFF
            h2, o2 = cand >> 32, cand & 0xFFFFFFFF
            if h1 >= h2 and o1 >= o2:
                dh, do = h1 - h2, o1 - o2
                match = min(dh, do)
                gap = abs(dh - do)
                score += match - gap // 10
                keep.append(cand)
                cur = cand
        left_chain = np.sort(np.array(keep, np.uint64))

        # right collinear: walk from the anchor (smallest) up (:470-487)
        keep = [right[0]]
        cur = int(right[0])
        for h in range(1, len(right)):
            cand = int(right[h])
            h1, o1 = cur >> 32, cur & 0xFFFFFFFF
            h2, o2 = cand >> 32, cand & 0xFFFFFFFF
            if h1 <= h2 and o1 <= o2:
                dh, do = h2 - h1, o2 - o1
                match = min(dh, do)
                gap = abs(dh - do)
                score += match - gap // 10
                keep.append(cand)
                cur = cand
        right_chain = np.array(keep, np.uint64)[::-1].copy()  # descending

        out.append(Anchor(
            hit=int(anc_pos[a]), offset=int(anc_off[a]),
            num_chained_hits=len(left_chain) + len(right_chain),
            anchor_score=score,
            left_chained=left_chain, right_chained=right_chain))

    # final ordering (:506-510): chain length desc, then hit_offset asc;
    # (num_chained_hits, hit_offset) is unique per anchor so any sort is
    # deterministic here
    out.sort(key=lambda x: (-x.num_chained_hits, x.hit_offset))
    return out
