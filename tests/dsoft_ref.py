"""Sequential reference implementation of minimizers + D-SOFT, transcribed
from the C++ (software/seed_pos_table.{h,cpp}) for adjudicating the
vectorized device implementation.  Deliberately slow and literal."""

import numpy as np


def hash32_ref(key: int, k: int) -> int:
    m = (1 << (2 * k)) - 1
    key = (~key + (key << 21)) & m & 0xFFFFFFFF
    key = (key ^ (key >> 24)) & 0xFFFFFFFF
    key = ((key + (key << 3)) + (key << 8)) & m
    key = (key ^ (key >> 14)) & 0xFFFFFFFF
    key = ((key + (key << 2)) + (key << 4)) & m
    key = (key ^ (key >> 28)) & 0xFFFFFFFF
    key = (key + (key << 31)) & m
    return key


def ref_minimizers(codes2, length, k, w):
    """iterate_minimizers semantics (software/seed_pos_table.h:281-374):
    positions p in [w-1, round16(length) - k), window of w k-mer hashes,
    emit when min changes or the window advanced w since last emission."""
    r16 = ((length + 15) // 16) * 16
    assert len(codes2) >= r16
    kmers = []
    for p in range(r16 - k):
        v = 0
        for i in range(k):
            v |= int(codes2[p + i]) << (2 * i)
        kmers.append(hash32_ref(v, k))
    out = []
    last_m, last_p = 0, 0
    for p in range(w - 1, r16 - k):
        m = min(kmers[p - w + 1:p + 1])
        if m != last_m or p - last_p >= w:
            out.append((p, m))
            last_m, last_p = m, p
    return out


def ref_dsoft_hits_and_anchors(codes2, length, sorted_hashes, positions,
                               *, k, w, num_seeds, max_stride, overlap,
                               threshold, bin_size, max_occ):
    """software/seed_pos_table.cpp:252-389 (hit gather + sort + anchors)."""
    minis = ref_minimizers(codes2, length, k, w)
    hits = []
    stride = 1
    i = 0
    n_buckets = 0
    while i < len(minis):
        offset, h = minis[i]
        start = int(np.searchsorted(sorted_hashes, h, side="left"))
        end = int(np.searchsorted(sorted_hashes, h, side="right"))
        if end - start <= max_occ:
            n_buckets += 1
            for j in range(start, end):
                hit = int(positions[j])
                if hit >= offset:
                    bin_ = (hit - offset) // bin_size
                    hits.append((bin_, offset, hit))
        if i > num_seeds:
            if overlap:
                i += stride
                break
            stride = max_stride
        i += stride

    # stable sort by (bin, offset)
    hits = sorted(enumerate(hits), key=lambda e: (e[1][0], e[1][1], e[0]))
    hits = [h for _, h in hits]

    anchors = []
    last_bin = 1 << 31
    last_offset = 0
    curr_count = 0
    for bin_, offset, hit in hits:
        if bin_ == last_bin:
            if curr_count < threshold:
                if offset - last_offset > k or curr_count == 0:
                    curr_count += k
                else:
                    curr_count += offset - last_offset
                if curr_count >= threshold:
                    anchors.append((hit, offset, bin_))
        else:
            last_bin = bin_
            curr_count = k
            if curr_count >= threshold:
                anchors.append((hit, offset, bin_))
        last_offset = offset
    return hits, anchors, n_buckets


def ref_chain(hits, anchors, bin_size, overlap):
    """software/seed_pos_table.cpp:391-552."""
    sv = 1 if overlap else (1 << 12) // bin_size
    out = []
    for hit, offset, curr_bin in anchors:
        akey = (hit << 32) | offset
        wkeys = [(h << 32) | o for b, o, h in hits
                 if b + sv >= curr_bin and b < curr_bin + sv]
        left = sorted(x for x in wkeys if x <= akey)
        right = sorted(x for x in wkeys if x >= akey)
        score = 0
        keep = [left[-1]]
        cur = left[-1]
        for hkey in reversed(left[:-1]):
            h1, o1 = cur >> 32, cur & 0xFFFFFFFF
            h2, o2 = hkey >> 32, hkey & 0xFFFFFFFF
            if h1 >= h2 and o1 >= o2:
                score += min(h1 - h2, o1 - o2) - abs((h1 - h2) - (o1 - o2)) // 10
                keep.append(hkey)
                cur = hkey
        left_chain = sorted(keep)
        keep = [right[0]]
        cur = right[0]
        for hkey in right[1:]:
            h1, o1 = cur >> 32, cur & 0xFFFFFFFF
            h2, o2 = hkey >> 32, hkey & 0xFFFFFFFF
            if h1 <= h2 and o1 <= o2:
                score += min(h2 - h1, o2 - o1) - abs((h2 - h1) - (o2 - o1)) // 10
                keep.append(hkey)
                cur = hkey
        right_chain = list(reversed(keep))
        out.append({
            "hit": hit, "offset": offset,
            "num_chained": len(left_chain) + len(right_chain),
            "score": score,
            "left": left_chain, "right": right_chain,
        })
    out.sort(key=lambda a: (-a["num_chained"], (a["hit"] << 32) | a["offset"]))
    return out
