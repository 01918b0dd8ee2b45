// extern "C" shim over the reference kernels (compiled verbatim from
// /root/reference/software/Processor.cpp) so the fuzz tests can call
// BatchAlignment / BatchAlignmentSIMD through ctypes and compare
// bit-for-bit against the darwin_tpu oracles and device kernels.
#include "Processor.h"

#include <cstdint>
#include <cstring>

void InitializeScoringParams(size_t token,
                             Darwin::AlignmentScoringParams& request,
                             Darwin::AlignmentScoringParamsResponse& response);
void BatchAlignment(size_t token, char* dram,
                    Darwin::BatchAlignmentInputFieldsDRAM& request,
                    Darwin::BatchAlignmentResultDRAM& result);
void BatchAlignmentSIMD(size_t token, char* dram,
                        Darwin::BatchAlignmentInputFieldsDRAM& request,
                        Darwin::BatchAlignmentResultDRAM& result);
result_t* DualAlignSIMD(const char* dram, uint64_t query_bases_start_addr,
                        int queryLen, uint64_t ref_bases_start_addr,
                        int refLen, bool reverse_query, bool reverse_ref,
                        bool complement_query, bool complement_ref,
                        bool start_end);

extern "C" {

// p = [sub_AA, sub_AC, sub_AG, sub_AT, sub_CC, sub_CG, sub_CT, sub_GG,
//      sub_GT, sub_TT, sub_N, gap_open, gap_extend, long_gap_open,
//      long_gap_extend]  (order of Darwin.bond:42-66)
void ref_set_scoring(const int32_t* p) {
    Darwin::AlignmentScoringParams req;
    req.sub_AA = p[0];
    req.sub_AC = p[1];
    req.sub_AG = p[2];
    req.sub_AT = p[3];
    req.sub_CC = p[4];
    req.sub_CG = p[5];
    req.sub_CT = p[6];
    req.sub_GG = p[7];
    req.sub_GT = p[8];
    req.sub_TT = p[9];
    req.sub_N = p[10];
    req.gap_open = p[11];
    req.gap_extend = p[12];
    req.long_gap_open = p[13];
    req.long_gap_extend = p[14];
    Darwin::AlignmentScoringParamsResponse resp;
    InitializeScoringParams(0, req, resp);
}

// Runs one BatchAlignment(SIMD) call over n requests against `dram`.
// out_tb is an (n, tb_cap) row-major uint64 matrix of packed 2-bit
// traceback pointers (LSB-first, 32 per word, AddToTracebackPointers
// layout, Processor.cpp:568-582).
void ref_batch(int use_simd, int do_traceback, const char* dram, int n,
               const uint8_t* align_fields, const uint64_t* ref_addr,
               const uint64_t* query_addr, const uint16_t* ref_size,
               const uint16_t* query_size, const uint16_t* max_tb_steps,
               int32_t* out_score, int32_t* out_ref_offset,
               int32_t* out_query_offset, int32_t* out_ref_max,
               int32_t* out_query_max, int32_t* out_ntb, uint64_t* out_tb,
               int tb_cap) {
    Darwin::BatchAlignmentInputFieldsDRAM req;
    req.do_traceback = (uint8_t)do_traceback;
    req.requests.resize(n);
    for (int r = 0; r < n; r++) {
        Darwin::AlignmentInputFieldsDRAM& q = req.requests[r];
        q.align_fields = align_fields[r];
        q.index = (uint16_t)r;
        q.ref_bases_start_addr = ref_addr[r];
        q.query_bases_start_addr = query_addr[r];
        q.ref_size = ref_size[r];
        q.query_size = query_size[r];
        q.max_tb_steps = max_tb_steps[r];
        q.score_threshold = 0;
    }
    Darwin::BatchAlignmentResultDRAM res;
    if (use_simd)
        BatchAlignmentSIMD(0, const_cast<char*>(dram), req, res);
    else
        BatchAlignment(0, const_cast<char*>(dram), req, res);
    for (int r = 0; r < n; r++) {
        Darwin::AlignmentResult& o = res.results[r];
        out_score[r] = (int32_t)o.score;
        out_ref_offset[r] = o.ref_offset;
        out_query_offset[r] = o.query_offset;
        out_ref_max[r] = o.ref_max_pos;
        out_query_max[r] = o.query_max_pos;
        out_ntb[r] = o.total_TB_pointers;
        size_t nw = o.TB_pointers.size();
        if ((int)nw > tb_cap) nw = tb_cap;
        for (size_t w = 0; w < nw; w++)
            out_tb[(size_t)r * tb_cap + w] = o.TB_pointers[w];
    }
}

// Dump the full per-cell trace matrix of one DualAlignSIMD call for
// cell-level fuzz diffing.  out_trace is (refLen, segLen*16) int16 in the
// kernel's arr_store layout (HT[j*segLen*16 + i*16 + s]); out_meta =
// [score, end_query, end_ref].
void ref_align_trace(const char* dram, uint64_t query_addr, int query_len,
                     uint64_t ref_addr, int ref_len, int align_fields,
                     int16_t* out_trace, int32_t* out_meta) {
    int reverse_ref = (align_fields >> 4) & 1;
    int complement_ref = (align_fields >> 3) & 1;
    int reverse_query = (align_fields >> 2) & 1;
    int complement_query = (align_fields >> 1) & 1;
    int start_end = align_fields & 1;
    result_t* res = DualAlignSIMD(const_cast<char*>(dram), query_addr,
                                  query_len, ref_addr, ref_len, reverse_query,
                                  reverse_ref, complement_query,
                                  complement_ref, start_end);
    int segLen = (query_len + 15) / 16;
    memcpy(out_trace, res->trace,
           (size_t)ref_len * segLen * 16 * sizeof(int16_t));
    out_meta[0] = res->score;
    out_meta[1] = res->end_query;
    out_meta[2] = res->end_ref;
    scalable_aligned_free(res->trace);
    scalable_free(res);
}

}  // extern "C"
