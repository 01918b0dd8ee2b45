// Hand-written stand-in for the bond-generated Darwin_types/reflection
// headers (the reference generates these from software/Darwin.bond:42-142
// via gbc; they are not in the repo snapshot).  Plain structs with the same
// field names/types/defaults so /root/reference/software/Processor.cpp
// compiles unmodified for ground-truth fuzzing (tests/test_ref_parity.py).
#pragma once
#include <cassert>  // Processor.cpp uses assert() without including it;
                    // the real generated headers pulled it in transitively.
#include <cstdint>
#include <string>
#include <vector>

namespace Darwin {

enum Status { OK = 0, InvalidData = 1 };

typedef int32_t Score;
typedef uint64_t Addr;
typedef uint16_t TileSize;
typedef uint16_t MaxTBSteps;
typedef uint32_t TileScore;
typedef uint8_t BatchSize;
typedef std::vector<uint64_t> Sequence;

struct AlignmentScoringParams {
    Score sub_AA = 1;
    Score sub_AC = -1;
    Score sub_AG = -1;
    Score sub_AT = -1;
    Score sub_CC = 1;
    Score sub_CG = -1;
    Score sub_CT = -1;
    Score sub_GG = 1;
    Score sub_GT = -1;
    Score sub_TT = 1;
    Score sub_N = 0;
    Score gap_open = -1;
    Score gap_extend = -1;
    Score long_gap_open = -1;
    Score long_gap_extend = -1;
};

struct AlignmentScoringParamsResponse {
    Status status = OK;
};

struct InitializeDRAMMessage {
    Addr start_addr = 0;
    uint16_t num_bytes = 0;
    Sequence data;
};

struct InitializeDRAMMessageResponse {
    Status status = OK;
};

struct WaitForWritesMessage {
    int32_t start = 1;
};

struct WaitForWritesResponse {
    Status status = OK;
};

struct AlignmentInputFieldsDRAM {
    // 7-6: unused, 5: Do traceback, 4: Reverse ref, 3: Complement ref,
    // 2: Reverse query, 1: Complement query, 0: Align from end
    uint8_t align_fields = 0;
    uint16_t index = 0;
    Addr ref_bases_start_addr = 0;
    Addr query_bases_start_addr = 0;
    TileSize ref_size = 0;
    TileSize query_size = 0;
    MaxTBSteps max_tb_steps = 512;
    TileScore score_threshold = 0;
};

struct AlignmentResult {
    BatchSize index = 0;
    TileScore score = 0;
    TileSize ref_offset = 0;
    TileSize query_offset = 0;
    TileSize ref_max_pos = 0;
    TileSize query_max_pos = 0;
    TileSize total_TB_pointers = 0;
    std::vector<uint64_t> TB_pointers;
    Status status = OK;
};

struct BatchAlignmentInputFieldsDRAM {
    uint8_t do_traceback = 0;
    std::vector<AlignmentInputFieldsDRAM> requests;
};

struct BatchAlignmentResultDRAM {
    std::vector<AlignmentResult> results;
};

}  // namespace Darwin
