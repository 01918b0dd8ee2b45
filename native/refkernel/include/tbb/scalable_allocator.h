// Stand-in for Intel TBB's scalable allocator, used only to compile the
// reference Processor.cpp for ground-truth fuzzing.  Plain malloc-backed.
#pragma once
#include <cstdlib>

static inline void* scalable_malloc(size_t n) { return malloc(n); }
static inline void scalable_free(void* p) { free(p); }

static inline void* scalable_aligned_malloc(size_t n, size_t a) {
    if (a < sizeof(void*)) a = sizeof(void*);
    void* p = nullptr;
    if (posix_memalign(&p, a, n ? n : a) != 0) return nullptr;
    return p;
}
static inline void scalable_aligned_free(void* p) { free(p); }
