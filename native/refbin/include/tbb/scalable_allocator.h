// malloc-backed stand-ins for the TBB scalable allocator (single-threaded
// reference build for golden generation).
//
// Every allocation is padded by 64 slack bytes: the reference's SIMD
// kernel reads 16-byte vectors past the end of exact-sized buffers (e.g.
// the RevComp output, main.cpp:71 — AddressSanitizer flags a
// heap-buffer-overflow there on unpadded allocations), and it only works
// in production because TBB's scalable allocator bins requests into size
// classes whose slack absorbs the overread.  The padding reproduces that
// environment.
#pragma once
#include <cstdlib>
#include <cstring>

#define DARWIN_ALLOC_SLACK 64

static inline void* scalable_malloc(size_t n) {
    void* p = malloc(n + DARWIN_ALLOC_SLACK);
    if (p) memset((char*)p + n, 0, DARWIN_ALLOC_SLACK);  // determinism
    return p;
}
static inline void scalable_free(void* p) { free(p); }
static inline void* scalable_calloc(size_t n, size_t sz) {
    return calloc(1, n * sz + DARWIN_ALLOC_SLACK);
}
static inline void* scalable_aligned_malloc(size_t n, size_t a) {
    if (a < sizeof(void*)) a = sizeof(void*);
    void* p = nullptr;
    if (posix_memalign(&p, a, n + DARWIN_ALLOC_SLACK) != 0) return nullptr;
    memset((char*)p + n, 0, DARWIN_ALLOC_SLACK);
    return p;
}
static inline void scalable_aligned_free(void* p) { free(p); }
