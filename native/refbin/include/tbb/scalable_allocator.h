// malloc-backed stand-ins for the TBB scalable allocator (single-threaded
// reference build for golden generation).
#pragma once
#include <cstdlib>
#include <cstring>

static inline void* scalable_malloc(size_t n) { return malloc(n); }
static inline void scalable_free(void* p) { free(p); }
static inline void* scalable_calloc(size_t n, size_t sz) {
    return calloc(n, sz);
}
static inline void* scalable_aligned_malloc(size_t n, size_t a) {
    if (a < sizeof(void*)) a = sizeof(void*);
    void* p = nullptr;
    if (posix_memalign(&p, a, n ? n : a) != 0) return nullptr;
    return p;
}
static inline void scalable_aligned_free(void* p) { free(p); }
