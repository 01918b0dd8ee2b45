// Minimal bond::blob: a (pointer, length) view, the only API the
// reference uses (Index.cpp, graph.h Read, main.cpp RevComp).
#pragma once
#include <cstddef>

namespace bond {
class blob {
    const void* data_ = nullptr;
    size_t len_ = 0;
  public:
    blob() = default;
    blob(const void* d, size_t n) : data_(d), len_(n) {}
    void assign(const void* d, size_t n) { data_ = d; len_ = n; }
    const void* data() const { return data_; }
    size_t size() const { return len_; }
    size_t length() const { return len_; }
};
}
