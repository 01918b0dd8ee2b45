#pragma once
#include <vector>
namespace tbb {
template <typename T> class concurrent_vector : public std::vector<T> {
  public:
    typename std::vector<T>::iterator grow_by(size_t n) {
        size_t old = this->size();
        this->resize(old + n);
        return this->begin() + old;
    }
};
}
