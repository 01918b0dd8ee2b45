#pragma once
#include <algorithm>
namespace tbb {
template <typename It> void parallel_sort(It first, It last) {
    std::sort(first, last);
}
template <typename It, typename Cmp>
void parallel_sort(It first, It last, const Cmp& cmp) {
    std::sort(first, last, cmp);
}
}
