#pragma once
namespace tbb {
template <typename It, typename Body>
void parallel_for_each(It first, It last, const Body& body) {
    for (It it = first; it != last; ++it) body(*it);
}
template <typename Range, typename Body>
void parallel_for(const Range& r, const Body& body) {
    body(r);
}
}
