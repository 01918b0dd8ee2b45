#pragma once
namespace tbb {
template <typename It, typename Body>
void parallel_for_each(It first, It last, const Body& body) {
    for (It it = first; it != last; ++it) body(*it);
}
}
