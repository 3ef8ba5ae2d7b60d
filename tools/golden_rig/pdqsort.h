// Stand-in for the vendored pdqsort used by the reference: an unstable
// comparison sort with identical semantics for our purposes.
#ifndef MINI_PDQSORT_H
#define MINI_PDQSORT_H
#include <algorithm>

template <class It>
void pdqsort(It begin, It end) {
    std::sort(begin, end);
}

template <class It, class Cmp>
void pdqsort(It begin, It end, Cmp cmp) {
    std::sort(begin, end, cmp);
}
#endif
