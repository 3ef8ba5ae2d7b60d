// Differential probe for the introsort replica: sorts records with the
// exact PathBuffer comparator shape (mapper.cpp:866-871 — lexicographic
// (fm_start, fm_end, seed_prob) with float seed_prob) using std::sort as
// built by this image's g++ (the same libstdc++ the golden rig links),
// and prints the permutation of input indices.
//
// stdin:  n, then n lines "start end prob"
// stdout: n input-indices in sorted order
//
// argv[1] == "partial": use std::partial_sort(begin, end, end) instead —
// the __heap_select + __sort_heap path introsort falls back to when its
// depth limit trips, so the replica's _depth_limit=0 branch can be
// differential-tested too (its tie permutation differs from the
// quicksort path and is otherwise never exercised by random cases).
#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <vector>

struct Rec {
    uint64_t start, end;
    float prob;
    int idx;
};

static bool operator<(const Rec &p1, const Rec &p2) {
    return (p1.start < p2.start ||
            (p1.start == p2.start && p1.end < p2.end)) ||
           (p1.start == p2.start && p1.end == p2.end && p1.prob < p2.prob);
}

int main(int argc, char **argv) {
    int n;
    if (scanf("%d", &n) != 1) return 1;
    std::vector<Rec> v(n);
    for (int i = 0; i < n; i++) {
        if (scanf("%llu %llu %f", (unsigned long long *)&v[i].start,
                  (unsigned long long *)&v[i].end, &v[i].prob) != 3)
            return 1;
        v[i].idx = i;
    }
    if (argc > 1 && argv[1][0] == 'p')
        std::partial_sort(v.begin(), v.end(), v.end());
    else
        std::sort(v.begin(), v.end());
    for (int i = 0; i < n; i++) printf("%d\n", v[i].idx);
    return 0;
}
