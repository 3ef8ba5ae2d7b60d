// Stand-in for the pdqsort vendored by the reference (mapper.cpp:24).
//
// The reference's pdqsort submodule (/root/reference/submods/pdqsort) is
// EMPTY in the read-only checkout, so ANY build of the reference sources
// must substitute a sort here.  pdqsort is an UNSTABLE sort: the relative
// order of candidates tied on the full comparator key (fm_start, fm_end,
// f32 seed_prob — mapper.cpp:866-871) is unspecified by the reference's
// own semantics, yet observable in the output byte stream (the duplicate-
// range dedup at mapper.cpp:568-571 keeps the LAST element of an equal
// run, and the survivor's length/moves/consec history flows into future
// events and seed reports).  Ties are pervasive — measured 38% of events
// on the bench read set carry at least one fully tied candidate pair —
// so the tie order is a load-bearing BUILD ARTIFACT, not a property of
// the algorithm.
//
// This rig pins the tie order to the STABLE refinement of the same
// comparator contract (std::stable_sort: creation order preserved), which
// is deterministic, toolchain-independent, and exactly replicable by the
// framework's oracle and batched device engine.  Define RIG_UNSTABLE_SORT
// to build with libstdc++ std::sort instead (golden_map_stdsort target) —
// the framework's introsort.py replicates THAT build's tie permutation
// line for line (tests/test_tie_parity.py pins all 7 reads where the two
// builds' PAF bytes differ, ~0.7% of the bench set).
#ifndef MINI_PDQSORT_H
#define MINI_PDQSORT_H
#include <algorithm>

template <class It>
void pdqsort(It begin, It end) {
#ifdef RIG_UNSTABLE_SORT
    std::sort(begin, end);
#else
    std::stable_sort(begin, end);
#endif
}

template <class It, class Cmp>
void pdqsort(It begin, It end, Cmp cmp) {
#ifdef RIG_UNSTABLE_SORT
    std::sort(begin, end, cmp);
#else
    std::stable_sort(begin, end, cmp);
#endif
}
#endif
