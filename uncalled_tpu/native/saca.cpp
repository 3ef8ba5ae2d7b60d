// Native host-side index-construction kernels for uncalled_tpu.
//
// Provides:
//   suffix_array_u8(text, n, out_sa): SA-IS suffix array over a small-alphabet
//     byte text (values < 256). Treats the (virtual) end-of-string sentinel as
//     the unique smallest character. O(n) time, int32 indices (n < 2^31).
//   bwt_from_sa: derive the BWA-style BWT (sentinel row dropped) + primary.
//
// Built as a shared library and loaded via ctypes (no pybind dependency).
// This replaces the role of vendored libbwa's index construction in the
// reference (reference/src/bwa_index.hpp:92-101 wraps bwa_idx_build); the
// algorithm here is an independent SA-IS implementation.

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// Generic SA-IS over an integer alphabet [0, K). The input must NOT contain
// a 0 sentinel; we handle the virtual sentinel implicitly by index bounds.
// Convention: suffix i < suffix j follows standard sentinel-terminated order
// (the sentinel is smaller than every character).
//
// Implementation detail: we append a real sentinel internally (value 0) and
// shift characters by +1, running classic SA-IS over s[0..n] with s[n]=0.
void sais_core(const int32_t* s, int32_t* sa, int64_t n, int64_t K);

// classify L/S types; t[i] = true if S-type
inline void classify(const int32_t* s, int64_t n, std::vector<bool>& t) {
    t.assign(n, false);
    t[n - 1] = true;  // sentinel is S-type
    for (int64_t i = n - 2; i >= 0; i--)
        t[i] = s[i] < s[i + 1] || (s[i] == s[i + 1] && t[i + 1]);
}

inline bool is_lms(const std::vector<bool>& t, int64_t i) {
    return i > 0 && t[i] && !t[i - 1];
}

void get_buckets(const int32_t* s, int64_t n, int64_t K, std::vector<int64_t>& bkt,
                 bool end) {
    bkt.assign(K, 0);
    for (int64_t i = 0; i < n; i++) bkt[s[i]]++;
    int64_t sum = 0;
    for (int64_t i = 0; i < K; i++) {
        sum += bkt[i];
        bkt[i] = end ? sum : sum - bkt[i];
    }
}

void induce_sal(const int32_t* s, int32_t* sa, int64_t n, int64_t K,
                const std::vector<bool>& t, std::vector<int64_t>& bkt) {
    get_buckets(s, n, K, bkt, false);
    for (int64_t i = 0; i < n; i++) {
        int64_t j = sa[i] - 1;
        if (sa[i] > 0 && j >= 0 && !t[j]) sa[bkt[s[j]]++] = (int32_t)j;
    }
}

void induce_sas(const int32_t* s, int32_t* sa, int64_t n, int64_t K,
                const std::vector<bool>& t, std::vector<int64_t>& bkt) {
    get_buckets(s, n, K, bkt, true);
    for (int64_t i = n - 1; i >= 0; i--) {
        int64_t j = sa[i] - 1;
        if (sa[i] > 0 && j >= 0 && t[j]) sa[--bkt[s[j]]] = (int32_t)j;
    }
}

void sais_core(const int32_t* s, int32_t* sa, int64_t n, int64_t K) {
    if (n == 1) {
        sa[0] = 0;
        return;
    }
    std::vector<bool> t;
    classify(s, n, t);
    std::vector<int64_t> bkt;

    // Stage 1: place LMS suffixes, induce-sort
    get_buckets(s, n, K, bkt, true);
    std::memset(sa, -1, n * sizeof(int32_t));
    for (int64_t i = 1; i < n; i++)
        if (is_lms(t, i)) sa[--bkt[s[i]]] = (int32_t)i;
    induce_sal(s, sa, n, K, t, bkt);
    induce_sas(s, sa, n, K, t, bkt);

    // Compact sorted LMS substrings
    int64_t n1 = 0;
    for (int64_t i = 0; i < n; i++)
        if (is_lms(t, sa[i])) sa[n1++] = sa[i];

    // Name LMS substrings
    std::memset(sa + n1, -1, (n - n1) * sizeof(int32_t));
    int64_t name = 0, prev = -1;
    for (int64_t i = 0; i < n1; i++) {
        int64_t pos = sa[i];
        bool diff = false;
        if (prev < 0) {
            diff = true;
        } else {
            for (int64_t d = 0; d < n; d++) {
                if (pos + d >= n || prev + d >= n || s[pos + d] != s[prev + d] ||
                    t[pos + d] != t[prev + d]) {
                    diff = true;
                    break;
                }
                if (d > 0 && (is_lms(t, pos + d) || is_lms(t, prev + d))) break;
            }
        }
        if (diff) {
            name++;
            prev = pos;
        }
        sa[n1 + pos / 2] = (int32_t)(name - 1);
    }
    for (int64_t i = n - 1, j = n - 1; i >= n1; i--)
        if (sa[i] >= 0) sa[j--] = sa[i];

    // Stage 2: recurse if names are not unique
    int32_t* sa1 = sa;
    int32_t* s1 = sa + n - n1;
    if (name < n1) {
        sais_core(s1, sa1, n1, name);
    } else {
        for (int64_t i = 0; i < n1; i++) sa1[s1[i]] = (int32_t)i;
    }

    // Stage 3: induce full SA from sorted LMS suffixes
    std::vector<int32_t> lms(n1);
    for (int64_t i = 1, j = 0; i < n; i++)
        if (is_lms(t, i)) lms[j++] = (int32_t)i;
    for (int64_t i = 0; i < n1; i++) sa1[i] = lms[sa1[i]];
    get_buckets(s, n, K, bkt, true);
    std::memset(sa + n1, -1, (n - n1) * sizeof(int32_t));
    for (int64_t i = n1 - 1; i >= 0; i--) {
        int64_t j = sa[i];
        sa[i] = -1;
        sa[--bkt[s[j]]] = (int32_t)j;
    }
    induce_sal(s, sa, n, K, t, bkt);
    induce_sas(s, sa, n, K, t, bkt);
}

}  // namespace

extern "C" {

// Suffix array of text[0..n) (byte alphabet). out_sa must hold n int32.
// Returns 0 on success.
int suffix_array_u8(const uint8_t* text, int64_t n, int32_t* out_sa) {
    if (n <= 0) return 0;
    if (n == 1) {
        out_sa[0] = 0;
        return 0;
    }
    // shift alphabet by +1 and append sentinel 0
    std::vector<int32_t> s(n + 1);
    for (int64_t i = 0; i < n; i++) s[i] = (int32_t)text[i] + 1;
    s[n] = 0;
    std::vector<int32_t> sa(n + 1);
    sais_core(s.data(), sa.data(), n + 1, 257);
    // sa[0] == n (the sentinel suffix); drop it
    std::memcpy(out_sa, sa.data() + 1, n * sizeof(int32_t));
    return 0;
}

// BWA-style BWT: given text + its suffix array, emit the BWT with the
// sentinel row removed and return `primary` (the full-numbering row index
// of the sentinel). out_bwt must hold n bytes.
int64_t bwt_from_sa(const uint8_t* text, const int32_t* sa, int64_t n,
                    uint8_t* out_bwt) {
    int64_t primary = -1;
    int64_t w = 0;
    out_bwt[w++] = text[n - 1];  // full row 0 = sentinel suffix; char = last
    for (int64_t r = 0; r < n; r++) {
        if (sa[r] == 0) {
            primary = r + 1;  // full-numbering row of the '$' character
            continue;
        }
        out_bwt[w++] = text[sa[r] - 1];
    }
    return primary;
}

}  // extern "C"
