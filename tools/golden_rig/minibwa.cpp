// Mini-libbwa implementation for the golden rig (see bwa/bwa.h).
#include "bwa/bwa.h"
#include "bwa/utils.h"
#include <algorithm>

#include <cstring>
#include <string>
#include <vector>

namespace {
constexpr int OCC_INTV_FILE = 0x80;  // .bwt file interleave (128 bases)
constexpr int CKPT = 32;             // our query-time checkpoint spacing

inline uint8_t bwt_base(const bwt_t* b, bwtint_t j) {
    return (b->bwt[j >> 4] >> ((~j & 0xf) << 1)) & 3;
}

inline int popcount_match(uint32_t word, uint8_t c, int nbases) {
    // count bases equal to c among the first nbases of a word
    uint32_t pat = 0x55555555u * c;
    uint32_t x = word ^ pat;
    uint32_t m = (~x) & ((~x) >> 1) & 0x55555555u;
    if (nbases <= 0) return 0;
    if (nbases < 16) m &= 0xFFFFFFFFu << ((16 - nbases) * 2);
    return __builtin_popcount(m);
}

// count of c in stored bwt[0..k] inclusive
bwtint_t count_stored(const bwt_t* b, bwtint_t k, uint8_t c) {
    bwtint_t blk = k / CKPT;
    bwtint_t cnt = b->ckpt[blk][c];
    bwtint_t w0 = blk * (CKPT / 16);
    int64_t rem = (int64_t)(k - blk * CKPT);  // 0..31
    cnt += popcount_match(b->bwt[w0], c, (int)std::min<int64_t>(rem + 1, 16));
    if (rem >= 16) cnt += popcount_match(b->bwt[w0 + 1], c, (int)(rem - 15));
    return cnt;
}

bwtint_t bwt_occ1(const bwt_t* b, bwtint_t k, uint8_t c) {
    if (k == (bwtint_t)-1) return 0;
    if (k == b->seq_len) return b->L2[c + 1] - b->L2[c];
    if (k >= b->primary) --k;
    return count_stored(b, k, c);
}
}  // namespace

extern "C" {

bwt_t* bwt_restore_bwt(const char* fn) {
    FILE* fp = fopen(fn, "rb");
    if (!fp) return nullptr;
    bwt_t* b = (bwt_t*)calloc(1, sizeof(bwt_t));
    err_fread_noeof(&b->primary, 8, 1, fp);
    b->L2[0] = 0;
    err_fread_noeof(b->L2 + 1, 8, 4, fp);
    b->seq_len = b->L2[4];

    bwtint_t n = b->seq_len;
    bwtint_t n_base_words = (n + 15) / 16;
    b->bwt = (uint32_t*)calloc(n_base_words + 2, 4);
    b->bwt_size = n_base_words;

    // strip the interleaved occ counts: layout per 128-base block is
    // [4 x u64 counts (8 words), 8 base words]
    bwtint_t n_blocks = (n + OCC_INTV_FILE - 1) / OCC_INTV_FILE;
    std::vector<uint32_t> buf(16);
    bwtint_t w = 0;
    for (bwtint_t blk = 0; blk < n_blocks; blk++) {
        err_fread_noeof(buf.data(), 4, 8, fp);  // skip counts
        bwtint_t take = std::min<bwtint_t>(8, n_base_words - w);
        err_fread_noeof(b->bwt + w, 4, take, fp);
        w += take;
    }
    fclose(fp);

    // build query checkpoints (counts before each 32-base block)
    b->n_ckpt = n / CKPT + 2;
    b->ckpt = (uint32_t(*)[4])calloc(b->n_ckpt, sizeof(uint32_t[4]));
    uint64_t c4[4] = {0, 0, 0, 0};
    for (bwtint_t blk = 0; blk * CKPT < n; blk++) {
        for (int c = 0; c < 4; c++) b->ckpt[blk][c] = (uint32_t)c4[c];
        bwtint_t end = std::min<bwtint_t>(n, (blk + 1) * CKPT);
        for (bwtint_t j = blk * CKPT; j < end; j++) c4[bwt_base(b, j)]++;
    }
    for (int c = 0; c < 4; c++) b->ckpt[n / CKPT + (n % CKPT ? 1 : 0)][c] = (uint32_t)c4[c];
    return b;
}

void bwt_restore_sa(const char* fn, bwt_t* b) {
    FILE* fp = fopen(fn, "rb");
    if (!fp) {
        fprintf(stderr, "missing .sa\n");
        exit(1);
    }
    bwtint_t primary, skip[4], sa_intv, seq_len;
    err_fread_noeof(&primary, 8, 1, fp);
    err_fread_noeof(skip, 8, 4, fp);
    err_fread_noeof(&sa_intv, 8, 1, fp);
    err_fread_noeof(&seq_len, 8, 1, fp);
    b->sa_intv = (int)sa_intv;
    b->n_sa = (seq_len + sa_intv) / sa_intv;
    b->sa = (bwtint_t*)calloc(b->n_sa, 8);
    b->sa[0] = (bwtint_t)-1;
    err_fread_noeof(b->sa + 1, 8, b->n_sa - 1, fp);
    fclose(fp);
}

void bwt_destroy(bwt_t* b) {
    if (!b) return;
    free(b->bwt);
    free(b->ckpt);
    free(b->sa);
    free(b);
}

void bwt_2occ(const bwt_t* b, bwtint_t k, bwtint_t l, uint8_t c, bwtint_t* ok,
              bwtint_t* ol) {
    *ok = bwt_occ1(b, k, c);
    *ol = bwt_occ1(b, l, c);
}

static bwtint_t inv_psi(const bwt_t* b, bwtint_t k) {
    if (k == b->primary) return 0;
    bwtint_t j = k - (k > b->primary);
    uint8_t c = bwt_base(b, j);
    return b->L2[c] + bwt_occ1(b, k, c);
}

bwtint_t bwt_sa(const bwt_t* b, bwtint_t k) {
    bwtint_t cnt = 0;
    while (k % b->sa_intv) {
        ++cnt;
        k = inv_psi(b, k);
    }
    return b->sa[k / b->sa_intv] + cnt;
}

bntseq_t* bns_restore(const char* prefix) {
    std::string ann = std::string(prefix) + ".ann";
    FILE* fp = fopen(ann.c_str(), "r");
    if (!fp) return nullptr;
    bntseq_t* bns = (bntseq_t*)calloc(1, sizeof(bntseq_t));
    long long l_pac;
    int n_seqs;
    unsigned seed;
    if (fscanf(fp, "%lld %d %u", &l_pac, &n_seqs, &seed) != 3) exit(1);
    bns->l_pac = l_pac;
    bns->n_seqs = n_seqs;
    bns->seed = seed;
    bns->anns = (bntann1_t*)calloc(n_seqs, sizeof(bntann1_t));
    char name[4096], rest[65536];
    for (int i = 0; i < n_seqs; i++) {
        bntann1_t* a = bns->anns + i;
        unsigned gi;
        if (fscanf(fp, "%u %s", &gi, name) != 2) exit(1);
        a->gi = gi;
        a->name = strdup(name);
        if (!fgets(rest, sizeof(rest), fp)) exit(1);  // rest of anno line
        long long off;
        int len, nambs;
        if (fscanf(fp, "%lld %d %d", &off, &len, &nambs) != 3) exit(1);
        a->offset = off;
        a->len = len;
        a->n_ambs = nambs;
    }
    fclose(fp);
    std::string pac = std::string(prefix) + ".pac";
    bns->fp_pac = fopen(pac.c_str(), "rb");
    return bns;
}

void bns_destroy(bntseq_t* bns) {
    if (!bns) return;
    for (int i = 0; i < bns->n_seqs; i++) free(bns->anns[i].name);
    free(bns->anns);
    if (bns->fp_pac) fclose(bns->fp_pac);
    free(bns);
}

int bns_pos2rid(const bntseq_t* bns, int64_t pos) {
    if (pos >= bns->l_pac) return -1;
    int lo = 0, hi = bns->n_seqs - 1;
    while (lo < hi) {  // find last ann with offset <= pos
        int mid = (lo + hi + 1) / 2;
        if (bns->anns[mid].offset <= pos)
            lo = mid;
        else
            hi = mid - 1;
    }
    return lo;
}

int bwa_idx_build(const char*, const char*, int, int) {
    fprintf(stderr, "bwa_idx_build not supported in mini-bwa rig\n");
    return -1;
}
}
