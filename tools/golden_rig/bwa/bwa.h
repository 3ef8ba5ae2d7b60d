// Minimal libbwa-compatible API surface for the golden test rig.
//
// This is NOT a copy of BWA: it implements just the index-query entry points
// the reference's bwa_index.hpp calls (bwt_2occ / bwt_sa / bns_* / file
// loaders), backed by our own occupancy-checkpoint structures, so the
// reference mapper sources can be compiled unmodified and used as a
// correctness oracle for uncalled_tpu.
#ifndef MINI_BWA_H
#define MINI_BWA_H

#include <cstdint>
#include <cstdio>
#include <cstdlib>

typedef uint64_t bwtint_t;

typedef struct {
    bwtint_t primary;  // full-numbering row of the sentinel
    bwtint_t L2[5];
    bwtint_t seq_len;
    // query structures (mini-bwa internal)
    uint32_t* bwt;      // packed 2-bit, 16 bases/word, MSB-first
    bwtint_t bwt_size;  // in words
    uint32_t (*ckpt)[4];  // counts per base at every 32-base boundary
    bwtint_t n_ckpt;
    int sa_intv;
    bwtint_t n_sa;
    bwtint_t* sa;
} bwt_t;

typedef struct {
    int64_t offset;
    int32_t len;
    int32_t n_ambs;
    char* name;
    char* anno;
    uint32_t gi;
} bntann1_t;

typedef struct {
    int64_t l_pac;
    int32_t n_seqs;
    bntann1_t* anns;
    FILE* fp_pac;
    uint32_t seed;
    int64_t n_holes;
} bntseq_t;

#define BWTALGO_AUTO 0

#ifdef __cplusplus
extern "C" {
#endif

bwt_t* bwt_restore_bwt(const char* fn);
void bwt_restore_sa(const char* fn, bwt_t* bwt);
void bwt_destroy(bwt_t* bwt);
void bwt_2occ(const bwt_t* bwt, bwtint_t k, bwtint_t l, uint8_t c,
              bwtint_t* ok, bwtint_t* ol);
bwtint_t bwt_sa(const bwt_t* bwt, bwtint_t k);

bntseq_t* bns_restore(const char* prefix);
void bns_destroy(bntseq_t* bns);
int bns_pos2rid(const bntseq_t* bns, int64_t pos);

int bwa_idx_build(const char* fa, const char* prefix, int algo, int block);

#ifdef __cplusplus
}
#endif

#endif
