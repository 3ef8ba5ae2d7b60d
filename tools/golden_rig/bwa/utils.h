#ifndef MINI_BWA_UTILS_H
#define MINI_BWA_UTILS_H
#include <cstdio>
#include <cstdlib>

static inline void err_fread_noeof(void* ptr, size_t size, size_t n, FILE* fp) {
    if (fread(ptr, size, n, fp) != n) {
        fprintf(stderr, "err_fread_noeof: short read\n");
        exit(1);
    }
}
#endif
