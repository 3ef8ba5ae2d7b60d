// Debug tool: dump the reference detector's internal t-stat streams.
#define private public
#include "event_detector.hpp"
#undef private
#include <cstdio>
#include <vector>

int main(int argc, char** argv) {
    FILE* fp = fopen(argv[1], "rb");
    std::vector<float> sig;
    float buf[4096]; size_t got;
    while ((got = fread(buf, 4, 4096, fp)) > 0) sig.insert(sig.end(), buf, buf + got);
    fclose(fp);
    EventDetector::Params p = EventDetector::PRMS_DEF;
    p.min_mean = 0; p.max_mean = 40000;
    EventDetector d(p);
    d.reset();
    for (size_t i = 0; i < sig.size(); i++) {
        // replicate add_sample's prefix update, then print tstats
        u32 t_mod = d.t % d.BUF_LEN;
        if (t_mod > 0) { d.sum[t_mod] = d.sum[t_mod-1] + sig[i]; d.sumsq[t_mod] = d.sumsq[t_mod-1] + sig[i]*sig[i]; }
        else { d.sum[t_mod] = d.sum[d.BUF_LEN-1] + sig[i]; d.sumsq[t_mod] = d.sumsq[d.BUF_LEN-1] + sig[i]*sig[i]; }
        d.t++;
        d.buf_mid = d.get_buf_mid();
        float t1 = d.compute_tstat(p.window_length1);
        float t2 = d.compute_tstat(p.window_length2);
        printf("%zu\t%.9g\t%.9g\n", i, t1, t2);
    }
    return 0;
}
