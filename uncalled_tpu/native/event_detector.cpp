// Native streaming event detector (t-test segmentation of raw current).
//
// Numerically identical to the python oracle in uncalled_tpu/ops/events.py
// (which is golden-tested against the reference detector,
// reference/src/event_detector.cpp): double prefix sums over float32 samples,
// the reference's exact float/double type choreography in the t-stats, the
// two-window peak detectors with the short-masks-long rule, and the
// start-of-read ring-buffer wrap + u32 boundary-wrap quirks.
//
// Exposed via ctypes as detect_events_f32 (no pybind dependency).

#include <cfloat>
#include <cmath>
#include <cstdint>
#include <vector>

namespace {

constexpr int W1 = 3;
constexpr int W2 = 6;
constexpr float THRESH1 = 1.4f;
constexpr float THRESH2 = 9.0f;
constexpr float PEAK_HEIGHT = 0.2f;

struct Det {
    float threshold;
    int window_length;
    int64_t masked_to = 0;
    int64_t peak_pos = -1;
    float peak_value = FLT_MAX;
    bool valid_peak = false;
};

// one peak-detector step; `other` is the long detector (masked by the short)
inline bool peak_detect(float cur, Det &det, int64_t m_cmp, int64_t m,
                        Det *longd) {
    if (det.masked_to >= m_cmp) return false;
    if (det.peak_pos == -1) {
        if (cur < det.peak_value) {
            det.peak_value = cur;
        } else if (cur - det.peak_value > PEAK_HEIGHT) {
            det.peak_value = cur;
            det.peak_pos = m;
        }
    } else {
        if (cur > det.peak_value) {
            det.peak_value = cur;
            det.peak_pos = m;
        }
        if (det.window_length == W1 && det.peak_value > det.threshold &&
            longd != nullptr) {
            longd->masked_to = det.peak_pos + det.window_length;
            longd->peak_pos = -1;
            longd->peak_value = FLT_MAX;
            longd->valid_peak = false;
        }
        if (det.peak_value - cur > PEAK_HEIGHT &&
            det.peak_value > det.threshold) {
            det.valid_peak = true;
        }
        if (det.valid_peak && (m - det.peak_pos) > det.window_length / 2) {
            det.peak_pos = -1;
            det.peak_value = cur;
            det.valid_peak = false;
            return true;
        }
    }
    return false;
}

inline float tstat(const double *S, const double *SQ, int64_t n, int64_t i,
                   int w, int tmin) {
    int64_t m = i - 5;
    if ((i + 2) <= tmin || m < 0 || m + w > n) return 0.0f;
    // start-of-read ring wrap: for m < w the "left" prefix reads m + 2w
    int64_t left = (m < w) ? (m + 2 * w) : (m - w);
    double sum1 = S[m] - S[left];
    double sumsq1 = SQ[m] - SQ[left];
    float sum2 = (float)(S[m + w] - S[m]);
    float sumsq2 = (float)(SQ[m + w] - SQ[m]);
    float wf = (float)w;
    float mean1 = (float)(sum1 / (double)w);
    float mean2 = sum2 / wf;
    float comb = (float)(sumsq1 / (double)w - (double)(mean1 * mean1) +
                         (double)(sumsq2 / wf) - (double)(mean2 * mean2));
    if (comb < FLT_MIN) comb = FLT_MIN;
    float delta = mean2 - mean1;
    float inner = comb / wf;
    return (float)(std::fabs((double)delta) / std::sqrt((double)inner));
}

}  // namespace

extern "C" int64_t detect_events_f32(const float *sig, int64_t n,
                                     float min_mean, float max_mean,
                                     int32_t *out_start, float *out_length,
                                     float *out_mean, float *out_stdv,
                                     int64_t *total_events_out,
                                     double *len_sum_out) {
    std::vector<double> S(n + 1), SQ(n + 1);
    S[0] = SQ[0] = 0.0;
    for (int64_t i = 0; i < n; i++) {
        float x = sig[i];
        S[i + 1] = S[i] + (double)x;
        SQ[i + 1] = SQ[i] + (double)(x * x);  // square in f32, accumulate f64
    }

    Det shortd{THRESH1, W1};
    Det longd{THRESH2, W2};

    int64_t n_events = 0;
    int64_t evt_st = 0;
    int64_t total_events = 0;
    double len_sum = 0.0;
    const int64_t BIG = (int64_t)1 << 32;  // u32 wrap of buf_mid

    for (int64_t i = 0; i < n; i++) {
        int64_t m = i - 5;
        int64_t m_cmp = (m >= 0) ? m : m + BIG;
        float t1 = tstat(S.data(), SQ.data(), n, i, W1, 2 * W1);
        float t2 = tstat(S.data(), SQ.data(), n, i, W2, 2 * W2);
        bool p1 = peak_detect(t1, shortd, m_cmp, m, &longd);
        bool p2 = peak_detect(t2, longd, m_cmp, m, nullptr);
        if (p1 || p2) {
            int64_t evt_en = m - W1 + 1;
            float length = (float)(evt_en - evt_st);
            float mean = (float)((S[evt_en] - S[evt_st]) / (double)length);
            float deltasqr = (float)(SQ[evt_en] - SQ[evt_st]);
            float var = deltasqr / length - mean * mean;
            float stdv = std::sqrt(var > 0.0f ? var : 0.0f);
            total_events++;
            len_sum += (double)length;
            if (mean >= min_mean && mean <= max_mean) {
                out_start[n_events] = (int32_t)evt_st;
                out_length[n_events] = length;
                out_mean[n_events] = mean;
                out_stdv[n_events] = stdv;
                n_events++;
            }
            evt_st = evt_en;
        }
    }
    *total_events_out = total_events;
    *len_sum_out = len_sum;
    return n_events;
}
