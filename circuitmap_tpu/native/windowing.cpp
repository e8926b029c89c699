// Native runtime: continuous-recording window extraction + charge.
//
// A mapping session records one long 20 kHz current trace; analysis
// operates on K response windows of W samples around each stimulus
// (reference slices these with host numpy fancy-indexing,
// simulation.py:473-474, and integrates charge per window with
// np.trapz, caviar.py:28). For hour-long recordings (hundreds of
// millions of samples) that path burns single-core Python time before
// the accelerator sees any data. This library does the gather and the
// trapezoidal reduction with parallel streaming passes so the TPU
// pipeline is fed at memory bandwidth.
//
// Build: g++ -O3 -march=native -shared -fPIC windowing.cpp -o libwindowing.so
// ABI: plain C, used via ctypes (circuitmap_tpu/utils/native.py).

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <thread>
#include <vector>

namespace {

inline int n_workers(long work_items) {
    unsigned hw = std::thread::hardware_concurrency();
    if (hw == 0) hw = 4;
    long cap = std::max(1L, work_items / 16);
    return static_cast<int>(std::min<long>(hw, cap));
}

template <typename Fn>
void parallel_for(long n, Fn&& fn) {
    int workers = n_workers(n);
    if (workers <= 1) {
        for (long i = 0; i < n; ++i) fn(i);
        return;
    }
    std::atomic<long> next(0);
    std::vector<std::thread> pool;
    pool.reserve(workers);
    for (int w = 0; w < workers; ++w) {
        pool.emplace_back([&] {
            for (;;) {
                long i = next.fetch_add(1);
                if (i >= n) return;
                fn(i);
            }
        });
    }
    for (auto& t : pool) t.join();
}

}  // namespace

extern "C" {

// Extract K windows of length W starting at stim_times[k] - pre from a
// float32 timeline of T samples. Out-of-range samples are zero-filled
// (windows near the recording edges). out_windows: [K * W].
void cm_extract_windows(const float* timeline, int64_t T,
                        const int64_t* stim_times, int64_t K,
                        int64_t pre, int64_t W, float* out_windows) {
    parallel_for(K, [&](long k) {
        const int64_t start = stim_times[k] - pre;
        float* dst = out_windows + k * W;
        // clamp both bounds to [0, W]: a stim time far before the
        // recording start would otherwise zero-fill past the row end
        const int64_t lo = std::min<int64_t>(W, std::max<int64_t>(0, -start));
        const int64_t hi = std::min<int64_t>(W, std::max<int64_t>(0, T - start));
        for (int64_t j = 0; j < lo; ++j) dst[j] = 0.0f;
        for (int64_t j = std::max<int64_t>(lo, 0); j < hi; ++j)
            dst[j] = timeline[start + j];
        for (int64_t j = std::max<int64_t>(hi, 0); j < W; ++j) dst[j] = 0.0f;
    });
}

// Trapezoidal charge of each row of a [K, W] float32 trace block.
void cm_trapz_rows(const float* traces, int64_t K, int64_t W,
                   double* out_charge) {
    parallel_for(K, [&](long k) {
        const float* row = traces + k * W;
        double acc = 0.0;
        for (int64_t j = 1; j < W; ++j)
            acc += 0.5 * (static_cast<double>(row[j - 1]) + row[j]);
        out_charge[k] = acc;
    });
}

// Fused: windows + charges in one pass over the timeline.
void cm_extract_windows_with_charge(const float* timeline, int64_t T,
                                    const int64_t* stim_times, int64_t K,
                                    int64_t pre, int64_t W,
                                    float* out_windows, double* out_charge) {
    parallel_for(K, [&](long k) {
        const int64_t start = stim_times[k] - pre;
        float* dst = out_windows + k * W;
        const int64_t lo = std::min<int64_t>(W, std::max<int64_t>(0, -start));
        const int64_t hi = std::min<int64_t>(W, std::max<int64_t>(0, T - start));
        for (int64_t j = 0; j < lo; ++j) dst[j] = 0.0f;
        for (int64_t j = std::max<int64_t>(lo, 0); j < hi; ++j)
            dst[j] = timeline[start + j];
        for (int64_t j = std::max<int64_t>(hi, 0); j < W; ++j) dst[j] = 0.0f;
        double acc = 0.0;
        for (int64_t j = 1; j < W; ++j)
            acc += 0.5 * (static_cast<double>(dst[j - 1]) + dst[j]);
        out_charge[k] = acc;
    });
}

}  // extern "C"
