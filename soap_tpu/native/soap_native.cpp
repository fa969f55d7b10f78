// Native host-side kernels for the soap_tpu runtime.
//
// The reference leans on compiled code inside its dependencies (numpy,
// HDF5-C, MPI) for its host hot paths; this module provides the
// equivalents the TPU build needs at production scale (1e7 halos, 1e9+
// particle IDs), callable through ctypes:
//
//  - hilbert_keys_3d: vectorized Hilbert curve keys (domain
//    decomposition; reference uses virgo.util.peano).
//  - match_sorted / match_ids: multithreaded sorted-array joins for the
//    membership program (reference uses virgo's MPI parallel_match).
//  - split_hi_lo: float64 -> (hi, lo) float32 coordinate splitting for
//    the device staging path.
//
// Build: g++ -O3 -march=native -shared -fPIC (see build.py); a numpy
// fallback in python covers toolchain-less environments.

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// ----------------------------------------------------------------------
// Hilbert curve keys (Skilling transpose construction)
// ----------------------------------------------------------------------

void hilbert_keys_3d(const int64_t* ijk, int64_t n, int bits, uint64_t* out) {
    const int nd = 3;
    int64_t n_threads = std::max<int64_t>(1, std::thread::hardware_concurrency());
    n_threads = std::min(n_threads, std::max<int64_t>(1, n / 65536));
    auto work = [&](int64_t lo, int64_t hi) {
        for (int64_t p = lo; p < hi; ++p) {
            uint64_t x[3] = {static_cast<uint64_t>(ijk[3 * p]),
                             static_cast<uint64_t>(ijk[3 * p + 1]),
                             static_cast<uint64_t>(ijk[3 * p + 2])};
            uint64_t m = uint64_t(1) << (bits - 1);
            // inverse undo excess work
            for (uint64_t q = m; q > 1; q >>= 1) {
                uint64_t pmask = q - 1;
                for (int i = 0; i < nd; ++i) {
                    if (x[i] & q) {
                        x[0] ^= pmask;
                    } else {
                        uint64_t t = (x[0] ^ x[i]) & pmask;
                        x[0] ^= t;
                        x[i] ^= t;
                    }
                }
            }
            // gray encode
            for (int i = 1; i < nd; ++i) x[i] ^= x[i - 1];
            uint64_t t = 0;
            for (uint64_t q = m; q > 1; q >>= 1)
                if (x[nd - 1] & q) t ^= q - 1;
            for (int i = 0; i < nd; ++i) x[i] ^= t;
            // interleave bits
            uint64_t key = 0;
            for (int b = bits - 1; b >= 0; --b)
                for (int i = 0; i < nd; ++i)
                    key = (key << 1) | ((x[i] >> b) & 1);
            out[p] = key;
        }
    };
    if (n_threads <= 1) {
        work(0, n);
        return;
    }
    std::vector<std::thread> threads;
    int64_t step = (n + n_threads - 1) / n_threads;
    for (int64_t t = 0; t < n_threads; ++t)
        threads.emplace_back(work, t * step, std::min(n, (t + 1) * step));
    for (auto& th : threads) th.join();
}

// ----------------------------------------------------------------------
// Sorted joins (membership matching)
// ----------------------------------------------------------------------

// index of each needle in haystack_sorted (values), or -1
void match_sorted(const uint64_t* needles, int64_t n,
                  const uint64_t* haystack_sorted, int64_t m,
                  int64_t* out_idx) {
    int64_t n_threads = std::max<int64_t>(1, std::thread::hardware_concurrency());
    n_threads = std::min(n_threads, std::max<int64_t>(1, n / 262144));
    auto work = [&](int64_t lo, int64_t hi) {
        for (int64_t p = lo; p < hi; ++p) {
            const uint64_t* it =
                std::lower_bound(haystack_sorted, haystack_sorted + m, needles[p]);
            out_idx[p] =
                (it != haystack_sorted + m && *it == needles[p])
                    ? static_cast<int64_t>(it - haystack_sorted)
                    : -1;
        }
    };
    if (n_threads <= 1) {
        work(0, n);
        return;
    }
    std::vector<std::thread> threads;
    int64_t step = (n + n_threads - 1) / n_threads;
    for (int64_t t = 0; t < n_threads; ++t)
        threads.emplace_back(work, t * step, std::min(n, (t + 1) * step));
    for (auto& th : threads) th.join();
}

// Full membership join: sorts (id, row) pairs of the haystack internally,
// then matches; returns the ORIGINAL haystack row per needle, or -1.
void match_ids(const uint64_t* needles, int64_t n, const uint64_t* haystack,
               int64_t m, int64_t* out_row) {
    std::vector<std::pair<uint64_t, int64_t>> hay(m);
    for (int64_t i = 0; i < m; ++i) hay[i] = {haystack[i], i};
    std::sort(hay.begin(), hay.end());
    int64_t n_threads = std::max<int64_t>(1, std::thread::hardware_concurrency());
    n_threads = std::min(n_threads, std::max<int64_t>(1, n / 262144));
    auto work = [&](int64_t lo, int64_t hi) {
        for (int64_t p = lo; p < hi; ++p) {
            auto it = std::lower_bound(
                hay.begin(), hay.end(),
                std::make_pair(needles[p], int64_t(-1)));
            out_row[p] = (it != hay.end() && it->first == needles[p]) ? it->second
                                                                      : -1;
        }
    };
    if (n_threads <= 1) {
        work(0, n);
    } else {
        std::vector<std::thread> threads;
        int64_t step = (n + n_threads - 1) / n_threads;
        for (int64_t t = 0; t < n_threads; ++t)
            threads.emplace_back(work, t * step, std::min(n, (t + 1) * step));
        for (auto& th : threads) th.join();
    }
}

// ----------------------------------------------------------------------
// hi/lo float32 coordinate splitting (device staging)
// ----------------------------------------------------------------------

void split_hi_lo(const double* x, int64_t n, float* hi, float* lo) {
    int64_t n_threads = std::max<int64_t>(1, std::thread::hardware_concurrency());
    n_threads = std::min(n_threads, std::max<int64_t>(1, n / 1048576));
    auto work = [&](int64_t a, int64_t b) {
        for (int64_t i = a; i < b; ++i) {
            float h = static_cast<float>(x[i]);
            hi[i] = h;
            lo[i] = static_cast<float>(x[i] - static_cast<double>(h));
        }
    };
    if (n_threads <= 1) {
        work(0, n);
        return;
    }
    std::vector<std::thread> threads;
    int64_t step = (n + n_threads - 1) / n_threads;
    for (int64_t t = 0; t < n_threads; ++t)
        threads.emplace_back(work, t * step, std::min(n, (t + 1) * step));
    for (auto& th : threads) th.join();
}

}  // extern "C"
