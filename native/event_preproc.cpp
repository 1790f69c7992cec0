// Native event-preprocessing engine (host-side hot path).
//
// Role parity: the reference spends minutes building per-pixel event chains
// with Python dicts (nerf/provider.py:1146-1219) and uses numba for window
// refinement (utils/event_utils.py:325-386).  This library does the bulk
// O(N) work in C++: pixel-major/time-stable counting sort, per-pixel group
// tables, successor counts, and ms_to_idx construction.  Exposed as a C ABI
// consumed via ctypes (enerf_tpu/data/native_events.py), with a numpy
// fallback when the shared object is missing.
//
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <cstdint>
#include <cstring>
#include <vector>
#include <algorithm>

extern "C" {

// Sort events pixel-major (y*W+x), time-stable within pixel, and emit group
// tables.  Inputs are parallel arrays of length n.  frame_ids gives the
// training-interval id per event (events never regroup across frames).
//
// Outputs (caller-allocated):
//   order:   [n]  permutation such that sorted = arr[order]
//   out_group_id: [n] dense group index per sorted event
// Returns the number of groups.
int64_t sort_events_by_pixel(
    const float* xs, const float* ys, const double* ts,
    const int32_t* frame_ids, int64_t n, int32_t W, int32_t H,
    int64_t* order, int64_t* out_group_id) {
  // key = frame * (W*H) + pixel
  std::vector<int64_t> key(n);
  int32_t max_frame = 0;
  for (int64_t i = 0; i < n; ++i) {
    int64_t px = (int64_t)ys[i] * W + (int64_t)xs[i];
    key[i] = (int64_t)frame_ids[i] * (int64_t)W * H + px;
    if (frame_ids[i] > max_frame) max_frame = frame_ids[i];
  }
  const int64_t n_keys = (int64_t)(max_frame + 1) * W * H;

  bool time_sorted = true;
  for (int64_t i = 1; i < n; ++i) {
    if (ts[i] < ts[i - 1]) { time_sorted = false; break; }
  }
  if (time_sorted && n_keys <= (int64_t)1 << 28) {
    // O(N + K) stable counting sort by key: the event stream is already
    // globally time-sorted, so stability preserves per-pixel time order.
    std::vector<int64_t> count(n_keys + 1, 0);
    for (int64_t i = 0; i < n; ++i) count[key[i] + 1]++;
    for (int64_t k = 0; k < n_keys; ++k) count[k + 1] += count[k];
    std::vector<int64_t> cursor(count.begin(), count.end() - 1);
    for (int64_t i = 0; i < n; ++i) order[cursor[key[i]]++] = i;
  } else {
    for (int64_t i = 0; i < n; ++i) order[i] = i;
    std::stable_sort(order, order + n, [&](int64_t a, int64_t b) {
      if (key[a] != key[b]) return key[a] < key[b];
      return ts[a] < ts[b];
    });
  }

  int64_t groups = 0;
  for (int64_t i = 0; i < n; ++i) {
    if (i == 0 || key[order[i]] != key[order[i - 1]]) ++groups;
    out_group_id[i] = groups - 1;
  }
  return groups;
}

// Per-group counts/offsets + per-event successor counts over SORTED events.
void group_tables(const int64_t* group_id, int64_t n, int64_t n_groups,
                  int64_t* counts, int64_t* offsets, int64_t* num_succ) {
  std::memset(counts, 0, sizeof(int64_t) * n_groups);
  for (int64_t i = 0; i < n; ++i) counts[group_id[i]]++;
  int64_t acc = 0;
  for (int64_t g = 0; g < n_groups; ++g) {
    offsets[g] = acc;
    acc += counts[g];
  }
  for (int64_t i = 0; i < n; ++i) {
    int64_t g = group_id[i];
    num_succ[i] = offsets[g] + counts[g] - i - 1;
  }
}

// ms_to_idx table over sorted timestamps (event_utils.py:389-407).
// tick = timestamp units per table entry (1e6 for ns, 1e3 for us).
int64_t ms_to_idx(const double* ts, int64_t n, double tick, int64_t* out,
                  int64_t out_capacity) {
  if (n == 0) return 0;
  int64_t ms_end = (int64_t)(ts[n - 1] / tick);
  int64_t m = ms_end + 1;
  if (m > out_capacity) return -1;
  int64_t idx = 0;
  for (int64_t ms = 0; ms < m; ++ms) {
    double t_target = (double)ms * tick;
    while (idx < n && ts[idx] < t_target) ++idx;
    out[ms] = idx;
  }
  return m;
}

// Exact window refinement within a sorted time array:
// returns [idx_start, idx_end) with t_start <= ts[i] < t_end.
void window_indices(const double* ts, int64_t n, double t_start, double t_end,
                    int64_t* idx_start, int64_t* idx_end) {
  const double* lo = std::lower_bound(ts, ts + n, t_start);
  const double* hi = std::lower_bound(ts, ts + n, t_end);
  *idx_start = lo - ts;
  *idx_end = hi - ts;
}

}  // extern "C"
