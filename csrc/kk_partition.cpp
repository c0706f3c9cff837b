// Karmarkar-Karp / LPT multiway partitioner — native host-side core for the
// workload-balanced batch shuffler.
//
// Counterpart of the reference's C++ partitioner
// (examples/commons/perf_model/csrc/kk_partition.cpp) exposed through a
// plain C ABI for ctypes (no pybind11 in this environment).
//
// Greedy LPT with a per-part cardinality cap (equal sample counts per DP
// rank), binary-heap backed: O(n log n + n log k).

#include <algorithm>
#include <cstdint>
#include <queue>
#include <vector>

extern "C" {

// costs: [n] doubles; assignment out: [n] int32; loads out: [k] doubles.
// per_part_cap: max items per part (0 = unlimited).
void kk_partition(const double* costs, int64_t n, int32_t k,
                  int64_t per_part_cap, int32_t* assignment,
                  double* loads_out) {
  std::vector<int64_t> order(n);
  for (int64_t i = 0; i < n; ++i) order[i] = i;
  std::sort(order.begin(), order.end(),
            [&](int64_t a, int64_t b) { return costs[a] > costs[b]; });

  using Item = std::pair<double, int32_t>;  // (load, part)
  std::priority_queue<Item, std::vector<Item>, std::greater<Item>> heap;
  for (int32_t p = 0; p < k; ++p) heap.push({0.0, p});
  std::vector<int64_t> counts(k, 0);
  std::vector<double> loads(k, 0.0);
  std::vector<Item> spill;

  for (int64_t oi = 0; oi < n; ++oi) {
    int64_t idx = order[oi];
    Item it = heap.top();
    heap.pop();
    while (per_part_cap > 0 && counts[it.second] >= per_part_cap) {
      spill.push_back(it);
      it = heap.top();
      heap.pop();
    }
    assignment[idx] = it.second;
    counts[it.second] += 1;
    loads[it.second] += costs[idx];
    heap.push({loads[it.second], it.second});
    for (const auto& s : spill) heap.push(s);
    spill.clear();
  }
  for (int32_t p = 0; p < k; ++p) loads_out[p] = loads[p];
}

}  // extern "C"
