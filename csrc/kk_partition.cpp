// Karmarkar-Karp (largest-differencing-method) multiway partitioner —
// native host-side core for the workload-balanced batch shuffler.
//
// Counterpart of the reference's C++ partitioner
// (examples/commons/perf_model/csrc/kk_partition.cpp:44 and its Python twin
// perf_model/partitioner.py:85), exposed through a plain C ABI for ctypes
// (no pybind11 in this environment). Tie-breaking matches the reference's
// Set/State comparison rules so partitions are comparable run-to-run.
//
// Two entry points:
//   kk_partition  — true KK/LDM. per_part_cap > 0 selects the reference's
//                   `equal_size=True` mode (exactly ceil(n/k) items per
//                   part via k-item seed groups; zero-cost padding when n
//                   is not divisible by k).
//   lpt_partition — greedy longest-processing-time with a per-part
//                   cardinality cap. Cheaper (O(n log n)) but balances
//                   heavy-tailed loads worse than KK; kept as a fallback.

#include <algorithm>
#include <cstdint>
#include <queue>
#include <utility>
#include <vector>

namespace {

struct Set {
  int64_t sum = 0;
  std::vector<std::pair<int64_t, int64_t>> items;  // (idx, val)

  void add(int64_t idx, int64_t val) {
    items.emplace_back(idx, val);
    sum += val;
  }
  void merge_from(Set& other) {
    items.reserve(items.size() + other.items.size());
    for (auto& it : other.items) {
      items.push_back(it);
      sum += it.second;
    }
  }
  // Reference Set.__lt__: by sum, then item count, then lexicographic items.
  bool operator<(const Set& o) const {
    if (sum != o.sum) return sum < o.sum;
    if (items.size() != o.items.size()) return items.size() < o.items.size();
    return items < o.items;
  }
  bool operator>(const Set& o) const { return o < *this; }
};

struct State {
  std::vector<Set> sets;  // descending by Set ordering (sets[0] largest)

  explicit State(int k) : sets(k) {}

  void init_from(const std::vector<std::pair<int64_t, int64_t>>& items) {
    for (size_t i = 0; i < items.size(); ++i)
      sets[i].add(items[i].first, items[i].second);
    std::sort(sets.begin(), sets.end(), std::greater<Set>());
  }
  // KK merge: largest set pairs with the other state's smallest.
  void merge_with(State& other) {
    const int k = static_cast<int>(sets.size());
    for (int i = 0; i < k; ++i) sets[i].merge_from(other.sets[k - 1 - i]);
    std::sort(sets.begin(), sets.end(), std::greater<Set>());
  }
  int64_t spread() const { return sets.front().sum - sets.back().sum; }
  // Max-heap pops the state with the LARGEST spread first (reference
  // flips heapq's min-heap ordering the same way).
  bool operator<(const State& o) const {
    const int64_t a = spread(), b = o.spread();
    if (a != b) return a < b;
    return sets.front() < o.sets.front();
  }
};

}  // namespace

extern "C" {

// costs: [n] doubles (integral-valued cost estimates; truncated to int64
// for exact tie-breaking). assignment out: [n] int32; loads out: [k]
// doubles. per_part_cap > 0 => equal-size mode.
void kk_partition(const double* costs, int64_t n, int32_t k,
                  int64_t per_part_cap, int32_t* assignment,
                  double* loads_out) {
  const bool equal_size = per_part_cap > 0;

  // ascending (workload, idx), matching the reference's sorted() seed order
  std::vector<std::pair<int64_t, int64_t>> sorted_w;
  sorted_w.reserve(n);
  for (int64_t i = 0; i < n; ++i)
    sorted_w.emplace_back(static_cast<int64_t>(costs[i]), i);
  std::sort(sorted_w.begin(), sorted_w.end());

  if (equal_size && n % k != 0) {
    // zero-cost virtual items (idx < 0) pad n up to a multiple of k; they
    // sort first and are dropped from the output assignment
    const int64_t pad = k - (n % k);
    std::vector<std::pair<int64_t, int64_t>> padded;
    padded.reserve(n + pad);
    for (int64_t p = 0; p < pad; ++p) padded.emplace_back(0, -1 - p);
    for (auto& w : sorted_w) padded.push_back(w);
    std::sort(padded.begin(), padded.end(),
              [](const auto& a, const auto& b) {
                if (a.first != b.first) return a.first < b.first;
                return a.second < b.second;
              });
    sorted_w = std::move(padded);
  }

  std::vector<State> heap;
  const int64_t total = static_cast<int64_t>(sorted_w.size());
  if (equal_size) {
    heap.reserve(total / k);
    std::vector<std::pair<int64_t, int64_t>> group;
    group.reserve(k);
    for (int64_t off = 0; off < total; off += k) {
      group.clear();
      for (int32_t i = 0; i < k; ++i) {
        const auto& wi = sorted_w[off + i];
        group.emplace_back(wi.second, wi.first);  // (idx, val)
      }
      State s(k);
      s.init_from(group);
      heap.push_back(std::move(s));
    }
  } else {
    heap.reserve(total);
    std::vector<std::pair<int64_t, int64_t>> single(1);
    for (const auto& wi : sorted_w) {
      single[0] = {wi.second, wi.first};
      State s(k);
      s.init_from(single);
      heap.push_back(std::move(s));
    }
  }
  if (heap.empty()) {
    for (int32_t p = 0; p < k; ++p) loads_out[p] = 0.0;
    return;
  }
  std::make_heap(heap.begin(), heap.end());
  while (heap.size() > 1) {
    std::pop_heap(heap.begin(), heap.end());
    State s0 = std::move(heap.back());
    heap.pop_back();
    std::pop_heap(heap.begin(), heap.end());
    State s1 = std::move(heap.back());
    heap.pop_back();
    s0.merge_with(s1);
    heap.push_back(std::move(s0));
    std::push_heap(heap.begin(), heap.end());
  }

  State& fin = heap.front();
  for (int32_t p = 0; p < k; ++p) {
    double load = 0.0;
    for (const auto& iv : fin.sets[p].items) {
      if (iv.first >= 0) {
        assignment[iv.first] = p;
        load += costs[iv.first];
      }
    }
    loads_out[p] = load;
  }
}

// Greedy LPT with a per-part cardinality cap (equal sample counts per DP
// rank), binary-heap backed: O(n log n + n log k).
void lpt_partition(const double* costs, int64_t n, int32_t k,
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
