// Native host-RAM key/value store for embedding + KV-cache host tiers.
//
// Counterpart of the reference's native host storage runtimes
// (corelib/dynamicemb host/UVM storage tier, key_value_table.py:2107
// HybridStorage's host side; corelib/recsys_kvcache_manager C++ runtime
// src/runtime/export_kvcache_runtime.cpp) — the TPU framework keeps the
// device side in JAX arrays and backs evicted rows with this C++ store
// instead of per-key Python dict loops.
//
// Plain C ABI for ctypes (no pybind11 in this environment). Row payload is
// opaque bytes (row_bytes fixed per store); score is an int64 kept for
// score-filtered incremental dumps.

#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

struct Store {
  int64_t row_bytes;
  // key -> index into rows/scores (stable slots, free-list reuse)
  std::unordered_map<int64_t, int64_t> index;
  std::vector<uint8_t> rows;     // [capacity * row_bytes]
  std::vector<int64_t> scores;   // [capacity]
  std::vector<int64_t> keys;     // [capacity] (for dump iteration)
  std::vector<int64_t> free_slots;

  int64_t alloc_slot() {
    if (!free_slots.empty()) {
      int64_t s = free_slots.back();
      free_slots.pop_back();
      return s;
    }
    int64_t s = scores.size();
    rows.resize(rows.size() + row_bytes);
    scores.push_back(0);
    keys.push_back(0);
    return s;
  }
};

}  // namespace

extern "C" {

void* host_store_create(int64_t row_bytes) {
  auto* s = new Store();
  s->row_bytes = row_bytes;
  return s;
}

void host_store_destroy(void* h) { delete static_cast<Store*>(h); }

int64_t host_store_size(void* h) {
  return static_cast<Store*>(h)->index.size();
}

// Insert/overwrite n rows.
void host_store_put(void* h, const int64_t* ks, const uint8_t* rows,
                    const int64_t* scores, int64_t n) {
  auto* s = static_cast<Store*>(h);
  const int64_t rb = s->row_bytes;
  s->index.reserve(s->index.size() + n);
  for (int64_t i = 0; i < n; ++i) {
    auto it = s->index.find(ks[i]);
    int64_t slot;
    if (it == s->index.end()) {
      slot = s->alloc_slot();
      s->index.emplace(ks[i], slot);
      s->keys[slot] = ks[i];
    } else {
      slot = it->second;
    }
    std::memcpy(s->rows.data() + slot * rb, rows + i * rb, rb);
    s->scores[slot] = scores ? scores[i] : 0;
  }
}

// Fetch n rows; found[i]=1 and rows filled where present.
void host_store_get(void* h, const int64_t* ks, uint8_t* rows_out,
                    int64_t* scores_out, uint8_t* found, int64_t n) {
  auto* s = static_cast<Store*>(h);
  const int64_t rb = s->row_bytes;
  for (int64_t i = 0; i < n; ++i) {
    auto it = s->index.find(ks[i]);
    if (it == s->index.end()) {
      found[i] = 0;
      continue;
    }
    found[i] = 1;
    std::memcpy(rows_out + i * rb, s->rows.data() + it->second * rb, rb);
    if (scores_out) scores_out[i] = s->scores[it->second];
  }
}

void host_store_erase(void* h, const int64_t* ks, int64_t n) {
  auto* s = static_cast<Store*>(h);
  for (int64_t i = 0; i < n; ++i) {
    auto it = s->index.find(ks[i]);
    if (it == s->index.end()) continue;
    s->free_slots.push_back(it->second);
    s->index.erase(it);
  }
}

// Export up to max_out entries with score >= threshold, starting from
// internal slot `cursor`. Returns number written; updates *cursor for
// resumable batched dumps (reference: table_export_batch semantics).
int64_t host_store_export(void* h, int64_t threshold, int64_t* cursor,
                          int64_t max_out, int64_t* keys_out,
                          uint8_t* rows_out, int64_t* scores_out) {
  auto* s = static_cast<Store*>(h);
  const int64_t rb = s->row_bytes;
  int64_t written = 0;
  int64_t slot = *cursor;
  const int64_t end = s->scores.size();
  for (; slot < end && written < max_out; ++slot) {
    auto it = s->index.find(s->keys[slot]);
    if (it == s->index.end() || it->second != slot) continue;  // freed slot
    if (s->scores[slot] < threshold) continue;
    keys_out[written] = s->keys[slot];
    std::memcpy(rows_out + written * rb, s->rows.data() + slot * rb, rb);
    if (scores_out) scores_out[written] = s->scores[slot];
    ++written;
  }
  *cursor = slot;
  return written;
}

}  // extern "C"
