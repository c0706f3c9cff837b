// Native jagged-batch assembler — the per-step host hot loop of the data
// pipeline (slice per-user windows, truncate, pack, derive candidate
// labels) in C++.
//
// Counterpart of the reference's native dataloading path (the reference
// feeds TorchRec KJTs assembled by C++-backed dataloader workers and
// custom ops, e.g. examples/commons/ops/cuda_ops/csrc/kjt_aux_op.cpp);
// here the output is the packed jagged layout consumed by HSTUBatch.
// Plain C ABI for ctypes.

#include <algorithm>
#include <cstdint>

extern "C" {

// Returns total packed tokens, or -1 if token_capacity would overflow.
// action_ids may be null. labels_out sized [batch * max_cand].
int64_t assemble_batch(
    const int64_t* item_ids, const int64_t* action_ids,
    const int64_t* offsets, const int64_t* uids, int64_t batch,
    int32_t train, int32_t eval_holdout, int32_t max_hist, int32_t max_cand,
    int64_t token_capacity, int64_t label_threshold,
    int64_t* iv_out, int64_t* av_out, int32_t* lens_out, int32_t* ncand_out,
    int32_t* labels_out, int32_t* lab_len_out) {
  int64_t pos = 0;
  const int64_t window = (int64_t)max_hist + max_cand;
  for (int64_t j = 0; j < batch; ++j) {
    const int64_t u = uids[j];
    int64_t s = offsets[u];
    int64_t e = offsets[u + 1];
    if (train) e -= eval_holdout;
    if (e < s) e = s;
    if (e - s > window) s = e - window;  // truncate oldest
    const int64_t n = e - s;
    if (pos + n > token_capacity) return -1;
    const int32_t nc =
        (int32_t)std::min<int64_t>(max_cand, std::max<int64_t>(n - 1, 0));
    for (int64_t t = 0; t < n; ++t) iv_out[pos + t] = item_ids[s + t];
    if (action_ids) {
      for (int64_t t = 0; t < n; ++t) av_out[pos + t] = action_ids[s + t];
    }
    lens_out[j] = (int32_t)n;
    ncand_out[j] = nc;
    lab_len_out[j] = 0;
    if (nc > 0 && action_ids) {
      for (int32_t c = 0; c < nc; ++c) {
        labels_out[j * max_cand + c] =
            action_ids[e - nc + c] >= label_threshold ? 1 : 0;
      }
      lab_len_out[j] = nc;
    }
    pos += n;
  }
  return pos;
}

}  // extern "C"
