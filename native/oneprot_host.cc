// oneprot_host: native host-side data kernels for the TPU input pipeline.
//
// The reference's host hot loop is per-batch collate work — tokenization,
// graph building, MSA subselection (SURVEY §3.5). These are the C++
// implementations behind oneprot_tpu/native (ctypes bindings, numpy-backed
// buffers, releasing the GIL by construction since calls are pure C):
//
//   - batch character tokenization (ESM2-style: cls + LUT(chars) + eos + pad)
//   - kNN-within-cutoff neighbor lists for residue graphs
//     (replaces the O(N^2) numpy argpartition path in data/utils/graphs.py)
//   - greedy max-hamming-diversity MSA row selection
//     (reference src/data/utils/msa_utils.py:21-40 semantics)
//
// Build: `make native` (g++ -O3 -shared -fPIC).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Tokenization
// ---------------------------------------------------------------------------

// lut: 256 int32 entries mapping byte -> token id (unk where unmapped).
// seqs: concatenated bytes; offsets: n+1 prefix offsets into seqs.
// out: [n, pad_to] int32, prefilled by callee with pad_id.
void tokenize_batch(const uint8_t* seqs, const int64_t* offsets, int32_t n,
                    const int32_t* lut, int32_t cls_id, int32_t eos_id,
                    int32_t pad_id, int32_t max_len, int32_t pad_to,
                    int32_t* out) {
  for (int32_t i = 0; i < n; ++i) {
    int32_t* row = out + static_cast<int64_t>(i) * pad_to;
    for (int32_t j = 0; j < pad_to; ++j) row[j] = pad_id;
    int64_t start = offsets[i];
    int64_t len = offsets[i + 1] - start;
    int32_t body_cap = std::min<int32_t>(max_len, pad_to) - 2;
    if (body_cap < 0) body_cap = 0;
    int32_t body = static_cast<int32_t>(std::min<int64_t>(len, body_cap));
    row[0] = cls_id;
    for (int32_t j = 0; j < body; ++j) {
      row[1 + j] = lut[seqs[start + j]];
    }
    row[1 + body] = eos_id;
  }
}

// ---------------------------------------------------------------------------
// kNN neighbors within cutoff (residue graphs)
// ---------------------------------------------------------------------------

void knn_neighbors(const float* coords, int32_t n, int32_t k, float cutoff,
                   int32_t* idx_out, float* mask_out) {
  const float cutoff2 = cutoff * cutoff;
  std::vector<std::pair<float, int32_t>> cand;
  cand.reserve(n);
  for (int32_t i = 0; i < n; ++i) {
    cand.clear();
    const float xi = coords[3 * i], yi = coords[3 * i + 1],
                zi = coords[3 * i + 2];
    for (int32_t j = 0; j < n; ++j) {
      if (j == i) continue;
      const float dx = coords[3 * j] - xi;
      const float dy = coords[3 * j + 1] - yi;
      const float dz = coords[3 * j + 2] - zi;
      cand.emplace_back(dx * dx + dy * dy + dz * dz, j);
    }
    const int32_t k_eff = std::min<int32_t>(k, static_cast<int32_t>(cand.size()));
    std::partial_sort(cand.begin(), cand.begin() + k_eff, cand.end());
    for (int32_t s = 0; s < k; ++s) {
      if (s < k_eff) {
        idx_out[static_cast<int64_t>(i) * k + s] = cand[s].second;
        mask_out[static_cast<int64_t>(i) * k + s] =
            cand[s].first <= cutoff2 ? 1.0f : 0.0f;
      } else {
        idx_out[static_cast<int64_t>(i) * k + s] = 0;
        mask_out[static_cast<int64_t>(i) * k + s] = 0.0f;
      }
    }
  }
}

// ---------------------------------------------------------------------------
// Greedy max-hamming MSA subselection (msa_utils.py:21-40 semantics)
// ---------------------------------------------------------------------------

// msa: [rows, cols] bytes. out_indices: num_seqs slots. mode: 1=max, 0=min.
void greedy_select(const uint8_t* msa, int32_t rows, int32_t cols,
                   int32_t num_seqs, int32_t mode, int32_t* out_indices) {
  if (num_seqs >= rows) {
    for (int32_t i = 0; i < rows; ++i) out_indices[i] = i;
    return;
  }
  std::vector<double> dist_sum(rows, 0.0);
  std::vector<uint8_t> selected(rows, 0);
  std::vector<int32_t> picks;
  picks.reserve(num_seqs);
  picks.push_back(0);
  selected[0] = 1;
  for (int32_t step = 1; step < num_seqs; ++step) {
    const uint8_t* last = msa + static_cast<int64_t>(picks.back()) * cols;
    for (int32_t r = 0; r < rows; ++r) {
      if (selected[r]) continue;
      const uint8_t* row = msa + static_cast<int64_t>(r) * cols;
      int32_t diff = 0;
      for (int32_t c = 0; c < cols; ++c) diff += (row[c] != last[c]);
      dist_sum[r] += static_cast<double>(diff) / cols;
    }
    int32_t best = -1;
    double best_val = mode ? -std::numeric_limits<double>::infinity()
                           : std::numeric_limits<double>::infinity();
    for (int32_t r = 0; r < rows; ++r) {
      if (selected[r]) continue;
      const double mean_dist = dist_sum[r] / picks.size();
      if ((mode && mean_dist > best_val) || (!mode && mean_dist < best_val)) {
        best_val = mean_dist;
        best = r;
      }
    }
    picks.push_back(best);
    selected[best] = 1;
  }
  std::sort(picks.begin(), picks.end());
  for (int32_t i = 0; i < num_seqs; ++i) out_indices[i] = picks[i];
}

}  // extern "C"
