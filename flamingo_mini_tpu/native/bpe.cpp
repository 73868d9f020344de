// Native BPE merge engine.
//
// The byte-level BPE merge loop is the host-side hot path of serving
// (tokenizing batches of prompts/captions); this implements it over interned
// integer symbols so the C++ side never touches strings:
//
//   * Python interns every vocab token to its vocab id;
//   * the merge table arrives as (id_left, id_right, id_merged) triples in
//     rank order;
//   * encode() takes a word as a sequence of single-byte-token ids and
//     repeatedly merges the lowest-rank adjacent pair — bit-identical to the
//     Python/HF algorithm, ~20x faster on cache-miss words.
//
// Exposed as a plain C ABI for ctypes (no pybind11 dependency).
#include <cstdint>
#include <cstddef>
#include <climits>
#include <unordered_map>
#include <vector>

namespace {

struct PairHash {
  size_t operator()(const std::pair<int64_t, int64_t>& p) const {
    return std::hash<int64_t>()(p.first * 1000003LL + p.second);
  }
};

struct Bpe {
  // (left, right) -> (rank, merged)
  std::unordered_map<std::pair<int64_t, int64_t>, std::pair<int64_t, int64_t>,
                     PairHash>
      merges;
};

}  // namespace

extern "C" {

void* bpe_new(int64_t n_merges, const int64_t* lefts, const int64_t* rights,
              const int64_t* merged) {
  auto* b = new Bpe();
  b->merges.reserve(static_cast<size_t>(n_merges) * 2);
  for (int64_t r = 0; r < n_merges; ++r) {
    b->merges.emplace(std::make_pair(lefts[r], rights[r]),
                      std::make_pair(r, merged[r]));
  }
  return b;
}

void bpe_free(void* handle) { delete static_cast<Bpe*>(handle); }

// Encode one word (sequence of symbol ids). Returns the output length, or
// -1 if the output buffer is too small. In-place-safe (out may alias in).
int64_t bpe_encode(void* handle, const int64_t* in, int64_t n_in, int64_t* out,
                   int64_t cap) {
  const Bpe* b = static_cast<Bpe*>(handle);
  std::vector<int64_t> word(in, in + n_in);

  while (word.size() >= 2) {
    int64_t best_rank = INT64_MAX;
    size_t best_i = 0;
    int64_t best_merged = -1;
    for (size_t i = 0; i + 1 < word.size(); ++i) {
      auto it = b->merges.find({word[i], word[i + 1]});
      if (it != b->merges.end() && it->second.first < best_rank) {
        best_rank = it->second.first;
        best_i = i;
        best_merged = it->second.second;
      }
    }
    if (best_merged < 0) break;
    // merge ALL (non-overlapping) occurrences of the best pair, left to
    // right — the GPT-2 algorithm's inner loop
    const int64_t a = word[best_i];
    const int64_t c = word[best_i + 1];
    std::vector<int64_t> next;
    next.reserve(word.size());
    for (size_t i = 0; i < word.size();) {
      if (i + 1 < word.size() && word[i] == a && word[i + 1] == c) {
        next.push_back(best_merged);
        i += 2;
      } else {
        next.push_back(word[i]);
        ++i;
      }
    }
    word.swap(next);
  }

  if (static_cast<int64_t>(word.size()) > cap) return -1;
  for (size_t i = 0; i < word.size(); ++i) out[i] = word[i];
  return static_cast<int64_t>(word.size());
}

// Batch API: encode n words laid out back-to-back.
//   in: concatenated symbols; in_lens[i] = length of word i
//   out: concatenated results; out_lens[i] = result length of word i
// Returns total output length, or -1 on overflow.
int64_t bpe_encode_batch(void* handle, const int64_t* in,
                         const int64_t* in_lens, int64_t n_words, int64_t* out,
                         int64_t* out_lens, int64_t cap) {
  int64_t in_off = 0, out_off = 0;
  for (int64_t w = 0; w < n_words; ++w) {
    int64_t n = bpe_encode(handle, in + in_off, in_lens[w], out + out_off,
                           cap - out_off);
    if (n < 0) return -1;
    out_lens[w] = n;
    in_off += in_lens[w];
    out_off += n;
  }
  return out_off;
}

}  // extern "C"
