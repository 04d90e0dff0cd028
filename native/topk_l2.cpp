// Brute-force exact L2 top-k — the C++ CPU reference implementation of the
// framework's retrieval kernel (cerebra/eval/retrieval.py), mirroring faiss
// IndexFlatL2 semantics (reference utils/Utilities.py:45-55): squared L2
// distances, ascending, ties broken by lower gallery index.
//
// Used for parity testing of the on-device JAX kernel and as a host-side
// fallback retrieval path. Multithreaded over queries (std::thread).
//
// Build: g++ -O3 -march=native -shared -fPIC -std=c++17 -pthread \
//            topk_l2.cpp -o libtopk_l2.so

#include <algorithm>
#include <cfloat>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct HeapEntry {
  float dist;
  int64_t idx;
};

// max-heap on dist so the worst kept neighbor is at the top
inline bool heap_less(const HeapEntry& a, const HeapEntry& b) {
  // "a is strictly better than b": nearer, ties broken by LOWER gallery
  // index (faiss IndexFlatL2 / jax.lax.top_k convention)
  if (a.dist != b.dist) return a.dist < b.dist;
  return a.idx < b.idx;
}

void search_rows(const float* gallery, const float* query,
                 const float* gallery_sq, int64_t ng, int64_t nq, int64_t dim,
                 int64_t k, int64_t row_begin, int64_t row_end,
                 float* out_dist, int64_t* out_idx) {
  std::vector<HeapEntry> heap;
  heap.reserve(k);
  for (int64_t q = row_begin; q < row_end; ++q) {
    const float* qv = query + q * dim;
    float q_sq = 0.f;
    for (int64_t d = 0; d < dim; ++d) q_sq += qv[d] * qv[d];

    heap.clear();
    for (int64_t g = 0; g < ng; ++g) {
      const float* gv = gallery + g * dim;
      float dot = 0.f;
      for (int64_t d = 0; d < dim; ++d) dot += qv[d] * gv[d];
      float dist = q_sq - 2.f * dot + gallery_sq[g];
      if (dist < 0.f) dist = 0.f;
      HeapEntry e{dist, g};
      if ((int64_t)heap.size() < k) {
        heap.push_back(e);
        std::push_heap(heap.begin(), heap.end(), heap_less);
      } else if (heap_less(e, heap.front())) {
        std::pop_heap(heap.begin(), heap.end(), heap_less);
        heap.back() = e;
        std::push_heap(heap.begin(), heap.end(), heap_less);
      }
    }
    std::sort_heap(heap.begin(), heap.end(), heap_less);
    for (int64_t j = 0; j < k; ++j) {
      if (j < (int64_t)heap.size()) {
        out_dist[q * k + j] = heap[j].dist;
        out_idx[q * k + j] = heap[j].idx;
      } else {  // k > ng: faiss pads with FLT_MAX / -1 (NOT -1.0 distance,
        // which would ascending-sort ahead of every real neighbor)
        out_dist[q * k + j] = FLT_MAX;
        out_idx[q * k + j] = -1;
      }
    }
  }
}

}  // namespace

extern "C" {

// gallery: (ng, dim) row-major float32; query: (nq, dim); outputs
// out_dist (nq, k) float32 and out_idx (nq, k) int64, ascending by distance.
void topk_l2(const float* gallery, const float* query, int64_t ng, int64_t nq,
             int64_t dim, int64_t k, float* out_dist, int64_t* out_idx,
             int32_t n_threads) {
  std::vector<float> gallery_sq(ng);
  for (int64_t g = 0; g < ng; ++g) {
    const float* gv = gallery + g * dim;
    float s = 0.f;
    for (int64_t d = 0; d < dim; ++d) s += gv[d] * gv[d];
    gallery_sq[g] = s;
  }
  if (n_threads <= 0)
    n_threads = (int32_t)std::max(1u, std::thread::hardware_concurrency());
  n_threads = (int32_t)std::min<int64_t>(n_threads, nq);
  if (n_threads <= 1) {
    search_rows(gallery, query, gallery_sq.data(), ng, nq, dim, k, 0, nq,
                out_dist, out_idx);
    return;
  }
  std::vector<std::thread> threads;
  int64_t chunk = (nq + n_threads - 1) / n_threads;
  for (int32_t t = 0; t < n_threads; ++t) {
    int64_t begin = t * chunk;
    int64_t end = std::min<int64_t>(begin + chunk, nq);
    if (begin >= end) break;
    threads.emplace_back(search_rows, gallery, query, gallery_sq.data(), ng,
                         nq, dim, k, begin, end, out_dist, out_idx);
  }
  for (auto& th : threads) th.join();
}

}  // extern "C"
