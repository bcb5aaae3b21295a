// Native host-side graph kit: spatial-hash k-NN and COO->ELL packing.
//
// The TPU owns all model compute (JAX/XLA/Pallas); these are the host-side
// graph-construction hot paths that would otherwise be O(N^2) NumPy
// (reference relies on PyG/CUDA for graph ops it never builds on host —
// our k-NN configs in BASELINE.json need a fast host builder).
//
// Build: g++ -O3 -march=native -shared -fPIC -o libgraphkit.so graphkit.cpp -lpthread
// Exposed via ctypes (bathymetric_gnn_tpu/native/__init__.py) with a NumPy
// fallback when the library is unavailable.

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// Exact k-nearest-neighbors over 2-D points using a uniform spatial hash.
// pos: [n, 2] float32, out_idx: [n, k] int32 (neighbor indices, self
// excluded; slots past the neighbor count filled with -1).
// Returns 0 on success.
int knn2d(const float* pos, int64_t n, int32_t k, int32_t* out_idx,
          int32_t n_threads) {
  if (n <= 0 || k <= 0) return 0;
  if (n_threads <= 0)
    n_threads = std::max(1u, std::thread::hardware_concurrency());

  // bounding box
  float minx = pos[0], maxx = pos[0], miny = pos[1], maxy = pos[1];
  for (int64_t i = 1; i < n; ++i) {
    minx = std::min(minx, pos[2 * i]);
    maxx = std::max(maxx, pos[2 * i]);
    miny = std::min(miny, pos[2 * i + 1]);
    maxy = std::max(maxy, pos[2 * i + 1]);
  }
  float w = std::max(maxx - minx, 1e-9f), h = std::max(maxy - miny, 1e-9f);
  // target ~2 points per cell
  int64_t target_cells = std::max<int64_t>(1, n / 2);
  float cell = std::sqrt((w * h) / (float)target_cells);
  if (!(cell > 0)) cell = 1.0f;
  int64_t gx = std::max<int64_t>(1, (int64_t)std::ceil(w / cell));
  int64_t gy = std::max<int64_t>(1, (int64_t)std::ceil(h / cell));
  // cap grid size
  while (gx * gy > 4 * n + 64) {
    cell *= 1.3f;
    gx = std::max<int64_t>(1, (int64_t)std::ceil(w / cell));
    gy = std::max<int64_t>(1, (int64_t)std::ceil(h / cell));
  }

  auto cell_of = [&](int64_t i) -> int64_t {
    int64_t cx = (int64_t)((pos[2 * i] - minx) / cell);
    int64_t cy = (int64_t)((pos[2 * i + 1] - miny) / cell);
    cx = std::min(cx, gx - 1);
    cy = std::min(cy, gy - 1);
    return cy * gx + cx;
  };

  // counting sort points into cells
  std::vector<int64_t> cell_start(gx * gy + 1, 0);
  std::vector<int32_t> order(n);
  for (int64_t i = 0; i < n; ++i) cell_start[cell_of(i) + 1]++;
  for (int64_t c = 0; c < gx * gy; ++c) cell_start[c + 1] += cell_start[c];
  {
    std::vector<int64_t> cursor(cell_start.begin(), cell_start.end() - 1);
    for (int64_t i = 0; i < n; ++i) order[cursor[cell_of(i)]++] = (int32_t)i;
  }

  auto worker = [&](int64_t lo, int64_t hi) {
    std::vector<std::pair<float, int32_t>> heap;  // max-heap by distance
    heap.reserve(k + 1);
    for (int64_t i = lo; i < hi; ++i) {
      heap.clear();
      float px = pos[2 * i], py = pos[2 * i + 1];
      int64_t cx = std::min((int64_t)((px - minx) / cell), gx - 1);
      int64_t cy = std::min((int64_t)((py - miny) / cell), gy - 1);
      // expand rings until k found and ring distance exceeds kth distance
      for (int64_t ring = 0;; ++ring) {
        bool any_cell = false;
        for (int64_t dy = -ring; dy <= ring; ++dy) {
          int64_t yy = cy + dy;
          if (yy < 0 || yy >= gy) continue;
          for (int64_t dx = -ring; dx <= ring; ++dx) {
            if (std::max(std::llabs(dx), std::llabs(dy)) != ring) continue;
            int64_t xx = cx + dx;
            if (xx < 0 || xx >= gx) continue;
            any_cell = true;
            int64_t c = yy * gx + xx;
            for (int64_t p = cell_start[c]; p < cell_start[c + 1]; ++p) {
              int32_t j = order[p];
              if ((int64_t)j == i) continue;
              float ddx = pos[2 * j] - px, ddy = pos[2 * j + 1] - py;
              float d2 = ddx * ddx + ddy * ddy;
              if ((int32_t)heap.size() < k) {
                heap.emplace_back(d2, j);
                std::push_heap(heap.begin(), heap.end());
              } else if (d2 < heap.front().first) {
                std::pop_heap(heap.begin(), heap.end());
                heap.back() = {d2, j};
                std::push_heap(heap.begin(), heap.end());
              }
            }
          }
        }
        // stop when the closest possible point in the NEXT ring cannot
        // beat our current kth distance
        if ((int32_t)heap.size() >= k) {
          float ring_dist = (float)ring * cell;  // conservative lower bound
          if (ring_dist * ring_dist > heap.front().first) break;
        }
        if (!any_cell && ring > (gx + gy)) break;  // exhausted grid
        if (ring > gx + gy) break;
      }
      std::sort_heap(heap.begin(), heap.end());
      int32_t m = (int32_t)heap.size();
      for (int32_t s = 0; s < k; ++s)
        out_idx[i * k + s] = s < m ? heap[s].second : -1;
    }
  };

  if (n_threads == 1 || n < 4096) {
    worker(0, n);
  } else {
    std::vector<std::thread> threads;
    int64_t chunk = (n + n_threads - 1) / n_threads;
    for (int t = 0; t < n_threads; ++t) {
      int64_t lo = t * chunk, hi = std::min<int64_t>(n, lo + chunk);
      if (lo >= hi) break;
      threads.emplace_back(worker, lo, hi);
    }
    for (auto& th : threads) th.join();
  }
  return 0;
}

// Pack dst-sorted COO edges into ELL slots.
// live edges: src[e], dst[e] (dst non-decreasing), n nodes, width k.
// outputs: nbr_src [n*k] int32 (0-filled), nbr_mask [n*k] uint8,
// slot_of_edge [e] int32 (the ELL slot each edge landed in, for attr
// scatter on the Python side). Returns max degree encountered (>k means
// overflow; extra edges dropped).
int32_t ell_pack(const int32_t* src, const int32_t* dst, int64_t e,
                 int64_t n, int32_t k, int32_t* nbr_src, uint8_t* nbr_mask,
                 int32_t* slot_of_edge) {
  std::memset(nbr_src, 0, sizeof(int32_t) * n * k);
  std::memset(nbr_mask, 0, sizeof(uint8_t) * n * k);
  std::vector<int32_t> deg(n, 0);
  int32_t maxdeg = 0;
  for (int64_t i = 0; i < e; ++i) {
    int32_t d = dst[i];
    if (d < 0 || d >= n) { slot_of_edge[i] = -1; continue; }
    int32_t s = deg[d]++;
    maxdeg = std::max(maxdeg, deg[d]);
    if (s < k) {
      nbr_src[(int64_t)d * k + s] = src[i];
      nbr_mask[(int64_t)d * k + s] = 1;
      slot_of_edge[i] = s;
    } else {
      slot_of_edge[i] = -1;
    }
  }
  return maxdeg;
}

}  // extern "C"
