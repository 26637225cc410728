// Native host-side graph runtime for efficient_gnns_tpu.
//
// The reference delegates its host/graph-builder work to native code inside
// DGL ("create_formats_", arxiv_dgl/gat.py:56-71) and torch-cluster (the C++
// random_walk behind GraphSAINTRandomWalkSampler, mag_pyg/gnn.py:361-366).
// This library is the TPU build's equivalent: the O(E) preprocessing that
// runs before device upload — edge sorting, CSR offsets, bidirection dedup,
// Pallas edge-blocking layout, and GraphSAINT random-walk sampling — done in
// C++ instead of Python/NumPy, exposed to Python via ctypes
// (efficient_gnns_tpu/native/host.py), with a NumPy fallback when the
// shared library is not built.
//
// Build: `make -C native` (produces native/libgnns_host.so).
// All functions use plain C ABI with caller-allocated buffers.

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <random>
#include <thread>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Radix sort of edges by (key1=receiver, tie key2=sender): returns the
// permutation `order` such that (recv[order], send[order]) is lexsorted.
// Equivalent to np.lexsort((send, recv)) but ~5-10x faster at 10M+ edges.
// ---------------------------------------------------------------------------
void lexsort_edges(const int64_t* send, const int64_t* recv, int64_t n,
                   int64_t num_nodes, int64_t* order) {
  // LSD radix over the combined key recv * num_nodes + send is overflow-prone
  // for big graphs; instead sort by sender first (stable), then by receiver
  // (stable) — classic two-pass LSD over 16-bit digits.
  std::vector<int64_t> perm(n), tmp(n);
  for (int64_t i = 0; i < n; ++i) perm[i] = i;

  auto radix_pass_by = [&](const int64_t* key) {
    // stable LSD radix sort of `perm` by key[perm[i]], 16 bits per pass.
    int64_t maxv = 0;
    for (int64_t i = 0; i < n; ++i) maxv = std::max(maxv, key[i]);
    int passes = 1;
    while ((maxv >> (16 * passes)) > 0) ++passes;
    std::vector<int64_t> count(1 << 16);
    for (int p = 0; p < passes; ++p) {
      const int shift = 16 * p;
      std::fill(count.begin(), count.end(), 0);
      for (int64_t i = 0; i < n; ++i)
        ++count[(key[perm[i]] >> shift) & 0xFFFF];
      int64_t sum = 0;
      for (auto& c : count) { int64_t t = c; c = sum; sum += t; }
      for (int64_t i = 0; i < n; ++i)
        tmp[count[(key[perm[i]] >> shift) & 0xFFFF]++] = perm[i];
      std::swap(perm, tmp);
    }
  };

  radix_pass_by(send);
  radix_pass_by(recv);
  std::memcpy(order, perm.data(), n * sizeof(int64_t));
}

// ---------------------------------------------------------------------------
// CSR offsets over an ascending row array (padding rows >= num_rows ignored).
// offsets must hold num_rows + 1 int32s.
// ---------------------------------------------------------------------------
void csr_offsets(const int32_t* sorted_rows, int64_t n, int64_t num_rows,
                 int32_t* offsets) {
  std::vector<int64_t> counts(num_rows, 0);
  for (int64_t i = 0; i < n; ++i) {
    int64_t r = sorted_rows[i];
    if (r >= 0 && r < num_rows) ++counts[r];
  }
  offsets[0] = 0;
  for (int64_t r = 0; r < num_rows; ++r)
    offsets[r + 1] = offsets[r] + static_cast<int32_t>(counts[r]);
}

// ---------------------------------------------------------------------------
// Bidirection with dedup (DGL to_bidirected semantics): writes the unique
// symmetrized edge list. Returns the number of unique edges (call once with
// out_* null to size, or rely on <= 2n bound).
// ---------------------------------------------------------------------------
int64_t to_bidirected(const int64_t* send, const int64_t* recv, int64_t n,
                      int64_t* out_send, int64_t* out_recv) {
  std::vector<std::pair<int64_t, int64_t>> edges;
  edges.reserve(2 * n);
  for (int64_t i = 0; i < n; ++i) {
    edges.emplace_back(send[i], recv[i]);
    edges.emplace_back(recv[i], send[i]);
  }
  std::sort(edges.begin(), edges.end());
  edges.erase(std::unique(edges.begin(), edges.end()), edges.end());
  if (out_send && out_recv) {
    for (size_t i = 0; i < edges.size(); ++i) {
      out_send[i] = edges[i].first;
      out_recv[i] = edges[i].second;
    }
  }
  return static_cast<int64_t>(edges.size());
}

// ---------------------------------------------------------------------------
// Edge blocking for the Pallas segment-matmul kernel (graphs/blocking.py).
// Inputs are the receiver-sorted padded edge arrays. Two-phase API:
//   blocking_size(...)  -> number of blocks nb
//   blocking_fill(...)  -> writes tile_idx[nb], first_flag[nb],
//                          edge_id[nb*eb], src[nb*eb], dst_local[nb*eb]
// ---------------------------------------------------------------------------
int64_t blocking_size(const int32_t* recv, int64_t e_pad, int64_t num_nodes,
                      int64_t tm, int64_t eb) {
  int64_t e = 0;
  while (e < e_pad && recv[e] < num_nodes) ++e;
  const int64_t num_tiles = (num_nodes + tm - 1) / tm;
  std::vector<int64_t> counts(num_tiles, 0);
  for (int64_t i = 0; i < e; ++i) ++counts[recv[i] / tm];
  int64_t nb = 0;
  for (int64_t t = 0; t < num_tiles; ++t)
    nb += std::max<int64_t>(1, (counts[t] + eb - 1) / eb);
  return nb;
}

void blocking_fill(const int32_t* send, const int32_t* recv, int64_t e_pad,
                   int64_t num_nodes, int64_t num_edges_padded, int64_t tm,
                   int64_t eb, int32_t* tile_idx, int32_t* first_flag,
                   int32_t* edge_id, int32_t* src, int32_t* dst_local) {
  int64_t e = 0;
  while (e < e_pad && recv[e] < num_nodes) ++e;
  const int64_t num_tiles = (num_nodes + tm - 1) / tm;
  std::vector<int64_t> counts(num_tiles, 0);
  for (int64_t i = 0; i < e; ++i) ++counts[recv[i] / tm];

  int64_t b = 0;       // block cursor
  int64_t edge_lo = 0; // first edge of the current tile
  for (int64_t t = 0; t < num_tiles; ++t) {
    const int64_t cnt = counts[t];
    const int64_t nblk = std::max<int64_t>(1, (cnt + eb - 1) / eb);
    for (int64_t k = 0; k < nblk; ++k, ++b) {
      tile_idx[b] = static_cast<int32_t>(t);
      first_flag[b] = (k == 0) ? 1 : 0;
      const int64_t base = b * eb;
      const int64_t lo = edge_lo + k * eb;
      const int64_t hi = std::min(edge_lo + cnt, lo + eb);
      int64_t j = base;
      for (int64_t i = lo; i < hi; ++i, ++j) {
        edge_id[j] = static_cast<int32_t>(i);
        src[j] = send[i];
        dst_local[j] = recv[i] - static_cast<int32_t>(t * tm);
      }
      for (; j < base + eb; ++j) {
        edge_id[j] = static_cast<int32_t>(num_edges_padded);
        src[j] = 0;
        dst_local[j] = static_cast<int32_t>(tm);
      }
    }
    edge_lo += cnt;
  }
}

// ---------------------------------------------------------------------------
// GraphSAINT random-walk sampling (torch-cluster random_walk equivalent,
// reference mag_pyg/gnn.py:361-366): from each of `num_roots` roots, walk
// `walk_length` steps over out-edges in CSR; writes all visited node ids
// (roots included) to nodes[num_roots * (walk_length + 1)]. Caller dedups /
// induces the subgraph. Deterministic per seed. Parallelized over roots.
// ---------------------------------------------------------------------------
void random_walks(const int32_t* offsets, const int32_t* nbrs,
                  int64_t num_nodes, const int32_t* roots, int64_t num_roots,
                  int64_t walk_length, uint64_t seed, int32_t* nodes) {
  const int64_t stride = walk_length + 1;
  int nthreads = std::min<int64_t>(std::thread::hardware_concurrency(),
                                   std::max<int64_t>(1, num_roots / 4096));
  nthreads = std::max(1, nthreads);
  auto work = [&](int tid) {
    const int64_t lo = num_roots * tid / nthreads;
    const int64_t hi = num_roots * (tid + 1) / nthreads;
    std::mt19937_64 rng(seed * 0x9E3779B97F4A7C15ULL + tid);
    for (int64_t w = lo; w < hi; ++w) {
      int32_t cur = roots[w];
      nodes[w * stride] = cur;
      for (int64_t s = 0; s < walk_length; ++s) {
        const int32_t deg = offsets[cur + 1] - offsets[cur];
        if (deg > 0) {
          const int32_t pick =
              static_cast<int32_t>(rng() % static_cast<uint64_t>(deg));
          cur = nbrs[offsets[cur] + pick];
        }
        nodes[w * stride + s + 1] = cur;
      }
    }
  };
  if (nthreads == 1) {
    work(0);
  } else {
    std::vector<std::thread> threads;
    for (int t = 0; t < nthreads; ++t) threads.emplace_back(work, t);
    for (auto& th : threads) th.join();
  }
}

// ---------------------------------------------------------------------------
// Induced-subgraph edge filter: given global edges and a relabel map
// (relabel[v] = local id or -1), writes relabeled kept edges; returns count.
// ---------------------------------------------------------------------------
int64_t filter_relabel_edges(const int64_t* send, const int64_t* recv,
                             int64_t n, const int64_t* relabel,
                             int64_t* out_send, int64_t* out_recv) {
  int64_t k = 0;
  for (int64_t i = 0; i < n; ++i) {
    const int64_t s = relabel[send[i]];
    const int64_t r = relabel[recv[i]];
    if (s >= 0 && r >= 0) {
      out_send[k] = s;
      out_recv[k] = r;
      ++k;
    }
  }
  return k;
}

}  // extern "C"
