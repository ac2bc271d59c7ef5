// graphcore: native host-side graph preprocessing for aero_gnn_tpu.
//
// The reference delegates its host preprocessing to numpy/torch; at
// production mesh sizes (10^6-10^8 edges) the per-batch lexsort and layout
// passes dominate input-pipeline latency. This library provides O(E + N)
// counting-sort based implementations, exposed through a plain C ABI
// consumed via ctypes (aero_gnn_tpu/graph/native.py), with the numpy code
// as the always-available fallback.
//
// Build: see native/build.sh (g++ -O3 -shared -fPIC).

#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Stable destination-major edge sort: permutation such that
// (receivers[perm], senders[perm]) is lexicographically ascending.
// Two-pass counting sort (sender key first, then receiver key) — stable,
// O(E + N), no comparisons.
void gc_sort_edges_by_receiver(const int32_t* senders,
                               const int32_t* receivers,
                               int64_t num_edges, int32_t num_nodes,
                               int32_t* perm_out) {
  std::vector<int64_t> count(static_cast<size_t>(num_nodes) + 1, 0);
  std::vector<int32_t> tmp(static_cast<size_t>(num_edges));

  // pass 1: stable counting sort by sender
  for (int64_t i = 0; i < num_edges; ++i) count[senders[i] + 1]++;
  for (int32_t v = 0; v < num_nodes; ++v) count[v + 1] += count[v];
  for (int64_t i = 0; i < num_edges; ++i)
    tmp[count[senders[i]]++] = static_cast<int32_t>(i);

  // pass 2: stable counting sort by receiver (applied to pass-1 order)
  std::fill(count.begin(), count.end(), 0);
  for (int64_t i = 0; i < num_edges; ++i) count[receivers[i] + 1]++;
  for (int32_t v = 0; v < num_nodes; ++v) count[v + 1] += count[v];
  for (int64_t i = 0; i < num_edges; ++i) {
    int32_t e = tmp[i];
    perm_out[count[receivers[e]]++] = e;
  }
}

// Stable argsort of an int32 key array with values in [0, num_keys).
void gc_argsort_i32(const int32_t* keys, int64_t n, int32_t num_keys,
                    int32_t* perm_out) {
  std::vector<int64_t> count(static_cast<size_t>(num_keys) + 1, 0);
  for (int64_t i = 0; i < n; ++i) count[keys[i] + 1]++;
  for (int32_t v = 0; v < num_keys; ++v) count[v + 1] += count[v];
  for (int64_t i = 0; i < n; ++i)
    perm_out[count[keys[i]]++] = static_cast<int32_t>(i);
}

// CSR row offsets from a sorted id stream: offsets[v] = first index with
// ids[i] >= v; offsets has num_segments + 1 entries.
void gc_csr_offsets(const int32_t* sorted_ids, int64_t n,
                    int32_t num_segments, int64_t* offsets_out) {
  int64_t i = 0;
  for (int32_t v = 0; v <= num_segments; ++v) {
    while (i < n && sorted_ids[i] < v) ++i;
    offsets_out[v] = i;
  }
}

// Block-aligned edge layout (the Pallas aggregation layout): given edges
// sorted by receiver, emit a row index per OUTPUT slot — either the source
// edge row, or -1 for an inserted pad slot — such that each
// node-block's range is a whole number of edge tiles and every block has
// at least one tile. Returns the number of output slots (call with
// out == nullptr to query the size first).
int64_t gc_align_blocks(const int32_t* receivers, int64_t num_edges,
                        int32_t num_nodes_pad, int32_t node_block,
                        int32_t edge_tile, int32_t* out_rows,
                        int32_t* out_tile_block, int32_t* out_tile_first,
                        int64_t* out_num_tiles) {
  int32_t n_blocks = num_nodes_pad / node_block;
  int64_t pos = 0;     // read cursor into the edge stream
  int64_t slot = 0;    // write cursor into the output layout
  int64_t tile = 0;
  for (int32_t b = 0; b < n_blocks; ++b) {
    int64_t start = pos;
    while (pos < num_edges && receivers[pos] / node_block == b) ++pos;
    int64_t cnt = pos - start;
    int64_t tiles = (cnt + edge_tile - 1) / edge_tile;
    if (tiles == 0) tiles = 1;
    int64_t total = tiles * edge_tile;
    if (out_rows != nullptr) {
      for (int64_t k = 0; k < total; ++k)
        out_rows[slot + k] =
            (k < cnt) ? static_cast<int32_t>(start + k) : -1;
      for (int64_t t = 0; t < tiles; ++t) {
        out_tile_block[tile + t] = b;
        out_tile_first[tile + t] = (t == 0) ? 1 : 0;
      }
    }
    slot += total;
    tile += tiles;
  }
  if (out_num_tiles != nullptr) *out_num_tiles = tile;
  return slot;
}

}  // extern "C"
