// Native correspondence-graph traversal kernels.
//
// TPU-native framework runtime component (the counterpart of the reference's
// C++ scene/correspondence_graph.cc hot paths): breadth-first expansion over
// the CSR adjacency used by transitive-correspondence extraction
// (ref: pycolmap/scene/correspondence_graph.h:76-77) and track completion
// (upstream IncrementalTriangulator::Complete). These traversals are
// irreducibly serial per source node and dominate host time for large
// scenes, so they live in C++; arrays come in as raw pointers from numpy
// via ctypes (no Python API dependency).
//
// Build: cc -O3 -shared -fPIC graph_ops.cc -o libgraph_ops.so

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// BFS from `start` up to `transitivity` hops. Writes visited nodes
// (excluding start) into `out` (capacity out_cap); returns count.
// visited: caller-provided scratch of num_nodes bytes, zeroed on entry and
// re-zeroed on exit (touched entries only).
int64_t bfs_transitive(const int64_t* indptr, const int64_t* adj,
                       int64_t num_nodes, int64_t start, int32_t transitivity,
                       int64_t* out, int64_t out_cap, uint8_t* visited) {
  if (start < 0 || start >= num_nodes) return 0;
  std::vector<int64_t> frontier{start};
  std::vector<int64_t> next;
  visited[start] = 1;
  int64_t count = 0;
  for (int32_t hop = 0; hop < transitivity && !frontier.empty(); ++hop) {
    next.clear();
    for (int64_t node : frontier) {
      for (int64_t e = indptr[node]; e < indptr[node + 1]; ++e) {
        int64_t nb = adj[e];
        if (!visited[nb]) {
          visited[nb] = 1;
          if (count < out_cap) out[count] = nb;
          ++count;
          next.push_back(nb);
        }
      }
    }
    frontier.swap(next);
  }
  // reset scratch (only touched entries)
  visited[start] = 0;
  for (int64_t i = 0; i < (count < out_cap ? count : out_cap); ++i) {
    visited[out[i]] = 0;
  }
  // frontier/next nodes are all recorded in out already
  return count;
}

// Batched BFS from multiple seed nodes treated as one connected component
// (used by track completion: seeds = the track's current observations).
// eligible[node] != 0 marks nodes that may be traversed THROUGH and
// reported; ineligible nodes are recorded as blocked (not expanded).
// Returns number of reported nodes written to out (with their hop depth in
// out_depth).
int64_t bfs_component(const int64_t* indptr, const int64_t* adj,
                      int64_t num_nodes, const int64_t* seeds,
                      int64_t num_seeds, int32_t max_depth,
                      const uint8_t* eligible, int64_t* out,
                      int32_t* out_depth, int64_t out_cap, uint8_t* visited) {
  std::vector<int64_t> frontier;
  frontier.reserve(num_seeds);
  for (int64_t i = 0; i < num_seeds; ++i) {
    int64_t s = seeds[i];
    if (s >= 0 && s < num_nodes && !visited[s]) {
      visited[s] = 1;
      frontier.push_back(s);
    }
  }
  std::vector<int64_t> next;
  std::vector<int64_t> touched(frontier);
  int64_t count = 0;
  for (int32_t hop = 1; hop <= max_depth && !frontier.empty(); ++hop) {
    next.clear();
    for (int64_t node : frontier) {
      for (int64_t e = indptr[node]; e < indptr[node + 1]; ++e) {
        int64_t nb = adj[e];
        if (visited[nb]) continue;
        visited[nb] = 1;
        touched.push_back(nb);
        if (eligible[nb]) {
          if (count < out_cap) {
            out[count] = nb;
            out_depth[count] = hop;
          }
          ++count;
          next.push_back(nb);
        }
      }
    }
    frontier.swap(next);
  }
  for (int64_t node : touched) visited[node] = 0;
  return count;
}

// Track-completion candidate expansion (the hot loop of upstream
// IncrementalTriangulator::Complete): for every edge of the given source
// nodes, emit (target_node, source_pid) where the target keypoint is
// unlinked and its image registered — deduped by target, first pid wins.
// visited: num_nodes scratch, zero on entry, re-zeroed on exit.
int64_t expand_complete_candidates(
    const int64_t* indptr, const int64_t* adj, const int32_t* node_image,
    const int64_t* flat_pid, const uint8_t* reg_flag,
    const int64_t* src_nodes, int64_t n_src, int64_t* out_tgt,
    int64_t* out_pid, int64_t out_cap, uint8_t* visited) {
  int64_t count = 0;
  for (int64_t i = 0; i < n_src; ++i) {
    const int64_t node = src_nodes[i];
    const int64_t pid = flat_pid[node];
    for (int64_t e = indptr[node]; e < indptr[node + 1]; ++e) {
      const int64_t tgt = adj[e];
      if (visited[tgt]) continue;
      if (flat_pid[tgt] >= 0) continue;
      if (!reg_flag[node_image[tgt]]) continue;
      visited[tgt] = 1;
      if (count < out_cap) {
        out_tgt[count] = tgt;
        out_pid[count] = pid;
      }
      ++count;
    }
  }
  const int64_t n = count < out_cap ? count : out_cap;
  for (int64_t i = 0; i < n; ++i) visited[out_tgt[i]] = 0;
  return count;
}

// Merge candidate expansion (upstream MergeAllTracks): unique (min, max)
// point-id pairs joined by an edge whose two endpoints link different
// points. Dedup via sort of packed 64-bit codes (pids < 2^32).
int64_t expand_merge_pairs(
    const int64_t* indptr, const int64_t* adj, const int64_t* flat_pid,
    const int64_t* src_nodes, int64_t n_src, int64_t* out_codes,
    int64_t out_cap) {
  int64_t count = 0;
  for (int64_t i = 0; i < n_src; ++i) {
    const int64_t node = src_nodes[i];
    const int64_t spid = flat_pid[node];
    for (int64_t e = indptr[node]; e < indptr[node + 1]; ++e) {
      const int64_t tpid = flat_pid[adj[e]];
      if (tpid < 0 || tpid == spid) continue;
      const int64_t a = spid < tpid ? spid : tpid;
      const int64_t b = spid < tpid ? tpid : spid;
      if (count < out_cap) out_codes[count] = (a << 32) | b;
      ++count;
    }
  }
  const int64_t n = count < out_cap ? count : out_cap;
  std::sort(out_codes, out_codes + n);
  return std::unique(out_codes, out_codes + n) - out_codes;
}

}  // extern "C"
