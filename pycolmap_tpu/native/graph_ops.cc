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

}  // extern "C"
