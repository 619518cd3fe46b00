// Native partial-order-alignment consensus, threaded over clusters.
//
// Role of the reference's abPOA call (run_poa, caller.cpp:257-308): global
// convex-gap (dual affine piece) alignment of each subread into a growing
// DAG, heaviest-bundle consensus. This is a bit-exact reimplementation of
// the framework's host oracle (svdss_tpu/ops/poa.py) — same scores, same
// DP recurrences, same traceback tie-break order, same merge and consensus
// selection — so results are byte-identical to the Python path while the
// scalar DP inner loop runs ~100x faster and clusters fan out across a
// thread pool (the reference's omp-over-clusters, caller.cpp:312).
//
// C ABI (ctypes):
//   int svdss_poa_batch(const uint8_t* seqs, const int64_t* seq_offsets,
//                       int64_t n_seqs, const int64_t* cluster_offsets,
//                       int64_t n_clusters, int threads,
//                       uint8_t* out_buf, int32_t* out_len);
//
// seqs: concatenated sequence bytes; sequence j occupies
// [seq_offsets[j], seq_offsets[j+1]). Cluster i owns sequences
// [cluster_offsets[i], cluster_offsets[i+1]). The consensus of cluster i
// is written at out_buf + seq_offsets[cluster's first sequence] (consensus
// length never exceeds the cluster's total input bytes); its length goes
// to out_len[i]. Returns 0, or 1 on an internal invariant failure.

#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr int32_t NEG = -100000000;  // poa.py NEG = -(10**8)
constexpr int32_t MATCH = 2, MISMATCH = -4;
constexpr int32_t GO = 4, GE = 2, GO2 = 24, GE2 = 1;
constexpr int32_t OE = GO + GE, OE2 = GO2 + GE2;

struct Graph {
  std::vector<char> base;
  std::vector<std::vector<int>> preds, succs;
  std::vector<std::vector<int>> succ_w;  // edge weight, aligned with succs
  std::vector<int> node_w;
  std::vector<int> column;
  std::vector<std::vector<int>> col_nodes;
  std::vector<int> starts, ends;
  std::vector<int> start_w;  // per node (0 when never a start)
  std::vector<char> is_start, is_end;

  int new_node(char b, int col) {
    int idx = (int)base.size();
    base.push_back(b);
    preds.emplace_back();
    succs.emplace_back();
    succ_w.emplace_back();
    node_w.push_back(0);
    if (col < 0) {
      col = (int)col_nodes.size();
      col_nodes.emplace_back();
    }
    column.push_back(col);
    col_nodes[col].push_back(idx);
    start_w.push_back(0);
    is_start.push_back(0);
    is_end.push_back(0);
    return idx;
  }

  void add_edge(int u, int v) {
    if (u < 0) return;
    size_t i = 0;
    for (; i < succs[u].size(); ++i)
      if (succs[u][i] == v) break;
    if (i == succs[u].size()) {
      succs[u].push_back(v);
      succ_w[u].push_back(0);
      preds[v].push_back(u);
    }
    succ_w[u][i] += 1;
  }

  // Kahn's with a LIFO stack seeded in increasing index order (poa.py
  // topo_order: stack.pop() takes the last element)
  bool topo_order(std::vector<int> &order) const {
    int n = (int)base.size();
    std::vector<int> indeg(n);
    for (int i = 0; i < n; ++i) indeg[i] = (int)preds[i].size();
    std::vector<int> stack;
    for (int i = 0; i < n; ++i)
      if (indeg[i] == 0) stack.push_back(i);
    order.clear();
    order.reserve(n);
    while (!stack.empty()) {
      int v = stack.back();
      stack.pop_back();
      order.push_back(v);
      for (int s : succs[v])
        if (--indeg[s] == 0) stack.push_back(s);
    }
    return (int)order.size() == n;
  }

  void add_first(const uint8_t *seq, int64_t len) {
    int prev = -1;
    for (int64_t i = 0; i < len; ++i) {
      int v = new_node((char)seq[i], -1);
      node_w[v] += 1;
      if (prev >= 0) {
        add_edge(prev, v);
      } else {
        starts.push_back(v);
        is_start[v] = 1;
        start_w[v] += 1;
      }
      prev = v;
    }
    if (prev >= 0) {
      ends.push_back(prev);
      is_end[prev] = 1;
    }
  }
};

// one traceback element: node (or -1) aligned to seqpos (or -1)
struct Step {
  int node, spos;
};

// Global convex-gap alignment of seq against the DAG; traceback into path.
// Mirrors poa.py _align_to_graph exactly (the lazy-F fixpoint there
// converges to the standard left-to-right affine scan computed here).
bool align_to_graph(const Graph &g, const uint8_t *seq, int64_t m,
                    std::vector<Step> &path) {
  std::vector<int> order;
  if (!g.topo_order(order)) return false;
  int n = (int)order.size();
  std::vector<int> pos_in_order(n);
  for (int i = 0; i < n; ++i) pos_in_order[order[i]] = i;

  int64_t stride = m + 1;
  std::vector<int32_t> H((n + 1) * stride, NEG), E((n + 1) * stride, NEG),
      E2((n + 1) * stride, NEG), F((n + 1) * stride, NEG),
      F2((n + 1) * stride, NEG);
  H[0] = 0;
  for (int64_t j = 1; j <= m; ++j) {
    int32_t a = GO + GE * (int32_t)j, b = GO2 + GE2 * (int32_t)j;
    H[j] = -(a < b ? a : b);
  }

  std::vector<int> rp;  // row predecessors of the current node
  auto row_preds = [&](int v, std::vector<int> &out) {
    out.clear();
    for (int u : g.preds[v]) out.push_back(pos_in_order[u] + 1);
    if (g.is_start[v] || out.empty()) out.push_back(0);
  };

  for (int i = 1; i <= n; ++i) {
    int v = order[i - 1];
    char b = g.base[v];
    row_preds(v, rp);
    int32_t *Hi = &H[i * stride], *Ei = &E[i * stride],
            *E2i = &E2[i * stride], *Fi = &F[i * stride],
            *F2i = &F2[i * stride];
    // best over predecessors: diagonal, and node-gap pieces
    for (int64_t j = 0; j <= m; ++j) Hi[j] = NEG;
    for (int pi : rp) {
      const int32_t *hp = &H[pi * stride];
      const int32_t *ep = &E[pi * stride];
      const int32_t *e2p = &E2[pi * stride];
      for (int64_t j = 1; j <= m; ++j) {
        int32_t cand = hp[j - 1] + ((char)seq[j - 1] == b ? MATCH : MISMATCH);
        if (cand > Hi[j]) Hi[j] = cand;
      }
      for (int64_t j = 0; j <= m; ++j) {
        int32_t e = hp[j] - OE;
        int32_t ee = ep[j] - GE;
        if (ee > e) e = ee;
        if (e > Ei[j]) Ei[j] = e;
        int32_t f = hp[j] - OE2;
        int32_t ff = e2p[j] - GE2;
        if (ff > f) f = ff;
        if (f > E2i[j]) E2i[j] = f;
      }
    }
    // Hrow = max(diag, E, E2), then the in-sequence gap scan (both pieces)
    for (int64_t j = 0; j <= m; ++j) {
      int32_t h = Hi[j];
      if (Ei[j] > h) h = Ei[j];
      if (E2i[j] > h) h = E2i[j];
      Hi[j] = h;
    }
    int32_t f1 = NEG, f2 = NEG;
    Fi[0] = NEG;
    F2i[0] = NEG;
    for (int64_t j = 1; j <= m; ++j) {
      int32_t o1 = Hi[j - 1] - OE;
      f1 = (f1 - GE > o1) ? f1 - GE : o1;
      int32_t o2 = Hi[j - 1] - OE2;
      f2 = (f2 - GE2 > o2) ? f2 - GE2 : o2;
      Fi[j] = f1;
      F2i[j] = f2;
      int32_t h = Hi[j];
      if (f1 > h) h = f1;
      if (f2 > h) h = f2;
      Hi[j] = h;
    }
  }

  // best end row: first maximum in g.ends order (Python max semantics)
  int best_row = 0;
  if (!g.ends.empty()) {
    int32_t best = NEG - 1;
    for (int v : g.ends) {
      int r = pos_in_order[v] + 1;
      if (H[r * stride + m] > best) {
        best = H[r * stride + m];
        best_row = r;
      }
    }
  }

  // traceback by score equality — the check order and pred iteration
  // order must match poa.py exactly
  path.clear();
  int64_t i = best_row, j = m;
  int state = 0;  // 0=H 1=E 2=E2 3=F 4=F2
  int64_t guard = 0, guard_max = 10 * (n + m + 2);
  while ((i > 0 || j > 0) && guard < guard_max) {
    ++guard;
    if (state == 0) {
      if (i == 0) {
        path.push_back({-1, (int)(j - 1)});
        --j;
        continue;
      }
      int v = order[i - 1];
      int32_t hv = H[i * stride + j];
      if (hv == F[i * stride + j]) {
        state = 3;
        continue;
      }
      if (hv == F2[i * stride + j]) {
        state = 4;
        continue;
      }
      if (hv == E[i * stride + j]) {
        state = 1;
        continue;
      }
      if (hv == E2[i * stride + j]) {
        state = 2;
        continue;
      }
      bool moved = false;
      if (j > 0) {
        int32_t s = ((char)seq[j - 1] == g.base[v]) ? MATCH : MISMATCH;
        row_preds(v, rp);
        for (int pi : rp) {
          if (H[pi * stride + (j - 1)] + s == hv) {
            path.push_back({v, (int)(j - 1)});
            i = pi;
            --j;
            moved = true;
            break;
          }
        }
      }
      if (!moved) state = 1;  // numerical fallback: node deletion
    } else if (state == 1 || state == 2) {
      const std::vector<int32_t> &Em = (state == 1) ? E : E2;
      int32_t ext = (state == 1) ? GE : GE2;
      int32_t open_cost = (state == 1) ? OE : OE2;
      int v = order[i - 1];
      path.push_back({v, -1});
      row_preds(v, rp);
      bool done = false;
      int32_t cur = Em[i * stride + j];
      for (int pi : rp) {
        if (cur == Em[pi * stride + j] - ext) {
          i = pi;
          done = true;
          break;
        }
      }
      if (!done) {
        for (int pi : rp) {
          if (cur == H[pi * stride + j] - open_cost) {
            i = pi;
            state = 0;
            done = true;
            break;
          }
        }
      }
      if (!done) {
        i = rp[0];
        state = 0;
      }
    } else {  // F / F2: gap consuming seq chars
      const std::vector<int32_t> &Fm = (state == 3) ? F : F2;
      int32_t ext = (state == 3) ? GE : GE2;
      path.push_back({-1, (int)(j - 1)});
      if (j >= 2 && Fm[i * stride + j] == Fm[i * stride + (j - 1)] - ext) {
        --j;
      } else {
        --j;
        state = 0;
      }
    }
  }
  // reverse
  for (size_t a = 0, b = path.size(); a + 1 < b; ++a, --b)
    std::swap(path[a], path[b - 1]);
  return true;
}

void merge(Graph &g, const uint8_t *seq, std::vector<Step> &path) {
  int prev = -1, used_last = -1;
  for (const Step &st : path) {
    if (st.spos == -1) continue;  // node deleted in this sequence
    char ch = (char)seq[st.spos];
    int u;
    if (st.node == -1) {
      u = g.new_node(ch, -1);
    } else if (g.base[st.node] == ch) {
      u = st.node;
    } else {
      u = -1;
      for (int w : g.col_nodes[g.column[st.node]]) {
        if (g.base[w] == ch) {
          u = w;
          break;
        }
      }
      if (u < 0) u = g.new_node(ch, g.column[st.node]);
    }
    g.node_w[u] += 1;
    if (prev >= 0) {
      g.add_edge(prev, u);
    } else {
      if (!g.is_start[u]) {
        g.starts.push_back(u);
        g.is_start[u] = 1;
      }
      g.start_w[u] += 1;
    }
    prev = u;
    used_last = u;
  }
  if (used_last >= 0 && !g.is_end[used_last]) {
    g.ends.push_back(used_last);
    g.is_end[used_last] = 1;
  }
}

// Heaviest bundle (poa.py _consensus): greedy heaviest out-edge, ties by
// downstream score; start = first maximum of (start_w, score) over starts.
bool consensus(const Graph &g, std::vector<char> &out) {
  std::vector<int> order;
  if (!g.topo_order(order)) return false;
  int n = (int)order.size();
  std::vector<int32_t> score(n, 0);
  std::vector<int> choice(n, -1);
  for (int oi = n - 1; oi >= 0; --oi) {
    int v = order[oi];
    int32_t best_w = -1, best_s = -1;
    int best_u = -1;
    for (size_t k = 0; k < g.succs[v].size(); ++k) {
      int u = g.succs[v][k];
      int32_t w = g.succ_w[v][k];
      if (w > best_w || (w == best_w && score[u] > best_s)) {
        best_w = w;
        best_s = score[u];
        best_u = u;
      }
    }
    if (best_u == -1) {
      score[v] = 0;
      choice[v] = -1;
    } else {
      score[v] = best_w + best_s;
      choice[v] = best_u;
    }
  }
  int v = -1;
  int32_t bw = -1, bs = -1;
  for (int s : g.starts) {  // first maximum wins (Python max)
    int32_t w = g.start_w[s];
    if (w > bw || (w == bw && score[s] > bs)) {
      bw = w;
      bs = score[s];
      v = s;
    }
  }
  out.clear();
  while (v != -1) {
    out.push_back(g.base[v]);
    v = choice[v];
  }
  return true;
}

// consensus of one cluster's sequences; mirrors poa.py poa_consensus
bool cluster_consensus(const uint8_t *seqs, const int64_t *seq_off,
                       int64_t s0, int64_t s1, std::vector<char> &out) {
  out.clear();
  // drop empty sequences
  std::vector<int64_t> keep;
  for (int64_t j = s0; j < s1; ++j)
    if (seq_off[j + 1] > seq_off[j]) keep.push_back(j);
  if (keep.empty()) return true;
  bool all_same = true;
  int64_t f0 = seq_off[keep[0]], f1 = seq_off[keep[0] + 1];
  for (size_t k = 1; k < keep.size() && all_same; ++k) {
    int64_t a0 = seq_off[keep[k]], a1 = seq_off[keep[k] + 1];
    all_same = (a1 - a0 == f1 - f0) &&
               std::memcmp(seqs + a0, seqs + f0, (size_t)(f1 - f0)) == 0;
  }
  if (all_same) {
    out.assign(seqs + f0, seqs + f1);
    return true;
  }
  Graph g;
  g.add_first(seqs + f0, f1 - f0);
  std::vector<Step> path;
  for (size_t k = 1; k < keep.size(); ++k) {
    int64_t a0 = seq_off[keep[k]], a1 = seq_off[keep[k] + 1];
    if (!align_to_graph(g, seqs + a0, a1 - a0, path)) return false;
    merge(g, seqs + a0, path);
  }
  std::vector<char> cons;
  if (!consensus(g, cons)) return false;
  out = cons;
  return true;
}

}  // namespace

extern "C" {

int svdss_poa_batch(const uint8_t *seqs, const int64_t *seq_offsets,
                    int64_t n_seqs, const int64_t *cluster_offsets,
                    int64_t n_clusters, int threads, uint8_t *out_buf,
                    int32_t *out_len) {
  (void)n_seqs;
  if (threads <= 0) threads = 1;
  std::atomic<int64_t> next{0};
  std::atomic<int> bad{0};
  auto worker = [&] {
    std::vector<char> out;
    for (;;) {
      int64_t i = next.fetch_add(1);
      if (i >= n_clusters) return;
      int64_t s0 = cluster_offsets[i], s1 = cluster_offsets[i + 1];
      if (s1 <= s0) {
        out_len[i] = 0;
        continue;
      }
      if (!cluster_consensus(seqs, seq_offsets, s0, s1, out)) {
        bad.store(1);
        out_len[i] = 0;
        continue;
      }
      // consensus length <= cluster total input bytes, so writing at the
      // cluster's input start offset never overlaps the next cluster's slot
      std::memcpy(out_buf + seq_offsets[s0], out.data(), out.size());
      out_len[i] = (int32_t)out.size();
    }
  };
  std::vector<std::thread> ts;
  for (int t = 1; t < threads; ++t) ts.emplace_back(worker);
  worker();
  for (auto &th : ts) th.join();
  return bad.load();
}

}  // extern "C"
