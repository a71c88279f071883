// Single-thread in-memory HNSW — the measured CPU baseline for bench.py.
//
// Implements the reference algorithm (cozo-core/src/runtime/hnsw.rs:
// get_random_level hnsw.rs:46-52, greedy descent + ef_construction beam +
// neighbor-selection heuristic hnsw.rs:470-537, bidirectional links with
// shrink hnsw.rs:376-469, search hnsw.rs:869-1012) as a plain in-memory
// C++ structure.  This is strictly FASTER than the reference's actual
// engine (which does a KV point-get + msgpack decode per vector touch),
// so QPS ratios computed against it are conservative.
//
// Built on demand by bench.py via g++ -O3 -march=native; driven by ctypes.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <queue>
#include <random>
#include <vector>

namespace {

struct Hnsw {
  int dim;
  int m;         // m_max (upper levels)
  int m0;        // 2m (level 0)
  int efc;
  int metric;    // 0 = L2, 1 = cosine/IP on normalized vectors
  std::mt19937_64 rng{42};
  double level_mult;

  std::vector<float> vecs;              // [n, dim]
  std::vector<int> levels;
  std::vector<std::vector<std::vector<int>>> nbrs;  // [n][level] -> ids
  int entry = -1;
  int top_level = -1;
  std::vector<uint32_t> visit_mark;
  uint32_t visit_gen = 0;

  int n() const { return (int)levels.size(); }

  float dist(const float* a, const float* b) const {
    float acc = 0.f;
    if (metric == 0) {
      for (int i = 0; i < dim; i++) {
        float d = a[i] - b[i];
        acc += d * d;
      }
      return acc;
    }
    for (int i = 0; i < dim; i++) acc += a[i] * b[i];
    return 1.0f - acc;
  }

  const float* vp(int id) const { return vecs.data() + (size_t)id * dim; }

  int random_level() {
    std::uniform_real_distribution<double> u01(std::nextafter(0.0, 1.0), 1.0);
    return (int)(-std::log(u01(rng)) * level_mult);
  }

  // beam search at one level; returns (dist, id) sorted ascending
  void search_level(const float* q, int ep, int level, int ef,
                    std::vector<std::pair<float, int>>& out) {
    if (++visit_gen == 0) {
      std::fill(visit_mark.begin(), visit_mark.end(), 0);
      visit_gen = 1;
    }
    visit_mark.resize(levels.size(), 0);
    using P = std::pair<float, int>;
    std::priority_queue<P, std::vector<P>, std::greater<P>> cand;
    std::priority_queue<P> result;  // max-heap on dist
    float d0 = dist(q, vp(ep));
    cand.push({d0, ep});
    result.push({d0, ep});
    visit_mark[ep] = visit_gen;
    while (!cand.empty()) {
      auto [d, c] = cand.top();
      if (d > result.top().first && (int)result.size() >= ef) break;
      cand.pop();
      const auto& ns = nbrs[c][level];
      for (int x : ns) {
        if (visit_mark[x] == visit_gen) continue;
        visit_mark[x] = visit_gen;
        float dx = dist(q, vp(x));
        if ((int)result.size() < ef || dx < result.top().first) {
          cand.push({dx, x});
          result.push({dx, x});
          if ((int)result.size() > ef) result.pop();
        }
      }
    }
    out.clear();
    out.reserve(result.size());
    while (!result.empty()) {
      out.push_back(result.top());
      result.pop();
    }
    std::reverse(out.begin(), out.end());
  }

  // reference neighbor-selection heuristic (hnsw.rs:470-537)
  void select_neighbors(const float* q,
                        const std::vector<std::pair<float, int>>& cands,
                        int mmax, std::vector<int>& out) {
    out.clear();
    for (const auto& [d, c] : cands) {
      if ((int)out.size() >= mmax) break;
      bool dominated = false;
      for (int s : out) {
        if (dist(vp(c), vp(s)) < d) {
          dominated = true;
          break;
        }
      }
      if (!dominated) out.push_back(c);
    }
  }

  void shrink(int id, int level, int mmax) {
    auto& row = nbrs[id][level];
    if ((int)row.size() <= mmax) return;
    std::vector<std::pair<float, int>> cands;
    cands.reserve(row.size());
    for (int x : row) cands.push_back({dist(vp(id), vp(x)), x});
    std::sort(cands.begin(), cands.end());
    std::vector<int> sel;
    select_neighbors(vp(id), cands, mmax, sel);
    row = sel;
  }

  void insert(const float* v) {
    int id = n();
    vecs.insert(vecs.end(), v, v + dim);
    if (metric == 1) {  // normalize for cosine
      float* p = vecs.data() + (size_t)id * dim;
      float nn = 0.f;
      for (int i = 0; i < dim; i++) nn += p[i] * p[i];
      nn = std::sqrt(nn);
      if (nn > 0) for (int i = 0; i < dim; i++) p[i] /= nn;
    }
    int level = random_level();
    levels.push_back(level);
    nbrs.emplace_back(level + 1);
    visit_mark.push_back(0);
    if (entry < 0) {
      entry = id;
      top_level = level;
      return;
    }
    const float* q = vp(id);
    int ep = entry;
    for (int l = top_level; l > level; l--) {
      // greedy descent
      for (;;) {
        float best = dist(q, vp(ep));
        int arg = -1;
        for (int x : nbrs[ep][l]) {
          float dx = dist(q, vp(x));
          if (dx < best) {
            best = dx;
            arg = x;
          }
        }
        if (arg < 0) break;
        ep = arg;
      }
    }
    std::vector<std::pair<float, int>> cands;
    std::vector<int> sel;
    for (int l = std::min(level, top_level); l >= 0; l--) {
      search_level(q, ep, l, efc, cands);
      int mmax = l == 0 ? m0 : m;
      select_neighbors(q, cands, mmax, sel);
      nbrs[id][l] = sel;
      for (int x : sel) {
        nbrs[x][l].push_back(id);
        shrink(x, l, l == 0 ? m0 : m);
      }
      if (!cands.empty()) ep = cands[0].second;
    }
    if (level > top_level) {
      entry = id;
      top_level = level;
    }
  }

  void search(const float* qraw, int k, int ef, int64_t* out_ids,
              float* out_d) {
    std::vector<float> qn;
    const float* q = qraw;
    if (metric == 1) {
      qn.assign(qraw, qraw + dim);
      float nn = 0.f;
      for (int i = 0; i < dim; i++) nn += qn[i] * qn[i];
      nn = std::sqrt(nn);
      if (nn > 0) for (int i = 0; i < dim; i++) qn[i] /= nn;
      q = qn.data();
    }
    for (int i = 0; i < k; i++) {
      out_ids[i] = -1;
      out_d[i] = INFINITY;
    }
    if (entry < 0) return;
    int ep = entry;
    for (int l = top_level; l > 0; l--) {
      for (;;) {
        float best = dist(q, vp(ep));
        int arg = -1;
        for (int x : nbrs[ep][l]) {
          float dx = dist(q, vp(x));
          if (dx < best) {
            best = dx;
            arg = x;
          }
        }
        if (arg < 0) break;
        ep = arg;
      }
    }
    std::vector<std::pair<float, int>> res;
    search_level(q, ep, 0, std::max(ef, k), res);
    int kk = std::min(k, (int)res.size());
    for (int i = 0; i < kk; i++) {
      out_d[i] = res[i].first;
      out_ids[i] = res[i].second;
    }
  }
};

}  // namespace

extern "C" {

void* hnswb_new(int dim, int m, int efc, int metric) {
  auto* h = new Hnsw();
  h->dim = dim;
  h->m = m;
  h->m0 = 2 * m;
  h->efc = efc;
  h->metric = metric;
  h->level_mult = 1.0 / std::log((double)m);
  return h;
}

void hnswb_free(void* p) { delete (Hnsw*)p; }

void hnswb_add_batch(void* p, const float* data, int count) {
  auto* h = (Hnsw*)p;
  for (int i = 0; i < count; i++) h->insert(data + (size_t)i * h->dim);
}

void hnswb_search_batch(void* p, const float* qs, int count, int k, int ef,
                        int64_t* out_ids, float* out_d) {
  auto* h = (Hnsw*)p;
  for (int i = 0; i < count; i++) {
    h->search(qs + (size_t)i * h->dim, k, ef, out_ids + (size_t)i * k,
              out_d + (size_t)i * k);
  }
}

int hnswb_count(void* p) { return ((Hnsw*)p)->n(); }
}
