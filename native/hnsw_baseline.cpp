// CPU HNSW baseline for the benchmark harness — competitor analog of the
// reference's hnswlib wrapper (/root/reference/cpp/bench/ann/src/hnswlib/
// hnswlib_wrapper.h). hnswlib itself is fetched by the reference's CMake
// at build time and is not vendorable in this offline image, so this is
// an independent implementation of the HNSW algorithm (Malkov & Yashunin,
// TPAMI 2018): exponential level draws, greedy upper-level descent,
// ef-bounded best-first search at level 0, and the diversity ("keep
// pruned") neighbor-selection heuristic.
//
// C ABI (driven from cuvs_tpu/bench via ctypes):
//   hnswb_build(data, n, d, M, ef_construction, ip, seed) -> handle
//   hnswb_search(handle, queries, nq, k, ef, out_ids, out_dists)
//   hnswb_free(handle)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <queue>
#include <random>
#include <vector>

namespace {

struct Hnsw {
  int64_t n = 0;
  int d = 0;
  int M = 16;
  int maxM0 = 32;
  int efc = 200;
  bool ip = false;
  double mult = 1.0;
  int max_level = -1;
  int64_t entry = -1;
  std::vector<float> data;                       // [n, d]
  std::vector<int> levels;                       // [n]
  std::vector<std::vector<int32_t>> links0;      // level-0 adjacency
  std::vector<std::vector<std::vector<int32_t>>> links_upper;  // [node][lvl-1]

  float dist(const float* a, const float* b) const {
    float s = 0.f;
    if (ip) {
      for (int i = 0; i < d; ++i) s += a[i] * b[i];
      return -s;
    }
    for (int i = 0; i < d; ++i) {
      float t = a[i] - b[i];
      s += t * t;
    }
    return s;
  }
  const float* vec(int64_t i) const { return data.data() + i * d; }
};

using Cand = std::pair<float, int32_t>;  // (distance, id)

// best-first search on one level: returns up to ef closest (max-heap)
std::priority_queue<Cand> search_layer(const Hnsw& h, const float* q,
                                       int64_t ep, int level, int ef,
                                       std::vector<uint32_t>& visited,
                                       uint32_t stamp) {
  std::priority_queue<Cand> result;                    // max-heap by dist
  std::priority_queue<Cand, std::vector<Cand>, std::greater<Cand>> frontier;
  float d0 = h.dist(q, h.vec(ep));
  result.emplace(d0, (int32_t)ep);
  frontier.emplace(d0, (int32_t)ep);
  visited[ep] = stamp;
  while (!frontier.empty()) {
    auto [dc, c] = frontier.top();
    if (dc > result.top().first && (int)result.size() >= ef) break;
    frontier.pop();
    const auto& nbrs = level == 0 ? h.links0[c] : h.links_upper[c][level - 1];
    for (int32_t nb : nbrs) {
      if (visited[nb] == stamp) continue;
      visited[nb] = stamp;
      float dn = h.dist(q, h.vec(nb));
      if ((int)result.size() < ef || dn < result.top().first) {
        result.emplace(dn, nb);
        frontier.emplace(dn, nb);
        if ((int)result.size() > ef) result.pop();
      }
    }
  }
  return result;
}

// diversity heuristic: keep c only if closer to q than to any kept one
std::vector<int32_t> select_neighbors(const Hnsw& h,
                                      std::vector<Cand> cands, int m) {
  std::sort(cands.begin(), cands.end());
  std::vector<int32_t> kept;
  for (const auto& [dc, c] : cands) {
    if ((int)kept.size() >= m) break;
    bool ok = true;
    for (int32_t kpt : kept) {
      if (h.dist(h.vec(c), h.vec(kpt)) < dc) {
        ok = false;
        break;
      }
    }
    if (ok) kept.push_back(c);
  }
  // backfill with nearest pruned candidates (hnswlib keepPruned behavior)
  for (const auto& [dc, c] : cands) {
    if ((int)kept.size() >= m) break;
    if (std::find(kept.begin(), kept.end(), c) == kept.end())
      kept.push_back(c);
  }
  return kept;
}

void shrink_links(Hnsw& h, int32_t node, int level, int cap) {
  auto& lst = level == 0 ? h.links0[node] : h.links_upper[node][level - 1];
  if ((int)lst.size() <= cap) return;
  std::vector<Cand> cands;
  cands.reserve(lst.size());
  for (int32_t nb : lst) cands.emplace_back(h.dist(h.vec(node), h.vec(nb)), nb);
  lst = select_neighbors(h, std::move(cands), cap);
}

void insert(Hnsw& h, int64_t i, int level, std::vector<uint32_t>& visited,
            uint32_t& stamp) {
  const float* q = h.vec(i);
  if (h.entry < 0) {
    h.entry = i;
    h.max_level = level;
    return;
  }
  int64_t ep = h.entry;
  // greedy descent through levels above the insert level
  for (int l = h.max_level; l > level; --l) {
    bool moved = true;
    float dq = h.dist(q, h.vec(ep));
    while (moved) {
      moved = false;
      const auto& nbrs = l == 0 ? h.links0[ep] : h.links_upper[ep][l - 1];
      for (int32_t nb : nbrs) {
        float dn = h.dist(q, h.vec(nb));
        if (dn < dq) {
          dq = dn;
          ep = nb;
          moved = true;
        }
      }
    }
  }
  for (int l = std::min(level, h.max_level); l >= 0; --l) {
    ++stamp;
    auto res = search_layer(h, q, ep, l, h.efc, visited, stamp);
    std::vector<Cand> cands;
    while (!res.empty()) {
      cands.push_back(res.top());
      res.pop();
    }
    int m = l == 0 ? h.maxM0 : h.M;
    auto sel = select_neighbors(h, cands, h.M);
    auto& mylist = l == 0 ? h.links0[i] : h.links_upper[i][l - 1];
    mylist = sel;
    for (int32_t nb : sel) {
      auto& their = l == 0 ? h.links0[nb] : h.links_upper[nb][l - 1];
      their.push_back((int32_t)i);
      shrink_links(h, nb, l, m);
    }
    if (!sel.empty()) ep = sel[0];
  }
  if (level > h.max_level) {
    h.max_level = level;
    h.entry = i;
  }
}

}  // namespace

extern "C" {

void* hnswb_build(const float* data, int64_t n, int d, int M,
                  int ef_construction, int ip, uint64_t seed) {
  auto* h = new Hnsw;
  h->n = n;
  h->d = d;
  h->M = M;
  h->maxM0 = 2 * M;
  h->efc = ef_construction;
  h->ip = ip != 0;
  h->mult = 1.0 / std::log(std::max(M, 2));
  h->data.assign(data, data + n * d);
  h->levels.resize(n);
  h->links0.resize(n);
  h->links_upper.resize(n);
  std::mt19937_64 rng(seed);
  std::uniform_real_distribution<double> uni(0.0, 1.0);
  for (int64_t i = 0; i < n; ++i) {
    int lvl = (int)std::floor(-std::log(std::max(uni(rng), 1e-12)) * h->mult);
    h->levels[i] = lvl;
    h->links_upper[i].resize(lvl);
  }
  std::vector<uint32_t> visited(n, 0);
  uint32_t stamp = 0;
  for (int64_t i = 0; i < n; ++i) insert(*h, i, h->levels[i], visited, stamp);
  return h;
}

void hnswb_search(void* handle, const float* queries, int64_t nq, int k,
                  int ef, int32_t* out_ids, float* out_dists) {
  auto& h = *static_cast<Hnsw*>(handle);
  std::vector<uint32_t> visited(h.n, 0);
  uint32_t stamp = 0;
  for (int64_t qi = 0; qi < nq; ++qi) {
    const float* q = queries + qi * h.d;
    int64_t ep = h.entry;
    for (int l = h.max_level; l > 0; --l) {
      bool moved = true;
      float dq = h.dist(q, h.vec(ep));
      while (moved) {
        moved = false;
        for (int32_t nb : h.links_upper[ep][l - 1]) {
          float dn = h.dist(q, h.vec(nb));
          if (dn < dq) {
            dq = dn;
            ep = nb;
            moved = true;
          }
        }
      }
    }
    ++stamp;
    auto res = search_layer(h, q, ep, 0, std::max(ef, k), visited, stamp);
    std::vector<Cand> top;
    while (!res.empty()) {
      top.push_back(res.top());
      res.pop();
    }
    std::sort(top.begin(), top.end());
    for (int j = 0; j < k; ++j) {
      if (j < (int)top.size()) {
        out_dists[qi * k + j] = h.ip ? -top[j].first : top[j].first;
        out_ids[qi * k + j] = top[j].second;
      } else {
        out_dists[qi * k + j] = h.ip ? -1e30f : 1e30f;
        out_ids[qi * k + j] = -1;
      }
    }
  }
}

void hnswb_free(void* handle) { delete static_cast<Hnsw*>(handle); }

}  // extern "C"
