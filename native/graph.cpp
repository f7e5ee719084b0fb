// Native correspondence graph + 4-view track assembly.
//
// C++ twin of privacy_preserving_sfm_tpu/models/correspondence_graph.py
// (itself mirroring the reference's src/base/correspondence_graph.{h,cc}),
// plus the combinatorial 4-view track enumeration of
// RegisterInitialLineImages (src/sfm/incremental_mapper.cc:261-363) —
// the host-side hot loops of the incremental mapper.  Exposed as a C ABI
// for ctypes (no pybind11 in this environment).
//
// Build: native/build.sh (g++ -O3 -shared -fPIC).

#include <algorithm>
#include <array>
#include <cstdint>
#include <cstring>
#include <map>
#include <set>
#include <unordered_map>
#include <unordered_set>
#include <vector>

namespace {

using Key = uint64_t;  // (image_id << 32) | line_idx

inline Key make_key(uint32_t image_id, uint32_t line_idx) {
  return (static_cast<uint64_t>(image_id) << 32) | line_idx;
}

struct Graph {
  std::unordered_map<Key, std::vector<Key>> adj;
  std::unordered_map<uint32_t, uint64_t> num_corrs_per_image;
};

struct TrackResult {
  // Flattened 4-view tracks: image ids (4 per track) + line indices.
  std::vector<uint32_t> image_sets;   // num_sets * 4
  std::vector<int64_t> set_offsets;   // per-set start into `features`
  std::vector<int64_t> set_counts;    // per-set number of tracks
  std::vector<uint32_t> features;     // total_tracks * 4 line indices
};

}  // namespace

extern "C" {

void* ppsfm_graph_create() { return new Graph(); }

void ppsfm_graph_destroy(void* g) { delete static_cast<Graph*>(g); }

void ppsfm_graph_add_matches(void* gp, uint32_t image_id1, uint32_t image_id2,
                             const uint32_t* matches, int64_t num) {
  Graph& g = *static_cast<Graph*>(gp);
  for (int64_t i = 0; i < num; ++i) {
    const uint32_t a = matches[2 * i];
    const uint32_t b = matches[2 * i + 1];
    g.adj[make_key(image_id1, a)].push_back(make_key(image_id2, b));
    g.adj[make_key(image_id2, b)].push_back(make_key(image_id1, a));
  }
  g.num_corrs_per_image[image_id1] += num;
  g.num_corrs_per_image[image_id2] += num;
}

int64_t ppsfm_graph_find_correspondences(void* gp, uint32_t image_id,
                                         uint32_t line_idx, uint32_t* out_img,
                                         uint32_t* out_line,
                                         int64_t max_out) {
  Graph& g = *static_cast<Graph*>(gp);
  auto it = g.adj.find(make_key(image_id, line_idx));
  if (it == g.adj.end()) return 0;
  int64_t n = 0;
  for (Key k : it->second) {
    if (n >= max_out) break;
    out_img[n] = static_cast<uint32_t>(k >> 32);
    out_line[n] = static_cast<uint32_t>(k & 0xffffffffu);
    ++n;
  }
  return n;
}

// BFS transitive expansion (correspondence_graph.cc
// FindTransitiveCorrespondences semantics: up to `transitivity` hops,
// excluding the root, first-visit order).
int64_t ppsfm_graph_find_transitive(void* gp, uint32_t image_id,
                                    uint32_t line_idx, int transitivity,
                                    uint32_t* out_img, uint32_t* out_line,
                                    int64_t max_out) {
  Graph& g = *static_cast<Graph*>(gp);
  const Key root = make_key(image_id, line_idx);
  std::unordered_set<Key> seen{root};
  std::vector<Key> frontier{root}, next;
  int64_t n = 0;
  for (int hop = 0; hop < transitivity && !frontier.empty(); ++hop) {
    next.clear();
    for (Key node : frontier) {
      auto it = g.adj.find(node);
      if (it == g.adj.end()) continue;
      for (Key k : it->second) {
        if (seen.insert(k).second) {
          if (n < max_out) {
            out_img[n] = static_cast<uint32_t>(k >> 32);
            out_line[n] = static_cast<uint32_t>(k & 0xffffffffu);
            ++n;
          }
          next.push_back(k);
        }
      }
    }
    frontier.swap(next);
  }
  return n;
}

int ppsfm_graph_is_two_view(void* gp, uint32_t image_id, uint32_t line_idx) {
  Graph& g = *static_cast<Graph*>(gp);
  auto it = g.adj.find(make_key(image_id, line_idx));
  if (it == g.adj.end() || it->second.size() != 1) return 0;
  auto back = g.adj.find(it->second[0]);
  return back != g.adj.end() && back->second.size() == 1;
}

// 4-view track assembly around seed images
// (incremental_mapper.cc:261-363): for every feature of every seed image,
// enumerate C(corrs, 3) triples of same-alignment correspondences; keep
// candidates covering 4 distinct images; dedupe per sorted image set.
//
// aligned_flags: per image, pointer to uint8 array (1 = aligned).
// Returns an opaque TrackResult; query it with the accessors below.
void* ppsfm_assemble_tracks(void* gp, const uint32_t* seed_ids,
                            int64_t num_seeds, const uint32_t* all_ids,
                            int64_t num_images, const uint8_t* const* aligned,
                            const int64_t* num_lines, int want_aligned) {
  Graph& g = *static_cast<Graph*>(gp);
  // image_id -> dense index for aligned lookup
  std::unordered_map<uint32_t, int64_t> dense;
  for (int64_t i = 0; i < num_images; ++i) dense[all_ids[i]] = i;

  using ImageSet = std::array<uint32_t, 4>;
  using Feats = std::array<uint32_t, 4>;
  std::map<ImageSet, std::set<Feats>> tracks;

  std::vector<std::pair<uint32_t, uint32_t>> corrs;
  for (int64_t s = 0; s < num_seeds; ++s) {
    const uint32_t image_id = seed_ids[s];
    auto dit = dense.find(image_id);
    if (dit == dense.end()) continue;
    const int64_t di = dit->second;
    for (int64_t li = 0; li < num_lines[di]; ++li) {
      const bool is_aligned = aligned[di][li] != 0;
      if (static_cast<int>(is_aligned) != want_aligned) continue;
      auto it = g.adj.find(make_key(image_id, (uint32_t)li));
      if (it == g.adj.end()) continue;
      corrs.clear();
      for (Key k : it->second) {
        const uint32_t cimg = static_cast<uint32_t>(k >> 32);
        const uint32_t cli = static_cast<uint32_t>(k & 0xffffffffu);
        auto cd = dense.find(cimg);
        if (cd == dense.end()) continue;
        if ((aligned[cd->second][cli] != 0) == is_aligned) {
          corrs.emplace_back(cimg, cli);
        }
      }
      // Cap the per-feature correspondence fan-out: C(n, 3) explodes on
      // densely-matched sets (n ~ 50 gives 20k combos per feature).  An
      // even-stride subsample keeps coverage across the image range while
      // bounding assembly at C(kMaxCorrs, 3) = 560 combos per feature.
      constexpr int64_t kMaxCorrs = 16;
      if (static_cast<int64_t>(corrs.size()) > kMaxCorrs) {
        std::vector<std::pair<uint32_t, uint32_t>> sampled;
        sampled.reserve(kMaxCorrs);
        const double stride =
            static_cast<double>(corrs.size()) / kMaxCorrs;
        for (int64_t s2 = 0; s2 < kMaxCorrs; ++s2) {
          sampled.push_back(corrs[static_cast<int64_t>(s2 * stride)]);
        }
        corrs.swap(sampled);
      }
      const int64_t n = static_cast<int64_t>(corrs.size());
      if (n < 3) continue;
      for (int64_t i = 0; i < n; ++i) {
        for (int64_t j = i + 1; j < n; ++j) {
          for (int64_t k2 = j + 1; k2 < n; ++k2) {
            std::array<std::pair<uint32_t, uint32_t>, 4> cand{
                {{image_id, (uint32_t)li}, corrs[i], corrs[j], corrs[k2]}};
            std::sort(cand.begin(), cand.end());
            if (cand[0].first == cand[1].first ||
                cand[1].first == cand[2].first ||
                cand[2].first == cand[3].first) {
              continue;  // needs 4 distinct images
            }
            ImageSet iset{cand[0].first, cand[1].first, cand[2].first,
                          cand[3].first};
            Feats f{cand[0].second, cand[1].second, cand[2].second,
                    cand[3].second};
            tracks[iset].insert(f);
          }
        }
      }
    }
  }

  auto* res = new TrackResult();
  int64_t offset = 0;
  for (const auto& kv : tracks) {
    for (int i = 0; i < 4; ++i) res->image_sets.push_back(kv.first[i]);
    res->set_offsets.push_back(offset);
    res->set_counts.push_back(static_cast<int64_t>(kv.second.size()));
    for (const auto& f : kv.second) {
      for (int i = 0; i < 4; ++i) res->features.push_back(f[i]);
      ++offset;
    }
  }
  return res;
}

int64_t ppsfm_tracks_num_sets(void* tr) {
  return static_cast<int64_t>(static_cast<TrackResult*>(tr)->set_counts.size());
}

int64_t ppsfm_tracks_total(void* tr) {
  return static_cast<int64_t>(static_cast<TrackResult*>(tr)->features.size()) / 4;
}

void ppsfm_tracks_copy(void* trp, uint32_t* image_sets, int64_t* offsets,
                       int64_t* counts, uint32_t* features) {
  TrackResult* tr = static_cast<TrackResult*>(trp);
  std::memcpy(image_sets, tr->image_sets.data(),
              tr->image_sets.size() * sizeof(uint32_t));
  std::memcpy(offsets, tr->set_offsets.data(),
              tr->set_offsets.size() * sizeof(int64_t));
  std::memcpy(counts, tr->set_counts.data(),
              tr->set_counts.size() * sizeof(int64_t));
  std::memcpy(features, tr->features.data(),
              tr->features.size() * sizeof(uint32_t));
}

void ppsfm_tracks_destroy(void* tr) { delete static_cast<TrackResult*>(tr); }

}  // extern "C"
