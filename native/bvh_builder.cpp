// Native binned-SAH BVH builder.
//
// Plays the role the Vulkan driver's fixed-function acceleration-structure
// build plays in the reference (vkCmdBuildAccelerationStructuresKHR,
// src/raytracer/acceleration_structure.odin:145-199): turning a triangle
// soup into a traversal-ready tree, fast enough to run at scene-bake time
// for ~300k-triangle scenes where the numpy builder's per-node Python
// overhead dominates.
//
// Output layout matches accel/bvh.py exactly (preorder DFS, implicit
// hit-link = node+1, skip-link = subtree end, leaves own contiguous
// triangle ranges of the emitted `order` permutation).
//
// Build: native/build.sh  ->  native/libbvh.so (loaded via ctypes by
// raytracer_tpu/accel/native_builder.py).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <limits>
#include <vector>

namespace {

constexpr int kBins = 32;
constexpr float kTraversalCost = 1.0f;
constexpr float kIntersectCost = 1.5f;

struct Vec3 {
  float x, y, z;
};

inline Vec3 vmin(const Vec3& a, const Vec3& b) {
  return {std::min(a.x, b.x), std::min(a.y, b.y), std::min(a.z, b.z)};
}
inline Vec3 vmax(const Vec3& a, const Vec3& b) {
  return {std::max(a.x, b.x), std::max(a.y, b.y), std::max(a.z, b.z)};
}

struct AABB {
  Vec3 lo{std::numeric_limits<float>::infinity(),
          std::numeric_limits<float>::infinity(),
          std::numeric_limits<float>::infinity()};
  Vec3 hi{-std::numeric_limits<float>::infinity(),
          -std::numeric_limits<float>::infinity(),
          -std::numeric_limits<float>::infinity()};
  void grow(const AABB& o) {
    lo = vmin(lo, o.lo);
    hi = vmax(hi, o.hi);
  }
  void grow(const Vec3& p) {
    lo = vmin(lo, p);
    hi = vmax(hi, p);
  }
  float area() const {
    float dx = std::max(hi.x - lo.x, 0.0f);
    float dy = std::max(hi.y - lo.y, 0.0f);
    float dz = std::max(hi.z - lo.z, 0.0f);
    return 2.0f * (dx * dy + dy * dz + dz * dx);
  }
};

struct BuildNode {
  AABB box;
  int32_t first = 0;   // leaf: first tri slot in `order`
  int32_t count = -1;  // >0 leaf, -1 internal
  int32_t parent = -1;
  int32_t left = -1;   // build-tree child ids (pre-flatten)
  int32_t right = -1;
};

struct Builder {
  const float* v0;
  const float* e1;
  const float* e2;
  int64_t n;
  int32_t leaf_size;

  std::vector<AABB> tri_box;
  std::vector<Vec3> centroid;
  std::vector<int32_t> order;  // permutation being partitioned in place
  std::vector<BuildNode> nodes;

  void init() {
    tri_box.resize(n);
    centroid.resize(n);
    order.resize(n);
    for (int64_t i = 0; i < n; ++i) {
      Vec3 a{v0[3 * i], v0[3 * i + 1], v0[3 * i + 2]};
      Vec3 b{a.x + e1[3 * i], a.y + e1[3 * i + 1], a.z + e1[3 * i + 2]};
      Vec3 c{a.x + e2[3 * i], a.y + e2[3 * i + 1], a.z + e2[3 * i + 2]};
      AABB bb;
      bb.grow(a);
      bb.grow(b);
      bb.grow(c);
      tri_box[i] = bb;
      centroid[i] = {(bb.lo.x + bb.hi.x) * 0.5f, (bb.lo.y + bb.hi.y) * 0.5f,
                     (bb.lo.z + bb.hi.z) * 0.5f};
      order[i] = static_cast<int32_t>(i);
    }
  }

  // Build subtree over order[begin, end); returns node id.
  int32_t build_range(int64_t begin, int64_t end, int32_t parent) {
    int32_t id = static_cast<int32_t>(nodes.size());
    nodes.emplace_back();
    BuildNode& node = nodes.back();
    node.parent = parent;

    AABB box, cbox;
    for (int64_t i = begin; i < end; ++i) {
      box.grow(tri_box[order[i]]);
      const Vec3& c = centroid[order[i]];
      cbox.grow(c);
    }
    node.box = box;

    int64_t count = end - begin;
    if (count <= leaf_size) {
      node.first = static_cast<int32_t>(begin);
      node.count = static_cast<int32_t>(count);
      return id;
    }

    // 3-axis binned SAH: bin every axis in one pass over the range, sweep
    // each, take the global min-cost (axis, k). Measured on the 300k bench
    // scene (tools/r3_sah_cpu_proxy.py) this cuts per-ray quad-tree visits
    // ~24% vs the widest-axis-only split, and per-visit serial latency is
    // the traversal cost model, so tree quality pays 1:1.
    float ext[3] = {cbox.hi.x - cbox.lo.x, cbox.hi.y - cbox.lo.y,
                    cbox.hi.z - cbox.lo.z};
    int widest = 0;
    if (ext[1] > ext[widest]) widest = 1;
    if (ext[2] > ext[widest]) widest = 2;

    int64_t mid = -1;
    if (ext[widest] > 1e-12f) {
      float scale[3];
      AABB bin_box[3][kBins];
      int64_t bin_count[3][kBins] = {};
      for (int a = 0; a < 3; ++a)
        scale[a] = ext[a] > 1e-12f ? kBins * (1.0f - 1e-6f) / ext[a] : 0.0f;
      for (int64_t i = begin; i < end; ++i) {
        const Vec3& c = centroid[order[i]];
        const AABB& tb = tri_box[order[i]];
        for (int a = 0; a < 3; ++a) {
          if (scale[a] == 0.0f) continue;
          int bb = static_cast<int>(((&c.x)[a] - (&cbox.lo.x)[a]) * scale[a]);
          bb = std::min(std::max(bb, 0), kBins - 1);
          bin_box[a][bb].grow(tb);
          ++bin_count[a][bb];
        }
      }
      float best_cost = std::numeric_limits<float>::infinity();
      int best_axis = -1;
      int best_k = -1;
      for (int a = 0; a < 3; ++a) {
        if (scale[a] == 0.0f) continue;
        AABB right_acc[kBins];
        AABB acc;
        for (int b = kBins - 1; b >= 0; --b) {
          acc.grow(bin_box[a][b]);
          right_acc[b] = acc;
        }
        int64_t rcount[kBins];
        int64_t rc = 0;
        for (int b = kBins - 1; b >= 0; --b) {
          rc += bin_count[a][b];
          rcount[b] = rc;
        }
        AABB lacc;
        int64_t lc = 0;
        for (int k = 0; k < kBins - 1; ++k) {
          lacc.grow(bin_box[a][k]);
          lc += bin_count[a][k];
          int64_t rn = rcount[k + 1];
          if (lc == 0 || rn == 0) continue;
          float cost = lacc.area() * lc + right_acc[k + 1].area() * rn;
          if (cost < best_cost) {
            best_cost = cost;
            best_axis = a;
            best_k = k;
          }
        }
      }
      if (best_axis >= 0) {
        float axis_lo = (&cbox.lo.x)[best_axis];
        float s = scale[best_axis];
        auto it = std::partition(
            order.begin() + begin, order.begin() + end, [&](int32_t t) {
              int b = static_cast<int>(((&centroid[t].x)[best_axis] - axis_lo)
                                       * s);
              b = std::min(std::max(b, 0), kBins - 1);
              return b <= best_k;
            });
        mid = it - order.begin();
        if (mid == begin || mid == end) mid = -1;
      }
    }
    if (mid < 0) {
      // Median split fallback (degenerate centroids or unusable SAH split).
      // Leaves must never exceed leaf_size: the traversal's leaf loop is a
      // static range(leaf_size).
      mid = begin + count / 2;
      std::nth_element(order.begin() + begin, order.begin() + mid,
                       order.begin() + end, [&](int32_t a, int32_t b) {
                         return (&centroid[a].x)[widest] <
                                (&centroid[b].x)[widest];
                       });
    }

    int32_t left = build_range(begin, mid, id);
    int32_t right = build_range(mid, end, id);
    nodes[id].left = left;
    nodes[id].right = right;
    return id;
  }
};

}  // namespace

extern "C" int64_t bvh_build(int64_t num_tris, const float* v0,
                             const float* e1, const float* e2,
                             int32_t leaf_size, float* out_min, float* out_max,
                             int32_t* out_skip, int32_t* out_first,
                             int32_t* out_count, int32_t* out_order,
                             int32_t* out_parent) {
  if (num_tris <= 0 || leaf_size <= 0) return -1;
  Builder b{v0, e1, e2, num_tris, leaf_size};
  b.init();
  b.nodes.reserve(2 * num_tris);
  b.build_range(0, num_tris, -1);

  // Flatten to preorder: hit-link = i+1, skip-link = subtree end.
  const int64_t nn_cap = 2 * num_tris;
  struct StackEntry {
    int32_t build_id;
    int32_t flat_parent;
  };
  std::vector<StackEntry> stack;
  stack.push_back({0, -1});
  int64_t out = 0;
  while (!stack.empty()) {
    StackEntry se = stack.back();
    stack.pop_back();
    const BuildNode& node = b.nodes[se.build_id];
    if (out >= nn_cap) return -1;
    int64_t flat_id = out++;
    out_min[3 * flat_id] = node.box.lo.x;
    out_min[3 * flat_id + 1] = node.box.lo.y;
    out_min[3 * flat_id + 2] = node.box.lo.z;
    out_max[3 * flat_id] = node.box.hi.x;
    out_max[3 * flat_id + 1] = node.box.hi.y;
    out_max[3 * flat_id + 2] = node.box.hi.z;
    out_parent[flat_id] = se.flat_parent;
    if (node.count >= 0) {
      out_first[flat_id] = node.first;
      out_count[flat_id] = node.count;
    } else {
      out_first[flat_id] = 0;
      out_count[flat_id] = 0;
      // Preorder: left next -> push right first.
      stack.push_back({node.right, static_cast<int32_t>(flat_id)});
      stack.push_back({node.left, static_cast<int32_t>(flat_id)});
    }
  }

  // Skip links: subtree end via reverse scan (parents precede children).
  std::vector<int32_t> end(out);
  for (int64_t i = 0; i < out; ++i) end[i] = static_cast<int32_t>(i + 1);
  for (int64_t i = out - 1; i > 0; --i) {
    int32_t p = out_parent[i];
    if (p >= 0 && end[i] > end[p]) end[p] = end[i];
  }
  for (int64_t i = 0; i < out; ++i) out_skip[i] = end[i];

  for (int64_t i = 0; i < num_tris; ++i) out_order[i] = b.order[i];
  return out;
}
