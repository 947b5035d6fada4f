// Binned-SAH BVH2 builder emitting the threaded (skip-link) flat layout.
//
// Native counterpart of loupiote's CPU-side acceleration build, which runs
// in C++ via the tinybvh cxx bridge (reference: albedo_rtx::BLASArray,
// Cargo.lock:3391-3399). Exposed as a C ABI for ctypes (accel/native.py);
// output arrays match loupiote_tpu.accel.bvh.FlatBVH exactly so the Python
// and native builders are drop-in interchangeable.
//
// Build: g++ -O3 -march=native -shared -fPIC bvh_builder.cpp -o libbvh.so

#include <algorithm>
#include <cfloat>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int kBins = 16;

struct Vec3 {
  float x, y, z;
  Vec3() : x(0), y(0), z(0) {}
  Vec3(float a, float b, float c) : x(a), y(b), z(c) {}
  float operator[](int i) const { return i == 0 ? x : (i == 1 ? y : z); }
};

static inline Vec3 vmin(const Vec3& a, const Vec3& b) {
  return Vec3(std::min(a.x, b.x), std::min(a.y, b.y), std::min(a.z, b.z));
}
static inline Vec3 vmax(const Vec3& a, const Vec3& b) {
  return Vec3(std::max(a.x, b.x), std::max(a.y, b.y), std::max(a.z, b.z));
}

struct AABB {
  Vec3 lo{FLT_MAX, FLT_MAX, FLT_MAX};
  Vec3 hi{-FLT_MAX, -FLT_MAX, -FLT_MAX};
  void grow(const Vec3& p) { lo = vmin(lo, p); hi = vmax(hi, p); }
  void grow(const AABB& b) { lo = vmin(lo, b.lo); hi = vmax(hi, b.hi); }
  float area() const {
    float dx = std::max(hi.x - lo.x, 0.f);
    float dy = std::max(hi.y - lo.y, 0.f);
    float dz = std::max(hi.z - lo.z, 0.f);
    return dx * dy + dy * dz + dz * dx;
  }
};

struct Node {
  Vec3 lo, hi;
  int32_t first;   // leaf: first tri; internal: left child (== self+1)
  int32_t count;   // 0 for internal
  int32_t miss;
  int32_t right;   // -1 for leaves
  int32_t axis;    // split axis for internal nodes (-1 for leaves)
};

struct Builder {
  std::vector<AABB> tri_box;
  std::vector<Vec3> centroid;
  std::vector<int32_t> order;   // work permutation
  std::vector<Node> nodes;
  int leaf_max;

  // Recursive build over order[lo, hi); emits pre-order so left = me+1.
  int build(int lo, int hi) {
    int me = static_cast<int>(nodes.size());
    nodes.emplace_back();

    AABB bounds, cbounds;
    for (int i = lo; i < hi; ++i) {
      bounds.grow(tri_box[order[i]]);
      cbounds.grow(centroid[order[i]]);
    }
    Node& n0 = nodes[me];
    n0.lo = bounds.lo;
    n0.hi = bounds.hi;

    int count = hi - lo;
    if (count <= leaf_max) {
      nodes[me].first = lo;  // order is emitted in place: leaf ranges are
      nodes[me].count = count;  // contiguous in the final permutation
      nodes[me].right = -1;
      nodes[me].axis = -1;
      return me;
    }

    // Binned SAH over the centroid bounds.
    int best_axis = -1, best_bin = -1;
    float best_cost = FLT_MAX;
    Vec3 ext(cbounds.hi.x - cbounds.lo.x, cbounds.hi.y - cbounds.lo.y,
             cbounds.hi.z - cbounds.lo.z);
    for (int axis = 0; axis < 3; ++axis) {
      if (ext[axis] <= 1e-12f) continue;
      float scale = kBins / ext[axis];
      AABB bb[kBins];
      int cnt[kBins] = {0};
      for (int i = lo; i < hi; ++i) {
        int t = order[i];
        int b = std::min(kBins - 1, std::max(0, static_cast<int>(
            (centroid[t][axis] - cbounds.lo[axis]) * scale)));
        bb[b].grow(tri_box[t]);
        cnt[b]++;
      }
      AABB left_acc;
      float left_area[kBins];
      int left_cnt[kBins];
      int acc = 0;
      for (int b = 0; b < kBins; ++b) {
        left_acc.grow(bb[b]);
        acc += cnt[b];
        left_area[b] = left_acc.area();
        left_cnt[b] = acc;
      }
      AABB right_acc;
      for (int b = kBins - 1; b > 0; --b) {
        right_acc.grow(bb[b]);
        int cl = left_cnt[b - 1], cr = count - cl;
        if (cl == 0 || cr == 0) continue;
        float cost = 1.0f + left_area[b - 1] * cl + right_acc.area() * cr;
        if (cost < best_cost) {
          best_cost = cost;
          best_axis = axis;
          best_bin = b;
        }
      }
    }

    int mid;
    if (best_axis < 0) {
      // Degenerate: median split on the largest centroid extent.
      int axis = ext.x > ext.y ? (ext.x > ext.z ? 0 : 2)
                               : (ext.y > ext.z ? 1 : 2);
      mid = lo + count / 2;
      std::nth_element(order.begin() + lo, order.begin() + mid,
                       order.begin() + hi, [&](int a, int b) {
                         return centroid[a][axis] < centroid[b][axis];
                       });
      nodes[me].axis = axis;
    } else {
      float scale = kBins / ext[best_axis];
      auto it = std::partition(
          order.begin() + lo, order.begin() + hi, [&](int t) {
            int b = std::min(kBins - 1, std::max(0, static_cast<int>(
                (centroid[t][best_axis] - cbounds.lo[best_axis]) * scale)));
            return b < best_bin;
          });
      mid = static_cast<int>(it - order.begin());
      if (mid == lo || mid == hi) mid = lo + count / 2;
      nodes[me].axis = best_axis;
    }

    nodes[me].count = 0;
    int left = build(lo, mid);
    (void)left;  // == me + 1 by construction
    int right = build(mid, hi);
    nodes[me].first = me + 1;
    nodes[me].right = right;
    return me;
  }

  void thread_links() {
    // Pre-order walk assigning miss links (END = nodes.size()).
    int end = static_cast<int>(nodes.size());
    std::vector<std::pair<int, int>> stack;
    stack.push_back({0, end});
    while (!stack.empty()) {
      auto [n, m] = stack.back();
      stack.pop_back();
      nodes[n].miss = m;
      if (nodes[n].count == 0) {
        stack.push_back({n + 1, nodes[n].right});
        stack.push_back({nodes[n].right, m});
      }
    }
  }
};

}  // namespace

extern "C" {

// Returns an opaque handle; query sizes then copy out and free.
void* bvh_build(const float* v0, const float* v1, const float* v2,
                int32_t tri_count, int32_t leaf_max) {
  auto* b = new Builder();
  b->leaf_max = leaf_max;
  b->tri_box.resize(tri_count);
  b->centroid.resize(tri_count);
  b->order.resize(tri_count);
  for (int i = 0; i < tri_count; ++i) {
    Vec3 a(v0[3 * i], v0[3 * i + 1], v0[3 * i + 2]);
    Vec3 c(v1[3 * i], v1[3 * i + 1], v1[3 * i + 2]);
    Vec3 d(v2[3 * i], v2[3 * i + 1], v2[3 * i + 2]);
    AABB box;
    box.grow(a);
    box.grow(c);
    box.grow(d);
    b->tri_box[i] = box;
    b->centroid[i] = Vec3((box.lo.x + box.hi.x) * 0.5f,
                          (box.lo.y + box.hi.y) * 0.5f,
                          (box.lo.z + box.hi.z) * 0.5f);
    b->order[i] = i;
  }
  b->nodes.reserve(2 * tri_count);
  b->build(0, tri_count);
  b->thread_links();
  return b;
}

int32_t bvh_num_nodes(void* handle) {
  return static_cast<int32_t>(static_cast<Builder*>(handle)->nodes.size());
}

// Copies flat arrays out. Caller allocates:
//   node_min/node_max: (N,3) f32; first/count/miss/right/axis: (N,) i32;
//   tri_order: (T,) i32.
void bvh_export(void* handle, float* node_min, float* node_max,
                int32_t* first, int32_t* count, int32_t* miss,
                int32_t* right, int32_t* axis, int32_t* tri_order) {
  auto* b = static_cast<Builder*>(handle);
  int n = static_cast<int>(b->nodes.size());
  for (int i = 0; i < n; ++i) {
    const Node& nd = b->nodes[i];
    node_min[3 * i] = nd.lo.x;
    node_min[3 * i + 1] = nd.lo.y;
    node_min[3 * i + 2] = nd.lo.z;
    node_max[3 * i] = nd.hi.x;
    node_max[3 * i + 1] = nd.hi.y;
    node_max[3 * i + 2] = nd.hi.z;
    first[i] = nd.first;
    count[i] = nd.count;
    miss[i] = nd.miss;
    right[i] = nd.right;
    axis[i] = nd.axis;
  }
  std::memcpy(tri_order, b->order.data(), b->order.size() * sizeof(int32_t));
}

void bvh_free(void* handle) { delete static_cast<Builder*>(handle); }

}  // extern "C"
