// Binned-SAH BVH builder (native).
//
// TPU-native counterpart of the reference's driver-side acceleration
// structure build (vkCmdBuildAccelerationStructuresKHR with
// PREFER_FAST_TRACE, AccelerationStructure.cpp:319-324): the GPU driver's
// optimized builder is replaced by this C++ binned surface-area-heuristic
// builder. It emits the tree directly in the threaded-preorder layout the
// Pallas packet kernel consumes (node AABBs + miss links + leaf ids) plus
// a triangle ordering that makes every leaf a contiguous block — the
// property the kernel's dense leaf-page DMA requires.
//
// Used for static scenes; animated scenes rebuild a Morton tree on-device
// (pt/accel/pallas_bvh.py) like the reference's ALLOW_UPDATE path.
//
// Exposed via a plain C ABI for ctypes (no pybind11 in this environment).

#include <algorithm>
#include <cfloat>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int kNumBins = 16;

struct AABB {
    float lo[3] = {FLT_MAX, FLT_MAX, FLT_MAX};
    float hi[3] = {-FLT_MAX, -FLT_MAX, -FLT_MAX};

    void grow(const AABB &other) {
        for (int a = 0; a < 3; ++a) {
            lo[a] = std::min(lo[a], other.lo[a]);
            hi[a] = std::max(hi[a], other.hi[a]);
        }
    }
    void grow_point(const float *p) {
        for (int a = 0; a < 3; ++a) {
            lo[a] = std::min(lo[a], p[a]);
            hi[a] = std::max(hi[a], p[a]);
        }
    }
    float half_area() const {
        float dx = std::max(0.0f, hi[0] - lo[0]);
        float dy = std::max(0.0f, hi[1] - lo[1]);
        float dz = std::max(0.0f, hi[2] - lo[2]);
        return dx * dy + dy * dz + dz * dx;
    }
};

struct Builder {
    const float *tri_lo;
    const float *tri_hi;
    const float *centroid;
    int max_leaf;
    float block_cost;      // effective per-leaf-visit cost (the packet
                           // kernel tests a full block per visit, so a
                           // leaf costs ~block regardless of fill)
    static constexpr float kTraversalCost = 2.0f;
    std::vector<int> order;        // triangle ids, leaves contiguous
    // preorder node emission
    std::vector<float> node_lo;
    std::vector<float> node_hi;
    std::vector<int> leaf_start;   // -1 internal
    std::vector<int> leaf_count;
    std::vector<int> subtree;      // node count of each subtree (for miss)

    AABB tri_box(int t) const {
        AABB b;
        for (int a = 0; a < 3; ++a) {
            b.lo[a] = tri_lo[3 * t + a];
            b.hi[a] = tri_hi[3 * t + a];
        }
        return b;
    }

    // emits the subtree over order[first, first+count); returns node index
    int build(int first, int count) {
        AABB bounds, cbounds;
        for (int i = first; i < first + count; ++i) {
            bounds.grow(tri_box(order[i]));
            cbounds.grow_point(&centroid[3 * order[i]]);
        }
        int node = static_cast<int>(leaf_start.size());
        for (int a = 0; a < 3; ++a) {
            node_lo.push_back(bounds.lo[a]);
            node_hi.push_back(bounds.hi[a]);
        }
        leaf_start.push_back(-1);
        leaf_count.push_back(0);
        subtree.push_back(1);

        int axis = 0;
        float extent = -1.0f;
        for (int a = 0; a < 3; ++a) {
            float e = cbounds.hi[a] - cbounds.lo[a];
            if (e > extent) { extent = e; axis = a; }
        }

        bool make_leaf = count <= max_leaf || extent <= 1e-12f;
        int mid = first;
        if (!make_leaf) {
            // binned SAH along the widest centroid axis
            AABB bin_bounds[kNumBins];
            int bin_count[kNumBins] = {0};
            float k = kNumBins * (1.0f - 1e-6f) / extent;
            for (int i = first; i < first + count; ++i) {
                int b = static_cast<int>(
                    k * (centroid[3 * order[i] + axis] - cbounds.lo[axis]));
                b = std::min(std::max(b, 0), kNumBins - 1);
                bin_count[b]++;
                bin_bounds[b].grow(tri_box(order[i]));
            }
            float right_area[kNumBins];
            AABB acc;
            int right_counts[kNumBins];
            int rc = 0;
            for (int b = kNumBins - 1; b >= 1; --b) {
                acc.grow(bin_bounds[b]);
                rc += bin_count[b];
                right_area[b] = acc.half_area();
                right_counts[b] = rc;
            }
            float best_cost = FLT_MAX;
            int best_split = -1;
            AABB lacc;
            int lc = 0;
            for (int b = 0; b < kNumBins - 1; ++b) {
                lacc.grow(bin_bounds[b]);
                lc += bin_count[b];
                if (lc == 0 || right_counts[b + 1] == 0) continue;
                float cost = lacc.half_area() * lc
                           + right_area[b + 1] * right_counts[b + 1];
                if (cost < best_cost) { best_cost = cost; best_split = b; }
            }
            // cost model for the packet kernel: a leaf visit always tests
            // a full block; an internal step costs ~kTraversalCost tests
            float leaf_cost = bounds.half_area() * block_cost;
            float split_cost = best_cost
                             + kTraversalCost * bounds.half_area();
            if (best_split < 0 ||
                (count <= max_leaf && split_cost >= leaf_cost)) {
                make_leaf = count <= max_leaf;
                if (!make_leaf) {
                    // forced median split (degenerate distribution)
                    mid = first + count / 2;
                    std::nth_element(
                        order.begin() + first, order.begin() + mid,
                        order.begin() + first + count,
                        [&](int x, int y) {
                            return centroid[3 * x + axis] <
                                   centroid[3 * y + axis];
                        });
                }
            } else {
                float split_pos = cbounds.lo[axis]
                                + (best_split + 1) * extent / kNumBins;
                auto it = std::partition(
                    order.begin() + first, order.begin() + first + count,
                    [&](int t) { return centroid[3 * t + axis] < split_pos; });
                mid = static_cast<int>(it - order.begin());
                if (mid == first || mid == first + count)
                    mid = first + count / 2;   // numeric fallback
            }
        }

        if (make_leaf) {
            leaf_start[node] = first;
            leaf_count[node] = count;
            return node;
        }

        int left = build(first, mid - first);
        int right = build(mid, first + count - mid);
        (void)left;
        subtree[node] = 1 + subtree[left] + subtree[right];
        return node;
    }
};

}  // namespace

extern "C" {

// Returns the node count (preorder). Caller provides output buffers sized
// for the worst case: num_nodes ≤ 2*ceil(num_tris/1)-1; order[num_tris].
// miss[i] = preorder index to jump to on a miss (== num_nodes at the end).
int pt_build_sah_bvh(const float *tri_lo, const float *tri_hi,
                     const float *centroid, int num_tris, int max_leaf,
                     int *out_order, float *out_node_lo, float *out_node_hi,
                     int *out_miss, int *out_leaf_start,
                     int *out_leaf_count) {
    if (num_tris <= 0) return 0;
    Builder b;
    b.tri_lo = tri_lo;
    b.tri_hi = tri_hi;
    b.centroid = centroid;
    b.max_leaf = std::max(1, max_leaf);
    b.block_cost = static_cast<float>(b.max_leaf);
    b.order.resize(num_tris);
    for (int i = 0; i < num_tris; ++i) b.order[i] = i;
    size_t reserve = 2 * static_cast<size_t>(num_tris);
    b.node_lo.reserve(3 * reserve);
    b.node_hi.reserve(3 * reserve);
    b.leaf_start.reserve(reserve);
    b.leaf_count.reserve(reserve);
    b.subtree.reserve(reserve);

    b.build(0, num_tris);

    int n = static_cast<int>(b.leaf_start.size());
    std::memcpy(out_order, b.order.data(), sizeof(int) * num_tris);
    std::memcpy(out_node_lo, b.node_lo.data(), sizeof(float) * 3 * n);
    std::memcpy(out_node_hi, b.node_hi.data(), sizeof(float) * 3 * n);
    std::memcpy(out_leaf_start, b.leaf_start.data(), sizeof(int) * n);
    std::memcpy(out_leaf_count, b.leaf_count.data(), sizeof(int) * n);
    for (int i = 0; i < n; ++i) out_miss[i] = i + b.subtree[i];
    return n;
}

}  // extern "C"
