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
#include <queue>
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
    int max_nodes = 0;     // >0: abort once the node count exceeds this
    bool aborted = false;  // (the caller will retry at a coarser block)
    long long pending_lb = 0;  // provable minimum nodes still owed by
                               // right-siblings queued on the recursion
                               // stack (each subtree over R tris needs
                               // >= 2*ceil(R/max_leaf)-1 nodes)

    long long min_nodes(long long r) const {
        return 2 * ((r + max_leaf - 1) / max_leaf) - 1;
    }
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
        if (aborted) return 0;
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
        // provable-infeasibility abort: nodes emitted so far + the
        // minimum this subtree still needs + the minimum owed by queued
        // right-siblings already exceeds the budget — the caller will
        // retry with a coarser block, so stop paying for this tree now
        if (max_nodes > 0 &&
            static_cast<long long>(leaf_start.size())
                + (min_nodes(count) - 1) + pending_lb > max_nodes) {
            aborted = true;
            return 0;
        }

        int axis = 0;
        float extent = -1.0f;
        for (int a = 0; a < 3; ++a) {
            float e = cbounds.hi[a] - cbounds.lo[a];
            if (e > extent) { extent = e; axis = a; }
        }

        bool make_leaf = count <= max_leaf;
        int mid = first;
        if (!make_leaf && extent <= 1e-12f) {
            // all centroids coincide: SAH cannot bin, but an over-full
            // leaf would exceed the kernel's block capacity (and break
            // the min-nodes lower bound the abort relies on) — split the
            // range down the middle; both children carry the same box
            mid = first + count / 2;
        } else if (!make_leaf) {
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

        long long lb_right = min_nodes(first + count - mid);
        pending_lb += lb_right;
        int left = build(first, mid - first);
        pending_lb -= lb_right;
        int right = build(mid, first + count - mid);
        subtree[node] = 1 + subtree[left] + subtree[right];
        return node;
    }
};

}  // namespace

// ---------------------------------------------------------------------------
// SBVH: binned SAH with spatial splits (Stich et al., HPG 2009).
//
// Motivation (docs/perf_budget.md §6 lever 2): the packet kernel's leaf-
// visit union waste is partly leaf-overlap driven — large/thin diagonal
// triangles (floors, columns, foliage cards) inflate every leaf AABB they
// touch. Spatial splits let a triangle be *referenced* by several leaves,
// each reference clipped to its node's slab, so leaf boxes stay tight.
// References are duplicated under a budget; leaves therefore index
// triangles through a non-injective `order` (the packet kernel's pages
// store original triangle ids, so duplicate references simply report the
// same hit — closest/any-hit semantics are unaffected).
// ---------------------------------------------------------------------------

namespace {

struct Ref {
    int tri;
    AABB box;
};

// Clip triangle t's polygon to the axis slab [lo, hi], intersect the
// resulting bounds with `within` (the reference's current box, which
// carries earlier clips). Returns an empty (default) AABB when the
// intersection is void.
AABB clip_tri_slab(const float *v0, const float *v1, const float *v2,
                   int t, int axis, float lo, float hi, const AABB &within) {
    float poly[9][3];
    int n = 3;
    for (int a = 0; a < 3; ++a) {
        poly[0][a] = v0[3 * t + a];
        poly[1][a] = v1[3 * t + a];
        poly[2][a] = v2[3 * t + a];
    }
    float tmp[9][3];
    // two half-space clips: x[axis] >= lo, then x[axis] <= hi
    for (int pass = 0; pass < 2; ++pass) {
        float plane = pass == 0 ? lo : hi;
        float sign = pass == 0 ? 1.0f : -1.0f;
        // a plane that keeps every vertex leaves the polygon unchanged
        // (every point copied in order, no crossings) — skip the rebuild
        bool all_kept = true;
        for (int i = 0; i < n; ++i)
            if (sign * (poly[i][axis] - plane) < 0.0f) {
                all_kept = false;
                break;
            }
        if (all_kept) continue;
        int m = 0;
        for (int i = 0; i < n; ++i) {
            const float *a = poly[i];
            const float *b = poly[(i + 1) % n];
            float da = sign * (a[axis] - plane);
            float db = sign * (b[axis] - plane);
            if (da >= 0.0f) {
                std::memcpy(tmp[m++], a, sizeof(float) * 3);
            }
            if ((da >= 0.0f) != (db >= 0.0f)) {
                float f = da / (da - db);
                for (int k = 0; k < 3; ++k)
                    tmp[m][k] = a[k] + f * (b[k] - a[k]);
                ++m;
            }
        }
        std::memcpy(poly, tmp, sizeof(float) * 3 * m);
        n = m;
        if (n == 0) return AABB();
    }
    AABB out;
    for (int i = 0; i < n; ++i) out.grow_point(poly[i]);
    // respect earlier clips on other axes + guard fp drift
    for (int a = 0; a < 3; ++a) {
        out.lo[a] = std::max(out.lo[a], within.lo[a]);
        out.hi[a] = std::min(out.hi[a], within.hi[a]);
        if (out.lo[a] > out.hi[a]) return AABB();
    }
    return out;
}

// Convex polygon buffer for the sweep-split spatial binner. A triangle
// split by up to kNumBins-1 parallel planes gains at most one vertex per
// split.
struct Poly {
    float p[3 + kNumBins][3];
    int n = 0;
};

// Split `in` by the plane x[axis] = plane into the `below` piece
// (x <= plane) and the `above` remainder (x >= plane). Points on the
// plane land in both (harmless for bounds growing).
void split_poly(const Poly &in, int axis, float plane,
                Poly &below, Poly &above) {
    below.n = 0;
    above.n = 0;
    for (int i = 0; i < in.n; ++i) {
        const float *a = in.p[i];
        const float *b = in.p[(i + 1) % in.n];
        float da = a[axis] - plane;
        float db = b[axis] - plane;
        if (da <= 0.0f) std::memcpy(below.p[below.n++], a, sizeof(float) * 3);
        if (da >= 0.0f) std::memcpy(above.p[above.n++], a, sizeof(float) * 3);
        if ((da < 0.0f && db > 0.0f) || (da > 0.0f && db < 0.0f)) {
            float f = da / (da - db);
            float *lo_pt = below.p[below.n++];
            for (int k = 0; k < 3; ++k) lo_pt[k] = a[k] + f * (b[k] - a[k]);
            std::memcpy(above.p[above.n++], lo_pt, sizeof(float) * 3);
        }
    }
}

// Grow `box` by the bounds of `piece` intersected with `within`
// (the reference's carried box — same clamp semantics as clip_tri_slab).
void grow_by_piece(AABB &box, const Poly &piece, const AABB &within) {
    if (piece.n == 0) return;
    AABB out;
    for (int i = 0; i < piece.n; ++i) out.grow_point(piece.p[i]);
    for (int a = 0; a < 3; ++a) {
        out.lo[a] = std::max(out.lo[a], within.lo[a]);
        out.hi[a] = std::min(out.hi[a], within.hi[a]);
        if (out.lo[a] > out.hi[a]) return;
    }
    box.grow(out);
}

struct SBuilder {
    const float *v0;
    const float *v1;
    const float *v2;
    int max_leaf;
    float root_area = 0.0f;
    long long dup_budget = 0;   // extra references allowed
    float alpha = 1e-5f;        // overlap gate for spatial tries (Stich's
                                // recommendation; raise to trade tree
                                // quality for build speed)
    int max_nodes = 0;          // >0: abort once node count exceeds this
    int spatial_min_count = 0;  // spatial splits only at nodes with >=
                                // this many refs (0 = everywhere); ">=
                                // num_tris/k" restricts them to the top
                                // levels where overlap hurts most
    bool aborted = false;
    long long pending_lb = 0;   // minimum nodes owed by queued subtrees

    long long min_nodes(long long r) const {
        return 2 * ((r + max_leaf - 1) / max_leaf) - 1;
    }

    std::vector<int> order;        // tri id per reference, leaves contiguous
    std::vector<float> node_lo;
    std::vector<float> node_hi;
    std::vector<int> leaf_start;
    std::vector<int> leaf_count;
    std::vector<int> subtree;

    AABB tri_full_box(int t) const {
        AABB b;
        b.grow_point(&v0[3 * t]);
        b.grow_point(&v1[3 * t]);
        b.grow_point(&v2[3 * t]);
        return b;
    }

    int build(std::vector<Ref> &refs) {
        if (aborted) return 0;
        AABB bounds, cbounds;
        for (const Ref &r : refs) {
            bounds.grow(r.box);
            for (int a = 0; a < 3; ++a) {
                float c = 0.5f * (r.box.lo[a] + r.box.hi[a]);
                cbounds.lo[a] = std::min(cbounds.lo[a], c);
                cbounds.hi[a] = std::max(cbounds.hi[a], c);
            }
        }
        int count = static_cast<int>(refs.size());
        int node = static_cast<int>(leaf_start.size());
        for (int a = 0; a < 3; ++a) {
            node_lo.push_back(bounds.lo[a]);
            node_hi.push_back(bounds.hi[a]);
        }
        leaf_start.push_back(-1);
        leaf_count.push_back(0);
        subtree.push_back(1);
        // provable-infeasibility abort (references only duplicate, never
        // merge, so a subtree over R refs needs >= 2*ceil(R/block)-1
        // nodes): stop as soon as emitted + owed minimums exceed the
        // budget — the courtyard's infeasible block-32 tree aborts ~20%
        // in rather than 60%
        if (max_nodes > 0 &&
            static_cast<long long>(leaf_start.size())
                + (min_nodes(count) - 1) + pending_lb > max_nodes) {
            aborted = true;
            return 0;
        }

        // same leafing policy as the object-split builder: a leaf visit
        // costs a full block regardless of fill, so never split below the
        // block size
        if (count <= max_leaf) {
            leaf_start[node] = static_cast<int>(order.size());
            leaf_count[node] = count;
            for (const Ref &r : refs) order.push_back(r.tri);
            return node;
        }

        int caxis = 0;
        float cextent = -1.0f;
        for (int a = 0; a < 3; ++a) {
            float e = cbounds.hi[a] - cbounds.lo[a];
            if (e > cextent) { cextent = e; caxis = a; }
        }

        // ---- object split (binned SAH over reference centroids) ----
        float obj_cost = FLT_MAX;
        float obj_plane = 0.0f;
        bool have_obj = false;
        AABB obj_l_box, obj_r_box;
        if (count > 1 && cextent > 1e-12f) {
            AABB bin_bounds[kNumBins];
            int bin_count[kNumBins] = {0};
            float k = kNumBins * (1.0f - 1e-6f) / cextent;
            for (const Ref &r : refs) {
                float c = 0.5f * (r.box.lo[caxis] + r.box.hi[caxis]);
                int b = static_cast<int>(k * (c - cbounds.lo[caxis]));
                b = std::min(std::max(b, 0), kNumBins - 1);
                bin_count[b]++;
                bin_bounds[b].grow(r.box);
            }
            AABB racc[kNumBins];
            int rcnt[kNumBins];
            AABB acc;
            int rc = 0;
            for (int b = kNumBins - 1; b >= 1; --b) {
                acc.grow(bin_bounds[b]);
                rc += bin_count[b];
                racc[b] = acc;
                rcnt[b] = rc;
            }
            AABB lacc;
            int lc = 0;
            for (int b = 0; b < kNumBins - 1; ++b) {
                lacc.grow(bin_bounds[b]);
                lc += bin_count[b];
                if (lc == 0 || rcnt[b + 1] == 0) continue;
                float cost = lacc.half_area() * lc
                           + racc[b + 1].half_area() * rcnt[b + 1];
                if (cost < obj_cost) {
                    obj_cost = cost;
                    obj_plane = cbounds.lo[caxis]
                              + (b + 1) * cextent / kNumBins;
                    obj_l_box = lacc;
                    obj_r_box = racc[b + 1];
                    have_obj = true;
                }
            }
        }

        // ---- spatial split (SBVH): tried when the object split's
        // children overlap significantly and duplication budget remains --
        float sp_cost = FLT_MAX;
        int sp_axis = -1;
        float sp_plane = 0.0f;
        bool try_spatial = dup_budget > 0 && count > 1
                        && count >= spatial_min_count;
        if (try_spatial && have_obj) {
            AABB ov;
            for (int a = 0; a < 3; ++a) {
                ov.lo[a] = std::max(obj_l_box.lo[a], obj_r_box.lo[a]);
                ov.hi[a] = std::min(obj_l_box.hi[a], obj_r_box.hi[a]);
                if (ov.lo[a] > ov.hi[a]) { try_spatial = false; break; }
            }
            if (try_spatial && ov.half_area() <= alpha * root_area)
                try_spatial = false;
        }
        if (try_spatial) {
            for (int axis = 0; axis < 3; ++axis) {
                float ext = bounds.hi[axis] - bounds.lo[axis];
                if (ext <= 1e-12f) continue;
                AABB bin_box[kNumBins];
                int entry[kNumBins] = {0};
                int exit_[kNumBins] = {0};
                float k = kNumBins * (1.0f - 1e-6f) / ext;
                for (const Ref &r : refs) {
                    int b0 = static_cast<int>(
                        k * (r.box.lo[axis] - bounds.lo[axis]));
                    int b1 = static_cast<int>(
                        k * (r.box.hi[axis] - bounds.lo[axis]));
                    b0 = std::min(std::max(b0, 0), kNumBins - 1);
                    b1 = std::min(std::max(b1, b0), kNumBins - 1);
                    entry[b0]++;
                    exit_[b1]++;
                    if (b0 == b1) {
                        bin_box[b0].grow(r.box);
                    } else {
                        // sweep-split (Stich 2009 §4.2): walk the bin
                        // planes left to right, splitting a carried
                        // polygon once per plane — instead of re-clipping
                        // the full triangle twice per crossed bin (was
                        // 85% of the whole build in the courtyard
                        // profile, 23.8M clip calls)
                        Poly cur;
                        cur.n = 3;
                        float pmin = FLT_MAX, pmax = -FLT_MAX;
                        for (int a = 0; a < 3; ++a) {
                            cur.p[0][a] = v0[3 * r.tri + a];
                            cur.p[1][a] = v1[3 * r.tri + a];
                            cur.p[2][a] = v2[3 * r.tri + a];
                        }
                        for (int i = 0; i < 3; ++i) {
                            pmin = std::min(pmin, cur.p[i][axis]);
                            pmax = std::max(pmax, cur.p[i][axis]);
                        }
                        Poly piece, carry;
                        // a previously-split (duplicated) reference's box
                        // can be narrower than its original triangle on
                        // this axis; trim the polygon to the covered bin
                        // range first so the extreme bins' boxes stay as
                        // tight as the per-bin clip they replaced
                        float blo0 = bounds.lo[axis] + b0 * ext / kNumBins;
                        float bhi1 = bounds.lo[axis]
                                   + (b1 + 1) * ext / kNumBins;
                        if (pmin < blo0) {
                            split_poly(cur, axis, blo0, piece, carry);
                            cur = carry;
                        }
                        if (pmax > bhi1 && cur.n) {
                            split_poly(cur, axis, bhi1, piece, carry);
                            cur = piece;
                        }
                        for (int b = b0; b < b1 && cur.n; ++b) {
                            float bhi = bounds.lo[axis]
                                      + (b + 1) * ext / kNumBins;
                            split_poly(cur, axis, bhi, piece, carry);
                            grow_by_piece(bin_box[b], piece, r.box);
                            cur = carry;
                        }
                        grow_by_piece(bin_box[b1], cur, r.box);
                    }
                }
                AABB racc[kNumBins];
                int rcnt[kNumBins];
                AABB acc;
                int rc = 0;
                for (int b = kNumBins - 1; b >= 1; --b) {
                    acc.grow(bin_box[b]);
                    rc += exit_[b];
                    racc[b] = acc;
                    rcnt[b] = rc;
                }
                AABB lacc;
                int lc = 0;
                for (int b = 0; b < kNumBins - 1; ++b) {
                    lacc.grow(bin_box[b]);
                    lc += entry[b];
                    if (lc == 0 || rcnt[b + 1] == 0) continue;
                    float cost = lacc.half_area() * lc
                               + racc[b + 1].half_area() * rcnt[b + 1];
                    if (cost < sp_cost) {
                        sp_cost = cost;
                        sp_axis = axis;
                        sp_plane = bounds.lo[axis]
                                 + (b + 1) * ext / kNumBins;
                    }
                }
            }
        }

        float best_split = std::min(obj_cost, sp_cost);
        if (best_split == FLT_MAX) {
            // degenerate: forced median object split on the widest axis
            std::nth_element(
                refs.begin(), refs.begin() + count / 2, refs.end(),
                [&](const Ref &x, const Ref &y) {
                    return x.box.lo[caxis] + x.box.hi[caxis]
                         < y.box.lo[caxis] + y.box.hi[caxis];
                });
            std::vector<Ref> left(refs.begin(), refs.begin() + count / 2);
            std::vector<Ref> right(refs.begin() + count / 2, refs.end());
            refs.clear();
            refs.shrink_to_fit();
            long long lb_right = min_nodes(right.size());
            pending_lb += lb_right;
            int l = build(left);
            pending_lb -= lb_right;
            int r = build(right);
            subtree[node] = 1 + subtree[l] + subtree[r];
            return node;
        }
        std::vector<Ref> left, right;
        left.reserve(count);
        right.reserve(count);
        if (sp_cost < obj_cost) {
            // spatial split: straddling references are duplicated, their
            // boxes clipped to each side (tri re-clipped for tightness)
            for (const Ref &r : refs) {
                if (r.box.hi[sp_axis] <= sp_plane) {
                    left.push_back(r);
                } else if (r.box.lo[sp_axis] >= sp_plane) {
                    right.push_back(r);
                } else if (dup_budget <= 0) {
                    float c = 0.5f * (r.box.lo[sp_axis] + r.box.hi[sp_axis]);
                    (c < sp_plane ? left : right).push_back(r);
                } else {
                    AABB lb = clip_tri_slab(v0, v1, v2, r.tri, sp_axis,
                                            -FLT_MAX, sp_plane, r.box);
                    AABB rb = clip_tri_slab(v0, v1, v2, r.tri, sp_axis,
                                            sp_plane, FLT_MAX, r.box);
                    bool lok = lb.lo[0] <= lb.hi[0];
                    bool rok = rb.lo[0] <= rb.hi[0];
                    if (lok && rok) {
                        left.push_back({r.tri, lb});
                        right.push_back({r.tri, rb});
                        --dup_budget;
                    } else if (lok) {
                        left.push_back({r.tri, lb});
                    } else if (rok) {
                        right.push_back({r.tri, rb});
                    } else {
                        // clipped away on both sides (fp edge): keep whole
                        float c = 0.5f
                                * (r.box.lo[sp_axis] + r.box.hi[sp_axis]);
                        (c < sp_plane ? left : right).push_back(r);
                    }
                }
            }
        } else {
            for (const Ref &r : refs) {
                float c = 0.5f * (r.box.lo[caxis] + r.box.hi[caxis]);
                (c < obj_plane ? left : right).push_back(r);
            }
        }
        if (left.empty() || right.empty()
            || (static_cast<int>(left.size()) >= count
                && static_cast<int>(right.size()) >= count)) {
            // no progress (empty side, or a spatial split that duplicated
            // every reference): median split on original refs instead.
            // De-duplicate back to one ref per tri with its pre-split box.
            std::vector<Ref> all;
            all.reserve(count);
            size_t li = 0, ri = 0;
            while (li < left.size() || ri < right.size()) {
                if (li < left.size() && ri < right.size()
                    && left[li].tri == right[ri].tri) {
                    AABB m = left[li].box;
                    m.grow(right[ri].box);
                    all.push_back({left[li].tri, m});
                    ++li; ++ri; ++dup_budget;
                } else if (li < left.size()) {
                    all.push_back(left[li++]);
                } else {
                    all.push_back(right[ri++]);
                }
            }
            std::nth_element(
                all.begin(), all.begin() + all.size() / 2, all.end(),
                [&](const Ref &x, const Ref &y) {
                    return x.box.lo[caxis] + x.box.hi[caxis]
                         < y.box.lo[caxis] + y.box.hi[caxis];
                });
            left.assign(all.begin(), all.begin() + all.size() / 2);
            right.assign(all.begin() + all.size() / 2, all.end());
        }
        refs.clear();
        refs.shrink_to_fit();
        long long lb_right = min_nodes(right.size());
        pending_lb += lb_right;
        int l = build(left);
        pending_lb -= lb_right;
        int r = build(right);
        subtree[node] = 1 + subtree[l] + subtree[r];
        return node;
    }
};

// Pre-split of oversized triangle references (Ernst & Greiner 2007,
// "Early Split Clipping", adapted to the SBVH pipeline): before the
// recursion, repeatedly halve the reference whose clipped bounds have
// the largest half-area, until every reference's area falls under
// `cut_area` or `budget` duplications are spent. Huge triangles (floors,
// walls) otherwise glue distant subtrees together and the per-node
// spatial pass rediscovers the same planes many times over; splitting
// them once up front is cheaper and frees per-node duplication budget
// for genuine overlap. Splits consume the same reference budget the
// spatial pass draws from.
void presplit_refs(std::vector<Ref> &refs, const float *v0,
                   const float *v1, const float *v2,
                   float cut_area, long long &budget) {
    auto cmp = [](const Ref &x, const Ref &y) {
        return x.box.half_area() < y.box.half_area();
    };
    std::priority_queue<Ref, std::vector<Ref>, decltype(cmp)> heap(
        cmp, std::move(refs));
    refs.clear();
    while (budget > 0 && !heap.empty()
           && heap.top().box.half_area() > cut_area) {
        Ref r = heap.top();
        heap.pop();
        int axis = 0;
        float ext = -1.0f;
        for (int a = 0; a < 3; ++a) {
            float e = r.box.hi[a] - r.box.lo[a];
            if (e > ext) { ext = e; axis = a; }
        }
        float mid = 0.5f * (r.box.lo[axis] + r.box.hi[axis]);
        AABB lb = clip_tri_slab(v0, v1, v2, r.tri, axis,
                                -FLT_MAX, mid, r.box);
        AABB rb = clip_tri_slab(v0, v1, v2, r.tri, axis,
                                mid, FLT_MAX, r.box);
        bool lok = lb.lo[0] <= lb.hi[0];
        bool rok = rb.lo[0] <= rb.hi[0];
        if (lok && rok) {
            heap.push({r.tri, lb});
            heap.push({r.tri, rb});
            --budget;
        } else {
            // needle along the split axis (fp edge): keep whole — pushing
            // the surviving half back would loop forever on the same ref
            refs.push_back(r);
        }
    }
    while (!heap.empty()) {
        refs.push_back(heap.top());
        heap.pop();
    }
}

}  // namespace

extern "C" {

// Returns the node count (preorder). Caller provides output buffers sized
// for the worst case: num_nodes ≤ 2*ceil(num_tris/1)-1; order[num_tris].
// miss[i] = preorder index to jump to on a miss (== num_nodes at the end).
int pt_build_sah_bvh(const float *tri_lo, const float *tri_hi,
                     const float *centroid, int num_tris, int max_leaf,
                     int *out_order, float *out_node_lo, float *out_node_hi,
                     int *out_miss, int *out_leaf_start,
                     int *out_leaf_count, int max_nodes) {
    if (num_tris <= 0) return 0;
    Builder b;
    b.tri_lo = tri_lo;
    b.tri_hi = tri_hi;
    b.centroid = centroid;
    b.max_leaf = std::max(1, max_leaf);
    b.max_nodes = max_nodes;
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
    if (b.aborted) return -2;   // node budget exceeded mid-build

    int n = static_cast<int>(b.leaf_start.size());
    std::memcpy(out_order, b.order.data(), sizeof(int) * num_tris);
    std::memcpy(out_node_lo, b.node_lo.data(), sizeof(float) * 3 * n);
    std::memcpy(out_node_hi, b.node_hi.data(), sizeof(float) * 3 * n);
    std::memcpy(out_leaf_start, b.leaf_start.data(), sizeof(int) * n);
    std::memcpy(out_leaf_count, b.leaf_count.data(), sizeof(int) * n);
    for (int i = 0; i < n; ++i) out_miss[i] = i + b.subtree[i];
    return n;
}

// SBVH build (spatial splits; references may duplicate triangles).
// Inputs: v0/v1/v2 (num_tris, 3) triangle vertices; max_refs caps the
// total reference count (callers size out_order[max_refs] and node
// buffers [2*max_refs+1]). Writes the reference count to *out_num_refs;
// returns the node count (preorder), 0 on empty input.
int pt_build_sbvh(const float *v0, const float *v1, const float *v2,
                  int num_tris, int max_leaf, int max_refs,
                  int *out_order, float *out_node_lo, float *out_node_hi,
                  int *out_miss, int *out_leaf_start, int *out_leaf_count,
                  int *out_num_refs, float alpha, int max_nodes,
                  float presplit_mult, int spatial_min_count) {
    if (num_tris <= 0 || max_refs < num_tris) return 0;
    SBuilder b;
    b.v0 = v0;
    b.v1 = v1;
    b.v2 = v2;
    b.max_leaf = std::max(1, max_leaf);
    b.dup_budget = max_refs - num_tris;
    b.alpha = alpha;
    b.max_nodes = max_nodes;
    b.spatial_min_count = spatial_min_count;

    std::vector<Ref> refs(num_tris);
    AABB root;
    double area_sum = 0.0;
    for (int t = 0; t < num_tris; ++t) {
        refs[t] = {t, b.tri_full_box(t)};
        root.grow(refs[t].box);
        area_sum += refs[t].box.half_area();
    }
    b.root_area = root.half_area();
    if (presplit_mult > 0.0f && num_tris > 1) {
        // split refs larger than presplit_mult x the mean box area; cap
        // the spend at half the duplication budget so the per-node
        // spatial pass keeps room to fix genuine overlap
        long long pre_budget = b.dup_budget / 2;
        long long before = pre_budget;
        presplit_refs(refs, v0, v1, v2,
                      presplit_mult
                          * static_cast<float>(area_sum / num_tris),
                      pre_budget);
        b.dup_budget -= before - pre_budget;
    }
    size_t reserve = 2 * static_cast<size_t>(max_refs);
    b.order.reserve(max_refs);
    b.node_lo.reserve(3 * reserve);
    b.node_hi.reserve(3 * reserve);
    b.leaf_start.reserve(reserve);
    b.leaf_count.reserve(reserve);
    b.subtree.reserve(reserve);

    b.build(refs);
    if (b.aborted) return -2;   // node budget exceeded mid-build

    int n = static_cast<int>(b.leaf_start.size());
    int nrefs = static_cast<int>(b.order.size());
    std::memcpy(out_order, b.order.data(), sizeof(int) * nrefs);
    std::memcpy(out_node_lo, b.node_lo.data(), sizeof(float) * 3 * n);
    std::memcpy(out_node_hi, b.node_hi.data(), sizeof(float) * 3 * n);
    std::memcpy(out_leaf_start, b.leaf_start.data(), sizeof(int) * n);
    std::memcpy(out_leaf_count, b.leaf_count.data(), sizeof(int) * n);
    for (int i = 0; i < n; ++i) out_miss[i] = i + b.subtree[i];
    *out_num_refs = nrefs;
    return n;
}

}  // extern "C"
