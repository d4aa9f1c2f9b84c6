// Native host-side kernels for voxelhex_tpu.
//
// The render-resident BitGrid (dense occupancy pyramid + color grid) is
// rebuilt whenever scenes load or stream; for multi-million-voxel scenes the
// NumPy path spends seconds in per-node Python dispatch and large
// transposes.  These C++ kernels do the same work in one pass over flat
// x-fastest arrays (idx = x + y*S + z*S^2):
//
//  * rasterize_flat: walk the flat boxtree snapshot (same descriptor
//    encoding as voxelhex_tpu.tree.flat: -1 empty, bit30 solid, else brick
//    pool index; internal children are node keys) and paint dense occupancy
//    + color grids, stretching/slicing bricks for uniform/undersized cells.
//  * pack_level: fold a dense cell grid into per-block 64-bit occupancy
//    words (bit s = cx + 4*cy + 16*cz) plus the next-coarser cell grid.
//
// Built as a plain shared library with extern "C" entry points; Python binds
// via ctypes (voxelhex_tpu/native.py) and falls back to NumPy when absent.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <utility>
#include <vector>

namespace {

constexpr int32_t EMPTY_DESC = -1;
constexpr int32_t SOLID_FLAG = 1 << 30;
constexpr uint16_t COLOR_EMPTY = 0xFFFF;
constexpr uint16_t COLOR_NONE = 0xFFFE;

struct Frame {
    int32_t key;
    int32_t x, y, z;
    int32_t size;
};

}  // namespace

extern "C" {

// Paint one brick descriptor spanning `extent` voxels at (x0,y0,z0).
static void paint_desc(const int32_t* bricks, int brick_dim, int n_bricks,
                       int32_t desc, int x0, int y0, int z0, int extent,
                       int S, uint8_t* occ, uint16_t* colors) {
    if (desc == EMPTY_DESC) return;
    const int64_t S2 = (int64_t)S * S;
    if (desc & SOLID_FLAG) {
        int32_t v = desc & (SOLID_FLAG - 1);
        uint16_t c = v >= COLOR_NONE ? COLOR_NONE : (uint16_t)v;
        for (int z = z0; z < z0 + extent; ++z)
            for (int y = y0; y < y0 + extent; ++y) {
                int64_t base = (int64_t)x0 + (int64_t)y * S + (int64_t)z * S2;
                for (int x = 0; x < extent; ++x) {
                    occ[base + x] = 1;
                    colors[base + x] = c;
                }
            }
        return;
    }
    if (desc < 0 || desc >= n_bricks) return;
    const int d = brick_dim;
    const int32_t* brick = bricks + (int64_t)desc * d * d * d;
    // brick layout: flat x-fastest within the brick (bx + by*d + bz*d^2)
    if (extent >= d) {
        int f = extent / d;  // voxel stretch factor (uniform-leaf LOD)
        for (int bz = 0; bz < d; ++bz)
            for (int by = 0; by < d; ++by)
                for (int bx = 0; bx < d; ++bx) {
                    int32_t v = brick[bx + by * d + bz * d * d];
                    if (v == EMPTY_DESC) continue;
                    uint16_t c = v >= COLOR_NONE ? COLOR_NONE : (uint16_t)v;
                    for (int dz = 0; dz < f; ++dz)
                        for (int dy = 0; dy < f; ++dy) {
                            int64_t base = (int64_t)(x0 + bx * f)
                                + (int64_t)(y0 + by * f + dy) * S
                                + (int64_t)(z0 + bz * f + dz) * S2;
                            for (int dx = 0; dx < f; ++dx) {
                                occ[base + dx] = 1;
                                colors[base + dx] = c;
                            }
                        }
                }
    } else {
        // cell smaller than the brick: take the low corner sub-cube
        for (int bz = 0; bz < extent; ++bz)
            for (int by = 0; by < extent; ++by)
                for (int bx = 0; bx < extent; ++bx) {
                    int32_t v = brick[bx + by * d + bz * d * d];
                    if (v == EMPTY_DESC) continue;
                    uint16_t c = v >= COLOR_NONE ? COLOR_NONE : (uint16_t)v;
                    int64_t idx = (int64_t)(x0 + bx) + (int64_t)(y0 + by) * S
                        + (int64_t)(z0 + bz) * S2;
                    occ[idx] = 1;
                    colors[idx] = c;
                }
    }
}

// Rasterize a flat boxtree snapshot into dense occ (u8) + colors (u16)
// grids of S^3 entries (x-fastest).  Buffers must be pre-zeroed /
// pre-filled with COLOR_EMPTY by the caller.
void rasterize_flat(const uint32_t* node_meta, const int32_t* node_children,
                    const int32_t* bricks, int32_t n_nodes, int32_t n_bricks,
                    int32_t brick_dim, int32_t S,
                    uint8_t* occ, uint16_t* colors) {
    std::vector<Frame> stack;
    stack.push_back({0, 0, 0, 0, S});
    while (!stack.empty()) {
        Frame f = stack.back();
        stack.pop_back();
        if (f.key < 0 || f.key >= n_nodes) continue;
        uint32_t meta = node_meta[f.key];
        int cell = f.size / 4;
        const int32_t* row = node_children + (int64_t)f.key * 64;
        if (meta & 2) {  // uniform: one brick over the whole node
            paint_desc(bricks, brick_dim, n_bricks, row[0], f.x, f.y, f.z,
                       f.size, S, occ, colors);
        } else if (meta & 1) {  // leaf: 64 bricks
            for (int s = 0; s < 64; ++s) {
                if (row[s] == EMPTY_DESC) continue;
                paint_desc(bricks, brick_dim, n_bricks, row[s],
                           f.x + (s % 4) * cell, f.y + ((s / 4) % 4) * cell,
                           f.z + (s / 16) * cell, cell, S, occ, colors);
            }
        } else {  // internal
            for (int s = 0; s < 64; ++s) {
                int32_t child = row[s];
                if (child < 0) continue;
                stack.push_back({child, f.x + (s % 4) * cell,
                                 f.y + ((s / 4) % 4) * cell,
                                 f.z + (s / 16) * cell, cell});
            }
        }
    }
}

// Fold a dense cell grid (c^3 u8, x-fastest; c padded to a multiple of 4 by
// the caller) into per-block 64-bit occupancy words and the coarser grid.
// lo/hi have (c/4)^3 entries (x-fastest flat block index); coarse likewise.
void pack_level(const uint8_t* grid, int32_t c,
                uint32_t* lo, uint32_t* hi, uint8_t* coarse) {
    const int n = c / 4;
    const int64_t c2 = (int64_t)c * c;
    for (int bz = 0; bz < n; ++bz)
        for (int by = 0; by < n; ++by)
            for (int bx = 0; bx < n; ++bx) {
                uint64_t w = 0;
                for (int z = 0; z < 4; ++z)
                    for (int y = 0; y < 4; ++y) {
                        int64_t base = (int64_t)(bx * 4)
                            + (int64_t)(by * 4 + y) * c
                            + (int64_t)(bz * 4 + z) * c2;
                        for (int x = 0; x < 4; ++x)
                            if (grid[base + x])
                                w |= 1ull << (x + y * 4 + z * 16);
                    }
                int64_t b = (int64_t)bx + (int64_t)by * n + (int64_t)bz * n * n;
                lo[b] = (uint32_t)(w & 0xFFFFFFFFu);
                hi[b] = (uint32_t)(w >> 32);
                coarse[b] = w != 0;
            }
}

// Rasterize a window [wx, wx+wsize) x ... of the flat boxtree into dense
// occ/colors buffers of wsize^3 (x-fastest), for the streaming layer: the
// tree walk skips nodes outside the window, so paging a region touches only
// overlapping content.
void rasterize_window(const uint32_t* node_meta, const int32_t* node_children,
                      const int32_t* bricks, int32_t n_nodes, int32_t n_bricks,
                      int32_t brick_dim, int32_t S,
                      int32_t wx, int32_t wy, int32_t wz, int32_t wsize,
                      uint8_t* occ, uint16_t* colors) {
    const int64_t W2 = (int64_t)wsize * wsize;
    const int d = brick_dim;
    std::vector<Frame> stack;
    stack.push_back({0, 0, 0, 0, S});
    auto paint_window = [&](int32_t desc, int x0, int y0, int z0, int extent) {
        if (desc == EMPTY_DESC) return;
        int lx = x0 > wx ? x0 : wx, hx = x0 + extent < wx + wsize ? x0 + extent : wx + wsize;
        int ly = y0 > wy ? y0 : wy, hy = y0 + extent < wy + wsize ? y0 + extent : wy + wsize;
        int lz = z0 > wz ? z0 : wz, hz = z0 + extent < wz + wsize ? z0 + extent : wz + wsize;
        if (lx >= hx || ly >= hy || lz >= hz) return;
        bool solid = desc & SOLID_FLAG;
        const int32_t* brick = nullptr;
        uint16_t sc = 0;
        if (solid) {
            int32_t v = desc & (SOLID_FLAG - 1);
            sc = v >= COLOR_NONE ? COLOR_NONE : (uint16_t)v;
        } else {
            if (desc < 0 || desc >= n_bricks) return;
            brick = bricks + (int64_t)desc * d * d * d;
        }
        for (int z = lz; z < hz; ++z)
            for (int y = ly; y < hy; ++y)
                for (int x = lx; x < hx; ++x) {
                    int64_t di = (int64_t)(x - wx) + (int64_t)(y - wy) * wsize
                        + (int64_t)(z - wz) * W2;
                    if (solid) {
                        occ[di] = 1;
                        colors[di] = sc;
                    } else {
                        // voxel of the (possibly stretched) brick
                        int bx_, by_, bz_;
                        if (extent >= d) {
                            int f = extent / d;
                            bx_ = (x - x0) / f; by_ = (y - y0) / f; bz_ = (z - z0) / f;
                        } else {
                            bx_ = x - x0; by_ = y - y0; bz_ = z - z0;
                        }
                        int32_t v = brick[bx_ + by_ * d + bz_ * d * d];
                        if (v == EMPTY_DESC) continue;
                        occ[di] = 1;
                        colors[di] = v >= COLOR_NONE ? COLOR_NONE : (uint16_t)v;
                    }
                }
    };
    while (!stack.empty()) {
        Frame f = stack.back();
        stack.pop_back();
        if (f.key < 0 || f.key >= n_nodes) continue;
        // skip nodes outside the window
        if (f.x >= wx + wsize || f.y >= wy + wsize || f.z >= wz + wsize ||
            f.x + f.size <= wx || f.y + f.size <= wy || f.z + f.size <= wz)
            continue;
        uint32_t meta = node_meta[f.key];
        int cell = f.size / 4;
        const int32_t* row = node_children + (int64_t)f.key * 64;
        if (meta & 2) {
            paint_window(row[0], f.x, f.y, f.z, f.size);
        } else if (meta & 1) {
            for (int s = 0; s < 64; ++s) {
                if (row[s] == EMPTY_DESC) continue;
                paint_window(row[s], f.x + (s % 4) * cell,
                             f.y + ((s / 4) % 4) * cell,
                             f.z + (s / 16) * cell, cell);
            }
        } else {
            for (int s = 0; s < 64; ++s) {
                int32_t child = row[s];
                if (child < 0) continue;
                stack.push_back({child, f.x + (s % 4) * cell,
                                 f.y + ((s / 4) % 4) * cell,
                                 f.z + (s / 16) * cell, cell});
            }
        }
    }
}

// Batched region rasterize + occupancy-word pack for the streaming layer:
// K rsize^3 windows in ONE call — one ctypes crossing (and one GIL release)
// covers a whole paging batch, where the per-region path paid a Python
// submit + ctypes call + numpy packing per region (the async-upload
// worker's contention source on the fly-over).  Each region's dense grid
// is also folded into its 4^3-block 64-bit occupancy words in the same
// pass (bit s = cx + 4*cy + 16*cz, x-fastest block order — bit-identical
// to render/bitgrid._pack_bits).
void rasterize_regions(const uint32_t* node_meta, const int32_t* node_children,
                       const int32_t* bricks, int32_t n_nodes, int32_t n_bricks,
                       int32_t brick_dim, int32_t S,
                       const int32_t* corners /*[k,3] world voxels*/,
                       int32_t k, int32_t rsize,
                       uint8_t* occ /*[k, rsize^3]*/,
                       uint16_t* colors /*[k, rsize^3]*/,
                       uint32_t* lo /*[k, (rsize/4)^3]*/, uint32_t* hi) {
    const int64_t r3 = (int64_t)rsize * rsize * rsize;
    const int32_t n = rsize / 4;
    const int64_t n3 = (int64_t)n * n * n;
    for (int32_t i = 0; i < k; ++i) {
        uint8_t* o = occ + i * r3;
        uint16_t* c = colors + i * r3;
        std::memset(o, 0, (size_t)r3);
        for (int64_t j = 0; j < r3; ++j) c[j] = COLOR_EMPTY;
        const int32_t* cr = corners + 3 * i;
        if (cr[0] < S && cr[1] < S && cr[2] < S)
            rasterize_window(node_meta, node_children, bricks, n_nodes,
                             n_bricks, brick_dim, S, cr[0], cr[1], cr[2],
                             rsize, o, c);
        uint32_t* pl = lo + i * n3;
        uint32_t* ph = hi + i * n3;
        std::memset(pl, 0, (size_t)n3 * 4);
        std::memset(ph, 0, (size_t)n3 * 4);
        for (int32_t z = 0; z < rsize; ++z)
            for (int32_t y = 0; y < rsize; ++y) {
                const uint8_t* row =
                    o + (int64_t)y * rsize + (int64_t)z * rsize * rsize;
                const int64_t wbase =
                    (int64_t)(y >> 2) * n + (int64_t)(z >> 2) * n * n;
                const int sbase = 4 * (y & 3) + 16 * (z & 3);
                for (int32_t x = 0; x < rsize; ++x) {
                    if (!row[x]) continue;
                    int s = (x & 3) + sbase;
                    int64_t w = (x >> 2) + wbase;
                    if (s < 32) pl[w] |= 1u << s;
                    else ph[w] |= 1u << (s - 32);
                }
            }
    }
}

// Rasterize a REGION^3 window from dense source coordinates: helper for the
// streaming layer — copies with bounds clipping from a source grid.
void copy_region(const uint8_t* src_occ, const uint16_t* src_col, int32_t S,
                 int32_t x0, int32_t y0, int32_t z0, int32_t extent,
                 uint8_t* dst_occ, uint16_t* dst_col) {
    const int64_t S2 = (int64_t)S * S;
    for (int z = 0; z < extent; ++z)
        for (int y = 0; y < extent; ++y)
            for (int x = 0; x < extent; ++x) {
                int64_t di = (int64_t)x + (int64_t)y * extent
                    + (int64_t)z * extent * extent;
                int sx = x0 + x, sy = y0 + y, sz = z0 + z;
                if (sx < 0 || sy < 0 || sz < 0 || sx >= S || sy >= S || sz >= S) {
                    dst_occ[di] = 0;
                    dst_col[di] = COLOR_EMPTY;
                } else {
                    int64_t si = (int64_t)sx + (int64_t)sy * S + (int64_t)sz * S2;
                    dst_occ[di] = src_occ[si];
                    dst_col[di] = src_col[si];
                }
            }
}

// ---------------------------------------------------------------------------
// Bulk voxel->brick grouping (the from_voxels hot loop).
//
// Two-call protocol so the caller can size the output arrays:
//  1. bulk_group_sort: computes per-voxel sort keys (cell_id * d^3 +
//     flat-in-brick == the voxel's linear id grouped brick-major), sorts, and
//     returns the number of distinct bricks M.
//  2. bulk_group_fill: single pass over the sorted order filling the brick
//     pool (last duplicate wins, like np.unique on reversed input), per-brick
//     4x4x4-downsampled 64-bit occupancy, and solid flags (all d^3 voxels
//     present and equal).
// ---------------------------------------------------------------------------

void bulk_group_sort(const int64_t* pos /*[n,3]*/, int64_t n, int32_t size,
                     int32_t d, int64_t* keys /*[n] out*/,
                     int64_t* order /*[n] out*/, int64_t* m_out /*[1] out*/) {
    const int64_t cpa = size / d;
    const int64_t d3 = (int64_t)d * d * d;
    for (int64_t i = 0; i < n; ++i) {
        int64_t x = pos[i * 3], y = pos[i * 3 + 1], z = pos[i * 3 + 2];
        int64_t cell = (x / d) + (y / d) * cpa + (z / d) * cpa * cpa;
        int64_t flat = (x % d) + (y % d) * d + (z % d) * d * d;
        keys[i] = cell * d3 + flat;
    }
    std::vector<std::pair<int64_t, int64_t>> kv(n);
    for (int64_t i = 0; i < n; ++i) kv[i] = {keys[i], i};
    std::sort(kv.begin(), kv.end());  // (key, original index): stable by pair
    int64_t m = 0;
    int64_t prev_cell = -1;
    for (int64_t i = 0; i < n; ++i) {
        order[i] = kv[i].second;
        keys[i] = kv[i].first;  // keys returned in sorted order
        int64_t cell = kv[i].first / d3;
        if (cell != prev_cell) {
            ++m;
            prev_cell = cell;
        }
    }
    m_out[0] = m;
}

void bulk_group_fill(const uint32_t* packed, const int64_t* keys_sorted,
                     const int64_t* order, int64_t n, int32_t d,
                     uint32_t empty_voxel,
                     int64_t* uniq_cells /*[M] out*/,
                     uint32_t* bricks /*[M*d^3] out, prefilled empty*/,
                     uint64_t* occ /*[M] out*/,
                     uint8_t* solid /*[M] out*/) {
    const int64_t d3 = (int64_t)d * d * d;
    int64_t m = -1;
    int64_t prev_cell = -1;
    uint32_t first_val = 0;
    bool all_equal = true;
    int64_t count = 0;
    auto finish_cell = [&]() {
        if (m >= 0) solid[m] = (all_equal && count == d3) ? 1 : 0;
    };
    for (int64_t i = 0; i < n; ++i) {
        // last duplicate wins: skip unless this is the final entry of the run
        if (i + 1 < n && keys_sorted[i + 1] == keys_sorted[i]) continue;
        int64_t cell = keys_sorted[i] / d3;
        int64_t flat = keys_sorted[i] % d3;
        if (cell != prev_cell) {
            finish_cell();
            ++m;
            uniq_cells[m] = cell;
            occ[m] = 0;
            first_val = packed[order[i]];
            all_equal = true;
            count = 0;
            prev_cell = cell;
        }
        uint32_t v = packed[order[i]];
        if (v == empty_voxel) continue;
        bricks[m * d3 + flat] = v;
        ++count;
        if (v != first_val) all_equal = false;
        // 4x4x4-downsampled occupancy bit(s) for this voxel
        int wx = (int)(flat % d), wy = (int)((flat / d) % d), wz = (int)(flat / (d * d));
        if (d >= 4) {
            int f = d / 4;
            occ[m] |= 1ull << ((wx / f) + (wy / f) * 4 + (wz / f) * 16);
        } else if (d == 2) {
            for (int dz = 0; dz < 2; ++dz)
                for (int dy = 0; dy < 2; ++dy)
                    for (int dx = 0; dx < 2; ++dx)
                        occ[m] |= 1ull
                            << ((wx * 2 + dx) + (wy * 2 + dy) * 4 + (wz * 2 + dz) * 16);
        } else {  // d == 1
            occ[m] = ~0ull;
        }
    }
    finish_cell();
}

}  // extern "C"
