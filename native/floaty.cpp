// Native floaty-removal core: multi-mip occupancy clustering.
//
// C++ twin of nerf_glasses_tpu/models/floaty.py (which reimplements the
// reference's NgpGrid, src/floatyremover.h:11-267). The reference's
// hash-set flood fill is the slowest step of its removeFloaties pass;
// this union-find version over the dense [mip][z][y][x] occupancy array
// runs in linear time and is exposed through ctypes
// (nerf_glasses_tpu/models/_native_floaty.py).
//
// Grid layout: occ[mip][z][y][x], 8 mips of 128^3 uint8 (0/1).
// Semantics:
//   - points: occupied cells; mips > 0 skip the interior [32,96)^3
//   - edges: 6-neighborhood in-mip; child boundary cell (coord 0/127)
//     <-> parent cell at 31/96 in mip+1
//   - cluster importance: sum(16 - 2^mip)
//   - output: winning cluster rasterized, plus ancestors in coarser mips
//
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int G = 128;
constexpr int MIPS = 8;
constexpr int64_t MIP_STRIDE = int64_t(G) * G * G;

inline int64_t cell_index(int mip, int x, int y, int z) {
    return ((int64_t(mip) * G + z) * G + y) * G + x;
}

struct UnionFind {
    std::vector<int32_t> parent;
    explicit UnionFind(size_t n) : parent(n) {
        for (size_t i = 0; i < n; ++i) parent[i] = int32_t(i);
    }
    int32_t find(int32_t a) {
        while (parent[a] != a) {
            parent[a] = parent[parent[a]];
            a = parent[a];
        }
        return a;
    }
    void unite(int32_t a, int32_t b) {
        a = find(a);
        b = find(b);
        if (a != b) parent[b] = a;
    }
};

inline bool in_skipped_interior(int mip, int x, int y, int z) {
    return mip > 0 && x >= 32 && x < 96 && y >= 32 && y < 96 &&
           z >= 32 && z < 96;
}

}  // namespace

extern "C" int remove_floaties_native(const uint8_t* occ, uint8_t* out,
                                      int32_t* n_clusters_out) {
    const int64_t total = MIP_STRIDE * MIPS;
    // point ids: dense map cell -> point index (or -1)
    std::vector<int32_t> pid(total, -1);
    std::vector<int32_t> px, py, pz, pm;

    for (int mip = 0; mip < MIPS; ++mip) {
        for (int z = 0; z < G; ++z) {
            for (int y = 0; y < G; ++y) {
                const uint8_t* row = occ + cell_index(mip, 0, y, z);
                for (int x = 0; x < G; ++x) {
                    if (!row[x]) continue;
                    if (in_skipped_interior(mip, x, y, z)) continue;
                    pid[cell_index(mip, x, y, z)] = int32_t(px.size());
                    px.push_back(x);
                    py.push_back(y);
                    pz.push_back(z);
                    pm.push_back(mip);
                }
            }
        }
    }

    const size_t n = px.size();
    if (n == 0) {
        std::memset(out, 0, size_t(total));
        *n_clusters_out = 0;
        return 0;
    }

    UnionFind uf(n);
    std::vector<uint8_t> has_edge(n, 0);

    auto link = [&](int32_t a, int64_t cell) {
        int32_t b = pid[cell];
        if (b >= 0) {
            uf.unite(a, b);
            has_edge[a] = 1;
            has_edge[size_t(b)] = 1;
        }
    };

    for (size_t i = 0; i < n; ++i) {
        const int x = px[i], y = py[i], z = pz[i], mip = pm[i];
        const int32_t a = int32_t(i);
        if (x + 1 < G) link(a, cell_index(mip, x + 1, y, z));
        if (y + 1 < G) link(a, cell_index(mip, x, y + 1, z));
        if (z + 1 < G) link(a, cell_index(mip, x, y, z + 1));
        if (mip < MIPS - 1) {
            // child boundary -> parent neighbor (floatyremover.h:84-101)
            const int mx = 32 + x / 2, my = 32 + y / 2, mz = 32 + z / 2;
            if (x == 0) link(a, cell_index(mip + 1, 31, my, mz));
            if (x == G - 1) link(a, cell_index(mip + 1, 96, my, mz));
            if (y == 0) link(a, cell_index(mip + 1, mx, 31, mz));
            if (y == G - 1) link(a, cell_index(mip + 1, mx, 96, mz));
            if (z == 0) link(a, cell_index(mip + 1, mx, my, 31));
            if (z == G - 1) link(a, cell_index(mip + 1, mx, my, 96));
        }
    }

    // cluster scores: sum(16 - 2^mip); isolated points are noise
    std::vector<double> score(n, 0.0);
    std::vector<uint8_t> is_root_cluster(n, 0);
    int32_t n_clusters = 0;
    for (size_t i = 0; i < n; ++i) {
        if (!has_edge[i]) continue;
        int32_t r = uf.find(int32_t(i));
        if (!is_root_cluster[size_t(r)]) {
            is_root_cluster[size_t(r)] = 1;
            ++n_clusters;
        }
        score[size_t(r)] += 16.0 - double(1 << pm[i]);
    }
    *n_clusters_out = n_clusters;

    std::memset(out, 0, size_t(total));
    if (n_clusters == 0) return 0;

    int32_t best = -1;
    double best_score = -1.0;
    for (size_t i = 0; i < n; ++i) {
        if (is_root_cluster[i] && score[i] > best_score) {
            best_score = score[i];
            best = int32_t(i);
        }
    }

    for (size_t i = 0; i < n; ++i) {
        if (!has_edge[i] || uf.find(int32_t(i)) != best) continue;
        int x = px[i], y = py[i], z = pz[i];
        out[cell_index(pm[i], x, y, z)] = 1;
        // ancestors in coarser mips (to_ngp_grid, floatyremover.h:244-249)
        for (int mip = pm[i] + 1; mip < MIPS; ++mip) {
            x = 32 + x / 2;
            y = 32 + y / 2;
            z = 32 + z / 2;
            out[cell_index(mip, x, y, z)] = 1;
        }
    }
    return 0;
}
