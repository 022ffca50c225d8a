// Native host-side setup kernels for the TPU SEM Poisson framework.
//
// The reference implements its entire setup pipeline in C++ (the 4791-line
// Subdomain constructor, /root/reference/subdomain.tpp, plus the CSR host
// assembly csr_matrix.tpp:94-180). The TPU rebuild keeps setup on the host
// but moves the throughput-critical loops into this small C++ library,
// loaded via ctypes (polynomial_..._tpu/utils/native.py) with pure-numpy
// fallbacks when the .so has not been built.
//
// Exposed C ABI:
//   p1_fem_coo_3d / p1_fem_coo_2d : P1 simplicial stiffness COO emission
//       on structured node grids (the hot loop of the reference's FEM
//       assembly, subdomain.tpp:2845-3038). Kuhn/Freudenthal subdivision,
//       identical numerics to amg/fem.py.
//   coo_to_csr : sort + duplicate-sum COO->CSR (csr_matrix.tpp:94-180).
//
// Build: make -C native   (g++ -O3 -fopenmp -shared -fPIC)

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <vector>
#include <parallel/algorithm>

extern "C" {

// ---------------------------------------------------------------------------
// P1 stiffness on a structured 3-D node grid.
//
// X: (nz, ny, nx, 3) C-order node coordinates.
// rows/cols/vals: caller-allocated, size (nz-1)*(ny-1)*(nx-1)*96
//   (6 tets x 16 entries per hex cell).
// Returns the number of entries written.

static const int KUHN_PERMS[6][3] = {
    {0, 1, 2}, {0, 2, 1}, {1, 0, 2}, {1, 2, 0}, {2, 0, 1}, {2, 1, 0}};

int64_t p1_fem_coo_3d(const double* X, int64_t nz, int64_t ny, int64_t nx,
                      int64_t* rows, int64_t* cols, double* vals) {
    const int64_t cz = nz - 1, cy = ny - 1, cx = nx - 1;
    const int64_t ncell = cz * cy * cx;

    // corner (dz, dy, dx) offsets for the 4 vertices of each of 6 tets
    int corner[6][4][3];
    for (int t = 0; t < 6; ++t) {
        int acc[3] = {0, 0, 0};
        corner[t][0][0] = corner[t][0][1] = corner[t][0][2] = 0;
        for (int s = 0; s < 3; ++s) {
            acc[KUHN_PERMS[t][s]] = 1;
            corner[t][s + 1][0] = acc[0];  // z
            corner[t][s + 1][1] = acc[1];  // y
            corner[t][s + 1][2] = acc[2];  // x
        }
    }

#pragma omp parallel for schedule(static)
    for (int64_t c = 0; c < ncell; ++c) {
        const int64_t icz = c / (cy * cx);
        const int64_t icy = (c / cx) % cy;
        const int64_t icx = c % cx;
        int64_t out = c * 96;
        for (int t = 0; t < 6; ++t) {
            double v[4][3];
            int64_t nid[4];
            for (int a = 0; a < 4; ++a) {
                const int64_t z = icz + corner[t][a][0];
                const int64_t y = icy + corner[t][a][1];
                const int64_t x = icx + corner[t][a][2];
                nid[a] = (z * ny + y) * nx + x;
                const double* p = X + 3 * nid[a];
                v[a][0] = p[0]; v[a][1] = p[1]; v[a][2] = p[2];
            }
            // edge matrix M[a][d] = v[a+1][d] - v[0][d]
            double M[3][3];
            for (int a = 0; a < 3; ++a)
                for (int d = 0; d < 3; ++d)
                    M[a][d] = v[a + 1][d] - v[0][d];
            const double det =
                M[0][0] * (M[1][1] * M[2][2] - M[1][2] * M[2][1]) -
                M[0][1] * (M[1][0] * M[2][2] - M[1][2] * M[2][0]) +
                M[0][2] * (M[1][0] * M[2][1] - M[1][1] * M[2][0]);
            const double vol = (det < 0 ? -det : det) / 6.0;
            const double inv_det = 1.0 / det;
            // Minv (adjugate / det); grads[a+1][d] = Minv[d][a]
            double Minv[3][3];
            Minv[0][0] = (M[1][1] * M[2][2] - M[1][2] * M[2][1]) * inv_det;
            Minv[0][1] = (M[0][2] * M[2][1] - M[0][1] * M[2][2]) * inv_det;
            Minv[0][2] = (M[0][1] * M[1][2] - M[0][2] * M[1][1]) * inv_det;
            Minv[1][0] = (M[1][2] * M[2][0] - M[1][0] * M[2][2]) * inv_det;
            Minv[1][1] = (M[0][0] * M[2][2] - M[0][2] * M[2][0]) * inv_det;
            Minv[1][2] = (M[0][2] * M[1][0] - M[0][0] * M[1][2]) * inv_det;
            Minv[2][0] = (M[1][0] * M[2][1] - M[1][1] * M[2][0]) * inv_det;
            Minv[2][1] = (M[0][1] * M[2][0] - M[0][0] * M[2][1]) * inv_det;
            Minv[2][2] = (M[0][0] * M[1][1] - M[0][1] * M[1][0]) * inv_det;
            double g[4][3];
            for (int a = 0; a < 3; ++a)
                for (int d = 0; d < 3; ++d)
                    g[a + 1][d] = Minv[d][a];
            for (int d = 0; d < 3; ++d)
                g[0][d] = -(g[1][d] + g[2][d] + g[3][d]);
            for (int a = 0; a < 4; ++a)
                for (int b = 0; b < 4; ++b) {
                    rows[out] = nid[a];
                    cols[out] = nid[b];
                    vals[out] = vol * (g[a][0] * g[b][0] + g[a][1] * g[b][1]
                                       + g[a][2] * g[b][2]);
                    ++out;
                }
        }
    }
    return ncell * 96;
}

// ---------------------------------------------------------------------------
// P1 stiffness on a structured 2-D node grid (2 triangles per quad,
// diagonal (0,0)-(1,1)); entries size (ny-1)*(nx-1)*18.

int64_t p1_fem_coo_2d(const double* X, int64_t ny, int64_t nx,
                      int64_t* rows, int64_t* cols, double* vals) {
    const int64_t cy = ny - 1, cx = nx - 1;
    const int64_t ncell = cy * cx;
    static const int TRI[2][3][2] = {
        {{0, 0}, {0, 1}, {1, 1}}, {{0, 0}, {1, 1}, {1, 0}}};

#pragma omp parallel for schedule(static)
    for (int64_t c = 0; c < ncell; ++c) {
        const int64_t icy = c / cx;
        const int64_t icx = c % cx;
        int64_t out = c * 18;
        for (int t = 0; t < 2; ++t) {
            double v[3][2];
            int64_t nid[3];
            for (int a = 0; a < 3; ++a) {
                const int64_t y = icy + TRI[t][a][0];
                const int64_t x = icx + TRI[t][a][1];
                nid[a] = y * nx + x;
                v[a][0] = X[2 * nid[a]];
                v[a][1] = X[2 * nid[a] + 1];
            }
            double M[2][2];
            for (int a = 0; a < 2; ++a)
                for (int d = 0; d < 2; ++d)
                    M[a][d] = v[a + 1][d] - v[0][d];
            const double det = M[0][0] * M[1][1] - M[0][1] * M[1][0];
            const double area = (det < 0 ? -det : det) / 2.0;
            const double inv_det = 1.0 / det;
            double Minv[2][2] = {{M[1][1] * inv_det, -M[0][1] * inv_det},
                                 {-M[1][0] * inv_det, M[0][0] * inv_det}};
            double g[3][2];
            for (int a = 0; a < 2; ++a)
                for (int d = 0; d < 2; ++d)
                    g[a + 1][d] = Minv[d][a];
            g[0][0] = -(g[1][0] + g[2][0]);
            g[0][1] = -(g[1][1] + g[2][1]);
            for (int a = 0; a < 3; ++a)
                for (int b = 0; b < 3; ++b) {
                    rows[out] = nid[a];
                    cols[out] = nid[b];
                    vals[out] = area * (g[a][0] * g[b][0]
                                        + g[a][1] * g[b][1]);
                    ++out;
                }
        }
    }
    return ncell * 18;
}

// ---------------------------------------------------------------------------
// COO -> CSR with duplicate summation (csr_matrix.tpp:94-180): sort by
// (row, col), compress. indptr: size nrows+1; out_cols/out_vals: size nnz
// (upper bound = nnz_in). Returns deduplicated nnz.

int64_t coo_to_csr(const int64_t* rows, const int64_t* cols,
                   const double* vals, int64_t nnz_in,
                   int64_t nrows, int64_t ncols,
                   int64_t* indptr, int64_t* out_cols, double* out_vals) {
    // pack (row, col) into one sortable key: cache-friendlier than an
    // index-indirection comparator, and parallel-sortable
    struct Ent { uint64_t key; double val; };
    std::vector<Ent> ents(nnz_in);
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < nnz_in; ++i)
        ents[i] = {static_cast<uint64_t>(rows[i]) * static_cast<uint64_t>(ncols)
                       + static_cast<uint64_t>(cols[i]),
                   vals[i]};
#ifdef _GLIBCXX_PARALLEL
    __gnu_parallel::sort(ents.begin(), ents.end(),
                         [](const Ent& a, const Ent& b) { return a.key < b.key; });
#else
    std::sort(ents.begin(), ents.end(),
              [](const Ent& a, const Ent& b) { return a.key < b.key; });
#endif
    int64_t out = -1;
    uint64_t prev = ~0ull;
    std::memset(indptr, 0, sizeof(int64_t) * (nrows + 1));
    for (int64_t k = 0; k < nnz_in; ++k) {
        const uint64_t key = ents[k].key;
        if (key == prev) {
            out_vals[out] += ents[k].val;
        } else {
            ++out;
            out_cols[out] = static_cast<int64_t>(key % ncols);
            out_vals[out] = ents[k].val;
            indptr[key / ncols + 1] = out + 1;
            prev = key;
        }
    }
    for (int64_t r = 1; r <= nrows; ++r)
        if (indptr[r] == 0) indptr[r] = indptr[r - 1];
        // rows with entries already hold cumulative counts
    return out + 1;
}

}  // extern "C"
