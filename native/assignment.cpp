// Dense linear-assignment solver (Jonker-Volgenant shortest augmenting path).
//
// The tracking association step (posepipeline_tpu/tracking/tracker.py) solves
// many small rectangular assignment problems per video — the same role the
// reference delegates to scipy / vendored DeepSORT matching code
// (reference wrappers/deep_sort_yolov4/deep_sort/linear_assignment.py).
// This native solver removes the scipy call overhead from the host-side hot
// loop; exposed via a C ABI for ctypes.
//
// Rectangular (n <= m) cost matrices; rows are padded conceptually by solving
// column potentials over the m columns. Complexity O(n^2 m).

#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

extern "C" {

// cost: n*m row-major. row_out[n]: assigned column per row (always filled;
// caller applies its own cost threshold). Returns 0 on success.
int solve_assignment(const double* cost, int32_t n, int32_t m, int32_t* row_out) {
    if (n <= 0 || m <= 0 || n > m) return 1;
    const double INF = std::numeric_limits<double>::infinity();

    // JV shortest augmenting path with potentials (u over rows, v over cols).
    std::vector<double> u(n + 1, 0.0), v(m + 1, 0.0);
    std::vector<int32_t> p(m + 1, 0);      // p[j]: row assigned to column j (1-based)
    std::vector<int32_t> way(m + 1, 0);

    for (int32_t i = 1; i <= n; ++i) {
        p[0] = i;
        int32_t j0 = 0;
        std::vector<double> minv(m + 1, INF);
        std::vector<char> used(m + 1, 0);
        do {
            used[j0] = 1;
            int32_t i0 = p[j0], j1 = 0;
            double delta = INF;
            for (int32_t j = 1; j <= m; ++j) {
                if (used[j]) continue;
                double cur = cost[(i0 - 1) * m + (j - 1)] - u[i0] - v[j];
                if (cur < minv[j]) { minv[j] = cur; way[j] = j0; }
                if (minv[j] < delta) { delta = minv[j]; j1 = j; }
            }
            for (int32_t j = 0; j <= m; ++j) {
                if (used[j]) { u[p[j]] += delta; v[j] -= delta; }
                else         { minv[j] -= delta; }
            }
            j0 = j1;
        } while (p[j0] != 0);
        do {
            int32_t j1 = way[j0];
            p[j0] = p[j1];
            j0 = j1;
        } while (j0);
    }

    for (int32_t j = 1; j <= m; ++j)
        if (p[j] > 0) row_out[p[j] - 1] = j - 1;
    return 0;
}

// Batched pairwise IoU for TLHW boxes (host-side association matrices).
void iou_matrix(const double* a, int32_t n, const double* b, int32_t m, double* out) {
    for (int32_t i = 0; i < n; ++i) {
        const double ax0 = a[i * 4], ay0 = a[i * 4 + 1];
        const double aw = a[i * 4 + 2], ah = a[i * 4 + 3];
        const double ax1 = ax0 + aw, ay1 = ay0 + ah;
        const double area_a = aw * ah;
        for (int32_t j = 0; j < m; ++j) {
            const double bx0 = b[j * 4], by0 = b[j * 4 + 1];
            const double bw = b[j * 4 + 2], bh = b[j * 4 + 3];
            const double ix = std::min(ax1, bx0 + bw) - std::max(ax0, bx0);
            const double iy = std::min(ay1, by0 + bh) - std::max(ay0, by0);
            double iou = 0.0;
            if (ix > 0 && iy > 0) {
                const double inter = ix * iy;
                iou = inter / (area_a + bw * bh - inter + 1e-8);
            }
            out[i * m + j] = iou;
        }
    }
}

}  // extern "C"
