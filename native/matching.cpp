// Min-cost bipartite matching (Jonker-Volgenant shortest augmenting path).
//
// Native replacement for the reference's matching backends: the MATLAB
// devkit's Hungarian.m / MinCostMatching.cpp mex (used by the official
// MODA/MODP path) and scipy's linear_sum_assignment (used by its Python
// port). Exposed to Python via ctypes (vfa_tpu/native/__init__.py).
//
// Solves: given an n x m cost matrix (row-major double), find the
// assignment of each row to a distinct column minimizing total cost,
// assigning min(n, m) pairs. Output: row_to_col[n] with -1 for unassigned
// rows. O(n^2 * m) time, matching scipy's algorithm family.

#include <cfloat>
#include <cstdint>
#include <vector>

namespace {

// Core solver over an n x m submatrix of a row-major buffer with row
// stride `lda` (lda == m for a dense matrix; larger for the padded
// batched layout below).
int solve_lsap_strided(const double* cost, int32_t n, int32_t m, int32_t lda,
                       int32_t* row_to_col) {
  // Transpose internally if rows > cols so we always assign every row
  // of the smaller side.
  const bool transposed = n > m;
  const int32_t R = transposed ? m : n;
  const int32_t C = transposed ? n : m;
  auto at = [&](int32_t r, int32_t c) -> double {
    return transposed ? cost[(int64_t)c * lda + r] : cost[(int64_t)r * lda + c];
  };

  // Dual potentials and matching state. Columns are 1-indexed internally
  // with col 0 as the virtual start.
  std::vector<double> u(R + 1, 0.0), v(C + 1, 0.0);
  std::vector<int32_t> match_col(C + 1, -1);  // col -> row
  std::vector<int32_t> way(C + 1, 0);

  for (int32_t r = 0; r < R; ++r) {
    std::vector<double> minv(C + 1, DBL_MAX);
    std::vector<char> used(C + 1, 0);
    int32_t j0 = 0;
    match_col[0] = r;
    do {
      used[j0] = 1;
      int32_t i0 = match_col[j0], j1 = -1;
      double delta = DBL_MAX;
      for (int32_t j = 1; j <= C; ++j) {
        if (used[j]) continue;
        double cur = at(i0, j - 1) - u[i0 + 1] - v[j];
        if (cur < minv[j]) {
          minv[j] = cur;
          way[j] = j0;
        }
        if (minv[j] < delta) {
          delta = minv[j];
          j1 = j;
        }
      }
      if (j1 < 0) return 1;  // infeasible (should not happen: finite costs)
      for (int32_t j = 0; j <= C; ++j) {
        if (used[j]) {
          u[match_col[j] + 1] += delta;
          v[j] -= delta;
        } else {
          minv[j] -= delta;
        }
      }
      j0 = j1;
    } while (match_col[j0] != -1);
    // augment along the alternating path
    do {
      int32_t j1 = way[j0];
      match_col[j0] = match_col[j1];
      j0 = j1;
    } while (j0);
  }

  for (int32_t i = 0; i < n; ++i) row_to_col[i] = -1;
  for (int32_t j = 1; j <= C; ++j) {
    if (match_col[j] < 0) continue;
    if (transposed) {
      // internal rows are original cols
      row_to_col[j - 1] = match_col[j];
    } else {
      row_to_col[match_col[j]] = j - 1;
    }
  }
  return 0;
}

}  // namespace

extern "C" {

// Returns 0 on success. row_to_col must have space for n ints.
int solve_lsap(const double* cost, int32_t n, int32_t m, int32_t* row_to_col) {
  return solve_lsap_strided(cost, n, m, m, row_to_col);
}

// Batched variant for the vectorized CLEAR-metrics path: `costs` is a
// (batch, pad_n, pad_m) row-major tensor; problem b solves its top-left
// ns[b] x ms[b] submatrix (the padding is never read). row_to_col is
// (batch, pad_n), filled with -1 for unassigned/padded rows. Returns the
// first nonzero solver status, or 0 if all succeed.
int solve_lsap_batch(const double* costs, const int32_t* ns, const int32_t* ms,
                     int32_t batch, int32_t pad_n, int32_t pad_m,
                     int32_t* row_to_col) {
  int status = 0;
  const int64_t cstride = (int64_t)pad_n * pad_m;
  for (int32_t b = 0; b < batch; ++b) {
    int32_t* out = row_to_col + (int64_t)b * pad_n;
    for (int32_t i = 0; i < pad_n; ++i) out[i] = -1;
    if (ns[b] <= 0 || ms[b] <= 0) continue;
    int rc = solve_lsap_strided(costs + b * cstride, ns[b], ms[b], pad_m, out);
    if (rc != 0 && status == 0) status = rc;
  }
  return status;
}

}  // extern "C"
