// Exact Ising ground states by branch-and-bound enumeration.
//
// E(s) = c0 + 1/2 ||M s||^2 exactly, with M = diag(sqrt(lmax - eig)) V^T
// (the Python side builds M and its QR factor R; see nmc_tpu/exact.py
// solve_exact_enum). For upper-triangular R and z enumerated from the
// last coordinate, rows i..n-1 of R z are fully determined once
// z_i..z_{n-1} are fixed, so the accumulated squared norm is an exact
// lower bound on ||R z||^2 — Fincke-Pohst enumeration over the +-1 cube,
// with two sharpenings:
//   * incremental prefix sums f[k] = sum_{j fixed} R[k,j] z_j for the
//     not-yet-determined rows (O(depth) update per node), and
//   * a box bound on every remaining row: row k < i can contribute at
//     least max(0, |f_k| - sum_{j=k..i-1} |R[k,j]|)^2.
// The search proves optimality: if it completes without improving the
// initial radius, the incumbent is the exact ground state.
//
// Built by nmc_tpu/native/__init__.py with g++ -O3 at first use; plain C
// ABI via ctypes (no pybind11 in this image).

#include <cmath>
#include <cstdint>
#include <vector>

extern "C" {

// Returns node count. *status: 0 = search exhausted (proof), 1 = node cap
// hit (no proof). *found: 1 iff best_z/best_r2 were improved at least once.
long long nmc_exact_enumerate(
    int n,
    const double* R,       // [n*n] row-major, upper triangular
    const double* W,       // [n*n] row-major: W[k*n+i] = sum_{j=k..i-1} |R[k,j]|
    double* best_r2,       // in: strict radius^2 to beat; out: best found
    double* best_z,        // out [n], valid iff *found
    int* found,
    int* status,
    long long max_nodes) {
  std::vector<double> f(n, 0.0);      // f[k] = sum_{j>level} R[k,j] z_j
  std::vector<double> z(n, 0.0);
  std::vector<double> acc(n + 1, 0.0);
  std::vector<int> branch(n, 0);      // 0 = first branch, 1 = second, 2 = done
  std::vector<double> first(n, 0.0);  // first-tried sign per level

  *found = 0;
  *status = 0;
  long long nodes = 0;

  // top level: z_{n-1} pinned to +1 (global spin-flip symmetry)
  int i = n - 1;
  z[i] = 1.0;
  {
    double r = R[i * n + i];  // f[i] = 0 at the top
    acc[i] = r * r;
    for (int k = 0; k < i; ++k) f[k] += R[k * n + i];
  }
  if (acc[i] >= *best_r2) return 1;   // degenerate: nothing can beat it
  --i;
  branch[i] = 0;

  while (i < n - 1) {
    if (branch[i] == 0) {
      // entering this level: pick the smaller-|row| sign first
      double t = f[i];
      double d = R[i * n + i];
      first[i] = (std::fabs(d + t) <= std::fabs(-d + t)) ? 1.0 : -1.0;
    }
    if (branch[i] >= 2) {
      // backtrack
      ++i;
      if (i >= n - 1) break;
      double zi = z[i];
      for (int k = 0; k < i; ++k) f[k] -= R[k * n + i] * zi;
      ++branch[i];
      continue;
    }
    double zi = branch[i] == 0 ? first[i] : -first[i];
    ++nodes;
    if (max_nodes > 0 && nodes > max_nodes) { *status = 1; return nodes; }

    double r = R[i * n + i] * zi + f[i];
    double a2 = acc[i + 1] + r * r;
    bool prune = a2 >= *best_r2;
    if (!prune && i > 0) {
      // box bound over the remaining rows
      double lb = a2;
      const double* Wrow = W;
      for (int k = 0; k < i; ++k) {
        double slack = std::fabs(f[k] + R[k * n + i] * zi) - W[k * n + i];
        if (slack > 0.0) {
          lb += slack * slack;
          if (lb >= *best_r2) { prune = true; break; }
        }
      }
      (void)Wrow;
    }
    if (prune) {
      ++branch[i];
      continue;
    }
    if (i == 0) {
      // complete assignment strictly inside the radius: new incumbent
      z[0] = zi;
      *best_r2 = a2;
      *found = 1;
      for (int k = 0; k < n; ++k) best_z[k] = z[k];
      ++branch[i];
      continue;
    }
    // descend
    z[i] = zi;
    acc[i] = a2;
    for (int k = 0; k < i; ++k) f[k] += R[k * n + i] * zi;
    --i;
    branch[i] = 0;
  }
  return nodes;
}

}  // extern "C"
