// AMG setup hot loops (native host runtime).
//
// The smoothed-aggregation hierarchy build (magnetite_tpu/fem/amg.py) is
// host-side by design (irregular, data-dependent, one-time, persisted with
// case checkpoints); these kernels replace its two dominant numpy costs at
// 1M-element scale:
//
//   amg_assemble: the BC-masked closed-form stiffness assembly into the
//     ELL-flat value array -- one pass over elements computing the four
//     2x2-block component fields (k_ab = t/(4A) * B_a^T D B_b expanded;
//     reference math src/solver.rs:204-278) and scatter-adding through the
//     precomputed slot ids. numpy needs four 9E-sized bincount passes plus
//     several [3,3,E] broadcast temporaries.
//
//   sort_reduce_blocks: sum duplicate (int64 key, f64[k] block) entries --
//     the core of every Galerkin-product reduction. numpy's
//     unique+bincount does one argsort plus k bincount passes; here one
//     pair sort + one accumulation pass.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <utility>
#include <vector>

extern "C" {

// Closed-form masked assembly: accumulate the 2x2 pair blocks of every
// element into flat [n_slots, 4] storage (component-major last axis, row
// major), through pair-major slot ids slot_ids_pm[(a*3+b)*E + e].
// coords [N*2], tris [E*3] i32, free_mask [N*2] f64 (1 = unknown DOF).
// Returns 0.
int amg_assemble(const double* coords, const int32_t* tris, int64_t n_elems,
                 const double* free_mask, double e_mod, double nu, double t,
                 const int64_t* slot_ids_pm, double* flat /* [n_slots*4] */) {
  const double d0 = e_mod / (1.0 - nu * nu);
  const double d1 = nu * d0;
  const double d2 = 0.5 * (1.0 - nu) * d0;
  for (int64_t e = 0; e < n_elems; ++e) {
    const int32_t n0 = tris[3 * e], n1 = tris[3 * e + 1], n2 = tris[3 * e + 2];
    const double x0 = coords[2 * n0], y0 = coords[2 * n0 + 1];
    const double x1 = coords[2 * n1], y1 = coords[2 * n1 + 1];
    const double x2 = coords[2 * n2], y2 = coords[2 * n2 + 1];
    const double beta[3] = {y1 - y2, y2 - y0, y0 - y1};
    const double gamma[3] = {x2 - x1, x0 - x2, x1 - x0};
    const double area2 =
        x0 * (y1 - y2) + x1 * (y2 - y0) + x2 * (y0 - y1);
    const double coef = t / (2.0 * area2);
    const int32_t nodes[3] = {n0, n1, n2};
    for (int a = 0; a < 3; ++a) {
      const double fxa = free_mask[2 * nodes[a]];
      const double fya = free_mask[2 * nodes[a] + 1];
      const double ba = beta[a], ga = gamma[a];
      for (int b = 0; b < 3; ++b) {
        const double fxb = free_mask[2 * nodes[b]];
        const double fyb = free_mask[2 * nodes[b] + 1];
        const double bb = beta[b], gb = gamma[b];
        const int64_t slot = slot_ids_pm[(int64_t)(a * 3 + b) * n_elems + e];
        double* out = flat + 4 * slot;
        out[0] += coef * (d0 * ba * bb + d2 * ga * gb) * fxa * fxb;
        out[1] += coef * (d1 * ba * gb + d2 * ga * bb) * fxa * fyb;
        out[2] += coef * (d1 * ga * bb + d2 * ba * gb) * fya * fxb;
        out[3] += coef * (d0 * ga * gb + d2 * ba * bb) * fya * fyb;
      }
    }
  }
  return 0;
}

// Sum duplicate keys: sorts (key, index) pairs, then accumulates the k-wide
// value rows of equal-key runs. out_keys/out_vals must hold m entries;
// returns the number of unique keys.
int64_t sort_reduce_blocks(const int64_t* keys, const double* vals, int64_t m,
                           int64_t k, int64_t* out_keys, double* out_vals) {
  if (m == 0) return 0;
  std::vector<std::pair<int64_t, int64_t>> order(m);
  for (int64_t i = 0; i < m; ++i) order[i] = {keys[i], i};
  std::sort(order.begin(), order.end());
  int64_t u = -1;
  int64_t prev = order[0].first - 1;
  for (int64_t i = 0; i < m; ++i) {
    const int64_t key = order[i].first;
    const double* row = vals + k * order[i].second;
    if (key != prev) {
      ++u;
      out_keys[u] = key;
      std::memcpy(out_vals + k * u, row, sizeof(double) * k);
      prev = key;
    } else {
      double* acc = out_vals + k * u;
      for (int64_t c = 0; c < k; ++c) acc[c] += row[c];
    }
  }
  return u + 1;
}

}  // extern "C"
