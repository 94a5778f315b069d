// tinyopt_tpu native micro-runtime.
//
// The TPU path (JAX/XLA) is the right tool for batched and large solves,
// but a single tiny solve (dims <= ~64) is dominated by dispatch latency
// there.  The reference library's headline benchmarks are exactly this
// regime: microsecond dense LM solves on the host (reference:
// /root/reference/benchmarks/dense.cpp:28-114, ~0.6-56 us per solve).
// This translation unit provides that regime natively: a self-contained
// dense Levenberg-Marquardt / Gauss-Newton / gradient-descent core with
// its own small-matrix Cholesky, no external dependencies, exposed with a
// C ABI for ctypes.
//
// Semantics mirror the Python loop (tinyopt_tpu/optimizers/loop.py), which
// itself mirrors the reference optimizer (reference:
// include/tinyopt/optimizers/optimizer.h:243-534): multiplicative diagonal
// damping with an absolute floor for zero diagonals, accept/reject with
// rollback to the last good point, compounded bad factors, the same stop
// codes.  On the accepted path the trajectory (λ schedule, iterates, stop
// reason) is bit-identical to the jitted loop.  Known deviation on the
// REJECTED path: this merged loop rolls back and re-proposes within the
// same iteration, where the reference/jitted loop spends a separate
// evaluate-only iteration at the rolled-back point — the native runtime
// therefore reports fewer iterations on rejection-heavy runs while
// reaching the same optima.
//
// Build: g++ -O3 -fPIC -shared (see native/__init__.py).

#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <memory>

namespace {

constexpr int kMaxDims = 128;  // stack-allocated scratch bound

// grad = J^T r, H = J^T J (full). Residual-major accumulation: J rows are
// contiguous, so the inner loops are unit-stride and auto-vectorize.
void BuildNormalEquations(const double* J, const double* r, int n_res,
                          int dims, double* H, double* g) {
  std::memset(H, 0, sizeof(double) * dims * dims);
  std::memset(g, 0, sizeof(double) * dims);
  for (int i = 0; i < n_res; ++i) {
    const double* Ji = J + static_cast<size_t>(i) * dims;
    const double ri = r[i];
    for (int a = 0; a < dims; ++a) {
      const double v = Ji[a];
      if (v == 0.0) continue;  // sparse rows (e.g. diagonal J) are common
      g[a] += v * ri;
      double* Ha = H + static_cast<size_t>(a) * dims;
      for (int b = a; b < dims; ++b) Ha[b] += v * Ji[b];
    }
  }
  for (int a = 0; a < dims; ++a)
    for (int b = 0; b < a; ++b) H[a * dims + b] = H[b * dims + a];
}

// Solve A x = b for symmetric positive-definite A (row-major, n x n) via
// an in-place Cholesky. Returns false if the factorization fails.
bool CholeskySolve(double* A, double* b, int n) {
  // Factor: A = L L^T, L stored in the lower triangle.
  for (int j = 0; j < n; ++j) {
    double d = A[j * n + j];
    for (int k = 0; k < j; ++k) d -= A[j * n + k] * A[j * n + k];
    if (!(d > 0.0) || !std::isfinite(d)) return false;
    const double lj = std::sqrt(d);
    A[j * n + j] = lj;
    const double inv = 1.0 / lj;
    for (int i = j + 1; i < n; ++i) {
      double s = A[i * n + j];
      for (int k = 0; k < j; ++k) s -= A[i * n + k] * A[j * n + k];
      A[i * n + j] = s * inv;
    }
  }
  // Forward substitution: L y = b.
  for (int i = 0; i < n; ++i) {
    double s = b[i];
    for (int k = 0; k < i; ++k) s -= A[i * n + k] * b[k];
    b[i] = s / A[i * n + i];
  }
  // Back substitution: L^T x = y.
  for (int i = n - 1; i >= 0; --i) {
    double s = b[i];
    for (int k = i + 1; k < n; ++k) s -= A[k * n + i] * b[k];
    b[i] = s / A[i * n + i];
  }
  return true;
}

// Damped Cholesky solve reading H without a pre-copy: L is factored into
// a separate buffer from (H + λ·D) on the fly — skips the O(d²) damped
// copy every proposal costs otherwise.
bool CholeskySolveDamped(const double* H, const double* g, double lam,
                         int n, double* L, double* dx) {
  for (int j = 0; j < n; ++j) {
    const double hjj = H[j * n + j];
    double d = hjj + lam * (hjj == 0.0 ? 1.0 : hjj);
    for (int k = 0; k < j; ++k) d -= L[j * n + k] * L[j * n + k];
    if (!(d > 0.0) || !std::isfinite(d)) return false;
    const double lj = std::sqrt(d);
    L[j * n + j] = lj;
    const double inv = 1.0 / lj;
    for (int i = j + 1; i < n; ++i) {
      double s = H[i * n + j];
      for (int k = 0; k < j; ++k) s -= L[i * n + k] * L[j * n + k];
      L[i * n + j] = s * inv;
    }
  }
  for (int i = 0; i < n; ++i) {
    double s = -g[i];
    for (int k = 0; k < i; ++k) s -= L[i * n + k] * dx[k];
    dx[i] = s / L[i * n + i];
  }
  for (int i = n - 1; i >= 0; --i) {
    double s = dx[i];
    for (int k = i + 1; k < n; ++k) s -= L[k * n + i] * dx[k];
    dx[i] = s / L[i * n + i];
  }
  return true;
}

}  // namespace

extern "C" {

// Residual+Jacobian callback: fill r (n_res) and J (n_res x dims,
// row-major). J may be ignored when jac == 0 (cost-only evaluation).
typedef void (*ResJacFn)(const double* x, double* r, double* J, int jac,
                         void* ctx);

// Stop-reason codes, matching tinyopt_tpu.StopReason / the reference
// (include/tinyopt/stop_reasons.h:14-43).
enum StopReason : int32_t {
  kSolverFailed = -3,
  kSystemHasNaNOrInf = -2,
  kSkipped = -1,
  kNone = 0,
  kMinError = 1,
  kMinRelError = 2,
  kMinDeltaNorm = 3,
  kMinGradNorm = 4,
  kMaxIters = 5,
  kMaxNoDecr = 6,
  kMaxConsecNoDecr = 7,
};

struct NativeOptions {
  int32_t solver_type;  // 0 = LM, 1 = GN, 2 = GD
  int32_t max_iters;
  int32_t max_consec_failures;
  int32_t max_total_failures;
  double min_error;
  double min_rerr_dec;
  double min_step_norm2;
  double min_grad_norm2;
  double damping_init;
  double damping_min;
  double damping_max;
  double good_factor;
  double bad_factor;
  double gd_lr;
};

struct NativeOutput {
  double final_cost;
  int32_t stop_reason;
  int32_t num_iters;
  int32_t num_failures;
  int32_t num_consec_failures;
};

void tinyopt_default_options(NativeOptions* o) {
  o->solver_type = 0;
  o->max_iters = 50;
  o->max_consec_failures = 5;
  o->max_total_failures = 0;
  o->min_error = 1e-12;
  o->min_rerr_dec = 1e-10;
  o->min_step_norm2 = 1e-14;
  o->min_grad_norm2 = 1e-18;
  o->damping_init = 1e-4;
  o->damping_min = 1e-9;
  o->damping_max = 1e9;
  o->good_factor = 1.0 / 3.0;
  o->bad_factor = 2.0;
  o->gd_lr = 1e-3;
}

// Dense NLLS solve. x is updated in place. Scratch sized by the caller:
// r (n_res), J (n_res*dims). Returns out->stop_reason.
int32_t tinyopt_solve(int32_t dims, int32_t n_res, ResJacFn fn, void* ctx,
                      double* x, const NativeOptions* opts,
                      NativeOutput* out, double* r, double* J) {
  out->final_cost = std::numeric_limits<double>::infinity();
  out->stop_reason = kNone;
  out->num_iters = 0;
  out->num_failures = 0;
  out->num_consec_failures = 0;
  if (dims <= 0 || dims > kMaxDims || n_res <= 0) {
    out->stop_reason = kSkipped;
    return out->stop_reason;
  }

  // Two system buffers with pointer swapping on accept: the accepted
  // (H, g) is preserved without any O(d²) copy, and rejected iterations
  // read it directly (the Rebuild(false) shortcut, reference
  // solvers/lm.h:96-105, at zero copy cost).  Stack-allocated (like L
  // below) so the solver is re-entrant: a residual callback may itself
  // invoke tinyopt_solve (bilevel problems) without corrupting the outer
  // solve's accepted system, which static thread_local storage would.
  // Heap-allocated per call: re-entrancy without the ~400 KB of stack
  // frames the automatic arrays cost (nested bilevel solves or callers
  // on small pthread stacks would overflow otherwise; one malloc per
  // solve is noise next to the O(iters · dims³) factorizations).
  std::unique_ptr<double[]> scratch(
      new double[3 * kMaxDims * kMaxDims + 4 * kMaxDims]);
  double* H = scratch.get();  // build target (current candidate's system)
  double* H_bst = H + kMaxDims * kMaxDims;  // last accepted system
  double* L = H_bst + kMaxDims * kMaxDims;  // Cholesky factor scratch
  double* g = L + kMaxDims * kMaxDims;
  double* g_bst = g + kMaxDims;
  double* dx = g_bst + kMaxDims;
  double* x_best = dx + kMaxDims;
  std::memcpy(x_best, x, sizeof(double) * dims);

  const bool is_lm = opts->solver_type == 0;
  const bool is_gd = opts->solver_type == 2;
  double lam = opts->damping_init;
  double bad_factor = opts->bad_factor;
  double best_cost = std::numeric_limits<double>::infinity();
  bool have_good = false;

  const int max_iters = opts->max_iters + 1;
  for (int iter = 0; iter < max_iters; ++iter) {
    out->num_iters = iter + 1;
    // ---- Build: residuals + J at the current x ----
    fn(x, r, J, 1, ctx);
    double cost = 0.0;
    for (int i = 0; i < n_res; ++i) cost += r[i] * r[i];
    if (!std::isfinite(cost)) {
      out->stop_reason = kSystemHasNaNOrInf;
      break;
    }

    BuildNormalEquations(J, r, n_res, dims, H, g);

    // ---- Accept / reject the cost at this point ----
    // λ ordering (matches the reference and the jitted loop): the solve
    // of this iteration's step uses λ as updated by the PREVIOUS
    // iteration's outcome; a GoodStep here only affects the NEXT solve,
    // while a BadStep (rollback + retry) escalates the λ used right away.
    const double lam_pre = lam;
    const double derr = cost - best_cost;
    const bool good = (derr < 0.0) || iter == 0;
    double rel_derr = 0.0;
    if (have_good && best_cost > 1e-12 && std::isfinite(best_cost))
      rel_derr = (best_cost - cost) / best_cost;

    const double* H_use;
    const double* g_use;
    if (good) {
      if (iter > 0) {
        // GoodStep: revert compounded bad factor, shrink lambda.
        double s = opts->good_factor;
        if (bad_factor != opts->bad_factor) s /= bad_factor;
        lam *= s;
        if (lam < opts->damping_min) lam = opts->damping_min;
        bad_factor = opts->bad_factor;
      }
      best_cost = cost;
      have_good = true;
      out->num_consec_failures = 0;
      std::memcpy(x_best, x, sizeof(double) * dims);
      // The just-built system becomes the accepted one: swap buffers.
      std::swap(H, H_bst);
      std::swap(g, g_bst);
      H_use = H_bst;
      g_use = g_bst;
    } else {
      lam *= bad_factor;
      if (lam > opts->damping_max) lam = opts->damping_max;
      bad_factor *= opts->bad_factor;
      out->num_failures++;
      out->num_consec_failures++;
      std::memcpy(x, x_best, sizeof(double) * dims);  // rollback
      if (opts->max_consec_failures > 0 &&
          out->num_consec_failures >= opts->max_consec_failures) {
        out->stop_reason = kMaxConsecNoDecr;
        break;
      }
      if (opts->max_total_failures > 0 &&
          out->num_failures >= opts->max_total_failures) {
        out->stop_reason = kMaxNoDecr;
        break;
      }
      // Propose from the last accepted system — the Rebuild(false)
      // shortcut at zero copy cost.
      H_use = H_bst;
      g_use = g_bst;
    }

    // ---- Stop criteria on the (good) state ----
    if (good) {
      if (opts->min_error > 0 && cost < opts->min_error) {
        out->stop_reason = kMinError;
        break;
      }
      if (opts->min_rerr_dec > 0 && rel_derr > 0 &&
          rel_derr < opts->min_rerr_dec) {
        out->stop_reason = kMinRelError;
        break;
      }
      double gn2 = 0.0;
      for (int a = 0; a < dims; ++a) gn2 += g_use[a] * g_use[a];
      if (opts->min_grad_norm2 > 0 && gn2 < opts->min_grad_norm2) {
        out->stop_reason = kMinGradNorm;
        break;
      }
    }
    if (iter + 1 >= max_iters) break;

    // ---- Propose a step ----
    // Accepted: solve with λ from before this iteration's GoodStep
    // (the reference solves first, updates after). Rejected: solve with
    // the freshly escalated λ (the reference's next-step re-damp).
    double lam_solve = good ? lam_pre : lam;
    bool solved = false;
    for (int attempt = 0; attempt <= (opts->max_consec_failures > 0
                                          ? opts->max_consec_failures
                                          : 50);
         ++attempt) {
      if (is_gd) {
        for (int a = 0; a < dims; ++a) dx[a] = -opts->gd_lr * g_use[a];
        solved = true;
        break;
      }
      if (CholeskySolveDamped(H_use, g_use, is_lm ? lam_solve : 0.0, dims,
                              L, dx)) {
        solved = true;
        break;
      }
      if (!is_lm) break;  // GN has no damping to escalate
      lam_solve *= bad_factor;
      lam *= bad_factor;  // FailedStep escalation persists (lm.h:148)
      if (lam_solve > opts->damping_max) lam_solve = opts->damping_max;
      if (lam > opts->damping_max) lam = opts->damping_max;
      bad_factor *= opts->bad_factor;
      out->num_failures++;
      out->num_consec_failures++;
      if (opts->max_consec_failures > 0 &&
          out->num_consec_failures >= opts->max_consec_failures) break;
    }
    if (!solved) {
      out->stop_reason = kSolverFailed;
      break;
    }

    double dn2 = 0.0;
    for (int a = 0; a < dims; ++a) dn2 += dx[a] * dx[a];
    if (!std::isfinite(dn2)) {
      out->stop_reason = kSystemHasNaNOrInf;
      break;
    }
    if (opts->min_step_norm2 > 0 && dn2 < opts->min_step_norm2) {
      out->stop_reason = kMinDeltaNorm;
      break;
    }
    for (int a = 0; a < dims; ++a) x[a] += dx[a];
  }

  if (out->stop_reason == kNone) out->stop_reason = kMaxIters;
  // Return the best point seen.
  std::memcpy(x, x_best, sizeof(double) * dims);
  out->final_cost = best_cost;
  return out->stop_reason;
}

// ---------------------------------------------------------------------
// Built-in benchmark problems (no callback overhead), mirroring the
// reference benchmark suite (reference: benchmarks/dense.cpp:28-114).
// ---------------------------------------------------------------------

struct PriorCtx {
  const double* y;
  const double* inv_std;
  int dims;
};

static void PriorResJac(const double* x, double* r, double* J, int jac,
                        void* ctx) {
  const PriorCtx* c = static_cast<const PriorCtx*>(ctx);
  const int d = c->dims;
  for (int i = 0; i < d; ++i) r[i] = (x[i] - c->y[i]) * c->inv_std[i];
  if (jac) {
    std::memset(J, 0, sizeof(double) * d * d);
    for (int i = 0; i < d; ++i) J[i * d + i] = c->inv_std[i];
  }
}

static void Sqrt2ResJac(const double* x, double* r, double* J, int jac,
                        void*) {
  r[0] = x[0] * x[0] - 2.0;
  if (jac) J[0] = 2.0 * x[0];
}

// One full LM solve of the whitened Gaussian prior (dims<=kMaxDims).
int32_t tinyopt_bench_prior(int32_t dims, const double* y,
                            const double* inv_std, double* x,
                            const NativeOptions* opts, NativeOutput* out) {
  PriorCtx ctx{y, inv_std, dims};
  double r[kMaxDims];
  double J[kMaxDims * kMaxDims];
  return tinyopt_solve(dims, dims, PriorResJac, &ctx, x, opts, out, r, J);
}

// One full LM solve of sqrt2 (scalar).
int32_t tinyopt_bench_sqrt2(double* x, const NativeOptions* opts,
                            NativeOutput* out) {
  double r[1];
  double J[1];
  return tinyopt_solve(1, 1, Sqrt2ResJac, nullptr, x, opts, out, r, J);
}

// Mean microseconds per full prior solve, timed inside the library (the
// reference measures the same way: a native benchmark loop around
// Optimize, benchmarks/dense.cpp:53-114).
double tinyopt_bench_prior_us(int32_t dims, const double* y,
                              const double* inv_std, const double* x0,
                              const NativeOptions* opts, int32_t reps,
                              double* x_out) {
  PriorCtx ctx{y, inv_std, dims};
  double r[kMaxDims];
  double J[kMaxDims * kMaxDims];
  double x[kMaxDims];
  NativeOutput out;
  volatile double sink = 0.0;
  const auto t0 = std::chrono::steady_clock::now();
  for (int i = 0; i < reps; ++i) {
    std::memcpy(x, x0, sizeof(double) * dims);
    tinyopt_solve(dims, dims, PriorResJac, &ctx, x, opts, &out, r, J);
    sink += x[0];
  }
  const auto t1 = std::chrono::steady_clock::now();
  if (x_out) std::memcpy(x_out, x, sizeof(double) * dims);
  (void)sink;
  return std::chrono::duration<double, std::micro>(t1 - t0).count() / reps;
}

double tinyopt_bench_sqrt2_us(double x0, const NativeOptions* opts,
                              int32_t reps, double* x_out) {
  double r[1];
  double J[1];
  double x[1];
  NativeOutput out;
  volatile double sink = 0.0;
  const auto t0 = std::chrono::steady_clock::now();
  for (int i = 0; i < reps; ++i) {
    x[0] = x0;
    tinyopt_solve(1, 1, Sqrt2ResJac, nullptr, x, opts, &out, r, J);
    sink += x[0];
  }
  const auto t1 = std::chrono::steady_clock::now();
  if (x_out) x_out[0] = x[0];
  (void)sink;
  return std::chrono::duration<double, std::micro>(t1 - t0).count() / reps;
}

}  // extern "C"
