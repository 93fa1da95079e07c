// Binomial (revolve-style) checkpoint scheduler for adjoint sweeps.
//
// Emits the action sequence that reverses `steps` forward steps using at
// most `snaps` checkpoint slots, following the binomial decomposition
// eta(s,t) = C(s+t, s) = eta(s, t-1) + eta(s-1, t-1) (Griewank-Walther).
// The planner runs host-side once per adjoint configuration; the static
// schedule is consumed at JAX trace time. The Python fallback in
// adjoint/checkpointing.py implements the identical algorithm — the two
// must emit byte-identical plans (tested).
//
// C API (ctypes):
//   aoa_max_steps(snaps, reps)       -> C(snaps+reps, snaps)
//   aoa_binomial_reps(steps, snaps)  -> minimal t with C(s+t, s) >= steps
//   aoa_plan(steps, snaps, out, cap) -> writes (action, arg) int64 pairs;
//                                       returns count, or -needed if cap
//                                       is too small.
// Actions: 0 ADVANCE n | 1 TAKESHOT slot | 2 RESTORE slot | 4 REVERSE 1.

#include <cstdint>
#include <vector>

namespace {

int64_t binom(int64_t n, int64_t k) {
  if (k < 0 || n < 0 || k > n) return 0;
  if (k > n - k) k = n - k;
  int64_t r = 1;
  for (int64_t i = 1; i <= k; ++i) r = r * (n - k + i) / i;
  return r;
}

enum Action : int64_t { ADVANCE = 0, TAKESHOT = 1, RESTORE = 2, REVERSE = 4 };

struct Plan {
  std::vector<std::pair<int64_t, int64_t>> acts;
  void emit(Action a, int64_t arg) { acts.emplace_back(a, arg); }
};

int64_t min_reps(int64_t steps, int64_t snaps) {
  if (steps <= 1) return 0;
  int64_t t = 0;
  while (binom(snaps + t, snaps) < steps) ++t;
  return t;
}

void rec(Plan& p, int64_t n, int64_t slot0, int64_t s, int64_t t) {
  if (n == 0) return;
  if (n == 1) {
    p.emit(REVERSE, 1);
    return;
  }
  if (s == 1) {
    p.emit(TAKESHOT, slot0);
    for (int64_t j = n - 1; j >= 0; --j) {
      if (j > 0) p.emit(ADVANCE, j);
      p.emit(REVERSE, 1);
      if (j > 0) p.emit(RESTORE, slot0);
    }
    return;
  }
  if (n <= s + 1) {  // single-pass reversal
    for (int64_t j = 0; j < n - 1; ++j) {
      p.emit(TAKESHOT, slot0 + j);
      p.emit(ADVANCE, 1);
    }
    p.emit(REVERSE, 1);
    for (int64_t j = n - 2; j >= 0; --j) {
      p.emit(RESTORE, slot0 + j);
      p.emit(REVERSE, 1);
    }
    return;
  }
  if (t < 1) t = 1;
  while (binom(s + t, s) < n) ++t;
  while (t > 1 && binom(s + t - 1, s) >= n) --t;
  // Griewank-Walther split along eta(s,t) = eta(s,t-1) + eta(s-1,t):
  // right part (n-m) gets s-1 slots at the SAME t, left part (m) keeps
  // all s slots at t-1; greedy m = n - eta(s-1, t) satisfies both
  // bounds. (The earlier version recursed right with t-1 and advanced
  // n - eta(s-1, t-1) -- valid but Theta(n^2/s) forwards.)
  int64_t m = n - binom(s - 1 + t, s - 1);
  if (m < 1) m = 1;
  if (m > n - 1) m = n - 1;
  int64_t left_cap = binom(s + t - 1, s);
  if (m > left_cap) m = left_cap;
  p.emit(TAKESHOT, slot0);
  p.emit(ADVANCE, m);
  rec(p, n - m, slot0 + 1, s - 1, t);
  p.emit(RESTORE, slot0);
  rec(p, m, slot0, s, t - 1);
}

}  // namespace

extern "C" {

int64_t aoa_max_steps(int64_t snaps, int64_t reps) { return binom(snaps + reps, snaps); }

int64_t aoa_binomial_reps(int64_t steps, int64_t snaps) { return min_reps(steps, snaps); }

int64_t aoa_plan(int64_t steps, int64_t snaps, int64_t* out, int64_t cap) {
  if (steps < 1 || snaps < 1) return 0;
  Plan p;
  int64_t t = min_reps(steps, snaps);
  rec(p, steps, 0, snaps, t > 1 ? t : 1);
  int64_t n = static_cast<int64_t>(p.acts.size());
  if (n > cap) return -n;
  for (int64_t i = 0; i < n; ++i) {
    out[2 * i] = p.acts[i].first;
    out[2 * i + 1] = p.acts[i].second;
  }
  return n;
}

}  // extern "C"
