// TM-align-equivalent structural alignment, implemented from the published
// algorithm (Y. Zhang & J. Skolnick, "TM-align: a protein structure alignment
// algorithm based on the TM-score", NAR 2005) -- NOT a copy of the original
// Fortran/C++ code. Replaces the external TMalign binary the reference repo
// shells out to (foldingdiff/tmalign.py:22-54).
//
// Exposed C ABI (driven from Python via ctypes, see
// foldingdiff_tpu/eval/tmalign_native.py):
//   double tm_align(const double* xa, int lenA, const double* ya, int lenB)
//     -> TM-score of chain A aligned onto chain B, normalized by lenB
//        (the reference/second-chain convention used by run_tmalign).
//   double tm_score_identity(const double* xa, const double* ya, int len)
//     -> TM-score with the identity correspondence (equal-length chains).
//
// Algorithm outline:
//   1. Initial alignments: gapless threading; secondary-structure DP;
//      local-fragment superposition seed.
//   2. Iterate: superimpose on the current aligned set (Kabsch), score all
//      pairs with 1/(1+(d/d0)^2), realign with Needleman-Wunsch (gap open
//      -0.6, free end gaps), and refine with the TM-score d-cutoff loop.
//   3. Return the best TM over all seeds.

#include <algorithm>
#include <cmath>
#include <cstring>
#include <vector>

namespace {

struct Vec3 {
  double x, y, z;
};

using Coords = std::vector<Vec3>;

inline Vec3 sub(const Vec3& a, const Vec3& b) { return {a.x - b.x, a.y - b.y, a.z - b.z}; }
inline double dot(const Vec3& a, const Vec3& b) { return a.x * b.x + a.y * b.y + a.z * b.z; }
inline Vec3 cross(const Vec3& a, const Vec3& b) {
  return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z, a.x * b.y - a.y * b.x};
}
inline double norm(const Vec3& a) { return std::sqrt(dot(a, a)); }
inline double dist2(const Vec3& a, const Vec3& b) {
  const double dx = a.x - b.x, dy = a.y - b.y, dz = a.z - b.z;
  return dx * dx + dy * dy + dz * dz;
}

double tm_d0(int n) {
  if (n > 15) return std::max(1.24 * std::cbrt(double(n - 15)) - 1.8, 0.5);
  return 0.5;
}

struct Transform {
  double r[3][3];
  Vec3 t;
  Vec3 apply(const Vec3& p) const {
    return {r[0][0] * p.x + r[0][1] * p.y + r[0][2] * p.z + t.x,
            r[1][0] * p.x + r[1][1] * p.y + r[1][2] * p.z + t.y,
            r[2][0] * p.x + r[2][1] * p.y + r[2][2] * p.z + t.z};
  }
};

// 3x3 symmetric eigendecomposition by cyclic Jacobi.
void jacobi3(double a[3][3], double eigval[3], double eigvec[3][3]) {
  double v[3][3] = {{1, 0, 0}, {0, 1, 0}, {0, 0, 1}};
  for (int sweep = 0; sweep < 50; ++sweep) {
    double off = std::fabs(a[0][1]) + std::fabs(a[0][2]) + std::fabs(a[1][2]);
    if (off < 1e-15) break;
    for (int p = 0; p < 2; ++p) {
      for (int q = p + 1; q < 3; ++q) {
        if (std::fabs(a[p][q]) < 1e-18) continue;
        const double theta = (a[q][q] - a[p][p]) / (2.0 * a[p][q]);
        const double sign = theta >= 0 ? 1.0 : -1.0;
        const double tt = sign / (std::fabs(theta) + std::sqrt(theta * theta + 1.0));
        const double c = 1.0 / std::sqrt(tt * tt + 1.0);
        const double s = tt * c;
        for (int k = 0; k < 3; ++k) {
          const double akp = a[k][p], akq = a[k][q];
          a[k][p] = c * akp - s * akq;
          a[k][q] = s * akp + c * akq;
        }
        for (int k = 0; k < 3; ++k) {
          const double apk = a[p][k], aqk = a[q][k];
          a[p][k] = c * apk - s * aqk;
          a[q][k] = s * apk + c * aqk;
        }
        for (int k = 0; k < 3; ++k) {
          const double vkp = v[k][p], vkq = v[k][q];
          v[k][p] = c * vkp - s * vkq;
          v[k][q] = s * vkp + c * vkq;
        }
      }
    }
  }
  for (int i = 0; i < 3; ++i) {
    eigval[i] = a[i][i];
    for (int j = 0; j < 3; ++j) eigvec[j][i] = v[j][i];
  }
}

// Kabsch: optimal rotation+translation mapping P -> Q (equal-length subsets).
Transform kabsch(const Coords& p, const Coords& q) {
  const int n = int(p.size());
  Vec3 pc{0, 0, 0}, qc{0, 0, 0};
  for (int i = 0; i < n; ++i) {
    pc.x += p[i].x; pc.y += p[i].y; pc.z += p[i].z;
    qc.x += q[i].x; qc.y += q[i].y; qc.z += q[i].z;
  }
  pc = {pc.x / n, pc.y / n, pc.z / n};
  qc = {qc.x / n, qc.y / n, qc.z / n};

  // Covariance H = sum (p - pc)(q - qc)^T
  double h[3][3] = {{0}};
  for (int i = 0; i < n; ++i) {
    const Vec3 a = sub(p[i], pc), b = sub(q[i], qc);
    const double av[3] = {a.x, a.y, a.z}, bv[3] = {b.x, b.y, b.z};
    for (int r = 0; r < 3; ++r)
      for (int c = 0; c < 3; ++c) h[r][c] += av[r] * bv[c];
  }
  // SVD via eigen decomposition of H^T H = V S^2 V^T; U = H V S^-1
  double hth[3][3] = {{0}};
  for (int r = 0; r < 3; ++r)
    for (int c = 0; c < 3; ++c)
      for (int k = 0; k < 3; ++k) hth[r][c] += h[k][r] * h[k][c];
  double eigval[3], vmat[3][3];
  double hth_copy[3][3];
  std::memcpy(hth_copy, hth, sizeof(hth));
  jacobi3(hth_copy, eigval, vmat);
  // sort eigenpairs descending
  int order[3] = {0, 1, 2};
  std::sort(order, order + 3, [&](int a, int b) { return eigval[a] > eigval[b]; });
  double vs[3][3], sv[3];
  for (int i = 0; i < 3; ++i) {
    sv[i] = std::sqrt(std::max(eigval[order[i]], 0.0));
    for (int j = 0; j < 3; ++j) vs[j][i] = vmat[j][order[i]];
  }
  // U columns = H * v_i / s_i  (guard small s with cross product)
  double u[3][3];
  for (int i = 0; i < 2; ++i) {
    double col[3] = {0, 0, 0};
    for (int r = 0; r < 3; ++r)
      for (int k = 0; k < 3; ++k) col[r] += h[r][k] * vs[k][i];
    const double s = sv[i] > 1e-12 ? sv[i] : 1.0;
    for (int r = 0; r < 3; ++r) u[r][i] = col[r] / s;
  }
  // third column as cross of first two (keeps U orthogonal)
  u[0][2] = u[1][0] * u[2][1] - u[2][0] * u[1][1];
  u[1][2] = u[2][0] * u[0][1] - u[0][0] * u[2][1];
  u[2][2] = u[0][0] * u[1][1] - u[1][0] * u[0][1];
  // also regenerate v3 = v1 x v2 for a right-handed V
  vs[0][2] = vs[1][0] * vs[2][1] - vs[2][0] * vs[1][1];
  vs[1][2] = vs[2][0] * vs[0][1] - vs[0][0] * vs[2][1];
  vs[2][2] = vs[0][0] * vs[1][1] - vs[1][0] * vs[0][1];

  // R = U_q V_p^T convention: here rotation = sum_i u_i v_i^T maps p-frame
  // into q-frame; determinant fix for reflection
  double rot[3][3];
  for (int r = 0; r < 3; ++r)
    for (int c = 0; c < 3; ++c)
      rot[r][c] = u[r][0] * vs[c][0] + u[r][1] * vs[c][1] + u[r][2] * vs[c][2];
  const double det = rot[0][0] * (rot[1][1] * rot[2][2] - rot[1][2] * rot[2][1]) -
                     rot[0][1] * (rot[1][0] * rot[2][2] - rot[1][2] * rot[2][0]) +
                     rot[0][2] * (rot[1][0] * rot[2][1] - rot[1][1] * rot[2][0]);
  if (det < 0) {
    for (int r = 0; r < 3; ++r)
      for (int c = 0; c < 3; ++c)
        rot[r][c] = u[r][0] * vs[c][0] + u[r][1] * vs[c][1] - u[r][2] * vs[c][2];
  }
  // NOTE: rot maps centered q?? -- verify direction: we want R*p + t ~ q.
  // With H = sum a b^T (a from p, b from q), R = V_h U_h^T in the classic
  // formulation. The construction above gives M = sum u_i v_i^T where
  // H = U S V^T (columns u_i of U from H V S^-1). Then R = V U^T... To avoid
  // convention bugs we directly test both and keep the better one.
  Transform t1, t2;
  for (int r = 0; r < 3; ++r)
    for (int c = 0; c < 3; ++c) {
      t1.r[r][c] = rot[c][r];  // transpose
      t2.r[r][c] = rot[r][c];
    }
  auto finish = [&](Transform& tr) {
    const Vec3 rp = {tr.r[0][0] * pc.x + tr.r[0][1] * pc.y + tr.r[0][2] * pc.z,
                     tr.r[1][0] * pc.x + tr.r[1][1] * pc.y + tr.r[1][2] * pc.z,
                     tr.r[2][0] * pc.x + tr.r[2][1] * pc.y + tr.r[2][2] * pc.z};
    tr.t = {qc.x - rp.x, qc.y - rp.y, qc.z - rp.z};
  };
  finish(t1);
  finish(t2);
  double e1 = 0, e2 = 0;
  for (int i = 0; i < n; ++i) {
    e1 += dist2(t1.apply(p[i]), q[i]);
    e2 += dist2(t2.apply(p[i]), q[i]);
  }
  return e1 <= e2 ? t1 : t2;
}

// TM-score of a fixed correspondence after optimal iterative superposition.
// pairs: (i in A, j in B). Returns TM normalized by norm_len, and the final
// transform through out_tr if non-null.
double tmscore_pairs(const Coords& a, const Coords& b,
                     const std::vector<std::pair<int, int>>& pairs, int norm_len,
                     Transform* out_tr = nullptr, int speed = 0) {
  if (pairs.size() < 3) return -1.0;
  const double d0 = tm_d0(norm_len);
  const double d0sq = d0 * d0;
  double best = -1.0;
  Transform best_tr{};

  const int n = int(pairs.size());
  // Seed fragment lengths n, n/2, n/4, >= 4. Fast mode (speed=1, the
  // analogue of TM-align's -fast): only the two coarsest fragment levels,
  // non-overlapping starts, and a shorter refinement -- a screening-grade
  // score for big max-over-references sweeps (rank candidates fast, re-score
  // the winners with speed=0).
  const int min_frag = (speed > 0) ? std::max(4, n / 2) : std::max(4, n / 8);
  const int max_refine = (speed > 0) ? 6 : 20;
  for (int frag = n; frag >= min_frag; frag /= 2) {
    const int start_step = (speed > 0) ? frag : std::max(frag / 2, 1);
    for (int start = 0; start + frag <= n; start += start_step) {
      Coords ps, qs;
      ps.reserve(frag);
      qs.reserve(frag);
      for (int k = start; k < start + frag; ++k) {
        ps.push_back(a[pairs[k].first]);
        qs.push_back(b[pairs[k].second]);
      }
      Transform tr = kabsch(ps, qs);
      // iterative refinement with d-cutoff
      for (int iter = 0; iter < max_refine; ++iter) {
        double tm = 0;
        std::vector<int> close;
        double d_cut = d0;
        while (true) {
          close.clear();
          for (int k = 0; k < n; ++k) {
            const double d2v = dist2(tr.apply(a[pairs[k].first]), b[pairs[k].second]);
            if (d2v < d_cut * d_cut) close.push_back(k);
          }
          if (int(close.size()) >= 3 || d_cut > 8 * d0) break;
          d_cut += 0.5;
        }
        for (int k = 0; k < n; ++k) {
          const double d2v = dist2(tr.apply(a[pairs[k].first]), b[pairs[k].second]);
          tm += 1.0 / (1.0 + d2v / d0sq);
        }
        tm /= norm_len;
        if (tm > best) {
          best = tm;
          best_tr = tr;
        }
        if (int(close.size()) < 3) break;
        Coords ps2, qs2;
        for (int k : close) {
          ps2.push_back(a[pairs[k].first]);
          qs2.push_back(b[pairs[k].second]);
        }
        Transform tr_new = kabsch(ps2, qs2);
        // convergence: same transform => same selection next round
        bool same = true;
        for (int r = 0; r < 3 && same; ++r)
          for (int c = 0; c < 3 && same; ++c)
            if (std::fabs(tr_new.r[r][c] - tr.r[r][c]) > 1e-9) same = false;
        tr = tr_new;
        if (same) break;
      }
    }
    if (frag <= 4) break;
  }
  if (out_tr) *out_tr = best_tr;
  return best;
}

// Needleman-Wunsch with free end gaps over a similarity matrix.
// score[i][j] for i in [0,lenA), j in [0,lenB). Returns alignment pairs.
std::vector<std::pair<int, int>> nw_align(const std::vector<double>& score, int la,
                                          int lb, double gap_open) {
  std::vector<double> dp((la + 1) * (lb + 1), 0.0);
  std::vector<unsigned char> path((la + 1) * (lb + 1), 0);  // 1=diag 2=up 3=left
  auto idx = [lb](int i, int j) { return i * (lb + 1) + j; };
  for (int i = 1; i <= la; ++i) {
    for (int j = 1; j <= lb; ++j) {
      const double diag = dp[idx(i - 1, j - 1)] + score[(i - 1) * lb + (j - 1)];
      // free end gaps: no penalty in last row/col handled implicitly by
      // allowing 0-penalty moves when at borders
      const double up = dp[idx(i - 1, j)] + ((j == lb) ? 0.0 : gap_open);
      const double left = dp[idx(i, j - 1)] + ((i == la) ? 0.0 : gap_open);
      double bestv = diag;
      unsigned char bestp = 1;
      if (up > bestv) { bestv = up; bestp = 2; }
      if (left > bestv) { bestv = left; bestp = 3; }
      dp[idx(i, j)] = bestv;
      path[idx(i, j)] = bestp;
    }
  }
  std::vector<std::pair<int, int>> pairs;
  int i = la, j = lb;
  while (i > 0 && j > 0) {
    const unsigned char p = path[idx(i, j)];
    if (p == 1) {
      pairs.push_back({i - 1, j - 1});
      --i; --j;
    } else if (p == 2) {
      --i;
    } else {
      --j;
    }
  }
  std::reverse(pairs.begin(), pairs.end());
  return pairs;
}

// Simple CA-geometry secondary structure (helix/strand/coil) for the SS seed.
std::vector<char> assign_ss(const Coords& ca) {
  const int n = int(ca.size());
  std::vector<char> ss(n, 'c');
  for (int i = 0; i + 4 < n; ++i) {
    const double d3 = std::sqrt(dist2(ca[i], ca[i + 3]));
    const double d4 = std::sqrt(dist2(ca[i], ca[i + 4]));
    if (d3 > 4.8 && d3 < 5.8 && d4 > 5.8 && d4 < 7.0) ss[i + 1] = 'h';
    else if (d3 > 9.0 && d3 < 10.8 && d4 > 11.3 && d4 < 13.5) ss[i + 1] = 'e';
  }
  return ss;
}

double run_alignment(const Coords& a, const Coords& b, int speed = 0) {
  const int la = int(a.size()), lb = int(b.size());
  const int norm_len = lb;
  const double d0 = tm_d0(norm_len);
  const double d0sq = d0 * d0;
  double best = -1.0;

  std::vector<std::vector<std::pair<int, int>>> seeds;

  // Seed 1: gapless threading (all offsets, keep top few by quick TM)
  {
    double best_thread = -1.0;
    std::vector<std::pair<int, int>> best_pairs;
    const int nmin = std::min(la, lb);
    for (int off = -(la - nmin); off <= lb - nmin; ++off) {
      std::vector<std::pair<int, int>> pairs;
      for (int i = 0; i < la; ++i) {
        const int j = i + off;
        if (j >= 0 && j < lb) pairs.push_back({i, j});
      }
      if (int(pairs.size()) < std::max(5, nmin / 2)) continue;
      // cheap evaluation: one Kabsch on all pairs
      Coords ps, qs;
      for (auto& pr : pairs) {
        ps.push_back(a[pr.first]);
        qs.push_back(b[pr.second]);
      }
      Transform tr = kabsch(ps, qs);
      double tm = 0;
      for (auto& pr : pairs)
        tm += 1.0 / (1.0 + dist2(tr.apply(a[pr.first]), b[pr.second]) / d0sq);
      tm /= norm_len;
      if (tm > best_thread) {
        best_thread = tm;
        best_pairs = pairs;
      }
    }
    if (!best_pairs.empty()) seeds.push_back(best_pairs);
  }

  // Seed 2: secondary-structure DP
  {
    const auto ssa = assign_ss(a);
    const auto ssb = assign_ss(b);
    std::vector<double> score(size_t(la) * lb);
    for (int i = 0; i < la; ++i)
      for (int j = 0; j < lb; ++j)
        score[size_t(i) * lb + j] = (ssa[i] == ssb[j]) ? 1.0 : 0.0;
    auto pairs = nw_align(score, la, lb, -1.0);
    if (int(pairs.size()) >= 5) seeds.push_back(pairs);
  }

  // Seed 3: local-fragment superposition (original TM-align's "local" init):
  // superimpose on sliding fragment pairs, score globally with a gapless
  // mapping through that transform, keep the best as a DP starting point
  {
    const int frag = std::max(8, std::min(la, lb) / 4);
    double best_local = -1.0;
    std::vector<std::pair<int, int>> best_pairs;
    const int grid = (speed > 0) ? 4 : 8;  // fast mode: coarser fragment grid
    const int step_a = std::max(1, (la - frag) / grid);
    const int step_b = std::max(1, (lb - frag) / grid);
    for (int ia = 0; ia + frag <= la; ia += step_a) {
      for (int jb = 0; jb + frag <= lb; jb += step_b) {
        Coords ps, qs;
        for (int k = 0; k < frag; ++k) {
          ps.push_back(a[ia + k]);
          qs.push_back(b[jb + k]);
        }
        Transform tr = kabsch(ps, qs);
        // Gapless mapping induced by the offset jb-ia
        const int off = jb - ia;
        double tm = 0;
        std::vector<std::pair<int, int>> pairs;
        for (int i = 0; i < la; ++i) {
          const int j = i + off;
          if (j < 0 || j >= lb) continue;
          pairs.push_back({i, j});
          tm += 1.0 / (1.0 + dist2(tr.apply(a[i]), b[j]) / d0sq);
        }
        tm /= norm_len;
        if (tm > best_local && int(pairs.size()) >= 5) {
          best_local = tm;
          best_pairs = pairs;
        }
      }
    }
    if (!best_pairs.empty()) seeds.push_back(best_pairs);
  }

  // Iterate each seed: superimpose -> distance-based DP -> re-superimpose.
  // Fast mode truncates the DP refinement (most pairs converge in a few
  // rounds; the tail of the 30 only polishes the 3rd decimal).
  const int max_dp_iter = (speed > 0) ? 6 : 30;
  for (auto& seed : seeds) {
    std::vector<std::pair<int, int>> pairs = seed;
    std::vector<std::pair<int, int>> prev;
    for (int iter = 0; iter < max_dp_iter; ++iter) {
      Transform tr;
      const double tm = tmscore_pairs(a, b, pairs, norm_len, &tr, speed);
      if (tm > best) best = tm;
      // rebuild score matrix from superimposed coords
      std::vector<double> score(size_t(la) * lb);
      for (int i = 0; i < la; ++i) {
        const Vec3 ai = tr.apply(a[i]);
        for (int j = 0; j < lb; ++j)
          score[size_t(i) * lb + j] = 1.0 / (1.0 + dist2(ai, b[j]) / d0sq);
      }
      auto new_pairs = nw_align(score, la, lb, -0.6);
      if (new_pairs == pairs || new_pairs == prev) break;
      prev = pairs;
      pairs = new_pairs;
      if (int(pairs.size()) < 3) break;
    }
  }
  return best;
}

Coords to_coords(const double* p, int n) {
  Coords c(n);
  for (int i = 0; i < n; ++i) c[i] = {p[3 * i], p[3 * i + 1], p[3 * i + 2]};
  return c;
}

}  // namespace

extern "C" {

double tm_align(const double* xa, int len_a, const double* ya, int len_b) {
  if (len_a < 5 || len_b < 5) return -1.0;
  return run_alignment(to_coords(xa, len_a), to_coords(ya, len_b));
}

// speed=0: full alignment (identical to tm_align). speed=1: fast screening
// mode (the analogue of TM-align's -fast): truncated DP refinement, coarser
// fragment seeds. Intended for max-over-references sweeps where the top
// candidates are re-scored at speed=0.
double tm_align_ex(const double* xa, int len_a, const double* ya, int len_b,
                   int speed) {
  if (len_a < 5 || len_b < 5) return -1.0;
  return run_alignment(to_coords(xa, len_a), to_coords(ya, len_b), speed);
}

double tm_score_identity(const double* xa, const double* ya, int len) {
  if (len < 3) return -1.0;
  const Coords a = to_coords(xa, len), b = to_coords(ya, len);
  std::vector<std::pair<int, int>> pairs(len);
  for (int i = 0; i < len; ++i) pairs[i] = {i, i};
  return tmscore_pairs(a, b, pairs, len);
}

}  // extern "C"
