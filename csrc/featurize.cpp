// Native PDB backbone featurizer: parse ATOM records, extract the N/CA/C
// backbone, and compute the canonical internal-angle features (phi, psi,
// omega, tau, CA:C:1N, C:1N:1CA + the three bond distances) -- the hot host
// path when featurizing ~24k CATH structures. The reference leans on biotite
// (C-accelerated Python); this is the framework's own native data-loader
// component, numerically matched against geometry/featurize.py
// (tests/test_native_featurize.py).
//
// C ABI (ctypes, see foldingdiff_tpu/data/featurize_native.py):
//   int featurize_pdb(const char* path, double* out, int max_res)
//     -> number of residues written (rows), or -1 on failure
//        (multi-model / malformed backbone / out-of-range angles).
//     out is row-major (max_res, 9): [0C:1N, N:CA, CA:C, phi, psi, omega,
//     tau, CA:C:1N, C:1N:1CA], with the reference's NaN/0 padding
//     conventions.

#include <cctype>
#include <cmath>
#include <cstdio>
#include <cstring>
#include <limits>
#include <string>
#include <vector>

namespace {

struct Vec3 {
  double x, y, z;
};

inline Vec3 sub(const Vec3& a, const Vec3& b) { return {a.x - b.x, a.y - b.y, a.z - b.z}; }
inline double dot(const Vec3& a, const Vec3& b) { return a.x * b.x + a.y * b.y + a.z * b.z; }
inline Vec3 cross(const Vec3& a, const Vec3& b) {
  return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z, a.x * b.y - a.y * b.x};
}
inline double norm(const Vec3& a) { return std::sqrt(dot(a, a)); }

double dihedral(const Vec3& p0, const Vec3& p1, const Vec3& p2, const Vec3& p3) {
  const Vec3 b1 = sub(p1, p0), b2 = sub(p2, p1), b3 = sub(p3, p2);
  const Vec3 n1 = cross(b1, b2), n2 = cross(b2, b3);
  const double nb2 = norm(b2);
  const Vec3 u2 = {b2.x / nb2, b2.y / nb2, b2.z / nb2};
  const Vec3 m1 = cross(u2, n1);
  return std::atan2(dot(m1, n2), dot(n1, n2));
}

double bond_angle(const Vec3& p0, const Vec3& p1, const Vec3& p2) {
  Vec3 v1 = sub(p0, p1), v2 = sub(p2, p1);
  const double c = dot(v1, v2) / (norm(v1) * norm(v2));
  return std::acos(c > 1.0 ? 1.0 : (c < -1.0 ? -1.0 : c));
}

const char* const kAminoAcids[] = {
    "ALA", "ARG", "ASN", "ASP", "CYS", "GLN", "GLU", "GLY", "HIS", "ILE",
    "LEU", "LYS", "MET", "PHE", "PRO", "SER", "THR", "TRP", "TYR", "VAL",
    "MSE", "SEC", "PYL", "UNK", "ASX", "GLX",
};

bool is_amino_acid(const std::string& res) {
  for (const char* aa : kAminoAcids)
    if (res == aa) return true;
  return false;
}

std::string strip(const std::string& s) {
  size_t a = s.find_first_not_of(" \t");
  if (a == std::string::npos) return "";
  size_t b = s.find_last_not_of(" \t");
  return s.substr(a, b - a + 1);
}

}  // namespace

extern "C" {

// Returns number of residues or -1 on failure.
int featurize_pdb(const char* path, double* out, int max_res) {
  FILE* f = std::fopen(path, "r");
  if (!f) return -1;

  std::vector<Vec3> n_at, ca_at, c_at;
  // Track which of N/CA/C we've seen for the current residue, first-altloc
  char line[256];
  int model_count = 0;
  bool in_first_model = true;
  std::string cur_key;
  bool have_n = false, have_ca = false, have_c = false;
  Vec3 cur_n{}, cur_ca{}, cur_c{};

  auto flush_residue = [&]() {
    if (have_n && have_ca && have_c) {
      n_at.push_back(cur_n);
      ca_at.push_back(cur_ca);
      c_at.push_back(cur_c);
    } else if (have_n || have_ca || have_c) {
      // partial backbone -> malformed for our purposes
      n_at.clear();
      ca_at.clear();
      c_at.clear();
    }
    have_n = have_ca = have_c = false;
  };

  bool malformed = false;
  while (std::fgets(line, sizeof(line), f)) {
    const size_t len = std::strlen(line);
    if (len < 6) continue;
    if (std::strncmp(line, "MODEL ", 6) == 0) {
      ++model_count;
      in_first_model = model_count <= 1;
      continue;
    }
    if (!in_first_model) continue;
    if (std::strncmp(line, "ATOM  ", 6) != 0) continue;
    if (len < 54) continue;

    const std::string name = strip(std::string(line + 12, 4));
    if (name != "N" && name != "CA" && name != "C") continue;
    const char altloc = line[16];
    const std::string res_name = strip(std::string(line + 17, 3));
    if (!is_amino_acid(res_name)) continue;
    const std::string key = std::string(line + 21, 6);  // chain + resSeq + icode

    if (key != cur_key) {
      flush_residue();
      cur_key = key;
      if (malformed) break;
    }
    // first altloc wins
    if ((name == "N" && have_n) || (name == "CA" && have_ca) || (name == "C" && have_c)) {
      if (altloc != ' ') continue;
      continue;
    }
    Vec3 v;
    char buf[9];
    buf[8] = 0;
    std::memcpy(buf, line + 30, 8);
    v.x = std::atof(buf);
    std::memcpy(buf, line + 38, 8);
    v.y = std::atof(buf);
    std::memcpy(buf, line + 46, 8);
    v.z = std::atof(buf);
    if (name == "N") { cur_n = v; have_n = true; }
    else if (name == "CA") { cur_ca = v; have_ca = true; }
    else { cur_c = v; have_c = true; }
  }
  flush_residue();
  std::fclose(f);

  if (model_count > 1) return -1;
  const int n = int(n_at.size());
  if (n < 2 || n > max_res) return -1;

  const double NaN = std::numeric_limits<double>::quiet_NaN();
  const double PI = 3.14159265358979323846;
  // layout: [0C:1N, N:CA, CA:C, phi, psi, omega, tau, CA:C:1N, C:1N:1CA]
  for (int i = 0; i < n; ++i) {
    double* row = out + 9 * i;
    const bool last = (i == n - 1);
    // distances: 0C:1N[i] = |N_{i+1} - C_i|, N:CA/CA:C shifted (+1), 0 pad
    row[0] = last ? 0.0 : norm(sub(n_at[i + 1], c_at[i]));
    row[1] = last ? 0.0 : norm(sub(ca_at[i + 1], n_at[i + 1]));
    row[2] = last ? 0.0 : norm(sub(c_at[i + 1], ca_at[i + 1]));
    // dihedrals
    row[3] = (i == 0) ? NaN : dihedral(c_at[i - 1], n_at[i], ca_at[i], c_at[i]);   // phi
    row[4] = last ? NaN : dihedral(n_at[i], ca_at[i], c_at[i], n_at[i + 1]);       // psi
    row[5] = last ? NaN : dihedral(ca_at[i], c_at[i], n_at[i + 1], ca_at[i + 1]);  // omega
    // bond angles (tau shifted +1, inter-residue at i, NaN pad)
    row[6] = last ? NaN : bond_angle(n_at[i + 1], ca_at[i + 1], c_at[i + 1]);      // tau
    row[7] = last ? NaN : bond_angle(ca_at[i], c_at[i], n_at[i + 1]);              // CA:C:1N
    row[8] = last ? NaN : bond_angle(c_at[i], n_at[i + 1], ca_at[i + 1]);          // C:1N:1CA
    // range check like the reference (angles_and_coords.py:77-81)
    for (int j = 3; j < 9; ++j) {
      if (!std::isnan(row[j]) && (row[j] < -PI - 1e-9 || row[j] > PI + 1e-9)) return -1;
    }
  }
  return n;
}

}  // extern "C"
