// Fast fixed-width text parsing for trajectory-bearing formats — native
// runtime component (the role of mdlib's C parsers, SURVEY.md §2.3
// "reimplement parsers in the new framework's host layer (C++)").
//
// PDB multi-MODEL coordinate scan: one pass over the raw file finds
// ATOM/HETATM records, splits frames on MODEL/ENDMDL exactly like the
// Python reference implementation in io/pdb.py, and parses the fixed
// 8.3-format coordinate columns (31-54) without any allocation per line.
// ~50-100x faster than the per-line Python float() loop on large files.
//
// C ABI (ctypes):
//   pdb_scan(text, len, natoms*, nframes*) -> 0/err      (counting pass)
//   pdb_parse_coords(text, len, natoms, nframes, coords*) -> 0/err

#include <cstdint>
#include <cstring>

namespace {

inline bool starts_with(const char* p, const char* end, const char* lit,
                        int n) {
  return p + n <= end && std::memcmp(p, lit, size_t(n)) == 0;
}

// parse a fixed-width fortran-style float field (spaces allowed)
inline float parse_f(const char* p, int width) {
  float sign = 1.0f;
  double val = 0.0;
  int i = 0;
  while (i < width && p[i] == ' ') i++;
  if (i < width && (p[i] == '-' || p[i] == '+')) {
    if (p[i] == '-') sign = -1.0f;
    i++;
  }
  for (; i < width && p[i] >= '0' && p[i] <= '9'; i++)
    val = val * 10.0 + (p[i] - '0');
  if (i < width && p[i] == '.') {
    i++;
    double frac = 0.1;
    for (; i < width && p[i] >= '0' && p[i] <= '9'; i++) {
      val += (p[i] - '0') * frac;
      frac *= 0.1;
    }
  }
  return sign * float(val);
}

// shared frame-splitting walk; cb(line, linelen, frame_idx) for atom lines
template <typename F>
int32_t walk(const char* text, int64_t len, F&& on_atom, int64_t* natoms_out,
             int64_t* nframes_out) {
  const char* p = text;
  const char* end = text + len;
  int64_t frame = 0;          // current frame being filled
  int64_t atoms_in_frame = 0; // atoms seen in current frame buffer
  int64_t natoms_first = -1;
  bool any_atoms = false;

  auto close_frame = [&]() -> bool {
    if (atoms_in_frame > 0) {
      if (natoms_first < 0) natoms_first = atoms_in_frame;
      if (atoms_in_frame != natoms_first) return false;
      frame++;
      atoms_in_frame = 0;
    }
    return true;
  };

  while (p < end) {
    const char* nl = static_cast<const char*>(
        std::memchr(p, '\n', size_t(end - p)));
    const char* line_end = nl ? nl : end;
    int64_t ll = line_end - p;
    if (starts_with(p, end, "ATOM", 4) || starts_with(p, end, "HETATM", 6)) {
      if (!on_atom(p, ll, frame, atoms_in_frame)) return 2;
      atoms_in_frame++;
      any_atoms = true;
    } else if (starts_with(p, end, "ENDMDL", 6) ||
               starts_with(p, end, "MODEL", 5)) {
      if (!close_frame()) return 3;  // inconsistent atom counts
    }
    p = nl ? nl + 1 : end;
  }
  if (!close_frame()) return 3;
  if (!any_atoms) return 4;
  *natoms_out = natoms_first;
  *nframes_out = frame;
  return 0;
}

}  // namespace

extern "C" {

int32_t pdb_scan(const char* text, int64_t len, int64_t* natoms,
                 int64_t* nframes) {
  return walk(
      text, len,
      [](const char*, int64_t, int64_t, int64_t) { return true; },
      natoms, nframes);
}

int32_t pdb_parse_coords(const char* text, int64_t len, int64_t natoms,
                         int64_t nframes, float* coords) {
  int64_t na = 0, nf = 0;
  int32_t rc = walk(
      text, len,
      [&](const char* line, int64_t ll, int64_t frame, int64_t atom) {
        if (frame >= nframes || atom >= natoms) return false;
        if (ll < 54) return false;  // truncated coordinate columns
        float* out = coords + (frame * natoms + atom) * 3;
        out[0] = parse_f(line + 30, 8);
        out[1] = parse_f(line + 38, 8);
        out[2] = parse_f(line + 46, 8);
        return true;
      },
      &na, &nf);
  if (rc != 0) return rc;
  if (na != natoms || nf != nframes) return 5;
  return 0;
}

}  // extern "C"
