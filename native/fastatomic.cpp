// fastatomic — native atomic-file (TSV) reader for recbole_cdr_tpu.
//
// Replaces the pandas read_csv + token-factorize host path for large datasets:
// mmaps the file, splits it into chunks at line boundaries, parses the chunks
// in parallel (memchr line/field scanning, local token->code maps, fast float
// parse), then merges the per-chunk factorizations into one global code space.
// The chunk count is FIXED (not core-count-dependent) so the output is
// deterministic across machines; only the thread count adapts.
//
// Round-5 rewrite: the round-2 version scanned byte-at-a-time on one thread
// with a hash lookup per cell and lost its race to pandas' C parser (2.49s vs
// 2.05s at 4M rows, results/scale_amazon.md). This version races under the
// repo's win-or-delete rule (same standard that deleted the Pallas kernel).
//
// Python API (CPython C API, no pybind11 in this image):
//   fastatomic.read(path: str, sep: str, col_kinds: list[int])
//     -> list over columns:
//        kind 0 (token): np.ndarray[object] of str (each unique token is ONE
//                        interned PyUnicode; rows share pointers — the
//                        python-side codes->object reconstruction this
//                        replaces cost ~0.3 s at 4M rows)
//        kind 1 (float): np.float64 array
// The header line is skipped. col_kinds must match the file's column count.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#define NPY_NO_DEPRECATED_API NPY_1_7_API_VERSION
#include <numpy/arrayobject.h>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <string>
#include <string_view>
#include <thread>
#include <unordered_map>
#include <vector>

namespace {

struct MappedFile {
  const char* data = nullptr;
  size_t size = 0;
  int fd = -1;

  bool open(const char* path) {
    fd = ::open(path, O_RDONLY);
    if (fd < 0) return false;
    struct stat st;
    if (fstat(fd, &st) != 0) {
      ::close(fd);
      return false;
    }
    size = static_cast<size_t>(st.st_size);
    if (size == 0) {
      data = nullptr;
      return true;
    }
    void* p = mmap(nullptr, size, PROT_READ, MAP_PRIVATE, fd, 0);
    if (p == MAP_FAILED) {
      ::close(fd);
      return false;
    }
    madvise(p, size, MADV_WILLNEED);
    data = static_cast<const char*>(p);
    return true;
  }

  ~MappedFile() {
    if (data) munmap(const_cast<char*>(data), size);
    if (fd >= 0) ::close(fd);
  }
};

// FNV-1a over the bytes — cheaper than libstdc++'s murmur for short tokens
inline uint64_t sv_hash(std::string_view sv) {
  uint64_t h = 1469598103934665603ull;
  for (char c : sv) {
    h ^= static_cast<unsigned char>(c);
    h *= 1099511628211ull;
  }
  return h;
}

// Open-addressing token->code map (linear probing, power-of-2 capacity).
// The per-cell find-or-insert is THE hot op of the parse (one per token
// cell); std::unordered_map's chained buckets cost ~2-3x more here.
class TokenMap {
 public:
  TokenMap() { rehash(1024); }

  // returns the code; appends to `uniques` on first sight
  int32_t find_or_insert(std::string_view sv,
                         std::vector<std::string_view>& uniques) {
    if (n_ * 4 >= cap_ * 3) rehash(cap_ * 2);
    const uint64_t h = sv_hash(sv);
    size_t i = static_cast<size_t>(h) & (cap_ - 1);
    while (true) {
      Slot& s = slots_[i];
      if (s.code < 0) {
        s.hash = h;
        s.sv = sv;
        s.code = static_cast<int32_t>(uniques.size());
        uniques.push_back(sv);
        n_++;
        return s.code;
      }
      if (s.hash == h && s.sv == sv) return s.code;
      i = (i + 1) & (cap_ - 1);
    }
  }

 private:
  struct Slot {
    uint64_t hash = 0;
    std::string_view sv;
    int32_t code = -1;
  };

  void rehash(size_t cap) {
    std::vector<Slot> old = std::move(slots_);
    cap_ = cap;
    slots_.assign(cap_, Slot{});
    for (const Slot& s : old) {
      if (s.code < 0) continue;
      size_t i = static_cast<size_t>(s.hash) & (cap_ - 1);
      while (slots_[i].code >= 0) i = (i + 1) & (cap_ - 1);
      slots_[i] = s;
    }
  }

  std::vector<Slot> slots_;
  size_t cap_ = 0;
  size_t n_ = 0;
};

// fast path for the common numeric shapes ("3", "4.5", "-0.25"); falls back
// to strtod for exponents/inf/nan/oddities
inline double parse_float(const char* b, const char* e) {
  if (b == e) return NAN;
  const char* p = b;
  bool neg = false;
  if (*p == '-' || *p == '+') {
    neg = (*p == '-');
    p++;
  }
  uint64_t ip = 0;
  int idig = 0;
  while (p < e && *p >= '0' && *p <= '9' && idig < 18) {
    ip = ip * 10 + static_cast<uint64_t>(*p - '0');
    p++;
    idig++;
  }
  double v = static_cast<double>(ip);
  if (p < e && *p == '.') {
    p++;
    uint64_t fp = 0;
    int fdig = 0;
    while (p < e && *p >= '0' && *p <= '9' && fdig < 18) {
      fp = fp * 10 + static_cast<uint64_t>(*p - '0');
      p++;
      fdig++;
    }
    static const double kPow10[19] = {
        1e0,  1e1,  1e2,  1e3,  1e4,  1e5,  1e6,  1e7,  1e8,  1e9,
        1e10, 1e11, 1e12, 1e13, 1e14, 1e15, 1e16, 1e17, 1e18};
    v += static_cast<double>(fp) / kPow10[fdig];
  }
  if (p != e) {  // exponent / overflow-length / junk: exact libc parse
    std::string tmp(b, static_cast<size_t>(e - b));
    return strtod(tmp.c_str(), nullptr);
  }
  return neg ? -v : v;
}

struct ChunkResult {
  // per token column: local codes + local uniques (first-occurrence order)
  std::vector<std::vector<int32_t>> codes;
  std::vector<std::vector<std::string_view>> uniques;
  std::vector<std::vector<double>> floats;
  size_t rows = 0;
  bool error = false;
  size_t error_off = 0;  // byte offset of the bad row
};

void parse_chunk(const char* p, const char* end, char sep,
                 const std::vector<int>& kinds, ChunkResult* out) {
  const size_t n_cols = kinds.size();
  out->codes.resize(n_cols);
  out->uniques.resize(n_cols);
  out->floats.resize(n_cols);
  std::vector<TokenMap> maps(n_cols);
  // reserve assuming ~32B/row to cut rehash/regrow stalls
  const size_t est_rows = static_cast<size_t>(end - p) / 32 + 16;
  for (size_t c = 0; c < n_cols; c++) {
    if (kinds[c] == 0) {
      out->codes[c].reserve(est_rows);
    } else {
      out->floats[c].reserve(est_rows);
    }
  }
  const char* base = p;
  while (p < end) {
    const char* nl = static_cast<const char*>(
        memchr(p, '\n', static_cast<size_t>(end - p)));
    const char* line_end = nl ? nl : end;
    if (line_end == p && !nl) break;  // trailing blank line at EOF
    const char* fe = line_end;
    if (fe > p && fe[-1] == '\r') fe--;
    if (fe == p && line_end == end) break;  // final blank line
    size_t col = 0;
    const char* fs = p;
    while (col < n_cols) {
      const char* fend = static_cast<const char*>(
          memchr(fs, sep, static_cast<size_t>(fe - fs)));
      const char* tok_end;
      if (col + 1 < n_cols) {
        if (!fend) {  // too few columns
          out->error = true;
          out->error_off = static_cast<size_t>(p - base);
          return;
        }
        tok_end = fend;
      } else {
        if (fend) {  // too many columns
          out->error = true;
          out->error_off = static_cast<size_t>(p - base);
          return;
        }
        tok_end = fe;
      }
      if (kinds[col] == 0) {
        std::string_view tok(fs, static_cast<size_t>(tok_end - fs));
        out->codes[col].push_back(
            maps[col].find_or_insert(tok, out->uniques[col]));
      } else {
        out->floats[col].push_back(parse_float(fs, tok_end));
      }
      col++;
      fs = (fend && col < n_cols) ? fend + 1 : fe;
    }
    out->rows++;
    if (!nl) break;
    p = nl + 1;
  }
}

PyObject* fastatomic_read(PyObject*, PyObject* args) {
  const char* path;
  const char* sep_str;
  PyObject* kinds_obj;
  if (!PyArg_ParseTuple(args, "ssO", &path, &sep_str, &kinds_obj)) return nullptr;
  if (strlen(sep_str) != 1) {
    PyErr_SetString(PyExc_ValueError, "separator must be a single character");
    return nullptr;
  }
  const char sep = sep_str[0];

  PyObject* kinds_fast = PySequence_Fast(kinds_obj, "col_kinds must be a sequence");
  if (!kinds_fast) return nullptr;
  const Py_ssize_t n_cols_s = PySequence_Fast_GET_SIZE(kinds_fast);
  std::vector<int> kinds(static_cast<size_t>(n_cols_s));
  for (Py_ssize_t i = 0; i < n_cols_s; i++) {
    kinds[static_cast<size_t>(i)] =
        static_cast<int>(PyLong_AsLong(PySequence_Fast_GET_ITEM(kinds_fast, i)));
  }
  Py_DECREF(kinds_fast);
  const size_t n_cols = kinds.size();

  MappedFile mf;
  if (!mf.open(path)) {
    PyErr_Format(PyExc_IOError, "cannot open/map file %s", path);
    return nullptr;
  }

  // body start: first byte after the header line
  const char* body = mf.data;
  const char* end = mf.data + mf.size;
  if (body) {
    const char* nl = static_cast<const char*>(
        memchr(body, '\n', mf.size));
    body = nl ? nl + 1 : end;
  } else {
    body = end = nullptr;
  }

  // FIXED chunking at line boundaries (deterministic output); threads adapt
  constexpr size_t kChunks = 16;
  std::vector<const char*> starts;
  starts.push_back(body);
  const size_t body_len = static_cast<size_t>(end - body);
  for (size_t i = 1; i < kChunks; i++) {
    const char* cand = body + (body_len * i) / kChunks;
    if (cand <= starts.back()) cand = starts.back();
    const char* nl = cand < end
        ? static_cast<const char*>(memchr(cand, '\n', static_cast<size_t>(end - cand)))
        : nullptr;
    starts.push_back(nl ? nl + 1 : end);
  }
  starts.push_back(end);

  std::vector<ChunkResult> results(kChunks);
  {
    Py_BEGIN_ALLOW_THREADS
    unsigned hw = std::thread::hardware_concurrency();
    size_t n_threads = hw ? (hw < 8 ? hw : 8) : 2;
    if (n_threads > kChunks) n_threads = kChunks;
    std::vector<std::thread> threads;
    // static round-robin assignment (no atomics needed: chunk i -> thread i%T)
    for (size_t t = 0; t < n_threads; t++) {
      threads.emplace_back([&, t]() {
        for (size_t i = t; i < kChunks; i += n_threads) {
          parse_chunk(starts[i], starts[i + 1], sep, kinds, &results[i]);
        }
      });
    }
    for (auto& th : threads) th.join();
    Py_END_ALLOW_THREADS
  }

  size_t n_rows = 0;
  for (const auto& r : results) {
    if (r.error) {
      PyErr_Format(PyExc_ValueError,
                   "row at byte offset %zu has wrong column count", r.error_off);
      return nullptr;
    }
    n_rows += r.rows;
  }

  // merge: global token maps built chunk-by-chunk (deterministic), then each
  // chunk's local codes remap into the preallocated int64 output
  PyObject* out = PyList_New(static_cast<Py_ssize_t>(n_cols));
  if (!out) return nullptr;
  for (size_t c = 0; c < n_cols; c++) {
    npy_intp dims[1] = {static_cast<npy_intp>(n_rows)};
    if (kinds[c] == 0) {
      PyObject* obj_arr = PyArray_SimpleNew(1, dims, NPY_OBJECT);
      if (!obj_arr) { Py_DECREF(out); return nullptr; }
      PyObject** dst = static_cast<PyObject**>(
          PyArray_DATA(reinterpret_cast<PyArrayObject*>(obj_arr)));
      TokenMap global;
      std::vector<std::string_view> guniq;
      std::vector<PyObject*> gobjs;  // one PyUnicode per global unique token
      size_t off = 0;
      bool fail = false;
      for (const auto& r : results) {
        std::vector<PyObject*> remap(r.uniques[c].size());
        for (size_t u = 0; u < r.uniques[c].size(); u++) {
          int32_t gcode = global.find_or_insert(r.uniques[c][u], guniq);
          if (static_cast<size_t>(gcode) == gobjs.size()) {
            PyObject* s = PyUnicode_FromStringAndSize(
                r.uniques[c][u].data(),
                static_cast<Py_ssize_t>(r.uniques[c][u].size()));
            if (!s) { fail = true; break; }
            gobjs.push_back(s);
          }
          remap[u] = gobjs[static_cast<size_t>(gcode)];
        }
        if (fail) break;
        const auto& lc = r.codes[c];
        for (size_t j = 0; j < lc.size(); j++) {
          PyObject* s = remap[static_cast<size_t>(lc[j])];
          Py_INCREF(s);
          dst[off + j] = s;
        }
        off += lc.size();
      }
      // rows hold one ref each; drop the construction refs
      for (PyObject* s : gobjs) Py_DECREF(s);
      if (fail) { Py_DECREF(obj_arr); Py_DECREF(out); return nullptr; }
      PyList_SET_ITEM(out, static_cast<Py_ssize_t>(c), obj_arr);
    } else {
      PyObject* arr = PyArray_SimpleNew(1, dims, NPY_FLOAT64);
      if (!arr) { Py_DECREF(out); return nullptr; }
      double* dst = static_cast<double*>(
          PyArray_DATA(reinterpret_cast<PyArrayObject*>(arr)));
      size_t off = 0;
      for (const auto& r : results) {
        memcpy(dst + off, r.floats[c].data(), r.floats[c].size() * sizeof(double));
        off += r.floats[c].size();
      }
      PyList_SET_ITEM(out, static_cast<Py_ssize_t>(c), arr);
    }
  }
  return out;
}

PyMethodDef methods[] = {
    {"read", fastatomic_read, METH_VARARGS,
     "read(path, sep, col_kinds) -> per-column parsed data"},
    {nullptr, nullptr, 0, nullptr},
};

struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "fastatomic",
    "native atomic-file reader (mmap + parallel tokenize/factorize)", -1, methods,
};

}  // namespace

PyMODINIT_FUNC PyInit_fastatomic(void) {
  import_array();
  return PyModule_Create(&moduledef);
}
