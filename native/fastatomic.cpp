// fastatomic — native atomic-file (TSV) reader for recbole_cdr_tpu.
//
// Replaces the pandas read_csv + token-factorize host path for large datasets:
// mmaps the file, splits lines/fields in one pass, and for token columns
// builds the token -> code factorization natively (string_view hash map, no
// per-cell python objects). Float columns parse straight into float64 arrays.
//
// Python API (CPython C API, no pybind11 in this image):
//   fastatomic.read(path: str, sep: str, col_kinds: list[int])
//     -> list over columns:
//        kind 0 (token): (codes: np.int64 array, uniques: list[str])
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

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <string>
#include <string_view>
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
    madvise(p, size, MADV_SEQUENTIAL);
    data = static_cast<const char*>(p);
    return true;
  }

  ~MappedFile() {
    if (data) munmap(const_cast<char*>(data), size);
    if (fd >= 0) ::close(fd);
  }
};

struct TokenColumn {
  std::vector<int64_t> codes;
  std::vector<std::string_view> uniques;
  std::unordered_map<std::string_view, int64_t> map;

  void push(std::string_view tok) {
    auto it = map.find(tok);
    if (it == map.end()) {
      int64_t code = static_cast<int64_t>(uniques.size());
      map.emplace(tok, code);
      uniques.push_back(tok);
      codes.push_back(code);
    } else {
      codes.push_back(it->second);
    }
  }
};

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
  const Py_ssize_t n_cols = PySequence_Fast_GET_SIZE(kinds_fast);
  std::vector<int> kinds(n_cols);
  for (Py_ssize_t i = 0; i < n_cols; i++) {
    kinds[i] = static_cast<int>(PyLong_AsLong(PySequence_Fast_GET_ITEM(kinds_fast, i)));
  }
  Py_DECREF(kinds_fast);

  MappedFile mf;
  if (!mf.open(path)) {
    PyErr_Format(PyExc_IOError, "cannot open/map file %s", path);
    return nullptr;
  }

  std::vector<TokenColumn> token_cols(n_cols);
  std::vector<std::vector<double>> float_cols(n_cols);

  bool parse_error = false;
  size_t error_line = 0;

  Py_BEGIN_ALLOW_THREADS
  const char* p = mf.data;
  const char* end = mf.data + mf.size;

  // skip header line
  while (p < end && *p != '\n') p++;
  if (p < end) p++;

  size_t line_no = 1;
  while (p < end) {
    line_no++;
    Py_ssize_t col = 0;
    const char* field_start = p;
    while (true) {
      if (p == end || *p == '\n' || *p == sep) {
        if (col < n_cols) {
          const char* fe = p;
          // strip trailing \r
          if ((p == end || *p == '\n') && fe > field_start && fe[-1] == '\r') fe--;
          std::string_view tok(field_start, static_cast<size_t>(fe - field_start));
          if (kinds[col] == 0) {
            token_cols[col].push(tok);
          } else {
            char* parse_end = nullptr;
            double v = tok.empty() ? NAN : strtod(tok.data(), &parse_end);
            float_cols[col].push_back(v);
          }
        }
        col++;
        if (p == end) break;
        const char c = *p;
        p++;
        if (c == '\n') break;
        field_start = p;
      } else {
        p++;
      }
    }
    // blank trailing line (single empty field) is tolerated
    if (col != n_cols && !(col == 1 && p >= end)) {
      parse_error = true;
      error_line = line_no;
      break;
    }
  }
  Py_END_ALLOW_THREADS

  if (parse_error) {
    PyErr_Format(PyExc_ValueError, "row at line %zu has wrong column count", error_line);
    return nullptr;
  }

  // drop a trailing "row" produced by a final blank line
  size_t n_rows = SIZE_MAX;
  for (Py_ssize_t c = 0; c < n_cols; c++) {
    size_t len = (kinds[c] == 0) ? token_cols[c].codes.size() : float_cols[c].size();
    if (len < n_rows) n_rows = len;
  }
  if (n_rows == SIZE_MAX) n_rows = 0;

  PyObject* out = PyList_New(n_cols);
  if (!out) return nullptr;
  for (Py_ssize_t c = 0; c < n_cols; c++) {
    npy_intp dims[1] = {static_cast<npy_intp>(n_rows)};
    if (kinds[c] == 0) {
      PyObject* codes = PyArray_SimpleNew(1, dims, NPY_INT64);
      if (!codes) { Py_DECREF(out); return nullptr; }
      memcpy(PyArray_DATA(reinterpret_cast<PyArrayObject*>(codes)),
             token_cols[c].codes.data(), n_rows * sizeof(int64_t));
      PyObject* uniq = PyList_New(static_cast<Py_ssize_t>(token_cols[c].uniques.size()));
      if (!uniq) { Py_DECREF(codes); Py_DECREF(out); return nullptr; }
      for (size_t u = 0; u < token_cols[c].uniques.size(); u++) {
        std::string_view sv = token_cols[c].uniques[u];
        PyObject* s = PyUnicode_FromStringAndSize(sv.data(), static_cast<Py_ssize_t>(sv.size()));
        if (!s) { Py_DECREF(uniq); Py_DECREF(codes); Py_DECREF(out); return nullptr; }
        PyList_SET_ITEM(uniq, static_cast<Py_ssize_t>(u), s);
      }
      PyObject* pair = PyTuple_Pack(2, codes, uniq);
      Py_DECREF(codes);
      Py_DECREF(uniq);
      PyList_SET_ITEM(out, c, pair);
    } else {
      PyObject* arr = PyArray_SimpleNew(1, dims, NPY_FLOAT64);
      if (!arr) { Py_DECREF(out); return nullptr; }
      memcpy(PyArray_DATA(reinterpret_cast<PyArrayObject*>(arr)),
             float_cols[c].data(), n_rows * sizeof(double));
      PyList_SET_ITEM(out, c, arr);
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
    "native atomic-file reader (mmap + one-pass tokenize/factorize)", -1, methods,
};

}  // namespace

PyMODINIT_FUNC PyInit_fastatomic(void) {
  import_array();
  return PyModule_Create(&moduledef);
}
