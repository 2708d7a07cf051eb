// Fast CSV ingest for causalgpslc_tpu.
//
// Native replacement for the reference's CSV.jl/DataFrames ingest path
// (/root/reference/src/data.jl:7-9). Parses a GPSLC-convention CSV (header
// row; numeric, boolean, or categorical columns) into column-major double
// storage in a single pass over an mmap'd file, factorizing non-numeric
// columns into first-appearance integer codes with the label table returned
// out-of-band. Exposed as a C ABI consumed via ctypes (no pybind11 in the
// build image).
//
// Build: see build.py (g++ -O3 -shared -fPIC).

#include <cctype>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct Column {
  std::string name;
  std::vector<double> values;
  bool is_categorical = false;
  bool is_boolean = false;
  std::unordered_map<std::string, int32_t> codes;
  std::vector<std::string> labels;  // code -> label
};

struct ParsedCsv {
  std::vector<Column> columns;
  int64_t n_rows = 0;
  std::string error;
  // flattened outputs handed to the caller
  std::vector<double> data;        // column-major (n_cols * n_rows)
  std::string header_joined;       // '\n'-joined column names
  std::string labels_joined;       // per categorical column: name '\x01' l1 '\x02' l2 ... '\n'
  std::vector<uint8_t> col_flags;  // bit0: categorical, bit1: boolean
};

bool parse_double(const char* s, size_t len, double* out) {
  if (len == 0) return false;
  char buf[64];
  if (len >= sizeof(buf)) return false;
  std::memcpy(buf, s, len);
  buf[len] = '\0';
  char* end = nullptr;
  double v = std::strtod(buf, &end);
  if (end != buf + len) return false;
  *out = v;
  return true;
}

bool iequals(const char* s, size_t len, const char* lit) {
  size_t n = std::strlen(lit);
  if (len != n) return false;
  for (size_t i = 0; i < n; ++i) {
    if (std::tolower(static_cast<unsigned char>(s[i])) != lit[i]) return false;
  }
  return true;
}

ParsedCsv* parse(const char* path) {
  auto* out = new ParsedCsv();
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) {
    out->error = "cannot open file";
    return out;
  }
  struct stat st;
  if (fstat(fd, &st) != 0 || st.st_size == 0) {
    out->error = "cannot stat file / empty file";
    ::close(fd);
    return out;
  }
  size_t size = static_cast<size_t>(st.st_size);
  const char* base =
      static_cast<const char*>(mmap(nullptr, size, PROT_READ, MAP_PRIVATE, fd, 0));
  ::close(fd);
  if (base == MAP_FAILED) {
    out->error = "mmap failed";
    return out;
  }

  const char* p = base;
  const char* end = base + size;

  // header
  {
    const char* line_end = static_cast<const char*>(memchr(p, '\n', end - p));
    if (!line_end) line_end = end;
    const char* field = p;
    for (const char* q = p; q <= line_end; ++q) {
      if (q == line_end || *q == ',') {
        size_t len = q - field;
        while (len > 0 && (field[len - 1] == '\r' || field[len - 1] == ' ')) --len;
        out->columns.push_back(Column{std::string(field, len)});
        field = q + 1;
      }
    }
    p = (line_end == end) ? end : line_end + 1;
  }
  const size_t n_cols = out->columns.size();

  // data rows
  while (p < end) {
    const char* line_end = static_cast<const char*>(memchr(p, '\n', end - p));
    if (!line_end) line_end = end;
    if (line_end == p || (line_end == p + 1 && *p == '\r')) {
      p = (line_end == end) ? end : line_end + 1;
      continue;  // blank line
    }
    size_t col = 0;
    const char* field = p;
    for (const char* q = p; q <= line_end; ++q) {
      if (q == line_end || *q == ',') {
        if (col >= n_cols) {
          out->error = "row has more fields than header";
          munmap(const_cast<char*>(base), size);
          return out;
        }
        size_t len = q - field;
        while (len > 0 && (field[len - 1] == '\r' || field[len - 1] == ' ')) --len;
        Column& c = out->columns[col];
        double v;
        if (!c.is_categorical && parse_double(field, len, &v)) {
          c.values.push_back(v);
        } else if (iequals(field, len, "true")) {
          c.is_boolean = true;
          c.values.push_back(1.0);
        } else if (iequals(field, len, "false")) {
          c.is_boolean = true;
          c.values.push_back(0.0);
        } else {
          // categorical: factorize; retrofit prior numeric values as labels
          if (!c.is_categorical) {
            c.is_categorical = true;
            std::vector<double> recoded;
            recoded.reserve(c.values.size());
            for (double prev : c.values) {
              char buf[32];
              snprintf(buf, sizeof(buf), "%.17g", prev);
              std::string key(buf);
              auto it = c.codes.find(key);
              int32_t code;
              if (it == c.codes.end()) {
                code = static_cast<int32_t>(c.labels.size());
                c.codes.emplace(key, code);
                c.labels.push_back(key);
              } else {
                code = it->second;
              }
              recoded.push_back(code);
            }
            c.values = std::move(recoded);
          }
          std::string key(field, len);
          auto it = c.codes.find(key);
          int32_t code;
          if (it == c.codes.end()) {
            code = static_cast<int32_t>(c.labels.size());
            c.codes.emplace(key, code);
            c.labels.push_back(key);
          } else {
            code = it->second;
          }
          c.values.push_back(code);
        }
        ++col;
        field = q + 1;
      }
    }
    if (col != n_cols) {
      out->error = "row has fewer fields than header";
      munmap(const_cast<char*>(base), size);
      return out;
    }
    ++out->n_rows;
    p = (line_end == end) ? end : line_end + 1;
  }
  munmap(const_cast<char*>(base), size);

  // flatten
  out->data.reserve(n_cols * out->n_rows);
  for (size_t c = 0; c < n_cols; ++c) {
    Column& col = out->columns[c];
    if (static_cast<int64_t>(col.values.size()) != out->n_rows) {
      out->error = "ragged column " + col.name;
      return out;
    }
    out->data.insert(out->data.end(), col.values.begin(), col.values.end());
    out->header_joined += col.name;
    out->header_joined += '\n';
    out->col_flags.push_back(
        static_cast<uint8_t>((col.is_categorical ? 1 : 0) | (col.is_boolean ? 2 : 0)));
    if (col.is_categorical) {
      out->labels_joined += col.name;
      for (const auto& l : col.labels) {
        out->labels_joined += '\x01';
        out->labels_joined += l;
      }
      out->labels_joined += '\n';
    }
  }
  return out;
}

}  // namespace

extern "C" {

// Returns an opaque handle; inspect with the accessors below; free with
// fastcsv_free.
void* fastcsv_parse(const char* path) { return parse(path); }

const char* fastcsv_error(void* h) {
  auto* p = static_cast<ParsedCsv*>(h);
  return p->error.empty() ? nullptr : p->error.c_str();
}
int64_t fastcsv_rows(void* h) { return static_cast<ParsedCsv*>(h)->n_rows; }
int64_t fastcsv_cols(void* h) {
  return static_cast<int64_t>(static_cast<ParsedCsv*>(h)->columns.size());
}
const double* fastcsv_data(void* h) { return static_cast<ParsedCsv*>(h)->data.data(); }
const char* fastcsv_header(void* h) {
  return static_cast<ParsedCsv*>(h)->header_joined.c_str();
}
const char* fastcsv_labels(void* h) {
  return static_cast<ParsedCsv*>(h)->labels_joined.c_str();
}
const uint8_t* fastcsv_flags(void* h) {
  return static_cast<ParsedCsv*>(h)->col_flags.data();
}
void fastcsv_free(void* h) { delete static_cast<ParsedCsv*>(h); }

// Block covariance construction (generateSigmaU, src/utils.jl:17-33):
// given run-length counts, fill an n x n row-major buffer.
void fastcsv_sigma_u(const int64_t* counts, int64_t n_groups, double eps, double cov,
                     double* out, int64_t n) {
  std::memset(out, 0, sizeof(double) * n * n);
  int64_t i = 0;
  for (int64_t g = 0; g < n_groups; ++g) {
    int64_t c = counts[g];
    for (int64_t r = i; r < i + c; ++r)
      for (int64_t q = i; q < i + c; ++q) out[r * n + q] = cov;
    i += c;
  }
  for (int64_t d = 0; d < n; ++d) out[d * n + d] = 1.0 + eps;
}

}  // extern "C"
