// Native .tbl text IO for htm_hashjoin_tpu.
//
// Counterpart of the Wisconsin storage engine's text loader/writer
// (mc/wisconsin-src/loader.cpp — field-separated values parsed per schema;
// mc/wisconsin-src/table.h:193 nontemporalappend16 writer).  The reference
// parses serially per tuple; this implementation is a two-pass parallel
// parser: pass 1 splits the file into newline-aligned byte ranges and counts
// rows per range, pass 2 parses each range directly into its exact output
// slots.  Plain C ABI consumed via ctypes (no pybind11 in this image).
//
// Scope: integer columns (the join benchmark schemas are ("long","long")).
// Files with non-integer fields take the Python fallback path.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr int kMaxThreads = 32;

inline unsigned hw_threads() {
  unsigned n = std::thread::hardware_concurrency();
  if (n == 0) n = 4;
  return n < kMaxThreads ? n : kMaxThreads;
}

// Read a whole file into memory; returns true on success.
bool read_all(const char* path, std::vector<char>& buf) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long sz = std::ftell(f);
  if (sz < 0) { std::fclose(f); return false; }
  std::fseek(f, 0, SEEK_SET);
  buf.resize(static_cast<size_t>(sz));
  size_t got = sz ? std::fread(buf.data(), 1, buf.size(), f) : 0;
  std::fclose(f);
  return got == buf.size();
}

// Parse one signed integer starting at p; advances p past the number.
inline int64_t parse_i64(const char*& p, const char* end) {
  bool neg = false;
  if (p < end && (*p == '-' || *p == '+')) { neg = (*p == '-'); ++p; }
  int64_t v = 0;
  while (p < end && *p >= '0' && *p <= '9') v = v * 10 + (*p++ - '0');
  return neg ? -v : v;
}

struct Range { const char* begin; const char* end; int64_t rows; };

// Split data into newline-aligned ranges and count rows in each.
std::vector<Range> split_ranges(const char* data, size_t n, unsigned parts) {
  std::vector<Range> rs;
  const char* end = data + n;
  const char* cur = data;
  for (unsigned i = 0; i < parts && cur < end; ++i) {
    const char* stop = (i + 1 == parts) ? end : data + (n * (i + 1)) / parts;
    if (stop > end) stop = end;
    // advance stop to the next newline boundary
    while (stop < end && stop[-1] != '\n') ++stop;
    rs.push_back({cur, stop, 0});
    cur = stop;
  }
  std::vector<std::thread> ts;
  for (auto& r : rs)
    ts.emplace_back([&r] {
      int64_t rows = 0;
      const char* p = r.begin;
      while (p < r.end) {
        const char* nl = static_cast<const char*>(
            memchr(p, '\n', static_cast<size_t>(r.end - p)));
        if (!nl) { if (r.end - p > 0) ++rows; break; }
        if (nl > p) ++rows;       // skip empty lines
        p = nl + 1;
      }
      r.rows = rows;
    });
  for (auto& t : ts) t.join();
  return rs;
}

}  // namespace

extern "C" {

// Number of non-empty rows in the file; -1 on IO error.
int64_t htm_tbl_count_rows(const char* path) {
  std::vector<char> buf;
  if (!read_all(path, buf)) return -1;
  auto rs = split_ranges(buf.data(), buf.size(), hw_threads());
  int64_t total = 0;
  for (auto& r : rs) total += r.rows;
  return total;
}

// Parse an ncols integer .tbl into row-major out[rows*ncols].
// `sep` is the field separator (e.g. '|').  Returns rows parsed, or -1 on
// IO error, -2 if rows exceed max_rows.
int64_t htm_tbl_load(const char* path, int64_t* out, int32_t ncols,
                     int64_t max_rows, char sep) {
  std::vector<char> buf;
  if (!read_all(path, buf)) return -1;
  auto rs = split_ranges(buf.data(), buf.size(), hw_threads());
  int64_t total = 0;
  std::vector<int64_t> starts;
  for (auto& r : rs) { starts.push_back(total); total += r.rows; }
  if (total > max_rows) return -2;
  std::vector<std::thread> ts;
  for (size_t i = 0; i < rs.size(); ++i) {
    ts.emplace_back([&, i] {
      const Range& r = rs[i];
      int64_t* row_out = out + starts[i] * ncols;
      const char* p = r.begin;
      while (p < r.end) {
        const char* nl = static_cast<const char*>(
            memchr(p, '\n', static_cast<size_t>(r.end - p)));
        const char* line_end = nl ? nl : r.end;
        if (line_end > p) {
          for (int32_t c = 0; c < ncols; ++c) {
            row_out[c] = parse_i64(p, line_end);
            while (p < line_end && *p == sep) ++p;
          }
          row_out += ncols;
        }
        if (!nl) break;
        p = nl + 1;
      }
    });
  }
  for (auto& t : ts) t.join();
  return total;
}

// Write row-major int64 data as a sep-separated .tbl.  Returns rows written
// or -1 on IO error.  Serial writer (the file is the bottleneck), buffered.
int64_t htm_tbl_write(const char* path, const int64_t* data, int32_t ncols,
                      int64_t rows, char sep) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return -1;
  std::vector<char> buf;
  buf.reserve(1 << 22);
  char tmp[24];
  for (int64_t r = 0; r < rows; ++r) {
    for (int32_t c = 0; c < ncols; ++c) {
      int len = std::snprintf(tmp, sizeof(tmp), "%lld",
                              static_cast<long long>(data[r * ncols + c]));
      buf.insert(buf.end(), tmp, tmp + len);
      buf.push_back(c + 1 == ncols ? '\n' : sep);
    }
    if (buf.size() > (1 << 22) - 64) {
      if (std::fwrite(buf.data(), 1, buf.size(), f) != buf.size()) {
        std::fclose(f);
        return -1;
      }
      buf.clear();
    }
  }
  if (!buf.empty() &&
      std::fwrite(buf.data(), 1, buf.size(), f) != buf.size()) {
    std::fclose(f);
    return -1;
  }
  std::fclose(f);
  return rows;
}

}  // extern "C"
