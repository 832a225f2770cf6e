// warpdb_tpu native runtime library.
//
// Host-side native components, mirroring where the reference is native
// C++ (SURVEY.md §2): a multithreaded CSV -> float32 columnar parser
// (replacing csv_loader.cpp's single-threaded per-cell std::stof loop)
// and an Arrow C Data Interface exporter with POSIX shared-memory
// support (the capability of arrow_utils.cpp:37-94, re-implemented).
//
// Exposed via a plain C ABI consumed through ctypes
// (warpdb_tpu/interchange/native.py).  Build: `make -C native`.

#include <atomic>
#include <cerrno>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <future>
#include <memory>
#include <string>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

// ---------------------------------------------------------------------------
// mmap helper
// ---------------------------------------------------------------------------

struct MappedFile {
  const char *data = nullptr;
  size_t size = 0;
  int fd = -1;

  bool open_file(const char *path) {
    fd = ::open(path, O_RDONLY);
    if (fd < 0) return false;
    struct stat st;
    if (fstat(fd, &st) != 0 || st.st_size == 0) {
      ::close(fd);
      fd = -1;
      return st.st_size == 0;  // empty file: valid, zero rows
    }
    size = static_cast<size_t>(st.st_size);
    void *p = mmap(nullptr, size, PROT_READ, MAP_PRIVATE, fd, 0);
    if (p == MAP_FAILED) {
      ::close(fd);
      fd = -1;
      return false;
    }
    madvise(p, size, MADV_SEQUENTIAL);
    data = static_cast<const char *>(p);
    return true;
  }

  ~MappedFile() {
    if (data) munmap(const_cast<char *>(data), size);
    if (fd >= 0) ::close(fd);
  }
};

// Skip the header line; returns offset of the first data byte.
size_t body_offset(const MappedFile &mf) {
  const char *nl =
      static_cast<const char *>(memchr(mf.data, '\n', mf.size));
  if (!nl) return mf.size;
  return static_cast<size_t>(nl - mf.data) + 1;
}

size_t count_newlines(const char *p, size_t n) {
  size_t count = 0;
  const char *end = p + n;
  while (p < end) {
    const char *nl = static_cast<const char *>(memchr(p, '\n', end - p));
    if (!nl) break;
    ++count;
    p = nl + 1;
  }
  return count;
}

// Fast float parse for typical CSV numerics (sign, digits, dot, digits,
// optional exponent).  Falls back to strtof for anything exotic.
inline float parse_f32(const char *p, const char *end) {
  bool neg = false;
  if (p < end && (*p == '-' || *p == '+')) {
    neg = (*p == '-');
    ++p;
  }
  uint64_t mant = 0;
  int digits = 0;
  while (p < end && *p >= '0' && *p <= '9' && digits < 17) {
    mant = mant * 10 + static_cast<uint64_t>(*p - '0');
    ++p;
    ++digits;
  }
  int frac = 0;
  if (p < end && *p == '.') {
    ++p;
    while (p < end && *p >= '0' && *p <= '9' && digits < 17) {
      mant = mant * 10 + static_cast<uint64_t>(*p - '0');
      ++p;
      ++digits;
      ++frac;
    }
  }
  if (p < end && (*p == 'e' || *p == 'E')) {
    // Exponent: rare in bulk data; use strtof on the original token.
    return 0.0f / 0.0f;  // signal caller to retry with strtof
  }
  double v = static_cast<double>(mant);
  static const double kPow10[] = {1.0, 1e1, 1e2, 1e3, 1e4, 1e5, 1e6, 1e7,
                                  1e8, 1e9, 1e10, 1e11, 1e12, 1e13, 1e14,
                                  1e15, 1e16, 1e17};
  if (frac > 0) v /= kPow10[frac];
  return static_cast<float>(neg ? -v : v);
}

inline float parse_cell(const char *p, const char *end, bool *ok) {
  if (p >= end) {
    *ok = false;  // empty cell — the reference's std::stof throws here
    return 0.0f;
  }
  float v = parse_f32(p, end);
  if (v != v) {  // NaN sentinel → exponent or garbage; strtof fallback
    std::string tmp(p, static_cast<size_t>(end - p));
    char *endp = nullptr;
    v = strtof(tmp.c_str(), &endp);
    if (endp == tmp.c_str()) *ok = false;  // no digits consumed
    return v;
  }
  // parse_f32 consumed sign/digits/dot; reject if the token had no digit.
  const char *q = p;
  if (*q == '-' || *q == '+') ++q;
  bool has_digit = false;
  for (; q < end; ++q)
    if (*q >= '0' && *q <= '9') { has_digit = true; break; }
  if (!has_digit) *ok = false;
  return v;
}

// Parse rows in [chunk_begin, chunk_end) writing into column-major
// out[col * max_rows + row], rows starting at row_base.  Sets *bad on
// malformed numeric cells (the reference's std::stof would throw,
// csv_loader.cpp:100-120).
void parse_range(const char *begin, const char *end, int num_columns,
                 int64_t row_base, int64_t max_rows, float *out,
                 std::atomic<bool> *bad) {
  const char *p = begin;
  int64_t row = row_base;
  bool ok = true;
  while (p < end && row < max_rows) {
    const char *nl = static_cast<const char *>(memchr(p, '\n', end - p));
    const char *line_end = nl ? nl : end;
    if (line_end > p) {  // skip blank lines
      const char *cell = p;
      for (int c = 0; c < num_columns; ++c) {
        const char *comma = static_cast<const char *>(
            memchr(cell, ',', line_end - cell));
        const char *cell_end = comma ? comma : line_end;
        // Trim trailing CR.
        const char *ce = cell_end;
        while (ce > cell && (ce[-1] == '\r' || ce[-1] == ' ')) --ce;
        out[static_cast<int64_t>(c) * max_rows + row] =
            parse_cell(cell, ce, &ok);
        cell = comma ? comma + 1 : line_end;
      }
      ++row;
    }
    if (!nl) break;
    p = nl + 1;
  }
  if (!ok) bad->store(true, std::memory_order_relaxed);
}

}  // namespace

extern "C" {

// Number of data rows (excluding header, excluding blank lines is NOT
// attempted here — blank-line handling happens in the parser; callers
// size buffers with this upper bound).
long long wdb_csv_count_rows(const char *path) {
  MappedFile mf;
  if (!mf.open_file(path)) return -1;
  if (mf.size == 0) return 0;
  size_t off = body_offset(mf);
  size_t rows = count_newlines(mf.data + off, mf.size - off);
  // Final line without trailing newline.
  if (mf.size > off && mf.data[mf.size - 1] != '\n') ++rows;
  return static_cast<long long>(rows);
}

// Parse all data rows into column-major float32 out[col][row].
// Returns the number of rows parsed, or -1 on error.
long long wdb_csv_parse_f32(const char *path, int num_columns,
                            long long max_rows, float *out,
                            int num_threads) {
  if (num_columns <= 0 || max_rows < 0 || !out) return -1;
  MappedFile mf;
  if (!mf.open_file(path)) return -1;
  if (mf.size == 0) return 0;
  size_t off = body_offset(mf);
  const char *body = mf.data + off;
  size_t body_len = mf.size - off;
  if (body_len == 0) return 0;

  unsigned hw = std::thread::hardware_concurrency();
  int nthreads = num_threads > 0 ? num_threads : static_cast<int>(hw ? hw : 4);
  if (body_len < (1u << 20)) nthreads = 1;  // small files: no fan-out

  // Split the body into nthreads byte ranges aligned to line boundaries.
  std::vector<const char *> starts(static_cast<size_t>(nthreads) + 1);
  starts[0] = body;
  starts[static_cast<size_t>(nthreads)] = body + body_len;
  for (int t = 1; t < nthreads; ++t) {
    const char *guess = body + (body_len * static_cast<size_t>(t)) /
                                   static_cast<size_t>(nthreads);
    const char *nl = static_cast<const char *>(
        memchr(guess, '\n', static_cast<size_t>(body + body_len - guess)));
    starts[static_cast<size_t>(t)] = nl ? nl + 1 : body + body_len;
  }

  // Pass 1 (parallel): rows per range → row base offsets.
  std::vector<int64_t> range_rows(static_cast<size_t>(nthreads), 0);
  {
    std::vector<std::thread> workers;
    for (int t = 0; t < nthreads; ++t) {
      workers.emplace_back([&, t] {
        const char *b = starts[static_cast<size_t>(t)];
        const char *e = starts[static_cast<size_t>(t) + 1];
        size_t rows = count_newlines(b, static_cast<size_t>(e - b));
        if (e > b && e[-1] != '\n') ++rows;
        range_rows[static_cast<size_t>(t)] = static_cast<int64_t>(rows);
      });
    }
    for (auto &w : workers) w.join();
  }
  std::vector<int64_t> row_base(static_cast<size_t>(nthreads) + 1, 0);
  for (int t = 0; t < nthreads; ++t)
    row_base[static_cast<size_t>(t) + 1] =
        row_base[static_cast<size_t>(t)] + range_rows[static_cast<size_t>(t)];
  int64_t total = row_base[static_cast<size_t>(nthreads)];
  if (total > max_rows) total = max_rows;

  // Pass 2 (parallel): parse.
  std::atomic<bool> bad(false);
  {
    std::vector<std::thread> workers;
    for (int t = 0; t < nthreads; ++t) {
      workers.emplace_back([&, t] {
        parse_range(starts[static_cast<size_t>(t)],
                    starts[static_cast<size_t>(t) + 1], num_columns,
                    row_base[static_cast<size_t>(t)], max_rows, out, &bad);
      });
    }
    for (auto &w : workers) w.join();
  }
  if (bad.load()) return -2;  // malformed cell
  return total;
}

// ---------------------------------------------------------------------------
// Streaming chunked CSV reader with background prefetch.
//
// Replaces the reference's load_csv_chunk loop (csv_loader.cpp:186-223 —
// which also re-ate a "header" per chunk) for the out-of-core path:
// while the caller uploads/computes chunk k, a worker thread parses
// chunk k+1 from the mmap.  Plain C ABI:
//   wdb_csv_stream_open(path, ncols, rows_per_chunk) -> handle | NULL
//   wdb_csv_stream_next(handle, out[ncols*rows_per_chunk]) -> rows
//       (0 = EOF, -2 = malformed cell)
//   wdb_csv_stream_close(handle)
// ---------------------------------------------------------------------------

namespace {

struct CsvStream {
  MappedFile mf;
  int ncols = 0;
  int64_t chunk_rows = 0;
  size_t pos = 0;  // next unparsed byte (owned by the worker task)
  // Prefetch state: the future produces (rows, buffer, new_pos, bad).
  struct Chunk {
    int64_t rows = 0;
    std::vector<float> data;  // column-major [ncols][chunk_rows]
    size_t next_pos = 0;
    bool bad = false;
  };
  std::future<Chunk> pending;

  Chunk parse_next(size_t from) {
    Chunk out;
    out.next_pos = from;
    out.data.assign(static_cast<size_t>(ncols) *
                        static_cast<size_t>(chunk_rows),
                    0.0f);
    if (from >= mf.size) return out;
    const char *p = mf.data + from;
    const char *end = mf.data + mf.size;
    // Find the byte range holding the next chunk_rows non-blank lines.
    const char *q = p;
    int64_t rows = 0;
    while (q < end && rows < chunk_rows) {
      const char *nl = static_cast<const char *>(memchr(q, '\n', end - q));
      const char *line_end = nl ? nl : end;
      if (line_end > q) ++rows;  // skip blank lines
      q = nl ? nl + 1 : end;
    }
    std::atomic<bool> bad(false);
    parse_range(p, q, ncols, 0, chunk_rows, out.data.data(), &bad);
    out.rows = rows;
    out.bad = bad.load();
    out.next_pos = static_cast<size_t>(q - mf.data);
    return out;
  }

  void start_prefetch() {
    size_t from = pos;
    pending = std::async(std::launch::async,
                         [this, from] { return parse_next(from); });
  }
};

}  // namespace

extern "C" {

void *wdb_csv_stream_open(const char *path, int num_columns,
                          long long rows_per_chunk) {
  if (num_columns <= 0 || rows_per_chunk <= 0) return nullptr;
  auto stream = std::make_unique<CsvStream>();
  if (!stream->mf.open_file(path)) return nullptr;
  stream->ncols = num_columns;
  stream->chunk_rows = rows_per_chunk;
  stream->pos = stream->mf.size ? body_offset(stream->mf) : 0;
  stream->start_prefetch();
  return stream.release();
}

long long wdb_csv_stream_next(void *handle, float *out) {
  if (!handle || !out) return -1;
  auto *stream = static_cast<CsvStream *>(handle);
  if (!stream->pending.valid()) return 0;
  CsvStream::Chunk chunk = stream->pending.get();
  if (chunk.bad) return -2;
  stream->pos = chunk.next_pos;
  if (chunk.rows > 0) {
    memcpy(out, chunk.data.data(),
           sizeof(float) * static_cast<size_t>(stream->ncols) *
               static_cast<size_t>(stream->chunk_rows));
    if (stream->pos < stream->mf.size) stream->start_prefetch();
  }
  return chunk.rows;
}

void wdb_csv_stream_close(void *handle) {
  auto *stream = static_cast<CsvStream *>(handle);
  if (!stream) return;
  if (stream->pending.valid()) stream->pending.wait();
  delete stream;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Arrow C Data Interface export (capability of arrow_utils.cpp:37-94).
// Struct layouts follow the published Apache Arrow C ABI specification.
// ---------------------------------------------------------------------------

struct WdbArrowSchema {
  const char *format;
  const char *name;
  const char *metadata;
  int64_t flags;
  int64_t n_children;
  WdbArrowSchema **children;
  WdbArrowSchema *dictionary;
  void (*release)(WdbArrowSchema *);
  void *private_data;
};

struct WdbArrowArray {
  int64_t length;
  int64_t null_count;
  int64_t offset;
  int64_t n_buffers;
  int64_t n_children;
  const void **buffers;
  WdbArrowArray **children;
  WdbArrowArray *dictionary;
  void (*release)(WdbArrowArray *);
  void *private_data;
};

struct BufferOwner {
  void *data = nullptr;
  size_t size = 0;
  bool shared = false;
  int fd = -1;
  char shm_name[64] = {0};
};

void wdb_release_array(WdbArrowArray *array) {
  if (!array || !array->private_data) return;
  auto *owner = static_cast<BufferOwner *>(array->private_data);
  if (owner->shared) {
    if (owner->data) munmap(owner->data, owner->size);
    if (owner->fd >= 0) {
      ::close(owner->fd);
      shm_unlink(owner->shm_name);
    }
  } else {
    free(owner->data);
  }
  delete owner;
  free(array->buffers);
  array->private_data = nullptr;
  array->release = nullptr;
}

void wdb_release_schema(WdbArrowSchema *schema) {
  if (schema) schema->release = nullptr;
}

// Fill caller-allocated ArrowArray/ArrowSchema structs with a float32
// result buffer (heap or POSIX shm "/warpdb_result").  Returns 0 on
// success, negative errno-style codes on failure.
int wdb_export_arrow(const float *data, long long length, int use_shm,
                     void *out_array_v, void *out_schema_v) {
  if (!data || length < 0 || !out_array_v || !out_schema_v) return -1;
  auto *out_array = static_cast<WdbArrowArray *>(out_array_v);
  auto *out_schema = static_cast<WdbArrowSchema *>(out_schema_v);

  auto *owner = new BufferOwner();
  owner->size = sizeof(float) * static_cast<size_t>(length);
  if (owner->size == 0) owner->size = sizeof(float);
  owner->shared = use_shm != 0;

  if (owner->shared) {
    snprintf(owner->shm_name, sizeof(owner->shm_name), "/warpdb_result");
    owner->fd = shm_open(owner->shm_name, O_CREAT | O_RDWR, 0600);
    if (owner->fd < 0) {
      delete owner;
      return -2;
    }
    if (ftruncate(owner->fd, static_cast<off_t>(owner->size)) != 0) {
      ::close(owner->fd);
      delete owner;
      return -3;
    }
    owner->data = mmap(nullptr, owner->size, PROT_READ | PROT_WRITE,
                       MAP_SHARED, owner->fd, 0);
    if (owner->data == MAP_FAILED) {
      ::close(owner->fd);
      delete owner;
      return -4;
    }
  } else {
    owner->data = malloc(owner->size);
    if (!owner->data) {
      delete owner;
      return -5;
    }
  }
  memcpy(owner->data, data, sizeof(float) * static_cast<size_t>(length));

  out_array->length = length;
  out_array->null_count = 0;
  out_array->offset = 0;
  out_array->n_buffers = 2;
  out_array->n_children = 0;
  auto **bufs = static_cast<const void **>(malloc(2 * sizeof(void *)));
  bufs[0] = nullptr;  // no validity bitmap
  bufs[1] = owner->data;
  out_array->buffers = bufs;
  out_array->children = nullptr;
  out_array->dictionary = nullptr;
  out_array->release = wdb_release_array;
  out_array->private_data = owner;

  out_schema->format = "f";  // float32
  out_schema->name = "result";
  out_schema->metadata = nullptr;
  out_schema->flags = 2;  // ARROW_FLAG_NULLABLE
  out_schema->n_children = 0;
  out_schema->children = nullptr;
  out_schema->dictionary = nullptr;
  out_schema->release = wdb_release_schema;
  out_schema->private_data = nullptr;
  return 0;
}

}  // extern "C"
