// nwio — native IO engine for the fvec/ivec vector formats.
//
// TPU-native counterpart of the reference's native data path: where the
// reference leans on cuDF + dlpack to move columnar data onto the GPU
// (reference: neighborhoodwatch/cu_knn.py:206-211), this library owns the
// host side of the TPU pipeline — bulk header-stripped reads, interleaved
// writes, and a background-threaded streaming reader that double-buffers
// disk IO against device compute (the host half of the HBM tile pipeline).
//
// File layout (little-endian), identical to the reference codec
// (reference: neighborhoodwatch/parquet_to_format.py:71-89):
//     per vector: int32 dim | dim * 4-byte payload (f32 for fvec, i32 for ivec)
//
// Exposed as a plain C ABI consumed through ctypes (no pybind11 in the
// image); all functions return 0 / row-counts on success, negative on error.

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <new>
#include <string>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

constexpr int64_t kChunkRows = 8192;  // per-thread scratch granularity

struct FileInfo {
  int64_t n_rows;
  int32_t dim;
  int64_t row_bytes;  // 4 * (dim + 1)
};

int probe_file(const char* path, FileInfo* info) {
  struct stat st;
  if (::stat(path, &st) != 0) return -1;
  if (st.st_size == 0) {
    info->n_rows = 0;
    info->dim = 0;
    info->row_bytes = 0;
    return 0;
  }
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return -1;
  int32_t dim = 0;
  ssize_t got = ::pread(fd, &dim, 4, 0);
  ::close(fd);
  if (got != 4 || dim <= 0) return -2;
  int64_t row_bytes = 4LL * (dim + 1);
  if (st.st_size % row_bytes != 0) return -3;  // heterogeneous dims
  info->n_rows = st.st_size / row_bytes;
  info->dim = dim;
  info->row_bytes = row_bytes;
  return 0;
}

// Read rows [row_start, row_start + n_rows) of an open fd, stripping the
// per-row dim headers into the dense payload buffer `out`. Returns rows
// read, or a negative error (-4: short read, -5: header mismatch).
int64_t read_span(int fd, const FileInfo& fi, int64_t row_start,
                  int64_t n_rows, char* out) {
  std::vector<char> scratch(
      static_cast<size_t>(std::min(n_rows, kChunkRows) * fi.row_bytes));
  const int64_t payload = 4LL * fi.dim;
  int64_t done = 0;
  while (done < n_rows) {
    int64_t take = std::min(kChunkRows, n_rows - done);
    int64_t off = (row_start + done) * fi.row_bytes;
    int64_t want = take * fi.row_bytes;
    int64_t got = 0;
    while (got < want) {
      ssize_t r = ::pread(fd, scratch.data() + got, want - got, off + got);
      if (r <= 0) return -4;
      got += r;
    }
    for (int64_t i = 0; i < take; ++i) {
      const char* row = scratch.data() + i * fi.row_bytes;
      int32_t dim;
      std::memcpy(&dim, row, 4);
      if (dim != fi.dim) return -5;
      std::memcpy(out + (done + i) * payload, row + 4, payload);
    }
    done += take;
  }
  return done;
}

}  // namespace

extern "C" {

// n_out <- row count, dim_out <- per-row dimension. 0 on success.
int nwio_fvec_probe(const char* path, int64_t* n_out, int32_t* dim_out) {
  FileInfo fi;
  int rc = probe_file(path, &fi);
  if (rc != 0) return rc;
  *n_out = fi.n_rows;
  *dim_out = fi.dim;
  return 0;
}

// Bulk read rows [row_start, row_start + n_rows) into `out`
// (n_rows * expected_dim * 4 bytes, dense, no headers). Multithreaded
// across row spans. Returns rows read or negative error. expected_dim
// is the caller's buffer width and MUST match the file: the function
// re-probes the file itself, so without the check a file regenerated
// with a wider dim between the caller's probe() and this read would
// write past the caller's buffer (heap corruption), and a narrower one
// would silently return uninitialized tail columns. -7 on mismatch.
int64_t nwio_fvec_read_rows(const char* path, int64_t row_start,
                            int64_t n_rows, void* out, int n_threads,
                            int32_t expected_dim) {
  FileInfo fi;
  int rc = probe_file(path, &fi);
  if (rc != 0) return rc;
  if (fi.dim != expected_dim) return -7;
  if (row_start < 0 || row_start + n_rows > fi.n_rows) return -6;
  if (n_rows == 0) return 0;
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return -1;

  if (n_threads < 1) n_threads = 1;
  int64_t span = (n_rows + n_threads - 1) / n_threads;
  std::vector<std::thread> workers;
  std::vector<int64_t> results(static_cast<size_t>(n_threads), 0);
  for (int t = 0; t < n_threads; ++t) {
    int64_t lo = t * span;
    if (lo >= n_rows) break;
    int64_t take = std::min(span, n_rows - lo);
    workers.emplace_back([&, t, lo, take] {
      results[static_cast<size_t>(t)] =
          read_span(fd, fi, row_start + lo,
                    take, static_cast<char*>(out) + lo * 4LL * fi.dim);
    });
  }
  for (auto& w : workers) w.join();
  ::close(fd);
  int64_t total = 0;
  for (int64_t r : results) {
    if (r < 0) return r;
    total += r;
  }
  return total;
}

// Write (or append) n dense rows of `dim` 4-byte words, interleaving the
// per-row int32 dim headers. Returns rows written or negative error.
int64_t nwio_fvec_write_rows(const char* path, int append, const void* data,
                             int64_t n, int32_t dim) {
  FILE* f = std::fopen(path, append ? "ab" : "wb");
  if (!f) return -1;
  const int64_t payload = 4LL * dim;
  const int64_t row_bytes = payload + 4;
  std::vector<char> buf(
      static_cast<size_t>(std::min(n > 0 ? n : 1, kChunkRows) * row_bytes));
  int64_t done = 0;
  while (done < n) {
    int64_t take = std::min(kChunkRows, n - done);
    for (int64_t i = 0; i < take; ++i) {
      char* row = buf.data() + i * row_bytes;
      std::memcpy(row, &dim, 4);
      std::memcpy(row + 4,
                  static_cast<const char*>(data) + (done + i) * payload,
                  payload);
    }
    if (std::fwrite(buf.data(), 1, take * row_bytes, f) !=
        static_cast<size_t>(take * row_bytes)) {
      std::fclose(f);
      return -4;
    }
    done += take;
  }
  if (std::fclose(f) != 0) return -4;
  return done;
}

// ---------------------------------------------------------------------------
// Streaming reader: a producer thread reads batches ahead of the consumer
// (double-buffered), so disk latency hides behind device compute.
// ---------------------------------------------------------------------------

struct NwioStream {
  std::string path;
  FileInfo fi;
  int fd = -1;
  int64_t batch_rows = 0;
  int64_t next_row = 0;    // producer cursor
  int n_threads = 1;

  // two slots: producer fills, consumer drains
  std::vector<char> buf[2];
  int64_t rows_in[2] = {0, 0};
  int64_t err = 0;
  bool ready[2] = {false, false};
  bool eof_produced = false;
  int prod_slot = 0;
  int cons_slot = 0;

  std::mutex mu;
  std::condition_variable cv;
  std::thread producer;
  std::atomic<bool> stop{false};

  void produce() {
    for (;;) {
      int64_t start, take;
      int slot;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv.wait(lk, [&] { return stop.load() || !ready[prod_slot]; });
        if (stop.load()) return;
        slot = prod_slot;
        start = next_row;
        take = std::min(batch_rows, fi.n_rows - start);
        if (take <= 0) {
          eof_produced = true;
          cv.notify_all();
          return;
        }
        next_row += take;
        prod_slot ^= 1;
      }
      // parallel span read into the owned slot (same pread-based worker
      // split as nwio_fvec_read_rows — r3 review: n_threads was stored
      // but produce() always read single-threaded). Small batches skip
      // the thread-spawn overhead.
      int64_t got = 0;
      if (n_threads <= 1 || take < 8192) {
        got = read_span(fd, fi, start, take, buf[slot].data());
      } else {
        int64_t span = (take + n_threads - 1) / n_threads;
        std::vector<std::thread> workers;
        std::vector<int64_t> results(static_cast<size_t>(n_threads), 0);
        for (int t = 0; t < n_threads; ++t) {
          int64_t lo = t * span;
          if (lo >= take) break;
          int64_t sub = std::min(span, take - lo);
          workers.emplace_back([&, t, lo, sub] {
            results[static_cast<size_t>(t)] =
                read_span(fd, fi, start + lo, sub,
                          buf[slot].data() + lo * 4LL * fi.dim);
          });
        }
        for (auto& w : workers) w.join();
        for (int64_t r : results) {
          if (r < 0) { got = r; break; }
          got += r;
        }
      }
      {
        std::unique_lock<std::mutex> lk(mu);
        if (got < 0) err = got;
        rows_in[slot] = got < 0 ? 0 : got;
        ready[slot] = true;
        cv.notify_all();
      }
    }
  }
};

void* nwio_stream_open(const char* path, int64_t batch_rows, int n_threads,
                       int32_t expected_dim) {
  auto* s = new (std::nothrow) NwioStream;
  if (!s) return nullptr;
  if (probe_file(path, &s->fi) != 0 || s->fi.n_rows == 0) {
    delete s;
    return nullptr;
  }
  // expected_dim rides the ABI like nwio_fvec_read_rows' -7 check: the
  // Python consumer sizes its copy buffers from an EARLIER probe, so a
  // file regenerated at a different width between the two probes would
  // memcpy wider rows into a narrower numpy buffer (heap corruption) or
  // silently misparse narrower ones (r3 review).
  if (s->fi.dim != expected_dim) {
    delete s;
    return nullptr;
  }
  s->fd = ::open(path, O_RDONLY);
  if (s->fd < 0) {
    delete s;
    return nullptr;
  }
  s->path = path;
  s->batch_rows = batch_rows;
  s->n_threads = n_threads < 1 ? 1 : n_threads;
  size_t cap = static_cast<size_t>(batch_rows * 4LL * s->fi.dim);
  s->buf[0].resize(cap);
  s->buf[1].resize(cap);
  s->producer = std::thread([s] { s->produce(); });
  return s;
}

// Copies the next batch into `out` (capacity batch_rows * dim * 4 bytes).
// Returns rows copied, 0 at EOF, negative on error.
int64_t nwio_stream_next(void* handle, void* out) {
  auto* s = static_cast<NwioStream*>(handle);
  int slot;
  int64_t rows;
  {
    std::unique_lock<std::mutex> lk(s->mu);
    s->cv.wait(lk, [&] {
      return s->err != 0 || s->ready[s->cons_slot] ||
             (s->eof_produced && !s->ready[s->cons_slot]);
    });
    if (s->err != 0) return s->err;
    if (!s->ready[s->cons_slot]) return 0;  // EOF
    slot = s->cons_slot;
    rows = s->rows_in[slot];
  }
  std::memcpy(out, s->buf[slot].data(),
              static_cast<size_t>(rows * 4LL * s->fi.dim));
  {
    std::unique_lock<std::mutex> lk(s->mu);
    s->ready[slot] = false;
    s->cons_slot ^= 1;
    s->cv.notify_all();
  }
  return rows;
}

void nwio_stream_close(void* handle) {
  auto* s = static_cast<NwioStream*>(handle);
  {
    std::unique_lock<std::mutex> lk(s->mu);
    s->stop.store(true);
    s->cv.notify_all();
  }
  if (s->producer.joinable()) s->producer.join();
  if (s->fd >= 0) ::close(s->fd);
  delete s;
}

}  // extern "C"
