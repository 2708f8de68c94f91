// Native dataset IO: memory-mapped big-ANN binary files.
//
// Reference counterpart: the cuvs_bench memmapped dataset machinery
// (/root/reference/cpp/bench/ann/src/common/{blob.hpp,dataset.hpp}) and the
// util file descriptors (/root/reference/cpp/include/cuvs/util/file_io.hpp).
// Formats: .fbin/.ibin/.u8bin "big-ann-benchmarks" layout —
//   [int32 n_rows][int32 dim][n_rows * dim * sizeof(T) payload].
//
// Exposed as a plain C ABI consumed via ctypes (cuvs_tpu/io/native.py).
// The reader mmaps with MADV_SEQUENTIAL/WILLNEED and supports threaded
// strided batch copies into a caller buffer, so multi-GB datasets stream
// into host RAM at disk bandwidth without Python overhead.

#include <atomic>
#include <cerrno>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <thread>
#include <unistd.h>
#include <vector>

extern "C" {

struct MappedFile {
  void* base = nullptr;
  size_t bytes = 0;
  int fd = -1;
  int32_t n_rows = 0;
  int32_t dim = 0;
  int32_t elem_size = 0;
};

// Open + mmap a big-ann .bin file. elem_size: 4 (f32/i32) or 1 (u8/i8).
// Returns an opaque handle or null on error (errno preserved).
MappedFile* cuvs_tpu_open_bin(const char* path, int32_t elem_size) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0 || st.st_size < 8) {
    ::close(fd);
    errno = EINVAL;
    return nullptr;
  }
  void* base = ::mmap(nullptr, st.st_size, PROT_READ, MAP_SHARED, fd, 0);
  if (base == MAP_FAILED) {
    ::close(fd);
    return nullptr;
  }
  ::madvise(base, st.st_size, MADV_SEQUENTIAL);
  auto* h = new MappedFile;
  h->base = base;
  h->bytes = st.st_size;
  h->fd = fd;
  std::memcpy(&h->n_rows, base, 4);
  std::memcpy(&h->dim, static_cast<char*>(base) + 4, 4);
  h->elem_size = elem_size;
  const size_t want = 8 + size_t(h->n_rows) * h->dim * elem_size;
  if (h->n_rows < 0 || h->dim <= 0 || want > h->bytes) {
    ::munmap(base, st.st_size);
    ::close(fd);
    delete h;
    errno = EINVAL;
    return nullptr;
  }
  return h;
}

int32_t cuvs_tpu_bin_rows(MappedFile* h) { return h ? h->n_rows : -1; }
int32_t cuvs_tpu_bin_dim(MappedFile* h) { return h ? h->dim : -1; }
const void* cuvs_tpu_bin_data(MappedFile* h) {
  return h ? static_cast<const char*>(h->base) + 8 : nullptr;
}

void cuvs_tpu_close_bin(MappedFile* h) {
  if (!h) return;
  if (h->base) ::munmap(h->base, h->bytes);
  if (h->fd >= 0) ::close(h->fd);
  delete h;
}

// Threaded copy of rows [row_start, row_start+n_copy) into out.
// Returns 0 on success.
int cuvs_tpu_read_rows(MappedFile* h, int64_t row_start, int64_t n_copy,
                       void* out, int n_threads) {
  if (!h || row_start < 0 || row_start + n_copy > h->n_rows) return -1;
  const size_t row_bytes = size_t(h->dim) * h->elem_size;
  const char* src = static_cast<const char*>(h->base) + 8 + row_start * row_bytes;
  char* dst = static_cast<char*>(out);
  const size_t total = size_t(n_copy) * row_bytes;
  ::madvise(const_cast<char*>(src), total, MADV_WILLNEED);
  if (n_threads <= 1 || total < (8u << 20)) {
    std::memcpy(dst, src, total);
    return 0;
  }
  std::vector<std::thread> ts;
  const size_t chunk = (total + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    const size_t lo = t * chunk;
    if (lo >= total) break;
    const size_t len = std::min(chunk, total - lo);
    ts.emplace_back([=] { std::memcpy(dst + lo, src + lo, len); });
  }
  for (auto& t : ts) t.join();
  return 0;
}

// Write a big-ann .bin file in one shot.
int cuvs_tpu_write_bin(const char* path, const void* data, int32_t n_rows,
                       int32_t dim, int32_t elem_size) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return -1;
  int ok = std::fwrite(&n_rows, 4, 1, f) == 1 && std::fwrite(&dim, 4, 1, f) == 1;
  const size_t total = size_t(n_rows) * dim * elem_size;
  ok = ok && std::fwrite(data, 1, total, f) == total;
  std::fclose(f);
  return ok ? 0 : -1;
}

}  // extern "C"
