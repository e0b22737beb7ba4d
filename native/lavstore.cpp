// lavstore — memory-mapped episode pack store for lav_tpu.
//
// Native replacement for the reference's LMDB dependency
// (/root/reference/lav/utils/datasets/basic_dataset.py:47-51): the released
// LAV dataset stores each trajectory as an LMDB environment of key->blob
// pairs.  lavstore defines a simpler, faster format for the same access
// pattern (write-once episodes, read-mostly random access by key):
//
//   .lavpack layout:
//     [8]  magic "LAVPACK1"
//     [8]  u64 n_entries
//     index: n_entries * { u32 key_len, key bytes, u64 offset, u64 size }
//     blob region (8-byte aligned)
//
// Reads are zero-copy: the file is mmap'd once and get() returns a pointer
// into the mapping.  A sorted index gives O(log n) lookup.  The writer is
// append-then-finalize (single pass).
//
// C ABI (consumed from Python via ctypes — no pybind11 in this image):
//   void*  lavstore_open(const char* path)
//   int    lavstore_get(void* h, const char* key, const void** data,
//                       uint64_t* size)       -> 0 ok, -1 missing
//   uint64_t lavstore_count(void* h)
//   int    lavstore_key_at(void* h, uint64_t i, const char** key)
//   void   lavstore_close(void* h)
//   void*  lavwriter_open(const char* path)
//   int    lavwriter_put(void* h, const char* key, const void* data,
//                        uint64_t size)
//   int    lavwriter_finish(void* h)

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

constexpr char kMagic[8] = {'L', 'A', 'V', 'P', 'A', 'C', 'K', '1'};

struct Entry {
  std::string key;
  uint64_t offset;
  uint64_t size;
};

struct Store {
  int fd = -1;
  const uint8_t* base = nullptr;
  size_t length = 0;
  std::vector<Entry> index;  // sorted by key
};

struct Writer {
  std::string path;
  FILE* blob_tmp = nullptr;
  std::string blob_tmp_path;
  std::vector<Entry> index;
  uint64_t cursor = 0;
};

uint64_t align8(uint64_t x) { return (x + 7) & ~uint64_t(7); }

}  // namespace

extern "C" {

void* lavstore_open(const char* path) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0) { ::close(fd); return nullptr; }
  void* base = mmap(nullptr, st.st_size, PROT_READ, MAP_SHARED, fd, 0);
  if (base == MAP_FAILED) { ::close(fd); return nullptr; }

  auto* s = new Store();
  s->fd = fd;
  s->base = static_cast<const uint8_t*>(base);
  s->length = st.st_size;

  const uint8_t* p = s->base;
  if (s->length < 16 || memcmp(p, kMagic, 8) != 0) {
    munmap(base, st.st_size); ::close(fd); delete s; return nullptr;
  }
  uint64_t n;
  memcpy(&n, p + 8, 8);
  p += 16;
  s->index.reserve(n);
  for (uint64_t i = 0; i < n; ++i) {
    uint32_t klen;
    memcpy(&klen, p, 4); p += 4;
    Entry e;
    e.key.assign(reinterpret_cast<const char*>(p), klen); p += klen;
    memcpy(&e.offset, p, 8); p += 8;
    memcpy(&e.size, p, 8); p += 8;
    s->index.push_back(std::move(e));
  }
  std::sort(s->index.begin(), s->index.end(),
            [](const Entry& a, const Entry& b) { return a.key < b.key; });
  return s;
}

int lavstore_get(void* h, const char* key, const void** data,
                 uint64_t* size) {
  auto* s = static_cast<Store*>(h);
  std::string k(key);
  auto it = std::lower_bound(
      s->index.begin(), s->index.end(), k,
      [](const Entry& e, const std::string& kk) { return e.key < kk; });
  if (it == s->index.end() || it->key != k) return -1;
  *data = s->base + it->offset;
  *size = it->size;
  return 0;
}

uint64_t lavstore_count(void* h) {
  return static_cast<Store*>(h)->index.size();
}

int lavstore_key_at(void* h, uint64_t i, const char** key) {
  auto* s = static_cast<Store*>(h);
  if (i >= s->index.size()) return -1;
  *key = s->index[i].key.c_str();
  return 0;
}

void lavstore_close(void* h) {
  auto* s = static_cast<Store*>(h);
  if (s->base) munmap(const_cast<uint8_t*>(s->base), s->length);
  if (s->fd >= 0) ::close(s->fd);
  delete s;
}

void* lavwriter_open(const char* path) {
  auto* w = new Writer();
  w->path = path;
  w->blob_tmp_path = std::string(path) + ".blobs.tmp";
  w->blob_tmp = fopen(w->blob_tmp_path.c_str(), "wb");
  if (!w->blob_tmp) { delete w; return nullptr; }
  return w;
}

int lavwriter_put(void* h, const char* key, const void* data, uint64_t size) {
  auto* w = static_cast<Writer*>(h);
  uint64_t aligned = align8(w->cursor);
  for (uint64_t pad = w->cursor; pad < aligned; ++pad) fputc(0, w->blob_tmp);
  w->cursor = aligned;
  if (fwrite(data, 1, size, w->blob_tmp) != size) return -1;
  w->index.push_back(Entry{key, aligned, size});
  w->cursor += size;
  return 0;
}

int lavwriter_finish(void* h) {
  auto* w = static_cast<Writer*>(h);
  fclose(w->blob_tmp);

  // compute header size so blob offsets can be made absolute
  uint64_t header = 16;
  for (const auto& e : w->index) header += 4 + e.key.size() + 16;
  uint64_t blob_base = align8(header);

  FILE* out = fopen(w->path.c_str(), "wb");
  if (!out) return -1;
  fwrite(kMagic, 1, 8, out);
  uint64_t n = w->index.size();
  fwrite(&n, 8, 1, out);
  for (const auto& e : w->index) {
    uint32_t klen = e.key.size();
    fwrite(&klen, 4, 1, out);
    fwrite(e.key.data(), 1, klen, out);
    uint64_t off = blob_base + e.offset;
    fwrite(&off, 8, 1, out);
    fwrite(&e.size, 8, 1, out);
  }
  for (uint64_t pad = header; pad < blob_base; ++pad) fputc(0, out);

  FILE* blobs = fopen(w->blob_tmp_path.c_str(), "rb");
  if (!blobs) { fclose(out); return -1; }
  char buf[1 << 16];
  size_t got;
  while ((got = fread(buf, 1, sizeof(buf), blobs)) > 0)
    fwrite(buf, 1, got, out);
  fclose(blobs);
  fclose(out);
  remove(w->blob_tmp_path.c_str());
  delete w;
  return 0;
}

}  // extern "C"
