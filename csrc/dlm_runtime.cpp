// dlm_runtime: native host runtime for diffusion_llm_rs_tpu.
//
// TPU-native equivalent of the reference's host-side native surface
// (SURVEY.md §2.2): the SSD direct-IO writer (io-dedup/src/lib.rs:82-90,
// 168-177), the 64-byte-aligned block allocator (fusion-anns/src/lib.rs:120-168
// — which leaks by design there; this one frees), and the content-hash path of
// the dedup buffer (io-dedup/src/lib.rs:161-166, upgraded from a 31-multiplier
// fold to FNV-1a).
//
// Exposed as a plain C ABI consumed via ctypes (storage/native.py). Build:
//   g++ -O3 -shared -fPIC -o libdlm_runtime.so dlm_runtime.cpp
//
// Everything here is host/runtime work around jax.Array buffers; device compute
// stays in XLA/Pallas.

#include <cerrno>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <fcntl.h>
#include <mutex>
#include <sys/stat.h>
#include <sys/types.h>
#include <unistd.h>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Content hashing (dedup)
// ---------------------------------------------------------------------------

// 64-bit FNV-1a over a byte buffer.
uint64_t dlm_fnv1a64(const uint8_t* data, uint64_t len) {
  uint64_t h = 14695981039346656037ULL;  // FNV-1a 64-bit offset basis
  for (uint64_t i = 0; i < len; ++i) {
    h ^= (uint64_t)data[i];
    h *= 1099511628211ULL;
  }
  return h;
}

// Batched hashing: n buffers laid out contiguously with an offsets array
// (offsets has n+1 entries). Writes n hashes into out.
void dlm_fnv1a64_batch(const uint8_t* data, const uint64_t* offsets,
                       uint64_t n, uint64_t* out) {
  for (uint64_t i = 0; i < n; ++i) {
    out[i] = dlm_fnv1a64(data + offsets[i], offsets[i + 1] - offsets[i]);
  }
}

// ---------------------------------------------------------------------------
// Store file IO (sequential append + positional read + fsync)
// ---------------------------------------------------------------------------

// Open (create) a store file. direct_io requests O_DIRECT (best-effort: falls
// back to buffered IO when the filesystem refuses, mirroring the reference's
// fcntl-based toggle at io-dedup/src/lib.rs:84-89).
int dlm_open(const char* path, int direct_io) {
  int flags = O_RDWR | O_CREAT;
#ifdef O_DIRECT
  if (direct_io) flags |= O_DIRECT;
#endif
  int fd = open(path, flags, 0644);
#ifdef O_DIRECT
  if (fd < 0 && direct_io) {
    fd = open(path, O_RDWR | O_CREAT, 0644);
  }
#endif
  return fd;  // negative on error
}

int64_t dlm_append(int fd, const uint8_t* data, uint64_t len) {
  off_t end = lseek(fd, 0, SEEK_END);
  if (end < 0) return -1;
  uint64_t written = 0;
  while (written < len) {
    ssize_t w = write(fd, data + written, len - written);
    if (w < 0) {
      if (errno == EINTR) continue;
      return -1;
    }
    written += (uint64_t)w;
  }
  return (int64_t)end;  // offset the payload landed at
}

int64_t dlm_pread(int fd, uint8_t* buf, uint64_t len, uint64_t offset) {
  uint64_t got = 0;
  while (got < len) {
    ssize_t r = pread(fd, buf + got, len - got, (off_t)(offset + got));
    if (r < 0) {
      if (errno == EINTR) continue;
      return -1;
    }
    if (r == 0) break;  // EOF
    got += (uint64_t)r;
  }
  return (int64_t)got;
}

int dlm_fsync(int fd) { return fsync(fd); }

int dlm_close(int fd) { return close(fd); }

int64_t dlm_file_size(int fd) {
  struct stat st;
  if (fstat(fd, &st) != 0) return -1;
  return (int64_t)st.st_size;
}

// ---------------------------------------------------------------------------
// Aligned block allocator (fusion-anns GPUMemoryManager equivalent,
// fusion-anns/src/lib.rs:120-168; 64-byte aligned, fixed-size blocks, free
// list — but with working reclamation)
// ---------------------------------------------------------------------------

struct BlockPool {
  uint8_t* base = nullptr;
  uint64_t block_size = 0;
  uint64_t num_blocks = 0;
  std::vector<uint32_t> free_list;
  std::vector<uint8_t> in_use;
  std::mutex mu;
};

static const uint64_t kMaxPools = 64;
static BlockPool* g_pools[kMaxPools] = {nullptr};
static std::mutex g_pools_mu;

// Create a pool of num_blocks blocks of block_size bytes, 64-byte aligned.
// Returns a pool handle >= 0, or -1 on failure.
int dlm_pool_create(uint64_t num_blocks, uint64_t block_size) {
  std::lock_guard<std::mutex> lock(g_pools_mu);
  for (uint64_t i = 0; i < kMaxPools; ++i) {
    if (g_pools[i] == nullptr) {
      BlockPool* p = new BlockPool();
      uint64_t total = num_blocks * block_size;
      void* mem = nullptr;
      if (posix_memalign(&mem, 64, total) != 0) {
        delete p;
        return -1;
      }
      p->base = (uint8_t*)mem;
      p->block_size = block_size;
      p->num_blocks = num_blocks;
      p->in_use.assign(num_blocks, 0);
      p->free_list.reserve(num_blocks);
      for (uint64_t b = num_blocks; b > 0; --b)
        p->free_list.push_back((uint32_t)(b - 1));
      g_pools[i] = p;
      return (int)i;
    }
  }
  return -1;
}

// Allocate a block; returns block index >= 0 or -1 when exhausted
// (the reference errors with "No free memory blocks available",
// fusion-anns/src/lib.rs:157-159).
int64_t dlm_pool_alloc(int pool) {
  if (pool < 0 || (uint64_t)pool >= kMaxPools || !g_pools[pool]) return -1;
  BlockPool* p = g_pools[pool];
  std::lock_guard<std::mutex> lock(p->mu);
  if (p->free_list.empty()) return -1;
  uint32_t idx = p->free_list.back();
  p->free_list.pop_back();
  p->in_use[idx] = 1;
  return (int64_t)idx;
}

int dlm_pool_free(int pool, uint64_t block) {
  if (pool < 0 || (uint64_t)pool >= kMaxPools || !g_pools[pool]) return -1;
  BlockPool* p = g_pools[pool];
  std::lock_guard<std::mutex> lock(p->mu);
  if (block >= p->num_blocks || !p->in_use[block]) return -1;
  p->in_use[block] = 0;
  p->free_list.push_back((uint32_t)block);
  return 0;
}

uint8_t* dlm_pool_block_ptr(int pool, uint64_t block) {
  if (pool < 0 || (uint64_t)pool >= kMaxPools || !g_pools[pool]) return nullptr;
  BlockPool* p = g_pools[pool];
  if (block >= p->num_blocks) return nullptr;
  return p->base + block * p->block_size;
}

int64_t dlm_pool_num_free(int pool) {
  if (pool < 0 || (uint64_t)pool >= kMaxPools || !g_pools[pool]) return -1;
  BlockPool* p = g_pools[pool];
  std::lock_guard<std::mutex> lock(p->mu);
  return (int64_t)p->free_list.size();
}

int dlm_pool_destroy(int pool) {
  std::lock_guard<std::mutex> lock(g_pools_mu);
  if (pool < 0 || (uint64_t)pool >= kMaxPools || !g_pools[pool]) return -1;
  free(g_pools[pool]->base);
  delete g_pools[pool];
  g_pools[pool] = nullptr;
  return 0;
}

}  // extern "C"
