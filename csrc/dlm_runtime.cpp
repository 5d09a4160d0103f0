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
#include <algorithm>
#include <utility>

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

// ---------------------------------------------------------------------------
// BPE encoder (tokenizer hot loop; Python keeps pretokenization/IO)
// ---------------------------------------------------------------------------

struct BpeModel {
  // rank and merged id by packed pair key (a << 32 | b)
  std::vector<std::pair<uint64_t, uint32_t>> sorted_pairs;  // key -> rank
  uint32_t n_merges = 0;

  int64_t rank_of(uint32_t a, uint32_t b) const {
    uint64_t key = ((uint64_t)a << 32) | b;
    auto it = std::lower_bound(
        sorted_pairs.begin(), sorted_pairs.end(), key,
        [](const std::pair<uint64_t, uint32_t>& p, uint64_t k) {
          return p.first < k;
        });
    if (it == sorted_pairs.end() || it->first != key) return -1;
    return (int64_t)it->second;
  }
};

static const uint64_t kMaxBpe = 64;
static BpeModel* g_bpe[kMaxBpe] = {nullptr};
static std::mutex g_bpe_mu;

// merges given as arrays a[i], b[i]; merged token id = 256 + i.
int dlm_bpe_new(const uint32_t* a, const uint32_t* b, uint64_t n) {
  std::lock_guard<std::mutex> lock(g_bpe_mu);
  for (uint64_t h = 0; h < kMaxBpe; ++h) {
    if (g_bpe[h] == nullptr) {
      BpeModel* m = new BpeModel();
      m->n_merges = (uint32_t)n;
      m->sorted_pairs.reserve(n);
      for (uint64_t i = 0; i < n; ++i) {
        m->sorted_pairs.emplace_back(((uint64_t)a[i] << 32) | b[i],
                                     (uint32_t)i);
      }
      std::sort(m->sorted_pairs.begin(), m->sorted_pairs.end());
      g_bpe[h] = m;
      return (int)h;
    }
  }
  return -1;
}

// Greedy lowest-rank merge loop over one pretoken's bytes.
// Returns the number of output ids (<= len), or -1 on bad handle.
int64_t dlm_bpe_encode_word(int handle, const uint8_t* word, uint64_t len,
                            uint32_t* out) {
  if (handle < 0 || (uint64_t)handle >= kMaxBpe || !g_bpe[handle]) return -1;
  const BpeModel* m = g_bpe[handle];
  std::vector<uint32_t> ids(word, word + len);
  while (ids.size() >= 2) {
    int64_t best_rank = -1;
    size_t best_pos = 0;
    for (size_t i = 0; i + 1 < ids.size(); ++i) {
      int64_t r = m->rank_of(ids[i], ids[i + 1]);
      if (r >= 0 && (best_rank < 0 || r < best_rank)) {
        best_rank = r;
        best_pos = i;
      }
    }
    if (best_rank < 0) break;
    uint32_t pa = ids[best_pos], pb = ids[best_pos + 1];
    uint32_t merged = 256 + (uint32_t)best_rank;
    // merge every occurrence of this pair in one sweep
    std::vector<uint32_t> next;
    next.reserve(ids.size());
    for (size_t i = 0; i < ids.size();) {
      if (i + 1 < ids.size() && ids[i] == pa && ids[i + 1] == pb) {
        next.push_back(merged);
        i += 2;
      } else {
        next.push_back(ids[i]);
        i += 1;
      }
    }
    ids.swap(next);
  }
  for (size_t i = 0; i < ids.size(); ++i) out[i] = ids[i];
  return (int64_t)ids.size();
}

int dlm_bpe_free(int handle) {
  std::lock_guard<std::mutex> lock(g_bpe_mu);
  if (handle < 0 || (uint64_t)handle >= kMaxBpe || !g_bpe[handle]) return -1;
  delete g_bpe[handle];
  g_bpe[handle] = nullptr;
  return 0;
}

}  // extern "C"
