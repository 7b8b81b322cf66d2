// Native host-runtime core: paged KV block allocator with chained-hash
// prefix caching and PEARL rollback.
//
// C++ counterpart of nano_pearl_tpu/engine/block_manager.py (behavioral
// parity enforced by tests/test_native.py). The reference engine keeps
// this state in Python replicated across worker processes
// (reference: nano_pearl/pearl_engine/block_manager.py); here it is a
// single native core behind a C ABI (ctypes), used by the host
// scheduler on the request-admission path where a production server
// handles thousands of sequences per second.
//
// Build: see native/build.sh (g++ -O2 -shared -fPIC).

#include <cstdint>
#include <cstring>
#include <deque>
#include <unordered_map>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// xxHash64 (public-domain algorithm, implemented from the spec) — must
// produce the same digests as python-xxhash so native and Python block
// managers can share prefix-cache semantics.
// ---------------------------------------------------------------------------
constexpr uint64_t P1 = 11400714785074694791ULL;
constexpr uint64_t P2 = 14029467366897019727ULL;
constexpr uint64_t P3 = 1609587929392839161ULL;
constexpr uint64_t P4 = 9650029242287828579ULL;
constexpr uint64_t P5 = 2870177450012600261ULL;

static inline uint64_t rotl(uint64_t x, int r) { return (x << r) | (x >> (64 - r)); }

static inline uint64_t round1(uint64_t acc, uint64_t input) {
  acc += input * P2;
  acc = rotl(acc, 31);
  acc *= P1;
  return acc;
}

static inline uint64_t merge_round(uint64_t acc, uint64_t val) {
  val = round1(0, val);
  acc ^= val;
  acc = acc * P1 + P4;
  return acc;
}

static uint64_t xxh64(const uint8_t* p, size_t len, uint64_t seed) {
  const uint8_t* end = p + len;
  uint64_t h;
  if (len >= 32) {
    uint64_t v1 = seed + P1 + P2, v2 = seed + P2, v3 = seed, v4 = seed - P1;
    const uint8_t* limit = end - 32;
    do {
      uint64_t w;
      std::memcpy(&w, p, 8); v1 = round1(v1, w); p += 8;
      std::memcpy(&w, p, 8); v2 = round1(v2, w); p += 8;
      std::memcpy(&w, p, 8); v3 = round1(v3, w); p += 8;
      std::memcpy(&w, p, 8); v4 = round1(v4, w); p += 8;
    } while (p <= limit);
    h = rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18);
    h = merge_round(h, v1);
    h = merge_round(h, v2);
    h = merge_round(h, v3);
    h = merge_round(h, v4);
  } else {
    h = seed + P5;
  }
  h += (uint64_t)len;
  while (p + 8 <= end) {
    uint64_t w;
    std::memcpy(&w, p, 8);
    h ^= round1(0, w);
    h = rotl(h, 27) * P1 + P4;
    p += 8;
  }
  if (p + 4 <= end) {
    uint32_t w;
    std::memcpy(&w, p, 4);
    h ^= (uint64_t)w * P1;
    h = rotl(h, 23) * P2 + P3;
    p += 4;
  }
  while (p < end) {
    h ^= (*p) * P5;
    h = rotl(h, 11) * P1;
    ++p;
  }
  h ^= h >> 33;
  h *= P2;
  h ^= h >> 29;
  h *= P3;
  h ^= h >> 32;
  return h;
}

// chain hash matching engine/block_manager.py::chain_hash: optional
// little-endian prefix digest bytes, then int64-le token bytes.
static uint64_t chain_hash(const int64_t* tokens, int n, uint64_t prefix,
                           bool has_prefix) {
  std::vector<uint8_t> buf;
  buf.reserve((has_prefix ? 8 : 0) + 8 * (size_t)n);
  if (has_prefix) {
    for (int i = 0; i < 8; ++i) buf.push_back((prefix >> (8 * i)) & 0xff);
  }
  for (int i = 0; i < n; ++i) {
    uint64_t t = (uint64_t)tokens[i];
    for (int b = 0; b < 8; ++b) buf.push_back((t >> (8 * b)) & 0xff);
  }
  return xxh64(buf.data(), buf.size(), 0);
}

struct Block {
  int ref_count = 0;
  bool has_hash = false;
  uint64_t hash = 0;
  std::vector<int64_t> tokens;
};

struct BlockManager {
  int num_blocks;
  int block_size;
  std::vector<Block> blocks;
  std::unordered_map<uint64_t, int> hash_to_block;
  std::deque<int> free_ids;

  explicit BlockManager(int nb, int bs) : num_blocks(nb), block_size(bs), blocks(nb) {
    for (int i = 0; i < nb; ++i) free_ids.push_back(i);
  }

  int take(int id) {
    Block& b = blocks[id];
    b.ref_count = 1;
    b.has_hash = false;
    b.tokens.clear();
    for (auto it = free_ids.begin(); it != free_ids.end(); ++it) {
      if (*it == id) { free_ids.erase(it); break; }
    }
    return id;
  }

  void release(int id) {
    Block& b = blocks[id];
    if (--b.ref_count == 0) free_ids.push_back(id);
  }
};

}  // namespace

extern "C" {

void* bm_create(int num_blocks, int block_size) {
  return new BlockManager(num_blocks, block_size);
}

void bm_destroy(void* h) { delete static_cast<BlockManager*>(h); }

int bm_num_free(void* h) {
  return (int)static_cast<BlockManager*>(h)->free_ids.size();
}

uint64_t bm_chain_hash(const int64_t* tokens, int n, uint64_t prefix, int has_prefix) {
  return chain_hash(tokens, n, prefix, has_prefix != 0);
}

// Allocate a fresh table for `n_tokens` prompt tokens. Writes block ids
// into out_table (capacity ceil(n/bs)); returns num_cached_tokens, or
// -1 when the pool cannot hold the sequence.
int bm_allocate(void* h, const int64_t* tokens, int n_tokens, int* out_table) {
  auto* bm = static_cast<BlockManager*>(h);
  const int bs = bm->block_size;
  const int nb = (n_tokens + bs - 1) / bs;
  if ((int)bm->free_ids.size() < nb) return -1;

  int num_cached = 0;
  bool miss = false;
  uint64_t prev = 0;
  bool has_prev = false;
  for (int i = 0; i < nb; ++i) {
    const int64_t* blk_tokens = tokens + (size_t)i * bs;
    const int blk_n = (i == nb - 1) ? n_tokens - i * bs : bs;
    const bool full = blk_n == bs;
    uint64_t hcur = 0;
    bool has_h = false;
    if (full) {
      hcur = chain_hash(blk_tokens, blk_n, prev, has_prev);
      has_h = true;
    }
    int cached = -1;
    if (has_h) {
      auto it = bm->hash_to_block.find(hcur);
      if (it != bm->hash_to_block.end()) cached = it->second;
    }
    bool content_match = false;
    if (cached >= 0) {
      const Block& cb = bm->blocks[cached];
      content_match = (int)cb.tokens.size() == blk_n &&
                      std::memcmp(cb.tokens.data(), blk_tokens, blk_n * 8) == 0;
    }
    if (cached < 0 || !content_match) miss = true;

    int id;
    if (miss) {
      id = bm->take(bm->free_ids.front());
    } else {
      num_cached += bs;
      id = cached;
      if (bm->blocks[id].ref_count > 0) {
        bm->blocks[id].ref_count++;
      } else {
        bm->take(id);
      }
    }
    if (has_h) {
      Block& b = bm->blocks[id];
      b.has_hash = true;
      b.hash = hcur;
      b.tokens.assign(blk_tokens, blk_tokens + blk_n);
      bm->hash_to_block[hcur] = id;
    }
    out_table[i] = id;
    prev = hcur;
    has_prev = has_h;
  }
  if (num_cached == n_tokens) num_cached -= bs;  // keep one query row
  return num_cached;
}

void bm_deallocate(void* h, const int* table, int n) {
  auto* bm = static_cast<BlockManager*>(h);
  for (int i = n - 1; i >= 0; --i) bm->release(table[i]);
}

// Truncate from old_num_blocks to the block count of new_len tokens;
// returns the new table length.
int bm_rollback(void* h, const int* table, int old_num_blocks, int new_len) {
  auto* bm = static_cast<BlockManager*>(h);
  const int bs = bm->block_size;
  const int keep = (new_len + bs - 1) / bs;
  for (int i = keep; i < old_num_blocks; ++i) bm->release(table[i]);
  return keep;
}

// Grow table to cover cur_len+extra tokens, publishing hashes of blocks
// that became full. tokens = the full current stream (cur_len entries).
// Returns the new table length, or -1 if the pool is exhausted.
int bm_ensure(void* h, const int64_t* tokens, int cur_len, int extra,
              int* table, int table_len, int table_capacity) {
  auto* bm = static_cast<BlockManager*>(h);
  const int bs = bm->block_size;
  const int target = (cur_len + extra + bs - 1) / bs;
  if (target > table_capacity) return -1;
  const int need = target - table_len;
  if (need > (int)bm->free_ids.size()) return -1;

  // lazily publish hashes for full, unhashed blocks
  const int num_full = cur_len / bs;
  uint64_t prev = 0;
  bool has_prev = false;
  for (int i = 0; i < table_len && i < num_full; ++i) {
    Block& b = bm->blocks[table[i]];
    if (!b.has_hash) {
      uint64_t hcur = chain_hash(tokens + (size_t)i * bs, bs,
                                 has_prev ? prev : 0,
                                 i > 0);
      b.has_hash = true;
      b.hash = hcur;
      b.tokens.assign(tokens + (size_t)i * bs, tokens + (size_t)(i + 1) * bs);
      bm->hash_to_block[hcur] = table[i];
    }
    prev = b.hash;
    has_prev = true;
  }
  int len = table_len;
  while (len < target) table[len++] = bm->take(bm->free_ids.front());
  return len;
}

void bm_clear_prefix_cache(void* h) {
  auto* bm = static_cast<BlockManager*>(h);
  bm->hash_to_block.clear();
  for (auto& b : bm->blocks) {
    b.has_hash = false;
    b.tokens.clear();
  }
}

}  // extern "C"
