// Native engine core: paged-KV block manager with hash-chained prefix
// caching, plus the per-dispatch decode batch-meta builder.
//
// This is the TPU framework's native-runtime layer. The reference
// (ztxdcyy/nano-vllm-learn) keeps its runtime in Python and reaches native
// code only through dependencies (Triton/NCCL/flash-attn — SURVEY §2.4);
// here the allocator/prefix-cache hot path (reference
// nanovllm/engine/block_manager.py:8-159) is C++ behind a ctypes ABI, with
// the Python BlockManager kept as the behavioral reference implementation
// (tests assert step-for-step equivalence on randomized workloads).
//
// Design notes:
// - xxhash64 implemented from the public spec (chained page hashes must be
//   deterministic across processes/hosts for replicated multi-host
//   scheduling — same contract as the Python side).
// - O(1) free list: intrusive doubly-linked list over a block array, FIFO
//   order with targeted removal (the reference's deque.remove is O(n),
//   SURVEY §2.5).
// - Blocks keep their page hash + token ids when freed so a later
//   prefix-cache hit can re-activate them without any data copy (reference
//   block_manager.py:92-105 behavior).

#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

// ----------------------------------------------------------- xxhash64
// Implemented from the XXH64 specification (Yann Collet, public domain).
static const uint64_t P1 = 0x9E3779B185EBCA87ULL;
static const uint64_t P2 = 0xC2B2AE3D27D4EB4FULL;
static const uint64_t P3 = 0x165667B19E3779F9ULL;
static const uint64_t P4 = 0x85EBCA77C2B2AE63ULL;
static const uint64_t P5 = 0x27D4EB2F165667C5ULL;

static inline uint64_t rotl(uint64_t x, int r) {
  return (x << r) | (x >> (64 - r));
}
static inline uint64_t read64(const uint8_t* p) {
  uint64_t v;
  std::memcpy(&v, p, 8);
  return v;  // little-endian hosts only (x86/arm)
}
static inline uint32_t read32(const uint8_t* p) {
  uint32_t v;
  std::memcpy(&v, p, 4);
  return v;
}
static inline uint64_t xxh_round(uint64_t acc, uint64_t input) {
  acc += input * P2;
  acc = rotl(acc, 31);
  acc *= P1;
  return acc;
}
static inline uint64_t xxh_merge(uint64_t acc, uint64_t val) {
  acc ^= xxh_round(0, val);
  acc = acc * P1 + P4;
  return acc;
}

static uint64_t xxh64(const uint8_t* data, size_t len, uint64_t seed) {
  const uint8_t* p = data;
  const uint8_t* end = data + len;
  uint64_t h;
  if (len >= 32) {
    uint64_t v1 = seed + P1 + P2, v2 = seed + P2, v3 = seed, v4 = seed - P1;
    do {
      v1 = xxh_round(v1, read64(p)); p += 8;
      v2 = xxh_round(v2, read64(p)); p += 8;
      v3 = xxh_round(v3, read64(p)); p += 8;
      v4 = xxh_round(v4, read64(p)); p += 8;
    } while (p + 32 <= end);
    h = rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18);
    h = xxh_merge(h, v1);
    h = xxh_merge(h, v2);
    h = xxh_merge(h, v3);
    h = xxh_merge(h, v4);
  } else {
    h = seed + P5;
  }
  h += (uint64_t)len;
  while (p + 8 <= end) {
    h ^= xxh_round(0, read64(p));
    h = rotl(h, 27) * P1 + P4;
    p += 8;
  }
  if (p + 4 <= end) {
    h ^= (uint64_t)read32(p) * P1;
    h = rotl(h, 23) * P2 + P3;
    p += 4;
  }
  while (p < end) {
    h ^= (*p) * P5;
    h = rotl(h, 11) * P1;
    p++;
  }
  h ^= h >> 33;
  h *= P2;
  h ^= h >> 29;
  h *= P3;
  h ^= h >> 32;
  return h;
}

// Chained page hash, identical to the Python side
// (block_manager.compute_hash): xxh64(parent_hash_le8 || token_ids_int64).
static int64_t compute_hash(const int64_t* tokens, int64_t n,
                            int64_t prefix_hash) {
  std::vector<uint8_t> buf(8 + (size_t)n * 8);
  uint64_t ph = (uint64_t)prefix_hash;
  std::memcpy(buf.data(), &ph, 8);
  std::memcpy(buf.data() + 8, tokens, (size_t)n * 8);
  return (int64_t)xxh64(buf.data(), buf.size(), 0);
}

// ------------------------------------------------------- block manager
struct Block {
  int32_t ref_count = 0;
  int64_t hash = -1;
  std::vector<int64_t> token_ids;
  // Intrusive FIFO free list links (-1 = none / not free).
  int32_t prev = -1, next = -1;
  bool in_free = false;
};

struct BM {
  int64_t num_blocks;
  int64_t block_size;
  std::vector<Block> blocks;
  std::unordered_map<int64_t, int32_t> hash_to_block;
  int32_t free_head = -1, free_tail = -1;
  int64_t num_free = 0;
  int64_t cached_token_hits = 0;

  void free_push(int32_t id) {
    Block& b = blocks[id];
    b.prev = free_tail;
    b.next = -1;
    b.in_free = true;
    if (free_tail >= 0) blocks[free_tail].next = id;
    free_tail = id;
    if (free_head < 0) free_head = id;
    num_free++;
  }
  void free_remove(int32_t id) {
    Block& b = blocks[id];
    if (b.prev >= 0) blocks[b.prev].next = b.next; else free_head = b.next;
    if (b.next >= 0) blocks[b.next].prev = b.prev; else free_tail = b.prev;
    b.prev = b.next = -1;
    b.in_free = false;
    num_free--;
  }
  int32_t alloc_block(int32_t id) {  // id == -1 -> pop FIFO head
    if (id < 0) id = free_head;
    Block& b = blocks[id];
    free_remove(id);
    b.ref_count = 1;
    b.hash = -1;
    b.token_ids.clear();
    return id;
  }
  void seal(int32_t id, int64_t h, const int64_t* tokens, int64_t n) {
    Block& b = blocks[id];
    b.hash = h;
    b.token_ids.assign(tokens, tokens + n);
    hash_to_block[h] = id;
  }
};

extern "C" {

BM* bm_new(int64_t num_blocks, int64_t block_size) {
  BM* bm = new BM();
  bm->num_blocks = num_blocks;
  bm->block_size = block_size;
  bm->blocks.resize((size_t)num_blocks);
  for (int32_t i = 0; i < num_blocks; i++) bm->free_push(i);
  return bm;
}

void bm_delete(BM* bm) { delete bm; }

int64_t bm_num_free(BM* bm) { return bm->num_free; }
int64_t bm_cached_token_hits(BM* bm) { return bm->cached_token_hits; }

int64_t bm_compute_hash(const int64_t* tokens, int64_t n, int64_t prefix) {
  return compute_hash(tokens, n, prefix);
}

// Allocate the full page table for a prompt of n tokens, probing the prefix
// cache page by page (reference block_manager.py:62-115). Writes the page
// ids to table_out (capacity ceil(n/bs)) and returns num_cached_tokens,
// or -1 if there are not enough free pages.
int64_t bm_allocate(BM* bm, const int64_t* tokens, int64_t n,
                    int32_t* table_out) {
  int64_t bs = bm->block_size;
  int64_t npages = (n + bs - 1) / bs;
  if (npages > bm->num_free) return -1;
  int64_t h = -1;
  int64_t cached = 0;
  bool miss = false;
  for (int64_t i = 0; i < npages; i++) {
    const int64_t* page = tokens + i * bs;
    int64_t plen = (i == npages - 1) ? n - i * bs : bs;
    bool full = plen == bs;
    h = full ? compute_hash(page, plen, h) : -1;
    int32_t id = -1;
    if (!miss && full) {
      auto it = bm->hash_to_block.find(h);
      if (it != bm->hash_to_block.end()) {
        Block& b = bm->blocks[it->second];
        if (b.token_ids.size() == (size_t)plen &&
            std::memcmp(b.token_ids.data(), page, plen * 8) == 0)
          id = it->second;
      }
    }
    if (id < 0) miss = true;
    if (miss) {
      id = bm->alloc_block(-1);
    } else {
      cached += bs;
      bm->cached_token_hits += bs;
      Block& b = bm->blocks[id];
      if (b.in_free) {
        bm->alloc_block(id);  // re-activate, keep no copy
      } else {
        b.ref_count++;
      }
    }
    if (h != -1) bm->seal(id, h, page, plen);
    table_out[i] = id;
  }
  if (cached == n) cached -= 1;  // a fully-cached prompt keeps 1 query token
  return cached;
}

void bm_deallocate(BM* bm, const int32_t* table, int64_t npages) {
  for (int64_t i = npages - 1; i >= 0; i--) {
    Block& b = bm->blocks[table[i]];
    if (--b.ref_count == 0) bm->free_push(table[i]);
  }
}

// Extra pages needed to reserve capacity for seq_len + k - 1 tokens.
int64_t bm_pages_needed(BM* bm, int64_t seq_len, int64_t k, int64_t cur_pages) {
  int64_t cap = seq_len + k - 1;
  int64_t need = (cap + bm->block_size - 1) / bm->block_size - cur_pages;
  return need > 0 ? need : 0;
}

// Append `add` fresh pages to the table (caller checked bm_num_free).
void bm_reserve(BM* bm, int32_t* table_tail_out, int64_t add) {
  for (int64_t i = 0; i < add; i++) table_tail_out[i] = bm->alloc_block(-1);
}

// Seal page hashes after a decode token append (Python commit_token:
// handles the just-filled page and the lazy backfill of a previous page
// that was never sealed — the fork's short-prompt bugfix, reference
// block_manager.py:136-146). `page_tokens` are the token ids of page `idx`.
void bm_commit_token(BM* bm, const int32_t* table, int64_t npages,
                     int64_t seq_len, const int64_t* page_tokens) {
  int64_t bs = bm->block_size;
  int64_t pos = seq_len % bs;
  int64_t filled = seq_len / bs;
  int64_t idx;
  if (pos == 0) idx = filled - 1;
  else if (pos == 1 && filled >= 1) idx = filled - 1;
  else return;
  if (idx < 0 || idx >= npages) return;
  Block& b = bm->blocks[table[idx]];
  if (b.hash != -1) return;
  int64_t prefix = idx > 0 ? bm->blocks[table[idx - 1]].hash : -1;
  int64_t h = compute_hash(page_tokens, bs, prefix);
  bm->seal(table[idx], h, page_tokens, bs);
}

// Introspection for tests: block state by id.
void bm_block_info(BM* bm, int32_t id, int32_t* ref_count, int64_t* hash) {
  *ref_count = bm->blocks[id].ref_count;
  *hash = bm->blocks[id].hash;
}

// ------------------------------------------------- decode meta builder
// Fills the per-dispatch decode BatchMeta buffers in one pass (the host
// hot loop of reference prepare_decode, engine/model_runner.py:243-268).
// tables_concat holds each sequence's page table back to back
// (table_lens[i] entries for seq i).
void build_decode_meta(
    int64_t n, int64_t S, int64_t page_size, int64_t pages_per_seq,
    int64_t num_slots,
    const int64_t* last_tokens, const int64_t* seq_lens,
    const int32_t* tables_concat, const int64_t* table_lens,
    const float* temps,
    int32_t* input_ids, int32_t* positions, int32_t* slot_mapping,
    int32_t* seq_idx, int32_t* block_tables, int32_t* context_lens,
    float* temperatures) {
  int64_t off = 0;
  for (int64_t s = 0; s < S; s++) {
    if (s < n) {
      int64_t len = seq_lens[s];
      int64_t pos = len - 1;
      const int32_t* bt = tables_concat + off;
      input_ids[s] = (int32_t)last_tokens[s];
      positions[s] = (int32_t)pos;
      slot_mapping[s] =
          bt[pos / page_size] * (int32_t)page_size + (int32_t)(pos % page_size);
      seq_idx[s] = (int32_t)s;
      context_lens[s] = (int32_t)len;
      temperatures[s] = temps[s];
      int64_t tl = table_lens[s];
      std::memcpy(block_tables + s * pages_per_seq, bt, tl * 4);
      std::memset(block_tables + s * pages_per_seq + tl, 0,
                  (pages_per_seq - tl) * 4);
      off += tl;
    } else {
      input_ids[s] = 0;
      positions[s] = 0;
      slot_mapping[s] = (int32_t)num_slots;
      seq_idx[s] = (int32_t)S;
      context_lens[s] = 0;
      temperatures[s] = 0.0f;
      std::memset(block_tables + s * pages_per_seq, 0, pages_per_seq * 4);
    }
  }
}

// ------------------------------------------------ prefill meta builder
// Host prep for a prefill dispatch (reference prepare_prefill,
// engine/model_runner.py:171-241): only each sequence's UNCACHED suffix
// becomes query tokens; cached pages stay visible through the block table.
// Each sequence's query segment starts at a multiple of q_tile in the flat
// layout (the ragged Pallas prefill kernel's tiling contract). Buffers are
// sized by the caller: T tokens, S seqs, T/q_tile tiles.
// suffix_concat holds each sequence's uncached tokens back to back.
void build_prefill_meta(
    int64_t n, int64_t T, int64_t S, int64_t page_size, int64_t pages_per_seq,
    int64_t num_slots, int64_t q_tile,
    const int64_t* suffix_concat, const int64_t* seq_lens,
    const int64_t* cached_lens, const int32_t* tables_concat,
    const int64_t* table_lens, const float* temps,
    int32_t* input_ids, int32_t* positions, int32_t* slot_mapping,
    int32_t* seq_idx, int32_t* q_offset, int32_t* block_tables,
    int32_t* context_lens, int32_t* last_token_idx, float* temperatures,
    int32_t* tile_seq, int32_t* tile_pos0) {
  int64_t nt = T / q_tile;
  for (int64_t i = 0; i < T; i++) {
    input_ids[i] = 0;
    positions[i] = 0;
    slot_mapping[i] = (int32_t)num_slots;
    seq_idx[i] = (int32_t)S;
    q_offset[i] = 0;
  }
  std::memset(block_tables, 0, (size_t)(S * pages_per_seq) * 4);
  for (int64_t s = 0; s < S; s++) {
    context_lens[s] = 0;
    last_token_idx[s] = (int32_t)(T - 1);
    temperatures[s] = 0.0f;
  }
  for (int64_t ti = 0; ti < nt; ti++) {
    tile_seq[ti] = (int32_t)S;
    tile_pos0[ti] = -1;
  }
  int64_t t = 0, suf_off = 0, tab_off = 0;
  for (int64_t s = 0; s < n; s++) {
    int64_t cached = cached_lens[s];
    int64_t len = seq_lens[s];
    int64_t n_new = len - cached;
    const int64_t* ids = suffix_concat + suf_off;
    const int32_t* bt = tables_concat + tab_off;
    int64_t tl = table_lens[s];
    for (int64_t j = 0; j < n_new; j++) {
      int64_t pos = cached + j;
      input_ids[t + j] = (int32_t)ids[j];
      positions[t + j] = (int32_t)pos;
      seq_idx[t + j] = (int32_t)s;
      q_offset[t + j] = (int32_t)j;
      slot_mapping[t + j] =
          bt[pos / page_size] * (int32_t)page_size + (int32_t)(pos % page_size);
    }
    std::memcpy(block_tables + s * pages_per_seq, bt, tl * 4);
    context_lens[s] = (int32_t)len;
    last_token_idx[s] = (int32_t)(t + n_new - 1);
    temperatures[s] = temps[s];
    int64_t n_tiles = (n_new + q_tile - 1) / q_tile;
    int64_t t0 = t / q_tile;
    for (int64_t k = 0; k < n_tiles; k++) {
      tile_seq[t0 + k] = (int32_t)s;
      tile_pos0[t0 + k] = (int32_t)(cached + k * q_tile);
    }
    t += n_tiles * q_tile;
    suf_off += n_new;
    tab_off += tl;
  }
}

}  // extern "C"
