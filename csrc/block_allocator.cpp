// Paged-KV block allocator: the serving engine's native host-side runtime.
//
// TPU-native counterpart of the reference's paged-KV bookkeeping (the
// block_table machinery consumed by csrc/flash_attn/flash_api.cpp:557-581 and
// hopper/paged_kv.h). The device side is a Pallas kernel reading block
// tables; this C++ library owns the host side: a free-list allocator with
// reference counting so sequences can share prefix blocks copy-on-write
// (continuous batching + prefix caching).
//
// Exposed as a plain C ABI consumed from Python via ctypes (no pybind11 in
// the image). All functions are thread-safe under a single internal mutex —
// the engine's scheduler thread and HTTP workers may race on admission.

#include <cstdint>
#include <cstring>
#include <mutex>
#include <vector>

namespace {

struct Allocator {
  std::mutex mu;
  int32_t num_blocks;
  int32_t block_size;  // tokens per block (informational)
  std::vector<int32_t> free_list;  // stack of free block ids
  std::vector<int32_t> refcount;   // per block

  Allocator(int32_t n, int32_t bs) : num_blocks(n), block_size(bs) {
    refcount.assign(n, 0);
    free_list.reserve(n);
    // Reverse order so block 0 pops first (stable, debuggable layouts).
    for (int32_t i = n - 1; i >= 0; --i) free_list.push_back(i);
  }
};

}  // namespace

extern "C" {

void* ba_create(int32_t num_blocks, int32_t block_size) {
  if (num_blocks <= 0 || block_size <= 0) return nullptr;
  return new Allocator(num_blocks, block_size);
}

void ba_destroy(void* h) { delete static_cast<Allocator*>(h); }

int32_t ba_num_free(void* h) {
  auto* a = static_cast<Allocator*>(h);
  std::lock_guard<std::mutex> lock(a->mu);
  return static_cast<int32_t>(a->free_list.size());
}

int32_t ba_block_size(void* h) {
  return static_cast<Allocator*>(h)->block_size;
}

// Allocate n blocks into out[0..n). Returns 0 on success, -1 if insufficient
// free blocks (nothing is allocated on failure — all-or-nothing).
int32_t ba_alloc(void* h, int32_t n, int32_t* out) {
  auto* a = static_cast<Allocator*>(h);
  std::lock_guard<std::mutex> lock(a->mu);
  if (n < 0 || static_cast<size_t>(n) > a->free_list.size()) return -1;
  for (int32_t i = 0; i < n; ++i) {
    int32_t b = a->free_list.back();
    a->free_list.pop_back();
    a->refcount[b] = 1;
    out[i] = b;
  }
  return 0;
}

// Drop one reference on each of n blocks; blocks reaching refcount 0 return
// to the free list. Unknown/free blocks are ignored (idempotent release).
void ba_release(void* h, int32_t n, const int32_t* blocks) {
  auto* a = static_cast<Allocator*>(h);
  std::lock_guard<std::mutex> lock(a->mu);
  for (int32_t i = 0; i < n; ++i) {
    int32_t b = blocks[i];
    if (b < 0 || b >= a->num_blocks || a->refcount[b] == 0) continue;
    if (--a->refcount[b] == 0) a->free_list.push_back(b);
  }
}

// Add one reference to each block (prefix sharing / copy-on-write fork).
// Returns -1 if any block is not currently allocated.
int32_t ba_fork(void* h, int32_t n, const int32_t* blocks) {
  auto* a = static_cast<Allocator*>(h);
  std::lock_guard<std::mutex> lock(a->mu);
  for (int32_t i = 0; i < n; ++i) {
    int32_t b = blocks[i];
    if (b < 0 || b >= a->num_blocks || a->refcount[b] == 0) return -1;
  }
  for (int32_t i = 0; i < n; ++i) a->refcount[blocks[i]]++;
  return 0;
}

int32_t ba_refcount(void* h, int32_t block) {
  auto* a = static_cast<Allocator*>(h);
  std::lock_guard<std::mutex> lock(a->mu);
  if (block < 0 || block >= a->num_blocks) return -1;
  return a->refcount[block];
}

}  // extern "C"
