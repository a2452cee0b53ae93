// qe_native: native host-side runtime structures for query-engine-tpu.
//
// Parity surface: the reference's query-index crate is native Rust
// (BTreeMap/AHashMap over order-preserving byte keys, btree.rs:16-152,
// hash.rs:18-140, types.rs:101-110); this is the C++ equivalent, exposed
// through a C ABI consumed via ctypes (no pybind11 in the image).
//
// Keys arrive pre-encoded as order-preserving byte strings (the Python side
// mirrors the reference IndexKey encoding: type tag + big-endian i64 with
// sign flip / f64 bit trick / raw utf8), so comparisons are plain memcmp.
//
// Build: g++ -O2 -std=c++17 -shared -fPIC qe_native.cpp -o libqe_native.so

#include <cstdint>
#include <cstring>
#include <map>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

using Key = std::string;

struct BTreeIndex {
    std::multimap<Key, uint64_t> map;
    bool unique;
    uint64_t size = 0;
};

struct HashIndex {
    std::unordered_multimap<Key, uint64_t> map;
    bool unique;
    uint64_t size = 0;
};

Key make_key(const char* data, uint64_t len) { return Key(data, len); }

}  // namespace

extern "C" {

// ---- B-Tree ---------------------------------------------------------------

void* qe_btree_new(int unique) {
    auto* idx = new BTreeIndex();
    idx->unique = unique != 0;
    return idx;
}

void qe_btree_free(void* h) { delete static_cast<BTreeIndex*>(h); }

// returns 0 on success, 1 on unique-constraint violation
int qe_btree_insert(void* h, const char* key, uint64_t len, uint64_t row) {
    auto* idx = static_cast<BTreeIndex*>(h);
    Key k = make_key(key, len);
    if (idx->unique && idx->map.count(k)) return 1;
    idx->map.emplace(std::move(k), row);
    idx->size++;
    return 0;
}

// bulk insert: keys concatenated, offsets[n+1]; returns #inserted, or
// -(i+1) on unique violation at input i (nothing after i inserted)
int64_t qe_btree_bulk_insert(void* h, const char* keys,
                             const uint64_t* offsets, const uint64_t* rows,
                             uint64_t n) {
    auto* idx = static_cast<BTreeIndex*>(h);
    for (uint64_t i = 0; i < n; i++) {
        Key k = make_key(keys + offsets[i], offsets[i + 1] - offsets[i]);
        if (idx->unique && idx->map.count(k)) return -static_cast<int64_t>(i + 1);
        idx->map.emplace(std::move(k), rows[i]);
        idx->size++;
    }
    return static_cast<int64_t>(n);
}

int qe_btree_delete(void* h, const char* key, uint64_t len, uint64_t row) {
    auto* idx = static_cast<BTreeIndex*>(h);
    auto range = idx->map.equal_range(make_key(key, len));
    for (auto it = range.first; it != range.second; ++it) {
        if (it->second == row) {
            idx->map.erase(it);
            idx->size--;
            return 0;
        }
    }
    return 1;
}

uint64_t qe_btree_lookup(void* h, const char* key, uint64_t len,
                         uint64_t* out, uint64_t cap) {
    auto* idx = static_cast<BTreeIndex*>(h);
    auto range = idx->map.equal_range(make_key(key, len));
    uint64_t n = 0;
    for (auto it = range.first; it != range.second && n < cap; ++it)
        out[n++] = it->second;
    return n;
}

// lo_len == UINT64_MAX means unbounded low; same for high
uint64_t qe_btree_range(void* h, const char* lo, uint64_t lo_len, int incl_lo,
                        const char* hi, uint64_t hi_len, int incl_hi,
                        uint64_t* out, uint64_t cap) {
    auto* idx = static_cast<BTreeIndex*>(h);
    auto begin = idx->map.begin();
    if (lo_len != UINT64_MAX) {
        Key k = make_key(lo, lo_len);
        begin = incl_lo ? idx->map.lower_bound(k) : idx->map.upper_bound(k);
    }
    auto end = idx->map.end();
    if (hi_len != UINT64_MAX) {
        Key k = make_key(hi, hi_len);
        end = incl_hi ? idx->map.upper_bound(k) : idx->map.lower_bound(k);
    }
    uint64_t n = 0;
    for (auto it = begin; it != end && n < cap; ++it) out[n++] = it->second;
    return n;
}

uint64_t qe_btree_len(void* h) { return static_cast<BTreeIndex*>(h)->size; }

void qe_btree_clear(void* h) {
    auto* idx = static_cast<BTreeIndex*>(h);
    idx->map.clear();
    idx->size = 0;
}

// ---- Hash index -----------------------------------------------------------

void* qe_hash_new(int unique) {
    auto* idx = new HashIndex();
    idx->unique = unique != 0;
    return idx;
}

void qe_hash_free(void* h) { delete static_cast<HashIndex*>(h); }

int qe_hash_insert(void* h, const char* key, uint64_t len, uint64_t row) {
    auto* idx = static_cast<HashIndex*>(h);
    Key k = make_key(key, len);
    if (idx->unique && idx->map.count(k)) return 1;
    idx->map.emplace(std::move(k), row);
    idx->size++;
    return 0;
}

int64_t qe_hash_bulk_insert(void* h, const char* keys,
                            const uint64_t* offsets, const uint64_t* rows,
                            uint64_t n) {
    auto* idx = static_cast<HashIndex*>(h);
    idx->map.reserve(idx->map.size() + n);
    for (uint64_t i = 0; i < n; i++) {
        Key k = make_key(keys + offsets[i], offsets[i + 1] - offsets[i]);
        if (idx->unique && idx->map.count(k)) return -static_cast<int64_t>(i + 1);
        idx->map.emplace(std::move(k), rows[i]);
        idx->size++;
    }
    return static_cast<int64_t>(n);
}

int qe_hash_delete(void* h, const char* key, uint64_t len, uint64_t row) {
    auto* idx = static_cast<HashIndex*>(h);
    auto range = idx->map.equal_range(make_key(key, len));
    for (auto it = range.first; it != range.second; ++it) {
        if (it->second == row) {
            idx->map.erase(it);
            idx->size--;
            return 0;
        }
    }
    return 1;
}

uint64_t qe_hash_lookup(void* h, const char* key, uint64_t len,
                        uint64_t* out, uint64_t cap) {
    auto* idx = static_cast<HashIndex*>(h);
    auto range = idx->map.equal_range(make_key(key, len));
    uint64_t n = 0;
    for (auto it = range.first; it != range.second && n < cap; ++it)
        out[n++] = it->second;
    return n;
}

uint64_t qe_hash_len(void* h) { return static_cast<HashIndex*>(h)->size; }

void qe_hash_clear(void* h) {
    auto* idx = static_cast<HashIndex*>(h);
    idx->map.clear();
    idx->size = 0;
}

}  // extern "C"
