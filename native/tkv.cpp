// tkv — native ordered-KV storage engine with optimistic transactions.
//
// The cozo_tpu equivalent of the reference's cozorocks C++ bridge
// (`cozorocks/bridge/*`, reference uses RocksDB OptimisticTransactionDB):
// an ordered in-memory map with per-key modification sequences for
// commit-time write-write conflict detection, a write-ahead log for
// durability, and snapshot compaction.  Exposed through a C ABI consumed
// by ctypes (`cozo_tpu/storage/tkv.py`); transaction overlays live on the
// Python side, conflict checking and atomic batch commit live here.
//
// Build: g++ -O2 -std=c++17 -shared -fPIC -o libtkv.so tkv.cpp

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <map>
#include <memory>
#include <mutex>
#include <shared_mutex>
#include <string>
#include <vector>

namespace {

struct Entry {
    std::string value;
    uint64_t mod_seq;
};

struct Db {
    std::map<std::string, Entry> data;
    mutable std::shared_mutex mu;
    uint64_t seq = 0;
    std::string wal_path;
    FILE* wal = nullptr;

    ~Db() {
        if (wal) fclose(wal);
    }
};

// --- WAL ---------------------------------------------------------------
// record: u8 op (0=put, 1=del) | u32 klen | u32 vlen | key | val

bool wal_append(Db* db, uint8_t op, const std::string& k, const std::string& v) {
    if (!db->wal) return true;
    uint32_t klen = (uint32_t)k.size();
    uint32_t vlen = (uint32_t)v.size();
    if (fwrite(&op, 1, 1, db->wal) != 1) return false;
    if (fwrite(&klen, 4, 1, db->wal) != 1) return false;
    if (fwrite(&vlen, 4, 1, db->wal) != 1) return false;
    if (klen && fwrite(k.data(), 1, klen, db->wal) != klen) return false;
    if (vlen && fwrite(v.data(), 1, vlen, db->wal) != vlen) return false;
    return true;
}

void wal_flush(Db* db) {
    if (db->wal) fflush(db->wal);
}

bool wal_replay(Db* db) {
    FILE* f = fopen(db->wal_path.c_str(), "rb");
    if (!f) return true;  // fresh database
    for (;;) {
        uint8_t op;
        uint32_t klen, vlen;
        if (fread(&op, 1, 1, f) != 1) break;
        if (fread(&klen, 4, 1, f) != 1) break;
        if (fread(&vlen, 4, 1, f) != 1) break;
        std::string k(klen, '\0'), v(vlen, '\0');
        if (klen && fread(&k[0], 1, klen, f) != klen) break;
        if (vlen && fread(&v[0], 1, vlen, f) != vlen) break;
        db->seq++;
        if (op == 0) {
            db->data[k] = Entry{std::move(v), db->seq};
        } else {
            db->data.erase(k);
        }
    }
    fclose(f);
    return true;
}

struct Iter {
    Db* db;
    std::string lower, upper, last;
    bool reverse;
    bool started = false;
    // buffers handed to the caller, valid until the next call
    std::string cur_k, cur_v;
};

}  // namespace

extern "C" {

void* tkv_open(const char* path) {
    auto* db = new Db();
    if (path && path[0]) {
        db->wal_path = path;
        wal_replay(db);
        db->wal = fopen(path, "ab");
        if (!db->wal) {
            delete db;
            return nullptr;
        }
    }
    return db;
}

void tkv_close(void* h) { delete static_cast<Db*>(h); }

uint64_t tkv_seq(void* h) {
    auto* db = static_cast<Db*>(h);
    std::shared_lock lk(db->mu);
    return db->seq;
}

// returns 1 if found; *v is a malloc'd copy the caller must tkv_free —
// returning interior pointers would race with concurrent commits once the
// shared lock is released
int tkv_get(void* h, const char* k, size_t klen, char** v, size_t* vlen,
            uint64_t* mod_seq) {
    auto* db = static_cast<Db*>(h);
    std::shared_lock lk(db->mu);
    auto it = db->data.find(std::string(k, klen));
    if (it == db->data.end()) return 0;
    *vlen = it->second.value.size();
    *v = static_cast<char*>(malloc(*vlen ? *vlen : 1));
    memcpy(*v, it->second.value.data(), *vlen);
    if (mod_seq) *mod_seq = it->second.mod_seq;
    return 1;
}

void tkv_free(char* p) { free(p); }

void* tkv_iter(void* h, const char* lo, size_t lo_len, const char* hi,
               size_t hi_len, int reverse) {
    auto* it = new Iter();
    it->db = static_cast<Db*>(h);
    it->lower.assign(lo, lo_len);
    it->upper.assign(hi, hi_len);
    it->reverse = reverse != 0;
    return it;
}

int tkv_iter_next(void* hi, const char** k, size_t* klen, const char** v,
                  size_t* vlen) {
    auto* it = static_cast<Iter*>(hi);
    Db* db = it->db;
    std::shared_lock lk(db->mu);
    std::map<std::string, Entry>::const_iterator pos;
    if (!it->reverse) {
        if (!it->started) {
            pos = db->data.lower_bound(it->lower);
        } else {
            pos = db->data.upper_bound(it->last);
        }
        if (pos == db->data.end() || pos->first >= it->upper) return 0;
    } else {
        if (!it->started) {
            pos = db->data.lower_bound(it->upper);
        } else {
            pos = db->data.lower_bound(it->last);
        }
        if (pos == db->data.begin()) return 0;
        --pos;
        if (pos->first < it->lower) return 0;
    }
    it->started = true;
    it->last = pos->first;
    it->cur_k = pos->first;
    it->cur_v = pos->second.value;
    *k = it->cur_k.data();
    *klen = it->cur_k.size();
    *v = it->cur_v.data();
    *vlen = it->cur_v.size();
    return 1;
}

void tkv_iter_close(void* hi) { delete static_cast<Iter*>(hi); }

uint64_t tkv_count(void* h, const char* lo, size_t lo_len, const char* hi,
                   size_t hi_len) {
    auto* db = static_cast<Db*>(h);
    std::shared_lock lk(db->mu);
    auto a = db->data.lower_bound(std::string(lo, lo_len));
    auto b = db->data.lower_bound(std::string(hi, hi_len));
    return (uint64_t)std::distance(a, b);
}

// Atomic optimistic commit: verify read-set freshness, apply ops, WAL.
// op with vlen == SIZE_MAX means delete.  Returns 0 ok, 1 conflict, 2 io.
int tkv_commit(void* h, uint64_t snapshot_seq, const char** rkeys,
               const size_t* rlens, size_t n_reads, const char** okeys,
               const size_t* oklens, const char** ovals, const size_t* ovlens,
               size_t n_ops) {
    auto* db = static_cast<Db*>(h);
    std::unique_lock lk(db->mu);
    for (size_t i = 0; i < n_reads; i++) {
        auto it = db->data.find(std::string(rkeys[i], rlens[i]));
        if (it != db->data.end() && it->second.mod_seq > snapshot_seq) return 1;
        // deleted-since-snapshot keys cannot be detected without
        // tombstone seqs; acceptable for the single-process host which
        // serializes writers per relation (runtime/db.py _lock_for)
    }
    for (size_t i = 0; i < n_ops; i++) {
        std::string k(okeys[i], oklens[i]);
        db->seq++;
        if (ovlens[i] == SIZE_MAX) {
            db->data.erase(k);
            if (!wal_append(db, 1, k, std::string())) return 2;
        } else {
            std::string v(ovals[i], ovlens[i]);
            if (!wal_append(db, 0, k, v)) return 2;
            db->data[k] = Entry{std::move(v), db->seq};
        }
    }
    wal_flush(db);
    return 0;
}

void tkv_del_range(void* h, const char* lo, size_t lo_len, const char* hi,
                   size_t hi_len) {
    auto* db = static_cast<Db*>(h);
    std::unique_lock lk(db->mu);
    auto a = db->data.lower_bound(std::string(lo, lo_len));
    auto b = db->data.lower_bound(std::string(hi, hi_len));
    for (auto it = a; it != b; ++it) {
        db->seq++;
        wal_append(db, 1, it->first, std::string());
    }
    db->data.erase(a, b);
    wal_flush(db);
}

// Compaction: write a fresh WAL containing only the live state.
int tkv_compact(void* h) {
    auto* db = static_cast<Db*>(h);
    std::unique_lock lk(db->mu);
    if (db->wal_path.empty()) return 0;
    std::string tmp = db->wal_path + ".compact";
    FILE* f = fopen(tmp.c_str(), "wb");
    if (!f) return 2;
    for (const auto& [k, e] : db->data) {
        uint8_t op = 0;
        uint32_t klen = (uint32_t)k.size(), vlen = (uint32_t)e.value.size();
        fwrite(&op, 1, 1, f);
        fwrite(&klen, 4, 1, f);
        fwrite(&vlen, 4, 1, f);
        if (klen) fwrite(k.data(), 1, klen, f);
        if (vlen) fwrite(e.value.data(), 1, vlen, f);
    }
    fclose(f);
    if (db->wal) fclose(db->wal);
    if (rename(tmp.c_str(), db->wal_path.c_str()) != 0) return 2;
    db->wal = fopen(db->wal_path.c_str(), "ab");
    return db->wal ? 0 : 2;
}

uint64_t tkv_len(void* h) {
    auto* db = static_cast<Db*>(h);
    std::shared_lock lk(db->mu);
    return db->data.size();
}

}  // extern "C"
