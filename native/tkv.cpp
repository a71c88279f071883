// tkv — native ordered-KV storage engine with optimistic transactions.
//
// The cozo_tpu equivalent of the reference's cozorocks C++ bridge
// (`cozorocks/bridge/*`, reference uses RocksDB OptimisticTransactionDB):
// an ordered in-memory map with per-key modification sequences for
// commit-time conflict detection, a write-ahead log for durability, and
// snapshot compaction.  Exposed through a C ABI consumed by ctypes
// (`cozo_tpu/storage/tkv.py`); transaction overlays live on the Python
// side, conflict checking and atomic batch commit live here.
//
// Durability (round 2): deletions leave TOMBSTONES carrying mod_seq, so
// read-set validation detects delete-after-snapshot conflicts (the
// reference gets this from RocksDB sequence numbers, cozorocks/bridge/
// tx.h:16-22).  Tombstones also make map nodes stable, so iterators hold
// their position across commits instead of re-seeking per next().
// WAL flushing: mode 0 = buffered, 1 = fflush per commit (survives
// SIGKILL; default — matches RocksDB's default non-fsync WAL), 2 =
// fdatasync per commit (survives power loss).
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

#ifndef _WIN32
#include <unistd.h>
#endif

namespace {

struct Entry {
    std::string value;
    uint64_t mod_seq;
    bool dead = false;  // tombstone: preserves mod_seq for conflict checks
};

struct Db {
    std::map<std::string, Entry> data;
    mutable std::shared_mutex mu;
    uint64_t seq = 0;
    uint64_t n_live = 0;
    uint64_t n_dead = 0;
    uint64_t iter_epoch = 0;  // bumped whenever map nodes may be invalidated
    int sync_mode = 1;
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
    if (!db->wal || db->sync_mode == 0) return;
    fflush(db->wal);
#ifndef _WIN32
    if (db->sync_mode >= 2) fdatasync(fileno(db->wal));
#endif
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
            db->data[k] = Entry{std::move(v), db->seq, false};
        } else {
            db->data.erase(k);  // no live txs at open: plain erase is fine
        }
    }
    fclose(f);
    db->n_live = db->data.size();
    return true;
}

void mark_dead(Db* db, const std::string& k) {
    auto it = db->data.find(k);
    db->seq++;
    if (it != db->data.end()) {
        if (!it->second.dead) {
            db->n_live--;
            db->n_dead++;
        }
        it->second.dead = true;
        it->second.value.clear();
        it->second.mod_seq = db->seq;
    } else {
        db->data[k] = Entry{std::string(), db->seq, true};
        db->n_dead++;
    }
}

void put_live(Db* db, const std::string& k, std::string v) {
    db->seq++;
    auto it = db->data.find(k);
    if (it != db->data.end()) {
        if (it->second.dead) {
            db->n_dead--;
            db->n_live++;
        }
        it->second.value = std::move(v);
        it->second.mod_seq = db->seq;
        it->second.dead = false;
    } else {
        db->data[k] = Entry{std::move(v), db->seq, false};
        db->n_live++;
    }
}

// garbage-collect tombstones once they dominate; invalidates iterators
// (they re-seek from their last key via the epoch guard)
void maybe_gc(Db* db) {
    if (db->n_dead < 4096 || db->n_dead < db->n_live) return;
    for (auto it = db->data.begin(); it != db->data.end();) {
        if (it->second.dead) {
            it = db->data.erase(it);
        } else {
            ++it;
        }
    }
    db->n_dead = 0;
    db->iter_epoch++;
}

struct Iter {
    Db* db;
    std::string lower, upper, last;
    bool reverse;
    bool started = false;
    // held map position: valid while epoch matches (tombstones keep
    // nodes alive across commits, so no per-call re-seek)
    std::map<std::string, Entry>::const_iterator pos;
    bool has_pos = false;
    uint64_t epoch = 0;
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

void tkv_set_sync(void* h, int mode) {
    static_cast<Db*>(h)->sync_mode = mode;
}

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
    if (it == db->data.end() || it->second.dead) return 0;
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
    // establish the next position: O(1) resume from the held node when
    // the epoch matches (tombstones keep nodes stable across commits),
    // otherwise a fresh O(log n) seek from the last yielded key
    if (it->has_pos && it->epoch == db->iter_epoch) {
        pos = it->pos;
        if (!it->reverse) {
            ++pos;
        } else {
            if (pos == db->data.begin()) return 0;
            --pos;
        }
    } else if (!it->reverse) {
        pos = it->started ? db->data.upper_bound(it->last)
                          : db->data.lower_bound(it->lower);
    } else {
        pos = it->started ? db->data.lower_bound(it->last)
                          : db->data.lower_bound(it->upper);
        if (pos == db->data.begin()) return 0;
        --pos;
    }
    // skip tombstones within bounds
    if (!it->reverse) {
        while (pos != db->data.end() && pos->first < it->upper &&
               pos->second.dead)
            ++pos;
        if (pos == db->data.end() || pos->first >= it->upper) return 0;
    } else {
        while (pos->first >= it->lower && pos->second.dead) {
            if (pos == db->data.begin()) return 0;
            --pos;
        }
        if (pos->first < it->lower) return 0;
    }
    it->started = true;
    it->last = pos->first;
    it->pos = pos;
    it->has_pos = true;
    it->epoch = db->iter_epoch;
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
    uint64_t n = 0;
    for (auto it = a; it != b; ++it)
        if (!it->second.dead) n++;
    return n;
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
        // tombstones keep mod_seq, so delete-after-snapshot conflicts
        // are detected exactly like overwrite conflicts
        if (it != db->data.end() && it->second.mod_seq > snapshot_seq) return 1;
    }
    for (size_t i = 0; i < n_ops; i++) {
        std::string k(okeys[i], oklens[i]);
        if (ovlens[i] == SIZE_MAX) {
            if (!wal_append(db, 1, k, std::string())) return 2;
            mark_dead(db, k);
        } else {
            std::string v(ovals[i], ovlens[i]);
            if (!wal_append(db, 0, k, v)) return 2;
            put_live(db, k, std::move(v));
        }
    }
    wal_flush(db);
    maybe_gc(db);
    return 0;
}

void tkv_del_range(void* h, const char* lo, size_t lo_len, const char* hi,
                   size_t hi_len) {
    auto* db = static_cast<Db*>(h);
    std::unique_lock lk(db->mu);
    auto a = db->data.lower_bound(std::string(lo, lo_len));
    auto b = db->data.lower_bound(std::string(hi, hi_len));
    std::vector<std::string> keys;
    for (auto it = a; it != b; ++it)
        if (!it->second.dead) keys.push_back(it->first);
    for (const auto& k : keys) {
        wal_append(db, 1, k, std::string());
        mark_dead(db, k);
    }
    wal_flush(db);
    maybe_gc(db);
}

// Compaction: write a fresh WAL containing only the live state and drop
// tombstones.
int tkv_compact(void* h) {
    auto* db = static_cast<Db*>(h);
    std::unique_lock lk(db->mu);
    // drop tombstones (invalidates held iterator positions: bump epoch)
    for (auto it = db->data.begin(); it != db->data.end();) {
        if (it->second.dead) {
            it = db->data.erase(it);
        } else {
            ++it;
        }
    }
    db->n_dead = 0;
    db->iter_epoch++;
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
    fflush(f);
#ifndef _WIN32
    fdatasync(fileno(f));
#endif
    fclose(f);
    if (db->wal) fclose(db->wal);
    if (rename(tmp.c_str(), db->wal_path.c_str()) != 0) return 2;
    db->wal = fopen(db->wal_path.c_str(), "ab");
    return db->wal ? 0 : 2;
}

uint64_t tkv_len(void* h) {
    auto* db = static_cast<Db*>(h);
    std::shared_lock lk(db->mu);
    return db->n_live;
}

}  // extern "C"
