// tkv — native ordered-KV storage engine with optimistic transactions
// and an LSM on-disk structure (datasets larger than RAM).
//
// The cozo_tpu equivalent of the reference's cozorocks C++ bridge
// (`cozorocks/bridge/*`, reference uses RocksDB OptimisticTransactionDB):
// same architecture as RocksDB at small scale —
//
//   writes  → WAL append + sorted memtable (std::map, per-key mod_seq)
//   flush   → memtable serialized to an immutable sorted SST file
//             (sparse key index + bloom filter), WAL truncated
//   reads   → memtable, then SSTs newest→oldest (bloom-gated point gets,
//             k-way merged range scans)
//   compact → tiered: all SSTs merged into one when they pile up;
//             explicit tkv_compact() also folds in the memtable and
//             drops tombstones
//
// Conflict detection: every record (including tombstones) carries the
// mod_seq it was written at; commit-time read-set validation compares
// the newest visible seq per key against the transaction's snapshot seq
// (the reference gets this from RocksDB sequence numbers,
// cozorocks/bridge/tx.h:16-22).  Tombstones persist through flush and
// tiered compaction so delete-after-snapshot conflicts stay detectable;
// only an explicit compact drops them.
//
// WAL flushing: mode 0 = buffered, 1 = fflush per commit (survives
// SIGKILL; default — matches RocksDB's default non-fsync WAL), 2 =
// fdatasync per commit (survives power loss).  SST writes are always
// fdatasync'd before the manifest is atomically renamed into place, so
// a crash mid-flush leaves either the old state (WAL intact) or the new
// one — never a torn mix.
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
#include <string_view>
#include <vector>

#ifndef _WIN32
#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>
#endif

namespace {

constexpr uint32_t kSstMagic = 0x54564B31;  // "1KVT"
constexpr size_t kIndexStride = 16;
constexpr size_t kBloomBitsPerKey = 10;
constexpr size_t kMaxSsts = 6;
constexpr uint64_t kDefaultFlushBytes = 128ull << 20;  // 128 MB memtable

struct Entry {
    std::string value;
    uint64_t mod_seq;
    bool dead = false;  // tombstone: preserves mod_seq for conflict checks
};

// ---------------------------------------------------------------- bloom

uint64_t fnv1a64(const char* p, size_t n) {
    uint64_t h = 1469598103934665603ull;
    for (size_t i = 0; i < n; i++) {
        h ^= (uint8_t)p[i];
        h *= 1099511628211ull;
    }
    return h;
}

struct BloomBuilder {
    std::vector<uint8_t> bits;
    uint64_t nbits = 0;

    explicit BloomBuilder(size_t n_keys) {
        nbits = (uint64_t)(n_keys ? n_keys : 1) * kBloomBitsPerKey;
        bits.assign((nbits + 7) / 8, 0);
    }
    void add(std::string_view k) {
        uint64_t h = fnv1a64(k.data(), k.size());
        uint64_t d = (h >> 33) | 1;
        for (int i = 0; i < 6; i++) {
            uint64_t b = h % nbits;
            bits[b >> 3] |= (uint8_t)(1u << (b & 7));
            h += d;
        }
    }
};

bool bloom_may_contain(const uint8_t* bits, uint64_t nbits, std::string_view k) {
    if (!nbits) return true;
    uint64_t h = fnv1a64(k.data(), k.size());
    uint64_t d = (h >> 33) | 1;
    for (int i = 0; i < 6; i++) {
        uint64_t b = h % nbits;
        if (!(bits[b >> 3] & (1u << (b & 7)))) return false;
        h += d;
    }
    return true;
}

// ------------------------------------------------------------------ SST
//
// file layout:
//   u32 magic
//   entries: repeated { u32 klen | u32 vlen | u64 seq | u8 dead | key | val }
//   index:   repeated { u64 entry_off | u32 klen | key }   (every 16th entry)
//   bloom:   u64 nbits | bytes
//   footer:  u64 index_off | u64 n_index | u64 bloom_off | u64 n_entries
//            u64 max_seq | u32 magic

struct Record {
    std::string_view key;
    std::string_view val;
    uint64_t seq = 0;
    bool dead = false;
};

struct Sst {
    std::string path;
    int fd = -1;
    const uint8_t* base = nullptr;
    size_t size = 0;
    uint64_t n_entries = 0;
    uint64_t max_seq = 0;
    uint64_t entries_end = 0;  // first byte past the entry region
    std::vector<std::pair<std::string_view, uint64_t>> index;  // key → offset
    const uint8_t* bloom_bits = nullptr;
    uint64_t bloom_nbits = 0;

    ~Sst() {
#ifndef _WIN32
        if (base) munmap((void*)base, size);
        if (fd >= 0) close(fd);
#endif
    }

    bool open(const std::string& p) {
#ifndef _WIN32
        path = p;
        fd = ::open(p.c_str(), O_RDONLY);
        if (fd < 0) return false;
        struct stat st;
        if (fstat(fd, &st) != 0) return false;
        size = (size_t)st.st_size;
        if (size < 4 + 44) return false;
        base = (const uint8_t*)mmap(nullptr, size, PROT_READ, MAP_SHARED, fd, 0);
        if (base == MAP_FAILED) {
            base = nullptr;
            return false;
        }
        uint32_t magic;
        memcpy(&magic, base, 4);
        if (magic != kSstMagic) return false;
        const uint8_t* f = base + size - 44;
        uint64_t index_off, n_index, bloom_off;
        memcpy(&index_off, f, 8);
        memcpy(&n_index, f + 8, 8);
        memcpy(&bloom_off, f + 16, 8);
        memcpy(&n_entries, f + 24, 8);
        memcpy(&max_seq, f + 32, 8);
        uint32_t magic2;
        memcpy(&magic2, f + 40, 4);
        if (magic2 != kSstMagic) return false;
        entries_end = index_off;
        // parse sparse index
        const uint8_t* p8 = base + index_off;
        index.reserve(n_index);
        for (uint64_t i = 0; i < n_index; i++) {
            uint64_t off;
            uint32_t klen;
            memcpy(&off, p8, 8);
            memcpy(&klen, p8 + 8, 4);
            p8 += 12;
            index.emplace_back(
                std::string_view((const char*)p8, klen), off);
            p8 += klen;
        }
        memcpy(&bloom_nbits, base + bloom_off, 8);
        bloom_bits = base + bloom_off + 8;
        return true;
#else
        (void)p;
        return false;
#endif
    }

    // decode the record at byte offset `off`; returns the next offset
    uint64_t read_at(uint64_t off, Record* r) const {
        uint32_t klen, vlen;
        memcpy(&klen, base + off, 4);
        memcpy(&vlen, base + off + 4, 4);
        memcpy(&r->seq, base + off + 8, 8);
        r->dead = base[off + 16] != 0;
        r->key = std::string_view((const char*)base + off + 17, klen);
        r->val = std::string_view((const char*)base + off + 17 + klen, vlen);
        return off + 17 + klen + vlen;
    }

    // offset of the first record with key >= target (entries_end if none)
    uint64_t seek(std::string_view target) const {
        // binary search the sparse index for the last key <= target
        size_t lo = 0, hi = index.size();
        while (lo < hi) {
            size_t mid = (lo + hi) / 2;
            if (index[mid].first <= target)
                lo = mid + 1;
            else
                hi = mid;
        }
        uint64_t off = lo ? index[lo - 1].second : 4;
        Record r;
        while (off < entries_end) {
            uint64_t next = read_at(off, &r);
            if (r.key >= target) return off;
            off = next;
        }
        return entries_end;
    }

    bool get(std::string_view key, Record* out) const {
        if (!bloom_may_contain(bloom_bits, bloom_nbits, key)) return false;
        uint64_t off = seek(key);
        if (off >= entries_end) return false;
        Record r;
        read_at(off, &r);
        if (r.key != key) return false;
        *out = r;
        return true;
    }
};

struct SstWriter {
    FILE* f = nullptr;
    std::string path, tmp;
    uint64_t off = 4;
    uint64_t n = 0, max_seq = 0;
    std::vector<std::pair<std::string, uint64_t>> index;
    BloomBuilder bloom;

    SstWriter(const std::string& p, size_t n_keys_hint)
        : path(p), tmp(p + ".tmp"), bloom(n_keys_hint) {
        f = fopen(tmp.c_str(), "wb");
        if (f) {
            uint32_t magic = kSstMagic;
            fwrite(&magic, 4, 1, f);
        }
    }

    void add(std::string_view k, std::string_view v, uint64_t seq, bool dead) {
        if (!f) return;
        if (n % kIndexStride == 0) index.emplace_back(std::string(k), off);
        uint32_t klen = (uint32_t)k.size(), vlen = (uint32_t)v.size();
        uint8_t d = dead ? 1 : 0;
        fwrite(&klen, 4, 1, f);
        fwrite(&vlen, 4, 1, f);
        fwrite(&seq, 8, 1, f);
        fwrite(&d, 1, 1, f);
        if (klen) fwrite(k.data(), 1, klen, f);
        if (vlen) fwrite(v.data(), 1, vlen, f);
        off += 17 + klen + vlen;
        if (seq > max_seq) max_seq = seq;
        bloom.add(k);
        n++;
    }

    bool finish() {
        if (!f) return false;
        uint64_t index_off = off;
        for (auto& [k, o] : index) {
            uint32_t klen = (uint32_t)k.size();
            fwrite(&o, 8, 1, f);
            fwrite(&klen, 4, 1, f);
            if (klen) fwrite(k.data(), 1, klen, f);
        }
        uint64_t bloom_off =
            index_off +
            [&] {
                uint64_t s = 0;
                for (auto& [k, o] : index) s += 12 + k.size();
                return s;
            }();
        fwrite(&bloom.nbits, 8, 1, f);
        fwrite(bloom.bits.data(), 1, bloom.bits.size(), f);
        uint64_t n_index = index.size();
        uint32_t magic = kSstMagic;
        fwrite(&index_off, 8, 1, f);
        fwrite(&n_index, 8, 1, f);
        fwrite(&bloom_off, 8, 1, f);
        fwrite(&n, 8, 1, f);
        fwrite(&max_seq, 8, 1, f);
        fwrite(&magic, 4, 1, f);
        if (fflush(f) != 0) return false;
#ifndef _WIN32
        fdatasync(fileno(f));
#endif
        fclose(f);
        f = nullptr;
        return rename(tmp.c_str(), path.c_str()) == 0;
    }
};

// ------------------------------------------------------------------- Db

struct Db {
    std::map<std::string, Entry> mem;
    std::vector<std::unique_ptr<Sst>> ssts;  // oldest first
    mutable std::shared_mutex mu;
    uint64_t seq = 0;
    uint64_t mem_bytes = 0;
    uint64_t flush_bytes = kDefaultFlushBytes;
    uint64_t next_sst_id = 0;
    uint64_t iter_epoch = 0;  // bumped whenever sources change shape
    int sync_mode = 1;
    std::string base_path;  // empty = pure in-memory (no WAL, no SSTs)
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

void mem_put(Db* db, const std::string& k, std::string v, bool dead) {
    db->seq++;
    auto it = db->mem.find(k);
    if (it != db->mem.end()) {
        db->mem_bytes -= it->second.value.size();
        it->second.value = std::move(v);
        it->second.mod_seq = db->seq;
        it->second.dead = dead;
        db->mem_bytes += it->second.value.size();
    } else {
        db->mem_bytes += k.size() + v.size() + 64;
        db->mem[k] = Entry{std::move(v), db->seq, dead};
    }
}

bool wal_replay(Db* db) {
    FILE* f = fopen(db->wal_path.c_str(), "rb");
    if (!f) return true;  // fresh database / clean shutdown
    for (;;) {
        uint8_t op;
        uint32_t klen, vlen;
        if (fread(&op, 1, 1, f) != 1) break;
        if (fread(&klen, 4, 1, f) != 1) break;
        if (fread(&vlen, 4, 1, f) != 1) break;
        std::string k(klen, '\0'), v(vlen, '\0');
        if (klen && fread(&k[0], 1, klen, f) != klen) break;
        if (vlen && fread(&v[0], 1, vlen, f) != vlen) break;
        // tombstones must persist in the memtable when SSTs exist below
        mem_put(db, k, std::move(v), op == 1);
    }
    fclose(f);
    return true;
}

std::string manifest_path(Db* db) { return db->base_path + ".manifest"; }

bool write_manifest(Db* db) {
    if (db->base_path.empty()) return true;
    std::string tmp = manifest_path(db) + ".tmp";
    FILE* f = fopen(tmp.c_str(), "wb");
    if (!f) return false;
    fprintf(f, "%llu\n", (unsigned long long)db->next_sst_id);
    for (auto& s : db->ssts) fprintf(f, "%s\n", s->path.c_str());
    fflush(f);
#ifndef _WIN32
    fdatasync(fileno(f));
#endif
    fclose(f);
    return rename(tmp.c_str(), manifest_path(db).c_str()) == 0;
}

bool load_manifest(Db* db) {
    FILE* f = fopen(manifest_path(db).c_str(), "rb");
    if (!f) return true;  // no SSTs yet
    char line[4096];
    if (fgets(line, sizeof line, f))
        db->next_sst_id = strtoull(line, nullptr, 10);
    while (fgets(line, sizeof line, f)) {
        size_t n = strlen(line);
        while (n && (line[n - 1] == '\n' || line[n - 1] == '\r')) line[--n] = 0;
        if (!n) continue;
        auto sst = std::make_unique<Sst>();
        if (sst->open(line)) {
            if (sst->max_seq > db->seq) db->seq = sst->max_seq;
            db->ssts.push_back(std::move(sst));
        }
    }
    fclose(f);
    return true;
}

// ---------------------------------------------------- merged point reads

// newest visible record for `key` across memtable + SSTs; false if the
// key was never written (callers check .dead for tombstones)
bool find_latest(Db* db, std::string_view key, Record* out,
                 std::string* backing) {
    auto it = db->mem.find(std::string(key));
    if (it != db->mem.end()) {
        out->key = key;
        out->val = it->second.value;
        out->seq = it->second.mod_seq;
        out->dead = it->second.dead;
        return true;
    }
    for (auto s = db->ssts.rbegin(); s != db->ssts.rend(); ++s) {
        if ((*s)->get(key, out)) return true;
    }
    (void)backing;
    return false;
}

// -------------------------------------------------------- merge cursors

struct SourceCursor {
    // source 0 = memtable (highest priority), 1.. = SSTs newest→oldest
    bool is_mem;
    std::map<std::string, Entry>::const_iterator mit, mend;
    const Sst* sst = nullptr;
    uint64_t off = 0;
    Record rec;
    bool valid = false;

    void load_sst() {
        if (off < sst->entries_end) {
            sst->read_at(off, &rec);
            valid = true;
        } else {
            valid = false;
        }
    }
    std::string_view key() const {
        return is_mem ? std::string_view(mit->first) : rec.key;
    }
    void advance() {
        if (is_mem) {
            ++mit;
            valid = mit != mend;
        } else {
            off = sst->read_at(off, &rec);
            load_sst();
        }
    }
};

struct Merged {
    std::vector<SourceCursor> cs;  // priority = position (0 wins ties)

    void init(Db* db, std::string_view lower) {
        cs.clear();
        SourceCursor m;
        m.is_mem = true;
        m.mit = db->mem.lower_bound(std::string(lower));
        m.mend = db->mem.end();
        m.valid = m.mit != m.mend;
        cs.push_back(m);
        for (auto s = db->ssts.rbegin(); s != db->ssts.rend(); ++s) {
            SourceCursor c;
            c.is_mem = false;
            c.sst = s->get();
            c.off = (*s)->seek(lower);
            c.load_sst();
            cs.push_back(c);
        }
    }

    // next record with key < upper in ascending order (duplicates resolved
    // by priority; advances past all versions of the returned key)
    bool next(std::string_view upper, Record* out, std::string* kbuf,
              std::string* vbuf) {
        for (;;) {
            int best = -1;
            for (size_t i = 0; i < cs.size(); i++) {
                if (!cs[i].valid) continue;
                if (best < 0 || cs[i].key() < cs[best].key()) best = (int)i;
            }
            if (best < 0) return false;
            std::string_view k = cs[best].key();
            if (k >= upper) return false;
            // capture the winning (highest-priority = lowest index) record
            *kbuf = std::string(k);
            bool dead;
            if (cs[best].is_mem) {
                dead = cs[best].mit->second.dead;
                *vbuf = cs[best].mit->second.value;
                out->seq = cs[best].mit->second.mod_seq;
            } else {
                dead = cs[best].rec.dead;
                *vbuf = std::string(cs[best].rec.val);
                out->seq = cs[best].rec.seq;
            }
            // advance every source sitting on this key
            for (auto& c : cs) {
                while (c.valid && c.key() == std::string_view(*kbuf)) c.advance();
            }
            if (dead) continue;  // shadowed delete: skip
            out->key = *kbuf;
            out->val = *vbuf;
            out->dead = false;
            return true;
        }
    }
};

// ------------------------------------------------------- flush & compact

bool flush_memtable(Db* db) {  // caller holds unique lock
    if (db->base_path.empty() || db->mem.empty()) return true;
    std::string p = db->base_path + ".sst." + std::to_string(db->next_sst_id++);
    SstWriter w(p, db->mem.size());
    for (auto& [k, e] : db->mem) w.add(k, e.value, e.mod_seq, e.dead);
    if (!w.finish()) return false;
    auto sst = std::make_unique<Sst>();
    if (!sst->open(p)) return false;
    db->ssts.push_back(std::move(sst));
    if (!write_manifest(db)) return false;
    db->mem.clear();
    db->mem_bytes = 0;
    // truncate the WAL: its contents are durable in the SST now
    if (db->wal) fclose(db->wal);
    db->wal = fopen(db->wal_path.c_str(), "wb");
    db->iter_epoch++;
    return db->wal != nullptr;
}

// merge all SSTs into one; keep_tombstones preserves delete conflict
// seqs (auto-compaction), dropping them is reserved for explicit compact
bool compact_ssts(Db* db, bool keep_tombstones) {  // caller holds unique lock
    if (db->ssts.size() < 2 && keep_tombstones) return true;
    if (db->ssts.empty()) return true;
    std::string p = db->base_path + ".sst." + std::to_string(db->next_sst_id++);
    uint64_t hint = 0;
    for (auto& s : db->ssts) hint += s->n_entries;
    SstWriter w(p, (size_t)hint);
    // merge SSTs only (memtable keeps shadowing them)
    std::vector<SourceCursor> cs;
    for (auto s = db->ssts.rbegin(); s != db->ssts.rend(); ++s) {
        SourceCursor c;
        c.is_mem = false;
        c.sst = s->get();
        c.off = 4;
        c.load_sst();
        cs.push_back(c);
    }
    for (;;) {
        int best = -1;
        for (size_t i = 0; i < cs.size(); i++) {
            if (!cs[i].valid) continue;
            if (best < 0 || cs[i].key() < cs[best].key()) best = (int)i;
        }
        if (best < 0) break;
        std::string k(cs[best].key());
        Record winner = cs[best].rec;
        for (auto& c : cs)
            while (c.valid && c.key() == std::string_view(k)) c.advance();
        if (winner.dead && !keep_tombstones) continue;
        w.add(k, winner.val, winner.seq, winner.dead);
    }
    if (!w.finish()) return false;
    auto sst = std::make_unique<Sst>();
    if (!sst->open(p)) return false;
    std::vector<std::string> old_paths;
    for (auto& s : db->ssts) old_paths.push_back(s->path);
    db->ssts.clear();
    db->ssts.push_back(std::move(sst));
    if (!write_manifest(db)) return false;
    for (auto& op : old_paths) remove(op.c_str());
    db->iter_epoch++;
    return true;
}

void maybe_flush(Db* db) {  // caller holds unique lock
    if (db->base_path.empty()) return;
    if (db->mem_bytes <= db->flush_bytes) return;
    flush_memtable(db);
    if (db->ssts.size() > kMaxSsts) compact_ssts(db, /*keep_tombstones=*/true);
}

// ---------------------------------------------------------------- iters

struct Iter {
    Db* db;
    std::string lower, upper, last;
    bool reverse;
    bool started = false;
    Merged merged;           // forward scans: incremental merged cursors
    bool merged_live = false;
    uint64_t epoch = 0;
    std::string cur_k, cur_v;
};

}  // namespace

extern "C" {

void* tkv_open(const char* path) {
    auto* db = new Db();
    if (path && path[0]) {
        db->base_path = path;
        db->wal_path = path;
        if (!load_manifest(db)) {
            delete db;
            return nullptr;
        }
        wal_replay(db);
        db->wal = fopen(db->wal_path.c_str(), "ab");
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

void tkv_set_flush_bytes(void* h, uint64_t n) {
    auto* db = static_cast<Db*>(h);
    std::unique_lock lk(db->mu);
    db->flush_bytes = n;
}

// force a memtable flush (tests / shutdown hooks)
int tkv_flush(void* h) {
    auto* db = static_cast<Db*>(h);
    std::unique_lock lk(db->mu);
    return flush_memtable(db) ? 0 : 2;
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
    Record r;
    std::string backing;
    if (!find_latest(db, std::string_view(k, klen), &r, &backing) || r.dead)
        return 0;
    *vlen = r.val.size();
    *v = static_cast<char*>(malloc(*vlen ? *vlen : 1));
    memcpy(*v, r.val.data(), *vlen);
    if (mod_seq) *mod_seq = r.seq;
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

static int iter_next_fwd(Iter* it, Db* db, const char** k, size_t* klen,
                         const char** v, size_t* vlen) {
    if (!it->merged_live || it->epoch != db->iter_epoch) {
        std::string from =
            it->started ? it->last + std::string(1, '\0') : it->lower;
        it->merged.init(db, from);
        it->merged_live = true;
        it->epoch = db->iter_epoch;
    }
    Record r;
    if (!it->merged.next(it->upper, &r, &it->cur_k, &it->cur_v)) return 0;
    it->started = true;
    it->last = it->cur_k;
    *k = it->cur_k.data();
    *klen = it->cur_k.size();
    *v = it->cur_v.data();
    *vlen = it->cur_v.size();
    return 1;
}

// reverse scans: per-source backward cursors.  The memtable walks its
// map backward; each SST walks its 16-entry index blocks backward,
// decoding one block at a time (records have no back-pointers).
static int iter_next_rev(Iter* it, Db* db, const char** k, size_t* klen,
                         const char** v, size_t* vlen) {
    std::string hi = it->started ? it->last : it->upper;  // exclusive upper
    const std::string& lo = it->lower;
    for (;;) {
        bool have = false;
        std::string bk, bv;
        uint64_t bseq = 0;
        bool bdead = false;
        int bprio = 1 << 30;
        // memtable: largest key < hi
        {
            auto mit = db->mem.lower_bound(hi);
            if (mit != db->mem.begin()) {
                --mit;
                if (mit->first >= lo) {
                    bk = mit->first;
                    bv = mit->second.value;
                    bseq = mit->second.mod_seq;
                    bdead = mit->second.dead;
                    bprio = 0;
                    have = true;
                }
            }
        }
        // SSTs newest→oldest: largest key < hi within each, block-decoded
        int prio = 1;
        for (auto s = db->ssts.rbegin(); s != db->ssts.rend(); ++s, ++prio) {
            const Sst* sst = s->get();
            // last index block whose first key < hi
            size_t blo = 0, bhi = sst->index.size();
            while (blo < bhi) {
                size_t mid = (blo + bhi) / 2;
                if (sst->index[mid].first < std::string_view(hi))
                    blo = mid + 1;
                else
                    bhi = mid;
            }
            // candidate blocks: blo-1 (contains keys < hi), and if it
            // yields nothing ≥ lo we stop (earlier blocks are smaller)
            Record found;
            bool got = false;
            for (size_t bi = blo; bi-- > 0;) {
                uint64_t off = sst->index[bi].second;
                uint64_t end = (bi + 1 < sst->index.size())
                                   ? sst->index[bi + 1].second
                                   : sst->entries_end;
                Record r;
                while (off < end) {
                    off = sst->read_at(off, &r);
                    if (r.key >= std::string_view(hi)) break;
                    found = r;
                    got = true;
                }
                if (got) break;  // largest key < hi in this SST
            }
            if (got && found.key >= std::string_view(lo)) {
                std::string fk(found.key);
                if (!have || fk > bk) {
                    bk = fk;
                    bv = std::string(found.val);
                    bseq = found.seq;
                    bdead = found.dead;
                    bprio = prio;
                    have = true;
                } else if (fk == bk && prio < bprio) {
                    bv = std::string(found.val);
                    bseq = found.seq;
                    bdead = found.dead;
                    bprio = prio;
                }
            }
        }
        if (!have) return 0;
        it->started = true;
        it->last = bk;
        if (bdead) {  // shadowed delete: continue below it
            hi = bk;
            continue;
        }
        it->cur_k = bk;
        it->cur_v = bv;
        *k = it->cur_k.data();
        *klen = it->cur_k.size();
        *v = it->cur_v.data();
        *vlen = it->cur_v.size();
        return 1;
    }
}

int tkv_iter_next(void* hi, const char** k, size_t* klen, const char** v,
                  size_t* vlen) {
    auto* it = static_cast<Iter*>(hi);
    Db* db = it->db;
    std::shared_lock lk(db->mu);
    if (!it->reverse) return iter_next_fwd(it, db, k, klen, v, vlen);
    return iter_next_rev(it, db, k, klen, v, vlen);
}

void tkv_iter_close(void* hi) { delete static_cast<Iter*>(hi); }

uint64_t tkv_count(void* h, const char* lo, size_t lo_len, const char* hi,
                   size_t hi_len) {
    auto* db = static_cast<Db*>(h);
    std::shared_lock lk(db->mu);
    Merged m;
    m.init(db, std::string_view(lo, lo_len));
    std::string upper(hi, hi_len), kb, vb;
    Record r;
    uint64_t n = 0;
    while (m.next(upper, &r, &kb, &vb)) n++;
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
        Record r;
        std::string backing;
        // tombstones keep mod_seq, so delete-after-snapshot conflicts
        // are detected exactly like overwrite conflicts
        if (find_latest(db, std::string_view(rkeys[i], rlens[i]), &r,
                        &backing) &&
            r.seq > snapshot_seq)
            return 1;
    }
    for (size_t i = 0; i < n_ops; i++) {
        std::string k(okeys[i], oklens[i]);
        if (ovlens[i] == SIZE_MAX) {
            if (!wal_append(db, 1, k, std::string())) return 2;
            mem_put(db, k, std::string(), true);
        } else {
            std::string v(ovals[i], ovlens[i]);
            if (!wal_append(db, 0, k, v)) return 2;
            mem_put(db, k, std::move(v), false);
        }
    }
    wal_flush(db);
    maybe_flush(db);
    return 0;
}

void tkv_del_range(void* h, const char* lo, size_t lo_len, const char* hi,
                   size_t hi_len) {
    auto* db = static_cast<Db*>(h);
    std::unique_lock lk(db->mu);
    Merged m;
    m.init(db, std::string_view(lo, lo_len));
    std::string upper(hi, hi_len), kb, vb;
    Record r;
    std::vector<std::string> keys;
    while (m.next(upper, &r, &kb, &vb)) keys.push_back(kb);
    for (const auto& k : keys) {
        wal_append(db, 1, k, std::string());
        mem_put(db, k, std::string(), true);
    }
    wal_flush(db);
    maybe_flush(db);
}

// Explicit compaction: fold the memtable + every SST into one SST with
// tombstones dropped, and truncate the WAL.  (Open snapshots lose
// delete-conflict seqs for dropped tombstones — ::compact is a
// user-initiated maintenance op, same caveat as the reference's
// range_compact.)
int tkv_compact(void* h) {
    auto* db = static_cast<Db*>(h);
    std::unique_lock lk(db->mu);
    if (db->base_path.empty()) {
        // pure in-memory: just erase tombstones
        for (auto it = db->mem.begin(); it != db->mem.end();) {
            if (it->second.dead)
                it = db->mem.erase(it);
            else
                ++it;
        }
        db->iter_epoch++;
        return 0;
    }
    if (!flush_memtable(db)) return 2;
    if (!compact_ssts(db, /*keep_tombstones=*/false)) return 2;
    return 0;
}

uint64_t tkv_len(void* h) {
    auto* db = static_cast<Db*>(h);
    std::shared_lock lk(db->mu);
    uint64_t n = 0;
    Merged m;
    m.init(db, std::string_view("", 0));
    std::string upper(1, '\xff');
    // count to the real end: use a max key of 64 0xff bytes (keys are
    // memcmp encodings with an 8-byte relation prefix, never above this)
    upper.assign(64, '\xff');
    std::string kb, vb;
    Record r;
    while (m.next(upper, &r, &kb, &vb)) n++;
    return n;
}

}  // extern "C"