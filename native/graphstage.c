/* One-pass stable counting sort of CSR edges by destination.
 *
 * PageRank and the sliced-ELL SSSP kernel both stage edges grouped by
 * destination before device upload (cozo_tpu/ops/graph_algos.py).  The
 * numpy staging costs ~35s single-core at 69M edges (np.repeat of the
 * CSR sources + np.argsort(kind="stable") + two fancy-index permutes);
 * this replaces all of it with one O(E) histogram pass + one O(E)
 * scatter pass.  Stability matches numpy's stable argsort: edges keep
 * CSR order (ascending row, ascending position) within a destination.
 *
 * Reference parity anchor: the reference stages nothing (its Dijkstra /
 * PageRank run pointer-chasing on the CPU, shortest_path_dijkstra.rs:432,
 * pagerank.rs) — this staging cost is TPU-specific and must not dominate
 * the device win.
 */
#include <stdint.h>
#include <stdlib.h>
#include <string.h>

/* indptr: [n+1] int64 CSR row pointers
 * dst:    [e]   int32 destination per edge (values < n_slots)
 * src_out:   [e] int32 — source of each edge, in dst-grouped stable order
 * order_out: [e] int64 — original edge index per output slot (so callers
 *                        can permute parallel arrays, e.g. weights)
 * deg_out:   [n_slots] int64 — in-degree histogram (bincount of dst)
 * returns 0 on success, -1 on allocation failure */
int stage_by_dst(const int64_t *indptr, const int32_t *dst,
                 int64_t n, int64_t e, int64_t n_slots,
                 int32_t *src_out, int64_t *order_out, int64_t *deg_out) {
    int64_t *cur = (int64_t *)malloc((size_t)n_slots * sizeof(int64_t));
    if (!cur) return -1;
    memset(deg_out, 0, (size_t)n_slots * sizeof(int64_t));
    for (int64_t i = 0; i < e; i++) {
        /* corrupt input must not become a silent OOB heap write (the
         * numpy fallback would raise); callers treat rc!=0 as fallback */
        if (dst[i] < 0 || dst[i] >= n_slots) { free(cur); return -1; }
        deg_out[dst[i]]++;
    }
    int64_t acc = 0;
    for (int64_t s = 0; s < n_slots; s++) {
        cur[s] = acc;
        acc += deg_out[s];
    }
    for (int64_t r = 0; r < n; r++) {
        const int64_t hi = indptr[r + 1];
        for (int64_t i = indptr[r]; i < hi; i++) {
            const int64_t p = cur[dst[i]]++;
            src_out[p] = (int32_t)r;
            order_out[p] = i;
        }
    }
    free(cur);
    return 0;
}

/* Gather float32 by int64 index: w_out[i] = w[order[i]].  One tight pass
 * (numpy's w[order] allocates + bounds-checks; this is the staging hot
 * loop's only other O(E) host cost). */
void gather_f32(const float *w, const int64_t *order, int64_t e,
                float *w_out) {
    for (int64_t i = 0; i < e; i++) w_out[i] = w[order[i]];
}
