#include <stdio.h>
#include <string.h>
#include "cozo_c.h"

int main() {
    int32_t id = -1;
    char* err = cozo_open_db("mem", "", "", &id);
    if (err) { printf("open error: %s\n", err); return 1; }
    printf("opened db %d\n", id);
    char* r = cozo_run_query(id, ":create kv {k: Int => v: Int}", "{}", false);
    printf("create: %.60s\n", r); cozo_free_str(r);
    r = cozo_run_query(id, "?[k, v] <- [[1, 10], [2, 20]] :put kv {k => v}", "{}", false);
    printf("put: %.60s\n", r); cozo_free_str(r);
    r = cozo_run_query(id, "?[v] := *kv{k: $k, v}", "{\"k\": 2}", false);
    printf("query: %s\n", r);
    int ok = strstr(r, "[[20]]") != NULL;
    cozo_free_str(r);
    r = cozo_export_relations(id, "{\"relations\": [\"kv\"]}");
    printf("export: %.80s\n", r); cozo_free_str(r);
    r = cozo_backup(id, "/tmp/vr2/cback.db");
    printf("backup: %s\n", r); cozo_free_str(r);
    /* error path: bad script */
    r = cozo_run_query(id, "?[x] := nonsense(", "{}", false);
    printf("bad script ok=false: %d\n", strstr(r, "\"ok\": false") != NULL || strstr(r, "\"ok\":false") != NULL);
    cozo_free_str(r);
    if (!cozo_close_db(id)) { printf("close failed\n"); return 1; }
    printf(ok ? "C_ABI_OK\n" : "C_ABI_BAD\n");
    return ok ? 0 : 1;
}
