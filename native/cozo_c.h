/* cozo_c.h — C ABI for cozo_tpu (mirrors the reference's cozo_c.h,
 * cozo-lib-c).  All returned char* are malloc'd JSON strings the caller
 * must release with cozo_free_str; cozo_open_db returns NULL on success
 * and an error JSON otherwise. */
#ifndef COZO_C_H
#define COZO_C_H

#include <stdbool.h>
#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

char* cozo_open_db(const char* engine, const char* path, const char* options,
                   int32_t* db_id);
bool cozo_close_db(int32_t id);
char* cozo_run_query(int32_t id, const char* script, const char* params_json,
                     bool immutable);
char* cozo_import_relations(int32_t id, const char* json_payload);
char* cozo_export_relations(int32_t id, const char* json_payload);
char* cozo_backup(int32_t id, const char* out_path);
char* cozo_restore(int32_t id, const char* in_path);
char* cozo_import_from_backup(int32_t id, const char* json_payload);
void cozo_free_str(char* s);

#ifdef __cplusplus
}
#endif

#endif /* COZO_C_H */
