/* N-API addon binding libcozo_c for NodeJS — the cozo_tpu analog of the
 * reference's Neon bindings (cozo-lib-nodejs/src/lib.rs:282-731), built
 * on the C ABI instead of linking the engine directly.
 *
 * Build: `node-gyp rebuild` (see binding.gyp). Requires libcozo_c.so on
 * the linker path (build it with
 * `g++ -O2 -std=c++17 -shared -fPIC -o libcozo_c.so native/cozo_c.cpp`).
 */
#include <node_api.h>
#include <stdlib.h>
#include <string.h>

#include "../../native/cozo_c.h"

static char* get_string(napi_env env, napi_value v) {
    size_t len = 0;
    napi_get_value_string_utf8(env, v, NULL, 0, &len);
    char* buf = malloc(len + 1);
    napi_get_value_string_utf8(env, v, buf, len + 1, &len);
    return buf;
}

static napi_value take_string(napi_env env, char* s) {
    napi_value out;
    napi_create_string_utf8(env, s ? s : "null", NAPI_AUTO_LENGTH, &out);
    if (s) cozo_free_str(s);
    return out;
}

/* openDb(engine, path) -> db id (throws on failure) */
static napi_value OpenDb(napi_env env, napi_callback_info info) {
    size_t argc = 2;
    napi_value args[2];
    napi_get_cb_info(env, info, &argc, args, NULL, NULL);
    char* engine = get_string(env, args[0]);
    char* path = get_string(env, args[1]);
    int32_t id = -1;
    char* err = cozo_open_db(engine, path, "", &id);
    free(engine);
    free(path);
    if (err) {
        napi_throw_error(env, NULL, err);
        cozo_free_str(err);
        return NULL;
    }
    napi_value out;
    napi_create_int32(env, id, &out);
    return out;
}

/* closeDb(id) -> bool */
static napi_value CloseDb(napi_env env, napi_callback_info info) {
    size_t argc = 1;
    napi_value args[1];
    napi_get_cb_info(env, info, &argc, args, NULL, NULL);
    int32_t id;
    napi_get_value_int32(env, args[0], &id);
    napi_value out;
    napi_get_boolean(env, cozo_close_db(id), &out);
    return out;
}

/* runQuery(id, script, paramsJson, immutable) -> result JSON string */
static napi_value RunQuery(napi_env env, napi_callback_info info) {
    size_t argc = 4;
    napi_value args[4];
    napi_get_cb_info(env, info, &argc, args, NULL, NULL);
    int32_t id;
    bool immutable = false;
    napi_get_value_int32(env, args[0], &id);
    char* script = get_string(env, args[1]);
    char* params = get_string(env, args[2]);
    if (argc > 3) napi_get_value_bool(env, args[3], &immutable);
    char* res = cozo_run_query(id, script, params, immutable);
    free(script);
    free(params);
    return take_string(env, res);
}

#define STR_METHOD(NAME, FN)                                              \
    static napi_value NAME(napi_env env, napi_callback_info info) {       \
        size_t argc = 2;                                                  \
        napi_value args[2];                                               \
        napi_get_cb_info(env, info, &argc, args, NULL, NULL);             \
        int32_t id;                                                       \
        napi_get_value_int32(env, args[0], &id);                          \
        char* payload = get_string(env, args[1]);                         \
        char* res = FN(id, payload);                                      \
        free(payload);                                                    \
        return take_string(env, res);                                     \
    }

STR_METHOD(ImportRelations, cozo_import_relations)
STR_METHOD(ExportRelations, cozo_export_relations)
STR_METHOD(Backup, cozo_backup)
STR_METHOD(Restore, cozo_restore)
STR_METHOD(ImportFromBackup, cozo_import_from_backup)

static napi_value Init(napi_env env, napi_value exports) {
    napi_property_descriptor props[] = {
        {"openDb", NULL, OpenDb, NULL, NULL, NULL, napi_default, NULL},
        {"closeDb", NULL, CloseDb, NULL, NULL, NULL, napi_default, NULL},
        {"runQuery", NULL, RunQuery, NULL, NULL, NULL, napi_default, NULL},
        {"importRelations", NULL, ImportRelations, NULL, NULL, NULL,
         napi_default, NULL},
        {"exportRelations", NULL, ExportRelations, NULL, NULL, NULL,
         napi_default, NULL},
        {"backup", NULL, Backup, NULL, NULL, NULL, napi_default, NULL},
        {"restore", NULL, Restore, NULL, NULL, NULL, napi_default, NULL},
        {"importFromBackup", NULL, ImportFromBackup, NULL, NULL, NULL,
         napi_default, NULL},
    };
    napi_define_properties(env, exports, sizeof(props) / sizeof(*props),
                           props);
    return exports;
}

NAPI_MODULE(NODE_GYP_MODULE_NAME, Init)
