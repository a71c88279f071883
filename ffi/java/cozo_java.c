/* JNI shim exporting the reference's org.cozodb.CozoJavaBridge natives
 * (cozo-lib-java/src/lib.rs:38-166) over the cozo_tpu C ABI.
 *
 * Build (host with a JDK):
 *   gcc -O2 -shared -fPIC -I$JAVA_HOME/include -I$JAVA_HOME/include/linux \
 *       -I../../native -L../../native -lcozo_c -o libcozo_java.so cozo_java.c
 */
#include <jni.h>
#include <stdlib.h>

#include "../../native/cozo_c.h"

static jstring take(JNIEnv* env, char* s) {
    jstring out = (*env)->NewStringUTF(env, s ? s : "null");
    if (s) cozo_free_str(s);
    return out;
}

JNIEXPORT jint JNICALL Java_org_cozodb_CozoJavaBridge_openDb(
    JNIEnv* env, jclass cls, jstring engine, jstring path) {
    const char* e = (*env)->GetStringUTFChars(env, engine, NULL);
    const char* p = (*env)->GetStringUTFChars(env, path, NULL);
    int32_t id = -1;
    char* err = cozo_open_db(e, p, "", &id);
    (*env)->ReleaseStringUTFChars(env, engine, e);
    (*env)->ReleaseStringUTFChars(env, path, p);
    if (err) {
        cozo_free_str(err);
        return -1;
    }
    return id;
}

JNIEXPORT jboolean JNICALL Java_org_cozodb_CozoJavaBridge_closeDb(
    JNIEnv* env, jclass cls, jint id) {
    return cozo_close_db(id);
}

JNIEXPORT jstring JNICALL Java_org_cozodb_CozoJavaBridge_runQuery(
    JNIEnv* env, jclass cls, jint id, jstring script, jstring params) {
    const char* s = (*env)->GetStringUTFChars(env, script, NULL);
    const char* p = (*env)->GetStringUTFChars(env, params, NULL);
    char* res = cozo_run_query(id, s, p, false);
    (*env)->ReleaseStringUTFChars(env, script, s);
    (*env)->ReleaseStringUTFChars(env, params, p);
    return take(env, res);
}

#define STR_NATIVE(JNAME, CFN)                                              \
    JNIEXPORT jstring JNICALL Java_org_cozodb_CozoJavaBridge_##JNAME(       \
        JNIEnv* env, jclass cls, jint id, jstring payload) {                \
        const char* pl = (*env)->GetStringUTFChars(env, payload, NULL);     \
        char* res = CFN(id, pl);                                            \
        (*env)->ReleaseStringUTFChars(env, payload, pl);                    \
        return take(env, res);                                              \
    }

STR_NATIVE(exportRelations, cozo_export_relations)
STR_NATIVE(importRelations, cozo_import_relations)
STR_NATIVE(backup, cozo_backup)
STR_NATIVE(restore, cozo_restore)
STR_NATIVE(importFromBackup, cozo_import_from_backup)
