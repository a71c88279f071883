package org.cozodb;

/** Raw natives — same signatures as the reference's bridge class
 *  (cozo-lib-java). Load libcozo_java.so before use. */
public class CozoJavaBridge {
    static {
        System.loadLibrary("cozo_java");
    }

    public static native int openDb(String engine, String path);
    public static native boolean closeDb(int id);
    public static native String runQuery(int id, String script, String params);
    public static native String exportRelations(int id, String payload);
    public static native String importRelations(int id, String payload);
    public static native String backup(int id, String path);
    public static native String restore(int id, String path);
    public static native String importFromBackup(int id, String payload);
}
