package org.cozodb;

/** Minimal convenience wrapper: scripts in, JSON strings out. */
public class CozoDb implements AutoCloseable {
    private final int id;

    public CozoDb(String engine, String path) {
        this.id = CozoJavaBridge.openDb(engine, path);
        if (this.id < 0) {
            throw new RuntimeException("cannot open cozo database");
        }
    }

    public CozoDb() {
        this("mem", "");
    }

    /** @return result JSON ({"ok": true, "headers": [...], "rows": [...]}) */
    public String run(String script) {
        return CozoJavaBridge.runQuery(id, script, "{}");
    }

    public String run(String script, String paramsJson) {
        return CozoJavaBridge.runQuery(id, script, paramsJson);
    }

    public String exportRelations(String payloadJson) {
        return CozoJavaBridge.exportRelations(id, payloadJson);
    }

    public String importRelations(String payloadJson) {
        return CozoJavaBridge.importRelations(id, payloadJson);
    }

    public String backup(String path) {
        return CozoJavaBridge.backup(id, path);
    }

    public String restore(String path) {
        return CozoJavaBridge.restore(id, path);
    }

    @Override
    public void close() {
        CozoJavaBridge.closeDb(id);
    }
}
