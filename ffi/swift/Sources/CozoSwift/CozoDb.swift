// CozoDb for Swift over the cozo_tpu C ABI (reference analog:
// cozo-lib-swift/src/lib.rs — C-style shims + Swift wrapper).
import CCozo
import Foundation

public enum CozoError: Error {
    case open(String)
    case query(String)
}

public final class CozoDb {
    private let id: Int32

    public init(engine: String = "mem", path: String = "") throws {
        var dbId: Int32 = -1
        if let err = cozo_open_db(engine, path, "", &dbId) {
            let msg = String(cString: err)
            cozo_free_str(err)
            throw CozoError.open(msg)
        }
        self.id = dbId
    }

    deinit {
        _ = cozo_close_db(id)
    }

    /// Runs a CozoScript; returns the raw result JSON string.
    public func run(_ script: String, params: String = "{}",
                    immutable: Bool = false) -> String {
        guard let res = cozo_run_query(id, script, params, immutable) else {
            return "{\"ok\": false, \"message\": \"null result\"}"
        }
        defer { cozo_free_str(res) }
        return String(cString: res)
    }

    public func backup(to path: String) -> String {
        guard let res = cozo_backup(id, path) else { return "null" }
        defer { cozo_free_str(res) }
        return String(cString: res)
    }

    public func restore(from path: String) -> String {
        guard let res = cozo_restore(id, path) else { return "null" }
        defer { cozo_free_str(res) }
        return String(cString: res)
    }
}
