"""String-in/string-out shim consumed by the C ABI host
(`native/cozo_c.cpp`, the analog of `cozo-lib-c/src/lib.rs:44-323`).

Every function takes/returns UTF-8 JSON strings so the C side stays a
thin CPython-embedding layer with no object marshalling."""

from __future__ import annotations

import json
from typing import Dict

from ..runtime.db import Db
from ..utils.errors import CozoError

_DBS: Dict[int, Db] = {}
_NEXT_ID = 0


def open_db(engine: str, path: str, _options: str = "") -> str:
    """Returns {"ok": true, "id": N} or {"ok": false, "message": ...}."""
    global _NEXT_ID
    try:
        db = Db(engine, path)
    except Exception as e:  # noqa: BLE001
        return json.dumps({"ok": False, "message": str(e)})
    _NEXT_ID += 1
    _DBS[_NEXT_ID] = db
    return json.dumps({"ok": True, "id": _NEXT_ID})


def close_db(db_id: int) -> bool:
    db = _DBS.pop(db_id, None)
    if db is None:
        return False
    try:
        db.close()
    except Exception:  # noqa: BLE001
        pass
    return True


def _get(db_id: int) -> Db:
    db = _DBS.get(db_id)
    if db is None:
        raise CozoError(f"database {db_id} is not open")
    return db


def run_query(db_id: int, script: str, params_json: str, immutable: bool) -> str:
    try:
        db = _get(db_id)
    except CozoError as e:
        return json.dumps({"ok": False, "message": str(e)})
    if immutable:
        try:
            params = json.loads(params_json) if params_json else {}
            res = db.run_script(script, params, immutable=True)
            d = res.to_dict()
            d["ok"] = True
            return json.dumps(d)
        except CozoError as e:
            return json.dumps(
                {"ok": False, "message": e.message, "code": e.code}
            )
        except Exception as e:  # noqa: BLE001
            return json.dumps({"ok": False, "message": str(e)})
    return db.run_script_json(script, params_json or "{}")


def export_relations(db_id: int, payload_json: str) -> str:
    try:
        db = _get(db_id)
        rels = json.loads(payload_json).get("relations", [])
        data = db.export_relations(rels)
        return json.dumps({"ok": True, "data": data})
    except Exception as e:  # noqa: BLE001
        return json.dumps({"ok": False, "message": str(e)})


def import_relations(db_id: int, payload_json: str) -> str:
    try:
        db = _get(db_id)
        db.import_relations(json.loads(payload_json))
        return json.dumps({"ok": True})
    except Exception as e:  # noqa: BLE001
        return json.dumps({"ok": False, "message": str(e)})


def backup(db_id: int, out_path: str) -> str:
    try:
        _get(db_id).backup_db(out_path)
        return json.dumps({"ok": True})
    except Exception as e:  # noqa: BLE001
        return json.dumps({"ok": False, "message": str(e)})


def restore(db_id: int, in_path: str) -> str:
    try:
        _get(db_id).restore_backup(in_path)
        return json.dumps({"ok": True})
    except Exception as e:  # noqa: BLE001
        return json.dumps({"ok": False, "message": str(e)})


def import_from_backup(db_id: int, payload_json: str) -> str:
    try:
        p = json.loads(payload_json)
        _get(db_id).import_from_backup(p["path"], p.get("relations", []))
        return json.dumps({"ok": True})
    except Exception as e:  # noqa: BLE001
        return json.dumps({"ok": False, "message": str(e)})
