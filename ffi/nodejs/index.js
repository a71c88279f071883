// CozoDb for NodeJS over the cozo_tpu C ABI — same API shape as the
// reference's cozo-node package (cozo-lib-nodejs/lib/index.js).
"use strict";
const addon = require("./build/Release/cozo_node.node");

class CozoDb {
  /** @param {string} engine mem|sqlite|tkv  @param {string} path */
  constructor(engine = "mem", path = "") {
    this.id = addon.openDb(engine, path);
  }
  close() {
    return addon.closeDb(this.id);
  }
  /** Runs a CozoScript; resolves rows or rejects with the error object. */
  run(script, params = {}, immutable = false) {
    return new Promise((resolve, reject) => {
      const res = JSON.parse(
        addon.runQuery(this.id, script, JSON.stringify(params), immutable)
      );
      if (res.ok) resolve(res);
      else reject(res);
    });
  }
  exportRelations(relations) {
    return JSON.parse(
      addon.exportRelations(this.id, JSON.stringify({ relations }))
    );
  }
  importRelations(data) {
    return JSON.parse(addon.importRelations(this.id, JSON.stringify(data)));
  }
  backup(path) {
    return JSON.parse(addon.backup(this.id, path));
  }
  restore(path) {
    return JSON.parse(addon.restore(this.id, path));
  }
  importRelationsFromBackup(path, relations) {
    return JSON.parse(
      addon.importFromBackup(this.id, JSON.stringify({ path, relations }))
    );
  }
}

module.exports = { CozoDb };
