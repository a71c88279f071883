"""KV server CLI: serve a local storage engine to `remote`-engine Dbs.

The distributed-storage deployment story (reference `tikv` engine,
`/root/reference/cozo-core/src/storage/tikv.rs:28`): N embedding
processes open ``Db("remote", "host:port")`` against one shared server.

    python -m cozo_tpu.hosts.kvserver --engine tkv --path /data/kv \
        --host 0.0.0.0 --port 9070
"""

from __future__ import annotations

import argparse


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--engine", default="mem", choices=["mem", "sqlite", "tkv", "plog"]
    )
    ap.add_argument("--path", default="")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=9070)
    args = ap.parse_args(argv)

    if args.engine == "mem":
        from ..storage.mem import MemStorage

        storage = MemStorage()
    elif args.engine == "sqlite":
        from ..storage.sqlite import SqliteStorage

        storage = SqliteStorage(args.path)
    elif args.engine == "plog":
        from ..storage.plog import PlogStorage

        storage = PlogStorage(args.path)
    else:
        from ..storage.tkv import TkvStorage

        storage = TkvStorage(args.path)

    from ..storage.remote import KvServer

    srv = KvServer(storage, args.host, args.port)
    print(f"cozo_tpu kv server ({args.engine}) on {srv.addr[0]}:{srv.addr[1]}")
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        srv.shutdown()


if __name__ == "__main__":
    main()
