"""cozo_tpu — a TPU-native embeddable relational-graph-vector database.

Feature-compatible rebuild of CozoDB (CozoScript Datalog, stored
relations, HNSW/FTS/MinHash-LSH indexes, graph fixed rules) with the
compute core (vector search, whole-graph algorithms, minhashing) running
on TPU via JAX/Pallas, and the Datalog planner/storage on the host.

Public embedding API mirrors the reference `DbInstance` (`lib.rs:106`):

    from cozo_tpu import Db
    db = Db("mem")
    db.run_script("?[a] <- [[1], [2]]")
"""

from .runtime.db import Db, MultiTransaction, NamedRows
from .fixed_rule import SimpleFixedRule
from .utils.errors import CozoError

__version__ = "0.1.0"

__all__ = [
    "Db",
    "DbInstance",
    "MultiTransaction",
    "NamedRows",
    "SimpleFixedRule",
    "CozoError",
    "open_db",
]

# alias matching the reference naming
DbInstance = Db


def open_db(engine: str = "mem", path: str = "") -> Db:
    return Db(engine, path)
