"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship parse/extract pipeline; ``queries()``
exposes one callable per implemented operator/pipeline from SURVEY §2
(+ the added training-data ops); ``oracle_sql()`` gives the DuckDB
equivalent for every SQL-expressible entry.

Ray is initialised by the driver BEFORE this module is imported; no
ray.init/shutdown here or below (commoncrawl_ray never owns a session).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001-scale input: the
    synthetic pages universe -> parse/extract docs (byte-identical text
    invariant). Returns a ray.data.Dataset."""
    from commoncrawl_ray.pipelines.queries import q_parse_extract

    return q_parse_extract("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from commoncrawl_ray.pipelines.queries import REGISTRY

    return {name: fn for name, (fn, _sql) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    from commoncrawl_ray.pipelines.queries import REGISTRY, ensure_oracle_tables

    # the crawl_log / crawl_host_stats / simhash_docs /
    # minhash_lsh_dedup oracles hash-check against single-process
    # oracle tables; materialize them here (pure Python, a few seconds)
    # so the read_parquet() in the SQL always resolves no matter which
    # side the driver runs first
    ensure_oracle_tables()
    return {name: sql for name, (_fn, sql) in REGISTRY.items() if sql is not None}
