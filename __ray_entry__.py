"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing here
calls ray.init()/ray.shutdown(). See parquet_go_ray/pipelines/queries.py for
the query catalog (one entry per operator family from SURVEY.md §2 plus the
training-data ops) and the matching DuckDB oracle SQL.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, "/root/repo")


def entry() -> Any:
    """Flagship pipeline on sf0.001: documents -> token table -> shuffle-free
    keyed layout (batch-local split by source + compaction, full codec stack +
    lineage manifest) -> decode.

    Returns the decoded token-table Dataset (doc_id, tokens, n_tok, source).
    """
    from parquet_go_ray.pipelines.queries import q_roundtrip_tokens

    return q_roundtrip_tokens("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from parquet_go_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from parquet_go_ray.pipelines.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
