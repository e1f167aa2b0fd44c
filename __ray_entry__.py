"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship spatial-join + tile-aggregation pipeline on
sf0.001; ``queries()`` exposes every implemented operator/pipeline from
SURVEY.md §2 (plus the training-data-pipeline additions); ``oracle_sql()``
gives the exact DuckDB equivalent for each SQL-expressible query.

Ray is initialised by the driver BEFORE this module is imported: nothing here
calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from gtfs_conflation_pipeline_ray.pipelines import conflation
from gtfs_conflation_pipeline_ray.pipelines.queries import ORACLE_SQL, QUERIES


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: derive probe points and
    reference tiles, candidate spatial join (broadcast grid index in an actor
    pool), per-tile aggregation."""
    return conflation.tile_stats("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE_SQL)
