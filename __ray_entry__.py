"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship web-page entity-resolution pipeline
(mismo_ray/pipelines/_webpages.py) on /root/testdata/sf0.001.
``queries()`` / ``oracle_sql()`` cover the operator inventory of SURVEY.md §2
over the driver's parquet tables, checked against DuckDB at sf0.01.

Ray is initialised by the driver BEFORE this module is imported: nothing here
calls ``ray.init`` / ``ray.shutdown``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship: synth web pages from sf0.001 documents -> extract text ->
    block (KeyLinker + sorted-neighborhood) -> FS-score -> threshold ->
    connected components -> labeled pages."""
    from mismo_ray.pipelines import flagship

    result = flagship(
        "/root/testdata/sf0.001", train="em", threshold_odds=10.0
    )
    return result["records"].select_columns(
        ["record_id", "url", "lang", "label_true", "component"]
    )


def queries() -> dict[str, Callable[[str], Any]]:
    from mismo_ray import driver_queries

    return driver_queries.QUERIES


def oracle_sql() -> dict[str, str]:
    from mismo_ray import driver_queries

    return driver_queries.ORACLE_SQL
