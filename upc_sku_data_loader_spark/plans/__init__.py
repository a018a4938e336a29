"""Query plans: importing this package populates registry.QUERIES/ORACLES."""

from . import (  # noqa: F401
    aggregates,
    composite,
    curation,
    events_streams,
    filters,
    joins,
    llm,
    scalars,
    selection,
    sorts_setops,
    sources_sinks,
    sql_api,
    timeseries,
    training,
    udfs,
    windows,
)

__all__ = [
    "aggregates",
    "composite",
    "curation",
    "events_streams",
    "filters",
    "joins",
    "llm",
    "scalars",
    "selection",
    "sorts_setops",
    "sources_sinks",
    "sql_api",
    "timeseries",
    "training",
    "udfs",
    "windows",
]
