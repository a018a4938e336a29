"""Query plans: importing this package populates registry.QUERIES/ORACLES."""

from . import aggregates, filters, joins, scalars, sorts_setops, windows  # noqa: F401

__all__ = ["aggregates", "filters", "joins", "scalars", "sorts_setops", "windows"]
