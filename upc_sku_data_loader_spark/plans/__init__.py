"""Query plans: importing this package populates registry.QUERIES/ORACLES."""

from . import aggregates  # noqa: F401

__all__ = ["aggregates"]
