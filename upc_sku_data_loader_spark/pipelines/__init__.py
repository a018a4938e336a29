from . import etl  # noqa: F401
