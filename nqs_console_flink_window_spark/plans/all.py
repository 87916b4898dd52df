"""Import every query module so the registry is fully populated."""

from . import (  # noqa: F401
    queries,
    queries_ext,
    queries_misc,
    queries_ops,
    queries_retrieval,
    queries_stream,
    queries_timeseries,
)
from .registry import REGISTRY  # noqa: F401
