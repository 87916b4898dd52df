"""Import every query module so the registry is fully populated."""

from . import queries, queries_ext, queries_misc, queries_ops, queries_stream  # noqa: F401
from .registry import REGISTRY  # noqa: F401
