"""Declared query surface: import all query modules (registration is a
side effect) and expose the registry in driver-contract form."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .base import REGISTRY, QuerySpec  # noqa: F401
from . import relational  # noqa: F401  (registers queries)
from . import events  # noqa: F401
from . import cdc  # noqa: F401
from . import llm  # noqa: F401
from . import advanced  # noqa: F401
from . import mining  # noqa: F401


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}


def headline_queries() -> dict[str, QuerySpec]:
    return {name: spec for name, spec in REGISTRY.items() if spec.headline}
