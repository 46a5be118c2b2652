"""Named function registry — the Spark-side analogue of the
reference's function-entity collection (core/function.h,
engine/function_collection.cc): trained models and SQL lambdas are
registered under a name and applied inside queries by that name.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame


class FunctionRegistry:
    """name → DataFrame-transform. Procedures register their trained
    model functions here; queries apply them by name (the reference's
    `SELECT my_classifier({features: {*}}) FROM ds` pattern becomes
    `registry.apply('my_classifier', df)`)."""

    def __init__(self) -> None:
        self._fns: dict[str, Callable[[DataFrame], DataFrame]] = {}

    def register(self, name: str, fn: Callable[[DataFrame], DataFrame]) -> None:
        self._fns[name] = fn

    def apply(self, name: str, *args, **kwargs) -> DataFrame:
        if name not in self._fns:
            raise KeyError(
                f"unknown function '{name}' (registered: {sorted(self._fns)})"
            )
        return self._fns[name](*args, **kwargs)

    def names(self) -> list[str]:
        return sorted(self._fns)


GLOBAL_REGISTRY = FunctionRegistry()
