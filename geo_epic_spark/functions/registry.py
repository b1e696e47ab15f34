"""Named pandas-UDF registry — the reference's dynamic post-process hooks.

The reference loads user routines at runtime with ``import_function("path.py
fn")`` (`geoEpic/utils/misc.py:97-133`) and runs them per site after the
simulation fan-out (`workspace/post_process.py:20`, `core/workspace.py:94-114`
``@workspace.logger``). Here the same extension point is a registry of named
grouped-pandas functions: register by decorator or load from ``module:fn`` /
``/path/file.py fn`` specs, then apply any entry as one ``applyInPandas``
stage over the site groups — the routine runs Arrow-batched next to the data
instead of in a driver-side thread pool.
"""

from __future__ import annotations

import importlib
import importlib.util
import os
from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame

_REGISTRY: dict[str, Callable[[pd.DataFrame], pd.DataFrame]] = {}


def register(name: str) -> Callable:
    """Decorator: ``@register("my_routine")`` adds a pandas-in/pandas-out
    routine under ``name`` (last registration wins, like the reference's
    module reload)."""

    def deco(fn: Callable[[pd.DataFrame], pd.DataFrame]):
        _REGISTRY[name] = fn
        return fn

    return deco


def get(name: str) -> Callable[[pd.DataFrame], pd.DataFrame]:
    if name not in _REGISTRY:
        raise KeyError(
            f"no routine {name!r} registered (have: {sorted(_REGISTRY)})"
        )
    return _REGISTRY[name]


def names() -> list[str]:
    return sorted(_REGISTRY)


def load(spec: str) -> Callable[[pd.DataFrame], pd.DataFrame]:
    """Resolve a routine from a spec string and register it under the
    function's name. Two forms, mirroring ``import_function``:

    * ``"pkg.module:fn"`` — import the module, take attribute ``fn``;
    * ``"/path/to/file.py fn"`` — exec the file as a module, take ``fn``.
    """
    if ":" in spec:
        mod_name, fn_name = spec.split(":", 1)
        fn = getattr(importlib.import_module(mod_name), fn_name)
    else:
        path, fn_name = spec.rsplit(" ", 1)
        mod_name = os.path.splitext(os.path.basename(path))[0]
        su = importlib.util.spec_from_file_location(mod_name, path)
        mod = importlib.util.module_from_spec(su)
        su.loader.exec_module(mod)
        fn = getattr(mod, fn_name)
    _REGISTRY[fn_name] = fn
    return fn


def apply_routine(
    df: DataFrame,
    routine: str | Callable[[pd.DataFrame], pd.DataFrame],
    by: str | list[str],
    schema,
) -> DataFrame:
    """Run a registered (or inline) routine per group as one grouped-pandas
    stage. ``schema`` is the output schema (StructType or DDL string) —
    explicit, like every other schema in this engine (no first-row
    inference)."""
    fn = get(routine) if isinstance(routine, str) else routine
    keys = [by] if isinstance(by, str) else list(by)
    return df.groupBy(*keys).applyInPandas(fn, schema=schema)
