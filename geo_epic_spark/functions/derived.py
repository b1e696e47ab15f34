"""Derived-variable expression DSL (SURVEY §2.7 'Eval-expression').

The reference evaluates YAML-configured numpy formulas over fetched frames —
``vars: {rh: '{vp}/(611*exp((17.27*{tmax})/({tmax}+237.3)))'}`` — via a
sandboxed ``eval`` with a numpy namespace (`geoEpic/gee/core.py:50-62`,
`:247-260`). Spark SQL *is* the safe expression engine, so here a derived
variable is an ``F.expr`` SQL string with ``{col}`` placeholders; formulas
stay data (config), never Python code, and run fully inside codegen.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PLACEHOLDER = re.compile(r"\{([A-Za-z_][A-Za-z0-9_]*)\}")


def compile_formula(formula: str) -> str:
    """'{vp}/(611*exp(...))' -> SQL expr with backticked column refs."""
    return _PLACEHOLDER.sub(lambda m: f"`{m.group(1)}`", formula)


def apply_derived(df: DataFrame, variables: dict[str, str]) -> DataFrame:
    """Add each derived variable as a column, in declaration order — later
    formulas may reference earlier derived names (like the reference's
    sequential eval loop)."""
    for name, formula in variables.items():
        df = df.withColumn(name, F.expr(compile_formula(formula)))
    return df
