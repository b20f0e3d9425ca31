"""Central query registry: every verifiable operator the engine exposes.

``__spark_entry__.py`` (the driver contract) is a thin shim over this
module.  Operator modules each contribute a ``SPECS`` dict; the union is
the engine's declared coverage of SURVEY.md §2 plus the scale extensions
(dedup / similarity / text analysis / event windows).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .spec import QuerySpec


def _collect() -> dict[str, QuerySpec]:
    from .operators import relational

    specs: dict[str, QuerySpec] = {}
    modules = [relational]
    for mod_name in ("tpch", "tpch_ext", "events", "temporal", "stats",
                     "text", "dedup", "similarity", "multimodal"):
        try:
            mod = __import__(
                f"{__package__}.operators.{mod_name}", fromlist=["SPECS"]
            )
            modules.append(mod)
        except ImportError:
            continue
    for mod in modules:
        for name, spec in mod.SPECS.items():
            if name in specs:
                raise ValueError(f"duplicate query name: {name}")
            specs[name] = spec
    return specs


def all_specs() -> dict[str, QuerySpec]:
    return _collect()


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in _collect().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in _collect().items()
        if spec.oracle is not None
    }
