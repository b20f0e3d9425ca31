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
    # Imports are strict on purpose: a module failing to import must fail
    # the whole registry loudly, not silently shrink the declared coverage
    # (the correctness gate would "pass" while verifying fewer operators).
    from .operators import (  # noqa: F401
        curation,
        dedup,
        events,
        graph,
        multimodal,
        profiling,
        quality,
        relational,
        similarity,
        sketches,
        stats,
        temporal,
        text,
        tpch,
        tpch_ext,
    )

    specs: dict[str, QuerySpec] = {}
    modules = [relational, tpch, tpch_ext, events, temporal, stats, text,
               dedup, similarity, sketches, multimodal, profiling, quality,
               curation, graph]
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
