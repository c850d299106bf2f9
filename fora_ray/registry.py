"""User-extension surface (SURVEY.md section 2.8).

The reference has none (adding an algorithm = editing algo.h + the
dispatch chain in fora.cpp); here a small registry maps algorithm names
to callables ``fn(handle_or_tables, **params)``.  The language
extractor/resolver tables (stages.extract.EXTRACTORS /
stages.resolve.RESOLVERS) are the analogous per-language hooks, and
``__ray_entry__.queries()`` is populated from the same built-in set.
"""

from __future__ import annotations

from collections.abc import Callable

ALGORITHMS: dict[str, Callable] = {}


def register_algorithm(name: str, fn: Callable) -> None:
    """Register ``fn(handle, **params) -> (Dataset, stats)`` under name."""
    ALGORITHMS[name] = fn


def get_algorithm(name: str) -> Callable:
    if name not in ALGORITHMS:
        raise KeyError(f"unknown algorithm {name!r}; known: {sorted(ALGORITHMS)}")
    return ALGORITHMS[name]


def _register_builtins() -> None:
    from .graph import algorithms as alg

    register_algorithm("pagerank", alg.pagerank)
    register_algorithm("ppr", alg.personalized_pagerank)
    register_algorithm("ppr_batch", alg.ppr_batch)
    register_algorithm("montecarlo", alg.monte_carlo_ppr)
    register_algorithm("fora_indexed", alg.fora_ssppr_indexed)
    register_algorithm("topk", alg.topk_ppr)
    register_algorithm("cc", alg.connected_components)
    register_algorithm("lpa", alg.label_propagation)
    register_algorithm("backward_ppr", alg.backward_ppr)


_register_builtins()
