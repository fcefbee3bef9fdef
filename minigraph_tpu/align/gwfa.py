"""Graph wavefront alignment (GWFA) over the GFA topology
(gfa-ed.c).  Used to bridge linear chains during graph-chain
materialization and to score candidate insertions during graph
generation.

Placeholder: the exact GWFA engine lands with the base-alignment
milestone; returning failure makes callers fall back to
target-distance shortest-path bridging (gchain1.c:386-388).
"""
from __future__ import annotations


def gwfa_bridge(g, es, qseq: str, v0: int, end0: int, v1: int, end1: int,
                max_ed: int):
    """Returns (score, vertex_walk).  score < 0 means failure."""
    from .gwfa_exact import gwfa_ed
    return gwfa_ed(g, es, qseq, v0, end0, v1, end1, max_ed)
