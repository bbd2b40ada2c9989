"""Persistent dependency-graph cache under ``.lhp/cache/graph``.

Reference parity: ``src/lhp/core/dependencies/graph_cache.py`` — the
cross-flowgroup dependency graph (SQL ref extraction + python AST walks) is
pure in the project's file contents, so it caches under one composite key:
the sha256 over every contributing file's content hash. Any edit anywhere
changes the key; stale entries are unreachable by construction.

Same durability contract as the parse cache: atomic writes, read failures
fall back to a rebuild, ``LHP_NO_PARSE_CACHE=1`` disables both.
"""

from __future__ import annotations

import hashlib
import json
import os
import tempfile
from typing import Any, Callable, Iterable, Optional


# Version of the EDGE-BUILDER ALGORITHM, not the data: the graph is pure in
# (file contents, builder code), so a semantic change to edge extraction —
# new edge kinds, different ref matching — must bump this or upgraded
# installs would serve pre-upgrade graphs for unchanged specs forever.
# History: 2 = delta-load table_reads() edges added to the cross-fg graph.
GRAPH_ALGO_VERSION = 2


def project_graph_key(paths: Iterable[str]) -> str:
    """Composite content key over every contributing file (missing files key
    on their absence, so creating one later invalidates) and the edge-builder
    algorithm version."""
    h = hashlib.sha256()
    h.update(f"algo:{GRAPH_ALGO_VERSION}".encode())
    for p in sorted(set(paths)):
        h.update(p.encode())
        try:
            with open(p, "rb") as f:
                h.update(hashlib.sha256(f.read()).digest())
        except OSError:
            h.update(b"<missing>")
    return h.hexdigest()


class GraphCache:
    def __init__(self, project_root: str) -> None:
        self.dir = os.path.join(project_root, ".lhp", "cache", "graph")

    def get(self, key: str) -> Optional[Any]:
        p = os.path.join(self.dir, key + ".json")
        if not os.path.exists(p):
            return None
        try:
            with open(p) as f:
                return json.load(f)
        except (OSError, ValueError):
            return None

    def put(self, key: str, value: Any) -> None:
        try:
            os.makedirs(self.dir, exist_ok=True)
            fd, tmp = tempfile.mkstemp(dir=self.dir, suffix=".tmp")
            with os.fdopen(fd, "w") as f:
                json.dump(value, f)
            os.replace(tmp, os.path.join(self.dir, key + ".json"))
        except OSError:
            pass  # best-effort, never a correctness input

    def get_or_build(self, key: str, builder: Callable[[], Any]) -> Any:
        got = self.get(key)
        if got is not None:
            return got
        val = builder()
        self.put(key, val)
        return val


def graph_cache_for(project_root: Optional[str]) -> Optional[GraphCache]:
    if not project_root or os.environ.get("LHP_NO_PARSE_CACHE"):
        return None
    return GraphCache(project_root)
