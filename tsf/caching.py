"""Scoped cache lifetime for operator-internal persist() calls.

Several operators persist a shared intermediate (minhash signatures,
simhash sketches, shingle arrays, super-window frames) because the frame
feeds multiple plan branches — Catalyst re-executes the subtree per
branch otherwise. The persist must be LIVE while the caller runs its
terminal action (that is when the branches execute), so the operator
cannot unpersist it itself; but never unpersisting leaks a cache entry
for the session's lifetime, and in a long-lived service those accumulate
until LRU eviction thrashes.

:func:`scoped_persist` resolves the split ownership: operators persist
through it, and a job entry point wraps each query in
:func:`persist_scope`, which unpersists everything persisted inside it
when the scope closes (after the terminal action). Outside any scope the
behavior is unchanged — the caller owns the lifetime (documented on each
operator), exactly as before.
"""

from __future__ import annotations

import contextlib
from contextvars import ContextVar

from pyspark.sql import DataFrame

_ACTIVE: ContextVar[list[DataFrame] | None] = ContextVar(
    "tsf_persist_scope", default=None)


def scoped_persist(df: DataFrame) -> DataFrame:
    """persist() that registers with the innermost :func:`persist_scope`
    (no-op registration when no scope is active)."""
    df = df.persist()
    scope = _ACTIVE.get()
    if scope is not None:
        scope.append(df)
    return df


@contextlib.contextmanager
def persist_scope():
    """Unpersist every :func:`scoped_persist` frame created inside the
    block when it exits — run the query's terminal action INSIDE."""
    dfs: list[DataFrame] = []
    token = _ACTIVE.set(dfs)
    try:
        yield
    finally:
        _ACTIVE.reset(token)
        for df in dfs:
            try:
                df.unpersist()
            except Exception:
                pass  # session already stopped — nothing to release
