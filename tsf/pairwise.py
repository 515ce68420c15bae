"""Two-series (super-)pairwise features.

Reference surface (clean-room re-expression):

- ``PPC(x, y) = PPC(y .- x)`` and ``PLV(x, y) = PLV(y .- x)`` — pairwise
  phase synchrony of the phase-DIFFERENCE series
  (``/root/reference/ext/DSPExt.jl:26-31,41-44``).
- ``SuperPairwiseFeature``: the shared transform (analytic phase) is
  computed ONCE per series, then the pairwise leaf runs over the N x N
  product of the collection (``/root/reference/src/PairwiseFeatures.jl:
  23,48-60``, exercised by ``test/runtests.jl:569-586``).

Spark-first shape: one ``mapInPandas`` pass computes each (doc, window)'s
analytic-phase cos/sin arrays (the "super", once per series — never per
pair), then a self-equi-join on (source, window_id) pairs same-source
windows and JVM ``zip_with`` dot products produce the phase-difference
sums:

    cos(py - px) = cos(py)cos(px) + sin(py)sin(px)
    sin(py - px) = sin(py)cos(px) - cos(py)sin(px)

so with C = sum_t cos(delta_t), S = sum_t sin(delta_t) over a FULL window
of N points:

    PLV = sqrt(C^2 + S^2) / N                       (ext/DSPExt.jl:36-40)
    PPC = (C^2 + S^2 - N) / (N (N - 1))             (Vinck 2010 eq. 14 via
                                                     the O(N) closed form)

The join is an equi-join on (source, window_id): each pair's overlap is a
co-located group, the N x N product exists only within a source (the
reference's collection = our source), and no token ever re-shuffles —
only W-double cos/sin arrays.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from tsf.kernels import WindowCtx
from tsf.rollup import _assemble_windows
from tsf.windows import DEFAULT_CHUNK_WINDOWS, chunk_sequences

PHASE_SCHEMA = ("doc_id string, source string, window_id bigint, "
                "c array<double>, s array<double>")


def make_phase_fn(W: int):
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            arrs = pdf["chunk_toks"].tolist()
            M, n, row_of_win, local_w = _assemble_windows(arrs, W)
            full = n == W  # pairwise features need aligned full windows
            if not full.any():
                continue
            ctx = WindowCtx(M[full], n[full])
            ph = ctx.get("analytic_phase")
            off = pdf["chunk_off"].to_numpy().astype(np.int64)
            window_id = (off[row_of_win] // W + local_w)[full]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].to_numpy()[row_of_win][full],
                "source": pdf["source"].to_numpy()[row_of_win][full],
                "window_id": window_id,
                "c": list(np.cos(ph)),
                "s": list(np.sin(ph)),
            })
    return fn


def phase_windows(seq: DataFrame, window: int = 100,
                  chunk_windows: int = DEFAULT_CHUNK_WINDOWS) -> DataFrame:
    """Analytic-phase cos/sin arrays per FULL (doc, window) — the shared
    super, computed once per series (src/SuperFeatures.jl:96-110)."""
    chunked = chunk_sequences(seq, window, chunk_windows)
    return chunked.mapInPandas(make_phase_fn(window), PHASE_SCHEMA)


def _dot(a: str, b: str) -> str:
    return (f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), "
            f"cast(0 as double), (acc, v) -> acc + v)")


def pairwise_phase_sync(seq: DataFrame, window: int = 100,
                        min_windows: int = 1) -> DataFrame:
    """PLV(x,y) / PPC(x,y) for every same-source doc pair, per aligned
    window, averaged over the pair's aligned windows.

    Returns (source, doc_a, doc_b, n_windows, plv, ppc): plv/ppc are the
    means over aligned full windows (one window per short doc, so for the
    reference's whole-series semantics pick window >= series length)."""
    # both join sides re-run the FFT phase pass otherwise
    pw = phase_windows(seq, window).persist()
    a, b = pw.alias("a"), pw.alias("b")
    # C = sum cos(pb - pa), S = sum sin(pb - pa) via four JVM dot products
    C = (F.expr(_dot("b.c", "a.c")) + F.expr(_dot("b.s", "a.s")))
    S = (F.expr(_dot("b.s", "a.c")) - F.expr(_dot("b.c", "a.s")))
    n = float(window)
    r2 = C * C + S * S
    plv = F.sqrt(r2) / F.lit(n)
    ppc = (r2 - F.lit(n)) / F.lit(n * (n - 1.0))
    pairs = (a.join(b, (F.col("a.source") == F.col("b.source"))
                    & (F.col("a.window_id") == F.col("b.window_id"))
                    & (F.col("a.doc_id") < F.col("b.doc_id")))
             .select(F.col("a.source").alias("source"),
                     F.col("a.doc_id").alias("doc_a"),
                     F.col("b.doc_id").alias("doc_b"),
                     plv.alias("plv"), ppc.alias("ppc")))
    return (pairs.groupBy("source", "doc_a", "doc_b")
            .agg(F.count("*").alias("n_windows"),
                 F.avg("plv").alias("plv"), F.avg("ppc").alias("ppc"))
            .where(F.col("n_windows") >= min_windows)
            .select("source", "doc_a", "doc_b", "n_windows",
                    F.round("plv", 6).alias("plv"),
                    F.round("ppc", 6).alias("ppc")))
