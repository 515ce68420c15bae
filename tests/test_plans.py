"""Physical-plan invariants — the scale-design claims, asserted.

Each test pins a property of the EXECUTED plan that the 100-TB design
depends on, so a regression that silently inserts a shuffle, a cartesian
product, or a full-width scan fails loudly here rather than showing up
as a 100x slowdown on a cluster."""

import pytest

from tsf.io import sequences_from_documents
from tsf.registry import catalogue
from tsf.rollup import next_tier, tier0

def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_tier0_has_no_shuffle_and_prunes_columns(spark, sf001):
    """Tier-0 rollup: tokens flow scan -> tokenize -> chunk -> kernel
    with NO Exchange (nothing re-shuffles raw tokens), and the parquet
    scan reads only the columns the query needs."""
    seq = sequences_from_documents(spark, sf001)
    t0 = tier0(seq, catalogue()[["cnt", "mean"]], window=20, blocks=False)
    p = _plan(t0)
    assert "Exchange" not in p, p
    scan = [ln for ln in p.splitlines() if "FileScan parquet" in ln][0]
    assert "text" in scan and "lang" not in scan, scan


def test_tier1_shuffles_blocks_not_tokens(spark, sf001):
    """The cascade exchanges only compressed rollup rows: the (single)
    shuffle sits ABOVE tier-0's kernel output, and no token/text column
    crosses it."""
    seq = sequences_from_documents(spark, sf001)
    fs = catalogue()[["cnt", "sum_tok", "min_tok", "max_tok", "mean",
                      "std"]]
    t1 = next_tier(tier0(seq, fs, window=20), 0, fs, window=20)
    p = _plan(t1)
    ex = [ln for ln in p.splitlines() if "Exchange" in ln]
    assert ex, "expected the tier-derivation groupBy shuffle"
    assert all("tokens" not in ln and "text" not in ln for ln in ex), ex


def test_ivf_assignment_is_one_shuffle_free_projection(spark, sf001):
    """IVF cell assignment = a single projection over the scan — no
    Exchange, no join, no Python."""
    from tsf import similarity
    emb = spark.read.parquet(f"{sf001}/embeddings.parquet")
    cells = similarity.ivf_cells(emb, similarity.ivf_centroids(emb, 8))
    p = _plan(cells)
    assert "Exchange" not in p, p
    assert "Join" not in p and "InPandas" not in p, p


def test_ngram_dedup_has_no_cartesian_product(spark, sf001):
    """The exact n-gram Jaccard join must stay an equi-join on prefix
    shingles — never a cartesian/broadcast nested loop over docs."""
    from tsf import dedup
    docs = spark.read.parquet(f"{sf001}/documents.parquet")
    p = _plan(dedup.ngram_jaccard_pairs(docs, 0.3))
    assert "CartesianProduct" not in p, p
    assert "BroadcastNestedLoopJoin" not in p, p


def test_pairwise_featureset_is_equi_join(spark, sf001):
    """The SuperPairwise self-join pairs windows via an equi-join on
    (source, window_id) — the N x N product exists only inside a join
    group, never as a cartesian plan node."""
    from tsf import pairwise
    seq = sequences_from_documents(spark, sf001)
    df = pairwise.pairwise_features(seq, ("plv", "ppc"), window=20)
    p = _plan(df)
    assert "CartesianProduct" not in p, p
    assert "BroadcastNestedLoopJoin" not in p, p


def test_cosine_topk_uses_take_ordered(spark, sf001):
    """Top-k is a per-partition partial top-k (TakeOrderedAndProject),
    not a global sort."""
    from tsf import similarity
    emb = spark.read.parquet(f"{sf001}/embeddings.parquet")
    q = [float(x) for x in emb.where("vec_id = 0")
         .select("embedding").first()[0]]
    p = _plan(similarity.cosine_topk(emb, q, 10))
    assert "TakeOrderedAndProject" in p, p
    assert "Sort " not in p.replace("TakeOrderedAndProject", ""), p
