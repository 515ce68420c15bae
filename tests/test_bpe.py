"""BPE merge learning / application (tsf/bpe.py).

Pins: greedy left-to-right overlap resolution (the "aaa" case),
hierarchical merges across rounds, Spark-SQL-fold == numpy-Arrow
equality, hand-computed merge tables incl. the (cnt DESC, lt, rt)
tie-break and the cnt>=2 early break, the deterministic sample_ppm
training slice, and the executed-plan scale shapes (pair counting =
one bounded Exchange + TakeOrderedAndProject; full-corpus apply =
ZERO Exchange, tokens never shuffle)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from tsf import bpe
from tsf.io import sequences_from_documents


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _seq_df(spark, rows):
    return spark.createDataFrame(
        [(f"d{i}", list(map(int, t)), len(t), "s") for i, t in enumerate(rows)],
        "doc_id string, tokens array<int>, n_tok int, source string")


# ------------------------------------------------------------ numpy kernel

def test_apply_one_greedy_overlap_left_to_right():
    # "aaa" with merge (a,a) -> (aa, a): only the even offset in the run merges
    out = bpe._apply_one_np(np.array([7, 7, 7], np.int32), 7, 7, 99)
    assert out.tolist() == [99, 7]
    out = bpe._apply_one_np(np.array([7, 7, 7, 7], np.int32), 7, 7, 99)
    assert out.tolist() == [99, 99]
    out = bpe._apply_one_np(np.array([7, 7, 7, 7, 7], np.int32), 7, 7, 99)
    assert out.tolist() == [99, 99, 7]
    # two separate runs resolve independently
    out = bpe._apply_one_np(np.array([7, 7, 7, 1, 7, 7, 7], np.int32), 7, 7, 99)
    assert out.tolist() == [99, 7, 1, 99, 7]


def test_apply_one_distinct_pair_no_overlap_cases():
    out = bpe._apply_one_np(np.array([1, 2, 1, 2, 1], np.int32), 1, 2, 99)
    assert out.tolist() == [99, 99, 1]
    # (2,1) inside 1,2,1,2: after merging (1,2) there is no 2,1 left — but
    # a (2,1) merge on the RAW array matches once at position 2
    out = bpe._apply_one_np(np.array([1, 2, 1, 2], np.int32), 2, 1, 99)
    assert out.tolist() == [1, 99, 2]
    out = bpe._apply_one_np(np.array([5], np.int32), 5, 5, 99)
    assert out.tolist() == [5]
    out = bpe._apply_one_np(np.array([], np.int32), 1, 2, 99)
    assert out.tolist() == []


def test_apply_merges_hierarchical():
    # round 1: (a,a)->A ; round 2: (A,A)->B  — learns ((a,a),(a,a))
    merges = [dict(rnd=1, lt=7, rt=7, new_id=100, cnt=0),
              dict(rnd=2, lt=100, rt=100, new_id=101, cnt=0)]
    out = bpe.apply_merges_np(np.array([7, 7, 7, 7], np.int32), merges)
    assert out.tolist() == [101]
    out = bpe.apply_merges_np(np.array([7, 7, 7, 7, 7], np.int32), merges)
    assert out.tolist() == [101, 7]


# ------------------------------------------------------------ python reference

def _bpe_ref(rows, n_merges, base=1000):
    """Readable reference: full retrain loop over python lists."""
    rows = [list(r) for r in rows]
    merges = []
    for rnd in range(1, n_merges + 1):
        counts = {}
        for t in rows:
            for a, b in zip(t, t[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + 1
        if not counts:
            break
        # NOTE: corpus counts include overlapping occurrences (aaa counts
        # (a,a) twice) — same as pair_counts on both engines.
        (lt, rt), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < 2:
            break
        new_id = base + rnd
        merges.append(dict(rnd=rnd, lt=lt, rt=rt, new_id=new_id, cnt=cnt))
        nxt = []
        for t in rows:
            o, i = [], 0
            while i < len(t):
                if i + 1 < len(t) and t[i] == lt and t[i + 1] == rt:
                    o.append(new_id)
                    i += 2
                else:
                    o.append(t[i])
                    i += 1
            nxt.append(o)
        rows = nxt
    return merges, rows


def test_numpy_apply_matches_sequential_reference():
    rng = np.random.default_rng(7)
    rows = [rng.integers(0, 4, size=rng.integers(0, 40)).tolist()
            for _ in range(60)]
    merges, ref_rows = _bpe_ref(rows, 6)
    assert len(merges) == 6  # vocab 4 on 60 docs: plenty to merge
    for raw, ref in zip(rows, ref_rows):
        got = bpe.apply_merges_np(np.array(raw, np.int32), merges)
        assert got.tolist() == ref


# ------------------------------------------------------------ spark paths

def test_train_bpe_hand_computed_and_tie_break(spark):
    # (1,2) x3; (2,1) x2; tie between... make (3,3) also x3 -> tie broken
    # by (lt, rt): (1,2) wins over (3,3) at equal cnt.
    df = _seq_df(spark, [[1, 2, 1, 2, 1, 2], [3, 3, 3, 3]])
    # counts: (1,2)=3, (2,1)=2, (3,3)=3 -> round 1 picks (1,2)
    merges, fin = bpe.train_bpe(df, 2, base=1000)
    fin.unpersist()
    assert [(m["lt"], m["rt"], m["new_id"], m["cnt"]) for m in merges[:1]] \
        == [(1, 2, 1001, 3)]
    assert merges[1]["lt"] == 3 and merges[1]["rt"] == 3 and merges[1]["cnt"] == 3


def test_train_bpe_breaks_when_no_repeats(spark):
    df = _seq_df(spark, [[1, 2, 3], [4, 5]])
    merges, fin = bpe.train_bpe(df, 5, base=1000)
    fin.unpersist()
    assert merges == []


def test_sql_and_arrow_apply_agree(spark, sf001):
    seq = sequences_from_documents(spark, sf001)
    merges, fin = bpe.train_bpe(seq, 3)
    fin.unpersist()
    assert len(merges) == 3
    a = bpe.apply_merges(seq, merges, impl="arrow").orderBy("doc_id")
    s = bpe.apply_merges(seq, merges, impl="sql").orderBy("doc_id")
    ra, rs = a.collect(), s.collect()
    assert len(ra) == len(rs) > 0
    for x, y in zip(ra, rs):
        assert x["doc_id"] == y["doc_id"]
        assert x["tokens"] == y["tokens"]
        assert x["n_tok"] == y["n_tok"] == len(x["tokens"])


def test_train_matches_python_reference_on_fixture(spark):
    rng = np.random.default_rng(11)
    rows = [rng.integers(0, 5, size=rng.integers(2, 30)).tolist()
            for _ in range(40)]
    ref_merges, ref_rows = _bpe_ref(rows, 4, base=bpe.VOCAB_BASE)
    df = _seq_df(spark, rows)
    merges, fin = bpe.train_bpe(df, 4)
    got_rows = {r["doc_id"]: r["tokens"]
                for r in fin.select("doc_id", "tokens").collect()}
    fin.unpersist()
    assert [(m["lt"], m["rt"], m["new_id"], m["cnt"]) for m in merges] \
        == [(m["lt"], m["rt"], m["new_id"], m["cnt"]) for m in ref_merges]
    for i, ref in enumerate(ref_rows):
        assert got_rows[f"d{i}"] == ref


def test_train_rewrite_paths_agree(spark):
    rng = np.random.default_rng(3)
    rows = [rng.integers(0, 3, size=rng.integers(2, 25)).tolist()
            for _ in range(30)]
    df = _seq_df(spark, rows)
    ms, fs = bpe.train_bpe(df, 3, rewrite="sql")
    fs.unpersist()
    ma, fa = bpe.train_bpe(df, 3, rewrite="arrow")
    fa.unpersist()
    assert ms == ma and len(ms) == 3
    with pytest.raises(ValueError):
        bpe.train_bpe(df, 1, rewrite="nope")


def test_sample_ppm_trains_on_deterministic_slice(spark, sf001):
    seq = sequences_from_documents(spark, sf001)
    m1, f1 = bpe.train_bpe(seq, 2, sample_ppm=500_000)
    f1.unpersist()
    m2, f2 = bpe.train_bpe(seq, 2, sample_ppm=500_000)
    f2.unpersist()
    assert m1 == m2 and len(m1) == 2
    full, ff = bpe.train_bpe(seq, 2)
    ff.unpersist()
    # the sampled table applies corpus-wide without error
    out = bpe.apply_merges(seq, m1, impl="arrow")
    assert out.count() == seq.count()
    assert m1 != full or True  # slices may coincide; only determinism is pinned


# ------------------------------------------------------------ plan shapes

def test_pair_counts_topk_is_take_ordered_bounded_exchange(spark, sf001):
    """Counting round: the exploded side projects (lt, rt) ints only
    (no text/doc_id), partial aggregation combines map-side, the single
    hash Exchange is keyed on the pair, and top-k lowers to
    TakeOrderedAndProject (never a global Sort)."""
    seq = sequences_from_documents(spark, sf001)
    d = bpe.pair_counts(seq, top_k=50)
    d.collect()
    p = _plan(d)
    assert "TakeOrderedAndProject" in p, p
    assert "Sort " not in p.replace("TakeOrderedAndProject", ""), p
    import re
    ex = [ln for ln in p.splitlines() if "Exchange hashpartitioning" in ln]
    sigs = {re.search(r"hashpartitioning\(([^)]*)\)", ln).group(1).rsplit(",", 1)[0]
            for ln in ex}
    assert len(sigs) == 1, p  # ONE shuffle key: the (lt, rt) grouping pair
    assert "partial_count" in p, p
    for ln in ex:
        assert "tokens" not in ln and "text" not in ln, ln


def test_apply_arrow_zero_exchange(spark, sf001):
    """The production full-corpus rewrite: one mapInPandas pass, merge
    table as literals — ZERO Exchange, token payload never shuffles."""
    seq = sequences_from_documents(spark, sf001)
    merges = [dict(rnd=1, lt=1, rt=2, new_id=bpe.VOCAB_BASE + 1, cnt=9)]
    out = bpe.apply_merges(seq, merges, impl="arrow")
    out.count()
    p = _plan(out)
    assert "Exchange" not in p, p


def test_merge_fold_expr_rejects_unsafe_new_id():
    with pytest.raises(ValueError):
        bpe.merge_fold_expr("tokens", 5, 70000, 65537)
