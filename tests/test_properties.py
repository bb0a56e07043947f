"""Property-based tests (hypothesis): randomized inputs checked
against pure-Python reference implementations.

The reference repo has no property testing at all (SURVEY §5); these
cover the operators whose correctness rests on subtle invariants —
connected-component fixed points, session-boundary arithmetic, the
greedy-left BPE fold — where a hand-picked example can silently miss
the broken case. Each property batches all generated rows into ONE
DataFrame per example so the Spark job count stays bounded.
"""

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SET = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# ---------- connected components ----------

def _py_components(edges, vertices):
    """Reference CC: min reachable id per vertex, vertex-induced."""
    vs = set(vertices)
    adj = {v: set() for v in vs}
    for a, b in edges:
        if a in vs and b in vs:
            adj[a].add(b)
            adj[b].add(a)
    out = {}
    for v in vs:
        if v in out:
            continue
        comp, stack = [], [v]
        seen = {v}
        while stack:
            x = stack.pop()
            comp.append(x)
            for y in adj[x]:
                if y not in seen:
                    seen.add(y)
                    stack.append(y)
        root = min(comp)
        for x in comp:
            out[x] = root
    return out


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)), max_size=25
    ),
    verts=st.sets(st.integers(0, 12), min_size=1, max_size=13),
)
@SET
def test_dedup_clusters_matches_reference_cc(spark, edges, verts):
    from geist_spark.operators.dedup import dedup_clusters

    pairs = spark.createDataFrame(
        [(a, b) for a, b in edges] or [(None, None)],
        "doc_a long, doc_b long",
    )
    vdf = spark.createDataFrame([(v,) for v in verts], "doc_id long")
    expected = _py_components(edges, verts)
    got_fast = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup_clusters(pairs, vertices=vdf).collect()
    }
    assert got_fast == expected
    got_dist = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup_clusters(
            pairs, vertices=vdf, max_driver_edges=0
        ).collect()
    }
    assert got_dist == expected


# ---------- sessionization ----------

def _py_sessions(rows, gap_s=1800):
    """Reference: per user, sort by (ts_us, event_id); new session when
    the micros gap exceeds gap_s seconds. Returns {(user, eid): seq}."""
    out = {}
    by_user = {}
    for uid, eid, ts_us in rows:
        by_user.setdefault(uid, []).append((ts_us, eid))
    for uid, evs in by_user.items():
        evs.sort()
        seq, last = 0, None
        for ts_us, eid in evs:
            if last is None or ts_us - last > gap_s * 1_000_000:
                seq += 1
            out[(uid, eid)] = seq
            last = ts_us
    return out


@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 3),  # user
            st.integers(0, 10**6),  # event id (unique-ified below)
            st.integers(0, 4 * 1800 * 1_000_000),  # ts micros
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda r: r[1],
    )
)
@SET
def test_assign_sessions_matches_reference(spark, rows):
    from geist_spark.operators.relational import assign_sessions

    epoch = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [
            (uid, eid, epoch + dt.timedelta(microseconds=ts))
            for uid, eid, ts in rows
        ],
        "user_id long, event_id long, ts timestamp",
    )
    got = {
        (r["user_id"], r["event_id"]): r["session_seq"]
        for r in assign_sessions(df).collect()
    }
    assert got == _py_sessions(rows)


# ---------- BPE greedy-left merge fold ----------

def _py_merge(sym: str, a: str, b: str) -> str:
    """Reference greedy left-to-right single merge over a
    space-separated symbol string."""
    toks = sym.split(" ")
    out, i = [], 0
    while i < len(toks):
        if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(toks[i])
            i += 1
    return " ".join(out)


@given(
    words=st.lists(
        st.text(alphabet="abc", min_size=1, max_size=8),
        min_size=1,
        max_size=30,
        unique=True,
    ),
    pair=st.tuples(
        st.sampled_from(["a", "b", "c"]), st.sampled_from(["a", "b", "c"])
    ),
)
@SET
def test_merge_fold_greedy_left_matches_reference(spark, words, pair):
    from geist_spark.operators.tokenizer import char_symbols, merge_fold

    a, b = pair
    df = spark.createDataFrame([(w,) for w in words], "word string").select(
        "word", char_symbols(F.col("word")).alias("sym")
    )
    got = {
        r["word"]: r["m"]
        for r in df.select(
            "word", merge_fold(F.col("sym"), a, b).alias("m")
        ).collect()
    }
    for w in words:
        # char_symbols renders 'low' -> 'l o w </w>'
        sym = " ".join(list(w)) + " </w>"
        assert got[w] == _py_merge(sym, a, b), (w, a, b)
