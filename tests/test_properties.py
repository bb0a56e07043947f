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

from hypothesis import HealthCheck, example, given, settings
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


# ---------- URL normalization ----------

def _py_normalize_url(url, tracking_exact=("fbclid", "gclid", "msclkid"),
                      tracking_prefixes=("utm_",)):
    """Independent reference for web.normalize_url's documented
    contract: lower-cased scheme+host, default port stripped, fragment
    dropped, tracking params removed, remaining params byte-sorted,
    trailing path slashes collapsed ('' -> '/'). Manual string walk —
    deliberately NOT the operator's regexes."""
    import re as _re

    m = _re.match(r"^([A-Za-z][A-Za-z0-9+.\-]*)://", url)
    if not m:
        return None
    scheme = m.group(1).lower()
    rest = url[m.end():]
    cut = len(rest)
    for ch in "/?#":
        j = rest.find(ch)
        if j != -1:
            cut = min(cut, j)
    auth, after = rest[:cut], rest[cut:]
    at = auth.find("@")
    hostport = auth[at + 1:] if at != -1 else auth
    if hostport.startswith("[") and "]" in hostport:
        host = hostport[: hostport.index("]") + 1]
    else:
        c = hostport.find(":")
        host = hostport if c == -1 else hostport[:c]
    host = host.lower()
    pm = _re.search(r":(\d+)$", auth)
    port = pm.group(1) if pm else ""
    if port and not (
        (scheme == "http" and port == "80")
        or (scheme == "https" and port == "443")
    ):
        port_part = ":" + port
    else:
        port_part = ""
    frag = after.find("#")
    no_frag = after if frag == -1 else after[:frag]
    qpos = no_frag.find("?")
    path = no_frag if qpos == -1 else no_frag[:qpos]
    rawq = "" if qpos == -1 else no_frag[qpos + 1:]
    path = path.rstrip("/") or "/"
    keep = []
    for p in rawq.split("&"):
        if not p:
            continue
        name = p.split("=", 1)[0]
        if name in tracking_exact:
            continue
        if any(name.startswith(pref) for pref in tracking_prefixes):
            continue
        keep.append(p)
    q_part = "?" + "&".join(sorted(keep)) if keep else ""
    return f"{scheme}://{host}{port_part}{path}{q_part}"


_url_scheme = st.sampled_from(
    ["http", "HTTP", "https", "HtTpS", "ftp", "x+y.z-1"]
)
_url_userinfo = st.sampled_from(["", "bob@", "u:pw@"])
_url_host = st.sampled_from(
    ["ex-AMPLE.com", "Host", "127.0.0.1", "[2001:DB8::1]", "a.b.c.D"]
)
_url_port = st.sampled_from(["", ":80", ":443", ":8080", ":080"])
_url_path = st.lists(
    st.sampled_from(["a", "B", "x1", "~z", "%20"]), max_size=3
).flatmap(
    lambda segs: st.sampled_from(["", "/", "//"]).map(
        lambda tail: ("/" + "/".join(segs) if segs else "") + tail
    )
)
_url_param = st.tuples(
    st.sampled_from(
        ["a", "b", "z", "utm_source", "utm_x", "fbclid", "gclid", "ref", ""]
    ),
    st.sampled_from([None, "", "1", "x"]),
).map(lambda nv: nv[0] if nv[1] is None else f"{nv[0]}={nv[1]}")
_url_query = st.lists(_url_param, max_size=4).map("&".join)
_url_fragment = st.sampled_from(["", "#", "#top", "#a?b=1"])


@given(
    urls=st.lists(
        st.tuples(
            _url_scheme, _url_userinfo, _url_host, _url_port,
            _url_path, _url_query, _url_fragment,
        ).map(
            lambda t: f"{t[0]}://{t[1]}{t[2]}{t[3]}{t[4]}"
            + (f"?{t[5]}" if t[5] else "")
            + t[6]
        ),
        min_size=1,
        max_size=30,
    ),
)
@SET
def test_normalize_url_matches_reference(spark, urls):
    from geist_spark.operators.web import normalize_url

    # a few fixed adversarial shapes ride along with every example
    urls = urls + ["no-scheme.com/a", "http//missing.colon/x", ""]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = [
        r["n"]
        for r in df.select(
            normalize_url(F.col("url")).alias("n")
        ).collect()
    ]
    want = [_py_normalize_url(u) for u in urls]
    assert got == want, list(zip(urls, got, want))


# ---------- as-of join ----------

@given(
    lefts=st.lists(
        st.tuples(
            st.integers(0, 3),      # key
            st.integers(0, 60),     # ts seconds
        ),
        min_size=1, max_size=25,
    ),
    rights=st.lists(
        st.tuples(
            st.integers(0, 3),      # key
            st.integers(0, 60),     # ts seconds
            st.integers(0, 9),      # v1
            st.integers(0, 9),      # v2
        ),
        max_size=25,
    ),
)
@SET
def test_asof_join_matches_bruteforce(spark, lefts, rights):
    from geist_spark.operators.relational import asof_join

    epoch = dt.datetime(2024, 1, 1)
    t = lambda s: epoch + dt.timedelta(seconds=s)
    ldf = spark.createDataFrame(
        [(i, k, t(s)) for i, (k, s) in enumerate(lefts)],
        "lid long, key long, lts timestamp",
    )
    rdf = spark.createDataFrame(
        [(k, t(s), v1, v2) for k, s, v1, v2 in rights],
        "key long, rts timestamp, v1 long, v2 long",
    )
    got = {
        r["lid"]: (r["v1"], r["v2"])
        for r in asof_join(
            ldf, rdf, on="key", left_ts="lts", right_ts="rts",
            value_cols=["v1", "v2"],
        ).collect()
    }
    # reference: same-(key,ts) right rows reduce to max (v1,v2) tuple,
    # then each left row takes the latest right ts <= left ts
    reduced = {}
    for k, s, v1, v2 in rights:
        cur = reduced.get((k, s))
        if cur is None or (v1, v2) > cur:
            reduced[(k, s)] = (v1, v2)
    for i, (k, s) in enumerate(lefts):
        cands = [(rs, v) for (rk, rs), v in reduced.items()
                 if rk == k and rs <= s]
        want = max(cands)[1] if cands else (None, None)
        assert got[i] == want, (i, k, s, got[i], want)


# ---------- bucketed range join ----------

@given(
    points=st.lists(st.integers(-5, 105), min_size=1, max_size=20),
    ranges=st.lists(
        st.tuples(st.integers(-5, 105), st.integers(-10, 30)),
        max_size=15,
    ),
    how=st.sampled_from(["inner", "left"]),
    width=st.sampled_from([1.0, 7.0, 64.0]),
)
@SET
def test_range_join_matches_bruteforce(spark, points, ranges, how, width):
    from geist_spark.operators.relational import range_join

    pdf = spark.createDataFrame(
        [(i, float(x)) for i, x in enumerate(points)],
        "pid long, x double",
    )
    rdf = spark.createDataFrame(
        [(j, float(lo), float(lo + span)) for j, (lo, span) in enumerate(ranges)],
        "rid long, lo double, hi double",
    )
    got = sorted(
        (r["pid"], r["rid"])
        for r in range_join(
            pdf, rdf, "x", "lo", "hi", bucket_width=width, how=how
        ).collect()
    )
    matched = sorted(
        (i, j)
        for i, x in enumerate(points)
        for j, (lo, span) in enumerate(ranges)
        if lo <= x <= lo + span
    )
    if how == "inner":
        want = matched
    else:
        hit = {i for i, _ in matched}
        want = sorted(
            matched
            + [(i, None) for i in range(len(points)) if i not in hit]
        )
    assert got == want, (got, want)


# ---------- CDC current-state + SCD2 history ----------

@given(
    changes=st.lists(
        st.tuples(
            st.integers(0, 3),          # key
            st.integers(0, 20),         # ts seconds (collisions likely)
            st.integers(0, 9),          # value
            st.booleans(),              # tombstone?
        ),
        min_size=1, max_size=25,
    ),
)
@SET
def test_cdc_and_scd2_match_reference(spark, changes):
    from geist_spark.operators.relational import cdc_apply, scd2_history

    epoch = dt.datetime(2024, 1, 1)
    rows = [
        (k, epoch + dt.timedelta(seconds=s), i, v, d)
        for i, (k, s, v, d) in enumerate(changes)  # i = unique tiebreak
    ]
    df = spark.createDataFrame(
        rows, "key long, ts timestamp, seq long, value long, deleted boolean"
    )
    got_state = {
        r["key"]: (r["seq"], r["value"])
        for r in cdc_apply(
            df, ["key"], "ts", "seq", delete_when=F.col("deleted")
        ).collect()
    }
    # reference: winner per key by (ts, seq); tombstone removes the key
    want_state = {}
    for k, ts, seq, v, d in rows:
        cur = want_state.get(k)
        if cur is None or (ts, seq) > (cur[0], cur[1]):
            want_state[k] = (ts, seq, v, d)
    want_state = {
        k: (seq, v) for k, (ts, seq, v, d) in want_state.items() if not d
    }
    assert got_state == want_state

    got_hist = {
        r["seq"]: (r["valid_from"], r["valid_to"], r["is_current"])
        for r in scd2_history(df, ["key"], "ts", "seq").collect()
    }
    by_key = {}
    for k, ts, seq, v, d in rows:
        by_key.setdefault(k, []).append((ts, seq))
    want_hist = {}
    for k, lst in by_key.items():
        lst.sort()
        for idx, (ts, seq) in enumerate(lst):
            nxt = lst[idx + 1][0] if idx + 1 < len(lst) else None
            want_hist[seq] = (ts, nxt, nxt is None)
    assert got_hist == want_hist


# ---------- ordered funnel ----------

@given(
    events=st.lists(
        st.tuples(
            st.integers(0, 4),              # user
            st.integers(0, 30),             # ts seconds
            st.sampled_from(list("abcx")),  # event type (x = noise)
        ),
        min_size=1, max_size=40,
    ),
)
@SET
def test_funnel_matches_reference_walk(spark, events):
    from geist_spark.operators.relational import funnel_conversion

    epoch = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [
            (u, epoch + dt.timedelta(seconds=s), ty)
            for u, s, ty in events
        ],
        "user_id long, ts timestamp, event_type string",
    )
    steps = ["a", "b", "c"]
    row = funnel_conversion(df, steps).collect()[0]
    got = tuple(row[f"n_step{i}"] for i in range(3))

    # reference: per user, step k's first qualifying time must be
    # STRICTLY after the completion time of step k-1
    by_user = {}
    for u, s, ty in events:
        by_user.setdefault(u, []).append((s, ty))
    want = [0, 0, 0]
    for u, evs in by_user.items():
        prev = None
        for i, step in enumerate(steps):
            times = sorted(s for s, ty in evs if ty == step
                           and (prev is None or s > prev))
            if not times:
                break
            prev = times[0]
            want[i] += 1
    assert got == tuple(want), (got, want)


# ---------- interval-overlap join ----------

@given(
    lefts=st.lists(
        st.tuples(st.integers(0, 7200), st.integers(0, 5400)),
        min_size=1, max_size=15,
    ),
    rights=st.lists(
        st.tuples(st.integers(0, 7200), st.integers(0, 5400)),
        max_size=15,
    ),
    bucket_s=st.sampled_from([60, 3600]),
)
@SET
def test_interval_join_matches_bruteforce(spark, lefts, rights, bucket_s):
    from geist_spark.operators.relational import interval_join

    epoch = dt.datetime(2024, 1, 1)
    t = lambda s: epoch + dt.timedelta(seconds=s)
    ldf = spark.createDataFrame(
        [(i, t(s), t(s + d)) for i, (s, d) in enumerate(lefts)],
        "lid long, l_start timestamp, l_end timestamp",
    )
    rdf = spark.createDataFrame(
        [(j, t(s), t(s + d)) for j, (s, d) in enumerate(rights)],
        "rid long, r_start timestamp, r_end timestamp",
    )
    got = sorted(
        (r["lid"], r["rid"])
        for r in interval_join(
            ldf, rdf, "lid", "rid", bucket_seconds=bucket_s
        ).collect()
    )
    want = sorted(
        (i, j)
        for i, (ls, ld) in enumerate(lefts)
        for j, (rs, rd) in enumerate(rights)
        if ls <= rs + rd and rs <= ls + ld
    )
    assert got == want, (got, want)


# ---------- C4-style line dedup ----------

@given(
    docs=st.lists(
        st.lists(
            st.sampled_from([
                "",                       # empty line
                "short",                  # < min_chars, exempt
                "  COOKIE banner here  ", # normalizes to a dup key
                "cookie banner here",
                "unique sentence one x",
                "unique sentence two y",
                "another long line zzz",
            ]),
            max_size=6,
        ),
        min_size=1, max_size=8,
    ),
)
@SET
def test_line_dedup_matches_reference(spark, docs):
    from geist_spark.operators.text import line_dedup

    min_df, min_chars = 2, 10
    df = spark.createDataFrame(
        [(i, "\n".join(lines)) for i, lines in enumerate(docs)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["text"], r["n_lines_kept"], r["n_lines_dropped"])
        for r in line_dedup(
            df, min_doc_freq=min_df, min_chars=min_chars
        ).collect()
    }
    # reference: a line is dropped iff its lower+trim form is
    # >= min_chars long and appears in >= min_df distinct docs;
    # split('') yields one empty line per empty doc (Spark split
    # semantics on the empty string)
    split_docs = [("\n".join(lines)).split("\n") for lines in docs]
    from collections import defaultdict
    seen = defaultdict(set)
    for i, lines in enumerate(split_docs):
        for ln in lines:
            n = ln.strip().lower()
            if len(n) >= min_chars:
                seen[n].add(i)
    dup = {n for n, s in seen.items() if len(s) >= min_df}
    for i, lines in enumerate(split_docs):
        keep = [
            ln for ln in lines
            if not (
                len(ln.strip().lower()) >= min_chars
                and ln.strip().lower() in dup
            )
        ]
        want = ("\n".join(keep), len(keep), len(lines) - len(keep))
        assert got[i] == want, (i, lines, got[i], want)


# ---------- trailing RANGE-frame features ----------

@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 2),                       # user
            st.integers(0, 10 * 86_400),             # ts seconds
            st.integers(-5, 5),                      # value
        ),
        min_size=1, max_size=30,
    ),
)
@SET
def test_rolling_features_matches_reference(spark, rows):
    from geist_spark.operators.relational import rolling_user_features

    epoch = dt.datetime(2024, 1, 1)
    days = 7
    data = [
        (i, u, epoch + dt.timedelta(seconds=s), float(v))
        for i, (u, s, v) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "event_id long, user_id long, ts timestamp, value double"
    )
    got = {
        r["event_id"]: (r["n_window"], r["sum_window"])
        for r in rolling_user_features(df, days=days).collect()
    }
    span = days * 86_400
    for i, (u, s, v) in enumerate(rows):
        peers = [
            (vv)
            for j, (uu, ss, vv) in enumerate(rows)
            if uu == u and s - span <= ss <= s
        ]
        want = (len(peers), float(sum(peers)))
        assert got[i] == want, (i, got[i], want)


# ---------- mergeable sketch invariants ----------

@given(
    part_a=st.lists(st.integers(0, 40), max_size=40),
    part_b=st.lists(st.integers(0, 40), max_size=40),
)
@SET
def test_cms_merge_and_upper_bound(spark, part_a, part_b):
    """Two exact CMS invariants: (1) rollup(a) ++ rollup(b) merged ==
    rollup(a ++ b) row-for-row (the mergeability contract incremental
    maintenance relies on); (2) estimates never undercount."""
    from geist_spark.operators.sketch import (
        cms_estimate, cms_merge, cms_rollup,
    )

    width, depth = 32, 4  # small width so collisions actually happen
    mk = lambda items, part: spark.createDataFrame(
        [(part, str(x)) for x in items] or [(part, None)],
        "part string, item string",
    )
    both = mk(part_a, "a").unionByName(mk(part_b, "b"))
    merged = cms_merge(
        cms_rollup(both, ["part"], "item", width=width, depth=depth)
    )
    direct = cms_merge(
        cms_rollup(
            both.select(F.lit("all").alias("part"), "item"),
            ["part"], "item", width=width, depth=depth,
        )
    )
    as_map = lambda df: {
        (r["d"], r["pos"]): r["n"] for r in df.collect()
    }
    assert as_map(merged) == as_map(direct)

    items = both.filter(F.col("item").isNotNull()).select("item")
    est = {
        r["item"]: r["est_count"]
        for r in cms_estimate(
            merged, items, "item", width=width, depth=depth
        ).collect()
    }
    from collections import Counter
    true = Counter(str(x) for x in part_a + part_b)
    for item, n in true.items():
        assert est[item] >= n, (item, est[item], n)


@given(
    ids=st.lists(st.integers(0, 10_000), min_size=1, max_size=60,
                 unique=True),
    n_epochs=st.integers(1, 4),
    n_batches=st.integers(1, 9),
)
@SET
def test_epoch_shuffle_vs_replay(spark, ids, n_epochs, n_batches):
    """epoch_shuffle vs a pure-Python replay: every (row, epoch) pair
    appears exactly once, batch = floor(h / ceil(2^32/n_batches)) on
    the 32-bit md5 of 'epoch<e>|<id>', batch_e0 always mirrors the
    epoch-0 assignment, and batches partition [0, n_batches)."""
    import hashlib

    from geist_spark.operators.split import epoch_shuffle

    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {
        (r["doc_id"], r["epoch"]): (r["sort_key"], r["batch"], r["batch_e0"])
        for r in epoch_shuffle(df, n_epochs, n_batches).collect()
    }
    assert len(got) == len(ids) * n_epochs
    width = (1 << 32) // n_batches + (1 if (1 << 32) % n_batches else 0)

    def h(e, i):
        return int(
            hashlib.md5(f"epoch{e}|{i}".encode()).hexdigest()[:8], 16
        )

    for i in ids:
        for e in range(n_epochs):
            hk = h(e, i)
            want = (hk, hk // width, h(0, i) // width)
            assert got[(i, e)] == want, (i, e, got[(i, e)], want)
            assert 0 <= want[1] < n_batches


def _kmv_hash(x) -> int:
    import hashlib

    return int(hashlib.md5(str(x).encode()).hexdigest()[:8], 16)


@given(
    items_a=st.lists(st.integers(0, 300), max_size=60),
    items_b=st.lists(st.integers(0, 300), max_size=60),
    k=st.integers(2, 8),
)
@example(items_a=list(range(20)), items_b=list(range(10, 30)), k=4)
@SET
def test_kmv_merge_estimate_overlap_vs_replay(spark, items_a, items_b, k):
    """KMV/theta invariants vs an exact Python replay: (1) per-part
    rollups merged == direct rollup at the coarse grain (the merge
    contract); (2) the distinct estimate follows the (K-1)*2^32/h_K
    formula (exact count below K); (3) pairwise intersection estimates
    replay the theta-sketch rule |A∩B ∩ [0,θ)| * 2^32 / θ with
    θ = min over both sides (2^32 for an exact side).  Small k so both
    regimes and the θ cut actually trigger."""
    from geist_spark.operators.sketch import (
        KMV_RANGE, kmv_estimate, kmv_merge, kmv_overlap, kmv_rollup,
    )

    rows = [("a", "p1" if i % 2 else "p2", str(x))
            for i, x in enumerate(items_a)]
    rows += [("b", "p1", str(x)) for x in items_b]
    df = spark.createDataFrame(
        rows or [("a", "p1", None)], "g string, part string, item string"
    )
    merged = kmv_merge(
        kmv_rollup(df, ["g", "part"], "item", k=k), ["g"], k=k
    )
    direct = kmv_rollup(df, ["g"], "item", k=k)
    as_rows = lambda d: sorted(
        (r["g"], r["r"], r["h"]) for r in d.collect()
    )
    assert as_rows(merged) == as_rows(direct)

    def py_sketch(items):
        return sorted({_kmv_hash(x) for x in items})[:k]

    sk = {"a": py_sketch(items_a), "b": py_sketch(items_b)}
    est = {
        r["g"]: r["distinct_est"]
        for r in kmv_estimate(merged, ["g"], k=k).collect()
    }
    for g, hs in sk.items():
        if not hs:
            assert g not in est
            continue
        want = (
            round((k - 1) * float(KMV_RANGE) / hs[-1], 4)
            if len(hs) == k else float(len(hs))
        )
        assert est[g] == want, (g, est[g], want)

    got_ov = {
        (r["group_a"], r["group_b"]): (r["n_common"], r["intersect_est"])
        for r in kmv_overlap(merged, "g", k=k).collect()
    }
    theta = {
        g: hs[-1] if len(hs) == k else KMV_RANGE for g, hs in sk.items()
    }
    th = min(theta["a"], theta["b"])
    common = [h for h in set(sk["a"]) & set(sk["b"]) if h < th]
    if common:
        want_est = (
            float(len(common)) if th == KMV_RANGE
            else round(len(common) * float(KMV_RANGE) / th, 4)
        )
        assert got_ov[("a", "b")] == (len(common), want_est)
    else:
        assert ("a", "b") not in got_ov

    # include_empty completes the pair universe: the (a, b) pair is
    # ALWAYS present (zeros when disjoint/above-theta), and non-empty
    # pairs carry identical values to the default path
    if sk["a"] and sk["b"]:
        full = {
            (r["group_a"], r["group_b"]): (r["n_common"], r["intersect_est"])
            for r in kmv_overlap(merged, "g", k=k, include_empty=True).collect()
        }
        assert ("a", "b") in full
        assert full[("a", "b")] == got_ov.get(("a", "b"), (0, 0.0))


@given(
    values=st.lists(st.integers(0, 500), min_size=1, max_size=120),
    split=st.integers(1, 3),
)
@SET
def test_hll_exact_in_coupon_regime(spark, values, split):
    """At lg_k=12 and <=120 distinct values the datasketches HLL is in
    its exact (coupon) regime: the merged estimate must equal the true
    distinct count exactly — the invariant the q_hll_rollup oracle
    depends on (an sf0.1 gate run caught this drifting once)."""
    from geist_spark.operators.sketch import hll_merge, hll_rollup

    df = spark.createDataFrame(
        [(i % split, v) for i, v in enumerate(values)],
        "g long, v long",
    )
    got = hll_merge(hll_rollup(df, ["g"], "v")).collect()[0]
    assert int(round(got["distinct_est"])) == len(set(values))
    assert got["n_rows"] == len(values)


# ---------- MinHash-LSH exact replay ----------

def _py_minhash_pairs(docs, num_hashes=16, bands=4, k=3):
    """Exact Python replay of the dedup chain: normalize -> k-token
    shingles (Spark slice semantics: truncated tails allowed, distinct,
    empty filtered) -> md5-prefix hash -> universal min-hash ->
    band md5 -> pairs sharing any band."""
    import hashlib
    import re as _re

    from geist_spark.operators.dedup import MINHASH_P, minhash_params

    params = minhash_params(num_hashes)
    rpb = num_hashes // bands
    buckets = {}
    for doc_id, text in docs:
        norm = _re.sub(r"\s+", " ", text.lower()).strip()
        toks = norm.split(" ")
        upper = max(len(toks) - k, 0)
        sh = {
            " ".join(toks[i:i + k]) for i in range(upper + 1)
        } - {""}
        if not sh:
            continue
        hs = [
            int(hashlib.md5(s.encode()).hexdigest()[:8], 16) for s in sh
        ]
        sig = [min((a * h + b) % MINHASH_P for h in hs) for a, b in params]
        for b in range(bands):
            key = "|".join(str(v) for v in sig[b * rpb:(b + 1) * rpb])
            bh = hashlib.md5(key.encode()).hexdigest()
            buckets.setdefault((b, bh), set()).add(doc_id)
    pairs = set()
    for members in buckets.values():
        ms = sorted(members)
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                pairs.add((ms[i], ms[j]))
    return pairs


@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(["red", "fox", "jumps", "over", "dog", "the"]),
            max_size=8,
        ).map(" ".join),
        min_size=1, max_size=10,
    ),
)
@SET
def test_minhash_lsh_pairs_match_python_replay(spark, texts):
    from geist_spark.operators.dedup import minhash_lsh_pairs

    docs = list(enumerate(texts))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(df).collect()
    }
    assert got == _py_minhash_pairs(docs)


# ---------- SimHash exact replay ----------

@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(
                ["Red", "fox", "JUMPS", "over", "dog", "the", "a1"]
            ),
            max_size=10,
        ).map("  ".join),  # double spaces exercise normalization
        min_size=1, max_size=10,
    ),
)
@SET
def test_simhash_matches_python_replay(spark, texts):
    import hashlib
    import re as _re

    from geist_spark.operators.dedup import simhash

    docs = list(enumerate(texts))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r["simhash"] for r in simhash(df).collect()}
    for doc_id, text in docs:
        norm = _re.sub(r"\s+", " ", text.lower()).strip()
        toks = {t for t in norm.split(" ") if t} or None
        if toks is None:
            # empty docs produce no token rows -> absent from output
            assert doc_id not in got
            continue
        hs = [
            int(hashlib.md5(t.encode()).hexdigest()[:8], 16) for t in toks
        ]
        fp = 0
        for b in range(32):
            vote = sum(1 if (h >> b) & 1 else -1 for h in hs)
            if vote > 0:
                fp += 1 << b
        assert got[doc_id] == fp, (doc_id, text, got[doc_id], fp)


# ---------- Bloom filter: false negatives are impossible ----------

@given(
    inserted=st.sets(st.text(alphabet="abcdef", min_size=1, max_size=6),
                     min_size=1, max_size=30),
    probes=st.sets(st.text(alphabet="abcdef", min_size=1, max_size=6),
                   max_size=30),
)
@SET
def test_bloom_never_false_negative(spark, inserted, probes):
    from geist_spark.operators.prep import bloom_build, bloom_might_contain

    m_bits, num_hashes = 256, 4  # tiny filter: false positives likely,
    keys = spark.createDataFrame(
        [(k,) for k in inserted], "key string"
    )
    words = bloom_build(keys, "key", m_bits=m_bits, num_hashes=num_hashes)
    w = words.collect()[0]["words"]
    probe_df = spark.createDataFrame(
        [(k,) for k in sorted(inserted | probes)], "key string"
    )
    got = {
        r["key"]: r["hit"]
        for r in probe_df.crossJoin(F.broadcast(words)).select(
            "key",
            bloom_might_contain(
                F.col("words"), F.col("key"), m_bits, num_hashes
            ).alias("hit"),
        ).collect()
    }
    assert len(w) == m_bits // 64
    for k in inserted:  # a false negative is a correctness bug, always
        assert got[k], (k, "false negative")


# ---------- leakage-safe split: clusters are atomic ----------

@given(
    n_docs=st.integers(2, 15),
    edges=st.lists(
        st.tuples(st.integers(0, 14), st.integers(0, 14)), max_size=12
    ),
)
@SET
def test_leakage_safe_split_cluster_atomicity(spark, n_docs, edges):
    from geist_spark.operators.split import leakage_safe_split

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(n_docs)],
        "doc_id long, text string",
    )
    edges = [(a, b) for a, b in edges if a != b and a < n_docs and b < n_docs]
    pairs = spark.createDataFrame(
        edges or [(None, None)], "doc_a long, doc_b long"
    )
    out = leakage_safe_split(docs, pairs).collect()
    split_of = {r["doc_id"]: r["split"] for r in out}
    assert set(split_of) == set(range(n_docs))  # every doc, exactly once
    assert set(split_of.values()) <= {"train", "val", "test"}
    comp = _py_components(edges, set(range(n_docs)))
    for a, b in edges:
        assert split_of[a] == split_of[b], (a, b, split_of)
    # stronger: whole component shares one split
    by_root = {}
    for v, root in comp.items():
        by_root.setdefault(root, set()).add(split_of[v])
    assert all(len(s) == 1 for s in by_root.values()), by_root


# ---------- streaming sequence packing ----------

@given(
    docs=st.lists(
        st.tuples(
            st.sampled_from(["s1", "s2"]),
            st.lists(st.sampled_from(["w", "xx", "yyy"]), max_size=6).map(
                " ".join
            ),
        ),
        min_size=1, max_size=20,
    ),
    budget=st.sampled_from([1, 3, 7]),
)
@SET
def test_pack_sequences_matches_reference(spark, docs, budget):
    from geist_spark.operators.prep import pack_sequences

    rows = [(src, i, text) for i, (src, text) in enumerate(docs)]
    df = spark.createDataFrame(rows, "source string, doc_id long, text string")
    got = {
        (r["source"], r["bin_id"]): (r["n_docs"], r["total_tokens"])
        for r in pack_sequences(df, budget_tokens=budget).collect()
    }
    # reference: per group in doc_id order, bin = floor(exclusive
    # prefix sum / budget); token count = Spark split semantics
    # (split of '' -> [''] -> size 1)
    import re as _re
    want = {}
    by_src = {}
    for src, i, text in rows:
        by_src.setdefault(src, []).append((i, text))
    for src, lst in by_src.items():
        lst.sort()
        acc = 0
        for i, text in lst:
            norm = _re.sub(r"\s+", " ", text.lower()).strip()
            n_tok = len(norm.split(" "))
            b = acc // budget
            nd, tt = want.get((src, b), (0, 0))
            want[(src, b)] = (nd + 1, tt + n_tok)
            acc += n_tok
    assert got == want, (got, want)


# ---------- exact n-gram Jaccard ----------

@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(["red", "fox", "dog", "the", "runs"]),
            max_size=7,
        ).map(" ".join),
        min_size=2, max_size=8,
    ),
)
@SET
def test_ngram_jaccard_matches_reference(spark, texts):
    import decimal

    from geist_spark.operators.dedup import ngram_jaccard_pairs

    k, threshold = 3, 0.2
    docs = list(enumerate(texts))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"]): (r["n_common"], r["jaccard"])
        for r in ngram_jaccard_pairs(df, k=k, threshold=threshold).collect()
    }
    import re as _re
    sh = {}
    for i, text in docs:
        norm = _re.sub(r"\s+", " ", text.lower()).strip()
        toks = norm.split(" ")
        s = {
            " ".join(toks[j:j + k])
            for j in range(max(len(toks) - k, 0) + 1)
        } - {""}
        if s:
            sh[i] = s
    want = {}
    ids = sorted(sh)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            inter = len(sh[a] & sh[b])
            if not inter:
                continue  # pairs sharing no shingle never join
            j = decimal.Decimal(inter) / decimal.Decimal(
                len(sh[a] | sh[b])
            )
            j6 = float(j.quantize(
                decimal.Decimal("0.000001"),
                rounding=decimal.ROUND_HALF_UP,
            ))
            if j6 >= threshold:
                want[(a, b)] = (inter, j6)
    assert got == want, (got, want)


# ---------- partition-invariance of determinism claims ----------

@given(
    parts=st.sampled_from([1, 3, 32]),
    n=st.integers(1, 200),
    seed=st.integers(0, 3),
)
@SET
def test_eventsim_partition_invariant(spark, parts, n, seed):
    """Seeded eventsim claims md5-per-row-id generation — identical
    events at ANY parallelism. Regenerate the same tick with the
    default partitioning and with an explicit repartition(parts):
    the multiset of events must match bit-for-bit."""
    from geist_spark.sources.eventsim import EventSim, parse_sim_config

    cfg = parse_sim_config({
        "seed": seed,
        "eventGeneration": {"type": "random", "minCount": n, "maxCount": n},
        "eventSpec": {"fields": [
            {"field": "id", "randomizedValue": {"type": "uuid"}},
            {"field": "n", "randomizedValue": {"type": "int", "min": 0, "max": 99}},
            {"field": "kind", "predefinedValues": [
                {"value": "a", "frequencyFactor": 2},
                {"value": "b", "frequencyFactor": 1},
            ]},
        ]},
    })
    sim = EventSim(cfg, seed=seed)
    base = sorted(r["value"] for r in sim.batch(spark, count=n).collect())
    sim2 = EventSim(cfg, seed=seed)
    wide = sorted(
        r["value"]
        for r in spark.range(n).repartition(parts).select(
            sim2.event_expr(F.col("id")).alias("value")
        ).collect()
    )
    assert base == wide


@given(
    vals=st.lists(
        st.tuples(st.integers(0, 4), st.floats(
            min_value=-1e6, max_value=1e6, allow_nan=False, width=32
        )),
        min_size=1, max_size=60,
    ),
    parts=st.sampled_from([1, 7, 32]),
)
@SET
def test_exact_sum_and_digest_partition_invariant(spark, vals, parts):
    """exact_sum (decimal accumulation) and table_digest (sum of row
    fingerprints) both claim order/partition independence — the
    property two engines or two cluster sizes need to agree on the
    same answer. Compare 1-partition vs repartitioned results."""
    from geist_spark.operators.integrity import row_fingerprint
    from geist_spark.operators.relational import exact_sum

    df = spark.createDataFrame(vals, "k long, v double")
    def run(d):
        agg = d.groupBy("k").agg(
            exact_sum("v").alias("s"),
            F.sum(row_fingerprint(["k", "v"])).alias("digest"),
        )
        return {r["k"]: (r["s"], str(r["digest"])) for r in agg.collect()}

    assert run(df.coalesce(1)) == run(df.repartition(parts))


# ---------- BM25 integer-exact scoring replay ----------

@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(["red", "fox", "dog", "the", "run", "big"]),
            max_size=8,
        ).map(" ".join),
        min_size=1, max_size=8,
    ),
    qs=st.lists(
        st.lists(
            st.sampled_from(["red", "fox", "dog", "zzz", "the"]),
            min_size=1, max_size=3,
        ),
        min_size=1, max_size=3,
    ),
)
@SET
def test_bm25_matches_python_replay(spark, texts, qs):
    import math
    import re as _re
    from collections import Counter

    from geist_spark.operators.text import bm25_topk

    k_top = 3
    docs = list(enumerate(texts))
    queries = list(enumerate(qs))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["query_id"], r["rank"]): (r["doc_id"], r["score_nanos"])
        for r in bm25_topk(df, queries, k_top=k_top).collect()
    }

    # replica: identical integer formula, identical IEEE double chain
    tf, dl = {}, {}
    for i, text in docs:
        norm = _re.sub(r"\s+", " ", text.lower()).strip()
        toks = [t for t in norm.split(" ") if t]
        if not toks:
            continue  # docs with no tokens never enter dl/N
        dl[i] = len(toks)
        tf[i] = Counter(toks)
    N, totlen = len(dl), sum(dl.values())
    dfreq = Counter()
    for i in tf:
        for term in tf[i]:
            dfreq[term] += 1
    want = {}
    for qid, terms in queries:
        scores = Counter()
        for term in terms:  # duplicate query terms score twice
            if not dfreq[term]:
                continue
            for i in tf:
                t = tf[i].get(term)
                if not t:
                    continue
                num = (2 * N - 2 * dfreq[term] + 1) * 22 * t * totlen
                den = (2 * dfreq[term] + 1) * (
                    10 * totlen * t + 3 * totlen + 9 * dl[i] * N
                )
                scores[i] += math.floor(
                    float(num) / float(den) * 1000000000.0
                )
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        for rank, (i, s) in enumerate(ranked[:k_top], start=1):
            want[(qid, rank)] = (i, s)
    assert got == want, (got, want)


# ---------- histogram sketch -> quantiles ----------

@given(
    vals=st.lists(
        st.tuples(
            st.sampled_from(["g1", "g2"]),
            st.floats(min_value=-10.0, max_value=110.0,
                      allow_nan=False, width=32),
        ),
        min_size=1, max_size=50,
    ),
)
@SET
def test_hist_quantiles_match_reference(spark, vals):
    import math

    from geist_spark.operators.sketch import (
        hist_merge, hist_quantiles, hist_rollup,
    )

    lo, hi, n_bins = 0.0, 100.0, 16
    qs = [0.5, 0.95]
    df = spark.createDataFrame(vals, "g string, v double")
    hist = hist_merge(hist_rollup(df, ["g"], "v", lo, hi, n_bins), ["g"])
    got = {
        r["g"]: (r["p50"], r["p95"], r["n_values"])
        for r in hist_quantiles(hist, ["g"], qs, lo, hi, n_bins).collect()
    }
    width = (hi - lo) / n_bins
    by_g = {}
    for g, v in vals:
        b = math.floor((v - lo) / width)  # same IEEE ops as the plan
        by_g.setdefault(g, []).append(min(max(b, 0), n_bins - 1))
    want = {}
    for g, bins in by_g.items():
        total = len(bins)
        seen = {}
        for b in bins:
            seen[b] = seen.get(b, 0) + 1
        edges = []
        for q in qs:
            target = math.ceil(q * total)
            cum = 0
            edge = None
            for b in sorted(seen):
                cum += seen[b]
                if cum >= target:
                    edge = lo + b * width
                    break
            edges.append(edge)
        want[g] = (edges[0], edges[1], total)
    assert got == want, (got, want)


# ---------- first-order transition matrix ----------

@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 2),              # user
            st.integers(0, 20),             # ts seconds
            st.sampled_from(list("abc")),   # event type
        ),
        min_size=1, max_size=30,
    ),
)
@SET
def test_transition_matrix_matches_reference(spark, rows):
    import decimal

    from geist_spark.operators.relational import event_transition_matrix

    epoch = dt.datetime(2024, 1, 1)
    data = [
        (u, epoch + dt.timedelta(seconds=s), i, ty)
        for i, (u, s, ty) in enumerate(rows)  # i = unique event_id
    ]
    df = spark.createDataFrame(
        data, "user_id long, ts timestamp, event_id long, event_type string"
    )
    got = {
        (r["from_type"], r["to_type"]): (r["n"], r["p"])
        for r in event_transition_matrix(df).collect()
    }
    from collections import Counter
    steps = Counter()
    by_user = {}
    for u, s, ty in rows:
        by_user.setdefault(u, []).append((s, ty))
    for u, evs in by_user.items():
        # sort mirrors the window: (ts, event_id) == input order for ties
        idx = [(s, i, ty) for i, (s, ty) in enumerate(evs)]
        idx.sort()
        for (s1, i1, t1), (s2, i2, t2) in zip(idx, idx[1:]):
            steps[(t1, t2)] += 1
    outdeg = Counter()
    for (a, b), n in steps.items():
        outdeg[a] += n
    want = {}
    for (a, b), n in steps.items():
        p = float(
            decimal.Decimal(repr(n / outdeg[a])).quantize(
                decimal.Decimal("0.000001"),
                rounding=decimal.ROUND_HALF_UP,
            )
        )
        want[(a, b)] = (n, p)
    assert got == want, (got, want)


# ---------- cohort retention ----------

@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 4),               # user
            st.integers(0, 40 * 86_400),     # ts seconds over ~6 weeks
        ),
        min_size=1, max_size=40,
    ),
)
@SET
def test_cohort_retention_matches_reference(spark, rows):
    from geist_spark.operators.relational import cohort_retention

    epoch = dt.datetime(1970, 1, 1)  # ts epoch == generated seconds
    df = spark.createDataFrame(
        [(u, epoch + dt.timedelta(seconds=s)) for u, s in rows],
        "user_id long, ts timestamp",
    )
    period_days = 7
    got = {
        (r["cohort"], r["periods_since"]): r["n_users"]
        for r in cohort_retention(df, period_days=period_days).collect()
    }
    periods = {}
    for u, s in rows:
        periods.setdefault(u, set()).add((s // 86_400) // period_days)
    from collections import Counter
    want = Counter()
    users_at = {}
    for u, ps in periods.items():
        c = min(ps)
        for p in ps:
            users_at.setdefault((c, p - c), set()).add(u)
    want = {k: len(v) for k, v in users_at.items()}
    assert got == want, (got, want)


# ---------- mutual k-NN graph ----------

@given(
    vecs=st.lists(
        st.lists(st.integers(-5, 5), min_size=3, max_size=3),
        min_size=3, max_size=12, unique_by=tuple,
    ),
    k=st.integers(1, 3),
)
@SET
def test_mutual_knn_matches_python_replay(spark, vecs, k):
    import math

    from geist_spark.operators.similarity import mutual_knn_graph

    # avoid zero vectors (cosine undefined -> NULL, dropped by rank)
    vecs = [v if any(v) else [1, 0, 0] for v in vecs]
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in mutual_knn_graph(emb, k=k).collect()
    }
    # python replay of the rounded-cosine ranking
    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return round(d / (na * nb), 6)
    n = len(vecs)
    topk = {}
    for i in range(n):
        ranked = sorted(
            ((-cos(vecs[i], vecs[j]), j) for j in range(n) if j != i),
        )[:k]
        topk[i] = {j for _, j in ranked}
    want = {
        (a, b)
        for a in range(n) for b in range(a + 1, n)
        if b in topk[a] and a in topk[b]
    }
    assert got == want, (got, want)


# ---------- n-gram containment ----------

@given(
    docs=st.lists(
        st.lists(st.sampled_from(list("abcdef")), min_size=1, max_size=12),
        min_size=2, max_size=8,
    ),
    pct=st.sampled_from([50, 80, 100]),
)
@SET
def test_containment_matches_brute_force(spark, docs, pct):
    from geist_spark.operators.dedup import ngram_containment_pairs

    texts = [" ".join(toks) for toks in docs]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        (r["doc_a"], r["doc_b"]): (r["n_common"], r["n_a"], r["n_b"])
        for r in ngram_containment_pairs(df, k=3, threshold_pct=pct).collect()
    }
    def sh(toks):
        # mirror shingles(): windows of 3, padded semantics via
        # greatest(len-k, 0) -> at least one (possibly short) shingle
        n = max(len(toks) - 3, 0)
        return {" ".join(toks[i:i + 3]) for i in range(n + 1)}
    sets = [sh(t) for t in docs]
    want = {}
    for a in range(len(docs)):
        for b in range(a + 1, len(docs)):
            inter = len(sets[a] & sets[b])
            if inter and 100 * inter >= pct * min(len(sets[a]), len(sets[b])):
                want[(a, b)] = (inter, len(sets[a]), len(sets[b]))
    assert got == want, (got, want)


# ---------- curriculum interleave ----------

@given(
    diffs=st.lists(st.integers(0, 99), min_size=1, max_size=25),
    width=st.sampled_from([10, 25]),
    n_buckets=st.integers(2, 5),
)
@SET
def test_curriculum_matches_sorted_replay(spark, diffs, width, n_buckets):
    from geist_spark.operators.prep import curriculum_interleave

    df = spark.createDataFrame(
        list(enumerate(diffs)), "doc_id long, n_tokens long"
    )
    rows = curriculum_interleave(
        df, "n_tokens", n_buckets=n_buckets, bucket_width=width
    ).collect()
    got = [r["doc_id"] for r in sorted(rows, key=lambda r: r["position"])]
    # replay: bucket -> per-bucket (diff, id) order -> round-robin by
    # (step, bucket); this IS the total order the arithmetic encodes
    def bucket(d):
        return min(n_buckets, 1 + d // width)
    per = {}
    for i, d in enumerate(diffs):
        per.setdefault(bucket(d), []).append((d, i))
    key = []
    for b, items in per.items():
        items.sort()
        for step, (_, i) in enumerate(items, start=1):
            key.append((step, b, i))
    want = [i for _, _, i in sorted(key)]
    assert got == want, (got, want)
    # and position is a permutation of 1..N
    assert sorted(r["position"] for r in rows) == list(range(1, len(diffs) + 1))


# ---------- duplicate-span removal ----------

def _py_remove_spans(texts, k):
    """Exact replay of remove_dup_spans: gram match -> diagonal runs
    -> b-side spans -> strict-overlap merge -> cut."""
    grams = {}
    for d, t in texts.items():
        grams[d] = [(i, t[i:i + k]) for i in range(len(t) - k + 1)]
    spans = {}
    ids = sorted(texts)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            bypos = {}
            for pb, g in grams[b]:
                bypos.setdefault(g, []).append(pb)
            # matches on (diag, pa) with pa 1-indexed like the operator
            ms = sorted(
                (pa - pb, pa + 1)
                for pa, g in grams[a]
                for pb in bypos.get(g, [])
            )
            bydiag = {}
            for diag, pa1 in ms:
                bydiag.setdefault(diag, []).append(pa1)
            for diag, pas in bydiag.items():
                pas.sort()
                run = [pas[0]]
                for p in pas[1:]:
                    if p == run[-1] + 1:
                        run.append(p)
                    else:
                        spans.setdefault(b, set()).add(
                            (run[0] - diag, run[-1] - diag + k - 1)
                        )
                        run = [p]
                spans.setdefault(b, set()).add(
                    (run[0] - diag, run[-1] - diag + k - 1)
                )
    out = {}
    for d, t in texts.items():
        ss = sorted(spans.get(d, ()))
        merged = []
        for s0, e0 in ss:
            if merged and s0 <= merged[-1][1]:  # strict overlap only
                merged[-1][1] = max(merged[-1][1], e0)
            else:
                merged.append([s0, e0])
        kept, prev_end = [], 0
        for s0, e0 in merged:
            kept.append(t[prev_end: s0 - 1])  # 1-indexed spans
            prev_end = e0
        kept.append(t[prev_end:])
        new = "".join(kept)
        out[d] = (new, len(t) - len(new), len(merged))
    return out


@given(
    docs=st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=40),
        min_size=2, max_size=6,
    ),
    k=st.sampled_from([4, 6]),
)
@example(docs=["aaa", "aaa"], k=4)  # length == min_len-1: the pos=0
# descending-sequence row must NOT become a truncated-text gram
@example(docs=["", ""], k=4)        # empty docs emit zero grams
@SET
def test_remove_dup_spans_matches_python_replay(spark, docs, k):
    import hashlib

    from geist_spark.operators.dedup import remove_dup_spans

    texts = dict(enumerate(docs))
    df = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["text_md5"], r["n_chars_removed"], r["n_spans_removed"])
        for r in remove_dup_spans(df, min_len=k).collect()
    }
    want = {
        d: (hashlib.md5(new.encode()).hexdigest(), removed, nspans)
        for d, (new, removed, nspans) in _py_remove_spans(texts, k).items()
    }
    assert got == want, (got, want)


# ---------- fuzzy-match blocking completeness ----------

def _py_lev(a, b):
    """Classic unit-cost edit distance (the same metric Spark's
    levenshtein() computes)."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, start=1):
        cur = [i]
        for j, cb in enumerate(b, start=1):
            cur.append(min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (ca != cb),
            ))
        prev = cur
    return prev[-1]


@given(
    names=st.lists(
        st.text(alphabet="abcx ", min_size=3, max_size=10),
        min_size=2, max_size=10,
    ),
    max_dist=st.integers(1, 2),
)
@SET
def test_fuzzy_match_blocking_complete(spark, names, max_dist):
    """UNCAPPED q-gram blocking must find EVERY pair within max_dist
    (of the normalized strings long enough to index) — the blocking
    theorem fuzzy_match_pairs' docstring claims. Distances must also
    be exactly the unit-cost edit distance."""
    import re

    from geist_spark.operators.dedup import fuzzy_match_pairs

    df = spark.createDataFrame(
        list(enumerate(names)), "rec_id long, name string"
    )
    got = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in fuzzy_match_pairs(
            df, id_col="rec_id", text_col="name",
            max_dist=max_dist, gram=3, max_gram_freq=None,
        ).collect()
    }
    norm = [re.sub(r"\s+", " ", n.strip()).lower() for n in names]
    want = {}
    for a in range(len(names)):
        for b in range(a + 1, len(names)):
            if len(norm[a]) < 3 or len(norm[b]) < 3:
                continue  # below the gram size: not indexed
            d = _py_lev(norm[a], norm[b])
            if d <= max_dist and any(
                norm[a][i:i + 3] in norm[b]
                for i in range(len(norm[a]) - 2)
            ):
                want[(a, b)] = d
    # blocking completeness: every pair sharing >=1 gram and within
    # max_dist is found with the exact distance; nothing else is
    assert got == want, (got, want)


# ---------- winsorize ----------

@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["g1", "g2"]),
            st.integers(-1000, 1000),
        ),
        min_size=1, max_size=30,
    ),
)
@SET
def test_winsorize_matches_exact_percentile_clip(spark, rows):
    import datetime as _dt

    from geist_spark.operators.relational import winsorize

    data = [
        (g, float(v), _dt.datetime(2024, 1, 1), i, g)
        for i, (g, v) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data,
        "event_type string, value double, ts timestamp,"
        " event_id long, user_id string",
    )
    out = winsorize(df, "value", "event_type", 0.25, 0.75).collect()
    # exact interpolated percentile (Spark percentile() semantics)
    def pct(vals, q):
        vals = sorted(vals)
        if len(vals) == 1:
            return vals[0]
        pos = q * (len(vals) - 1)
        lo = int(pos)
        frac = pos - lo
        hi = min(lo + 1, len(vals) - 1)
        return vals[lo] + (vals[hi] - vals[lo]) * frac
    by_g = {}
    for g, v in rows:
        by_g.setdefault(g, []).append(float(v))
    bounds = {g: (pct(v, 0.25), pct(v, 0.75)) for g, v in by_g.items()}
    # winsorize preserves row count and clips into [lo, hi]
    assert len(out) == len(rows)
    from collections import Counter
    got = Counter((r["event_type"], r["clipped_value"]) for r in out)
    want = Counter(
        (g, round(min(max(float(v), bounds[g][0]), bounds[g][1]), 6))
        for g, v in rows
    )
    assert got == want, (got, want)
    # was_clipped is consistent with the bounds
    for r in out:
        lo, hi = bounds[r["event_type"]]
        assert r["was_clipped"] == (not lo <= r["raw_value"] <= hi), r


# ---------- salted aggregation / salted join equivalence ----------

@given(
    rows=st.lists(
        st.tuples(st.integers(0, 2), st.integers(-50, 50)),
        min_size=1, max_size=40,
    ),
    buckets=st.sampled_from([2, 16]),
)
@SET
def test_salted_aggregate_equals_plain_groupby(spark, rows, buckets):
    """Exactness under ANY salt assignment: the two-stage salted
    aggregate must equal the plain groupBy for every algebraic fn."""
    from geist_spark.operators.skew import salted_aggregate

    df = spark.createDataFrame(
        [(k, float(v)) for k, v in rows], "k long, v double"
    )
    got = {
        r["k"]: (r["s"], r["n"], r["mn"], r["mx"], r["a"])
        for r in salted_aggregate(
            df, ["k"],
            [("sum", "v", "s"), ("count", "v", "n"),
             ("min", "v", "mn"), ("max", "v", "mx"), ("avg", "v", "a")],
            salt_buckets=buckets,
        ).collect()
    }
    by_k = {}
    for k, v in rows:
        by_k.setdefault(k, []).append(float(v))
    want = {
        k: (
            float(sum(v)), len(v), min(v), max(v),
            float(sum(v)) / len(v),
        )
        for k, v in by_k.items()
    }
    assert got == want, (got, want)


@given(
    facts=st.lists(st.integers(0, 3), min_size=1, max_size=40),
    buckets=st.sampled_from([2, 8]),
)
@SET
def test_salted_join_equals_plain_join(spark, facts, buckets):
    from geist_spark.operators.skew import salted_join

    f = spark.createDataFrame([(k, i) for i, k in enumerate(facts)],
                              "k long, fact_id long")
    d = spark.createDataFrame([(0, "a"), (1, "b"), (2, "c")],
                              "k long, label string")
    got = sorted(
        (r["fact_id"], r["label"])
        for r in salted_join(f, d, "k", salt_buckets=buckets).collect()
    )
    want = sorted(
        (i, {0: "a", 1: "b", 2: "c"}[k])
        for i, k in enumerate(facts) if k in (0, 1, 2)
    )
    assert got == want, (got, want)


# ---------- touch attribution ----------

@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 2),                       # user
            st.integers(0, 100),                     # ts seconds
            st.sampled_from(["click", "view", "purchase", "other"]),
        ),
        min_size=1, max_size=30,
    ),
)
@SET
def test_attribution_matches_reference(spark, rows):
    from geist_spark.operators.relational import touch_attribution

    epoch = dt.datetime(2024, 1, 1)
    data = [
        (u, epoch + dt.timedelta(seconds=s), i, ty)
        for i, (u, s, ty) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "user_id long, ts timestamp, event_id long, event_type string"
    )
    got = {
        r["event_id"]: (r["first_touch"], r["last_touch"])
        for r in touch_attribution(df).collect()
    }
    by_user = {}
    for i, (u, s, ty) in enumerate(rows):
        by_user.setdefault(u, []).append((s, i, ty))
    want = {}
    for u, evs in by_user.items():
        evs.sort()  # (ts, event_id) — the window's order
        for pos, (s, i, ty) in enumerate(evs):
            if ty != "purchase":
                continue
            touches = [
                t2 for _, _, t2 in evs[:pos] if t2 in ("click", "view")
            ]
            want[i] = (
                touches[0] if touches else None,
                touches[-1] if touches else None,
            )
    assert got == want, (got, want)


# ---------- session co-occurrence ----------

@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 2),                       # user
            st.integers(0, 7200),                    # ts seconds (~2 h)
            st.sampled_from(list("abc")),            # event type
        ),
        min_size=1, max_size=30,
    ),
)
@SET
def test_cooccurrence_matches_reference(spark, rows):
    from collections import Counter

    from geist_spark.operators.relational import session_cooccurrence

    epoch = dt.datetime(2024, 1, 1)
    data = [
        (u, epoch + dt.timedelta(seconds=s), i, ty)
        for i, (u, s, ty) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "user_id long, ts timestamp, event_id long, event_type string"
    )
    got = {
        (r["type_a"], r["type_b"]): r["n_sessions"]
        for r in session_cooccurrence(
            df, gap_minutes=30, min_sessions=1
        ).collect()
    }
    # replay: gap sessionization (>30 min in integer micros), then
    # distinct types per session, then unordered-pair counts
    by_user = {}
    for i, (u, s, ty) in enumerate(rows):
        by_user.setdefault(u, []).append((s, i, ty))
    counts = Counter()
    for u, evs in by_user.items():
        evs.sort()
        seq = 0
        prev = None
        sessions = {}
        for s, i, ty in evs:
            if prev is None or (s - prev) * 1_000_000 > 30 * 60 * 1_000_000:
                seq += 1
            prev = s
            sessions.setdefault(seq, set()).add(ty)
        for types in sessions.values():
            ts_sorted = sorted(types)
            for x in range(len(ts_sorted)):
                for y in range(x + 1, len(ts_sorted)):
                    counts[(ts_sorted[x], ts_sorted[y])] += 1
    assert got == dict(counts), (got, counts)


# ---------- hourly gap fill ----------

@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 72),                      # hour offset (3 days)
            st.sampled_from(["a", "b"]),             # group
        ),
        min_size=1, max_size=25,
    ),
)
@SET
def test_gap_fill_dense_axis(spark, rows):
    from geist_spark.operators.relational import gap_fill_hourly

    epoch = dt.datetime(2024, 1, 1)
    data = [
        (g, epoch + dt.timedelta(hours=h, minutes=7), i)
        for i, (h, g) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "event_type string, ts timestamp, event_id long"
    )
    out = gap_fill_hourly(df, "event_type").collect()
    groups = sorted({g for _, g in rows})
    hours = [h for h, _ in rows]
    lo, hi = min(hours), max(hours)
    # dense axis: every (group, hour) in [lo, hi] appears exactly once
    assert len(out) == len(groups) * (hi - lo + 1)
    from collections import Counter
    want = Counter()
    for h, g in rows:
        want[(g, h)] += 1
    for r in out:
        h = int((r["hour"] - epoch).total_seconds() // 3600)
        assert lo <= h <= hi
        assert r["n"] == want.get((r[0], h), 0), (r, want)


# ---------- textrank keywords ----------

def _py_textrank(texts, stop, iters=3, num=85, den=100):
    """Reference TextRank: tokenize (lower/collapse-ws/split), drop
    stopwords+empties, edges between DIRECTLY adjacent survivors
    (original-position delta 1, w1 != w2), undirected distinct, then
    the exact integer pagerank (PR_SCALE grid, floor division —
    operands non-negative)."""
    import re

    from geist_spark.operators.graph import PR_SCALE

    edges = set()
    for t in texts:
        toks = re.sub(r"\s+", " ", t.lower()).strip().split(" ")
        keep = [(i, w) for i, w in enumerate(toks)
                if w != "" and w not in stop]
        for (pa, wa), (pb, wb) in zip(keep, keep[1:]):
            if pb - pa == 1 and wa != wb:
                edges.add((wa, wb))
                edges.add((wb, wa))
    if not edges:
        return None
    nodes = sorted({x for e in edges for x in e})
    n = len(nodes)
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    pr0 = PR_SCALE // n
    base = ((den - num) * pr0) // den
    pr = {v: pr0 for v in nodes}
    for _ in range(iters):
        inflow = {v: 0 for v in nodes}
        for s, d in edges:
            inflow[d] += pr[s] // outdeg[s]
        pr = {v: base + (num * inflow[v]) // den for v in nodes}
    return pr


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(
                ["the", "a", "spark", "shuffle", "join", "scan",
                 "broadcast", "skew", "", "codegen"]
            ),
            min_size=2, max_size=12,
        ).map(" ".join),
        min_size=1, max_size=8,
    )
)
@example(docs=["spark shuffle spark", "the spark the shuffle"])
@example(docs=["a the a", "join join join"])  # no edges / self-pairs only
@SET
def test_textrank_vs_replay(spark, docs):
    from geist_spark.operators.text import STOPWORDS, textrank_keywords

    want = _py_textrank(docs, set(STOPWORDS["en"]))
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    if want is None:
        import pytest

        with pytest.raises(ValueError):
            textrank_keywords(df).collect()
        return
    got = [
        (r["word"], r["pr"], r["rank"])
        for r in textrank_keywords(df, top_n=20).collect()
    ]
    top = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert got == [
        (w, p, i + 1) for i, (w, p) in enumerate(top)
    ]


# ---------- holt forecast ----------

def _py_holt(ys, an=3, ad=10, bn=1, bd=5, scale=1000):
    """Reference Holt replay: scaled-long recurrences with true floor
    division (Python // floors for negatives, matching the operator's
    subtract-pmod spelling)."""
    L, T = ys[0] * scale, 0
    for y in ys[1:]:
        lp = (an * y * scale + (ad - an) * (L + T)) // ad
        T = (bn * (lp - L) + (bd - bn) * T) // bd
        L = lp
    return L, T


@given(
    series=st.lists(
        st.lists(st.integers(1, 50), min_size=1, max_size=30),
        min_size=1, max_size=4,
    )
)
@example(series=[[50, 1, 1, 1, 1]])   # steep negative trend
@example(series=[[1], [2, 2]])        # single-day key
@SET
def test_holt_forecast_vs_replay(spark, series):
    """holt_forecast == the Python floor-division replay per key,
    including NEGATIVE trends (the case where truncating division
    would silently diverge from the oracle's floor)."""
    from geist_spark.operators.drift import holt_forecast

    rows = []
    for k, ys in enumerate(series):
        for d, y in enumerate(ys):
            base = dt.datetime(2024, 1, 1) + dt.timedelta(days=d)
            for j in range(y):
                rows.append(
                    (f"k{k}", base + dt.timedelta(seconds=j), j)
                )
    df = spark.createDataFrame(
        rows, "event_type string, ts timestamp, event_id long"
    )
    got = {
        r["event_type"]: r
        for r in holt_forecast(df, horizon=7).collect()
    }
    assert set(got) == {f"k{k}" for k in range(len(series))}
    for k, ys in enumerate(series):
        L, T = _py_holt(ys)
        r = got[f"k{k}"]
        assert r["n_days"] == len(ys)
        assert (r["level_fx"], r["trend_fx"]) == (L, T), (k, ys)
        assert r["forecast_next_fx"] == L + T
        assert r["forecast_h_fx"] == L + 7 * T


# ---------- random projection ----------

def _py_rp(vecs, dim, out_dim, scale):
    from geist_spark.operators.similarity import _rp_signs

    signs = _rp_signs(dim, out_dim)
    import math

    out = {}
    for vid, v in vecs.items():
        fx = [math.floor(float(x) * scale) for x in v]
        out[vid] = [
            float(sum(a * s for a, s in zip(fx, row))) for row in signs
        ]
    return out


@given(
    vecs=st.dictionaries(
        st.integers(0, 20),
        st.lists(
            st.floats(-1, 1, allow_nan=False, width=32),
            min_size=8, max_size=8,
        ),
        min_size=1, max_size=10,
    )
)
@SET
def test_random_projection_vs_replay(spark, vecs):
    """random_projection == the Python fixed-point sign-matrix replay
    (exact integers, any float input)."""
    from geist_spark.operators.similarity import RP_SCALE, random_projection

    df = spark.createDataFrame(
        [(k, v) for k, v in vecs.items()],
        "vec_id long, embedding array<float>",
    )
    got = {
        r["vec_id"]: list(r["embedding"])
        for r in random_projection(df, dim=8, out_dim=4).collect()
    }
    assert got == _py_rp(vecs, 8, 4, RP_SCALE)


# ---------- geo radius join ----------

@given(
    pts=st.lists(
        st.tuples(st.integers(-200, 200), st.integers(-200, 200)),
        min_size=1, max_size=25,
    ),
    sts=st.lists(
        st.tuples(st.integers(-200, 200), st.integers(-200, 200)),
        min_size=1, max_size=6,
    ),
    r=st.integers(1, 120),
)
@example(pts=[(0, 0), (100, 0)], sts=[(100, 0)], r=100)  # inclusive edge
@example(pts=[(-1, -1)], sts=[(1, 1)], r=3)              # cross-origin cells
@SET
def test_geo_radius_join_vs_bruteforce(spark, pts, sts, r):
    """Grid 3x3 bucket join returns EXACTLY the brute-force pair set
    (completeness: no pair within r escapes the neighbor cells;
    soundness: the d2 confirm rejects same-cell far pairs), including
    negative coordinates and the inclusive boundary."""
    from geist_spark.operators.geo import geo_radius_join

    p = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(pts)],
        "event_id long, lat long, lon long",
    )
    s = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(sts)],
        "site_id long, site_lat long, site_lon long",
    )
    got = {
        (r_["event_id"], r_["site_id"], r_["d2_micro"])
        for r_ in geo_radius_join(p, s, radius_micro=r).collect()
    }
    want = set()
    for i, (a, b) in enumerate(pts):
        for j, (c, d) in enumerate(sts):
            d2 = (a - c) ** 2 + (b - d) ** 2
            if d2 <= r * r:
                want.add((i, j, d2))
    assert got == want


def test_random_projection_dim_mismatch_fails_fast(spark):
    """A wrong `dim` must raise immediately, not emit all-NULL
    projections (zip_with pads the short side with NULLs)."""
    import pytest

    from geist_spark.operators.similarity import random_projection

    df = spark.createDataFrame(
        [(0, [0.1] * 8)], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValueError, match="dim=16"):
        random_projection(df, dim=16, out_dim=4)


def test_litx_roundtrip_and_empty_rejection(spark):
    """functions/litx.py batch literals: exact round-trip for longs
    (beyond int32), IEEE doubles (repr-exact), and quoted strings;
    empty inputs rejected."""
    import pytest

    from geist_spark.functions.litx import (
        double_array, long_array, long_matrix, string_array,
    )

    longs = [0, -1, 3_000_000_000, -(2**62)]
    dbls = [0.1, -1.5e-7, 2.0**-20, -0.0, 1e300]
    strs = ["a", "it's", "x y", "", "a\\b", "tab\\t", "ends\\"]
    row = spark.range(1).select(
        long_array(longs).alias("l"),
        long_matrix([longs, [7, 8]]).alias("m"),
        double_array(dbls).alias("d"),
        string_array(strs).alias("s"),
    ).collect()[0]
    assert list(row["l"]) == longs
    assert [list(x) for x in row["m"]] == [longs, [7, 8]]
    # repr comparison: -0.0 == 0.0 is True in Python, so plain == could
    # not see a dropped sign bit
    assert [repr(x) for x in row["d"]] == [repr(x) for x in dbls]
    assert list(row["s"]) == strs
    for fn in (long_array, double_array, string_array, long_matrix):
        with pytest.raises(ValueError):
            fn([])


def _py_kcore(edges: list[tuple[int, int]], k: int) -> dict[int, int]:
    """Reference peeling: undirected, dedup, no self-loops; returns
    {node: degree} of the k-core fixed point."""
    es = {
        (a, b) for a, b in edges if a != b
    } | {(b, a) for a, b in edges if a != b}
    while True:
        deg: dict[int, int] = {}
        for a, _ in es:
            deg[a] = deg.get(a, 0) + 1
        keep = {n for n, d in deg.items() if d >= k}
        nxt = {(a, b) for a, b in es if a in keep and b in keep}
        if nxt == es:
            break
        es = nxt
    out: dict[int, int] = {}
    for a, _ in es:
        out[a] = out.get(a, 0) + 1
    return out


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 10), st.integers(0, 10)), max_size=30
    ),
    k=st.integers(1, 4),
)
@SET
def test_kcore_matches_python_peeling(spark, edges, k):
    from geist_spark.operators.graph import kcore

    df = spark.createDataFrame(
        [(a, b) for a, b in edges] or [(0, 0)], "src long, dst long"
    )
    got = {r["node"]: r["degree"] for r in kcore(df, k=k).collect()}
    assert got == _py_kcore(edges, k)


def _py_luhn(s: str) -> bool:
    d = [int(c) for c in s if c.isdigit()][::-1]
    if not 13 <= len(d) <= 19:
        return False
    tot = 0
    for i, x in enumerate(d):
        if i % 2 == 1:
            x *= 2
            if x > 9:
                x -= 9
        tot += x
    return tot % 10 == 0


@given(
    runs=st.lists(
        st.text(alphabet="0123456789 -", min_size=12, max_size=25),
        min_size=1,
        max_size=4,
    )
)
@SET
def test_card_scrub_matches_python_luhn(spark, runs):
    """Candidate extraction + Luhn gate replayed in python over
    arbitrary digit/sep runs embedded in text."""
    import re

    from geist_spark.operators.prep import CARD_CAND_RE, credit_card_scrub

    text = "x " + " y ".join(runs) + " z"
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    row = credit_card_scrub(df).collect()[0]
    cands = re.findall(CARD_CAND_RE, text)
    valid = [c for c in cands if _py_luhn(c)]
    expected = text
    for c in valid:
        expected = expected.replace(c, "<CARD>")
    assert row["n_candidates"] == len(cands)
    assert row["n_valid_cards"] == len(valid)
    assert row["redacted_text"] == expected


def _py_mmr(
    vecs: dict[int, list[float]], qid: int, k: int, lam_num: int, lam_den: int
) -> list[tuple[int, int, int, int]]:
    """Greedy MMR replay in the same micro-scaled integer arithmetic."""
    import math

    def cos6(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        c = round(dot / (na * nb), 6)
        return int(round(c * 1_000_000, 0))

    q = vecs[qid]
    rel = {i: cos6(v, q) for i, v in vecs.items() if i != qid}
    mu = lam_den - lam_num
    sel: list[int] = []
    out = []
    for rank in range(1, k + 1):
        best = None
        for i in sorted(rel):
            if i in sel:
                continue
            red = max((cos6(vecs[i], vecs[s]) for s in sel), default=0)
            score = lam_num * rel[i] - mu * red
            key = (score, -i)
            if best is None or key > best[0]:
                best = (key, i, red, score)
        if best is None:
            break
        _, i, red, score = best
        sel.append(i)
        out.append((rank, i, rel[i], red))
    return out


@given(
    n=st.integers(3, 7),
    seed=st.integers(0, 10_000),
    lam=st.integers(1, 10),
)
@SET
def test_mmr_matches_python_greedy(spark, n, seed, lam):
    import random

    rng = random.Random(seed)
    vecs = {
        i: [rng.randint(-4, 4) / 2.0 or 0.5 for _ in range(4)]
        for i in range(n)
    }
    from geist_spark.operators.similarity import mmr_select

    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()],
        "vec_id long, embedding array<float>",
    )
    got = [
        (r["rank"], r["vec_id"], r["rel6"], r["red6"])
        for r in mmr_select(
            df, query_id=0, k=3, lam_num=lam, lam_den=10
        ).orderBy("rank").collect()
    ]
    # float32 storage: python must see the same float32-rounded values
    import struct as _struct

    f32 = lambda x: _struct.unpack("f", _struct.pack("f", x))[0]  # noqa: E731
    vecs32 = {i: [f32(x) for x in v] for i, v in vecs.items()}
    assert got == _py_mmr(vecs32, qid=0, k=3, lam_num=lam, lam_den=10)


# ---------- keyed-table merge sink ----------

def _py_merge_store(batches, keep):
    """Reference model of writeMode='merge': versions keyed by
    (row key, ingestion ts); same-ts incoming replaces; newest `keep`
    per key survive each write (eviction is permanent)."""
    store = {}  # key -> {ts_second: amount}
    for rows, _replay in batches:
        for (k, s), a in rows.items():
            store.setdefault(k, {})[s] = a
        for (k, _s), _a in rows.items():
            newest = sorted(store[k], reverse=True)[:keep]
            store[k] = {t: store[k][t] for t in newest}
    return {
        (k, s, a) for k, vs in store.items() for s, a in vs.items()
    }


@given(
    batches=st.lists(
        st.tuples(
            st.dictionaries(
                st.tuples(st.sampled_from("abcde"), st.integers(0, 5)),
                st.integers(0, 100),
                min_size=1,
                max_size=4,
            ),
            st.booleans(),  # replay this batch (at-least-once retry)?
        ),
        min_size=1,
        max_size=3,
    ),
)
@example(  # review-finding regression: replay with maxVersions>1 must
    # replace the stored (key, ts) twin, not evict an older version
    batches=[({("a", 1): 1}, False), ({("a", 2): 2}, True)],
)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_merge_sink_matches_python_model(spark, batches):
    from geist_spark.sinks.keyed_table import KeyedTableLoader, new_temp_path
    from geist_spark.spec.model import parse_spec

    keep = 2
    spec = parse_spec({
        "namespace": "prop", "streamIdSuffix": "mrg",
        "description": "merge property", "version": 1,
        "source": {"type": "geistapi"},
        "transform": {"extractFields": [{"fields": [
            {"id": "name", "jsonPath": "name"}]}]},
        "sink": {"type": "keyedTable", "config": {"customConfig": {
            "path": new_temp_path(), "rowKeyFields": ["name"],
            "writeMode": "merge", "mergeBuckets": 4,
            "maxVersions": keep}}},
    })
    loader = KeyedTableLoader(spark, spec)
    for i, (rows, replay) in enumerate(batches):
        bdf = spark.createDataFrame(
            [(k, a, dt.datetime(2024, 1, 1, 0, 0, s))
             for (k, s), a in rows.items()],
            "name string, amount long, `@GeistIngestionTime` timestamp",
        )
        for _ in range(2 if replay else 1):
            loader.stream_load(bdf, epoch_id=i)
    got = {
        (r["name"], r["__geist_ingestion_time"].second, r["amount"])
        for r in loader.extract_all().collect()
    }
    assert got == _py_merge_store(batches, keep)


# ---------- pure-python media decoders ----------

def _py_luma(pixels):
    sr = sum(p[0] for p in pixels)
    sg = sum(p[1] for p in pixels)
    sb = sum(p[2] for p in pixels)
    return (299 * sr + 587 * sg + 114 * sb) // len(pixels)


@given(
    w=st.integers(1, 5),
    h=st.integers(1, 4),
    seed=st.integers(0, 10_000),
    top_down=st.booleans(),
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_decode_real_cross_format_property(spark, w, h, seed, top_down):
    """Any random image: the PPM encoding and the (bottom-up or
    top-down) BMP encoding decode to the SAME pixel hash, and the
    exact luma matches the python reference."""
    import random

    from tests.test_multimodal import _bmp_bytes, _ppm_bytes
    from geist_spark.operators.multimodal import decode_real

    rng = random.Random(seed)
    pixels = [
        (rng.randrange(256), rng.randrange(256), rng.randrange(256))
        for _ in range(w * h)
    ]
    media = spark.createDataFrame(
        [(1, _ppm_bytes(w, h, pixels)),
         (2, _bmp_bytes(w, h, pixels, top_down=top_down))],
        "media_id long, payload binary",
    )
    out = {r["media_id"]: r for r in decode_real(media).collect()}
    assert out[1]["pixel_md5"] == out[2]["pixel_md5"]
    assert out[1]["mean_luma_fx"] == out[2]["mean_luma_fx"] == _py_luma(pixels)
    assert (out[1]["width"], out[1]["height"]) == (w, h)


@given(
    w=st.integers(1, 5),
    h=st.integers(1, 4),
    seed=st.integers(0, 10_000),
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_decode_real_png_property(spark, w, h, seed):
    """Any random image with RANDOM per-row PNG filter types decodes
    to the same pixel hash and exact luma as its PPM encoding — the
    unfiltering paths (None/Sub/Up/Average/Paeth) are all equivalent
    on reconstruction."""
    import random

    from tests.test_multimodal import _ppm_bytes
    from geist_spark.operators.multimodal import decode_real, png_encode_rgb

    rng = random.Random(seed)
    pixels = [
        (rng.randrange(256), rng.randrange(256), rng.randrange(256))
        for _ in range(w * h)
    ]
    rgb = bytes(v for p in pixels for v in p)
    filters = [rng.randrange(5) for _ in range(h)]
    # Adam7: one random filter per non-empty pass scanline
    from geist_spark.operators.multimodal import _ADAM7_PASSES
    total = sum(
        (h - y0 + ys - 1) // ys
        for x0, y0, xs, ys in _ADAM7_PASSES
        if (w - x0 + xs - 1) // xs > 0 and (h - y0 + ys - 1) // ys > 0
    )
    i7_filters = [rng.randrange(5) for _ in range(total)]
    media = spark.createDataFrame(
        [(1, _ppm_bytes(w, h, pixels)),
         (2, png_encode_rgb(w, h, rgb, filters)),
         (3, png_encode_rgb(w, h, rgb, i7_filters, interlace=True))],
        "media_id long, payload binary",
    )
    out = {r["media_id"]: r for r in decode_real(media).collect()}
    assert out[1]["pixel_md5"] == out[2]["pixel_md5"], filters
    assert out[1]["pixel_md5"] == out[3]["pixel_md5"], i7_filters
    assert out[2]["mean_luma_fx"] == _py_luma(pixels)
    assert (out[2]["width"], out[2]["height"]) == (w, h)
    assert (out[3]["width"], out[3]["height"]) == (w, h)


@given(
    n=st.integers(1, 12),
    seed=st.integers(0, 10_000),
    bits=st.sampled_from([8, 16]),
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_decode_audio_real_property(spark, n, seed, bits):
    """Random PCM: exact peak and floor-mean-square match the python
    reference for 8-bit (centered) and 16-bit (signed) samples."""
    import random

    from tests.test_multimodal import _wav_bytes
    from geist_spark.operators.multimodal import decode_audio_real

    rng = random.Random(seed)
    if bits == 16:
        samples = [rng.randrange(-32768, 32768) for _ in range(n)]
    else:
        samples = [rng.randrange(-128, 128) for _ in range(n)]
    media = spark.createDataFrame(
        [(1, _wav_bytes(samples, bits=bits))],
        "media_id long, payload binary",
    )
    r = decode_audio_real(media).collect()[0]
    assert r["n_frames"] == n
    assert r["peak_abs"] == max(abs(s) for s in samples)
    assert r["mean_square_fx"] == sum(s * s for s in samples) // n


@given(
    w=st.integers(1, 4),
    h=st.integers(1, 3),
    ow=st.integers(1, 5),
    oh=st.integers(1, 4),
    seed=st.integers(0, 10_000),
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_resize_real_matches_python_nn(spark, w, h, ow, oh, seed):
    """Random image, random target dims: the resized exact luma equals
    a python nearest-neighbor reference using the same index map."""
    import random

    from tests.test_multimodal import _ppm_bytes
    from geist_spark.operators.multimodal import resize_real

    rng = random.Random(seed)
    pixels = [
        (rng.randrange(256), rng.randrange(256), rng.randrange(256))
        for _ in range(w * h)
    ]
    resized = [
        pixels[(j * h // oh) * w + (i * w // ow)]
        for j in range(oh)
        for i in range(ow)
    ]
    media = spark.createDataFrame(
        [(1, _ppm_bytes(w, h, pixels))], "media_id long, payload binary"
    )
    r = resize_real(media, ow, oh).collect()[0]
    assert r["mean_luma_fx"] == _py_luma(resized)


@given(data=st.binary(min_size=0, max_size=3000))
@settings(max_examples=40, deadline=None)
def test_tiff_lzw_roundtrip_property(data):
    """Arbitrary bytes survive the TIFF LZW encoder/decoder pair —
    early-change width bumps and the table-reset margin included
    (hypothesis shrinks any width-misalignment to a tiny case)."""
    from geist_spark.operators.multimodal import (
        _tiff_lzw_decode,
        _tiff_lzw_encode,
    )

    assert _tiff_lzw_decode(_tiff_lzw_encode(data), len(data)) == data


@given(data=st.binary(min_size=0, max_size=3000))
@settings(max_examples=40, deadline=None)
def test_packbits_roundtrip_property(data):
    from geist_spark.operators.multimodal import (
        _packbits_decode,
        _packbits_encode,
    )

    assert _packbits_decode(_packbits_encode(data), len(data)) == data


@given(
    nibbles=st.lists(st.integers(0, 15), min_size=2, max_size=400),
    pred0=st.integers(-32768, 32767),
    idx0=st.integers(0, 88),
)
@settings(max_examples=30, deadline=None)
def test_ima_adpcm_matches_audioop_property(nibbles, pred0, idx0):
    """The IMA ADPCM state machine matches CPython's audioop
    bit-for-bit on arbitrary nibble streams and initial states
    (audioop packs high-nibble-first; WAV packs low-first)."""
    import struct
    import warnings

    import numpy as np

    from geist_spark.operators.multimodal import _ima_adpcm_decode

    if len(nibbles) % 2:
        nibbles = nibbles[:-1]
    wav_bytes = bytes(
        nibbles[i] | (nibbles[i + 1] << 4)
        for i in range(0, len(nibbles), 2)
    )
    block = struct.pack("<hBB", pred0, idx0, 0) + wav_bytes
    mine = _ima_adpcm_decode(block, 1, len(block))
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        import audioop
    aud = bytes(
        (nibbles[i] << 4) | nibbles[i + 1]
        for i in range(0, len(nibbles), 2)
    )
    lin, _ = audioop.adpcm2lin(aud, 2, (pred0, idx0))
    ref = np.frombuffer(lin, dtype="<i2").astype(np.int64)
    assert mine[0] == pred0
    assert (mine[1:] == ref).all()


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    pages=st.lists(
        st.lists(
            st.text(
                alphabet=st.characters(
                    min_codepoint=0x20, max_codepoint=0xFF,
                    blacklist_characters="".join(
                        chr(c) for c in range(0x7F, 0xA1)
                    ),
                ),
                max_size=40,
            ),
            min_size=1,
            max_size=4,
        ),
        min_size=1,
        max_size=3,
    ),
    flate=st.booleans(),
    xref_stream=st.booleans(),
    objstm=st.booleans(),
    tj=st.booleans(),
)
def test_pdf_text_roundtrip_property(pages, flate, xref_stream, objstm, tj):
    """Random page texts (printable latin-1 incl. parens/backslashes
    that exercise string escaping) round-trip through the paired PDF
    writer and reader under every container combination — the
    writer/reader pair must agree on escaping, offsets, Flate,
    xref-stream fields, and object-stream packing for ARBITRARY
    text, not just the fixture corpus."""
    from geist_spark.operators.pdf import (
        _pdf_pages,
        content_ops,
        pdf_build,
    )

    streams = [content_ops(lines, use_tj_array=tj) for lines in pages]
    pdf = pdf_build(
        streams, flate=flate, xref_stream=xref_stream,
        objstm=xref_stream and objstm,
    )
    got = list(_pdf_pages(pdf, 1 << 22))
    assert len(got) == len(pages)
    for (idx, text), lines in zip(got, pages):
        enc = [
            ln.encode("cp1252", errors="replace").decode("cp1252")
            for ln in lines
        ]
        # the reader's line rule: T* opens a new line only when the
        # current one is non-empty; trailing blanks drop
        out_lines = []
        for ln in enc:
            if out_lines and out_lines[-1] == "":
                out_lines[-1] = ln
            else:
                out_lines.append(ln)
        while out_lines and out_lines[-1] == "":
            out_lines.pop()
        assert text == "\n".join(out_lines), (lines, text)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    data=st.data(),
    texts=st.lists(st.text(max_size=80), min_size=1, max_size=6),
)
def test_decode_text_roundtrip_property(spark, data, texts):
    """Random texts round-trip byte-exactly through the REAL Spark
    decode_text operator under randomly chosen charsets and
    declaration tiers (BOM / HTTP header / html meta) — the sniff
    precedence and codec plumbing must hold for arbitrary content,
    not just the fixture corpus."""
    import re

    from geist_spark.operators.web import decode_text

    rows, want = [], {}
    for i, text in enumerate(texts):
        if "\ufffd" in text or re.search(r"(?i)charset", text):
            continue  # replacement chars / smuggled declarations
        charset = data.draw(st.sampled_from(
            ["utf-8", "utf-16-le", "utf-16-be", "cp1251", "cp1252",
             "shift_jis", "gbk"]
        ))
        tier = data.draw(st.sampled_from(["bom", "header", "meta"]))
        try:
            body = text.encode(charset)
        except UnicodeEncodeError:
            continue
        if tier == "bom":
            if charset not in ("utf-8", "utf-16-le", "utf-16-be"):
                continue
            bom = {"utf-8": b"\xef\xbb\xbf", "utf-16-le": b"\xff\xfe",
                   "utf-16-be": b"\xfe\xff"}[charset]
            if charset == "utf-16-le" and body[:2] == b"\x00\x00":
                continue  # ambiguous with the utf-32-le BOM
            rows.append((i, bom + body, None))
            want[i] = text
        elif tier == "header":
            rows.append((i, body, f"text/plain; charset={charset}"))
            want[i] = text
        else:
            prefix = f'<meta charset="{charset}">'
            try:
                payload = prefix.encode(charset) + body
            except UnicodeEncodeError:
                continue
            if not payload.startswith(prefix.encode("ascii")):
                continue  # charset not ASCII-transparent for the tag
            rows.append((i, payload, None))
            want[i] = prefix + text
    if not rows:
        return
    df = spark.createDataFrame(
        rows, "doc_id long, body binary, content_type string"
    )
    out = {r["doc_id"]: r["text"] for r in
           decode_text(df, content_type_col="content_type").collect()}
    assert out == want


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    pages=st.lists(
        st.lists(
            st.text(
                alphabet=st.characters(
                    min_codepoint=0x20,
                    blacklist_categories=("Cs",),
                ),
                max_size=30,
            ),
            min_size=1,
            max_size=3,
        ),
        min_size=1,
        max_size=3,
    ),
    flate=st.booleans(),
    xref_stream=st.booleans(),
    objstm=st.booleans(),
)
def test_pdf_type0_roundtrip_property(pages, flate, xref_stream, objstm):
    """ARBITRARY Unicode page text (CJK, combining marks, astral
    emoji — everything cp1252 can't express) round-trips EXACTLY
    through the Type0/Identity-H + ToUnicode writer/reader pair under
    every container combination: the fixture cidmap is non-Identity,
    so this pins the whole CMap chain (codespace, bfchar incl.
    surrogate-pair destinations, incrementing bfrange, 2-byte CID
    shows in Tj and TJ arrays)."""
    from geist_spark.operators.pdf import _pdf_pages, pdf_build

    pdf = pdf_build(
        [], type0_pages=pages, flate=flate,
        xref_stream=xref_stream, objstm=xref_stream and objstm,
    )
    got = list(_pdf_pages(pdf, 1 << 22))
    assert len(got) == len(pages)
    for (idx, text), lines in zip(got, pages):
        out_lines = []
        for ln in lines:
            if out_lines and out_lines[-1] == "":
                out_lines[-1] = ln
            else:
                out_lines.append(ln)
        while out_lines and out_lines[-1] == "":
            out_lines.pop()
        assert text == "\n".join(out_lines), (lines, text)


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 12),
    data=st.data(),
    subtract_green=st.booleans(),
    use_lz77=st.booleans(),
    cache_bits=st.sampled_from([0, 0, 3, 7]),
    mode=st.sampled_from(["rgb", "alpha", "palette", "predictor"]),
)
def test_vp8l_roundtrip_property(
    w, h, data, subtract_green, use_lz77, cache_bits, mode
):
    """ARBITRARY RGBA pixels round-trip bit-exactly through the paired
    VP8L encoder/decoder under random feature combinations — entropy
    coding (simple + code-length-coded prefix codes with RLE), LZ77,
    color cache, palette bundling, all predictor modes, and the
    alpha-over-white composite all pinned at property strength."""
    import random as _random

    from geist_spark.operators.vp8l import vp8l_encode, webp_decode_rgb

    rng = _random.Random(data.draw(st.integers(0, 2**31)))
    kw = dict(subtract_green=subtract_green, use_lz77=use_lz77,
              cache_bits=cache_bits)
    alpha = False
    ncolors = None
    if mode == "alpha":
        alpha = True
    elif mode == "palette":
        kw = dict(palette=True, use_lz77=use_lz77,
                  cache_bits=cache_bits)
        ncolors = data.draw(st.integers(1, 40))
        alpha = data.draw(st.booleans())
    elif mode == "predictor":
        kw["predictor"] = data.draw(st.integers(0, 13))
    if ncolors:
        pal = [
            (rng.randrange(256), rng.randrange(256), rng.randrange(256),
             255 if not alpha else rng.randrange(256))
            for _ in range(ncolors)
        ]
        px = [pal[rng.randrange(ncolors)] for _ in range(w * h)]
    else:
        px = [
            (rng.randrange(256), rng.randrange(256), rng.randrange(256),
             255 if not alpha else rng.randrange(256))
            for _ in range(w * h)
        ]
    rgba = b"".join(bytes(p) for p in px)
    fmt, dw, dh, ch, rgb = webp_decode_rgb(vp8l_encode(w, h, rgba, **kw))
    assert (dw, dh) == (w, h)
    exp = bytearray()
    for r, g, b, a in px:
        if a != 255:
            r = (r * a + 255 * (255 - a) + 127) // 255
            g = (g * a + 255 * (255 - a) + 127) // 255
            b = (b * a + 255 * (255 - a) + 127) // 255
        exp += bytes((r, g, b))
    assert rgb == bytes(exp)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    paragraphs=st.lists(
        st.text(
            alphabet=st.characters(
                min_codepoint=0x20, blacklist_categories=("Cs",),
            ),
            max_size=40,
        ),
        min_size=1,
        max_size=5,
    ),
    fmt=st.sampled_from(["docx", "pptx", "odt"]),
    stored=st.booleans(),
)
def test_office_text_roundtrip_property(paragraphs, fmt, stored):
    """ARBITRARY Unicode paragraphs round-trip through the
    stdlib-zipfile writers and the from-scratch ZIP-walk + XML
    readers: escaping (&, <, >, quotes), run splitting, and both ZIP
    methods pinned at property strength. TAB/NEWLINE handling is
    format-specific (exercised by the unit tests); strip them here so
    the expectation stays a pure join."""
    from geist_spark.operators.office import (
        _office_parts,
        docx_build,
        odt_build,
        pptx_build,
    )

    clean = [p.replace("\t", " ").replace("\n", " ") for p in paragraphs]
    # ODF collapses runs of 2+ spaces through text:s; keep the
    # expectation exact by collapsing nothing — text:s restores them
    if fmt == "docx":
        payload = docx_build(clean, stored=stored)
        want = [("DOCX", "document", "\n".join(clean))]
    elif fmt == "pptx":
        payload = pptx_build([clean], stored=stored)
        want = [("PPTX", "slide1", "\n".join(clean))]
    else:
        payload = odt_build(clean, stored=stored)
        want = [("ODT", "content", "\n".join(clean))]
    assert list(_office_parts(payload, 1 << 22)) == want
