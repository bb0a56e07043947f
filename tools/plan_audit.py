"""Physical-plan audit over every __spark_entry__.queries() entry.

Prints one line per query with the signals that matter at 100 TB:
- exchanges: shuffle count (every one is a full-data network pass)
- bhj/smj/bnlj/cart: join strategies chosen
- pushed: parquet scans with pushed filters / total scans
- maxcols: widest ReadSchema (column pruning check)
- py: python-UDF evals (ArrowEvalPython / BatchEvalPython nodes)
- mip: Arrow-batched Python stages (MapInPandas / PythonMapInArrow /
  FlatMapGroupsInPandas) — DELIBERATE in the m_* decode family and
  nowhere else (pinned by tests/test_plans.py); py=0 alone would be
  blind to this node class

(Codegen spans aren't visible pre-execution under AQE, so they're not
reported; the `py` column is the codegen-breaking signal that matters.)

Usage: python tools/plan_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def audit(name: str, df) -> dict:
    qe = df._jdf.queryExecution()
    plan = qe.executedPlan().toString()
    scans = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    read_schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    maxcols = max((s.count(",") + 1 for s in read_schemas if s), default=0)
    return {
        "exchanges": len(re.findall(r"Exchange (?:hashpartitioning|rangepartitioning|SinglePartition)", plan)),
        "broadcasts": plan.count("BroadcastExchange"),
        "bhj": plan.count("BroadcastHashJoin"),
        "smj": plan.count("SortMergeJoin"),
        "shj": plan.count("ShuffledHashJoin"),
        "bnlj": plan.count("BroadcastNestedLoopJoin"),
        "cart": plan.count("CartesianProduct"),
        "pushed": f"{sum(1 for s in scans if s.strip())}/{len(scans)}",
        "maxcols": maxcols,
        "py": plan.count("EvalPython"),
        "mip": (
            plan.count("MapInPandas")
            + plan.count("PythonMapInArrow")
            + plan.count("FlatMapGroupsInPandas")
        ),
    }


# Queries where a sort-merge join IS the intended scale strategy:
# both sides are corpus-sized, so broadcast is impossible and the
# equi-join must shuffle — flagging them would punish the right plan.
SMJ_WAIVED = {
    # within-cell self-join of the full embedding corpus (SemDeDup);
    # AQE splits hot cells, broadcast can never apply
    "s_semantic_dedup",
    # near-dup cluster-label joins: on a crawl corpus the label table
    # is O(docs-in-clusters) — the keep_canonical round-1 lesson says
    # NO unconditional broadcast; the static plan is SMJ and AQE
    # downgrades to broadcast at runtime when labels are small
    "p_negatives",
    "p_kfold",
    # digest-table comparison is a FULL OUTER join (added/removed
    # partitions must both surface); full outer cannot broadcast, and
    # both sides are metadata-sized
    "q_backfill_plan",
    # listing-vs-manifest reconciliation: same full-outer-over-metadata
    # shape as the digest diff
    "p_reconcile_files",
    # datasheet version diff: full outer over two metadata-grain
    # datasheets (added/removed slices must both surface) — same class
    "p_datasheet_diff",
    # --- merge-hint policy (SCALE.md "Broadcast misestimates"):
    # every corpus-sized index self-join DELIBERATELY pins
    # hint("merge") — Catalyst's static size estimate of exploded
    # frames under-counts by the explode factor and was broadcasting
    # whole inverted indexes (driver maxResultSize abort, measured at
    # 16x). The SMJ in these plans is the intended join, so SMJ-ONLY
    # is the expected audit shape, not a regression:
    "d_minhash_pairs",       # banded LSH index self-join
    "d_incremental_dedup",   # band index probe
    "s_incremental_embed",   # embedding bucket-index probe (merge-pinned
                             # corpus side; batch side left to AQE)
    "d_ngram_jaccard",       # shingle inverted index
    "d_verified_pairs",      # LSH candidates + shingle verify
    "d_source_overlap",      # cross-source content-hash join
    "d_dup_rate_by_source",  # same, per-source rate grain
    "d_containment",         # shingle index, asymmetric threshold
    "d_substring_spans",     # char-gram inverted index
    "d_remove_spans",        # same runs + corpus rebuild join
    "d_fuzzy_match",         # q-gram blocking index
    "d_simhash_near_dup",    # simhash band index
    # (s_embedding_near_dup / m_embed_near_dup moved to the salted
    # shuffle_hash shape in round 9 — kept here only so the waiver
    # list stays a superset of historical audit runs)
    "s_embedding_near_dup",  # hyperplane-bucket self-join
    "m_embed_near_dup",      # same over media embeddings
    "q_cooccurrence",        # distinct (user, session, type) self-join
    "q_triangles",           # oriented-edge wedge self-join
    "d_novelty",             # shingle doc-frequency join (same index)
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from geist_spark.session import get_spark

    spark = get_spark("plan_audit")
    flagged = []
    for name, fn in entry_mod.queries().items():
        if only and name not in only:
            continue
        try:
            info = audit(name, fn(spark, sf_dir))
        except Exception as e:
            print(f"{name:26s} ERROR {e}")
            continue
        warn = ""
        if info["cart"]:
            warn += " !CARTESIAN"  # unbroadcast cross product: never ok
        if info["smj"] and not info["bhj"] and name not in SMJ_WAIVED:
            warn += " !SMJ-ONLY"
        if warn:
            flagged.append(name)
        print(
            f"{name:26s} xchg={info['exchanges']} bcast={info['broadcasts']} "
            f"bhj={info['bhj']} smj={info['smj']} shj={info['shj']} "
            f"bnlj={info['bnlj']} cart={info['cart']} pushed={info['pushed']} "
            f"maxcols={info['maxcols']} py={info['py']} mip={info['mip']}{warn}"
        )
    if flagged:
        print("flagged:", ", ".join(flagged))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
