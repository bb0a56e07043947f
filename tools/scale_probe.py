"""Measured-scaling probe: run headline operators at 1x/4x/16x data.

SCALE.md argues each operator family is linear-ish at 100 TB (bounded
shuffles, no all-pairs joins, no driver collects in the data plane).
This tool MEASURES that claim at test scale: it expands the sf0.1
tables by k in {1,4,16} — k key-shifted copies unioned together, so
row count AND key cardinality scale together while join fan-out,
near-dup density, and group sizes stay constant (the workload keeps
its shape; only its size grows) — then times one action per operator
per k and fits the log-log slope time ~ k^s.

Slope ~1 = linear scaling; <1 = fixed overhead still dominates at this
size; >1.2 would flag a super-linear shuffle/join blow-up worth
investigating. Text copies get a per-copy salt token appended so LSH /
near-dup candidate density does not grow with k (identical cross-copy
text would add k^2 true duplicate pairs — a different workload, not a
bigger one). The salt prefixes every token with a per-copy tag, so
EVERY token (hence every shingle and every whole-text hash) differs
across copies on ANY corpus, while intra-copy duplicate/near-dup
structure and token counts are preserved exactly (token lengths grow
by the 2-char tag — a bounded, documented perturbation).

Workload-shape caveats, stated precisely: id-keyed probes (joins,
sessionize, dedup) keep per-key group sizes constant because keys are
shifted per copy; the scan_agg probe groups by (hour, event_type),
which are NOT id columns, so its group COUNT stays constant and group
sizes grow with k — still a pure linearity measurement, just of the
growing-groups shape. LSH pair counts grow proportionally to k
(cross-copy pairs are zero; per-copy pair counts vary slightly
because band hashes are re-rolled by the salt).

The timed action is the same noop write bench.py uses — NOT count():
Catalyst prunes unreferenced projections under count(), which would
let a map-only operator (quality_features) or a pruned-side plan
(asof_join reduces to counting the left input) be optimized out of
its own measurement.

Usage: python tools/scale_probe.py [sf_dir] [out_json]
Prints one JSON line per operator and writes the full result map.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SHIFT = 1 << 40  # key offset between copies; far above any real key


def expand(df: DataFrame, k: int, id_cols: list[str], salt_text: str | None = None) -> DataFrame:
    """Union k copies of df with id columns shifted per copy.

    Shifting every id/key column by i*SHIFT keeps intra-copy joins and
    groupings intact while making keys globally distinct across copies:
    cardinality scales with k, per-key group sizes do not."""
    parts = []
    for i in range(k):
        p = df
        for c in id_cols:
            p = p.withColumn(c, F.col(c) + F.lit(i * SHIFT))
        if salt_text is not None and i > 0:
            # prefix every token with a per-copy tag: every token —
            # hence every shingle and whole-text hash — differs across
            # copies regardless of corpus alphabet, while token counts
            # and intra-copy duplicate structure are unchanged
            p = p.withColumn(
                salt_text,
                F.regexp_replace(F.col(salt_text), r"(\S+)", f"q{i}$1"),
            )
        parts.append(p)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def build_probes(spark: SparkSession, sf_dir: str):
    from geist_spark.operators import dedup, relational, text

    def t(name: str) -> DataFrame:
        return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))

    events, docs = t("events"), t("documents")
    lineitem, orders, customer = t("lineitem"), t("orders"), t("customer")
    nation, region = t("nation"), t("region")

    def scan_agg(k):
        return relational.hourly_rollup(expand(events, k, ["event_id", "user_id"]))

    def sessionize(k):
        return relational.sessionize(expand(events, k, ["event_id", "user_id"]))

    def join_agg(k):
        return relational.revenue_by_nation(
            expand(customer, k, ["c_custkey"]),
            expand(orders, k, ["o_orderkey", "o_custkey"]),
            expand(lineitem, k, ["l_orderkey"]),
            nation,
            region,
        )

    def exact_dedup(k):
        return dedup.exact_dedup_groups(
            expand(docs, k, ["doc_id"], salt_text="text")
        )

    def minhash_lsh(k):
        return dedup.minhash_lsh_pairs(
            expand(docs, k, ["doc_id"], salt_text="text"), max_bucket_size=64
        )

    def verified_pairs(k):
        # the round-6 window-count confirm shape (xchg 14 -> 11):
        # candidates + exact-Jaccard verify, per-doc sizes riding the
        # shared doc_id exchange
        return dedup.verified_near_dup_pairs(
            expand(docs, k, ["doc_id"], salt_text="text"),
            max_bucket_size=64,
        )

    def quality(k):
        return text.quality_features(expand(docs, k, ["doc_id"]))

    def asof(k):
        ev = expand(events, k, ["event_id", "user_id"])
        trades = ev.select("user_id", "ts", "event_id")
        quotes = ev.select(
            "user_id", "ts", F.col("value").alias("quote")
        )
        return relational.asof_join(
            trades, quotes, on="user_id", left_ts="ts", right_ts="ts",
            value_cols=["quote"],
        )

    def cosine(k):
        from geist_spark.operators.similarity import cosine_topk

        emb = expand(t("embeddings"), k, ["vec_id"])
        return cosine_topk(emb, query_ids=list(range(10)), k=5)

    def containment(k):
        # cross-copy shingles are disjoint (salted), so candidate
        # volume scales with k, not k^2 — the property the inverted
        # index must hold at 100 TB
        return dedup.ngram_containment_pairs(
            expand(docs, k, ["doc_id"], salt_text="text"),
            k=3, threshold_pct=80, max_shingle_freq=200,
        )

    def span_removal(k):
        # gram cap bounds the hot-gram m^2 blow-up exactly as the
        # operator would run on a crawl corpus
        return dedup.remove_dup_spans(
            expand(docs, k, ["doc_id"], salt_text="text"),
            min_len=40, max_gram_freq=64,
        )

    def kmv_sketch(k):
        from geist_spark.operators.sketch import kmv_merge, kmv_rollup

        ev = expand(events, k, ["event_id", "user_id"]).withColumn(
            "hour", F.date_trunc("hour", "ts")
        )
        return kmv_merge(
            kmv_rollup(ev, ["hour", "event_type"], "user_id", k=256),
            ["event_type"], k=256,
        )

    def epoch_shuffle(k):
        from geist_spark.operators.split import epoch_shuffle_manifest

        return epoch_shuffle_manifest(
            expand(docs, k, ["doc_id"]), n_epochs=3, n_batches=8,
            size_col="n_chars",
        )

    def rake(k):
        # UNsalted: identical text across copies keeps the phrase
        # vocabulary constant while doc volume grows — the realistic
        # shape (vocab grows sublinearly in corpus size), and it
        # keeps stopwords intact (the salt tag would prefix them,
        # erasing every phrase boundary)
        return text.rake_keywords(expand(docs, k, ["doc_id"]))

    def knn(k):
        from geist_spark.operators.classify import knn_classify

        # fixed 20-query panel (copy 0 only), corpus grows with k
        return knn_classify(
            expand(t("embeddings"), k, ["vec_id"]),
            query_ids=list(range(20)), k=10,
        )

    def card_scrub(k):
        from geist_spark.operators.prep import credit_card_scrub

        d = expand(docs, k, ["doc_id"]).withColumn(
            "text",
            F.concat(
                F.col("text"),
                F.when(F.col("doc_id") % 2 == 0,
                       F.lit(" card 4539 1488 0343 6467 on file"))
                .otherwise(F.lit(" card 1234 5678 1234 5678 on file")),
            ),
        )
        return credit_card_scrub(d)

    def kcore_peel(k):
        from geist_spark.operators.graph import kcore

        d = expand(docs, k, ["doc_id"]).select("doc_id")
        n_per_copy = docs.count()
        # per-copy edges: hash the ORIGINAL id (src % SHIFT) and keep
        # dst inside the same copy's id range, so every copy is an
        # identical disjoint graph — k copies = k x the work, never a
        # cross-copy hub (the expand() contract all probes rely on)
        orig = F.pmod(F.col("doc_id"), F.lit(SHIFT))
        base = (F.col("doc_id") - orig).cast("long")
        edges = d.select(
            "doc_id",
            F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("j"),
        ).select(
            F.col("doc_id").alias("src"),
            (
                base
                + F.conv(
                    F.substring(
                        F.md5(F.concat(orig.cast("string"),
                                       F.lit("|"),
                                       F.col("j").cast("string"))),
                        1, 8), 16, 10).cast("long") % F.lit(n_per_copy)
            ).alias("dst"),
        )
        return kcore(edges, k=4, max_iterations=20)

    def geo(k):
        from geist_spark.operators.geo import (
            LAT_MOD, LAT_SHIFT, LON_MOD, LON_SHIFT,
            geo_radius_join, md5_micro_coord,
        )

        # fixed 25-site broadcast side; the point side grows with k —
        # the map-only scan shape (coordinates synthesized per copy
        # via the shifted event_id, so point positions stay iid);
        # synth imported from the operator so probe == entry workload
        ev = expand(events, k, ["event_id", "user_id"])
        pts = ev.select(
            "event_id",
            md5_micro_coord("lat|", F.col("event_id"), LAT_MOD, LAT_SHIFT).alias("lat"),
            md5_micro_coord("lon|", F.col("event_id"), LON_MOD, LON_SHIFT).alias("lon"),
        )
        sites = t("nation").select(
            F.col("n_nationkey").alias("site_id"),
            md5_micro_coord("slat|", F.col("n_nationkey"), LAT_MOD, LAT_SHIFT).alias("site_lat"),
            md5_micro_coord("slon|", F.col("n_nationkey"), LON_MOD, LON_SHIFT).alias("site_lon"),
        )
        return geo_radius_join(pts, sites, radius_micro=5_000_000)

    def _zipf_ua(k):
        # zipfian UA traffic: ~90% of rows from a 50-string head, the
        # rest from a 2000-string tail. pmod residues survive expand()'s
        # key shift bijectively (constant offset per copy mod 2000), so
        # the distinct-UA dictionary stays FIXED at ~2000 while rows
        # scale with k — the production shape the dictionary join is
        # designed for (ua.py:parse_user_agents).
        ev = expand(events, k, ["event_id", "user_id"])
        uid = F.when(
            F.pmod(F.col("event_id"), 10) < 9,
            F.pmod(F.col("user_id"), 50),
        ).otherwise(F.pmod(F.col("user_id"), 2000))
        return ev.select(
            "event_id",
            F.concat(
                F.lit(
                    "Mozilla/5.0%20(Windows%20NT%2010.0;%20Win64;%20x64)"
                    "%20AppleWebKit/537.36%20(KHTML,%20like%20Gecko)"
                    "%20Chrome/"
                ),
                uid.cast("string"),
                F.lit(".0.0.0%20Safari/537.36"),
            ).alias("ua"),
        )

    def ua_dict_join(k):
        # the shipped plan: distinct -> JVM parse -> broadcast left join
        from geist_spark.functions.ua import parse_user_agents

        return parse_user_agents(_zipf_ua(k), "ua")

    def ua_pandas_twin(k):
        # the r3 plan it replaced: Arrow round-trip of every row into a
        # memoized pandas UDF — per-row transfer cost, per-distinct parse
        from geist_spark.functions.ua import ua_udf

        return _zipf_ua(k).withColumn("ua_json", ua_udf(F.col("ua")))

    return {
        "scan_agg_hourly_rollup": scan_agg,
        "sessionize_lag_cumsum": sessionize,
        "multi_join_revenue_by_nation": join_agg,
        "exact_dedup_groups": exact_dedup,
        "minhash_lsh_pairs": minhash_lsh,
        "verified_near_dup_pairs": verified_pairs,
        "text_quality_features": quality,
        "asof_join_union_carry": asof,
        "cosine_topk_bruteforce": cosine,
        "ngram_containment_pairs": containment,
        "dup_span_removal": span_removal,
        "kmv_sketch_rollup_merge": kmv_sketch,
        "epoch_shuffle_manifest": epoch_shuffle,
        "rake_keywords": rake,
        "knn_classify_vote": knn,
        "geo_radius_join": geo,
        "card_scrub_luhn": card_scrub,
        "kcore_peeling": kcore_peel,
        "ua_dict_join": ua_dict_join,
        "ua_pandas_twin": ua_pandas_twin,
    }


def fit_slope(ks: list[int], times: list[float]) -> float:
    xs = [math.log(k) for k in ks]
    ys = [math.log(max(t, 1e-9)) for t in times]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    denom = sum((x - mx) ** 2 for x in xs)
    return sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / denom


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale_probe.json"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("scale_probe")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    ks = [1, 4, 16]
    probes = build_probes(spark, sf_dir)
    only = {s for s in os.environ.get("SPARK_GRAFT_PROBE_ONLY", "").split(",") if s}
    if only:
        probes = {n: p for n, p in probes.items() if n in only}
    results: dict[str, dict] = {}
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_PROBE_RUNS", "2")))
    for name, probe in probes.items():
        # warm the 1x path once so JVM/codegen warmup is not billed to k=1
        probe(1).write.format("noop").mode("overwrite").save()
        times, rows = [], []
        for k in ks:
            # BEST of n_runs: single-shot sf0.1 wall times swing 2-15x
            # with host contention (measured: the dup-span 16x point
            # read 77 s cold/contended vs 16 s on an idle re-run — a
            # fake 1.1 slope from a real 0.5 operator), and a slope
            # fit amplifies one bad point. min() measures the plan.
            #
            # The timer brackets CONSTRUCTION + the noop write:
            # operators that eager-checkpoint internally (rake's
            # candidate table) run their scan/tokenize/aggregate work
            # at DataFrame-construction time, which a write-only timer
            # would silently exclude; for lazy operators construction
            # is plan-building only (sub-ms, harmless to include).
            # noop write, NOT count(): count() lets Catalyst prune the
            # operator under test (verified: quality_features reduces
            # to a bare row count, asof_join to a count of its left
            # input) — the noop sink materializes every output column
            best = None
            for _ in range(n_runs):
                t0 = time.monotonic()
                df = probe(k)
                df.write.format("noop").mode("overwrite").save()
                dt = time.monotonic() - t0
                best = dt if best is None else min(best, dt)
            times.append(round(best, 3))
            rows.append(df.count())
        slope = round(fit_slope(ks, times), 3)
        results[name] = {
            "k": ks,
            "sec": times,
            "rows": rows,
            "slope": slope,
        }
        print(json.dumps({"op": name, **results[name]}), flush=True)
    with open(out_path, "w") as f:
        json.dump({"sf_dir": sf_dir, "ks": ks, "ops": results}, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
