"""URL canonicalization / host stats / URL dedup (operators/web.py)."""

from pyspark.sql import functions as F

from geist_spark.operators.web import (
    host_stats,
    normalize_url,
    url_dedup,
    url_host,
)


def _norm(spark, *urls: str) -> list[str]:
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [
        r.n for r in df.select(normalize_url(F.col("url")).alias("n")).collect()
    ]


def test_normalize_rules(spark):
    got = _norm(
        spark,
        "HTTP://WWW.Example.com:80/a/b/?utm_source=feed&id=7#frag",
        "https://host.com:443/a//",
        "https://host.com:8080/a?b=2&a=1&fbclid=xx",
        "http://user@Host.com/p?ref=x",
        "https://h.com",
        "http://h.com:81/x/?utm_campaign=z&z=1&y=2",
        "http://h.com/p?a=1?b=2",  # query starts at the FIRST '?'
    )
    assert got == [
        "http://www.example.com/a/b?id=7",
        "https://host.com/a",
        "https://host.com:8080/a?a=1&b=2",
        # 'ref' is functional by default (branch selectors etc.) — kept;
        # pass tracking_exact=(...,'ref') to drop it
        "http://host.com/p?ref=x",
        "https://h.com/",
        "http://h.com:81/x?y=2&z=1",
        "http://h.com/p?a=1?b=2",
    ]


def test_normalize_idempotent(spark):
    urls = [
        "HTTP://A.b:80/x/?utm_a=1&b=2#f",
        "https://q.com:8443/p?z=1&a=2",
        "https://h.com",
    ]
    once = _norm(spark, *urls)
    twice = _norm(spark, *once)
    assert once == twice


def test_normalize_non_url_is_null(spark):
    df = spark.createDataFrame([("not a url",), ("",), (None,)], "url string")
    got = [
        r.n for r in df.select(normalize_url(F.col("url")).alias("n")).collect()
    ]
    assert got == [None, None, None]


def test_url_host_strips_userinfo_and_port(spark):
    df = spark.createDataFrame(
        [("https://alice:pw@Host.Example.COM:8443/x",)], "url string"
    )
    assert (
        df.select(url_host(F.col("url")).alias("h")).collect()[0].h
        == "host.example.com"
    )


def test_ipv6_authority(spark):
    df = spark.createDataFrame(
        [
            ("http://[2001:DB8::1]:8080/x",),
            ("http://[::1]/y",),
        ],
        "url string",
    )
    got = df.select(
        url_host(F.col("url")).alias("h"),
        normalize_url(F.col("url")).alias("n"),
    ).collect()
    assert got[0].h == "[2001:db8::1]"
    assert got[0].n == "http://[2001:db8::1]:8080/x"
    assert got[1].h == "[::1]"
    assert got[1].n == "http://[::1]/y"


def test_url_dedup_null_urls_all_keep(spark):
    rows = [
        (1, "not a url"),
        (2, "also not"),
        (3, "http://a.com/p"),
        (4, "http://a.com/p/"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, url string")
    dd = {r.doc_id: r for r in url_dedup(docs).collect()}
    # unparseable URLs are not duplicates of each other
    assert dd[1].keep and dd[2].keep
    assert dd[3].keep and not dd[4].keep


def test_normalize_randomized_duckdb_parity(spark):
    """Seeded fuzz of messy URLs through BOTH the Spark normalizer and
    the DuckDB oracle expression (the same SQL __spark_entry__ embeds)
    — the hand-duplicated parse must agree beyond the md5-derived
    corpus shapes."""
    import random

    import duckdb

    rng = random.Random(7)
    schemes = ["http", "HTTP", "https", "HtTpS"]
    hosts = ["Example.com", "a.B.c", "[2001:DB8::1]", "x-y.org"]
    userinfos = ["", "u@", "u:p@"]
    ports = ["", ":80", ":443", ":8080", ":81"]
    paths = ["", "/", "/a", "/a/b/", "/a//", "/p.q/r"]
    queries = [
        "",
        "?",
        "?a=1",
        "?b=2&a=1",
        "?utm_source=x&id=3",
        "?id=4&utm_campaign=y&ref=z",
        "?a=1?b=2",
        "?fbclid=q&gclid=r",
    ]
    frags = ["", "#f", "#sec?x=1"]
    urls = []
    for _ in range(300):
        urls.append(
            rng.choice(schemes)
            + "://"
            + rng.choice(userinfos)
            + rng.choice(hosts)
            + rng.choice(ports)
            + rng.choice(paths)
            + rng.choice(queries)
            + rng.choice(frags)
        )
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = [
        r.n
        for r in df.select(normalize_url(F.col("url")).alias("n")).collect()
    ]

    con = duckdb.connect()
    sql = r"""
    WITH t AS (SELECT unnest(?) AS url),
    p AS (
      SELECT url,
        lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.\-]*)://', 1))
            AS scheme,
        regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)', 1)
            AS auth,
        regexp_extract(url,
            '^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)', 1) AS raw_path,
        regexp_extract(url, '^[^#?]*\?([^#]*)', 1) AS rawq
      FROM t),
    q AS (
      SELECT *,
        lower(regexp_extract(auth, '^(?:[^@]*@)?(\[[^\]]*\]|[^:]*)', 1))
            AS host,
        regexp_extract(auth, ':(\d+)$', 1) AS port,
        CASE WHEN regexp_replace(raw_path, '/+$', '') = '' THEN '/'
             ELSE regexp_replace(raw_path, '/+$', '') END AS path,
        coalesce(list_aggregate(list_sort(list_filter(
            string_split(rawq, '&'),
            x -> x <> ''
                 AND NOT regexp_extract(x, '^([^=]*)', 1)
                     IN ('fbclid','gclid','msclkid')
                 AND NOT starts_with(
                     regexp_extract(x, '^([^=]*)', 1), 'utm_'))),
            'string_agg', '&'), '') AS qq
      FROM p)
    SELECT CASE WHEN scheme = '' THEN NULL ELSE
      scheme || '://' || host ||
      CASE WHEN port = '' OR (scheme='http' AND port='80')
                OR (scheme='https' AND port='443') THEN ''
           ELSE ':' || port END
      || path || CASE WHEN qq = '' THEN '' ELSE '?' || qq END END AS n
    FROM q
    """
    want = [n for (n,) in con.execute(sql, [urls]).fetchall()]
    mismatches = [
        (u, g, w) for u, g, w in zip(urls, got, want) if g != w
    ]
    assert not mismatches, mismatches[:5]


def test_pipeline_url_dedup_and_lm_filter(spark):
    from geist_spark.compiler.pipeline import compile_pipeline
    from geist_spark.spec.model import SpecError
    import pytest

    rows = [
        # (doc_id, text, lang, source, url)
        (1, "the cat sat", "en", "s1", "http://A.com/p?utm_x=1"),
        (2, "the cat ran", "en", "s1", "HTTP://a.com:80/p/"),  # dup URL of 1
        (3, "zz qq ww", "de", "s1", "http://a.com/q"),  # fully OOV vs en LM
        (4, "the cat", "en", "s2", "https://b.com/p"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, url string"
    )
    pipe = compile_pipeline(
        {
            "steps": [
                {"op": "urlDedup"},
                {"op": "lmQualityFilter", "maxOovRate": 0.5},
            ]
        }
    )
    out = pipe(docs)
    assert sorted(r.doc_id for r in out.collect()) == [1, 4]
    assert set(out.columns) == {"doc_id", "text", "lang", "source", "url"}

    with pytest.raises(SpecError, match="maxOovRate"):
        compile_pipeline(
            {"steps": [{"op": "lmQualityFilter", "maxOovRate": 1.5}]}
        )
    with pytest.raises(SpecError, match="maxOovRate"):
        compile_pipeline(
            {"steps": [{"op": "lmQualityFilter", "maxOovRate": True}]}
        )
    with pytest.raises(SpecError, match="urlColumn"):
        compile_pipeline({"steps": [{"op": "urlDedup", "urlColumn": ""}]})
    with pytest.raises(SpecError, match="langColumn"):
        compile_pipeline(
            {"steps": [{"op": "lmQualityFilter", "langColumn": ""}]}
        )

    # a custom langColumn works; a MISSING one is a SpecError at run()
    # (a directed message, not a mid-plan AnalysisException)
    renamed = docs.withColumnRenamed("lang", "language")
    pipe_lc = compile_pipeline(
        {
            "steps": [
                {
                    "op": "lmQualityFilter",
                    "maxOovRate": 0.5,
                    "langColumn": "language",
                }
            ]
        }
    )
    assert sorted(r.doc_id for r in pipe_lc(renamed).collect()) == [1, 2, 4]
    pipe_missing = compile_pipeline(
        {"steps": [{"op": "lmQualityFilter", "langColumn": "nope"}]}
    )
    with pytest.raises(SpecError, match="nope"):
        pipe_missing(docs)
    # guard is case-INSENSITIVE like Spark's own column resolution:
    # langColumn='LANG' against a 'lang' column must run, not raise
    pipe_ci = compile_pipeline(
        {"steps": [{"op": "lmQualityFilter", "maxOovRate": 0.5,
                    "langColumn": "LANG"}]}
    )
    assert sorted(r.doc_id for r in pipe_ci(docs).collect()) == [1, 2, 4]
    # ...and an input carrying BOTH casings is an upfront SpecError
    # (F.col would raise AMBIGUOUS_REFERENCE mid-plan otherwise)
    # (withColumn would REPLACE case-insensitively; select appends)
    dup = docs.select("*", F.col("lang").alias("LANG"))
    with pytest.raises(SpecError, match="ambiguous"):
        pipe_ci(dup)


def test_normalize_url_tracking_overrides(spark):
    df = spark.createDataFrame(
        [("http://h.com/p?ref=x&sid=1&a=2",)], "url string"
    )
    # default: ref and sid are functional, kept
    assert (
        df.select(normalize_url(F.col("url")).alias("n")).collect()[0].n
        == "http://h.com/p?a=2&ref=x&sid=1"
    )
    # caller opts specific params into the tracking set
    got = df.select(
        normalize_url(
            F.col("url"), tracking_exact=("fbclid", "ref"),
            tracking_prefixes=("utm_", "sid"),
        ).alias("n")
    ).collect()[0].n
    assert got == "http://h.com/p?a=2"


def test_pipeline_guards_against_corpus_wipe(spark):
    from geist_spark.compiler.pipeline import compile_pipeline

    rows = [
        (1, "the cat sat", "en", "s1", None),  # NULL url -> bypasses dedup
        (2, None, "en", "s1", "http://a.com/p"),  # NULL text -> unscoreable
        (3, "zz qq", "de", "s1", "http://a.com/q"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, url string"
    )
    pipe = compile_pipeline(
        {
            "steps": [
                {"op": "urlDedup"},
                {"op": "lmQualityFilter", "maxOovRate": 0.4},
            ]
        }
    )
    kept = sorted(r.doc_id for r in pipe(docs).collect())
    # NULL url keeps; NULL text passes the gate (only drop what is
    # measured); the OOV doc is the only drop
    assert kept == [1, 2]

    # empty reference slice (no 'xx' docs): the gate passes everything
    # through rather than scoring all docs OOV and wiping the corpus
    pipe2 = compile_pipeline(
        {"steps": [{"op": "lmQualityFilter", "referenceLang": "xx"}]}
    )
    assert sorted(r.doc_id for r in pipe2(docs).collect()) == [1, 2, 3]


def test_host_stats_and_dedup(spark):
    rows = [
        (1, "http://A.com/p?utm_source=x", "aaaa"),
        (2, "HTTP://a.com:80/p/", "bb"),  # same canonical page as 1
        (3, "http://a.com/q", "c"),
        (4, "https://b.com/p", "dd"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, url string, text string")

    hs = {r.host: r for r in host_stats(docs).collect()}
    assert hs["a.com"].n_docs == 3
    assert hs["a.com"].n_urls == 2  # docs 1+2 collapse
    assert hs["a.com"].n_paths == 2
    assert hs["a.com"].total_chars == 7
    assert hs["b.com"].n_docs == 1

    dd = {r.doc_id: r for r in url_dedup(docs).collect()}
    assert dd[1].keep and not dd[2].keep  # lowest id survives
    assert dd[1].url_norm == dd[2].url_norm == "http://a.com/p"
    assert dd[3].keep and dd[4].keep


def test_streaming_url_dedup_within_watermark(spark, tmp_path):
    """normalize_url composes with Structured Streaming: canonical-URL
    dedup across micro-batches via dropDuplicatesWithinWatermark —
    state keyed on the normalized form, bounded by the watermark."""
    import datetime as dt

    src = str(tmp_path / "urlsrc")
    t0 = dt.datetime(2024, 1, 1)

    def write_file(rows):
        spark.createDataFrame(
            [(u, t0 + dt.timedelta(seconds=s)) for u, s in rows],
            "url string, ts timestamp",
        ).coalesce(1).write.mode("append").parquet(src)

    write_file(
        [
            ("http://A.com/p?utm_source=x", 0),
            ("HTTP://a.com:80/p/", 1),  # same canonical page
            ("http://a.com/q", 2),
        ]
    )
    write_file([("http://a.com/p#frag", 3)])  # dup again, next batch

    stream = (
        spark.readStream.schema("url string, ts timestamp").parquet(src)
        .withColumn("url_norm", normalize_url(F.col("url")))
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["url_norm"])
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("urldedup")
        .outputMode("append")
        .option(
            "checkpointLocation", str(tmp_path / "ck")
        )
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql("SELECT url_norm FROM urldedup").collect()
    assert sorted(r.url_norm for r in rows) == [
        "http://a.com/p",
        "http://a.com/q",
    ]
