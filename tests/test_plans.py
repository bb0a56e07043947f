"""Physical-plan regression tests: the scale properties SCALE.md
claims (broadcast dims, pushdown, zero-shuffle transforms, no
cartesian products) asserted on the actual executed plans, so a
refactor that silently degrades a plan fails CI — not just the
one-off plan_audit tool run."""

import pytest

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    df.collect()  # populate AQE's final plan
    return df._jdf.queryExecution().executedPlan().toString()


def simple_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def q(spark):
    import __spark_entry__ as e

    return {name: fn for name, fn in e.queries().items()}


def test_revenue_by_nation_broadcasts_every_dim(spark, q):
    p = plan_of(q["q_revenue_by_nation"](spark, SF))
    assert "CartesianProduct" not in p
    # region, nation, supplier, customer all ride broadcast joins
    assert p.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in p


def test_disjunctive_revenue_pushes_quantity_and_broadcasts_part(spark, q):
    df = q["q_disjunctive_revenue"](spark, SF)
    p = simple_plan(df)
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p
    # the derived l_quantity bound reaches the parquet scan
    scan = p[p.index("FileScan") :]
    assert "l_quantity" in scan.split("ReadSchema")[0]


def test_transform_family_is_zero_shuffle(spark, q):
    p = simple_plan(q["g_timeconv"](spark, SF))
    # map-only: parse -> convert -> project. The ONE allowed exchange
    # is the deliberate round-robin fan-out that widens the
    # single-split scan before the per-row DateTimeFormatter work
    # (bucketing.fan_out — a no-op on healthy wide scans); any
    # hash/range partitioning would mean a real shuffle crept in.
    for line in p.splitlines():
        if "Exchange" in line:
            assert "RoundRobinPartitioning" in line, line


def test_minhash_never_plans_cartesian_or_bnlj(spark, q):
    p = simple_plan(q["d_minhash_pairs"](spark, SF))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_asof_join_is_single_key_shuffle_not_range_join(spark, q):
    p = simple_plan(q["q_asof_join"](spark, SF))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_volume_shipping_prunes_fact_below_joins(spark, q):
    p = simple_plan(q["q_volume_shipping"](spark, SF))
    assert "CartesianProduct" not in p
    assert p.count("BroadcastHashJoin") >= 4  # supp/cust/nation dims


def test_url_normalize_is_map_only(spark, q):
    p = simple_plan(q["w_url_normalize"](spark, SF))
    assert "Exchange" not in p  # pure codegen projection on the scan


def test_url_dedup_single_window_shuffle(spark, q):
    p = simple_plan(q["w_url_dedup"](spark, SF))
    assert "CartesianProduct" not in p
    assert "SortMergeJoin" not in p  # union, not a self-join


def test_lm_score_broadcasts_vocab_no_window(spark, q):
    p = simple_plan(q["t_lm_score"](spark, SF))
    assert p.count("BroadcastHashJoin") >= 2  # unigram + bigram joins
    assert "SortMergeJoin" not in p
    assert "Window" not in p  # adjacency built array-side, no per-doc sort


def test_bm25_broadcasts_query_side_no_cartesian(spark, q):
    p = simple_plan(q["t_bm25_search"](spark, SF))
    assert "CartesianProduct" not in p
    assert "BroadcastHashJoin" in p  # qterms/df broadcast onto postings


def test_simhash_near_dup_equi_join_only(spark, q):
    p = simple_plan(q["d_simhash_near_dup"](spark, SF))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p  # band equi-join candidates


def test_fuzzy_match_cap_shares_join_exchange(spark, q):
    """fuzzy's cap stays a WINDOW on purpose: the pair self-join keys
    on the same gram, so the window's exchange and sort are reused by
    the SMJ (an anti-join counts branch measured 1.7x slower at
    sf0.1). Guard: no extra exchange between the window and the
    join-side sort."""
    p = simple_plan(q["d_fuzzy_match"](spark, SF))
    assert "Window" in p
    assert "LeftAnti" not in p
    assert "CartesianProduct" not in p


def test_substring_spans_cap_is_anti_join(spark):
    # the driver query runs uncapped; build the capped operator
    # directly to pin ITS plan shape
    from geist_spark.operators.dedup import substring_dup_spans

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = simple_plan(substring_dup_spans(docs, min_len=40, max_gram_freq=50))
    assert "LeftAnti" in p
    # the only Windows allowed are the diagonal run-merge (pos
    # ordering), not a gram-frequency count
    assert "count(1) windowspecdefinition" not in p.lower()


def test_cross_leakage_broadcasts_eval_only(spark, q):
    p = simple_plan(q["s_cross_leakage"](spark, SF))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p  # train side must never shuffle-sort


def test_lang_filter_tokenizes_once(spark, q):
    """Round-8 defect pin: the langFilter predicate must reference the
    universal tokenizer EXACTLY once in the plan. The naive
    greatest+when formulation inlined regexp_extract_all ~20x, blew
    janino's 64 KB method limit (stage fell back to interpreted) and
    re-tokenized every document per arm. The fix binds the token
    array via a single-element `transform` let-binding — one
    regexp_extract_all in the Filter, period."""
    p = simple_plan(q["p_lang_filter"](spark, SF))
    filt = [ln for ln in p.split("\n") if "Filter " in ln]
    assert filt, p
    assert filt[0].count("regexp_extract_all") == 1
    assert "Exchange" not in p  # still a free rider on the scan


def _mip_count(p: str) -> int:
    return (
        p.count("MapInPandas")
        + p.count("PythonMapInArrow")
        + p.count("FlatMapGroupsInPandas")
    )


# The ONLY queries allowed to carry Arrow-batched Python stages, with
# their exact stage counts (a full 216-query plan scan verified no
# other query carries one — round 7). plan_audit's `py` column counts
# EvalPython nodes only, so this pin is what keeps "no Python in the
# hot path" honest for the mapInPandas node class.
MIP_ALLOWED = {
    "m_media_features": 1,   # feature-extract stage
    "m_frame_sample": 0,     # stub is a pure explode, no Python
    "m_resize": 1,           # resize stage
    # the embed stage no longer appears in the FINAL plan: the salted
    # near-dup join eagerly checkpoints the bucketed corpus at
    # composition, so the embed runs once (upstream of the checkpoint)
    # and the query plan scans the materialized RDD — previously the
    # embed stage was duplicated across the self-join (count 2)
    "m_embed_near_dup": 0,
    "m_decode_real": 1,
    "m_decode_audio": 1,
    "m_decode_g711": 1,      # JVM header concat + one decode stage
    "m_decode_adpcm": 2,     # block synth (struct pack) + decode
    "m_decode_wav_wide": 2,  # header synth + wide-sample decode
    "m_exif_extract": 2,     # APP1 synth + marker-walk extract
    "m_strip_metadata": 2,   # APP1 synth + segment strip
    "m_riff_info": 2,        # INFO-chunk synth + RIFF walk
    "m_strip_wav": 2,        # INFO-chunk synth + chunk strip
    "m_strip_png": 2,        # tEXt/tIME synth + chunk strip
    "m_mp4_probe": 2,        # box-tree synth + box walk
    "m_id3_extract": 2,      # tag synth + frame walk
    "m_strip_mp3": 2,        # tag synth + tag cut
    "m_webp_probe": 2,       # header synth + header probe
    "m_flac_probe": 2,       # block synth + block walk
    "m_audio_envelope": 2,   # modulated-WAV synth + envelope stage
    "m_audio_near_dup": 2,   # twin synth + envelope stage
    "m_media_probe": 2,      # mixed-format synth + magic dispatch
    "w_archive_list": 2,     # stdlib-archive synth + member walk
    "w_archive_extract": 2,  # stdlib-archive synth + bounded inflate
    "m_ogg_probe": 2,        # page synth + page walk
    "m_frame_sample_real": 1,
    "m_resize_real": 1,
    "m_decode_png": 2,       # PNG synth (needs zlib) + decode
    "m_decode_webp": 2,      # VP8L synth (bit-level encode) + decode
    "m_decode_gif": 2,       # GIF synth (LZW encode) + decode
    "m_audio_dsp": 1,
    "m_decode_jpeg": 2,      # JPEG synth (FDCT+Huffman) + decode
    "m_frame_sample_mjpeg": 2,  # MJPEG-AVI synth + frame decode
    "w_warc_parse": 2,       # transport-wheel synth + record fan-out
    "w_decode_text": 2,      # charset-variant synth + codec decode
    "w_crawl_pipeline": 3,   # WARC synth + record walk + decode
    "w_pdf_extract": 2,      # PDF-writer synth + xref walk/extract
    "w_office_extract": 2,   # zipfile-writer synth + ZIP/XML extract
    "p_decompress_text": 2,  # gzip synth + bounded inflate
    "m_decode_tiff": 2,      # TIFF synth (IFD build) + decode
    "m_decode_tiff_lzw": 2,  # TIFF synth (LZW/PackBits encode) + decode
    "m_image_dhash": 1,
    "m_dhash_near_dup": 4,   # synth + hash, duplicated by the self-join
    "m_decode_flac": 2,      # FLAC-writer synth + frame decode
    "m_decode_aiff": 2,      # AIFF-writer synth + chunk decode
    "m_mkv_probe": 2,        # EBML-writer synth + EBML walk
    "w_avro_records": 2,     # Avro-writer synth + container decode
    "w_yaml_records": 1,     # JVM-concat fixture + subset parse
    "w_toml_records": 1,     # JVM-concat fixture + tomllib parse
    "w_email_parse": 1,      # JVM-concat fixture + stdlib email walk
    "w_sqlite_rows": 2,      # sqlite-serialize synth + deserialize read
    "w_plist_records": 2,    # plistlib synth + parse
}


def test_arrow_python_stages_only_in_media_family(spark, q):
    """Every m_* query carries exactly its declared Arrow-Python stage
    count; representative hot-path queries across the other families
    carry ZERO (the full-registry scan is tools/plan_audit.py's `mip`
    column — this test pins the contract in CI)."""
    for name, expected in MIP_ALLOWED.items():
        p = simple_plan(q[name](spark, SF))
        assert _mip_count(p) == expected, (name, _mip_count(p))
    for name in [
        "q1_pricing_summary", "d_verified_pairs", "s_semantic_dedup",
        "t_quality_features", "u_user_agent", "g_extract_typed",
        "p_training_prep", "w_html_extract", "t_markdown_strip",
        "w_sitemap_parse", "w_cdx_index", "p_chunk_text",
        "w_page_metadata", "m_vtt_cues", "q_geohash_cells",
    ]:
        p = simple_plan(q[name](spark, SF))
        assert _mip_count(p) == 0, name
    # the allowed set is the media family plus the byte-stream
    # parsers (variable-length record splitting / stdlib inflate are
    # inherently imperative; w_html_extract stays all-JVM, pinned at
    # zero above)
    assert all(
        n.startswith("m_")
        or n in ("w_warc_parse", "w_decode_text", "w_pdf_extract",
                 "w_crawl_pipeline", "w_office_extract",
                 "p_decompress_text", "w_avro_records",
                 "w_yaml_records", "w_toml_records", "w_email_parse",
                 "w_sqlite_rows", "w_plist_records",
                 "w_archive_list", "w_archive_extract")
        for n in MIP_ALLOWED
    )
