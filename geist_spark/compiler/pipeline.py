"""Declarative corpus-prep pipelines: a JSON step list compiled onto
the prep/dedup/text operators, the same spec-first philosophy the
reference applies to stream transforms (entity/spec.go's declared
transform chain) extended to the batch training-data surface.

A pipeline spec is:

    {
      "steps": [
        {"op": "fixText"},
        {"op": "exactDedup"},
        {"op": "qualityFilter", "minTokens": 20, "maxTokens": 100000},
        {"op": "lineDedup", "minDocFreq": 2, "minChars": 10},
        {"op": "urlDedup", "urlColumn": "url"},
        {"op": "lmQualityFilter", "maxOovRate": 0.2, "referenceLang": "en"},
        {"op": "sourceQuota", "maxDocsPerSource": 40}
      ]
    }

`compile_pipeline` validates the spec up front (unknown op / missing
or invalid params raise SpecError BEFORE any Spark job runs) and
returns a `DataFrame -> DataFrame` function whose steps compose into
ONE lazy Catalyst plan — no materialization between steps, so column
pruning and filter pushdown work across step boundaries.

Every step preserves the input columns (doc_id, text, source, ...);
steps only filter rows or rewrite the text column. Scale shape per
step is the underlying operator's (documented in SCALE.md).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, Window, functions as F

from geist_spark.spec.model import SpecError

Step = Callable[[DataFrame], DataFrame]


def _fix_text(params: dict[str, Any]) -> Step:
    from geist_spark.operators.text import fixed_text_col

    def run(df: DataFrame) -> DataFrame:
        return df.withColumn("text", fixed_text_col(F.col("text")))

    return run


def _exact_dedup(params: dict[str, Any]) -> Step:
    # keep the lowest doc_id per exact content hash — one shuffle on
    # md5(text) (uniform key), columns preserved
    def run(df: DataFrame) -> DataFrame:
        w = Window.partitionBy(F.md5(F.col("text"))).orderBy(
            F.col("doc_id").asc()
        )
        return (
            df.withColumn("__dr", F.row_number().over(w))
            .filter(F.col("__dr") == 1)
            .drop("__dr")
        )

    return run


def _quality_filter(params: dict[str, Any]) -> Step:
    lo = int(params.get("minTokens", 1))
    hi = int(params.get("maxTokens", 1 << 31))
    if lo < 0 or hi < lo:
        raise SpecError("qualityFilter: need 0 <= minTokens <= maxTokens")

    def run(df: DataFrame) -> DataFrame:
        from geist_spark.operators.dedup import tokens

        n = F.size(tokens(F.col("text")))
        return df.filter((n >= lo) & (n <= hi))

    return run


def _line_dedup(params: dict[str, Any]) -> Step:
    min_doc_freq = int(params.get("minDocFreq", 2))
    min_chars = int(params.get("minChars", 10))
    if min_doc_freq < 2:
        raise SpecError("lineDedup: minDocFreq must be >= 2")

    def run(df: DataFrame) -> DataFrame:
        from geist_spark.operators.text import line_dedup

        rebuilt = line_dedup(
            df.select("doc_id", "text"),
            min_doc_freq=min_doc_freq,
            min_chars=min_chars,
        ).select("doc_id", F.col("text").alias("__new_text"))
        return (
            df.join(rebuilt, "doc_id")
            .withColumn("text", F.col("__new_text"))
            .drop("__new_text")
        )

    return run


def _source_quota(params: dict[str, Any]) -> Step:
    cap = params.get("maxDocsPerSource")
    if not isinstance(cap, int) or cap < 1:
        raise SpecError("sourceQuota: maxDocsPerSource must be an int >= 1")
    salt = str(params.get("salt", ""))

    def run(df: DataFrame) -> DataFrame:
        from geist_spark.operators.prep import source_quota

        return source_quota(df, cap_per_source=cap, salt=salt)

    return run


def _url_dedup(params: dict[str, Any]) -> Step:
    url_col = params.get("urlColumn", "url")
    if not isinstance(url_col, str) or not url_col:
        raise SpecError("urlDedup: urlColumn must be a non-empty string")

    def run(df: DataFrame) -> DataFrame:
        from geist_spark.operators.web import normalize_url

        # unparseable URLs normalize to NULL; such docs are not
        # duplicates of each other — they skip the window entirely
        # (a NULL key would sort every unparseable doc on ONE task)
        # and union back in
        norm = normalize_url(F.col(url_col))
        tagged = df.withColumn("__un", norm)
        w = Window.partitionBy(F.col("__un")).orderBy(F.col("doc_id").asc())
        parsed = (
            tagged.filter(F.col("__un").isNotNull())
            .withColumn("__ur", F.row_number().over(w))
            .filter(F.col("__ur") == 1)
            .drop("__un", "__ur")
        )
        return parsed.unionByName(tagged.filter(F.col("__un").isNull()).drop("__un"))

    return run


def _lm_quality_filter(params: dict[str, Any]) -> Step:
    max_oov = params.get("maxOovRate", 0.5)
    if (
        isinstance(max_oov, bool)
        or not isinstance(max_oov, (int, float))
        or not 0 <= max_oov <= 1
    ):
        raise SpecError("lmQualityFilter: maxOovRate must be in [0, 1]")
    ref_lang = params.get("referenceLang", "en")
    if not isinstance(ref_lang, str) or not ref_lang:
        raise SpecError(
            "lmQualityFilter: referenceLang must be a non-empty string"
        )
    lang_col = params.get("langColumn", "lang")
    if not isinstance(lang_col, str) or not lang_col:
        raise SpecError(
            "lmQualityFilter: langColumn must be a non-empty string"
        )

    def run(df: DataFrame) -> DataFrame:
        # reference LM trains on THIS stage's input (post earlier
        # steps), so a preceding dedup changes the counts — spec order
        # is semantic, as with every other step. The stage input is
        # referenced three times (train, score, join-back), so a lazy
        # localCheckpoint computes the upstream once instead of thrice.
        from geist_spark.operators.lm import oov_rate, train_ngram_lm

        # a missing language column is a SPEC error, not a mid-job
        # AnalysisException three steps deep into a lazy plan. The
        # guard mirrors the SESSION's resolution rules instead of
        # hardcoding the default: case-sensitive match when
        # spark.sql.caseSensitive=true, case-insensitive otherwise —
        # and an ambiguous case-insensitive match (both 'lang' and
        # 'LANG' present) is rejected up front too, because F.col()
        # would raise AMBIGUOUS_REFERENCE at execution.
        case_sensitive = (
            df.sparkSession.conf.get("spark.sql.caseSensitive", "false")
            .lower()
            == "true"
        )
        if case_sensitive:
            matches = [c for c in df.columns if c == lang_col]
        else:
            matches = [c for c in df.columns if c.lower() == lang_col.lower()]
        if not matches:
            raise SpecError(
                f"lmQualityFilter: langColumn {lang_col!r} not in input "
                f"columns {df.columns}"
            )
        if len(matches) > 1:
            raise SpecError(
                f"lmQualityFilter: langColumn {lang_col!r} is ambiguous "
                f"among {matches} (case-insensitive session)"
            )
        df = df.localCheckpoint(eager=False)
        ref = df.filter(F.col(lang_col) == ref_lang)
        uni, _ = train_ngram_lm(ref)
        # uni feeds both the scoring join and the emptiness guard —
        # vocab-sized, so one lazy checkpoint avoids tokenizing and
        # aggregating the reference slice twice
        uni = uni.localCheckpoint(eager=False)
        scored = oov_rate(df, uni)
        # 1-row reference size, broadcast: if the reference slice is
        # EMPTY (wrong lang code, or a preceding filter removed it)
        # every doc would score oov_rate=1.0 and the gate would wipe
        # the corpus — pass everything through instead of silently
        # deleting it. NULL-scored docs (NULL text -> no token rows)
        # also pass: this step only drops what it can measure.
        ref_n = uni.agg(F.count(F.lit(1)).alias("__ref_vocab"))
        return (
            df.join(scored, "doc_id", "left")
            .join(F.broadcast(ref_n))
            .filter(
                (F.col("__ref_vocab") == 0)
                | F.col("oov_rate").isNull()
                | (F.col("oov_rate") <= float(max_oov))
            )
            .drop("oov_rate", "__ref_vocab")
        )

    return run


def _lang_filter(params: dict[str, Any]) -> Step:
    from geist_spark.operators.text import STOPWORDS

    langs = params.get("languages")
    known = sorted(STOPWORDS) + ["unknown"]
    if (
        not isinstance(langs, list)
        or not langs
        or not all(isinstance(x, str) for x in langs)
    ):
        raise SpecError(
            "langFilter: 'languages' must be a non-empty string list"
        )
    bad = [x for x in langs if x not in known]
    if bad:
        raise SpecError(
            f"langFilter: unknown language codes {bad} "
            f"(supported: {known})"
        )

    def run(df: DataFrame) -> DataFrame:
        from geist_spark.operators.text import predicted_lang_col

        # pure-codegen predicate: the language argmax inlines into
        # the scan stage — zero shuffle, zero joins
        return df.filter(predicted_lang_col(F.col("text")).isin(*langs))

    return run


_STEP_BUILDERS: dict[str, Callable[[dict[str, Any]], Step]] = {
    "fixText": _fix_text,
    "exactDedup": _exact_dedup,
    "qualityFilter": _quality_filter,
    "lineDedup": _line_dedup,
    "sourceQuota": _source_quota,
    "urlDedup": _url_dedup,
    "lmQualityFilter": _lm_quality_filter,
    "langFilter": _lang_filter,
}


def describe_pipeline(spec: dict[str, Any]) -> list[dict[str, Any]]:
    """Validated step plan as data (op + params per step, in run
    order) — what a UI or audit log records next to the run. Raises
    the same SpecErrors as compile_pipeline."""
    compile_pipeline(spec)  # full validation
    return [
        {"op": s["op"], **{k: v for k, v in s.items() if k != "op"}}
        for s in spec["steps"]
    ]


def compile_pipeline(spec: dict[str, Any]) -> Step:
    """Validate the pipeline spec and return the composed step
    function. Raises SpecError on unknown ops or bad params (before
    any Spark work)."""
    if not isinstance(spec, dict) or not isinstance(spec.get("steps"), list):
        raise SpecError("pipeline spec must be {'steps': [...]}")
    if not spec["steps"]:
        raise SpecError("pipeline requires at least one step")
    steps: list[Step] = []
    for i, s in enumerate(spec["steps"]):
        if not isinstance(s, dict) or "op" not in s:
            raise SpecError(f"pipeline step {i}: missing 'op'")
        op = s["op"]
        builder = _STEP_BUILDERS.get(op)
        if builder is None:
            raise SpecError(
                f"pipeline step {i}: unknown op {op!r} "
                f"(supported: {sorted(_STEP_BUILDERS)})"
            )
        steps.append(builder({k: v for k, v in s.items() if k != "op"}))

    def run(df: DataFrame) -> DataFrame:
        for st in steps:
            df = st(df)
        return df

    return run
