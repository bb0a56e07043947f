"""Transform compiler golden tests.

Inputs/expected outputs ported from the reference's test suite
(entity/transform/transformer_test.go) — semantics, asserted through
the compiled DataFrame path instead of per-event interpretation.
"""

import datetime
import json

import pytest

from geist_spark.compiler.transform import compile_transform
from geist_spark.spec.model import parse_spec

from tests.conftest import event_df


def spec_with_transform(transform: dict) -> dict:
    return {
        "namespace": "t",
        "streamIdSuffix": "t",
        "description": "test",
        "version": 1,
        "source": {"type": "geistapi"},
        "transform": transform,
        "sink": {"type": "void"},
    }


def run_one(spark, transform: dict, event: str) -> list[dict]:
    ct = compile_transform(parse_spec(spec_with_transform(transform)))
    df = event_df(spark, event)
    return [r.asDict(recursive=True) for r in ct.apply(df).collect()]


# ---------------------------------------------------------------- extractFields
# transformer_test.go:135-327


def test_extract_int_from_string(spark):
    out = run_one(
        spark,
        {"extractFields": [{"fields": [{"id": "myCoolNumber", "jsonPath": "coolNumber", "type": "integer"}]}]},
        '{"coolNumber": "333"}',
    )
    assert out == [{"myCoolNumber": 333}]


def test_extract_number_as_string_when_untyped(spark):
    out = run_one(
        spark,
        {"extractFields": [{"fields": [{"id": "myCoolNumber", "jsonPath": "coolNumber"}]}]},
        '{"coolNumber": 333}',
    )
    assert out == [{"myCoolNumber": "333"}]


def test_iso_timestamp(spark):
    out = run_one(
        spark,
        {"extractFields": [{"fields": [{"id": "ts", "jsonPath": "coolIsoTimestamp", "type": "isoTimestamp"}]}]},
        '{"coolIsoTimestamp": "2019-11-30T14:57:23.389Z"}',
    )
    assert out[0]["ts"] == datetime.datetime(2019, 11, 30, 14, 57, 23, 389000)


def test_unix_timestamp_number_and_string(spark):
    t = {"extractFields": [{"fields": [{"id": "ts", "jsonPath": "coolUnixTimestamp", "type": "unixTimestamp"}]}]}
    out = run_one(spark, t, '{"coolUnixTimestamp": 1571831226950}')
    assert out[0]["ts"] == datetime.datetime(2019, 10, 23, 11, 47, 6, 950000)
    out = run_one(spark, t, '{"coolUnixTimestamp": "1571831226959"}')
    assert out[0]["ts"] == datetime.datetime(2019, 10, 23, 11, 47, 6, 959000)


def test_raw_event_field(spark):
    ev = '{"myThing": "1", "myOtherThing": 2}'
    out = run_one(
        spark,
        {"extractFields": [{"fields": [{"id": "myFullRawEvent", "type": "string"}]}]},
        ev,
    )
    assert out == [{"myFullRawEvent": ev}]


def test_bool_and_float(spark):
    out = run_one(
        spark,
        {"extractFields": [{"fields": [
            {"id": "cloudy", "jsonPath": "cloudyWeather", "type": "bool"},
            {"id": "rainy", "jsonPath": "rainyWeather", "type": "bool"},
        ]}]},
        '{"cloudyWeather": true, "rainyWeather": false}',
    )
    assert out == [{"cloudy": True, "rainy": False}]
    out = run_one(
        spark,
        {"extractFields": [{"fields": [{"id": "amount", "jsonPath": "amount", "type": "float"}]}]},
        '{"amount": 92834.37}',
    )
    assert out == [{"amount": 92834.37}]


def test_missing_field_gives_empty_string(spark):
    out = run_one(
        spark,
        {"extractFields": [{"fields": [{"id": "myImportantField", "jsonPath": "importantStuff"}]}]},
        '{"someStuff": "foo"}',
    )
    assert out == [{"myImportantField": ""}]


def test_json_blob_extract(spark):
    # transformer_test.go:329-347 (object path -> raw JSON text; Spark
    # returns compact form, compare parsed)
    out = run_one(
        spark,
        {"extractFields": [{"fields": [{"id": "jsonBlobId", "jsonPath": "importantStuff"}]}]},
        '{"unimportantStuff": "foo", "importantStuff": {"field1": "value1", "field2": "value2"}}',
    )
    assert json.loads(out[0]["jsonBlobId"]) == {"field1": "value1", "field2": "value2"}


# ---------------------------------------------------------------- dispatch + event split
# session spec semantics (transformer_test.go:27-64)

SESSION_TRANSFORM = {
    "extractFields": [
        {
            "forEventsWith": [{"key": "foo.evtType", "value": "FOO_SESSION_BEGIN"}],
            "fields": [
                {"id": "name", "jsonPath": "foo.evtType"},
                {"id": "custId", "jsonPath": "foo.custId"},
                {"id": "sessionId", "jsonPath": "bar.stuff.sId"},
                {"id": "pId", "jsonPath": "bar.stuff.pInfo.pId"},
                {"id": "pName", "jsonPath": "bar.stuff.pInfo.pName"},
                {"id": "pCurrency", "jsonPath": "bar.stuff.pInfo.pCur"},
            ],
        },
        {
            "forEventsWith": [{"key": "foo.evtType", "value": "FOO_SESSION_END"}],
            "fields": [
                {"id": "name", "jsonPath": "foo.evtType"},
                {"id": "custId", "jsonPath": "foo.custId"},
                {"id": "sessionId", "jsonPath": "bar.stuff.sId"},
                {"id": "pId", "jsonPath": "bar.stuff.pInfo.pId"},
                {"id": "pHostIp", "jsonPath": "bar.stuff.pHostIp"},
            ],
        },
    ]
}

BEGIN_EVENT = json.dumps(
    {
        "foo": {"evtType": "FOO_SESSION_BEGIN", "custId": "somecust"},
        "bar": {"stuff": {"sId": "855f4462", "pInfo": {"pName": "somename", "pId": 89, "pCur": "SEK"}}},
    }
)
END_EVENT = json.dumps(
    {
        "foo": {"evtType": "FOO_SESSION_END", "custId": "somecust"},
        "bar": {"stuff": {"sId": "855f4462", "pHostIp": "11.22.123.4"}},
    }
)


def test_session_dispatch_begin(spark):
    out = run_one(spark, SESSION_TRANSFORM, BEGIN_EVENT)
    assert len(out) == 1
    rec = out[0]
    assert rec["name"] == "FOO_SESSION_BEGIN"
    assert rec["custId"] == "somecust"
    assert rec["pId"] == "89"  # number -> string form (untyped)
    assert rec["pCurrency"] == "SEK"
    assert rec["pHostIp"] is None  # field of the other branch


def test_session_dispatch_end(spark):
    out = run_one(spark, SESSION_TRANSFORM, END_EVENT)
    assert len(out) == 1
    assert out[0]["name"] == "FOO_SESSION_END"
    assert out[0]["pHostIp"] == "11.22.123.4"


def test_non_matching_event_filtered(spark):
    ev = json.dumps({"foo": {"evtType": "SOMETHING_ELSE"}})
    assert run_one(spark, SESSION_TRANSFORM, ev) == []


def test_event_split_multiple_blocks(spark):
    # a block without forEventsWith matches everything -> 2 records
    t = {
        "extractFields": [
            {"fields": [{"id": "a", "jsonPath": "x"}]},
            {"fields": [{"id": "b", "jsonPath": "y"}]},
        ]
    }
    out = run_one(spark, t, '{"x": "1", "y": "2"}')
    assert out == [{"a": "1", "b": None}, {"a": None, "b": "2"}]


# ---------------------------------------------------------------- gjson queries
# xch-eur spec (transformer_test.go:374-409)

XCH_TRANSFORM = {
    "extractFields": [
        {
            "forEventsWith": [
                {"key": "name", "value": "XCH_RATES_UPDATED"},
                {"key": 'data.#(base=="EUR").base', "value": "EUR"},
            ],
            "fields": [
                {"id": "rates", "jsonPath": 'data.#(base=="EUR").rates'},
                {"id": "eventDate", "jsonPath": "ts"},
            ],
        }
    ]
}


def test_gjson_array_query(spark):
    ev = json.dumps(
        {
            "name": "XCH_RATES_UPDATED",
            "ts": "2019-12-07T13:21:42.615Z",
            "data": [
                {"base": "CHF", "rates": {"HRK": 0.14, "CHF": 1}},
                {"base": "EUR", "rates": {"HRK": 0.147, "CHF": 1.08}},
            ],
        }
    )
    out = run_one(spark, XCH_TRANSFORM, ev)
    assert len(out) == 1
    assert out[0]["eventDate"] == "2019-12-07T13:21:42.615Z"
    assert json.loads(out[0]["rates"]) == {"HRK": 0.147, "CHF": 1.08}


def test_gjson_query_non_applicable(spark):
    ev = json.dumps({"name": "XCH_RATES_UPDATED", "ts": "x", "data": [{"base": "CHF", "rates": {}}]})
    assert run_one(spark, XCH_TRANSFORM, ev) == []


# ---------------------------------------------------------------- array items
# transformer_test.go:417-487

ARRAY_EVENT = json.dumps(
    {
        "name": "COOL_EVENT",
        "dateOccurred": "2020-09-07T13:45:44.559Z",
        "coolArray": [
            {"fooId": "fooValue1", "barId": "barValue1", "things": "x", "moreThings": ["3", "2", "1"]},
            {"fooId": "fooValue2", "barId": "barValue2", "things": "x", "moreThings": ["6", "5", "4"]},
        ],
    }
)


def test_extract_items_from_array(spark):
    t = {
        "extractItemsFromArray": [
            {
                "id": "myItemMapId",
                "items": {
                    "jsonPathToArray": "coolArray",
                    "idFromItemFields": {"delimiter": "#", "fields": ["fooId", "barId"]},
                },
            }
        ]
    }
    out = run_one(spark, t, ARRAY_EVENT)
    assert len(out) == 1
    items = out[0]["myItemMapId"]
    assert set(items) == {"fooValue1#barValue1", "fooValue2#barValue2"}
    assert json.loads(items["fooValue1#barValue1"])["fooId"] == "fooValue1"


def test_array_items_empty_id_dropped(spark):
    ev = json.dumps({"arr": [{"k": "a"}, {"nokey": 1}]})
    t = {
        "extractItemsFromArray": [
            {
                "id": "m",
                "items": {"jsonPathToArray": "arr", "idFromItemFields": {"delimiter": "#", "fields": ["k"]}},
            }
        ]
    }
    out = run_one(spark, t, ev)
    assert set(out[0]["m"]) == {"a"}


# ---------------------------------------------------------------- filters
# transformer_test.go:489-909

def _filter_transform(excl):
    return {
        "excludeEventsWith": excl,
        "extractFields": [{"fields": [{"id": "name", "jsonPath": "name"}]}],
    }


def test_blacklist(spark):
    t = _filter_transform([{"key": "provider", "values": ["badguy", "worseguy"]}])
    assert run_one(spark, t, '{"name": "a", "provider": "badguy"}') == []
    assert run_one(spark, t, '{"name": "a", "provider": "goodguy"}') == [{"name": "a"}]
    # missing field -> "" -> not in blacklist -> kept
    assert run_one(spark, t, '{"name": "a"}') == [{"name": "a"}]


def test_whitelist(spark):
    t = _filter_transform([{"key": "provider", "valuesNotIn": ["goodguy"]}])
    assert run_one(spark, t, '{"name": "a", "provider": "badguy"}') == []
    assert run_one(spark, t, '{"name": "a", "provider": "goodguy"}') == [{"name": "a"}]
    # missing -> "" not in whitelist -> excluded
    assert run_one(spark, t, '{"name": "a"}') == []


def test_value_is_empty(spark):
    t = _filter_transform([{"key": "f", "valueIsEmpty": True}])
    assert run_one(spark, t, '{"name": "a", "f": ""}') == []
    assert run_one(spark, t, '{"name": "a"}') == []  # missing counts as empty
    assert run_one(spark, t, '{"name": "a", "f": "x"}') == [{"name": "a"}]


def test_empty_check_precedes_whitelist(spark):
    # valueIsEmpty=true short-circuits before whitelist check
    t = _filter_transform([{"key": "f", "valueIsEmpty": True, "valuesNotIn": [""]}])
    assert run_one(spark, t, '{"name": "a", "f": ""}') == []


def test_multiple_filters_are_or(spark):
    t = _filter_transform(
        [{"key": "p1", "values": ["bad"]}, {"key": "p2", "values": ["alsobad"]}]
    )
    assert run_one(spark, t, '{"name": "a", "p1": "bad", "p2": "fine"}') == []
    assert run_one(spark, t, '{"name": "a", "p1": "fine", "p2": "alsobad"}') == []
    assert run_one(spark, t, '{"name": "a", "p1": "fine", "p2": "fine"}') == [{"name": "a"}]


def test_multi_condition_and(spark):
    t = {
        "excludeEventsWithMultipleConditions": [
            {"filters": [{"key": "name", "values": ["x"]}, {"key": "version", "values": ["2"]}]}
        ],
        "extractFields": [{"fields": [{"id": "name", "jsonPath": "name"}]}],
    }
    assert run_one(spark, t, '{"name": "x", "version": "2"}') == []
    # int 2 matches string "2" via string coercion
    assert run_one(spark, t, '{"name": "x", "version": 2}') == []
    assert run_one(spark, t, '{"name": "x", "version": "3"}') == [{"name": "x"}]
    assert run_one(spark, t, '{"name": "y", "version": "2"}') == [{"name": "y"}]


def test_block_local_exclude(spark):
    # schema-evolution pattern (transformer_test.go:795-909)
    t = {
        "extractFields": [
            {
                "forEventsWith": [{"key": "version", "value": "1"}],
                "excludeEventsWith": [{"key": "status", "values": ["skip"]}],
                "fields": [{"id": "name", "jsonPath": "name"}],
            }
        ]
    }
    assert run_one(spark, t, '{"version": "1", "status": "skip", "name": "a"}') == []
    assert run_one(spark, t, '{"version": "1", "status": "ok", "name": "a"}') == [{"name": "a"}]
    assert run_one(spark, t, '{"version": "2", "status": "ok", "name": "a"}') == []


def test_for_events_with_numeric_match(spark):
    # "3" matches JSON number 3 (entity/spec.go:326-334)
    t = {
        "extractFields": [
            {
                "forEventsWith": [{"key": "v", "value": "3"}],
                "fields": [{"id": "name", "jsonPath": "name"}],
            }
        ]
    }
    assert run_one(spark, t, '{"v": 3, "name": "a"}') == [{"name": "a"}]
    assert run_one(spark, t, '{"v": "3", "name": "a"}') == [{"name": "a"}]
    assert run_one(spark, t, '{"v": 4, "name": "a"}') == []
    assert run_one(spark, t, '{"name": "a"}') == []  # missing -> not applicable


# ---------------------------------------------------------------- userAgent
# transformer_test.go:349-367 (TestUserAgentExtract golden)


def test_user_agent_extract_golden(spark):
    """Byte-identical to the reference's mssola/user_agent output for
    the iPhone golden case, through the compiled DataFrame path."""
    event = json.dumps({
        "ua": "Mozilla%2F5.0%20(iPhone%3B%20CPU%20iPhone%20OS%2014_6%20like"
              "%20Mac%20OS%20X)%20AppleWebKit%2F605.1.15%20(KHTML%2C%20like"
              "%20Gecko)%20Version%2F14.1.1%20Mobile%2F15E148%20Safari%2F604.1"
    })
    out = run_one(
        spark,
        {"extractFields": [{"fields": [
            {"id": "userAgentId", "jsonPath": "ua", "type": "userAgent"}]}]},
        event,
    )
    assert out == [{"userAgentId": (
        '{"platform":"iPhone","operatingSystem":{"name":"iPhone OS",'
        '"fullName":"CPU iPhone OS 14_6 like Mac OS X","version":"14.6"},'
        '"localization":"","browser":{"name":"Safari","version":"14.1.1",'
        '"engine":"AppleWebKit","engineVersion":"605.1.15"},'
        '"bot":false,"mobile":true}'
    )}]


def test_user_agent_bot_and_windows(spark):
    out = run_one(
        spark,
        {"extractFields": [{"fields": [
            {"id": "a", "jsonPath": "ua", "type": "userAgent"}]}]},
        '{"ua": "Googlebot%2F2.1%20(%2Bhttp%3A%2F%2Fwww.google.com%2Fbot.html)"}',
    )
    parsed = json.loads(out[0]["a"])
    assert parsed["bot"] is True and parsed["mobile"] is False


def test_url_normalize_field_type(spark):
    """Engine-extension extractFields type urlNormalize: spec-declared
    canonicalization with string zero-value coercion for non-URLs."""
    from geist_spark.compiler.transform import compile_transform
    from geist_spark.spec.model import parse_spec

    ct = compile_transform(parse_spec({
        "namespace": "t", "streamIdSuffix": "urln", "version": 1,
        "description": "urlNormalize type",
        "source": {"type": "geistapi"},
        "transform": {"extractFields": [{"fields": [
            {"id": "u", "jsonPath": "page", "type": "urlNormalize"},
        ]}]},
        "sink": {"type": "void"},
    }).transform)
    df = spark.createDataFrame(
        [
            ('{"page": "HTTP://A.com:80/x/?utm_s=1&b=2#f"}',),
            ('{"page": "not a url"}',),
            ('{"other": 1}',),
        ],
        "value string",
    )
    got = [r.u for r in ct.apply(df).collect()]
    assert got == ["http://a.com/x?b=2", "", ""]


def test_number_field_type_compiles(spark):
    """Reference type 'number' (spec.go generic numeric) compiles to
    double with float zero-value coercion."""
    from geist_spark.compiler.transform import compile_transform
    from geist_spark.spec.model import parse_spec

    ct = compile_transform(parse_spec({
        "namespace": "t", "streamIdSuffix": "numtype", "version": 1,
        "description": "number type",
        "source": {"type": "geistapi"},
        "transform": {"extractFields": [{"fields": [
            {"id": "v", "jsonPath": "v", "type": "number"},
        ]}]},
        "sink": {"type": "void"},
    }).transform)
    df = spark.createDataFrame(
        [('{"v": 3.5}',), ('{"v": 2}',), ('{"other": 1}',)], "value string"
    )
    got = [r.v for r in ct.apply(df).collect()]
    assert got == [3.5, 2.0, 0.0]


def test_ua_native_expr_matches_python_parser(spark):
    """The JVM-native userAgent compile (ua_json_expr) must emit
    byte-identical JSON to the Python parser over the full heuristic
    matrix: every OS branch, every browser pattern, engines, bots,
    localization, mobile flags, URL-escaped and raw forms, malformed
    escapes, '+', empty, and NULL. This pins the ua.py parity contract
    that let the spec compiler drop the last Python-UDF plan."""
    import urllib.parse

    from pyspark.sql import functions as F

    from geist_spark.functions.ua import parse_user_agent, ua_json_expr

    corpus = [
        "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36"
        " (KHTML, like Gecko) Chrome/109.0.0.0 Safari/537.36",
        "Mozilla/5.0 (iPhone; CPU iPhone OS 16_3 like Mac OS X)"
        " AppleWebKit/605.1.15 (KHTML, like Gecko) Version/16.3"
        " Mobile/15E148 Safari/604.1",
        "Mozilla/5.0 (iPad; CPU OS 15_7 like Mac OS X)"
        " AppleWebKit/605.1.15 (KHTML, like Gecko) CriOS/108.0.5359.112"
        " Mobile/15E148 Safari/604.1",
        "Mozilla/5.0 (Linux; Android 13; Pixel 7) AppleWebKit/537.36"
        " (KHTML, like Gecko) Chrome/109.0.0.0 Mobile Safari/537.36",
        "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7)"
        " AppleWebKit/605.1.15 (KHTML, like Gecko) Version/16.1"
        " Safari/605.1.15",
        "Mozilla/5.0 (X11; Ubuntu; Linux x86_64; rv:109.0)"
        " Gecko/20100101 Firefox/110.0",
        "Mozilla/5.0 (Windows NT 6.1; WOW64; Trident/7.0; rv:11.0)"
        " like Gecko",
        "Mozilla/4.0 (compatible; MSIE 8.0; Windows NT 5.1; Trident/4.0)",
        "Mozilla/5.0 (compatible; Googlebot/2.1;"
        " +http://www.google.com/bot.html)",
        "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36"
        " (KHTML, like Gecko) Chrome/109.0.0.0 Safari/537.36"
        " Edg/109.0.1518.61",
        "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36"
        " (KHTML, like Gecko) Chrome/105.0.0.0 Safari/537.36"
        " OPR/91.0.4516.20",
        "Opera/9.80 (Windows NT 6.0) Presto/2.12.388 Version/12.14",
        "Mozilla/5.0 (iPhone; CPU iPhone OS 15_6 like Mac OS X)"
        " AppleWebKit/605.1.15 (KHTML, like Gecko) FxiOS/107.0"
        " Mobile/15E148 Safari/605.1.15",
        "curl/7.81.0",
        "python-requests/2.28.1",
        "Mozilla/5.0 (Windows Phone 10.0; Android 6.0.1; Microsoft;"
        " Lumia 650) AppleWebKit/537.36 (KHTML, like Gecko)"
        " Chrome/52.0.2743.116 Mobile Safari/537.36 Edge/15.15254",
        "Mozilla/5.0 (Windows; U; Windows NT 5.1; en-GB; rv:1.8.1.6)"
        " Gecko/20070725 Firefox/2.0.0.6",
        "Mozilla/5.0 (X11; Linux i686; rv:109.0) Gecko/20100101"
        " Firefox/110.0",
        "facebookexternalhit/1.1"
        " (+http://www.facebook.com/externalhit_uatext.php)",
        "Mediapartners-Google",
        "Mozilla/5.0 (PlayStation 4 3.11) AppleWebKit/537.73"
        " (KHTML, like Gecko)",
        "Mozilla/5.0 (compatible; Yahoo! Slurp;"
        " http://help.yahoo.com/help/us/ysearch/slurp)",
        "Mozilla/5.0 (Nintendo Switch; WifiWebAuthApplet)"
        " AppleWebKit/606.4 (KHTML, like Gecko) NF/6.0.1.15.4"
        " NintendoBrowser/5.1.0.20393",
        "",
        "weird no parens",
        # non-ASCII: raw UTF-8 on both sides now (ensure_ascii=False in
        # the Python twin matches to_json and the reference's Go
        # json.Marshal); ASCII-pinned \w keeps the fallthrough token
        # rule identical across engines
        "Mozilla/5.0 (Linux; U; Android 4.0.3; \u0440\u0443-ru)"
        " AppleWebKit/534.30 (KHTML, like Gecko) Mobile Safari/534.30",
        "A\u00fc/1.0",
        # Unicode-semantics corners: NBSP where Java \s won't match,
        # a tab F.trim won't strip, Arabic-Indic digits Java \d won't
        # match — the Python twin pins re.ASCII / strip(" ") so both
        # sides agree (ua.py module comment)
        "Mozilla/5.0 (Windows; U;\u00a0en-GB; rv:1.8.1.6)"
        " Gecko/20070725 Firefox/2.0.0.6",
        "Mozilla/5.0 (\tiPhone; CPU iPhone OS 14_2 like Mac OS X)"
        " AppleWebKit/605.1.15",
        "Opera/\u0669.\u0668\u0660 (Windows NT 6.0)",
        "(only; a; section)",
        "100% broken %zz escape",
        "a+b c%20d",
    ]
    cases: list = []
    for ua in corpus:
        cases.append(ua)
        cases.append(urllib.parse.quote(ua))
    cases.append(None)

    df = spark.createDataFrame([(c,) for c in cases], "ua string")
    out = df.select("ua", ua_json_expr(F.col("ua")).alias("j")).collect()
    for r in out:
        assert r["j"] == parse_user_agent(r["ua"]), repr(r["ua"])
    # and the compiled plan is Python-free
    plan = (
        df.select(ua_json_expr(F.col("ua")))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_parse_user_agents_dictionary_join(spark):
    """Dictionary UA parsing (distinct -> parse -> broadcast join)
    returns exactly what mapping ua_json_expr over every row would,
    including NULL ua (parsed as empty string), duplicate values, and
    row multiplicity."""
    from pyspark.sql import functions as F

    from geist_spark.functions.ua import parse_user_agents, ua_json_expr

    df = spark.createDataFrame(
        [
            (1, "curl/7.81.0"),
            (2, "curl/7.81.0"),
            (3, None),
            (4, "Mozilla/5.0 (X11; Linux i686; rv:109.0) Gecko/20100101"
                " Firefox/110.0"),
        ],
        "id long, ua string",
    )
    via_dict = {
        r["id"]: r["ua_json"]
        for r in parse_user_agents(df, "ua").collect()
    }
    direct = {
        r["id"]: r["j"]
        for r in df.select("id", ua_json_expr(F.col("ua")).alias("j")).collect()
    }
    assert via_dict == direct and len(via_dict) == 4
