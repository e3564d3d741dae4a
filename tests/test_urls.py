"""URL canonicalization tests: hostile-URL behavior of every rule,
Spark-vs-DuckDB builder parity on adversarial inputs, and the t16/d12
oracle compares at the driver's correctness scale + plan shapes."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import canonical_rows

from pipeline_mf_etl_spark.operators.url import (
    url_canonical_columns,
    url_canonical_sql,
)
from pipeline_mf_etl_spark.queries import all_queries

SF_ORACLE = "/root/testdata/sf0.01"

HOSTILE = [
    # every rule at once: case, default port, dup slashes, trailing
    # slash, tracking params interleaved with kept ones, fragment
    "HTTP://WWW.Example-7.COM:80/Docs//42/?utm_source=feed&id=42&utm_medium=x#Sec",
    # ccTLD delegated zone + default https port + triple slashes
    "https://Sub.Host.CO.UK:443/a//b///c/?fbclid=zz",
    # NON-default port must be kept; root path keeps its slash
    "https://host.org:8080/",
    # bare host: empty path becomes '/'
    "http://www.a.com",
    # kept params preserve relative order around a stripped one
    "HTTPS://X.NET/path/?id=1&ref=spam&q=two",
    # fragment-only tail
    "http://example.com/#frag-only",
    # deep subdomain under ac.jp (3-label registrable domain)
    "http://deep.sub.example.ac.jp:80/x/",
    # every param is tracking: the '?' itself must vanish
    "http://h.io/p?gclid=1&utm_campaign=c",
    # https with :80 is NOT a default port and must be kept
    "https://h.io:80/p",
]


def _spark_rows(spark):
    sdf = spark.createDataFrame([(u,) for u in HOSTILE], "url string")
    cols = url_canonical_columns(F.col("url"))
    return [tuple(r) for r in sdf.select(
        *[v.alias(k) for k, v in cols.items()]
    ).collect()]


def test_hostile_urls_canonicalize(spark):
    got = {u: r for u, r in zip(HOSTILE, _spark_rows(spark))}
    c = got[HOSTILE[0]]
    assert c[0] == "http://www.example-7.com/Docs/42?id=42"
    assert c[1] == "example-7.com" and c[2] == "http"
    assert c[3] is True and c[4] is True and c[5] == 1
    assert got[HOSTILE[1]][0] == "https://sub.host.co.uk/a/b/c"
    assert got[HOSTILE[1]][1] == "host.co.uk"
    assert got[HOSTILE[2]][0] == "https://host.org:8080/"
    assert got[HOSTILE[3]][0] == "http://www.a.com/"
    assert got[HOSTILE[3]][1] == "a.com"
    assert got[HOSTILE[4]][0] == "https://x.net/path?id=1&q=two"
    assert got[HOSTILE[4]][5] == 2
    assert got[HOSTILE[5]][0] == "http://example.com/"
    assert got[HOSTILE[5]][3] is True
    assert got[HOSTILE[6]][1] == "example.ac.jp"
    assert got[HOSTILE[7]][0] == "http://h.io/p"
    assert got[HOSTILE[7]][5] == 0
    assert got[HOSTILE[8]][0] == "https://h.io:80/p"


def test_builders_agree_spark_vs_duckdb(spark, duck):
    sqls = url_canonical_sql("url")
    sel = ", ".join(f"{v} AS {k}" for k, v in sqls.items())
    duck.execute("CREATE OR REPLACE TABLE hostile_urls(url VARCHAR)")
    for u in HOSTILE:
        duck.execute("INSERT INTO hostile_urls VALUES (?)", [u])
    drows = duck.execute(f"SELECT {sel} FROM hostile_urls").fetchall()
    assert _spark_rows(spark) == [tuple(r) for r in drows]


def _compare(spark, duck, name):
    spec = all_queries()[name]
    sdf = spec.spark(spark, SF_ORACLE)
    srows = [tuple(r) for r in sdf.collect()]
    cur = duck.execute(spec.oracle)
    dcols = [d[0] for d in cur.description]
    drows = cur.fetchall()
    assert sorted(sdf.columns) == sorted(dcols), name
    assert len(srows) == len(drows), name
    assert canonical_rows(srows, sdf.columns) == canonical_rows(drows, dcols)
    return len(srows)


def test_t16_matches_oracle(spark, duck):
    assert _compare(spark, duck, "t16_url_canonicalize") == 500


def test_d12_matches_oracle(spark, duck):
    assert _compare(spark, duck, "d12_url_domain_rollup") == 50


def test_t16_plan_is_pure_jvm_map(spark):
    fn = all_queries()["t16_url_canonicalize"].spark
    plan = (
        fn(spark, SF_ORACLE)._jdf.queryExecution().executedPlan().toString()
    )
    low = plan.lower()
    assert "exchange" not in low
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_d12_plan_single_exchange_with_partial_agg(spark):
    fn = all_queries()["d12_url_domain_rollup"].spark
    plan = (
        fn(spark, SF_ORACLE)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.lower().count("exchange hashpartitioning") <= 2
    assert "partial" in plan.lower()
