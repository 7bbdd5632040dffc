"""Session-7 operators: corpus mixing (data-recipe reweighting) and
token-budget selection (operators/mixing.py)."""

import pytest
from pyspark.sql import functions as F

from crawl4ai_scraper_spark.operators.mixing import (
    corpus_mix_apply,
    corpus_mix_plan,
    token_budget_select,
)


@pytest.fixture(scope="module")
def skewed(spark):
    # en-heavy corpus: token weights 10 per doc, 60/20/20 docs per lang
    rows = [(i, "en" if i < 60 else ("de" if i < 80 else "fr"), 10) for i in range(100)]
    return spark.createDataFrame(rows, "doc_id long, lang string, w long")


TARGET = {"en": 0.5, "de": 0.25, "fr": 0.25}


def test_mix_plan_downsample_binding_group_keeps_all(spark, skewed):
    plan = {r["lang"]: r for r in corpus_mix_plan(skewed, "lang", "w", TARGET).collect()}
    # weights: en 600, de 200, fr 200 → T = min(600/.5, 200/.25, 200/.25) = 800
    # rates: en .5*800/600 = 2/3, de = fr = 1.0 exactly
    for binding in ("de", "fr"):
        assert plan[binding]["epochs"] == 1 and plan[binding]["rate_steps"] == 0
        assert plan[binding]["keep_rate"] == 1.0
    assert plan["en"]["epochs"] == 0
    assert plan["en"]["rate_steps"] == int((2 / 3) * 4096)  # floor-quantized
    assert abs(plan["en"]["keep_rate"] - 2 / 3) < 1 / 4096
    assert plan["en"]["share"] == 0.6 and plan["en"]["target_share"] == 0.5


def test_mix_plan_drops_groups_absent_from_target(spark, skewed):
    plan = corpus_mix_plan(skewed, "lang", "w", {"en": 0.5, "de": 0.5})
    assert {r["lang"] for r in plan.collect()} == {"en", "de"}


def test_mix_apply_downsample_hits_target_shares(spark, skewed):
    plan = corpus_mix_plan(skewed, "lang", "w", TARGET)
    kept = corpus_mix_apply(skewed, "doc_id", "lang", plan)
    got = {r["lang"]: r["n"] for r in
           kept.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    # de/fr keep all 20; en keeps ~2/3 of 60 = ~40 (md5-threshold, ±noise)
    assert got["de"] == 20 and got["fr"] == 20
    assert 30 <= got["en"] <= 50
    # pure downsampling → epoch 0 only, and the kept set is deterministic
    assert kept.agg(F.max("epoch")).first()[0] == 0
    again = corpus_mix_apply(skewed, "doc_id", "lang", plan)
    assert sorted(r["doc_id"] for r in kept.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )


def test_mix_apply_upsample_epochs(spark, skewed):
    # pin total at 2× corpus weight (1000→2000): en rate 2000*.5/600 = 5/3,
    # de/fr rate 2000*.25/200 = 2.5 → 2 full copies + a 0.5-rate third
    plan = corpus_mix_plan(skewed, "lang", "w", TARGET, total_out=2000.0)
    p = {r["lang"]: r for r in plan.collect()}
    assert p["de"]["epochs"] == 2 and p["de"]["rate_steps"] == 2048
    assert p["en"]["epochs"] == 1
    kept = corpus_mix_apply(skewed, "doc_id", "lang", plan)
    per_doc = {
        (r["lang"], r["doc_id"]): r["n"]
        for r in kept.groupBy("lang", "doc_id").agg(F.count("*").alias("n")).collect()
    }
    # every doc appears epochs or epochs+1 times, copies are epoch-distinct
    for (lang, _), n in per_doc.items():
        assert n in (p[lang]["epochs"], p[lang]["epochs"] + 1)
    de_counts = [n for (lang, _), n in per_doc.items() if lang == "de"]
    assert any(n == 3 for n in de_counts) and any(n == 2 for n in de_counts)
    assert kept.count() == kept.select("lang", "doc_id", "epoch").distinct().count()


def test_token_budget_select_equals_naive_window(spark):
    rows = [(i, float((i * 7) % 10) / 10.0, 5 + (i % 11)) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, qual double, ntok long")
    got = token_budget_select(df, "doc_id", "ntok", "qual", budget=400)
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("qual"), F.asc("doc_id"))
    naive = (
        df.withColumn("cum_before", F.sum("ntok").over(w) - F.col("ntok"))
        .filter(F.col("cum_before") < 400)
        .select(
            F.col("doc_id").alias("id"),
            F.col("qual").alias("quality"),
            F.col("ntok").alias("n_tokens"),
            F.col("cum_before").cast("long").alias("cum_before"),
        )
    )
    key = lambda r: (r["id"], r["quality"], r["n_tokens"], r["cum_before"])
    assert sorted(map(key, got.collect())) == sorted(map(key, naive.collect()))
    # the straddler is included: kept tokens reach or pass the budget
    assert got.agg(F.sum("n_tokens")).first()[0] >= 400


def test_token_budget_select_edges(spark):
    df = spark.createDataFrame(
        [(1, 0.9, 100), (2, 0.5, 100)], "doc_id long, qual double, ntok long"
    )
    assert token_budget_select(df, "doc_id", "ntok", "qual", budget=0).count() == 0
    one = token_budget_select(df, "doc_id", "ntok", "qual", budget=100).collect()
    assert [r["id"] for r in one] == [1]  # exact fit: second doc starts AT budget
