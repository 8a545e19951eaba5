"""Job metrics + latency stats (reference A4: the loadtester's
count / rate / p99 aggregates, cmd/loadtester/main.go:93-135) and the
P4 property-filtering projection the reference left as TODO
(server/server.go:209)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.observation import Observation


def observe_stab_metrics(result: DataFrame):
    """Attach an Observation to a stab-join result: row count, sure-hit
    count (geometry tests skipped), candidate-passed count — collected
    for free with the action, no extra job (the accumulator/metrics
    analog of the reference's Prometheus counters, server/server.go:37-48).

    Returns (df, observation); read observation.get after an action."""
    obs = Observation("stab_metrics")
    df = result.observe(
        obs,
        F.count(F.lit(1)).alias("hits"),
        F.sum(F.col("is_sure_hit").cast("long")).alias("sure_hits"),
        F.sum((~F.col("is_sure_hit")).cast("long")).alias("pip_passed"),
    )
    return df, obs


def value_stats(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """count / min / max / exact p50 / p99 per group — the loadtester's
    timer aggregates as one Spark aggregation. Uses exact `percentile`
    (order-independent, so an external oracle can reproduce it);
    deliberately no float sums (partial-aggregation order would make
    cross-engine hashes unstable)."""
    return df.groupBy(group_col).agg(
        F.count("*").cast("long").alias("n"),
        F.min(value_col).alias("v_min"),
        F.max(value_col).alias("v_max"),
        F.expr(f"percentile({value_col}, 0.5)").alias("p50"),
        F.expr(f"percentile({value_col}, 0.99)").alias("p99"),
    )


def filter_properties(result: DataFrame, keys, props_col: str = "properties") -> DataFrame:
    """P4: keep only the requested property keys (reference TODO at
    server/server.go:209) — pure Catalyst map_filter."""
    keyset = F.array(*[F.lit(k) for k in keys])
    return result.withColumn(
        props_col, F.map_filter(F.col(props_col), lambda k, _: F.array_contains(keyset, k))
    )


def typed_prop(key: str, dtype: str, json_col: str = "properties_json"):
    """Typed property accessor over the JSON-preserved properties
    (reference tools.go:253-274 keeps bool|int|string|float64|nil):
    returns a Catalyst column of `dtype` ('boolean', 'long', 'double',
    'string') — NULL when the key is absent or the JSON value is null.
    A numeric filter like typed_prop('population', 'long') > 10000 runs
    whole-stage-codegen with no per-row Python and no string-cast on
    the user side. try_cast (not cast): under ANSI mode a
    wrongly-typed value yields NULL instead of failing the job —
    matching the reference's interface{} nil fallback."""
    raw = F.get_json_object(F.col(json_col), f"$.{key}")
    return raw.try_cast(dtype)


def get_feature(index, feature_id: int, loop_pos: int | None = None) -> DataFrame:
    """Single-feature fetch by id (and optionally loop index) — the
    reference's Get(id, loop_index) API (server/server.go:312-361),
    re-expressed as a filter on the features table (feature_id is a
    pushdown-able predicate on the parquet-backed index)."""
    df = index.features.filter(F.col("feature_id") == int(feature_id))
    if loop_pos is not None:
        df = df.filter(F.col("loop_pos") == int(loop_pos))
    return df
