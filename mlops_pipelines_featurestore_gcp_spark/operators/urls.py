"""URL canonicalization and host-level dedup/downsampling.

The cheapest dedup tier in a web-scale training-data pipeline runs
BEFORE any content pass: collapse URL variants that name the same page
(scheme, ``www.``, default ports, tracking parameters, fragments,
slash noise — the RFC 3986 §6 normalizations plus the tracker strip
every production crawler applies, cf. CCNet/RefinedWeb host-level
stages), then dedup on the canonical form and cap documents per host.
Everything here is pure built-in string/array expressions — JVM-side,
whole-stage-codegen, zero Python — and every operator is one keyed
window over the canonical key or the host, so the 100 TB plan is one
shuffle each.

Reference tie-in: the reference ingests raw corpora by URI into
BigQuery (``load_component.py:37-50`` — ``load_table_from_uri`` with a
source-format config) and delegates every dedup/provenance decision to
the warehouse; this module is the engine-native canonical-URL tier such
a pipeline needs at crawl scale.

Skew note (100 TB): both windows partition by a key whose worst-case
population is one host's document count. Real crawls have mega-hosts;
when one host's rows overflow an executor, the q37 salted-top-k
pattern applies unchanged (salt the rank stage, re-rank the per-salt
survivors) — documented here, not defaulted, because the cap path's
per-row state is one long and Spark's window spills to disk correctly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from mlops_pipelines_featurestore_gcp_spark.functions.text import md5_long

# One param per `&`-separated pair: click-identifier and campaign-tag
# parameters carry no content identity. Kept deliberately short and
# mirrored VERBATIM in every oracle twin (plans/llm_data.py d11).
TRACKING_PARAM_RE = "^(utm_[a-z]+|gclid|fbclid|msclkid|ref)="


def host_of(url: Column) -> Column:
    """Lowercased host of a URL, scheme/port/``www.`` stripped.

    Pure regex pipeline (each step expressible in both Java regex and
    RE2, so oracle twins replay it): drop fragment, drop scheme, take
    up to the first ``/``, lowercase, strip default port, strip a
    leading ``www.``.
    """
    u = F.regexp_replace(url, "#.*$", "")
    u = F.regexp_replace(u, "^[a-zA-Z][a-zA-Z0-9+.-]*://", "")
    hostport = F.lower(F.regexp_extract(u, "^[^/?]*", 0))
    host = F.regexp_replace(hostport, ":(80|443)$", "")
    return F.regexp_replace(host, "^www\\.", "")


def canonical_url(url: Column) -> Column:
    """Canonical form: ``host + normalized-path [+ '?' + kept-params]``.

    Normalizations (RFC 3986 §6 syntax-based, plus the tracker strip):
    fragment dropped; scheme dropped (http/https name the same page for
    dedup purposes); host lowercased, default port and ``www.``
    stripped; duplicate slashes collapsed and the trailing slash
    dropped; query params with tracking keys removed, the survivors
    sorted (param order never changes identity) and rejoined.

    Percent-encoding normalization (``%7E`` vs ``~``) is NOT applied —
    it needs a decode table; documented boundary, same posture as the
    non-PNG codecs.
    """
    u = F.regexp_replace(url, "#.*$", "")
    u = F.regexp_replace(u, "^[a-zA-Z][a-zA-Z0-9+.-]*://", "")
    pq = F.regexp_replace(u, "^[^/?]*", "")
    path = F.regexp_extract(pq, "^[^?]*", 0)
    path = F.regexp_replace(path, "/{2,}", "/")
    path = F.regexp_replace(path, "/+$", "")
    query = F.regexp_replace(pq, "^[^?]*\\??", "")
    kept = F.filter(
        F.split(query, "&"),
        lambda p: (p != F.lit("")) & ~p.rlike(TRACKING_PARAM_RE),
    )
    qcanon = F.array_join(F.array_sort(kept), "&")
    return F.concat(
        host_of(url),
        path,
        F.when(qcanon == "", F.lit("")).otherwise(F.concat(F.lit("?"), qcanon)),
    )


def url_dedup_keep_first(
    df: DataFrame,
    *,
    url_col: str = "url",
    id_col: str = "doc_id",
    canon_col: str = "canonical_url",
) -> DataFrame:
    """One row per input row: ``kept`` = 1 for the smallest id of each
    canonical-URL group, ``dup_of`` = that smallest id for the rest
    (NULL for kept rows) — the d01/d08 keep-best shape on the canonical
    key.

    The keeper comes from a ``groupBy().min()`` + equi-join back, NOT a
    windowed min: a window sends every row of a hot canonical URL (one
    page re-crawled 10⁷ times — routine in a crawl corpus) through one
    task with no partial combine, while the aggregate combines map-side
    and AQE splits a skewed join key. Two skew-immune shuffles instead
    of one skew-fragile one."""
    out = df.withColumn(canon_col, canonical_url(F.col(url_col)))
    keepers = out.groupBy(canon_col).agg(F.min(id_col).alias("__keeper"))
    return (
        out.join(keepers, canon_col)
        .withColumn("kept", (F.col(id_col) == F.col("__keeper")).cast("int"))
        .withColumn("dup_of", F.when(F.col(id_col) != F.col("__keeper"), F.col("__keeper")))
        .drop("__keeper")
    )


def host_downsample(
    df: DataFrame,
    *,
    url_col: str = "url",
    id_col: str = "doc_id",
    cap: int = 100,
    salt: str = "host-ds",
    host_col: str = "host",
    salted: bool = False,
) -> DataFrame:
    """Cap documents per host at ``cap``, chosen by a deterministic
    md5 draw (never ``rand()``): rank within host by
    ``(md5(salt|id), id)`` and keep rank ≤ cap — an unbiased,
    replayable per-host sample (the RefinedWeb host-budget stage).
    Adds ``host`` and ``host_kept``; one row per input row either way.

    ``salted=False``: one host-keyed window — right while every host's
    rows fit one task. ``salted=True``: the q37 two-phase salted rank
    (``skew.salted_topk`` — mega-hosts are the EXPECTED shape of a real
    crawl) picks the identical keeper set (total order ⇒ exactness),
    then one equi-join on the UNIQUE id (skew-free by construction)
    attaches the flag. Bit-equal outputs, pinned by test."""
    out = df.withColumn(host_col, host_of(F.col(url_col)))
    draw = md5_long(
        F.concat(F.lit(salt + "|"), F.col(id_col).cast("string")), bits=60
    )
    if not salted:
        w = Window.partitionBy(host_col).orderBy(draw.asc(), F.col(id_col).asc())
        return out.withColumn(
            "host_kept", (F.row_number().over(w) <= cap).cast("int")
        )
    from mlops_pipelines_featurestore_gcp_spark.operators.skew import salted_topk

    survivors = salted_topk(
        out.withColumn("__draw", draw), host_col,
        [F.col("__draw").asc(), F.col(id_col).asc()], k=cap,
    ).select(F.col(id_col).alias("__sid"))
    return (
        out.join(survivors, out[id_col] == survivors["__sid"], "left")
        .withColumn("host_kept", F.col("__sid").isNotNull().cast("int"))
        .drop("__sid")
    )
