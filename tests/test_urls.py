"""URL canonicalization + host dedup/downsample (operators/urls.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mlops_pipelines_featurestore_gcp_spark.operators import urls
from mlops_pipelines_featurestore_gcp_spark.operators import urls as urls_mod


CASES = [
    # (messy, canonical) — each exercises one normalization
    ("http://example.com/a", "example.com/a"),
    ("https://example.com/a", "example.com/a"),  # scheme dropped
    ("https://WWW.Example.COM/a", "example.com/a"),  # case + www
    ("http://example.com:80/a", "example.com/a"),  # default port
    ("https://example.com:443/a", "example.com/a"),
    ("https://example.com//a///b/", "example.com/a/b"),  # slash noise
    ("https://example.com/a#frag", "example.com/a"),  # fragment
    ("https://example.com/a?utm_source=x&b=2&a=1", "example.com/a?a=1&b=2"),
    ("https://example.com/a?gclid=1&fbclid=2&ref=x", "example.com/a"),
    ("https://example.com/a?page=3&utm_campaign=c", "example.com/a?page=3"),
    ("https://example.com/", "example.com"),  # bare root
    ("https://example.com", "example.com"),  # no path at all
    ("https://example.com?x=1", "example.com?x=1"),  # query, no path
    # RFC 3986 §6.2.2.2 — unreserved percent-encodings decode (r12)
    ("https://example.com/%7Euser/a", "example.com/~user/a"),
    ("https://example.com/%7euser", "example.com/~user"),  # lower hex
    ("https://example.com/d%6Fcs/%31", "example.com/docs/1"),
    ("https://example.com/a?x=%41%2Dz", "example.com/a?x=A-z"),
    # reserved encodings are STRUCTURAL and must survive
    ("https://example.com/a%2Fb", "example.com/a%2Fb"),
    ("https://example.com/100%25", "example.com/100%25"),
]


def test_canonical_url_cases(spark):
    df = spark.createDataFrame([(i, u) for i, (u, _) in enumerate(CASES)], "i long, url string")
    got = {r.i: r.c for r in df.select("i", urls.canonical_url(F.col("url")).alias("c")).collect()}
    for i, (messy, want) in enumerate(CASES):
        assert got[i] == want, (messy, got[i], want)


def test_host_of(spark):
    rows = [
        ("https://WWW.Example.COM:443/a?b#c", "example.com"),
        ("http://sub.host.org/x", "sub.host.org"),
        ("ftp://files.net:80", "files.net"),
    ]
    df = spark.createDataFrame([(i, u) for i, (u, _) in enumerate(rows)], "i long, url string")
    got = {r.i: r.h for r in df.select("i", urls.host_of(F.col("url")).alias("h")).collect()}
    for i, (_, want) in enumerate(rows):
        assert got[i] == want


def test_url_dedup_keep_first(spark):
    df = spark.createDataFrame(
        [
            (1, "http://a.com/x?utm_source=1"),
            (2, "https://www.A.com/x/"),
            (3, "https://a.com/y"),
        ],
        "doc_id long, url string",
    )
    out = {r.doc_id: r for r in urls.url_dedup_keep_first(df).collect()}
    assert out[1].kept == 1 and out[1].dup_of is None
    assert out[2].kept == 0 and out[2].dup_of == 1  # same canonical as 1
    assert out[3].kept == 1 and out[3].dup_of is None
    assert out[1].canonical_url == out[2].canonical_url == "a.com/x"


def test_url_dedup_null_urls_kept_not_dropped(spark):
    # ADVICE r11 (medium): NULL-url rows used to vanish through the
    # keeper equi-join. Contract: one row per input row; NULL url ⇒
    # kept=1, dup_of NULL, never grouped with other NULLs — on BOTH
    # keeper paths.
    df = spark.createDataFrame(
        [(1, "http://a.com/x"), (2, None), (3, None), (4, "https://www.A.com/x/")],
        "doc_id long, url string",
    )
    for skew_safe in (True, False):
        out = {r.doc_id: r for r in
               urls.url_dedup_keep_first(df, skew_safe=skew_safe).collect()}
        assert set(out) == {1, 2, 3, 4}, f"row loss (skew_safe={skew_safe})"
        for nid in (2, 3):
            assert out[nid].kept == 1 and out[nid].dup_of is None
            assert out[nid].canonical_url is None
        assert out[4].kept == 0 and out[4].dup_of == 1


def test_url_dedup_skew_safe_paths_bit_equal(spark):
    # the window fast path (skew_safe=False) must pick the identical
    # keeper set as the default aggregate+join plan
    rows = [(i, f"https://A.com/x?utm_source={i}") for i in range(200)]
    rows += [(1000 + i, f"https://b.org/p{i}") for i in range(9)]
    rows += [(2000, None)]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    a = sorted(map(tuple, urls.url_dedup_keep_first(df).collect()))
    b = sorted(map(tuple, urls.url_dedup_keep_first(df, skew_safe=False).collect()))
    assert a == b


def test_host_downsample_null_urls_never_capped(spark):
    df = spark.createDataFrame(
        [(i, f"https://one.com/p{i}") for i in range(10)] + [(100, None), (101, None)],
        "doc_id long, url string",
    )
    for salted in (False, True):
        out = {r.doc_id: r for r in
               urls.host_downsample(df, cap=3, salted=salted).collect()}
        assert len(out) == 12
        assert out[100].host_kept == 1 and out[101].host_kept == 1
        assert out[100].host is None
        assert sum(out[i].host_kept for i in range(10)) == 3


def test_host_downsample_auto_salting(spark):
    # the auto probe must (a) estimate within sampling error, (b) flip
    # to the salted JOIN plan past the threshold, (c) keep the window
    # plan below it — with bit-equal output either way.
    rows = [(i, "https://big.com/p%d" % i) for i in range(3000)]
    rows += [(10_000 + i, "https://small.org/p%d" % i) for i in range(7)]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    with_host = df.withColumn("host", urls.host_of(F.col("url")))
    exact = urls.estimate_max_host_rows(with_host, mod=1)
    assert exact == 3000  # mod=1 keeps every row: exact count
    est = urls.estimate_max_host_rows(with_host)
    assert 1500 <= est <= 6000  # 1-in-128 probe of a 3000-row host
    auto_salted = urls.host_downsample(df, cap=50, auto_salt_threshold=100)
    auto_window = urls.host_downsample(df, cap=50, auto_salt_threshold=10_000)
    plan_s = auto_salted._jdf.queryExecution().executedPlan().toString()
    plan_w = auto_window._jdf.queryExecution().executedPlan().toString()
    assert "Join" in plan_s, "auto probe past threshold must pick the salted join plan"
    assert "Join" not in plan_w, "auto probe under threshold must keep the window plan"
    a = sorted(map(tuple, auto_salted.collect()))
    b = sorted(map(tuple, auto_window.collect()))
    assert a == b


def test_host_downsample_cap_and_determinism(spark):
    df = spark.createDataFrame(
        [(i, f"https://h{i % 2}.com/p{i}") for i in range(40)], "doc_id long, url string"
    )
    a = urls.host_downsample(df, cap=5).collect()
    b = urls.host_downsample(df, cap=5).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # deterministic
    kept_per_host = {}
    for r in a:
        kept_per_host.setdefault(r.host, 0)
        kept_per_host[r.host] += r.host_kept
    assert kept_per_host == {"h0.com": 5, "h1.com": 5}
    assert len(a) == 40  # one row per input, never filtered


def test_plan_is_jvm_side(spark):
    # The canonicalizer must stay whole-stage-codegen eligible: no
    # BatchEvalPython / ArrowEvalPython nodes in the physical plan.
    df = spark.createDataFrame([(1, "https://a.com/x")], "doc_id long, url string")
    plan = (
        urls.host_downsample(urls.url_dedup_keep_first(df))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "EvalPython" not in plan, plan


def test_host_downsample_salted_bit_equal(spark):
    # One mega-host (3000 rows) + a small host: the salted two-phase path
    # must pick the IDENTICAL keeper set as the single-window path (the
    # salted_topk exactness argument on a total order).
    rows = [(i, "https://big.com/p%d" % i) for i in range(3000)]
    rows += [(10_000 + i, "https://small.org/p%d" % i) for i in range(7)]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    plain = {r.doc_id: (r.host, r.host_kept) for r in urls.host_downsample(df, cap=50).collect()}
    salted = {r.doc_id: (r.host, r.host_kept) for r in
              urls.host_downsample(df, cap=50, salted=True).collect()}
    assert plain == salted
    assert sum(k for _, k in plain.values()) == 50 + 7


def test_canonical_url_idempotent_under_recanonicalization(spark):
    # Canonicalization is a fixpoint: re-wrapping a canonical form in a
    # scheme and canonicalizing again must return the identical string
    # (hypothesis-style sweep over the messy-variant cross product).
    import itertools

    hosts = ["Example.COM", "www.sub.host.org", "a-b.net:443"]
    paths = ["/x//y/", "/x/y", "", "/", "/%7Eu/%31", "/a%2Fb"]
    qs = ["", "?utm_source=s&b=2&a=1", "?gclid=1", "?z=9&a=1", "?k=%41%2d"]
    frags = ["", "#sec"]
    messy = [
        f"https://{h}{p}{q}{f}"
        for h, p, q, f in itertools.product(hosts, paths, qs, frags)
    ]
    df = spark.createDataFrame([(i, u) for i, u in enumerate(messy)], "i long, url string")
    once = {r.i: r.c for r in df.select("i", urls.canonical_url(F.col("url")).alias("c")).collect()}
    redf = spark.createDataFrame(
        [(i, "http://" + c) for i, c in once.items()], "i long, url string"
    )
    twice = {r.i: r.c for r in redf.select("i", urls.canonical_url(F.col("url")).alias("c")).collect()}
    assert once == twice


def test_canonical_url_idempotent_seeded_fuzz(spark):
    # 2000 seeded pseudo-random messy URLs (schemes, casing, ports,
    # slash runs, %-encodings incl. malformed-adjacent ones, tracking
    # params, fragments, unicode-ish letters) in ONE Spark pass:
    # canonical(canonical(u)) == canonical(u) for every well-formed
    # input — the fixpoint contract the decode chain must not break.
    import random

    rng = random.Random(1234)
    schemes = ["http://", "https://", "ftp://", ""]
    hosts = ["Example.COM", "www.Sub.Host.org", "a-b.net:443", "x.io:80", "X%41.com"]
    segs = ["a", "b9", "%7Eu", "d%6Fcs", "%2Fx", "100%25", "A%2dB", "~z", "%7e"]
    params = ["a=1", "b=%41", "utm_source=s", "gclid=9", "z=%7E", "k=v%2Fw", ""]
    frags = ["", "#f", "#%7E"]
    urls = []
    for i in range(2000):
        path = "".join(
            ("/" * rng.randint(1, 3)) + rng.choice(segs)
            for _ in range(rng.randint(0, 4))
        ) + ("/" if rng.random() < 0.3 else "")
        qs = "&".join(rng.choice(params) for _ in range(rng.randint(0, 4)))
        u = (rng.choice(schemes) + rng.choice(hosts) + path
             + ("?" + qs if qs else "") + rng.choice(frags))
        urls.append((i, u))
    df = spark.createDataFrame(urls, "i long, url string")
    once = df.select("i", urls_mod.canonical_url(F.col("url")).alias("c"))
    both = once.select(
        "i", "c",
        urls_mod.canonical_url(F.concat(F.lit("http://"), F.col("c"))).alias("c2"),
    ).collect()
    bad = [(r.i, r.c, r.c2) for r in both if r.c != r.c2]
    assert not bad, f"{len(bad)} non-fixpoint URLs, first: {bad[:3]}"
