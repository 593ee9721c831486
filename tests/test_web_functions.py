"""URL canonicalization functions (functions/web.py): exact expected
outputs for the tricky-variant table, recrawl-variant collapse, and
the JVM-side plan contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_platform_copilot_spark.functions.web import (
    registered_domain,
    url_host,
    url_normalize,
)

CASES = [
    # (raw, normalized, host, registered_domain)
    ("HTTP://WWW.Example.COM:80/a/b/?utm_source=x&b=2&a=1#frag",
     "http://example.com/a/b?a=1&b=2", "example.com", "example.com"),
    ("https://example.com:443/a/",
     "https://example.com/a", "example.com", "example.com"),
    ("https://example.com",
     "https://example.com/", "example.com", "example.com"),
    ("https://example.com:8443/a",
     "https://example.com:8443/a", "example.com", "example.com"),
    ("https://sub.shop.example.co.uk/p?gclid=123",
     "https://sub.shop.example.co.uk/p",
     "sub.shop.example.co.uk", "example.co.uk"),
    ("http://example.com/a//",
     "http://example.com/a", "example.com", "example.com"),
    ("https://user:pw@example.com/x",
     "https://example.com/x", "example.com", "example.com"),
    ("https://example.com/a?fbclid=1&utm_campaign=2",
     "https://example.com/a", "example.com", "example.com"),
    # generic `ref` selects content on code hosts — kept; the
    # referrer-attribution spelling ref_src is tracking — dropped
    ("https://git.example.com/repo/blob/f.py?ref=release&ref_src=tw",
     "https://git.example.com/repo/blob/f.py?ref=release",
     "git.example.com", "example.com"),
    ("not a url", None, None, None),
    (None, None, None, None),
]


def _run(spark, col_fn):
    df = spark.createDataFrame([(c[0],) for c in CASES], "url string")
    return [r["out"] for r in
            df.select(col_fn("url").alias("out")).collect()]


class TestUrlFunctions:
    def test_normalize_expected_table(self, spark):
        assert _run(spark, url_normalize) == [c[1] for c in CASES]

    def test_host_and_registered_domain(self, spark):
        assert _run(spark, url_host) == [c[2] for c in CASES]
        assert _run(spark, registered_domain) == [c[3] for c in CASES]

    def test_recrawl_variants_collapse_to_one_key(self, spark):
        variants = [
            "https://www.shop.example.com/item/42?utm_source=mail",
            "HTTPS://shop.example.com:443/item/42",
            "https://shop.example.com/item/42/",
            "https://shop.example.com/item/42#reviews",
        ]
        df = spark.createDataFrame([(v,) for v in variants], "url string")
        keys = (df.select(url_normalize("url").alias("k"))
                .distinct().collect())
        assert [r["k"] for r in keys] == [
            "https://shop.example.com/item/42"]

    def test_plan_stays_jvm_side(self, spark):
        df = spark.createDataFrame([("https://a.example.org/x?b=1",)],
                                   "url string")
        plan = (df.select(url_normalize("url"), registered_domain("url"))
                ._jdf.queryExecution().executedPlan().toString())
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan


class TestPublicSuffixList:
    """registered_domain is PSL-backed (packaged snapshot): every rule
    form of the official algorithm — plain multi-label registries,
    wildcard rules, exception rules, the private section, the implicit
    * fallback, and hosts that ARE public suffixes (-> NULL)."""

    PSL_CASES = [
        # (url, expected registrable domain)
        ("https://example.com/x", "example.com"),
        ("https://www.sub.example.co.uk/", "example.co.uk"),
        ("https://a.b.example.com.br/", "example.com.br"),
        ("https://shop.example.gov.uk/", "example.gov.uk"),
        # wildcard *.bd: every 2nd-level label is a public suffix
        ("https://foo.bar.bd/", "foo.bar.bd"),
        ("https://deep.foo.bar.bd/", "foo.bar.bd"),
        # wildcard + exception family (*.kawasaki.jp / !city.kawasaki.jp)
        ("https://city.kawasaki.jp/", "city.kawasaki.jp"),
        ("https://ward.city.kawasaki.jp/", "city.kawasaki.jp"),
        ("https://other.kawasaki.jp/", None),  # is a public suffix
        ("https://x.other.kawasaki.jp/", "x.other.kawasaki.jp"),
        # exception under *.ck
        ("https://www.ck/", "www.ck"),
        ("https://anything.www.ck/", "www.ck"),
        # private-domains section: hosting-platform boundaries
        ("https://user.github.io/repo", "user.github.io"),
        ("https://app-1.herokuapp.com/", "app-1.herokuapp.com"),
        # a public suffix itself has no registrable domain
        ("https://co.uk/", None),
        ("https://com/", None),
        # implicit * rule: unknown TLD -> last two labels
        ("https://a.b.unknowntld/", "b.unknowntld"),
        ("https://localhost/", None),
        ("not a url", None),
        (None, None),
    ]

    def test_psl_expected_table(self, spark):
        df = spark.createDataFrame(
            [(c[0],) for c in self.PSL_CASES], "url string")
        got = [r["d"] for r in
               df.select(registered_domain("url").alias("d")).collect()]
        assert got == [c[1] for c in self.PSL_CASES]

    def test_psl_plan_stays_jvm_side(self, spark):
        df = spark.createDataFrame([("https://a.example.co.uk/x",)],
                                   "url string")
        plan = (df.select(registered_domain("url"))
                ._jdf.queryExecution().executedPlan().toString())
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
        assert "Exchange" not in plan  # no join/broadcast: pure projection

    def test_heuristic_fallback_still_available(self, spark):
        df = spark.createDataFrame(
            [("https://a.example.co.uk/x",), ("https://b.example.com/",)],
            "url string")
        got = [r["d"] for r in df.select(
            registered_domain("url", use_psl=False).alias("d")).collect()]
        assert got == ["example.co.uk", "example.com"]

    def test_parser_rule_forms(self, tmp_path):
        from data_platform_copilot_spark.functions.web import load_psl

        f = tmp_path / "psl.dat"
        f.write_text("// comment\n\ncom\nco.uk\n*.bd\n!city.kawasaki.jp\n"
                     "GitHub.IO  // trailing junk after whitespace\n")
        exact, wild, exc = load_psl(f)
        assert exact == {"com", "co.uk", "github.io"}
        assert wild == {"bd"}
        assert exc == {"city.kawasaki.jp"}


class TestUrlNormalizeProperties:
    def test_idempotent_over_generated_urls(self, spark):
        """normalize(normalize(u)) == normalize(u): canonical URLs are
        fixed points (generated grid of scheme/host/port/path/query/
        fragment variants, incl. tracking params and case noise)."""
        import itertools

        schemes = ["http", "HTTPS"]
        hosts = ["Example.com", "www.sub.example.CO.UK", "a.b.io"]
        ports = ["", ":80", ":443", ":8080"]
        paths = ["", "/", "/A/b", "/x/", "/x//"]
        queries = ["", "?b=2&a=1", "?utm_source=t&a=1", "?gclid=9"]
        frags = ["", "#frag"]
        urls = ["".join(p) for p in itertools.product(
            schemes, ["://"], hosts, ports, paths, queries, frags)]
        df = spark.createDataFrame([(u,) for u in urls], "url string")
        once = df.select(url_normalize("url").alias("n1"))
        twice = once.select(
            "n1", url_normalize("n1").alias("n2")).collect()
        bad = [(r["n1"], r["n2"]) for r in twice if r["n1"] != r["n2"]]
        assert not bad, bad[:5]
        assert all(r["n1"] is not None for r in twice)
