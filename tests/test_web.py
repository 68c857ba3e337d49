"""URL/domain curation operators (queries/web.py): normalization
collapses www./case/port variants, the blocklist's deliberately sloppy
substring rule over-matches as documented, and per-domain duplicate
shares are exact on a planted corpus."""

from __future__ import annotations

import pyspark.sql.functions as F

from databricks_end_to_end_streaming_spark.queries.web import (
    domain_duplicate_share,
    norm_domain,
    registered_domain,
    url_blocklist_filter,
    url_domain_accounting,
    with_url,
)

DOCS_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _write_docs(spark, workdir, rows):
    spark.createDataFrame(rows, DOCS_SCHEMA).write.mode("overwrite").parquet(
        f"{workdir}/web/documents.parquet"
    )
    return f"{workdir}/web"


def test_norm_domain_collapses_variants(spark):
    urls = spark.createDataFrame(
        [
            ("https://www.src3.example.com/docs/en/3",),
            ("https://SRC3.example.com:8443/docs/en/5",),
            ("https://src3.example.com/docs/en/1?ref=feed",),
        ],
        "url string",
    )
    got = {r.d for r in urls.select(norm_domain().alias("d")).collect()}
    assert got == {"src3.example.com"}
    reg = urls.select(registered_domain(norm_domain()).alias("r")).first().r
    assert reg == "example.com"


def test_url_derivation_is_deterministic(spark, workdir):
    rows = [(i, "alpha beta", "en", f"src{i % 4}", 10) for i in range(20)]
    sf = _write_docs(spark, workdir, rows)
    u1 = {r.doc_id: r.url for r in with_url(
        spark.read.parquet(f"{sf}/documents.parquet")).collect()}
    # spot-check the variant machinery
    assert u1[0] == "https://www.SRC0.example.com:8443/docs/en/0?ref=feed"
    assert u1[1] == "https://src1.example.org/docs/en/1"
    assert u1[15] == "https://www.SRC3.example.org/docs/en/15"


def test_domain_accounting_groups_by_normalized_host(spark, workdir):
    # doc_ids chosen so src0 appears with www (0), upper (10), port (14)
    rows = [(i, "a b c", "en", "src0", 5) for i in [0, 10, 14]] + [
        (i, "a b c d", "de", "src1", 7) for i in [1, 11]
    ]
    sf = _write_docs(spark, workdir, rows)
    got = {r.domain: r for r in url_domain_accounting(spark, sf).collect()}
    # src0 docs: ids 0(.com), 10(.com), 14(.com) -> one domain after norm
    assert got["src0.example.com"].n_docs == 3
    assert got["src0.example.com"].n_tokens == 9
    assert got["src0.example.com"].reg_domain == "example.com"
    # src1 docs: ids 1(.org), 11(.org)
    assert got["src1.example.org"].n_docs == 2
    assert got["src1.example.org"].n_langs == 1


def test_blocklist_sloppy_rule_overmatches(spark, workdir):
    # src1 and src12 both match the '%src1%' substring rule; src2 doesn't
    rows = [
        (1, "x", "en", "src1", 1),
        (3, "x", "en", "src12", 1),
        (5, "x", "en", "src2", 1),
    ]
    sf = _write_docs(spark, workdir, rows)
    got = {r.rule: r.n_docs for r in url_blocklist_filter(spark, sf).collect()}
    assert got["blocked_domain_src1"] == 2  # src1 AND src12
    # all three ids are odd -> .org TLD -> every doc hits the TLD rule
    assert got["blocked_tld_org"] == 3
    assert got["any_rule"] == 3 and got["kept"] == 0


def test_duplicate_share_planted(spark, workdir):
    rows = [
        (2, "same text", "en", "srcA", 9),
        (4, "same text", "en", "srcA", 9),
        (6, "unique one", "en", "srcA", 10),
        (8, "other text", "en", "srcB", 10),
        (22, "same text", "en", "srcB", 9),  # cross-domain dup counts too
    ]
    sf = _write_docs(spark, workdir, rows)
    got = {r.domain: r for r in domain_duplicate_share(spark, sf).collect()}
    a = got["srca.example.com"]
    assert (a.n_docs, a.n_dup_docs) == (3, 2) and abs(a.dup_share - 2 / 3) < 1e-15
    b = got["srcb.example.com"]
    assert (b.n_docs, b.n_dup_docs) == (2, 1)


def test_plans_stay_jvm_side(spark, workdir):
    rows = [(i, "a b", "en", f"src{i}", 3) for i in range(6)]
    sf = _write_docs(spark, workdir, rows)
    for q in (url_domain_accounting, url_blocklist_filter, domain_duplicate_share):
        plan = q(spark, sf)._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_html_extraction_exact(spark, workdir):
    from databricks_end_to_end_streaming_spark.queries.web import (
        html_text_extraction,
    )

    rows = [
        (3, "hello world", "en", "srcA", 11),   # %3==0 -> script injected
        (4, "plain words", "fr", "srcB", 11),   # %4==0 -> footer + &copy;
        (5, "x y z", "de", "srcC", 5),          # neither
    ]
    sf = _write_docs(spark, workdir, rows)
    got = {r.doc_id: r for r in html_text_extraction(spark, sf).collect()}
    # head (title+style) and the script block vanish wholesale; tags go;
    # &amp; decodes; whitespace collapses
    assert got[3].extracted == "en hello world & tail"
    assert got[3].had_script is True
    assert got[4].extracted == "fr plain words & tail © srcB"
    assert got[4].had_script is False
    assert got[5].extracted == "de x y z & tail"
    assert got[5].n_tokens == 6
    assert all(r.markup_chars > 0 for r in got.values())


def test_html_extraction_plan_map_only(spark, workdir):
    from databricks_end_to_end_streaming_spark.queries.web import (
        html_text_extraction,
    )

    rows = [(i, "a b", "en", f"src{i}", 3) for i in range(4)]
    sf = _write_docs(spark, workdir, rows)
    plan = (
        html_text_extraction(spark, sf)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the WET step must stay embarrassingly parallel: no shuffle, no
    # Python eval — one codegen span over the parquet scan
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_domain_quota_cap_planted(spark, workdir):
    """r12 PSL semantics: the quota is per REGISTERED domain, so
    srca.example.co.uk and srcb.example.co.uk SHARE one
    example.co.uk bucket (the subdomain-minting evasion the per-host
    cap allowed), while the last-two-labels heuristic would have
    bucketed them as bare co.uk. One reg_domain over quota (drops the
    SHORTEST docs), one under; exact token accounting; the PSL attach
    must stay a broadcast join."""
    from databricks_end_to_end_streaming_spark.queries.web import (
        DOMAIN_QUOTA,
        domain_quota_cap,
    )

    # ids = 11k (k=1..DOMAIN_QUOTA+3, none hitting the %17/%19 kawasaki
    # branches) land on .example.co.uk; alternating sources give TWO
    # distinct hosts under ONE registered domain. Doc i has i+1 tokens
    # -> the 3 dropped are the 3 shortest (1, 2, 3 tokens).
    over = [
        (
            11 * (i + 1),
            " ".join(["w"] * (i + 1)),
            "en",
            "srcA" if i % 2 else "srcB",
            1,
        )
        for i in range(DOMAIN_QUOTA + 3)
    ]
    assert all(i % 17 and i % 19 for i, *_ in over)
    # plain-.com pair: different hosts (srcc/srcd.example.com), same
    # registered domain example.com, under quota
    under = [(2, "a b", "en", "srcC", 1), (4, "c", "en", "srcD", 1)]
    sf = _write_docs(spark, workdir, over + under)
    out = {r.reg_domain: r for r in domain_quota_cap(spark, sf).collect()}
    assert "co.uk" not in out  # the heuristic's wrong bucket
    a = out["example.co.uk"]
    assert (a.n_docs, a.n_kept, a.n_dropped) == (
        DOMAIN_QUOTA + 3,
        DOMAIN_QUOTA,
        3,
    )
    assert a.tokens_dropped == 1 + 2 + 3
    assert a.tokens_kept == sum(range(4, DOMAIN_QUOTA + 4))
    b = out["example.com"]
    assert (b.n_kept, b.n_dropped, b.tokens_kept) == (2, 0, 3)
    plan = (
        domain_quota_cap(spark, sf)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the PSL rules dim AND the (domain -> reg_domain) attach both
    # broadcast — the quota must not shuffle the corpus by host
    assert plan.count("BroadcastHashJoin") >= 2


def test_curation_funnel_monotone_and_consistent(spark, workdir):
    """Funnel counts are monotone non-increasing and the blocklist/quota
    stages agree with the standalone operators on a planted corpus."""
    from databricks_end_to_end_streaming_spark.queries.web import (
        web_corpus_curation_funnel,
    )

    rows = [
        # doc_ids chosen all-even (one TLD per source) and not %4==0 for
        # srcC (no tracking), srcB is blocked by nothing but duplicated
        *[(2 + 4 * i, "dup dup dup", "en", "srcB", 1) for i in range(4)],
        (6, "unique text here", "en", "srcC", 1),
        (10, "another unique doc", "en", "srcC", 1),
        (4, "tracked doc", "en", "srcD", 1),  # %4==0 -> ?ref= blocked
    ]
    sf = _write_docs(spark, workdir, rows)
    out = {r.stage: r for r in web_corpus_curation_funnel(spark, sf).collect()}
    assert [out[s].stage_idx for s in (
        "raw", "after_blocklist", "after_domain_quota", "after_exact_dedup"
    )] == [0, 1, 2, 3]
    seq = [out[s].n_docs for s in (
        "raw", "after_blocklist", "after_domain_quota", "after_exact_dedup"
    )]
    assert seq[0] == 7 and all(a >= b for a, b in zip(seq, seq[1:]))
    assert out["after_blocklist"].n_docs == 6  # tracked doc dropped
    assert out["after_exact_dedup"].n_docs == 3  # 4 dups collapse to 1


def test_psl_beats_heuristic_on_multilabel_suffixes(spark):
    """The r8 PSL join: where the last-two-labels heuristic and the
    Public Suffix List disagree (foo.co.uk), the PSL answer is the
    registrable domain; wildcard (*.kawasaki.jp) and exception
    (!city.kawasaki.jp) rules follow the published algorithm."""
    from databricks_end_to_end_streaming_spark.operators.psl import (
        psl_registered_domains,
        psl_rules_df,
    )

    doms = spark.createDataFrame(
        [
            ("foo.co.uk",),
            ("www2.bar.com.au",),
            ("plain.example.com",),
            ("src.sub.kawasaki.jp",),   # *.kawasaki.jp: sub.* IS a suffix
            ("src.city.kawasaki.jp",),  # !city.kawasaki.jp: exception
            ("co.uk",),                 # a bare public suffix: no eTLD+1
        ],
        "domain string",
    )
    got = {
        r["domain"]: (r["public_suffix"], r["reg_domain_psl"])
        for r in psl_registered_domains(doms, psl_rules_df(spark)).collect()
    }
    assert got["foo.co.uk"] == ("co.uk", "foo.co.uk")
    assert got["www2.bar.com.au"] == ("com.au", "bar.com.au")
    assert got["plain.example.com"] == ("com", "example.com")
    assert got["src.sub.kawasaki.jp"] == (
        "sub.kawasaki.jp",
        "src.sub.kawasaki.jp",
    )
    assert got["src.city.kawasaki.jp"] == ("kawasaki.jp", "city.kawasaki.jp")
    assert got["co.uk"] == ("co.uk", None)
    # the heuristic is WRONG on exactly the multi-label rows
    heur = {
        r["domain"]: r["h"]
        for r in doms.select(
            "domain", registered_domain(F.col("domain")).alias("h")
        ).collect()
    }
    assert heur["foo.co.uk"] == "co.uk" != got["foo.co.uk"][1]
    assert heur["plain.example.com"] == got["plain.example.com"][1]


def test_full_psl_snapshot_loaded_and_idn_hosts_normalize(spark):
    """r9 (verdict ask #4): the FULL OS-packaged PSL snapshot (~9.5k
    rules, IDN rules punycoded) backs the rules dim by default, and
    U-label hosts normalize to the same registered domain as their
    xn-- spellings."""
    from databricks_end_to_end_streaming_spark.operators.psl import (
        load_psl_rules,
        psl_registered_domains,
        psl_rules_df,
        punycode_hosts,
        puny_host,
    )

    rules = load_psl_rules()
    assert len(rules) > 9000, len(rules)  # the full list, not the subset
    assert all(r.isascii() for r in rules)  # IDN rules punycoded
    assert "xn--p1ai" in rules  # .рф, present only via IDN normalization
    assert "!www.ck" in rules and "*.ck" in rules  # full-list exceptions

    # scalar normalization: U-label and A-label spellings converge
    assert puny_host("ПрИмЕр.рф.") == "xn--e1afmkfd.xn--p1ai"
    assert puny_host("xn--e1afmkfd.xn--p1ai") == "xn--e1afmkfd.xn--p1ai"
    assert puny_host("Plain.Example.COM") == "plain.example.com"

    doms = punycode_hosts(
        spark.createDataFrame(
            [
                ("пример.рф",),                  # U-label spelling
                ("xn--e1afmkfd.xn--p1ai",),      # A-label spelling
                ("shop.公司.cn",),               # IDN second-level suffix
                ("www.ck",),                     # full-list exception rule
                ("anything.foo.ck",),            # full-list wildcard rule
                ("deep.example.co.uk",),
            ],
            "domain string",
        )
    )
    got = {
        r["domain"]: (r["public_suffix"], r["reg_domain_psl"])
        for r in psl_registered_domains(doms, psl_rules_df(spark)).collect()
    }
    # both spellings of the same host derive the identical answer
    assert got["xn--e1afmkfd.xn--p1ai"] == (
        "xn--p1ai",
        "xn--e1afmkfd.xn--p1ai",
    )
    assert len(got) == 5  # the two spellings collapsed to one key
    assert got["shop.xn--55qx5d.cn"] == ("xn--55qx5d.cn", "shop.xn--55qx5d.cn")
    assert got["www.ck"] == ("ck", "www.ck")  # exception: ck is the suffix
    assert got["anything.foo.ck"] == ("foo.ck", "anything.foo.ck")
    assert got["deep.example.co.uk"] == ("co.uk", "example.co.uk")


def test_idn_query_converges_spelling_pairs(spark):
    """url_registered_domain_idn (the wired punycode_hosts production
    path): each planted U-label/A-label pair collapses to one normalized
    domain with both spellings counted, and derives the IDN rule's
    public suffix."""
    from databricks_end_to_end_streaming_spark.queries.web import (
        url_registered_domain_idn,
    )

    rows = {
        r["domain"]: r
        for r in url_registered_domain_idn(
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    assert rows["xn--e1afmkfd.xn--p1ai"]["n_spellings"] == 2
    assert rows["xn--e1afmkfd.xn--p1ai"]["public_suffix"] == "xn--p1ai"
    assert rows["shop.xn--55qx5d.cn"]["n_spellings"] == 2
    assert (
        rows["shop.xn--55qx5d.cn"]["reg_domain_psl"] == "shop.xn--55qx5d.cn"
    )
    assert rows["xn--bcher-kva.example.co.uk"]["n_spellings"] == 2
    assert (
        rows["xn--bcher-kva.example.co.uk"]["reg_domain_psl"]
        == "example.co.uk"
    )
    # no U-label spelling survives normalization
    assert all(d.isascii() for d in rows)


def test_unmatched_domain_keeps_its_accounting_row(spark):
    """A URL the normalizer can't parse (non-https) yields domain '' —
    which matches no PSL candidate; the rollup must KEEP that group
    (left join) rather than silently dropping its counts (r8 review)."""
    from databricks_end_to_end_streaming_spark.queries.web import (
        domain_accounting_rollup,
        domain_lang_partials,
    )

    d = spark.createDataFrame(
        [
            (1, "a b c", "en", "src0", 5, "http://plain.example.com/x"),
            (2, "d e", "en", "src0", 3, "https://ok.example.com/y"),
        ],
        DOCS_SCHEMA + ", url string",
    ).withColumn("domain", norm_domain())
    got = {r.domain: r for r in domain_accounting_rollup(
        domain_lang_partials(d)
    ).collect()}
    assert got[""].n_docs == 1 and got[""].n_tokens == 3
    assert got[""].reg_domain == ""  # accounts under itself
    assert got["ok.example.com"].reg_domain == "example.com"


def test_url_canonicalization_edge_cases(spark):
    """canonical_url_col: RFC 3986 normalization on hand-picked forms,
    including shapes the synthetic corpus never produces (root path,
    no query, every-param-stripped, non-default port kept)."""
    from databricks_end_to_end_streaming_spark.queries.web import (
        canonical_url_col,
    )

    cases = [
        # (raw, canonical)
        ("https://WWW.Site.Example:443/a/b/?utm_source=x&id=2#frag",
         "https://site.example/a/b?id=2"),
        ("https://site.example", "https://site.example/"),
        ("https://site.example/?ref=feed", "https://site.example/"),
        ("https://site.example:8443/a", "https://site.example:8443/a"),
        ("https://site.example/a?z=1&b=2&a=3",
         "https://site.example/a?a=3&b=2&z=1"),
        ("https://site.example/a//?x=1#s", "https://site.example/a?x=1"),
        ("https://www.site.example/#top", "https://site.example/"),
    ]
    df = spark.createDataFrame([(r,) for r, _ in cases], "url string")
    got = [
        r.c for r in df.select(canonical_url_col().alias("c")).collect()
    ]
    assert got == [want for _, want in cases]


def test_url_canonical_dedup_collapses_variants(spark, workdir):
    """Same page behind different mess classes collapses to one
    canonical row whose copy count matches the planted fan-in."""
    import pyspark.sql.functions as F
    from databricks_end_to_end_streaming_spark.queries.web import (
        canonical_url_col,
        with_url_messy,
    )

    docs = spark.createDataFrame(
        [(i, "t", "en", "s", 1) for i in range(240)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = (
        with_url_messy(docs)
        .select("doc_id", "url", canonical_url_col().alias("c"))
        .groupBy("c")
        .agg(F.count("*").alias("n"), F.countDistinct("url").alias("v"))
        .collect()
    )
    # 240 docs over 120 pages: every page has exactly 2 docs
    assert sum(r.n for r in out) == 240
    assert all(r.n >= 1 for r in out)
    # at least one page collapses >1 distinct surface form
    assert any(r.v > 1 and r.n == r.v for r in out)
    # canonical forms carry no mess markers
    for r in out:
        c = r.c
        assert "#" not in c and "utm_" not in c and "ref=" not in c
        assert ":443" not in c and "www." not in c
        assert not c.endswith("/") or c.endswith(".example/")


def test_url_dedup_stage_drops_cross_batch_variants(spark, workdir):
    """Incremental canonical-URL dedup: a later surface variant of an
    already-seen page is dropped across the batch gap; a replay is
    idempotent; genuinely new pages pass."""
    from databricks_end_to_end_streaming_spark.streaming import ParquetTable
    from databricks_end_to_end_streaming_spark.streaming.bloom_stage import (
        url_dedup_batch,
    )

    rows = [
        # page /p/1: three variants across two batches
        (0, "https://www.site.example:443/p/1?utm_source=a&id=1"),
        (1, "https://SITE.example/p/1/?id=1"),
        (2, "https://site.example/p/1?id=1#frag"),
        # page /p/2: two variants inside batch 1
        (3, "https://site.example/p/2"),
        (4, "https://site.example/p/2/?ref=x"),
        # page /p/3: batch-2 only (definitely new)
        (5, "https://site.example/p/3"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, url string")
    out = ParquetTable(f"{workdir}/frontier")
    fp = ParquetTable(f"{workdir}/fp")
    bm = ParquetTable(f"{workdir}/bitmap")
    c1 = url_dedup_batch(docs.where("doc_id < 2"), out, fp, bm, 0)
    c2 = url_dedup_batch(docs.where("doc_id >= 2"), out, fp, bm, 1)
    kept = sorted(r.doc_id for r in out.read(spark).collect())
    # batch 0: doc 0 wins page 1 intra-batch (doc 1 dropped); batch 1:
    # doc 2 collides with history, doc 3 wins page 2 intra-batch over
    # doc 4, doc 5 is definitely new
    assert kept == [0, 3, 5]
    assert c1["emitted"] == 1 and c2["emitted"] == 2
    # replay of batch 1 changes nothing
    url_dedup_batch(docs.where("doc_id >= 2"), out, fp, bm, 1)
    assert sorted(r.doc_id for r in out.read(spark).collect()) == [0, 3, 5]


def test_psl_provenance_names_one_source_of_truth(spark):
    """r13 (verdict ask #6): psl_snapshot_provenance records which rule
    set is in effect — path + sha256 + rule-class counts for file
    sources — and agrees with resolve_psl_path and load_psl_rules, so
    "which PSL" is never ambiguous across entry points. Class counts
    must show the parse covered wildcard/exception (and IDN for the
    full list), the tools/psl_check.py contract."""
    from databricks_end_to_end_streaming_spark.operators.psl import (
        load_psl_rules,
        psl_snapshot_provenance,
        resolve_psl_path,
    )

    prov = psl_snapshot_provenance()
    rules = load_psl_rules()
    assert prov["rules_total"] == len(rules)
    assert prov["wildcard"] == sum(1 for r in rules if "*" in r and r != "*")
    assert prov["exception"] == sum(1 for r in rules if r.startswith("!"))
    assert prov["wildcard"] > 0 and prov["exception"] > 0
    path = resolve_psl_path()
    if path is None:
        assert prov["source"] == "vendored-subset" and prov["path"] is None
    else:
        assert prov["source"] == "file" and prov["path"] == path
        assert len(prov["sha256"]) == 64 and prov["bytes"] > 0
        assert prov["idn_punycoded"] > 0  # full list: IDN rules parsed
        # the hash IS the version: a re-vendored snapshot must change it
        import hashlib

        assert prov["sha256"] == hashlib.sha256(
            open(path, "rb").read()
        ).hexdigest()
