"""Crawl-operations layer (datapipe/crawlops.py): invariants the oracle
hash-match can't see — HLL register math vs an independent pure-Python
reference, Hamilton apportionment exactness, frontier politeness caps and
plan shape, host-graph edge conservation."""

import hashlib

import pytest

from pdftotext_plus_plus_spark.datapipe import crawlops

SF_DIR = "/root/testdata/sf0.001"


def _py_regs(urls):
    """Independent register construction (the single reference copy of
    the hash/bucket/rho math — every HLL test derives from it)."""
    regs = {}
    for u in urls:
        h = int(hashlib.md5(u.encode()).hexdigest()[:15], 16)
        b, w = h % crawlops.HLL_BUCKETS, h // crawlops.HLL_BUCKETS
        rho = crawlops.HLL_RHO_CAP if w == 0 \
            else crawlops.HLL_RHO_CAP - w.bit_length()
        regs[b] = max(regs.get(b, 0), rho)
    return regs


def _py_hll(urls):
    """Independent HLL reference: registers + raw estimate."""
    regs = _py_regs(urls)
    s = sum(1 << (crawlops.HLL_RHO_CAP - r) for r in regs.values())
    s += (crawlops.HLL_BUCKETS - len(regs)) << crawlops.HLL_RHO_CAP
    est = float(crawlops._HLL_EST_NUM) / float(s)
    return crawlops.HLL_BUCKETS - len(regs), s, est


def test_hll_registers_match_python_reference(spark):
    rows = {r["domain"]: r for r in
            crawlops.hll_url_cardinality(spark, SF_DIR).collect()}
    frame = crawlops._hll_frame(spark, SF_DIR) \
        .select("domain", "canon_url").collect()
    by_dom = {}
    for r in frame:
        by_dom.setdefault(r["domain"], set()).add(r["canon_url"])
    assert set(rows) == set(by_dom) | {"*merged*"}
    all_urls = set().union(*by_dom.values())
    by_dom["*merged*"] = all_urls
    for dom, urls in by_dom.items():
        zero, s, est = _py_hll(sorted(urls))
        row = rows[dom]
        assert row["n_urls_exact"] == len(urls), dom
        assert row["hll_zero_buckets"] == zero, dom
        assert row["hll_register_sum"] == s, dom
        # the estimate is ONE IEEE division of identical operands —
        # bit-identical to the Python reference, no tolerance needed
        assert row["hll_estimate"] == est, dom


def test_hll_merged_estimate_reasonable(spark):
    """The merged (full-corpus) row sits near the raw-estimator regime
    boundary at sf0.001 (155 distinct vs 2.5m = 160) — its error should
    sit within a few sigma of HLL's 1.04/sqrt(64) = 13% relative error
    (measured: 6%)."""
    rows = {r["domain"]: r for r in
            crawlops.hll_url_cardinality(spark, SF_DIR).collect()}
    m = rows["*merged*"]
    assert m["n_urls_exact"] > 2 * crawlops.HLL_BUCKETS
    rel = abs(m["hll_estimate"] - m["n_urls_exact"]) / m["n_urls_exact"]
    assert rel < 0.40, (m["hll_estimate"], m["n_urls_exact"])


def test_budget_allocation_exact(spark):
    rows = crawlops.crawl_budget_allocation(spark, SF_DIR).collect()
    # Hamilton's method: allocations sum to the budget EXACTLY
    assert sum(r["alloc"] for r in rows) == crawlops.CRAWL_BUDGET
    total = sum(r["n_docs"] for r in rows)
    for r in rows:
        ideal = crawlops.CRAWL_BUDGET * r["n_docs"] / total
        # quota property: every allocation is floor(ideal) or ceil(ideal)
        assert r["base_alloc"] == int(ideal // 1)
        assert r["alloc"] in (r["base_alloc"], r["base_alloc"] + 1)
        assert r["got_extra"] == r["alloc"] - r["base_alloc"]


def test_frontier_politeness_cap_and_plan(spark):
    df = crawlops.url_frontier_priority(spark, SF_DIR)
    rows = df.collect()
    per_dom = {}
    for r in rows:
        per_dom.setdefault(r["domain"], []).append(r)
    for dom, rs in per_dom.items():
        assert len(rs) <= crawlops.FRONTIER_SLOTS
        # slots are 1..k dense and ordered by (priority desc, doc_id asc)
        rs.sort(key=lambda r: r["slot"])
        assert [r["slot"] for r in rs] == list(range(1, len(rs) + 1))
        keys = [(-r["priority"], r["doc_id"]) for r in rs]
        assert keys == sorted(keys)
    # the row_number + filter pair must plan as a partial top-K pushed
    # below the exchange (WindowGroupLimit), not a full window sort
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_host_graph_edge_conservation(spark):
    from pdftotext_plus_plus_spark.datapipe.webtext import (_documents,
                                                            _edges)
    n_edges = _edges(_documents(spark, SF_DIR)).count()
    rows = crawlops.host_graph_stats(spark, SF_DIR).collect()
    # every edge leaves one host and lands on one host
    assert sum(r["out_edges"] for r in rows) == n_edges
    assert sum(r["in_edges"] for r in rows) == n_edges
    # intra edges are counted consistently on both sides
    assert all(r["intra_edges"] <= min(r["out_edges"], r["in_edges"])
               for r in rows)
    assert all(r["out_hosts"] >= 1 or r["out_edges"] == 0 for r in rows)


def test_frontier_dedups_canonical_urls(spark):
    """A frontier schedules canonical PAGES: the raw corpus maps many
    doc_ids to one canon_url by construction, and exactly one
    representative (min doc_id — url_normalize_dedup's keep rule) may
    hold a slot."""
    rows = crawlops.url_frontier_priority(spark, SF_DIR).collect()
    canons = [r["canon_url"] for r in rows]
    assert len(canons) == len(set(canons))
    from pdftotext_plus_plus_spark.datapipe.webtext import (_canon_urls,
                                                            _documents)
    urls = _canon_urls(_documents(spark, SF_DIR)).collect()
    keep = {}
    for r in urls:
        keep[r["canon_url"]] = min(keep.get(r["canon_url"], r["doc_id"]),
                                   r["doc_id"])
    for r in rows:
        assert r["doc_id"] == keep[r["canon_url"]]


def test_hll_registers_merge_across_snapshots(spark):
    """The SCALE.md claim 'yesterday's snapshot registers max-merge with
    today's': registers built over two disjoint URL subsets, merged by
    elementwise max, must equal registers built over the union — and
    therefore so must the register sum and the estimate."""
    frame = crawlops._hll_frame(spark, SF_DIR) \
        .select("canon_url").distinct().collect()
    urls = sorted(r["canon_url"] for r in frame)
    a, b = urls[::2], urls[1::2]
    ra, rb, run = _py_regs(a), _py_regs(b), _py_regs(urls)
    merged = {k: max(ra.get(k, 0), rb.get(k, 0)) for k in set(ra) | set(rb)}
    assert merged == run


def test_trust_propagation_seed_and_isolation_invariants(spark):
    from pdftotext_plus_plus_spark.datapipe.webtext import (_documents,
                                                            _edges)
    rows = {r["doc_id"]: r for r in
            crawlops.trust_propagation(spark, SF_DIR).collect()}
    indeg = {r["dst"]: r["in_deg"] for r in
             _edges(_documents(spark, SF_DIR))
             .groupBy("dst").count()
             .withColumnRenamed("count", "in_deg").collect()}
    assert all(r["trust_ppm"] >= 0 for r in rows.values())
    for d, r in rows.items():
        assert r["is_seed"] == (1 if d % crawlops.TRUST_SEED_MOD == 0 else 0)
        if r["is_seed"]:
            # the seed teleport term lands every iteration
            assert r["trust_ppm"] >= 150_000
        elif indeg.get(d, 0) == 0:
            # nothing links here and it isn't a seed: zero trust
            assert r["trust_ppm"] == 0
    # trust reaches beyond the seed set (propagation actually happens)
    assert any(r["trust_ppm"] > 0 and not r["is_seed"]
               for r in rows.values())


def test_url_classify_gates_and_features(spark):
    """Fetch-gating invariants derived ONLY from the output URL string
    (the operator must not lean on construction residues): extension
    parsing, media/archive skip, session-id and param-blowup deferral,
    feed detection, and depth counting."""
    rows = crawlops.url_classify(spark, SF_DIR).collect()
    assert len(rows) == 500
    for r in rows:
        path_q = r["url"].split(".example.com", 1)[1]
        path = path_q.split("?", 1)[0]
        query = path_q.split("?", 1)[1] if "?" in path_q else ""
        leaf = path.rsplit("/", 1)[1]
        # features recomputed independently from the string
        assert r["ext"] == (leaf.rsplit(".", 1)[1].lower()
                            if "." in leaf else "")
        assert r["path_depth"] == path.count("/")
        assert r["n_params"] == (len(query.split("&")) if query else 0)
        assert r["has_session"] == int("sessionid=" in query)
        # gating
        if r["ext"] in crawlops._MEDIA_EXTS:
            assert r["doc_type"] == "media" and r["action"] == "skip"
        elif r["ext"] in crawlops._ARCHIVE_EXTS:
            assert r["doc_type"] == "archive" and r["action"] == "skip"
        elif r["has_session"] or r["n_params"] >= crawlops.URL_TRAP_MAX_PARAMS:
            assert r["action"] == "defer"
        else:
            assert r["action"] == "fetch"
        if leaf == "feed.xml":
            assert r["doc_type"] == "feed"
    # every class and action occurs on the fixture corpus
    assert {r["doc_type"] for r in rows} == {
        "page", "document", "media", "feed", "archive"}
    assert {r["action"] for r in rows} == {"fetch", "skip", "defer"}


def test_url_classify_plan_is_pure_projection(spark):
    """The classifier is one codegen projection: NO exchange anywhere in
    the plan (the 100-TB contract — it composes map-side with the
    frontier's top-K upstream)."""
    plan = (crawlops.url_classify(spark, SF_DIR)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan


def test_fetch_scheduler_politeness_timetable(spark):
    """Per-domain timetable invariants: consecutive slots fire exactly
    delay_ms apart starting at 0, delay is a pure function of the domain
    string, wave is the 1-second dispatch round, and the schedule covers
    exactly the frontier's rows (composition adds no shuffle-side
    effects)."""
    rows = crawlops.fetch_scheduler(spark, SF_DIR).collect()
    frontier_n = crawlops.url_frontier_priority(spark, SF_DIR).count()
    assert len(rows) == frontier_n
    by_domain = {}
    for r in rows:
        assert r["delay_ms"] == crawlops.CRAWL_DELAY_BASE_MS * (
            1 + len(r["domain"]) % 5)
        assert r["scheduled_ms"] == (r["slot"] - 1) * r["delay_ms"]
        assert r["wave"] == r["scheduled_ms"] // 1000
        by_domain.setdefault(r["domain"], []).append(r)
    for domain, rs in by_domain.items():
        rs.sort(key=lambda r: r["slot"])
        assert [r["slot"] for r in rs] == list(range(1, len(rs) + 1))
        gaps = {b["scheduled_ms"] - a["scheduled_ms"]
                for a, b in zip(rs, rs[1:])}
        assert gaps <= {rs[0]["delay_ms"]}
        assert rs[0]["scheduled_ms"] == 0


# ---------------------------------------------------------------------------
# batch #14: sitemap extraction + content-type sniffing
# ---------------------------------------------------------------------------

def test_sitemap_shards_bounded_and_complete(spark):
    """Every sitemap shard holds at most SITEMAP_MAX_URLS entries (the
    protocol's 50k cap scaled down — the bound on per-group agg state),
    shards are contiguous from 0, and the union of shards covers every
    document exactly once."""
    rows = crawlops.sitemap_extract(spark, SF_DIR).collect()
    n_docs = spark.read.parquet(
        f"{SF_DIR}/documents.parquet").count()
    assert len(rows) == n_docs
    assert len({r["loc"] for r in rows}) == n_docs
    by_shard = {}
    for r in rows:
        by_shard.setdefault((r["host"], r["shard"]), []).append(r)
    for (host, shard), rs in by_shard.items():
        assert 1 <= len(rs) <= crawlops.SITEMAP_MAX_URLS
        # positions dense from 0 within the shard
        assert sorted(r["pos"] for r in rs) == list(range(len(rs)))
    shards_per_host = {}
    for host, shard in by_shard:
        shards_per_host.setdefault(host, set()).add(shard)
    for host, shards in shards_per_host.items():
        assert shards == set(range(len(shards)))
        # only the LAST shard may be partial
        for s in sorted(shards)[:-1]:
            assert len(by_shard[(host, s)]) == crawlops.SITEMAP_MAX_URLS


def test_sitemap_round_trip_recovers_fields(spark):
    """The regexp extractor recovers loc/lastmod/priority exactly as the
    writer put them in (field-level round trip, independent of the
    oracle's direct construction)."""
    rows = crawlops.sitemap_extract(spark, SF_DIR).collect()
    for r in rows:
        doc_id = int(r["loc"].rsplit("/", 1)[1])
        assert r["loc"] == f"http://{r['host']}/p/{doc_id}"
        assert r["lastmod"] == f"2026-0{1 + doc_id % 9}-01"
        assert r["priority_tenths"] == doc_id % 10


def test_content_type_sniff_magic_dispatch(spark):
    """The sniffer reads the BINARY payload: every residue class maps to
    its magic's MIME, byte sizes match magic+utf8 arithmetic, and the
    mismatch flag fires exactly when a declared extension disagrees."""
    rows = crawlops.content_type_sniff(spark, SF_DIR).collect()
    seen_mismatch = seen_agree = False
    for r in rows:
        hx, mime, mlen = crawlops._SNIFF_MAGIC[r["doc_id"] % 6]
        assert r["sniffed_type"] == mime
        ext = crawlops._SNIFF_EXTS[r["doc_id"] % 7]
        declared = crawlops._EXT_MIME.get(ext, "unknown")
        assert r["declared_type"] == declared
        expected_mismatch = int(declared != "unknown" and declared != mime)
        assert r["mismatch"] == expected_mismatch
        seen_mismatch |= bool(expected_mismatch)
        seen_agree |= (declared == mime)
    assert seen_mismatch and seen_agree


def test_content_type_sniff_plan_is_pure_projection(spark):
    """Like url_classify: the post-fetch gate is ONE codegen projection,
    no exchange at any corpus size."""
    plan = (crawlops.content_type_sniff(spark, SF_DIR)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# batch #17: mirror-host detection
# ---------------------------------------------------------------------------

def test_mirror_host_pairs_discriminates(spark):
    """True mirrors (m.-hosts, 100% containment) are flagged, the
    partial scraper never is, and shared counts match a pure-Python
    rederivation of the synthesized layers."""
    rows = crawlops.mirror_host_pairs(spark, SF_DIR).collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .select("doc_id", "source", "text").collect()
    import hashlib
    hosts = {}
    for d in docs:
        h = hashlib.md5(d["text"].encode()).hexdigest()
        hosts.setdefault(f"{d['source']}.example.com", set()).add(h)
        if d["doc_id"] % 3 == 0:
            hosts.setdefault(f"m.{d['source']}.example.com", set()).add(h)
        if d["doc_id"] % 7 == 0:
            hosts.setdefault("scraper.example.com", set()).add(h)
    expect = {}
    names = sorted(hosts)
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            shared = len(hosts[a] & hosts[b])
            if shared:
                expect[(a, b)] = shared
    got = {(r["host_a"], r["host_b"]): r for r in rows}
    assert set(got) == set(expect)
    saw_mirror = saw_partial = False
    for (a, b), r in got.items():
        assert r["shared"] == expect[(a, b)]
        assert r["n_a"] == len(hosts[a]) and r["n_b"] == len(hosts[b])
        m = min(len(hosts[a]), len(hosts[b]))
        assert r["overlap_permille"] == 1000 * r["shared"] // m
        assert r["is_mirror"] == int(
            100 * r["shared"] >= crawlops.MIRROR_OVERLAP_PCT * m)
    for (a, b), r in got.items():
        if b == "m." + a or a == "m." + b:
            assert r["is_mirror"] == 1 and r["overlap_permille"] == 1000
            saw_mirror = True
        if "scraper.example.com" in (a, b) and not (
                a.startswith("m.") or b.startswith("m.")):
            assert r["is_mirror"] == 0
            saw_partial = True
    assert saw_mirror and saw_partial
