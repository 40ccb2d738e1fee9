#!/usr/bin/env python3
"""Benchmark harness.

Measures (1) extraction throughput (docs/sec) across parallelism levels,
evidencing the north rule's N -> 4N scaling efficiency >= 0.8 in-sandbox,
and (2) wall time of the headline datapipe queries at $SPARK_GRAFT_SF_DIR.

Scaling protocol (hardened, round 3):

* TWO N -> 4N pairs are measured: local[2] -> local[8] (the machine's
  linear region) and local[8] -> local[32] (the BASELINE.md-stated proxy
  pair; this sandbox saturates above ~16 workers for ANY workload, so the
  pure-multiprocessing ceiling is reported next to it).
* Within a pair, both levels process the SAME document count over the SAME
  partition count (identical physical work decomposition), so Spark's
  fixed per-task cost is an equal CPU fraction at both levels and cancels
  in the ratio.  BENCH_PARTS=128 partitions keep every level many waves
  deep — at 16 partitions local[8] runs exactly 2 waves and the measured
  "inefficiency" is wave-quantization of the salted size buckets, a
  small-N artifact that does not exist at production partition counts.
* EQUAL MACHINE LOAD: busy-loop spinners occupy (4N - N) cores during the
  N-level run — on a real cluster adding executors does not downclock the
  existing ones, so equal-load measurement is the faithful proxy.
* Levels run as PERSISTENT worker subprocesses executing timed sections on
  command, ALTERNATING low/high within each round — the two sides of a
  round's ratio are adjacent in time, so a co-tenant episode hits both.
* EQUAL-LENGTH WINDOWS: the faster level repeats its identical job N times
  back-to-back inside one timed section (N ~ the observed speedup), so
  both sides of a ratio occupy comparable wall-clock windows and an
  episode subtracts proportionally from both instead of owning one short
  high-level sample.
* Estimators reported with ALL samples: per-round ratios, their MEDIAN
  (the headline — robust to episode noise), and the best-per-level ratio
  (max observed docs/sec per level; co-tenant noise only ever subtracts
  throughput, so max-per-level is the least-biased capability estimate).
* A bare-multiprocessing baseline of the identical kernel runs in the same
  windows as the machine's own ceiling; normalized = spark / ceiling.

Query-timing protocol (round 8, VERDICT r7 item #5): every headline query
runs TWICE and the recorded time is the SECOND (warm) pass — the first
pass absorbs query-specific codegen/worker/page-cache warmup that
previously made per-query times depend on position in the run (r6->r7:
early queries read +15-50%, late ones -10-25%, adjudicated as warmup by
BASELINE.md warm re-checks three rounds running).  Cold first-pass times
are kept in the detail JSON under "queries_cold".

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ..., "extraction": {...}}

Run this ALONE — concurrent work on the shared box skews the numbers.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time
from typing import Optional

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_DOCS = int(os.environ.get("BENCH_DOCS", "3000"))
# same partition count at EVERY level: identical work decomposition, many
# waves at each level (see module docstring)
BENCH_PARTS = int(os.environ.get("BENCH_PARTS", "128"))
JUMBO_EVERY = 50
ROUNDS_A = int(os.environ.get("BENCH_ROUNDS_A", "9"))   # 2 -> 8 pair
# r5's 3-round 8->32 samples scattered 4.7x; >=5 rounds tighten the median
# (VERDICT r5 item #6).  Widened 5 -> 7 and the pair now runs FIRST (cold
# box, before pair A and 20 min of queries heat it) with a trimmed median
# reported beside the plain one (VERDICT r6 item #4).
ROUNDS_B = int(os.environ.get("BENCH_ROUNDS_B", "7"))   # 8 -> 32 pair
REPLICATE_A = int(os.environ.get("BENCH_REPLICATE_A", "2"))   # 6000 docs
REPLICATE_B = int(os.environ.get("BENCH_REPLICATE_B", "4"))   # 12000 docs


def _corpus_path() -> str:
    """Cache path keyed by corpus spec so family changes invalidate it."""
    import hashlib
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from pdftotext_plus_plus_spark import fixtures
    import random
    sample = fixtures.FAMILY_BUILDERS["plain-1col"](random.Random(0))[0]
    spec = "%d:%d:%s" % (BENCH_DOCS, JUMBO_EVERY,
                         ",".join(sorted(fixtures.FAMILY_BUILDERS)))
    tag = hashlib.md5(spec.encode() + sample).hexdigest()[:10]
    return "/tmp/spark_graft_bench_corpus_%s.parquet" % tag


CORPUS_PATH = _corpus_path()

# headline datapipe queries (ngram_jaccard excluded: the synthetic word-soup
# vocabulary makes char-3-gram joins quadratic at sf0.1 — see datapipe notes)
BENCH_QUERIES = ["exact_dedup", "minhash_lsh_pairs", "simhash", "lang_id",
                 "token_counts", "fingerprint", "ann_bruteforce_topk",
                 "embedding_near_dup", "multimodal_meta", "ann_ivf_topk",
                 "tfidf_keywords", "repetition_stats",
                 # round 5: the real-codec multimodal ops (PNG+JPEG pixel
                 # decode / MJPEG demux+frame decode) — timed so codec
                 # regressions are visible in the driver record
                 "image_resize_meta", "video_frame_sample",
                 "unigram_surprisal",
                 # round 6: the two-level IVF quantizer beside the
                 # single-level one, so their cost ratio is on record
                 "ann_ivf2_topk",
                 # round-6 batch #2: span-level dedup, semantic dedup,
                 # conditional surprisal, C4 gate (the last over its own
                 # fixed 60-page corpus — a constant-work floor check)
                 "duplicate_ngram_spans", "semdedup_prune",
                 "bigram_surprisal", "c4_quality_filter",
                 # round-6 batch #3: the sampling/mixing/packing layer
                 "stratified_sample", "dsir_importance_weights",
                 "sequence_packing", "c4_line_dedup",
                 # the flagship end-to-end composition
                 "training_mix_pipeline",
                 # round-6 batch #4: the webtext provenance layer
                 "url_normalize_dedup", "domain_stats", "bloom_url_filter",
                 "perplexity_buckets", "link_pagerank",
                 # round-6 batch #5/#6: robots gate + inverted index (both
                 # cheap single-agg/broadcast shapes; the WARC/streaming
                 # equivalence harnesses are correctness surfaces, not
                 # throughput queries, and stay out of the headline list)
                 "robots_filter", "inverted_index",
                 # round-7 batch #7: anchor-text profile (WindowGroupLimit
                 # top-K), pointer-doubling redirect resolver (4 chained
                 # self-joins), bitext URL pairing (agg + slot equi-join),
                 # crawl-snapshot diff (hash-reduced full-outer join)
                 "anchor_text_topk", "redirect_resolution",
                 "bitext_url_pairs", "crawl_snapshot_diff",
                 # round-7 batch #8: the crawl-operations layer — the
                 # deterministic HLL sketch (one (domain,bucket) max-agg),
                 # Hamilton budget apportionment (fact agg + dim window),
                 # the politeness frontier (WindowGroupLimit per domain),
                 # and the host-graph rollup (coarsen-then-aggregate)
                 "hll_url_cardinality", "crawl_budget_allocation",
                 "url_frontier_priority", "host_graph_stats",
                 # round-7 batch #10: seeded TrustRank (the pagerank
                 # join+agg pair with a seed-gated teleport) and exact
                 # word-5-gram containment (A-prefix-filtered candidates)
                 "trust_propagation", "containment_pairs",
                 # round-8: IVF-PQ (ADC scan + exact re-rank, timed beside
                 # ivf/ivf2 so the three quantizer costs stay on record)
                 # and BM25 ranked retrieval over the bigram index
                 "ann_ivfpq_topk", "bm25_topk",
                 # round-8 batch #11: HITS (two pagerank-shaped shuffle
                 # pairs per iteration), the fixed-weight linear quality
                 # scorer (one hash agg), and pHash image near-dup pairs
                 # (real decode + banding)
                 "hits_scores", "quality_classifier",
                 "image_phash_near_pairs",
                 # round-8 batch #12: the CCNet curation composition (one
                 # md5 hash-agg + the surprisal plan + one per-(lang,
                 # first-copy) window), URL fetch gating (pure codegen
                 # projection — the cheapest op in the list by design),
                 # and the DOM heading outline (one mapInPandas pass over
                 # the html column, per-page stack state)
                 "ccnet_pipeline", "url_classify", "html_outline",
                 # round-8 batch #13: revisit-record snapshot write+read
                 # (journal equi-join -> per-bucket WARC build -> shard
                 # parse-back) and the politeness timetable (frontier
                 # composition, map-side arithmetic only)
                 "warc_revisit_records", "fetch_scheduler",
                 # round-8 batch #14: host-template detection (line
                 # explode + one (host,line) hash agg + N:1 join back),
                 # sitemap round trip (per-host window -> bounded-state
                 # shard agg -> regexp explode), and magic-byte sniffing
                 # (pure codegen projection over real binary)
                 "host_template_ratio", "sitemap_extract",
                 "content_type_sniff",
                 # round-8 batch #15: recrawl-rate estimation (snapshot
                 # diff + one domain-dim agg) and postings d-gap
                 # accounting (the inverted_index window plan + one agg)
                 "change_rate_estimate", "postings_gap_stats",
                 # round-8 batch #16: quality-argmax representative per
                 # near-dup cluster (fixpoint components + classifier
                 # logit + two cluster-dim joins) and the integer A-ES
                 # weighted sample (WindowGroupLimit top-K per source)
                 "dedup_representatives", "weighted_sample_topk",
                 # round-8 batch #17: mirror detection (hash-bucket
                 # equi-join pairs + dim-sized threshold join) and the
                 # exact length-percentile histogram rollup
                 "mirror_host_pairs", "length_percentiles"]


def ensure_corpus() -> int:
    """Write the bench pages corpus once (deterministic, reused by workers)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    if os.path.exists(CORPUS_PATH):
        meta = pq.read_metadata(CORPUS_PATH)
        if meta.num_rows == BENCH_DOCS:
            return BENCH_DOCS

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from pdftotext_plus_plus_spark import fixtures

    rows = fixtures.build_corpus(BENCH_DOCS, jumbo_every=JUMBO_EVERY)
    table = pa.table({
        "url": [r["url"] for r in rows],
        "html": [r["html"] for r in rows],
    })
    pq.write_table(table, CORPUS_PATH)
    return BENCH_DOCS


def _spin(stop_flag):
    x = 1.0
    while not stop_flag.is_set():
        x = x * 1.0000001 + 1e-9


def serve(cpus: int) -> None:
    """Persistent worker: build the session once, then execute timed
    extraction sections on command.

    stdin protocol, one command per line:
      run <replicate> <spinners>   -> one timed pass, prints a JSON line
      quit                         -> stop the session and exit

    Keeping the session alive across rounds removes the per-round JVM
    startup + warmup from the timed windows and lets the driver alternate
    levels on a tight cadence.
    """
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import multiprocessing as mp

    from pyspark.sql import functions as F

    from pdftotext_plus_plus_spark import engine

    spark = engine.build_session(app_name=f"bench-{cpus}", cpus=cpus,
                                 shuffle_partitions=cpus,
                                 driver_memory="16g")
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.read.parquet(CORPUS_PATH)
    pages_cache = {}

    def pages_for(replicate: int):
        if replicate not in pages_cache:
            reps = F.array([F.lit(i) for i in range(replicate)])
            pages_cache[replicate] = (
                base.withColumn("rep", F.explode(reps))
                .withColumn("url", F.concat_ws("#", "url", "rep"))
                .select("url", "html"))
        return pages_cache[replicate]

    # warm up JIT, page cache, and every executor thread's Python worker
    # (a slice is enough; pairs re-warm right before their timed rounds)
    engine.extract_pages(base.limit(1000), num_partitions=BENCH_PARTS).count()
    print(json.dumps({"ready": cpus}), flush=True)

    for line in sys.stdin:
        parts = line.split()
        if not parts or parts[0] == "quit":
            break
        replicate, spinners = int(parts[1]), int(parts[2])
        # `repeat`: run the identical job N times back-to-back inside ONE
        # timed section.  The faster (high-parallelism) level repeats
        # n_high/n_low times so both sides of a round's ratio occupy
        # EQUAL-LENGTH time windows — a co-tenant episode then subtracts
        # proportionally from both instead of owning one short sample.
        # The job itself is unchanged (same docs, same partitions), so the
        # per-task fixed-cost cancellation argument is unaffected.
        repeat = int(parts[3]) if len(parts) > 3 else 1
        pages = pages_for(replicate)
        stop_flag = None
        spin_procs = []
        if spinners > 0:
            stop_flag = mp.Event()
            spin_procs = [mp.Process(target=_spin, args=(stop_flag,),
                                     daemon=True) for _ in range(spinners)]
            for proc in spin_procs:
                proc.start()
        try:
            t0 = time.perf_counter()
            total_docs = 0
            for _ in range(repeat):
                out = engine.extract_pages(pages, num_partitions=BENCH_PARTS)
                n = out.agg(F.count("*"),
                            F.sum(F.length("extracted_text"))).collect()
                total_docs += int(n[0][0])
            elapsed = time.perf_counter() - t0
        finally:
            if stop_flag is not None:
                stop_flag.set()
                for proc in spin_procs:
                    proc.join(timeout=5)
        print(json.dumps({"cpus": cpus, "elapsed": elapsed,
                          "docs": total_docs}), flush=True)
    spark.stop()


class Server:
    """Driver-side handle on a persistent `serve` subprocess."""

    def __init__(self, cpus: int):
        self.cpus = cpus
        self.proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--serve", str(cpus)],
            stdin=subprocess.PIPE, stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL, text=True, bufsize=1)

    def _read_json(self) -> dict:
        while True:
            line = self.proc.stdout.readline()
            if not line:
                raise RuntimeError(f"server local[{self.cpus}] died")
            try:
                return json.loads(line)
            except (json.JSONDecodeError, ValueError):
                continue

    def wait_ready(self) -> None:
        msg = self._read_json()
        assert msg.get("ready") == self.cpus, msg

    def run(self, replicate: int, spinners: int = 0, repeat: int = 1) -> dict:
        self.proc.stdin.write(f"run {replicate} {spinners} {repeat}\n")
        self.proc.stdin.flush()
        res = self._read_json()
        res["dps"] = res["docs"] / res["elapsed"]
        return res

    def stop(self) -> None:
        try:
            self.proc.stdin.write("quit\n")
            self.proc.stdin.flush()
            self.proc.wait(timeout=60)
        except Exception:
            self.proc.kill()


def _mp_baseline(procs: int, n_docs: int, spinners: int = 0) -> float:
    """docs/sec of the bare kernel under multiprocessing at `procs` workers —
    the machine's scaling ceiling for this workload, measured in the same
    windows as the Spark samples so co-tenant load affects both alike."""
    import multiprocessing as mp

    import pyarrow.parquet as pq

    table = pq.read_table(CORPUS_PATH, columns=["html"])
    payloads = [bytes(x) for x in table.column("html").to_pylist()]
    while len(payloads) < n_docs:
        payloads = payloads + payloads
    payloads = payloads[:n_docs]
    chunks = [payloads[i::procs] for i in range(procs)]
    stop_flag = mp.Event()
    spin_procs = [mp.Process(target=_spin, args=(stop_flag,), daemon=True)
                  for _ in range(spinners)]
    for proc in spin_procs:
        proc.start()
    try:
        with mp.Pool(procs) as pool:
            t0 = time.perf_counter()
            total = sum(pool.map(_mp_chunk, chunks))
            elapsed = time.perf_counter() - t0
    finally:
        stop_flag.set()
        for proc in spin_procs:
            proc.join(timeout=5)
    return total / elapsed


def _mp_chunk(payloads) -> int:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from pdftotext_plus_plus_spark.pipeline import extract

    for p in payloads:
        extract(p, with_spans=False)
    return len(payloads)


# queries re-timed on a 10x-docs corpus to evidence near-linear datapipe
# scaling (bucketed joins must not blow up when every bucket gets 10x
# members); embedding_near_dup excluded by design (exact O(N^2) baseline),
# ngram_jaccard excluded as in BENCH_QUERIES
SCALE_PROBE_QUERIES = ["exact_dedup", "minhash_lsh_pairs", "simhash",
                       "ann_ivf_topk", "ann_ivf2_topk", "tfidf_keywords",
                       "token_counts",
                       # round-6 batch #2: both are gram hash-agg + N:1
                       # frequency-join shapes and must stay near-linear.
                       # semdedup_prune is excluded like embedding_near_dup:
                       # the probe replicates embeddings with IDENTICAL
                       # vectors, so every cluster gets 10x members and the
                       # within-cluster pairwise stage is O(m^2) BY DESIGN
                       # (SemDeDup's paper caps cluster sizes for the same
                       # reason) — the exponent would measure the synthetic
                       # replication, not the operator.
                       "duplicate_ngram_spans", "bigram_surprisal",
                       # round-6 batch #3: the single-token-pass dim-join
                       # shape (dsir) and the per-shard packing window —
                       # the window's 10x behavior is the evidence that
                       # packing never needs a global sort.
                       "dsir_importance_weights", "sequence_packing",
                       # round-6 batch #4: the computed-key hash-agg dedup
                       # (url), the broadcast-bitset probe (bloom — at 10x
                       # the sandbox-sized 256-bit filter saturates, which
                       # only makes the probe CHEAPER: the timing measures
                       # the explode+probe+fold shape, not filter quality),
                       # and the iterative join+agg pair (pagerank, 3
                       # rounds over a 10x node/edge set — must be linear).
                       "url_normalize_dedup", "bloom_url_filter",
                       "link_pagerank",
                       # round-7 batch #7: the per-target top-K window
                       # (must stay WindowGroupLimit-bounded at 10x), the
                       # log-rounds pointer-doubling resolver (4 joins
                       # regardless of corpus size — the whole point),
                       # and the hash-reduced full-outer snapshot join
                       "anchor_text_topk", "redirect_resolution",
                       "crawl_snapshot_diff",
                       # round-7 batch #8: the HLL sketch MUST be flat-ish
                       # in output size (register state is constant per
                       # domain) and linear in scan; the host-graph rollup
                       # is two doc-key joins + a host-pair agg — linear
                       # in edges.  budget/frontier excluded: dim-sized
                       # windows, their 10x cost is the scan they share
                       # with hll/host_graph.
                       "hll_url_cardinality", "host_graph_stats",
                       # round-7 batch #10: trust is the pagerank shape
                       # (linear in edges).
                       "trust_propagation",
                       # round-8 (VERDICT r7 item #4): the pair products
                       # enter the probe directly — the v2 corpus keeps
                       # replicas disjoint at BOTH the token level
                       # (q<k> prefix) and the char level (per-replica
                       # alphabet rotation), so the TRUE pair set scales
                       # linearly and the exponent measures the OPERATOR
                       # (prefix-filter + verify joins), not synthetic
                       # cross-replica duplication.  simhash_near_pairs /
                       # ngram_jaccard_pairs get their 1x timing inline
                       # (neither is a headline query; jaccard's char-3
                       # gram sets are corpus-dense at sf0.1 — see
                       # BENCH_QUERIES note — so it probes from the
                       # sf0.01 base instead).
                       "containment_pairs", "simhash_near_pairs",
                       # round-8: the two new ops — ivfpq must hold the
                       # ivf2-class exponent (two bounded-broadcast scans
                       # + code-stream agg), bm25 is a token-dim join +
                       # bounded window (flat-ish).
                       "ann_ivfpq_topk", "bm25_topk",
                       # round-8 batch #11: hits is two pagerank-shaped
                       # shuffle pairs per iteration (must stay linear in
                       # edges); the linear scorer is one hash agg.
                       # image_phash_near_pairs is EXCLUDED like
                       # embedding_near_dup: the blob synthesizer's dim
                       # formulas repeat at more doc_ids, so the TRUE
                       # near-dup pair set grows superlinearly by corpus
                       # construction (measured 85 -> 14,977 at 10x) —
                       # the banding shape itself is probed via
                       # simhash_near_pairs.
                       "hits_scores", "quality_classifier",
                       # round-8 batch #12: ccnet composes three linear
                       # plans (hash-agg + surprisal + per-(lang,first)
                       # ntile window — the one n log n term, per-shard);
                       # url_classify is the no-shuffle projection floor.
                       # html_outline excluded: its corpus is the fixed
                       # 40-page synthetic HTML set (constant work at any
                       # sf, like c4_quality_filter / main_content).
                       "ccnet_pipeline", "url_classify",
                       # round-8 batch #13: the revisit write+read path
                       # is linear end to end (journal hash join, bucket
                       # build, streaming parse) and must measure so.
                       # fetch_scheduler excluded like budget/frontier:
                       # map-side arithmetic over the frontier's
                       # dim-sized window output.
                       "warc_revisit_records",
                       # round-8 batch #14: the onion-pass df-threshold
                       # join must stay near-linear when every host gets
                       # 10x pages (df and n_docs both scale 10x — the
                       # threshold is scale-free); sitemap's window+agg
                       # likewise.  content_type_sniff excluded like
                       # url_classify: the no-shuffle projection floor.
                       "host_template_ratio", "sitemap_extract",
                       # batch #16: the representative op rides the
                       # skew-stressed fixpoint graph — its 10x behavior
                       # certifies the argmax joins stay cluster-dim-
                       # sized.  weighted_sample excluded: output is
                       # K-per-source (dim-sized) and the window is
                       # sequence_packing's probed per-shard shape.
                       "dedup_representatives",
                       # batch #17: the hash-bucket pair join must stay
                       # bounded when every mirror set gets 10x pages
                       # (bucket size = hosts per content, invariant
                       # under replication).  length_percentiles
                       # excluded: output is lang-dim-sized and the
                       # per-doc work is ONE hash agg, probed by
                       # domain_stats/token_counts shapes already.
                       "mirror_host_pairs",
                       # batch #15: the d-gap window must scale like the
                       # index build it mirrors (per-token sort,
                       # spill-able).  change_rate_estimate excluded:
                       # its output is domain-dim-sized (20 rows at any
                       # sf) and the diff join is crawl_snapshot_diff's
                       # probed shape already.
                       "postings_gap_stats"]
# pair ops probed from a smaller base corpus: 1x timed inline at the base,
# 10x on the perturbed-replica corpus built FROM that base
SCALE_PROBE_SMALL_BASE = {
    "ngram_jaccard_pairs": os.environ.get("BENCH_SMALL_BASE",
                                          "/root/testdata/sf0.01"),
}
# probe entries timed inline (not in BENCH_QUERIES): name -> base dir
SCALE_PROBE_INLINE_1X = ["simhash_near_pairs"]
SCALE_FACTOR = int(os.environ.get("BENCH_SCALE_FACTOR", "10"))


def ensure_scale_corpus(spark, base_dir: Optional[str] = None) -> str:
    """A SCALE_FACTOR x documents+embeddings corpus derived from base_dir
    (default SF_DIR).

    Construction preserves the per-document structure while keeping
    replicas textually DISJOINT at BOTH granularities the pair ops
    shingle on (VERDICT r7 item #4): replica k's alphabet (a-z, 0-9) is
    mapped by a per-replica character BIJECTION into its OWN disjoint
    36-codepoint Unicode block (rep 0 is the original).  A bijection
    means

    * within a replica the corpus is structurally IDENTICAL to the base
      (token counts, doc lengths, duplicate groups, char-gram Jaccard
      between any two docs) — each replica contributes exactly the base
      pair set, so the TRUE pair set scales exactly x10;
    * across replicas both word-shingle sets (minhash, containment
      word-5-grams, simhash token hashes) and CHAR-n-gram sets live in
      disjoint codepoint ranges — zero collisions by construction.

    Two earlier constructions were measured and rejected: (v1) prefixing
    every token with ``q<k>`` keeps token sets disjoint but ADDS a large
    shared char-gram subset to every doc within a replica —
    ngram_jaccard's within-replica pair count exploded 25 -> 313k at
    10x; (v2) Caesar-rotating within the SAME 36-symbol alphabet keeps
    within-replica structure but replica gram sets collide by birthday
    (measured: 10 replicas produced only 1891 distinct grams, not 3770,
    and the prefix-filter candidate set grew 70x).  The disjoint-block
    bijection has neither failure mode.  The probe corpus is Spark-only
    (no DuckDB oracle runs against it), so non-ASCII text is safe.
    Embeddings replicate with shifted ids and identical vectors: every
    IVF/LSH bucket gets exactly 10x members — the bucket-blowup stress.
    Cached in /tmp keyed by construction version + source dir + factor +
    a source-content fingerprint (size+mtime of both parquet inputs), so
    a regenerated corpus at the same path invalidates the cache
    (ADVICE r5)."""
    import hashlib
    import string

    from pyspark.sql import functions as F

    base = base_dir or SF_DIR
    fp = hashlib.md5(("v4-block:" + base).encode())
    for table in ("documents", "embeddings"):
        st = os.stat(f"{base}/{table}.parquet")
        fp.update(b"%d:%d" % (st.st_size, st.st_mtime_ns))
    out = "/tmp/spark_graft_scale%dx_%s" % (SCALE_FACTOR,
                                            fp.hexdigest()[:10])
    if os.path.exists(out + "/_DONE"):
        return out
    shift = 10_000_000
    reps = F.explode(F.array(
        [F.lit(i) for i in range(SCALE_FACTOR)])).alias("rep")
    docs = spark.read.parquet(f"{base}/documents.parquet")
    src_alpha = string.ascii_lowercase + string.digits

    def _block(k: int) -> str:
        # replica k's private 36-codepoint block (CJK range: contiguous,
        # assigned, 1 character in Spark's character semantics)
        return "".join(chr(0x4E00 + 36 * k + i) for i in range(36))

    rotated = F.col("text")
    for k in range(1, SCALE_FACTOR):
        rotated = F.when(F.col("rep") == k,
                         F.translate(F.col("text"), src_alpha,
                                     _block(k))).otherwise(rotated)
    (docs.select("*", reps)
     .select((F.col("doc_id") + F.col("rep") * shift).alias("doc_id"),
             rotated.alias("text"),
             "lang", "source", "n_chars")
     .write.mode("overwrite").parquet(out + "/documents.parquet"))
    emb = spark.read.parquet(f"{base}/embeddings.parquet")
    (emb.select("*", reps)
     .select((F.col("vec_id") + F.col("rep") * shift).alias("vec_id"),
             "embedding", "label")
     .write.mode("overwrite").parquet(out + "/embeddings.parquet"))
    with open(out + "/_DONE", "w") as f:
        f.write("ok")
    return out


def ensure_skew_corpus(spark) -> str:
    """A SCALE_FACTOR x documents corpus of VERBATIM replicas — the
    deliberate worst case for the dedup-cluster graph: every replica of a
    doc lands in the SAME (band, minhash) LSH bucket, so bucket sizes grow
    x10 while doc count grows x10.  Before the star-edge rebuild (VERDICT
    r7 item #2) the edge list grew quadratically per bucket on exactly
    this shape; with star edges it must stay linear — this corpus is what
    the dedup_clusters_skew probe entry measures."""
    import hashlib

    from pyspark.sql import functions as F

    fp = hashlib.md5(("skew-v1:" + SF_DIR).encode())
    st = os.stat(f"{SF_DIR}/documents.parquet")
    fp.update(b"%d:%d" % (st.st_size, st.st_mtime_ns))
    out = "/tmp/spark_graft_skew%dx_%s" % (SCALE_FACTOR,
                                           fp.hexdigest()[:10])
    if os.path.exists(out + "/_DONE"):
        return out
    shift = 10_000_000
    reps = F.explode(F.array(
        [F.lit(i) for i in range(SCALE_FACTOR)])).alias("rep")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    (docs.select("*", reps)
     .select((F.col("doc_id") + F.col("rep") * shift).alias("doc_id"),
             "text", "lang", "source", "n_chars")
     .write.mode("overwrite").parquet(out + "/documents.parquet"))
    with open(out + "/_DONE", "w") as f:
        f.write("ok")
    return out


def settle_machine(max_wait_s: int = 120) -> None:
    """Kill leaked pyspark daemons and wait for system load to settle.

    Prior Spark sessions (pytest, oracle checks) leak ``pyspark.daemon``
    workers that silently poison throughput — a polluted box once measured
    local[32] at 390 docs/s vs 1500 clean, with 72% system time.  The
    bench owns the machine by protocol, so any daemon alive at start is a
    leak."""
    try:
        subprocess.run(["pkill", "-f", "pyspark.daemon"], check=False)
    except OSError:
        pass
    deadline = time.time() + max_wait_s
    while time.time() < deadline:
        load1 = float(open("/proc/loadavg").read().split()[0])
        if load1 < 2.0:
            return
        time.sleep(10)


def _pair(low_srv: Server, high_srv: Server, rounds: int, replicate: int,
          mp_low_docs: int, mp_high_docs: int,
          rep_high: Optional[int] = None,
          deadline: Optional[float] = None,
          min_rounds: int = 3) -> dict:
    """Measure one N -> 4N pair: `rounds` alternating (low, high) timed
    sections with equal-load spinners on the low side, an mp-ceiling sample
    every round (so normalization tracks bursty co-tenant load).

    ``deadline`` (absolute time.time()) soft-bounds the loop: once at least
    ``min_rounds`` rounds are recorded, no new round starts past it — a
    co-tenant-loaded box then degrades to fewer rounds instead of losing
    the whole bench record to the driver's timeout."""
    n_low, n_high = low_srv.cpus, high_srv.cpus
    eq = n_high - n_low
    # the high level repeats its (identical) job per timed section so both
    # sides of a ratio occupy roughly equal-length windows (see `serve`);
    # default = the ideal speedup, callers pass the observed one where the
    # box saturates
    if rep_high is None:
        rep_high = max(1, n_high // n_low)
    # re-warm both servers right before the timed rounds: a server idle
    # through the previous pair loses JIT/worker warmth (observed as a
    # 529 -> 757 -> 1554 docs/s ramp in an unwarmed local[32])
    low_srv.run(1, spinners=0)
    high_srv.run(1, spinners=0)
    low, high, ratios = [], [], []
    mp_ratios = []
    for r in range(rounds):
        if (deadline is not None and r >= min_rounds
                and time.time() > deadline):
            break
        rl = low_srv.run(replicate, spinners=eq)
        rh = high_srv.run(replicate, spinners=0, repeat=rep_high)
        low.append(rl)
        high.append(rh)
        ratios.append((rh["dps"] / rl["dps"]) / (n_high / n_low))
        # mp-ceiling sample EVERY round: the ceiling median must track the
        # same co-tenant episodes the Spark samples see, or normalization
        # under-corrects on a bursty box
        b_lo = _mp_baseline(n_low, mp_low_docs, spinners=eq)
        b_hi = _mp_baseline(n_high, mp_high_docs)
        mp_ratios.append((b_hi / b_lo) / (n_high / n_low))
    best_low = max(r["dps"] for r in low)
    best_high = max(r["dps"] for r in high)
    eff_median = statistics.median(ratios)
    # trimmed median (VERDICT r6 item #4): with >=5 rounds, drop the single
    # best and worst round before taking the median — one co-tenant episode
    # or one turbo round then cannot move the estimate at all
    trimmed = sorted(ratios)[1:-1] if len(ratios) >= 5 else ratios
    eff_trimmed = statistics.median(trimmed)
    eff_best = (best_high / best_low) / (n_high / n_low)
    # a ceiling cannot exceed linear scaling; >1 samples are turbo/co-tenant
    # artifacts and would spuriously deflate the normalized efficiency
    ceiling = min(1.0, statistics.median(mp_ratios))
    # per-round normalization: each round's Spark ratio over ITS OWN
    # mp-ceiling sample (taken in the same window) — a bursty episode that
    # depresses one round's Spark sides depresses its ceiling too, so the
    # per-round quotient stays stable where the two medians drift apart
    roundnorm = [r / min(1.0, max(m, 1e-9))
                 for r, m in zip(ratios, mp_ratios)]
    rn_trimmed = sorted(roundnorm)[1:-1] if len(roundnorm) >= 5 else roundnorm
    return {
        "n_low": n_low, "n_high": n_high,
        "docs": low[0]["docs"],
        "dps_low_samples": [round(r["dps"], 2) for r in low],
        "dps_high_samples": [round(r["dps"], 2) for r in high],
        # per-job wall seconds (the high side's timed section holds
        # rep_high identical jobs)
        "elapsed_low_best": min(r["elapsed"] for r in low),
        "elapsed_high_best": min(r["elapsed"] for r in high) / rep_high,
        "dps_low_best": round(best_low, 2),
        "dps_high_best": round(best_high, 2),
        "round_ratios": [round(x, 3) for x in ratios],
        "eff_median": round(eff_median, 3),
        "eff_trimmed_median": round(eff_trimmed, 3),
        "eff_best_per_level": round(eff_best, 3),
        "mp_ceiling_ratios": [round(x, 3) for x in mp_ratios],
        "mp_ceiling": round(ceiling, 3),
        "eff_median_normalized": round(eff_median / ceiling, 3),
        "eff_trimmed_normalized": round(eff_trimmed / ceiling, 3),
        "eff_roundnorm_median": round(
            statistics.median(rn_trimmed), 3),
        "eff_best_normalized": round(eff_best / ceiling, 3),
    }


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--serve":
        ensure_corpus()
        serve(int(sys.argv[2]))
        return

    ensure_corpus()
    settle_machine()
    total_t0 = time.perf_counter()
    # soft wall-clock budget: pair A may use ~55% of it, pair B up to 80%;
    # past a threshold the pair loops stop adding rounds (>= 3 kept) so a
    # loaded box yields a shorter-but-parseable record instead of a
    # driver-side timeout losing the artifact entirely
    # default raised 1700 -> 2600 in round 6: the headline list grew past
    # 30 queries (webtext batch; 32 as of batch #6) and at 1700 the probe
    # was skipped
    # on a clean box; the probe is the scaling evidence, so the budget
    # follows the query list.  2600 -> 2900 in round 7: pair B widened
    # 5 -> 7 rounds (~2 x 130 s) and must not eat the probe's window.
    # 2900 -> 3500 in round 8: the warm-pass protocol doubles the
    # headline section (~+200 s), and the probe gained the pair ops, the
    # skew-cluster entry, and the per-stage timing pass (~+250 s).
    budget = float(os.environ.get("BENCH_TIME_BUDGET", "3500"))
    wall_t0 = time.time()

    srv = {}
    for cpus in (2, 8, CPUS):
        srv[cpus] = Server(cpus)
    for cpus in (2, 8, CPUS):
        srv[cpus].wait_ready()

    # pair B FIRST (VERDICT r6 item #4): local[8] -> local[32] is the
    # BASELINE.md-stated proxy pair AND the one most sensitive to a heated
    # box — r6's official artifact measured it last, after ~20 min of
    # queries, and its rounds scattered 7x while same-code clean-box runs
    # were stable.  The box saturates above ~16 workers (observed 8->32
    # speedup ~1.6), so repeat 2x approximates equal windows.
    pair_b = _pair(srv[8], srv[CPUS], ROUNDS_B, REPLICATE_B,
                   mp_low_docs=BENCH_DOCS * 2, mp_high_docs=BENCH_DOCS * 4,
                   rep_high=2, deadline=wall_t0 + 0.45 * budget)
    # pair A: local[2] -> local[8], ROUNDS_A alternating rounds; the high
    # side repeats 4x per section (the linear-region speedup) so both
    # sides see equal-length windows
    pair_a = _pair(srv[2], srv[8], ROUNDS_A, REPLICATE_A,
                   mp_low_docs=BENCH_DOCS, mp_high_docs=BENCH_DOCS * 2,
                   deadline=wall_t0 + 0.8 * budget)
    for s in srv.values():
        s.stop()

    # saturation curve: best observed docs/sec per level (+ one-shot fills
    # at 4 and 16), with the bare-kernel mp curve beside it — the data that
    # shows where the BOX saturates independent of Spark
    curve = {
        "2": pair_a["dps_low_best"],
        "8": max(pair_a["dps_high_best"], pair_b["dps_low_best"]),
        str(CPUS): pair_b["dps_high_best"],
    }
    for level, repl in ((4, REPLICATE_A), (16, REPLICATE_B)):
        s = Server(level)
        s.wait_ready()
        curve[str(level)] = round(s.run(repl)["dps"], 2)
        s.stop()
    mp_curve = {str(level): round(
        _mp_baseline(level, BENCH_DOCS if level <= 4 else BENCH_DOCS * 2), 2)
        for level in (2, 8, CPUS)}

    # datapipe headline queries at SF_DIR
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from pdftotext_plus_plus_spark import engine
    from pdftotext_plus_plus_spark.datapipe import registry

    spark = engine.build_session(app_name="bench-queries", cpus=CPUS,
                                 shuffle_partitions=CPUS, driver_memory="16g")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    # warm the session (executor Python workers, codegen, parquet footers)
    # so the FIRST timed query does not absorb the startup tax
    for table in ("documents", "embeddings", "events"):
        spark.read.parquet(f"{SF_DIR}/{table}.parquet").count()
    # WARM-PASS protocol (VERDICT r7 item #5): each query runs TWICE and
    # the recorded time is the SECOND pass.  The first pass absorbs the
    # position-in-run warmup tax (query-specific codegen, Python worker
    # fan-out, shuffle-dir creation, page-cache fill) that made early-
    # position queries read +15-50% round-over-round while late ones read
    # -10-25% — a pattern BASELINE.md adjudicated with warm re-checks in
    # r5/r6/r7.  Cold times are kept in the detail JSON for the record.
    query_secs, query_secs_cold = {}, {}
    for name in BENCH_QUERIES:
        t0 = time.perf_counter()
        qs[name](spark, SF_DIR).count()
        query_secs_cold[name] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        qs[name](spark, SF_DIR).count()
        query_secs[name] = round(time.perf_counter() - t0, 3)
    # 10x-docs scale probe (VERDICT r4 item #4): re-time the join-heavy
    # datapipe queries on a SCALE_FACTOR x corpus and report the observed
    # scaling exponent log(t_hi/t_lo)/log(factor).  BOTH sides are warm
    # second passes (round-8 review: a cold t_hi against the headline's
    # warm t_lo biased exponents upward by the 10x first-scan tax).
    # Fixed per-job overhead (session scheduling, ~0.3-0.5 s) still
    # rides in BOTH timings, so the exponent UNDERSTATES work growth for
    # sub-second queries — the gate to watch is exponent <= ~1:
    # super-linear means a bucket blew up.  Soft-gated on the bench time
    # budget so a loaded box still yields the core record.
    import math as _math
    scale_probe = {"factor": SCALE_FACTOR}
    if (time.time() - wall_t0 < 0.75 * budget
            or os.environ.get("BENCH_SCALE_PROBE") == "1"):
        scale_dir = ensure_scale_corpus(spark)
        for name in SCALE_PROBE_QUERIES:
            if time.time() - wall_t0 > 0.92 * budget:
                scale_probe.setdefault("skipped_past_deadline", []).append(name)
                continue
            if name in SCALE_PROBE_INLINE_1X:
                # not a headline query: time its 1x inline under the
                # same cold-then-warm protocol as the headline list
                t0 = time.perf_counter()
                qs[name](spark, SF_DIR).count()
                query_secs_cold[name] = round(time.perf_counter() - t0, 3)
                t0 = time.perf_counter()
                qs[name](spark, SF_DIR).count()
                query_secs[name] = round(time.perf_counter() - t0, 3)
            # WARM/WARM exponent (round-8 review): t_lo is the headline's
            # warm second pass, so t_hi must be a warm second pass too —
            # a cold 10x run would absorb the 10x corpus's first-scan tax
            # on one side only and bias every exponent upward
            qs[name](spark, scale_dir).count()
            t0 = time.perf_counter()
            qs[name](spark, scale_dir).count()
            t_hi = time.perf_counter() - t0
            # floor the 1x time so a sub-ms sample cannot zero-divide the
            # exponent (ADVICE r5)
            t_lo = max(query_secs[name], 1e-3)
            scale_probe[name] = {
                "sec_1x": t_lo, "sec_%dx" % SCALE_FACTOR: round(t_hi, 3),
                "exponent": round(_math.log(t_hi / t_lo)
                                  / _math.log(SCALE_FACTOR), 3)}
        # small-base pair probes (VERDICT r7 item #4): ops whose 1x cost
        # at SF_DIR is already minutes-scale (corpus-dense char-gram pair
        # sets) probe from a smaller base so the 10x run stays bounded;
        # the exponent is base-independent.
        for name, base in SCALE_PROBE_SMALL_BASE.items():
            if time.time() - wall_t0 > 0.92 * budget:
                scale_probe.setdefault("skipped_past_deadline", []).append(name)
                continue
            small_scale_dir = ensure_scale_corpus(spark, base)
            qs[name](spark, base).count()
            t0 = time.perf_counter()
            qs[name](spark, base).count()
            t_lo = max(time.perf_counter() - t0, 1e-3)
            qs[name](spark, small_scale_dir).count()   # warm/warm
            t0 = time.perf_counter()
            qs[name](spark, small_scale_dir).count()
            t_hi = time.perf_counter() - t0
            scale_probe[name] = {
                "base": base,
                "sec_1x": round(t_lo, 3),
                "sec_%dx" % SCALE_FACTOR: round(t_hi, 3),
                "exponent": round(_math.log(t_hi / t_lo)
                                  / _math.log(SCALE_FACTOR), 3)}
        # skewed-bucket cluster probe (VERDICT r7 item #2 done-criterion):
        # VERBATIM x10 replication puts all replicas of a doc in the same
        # LSH buckets (bucket size x10); star edges keep the component
        # build linear where all-pairs edges were quadratic per bucket.
        if time.time() - wall_t0 <= 0.92 * budget:
            skew_dir = ensure_skew_corpus(spark)
            qs["dedup_clusters"](spark, SF_DIR).count()
            t0 = time.perf_counter()
            qs["dedup_clusters"](spark, SF_DIR).count()
            t_lo = max(time.perf_counter() - t0, 1e-3)
            qs["dedup_clusters"](spark, skew_dir).count()   # warm/warm
            t0 = time.perf_counter()
            qs["dedup_clusters"](spark, skew_dir).count()
            t_hi = time.perf_counter() - t0
            scale_probe["dedup_clusters_skew"] = {
                "corpus": "verbatim x%d (bucket-size blowup)" % SCALE_FACTOR,
                "sec_1x": round(t_lo, 3),
                "sec_%dx" % SCALE_FACTOR: round(t_hi, 3),
                "exponent": round(_math.log(t_hi / t_lo)
                                  / _math.log(SCALE_FACTOR), 3)}
        else:
            scale_probe.setdefault("skipped_past_deadline",
                                   []).append("dedup_clusters_skew")
        # extraction-side 10x probe (VERDICT r5 item #5): the same kernel
        # the pair benches time, at 1x and 10x docs (replication keeps the
        # jumbo tail: 10x jumbos too), with per-partition lineage totals
        # as measured straggler evidence for the size-bucket salting
        # (engine.salted_repartition) — the timed action IS the lineage
        # aggregation, so one pass yields both the wall time and the
        # per-task skew columns
        if time.time() - wall_t0 < 0.92 * budget:
            from pyspark.sql import functions as F

            def _ext_run(df):
                out = engine.extract_pages(df, num_partitions=BENCH_PARTS)
                t0 = time.perf_counter()
                rows = engine.lineage_frame(out).collect()
                return time.perf_counter() - t0, rows

            base_pages = spark.read.parquet(CORPUS_PATH)
            # warm the extraction kernel in THIS session before timing
            # (first mapInArrow pass pays worker/import warmup otherwise)
            engine.extract_pages(base_pages.limit(200),
                                 num_partitions=BENCH_PARTS).count()
            t_1x, _ = _ext_run(base_pages)
            reps = F.array([F.lit(i) for i in range(SCALE_FACTOR)])
            big = (base_pages.withColumn("rep", F.explode(reps))
                   .withColumn("url", F.concat_ws("#", "url", "rep"))
                   .select("url", "html"))
            t_hi, parts = _ext_run(big)
            totals = sorted(float(r["extract_ms_total"]) for r in parts)
            maxdoc = sorted(float(r["max_doc_ms"]) for r in parts)
            med_total = totals[len(totals) // 2]
            scale_probe["extraction"] = {
                "sec_1x": round(t_1x, 3),
                "sec_%dx" % SCALE_FACTOR: round(t_hi, 3),
                "exponent": round(_math.log(t_hi / max(t_1x, 1e-3))
                                  / _math.log(SCALE_FACTOR), 3),
                "n_partitions": len(parts),
                # task-level skew: busiest partition vs the median one —
                # ~1 means the salted size buckets spread the jumbo docs
                "partition_ms_median": round(med_total, 1),
                "partition_ms_max": round(totals[-1], 1),
                "straggler_ratio": round(totals[-1] / max(med_total, 1e-9),
                                         3),
                # doc-level tail: the jumbo ceiling inside any one task
                "max_doc_ms": round(maxdoc[-1], 1),
                "median_partition_max_doc_ms": round(
                    maxdoc[len(maxdoc) // 2], 1),
            }
            # per-stage timing rows (VERDICT r7 item #8): one extra
            # with_timings pass at 1x rolls the per-row stage_ms map into
            # per-task ms_<stage> columns (lineage_frame); the median per
            # task makes stage-level regressions (decode vs blocks vs
            # serialize) diffable across rounds the way query times are.
            # Kept OUT of the timed 1x/10x runs so the map-building
            # overhead never biases the exponent.
            timed = engine.extract_pages(base_pages,
                                         num_partitions=BENCH_PARTS,
                                         with_timings=True)
            srows = engine.lineage_frame(timed).collect()
            stage_cols = [c for c in srows[0].asDict()
                          if c.startswith("ms_")]
            scale_probe["extraction"]["stage_ms_median_per_task"] = {
                c: round(sorted(float(r[c]) for r in srows)
                         [len(srows) // 2], 2)
                for c in sorted(stage_cols)}
        else:
            scale_probe.setdefault("skipped_past_deadline",
                                   []).append("extraction")
    else:
        scale_probe["skipped"] = "time budget exhausted before probe"

    query_secs["extraction_local2"] = round(pair_a["elapsed_low_best"], 3)
    query_secs["extraction_local8"] = round(pair_a["elapsed_high_best"], 3)
    query_secs["extraction_local%d" % CPUS] = round(
        pair_b["elapsed_high_best"], 3)
    spark.stop()

    total = time.perf_counter() - total_t0
    sf = SF_DIR.rstrip("/").split("sf")[-1]

    # full pair samples / curves go to BENCH_DETAIL_r{N}.json; stdout gets
    # ONE compact headline line (the driver captures only a ~2 KB stdout
    # tail — round 3's all-in-one line was truncated mid-JSON and the
    # official record was lost)
    detail_path = _detail_path()
    with open(detail_path, "w") as f:
        json.dump({
            "sf": float(sf) if sf else None,
            "bench_total_wall_sec": round(total, 3),
            "queries": query_secs,
            # first-pass times (warm-pass protocol: the headline number is
            # the SECOND pass; the cold pass stays on record here)
            "queries_cold": query_secs_cold,
            "scale_probe": scale_probe,
            "saturation_curve_docs_per_sec": curve,
            "mp_ceiling_curve_docs_per_sec": mp_curve,
            "pair_2to8": pair_a,
            "pair_8to%d" % CPUS: pair_b,
        }, f, indent=1)

    print(json.dumps({
        "metric": "bench_total_wall",
        "value": round(total, 3),
        "unit": "sec",
        "queries": query_secs,
        "scale_probe_exponents": {
            k: v["exponent"] for k, v in scale_probe.items()
            if isinstance(v, dict)},
        "sf": float(sf) if sf else None,
        "extraction": {
            "bench_docs": pair_b["docs"],
            "bench_parts": BENCH_PARTS,
            "docs_per_sec_local2": pair_a["dps_low_best"],
            "docs_per_sec_local8": curve["8"],
            "docs_per_sec_local%d" % CPUS: pair_b["dps_high_best"],
            # headline: MEDIAN of per-round adjacent-in-time ratios
            "scaling_efficiency_2to8": pair_a["eff_median"],
            "efficiency_rounds": pair_a["round_ratios"],
            "machine_ceiling_efficiency_2to8": pair_a["mp_ceiling"],
            "normalized_scaling_efficiency": pair_a["eff_median_normalized"],
            "scaling_efficiency_8to%d" % CPUS: pair_b["eff_median"],
            "trimmed_scaling_efficiency_8to%d" % CPUS:
                pair_b["eff_trimmed_median"],
            "efficiency_rounds_8to%d" % CPUS: pair_b["round_ratios"],
            "machine_ceiling_efficiency_8to%d" % CPUS: pair_b["mp_ceiling"],
            "normalized_scaling_efficiency_8to%d" % CPUS:
                pair_b["eff_median_normalized"],
            "roundnorm_scaling_efficiency_8to%d" % CPUS:
                pair_b["eff_roundnorm_median"],
            "detail": os.path.basename(detail_path),
        },
    }, separators=(",", ":")))


def _detail_path() -> str:
    """BENCH_DETAIL_r{N}.json next to this file, N = 1 + the highest round
    whose driver artifact (BENCH_r{N}.json) already exists."""
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    rounds = [int(m.group(1)) for name in os.listdir(here)
              if (m := re.match(r"BENCH_r(\d+)\.json$", name))]
    n = max(rounds, default=0) + 1
    return os.path.join(here, "BENCH_DETAIL_r%02d.json" % n)


if __name__ == "__main__":
    main()
