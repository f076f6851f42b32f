"""Training-data pipeline ops: semantic checks that the SQL oracle can't
express (MinHash quality, SimHash hamming, IVF recall, winnowing,
multimodal plumbing)."""

import pytest
from pyspark.sql import functions as F

from crawlfront import analytics

SF = "/root/testdata/sf0.01"


def _jaccard(a: str, b: str, n=3) -> float:
    def sh(t):
        toks = t.split(" ")
        return {" ".join(toks[i : i + n]) for i in range(max(1, len(toks) - n + 1))}

    sa, sb = sh(a), sh(b)
    return len(sa & sb) / len(sa | sb)


def test_minhash_pairs_are_really_similar(spark):
    pairs = analytics.dedup_minhash_lsh(spark, SF).collect()
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    for r in pairs:
        exact = _jaccard(docs[r["a"]], docs[r["b"]])
        assert abs(exact - r["jaccard"]) < 1e-3  # engine's jaccard is exact
        assert r["jaccard"] >= 0.5


def test_minhash_recall_vs_bruteforce(spark):
    """Every pair with true jaccard ≥ 0.8 must be caught by LSH (8 bands ×
    4 rows → P(catch | j=0.8) ≈ 1-(1-0.8^4)^8 ≈ 0.98; the doc corpus is
    small enough to brute-force the truth)."""
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    truth = set()
    ids = sorted(docs)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if _jaccard(docs[a], docs[b]) >= 0.8:
                truth.add((a, b))
    got = {(r["a"], r["b"]) for r in analytics.dedup_minhash_lsh(spark, SF).collect()}
    missed = truth - got
    assert not missed, f"LSH missed high-jaccard pairs: {missed}"


def test_simhash_hamming_exact(spark):
    pairs = analytics.dedup_simhash(spark, SF).limit(50).collect()
    fps = {r["doc_id"]: r["simhash"] for r in analytics.simhash_docs(spark, SF).collect()}
    for r in pairs:
        assert bin(fps[r["a"]] ^ fps[r["b"]]).count("1") == r["hamming"] <= 3


def test_ivf_recall(spark):
    brute = {
        (r["query_id"], r["neighbor_id"])
        for r in analytics.ann_cosine_topk(spark, SF).collect()
    }
    ivf = {
        (r["query_id"], r["neighbor_id"])
        for r in analytics.ann_ivf_topk(spark, SF).collect()
    }
    recall = len(brute & ivf) / len(brute)
    assert recall >= 0.9, recall


def test_ivf_recall_sf01(spark):
    """VERDICT r1 item 7 'done' criterion: IVF recall@5 vs the exact
    baseline ≥0.9 at sf0.1 with the default (√n centroids, nprobe=12,
    n_assign=3) parameters.  The synthetic embeddings are unclustered —
    the hardest case for IVF — so this bounds recall from below for
    clustered production corpora."""
    sf = "/root/testdata/sf0.1"
    brute = {
        (r["query_id"], r["neighbor_id"])
        for r in analytics.ann_cosine_topk(spark, sf).collect()
    }
    ivf = {
        (r["query_id"], r["neighbor_id"])
        for r in analytics.ann_ivf_topk(spark, sf).collect()
    }
    recall = len(brute & ivf) / len(brute)
    assert recall >= 0.9, recall


def test_ivf_prune_forced(spark):
    """The adaptive coarse prune is OFF at fixture scale (est. candidates
    < prune_min_cand), but the prune path must stay correct for the
    corpus sizes that engage it: forcing it on (prune_min_cand=0)
    (a) still holds recall@5 ≥ 0.9 against the exact baseline, and
    (b) with prune_keep ≥ the candidate count it is a provable no-op —
    identical rows to the unpruned plan."""
    brute = {
        (r["query_id"], r["neighbor_id"])
        for r in analytics.ann_cosine_topk(spark, SF).collect()
    }
    forced = analytics.ann_ivf_topk(spark, SF, prune_min_cand=0).collect()
    recall = len(brute & {(r["query_id"], r["neighbor_id"]) for r in forced}) / len(brute)
    assert recall >= 0.9, recall

    wide = analytics.ann_ivf_topk(spark, SF, prune_min_cand=0, prune_keep=10**6)
    plain = analytics.ann_ivf_topk(spark, SF, prune_dims=None)
    assert sorted(map(tuple, wide.collect())) == sorted(map(tuple, plain.collect()))


def test_ann_quant_recall(spark):
    """Int8 scalar-quantized brute force (ann_quant_topk — the scoring
    kernel of the IVF quant tier and its own contract key) vs the
    float-exact baseline: quantizing 64 dims to int8 must keep recall@5
    ≥ 0.9 (measured ~1.0: the ~1e-2 cosine resolution loss is far below
    typical neighbor gaps even on unclustered embeddings)."""
    brute = {
        (r["query_id"], r["neighbor_id"])
        for r in analytics.ann_cosine_topk(spark, SF).collect()
    }
    quant = {
        (r["query_id"], r["neighbor_id"])
        for r in analytics.ann_quant_topk(spark, SF).collect()
    }
    recall = len(brute & quant) / len(brute)
    assert recall >= 0.9, recall


def test_ivf_quant_forced(spark):
    """The int8 coarse tier (quant_min_cand) is OFF at fixture scale;
    forcing it on must (a) hold recall@5 ≥ 0.9 against the exact
    baseline and (b) be a provable no-op when prune_keep exceeds the
    candidate count — identical rows to the unpruned plan (the int8
    coarse RANKING may only ever drop candidates, never perturb the
    exact float rerank's scores)."""
    brute = {
        (r["query_id"], r["neighbor_id"])
        for r in analytics.ann_cosine_topk(spark, SF).collect()
    }
    forced = analytics.ann_ivf_topk(spark, SF, quant_min_cand=0).collect()
    recall = len(brute & {(r["query_id"], r["neighbor_id"]) for r in forced}) / len(brute)
    assert recall >= 0.9, recall

    wide = analytics.ann_ivf_topk(spark, SF, quant_min_cand=0, prune_keep=10**6)
    plain = analytics.ann_ivf_topk(spark, SF, prune_dims=None)
    assert sorted(map(tuple, wide.collect())) == sorted(map(tuple, plain.collect()))


def test_simhash_band_width_scales(spark):
    """Scale guard (VERDICT r1 item 6): 15-bit band keys — the candidate
    space per band is 32768 buckets, and fingerprints use all 60 bits."""
    from crawlfront.analytics import SIMHASH_BAND_BITS, SIMHASH_BANDS, SIMHASH_BITS

    assert SIMHASH_BITS == 60 and SIMHASH_BANDS == 4 and SIMHASH_BAND_BITS == 15
    fps = [r["simhash"] for r in analytics.simhash_docs(spark, SF).limit(200).collect()]
    assert all(0 <= f < 2**60 for f in fps)
    assert any(f >= 2**32 for f in fps)  # actually uses the high bits


def test_simhash_hot_bucket_guard_bounds_candidates(spark, tmp_path):
    """Adversarial near-dup-heavy corpus (VERDICT r2 item 1): 320 docs
    with IDENTICAL text all hash to the same (band, key) in every band —
    unguarded, the within-bucket self-join emits 320·319/2 = 51040
    candidate pairs from ONE key in ONE task; at 10^10 docs that single
    key is the n² explosion.  With the max_bucket guard the hot buckets
    are dropped before the join, while genuinely-near pairs living in
    small buckets are still found."""
    texts = [(i, "all rights reserved copyright boilerplate footer text here", "en")
             for i in range(320)]
    # two near-dup pairs in cold buckets (distinct token tails → distinct keys)
    texts += [
        (1000, "quick brown fox jumps over the lazy dog near the river bank", "en"),
        (1001, "quick brown fox jumps over the lazy dog near the river bend", "en"),
        (1002, "completely different subject matter about spark shuffles and joins", "en"),
    ]
    df = spark.createDataFrame(
        [(i, t, lang, "adv", len(t)) for i, t, lang in texts],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    adv = str(tmp_path / "adv")
    df.coalesce(1).write.parquet(f"{adv}/documents.parquet")

    guarded = analytics.dedup_simhash(spark, adv).collect()
    # the 320-identical cluster is suppressed: every band bucket it owns
    # has pop=320 > 100, so zero of its 51040 pairs survive
    hot_ids = set(range(320))
    assert not [r for r in guarded if r["a"] in hot_ids and r["b"] in hot_ids]
    assert len(guarded) < 100  # bounded output, not O(hot²)

    unguarded = analytics.dedup_simhash(spark, adv, max_bucket=10**9)
    n_hot = unguarded.filter((F.col("a") < 320) & (F.col("b") < 320)).count()
    assert n_hot == 320 * 319 // 2  # what the guard is protecting against

    # recall in cold buckets is untouched: the near-dup pair is found
    # identically with and without the guard
    cold = {(r["a"], r["b"]) for r in guarded if r["a"] >= 1000}
    cold_un = {(r["a"], r["b"])
               for r in unguarded.filter(F.col("a") >= 1000).collect()}
    assert cold == cold_un


def test_winnow_shared_fingerprints_detect_overlap(spark):
    """Two docs sharing a long substring share winnow fingerprints."""
    fp = analytics.winnow_fingerprints(spark, SF)
    # every doc has at least one fingerprint
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert fp.select("doc_id").distinct().count() == n_docs


def test_pipeline_clean_corpus(spark):
    """The flagship cleaning pipeline, cross-checked stage by stage
    against the independently oracle-verified quality_score / lang_id
    queries: the kept set is EXACTLY min-doc_id-per-head-fingerprint
    over the (en ∧ quality ≥ 0.6) slice (the sf0.01 slice has no exact
    text dups, so stage 3 is identity and stage 4 fully determines it)."""
    out = analytics.pipeline_clean_corpus(spark, SF).collect()
    texts = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    quality = {r["doc_id"]: r["quality"] for r in analytics.quality_score(spark, SF).collect()}
    lang = {r["doc_id"]: r["pred_lang"] for r in analytics.lang_id(spark, SF).collect()}
    passing = sorted(d for d in texts if lang[d] == "en" and quality[d] >= 0.6)
    assert len(set(texts[d] for d in passing)) == len(passing)  # no exact dups
    expect_kept = {}
    for d in passing:  # ascending doc_id → first seen is the min
        expect_kept.setdefault(texts[d][:100], d)
    assert {r["doc_id"] for r in out} == set(expect_kept.values())
    assert len(out) < len(passing)  # dedup actually pruned something
    assert all(0 <= r["shard"] < 8 for r in out)
    assert all(r["quality"] == quality[r["doc_id"]] for r in out)


def test_dedup_clusters_closure(spark):
    """Label propagation reaches the transitive closure of the verified
    pair graph at sf0.01 (cluster diameters < rounds): every pair lands
    in one cluster, the canonical member is the cluster min, and
    singletons keep their own id."""
    pairs = [(r["a"], r["b"]) for r in analytics.dedup_minhash_lsh(spark, SF).collect()]
    got = {r["doc_id"]: (r["cluster_id"], r["is_kept"])
           for r in analytics.dedup_clusters(spark, SF).collect()}
    # union-find ground truth
    parent = {d: d for d in got}
    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    for a, b in pairs:
        parent[find(a)] = find(b)
    from collections import defaultdict
    comp = defaultdict(list)
    for d in got:
        comp[find(d)].append(d)
    assert len(pairs) > 0
    for members in comp.values():
        canon = min(members)
        for d in members:
            cid, kept = got[d]
            assert cid == canon, (d, cid, canon)
            assert kept == (d == canon)


def test_min_label_closure_beats_unrolled_on_deep_chain(spark):
    """Fixed-point loop (VERDICT r2 item 4): on a diameter-6 chain the
    3-round unrolled propagation provably stops short, the semi-naive
    converge-until-stable loop reaches the exact union-find components."""
    # chain 10–16 (diameter 6), triangle 30-31-32, singleton 99
    raw = [(10 + i, 11 + i) for i in range(6)] + [(30, 31), (31, 32), (30, 32)]
    nodes = sorted({x for e in raw for x in e} | {99})
    edges = spark.createDataFrame(
        [(a, b) for a, b in raw] + [(b, a) for a, b in raw], "a long, b long"
    )
    labels = spark.createDataFrame([(n, n) for n in nodes],
                                   "doc_id long, cluster_id long")
    out, rounds = analytics.min_label_closure(labels, edges)
    got = {r["doc_id"]: r["cluster_id"] for r in out.collect()}
    expect = {n: 10 for n in range(10, 17)} | {30: 30, 31: 30, 32: 30, 99: 99}
    assert got == expect
    assert rounds > 3  # the chain genuinely needs more than the unroll depth

    # and the 3-round unrolled step (the contract-query shape) is WRONG here:
    lab3 = labels
    for _ in range(3):
        lab3 = analytics._min_label_round(lab3, edges)
    got3 = {r["doc_id"]: r["cluster_id"] for r in lab3.collect()}
    assert got3[16] != 10  # tail of the chain not yet reached — why the loop exists


def test_dedup_clusters_converged_matches_unrolled_at_sf001(spark):
    """At sf0.01 cluster diameters are within the unroll depth, so the
    fixed-point variant must agree with the contract query exactly."""
    a = {(r["doc_id"], r["cluster_id"], r["is_kept"])
         for r in analytics.dedup_clusters(spark, SF).collect()}
    b = {(r["doc_id"], r["cluster_id"], r["is_kept"])
         for r in analytics.dedup_clusters_converged(spark, SF).collect()}
    assert a == b


def test_pagerank_fixed_point_converges(spark):
    """Integer PageRank fixed point: iterating the exact same integer
    recurrence in pure Python reaches the same ranks, and one more Spark
    round leaves every rank unchanged."""
    raw = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "c")]
    hosts = sorted({x for e in raw for x in e})
    edges = spark.createDataFrame(raw, "src string, dst string")
    deg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    e2 = edges.join(deg, "src")
    nodes = spark.createDataFrame([(h,) for h in hosts], "host string")
    ranks, iters = analytics.pagerank_fixed_point(nodes, e2)
    got = {r["host"]: r["r"] for r in ranks.collect()}

    # pure-python twin of the integer recurrence, looped to ITS fixed point
    outdeg = {}
    for s, _ in raw:
        outdeg[s] = outdeg.get(s, 0) + 1
    r = {h: 1_000_000 for h in hosts}
    for _ in range(200):
        nxt = {h: 150_000 for h in hosts}
        for s, d in raw:
            nxt[d] += (r[s] * 85 // 100) // outdeg[s]
        if nxt == r:
            break
        r = nxt
    assert got == r
    assert 1 < iters < 100


def test_pagerank_twin_unroll_margin(spark):
    """The g1b_pagerank_converged DuckDB twin is a static unroll
    (PR_TWIN_UNROLL rounds); it equals the converge-until-stable engine
    loop only while the loop's fixed point lands safely inside that
    depth.  Pin the margin so fixture drift that slows convergence
    fails here instead of as an opaque contract hash mismatch."""
    import __spark_entry__ as e
    from crawlfront import ops
    from pyspark.sql import functions as F

    links = e._discovered_links(spark, "/root/testdata/sf0.01")
    edges = links.select("src", ops.host_of("url_norm").alias("dst")).distinct()
    nodes = (edges.select(F.col("src").alias("host"))
             .unionByName(edges.select(F.col("dst").alias("host"))).distinct())
    deg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    _, iters = analytics.pagerank_fixed_point(nodes, edges.join(deg, "src"))
    assert iters + 4 <= e.PR_TWIN_UNROLL, (iters, e.PR_TWIN_UNROLL)


def test_paragraph_dedup_semantics(spark, tmp_path):
    """Chunk-level dedup: a full copy of an earlier doc loses every
    chunk (dup_ratio 1.0, kept text empty), a doc sharing only its
    boilerplate prefix loses exactly that chunk, and unique docs keep
    everything."""
    import hashlib

    boiler = " ".join(f"b{i}" for i in range(10))  # exactly one 10-token chunk
    uniq_a = " ".join(f"a{i}" for i in range(25))
    uniq_b = " ".join(f"c{i}" for i in range(20))
    texts = [
        (1, uniq_a),                     # 3 chunks (25 toks), all kept
        (2, uniq_a),                     # full copy → everything dup
        (3, boiler + " " + uniq_b),      # 3 chunks, chunk 0 == doc 4's chunk 0
        (4, boiler + " " + "z0 z1 z2 z3 z4 z5 z6 z7 z8 z9"),
    ]
    df = spark.createDataFrame(
        [(i, t, "en", "t", len(t)) for i, t in texts],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = str(tmp_path / "pd")
    df.coalesce(1).write.parquet(f"{d}/documents.parquet")
    rows = {r["doc_id"]: r for r in analytics.paragraph_dedup(spark, d).collect()}
    assert rows[1]["n_dup_chunks"] == 0 and rows[1]["dup_ratio"] == 0.0
    assert rows[2]["dup_ratio"] == 1.0 and rows[2]["n_dup_chunks"] == rows[2]["n_chunks"]
    assert rows[2]["kept_md5"] == hashlib.md5(b"").hexdigest()
    # doc 3 keeps the boilerplate chunk (it is the min (doc_id, pos)
    # owner); doc 4 loses exactly it
    assert rows[3]["n_dup_chunks"] == 0
    assert rows[4]["n_dup_chunks"] == 1 and rows[4]["n_chunks"] == 2
    kept4 = "z0 z1 z2 z3 z4 z5 z6 z7 z8 z9"
    assert rows[4]["kept_md5"] == hashlib.md5(kept4.encode()).hexdigest()
    # corpus-level sanity at sf0.01: every doc present, ratios bounded
    corpus = analytics.paragraph_dedup(spark, SF).collect()
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert len(corpus) == n_docs
    assert all(0.0 <= r["dup_ratio"] <= 1.0 for r in corpus)


def test_decontaminate_semantics(spark, tmp_path):
    """8-gram benchmark decontamination: bench-source docs self-hit with
    exactly their prefix shingle count, a doc embedding a verbatim run
    of bench text hits exactly the windows inside the run, clean docs
    are absent."""
    t = [f"t{i}" for i in range(40)]   # doc 0 — bench source (0 % 97 == 0)
    w = [f"w{i}" for i in range(10)]   # doc 97 — bench source, short
    doc2 = [f"u{i}" for i in range(5)] + t[5:16] + [f"v{i}" for i in range(5)]
    texts = [
        (0, " ".join(t)),
        (1, " ".join(f"x{i}" for i in range(20))),   # clean
        (2, " ".join(doc2)),                          # copies t5..t15
        (97, " ".join(w)),
    ]
    df = spark.createDataFrame(
        [(i, s, "en", "t", len(s)) for i, s in texts],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = str(tmp_path / "dc")
    df.coalesce(1).write.parquet(f"{d}/documents.parquet")
    rows = {r["doc_id"]: r["n_hits"]
            for r in analytics.decontaminate(spark, d).collect()}
    # doc 0: bench prefix = t0..t29 → 23 shingles, all inside the doc
    # doc 2: the 11-token copied run holds 4 full 8-gram windows
    # doc 97: 10 tokens → 3 shingles, all bench
    assert rows == {0: 23, 2: 4, 97: 3}

    # corpus-level invariant at sf0.01: every bench-source doc self-hits
    res = {r["doc_id"]: r["n_hits"] for r in analytics.decontaminate(spark, SF).collect()}
    bench_ids = [r["doc_id"] for r in spark.read.parquet(f"{SF}/documents.parquet")
                 .filter("doc_id % 97 = 0").select("doc_id").collect()]
    assert bench_ids and all(res.get(i, 0) >= 1 for i in bench_ids)


def test_pii_scrub_counts(spark):
    """URL spans are dense in the fixture html (every href); emails and
    phones are absent; the scrub hash must differ from the raw hash
    exactly when something was replaced."""
    from crawlfront.fixtures import fixture_dir_for_sf
    from crawlfront.frontier import scan_pages
    from pyspark.sql import functions as F

    pages = scan_pages(spark, str(fixture_dir_for_sf(0.01))).limit(200)
    out = analytics.pii_scrub(spark, pages)
    joined = out.join(
        pages.select("url", F.md5(F.decode("html", "utf-8")).alias("raw_md5")), "url"
    ).collect()
    assert all(r["n_emails"] == 0 and r["n_phones"] == 0 for r in joined)
    assert any(r["n_urls"] > 0 for r in joined)
    for r in joined:
        assert (r["scrubbed_md5"] != r["raw_md5"]) == (r["n_urls"] > 0)


def test_pii_scrub_replaces_all_three_span_kinds(spark):
    """Fixture pages carry no emails/phones, so pin the replacement
    semantics on a synthetic page containing all three span kinds: every
    counter fires AND every span is redacted in the hashed text (r3
    counted phones but left them in — the gap this pins shut)."""
    import hashlib

    body = ("contact bob@example.com or +1 555-123-4567 / 555 123 4567, "
            'see https://ex.com/a?b=1 end')
    pages = spark.createDataFrame([("u1", body.encode())], "url string, html binary")
    r = analytics.pii_scrub(spark, pages).collect()[0]
    assert r["n_emails"] == 1 and r["n_urls"] == 1
    assert r["n_phones"] == 2  # with and without the +NNN prefix form
    expect = ("contact <EMAIL> or +1 <PHONE> / <PHONE>, see <URL> end")
    assert r["scrubbed_md5"] == hashlib.md5(expect.encode()).hexdigest()


def test_parse_media_dims_headers():
    """Real stdlib header decode (VERDICT r2 item 3): PNG IHDR, GIF LSD,
    JPEG SOF behind variable-length segments; adversarial bytes return
    None instead of looping or raising."""
    import numpy as np

    from crawlfront.fixtures import _gif_blob, _jpeg_blob, _png_blob, _wav_blob, _webp_blob

    rng = np.random.default_rng(7)
    assert analytics.parse_media_dims(_png_blob(rng, 1234, 777)) == ("png", 1234, 777)
    assert analytics.parse_media_dims(_gif_blob(rng, 320, 200)) == ("gif", 320, 200)
    for _ in range(20):  # random COM-segment counts → SOF at varying offsets
        w, h = int(rng.integers(1, 65000)), int(rng.integers(1, 65000))
        assert analytics.parse_media_dims(_jpeg_blob(rng, w, h)) == ("jpeg", w, h)
    # WebP: all three bitstream variants (14-bit dims for VP8/VP8L)
    for variant in (0, 1, 2):
        w, h = int(rng.integers(1, 16383)), int(rng.integers(1, 16383))
        assert analytics.parse_media_dims(_webp_blob(rng, w, h, variant)) == \
            ("webp", w, h), variant
    assert analytics.parse_media_dims(_wav_blob(rng, 44100, 2)) == ("wav", 44100, 2)
    assert analytics.parse_media_dims(b"<html><body>x</body></html>") is None
    assert analytics.parse_media_dims(b"") is None
    assert analytics.parse_media_dims(b"\x89PNG\r\n\x1a\x00junk") is None
    # truncated JPEG, zero-length segment (walk must terminate), EOI-first
    assert analytics.parse_media_dims(b"\xff\xd8\xff\xe0") is None
    assert analytics.parse_media_dims(b"\xff\xd8" + b"\xff\xfe\x00\x00" * 100) is None
    assert analytics.parse_media_dims(b"\xff\xd8\xff\xd9" + b"\x00" * 16) is None
    # RIFF look-alikes: unknown form, truncated WebP, AVI, bad VP8 sync
    assert analytics.parse_media_dims(b"RIFF\x04\x00\x00\x00JUNK") is None
    assert analytics.parse_media_dims(b"RIFF\x04\x00\x00\x00WEBPVP8 ") is None
    assert analytics.parse_media_dims(b"RIFF\x04\x00\x00\x00AVI LIST" + b"\x00" * 24) is None
    bad = bytearray(_webp_blob(rng, 10, 10, 0)); bad[23] = 0x00
    assert analytics.parse_media_dims(bytes(bad)) is None


def test_multimodal_plumbing(spark):
    from crawlfront.fixtures import generate_media_fixtures

    media = spark.read.parquet(str(generate_media_fixtures(0.01)))
    meta = analytics.multimodal_meta(spark, media)
    rows = meta.collect()
    assert all(r["n_bytes"] > 0 for r in rows)
    assert any(r["is_html"] for r in rows)
    by_kind = {}
    for r in rows:
        by_kind.setdefault(r["kind"], []).append(r)
    # every media container present and decoded with REAL header fields
    for kind in ("png", "gif", "jpeg", "webp", "wav"):
        assert by_kind[kind] and all(r["decoded"] for r in by_kind[kind])
    for kind in ("html", "bin"):
        assert by_kind[kind] and not any(r["decoded"] for r in by_kind[kind])
    # spot-check against the pure parser on the raw bytes
    raw = {r["url"]: bytes(r["html"]) for r in media.collect()}
    for r in rows:
        expect = analytics.parse_media_dims(raw[r["url"]])
        if r["decoded"]:
            assert expect == (r["kind"], r["width"], r["height"])
        else:
            assert expect is None
            assert (r["width"], r["height"]) == (r["n_bytes"] % 640, r["n_bytes"] % 480)


def test_global_index_dense_and_ordered(spark):
    df = spark.range(0, 10_000).withColumn("k", (F.col("id") * 37) % 1000)
    out = analytics.global_index(df, ["k", "id"], n_partitions=8).collect()
    idx_by_key = sorted(out, key=lambda r: (r["k"], r["id"]))
    assert [r["global_idx"] for r in idx_by_key] == list(range(10_000))
