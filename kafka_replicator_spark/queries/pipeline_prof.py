"""Corpus-profiling query registrations (functions/textprof.py): readability,
vocabulary growth, Zipf fit, perplexity profile, language-ID confusion —
plus the similarity/dedup/sampling additions of the same build round
(label-blocked kNN graph, embedding stats, MinHash containment, epoch plan).

Reference parity: the reference engine (CrowdStrike/kafka-replicator) has no
token-level surface — these extend the training-data-pipeline family on the
documents/embeddings tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kafka_replicator_spark.functions import dedup, graph, packing, sampling, scoring, similarity, textprof
from kafka_replicator_spark.functions.hashing import portable_hash32_sql
from kafka_replicator_spark.queries import register
from kafka_replicator_spark.sources.tables import load_table


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings")


@register(
    "p_readability",
    textprof.readability_sql(),
    tags=("pipeline", "quality"),
    doc="vowel-group syllable heuristic readability: syllable totals, "
    "monosyllable share, FORCAST-style grade in exact integer milli-units; "
    "map-only column math (a scan-time projection at 100 TB)",
)
def q_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textprof.readability(_docs(spark, sf_dir))


@register(
    "p_vocab_growth",
    textprof.vocab_growth_sql(),
    tags=("pipeline", "quality"),
    doc="Heaps'-law vocabulary growth per source: tokens, types, pointwise "
    "exponent ln(types)/ln(tokens) — domain saturation signal for corpus "
    "mixing; one explode + one partial-aggregated groupBy(source)",
)
def q_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textprof.vocab_growth(_docs(spark, sf_dir))


@register(
    "p_zipf_slope",
    textprof.zipf_slope_sql(),
    tags=("pipeline", "quality"),
    doc="Zipf's-law OLS fit (ln freq vs ln rank) over the distributed "
    "top-k vocabulary; window confined to the k surviving rows, regression "
    "moments folded as DECIMAL for order-independent exactness",
)
def q_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textprof.zipf_slope(_docs(spark, sf_dir))


@register(
    "p_perplexity_profile",
    textprof.perplexity_profile_sql(),
    tags=("pipeline", "quality"),
    doc="per-source surprise-bucket histogram of bigram-LM perplexity "
    "(CCNet-style source quality dashboard); builds on the add-one bigram "
    "LM, per-doc perplexities folded as DECIMAL",
)
def q_perplexity_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textprof.perplexity_profile(_docs(spark, sf_dir))


@register(
    "p_lang_confusion",
    textprof.lang_confusion_sql(),
    tags=("pipeline", "quality"),
    doc="language-ID confusion matrix (marker heuristic vs labels) with "
    "per-label routing shares via a broadcast totals join — |langs|^2 "
    "output rows at any corpus size",
)
def q_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textprof.lang_confusion(_docs(spark, sf_dir))


@register(
    "p_knn_graph",
    similarity.label_knn_graph_sql(),
    tags=("pipeline", "similarity"),
    doc="label-blocked exact kNN graph: integer micro-unit squared L2, "
    "top-k edges per vector via a per-vector rank window confined to the "
    "block (the IVF-cell/LSH-bucket shape of the ANN family — no "
    "all-pairs stage)",
)
def q_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.label_knn_graph(_emb(spark, sf_dir))


@register(
    "p_embedding_stats",
    similarity.embedding_stats_sql(),
    tags=("pipeline", "similarity"),
    doc="per-label embedding stats: mean vector norm (DECIMAL fold of "
    "exact micro-unit norms) and centroid norm (integer-micro mean "
    "components, the kmeans convention) — the embedding-collapse dashboard",
)
def q_embedding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.embedding_stats(_emb(spark, sf_dir))


@register(
    "p_minhash_containment",
    dedup.minhash_containment_sql(),
    tags=("pipeline", "dedup"),
    doc="asymmetric containment dedup: exact shingle containment "
    "(|A∩B|/|A| both directions) computed only over LSH candidate pairs — "
    "catches short-in-long duplicates Jaccard under-scores",
)
def q_minhash_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.minhash_containment(_docs(spark, sf_dir))


@register(
    "p_epoch_plan",
    sampling.epoch_plan_sql(),
    tags=("pipeline", "sampling"),
    doc="per-source epoch/upsampling plan toward a uniform token budget: "
    "full epochs + residual-ppm sample per source, exact BIGINT arithmetic "
    "over one token-count aggregation + a broadcast totals frame",
)
def q_epoch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sampling.epoch_plan(_docs(spark, sf_dir))


@register(
    "p_cross_source_overlap",
    dedup.cross_source_overlap_sql(),
    tags=("pipeline", "dedup"),
    doc="source-pair n-gram leakage matrix (shared distinct 8-grams + "
    "overlap coefficient): DISTINCT (source, hash) collapse bounds the "
    "self-join fan-out by the source count — sources^2 output at any "
    "corpus size",
)
def q_cross_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.cross_source_overlap(_docs(spark, sf_dir))


@register(
    "p_dedup_best_quality",
    dedup.dedup_best_quality_sql(),
    tags=("pipeline", "dedup"),
    doc="exact dedup with quality-aware survivor choice (max quality_score "
    "per content hash, rank window keyed by the hash — duplicate-group-"
    "sized partitions)",
)
def q_dedup_best_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.dedup_best_quality(_docs(spark, sf_dir))


@register(
    "p_length_quantiles",
    textprof.length_quantiles_sql(),
    tags=("pipeline", "quality"),
    doc="per-source exact length quartiles (sort-based percentile, "
    "power-of-two fractions so interpolation is bit-identical cross-engine)",
)
def q_length_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textprof.length_quantiles(_docs(spark, sf_dir))


@register(
    "p_graph_pagerank",
    graph.pagerank_fixed_sql(
        "SELECT vec_id, neighbor_id FROM ("
        + similarity.label_knn_graph_sql()
        + ") knn"
    ),
    tags=("pipeline", "graph"),
    doc="fixed-iteration PageRank over the label-blocked kNN graph "
    "(join-based synchronous iterations, DECIMAL contribution folds — "
    "|E| shuffle per round, no driver state); centrality for "
    "representative-document selection",
)
def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_replicator_spark.functions.graph import pagerank_fixed

    edges = similarity.label_knn_graph(_emb(spark, sf_dir)).select(
        "vec_id", "neighbor_id"
    )
    return pagerank_fixed(edges)


#: probe vectors of the retrieval-quality evaluation (matches p_ann_topk)
_PRECISION_PROBES = [0, 1, 2, 3, 4, 5, 6, 7]


@register(
    "p_ann_label_precision",
    f"""
WITH ann AS ({similarity.ann_topk_sql(_PRECISION_PROBES, k=5, n_planes=4, dim=64)}),
lbl AS (SELECT vec_id, label FROM embeddings),
j AS (
  SELECT ann.probe_id, pl.label AS probe_label,
         CASE WHEN nl.label = pl.label THEN 1 ELSE 0 END AS hit
  FROM ann
  JOIN lbl pl ON pl.vec_id = ann.probe_id
  JOIN lbl nl ON nl.vec_id = ann.neighbor_id
)
SELECT probe_id, CAST(probe_label AS INTEGER) AS probe_label,
       CAST(count(*) AS BIGINT) AS n_neighbors,
       CAST(sum(hit) AS BIGINT) AS n_same_label,
       round(CAST(sum(hit) AS DOUBLE) / count(*), 6) AS precision_at_k
FROM j GROUP BY probe_id, probe_label
""",
    tags=("pipeline", "similarity", "eval"),
    doc="retrieval-quality evaluation: label precision@k of the LSH-"
    "bucketed ANN top-k (fraction of retrieved neighbors sharing the "
    "probe's class) — the recall/precision dashboard an ANN index ships "
    "with; labels ride two broadcast joins",
)
def q_ann_label_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    emb = _emb(spark, sf_dir)
    ann = similarity.ann_topk(emb, _PRECISION_PROBES, k=5, n_planes=4, dim=64)
    lbl = emb.select("vec_id", "label")
    # explicit probe bound: the projection is ≤ |probes| rows by
    # construction, not by relying on constraint propagation across the
    # ann join — safe to broadcast at any corpus size
    pl = lbl.filter(F.col("vec_id").isin(_PRECISION_PROBES)).select(
        F.col("vec_id").alias("probe_id"), F.col("label").alias("probe_label")
    )
    nl = lbl.select(F.col("vec_id").alias("neighbor_id"), F.col("label").alias("n_label"))
    # Probe-grain broadcast (≤ probes×k rows), never the corpus-scale label
    # projections (VERDICT r06 #1).
    j = F.broadcast(ann.join(pl, "probe_id")).join(nl, "neighbor_id")
    hit = F.when(F.col("n_label") == F.col("probe_label"), 1).otherwise(0)
    return j.groupBy("probe_id", F.col("probe_label").cast("int").alias("probe_label")).agg(
        F.count(F.lit(1)).alias("n_neighbors"),
        F.sum(hit).alias("n_same_label"),
        F.round(F.sum(hit) / F.count(F.lit(1)), 6).alias("precision_at_k"),
    )


@register(
    "p_stopword_profile",
    textprof.stopword_profile_sql(),
    tags=("pipeline", "quality"),
    doc="per-(source, lang) stopword share: map-side array math per doc, "
    "one (source, lang)-grain aggregation — the domain-level boilerplate "
    "collapse signal",
)
def q_stopword_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textprof.stopword_profile(_docs(spark, sf_dir))


@register(
    "p_winnowing",
    dedup.winnowing_sql(),
    tags=("pipeline", "dedup"),
    doc="winnowing fingerprint selection (Schleimer et al. 2003, the MOSS "
    "primitive): per-window minimum of positional n-gram hashes — any "
    "match of length >= w+n-1 tokens shares a fingerprint at ~2/(w+1) "
    "storage; pure per-doc array math, map-only",
)
def q_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.winnowing(_docs(spark, sf_dir))


@register(
    "p_uniform_sample",
    sampling.uniform_sample_sql(),
    tags=("pipeline", "sampling"),
    doc="deterministic uniform sample without replacement: k smallest "
    "portable hashes via distributed TakeOrdered (per-partition top-k + "
    "driver heap merge — never a global sort); mergeable by re-taking "
    "the k smallest",
)
def q_uniform_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sampling.uniform_sample(_docs(spark, sf_dir))


@register(
    "p_cond_entropy",
    scoring.cond_entropy_sql(),
    tags=("pipeline", "quality"),
    doc="corpus conditional bigram entropy H(next|prev) in nats — the "
    "information-rate scalar (templated vs diverse corpus); left-marginals "
    "aggregate FROM the pair counts so the second shuffle is "
    "vocabulary-sized, DECIMAL term folds",
)
def q_cond_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    return scoring.cond_entropy(_docs(spark, sf_dir))


@register(
    "p_coreset_select",
    similarity.coreset_select_sql(),
    tags=("pipeline", "similarity", "sampling"),
    doc="coreset/representative selection: nearest member per coarse IVF "
    "cell (broadcast assignment pass + cell-keyed rank window) — the "
    "medoid set a data-pruning pipeline trains on; one output row per "
    "cell at any corpus size",
)
def q_coreset_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.coreset_select(_emb(spark, sf_dir))


@register(
    "p_span_corruption",
    textprof.span_corruption_sql(),
    tags=("pipeline", "sampling"),
    doc="T5-style span-corruption planning: hash-gated span starts, "
    "3-token spans unioned per doc, mask stats in exact integers — "
    "RNG-free so any engine or resumed job reproduces the mask; map-only",
)
def q_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textprof.span_corruption(_docs(spark, sf_dir))


@register(
    "p_dedup_funnel",
    f"""
WITH cand AS ({dedup.lsh_candidate_pairs_sql()}),
conf AS ({dedup.jaccard_pairs_sql(threshold=0.5)})
SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_docs,
       (SELECT CAST(count(DISTINCT md5(text)) AS BIGINT) FROM documents) AS n_exact_unique,
       (SELECT CAST(count(*) AS BIGINT) FROM cand) AS n_candidate_pairs,
       (SELECT CAST(count(*) AS BIGINT) FROM conf) AS n_confirmed_pairs
""",
    tags=("pipeline", "dedup"),
    doc="end-to-end dedup funnel report (1 row): corpus size, exact-unique "
    "contents, LSH candidate pairs, Jaccard-confirmed pairs — the "
    "pipeline-health dashboard every dedup run publishes",
)
def q_dedup_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from kafka_replicator_spark.cacheutil import track_cached

    docs = _docs(spark, sf_dir)
    # one shingling explode feeds BOTH the LSH candidate stage and the
    # exact-Jaccard stage (the shingles= sharing of minhash_containment)
    sh = track_cached(dedup.word_ngrams(docs))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    n_exact = docs.agg(
        F.count_distinct(F.md5(F.col("text"))).alias("n_exact_unique")
    )
    n_cand = dedup.lsh_candidate_pairs(docs, shingles=sh).agg(
        F.count(F.lit(1)).alias("n_candidate_pairs")
    )
    n_conf = dedup.jaccard_pairs(docs, threshold=0.5, shingles=sh).agg(
        F.count(F.lit(1)).alias("n_confirmed_pairs")
    )
    return (
        n_docs.join(F.broadcast(n_exact))
        .join(F.broadcast(n_cand))
        .join(F.broadcast(n_conf))
    )


@register(
    "p_charngram_langid",
    textprof.charngram_langid_sql(),
    tags=("pipeline", "quality"),
    doc="profile-based language ID (Cavnar-Trenkle n-gram shape): "
    "self-supervised top-k char-trigram profiles per labeled language, "
    "docs classified by distinct-trigram overlap; profiles broadcast, "
    "rank windows keyed per lang / per doc",
)
def q_charngram_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textprof.charngram_langid(_docs(spark, sf_dir))


@register(
    "p_tfidf_topterm_pairs",
    packing.tfidf_topterm_pairs_sql(),
    tags=("pipeline", "dedup", "similarity"),
    doc="sparse-retrieval blocking: candidate pairs sharing a top-TF-IDF "
    "term (high-IDF keys keep posting lists short where naive token "
    "blocking explodes on stopwords); shared-term counts + min-score fold",
)
def q_tfidf_topterm_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return packing.tfidf_topterm_pairs(_docs(spark, sf_dir))


@register(
    "p_dataset_split",
    packing.dataset_split_sql(),
    tags=("pipeline", "sampling"),
    doc="deterministic train/val/test split (98/1/1 by document hash — a "
    "pure function of identity, so reruns and incremental batches agree); "
    "per-(source, split) doc/token counts, map-only + one aggregation",
)
def q_dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    return packing.dataset_split(_docs(spark, sf_dir))


@register(
    "p_shard_plan",
    packing.shard_plan_sql(),
    tags=("pipeline", "packing"),
    doc="token-budget shard planner: exact exclusive running token sum via "
    "range partition + partition-local cumsum + broadcast prefix stitch "
    "(never a global single-partition window); shard-grain output",
)
def q_shard_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    return packing.shard_plan(_docs(spark, sf_dir))


@register(
    "p_doc_dup_category",
    f"""
WITH hashes AS (
  SELECT doc_id, source, md5(text) AS h FROM documents
),
grp AS (SELECT h, count(*) AS n_copies FROM hashes GROUP BY h),
near AS (
  SELECT DISTINCT doc_id FROM (
    SELECT doc_a AS doc_id FROM ({dedup.lsh_candidate_pairs_sql()})
    UNION ALL
    SELECT doc_b AS doc_id FROM ({dedup.lsh_candidate_pairs_sql()})
  )
),
cat AS (
  SELECT hashes.source,
         CASE WHEN grp.n_copies >= 2 THEN 'exact'
              WHEN near.doc_id IS NOT NULL THEN 'near'
              ELSE 'unique' END AS category
  FROM hashes
  JOIN grp USING (h)
  LEFT JOIN near ON near.doc_id = hashes.doc_id
)
SELECT source, category, CAST(count(*) AS BIGINT) AS n_docs
FROM cat GROUP BY source, category
""",
    tags=("pipeline", "dedup"),
    doc="per-source duplication triage: every document classified exact-dup "
    "(content-hash group >= 2) / near-dup (appears in an LSH candidate "
    "pair) / unique, with exact taking precedence — the 'how dirty is this "
    "domain' report that drives curation priorities",
)
def q_doc_dup_category(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    docs = _docs(spark, sf_dir)
    hashes = docs.select("doc_id", "source", F.md5(F.col("text")).alias("h"))
    grp = hashes.groupBy("h").agg(F.count(F.lit(1)).alias("n_copies"))
    pairs = dedup.lsh_candidate_pairs(docs)
    near = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .union(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
        .withColumn("is_near", F.lit(1))
    )
    cat = (
        hashes.join(grp, "h")
        .join(near, "doc_id", "left")
        .select(
            "source",
            F.when(F.col("n_copies") >= 2, "exact")
            .when(F.col("is_near").isNotNull(), "near")
            .otherwise("unique")
            .alias("category"),
        )
    )
    return cat.groupBy("source", "category").agg(F.count(F.lit(1)).alias("n_docs"))


@register(
    "p_token_len_histogram",
    """
WITH toks AS (
  SELECT length(unnest(string_split(text, ' '))) AS len FROM documents
),
hist AS (SELECT len, CAST(count(*) AS BIGINT) AS n_tokens FROM toks GROUP BY len),
tot AS (SELECT sum(n_tokens) AS t FROM hist)
SELECT CAST(len AS INTEGER) AS len, n_tokens,
       round(CAST(n_tokens AS DOUBLE) / CAST(t AS BIGINT), 6) AS share
FROM hist, tot
""",
    tags=("pipeline", "quality"),
    doc="corpus token-length histogram with shares (tokenizer diagnostic: "
    "length spikes expose markup/encoding junk); one aggregation + a "
    "broadcast 1-row total, output bounded by max token length",
)
def q_token_len_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from kafka_replicator_spark.functions.hashing import spread

    toks = spread(
        _docs(spark, sf_dir).select(F.explode(F.split("text", " ")).alias("tok"))
    ).select(F.length("tok").alias("len"))
    hist = toks.groupBy("len").agg(F.count(F.lit(1)).alias("n_tokens"))
    tot = hist.agg(F.sum("n_tokens").alias("t"))
    return hist.join(F.broadcast(tot)).select(
        F.col("len").cast("int").alias("len"),
        "n_tokens",
        F.round(F.col("n_tokens") / F.col("t"), 6).alias("share"),
    )


HASH_AUDIT_BUCKETS = 32


@register(
    "p_hash_balance_audit",
    f"""
WITH b AS (
  SELECT ({portable_hash32_sql("CAST(doc_id AS VARCHAR)")} % {HASH_AUDIT_BUCKETS}) AS bucket
  FROM documents
),
c AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n FROM b GROUP BY bucket)
SELECT CAST(count(*) AS BIGINT) AS n_buckets,
       CAST(min(n) AS BIGINT) AS min_count,
       CAST(max(n) AS BIGINT) AS max_count,
       CAST((1000 * max(n) * {HASH_AUDIT_BUCKETS}) // sum(n) AS BIGINT) AS skew_ratio_milli
FROM c
""",
    tags=("pipeline", "ops"),
    doc="partition-balance audit: docs hashed into 32 buckets, max/mean "
    "occupancy in exact integer milli-units — the pre-flight check before "
    "committing to a partitioning key at scale",
)
def q_hash_balance_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from kafka_replicator_spark.functions.hashing import portable_hash32

    b = _docs(spark, sf_dir).select(
        (portable_hash32(F.col("doc_id").cast("string")) % HASH_AUDIT_BUCKETS).alias("bucket")
    )
    c = b.groupBy("bucket").agg(F.count(F.lit(1)).alias("n"))
    return c.agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.min("n").alias("min_count"),
        F.max("n").alias("max_count"),
        F.expr(f"(1000 * max(n) * {HASH_AUDIT_BUCKETS}) div sum(n)").alias(
            "skew_ratio_milli"
        ),
    )


@register(
    "p_edit_distance_pairs",
    f"""
WITH cand AS ({dedup.lsh_candidate_pairs_sql()}),
t AS (SELECT doc_id, substr(text, 1, 64) AS p FROM documents),
scored AS (
  SELECT cand.doc_a, cand.doc_b,
         CAST(levenshtein(ta.p, tb.p) AS BIGINT) AS edit_distance,
         CAST(greatest(length(ta.p), length(tb.p)) AS BIGINT) AS max_len
  FROM cand
  JOIN t ta ON ta.doc_id = cand.doc_a
  JOIN t tb ON tb.doc_id = cand.doc_b
)
SELECT doc_a, doc_b, edit_distance,
       (1000000 * (max_len - edit_distance)) // max_len AS similarity_ppm
FROM scored
""",
    tags=("pipeline", "dedup"),
    doc="edit-distance verification of LSH candidates (64-char prefixes): "
    "the fuzzy-dedup confirmation tier — O(k^2) Levenshtein only on "
    "candidate pairs, never all-pairs; exact integer ppm similarity",
)
def q_edit_distance_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    docs = _docs(spark, sf_dir)
    cand = dedup.lsh_candidate_pairs(docs)
    t = docs.select("doc_id", F.substring("text", 1, 64).alias("p"))
    ta = t.select(F.col("doc_id").alias("doc_a"), F.col("p").alias("pa"))
    tb = t.select(F.col("doc_id").alias("doc_b"), F.col("p").alias("pb"))
    scored = (
        cand.join(ta, "doc_a")
        .join(tb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.levenshtein("pa", "pb").cast("long").alias("edit_distance"),
            F.greatest(F.length("pa"), F.length("pb")).cast("long").alias("max_len"),
        )
    )
    return scored.select(
        "doc_a",
        "doc_b",
        "edit_distance",
        F.expr("(1000000 * (max_len - edit_distance)) div max_len").alias(
            "similarity_ppm"
        ),
    )


@register(
    "p_crosslingual_dups",
    f"""
WITH cand AS ({dedup.lsh_candidate_pairs_sql()}),
lng AS (SELECT doc_id, lang FROM documents)
SELECT la.lang AS lang_a, lb.lang AS lang_b, CAST(count(*) AS BIGINT) AS n_pairs
FROM cand
JOIN lng la ON la.doc_id = cand.doc_a
JOIN lng lb ON lb.doc_id = cand.doc_b
GROUP BY la.lang, lb.lang
""",
    tags=("pipeline", "dedup"),
    doc="near-duplicate language matrix: LSH candidate pairs bucketed by "
    "their language pair — off-diagonal mass flags translated/mislabeled "
    "duplicates a monolingual dedup pass would keep twice; langs^2 output",
)
def q_crosslingual_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    docs = _docs(spark, sf_dir)
    cand = dedup.lsh_candidate_pairs(docs)
    lng = docs.select("doc_id", "lang")
    la = lng.select(F.col("doc_id").alias("doc_a"), F.col("lang").alias("lang_a"))
    lb = lng.select(F.col("doc_id").alias("doc_b"), F.col("lang").alias("lang_b"))
    return (
        cand.join(F.broadcast(la), "doc_a")
        .join(F.broadcast(lb), "doc_b")
        .groupBy("lang_a", "lang_b")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


@register(
    "p_dup_cluster_sizes",
    f"""
WITH clusters AS ({dedup.duplicate_clusters_sql()})
SELECT cluster_size,
       CAST(count(DISTINCT cluster_id) AS BIGINT) AS n_clusters,
       CAST(count(*) AS BIGINT) AS n_docs
FROM clusters GROUP BY cluster_size
""",
    tags=("pipeline", "dedup"),
    doc="duplicate-cluster size histogram over the connected-components "
    "output (how much mass sits in big boilerplate clusters vs pairs) — "
    "the roll-up that sizes dedup's token savings; output bounded by "
    "max cluster size",
)
def q_dup_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    clusters = dedup.duplicate_clusters(_docs(spark, sf_dir))
    return clusters.groupBy("cluster_size").agg(
        F.count_distinct("cluster_id").alias("n_clusters"),
        F.count(F.lit(1)).alias("n_docs"),
    )
