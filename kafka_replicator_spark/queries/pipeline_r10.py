"""Round-10 pipeline queries.

First entries: exact substring-level dedup (VERDICT r09 #5) — the Lee et
al. 2022 ExactSubstr CUT operator (window-hash flavour) over the shared
span core in functions/dedup, plus its composition with the (newly
sharded) sequence packer: the pack boundaries land on POST-cut token
counts, which no single-stage query exercises.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_replicator_spark.functions.dedup import substring_cut, substring_cut_sql
from kafka_replicator_spark.functions.packing import (
    DEFAULT_PACK_BUDGET,
    pack_sequences,
    pack_sequences_sql,
)
from kafka_replicator_spark.queries import register
from kafka_replicator_spark.sources.tables import load_table

_SUBSTR_W = 8


@register(
    "p_substring_dedup",
    f"""
SELECT doc_id, source, n_tokens, cut_tokens, kept_tokens,
       md5(clean_text) AS clean_hash
FROM ({substring_cut_sql(_SUBSTR_W)})
""",
    tags=("pipeline", "dedup"),
    doc="exact substring-level dedup (Lee et al. ExactSubstr, window-hash "
    "flavour): every token covered by a corpus-wide repeated "
    f"{_SUBSTR_W}-token window is cut from ALL occurrences; per-doc "
    "accounting plus md5 of the rebuilt cleaned text pins the cut itself, "
    "not just the counts (functions/dedup.substring_cut; span core shared "
    "with p_dup_span_extents)",
)
def q_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    cut = substring_cut(load_table(spark, sf_dir, "documents"), w=_SUBSTR_W)
    return cut.select(
        "doc_id",
        "source",
        "n_tokens",
        "cut_tokens",
        "kept_tokens",
        F.md5("clean_text").alias("clean_hash"),
    )


#: the cleaned corpus as a relation for the pack oracle — nested WITH inside
#: a FROM-subquery is fine in DuckDB (CLAUDE.md r08 note)
_CLEAN_DOCS_REL = (
    f"(SELECT doc_id, source, clean_text AS text FROM ({substring_cut_sql(_SUBSTR_W)}))"
)


@register(
    "p_e2e_substring_pack",
    f"""
SELECT source,
       count(*) AS n_docs,
       CAST(count(DISTINCT pack_id) AS BIGINT) AS n_packs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       CAST(max(pack_tokens) AS BIGINT) AS max_pack_tokens,
       CAST((CAST(sum(n_tokens) AS HUGEINT) * 1000000)
            // (count(DISTINCT pack_id) * {DEFAULT_PACK_BUDGET}) AS BIGINT)
           AS fill_ppm
FROM ({pack_sequences_sql(DEFAULT_PACK_BUDGET, rel=_CLEAN_DOCS_REL)})
GROUP BY source
ORDER BY source
""",
    tags=("pipeline", "compose"),
    doc="end-to-end substring-cut -> pack chain: the corpus with repeated "
    "spans excised, repacked into fixed token budgets by the sharded "
    "(source, __pid) boundary walk — pack boundaries land on POST-cut "
    "token counts (a fully-cut doc still packs as its 1-token empty "
    "string, same as both engines' split('') semantics); per-source "
    "manifest with exact fill ppm (DECIMAL-lifted numerator)",
)
def q_e2e_substring_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    cut = substring_cut(load_table(spark, sf_dir, "documents"), w=_SUBSTR_W)
    pack = pack_sequences(
        cut.select("doc_id", "source", F.col("clean_text").alias("text")),
        budget=DEFAULT_PACK_BUDGET,
    )
    return (
        pack.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("pack_id").cast("long").alias("n_packs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.max("pack_tokens").alias("max_pack_tokens"),
        )
        .withColumn(
            # ppm-numerator rule: lift to DECIMAL(38,0)/HUGEINT before ×1e6
            "fill_ppm",
            F.expr(
                f"CAST((CAST(total_tokens AS DECIMAL(38,0)) * 1000000)"
                f" div (n_packs * {DEFAULT_PACK_BUDGET}) AS BIGINT)"
            ),
        )
        .orderBy("source")
    )


# ----------------------------------------------- tokenizer fertility (BPE)

from kafka_replicator_spark.functions import corpus as _corpus  # noqa: E402


@register(
    "p_bpe_fertility",
    _corpus.bpe_fertility_sql(),
    tags=("pipeline", "tokenizer"),
    doc="per-source tokenizer fertility under the round-1 BPE merge table "
    "(functions/corpus.bpe_fertility): top-20 merge pairs applied greedily "
    "left-to-right per word — the non-overlap walk closes to ceil(run/2) "
    "per mergeable-position island, so both engines fold exact integers; "
    "subword tokens per word / per char in ppm, DECIMAL-lifted",
)
def q_bpe_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _corpus.bpe_fertility(load_table(spark, sf_dir, "documents"))


# ------------------------------------- quality-classifier calibration drift

from kafka_replicator_spark.functions.evalstats import ECE_BINS  # noqa: E402
from kafka_replicator_spark.functions.packing import (  # noqa: E402
    split_assign_col,
    split_assign_sql,
)
from kafka_replicator_spark.functions.scoring import (  # noqa: E402
    quality_classifier,
    quality_classifier_sql,
)

_ECE_WIDTH = 1_000_000 // ECE_BINS


@register(
    "p_quality_calibration_drift",
    f"""
WITH qc AS ({quality_classifier_sql()}),
scored AS (
  SELECT {split_assign_sql('d.doc_id')} AS split,
         (500 * q.score_milli + 500000 * q.n_tokens) // q.n_tokens AS p_ppm,
         CAST(d.lang = 'en' AS BIGINT) AS y
  FROM qc q JOIN documents d USING (doc_id)
),
binned AS (
  SELECT split, least(p_ppm // {_ECE_WIDTH}, {ECE_BINS - 1}) AS bin, p_ppm, y
  FROM scored
),
per_bin AS (
  SELECT split, bin, CAST(count(*) AS BIGINT) AS n_b,
         CAST(sum(y) AS BIGINT) AS pos_b,
         sum(p_ppm) AS sum_p
  FROM binned GROUP BY split, bin
),
gaps AS (
  SELECT split, bin, n_b,
         abs(CAST(sum_p // n_b AS BIGINT)
             - CAST((CAST(pos_b AS HUGEINT) * 1000000) // n_b AS BIGINT)) AS gap_ppm
  FROM per_bin
)
SELECT split,
       CAST(sum(n_b) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_bins,
       CAST((SELECT sum(CAST(g2.n_b AS HUGEINT) * g2.gap_ppm) FROM gaps g2
             WHERE g2.split = gaps.split) // sum(n_b) AS BIGINT) AS ece_ppm,
       CAST(max(gap_ppm) AS BIGINT) AS max_gap_ppm
FROM gaps GROUP BY split
ORDER BY split
""",
    tags=("pipeline", "eval", "drift"),
    doc="calibration DRIFT of the quality classifier across the house "
    "train/val/test split (VERDICT r09 #7: ECE existed only corpus-wide): "
    "per-split expected calibration error in exact ppm — the reliability "
    "math of p_ece_calibration grouped by packing.split_assign_col, "
    "bin-count-weighted gap fold in HUGEINT/DECIMAL; a val/test ECE far "
    "from train's says the classifier gate is miscalibrated exactly where "
    "it is evaluated",
)
def q_quality_calibration_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    qc = quality_classifier(docs)
    scored = qc.join(docs.select("doc_id", "lang"), "doc_id").select(
        split_assign_col("doc_id").alias("split"),
        F.expr("(500 * score_milli + 500000 * n_tokens) div n_tokens").alias("p_ppm"),
        (F.col("lang") == "en").cast("long").alias("y"),
    )
    per_bin = (
        scored.select(
            "split",
            F.expr(f"least(p_ppm div {_ECE_WIDTH}, {ECE_BINS - 1})").cast("long").alias("bin"),
            "p_ppm",
            "y",
        )
        .groupBy("split", "bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_b"),
            F.sum("y").cast("long").alias("pos_b"),
            F.sum(F.col("p_ppm").cast("decimal(38,0)")).alias("sum_p"),
        )
    )
    gaps = per_bin.select(
        "split",
        "n_b",
        F.expr(
            "abs(CAST(sum_p div n_b AS BIGINT)"
            " - CAST((CAST(pos_b AS DECIMAL(38,0)) * 1000000) div n_b AS BIGINT))"
        ).alias("gap_ppm"),
    )
    return (
        gaps.groupBy("split")
        .agg(
            F.sum("n_b").cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_bins"),
            F.sum(F.col("n_b").cast("decimal(38,0)") * F.col("gap_ppm")).alias("__wg"),
            F.max("gap_ppm").cast("long").alias("max_gap_ppm"),
        )
        .select(
            "split",
            "n_docs",
            "n_bins",
            F.expr("CAST(__wg div n_docs AS BIGINT)").alias("ece_ppm"),
            "max_gap_ppm",
        )
        .orderBy("split")
    )


# ------------------------------------------------- IVF + PQ with rerank

from kafka_replicator_spark.functions import similarity as _sim  # noqa: E402

_RERANK_PROBES = [0, 1, 2, 3, 4, 5, 6, 7]


@register(
    "p_ivf_pq_rerank",
    _sim.ivf_pq_rerank_sql(_RERANK_PROBES, k=5, shortlist=20),
    tags=("pipeline", "similarity"),
    doc="composed FAISS-style IVFPQ+refine ANN (Jegou et al. 2011 SV): "
    "2-level auto-G IVF cell restriction (the measured N^1.5 assignment "
    "path — ivf_assign_2level with G = floor(sqrt(C)+0.5), derived "
    "identically in the SQL oracle) -> PQ asymmetric-distance scan of the "
    "cell -> exact int8 rerank of the top-20 shortlist; every stage "
    "engine-exact (deterministic argmaxes, BIGINT ADC sums, exact integer "
    "L2 refine); the corpus never shuffles — codebooks/probe subvectors/"
    "probe cells broadcast (functions/similarity.ivf_pq_rerank)",
)
def q_ivf_pq_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sim.ivf_pq_rerank(
        load_table(spark, sf_dir, "embeddings"), _RERANK_PROBES, k=5, shortlist=20
    )


# ------------------------------------------- BLEU-grain dup-pair verification

from kafka_replicator_spark.functions.dedup import (  # noqa: E402
    lsh_candidate_pairs,
    lsh_candidate_pairs_sql,
)
from kafka_replicator_spark.functions.hashing import spread  # noqa: E402

#: LSH banding parameters shared with p_lsh_candidate_pairs
_BLEU_K, _BLEU_N, _BLEU_BANDS = 16, 3, 4

_PAIRS_CTE = f"""pairs AS MATERIALIZED ({lsh_candidate_pairs_sql(_BLEU_K, _BLEU_N, _BLEU_BANDS)}),
pair_docs AS MATERIALIZED (
  SELECT DISTINCT doc_id FROM (
    SELECT doc_a AS doc_id FROM pairs UNION ALL SELECT doc_b FROM pairs)
)"""


@register(
    "p_dup_pair_bleu",
    f"""
WITH {_PAIRS_CTE},
tc AS MATERIALIZED (
  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
        WHERE doc_id IN (SELECT doc_id FROM pair_docs))
  GROUP BY doc_id, tok
),
bc AS MATERIALIZED (
  SELECT doc_id, bg, CAST(count(*) AS BIGINT) AS c
  FROM (
    SELECT doc_id, t[i] || ' ' || t[i+1] AS bg
    FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i
          FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents
                WHERE doc_id IN (SELECT doc_id FROM pair_docs)))
  ) GROUP BY doc_id, bg
),
lens AS MATERIALIZED (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n
  FROM documents WHERE doc_id IN (SELECT doc_id FROM pair_docs)
),
ov1 AS (
  SELECT p.doc_a, p.doc_b, CAST(sum(least(a.c, b.c)) AS BIGINT) AS o1
  FROM pairs p JOIN tc a ON a.doc_id = p.doc_a
               JOIN tc b ON b.doc_id = p.doc_b AND b.tok = a.tok
  GROUP BY p.doc_a, p.doc_b
),
ov2 AS (
  SELECT p.doc_a, p.doc_b, CAST(sum(least(a.c, b.c)) AS BIGINT) AS o2
  FROM pairs p JOIN bc a ON a.doc_id = p.doc_a
               JOIN bc b ON b.doc_id = p.doc_b AND b.bg = a.bg
  GROUP BY p.doc_a, p.doc_b
)
SELECT p.doc_a, p.doc_b, la.n AS len_a, lb.n AS len_b,
       CAST(coalesce(o1, 0) * 1000000 // la.n AS BIGINT) AS p1_ppm,
       CAST(coalesce(o2, 0) * 1000000 // nullif(la.n - 1, 0) AS BIGINT) AS p2_ppm
FROM pairs p
JOIN lens la ON la.doc_id = p.doc_a
JOIN lens lb ON lb.doc_id = p.doc_b
LEFT JOIN ov1 ON ov1.doc_a = p.doc_a AND ov1.doc_b = p.doc_b
LEFT JOIN ov2 ON ov2.doc_a = p.doc_a AND ov2.doc_b = p.doc_b
ORDER BY p.doc_a, p.doc_b
""",
    tags=("pipeline", "dedup", "eval"),
    doc="BLEU-grain verification of LSH candidate pairs: modified unigram "
    "and bigram precision (Papineni et al. 2002 clipped-count form, the "
    "lower doc_id as candidate) in exact ppm — token/bigram MULTISET "
    "clipped overlaps, the near-dup verifier that catches shared-vocab "
    "false positives the set-grain Jaccard verifier cannot (a doc reusing "
    "one word 50 times scores high set-Jaccard but low clipped p1); "
    "exp/brevity-penalty deliberately omitted to stay in exact integers. "
    "Count frames are semi-join-bounded to docs appearing in pairs",
)
def q_dup_pair_bleu(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_replicator_spark.cacheutil import track_cached

    docs = load_table(spark, sf_dir, "documents")
    pairs = track_cached(
        lsh_candidate_pairs(docs, k=_BLEU_K, n=_BLEU_N, bands=_BLEU_BANDS)
    )
    pair_docs = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .unionAll(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    bounded = track_cached(
        spread(docs).join(pair_docs, "doc_id").select("doc_id", "text")
    )
    toks = bounded.select("doc_id", F.split("text", " ").alias("__toks"))
    tc = (
        toks.select("doc_id", F.explode("__toks").alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    grams = F.when(
        F.size(F.col("__toks")) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(F.col("__toks")) - 1),
            lambda i: F.array_join(F.slice(F.col("__toks"), i, 2), " "),
        ),
    ).otherwise(F.array())
    bc = (
        toks.select("doc_id", F.explode(grams).alias("bg"))
        .groupBy("doc_id", "bg")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    lens = bounded.select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("n")
    )
    ov1 = (
        pairs.join(tc.select(F.col("doc_id").alias("doc_a"), "tok", F.col("c").alias("ca")), "doc_a")
        .join(
            tc.select(F.col("doc_id").alias("doc_b"), "tok", F.col("c").alias("cb")),
            ["doc_b", "tok"],
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.least("ca", "cb")).cast("long").alias("o1"))
    )
    ov2 = (
        pairs.join(bc.select(F.col("doc_id").alias("doc_a"), "bg", F.col("c").alias("ca")), "doc_a")
        .join(
            bc.select(F.col("doc_id").alias("doc_b"), "bg", F.col("c").alias("cb")),
            ["doc_b", "bg"],
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.least("ca", "cb")).cast("long").alias("o2"))
    )
    return (
        pairs.join(lens.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("len_a")), "doc_a")
        .join(lens.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("len_b")), "doc_b")
        .join(ov1, ["doc_a", "doc_b"], "left")
        .join(ov2, ["doc_a", "doc_b"], "left")
        .select(
            "doc_a",
            "doc_b",
            "len_a",
            "len_b",
            F.expr("CAST(coalesce(o1, 0) * 1000000 div len_a AS BIGINT)").alias("p1_ppm"),
            F.expr(
                "CAST(coalesce(o2, 0) * 1000000 div nullif(len_a - 1, 0) AS BIGINT)"
            ).alias("p2_ppm"),
        )
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------- degree assortativity


@register(
    "p_degree_assortativity",
    f"""
WITH {_PAIRS_CTE},
edges AS MATERIALIZED (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM pairs
),
deg AS MATERIALIZED (
  SELECT src AS node, CAST(count(*) AS BIGINT) AS d FROM edges GROUP BY src
),
mom AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(ds.d AS HUGEINT)) AS HUGEINT) AS sx,
         CAST(sum(CAST(ds.d AS HUGEINT) * dd.d) AS HUGEINT) AS sxy,
         CAST(sum(CAST(ds.d AS HUGEINT) * ds.d) AS HUGEINT) AS sxx
  FROM edges e JOIN deg ds ON ds.node = e.src JOIN deg dd ON dd.node = e.dst
)
SELECT n AS n_directed_edges,
       CAST(((n * sxy - sx * sx) * 1000000)
            // nullif(n * sxx - sx * sx, 0) AS BIGINT) AS assortativity_ppm
FROM mom
""",
    tags=("pipeline", "graph"),
    doc="degree assortativity of the LSH candidate-pair graph (Newman 2002 "
    "r): Pearson correlation of endpoint degrees over the DIRECTED edge "
    "list — by undirected symmetry sum(x)=sum(y) and sum(xx)=sum(yy), so "
    "r collapses to one exact integer ratio (HUGEINT/DECIMAL moments, "
    "house nullif guard for the regular-graph zero denominator); "
    "disassortative r < 0 means dup hubs attach to leaves — template "
    "boilerplate radiating near-dups — while r > 0 means dense dup "
    "cliques.  One degree aggregation + two bounded joins; no windows",
)
def q_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_replicator_spark.cacheutil import track_cached

    docs = load_table(spark, sf_dir, "documents")
    pairs = track_cached(
        lsh_candidate_pairs(docs, k=_BLEU_K, n=_BLEU_N, bands=_BLEU_BANDS)
    )
    edges = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")).unionAll(
        pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("d")).select(
        F.col("src").alias("node"), "d"
    )
    joined = edges.join(
        deg.select(F.col("node").alias("src"), F.col("d").alias("ds")), "src"
    ).join(deg.select(F.col("node").alias("dst"), F.col("d").alias("dd")), "dst")
    mom = joined.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("ds").cast("decimal(38,0)")).alias("sx"),
        F.sum(F.col("ds").cast("decimal(38,0)") * F.col("dd")).alias("sxy"),
        F.sum(F.col("ds").cast("decimal(38,0)") * F.col("ds")).alias("sxx"),
    )
    return mom.select(
        F.col("n").alias("n_directed_edges"),
        F.expr(
            "CAST(((n * sxy - sx * sx) * 1000000)"
            " div nullif(n * sxx - sx * sx, 0) AS BIGINT)"
        ).alias("assortativity_ppm"),
    )


# ------------------------------------------------- embedding anisotropy

from kafka_replicator_spark.functions.similarity import (  # noqa: E402
    micro_units,
    micro_units_sql,
)

_ANISO_DIM = 64


@register(
    "p_anisotropy_profile",
    f"""
WITH me AS MATERIALIZED (
  SELECT vec_id, {micro_units_sql('embedding')} AS me FROM embeddings
),
dims AS (
  SELECT i, CAST(sum(me[i]) // count(*) AS BIGINT) AS mu
  FROM me, (SELECT unnest(range(1, {_ANISO_DIM + 1})) AS i)
  GROUP BY i
),
mean_v AS (SELECT list(mu ORDER BY i) AS mv FROM dims),
scored AS (
  SELECT vec_id,
         CAST(floor(
           CAST(CAST(list_dot_product(me::DOUBLE[], mv::DOUBLE[]) AS BIGINT) AS DOUBLE)
           / nullif(sqrt(CAST(CAST(list_dot_product(me::DOUBLE[], me::DOUBLE[]) AS BIGINT) AS DOUBLE))
                    * sqrt(CAST(CAST(list_dot_product(mv::DOUBLE[], mv::DOUBLE[]) AS BIGINT) AS DOUBLE)), 0.0)
           * 1e6 + 0.5) AS BIGINT) AS cmicro
  FROM me, mean_v
)
SELECT CAST(least((cmicro + 1000000) // 200000, 9) AS BIGINT) AS decile,
       CAST(count(*) AS BIGINT) AS n_vecs,
       CAST(sum(cmicro) // count(*) AS BIGINT) AS mean_cos_micro
FROM scored WHERE cmicro IS NOT NULL
GROUP BY decile ORDER BY decile
""",
    tags=("pipeline", "embeddings"),
    doc="embedding anisotropy profile (Ethayarajh 2019: contextual "
    "embeddings occupy a narrow cone): cosine of every vector to the "
    "corpus MEAN vector, bucketed into [-1,1] deciles — mean vector in "
    "exact integer micro-units (per-dim sum // n over "
    "similarity.micro_units), dots are exact BIGINTs < 2^53, and the "
    "only float ops are one divide and two correctly-rounded IEEE sqrts "
    "before the floor(x*1e6+0.5) quantization, so both engines bucket "
    "identically; a mass of vectors at high cos-to-mean says the space "
    "is anisotropic and raw-cosine ANN thresholds are miscalibrated",
)
def q_anisotropy_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    me = emb.select("vec_id", micro_units("embedding").alias("me"))
    dims = (
        me.select(F.posexplode("me").alias("i0", "v"))
        .groupBy("i0")
        .agg(F.expr("CAST(sum(v) div count(1) AS BIGINT)").alias("mu"))
    )
    mean_v = dims.agg(
        F.expr("transform(array_sort(collect_list(struct(i0, mu))), x -> x.mu)").alias("mv")
    )
    from kafka_replicator_spark.functions.similarity import dot_int_col as dot

    scored = me.crossJoin(F.broadcast(mean_v)).select(
        "vec_id",
        F.floor(
            dot(F.col("me"), F.col("mv")).cast("double")
            / F.nullif(
                F.sqrt(dot(F.col("me"), F.col("me")).cast("double"))
                * F.sqrt(dot(F.col("mv"), F.col("mv")).cast("double")),
                F.lit(0.0),
            )
            * F.lit(1e6)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("cmicro"),
    )
    return (
        scored.filter(F.col("cmicro").isNotNull())
        .select(
            F.expr("CAST(least((cmicro + 1000000) div 200000, 9) AS BIGINT)").alias("decile"),
            "cmicro",
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            F.expr("CAST(sum(cmicro) div count(1) AS BIGINT)").alias("mean_cos_micro"),
        )
        .orderBy("decile")
    )


# --------------------------------------------- split embedding-centroid drift


@register(
    "p_split_centroid_shift",
    f"""
WITH me AS MATERIALIZED (
  SELECT vec_id, {split_assign_sql('vec_id')} AS split,
         {micro_units_sql('embedding')} AS me
  FROM embeddings
),
cent AS MATERIALIZED (
  SELECT split, i, CAST(sum(me[i]) // count(*) AS BIGINT) AS mu,
         CAST(count(*) AS BIGINT) AS n
  FROM me, (SELECT unnest(range(1, {_ANISO_DIM + 1})) AS i)
  GROUP BY split, i
)
SELECT a.split AS split_a, b.split AS split_b,
       CAST(min(a.n) AS BIGINT) AS n_a, CAST(min(b.n) AS BIGINT) AS n_b,
       CAST(sum((a.mu - b.mu) * (a.mu - b.mu)) AS BIGINT) AS dist_sq_micro2
FROM cent a JOIN cent b ON a.i = b.i AND a.split < b.split
GROUP BY a.split, b.split
ORDER BY split_a, split_b
""",
    tags=("pipeline", "embeddings", "drift"),
    doc="embedding-grain drift across the house train/val/test split "
    "(the geometry twin of p_split_token_js): per-split centroid in exact "
    "integer micro-units (per-dim sum // n over similarity.micro_units, "
    "split by packing.split_assign_col on vec_id — the doc_id = vec_id "
    "alignment the cross-modal audits document), pairwise squared L2 "
    "between centroids as an exact BIGINT — a val/test centroid far from "
    "train's says the eval split sees a different embedding distribution "
    "than training.  Centroid frames are (3 x 64) metadata; the corpus "
    "is touched by ONE explode + aggregation",
)
def q_split_centroid_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    me = emb.select(
        split_assign_col("vec_id").alias("split"), micro_units("embedding").alias("me")
    )
    from kafka_replicator_spark.cacheutil import track_cached

    # cent feeds the a x b self-join — cache the 3x64-row frame or the
    # corpus-wide explode+aggregation runs twice (the SQL side MATERIALIZEs
    # it for the same reason)
    cent = track_cached(
        me.select("split", F.posexplode("me").alias("i", "v"))
        .groupBy("split", "i")
        .agg(
            F.expr("CAST(sum(v) div count(1) AS BIGINT)").alias("mu"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
    )
    a = cent.select(
        F.col("split").alias("split_a"), "i", F.col("mu").alias("mu_a"), F.col("n").alias("na")
    )
    b = cent.select(
        F.col("split").alias("split_b"), "i", F.col("mu").alias("mu_b"), F.col("n").alias("nb")
    )
    return (
        a.join(b, ["i"])
        .filter(F.col("split_a") < F.col("split_b"))
        .groupBy("split_a", "split_b")
        .agg(
            F.min("na").cast("long").alias("n_a"),
            F.min("nb").cast("long").alias("n_b"),
            F.sum((F.col("mu_a") - F.col("mu_b")) * (F.col("mu_a") - F.col("mu_b")))
            .cast("long")
            .alias("dist_sq_micro2"),
        )
        .orderBy("split_a", "split_b")
    )


# ------------------------------------------- repeated-span position profile

from kafka_replicator_spark.functions.dedup import (  # noqa: E402
    _dup_window_spans,
    dup_spans_ctes_sql,
)


@register(
    "p_substring_position_profile",
    f"""
WITH {dup_spans_ctes_sql(_SUBSTR_W)},
lens AS (SELECT doc_id, source, CAST(len(t) AS BIGINT) AS n FROM src),
sp AS (
  SELECT l.source,
         least(((sp.s + sp.e) // 2 - 1) * 10 // l.n, 9) AS decile,
         sp.e - sp.s + 1 AS span_tokens
  FROM spans sp JOIN lens l USING (doc_id)
)
SELECT source, CAST(decile AS BIGINT) AS decile,
       CAST(count(*) AS BIGINT) AS n_spans,
       CAST(sum(span_tokens) AS BIGINT) AS span_tokens
FROM sp GROUP BY source, decile ORDER BY source, decile
""",
    tags=("pipeline", "dedup"),
    doc="positional profile of the ExactSubstr cut list: each merged "
    "repeated-span extent bucketed by its midpoint's relative position "
    "decile within the document, per source — pure integer arithmetic "
    "((s+e) div 2, *10 div n_tokens).  Head-heavy mass means template "
    "boilerplate (headers/navigation) drives the cut; tail-heavy means "
    "signatures/footers — which end of the document the cutter should "
    "trust is a real curation decision.  Span text single-sourced with "
    "substring_cut via dedup.dup_spans_ctes_sql / _dup_window_spans",
)
def q_substring_position_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    spans = _dup_window_spans(docs, _SUBSTR_W)
    lens = docs.select(
        "doc_id", "source", F.size(F.split("text", " ")).cast("long").alias("n")
    )
    sp = spans.join(lens, "doc_id").select(
        "source",
        F.expr("CAST(least(((s + e) div 2 - 1) * 10 div n, 9) AS BIGINT)").alias("decile"),
        (F.col("e") - F.col("s") + 1).alias("span_tokens"),
    )
    return (
        sp.groupBy("source", "decile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_spans"),
            F.sum("span_tokens").cast("long").alias("span_tokens"),
        )
        .orderBy("source", "decile")
    )


# --------------------------------------- DSIR vs DoReMi rank agreement

from kafka_replicator_spark.functions.corpus import (  # noqa: E402
    dsir_weights,
    dsir_weights_sql,
)


def _reweight_agreement_sql() -> str:
    from kafka_replicator_spark.queries.curation_ext import DOREMI_WEIGHTS_SQL

    return f"""
WITH dsir AS MATERIALIZED ({dsir_weights_sql()}),
dsrc AS MATERIALIZED (
  SELECT d.source,
         CAST(sum(CAST(floor(exp(w.dsir_logweight) * 1000000 + 0.5) AS BIGINT))
              // count(*) AS BIGINT) AS mean_wm
  FROM dsir w JOIN documents d USING (doc_id)
  GROUP BY d.source
),
dore AS MATERIALIZED ({DOREMI_WEIGHTS_SQL}),
ra AS (SELECT source, row_number() OVER (ORDER BY mean_wm DESC, source ASC) AS r1 FROM dsrc),
rb AS (SELECT source, row_number() OVER (ORDER BY weight_ppm DESC, source ASC) AS r2 FROM dore),
j AS MATERIALIZED (SELECT a.source, r1, r2 FROM ra a JOIN rb b ON a.source = b.source),
pairs AS (
  SELECT CASE WHEN (x.r1 - y.r1) * (x.r2 - y.r2) > 0 THEN 1 ELSE 0 END AS conc,
         CASE WHEN (x.r1 - y.r1) * (x.r2 - y.r2) < 0 THEN 1 ELSE 0 END AS disc
  FROM j x JOIN j y ON x.source < y.source
)
SELECT CAST((SELECT count(*) FROM j) AS BIGINT) AS n_sources,
       CAST(sum(conc) AS BIGINT) AS n_concordant,
       CAST(sum(disc) AS BIGINT) AS n_discordant,
       CAST((sum(conc) - sum(disc)) * 1000000 // nullif(count(*), 0) AS BIGINT) AS tau_a_ppm
FROM pairs
"""


@register(
    "p_reweight_agreement",
    _reweight_agreement_sql(),
    tags=("pipeline", "mixing", "eval"),
    doc="do the two domain-reweighting schemes agree? Kendall tau-a (exact "
    "ppm, tie-free ranks via the source tie-break) between per-source "
    "DSIR importance (mean exp-logweight quantized to micro — the "
    "p_dsir_ess rule — then sum // n) and DoReMi loss-driven weight_ppm "
    "(DOREMI_WEIGHTS_SQL, single-sourced from curation_ext).  tau near "
    "+1e6: target-likeness and LM difficulty rank sources the same way, "
    "so either scheme picks the same mixture; tau near -1e6 means the "
    "easy-domain and target-like-domain orderings INVERT and the mixture "
    "choice actually matters.  All joins/windows on the bounded source "
    "grain",
)
def q_reweight_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_replicator_spark.queries.curation_ext import q_doremi_weights

    docs = load_table(spark, sf_dir, "documents")
    dsrc = (
        dsir_weights(docs)
        .join(docs.select("doc_id", "source"), "doc_id")
        .select(
            "source",
            F.expr("CAST(floor(exp(dsir_logweight) * 1000000 + 0.5) AS BIGINT)").alias("wm"),
        )
        .groupBy("source")
        .agg(F.expr("CAST(sum(wm) div count(1) AS BIGINT)").alias("mean_wm"))
    )
    dore = q_doremi_weights(spark, sf_dir).select("source", "weight_ppm")
    w_all = Window.partitionBy()
    ra = dsrc.select(
        "source",
        F.row_number()
        .over(w_all.orderBy(F.desc("mean_wm"), F.asc("source")))
        .alias("r1"),
    )
    rb = dore.select(
        "source",
        F.row_number()
        .over(w_all.orderBy(F.desc("weight_ppm"), F.asc("source")))
        .alias("r2"),
    )
    from kafka_replicator_spark.cacheutil import track_cached

    # j feeds a self-join AND the n_sources aggregate — cache it (house
    # rule), and take the count as a lazily-joined one-row frame rather
    # than an eager driver action inside the query builder
    j = track_cached(ra.join(rb, "source"))
    nsrc = j.agg(F.count(F.lit(1)).cast("long").alias("n_sources"))
    x = j.select(F.col("source").alias("sa"), F.col("r1").alias("x1"), F.col("r2").alias("x2"))
    y = j.select(F.col("source").alias("sb"), F.col("r1").alias("y1"), F.col("r2").alias("y2"))
    pairs = x.join(y, F.col("sa") < F.col("sb")).select(
        F.when((F.col("x1") - F.col("y1")) * (F.col("x2") - F.col("y2")) > 0, 1)
        .otherwise(0)
        .alias("conc"),
        F.when((F.col("x1") - F.col("y1")) * (F.col("x2") - F.col("y2")) < 0, 1)
        .otherwise(0)
        .alias("disc"),
    )
    return (
        pairs.agg(
            F.sum("conc").cast("long").alias("n_concordant"),
            F.sum("disc").cast("long").alias("n_discordant"),
            F.expr(
                "CAST((sum(conc) - sum(disc)) * 1000000 div nullif(count(1), 0) AS BIGINT)"
            ).alias("tau_a_ppm"),
        )
        .crossJoin(F.broadcast(nsrc))
        .select("n_sources", "n_concordant", "n_discordant", "tau_a_ppm")
    )


# --------------------------------------------- doc-grain detector matrix

from kafka_replicator_spark.functions.dedup import (  # noqa: E402
    simhash_near_pairs,
    simhash_near_pairs_sql,
)


@register(
    "p_dup_detector_matrix",
    f"""
WITH {_PAIRS_CTE},
{dup_spans_ctes_sql(_SUBSTR_W)},
sim AS MATERIALIZED ({simhash_near_pairs_sql()}),
exd AS (
  SELECT doc_id FROM (
    SELECT doc_id, count(*) OVER (PARTITION BY md5(text)) AS c FROM documents
  ) WHERE c > 1
),
spd AS (SELECT DISTINCT doc_id FROM spans),
simd AS (
  SELECT DISTINCT doc_id FROM (
    SELECT doc_a AS doc_id FROM sim UNION ALL SELECT doc_b FROM sim)
),
flags AS (
  SELECT CAST(e.doc_id IS NOT NULL AS BIGINT) AS f_exact,
         CAST(s.doc_id IS NOT NULL AS BIGINT) AS f_substr,
         CAST(l.doc_id IS NOT NULL AS BIGINT) AS f_lsh,
         CAST(m.doc_id IS NOT NULL AS BIGINT) AS f_simhash
  FROM documents d
  LEFT JOIN exd e ON e.doc_id = d.doc_id
  LEFT JOIN spd s ON s.doc_id = d.doc_id
  LEFT JOIN pair_docs l ON l.doc_id = d.doc_id
  LEFT JOIN simd m ON m.doc_id = d.doc_id
)
SELECT f_exact, f_substr, f_lsh, f_simhash, CAST(count(*) AS BIGINT) AS n_docs
FROM flags GROUP BY f_exact, f_substr, f_lsh, f_simhash
ORDER BY f_exact, f_substr, f_lsh, f_simhash
""",
    tags=("pipeline", "dedup", "eval"),
    doc="doc-grain agreement matrix across all four dup-detector tiers — "
    "exact hash, ExactSubstr repeated-span (the round-10 cutter, span "
    "text single-sourced via dup_spans_ctes_sql), MinHash-LSH candidate, "
    "SimHash hamming candidate — as a 2^4 contingency over the corpus: "
    "every exact dup of length >= w carries spans (a hash dup repeats "
    "ALL its windows; docs shorter than the 8-token window legitimately "
    "sit at (1,0,*,*)), so that cell is dominated by SHORT exact dups; the "
    "(0,1,0,0) cell is the cutter's unique contribution — partial "
    "boilerplate no doc-level detector sees.  Pair frames stay blocked "
    "(never all-pairs); the flag build is four doc-grain left joins",
)
def q_dup_detector_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    docs = load_table(spark, sf_dir, "documents")
    exd = (
        docs.withColumn("c", F.count(F.lit(1)).over(W.partitionBy(F.md5("text"))))
        .filter(F.col("c") > 1)
        .select("doc_id")
    )
    from kafka_replicator_spark.cacheutil import track_cached

    spd = _dup_window_spans(docs, _SUBSTR_W).select("doc_id").distinct()
    # both pair frames feed a union of their two endpoint projections —
    # cache them or the band self-join / hamming verification runs twice
    pairs = track_cached(
        lsh_candidate_pairs(docs, k=_BLEU_K, n=_BLEU_N, bands=_BLEU_BANDS)
    )
    lshd = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .unionAll(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    sim = track_cached(simhash_near_pairs(docs))
    simd = (
        sim.select(F.col("doc_a").alias("doc_id"))
        .unionAll(sim.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    flags = (
        docs.select("doc_id")
        .join(exd.withColumn("f_exact", F.lit(1)), "doc_id", "left")
        .join(spd.withColumn("f_substr", F.lit(1)), "doc_id", "left")
        .join(lshd.withColumn("f_lsh", F.lit(1)), "doc_id", "left")
        .join(simd.withColumn("f_simhash", F.lit(1)), "doc_id", "left")
        .select(
            *[
                F.coalesce(F.col(c), F.lit(0)).cast("long").alias(c)
                for c in ("f_exact", "f_substr", "f_lsh", "f_simhash")
            ]
        )
    )
    return (
        flags.groupBy("f_exact", "f_substr", "f_lsh", "f_simhash")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .orderBy("f_exact", "f_substr", "f_lsh", "f_simhash")
    )


# --------------------------------------------- e2e dedup cascade funnel


@register(
    "p_e2e_dedup_cascade",
    f"""
WITH surv AS MATERIALIZED (
  SELECT doc_id FROM (
    SELECT doc_id,
           row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
    FROM documents
  ) WHERE rn = 1
),
t1 AS MATERIALIZED (
  SELECT d.doc_id, d.source, d.text FROM documents d JOIN surv USING (doc_id)
),
cut AS MATERIALIZED ({substring_cut_sql(_SUBSTR_W, rel='t1')}),
clean AS MATERIALIZED (SELECT doc_id, source, clean_text AS text FROM cut),
pairs AS MATERIALIZED ({lsh_candidate_pairs_sql(_BLEU_K, _BLEU_N, _BLEU_BANDS, rel='clean')}),
removed AS (SELECT DISTINCT doc_b AS doc_id FROM pairs),
fin AS (
  SELECT c.doc_id, c.source, cut.kept_tokens
  FROM clean c JOIN cut USING (doc_id)
  LEFT JOIN removed r ON r.doc_id = c.doc_id
  WHERE r.doc_id IS NULL
),
raw AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_raw,
         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tok_raw
  FROM documents GROUP BY source
),
s1 AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_exact,
         CAST(sum(cut_tokens) AS BIGINT) AS cut_tokens
  FROM cut GROUP BY source
),
s2 AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_final,
         CAST(sum(kept_tokens) AS BIGINT) AS tok_final
  FROM fin GROUP BY source
)
SELECT raw.source, n_raw, tok_raw,
       coalesce(n_exact, 0) AS n_exact, coalesce(cut_tokens, 0) AS cut_tokens,
       coalesce(n_final, 0) AS n_final, coalesce(tok_final, 0) AS tok_final
FROM raw LEFT JOIN s1 USING (source) LEFT JOIN s2 USING (source)
ORDER BY raw.source
""",
    tags=("pipeline", "compose", "dedup"),
    doc="the three-tier dedup cascade as ONE end-to-end funnel — exact "
    "hash survivors (min-id) -> ExactSubstr cut of the survivors "
    "(substring_cut_sql rel-composed over the survivor CTE) -> MinHash-"
    "LSH near-dup removal over the CLEANED text (the shingle builders "
    "are rel-parameterized so the oracle shingles the cut output, not "
    "the raw table; higher doc_id of each candidate pair removed) — "
    "per-source doc/token accounting at every stage.  Running LSH after "
    "the cut matters: cutting shared boilerplate can UN-pair docs whose "
    "similarity was all template, which no single-stage query observes",
)
def q_e2e_dedup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from kafka_replicator_spark.cacheutil import track_cached

    docs = load_table(spark, sf_dir, "documents")
    surv = (
        docs.withColumn(
            "rn", F.row_number().over(W.partitionBy(F.md5("text")).orderBy("doc_id"))
        )
        .filter(F.col("rn") == 1)
        .select("doc_id", "source", "text")
    )
    cut = track_cached(substring_cut(surv, w=_SUBSTR_W))
    clean = cut.select("doc_id", "source", F.col("clean_text").alias("text"))
    pairs = lsh_candidate_pairs(clean, k=_BLEU_K, n=_BLEU_N, bands=_BLEU_BANDS)
    removed = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    fin = (
        clean.join(cut.select("doc_id", "kept_tokens"), "doc_id")
        .join(removed, "doc_id", "left_anti")
        .select("doc_id", "source", "kept_tokens")
    )
    raw = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_raw"),
        F.sum(F.size(F.split("text", " "))).cast("long").alias("tok_raw"),
    )
    s1 = cut.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_exact"),
        F.sum("cut_tokens").cast("long").alias("cut_tokens"),
    )
    s2 = fin.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_final"),
        F.sum("kept_tokens").cast("long").alias("tok_final"),
    )
    return (
        # LEFT joins at BOTH stages: a source whose every doc loses exact
        # dedup to a lower doc_id in another source has no s1 row — the
        # most-deduplicated source is exactly the one the funnel must show
        raw.join(s1, "source", "left")
        .join(s2, "source", "left")
        .select(
            "source",
            "n_raw",
            "tok_raw",
            F.coalesce("n_exact", F.lit(0)).cast("long").alias("n_exact"),
            F.coalesce("cut_tokens", F.lit(0)).cast("long").alias("cut_tokens"),
            F.coalesce("n_final", F.lit(0)).cast("long").alias("n_final"),
            F.coalesce("tok_final", F.lit(0)).cast("long").alias("tok_final"),
        )
        .orderBy("source")
    )


# --------------------------------------------- BPE merge-budget curve


@register(
    "p_bpe_merge_curve",
    _corpus.bpe_merge_curve_sql(),
    tags=("pipeline", "tokenizer"),
    doc="merge-budget sensitivity of round-1 BPE compression: corpus "
    "subword counts under the top-5/10/20 merge tables, every arm from "
    "ONE shared (word, position, rank) frame (the literal-ladder sweep "
    "pattern; the merge ranking is prefix-closed so arm k filters "
    "rank <= k) — diminishing compression_ppm deltas locate where the "
    "vocabulary budget stops paying (functions/corpus.bpe_merge_curve; "
    "greedy-run closed form shared with bpe_fertility)",
)
def q_bpe_merge_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _corpus.bpe_merge_curve(load_table(spark, sf_dir, "documents"))


# ------------------------------------------------------ kNN hubness profile

from kafka_replicator_spark.functions.similarity import (  # noqa: E402
    label_knn_graph,
    label_knn_graph_sql,
)

_HUB_K = 3


@register(
    "p_knn_hubness",
    f"""
WITH g AS MATERIALIZED ({label_knn_graph_sql(k=_HUB_K)}),
ind AS (
  SELECT e.vec_id,
         CAST(coalesce(d.c, 0) AS BIGINT) AS in_deg
  FROM embeddings e LEFT JOIN (
    SELECT neighbor_id, count(*) AS c FROM g GROUP BY neighbor_id
  ) d ON d.neighbor_id = e.vec_id
)
SELECT in_deg, CAST(count(*) AS BIGINT) AS n_vecs
FROM ind GROUP BY in_deg ORDER BY in_deg
""",
    tags=("pipeline", "embeddings", "graph"),
    doc="hubness profile of the directed label-blocked kNN graph "
    f"(Radovanovic et al. 2010: k-occurrence skew): how often each vector "
    f"appears in OTHERS' top-{_HUB_K} lists — the in-degree distribution, "
    "with antihubs (in_deg 0, vectors nothing points at) surfaced by the "
    "left join against the full corpus.  A heavy right tail means hub "
    "vectors dominate retrieval results and kNN-graph diversity filters "
    "will over-select them; the undirected p_degree_histogram cannot see "
    "this (undirecting erases k-occurrence).  One bounded-block join + "
    "two aggregations",
)
def q_knn_hubness(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    g = label_knn_graph(emb, k=_HUB_K)
    ind = (
        emb.select("vec_id")
        .join(
            g.groupBy("neighbor_id").agg(F.count(F.lit(1)).alias("c")),
            F.col("vec_id") == F.col("neighbor_id"),
            "left",
        )
        .select(F.coalesce("c", F.lit(0)).cast("long").alias("in_deg"))
    )
    return (
        ind.groupBy("in_deg")
        .agg(F.count(F.lit(1)).cast("long").alias("n_vecs"))
        .orderBy("in_deg")
    )


# --------------------------------------------- substring-cut quality shift

from kafka_replicator_spark.functions.curation import (  # noqa: E402
    gopher_quality,
    gopher_quality_sql,
)


@register(
    "p_substring_quality_shift",
    f"""
WITH cut AS MATERIALIZED ({substring_cut_sql(_SUBSTR_W)}),
clean AS MATERIALIZED (SELECT doc_id, source, clean_text AS text FROM cut),
graw AS ({gopher_quality_sql()}),
gcut AS ({gopher_quality_sql(rel='clean')})
SELECT d.source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(r.passes) AS BIGINT) AS n_pass_raw,
       CAST(sum(c.passes) AS BIGINT) AS n_pass_cut,
       CAST(sum(CASE WHEN r.passes = 1 AND c.passes = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_fail_flips,
       CAST(sum(CASE WHEN r.passes = 0 AND c.passes = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_pass_flips
FROM documents d
JOIN graw r ON r.doc_id = d.doc_id
JOIN gcut c ON c.doc_id = d.doc_id
GROUP BY d.source ORDER BY d.source
""",
    tags=("pipeline", "compose", "quality"),
    doc="does the ExactSubstr cut change what the Gopher gate accepts? "
    "pass rates per source on the RAW text vs the CUT text (gopher "
    "builders rel-composed over the cut CTE), with both flip directions "
    "counted: fail-flips are docs the cut gutted below the word-count or "
    "stopword floor (over-aggressive cutting destroys good docs); "
    "pass-flips are docs whose repetition flag CLEARED because the cut "
    "removed exactly the repeated span the gate was rejecting — the "
    "curation-order interaction p_e2e_curation_funnel cannot see because "
    "it gates before any cut",
)
def q_substring_quality_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    from kafka_replicator_spark.cacheutil import track_cached

    cut = track_cached(substring_cut(docs, w=_SUBSTR_W))
    clean = cut.select("doc_id", "source", F.col("clean_text").alias("text"))
    graw = gopher_quality(docs).select("doc_id", F.col("passes").alias("p_raw"))
    gcut = gopher_quality(clean).select("doc_id", F.col("passes").alias("p_cut"))
    return (
        docs.select("doc_id", "source")
        .join(graw, "doc_id")
        .join(gcut, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("p_raw").cast("long").alias("n_pass_raw"),
            F.sum("p_cut").cast("long").alias("n_pass_cut"),
            F.sum(F.when((F.col("p_raw") == 1) & (F.col("p_cut") == 0), 1).otherwise(0))
            .cast("long")
            .alias("n_fail_flips"),
            F.sum(F.when((F.col("p_raw") == 0) & (F.col("p_cut") == 1), 1).otherwise(0))
            .cast("long")
            .alias("n_pass_flips"),
        )
        .orderBy("source")
    )


# --------------------------------------------- source Fisher separability


@register(
    "p_source_separability",
    f"""
WITH me AS MATERIALIZED (
  SELECT e.vec_id, d.source, {micro_units_sql('e.embedding')} AS me
  FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id
),
stats AS MATERIALIZED (
  SELECT source, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(list_dot_product(me::DOUBLE[], me::DOUBLE[]) AS BIGINT))
              AS HUGEINT) AS q
  FROM me GROUP BY source
),
dims AS MATERIALIZED (
  SELECT source, i, CAST(sum(me[i]) AS HUGEINT) AS s
  FROM me, (SELECT unnest(range(1, 65)) AS i)
  GROUP BY source, i
),
sw AS (
  SELECT st.source, st.n, CAST(st.n * st.q - sum(d.s * d.s) AS HUGEINT) AS w
  FROM stats st JOIN dims d USING (source)
  GROUP BY st.source, st.n, st.q
),
num AS (
  SELECT a.source AS source_a, b.source AS source_b,
         sum((sb.n * a.s - sa.n * b.s) * (sb.n * a.s - sa.n * b.s)) AS nm
  FROM dims a
  JOIN dims b ON a.i = b.i AND a.source < b.source
  JOIN stats sa ON sa.source = a.source
  JOIN stats sb ON sb.source = b.source
  GROUP BY a.source, b.source
)
SELECT n.source_a, n.source_b,
       CAST(wa.n AS BIGINT) AS n_a, CAST(wb.n AS BIGINT) AS n_b,
       CAST((n.nm * 1000000) // nullif(wb.n * wb.n * wa.w + wa.n * wa.n * wb.w, 0)
            AS BIGINT) AS fisher_ppm
FROM num n
JOIN sw wa ON wa.source = n.source_a
JOIN sw wb ON wb.source = n.source_b
ORDER BY n.source_a, n.source_b
""",
    tags=("pipeline", "embeddings", "eval"),
    doc="Fisher separability between source pairs in embedding space: "
    "J = |mu_a - mu_b|^2 / (var_a + var_b), cleared of every division — "
    "numerator |n_b*S_a - n_a*S_b|^2, denominator n_b^2*SW_a + n_a^2*SW_b "
    "with the scatter in its n-cleared form SW = n*sum|v|^2 - |sum v|^2 — "
    "so the whole statistic is ONE exact integer ratio over micro-unit "
    "sums (HUGEINT/DECIMAL folds; magnitudes stay under 1e33 at tested "
    "scales).  High J: sources occupy separable embedding regions, so "
    "source is a usable coarse quantizer / mixture covariate; J near 0: "
    "embedding space ignores provenance.  All joins on the bounded "
    "(source, dim) grain after ONE corpus aggregation; uses the "
    "doc_id = vec_id testdata alignment the cross-modal audits document",
)
def q_source_separability(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("vec_id"), "source"
    )
    from kafka_replicator_spark.functions.similarity import dot_int_col as dot

    me = emb.join(docs, "vec_id").select(
        "vec_id", "source", micro_units("embedding").alias("me")
    )
    from kafka_replicator_spark.cacheutil import track_cached

    me = track_cached(me)
    # Lift BEFORE the fold: per-vector dots are ~6.4e13 (64 dims x 1e12
    # micro^2), so a LONG sum overflows near ~1.4e5 vectors per source —
    # accumulate in DECIMAL(38,0) to match the oracle's HUGEINT sum.
    stats = me.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(dot(F.col("me"), F.col("me")).cast("decimal(38,0)")).alias("q"),
    )
    dims = (
        me.select("source", F.posexplode("me").alias("i", "v"))
        .groupBy("source", "i")
        .agg(F.sum("v").cast("decimal(38,0)").alias("s"))
    )
    sw = (
        stats.join(dims, "source")
        .groupBy("source", "n", "q")
        .agg(F.sum(F.col("s") * F.col("s")).alias("ss"))
        .select("source", "n", F.expr("CAST(n * q - ss AS DECIMAL(38,0))").alias("w"))
    )
    a = dims.select(F.col("source").alias("source_a"), "i", F.col("s").alias("sa"))
    b = dims.select(F.col("source").alias("source_b"), "i", F.col("s").alias("sb"))
    na = stats.select(F.col("source").alias("source_a"), F.col("n").alias("n_a"))
    nb = stats.select(F.col("source").alias("source_b"), F.col("n").alias("n_b"))
    num = (
        a.join(b, ["i"])
        .filter(F.col("source_a") < F.col("source_b"))
        .join(F.broadcast(na), "source_a")
        .join(F.broadcast(nb), "source_b")
        .groupBy("source_a", "source_b", "n_a", "n_b")
        .agg(
            F.sum(
                (F.col("n_b") * F.col("sa") - F.col("n_a") * F.col("sb"))
                * (F.col("n_b") * F.col("sa") - F.col("n_a") * F.col("sb"))
            ).alias("nm")
        )
    )
    return (
        num.join(sw.select(F.col("source").alias("source_a"), F.col("w").alias("wa")), "source_a")
        .join(sw.select(F.col("source").alias("source_b"), F.col("w").alias("wb")), "source_b")
        .select(
            "source_a",
            "source_b",
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            F.expr(
                "CAST((nm * 1000000) div nullif(n_b * n_b * wa + n_a * n_a * wb, 0)"
                " AS BIGINT)"
            ).alias("fisher_ppm"),
        )
        .orderBy("source_a", "source_b")
    )


# --------------------------------------------- split-conformal coverage

#: miscoverage target alpha = 1/10 — integer arithmetic only
_CONF_ALPHA_DEN = 10


@register(
    "p_conformal_quality_bound",
    f"""
WITH qc AS ({quality_classifier_sql()}),
scored AS MATERIALIZED (
  SELECT d.doc_id, {split_assign_sql('d.doc_id')} AS split,
         (500 * q.score_milli + 500000 * q.n_tokens) // q.n_tokens AS p_ppm,
         CAST(d.lang = 'en' AS BIGINT) AS y
  FROM qc q JOIN documents d USING (doc_id)
),
cal AS MATERIALIZED (
  SELECT doc_id, p_ppm FROM scored WHERE split = 'val' AND y = 1
),
ncal AS (
  SELECT CAST(count(*) AS BIGINT) AS n_cal,
         CAST(greatest(1, (count(*) + 1) // {_CONF_ALPHA_DEN}) AS BIGINT) AS k
  FROM cal
),
qth AS (
  SELECT n_cal, k, p_ppm AS q_ppm FROM (
    SELECT p_ppm, row_number() OVER (ORDER BY p_ppm ASC, doc_id ASC) AS rn FROM cal
  ), ncal WHERE rn = k
)
SELECT n_cal, k, q_ppm,
       CAST(count(*) AS BIGINT) AS n_test,
       CAST(sum(CASE WHEN t.p_ppm >= q_ppm THEN 1 ELSE 0 END) AS BIGINT) AS n_covered,
       CAST((sum(CASE WHEN t.p_ppm >= q_ppm THEN 1 ELSE 0 END) * 1000000)
            // nullif(count(*), 0) AS BIGINT) AS coverage_ppm
FROM (SELECT p_ppm FROM scored WHERE split = 'test' AND y = 1) t, qth
GROUP BY n_cal, k, q_ppm
""",
    tags=("pipeline", "eval", "stats"),
    doc="split-conformal lower bound on the quality classifier's score for "
    "in-class (en) docs: the k-th smallest calibration score with "
    f"k = max(1, floor((n_cal+1)/{_CONF_ALPHA_DEN})) over the VAL split "
    "guarantees P(p >= q) >= 1 - alpha on exchangeable data (Vovk et al. "
    "split-conformal, rank form — the whole procedure is order "
    "statistics, so it is EXACT integer arithmetic end-to-end, no "
    "distributional assumption), and the TEST split's measured coverage "
    "ppm should sit near 900000; a big gap says the split is not "
    "exchangeable — the same signal p_quality_calibration_drift reads, "
    "through a finite-sample-valid lens.  Rank window runs on the "
    "1%-of-corpus calibration grain",
)
def q_conformal_quality_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from kafka_replicator_spark.cacheutil import track_cached

    docs = load_table(spark, sf_dir, "documents")
    qc = quality_classifier(docs)
    scored = track_cached(
        qc.join(docs.select("doc_id", "lang"), "doc_id").select(
            "doc_id",
            split_assign_col("doc_id").alias("split"),
            F.expr("(500 * score_milli + 500000 * n_tokens) div n_tokens").alias("p_ppm"),
            (F.col("lang") == "en").cast("long").alias("y"),
        )
    )
    cal = scored.filter((F.col("split") == "val") & (F.col("y") == 1)).select(
        "doc_id", "p_ppm"
    )
    ncal = cal.agg(
        F.count(F.lit(1)).cast("long").alias("n_cal"),
        F.expr(
            f"CAST(greatest(1, (count(1) + 1) div {_CONF_ALPHA_DEN}) AS BIGINT)"
        ).alias("k"),
    )
    qth = (
        cal.withColumn(
            "rn", F.row_number().over(W.partitionBy().orderBy(F.asc("p_ppm"), F.asc("doc_id")))
        )
        .crossJoin(F.broadcast(ncal))
        .filter(F.col("rn") == F.col("k"))
        .select("n_cal", "k", F.col("p_ppm").alias("q_ppm"))
    )
    tst = scored.filter((F.col("split") == "test") & (F.col("y") == 1)).select("p_ppm")
    return (
        tst.crossJoin(F.broadcast(qth))
        .groupBy("n_cal", "k", "q_ppm")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.sum(F.when(F.col("p_ppm") >= F.col("q_ppm"), 1).otherwise(0))
            .cast("long")
            .alias("n_covered"),
            F.expr(
                "CAST((sum(CASE WHEN p_ppm >= q_ppm THEN 1 ELSE 0 END) * 1000000)"
                " div nullif(count(1), 0) AS BIGINT)"
            ).alias("coverage_ppm"),
        )
    )


# --------------------------------------------- cut idempotence audit

#: ENGINE NOTE: DuckDB rejects a MATERIALIZED CTE name that repeats along
#: an ANCESTOR chain ("Duplicate alias") though sibling nested scopes and
#: plain nested duplicates are fine — so the two cut stages must be
#: SIBLING CTEs in one top-level WITH, never one nested inside the other.


@register(
    "p_cut_idempotence",
    f"""
WITH c1 AS MATERIALIZED (
  SELECT doc_id, source, clean_text AS text FROM ({substring_cut_sql(_SUBSTR_W)})
),
cut2 AS (SELECT * FROM ({substring_cut_sql(_SUBSTR_W, rel='c1')}))
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN cut_tokens > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_recut,
       CAST(sum(cut_tokens) AS BIGINT) AS second_cut_tokens,
       CAST((sum(CASE WHEN cut_tokens = 0 THEN 1 ELSE 0 END) * 1000000)
            // count(*) AS BIGINT) AS idempotent_ppm
FROM cut2 GROUP BY source ORDER BY source
""",
    tags=("pipeline", "dedup", "eval"),
    doc="is the ExactSubstr cut a fixed point? apply substring_cut to its "
    "OWN output (rel-composed) and count documents that lose MORE tokens "
    "on the second pass — cutting a span can join the text on either "
    "side into a NEW repeated window, so windowed ExactSubstr is not "
    "idempotent in general (the Lee et al. implementation iterates to "
    "convergence); idempotent_ppm near 1e6 says one pass suffices on "
    "this corpus, a low value says a production pipeline needs the "
    "iterate-to-fixpoint loop.  An honest operator-contract audit the "
    "single-pass queries cannot see",
)
def q_cut_idempotence(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_replicator_spark.cacheutil import track_cached

    docs = load_table(spark, sf_dir, "documents")
    cut1 = track_cached(substring_cut(docs, w=_SUBSTR_W))
    clean = cut1.select("doc_id", "source", F.col("clean_text").alias("text"))
    cut2 = substring_cut(clean, w=_SUBSTR_W)
    return (
        cut2.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.when(F.col("cut_tokens") > 0, 1).otherwise(0))
            .cast("long")
            .alias("n_recut"),
            F.sum("cut_tokens").cast("long").alias("second_cut_tokens"),
            F.expr(
                "CAST((sum(CASE WHEN cut_tokens = 0 THEN 1 ELSE 0 END) * 1000000)"
                " div count(1) AS BIGINT)"
            ).alias("idempotent_ppm"),
        )
        .orderBy("source")
    )


# --------------------------------------------- quality threshold sweep

_GATE_THRESHOLDS = (-250, 0, 250)


def _gate_sweep_select() -> str:
    arms = []
    for t in _GATE_THRESHOLDS:
        arms.append(f"""
SELECT CAST({t} AS BIGINT) AS threshold_milli,
       CAST(sum(CASE WHEN score_milli > n_tokens * {t} THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
       CAST((sum(CASE WHEN score_milli > n_tokens * {t} THEN 1 ELSE 0 END) * 1000000)
            // count(*) AS BIGINT) AS pass_ppm,
       CAST(coalesce(sum(CASE WHEN score_milli > n_tokens * {t} THEN n_tokens END), 0) AS BIGINT)
         AS pass_tokens
FROM qc""")
    return " UNION ALL ".join(arms) + "\nORDER BY threshold_milli"


@register(
    "p_quality_threshold_sweep",
    f"""
WITH qc AS MATERIALIZED ({quality_classifier_sql()})
{_gate_sweep_select()}
""",
    tags=("pipeline", "quality", "eval"),
    doc="gate-tuning curve for the quality classifier: pass count / rate "
    f"ppm / surviving token mass at MEAN-score thresholds {_GATE_THRESHOLDS} "
    "milli — the arms apply the classifier's REAL gate comparator "
    "(score_milli > n_tokens * threshold_milli, scoring.quality_classifier) "
    "straddling its default 0, every arm a conditional aggregate over ONE "
    "classifier pass "
    "(the literal-ladder sweep pattern) — how much corpus each candidate "
    "gate setting keeps is the first question any curation run asks; "
    "pairs with p_quality_calibration_drift (is the score calibrated) "
    "and p_dedup_token_savings (what dedup already removed)",
)
def q_quality_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_replicator_spark.cacheutil import track_cached

    qc = track_cached(quality_classifier(load_table(spark, sf_dir, "documents")))
    out = None
    for t in _GATE_THRESHOLDS:
        arm = qc.agg(
            F.lit(t).cast("long").alias("threshold_milli"),
            F.sum(F.when(F.col("score_milli") > F.col("n_tokens") * t, 1).otherwise(0))
            .cast("long")
            .alias("n_pass"),
            F.expr(
                f"CAST((sum(CASE WHEN score_milli > n_tokens * {t} THEN 1 ELSE 0 END) * 1000000)"
                " div count(1) AS BIGINT)"
            ).alias("pass_ppm"),
            F.coalesce(
                F.sum(F.when(F.col("score_milli") > F.col("n_tokens") * t, F.col("n_tokens"))),
                F.lit(0),
            )
            .cast("long")
            .alias("pass_tokens"),
        )
        out = arm if out is None else out.unionAll(arm)
    return out.orderBy("threshold_milli")


# --------------------------------------------- pack budget sweep

_PACK_BUDGETS = (128, 256, 512)


def _pack_sweep_sql() -> str:
    arms = []
    for b in _PACK_BUDGETS:
        arms.append(f"""
SELECT CAST({b} AS BIGINT) AS budget,
       CAST(count(DISTINCT pack_id || '|' || source) AS BIGINT) AS n_packs,
       CAST(sum(CASE WHEN n_tokens > {b} THEN 1 ELSE 0 END) AS BIGINT) AS n_oversize,
       CAST((CAST(sum(n_tokens) AS HUGEINT) * 1000000)
            // (count(DISTINCT pack_id || '|' || source) * {b}) AS BIGINT) AS fill_ppm
FROM (SELECT * FROM ({pack_sequences_sql(b)}))""")
    return " UNION ALL ".join(arms) + "\nORDER BY budget"


@register(
    "p_pack_budget_sweep",
    _pack_sweep_sql(),
    tags=("pipeline", "packing", "eval"),
    doc="sequence-budget tuning sweep: the sharded pack walk at budgets "
    f"{_PACK_BUDGETS} — pack counts, oversize singletons (docs longer "
    "than the whole budget get a pack of their own), and exact fill ppm "
    "per arm (pack_id is per-source, so pack counting keys pack_id x "
    "source).  Longer budgets waste less tail (fill rises) but oversize "
    "fragmentation falls — the context-length knob every training run "
    "tunes; the mix twin is a_mix_budget_sensitivity.  Each arm is one "
    "full close-before-exceed walk; arms are sibling CTE scopes (the "
    "DuckDB MATERIALIZED ancestor-chain alias rule)",
)
def q_pack_budget_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    out = None
    for b in _PACK_BUDGETS:
        pk = pack_sequences(docs, budget=b)
        arm = pk.agg(
            F.lit(b).cast("long").alias("budget"),
            F.countDistinct(F.concat_ws("|", F.col("pack_id").cast("string"), "source"))
            .cast("long")
            .alias("n_packs"),
            F.sum(F.when(F.col("n_tokens") > b, 1).otherwise(0))
            .cast("long")
            .alias("n_oversize"),
            F.expr(
                f"CAST((CAST(sum(n_tokens) AS DECIMAL(38,0)) * 1000000)"
                f" div (count(DISTINCT concat_ws('|', CAST(pack_id AS STRING), source))"
                f" * {b}) AS BIGINT)"
            ).alias("fill_ppm"),
        )
        out = arm if out is None else out.unionAll(arm)
    return out.orderBy("budget")


# --------------------------------------------- kNN reciprocity


@register(
    "p_knn_reciprocity",
    f"""
WITH g AS MATERIALIZED (
  SELECT vec_id, neighbor_id FROM ({label_knn_graph_sql(k=_HUB_K)})
)
SELECT CAST(count(*) AS BIGINT) AS n_edges,
       CAST(sum(CASE WHEN r.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_reciprocal,
       CAST((sum(CASE WHEN r.vec_id IS NOT NULL THEN 1 ELSE 0 END) * 1000000)
            // nullif(count(*), 0) AS BIGINT) AS reciprocity_ppm
FROM g LEFT JOIN g r
  ON r.vec_id = g.neighbor_id AND r.neighbor_id = g.vec_id
""",
    tags=("pipeline", "embeddings", "graph"),
    doc="mutual-nearest-neighbor rate of the directed label-blocked kNN "
    f"graph: the share of top-{_HUB_K} edges whose reverse edge also "
    "exists — the reciprocity filter ANN rerankers use (a reciprocated "
    "edge is far likelier to be a true near neighbor than a one-way "
    "edge into a hub); low reciprocity together with a heavy "
    "p_knn_hubness tail is the classic symptom of hub-dominated "
    "retrieval.  Self-join on the bounded k-per-vector edge list, never "
    "the corpus",
)
def q_knn_reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_replicator_spark.cacheutil import track_cached

    emb = load_table(spark, sf_dir, "embeddings")
    g = track_cached(label_knn_graph(emb, k=_HUB_K).select("vec_id", "neighbor_id"))
    r = g.select(F.col("vec_id").alias("rv"), F.col("neighbor_id").alias("rn"))
    j = g.join(
        r, (F.col("rv") == F.col("neighbor_id")) & (F.col("rn") == F.col("vec_id")), "left"
    )
    return j.agg(
        F.count(F.lit(1)).cast("long").alias("n_edges"),
        F.sum(F.when(F.col("rv").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_reciprocal"),
        F.expr(
            "CAST((sum(CASE WHEN rv IS NOT NULL THEN 1 ELSE 0 END) * 1000000)"
            " div nullif(count(1), 0) AS BIGINT)"
        ).alias("reciprocity_ppm"),
    )


# --------------------------------------------- posting-gap compression model

#: log2 gap-bucket thresholds (powers of two, literal ladder — float log2
#: at exact powers of two is NOT trusted cross-engine, the r07 df_histogram
#: rule)
_GAP_BUCKETS = (1, 2, 4, 8, 16, 32, 64, 128, 256, 512, 1024)


def _gap_bucket_case(col: str) -> str:
    arms = " ".join(
        f"WHEN {col} <= {t} THEN {t}" for t in _GAP_BUCKETS
    )
    return f"CASE {arms} ELSE {2 * _GAP_BUCKETS[-1]} END"


@register(
    "p_posting_gap_profile",
    f"""
WITH post AS MATERIALIZED (
  SELECT DISTINCT tok, doc_id
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
),
gaps AS (
  SELECT tok,
         doc_id - lag(doc_id) OVER (PARTITION BY tok ORDER BY doc_id) AS gap
  FROM post
),
g AS (SELECT gap FROM gaps WHERE gap IS NOT NULL)
SELECT CAST({_gap_bucket_case('gap')} AS BIGINT) AS gap_bucket,
       CAST(count(*) AS BIGINT) AS n_gaps,
       CAST(sum(gap) AS BIGINT) AS gap_sum
FROM g GROUP BY gap_bucket ORDER BY gap_bucket
""",
    tags=("pipeline", "retrieval", "index"),
    doc="posting-list delta-gap profile of the full inverted index (the "
    "delta-encoding cost model every IR index lives on): doc_id gaps "
    "between consecutive postings per term, bucketed by a literal "
    f"power-of-two ladder {_GAP_BUCKETS} (never runtime log2 — the "
    "df_histogram rule) — mass in small buckets means dense, highly "
    "compressible postings (frequent terms), the long-gap tail prices "
    "the rare-term index overhead.  One distinct-postings pass + a "
    "window partitioned by TERM (high-cardinality, parallel) — the "
    "complement of p_df_histogram (df counts) and p_inverted_index "
    "(capped postings sample)",
)
def q_posting_gap_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    docs = load_table(spark, sf_dir, "documents")
    post = (
        spread(docs)
        .select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .distinct()
    )
    gaps = post.select(
        (F.col("doc_id") - F.lag("doc_id").over(W.partitionBy("tok").orderBy("doc_id"))).alias(
            "gap"
        )
    ).filter(F.col("gap").isNotNull())
    return (
        gaps.select(
            F.expr(f"CAST({_gap_bucket_case('gap')} AS BIGINT)").alias("gap_bucket"),
            "gap",
        )
        .groupBy("gap_bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_gaps"),
            F.sum("gap").cast("long").alias("gap_sum"),
        )
        .orderBy("gap_bucket")
    )


# --------------------------------------------- rank-biased overlap (RBO)

_RBO_DEPTH = 20


def _rbo_oracle() -> str:
    from kafka_replicator_spark.queries.pipeline_r6 import _QL_SQL
    from kafka_replicator_spark.queries.retrieval_ext import _BM25_SQL

    top = 1 << _RBO_DEPTH
    return f"""
WITH bm AS ({_BM25_SQL}),
ql AS ({_QL_SQL}),
bmr AS (SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS r1 FROM bm),
qlr AS (SELECT doc_id, row_number() OVER (ORDER BY ql_score DESC, doc_id) AS r2 FROM ql),
ranks AS (
  SELECT coalesce(bmr.doc_id, qlr.doc_id) AS doc_id,
         coalesce(r1, 999) AS r1, coalesce(r2, 999) AS r2
  FROM bmr FULL JOIN qlr ON bmr.doc_id = qlr.doc_id
),
ov AS MATERIALIZED (
  SELECT d.d, CAST(count(CASE WHEN r1 <= d.d AND r2 <= d.d THEN 1 END) AS BIGINT) AS o
  FROM ranks, (SELECT unnest(range(1, {_RBO_DEPTH + 1})) AS d) d
  GROUP BY d.d
),
terms AS (
  SELECT d, (o * 1000000) // d AS a_ppm FROM ov
)
SELECT CAST({_RBO_DEPTH} AS BIGINT) AS depth,
       CAST(sum(CASE WHEN d = {_RBO_DEPTH} THEN (o * 1000000) // d END) AS BIGINT)
         AS overlap_at_depth_ppm,
       CAST((SELECT sum((1::HUGEINT << ({_RBO_DEPTH} - d)) * a_ppm) FROM terms)
            // {top - 1} AS BIGINT) AS rbo_ppm
FROM ov
""".replace("1::HUGEINT <<", "CAST(1 AS HUGEINT) <<")


@register(
    "p_rbo_retrieval",
    _rbo_oracle(),
    tags=("pipeline", "retrieval", "eval"),
    doc="rank-biased overlap (Webber et al. 2010) between the BM25 and "
    "Dirichlet-QL rankings with persistence p = 1/2 — the top-weighted "
    "agreement measure tau-a cannot express (tau weighs all pairs "
    "equally; RBO discounts depth geometrically).  p = 1/2 makes every "
    "weight a dyadic rational, so the whole statistic is exact integers: "
    "per-depth agreement A_d quantized to ppm BEFORE the fold (the house "
    "re-quantization rule), then sum(2^(D-d) * A_d) // (2^D - 1).  "
    "Missing ranks coalesce to 999 (> depth, never in a prefix); the "
    "depth grid is a 20-row range cross joined against the <=40-row rank "
    "union",
)
def q_rbo_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_replicator_spark.cacheutil import track_cached
    from kafka_replicator_spark.queries.pipeline_r6 import q_query_likelihood
    from kafka_replicator_spark.queries.retrieval_ext import q_bm25_scores

    d_max = _RBO_DEPTH
    bm = q_bm25_scores(spark, sf_dir).select(
        "doc_id",
        F.row_number().over(Window.orderBy(F.desc("bm25"), F.asc("doc_id"))).alias("r1"),
    )
    ql = q_query_likelihood(spark, sf_dir).select(
        "doc_id",
        F.row_number().over(Window.orderBy(F.desc("ql_score"), F.asc("doc_id"))).alias("r2"),
    )
    ranks = track_cached(
        bm.join(ql, "doc_id", "full").select(
            F.coalesce("r1", F.lit(999)).alias("r1"),
            F.coalesce("r2", F.lit(999)).alias("r2"),
        )
    )
    grid = ranks.crossJoin(
        F.broadcast(
            ranks.sparkSession.range(1, d_max + 1).select(F.col("id").cast("int").alias("d"))
        )
    )
    ov = grid.groupBy("d").agg(
        F.count(F.when((F.col("r1") <= F.col("d")) & (F.col("r2") <= F.col("d")), 1))
        .cast("long")
        .alias("o")
    )
    terms = ov.select(
        "d",
        F.expr("(o * 1000000) div d").alias("a_ppm"),
        F.expr(f"CASE WHEN d = {d_max} THEN (o * 1000000) div d END").alias("last_a"),
    )
    return terms.agg(
        F.lit(d_max).cast("long").alias("depth"),
        F.max("last_a").cast("long").alias("overlap_at_depth_ppm"),
        F.expr(
            f"CAST(sum(shiftleft(CAST(1 AS BIGINT), {d_max} - d)"
            f" * CAST(a_ppm AS DECIMAL(38,0))) div {(1 << d_max) - 1} AS BIGINT)"
        ).alias("rbo_ppm"),
    )


# --------------------------------------------- IVFPQ recall vs exact int8 L2


def _ivfpq_recall_oracle() -> str:
    from kafka_replicator_spark.functions.similarity import (
        exact_int8_topk_sql_scope,
        ivf_pq_rerank_sql,
    )

    denom = len(_RERANK_PROBES) * 5
    return f"""
WITH approx AS MATERIALIZED (
  SELECT probe_id, neighbor_id FROM ({ivf_pq_rerank_sql(_RERANK_PROBES, k=5, shortlist=20)})
),
exact AS MATERIALIZED (
  {exact_int8_topk_sql_scope(_RERANK_PROBES, k=5)}
)
SELECT CAST(count(*) AS BIGINT) AS n_hits,
       CAST({denom} AS BIGINT) AS n_expected,
       CAST((count(*) * 1000000) // {denom} AS BIGINT) AS recall_ppm
FROM approx JOIN exact USING (probe_id, neighbor_id)
"""


@register(
    "p_ivfpq_recall",
    _ivfpq_recall_oracle(),
    tags=("pipeline", "similarity", "eval"),
    doc="recall@5 of the IVFPQ+refine chain against the EXACT int8 "
    "brute-force L2 ground truth over the same quantized vectors — "
    "completes the per-tier recall matrix (p_ann_recall: sign-LSH, "
    "p_pq_recall_at_k: flat PQ, p_ivf_probe_recall_curve: IVF nprobe) "
    "for the composed tier; losses decompose into cell misses (the "
    "nprobe=1 restriction) and shortlist misses (ADC ranking error the "
    "refine cannot recover).  Ground truth is a probe-bounded broadcast "
    "scan, never all-pairs",
)
def q_ivfpq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_replicator_spark.functions.similarity import exact_int8_topk

    emb = load_table(spark, sf_dir, "embeddings")
    approx = _sim.ivf_pq_rerank(emb, _RERANK_PROBES, k=5, shortlist=20).select(
        "probe_id", "neighbor_id"
    )
    exact = exact_int8_topk(emb, _RERANK_PROBES, k=5)
    denom = len(_RERANK_PROBES) * 5
    return approx.join(exact, ["probe_id", "neighbor_id"]).agg(
        F.count(F.lit(1)).cast("long").alias("n_hits"),
        F.lit(denom).cast("long").alias("n_expected"),
        F.expr(f"CAST((count(1) * 1000000) div {denom} AS BIGINT)").alias("recall_ppm"),
    )


# --------------------------------------------- dedup centroid shift


@register(
    "p_dedup_centroid_shift",
    f"""
WITH me AS MATERIALIZED (
  SELECT e.vec_id, {micro_units_sql('e.embedding')} AS me, d.text
  FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id
),
surv AS (
  SELECT vec_id FROM (
    SELECT vec_id, row_number() OVER (PARTITION BY md5(text) ORDER BY vec_id) AS rn
    FROM me
  ) WHERE rn = 1
),
call AS (
  SELECT i, CAST(sum(me[i]) // count(*) AS BIGINT) AS mu,
         CAST(count(*) AS BIGINT) AS n
  FROM me, (SELECT unnest(range(1, {_ANISO_DIM + 1})) AS i)
  GROUP BY i
),
csur AS (
  SELECT i, CAST(sum(me[i]) // count(*) AS BIGINT) AS mu,
         CAST(count(*) AS BIGINT) AS n
  FROM me JOIN surv USING (vec_id), (SELECT unnest(range(1, {_ANISO_DIM + 1})) AS i)
  GROUP BY i
)
SELECT CAST(min(a.n) AS BIGINT) AS n_all,
       CAST(min(s.n) AS BIGINT) AS n_survivors,
       CAST(sum((a.mu - s.mu) * (a.mu - s.mu)) AS BIGINT) AS shift_sq_micro2
FROM call a JOIN csur s USING (i)
""",
    tags=("pipeline", "dedup", "embeddings"),
    doc="does exact dedup MOVE the corpus in embedding space? squared L2 "
    "between the full-corpus centroid and the exact-dedup-survivor "
    "centroid, both in exact integer micro-units (the split-centroid-"
    "shift recipe applied to a selection instead of a split) — the "
    "geometric twin of p_dedup_quality_shift: duplicated content is not "
    "uniformly distributed, so removing it shifts the mean vector and "
    "with it every downstream centroid/threshold calibrated on the raw "
    "corpus; uses the doc_id = vec_id alignment.  Two bounded "
    "aggregations over ONE cached corpus frame",
)
def q_dedup_centroid_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from kafka_replicator_spark.cacheutil import track_cached

    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("vec_id"), "text"
    )
    me = track_cached(
        emb.join(docs, "vec_id").select("vec_id", micro_units("embedding").alias("me"), "text")
    )
    surv = (
        me.withColumn("rn", F.row_number().over(W.partitionBy(F.md5("text")).orderBy("vec_id")))
        .filter(F.col("rn") == 1)
        .select("vec_id")
    )
    dims = me.select("vec_id", F.posexplode("me").alias("i", "v"))
    call = dims.groupBy("i").agg(
        F.expr("CAST(sum(v) div count(1) AS BIGINT)").alias("mu_a"),
        F.count(F.lit(1)).cast("long").alias("n_a"),
    )
    csur = (
        dims.join(surv, "vec_id")
        .groupBy("i")
        .agg(
            F.expr("CAST(sum(v) div count(1) AS BIGINT)").alias("mu_s"),
            F.count(F.lit(1)).cast("long").alias("n_s"),
        )
    )
    return call.join(csur, "i").agg(
        F.min("n_a").cast("long").alias("n_all"),
        F.min("n_s").cast("long").alias("n_survivors"),
        F.sum((F.col("mu_a") - F.col("mu_s")) * (F.col("mu_a") - F.col("mu_s")))
        .cast("long")
        .alias("shift_sq_micro2"),
    )


# --------------------------------------------- IVFPQ shortlist curve

_SHORTLIST_ARMS = (5, 10, 20)


def _ivfpq_shortlist_oracle() -> str:
    from kafka_replicator_spark.functions.similarity import (
        _PQ_DIST_SQL,
        ivf_pq_scored_sql_ctes,
    )

    dist = _PQ_DIST_SQL
    denom = len(_RERANK_PROBES) * 5
    arms = []
    for s in _SHORTLIST_ARMS:
        arms.append(f"""
SELECT CAST({s} AS BIGINT) AS shortlist,
       CAST(count(*) AS BIGINT) AS n_hits,
       CAST((count(*) * 1000000) // {denom} AS BIGINT) AS recall_ppm
FROM (
  SELECT probe_id, neighbor_id FROM (
    SELECT probe_id, neighbor_id,
           row_number() OVER (
             PARTITION BY probe_id ORDER BY l2_dist ASC, neighbor_id ASC) AS rn
    FROM rr_m WHERE adc_rn <= {s}
  ) WHERE rn <= 5
) a JOIN exact USING (probe_id, neighbor_id)""")
    u = " UNION ALL ".join(arms)
    return f"""
{ivf_pq_scored_sql_ctes(_RERANK_PROBES, shortlist=max(_SHORTLIST_ARMS))},
rr_m AS MATERIALIZED (SELECT * FROM rr),
scored_exact AS (
  SELECT probe_id, q.vec_id AS neighbor_id,
         {dist.format(a='pqe', b='qe')} AS l2
  FROM q, probe_q WHERE q.vec_id <> probe_id
),
exact AS MATERIALIZED (
  SELECT probe_id, neighbor_id FROM (
    SELECT probe_id, neighbor_id,
           row_number() OVER (PARTITION BY probe_id ORDER BY l2 ASC, neighbor_id ASC) AS rn
    FROM scored_exact
  ) WHERE rn <= 5
)
SELECT * FROM ({u}) ORDER BY shortlist
"""


@register(
    "p_ivfpq_shortlist_curve",
    _ivfpq_shortlist_oracle(),
    tags=("pipeline", "similarity", "eval"),
    doc="shortlist-size sensitivity of the IVFPQ refine step: recall@5 vs "
    f"exact int8 L2 at shortlist {_SHORTLIST_ARMS}, every arm carved out "
    "of ONE scored candidate frame (similarity.ivf_pq_scored — the ADC "
    "prefix property makes arm s just a filter adc_rank <= s, so the "
    "sweep costs one chain, not three; single-sourced with the rerank "
    "via ivf_pq_scored_sql_ctes).  Where the curve flattens is the "
    "shortlist the deployment should pay for; recall@5 at shortlist 5 "
    "isolates pure-ADC ranking quality (no refine headroom at all)",
)
def q_ivfpq_shortlist_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from kafka_replicator_spark.cacheutil import track_cached
    from kafka_replicator_spark.functions.similarity import (
        exact_int8_topk,
        ivf_pq_scored,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    scored = track_cached(
        ivf_pq_scored(emb, _RERANK_PROBES, shortlist=max(_SHORTLIST_ARMS))
    )
    exact = track_cached(exact_int8_topk(emb, _RERANK_PROBES, k=5))
    denom = len(_RERANK_PROBES) * 5
    w_arm = W.partitionBy("probe_id").orderBy(F.asc("l2_dist"), F.asc("neighbor_id"))
    out = None
    for s in _SHORTLIST_ARMS:
        approx = (
            scored.filter(F.col("adc_rank") <= s)
            .withColumn("rn", F.row_number().over(w_arm))
            .filter(F.col("rn") <= 5)
            .select("probe_id", "neighbor_id")
        )
        arm = approx.join(exact, ["probe_id", "neighbor_id"]).agg(
            F.lit(s).cast("long").alias("shortlist"),
            F.count(F.lit(1)).cast("long").alias("n_hits"),
            F.expr(f"CAST((count(1) * 1000000) div {denom} AS BIGINT)").alias("recall_ppm"),
        )
        out = arm if out is None else out.unionAll(arm)
    return out.orderBy("shortlist")


# --------------------------------------------- label-filtered IVFPQ


def _ivfpq_filtered_oracle() -> str:
    from kafka_replicator_spark.functions.similarity import ivf_pq_scored_sql_ctes

    ids = ", ".join(str(i) for i in _RERANK_PROBES)
    return f"""
{ivf_pq_scored_sql_ctes(_RERANK_PROBES, shortlist=20)},
lab AS (SELECT vec_id, label FROM embeddings),
plab AS (SELECT vec_id AS probe_id, label AS plabel FROM embeddings WHERE vec_id IN ({ids})),
filt AS (
  SELECT rr.probe_id, rr.neighbor_id, rr.l2_dist
  FROM rr
  JOIN lab ON lab.vec_id = rr.neighbor_id
  JOIN plab ON plab.probe_id = rr.probe_id
  WHERE lab.label = plab.plabel
),
ranked AS (
  SELECT probe_id, neighbor_id, l2_dist,
         row_number() OVER (
           PARTITION BY probe_id ORDER BY l2_dist ASC, neighbor_id ASC) AS rank
  FROM filt
)
SELECT probe_id, neighbor_id, CAST(rank AS INTEGER) AS rank, l2_dist
FROM ranked WHERE rank <= 3
"""


@register(
    "p_ivfpq_label_filtered",
    _ivfpq_filtered_oracle(),
    tags=("pipeline", "similarity"),
    doc="label-FILTERED IVFPQ search (the filtered-vector-search problem: "
    "'nearest neighbors WHERE label = X'): post-filtering over the "
    "shared scored-candidate chain (similarity.ivf_pq_scored) — the "
    "shortlist is built label-blind, then restricted to the probe's own "
    "label before the final rank, which is exactly why production "
    "post-filtering needs a LARGER shortlist (a selective filter can "
    "empty it — visible here as probes returning < 3 rows); the "
    "pre-filtering alternative is label_knn_graph's label-blocked join. "
    "Label lookups are probe-grain/bounded joins on the <=20-row "
    "shortlist",
)
def q_ivfpq_label_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from kafka_replicator_spark.functions.similarity import ivf_pq_scored

    emb = load_table(spark, sf_dir, "embeddings")
    scored = ivf_pq_scored(emb, _RERANK_PROBES, shortlist=20)
    lab = emb.select("vec_id", "label")
    plab = emb.filter(F.col("vec_id").isin(_RERANK_PROBES)).select(
        F.col("vec_id").alias("probe_id"), F.col("label").alias("plabel")
    )
    filt = (
        scored.join(lab, scored.neighbor_id == lab.vec_id)
        .join(F.broadcast(plab), "probe_id")
        .filter(F.col("label") == F.col("plabel"))
        .select("probe_id", "neighbor_id", "l2_dist")
    )
    w = W.partitionBy("probe_id").orderBy(F.asc("l2_dist"), F.asc("neighbor_id"))
    return (
        filt.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select(
            "probe_id",
            "neighbor_id",
            F.col("rank").cast("int").alias("rank"),
            F.col("l2_dist").cast("long").alias("l2_dist"),
        )
    )


# --------------------------------------------- substring cut convergence


@register(
    "p_substring_convergence",
    f"""
WITH k1 AS MATERIALIZED (SELECT * FROM ({substring_cut_sql(_SUBSTR_W)})),
c1 AS MATERIALIZED (SELECT doc_id, source, clean_text AS text FROM k1),
k2 AS MATERIALIZED (SELECT * FROM ({substring_cut_sql(_SUBSTR_W, rel='c1')})),
c2 AS MATERIALIZED (SELECT doc_id, source, clean_text AS text FROM k2),
k3 AS MATERIALIZED (SELECT * FROM ({substring_cut_sql(_SUBSTR_W, rel='c2')}))
SELECT CAST(1 AS BIGINT) AS round, CAST(sum(CASE WHEN cut_tokens > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_cut,
       CAST(sum(cut_tokens) AS BIGINT) AS cut_tokens FROM k1
UNION ALL
SELECT CAST(2 AS BIGINT), CAST(sum(CASE WHEN cut_tokens > 0 THEN 1 ELSE 0 END) AS BIGINT),
       CAST(sum(cut_tokens) AS BIGINT) FROM k2
UNION ALL
SELECT CAST(3 AS BIGINT), CAST(sum(CASE WHEN cut_tokens > 0 THEN 1 ELSE 0 END) AS BIGINT),
       CAST(sum(cut_tokens) AS BIGINT) FROM k3
ORDER BY round
""",
    tags=("pipeline", "dedup", "eval"),
    doc="fixed-point convergence of the windowed ExactSubstr cut: three "
    "unrolled rounds of cut-the-previous-output (the Lee et al. "
    "implementation iterates to convergence; p_cut_idempotence showed "
    "ONE round leaves residue — this query shows the DECAY RATE, the "
    "number that decides how many passes a production pipeline budgets); "
    "rounds are SIBLING CTE scopes in one top-level WITH per the DuckDB "
    "MATERIALIZED ancestor-chain alias rule.  Each round is one full "
    "cut chain; cut_tokens should fall steeply round over round",
)
def q_substring_convergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_replicator_spark.cacheutil import track_cached

    docs = load_table(spark, sf_dir, "documents")
    out = None
    cur = docs.select("doc_id", "source", "text")
    for rnd in (1, 2, 3):
        cut = track_cached(substring_cut(cur, w=_SUBSTR_W))
        arm = cut.agg(
            F.lit(rnd).cast("long").alias("round"),
            F.sum(F.when(F.col("cut_tokens") > 0, 1).otherwise(0))
            .cast("long")
            .alias("docs_cut"),
            F.sum("cut_tokens").cast("long").alias("cut_tokens"),
        )
        out = arm if out is None else out.unionAll(arm)
        cur = cut.select("doc_id", "source", F.col("clean_text").alias("text"))
    return out.orderBy("round")


# --------------------------------------------- per-split Zipf drift

_ZIPF_SPLITS = ("test", "train", "val")
_ZIPF_SPLIT_K = 50


def _split_zipf_oracle() -> str:
    arms = []
    for s in _ZIPF_SPLITS:
        arms.append(f"""
SELECT '{s}' AS split, tok, freq,
       row_number() OVER (ORDER BY freq DESC, tok ASC) AS rank
FROM (SELECT tok, freq FROM vocab WHERE split = '{s}'
      ORDER BY freq DESC, tok ASC LIMIT {_ZIPF_SPLIT_K})""")
    u = " UNION ALL ".join(arms)
    return f"""
WITH vocab AS MATERIALIZED (
  SELECT {split_assign_sql('doc_id')} AS split, tok, CAST(count(*) AS BIGINT) AS freq
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
  GROUP BY split, tok
),
top AS ({u}),
terms AS (
  SELECT split,
         CAST(round(ln(CAST(rank AS DOUBLE)), 9) AS DECIMAL(18,9)) AS x,
         CAST(round(ln(CAST(freq AS DOUBLE)), 9) AS DECIMAL(18,9)) AS y
  FROM top
),
m AS (
  SELECT split, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x * y) AS sxy, sum(x * x) AS sxx
  FROM terms GROUP BY split
)
SELECT split, CAST(n AS BIGINT) AS n_terms,
       round((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / nullif(n * CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0.0), 6)
           AS zipf_slope
FROM m ORDER BY split
"""


@register(
    "p_split_zipf_drift",
    _split_zipf_oracle(),
    tags=("pipeline", "drift"),
    doc="Zipf-slope drift across the house train/val/test split — the "
    "frequency-STRUCTURE axis of the split-representativeness family "
    "(token JS measures which words, label chi2 measures classes, "
    "centroid shift measures geometry; this measures how head-heavy "
    f"each split's distribution is): per-split top-{_ZIPF_SPLIT_K} OLS "
    "of ln freq on ln rank, one arm per literal split so each top-k cut "
    "is a distributed TakeOrdered (never a vocab-scale window — the r05 "
    "rule), ln re-quantized to 9 dp DECIMAL before the moment fold, "
    "house nullif guard on the degenerate denominator.  A val slope far "
    "from train's says the 1% split over-sampled boilerplate",
)
def q_split_zipf_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from kafka_replicator_spark.cacheutil import track_cached

    docs = load_table(spark, sf_dir, "documents")
    vocab = track_cached(
        spread(docs)
        .select(split_assign_col("doc_id").alias("split"), F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("split", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    tops = None
    for s in _ZIPF_SPLITS:
        arm = (
            vocab.filter(F.col("split") == s)
            .orderBy(F.desc("freq"), F.asc("tok"))
            .limit(_ZIPF_SPLIT_K)
            .withColumn(
                "rank", F.row_number().over(W.orderBy(F.desc("freq"), F.asc("tok")))
            )
        )
        tops = arm if tops is None else tops.unionAll(arm)
    terms = tops.select(
        "split",
        F.round(F.log(F.col("rank").cast("double")), 9).cast("decimal(18,9)").alias("x"),
        F.round(F.log(F.col("freq").cast("double")), 9).cast("decimal(18,9)").alias("y"),
    )
    m = terms.groupBy("split").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy, sxx = F.col("sxy").cast("double"), F.col("sxx").cast("double")
    slope = (n * sxy - sx * sy) / F.nullif(n * sxx - sx * sx, F.lit(0.0))
    return m.select(
        "split",
        F.col("n").cast("long").alias("n_terms"),
        F.round(slope, 6).alias("zipf_slope"),
    ).orderBy("split")


# --------------------------------------------- per-split OOV rate


@register(
    "p_split_oov_rate",
    f"""
WITH toks AS MATERIALIZED (
  SELECT {split_assign_sql('doc_id')} AS split, tok
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
),
train_vocab AS MATERIALIZED (
  SELECT DISTINCT tok FROM toks WHERE split = 'train'
),
ev AS (
  SELECT t.split, CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
  FROM toks t LEFT JOIN train_vocab v ON v.tok = t.tok
  WHERE t.split <> 'train'
  GROUP BY t.split
)
SELECT split, n_tokens, n_oov,
       CAST((n_oov * 1000000) // nullif(n_tokens, 0) AS BIGINT) AS oov_ppm
FROM ev ORDER BY split
""",
    tags=("pipeline", "drift", "eval"),
    doc="out-of-vocabulary rate of the val/test splits against the TRAIN "
    "split's vocabulary — the held-out coverage gauge p_oov_rate (corpus "
    "x fixed stopword vocab) cannot see: every val/test token unseen in "
    "train maps to <unk> at training time, so a high oov_ppm here "
    "predicts inflated held-out perplexity (p_e2e_heldout_perplexity's "
    "OOV column measures the same boundary at bigram grain).  One token "
    "pass + a train-vocab anti-membership left join keyed on the token",
)
def q_split_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_replicator_spark.cacheutil import track_cached

    docs = load_table(spark, sf_dir, "documents")
    toks = track_cached(
        spread(docs).select(
            split_assign_col("doc_id").alias("split"),
            F.explode(F.split("text", " ")).alias("tok"),
        )
    )
    train_vocab = toks.filter(F.col("split") == "train").select("tok").distinct()
    ev = (
        toks.filter(F.col("split") != "train")
        .join(train_vocab.withColumn("__in", F.lit(1)), "tok", "left")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum(F.when(F.col("__in").isNull(), 1).otherwise(0)).cast("long").alias("n_oov"),
        )
    )
    return ev.select(
        "split",
        "n_tokens",
        "n_oov",
        F.expr("CAST((n_oov * 1000000) div nullif(n_tokens, 0) AS BIGINT)").alias("oov_ppm"),
    ).orderBy("split")


# --------------------------------------------- per-source token entropy


@register(
    "p_source_token_entropy",
    """
WITH tc AS MATERIALIZED (
  SELECT source, tok, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents)
  GROUP BY source, tok
),
per_source AS (
  SELECT source,
         CAST(sum(c) AS BIGINT) AS n_tokens,
         CAST(count(*) AS BIGINT) AS n_types,
         CAST(sum(c * CAST(floor(ln(CAST(c AS DOUBLE)) * 1000000000 + 0.5)
                           AS HUGEINT)) AS HUGEINT) AS slc
  FROM tc GROUP BY source
)
SELECT source, n_tokens, n_types,
       CAST(CAST(floor(ln(CAST(n_tokens AS DOUBLE)) * 1000000000 + 0.5) AS HUGEINT)
            - slc // n_tokens AS BIGINT) AS entropy_nano_nats
FROM per_source ORDER BY source
""",
    tags=("pipeline", "quality"),
    doc="per-source unigram Shannon entropy in exact integer nano-nats — "
    "H = ln(T) - sum(c * ln(c)) / T with every ln re-quantized via "
    "floor(x*1e9 + 0.5) BEFORE the cross-row fold (the r09 ln rule) and "
    "the fold lifted to HUGEINT/DECIMAL; the source-grain diversity "
    "profile next to p_doc_entropy (doc grain) and p_source_lang_entropy "
    "(language grain): a low-entropy source is template-heavy and is "
    "exactly where the substring cutter and the repetition gate earn "
    "their keep.  One distinct-type aggregation, no windows",
)
def q_source_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tc = (
        spread(docs)
        .select("source", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    per_source = tc.groupBy("source").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum(
            F.col("c")
            * F.floor(F.log(F.col("c").cast("double")) * 1e9 + F.lit(0.5)).cast(
                "decimal(38,0)"
            )
        ).alias("slc"),
    )
    return per_source.select(
        "source",
        "n_tokens",
        "n_types",
        F.expr(
            "CAST(CAST(floor(ln(CAST(n_tokens AS DOUBLE)) * 1000000000 + 0.5)"
            " AS DECIMAL(38,0)) - slc div n_tokens AS BIGINT)"
        ).alias("entropy_nano_nats"),
    ).orderBy("source")
