"""Extension operators: document deduplication at training-data scale.

Beyond the reference surface (BASELINE.json extension contract): exact
hash dedup, MinHash+LSH near-dup candidates, n-gram Jaccard verification
and SimHash — all over the `documents` table, all expressed with
JVM-side built-ins (no Python UDFs) and hash-compatible with the DuckDB
oracle via ``functions.hashing``.

Scale design (100 TB): every step is a shuffle on a bounded key
(fingerprint / band bucket), never an all-pairs product. The LSH
band join produces |bucket|² pairs only inside identical-signature
buckets; signature width (2 bands × 4 rows) is tuned so buckets stay
tiny at high similarity thresholds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_spark_realtime_spark.functions import hashing as H
from bigdata_spark_realtime_spark.plans.registry import register
from bigdata_spark_realtime_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# exact dedup — hash-groupBy on the normalized text fingerprint
# ---------------------------------------------------------------------------

NORM_SQL = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"

EXACT_ORACLE = f"""
SELECT md5({NORM_SQL}) AS fingerprint,
       CAST(min(doc_id) AS BIGINT) AS keep_doc_id,
       count(*) AS n_docs
FROM documents
GROUP BY 1
"""


def norm_text(col: F.Column) -> F.Column:
    return F.lower(F.trim(F.regexp_replace(col, r"\s+", " ")))


@register("ext_dedup_exact", oracle=EXACT_ORACLE)
def ext_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: md5 of whitespace-normalized lowercased text; keeper =
    min doc_id per group. One shuffle on the 16-byte fingerprint."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.md5(norm_text(F.col("text"))).alias("fingerprint"))
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )


# ---------------------------------------------------------------------------
# MinHash + LSH — shingle → K minhashes → banded bucket join
# ---------------------------------------------------------------------------

# shared CTE: distinct shingle sets + signatures (DuckDB side)
_SIG_CTE = f"""
WITH sh AS (
  SELECT doc_id,
         list_distinct({H.shingles_sql('toks')}) AS shingles
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
  WHERE len(toks) >= {H.SHINGLE_W}
),
hs AS (
  SELECT doc_id, shingles, {H.hashed_shingles_sql('shingles')} AS hsh FROM sh
),
sig AS (
  SELECT doc_id, shingles,
         {', '.join(f"{H.minhash_sql('hsh', j)} AS m{j}" for j in range(H.K))}
  FROM hs
),
bands AS (
  SELECT doc_id, 0 AS band, m0 * {H.P} + m1 AS k1, m2 * {H.P} + m3 AS k2 FROM sig
  UNION ALL
  SELECT doc_id, 1 AS band, m4 * {H.P} + m5 AS k1, m6 * {H.P} + m7 AS k2 FROM sig
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a
  JOIN bands b ON a.band = b.band AND a.k1 = b.k1 AND a.k2 = b.k2
              AND a.doc_id < b.doc_id
)
"""

MINHASH_ORACLE = _SIG_CTE + "SELECT doc_a, doc_b FROM cand"


def _shingle_rows(spark: SparkSession, sf_dir: str, w: int = H.SHINGLE_W) -> DataFrame:
    """(doc_id, shingle) rows via posexplode + window lead.

    Deliberately NOT an array-lambda (`transform(sequence(...), i ->
    element_at(toks, i+1) ...)`): higher-order functions run interpreted,
    Catalyst re-inlines `split(text)` into every element_at call (O(n²)
    per doc), and predicate pushdown duplicates the whole tree into
    join-key null checks — measured 30 s+ at sf0.1. The explode+lead
    shape tokenizes once, stays in whole-stage codegen, and its shuffle
    key (doc_id) is exactly how shingling parallelizes on a cluster."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "t0")
    )
    win = Window.partitionBy("doc_id").orderBy("pos")
    leads = [F.lead("t0", i).over(win).alias(f"t{i}") for i in range(1, w)]
    return (
        tok.select("doc_id", "t0", *leads)
        .where(F.col(f"t{w-1}").isNotNull())
        .select(
            "doc_id",
            F.concat_ws(" ", *[f"t{i}" for i in range(w)]).alias("shingle"),
        )
    )


def _shingle_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_id → distinct 3-token shingle set (array column, for Jaccard)."""
    return (
        _shingle_rows(spark, sf_dir)
        .groupBy("doc_id")
        .agg(F.collect_set("shingle").alias("shingles"))
    )


def _signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_id + K minhash columns m0..m{K-1}: hash each shingle once
    (codegen'd md5), reduce to K mins in one partial+final aggregation.
    Duplicate shingles can't change a minimum, so no distinct needed."""
    hashed = _shingle_rows(spark, sf_dir).select(
        "doc_id", (H.h32(F.col("shingle")) % H.P).alias("h")
    )
    return hashed.groupBy("doc_id").agg(
        *[
            F.min((F.lit(H.MINHASH_A[j]) * F.col("h") + H.MINHASH_B[j]) % H.P).alias(
                f"m{j}"
            )
            for j in range(H.K)
        ]
    )


def _bands(sig: DataFrame) -> DataFrame:
    """One row per (doc, band): band key packed into two int64s. A single
    explode over the signature row — no union, so the signature pipeline
    is evaluated exactly once."""
    band_structs = F.array(
        F.struct(
            F.lit(0).alias("band"),
            (F.col("m0") * H.P + F.col("m1")).alias("k1"),
            (F.col("m2") * H.P + F.col("m3")).alias("k2"),
        ),
        F.struct(
            F.lit(1).alias("band"),
            (F.col("m4") * H.P + F.col("m5")).alias("k1"),
            (F.col("m6") * H.P + F.col("m7")).alias("k2"),
        ),
    )
    return sig.select("doc_id", F.explode(band_structs).alias("b")).select(
        "doc_id", "b.band", "b.k1", "b.k2"
    )


def _candidates(sig: DataFrame) -> DataFrame:
    """Bucket-local pair generation instead of a self-join: group by band
    bucket, emit doc_id pairs inside each bucket. One shuffle on the
    bucket key; bucket sizes are tiny by LSH design, so the in-bucket
    product is bounded — the shape that survives 100 TB."""
    buckets = (
        _bands(sig)
        .groupBy("band", "k1", "k2")
        .agg(F.collect_list("doc_id").alias("ids"))
        .where(F.size("ids") >= 2)
    )
    pairs = F.filter(
        F.flatten(
            F.transform(
                "ids",
                lambda x: F.transform("ids", lambda y: F.struct(x.alias("a"), y.alias("b"))),
            )
        ),
        lambda p: p["a"] < p["b"],
    )
    return (
        buckets.select(F.explode(pairs).alias("p"))
        .select(F.col("p.a").alias("doc_a"), F.col("p.b").alias("doc_b"))
        .distinct()
    )


@register("ext_dedup_minhash_lsh", oracle=MINHASH_ORACLE)
def ext_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup candidate pairs via MinHash-LSH: 3-token shingles →
    8 universal-hash minima → 2 bands × 4 rows → equi-join on band
    signature. The only shuffle keys are the band buckets."""
    return _candidates(_signatures(spark, sf_dir))


# ---------------------------------------------------------------------------
# cluster → keeper resolution: connected components over the LSH pair
# graph. THE row-dropping step of a training-data dedup: keep exactly the
# rows where keeper_id == doc_id.
# ---------------------------------------------------------------------------

# the oracle computes the same fixpoint as transitive closure: keeper =
# min doc id reachable in the candidate-pair graph (RECURSIVE applies to
# the whole WITH clause, so the shared signature CTEs just ride along)
RESOLVE_ORACLE = _SIG_CTE.replace("WITH ", "WITH RECURSIVE ", 1) + """
, edges AS (
  SELECT doc_a AS a, doc_b AS b FROM cand
  UNION
  SELECT doc_b AS a, doc_a AS b FROM cand
),
reach(node, reached) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.node, e.b FROM reach r JOIN edges e ON r.reached = e.a
)
SELECT d.doc_id,
       coalesce(least(d.doc_id, min(r.reached)), d.doc_id) AS keeper_id
FROM documents d LEFT JOIN reach r ON d.doc_id = r.node
GROUP BY d.doc_id
"""


@register("ext_dedup_resolve", oracle=RESOLVE_ORACLE)
def ext_dedup_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, keeper_id) for every document: keeper = min doc id of the
    MinHash-LSH duplicate cluster (connected components via label
    propagation, operators/components.py), itself when it has no
    near-dups. `WHERE keeper_id = doc_id` is the dedup'd corpus."""
    from bigdata_spark_realtime_spark.operators.components import resolve_keepers

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    pairs = _candidates(_signatures(spark, sf_dir))
    return resolve_keepers(docs, "doc_id", pairs, "doc_a", "doc_b")


# ---------------------------------------------------------------------------
# n-gram Jaccard verification of the LSH candidates
# ---------------------------------------------------------------------------

JACCARD_THRESHOLD = 0.8

JACCARD_ORACLE = _SIG_CTE + f"""
SELECT c.doc_a, c.doc_b,
       round(len(list_intersect(s1.shingles, s2.shingles))::DOUBLE
             / len(list_distinct(s1.shingles || s2.shingles)), 4) AS jaccard
FROM cand c
JOIN sh s1 ON c.doc_a = s1.doc_id
JOIN sh s2 ON c.doc_b = s2.doc_id
WHERE len(list_intersect(s1.shingles, s2.shingles))::DOUBLE
      / len(list_distinct(s1.shingles || s2.shingles)) >= {JACCARD_THRESHOLD}
"""


@register("ext_dedup_ngram_jaccard", oracle=JACCARD_ORACLE)
def ext_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact shingle-set Jaccard over the LSH candidates (candidate
    generation is sub-quadratic; exact verification touches only
    |candidates| pairs)."""
    sh = _shingle_sets(spark, sf_dir)
    cand = _candidates(_signatures(spark, sf_dir))
    s1 = sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"))
    s2 = sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"))
    jac = F.size(F.array_intersect("sh_a", "sh_b")).cast("double") / F.size(
        F.array_union("sh_a", "sh_b")
    )
    return (
        cand.join(s1, "doc_a")
        .join(s2, "doc_b")
        .where(jac >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# SimHash — 32-bit weighted sign-sum fingerprint
# ---------------------------------------------------------------------------

SIMHASH_BITS = 32

_BIT_SUMS_SQL = ", ".join(
    f"sum(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS s{i}"
    for i in range(SIMHASH_BITS)
)
_BIT_COMBINE_SQL = " + ".join(
    f"(CASE WHEN s{i} > 0 THEN {1 << i} ELSE 0 END)" for i in range(SIMHASH_BITS)
)

SIMHASH_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, {H.h32_sql('t.tok')} AS h
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents) d,
       LATERAL (SELECT unnest(toks) AS tok) t
),
bits AS (SELECT doc_id, {_BIT_SUMS_SQL} FROM tok GROUP BY doc_id)
SELECT doc_id, CAST({_BIT_COMBINE_SQL} AS BIGINT) AS simhash
FROM bits
"""


@register("ext_dedup_simhash", oracle=SIMHASH_ORACLE)
def ext_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash: per-token 32-bit hash, ±1 sign sum per bit position,
    fingerprint bit = sign of the sum. explode → single partial+final
    aggregation (32 sums), no per-row Python."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).select("doc_id", H.h32(F.col("tok")).alias("h"))
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(1) == 1, 1).otherwise(-1)
        ).alias(f"s{i}")
        for i in range(SIMHASH_BITS)
    ]
    bits = tok.groupBy("doc_id").agg(*bit_sums)
    combine = None
    for i in range(SIMHASH_BITS):
        term = F.when(F.col(f"s{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
        combine = term if combine is None else combine + term
    return bits.select("doc_id", combine.cast("long").alias("simhash"))


# ---------------------------------------------------------------------------
# embedding near-dup — top-K most-similar vector pairs (cosine), blocked
# by label (the coarse-quantizer cell at 100 TB; see ext_similarity)
# ---------------------------------------------------------------------------

NEARDUP_TOPK = 20

EMB_NEARDUP_ORACLE = f"""
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) AS cos_sim
FROM embeddings a
JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
ORDER BY cos_sim DESC, vec_a, vec_b
LIMIT {NEARDUP_TOPK}
"""


def cosine(a: F.Column, b: F.Column) -> F.Column:
    """Cosine over array<double> with a deterministic left-to-right fold
    (bit-identical to DuckDB's list_cosine_similarity accumulation)."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v * v))
    return dot / (na * nb)


def emb_double(df: DataFrame) -> DataFrame:
    return df.withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )


@register("ext_dedup_embedding", oracle=EMB_NEARDUP_ORACLE)
def ext_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup: cosine over within-label pairs, global top-K.
    Label-blocking stands in for the IVF cell id — at 100 TB the
    all-pairs product only ever happens inside a cell."""
    emb = emb_double(load_table(spark, sf_dir, "embeddings"))
    a = emb.select(
        F.col("label").alias("label_a"),
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("e_a"),
    )
    b = emb.select(
        F.col("label").alias("label_b"),
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("e_b"),
    )
    return (
        a.join(b, (F.col("label_a") == F.col("label_b")) & (F.col("vec_a") < F.col("vec_b")))
        .select(
            "vec_a",
            "vec_b",
            F.round(cosine(F.col("e_a"), F.col("e_b")), 4).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), "vec_a", "vec_b")
        .limit(NEARDUP_TOPK)
    )


# ---------------------------------------------------------------------------
# SimHash near-dup pairs: 4×8-bit band blocking + exact hamming verify
# ---------------------------------------------------------------------------

HAMMING_MAX = 3
SIMHASH_BANDS = 4  # pigeonhole: hamming <= 3 flips at most 3 of 4 bands,
#                    so at least one 8-bit band is bit-identical

SIMHASH_PAIRS_ORACLE = f"""
WITH sh AS ({SIMHASH_ORACLE}),
bands AS (
  SELECT doc_id, simhash, b, (simhash >> (b * 8)) & 255 AS key
  FROM sh, (SELECT unnest(range({SIMHASH_BANDS})) AS b)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.b = b.b AND a.key = b.key AND a.doc_id < b.doc_id
)
SELECT c.doc_a, c.doc_b,
       CAST(bit_count(xor(s1.simhash, s2.simhash)) AS INT) AS hamming
FROM cand c JOIN sh s1 ON c.doc_a = s1.doc_id JOIN sh s2 ON c.doc_b = s2.doc_id
WHERE bit_count(xor(s1.simhash, s2.simhash)) <= {HAMMING_MAX}
"""


@register("ext_dedup_simhash_pairs", oracle=SIMHASH_PAIRS_ORACLE)
def ext_dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by SimHash: an 8-bit band must match exactly
    (pigeonhole: hamming <= 3 over 32 bits flips at most 3 of the 4
    disjoint bands, so at least one band is identical — the 2-band/16-bit
    variant only guaranteed recall for hamming <= 1), then exact hamming
    distance filters. Same bucket-local pair generation as the MinHash
    path — no self-join."""
    return simhash_pairs_from(ext_dedup_simhash(spark, sf_dir))


def simhash_pairs_from(sh: DataFrame) -> DataFrame:
    """Band-block + exact-hamming-verify over a (doc_id, simhash) frame.

    Split out so tests can feed synthetic fingerprints and assert the
    recall contract directly (e.g. a pair differing at bits {0, 16} —
    dropped by the old 2×16-bit blocking — must be found)."""
    bands = sh.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("b"),
                        F.shiftright("simhash", b * 8).bitwiseAND(255).alias("key"),
                    )
                    for b in range(SIMHASH_BANDS)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.b", "bb.key")
    buckets = (
        bands.groupBy("b", "key")
        .agg(F.collect_list("doc_id").alias("ids"))
        .where(F.size("ids") >= 2)
    )
    pairs = F.filter(
        F.flatten(
            F.transform(
                "ids",
                lambda x: F.transform("ids", lambda y: F.struct(x.alias("a"), y.alias("b"))),
            )
        ),
        lambda p: p["a"] < p["b"],
    )
    cand = (
        buckets.select(F.explode(pairs).alias("p"))
        .select(F.col("p.a").alias("doc_a"), F.col("p.b").alias("doc_b"))
        .distinct()
    )
    s1 = sh.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sh_a"))
    s2 = sh.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sh_b"))
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        cand.join(s1, "doc_a")
        .join(s2, "doc_b")
        .where(hamming <= HAMMING_MAX)
        .select("doc_a", "doc_b", hamming.cast("int").alias("hamming"))
    )
