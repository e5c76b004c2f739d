"""Operator registry: every SQL-expressible operator from SURVEY.md §2 as a
(Spark DataFrame callable, DuckDB oracle SQL) pair over the driver's
testdata tables, plus Spark-only entries (rows-only checks) for the
genuinely non-SQL-expressible ops (the iterative crawl, IVF ANN, the
multimodal decode plumbing).

Design rules (driver compare = row-count + schema + order-insensitive
value hash):
- every computed column is aliased identically on both sides;
- floating-point results of *aggregations* are rounded (4-6 dp) on both
  sides; per-row arithmetic follows identical operation order (sequential
  folds) so it is bit-identical before rounding;
- integer-typed results are casted so Spark and DuckDB agree (row_number
  -> int vs bigint, size() -> int vs len() -> bigint);
- timestamps are formatted to strings to dodge timezone representation
  differences.

Operator-id cross references point into SURVEY.md §2 and the reference
(/root/reference/src/main/scala/ru/wordmetrix/webcrawler/...).
"""

from __future__ import annotations

import math
from collections.abc import Callable

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

_TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# tokenization must match regexp_split_to_array(lower(text), '\s+') + strip ''
_TOKS = r"filter(split(lower(text), '\\s+'), t -> t <> '')"
_SQL_TOKS = r"list_filter(regexp_split_to_array(lower(text), '\s+'), t -> t <> '')"

_STOPWORDS = ("the", "a", "of", "and", "in", "is", "to", "for")
_SQL_STOPLIST = "[" + ", ".join(f"'{w}'" for w in _STOPWORDS) + "]"
_SPARK_STOPLIST = "array(" + ", ".join(f"'{w}'" for w in _STOPWORDS) + ")"


def _tokens(df: DataFrame) -> DataFrame:
    return df.withColumn("toks", F.expr(_TOKS))


def _docs_parallel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents spread across the cluster: the sf-scale table arrives as
    one small file (1 input split); compute-heavy per-doc ops (shingling,
    hashing) repartition so the map side uses every core — at real scale
    the input is already thousands of splits and this is a no-op choice."""
    return _read(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )


def _dot_expr(a: str, b: str) -> str:
    """Sequential-fold dot product of two float arrays, computed in double —
    identical fold order on both engines => bit-identical before rounding
    (A1, SURVEY §2.6; reference vector ops are external lib call sites)."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)), "
        f"cast(0.0 as double), (acc, v) -> acc + v)"
    )


def _sql_dot(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(list_zip({a}, {b}), "
        f"x -> x[1]::DOUBLE * x[2]::DOUBLE))"
    )


def _sqdist_expr(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> "
        f"(cast(x as double) - cast(y as double)) * (cast(x as double) - cast(y as double))), "
        f"cast(0.0 as double), (acc, v) -> acc + v)"
    )


def _sql_sqdist(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(list_zip({a}, {b}), "
        f"x -> (x[1]::DOUBLE - x[2]::DOUBLE) * (x[1]::DOUBLE - x[2]::DOUBLE)))"
    )


# ---------------------------------------------------------------------------
# 1. frontier / scheduling operators (SURVEY §2.5) over `events` as frontier:
#    event_id ~ seed_id, user_id ~ host, value ~ priority
# ---------------------------------------------------------------------------


def q_frontier_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 — priority-queue head order: ORDER BY priority DESC, seed_id ASC
    (EvaluatePriorityMatrix.scala:81-97)."""
    return (
        _read(spark, sf_dir, "events")
        .select(F.col("event_id").alias("seed_id"), F.col("value").alias("priority"))
        .orderBy(F.desc("priority"), F.asc("seed_id"))
        .limit(100)
    )


SQL_FRONTIER_TOPK = """
SELECT event_id AS seed_id, value AS priority
FROM events ORDER BY value DESC, event_id ASC LIMIT 100
"""


def q_breadth_fifo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 — breadth-first mode: FIFO by seed_id (NetworkEstimator.scala:43-48)."""
    return (
        _read(spark, sf_dir, "events")
        .select(F.col("event_id").alias("seed_id"), F.col("event_type").alias("kind"))
        .orderBy(F.asc("seed_id"))
        .limit(100)
    )


SQL_BREADTH_FIFO = """
SELECT event_id AS seed_id, event_type AS kind
FROM events ORDER BY event_id ASC LIMIT 100
"""


def q_politeness_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5 — per-host politeness budget: row_number window per host, keep
    top-3 by (priority DESC, seed_id ASC) (SeedQueue.scala:92-133 semantics
    re-expressed as a window)."""
    ev = _read(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        ev.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select(
            F.col("event_id").alias("seed_id"),
            F.col("user_id").alias("host"),
            F.col("value").alias("priority"),
            "rk",
        )
    )


SQL_POLITENESS_WINDOW = """
SELECT event_id AS seed_id, user_id AS host, value AS priority, rk
FROM (
  SELECT event_id, user_id, value,
         CAST(row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id ASC) AS INTEGER) AS rk
  FROM events
) t WHERE rk <= 3
"""


def q_first_seen_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RevMap — dense first-seen id assignment from 1
    (EvaluatePriorityMatrix.scala:103-129): entity order = first occurrence."""
    ev = _read(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(F.min("event_id").alias("first_ev"))
    w = Window.orderBy("first_ev")
    return firsts.select(
        "user_id", F.row_number().over(w).cast("long").alias("seed_id")
    )


SQL_FIRST_SEEN_IDS = """
SELECT user_id, CAST(row_number() OVER (ORDER BY first_ev ASC) AS BIGINT) AS seed_id
FROM (SELECT user_id, min(event_id) AS first_ev FROM events GROUP BY user_id) t
"""


# ---------------------------------------------------------------------------
# 2. dedup / membership (SURVEY §2.4)
# ---------------------------------------------------------------------------


def q_seen_antijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1 — URL-seen filter as an anti-join (Gather.scala:126,165-177):
    newly-emitted (user, day) click pairs with no matching view = links not
    in the seen set."""
    ev = _read(spark, sf_dir, "events").withColumn(
        "d", F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd")
    )
    clicks = (
        ev.filter(F.col("event_type") == "click").select("user_id", "d").distinct()
    )
    seen = ev.filter(F.col("event_type") == "view").select("user_id", "d")
    return clicks.join(seen, ["user_id", "d"], "left_anti")


SQL_SEEN_ANTIJOIN = """
SELECT user_id, d FROM (
  SELECT DISTINCT user_id, strftime(date_trunc('day', ts), '%Y-%m-%d') AS d
  FROM events WHERE event_type = 'click'
) c WHERE NOT EXISTS (
  SELECT 1 FROM events v
  WHERE v.event_type = 'view' AND v.user_id = c.user_id
    AND strftime(date_trunc('day', v.ts), '%Y-%m-%d') = c.d
)
"""


def q_allowlist_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2 — host allowlist as a semi-join (Gather.scala:91,129-132)."""
    orders = _read(spark, sf_dir, "orders")
    cust = _read(spark, sf_dir, "customer").filter(F.col("c_nationkey") < 5)
    return orders.join(
        cust.select("c_custkey"), orders.o_custkey == cust.c_custkey, "left_semi"
    ).select("o_orderkey", "o_totalprice")


SQL_ALLOWLIST_SEMIJOIN = """
SELECT o_orderkey, o_totalprice FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_nationkey < 5)
"""


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup — hash-groupBy keeping the first-seen id per fingerprint
    (training-data pipeline surface; reference analogue = the page cache
    fetch-once idempotency, WebGet.scala:35-37)."""
    docs = _read(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.md5("text").alias("fp"))
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("dup_count"))
    )


SQL_DEDUP_EXACT = """
SELECT md5(text) AS fp, min(doc_id) AS keep_id, count(*) AS dup_count
FROM documents GROUP BY md5(text)
"""


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: md5 of whitespace-normalized lowercase text."""
    docs = _read(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.md5(F.regexp_replace(F.lower("text"), r"\s+", " ")).alias("fp"),
    )


SQL_DOC_FINGERPRINT = r"""
SELECT doc_id, md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fp
FROM documents
"""


def ngram_jaccard(docs: DataFrame, max_df: int | None = None) -> DataFrame:
    """Near-dup detection by 3-gram shingle Jaccard >= 0.5 over candidate
    pairs produced by a shingle-bucket join (no O(n^2) cross join).

    ``max_df`` is the web-scale knob against hot-shingle quadratic blowup
    (a shingle shared by d docs contributes d^2 rows to the bucket join;
    boilerplate shingles on a real corpus have d ~ 10^6). When set,
    candidate generation joins only on shingles whose document frequency
    is <= max_df (the hot list is tiny, so it broadcasts into an
    anti-join), and the Jaccard of each candidate pair is then computed
    EXACTLY over the pair's FULL shingle sets in a verification join
    bounded by |candidates| x doc shingles. The only semantic difference
    vs the exact path is pairs whose every shared shingle is hot
    (stop-shingle removal, standard near-dup practice). Default None =
    single-stage exact join, bit-identical to the DuckDB oracle."""
    docs = _tokens(docs).filter(F.expr("size(toks) >= 3"))
    sh = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks) - 2), i -> "
                "concat_ws(' ', element_at(toks, i), element_at(toks, i+1), element_at(toks, i+2)))"
            )
        ).alias("shingle"),
    ).distinct()
    counts = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    if max_df is None:
        a = sh.alias("a")
        b = sh.alias("b")
        inter = (
            a.join(b, "shingle")
            .filter(F.col("a.doc_id") < F.col("b.doc_id"))
            .groupBy(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
            .agg(F.count("*").alias("i"))
        )
    else:
        hot = (
            sh.groupBy("shingle")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > max_df)
            .select("shingle")
        )
        rare = sh.join(F.broadcast(hot), "shingle", "left_anti")
        a = rare.alias("a")
        b = rare.alias("b")
        cand = (
            a.join(b, "shingle")
            .filter(F.col("a.doc_id") < F.col("b.doc_id"))
            .select(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
            .distinct()
        )
        sha = sh.select(F.col("doc_id").alias("a_id"), "shingle")
        shb = sh.select(F.col("doc_id").alias("b_id"), "shingle")
        inter = (
            cand.join(sha, "a_id")
            .join(shb, ["b_id", "shingle"])
            .groupBy("a_id", "b_id")
            .agg(F.count("*").alias("i"))
        )
    return (
        inter.join(counts.withColumnRenamed("doc_id", "a_id").withColumnRenamed("n", "na"), "a_id")
        .join(counts.withColumnRenamed("doc_id", "b_id").withColumnRenamed("n", "nb"), "b_id")
        .withColumn("jaccard", F.round(F.col("i") / (F.col("na") + F.col("nb") - F.col("i")), 4))
        .filter(F.col("jaccard") >= 0.5)
        .select("a_id", "b_id", "jaccard")
    )


def q_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: the oracle-exact single-stage path (max_df=None)."""
    return ngram_jaccard(_docs_parallel(spark, sf_dir))


SQL_NGRAM_JACCARD_PAIRS = f"""
WITH toks AS (
  SELECT doc_id, {_SQL_TOKS} AS toks FROM documents
), sh AS (
  SELECT DISTINCT doc_id, unnest(list_transform(range(len(toks) - 2),
    i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])) AS shingle
  FROM toks WHERE len(toks) >= 3
), counts AS (
  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS i
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT a_id, b_id, round(i / (ca.n + cb.n - i), 4) AS jaccard
FROM inter JOIN counts ca ON a_id = ca.doc_id JOIN counts cb ON b_id = cb.doc_id
WHERE round(i / (ca.n + cb.n - i), 4) >= 0.5
"""


def connected_components(edges: DataFrame, max_iters: int = 32) -> DataFrame:
    """Connected components by min-label propagation: every node starts as
    its own representative; each round a node's rep becomes the min of its
    own and its neighbours' current reps; fixpoint in O(component diameter)
    rounds. Near-dup clusters have tiny diameters (pairs/triangles), so
    this converges in 2-3 rounds; a corpus with genuinely deep chains
    would swap in the large-star/small-star contraction, same contract.
    ``edges`` is (a_id, b_id) undirected-as-one-direction; returns
    (doc_id, rep) over the nodes that appear in edges only — callers join
    singletons back themselves."""
    both = edges.select(
        F.col("a_id").alias("src"), F.col("b_id").alias("dst")
    ).union(edges.select(F.col("b_id").alias("src"), F.col("a_id").alias("dst")))
    both = both.localCheckpoint()  # reused every round — cut the lineage once
    labels = both.select(F.col("src").alias("doc_id")).distinct().withColumn(
        "rep", F.col("doc_id")
    )
    for _ in range(max_iters):
        nb_min = (
            both.join(
                labels.select(
                    F.col("doc_id").alias("dst"), F.col("rep").alias("nrep")
                ),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("nrep").alias("nb"))
            .withColumnRenamed("src", "doc_id")
        )
        new = labels.join(nb_min, "doc_id", "left").select(
            "doc_id", F.least("rep", F.coalesce("nb", "rep")).alias("rep")
        )
        new = new.localCheckpoint()
        changed = (
            new.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.rep") != F.col("o.rep"))
            .count()
        )
        labels = new
        if changed == 0:
            break
    return labels


def q_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup RESOLUTION — the step after candidate generation that a
    training-data pipeline actually ships: group the ngram-Jaccard pairs
    into connected components and keep the min-doc_id representative per
    component (doc_id == rep <=> keep). DuckDB checks the full closure
    with a recursive CTE, so the iterative Spark propagation is
    hash-verified against an exact transitive answer."""
    pairs = ngram_jaccard(_docs_parallel(spark, sf_dir)).select("a_id", "b_id")
    comps = connected_components(pairs)
    docs = _read(spark, sf_dir, "documents").select("doc_id")
    return docs.join(comps, "doc_id", "left").select(
        "doc_id", F.coalesce("rep", F.col("doc_id")).alias("rep")
    )


SQL_DEDUP_COMPONENTS = f"""
WITH RECURSIVE pairs AS ({{NGRAM}}),
edges AS (
  SELECT a_id AS src, b_id AS dst FROM pairs
  UNION ALL
  SELECT b_id AS src, a_id AS dst FROM pairs
),
reach AS (
  SELECT src AS node, src AS lab FROM edges
  UNION
  SELECT e.dst AS node, r.lab AS lab FROM reach r JOIN edges e ON e.src = r.node
),
comp AS (SELECT node AS doc_id, MIN(lab) AS rep FROM reach GROUP BY node)
SELECT d.doc_id AS doc_id, COALESCE(c.rep, d.doc_id) AS rep
FROM documents d LEFT JOIN comp c USING (doc_id)
""".replace("{NGRAM}", SQL_NGRAM_JACCARD_PAIRS)


def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-representative selection — the pipeline step after
    near-dup resolution: within each connected component keep the
    highest-quality document (longest text, ties to the lowest doc_id)
    and map every member to that canonical id. Composition of the
    component resolver with an argmax window; singletons keep themselves.
    At 100 TB the component table is a fraction of the corpus and the
    argmax is one partial-aggregatable shuffle on the component key."""
    pairs = ngram_jaccard(_docs_parallel(spark, sf_dir)).select("a_id", "b_id")
    comps = connected_components(pairs)
    docs = _read(spark, sf_dir, "documents").select("doc_id", "n_chars")
    labeled = docs.join(comps, "doc_id", "left").select(
        "doc_id", "n_chars", F.coalesce("rep", F.col("doc_id")).alias("comp")
    )
    w = Window.partitionBy("comp").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    best = (
        labeled.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .select(F.col("comp").alias("b_comp"), F.col("doc_id").alias("canonical_id"))
    )
    return (
        labeled.join(best, labeled.comp == best.b_comp)
        .select(
            "doc_id",
            "comp",
            "canonical_id",
            (F.col("doc_id") == F.col("canonical_id")).alias("keep"),
        )
    )


SQL_DEDUP_KEEP_BEST = f"""
WITH RECURSIVE pairs AS ({{NGRAM}}),
edges AS (
  SELECT a_id AS src, b_id AS dst FROM pairs
  UNION ALL
  SELECT b_id AS src, a_id AS dst FROM pairs
),
reach AS (
  SELECT src AS node, src AS lab FROM edges
  UNION
  SELECT e.dst AS node, r.lab AS lab FROM reach r JOIN edges e ON e.src = r.node
),
comp AS (SELECT node AS doc_id, MIN(lab) AS rep FROM reach GROUP BY node),
labeled AS (
  SELECT d.doc_id, d.n_chars, COALESCE(c.rep, d.doc_id) AS comp
  FROM documents d LEFT JOIN comp c USING (doc_id)
),
best AS (
  SELECT comp, doc_id AS canonical_id
  FROM (
    SELECT *, row_number() OVER (PARTITION BY comp
                                 ORDER BY n_chars DESC, doc_id ASC) AS rnk
    FROM labeled
  ) r WHERE rnk = 1
)
SELECT l.doc_id AS doc_id, l.comp AS comp, b.canonical_id AS canonical_id,
       l.doc_id = b.canonical_id AS keep
FROM labeled l JOIN best b USING (comp)
""".replace("{NGRAM}", SQL_NGRAM_JACCARD_PAIRS)


_NGRAM_MAX_DF = 5


def q_ngram_jaccard_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The web-scale variant of ngram_jaccard_pairs: stop-shingle cap
    (document frequency > max_df excluded from candidate generation) with
    exact Jaccard verification over candidates' full shingle sets — the
    plan that stays near-linear on boilerplate-heavy corpora."""
    return ngram_jaccard(_docs_parallel(spark, sf_dir), max_df=_NGRAM_MAX_DF)


SQL_NGRAM_JACCARD_CAPPED = f"""
WITH toks AS (
  SELECT doc_id, {_SQL_TOKS} AS toks FROM documents
), sh AS (
  SELECT DISTINCT doc_id, unnest(list_transform(range(len(toks) - 2),
    i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])) AS shingle
  FROM toks WHERE len(toks) >= 3
), counts AS (
  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
), dfc AS (
  SELECT shingle, count(*) AS df FROM sh GROUP BY shingle
), rare AS (
  SELECT s.doc_id, s.shingle FROM sh s JOIN dfc USING (shingle)
  WHERE dfc.df <= {_NGRAM_MAX_DF}
), cand AS (
  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
  FROM rare a JOIN rare b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
), inter AS (
  SELECT c.a_id, c.b_id, count(*) AS i
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.a_id
  JOIN sh sb ON sb.doc_id = c.b_id AND sb.shingle = sa.shingle
  GROUP BY 1, 2
)
SELECT a_id, b_id, round(i / (ca.n + cb.n - i), 4) AS jaccard
FROM inter JOIN counts ca ON a_id = ca.doc_id JOIN counts cb ON b_id = cb.doc_id
WHERE round(i / (ca.n + cb.n - i), 4) >= 0.5
"""


def q_minhash_lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup candidates: 8 salted min-hashes per doc over
    3-gram shingles; LSH bands of 1 hash; candidates = pairs sharing any
    band signature. The scale path for dedup (shingle -> minhash -> band ->
    bucket join)."""
    docs = _tokens(_docs_parallel(spark, sf_dir)).filter(F.expr("size(toks) >= 3"))
    # signatures computed entirely map-side: per-doc shingle array ->
    # array_min over salted md5 per hash — no explode, no shuffle until the
    # candidate bucket join (the only shuffle this op needs)
    sh_arr = docs.select(
        "doc_id",
        F.expr(
            "array_distinct(transform(sequence(1, size(toks) - 2), i -> "
            "concat_ws(' ', element_at(toks, i), element_at(toks, i+1), element_at(toks, i+2))))"
        ).alias("shingles"),
    )
    # classic b x r banding (4 bands of 2 hashes): a band signature is the
    # concatenation of its 2 min-hashes — specific enough that bucket join
    # stays near-linear even on shingle-homogeneous corpora.
    # All 8 min-hashes come from ONE nested-lambda expression (the shingle
    # array is referenced once, not inlined 8x — a tiny codegen unit), and
    # the signature frame is materialized (localCheckpoint) so the self-join
    # below probes stored signatures instead of re-running tokenize->shingle
    # ->hash on both sides.
    sigs_lazy = sh_arr.select(
        "doc_id",
        F.expr(
            "transform(sequence(0, 7), h -> "
            "array_min(transform(shingles, s -> md5(concat(cast(h as string), ':', s)))))"
        ).alias("hs"),
    )
    # one-shot cost control: this stage is one giant higher-order-function
    # expression — HOFs evaluate interpreted regardless, but whole-stage
    # codegen still Janino-compiles the enclosing method (measured 4-15 s
    # compile for ~1.6 s of actual compute). Turn codegen off for just
    # this eagerly-materialized job; the checkpointed result feeds the
    # (codegen-friendly) band join below.
    wsc = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try:
        sigs = sigs_lazy.localCheckpoint(eager=True)
    finally:
        spark.conf.set("spark.sql.codegen.wholeStage", wsc)
    mins = sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(band).alias("band"),
                        F.concat(
                            F.element_at("hs", 2 * band + 1),
                            F.element_at("hs", 2 * band + 2),
                        ).alias("sig"),
                    )
                    for band in range(4)
                ]
            )
        ).alias("bs"),
    ).select("doc_id", "bs.band", "bs.sig")
    a = mins.alias("a")
    b = mins.alias("b")
    return (
        a.join(b, ["band", "sig"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
        .distinct()
    )


SQL_MINHASH_LSH_CANDIDATES = f"""
WITH toks AS (
  SELECT doc_id, {_SQL_TOKS} AS toks FROM documents
), sh AS (
  SELECT DISTINCT doc_id, unnest(list_transform(range(len(toks) - 2),
    i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])) AS shingle
  FROM toks WHERE len(toks) >= 3
), hmins AS (
  SELECT doc_id, h, min(md5(h::VARCHAR || ':' || shingle)) AS m
  FROM sh, (SELECT unnest(range(8)) AS h) hs
  GROUP BY doc_id, h
), mins AS (
  SELECT doc_id, h // 2 AS band, string_agg(m, '' ORDER BY h) AS sig
  FROM hmins GROUP BY doc_id, h // 2
)
SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
FROM mins a JOIN mins b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
"""


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash (32-bit) per document: token hash = first 8 md5 hex digits,
    bit contributions weighted by term frequency — all-integer arithmetic,
    exact on both engines."""
    docs = _tokens(_docs_parallel(spark, sf_dir))
    tf = (
        docs.select("doc_id", F.explode("toks").alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("c"))
        .withColumn("hv", F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long"))
    )
    # signed contribution per bit position: +c if bit i of hv set else -c
    bits = tf.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(31))).alias("i"),
        "c",
        "hv",
    ).withColumn(
        "contrib",
        F.when(
            F.expr("(shiftright(hv, i) % 2) = 1"), F.col("c")
        ).otherwise(-F.col("c")),
    )
    return (
        bits.groupBy("doc_id", "i")
        .agg(F.sum("contrib").alias("s"))
        .withColumn("bit", F.when(F.col("s") > 0, F.lit(1)).otherwise(F.lit(0)).cast("long"))
        .groupBy("doc_id")
        .agg(F.sum(F.expr("shiftleft(bit, i)")).alias("simhash"))
    )


SQL_SIMHASH = f"""
WITH toks AS (
  SELECT doc_id, unnest({_SQL_TOKS}) AS tok FROM documents
), tf AS (
  SELECT doc_id, tok, count(*) AS c,
         ('0x' || substr(md5(tok), 1, 8))::BIGINT AS hv
  FROM toks GROUP BY doc_id, tok
), bits AS (
  SELECT doc_id, i,
         sum(CASE WHEN (hv >> i) & 1 = 1 THEN c ELSE -c END) AS s
  FROM tf, (SELECT unnest(range(32)) AS i) ii
  GROUP BY doc_id, i
)
SELECT doc_id,
       CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << i) ELSE 0 END) AS BIGINT) AS simhash
FROM bits GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# 3. scoring / aggregation / graph (SURVEY §2.6-2.7)
# ---------------------------------------------------------------------------


def q_score_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6/A7 — link-priority propagation: priority(dst) = max over parents of
    parent score; max-combine per NetworkEstimator.scala:90,101-124."""
    li = _read(spark, sf_dir, "lineitem")
    orders = _read(spark, sf_dir, "orders")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.col("l_partkey").alias("dst"))
        .agg(
            F.max("o_totalprice").alias("priority"),
            F.count("*").alias("n_parents"),
        )
    )


SQL_SCORE_PROPAGATION = """
SELECT l_partkey AS dst, max(o_totalprice) AS priority, count(*) AS n_parents
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY l_partkey
"""


def q_cocitation_selfjoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G2 — graph self-join (GMLStorage.scala:56-60): co-cited node pairs
    (parts appearing in the same order) with counts."""
    e = _read(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a, b = e.alias("a"), e.alias("b")
    return (
        a.join(b, "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .groupBy(
            F.col("a.l_partkey").alias("p1"), F.col("b.l_partkey").alias("p2")
        )
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= 2)
    )


SQL_COCITATION_SELFJOIN = """
SELECT a.l_partkey AS p1, b.l_partkey AS p2, count(*) AS n
FROM lineitem a JOIN lineitem b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY 1, 2 HAVING count(*) >= 2
"""


def q_density_net(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 — density over 'linked' vector pairs (same label), mean squared
    L2 distance (GMLStorage.scala:205-219)."""
    e = _read(spark, sf_dir, "embeddings").select("vec_id", "label", "embedding")
    a, b = e.alias("a"), e.alias("b")
    pairs = a.join(b, "label").filter(F.col("a.vec_id") < F.col("b.vec_id"))
    d2 = F.expr(_sqdist_expr("a.embedding", "b.embedding"))
    return (
        pairs.select("label", d2.alias("d2"))
        .groupBy("label")
        .agg(F.round(F.avg("d2"), 4).alias("mean_sq_dist"), F.count("*").alias("n_pairs"))
    )


SQL_DENSITY_NET = f"""
SELECT label, round(avg(d2), 4) AS mean_sq_dist, count(*) AS n_pairs
FROM (
  SELECT a.label AS label, {_sql_sqdist('a.embedding', 'b.embedding')} AS d2
  FROM embeddings a JOIN embeddings b
    ON a.label = b.label AND a.vec_id < b.vec_id
) t GROUP BY label
"""


def q_deviation_central(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11 — per-vector squared deviation from the reference vector
    (vec_id=0 as 'central'; GMLStorage.scala:253-265)."""
    e = _read(spark, sf_dir, "embeddings")
    ref = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("ref"))
    return (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(ref))
        .select(
            "vec_id",
            F.round(F.expr(_sqdist_expr("embedding", "ref")), 4).alias("sq_dev"),
        )
    )


SQL_DEVIATION_CENTRAL = f"""
SELECT e.vec_id AS vec_id, round({_sql_sqdist('e.embedding', 'r.ref')}, 4) AS sq_dev
FROM embeddings e CROSS JOIN (SELECT embedding AS ref FROM embeddings WHERE vec_id = 0) r
WHERE e.vec_id <> 0
"""


def q_feature_count_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A14 — global feature-frequency filter, count > 10
    (SampleHierarchy2Priority.scala:66-84)."""
    docs = _tokens(_read(spark, sf_dir, "documents"))
    return (
        docs.select(F.explode("toks").alias("feature"))
        .groupBy("feature")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 10)
    )


SQL_FEATURE_COUNT_FILTER = f"""
SELECT feature, count(*) AS n
FROM (SELECT unnest({_SQL_TOKS}) AS feature FROM documents) t
GROUP BY feature HAVING count(*) > 10
"""


def q_wave_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6/A12 — per-wave statistics rollup (GMLStorage.scala:88-108):
    counts, mean and accumulated priority per event class."""
    ev = _read(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(F.avg("value"), 6).alias("avg_value"),
        F.round(F.sum("value"), 6).alias("sum_value"),
    )


SQL_WAVE_METRICS = """
SELECT event_type, count(*) AS n,
       round(avg(value), 6) AS avg_value,
       round(sum(value), 6) AS sum_value
FROM events GROUP BY event_type
"""


def q_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3-adjacent — periodic snapshot cadence as an event-time rollup
    (streaming-shaped aggregation expressed in batch)."""
    ev = _read(spark, sf_dir, "events")
    return (
        ev.withColumn(
            "hour", F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss")
        )
        .groupBy("hour", "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("sum_value"))
    )


SQL_HOURLY_ROLLUP = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
       event_type, count(*) AS n, round(sum(value), 6) AS sum_value
FROM events GROUP BY 1, 2
"""


def _us(col: str) -> "F.Column":
    """epoch microseconds of a parquet TIMESTAMP_NTZ column — cast through
    session-tz (UTC) timestamp so it equals DuckDB's epoch_us."""
    return F.unix_micros(F.col(col).cast("timestamp"))


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join — each click matched to the user's most recent view at
    or before the click (attribution). Spark has no ASOF JOIN operator;
    the scale-correct composition is the union-and-carry trick: tag both
    sides, ONE shuffle by user, sort by event time within the partition,
    and carry the latest view forward with last(..., ignorenulls) — never
    a range join (whose candidate blow-up is quadratic in events/user).
    DuckDB's native ASOF JOIN is the oracle."""
    ev = _read(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.col("event_id").alias("click_id"),
        F.lit(1).alias("is_click"),
        F.lit(None).cast("bigint").alias("v_id"),
        F.lit(None).cast("timestamp").alias("v_ts"),
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        "ts",
        F.lit(None).cast("bigint").alias("click_id"),
        F.lit(0).alias("is_click"),
        F.col("event_id").alias("v_id"),
        F.col("ts").alias("v_ts"),
    )
    # at equal ts the view sorts first (is_click asc) => inclusive <=
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_click")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = clicks.unionByName(views).select(
        "user_id",
        "ts",
        "click_id",
        "is_click",
        F.last("v_id", ignorenulls=True).over(w).alias("view_id"),
        F.last("v_ts", ignorenulls=True).over(w).alias("view_ts"),
    )
    return carried.filter(F.col("is_click") == 1).select(
        "click_id",
        "user_id",
        _us("ts").alias("click_ts_us"),
        "view_id",
        _us("view_ts").alias("view_ts_us"),
        (_us("ts") - _us("view_ts")).alias("gap_us"),
    )


SQL_ASOF_JOIN = """
WITH clicks AS (SELECT event_id AS click_id, user_id, ts FROM events WHERE event_type = 'click'),
     views  AS (SELECT event_id AS view_id, user_id, ts FROM events WHERE event_type = 'view')
SELECT c.click_id, c.user_id,
       epoch_us(c.ts) AS click_ts_us,
       v.view_id,
       epoch_us(v.ts) AS view_ts_us,
       epoch_us(c.ts) - epoch_us(v.ts) AS gap_us
FROM clicks c ASOF LEFT JOIN views v
  ON c.user_id = v.user_id AND v.ts <= c.ts
"""

_WARC_EPOCH = 1_700_000_000  # fixed capture-time base for the round trip


def q_warc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC container kernel driven end-to-end: documents become real
    WARC/1.0 response records (one per doc, 97 gzip segment blobs built
    with applyInPandas), then read back through the tolerant record
    walker (read_warc_df). The oracle re-derives every parsed field in
    closed form from the source table — same pattern as
    multimodal_decode: the structure that survives the byte round trip
    IS the check."""
    import pandas as pd
    from datetime import datetime, timezone

    from webcrawler_spark.sources.warc import read_warc_df, write_warc

    docs = _docs_parallel(spark, sf_dir).select(
        "doc_id", "text", (F.col("doc_id") % 97).alias("_seg")
    )

    def pack(key, pdf):
        pdf = pdf.sort_values("doc_id")
        rows = [
            (
                f"http://w{int(d)}.example/doc",
                datetime.fromtimestamp(_WARC_EPOCH + int(d), tz=timezone.utc),
                t.encode("utf-8"),
            )
            for d, t in zip(pdf["doc_id"], pdf["text"])
        ]
        return pd.DataFrame({"blob": [write_warc(rows, per_record_gzip=True)]})

    blobs = docs.groupBy("_seg").applyInPandas(pack, "blob binary")
    back = read_warc_df(blobs)
    return back.select(
        "url",
        F.unix_micros("warc_ts").alias("ts_us"),
        F.expr("cast(length(html) as bigint)").alias("n_bytes"),
        F.expr("md5(html)").alias("payload_sig"),
    )


SQL_WARC_ROUNDTRIP = f"""
SELECT 'http://w' || doc_id || '.example/doc' AS url,
       (doc_id + {_WARC_EPOCH}) * 1000000 AS ts_us,
       strlen(text) AS n_bytes,
       md5(text) AS payload_sig
FROM documents
"""


def q_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic data mixing — the Pile/Dolma recipe step: take a
    per-source quota of documents, chosen by content-stable hash rank so
    the mix is reproducible across runs and engines (no RNG, no shuffle
    nondeterminism). Quota: sources with an even numeric suffix are
    upweighted 2:1. One shuffle (rank by source); at 100 TB the same plan
    holds — rank is a per-partition top-k after hash partitioning by
    source, never a global sort."""
    docs = _read(spark, sf_dir, "documents")
    quota = F.expr(
        "case when cast(substring(source, 4) as int) % 2 = 0 then 20 else 10 end"
    )
    w = Window.partitionBy("source").orderBy(
        F.expr("md5(cast(doc_id as string))")
    )
    return (
        docs.withColumn("mix_rank", F.row_number().over(w))
        .withColumn("quota", quota)
        .filter(F.col("mix_rank") <= F.col("quota"))
        .select("doc_id", "source", "mix_rank")
    )


SQL_SOURCE_MIX = """
WITH r AS (
  SELECT doc_id, source,
         CAST(row_number() OVER (PARTITION BY source
                                 ORDER BY md5(doc_id::VARCHAR)) AS INTEGER) AS mix_rank,
         CASE WHEN substring(source, 4)::INT % 2 = 0 THEN 20 ELSE 10 END AS quota
  FROM documents)
SELECT doc_id, source, mix_rank FROM r WHERE mix_rank <= quota
"""


def q_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated quantiles per group — Spark's percentile() and
    DuckDB's quantile_cont() share the linear-interpolation definition, so
    this pins distribution-summary parity. At 100 TB you'd swap in
    percentile_approx (t-digest, mergeable map-side sketch); the exact
    form is the oracle-able baseline."""
    ev = _read(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.95)"), 6).alias("p95"),
        F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
        F.count("*").alias("n"),
    )


SQL_VALUE_QUANTILES = """
SELECT event_type,
       round(quantile_cont(value, 0.5), 6) AS p50,
       round(quantile_cont(value, 0.95), 6) AS p95,
       round(quantile_cont(value, 0.99), 6) AS p99,
       count(*) AS n
FROM events GROUP BY event_type
"""


_SESSION_GAP_US = 12 * 3600 * 1_000_000  # 12 h inactivity closes a session


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization — the canonical event-analytics stateful
    operator expressed statelessly: lag() marks session starts, a running
    sum numbers them, one groupBy folds per-session metrics. One shuffle
    by user; both windows and the aggregation reuse the same hash
    partitioning (no second exchange). In streaming mode the same
    semantics run via session_window(ts, '12 hours') with a watermark."""
    ev = _read(spark, sf_dir, "events")
    wo = Window.partitionBy("user_id").orderBy("ts")
    run = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap = _us("ts") - F.unix_micros(F.lag(F.col("ts").cast("timestamp")).over(wo))
    sess = ev.withColumn(
        "new_sess",
        F.when(gap.isNull() | (gap > _SESSION_GAP_US), 1).otherwise(0),
    ).withColumn("session_num", F.sum("new_sess").over(run))
    return sess.groupBy("user_id", "session_num").agg(
        F.count("*").alias("n_events"),
        F.min(_us("ts")).alias("start_us"),
        F.max(_us("ts")).alias("end_us"),
        F.round(F.sum("value"), 6).alias("sum_value"),
    )


SQL_SESSIONIZE = f"""
WITH g AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {_SESSION_GAP_US}
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), s AS (
  SELECT user_id, ts, value,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS session_num
  FROM g
)
SELECT user_id, session_num, count(*) AS n_events,
       min(epoch_us(ts)) AS start_us, max(epoch_us(ts)) AS end_us,
       round(sum(value), 6) AS sum_value
FROM s GROUP BY user_id, session_num
"""


# ---------------------------------------------------------------------------
# 4. text analysis (training-data pipeline surface over `documents`)
# ---------------------------------------------------------------------------


def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: total, distinct, mean token length (integer sums —
    exact)."""
    docs = _tokens(_read(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id",
        F.expr("cast(size(toks) as bigint)").alias("n_tokens"),
        F.expr("cast(size(array_distinct(toks)) as bigint)").alias("n_uniq"),
        F.expr(
            "round(aggregate(toks, 0L, (acc, t) -> acc + length(t)) / cast(size(toks) as double), 4)"
        ).alias("avg_tok_len"),
    )


SQL_TOKEN_STATS = f"""
SELECT doc_id,
       len(toks) AS n_tokens,
       len(list_distinct(toks)) AS n_uniq,
       round(list_sum(list_transform(toks, t -> len(t))) / len(toks)::DOUBLE, 4) AS avg_tok_len
FROM (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents) t
"""


# GPT-2-style pre-tokenizer, constrained to the Java-regex ∩ RE2 subset
# (no lookahead: RE2 rejects the original pattern's (?!\S)): a token is a
# letter run, a digit run, or a punctuation run, each with an optional
# single leading space.
_RE_BPE = r" ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"


def q_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting, BPE-ish half (SURVEY training-data surface): count
    pre-tokenizer segments per document next to the whitespace count, plus
    the chars-per-token ratio every data ablation reports. Pure JVM regex
    map stage — pipelines with the scan at 100 TB."""
    docs = _read(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.expr(
            f"cast(size(regexp_extract_all(text, '{_sp(_RE_BPE)}', 0)) as bigint)"
        ).alias("n_bpe_tokens"),
        F.expr(f"cast(size({_TOKS}) as bigint)").alias("n_ws_tokens"),
        F.expr(
            f"round(length(text) / cast(size(regexp_extract_all(text, '{_sp(_RE_BPE)}', 0)) as double), 4)"
        ).alias("chars_per_tok"),
    )


SQL_BPE_TOKEN_COUNT = f"""
SELECT doc_id,
       len(regexp_extract_all(text, '{_RE_BPE}')) AS n_bpe_tokens,
       len({_SQL_TOKS}) AS n_ws_tokens,
       round(length(text) / len(regexp_extract_all(text, '{_RE_BPE}'))::DOUBLE, 4) AS chars_per_tok
FROM documents
"""


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: stopword ratio + length signal (linear, per-row
    deterministic)."""
    docs = _tokens(_read(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id",
        F.expr(
            f"round(size(array_intersect(toks, {_SPARK_STOPLIST})) / cast(size(toks) as double), 4)"
        ).alias("stop_ratio"),
        F.expr(
            f"round(size(filter(toks, t -> array_contains({_SPARK_STOPLIST}, t))) / cast(size(toks) as double)"
            " * 0.5 + least(size(toks), 100) / 200.0, 4)"
        ).alias("quality"),
    )


SQL_QUALITY_SCORE = f"""
SELECT doc_id,
  round(len(list_distinct(list_filter(toks, t -> list_contains({_SQL_STOPLIST}, t))))
        / len(toks)::DOUBLE, 4) AS stop_ratio,
  round(len(list_filter(toks, t -> list_contains({_SQL_STOPLIST}, t))) / len(toks)::DOUBLE * 0.5
        + least(len(toks), 100) / 200.0, 4) AS quality
FROM (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents) t
"""


_SPAN_STRIDE = 10  # a 3-token span starts every 10 tokens => ~30% corruption
_SPAN_LEN = 3


def q_span_corrupt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5/UL2-style span corruption (Raffel et al. 2020 §3.1.4): build
    (input, target) denoising pairs — masked spans replaced by
    sequential <extra_id_k> sentinels in the input, and the target is
    the sentinel-delimited concatenation of the masked spans. Spans are
    placed deterministically (a {span}-token span starting every
    {stride} tokens) so both engines corrupt identical positions — the
    RNG a production pipeline would use is per-row seeded hashing,
    identical plan shape.

    Plan: one posexplode, a per-token CASE projecting each position's
    input/target piece, and one groupBy(doc_id) ordered reassembly
    (sort_array over collected (pos, piece) structs — the same
    order-stable aggregation contract as c4_clean). Everything is
    JVM-side string/array builtins; work is O(tokens) with a single
    doc_id shuffle, the plan that holds when docs are 100 TB."""
    toks = _tokens(_read(spark, sf_dir, "documents")).select(
        "doc_id", F.posexplode("toks").alias("pos", "tok")
    )
    in_span = (F.col("pos") % _SPAN_STRIDE) >= _SPAN_STRIDE - _SPAN_LEN
    is_start = (F.col("pos") % _SPAN_STRIDE) == _SPAN_STRIDE - _SPAN_LEN
    sent = F.concat(
        F.lit("<extra_id_"),
        (F.col("pos") / _SPAN_STRIDE).cast("bigint").cast("string"),
        F.lit(">"),
    )
    pieces = toks.select(
        "doc_id",
        "pos",
        F.when(~in_span, F.col("tok"))
        .when(is_start, sent)
        .otherwise(F.lit(None))
        .alias("in_piece"),
        F.when(in_span & is_start, F.concat(sent, F.lit(" "), F.col("tok")))
        .when(in_span, F.col("tok"))
        .otherwise(F.lit(None))
        .alias("tg_piece"),
    )

    def _joined(col: str) -> F.Column:
        arr = F.sort_array(
            F.collect_list(F.struct(F.col("pos"), F.col(col).alias("p")))
        )
        return F.array_join(
            F.filter(F.transform(arr, lambda s: s["p"]), lambda p: p.isNotNull()),
            " ",
        )

    return (
        pieces.groupBy("doc_id")
        .agg(
            _joined("in_piece").alias("input_text"),
            _joined("tg_piece").alias("target_text"),
            F.sum(F.when(is_start, 1).otherwise(0))
            .cast("int")
            .alias("n_spans"),
        )
    )


SQL_SPAN_CORRUPT = f"""
WITH toks AS (
  SELECT doc_id, unnest(ts) AS tok, generate_subscripts(ts, 1) - 1 AS pos
  FROM (SELECT doc_id, {_SQL_TOKS} AS ts FROM documents) d
),
pieces AS (
  SELECT doc_id, pos,
         CASE WHEN pos % {_SPAN_STRIDE} < {_SPAN_STRIDE - _SPAN_LEN} THEN tok
              WHEN pos % {_SPAN_STRIDE} = {_SPAN_STRIDE - _SPAN_LEN}
                THEN '<extra_id_' || (pos // {_SPAN_STRIDE})::VARCHAR || '>'
              ELSE NULL END AS in_piece,
         CASE WHEN pos % {_SPAN_STRIDE} = {_SPAN_STRIDE - _SPAN_LEN}
                THEN '<extra_id_' || (pos // {_SPAN_STRIDE})::VARCHAR || '> ' || tok
              WHEN pos % {_SPAN_STRIDE} > {_SPAN_STRIDE - _SPAN_LEN} THEN tok
              ELSE NULL END AS tg_piece,
         (pos % {_SPAN_STRIDE} = {_SPAN_STRIDE - _SPAN_LEN})::INTEGER AS is_start
  FROM toks
)
SELECT doc_id,
       coalesce(string_agg(in_piece, ' ' ORDER BY pos)
                FILTER (WHERE in_piece IS NOT NULL), '') AS input_text,
       coalesce(string_agg(tg_piece, ' ' ORDER BY pos)
                FILTER (WHERE tg_piece IS NOT NULL), '') AS target_text,
       sum(is_start)::INTEGER AS n_spans
FROM pieces
GROUP BY doc_id
"""


def q_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: split each document into fixed-size (50-token)
    chunks preserving order — the training-data windowing idiom."""
    docs = _tokens(_docs_parallel(spark, sf_dir))
    pos = docs.select("doc_id", F.posexplode("toks").alias("pos", "tok"))
    return (
        pos.withColumn("chunk", F.floor(F.col("pos") / 50))
        .groupBy("doc_id", "chunk")
        .agg(
            F.array_join(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))).tok, " "
            ).alias("chunk_text"),
            F.count("*").alias("n_tokens"),
        )
    )


SQL_SEQUENCE_PACK = f"""
WITH t AS (
  SELECT doc_id, unnest(toks) AS tok, generate_subscripts(toks, 1) - 1 AS pos
  FROM (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents) d
)
SELECT doc_id, pos // 50 AS chunk,
       string_agg(tok, ' ' ORDER BY pos) AS chunk_text,
       count(*) AS n_tokens
FROM t GROUP BY doc_id, pos // 50
"""


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: English-stopword hit ratio threshold."""
    docs = _tokens(_read(spark, sf_dir, "documents"))
    ratio = F.expr(
        f"size(filter(toks, t -> array_contains({_SPARK_STOPLIST}, t))) / cast(size(toks) as double)"
    )
    return docs.select(
        "doc_id",
        "lang",
        F.when(ratio > 0.05, F.lit("en")).otherwise(F.lit("other")).alias("pred_lang"),
        F.round(ratio, 4).alias("stop_ratio"),
    )


SQL_LANG_ID = f"""
SELECT doc_id, lang,
  CASE WHEN len(list_filter(toks, t -> list_contains({_SQL_STOPLIST}, t))) / len(toks)::DOUBLE > 0.05
       THEN 'en' ELSE 'other' END AS pred_lang,
  round(len(list_filter(toks, t -> list_contains({_SQL_STOPLIST}, t))) / len(toks)::DOUBLE, 4) AS stop_ratio
FROM (SELECT doc_id, lang, {_SQL_TOKS} AS toks FROM documents) t
"""


# PII injection shared by q_pii_scrub and its oracle: every third document
# gets a deterministic email / US-phone / IPv4 appended, so the scrub
# operator is exercised on known ground truth while the input stays the
# driver's documents table. The expression is written once per engine
# dialect and MUST stay semantically identical.
_PII_SPARK = (
    "case when doc_id % 3 = 0 then concat(text, ' contact user', doc_id, "
    "'@example.com or 555-', lpad(cast((doc_id * 7) % 1000 as string), 3, '0'), "
    "'-', lpad(cast(doc_id % 10000 as string), 4, '0'), "
    "' ip 10.', cast(doc_id % 256 as string), '.0.1') else text end"
)
_PII_SQL = (
    "CASE WHEN doc_id % 3 = 0 THEN text || ' contact user' || doc_id || "
    "'@example.com or 555-' || lpad(((doc_id * 7) % 1000)::VARCHAR, 3, '0') || "
    "'-' || lpad((doc_id % 10000)::VARCHAR, 4, '0') || "
    "' ip 10.' || (doc_id % 256)::VARCHAR || '.0.1' ELSE text END"
)

# common-subset regexes (Java regex on Spark, RE2 on DuckDB): character
# classes, bounded quantifiers and \b only. Spark SQL string literals eat
# one level of backslash (see _TOKS), DuckDB's do not — _sp() doubles them
# for the Spark side.
_RE_EMAIL = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
_RE_PHONE = r"\b\d{3}-\d{3}-\d{4}\b"
_RE_IP = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def _sp(regex: str) -> str:
    return regex.replace("\\", "\\\\")


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction — the pre-training scrub pass: find and mask emails,
    phone numbers and IPv4 addresses with vectorized JVM-side regexes (no
    Python in the hot path; at 100 TB this is a pure map stage that
    pipelines with the scan). Counts per category plus an md5 signature of
    the scrubbed text pin exact redaction behavior."""
    docs = _read(spark, sf_dir, "documents").withColumn(
        "text2", F.expr(_PII_SPARK)
    )
    # order matters: emails contain dots that the IP regex must not see —
    # scrub emails first, then phones, then IPs.
    scrub = (
        f"regexp_replace(regexp_replace(regexp_replace(text2, '{_sp(_RE_EMAIL)}', "
        f"'<EMAIL>'), '{_sp(_RE_PHONE)}', '<PHONE>'), '{_sp(_RE_IP)}', '<IP>')"
    )
    return docs.select(
        "doc_id",
        F.expr(
            f"cast(size(regexp_extract_all(text2, '{_sp(_RE_EMAIL)}', 0)) as bigint)"
        ).alias("n_emails"),
        F.expr(
            f"cast(size(regexp_extract_all(text2, '{_sp(_RE_PHONE)}', 0)) as bigint)"
        ).alias("n_phones"),
        F.expr(
            f"cast(size(regexp_extract_all(text2, '{_sp(_RE_IP)}', 0)) as bigint)"
        ).alias("n_ips"),
        F.expr(f"md5({scrub})").alias("scrub_sig"),
    )


SQL_PII_SCRUB = f"""
WITH d AS (SELECT doc_id, {_PII_SQL} AS text2 FROM documents)
SELECT doc_id,
  len(regexp_extract_all(text2, '{_RE_EMAIL}')) AS n_emails,
  len(regexp_extract_all(text2, '{_RE_PHONE}')) AS n_phones,
  len(regexp_extract_all(text2, '{_RE_IP}')) AS n_ips,
  md5(regexp_replace(regexp_replace(regexp_replace(text2,
      '{_RE_EMAIL}', '<EMAIL>', 'g'),
      '{_RE_PHONE}', '<PHONE>', 'g'),
      '{_RE_IP}', '<IP>', 'g')) AS scrub_sig
FROM d
"""


def q_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition filter (Gopher/C4-style quality rule):
    fraction of word-bigrams taken by the most frequent bigram, plus the
    duplicate-token fraction; `keep` applies the thresholds. Bigram counts
    run as explode -> groupBy (distributed, map-side combined), never a
    per-doc O(n^2) expression — at 100 TB the explode pipelines with the
    scan and the two aggregations share one shuffle by doc_id."""
    docs = _tokens(_docs_parallel(spark, sf_dir)).filter(F.expr("size(toks) >= 2"))
    bg = docs.select(
        "doc_id",
        F.explode(
            F.expr("transform(sequence(0, size(toks) - 2), i -> concat(toks[i], ' ', toks[i + 1]))")
        ).alias("bigram"),
    )
    per_doc = (
        bg.groupBy("doc_id", "bigram")
        .agg(F.count("*").alias("cnt"))
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_bigrams"),
            F.max("cnt").alias("top_cnt"),
        )
    )
    tok_stats = docs.select(
        "doc_id",
        F.expr("cast(size(toks) as bigint)").alias("n_tokens"),
        F.expr("cast(size(array_distinct(toks)) as bigint)").alias("n_uniq"),
    )
    out = per_doc.join(tok_stats, "doc_id")
    top_frac = F.round(F.col("top_cnt") / F.col("n_bigrams").cast("double"), 4)
    dup_frac = F.round(
        F.lit(1.0) - F.col("n_uniq") / F.col("n_tokens").cast("double"), 4
    )
    return out.select(
        "doc_id",
        "n_bigrams",
        top_frac.alias("top_bigram_frac"),
        dup_frac.alias("dup_tok_frac"),
        ((top_frac <= 0.18) & (dup_frac <= 0.9)).alias("keep"),
    )


SQL_REPETITION_FILTER = f"""
WITH toks AS (
  SELECT doc_id, {_SQL_TOKS} AS toks FROM documents
), d AS (
  SELECT * FROM toks WHERE len(toks) >= 2
), bg AS (
  SELECT doc_id, unnest(list_transform(range(1, len(toks)),
                                       i -> toks[i] || ' ' || toks[i + 1])) AS bigram
  FROM d
), cnts AS (
  SELECT doc_id, bigram, count(*) AS cnt FROM bg GROUP BY doc_id, bigram
), per_doc AS (
  SELECT doc_id, sum(cnt) AS n_bigrams, max(cnt) AS top_cnt
  FROM cnts GROUP BY doc_id
), tok_stats AS (
  SELECT doc_id, len(toks) AS n_tokens, len(list_distinct(toks)) AS n_uniq FROM d
)
SELECT p.doc_id, p.n_bigrams,
  round(p.top_cnt / p.n_bigrams::DOUBLE, 4) AS top_bigram_frac,
  round(1.0 - t.n_uniq / t.n_tokens::DOUBLE, 4) AS dup_tok_frac,
  (round(p.top_cnt / p.n_bigrams::DOUBLE, 4) <= 0.18
   AND round(1.0 - t.n_uniq / t.n_tokens::DOUBLE, 4) <= 0.9) AS keep
FROM per_doc p JOIN tok_stats t USING (doc_id)
"""

# text_clean: inject deterministic unicode damage (combining accent,
# BEL control char, run of spaces) into every fifth document so the
# cleanup operator has ground truth; same expression per engine dialect.
# the damage literal is embedded as raw characters: Spark's chr() is
# ASCII-mod-256 while DuckDB's is code-point, so chr() is not portable
_DAMAGE = " café x\x07\ttabbed  and  doubled "  # decomposed e+U+0301: NFC must compose
_DIRTY_SPARK = (
    f"case when doc_id % 5 = 0 then concat(text, '{_DAMAGE}') else text end"
)
_DIRTY_SQL = f"CASE WHEN doc_id % 5 = 0 THEN text || '{_DAMAGE}' ELSE text END"
# explicit ASCII whitespace class: \s is unicode-aware in Python re but
# ASCII in RE2 — spell the class out so all three engines agree
_WS_CLASS = "[ \\t\\n\\r\\x0b\\x0c]+"
_CTRL_CLASS = "[\\x00-\\x08\\x0b-\\x1f\\x7f]"


def q_text_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode text cleanup — the pre-tokenization pass every training
    pipeline runs: NFC normalization, control-character strip, whitespace
    collapse, trim. NFC has no Spark builtin, so this is the one text op
    implemented as an Arrow-batched pandas UDF (vectorized batch transfer,
    no per-row Python overhead); everything around it stays JVM-side.
    DuckDB's nfc_normalize pins the exact same Unicode behavior."""
    import re as _re
    import unicodedata

    from pyspark.sql.functions import pandas_udf

    ctrl = _re.compile("[\x00-\x08\x0b-\x1f\x7f]")
    ws = _re.compile("[ \t\n\r\x0b\x0c]+")

    @pandas_udf("string")
    def clean(col: pd.Series) -> pd.Series:
        def one(t: str) -> str:
            t = unicodedata.normalize("NFC", t)
            t = ctrl.sub("", t)
            return ws.sub(" ", t).strip()

        return col.map(one)

    docs = (
        _read(spark, sf_dir, "documents")
        .withColumn("dirty", F.expr(_DIRTY_SPARK))
        .withColumn("clean", clean(F.col("dirty")))
    )
    return docs.select(
        "doc_id",
        F.expr("cast(length(dirty) as bigint)").alias("n_chars_in"),
        F.expr("cast(length(clean) as bigint)").alias("n_chars_out"),
        F.expr("md5(clean)").alias("clean_sig"),
    )


SQL_TEXT_CLEAN = f"""
WITH d AS (SELECT doc_id, {_DIRTY_SQL} AS dirty FROM documents),
c AS (SELECT doc_id, dirty,
        trim(regexp_replace(regexp_replace(nfc_normalize(dirty),
             '{_CTRL_CLASS}', '', 'g'), '{_WS_CLASS}', ' ', 'g')) AS clean
      FROM d)
SELECT doc_id,
       length(dirty) AS n_chars_in,
       length(clean) AS n_chars_out,
       md5(clean) AS clean_sig
FROM c
"""

_DECON_N = 4  # n-gram length for the overlap check (13/500 docs hit at sf0.01)
_DECON_MOD = 37  # doc_id % _DECON_MOD == 0 defines the held-out eval set


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination — flag training documents sharing any
    word n-gram with a held-out eval set (the train/test-overlap pass every
    LLM data pipeline runs before training). The eval side is tiny by
    construction, so its distinct shingle set is BROADCAST and the scan of
    the 100 TB training side stays shuffle-free: explode -> broadcast
    semi-ish join -> partial-agg groupBy on doc_id."""
    n = _DECON_N
    docs = _tokens(_docs_parallel(spark, sf_dir))
    shingled = docs.filter(F.expr(f"size(toks) >= {n}")).select(
        "doc_id",
        F.explode(
            F.expr(
                f"array_distinct(transform(sequence(0, size(toks) - {n}), "
                f"i -> array_join(slice(toks, i + 1, {n}), ' ')))"
            )
        ).alias("shingle"),
    )
    ev = (
        shingled.filter(F.col("doc_id") % _DECON_MOD == 0)
        .select("shingle")
        .distinct()
    )
    train = shingled.filter(F.col("doc_id") % _DECON_MOD != 0)
    return (
        train.join(F.broadcast(ev), "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hit_ngrams"))
    )


SQL_DECONTAMINATE = f"""
WITH toks AS (
  SELECT doc_id, {_SQL_TOKS} AS toks FROM documents
), sh AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(range(1, len(toks) - {_DECON_N} + 2),
                i -> array_to_string(toks[i : i + {_DECON_N} - 1], ' ')))) AS shingle
  FROM toks WHERE len(toks) >= {_DECON_N}
), ev AS (
  SELECT DISTINCT shingle FROM sh WHERE doc_id % {_DECON_MOD} = 0
)
SELECT s.doc_id, count(*) AS n_hit_ngrams
FROM sh s JOIN ev USING (shingle)
WHERE s.doc_id % {_DECON_MOD} <> 0
GROUP BY s.doc_id
"""


# ---------------------------------------------------------------------------
# 5. similarity search over embeddings
# ---------------------------------------------------------------------------


_PIPE_QUALITY_MIN = 0.30


def q_pipeline_keep_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed training-data pipeline a user actually ships: a
    document survives iff it clears quality scoring, the repetition
    filter, benchmark decontamination (and is not itself eval data), and
    is the canonical representative of its near-dup component. Built by
    joining the individual operators' outputs — each stage is its own
    oracled registry entry; this entry pins the composition. All joins
    are on doc_id; at 100 TB every stage is a map/shuffle pipeline and
    the composition adds only doc-keyed hash joins."""
    qual = q_quality_score(spark, sf_dir).select(
        "doc_id", (F.col("quality") >= _PIPE_QUALITY_MIN).alias("q_ok")
    )
    rep = q_repetition_filter(spark, sf_dir).select(
        "doc_id", F.col("keep").alias("rep_ok")
    )
    dec = q_decontaminate(spark, sf_dir).select("doc_id", F.lit(False).alias("clean"))
    kb = q_dedup_keep_best(spark, sf_dir).select(
        "doc_id", F.col("keep").alias("canon_ok")
    )
    docs = _read(spark, sf_dir, "documents").select("doc_id")
    out = (
        docs.join(qual, "doc_id", "left")
        .join(rep, "doc_id", "left")
        .join(dec, "doc_id", "left")
        .join(kb, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("q_ok", F.lit(False)).alias("q_ok"),
            # docs under 2 tokens have no bigrams: repetition passes them
            F.coalesce("rep_ok", F.lit(True)).alias("rep_ok"),
            ((F.coalesce("clean", F.lit(True))) & (F.col("doc_id") % _DECON_MOD != 0)).alias(
                "clean_ok"
            ),
            F.coalesce("canon_ok", F.lit(False)).alias("canon_ok"),
        )
    )
    return out.withColumn(
        "keep",
        F.col("q_ok") & F.col("rep_ok") & F.col("clean_ok") & F.col("canon_ok"),
    )


SQL_PIPELINE_KEEP_SET = f"""
WITH qual AS ({SQL_QUALITY_SCORE}),
rep AS ({SQL_REPETITION_FILTER}),
dec AS ({SQL_DECONTAMINATE}),
kb AS ({SQL_DEDUP_KEEP_BEST}),
flags AS (
  SELECT d.doc_id,
         coalesce(q.quality >= {_PIPE_QUALITY_MIN}, FALSE) AS q_ok,
         coalesce(r.keep, TRUE) AS rep_ok,
         (dec.doc_id IS NULL AND d.doc_id % {_DECON_MOD} <> 0) AS clean_ok,
         coalesce(k.keep, FALSE) AS canon_ok
  FROM documents d
  LEFT JOIN qual q USING (doc_id)
  LEFT JOIN rep r USING (doc_id)
  LEFT JOIN dec USING (doc_id)
  LEFT JOIN kb k USING (doc_id)
)
SELECT doc_id, q_ok, rep_ok, clean_ok, canon_ok,
       q_ok AND rep_ok AND clean_ok AND canon_ok AS keep
FROM flags
"""


def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k vs the query vector (vec_id=0) — the ANN
    baseline; sequential-fold dot products, rounded."""
    e = _read(spark, sf_dir, "embeddings")
    # ref norm folded once inside the 1-row broadcast frame (identical
    # value), so the corpus scan does 2 array folds per row, not 3
    ref = (
        e.filter(F.col("vec_id") == 0)
        .select(F.col("embedding").alias("ref"))
        .withColumn("nr", F.sqrt(F.expr(_dot_expr("ref", "ref"))))
    )
    dot = F.expr(_dot_expr("embedding", "ref"))
    na = F.sqrt(F.expr(_dot_expr("embedding", "embedding")))
    return (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(ref))
        .select("vec_id", F.round(dot / (na * F.col("nr")), 4).alias("cos"))
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(20)
    )


SQL_ANN_COSINE_TOPK = f"""
SELECT e.vec_id AS vec_id,
       round({_sql_dot('e.embedding', 'r.ref')} /
             (sqrt({_sql_dot('e.embedding', 'e.embedding')}) * sqrt({_sql_dot('r.ref', 'r.ref')})), 4) AS cos
FROM embeddings e CROSS JOIN (SELECT embedding AS ref FROM embeddings WHERE vec_id = 0) r
WHERE e.vec_id <> 0
ORDER BY cos DESC, vec_id ASC LIMIT 20
"""


def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs within the same label bucket
    (bucketed candidate generation, not O(n^2) global)."""
    e = _read(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        "embedding",
        # norm once per row BELOW the self-join (bit-identical to the
        # per-pair fold — same sequential aggregate, memoized); cuts the
        # quadratic stage from 3 array folds per pair to 1
        F.sqrt(F.expr(_dot_expr("embedding", "embedding"))).alias("nrm"),
    )
    a, b = e.alias("a"), e.alias("b")
    dot = F.expr(_dot_expr("a.embedding", "b.embedding"))
    return (
        a.join(b, "label")
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("a_id"),
            F.col("b.vec_id").alias("b_id"),
            F.round(dot / (F.col("a.nrm") * F.col("b.nrm")), 4).alias("cos"),
        )
        .filter(F.col("cos") >= 0.3)
    )


SQL_EMBEDDING_NEARDUP = f"""
SELECT a.vec_id AS a_id, b.vec_id AS b_id,
       round({_sql_dot('a.embedding', 'b.embedding')} /
             (sqrt({_sql_dot('a.embedding', 'a.embedding')}) * sqrt({_sql_dot('b.embedding', 'b.embedding')})), 4) AS cos
FROM embeddings a JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE round({_sql_dot('a.embedding', 'b.embedding')} /
            (sqrt({_sql_dot('a.embedding', 'a.embedding')}) * sqrt({_sql_dot('b.embedding', 'b.embedding')})), 4) >= 0.3
"""


_SEMDEDUP_TAU = 0.35


def q_semdedup_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the embedding space, find within-cluster
    pairs with cosine similarity above tau, and from each pair prune the
    member CLOSEST to its cluster centroid — keeping the outliers
    preserves diversity while dropping templated near-copies that exact
    and MinHash dedup both miss.

    Clusters here are the deterministic ``label`` partition (the
    sample-trained k-means assignment of ``ann_ivf`` is the drop-in at
    scale — same broadcast-centroid argmax); centroids are the
    ``label_centroids`` result rounded 6 dp so both engines score
    against identical inputs. Plan shape: one posexplode aggregation
    for centroids (tiny, broadcast), one map stage adding
    centroid-cosine per vector, then the label-bucketed self-join —
    candidate generation is bounded by cluster size, never O(n^2)
    global, which is exactly what makes SemDeDup viable at 100 TB.
    Pair losers resolve by higher centroid-cosine, ties by higher
    vec_id; output is the distinct pruned set with its pair count."""
    e = _read(spark, sf_dir, "embeddings")
    comp = e.select(
        "label", F.posexplode("embedding").alias("pos", "x")
    ).groupBy("label", "pos").agg(
        F.round(F.avg(F.col("x").cast("double")), 6).alias("c")
    )
    cent = (
        comp.groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "c"))).alias("pc"))
        .select("label", F.expr("transform(pc, p -> p.c)").alias("centroid"))
    )
    cdot = F.expr(_dot_expr("embedding", "centroid"))
    cnv = F.sqrt(F.expr(_dot_expr("embedding", "embedding")))
    cnc = F.sqrt(F.expr(_dot_expr("centroid", "centroid")))
    # vector norm computed once per row below the self-join (identical
    # fold => identical value); the pair stage then does 1 fold, not 3
    scored = e.join(F.broadcast(cent), "label").select(
        "label", "vec_id", "embedding",
        cnv.alias("nrm"),
        F.round(cdot / (cnv * cnc), 6).alias("csim"),
    )
    a, b = scored.alias("a"), scored.alias("b")
    pdot = F.expr(_dot_expr("a.embedding", "b.embedding"))
    pna = F.col("a.nrm")
    pnb = F.col("b.nrm")
    loser_id = F.when(
        F.col("a.csim") > F.col("b.csim"), F.col("a.vec_id")
    ).when(
        F.col("b.csim") > F.col("a.csim"), F.col("b.vec_id")
    ).otherwise(F.greatest("a.vec_id", "b.vec_id"))
    loser_csim = F.when(
        F.col("a.csim") > F.col("b.csim"), F.col("a.csim")
    ).otherwise(F.col("b.csim"))
    pairs = (
        a.join(b, "label")
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .withColumn("cos", F.round(pdot / (pna * pnb), 4))
        .filter(F.col("cos") >= _SEMDEDUP_TAU)
        .select(
            "label",
            loser_id.alias("pruned_id"),
            loser_csim.alias("csim"),
        )
    )
    return pairs.groupBy("label", "pruned_id", "csim").agg(
        F.count("*").alias("n_pairs")
    )


SQL_SEMDEDUP_PRUNE = f"""
WITH comp AS (
  SELECT label, pos - 1 AS pos, round(avg(x::DOUBLE), 6) AS c
  FROM (
    SELECT label, unnest(embedding) AS x,
           generate_subscripts(embedding, 1) AS pos
    FROM embeddings
  ) t
  GROUP BY label, pos
),
cent AS (
  SELECT label, list(c ORDER BY pos) AS centroid FROM comp GROUP BY label
),
scored AS (
  SELECT e.label, e.vec_id, e.embedding,
         round({_sql_dot('e.embedding', 'cent.centroid')} /
               (sqrt({_sql_dot('e.embedding', 'e.embedding')}) *
                sqrt({_sql_dot('cent.centroid', 'cent.centroid')})), 6) AS csim
  FROM embeddings e JOIN cent USING (label)
),
pairs AS (
  SELECT a.label,
         CASE WHEN a.csim > b.csim THEN a.vec_id
              WHEN b.csim > a.csim THEN b.vec_id
              ELSE greatest(a.vec_id, b.vec_id) END AS pruned_id,
         CASE WHEN a.csim > b.csim THEN a.csim ELSE b.csim END AS csim
  FROM scored a JOIN scored b ON a.label = b.label AND a.vec_id < b.vec_id
  WHERE round({_sql_dot('a.embedding', 'b.embedding')} /
              (sqrt({_sql_dot('a.embedding', 'a.embedding')}) *
               sqrt({_sql_dot('b.embedding', 'b.embedding')})), 4) >= {_SEMDEDUP_TAU}
)
SELECT label, pruned_id, csim, count(*) AS n_pairs
FROM pairs GROUP BY label, pruned_id, csim
"""


# ---------------------------------------------------------------------------
# 6. relational coverage (SURVEY §2.10 checklist)
# ---------------------------------------------------------------------------


def q_stratified_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment (training-data pipeline
    surface): split by a content-stable hash so membership survives
    re-runs and re-partitioning; report per-(source, split) counts —
    the stratification audit."""
    docs = _read(spark, sf_dir, "documents")
    bucket = F.expr(
        "pmod(cast(conv(substring(md5(cast(doc_id as string)), 1, 8), 16, 10) as bigint), 10)"
    )
    split = (
        F.when(bucket < 8, F.lit("train"))
        .when(bucket < 9, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        docs.select("source", split.alias("split"))
        .groupBy("source", "split")
        .agg(F.count("*").alias("n"))
    )


SQL_STRATIFIED_SPLIT = """
SELECT source,
       CASE WHEN b < 8 THEN 'train' WHEN b < 9 THEN 'val' ELSE 'test' END AS split,
       count(*) AS n
FROM (
  SELECT source,
         ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 10 AS b
  FROM documents
) t GROUP BY 1, 2
"""


def q_json_props_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar extraction + aggregation (coverage beyond the reference,
    which has no JSON surface — SURVEY §2.10): bucket events by the
    extracted props.k value."""
    ev = _read(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.select(F.floor(k / 10).cast("long").alias("k_bucket"), "value")
        .groupBy("k_bucket")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("sum_value"))
    )


SQL_JSON_PROPS_ROLLUP = """
SELECT CAST(floor(json_extract(props, '$.k')::BIGINT / 10) AS BIGINT) AS k_bucket,
       count(*) AS n, round(sum(value), 6) AS sum_value
FROM events GROUP BY 1
"""


def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing-summary aggregation (partial+final agg, projections,
    predicate pushdown to the parquet scan)."""
    li = _read(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02")
    )
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "sum_disc_price"
        ),
        F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
        F.round(F.avg("l_discount"), 6).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


SQL_TPCH_Q1 = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_quantity), 6) AS avg_qty,
       round(avg(l_discount), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q_tpch_q3_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way join + aggregation + top-k (broadcast dim, shuffle agg)."""
    cust = _read(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _read(spark, sf_dir, "orders")
    li = _read(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


SQL_TPCH_Q3_TOPK = """
SELECT o_orderkey, round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderkey ORDER BY revenue DESC, o_orderkey ASC LIMIT 10
"""


def q_tpch_q5_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table join pipeline with a region filter that
    prunes through two broadcast dims (region -> nation are tiny and
    broadcast; the c_nationkey = s_nationkey local-supplier predicate
    rides the supplier join). The fact-side join chain shuffles once per
    big-big join; dims never shuffle."""
    li = _read(spark, sf_dir, "lineitem")
    orders = _read(spark, sf_dir, "orders")
    cust = _read(spark, sf_dir, "customer")
    supp = _read(spark, sf_dir, "supplier")
    nation = _read(spark, sf_dir, "nation")
    region = _read(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
    )


SQL_TPCH_Q5_REGION = """
SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
"""


_Q18_QTY = 220


def q_tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: find large orders via a HAVING subquery, then
    semi-join the fact tables back to it. The qualifying-order set is
    small, so it broadcasts into both rejoins — one aggregation shuffle,
    no second fact-fact shuffle."""
    li = _read(spark, sf_dir, "lineitem")
    orders = _read(spark, sf_dir, "orders")
    cust = _read(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > _Q18_QTY)
    )
    return (
        orders.join(F.broadcast(big), orders.o_orderkey == big.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "o_orderkey",
            F.col("o_totalprice"),
            F.round("total_qty", 2).alias("total_qty"),
        )
    )


SQL_TPCH_Q18_LARGE_ORDERS = f"""
WITH big AS (
  SELECT l_orderkey, sum(l_quantity) AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > {_Q18_QTY}
)
SELECT c_name, o_orderkey, o_totalprice, round(total_qty, 2) AS total_qty
FROM orders JOIN big ON o_orderkey = l_orderkey
JOIN customer ON o_custkey = c_custkey
"""


def q_tpch_q6_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-aggregate — every predicate
    pushes to the parquet scan (PushedFilters on shipdate/discount/
    quantity), zero joins, one partial+final agg. The canonical
    'is pushdown working' probe."""
    li = _read(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
        & (F.col("l_discount") >= 0.02)
        & (F.col("l_discount") <= 0.04)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
            "revenue"
        ),
        F.count("*").alias("n_items"),
    )


SQL_TPCH_Q6_FORECAST = """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
       count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.02 AND 0.04 AND l_quantity < 24
"""


def q_tpch_q7_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bidirectional nation-pair volume — the nation dim
    joins the fact chain TWICE under different aliases (supplier side and
    customer side) with an OR-of-pairs predicate; both alias joins
    broadcast, the fact chain shuffles once per big-big join."""
    li = _read(spark, sf_dir, "lineitem")
    orders = _read(spark, sf_dir, "orders")
    cust = _read(spark, sf_dir, "customer")
    supp = _read(spark, sf_dir, "supplier")
    n1 = _read(spark, sf_dir, "nation").alias("n1")
    n2 = _read(spark, sf_dir, "nation").alias("n2")
    pair_ok = (
        (F.col("n1.n_name") == "NATION_1") & (F.col("n2.n_name") == "NATION_2")
    ) | ((F.col("n1.n_name") == "NATION_2") & (F.col("n2.n_name") == "NATION_1"))
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1.n_nationkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2.n_nationkey"))
        .filter(pair_ok)
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1998-01-01"))
        )
        .select(
            F.col("n1.n_name").alias("supp_nation"),
            F.col("n2.n_name").alias("cust_nation"),
            F.year("l_shipdate").alias("l_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.round(F.sum("volume"), 4).alias("revenue"))
    )


SQL_TPCH_Q7_VOLUME = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
  AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY 1, 2, 3
"""


def q_tpch_q10_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue ranking — quarter-filtered
    orders join returnflag-filtered lineitem, customer + nation dims
    broadcast, top-20 via TakeOrderedAndProject (no global sort)."""
    li = _read(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = _read(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    cust = _read(spark, sf_dir, "customer")
    nation = _read(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


SQL_TPCH_Q10_RETURNS = """
SELECT c_custkey, c_name, c_acctbal, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-10-01' AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY 1, 2, 3, 4
ORDER BY revenue DESC, c_custkey ASC LIMIT 20
"""


def q_tpch_q13_order_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: customer order-count distribution — LEFT OUTER
    join (customers with zero orders must survive with c_count=0, which
    `count(o_orderkey)` gives for the all-null group) followed by a
    second aggregation over the first's result."""
    cust = _read(spark, sf_dir, "customer")
    orders = _read(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


SQL_TPCH_Q13_ORDER_DIST = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
) t GROUP BY c_count
"""


def q_tpch_q14_promo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional-aggregation ratio — one month of
    lineitem joins the part dim (broadcast), and the promo share is a
    CASE-WHEN numerator over the same sum's denominator in a single
    aggregate pass (no second scan)."""
    li = _read(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    part = _read(spark, sf_dir, "part")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                100
                * F.sum(
                    F.when(F.col("p_type") == "PROMO", disc_price).otherwise(0.0)
                )
                / F.sum(disc_price),
                4,
            ).alias("promo_revenue_pct"),
            F.count("*").alias("n_items"),
        )
    )


SQL_TPCH_Q14_PROMO = """
SELECT round(100 * sum(CASE WHEN p_type = 'PROMO'
                            THEN l_extendedprice * (1 - l_discount)
                            ELSE 0.0 END)
             / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue_pct,
       count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01' AND l_shipdate < TIMESTAMP '1996-04-01'
"""


def q_tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: top supplier by quarterly revenue — the revenue
    'view' aggregates once, its global max broadcasts back as a 1-row
    join (the scalar-subquery plan), ties all surface."""
    li = _read(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    supp = _read(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "total_revenue"
        )
    )
    max_rev = rev.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        rev.join(F.broadcast(max_rev), rev.total_revenue == max_rev.max_revenue)
        .join(F.broadcast(supp), rev.l_suppkey == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


SQL_TPCH_Q15_TOP_SUPPLIER = """
WITH rev AS (
  SELECT l_suppkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
"""


def q_tpch_q17_small_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated per-group average predicate — each
    brand-filtered lineitem row compares against 0.2x its OWN part's
    average quantity. The per-part averages aggregate once and join back
    (the decorrelated plan Catalyst would produce); quantities are
    integral doubles so the threshold is bit-identical across engines."""
    li = _read(spark, sf_dir, "lineitem")
    part = _read(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#11")
    thresh = li.groupBy("l_partkey").agg(
        (0.2 * F.avg("l_quantity")).alias("qty_thresh")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(thresh, li.l_partkey == thresh.l_partkey)
        .filter(F.col("l_quantity") < F.col("qty_thresh"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count("*").alias("n_items"),
        )
    )


SQL_TPCH_Q17_SMALL_QTY = """
WITH thresh AS (
  SELECT l_partkey AS t_partkey, 0.2 * avg(l_quantity) AS qty_thresh
  FROM lineitem GROUP BY l_partkey
)
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly,
       count(*) AS n_items
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN thresh ON l_partkey = t_partkey
WHERE p_brand = 'Brand#11' AND l_quantity < qty_thresh
"""


def q_tpch_q22_idle_custs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar-subquery threshold + anti-join — customers
    above the average positive balance with no orders in the dataset's
    final stretch (every customer has *some* order in this synth data, so
    'lapsed since 2000' keeps the plan shape AND yields rows). The global
    avg broadcasts as a 1-row cross join; 'no recent order' is a
    left-anti against date-filtered orders (nation stands in for the
    reference's phone prefix)."""
    cust = _read(spark, sf_dir, "customer")
    orders = _read(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01")
    )
    nation = _read(spark, sf_dir, "nation")
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


SQL_TPCH_Q22_IDLE_CUSTS = """
SELECT n_name, count(*) AS numcust, round(sum(c_acctbal), 2) AS totacctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY n_name
"""


def q_tpch_q4_late_ship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS semi-join with a non-equi component —
    orders in one quarter having at least one line item shipped after
    the order date, counted by priority. Catalyst plans the EXISTS as a
    left-semi hash join on l_orderkey with the date comparison as the
    join-side residual filter (the trimmed schema has no commitdate /
    receiptdate, so shipdate > orderdate is the 'late' predicate)."""
    orders = _read(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-04-01"))
    )
    li = _read(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count("*").alias("order_count")
    )


SQL_TPCH_Q4_LATE_SHIP = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
"""


def q_tpch_q12_priority_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional two-way classification aggregate —
    one year of lineitem joins orders and each line status accumulates
    high- vs low-priority order counts in a single CASE-WHEN pass
    (l_linestatus stands in for the trimmed-away l_shipmode)."""
    li = _read(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
    )
    orders = _read(spark, sf_dir, "orders")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(hi, 0).otherwise(1)).cast("bigint").alias("low_line_count"),
        )
    )


SQL_TPCH_Q12_PRIORITY_CLASS = """
SELECT l_linestatus,
       sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
       sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END)::BIGINT AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l_linestatus
"""


def q_tpch_q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-count per attribute pair with an
    anti-join supplier exclusion — how many distinct suppliers ship each
    (brand, size) of non-PROMO small parts, excluding a blacklisted
    supplier set (s_name ending in '5' stands in for the complaints
    pattern; lineitem stands in for the trimmed-away partsupp)."""
    part = _read(spark, sf_dir, "part").filter(
        (F.col("p_type") != "PROMO") & (F.col("p_size") <= 25)
    )
    li = _read(spark, sf_dir, "lineitem")
    bad = _read(spark, sf_dir, "supplier").filter(
        F.col("s_name").endswith("5")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


SQL_TPCH_Q16_SUPPLIER_CNT = """
SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_type <> 'PROMO' AND p_size <= 25
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_name LIKE '%5')
GROUP BY p_brand, p_size
"""


def q_tpch_q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs join predicate — three (brand, size
    band, quantity band) disjuncts over the part join. Catalyst pushes
    the common l_quantity bounds below the join and keeps the
    brand-correlated disjunction as the join residual; the classic test
    that disjunctive pushdown doesn't degrade to a cartesian."""
    li = _read(spark, sf_dir, "lineitem")
    part = _read(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    disj = (
        (
            (F.col("p_brand") == "Brand#11")
            & (F.col("p_size").between(1, 15))
            & (F.col("l_quantity").between(1, 21))
        )
        | (
            (F.col("p_brand") == "Brand#12")
            & (F.col("p_size").between(10, 30))
            & (F.col("l_quantity").between(10, 30))
        )
        | (
            (F.col("p_brand") == "Brand#13")
            & (F.col("p_size").between(20, 50))
            & (F.col("l_quantity").between(20, 40))
        )
    )
    return j.filter(disj).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
        F.count("*").alias("n_items"),
    )


SQL_TPCH_Q19_DISJUNCTIVE = """
SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 21)
   OR (p_brand = 'Brand#12' AND p_size BETWEEN 10 AND 30
       AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#13' AND p_size BETWEEN 20 AND 50
       AND l_quantity BETWEEN 20 AND 40)
"""


def q_tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: national market share — NATION_2's fraction of
    ASIA-customer ECONOMY-part revenue per order year. The classic
    8-relation snowflake with TWO roles for nation (customer side walks
    to region for the market filter, supplier side provides the share
    dimension) folded into a conditional-aggregate ratio. All dims
    broadcast; the only shuffle is the lineitem⋈orders hash join and the
    final tiny per-year aggregate."""
    li = _read(spark, sf_dir, "lineitem")
    orders = _read(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    part = _read(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    supp = _read(spark, sf_dir, "supplier")
    cust = _read(spark, sf_dir, "customer")
    n1 = _read(spark, sf_dir, "nation").alias("n1")  # customer side
    n2 = _read(spark, sf_dir, "nation").alias("n2")  # supplier side
    region = _read(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    j = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), cust.c_nationkey == F.col("n1.n_nationkey"))
        .join(
            F.broadcast(region), F.col("n1.n_regionkey") == region.r_regionkey
        )
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n2), supp.s_nationkey == F.col("n2.n_nationkey"))
    )
    return (
        j.select(
            F.year("o_orderdate").alias("o_year"),
            vol.alias("volume"),
            (F.col("n2.n_name") == "NATION_2").alias("is_target"),
        )
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("is_target"), F.col("volume")).otherwise(0.0))
                / F.sum("volume"),
                6,
            ).alias("mkt_share")
        )
    )


SQL_TPCH_Q8_MARKET_SHARE = """
SELECT year(o_orderdate) AS o_year,
       round(sum(CASE WHEN n2.n_name = 'NATION_2'
                      THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END)
             / sum(l_extendedprice * (1 - l_discount)), 6) AS mkt_share
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region ON n1.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE p_type = 'ECONOMY' AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1995-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY o_year
"""


def q_tpch_q9_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: product-type profit by supplier nation and year.
    The trimmed schema has no partsupp, so supply cost is proxied by
    10% of p_retailprice per unit — same plan shape: big-fact joins to
    two broadcast dims, profit expression evaluated map-side, grouped by
    (nation, year)."""
    li = _read(spark, sf_dir, "lineitem")
    part = _read(spark, sf_dir, "part").filter(F.col("p_name").contains("ge"))
    supp = _read(spark, sf_dir, "supplier")
    nation = _read(spark, sf_dir, "nation")
    orders = _read(spark, sf_dir, "orders")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.lit(
        0.1
    ) * F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum("amount"), 2).alias("sum_profit"))
    )


SQL_TPCH_Q9_PROFIT = """
SELECT n_name AS nation, year(o_orderdate) AS o_year,
       round(sum(l_extendedprice * (1 - l_discount)
                 - 0.1 * p_retailprice * l_quantity), 2) AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_name LIKE '%ge%'
GROUP BY n_name, o_year
"""


def q_tpch_q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who kept waiting — the double
    correlated-subquery classic (one EXISTS, one NOT EXISTS, both
    correlated to the outer row AND anti-correlated on supplier). The
    trimmed schema has no commit/receipt dates, so 'late' is
    l_shipdate > o_orderdate + 60 days. A line is counted when its
    supplier was late on a multi-supplier finished order and NO other
    supplier on that order was late: one left-semi and one left-anti
    join on l_orderkey with non-equi residuals — no correlated re-scan
    per row, which is what keeps the shape viable on a 100 TB fact."""
    li = _read(spark, sf_dir, "lineitem")
    orders = _read(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    late_cut = F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    l1 = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") > late_cut)
        .select("l_orderkey", "l_suppkey", "o_orderdate")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2")
    )
    l3 = li.select(
        F.col("l_orderkey").alias("o3"),
        F.col("l_suppkey").alias("s3"),
        F.col("l_shipdate").alias("ship3"),
    )
    waited = (
        l1.join(
            l2,
            (F.col("l_orderkey") == F.col("o2"))
            & (F.col("l_suppkey") != F.col("s2")),
            "left_semi",
        ).join(
            l3,
            (F.col("l_orderkey") == F.col("o3"))
            & (F.col("l_suppkey") != F.col("s3"))
            & (
                F.col("ship3")
                > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
            ),
            "left_anti",
        )
    )
    supp = _read(spark, sf_dir, "supplier")
    return (
        waited.join(F.broadcast(supp), waited.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


SQL_TPCH_Q21_WAITING_SUPPLIER = """
SELECT s_name, count(*) AS numwait
FROM lineitem l1
JOIN orders ON l1.l_orderkey = o_orderkey
JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY s_name
ORDER BY numwait DESC, s_name ASC
LIMIT 20
"""


def q_tpch_q2_min_cost_supp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: minimum-cost supplier — the correlated
    scalar-min subquery classic. The trimmed schema has no partsupp, so
    the supply cost is derived: per (part, supplier) pair,
    round(min(l_extendedprice / l_quantity), 2) — min is
    order-independent and the per-row division is IEEE-identical in
    both engines, so the 2-dp rounded double compares exactly. The
    correlated `cost = (SELECT min(cost) ... WHERE same part)` becomes
    a single partition-window min over p_partkey — one shuffle of the
    already-aggregated pair table, never a per-row re-scan. All four
    dimensions (part, supplier, nation, region) broadcast; the only
    wide exchanges are the pair groupBy and the window, both keyed on
    partkey — the plan that holds when lineitem is the 100 TB fact.
    Completes the 22-query TPC-H shape suite with Q11/Q20."""
    li = _read(spark, sf_dir, "lineitem")
    ps = li.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(
        F.round(
            F.min(F.col("l_extendedprice") / F.col("l_quantity")), 2
        ).alias("ps_supplycost")
    )
    part = _read(spark, sf_dir, "part").filter(
        (F.col("p_type") == "LARGE") & F.col("p_size").between(10, 20)
    )
    region = _read(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    dims = (
        _read(spark, sf_dir, "supplier")
        .join(F.broadcast(_read(spark, sf_dir, "nation")), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    eligible = ps.join(
        F.broadcast(part), ps.ps_partkey == part.p_partkey
    ).join(F.broadcast(dims), ps.ps_suppkey == F.col("s_suppkey"))
    w = Window.partitionBy("p_partkey")
    return (
        eligible.withColumn("min_cost", F.min("ps_supplycost").over(w))
        .filter(F.col("ps_supplycost") == F.col("min_cost"))
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "ps_supplycost"
        )
        .orderBy(
            F.desc("s_acctbal"), F.asc("n_name"), F.asc("s_name"), F.asc("p_partkey")
        )
        .limit(100)
    )


SQL_TPCH_Q2_MIN_COST_SUPP = """
WITH ps AS (
  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         round(min(l_extendedprice / l_quantity), 2) AS ps_supplycost
  FROM lineitem GROUP BY 1, 2
), eligible AS (
  SELECT p_partkey, p_name, s_name, s_acctbal, n_name, ps_supplycost
  FROM ps
  JOIN part ON ps_partkey = p_partkey
  JOIN supplier ON ps_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE' AND p_type = 'LARGE' AND p_size BETWEEN 10 AND 20
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name, ps_supplycost
FROM eligible e
WHERE ps_supplycost = (SELECT min(ps_supplycost) FROM eligible e2
                       WHERE e2.p_partkey = e.p_partkey)
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


def q_tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: important stock — groupBy + HAVING against a
    global-scalar subquery. Values are integer cents
    (round(extprice*(1-disc)*100) cast BIGINT) so every sum is exact in
    any order — the float-sum nondeterminism that would otherwise make
    the HAVING boundary flip between engines cannot occur. The scalar
    total is a 1-row aggregate cross-joined in (broadcast of one row);
    the nation-filtered supplier dimension broadcasts into the fact
    scan, so the only wide exchange is the partkey groupBy. At 100 TB
    the total is a second pass over the same shuffled partials (AQE
    reuses the exchange), never a driver collect."""
    nations = ("NATION_3", "NATION_7", "NATION_11")
    supp = (
        _read(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                _read(spark, sf_dir, "nation").filter(F.col("n_name").isin(*nations))
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    v = (
        _read(spark, sf_dir, "lineitem")
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.round(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
            )
            .cast("long")
            .alias("cents"),
        )
    )
    per_part = v.groupBy("p_partkey").agg(F.sum("cents").alias("value_cents"))
    total = v.agg(F.sum("cents").alias("t"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("value_cents") > F.col("t") * 0.001)
        .select("p_partkey", "value_cents")
    )


SQL_TPCH_Q11_IMPORTANT_STOCK = """
WITH v AS (
  SELECT l_partkey AS p_partkey,
         CAST(round(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT) AS cents
  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name IN ('NATION_3', 'NATION_7', 'NATION_11')
)
SELECT p_partkey, CAST(sum(cents) AS BIGINT) AS value_cents
FROM v GROUP BY 1
HAVING sum(cents) > (SELECT sum(cents) * 0.001 FROM v)
"""


def q_tpch_q20_potential_promo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: potential part promotion — nested IN
    subqueries flattened to semi-joins over two aggregates at different
    granularity. No partsupp, so 'available' is the supplier's own
    1997 shipped quantity of the part and the bar is a 50% share of the
    part's 1997 total across suppliers (real Q20 compares ps_availqty
    to half the year's shipments the same way). Quantities are integral
    doubles, so BIGINT-cast sums are exact. Plan: the prefix-filtered
    part list broadcasts as a semi-join into the year-sliced fact
    (partition-pruned scan at scale), one (part, supp) groupBy, the
    part-total re-aggregated FROM the pair partials (never a second
    fact scan), then a broadcast semi-join into the nation-filtered
    supplier dimension — the qualifying pair table is tiny by then."""
    nations = ("NATION_2", "NATION_5", "NATION_12", "NATION_19")
    smparts = (
        _read(spark, sf_dir, "part")
        .filter(F.col("p_name").startswith("sm"))
        .select("p_partkey")
    )
    li97 = (
        _read(spark, sf_dir, "lineitem")
        .filter(F.year("l_shipdate") == 1997)
        .join(
            F.broadcast(smparts),
            F.col("l_partkey") == F.col("p_partkey"),
            "left_semi",
        )
    )
    pair = li97.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").cast("long").alias("pair_qty")
    )
    part_tot = pair.groupBy("l_partkey").agg(
        F.sum("pair_qty").alias("part_qty")
    )
    qual = pair.join(part_tot, "l_partkey").filter(
        F.col("pair_qty") > 0.5 * F.col("part_qty")
    )
    supp = _read(spark, sf_dir, "supplier").join(
        F.broadcast(
            _read(spark, sf_dir, "nation").filter(F.col("n_name").isin(*nations))
        ),
        F.col("s_nationkey") == F.col("n_nationkey"),
    )
    return (
        supp.join(
            F.broadcast(qual),
            F.col("s_suppkey") == F.col("l_suppkey"),
            "left_semi",
        )
        .select("s_name")
        .orderBy("s_name")
    )


SQL_TPCH_Q20_POTENTIAL_PROMO = """
WITH pair AS (
  SELECT l_partkey AS p, l_suppkey AS s, CAST(sum(l_quantity) AS BIGINT) AS pair_qty
  FROM lineitem
  WHERE year(l_shipdate) = 1997
    AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'sm%')
  GROUP BY 1, 2
), year_part AS (
  SELECT p, CAST(sum(pair_qty) AS BIGINT) AS part_qty FROM pair GROUP BY 1
)
SELECT s_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name IN ('NATION_2', 'NATION_5', 'NATION_12', 'NATION_19')
  AND s_suppkey IN (SELECT s FROM pair JOIN year_part USING (p)
                    WHERE pair_qty > 0.5 * part_qty)
ORDER BY s_name
"""


_HAC_ROUNDS = 3


def q_hac_reciprocal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed hierarchical agglomerative clustering: 3 rounds of
    reciprocal-nearest-neighbor merging within label buckets — the
    parallel HAC primitive (each round merges every pair that are
    mutually nearest, the Boruvka-style step TeraHAC [SIGMOD 2023]
    builds its (1+eps)-approximate trillion-edge dendrogram from). The
    reference steers crawling with hierarchical agglomerative
    clustering of page text (north-star surface; the sigma-criterion
    TargetVectorCluster is its cluster-admission rule) — this is that
    primitive over the embedding space at fan-out scale.

    Determinism discipline (the kmeans_embed recipe): centroids are
    size-weighted averages ROUNDED 6 dp after every merge and distances
    round 6 dp before the argmin, so both engines iterate on identical
    state; nearest-neighbor ties break to the lower cluster id, and a
    merged pair keeps the lower id. Per round: one bucketed centroid
    self-join (work = sum of bucket^2, never global n^2), one argmin
    window bounded by bucket size, a self-join of the tiny NN table for
    reciprocity, and a broadcast relabel of the membership — every
    stage is the plan you'd run at 10^10 vectors with IVF cells as the
    buckets."""
    e = _read(spark, sf_dir, "embeddings").select("vec_id", "label", "embedding")
    clusters = e.select(
        "label",
        F.col("vec_id").alias("cid"),
        F.expr("transform(embedding, x -> round(cast(x as double), 6))").alias(
            "centroid"
        ),
        F.lit(1).cast("bigint").alias("sz"),
    ).localCheckpoint(eager=True)
    members = e.select("vec_id", F.col("vec_id").alias("cid"))
    for _ in range(_HAC_ROUNDS):
        a = clusters.select(
            "label",
            F.col("cid").alias("acid"),
            F.col("centroid").alias("ca"),
            F.col("sz").alias("sa"),
        )
        b = clusters.select(
            "label",
            F.col("cid").alias("bcid"),
            F.col("centroid").alias("cb"),
            F.col("sz").alias("sb"),
        )
        pairs = a.join(b, "label").filter(F.col("acid") != F.col("bcid"))
        d2 = F.round(F.expr(_sqdist_expr("ca", "cb")), 6)
        wnn = Window.partitionBy("acid").orderBy(F.asc("d2"), F.asc("bcid"))
        nn = (
            pairs.select("label", "acid", "bcid", "ca", "sa", "cb", "sb", d2.alias("d2"))
            .withColumn("r", F.row_number().over(wnn))
            .filter(F.col("r") == 1)
            .localCheckpoint(eager=True)
        )
        x, y = nn.alias("x"), nn.alias("y")
        merges = (
            x.join(
                y,
                (F.col("x.bcid") == F.col("y.acid"))
                & (F.col("y.bcid") == F.col("x.acid"))
                & (F.col("x.acid") < F.col("y.acid")),
            )
            .select(
                F.col("x.label").alias("label"),
                F.col("x.acid").alias("win"),
                F.col("x.bcid").alias("lose"),
                F.col("x.ca").alias("ca"),
                F.col("x.sa").alias("sa"),
                F.col("x.cb").alias("cb"),
                F.col("x.sb").alias("sb"),
            )
        )
        merged = merges.select(
            "label",
            F.col("win").alias("cid"),
            F.expr(
                "zip_with(ca, cb, (x, y) ->"
                " round((sa * x + sb * y) / (sa + sb), 6))"
            ).alias("centroid"),
            (F.col("sa") + F.col("sb")).alias("sz"),
        )
        touched = merges.select(F.col("win").alias("tcid")).union(
            merges.select(F.col("lose").alias("tcid"))
        )
        clusters = (
            clusters.join(
                F.broadcast(touched), clusters.cid == F.col("tcid"), "left_anti"
            )
            .unionByName(merged)
            .localCheckpoint(eager=True)
        )
        relabel = merges.select("win", "lose")
        members = (
            members.join(F.broadcast(relabel), members.cid == F.col("lose"), "left")
            .select(
                "vec_id", F.coalesce("win", F.col("cid")).alias("cid")
            )
            .localCheckpoint(eager=True)
        )
    return members.select("vec_id", F.col("cid").alias("cluster_id"))


def _hac_oracle_sql() -> str:
    parts = [
        """WITH c0 AS MATERIALIZED (
  SELECT label, vec_id AS cid,
         list_transform(embedding, x -> round(x::DOUBLE, 6)) AS centroid,
         1::BIGINT AS sz
  FROM embeddings
),
m0 AS MATERIALIZED (SELECT vec_id, vec_id AS cid FROM embeddings)"""
    ]
    for k in range(1, _HAC_ROUNDS + 1):
        p = k - 1
        parts.append(
            f""", nn{k} AS MATERIALIZED (
  SELECT label, acid, bcid, ca, sa, cb, sb FROM (
    SELECT a.label, a.cid AS acid, b.cid AS bcid,
           a.centroid AS ca, a.sz AS sa, b.centroid AS cb, b.sz AS sb,
           round({_sql_sqdist('a.centroid', 'b.centroid')}, 6) AS d2,
           row_number() OVER (
             PARTITION BY a.cid
             ORDER BY round({_sql_sqdist('a.centroid', 'b.centroid')}, 6) ASC,
                      b.cid ASC) AS r
    FROM c{p} a JOIN c{p} b ON a.label = b.label AND a.cid <> b.cid
  ) t WHERE r = 1
), mg{k} AS MATERIALIZED (
  SELECT x.label, x.acid AS win, x.bcid AS lose,
         x.ca, x.sa, x.cb, x.sb
  FROM nn{k} x JOIN nn{k} y
    ON x.bcid = y.acid AND y.bcid = x.acid AND x.acid < y.acid
), c{k} AS MATERIALIZED (
  SELECT c.label, c.cid, c.centroid, c.sz FROM c{p} c
  WHERE c.cid NOT IN (SELECT win FROM mg{k})
    AND c.cid NOT IN (SELECT lose FROM mg{k})
  UNION ALL
  SELECT label, win AS cid,
         list_transform(list_zip(ca, cb),
           x -> round((sa * x[1] + sb * x[2]) / (sa + sb), 6)) AS centroid,
         sa + sb AS sz
  FROM mg{k}
), m{k} AS MATERIALIZED (
  SELECT m.vec_id, coalesce(g.win, m.cid) AS cid
  FROM m{p} m LEFT JOIN mg{k} g ON m.cid = g.lose
)"""
        )
    parts.append(
        f"""
SELECT vec_id, cid AS cluster_id FROM m{_HAC_ROUNDS}"""
    )
    return "".join(parts)


SQL_HAC_RECIPROCAL = _hac_oracle_sql()


_FL_ROUNDS = 3


def q_facility_location(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy facility-location selection — the submodular coreset
    picker (Mirzasoleiman et al., CRAIG; Iyer & Bilmes): per label
    bucket, greedily pick the {rounds} exemplars maximizing coverage
    F(S) = sum_p max_{{c in S}} sim(c, p), the (1-1/e)-approximate
    data-selection objective LLM pipelines use to pick representative
    training subsets. Kernel sim = 1/(1+sqdist), held in integer
    micro-units (round(1e6/(1+d2)) BIGINT) so every marginal-gain sum
    is order-independent and the per-round argmax is bit-identical in
    both engines (the quality_classifier discipline); argmax ties break
    to the lower vec_id.

    Scale shape: the similarity table is a bucketed self-join (work =
    sum of bucket^2 — IVF cells at 10^10 vectors, same contract as
    hac_reciprocal), built once and localCheckpoint()ed; each round is
    one join + partial-agg sum + a per-label top-1 window + a broadcast
    cov update — gains for ALL candidates in one distributed pass,
    never a per-candidate loop."""
    e = _read(spark, sf_dir, "embeddings")
    a = e.select("label", F.col("vec_id").alias("cand"), F.col("embedding").alias("va"))
    b = e.select("label", F.col("vec_id").alias("p"), F.col("embedding").alias("vb"))
    s_units = F.round(1000000.0 / (1.0 + F.expr(_sqdist_expr("va", "vb")))).cast(
        "long"
    )
    sims = (
        a.join(b, "label")
        .select("label", "cand", "p", s_units.alias("s"))
        .localCheckpoint(eager=True)
    )
    cov = sims.select("label", "p").distinct().withColumn("cov", F.lit(0).cast("long"))
    chosen = None
    out = None
    wtop = Window.partitionBy("label").orderBy(F.desc("gain"), F.asc("cand"))
    for r in range(1, _FL_ROUNDS + 1):
        gains = (
            sims.join(cov, ["label", "p"])
            .select("label", "cand", F.greatest(F.col("s") - F.col("cov"), F.lit(0).cast("long")).alias("g"))
            .groupBy("label", "cand")
            .agg(F.sum("g").alias("gain"))
        )
        if chosen is not None:
            gains = gains.join(F.broadcast(chosen), ["label", "cand"], "left_anti")
        winners = (
            gains.withColumn("rk", F.row_number().over(wtop))
            .filter(F.col("rk") == 1)
            .select("label", "cand", "gain", F.lit(r).alias("round"))
            .localCheckpoint(eager=True)
        )
        chosen = (
            winners.select("label", "cand")
            if chosen is None
            else chosen.union(winners.select("label", "cand")).localCheckpoint()
        )
        out = winners if out is None else out.unionByName(winners)
        wsims = sims.join(
            F.broadcast(winners.select("label", "cand")), ["label", "cand"]
        ).select("label", "p", F.col("s").alias("ws"))
        cov = (
            cov.join(wsims, ["label", "p"], "left")
            .select(
                "label",
                "p",
                F.greatest("cov", F.coalesce("ws", F.lit(0).cast("long"))).alias("cov"),
            )
            .localCheckpoint(eager=True)
        )
    return out.select(
        "label",
        F.col("round").cast("int").alias("round"),
        F.col("cand").alias("medoid"),
        F.col("gain").alias("gain_units"),
    )


def _fl_oracle_sql() -> str:
    rounds = []
    prev_cov = "cov0"
    excl = ""
    for r in range(1, _FL_ROUNDS + 1):
        rounds.append(f"""
g{r} AS MATERIALIZED (
  SELECT s.label, s.cand, sum(greatest(s.s - c.cov, 0)) AS gain
  FROM sims s JOIN {prev_cov} c ON s.label = c.label AND s.p = c.p
  {excl}
  GROUP BY s.label, s.cand
),
w{r} AS MATERIALIZED (
  SELECT label, cand, gain, {r} AS round FROM g{r}
  QUALIFY row_number() OVER (PARTITION BY label
                             ORDER BY gain DESC, cand ASC) = 1
),
cov{r} AS MATERIALIZED (
  SELECT c.label, c.p, greatest(c.cov, coalesce(ws.s, 0)) AS cov
  FROM {prev_cov} c
  LEFT JOIN (SELECT s.label, s.p, s.s FROM sims s
             JOIN w{r} ON s.label = w{r}.label AND s.cand = w{r}.cand) ws
    ON c.label = ws.label AND c.p = ws.p
)""")
        sel = " UNION ALL ".join(
            f"SELECT label, cand FROM w{k}" for k in range(1, r + 1)
        )
        excl = (
            f"WHERE NOT EXISTS (SELECT 1 FROM ({sel}) sel "
            f"WHERE sel.label = s.label AND sel.cand = s.cand)"
        )
        prev_cov = f"cov{r}"
    outs = " UNION ALL ".join(
        f"SELECT label, round, cand, gain::BIGINT AS gain FROM w{k}"
        for k in range(1, _FL_ROUNDS + 1)
    )
    return f"""
WITH sims AS MATERIALIZED (
  SELECT a.label, a.vec_id AS cand, b.vec_id AS p,
         CAST(round(1000000.0 / (1.0 + {_sql_sqdist('a.embedding', 'b.embedding')})) AS BIGINT) AS s
  FROM embeddings a JOIN embeddings b ON a.label = b.label
),
cov0 AS (SELECT DISTINCT label, p, CAST(0 AS BIGINT) AS cov FROM sims),
{",".join(rounds)}
SELECT label, round::INTEGER AS round, cand AS medoid, gain AS gain_units
FROM ({outs})
"""


SQL_FACILITY_LOCATION = _fl_oracle_sql()


_PPS_K = 20


def q_pps_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Systematic PPS (probability-proportional-to-size) sampling:
    k=20 docs per language, inclusion probability proportional to
    n_chars — the deterministic weighted sampler a corpus-mixing
    pipeline uses to draw quality- or length-weighted subsets without
    per-row randomness (Madow systematic sampling over the cumulative
    weight line; doc_id order is the deterministic permutation).

    A doc is selected when its cumulative-weight interval crosses a
    multiple of total/k, computed in pure integer arithmetic
    (floor(cum*k/total) increments) — bit-exact on any engine, no RNG,
    no transcendentals. Plan: one per-lang window cumsum over the doc_id
    order + a broadcast of per-lang totals; at 100 TB the cumsum swaps
    to the two-phase bucket plan of pack_bins (same contract)."""
    docs = _read(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.col("n_chars").cast("bigint").alias("w")
    )
    wcum = Window.partitionBy("lang").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    tot = docs.groupBy("lang").agg(F.sum("w").alias("total"))
    cum = docs.select("doc_id", "lang", "w", F.sum("w").over(wcum).alias("cum"))
    j = cum.join(F.broadcast(tot), "lang")
    # integer floor-division (`div`), never double `/`: bit-exact at any
    # corpus size (cum*k can exceed double's 2^53 integer range at 100 TB)
    bucket_hi = F.expr(f"(cum * {_PPS_K}) div total")
    bucket_lo = F.expr(f"((cum - w) * {_PPS_K}) div total")
    return (
        j.filter(bucket_hi > bucket_lo)
        .select(
            "lang",
            "doc_id",
            F.col("w").alias("n_chars"),
            bucket_lo.cast("bigint").alias("slot"),
        )
    )


SQL_PPS_SAMPLE = f"""
WITH docs AS (
  SELECT doc_id, lang, n_chars::BIGINT AS w FROM documents
),
tot AS (SELECT lang, sum(w) AS total FROM docs GROUP BY lang),
cum AS (
  SELECT doc_id, lang, w,
         sum(w) OVER (PARTITION BY lang ORDER BY doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM docs
)
SELECT c.lang, c.doc_id, c.w AS n_chars,
       ((c.cum - c.w) * {_PPS_K} // t.total)::BIGINT AS slot
FROM cum c JOIN tot t ON c.lang = t.lang
WHERE (c.cum * {_PPS_K} // t.total) > ((c.cum - c.w) * {_PPS_K} // t.total)
"""


_AES_K = 15


def q_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-ES weighted reservoir sampling (Efraimidis & Spirakis 2006):
    k=15 docs per language WITHOUT replacement, inclusion biased by
    n_chars — the mergeable weighted sampler (each partition keeps its
    k smallest keys; merging reservoirs = merging top-k heaps, which is
    exactly Spark's partial TakeOrdered/window shape). Complements
    `pps_sample` (systematic/Madow): A-ES is the one you use when the
    stream is unordered and reservoirs must merge across executors.

    Key = -ln(u)/w with u derived from md5(doc_id) (the repo's standard
    cross-engine uniform: first 8 hex digits -> 32-bit int -> (h+0.5)/2^32,
    bit-identical in Spark and DuckDB). ln() is the one transcendental:
    both engines are within 1 ULP, so keys are rounded to 9 dp and ties
    break on doc_id — rank flips would need two of ~500 exponential
    keys within 1e-9, and the tie-break makes even that deterministic.
    Plan: pure map to build keys, one per-lang top-k window (map-side
    partial via rank pushdown) — no global sort, no RNG state."""
    docs = _read(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.col("n_chars").cast("double").alias("w")
    )
    h = F.expr(
        "cast(conv(substring(md5(cast(doc_id as string)), 1, 8), 16, 10) as bigint)"
    )
    u = (h.cast("double") + 0.5) / F.lit(float(2**32))
    key = F.round(-F.log(u) / F.col("w"), 9)
    w = Window.partitionBy("lang").orderBy(F.asc("key"), F.asc("doc_id"))
    return (
        docs.select("doc_id", "lang", "w", key.alias("key"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _AES_K)
        .select(
            "lang",
            F.col("rk").cast("int").alias("rk"),
            "doc_id",
            F.col("w").cast("bigint").alias("n_chars"),
            "key",
        )
    )


SQL_WEIGHTED_RESERVOIR = f"""
WITH keyed AS (
  SELECT doc_id, lang, n_chars::DOUBLE AS w,
         round(
           -ln((('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT::DOUBLE
                + 0.5) / 4294967296.0)
           / n_chars::DOUBLE, 9) AS key
  FROM documents
),
ranked AS (
  SELECT lang, doc_id, w, key,
         row_number() OVER (PARTITION BY lang ORDER BY key ASC, doc_id ASC)
           AS rk
  FROM keyed
)
SELECT lang, rk::INTEGER AS rk, doc_id, w::BIGINT AS n_chars, key
FROM ranked WHERE rk <= {_AES_K}
"""


def q_rolling_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window time-series monitor: per event_type daily counts
    with a 7-day trailing mean and an anomaly flag when a day runs over
    2x its trailing mean — the freshness/volume monitor a continuously
    crawling pipeline keeps per host and per content source (same shape:
    date-keyed counts, interval frame, threshold flag).

    Exercises RANGE-frame windows over an aggregated daily table (never
    the raw stream — the window input is |types| x |days| rows no matter
    the event volume). Day-over-trailing ratio and flag are derived from
    integer counts, so both engines agree bit-for-bit; the trailing mean
    divides two integers (sum/count) and rounds 4 dp."""
    ev = _read(spark, sf_dir, "events").select(
        "event_type", F.col("ts").cast("date").alias("day")
    )
    daily = ev.groupBy("event_type", "day").agg(F.count("*").alias("n"))
    # trailing frame: the 6 calendar days before today plus today —
    # RANGE over day-number so gaps count as missing days, not rows
    dnum = F.datediff(F.col("day"), F.lit("2024-01-01").cast("date"))
    w = (
        Window.partitionBy("event_type")
        .orderBy(dnum)
        .rangeBetween(-6, 0)
    )
    out = daily.select(
        "event_type",
        F.col("day").cast("string").alias("day"),
        "n",
        F.round(
            F.sum("n").over(w) / F.count("n").over(w).cast("double"), 4
        ).alias("trail7_mean"),
        F.count("n").over(w).alias("trail7_days"),
    )
    return out.withColumn(
        "anomaly",
        F.col("n").cast("double") > 2.0 * F.col("trail7_mean"),
    )


SQL_ROLLING_STATS = """
WITH daily AS (
  SELECT event_type, ts::DATE AS day, count(*) AS n
  FROM events GROUP BY event_type, ts::DATE
),
win AS (
  SELECT event_type, day, n,
         round(sum(n) OVER w / count(n) OVER w::DOUBLE, 4) AS trail7_mean,
         count(n) OVER w AS trail7_days
  FROM daily
  WINDOW w AS (PARTITION BY event_type
               ORDER BY date_diff('day', DATE '2024-01-01', day)
               RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
)
SELECT event_type, strftime(day, '%Y-%m-%d') AS day, n, trail7_mean,
       trail7_days, n::DOUBLE > 2.0 * trail7_mean AS anomaly
FROM win
"""


def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-funnel conversion (view -> click -> purchase): a user
    reaches step k only with a strictly later event of each successive
    type — the sequence-matching analytics-engine classic, and the shape
    a crawl pipeline reuses for URL lifecycle funnels (scheduled ->
    fetched -> accepted).

    Plan: one per-user min-aggregate per step, each conditioned on the
    previous step's timestamp via an equi-join on user_id + a residual
    range filter — three user-keyed hash aggregates and two user-keyed
    joins, all partial-aggregatable; no window over the raw event
    stream, so the plan holds at any event volume."""
    ev = _read(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    n1, n2, n3 = v.count(), c.count(), p.count()
    rows = [
        (1, "view", n1, round(1.0, 4)),
        (2, "click", n2, round(n2 / n1, 4) if n1 else 0.0),
        (3, "purchase", n3, round(n3 / n2, 4) if n2 else 0.0),
    ]
    return spark.createDataFrame(
        rows, "step int, step_name string, n_users bigint, rate_from_prev double"
    )


SQL_FUNNEL_CONVERSION = """
WITH v AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t1
  WHERE e.event_type = 'click' GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
  WHERE e.event_type = 'purchase' GROUP BY e.user_id
),
n AS (
  SELECT (SELECT count(*) FROM v) AS n1,
         (SELECT count(*) FROM c) AS n2,
         (SELECT count(*) FROM p) AS n3
)
SELECT 1 AS step, 'view' AS step_name, n1::BIGINT AS n_users,
       round(1.0, 4) AS rate_from_prev FROM n
UNION ALL
SELECT 2, 'click', n2::BIGINT,
       CASE WHEN n1 = 0 THEN 0.0 ELSE round(n2 / n1::DOUBLE, 4) END FROM n
UNION ALL
SELECT 3, 'purchase', n3::BIGINT,
       CASE WHEN n2 = 0 THEN 0.0 ELSE round(n3 / n2::DOUBLE, 4) END FROM n
"""


def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix: users grouped by the week of
    their first event, retention = fraction of the cohort active in
    each later week — the recurring-activity rollup every analytics
    engine ships, and the shape of a recrawl-freshness matrix (hosts
    cohorted by first-seen week vs weeks they yielded new pages).

    Plan: per-user min aggregate (cohort), distinct (user, week)
    activity, one join, then a (cohort, offset) count-distinct — all
    user-keyed shuffles, partial-aggregatable, no windows."""
    ev = _read(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("wk")
    )
    first = ev.groupBy("user_id").agg(F.min("wk").alias("cohort_wk"))
    active = ev.distinct()
    joined = active.join(first, "user_id").select(
        "user_id",
        F.col("cohort_wk").cast("date").alias("cohort_week"),
        (
            F.floor(
                F.datediff(F.col("wk").cast("date"), F.col("cohort_wk").cast("date"))
                / 7
            )
        ).cast("int").alias("week_offset"),
    )
    per_cell = joined.groupBy("cohort_week", "week_offset").agg(
        F.countDistinct("user_id").alias("n_active")
    )
    base = per_cell.filter(F.col("week_offset") == 0).select(
        F.col("cohort_week").alias("bw"), F.col("n_active").alias("cohort_size")
    )
    return (
        per_cell.join(F.broadcast(base), per_cell.cohort_week == F.col("bw"))
        .select(
            F.col("cohort_week").cast("string").alias("cohort_week"),
            "week_offset",
            "n_active",
            "cohort_size",
            F.round(
                F.col("n_active") / F.col("cohort_size").cast("double"), 4
            ).alias("retention"),
        )
    )


SQL_RETENTION_COHORTS = """
WITH ev AS (
  SELECT user_id, date_trunc('week', ts) AS wk FROM events
),
first AS (SELECT user_id, min(wk) AS cohort_wk FROM ev GROUP BY user_id),
active AS (SELECT DISTINCT user_id, wk FROM ev),
joined AS (
  SELECT a.user_id, f.cohort_wk::DATE AS cohort_week,
         (date_diff('day', f.cohort_wk::DATE, a.wk::DATE) // 7)::INT
           AS week_offset
  FROM active a JOIN first f ON a.user_id = f.user_id
),
per_cell AS (
  SELECT cohort_week, week_offset, count(DISTINCT user_id) AS n_active
  FROM joined GROUP BY cohort_week, week_offset
),
base AS (
  SELECT cohort_week AS bw, n_active AS cohort_size
  FROM per_cell WHERE week_offset = 0
)
SELECT strftime(p.cohort_week, '%Y-%m-%d') AS cohort_week, p.week_offset,
       p.n_active, b.cohort_size,
       round(p.n_active / b.cohort_size::DOUBLE, 4) AS retention
FROM per_cell p JOIN base b ON p.cohort_week = b.bw
"""


# -- Gopher document-level admission rules (Rae et al. 2021, Appendix A) ----
#
# The synthetic documents carry no symbols or numerals, so the two rules
# that need them get deterministic in-engine injections (same precedent as
# the PII scrub): doc_id % 5 == 0 appends eight '#' symbol tokens
# (symbol-to-word ratio rule), doc_id % 6 == 0 appends twenty numeric
# tokens (alpha-word fraction rule). Short docs fail the word-count floor
# naturally; the stop-word rule uses the module stop list.

_GOPHER_SYMS = " ".join(["#"] * 8)
_GOPHER_NUMS = " ".join(str(100 + 7 * i) for i in range(20))
_GOPHER_AUG_SPARK = (
    f"concat(text, case when doc_id % 5 = 0 then ' {_GOPHER_SYMS}' else '' end, "
    f"case when doc_id % 6 = 0 then ' {_GOPHER_NUMS}' else '' end)"
)
_GOPHER_AUG_SQL = (
    f"text || (CASE WHEN doc_id % 5 = 0 THEN ' {_GOPHER_SYMS}' ELSE '' END) "
    f"|| (CASE WHEN doc_id % 6 = 0 THEN ' {_GOPHER_NUMS}' ELSE '' END)"
)


def q_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher quality-filter rule set (MassiveText admission, Rae et al.
    2021): word-count bounds, mean-word-length band, symbol-to-word ratio,
    alphabetic-word fraction, and minimum distinct stop words — the
    standard web-text document admission gate, one rule flag per column
    plus the conjunctive keep bit.

    Scale shape: pure map stage over the corpus — every signal is a
    per-row expression on the token array (no explode, no shuffle, no
    Python); at 100 TB this is a single scan-project pass that pushes
    only (doc_id, text) through the reader."""
    docs = _read(spark, sf_dir, "documents")
    aug_toks = _TOKS.replace(
        "lower(text)", f"lower({_GOPHER_AUG_SPARK})"
    )
    d = docs.select(
        "doc_id",
        F.expr(f"cast(size({aug_toks}) as bigint)").alias("n_words"),
        F.expr(
            f"round(aggregate({aug_toks}, 0L, (acc, t) -> acc + length(t)) "
            f"/ cast(size({aug_toks}) as double), 4)"
        ).alias("mean_word_len"),
        F.expr(
            f"round(size(filter({aug_toks}, t -> t = '#' or t = '...')) "
            f"/ cast(size({aug_toks}) as double), 4)"
        ).alias("symbol_ratio"),
        F.expr(
            f"round(size(filter({aug_toks}, t -> t rlike '[a-z]')) "
            f"/ cast(size({aug_toks}) as double), 4)"
        ).alias("alpha_frac"),
        F.expr(
            f"cast(size(array_intersect({aug_toks}, {_SPARK_STOPLIST})) as bigint)"
        ).alias("n_stop"),
    )
    return d.select(
        "*",
        F.expr("cast(n_words >= 50 and n_words <= 100000 as int)").alias("ok_count"),
        F.expr(
            "cast(mean_word_len >= 3.0 and mean_word_len <= 10.0 as int)"
        ).alias("ok_length"),
        F.expr("cast(symbol_ratio <= 0.1 as int)").alias("ok_symbols"),
        F.expr("cast(alpha_frac >= 0.8 as int)").alias("ok_alpha"),
        F.expr("cast(n_stop >= 2 as int)").alias("ok_stop"),
    ).withColumn(
        "keep",
        F.expr(
            "cast(ok_count = 1 and ok_length = 1 and ok_symbols = 1 "
            "and ok_alpha = 1 and ok_stop = 1 as int)"
        ),
    )


SQL_GOPHER_RULES = f"""
WITH t AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower({_GOPHER_AUG_SQL}), '\\s+'),
                     t -> t <> '') AS toks
  FROM documents
), sig AS (
  SELECT doc_id,
         len(toks) AS n_words,
         round(list_sum(list_transform(toks, t -> length(t)))
               / len(toks)::DOUBLE, 4) AS mean_word_len,
         round(len(list_filter(toks, t -> t = '#' OR t = '...'))
               / len(toks)::DOUBLE, 4) AS symbol_ratio,
         round(len(list_filter(toks, t -> regexp_matches(t, '[a-z]')))
               / len(toks)::DOUBLE, 4) AS alpha_frac,
         len(list_distinct(list_filter(toks, t -> list_contains({_SQL_STOPLIST}, t))))
            AS n_stop
  FROM t
)
SELECT *,
       (ok_count = 1 AND ok_length = 1 AND ok_symbols = 1
        AND ok_alpha = 1 AND ok_stop = 1)::INT AS keep
FROM (
  SELECT *,
         (n_words BETWEEN 50 AND 100000)::INT AS ok_count,
         (mean_word_len BETWEEN 3.0 AND 10.0)::INT AS ok_length,
         (symbol_ratio <= 0.1)::INT AS ok_symbols,
         (alpha_frac >= 0.8)::INT AS ok_alpha,
         (n_stop >= 2)::INT AS ok_stop
  FROM sig
) r
"""


# -- C4 line-level cleaning (Raffel et al. 2020 §2.2) -----------------------
#
# The corpus has no line structure, so lines are built deterministically
# in-engine: 12-word windows, with (doc_id + idx) % 3 != 0 lines given a
# terminal '.', every (doc_id * 7 + idx) % 11 == 0 line poisoned with a
# 'javascript' token, doc_id % 17 == 0 docs given a '{' and doc_id % 19
# == 0 docs a 'lorem ipsum' marker — so every C4 rule fires on known rows.

_C4_W = 12


def q_c4_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 cleaning (Raffel et al. 2020): keep only lines that end in
    terminal punctuation, have >= 5 words, and don't mention javascript;
    drop whole documents containing '{' or 'lorem ipsum' or with < 3
    surviving lines; reassemble the survivors in order.

    Scale shape: explode to lines -> per-line map flags -> one
    groupBy(doc_id) for the doc-level verdict + ordered reassembly. One
    shuffle keyed by doc_id (pre-aggregated map-side), no Python."""
    toks = _tokens(_docs_parallel(spark, sf_dir)).filter(F.expr("size(toks) > 0"))
    lines = toks.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, cast(ceil(size(toks)/{_C4_W}.0) as int) - 1), "
                f"i -> array_join(slice(toks, i*{_C4_W}+1, {_C4_W}), ' '))"
            )
        ).alias("idx", "line0"),
    ).select(
        "doc_id",
        "idx",
        F.expr(
            "concat(case when (doc_id * 7 + idx) % 11 = 0 then 'javascript ' else '' end, "
            "case when doc_id % 19 = 0 and idx = 0 then 'lorem ipsum ' else '' end, "
            "line0, "
            "case when doc_id % 17 = 0 and idx = 0 then ' {' else '' end, "
            "case when (doc_id + idx) % 3 != 0 then '.' else '' end)"
        ).alias("line"),
    )
    flagged = lines.select(
        "doc_id",
        "idx",
        "line",
        F.expr(
            "cast(line like '%.' and size(split(line, ' ')) >= 5 "
            "and not line like '%javascript%' as int)"
        ).alias("line_ok"),
        F.expr(
            "cast(line like '%{%' or line like '%lorem ipsum%' as int)"
        ).alias("line_poison"),
    )
    return flagged.groupBy("doc_id").agg(
        F.count("*").cast("int").alias("n_lines"),
        F.sum("line_ok").cast("int").alias("n_kept"),
        F.expr(
            "cast(max(line_poison) = 0 and sum(line_ok) >= 3 as int)"
        ).alias("doc_kept"),
        F.array_join(
            F.expr(
                "transform(array_sort(collect_list("
                "case when line_ok = 1 then struct(idx, line) end)), s -> s.line)"
            ),
            " ",
        ).alias("cleaned_text"),
    )


SQL_C4_CLEAN = f"""
WITH t AS (
  SELECT doc_id, {_SQL_TOKS} AS toks FROM documents
), base AS (
  SELECT doc_id, unnest(range(CAST(ceil(len(toks)/{_C4_W}.0) AS INT))) AS idx, toks
  FROM t WHERE len(toks) > 0
), lines AS (
  SELECT doc_id, idx,
         (CASE WHEN (doc_id * 7 + idx) % 11 = 0 THEN 'javascript ' ELSE '' END)
         || (CASE WHEN doc_id % 19 = 0 AND idx = 0 THEN 'lorem ipsum ' ELSE '' END)
         || array_to_string(toks[idx*{_C4_W}+1 : idx*{_C4_W}+{_C4_W}], ' ')
         || (CASE WHEN doc_id % 17 = 0 AND idx = 0 THEN ' {{' ELSE '' END)
         || (CASE WHEN (doc_id + idx) % 3 != 0 THEN '.' ELSE '' END) AS line
  FROM base
), flagged AS (
  SELECT doc_id, idx, line,
         (line LIKE '%.' AND len(string_split(line, ' ')) >= 5
          AND line NOT LIKE '%javascript%')::INT AS line_ok,
         (line LIKE '%{{%' OR line LIKE '%lorem ipsum%')::INT AS line_poison
  FROM lines
)
SELECT doc_id,
       count(*)::INT AS n_lines,
       sum(line_ok)::INT AS n_kept,
       (max(line_poison) = 0 AND sum(line_ok) >= 3)::INT AS doc_kept,
       coalesce(string_agg(CASE WHEN line_ok = 1 THEN line END, ' ' ORDER BY idx),
                '') AS cleaned_text
FROM flagged GROUP BY doc_id
"""


def q_simhash_hamming_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pair detection over SimHash signatures by Hamming
    distance (Manku, Jain & Das Sarma, WWW'07): split each 32-bit
    signature into 4 x 8-bit bands — any pair within Hamming distance 3
    must agree exactly on at least one band — equi-join on (band index,
    band value), then verify with bit_count(xor) <= 3.

    Scale shape: the band join is the classic sorted-fingerprint-table
    trick as a hash join — candidates are generated by exact band match
    (work = sum over bands of bucket^2, never corpus^2) and the xor
    verification is a per-row integer op. At 10^10 pages the band tables
    shuffle 12 bytes/row; hot bands (common templates) are the skew edge
    and AQE's skew split handles the join side."""
    sims = q_simhash(spark, sf_dir)
    bands = sims.select(
        "doc_id",
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("band_i"),
    ).withColumn("band_v", F.expr("shiftright(simhash, band_i * 8) % 256"))
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_i") == F.col("b.band_i"))
            & (F.col("a.band_v") == F.col("b.band_v"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.expr("cast(bit_count(a.simhash ^ b.simhash) as bigint)").alias(
                "hamming"
            ),
        )
        .filter(F.col("hamming") <= 3)
        .distinct()
    )


SQL_SIMHASH_HAMMING_PAIRS = f"""
WITH toks AS (
  SELECT doc_id, unnest({_SQL_TOKS}) AS tok FROM documents
), tf AS (
  SELECT doc_id, tok, count(*) AS c,
         ('0x' || substr(md5(tok), 1, 8))::BIGINT AS hv
  FROM toks GROUP BY doc_id, tok
), bits AS (
  SELECT doc_id, i,
         sum(CASE WHEN (hv >> i) & 1 = 1 THEN c ELSE -c END) AS s
  FROM tf, (SELECT unnest(range(32)) AS i) ii
  GROUP BY doc_id, i
), sims AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << i) ELSE 0 END) AS BIGINT) AS simhash
  FROM bits GROUP BY doc_id
), bands AS (
  SELECT doc_id, simhash, i AS band_i, (simhash >> (i * 8)) % 256 AS band_v
  FROM sims, (SELECT unnest(range(4)) AS i) bb
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
FROM bands a JOIN bands b
  ON a.band_i = b.band_i AND a.band_v = b.band_v AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
"""


# -- BPE merge training (Sennrich et al. 2016) ------------------------------

_BPE_STEPS = 8


def _bpe_train(
    spark: SparkSession, sf_dir: str
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """Shared BPE trainer: returns (merge records, final segmented
    vocabulary frame with columns seq, freq)."""
    docs = _tokens(_docs_parallel(spark, sf_dir))
    words = (
        docs.select(F.explode("toks").alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("freq"))
        .select(
            F.expr("regexp_replace(tok, '(.)', '$1|')").alias("seq"), "freq"
        )
    )
    seqs = words.localCheckpoint(eager=True)
    out = []
    for step in range(1, _BPE_STEPS + 1):
        pairs = (
            seqs.withColumn(
                "syms", F.expr("filter(split(seq, '\\\\|'), x -> x <> '')")
            )
            .select(
                "freq",
                F.explode(
                    F.expr(
                        "zip_with(slice(syms, 1, size(syms)-1), "
                        "slice(syms, 2, size(syms)-1), "
                        "(x, y) -> concat(x, '|', y))"
                    )
                ).alias("pr"),
            )
            .groupBy("pr")
            .agg(F.sum("freq").alias("c"))
            .orderBy(F.desc("c"), F.asc("pr"))
            .limit(1)
        )
        best = pairs.selectExpr(
            "pr", "replace(pr, '|', '') AS merged", "c"
        ).first()
        out.append((step, best["pr"], best["merged"], int(best["c"])))
        seqs = seqs.select(
            F.expr(
                f"replace(seq, '{best['pr']}|', '{best['merged']}|')"
            ).alias("seq"),
            "freq",
        ).localCheckpoint(eager=True)
    return out, seqs


def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer training (Sennrich, Haddow & Birch 2016): learn the
    first 8 merge rules over the corpus word-frequency table. Words are
    symbol sequences with '|' separators and a trailing '|'; each step
    counts adjacent symbol pairs weighted by word frequency, takes the
    most frequent pair (ties broken lexicographically), and rewrites
    every occurrence left-to-right non-overlapping — exactly what
    replace('a|b|','ab|') on the trailing-separator encoding gives.

    Scale shape: training runs on the AGGREGATED word-frequency table
    (vocabulary-sized, ~10^7 rows for web corpora — never the corpus),
    one groupBy(pair) shuffle per step plus a 1-row argmax to the driver;
    the sequence table is localCheckpoint()ed per step so step k never
    recomputes steps 1..k-1. This is the standard subword-tokenizer
    training loop re-expressed as vocabulary-table relational passes."""
    out, _ = _bpe_train(spark, sf_dir)
    return spark.createDataFrame(
        out, "step int, pair string, merged string, cnt bigint"
    )


def q_bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer APPLICATION: segment every document with the 8
    learned merge rules and report subword statistics per doc — the
    train-then-tokenize composition (the corpus-prep step right before
    sequence packing).

    Scale shape: segmentation is computed once per DISTINCT word (the
    trainer's final vocabulary frame already holds it) and joined back to
    the exploded corpus — per-token work is a broadcast-hash-join probe,
    never a per-token re-segmentation; one groupBy(doc_id) to finish."""
    _, seqs = _bpe_train(spark, sf_dir)
    word_sub = seqs.select(
        F.expr("replace(seq, '|', '')").alias("term"),
        F.expr(
            "cast(size(filter(split(seq, '\\\\|'), x -> x <> '')) as bigint)"
        ).alias("n_sub"),
    )
    toks = _tokens(_read(spark, sf_dir, "documents")).select(
        "doc_id", F.explode("toks").alias("term")
    )
    return (
        toks.join(F.broadcast(word_sub), "term")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum("n_sub").alias("n_subwords"),
            F.round(
                F.sum("n_sub") / F.count("*").cast("double"), 4
            ).alias("subwords_per_word"),
        )
    )


def _bpe_cte_prefix() -> str:
    """Unrolled-CTE oracle prefix: the same 8 argmax+rewrite steps as
    scalar subqueries (the PageRank/HITS fixed-iteration oracle idiom) —
    shared by the bpe_merges and bpe_apply oracles."""
    parts = [
        f"""WITH w AS (
  SELECT tok, count(*) AS freq
  FROM (SELECT unnest({_SQL_TOKS}) AS tok FROM documents) t
  GROUP BY tok
), s0 AS MATERIALIZED (
  SELECT regexp_replace(tok, '(.)', '\\1|', 'g') AS seq, freq FROM w
)"""
    ]
    for k in range(1, _BPE_STEPS + 1):
        parts.append(
            f""", p{k} AS MATERIALIZED (
  SELECT pr, sum(freq) AS c FROM (
    SELECT freq,
           unnest(list_transform(range(1, len(syms)),
                                 i -> syms[i] || '|' || syms[i + 1])) AS pr
    FROM (SELECT freq,
                 list_filter(string_split(seq, '|'), x -> x <> '') AS syms
          FROM s{k - 1}) q
  ) e GROUP BY pr
), b{k} AS MATERIALIZED (
  SELECT pr, replace(pr, '|', '') AS merged, c
  FROM p{k} ORDER BY c DESC, pr ASC LIMIT 1
), s{k} AS MATERIALIZED (
  SELECT replace(seq, (SELECT pr FROM b{k}) || '|',
                 (SELECT merged FROM b{k}) || '|') AS seq, freq
  FROM s{k - 1}
)"""
        )
    return "".join(parts)


SQL_BPE_MERGES = (
    _bpe_cte_prefix()
    + "\n"
    + "\nUNION ALL\n".join(
        f"SELECT {k} AS step, pr AS pair, merged, c AS cnt FROM b{k}"
        for k in range(1, _BPE_STEPS + 1)
    )
)

SQL_BPE_APPLY = (
    _bpe_cte_prefix()
    + f""", word_sub AS (
  SELECT replace(seq, '|', '') AS term,
         len(list_filter(string_split(seq, '|'), x -> x <> ''))::BIGINT AS n_sub
  FROM s{_BPE_STEPS}
), tk AS (SELECT doc_id, unnest({_SQL_TOKS}) AS term FROM documents)
SELECT doc_id, count(*) AS n_words, sum(n_sub)::BIGINT AS n_subwords,
       round(sum(n_sub) / count(*)::DOUBLE, 4) AS subwords_per_word
FROM tk JOIN word_sub USING (term) GROUP BY doc_id
"""
)


def q_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM fluency score with add-one smoothing: train
    p(w2|w1) = (c(w1,w2) + 1) / (c(w1) + V) on the corpus itself, score
    each document by its mean bigram negative log-likelihood — the
    next step up from the unigram CCNet signal (repetitive or shuffled
    word salad scores badly even when its unigrams are common).

    Scale shape: bigram and unigram count tables are vocabulary-sized
    aggregations (map-side partial), the scoring pass is one broadcast
    join of the LM against the corpus bigram stream, one groupBy(doc_id)
    to finish — the same plan the unigram scorer runs, one join wider."""
    toks = _tokens(_read(spark, sf_dir, "documents"))
    big = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "zip_with(slice(toks, 1, size(toks)-1), "
                "slice(toks, 2, size(toks)-1), "
                "(x, y) -> struct(x as w1, y as w2))"
            )
        ).alias("bg"),
    ).select("doc_id", "bg.w1", "bg.w2")
    c2 = big.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    c1 = big.groupBy("w1").agg(F.count("*").alias("c1"))
    v = big.agg(F.countDistinct("w2").alias("vsize"))
    lm = (
        c2.join(c1, "w1")
        .crossJoin(F.broadcast(v))
        .select(
            "w1",
            "w2",
            (
                -F.log(
                    (F.col("c12") + 1).cast("double")
                    / (F.col("c1") + F.col("vsize")).cast("double")
                )
            ).alias("nll_b"),
        )
    )
    return (
        big.join(F.broadcast(lm), ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.avg("nll_b"), 5).alias("mean_nll"),
        )
    )


SQL_BIGRAM_LM_SCORE = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
big AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(toks)),
                               i -> {{'w1': toks[i], 'w2': toks[i + 1]}})) AS bg
  FROM t
), b2 AS (SELECT doc_id, bg.w1 AS w1, bg.w2 AS w2 FROM big),
c2 AS (SELECT w1, w2, count(*) AS c12 FROM b2 GROUP BY w1, w2),
c1 AS (SELECT w1, count(*) AS c1 FROM b2 GROUP BY w1),
v AS (SELECT count(DISTINCT w2) AS vsize FROM b2),
lm AS (
  SELECT w1, w2, -ln((c12 + 1)::DOUBLE / (c1 + vsize)::DOUBLE) AS nll_b
  FROM c2 JOIN c1 USING (w1) CROSS JOIN v
)
SELECT doc_id, count(*) AS n_bigrams, round(avg(nll_b), 5) AS mean_nll
FROM b2 JOIN lm USING (w1, w2) GROUP BY doc_id
"""


# -- k-means over embeddings (3 unrolled Lloyd iterations) -------------------

_KM_K = 8
_KM_ITERS = 3


def _kmeans_state(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """The Lloyd loop shared by kmeans_embed and silhouette_score:
    returns (final assignment frame, final k-row centroid frame).
    Logic is byte-for-byte the loop kmeans_embed always ran — factored,
    not changed — so its oracle parity is untouched."""
    e = _read(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cent = (
        e.filter(F.col("vec_id") < _KM_K)
        .select(
            F.col("vec_id").alias("cid"),
            F.expr(
                "transform(embedding, x -> round(cast(x as double), 6))"
            ).alias("centroid"),
        )
        .localCheckpoint(eager=True)
    )
    assigned = None
    for _ in range(_KM_ITERS):
        d2 = F.expr(_sqdist_expr("embedding", "centroid"))
        w = Window.partitionBy("vec_id").orderBy(F.asc("d2"), F.asc("cid"))
        assigned = (
            e.join(F.broadcast(cent))
            .select("vec_id", "embedding", "cid", d2.alias("d2"))
            .withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") == 1)
        )
        cent = (
            assigned.select("cid", F.posexplode("embedding").alias("pos", "x"))
            .groupBy("cid", "pos")
            .agg(F.round(F.avg(F.col("x").cast("double")), 6).alias("c"))
            .groupBy("cid")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "c"))).alias("pc"))
            .select("cid", F.expr("transform(pc, p -> p.c)").alias("centroid"))
            .localCheckpoint(eager=True)
        )
    return assigned, cent


def q_kmeans_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed k-means (Lloyd) over the embeddings table: k=8 seeds
    taken deterministically from the first vectors by vec_id, 3
    assign/update iterations, squared-L2 with ties to the lower cluster
    id. Centroid components are rounded to 6 dp after every update so
    both engines iterate on IDENTICAL state (summation-order differences
    cannot compound across iterations).

    Scale shape: each iteration is the canonical broadcast-assignment
    plan — k x dim centroids broadcast, one argmin window per vector,
    centroid update via posexplode + map-side partial avg on (cluster,
    pos). The driver holds only the k-row centroid table between
    iterations (localCheckpoint'd); the vectors never leave the
    executors. ann_ivf trains its codebook with exactly this loop on a
    bounded sample; this is the full-corpus variant."""
    assigned, cent = _kmeans_state(spark, sf_dir)
    return (
        assigned.groupBy("cid")
        .agg(
            F.count("*").cast("bigint").alias("n_vectors"),
            F.round(F.sum("d2"), 3).alias("inertia"),
        )
        .join(cent, "cid")
        .select("cid", "n_vectors", "inertia", "centroid")
    )


def _kmeans_sql_prefix() -> str:
    """The unrolled Lloyd-iteration CTE chain (WITH e .. cent{N}) shared
    by the kmeans_embed and silhouette_score oracles."""
    parts = [
        f"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
cent0 AS (
  SELECT vec_id AS cid,
         list_transform(embedding, x -> round(x::DOUBLE, 6)) AS centroid
  FROM e WHERE vec_id < {_KM_K}
)"""
    ]
    for k in range(1, _KM_ITERS + 1):
        parts.append(
            f""", sc{k} AS (
  SELECT e.vec_id, e.embedding, c.cid,
         {_sql_sqdist('e.embedding', 'c.centroid')} AS d2
  FROM e CROSS JOIN cent{k - 1} c
), a{k} AS (
  SELECT vec_id, embedding, cid, d2 FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
                                 ORDER BY d2 ASC, cid ASC) AS rnk
    FROM sc{k}
  ) r WHERE rnk = 1
), cent{k} AS (
  SELECT cid, list(c ORDER BY pos) AS centroid FROM (
    SELECT cid, pos, round(avg(x::DOUBLE), 6) AS c FROM (
      SELECT cid, unnest(embedding) AS x,
             generate_subscripts(embedding, 1) AS pos
      FROM a{k}
    ) q GROUP BY cid, pos
  ) p GROUP BY cid
)"""
        )
    return "".join(parts)


def _kmeans_oracle_sql() -> str:
    last = _KM_ITERS
    return (
        _kmeans_sql_prefix()
        + f"""
SELECT a.cid AS cid, count(*)::BIGINT AS n_vectors,
       round(sum(a.d2), 3) AS inertia, any_value(c.centroid) AS centroid
FROM a{last} a JOIN cent{last} c ON a.cid = c.cid
GROUP BY a.cid"""
    )


SQL_KMEANS_EMBED = _kmeans_oracle_sql()


# -- redirect-chain resolution (pointer jumping) -----------------------------
#
# The corpus has no redirect table, so one is synthesized deterministically
# in-engine (the PII-injection precedent): doc_id > 0 with doc_id % 3 != 0
# redirects to doc_id // 2 — strictly decreasing, so every chain terminates
# at a doc with no outgoing redirect, with depth up to log2(n).


def q_redirect_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTTP redirect-chain resolution (301/308 chains): map every
    redirecting URL to its final landing URL and hop count — the crawl
    frontier wants the terminal URL before dedup/politeness, never the
    intermediate hops.

    Scale shape: pointer jumping (path doubling) — each round substitutes
    f(x) <- f(f(x)) via a self-join on the current mapping, so a chain of
    depth d resolves in O(log d) rounds, not d sequential joins (the same
    reason cc_star beats label propagation on deep chains). Rounds run
    until a driver-checked fixpoint on total hops; each round
    localCheckpoints the O(|redirects|) mapping. At 10^10 URLs every
    round is one hash self-join on the compact (src, dst, hops) table."""
    docs = _read(spark, sf_dir, "documents").select("doc_id")
    cur = (
        docs.filter("doc_id > 0 and doc_id % 3 != 0")
        .select(
            F.col("doc_id").alias("src"),
            F.expr("cast(doc_id / 2 as bigint)").alias("dst"),
            F.lit(1).cast("bigint").alias("hops"),
        )
        .localCheckpoint(eager=True)
    )
    total = cur.agg(F.sum("hops")).first()[0]
    while True:
        nxt = (
            cur.alias("a")
            .join(
                cur.select(
                    F.col("src").alias("b_src"),
                    F.col("dst").alias("b_dst"),
                    F.col("hops").alias("b_hops"),
                ),
                F.col("a.dst") == F.col("b_src"),
                "left",
            )
            .select(
                F.col("a.src").alias("src"),
                F.coalesce("b_dst", "a.dst").alias("dst"),
                (F.col("a.hops") + F.coalesce("b_hops", F.lit(0))).alias("hops"),
            )
            .localCheckpoint(eager=True)
        )
        new_total = nxt.agg(F.sum("hops")).first()[0]
        cur = nxt
        if new_total == total:
            break
        total = new_total
    return cur.select("src", F.col("dst").alias("final_dst"), "hops")


SQL_REDIRECT_RESOLVE = """
WITH RECURSIVE redirects AS (
  SELECT doc_id AS src, CAST(doc_id // 2 AS BIGINT) AS dst
  FROM documents WHERE doc_id > 0 AND doc_id % 3 != 0
), walk AS (
  SELECT src, dst, 1::BIGINT AS hops FROM redirects
  UNION ALL
  SELECT w.src, r.dst, w.hops + 1
  FROM walk w JOIN redirects r ON w.dst = r.src
)
SELECT src, dst AS final_dst, hops
FROM (
  SELECT *, row_number() OVER (PARTITION BY src ORDER BY hops DESC) AS rnk
  FROM walk
) t WHERE rnk = 1
"""


# -- cross-document token packing (concat-then-split pretraining batches) ----

_PACK_BIN = 2048
_PACK_BUCKETS = 16


def q_pack_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle + cross-document token packing: order
    the corpus by a content-stable hash (the reproducible pretraining
    shuffle), concatenate token counts in that order, and split the
    stream into fixed {_PACK_BIN}-token bins — each doc gets its stream
    start offset, bin id, and offset within the bin (docs may straddle
    bins, exactly like concat-then-split batch packing does).

    Scale shape: the running total is a TWO-PHASE distributed cumsum, not
    a single-task global-sort window — the hash key's value range is
    known ([0, 2^32)), so range buckets need no sampling pass: a
    per-bucket window cumsum runs wide, per-bucket totals (an O(buckets)
    driver collect) become broadcast prefix offsets (the
    dense_first_seen_ids pattern from the crawl engine). At 10^10 docs
    every stage is parallel and the driver holds only bucket totals."""
    docs = _tokens(_read(spark, sf_dir, "documents")).select(
        "doc_id",
        F.expr("cast(size(toks) as bigint)").alias("n_toks"),
        F.expr(
            "cast(conv(substring(md5(cast(doc_id as string)), 1, 8), 16, 10) as bigint)"
        ).alias("hkey"),
    )
    bkt = F.least(
        F.lit(_PACK_BUCKETS - 1),
        ((F.col("hkey") * _PACK_BUCKETS) / F.lit(1 << 32)).cast("int"),
    )
    part = (
        docs.withColumn("_bkt", bkt)
        .repartition(_PACK_BUCKETS, "_bkt")
        .localCheckpoint(eager=True)
    )
    w = (
        Window.partitionBy("_bkt")
        .orderBy("hkey", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = part.withColumn("local_end", F.sum("n_toks").over(w))
    totals = {
        r["_bkt"]: r["t"]
        for r in part.groupBy("_bkt").agg(F.sum("n_toks").alias("t")).collect()
    }
    offs, acc = [], 0
    for b in range(_PACK_BUCKETS):
        offs.append((b, acc))
        acc += totals.get(b, 0)
    off_df = spark.createDataFrame(offs, "_bkt int, prefix bigint")
    return (
        local.join(F.broadcast(off_df), "_bkt")
        .select(
            "doc_id",
            "n_toks",
            (F.col("prefix") + F.col("local_end") - F.col("n_toks")).alias(
                "start_offset"
            ),
        )
        .withColumn("bin", F.expr(f"cast(floor(start_offset / {_PACK_BIN}) as bigint)"))
        .withColumn("offset_in_bin", F.expr(f"start_offset % {_PACK_BIN}"))
    )


SQL_PACK_BINS = f"""
WITH d AS (
  SELECT doc_id, len({_SQL_TOKS})::BIGINT AS n_toks,
         ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT AS hkey
  FROM documents
)
SELECT doc_id, n_toks,
       (sum(n_toks) OVER (ORDER BY hkey, doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        - n_toks)::BIGINT AS start_offset,
       CAST(floor(((sum(n_toks) OVER (ORDER BY hkey, doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
                   - n_toks) / {_PACK_BIN}) AS BIGINT) AS bin,
       ((sum(n_toks) OVER (ORDER BY hkey, doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        - n_toks) % {_PACK_BIN} AS offset_in_bin
FROM d
"""


# -- quality-classifier training (hashed features, integer-exact SGD) --------

_QC_B = 64
_QC_EPOCHS = 8
_QC_LR_K = 4  # divisor = n_docs * K: scale-invariant integer step


def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a linear quality classifier on hashed bag-of-words features
    (the fastText/CCNet-style quality-gate model): label = doc contains
    the token 'spark', features = md5-hashed unigram counts in {_QC_B}
    buckets (binary presence), 8 full-batch epochs with a hard-sigmoid
    link. EVERYTHING is integer arithmetic in micro-units — score =
    sum(x_b x weight_micro), p = clamp(500000 + score, 0, 10^6), gradient
    = sum(y_micro - p), update = w + floor(gradient / (4N)) — both engines compute
    bit-identical state with NO transcendentals and NO float-summation
    order sensitivity (the lesson of the kmeans/dsir rounding idioms,
    taken to its exact-integer conclusion).

    Scale shape: per-epoch cost is one broadcast join of the {_QC_B}-row
    weight table against the doc-bucket count table, one groupBy(doc)
    partial-agg, one groupBy(bucket) gradient agg — the distributed
    full-batch GD plan; the weight state between epochs is {_QC_B} rows."""
    toks = (
        _tokens(_read(spark, sf_dir, "documents"))
        .filter(F.expr("size(toks) > 0"))
        .select(
            "doc_id",
            F.expr(
                "cast(array_contains(toks, 'spark') as bigint) * 1000000"
            ).alias("y_micro"),
            F.explode("toks").alias("term"),
        )
    )
    doc_bucket = (
        toks.withColumn(
            "b",
            F.expr("cast(conv(substring(md5(term), 1, 4), 16, 10) as bigint)")
            % _QC_B,
        )
        .groupBy("doc_id", "y_micro", "b")
        .agg(F.lit(1).cast("bigint").alias("c"))  # binary presence feature
        .localCheckpoint(eager=True)
    )
    n_docs = doc_bucket.select("doc_id").distinct().count()
    divisor = float(n_docs * _QC_LR_K)
    w_df = (
        doc_bucket.select("b")
        .distinct()
        .withColumn("w_micro", F.lit(0).cast("bigint"))
        .localCheckpoint(eager=True)
    )
    for _ in range(_QC_EPOCHS):
        scored = (
            doc_bucket.join(F.broadcast(w_df), "b")
            .groupBy("doc_id", "y_micro")
            .agg(F.sum(F.col("c") * F.col("w_micro")).alias("s"))
            .withColumn(
                "p", F.expr("greatest(0L, least(1000000L, 500000 + s))")
            )
            .select("doc_id", (F.col("y_micro") - F.col("p")).alias("e"))
        )
        grad = (
            doc_bucket.join(scored, "doc_id")
            .groupBy("b")
            .agg(F.sum(F.col("e") * F.col("c")).alias("g"))
        )
        w_df = (
            w_df.join(grad, "b", "left")
            .select(
                "b",
                (
                    F.col("w_micro")
                    + F.expr(
                        f"cast(floor(coalesce(g, 0L) / {divisor}) as bigint)"
                    )
                ).alias("w_micro"),
            )
            .localCheckpoint(eager=True)
        )
    return w_df.select("b", "w_micro")


def _qc_oracle_sql() -> str:
    parts = [
        f"""WITH tk AS MATERIALIZED (
  SELECT doc_id,
         (list_contains(toks, 'spark'))::BIGINT * 1000000 AS y_micro,
         unnest(toks) AS term
  FROM (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents) q
  WHERE len(toks) > 0
), db AS MATERIALIZED (
  SELECT doc_id, y_micro,
         ('0x' || substr(md5(term), 1, 4))::BIGINT % {_QC_B} AS b,
         1::BIGINT AS c
  FROM tk GROUP BY doc_id, y_micro, b
), w0 AS MATERIALIZED (
  SELECT DISTINCT b, 0::BIGINT AS w_micro FROM db
), nn AS MATERIALIZED (
  SELECT count(DISTINCT doc_id)::DOUBLE * {_QC_LR_K} AS divisor FROM db
)"""
    ]
    for k in range(1, _QC_EPOCHS + 1):
        parts.append(
            f""", sc{k} AS MATERIALIZED (
  SELECT doc_id, y_micro - greatest(0, least(1000000, 500000 + s)) AS e
  FROM (
    SELECT db.doc_id, any_value(db.y_micro) AS y_micro,
           sum(db.c * w.w_micro) AS s
    FROM db JOIN w{k - 1} w USING (b) GROUP BY db.doc_id
  ) q
), w{k} AS MATERIALIZED (
  SELECT w.b,
         (w.w_micro + CAST(floor(coalesce(g.g, 0) / (SELECT divisor FROM nn))
                           AS BIGINT)) AS w_micro
  FROM w{k - 1} w LEFT JOIN (
    SELECT db.b, sum(sc{k}.e * db.c) AS g
    FROM db JOIN sc{k} USING (doc_id) GROUP BY db.b
  ) g USING (b)
)"""
        )
    parts.append(f"\nSELECT b, w_micro FROM w{_QC_EPOCHS}")
    return "".join(parts)


SQL_QUALITY_CLASSIFIER = _qc_oracle_sql()


# ---------------------------------------------------------------------------
# 7. Spark-only entries (no SQL oracle -> driver's rows-only check)
# ---------------------------------------------------------------------------


def q_crawl_wave_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship non-SQL op: the iterative focused crawl itself on a
    deterministic synthetic site (budget=1 oracle mode). Returns the
    dispatch order — the reference's own end-to-end semantic
    (TestEvaluatePriorityMatrix.scala:36-148). Not SQL-expressible: the
    crawl is a feedback-driven iterative job."""
    import tempfile

    from webcrawler_spark.config import CrawlConfig
    from webcrawler_spark.plans.crawler import SparkCrawler
    from webcrawler_spark.sources.synth import SiteSpec, gen_pages, page_url

    spec = SiteSpec(n_pages=40, n_hosts=3, seed=7, hot_host_frac=0.34, private_frac=0.0)
    pages = gen_pages(spec)
    pages_df = spark.createDataFrame(
        [(p["url"], p["html"]) for p in pages], "url string, html binary"
    )
    cfg = CrawlConfig(
        seeds=(pages[0]["url"], pages[1]["url"]),
        limit=10,
        targets=3,
        targeting=0.0,
        allhosts=True,
        budget=1,
    )
    with tempfile.TemporaryDirectory() as td:
        crawler = SparkCrawler(spark, cfg, pages_df, td, checkpoint_every=1000)
        res = crawler.run()
    rows = [(i, u) for i, u in enumerate(res.dispatched)]
    return spark.createDataFrame(rows, "ord int, url string")


def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN, FAISS-style: train coarse centroids by k-means on a bounded
    deterministic sample (driver-side numpy — at 100 TB you train on a
    ~256k-vector sample, never the full corpus), broadcast the k×d centroid
    matrix, assign every vector to its nearest cell in ONE vectorized
    pandas-UDF pass (numpy matmul per Arrow batch), then probe only the
    nprobe cells nearest the query — search cost ≈ nprobe/ncells of brute
    force. k=16/nprobe=6 gives recall@20 ≈ 0.85 scanning ~36% on the synth
    embeddings (pinned by tests/test_ann.py). Rows-only driver check:
    k-means training is iterative, not SQL-expressible."""
    import numpy as np

    NCELLS, NPROBE, SAMPLE, ITERS = 16, 6, 4096, 15
    e = _read(spark, sf_dir, "embeddings")
    # train on a deterministic bounded sample (TakeOrdered — no global sort)
    samp = np.array(
        [r[0] for r in e.select("embedding").orderBy("vec_id").limit(SAMPLE).collect()],
        dtype=np.float64,
    )
    cents = samp[np.linspace(0, len(samp) - 1, NCELLS).astype(int)].copy()
    for _ in range(ITERS):
        d2 = -2.0 * samp @ cents.T + (cents * cents).sum(1)
        assign = d2.argmin(1)
        for j in range(NCELLS):
            members = samp[assign == j]
            if len(members):
                cents[j] = members.mean(0)
    cents_b = spark.sparkContext.broadcast(cents)

    @F.pandas_udf("int")
    def cell_of(emb: pd.Series) -> pd.Series:
        cmat = cents_b.value
        mat = np.array(emb.tolist(), dtype=np.float64)
        dist = -2.0 * mat @ cmat.T + (cmat * cmat).sum(1)
        return pd.Series(dist.argmin(1))

    refv = np.array(
        e.filter(F.col("vec_id") == 0).select("embedding").first()[0], dtype=np.float64
    )
    qd = -2.0 * refv @ cents.T + (cents * cents).sum(1)
    probe_cells = [int(c) for c in np.argsort(qd)[:NPROBE]]

    ref = (
        e.filter(F.col("vec_id") == 0)
        .select(F.col("embedding").alias("ref"))
        .withColumn("nr", F.sqrt(F.expr(_dot_expr("ref", "ref"))))
    )
    dot = F.expr(_dot_expr("embedding", "ref"))
    na = F.sqrt(F.expr(_dot_expr("embedding", "embedding")))
    return (
        e.withColumn("cell", cell_of("embedding"))
        .filter(F.col("cell").isin(probe_cells))
        .filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(ref))
        .select(
            "vec_id", "label", F.round(dot / (na * F.col("nr")), 4).alias("cos")
        )
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(20)
    )


def q_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (Jegou et al. 2011; FAISS PQ): split the
    64-dim embedding into M=8 subspaces, train a K=16-code codebook per
    subspace by k-means on a bounded deterministic sample (driver-side
    numpy — same trainer discipline as q_ann_ivf), encode every vector to
    M uint8 codes in ONE vectorized pandas-UDF pass, and answer queries
    by asymmetric distance (ADC): a broadcast M x K lookup table of
    query-to-code squared distances, summed per vector with numpy takes —
    no float recompute against the corpus. The ADC top-100 is then
    reranked with exact cosine and the true top-20 returned.

    Why it exists at 100 TB: PQ codes are M bytes/vector vs 4d — 10^11
    vectors fit in cluster RAM at 8 B each where raw floats (256 B)
    cannot; the scan is byte-gathers instead of FLOPs. Recall@20 after
    exact rerank is pinned by tests/test_ann.py. Rows-only driver check:
    k-means training is iterative, not SQL-expressible."""
    import numpy as np

    M, K, SAMPLE, ITERS, RERANK = 8, 16, 4096, 10, 100
    e = _read(spark, sf_dir, "embeddings")
    samp = np.array(
        [r[0] for r in e.select("embedding").orderBy("vec_id").limit(SAMPLE).collect()],
        dtype=np.float64,
    )
    d = samp.shape[1]
    sub = d // M
    books = []
    for m in range(M):
        s = samp[:, m * sub : (m + 1) * sub]
        cb = s[np.linspace(0, len(s) - 1, K).astype(int)].copy()
        for _ in range(ITERS):
            d2 = -2.0 * s @ cb.T + (cb * cb).sum(1)
            assign = d2.argmin(1)
            for j in range(K):
                members = s[assign == j]
                if len(members):
                    cb[j] = members.mean(0)
        books.append(cb)
    books_b = spark.sparkContext.broadcast(np.stack(books))  # M x K x sub

    refv = np.array(
        e.filter(F.col("vec_id") == 0).select("embedding").first()[0],
        dtype=np.float64,
    )
    # ADC lookup table: lut[m][k] = ||q_m - c_mk||^2 (driver-side, M*K floats)
    lut = np.stack(
        [
            ((refv[m * sub : (m + 1) * sub] - books[m]) ** 2).sum(1)
            for m in range(M)
        ]
    )
    lut_b = spark.sparkContext.broadcast(lut)

    @F.pandas_udf("double")
    def adc(emb: pd.Series) -> pd.Series:
        bks, table = books_b.value, lut_b.value
        mat = np.array(emb.tolist(), dtype=np.float64)
        total = np.zeros(len(mat))
        for m in range(bks.shape[0]):
            s = mat[:, m * sub : (m + 1) * sub]
            codes = (-2.0 * s @ bks[m].T + (bks[m] * bks[m]).sum(1)).argmin(1)
            total += table[m][codes]
        return pd.Series(total)

    cand = (
        e.filter(F.col("vec_id") != 0)
        .withColumn("adc_d2", adc("embedding"))
        .orderBy(F.asc("adc_d2"), F.asc("vec_id"))
        .limit(RERANK)
    )
    ref = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("ref"))
    dot = F.expr(_dot_expr("embedding", "ref"))
    na = F.sqrt(F.expr(_dot_expr("embedding", "embedding")))
    nr = F.sqrt(F.expr(_dot_expr("ref", "ref")))
    return (
        cand.crossJoin(F.broadcast(ref))
        .select("vec_id", "label", F.round(dot / (na * nr), 4).alias("cos"))
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(20)
    )


_HB_BUDGET = 40  # lifetime per-host admission budget for the stream


def q_host_budget_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator driven end-to-end: events become
    a link stream (3 deterministic micro-batches via maxFilesPerTrigger),
    applyInPandasWithState enforces a lifetime per-host budget ACROSS
    batches (O(hosts) state), and the result folds to per-host admission
    counts. The oracle checks the operator's cross-batch invariant —
    admitted(host) == least(n_links(host), budget) — which batch
    boundaries cannot change; the within-batch selection itself is pinned
    by tests/test_streaming.py."""
    import tempfile

    from webcrawler_spark.streaming.waves import host_budget_stream

    ev = _read(spark, sf_dir, "events")
    links = ev.select(
        F.concat(
            F.lit("http://h"),
            F.col("user_id"),
            F.lit(".com/p"),
            F.col("event_id"),
        ).alias("url"),
        F.concat(F.lit("h"), F.col("user_id")).alias("host"),
        F.col("value").alias("priority"),
        (F.col("event_id") % 3).alias("_b"),
    )
    workdir = tempfile.mkdtemp(prefix="hbstream_")
    in_dir = f"{workdir}/in"
    # one file per batch id => 3 micro-batches under maxFilesPerTrigger=1
    links.repartition(1).write.partitionBy("_b").parquet(in_dir)

    stream_in = (
        spark.readStream.schema("url string, host string, priority double")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{in_dir}/_b=*")
    )
    admitted = host_budget_stream(stream_in, max_per_host=_HB_BUDGET)
    # unique sink name: the workdir suffix — a second run in the same
    # session must not collide with the first run's memory table
    qname = "host_budget_admitted_" + workdir.rsplit("_", 1)[-1]
    q = (
        admitted.writeStream.format("memory")
        .queryName(qname)
        .option("checkpointLocation", f"{workdir}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.table(qname)
        .groupBy("host")
        .agg(F.count("*").alias("n_admitted"))
    )


SQL_HOST_BUDGET_STREAM = f"""
SELECT 'h' || user_id AS host,
       least(count(*), {_HB_BUDGET}) AS n_admitted
FROM events GROUP BY user_id
"""


# late_window_stream: deterministic (batch, slot) -> minute-offset layout.
# Tumbling 1h windows, watermark delay 2h. Batch maxima: b0 -> 210 min,
# b1 -> 330 min, so the watermark in force while PROCESSING batch b is
# wm(1) = 210-120 = 90 and wm(2) = 330-120 = 210 (wm(0) = -inf); final
# watermark after all data = 450-120 = 330.
#
# Version-proof late-drop design: Spark documents "drop if window end <=
# current watermark", but (measured, Spark 4.1) a late row whose window
# STATE is still live merges anyway — state eviction at the end of batch
# b uses wm(b), so the effective drop rule is "window end <= wm(b-1)".
# Every late row below is either kept under BOTH rules (end > wm(b)) or
# dropped under BOTH (end <= wm(b-1)), and every window boundary is
# >= 30 min away from every watermark value — no engine tie-breaking.
_LW_OFF = {
    0: (30, 90, 150, 210),  # all on-time (no watermark yet)
    1: (270, 330, 90, 150),  # 90 -> end 120 > wm 90: kept (old window, still live)
    2: (390, 450, 30, 270),  # 30 -> end 60 <= wm(b1)=90: DROPPED under both rules
}
_LW_DELAY_MIN = 120
_LW_FINAL_WM = 330
_LW_BASE = "2026-01-01 00:00:00"


def q_late_window_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked windowed aggregation driven end-to-end through
    Structured Streaming with engineered late data: events are laid out
    on a deterministic (micro-batch, slot) -> event-time grid, streamed
    as 3 file-batches (maxFilesPerTrigger=1), aggregated into 1h tumbling
    windows under a 2h watermark in append mode.

    The oracle replays the exact streaming contract in closed form: a row
    is dropped iff its window end <= the watermark in force when its
    batch is processed (cummax of prior batch event-time maxima minus the
    delay), and a window is emitted iff its end <= the final watermark.
    The grid keeps every boundary >=30 min clear of every watermark, so
    the kept/dropped/emitted sets are engine-version-proof."""
    import tempfile

    ev = _read(spark, sf_dir, "events").select(
        "event_id",
        "value",
        (F.col("event_id") % 3).alias("_b"),
        F.expr("(event_id div 3) % 4").alias("slot"),
    )
    off = F.lit(None).cast("int")
    for b, offs in _LW_OFF.items():
        for s, o in enumerate(offs):
            off = F.when((F.col("_b") == b) & (F.col("slot") == s), o).otherwise(off)
    rows = ev.withColumn("off_min", off).select(
        "event_id",
        "value",
        "_b",
        (
            F.unix_timestamp(F.lit(_LW_BASE).cast("timestamp"))
            + F.col("off_min") * 60
        )
        .cast("timestamp")
        .alias("ts"),
    )

    workdir = tempfile.mkdtemp(prefix="lwstream_")
    in_dir = f"{workdir}/in"
    rows.repartition(1).write.partitionBy("_b").parquet(in_dir)

    stream_in = (
        spark.readStream.schema("event_id long, value double, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{in_dir}/_b=*")
    )
    agg = (
        stream_in.withWatermark("ts", f"{_LW_DELAY_MIN} minutes")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("val_sum"))
        .select(
            F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "win_start"
            ),
            "n",
            "val_sum",
        )
    )
    qname = "late_window_" + workdir.rsplit("_", 1)[-1]
    q = (
        agg.writeStream.format("memory")
        .queryName(qname)
        .outputMode("append")
        .option("checkpointLocation", f"{workdir}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(qname)


_SJ_BASE = "2026-02-01 00:00:00"
_SJ_DELAYS = (5, 25, 90)  # minutes; join bound is 30 -> k%3==2 never matches
_SJ_BOUND_MIN = 30


def q_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream inner join (impression->click attribution)
    driven end-to-end through Structured Streaming: events split into an
    impression stream (even event_id, micro-batch 1) and a click stream
    (odd event_id, micro-batches 2-3), joined on key with the time-range
    condition click.ts in [imp.ts, imp.ts + 30 min]. Click delays are
    engineered at 5/25/90 min by key%3, so exactly the k%3 != 2 pairs
    match — and impressions must be HELD AS STATE across micro-batch
    boundaries to meet their clicks (the cross-batch state the operator
    exists for). Watermarks (3h both sides) bound that state; the 90-min
    misses age out of it. The oracle replays the join in closed form —
    inner stream-stream joins emit on match, so the result set equals the
    batch join under the same predicate."""
    import tempfile

    ev = _read(spark, sf_dir, "events").select(
        F.expr("event_id div 2").alias("k"),
        (F.col("event_id") % 2).alias("side"),
    )
    base = F.unix_timestamp(F.lit(_SJ_BASE).cast("timestamp"))
    imp = (
        ev.filter(F.col("side") == 0)
        .select(
            "k",
            (base + (F.col("k") % 97) * 420).cast("timestamp").alias("imp_ts"),
            F.lit(0).alias("_b"),
        )
    )
    delay = (
        F.when(F.col("k") % 3 == 0, _SJ_DELAYS[0])
        .when(F.col("k") % 3 == 1, _SJ_DELAYS[1])
        .otherwise(_SJ_DELAYS[2])
    )
    clk = (
        ev.filter(F.col("side") == 1)
        .select(
            "k",
            (base + (F.col("k") % 97) * 420 + delay * 60)
            .cast("timestamp")
            .alias("click_ts"),
            (F.lit(1) + (F.col("k") % 2)).alias("_b"),
        )
    )

    workdir = tempfile.mkdtemp(prefix="sjstream_")
    imp.repartition(1).write.partitionBy("_b").parquet(f"{workdir}/imp")
    clk.repartition(1).write.partitionBy("_b").parquet(f"{workdir}/clk")

    s_imp = (
        spark.readStream.schema("k long, imp_ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{workdir}/imp/_b=*")
        .withWatermark("imp_ts", "3 hours")
    )
    s_clk = (
        spark.readStream.schema("k long, click_ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{workdir}/clk/_b=*")
        .withWatermark("click_ts", "3 hours")
    )
    joined = s_imp.join(
        s_clk,
        (s_imp.k == s_clk.k)
        & (s_clk.click_ts >= s_imp.imp_ts)
        & (
            s_clk.click_ts
            <= s_imp.imp_ts + F.expr(f"interval {_SJ_BOUND_MIN} minutes")
        ),
        "inner",
    ).select(
        s_imp.k.alias("k"),
        F.date_format("imp_ts", "yyyy-MM-dd HH:mm:ss").alias("imp_at"),
        F.date_format("click_ts", "yyyy-MM-dd HH:mm:ss").alias("click_at"),
        (
            (F.unix_timestamp("click_ts") - F.unix_timestamp("imp_ts")) / 60
        ).cast("int").alias("delay_min"),
    )
    qname = "stream_join_" + workdir.rsplit("_", 1)[-1]
    q = (
        joined.writeStream.format("memory")
        .queryName(qname)
        .outputMode("append")
        .option("checkpointLocation", f"{workdir}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(qname)


SQL_STREAM_JOIN = f"""
WITH ev AS (
  SELECT event_id // 2 AS k, event_id % 2 AS side FROM events
),
imp AS (
  SELECT k, TIMESTAMP '{_SJ_BASE}' + to_seconds((k % 97) * 420) AS imp_ts
  FROM ev WHERE side = 0
),
clk AS (
  SELECT k, TIMESTAMP '{_SJ_BASE}' + to_seconds(
           (k % 97) * 420
           + (CASE WHEN k % 3 = 0 THEN {_SJ_DELAYS[0]}
                   WHEN k % 3 = 1 THEN {_SJ_DELAYS[1]}
                   ELSE {_SJ_DELAYS[2]} END) * 60) AS click_ts
  FROM ev WHERE side = 1
)
SELECT i.k AS k,
       strftime(i.imp_ts, '%Y-%m-%d %H:%M:%S') AS imp_at,
       strftime(c.click_ts, '%Y-%m-%d %H:%M:%S') AS click_at,
       CAST(date_diff('minute', i.imp_ts, c.click_ts) AS INT) AS delay_min
FROM imp i JOIN clk c
  ON i.k = c.k
 AND c.click_ts >= i.imp_ts
 AND c.click_ts <= i.imp_ts + INTERVAL {_SJ_BOUND_MIN} MINUTE
"""


def _lw_sql_off() -> str:
    cases = []
    for b, offs in _LW_OFF.items():
        for s, o in enumerate(offs):
            cases.append(f"WHEN b = {b} AND slot = {s} THEN {o}")
    return "CASE " + " ".join(cases) + " END"


SQL_LATE_WINDOW_STREAM = f"""
WITH laid AS (
  SELECT event_id, value,
         event_id % 3 AS b,
         (event_id // 3) % 4 AS slot
  FROM events
),
rows_ AS (
  SELECT event_id, value, b,
         {_lw_sql_off()} AS off_min
  FROM laid
),
-- drop boundary per batch: rows whose window end <= this are dropped
-- (the layout makes the documented current-wm rule and the measured
-- evicted-state rule agree — see _LW_OFF comment)
kept AS (
  SELECT *,
         (off_min // 60) * 60 + 60 AS win_end_min,
         CASE b WHEN 2 THEN 90 ELSE NULL END AS drop_below
  FROM rows_
)
SELECT strftime(TIMESTAMP '{_LW_BASE}'
                + to_minutes((win_end_min - 60)::BIGINT), '%Y-%m-%d %H:%M:%S')
         AS win_start,
       count(*) AS n,
       round(sum(value), 4) AS val_sum
FROM kept
WHERE (drop_below IS NULL OR win_end_min > drop_below)  -- late-drop rule
  AND win_end_min <= {_LW_FINAL_WM}                      -- append-mode emission
GROUP BY win_end_min
"""


def q_tune_vocabulary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L1-L4 — perceptron word-weight learning over a document graph
    (TuneVocabulary.scala:12-108). Iterative driver loop over distributed
    epoch aggregations — not SQL-expressible (rows-only check)."""
    from webcrawler_spark.plans.tune import tune_vocabulary

    docs = _tokens(_read(spark, sf_dir, "documents")).filter(F.col("doc_id") < 40)
    vectors = docs.select(
        F.col("doc_id").alias("id"), F.array_distinct("toks").alias("words")
    )
    # deterministic edge list: each doc links to the next doc of its source
    w = Window.partitionBy("source").orderBy("doc_id")
    edges = (
        docs.select("doc_id", "source")
        .withColumn("nxt", F.lead("doc_id").over(w))
        .filter(F.col("nxt").isNotNull())
        .select(F.col("doc_id").alias("src"), F.col("nxt").alias("dst"))
    )
    net, _errs = tune_vocabulary(vectors, edges, epochs=3, seed=42)
    rows = sorted(net.items(), key=lambda kv: (-kv[1], kv[0]))
    return (
        spark.createDataFrame(rows, "word string, weight double")
        if rows
        else spark.createDataFrame([], "word string, weight double")
    )


def q_sampler_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9 — link-context sampler pivot (SampleHierarchy2Priority.scala:
    58-106): rows ordered by priority, columns = features with global
    count > threshold. Dynamic pivot columns -> rows-only check."""
    from webcrawler_spark.plans.tune import sampler_pivot

    docs = _tokens(_read(spark, sf_dir, "documents")).filter(F.col("doc_id") < 100)
    linkctx = docs.select(
        F.col("doc_id").cast("string").alias("link"),
        F.explode("toks").alias("feature"),
    ).withColumn("weight", F.lit(1.0))
    prios = docs.select(
        F.col("doc_id").cast("string").alias("link"),
        F.col("n_chars").cast("double").alias("priority"),
    )
    return sampler_pivot(linkctx, prios, min_count=10)


def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal decode with a REAL binary-container parser: each doc
    gets an authentic image header (even doc_id → PNG signature + IHDR +
    CRC; odd → JPEG SOI/APP0/SOF0) whose dimensions derive in closed form
    from (length(text), doc_id) — so the Arrow-batched decode pass must
    genuinely parse the PNG/JPEG structure it is handed, while DuckDB
    checks the full round trip from the same closed form. A production
    deployment swaps kernels.media.parse_image for PIL/ffmpeg behind the
    identical (bytes) -> metadata contract."""
    import pandas as pd
    from pyspark.sql import types as T

    from webcrawler_spark.kernels.media import make_jpeg, make_png, parse_image

    docs = _read(spark, sf_dir, "documents").select(
        "doc_id", F.length("text").alias("n_chars")
    )

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("n_bytes", T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("format", T.StringType()),
        ]
    )

    def decode(batches):
        for pdf in batches:
            rows = []
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                w = int(n_chars) % 640 + 1
                h = (int(doc_id) * 7) % 480 + 1
                blob = make_png(w, h) if doc_id % 2 == 0 else make_jpeg(w, h)
                meta = parse_image(blob)  # the real structural parse
                fmt, pw, ph = meta if meta else (None, None, None)
                rows.append((int(doc_id), len(blob), pw, ph, fmt))
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_bytes", "width", "height", "format"]
            )

    return docs.mapInPandas(decode, out_schema)


def q_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal feature-extract + resize: build a deterministic RGB
    gradient bitmap per document (numpy), nearest-neighbor-resize it to a
    16x16 thumbnail with vectorized index arithmetic (the real batch
    image path — at 100 TB this exact mapInPandas shape wraps
    PIL.Image.resize), and report per-channel thumbnail means. The
    oracle replays the NN sampling lattice in closed form — the resize
    indices and pixel function are the contract."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    docs = _read(spark, sf_dir, "documents").select(
        "doc_id", F.length("text").alias("n_chars")
    )
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("w", T.IntegerType()),
            T.StructField("h", T.IntegerType()),
            # exact integer pixel sums: a k/256 thumbnail mean can land
            # exactly on a 4-dp rounding half, where Python (banker's)
            # and Spark/DuckDB (half-up) disagree
            T.StructField("r_sum", T.LongType()),
            T.StructField("g_sum", T.LongType()),
        ]
    )

    def resize(batches):
        for pdf in batches:
            rows = []
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                d, w, h = int(doc_id), int(n_chars) % 640 + 8, (int(doc_id) * 7) % 480 + 8
                x = np.arange(w)[None, :]
                y = np.arange(h)[:, None]
                r = (x * 3 + y * 5 + d) % 256  # full h x w bitmaps
                g = (x * 7 + y * 11 + d * 13) % 256
                xi = (np.arange(16) * w) // 16  # NN sample lattice
                yj = (np.arange(16) * h) // 16
                thumb_r = r[np.ix_(yj, xi)]
                thumb_g = g[np.ix_(yj, xi)]
                rows.append(
                    (d, w, h, int(thumb_r.sum()), int(thumb_g.sum()))
                )
            yield pd.DataFrame(rows, columns=["doc_id", "w", "h", "r_sum", "g_sum"])

    return docs.mapInPandas(resize, out_schema)


SQL_IMAGE_RESIZE = """
WITH d AS (
  SELECT doc_id,
         (length(text) % 640 + 8)::INTEGER AS w,
         ((doc_id * 7) % 480 + 8)::INTEGER AS h
  FROM documents)
SELECT doc_id, w, h,
  list_sum(flatten(list_transform(range(0, 16), j ->
        list_transform(range(0, 16), i ->
          (((i * w) // 16) * 3 + ((j * h) // 16) * 5 + doc_id) % 256)))) AS r_sum,
  list_sum(flatten(list_transform(range(0, 16), j ->
        list_transform(range(0, 16), i ->
          (((i * w) // 16) * 7 + ((j * h) // 16) * 11 + doc_id * 13) % 256)))) AS g_sum
FROM d
"""


SQL_MULTIMODAL_DECODE = """
SELECT doc_id,
       CASE WHEN doc_id % 2 = 0 THEN 33 ELSE 39 END AS n_bytes,
       CAST(length(text) % 640 + 1 AS INTEGER) AS width,
       CAST((doc_id * 7) % 480 + 1 AS INTEGER) AS height,
       CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS format
FROM documents
"""


#: random-hyperplane signature width / Hamming radius for ann_hamming.
#: 192 planes at radius 88 give recall@20 = 0.9-0.95 vs brute force while
#: scanning ~25% of the corpus on the synth embeddings (both SFs measured;
#: pinned by tests/test_ann.py::test_ann_hamming_recall_and_pruning).
ANN_HAM_PLANES, ANN_HAM_RADIUS, ANN_HAM_DIM = 192, 88, 64


def _hamming_planes() -> "object":
    """Deterministic pseudo-random hyperplanes: weight(p, i) derives from
    md5(f"{p}:{i}") exactly as the oracle CTE derives it in-engine, so both
    sides hash from the same plane matrix with zero shipped constants."""
    import hashlib

    import numpy as np

    return np.array(
        [
            [
                (int(hashlib.md5(f"{p}:{i}".encode()).hexdigest()[:8], 16) % 2001 - 1000)
                / 1000.0
                for i in range(ANN_HAM_DIM)
            ]
            for p in range(ANN_HAM_PLANES)
        ]
    )


def q_ann_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-signature ANN — the second scale path next to IVF (q_ann_ivf):
    a 192-bit random-hyperplane signature per vector (sign of plane dots,
    the SimHash/LSH family), a cheap Hamming-distance prefilter against the
    query signature, then exact cosine rerank of the survivors. At 100 TB
    the signature is computed once map-side in a single Arrow-vectorized
    pass (numpy matmul per batch — no per-row Python), the prefilter
    compares 24 bytes/vector, and the expensive 64-d rerank touches only
    ~25% of rows. The DuckDB oracle regenerates the identical hyperplanes
    from md5 in-engine and checks the full approximate result hash-exactly."""
    import numpy as np

    W = _hamming_planes()
    e = _read(spark, sf_dir, "embeddings")
    refv = np.array(
        e.filter(F.col("vec_id") == 0).select("embedding").first()[0],
        dtype=np.float64,
    )
    qbits = (refv @ W.T) >= 0
    qbits_b = spark.sparkContext.broadcast(qbits)
    planes_b = spark.sparkContext.broadcast(W)

    @F.pandas_udf("int")
    def hamming(emb: pd.Series) -> pd.Series:
        mat = np.array(emb.tolist(), dtype=np.float64)
        bits = (mat @ planes_b.value.T) >= 0
        return pd.Series((bits != qbits_b.value).sum(1))

    ref = (
        e.filter(F.col("vec_id") == 0)
        .select(F.col("embedding").alias("ref"))
        .withColumn("nr", F.sqrt(F.expr(_dot_expr("ref", "ref"))))
    )
    dot = F.expr(_dot_expr("embedding", "ref"))
    na = F.sqrt(F.expr(_dot_expr("embedding", "embedding")))
    return (
        e.filter(F.col("vec_id") != 0)
        .filter(hamming("embedding") <= ANN_HAM_RADIUS)
        .crossJoin(F.broadcast(ref))
        .select("vec_id", F.round(dot / (na * F.col("nr")), 4).alias("cos"))
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(20)
    )


SQL_ANN_HAMMING = f"""
WITH planes AS (
  SELECT p.range AS p, i.range AS i,
         ((('0x'||substr(md5(p.range::VARCHAR||':'||i.range::VARCHAR),1,8))::BIGINT % 2001) - 1000)/1000.0 AS w
  FROM range({ANN_HAM_PLANES}) p, range({ANN_HAM_DIM}) i
),
wvecs AS (SELECT p, list(w ORDER BY i) AS wvec FROM planes GROUP BY p),
bits AS (
  SELECT e.vec_id, w.p,
         CASE WHEN {_sql_dot('e.embedding', 'w.wvec')} >= 0 THEN 1 ELSE 0 END AS bit
  FROM embeddings e CROSS JOIN wvecs w
),
qbits AS (SELECT p, bit FROM bits WHERE vec_id = 0),
ham AS (
  SELECT b.vec_id, SUM(CASE WHEN b.bit <> q.bit THEN 1 ELSE 0 END) AS ham
  FROM bits b JOIN qbits q USING (p) WHERE b.vec_id <> 0 GROUP BY b.vec_id
),
cand AS (SELECT vec_id FROM ham WHERE ham <= {ANN_HAM_RADIUS}),
ref AS (SELECT embedding AS refv FROM embeddings WHERE vec_id = 0)
SELECT e.vec_id AS vec_id,
       round({_sql_dot('e.embedding', 'r.refv')} /
             (sqrt({_sql_dot('e.embedding', 'e.embedding')}) *
              sqrt({_sql_dot('r.refv', 'r.refv')})), 4) AS cos
FROM embeddings e JOIN cand USING (vec_id) CROSS JOIN ref r
ORDER BY cos DESC, vec_id ASC LIMIT 20
"""


def q_audio_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio twin of q_multimodal_decode: each doc gets an authentic
    RIFF/WAVE container (complete fmt + data chunk headers) whose PCM
    params derive in closed form from (doc_id, length(text)), and the
    Arrow-batched decode pass must genuinely walk the RIFF chunk list it
    is handed. DuckDB verifies the round trip from the same closed form.
    A production deployment swaps kernels.media.parse_wav for
    soundfile/ffmpeg behind the identical (bytes) -> metadata contract."""
    from pyspark.sql import types as T

    from webcrawler_spark.kernels.media import make_wav, parse_wav

    docs = _read(spark, sf_dir, "documents").select(
        "doc_id", F.length("text").alias("n_chars")
    )

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("sample_rate", T.IntegerType()),
            T.StructField("channels", T.IntegerType()),
            T.StructField("bits", T.IntegerType()),
            T.StructField("n_samples", T.LongType()),
            T.StructField("duration_ms", T.LongType()),
        ]
    )

    def decode(batches):
        for pdf in batches:
            rows = []
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                rate = 8000 * (int(doc_id) % 3 + 1)  # 8/16/24 kHz
                ch = int(doc_id) % 2 + 1
                n = int(n_chars) * 100 + 1
                blob = make_wav(rate, n, channels=ch, bits=16)
                meta = parse_wav(blob)  # the real structural parse
                r, c, b, ns = meta if meta else (None, None, None, None)
                rows.append((int(doc_id), r, c, b, ns, ns * 1000 // r))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "sample_rate",
                    "channels",
                    "bits",
                    "n_samples",
                    "duration_ms",
                ],
            )

    return docs.mapInPandas(decode, out_schema)


SQL_AUDIO_DECODE = """
SELECT doc_id,
       CAST(8000 * (doc_id % 3 + 1) AS INTEGER) AS sample_rate,
       CAST(doc_id % 2 + 1 AS INTEGER) AS channels,
       CAST(16 AS INTEGER) AS bits,
       CAST(length(text) * 100 + 1 AS BIGINT) AS n_samples,
       CAST((length(text) * 100 + 1) * 1000 // (8000 * (doc_id % 3 + 1)) AS BIGINT) AS duration_ms
FROM documents
"""


_FRAME_STRIDE = 10


def q_video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video leg of the multimodal family: each doc gets an authentic AVI
    (RIFF LIST/hdrl/avih) header whose frame count / rate / dimensions
    derive in closed form from (doc_id, length(text)); the Arrow pass
    structurally parses it, then FRAME-SAMPLING runs as a distributed
    explode(sequence(0, frames-1, stride)) — the Spark plumbing a real
    ffmpeg-backed sampler would feed (at 100 TB the explode is the shape:
    per-frame rows with timestamps, never a driver loop)."""
    from pyspark.sql import types as T

    from webcrawler_spark.kernels.media import make_avi, parse_avi

    docs = _read(spark, sf_dir, "documents").select(
        "doc_id", F.length("text").alias("n_chars")
    )

    meta_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("us_per_frame", T.LongType()),
            T.StructField("total_frames", T.IntegerType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
        ]
    )

    def decode(batches):
        for pdf in batches:
            rows = []
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                upf = 1000000 // (int(doc_id) % 3 * 5 + 20)  # 20/25/30 fps
                frames = int(n_chars) % 300 + 30
                w, h = 320 * (int(doc_id) % 2 + 1), 180 * (int(doc_id) % 2 + 1)
                blob = make_avi(w, h, frames, us_per_frame=upf)
                meta = parse_avi(blob)  # the real structural parse
                u, f, pw, ph = meta if meta else (None, None, None, None)
                rows.append((int(doc_id), u, f, pw, ph))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "us_per_frame", "total_frames", "width", "height"],
            )

    meta = docs.mapInPandas(decode, meta_schema)
    return meta.select(
        "doc_id",
        "width",
        "height",
        F.explode(
            F.sequence(
                F.lit(0), F.col("total_frames") - 1, F.lit(_FRAME_STRIDE)
            )
        ).alias("frame_idx"),
        "us_per_frame",
    ).select(
        "doc_id",
        F.col("frame_idx").cast("int").alias("frame_idx"),
        F.expr("(frame_idx * us_per_frame) div 1000").alias("ts_ms"),
        "width",
        "height",
    )


SQL_VIDEO_FRAME_SAMPLE = f"""
WITH meta AS (
  SELECT doc_id,
         CAST(1000000 // (doc_id % 3 * 5 + 20) AS BIGINT) AS us_per_frame,
         CAST(length(text) % 300 + 30 AS INTEGER) AS total_frames,
         CAST(320 * (doc_id % 2 + 1) AS INTEGER) AS width,
         CAST(180 * (doc_id % 2 + 1) AS INTEGER) AS height
  FROM documents
)
SELECT doc_id,
       CAST(f.frame_idx AS INTEGER) AS frame_idx,
       CAST(f.frame_idx * us_per_frame // 1000 AS BIGINT) AS ts_ms,
       width, height
FROM meta, unnest(range(0, total_frames, {_FRAME_STRIDE})) AS f(frame_idx)
"""


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

#: name -> (spark callable, oracle SQL or None)
# ---------------------------------------------------------------------------
# link-graph analytics + corpus-level LM scoring (training-data surface):
# PageRank over a derived host graph, TF-IDF term weighting, unigram-LM
# negative log-likelihood (CCNet-style quality signal)
# ---------------------------------------------------------------------------

_PR_DAMPING = 0.85
_PR_ITERS = 3
_PR_NODES = 50


def _pagerank_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 50-node host graph derived from events: src = user_id
    mod 50, dst = first-4-hex of md5(event_id) mod 50 (the md5-derived
    pseudo-random endpoint is reproducible bit-for-bit in DuckDB)."""
    ev = _read(spark, sf_dir, "events")
    return (
        ev.select(
            (F.col("user_id") % _PR_NODES).alias("src"),
            (
                F.expr(
                    "cast(conv(substring(md5(cast(event_id as string)), 1, 4), 16, 10) as bigint)"
                )
                % _PR_NODES
            ).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-graph PageRank, fixed 3 iterations, damping 0.85, dangling mass
    redistributed uniformly each iteration (total rank mass stays 1.0 —
    asserted by the verify invariant).

    The iterative-DataFrame shape that survives 100 TB: per iteration one
    shuffle join (edges ⋈ ranks on src) + one groupBy(dst).sum, plus a
    1-row dangling-mass aggregate broadcast back in; ranks are re-derived
    over the full node set via a left join so zero-in-degree nodes keep
    the teleport mass. At web scale the rank frame is localCheckpoint()ed
    every few iterations to truncate lineage; 3 iterations stay within
    one lineage chain. Graph surface ref: GMLStorage.scala:56-60 (net
    edges), NetworkEstimator.scala:101-124 (priority propagation —
    PageRank is its normalized fixpoint cousin)."""
    edges = _pagerank_edges(spark, sf_dir)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    # N is a single driver-side scalar (one count job), not a per-iteration
    # broadcast — folding it as a literal keeps every iteration's plan flat
    n = float(nodes.count())
    outdeg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    ed = edges.join(outdeg, "src").localCheckpoint()
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    for _ in range(_PR_ITERS):
        contrib = (
            ed.join(ranks, ed.src == ranks.node)
            .select("dst", (F.col("rank") / F.col("outdeg").cast("double")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )
        dangling = (
            ranks.join(ed.select("src").distinct(), ranks.node == F.col("src"), "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dang"))
        )
        ranks = (
            nodes.join(contrib, nodes.node == contrib.dst, "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit((1.0 - _PR_DAMPING) / n)
                    + _PR_DAMPING
                    * (
                        F.coalesce(F.col("contrib"), F.lit(0.0))
                        + F.col("dang") / F.lit(n)
                    )
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks.select("node", F.round("rank", 6).alias("pagerank"))


def _sql_pagerank_iter(prev: str, cur: str) -> str:
    return f"""
{cur} AS (
  SELECT n.node AS node,
         (1.0 - {_PR_DAMPING}) / nn.n::DOUBLE
           + {_PR_DAMPING} * (coalesce(c.contrib, 0.0) + dg.dang / nn.n::DOUBLE) AS rank
  FROM nodes n
  CROSS JOIN ncount nn
  CROSS JOIN (
    SELECT coalesce(sum(p.rank), 0.0) AS dang
    FROM {prev} p WHERE p.node NOT IN (SELECT DISTINCT src FROM edges)
  ) dg
  LEFT JOIN (
    SELECT e.dst AS dst, sum(p.rank / e.outdeg::DOUBLE) AS contrib
    FROM ed e JOIN {prev} p ON e.src = p.node
    GROUP BY e.dst
  ) c ON n.node = c.dst
)"""


SQL_PAGERANK = f"""
WITH edges AS (
  SELECT DISTINCT user_id % {_PR_NODES} AS src,
         ('0x' || substr(md5(event_id::VARCHAR), 1, 4))::BIGINT % {_PR_NODES} AS dst
  FROM events
  WHERE user_id % {_PR_NODES}
        <> ('0x' || substr(md5(event_id::VARCHAR), 1, 4))::BIGINT % {_PR_NODES}
),
nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
ncount AS (SELECT count(*) AS n FROM nodes),
ed AS (
  SELECT e.src, e.dst, d.outdeg
  FROM edges e JOIN (SELECT src, count(*) AS outdeg FROM edges GROUP BY src) d
    ON e.src = d.src
),
r0 AS (SELECT node, 1.0 / nn.n::DOUBLE AS rank FROM nodes CROSS JOIN ncount nn),
{_sql_pagerank_iter('r0', 'r1')},
{_sql_pagerank_iter('r1', 'r2')},
{_sql_pagerank_iter('r2', 'r3')}
SELECT node, round(rank, 6) AS pagerank FROM r3
"""


_TR_DAMPING = 0.85
_TR_ITERS = 3
_TR_SEED_MOD = 10  # nodes ≡ 0 (mod 10) are the trusted seed set


def q_trust_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TrustRank (Gyongyi, Garcia-Molina & Pedersen, VLDB 2004):
    personalized PageRank whose teleport vector is a trusted seed set —
    trust flows out from vetted hosts and decays through the link
    graph, so spam farms that PageRank rewards stay low unless a
    trusted host (transitively) links to them. The crawl-policy use is
    direct: admission/priority damping for link-farm neighborhoods
    (complements `link_farm_score`'s local signals with a global one).

    Same derived 50-node host graph and iteration scaffolding as
    `pagerank` (one edges-join + groupBy(dst) partial-agg per round,
    1-row dangling aggregate broadcast back, localCheckpoint lineage
    truncation) — the only change is the teleport/dangling mass going
    to the seed distribution instead of uniform, which is exactly how
    you'd run it at 10^8 hosts. Seeds: node % {mod} == 0."""
    edges = _pagerank_edges(spark, sf_dir)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    seed_flag = (F.col("node") % _TR_SEED_MOD == 0).cast("int")
    nodes = nodes.select("node", seed_flag.alias("is_seed"))
    n_seeds = float(nodes.agg(F.sum("is_seed")).collect()[0][0])
    outdeg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    ed = edges.join(outdeg, "src").localCheckpoint()
    tele = F.col("is_seed").cast("double") / F.lit(n_seeds)
    ranks = nodes.select("node", "is_seed", tele.alias("rank"))
    for _ in range(_TR_ITERS):
        contrib = (
            ed.join(ranks, ed.src == ranks.node)
            .select(
                "dst",
                (F.col("rank") / F.col("outdeg").cast("double")).alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )
        dangling = ranks.join(
            ed.select("src").distinct(), ranks.node == F.col("src"), "left_anti"
        ).agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dang"))
        ranks = (
            ranks.select("node", "is_seed")
            .join(contrib, F.col("node") == contrib.dst, "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                "is_seed",
                (
                    (1.0 - _TR_DAMPING) * tele
                    + _TR_DAMPING
                    * (
                        F.coalesce(F.col("contrib"), F.lit(0.0))
                        + F.col("dang") * tele
                    )
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks.select(
        "node", "is_seed", F.round("rank", 6).alias("trust")
    )


def _sql_trustrank_iter(prev: str, cur: str) -> str:
    tele = f"(n.is_seed::DOUBLE / ns.n_seeds::DOUBLE)"
    return f"""
{cur} AS MATERIALIZED (
  SELECT n.node AS node, n.is_seed AS is_seed,
         (1.0 - {_TR_DAMPING}) * {tele}
           + {_TR_DAMPING} * (coalesce(c.contrib, 0.0) + dg.dang * {tele}) AS rank
  FROM nodes n
  CROSS JOIN nseeds ns
  CROSS JOIN (
    SELECT coalesce(sum(p.rank), 0.0) AS dang
    FROM {prev} p WHERE p.node NOT IN (SELECT DISTINCT src FROM edges)
  ) dg
  LEFT JOIN (
    SELECT e.dst AS dst, sum(p.rank / e.outdeg::DOUBLE) AS contrib
    FROM ed e JOIN {prev} p ON e.src = p.node
    GROUP BY e.dst
  ) c ON n.node = c.dst
)"""


SQL_TRUST_RANK = f"""
WITH edges AS MATERIALIZED (
  SELECT DISTINCT user_id % {_PR_NODES} AS src,
         ('0x' || substr(md5(event_id::VARCHAR), 1, 4))::BIGINT % {_PR_NODES} AS dst
  FROM events
  WHERE user_id % {_PR_NODES}
        <> ('0x' || substr(md5(event_id::VARCHAR), 1, 4))::BIGINT % {_PR_NODES}
),
nodes AS (
  SELECT node, (node % {_TR_SEED_MOD} = 0)::INTEGER AS is_seed
  FROM (SELECT src AS node FROM edges UNION SELECT dst FROM edges)
),
nseeds AS (SELECT sum(is_seed) AS n_seeds FROM nodes),
ed AS MATERIALIZED (
  SELECT e.src, e.dst, d.outdeg
  FROM edges e JOIN (SELECT src, count(*) AS outdeg FROM edges GROUP BY src) d
    ON e.src = d.src
),
r0 AS (SELECT node, is_seed, is_seed::DOUBLE / ns.n_seeds::DOUBLE AS rank
       FROM nodes CROSS JOIN nseeds ns),
{_sql_trustrank_iter('r0', 'r1')},
{_sql_trustrank_iter('r1', 'r2')},
{_sql_trustrank_iter('r2', 'r3')}
SELECT node, is_seed, round(rank, 6) AS trust FROM r3
"""


_OPIC_ITERS = 3


def q_opic_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPIC — Adaptive On-line Page Importance Computation (Abiteboul,
    Preda & Cobena, WWW 2003): the crawl-frontier priority algorithm
    that estimates page importance WHILE crawling, no convergence wait.
    Every node carries (cash, history); each synchronous round every
    node distributes its cash equally over its out-links, banks the
    distributed amount into history, and dangling cash is swept to the
    uniform virtual node. importance = (history + cash) / (t + 1) —
    total cash is conserved at 1.0 per round, so the denominator is the
    literal round count, never a global aggregate.

    This is the reference's frontier-priority-propagation family
    (NetworkEstimator.scala:101-124 max-combines link priority into the
    queue; OPIC is the mass-conserving cousin real crawlers like
    Nutch/StormCrawler default to). Per round the plan is one
    shuffle join (state ⋈ out-edges) + one groupBy(dst) partial-agg sum
    + a 1-row dangling aggregate broadcast back — identical wave shape
    at 10^10 nodes, with the state frame localCheckpoint()ed per round
    to keep the unrolled lineage flat. Same derived 50-node host graph
    as `pagerank` so the two rankings are directly comparable."""
    edges = _pagerank_edges(spark, sf_dir)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n = float(nodes.count())
    outdeg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    ed = edges.join(outdeg, "src").localCheckpoint()
    state = nodes.select(
        "node", F.lit(1.0 / n).alias("cash"), F.lit(0.0).alias("hist")
    )
    for _ in range(_OPIC_ITERS):
        contrib = (
            ed.join(state, ed.src == state.node)
            .select(
                "dst",
                (F.col("cash") / F.col("outdeg").cast("double")).alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )
        dangling = state.join(
            ed.select("src").distinct(), state.node == F.col("src"), "left_anti"
        ).agg(F.coalesce(F.sum("cash"), F.lit(0.0)).alias("dang"))
        state = (
            state.join(contrib, state.node == contrib.dst, "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.coalesce(F.col("contrib"), F.lit(0.0))
                    + F.col("dang") / F.lit(n)
                ).alias("cash"),
                (F.col("hist") + F.col("cash")).alias("hist"),
            )
            .localCheckpoint()
        )
    return state.select(
        "node",
        F.round("cash", 6).alias("cash"),
        F.round("hist", 6).alias("hist"),
        F.round(
            (F.col("hist") + F.col("cash")) / F.lit(float(_OPIC_ITERS + 1)), 6
        ).alias("importance"),
    )


def _sql_opic_iter(prev: str, cur: str) -> str:
    return f"""
{cur} AS MATERIALIZED (
  SELECT s.node AS node,
         coalesce(c.contrib, 0.0) + dg.dang / nn.n::DOUBLE AS cash,
         s.hist + s.cash AS hist
  FROM {prev} s
  CROSS JOIN ncount nn
  CROSS JOIN (
    SELECT coalesce(sum(p.cash), 0.0) AS dang
    FROM {prev} p WHERE p.node NOT IN (SELECT DISTINCT src FROM edges)
  ) dg
  LEFT JOIN (
    SELECT e.dst AS dst, sum(p.cash / e.outdeg::DOUBLE) AS contrib
    FROM ed e JOIN {prev} p ON e.src = p.node
    GROUP BY e.dst
  ) c ON s.node = c.dst
)"""


SQL_OPIC_IMPORTANCE = f"""
WITH edges AS MATERIALIZED (
  SELECT DISTINCT user_id % {_PR_NODES} AS src,
         ('0x' || substr(md5(event_id::VARCHAR), 1, 4))::BIGINT % {_PR_NODES} AS dst
  FROM events
  WHERE user_id % {_PR_NODES}
        <> ('0x' || substr(md5(event_id::VARCHAR), 1, 4))::BIGINT % {_PR_NODES}
),
nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
ncount AS (SELECT count(*) AS n FROM nodes),
ed AS MATERIALIZED (
  SELECT e.src, e.dst, d.outdeg
  FROM edges e JOIN (SELECT src, count(*) AS outdeg FROM edges GROUP BY src) d
    ON e.src = d.src
),
s0 AS (SELECT node, 1.0 / nn.n::DOUBLE AS cash, 0.0 AS hist
       FROM nodes CROSS JOIN ncount nn),
{_sql_opic_iter('s0', 's1')},
{_sql_opic_iter('s1', 's2')},
{_sql_opic_iter('s2', 's3')}
SELECT node, round(cash, 6) AS cash, round(hist, 6) AS hist,
       round((hist + cash) / {float(_OPIC_ITERS + 1)}, 6) AS importance
FROM s3
"""


_RJ_HOUR_US = 3_600_000_000  # 1h in epoch-microseconds


def q_range_join_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval-containment) join via time binning: count events
    falling inside each interval, where intervals = [first event, +1h) per
    user_id%50 group.

    Spark has no range-join optimization — the naive `e.ts BETWEEN i.t0
    AND i.t1` theta-join plans as BroadcastNestedLoopJoin (O(|E|·|I|)
    probe work). The scale pattern: explode each interval into the hour
    bins it covers, map each event to its single hour bin, equi-join on
    the bin (hash shuffle both sides), then filter exact containment —
    O(|E| + |I|·span) with no nested loop. Pinned by the plan audit."""
    ev = _read(spark, sf_dir, "events").select(
        "event_id",
        _us("ts").alias("t_us"),
        "user_id",
    )
    iv = ev.groupBy((F.col("user_id") % 50).alias("interval_id")).agg(
        F.min("t_us").alias("t0"),
        (F.min("t_us") + F.lit(_RJ_HOUR_US)).alias("t1"),
    )
    iv_bins = iv.select(
        "interval_id",
        "t0",
        "t1",
        F.explode(
            F.sequence(
                F.floor(F.col("t0") / _RJ_HOUR_US),
                F.floor((F.col("t1") - 1) / _RJ_HOUR_US),
            )
        ).alias("bin"),
    )
    evb = ev.withColumn("bin", F.floor(F.col("t_us") / _RJ_HOUR_US))
    return (
        evb.join(iv_bins, "bin")
        .filter((F.col("t_us") >= F.col("t0")) & (F.col("t_us") < F.col("t1")))
        .groupBy("interval_id")
        .agg(F.count("*").alias("n_events"))
    )


SQL_RANGE_JOIN_BINS = f"""
WITH ev AS (
  SELECT event_id, epoch_us(ts) AS t_us, user_id FROM events
),
iv AS (
  SELECT user_id % 50 AS interval_id,
         min(t_us) AS t0,
         min(t_us) + {_RJ_HOUR_US} AS t1
  FROM ev GROUP BY user_id % 50
)
SELECT iv.interval_id AS interval_id, count(*) AS n_events
FROM ev JOIN iv ON ev.t_us >= iv.t0 AND ev.t_us < iv.t1
GROUP BY iv.interval_id
"""


def q_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF top-3 terms per document (idf = ln(N/df)). Two shuffles
    (doc×term tf, term df) + one window; the df side is tiny relative to
    the corpus and broadcasts at scale. Ranking uses the ROUNDED score so
    engine ulp differences in ln() cannot flip the order; term breaks
    ties."""
    tf = (
        _tokens(_read(spark, sf_dir, "documents"))
        .select("doc_id", F.explode("toks").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    df_cnt = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = _read(spark, sf_dir, "documents").agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df_cnt), "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            F.round(
                F.col("tf").cast("double")
                * F.log(F.col("n_docs").cast("double") / F.col("df").cast("double")),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "term", "tf", "df", "tfidf")
    )


SQL_TFIDF_TOPK = f"""
WITH tf AS (
  SELECT doc_id, term, count(*) AS tf
  FROM (SELECT doc_id, unnest({_SQL_TOKS}) AS term FROM documents) t
  GROUP BY doc_id, term
),
dfc AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
nd AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, dfc.df,
         round(tf.tf::DOUBLE * ln(nd.n_docs::DOUBLE / dfc.df::DOUBLE), 6) AS tfidf
  FROM tf JOIN dfc ON tf.term = dfc.term CROSS JOIN nd
)
SELECT doc_id, term, tf, df, tfidf
FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS rnk
  FROM scored
) r WHERE rnk <= 3
"""


def q_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroid — the distributed face of the
    reference's AverageVector estimator (AverageVector.scala:24-43; A2 in
    SURVEY §2.6) and the exact building block the IVF trainer and
    topical-steering target vectors are made of.

    posexplode → groupBy(label, pos).avg → re-assemble ordered: two
    narrow shuffles on (label, pos), no per-row Python, component sums
    associative so map-side partial aggregation does the heavy lifting
    at 100 TB. Components are rounded (6 dp) to absorb summation-order
    differences between engines."""
    e = _read(spark, sf_dir, "embeddings")
    comp = e.select(
        "label", F.posexplode("embedding").alias("pos", "x")
    ).groupBy("label", "pos").agg(
        F.round(F.avg(F.col("x").cast("double")), 6).alias("c"),
        F.count("*").alias("n"),
    )
    return (
        comp.groupBy("label")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("pos", "c"))
            ).alias("pc"),
            F.max("n").alias("n_vectors"),
        )
        .select(
            "label",
            F.expr("transform(pc, p -> p.c)").alias("centroid"),
            "n_vectors",
        )
    )


SQL_LABEL_CENTROIDS = """
WITH comp AS (
  SELECT label, pos - 1 AS pos, round(avg(x::DOUBLE), 6) AS c, count(*) AS n
  FROM (
    SELECT label, unnest(embedding) AS x,
           generate_subscripts(embedding, 1) AS pos
    FROM embeddings
  ) t
  GROUP BY label, pos
)
SELECT label,
       list(c ORDER BY pos) AS centroid,
       max(n) AS n_vectors
FROM comp GROUP BY label
"""


def q_nearest_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster assignment: each embedding goes to the label whose centroid
    is nearest in squared L2 — the assignment half of k-means / IVF and
    the cluster-steering decision (TargetVectorCluster.scala:35-52 picks
    targets by vector proximity the same way).

    Centroids are the label_centroids result (rounded 6 dp on both
    engines, so the assignment inputs are identical); distances use the
    shared sequential-fold expression (bit-identical before comparison);
    ties break by label. Plan: tiny centroid table broadcast, one
    argmin-by-window over vec x centroid — at 100 TB this is the
    canonical broadcast-assignment map stage."""
    e = _read(spark, sf_dir, "embeddings")
    cent = q_label_centroids(spark, sf_dir).select(
        F.col("label").alias("c_label"), "centroid"
    )
    d2 = F.expr(_sqdist_expr("embedding", "centroid"))
    scored = e.join(F.broadcast(cent)).select(
        "vec_id",
        F.col("label").alias("own_label"),
        "c_label",
        d2.alias("d2"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.asc("d2"), F.asc("c_label"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .select(
            "vec_id",
            "own_label",
            F.col("c_label").alias("assigned_label"),
            F.round("d2", 6).alias("d2"),
            (F.col("c_label") == F.col("own_label")).alias("is_own"),
        )
    )


SQL_NEAREST_CENTROID = f"""
WITH comp AS (
  SELECT label, pos - 1 AS pos, round(avg(x::DOUBLE), 6) AS c
  FROM (
    SELECT label, unnest(embedding) AS x,
           generate_subscripts(embedding, 1) AS pos
    FROM embeddings
  ) t
  GROUP BY label, pos
),
cent AS (
  SELECT label AS c_label, list(c ORDER BY pos) AS centroid
  FROM comp GROUP BY label
),
scored AS (
  SELECT e.vec_id, e.label AS own_label, cent.c_label,
         {_sql_sqdist('e.embedding', 'cent.centroid')} AS d2
  FROM embeddings e CROSS JOIN cent
)
SELECT vec_id, own_label, c_label AS assigned_label,
       round(d2, 6) AS d2, c_label = own_label AS is_own
FROM (
  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2 ASC, c_label ASC) AS rnk
  FROM scored
) r WHERE rnk = 1
"""


def q_unigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM quality signal (CCNet-style): train p(t) = count(t)/total
    on the corpus itself, score each doc by mean negative log-likelihood.
    One corpus-level count (broadcastable vocab) + one join + one per-doc
    aggregate — the filter-by-perplexity pattern at 100 TB runs exactly
    this plan with the LM table broadcast."""
    toks = _tokens(_read(spark, sf_dir, "documents")).select(
        "doc_id", F.explode("toks").alias("term")
    )
    vocab = toks.groupBy("term").agg(F.count("*").alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("total"))
    lm = vocab.crossJoin(F.broadcast(total)).select(
        "term",
        (-F.log(F.col("cnt").cast("double") / F.col("total").cast("double"))).alias(
            "nll_t"
        ),
    )
    return (
        toks.join(F.broadcast(lm), "term")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_toks"),
            F.round(F.avg("nll_t"), 5).alias("mean_nll"),
        )
    )


SQL_UNIGRAM_LM_SCORE = f"""
WITH toks AS (SELECT doc_id, unnest({_SQL_TOKS}) AS term FROM documents),
vocab AS (SELECT term, count(*) AS cnt FROM toks GROUP BY term),
tot AS (SELECT sum(cnt) AS total FROM vocab),
lm AS (
  SELECT term, -ln(cnt::DOUBLE / tot.total::DOUBLE) AS nll_t
  FROM vocab CROSS JOIN tot
)
SELECT t.doc_id AS doc_id, count(*) AS n_toks, round(avg(l.nll_t), 5) AS mean_nll
FROM toks t JOIN lm l ON t.term = l.term
GROUP BY t.doc_id
"""


def exact_substring_pairs(
    docs: DataFrame, k: int = 8, max_df: int | None = None
) -> DataFrame:
    """Exact-substring duplication (Lee et al., "Deduplicating Training
    Data Makes Language Models Better"): pairs of docs sharing at least
    one exact run of ``k`` consecutive tokens, with the number of shared
    k-token windows per pair. The suffix-array approach of the paper is
    single-machine; the distributed equivalent is this hashed
    sliding-window equi-join — every k-window md5-hashed map-side (one
    pass, no shuffle until the join), distinct per doc, then a bucket
    join on the window hash. n_shared == (run_len - k + 1) for one
    contiguous shared run, so thresholding n_shared is thresholding the
    longest shared span.

    ``max_df`` is the same hot-bucket cap as ngram_jaccard: windows
    shared by > max_df docs (boilerplate at web scale) are dropped from
    candidate generation and pairs are then counted exactly over full
    window sets — bounded by |candidates| x doc windows, never d^2 on a
    hot window."""
    docs = _tokens(docs).filter(F.expr(f"size(toks) >= {k}"))
    win = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, size(toks) - {k} + 1), "
                f"i -> md5(concat_ws(' ', slice(toks, i, {k}))))"
            )
        ).alias("wh"),
    ).distinct()
    if max_df is None:
        a, b = win.alias("a"), win.alias("b")
        return (
            a.join(b, "wh")
            .filter(F.col("a.doc_id") < F.col("b.doc_id"))
            .groupBy(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
            .agg(F.count("*").alias("n_shared"))
        )
    hot = (
        win.groupBy("wh")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > max_df)
        .select("wh")
    )
    rare = win.join(F.broadcast(hot), "wh", "left_anti")
    a, b = rare.alias("a"), rare.alias("b")
    cand = (
        a.join(b, "wh")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
        .distinct()
    )
    wa = win.select(F.col("doc_id").alias("a_id"), "wh")
    wb = win.select(F.col("doc_id").alias("b_id"), "wh")
    return (
        cand.join(wa, "a_id")
        .join(wb, ["b_id", "wh"])
        .groupBy("a_id", "b_id")
        .agg(F.count("*").alias("n_shared"))
    )


def q_exact_substring_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_substring_pairs(_docs_parallel(spark, sf_dir), k=8)


SQL_EXACT_SUBSTRING_DUP = f"""
WITH toks AS (SELECT doc_id, {_SQL_TOKS} AS t FROM documents WHERE len({_SQL_TOKS}) >= 8),
win AS (
  SELECT DISTINCT doc_id,
    unnest(list_transform(range(1, greatest(len(t) - 8 + 2, 1)),
                          i -> md5(array_to_string(t[i:i+7], ' ')))) AS wh
  FROM toks
)
SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS n_shared
FROM win a JOIN win b ON a.wh = b.wh AND a.doc_id < b.doc_id
GROUP BY 1, 2
"""


_MIX_ALPHA = 0.7
_MIX_TARGET = 200


def q_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based training-data mixing (the multilingual sampling
    rule of XLM-R / LLaMA data recipes): group weight w_i proportional to
    n_i^alpha (alpha=0.7 upsamples the tail), a fixed total budget split
    as floor(w_i * N + 0.5), and a deterministic per-group selection by
    md5(doc_id) rank so reruns pick the same docs.

    Plan: group counts are one aggregation (tiny — O(langs)), weights are
    computed on that broadcast table, and selection is a per-group
    row_number window. At 100 TB the exact-rank window becomes a
    hash-threshold sample (keep doc if md5-percentile <= w_i·N/n_i) —
    same keys, no sort; the exact window stays here because the driver
    compare needs deterministic counts."""
    d = _read(spark, sf_dir, "documents")
    cnt = d.groupBy("lang").agg(F.count("*").alias("n_docs"))
    tot = cnt.agg(
        F.sum(F.pow(F.col("n_docs").cast("double"), F.lit(_MIX_ALPHA))).alias("z")
    )
    w = cnt.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_docs",
        (F.pow(F.col("n_docs").cast("double"), F.lit(_MIX_ALPHA)) / F.col("z")).alias("w"),
    )
    quota = w.select(
        "lang",
        "n_docs",
        F.round("w", 6).alias("weight"),
        F.floor(F.col("w") * _MIX_TARGET + 0.5).cast("int").alias("take_n"),
    )
    rk = Window.partitionBy("lang").orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
    picked = d.select("doc_id", "lang").withColumn("rk", F.row_number().over(rk))
    return (
        picked.join(F.broadcast(quota), "lang")
        .filter(F.col("rk") <= F.col("take_n"))
        .select("doc_id", "lang", "rk", "weight", "take_n")
    )


SQL_MIX_TEMPERATURE = f"""
WITH cnt AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
tot AS (SELECT sum(pow(n_docs::DOUBLE, {_MIX_ALPHA})) AS z FROM cnt),
quota AS (
  SELECT lang, n_docs,
         round(pow(n_docs::DOUBLE, {_MIX_ALPHA}) / z, 6) AS weight,
         CAST(floor(pow(n_docs::DOUBLE, {_MIX_ALPHA}) / z * {_MIX_TARGET} + 0.5) AS INT) AS take_n
  FROM cnt CROSS JOIN tot
),
picked AS (
  SELECT doc_id, lang,
         CAST(row_number() OVER (PARTITION BY lang
                                 ORDER BY md5(doc_id::VARCHAR), doc_id) AS INT) AS rk
  FROM documents
)
SELECT p.doc_id, p.lang, p.rk, q.weight, q.take_n
FROM picked p JOIN quota q ON p.lang = q.lang
WHERE p.rk <= q.take_n
"""


_HE_DIM = 16


def q_hash_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-hashing text embedder (Weinberger et al. hashing trick):
    every token lands in md5-derived bucket h%16 with sign from the next
    hex digit; per-doc signed counts are l2-normalized into a dense
    vector. This is the in-engine text→vector featurizer that feeds the
    ANN / centroid operators when no model embeddings exist.

    Plan: one explode + one conditional aggregation (16 sums in a single
    groupBy — no per-bucket shuffle, no pivot discovery pass), then a
    map-side normalize over the assembled array. Signed integer sums are
    exact, so cross-engine parity is just the final divide+round."""
    toks = _tokens(_read(spark, sf_dir, "documents")).select(
        "doc_id", F.explode("toks").alias("term")
    )
    h = "md5(term)"
    t = toks.select(
        "doc_id",
        (F.expr(f"cast(conv(substring({h}, 1, 8), 16, 10) as bigint)") % _HE_DIM).alias("bucket"),
        F.when(
            F.expr(f"cast(conv(substring({h}, 9, 1), 16, 10) as int)") % 2 == 0,
            F.lit(1),
        ).otherwise(F.lit(-1)).alias("sgn"),
    )
    agg = t.groupBy("doc_id").agg(
        *[
            F.coalesce(F.sum(F.when(F.col("bucket") == i, F.col("sgn"))), F.lit(0))
            .alias(f"c{i}")
            for i in range(_HE_DIM)
        ]
    )
    vec = "array(" + ", ".join(f"cast(c{i} as double)" for i in range(_HE_DIM)) + ")"
    return agg.select(
        "doc_id",
        F.expr(
            f"transform({vec}, x -> round(x / nullif(sqrt(aggregate({vec}, "
            f"cast(0.0 as double), (a, y) -> a + y * y)), 0.0), 6))"
        ).alias("embedding"),
    )


SQL_HASH_EMBED = f"""
WITH toks AS (SELECT doc_id, unnest({_SQL_TOKS}) AS term FROM documents),
t AS (
  SELECT doc_id,
         ('0x' || substr(md5(term), 1, 8))::BIGINT % {_HE_DIM} AS bucket,
         CASE WHEN ('0x' || substr(md5(term), 9, 1))::BIGINT % 2 = 0
              THEN 1 ELSE -1 END AS sgn
  FROM toks
),
agg AS (
  SELECT doc_id,
         {", ".join(f"coalesce(sum(sgn) FILTER (WHERE bucket = {i}), 0) AS c{i}" for i in range(_HE_DIM))}
  FROM t GROUP BY doc_id
),
v AS (
  SELECT doc_id,
         [{", ".join(f"c{i}::DOUBLE" for i in range(_HE_DIM))}] AS vec
  FROM agg
)
SELECT doc_id,
       list_transform(vec, x -> round(x / nullif(sqrt(list_sum(
           list_transform(vec, y -> y * y))), 0.0), 6)) AS embedding
FROM v
"""


def q_rollup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLAP rollup: corpus stats at (source, lang), (source) and grand
    totals in ONE pass (Spark expands grouping sets map-side, so it's a
    single shuffle, not three jobs — the plan 100-TB reporting wants).
    NULL group keys are folded to 'ALL' on both engines so the rollup
    level is explicit in the row."""
    d = _read(spark, sf_dir, "documents")
    return (
        d.rollup("source", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("n_chars"), 2).alias("avg_chars"),
            F.sum("n_chars").alias("total_chars"),
        )
        .select(
            F.coalesce("source", F.lit("ALL")).alias("source"),
            F.coalesce("lang", F.lit("ALL")).alias("lang"),
            "n_docs",
            "avg_chars",
            "total_chars",
        )
    )


SQL_ROLLUP_STATS = """
SELECT coalesce(source, 'ALL') AS source, coalesce(lang, 'ALL') AS lang,
       count(*) AS n_docs, round(avg(n_chars), 2) AS avg_chars,
       sum(n_chars) AS total_chars
FROM documents
GROUP BY ROLLUP(source, lang)
"""


_PIVOT_LANGS = ("de", "en", "es", "fr", "zh")


def q_lang_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: per-source doc counts with one column per language, fixed
    value list. With explicit values Spark compiles pivot to map-side
    conditional aggregation — one shuffle, no second pass to discover
    columns (at 100 TB always pass the value list; value discovery is an
    extra full scan)."""
    d = _read(spark, sf_dir, "documents")
    p = d.groupBy("source").pivot("lang", list(_PIVOT_LANGS)).count()
    return p.select(
        "source",
        *[F.coalesce(F.col(l), F.lit(0)).alias(f"n_{l}") for l in _PIVOT_LANGS],
    )


SQL_LANG_PIVOT = f"""
SELECT source,
       {", ".join(f"count(*) FILTER (WHERE lang = '{l}') AS n_{l}" for l in _PIVOT_LANGS)}
FROM documents
GROUP BY source
"""


def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts on the deterministic 50-node host graph
    (same graph as pagerank — GMLStorage.scala:56-60's net-edges surface,
    here as the cocitation-density analytic).

    Plan is the degree-oriented node-iterator++ (Cohen's MapReduce
    triangle counting): canonicalize to undirected edges a<b, orient each
    edge from its lower-(degree, id) endpoint, build wedges by self-join
    on the oriented source, close each wedge against the canonical edge
    set. Orientation bounds every join key's fan-out by O(sqrt(m))
    (arboricity), so a hot host with 10^6 neighbors contributes
    O(sqrt-bounded) wedges, not 10^12 — the only triangle plan that
    survives a web-scale power-law graph. Each triangle is found exactly
    once, at its min-degree vertex, then exploded to its three corners."""
    und = (
        _pagerank_edges(spark, sf_dir)
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
        .localCheckpoint()
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .union(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    # orient low -> high by (deg, id); broadcast deg (O(nodes) — hosts, not pages)
    o = (
        und.join(F.broadcast(deg).withColumnRenamed("node", "a"), "a")
        .withColumnRenamed("deg", "deg_a")
        .join(F.broadcast(deg).withColumnRenamed("node", "b"), "b")
        .withColumnRenamed("deg", "deg_b")
        .select(
            F.when(
                (F.col("deg_a") < F.col("deg_b"))
                | ((F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))),
                F.struct(F.col("a").alias("u"), F.col("b").alias("v")),
            )
            .otherwise(F.struct(F.col("b").alias("u"), F.col("a").alias("v")))
            .alias("e")
        )
        .select("e.u", "e.v")
    )
    w1, w2 = o.alias("w1"), o.alias("w2")
    wedges = (
        w1.join(w2, "u")
        .filter(F.col("w1.v") < F.col("w2.v"))
        .select("u", F.col("w1.v").alias("x"), F.col("w2.v").alias("y"))
    )
    tri = wedges.join(
        und, (F.col("x") == F.col("a")) & (F.col("y") == F.col("b"))
    ).select("u", "x", "y")
    return (
        tri.select(F.explode(F.array("u", "x", "y")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("n_triangles"))
    )


SQL_TRIANGLE_COUNT = f"""
WITH edges AS (
  SELECT DISTINCT user_id % {_PR_NODES} AS src,
         ('0x' || substr(md5(event_id::VARCHAR), 1, 4))::BIGINT % {_PR_NODES} AS dst
  FROM events
  WHERE user_id % {_PR_NODES}
        <> ('0x' || substr(md5(event_id::VARCHAR), 1, 4))::BIGINT % {_PR_NODES}
),
und AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM edges
),
deg AS (
  SELECT node, count(*) AS deg FROM (
    SELECT a AS node FROM und UNION ALL SELECT b FROM und
  ) t GROUP BY node
),
o AS (
  SELECT CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND u.a < u.b)
              THEN u.a ELSE u.b END AS u,
         CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND u.a < u.b)
              THEN u.b ELSE u.a END AS v
  FROM und u JOIN deg da ON u.a = da.node JOIN deg db ON u.b = db.node
),
wedges AS (
  SELECT w1.u AS u, w1.v AS x, w2.v AS y
  FROM o w1 JOIN o w2 ON w1.u = w2.u AND w1.v < w2.v
),
tri AS (
  SELECT w.u, w.x, w.y
  FROM wedges w JOIN und e ON w.x = e.a AND w.y = e.b
)
SELECT node, count(*) AS n_triangles
FROM (
  SELECT u AS node FROM tri
  UNION ALL SELECT x FROM tri
  UNION ALL SELECT y FROM tri
) c
GROUP BY node
"""


def q_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity bucketing: score every doc with the corpus
    unigram LM (q_unigram_lm_score) and split the corpus into
    head/middle/tail at the 33rd/66th score percentiles (head = lowest
    mean NLL = most fluent). The boundaries are two scalars computed
    once and broadcast — no global sort of the corpus, so at 100 TB this
    is one aggregate + one broadcast-join map stage (swap the exact
    percentile for approx_percentile on a real corpus; the comparison
    plan is unchanged)."""
    lm = q_unigram_lm_score(spark, sf_dir)
    bounds = lm.agg(
        F.round(F.expr("percentile(mean_nll, 0.33)"), 6).alias("q33"),
        F.round(F.expr("percentile(mean_nll, 0.66)"), 6).alias("q66"),
    )
    return lm.crossJoin(F.broadcast(bounds)).select(
        "doc_id",
        "mean_nll",
        F.when(F.col("mean_nll") <= F.col("q33"), F.lit("head"))
        .when(F.col("mean_nll") <= F.col("q66"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )


SQL_PERPLEXITY_BUCKETS = f"""
WITH toks AS (SELECT doc_id, unnest({_SQL_TOKS}) AS term FROM documents),
vocab AS (SELECT term, count(*) AS cnt FROM toks GROUP BY term),
tot AS (SELECT sum(cnt) AS total FROM vocab),
lm AS (
  SELECT term, -ln(cnt::DOUBLE / tot.total::DOUBLE) AS nll_t
  FROM vocab CROSS JOIN tot
),
scored AS (
  SELECT t.doc_id AS doc_id, round(avg(l.nll_t), 5) AS mean_nll
  FROM toks t JOIN lm l ON t.term = l.term
  GROUP BY t.doc_id
),
bounds AS (
  SELECT round(quantile_cont(mean_nll, 0.33), 6) AS q33,
         round(quantile_cont(mean_nll, 0.66), 6) AS q66
  FROM scored
)
SELECT doc_id, mean_nll,
       CASE WHEN mean_nll <= q33 THEN 'head'
            WHEN mean_nll <= q66 THEN 'middle'
            ELSE 'tail' END AS bucket
FROM scored CROSS JOIN bounds
"""


# ---------------------------------------------------------------------------
# corpus-hygiene operators, continued: paragraph-level dedup
# (Gopher/MassiveText-style), DSIR importance weights, skew-safe salted
# heavy-hitter counting
# ---------------------------------------------------------------------------

_PD_W = 3  # words per chunk — a stand-in "paragraph" for the synthetic corpus


def q_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paragraph-level exact dedup with document reassembly (the
    MassiveText/Gopher line-dedup stage): segment each document into
    fixed-width word chunks, keep only the globally-first occurrence of
    each distinct chunk (first = lowest (doc_id, position)), and stitch
    the survivors back into a deduplicated text per document.

    Scale shape: one shuffle partitioned by the chunk string (its
    fingerprint at real scale) for the first-occurrence window — skew is
    bounded by the duplicate count of the hottest paragraph, which the
    boilerplate-heavy web tail makes large, so a production run would cap
    per-chunk rank fan-in (any rank > 1 is equivalent); then one shuffle
    back on doc_id for reassembly. No per-row Python anywhere.
    Reference analogue: within-page link dedup (D3, WebCrawler.scala) at
    paragraph granularity across the whole corpus."""
    toks = _tokens(_docs_parallel(spark, sf_dir)).filter(F.expr("size(toks) > 0"))
    chunks_lazy = toks.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, cast(ceil(size(toks)/{_PD_W}.0) as int) - 1), "
                f"i -> array_join(slice(toks, i*{_PD_W}+1, {_PD_W}), ' '))"
            )
        ).alias("idx", "chunk"),
    )
    # same one-shot cost control as q_minhash_lsh_candidates: the chunking
    # HOF evaluates interpreted anyway, but whole-stage codegen would
    # Janino-compile the enclosing method (measured ~18 s compile for ~1 s
    # of compute at sf0.1); materialize it codegen-off, keep codegen for
    # the window + reassembly below
    wsc = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try:
        chunks = chunks_lazy.localCheckpoint(eager=True)
    finally:
        spark.conf.set("spark.sql.codegen.wholeStage", wsc)
    w = Window.partitionBy("chunk").orderBy("doc_id", "idx")
    ranked = chunks.withColumn("rnk", F.row_number().over(w))
    return ranked.groupBy("doc_id").agg(
        F.count("*").cast("int").alias("n_chunks"),
        F.sum(F.when(F.col("rnk") == 1, 1).otherwise(0)).cast("int").alias("n_kept"),
        F.array_join(
            F.expr(
                "transform(array_sort(collect_list("
                "case when rnk = 1 then struct(idx, chunk) end)), s -> s.chunk)"
            ),
            " ",
        ).alias("dedup_text"),
    )


SQL_PARAGRAPH_DEDUP = f"""
WITH toks AS (
  SELECT doc_id, {_SQL_TOKS} AS w FROM documents
),
chunks AS (
  SELECT doc_id, CAST(i AS INTEGER) AS idx,
         array_to_string(w[i*{_PD_W}+1 : i*{_PD_W}+{_PD_W}], ' ') AS chunk
  FROM (
    SELECT doc_id, w,
           unnest(range(0, CAST(ceil(len(w)/{_PD_W}.0) AS BIGINT))) AS i
    FROM toks WHERE len(w) > 0
  ) t
),
ranked AS (
  SELECT doc_id, idx, chunk,
         row_number() OVER (PARTITION BY chunk ORDER BY doc_id, idx) AS rnk
  FROM chunks
)
SELECT doc_id,
       CAST(count(*) AS INTEGER) AS n_chunks,
       CAST(count(*) FILTER (WHERE rnk = 1) AS INTEGER) AS n_kept,
       coalesce(string_agg(chunk, ' ' ORDER BY idx) FILTER (WHERE rnk = 1), '')
         AS dedup_text
FROM ranked GROUP BY doc_id
"""


_DSIR_B = 64  # hashed-feature buckets


def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023): hash unigrams into
    {_DSIR_B} buckets, estimate Laplace-smoothed bucket distributions for
    the target slice (lang='en') and the raw corpus, and score every
    document by its token-sum of log(p_target/p_raw) — the importance
    weight used to resample raw web text toward a target domain.

    Scale shape: the two distribution aggregates are map-side-combined
    shuffles over at most {_DSIR_B} keys; the per-bucket log-ratio table
    ({_DSIR_B} rows) broadcasts into the per-doc scoring join, so the
    corpus-sized side never shuffles for the join. The bucket hash uses
    the md5-prefix trick so DuckDB reproduces it bit-for-bit."""
    toks = (
        _tokens(_read(spark, sf_dir, "documents"))
        .select("doc_id", "lang", F.explode("toks").alias("term"))
        .withColumn(
            "b",
            F.expr("cast(conv(substring(md5(term), 1, 4), 16, 10) as bigint)")
            % _DSIR_B,
        )
    )
    per_bucket = toks.groupBy("b").agg(
        F.count("*").alias("rc"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("tc"),
    )
    totals = per_bucket.agg(
        F.sum("rc").alias("rt"), F.sum("tc").alias("tt")
    )
    lr = per_bucket.crossJoin(F.broadcast(totals)).select(
        "b",
        F.round(
            F.log(
                ((F.col("tc") + 1).cast("double") / (F.col("tt") + _DSIR_B).cast("double"))
                / ((F.col("rc") + 1).cast("double") / (F.col("rt") + _DSIR_B).cast("double"))
            ),
            6,
        ).alias("lr"),
    )
    doc_bucket = toks.groupBy("doc_id", "lang", "b").agg(F.count("*").alias("cnt"))
    return (
        doc_bucket.join(F.broadcast(lr), "b")
        .groupBy("doc_id", "lang")
        .agg(
            F.sum("cnt").cast("int").alias("n_toks"),
            # 6 dp, not coarser: the sum is a near-multiple of 1e-6 (counts x
            # 6dp log-ratios), so any coarser rounding sits exactly on
            # half-boundaries where HALF_UP vs binary representation flips
            F.round(F.sum(F.col("cnt") * F.col("lr")), 6).alias("weight"),
        )
    )


SQL_DSIR_WEIGHTS = f"""
WITH toks AS (
  SELECT doc_id, lang,
         ('0x' || substr(md5(term), 1, 4))::BIGINT % {_DSIR_B} AS b
  FROM (SELECT doc_id, lang, unnest({_SQL_TOKS}) AS term FROM documents) t
),
per_bucket AS (
  SELECT b, count(*) AS rc,
         count(*) FILTER (WHERE lang = 'en') AS tc
  FROM toks GROUP BY b
),
totals AS (SELECT sum(rc) AS rt, sum(tc) AS tt FROM per_bucket),
lr AS (
  SELECT b,
         round(ln(((tc + 1)::DOUBLE / (tt + {_DSIR_B})::DOUBLE)
                  / ((rc + 1)::DOUBLE / (rt + {_DSIR_B})::DOUBLE)), 6) AS lr
  FROM per_bucket CROSS JOIN totals
),
doc_bucket AS (
  SELECT doc_id, lang, b, count(*) AS cnt FROM toks GROUP BY doc_id, lang, b
)
SELECT d.doc_id, d.lang,
       CAST(sum(d.cnt) AS INTEGER) AS n_toks,
       round(sum(d.cnt * l.lr), 6) AS weight
FROM doc_bucket d JOIN lr l ON d.b = l.b
GROUP BY d.doc_id, d.lang
"""


_SALT_N = 16


def q_salted_topk_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe heavy-hitter counting: top-20 corpus terms via an explicit
    two-phase salted aggregation — phase 1 counts (term, salt) so the
    hottest term ('the'-class stopwords at web scale) spreads over
    {_SALT_N} reducers, phase 2 merges the per-salt partials, and the
    top-k ships as TakeOrderedAndProject (no global sort).

    At 100 TB a plain groupBy(term) puts the entire count of the hottest
    token through one reducer task; salting bounds any task at
    hottest/{_SALT_N}. The extra shuffle is over the (term, salt)
    partials — tiny, because phase 1's map-side combine already collapsed
    the raw stream. Same pattern as the crawler's salted politeness
    window (F5, crawler.py)."""
    toks = _tokens(_docs_parallel(spark, sf_dir)).select(
        "doc_id", F.explode("toks").alias("term")
    )
    partial = (
        toks.withColumn("salt", (F.col("doc_id") % _SALT_N).cast("int"))
        .groupBy("term", "salt")
        .agg(F.count("*").alias("c"))
    )
    merged = partial.groupBy("term").agg(F.sum("c").alias("cnt"))
    return merged.orderBy(F.desc("cnt"), F.asc("term")).limit(20)


SQL_SALTED_TOPK_TERMS = f"""
SELECT term, count(*) AS cnt
FROM (SELECT unnest({_SQL_TOKS}) AS term FROM documents) t
GROUP BY term
ORDER BY cnt DESC, term ASC
LIMIT 20
"""


_SD_BASE = "2026-03-01 00:00:00"
_SD_URLS = 211  # url-key space; events map onto it with heavy cross-batch overlap


def q_stream_seen_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming URL-seen dedup — the crawler's D1 seen-filter as
    Structured Streaming state: a URL stream arrives in 3 micro-batches
    (maxFilesPerTrigger=1) and `dropDuplicates` on the URL key keeps only
    each key's FIRST occurrence, holding the seen set as keyed state
    across micro-batch boundaries (the same first-wins contract as the
    engine's anti-join seen update, crawler.py:752-786, and the
    bloom/cuckoo prefilters). A 12h watermark bounds state at real scale;
    the event-time grid here never advances past it, so no key is evicted
    before its duplicates arrive and the kept set is exact.

    The oracle replays the contract in closed form: per URL key, the
    surviving row is the one from its minimal micro-batch (src_b carries
    the proof that the batch-1/2 duplicates were dropped by state, not by
    chance)."""
    import tempfile

    ev = _read(spark, sf_dir, "events").select(
        (F.col("event_id") % _SD_URLS).alias("url_id"),
        (F.col("event_id") % 3).cast("int").alias("_b"),
    )
    base = F.unix_timestamp(F.lit(_SD_BASE).cast("timestamp"))
    rows = ev.select(
        "url_id",
        F.col("_b").alias("src_b"),
        (base + F.col("url_id") * 60 + F.col("_b")).cast("timestamp").alias("ts"),
        "_b",
    )
    workdir = tempfile.mkdtemp(prefix="sdstream_")
    rows.repartition(1).write.partitionBy("_b").parquet(f"{workdir}/in")

    stream_in = (
        spark.readStream.schema("url_id long, src_b int, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{workdir}/in/_b=*")
    )
    dedup = (
        stream_in.withWatermark("ts", "12 hours")
        .dropDuplicates(["url_id"])
        .select(
            "url_id",
            "src_b",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("first_ts"),
        )
    )
    qname = "seen_dedup_" + workdir.rsplit("_", 1)[-1]
    q = (
        dedup.writeStream.format("memory")
        .queryName(qname)
        .outputMode("append")
        .option("checkpointLocation", f"{workdir}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(qname)


SQL_STREAM_SEEN_DEDUP = f"""
WITH occ AS (
  SELECT event_id % {_SD_URLS} AS url_id,
         CAST(min(event_id % 3) AS INTEGER) AS src_b
  FROM events GROUP BY event_id % {_SD_URLS}
)
SELECT url_id, src_b,
       strftime(TIMESTAMP '{_SD_BASE}'
                + to_seconds(url_id * 60 + src_b),
                '%Y-%m-%d %H:%M:%S') AS first_ts
FROM occ
"""


_BM25_K1 = 1.2
_BM25_B = 0.75


_RRF_K = 60
_RRF_QUERIES = 5
_RRF_TOPN = 10


def q_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher SIGIR'09):
    fuse two retrieval rankings per query into one list by
    rrf = sum_r 1/(k + rank_r), k={k} — the standard way hybrid search
    (BM25 + dense, or here raw-tf + length-normalized density) merges
    rankings without score calibration. Queries are the corpus's top-{q}
    document-frequency terms (deterministic: df desc, term asc); each
    ranker is an integer row_number, so the fused score is a fixed
    two-term expression of integers — bit-identical across engines —
    and the final top-{n} orders by the ROUNDED score with doc_id
    tie-break.

    Plan: one (doc,term) tf aggregation, a broadcast 5-term query list
    semi-joined into it (posting-list pruning), two per-term ranking
    windows and one final top-n window — all keyed on the query term.
    At web scale each window is one query's posting list; the pruning a
    real engine adds (WAND / impact-ordered truncation before ranking)
    slots in as a per-term pre-top-k, same contract as frontier_topk's
    salted pre-window."""
    tf = (
        _tokens(_read(spark, sf_dir, "documents"))
        .select(
            "doc_id", F.size("toks").alias("dl"), F.explode("toks").alias("term")
        )
        .groupBy("doc_id", "dl", "term")
        .agg(F.count("*").alias("tf"))
    )
    # top-5 by df via TakeOrderedAndProject (distributed partial top-k),
    # never a global row_number window over the whole vocabulary
    queries_df = (
        tf.groupBy("term")
        .agg(F.count("*").alias("df"))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(_RRF_QUERIES)
        .select("term")
    )
    posting = tf.join(F.broadcast(queries_df), "term")
    wa = Window.partitionBy("term").orderBy(F.desc("tf"), F.asc("doc_id"))
    wb = Window.partitionBy("term").orderBy(
        F.desc(F.col("tf") / F.col("dl")), F.asc("doc_id")
    )
    ranked = posting.select(
        F.col("term").alias("query_term"),
        "doc_id",
        F.row_number().over(wa).alias("rank_a"),
        F.row_number().over(wb).alias("rank_b"),
    )
    rrf = F.round(
        1.0 / (_RRF_K + F.col("rank_a")) + 1.0 / (_RRF_K + F.col("rank_b")), 6
    )
    wtop = Window.partitionBy("query_term").orderBy(
        F.desc("rrf"), F.asc("doc_id")
    )
    return (
        ranked.withColumn("rrf", rrf)
        .withColumn("rk", F.row_number().over(wtop))
        .filter(F.col("rk") <= _RRF_TOPN)
        .select(
            "query_term",
            F.col("rk").cast("int").alias("rk"),
            "doc_id",
            F.col("rank_a").cast("int").alias("rank_a"),
            F.col("rank_b").cast("int").alias("rank_b"),
            "rrf",
        )
    )


SQL_RRF_FUSION = f"""
WITH tf AS (
  SELECT doc_id, dl, term, count(*) AS tf
  FROM (SELECT doc_id, len({_SQL_TOKS}) AS dl, unnest({_SQL_TOKS}) AS term
        FROM documents) t
  GROUP BY doc_id, dl, term
),
queries AS (
  SELECT term FROM (SELECT term, count(*) AS df FROM tf GROUP BY term)
  QUALIFY row_number() OVER (ORDER BY df DESC, term ASC) <= {_RRF_QUERIES}
),
ranked AS (
  SELECT term AS query_term, doc_id,
         row_number() OVER (PARTITION BY term
                            ORDER BY tf DESC, doc_id ASC) AS rank_a,
         row_number() OVER (PARTITION BY term
                            ORDER BY tf / dl::DOUBLE DESC, doc_id ASC) AS rank_b
  FROM tf JOIN queries USING (term)
),
fused AS (
  SELECT query_term, doc_id, rank_a, rank_b,
         round(1.0 / ({_RRF_K} + rank_a) + 1.0 / ({_RRF_K} + rank_b), 6) AS rrf
  FROM ranked
)
SELECT query_term,
       row_number() OVER (PARTITION BY query_term
                          ORDER BY rrf DESC, doc_id ASC)::INTEGER AS rk,
       doc_id, rank_a::INTEGER AS rank_a, rank_b::INTEGER AS rank_b, rrf
FROM fused
QUALIFY rk <= {_RRF_TOPN}
"""


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-3 terms per document (Robertson/Sparck-Jones idf,
    k1={_BM25_K1} b={_BM25_B}) — the ranking-grade sibling of
    q_tfidf_topk and the relevance score a focused crawler would use to
    steer toward topic-matching pages (the reference's TargetVector
    priority A3 is the same tf-weighting idea).

    Plan shape matches tfidf_topk: one (doc,term) aggregation, a tiny df
    table and two corpus scalars that broadcast, a per-doc window for the
    top-k. All BM25 inputs are integers, so the double formula evaluates
    bit-identically on both engines; ranking is on the ROUNDED score so
    ln() ulp can't flip the order."""
    tf = (
        _tokens(_read(spark, sf_dir, "documents"))
        .select("doc_id", F.size("toks").alias("dl"), F.explode("toks").alias("term"))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count("*").alias("tf"))
    )
    df_cnt = tf.groupBy("term").agg(F.count("*").alias("df"))
    scalars = tf.groupBy("doc_id").agg(F.first("dl").alias("dl")).agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    denom = F.col("tf") + _BM25_K1 * (
        1.0 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl")
    )
    scored = (
        tf.join(F.broadcast(df_cnt), "term")
        .crossJoin(F.broadcast(scalars))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            F.round(idf * F.col("tf") * (_BM25_K1 + 1.0) / denom, 6).alias("bm25"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("bm25"), F.asc("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "term", "tf", "df", "bm25")
    )


SQL_BM25_TOPK = f"""
WITH tf AS (
  SELECT doc_id, dl, term, count(*) AS tf
  FROM (
    SELECT doc_id, len({_SQL_TOKS}) AS dl, unnest({_SQL_TOKS}) AS term
    FROM documents
  ) t
  GROUP BY doc_id, dl, term
),
dfc AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
sc AS (
  SELECT count(*) AS n_docs, avg(dl) AS avgdl
  FROM (SELECT doc_id, min(dl) AS dl FROM tf GROUP BY doc_id) d
),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, dfc.df,
         round(ln(1.0 + (sc.n_docs - dfc.df + 0.5) / (dfc.df + 0.5))
               * tf.tf * ({_BM25_K1} + 1.0)
               / (tf.tf + {_BM25_K1}
                  * (1.0 - {_BM25_B} + {_BM25_B} * tf.dl / sc.avgdl)), 6)
           AS bm25
  FROM tf JOIN dfc ON tf.term = dfc.term CROSS JOIN sc
)
SELECT doc_id, term, tf, df, bm25
FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY bm25 DESC, term ASC) AS rnk
  FROM scored
) r WHERE rnk <= 3
"""


def q_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift statistic between corpus
    slices (lang='en' vs the rest, over document length) — the
    distribution-shift monitor a continuously-crawling training-data
    pipeline runs between yesterday's corpus and today's before mixing.

    KS = max over values of |F_a(v) - F_b(v)| with empirical CDFs;
    computed as grouped counts + a running-sum window over the value
    order. The ordered window runs single-partition BY DESIGN: it
    operates on the distinct-value histogram (|values| rows, already
    aggregated map-side), never on the corpus — at 100 TB the histogram
    of any bounded metric is still tiny. Counts are integers, so the CDF
    ratios and their max are bit-identical across engines before
    rounding."""
    docs = _read(spark, sf_dir, "documents").select(
        "n_chars", (F.col("lang") == "en").alias("is_a")
    )
    per_v = docs.groupBy("n_chars").agg(
        F.sum(F.when(F.col("is_a"), 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("is_a"), 0).otherwise(1)).alias("cb"),
    )
    tot = per_v.agg(F.sum("ca").alias("na"), F.sum("cb").alias("nb"))
    w = Window.orderBy("n_chars").rowsBetween(Window.unboundedPreceding, 0)
    cdf = per_v.select(
        "n_chars",
        F.sum("ca").over(w).alias("cum_a"),
        F.sum("cb").over(w).alias("cum_b"),
    )
    return (
        cdf.crossJoin(F.broadcast(tot))
        .select(
            (
                F.abs(
                    F.col("cum_a").cast("double") / F.col("na")
                    - F.col("cum_b").cast("double") / F.col("nb")
                )
            ).alias("d"),
            "na",
            "nb",
        )
        .agg(
            F.round(F.max("d"), 6).alias("ks_stat"),
            F.max("na").cast("int").alias("n_a"),
            F.max("nb").cast("int").alias("n_b"),
        )
    )


SQL_KS_DRIFT = """
WITH per_v AS (
  SELECT n_chars,
         count(*) FILTER (WHERE lang = 'en') AS ca,
         count(*) FILTER (WHERE lang <> 'en') AS cb
  FROM documents GROUP BY n_chars
),
tot AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM per_v),
cdf AS (
  SELECT n_chars,
         sum(ca) OVER (ORDER BY n_chars
                       ROWS UNBOUNDED PRECEDING) AS cum_a,
         sum(cb) OVER (ORDER BY n_chars
                       ROWS UNBOUNDED PRECEDING) AS cum_b
  FROM per_v
)
SELECT round(max(abs(cum_a::DOUBLE / na - cum_b::DOUBLE / nb)), 6) AS ks_stat,
       CAST(max(na) AS INTEGER) AS n_a,
       CAST(max(nb) AS INTEGER) AS n_b
FROM cdf CROSS JOIN tot
"""


def q_zipf_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law exponent of the corpus term distribution: OLS slope of
    ln(freq) on ln(rank) — the single-number sanity check that crawled
    text is natural language (alpha approx -1) rather than boilerplate or
    spam floods (much flatter/steeper). Used as a corpus-health gate in
    web-text pipelines.

    Closed-form distributed regression: term counts (one shuffle), ranks
    by a count-ordered window over the term HISTOGRAM (vocabulary-sized,
    not corpus-sized), then slope = covar_pop/var_pop in one aggregate —
    no iterative fitting, no driver collect."""
    counts = (
        _tokens(_read(spark, sf_dir, "documents"))
        .select(F.explode("toks").alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("freq"))
    )
    w = Window.orderBy(F.desc("freq"), F.asc("term"))
    lg = counts.withColumn("rank", F.row_number().over(w)).select(
        F.log(F.col("rank").cast("double")).alias("lr"),
        F.log(F.col("freq").cast("double")).alias("lf"),
    )
    return lg.agg(
        F.round(F.covar_pop("lr", "lf") / F.var_pop("lr"), 6).alias("alpha"),
        F.count("*").cast("int").alias("n_terms"),
    )


SQL_ZIPF_ALPHA = f"""
WITH counts AS (
  SELECT term, count(*) AS freq
  FROM (SELECT unnest({_SQL_TOKS}) AS term FROM documents) t
  GROUP BY term
),
lg AS (
  SELECT ln((row_number() OVER (ORDER BY freq DESC, term ASC))::DOUBLE) AS lr,
         ln(freq::DOUBLE) AS lf
  FROM counts
)
SELECT round(covar_pop(lr, lf) / var_pop(lr), 6) AS alpha,
       CAST(count(*) AS INTEGER) AS n_terms
FROM lg
"""


_SC_N = 3  # shingle width
_SC_THRESH = 0.8


def q_shingle_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided shingle containment (Broder 1997):
    |S(a) ∩ S(b)| / min(|S(a)|, |S(b)|) — containment of the smaller
    document in the larger. Catches partial duplication (quotes, wrapped
    articles, boilerplate inclusion) that symmetric Jaccard misses when
    the containing document is much larger. Pairs are generated by the same shingle-bucket join
    as q_ngram_jaccard_pairs (never all-pairs), then scored by exact
    intersection over the smaller side's shingle count; reported pairs
    have containment >= {_SC_THRESH}.

    Scale notes: candidate generation is the bucket join (hot-shingle cap
    handled as in ngram_jaccard_capped); the intersection count rides the
    same join, no second pass over the corpus."""
    docs = _tokens(_docs_parallel(spark, sf_dir)).filter(
        F.expr(f"size(toks) >= {_SC_N}")
    )
    sh = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                f"array_distinct(transform(sequence(1, size(toks) - {_SC_N - 1}), "
                f"i -> concat_ws(' ', slice(toks, i, {_SC_N}))))"
            )
        ).alias("shingle"),
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    inter = (
        sh.alias("a")
        .join(sh.alias("b"), "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    return (
        inter.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("inter").cast("double") / F.least("na", "nb"), 6
            ).alias("containment"),
        )
        .filter(F.col("containment") >= _SC_THRESH)
    )


SQL_SHINGLE_CONTAINMENT = f"""
WITH sh AS (
  SELECT DISTINCT doc_id, shingle
  FROM (
    SELECT doc_id,
           array_to_string(w[i : i + {_SC_N - 1}], ' ') AS shingle
    FROM (
      SELECT doc_id, w, unnest(range(1, len(w) - {_SC_N - 2})) AS i
      FROM (SELECT doc_id, {_SQL_TOKS} AS w FROM documents) t0
      WHERE len(w) >= {_SC_N}
    ) t1
  ) t2
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT i.doc_a, i.doc_b,
       round(i.inter::DOUBLE / least(sa.n_sh, sb.n_sh), 6) AS containment
FROM inter i
JOIN sizes sa ON i.doc_a = sa.doc_id
JOIN sizes sb ON i.doc_b = sb.doc_id
WHERE i.inter::DOUBLE / least(sa.n_sh, sb.n_sh) >= {_SC_THRESH}
"""


def q_sitemap_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemap ingestion (sitemaps.org XML): build one urlset document per
    host in-engine, then extract (loc, lastmod, priority) with Spark's
    JVM-side xpath functions and explode back to one row per URL — the
    seed-discovery source a production crawler reads alongside WARC
    (q_warc_roundtrip) and robots (q_robots_admission). The oracle is the
    closed form: re-derive the injected fields without XML, so the test
    pins parse(build(x)) == x exactly like the WARC round trip.

    Scale shape: XML assembly is a groupBy(host) string fold; extraction
    is per-row xpath (whole-stage codegen, no Python); the explode is
    map-side. Real sitemaps arrive as one blob per host — exactly this
    dataflow."""
    docs = _read(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(F.lit("h"), (F.col("doc_id") % 10).cast("string")).alias("host"),
        F.concat(
            F.lit("https://h"),
            (F.col("doc_id") % 10).cast("string"),
            F.lit(".example.com/p"),
            F.col("doc_id").cast("string"),
        ).alias("loc"),
        F.concat(
            F.lit("2024-01-"),
            F.lpad((F.col("doc_id") % 28 + 1).cast("string"), 2, "0"),
        ).alias("lastmod"),
        F.concat(F.lit("0."), (F.col("doc_id") % 10).cast("string")).alias("prio"),
    )
    entries = docs.select(
        "host",
        "doc_id",
        F.concat(
            F.lit("<url><loc>"),
            F.col("loc"),
            F.lit("</loc><lastmod>"),
            F.col("lastmod"),
            F.lit("</lastmod><priority>"),
            F.col("prio"),
            F.lit("</priority></url>"),
        ).alias("entry"),
    )
    xml = entries.groupBy("host").agg(
        F.concat(
            F.lit('<?xml version="1.0" encoding="UTF-8"?><urlset>'),
            F.array_join(
                F.expr(
                    "transform(array_sort(collect_list(struct(doc_id, entry))), "
                    "s -> s.entry)"
                ),
                "",
            ),
            F.lit("</urlset>"),
        ).alias("xml")
    )
    parsed = xml.select(
        "host",
        F.expr("xpath(xml, '/urlset/url/loc/text()')").alias("locs"),
        F.expr("xpath(xml, '/urlset/url/lastmod/text()')").alias("mods"),
        F.expr("xpath(xml, '/urlset/url/priority/text()')").alias("prios"),
    )
    z = parsed.select(
        "host", F.explode(F.arrays_zip("locs", "mods", "prios")).alias("z")
    )
    return z.select(
        "host",
        F.col("z.locs").alias("loc"),
        F.col("z.mods").alias("lastmod"),
        F.col("z.prios").cast("double").alias("priority"),
    )


SQL_SITEMAP_EXTRACT = """
SELECT 'h' || (doc_id % 10)::VARCHAR AS host,
       'https://h' || (doc_id % 10)::VARCHAR || '.example.com/p'
         || doc_id::VARCHAR AS loc,
       '2024-01-' || lpad((doc_id % 28 + 1)::VARCHAR, 2, '0') AS lastmod,
       ('0.' || (doc_id % 10)::VARCHAR)::DOUBLE AS priority
FROM documents
"""


def q_warc_revisit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC revisit-record detection (ISO 28500 / IIPC
    'identical-payload-digest' profile): when a refetch returns a
    payload whose digest equals the previous capture, archives store a
    tiny `revisit` record pointing at the original instead of the
    bytes — the storage dedup every real crawl archive (Heritrix,
    Common Crawl) runs. Same fetch-log surface as `recrawl_priority`
    (user_id = URL key, events = fetches, 'click' = content change):
    the payload digest is md5(url_key, running change count), a revisit
    is a fetch whose digest equals LAG(digest), and `refers_to_us`
    carries the referenced capture's timestamp (the WARC Refers-To
    field).

    One window spec serves the running version sum and both LAGs —
    a single shuffle on the URL key, partition size = per-URL fetch
    history (bounded), integer-microsecond time math throughout."""
    ev = _read(spark, sf_dir, "events").select(
        F.col("user_id").alias("url_key"),
        "event_id",
        _us("ts").alias("ts_us"),
        F.when(F.col("event_type") == "click", 1).otherwise(0).alias("chg"),
    )
    w = Window.partitionBy("url_key").orderBy("ts_us", "event_id")
    ver = F.sum("chg").over(w)
    with_digest = ev.select(
        "url_key",
        "event_id",
        "ts_us",
        F.md5(
            F.concat(
                F.col("url_key").cast("string"), F.lit("-"), ver.cast("string")
            )
        ).alias("digest"),
    )
    prev_digest = F.lag("digest").over(w)
    prev_ts = F.lag("ts_us").over(w)
    is_rev = F.coalesce(prev_digest == F.col("digest"), F.lit(False))
    return with_digest.select(
        "url_key",
        "ts_us",
        "digest",
        is_rev.alias("is_revisit"),
        F.when(is_rev, prev_ts).alias("refers_to_us"),
    )


SQL_WARC_REVISIT = """
WITH ev AS (
  SELECT user_id AS url_key, event_id, epoch_us(ts) AS ts_us,
         CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS chg
  FROM events
),
d AS (
  SELECT url_key, event_id, ts_us,
         md5(url_key::VARCHAR || '-' ||
             (sum(chg) OVER (PARTITION BY url_key
                             ORDER BY ts_us, event_id))::VARCHAR) AS digest
  FROM ev
),
r AS (
  SELECT url_key, event_id, ts_us, digest,
         lag(digest) OVER (PARTITION BY url_key
                           ORDER BY ts_us, event_id) AS prev_digest,
         lag(ts_us) OVER (PARTITION BY url_key
                          ORDER BY ts_us, event_id) AS prev_ts
  FROM d
)
SELECT url_key, ts_us, digest,
       coalesce(prev_digest = digest, FALSE) AS is_revisit,
       CASE WHEN coalesce(prev_digest = digest, FALSE)
            THEN prev_ts END AS refers_to_us
FROM r
"""


def q_recrawl_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Freshness-driven recrawl scheduling: per URL (user_id as the URL
    key, events as its fetch log), estimate a Poisson change rate from
    observed changes ('click' events as change-detected fetches) over the
    observation span, then score recrawl priority as the probability the
    page changed since its last fetch: 1 - exp(-lambda * age). This is
    the classic incremental-crawl freshness policy (Cho & Garcia-Molina)
    that would feed the reference's priority queue (F1) when re-fetching
    (S2 re-fetch overwrite path, crawler.py:624-655).

    One shuffle (groupBy url) + a 1-row broadcast of the corpus clock;
    all time math on integer epoch-microseconds so both engines agree
    bit-for-bit before the final exp()."""
    ev = _read(spark, sf_dir, "events").select(
        "user_id",
        _us("ts").alias("ts_us"),
        F.when(F.col("event_type") == "click", 1).otherwise(0).alias("chg"),
    )
    per = ev.groupBy("user_id").agg(
        F.count("*").cast("int").alias("n_fetches"),
        F.sum("chg").cast("int").alias("n_changes"),
        F.min("ts_us").alias("first_us"),
        F.max("ts_us").alias("last_us"),
    )
    now = per.agg(F.max("last_us").alias("now_us"))
    span_h = (F.col("last_us") - F.col("first_us")) / F.lit(3.6e9)
    age_h = (F.col("now_us") - F.col("last_us")) / F.lit(3.6e9)
    lam = F.col("n_changes").cast("double") / F.greatest(span_h, F.lit(1.0))
    return per.crossJoin(F.broadcast(now)).select(
        "user_id",
        "n_fetches",
        "n_changes",
        F.round(age_h, 6).alias("age_hours"),
        F.round(F.lit(1.0) - F.exp(-lam * age_h), 6).alias("priority"),
    )


SQL_RECRAWL_PRIORITY = """
WITH per AS (
  SELECT user_id,
         CAST(count(*) AS INTEGER) AS n_fetches,
         CAST(count(*) FILTER (WHERE event_type = 'click') AS INTEGER)
           AS n_changes,
         min(epoch_us(ts)) AS first_us,
         max(epoch_us(ts)) AS last_us
  FROM events GROUP BY user_id
),
now_t AS (SELECT max(last_us) AS now_us FROM per)
SELECT user_id, n_fetches, n_changes,
       round((now_us - last_us) / 3600000000.0, 6) AS age_hours,
       round(1.0 - exp(-(n_changes::DOUBLE
                         / greatest((last_us - first_us) / 3600000000.0, 1.0))
                       * ((now_us - last_us) / 3600000000.0)), 6) AS priority
FROM per CROSS JOIN now_t
"""


_HITS_ITERS = 2


def q_hits_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs/authorities over the derived host graph (Kleinberg 1999),
    {_HITS_ITERS} iterations with L1 normalization — the hub/authority
    split complements PageRank's single score for crawl steering (a good
    hub page is a frontier goldmine even when its own authority is low;
    the reference's priority propagation NetworkEstimator.scala:101-124
    is the same mutual-reinforcement shape).

    Per iteration: two shuffle joins (edges x hub on src, edges x auth on
    dst) + two groupBy sums + two 1-row normalization aggregates that
    come back broadcast. Ranks localCheckpoint()ed per step to keep every
    plan flat — the same lineage discipline as q_pagerank."""
    edges = _pagerank_edges(spark, sf_dir).localCheckpoint()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    h = nodes.select("node", F.lit(1.0).alias("hub"))
    a = None
    for _ in range(_HITS_ITERS):
        raw_a = (
            edges.join(h, edges.src == h.node)
            .groupBy("dst")
            .agg(F.sum("hub").alias("ra"))
        )
        ar = nodes.join(raw_a, nodes.node == raw_a.dst, "left").select(
            "node", F.coalesce("ra", F.lit(0.0)).alias("ra")
        )
        a = (
            ar.crossJoin(F.broadcast(ar.agg(F.sum("ra").alias("ta"))))
            .select("node", (F.col("ra") / F.col("ta")).alias("auth"))
            .localCheckpoint()
        )
        raw_h = (
            edges.join(a, edges.dst == a.node)
            .groupBy("src")
            .agg(F.sum("auth").alias("rh"))
        )
        hr = nodes.join(raw_h, nodes.node == raw_h.src, "left").select(
            "node", F.coalesce("rh", F.lit(0.0)).alias("rh")
        )
        h = (
            hr.crossJoin(F.broadcast(hr.agg(F.sum("rh").alias("th"))))
            .select("node", (F.col("rh") / F.col("th")).alias("hub"))
            .localCheckpoint()
        )
    return a.join(h, "node").select(
        "node", F.round("auth", 6).alias("auth"), F.round("hub", 6).alias("hub")
    )


def _sql_hits_iter(hub_prev: str, a_cur: str, h_cur: str) -> str:
    return f"""
{a_cur}raw AS (
  SELECT n.node, coalesce(s.ra, 0.0) AS ra
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node, sum(h.hub) AS ra
    FROM edges e JOIN {hub_prev} h ON e.src = h.node GROUP BY e.dst
  ) s ON n.node = s.node
),
{a_cur} AS (
  SELECT node, ra / (SELECT sum(ra) FROM {a_cur}raw) AS auth FROM {a_cur}raw
),
{h_cur}raw AS (
  SELECT n.node, coalesce(s.rh, 0.0) AS rh
  FROM nodes n LEFT JOIN (
    SELECT e.src AS node, sum(a.auth) AS rh
    FROM edges e JOIN {a_cur} a ON e.dst = a.node GROUP BY e.src
  ) s ON n.node = s.node
),
{h_cur} AS (
  SELECT node, rh / (SELECT sum(rh) FROM {h_cur}raw) AS hub FROM {h_cur}raw
)"""


SQL_HITS_SCORES = f"""
WITH edges AS (
  SELECT DISTINCT user_id % {_PR_NODES} AS src,
         ('0x' || substr(md5(event_id::VARCHAR), 1, 4))::BIGINT % {_PR_NODES} AS dst
  FROM events
  WHERE user_id % {_PR_NODES}
        <> ('0x' || substr(md5(event_id::VARCHAR), 1, 4))::BIGINT % {_PR_NODES}
),
nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
h0 AS (SELECT node, 1.0::DOUBLE AS hub FROM nodes),
{_sql_hits_iter('h0', 'a1', 'h1')},
{_sql_hits_iter('h1', 'a2', 'h2')}
SELECT a2.node, round(a2.auth, 6) AS auth, round(h2.hub, 6) AS hub
FROM a2 JOIN h2 ON a2.node = h2.node
"""


# ---------------------------------------------------------------------------
# URL hygiene: canonicalization-keyed dedup and robots longest-match
# admission (the RefinedWeb/CC URL-dedup + RFC 9309 stages)
# ---------------------------------------------------------------------------

# deterministic messy URL synthesized from doc_id — mixed-case scheme/host,
# www prefix, default port, trailing slash, utm_* params, fragment
_URL_EXPR_SPARK = (
    "concat('HTTP', case when doc_id % 2 = 0 then 'S' else '' end, "
    "'://WWW.Site', cast(doc_id % 7 as string), '.COM', "
    "case when doc_id % 3 = 0 then ':443' else '' end, "
    "'/Path/', cast(doc_id % 25 as string), "
    "case when doc_id % 4 = 0 then '/' else '' end, "
    "'?utm_source=feed&ref=', cast(doc_id % 5 as string), "
    "case when doc_id % 6 = 0 then '&utm_campaign=x' else '' end, "
    "case when doc_id % 5 = 0 then '#frag' else '' end)"
)
_URL_EXPR_SQL = (
    "'HTTP' || CASE WHEN doc_id % 2 = 0 THEN 'S' ELSE '' END || "
    "'://WWW.Site' || (doc_id % 7)::VARCHAR || '.COM' || "
    "CASE WHEN doc_id % 3 = 0 THEN ':443' ELSE '' END || "
    "'/Path/' || (doc_id % 25)::VARCHAR || "
    "CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END || "
    "'?utm_source=feed&ref=' || (doc_id % 5)::VARCHAR || "
    "CASE WHEN doc_id % 6 = 0 THEN '&utm_campaign=x' ELSE '' END || "
    "CASE WHEN doc_id % 5 = 0 THEN '#frag' ELSE '' END"
)


def q_url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-canonicalization-keyed dedup (the RefinedWeb/Common-Crawl URL
    dedup stage): canonicalize each document's URL — drop fragment,
    lowercase scheme+host, strip www. and default ports, strip trailing
    slash, drop utm_* tracking params — then keep the best document per
    canonical URL (longest text, tie lowest doc_id).

    All string surgery is built-in regexp/array expressions (JVM-side,
    whole-stage codegen — the crawler's Python kernel normalize
    (kernels/urls.py:40-63, U1) is for the fetch path; bulk recrawl dedup
    stays vectorized). One shuffle on the canonical key. Reference
    analogue: SeedQueue dedup on normalized seeds (WebCrawler.scala
    normalize + D1)."""
    docs = _read(spark, sf_dir, "documents").withColumn(
        "url", F.expr(_URL_EXPR_SPARK)
    )
    base = F.regexp_replace(F.col("url"), "#.*$", "")
    c = (
        docs.withColumn("base", base)
        .withColumn("scheme", F.lower(F.regexp_extract("base", "^([A-Za-z]+)://", 1)))
        .withColumn(
            "host",
            F.regexp_replace(
                F.regexp_replace(
                    F.lower(F.regexp_extract("base", "^[A-Za-z]+://([^/?]+)", 1)),
                    ":(80|443)$",
                    "",
                ),
                "^www\\.",
                "",
            ),
        )
        .withColumn(
            "path",
            F.regexp_replace(
                F.regexp_extract("base", "^[A-Za-z]+://[^/?]+([^?]*)", 1), "/+$", ""
            ),
        )
        .withColumn(
            "params",
            F.expr(
                "filter(split(regexp_extract(base, '\\\\?(.*)$', 1), '&'), "
                "p -> p <> '' and substring(p, 1, 4) <> 'utm_')"
            ),
        )
        .withColumn(
            "canon_url",
            F.concat(
                F.col("scheme"),
                F.lit("://"),
                F.col("host"),
                F.when(F.col("path") == "", "/").otherwise(F.col("path")),
                F.when(
                    F.size("params") > 0,
                    F.concat(F.lit("?"), F.array_join("params", "&")),
                ).otherwise(F.lit("")),
            ),
        )
    )
    w = Window.partitionBy("canon_url").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    return (
        c.withColumn("rnk", F.row_number().over(w))
        .groupBy("canon_url")
        .agg(
            F.min(F.when(F.col("rnk") == 1, F.col("doc_id"))).alias("kept_doc_id"),
            F.count("*").cast("int").alias("n_dups"),
        )
    )


SQL_URL_CANONICAL_DEDUP = f"""
WITH u AS (
  SELECT doc_id, n_chars, {_URL_EXPR_SQL} AS url FROM documents
),
c AS (
  SELECT doc_id, n_chars,
         lower(regexp_extract(base, '^([A-Za-z]+)://', 1)) || '://' ||
         regexp_replace(regexp_replace(
             lower(regexp_extract(base, '^[A-Za-z]+://([^/?]+)', 1)),
             ':(80|443)$', ''), '^www\\.', '') ||
         CASE WHEN p = '' THEN '/' ELSE p END ||
         CASE WHEN len(params) > 0 THEN '?' || array_to_string(params, '&')
              ELSE '' END AS canon_url
  FROM (
    SELECT doc_id, n_chars, base,
           regexp_replace(regexp_extract(base, '^[A-Za-z]+://[^?/]+([^?]*)', 1),
                          '/+$', '') AS p,
           list_filter(string_split(regexp_extract(base, '\\?(.*)$', 1), '&'),
                       x -> x <> '' AND substr(x, 1, 4) <> 'utm_') AS params
    FROM (SELECT doc_id, n_chars, regexp_replace(url, '#.*$', '') AS base FROM u) b
  ) s
),
ranked AS (
  SELECT canon_url, doc_id,
         row_number() OVER (PARTITION BY canon_url
                            ORDER BY n_chars DESC, doc_id ASC) AS rnk
  FROM c
)
SELECT canon_url,
       min(CASE WHEN rnk = 1 THEN doc_id END) AS kept_doc_id,
       CAST(count(*) AS INTEGER) AS n_dups
FROM ranked GROUP BY canon_url
"""


def q_robots_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFC 9309 longest-match robots admission as a set operation: for
    each URL, the most specific matching rule (longest path prefix) wins;
    on a length tie Allow wins; no matching rule means allowed. Rules and
    URL paths are synthesized deterministically per host so both engines
    see the identical rule set.

    Scale shape: the rule table is tiny (robots.txt per host) and
    broadcasts into the URL stream; per-URL the best rule is picked by a
    window keyed on the URL — no global funnel. The streaming fetch path
    uses the real RFC 9309 parser (kernels/robots.py) on fetched
    robots.txt bytes; this operator is the bulk admission filter over an
    already-materialized rule table (F5/robots caps: crawler.py:399-431).
    Reference: politeness/robots gate in WebGet.scala."""
    docs = _read(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(F.lit("h"), (F.col("doc_id") % 10).cast("string")).alias("host"),
        F.concat(
            F.lit("/p/"),
            (F.col("doc_id") % 7).cast("string"),
            F.when(F.col("doc_id") % 3 == 0, "/ok").otherwise(""),
            F.lit("/page"),
            F.col("doc_id").cast("string"),
        ).alias("path"),
    )
    hosts = spark.range(10).select(
        F.concat(F.lit("h"), F.col("id").cast("string")).alias("host"),
        (F.col("id") % 5).cast("string").alias("blocked"),
    )
    rules = hosts.select(
        "host", F.concat(F.lit("/p/"), F.col("blocked")).alias("prefix"),
        F.lit(False).alias("allow"),
    ).union(
        hosts.select(
            "host",
            F.concat(F.lit("/p/"), F.col("blocked"), F.lit("/ok")).alias("prefix"),
            F.lit(True).alias("allow"),
        )
    )
    matches = docs.join(F.broadcast(rules), "host").filter(
        F.expr("startswith(path, prefix)")
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc(F.length("prefix")), F.desc("allow")
    )
    best = (
        matches.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .select("doc_id", F.length("prefix").alias("rule_len"), "allow")
    )
    return docs.join(best, "doc_id", "left").select(
        "doc_id",
        "host",
        "path",
        F.coalesce(F.col("rule_len"), F.lit(0)).cast("int").alias("rule_len"),
        F.coalesce(F.col("allow"), F.lit(True)).alias("allowed"),
    )


SQL_ROBOTS_ADMISSION = """
WITH docs AS (
  SELECT doc_id,
         'h' || (doc_id % 10)::VARCHAR AS host,
         '/p/' || (doc_id % 7)::VARCHAR ||
         CASE WHEN doc_id % 3 = 0 THEN '/ok' ELSE '' END ||
         '/page' || doc_id::VARCHAR AS path
  FROM documents
),
hosts AS (
  SELECT 'h' || i::VARCHAR AS host, (i % 5)::VARCHAR AS blocked
  FROM (SELECT unnest(range(0, 10)) AS i) t
),
rules AS (
  SELECT host, '/p/' || blocked AS prefix, FALSE AS allow FROM hosts
  UNION ALL
  SELECT host, '/p/' || blocked || '/ok' AS prefix, TRUE AS allow FROM hosts
),
best AS (
  SELECT doc_id, len(prefix) AS rule_len, allow
  FROM (
    SELECT d.doc_id, r.prefix, r.allow,
           row_number() OVER (PARTITION BY d.doc_id
                              ORDER BY len(r.prefix) DESC, r.allow DESC) AS rnk
    FROM docs d JOIN rules r
      ON d.host = r.host AND starts_with(d.path, r.prefix)
  ) m WHERE rnk = 1
)
SELECT d.doc_id, d.host, d.path,
       CAST(coalesce(b.rule_len, 0) AS INTEGER) AS rule_len,
       coalesce(b.allow, TRUE) AS allowed
FROM docs d LEFT JOIN best b ON d.doc_id = b.doc_id
"""


# ---------------------------------------------------------------------------
# 7b. round-3 tail: index build, snapshot diff, contrastive mining,
#     domain rollup, kNN graph
# ---------------------------------------------------------------------------

_INVIDX_MIN_DF, _INVIDX_MAX_FRAC = 2, 0.9


def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build: term -> sorted posting list of doc_ids with
    document frequency and total term frequency — the search-index
    construction shuffle (one groupBy(term) after the per-doc tf stage).

    Bounds for web scale: hapax terms (df < min_df) bloat the index with
    single-element postings, and terms present in > max_frac of the
    corpus produce postings the size of the corpus (real builds
    block-compress or elide those). Both are post-aggregate HAVING
    predicates against a broadcast corpus count — the cap costs
    nothing extra and keeps per-term reduce state bounded."""
    tf = (
        _tokens(_read(spark, sf_dir, "documents"))
        .select("doc_id", F.explode("toks").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    n_docs = _read(spark, sf_dir, "documents").agg(
        F.count("*").alias("n_docs")
    )
    return (
        tf.groupBy("term")
        .agg(
            F.count("*").alias("df"),
            F.sum("tf").alias("total_tf"),
            F.sort_array(F.collect_list("doc_id")).alias("postings"),
        )
        .crossJoin(F.broadcast(n_docs))
        .filter(
            (F.col("df") >= _INVIDX_MIN_DF)
            & (F.col("df") <= _INVIDX_MAX_FRAC * F.col("n_docs"))
        )
        .select("term", "df", "total_tf", "postings")
    )


SQL_INVERTED_INDEX = f"""
WITH tf AS (
  SELECT doc_id, term, count(*) AS tf
  FROM (SELECT doc_id, unnest({_SQL_TOKS}) AS term FROM documents) t
  GROUP BY doc_id, term
),
nd AS (SELECT count(*) AS n_docs FROM documents)
SELECT term, count(*) AS df, sum(tf) AS total_tf,
       list(doc_id ORDER BY doc_id) AS postings
FROM tf CROSS JOIN nd GROUP BY term, nd.n_docs
HAVING count(*) >= {_INVIDX_MIN_DF} AND count(*) <= {_INVIDX_MAX_FRAC} * nd.n_docs
"""


def q_crawl_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-recrawl snapshot diff: classify every URL as added /
    removed / changed / same between two corpus snapshots by content
    fingerprint (the Common-Crawl-style monthly-delta job).

    Snapshots are derived deterministically from `documents` so both
    engines see identical inputs: OLD = doc_id % 5 != 4, NEW =
    doc_id % 5 != 0 with every doc_id % 3 == 0 page's text mutated
    (a re-fetch that changed). Plan: two fingerprint map stages + ONE
    full-outer hash join on the key — no global sort, no window; at
    100 TB this is the canonical shuffle-on-primary-key pattern and the
    fingerprint comparison never moves page bodies, only 32-byte md5s."""
    docs = _read(spark, sf_dir, "documents")
    fp = F.md5(F.regexp_replace(F.lower("text"), r"\s+", " "))
    old = docs.filter(F.col("doc_id") % 5 != 4).select(
        "doc_id", fp.alias("old_fp")
    )
    new = docs.filter(F.col("doc_id") % 5 != 0).select(
        "doc_id",
        F.md5(
            F.regexp_replace(
                F.lower(
                    F.when(
                        F.col("doc_id") % 3 == 0,
                        F.concat(F.col("text"), F.lit(" upd")),
                    ).otherwise(F.col("text"))
                ),
                r"\s+",
                " ",
            )
        ).alias("new_fp"),
    )
    joined = old.join(new, "doc_id", "full_outer")
    status = (
        F.when(F.col("old_fp").isNull(), F.lit("added"))
        .when(F.col("new_fp").isNull(), F.lit("removed"))
        .when(F.col("old_fp") != F.col("new_fp"), F.lit("changed"))
        .otherwise(F.lit("same"))
    )
    return joined.select("doc_id", status.alias("status"))


SQL_CRAWL_DELTA = r"""
WITH old AS (
  SELECT doc_id, md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS old_fp
  FROM documents WHERE doc_id % 5 <> 4
),
new AS (
  SELECT doc_id,
         md5(regexp_replace(lower(
           CASE WHEN doc_id % 3 = 0 THEN text || ' upd' ELSE text END
         ), '\s+', ' ', 'g')) AS new_fp
  FROM documents WHERE doc_id % 5 <> 0
)
SELECT coalesce(old.doc_id, new.doc_id) AS doc_id,
       CASE WHEN old.doc_id IS NULL THEN 'added'
            WHEN new.doc_id IS NULL THEN 'removed'
            WHEN old_fp <> new_fp THEN 'changed'
            ELSE 'same' END AS status
FROM old FULL OUTER JOIN new ON old.doc_id = new.doc_id
"""


def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive hard-negative mining: for each query vector (vec_id <
    5) the top-5 most-cosine-similar vectors with a DIFFERENT label —
    the pairs an embedding model most needs to push apart (dense-retriever
    / CLIP training recipe).

    Query side is 5 rows — broadcast into the corpus scan, one pass, one
    per-query top-k window over k*|corpus| scored rows. At 10^9 vectors
    the same plan holds with ann_ivf/ann_hamming replacing the brute
    scan; ranking uses the ROUNDED score so ulp noise cannot flip it."""
    e = _read(spark, sf_dir, "embeddings").withColumn(
        # corpus norm once per row, not once per (row, query) pair
        "na", F.sqrt(F.expr(_dot_expr("embedding", "embedding")))
    )
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"),
        F.col("label").alias("q_label"),
        F.col("embedding").alias("q_emb"),
        F.col("na").alias("nq"),
    )
    dot = F.expr(_dot_expr("embedding", "q_emb"))
    scored = (
        e.join(F.broadcast(q), F.col("label") != F.col("q_label"))
        .select(
            "q_id",
            F.col("vec_id").alias("neg_id"),
            F.round(dot / (F.col("na") * F.col("nq")), 4).alias("cos"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("neg_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select("q_id", "neg_id", "cos", "rnk")
    )


SQL_HARD_NEGATIVES = f"""
WITH q AS (
  SELECT vec_id AS q_id, label AS q_label, embedding AS q_emb
  FROM embeddings WHERE vec_id < 5
),
scored AS (
  SELECT q.q_id, e.vec_id AS neg_id,
         round({_sql_dot('e.embedding', 'q.q_emb')} /
               (sqrt({_sql_dot('e.embedding', 'e.embedding')}) *
                sqrt({_sql_dot('q.q_emb', 'q.q_emb')})), 4) AS cos
  FROM embeddings e JOIN q ON e.label <> q.q_label
)
SELECT q_id, neg_id, cos, rnk
FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, neg_id ASC) AS rnk
  FROM scored
) r WHERE rnk <= 5
"""


def q_domain_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-level corpus-health rollup: per source, document count,
    average length, language spread, exact-dup fraction, average token
    count — the signals a domain-admission policy thresholds on (spam
    farms show high dup_frac + low length; parked domains show tiny
    n_langs). One groupBy(source) over map-side-computed per-doc stats;
    dup_frac reuses the doc fingerprint so no second text pass."""
    docs = _tokens(_read(spark, sf_dir, "documents"))
    per_doc = docs.select(
        "source",
        "lang",
        F.length("text").alias("n_chars_t"),
        F.size("toks").alias("n_toks"),
        F.md5(F.regexp_replace(F.lower("text"), r"\s+", " ")).alias("fp"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("n_chars_t"), 4).alias("avg_chars"),
            F.countDistinct("lang").alias("n_langs"),
            F.round(
                F.lit(1.0)
                - F.countDistinct("fp").cast("double") / F.count("*"),
                6,
            ).alias("dup_frac"),
            F.round(F.avg("n_toks"), 4).alias("avg_toks"),
        )
        .select("source", "n_docs", "avg_chars", "n_langs", "dup_frac", "avg_toks")
    )


SQL_DOMAIN_QUALITY = f"""
WITH per_doc AS (
  SELECT source, lang, length(text) AS n_chars_t,
         len({_SQL_TOKS}) AS n_toks,
         md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS fp
  FROM documents
)
SELECT source, count(*) AS n_docs,
       round(avg(n_chars_t), 4) AS avg_chars,
       count(DISTINCT lang) AS n_langs,
       round(1.0 - count(DISTINCT fp)::DOUBLE / count(*), 6) AS dup_frac,
       round(avg(n_toks), 4) AS avg_toks
FROM per_doc GROUP BY source
"""


def q_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN graph over the embedding space (k=3, cosine), bucketed by
    label — the neighborhood graph that seeds embedding clustering /
    graph-based ANN (HNSW layer-0) / semantic-dup sweeps.

    Candidate generation is the label-bucketed self-join (same bound as
    embedding_neardup: work = Σ bucket², never global n²); at 100 TB the
    bucket key comes from the trained IVF assignment (ann_ivf) instead of
    the stored label. One window per source vector on the rounded score."""
    e = _read(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        "embedding",
        # norm once per row below the self-join (same fold, memoized) —
        # the quadratic pair stage does 1 array fold instead of 3
        F.sqrt(F.expr(_dot_expr("embedding", "embedding"))).alias("nrm"),
    )
    a, b = e.alias("a"), e.alias("b")
    dot = F.expr(_dot_expr("a.embedding", "b.embedding"))
    scored = (
        a.join(b, "label")
        .filter(F.col("a.vec_id") != F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("src"),
            F.col("b.vec_id").alias("dst"),
            F.round(dot / (F.col("a.nrm") * F.col("b.nrm")), 4).alias("cos"),
        )
    )
    w = Window.partitionBy("src").orderBy(F.desc("cos"), F.asc("dst"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("src", "dst", "cos", "rnk")
    )


SQL_KNN_GRAPH = f"""
WITH scored AS (
  SELECT a.vec_id AS src, b.vec_id AS dst,
         round({_sql_dot('a.embedding', 'b.embedding')} /
               (sqrt({_sql_dot('a.embedding', 'a.embedding')}) *
                sqrt({_sql_dot('b.embedding', 'b.embedding')})), 4) AS cos
  FROM embeddings a JOIN embeddings b
    ON a.label = b.label AND a.vec_id <> b.vec_id
)
SELECT src, dst, cos, rnk
FROM (
  SELECT *, row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst ASC) AS rnk
  FROM scored
) r WHERE rnk <= 3
"""


_LPA_ITERS = 4


def q_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synchronous label propagation communities (Raghavan et al. 2007)
    over the 50-node host graph — the cheap community detector a crawl
    scheduler uses to group mutually-linking host clusters (link farms,
    mirror families) before budget allocation; complements pagerank /
    hits / triangles / cc_star on the same graph.

    Deterministic variant: every node starts as its own label; each of
    the 4 synchronized rounds re-labels a node with the most frequent
    neighbor label, ties to the SMALLEST label — no randomness, so both
    engines converge identically. Per round: one shuffle join
    (edges ⋈ labels) + one count aggregate + one per-node argmax window
    over the (node, label) histogram (bounded by degree, never by |V|).
    At web scale each round is the same two-shuffle pipeline with the
    label frame checkpointed — the identical wave shape to pagerank."""
    edges = _pagerank_edges(spark, sf_dir)
    und = (
        edges.union(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .localCheckpoint()
    )
    labels = und.select(F.col("src").alias("node")).distinct().select(
        "node", F.col("node").alias("lab")
    )
    for _ in range(_LPA_ITERS):
        hist = (
            und.join(labels, und.dst == labels.node)
            .groupBy("src", "lab")
            .agg(F.count("*").alias("c"))
        )
        w = Window.partitionBy("src").orderBy(F.desc("c"), F.asc("lab"))
        labels = (
            hist.withColumn("r", F.row_number().over(w))
            .filter(F.col("r") == 1)
            .select(F.col("src").alias("node"), "lab")
            .localCheckpoint()
        )
    return labels.select("node", F.col("lab").alias("community"))


_SQL_LPA_EDGES = f"""
edges AS MATERIALIZED (
  SELECT DISTINCT user_id % {_PR_NODES} AS src,
         ('0x' || substr(md5(event_id::VARCHAR), 1, 4))::BIGINT % {_PR_NODES} AS dst
  FROM events
  WHERE user_id % {_PR_NODES}
        <> ('0x' || substr(md5(event_id::VARCHAR), 1, 4))::BIGINT % {_PR_NODES}
),
und AS MATERIALIZED (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM edges UNION ALL SELECT dst AS src, src AS dst FROM edges
  ) t
)"""


def _sql_lpa_iter(prev: str, cur: str) -> str:
    return f"""
{cur} AS MATERIALIZED (
  SELECT src AS node, lab FROM (
    SELECT h.src, h.lab,
           row_number() OVER (PARTITION BY h.src
                              ORDER BY h.c DESC, h.lab ASC) AS r
    FROM (
      SELECT u.src, p.lab, count(*) AS c
      FROM und u JOIN {prev} p ON u.dst = p.node
      GROUP BY u.src, p.lab
    ) h
  ) t WHERE r = 1
)"""


SQL_LABEL_PROPAGATION = f"""
WITH {_SQL_LPA_EDGES},
l0 AS MATERIALIZED (SELECT DISTINCT src AS node, src AS lab FROM und),
{_sql_lpa_iter('l0', 'l1')},
{_sql_lpa_iter('l1', 'l2')},
{_sql_lpa_iter('l2', 'l3')},
{_sql_lpa_iter('l3', 'l4')}
SELECT node, lab AS community FROM l4
"""


_KCORE_K = 3
_KCORE_PEELS = 8


def q_k_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core decomposition (k={_KCORE_K}, iterative peeling) of the
    host graph — the dense-subgraph backbone a crawl-quality pipeline
    uses to separate well-embedded hosts from peripheral spam leaves
    (peripheral = peeled; core = structurally corroborated).

    {_KCORE_PEELS} unrolled peels: drop nodes with surviving degree <
    k, restrict the edge set to survivors, repeat — past the fixpoint
    every peel is a no-op, so the fixed unroll is exact, and at sf the
    50-node graph converges in 2-3 peels. Per peel: one degree
    aggregate + two semi-joins, each O(|E_alive|); the edge frame is
    checkpointed per peel to keep lineage flat — the same iterative
    discipline as pagerank/label_propagation."""
    edges = _pagerank_edges(spark, sf_dir)
    alive = (
        edges.union(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .localCheckpoint()
    )
    for _ in range(_KCORE_PEELS):
        keep = (
            alive.groupBy("src")
            .agg(F.count("*").alias("deg"))
            .filter(F.col("deg") >= _KCORE_K)
            .select(F.col("src").alias("node"))
        )
        alive = (
            alive.join(keep, alive.src == keep.node, "left_semi")
            .join(keep, alive.dst == keep.node, "left_semi")
            .localCheckpoint()
        )
    return (
        alive.groupBy("src")
        .agg(F.count("*").alias("core_deg"))
        .select(F.col("src").alias("node"), "core_deg")
    )


def _sql_kcore_peel(prev: str, cur: str) -> str:
    return f"""
{cur} AS MATERIALIZED (
  SELECT e.src, e.dst FROM {prev} e
  WHERE e.src IN (SELECT src FROM {prev}
                  GROUP BY src HAVING count(*) >= {_KCORE_K})
    AND e.dst IN (SELECT src FROM {prev}
                  GROUP BY src HAVING count(*) >= {_KCORE_K})
)"""


SQL_K_CORE = f"""
WITH {_SQL_LPA_EDGES},
e0 AS MATERIALIZED (SELECT src, dst FROM und),
{_sql_kcore_peel('e0', 'e1')},
{_sql_kcore_peel('e1', 'e2')},
{_sql_kcore_peel('e2', 'e3')},
{_sql_kcore_peel('e3', 'e4')},
{_sql_kcore_peel('e4', 'e5')},
{_sql_kcore_peel('e5', 'e6')},
{_sql_kcore_peel('e6', 'e7')},
{_sql_kcore_peel('e7', 'e8')}
SELECT src AS node, count(*) AS core_deg FROM e8 GROUP BY src
"""


# DCG position weights 1/log2(rank+1) for ranks 1..10 and their prefix
# sums (ideal-DCG), materialized as decimal literals so BOTH engines use
# bit-identical constants — no runtime log2() whose libm rounding could
# differ between the JVM and DuckDB.
_DCG_W = [round(1.0 / math.log2(r + 1), 10) for r in range(1, 11)]
_IDCG_PREFIX = [round(sum(_DCG_W[: m + 1]), 10) for m in range(10)]
_RETRIEVAL_K = 10


def q_retrieval_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality evaluation harness: Precision@10, MRR@10 and
    NDCG@10 of BM25 two-term conjunctive queries against exact
    containment relevance — the measure-don't-guess loop a search /
    RAG-indexing pipeline reruns after every ranking change (same
    discipline as lsh_eval for dedup and the IVF recall test for ANN).

    Five deterministic queries: document-frequency ranks 11-20 of the
    corpus vocabulary, paired off (rank 11+12 -> qid 0, ...), skipping
    the top-10 near-stopwords. A doc is RELEVANT to a query iff it
    contains BOTH terms; ranking score is the summed per-term BM25 (so
    single-term docs can outrank two-term docs — the metrics measure
    exactly that gap). Plan: the tf/df aggregates of bm25_topk, one
    broadcast join of 10 query terms into the posting lists, a per-qid
    top-10 window, then 5-row metric aggregates. DCG weights are
    injected literal constants (see _DCG_W) so no transcendental is
    evaluated per row in either engine."""
    tf = (
        _tokens(_read(spark, sf_dir, "documents"))
        .select(
            "doc_id", F.size("toks").alias("dl"), F.explode("toks").alias("term")
        )
        .groupBy("doc_id", "dl", "term")
        .agg(F.count("*").alias("tf"))
    )
    df_cnt = tf.groupBy("term").agg(F.count("*").alias("df"))
    wq = Window.orderBy(F.desc("df"), F.asc("term"))
    qterms = (
        df_cnt.withColumn("rnk", F.row_number().over(wq))
        .filter((F.col("rnk") >= 11) & (F.col("rnk") <= 20))
        .select(
            F.floor((F.col("rnk") - 11) / 2).cast("int").alias("qid"),
            "term",
            "df",
        )
    )
    scalars = tf.groupBy("doc_id").agg(F.first("dl").alias("dl")).agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    idf = F.log(
        F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    denom = F.col("tf") + _BM25_K1 * (
        1.0 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl")
    )
    hits = (
        tf.join(F.broadcast(qterms), "term")
        .crossJoin(F.broadcast(scalars))
        .groupBy("qid", "doc_id")
        .agg(
            F.round(
                F.sum(idf * F.col("tf") * (_BM25_K1 + 1.0) / denom), 6
            ).alias("score"),
            F.count("*").alias("n_terms"),
        )
    )
    rel = hits.filter(F.col("n_terms") >= 2).select(
        "qid", "doc_id", F.lit(1).alias("rel")
    )
    nrel = rel.groupBy("qid").agg(F.count("*").alias("n_rel"))
    wr = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc_id"))
    dcg_w = F.array(*[F.lit(v) for v in _DCG_W])
    idcg_p = F.array(*[F.lit(v) for v in _IDCG_PREFIX])
    top = (
        hits.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= _RETRIEVAL_K)
        .join(rel, ["qid", "doc_id"], "left")
        .select(
            "qid",
            "rank",
            F.coalesce("rel", F.lit(0)).alias("rel"),
        )
    )
    per_q = top.groupBy("qid").agg(
        F.round(F.sum("rel") / float(_RETRIEVAL_K), 2).alias("prec_at_10"),
        F.round(
            F.max(F.col("rel") / F.col("rank").cast("double")), 6
        ).alias("mrr"),
        F.sum(
            F.col("rel") * F.element_at(dcg_w, F.col("rank"))
        ).alias("dcg"),
    )
    return (
        per_q.join(nrel, "qid", "left")
        .select(
            "qid",
            F.coalesce("n_rel", F.lit(0)).alias("n_rel"),
            "prec_at_10",
            "mrr",
            F.when(F.coalesce("n_rel", F.lit(0)) == 0, F.lit(0.0))
            .otherwise(
                F.round(
                    F.col("dcg")
                    / F.element_at(
                        idcg_p, F.least(F.col("n_rel"), F.lit(10)).cast("int")
                    ),
                    6,
                )
            )
            .alias("ndcg"),
        )
    )


_SQL_DCG_W = "[" + ", ".join(str(v) for v in _DCG_W) + "]"
_SQL_IDCG_P = "[" + ", ".join(str(v) for v in _IDCG_PREFIX) + "]"

SQL_RETRIEVAL_EVAL = f"""
WITH tf AS MATERIALIZED (
  SELECT doc_id, dl, term, count(*) AS tf
  FROM (
    SELECT doc_id, len({_SQL_TOKS}) AS dl, unnest({_SQL_TOKS}) AS term
    FROM documents
  ) t
  GROUP BY doc_id, dl, term
),
dfc AS MATERIALIZED (SELECT term, count(*) AS df FROM tf GROUP BY term),
qterms AS (
  SELECT ((rnk - 11) // 2)::INT AS qid, term, df
  FROM (
    SELECT term, df, row_number() OVER (ORDER BY df DESC, term ASC) AS rnk
    FROM dfc
  ) r WHERE rnk BETWEEN 11 AND 20
),
sc AS (
  SELECT count(*) AS n_docs, avg(dl) AS avgdl
  FROM (SELECT doc_id, min(dl) AS dl FROM tf GROUP BY doc_id) d
),
hits AS MATERIALIZED (
  SELECT q.qid, tf.doc_id,
         round(sum(ln(1.0 + (sc.n_docs - q.df + 0.5) / (q.df + 0.5))
               * tf.tf * ({_BM25_K1} + 1.0)
               / (tf.tf + {_BM25_K1}
                  * (1.0 - {_BM25_B} + {_BM25_B} * tf.dl / sc.avgdl))), 6)
           AS score,
         count(*) AS n_terms
  FROM tf JOIN qterms q ON tf.term = q.term CROSS JOIN sc
  GROUP BY q.qid, tf.doc_id
),
rel AS (SELECT qid, doc_id, 1 AS rel FROM hits WHERE n_terms >= 2),
nrel AS (SELECT qid, count(*) AS n_rel FROM rel GROUP BY qid),
top AS (
  SELECT h.qid, h.rank, coalesce(r.rel, 0) AS rel
  FROM (
    SELECT qid, doc_id, score,
           row_number() OVER (PARTITION BY qid
                              ORDER BY score DESC, doc_id ASC) AS rank
    FROM hits
  ) h LEFT JOIN rel r ON h.qid = r.qid AND h.doc_id = r.doc_id
  WHERE h.rank <= {_RETRIEVAL_K}
),
per_q AS (
  SELECT qid,
         round(sum(rel) / {float(_RETRIEVAL_K)}, 2) AS prec_at_10,
         round(max(rel / rank::DOUBLE), 6) AS mrr,
         sum(rel * ({_SQL_DCG_W})[rank]) AS dcg
  FROM top GROUP BY qid
)
SELECT p.qid AS qid, coalesce(n.n_rel, 0) AS n_rel, p.prec_at_10, p.mrr,
       CASE WHEN coalesce(n.n_rel, 0) = 0 THEN 0.0
            ELSE round(p.dcg / ({_SQL_IDCG_P})[least(n.n_rel, 10)::INT], 6)
       END AS ndcg
FROM per_q p LEFT JOIN nrel n ON p.qid = n.qid
"""


def q_lsh_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-quality measurement for the MinHash LSH path: confusion
    counts + precision/recall of `minhash_lsh_candidates` against the
    EXACT Jaccard>=0.5 pair set (`ngram_jaccard_pairs` — complete ground
    truth, since J>=0.5 pairs always share a shingle and therefore always
    surface in the shingle-bucket join).

    This is the "measure, don't guess" harness a production dedup run
    re-executes on a sampled slice after every banding-parameter change:
    b x r controls the S-curve, and this op turns it into observed
    tp/fp/fn. One full-outer join of two already-bounded pair sets."""
    truth = q_ngram_jaccard_pairs(spark, sf_dir).select(
        "a_id", "b_id", F.lit(1).alias("t")
    )
    cand = q_minhash_lsh_candidates(spark, sf_dir).select(
        "a_id", "b_id", F.lit(1).alias("c")
    )
    j = truth.join(cand, ["a_id", "b_id"], "full_outer")
    agg = j.agg(
        F.sum(
            F.when(F.col("t").isNotNull() & F.col("c").isNotNull(), 1).otherwise(0)
        ).alias("tp"),
        F.sum(
            F.when(F.col("t").isNull() & F.col("c").isNotNull(), 1).otherwise(0)
        ).alias("fp"),
        F.sum(
            F.when(F.col("t").isNotNull() & F.col("c").isNull(), 1).otherwise(0)
        ).alias("fn"),
    )
    return agg.select(
        "tp",
        "fp",
        "fn",
        F.round(F.col("tp") / (F.col("tp") + F.col("fp")), 4).alias("precision"),
        F.round(F.col("tp") / (F.col("tp") + F.col("fn")), 4).alias("recall"),
    )


SQL_LSH_EVAL = f"""
WITH truth AS (
  SELECT a_id, b_id FROM ({SQL_NGRAM_JACCARD_PAIRS}) t
),
cand AS ({SQL_MINHASH_LSH_CANDIDATES}),
conf AS (
  SELECT
    sum(CASE WHEN truth.a_id IS NOT NULL AND cand.a_id IS NOT NULL THEN 1 ELSE 0 END) AS tp,
    sum(CASE WHEN truth.a_id IS NULL AND cand.a_id IS NOT NULL THEN 1 ELSE 0 END) AS fp,
    sum(CASE WHEN truth.a_id IS NOT NULL AND cand.a_id IS NULL THEN 1 ELSE 0 END) AS fn
  FROM truth FULL OUTER JOIN cand
    ON truth.a_id = cand.a_id AND truth.b_id = cand.b_id
)
SELECT tp, fp, fn,
       round(tp / (tp + fp), 4) AS precision,
       round(tp / (tp + fn), 4) AS recall
FROM conf
"""


_CMS_D, _CMS_W = 4, 32


def q_countmin_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch build over the term-frequency stream (Cormode &
    Muthukrishnan): d=4 salted hash rows x w=32 buckets; counter(r,b) =
    sum of counts of terms hashing to that cell; point estimate of any
    term = min over rows (upper-biased by collisions only).

    Integer-exact on both engines (md5-derived buckets), so the sketch
    table itself is oracled — not just its estimates. At 100 TB this is
    the fixed-memory (d*w counters) alternative to the exact term
    histogram: one explode + one groupBy whose reduce state is bounded
    by d*w regardless of vocabulary size."""
    tf = (
        _tokens(_read(spark, sf_dir, "documents"))
        .select(F.explode("toks").alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("c"))
    )
    cells = tf.select(
        F.explode(F.sequence(F.lit(0), F.lit(_CMS_D - 1))).alias("r"),
        "term",
        "c",
    ).withColumn(
        "b",
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("r").cast("string"), F.lit(":"), F.col("term"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % _CMS_W,
    )
    return (
        cells.groupBy("r", "b")
        .agg(F.sum("c").alias("counter"))
        .select("r", "b", "counter")
    )


SQL_COUNTMIN_SKETCH = f"""
WITH tf AS (
  SELECT term, count(*) AS c
  FROM (SELECT unnest({_SQL_TOKS}) AS term FROM documents) t
  GROUP BY term
),
cells AS (
  SELECT r, term, c,
         ('0x' || substr(md5(r::VARCHAR || ':' || term), 1, 8))::BIGINT % {_CMS_W} AS b
  FROM tf, (SELECT unnest(range({_CMS_D})) AS r) rs
)
SELECT r, b, sum(c) AS counter FROM cells GROUP BY r, b
"""


_HLL_P = 8  # 256 registers; standard error 1.04/sqrt(256) = 6.5%


def q_hll_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog register build per language over the corpus's distinct
    3-gram shingles (Flajolet et al.): 60-bit md5-derived hash, top 8
    bits pick the register, rho = leading-zero rank of the low 52 bits.
    The registers — max rho per (lang, bucket) — are integer-exact on
    both engines, so the sketch STATE is oracled; the cardinality
    estimate derived from it is pinned by tests/test_sketches.py
    against the exact distinct count.

    The scale story is the merge property: registers from any partition
    of the corpus combine with max(), which is exactly this groupBy —
    the distributed approx-distinct plan (and what approx_count_distinct
    does JVM-side; this op is the observable, engine-portable build)."""
    docs = _tokens(_docs_parallel(spark, sf_dir)).filter(
        F.expr("size(toks) >= 3")
    )
    sh = docs.select(
        "lang",
        F.explode(
            F.expr(
                "array_distinct(transform(sequence(1, size(toks) - 2), i -> "
                "concat_ws(' ', element_at(toks, i), element_at(toks, i+1), element_at(toks, i+2))))"
            )
        ).alias("shingle"),
    ).distinct()
    hashed = sh.withColumn(
        "hv", F.conv(F.substring(F.md5("shingle"), 1, 15), 16, 10).cast("long")
    )
    lowbits = 60 - _HLL_P
    reg = hashed.select(
        "lang",
        F.shiftright("hv", lowbits).alias("bucket"),
        F.col("hv").bitwiseAND(F.lit((1 << lowbits) - 1)).alias("w"),
    ).withColumn(
        "rho",
        F.when(F.col("w") == 0, F.lit(lowbits + 1)).otherwise(
            F.lit(lowbits) - F.length(F.bin("w")) + 1
        ),
    )
    return (
        reg.groupBy("lang", "bucket")
        .agg(F.max("rho").alias("rho"))
        .select("lang", "bucket", "rho")
    )


SQL_HLL_REGISTERS = f"""
WITH toksT AS (
  SELECT lang, {_SQL_TOKS} AS toks FROM documents
),
sh AS (
  SELECT DISTINCT lang, unnest(list_transform(range(len(toks) - 2),
    i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])) AS shingle
  FROM toksT WHERE len(toks) >= 3
),
hashed AS (
  SELECT lang, ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS hv FROM sh
),
reg AS (
  SELECT lang, hv >> {60 - _HLL_P} AS bucket,
         hv & {(1 << (60 - _HLL_P)) - 1} AS w
  FROM hashed
)
SELECT lang, bucket,
       max(CASE WHEN w = 0 THEN {60 - _HLL_P + 1}
                ELSE {60 - _HLL_P} - length(bin(w)::VARCHAR) + 1 END) AS rho
FROM reg GROUP BY lang, bucket
"""


def q_surt_cdx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDX index-record build with SURT keys — the Common-Crawl lookup
    index over a crawl's captures (cdx-toolkit / pywb convention: host
    reversed and comma-joined so one URL-range scan covers a domain
    subtree). URLs are synthesized deterministically per doc so both
    engines index identical captures; digest is the content fingerprint.

    All JVM-side string/array builtins (split, reverse, array_join) —
    one map stage, no shuffle; the downstream sort-by-surt is the
    write-time ordering of the real index (sortWithinPartitions on a
    range-partitioned write), not part of the build."""
    docs = _read(spark, sf_dir, "documents")
    host = F.concat(
        F.lit("www.h"), (F.col("doc_id") % 10).cast("string"), F.lit(".example.com")
    )
    path = F.concat(F.lit("/p/"), F.col("doc_id").cast("string"))
    bare = F.regexp_replace(host, r"^www\.", "")
    surt = F.concat(
        F.array_join(F.reverse(F.split(bare, r"\.")), ","),
        F.lit(")"),
        path,
    )
    return docs.select(
        "doc_id",
        surt.alias("surt"),
        F.concat(F.lit("http://"), host, path).alias("url"),
        (F.lit(20260101000000) + F.col("doc_id")).alias("ts"),
        F.md5(F.regexp_replace(F.lower("text"), r"\s+", " ")).alias("digest"),
    )


SQL_SURT_CDX = r"""
WITH u AS (
  SELECT doc_id,
         'www.h' || (doc_id % 10)::VARCHAR || '.example.com' AS host,
         '/p/' || doc_id::VARCHAR AS path,
         md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS digest
  FROM documents
)
SELECT doc_id,
       array_to_string(list_reverse(string_split(regexp_replace(host, '^www\.', ''), '.')), ',')
         || ')' || path AS surt,
       'http://' || host || path AS url,
       20260101000000 + doc_id AS ts,
       digest
FROM u
"""


_ANCHOR_TOP_K = 5


def q_anchor_text_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inlink anchor-text aggregation — the classic web-search relevance
    signal (and this reference's link-priority input, LinkContext):
    collect the anchor terms pointing AT each page, keep the top-k terms
    per target by count.

    The link graph is synthesized deterministically (two outlinks per
    doc, one colliding map) so both engines aggregate identical edges;
    anchors = the source doc's first 3 tokens. The top-k window is the
    skew control: popular targets (10^6 inlinks on the real web) would
    otherwise build unbounded collect_list state — here per-target state
    is capped at k terms after a count-agg whose reduce state is
    (target, term) paired counts."""
    docs = _tokens(_read(spark, sf_dir, "documents"))
    n = docs.count()
    src = docs.select(
        F.col("doc_id").alias("src"),
        F.slice("toks", 1, 3).alias("anchor_toks"),
    )
    edges = src.select(
        "src", "anchor_toks", ((F.col("src") * 7 + 3) % n).alias("dst")
    ).union(
        src.select(
            "src", "anchor_toks", (F.floor(F.col("src") / 3) % n).alias("dst")
        )
    )
    counts = (
        edges.select("dst", F.explode("anchor_toks").alias("term"))
        .groupBy("dst", "term")
        .agg(F.count("*").alias("c"))
    )
    w = Window.partitionBy("dst").orderBy(F.desc("c"), F.asc("term"))
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _ANCHOR_TOP_K)
        .select("dst", "term", "c", "rnk")
    )


SQL_ANCHOR_TEXT_AGG = f"""
WITH nd AS (SELECT count(*) AS n FROM documents),
src AS (
  SELECT doc_id AS src, ({_SQL_TOKS})[1:3] AS anchor_toks FROM documents
),
edges AS (
  SELECT src, anchor_toks, (src * 7 + 3) % nd.n AS dst FROM src, nd
  UNION ALL
  SELECT src, anchor_toks, (src // 3) % nd.n AS dst FROM src, nd
),
counts AS (
  SELECT dst, term, count(*) AS c
  FROM (SELECT dst, unnest(anchor_toks) AS term FROM edges) t
  GROUP BY dst, term
)
SELECT dst, term, c, rnk
FROM (
  SELECT *, row_number() OVER (PARTITION BY dst ORDER BY c DESC, term ASC) AS rnk
  FROM counts
) r WHERE rnk <= {_ANCHOR_TOP_K}
"""


_BUDGET_TOTAL = 1000


def q_budget_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Proportional-fair per-host crawl-budget allocation by the
    largest-remainder method: host weight = sqrt(frontier size) (the
    sublinear politeness-friendly allocation — a host with 100x the
    frontier gets 10x the budget), quotas floor()ed, and the leftover
    slots handed out by largest fractional part with deterministic ties.

    Hosts are the events.user_id stream (varied sizes). The global stage
    runs over ONE ROW PER HOST — after the groupBy the data is 10^5-ish
    rows at web scale, so the two windows here (remainder rank) are
    cheap; nothing host-level ever sorts the frontier itself. sqrt is
    rounded before ranking so engine ulp differences cannot flip ranks."""
    ev = _read(spark, sf_dir, "events")
    hosts = ev.groupBy(F.col("user_id").alias("host")).agg(
        F.count("*").alias("n_urls")
    )
    wsum = hosts.agg(
        F.sum(F.round(F.sqrt("n_urls"), 6)).alias("wsum")
    )
    quota = hosts.crossJoin(F.broadcast(wsum)).select(
        "host",
        "n_urls",
        F.round(
            F.lit(_BUDGET_TOTAL) * F.round(F.sqrt("n_urls"), 6) / F.col("wsum"), 6
        ).alias("quota"),
    )
    base = quota.withColumn("base", F.floor("quota")).withColumn(
        "frac", F.round(F.col("quota") - F.col("base"), 6)
    )
    leftover = F.lit(_BUDGET_TOTAL) - F.sum("base").over(
        Window.partitionBy(F.lit(1))
    )
    w = Window.partitionBy(F.lit(1)).orderBy(F.desc("frac"), F.asc("host"))
    return (
        base.withColumn("rnk", F.row_number().over(w))
        .withColumn(
            "budget",
            (F.col("base") + F.when(F.col("rnk") <= leftover, 1).otherwise(0)).cast(
                "long"
            ),
        )
        .select("host", "n_urls", "budget")
    )


SQL_BUDGET_ALLOCATION = f"""
WITH hosts AS (
  SELECT user_id AS host, count(*) AS n_urls FROM events GROUP BY user_id
),
quota AS (
  SELECT host, n_urls,
         round({_BUDGET_TOTAL} * round(sqrt(n_urls), 6) /
               (SELECT sum(round(sqrt(n_urls), 6)) FROM hosts), 6) AS quota
  FROM hosts
),
base AS (
  SELECT host, n_urls, floor(quota) AS base, round(quota - floor(quota), 6) AS frac
  FROM quota
),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY frac DESC, host ASC) AS rnk,
         (SELECT {_BUDGET_TOTAL} - sum(base) FROM base) AS leftover
  FROM base
)
SELECT host, n_urls,
       CAST(base + CASE WHEN rnk <= leftover THEN 1 ELSE 0 END AS BIGINT) AS budget
FROM ranked
"""


def connected_components_star(
    edges: DataFrame, max_rounds: int = 25, rounds_out: list | None = None
) -> DataFrame:
    """Connected components by alternating large-star/small-star
    contraction (Kiveris et al., "Connected Components in MapReduce and
    Beyond", SoCC 2014): converges in O(log^2 n) rounds on ANY graph —
    the deep-chain scale path where min-label propagation
    (`connected_components`) needs O(diameter) rounds and a 10^6-link
    comment chain would never finish.

    large-star hangs every bigger-id neighbor of u onto min(N(u) ∪ u);
    small-star re-points every smaller-id neighbor (and u) at the local
    min. Fixpoint = a star forest: each node holds one edge to its
    component minimum. Each round is two groupBy shuffles + two hash
    joins over the CURRENT edge set (which only shrinks); convergence is
    detected by an (count, xxhash64-sum) edge-set checksum, and
    localCheckpoint truncates lineage per round so the plan never grows.
    Same contract as `connected_components`: input (a_id, b_id) pairs,
    output (doc_id, rep) over nodes appearing in edges."""
    e = (
        edges.select(
            F.greatest(F.col("a_id"), F.col("b_id")).cast("long").alias("u"),
            F.least(F.col("a_id"), F.col("b_id")).cast("long").alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )

    def checksum(df: DataFrame) -> tuple:
        row = df.agg(
            F.count("*").alias("n"),
            # pmod keeps each addend in [0, 2^31) so the 64-bit sum can't
            # overflow under ANSI until ~4e9 edges
            F.coalesce(
                F.sum(F.pmod(F.xxhash64("u", "v"), F.lit(2**31 - 1))), F.lit(0)
            ).alias("h"),
        ).collect()[0]
        return (row.n, row.h)

    prev = checksum(e)
    rounds = 0
    for _ in range(max_rounds):
        rounds += 1
        # large-star: every neighbor v > u re-points at min(N(u) ∪ {u})
        s = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mstar = s.groupBy("u").agg(
            F.least(F.first("u"), F.min("v")).alias("m")
        )
        e = (
            s.join(mstar, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        # small-star: edges are now directed u > v; every smaller
        # neighbor (and u itself) re-points at the local min
        mn2 = e.groupBy("u").agg(F.min("v").alias("m"))
        e = (
            e.join(mn2, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .union(mn2.select("u", F.col("m").alias("v")))
            .distinct()
            .localCheckpoint()
        )
        cur = checksum(e)
        if cur == prev:
            break
        prev = cur
    if rounds_out is not None:
        rounds_out.append(rounds)
    # star forest -> labels: members point at their root; roots (only
    # ever on the v side) label themselves. Defensive min() in case the
    # caller handed max_rounds too small for full convergence.
    members = e.groupBy("u").agg(F.min("v").alias("rep")).select(
        F.col("u").alias("doc_id"), "rep"
    )
    roots = (
        e.select(F.col("v").alias("doc_id"))
        .distinct()
        .join(e.select(F.col("u").alias("doc_id")).distinct(), "doc_id", "left_anti")
        .select("doc_id", F.col("doc_id").alias("rep"))
    )
    return members.union(roots)


def q_cc_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup component resolution via large-star/small-star — identical
    semantics to `dedup_components` (same ngram pair input, same
    recursive-CTE oracle) but the O(log^2 n)-round contraction instead of
    O(diameter) label propagation: the algorithm you run when components
    can be chains (forum quote-trains, template lineages), not just
    near-clique dup clusters."""
    pairs = ngram_jaccard(_docs_parallel(spark, sf_dir)).select("a_id", "b_id")
    comps = connected_components_star(pairs)
    docs = _read(spark, sf_dir, "documents").select("doc_id")
    return docs.join(comps, "doc_id", "left").select(
        "doc_id", F.coalesce("rep", F.col("doc_id")).alias("rep")
    )


SQL_CC_STAR = SQL_DEDUP_COMPONENTS


_CHUNK_SIZE, _CHUNK_OVERLAP = 64, 16
_CHUNK_STEP = _CHUNK_SIZE - _CHUNK_OVERLAP


def q_doc_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking with overlap — the
    context-window prep step for long documents (RAG indexing / training
    on >ctx docs): 64-token chunks, 16-token overlap, so no boundary
    sentence is ever lost to a hard split. Complements `sequence_pack`
    (which packs SHORT docs together; this splits LONG ones).

    Chunk count is the closed form ceil((n - overlap)/step) (min 1), so
    the whole op is one explode(sequence) + map-side array slice —
    embarrassingly parallel, zero shuffle; chunk text ships as its
    fingerprint so the wide column never leaves the map stage."""
    docs = _tokens(_read(spark, sf_dir, "documents")).select(
        "doc_id", "toks", F.size("toks").alias("n")
    )
    n_chunks = F.greatest(
        F.lit(1),
        F.ceil((F.col("n") - F.lit(_CHUNK_OVERLAP)) / F.lit(_CHUNK_STEP)),
    )
    chunks = docs.select(
        "doc_id",
        "toks",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("k"),
    ).select(
        "doc_id",
        "k",
        F.slice(
            "toks", F.col("k") * _CHUNK_STEP + 1, _CHUNK_SIZE
        ).alias("chunk_toks"),
    )
    return chunks.select(
        "doc_id",
        F.col("k").alias("chunk_id"),
        F.size("chunk_toks").alias("n_toks"),
        F.md5(F.array_join("chunk_toks", " ")).alias("chunk_fp"),
    )


SQL_DOC_CHUNK_OVERLAP = f"""
WITH toksT AS (
  SELECT doc_id, {_SQL_TOKS} AS toks, len({_SQL_TOKS}) AS n FROM documents
),
chunks AS (
  SELECT doc_id, unnest(range(greatest(1,
           CAST(ceil((n - {_CHUNK_OVERLAP}) / {_CHUNK_STEP}.0) AS BIGINT)))) AS k,
         toks
  FROM toksT
)
SELECT doc_id, k AS chunk_id,
       len(toks[k * {_CHUNK_STEP} + 1 : k * {_CHUNK_STEP} + {_CHUNK_SIZE}]) AS n_toks,
       md5(array_to_string(toks[k * {_CHUNK_STEP} + 1 : k * {_CHUNK_STEP} + {_CHUNK_SIZE}], ' ')) AS chunk_fp
FROM chunks
"""


def q_url_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frontier URL feature extraction — the spam/quality heuristics a
    crawl scheduler scores before ever fetching (path depth, digit ratio
    in the host, query-param count, URL length, trap-pattern flag for
    calendar/session-id paths). URLs are synthesized deterministically
    per doc (same generator family as surt_cdx, plus adversarial
    segments on a doc_id stride) so both engines featurize identical
    strings. Pure map stage, zero shuffle, all JVM-side regex/string
    builtins — at 10^10 URLs this runs at scan speed."""
    docs = _read(spark, sf_dir, "documents").select("doc_id")
    url = F.concat(
        F.lit("http://h"),
        (F.col("doc_id") % 97).cast("string"),
        F.lit("x"),
        (F.col("doc_id") % 10).cast("string"),
        F.lit(".example.com/"),
        # deeper paths on a stride; calendar-trap segment on another
        F.when(F.col("doc_id") % 4 == 0, F.lit("a/b/c/d/")).otherwise(F.lit("p/")),
        F.when(
            F.col("doc_id") % 5 == 0, F.lit("calendar/2026/01/")
        ).otherwise(F.lit("")),
        F.col("doc_id").cast("string"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.lit("?sid=" ), F.md5(F.col("doc_id").cast("string"))),
        ).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 6 == 0, F.lit("&utm_source=x")).otherwise(
            F.lit("")
        ),
    )
    u = docs.select("doc_id", url.alias("url"))
    host = F.regexp_extract("url", r"^http://([^/]+)/", 1)
    path = F.regexp_extract("url", r"^http://[^/]+(/[^?]*)", 1)
    query = F.regexp_extract("url", r"\?(.*)$", 1)
    return u.select(
        "doc_id",
        "url",
        F.length("url").alias("url_len"),
        (F.size(F.split(path, "/")) - 2).alias("path_depth"),
        F.round(
            F.length(F.regexp_replace(host, r"[^0-9]", ""))
            / F.length(host),
            4,
        ).alias("host_digit_ratio"),
        F.when(query == "", 0)
        .otherwise(F.size(F.split(query, "&")))
        .alias("n_params"),
        path.rlike(r"/(calendar|sessionid|sid)/|/\d{4}/\d{2}/").alias(
            "trap_flag"
        ),
    )


SQL_URL_FEATURES = r"""
WITH u AS (
  SELECT doc_id,
         'http://h' || (doc_id % 97)::VARCHAR || 'x' || (doc_id % 10)::VARCHAR
         || '.example.com/'
         || CASE WHEN doc_id % 4 = 0 THEN 'a/b/c/d/' ELSE 'p/' END
         || CASE WHEN doc_id % 5 = 0 THEN 'calendar/2026/01/' ELSE '' END
         || doc_id::VARCHAR
         || CASE WHEN doc_id % 3 = 0 THEN '?sid=' || md5(doc_id::VARCHAR) ELSE '' END
         || CASE WHEN doc_id % 6 = 0 THEN '&utm_source=x' ELSE '' END AS url
  FROM documents
),
parts AS (
  SELECT doc_id, url,
         regexp_extract(url, '^http://([^/]+)/', 1) AS host,
         regexp_extract(url, '^http://[^/]+(/[^?]*)', 1) AS path,
         regexp_extract(url, '\?(.*)$', 1) AS query
  FROM u
)
SELECT doc_id, url,
       length(url) AS url_len,
       len(string_split(path, '/')) - 2 AS path_depth,
       round(length(regexp_replace(host, '[^0-9]', '', 'g'))::DOUBLE / length(host), 4)
         AS host_digit_ratio,
       CASE WHEN query = '' THEN 0 ELSE len(string_split(query, '&')) END AS n_params,
       regexp_matches(path, '/(calendar|sessionid|sid)/|/\d{4}/\d{2}/') AS trap_flag
FROM parts
"""


def q_url_param_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-normalization rule mining (Dasgupta et al. WWW'08 'de-duping
    URLs via rewrite rules'): learn which query parameters are
    content-IRRELEVANT by checking whether, within each base URL,
    varying the parameter's value leaves the content fingerprint
    unchanged. A crawler that learns `sid` is irrelevant canonicalizes
    it away and stops re-fetching session-id aliases — the rule-mining
    upstream of `url_canonical_dedup`'s fixed rule list.

    Deterministic synthesis: each doc carries one URL on a shared base
    (25 bases); even doc_ids append a session-id param (value unique
    per doc, content fp = fp(base) — irrelevant), odd doc_ids append a
    page param (content fp = fp(base, value) — relevant). Mining is two
    aggregations: per (param, base) count distinct values vs distinct
    fps (>=2 values required for evidence), then per param: the rule
    fires when EVERY evidenced base collapses to one fingerprint.
    Partial-agg shuffles only, keyed on (param, base) then param —
    at 10^10 URLs both keys are low-cardinality-per-group and the
    distinct counts swap to HLL sketches (`hll_registers` contract)."""
    docs = _read(spark, sf_dir, "documents").select("doc_id")
    base = F.concat(
        F.lit("http://h"),
        (F.col("doc_id") % 5).cast("string"),
        F.lit(".example.com/p"),
        (F.col("doc_id") % 25).cast("string"),
    )
    is_sid = F.col("doc_id") % 2 == 0
    param = F.when(is_sid, F.lit("sid")).otherwise(F.lit("page"))
    # page value must VARY within a base (doc_id//25 strides across the
    # base's docs; doc_id%5 would be constant per base since 25 = 5*5)
    value = F.when(
        is_sid, F.md5(F.col("doc_id").cast("string"))
    ).otherwise((F.floor(F.col("doc_id") / 25) % 5).cast("string"))
    fp = F.when(is_sid, F.md5(base)).otherwise(
        F.md5(F.concat(base, F.lit("?page="), value))
    )
    urls = docs.select(
        base.alias("base"), param.alias("param"), value.alias("value"), fp.alias("fp")
    )
    per_base = (
        urls.groupBy("param", "base")
        .agg(
            F.countDistinct("value").alias("nv"),
            F.countDistinct("fp").alias("nf"),
        )
        .filter(F.col("nv") >= 2)
    )
    return (
        per_base.groupBy("param")
        .agg(
            F.count("*").alias("n_bases"),
            F.sum(F.when(F.col("nf") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_collapsed"),
        )
        .withColumn(
            "irrelevant", F.col("n_collapsed") == F.col("n_bases")
        )
    )


SQL_URL_PARAM_RULES = """
WITH urls AS (
  SELECT
    'http://h' || (doc_id % 5)::VARCHAR || '.example.com/p'
      || (doc_id % 25)::VARCHAR AS base,
    CASE WHEN doc_id % 2 = 0 THEN 'sid' ELSE 'page' END AS param,
    CASE WHEN doc_id % 2 = 0 THEN md5(doc_id::VARCHAR)
         ELSE ((doc_id // 25) % 5)::VARCHAR END AS value
  FROM documents
),
fps AS (
  SELECT base, param, value,
         CASE WHEN param = 'sid' THEN md5(base)
              ELSE md5(base || '?page=' || value) END AS fp
  FROM urls
),
per_base AS (
  SELECT param, base, count(DISTINCT value) AS nv, count(DISTINCT fp) AS nf
  FROM fps GROUP BY param, base
  HAVING count(DISTINCT value) >= 2
)
SELECT param, count(*) AS n_bases,
       CAST(sum((nf = 1)::INTEGER) AS BIGINT) AS n_collapsed,
       sum((nf = 1)::INTEGER) = count(*) AS irrelevant
FROM per_base GROUP BY param
"""


_PSL_RULES = (
    "com", "org", "io", "uk", "jp",
    "co.uk", "ac.jp", "github.io", "blogspot.com",
)


def q_registrable_domain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registrable-domain (eTLD+1) extraction by public-suffix
    longest-match — the host-grouping primitive every per-site crawl
    policy (politeness, budgets, dedup, blocklists) should key on
    instead of the raw hostname: `a.github.io` and `b.github.io` are
    DIFFERENT sites, `www.x.co.uk` and `cdn.x.co.uk` are the same. Uses
    a deterministic PSL subset (plain rules only — no */! wildcard
    rules) against hosts synthesized across six suffix families.

    The algorithm is the PSL longest-suffix match expressed
    relationally: build every dot-suffix of the host that leaves at
    least one label (bounded by label count, so the explode fan-out is
    ~4), broadcast-join the rule table, keep the match with the most
    labels via max_by. All string ops are JVM builtins; per 10^10
    distinct hosts this is one explode + one broadcast join + one
    partial-aggregated groupBy on host — no UDF, no driver state."""
    docs = _read(spark, sf_dir, "documents").select("doc_id")
    sfx = (
        F.when(F.col("doc_id") % 6 == 0, F.lit("com"))
        .when(F.col("doc_id") % 6 == 1, F.lit("co.uk"))
        .when(F.col("doc_id") % 6 == 2, F.lit("github.io"))
        .when(F.col("doc_id") % 6 == 3, F.lit("ac.jp"))
        .when(F.col("doc_id") % 6 == 4, F.lit("org"))
        .otherwise(F.lit("blogspot.com"))
    )
    host = F.concat(
        F.when(F.col("doc_id") % 3 == 0, F.lit("www.")).otherwise(
            F.when(F.col("doc_id") % 7 == 0, F.lit("cdn.m.")).otherwise(F.lit(""))
        ),
        F.lit("s"),
        (F.col("doc_id") % 50).cast("string"),
        F.lit("."),
        sfx,
    )
    hosts = docs.select(host.alias("host")).distinct()
    labels = F.split(F.col("host"), r"\.")
    cand = F.transform(
        F.sequence(F.lit(2), F.size(labels)),
        lambda i: F.array_join(
            F.slice(labels, i, F.size(labels) - i + 1), "."
        ),
    )
    exploded = hosts.select(
        "host", F.explode(cand).alias("cand")
    ).withColumn("n_labels", F.size(F.split(F.col("cand"), r"\.")))
    psl = spark.createDataFrame(
        [(s,) for s in _PSL_RULES], "suffix string"
    )
    matched = exploded.join(
        F.broadcast(psl), exploded.cand == psl.suffix
    ).groupBy("host").agg(F.max_by("cand", "n_labels").alias("public_suffix"))
    prefix = F.substring(
        F.col("host"),
        1,
        F.length("host") - F.length("public_suffix") - 1,
    )
    return matched.select(
        "host",
        "public_suffix",
        F.concat(
            F.regexp_extract(prefix, r"([^.]+)$", 1),
            F.lit("."),
            F.col("public_suffix"),
        ).alias("registrable_domain"),
    )


SQL_REGISTRABLE_DOMAIN = r"""
WITH hosts AS (
  SELECT DISTINCT
    CASE WHEN doc_id % 3 = 0 THEN 'www.'
         WHEN doc_id % 7 = 0 THEN 'cdn.m.' ELSE '' END
    || 's' || (doc_id % 50)::VARCHAR || '.'
    || CASE doc_id % 6 WHEN 0 THEN 'com' WHEN 1 THEN 'co.uk'
            WHEN 2 THEN 'github.io' WHEN 3 THEN 'ac.jp'
            WHEN 4 THEN 'org' ELSE 'blogspot.com' END AS host
  FROM documents
),
lab AS (SELECT host, string_split(host, '.') AS labels FROM hosts),
cand AS (
  SELECT host, array_to_string(labels[i:], '.') AS cand,
         len(labels) - i + 1 AS n_labels
  FROM lab, unnest(range(2, len(labels) + 1)) AS t(i)
),
psl(suffix) AS (VALUES ('com'), ('org'), ('io'), ('uk'), ('jp'),
                       ('co.uk'), ('ac.jp'), ('github.io'), ('blogspot.com')),
m AS (
  SELECT host, arg_max(cand, n_labels) AS public_suffix
  FROM cand JOIN psl ON cand = suffix
  GROUP BY host
)
SELECT host, public_suffix,
       regexp_extract(host[1:len(host) - len(public_suffix) - 1],
                      '([^.]+)$', 1)
       || '.' || public_suffix AS registrable_domain
FROM m
"""


_MIRROR_MAXDF = 16
_MIRROR_HOSTS = 40
_MIRROR_THRESH = 0.5


def q_mirror_hosts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mirror-site detection: host pairs whose content-fingerprint sets
    overlap by >= 50% of the smaller host — the crawl-budget killer
    (mirrors and CDN aliases burn fetches on bytes already stored; the
    classic Bharat & Broder WWW'99 'mirrored host' problem). Content is
    synthesized deterministically and scale-free: 120 content classes;
    a class's docs sit on its base host (class % 40), and the 2-of-3
    "mirrored" classes alternate their docs onto the partner host 20
    away — so every planted pair (h, h+20) shares exactly 4 of each
    host's 5 classes (overlap 0.8) at ANY table size, while the
    class%3==0 solo classes keep overlap below 1.0.

    Scale shape: the candidate generator is a self-join of the distinct
    (host, fp) table ON fp — never host x host — and fingerprints seen
    on more than {maxdf} hosts are dropped first (the boilerplate/hot-fp
    guard, same discipline as ngram maxdf), so per-fp fan-out is
    bounded and the join work is sum(df^2) <= maxdf * |fp|. Host sizes
    re-aggregate from the same filtered table; overlap = shared /
    min(|A|, |B|)."""
    docs = _read(spark, sf_dir, "documents").select("doc_id")
    m = F.col("doc_id") % 120
    base = m % _MIRROR_HOSTS
    hostnum = F.when(
        (m % 3 != 0) & (F.floor(F.col("doc_id") / 120) % 2 == 1),
        (base + 20) % _MIRROR_HOSTS,
    ).otherwise(base)
    host = F.concat(F.lit("h"), hostnum.cast("string"))
    fp = F.md5(F.concat(F.lit("c"), m.cast("string")))
    hfp = docs.select(host.alias("host"), fp.alias("fp")).distinct()
    ok = (
        hfp.groupBy("fp")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") <= _MIRROR_MAXDF)
        .select("fp")
    )
    hfp = hfp.join(ok, "fp", "left_semi").localCheckpoint()
    sizes = hfp.groupBy("host").agg(F.count("*").alias("n_fp"))
    a = hfp.select(F.col("host").alias("host_a"), "fp")
    b = hfp.select(F.col("host").alias("host_b"), "fp")
    shared = (
        a.join(b, "fp")
        .filter(F.col("host_a") < F.col("host_b"))
        .groupBy("host_a", "host_b")
        .agg(F.count("*").alias("shared"))
    )
    return (
        shared.join(sizes.withColumnRenamed("host", "host_a"), "host_a")
        .withColumnRenamed("n_fp", "n_a")
        .join(sizes.withColumnRenamed("host", "host_b"), "host_b")
        .withColumnRenamed("n_fp", "n_b")
        .withColumn(
            "overlap",
            F.round(F.col("shared") / F.least("n_a", "n_b"), 4),
        )
        .filter(F.col("overlap") >= _MIRROR_THRESH)
        .select("host_a", "host_b", "shared", "n_a", "n_b", "overlap")
    )


SQL_MIRROR_HOSTS = f"""
WITH hfp AS (
  SELECT DISTINCT
    'h' || (CASE WHEN (doc_id % 120) % 3 <> 0 AND (doc_id // 120) % 2 = 1
                 THEN ((doc_id % 120) % {_MIRROR_HOSTS} + 20) % {_MIRROR_HOSTS}
                 ELSE (doc_id % 120) % {_MIRROR_HOSTS} END)::VARCHAR AS host,
    md5('c' || (doc_id % 120)::VARCHAR) AS fp
  FROM documents
),
ok AS (
  SELECT host, fp FROM hfp
  WHERE fp IN (SELECT fp FROM hfp GROUP BY fp
               HAVING count(*) <= {_MIRROR_MAXDF})
),
sizes AS (SELECT host, count(*) AS n_fp FROM ok GROUP BY host),
shared AS (
  SELECT a.host AS host_a, b.host AS host_b, count(*) AS shared
  FROM ok a JOIN ok b ON a.fp = b.fp AND a.host < b.host
  GROUP BY 1, 2
)
SELECT host_a, host_b, shared, sa.n_fp AS n_a, sb.n_fp AS n_b,
       round(shared / least(sa.n_fp, sb.n_fp), 4) AS overlap
FROM shared
JOIN sizes sa ON host_a = sa.host
JOIN sizes sb ON host_b = sb.host
WHERE round(shared / least(sa.n_fp, sb.n_fp), 4) >= {_MIRROR_THRESH}
"""


def q_link_farm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link-farm / spam-graph signals per host-graph node: out-degree,
    in-degree, reciprocity (fraction of out-edges whose reverse edge
    exists — farms interlink both ways), and the outdeg/indeg imbalance.
    Same deterministic synthesized edge set as anchor_text_agg, so both
    engines score an identical graph. Reciprocity is a self-join of the
    edge set on the swapped key — one hash join on (src,dst), never
    adjacency materialization; degrees are two partial-agg shuffles."""
    docs = _read(spark, sf_dir, "documents").select("doc_id")
    n = docs.count()
    base = docs.select(F.col("doc_id").alias("src"))
    edges = (
        base.select("src", ((F.col("src") * 7 + 3) % n).alias("dst"))
        .union(base.select("src", (F.floor(F.col("src") / 3) % n).alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    rev = edges.select(
        F.col("dst").alias("src"), F.col("src").alias("dst"), F.lit(1).alias("has_rev")
    )
    recip = (
        edges.join(rev, ["src", "dst"], "left")
        .groupBy("src")
        .agg(
            F.count("*").alias("outdeg"),
            F.sum(F.coalesce("has_rev", F.lit(0))).alias("n_recip"),
        )
    )
    indeg = edges.groupBy(F.col("dst").alias("src")).agg(
        F.count("*").alias("indeg")
    )
    return (
        recip.join(indeg, "src", "full_outer")
        .select(
            F.col("src").alias("node"),
            F.coalesce("outdeg", F.lit(0)).alias("outdeg"),
            F.coalesce("indeg", F.lit(0)).alias("indeg"),
            F.round(
                F.coalesce("n_recip", F.lit(0))
                / F.greatest(F.coalesce("outdeg", F.lit(0)), F.lit(1)),
                4,
            ).alias("reciprocity"),
            F.round(
                F.coalesce("outdeg", F.lit(0))
                / F.greatest(F.coalesce("indeg", F.lit(0)), F.lit(1)).cast("double"),
                4,
            ).alias("out_in_ratio"),
        )
    )


SQL_LINK_FARM_SCORE = """
WITH nd AS (SELECT count(*) AS n FROM documents),
edges AS (
  SELECT DISTINCT src, dst FROM (
    SELECT doc_id AS src, (doc_id * 7 + 3) % nd.n AS dst FROM documents, nd
    UNION ALL
    SELECT doc_id AS src, (doc_id // 3) % nd.n AS dst FROM documents, nd
  ) e WHERE src <> dst
),
recip AS (
  SELECT e.src, count(*) AS outdeg,
         sum(CASE WHEN r.src IS NOT NULL THEN 1 ELSE 0 END) AS n_recip
  FROM edges e LEFT JOIN edges r ON r.src = e.dst AND r.dst = e.src
  GROUP BY e.src
),
indeg AS (SELECT dst AS src, count(*) AS indeg FROM edges GROUP BY dst)
SELECT coalesce(recip.src, indeg.src) AS node,
       coalesce(outdeg, 0) AS outdeg,
       coalesce(indeg, 0) AS indeg,
       round(coalesce(n_recip, 0) / greatest(coalesce(outdeg, 0), 1), 4) AS reciprocity,
       round(coalesce(outdeg, 0) / greatest(coalesce(indeg, 0), 1)::DOUBLE, 4) AS out_in_ratio
FROM recip FULL OUTER JOIN indeg ON recip.src = indeg.src
"""


_SHARD_K = 8


def q_write_shard_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced write-shard planning: assign each host's output to one of
    k shards by snake-order on size rank (1..k, k..1, ...) — the greedy
    bin-packing that keeps every output file within ~1 largest-host of
    the mean, instead of hash partitioning's birthday-skew. This is the
    planning step behind repartitionByRange/bucketed writes when sizes
    are known (file compaction, CDX shard layout).

    The global stage ranks ONE ROW PER HOST (10^5-ish at web scale);
    the data itself would then move in a single shuffle keyed by the
    broadcast host->shard map. Rank ties break on host id so the plan
    is deterministic on both engines."""
    ev = _read(spark, sf_dir, "events")
    hosts = ev.groupBy(F.col("user_id").alias("host")).agg(
        F.count("*").alias("n_rows")
    )
    w = Window.partitionBy(F.lit(1)).orderBy(F.desc("n_rows"), F.asc("host"))
    ranked = hosts.withColumn("rnk", F.row_number().over(w) - 1)
    cycle = F.col("rnk") % (2 * _SHARD_K)
    shard = F.when(cycle < _SHARD_K, cycle).otherwise(
        F.lit(2 * _SHARD_K - 1) - cycle
    )
    return ranked.select(
        "host", "n_rows", shard.cast("int").alias("shard")
    )


SQL_WRITE_SHARD_PLAN = f"""
WITH hosts AS (
  SELECT user_id AS host, count(*) AS n_rows FROM events GROUP BY user_id
),
ranked AS (
  SELECT host, n_rows,
         row_number() OVER (ORDER BY n_rows DESC, host ASC) - 1 AS rnk
  FROM hosts
)
SELECT host, n_rows,
       CAST(CASE WHEN rnk % {2 * _SHARD_K} < {_SHARD_K}
                 THEN rnk % {2 * _SHARD_K}
                 ELSE {2 * _SHARD_K - 1} - rnk % {2 * _SHARD_K} END AS INTEGER) AS shard
FROM ranked
"""


# -- PMI collocations ---------------------------------------------------------

_PMI_MIN_C = 5


def q_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise-mutual-information collocation mining: score each
    adjacent token pair by PMI = ln(c(w1,w2)·N / (c(w1)·c(w2))) over the
    whole corpus, keeping pairs seen at least {_PMI_MIN_C} times — the
    classic phrase/collocation detector (Church & Hanks 1990) that a
    training-data pipeline runs to build phrase vocabularies and to spot
    boilerplate word glue. Relates to the reference's vocabulary signal
    surface (TuneVocabulary pair sampling, TuneVocabulary.scala:33-83)
    which also scores word pairs, there by link co-occurrence.

    Scale shape: bigram and unigram count tables are vocabulary-sized
    map-side partial aggregations; the PMI join brings the two unigram
    counts to each surviving bigram via two broadcast-sized joins
    (vocabulary ≪ corpus), and the ≥min-count filter runs before the
    joins so the shuffled set is the small head of the pair
    distribution. Selection is integer-exact (count threshold), PMI is
    emitted rounded — no float ordering anywhere."""
    toks = _tokens(_docs_parallel(spark, sf_dir))
    big = toks.select(
        F.explode(
            F.expr(
                "zip_with(slice(toks, 1, size(toks)-1), "
                "slice(toks, 2, size(toks)-1), "
                "(x, y) -> struct(x as w1, y as w2))"
            )
        ).alias("bg")
    ).select("bg.w1", "bg.w2")
    c12 = (
        big.groupBy("w1", "w2")
        .agg(F.count("*").alias("c12"))
        .filter(F.col("c12") >= _PMI_MIN_C)
    )
    uni = (
        toks.select(F.explode("toks").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("cw"))
    )
    ntok = toks.select(F.explode("toks").alias("w")).agg(
        F.count("*").alias("n_tok")
    )
    u1 = uni.select(F.col("w").alias("w1"), F.col("cw").alias("c1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("cw").alias("c2"))
    return (
        c12.join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .crossJoin(F.broadcast(ntok))
        .select(
            "w1",
            "w2",
            F.col("c12").cast("bigint").alias("pair_count"),
            F.round(
                F.log(
                    F.col("c12").cast("double")
                    * F.col("n_tok").cast("double")
                    / (F.col("c1").cast("double") * F.col("c2").cast("double"))
                ),
                5,
            ).alias("pmi"),
        )
    )


SQL_PMI_COLLOCATIONS = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
big AS (
  SELECT unnest(list_transform(range(1, len(toks)),
                               i -> {{'w1': toks[i], 'w2': toks[i + 1]}})) AS bg
  FROM t
), b2 AS (SELECT bg.w1 AS w1, bg.w2 AS w2 FROM big),
c12 AS (
  SELECT w1, w2, count(*) AS c12 FROM b2 GROUP BY w1, w2
  HAVING count(*) >= {_PMI_MIN_C}
),
uni AS (
  SELECT w, count(*) AS cw
  FROM (SELECT unnest(toks) AS w FROM t) GROUP BY w
),
ntok AS (SELECT count(*)::BIGINT AS n_tok FROM (SELECT unnest(toks) FROM t))
SELECT c12.w1, c12.w2, c12::BIGINT AS pair_count,
       round(ln(c12::DOUBLE * n_tok::DOUBLE / (u1.cw::DOUBLE * u2.cw::DOUBLE)),
             5) AS pmi
FROM c12
JOIN uni u1 ON u1.w = c12.w1
JOIN uni u2 ON u2.w = c12.w2
CROSS JOIN ntok
"""


# -- BERT-style MLM masking ----------------------------------------------------

# integer thresholds on the first 32 md5 bits: floor(p * 2^32)
_MLM_SEL = 644245094  # 0.15 — fraction of positions selected
_MLM_MASK = 3435973836  # 0.80 of selected -> [MASK]
_MLM_RAND = 3865470566  # next 0.10 of selected -> random in-doc token


def q_mlm_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic BERT-style masked-LM example generation: select 15%
    of token positions by a hash coin on (doc_id, pos); of those, 80%
    become '[MASK]', 10% are replaced by a pseudo-random in-document
    token (position (pos·7) mod len — hash-derived, reproducible), 10%
    kept unchanged (Devlin et al. 2018 §3.1). The companion of
    span_corrupt (T5 denoising) on the encoder-only recipe.

    Scale shape: pure map-side — posexplode + two md5 slices per
    position, no shuffle at all; every decision is an integer compare on
    hash bits so resharding/re-running yields byte-identical examples
    (the property a 100-TB preprocessing run needs for resumability).
    All thresholds are integer literals: no float anywhere."""
    toks = _tokens(_docs_parallel(spark, sf_dir)).select("doc_id", "toks")
    pos = toks.select(
        "doc_id", "toks", F.posexplode("toks").alias("pos", "tok")
    )
    h = F.md5(F.concat_ws(":", F.col("doc_id"), F.col("pos")))
    u = F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint")
    v = F.conv(F.substring(h, 9, 8), 16, 10).cast("bigint")
    rand_tok = F.expr("element_at(toks, cast((pos * 7) % size(toks) as int) + 1)")
    sel = pos.filter(u < _MLM_SEL)
    action = (
        F.when(v < _MLM_MASK, F.lit("mask"))
        .when(v < _MLM_RAND, F.lit("random"))
        .otherwise(F.lit("keep"))
    )
    masked = (
        F.when(v < _MLM_MASK, F.lit("[MASK]"))
        .when(v < _MLM_RAND, rand_tok)
        .otherwise(F.col("tok"))
    )
    return sel.select(
        "doc_id",
        F.col("pos").cast("int").alias("pos"),
        F.col("tok").alias("original"),
        masked.alias("masked"),
        action.alias("action"),
    )


SQL_MLM_MASK = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
pos AS (
  SELECT doc_id, toks, CAST(p.i AS INTEGER) AS pos, toks[p.i + 1] AS tok
  FROM t, LATERAL unnest(range(0, len(toks))) AS p(i)
),
hashed AS (
  SELECT doc_id, toks, pos, tok,
         ('0x' || substr(md5(doc_id::VARCHAR || ':' || pos::VARCHAR), 1, 8))::BIGINT AS u,
         ('0x' || substr(md5(doc_id::VARCHAR || ':' || pos::VARCHAR), 9, 8))::BIGINT AS v
  FROM pos
)
SELECT doc_id, pos, tok AS original,
       CASE WHEN v < {_MLM_MASK} THEN '[MASK]'
            WHEN v < {_MLM_RAND} THEN toks[CAST((pos * 7) % len(toks) AS INTEGER) + 1]
            ELSE tok END AS masked,
       CASE WHEN v < {_MLM_MASK} THEN 'mask'
            WHEN v < {_MLM_RAND} THEN 'random'
            ELSE 'keep' END AS action
FROM hashed WHERE u < {_MLM_SEL}
"""


# -- crawl fairness (Gini / HHI over per-host fetch counts) --------------------


def q_host_fairness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Politeness-fairness audit of a fetch log: Gini coefficient and
    Herfindahl-Hirschman index of the per-host fetch-count distribution
    — the one-row health metric a crawl operator watches to see whether
    the scheduler (F5 politeness window, crawler.py:399-431) is actually
    spreading budget across hosts or letting hot domains starve the
    tail. Gini = 2·Σᵢ i·xᵢ / (n·Σx) − (n+1)/n over counts sorted
    ascending; HHI = Σ(xᵢ/total)².

    Scale shape: the per-host groupBy is the only data-sized shuffle;
    the rank window then orders ONE ROW PER HOST (10^5-ish at web
    scale, same bounded single-task stage write_shard_plan uses), and
    everything stays integer until the final two divisions."""
    ev = _read(spark, sf_dir, "events")
    per = ev.groupBy(F.col("user_id").alias("host")).agg(
        F.count("*").alias("n")
    )
    w = Window.partitionBy(F.lit(1)).orderBy(F.asc("n"), F.asc("host"))
    ranked = per.withColumn("i", F.row_number().over(w))
    return ranked.agg(
        F.count("*").cast("int").alias("n_hosts"),
        F.sum("n").cast("bigint").alias("total_fetches"),
        F.round(
            (2.0 * F.sum(F.col("i") * F.col("n")))
            / (F.count("*") * F.sum("n"))
            - (F.count("*") + 1).cast("double") / F.count("*"),
            6,
        ).alias("gini"),
        F.round(
            F.sum(F.col("n") * F.col("n"))
            / (F.sum("n") * F.sum("n")).cast("double"),
            6,
        ).alias("hhi"),
    )


SQL_HOST_FAIRNESS = """
WITH per AS (
  SELECT user_id AS host, count(*) AS n FROM events GROUP BY user_id
),
ranked AS (
  SELECT host, n, row_number() OVER (ORDER BY n ASC, host ASC) AS i FROM per
)
SELECT count(*)::INTEGER AS n_hosts,
       sum(n)::BIGINT AS total_fetches,
       round((2.0 * sum(i * n)::BIGINT) / (count(*) * sum(n)::BIGINT)
             - (count(*) + 1)::DOUBLE / count(*), 6) AS gini,
       round(sum(n * n)::BIGINT / (sum(n)::BIGINT * sum(n)::BIGINT)::DOUBLE,
             6) AS hhi
FROM ranked
"""


# -- per-site boilerplate line detection (CCNet-style) -------------------------

_BP_W = 8  # tokens per line-chunk
_BP_MIN_DOCS = 3  # chunk in >= this many docs of one source => boilerplate


def q_boilerplate_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-site boilerplate detection (the CCNet/RefinedWeb pre-dedup
    stage): a line that recurs across many pages of the SAME site is
    chrome (nav, footer, cookie banner), not content — classify each
    fixed-width token chunk by its distinct-document frequency within
    its source, and report per document how much of it is boilerplate.
    Documents are word streams here, so 'lines' are {_BP_W}-token
    chunks; a deterministic {_BP_W}-token site-chrome line ('home about
    contact privacy terms login search <source>') is prepended in-engine
    to every page — it tiles into its own chunk, shared by every page of
    the source — so the detector has real chrome to find, exactly like
    c4_clean synthesizes its lines.
    Distinct from paragraph_dedup (global first-occurrence dedup): this
    is per-site frequency classification, the step that runs BEFORE
    global dedup in a production pipeline.

    Scale shape: one shuffle keyed by (source, chunk) for the
    distinct-doc counts — the key space is per-site content, so the
    hottest key is bounded by site size, not corpus size; one shuffle
    back on doc_id for the per-doc rollup. No Python anywhere."""
    # exactly _BP_W tokens of site chrome => it tiles into its own chunk
    docs = _docs_parallel(spark, sf_dir).withColumn(
        "text",
        F.concat(
            F.lit("home about contact privacy terms login search "),
            F.col("source"),
            F.lit(" "),
            F.col("text"),
        ),
    )
    toks = _tokens(docs).filter(F.expr("size(toks) > 0"))
    chunks = toks.select(
        "doc_id",
        "source",
        F.explode(
            F.expr(
                f"transform(sequence(0, cast(ceil(size(toks)/{_BP_W}.0) as int) - 1), "
                f"i -> array_join(slice(toks, i*{_BP_W}+1, {_BP_W}), ' '))"
            )
        ).alias("chunk"),
    )
    freq = chunks.groupBy("source", "chunk").agg(
        F.countDistinct("doc_id").alias("n_docs")
    )
    flagged = chunks.join(freq, ["source", "chunk"]).withColumn(
        "is_boiler", (F.col("n_docs") >= _BP_MIN_DOCS).cast("int")
    )
    return flagged.groupBy("doc_id").agg(
        F.count("*").cast("int").alias("n_chunks"),
        F.sum("is_boiler").cast("int").alias("n_boiler"),
        F.round(F.sum("is_boiler") / F.count("*"), 6).alias("boiler_frac"),
    )


SQL_BOILERPLATE_LINES = f"""
WITH d AS (
  SELECT doc_id, source,
         'home about contact privacy terms login search ' || source || ' ' || text AS text
  FROM documents
),
t AS (SELECT doc_id, source, {_SQL_TOKS} AS toks FROM d),
chunks AS (
  SELECT doc_id, source,
         unnest(list_transform(range(0, CAST(ceil(len(toks)/{_BP_W}.0) AS INTEGER)),
                               i -> array_to_string(toks[i*{_BP_W}+1 : i*{_BP_W}+{_BP_W}], ' '))) AS chunk
  FROM t WHERE len(toks) > 0
),
freq AS (
  SELECT source, chunk, count(DISTINCT doc_id) AS n_docs
  FROM chunks GROUP BY source, chunk
)
SELECT c.doc_id,
       count(*)::INTEGER AS n_chunks,
       sum(CASE WHEN f.n_docs >= {_BP_MIN_DOCS} THEN 1 ELSE 0 END)::INTEGER AS n_boiler,
       round(sum(CASE WHEN f.n_docs >= {_BP_MIN_DOCS} THEN 1 ELSE 0 END)
             / count(*), 6) AS boiler_frac
FROM chunks c JOIN freq f ON c.source = f.source AND c.chunk = f.chunk
GROUP BY c.doc_id
"""


# -- edit-distance verification of near-dup candidates --------------------------

_EV_SIM = 0.8  # keep pairs with 1 - lev/maxlen >= this
_EV_MUT_POS = 5  # planted mutants: token replaced at this position
_EV_MUT_OFFSET = 100000


def q_neardup_edit_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The VERIFY stage of a candidate-based near-dup pipeline: bucket
    documents by a cheap prefix key (lang + first two tokens — the
    LSH-band stand-in), pair within buckets, and confirm with true
    Levenshtein similarity 1 − lev/max(len) ≥ {_EV_SIM}. Candidate
    generation elsewhere in the registry (minhash_lsh_candidates,
    simhash_hamming_pairs) is probabilistic; this is the exact check a
    production dedup runs on the surviving pairs before dropping data.
    Near-duplicates are planted in-engine (token {_EV_MUT_POS} replaced
    in every 10th doc, id + {_EV_MUT_OFFSET}) so both engines verify an
    identical planted truth.

    Scale shape: the quadratic work is confined inside prefix buckets
    (hot buckets are the known skew risk — the maxdf guard pattern from
    ngram_jaccard_capped applies); Levenshtein runs ONLY on bucket
    pairs, never all-pairs, and is a JVM builtin (no Python). One
    shuffle on the bucket key, one integer-exact filter."""
    base = _docs_parallel(spark, sf_dir).select("doc_id", "lang", "text")
    toks = _tokens(base)
    mut = (
        toks.filter(F.col("doc_id") % 10 == 0)
        .filter(F.expr(f"size(toks) > {_EV_MUT_POS}"))
        .select(
            (F.col("doc_id") + _EV_MUT_OFFSET).alias("doc_id"),
            "lang",
            F.expr(
                f"array_join(concat(slice(toks, 1, {_EV_MUT_POS}), array('qqq'), "
                f"slice(toks, {_EV_MUT_POS + 2}, size(toks))), ' ')"
            ).alias("text"),
        )
    )
    allv = _tokens(base.unionByName(mut)).filter(F.expr("size(toks) >= 2"))
    keyed = allv.select(
        "doc_id",
        "text",
        F.concat_ws(
            "|", "lang", F.expr("toks[0]"), F.expr("toks[1]")
        ).alias("bucket"),
    )
    a = keyed.alias("a")
    b = keyed.alias("b")
    lev = F.levenshtein(F.col("a.text"), F.col("b.text"))
    sim = 1.0 - lev / F.greatest(F.length("a.text"), F.length("b.text"))
    return (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            lev.cast("int").alias("lev"),
            F.round(sim, 6).alias("sim"),
        )
        .filter(F.col("sim") >= _EV_SIM)
    )


SQL_NEARDUP_EDIT_VERIFY = f"""
WITH base AS (
  SELECT doc_id, lang, text, {_SQL_TOKS} AS toks FROM documents
),
mut AS (
  SELECT doc_id + {_EV_MUT_OFFSET} AS doc_id, lang,
         array_to_string(
           list_concat(list_concat(toks[1 : {_EV_MUT_POS}], ['qqq']),
                       toks[{_EV_MUT_POS} + 2 : len(toks)]), ' ') AS text
  FROM base WHERE doc_id % 10 = 0 AND len(toks) > {_EV_MUT_POS}
),
allv AS (
  SELECT doc_id, lang, text, {_SQL_TOKS} AS toks
  FROM (SELECT doc_id, lang, text FROM base
        UNION ALL SELECT doc_id, lang, text FROM mut) u
),
keyed AS (
  SELECT doc_id, text,
         lang || '|' || toks[1] || '|' || toks[2] AS bucket
  FROM allv WHERE len(toks) >= 2
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       levenshtein(a.text, b.text)::INTEGER AS lev,
       round(1.0 - levenshtein(a.text, b.text)
             / greatest(len(a.text), len(b.text)), 6) AS sim
FROM keyed a JOIN keyed b
  ON a.bucket = b.bucket AND a.doc_id < b.doc_id
WHERE 1.0 - levenshtein(a.text, b.text)
      / greatest(len(a.text), len(b.text)) >= {_EV_SIM}
"""


# -- n-gram novelty scoring ------------------------------------------------------

_NOV_N = 3


def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-order novelty score per document: the fraction of its
    distinct {_NOV_N}-gram shingles whose FIRST corpus occurrence (by
    doc_id) is this document — the diversity/diminishing-returns signal
    a data-curation run tracks while growing a corpus (new shards that
    add no new n-grams are redundant). The complement of duplication:
    paragraph_dedup keeps first occurrences; this SCORES every document
    by how much first-occurrence material it contributes.

    Scale shape: one shuffle keyed by shingle for the min(doc_id)
    first-seen table (map-side partial min), one shuffle back on doc_id
    — identical topology to the engine's first_seen_ids numbering
    (crawler.py:130-191) applied to n-grams instead of URLs."""
    toks = _tokens(_docs_parallel(spark, sf_dir)).filter(
        F.expr(f"size(toks) >= {_NOV_N}")
    )
    sh = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                f"array_distinct(transform(sequence(1, size(toks) - {_NOV_N - 1}), "
                f"i -> array_join(slice(toks, i, {_NOV_N}), ' ')))"
            )
        ).alias("shingle"),
    )
    first = sh.groupBy("shingle").agg(F.min("doc_id").alias("first_doc"))
    return (
        sh.join(first, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("int").alias("n_shingles"),
            F.sum((F.col("first_doc") == F.col("doc_id")).cast("int"))
            .cast("int")
            .alias("n_novel"),
            F.round(
                F.sum((F.col("first_doc") == F.col("doc_id")).cast("int"))
                / F.count("*"),
                6,
            ).alias("novelty"),
        )
    )


SQL_NGRAM_NOVELTY = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(toks) - {_NOV_N - 2}),
                                 i -> array_to_string(toks[i : i + {_NOV_N - 1}], ' '))) AS shingle
    FROM t WHERE len(toks) >= {_NOV_N}
  )
),
first AS (SELECT shingle, min(doc_id) AS first_doc FROM sh GROUP BY shingle)
SELECT sh.doc_id,
       count(*)::INTEGER AS n_shingles,
       sum(CASE WHEN first_doc = sh.doc_id THEN 1 ELSE 0 END)::INTEGER AS n_novel,
       round(sum(CASE WHEN first_doc = sh.doc_id THEN 1 ELSE 0 END)
             / count(*), 6) AS novelty
FROM sh JOIN first USING (shingle)
GROUP BY sh.doc_id
"""


# -- margin-based bitext mining --------------------------------------------------

_BT_MARGIN = 1.05  # keep pairs whose top1/top2 cosine ratio clears this


def q_bitext_mine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Margin-based parallel-pair mining over two embedding pools (the
    LASER/CCMatrix recipe, Artetxe & Schwenk 2019, ratio variant): treat
    even vec_ids as the source-language pool and odd as the target pool,
    score every cross pair by cosine, and keep a pair iff it is MUTUAL
    best (x is y's top-1 and vice versa) and the top1/top2 margin clears
    {_BT_MARGIN} — the filter that separates true translations from
    hubness artifacts. This is how the multilingual slice of a web
    corpus is turned into aligned training pairs.

    Scale shape: one scored cross frame with per-row norms folded BELOW
    the join (2 folds per row, not 3); both directions' ranks and the
    margin come from windows over the SAME frame — no second join. At
    real scale the cross pair-stream is bucketed by an ANN partitioner
    (ann_ivf's assignment) first; the mining windows are unchanged.
    Cosines are sequential-fold doubles — bit-identical across engines —
    so rank and margin comparisons are exact."""
    e = _read(spark, sf_dir, "embeddings").select(
        "vec_id",
        "embedding",
        F.sqrt(F.expr(_dot_expr("embedding", "embedding"))).alias("nrm"),
    )
    a = e.filter(F.col("vec_id") % 2 == 0).select(
        F.col("vec_id").alias("src"),
        F.col("embedding").alias("va"),
        F.col("nrm").alias("na"),
    )
    b = e.filter(F.col("vec_id") % 2 == 1).select(
        F.col("vec_id").alias("dst"),
        F.col("embedding").alias("vb"),
        F.col("nrm").alias("nb"),
    )
    cos = F.expr(_dot_expr("va", "vb")) / (F.col("na") * F.col("nb"))
    scored = a.crossJoin(F.broadcast(b)).select("src", "dst", cos.alias("cos"))
    w_fwd = Window.partitionBy("src").orderBy(F.desc("cos"), F.asc("dst"))
    w_bwd = Window.partitionBy("dst").orderBy(F.desc("cos"), F.asc("src"))
    ranked = scored.select(
        "src",
        "dst",
        "cos",
        F.row_number().over(w_fwd).alias("rf"),
        F.row_number().over(w_bwd).alias("rb"),
        F.lead("cos").over(w_fwd).alias("cos2"),
    )
    return (
        ranked.filter(
            (F.col("rf") == 1)
            & (F.col("rb") == 1)
            & (F.col("cos") / F.col("cos2") >= _BT_MARGIN)
        )
        .select(
            "src",
            "dst",
            F.round("cos", 6).alias("cos"),
            F.round(F.col("cos") / F.col("cos2"), 5).alias("margin"),
        )
    )


SQL_BITEXT_MINE = f"""
WITH e AS (
  SELECT vec_id, embedding,
         sqrt({_sql_dot('embedding', 'embedding')}) AS nrm
  FROM embeddings
),
scored AS (
  SELECT a.vec_id AS src, b.vec_id AS dst,
         {_sql_dot('a.embedding', 'b.embedding')} / (a.nrm * b.nrm) AS cos
  FROM e a, e b
  WHERE a.vec_id % 2 = 0 AND b.vec_id % 2 = 1
),
ranked AS (
  SELECT src, dst, cos,
         row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst ASC) AS rf,
         row_number() OVER (PARTITION BY dst ORDER BY cos DESC, src ASC) AS rb,
         lead(cos) OVER (PARTITION BY src ORDER BY cos DESC, dst ASC) AS cos2
  FROM scored
)
SELECT src, dst, round(cos, 6) AS cos, round(cos / cos2, 5) AS margin
FROM ranked
WHERE rf = 1 AND rb = 1 AND cos / cos2 >= {_BT_MARGIN}
"""


# -- vocabulary drift between snapshots -------------------------------------------


def q_vocab_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence between the term distributions of two
    corpus snapshots (even vs odd doc_ids as the A/B split): the drift
    monitor a continuously-crawled corpus runs to detect topic/spam
    shift between refreshes — the distributional companion of ks_drift
    (which watches a numeric column). Laplace-smoothed over the union
    vocabulary; JS = ½KL(p‖m)+½KL(q‖m), m=(p+q)/2.

    Scale shape: two vocabulary-sized count aggregations (map-side
    partial) joined FULL OUTER on term; each term's JS contribution is
    converted to integer picounits before the global sum, so the
    reduction is an exact integer sum — no float-summation-order
    dependence between engines, the same micro-unit trick
    quality_classifier uses for its weight updates."""
    toks = _tokens(_docs_parallel(spark, sf_dir)).select(
        "doc_id", F.explode("toks").alias("w")
    )
    ca = toks.filter(F.col("doc_id") % 2 == 0).groupBy("w").agg(
        F.count("*").alias("ca")
    )
    cb = toks.filter(F.col("doc_id") % 2 == 1).groupBy("w").agg(
        F.count("*").alias("cb")
    )
    j = ca.join(cb, "w", "full_outer").select(
        "w",
        F.coalesce("ca", F.lit(0)).alias("ca"),
        F.coalesce("cb", F.lit(0)).alias("cb"),
    )
    tot = j.agg(
        F.sum("ca").alias("na"), F.sum("cb").alias("nb"), F.count("*").alias("v")
    )
    p = (F.col("ca") + 1).cast("double") / (F.col("na") + F.col("v"))
    q = (F.col("cb") + 1).cast("double") / (F.col("nb") + F.col("v"))
    m = (p + q) / 2.0
    contrib = 0.5 * p * F.log(p / m) + 0.5 * q * F.log(q / m)
    return (
        j.crossJoin(F.broadcast(tot))
        .select(
            F.col("na"),
            F.col("nb"),
            F.col("v"),
            F.round(contrib * 1e12).cast("bigint").alias("c_pico"),
        )
        .groupBy("na", "nb", "v")
        .agg(F.round(F.sum("c_pico") / 1e12, 6).alias("js_divergence"))
        .select(
            F.col("v").cast("int").alias("n_terms"),
            F.col("na").cast("bigint").alias("tokens_a"),
            F.col("nb").cast("bigint").alias("tokens_b"),
            "js_divergence",
        )
    )


SQL_VOCAB_DRIFT = f"""
WITH toks AS (
  SELECT doc_id, unnest({_SQL_TOKS}) AS w FROM documents
),
ca AS (SELECT w, count(*) AS ca FROM toks WHERE doc_id % 2 = 0 GROUP BY w),
cb AS (SELECT w, count(*) AS cb FROM toks WHERE doc_id % 2 = 1 GROUP BY w),
j AS (
  SELECT coalesce(ca.w, cb.w) AS w,
         coalesce(ca, 0) AS ca, coalesce(cb, 0) AS cb
  FROM ca FULL OUTER JOIN cb ON ca.w = cb.w
),
tot AS (SELECT sum(ca)::BIGINT AS na, sum(cb)::BIGINT AS nb,
               count(*)::BIGINT AS v FROM j),
contrib AS (
  SELECT na, nb, v,
         round((0.5 * p * ln(p / m) + 0.5 * q * ln(q / m)) * 1e12)::BIGINT AS c_pico
  FROM (
    SELECT na, nb, v,
           (ca + 1)::DOUBLE / (na + v) AS p,
           (cb + 1)::DOUBLE / (nb + v) AS q,
           ((ca + 1)::DOUBLE / (na + v) + (cb + 1)::DOUBLE / (nb + v)) / 2.0 AS m
    FROM j CROSS JOIN tot
  )
)
SELECT v::INTEGER AS n_terms, na::BIGINT AS tokens_a, nb::BIGINT AS tokens_b,
       round(sum(c_pico)::BIGINT / 1e12, 6) AS js_divergence
FROM contrib GROUP BY na, nb, v
"""


# -- strongly connected components (one FW-BW coloring round) ---------------------

_SCC_ITERS = 8


def q_scc_mutual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One round of the forward-backward coloring SCC algorithm
    (Fleischer et al. 2000, the standard distributed SCC building
    block) over the same deterministic host graph link_farm_score uses:
    propagate min-reachable-id {_SCC_ITERS} hops along forward edges
    (fwd) and along reversed edges (bwd); a node with fwd == bwd == m is
    mutually reachable with m, hence provably in SCC(m); others stay
    unresolved (scc_id NULL) for the next recursion level. Directed-
    cycle detection is what a crawl graph needs for spam-ring / trap
    detection that undirected components (cc_star) cannot see.

    Scale shape: each hop is one join edges⋈labels + one min-groupBy —
    the canonical Pregel step as DataFrames; labels localCheckpoint'd
    per hop so lineage stays flat. All label math is integer min —
    exact on both engines."""
    docs = _read(spark, sf_dir, "documents").select("doc_id")
    n = docs.count()
    base = docs.select(F.col("doc_id").alias("src"))
    edges = (
        base.select("src", ((F.col("src") * 7 + 3) % n).alias("dst"))
        .union(base.select("src", (F.floor(F.col("src") / 3) % n).alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))

    def propagate(e: DataFrame, col: str) -> DataFrame:
        lab = docs.select(F.col("doc_id").alias("node"), F.col("doc_id").alias(col))
        for _ in range(_SCC_ITERS):
            nbr = (
                e.join(lab, e["dst"] == lab["node"])
                .groupBy(F.col("src").alias("node"))
                .agg(F.min(col).alias("nmin"))
            )
            lab = (
                lab.join(nbr, "node", "left")
                .select(
                    "node",
                    F.least(F.col(col), F.coalesce("nmin", F.col(col))).alias(col),
                )
                .localCheckpoint(eager=True)
            )
        return lab

    fwd = propagate(edges, "fwd")
    bwd = propagate(rev, "bwd")
    return fwd.join(bwd, "node").select(
        "node",
        "fwd",
        "bwd",
        F.when(F.col("fwd") == F.col("bwd"), F.col("fwd")).alias("scc_id"),
    )


def _scc_sql() -> str:
    n_expr = "(SELECT count(*) FROM documents)"
    steps_f, steps_b = [], []
    for i in range(_SCC_ITERS):
        prev = f"f{i}" if i else "l0f"
        steps_f.append(
            f"f{i + 1} AS MATERIALIZED (\n"
            f"  SELECT l.node, least(l.lab, coalesce(m.nmin, l.lab)) AS lab\n"
            f"  FROM {prev} l LEFT JOIN (\n"
            f"    SELECT e.src AS node, min(p.lab) AS nmin\n"
            f"    FROM edges e JOIN {prev} p ON e.dst = p.node GROUP BY e.src\n"
            f"  ) m ON l.node = m.node\n)"
        )
        prevb = f"b{i}" if i else "l0b"
        steps_b.append(
            f"b{i + 1} AS MATERIALIZED (\n"
            f"  SELECT l.node, least(l.lab, coalesce(m.nmin, l.lab)) AS lab\n"
            f"  FROM {prevb} l LEFT JOIN (\n"
            f"    SELECT e.dst AS node, min(p.lab) AS nmin\n"
            f"    FROM edges e JOIN {prevb} p ON e.src = p.node GROUP BY e.dst\n"
            f"  ) m ON l.node = m.node\n)"
        )
    return (
        "WITH nd AS (SELECT " + n_expr + " AS n),\n"
        "edges AS MATERIALIZED (\n"
        "  SELECT DISTINCT src, dst FROM (\n"
        "    SELECT doc_id AS src, (doc_id * 7 + 3) % nd.n AS dst FROM documents, nd\n"
        "    UNION ALL\n"
        "    SELECT doc_id AS src, (doc_id // 3) % nd.n AS dst FROM documents, nd\n"
        "  ) e WHERE src <> dst\n"
        "),\n"
        "l0f AS (SELECT doc_id AS node, doc_id AS lab FROM documents),\n"
        "l0b AS (SELECT doc_id AS node, doc_id AS lab FROM documents),\n"
        + ",\n".join(steps_f)
        + ",\n"
        + ",\n".join(steps_b)
        + f"""
SELECT f.node, f.lab AS fwd, b.lab AS bwd,
       CASE WHEN f.lab = b.lab THEN f.lab END AS scc_id
FROM f{_SCC_ITERS} f JOIN b{_SCC_ITERS} b ON f.node = b.node
"""
    )


SQL_SCC_MUTUAL = _scc_sql()


# -- empirical bloom-filter FPR evaluation ----------------------------------------

_BF_M = 1024  # bits — deliberately undersized so the audit SEES false positives
_BF_K = 4  # hash functions


def q_bloom_fpr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical false-positive-rate audit of a bloom URL-seen filter:
    insert the even doc_ids ({_BF_K} md5-derived bit positions each into
    an {_BF_M}-bit filter), probe the DISJOINT odd set, and report the
    measured FPR against the analytic (1−e^{{−kn/m}})^k — the
    capacity-planning check an operator runs before sizing the engine's
    partitioned bloom seen-filter (sources/bloom.py:38-151; D1). A probe
    is a false positive iff ALL its k bit positions are set.

    Scale shape: the filter is a DISTINCT bit-position table (≤ m rows —
    tiny, broadcastable); the probe is a left join of probe positions
    against it + an all-k groupBy per key. Bit positions are integer md5
    slices mod m — exact on both engines."""
    docs = _read(spark, sf_dir, "documents").select("doc_id")
    ks = spark.range(_BF_K).select(F.col("id").alias("j"))
    pos = F.pmod(
        F.conv(
            F.substring(F.md5(F.concat_ws(":", F.col("doc_id"), F.col("j"))), 1, 8),
            16,
            10,
        ).cast("bigint"),
        F.lit(_BF_M),
    )
    members = docs.filter(F.col("doc_id") % 2 == 0)
    probes = docs.filter(F.col("doc_id") % 2 == 1)
    bits = (
        members.crossJoin(F.broadcast(ks)).select(pos.alias("pos")).distinct()
    )
    probe_pos = probes.crossJoin(F.broadcast(ks)).select(
        "doc_id", pos.alias("pos")
    )
    hit = (
        probe_pos.join(F.broadcast(bits.withColumn("set1", F.lit(1))), "pos", "left")
        .groupBy("doc_id")
        .agg(
            (F.count("*") == F.sum(F.coalesce("set1", F.lit(0)))).cast("int").alias(
                "fp"
            )
        )
    )
    n_mem = members.count()
    n_bits = bits.count()
    import math

    exp_fpr = (1.0 - math.exp(-_BF_K * n_mem / _BF_M)) ** _BF_K
    return hit.agg(
        F.lit(_BF_M).cast("int").alias("m_bits"),
        F.lit(_BF_K).cast("int").alias("k_hashes"),
        F.lit(n_mem).cast("bigint").alias("n_members"),
        F.lit(n_bits).cast("bigint").alias("bits_set"),
        F.count("*").cast("bigint").alias("n_probes"),
        F.sum("fp").cast("bigint").alias("n_false_pos"),
        F.round(F.sum("fp") / F.count("*"), 6).alias("fpr"),
        F.round(F.lit(exp_fpr), 6).alias("analytic_fpr"),
    )


SQL_BLOOM_FPR = f"""
WITH ks AS (SELECT unnest(range(0, {_BF_K})) AS j),
members AS (SELECT doc_id FROM documents WHERE doc_id % 2 = 0),
probes AS (SELECT doc_id FROM documents WHERE doc_id % 2 = 1),
bits AS (
  SELECT DISTINCT
         ('0x' || substr(md5(doc_id::VARCHAR || ':' || j::VARCHAR), 1, 8))::BIGINT
         % {_BF_M} AS pos
  FROM members CROSS JOIN ks
),
probe_pos AS (
  SELECT doc_id,
         ('0x' || substr(md5(doc_id::VARCHAR || ':' || j::VARCHAR), 1, 8))::BIGINT
         % {_BF_M} AS pos
  FROM probes CROSS JOIN ks
),
hit AS (
  SELECT p.doc_id,
         CASE WHEN count(*) = sum(CASE WHEN b.pos IS NOT NULL THEN 1 ELSE 0 END)
              THEN 1 ELSE 0 END AS fp
  FROM probe_pos p LEFT JOIN bits b ON p.pos = b.pos
  GROUP BY p.doc_id
)
SELECT {_BF_M}::INTEGER AS m_bits, {_BF_K}::INTEGER AS k_hashes,
       (SELECT count(*) FROM members)::BIGINT AS n_members,
       (SELECT count(*) FROM bits)::BIGINT AS bits_set,
       count(*)::BIGINT AS n_probes,
       sum(fp)::BIGINT AS n_false_pos,
       round(sum(fp)::BIGINT / count(*)::DOUBLE, 6) AS fpr,
       round(pow(1.0 - exp(-{_BF_K}.0 * (SELECT count(*) FROM members) / {_BF_M}.0),
                 {_BF_K}), 6) AS analytic_fpr
FROM hit
"""


# -- host-graph coarsening ---------------------------------------------------------

_HG_HOSTS = 32


def q_host_graph_collapse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-graph coarsening: collapse the page-level link graph (same
    deterministic edge set as anchor_text_agg / link_farm_score) onto
    hosts (doc_id mod {_HG_HOSTS}) with edge weights and distinct
    source-page counts — the graph a web-scale ranker actually iterates
    on (10^8 hosts is tractable where 10^11 pages is not; host-level
    PageRank/TrustRank all run on this). Intra-host edges are kept but
    flagged, since host-level ranking drops them while mirror detection
    needs them.

    Scale shape: the collapse is ONE map-side key projection
    (host = f(page)) followed by a (host_src, host_dst) count shuffle —
    at 100 TB this is the single cheapest graph reduction that exists,
    and every downstream graph op then runs 3 orders of magnitude
    smaller. Weights are integer counts, exact everywhere."""
    docs = _read(spark, sf_dir, "documents").select("doc_id")
    n = docs.count()
    base = docs.select(F.col("doc_id").alias("src"))
    edges = base.select(
        "src", ((F.col("src") * 7 + 3) % n).alias("dst")
    ).union(base.select("src", (F.floor(F.col("src") / 3) % n).alias("dst")))
    ed = edges.filter(F.col("src") != F.col("dst")).distinct()
    coll = ed.select(
        (F.col("src") % _HG_HOSTS).alias("host_src"),
        (F.col("dst") % _HG_HOSTS).alias("host_dst"),
        "src",
    )
    return (
        coll.groupBy("host_src", "host_dst")
        .agg(
            F.count("*").cast("bigint").alias("weight"),
            F.countDistinct("src").cast("bigint").alias("n_src_pages"),
        )
        .withColumn(
            "intra_host", (F.col("host_src") == F.col("host_dst")).cast("int")
        )
    )


SQL_HOST_GRAPH_COLLAPSE = f"""
WITH nd AS (SELECT count(*) AS n FROM documents),
edges AS (
  SELECT DISTINCT src, dst FROM (
    SELECT doc_id AS src, (doc_id * 7 + 3) % nd.n AS dst FROM documents, nd
    UNION ALL
    SELECT doc_id AS src, (doc_id // 3) % nd.n AS dst FROM documents, nd
  ) e WHERE src <> dst
)
SELECT src % {_HG_HOSTS} AS host_src, dst % {_HG_HOSTS} AS host_dst,
       count(*)::BIGINT AS weight,
       count(DISTINCT src)::BIGINT AS n_src_pages,
       CASE WHEN src % {_HG_HOSTS} = dst % {_HG_HOSTS} THEN 1 ELSE 0 END AS intra_host
FROM edges
GROUP BY src % {_HG_HOSTS}, dst % {_HG_HOSTS}
"""


# -- classifier calibration audit ----------------------------------------------------

_CAL_BINS = 10


def q_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability-diagram audit of a probabilistic quality classifier:
    bucket predictions into {_CAL_BINS} equal-width confidence bins and
    report per-bin count, mean confidence, empirical accuracy, and the
    |acc − conf| gap whose weighted sum is ECE — the check run before a
    classifier's scores are trusted to threshold 100 TB of data
    (quality_classifier trains one; this audits one). Confidence and
    outcome are hash-derived per doc (label drawn with P(y=1) = conf),
    so the planted truth IS calibrated and both engines audit identical
    predictions.

    Scale shape: pure map + one {_CAL_BINS}-row groupBy — nothing
    leaves the executors but the bin table. Confidences are integer
    hash slices over 2^32 — exact bin assignment on both engines; means
    are integer sums divided once at the end."""
    docs = _read(spark, sf_dir, "documents").select("doc_id")
    h = F.md5(F.col("doc_id").cast("string"))
    u = F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint")  # conf * 2^32
    v = F.conv(F.substring(h, 9, 8), 16, 10).cast("bigint")
    scored = docs.select(
        (F.floor(u * _CAL_BINS / F.lit(2**32))).cast("int").alias("bin"),
        u.alias("conf_units"),
        (v < u).cast("int").alias("label"),
    )
    return (
        scored.groupBy("bin")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.round(F.sum("conf_units") / (F.count("*") * F.lit(2.0**32)), 6).alias(
                "mean_conf"
            ),
            F.round(F.sum("label") / F.count("*"), 6).alias("accuracy"),
            F.round(
                F.abs(
                    F.sum("conf_units") / (F.count("*") * F.lit(2.0**32))
                    - F.sum("label") / F.count("*")
                ),
                6,
            ).alias("gap"),
        )
    )


SQL_CALIBRATION_BINS = f"""
WITH scored AS (
  SELECT CAST(('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT
              * {_CAL_BINS} // 4294967296 AS INTEGER) AS bin,
         ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT AS conf_units,
         CASE WHEN ('0x' || substr(md5(doc_id::VARCHAR), 9, 8))::BIGINT
                   < ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT
              THEN 1 ELSE 0 END AS label
  FROM documents
)
SELECT bin, count(*)::BIGINT AS n,
       round(sum(conf_units)::BIGINT / (count(*) * 4294967296.0), 6) AS mean_conf,
       round(sum(label)::BIGINT / count(*)::DOUBLE, 6) AS accuracy,
       round(abs(sum(conf_units)::BIGINT / (count(*) * 4294967296.0)
                 - sum(label)::BIGINT / count(*)::DOUBLE), 6) AS gap
FROM scored GROUP BY bin
"""


# -- event-type Markov transition matrix --------------------------------------------


def q_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition model over per-user event streams:
    P(next event_type | event_type) with transition counts — the
    behavioural model behind crawl-session simulation and abuse
    detection (a bot's transition matrix is a near-delta; a human's is
    diffuse). Rows sum to 1 per source state.

    Scale shape: one window shuffle keyed by user (partition size = a
    user's history, bounded), then a (state, state) count aggregation
    whose key space is |event types|² — tiny; the probability divisions
    happen on the final aggregate only. Integer counts, one rounded
    division at the end."""
    ev = _read(spark, sf_dir, "events").select(
        "user_id", "event_id", _us("ts").alias("ts_us"), "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    pairs = ev.select(
        F.col("event_type").alias("et"),
        F.lead("event_type").over(w).alias("next_et"),
    ).filter(F.col("next_et").isNotNull())
    counts = pairs.groupBy("et", "next_et").agg(F.count("*").alias("c"))
    tot = counts.groupBy("et").agg(F.sum("c").alias("row_total"))
    return counts.join(tot, "et").select(
        "et",
        "next_et",
        F.col("c").cast("bigint").alias("n"),
        F.round(F.col("c") / F.col("row_total"), 6).alias("p"),
    )


SQL_MARKOV_TRANSITIONS = """
WITH ev AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type
  FROM events
),
pairs AS (
  SELECT event_type AS et,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts_us, event_id) AS next_et
  FROM ev
),
counts AS (
  SELECT et, next_et, count(*) AS c FROM pairs
  WHERE next_et IS NOT NULL GROUP BY et, next_et
),
tot AS (SELECT et, sum(c)::BIGINT AS row_total FROM counts GROUP BY et)
SELECT counts.et, next_et, c::BIGINT AS n,
       round(c / row_total::DOUBLE, 6) AS p
FROM counts JOIN tot ON counts.et = tot.et
"""


# -- Adamic-Adar link prediction ------------------------------------------------------

_AA_TOP = 100


def q_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic-Adar link prediction over the undirected host co-link
    graph: for node pairs at distance 2, AA(a,b) = Σ_{{z∈N(a)∩N(b)}}
    1/ln(deg z) — the classic 'which links are missing' score a crawl
    planner uses to prioritise unexplored cross-site edges (and the
    standard common-neighbour baseline every graph-ML eval includes).
    Uses the same deterministic directed edge set as link_farm_score,
    symmetrised.

    Scale shape: the two-hop enumeration is the canonical wedge
    self-join on the CENTER node z — skew is governed by max degree
    (hub nodes) exactly as in triangle_count, so production salts or
    caps hub wedges; existing edges are removed by one anti-join, and
    only the ≥2-common-neighbour head survives to scoring. Ranking is
    by (common-neighbour count, pair id) — integer-exact — with AA
    emitted rounded."""
    docs = _read(spark, sf_dir, "documents").select("doc_id")
    n = docs.count()
    base = docs.select(F.col("doc_id").alias("src"))
    dir_edges = (
        base.select("src", ((F.col("src") * 7 + 3) % n).alias("dst"))
        .union(base.select("src", (F.floor(F.col("src") / 3) % n).alias("dst")))
        .filter(F.col("src") != F.col("dst"))
    )
    und = (
        dir_edges.select("src", "dst")
        .union(dir_edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
    )
    deg = und.groupBy(F.col("src").alias("z")).agg(F.count("*").alias("deg"))
    e1 = und.select(F.col("dst").alias("z"), F.col("src").alias("a"))
    e2 = und.select(F.col("dst").alias("z"), F.col("src").alias("b"))
    wedges = (
        e1.join(e2, "z")
        .filter(F.col("a") < F.col("b"))
        .join(F.broadcast(deg), "z")
    )
    # per-wedge contribution in integer picounits => the groupBy sum is an
    # exact integer reduction (no float-summation-order dependence)
    pairs = wedges.groupBy("a", "b").agg(
        F.count("*").cast("int").alias("common"),
        F.sum(F.round(1e12 / F.log(F.col("deg").cast("double"))).cast("bigint")).alias(
            "aa_pico"
        ),
    )
    existing = und.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    cand = pairs.join(existing, ["a", "b"], "left_anti").filter(
        F.col("common") >= 2
    )
    w = Window.partitionBy(F.lit(1)).orderBy(
        F.desc("common"), F.asc("a"), F.asc("b")
    )
    return (
        cand.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _AA_TOP)
        .select(
            "a",
            "b",
            "common",
            F.round(F.col("aa_pico") / 1e12, 6).alias("aa_score"),
        )
    )


SQL_ADAMIC_ADAR = f"""
WITH nd AS (SELECT count(*) AS n FROM documents),
de AS (
  SELECT DISTINCT src, dst FROM (
    SELECT doc_id AS src, (doc_id * 7 + 3) % nd.n AS dst FROM documents, nd
    UNION ALL
    SELECT doc_id AS src, (doc_id // 3) % nd.n AS dst FROM documents, nd
  ) e WHERE src <> dst
),
und AS (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM de UNION ALL SELECT dst AS src, src AS dst FROM de
  )
),
deg AS (SELECT src AS z, count(*) AS deg FROM und GROUP BY src),
wedges AS (
  SELECT e1.src AS a, e2.src AS b, e1.dst AS z
  FROM und e1 JOIN und e2 ON e1.dst = e2.dst AND e1.src < e2.src
),
pairs AS (
  SELECT a, b, count(*)::INTEGER AS common,
         sum(round(1e12 / ln(deg::DOUBLE))::BIGINT)::BIGINT AS aa_pico
  FROM wedges JOIN deg USING (z) GROUP BY a, b
),
cand AS (
  SELECT p.* FROM pairs p
  LEFT JOIN und u ON u.src = p.a AND u.dst = p.b
  WHERE u.src IS NULL AND p.common >= 2
)
SELECT a, b, common, round(aa_pico / 1e12, 6) AS aa_score
FROM (
  SELECT *, row_number() OVER (ORDER BY common DESC, a ASC, b ASC) AS rnk
  FROM cand
) WHERE rnk <= {_AA_TOP}
"""


# -- content-defined chunking ----------------------------------------------------------

_CDC_W = 8  # boundary-test window (chars)
_CDC_D = 32  # boundary when window-hash % D == 0 -> mean chunk ~D chars
_CDC_MIN = 16  # minimum chunk length (boundaries inside are suppressed)


def q_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking statistics (the rsync/LBFS/storage-dedup
    primitive): a chunk boundary falls after position i when the hash of
    the {_CDC_W}-char window ending at i is ≡ 0 mod {_CDC_D}, subject to
    a {_CDC_MIN}-char minimum chunk length — boundaries depend only on
    LOCAL content, so an insertion reshuffles one chunk instead of
    re-shifting every fixed-width block (what makes CDC the right
    fingerprint granularity for re-crawled pages whose bytes drift).
    Reports per-doc chunk count and size profile.

    Scale shape: entirely map-side — per-doc window hashing and boundary
    folding inside array expressions, zero shuffle, zero Python. The
    min-length suppression is a sequential fold (position list → kept
    boundaries), identical order both engines."""
    docs = _read(spark, sf_dir, "documents").select("doc_id", "text")
    # candidate boundaries: md5 of the 8-char window ending at i, mod D
    bounds = F.expr(
        f"filter(transform(sequence({_CDC_W}, length(text)), "
        f"i -> IF(pmod(cast(conv(substring(md5(substring(text, i - {_CDC_W} + 1, {_CDC_W})), 1, 8), 16, 10) as bigint)"
        f", {_CDC_D}) = 0, i, -1)), x -> x > 0)"
    )
    # enforce min chunk length with a sequential fold, then close the tail
    kept = F.expr(
        f"aggregate(bounds, array(0), (acc, b) -> "
        f"IF(b - element_at(acc, -1) >= {_CDC_MIN}, concat(acc, array(b)), acc))"
    )
    d = (
        docs.withColumn("bounds", bounds)
        .withColumn("kept", kept)
        .withColumn(
            "cuts",
            F.expr(
                "IF(element_at(kept, -1) = length(text), kept, "
                "concat(kept, array(length(text))))"
            ),
        )
        .withColumn(
            "sizes",
            F.expr(
                "zip_with(slice(cuts, 2, size(cuts) - 1), "
                "slice(cuts, 1, size(cuts) - 1), (hi, lo) -> hi - lo)"
            ),
        )
    )
    return d.select(
        "doc_id",
        F.expr("size(sizes)").cast("int").alias("n_chunks"),
        F.expr("aggregate(sizes, 0, (a, x) -> a + x)").cast("int").alias("total_len"),
        F.round(
            F.expr("aggregate(sizes, 0, (a, x) -> a + x)")
            / F.expr("size(sizes)"),
            4,
        ).alias("mean_chunk"),
        F.expr("array_max(sizes)").cast("int").alias("max_chunk"),
    )


SQL_CDC_CHUNKS = f"""
WITH b AS (
  SELECT doc_id, text,
         list_filter(list_transform(range({_CDC_W}, length(text) + 1),
           i -> CASE WHEN ('0x' || substr(md5(substr(text, CAST(i AS INTEGER) - {_CDC_W} + 1, {_CDC_W})), 1, 8))::BIGINT
                          % {_CDC_D} = 0
                     THEN CAST(i AS INTEGER) ELSE -1 END),
           x -> x > 0) AS bounds
  FROM documents
),
k AS (
  SELECT doc_id, text,
         list_reduce(list_prepend([0], list_transform(bounds, x -> [x])),
                     (acc, b) -> CASE WHEN b[1] - acc[-1] >= {_CDC_MIN}
                                      THEN list_append(acc, b[1]) ELSE acc END)
         AS kept
  FROM b
),
c AS (
  SELECT doc_id,
         CASE WHEN kept[-1] = length(text) THEN kept
              ELSE list_append(kept, length(text)) END AS cuts
  FROM k
),
s AS (
  SELECT doc_id,
         list_transform(range(2, len(cuts) + 1),
                        i -> cuts[CAST(i AS INTEGER)] - cuts[CAST(i AS INTEGER) - 1]) AS sizes
  FROM c
)
SELECT doc_id,
       len(sizes)::INTEGER AS n_chunks,
       list_sum(sizes)::INTEGER AS total_len,
       round(list_sum(sizes) / len(sizes), 4) AS mean_chunk,
       list_max(sizes)::INTEGER AS max_chunk
FROM s
"""


# -- crawl-trap detection --------------------------------------------------------------

_TRAP_HOSTS = (3, 9)  # hosts with planted duplicate-content URL families


def q_crawl_trap_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-trap detection by content-duplication rate: a trap host
    (calendar pages, session-id URL families, infinite facet grids)
    serves MANY distinct URLs with FEW distinct contents — the
    url-to-digest ratio is the classic trap signal a frontier uses to
    down-budget a host before wasting fetches. URLs follow the
    url_path_rollup convention; hosts {_TRAP_HOSTS} get a planted trap:
    their content digest collapses to doc_id % 3 (the deterministic
    in-engine injection precedent), everyone else digests real text.

    Scale shape: one map stage builds (host, url, digest); per-host
    distinct counts are two partial-agg groupBys; the score is
    integer/integer. At 10^10 urls this is the cheapest per-host
    signal that exists — two approx_count_distinct at real scale, kept
    exact here for the oracle."""
    docs = _read(spark, sf_dir, "documents").select("doc_id", "text")
    host_n = F.col("doc_id") % 10
    digest = F.when(
        host_n.isin(*_TRAP_HOSTS), F.md5((F.col("doc_id") % 3).cast("string"))
    ).otherwise(F.md5("text"))
    u = docs.select(
        F.concat(F.lit("h"), host_n.cast("string")).alias("host"),
        F.concat(F.lit("/p"), F.col("doc_id").cast("string")).alias("url"),
        digest.alias("digest"),
    )
    per = u.groupBy("host").agg(
        F.countDistinct("url").cast("bigint").alias("n_urls"),
        F.countDistinct("digest").cast("bigint").alias("n_digests"),
    )
    dup = 1.0 - F.col("n_digests") / F.col("n_urls")
    return per.select(
        "host",
        "n_urls",
        "n_digests",
        F.round(dup, 6).alias("dup_ratio"),
        (dup > 0.5).alias("is_trap"),
    )


SQL_CRAWL_TRAP_SCORE = f"""
WITH u AS (
  SELECT 'h' || (doc_id % 10)::VARCHAR AS host,
         '/p' || doc_id::VARCHAR AS url,
         CASE WHEN doc_id % 10 IN ({", ".join(str(h) for h in _TRAP_HOSTS)})
              THEN md5((doc_id % 3)::VARCHAR) ELSE md5(text) END AS digest
  FROM documents
),
per AS (
  SELECT host, count(DISTINCT url)::BIGINT AS n_urls,
         count(DISTINCT digest)::BIGINT AS n_digests
  FROM u GROUP BY host
)
SELECT host, n_urls, n_digests,
       round(1.0 - n_digests * 1.0 / n_urls, 6) AS dup_ratio,
       (1.0 - n_digests * 1.0 / n_urls) > 0.5 AS is_trap
FROM per
"""


# -- frontier branching factor ---------------------------------------------------------


def q_frontier_branching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-wave frontier growth from the multi-source BFS: node count at
    each crawl depth and the branching factor level_k / level_{{k-1}} —
    the quantity that decides whether a breadth crawl's next wave fits
    the politeness budget (the reference's breadth mode grows exactly
    this way). Unreached (-1) excluded.

    Scale shape: composes q_bfs_levels (Pregel relaxation) with one
    level-cardinality groupBy; the ratio window runs over <=
    {_BFS_ROUNDS}+1 rows."""
    lev = q_bfs_levels(spark, sf_dir).filter(F.col("level") >= 0)
    per = lev.groupBy("level").agg(F.count("*").cast("bigint").alias("n_nodes"))
    w = Window.orderBy("level")
    return per.select(
        "level",
        "n_nodes",
        F.round(
            F.col("n_nodes") / F.lag("n_nodes").over(w), 6
        ).alias("branching"),
    )


# SQL_FRONTIER_BRANCHING is defined after SQL_BFS_LEVELS (it embeds it).


# -- b-bit minwise hashing -------------------------------------------------------------

_BBIT_K = 24  # 1-bit minhash functions
_BBIT_SHINGLE = 3


def q_bbit_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """b-bit minwise hashing with b=1 (Li & König, WWW'10): store only
    the LOWEST BIT of each of {_BBIT_K} minhashes — 64x smaller
    signatures than 64-bit minhash at a quantifiable variance cost,
    which is the storage regime a 10^10-document near-dup index
    actually runs in. For documents paired by doc_id (i, i+1), reports
    the exact 3-gram Jaccard, the b-bit estimate
    J = 2*(agreement - 1/2) (the b=1 unbiasing for dense universes),
    and the absolute error — the audit that sizes k before trusting
    1-bit signatures at scale.

    Scale shape: signatures are pure map-side (k minhash folds per doc,
    bits packed into one int); pairing is a self-join on doc_id+1
    (stand-in for any candidate generator — LSH buckets at scale); the
    exact-Jaccard side exists only to grade the estimator and drops at
    scale."""
    docs = _tokens(_docs_parallel(spark, sf_dir)).filter(
        F.expr(f"size(toks) >= {_BBIT_SHINGLE}")
    )
    sh = docs.select(
        "doc_id",
        F.expr(
            f"array_distinct(transform(sequence(1, size(toks) - {_BBIT_SHINGLE - 1}), i -> "
            f"concat_ws(' ', toks[i - 1], toks[i], toks[i + 1])))"
        ).alias("shingles"),
    )
    bits = " + ".join(
        f"shiftleft(cast(pmod(aggregate(shingles, cast(9223372036854775807 as bigint), "
        f"(acc, s) -> least(acc, cast(conv(substring(md5(concat(s, '#{j}')), 1, 15), 16, 10) as bigint))), 2) as bigint), {j})"
        for j in range(_BBIT_K)
    )
    sig = sh.select("doc_id", "shingles", F.expr(bits).alias("sig"))
    a = sig.alias("a")
    b = sig.select(
        (F.col("doc_id") - 1).alias("pair_id"),
        F.col("shingles").alias("b_shingles"),
        F.col("sig").alias("b_sig"),
    ).alias("b")
    pairs = a.join(b, F.col("a.doc_id") == F.col("pair_id"))
    agree = (
        F.lit(_BBIT_K)
        - F.expr(f"bit_count(a.sig ^ b_sig)")
    ) / F.lit(float(_BBIT_K))
    est = 2.0 * (agree - 0.5)
    inter = F.expr("size(array_intersect(a.shingles, b_shingles))")
    uni = F.expr("size(array_union(a.shingles, b_shingles))")
    exact = inter / uni
    return pairs.select(
        F.col("a.doc_id").alias("a_id"),
        (F.col("a.doc_id") + 1).alias("b_id"),
        F.round(exact, 6).alias("jaccard_exact"),
        F.round(est, 6).alias("jaccard_bbit"),
        F.round(F.abs(est - exact), 6).alias("abs_err"),
    )


def _bbit_sql() -> str:
    mins = " + ".join(
        f"((list_min(list_transform(shingles, s -> ('0x' || substr(md5(s || '#{j}'), 1, 15))::BIGINT)) % 2) << {j})"
        for j in range(_BBIT_K)
    )
    return f"""
WITH toksT AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(len(toks) - {_BBIT_SHINGLE - 2}, 1)),
           i -> toks[CAST(i AS INTEGER)] || ' ' || toks[CAST(i AS INTEGER) + 1] || ' ' || toks[CAST(i AS INTEGER) + 2])) AS shingles
  FROM toksT WHERE len(toks) >= {_BBIT_SHINGLE}
),
sig AS (SELECT doc_id, shingles, ({mins}) AS sig FROM sh),
pairs AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         a.shingles AS sa, b.shingles AS sb, a.sig AS xa, b.sig AS xb
  FROM sig a JOIN sig b ON b.doc_id = a.doc_id + 1
)
SELECT a_id, b_id,
       round(len(list_intersect(sa, sb)) * 1.0 / len(list_distinct(list_concat(sa, sb))), 6) AS jaccard_exact,
       round(2.0 * (({_BBIT_K} - bit_count(xor(xa, xb))) / {float(_BBIT_K)} - 0.5), 6) AS jaccard_bbit,
       round(abs(2.0 * (({_BBIT_K} - bit_count(xor(xa, xb))) / {float(_BBIT_K)} - 0.5)
                 - len(list_intersect(sa, sb)) * 1.0 / len(list_distinct(list_concat(sa, sb)))), 6) AS abs_err
FROM pairs
"""


SQL_BBIT_MINHASH = _bbit_sql()


# -- landmark closeness centrality -----------------------------------------------------

_LC_LANDMARKS = 8
_LC_ROUNDS = 8


def q_landmark_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Landmark-based harmonic closeness (Eppstein-Wang style
    approximation): BFS from ~{_LC_LANDMARKS} hash-chosen landmark nodes
    (md5 coin with rate 1/{_PR_NODES // _LC_LANDMARKS}; the exact count
    is reported per row),
    every node scored by sum over landmarks of 1/d(v, landmark) on the
    undirected host graph (unreachable => 0 contribution). Exact
    closeness is all-pairs (hopeless at web scale); landmark sketches
    are THE production approximation, and the landmark count — not the
    graph size — bounds the state.

    Scale shape: one (node, landmark, dist) state table relaxed for
    {_LC_ROUNDS} Pregel rounds — per round one edge join + min groupBy
    on the composite key + localCheckpoint; state is O(nodes x
    landmarks). Harmonic sums land in integer nano-units (1/d of
    integer d is the only float) so the per-node reduction is exact."""
    edges = _pagerank_edges(spark, sf_dir)
    sym = (
        edges.select("src", "dst")
        .union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = sym.select(F.col("src").alias("node")).distinct()
    lm = nodes.filter(
        F.expr(
            "pmod(cast(conv(substring(md5(cast(node as string)), 1, 8), 16, 10) as bigint), "
            f"{_PR_NODES // _LC_LANDMARKS}) = 0"
        )
    ).select(F.col("node").alias("landmark"))
    state = lm.select(
        F.col("landmark").alias("node"), "landmark", F.lit(0).alias("dist")
    )
    for _ in range(_LC_ROUNDS):
        prop = (
            state.join(sym, F.col("node") == F.col("src"))
            .groupBy(F.col("dst").alias("node"), "landmark")
            .agg((F.min("dist") + 1).alias("ndist"))
        )
        state = (
            state.join(prop, ["node", "landmark"], "full")
            .select(
                "node",
                "landmark",
                F.least(
                    F.coalesce("dist", F.lit(10**9)),
                    F.coalesce("ndist", F.lit(10**9)),
                ).alias("dist"),
            )
            .localCheckpoint(eager=True)
        )
    contrib = state.filter(F.col("dist") > 0).select(
        "node",
        F.round(F.lit(1e9) / F.col("dist")).cast("bigint").alias("h_nano"),
    )
    n_lm = lm.agg(F.count("*").cast("int").alias("n_landmarks"))
    return (
        nodes.join(
            contrib.groupBy("node").agg(
                F.sum("h_nano").alias("s_nano"),
                F.count("*").cast("int").alias("n_reached"),
            ),
            "node",
            "left",
        )
        .crossJoin(F.broadcast(n_lm))
        .select(
            "node",
            "n_landmarks",
            F.coalesce("n_reached", F.lit(0)).cast("int").alias("n_reached"),
            F.round(F.coalesce("s_nano", F.lit(0)) / 1e9, 6).alias("harmonic"),
        )
    )


def _landmark_sql() -> str:
    parts = [
        f"""WITH edges AS (
  SELECT DISTINCT user_id % {_PR_NODES} AS src,
         ('0x' || substr(md5(event_id::VARCHAR), 1, 4))::BIGINT % {_PR_NODES} AS dst
  FROM events
  WHERE user_id % {_PR_NODES}
        <> ('0x' || substr(md5(event_id::VARCHAR), 1, 4))::BIGINT % {_PR_NODES}
),
sym AS (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM edges UNION ALL SELECT dst AS src, src AS dst FROM edges
  )
),
nodesL AS (SELECT DISTINCT src AS node FROM sym),
lm AS (
  SELECT node AS landmark FROM nodesL
  WHERE ('0x' || substr(md5(node::VARCHAR), 1, 8))::BIGINT
        % {_PR_NODES // _LC_LANDMARKS} = 0
),
s0 AS (SELECT landmark AS node, landmark, 0 AS dist FROM lm)"""
    ]
    for t in range(1, _LC_ROUNDS + 1):
        parts.append(
            f""", p{t} AS MATERIALIZED (
  SELECT e.dst AS node, s.landmark, min(s.dist) + 1 AS ndist
  FROM s{t - 1} s JOIN sym e ON e.src = s.node
  GROUP BY e.dst, s.landmark
), s{t} AS MATERIALIZED (
  SELECT coalesce(s.node, p.node) AS node,
         coalesce(s.landmark, p.landmark) AS landmark,
         least(coalesce(s.dist, 1000000000), coalesce(p.ndist, 1000000000)) AS dist
  FROM s{t - 1} s FULL JOIN p{t} p
    ON s.node = p.node AND s.landmark = p.landmark
)"""
        )
    parts.append(
        f"""
SELECT n.node,
       (SELECT count(*) FROM lm)::INTEGER AS n_landmarks,
       coalesce(c.n_reached, 0)::INTEGER AS n_reached,
       round(coalesce(c.s_nano, 0) / 1e9, 6) AS harmonic
FROM nodesL n LEFT JOIN (
  SELECT node, sum(round(1e9 / dist)::BIGINT)::BIGINT AS s_nano,
         count(*)::INTEGER AS n_reached
  FROM s{_LC_ROUNDS} WHERE dist > 0 GROUP BY node
) c ON n.node = c.node"""
    )
    return "".join(parts)


SQL_LANDMARK_CLOSENESS = _landmark_sql()


# -- time-decayed host reputation (EWMA) -----------------------------------------------

_EWMA_ALPHA = 0.25


def q_host_reputation_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-decayed host reputation: an exponentially weighted moving
    average over each host's event values in (ts, event_id) order —
    the recency-weighted health signal a scheduler uses where a plain
    mean is poisoned by ancient history. EWMA_t = a*x_t + (1-a)*EWMA_0
    ... chained in event order; the fold order is the SAME total order
    on both engines, so the float chain is bit-identical before the
    final rounding.

    Scale shape: one groupBy(host) with a sorted collect_list — state
    is per-host event lists, the sequential dependence is irreducible
    (it IS the operator), so the plan bounds it per host and computes
    each fold inside one JVM array expression; at 10^10 events you cap
    per-host history first (politeness already bounds per-host rates).
    user_id % 50 plays host, exactly the graph ops' convention."""
    ev = _read(spark, sf_dir, "events").select(
        (F.col("user_id") % _PR_NODES).alias("host"), "ts", "event_id", "value"
    )
    per = (
        ev.groupBy("host")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", "value"))
            ).alias("h")
        )
        .select(
            "host",
            F.size("h").cast("int").alias("n_events"),
            F.expr(
                f"aggregate(h, cast(NULL as double), (acc, s) -> "
                f"IF(acc IS NULL, s.value, {_EWMA_ALPHA} * s.value + {1 - _EWMA_ALPHA} * acc))"
            ).alias("ewma"),
            F.expr("aggregate(h, cast(0.0 as double), (acc, s) -> acc + s.value)").alias(
                "plain_sum"
            ),
        )
    )
    return per.select(
        "host",
        "n_events",
        F.round("ewma", 6).alias("ewma"),
        F.round(F.col("plain_sum") / F.col("n_events"), 6).alias("plain_mean"),
    )


SQL_HOST_REPUTATION_EWMA = f"""
WITH ev AS (
  SELECT user_id % {_PR_NODES} AS host, ts, event_id, value FROM events
),
per AS (
  SELECT host,
         list(value ORDER BY ts, event_id) AS vals
  FROM ev GROUP BY host
)
SELECT host,
       len(vals)::INTEGER AS n_events,
       round(list_reduce(list_prepend(CAST(NULL AS DOUBLE), vals),
             (acc, x) -> CASE WHEN acc IS NULL THEN x
                              ELSE {_EWMA_ALPHA} * x + {1 - _EWMA_ALPHA} * acc END), 6) AS ewma,
       round(list_sum(list_transform(vals, x -> x::DOUBLE)) / len(vals), 6) AS plain_mean
FROM per
"""


# -- per-edge triangle support (k-truss signal) ----------------------------------------


def q_edge_triangle_support(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-EDGE triangle support — the k-truss building block (Cohen
    2008): how many triangles each undirected edge participates in.
    Edges with support ≥ k-2 survive a k-truss peel; high-support edges
    mark cohesive link clusters (mirror rings), zero-support edges are
    bridges — the edge-granular complement to triangle_count's node
    view. Reports support and the 4-truss candidate flag.

    Scale shape: the same degree-oriented wedge plan as triangle_count
    (arboricity-bounded fan-out), but each closed wedge credits its
    THREE edges via one explode; the (a,b) groupBy is the only
    data-sized shuffle. One peel ROUND is emitted, not the full
    iterative truss decomposition — at scale the peel loops this exact
    plan to fixpoint."""
    und = (
        _pagerank_edges(spark, sf_dir)
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .union(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    o = (
        und.join(F.broadcast(deg).withColumnRenamed("node", "a"), "a")
        .withColumnRenamed("deg", "deg_a")
        .join(F.broadcast(deg).withColumnRenamed("node", "b"), "b")
        .withColumnRenamed("deg", "deg_b")
        .select(
            F.when(
                (F.col("deg_a") < F.col("deg_b"))
                | ((F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))),
                F.struct(F.col("a").alias("u"), F.col("b").alias("v")),
            )
            .otherwise(F.struct(F.col("b").alias("u"), F.col("a").alias("v")))
            .alias("e")
        )
        .select("e.u", "e.v")
    )
    w1, w2 = o.alias("w1"), o.alias("w2")
    tri = (
        w1.join(w2, "u")
        .filter(F.col("w1.v") < F.col("w2.v"))
        .select("u", F.col("w1.v").alias("x"), F.col("w2.v").alias("y"))
        .join(und, (F.col("x") == F.col("a")) & (F.col("y") == F.col("b")))
        .select("u", "x", "y")
    )
    tri_edges = tri.select(
        F.explode(
            F.expr(
                "array(struct(least(u, x) as a, greatest(u, x) as b), "
                "struct(least(u, y) as a, greatest(u, y) as b), "
                "struct(least(x, y) as a, greatest(x, y) as b))"
            )
        ).alias("e")
    ).select("e.a", "e.b")
    sup = tri_edges.groupBy("a", "b").agg(F.count("*").cast("bigint").alias("support"))
    return (
        und.join(sup, ["a", "b"], "left")
        .select(
            "a",
            "b",
            F.coalesce("support", F.lit(0)).cast("bigint").alias("support"),
            (F.coalesce("support", F.lit(0)) >= 2).alias("in_4truss"),
        )
    )


SQL_EDGE_TRIANGLE_SUPPORT = f"""
WITH edges AS (
  SELECT DISTINCT user_id % {_PR_NODES} AS src,
         ('0x' || substr(md5(event_id::VARCHAR), 1, 4))::BIGINT % {_PR_NODES} AS dst
  FROM events
  WHERE user_id % {_PR_NODES}
        <> ('0x' || substr(md5(event_id::VARCHAR), 1, 4))::BIGINT % {_PR_NODES}
),
und AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM edges
),
deg AS (
  SELECT node, count(*) AS deg FROM (
    SELECT a AS node FROM und UNION ALL SELECT b FROM und
  ) t GROUP BY node
),
o AS (
  SELECT CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND u.a < u.b)
              THEN u.a ELSE u.b END AS u,
         CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND u.a < u.b)
              THEN u.b ELSE u.a END AS v
  FROM und u JOIN deg da ON u.a = da.node JOIN deg db ON u.b = db.node
),
tri AS (
  SELECT w1.u AS u, w1.v AS x, w2.v AS y
  FROM o w1 JOIN o w2 ON w1.u = w2.u AND w1.v < w2.v
  JOIN und e ON w1.v = e.a AND w2.v = e.b
),
tri_edges AS (
  SELECT least(u, x) AS a, greatest(u, x) AS b FROM tri
  UNION ALL SELECT least(u, y), greatest(u, y) FROM tri
  UNION ALL SELECT least(x, y), greatest(x, y) FROM tri
),
sup AS (SELECT a, b, count(*)::BIGINT AS support FROM tri_edges GROUP BY a, b)
SELECT u.a, u.b, coalesce(s.support, 0)::BIGINT AS support,
       coalesce(s.support, 0) >= 2 AS in_4truss
FROM und u LEFT JOIN sup s USING (a, b)
"""


# -- URL path-prefix rollup ------------------------------------------------------------

_UPR_DEPTH = 3


def q_url_path_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical URL path rollup — per (host, path-prefix) page count
    and byte mass at every directory depth, the 'which subtrees are
    heavy' view a crawl budgeter and a CDX compactor both need (and the
    natural GROUP BY ROLLUP shape expressed as an explicit prefix
    explode so both engines see identical rows). Paths are synthesized
    deterministically per doc (the surt_cdx convention, two directory
    levels + leaf).

    Scale shape: each url contributes exactly depth rows (bounded
    explode), then one (host, prefix) groupBy with map-side partials —
    the same plan at 10^10 urls; no windows, no skew beyond genuinely
    hot subtrees, which ARE the answer."""
    docs = _read(spark, sf_dir, "documents").select("doc_id", "n_chars")
    host = F.concat(F.lit("h"), (F.col("doc_id") % 10).cast("string"))
    s1 = F.concat(F.lit("/s"), (F.col("doc_id") % 5).cast("string"))
    s2 = F.concat(s1, F.lit("/t"), (F.col("doc_id") % 7).cast("string"))
    s3 = F.concat(s2, F.lit("/p"), F.col("doc_id").cast("string"))
    pref = docs.select(
        host.alias("host"),
        "n_chars",
        F.posexplode(F.array(s1, s2, s3)).alias("d", "prefix"),
    )
    return (
        pref.groupBy("host", "prefix")
        .agg(
            F.max(F.col("d") + 1).cast("int").alias("depth"),
            F.count("*").cast("bigint").alias("n_pages"),
            F.sum("n_chars").cast("bigint").alias("bytes"),
        )
    )


SQL_URL_PATH_ROLLUP = """
WITH p AS (
  SELECT 'h' || (doc_id % 10)::VARCHAR AS host, n_chars,
         '/s' || (doc_id % 5)::VARCHAR AS s1,
         '/s' || (doc_id % 5)::VARCHAR || '/t' || (doc_id % 7)::VARCHAR AS s2,
         '/s' || (doc_id % 5)::VARCHAR || '/t' || (doc_id % 7)::VARCHAR
             || '/p' || doc_id::VARCHAR AS s3
  FROM documents
),
e AS (
  SELECT host, n_chars, 1 AS d, s1 AS prefix FROM p
  UNION ALL SELECT host, n_chars, 2, s2 FROM p
  UNION ALL SELECT host, n_chars, 3, s3 FROM p
)
SELECT host, prefix, max(d)::INTEGER AS depth,
       count(*)::BIGINT AS n_pages, sum(n_chars)::BIGINT AS bytes
FROM e GROUP BY host, prefix
"""


# -- mergeable-histogram quantile estimation -------------------------------------------

_HQ_BINS = 64
_HQ_QS = (0.5, 0.9, 0.99)


def q_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile estimation from a mergeable equi-width histogram — the
    100 TB quantile plan: per-partition histograms combine by adding
    bin counts (exactly what the partial agg does), so no global sort
    ever happens; the estimate interpolates linearly inside the hit
    bin. Reports, per (event_type, q), the estimate, the EXACT rank
    quantile (lower value at rank ceil(q*n), integer semantics), and
    the absolute error — the accuracy audit that tells you whether
    {_HQ_BINS} bins suffice before you trust the sketch at scale.

    Scale shape: min/max one agg, bin counts one groupBy (map-side
    partial = the histogram merge), the cumulative walk runs over
    |types| x {_HQ_BINS} rows; the exact reference uses the bounded
    per-type rank window (small-sf oracle only — at 10^10 rows you keep
    the histogram and drop the exact side)."""
    ev = _read(spark, sf_dir, "events").select("event_id", "event_type", "value")
    mm = ev.groupBy("event_type").agg(
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
        F.count("*").cast("bigint").alias("n"),
    )
    binned = (
        ev.join(F.broadcast(mm), "event_type")
        .withColumn(
            "bin",
            F.when(F.col("hi") == F.col("lo"), F.lit(0)).otherwise(
                F.least(
                    F.lit(_HQ_BINS - 1),
                    F.floor(
                        (F.col("value") - F.col("lo"))
                        / ((F.col("hi") - F.col("lo")) / _HQ_BINS)
                    ).cast("int"),
                )
            ),
        )
        .groupBy("event_type", "bin")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = binned.withColumn("cum", F.sum("c").over(wcum)).join(
        F.broadcast(mm), "event_type"
    )
    qs = spark.createDataFrame([(q,) for q in _HQ_QS], "q double")
    hit = (
        cum.crossJoin(F.broadcast(qs))
        .filter(F.col("cum") >= F.col("q") * F.col("n"))
        .groupBy("event_type", "q")
        .agg(
            F.min_by(
                F.struct("bin", "c", "cum", "lo", "hi", "n"), F.col("bin")
            ).alias("s")
        )
        .select("event_type", "q", "s.*")
    )
    width = (F.col("hi") - F.col("lo")) / _HQ_BINS
    est = F.col("lo") + width * (
        F.col("bin")
        + (F.col("q") * F.col("n") - (F.col("cum") - F.col("c"))) / F.col("c")
    )
    # exact rank quantile: lower value at rank ceil(q*n)
    wv = Window.partitionBy("event_type").orderBy(F.asc("value"), F.asc("event_id"))
    ranked = ev.withColumn("rn", F.row_number().over(wv)).join(
        F.broadcast(mm.select("event_type", "n")), "event_type"
    )
    exact = (
        ranked.crossJoin(F.broadcast(qs))
        .filter(F.col("rn") == F.ceil(F.col("q") * F.col("n")).cast("bigint"))
        .select("event_type", "q", F.col("value").alias("exact_q"))
    )
    return (
        hit.join(F.broadcast(exact), ["event_type", "q"])
        .select(
            "event_type",
            "q",
            F.round(est, 6).alias("hist_q"),
            "exact_q",
            F.round(F.abs(est - F.col("exact_q")), 6).alias("abs_err"),
        )
    )


SQL_HISTOGRAM_QUANTILES = f"""
WITH ev AS (SELECT event_id, event_type, value FROM events),
mm AS (
  SELECT event_type, min(value) AS lo, max(value) AS hi, count(*)::BIGINT AS n
  FROM ev GROUP BY event_type
),
binned AS (
  SELECT ev.event_type,
         CASE WHEN mm.hi = mm.lo THEN 0
              ELSE least({_HQ_BINS - 1},
                   floor((ev.value - mm.lo) / ((mm.hi - mm.lo) / {_HQ_BINS}))::INTEGER)
         END AS bin,
         count(*)::BIGINT AS c
  FROM ev JOIN mm USING (event_type)
  GROUP BY 1, 2
),
cum AS (
  SELECT b.*, mm.lo, mm.hi, mm.n,
         sum(c) OVER (PARTITION BY event_type ORDER BY bin
                      ROWS UNBOUNDED PRECEDING)::BIGINT AS cum
  FROM binned b JOIN mm USING (event_type)
),
qs AS (SELECT unnest([{", ".join(str(q) for q in _HQ_QS)}]) AS q),
hit AS (
  SELECT event_type, q,
         min_by(bin, bin) AS bin, min_by(c, bin) AS c, min_by(cum, bin) AS cum,
         min_by(lo, bin) AS lo, min_by(hi, bin) AS hi, min_by(n, bin) AS n
  FROM cum, qs WHERE cum >= q * n
  GROUP BY event_type, q
),
ranked AS (
  SELECT ev.*, row_number() OVER (PARTITION BY event_type
                                  ORDER BY value ASC, event_id ASC) AS rn,
         mm.n
  FROM ev JOIN mm USING (event_type)
),
exact AS (
  SELECT event_type, q, value AS exact_q
  FROM ranked, qs WHERE rn = ceil(q * n)::BIGINT
)
SELECT h.event_type, h.q,
       round(h.lo + (h.hi - h.lo) / {_HQ_BINS} *
             (h.bin + (h.q * h.n - (h.cum - h.c)) / h.c), 6) AS hist_q,
       e.exact_q,
       round(abs(h.lo + (h.hi - h.lo) / {_HQ_BINS} *
             (h.bin + (h.q * h.n - (h.cum - h.c)) / h.c) - e.exact_q), 6) AS abs_err
FROM hit h JOIN exact e USING (event_type, q)
"""


# -- web bow-tie decomposition ---------------------------------------------------------

_BT_ROUNDS = 8


def q_bowtie_structure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broder et al.'s bow-tie decomposition of the directed host graph
    (WWW'00, 'Graph structure in the Web'): CORE = the SCC of the
    minimum-id node, IN = nodes that reach the core, OUT = nodes the
    core reaches, OTHER = tendrils/disconnected. One forward and one
    backward min-label propagation decide all four classes: f(v) =
    min label v reaches, b(v) = min label that reaches v; with m the
    global min node, v∈CORE iff f=b=m, v∈IN iff only f=m, v∈OUT iff
    only b=m.

    Scale shape: two independent {_BT_ROUNDS}-round Pregel relaxations
    (edge join + min groupBy + localCheckpoint each round — the
    scc_mutual topology); classification is a map over the joined label
    tables. Convergence to true reachability is pinned by the python
    test."""
    edges = _pagerank_edges(spark, sf_dir).localCheckpoint(eager=True)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )

    def relax(rev: bool) -> DataFrame:
        e = (
            edges.select(F.col("dst").alias("u"), F.col("src").alias("v"))
            if rev
            else edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        )
        lbl = nodes.select("node", F.col("node").alias("lbl"))
        for _ in range(_BT_ROUNDS):
            prop = (
                lbl.join(e, F.col("node") == F.col("v"))
                .groupBy(F.col("u").alias("node"))
                .agg(F.min("lbl").alias("plbl"))
            )
            lbl = (
                lbl.join(prop, "node", "left")
                .select(
                    "node",
                    F.least(F.col("lbl"), F.coalesce("plbl", F.col("lbl"))).alias(
                        "lbl"
                    ),
                )
                .localCheckpoint(eager=True)
            )
        return lbl

    # f(v): min label reachable FORWARD from v — propagate against edge
    # direction (v gets labels of its out-neighbors)
    f = relax(rev=False).withColumnRenamed("lbl", "f")
    b = relax(rev=True).withColumnRenamed("lbl", "b")
    m = nodes.agg(F.min("node").alias("m"))
    return (
        f.join(b, "node")
        .crossJoin(F.broadcast(m))
        .select(
            "node",
            F.when((F.col("f") == F.col("m")) & (F.col("b") == F.col("m")), "CORE")
            .when(F.col("f") == F.col("m"), "IN")
            .when(F.col("b") == F.col("m"), "OUT")
            .otherwise("OTHER")
            .alias("component"),
        )
    )


def _bowtie_sql() -> str:
    parts = [
        f"""WITH edges AS (
  SELECT DISTINCT user_id % {_PR_NODES} AS src,
         ('0x' || substr(md5(event_id::VARCHAR), 1, 4))::BIGINT % {_PR_NODES} AS dst
  FROM events
  WHERE user_id % {_PR_NODES}
        <> ('0x' || substr(md5(event_id::VARCHAR), 1, 4))::BIGINT % {_PR_NODES}
),
nodesB AS (SELECT DISTINCT node FROM (SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges)),
ef AS (SELECT src AS u, dst AS v FROM edges),
eb AS (SELECT dst AS u, src AS v FROM edges),
f0 AS (SELECT node, node AS lbl FROM nodesB),
b0 AS (SELECT node, node AS lbl FROM nodesB)"""
    ]
    for g, e in (("f", "ef"), ("b", "eb")):
        for t in range(1, _BT_ROUNDS + 1):
            parts.append(
                f""", {g}p{t} AS MATERIALIZED (
  SELECT e.u AS node, min(l.lbl) AS plbl
  FROM {g}{t - 1} l JOIN {e} e ON e.v = l.node GROUP BY e.u
), {g}{t} AS MATERIALIZED (
  SELECT l.node, least(l.lbl, coalesce(p.plbl, l.lbl)) AS lbl
  FROM {g}{t - 1} l LEFT JOIN {g}p{t} p USING (node)
)"""
            )
    parts.append(
        f"""
SELECT f.node,
       CASE WHEN f.lbl = m.m AND b.lbl = m.m THEN 'CORE'
            WHEN f.lbl = m.m THEN 'IN'
            WHEN b.lbl = m.m THEN 'OUT'
            ELSE 'OTHER' END AS component
FROM f{_BT_ROUNDS} f
JOIN b{_BT_ROUNDS} b USING (node)
CROSS JOIN (SELECT min(node) AS m FROM nodesB) m"""
    )
    return "".join(parts)


SQL_BOWTIE_STRUCTURE = _bowtie_sql()


# -- hub-removal percolation (attack robustness) ---------------------------------------

_AR_REMOVE_K = 5
_AR_ROUNDS = 12


def q_attack_robustness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Targeted-attack percolation (Albert, Jeong & Barabási, Nature
    2000): remove the top-{_AR_REMOVE_K} hubs by degree from the host
    graph and measure how the largest connected component collapses —
    THE robustness audit for a crawl frontier (how much of the web do
    you lose if the biggest hub hosts ban you). Components via
    min-label relaxation, {_AR_ROUNDS} unrolled rounds on both the full
    and the attacked graph; convergence to true components is pinned by
    the python-CC property test.

    Scale shape: hub selection is a window over the host-cardinality
    degree table; each relaxation round is one edge-join + min-groupBy
    + localCheckpoint (the bfs_levels/scc_mutual topology). Component
    sizes are one count per label; only two scalars leave the
    executors."""
    und = (
        _pagerank_edges(spark, sf_dir)
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        und.select(F.col("a").alias("node"))
        .union(und.select(F.col("b").alias("node")))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .union(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    wdeg = Window.orderBy(F.desc("deg"), F.asc("node"))
    hubs = (
        deg.withColumn("rnk", F.row_number().over(wdeg))
        .filter(F.col("rnk") <= _AR_REMOVE_K)
        .select("node")
    )

    def lcc_size(edges: DataFrame, verts: DataFrame) -> DataFrame:
        sym = edges.select(F.col("a").alias("u"), F.col("b").alias("v")).union(
            edges.select(F.col("b").alias("u"), F.col("a").alias("v"))
        )
        lbl = verts.select("node", F.col("node").alias("lbl"))
        for _ in range(_AR_ROUNDS):
            prop = (
                lbl.join(sym, F.col("node") == F.col("u"))
                .groupBy(F.col("v").alias("node"))
                .agg(F.min("lbl").alias("plbl"))
            )
            lbl = (
                lbl.join(prop, "node", "left")
                .select(
                    "node",
                    F.least(F.col("lbl"), F.coalesce("plbl", F.col("lbl"))).alias(
                        "lbl"
                    ),
                )
                .localCheckpoint(eager=True)
            )
        return lbl.groupBy("lbl").agg(F.count("*").alias("sz")).agg(
            F.max("sz").cast("bigint").alias("lcc")
        )

    full = lcc_size(und, nodes)
    verts2 = nodes.join(hubs, "node", "left_anti")
    edges2 = (
        und.join(hubs.withColumnRenamed("node", "a"), "a", "left_anti")
        .join(hubs.withColumnRenamed("node", "b"), "b", "left_anti")
        .select("a", "b")
    )
    after = lcc_size(edges2, verts2)
    n_nodes = nodes.agg(F.count("*").cast("bigint").alias("n_nodes"))
    m_edges = und.agg(F.count("*").cast("bigint").alias("n_edges"))
    return (
        n_nodes.crossJoin(m_edges)
        .crossJoin(full.withColumnRenamed("lcc", "lcc_full"))
        .crossJoin(after.withColumnRenamed("lcc", "lcc_attacked"))
        .select(
            "n_nodes",
            "n_edges",
            F.lit(_AR_REMOVE_K).cast("int").alias("removed_hubs"),
            "lcc_full",
            "lcc_attacked",
            F.round(
                F.col("lcc_attacked") / (F.col("n_nodes") - _AR_REMOVE_K), 6
            ).alias("lcc_frac_after"),
        )
    )


def _attack_sql() -> str:
    rounds = []
    for g, (edges, verts) in {
        "f": ("undA", "nodesA"),
        "x": ("edges2", "verts2"),
    }.items():
        rounds.append(
            f""", sym_{g} AS (
  SELECT a AS u, b AS v FROM {edges} UNION ALL SELECT b AS u, a AS v FROM {edges}
), l{g}0 AS (SELECT node, node AS lbl FROM {verts})"""
        )
        for t in range(1, _AR_ROUNDS + 1):
            rounds.append(
                f""", p{g}{t} AS MATERIALIZED (
  SELECT s.v AS node, min(l.lbl) AS plbl
  FROM l{g}{t - 1} l JOIN sym_{g} s ON s.u = l.node GROUP BY s.v
), l{g}{t} AS MATERIALIZED (
  SELECT l.node, least(l.lbl, coalesce(p.plbl, l.lbl)) AS lbl
  FROM l{g}{t - 1} l LEFT JOIN p{g}{t} p USING (node)
)"""
            )
        rounds.append(
            f""", lcc_{g} AS (
  SELECT max(sz)::BIGINT AS lcc FROM (
    SELECT lbl, count(*) AS sz FROM l{g}{_AR_ROUNDS} GROUP BY lbl
  )
)"""
        )
    return (
        f"""WITH edges AS (
  SELECT DISTINCT user_id % {_PR_NODES} AS src,
         ('0x' || substr(md5(event_id::VARCHAR), 1, 4))::BIGINT % {_PR_NODES} AS dst
  FROM events
  WHERE user_id % {_PR_NODES}
        <> ('0x' || substr(md5(event_id::VARCHAR), 1, 4))::BIGINT % {_PR_NODES}
),
undA AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM edges),
nodesA AS (SELECT DISTINCT node FROM (SELECT a AS node FROM undA UNION ALL SELECT b FROM undA)),
degA AS (
  SELECT node, count(*) AS deg FROM (
    SELECT a AS node FROM undA UNION ALL SELECT b FROM undA
  ) t GROUP BY node
),
hubs AS (
  SELECT node FROM (
    SELECT node, row_number() OVER (ORDER BY deg DESC, node ASC) AS rnk FROM degA
  ) WHERE rnk <= {_AR_REMOVE_K}
),
verts2 AS (SELECT node FROM nodesA WHERE node NOT IN (SELECT node FROM hubs)),
edges2 AS (
  SELECT a, b FROM undA
  WHERE a NOT IN (SELECT node FROM hubs) AND b NOT IN (SELECT node FROM hubs)
)"""
        + "".join(rounds)
        + f"""
SELECT (SELECT count(*) FROM nodesA)::BIGINT AS n_nodes,
       (SELECT count(*) FROM undA)::BIGINT AS n_edges,
       {_AR_REMOVE_K}::INTEGER AS removed_hubs,
       lcc_f.lcc AS lcc_full,
       lcc_x.lcc AS lcc_attacked,
       round(lcc_x.lcc / ((SELECT count(*) FROM nodesA) - {_AR_REMOVE_K}), 6) AS lcc_frac_after
FROM lcc_f, lcc_x"""
    )


SQL_ATTACK_ROBUSTNESS = _attack_sql()


# -- HLL merge across sources ----------------------------------------------------------


def q_hll_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog MERGE — the property that makes the sketch the
    100 TB distinct-counter: per-source register sets over distinct
    tokens union via max(register), and the merged estimate approximates
    the corpus-wide distinct count without ever re-touching the data.
    The 2^-rho harmonic sum is computed as EXACT integers scaled by
    2^52 (missing buckets contribute 2^52 each), so the only float in
    the op is the final closed-form estimate; the small-range
    linear-counting correction applies when est <= 2.5m and empty
    buckets exist (Flajolet et al. 2007).

    Scale shape: per-source register build = one distinct + one groupBy
    (both map-side-partial); the merge is a second groupBy over
    (bucket) of at most sources x m rows. Nothing here grows with the
    corpus beyond the distinct pass."""
    m = 1 << _HLL_P
    lowbits = 60 - _HLL_P
    toks = _tokens(_read(spark, sf_dir, "documents")).select(
        "source", F.explode("toks").alias("tok")
    )
    dist = toks.distinct()
    hashed = dist.withColumn(
        "hv", F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("long")
    )
    reg = (
        hashed.select(
            "source",
            F.shiftright("hv", lowbits).alias("bucket"),
            F.col("hv").bitwiseAND(F.lit((1 << lowbits) - 1)).alias("w"),
        )
        .withColumn(
            "rho",
            F.when(F.col("w") == 0, F.lit(lowbits + 1)).otherwise(
                F.lit(lowbits) - F.length(F.bin("w")) + 1
            ),
        )
        .groupBy("source", "bucket")
        .agg(F.max("rho").alias("rho"))
    )
    merged = reg.groupBy("bucket").agg(F.max("rho").alias("rho"))
    # integer harmonic sum: sum 2^-rho == S / 2^52 with term 2^(52-rho)
    stats = merged.agg(
        F.count("*").cast("bigint").alias("n_present"),
        F.sum(F.expr("shiftleft(cast(1 as bigint), 52 - cast(rho as int))"))
        .cast("bigint")
        .alias("s_present"),
    )
    alpha = 0.7213 / (1.0 + 1.079 / m)
    s_total = (F.col("s_present") + (F.lit(m) - F.col("n_present")) * F.lit(1 << 52)).cast(
        "double"
    )
    raw = F.lit(alpha * m * m * float(1 << 52)) / s_total
    zeros = F.lit(m) - F.col("n_present")
    est = F.when(
        (raw <= 2.5 * m) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(raw)
    exact = dist.select("tok").distinct().agg(
        F.count("*").cast("bigint").alias("exact_distinct")
    )
    n_src = reg.select("source").distinct().agg(
        F.count("*").cast("int").alias("n_sources")
    )
    return (
        stats.crossJoin(F.broadcast(exact))
        .crossJoin(F.broadcast(n_src))
        .select(
            "n_sources",
            F.round(est, 4).alias("hll_estimate"),
            "exact_distinct",
            F.round(F.abs(est - F.col("exact_distinct")) / F.col("exact_distinct"), 6).alias(
                "rel_err"
            ),
        )
    )


SQL_HLL_MERGE = f"""
WITH toks AS (
  SELECT DISTINCT source, unnest({_SQL_TOKS}) AS tok FROM documents
),
hashed AS (
  SELECT source, tok, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS hv FROM toks
),
regw AS (
  SELECT source, hv >> {60 - _HLL_P} AS bucket,
         hv & {(1 << (60 - _HLL_P)) - 1} AS w
  FROM hashed
),
reg AS (
  SELECT source, bucket,
         max(CASE WHEN w = 0 THEN {60 - _HLL_P + 1}
                  ELSE {60 - _HLL_P} - length(bin(w)::VARCHAR) + 1 END) AS rho
  FROM regw GROUP BY source, bucket
),
merged AS (SELECT bucket, max(rho) AS rho FROM reg GROUP BY bucket),
stats AS (
  SELECT count(*)::BIGINT AS n_present,
         sum((1::BIGINT << (52 - rho)))::BIGINT AS s_present
  FROM merged
),
ex AS (SELECT count(DISTINCT tok)::BIGINT AS exact_distinct FROM toks),
ns AS (SELECT count(DISTINCT source)::INTEGER AS n_sources FROM reg),
calc AS (
  SELECT n_present, s_present,
         (s_present + ({1 << _HLL_P} - n_present) * {1 << 52})::DOUBLE AS s_total
  FROM stats
),
est AS (
  SELECT CASE WHEN ({"%.17e" % (0.7213 / (1.0 + 1.079 / (1 << _HLL_P)) * (1 << _HLL_P) * (1 << _HLL_P) * float(1 << 52))} / s_total) <= {2.5 * (1 << _HLL_P)}
                   AND ({1 << _HLL_P} - n_present) > 0
              THEN {float(1 << _HLL_P)} * ln({float(1 << _HLL_P)} / ({1 << _HLL_P} - n_present))
              ELSE {"%.17e" % (0.7213 / (1.0 + 1.079 / (1 << _HLL_P)) * (1 << _HLL_P) * (1 << _HLL_P) * float(1 << 52))} / s_total
         END AS e
  FROM calc
)
SELECT ns.n_sources, round(est.e, 4) AS hll_estimate, ex.exact_distinct,
       round(abs(est.e - ex.exact_distinct) / ex.exact_distinct, 6) AS rel_err
FROM est, ex, ns
"""


# -- character-level Shannon entropy ---------------------------------------------------


def q_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document character-level Shannon entropy (bits/char) — the
    compression-ratio quality signal: gibberish and binary-leak pages
    sit far from natural-language entropy (~4.0-4.5 bits for English),
    repetitive boilerplate sits low. Complements quality_score's ratio
    features with an information-theoretic one.

    Scale shape: char explode -> (doc_id, ch) count -> per-doc sum, the
    token-counting topology with map-side partials; per-(doc,ch) terms
    land in integer nano-bits so the doc sum is exact."""
    docs = _read(spark, sf_dir, "documents").select("doc_id", "text")
    ch = docs.select(
        "doc_id",
        F.explode(
            F.expr("transform(sequence(1, length(text)), i -> substring(text, i, 1))")
        ).alias("ch"),
    )
    cnt = ch.groupBy("doc_id", "ch").agg(F.count("*").alias("c"))
    tot = cnt.groupBy("doc_id").agg(F.sum("c").cast("bigint").alias("n"))
    # micro-units, not nano: Java's and libm's log2 disagree by enough ulps
    # that nano-rounding flips per-term at ~1e-5 — micro leaves 1000x margin
    term = F.round(
        -(F.col("c") / F.col("n")) * F.log2(F.col("c") / F.col("n")) * 1e6
    ).cast("bigint")
    return (
        cnt.join(tot, "doc_id")
        .select("doc_id", "n", term.alias("t_micro"))
        .groupBy("doc_id")
        .agg(
            F.max("n").cast("bigint").alias("n_chars"),
            F.count("*").cast("int").alias("n_distinct_chars"),
            F.round(F.sum("t_micro") / 1e6, 6).alias("entropy_bits"),
        )
    )


SQL_CHAR_ENTROPY = """
WITH ch AS (
  SELECT doc_id,
         unnest(list_transform(range(1, length(text) + 1),
                i -> substr(text, CAST(i AS INTEGER), 1))) AS ch
  FROM documents
),
cnt AS (SELECT doc_id, ch, count(*) AS c FROM ch GROUP BY doc_id, ch),
tot AS (SELECT doc_id, sum(c)::BIGINT AS n FROM cnt GROUP BY doc_id)
SELECT doc_id, max(n)::BIGINT AS n_chars,
       count(*)::INTEGER AS n_distinct_chars,
       round(sum(round(-(c * 1.0 / n) * log2(c * 1.0 / n) * 1e6)::BIGINT) / 1e6, 6) AS entropy_bits
FROM cnt JOIN tot USING (doc_id)
GROUP BY doc_id
"""


# -- degree assortativity (Newman) -----------------------------------------------------


def q_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman's degree-assortativity coefficient of the undirected host
    graph (Phys. Rev. Lett. 89, 2002): the Pearson correlation of the
    degrees at either end of an edge. Negative r is the signature of
    the web's hub-and-spoke structure (hubs link to leaves); a spam
    link farm shows r near +1 — so the single scalar is a cheap
    corpus-level spam/health probe next to link_farm_score's per-node
    signals.

    Scale shape: degrees are one groupBy; the per-edge (j,k) stream is
    two broadcast joins; ALL three moment sums (sum jk, sum j+k,
    sum j^2+k^2) are integer — the final r is one double expression
    over six integers, so there is no float-summation-order surface at
    all."""
    und = (
        _pagerank_edges(spark, sf_dir)
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .union(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("bigint").alias("deg"))
    )
    jk = (
        und.join(F.broadcast(deg).withColumnRenamed("node", "a"), "a")
        .withColumnRenamed("deg", "j")
        .join(F.broadcast(deg).withColumnRenamed("node", "b"), "b")
        .withColumnRenamed("deg", "k")
    )
    sums = jk.agg(
        F.count("*").cast("bigint").alias("m"),
        F.sum(F.col("j") * F.col("k")).cast("bigint").alias("s_jk"),
        F.sum(F.col("j") + F.col("k")).cast("bigint").alias("s_sum"),
        F.sum(F.col("j") * F.col("j") + F.col("k") * F.col("k"))
        .cast("bigint")
        .alias("s_sq"),
    )
    mean_half = F.col("s_sum") / (2.0 * F.col("m"))
    r = (F.col("s_jk") / F.col("m") - mean_half * mean_half) / (
        F.col("s_sq") / (2.0 * F.col("m")) - mean_half * mean_half
    )
    # degenerate regular graph (all degrees equal => zero variance): the
    # integer predicate 2*m*s_sq == s_sum^2 detects it exactly, no float zero
    degenerate = F.col("s_sq") * 2 * F.col("m") == F.col("s_sum") * F.col("s_sum")
    return sums.select(
        F.col("m").alias("n_edges"),
        F.when(degenerate, F.lit(0.0)).otherwise(F.round(r, 6)).alias("assortativity"),
    )


SQL_DEGREE_ASSORTATIVITY = f"""
WITH edges AS (
  SELECT DISTINCT user_id % {_PR_NODES} AS src,
         ('0x' || substr(md5(event_id::VARCHAR), 1, 4))::BIGINT % {_PR_NODES} AS dst
  FROM events
  WHERE user_id % {_PR_NODES}
        <> ('0x' || substr(md5(event_id::VARCHAR), 1, 4))::BIGINT % {_PR_NODES}
),
und AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM edges
),
deg AS (
  SELECT node, count(*)::BIGINT AS deg FROM (
    SELECT a AS node FROM und UNION ALL SELECT b FROM und
  ) t GROUP BY node
),
jk AS (
  SELECT da.deg AS j, db.deg AS k
  FROM und u JOIN deg da ON u.a = da.node JOIN deg db ON u.b = db.node
),
s AS (
  SELECT count(*)::BIGINT AS m, sum(j * k)::BIGINT AS s_jk,
         sum(j + k)::BIGINT AS s_sum, sum(j * j + k * k)::BIGINT AS s_sq
  FROM jk
)
SELECT m AS n_edges,
       CASE WHEN s_sq * 2 * m = s_sum * s_sum THEN 0.0
            ELSE round((s_jk / m - (s_sum / (2.0 * m)) * (s_sum / (2.0 * m))) /
                       (s_sq / (2.0 * m) - (s_sum / (2.0 * m)) * (s_sum / (2.0 * m))), 6)
       END AS assortativity
FROM s
"""


# -- local clustering coefficient ------------------------------------------------------


def q_local_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node local clustering coefficient c(v) = 2*T(v) /
    (deg(v)*(deg(v)-1)) over the host graph — Watts-Strogatz; tightly
    clustered neighborhoods around a host are the mirror-cluster /
    link-ring signature that complements triangle counts with a
    degree-normalized score. Nodes with deg < 2 report 0.

    Scale shape: composes q_triangle_count (degree-oriented wedge plan,
    arboricity-bounded) with the degree table via one left join; both
    inputs are host-cardinality, so the join side is broadcastable. The
    ratio is integer/integer — no float surface."""
    tri = q_triangle_count(spark, sf_dir)
    und = (
        _pagerank_edges(spark, sf_dir)
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .union(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("bigint").alias("deg"))
    )
    return (
        deg.join(F.broadcast(tri), "node", "left")
        .select(
            "node",
            "deg",
            F.coalesce("n_triangles", F.lit(0)).cast("bigint").alias("n_triangles"),
            F.when(
                F.col("deg") >= 2,
                F.round(
                    2.0
                    * F.coalesce("n_triangles", F.lit(0))
                    / (F.col("deg") * (F.col("deg") - 1)),
                    6,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("clustering"),
        )
    )


SQL_LOCAL_CLUSTERING = f"""
WITH tc AS ({SQL_TRIANGLE_COUNT}),
edges2 AS (
  SELECT DISTINCT user_id % {_PR_NODES} AS src,
         ('0x' || substr(md5(event_id::VARCHAR), 1, 4))::BIGINT % {_PR_NODES} AS dst
  FROM events
  WHERE user_id % {_PR_NODES}
        <> ('0x' || substr(md5(event_id::VARCHAR), 1, 4))::BIGINT % {_PR_NODES}
),
und2 AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM edges2
),
deg2 AS (
  SELECT node, count(*)::BIGINT AS deg FROM (
    SELECT a AS node FROM und2 UNION ALL SELECT b FROM und2
  ) t GROUP BY node
)
SELECT d.node, d.deg,
       coalesce(tc.n_triangles, 0)::BIGINT AS n_triangles,
       CASE WHEN d.deg >= 2
            THEN round(2.0 * coalesce(tc.n_triangles, 0) / (d.deg * (d.deg - 1)), 6)
            ELSE 0.0 END AS clustering
FROM deg2 d LEFT JOIN tc ON d.node = tc.node
"""


# -- stupid-backoff trigram LM scoring -------------------------------------------------

_SB_ALPHA = 0.4  # the Brants et al. backoff factor


def q_stupid_backoff_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stupid-backoff trigram LM scoring (Brants et al. EMNLP'07 —
     'Large Language Models in Machine Translation', THE distributed
    n-gram-LM recipe): count tables are built on the TRAIN half (even
    doc_ids) and every ODD doc is scored as held-out text, so the
    backoff chain genuinely fires on unseen n-grams.
    S(w3|w1w2) = c123/c12, else 0.4*c23/c2, else 0.16*c3/N, else a
    0.16/N OOV floor. Reports per-doc mean log-score plus the exact
    integer counts of how many positions resolved at each backoff
    level.

    Scale shape: three count tables are plain groupBys with map-side
    partials (vocabulary-sized, NOT corpus-sized); the scored stream is
    the exploded trigram stream with four hash left-joins against them
    — at 100 TB one scores the DISTINCT trigram table once and rejoins
    (the bpe_apply shape); per-position log-scores land in integer
    nano-units so the per-doc mean is an exact integer sum."""
    toks = _tokens(_read(spark, sf_dir, "documents")).select("doc_id", "toks")
    tris = toks.select(
        "doc_id",
        F.posexplode(
            F.expr(
                "transform(sequence(1, greatest(size(toks) - 2, 0)), "
                "i -> struct(toks[i - 1] as w1, toks[i] as w2, toks[i + 1] as w3))"
            )
        ).alias("pos", "t"),
    ).select("doc_id", "pos", "t.w1", "t.w2", "t.w3")
    train = tris.filter(F.col("doc_id") % 2 == 0)
    test = tris.filter(F.col("doc_id") % 2 == 1)
    tri_c = train.groupBy("w1", "w2", "w3").agg(F.count("*").alias("c123"))
    # bigram/unigram counts from the same trigram stream (positions 1..n-2
    # windows): c(w1 w2) over train trigram starts, c(w2) likewise — the
    # conditional-probability denominators match the numerators' support
    bi_c = train.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    bi_c23 = (
        train.groupBy("w2", "w3")
        .agg(F.count("*").alias("c23"))
        .withColumnRenamed("w2", "b2")
        .withColumnRenamed("w3", "b3")
    )
    uni_c2 = (
        train.groupBy("w2").agg(F.count("*").alias("c2")).withColumnRenamed("w2", "u2")
    )
    uni_c3 = (
        train.groupBy("w3").agg(F.count("*").alias("c3")).withColumnRenamed("w3", "u3")
    )
    n_total = train.count()
    scored = (
        test.join(tri_c, ["w1", "w2", "w3"], "left")
        .join(bi_c, ["w1", "w2"], "left")
        .join(
            bi_c23,
            (F.col("w2") == F.col("b2")) & (F.col("w3") == F.col("b3")),
            "left",
        )
        .join(uni_c2, F.col("w2") == F.col("u2"), "left")
        .join(uni_c3, F.col("w3") == F.col("u3"), "left")
    )
    a = _SB_ALPHA
    s = (
        F.when(
            F.col("c123").isNotNull(), F.col("c123") / F.col("c12")
        )
        .when(F.col("c23").isNotNull(), a * F.col("c23") / F.col("c2"))
        .when(F.col("c3").isNotNull(), a * a * F.col("c3") / F.lit(n_total))
        .otherwise(F.lit(a * a) / F.lit(n_total))
    )
    lvl = (
        F.when(F.col("c123").isNotNull(), F.lit(0))
        .when(F.col("c23").isNotNull(), F.lit(1))
        .when(F.col("c3").isNotNull(), F.lit(2))
        .otherwise(F.lit(3))
    )
    per = scored.select(
        "doc_id",
        F.round(F.log(s) * 1e9).cast("bigint").alias("ls_nano"),
        lvl.alias("lvl"),
    )
    return per.groupBy("doc_id").agg(
        F.count("*").cast("int").alias("n_trigrams"),
        F.round(F.sum("ls_nano") / 1e9 / F.count("*"), 6).alias("mean_logscore"),
        F.sum(F.when(F.col("lvl") == 0, 1).otherwise(0)).cast("int").alias("n_tri"),
        F.sum(F.when(F.col("lvl") == 1, 1).otherwise(0)).cast("int").alias("n_bi"),
        F.sum(F.when(F.col("lvl") == 2, 1).otherwise(0)).cast("int").alias("n_uni"),
        F.sum(F.when(F.col("lvl") == 3, 1).otherwise(0)).cast("int").alias("n_oov"),
    )


SQL_STUPID_BACKOFF_SCORE = f"""
WITH toks AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
tri0 AS (
  SELECT doc_id,
         unnest(list_transform(range(1, greatest(len(toks) - 1, 1)),
                i -> {{'w1': toks[CAST(i AS INTEGER)],
                       'w2': toks[CAST(i AS INTEGER) + 1],
                       'w3': toks[CAST(i AS INTEGER) + 2]}})) AS t
  FROM toks
),
tris AS (SELECT doc_id, t.w1 AS w1, t.w2 AS w2, t.w3 AS w3 FROM tri0),
train AS (SELECT * FROM tris WHERE doc_id % 2 = 0),
test AS (SELECT * FROM tris WHERE doc_id % 2 = 1),
tri_c AS (SELECT w1, w2, w3, count(*) AS c123 FROM train GROUP BY w1, w2, w3),
bi_c AS (SELECT w1, w2, count(*) AS c12 FROM train GROUP BY w1, w2),
bi23 AS (SELECT w2 AS b2, w3 AS b3, count(*) AS c23 FROM train GROUP BY w2, w3),
uni2 AS (SELECT w2 AS u2, count(*) AS c2 FROM train GROUP BY w2),
uni3 AS (SELECT w3 AS u3, count(*) AS c3 FROM train GROUP BY w3),
nt AS (SELECT count(*) AS n FROM train),
scored AS (
  SELECT t.doc_id,
         CASE WHEN tc.c123 IS NOT NULL THEN tc.c123 / bc.c12
              WHEN b23.c23 IS NOT NULL THEN {_SB_ALPHA} * b23.c23 / u2.c2
              WHEN u3.c3 IS NOT NULL THEN {_SB_ALPHA * _SB_ALPHA} * u3.c3 / nt.n
              ELSE {_SB_ALPHA * _SB_ALPHA} / nt.n END AS s,
         CASE WHEN tc.c123 IS NOT NULL THEN 0
              WHEN b23.c23 IS NOT NULL THEN 1
              WHEN u3.c3 IS NOT NULL THEN 2 ELSE 3 END AS lvl
  FROM test t
  LEFT JOIN tri_c tc ON t.w1 = tc.w1 AND t.w2 = tc.w2 AND t.w3 = tc.w3
  LEFT JOIN bi_c bc ON t.w1 = bc.w1 AND t.w2 = bc.w2
  LEFT JOIN bi23 b23 ON t.w2 = b23.b2 AND t.w3 = b23.b3
  LEFT JOIN uni2 u2 ON t.w2 = u2.u2
  LEFT JOIN uni3 u3 ON t.w3 = u3.u3
  CROSS JOIN nt
)
SELECT doc_id, count(*)::INTEGER AS n_trigrams,
       round(sum(round(ln(s) * 1e9)::BIGINT) / 1e9 / count(*), 6) AS mean_logscore,
       sum(CASE WHEN lvl = 0 THEN 1 ELSE 0 END)::INTEGER AS n_tri,
       sum(CASE WHEN lvl = 1 THEN 1 ELSE 0 END)::INTEGER AS n_bi,
       sum(CASE WHEN lvl = 2 THEN 1 ELSE 0 END)::INTEGER AS n_uni,
       sum(CASE WHEN lvl = 3 THEN 1 ELSE 0 END)::INTEGER AS n_oov
FROM scored GROUP BY doc_id
"""


# -- top principal component by power iteration ----------------------------------------

_PCA_ITERS = 4
_PCA_DIM = 64  # embedding dimensionality (same corpus as sq8_quantize)


def q_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component of the embedding corpus by power
    iteration on the covariance matrix — the first step of whitening /
    all-but-the-top (Mu & Viswanath 2018) post-processing that
    production embedding pipelines run before similarity search. Four
    unrolled iterations v <- normalize(C v), every state component
    rounded to 6 dp (the kmeans_embed idiom) so both engines iterate on
    identical numbers; output is each vector's projection on the
    component plus the Rayleigh-quotient eigenvalue estimate.

    Scale shape: mean and covariance are ONE pass each over the corpus
    (posexplode + (i,j) groupBy with map-side partial aggs; d^2 = 4096
    cells — tiny); each iteration is a d-row matvec against the 1-row
    broadcast v with sequential zip_with folds (bit-identical on both
    engines); the corpus is touched again only by the final map-side
    projection. The vectors never leave the executors; driver state is
    O(d^2)."""
    e = _read(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    n = e.count()
    mu = (
        e.select(F.posexplode("embedding").alias("pos", "x"))
        .groupBy("pos")
        .agg(F.round(F.avg(F.col("x").cast("double")), 6).alias("m"))
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
        .select(F.expr("transform(pm, p -> p.m)").alias("mu"))
    )
    centered = e.crossJoin(F.broadcast(mu)).select(
        "vec_id",
        F.expr(
            "zip_with(embedding, mu, (x, m) -> cast(x as double) - m)"
        ).alias("cx"),
    )
    # covariance cells: flatten the outer product per row, avg per (i, j)
    cells = (
        centered.select(
            F.posexplode(
                F.expr(
                    "flatten(transform(cx, (xi, i) -> transform(cx, (xj, j) -> xi * xj)))"
                )
            ).alias("k", "v")
        )
        .groupBy("k")
        .agg(F.round(F.sum("v") / n, 6).alias("c"))
    )
    crows = (
        cells.select(
            F.expr(f"cast(k div {_PCA_DIM} as int)").alias("i"),
            F.expr(f"cast(pmod(k, {_PCA_DIM}) as int)").alias("j"),
            "c",
        )
        .groupBy("i")
        .agg(F.array_sort(F.collect_list(F.struct("j", "c"))).alias("jc"))
        .select("i", F.expr("transform(jc, p -> p.c)").alias("crow"))
        .localCheckpoint(eager=True)
    )
    v = spark.createDataFrame(
        [([round(1.0 / _PCA_DIM**0.5, 6)] * _PCA_DIM,)], "v array<double>"
    )
    for _ in range(_PCA_ITERS):
        raw = crows.crossJoin(F.broadcast(v)).select(
            "i", F.expr(_dot_expr("crow", "v")).alias("r")
        )
        v = (
            raw.agg(F.array_sort(F.collect_list(F.struct("i", "r"))).alias("ir"))
            .select(F.expr("transform(ir, p -> p.r)").alias("raw"))
            .select(
                F.expr(
                    f"transform(raw, x -> round(x / sqrt({_dot_expr('raw', 'raw')}), 6))"
                ).alias("v")
            )
            .localCheckpoint(eager=True)
        )
    lam = crows.crossJoin(F.broadcast(v)).select(
        "i", F.expr(_dot_expr("crow", "v")).alias("r")
    )
    ray = (
        lam.agg(F.array_sort(F.collect_list(F.struct("i", "r"))).alias("ir"))
        .select(F.expr("transform(ir, p -> p.r)").alias("cv"))
        .crossJoin(F.broadcast(v))
        .select(
            F.round(
                F.expr(_dot_expr("cv", "v")) / F.expr(_dot_expr("v", "v")), 6
            ).alias("eigenvalue")
        )
    )
    return (
        centered.crossJoin(F.broadcast(v))
        .crossJoin(F.broadcast(ray))
        .select(
            "vec_id",
            F.round(F.expr(_dot_expr("cx", "v")), 6).alias("proj"),
            "eigenvalue",
        )
    )


def _pca_oracle_sql() -> str:
    d = _PCA_DIM
    parts = [
        f"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
nn AS (SELECT count(*) AS n FROM e),
mu AS (
  SELECT list(m ORDER BY pos) AS mu FROM (
    SELECT i AS pos, round(avg(embedding[i]::DOUBLE), 6) AS m
    FROM e, generate_series(1, {d}) g(i) GROUP BY i
  )
),
cx AS (
  SELECT vec_id,
         list_transform(list_zip(embedding, mu), z -> z[1]::DOUBLE - z[2]::DOUBLE) AS cx
  FROM e, mu
),
cells AS (
  SELECT i, j, round(sum(cx[i] * cx[j]) / any_value(nn.n), 6) AS c
  FROM cx, nn, generate_series(1, {d}) gi(i), generate_series(1, {d}) gj(j)
  GROUP BY i, j
),
crows AS (
  SELECT i, list(c ORDER BY j) AS crow FROM cells GROUP BY i
),
v0 AS (SELECT list_transform(range(1, {d} + 1), x -> round(1.0 / sqrt({d}::DOUBLE), 6)) AS v)"""
    ]
    for t in range(1, _PCA_ITERS + 1):
        parts.append(
            f""", r{t} AS (
  SELECT list({_sql_dot('crow', 'v')} ORDER BY i) AS raw
  FROM crows, v{t - 1}
), v{t} AS (
  SELECT list_transform(raw, x -> round(x / sqrt({_sql_dot('raw', 'raw')}), 6)) AS v
  FROM r{t}
)"""
        )
    last = _PCA_ITERS
    parts.append(
        f""", cvf AS (
  SELECT list({_sql_dot('crow', 'v')} ORDER BY i) AS cv FROM crows, v{last}
),
ray AS (
  SELECT round({_sql_dot('cv', 'v')} / {_sql_dot('v', 'v')}, 6) AS eigenvalue
  FROM cvf, v{last}
)
SELECT cx.vec_id, round({_sql_dot('cx.cx', 'v.v')}, 6) AS proj, ray.eigenvalue
FROM cx, v{last} v, ray"""
    )
    return "".join(parts)


SQL_PCA_POWER = _pca_oracle_sql()


# -- multi-source BFS (crawl depth from seeds) -----------------------------------------

_BFS_ROUNDS = 6
_BFS_SEED_MOD = 64  # seeds: doc_id % _BFS_SEED_MOD == 0


def q_bfs_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS over the directed link graph from the seed set —
    the crawl-depth question itself: how many hops from the seeds is
    every reachable page, and how does the frontier grow per wave? This
    is exactly the wave structure of the crawl engine replayed as a
    batch query (the reference's breadth mode explores in this order);
    unreached pages report level -1.

    Scale shape: the Pregel min-label relaxation — per round, one hash
    join of the current level table against the edge list + a min
    groupBy; rounds are unrolled with localCheckpoint, so the lineage
    stays flat and each round shuffles O(|edges touched|), never the
    corpus. Same topology as label_propagation/scc_mutual."""
    _, lev = _bfs_state(spark, sf_dir)
    return lev.select(
        "doc_id", F.coalesce("level", F.lit(-1)).cast("int").alias("level")
    )


def _bfs_state(spark: SparkSession, sf_dir: str):
    """Shared BFS relaxation over the synthetic doc link graph: returns
    (edges, levels-with-null-for-unreached). Used by q_bfs_levels and
    q_bipartite_check so both ops see the identical fixpoint."""
    docs = _read(spark, sf_dir, "documents").select("doc_id")
    n = docs.count()
    base = docs.select(F.col("doc_id").alias("src"))
    edges = (
        base.select("src", ((F.col("src") * 7 + 3) % n).alias("dst"))
        .union(base.select("src", (F.floor(F.col("src") / 3) % n).alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    lev = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % _BFS_SEED_MOD == 0, F.lit(0))
        .otherwise(F.lit(None).cast("int"))
        .alias("level"),
    )
    for t in range(1, _BFS_ROUNDS + 1):
        reached = (
            lev.filter(F.col("level").isNotNull())
            .join(edges, F.col("doc_id") == F.col("src"))
            .groupBy(F.col("dst").alias("doc_id"))
            .agg(F.min(F.col("level") + 1).alias("nlevel"))
        )
        lev = (
            lev.join(reached, "doc_id", "left")
            .select(
                "doc_id",
                F.when(
                    F.col("level").isNotNull() & F.col("nlevel").isNotNull(),
                    F.least("level", "nlevel"),
                )
                .otherwise(F.coalesce("level", "nlevel"))
                .alias("level"),
            )
            .localCheckpoint(eager=True)
        )
    return edges, lev


def _bfs_oracle_sql(final: str | None = None) -> str:
    parts = [
        f"""WITH nd AS (SELECT count(*) AS n FROM documents),
de AS (
  SELECT DISTINCT src, dst FROM (
    SELECT doc_id AS src, (doc_id * 7 + 3) % nd.n AS dst FROM documents, nd
    UNION ALL
    SELECT doc_id AS src, (doc_id // 3) % nd.n AS dst FROM documents, nd
  ) e WHERE src <> dst
),
l0 AS (
  SELECT doc_id,
         CASE WHEN doc_id % {_BFS_SEED_MOD} = 0 THEN 0 ELSE NULL END AS level
  FROM documents
)"""
    ]
    for t in range(1, _BFS_ROUNDS + 1):
        parts.append(
            f""", r{t} AS MATERIALIZED (
  SELECT de.dst AS doc_id, min(l.level + 1) AS nlevel
  FROM l{t - 1} l JOIN de ON de.src = l.doc_id
  WHERE l.level IS NOT NULL
  GROUP BY de.dst
), l{t} AS MATERIALIZED (
  SELECT l.doc_id,
         CASE WHEN l.level IS NOT NULL AND r.nlevel IS NOT NULL
              THEN least(l.level, r.nlevel)
              ELSE coalesce(l.level, r.nlevel) END AS level
  FROM l{t - 1} l LEFT JOIN r{t} r USING (doc_id)
)"""
        )
    parts.append(
        final
        if final is not None
        else f"""
SELECT doc_id, coalesce(level, -1)::INTEGER AS level FROM l{_BFS_ROUNDS}"""
    )
    return "".join(parts)


SQL_BFS_LEVELS = _bfs_oracle_sql()

SQL_FRONTIER_BRANCHING = f"""
WITH bfs AS ({SQL_BFS_LEVELS}),
per AS (
  SELECT level, count(*)::BIGINT AS n_nodes FROM bfs WHERE level >= 0 GROUP BY level
)
SELECT level, n_nodes,
       round(n_nodes * 1.0 / lag(n_nodes) OVER (ORDER BY level), 6) AS branching
FROM per
"""


# -- rank-based quantile normalization -------------------------------------------------


def q_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-based quantile normalization of a heavy-tailed feature
    (events.value) within each event_type: u = rank / (n + 1) maps any
    distribution onto uniform(0,1) — the robust feature-scaling step
    for downstream models when magnitudes across types aren't
    comparable. Average rank for ties (the standard), emitted exactly
    as (2*rank_sum)/(2*ties) in integer half-units so tie handling is
    integer-exact.

    Scale shape: one rank window per event_type (same bounded-type
    caveat as mad_outliers) + the count over the partition; everything
    else map-side."""
    ev = _read(spark, sf_dir, "events").select("event_id", "event_type", "value")
    wv = Window.partitionBy("event_type").orderBy(F.asc("value"), F.asc("event_id"))
    wt = Window.partitionBy("event_type", "value")
    wall = Window.partitionBy("event_type").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        ev.withColumn("rn", F.row_number().over(wv))
        .withColumn("avg2", (F.min("rn").over(wt) + F.max("rn").over(wt)).cast("bigint"))
        .withColumn("cnt", F.count("*").over(wall))
        .select(
            "event_id",
            "event_type",
            "value",
            F.round(F.col("avg2") / (2.0 * (F.col("cnt") + 1)), 6).alias("u"),
        )
    )


SQL_QUANTILE_NORMALIZE = """
WITH r AS (
  SELECT event_id, event_type, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value ASC, event_id ASC) AS rn,
         count(*) OVER (PARTITION BY event_type) AS cnt
  FROM events
),
t AS (
  SELECT *, (min(rn) OVER (PARTITION BY event_type, value)
           + max(rn) OVER (PARTITION BY event_type, value))::BIGINT AS avg2
  FROM r
)
SELECT event_id, event_type, value,
       round(avg2 / (2.0 * (cnt + 1)), 6) AS u
FROM t
"""


# -- simplified silhouette (cluster quality) -------------------------------------------


def q_silhouette_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simplified (centroid-based) silhouette over the kmeans_embed
    clustering: a(i) = distance to own centroid, b(i) = min distance to
    any OTHER centroid, s(i) = (b-a)/max(a,b); reported as the
    per-cluster mean — the standard clustering-quality audit run before
    trusting cluster-based curation (SemDeDup, cluster-balanced
    sampling). The simplified form is THE scale variant: O(n*k) against
    k broadcast centroids instead of the O(n^2) pairwise original.

    Scale shape: reuses the Lloyd loop's final state (_kmeans_state —
    identical plan to kmeans_embed); the b(i) pass is one broadcast
    cross with the k-row centroid table + a (vec_id) min-groupBy.
    Per-vector s lands in integer nano-units so the per-cluster mean is
    an exact integer sum — no float-order sensitivity."""
    assigned, cent = _kmeans_state(spark, sf_dir)
    others = cent.select(
        F.col("cid").alias("ocid"), F.col("centroid").alias("ocentroid")
    )
    d2o = F.expr(_sqdist_expr("embedding", "ocentroid"))
    # both a and b against the SAME (final) centroid snapshot — the
    # assignment's carried d2 is vs the pre-update centroids, so recompute
    b2 = (
        assigned.crossJoin(F.broadcast(others))
        .select("vec_id", "cid", "ocid", d2o.alias("d2o"))
        .groupBy("vec_id", "cid")
        .agg(
            F.min(F.when(F.col("ocid") == F.col("cid"), F.col("d2o"))).alias("a2"),
            F.min(F.when(F.col("ocid") != F.col("cid"), F.col("d2o"))).alias("b2"),
        )
    )
    a_ = F.sqrt(F.col("a2"))
    b_ = F.sqrt(F.col("b2"))
    sil = F.when(F.greatest(a_, b_) == 0.0, F.lit(0.0)).otherwise(
        (b_ - a_) / F.greatest(a_, b_)
    )
    return (
        b2.select("cid", F.round(sil * 1e9).cast("bigint").alias("sil_nano"))
        .groupBy("cid")
        .agg(
            F.count("*").cast("bigint").alias("n_vectors"),
            F.round(F.sum("sil_nano") / 1e9 / F.count("*"), 6).alias("mean_sil"),
        )
    )


def _silhouette_oracle_sql() -> str:
    last = _KM_ITERS
    return (
        _kmeans_sql_prefix()
        + f""", oth AS (
  SELECT a.vec_id, a.cid,
         min(CASE WHEN c.cid = a.cid THEN {_sql_sqdist('a.embedding', 'c.centroid')} END) AS a2,
         min(CASE WHEN c.cid <> a.cid THEN {_sql_sqdist('a.embedding', 'c.centroid')} END) AS b2
  FROM a{last} a CROSS JOIN cent{last} c
  GROUP BY a.vec_id, a.cid
),
sil AS (
  SELECT cid,
         CASE WHEN greatest(sqrt(a2), sqrt(b2)) = 0 THEN 0.0
              ELSE (sqrt(b2) - sqrt(a2)) / greatest(sqrt(a2), sqrt(b2)) END AS s
  FROM oth
)
SELECT cid, count(*)::BIGINT AS n_vectors,
       round(sum(round(s * 1e9)::BIGINT) / 1e9 / count(*), 6) AS mean_sil
FROM sil GROUP BY cid"""
    )


SQL_SILHOUETTE_SCORE = _silhouette_oracle_sql()


# -- deterministic random-walk corpus (DeepWalk) ---------------------------------------

_RW_STEPS = 8
_RW_START_MOD = 8  # walks start at doc_id % _RW_START_MOD == 0


def q_random_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DeepWalk/node2vec walk-corpus generation (Perozzi KDD'14): from
    each start node, an {_RW_STEPS}-step walk over the directed link
    graph where step t at node u moves to
    nbrs[H(u*131 + t*7919) % deg(u)] — hash-seeded, so the walk corpus
    is byte-reproducible across runs and reshards (the property that
    makes graph-embedding training data auditable). Dead-end nodes
    absorb (walk stays in place). Uses the same deterministic edge set
    as link_farm_score/adamic_adar.

    Scale shape: the adjacency table (src -> sorted nbr list) is built
    once with one groupBy and localCheckpoint'd; each step is one hash
    join of the O(|starts|) walk frontier against it — the Pregel step
    as DataFrames. No centralized walk state, no Python; at 10^10 edges
    each step shuffles only the frontier."""
    docs = _read(spark, sf_dir, "documents").select("doc_id")
    n = docs.count()
    base = docs.select(F.col("doc_id").alias("src"))
    edges = (
        base.select("src", ((F.col("src") * 7 + 3) % n).alias("dst"))
        .union(base.select("src", (F.floor(F.col("src") / 3) % n).alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    adj = (
        edges.groupBy("src")
        .agg(F.sort_array(F.collect_list("dst")).alias("nbrs"))
        .localCheckpoint(eager=True)
    )
    cur = docs.filter(F.col("doc_id") % _RW_START_MOD == 0).select(
        F.col("doc_id").alias("start_id"),
        F.col("doc_id").alias("node"),
        F.array("doc_id").alias("path"),
    )
    for t in range(1, _RW_STEPS + 1):
        nxt = (
            f"IF(nbrs IS NULL, node, element_at(nbrs, cast(pmod("
            f"cast(conv(substring(md5(cast(node * 131 + {t * 7919} as string)), 1, 8), 16, 10) as bigint), "
            f"size(nbrs)) + 1 as int)))"
        )
        cur = (
            cur.join(adj, cur["node"] == adj["src"], "left")
            .select(
                "start_id",
                F.expr(nxt).alias("node"),
                F.expr(f"concat(path, array({nxt}))").alias("path"),
            )
        )
    return cur.select(
        "start_id",
        "path",
        F.col("node").alias("final_node"),
        F.expr("size(array_distinct(path))").cast("int").alias("n_unique_nodes"),
    )


def _random_walks_oracle_sql() -> str:
    parts = [
        f"""WITH nd AS (SELECT count(*) AS n FROM documents),
de AS (
  SELECT DISTINCT src, dst FROM (
    SELECT doc_id AS src, (doc_id * 7 + 3) % nd.n AS dst FROM documents, nd
    UNION ALL
    SELECT doc_id AS src, (doc_id // 3) % nd.n AS dst FROM documents, nd
  ) e WHERE src <> dst
),
adj AS (SELECT src, list(dst ORDER BY dst) AS nbrs FROM de GROUP BY src),
w0 AS (
  SELECT doc_id AS start_id, doc_id AS node, [doc_id] AS path
  FROM documents WHERE doc_id % {_RW_START_MOD} = 0
)"""
    ]
    for t in range(1, _RW_STEPS + 1):
        nxt = (
            f"CASE WHEN a.nbrs IS NULL THEN w.node ELSE "
            f"a.nbrs[(('0x' || substr(md5((w.node * 131 + {t * 7919})::VARCHAR), 1, 8))::BIGINT "
            f"% len(a.nbrs))::INTEGER + 1] END"
        )
        parts.append(
            f""", w{t} AS (
  SELECT start_id, nxt AS node, list_append(path, nxt) AS path FROM (
    SELECT w.start_id, w.path, {nxt} AS nxt
    FROM w{t - 1} w LEFT JOIN adj a ON a.src = w.node
  )
)"""
        )
    parts.append(
        f"""
SELECT start_id, path, node AS final_node,
       len(list_distinct(path))::INTEGER AS n_unique_nodes
FROM w{_RW_STEPS}"""
    )
    return "".join(parts)


SQL_RANDOM_WALKS = _random_walks_oracle_sql()


# -- MAD robust outlier detection ------------------------------------------------------

_MAD_K = 1.4826  # consistency constant: MAD * 1.4826 ~ sigma under normality
_MAD_Z = 3.0


def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median-absolute-deviation outlier detection per event_type — the
    robust z-score |x - med| / (1.4826 * MAD) > 3 rule that survives the
    heavy-tailed metric distributions (fetch latencies, page sizes)
    where mean/stddev rules break. Medians are LOWER medians picked by
    integer rank over the (value, event_id) total order — exact, no
    interpolation semantics to disagree on.

    Scale shape: two ranked passes per event_type (value rank, then
    deviation rank) + a broadcast join of the per-type medians back to
    the stream. The per-type windows are one task per type — fine for a
    bounded type vocabulary; at unbounded cardinality production swaps
    the rank-median for a two-phase histogram median, same topology as
    pack_bins' two-phase cumsum."""
    ev = _read(spark, sf_dir, "events").select("event_id", "event_type", "value")
    wv = Window.partitionBy("event_type").orderBy(F.asc("value"), F.asc("event_id"))
    wall = Window.partitionBy("event_type").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    med = (
        ev.withColumn("rn", F.row_number().over(wv))
        .withColumn("cnt", F.count("*").over(wall))
        .filter(F.col("rn") == F.expr("(cnt + 1) div 2"))
        .select("event_type", F.col("value").alias("med"))
    )
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "dev", F.abs(F.col("value") - F.col("med"))
    )
    wd = Window.partitionBy("event_type").orderBy(F.asc("dev"), F.asc("event_id"))
    mad = (
        dev.withColumn("rn", F.row_number().over(wd))
        .withColumn("cnt", F.count("*").over(wall))
        .filter(F.col("rn") == F.expr("(cnt + 1) div 2"))
        .select("event_type", F.col("dev").alias("mad"))
    )
    z = (F.col("value") - F.col("med")) / (F.lit(_MAD_K) * F.col("mad"))
    return (
        dev.join(F.broadcast(mad), "event_type")
        .filter((F.col("mad") > 0) & (F.abs(z) > _MAD_Z))
        .select(
            "event_id",
            "event_type",
            "value",
            F.round(F.col("med"), 6).alias("med"),
            F.round(F.col("mad"), 6).alias("mad"),
            F.round(z, 4).alias("robust_z"),
        )
    )


SQL_MAD_OUTLIERS = f"""
WITH ev AS (SELECT event_id, event_type, value FROM events),
r1 AS (
  SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY value ASC, event_id ASC) AS rn,
         count(*) OVER (PARTITION BY event_type) AS cnt
  FROM ev
),
med AS (SELECT event_type, value AS med FROM r1 WHERE rn = (cnt + 1) // 2),
dev AS (
  SELECT ev.event_id, ev.event_type, ev.value, med.med,
         abs(ev.value - med.med) AS dev
  FROM ev JOIN med USING (event_type)
),
r2 AS (
  SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY dev ASC, event_id ASC) AS rn,
         count(*) OVER (PARTITION BY event_type) AS cnt
  FROM dev
),
mad AS (SELECT event_type, dev AS mad FROM r2 WHERE rn = (cnt + 1) // 2)
SELECT d.event_id, d.event_type, d.value,
       round(d.med, 6) AS med, round(m.mad, 6) AS mad,
       round((d.value - d.med) / ({_MAD_K} * m.mad), 4) AS robust_z
FROM dev d JOIN mad m USING (event_type)
WHERE m.mad > 0 AND abs((d.value - d.med) / ({_MAD_K} * m.mad)) > {_MAD_Z}
"""


# -- page change-rate estimation (recrawl scheduling) ----------------------------------

_CR_VISITS = 8  # revisits per url in the synthetic access history


def q_change_rate_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson change-rate estimation from revisit histories (Cho &
    Garcia-Molina, 'Estimating Frequency of Change', TOIT 2003): a
    crawler revisits each page n times at a fixed per-page interval I
    and observes X visits on which the page had changed; the
    bias-corrected MLE for the change rate is
    r_hat = -ln((n - X + 0.5) / (n + 0.5)) / I. The reference's
    recrawl loop re-fetches on a fixed cadence (WebCrawler.scala wave
    loop); this is the estimator a production recrawl scheduler layers
    on top to set per-page cadence from observed change history.

    The revisit history is synthesised deterministically: page d has
    true change probability (d % 5 + 1)/10 per visit and interval
    (d % 3 + 1) days; visit i changed iff H(d*31+i) % 10 < d % 5 + 1
    with H = first-8-hex-digits-of-md5 (identical on both engines).

    Scale shape: map-only — the per-visit indicators are folded inside
    one array expression per row, zero shuffle, zero Python; at 10^10
    urls this runs at scan speed and the output feeds recrawl_priority."""
    docs = _read(spark, sf_dir, "documents").select("doc_id")
    changed = (
        f"aggregate(transform(sequence(1, {_CR_VISITS}), i -> "
        f"IF(pmod(cast(conv(substring(md5(cast(doc_id * 31 + i as string)), 1, 8), 16, 10) as bigint), 10) "
        f"< pmod(doc_id, 5) + 1, 1, 0)), 0, (acc, v) -> acc + v)"
    )
    d = docs.withColumn("n_changed", F.expr(changed).cast("int")).withColumn(
        "interval_days", (F.pmod(F.col("doc_id"), F.lit(3)) + 1).cast("int")
    )
    rate = -F.log(
        (F.lit(_CR_VISITS) - F.col("n_changed") + 0.5) / F.lit(_CR_VISITS + 0.5)
    ) / F.col("interval_days")
    return d.select(
        "doc_id",
        F.lit(_CR_VISITS).cast("int").alias("n_visits"),
        "n_changed",
        "interval_days",
        # + 0.0 canonicalizes IEEE -0.0 (X=0 => -ln(1)) to 0.0 on both engines
        (F.round(rate, 6) + F.lit(0.0)).alias("change_rate"),
        # half-life recrawl cadence ln(2)/r, capped for never-changed pages
        F.round(
            F.least(F.lit(365.0), float(__import__("math").log(2)) / F.greatest(rate, F.lit(1e-9))), 4
        ).alias("recrawl_days"),
    )


SQL_CHANGE_RATE_ESTIMATE = f"""
WITH h AS (
  SELECT doc_id,
         list_sum(list_transform(range(1, {_CR_VISITS} + 1),
           i -> CASE WHEN ('0x' || substr(md5((doc_id * 31 + i)::VARCHAR), 1, 8))::BIGINT % 10
                          < doc_id % 5 + 1 THEN 1 ELSE 0 END))::INTEGER AS n_changed,
         (doc_id % 3 + 1)::INTEGER AS interval_days
  FROM documents
),
r AS (
  SELECT *, -ln(({_CR_VISITS} - n_changed + 0.5) / {_CR_VISITS + 0.5}) / interval_days AS rate
  FROM h
)
SELECT doc_id, {_CR_VISITS}::INTEGER AS n_visits, n_changed, interval_days,
       round(rate, 6) + 0.0 AS change_rate,
       round(least(365.0, ln(2) / greatest(rate, 1e-9)), 4) AS recrawl_days
FROM r
"""


# -- vocabulary tail coverage ----------------------------------------------------------

_VC_PCTS = (50, 75, 90, 95, 99)


def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary tail-coverage curve — the tokenizer-sizing question
    every training-data pipeline answers before fixing a vocab: rank
    token types by corpus frequency and report, for each target
    coverage percentile, the smallest vocabulary size whose cumulative
    token mass reaches it (and the coverage actually attained there).
    Complements zipf_alpha (the fitted exponent) with the operational
    quantity (how big must the vocab be).

    Scale shape: one shuffle (token groupBy count); the ranked
    cumulative sum runs over the AGGREGATED type table (vocab-sized,
    orders of magnitude below corpus size); the threshold probe is an
    integer comparison cum*100 >= pct*total — exact, no float
    boundary. At 10^10-doc scale the ranked window goes two-phase
    (per-partition pre-rank + merge), same as first_seen_ids."""
    toks = _tokens(_read(spark, sf_dir, "documents")).select(
        F.explode("toks").alias("t")
    )
    cnts = toks.groupBy("t").agg(F.count("*").alias("cnt"))
    total = cnts.agg(F.sum("cnt").cast("bigint").alias("total"))
    w = Window.orderBy(F.desc("cnt"), F.asc("t"))
    ranked = (
        cnts.withColumn("rnk", F.row_number().over(w))
        .withColumn(
            "cum",
            F.sum("cnt")
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("bigint"),
        )
        .crossJoin(F.broadcast(total))
    )
    th = spark.createDataFrame([(p,) for p in _VC_PCTS], "pct int")
    return (
        ranked.join(
            F.broadcast(th), F.col("cum") * 100 >= F.col("pct") * F.col("total")
        )
        .groupBy("pct", "total")
        .agg(F.min("rnk").alias("vocab_size"), F.min("cum").alias("mincum"))
        .select(
            "pct",
            F.col("vocab_size").cast("bigint").alias("vocab_size"),
            F.round(F.col("mincum") / F.col("total"), 6).alias("coverage"),
        )
    )


SQL_VOCAB_COVERAGE = f"""
WITH toks AS (SELECT unnest({_SQL_TOKS}) AS t FROM documents),
cnts AS (SELECT t, count(*)::BIGINT AS cnt FROM toks GROUP BY t),
tot AS (SELECT sum(cnt)::BIGINT AS total FROM cnts),
ranked AS (
  SELECT t, cnt,
         row_number() OVER (ORDER BY cnt DESC, t ASC) AS rnk,
         sum(cnt) OVER (ORDER BY cnt DESC, t ASC ROWS UNBOUNDED PRECEDING)::BIGINT AS cum
  FROM cnts
),
th AS (SELECT unnest([{", ".join(str(p) for p in _VC_PCTS)}]) AS pct)
SELECT pct::INTEGER AS pct,
       min(rnk)::BIGINT AS vocab_size,
       round(min(cum) * 1.0 / total, 6) AS coverage
FROM ranked, tot, th
WHERE cum * 100 >= pct * total
GROUP BY pct, total
"""


# -- scalar int8 embedding quantization ------------------------------------------------

_SQ8_DIM = 64


def q_sq8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar int8 (SQ8) embedding quantization — the storage tier every
    vector index at 100 TB actually serves from (FAISS SQ8 / Milvus
    SQ8): per-dimension global [min, max] over the corpus, each value
    mapped to round((x-mn)/(mx-mn)*255), reconstruction
    dq = mn + q/255*(mx-mn). Reports the per-vector quantized checksum
    (integer-exact) and reconstruction MSE.

    Scale shape: two passes — pass 1 is a posexplode + 64-group agg
    (tiny shuffle, map-side combine), whose 1-row result broadcasts
    into pass 2's map-only quantize; no per-row Python, all folds
    sequential => bit-identical to the oracle before rounding. The
    [0,255] range needs no clamp: mn/mx are global extrema, so every
    value is in range by construction."""
    e = _read(spark, sf_dir, "embeddings")
    dims = (
        e.select(F.posexplode("embedding").alias("pos", "x"))
        .groupBy("pos")
        .agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
    )
    mm = dims.agg(
        F.expr("transform(array_sort(collect_list(struct(pos, mn))), s -> s.mn)").alias(
            "mins"
        ),
        F.expr("transform(array_sort(collect_list(struct(pos, mx))), s -> s.mx)").alias(
            "maxs"
        ),
    )
    _q = (
        "round((cast(s.embedding as double) - cast(s.mins as double)) / "
        "IF(s.maxs = s.mins, cast(1.0 as double), cast(s.maxs as double) - cast(s.mins as double)) * 255.0)"
    )
    q_arr = f"transform(arrays_zip(embedding, mins, maxs), s -> cast({_q} as int))"
    err = (
        f"aggregate(transform(arrays_zip(embedding, mins, maxs), s -> "
        f"(cast(s.embedding as double) - (cast(s.mins as double) + {_q} / 255.0 * "
        f"(cast(s.maxs as double) - cast(s.mins as double)))) * "
        f"(cast(s.embedding as double) - (cast(s.mins as double) + {_q} / 255.0 * "
        f"(cast(s.maxs as double) - cast(s.mins as double))))), "
        f"cast(0.0 as double), (acc, v) -> acc + v)"
    )
    return (
        e.crossJoin(F.broadcast(mm))
        .select(
            "vec_id",
            F.expr(f"aggregate({q_arr}, 0, (acc, v) -> acc + v)")
            .cast("int")
            .alias("q_sum"),
            F.round(F.expr(err) / _SQ8_DIM, 12).alias("mse"),
        )
    )


_SQL_SQ8_Q = (
    "round((s[1]::DOUBLE - s[2]::DOUBLE) / "
    "(CASE WHEN s[3] = s[2] THEN 1.0 ELSE s[3]::DOUBLE - s[2]::DOUBLE END) * 255.0)"
)
SQL_SQ8_QUANTIZE = f"""
WITH dims AS (
  SELECT i AS pos, min(embedding[i]) AS mn, max(embedding[i]) AS mx
  FROM embeddings, generate_series(1, {_SQ8_DIM}) g(i)
  GROUP BY i
),
mm AS (
  SELECT list(mn ORDER BY pos) AS mins, list(mx ORDER BY pos) AS maxs FROM dims
)
SELECT vec_id,
       list_sum(list_transform(list_zip(embedding, mins, maxs),
                s -> ({_SQL_SQ8_Q})::INTEGER))::INTEGER AS q_sum,
       round(list_sum(list_transform(list_zip(embedding, mins, maxs),
             s -> (s[1]::DOUBLE - (s[2]::DOUBLE + {_SQL_SQ8_Q} / 255.0 * (s[3]::DOUBLE - s[2]::DOUBLE))) *
                  (s[1]::DOUBLE - (s[2]::DOUBLE + {_SQL_SQ8_Q} / 255.0 * (s[3]::DOUBLE - s[2]::DOUBLE)))))
             / {_SQ8_DIM}, 12) AS mse
FROM embeddings, mm
"""


# -- KMV (theta-style) distinct sketch audit -------------------------------------------

_KMV_K = 64
_KMV_SCALE = 281474976710656.0  # 2^48: md5 first-12-hex as a uniform 48-bit draw


def q_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV / theta-style distinct sketch (Bar-Yossef et al., RANDOM'02;
    the DataSketches theta family): keep the {_KMV_K} smallest 48-bit
    hashes of the per-language token universe and estimate
    D = (k-1) / h_(k) where h_(k) is the k-th minimum as a fraction of
    2^48. The exact per-language distinct count rides alongside so the
    row IS the estimator audit (rel_err) — the check you run before
    trusting sketched cardinalities to plan shuffle widths at 100 TB.

    Scale shape: one (lang, tok) distinct pass, then the k-smallest
    selection — here a per-lang window (group count is tiny); at real
    scale the k-minimum set is a mergeable partial aggregate (per
    partition keep k smallest, merge = k smallest of the union), which
    is exactly why KMV beats exact count-distinct there. Groups with
    fewer than k values degrade to the exact count (sketch is lossless
    below k). Ref: the reference counts vocabulary exactly
    (TuneVocabulary.scala:30-44) — this is its web-scale estimator."""
    toks = (
        _tokens(_docs_parallel(spark, sf_dir))
        .select("lang", F.explode("toks").alias("tok"))
        .distinct()
    )
    h = toks.withColumn(
        "h", F.expr("cast(conv(substring(md5(tok), 1, 12), 16, 10) as bigint)")
    )
    w = Window.partitionBy("lang").orderBy("h", "tok")
    sk = (
        h.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _KMV_K)
        .groupBy("lang")
        .agg(F.max("h").alias("hk"), F.count("*").alias("kk"))
    )
    exact = h.groupBy("lang").agg(F.count("*").alias("exact_distinct"))
    est = F.when(F.col("kk") < _KMV_K, F.col("kk").cast("double")).otherwise(
        F.lit(float(_KMV_K - 1)) * F.lit(_KMV_SCALE) / F.col("hk")
    )
    return (
        exact.join(sk, "lang")
        .select(
            "lang",
            "exact_distinct",
            F.round(est, 4).alias("kmv_est"),
            F.round((est - F.col("exact_distinct")) / F.col("exact_distinct"), 6).alias(
                "rel_err"
            ),
        )
        .orderBy("lang")
    )


_KMV_EST_SQL = (
    f"CASE WHEN kk < {_KMV_K} THEN kk::DOUBLE "
    f"ELSE {float(_KMV_K - 1)} * {_KMV_SCALE} / hk END"
)
SQL_KMV_DISTINCT = f"""
WITH toks AS (
  SELECT DISTINCT lang, unnest({_SQL_TOKS}) AS tok FROM documents
),
h AS (SELECT lang, tok, ('0x' || substr(md5(tok), 1, 12))::BIGINT AS h FROM toks),
kept AS (
  SELECT lang, h, row_number() OVER (PARTITION BY lang ORDER BY h, tok) AS rn FROM h
),
sk AS (SELECT lang, max(h) AS hk, count(*)::BIGINT AS kk FROM kept WHERE rn <= {_KMV_K} GROUP BY lang),
ex AS (SELECT lang, count(*)::BIGINT AS exact_distinct FROM h GROUP BY lang)
SELECT ex.lang, exact_distinct,
       round({_KMV_EST_SQL}, 4) AS kmv_est,
       round(({_KMV_EST_SQL} - exact_distinct) / exact_distinct, 6) AS rel_err
FROM ex JOIN sk USING (lang)
ORDER BY lang
"""


# -- Newman modularity of a host-graph partition ----------------------------------------

_MOD_COMMS = 4


def q_graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman-Girvan modularity Q = sum_c [ e_c/m - (deg_c/2m)^2 ] of a
    deterministic {_MOD_COMMS}-way partition (comm = node mod
    {_MOD_COMMS}) of the undirected host graph — the objective every
    community detector (Louvain, LP refinement) climbs, and the score
    you audit a partition with before sharding a crawl by community.

    Scale shape: edge canonicalization (least/greatest + distinct), ONE
    groupBy(comm) over internal edges + one over endpoint degrees; m is
    a 1-row aggregate broadcast in. Every term integer until the final
    closed form => zero float-order surface. Ref: host-graph surface
    GMLStorage.scala:56-60; partition quality is the batch cousin of
    the reference's cluster sigma-criterion (NetworkEstimator.scala)."""
    e = _pagerank_edges(spark, sf_dir)
    und = (
        e.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    m = und.agg(F.count("*").alias("m"))
    deg = (
        und.select(F.col("a").alias("node"))
        .union(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
        .withColumn("comm", F.col("node") % _MOD_COMMS)
    )
    comm_deg = deg.groupBy("comm").agg(
        F.count("*").alias("n_nodes"), F.sum("deg").alias("deg_sum")
    )
    internal = (
        und.filter(F.col("a") % _MOD_COMMS == F.col("b") % _MOD_COMMS)
        .groupBy((F.col("a") % _MOD_COMMS).alias("comm"))
        .agg(F.count("*").alias("internal_edges"))
    )
    return (
        comm_deg.join(internal, "comm", "left")
        .withColumn("internal_edges", F.coalesce("internal_edges", F.lit(0)))
        .crossJoin(F.broadcast(m))
        .select(
            "comm",
            "n_nodes",
            "internal_edges",
            "deg_sum",
            F.round(
                F.col("internal_edges") / F.col("m").cast("double")
                - (F.col("deg_sum") * F.col("deg_sum"))
                / (F.lit(4.0) * F.col("m") * F.col("m")),
                8,
            ).alias("q_contrib"),
        )
        .orderBy("comm")
    )


SQL_GRAPH_MODULARITY = f"""
WITH edges AS (
  SELECT DISTINCT user_id % {_PR_NODES} AS src,
         ('0x' || substr(md5(event_id::VARCHAR), 1, 4))::BIGINT % {_PR_NODES} AS dst
  FROM events
  WHERE user_id % {_PR_NODES}
        <> ('0x' || substr(md5(event_id::VARCHAR), 1, 4))::BIGINT % {_PR_NODES}
),
und AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM edges
),
m AS (SELECT count(*)::BIGINT AS m FROM und),
deg AS (
  SELECT node, count(*)::BIGINT AS deg, node % {_MOD_COMMS} AS comm
  FROM (SELECT a AS node FROM und UNION ALL SELECT b FROM und)
  GROUP BY node
),
cd AS (
  SELECT comm, count(*)::BIGINT AS n_nodes, sum(deg)::BIGINT AS deg_sum
  FROM deg GROUP BY comm
),
intra AS (
  SELECT a % {_MOD_COMMS} AS comm, count(*)::BIGINT AS internal_edges
  FROM und WHERE a % {_MOD_COMMS} = b % {_MOD_COMMS} GROUP BY 1
)
SELECT cd.comm, n_nodes,
       coalesce(internal_edges, 0)::BIGINT AS internal_edges, deg_sum,
       round(coalesce(internal_edges, 0) / m::DOUBLE
             - (deg_sum * deg_sum) / (4.0 * m * m), 8) AS q_contrib
FROM cd LEFT JOIN intra ON cd.comm = intra.comm, m
ORDER BY cd.comm
"""


# -- HyperANF neighborhood function -----------------------------------------------------

_ANF_P = 4  # 16 registers per node — the per-node state is O(16), never O(ball)
_ANF_LOW = 60 - _ANF_P
_ANF_ROUNDS = 3


def q_hyperanf_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperANF (Boldi-Vigna-Rosa, WWW'11): per-node HLL counters
    max-merged along out-edges for {_ANF_ROUNDS} rounds estimate
    |ball(v,t)| = #nodes within t hops — the neighborhood function /
    effective-diameter machinery that runs on billion-node web graphs
    precisely BECAUSE per-node state is m registers, not the ball
    itself. Registers follow the repo HLL idiom (md5 60-bit draw,
    2^-rho harmonic sum as exact integers scaled 2^52, linear-counting
    correction) so the only floats are the final closed forms.

    Scale shape: state is (node, bucket, rho) rows — O(nodes x m); one
    round = one edge join + one max groupBy + localCheckpoint (lineage
    truncation), the identical Pregel-as-DataFrames shape as bfs_levels
    but with MERGEABLE sketch state instead of exact labels. Ref: graph
    surface GMLStorage.scala:56-60; the crawl's wave expansion is this
    op's exact-set twin."""
    m = 1 << _ANF_P
    edges = _pagerank_edges(spark, sf_dir).localCheckpoint(eager=True)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    hashed = nodes.withColumn(
        "hv",
        F.conv(F.substring(F.md5(F.col("node").cast("string")), 1, 15), 16, 10).cast(
            "long"
        ),
    )
    state = hashed.select(
        "node",
        F.shiftright("hv", _ANF_LOW).alias("bucket"),
        F.when(F.col("hv").bitwiseAND(F.lit((1 << _ANF_LOW) - 1)) == 0, _ANF_LOW + 1)
        .otherwise(
            F.lit(_ANF_LOW)
            - F.length(F.bin(F.col("hv").bitwiseAND(F.lit((1 << _ANF_LOW) - 1))))
            + 1
        )
        .alias("rho"),
    ).localCheckpoint(eager=True)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    outs = []
    for t in range(1, _ANF_ROUNDS + 1):
        prop = state.join(edges, state["node"] == edges["dst"]).select(
            edges["src"].alias("node"), "bucket", "rho"
        )
        state = (
            state.union(prop)
            .groupBy("node", "bucket")
            .agg(F.max("rho").alias("rho"))
            .localCheckpoint(eager=True)
        )
        stats = state.groupBy("node").agg(
            F.count("*").cast("bigint").alias("n_present"),
            F.sum(F.expr("shiftleft(cast(1 as bigint), 52 - cast(rho as int))"))
            .cast("bigint")
            .alias("s_present"),
        )
        s_total = (
            F.col("s_present") + (F.lit(m) - F.col("n_present")) * F.lit(1 << 52)
        ).cast("double")
        raw = F.lit(alpha * m * m * float(1 << 52)) / s_total
        zeros = F.lit(m) - F.col("n_present")
        est = F.when(
            (raw <= 2.5 * m) & (zeros > 0),
            F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
        ).otherwise(raw)
        outs.append(
            stats.select(
                F.lit(t).alias("t"), "node", F.round(est, 4).alias("ball_est")
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.union(o)
    return res.orderBy("t", "node")


def _anf_sql() -> str:
    m = 1 << _ANF_P
    alpha = 0.7213 / (1.0 + 1.079 / m)
    rounds = []
    prev = "s0"
    for t in range(1, _ANF_ROUNDS + 1):
        rounds.append(
            f"s{t} AS MATERIALIZED (\n"
            f"  SELECT node, bucket, max(rho) AS rho FROM (\n"
            f"    SELECT node, bucket, rho FROM {prev}\n"
            f"    UNION ALL\n"
            f"    SELECT e.src AS node, s.bucket, s.rho FROM {prev} s JOIN edges e ON s.node = e.dst\n"
            f"  ) GROUP BY node, bucket\n"
            f")"
        )
        prev = f"s{t}"
    est = (
        f"CASE WHEN {alpha * m * m * float(1 << 52)} / s_total <= {2.5 * m} AND n_present < {m} "
        f"THEN {float(m)} * ln({float(m)} / ({m} - n_present)::DOUBLE) "
        f"ELSE {alpha * m * m * float(1 << 52)} / s_total END"
    )
    ests = "\nUNION ALL\n".join(
        f"SELECT {t} AS t, node, round({est}, 4) AS ball_est FROM (\n"
        f"  SELECT node, count(*)::BIGINT AS n_present,\n"
        f"         (sum(1::BIGINT << (52 - rho))::BIGINT\n"
        f"          + ({m} - count(*)) * {1 << 52})::DOUBLE AS s_total\n"
        f"  FROM s{t} GROUP BY node\n"
        f")"
        for t in range(1, _ANF_ROUNDS + 1)
    )
    return f"""
WITH edges AS MATERIALIZED (
  SELECT DISTINCT user_id % {_PR_NODES} AS src,
         ('0x' || substr(md5(event_id::VARCHAR), 1, 4))::BIGINT % {_PR_NODES} AS dst
  FROM events
  WHERE user_id % {_PR_NODES}
        <> ('0x' || substr(md5(event_id::VARCHAR), 1, 4))::BIGINT % {_PR_NODES}
),
nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
hv AS (SELECT node, ('0x' || substr(md5(node::VARCHAR), 1, 15))::BIGINT AS hv FROM nodes),
s0 AS MATERIALIZED (
  SELECT node, hv >> {_ANF_LOW} AS bucket,
         CASE WHEN hv & {(1 << _ANF_LOW) - 1} = 0 THEN {_ANF_LOW + 1}
              ELSE {_ANF_LOW} - length(bin(hv & {(1 << _ANF_LOW) - 1})::VARCHAR) + 1 END AS rho
  FROM hv
),
{",".join(rounds)}
{ests}
ORDER BY t, node
"""


SQL_HYPERANF_NEIGHBORHOOD = _anf_sql()


# -- effective diameter from HyperANF ----------------------------------------------------


def q_effective_diameter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Effective-diameter view of the HyperANF run: the neighborhood
    function N(t) = sum over nodes of |ball(v,t)| per round, its share
    of the final round's mass, and the 90%-reached flag — the classic
    'four degrees of separation' readout (Backstrom et al., the
    Facebook diameter study, ran exactly this). Ball estimates are
    folded as integer ten-thousandths so the cross-node sum has zero
    float-order surface; the 90% test is an integer cross-
    multiplication.

    Scale shape: a 3-row aggregate over hyperanf's (t, node) output —
    everything heavy is the shared HyperANF rounds."""
    anf = q_hyperanf_neighborhood(spark, sf_dir)
    nf = anf.groupBy("t").agg(
        F.sum(F.expr("cast(round(ball_est * 10000) as bigint)"))
        .cast("bigint")
        .alias("nf_micro")
    )
    last = nf.agg(F.max("nf_micro").alias("last_micro"))
    return (
        nf.crossJoin(F.broadcast(last))
        .select(
            "t",
            "nf_micro",
            F.round(F.col("nf_micro") / F.col("last_micro").cast("double"), 6).alias(
                "frac_of_final"
            ),
            (F.col("nf_micro") * 10 >= F.col("last_micro") * 9)
            .cast("int")
            .alias("reached90"),
        )
        .orderBy("t")
    )


SQL_EFFECTIVE_DIAMETER = f"""
WITH anf AS ({SQL_HYPERANF_NEIGHBORHOOD}),
nf AS (
  SELECT t, sum(round(ball_est * 10000)::BIGINT)::BIGINT AS nf_micro
  FROM anf GROUP BY t
),
last AS (SELECT max(nf_micro) AS last_micro FROM nf)
SELECT t, nf_micro,
       round(nf_micro / last_micro::DOUBLE, 6) AS frac_of_final,
       (nf_micro * 10 >= last_micro * 9)::INTEGER AS reached90
FROM nf, last
ORDER BY t
"""


# -- k-truss peel ------------------------------------------------------------------------

_KTRUSS_K = 4
_KTRUSS_ROUNDS = 3


def _truss_support(und: DataFrame) -> DataFrame:
    """Support (triangle count) per canonical edge of `und` (a < b)."""
    e1, e2 = und.alias("e1"), und.alias("e2")
    wedge = (
        e1.join(e2, F.col("e1.a") == F.col("e2.a"))
        .filter(F.col("e1.b") < F.col("e2.b"))
        .select(
            F.col("e1.a").alias("u"),
            F.col("e1.b").alias("x"),
            F.col("e2.b").alias("y"),
        )
    )
    tri = wedge.join(
        und, (F.col("x") == F.col("a")) & (F.col("y") == F.col("b"))
    ).select("u", "x", "y")
    tri_edges = tri.select(
        F.explode(
            F.expr(
                "array(struct(u as a, x as b), struct(u as a, y as b), "
                "struct(x as a, y as b))"
            )
        ).alias("e")
    ).select("e.a", "e.b")
    return tri_edges.groupBy("a", "b").agg(
        F.count("*").cast("bigint").alias("support")
    )


def q_ktruss_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-truss decomposition, k={_KTRUSS_K} (Cohen 2008), via
    {_KTRUSS_ROUNDS} unrolled peel rounds: recompute per-edge triangle
    support, drop edges with support < k-2, repeat — removing a weak
    edge can break the triangles holding its neighbors, so the loop is
    essential (one round, the edge_triangle_support op, over-keeps).
    Surviving edges are the cohesive link-cluster cores (mirror rings,
    tight communities) that a single-pass filter cannot certify.

    Scale shape: one round = one wedge self-join + one triangle-close
    join + one (a,b) groupBy + localCheckpoint — the identical
    iterative-DataFrame shape as the Pregel ops; at web scale the loop
    runs to fixpoint with delta detection instead of a fixed unroll.
    Support here uses the plain a<b<c enumeration (orientation is a
    constant-factor optimization the graph sizes in play don't need;
    edge_triangle_support demonstrates the oriented plan)."""
    und = (
        _pagerank_edges(spark, sf_dir)
        .select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    thresh = _KTRUSS_K - 2
    for _ in range(_KTRUSS_ROUNDS):
        sup = _truss_support(und)
        und = (
            und.join(sup, ["a", "b"], "left")
            .filter(F.coalesce("support", F.lit(0)) >= thresh)
            .select("a", "b")
            .localCheckpoint(eager=True)
        )
    final = und.join(_truss_support(und), ["a", "b"], "left").select(
        "a", "b", F.coalesce("support", F.lit(0)).cast("bigint").alias("support")
    )
    return final.orderBy("a", "b")


def _ktruss_sql() -> str:
    thresh = _KTRUSS_K - 2
    sup_of = (
        "SELECT a, b, count(*)::BIGINT AS support FROM (\n"
        "  SELECT least(u, x) AS a, greatest(u, x) AS b FROM {tri}\n"
        "  UNION ALL SELECT u, y FROM {tri}\n"
        "  UNION ALL SELECT x, y FROM {tri}\n"
        ") GROUP BY a, b"
    )
    parts = []
    prev = "e0"
    for i in range(1, _KTRUSS_ROUNDS + 1):
        parts.append(
            f"tri{i} AS MATERIALIZED (\n"
            f"  SELECT w1.a AS u, w1.b AS x, w2.b AS y\n"
            f"  FROM {prev} w1 JOIN {prev} w2 ON w1.a = w2.a AND w1.b < w2.b\n"
            f"  JOIN {prev} e ON w1.b = e.a AND w2.b = e.b\n"
            f"),\n"
            f"sup{i} AS MATERIALIZED ({sup_of.format(tri=f'tri{i}')}),\n"
            f"e{i} AS MATERIALIZED (\n"
            f"  SELECT e.a, e.b FROM {prev} e JOIN sup{i} s ON e.a = s.a AND e.b = s.b\n"
            f"  WHERE s.support >= {thresh}\n"
            f")"
        )
        prev = f"e{i}"
    n = _KTRUSS_ROUNDS
    return f"""
WITH edges AS (
  SELECT DISTINCT user_id % {_PR_NODES} AS src,
         ('0x' || substr(md5(event_id::VARCHAR), 1, 4))::BIGINT % {_PR_NODES} AS dst
  FROM events
  WHERE user_id % {_PR_NODES}
        <> ('0x' || substr(md5(event_id::VARCHAR), 1, 4))::BIGINT % {_PR_NODES}
),
e0 AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM edges
),
{",".join(parts)},
trif AS (
  SELECT w1.a AS u, w1.b AS x, w2.b AS y
  FROM e{n} w1 JOIN e{n} w2 ON w1.a = w2.a AND w1.b < w2.b
  JOIN e{n} e ON w1.b = e.a AND w2.b = e.b
),
supf AS ({sup_of.format(tri='trif')})
SELECT e.a, e.b, coalesce(s.support, 0)::BIGINT AS support
FROM e{n} e LEFT JOIN supf s ON e.a = s.a AND e.b = s.b
ORDER BY e.a, e.b
"""


SQL_KTRUSS_PEEL = _ktruss_sql()


# -- rendezvous (HRW) sharding audit ------------------------------------------------------

_HRW_SHARDS = 8


def q_rendezvous_sharding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rendezvous / highest-random-weight sharding audit (Thaler-Ravishankar
    '98 — what frontier routers and cache meshes use instead of mod-N):
    every url goes to argmax_s md5(url|s) over {_HRW_SHARDS} shards;
    adding shard {_HRW_SHARDS} moves ONLY the keys the new shard wins
    (~1/{_HRW_SHARDS + 1} of them), while mod-N resharding would move
    ~{_HRW_SHARDS}/{_HRW_SHARDS + 1}. Reports, per original shard, the
    key count and how many keys the expansion steals — the migration
    bill for growing the fleet.

    Scale shape: both assignments are ONE map-side array expression per
    url (build {_HRW_SHARDS + 1} hashes, argmax via array_position);
    one groupBy(shard) ends it. Urls synthesized per doc_id (the
    url_path_rollup convention)."""
    docs = _read(spark, sf_dir, "documents").select("doc_id")
    url = F.concat(
        F.lit("h"),
        (F.col("doc_id") % 10).cast("string"),
        F.lit("/s"),
        (F.col("doc_id") % 5).cast("string"),
        F.lit("/p"),
        F.col("doc_id").cast("string"),
    )
    def hs(n):
        return (
            f"transform(sequence(0, {n - 1}), s -> "
            f"cast(conv(substring(md5(concat(url, '|', s)), 1, 15), 16, 10) as bigint))"
        )
    assigned = docs.select(url.alias("url")).select(
        "url",
        F.expr(f"array_position({hs(_HRW_SHARDS)}, array_max({hs(_HRW_SHARDS)})) - 1")
        .cast("int")
        .alias("shard"),
        F.expr(
            f"array_position({hs(_HRW_SHARDS + 1)}, array_max({hs(_HRW_SHARDS + 1)})) - 1"
        )
        .cast("int")
        .alias("shard_after"),
    )
    return (
        assigned.groupBy("shard")
        .agg(
            F.count("*").cast("bigint").alias("n_keys"),
            F.sum((F.col("shard_after") == _HRW_SHARDS).cast("int"))
            .cast("bigint")
            .alias("moved_out"),
        )
        .orderBy("shard")
    )


def _hrw_sql_hashes(n: int) -> str:
    return (
        f"list_transform(range(0, {n}), s -> "
        f"('0x' || substr(md5(url || '|' || s), 1, 15))::BIGINT)"
    )


SQL_RENDEZVOUS_SHARDING = f"""
WITH urls AS (
  SELECT 'h' || (doc_id % 10) || '/s' || (doc_id % 5) || '/p' || doc_id AS url
  FROM documents
),
assigned AS (
  SELECT url,
         (list_position({_hrw_sql_hashes(_HRW_SHARDS)},
                        list_max({_hrw_sql_hashes(_HRW_SHARDS)})) - 1)::INTEGER AS shard,
         (list_position({_hrw_sql_hashes(_HRW_SHARDS + 1)},
                        list_max({_hrw_sql_hashes(_HRW_SHARDS + 1)})) - 1)::INTEGER AS shard_after
  FROM urls
)
SELECT shard, count(*)::BIGINT AS n_keys,
       sum(CASE WHEN shard_after = {_HRW_SHARDS} THEN 1 ELSE 0 END)::BIGINT AS moved_out
FROM assigned GROUP BY shard ORDER BY shard
"""


# -- weighted minhash (capped-tf replication) --------------------------------------------

_WMH_K = 16
_WMH_CAP = 4


def q_weighted_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted-Jaccard minhash via integer replication (the CWS
    family's exact small-weight specialization): each term is expanded
    into min(tf, {_WMH_CAP}) distinct elements t#i, so plain set
    minhash over the expansion IS an unbiased weighted-Jaccard
    estimator for capped term frequencies — near-dup detection that
    sees 'same words, very different emphasis'. Adjacent doc pairs
    carry the exact capped weighted Jaccard (= set Jaccard of the
    expansions) alongside the {_WMH_K}-hash estimate and its error.

    Scale shape: expansion + all {_WMH_K} min-folds are ONE map-side
    array expression per doc (no explode, no shuffle); the pair join is
    keyed doc_id+1 (stand-in for LSH buckets at scale); the exact side
    exists only to grade the estimator and drops at 100 TB."""
    docs = _tokens(_docs_parallel(spark, sf_dir)).filter(F.expr("size(toks) >= 1"))
    exp = docs.select(
        "doc_id",
        F.expr(
            f"flatten(transform(array_distinct(toks), t -> "
            f"transform(sequence(1, least(size(filter(toks, x -> x = t)), {_WMH_CAP})), "
            f"i -> concat(t, '#', i))))"
        ).alias("exp"),
    )
    mins = exp.select(
        "doc_id",
        "exp",
        F.expr(
            f"transform(sequence(0, {_WMH_K - 1}), j -> "
            f"aggregate(exp, cast(9223372036854775807 as bigint), (acc, s) -> "
            f"least(acc, cast(conv(substring(md5(concat(s, '@', j)), 1, 15), 16, 10) as bigint))))"
        ).alias("mins"),
    ).localCheckpoint(eager=True)
    a = mins.alias("a")
    b = mins.select(
        (F.col("doc_id") - 1).alias("pair_id"),
        F.col("exp").alias("b_exp"),
        F.col("mins").alias("b_mins"),
    ).alias("b")
    pairs = a.join(b, F.col("a.doc_id") == F.col("pair_id"))
    agree = F.expr(
        "size(filter(zip_with(a.mins, b_mins, (x, y) -> x = y), z -> z))"
    )
    est = agree / F.lit(float(_WMH_K))
    exact = F.expr("size(array_intersect(a.exp, b_exp))") / F.expr(
        "size(array_union(a.exp, b_exp))"
    )
    return pairs.select(
        F.col("a.doc_id").alias("a_id"),
        (F.col("a.doc_id") + 1).alias("b_id"),
        F.round(exact, 6).alias("wjac_exact"),
        F.round(est, 6).alias("wjac_est"),
        F.round(F.abs(est - exact), 6).alias("abs_err"),
    )


SQL_WEIGHTED_MINHASH = f"""
WITH toksT AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
expT AS (
  SELECT doc_id,
         flatten(list_transform(list_distinct(toks), t ->
           list_transform(range(1, least(len(list_filter(toks, x -> x = t)), {_WMH_CAP}) + 1),
             i -> t || '#' || i))) AS exp
  FROM toksT WHERE len(toks) >= 1
),
mins AS (
  SELECT doc_id, exp,
         list_transform(range(0, {_WMH_K}), j ->
           list_min(list_transform(exp, s -> ('0x' || substr(md5(s || '@' || j), 1, 15))::BIGINT))) AS mins
  FROM expT
),
pairs AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         a.exp AS ea, b.exp AS eb, a.mins AS ma, b.mins AS mb
  FROM mins a JOIN mins b ON b.doc_id = a.doc_id + 1
)
SELECT a_id, b_id,
       round(len(list_intersect(ea, eb)) / len(list_distinct(list_concat(ea, eb))), 6) AS wjac_exact,
       round(len(list_filter(list_zip(ma, mb), z -> z[1] = z[2])) / {float(_WMH_K)}, 6) AS wjac_est,
       round(abs(len(list_filter(list_zip(ma, mb), z -> z[1] = z[2])) / {float(_WMH_K)}
                 - len(list_intersect(ea, eb)) / len(list_distinct(list_concat(ea, eb)))), 6) AS abs_err
FROM pairs
"""


# -- directed-graph reciprocity ----------------------------------------------------------


def q_edge_reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node link reciprocity (Broder WWW'00 web-graph stat family):
    for each host, the fraction of out-links whose reverse edge exists —
    mutual-link mass separates genuine hub communities from link farms
    that only point one way (cf. link_farm_score). Integer micro-units
    (recip_ppm = floor(1e6 * reciprocated / out_deg)).

    Scale shape: one self-semi-join on the reversed key (shuffle on
    (src,dst) — the canonical edge-orientation join every triangle/
    truss op here reuses) + one groupBy(src); nothing is collected."""
    e = _pagerank_edges(spark, sf_dir).localCheckpoint(eager=True)
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    recip = (
        e.join(rev, ["src", "dst"], "left_semi")
        .groupBy("src")
        .agg(F.count("*").alias("reciprocated"))
    )
    out = e.groupBy("src").agg(F.count("*").alias("out_deg"))
    return (
        out.join(recip, "src", "left")
        .select(
            F.col("src").alias("node"),
            "out_deg",
            F.coalesce("reciprocated", F.lit(0)).cast("bigint").alias("reciprocated"),
            F.floor(
                F.coalesce("reciprocated", F.lit(0)) * 1000000 / F.col("out_deg")
            )
            .cast("bigint")
            .alias("recip_ppm"),
        )
        .orderBy("node")
    )


SQL_EDGE_RECIPROCITY = f"""
WITH edges AS MATERIALIZED (
  SELECT DISTINCT user_id % {_PR_NODES} AS src,
         ('0x' || substr(md5(event_id::VARCHAR), 1, 4))::BIGINT % {_PR_NODES} AS dst
  FROM events
  WHERE user_id % {_PR_NODES}
        <> ('0x' || substr(md5(event_id::VARCHAR), 1, 4))::BIGINT % {_PR_NODES}
),
recip AS (
  SELECT e.src, count(*)::BIGINT AS reciprocated
  FROM edges e WHERE EXISTS (
    SELECT 1 FROM edges r WHERE r.src = e.dst AND r.dst = e.src
  ) GROUP BY e.src
),
outd AS (SELECT src, count(*)::BIGINT AS out_deg FROM edges GROUP BY src)
SELECT o.src AS node, out_deg,
       coalesce(reciprocated, 0)::BIGINT AS reciprocated,
       floor(coalesce(reciprocated, 0) * 1000000 / out_deg)::BIGINT AS recip_ppm
FROM outd o LEFT JOIN recip r ON o.src = r.src
ORDER BY node
"""


# -- Good-Turing unseen mass / Chao1 richness --------------------------------------------


def q_unseen_mass_gt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Good-Turing unseen-probability mass (Gale-Sampson 1995) + Chao1
    richness per language: p0 = N1/N (hapax share of token mass) says
    how much of the language the crawl has NOT seen yet — the signal
    that tells a 100 TB pipeline whether more crawling still buys new
    vocabulary; chao1 = V + N1(N1-1)/(2(N2+1)) (bias-corrected)
    estimates the total vocabulary size the corpus is converging to.

    Scale shape: one (lang, term) count groupBy (map-side partials) +
    one per-lang fold of four integer sums; the closed forms are the
    only floats. Ref: the reference's exact vocabulary counting
    (TuneVocabulary.scala:30-44) — this is what you consult before
    paying for the next billion pages."""
    counts = (
        _tokens(_docs_parallel(spark, sf_dir))
        .select("lang", F.explode("toks").alias("term"))
        .groupBy("lang", "term")
        .agg(F.count("*").alias("c"))
    )
    agg = counts.groupBy("lang").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count("*").cast("bigint").alias("vocab"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).cast("bigint").alias("hapax"),
        F.sum(F.when(F.col("c") == 2, 1).otherwise(0)).cast("bigint").alias("dis"),
    )
    return agg.select(
        "lang",
        "n_tokens",
        "vocab",
        "hapax",
        "dis",
        F.round(F.col("hapax") / F.col("n_tokens").cast("double"), 6).alias("p0_unseen"),
        F.round(
            F.col("vocab")
            + (F.col("hapax") * (F.col("hapax") - 1))
            / (F.lit(2.0) * (F.col("dis") + 1)),
            4,
        ).alias("chao1"),
    ).orderBy("lang")


SQL_UNSEEN_MASS_GT = f"""
WITH toks AS (SELECT lang, unnest({_SQL_TOKS}) AS term FROM documents),
counts AS (SELECT lang, term, count(*)::BIGINT AS c FROM toks GROUP BY lang, term),
agg AS (
  SELECT lang, sum(c)::BIGINT AS n_tokens, count(*)::BIGINT AS vocab,
         sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)::BIGINT AS hapax,
         sum(CASE WHEN c = 2 THEN 1 ELSE 0 END)::BIGINT AS dis
  FROM counts GROUP BY lang
)
SELECT lang, n_tokens, vocab, hapax, dis,
       round(hapax / n_tokens::DOUBLE, 6) AS p0_unseen,
       round(vocab + (hapax * (hapax - 1)) / (2.0 * (dis + 1)), 4) AS chao1
FROM agg ORDER BY lang
"""


# -- term burstiness (variance-to-mean ratio) ---------------------------------------------

_BURST_TOP = 20


def q_term_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term burstiness (Church-Gale dispersion): variance-to-mean ratio
    of per-document counts over ALL documents — VMR >> 1 marks bursty
    topical terms (concentrated in few docs), VMR ~ 1 Poisson-like
    function words. The closed form VMR = sumsq/cnt - cnt/D needs only
    three integer partial sums, so docs that never mention the term
    cost nothing — the trick that makes corpus-wide dispersion feasible
    at 10^10 documents. Top {_BURST_TOP} terms by total count.

    Scale shape: (doc, term) count groupBy -> (term) fold of integer
    (df, cnt, sumsq) partials -> TakeOrdered {_BURST_TOP}; the doc
    total is a 1-row broadcast."""
    per_doc = (
        _tokens(_docs_parallel(spark, sf_dir))
        .select("doc_id", F.explode("toks").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("c"))
    )
    stats = per_doc.groupBy("term").agg(
        F.count("*").cast("bigint").alias("df"),
        F.sum("c").cast("bigint").alias("cnt"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("sumsq"),
    )
    d = _read(spark, sf_dir, "documents").agg(F.count("*").cast("bigint").alias("d"))
    return (
        stats.crossJoin(F.broadcast(d))
        .select(
            "term",
            "df",
            "cnt",
            F.round(
                F.col("sumsq") / F.col("cnt").cast("double")
                - F.col("cnt") / F.col("d").cast("double"),
                6,
            ).alias("vmr"),
        )
        .orderBy(F.desc("cnt"), "term")
        .limit(_BURST_TOP)
    )


SQL_TERM_BURSTINESS = f"""
WITH toks AS (SELECT doc_id, unnest({_SQL_TOKS}) AS term FROM documents),
per_doc AS (SELECT doc_id, term, count(*)::BIGINT AS c FROM toks GROUP BY doc_id, term),
stats AS (
  SELECT term, count(*)::BIGINT AS df, sum(c)::BIGINT AS cnt,
         sum(c * c)::BIGINT AS sumsq
  FROM per_doc GROUP BY term
),
d AS (SELECT count(*)::BIGINT AS d FROM documents)
SELECT term, df, cnt,
       round(sumsq / cnt::DOUBLE - cnt / d::DOUBLE, 6) AS vmr
FROM stats, d
ORDER BY cnt DESC, term
LIMIT {_BURST_TOP}
"""


# -- politeness compliance audit ----------------------------------------------------------

_PC_HOSTS = 32


def q_politeness_compliance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-delay compliance audit over the fetch log: per host, the
    inter-fetch gaps in (ts, event_id) total order vs that host's
    required delay (deterministic 1 + host%5 seconds, standing in for
    robots.txt Crawl-delay) — violations counted in integer micro-share.
    This is the post-hoc check on exactly the politeness window the
    engine enforces live (crawler.py F5; reference politeness
    EvaluatePriorityMatrix.scala:120-138): at 100 TB you audit the
    fetch LOG, because no scheduler proof survives repartitioning bugs.

    Scale shape: one window (lag) + one groupBy, both on the same host
    hash partitioning — a single exchange end-to-end."""
    ev = _read(spark, sf_dir, "events").withColumn(
        "host", F.col("user_id") % _PC_HOSTS
    )
    wo = Window.partitionBy("host").orderBy("ts", "event_id")
    delay_us = (F.lit(1) + F.col("host") % 5) * 1000000
    gap = _us("ts") - F.unix_micros(F.lag(F.col("ts").cast("timestamp")).over(wo))
    g = ev.withColumn("gap_us", gap).withColumn(
        "viol", F.when(F.col("gap_us") < delay_us, 1).otherwise(0)
    )
    return (
        g.groupBy("host")
        .agg(
            F.count("*").cast("bigint").alias("fetches"),
            F.sum("viol").cast("bigint").alias("violations"),
            F.coalesce(F.min("gap_us"), F.lit(-1)).cast("bigint").alias("min_gap_us"),
        )
        .select(
            "host",
            ((F.col("host") % 5 + 1) * 1000000).cast("bigint").alias("delay_us"),
            "fetches",
            "violations",
            F.floor(
                F.col("violations") * 1000000
                / F.greatest(F.col("fetches") - 1, F.lit(1))
            )
            .cast("bigint")
            .alias("violation_ppm"),
            "min_gap_us",
        )
        .orderBy("host")
    )


SQL_POLITENESS_COMPLIANCE = f"""
WITH ev AS (SELECT user_id % {_PC_HOSTS} AS host, ts, event_id FROM events),
g AS (
  SELECT host,
         epoch_us(ts) - epoch_us(lag(ts) OVER w) AS gap_us,
         CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w)
                   < (1 + host % 5) * 1000000 THEN 1 ELSE 0 END AS viol
  FROM ev
  WINDOW w AS (PARTITION BY host ORDER BY ts, event_id)
)
SELECT host, ((host % 5 + 1) * 1000000)::BIGINT AS delay_us,
       count(*)::BIGINT AS fetches,
       sum(viol)::BIGINT AS violations,
       floor(sum(viol) * 1000000 / greatest(count(*) - 1, 1))::BIGINT AS violation_ppm,
       coalesce(min(gap_us), -1)::BIGINT AS min_gap_us
FROM g GROUP BY host ORDER BY host
"""


# -- hot-host salting plan ---------------------------------------------------------------

_SALT_CAP = 128


def q_skew_salt_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-aware salting plan: per-host row counts -> the salt factor
    ceil(cnt / {_SALT_CAP}) each hot host needs so no single fetch task
    exceeds the cap — the batch audit of exactly the salted-window trick
    the crawl engine uses live (crawler.py politeness salting, F5;
    reference politeness window EvaluatePriorityMatrix.scala:120-138).
    Hosts are a deterministic skewed collapse host = floor(sqrt(user_id))
    (host h absorbs ~2h+1 uniform users => zipf-ish tail) so the plan
    genuinely exercises heavy hitters. heavy flags hosts above 2x the
    mean by integer cross-multiplication (cnt * n_hosts > 2 * total).

    Scale shape: ONE groupBy(host) count with map-side partials + a
    1-row totals aggregate broadcast back — the same two-job shape at
    10^10 frontier rows; share_ppm is integer micro-share."""
    ev = _read(spark, sf_dir, "events")
    counts = (
        ev.select(
            F.expr("cast(floor(sqrt(cast(user_id as double))) as bigint)").alias("host")
        )
        .groupBy("host")
        .agg(F.count("*").alias("cnt"))
    )
    tot = counts.agg(
        F.sum("cnt").alias("total"), F.count("*").alias("n_hosts")
    )
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "host",
            "cnt",
            F.floor(F.col("cnt") * 1000000 / F.col("total"))
            .cast("bigint")
            .alias("share_ppm"),
            F.floor((F.col("cnt") + _SALT_CAP - 1) / _SALT_CAP)
            .cast("bigint")
            .alias("salt_k"),
            (F.col("cnt") * F.col("n_hosts") > 2 * F.col("total"))
            .cast("int")
            .alias("heavy"),
        )
        .orderBy(F.desc("cnt"), "host")
    )


SQL_SKEW_SALT_PLAN = f"""
WITH counts AS (
  SELECT floor(sqrt(user_id::DOUBLE))::BIGINT AS host, count(*)::BIGINT AS cnt
  FROM events GROUP BY 1
),
tot AS (SELECT sum(cnt)::BIGINT AS total, count(*)::BIGINT AS n_hosts FROM counts)
SELECT host, cnt,
       floor(cnt * 1000000 / total)::BIGINT AS share_ppm,
       floor((cnt + {_SALT_CAP - 1}) / {_SALT_CAP})::BIGINT AS salt_k,
       (cnt * n_hosts > 2 * total)::INTEGER AS heavy
FROM counts, tot
ORDER BY cnt DESC, host
"""


# -- winnowing fingerprints (MOSS) ---------------------------------------------------------

_WIN_K = 4  # tokens per k-gram
_WIN_W = 5  # winnowing window (k-gram hashes per window)


def q_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (Schleimer-Wilkerson-Aiken,
    SIGMOD'03 / MOSS): hash every {_WIN_K}-token k-gram, slide a window
    of {_WIN_W} consecutive hashes, keep each window's minimum — the
    selected set is a position-robust fingerprint whose density is
    guaranteed in [1/w, 2/(w+1)], the property that makes it the
    standard plagiarism/near-dup sketch when shingle sets are too big
    to keep whole. (This implementation keeps the distinct selected
    hash VALUES per doc — the value set drives the downstream
    fingerprint join; window positions are not needed for that.)

    Scale shape: entirely map-side — one expression builds k-gram
    hashes, window minima and the distinct set per row; no shuffle
    except the output sort. Complements `doc_fingerprint` (whole-doc
    md5, exact dup only) with a partial-overlap-detecting sketch."""
    docs = _tokens(_docs_parallel(spark, sf_dir)).filter(
        F.expr(f"size(toks) >= {_WIN_K + _WIN_W - 1}")
    )
    hashed = docs.select(
        "doc_id",
        F.expr(
            f"transform(sequence(1, size(toks) - {_WIN_K - 1}), i -> "
            f"cast(conv(substring(md5(concat_ws(' ', slice(toks, i, {_WIN_K}))), 1, 12), 16, 10) as bigint))"
        ).alias("hashes"),
    )
    sel = hashed.select(
        "doc_id",
        F.expr("size(hashes)").cast("bigint").alias("n_kgrams"),
        F.expr(
            f"array_distinct(transform(sequence(1, size(hashes) - {_WIN_W - 1}), j -> "
            f"array_min(slice(hashes, j, {_WIN_W}))))"
        ).alias("fps"),
    )
    return sel.select(
        "doc_id",
        "n_kgrams",
        F.size("fps").cast("bigint").alias("n_selected"),
        F.floor(F.col("n_kgrams") / F.size("fps")).cast("bigint").alias("stride"),
        F.array_min("fps").alias("min_fp"),
    ).orderBy("doc_id")


SQL_WINNOW_FINGERPRINTS = f"""
WITH toks AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
ok AS (SELECT doc_id, toks FROM toks WHERE len(toks) >= {_WIN_K + _WIN_W - 1}),
hashed AS (
  SELECT doc_id,
         list_transform(range(1, len(toks) - {_WIN_K - 1} + 1), i ->
           ('0x' || substr(md5(array_to_string(list_slice(toks, i, i + {_WIN_K - 1}), ' ')), 1, 12))::BIGINT
         ) AS hashes
  FROM ok
),
sel AS (
  SELECT doc_id, len(hashes)::BIGINT AS n_kgrams,
         list_distinct(list_transform(range(1, len(hashes) - {_WIN_W - 1} + 1), j ->
           list_min(list_slice(hashes, j, j + {_WIN_W - 1})))) AS fps
  FROM hashed
)
SELECT doc_id, n_kgrams, len(fps)::BIGINT AS n_selected,
       floor(n_kgrams / len(fps))::BIGINT AS stride,
       list_min(fps)::BIGINT AS min_fp
FROM sel ORDER BY doc_id
"""


# -- population stability index (PSI) drift -------------------------------------------------

_PSI_BINS = 10


def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index per event_type: bin `value` into
    {_PSI_BINS} fixed-width bins spanning the GLOBAL [min, max], then
    PSI(type) = sum_bins (p_b - q_b) * ln(p_b / q_b) where p is the
    type's bin share and q the global share, both Laplace-smoothed
    (+0.5 per bin) so empty bins stay finite. PSI is the standard
    "did this segment's distribution drift from the corpus?" monitor
    (credit-scoring lineage; PSI > 0.2 = action) — here it flags event
    types whose value distribution diverges, the same shape a crawl
    uses to flag hosts whose page-quality distribution shifted.

    Scale shape: one 2-row-broadcast range scan, one (type, bin)
    groupBy with map-side partials, a tiny type x bin grid join (all
    broadcast), one fold per type. The full grid (distinct types x
    {_PSI_BINS}) makes the smoothing exact even for bins a type never
    hits."""
    ev = _read(spark, sf_dir, "events").select(
        "event_type", F.col("value").cast("double").alias("v")
    )
    rng = ev.agg(
        F.min("v").alias("lo"),
        F.max("v").alias("hi"),
        F.count("*").cast("bigint").alias("n_all"),
    )
    binned = ev.crossJoin(F.broadcast(rng)).select(
        "event_type",
        "n_all",
        F.least(
            F.floor(
                (F.col("v") - F.col("lo"))
                / ((F.col("hi") - F.col("lo")) / F.lit(float(_PSI_BINS)))
            ),
            F.lit(_PSI_BINS - 1),
        )
        .cast("int")
        .alias("bin"),
    )
    per = binned.groupBy("event_type", "bin").agg(
        F.count("*").cast("bigint").alias("c")
    )
    glob = per.groupBy("bin").agg(F.sum("c").cast("bigint").alias("g"))
    tot_type = per.groupBy("event_type").agg(F.sum("c").cast("bigint").alias("n_type"))
    grid = tot_type.crossJoin(
        F.broadcast(spark.range(_PSI_BINS).select(F.col("id").cast("int").alias("bin")))
    ).crossJoin(F.broadcast(rng.select("n_all")))
    full = (
        grid.join(per, ["event_type", "bin"], "left")
        .join(F.broadcast(glob), "bin", "left")
        .na.fill({"c": 0, "g": 0})
    )
    terms = full.select(
        "event_type",
        "n_type",
        (
            (
                (F.col("c") + 0.5) / (F.col("n_type") + 0.5 * _PSI_BINS)
                - (F.col("g") + 0.5) / (F.col("n_all") + 0.5 * _PSI_BINS)
            )
            * (
                F.log(
                    ((F.col("c") + 0.5) / (F.col("n_type") + 0.5 * _PSI_BINS))
                    / ((F.col("g") + 0.5) / (F.col("n_all") + 0.5 * _PSI_BINS))
                )
            )
        ).alias("term"),
    )
    return (
        terms.groupBy("event_type")
        .agg(
            F.first("n_type").alias("n_type"),
            F.round(F.sum("term"), 6).alias("psi"),
        )
        .orderBy("event_type")
    )


SQL_PSI_DRIFT = f"""
WITH ev AS (SELECT event_type, value::DOUBLE AS v FROM events),
rng AS (SELECT min(v) AS lo, max(v) AS hi, count(*)::BIGINT AS n_all FROM ev),
binned AS (
  SELECT event_type, n_all,
         least(floor((v - lo) / ((hi - lo) / {float(_PSI_BINS)})), {_PSI_BINS - 1})::INTEGER AS bin
  FROM ev, rng
),
per AS (SELECT event_type, bin, count(*)::BIGINT AS c, any_value(n_all) AS n_all
        FROM binned GROUP BY event_type, bin),
gbin AS (SELECT bin, sum(c)::BIGINT AS g FROM per GROUP BY bin),
tot_type AS (SELECT event_type, sum(c)::BIGINT AS n_type FROM per GROUP BY event_type),
grid AS (
  SELECT t.event_type, t.n_type, a.n_all, b.bin
  FROM tot_type t
  CROSS JOIN (SELECT unnest(list_transform(range(0, {_PSI_BINS}), x -> x::INTEGER)) AS bin) b
  CROSS JOIN (SELECT any_value(n_all) AS n_all FROM per) a
),
full_grid AS (
  SELECT gr.event_type, gr.n_type, gr.n_all, gr.bin,
         coalesce(p.c, 0)::BIGINT AS c, coalesce(gl.g, 0)::BIGINT AS g
  FROM grid gr
  LEFT JOIN per p ON p.event_type = gr.event_type AND p.bin = gr.bin
  LEFT JOIN gbin gl ON gl.bin = gr.bin
)
SELECT event_type, any_value(n_type) AS n_type,
       round(sum(
         ((c + 0.5) / (n_type + {0.5 * _PSI_BINS}) - (g + 0.5) / (n_all + {0.5 * _PSI_BINS}))
         * ln(((c + 0.5) / (n_type + {0.5 * _PSI_BINS})) / ((g + 0.5) / (n_all + {0.5 * _PSI_BINS})))
       ), 6) AS psi
FROM full_grid
GROUP BY event_type
ORDER BY event_type
"""


# -- code-vs-prose detection ----------------------------------------------------------------

_CODE_SYM = r"[{}();=<>\[\]]"
_CODE_KW = r"\b(def|return|import|function|var|const|class|void|lambda)\b"


def q_code_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code-vs-prose routing heuristic: count code-ish symbols
    (braces, parens, semicolons, comparison/assignment) and
    programming keywords per document; flag as code when the symbol
    density or keyword count clears a threshold. Training pipelines
    route code and prose to different tokenizers/mixture buckets, so
    this classification runs over every document of a 100 TB corpus —
    it must be (and is) a pure map: two regexp counts per row, no
    shuffle but the output sort, integer-exact on both engines.

    Thresholds: is_code = sym_cnt * 50 > n_chars (>= 2% symbol
    density) OR kw_hits >= 3."""
    docs = _read(spark, sf_dir, "documents")
    counted = docs.select(
        "doc_id",
        F.regexp_count(F.col("text"), F.lit(_CODE_SYM)).cast("bigint").alias("sym_cnt"),
        F.regexp_count(F.lower("text"), F.lit(_CODE_KW)).cast("bigint").alias("kw_hits"),
        F.length("text").cast("bigint").alias("n_chars"),
    )
    return counted.select(
        "doc_id",
        "sym_cnt",
        "kw_hits",
        F.floor(F.col("sym_cnt") * 1000000 / F.greatest("n_chars", F.lit(1)))
        .cast("bigint")
        .alias("sym_ppm"),
        ((F.col("sym_cnt") * 50 > F.col("n_chars")) | (F.col("kw_hits") >= 3))
        .cast("int")
        .alias("is_code"),
    ).orderBy("doc_id")


SQL_CODE_DETECT = r"""
WITH counted AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '[{}();=<>\[\]]'))::BIGINT AS sym_cnt,
         len(regexp_extract_all(lower(text), '\b(def|return|import|function|var|const|class|void|lambda)\b'))::BIGINT AS kw_hits,
         length(text)::BIGINT AS n_chars
  FROM documents
)
SELECT doc_id, sym_cnt, kw_hits,
       floor(sym_cnt * 1000000 / greatest(n_chars, 1))::BIGINT AS sym_ppm,
       (sym_cnt * 50 > n_chars OR kw_hits >= 3)::INTEGER AS is_code
FROM counted ORDER BY doc_id
"""


# -- SALSA hub/authority scores -------------------------------------------------------------

_SALSA_ITERS = 2
_SALSA_UNIT = 1_000_000_000  # integer nano-units: h0 = 1.0


def q_salsa_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SALSA hub/authority scores (Lempel & Moran, WWW'00; the random-walk
    variant of HITS that powers Twitter's WTF recommender): authorities
    receive each hub's mass split evenly over its OUT-degree, hubs receive
    each authority's mass split over its IN-degree — the degree
    normalization HITS lacks, which stops tightly-knit link farms from
    absorbing all the score (TKC effect). {_SALSA_ITERS} unrolled rounds
    over the derived 50-node host graph.

    Engine parity: mass in integer nano-units, each edge ships
    `h div out_deg` (integer division) so every propagation term is exact
    and order-independent — zero float-sum surface on either engine.

    Scale shape: degrees computed once and pinned to the edge list
    (one join pair, then localCheckpoint), each round = one shuffle join
    + one groupBy sum, the same Pregel-as-DataFrames shape as q_pagerank;
    per-round localCheckpoint keeps plans flat. Reference analogue: the
    mutual-reinforcement priority propagation (NetworkEstimator.scala:
    101-124) that SALSA degree-normalizes."""
    edges = _pagerank_edges(spark, sf_dir).localCheckpoint()
    outd = edges.groupBy("src").agg(F.count("*").cast("bigint").alias("og"))
    ind = edges.groupBy("dst").agg(F.count("*").cast("bigint").alias("ig"))
    de = edges.join(outd, "src").join(ind, "dst").localCheckpoint()
    h = outd.select(
        F.col("src").alias("node"), F.lit(_SALSA_UNIT).cast("bigint").alias("h")
    )
    a = None
    for _ in range(_SALSA_ITERS):
        a = (
            de.join(h, de.src == h.node)
            .select("dst", F.expr("h div og").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").cast("bigint").alias("a"))
            .withColumnRenamed("dst", "node")
            .localCheckpoint()
        )
        h = (
            de.join(a, de.dst == a.node)
            .select("src", F.expr("a div ig").alias("c"))
            .groupBy("src")
            .agg(F.sum("c").cast("bigint").alias("h"))
            .withColumnRenamed("src", "node")
            .localCheckpoint()
        )
    return (
        a.join(h, "node", "full_outer")
        .select(
            "node",
            F.coalesce("a", F.lit(0)).cast("bigint").alias("auth_nano"),
            F.coalesce("h", F.lit(0)).cast("bigint").alias("hub_nano"),
        )
        .orderBy("node")
    )


def _sql_salsa_iter(h_prev: str, a_cur: str, h_cur: str) -> str:
    return f"""
{a_cur} AS (
  SELECT de.dst AS node, sum(h.h // de.og)::BIGINT AS a
  FROM de JOIN {h_prev} h ON de.src = h.node GROUP BY de.dst
),
{h_cur} AS (
  SELECT de.src AS node, sum(a.a // de.ig)::BIGINT AS h
  FROM de JOIN {a_cur} a ON de.dst = a.node GROUP BY de.src
)"""


SQL_SALSA_SCORES = f"""
WITH edges AS (
  SELECT DISTINCT user_id % {_PR_NODES} AS src,
         ('0x' || substr(md5(event_id::VARCHAR), 1, 4))::BIGINT % {_PR_NODES} AS dst
  FROM events
  WHERE user_id % {_PR_NODES}
        <> ('0x' || substr(md5(event_id::VARCHAR), 1, 4))::BIGINT % {_PR_NODES}
),
outd AS (SELECT src, count(*)::BIGINT AS og FROM edges GROUP BY src),
ind  AS (SELECT dst, count(*)::BIGINT AS ig FROM edges GROUP BY dst),
de AS (
  SELECT e.src, e.dst, o.og, i.ig
  FROM edges e JOIN outd o ON e.src = o.src JOIN ind i ON e.dst = i.dst
),
h0 AS (SELECT src AS node, {_SALSA_UNIT}::BIGINT AS h FROM outd),
{_sql_salsa_iter('h0', 'a1', 'h1')},
{_sql_salsa_iter('h1', 'a2', 'h2')}
SELECT coalesce(a2.node, h2.node) AS node,
       coalesce(a2.a, 0)::BIGINT AS auth_nano,
       coalesce(h2.h, 0)::BIGINT AS hub_nano
FROM a2 FULL JOIN h2 ON a2.node = h2.node
ORDER BY node
"""


# -- AMS / tug-of-war F2 sketch --------------------------------------------------------------

_AMS_K = 16  # sketch copies: 4 groups x 4 (median of means)


def q_ams_f2_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMS "tug-of-war" second-frequency-moment sketch (Alon-Matias-
    Szegedy, STOC'96) per language: each of {_AMS_K} sketches keeps
    Z_k = sum_t f_t * sign_k(t) with a md5-derived +/-1 sign per term;
    E[Z^2] = F2 = sum_t f_t^2 — the self-join size of the term stream,
    which is exactly what a planner needs to size the shuffle of a
    skewed join before running it. Estimate = lower-median of 4
    means-of-4 of Z_k^2 (the classic median-of-means variance kill).

    Everything stays integer: signed contributions, Z sums, squares,
    the rank-picked median and the `div 4` mean — zero float surface,
    bit-identical on both engines. Exact F2 and the error in ppm ride
    alongside as the estimator audit.

    Scale shape: one (lang, term) groupBy with map-side partials, a
    16-wide map-side sign array per term row, one tiny (lang, k)
    re-agg (5 langs x 16 rows after partials), closed-form finish. At
    10^10 docs the sketch replaces the exact per-key count join-size
    probe the optimizer can't afford."""
    docs = _tokens(_docs_parallel(spark, sf_dir))
    tf = (
        docs.select("lang", F.explode("toks").alias("term"))
        .groupBy("lang", "term")
        .agg(F.count("*").cast("bigint").alias("f"))
    )
    contrib = tf.select(
        "lang",
        F.expr(
            f"transform(sequence(0, {_AMS_K - 1}), k -> "
            "case when cast(conv(substring(md5(concat(cast(k as string), '|', term)), 1, 1), 16, 10) as int) % 2 = 0 "
            "then f else -f end)"
        ).alias("cs"),
    )
    z = (
        contrib.select("lang", F.posexplode("cs").alias("k", "c"))
        .groupBy("lang", "k")
        .agg(F.sum("c").cast("bigint").alias("z"))
    )
    gs = (
        z.select("lang", F.expr("k div 4").alias("g"), (F.col("z") * F.col("z")).alias("z2"))
        .groupBy("lang", "g")
        .agg(F.sum("z2").cast("bigint").alias("gs"))
    )
    med = gs.groupBy("lang").agg(
        F.sort_array(F.collect_list("gs")).alias("arr")
    ).select("lang", F.expr("arr[1]").cast("bigint").alias("med4"))
    exact = tf.groupBy("lang").agg(
        F.sum(F.col("f") * F.col("f")).cast("bigint").alias("f2_exact")
    )
    return (
        med.join(exact, "lang")
        .select(
            "lang",
            "f2_exact",
            F.expr("med4 div 4").cast("bigint").alias("f2_est"),
            F.expr("abs(med4 div 4 - f2_exact) * 1000000 div f2_exact")
            .cast("bigint")
            .alias("err_ppm"),
        )
        .orderBy("lang")
    )


SQL_AMS_F2_SKETCH = f"""
WITH toks AS (SELECT lang, {_SQL_TOKS} AS toks FROM documents),
tf AS (
  SELECT lang, t.term, count(*)::BIGINT AS f
  FROM toks, unnest(toks.toks) AS t(term)
  GROUP BY lang, t.term
),
z AS (
  SELECT lang, k.k,
         sum(CASE WHEN ('0x' || substr(md5(k.k::VARCHAR || '|' || term), 1, 1))::INTEGER % 2 = 0
                  THEN f ELSE -f END)::BIGINT AS z
  FROM tf CROSS JOIN (SELECT unnest(range(0, {_AMS_K})) AS k) k
  GROUP BY lang, k.k
),
gs AS (SELECT lang, k // 4 AS g, sum(z * z)::BIGINT AS gs FROM z GROUP BY lang, k // 4),
med AS (
  SELECT lang, gs AS med4
  FROM (SELECT lang, gs, row_number() OVER (PARTITION BY lang ORDER BY gs) AS rn FROM gs)
  WHERE rn = 2
),
exact AS (SELECT lang, sum(f * f)::BIGINT AS f2_exact FROM tf GROUP BY lang)
SELECT m.lang, e.f2_exact,
       (m.med4 // 4)::BIGINT AS f2_est,
       (abs(m.med4 // 4 - e.f2_exact) * 1000000 // e.f2_exact)::BIGINT AS err_ppm
FROM med m JOIN exact e ON m.lang = e.lang
ORDER BY m.lang
"""


# -- soft-404 / error-page detection ---------------------------------------------------------

_S404_MOD = 23
_S404_TEXT_SPARK = (
    "concat('error 404 page not found the requested url /p', "
    "cast(doc_id % 25 as string), "
    "' was not found on this server please check the address or return to the homepage')"
)
_S404_TEXT_SQL = (
    "'error 404 page not found the requested url /p' || (doc_id % 25)::VARCHAR || "
    "' was not found on this server please check the address or return to the homepage'"
)


def q_soft404_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soft-404 detection: pages that answer HTTP 200 but carry an error
    body poison both the URL-seen set (the crawler marks a dead URL
    fetched) and the training corpus (boilerplate error text at scale),
    so every production crawl runs a body-text error classifier (cf.
    Bar-Yossef et al., WWW'04 "Sic transit gloria telae"). Planted
    in-engine: docs with doc_id %% {_S404_MOD} == 0 carry a
    deterministic error body; the detector fires on >= 2 independent
    signal families (status-code token, 'not found' phrase, error
    boilerplate phrases) so no single stray token misroutes a real page.

    Scale shape: pure map — three regexp counts + a token count per
    row, no shuffle but the output sort; the flag feeds the same
    admission gate as the MIME filter (crawler.py:476-483)."""
    docs = _read(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.when(
            F.col("doc_id") % _S404_MOD == 0, F.expr(_S404_TEXT_SPARK)
        )
        .otherwise(F.col("text"))
        .alias("txt"),
    )
    sig = docs.select(
        "doc_id",
        "source",
        F.size(F.expr(r"filter(split(lower(txt), '\\s+'), t -> t <> '')"))
        .cast("bigint")
        .alias("n_toks"),
        F.regexp_count(F.lower("txt"), F.lit(r"\b(404|410)\b"))
        .cast("bigint")
        .alias("hits_code"),
        F.regexp_count(F.lower("txt"), F.lit(r"\bnot found\b"))
        .cast("bigint")
        .alias("hits_notfound"),
        F.regexp_count(
            F.lower("txt"),
            F.lit(r"requested url|does not exist|forbidden|no longer available"),
        )
        .cast("bigint")
        .alias("hits_phrase"),
    )
    return sig.select(
        "doc_id",
        "source",
        "n_toks",
        "hits_code",
        "hits_notfound",
        "hits_phrase",
        (
            (F.col("hits_code") > 0).cast("int")
            + (F.col("hits_notfound") > 0).cast("int")
            + (F.col("hits_phrase") > 0).cast("int")
        ).alias("sig_cnt"),
        (
            (
                (F.col("hits_code") > 0).cast("int")
                + (F.col("hits_notfound") > 0).cast("int")
                + (F.col("hits_phrase") > 0).cast("int")
            )
            >= 2
        )
        .cast("int")
        .alias("is_soft404"),
    ).orderBy("doc_id")


SQL_SOFT404_DETECT = rf"""
WITH docs AS (
  SELECT doc_id, source,
         CASE WHEN doc_id % {_S404_MOD} = 0 THEN {_S404_TEXT_SQL} ELSE text END AS txt
  FROM documents
),
sig AS (
  SELECT doc_id, source,
         len(list_filter(regexp_split_to_array(lower(txt), '\s+'), t -> t <> ''))::BIGINT AS n_toks,
         len(regexp_extract_all(lower(txt), '\b(404|410)\b'))::BIGINT AS hits_code,
         len(regexp_extract_all(lower(txt), '\bnot found\b'))::BIGINT AS hits_notfound,
         len(regexp_extract_all(lower(txt), 'requested url|does not exist|forbidden|no longer available'))::BIGINT AS hits_phrase
  FROM docs
)
SELECT doc_id, source, n_toks, hits_code, hits_notfound, hits_phrase,
       ((hits_code > 0)::INTEGER + (hits_notfound > 0)::INTEGER + (hits_phrase > 0)::INTEGER) AS sig_cnt,
       (((hits_code > 0)::INTEGER + (hits_notfound > 0)::INTEGER + (hits_phrase > 0)::INTEGER) >= 2)::INTEGER AS is_soft404
FROM sig ORDER BY doc_id
"""


# -- Z-order (Morton) layout keys ------------------------------------------------------------


def _morton_expr(xcol: str, ycol: str, divop: str) -> str:
    """Bit-interleave two 16-bit quantized columns into a 32-bit Morton
    code using only integer div/mod/multiply/add so the same generated
    expression (modulo the integer-division token) evaluates
    bit-identically on Spark (`div`) and DuckDB (`//`)."""
    terms = []
    for i in range(16):
        terms.append(f"(({xcol} {divop} {1 << i}) % 2) * {1 << (2 * i + 1)}")
        terms.append(f"(({ycol} {divop} {1 << i}) % 2) * {1 << (2 * i)}")
    return " + ".join(terms)


def q_zorder_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton-curve) layout keys over (user_id, event time):
    the data-clustering primitive behind Delta OPTIMIZE ZORDER BY and
    Iceberg's sort-order rewrite. Writing 100 TB of events sorted by the
    interleaved key makes min/max file statistics selective on BOTH
    dimensions at once, so a scan filtered on either user or time prunes
    most files — a single-column sort only ever prunes one.

    Each dimension is linearly quantized to 16 bits against the global
    min/max (one tiny agg broadcast back over the table), then the bits
    are interleaved into a 32-bit key; `zfile = zval div 2^22` is the
    1024-way target-file assignment a compaction writer would use.
    Everything is integer arithmetic — bit-identical across engines.

    Scale shape: one O(1)-row aggregate + a broadcast cross join + a
    pure map; the only wide exchange a real writer adds is the final
    range-partition by zval, which is exactly the shuffle the layout
    pays for once to save every subsequent scan."""
    ev = _read(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        # parquet timestamps arrive NTZ; session tz is UTC so the cast is
        # the identity instant and matches DuckDB's epoch_ms exactly
        F.expr("unix_millis(cast(ts as timestamp))").alias("tms"),
    )
    agg = ev.agg(
        F.min("user_id").alias("minu"),
        F.max("user_id").alias("maxu"),
        F.min("tms").alias("mint"),
        F.max("tms").alias("maxt"),
    )
    q = ev.crossJoin(F.broadcast(agg)).select(
        "event_id",
        F.expr("(user_id - minu) * 65535 div greatest(maxu - minu, 1)")
        .cast("bigint")
        .alias("x16"),
        F.expr("(tms - mint) * 65535 div greatest(maxt - mint, 1)")
        .cast("bigint")
        .alias("y16"),
    )
    z = q.select(
        "event_id",
        "x16",
        "y16",
        F.expr(_morton_expr("x16", "y16", "div")).cast("bigint").alias("zval"),
    )
    return z.select(
        "event_id",
        "x16",
        "y16",
        "zval",
        F.expr(f"zval div {1 << 22}").cast("bigint").alias("zfile"),
    ).orderBy("event_id")


SQL_ZORDER_KEYS = f"""
WITH ev AS (SELECT event_id, user_id, epoch_ms(ts) AS tms FROM events),
agg AS (SELECT min(user_id) AS minu, max(user_id) AS maxu,
               min(tms) AS mint, max(tms) AS maxt FROM ev),
q AS (
  SELECT event_id,
         ((user_id - minu) * 65535 // greatest(maxu - minu, 1))::BIGINT AS x16,
         ((tms - mint) * 65535 // greatest(maxt - mint, 1))::BIGINT AS y16
  FROM ev CROSS JOIN agg
),
z AS (SELECT event_id, x16, y16, ({_morton_expr('x16', 'y16', '//')})::BIGINT AS zval FROM q)
SELECT event_id, x16, y16, zval, (zval // {1 << 22})::BIGINT AS zfile
FROM z ORDER BY event_id
"""


# -- posting-list delta + varint compression estimate -----------------------------------------


def q_posting_delta_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-gap + varint size accounting for inverted-index posting
    lists (the storage format behind Lucene/Indri postings): per term,
    doc ids are sorted, first id stored absolute (+1 so id 0 still
    costs one byte) and the rest as gaps, each costing
    1 + [g>=2^7] + [g>=2^14] + [g>=2^21] + [g>=2^28] varint bytes.
    Output per term: df, varint bytes, raw 8-byte-per-posting bytes,
    and savings in ppm — the sizing input for the `inverted_index`
    operator's storage plan at 10^10-doc scale, where posting
    compression is the difference between an index that fits on the
    cluster and one that doesn't.

    Scale shape: explode -> (term, doc_id) distinct (one shuffle),
    lag window per term (same partitioning, no second exchange),
    groupBy term with map-side partials. Integer-only arithmetic."""
    post = (
        _tokens(_docs_parallel(spark, sf_dir))
        .select(F.explode("toks").alias("term"), "doc_id")
        .distinct()
    )
    w = Window.partitionBy("term").orderBy("doc_id")
    g = post.withColumn(
        "g",
        F.coalesce(F.col("doc_id") - F.lag("doc_id").over(w), F.col("doc_id") + 1),
    ).withColumn(
        "nbytes",
        F.expr(
            "1 + cast(g >= 128 as int) + cast(g >= 16384 as int) "
            "+ cast(g >= 2097152 as int) + cast(g >= 268435456 as int)"
        ).cast("bigint"),
    )
    out = g.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("df"),
        F.sum("nbytes").cast("bigint").alias("varint_bytes"),
    )
    return out.select(
        "term",
        "df",
        "varint_bytes",
        (F.col("df") * 8).cast("bigint").alias("raw_bytes"),
        F.expr("(df * 8 - varint_bytes) * 1000000 div (df * 8)")
        .cast("bigint")
        .alias("savings_ppm"),
    ).orderBy("term")


SQL_POSTING_DELTA_BYTES = f"""
WITH toks AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
post AS (SELECT DISTINCT t.term, toks.doc_id FROM toks, unnest(toks.toks) AS t(term)),
gaps AS (
  SELECT term,
         coalesce(doc_id - lag(doc_id) OVER (PARTITION BY term ORDER BY doc_id),
                  doc_id + 1) AS g
  FROM post
),
b AS (
  SELECT term,
         (1 + (g >= 128)::INTEGER + (g >= 16384)::INTEGER
            + (g >= 2097152)::INTEGER + (g >= 268435456)::INTEGER)::BIGINT AS nbytes
  FROM gaps
)
SELECT term, count(*)::BIGINT AS df, sum(nbytes)::BIGINT AS varint_bytes,
       (count(*) * 8)::BIGINT AS raw_bytes,
       ((count(*) * 8 - sum(nbytes)) * 1000000 // (count(*) * 8))::BIGINT AS savings_ppm
FROM b GROUP BY term ORDER BY term
"""


# -- ROC AUC (Mann-Whitney rank-sum, integer-exact) -------------------------------------------

_AUC_THRESH = 500
_AUC_NOISE_SPARK = (
    "cast(conv(substring(md5(cast(doc_id as string)), 1, 8), 16, 10) as bigint) % 400"
)
_AUC_NOISE_SQL = "('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 400"


def q_roc_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC AUC via the Mann-Whitney rank-sum identity, per language —
    the standard acceptance metric for every quality / spam / soft-404
    classifier this engine trains (quality_classifier, trust_rank's
    seed scorer): AUC = P(score_pos > score_neg) + P(tie)/2. Planted
    labels: y = 1 iff n_chars + md5-noise(doc_id) % 400 > {_AUC_THRESH},
    so the n_chars score is informative but noisy (AUC strictly between
    0.5 and 1) and tied scores exist — the tie-handling path is
    exercised, not skipped.

    Integer-exact: per distinct score the window-cumulative count of
    strictly-lower rows gives each tie group's doubled average rank
    2*cless + n + 1; AUC_micro = (R2 - np*(np+1)) * 10^6 div (2*np*nn)
    where R2 = sum over positives of doubled ranks. No float surface.

    Scale shape: groupBy (lang, score) with map-side partials collapses
    10^10 rows to |langs|x|distinct scores| before the window; the
    window and final agg run on the collapsed frame. This is the
    distributed-AUC trick (rank-sum over a histogram) — no global
    sort of raw rows."""
    docs = _read(spark, sf_dir, "documents").select(
        "lang",
        F.col("n_chars").alias("s"),
        F.expr(
            f"cast(n_chars + {_AUC_NOISE_SPARK} > {_AUC_THRESH} as int)"
        ).alias("y"),
    )
    g = docs.groupBy("lang", "s").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("npos"),
    )
    w = Window.partitionBy("lang").orderBy("s")
    c = g.withColumn("cless", F.sum("n").over(w) - F.col("n"))
    per = c.groupBy("lang").agg(
        F.sum(F.col("npos") * (2 * F.col("cless") + F.col("n") + 1))
        .cast("bigint")
        .alias("r2"),
        F.sum("npos").cast("bigint").alias("np"),
        F.sum("n").cast("bigint").alias("ntot"),
    )
    return (
        per.select(
            "lang",
            F.col("np").alias("n_pos"),
            (F.col("ntot") - F.col("np")).alias("n_neg"),
            F.expr("(r2 - np * (np + 1)) * 1000000 div (2 * np * (ntot - np))")
            .cast("bigint")
            .alias("auc_micro"),
        )
        .withColumn("gini_micro", (F.col("auc_micro") * 2 - 1000000).cast("bigint"))
        .orderBy("lang")
    )


SQL_ROC_AUC = f"""
WITH docs AS (
  SELECT lang, n_chars AS s,
         (n_chars + {_AUC_NOISE_SQL} > {_AUC_THRESH})::INTEGER AS y
  FROM documents
),
g AS (SELECT lang, s, count(*)::BIGINT AS n, sum(y)::BIGINT AS npos FROM docs GROUP BY lang, s),
c AS (
  SELECT lang, s, n, npos,
         sum(n) OVER (PARTITION BY lang ORDER BY s) - n AS cless
  FROM g
),
per AS (
  SELECT lang,
         sum(npos * (2 * cless + n + 1))::BIGINT AS r2,
         sum(npos)::BIGINT AS np,
         sum(n)::BIGINT AS ntot
  FROM c GROUP BY lang
)
SELECT lang, np AS n_pos, (ntot - np) AS n_neg,
       ((r2 - np * (np + 1)) * 1000000 // (2 * np * (ntot - np)))::BIGINT AS auc_micro,
       (((r2 - np * (np + 1)) * 1000000 // (2 * np * (ntot - np))) * 2 - 1000000)::BIGINT AS gini_micro
FROM per ORDER BY lang
"""


# -- community conductance --------------------------------------------------------------------

_COND_K = 5  # planted communities: node % 5


def q_community_conductance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conductance per community over the 50-node host graph — the
    quality check applied after any partitioning/clustering of the crawl
    graph (label_propagation, host_graph_collapse): low conductance =
    few cut edges relative to internal volume = the partition is a good
    unit for co-scheduling fetches / sharding the frontier. Communities
    here are the planted node%{_COND_K} blocks on the md5-random graph,
    so measured conductance sits near the random-graph expectation
    (≈ 1 - 1/{_COND_K}) — the test pins both the exact arithmetic and
    that regime.

    Integer-exact: vol(c) = edge endpoints in c, cut(c) = edges with
    exactly one endpoint in c, phi_micro = cut * 10^6 div
    min(vol, 2|E| - vol).

    Scale shape: one map over the edge list, one endpoint-exploding
    union groupBy (map-side partials), one 1-row |E| aggregate broadcast
    back — no join on the big side at all."""
    edges = _pagerank_edges(spark, sf_dir).select(
        (F.col("src") % _COND_K).alias("ca"),
        (F.col("dst") % _COND_K).alias("cb"),
    )
    ends = edges.select(
        F.col("ca").alias("c"), (F.col("ca") != F.col("cb")).cast("bigint").alias("x")
    ).unionAll(
        edges.select(
            F.col("cb").alias("c"),
            (F.col("ca") != F.col("cb")).cast("bigint").alias("x"),
        )
    )
    per = ends.groupBy("c").agg(
        F.count(F.lit(1)).cast("bigint").alias("vol"),
        F.sum("x").cast("bigint").alias("cut"),
    )
    tot = edges.agg((F.count(F.lit(1)) * 2).cast("bigint").alias("vol_all"))
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            F.col("c").alias("community"),
            "vol",
            "cut",
            F.expr("cut * 1000000 div least(vol, vol_all - vol)")
            .cast("bigint")
            .alias("phi_micro"),
        )
        .orderBy("community")
    )


SQL_COMMUNITY_CONDUCTANCE = f"""
WITH edges AS (
  SELECT DISTINCT src, dst FROM (
    SELECT user_id % 50 AS src,
           ('0x' || substr(md5(event_id::VARCHAR), 1, 4))::BIGINT % 50 AS dst
    FROM events
  ) WHERE src <> dst
),
ec AS (SELECT src % {_COND_K} AS ca, dst % {_COND_K} AS cb FROM edges),
ends AS (
  SELECT ca AS c, (ca <> cb)::BIGINT AS x FROM ec
  UNION ALL
  SELECT cb AS c, (ca <> cb)::BIGINT AS x FROM ec
),
per AS (SELECT c, count(*)::BIGINT AS vol, sum(x)::BIGINT AS cut FROM ends GROUP BY c),
tot AS (SELECT (count(*) * 2)::BIGINT AS vol_all FROM ec)
SELECT c AS community, vol, cut,
       (cut * 1000000 // least(vol, vol_all - vol))::BIGINT AS phi_micro
FROM per CROSS JOIN tot ORDER BY community
"""


# -- Johnson-Lindenstrauss random-projection distortion eval -----------------------------------

_JL_D = 16  # target dimensionality


def _jl_proj_exprs(dv: str, engine: str) -> list[str]:
    """The {_JL_D} signed-sum projections of a double array, one expression
    per output dim; sign(j,k) = +/-1 from the first md5 hex nibble of
    "j|k" — reproducible bit-for-bit on both engines, and the fold order
    over j is sequential on both so the doubles match before rounding."""
    out = []
    for k in range(_JL_D):
        if engine == "spark":
            sign = (
                f"case when cast(conv(substring(md5(concat(cast(j as string), '|{k}')), 1, 1), 16, 10) as int) % 2 = 0 "
                f"then 1.0d else -1.0d end"
            )
            out.append(
                f"aggregate(sequence(0, size({dv}) - 1), cast(0.0 as double), "
                f"(acc, j) -> acc + ({sign}) * element_at({dv}, j + 1))"
            )
        else:
            sign = (
                f"CASE WHEN ('0x' || substr(md5(j::VARCHAR || '|{k}'), 1, 1))::INTEGER % 2 = 0 "
                f"THEN 1.0 ELSE -1.0 END"
            )
            out.append(
                f"list_sum(list_transform(range(0, len({dv})), "
                f"j -> ({sign}) * {dv}[j + 1]))"
            )
    return out


def q_jl_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss sketch audit: project 64-d embeddings to
    {_JL_D}-d with a deterministic ±1 sign matrix and measure, per
    consecutive-id pair, the squared-distance distortion
    d2_jl/d2 — the pre-flight check before swapping the full vectors for
    JL sketches in the dedup / k-NN-graph candidate stages (at 100 TB
    the 4x-16x vector shrink is a shuffle-volume win only if distortion
    is in the JL band, which this measures on real data).

    Projection is applied to the pair DIFFERENCE vector (projection is
    linear, so one {_JL_D}-fold pass per pair instead of two) and scaled
    by 1/{_JL_D}: E[d2_jl] = d2. Doubles follow the engine-shared
    sequential fold; outputs rounded.

    Scale shape: self-join on vec_id+1 (both sides hash-partitioned on
    the join key — at 10^10 vectors the pair sample rides whatever
    candidate generator feeds it), then a pure map; no Python."""
    e = _read(spark, sf_dir, "embeddings")
    a = e.select(F.col("vec_id").alias("a_id"), F.col("embedding").alias("ea"))
    b = e.select((F.col("vec_id") - 1).alias("a_id"), F.col("vec_id").alias("b_id"), F.col("embedding").alias("eb"))
    pairs = a.join(b, "a_id").withColumn(
        "dv",
        F.expr("zip_with(ea, eb, (x, y) -> cast(x as double) - cast(y as double))"),
    )
    projs = _jl_proj_exprs("dv", "spark")
    d2_jl = " + ".join(f"(({p}) * ({p}))" for p in projs)
    return (
        pairs.select(
            "a_id",
            "b_id",
            F.round(
                F.expr("aggregate(dv, cast(0.0 as double), (acc, v) -> acc + v * v)"), 6
            ).alias("d2"),
            F.round(F.expr(f"({d2_jl}) / {_JL_D}"), 6).alias("d2_jl"),
            F.round(
                F.expr(
                    f"(({d2_jl}) / {_JL_D}) / aggregate(dv, cast(0.0 as double), (acc, v) -> acc + v * v)"
                ),
                4,
            ).alias("ratio"),
        )
        .orderBy("a_id")
    )


def _sql_jl_projection() -> str:
    projs = _jl_proj_exprs("dv", "duckdb")
    d2_jl = " + ".join(f"(({p}) * ({p}))" for p in projs)
    return f"""
WITH pairs AS (
  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         list_transform(list_zip(a.embedding, b.embedding),
                        x -> x[1]::DOUBLE - x[2]::DOUBLE) AS dv
  FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
)
SELECT a_id, b_id,
       round(list_sum(list_transform(dv, v -> v * v)), 6) AS d2,
       round(({d2_jl}) / {_JL_D}, 6) AS d2_jl,
       round((({d2_jl}) / {_JL_D}) / list_sum(list_transform(dv, v -> v * v)), 4) AS ratio
FROM pairs ORDER BY a_id
"""


SQL_JL_PROJECTION = _sql_jl_projection()


# -- language-ID confusion matrix --------------------------------------------------------------


def q_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix for the lang_id heuristic against the corpus
    ground-truth lang column — the eval harness every classifier in the
    admission pipeline reports through (soft404_detect, code_detect,
    quality_classifier all gate multi-TB corpus cuts; their error rates
    must be measured on labeled slices, not assumed). One row per
    (truth, prediction) cell with the row-normalized rate in ppm; the
    'en' row's pred='en' cell is the detector's recall, the other rows'
    pred='en' cells are its per-language false-positive rates.

    Scale shape: the lang_id map stage followed by one (lang, pred)
    groupBy with map-side partials, plus a per-lang window total on the
    collapsed 10-row frame — nothing wide after the first agg."""
    preds = q_lang_id(spark, sf_dir).select("lang", "pred_lang")
    cells = preds.groupBy("lang", "pred_lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    w = Window.partitionBy("lang")
    return (
        cells.withColumn("lang_total", F.sum("n").over(w).cast("bigint"))
        .select(
            "lang",
            "pred_lang",
            "n",
            "lang_total",
            F.expr("n * 1000000 div lang_total").cast("bigint").alias("rate_ppm"),
        )
        .orderBy("lang", "pred_lang")
    )


SQL_LANGID_CONFUSION = f"""
WITH preds AS (
  SELECT lang,
         CASE WHEN len(list_filter(toks, t -> list_contains({_SQL_STOPLIST}, t))) / len(toks)::DOUBLE > 0.05
              THEN 'en' ELSE 'other' END AS pred_lang
  FROM (SELECT lang, {_SQL_TOKS} AS toks FROM documents) t
),
cells AS (SELECT lang, pred_lang, count(*)::BIGINT AS n FROM preds GROUP BY lang, pred_lang)
SELECT lang, pred_lang, n,
       sum(n) OVER (PARTITION BY lang)::BIGINT AS lang_total,
       (n * 1000000 // sum(n) OVER (PARTITION BY lang))::BIGINT AS rate_ppm
FROM cells ORDER BY lang, pred_lang
"""


# -- bipartite check (2-coloring odd-cycle witnesses) ------------------------------------------


def q_bipartite_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bipartiteness audit of the link graph by BFS 2-coloring: color =
    BFS level parity; any edge whose two reached endpoints share a color
    witnesses an odd cycle. Crawl use: a near-bipartite host graph
    (hubs <-> leaves) admits the hub/authority split that HITS/SALSA and
    list-page vs article-page scheduling assume; odd-cycle density per
    node measures how far the real graph deviates. Reuses the exact
    BFS fixpoint of q_bfs_levels (same edges, same levels).

    Output per doc: color (level%2, -1 unreached) and the count of
    incident same-color witness edges.

    Scale shape: the BFS rounds (bounded, checkpointed) plus two hash
    joins of the edge list against the color table and one endpoint
    groupBy — all on the edge partitioning, nothing driver-side."""
    edges, lev = _bfs_state(spark, sf_dir)
    colors = lev.select(
        "doc_id",
        F.when(F.col("level").isNull(), F.lit(-1))
        .otherwise(F.col("level") % 2)
        .cast("int")
        .alias("color"),
    ).localCheckpoint(eager=True)
    ca = colors.select(F.col("doc_id").alias("src"), F.col("color").alias("col_a"))
    cb = colors.select(F.col("doc_id").alias("dst"), F.col("color").alias("col_b"))
    conf = (
        edges.join(ca, "src")
        .join(cb, "dst")
        .filter((F.col("col_a") >= 0) & (F.col("col_a") == F.col("col_b")))
        .select("src", "dst")
    )
    inc = (
        conf.select(F.col("src").alias("doc_id"))
        .unionAll(conf.select(F.col("dst").alias("doc_id")))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_conflicts"))
    )
    return (
        colors.join(inc, "doc_id", "left")
        .select(
            "doc_id",
            "color",
            F.coalesce("n_conflicts", F.lit(0)).cast("bigint").alias("n_conflicts"),
        )
        .orderBy("doc_id")
    )


SQL_BIPARTITE_CHECK = _bfs_oracle_sql(
    final=f""",
colors AS (
  SELECT doc_id,
         CASE WHEN level IS NULL THEN -1 ELSE (level % 2)::INTEGER END AS color
  FROM l{_BFS_ROUNDS}
),
conf AS (
  SELECT de.src, de.dst
  FROM de JOIN colors a ON de.src = a.doc_id JOIN colors b ON de.dst = b.doc_id
  WHERE a.color >= 0 AND a.color = b.color
),
inc AS (
  SELECT doc_id, count(*)::BIGINT AS n_conflicts FROM (
    SELECT src AS doc_id FROM conf UNION ALL SELECT dst AS doc_id FROM conf
  ) GROUP BY doc_id
)
SELECT c.doc_id, c.color, coalesce(i.n_conflicts, 0)::BIGINT AS n_conflicts
FROM colors c LEFT JOIN inc i ON c.doc_id = i.doc_id
ORDER BY c.doc_id"""
)


# -- Matryoshka / truncated-embedding retrieval eval -------------------------------------------

_MRL_DIMS = 16  # truncated prefix length
_MRL_KS = (5, 10, 20)


def _mrl_ranked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, rnk_f, rnk_t): corpus ranked against the query vector by
    full-dim and truncated-dim cosine. Shared by q_mrl_truncate_eval
    (top-k overlap) and q_kendall_tau (whole-ranking correlation)."""
    e = _read(spark, sf_dir, "embeddings")
    ref = (
        e.filter(F.col("vec_id") == 0)
        .select(
            F.col("embedding").alias("ref"),
            F.expr(f"slice(embedding, 1, {_MRL_DIMS})").alias("ref_t"),
        )
        .withColumn("nr_f", F.sqrt(F.expr(_dot_expr("ref", "ref"))))
        .withColumn("nr_t", F.sqrt(F.expr(_dot_expr("ref_t", "ref_t"))))
    )
    scored = (
        e.filter(F.col("vec_id") != 0)
        .withColumn("emb_t", F.expr(f"slice(embedding, 1, {_MRL_DIMS})"))
        .crossJoin(F.broadcast(ref))
        .select(
            "vec_id",
            (
                F.expr(_dot_expr("embedding", "ref"))
                / (F.sqrt(F.expr(_dot_expr("embedding", "embedding"))) * F.col("nr_f"))
            ).alias("cos_f"),
            (
                F.expr(_dot_expr("emb_t", "ref_t"))
                / (F.sqrt(F.expr(_dot_expr("emb_t", "emb_t"))) * F.col("nr_t"))
            ).alias("cos_t"),
        )
    )
    wf = Window.orderBy(F.desc("cos_f"), F.asc("vec_id"))
    wt = Window.orderBy(F.desc("cos_t"), F.asc("vec_id"))
    return scored.select(
        "vec_id",
        F.row_number().over(wf).alias("rnk_f"),
        F.row_number().over(wt).alias("rnk_t"),
    )


def q_mrl_truncate_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style truncation eval: rank the corpus against the
    query vector (vec_id=0) by full-dim cosine and by cosine over the
    first {_MRL_DIMS} dims only, and report top-k overlap at
    k in {_MRL_KS} — the acceptance gate before shipping truncated
    embeddings into the ANN/dedup stages (a 4x vector shrink is a 4x
    shuffle-volume and memory win at 10^10 vectors, but only if
    recall@k survives; this measures it on the corpus itself).

    Ranks use the engine-shared sequential-fold cosine (bit-identical
    doubles on both engines) with vec_id as the tiebreak; the global
    rank windows are legitimate HERE because the eval runs on a
    candidate set (top-N of a generator at scale), never the raw corpus.

    Scale shape: one broadcast of the 1-row query frame, one map for
    both cosines, two rank windows over the candidate frame, a 3-row
    closed-form finish."""
    ranked = _mrl_ranked(spark, sf_dir)
    ks = ",".join(str(k) for k in _MRL_KS)
    return (
        ranked.select("rnk_f", "rnk_t", F.explode(F.expr(f"array({ks})")).alias("k"))
        .groupBy("k")
        .agg(
            F.sum(
                ((F.col("rnk_f") <= F.col("k")) & (F.col("rnk_t") <= F.col("k"))).cast(
                    "int"
                )
            )
            .cast("bigint")
            .alias("n_overlap")
        )
        .select(
            "k",
            "n_overlap",
            F.expr("n_overlap * 1000000 div k").cast("bigint").alias("recall_ppm"),
        )
        .orderBy("k")
    )


SQL_MRL_TRUNCATE_EVAL = f"""
WITH ref AS (
  SELECT embedding AS ref, embedding[1:{_MRL_DIMS}] AS ref_t FROM embeddings WHERE vec_id = 0
),
scored AS (
  SELECT e.vec_id,
         {_sql_dot('e.embedding', 'r.ref')} /
           (sqrt({_sql_dot('e.embedding', 'e.embedding')}) * sqrt({_sql_dot('r.ref', 'r.ref')})) AS cos_f,
         {_sql_dot('e.embedding[1:' + str(_MRL_DIMS) + ']', 'r.ref_t')} /
           (sqrt({_sql_dot('e.embedding[1:' + str(_MRL_DIMS) + ']', 'e.embedding[1:' + str(_MRL_DIMS) + ']')}) * sqrt({_sql_dot('r.ref_t', 'r.ref_t')})) AS cos_t
  FROM embeddings e CROSS JOIN ref r
  WHERE e.vec_id <> 0
),
ranked AS (
  SELECT vec_id,
         row_number() OVER (ORDER BY cos_f DESC, vec_id) AS rnk_f,
         row_number() OVER (ORDER BY cos_t DESC, vec_id) AS rnk_t
  FROM scored
),
ks AS (SELECT unnest([{', '.join(str(k) for k in _MRL_KS)}]) AS k)
SELECT k,
       sum((rnk_f <= k AND rnk_t <= k)::INTEGER)::BIGINT AS n_overlap,
       (sum((rnk_f <= k AND rnk_t <= k)::INTEGER) * 1000000 // k)::BIGINT AS recall_ppm
FROM ranked CROSS JOIN ks
GROUP BY k ORDER BY k
"""


# -- tokenizer fertility per language ----------------------------------------------------------


def q_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per language: BPE-ish pre-token segments per
    whitespace word and UTF-8 bytes per segment — the standard
    multilingual tokenizer-efficiency report (a language whose fertility
    is 2x pays 2x the sequence length for the same text; byte-heavy
    scripts like zh dominate bytes-per-token). Drives the per-language
    token budgeting that source_mix / mix_temperature allocate against.

    Integer-exact ppm ratios over summed counts (never averages of
    per-doc ratios — Simpson's trap).

    Scale shape: pure map (two regex counts + octet_length per doc) into
    one per-lang groupBy with map-side partials; 5 output rows."""
    docs = _read(spark, sf_dir, "documents")
    per = docs.select(
        "lang",
        F.expr(
            f"cast(size(regexp_extract_all(text, '{_sp(_RE_BPE)}', 0)) as bigint)"
        ).alias("bpe"),
        F.expr(f"cast(size({_TOKS}) as bigint)").alias("ws"),
        F.expr("cast(octet_length(text) as bigint)").alias("nbytes"),
    )
    agg = per.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("bpe").cast("bigint").alias("bpe_tokens"),
        F.sum("ws").cast("bigint").alias("ws_tokens"),
        F.sum("nbytes").cast("bigint").alias("total_bytes"),
    )
    return agg.select(
        "lang",
        "n_docs",
        "bpe_tokens",
        "ws_tokens",
        "total_bytes",
        F.expr("bpe_tokens * 1000000 div ws_tokens")
        .cast("bigint")
        .alias("fertility_ppm"),
        F.expr("total_bytes * 1000000 div bpe_tokens")
        .cast("bigint")
        .alias("bytes_per_tok_ppm"),
    ).orderBy("lang")


SQL_TOKENIZER_FERTILITY = f"""
WITH per AS (
  SELECT lang,
         len(regexp_extract_all(text, '{_RE_BPE}'))::BIGINT AS bpe,
         len({_SQL_TOKS})::BIGINT AS ws,
         octet_length(text::BLOB)::BIGINT AS nbytes
  FROM documents
)
SELECT lang, count(*)::BIGINT AS n_docs,
       sum(bpe)::BIGINT AS bpe_tokens,
       sum(ws)::BIGINT AS ws_tokens,
       sum(nbytes)::BIGINT AS total_bytes,
       (sum(bpe) * 1000000 // sum(ws))::BIGINT AS fertility_ppm,
       (sum(nbytes) * 1000000 // sum(bpe))::BIGINT AS bytes_per_tok_ppm
FROM per GROUP BY lang ORDER BY lang
"""


# -- Simpson diversity of the language mix per source ------------------------------------------


def q_simpson_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson's index of the language mix inside each source — the
    concentration check on corpus composition (a source whose documents
    are 95% one language contributes no multilingual signal no matter
    how many docs it ships; source_mix / mix_temperature budgeting wants
    this next to raw counts). D = sum n_l(n_l-1) / (N(N-1)) is the
    probability two draws without replacement share a language;
    1 - D (Gini-Simpson) is the diversity. Integer-exact in ppm.

    Scale shape: one (source, lang) groupBy with map-side partials, one
    per-source re-agg of the collapsed frame — two narrow shuffles of a
    |sources|x|langs| frame regardless of corpus size."""
    docs = _read(spark, sf_dir, "documents")
    sl = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    per = sl.groupBy("source").agg(
        F.sum("n").cast("bigint").alias("n_docs"),
        F.count(F.lit(1)).cast("bigint").alias("n_langs"),
        F.sum(F.col("n") * (F.col("n") - 1)).cast("bigint").alias("same2"),
    )
    return per.select(
        "source",
        "n_docs",
        "n_langs",
        F.expr("same2 * 1000000 div (n_docs * (n_docs - 1))")
        .cast("bigint")
        .alias("simpson_ppm"),
        F.expr("1000000 - same2 * 1000000 div (n_docs * (n_docs - 1))")
        .cast("bigint")
        .alias("gini_simpson_ppm"),
    ).orderBy("source")


SQL_SIMPSON_DIVERSITY = """
WITH sl AS (SELECT source, lang, count(*)::BIGINT AS n FROM documents GROUP BY source, lang),
per AS (
  SELECT source, sum(n)::BIGINT AS n_docs, count(*)::BIGINT AS n_langs,
         sum(n * (n - 1))::BIGINT AS same2
  FROM sl GROUP BY source
)
SELECT source, n_docs, n_langs,
       (same2 * 1000000 // (n_docs * (n_docs - 1)))::BIGINT AS simpson_ppm,
       (1000000 - same2 * 1000000 // (n_docs * (n_docs - 1)))::BIGINT AS gini_simpson_ppm
FROM per ORDER BY source
"""


# -- Kendall tau between full-dim and truncated-dim rankings -----------------------------------


def q_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-a between the full-dim and truncated-dim cosine
    rankings (the same pair of rankings mrl_truncate_eval checks at
    top-k): the whole-ranking agreement number that decides whether
    truncated embeddings can replace full ones for ORDERING (reranking,
    priority queues), not just set-recall. Row-number ranks are
    tie-free, so tau = (C - D) / (n(n-1)/2) with C + D = n(n-1)/2.
    Integer-exact in micro units.

    Scale shape: the pairwise comparison is O(n^2) BY DESIGN — this is
    an eval over a candidate/top-N frame (n<=a few thousand), never the
    corpus; the n^2 join is a broadcast of the small ranked frame
    against itself. At 10^10 vectors the candidate set feeding this is
    whatever the ANN generator returns."""
    ranked = _mrl_ranked(spark, sf_dir).localCheckpoint(eager=True)
    a = ranked.select(
        F.col("vec_id").alias("a_id"),
        F.col("rnk_f").alias("fa"),
        F.col("rnk_t").alias("ta"),
    )
    b = ranked.select(
        F.col("vec_id").alias("b_id"),
        F.col("rnk_f").alias("fb"),
        F.col("rnk_t").alias("tb"),
    )
    pairs = a.crossJoin(F.broadcast(b)).filter(F.col("a_id") < F.col("b_id"))
    agg = pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum(
            (
                ((F.col("fa") < F.col("fb")) & (F.col("ta") < F.col("tb")))
                | ((F.col("fa") > F.col("fb")) & (F.col("ta") > F.col("tb")))
            ).cast("int")
        )
        .cast("bigint")
        .alias("concordant"),
    )
    return agg.select(
        "n_pairs",
        "concordant",
        (F.col("n_pairs") - F.col("concordant")).alias("discordant"),
        F.expr("(2 * concordant - n_pairs) * 1000000 div n_pairs")
        .cast("bigint")
        .alias("tau_micro"),
    )


SQL_KENDALL_TAU = f"""
WITH ref AS (
  SELECT embedding AS ref, embedding[1:{_MRL_DIMS}] AS ref_t FROM embeddings WHERE vec_id = 0
),
scored AS (
  SELECT e.vec_id,
         {_sql_dot('e.embedding', 'r.ref')} /
           (sqrt({_sql_dot('e.embedding', 'e.embedding')}) * sqrt({_sql_dot('r.ref', 'r.ref')})) AS cos_f,
         {_sql_dot('e.embedding[1:' + str(_MRL_DIMS) + ']', 'r.ref_t')} /
           (sqrt({_sql_dot('e.embedding[1:' + str(_MRL_DIMS) + ']', 'e.embedding[1:' + str(_MRL_DIMS) + ']')}) * sqrt({_sql_dot('r.ref_t', 'r.ref_t')})) AS cos_t
  FROM embeddings e CROSS JOIN ref r
  WHERE e.vec_id <> 0
),
ranked AS (
  SELECT vec_id,
         row_number() OVER (ORDER BY cos_f DESC, vec_id) AS rnk_f,
         row_number() OVER (ORDER BY cos_t DESC, vec_id) AS rnk_t
  FROM scored
),
pairs AS (
  SELECT a.rnk_f AS fa, a.rnk_t AS ta, b.rnk_f AS fb, b.rnk_t AS tb
  FROM ranked a JOIN ranked b ON a.vec_id < b.vec_id
),
agg AS (
  SELECT count(*)::BIGINT AS n_pairs,
         sum(((fa < fb AND ta < tb) OR (fa > fb AND ta > tb))::INTEGER)::BIGINT AS concordant
  FROM pairs
)
SELECT n_pairs, concordant, (n_pairs - concordant)::BIGINT AS discordant,
       ((2 * concordant - n_pairs) * 1000000 // n_pairs)::BIGINT AS tau_micro
FROM agg
"""


# -- Burrows' Delta stylometry between sources --------------------------------------------------

_STYLO_M = 16  # function-word panel size (top-m corpus terms)


def q_stylometry_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burrows' Delta between every pair of sources over the corpus's
    {_STYLO_M} most frequent terms (the "function word" panel of
    classical stylometry): delta(a,b) = mean_t |f_a(t) - f_b(t)| / sd(t),
    where f_s(t) is term t's relative frequency in source s (ppm) and
    sd(t) its across-source spread. Crawl/corpus use: near-identical
    Delta flags templated or mirrored sources (same generator behind
    different hostnames) that URL-level mirror detection misses.

    Integer-exact pipeline: f in ppm (count*10^6 div source tokens),
    variance numerator k*S2 - S1^2 over integer f's, sd = floor(sqrt(.))
    — IEEE sqrt of an integer-valued double is correctly rounded, so
    both engines floor the same value; |f_a - f_b| keeps every integer
    division non-negative (Spark `div` truncates toward zero, DuckDB
    `//` floors — they only agree on non-negatives, so the abs-first
    form is load-bearing).

    Scale shape: one (source, term) count groupBy (map-side partials),
    a broadcast-joined top-m panel, a |sources|x m pivot frame, and an
    m-row std join — the pairwise stage runs on a 20x{_STYLO_M} frame,
    closed form."""
    docs = _tokens(_docs_parallel(spark, sf_dir))
    tf = (
        docs.select("source", F.explode("toks").alias("term"))
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    totals = tf.groupBy("source").agg(F.sum("cnt").cast("bigint").alias("tot"))
    top = (
        tf.groupBy("term")
        .agg(F.sum("cnt").cast("bigint").alias("ctot"))
        .orderBy(F.desc("ctot"), F.asc("term"))
        .limit(_STYLO_M)
        .select("term")
    )
    f = (
        tf.join(F.broadcast(top), "term")
        .join(F.broadcast(totals), "source")
        .select(
            "source",
            "term",
            F.expr("cnt * 1000000 div tot").cast("bigint").alias("fppm"),
        )
    )
    # every (source, panel term) cell must exist, zero counts included
    grid = totals.select("source").crossJoin(F.broadcast(top))
    f = (
        grid.join(f, ["source", "term"], "left")
        .select("source", "term", F.coalesce("fppm", F.lit(0)).alias("fppm"))
        .localCheckpoint(eager=True)
    )
    sd = f.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("fppm").cast("bigint").alias("s1"),
        F.sum(F.col("fppm") * F.col("fppm")).cast("bigint").alias("s2"),
    ).select(
        "term",
        F.expr(
            "cast(floor(sqrt(cast((k * s2 - s1 * s1) div (k * k) as double))) as bigint)"
        ).alias("sd"),
    )
    fa = f.select(F.col("source").alias("a_src"), "term", F.col("fppm").alias("f_a"))
    fb = f.select(F.col("source").alias("b_src"), "term", F.col("fppm").alias("f_b"))
    pairs = (
        fa.join(fb, "term")
        .filter(F.col("a_src") < F.col("b_src"))
        .join(F.broadcast(sd), "term")
        .select(
            "a_src",
            "b_src",
            F.expr("abs(f_a - f_b) * 1000 div greatest(sd, 1)").alias("zdiff_milli"),
        )
    )
    return (
        pairs.groupBy("a_src", "b_src")
        .agg(
            F.expr(f"cast(sum(zdiff_milli) div {_STYLO_M} as bigint)").alias(
                "delta_milli"
            )
        )
        .orderBy("a_src", "b_src")
    )


SQL_STYLOMETRY_DELTA = f"""
WITH toks AS (SELECT source, {_SQL_TOKS} AS toks FROM documents),
tf AS (
  SELECT source, t.term, count(*)::BIGINT AS cnt
  FROM toks, unnest(toks.toks) AS t(term)
  GROUP BY source, t.term
),
totals AS (SELECT source, sum(cnt)::BIGINT AS tot FROM tf GROUP BY source),
top AS (
  SELECT term FROM (
    SELECT term, sum(cnt) AS ctot FROM tf GROUP BY term
    ORDER BY ctot DESC, term ASC LIMIT {_STYLO_M}
  )
),
grid AS (SELECT source, term FROM totals CROSS JOIN top),
f AS (
  SELECT g.source, g.term,
         coalesce(tf.cnt * 1000000 // t.tot, 0)::BIGINT AS fppm
  FROM grid g
  JOIN totals t ON g.source = t.source
  LEFT JOIN tf ON tf.source = g.source AND tf.term = g.term
),
sd AS (
  SELECT term,
         floor(sqrt(((count(*) * sum(fppm * fppm) - sum(fppm) * sum(fppm))
                     // (count(*) * count(*)))::DOUBLE))::BIGINT AS sd
  FROM f GROUP BY term
),
pairs AS (
  SELECT a.source AS a_src, b.source AS b_src,
         abs(a.fppm - b.fppm) * 1000 // greatest(s.sd, 1) AS zdiff_milli
  FROM f a JOIN f b ON a.term = b.term AND a.source < b.source
  JOIN sd s ON s.term = a.term
)
SELECT a_src, b_src, (sum(zdiff_milli) // {_STYLO_M})::BIGINT AS delta_milli
FROM pairs GROUP BY a_src, b_src ORDER BY a_src, b_src
"""


# -- Hill tail-index estimator ------------------------------------------------------------------

_HILL_K = 16  # upper order statistics (the synthetic per-lang vocab is 31 terms)


def q_hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill estimator of the power-law tail index over per-language term
    frequencies — the principled version of zipf_alpha's log-log fit
    (Hill 1975): alpha = k / sum_{{i<=k}} ln(X_(i) / X_(k+1)) over the
    top-k order statistics. Crawl/corpus use: the tail index of host
    fan-in / term frequency decides whether skew mitigation (salting,
    AQE) is optional or mandatory — alpha < 2 means unbounded variance,
    i.e. one hot key can carry a constant fraction of the corpus.

    Parity discipline: each ln() is quantized to MICRO units per term
    BEFORE summation (cast-floor of a positive double; Java/libm agree
    at micro after the documented ulp-spread lesson), so the sum is an
    integer and ordering-free; the final alpha is one integer division.

    Scale shape: (lang, term) count groupBy with partials, per-lang
    top-(k+1) via window on the collapsed frame, 5-row finish."""
    tf = (
        _tokens(_docs_parallel(spark, sf_dir))
        .select("lang", F.explode("toks").alias("term"))
        .groupBy("lang", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    w = Window.partitionBy("lang").orderBy(F.desc("cnt"), F.asc("term"))
    top = tf.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= _HILL_K + 1
    )
    lnq = top.select(
        "lang",
        "rk",
        F.expr("cast(floor(ln(cast(cnt as double)) * 1000000) as bigint)").alias(
            "ln_ppm"
        ),
        "cnt",
    )
    per = lnq.groupBy("lang").agg(
        F.sum(F.when(F.col("rk") <= _HILL_K, F.col("ln_ppm")).otherwise(0))
        .cast("bigint")
        .alias("s"),
        F.max(F.when(F.col("rk") == _HILL_K + 1, F.col("ln_ppm")).otherwise(None))
        .cast("bigint")
        .alias("lk1"),
        F.max(F.when(F.col("rk") == _HILL_K + 1, F.col("cnt")).otherwise(None))
        .cast("bigint")
        .alias("x_k1"),
        F.count(F.lit(1)).alias("n_stats"),
    )
    return (
        per.filter(F.col("n_stats") >= _HILL_K + 1)
        .select(
            "lang",
            F.lit(_HILL_K).cast("bigint").alias("k"),
            "x_k1",
            F.expr(f"{_HILL_K} * 1000000000000 div (s - {_HILL_K} * lk1)")
            .cast("bigint")
            .alias("alpha_micro"),
        )
        .orderBy("lang")
    )


SQL_HILL_TAIL_INDEX = f"""
WITH toks AS (SELECT lang, {_SQL_TOKS} AS toks FROM documents),
tf AS (
  SELECT lang, t.term, count(*)::BIGINT AS cnt
  FROM toks, unnest(toks.toks) AS t(term)
  GROUP BY lang, t.term
),
top AS (
  SELECT lang, cnt,
         row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, term ASC) AS rk
  FROM tf
),
lnq AS (
  SELECT lang, rk, cnt, floor(ln(cnt::DOUBLE) * 1000000)::BIGINT AS ln_ppm
  FROM top WHERE rk <= {_HILL_K + 1}
),
per AS (
  SELECT lang,
         sum(CASE WHEN rk <= {_HILL_K} THEN ln_ppm ELSE 0 END)::BIGINT AS s,
         max(CASE WHEN rk = {_HILL_K + 1} THEN ln_ppm END)::BIGINT AS lk1,
         max(CASE WHEN rk = {_HILL_K + 1} THEN cnt END)::BIGINT AS x_k1,
         count(*) AS n_stats
  FROM lnq GROUP BY lang
)
SELECT lang, {_HILL_K}::BIGINT AS k, x_k1,
       ({_HILL_K} * 1000000000000 // (s - {_HILL_K} * lk1))::BIGINT AS alpha_micro
FROM per WHERE n_stats >= {_HILL_K + 1} ORDER BY lang
"""


# -- duplicate-cluster size statistics -----------------------------------------------------------


def q_dedup_cluster_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster size histogram over dedup_components' connected
    components — the observability panel every production dedup run
    ships: how many singletons, how many k-doc clusters, how much of the
    corpus deduplication actually removes (docs - clusters). A sudden
    fat tail here (one giant component) is the classic symptom of a
    too-loose similarity threshold chaining the corpus together.

    Scale shape: two groupBys stacked on the components output (rep ->
    size, size -> count), both with map-side partials; the histogram is
    O(max cluster size) rows."""
    comps = q_dedup_components(spark, sf_dir)
    sizes = comps.groupBy("rep").agg(
        F.count(F.lit(1)).cast("bigint").alias("cluster_size")
    )
    return (
        sizes.groupBy("cluster_size")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_clusters"))
        .select(
            "cluster_size",
            "n_clusters",
            (F.col("cluster_size") * F.col("n_clusters"))
            .cast("bigint")
            .alias("n_docs"),
            ((F.col("cluster_size") - 1) * F.col("n_clusters"))
            .cast("bigint")
            .alias("n_removable"),
        )
        .orderBy("cluster_size")
    )


SQL_DEDUP_CLUSTER_STATS = f"""
WITH comps AS ({SQL_DEDUP_COMPONENTS}),
sizes AS (SELECT rep, count(*)::BIGINT AS cluster_size FROM comps GROUP BY rep)
SELECT cluster_size, count(*)::BIGINT AS n_clusters,
       (cluster_size * count(*))::BIGINT AS n_docs,
       ((cluster_size - 1) * count(*))::BIGINT AS n_removable
FROM sizes GROUP BY cluster_size ORDER BY cluster_size
"""


# -- Copeland pairwise-majority rank fusion ------------------------------------------------------

_COPE_TOPN = 10


def q_copeland_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Copeland (pairwise-majority) fusion of three retrieval rankings
    per query — the voting-theoretic alternative to rrf_fusion's score
    blend: doc x beats doc y if at least 2 of the 3 rankers (raw tf,
    length-normalized tf, brevity prior) order x first; Copeland score =
    wins - losses, top-{_COPE_TOPN} per query by score with doc_id
    tie-break. Unlike RRF it is calibration-free AND scale-free: only
    pairwise order matters, so a ranker with wild score outliers gets
    exactly one vote. Integer-only.

    Scale shape: rankings are per-query-term row_number windows on the
    posting frame (same partitioning as rrf_fusion); the pairwise vote
    is a per-term self-join of that frame — O(df^2) per query BY DESIGN,
    run on candidate lists (top-N postings at web scale), never the
    corpus."""
    tf = (
        _tokens(_read(spark, sf_dir, "documents"))
        .select("doc_id", F.size("toks").alias("dl"), F.explode("toks").alias("term"))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    queries_df = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(_RRF_QUERIES)
        .select("term")
    )
    posting = tf.join(F.broadcast(queries_df), "term")
    wa = Window.partitionBy("term").orderBy(F.desc("tf"), F.asc("doc_id"))
    wb = Window.partitionBy("term").orderBy(
        F.desc(F.col("tf") / F.col("dl")), F.asc("doc_id")
    )
    wc = Window.partitionBy("term").orderBy(F.asc("dl"), F.asc("doc_id"))
    ranked = posting.select(
        F.col("term").alias("query_term"),
        "doc_id",
        F.row_number().over(wa).alias("ra"),
        F.row_number().over(wb).alias("rb"),
        F.row_number().over(wc).alias("rc"),
    ).localCheckpoint(eager=True)
    rx = ranked.select(
        "query_term",
        F.col("doc_id").alias("x"),
        F.col("ra").alias("rax"),
        F.col("rb").alias("rbx"),
        F.col("rc").alias("rcx"),
    )
    ry = ranked.select(
        "query_term",
        F.col("doc_id").alias("y"),
        F.col("ra").alias("ray"),
        F.col("rb").alias("rby"),
        F.col("rc").alias("rcy"),
    )
    votes = (
        rx.join(ry, "query_term")
        .filter(F.col("x") != F.col("y"))
        .select(
            "query_term",
            "x",
            (
                (
                    (F.col("rax") < F.col("ray")).cast("int")
                    + (F.col("rbx") < F.col("rby")).cast("int")
                    + (F.col("rcx") < F.col("rcy")).cast("int")
                )
                >= 2
            )
            .cast("int")
            .alias("win"),
        )
    )
    scores = votes.groupBy("query_term", F.col("x").alias("doc_id")).agg(
        F.sum("win").cast("bigint").alias("wins"),
        (F.count(F.lit(1)) - 2 * F.sum("win")).cast("bigint").alias("neg_copeland"),
    )
    wtop = Window.partitionBy("query_term").orderBy(
        F.asc("neg_copeland"), F.asc("doc_id")
    )
    return (
        scores.withColumn("rk", F.row_number().over(wtop))
        .filter(F.col("rk") <= _COPE_TOPN)
        .select(
            "query_term",
            "doc_id",
            "wins",
            (-F.col("neg_copeland")).cast("bigint").alias("copeland"),
            F.col("rk").cast("int").alias("rank"),
        )
        .orderBy("query_term", "rank")
    )


SQL_COPELAND_FUSION = f"""
WITH toks AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
tf AS (
  SELECT toks.doc_id, len(toks.toks)::BIGINT AS dl, t.term, count(*)::BIGINT AS tf
  FROM toks, unnest(toks.toks) AS t(term)
  GROUP BY toks.doc_id, len(toks.toks), t.term
),
q AS (
  SELECT term FROM (
    SELECT term, count(*) AS df FROM tf GROUP BY term
    ORDER BY df DESC, term ASC LIMIT {_RRF_QUERIES}
  )
),
posting AS (SELECT tf.* FROM tf JOIN q USING (term)),
ranked AS (
  SELECT term AS query_term, doc_id,
         row_number() OVER (PARTITION BY term ORDER BY tf DESC, doc_id) AS ra,
         row_number() OVER (PARTITION BY term ORDER BY tf / dl::DOUBLE DESC, doc_id) AS rb,
         row_number() OVER (PARTITION BY term ORDER BY dl ASC, doc_id) AS rc
  FROM posting
),
votes AS (
  SELECT a.query_term, a.doc_id,
         ((a.ra < b.ra)::INTEGER + (a.rb < b.rb)::INTEGER + (a.rc < b.rc)::INTEGER >= 2)::INTEGER AS win
  FROM ranked a JOIN ranked b
    ON a.query_term = b.query_term AND a.doc_id <> b.doc_id
),
scores AS (
  SELECT query_term, doc_id, sum(win)::BIGINT AS wins,
         (count(*) - 2 * sum(win))::BIGINT AS neg_copeland
  FROM votes GROUP BY query_term, doc_id
),
topn AS (
  SELECT query_term, doc_id, wins, (-neg_copeland)::BIGINT AS copeland,
         row_number() OVER (PARTITION BY query_term ORDER BY neg_copeland ASC, doc_id ASC)::INTEGER AS rank
  FROM scores
)
SELECT query_term, doc_id, wins, copeland, rank
FROM topn WHERE rank <= {_COPE_TOPN} ORDER BY query_term, rank
"""


# -- Kneser-Ney bigram LM ------------------------------------------------------------------------

_KN_TOPN = 50  # report the top-N bigrams by count


def q_kneser_ney_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram probabilities (Kneser & Ney '95;
    Chen & Goodman '98) — the smoothing that actually wins LM evals,
    next to stupid_backoff's cheap ratio chain: P(w2|w1) =
    max(c12-D,0)/c1 + D*N1+(w1,.)/c1 * N1+(.,w2)/N1+(..), discount
    D=3/4. The continuation counts (HOW MANY contexts a word follows,
    not how often) are the part worth testing — they are what fixes
    'san francisco'-type overestimation.

    Integer-exact: D=3/4 clears denominators by quarter-scaling —
    p_nano = ((4*c12-3)*n1all + 3*n1f*n1b) * 10^9 div (4*c1*n1all) —
    one integer multiply-then-div, no float surface.

    Scale shape: bigram + context-count tables are groupBys with
    map-side partials (vocab^2-sized, not corpus-sized); three hash
    joins stitch them; top-N via TakeOrderedAndProject."""
    toks = _tokens(_read(spark, sf_dir, "documents")).select("toks")
    bi = toks.select(
        F.explode(
            F.expr(
                "transform(sequence(1, greatest(size(toks) - 1, 0)), "
                "i -> struct(toks[i - 1] as w1, toks[i] as w2))"
            )
        ).alias("b")
    ).select("b.w1", "b.w2")
    c12 = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("bigint").alias("c12"))
    c1 = c12.groupBy("w1").agg(
        F.sum("c12").cast("bigint").alias("c1"),
        F.count(F.lit(1)).cast("bigint").alias("n1f"),
    )
    n1b = c12.groupBy("w2").agg(F.count(F.lit(1)).cast("bigint").alias("n1b"))
    n1all = c12.agg(F.count(F.lit(1)).cast("bigint").alias("n1all"))
    joined = (
        c12.join(c1, "w1")
        .join(n1b, "w2")
        .crossJoin(F.broadcast(n1all))
    )
    return (
        joined.select(
            "w1",
            "w2",
            "c12",
            "c1",
            "n1f",
            "n1b",
            # p = (c12 - 3/4)/c1 + (3/4)(n1f/c1)(n1b/n1all)
            #   = ((4*c12 - 3) * n1all + 3 * n1f * n1b) / (4 * c1 * n1all)
            F.expr(
                "((4 * c12 - 3) * n1all + 3 * n1f * n1b) * 1000000000 "
                "div (4 * c1 * n1all)"
            )
            .cast("bigint")
            .alias("pkn_nano"),
        )
        .orderBy(F.desc("c12"), F.asc("w1"), F.asc("w2"))
        .limit(_KN_TOPN)
    )


SQL_KNESER_NEY_BIGRAM = f"""
WITH toks AS (SELECT {_SQL_TOKS} AS toks FROM documents),
bi AS (
  SELECT toks[i] AS w1, toks[i + 1] AS w2
  FROM toks, unnest(range(1, len(toks))) AS r(i)
),
c12 AS (SELECT w1, w2, count(*)::BIGINT AS c12 FROM bi GROUP BY w1, w2),
c1 AS (SELECT w1, sum(c12)::BIGINT AS c1, count(*)::BIGINT AS n1f FROM c12 GROUP BY w1),
n1b AS (SELECT w2, count(*)::BIGINT AS n1b FROM c12 GROUP BY w2),
n1all AS (SELECT count(*)::BIGINT AS n1all FROM c12)
SELECT c12.w1, c12.w2, c12.c12, c1.c1, c1.n1f, n1b.n1b,
       (((4 * c12.c12 - 3) * n1all.n1all + 3 * c1.n1f * n1b.n1b) * 1000000000
        // (4 * c1.c1 * n1all.n1all))::BIGINT AS pkn_nano
FROM c12 JOIN c1 USING (w1) JOIN n1b USING (w2) CROSS JOIN n1all
ORDER BY c12.c12 DESC, c12.w1 ASC, c12.w2 ASC LIMIT {_KN_TOPN}
"""


# -- Heaps-law vocabulary growth curve ------------------------------------------------------------

_HEAPS_BUCKET = 25  # docs per curve point


def q_vocab_growth_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law type-growth curve over BIGRAM types in doc_id order:
    per {_HEAPS_BUCKET}-doc bucket, how many never-before-seen bigram
    types appear, cumulative vocabulary and cumulative tokens. The
    curve's slope is the data-selection signal dedup can't give you —
    when new-type yield per million tokens flattens, more of the same
    source stops buying model vocabulary/knowledge (the 'data curation
    diminishing returns' curve every corpus report shows).

    Integer-exact throughout. First-occurrence attribution is
    min(doc_id) per type — exactly one bucket gets credit per type.

    Scale shape: one (type -> min doc) groupBy, one per-doc token count
    map, two bucket groupBys + a window cumulative over the tiny bucket
    frame. Nothing wide after the first agg."""
    toks = _tokens(_read(spark, sf_dir, "documents")).select("doc_id", "toks")
    bi = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, greatest(size(toks) - 1, 0)), "
                "i -> concat(toks[i - 1], ' ', toks[i]))"
            )
        ).alias("typ"),
    )
    first = bi.groupBy("typ").agg(F.min("doc_id").alias("first_doc"))
    new_per_bucket = first.groupBy(
        F.expr(f"first_doc div {_HEAPS_BUCKET}").cast("bigint").alias("bucket")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("new_types"))
    toks_per_bucket = toks.groupBy(
        F.expr(f"doc_id div {_HEAPS_BUCKET}").cast("bigint").alias("bucket")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.size("toks")).cast("bigint").alias("n_tokens"),
    )
    cur = toks_per_bucket.join(new_per_bucket, "bucket", "left").select(
        "bucket",
        "n_docs",
        "n_tokens",
        F.coalesce("new_types", F.lit(0)).cast("bigint").alias("new_types"),
    )
    w = Window.orderBy("bucket")
    return cur.select(
        "bucket",
        "n_docs",
        "new_types",
        F.sum("n_tokens").over(w).cast("bigint").alias("tokens_cum"),
        F.sum("new_types").over(w).cast("bigint").alias("vocab_cum"),
    ).orderBy("bucket")


SQL_VOCAB_GROWTH_CURVE = f"""
WITH toks AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
bi AS (
  SELECT doc_id, toks[i] || ' ' || toks[i + 1] AS typ
  FROM toks, unnest(range(1, len(toks))) AS r(i)
),
first AS (SELECT typ, min(doc_id) AS first_doc FROM bi GROUP BY typ),
npb AS (
  SELECT first_doc // {_HEAPS_BUCKET} AS bucket, count(*)::BIGINT AS new_types
  FROM first GROUP BY first_doc // {_HEAPS_BUCKET}
),
tpb AS (
  SELECT doc_id // {_HEAPS_BUCKET} AS bucket, count(*)::BIGINT AS n_docs,
         sum(len(toks))::BIGINT AS n_tokens
  FROM toks GROUP BY doc_id // {_HEAPS_BUCKET}
),
cur AS (
  SELECT t.bucket, t.n_docs, t.n_tokens, coalesce(n.new_types, 0)::BIGINT AS new_types
  FROM tpb t LEFT JOIN npb n ON t.bucket = n.bucket
)
SELECT bucket, n_docs, new_types,
       sum(n_tokens) OVER (ORDER BY bucket)::BIGINT AS tokens_cum,
       sum(new_types) OVER (ORDER BY bucket)::BIGINT AS vocab_cum
FROM cur ORDER BY bucket
"""


# -- coordinate-wise trimmed-mean centroid ---------------------------------------------------------


def q_trimmed_mean_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label coordinate-wise trimmed-mean centroid (drop the lowest
    and highest n/8 values per dimension, average the middle 3/4) — the
    robust-aggregation answer to poisoned or corrupted embeddings that
    label_centroids' plain mean has no defense against: a byzantine
    1/8 of vectors can drag a mean arbitrarily far but cannot move the
    trimmed mean outside the honest values' range (classic robust
    statistics, cf. trimmed-mean gradient aggregation in federated
    learning).

    Determinism: per-dim order is (value, vec_id) so ties trim
    identically on both engines; the surviving-set mean is rounded.

    Scale shape: posexplode to (label, dim, value) rows — 64x the
    vector count but fixed width — one rank window per (label, dim)
    partition (well-distributed key), one trimmed avg groupBy. At
    10^10 vectors swap the exact rank for approx quantile cuts; the
    contract (bounded influence) is the same."""
    e = _read(spark, sf_dir, "embeddings")
    dims = e.select(
        "label",
        "vec_id",
        F.posexplode(F.col("embedding")).alias("dim", "val"),
    ).select("label", "vec_id", "dim", F.col("val").cast("double").alias("val"))
    w = Window.partitionBy("label", "dim").orderBy(F.asc("val"), F.asc("vec_id"))
    ranked = dims.select(
        "label",
        "dim",
        "val",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy("label", "dim")).alias("n"),
    )
    kept = ranked.filter(
        (F.col("rk") > F.expr("n div 8")) & (F.col("rk") <= F.col("n") - F.expr("n div 8"))
    )
    return (
        kept.groupBy("label", "dim")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_used"),
            F.round(F.avg("val"), 6).alias("tmean"),
        )
        .orderBy("label", "dim")
    )


SQL_TRIMMED_MEAN_EMBED = """
WITH dims AS (
  SELECT label, vec_id, (i - 1)::INTEGER AS dim, embedding[i]::DOUBLE AS val
  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS r(i)
),
ranked AS (
  SELECT label, dim, val,
         row_number() OVER (PARTITION BY label, dim ORDER BY val ASC, vec_id ASC) AS rk,
         count(*) OVER (PARTITION BY label, dim) AS n
  FROM dims
),
kept AS (SELECT * FROM ranked WHERE rk > n // 8 AND rk <= n - n // 8)
SELECT label, dim, count(*)::BIGINT AS n_used, round(avg(val), 6) AS tmean
FROM kept GROUP BY label, dim ORDER BY label, dim
"""


# -- Haar wavelet energy decomposition -------------------------------------------------------------

_HAAR_LEVELS = 8  # 256-hour window
_HAAR_BASE = "2024-01-01 00:00:00"


def q_haar_wavelet_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unnormalized Haar wavelet decomposition of the hourly event-count
    series (first 256 hours): per level, the detail-coefficient energy —
    the classic multi-resolution storage/monitoring trick (keep the few
    high-energy coefficients, drop the noise floor; a traffic anomaly at
    hour resolution and a weekly cycle land in DIFFERENT levels, so the
    energy profile localizes WHERE the signal lives before any model
    runs). Unnormalized (integer) transform: d_{{l,i}} = (sum of counts
    in the block's first half) - (second half), so every coefficient and
    energy is exact integer arithmetic.

    Scale shape: closed form, no level-by-level pass — each hour row
    explodes to {_HAAR_LEVELS} (level, block, sign) contributions and
    ONE groupBy computes every coefficient at every level; a second
    tiny agg rolls energies up. Map + 2 narrow shuffles regardless of
    series length."""
    ev = _read(spark, sf_dir, "events").select(
        F.expr(
            f"cast((unix_millis(cast(ts as timestamp)) - unix_millis(cast('{_HAAR_BASE}' as timestamp))) div 3600000 as bigint)"
        ).alias("hour")
    )
    hourly = (
        ev.filter((F.col("hour") >= 0) & (F.col("hour") < (1 << _HAAR_LEVELS)))
        .groupBy("hour")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    lv = hourly.select(
        "hour",
        "cnt",
        F.explode(F.expr(f"sequence(1, {_HAAR_LEVELS})")).alias("level"),
    ).select(
        "level",
        F.expr("hour div (1 << level)").alias("block"),
        # first half of the block adds, second half subtracts
        F.expr("cnt * (1 - 2 * ((hour div (1 << (level - 1))) % 2))").alias("signed"),
    )
    coefs = lv.groupBy("level", "block").agg(
        F.sum("signed").cast("bigint").alias("d")
    )
    return (
        coefs.groupBy("level")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_coeffs"),
            F.sum(F.col("d") * F.col("d")).cast("bigint").alias("energy"),
            F.max(F.abs(F.col("d"))).cast("bigint").alias("max_abs_coef"),
        )
        .orderBy("level")
    )


SQL_HAAR_WAVELET_ENERGY = f"""
WITH ev AS (
  SELECT (epoch_ms(ts) - epoch_ms(TIMESTAMP '{_HAAR_BASE}')) // 3600000 AS hour
  FROM events
),
hourly AS (
  SELECT hour, count(*)::BIGINT AS cnt FROM ev
  WHERE hour >= 0 AND hour < {1 << _HAAR_LEVELS} GROUP BY hour
),
lv AS (
  SELECT l.level, hour // (1 << l.level) AS block,
         cnt * (1 - 2 * ((hour // (1 << (l.level - 1))) % 2)) AS signed
  FROM hourly CROSS JOIN (SELECT unnest(range(1, {_HAAR_LEVELS + 1})) AS level) l
),
coefs AS (SELECT level, block, sum(signed)::BIGINT AS d FROM lv GROUP BY level, block)
SELECT level, count(*)::BIGINT AS n_coeffs, sum(d * d)::BIGINT AS energy,
       max(abs(d))::BIGINT AS max_abs_coef
FROM coefs GROUP BY level ORDER BY level
"""


# -- merged busy intervals (gaps-and-islands) -------------------------------------------------------

_BUSY_HOLD_S = 300  # each event occupies [ts, ts+300s)


def q_busy_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user merged busy time: every event holds a {_BUSY_HOLD_S}s
    window; overlapping windows merge (the gaps-and-islands pattern).
    Crawl use: identical math computes per-host connection-occupancy
    from fetch timestamps — the input to politeness capacity planning
    (how many DISTINCT busy spans and how much wall time a host's
    budget actually occupies, vs the naive count*hold overestimate).

    Integer-exact on epoch seconds. Island detection: an event starts a
    new island iff its ts exceeds the running max end-time of all
    earlier events (running max via window, never a self-join).

    Scale shape: one per-user window pass (lag/max over the user
    partition — the natural crawl partitioning) + one groupBy; no
    joins."""
    ev = _read(spark, sf_dir, "events").select(
        "user_id",
        F.expr("unix_millis(cast(ts as timestamp)) div 1000").alias("t"),
    )
    w = Window.partitionBy("user_id").orderBy("t")
    wprev = (
        Window.partitionBy("user_id")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = ev.select(
        "user_id",
        "t",
        (
            F.col("t")
            >= F.coalesce(
                F.max(F.col("t") + _BUSY_HOLD_S).over(wprev), F.lit(-(1 << 60))
            )
        )
        .cast("int")
        .alias("new_island"),
    )
    islands = marked.select(
        "user_id",
        "t",
        F.sum("new_island").over(w).alias("island"),
    )
    per_island = islands.groupBy("user_id", "island").agg(
        F.min("t").alias("start_t"),
        (F.max("t") + _BUSY_HOLD_S).alias("end_t"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )
    return (
        per_island.groupBy("user_id")
        .agg(
            F.sum("n_events").cast("bigint").alias("n_events"),
            F.count(F.lit(1)).cast("bigint").alias("n_islands"),
            F.sum(F.col("end_t") - F.col("start_t")).cast("bigint").alias("busy_sec"),
        )
        .orderBy("user_id")
    )


SQL_BUSY_INTERVALS = f"""
WITH ev AS (SELECT user_id, epoch_ms(ts) // 1000 AS t FROM events),
marked AS (
  SELECT user_id, t,
         (t >= coalesce(max(t + {_BUSY_HOLD_S}) OVER (
             PARTITION BY user_id ORDER BY t
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), {-(1 << 60)}))::INTEGER AS new_island
  FROM ev
),
islands AS (
  SELECT user_id, t,
         sum(new_island) OVER (PARTITION BY user_id ORDER BY t) AS island
  FROM marked
),
per_island AS (
  SELECT user_id, island, min(t) AS start_t, max(t) + {_BUSY_HOLD_S} AS end_t,
         count(*)::BIGINT AS n_events
  FROM islands GROUP BY user_id, island
)
SELECT user_id, sum(n_events)::BIGINT AS n_events, count(*)::BIGINT AS n_islands,
       sum(end_t - start_t)::BIGINT AS busy_sec
FROM per_island GROUP BY user_id ORDER BY user_id
"""


# -- ordered-pair sequence patterns ------------------------------------------------------------------


def q_sequence_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential-pattern support: for every ordered pair of event types
    (a, b), in how many users' histories does SOME a precede SOME b
    (first(a) < last(b) — existence, not adjacency; markov_transitions
    counts adjacent steps, this counts behavioral ordering). The GSP/
    PrefixSpan support-counting core, restricted to length-2 patterns —
    at corpus scale this is the funnel-discovery primitive that decides
    which explicit funnels (funnel_conversion) are worth defining.

    Integer-exact: supports are user counts; support_ppm normalizes by
    the users having BOTH types at all (so a pattern's strength is
    ordering signal, not type popularity).

    Scale shape: one (user, type) min/max groupBy collapses the event
    stream; the pair join runs on the collapsed |users|x|types| frame
    (<=5 rows per user); one count groupBy finishes. The raw stream is
    touched once."""
    ev = _read(spark, sf_dir, "events").select(
        "user_id",
        F.col("event_type").alias("et"),
        F.expr("unix_millis(cast(ts as timestamp))").alias("tms"),
    )
    span = ev.groupBy("user_id", "et").agg(
        F.min("tms").alias("first_t"), F.max("tms").alias("last_t")
    )
    a = span.select(
        "user_id", F.col("et").alias("a"), F.col("first_t").alias("fa")
    )
    b = span.select("user_id", F.col("et").alias("b"), F.col("last_t").alias("lb"))
    pairs = a.join(b, "user_id").filter(F.col("a") != F.col("b"))
    return (
        pairs.groupBy("a", "b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users_both"),
            F.sum((F.col("fa") < F.col("lb")).cast("int"))
            .cast("bigint")
            .alias("support"),
        )
        .select(
            "a",
            "b",
            "n_users_both",
            "support",
            F.expr("support * 1000000 div n_users_both")
            .cast("bigint")
            .alias("support_ppm"),
        )
        .orderBy("a", "b")
    )


SQL_SEQUENCE_PATTERNS = """
WITH ev AS (SELECT user_id, event_type AS et, epoch_ms(ts) AS tms FROM events),
span AS (
  SELECT user_id, et, min(tms) AS first_t, max(tms) AS last_t
  FROM ev GROUP BY user_id, et
),
pairs AS (
  SELECT a.user_id, a.et AS a, b.et AS b, a.first_t AS fa, b.last_t AS lb
  FROM span a JOIN span b ON a.user_id = b.user_id AND a.et <> b.et
)
SELECT a, b, count(*)::BIGINT AS n_users_both,
       sum((fa < lb)::INTEGER)::BIGINT AS support,
       (sum((fa < lb)::INTEGER) * 1000000 // count(*))::BIGINT AS support_ppm
FROM pairs GROUP BY a, b ORDER BY a, b
"""


# -- consistent-hash ring rebalance audit ------------------------------------------------------------

_RING_SHARDS = 8
_RING_VNODES = 16
_RING_BITS = 48


def _ring_case_expr(n_shards: int, hcol: str) -> str:
    """Literal consistent-hash ring lookup: vnode positions are computed
    in PYTHON at plan-build time (shards/vnodes are constants), so both
    engines evaluate an identical CASE chain — no per-row hashing of
    vnode ids, only the key hash. First ring position >= h wins;
    wraparound falls to the globally smallest position."""
    import hashlib

    ring = []
    for s in range(n_shards):
        for v in range(_RING_VNODES):
            pos = int(hashlib.md5(f"s{s}v{v}".encode()).hexdigest()[:12], 16)
            ring.append((pos, s))
    ring.sort()
    whens = " ".join(f"WHEN {hcol} <= {pos} THEN {s}" for pos, s in ring)
    return f"(CASE {whens} ELSE {ring[0][1]} END)"


def q_hashring_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consistent-hash ring (Karger '97, {_RING_VNODES} virtual nodes per
    shard) churn audit — the OTHER sharding discipline next to
    rendezvous_sharding, measured the same way: assign every url-key to
    its ring shard at {_RING_SHARDS} shards and again at
    {_RING_SHARDS + 1}, and report per-shard how many keys the expansion
    steals. Theory: ~1/{_RING_SHARDS + 1} of keys move, all of them INTO
    the new shard; a mod-N reshard would move ~{_RING_SHARDS}/{_RING_SHARDS + 1}.
    Running both schemes on the same keys is the capacity-planning
    comparison a frontier router actually makes.

    Scale shape: the ring is a plan-time literal CASE chain (vnode
    positions hashed in Python once), so assignment is one map over the
    keys + one groupBy(shard); zero joins, zero per-row vnode hashing."""
    keys = _read(spark, sf_dir, "documents").select(
        F.expr(
            "cast(conv(substring(md5(concat('url', cast(doc_id as string))), 1, 12), 16, 10) as bigint)"
        ).alias("h")
    )
    before = _ring_case_expr(_RING_SHARDS, "h")
    after = _ring_case_expr(_RING_SHARDS + 1, "h")
    assigned = keys.select(
        F.expr(before).cast("int").alias("shard_before"),
        F.expr(after).cast("int").alias("shard_after"),
    )
    return (
        assigned.groupBy("shard_before")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_keys"),
            F.sum((F.col("shard_before") != F.col("shard_after")).cast("int"))
            .cast("bigint")
            .alias("n_moved_out"),
        )
        .select(
            "shard_before",
            "n_keys",
            "n_moved_out",
            F.expr("n_moved_out * 1000000 div n_keys")
            .cast("bigint")
            .alias("moved_ppm"),
        )
        .orderBy("shard_before")
    )


def _sql_hashring() -> str:
    before = _ring_case_expr(_RING_SHARDS, "h")
    after = _ring_case_expr(_RING_SHARDS + 1, "h")
    return f"""
WITH keys AS (
  SELECT ('0x' || substr(md5('url' || doc_id::VARCHAR), 1, 12))::BIGINT AS h
  FROM documents
),
assigned AS (
  SELECT {before}::INTEGER AS shard_before, {after}::INTEGER AS shard_after FROM keys
)
SELECT shard_before, count(*)::BIGINT AS n_keys,
       sum((shard_before <> shard_after)::INTEGER)::BIGINT AS n_moved_out,
       (sum((shard_before <> shard_after)::INTEGER) * 1000000 // count(*))::BIGINT AS moved_ppm
FROM assigned GROUP BY shard_before ORDER BY shard_before
"""


SQL_HASHRING_REBALANCE = _sql_hashring()


# -- KMV sketch set algebra ----------------------------------------------------------------------

_KMVA_K = 64


def q_kmv_set_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta/KMV sketch SET ALGEBRA per language (the DataSketches
    union/intersection estimators): sketch the token set of even docs
    (A) and odd docs (B) with the {_KMVA_K} smallest 48-bit hashes;
    union estimate = (k-1)/h_(k) over A∪B's sketch; intersection
    estimate = rho * union where rho = fraction of the union sketch's
    entries present in BOTH sets. Exact |A∪B| and |A∩B| ride alongside
    as the estimator audit. This is what lets a planner size a
    dedup-join between two corpus partitions WITHOUT scanning either —
    sketches merge in O(k) no matter the input size.

    Scale shape: one distinct (lang, token, inA, inB) pass, one per-lang
    k-smallest window on the collapsed token frame, closed-form finish.
    The sketch is a mergeable partial aggregate at real scale."""
    toks = (
        _tokens(_docs_parallel(spark, sf_dir))
        .select(
            "lang",
            F.explode("toks").alias("tok"),
            (F.col("doc_id") % 2 == 0).cast("int").alias("is_a"),
        )
        .groupBy("lang", "tok")
        .agg(
            F.max("is_a").alias("in_a"),
            F.max(1 - F.col("is_a")).alias("in_b"),
        )
        .withColumn(
            "h", F.expr("cast(conv(substring(md5(tok), 1, 12), 16, 10) as bigint)")
        )
    )
    w = Window.partitionBy("lang").orderBy("h", "tok")
    sk = (
        toks.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _KMVA_K)
        .groupBy("lang")
        .agg(
            F.max("h").alias("hk"),
            F.count(F.lit(1)).alias("kk"),
            F.sum((F.col("in_a") + F.col("in_b") == 2).cast("int")).alias("n_both"),
        )
    )
    exact = toks.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("union_exact"),
        F.sum((F.col("in_a") + F.col("in_b") == 2).cast("int"))
        .cast("bigint")
        .alias("inter_exact"),
    )
    u_est = F.when(F.col("kk") < _KMVA_K, F.col("kk").cast("double")).otherwise(
        F.lit(float(_KMVA_K - 1)) * F.lit(float(1 << _RING_BITS)) / F.col("hk")
    )
    return (
        exact.join(sk, "lang")
        .select(
            "lang",
            "union_exact",
            "inter_exact",
            F.round(u_est, 4).alias("union_est"),
            F.round(u_est * F.col("n_both") / F.col("kk"), 4).alias("inter_est"),
        )
        .orderBy("lang")
    )


SQL_KMV_SET_ALGEBRA = f"""
WITH toks0 AS (SELECT doc_id, lang, {_SQL_TOKS} AS toks FROM documents),
toks AS (
  SELECT lang, t.tok, max((doc_id % 2 = 0)::INTEGER) AS in_a,
         max((doc_id % 2 = 1)::INTEGER) AS in_b
  FROM toks0, unnest(toks0.toks) AS t(tok)
  GROUP BY lang, t.tok
),
h AS (
  SELECT lang, tok, in_a, in_b,
         ('0x' || substr(md5(tok), 1, 12))::BIGINT AS h
  FROM toks
),
sk AS (
  SELECT lang, max(h) AS hk, count(*) AS kk,
         sum((in_a + in_b = 2)::INTEGER) AS n_both
  FROM (
    SELECT lang, h, in_a, in_b,
           row_number() OVER (PARTITION BY lang ORDER BY h, tok) AS rn
    FROM h
  ) WHERE rn <= {_KMVA_K}
  GROUP BY lang
),
exact AS (
  SELECT lang, count(*)::BIGINT AS union_exact,
         sum((in_a + in_b = 2)::INTEGER)::BIGINT AS inter_exact
  FROM h GROUP BY lang
)
SELECT e.lang, e.union_exact, e.inter_exact,
       round(CASE WHEN s.kk < {_KMVA_K} THEN s.kk::DOUBLE
                  ELSE {float(_KMVA_K - 1)} * {float(1 << _RING_BITS)} / s.hk END, 4) AS union_est,
       round((CASE WHEN s.kk < {_KMVA_K} THEN s.kk::DOUBLE
                   ELSE {float(_KMVA_K - 1)} * {float(1 << _RING_BITS)} / s.hk END)
             * s.n_both / s.kk, 4) AS inter_est
FROM exact e JOIN sk s ON e.lang = s.lang ORDER BY e.lang
"""


# -- TF-IDF cosine verification of near-dup candidates ------------------------------------------------


def q_lexical_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF cosine VERIFY stage over the ngram-Jaccard candidate pairs
    (the Bayardo/WWW'07 all-pairs-similarity shape: a cheap candidate
    generator, then an exact weighted-cosine verification on candidates
    only — never the corpus cross product). Weights are integer:
    w = tf * idf_ppm with idf_ppm = floor(ln(N/df) * 10^6) quantized
    per-term BEFORE any multiplication, so the cosine numerator and
    both norm sums are EXACT integer arithmetic; the only float op is
    the final num/sqrt division, identical on both engines.

    Scale shape: candidates (bounded by the generator) hash-join the
    posting frame twice on (doc, term); one groupBy(a,b) sums the
    integer products; norms broadcast back per side."""
    docs = _tokens(_docs_parallel(spark, sf_dir))
    n_docs = _read(spark, sf_dir, "documents").count()
    tf = docs.select("doc_id", F.explode("toks").alias("term")).groupBy(
        "doc_id", "term"
    ).agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    df = tf.groupBy("term").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    w = (
        tf.join(F.broadcast(df), "term")
        .select(
            "doc_id",
            "term",
            (
                F.col("tf")
                * F.expr(f"cast(floor(ln({n_docs} / cast(df as double)) * 1000000) as bigint)")
            ).alias("w"),
        )
    )
    norms = w.groupBy("doc_id").agg(F.sum(F.col("w") * F.col("w")).alias("n2"))
    pairs = ngram_jaccard(_docs_parallel(spark, sf_dir)).select("a_id", "b_id")
    wa = w.select(F.col("doc_id").alias("a_id"), "term", F.col("w").alias("wa"))
    wb = w.select(F.col("doc_id").alias("b_id"), "term", F.col("w").alias("wb"))
    num = (
        pairs.join(wa, "a_id")
        .join(wb, ["b_id", "term"])
        .groupBy("a_id", "b_id")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("num"))
    )
    na = norms.select(F.col("doc_id").alias("a_id"), F.col("n2").alias("n2a"))
    nb = norms.select(F.col("doc_id").alias("b_id"), F.col("n2").alias("n2b"))
    return (
        num.join(na, "a_id")
        .join(nb, "b_id")
        .select(
            "a_id",
            "b_id",
            "num",
            F.round(
                F.col("num")
                / (F.sqrt(F.col("n2a").cast("double")) * F.sqrt(F.col("n2b").cast("double"))),
                4,
            ).alias("cos_sim"),
        )
        .orderBy("a_id", "b_id")
    )


SQL_LEXICAL_COSINE_PAIRS = """
WITH cand AS ({NGRAM}),
toks AS (SELECT doc_id, {TOKS} AS toks FROM documents),
nd AS (SELECT count(*)::BIGINT AS n FROM documents),
tf AS (
  SELECT toks.doc_id, t.term, count(*)::BIGINT AS tf
  FROM toks, unnest(toks.toks) AS t(term)
  GROUP BY toks.doc_id, t.term
),
df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
w AS (
  SELECT tf.doc_id, tf.term,
         tf.tf * floor(ln(nd.n / df.df::DOUBLE) * 1000000)::BIGINT AS w
  FROM tf JOIN df USING (term) CROSS JOIN nd
),
norms AS (SELECT doc_id, sum(w * w) AS n2 FROM w GROUP BY doc_id),
num AS (
  SELECT c.a_id, c.b_id, sum(wa.w * wb.w) AS num
  FROM cand c
  JOIN w wa ON wa.doc_id = c.a_id
  JOIN w wb ON wb.doc_id = c.b_id AND wb.term = wa.term
  GROUP BY c.a_id, c.b_id
)
SELECT n.a_id, n.b_id, n.num,
       round(n.num / (sqrt(na.n2::DOUBLE) * sqrt(nb.n2::DOUBLE)), 4) AS cos_sim
FROM num n JOIN norms na ON na.doc_id = n.a_id JOIN norms nb ON nb.doc_id = n.b_id
ORDER BY n.a_id, n.b_id
""".replace("{NGRAM}", SQL_NGRAM_JACCARD_PAIRS).replace("{TOKS}", _SQL_TOKS)


# -- mutual information (event type x time-of-day) ---------------------------------------------------

_MI_HOD_BUCKETS = 8  # 3-hour buckets


def q_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between event type and time-of-day (3-hour
    buckets), reported as per-type contributions in count·micro-nat
    units: MI = (1/N) * sum_cells c_xy * ln(c_xy*N / (c_x*c_y)). The
    dependence detector behind feature selection and leakage audits —
    if MI(type; hour) is materially > 0, time-of-day leaks the event
    type (and vice versa), which matters both for drift monitors and
    for what a sampler may stratify on.

    Parity discipline: the log-ratio is quantized to MICRO units per
    CELL (floor of a double computed from exact integers), then
    multiplied by the integer cell count and summed — all integer after
    the single transcendental, ordering-free. Negative cell
    contributions are kept as-is (no integer division anywhere, so the
    div-vs-floor negative pitfall never appears).

    Scale shape: one (x, y) cell groupBy with partials, two tiny
    marginal re-aggs joined back by broadcast, 5-row output."""
    ev = _read(spark, sf_dir, "events").select(
        F.col("event_type").alias("et"),
        F.expr(
            f"cast((unix_millis(cast(ts as timestamp)) div 3600000) % 24 div (24 div {_MI_HOD_BUCKETS}) as int)"
        ).alias("hod"),
    )
    cells = ev.groupBy("et", "hod").agg(F.count(F.lit(1)).cast("bigint").alias("cxy"))
    mx = cells.groupBy("et").agg(F.sum("cxy").cast("bigint").alias("cx"))
    my = cells.groupBy("hod").agg(F.sum("cxy").cast("bigint").alias("cy"))
    tot = cells.agg(F.sum("cxy").cast("bigint").alias("n"))
    j = (
        cells.join(F.broadcast(mx), "et")
        .join(F.broadcast(my), "hod")
        .crossJoin(F.broadcast(tot))
    )
    contrib = j.select(
        "et",
        "cxy",
        F.expr(
            "cxy * cast(floor(ln((cxy * n) / cast(cx * cy as double)) * 1000000) as bigint)"
        ).alias("c_micro"),
    )
    return (
        contrib.groupBy("et")
        .agg(
            F.sum("cxy").cast("bigint").alias("n_events"),
            F.sum("c_micro").cast("bigint").alias("mi_contrib_micro"),
        )
        .orderBy("et")
    )


SQL_MUTUAL_INFORMATION = f"""
WITH ev AS (
  SELECT event_type AS et,
         (((epoch_ms(ts) // 3600000) % 24) // (24 // {_MI_HOD_BUCKETS}))::INTEGER AS hod
  FROM events
),
cells AS (SELECT et, hod, count(*)::BIGINT AS cxy FROM ev GROUP BY et, hod),
mx AS (SELECT et, sum(cxy)::BIGINT AS cx FROM cells GROUP BY et),
my AS (SELECT hod, sum(cxy)::BIGINT AS cy FROM cells GROUP BY hod),
tot AS (SELECT sum(cxy)::BIGINT AS n FROM cells),
contrib AS (
  SELECT c.et, c.cxy,
         c.cxy * floor(ln((c.cxy * t.n) / (m.cx * y.cy)::DOUBLE) * 1000000)::BIGINT AS c_micro
  FROM cells c JOIN mx m USING (et) JOIN my y USING (hod) CROSS JOIN tot t
)
SELECT et, sum(cxy)::BIGINT AS n_events, sum(c_micro)::BIGINT AS mi_contrib_micro
FROM contrib GROUP BY et ORDER BY et
"""


# -- PageRank convergence curve ------------------------------------------------------------------------

_PRC_ITERS = 4


def q_pagerank_convergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-iteration convergence residuals of the host-graph PageRank
    (same graph, damping and dangling treatment as q_pagerank): after
    every iteration, the L1 and Linf distances from the previous rank
    vector. The monitoring curve every iterative fixpoint job exports —
    at 10^8 hosts you stop on ||delta||_1 < eps rather than a fixed
    iteration count, and a NON-geometric decay in this curve is the
    canary for a mis-partitioned edge list or a dangling-mass bug.

    Scale shape: identical per-iteration plan to q_pagerank (one edges
    join + groupBy(dst), 1-row dangling broadcast) plus a 1-row delta
    aggregate per iteration; lineage cut by localCheckpoint each round."""
    edges = _pagerank_edges(spark, sf_dir)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n = float(nodes.count())
    outdeg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    ed = edges.join(outdeg, "src").localCheckpoint()
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    deltas = []
    for it in range(1, _PRC_ITERS + 1):
        contrib = (
            ed.join(ranks, ed.src == ranks.node)
            .select("dst", (F.col("rank") / F.col("outdeg").cast("double")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )
        dangling = ranks.join(
            ed.select("src").distinct(), ranks.node == F.col("src"), "left_anti"
        ).agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dang"))
        nxt = (
            nodes.join(contrib, nodes.node == contrib.dst, "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit((1.0 - _PR_DAMPING) / n)
                    + _PR_DAMPING
                    * (
                        F.coalesce(F.col("contrib"), F.lit(0.0))
                        + F.col("dang") / F.lit(n)
                    )
                ).alias("rank"),
            )
            .localCheckpoint()
        )
        d = (
            nxt.select("node", F.col("rank").alias("r_new"))
            .join(ranks.select("node", F.col("rank").alias("r_old")), "node")
            .agg(
                F.round(F.sum(F.abs(F.col("r_new") - F.col("r_old"))), 6).alias(
                    "l1_delta"
                ),
                F.round(F.max(F.abs(F.col("r_new") - F.col("r_old"))), 6).alias(
                    "linf_delta"
                ),
            )
            .select(F.lit(it).cast("int").alias("iter"), "l1_delta", "linf_delta")
        )
        deltas.append(d)
        ranks = nxt
    out = deltas[0]
    for d in deltas[1:]:
        out = out.unionAll(d)
    return out.orderBy("iter")


def _sql_pagerank_convergence() -> str:
    iters = "".join(
        "," + _sql_pagerank_iter(f"r{t - 1}", f"r{t}") for t in range(1, _PRC_ITERS + 1)
    )
    sels = "\nUNION ALL\n".join(
        f"""SELECT {t} AS iter,
       round(sum(abs(a.rank - b.rank)), 6) AS l1_delta,
       round(max(abs(a.rank - b.rank)), 6) AS linf_delta
FROM r{t} a JOIN r{t - 1} b USING (node)"""
        for t in range(1, _PRC_ITERS + 1)
    )
    return f"""
WITH edges AS (
  SELECT DISTINCT user_id % {_PR_NODES} AS src,
         ('0x' || substr(md5(event_id::VARCHAR), 1, 4))::BIGINT % {_PR_NODES} AS dst
  FROM events
  WHERE user_id % {_PR_NODES}
        <> ('0x' || substr(md5(event_id::VARCHAR), 1, 4))::BIGINT % {_PR_NODES}
),
nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
ncount AS (SELECT count(*) AS n FROM nodes),
ed AS (
  SELECT e.src, e.dst, d.outdeg
  FROM edges e JOIN (SELECT src, count(*) AS outdeg FROM edges GROUP BY src) d
    ON e.src = d.src
),
r0 AS (SELECT node, 1.0 / nn.n::DOUBLE AS rank FROM nodes CROSS JOIN ncount nn)
{iters}
SELECT * FROM ({sels}) ORDER BY iter
"""


SQL_PAGERANK_CONVERGENCE = _sql_pagerank_convergence()


# -- k-anonymity audit ----------------------------------------------------------------------------------


def q_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity / l-diversity audit over the event log with
    quasi-identifier (event_type, 3-hour-of-day bucket) and user_id as
    the sensitive attribute: per QI group, k = group size and
    l = distinct users. The privacy gate a dataset release runs next to
    pii_scrub — a QI group with tiny k or l=1 re-identifies its user
    even after direct identifiers are scrubbed (Sweeney '02; Machanavajjhala
    et al. '06 for l-diversity). Integer-exact.

    Scale shape: one groupBy over the QI columns computing count +
    count(distinct user) with partial aggregation; output is the QI
    grid (|types| x {_MI_HOD_BUCKETS})."""
    ev = _read(spark, sf_dir, "events").select(
        F.col("event_type").alias("et"),
        F.expr(
            f"cast((unix_millis(cast(ts as timestamp)) div 3600000) % 24 div (24 div {_MI_HOD_BUCKETS}) as int)"
        ).alias("hod"),
        "user_id",
    )
    return (
        ev.groupBy("et", "hod")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("k_count"),
            F.countDistinct("user_id").cast("bigint").alias("l_distinct"),
        )
        .select(
            "et",
            "hod",
            "k_count",
            "l_distinct",
            (F.col("k_count") >= 20).cast("int").alias("meets_k20"),
            (F.col("l_distinct") >= 5).cast("int").alias("meets_l5"),
        )
        .orderBy("et", "hod")
    )


SQL_K_ANONYMITY_AUDIT = f"""
WITH ev AS (
  SELECT event_type AS et,
         (((epoch_ms(ts) // 3600000) % 24) // (24 // {_MI_HOD_BUCKETS}))::INTEGER AS hod,
         user_id
  FROM events
)
SELECT et, hod, count(*)::BIGINT AS k_count,
       count(DISTINCT user_id)::BIGINT AS l_distinct,
       (count(*) >= 20)::INTEGER AS meets_k20,
       (count(DISTINCT user_id) >= 5)::INTEGER AS meets_l5
FROM ev GROUP BY et, hod ORDER BY et, hod
"""


# -- blocking-scheme evaluation --------------------------------------------------------------------------


def q_blocking_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record-linkage blocking-scheme evaluation (Christen '12): score
    three candidate blocking keys over the corpus against the ground
    truth of shingle-Jaccard>=0.5 near-dup pairs. Per scheme:
    pair completeness PC = covered/truth (recall of truth pairs whose
    two docs land in the same block) and reduction ratio
    RR = 1 - cand_pairs/total_pairs — the two numbers that decide
    whether a blocking key is usable BEFORE you pay for the pairwise
    stage. At 10^9 docs this is how you pick the LSH/blocking key: a
    scheme with PC 0.95 and RR 0.9999 wins over PC 1.0 / RR 0.9.
    Schemes: raw 16-char prefix, (lang, length//64) bucket, first two
    tokens. All metrics integer/ppm-exact.

    Scale shape: one stack (3x map-side), one groupBy(scheme, bkey)
    with partials, truth pairs from the existing bucketed shingle join
    (never doc x doc), coverage via broadcast of the tiny truth set;
    output is 3 rows."""
    docs = _docs_parallel(spark, sf_dir)
    truth = ngram_jaccard(docs).select("a_id", "b_id").localCheckpoint()
    keys = _tokens(docs).select(
        "doc_id",
        F.expr("substring(text, 1, 16)").alias("k1"),
        F.concat_ws(
            "|", "lang", F.expr("cast(n_chars div 64 as string)")
        ).alias("k2"),
        F.expr("concat_ws(' ', element_at(toks, 1), element_at(toks, 2))").alias(
            "k3"
        ),
    )
    long = keys.selectExpr(
        "doc_id",
        "stack(3, 'prefix16', k1, 'lang_len64', k2, 'first2tok', k3)"
        " as (scheme, bkey)",
    )
    per = (
        long.groupBy("scheme", "bkey")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("scheme")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_blocks"),
            F.max("c").cast("bigint").alias("max_block"),
            F.sum(F.expr("c * (c - 1) div 2")).cast("bigint").alias("cand_pairs"),
        )
    )
    ka = long.select(F.col("doc_id").alias("a_id"), "scheme", F.col("bkey").alias("ka"))
    kb = long.select(F.col("doc_id").alias("b_id"), "scheme", F.col("bkey").alias("kb"))
    cov = (
        F.broadcast(truth)
        .join(ka, "a_id")
        .join(kb, ["b_id", "scheme"])
        .filter(F.col("ka") == F.col("kb"))
        .groupBy("scheme")
        .agg(F.count(F.lit(1)).cast("bigint").alias("covered"))
    )
    tot = docs.agg(F.count(F.lit(1)).alias("n")).select(
        F.expr("n * (n - 1) div 2").cast("bigint").alias("total_pairs")
    )
    tp = truth.agg(F.count(F.lit(1)).cast("bigint").alias("truth_pairs"))
    return (
        per.join(cov, "scheme", "left")
        .withColumn("covered_pairs", F.coalesce(F.col("covered"), F.lit(0)).cast("bigint"))
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(tp))
        .select(
            "scheme",
            "n_blocks",
            "max_block",
            "cand_pairs",
            "truth_pairs",
            "covered_pairs",
            F.expr("covered_pairs * 1000000 div nullif(truth_pairs, 0)")
            .cast("bigint")
            .alias("pc_ppm"),
            F.expr("1000000 - cand_pairs * 1000000 div total_pairs")
            .cast("bigint")
            .alias("rr_ppm"),
        )
        .orderBy("scheme")
    )


SQL_BLOCKING_EVAL = f"""
WITH toks AS (
  SELECT doc_id, text, lang, n_chars, {_SQL_TOKS} AS toks FROM documents
), sh AS (
  SELECT DISTINCT doc_id, unnest(list_transform(range(len(toks) - 2),
    i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])) AS shingle
  FROM toks WHERE len(toks) >= 3
), counts AS (
  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS i
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), truth AS (
  SELECT a_id, b_id
  FROM inter JOIN counts ca ON a_id = ca.doc_id JOIN counts cb ON b_id = cb.doc_id
  WHERE round(i / (ca.n + cb.n - i), 4) >= 0.5
), keys3 AS (
  SELECT doc_id,
         substr(text, 1, 16) AS k1,
         concat_ws('|', lang, (n_chars // 64)::VARCHAR) AS k2,
         concat_ws(' ', toks[1], toks[2]) AS k3
  FROM toks
), long AS (
  SELECT doc_id, 'prefix16' AS scheme, k1 AS bkey FROM keys3
  UNION ALL SELECT doc_id, 'lang_len64', k2 FROM keys3
  UNION ALL SELECT doc_id, 'first2tok', k3 FROM keys3
), blocks AS (
  SELECT scheme, bkey, count(*) AS c FROM long GROUP BY 1, 2
), per AS (
  SELECT scheme, count(*)::BIGINT AS n_blocks, max(c)::BIGINT AS max_block,
         sum(c * (c - 1) // 2)::BIGINT AS cand_pairs
  FROM blocks GROUP BY scheme
), cov AS (
  SELECT ka.scheme, count(*)::BIGINT AS covered
  FROM truth t
  JOIN long ka ON ka.doc_id = t.a_id
  JOIN long kb ON kb.doc_id = t.b_id AND kb.scheme = ka.scheme
  WHERE ka.bkey = kb.bkey
  GROUP BY 1
), tot AS (
  SELECT (count(*) * (count(*) - 1) // 2)::BIGINT AS total_pairs FROM documents
), tp AS (
  SELECT count(*)::BIGINT AS truth_pairs FROM truth
)
SELECT p.scheme, p.n_blocks, p.max_block, p.cand_pairs, tp.truth_pairs,
       coalesce(c.covered, 0)::BIGINT AS covered_pairs,
       (coalesce(c.covered, 0) * 1000000 // nullif(tp.truth_pairs, 0))::BIGINT AS pc_ppm,
       (1000000 - p.cand_pairs * 1000000 // t.total_pairs)::BIGINT AS rr_ppm
FROM per p LEFT JOIN cov c ON p.scheme = c.scheme
CROSS JOIN tot t CROSS JOIN tp
ORDER BY p.scheme
"""


# -- Kaplan-Meier user-retention curve --------------------------------------------------------------------

_KM_CENSOR_DAYS = 7


def q_kaplan_meier_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier retention/survival curve over user activity spans:
    a user's lifetime is last_event - first_event in whole days; users
    whose last event falls within {_KM_CENSOR_DAYS} days of the
    observation-window end are right-CENSORED (still alive), everyone
    else "churned" at their lifetime. Per distinct lifetime t: the risk
    set n_risk (users with lifetime >= t), churn events d, censorings
    c, the KM step ln(1 - d/n) and the cumulative log-survival — the
    product-limit estimator (Kaplan & Meier '58) in log space.

    Parity discipline: the step is quantized to MICRO-nats per lifetime
    (floor of a double computed from exact integers), the curve is the
    integer cumulative sum — ordering-free and engine-exact; step is
    NULL where the risk set churns out entirely (ln 0).

    Scale shape: one groupBy(user) span agg, one groupBy(t_days)
    (cardinality <= observation span in days, i.e. tiny), the cumulative
    over that tiny frame; the 1-row window end broadcasts."""
    ev = _read(spark, sf_dir, "events").select(
        "user_id", F.expr("unix_millis(cast(ts as timestamp))").alias("ms")
    )
    per = ev.groupBy("user_id").agg(
        F.min("ms").alias("first_ms"), F.max("ms").alias("last_ms")
    )
    wmax = ev.agg(F.max("ms").alias("w_ms"))
    u = per.crossJoin(F.broadcast(wmax)).select(
        F.expr("(last_ms - first_ms) div 86400000").alias("t_days"),
        F.expr(
            f"cast(last_ms < w_ms - {_KM_CENSOR_DAYS} * 86400000 as int)"
        ).alias("churned"),
    )
    byt = u.groupBy("t_days").agg(
        F.sum("churned").cast("bigint").alias("d_churn"),
        F.sum(F.expr("1 - churned")).cast("bigint").alias("c_censored"),
    )
    tot = u.agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
    w_prev = Window.orderBy("t_days").rowsBetween(Window.unboundedPreceding, -1)
    w_cum = Window.orderBy("t_days").rowsBetween(Window.unboundedPreceding, 0)
    return (
        byt.crossJoin(F.broadcast(tot))
        .withColumn(
            "n_risk",
            (
                F.col("n_users")
                - F.coalesce(
                    F.sum(F.expr("d_churn + c_censored")).over(w_prev), F.lit(0)
                )
            ).cast("bigint"),
        )
        .withColumn(
            "step_micro",
            F.expr(
                "case when n_risk > d_churn then cast(floor(ln((n_risk - d_churn)"
                " / cast(n_risk as double)) * 1000000) as bigint) end"
            ),
        )
        .withColumn("cum_ln_micro", F.sum("step_micro").over(w_cum).cast("bigint"))
        .select(
            F.col("t_days").cast("bigint"),
            "n_risk",
            "d_churn",
            "c_censored",
            "step_micro",
            "cum_ln_micro",
        )
        .orderBy("t_days")
    )


SQL_KAPLAN_MEIER_SURVIVAL = f"""
WITH per AS (
  SELECT user_id, min(epoch_ms(ts)) AS first_ms, max(epoch_ms(ts)) AS last_ms
  FROM events GROUP BY user_id
), wmax AS (SELECT max(epoch_ms(ts)) AS w_ms FROM events),
u AS (
  SELECT (last_ms - first_ms) // 86400000 AS t_days,
         (last_ms < w_ms - {_KM_CENSOR_DAYS} * 86400000)::INTEGER AS churned
  FROM per CROSS JOIN wmax
), byt AS (
  SELECT t_days, sum(churned)::BIGINT AS d_churn,
         sum(1 - churned)::BIGINT AS c_censored
  FROM u GROUP BY t_days
), tot AS (SELECT count(*)::BIGINT AS n_users FROM u),
curve AS (
  SELECT t_days, d_churn, c_censored,
         (n_users - coalesce(sum(d_churn + c_censored) OVER
            (ORDER BY t_days ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         )::BIGINT AS n_risk
  FROM byt CROSS JOIN tot
), steps AS (
  SELECT t_days, n_risk, d_churn, c_censored,
         CASE WHEN n_risk > d_churn THEN
           floor(ln((n_risk - d_churn) / n_risk::DOUBLE) * 1000000)::BIGINT
         END AS step_micro
  FROM curve
)
SELECT t_days::BIGINT AS t_days, n_risk, d_churn, c_censored, step_micro,
       (sum(step_micro) OVER (ORDER BY t_days ROWS BETWEEN UNBOUNDED PRECEDING
          AND CURRENT ROW))::BIGINT AS cum_ln_micro
FROM steps ORDER BY t_days
"""


# -- Gorilla timestamp compression cost model ---------------------------------------------------------------


def q_gorilla_timestamp_bits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gorilla delta-of-delta timestamp compression cost model
    (Pelkonen et al., VLDB '15 §4.1) per event-type series: order each
    series by (ts, event_id), take second differences of the epoch-
    second timestamps, and charge the paper's bucket widths — 64 bits
    for the series head, 14 for the first delta, then 1 bit for dod=0,
    9 for [-63,64], 12 for [-255,256], 16 for [-2047,2048], 36
    otherwise. The planning number for any TSDB-style ingest of crawl
    fetch logs: bits/point tells you whether the timestamp column is
    effectively free (regular cadence -> ~1 bit) or fighting you.
    Integer-exact throughout.

    Scale shape: one window (partitioned by series, two lags), one
    groupBy(series) with partials; output is |event types| rows."""
    ev = _read(spark, sf_dir, "events").select(
        F.col("event_type").alias("et"),
        "event_id",
        F.expr("unix_millis(cast(ts as timestamp)) div 1000").alias("tsec"),
    )
    w = Window.partitionBy("et").orderBy("tsec", "event_id")
    d = (
        ev.withColumn("delta", F.col("tsec") - F.lag("tsec").over(w))
        .withColumn("dod", F.col("delta") - F.lag("delta").over(w))
        .withColumn(
            "bits",
            F.expr(
                "case when delta is null then 64"
                "     when dod is null then 14"
                "     when dod = 0 then 1"
                "     when dod between -63 and 64 then 9"
                "     when dod between -255 and 256 then 12"
                "     when dod between -2047 and 2048 then 16"
                "     else 36 end"
            ),
        )
    )
    return (
        d.groupBy("et")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pts"),
            F.sum(F.expr("cast(dod = 0 as int)")).cast("bigint").alias("c_dod0"),
            F.sum(F.expr("cast(dod <> 0 and dod between -63 and 64 as int)"))
            .cast("bigint")
            .alias("c_bits9"),
            F.sum(
                F.expr(
                    "cast(dod not between -63 and 64"
                    " and dod between -255 and 256 as int)"
                )
            )
            .cast("bigint")
            .alias("c_bits12"),
            F.sum(
                F.expr(
                    "cast(dod not between -255 and 256"
                    " and dod between -2047 and 2048 as int)"
                )
            )
            .cast("bigint")
            .alias("c_bits16"),
            F.sum(F.expr("cast(dod not between -2047 and 2048 as int)"))
            .cast("bigint")
            .alias("c_bits36"),
            F.sum("bits").cast("bigint").alias("total_bits"),
        )
        .withColumn(
            "bits_per_pt_milli", F.expr("total_bits * 1000 div n_pts").cast("bigint")
        )
        .orderBy("et")
    )


SQL_GORILLA_TIMESTAMP_BITS = """
WITH ev AS (
  SELECT event_type AS et, event_id, epoch_ms(ts) // 1000 AS tsec FROM events
), d AS (
  SELECT et,
         tsec - lag(tsec) OVER w AS delta,
         (tsec - lag(tsec) OVER w)
           - (lag(tsec) OVER w - lag(tsec, 2) OVER w) AS dod
  FROM ev WINDOW w AS (PARTITION BY et ORDER BY tsec, event_id)
), b AS (
  SELECT et, delta, dod,
         CASE WHEN delta IS NULL THEN 64
              WHEN dod IS NULL THEN 14
              WHEN dod = 0 THEN 1
              WHEN dod BETWEEN -63 AND 64 THEN 9
              WHEN dod BETWEEN -255 AND 256 THEN 12
              WHEN dod BETWEEN -2047 AND 2048 THEN 16
              ELSE 36 END AS bits
  FROM d
)
SELECT et, count(*)::BIGINT AS n_pts,
       sum((dod = 0)::INTEGER)::BIGINT AS c_dod0,
       sum((dod <> 0 AND dod BETWEEN -63 AND 64)::INTEGER)::BIGINT AS c_bits9,
       sum((dod NOT BETWEEN -63 AND 64 AND dod BETWEEN -255 AND 256)::INTEGER)::BIGINT AS c_bits12,
       sum((dod NOT BETWEEN -255 AND 256 AND dod BETWEEN -2047 AND 2048)::INTEGER)::BIGINT AS c_bits16,
       sum((dod NOT BETWEEN -2047 AND 2048)::INTEGER)::BIGINT AS c_bits36,
       sum(bits)::BIGINT AS total_bits,
       (sum(bits) * 1000 // count(*))::BIGINT AS bits_per_pt_milli
FROM b GROUP BY et ORDER BY et
"""


# -- Elias-Fano posting compression cost --------------------------------------------------------------------

# floor(log2(q)) for integer q >= 1 as a generated CASE ladder: exact in
# both engines with zero transcendentals (log2 doubles round the wrong
# way near 2^k for large k).
_LOG2_CASE = (
    "case "
    + " ".join(f"when q < {1 << (k + 1)} then {k}" for k in range(62))
    + " else 62 end"
)


def q_elias_fano_bits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Elias-Fano posting-list compression cost model (Vigna WSDM'13
    quasi-succinct indices): per term with n postings over doc-id
    universe u, split each id into l = max(0, floor(log2(u/n))) low
    bits stored verbatim and high bits stored unary — total
    n*l + n + (u >> l) bits, the textbook EF bound. The companion to
    `posting_delta_bytes`' varint model: together they decide the
    posting format for the `inverted_index` plan at 10^10 docs (EF wins
    on dense lists and supports O(1) skip, varint on short tails).
    Integer-exact: floor(log2(u/n)) = floor(log2(u div n)) for u>=n,
    computed by a CASE ladder, never a floating log.

    Scale shape: explode -> distinct postings (one shuffle), 1-row
    universe broadcast, groupBy(term) with partials; map-side
    arithmetic only."""
    post = (
        _tokens(_docs_parallel(spark, sf_dir))
        .select(F.explode("toks").alias("term"), "doc_id")
        .distinct()
    )
    uni = post.agg((F.max("doc_id") + 1).cast("bigint").alias("u"))
    per = post.groupBy("term").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    return (
        per.crossJoin(F.broadcast(uni))
        .withColumn("q", F.expr("case when u >= n then u div n else 1 end"))
        .withColumn("l", F.expr(_LOG2_CASE).cast("int"))
        .select(
            "term",
            "n",
            "l",
            F.expr("n * l + n + shiftright(u, l)").cast("bigint").alias("ef_bits"),
        )
        .withColumn(
            "bits_per_posting_milli", F.expr("ef_bits * 1000 div n").cast("bigint")
        )
        .orderBy("term")
    )


SQL_ELIAS_FANO_BITS = f"""
WITH toks AS (
  SELECT doc_id, {_SQL_TOKS} AS toks FROM documents
), post AS (
  SELECT DISTINCT unnest(toks) AS term, doc_id FROM toks
), uni AS (
  SELECT (max(doc_id) + 1)::BIGINT AS u FROM post
), per AS (
  SELECT term, count(*)::BIGINT AS n FROM post GROUP BY term
), lbits AS (
  SELECT term, n, u,
         ({_LOG2_CASE.replace("q", "(CASE WHEN u >= n THEN u // n ELSE 1 END)")})::INTEGER AS l
  FROM per CROSS JOIN uni
)
SELECT term, n, l,
       (n * l + n + (u >> l))::BIGINT AS ef_bits,
       ((n * l + n + (u >> l)) * 1000 // n)::BIGINT AS bits_per_posting_milli
FROM lbits ORDER BY term
"""


# -- rank-biased overlap of term rankings ---------------------------------------------------------------------

_RBO_K = 50
_RBO_PS = (0.9, 0.98)


def _rbo_suffix_nano(p: float, k: int) -> list[int]:
    """suffix[m] = floor(1e9 * sum_{d=m..k} (1-p) p^(d-1) / d): the total
    RBO weight an item with max(rank_a, rank_b) = m contributes. Computed
    once driver-side and injected as the SAME literal into both engines,
    so parity never rests on pow() ulps."""
    terms = [(1.0 - p) * p ** (d - 1) / d for d in range(1, k + 1)]
    out = []
    for m in range(1, k + 1):
        out.append(int(math.floor(sum(terms[m - 1 :]) * 1_000_000_000)))
    return out


def q_rank_biased_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-biased overlap (Webber, Moffat & Zobel TOIS'10) at depth
    {K}: the top-weighted similarity between two term rankings of the
    corpus — by document frequency vs by total term frequency — at
    persistence p = 0.9 (head-heavy) and 0.98 (deep). RBO@K =
    sum_d (1-p) p^(d-1) |A_d ∩ B_d| / d, evaluated per common item as a
    precomputed suffix-weight lookup at depth max(rank_a, rank_b), the
    standard trick that turns the per-depth intersection into one join.
    The monitor a retrieval stack runs to detect when two ranking
    signals (or yesterday's and today's index) stop agreeing where it
    matters — at the top.

    Scale shape: one vocab aggregation, two TakeOrdered top-K
    (never a global sort of the vocabulary), a 50-row self-join with
    the weight array inlined as a literal; output is |p| rows."""
    terms = (
        _tokens(_docs_parallel(spark, sf_dir))
        .select(F.explode("toks").alias("term"), "doc_id")
        .groupBy("term")
        .agg(
            F.countDistinct("doc_id").cast("bigint").alias("df"),
            F.count(F.lit(1)).cast("bigint").alias("tf"),
        )
        .localCheckpoint()
    )

    def topk(col: str):
        # TakeOrderedAndProject bounds the sort; ranks assigned on the
        # 50-row result, not the vocabulary
        lim = terms.orderBy(F.col(col).desc(), F.col("term")).limit(_RBO_K)
        return lim.select(
            "term",
            F.row_number()
            .over(Window.orderBy(F.col(col).desc(), F.col("term")))
            .alias(f"r_{col}"),
        )

    joined = topk("df").join(topk("tf"), "term")
    rows = []
    for p in _RBO_PS:
        suffix = _rbo_suffix_nano(p, _RBO_K)
        arr = "array(" + ", ".join(str(v) + "L" for v in suffix) + ")"
        agg = joined.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_common"),
            F.sum(
                F.expr(f"element_at({arr}, cast(greatest(r_df, r_tf) as int))")
            )
            .cast("bigint")
            .alias("rbo_nano"),
        ).select(
            F.lit(int(p * 100)).cast("int").alias("p_pct"),
            F.lit(_RBO_K).cast("int").alias("k"),
            "n_common",
            "rbo_nano",
        )
        rows.append(agg)
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out.orderBy("p_pct")


def _sql_rank_biased_overlap() -> str:
    sels = []
    for p in _RBO_PS:
        suffix = _rbo_suffix_nano(p, _RBO_K)
        arr = "[" + ", ".join(str(v) for v in suffix) + "]"
        sels.append(
            f"""SELECT {int(p * 100)}::INTEGER AS p_pct, {_RBO_K}::INTEGER AS k,
       count(*)::BIGINT AS n_common,
       sum(({arr})[greatest(r_df, r_tf)])::BIGINT AS rbo_nano
FROM joined"""
        )
    body = "\nUNION ALL\n".join(sels)
    return f"""
WITH toks AS (
  SELECT doc_id, {_SQL_TOKS} AS toks FROM documents
), tl AS (
  SELECT doc_id, unnest(toks) AS term FROM toks
), terms AS (
  SELECT term, count(DISTINCT doc_id)::BIGINT AS df, count(*)::BIGINT AS tf
  FROM tl GROUP BY term
), adf AS (
  SELECT term, row_number() OVER (ORDER BY df DESC, term) AS r_df
  FROM terms ORDER BY df DESC, term LIMIT {_RBO_K}
), atf AS (
  SELECT term, row_number() OVER (ORDER BY tf DESC, term) AS r_tf
  FROM terms ORDER BY tf DESC, term LIMIT {_RBO_K}
), joined AS (
  SELECT a.term, a.r_df, b.r_tf FROM adf a JOIN atf b USING (term)
)
SELECT * FROM ({body}) ORDER BY p_pct
"""


SQL_RANK_BIASED_OVERLAP = _sql_rank_biased_overlap()


# -- Wasserstein-1 drift --------------------------------------------------------------------------------------


def q_wasserstein_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wasserstein-1 (earth-mover) distance between the document-length
    distributions of the lang='en' slice and the rest — the same
    monitor slice as `ks_drift` but the integral drift statistic
    instead of the supremum: W1 = integral |F_a(v) - F_b(v)| dv =
    sum over adjacent distinct lengths of |F_a - F_b| * gap. KS fires
    on a single sharp divergence, W1 on sustained mass displacement;
    production drift gates run both. Integer-EXACT: with counts
    cum_a/na and cum_b/nb, each segment contributes
    |cum_a*nb - cum_b*na| * gap on the common denominator na*nb — no
    floating point anywhere, w1_milli = num * 1000 // (na*nb).

    Scale shape: identical to ks_drift — grouped histogram (map-side
    partials), ordered window over the tiny distinct-value frame,
    1-row output."""
    docs = _read(spark, sf_dir, "documents").select(
        "n_chars", (F.col("lang") == "en").alias("is_a")
    )
    per_v = docs.groupBy("n_chars").agg(
        F.sum(F.when(F.col("is_a"), 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("is_a"), 0).otherwise(1)).alias("cb"),
    )
    tot = per_v.agg(
        F.sum("ca").cast("bigint").alias("na"), F.sum("cb").cast("bigint").alias("nb")
    )
    w = Window.orderBy("n_chars").rowsBetween(Window.unboundedPreceding, 0)
    wnext = Window.orderBy("n_chars")
    seg = (
        per_v.select(
            "n_chars",
            F.sum("ca").over(w).cast("bigint").alias("cum_a"),
            F.sum("cb").over(w).cast("bigint").alias("cum_b"),
        )
        .withColumn("gap", F.lead("n_chars").over(wnext) - F.col("n_chars"))
        .filter(F.col("gap").isNotNull())
    )
    return (
        seg.crossJoin(F.broadcast(tot))
        .agg(
            F.max("na").cast("bigint").alias("n_en"),
            F.max("nb").cast("bigint").alias("n_rest"),
            F.sum(F.expr("abs(cum_a * nb - cum_b * na) * gap"))
            .cast("bigint")
            .alias("w1_num"),
        )
        .select(
            "n_en",
            "n_rest",
            "w1_num",
            F.expr("w1_num * 1000 div (n_en * n_rest)")
            .cast("bigint")
            .alias("w1_chars_milli"),
        )
    )


SQL_WASSERSTEIN_DRIFT = """
WITH per_v AS (
  SELECT n_chars,
         sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS ca,
         sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS cb
  FROM documents GROUP BY n_chars
), tot AS (
  SELECT sum(ca)::BIGINT AS na, sum(cb)::BIGINT AS nb FROM per_v
), seg AS (
  SELECT n_chars,
         sum(ca) OVER (ORDER BY n_chars ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum_a,
         sum(cb) OVER (ORDER BY n_chars ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum_b,
         lead(n_chars) OVER (ORDER BY n_chars) - n_chars AS gap
  FROM per_v
)
SELECT max(na)::BIGINT AS n_en, max(nb)::BIGINT AS n_rest,
       sum(abs(cum_a * nb - cum_b * na) * gap)::BIGINT AS w1_num,
       (sum(abs(cum_a * nb - cum_b * na) * gap) * 1000 // (max(na) * max(nb)))::BIGINT AS w1_chars_milli
FROM seg CROSS JOIN tot
WHERE gap IS NOT NULL
"""


# -- Benford first-digit deviation ---------------------------------------------------------------------------

#: floor(1e9 * log10(1 + 1/d)) — computed once driver-side and injected as
#: the SAME literal into both engines so parity never rests on log() ulps.
_BENFORD_NANO = {d: int(math.floor(1e9 * math.log10(1.0 + 1.0 / d))) for d in range(1, 10)}
_BENFORD_CASE = (
    "case digit "
    + " ".join(f"when '{d}' then {v}" for d, v in _BENFORD_NANO.items())
    + " end"
)


def q_benford_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-significant-digit audit over event values —
    the classic anomaly/fabrication monitor (Hill, Statistical Science
    1995): naturally-grown magnitudes put P(d) = log10(1+1/d) mass on
    leading digit d; synthetic or gamed streams (click fraud, spam
    traffic, bulk-generated pages) flatten it. Output per digit: the
    observed count, the Benford-expected count in milli-units, and the
    signed deviation in nano-fractions — integer-exact because the
    digit comes from a decimal string cast (never a floating log) and
    the expected probabilities are driver-side literals shared with
    the oracle.

    Scale shape: map-side digit extraction, 9-group aggregation with
    partials, 1-row total broadcast back in; 9 output rows at any
    corpus size. At 10^10 events the only care is obs*1e9 nearing
    int64 — switch dev to ppm at that magnitude."""
    ev = _read(spark, sf_dir, "events").filter(F.col("value") >= 1)
    obs = (
        ev.select(
            F.substring(
                F.floor("value").cast("bigint").cast("string"), 1, 1
            ).alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("bigint").alias("obs"))
    )
    tot = obs.agg(F.sum("obs").cast("bigint").alias("n"))
    return (
        obs.crossJoin(F.broadcast(tot))
        .withColumn("p_nano", F.expr(_BENFORD_CASE).cast("bigint"))
        .select(
            "digit",
            "obs",
            "n",
            F.expr("n * p_nano div 1000000").cast("bigint").alias("expected_milli"),
            F.expr("obs * 1000000000 - n * p_nano").cast("bigint").alias("dev_nano"),
        )
        .orderBy("digit")
    )


SQL_BENFORD_DEVIATION = f"""
WITH d AS (
  SELECT substr(CAST(CAST(floor(value) AS BIGINT) AS VARCHAR), 1, 1) AS digit
  FROM events WHERE value >= 1
), obs AS (
  SELECT digit, count(*)::BIGINT AS obs FROM d GROUP BY digit
), tot AS (SELECT sum(obs)::BIGINT AS n FROM obs)
SELECT digit, obs, n,
       (n * ({_BENFORD_CASE}) // 1000000)::BIGINT AS expected_milli,
       (obs * 1000000000 - n * ({_BENFORD_CASE}))::BIGINT AS dev_nano
FROM obs CROSS JOIN tot ORDER BY digit
"""


# -- frame-of-reference posting block bits ---------------------------------------------------------------------

_FOR_BLOCK = 128


def q_for_block_bits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-of-reference (FOR) posting compression cost model
    (Goldstein/Ramakrishnan/Shaft ICDE'98; the PackedInts block format
    in Lucene): per term, sorted doc-id gaps are cut into 128-entry
    blocks, each block stored at the fixed bit width of its LARGEST
    gap (width = floor(log2(max_gap)) + 1) plus a 1-byte width header.
    Completes the posting-format trio — varint (`posting_delta_bytes`),
    Elias-Fano (`elias_fano_bits`), FOR — that the `inverted_index`
    plan chooses between at 10^10 docs: FOR trades a few bits/posting
    for SIMD-decodable fixed-width blocks. Integer-exact via the same
    CASE-ladder log2 as Elias-Fano; first posting stored as id+1 so
    doc 0 still costs width.

    Scale shape: explode -> distinct postings (one shuffle); lag +
    row_number share ONE window partitioned by term (no second
    exchange); (term, block) agg then term agg, partials on both."""
    post = (
        _tokens(_docs_parallel(spark, sf_dir))
        .select(F.explode("toks").alias("term"), "doc_id")
        .distinct()
    )
    w = Window.partitionBy("term").orderBy("doc_id")
    g = post.select(
        "term",
        F.coalesce(
            F.col("doc_id") - F.lag("doc_id").over(w), F.col("doc_id") + 1
        ).alias("g"),
        ((F.row_number().over(w) - 1) - ((F.row_number().over(w) - 1) % _FOR_BLOCK))
        .alias("blk"),
    )
    per_blk = (
        g.groupBy("term", "blk")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("cnt"),
            F.max("g").cast("bigint").alias("q"),
        )
        .withColumn("width", F.expr(_LOG2_CASE).cast("bigint") + 1)
    )
    return (
        per_blk.groupBy("term")
        .agg(
            F.sum("cnt").cast("bigint").alias("df"),
            F.count(F.lit(1)).cast("bigint").alias("nblocks"),
            F.sum(F.expr("cnt * width + 8")).cast("bigint").alias("for_bits"),
        )
        .withColumn(
            "bits_per_posting_milli", F.expr("for_bits * 1000 div df").cast("bigint")
        )
        .orderBy("term")
    )


SQL_FOR_BLOCK_BITS = f"""
WITH toks AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
post AS (SELECT DISTINCT t.term, toks.doc_id FROM toks, unnest(toks.toks) AS t(term)),
gaps AS (
  SELECT term,
         coalesce(doc_id - lag(doc_id) OVER (PARTITION BY term ORDER BY doc_id),
                  doc_id + 1) AS g,
         (row_number() OVER (PARTITION BY term ORDER BY doc_id) - 1)
           - ((row_number() OVER (PARTITION BY term ORDER BY doc_id) - 1) % {_FOR_BLOCK}) AS blk
  FROM post
), per_blk AS (
  SELECT term, blk, count(*)::BIGINT AS cnt, max(g)::BIGINT AS q
  FROM gaps GROUP BY term, blk
), widths AS (
  SELECT term, cnt, ({_LOG2_CASE})::BIGINT + 1 AS width FROM per_blk
), per_term AS (
  SELECT term, sum(cnt)::BIGINT AS df, count(*)::BIGINT AS nblocks,
         sum(cnt * width + 8)::BIGINT AS for_bits
  FROM widths GROUP BY term
)
SELECT term, df, nblocks, for_bits,
       (for_bits * 1000 // df)::BIGINT AS bits_per_posting_milli
FROM per_term ORDER BY term
"""


# -- Weisfeiler-Lehman color refinement -------------------------------------------------------------------------

_WL_ITERS = 2


def q_wl_refinement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-dimensional Weisfeiler-Lehman color refinement (the WL graph
    isomorphism test; Shervashidze et al JMLR'11 use it as a graph
    kernel) on the undirected host graph: every node starts colored by
    its degree, then each round recolors to
    hash(own_color | sorted multiset of neighbor colors). Two rounds
    of refinement give each host a structural fingerprint of its
    2-hop neighborhood — the mirror-site / template-farm detector
    that degree alone misses (two hosts with equal degree but
    different neighbor-degree profiles split at round 1). Colors are
    md5 prefixes of canonical strings, so both engines agree
    bit-for-bit.

    Scale shape: per round exactly one join (labels into the
    adjacency list) + one groupBy(node) with a sorted-array
    signature; labels localCheckpoint()ed between rounds to keep the
    plan flat. At 10^10 edges this is the standard iterated
    join-aggregate — same shuffle skeleton as PageRank."""
    edges = _pagerank_edges(spark, sf_dir)
    adj = (
        edges.select(F.col("src").alias("node"), F.col("dst").alias("nbr"))
        .union(edges.select(F.col("dst").alias("node"), F.col("src").alias("nbr")))
        .distinct()
        .localCheckpoint()
    )
    deg = adj.groupBy("node").agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
    lab = deg.select("node", F.col("deg").cast("string").alias("lbl"))
    rounds = []
    for i in range(_WL_ITERS):
        sig = (
            adj.join(
                lab.select(F.col("node").alias("nbr"), F.col("lbl").alias("nlbl")),
                "nbr",
            )
            .groupBy("node")
            .agg(F.array_join(F.array_sort(F.collect_list("nlbl")), ",").alias("sig"))
        )
        lab = (
            lab.join(sig, "node")
            .select(
                "node",
                F.substring(F.md5(F.concat_ws("|", "lbl", "sig")), 1, 8).alias("lbl"),
            )
            .localCheckpoint()
        )
        rounds.append(lab.select("node", F.col("lbl").alias(f"c{i + 1}")))
    out = deg
    for r in rounds:
        out = out.join(r, "node")
    return out.orderBy("node")


SQL_WL_REFINEMENT = f"""
WITH edges AS (
  SELECT DISTINCT user_id % {_PR_NODES} AS src,
         ('0x' || substr(md5(event_id::VARCHAR), 1, 4))::BIGINT % {_PR_NODES} AS dst
  FROM events
  WHERE user_id % {_PR_NODES}
        <> ('0x' || substr(md5(event_id::VARCHAR), 1, 4))::BIGINT % {_PR_NODES}
), adj AS (
  SELECT DISTINCT node, nbr FROM (
    SELECT src AS node, dst AS nbr FROM edges
    UNION ALL SELECT dst AS node, src AS nbr FROM edges
  )
), deg AS (
  SELECT node, count(*)::BIGINT AS deg FROM adj GROUP BY node
), l0 AS (
  SELECT node, deg::VARCHAR AS lbl FROM deg
), s1 AS (
  SELECT a.node, string_agg(l.lbl, ',' ORDER BY l.lbl) AS sig
  FROM adj a JOIN l0 l ON a.nbr = l.node GROUP BY a.node
), l1 AS (
  SELECT l0.node, substr(md5(concat_ws('|', l0.lbl, s1.sig)), 1, 8) AS lbl
  FROM l0 JOIN s1 ON l0.node = s1.node
), s2 AS (
  SELECT a.node, string_agg(l.lbl, ',' ORDER BY l.lbl) AS sig
  FROM adj a JOIN l1 l ON a.nbr = l.node GROUP BY a.node
), l2 AS (
  SELECT l1.node, substr(md5(concat_ws('|', l1.lbl, s2.sig)), 1, 8) AS lbl
  FROM l1 JOIN s2 ON l1.node = s2.node
)
SELECT deg.node, deg.deg, l1.lbl AS c1, l2.lbl AS c2
FROM deg
JOIN l1 ON deg.node = l1.node
JOIN l2 ON deg.node = l2.node
ORDER BY deg.node
"""


# -- Roaring bitmap container plan -----------------------------------------------------------------------------

#: scaled-down container span (real Roaring uses 2^16; the decision rule
#: is span-relative, so the model keeps its shape at any span)
_ROAR_SPAN = 1024


def q_roaring_container_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Roaring-bitmap container planning (Chambi, Lemire et al.
    Software P&E 2016): each posting list is cut into fixed doc-id
    spans and every span independently picks the cheapest container —
    sorted array (2 bytes/id), bitmap (span/8 bytes flat), or run
    container (2 + 4 bytes/run) — exactly the decision
    `RoaringBitmap.runOptimize` makes. Completes the index-layout
    family (varint / Elias-Fano / FOR / Roaring): Roaring is what you
    pick when the index must also answer fast AND/OR for faceted or
    filtered crawls. Span scaled to {span} (vs 2^16 in the library) so
    small-SF tests exercise all three container types; the byte
    formulas keep their real-library shape.

    Scale shape: explode -> distinct postings (one shuffle); run
    detection is a lag over ONE (term, chunk)-partitioned window; two
    grouped aggs with partials; integer arithmetic only."""
    post = (
        _tokens(_docs_parallel(spark, sf_dir))
        .select(F.explode("toks").alias("term"), "doc_id")
        .distinct()
        .withColumn("chunk", (F.col("doc_id") - F.col("doc_id") % _ROAR_SPAN))
    )
    w = Window.partitionBy("term", "chunk").orderBy("doc_id")
    runs = post.withColumn(
        "newrun",
        F.when(F.col("doc_id") - F.lag("doc_id").over(w) == 1, F.lit(0)).otherwise(
            F.lit(1)
        ),
    )
    per_chunk = (
        runs.groupBy("term", "chunk")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("c"),
            F.sum("newrun").cast("bigint").alias("r"),
        )
        .withColumn("array_b", F.expr("2 * c"))
        .withColumn("bitmap_b", F.lit(_ROAR_SPAN // 8).cast("bigint"))
        .withColumn("run_b", F.expr("2 + 4 * r"))
        .withColumn(
            "kind",
            F.expr(
                "case when run_b <= array_b and run_b <= bitmap_b then 'run' "
                "when array_b <= bitmap_b then 'array' else 'bitmap' end"
            ),
        )
        .withColumn("bytes", F.least("array_b", "bitmap_b", "run_b"))
    )
    return (
        per_chunk.groupBy("term")
        .agg(
            F.sum("c").cast("bigint").alias("df"),
            F.count(F.lit(1)).cast("bigint").alias("nchunks"),
            F.sum(F.expr("cast(kind = 'array' as bigint)")).alias("n_array"),
            F.sum(F.expr("cast(kind = 'bitmap' as bigint)")).alias("n_bitmap"),
            F.sum(F.expr("cast(kind = 'run' as bigint)")).alias("n_run"),
            F.sum("bytes").cast("bigint").alias("roaring_bytes"),
        )
        .select(
            "term",
            "df",
            "nchunks",
            "n_array",
            "n_bitmap",
            "n_run",
            "roaring_bytes",
            F.expr("(df * 4 - roaring_bytes) * 1000000 div (df * 4)")
            .cast("bigint")
            .alias("savings_ppm"),
        )
        .orderBy("term")
    )


q_roaring_container_plan.__doc__ = q_roaring_container_plan.__doc__.format(
    span=_ROAR_SPAN
)


SQL_ROARING_CONTAINER_PLAN = f"""
WITH toks AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
post AS (SELECT DISTINCT t.term, toks.doc_id FROM toks, unnest(toks.toks) AS t(term)),
runs AS (
  SELECT term, doc_id - doc_id % {_ROAR_SPAN} AS chunk,
         CASE WHEN doc_id - lag(doc_id) OVER (
                PARTITION BY term, doc_id - doc_id % {_ROAR_SPAN} ORDER BY doc_id
              ) = 1 THEN 0 ELSE 1 END AS newrun
  FROM post
), per_chunk AS (
  SELECT term, chunk, count(*)::BIGINT AS c, sum(newrun)::BIGINT AS r
  FROM runs GROUP BY term, chunk
), sized AS (
  SELECT term, c,
         2 * c AS array_b, {_ROAR_SPAN // 8}::BIGINT AS bitmap_b, 2 + 4 * r AS run_b
  FROM per_chunk
), chosen AS (
  SELECT term, c,
         CASE WHEN run_b <= array_b AND run_b <= bitmap_b THEN 'run'
              WHEN array_b <= bitmap_b THEN 'array' ELSE 'bitmap' END AS kind,
         least(array_b, bitmap_b, run_b) AS bytes
  FROM sized
)
SELECT term, sum(c)::BIGINT AS df, count(*)::BIGINT AS nchunks,
       sum((kind = 'array')::BIGINT)::BIGINT AS n_array,
       sum((kind = 'bitmap')::BIGINT)::BIGINT AS n_bitmap,
       sum((kind = 'run')::BIGINT)::BIGINT AS n_run,
       sum(bytes)::BIGINT AS roaring_bytes,
       ((sum(c) * 4 - sum(bytes)) * 1000000 // (sum(c) * 4))::BIGINT AS savings_ppm
FROM chosen GROUP BY term ORDER BY term
"""


# -- odds-ratio keyness ------------------------------------------------------------------------------------------


def q_odds_ratio_keyness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-comparison keyness by document-frequency odds ratio: for
    each term, how much more likely is an English document to contain
    it than a non-English one — the workhorse behind 'what words
    characterize slice A vs slice B' (Monroe/Colaresi/Quinn 'Fightin'
    Words' 2008 §3.1 use its log; the ratio itself needs no
    transcendentals). Haldane-Anscombe +1/2 smoothing keeps zero cells
    finite; doubling both sides ((2a+1)(2d+1) / (2b+1)(2c+1)) keeps
    every operand integral, so both engines agree exactly. The slice
    audit a training-data pipeline runs after language routing: terms
    with extreme keyness in the 'wrong' slice expose lang-ID errors
    and template contamination.

    Scale shape: per-doc distinct terms (one shuffle), one contingency
    groupBy with partials, 1-row corpus totals broadcast back;
    |vocab| output rows, pure integer map-side math after the aggs."""
    docs = _docs_parallel(spark, sf_dir).select(
        "doc_id", "text", (F.col("lang") == "en").alias("is_en")
    )
    dt = (
        _tokens(docs)
        .select("doc_id", "is_en", F.explode("toks").alias("term"))
        .distinct()
    )
    per_term = dt.groupBy("term").agg(
        F.sum(F.when(F.col("is_en"), 1).otherwise(0)).cast("bigint").alias("a"),
        F.sum(F.when(F.col("is_en"), 0).otherwise(1)).cast("bigint").alias("c"),
    )
    tot = docs.agg(
        F.sum(F.when(F.col("is_en"), 1).otherwise(0)).cast("bigint").alias("n_en"),
        F.sum(F.when(F.col("is_en"), 0).otherwise(1)).cast("bigint").alias("n_rest"),
    )
    return (
        per_term.crossJoin(F.broadcast(tot))
        .select(
            "term",
            "a",
            F.expr("n_en - a").cast("bigint").alias("b"),
            "c",
            F.expr("n_rest - c").cast("bigint").alias("d"),
        )
        .withColumn(
            "odds_ratio_ppm",
            F.expr(
                "(2*a + 1) * (2*d + 1) * 1000000 div ((2*b + 1) * (2*c + 1))"
            ).cast("bigint"),
        )
        .orderBy("term")
    )


SQL_ODDS_RATIO_KEYNESS = f"""
WITH docs AS (
  SELECT doc_id, (lang = 'en') AS is_en, {_SQL_TOKS} AS toks FROM documents
), dt AS (
  SELECT DISTINCT doc_id, is_en, unnest(toks) AS term FROM docs
), per_term AS (
  SELECT term,
         sum(CASE WHEN is_en THEN 1 ELSE 0 END)::BIGINT AS a,
         sum(CASE WHEN is_en THEN 0 ELSE 1 END)::BIGINT AS c
  FROM dt GROUP BY term
), tot AS (
  SELECT sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::BIGINT AS n_en,
         sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END)::BIGINT AS n_rest
  FROM documents
)
SELECT term, a, (n_en - a)::BIGINT AS b, c, (n_rest - c)::BIGINT AS d,
       ((2*a + 1) * (2*(n_rest - c) + 1) * 1000000
        // ((2*(n_en - a) + 1) * (2*c + 1)))::BIGINT AS odds_ratio_ppm
FROM per_term CROSS JOIN tot ORDER BY term
"""


# -- inter-arrival burstiness ------------------------------------------------------------------------------------


def q_interarrival_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index of dispersion of the request stream, per event type:
    CV^2 = Var(d)/E[d]^2 over inter-arrival gaps d — CV^2 = 1 is
    Poisson traffic, >> 1 bursty (flash crowds, retry storms, bot
    bursts), << 1 regular (pacing/rate limiting working as intended).
    The scheduler-side complement to `term_burstiness` (content) and
    `host_fairness` (allocation): politeness budgets sized for mean
    rate melt under the same mean delivered as bursts. Closed form on
    three integer partials — cv2_milli = (n*Sum(d^2) - Sum(d)^2) * 1000
    div Sum(d)^2 — with gaps in whole seconds (epoch_us div 1e6), so
    both engines agree exactly; gap ties make the statistic invariant
    to tie order.

    Scale shape: one lag window per event type (the natural stream
    partitioning), one groupBy with integer partials; |types| rows."""
    ev = _read(spark, sf_dir, "events").select(
        "event_type", (_us("ts") / F.lit(1000000)).cast("bigint").alias("s")
    )
    w = Window.partitionBy("event_type").orderBy("s")
    gaps = ev.withColumn("d", F.col("s") - F.lag("s").over(w)).filter(
        F.col("d").isNotNull()
    )
    return (
        gaps.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
            F.sum("d").cast("bigint").alias("sum_d"),
            F.sum(F.expr("d * d")).cast("bigint").alias("sum_d2"),
        )
        .select(
            "event_type",
            "n_gaps",
            F.expr("sum_d div n_gaps").cast("bigint").alias("mean_gap_s"),
            F.expr("(n_gaps * sum_d2 - sum_d * sum_d) * 1000 div (sum_d * sum_d)")
            .cast("bigint")
            .alias("cv2_milli"),
        )
        .orderBy("event_type")
    )


SQL_INTERARRIVAL_BURSTINESS = """
WITH ev AS (
  SELECT event_type, epoch_us(ts) // 1000000 AS s FROM events
), gaps AS (
  SELECT event_type,
         s - lag(s) OVER (PARTITION BY event_type ORDER BY s) AS d
  FROM ev
), agg AS (
  SELECT event_type, count(*)::BIGINT AS n_gaps,
         sum(d)::BIGINT AS sum_d, sum(d * d)::BIGINT AS sum_d2
  FROM gaps WHERE d IS NOT NULL GROUP BY event_type
)
SELECT event_type, n_gaps,
       (sum_d // n_gaps)::BIGINT AS mean_gap_s,
       ((n_gaps * sum_d2 - sum_d * sum_d) * 1000 // (sum_d * sum_d))::BIGINT AS cv2_milli
FROM agg ORDER BY event_type
"""


# -- capture-recapture frontier-size estimate --------------------------------------------------------------------

#: per-mille inclusion threshold for the two independent hash samples
_CR_PCT = 30


def q_capture_recapture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capture-recapture (Chapman 1951) corpus-size estimation: two
    independent deterministic hash samples of the document space play
    the role of two independent crawls; the overlap between them
    estimates the TRUE population size N ~ (n1+1)(n2+1)/(m+1) - 1 —
    the classic technique for estimating the size of the indexable web
    from overlapping crawler indexes (Lawrence & Giles, Science 1998).
    At 10^10 URLs nobody can count the frontier's complement; two
    cheap Bernoulli crawls + this 1-row estimate is how coverage gets
    audited. Samples are md5-derived, so membership is bit-reproducible
    in both engines; the Chapman form is integer-exact.

    Scale shape: single pass over the corpus — two map-side hash
    predicates folded into ONE aggregate of four conditional counts;
    no join, no shuffle beyond the 1-row agg."""
    docs = _read(spark, sf_dir, "documents").select(
        (
            F.expr(
                "cast(conv(substring(md5(cast(doc_id as string)), 1, 4), 16, 10) as bigint)"
            )
            % 100
            < _CR_PCT
        ).alias("in_a"),
        (
            F.expr(
                "cast(conv(substring(md5(cast(doc_id as string)), 5, 4), 16, 10) as bigint)"
            )
            % 100
            < _CR_PCT
        ).alias("in_b"),
    )
    return (
        docs.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_true"),
            F.sum(F.when(F.col("in_a"), 1).otherwise(0)).cast("bigint").alias("n1"),
            F.sum(F.when(F.col("in_b"), 1).otherwise(0)).cast("bigint").alias("n2"),
            F.sum(F.when(F.col("in_a") & F.col("in_b"), 1).otherwise(0))
            .cast("bigint")
            .alias("m"),
        )
        .withColumn(
            "chapman_est",
            F.expr("(n1 + 1) * (n2 + 1) div (m + 1) - 1").cast("bigint"),
        )
        .withColumn(
            "abs_err_ppm",
            F.expr("abs(chapman_est - n_true) * 1000000 div n_true").cast("bigint"),
        )
    )


SQL_CAPTURE_RECAPTURE = f"""
WITH tagged AS (
  SELECT ('0x' || substr(md5(doc_id::VARCHAR), 1, 4))::BIGINT % 100 < {_CR_PCT} AS in_a,
         ('0x' || substr(md5(doc_id::VARCHAR), 5, 4))::BIGINT % 100 < {_CR_PCT} AS in_b
  FROM documents
), agg AS (
  SELECT count(*)::BIGINT AS n_true,
         sum(CASE WHEN in_a THEN 1 ELSE 0 END)::BIGINT AS n1,
         sum(CASE WHEN in_b THEN 1 ELSE 0 END)::BIGINT AS n2,
         sum(CASE WHEN in_a AND in_b THEN 1 ELSE 0 END)::BIGINT AS m
  FROM tagged
)
SELECT n_true, n1, n2, m,
       ((n1 + 1) * (n2 + 1) // (m + 1) - 1)::BIGINT AS chapman_est,
       (abs((n1 + 1) * (n2 + 1) // (m + 1) - 1 - n_true) * 1000000 // n_true)::BIGINT AS abs_err_ppm
FROM agg
"""


# -- Chao1 vocabulary richness ------------------------------------------------------------------------------------


def q_chao1_richness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chao1 species-richness estimation per language slice: the
    lower-bound estimate of TRUE vocabulary size from the observed
    type counts and the singleton/doubleton frequencies —
    S_chao1 = S_obs + f1^2/(2 f2) (bias-corrected f1(f1-1)/2 when
    f2 = 0). Completes the vocabulary triptych: Heaps
    (`vocab_growth_curve`) says how vocab GROWS, Good-Turing
    (`unseen_mass_gt`) how much probability mass is unseen, Chao1 how
    many TYPES are unseen — the number that decides whether a
    tokenizer's vocab budget has converged per language. Integer-exact
    milli arithmetic; the f2 = 0 branch keeps the numerator
    non-negative so truncating division agrees across engines.

    Scale shape: (lang, term) count groupBy (one shuffle) -> per-lang
    fold of S_obs/f1/f2 integer partials; |langs| output rows."""
    per = (
        _tokens(_docs_parallel(spark, sf_dir))
        .select("lang", F.explode("toks").alias("term"))
        .groupBy("lang", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    return (
        per.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("s_obs"),
            F.sum(F.expr("cast(c = 1 as bigint)")).alias("f1"),
            F.sum(F.expr("cast(c = 2 as bigint)")).alias("f2"),
        )
        .withColumn(
            "chao1_milli",
            F.expr(
                "s_obs * 1000 + case when f2 > 0 then f1 * f1 * 1000 div (2 * f2) "
                "else f1 * (f1 - 1) * 1000 div 2 end"
            ).cast("bigint"),
        )
        .orderBy("lang")
    )


SQL_CHAO1_RICHNESS = f"""
WITH toks AS (
  SELECT lang, {_SQL_TOKS} AS toks FROM documents
), per AS (
  SELECT lang, term, count(*)::BIGINT AS c
  FROM (SELECT lang, unnest(toks) AS term FROM toks) GROUP BY lang, term
), agg AS (
  SELECT lang, count(*)::BIGINT AS s_obs,
         sum((c = 1)::BIGINT)::BIGINT AS f1,
         sum((c = 2)::BIGINT)::BIGINT AS f2
  FROM per GROUP BY lang
)
SELECT lang, s_obs, f1, f2,
       (s_obs * 1000 + CASE WHEN f2 > 0 THEN f1 * f1 * 1000 // (2 * f2)
                            ELSE f1 * (f1 - 1) * 1000 // 2 END)::BIGINT AS chao1_milli
FROM agg ORDER BY lang
"""


# -- Flesch-Kincaid readability -----------------------------------------------------------------------------------


def q_readability_grade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch-Kincaid grade level per document (Kincaid et al 1975):
    0.39·(words/sentences) + 11.8·(syllables/words) − 15.59, with
    sentences counted as terminal-punctuation groups and syllables as
    vowel-letter groups — the standard cheap proxies. A workhorse
    curation signal orthogonal to `quality_score`'s stopword/length
    heuristics: grade bands drive mixing (children's text vs technical
    prose) and flag machine-generated run-ons. Integer-exact on the
    common denominator s·w with the numerator clamped at 0 (grades
    below 0 report 0), so truncating division agrees across engines
    and no floating point appears.

    Scale shape: pure map-side regexp counting + arithmetic — zero
    shuffles, scales linearly; the regexes are single-pass RE2-safe
    character classes."""
    docs = _tokens(_docs_parallel(spark, sf_dir)).select(
        "doc_id",
        F.greatest(F.expr("size(toks)"), F.lit(1)).cast("bigint").alias("w"),
        F.greatest(
            F.expr("size(regexp_extract_all(text, '[.!?]+', 0))"), F.lit(1)
        )
        .cast("bigint")
        .alias("s"),
        F.expr("size(regexp_extract_all(lower(text), '[aeiouy]+', 0))")
        .cast("bigint")
        .alias("syl"),
    )
    return docs.select(
        "doc_id",
        F.col("w").alias("n_words"),
        F.col("s").alias("n_sentences"),
        F.col("syl").alias("n_syllables"),
        F.expr(
            "greatest(390 * w * w + 11800 * syl * s - 15590 * s * w, 0) div (s * w)"
        )
        .cast("bigint")
        .alias("fk_grade_milli"),
    ).orderBy("doc_id")


SQL_READABILITY_GRADE = f"""
WITH base AS (
  SELECT doc_id,
         greatest(len({_SQL_TOKS}), 1)::BIGINT AS w,
         greatest(len(regexp_extract_all(text, '[.!?]+')), 1)::BIGINT AS s,
         len(regexp_extract_all(lower(text), '[aeiouy]+'))::BIGINT AS syl
  FROM documents
)
SELECT doc_id, w AS n_words, s AS n_sentences, syl AS n_syllables,
       (greatest(390 * w * w + 11800 * syl * s - 15590 * s * w, 0) // (s * w))::BIGINT AS fk_grade_milli
FROM base ORDER BY doc_id
"""


# -- Brier score decomposition ------------------------------------------------------------------------------------

_BRIER_BINS = 10


def q_brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Murphy (1973) decomposition of the Brier score into
    RELIABILITY − RESOLUTION + UNCERTAINTY over {bins} confidence bins:
    REL measures how far bin-mean confidence sits from bin accuracy
    (what `calibration_bins`' ECE L1-summarizes, here in its proper
    quadratic form), RES how much the bins separate outcomes (a
    classifier can be perfectly calibrated and useless — RES ~ 0 tells
    you), UNC the outcome base-rate entropy floor. The audit that says
    WHY a quality classifier's Brier is bad, not just that it is.
    Predictions/labels are the same md5-derived calibrated pair as
    `calibration_bins`, so both engines audit identical data.
    Integer-exact: every component is a ratio of integer partial sums
    with non-negative numerators (micro prob^2 units), divisions
    truncate identically in both engines.

    Scale shape: map-side hash scoring -> {bins}-row groupBy -> 1-row
    fold; only the bin table crosses the wire."""
    docs = _read(spark, sf_dir, "documents").select("doc_id")
    h = F.md5(F.col("doc_id").cast("string"))
    u = F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint")
    v = F.conv(F.substring(h, 9, 8), 16, 10).cast("bigint")
    scored = docs.select(
        (F.floor(u * _BRIER_BINS / F.lit(2**32))).cast("int").alias("bin"),
        F.expr(f"cast(conv(substring(md5(cast(doc_id as string)), 1, 8), 16, 10) as bigint) * 1000 div {2**32}").alias("conf_milli"),
        (v < u).cast("bigint").alias("label"),
    )
    bins = scored.groupBy("bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_b"),
        F.sum("label").cast("bigint").alias("s_b"),
        F.sum("conf_milli").cast("bigint").alias("sp_b"),
    )
    return (
        bins.agg(
            F.sum("n_b").cast("bigint").alias("n"),
            F.sum("s_b").cast("bigint").alias("s"),
            # Sum_b (sp_b - 1000 s_b)^2 / n_b  — milli^2 * n units
            F.sum(
                F.expr("(sp_b - 1000 * s_b) * (sp_b - 1000 * s_b) div n_b")
            )
            .cast("bigint")
            .alias("rel_num"),
        )
        .crossJoin(
            F.broadcast(
                bins.crossJoin(
                    F.broadcast(
                        bins.agg(
                            F.sum("n_b").alias("nn"), F.sum("s_b").alias("ss")
                        )
                    )
                ).agg(
                    # Sum_b (s_b*N - S*n_b)^2 / n_b
                    F.sum(
                        F.expr(
                            "(s_b * nn - ss * n_b) * (s_b * nn - ss * n_b) div n_b"
                        )
                    )
                    .cast("bigint")
                    .alias("res_num")
                )
            )
        )
        .select(
            "n",
            "s",
            F.expr("rel_num div n").cast("bigint").alias("rel_micro"),
            F.expr("res_num * 1000000 div (n * n * n)")
            .cast("bigint")
            .alias("res_micro"),
            F.expr("s * (n - s) * 1000000 div (n * n)")
            .cast("bigint")
            .alias("unc_micro"),
            F.expr(
                "rel_num div n - res_num * 1000000 div (n * n * n)"
                " + s * (n - s) * 1000000 div (n * n)"
            )
            .cast("bigint")
            .alias("brier_micro"),
        )
    )


q_brier_decomposition.__doc__ = q_brier_decomposition.__doc__.format(bins=_BRIER_BINS)


SQL_BRIER_DECOMPOSITION = f"""
WITH scored AS (
  SELECT floor(('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT * {_BRIER_BINS} / 4294967296)::INTEGER AS bin,
         (('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT * 1000 // 4294967296)::BIGINT AS conf_milli,
         (('0x' || substr(md5(doc_id::VARCHAR), 9, 8))::BIGINT
            < ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT)::BIGINT AS label
  FROM documents
), bins AS (
  SELECT bin, count(*)::BIGINT AS n_b, sum(label)::BIGINT AS s_b,
         sum(conf_milli)::BIGINT AS sp_b
  FROM scored GROUP BY bin
), tot AS (SELECT sum(n_b)::BIGINT AS n, sum(s_b)::BIGINT AS s FROM bins),
parts AS (
  SELECT sum((sp_b - 1000 * s_b) * (sp_b - 1000 * s_b) // n_b)::BIGINT AS rel_num,
         sum((s_b * t.n - t.s * n_b) * (s_b * t.n - t.s * n_b) // n_b)::BIGINT AS res_num
  FROM bins CROSS JOIN tot t
)
SELECT t.n, t.s,
       (rel_num // t.n)::BIGINT AS rel_micro,
       (res_num * 1000000 // (t.n * t.n * t.n))::BIGINT AS res_micro,
       (t.s * (t.n - t.s) * 1000000 // (t.n * t.n))::BIGINT AS unc_micro,
       (rel_num // t.n - res_num * 1000000 // (t.n * t.n * t.n)
        + t.s * (t.n - t.s) * 1000000 // (t.n * t.n))::BIGINT AS brier_micro
FROM parts CROSS JOIN tot t
"""


# -- Wilson lower bound -------------------------------------------------------------------------------------------


def q_wilson_lower_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson-score 95% lower confidence bound on each source's
    English-document rate — the small-sample-honest way to RANK slices
    by a success rate (the 'how not to sort by average rating' bound):
    a source at 3/3 must not outrank one at 80/100. At crawl scale
    this is the host/source promotion criterion: allocate budget by
    the rate you can PROVE, not the rate you observed. IEEE 754
    requires /, *, sqrt all correctly rounded, so the identical
    expression tree over exact integer inputs yields bit-identical
    doubles in both engines; the result is then rounded to 6 decimals
    (the comparison precision).

    Scale shape: one groupBy(source) with integer partials; the bound
    is map-side math on the |sources|-row result."""
    per = (
        _read(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum((F.col("lang") == "en").cast("bigint")).cast("bigint").alias("s"),
        )
    )
    # z = 1.96: z^2 = 3.8416, z^2/2 = 1.9208, z^2/4 = 0.9604 — written as
    # the SAME literals in the oracle so the double trees are identical
    lb = (
        "(cast(s as double) / n + 1.9208 / n "
        "- 1.96 * sqrt((cast(s as double) / n) * (1.0 - cast(s as double) / n) / n "
        "+ 0.9604 / (cast(n as double) * n))) / (1.0 + 3.8416 / n)"
    )
    return per.select(
        "source",
        "n",
        "s",
        F.expr("round(cast(s as double) / n, 6)").alias("p_hat"),
        F.expr(f"round({lb}, 6)").alias("wilson_lb"),
    ).orderBy(F.col("wilson_lb").desc(), "source")


SQL_WILSON_LOWER_BOUND = """
WITH per AS (
  SELECT source, count(*)::BIGINT AS n,
         sum((lang = 'en')::BIGINT)::BIGINT AS s
  FROM documents GROUP BY source
)
SELECT source, n, s,
       round(s::DOUBLE / n, 6) AS p_hat,
       round((s::DOUBLE / n + 1.9208 / n
              - 1.96 * sqrt((s::DOUBLE / n) * (1.0 - s::DOUBLE / n) / n
                            + 0.9604 / (n::DOUBLE * n))) / (1.0 + 3.8416 / n),
             6) AS wilson_lb
FROM per ORDER BY wilson_lb DESC, source
"""


# -- at-most-one changepoint scan ----------------------------------------------------------------------------------


def q_amoc_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """At-most-one-changepoint (AMOC) scan over the daily event-value
    series: for every candidate split t the CUSUM-type statistic
    G(t) = (cum_t·T − Tot·t)² / (t·(T−t)) — proportional to
    t(T−t)(mean_L − mean_R)², the squared standardized mean gap that
    binary segmentation maximizes (Scott & Knott 1974; the inner step
    of PELT). The monitor that answers WHEN a metric shifted, where
    `ks_drift`/`psi_drift` only answer WHETHER two windows differ.
    Values are floored to whole units so every cumulative is integral
    and G's numerator/denominator are exact in both engines; at 10^10
    events rescale units (the statistic is scale-equivariant).

    Scale shape: daily groupBy with partials collapses the stream to T
    rows; ONE ordered window over those T rows forms cumulatives; the
    scan emits the full T−1-row curve (argmax = first row by score)."""
    ev = _read(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), F.floor("value").cast("bigint").alias("v")
    )
    daily = ev.groupBy("day").agg(F.sum("v").cast("bigint").alias("dv"))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    tot = daily.agg(
        F.sum("dv").cast("bigint").alias("tot"),
        F.count(F.lit(1)).cast("bigint").alias("t_days"),
    )
    cum = daily.select(
        "day",
        F.sum("dv").over(w).cast("bigint").alias("cum"),
        F.row_number().over(Window.orderBy("day")).cast("bigint").alias("t"),
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .filter(F.col("t") < F.col("t_days"))
        .select(
            "day",
            "t",
            "t_days",
            F.expr(
                "(cum * t_days - tot * t) * (cum * t_days - tot * t)"
                " div (t * (t_days - t))"
            )
            .cast("bigint")
            .alias("g_score"),
        )
        .orderBy("day")
    )


SQL_AMOC_CHANGEPOINT = """
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
         sum(CAST(floor(value) AS BIGINT))::BIGINT AS dv
  FROM events GROUP BY 1
), tot AS (
  SELECT sum(dv)::BIGINT AS tot, count(*)::BIGINT AS t_days FROM daily
), cum AS (
  SELECT day,
         sum(dv) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum,
         row_number() OVER (ORDER BY day)::BIGINT AS t
  FROM daily
)
SELECT day, t, t_days,
       ((cum * t_days - tot * t) * (cum * t_days - tot * t)
        // (t * (t_days - t)))::BIGINT AS g_score
FROM cum CROSS JOIN tot
WHERE t < t_days ORDER BY day
"""


# -- Pareto skyline ------------------------------------------------------------------------------------------------


def q_skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline (Pareto-dominance) operator (Borzsony/Kossmann/Stocker
    ICDE'01) over two maximized document objectives — length (n_chars)
    and lexical variety (distinct tokens): keep every doc not dominated
    by another that is >= on both axes and > on at least one. The
    multi-objective selection primitive behind 'pick training docs that
    are both long AND diverse' where any scalarized score imposes an
    arbitrary trade-off. Spark has no SKYLINE clause; the scale-correct
    2D composition is sort-by-x + running-max-of-y — two window frames
    (strictly-greater-x via a range frame, equal-x via a partition),
    never the quadratic all-pairs dominance join.

    Scale shape: one token-count agg, then two windows that share one
    global sort of the (x, y) projection; at 10^10 docs the projection
    is 2 ints/doc and the skyline of random data is O(log^2 n) rows."""
    d = _tokens(_docs_parallel(spark, sf_dir)).select(
        "doc_id",
        F.col("n_chars").cast("bigint").alias("x"),
        F.expr("size(array_distinct(toks))").cast("bigint").alias("y"),
    )
    # collapse to one row per distinct x first (distributed agg); the
    # ordered window then runs over |distinct x| rows, not the corpus
    xmax = d.groupBy("x").agg(F.max("y").alias("ymax"))
    w_gt = Window.orderBy(F.col("x").asc()).rangeBetween(1, Window.unboundedFollowing)
    sky_x = xmax.select(
        "x", "ymax", F.max("ymax").over(w_gt).alias("max_y_gt")
    ).filter(F.col("max_y_gt").isNull() | (F.col("ymax") > F.col("max_y_gt")))
    return (
        d.join(F.broadcast(sky_x), "x")
        .filter(F.col("y") == F.col("ymax"))
        .select("doc_id", F.col("x").alias("n_chars"), F.col("y").alias("n_distinct"))
        .orderBy("doc_id")
    )


SQL_SKYLINE_PARETO = f"""
WITH d AS (
  SELECT doc_id, n_chars::BIGINT AS x,
         len(list_distinct({_SQL_TOKS}))::BIGINT AS y
  FROM documents
), xmax AS (
  SELECT x, max(y) AS ymax FROM d GROUP BY x
), sky_x AS (
  SELECT x, ymax,
         max(ymax) OVER (ORDER BY x RANGE BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS max_y_gt
  FROM xmax
)
SELECT doc_id, d.x AS n_chars, d.y AS n_distinct
FROM d JOIN sky_x USING (x)
WHERE (max_y_gt IS NULL OR ymax > max_y_gt) AND d.y = ymax
ORDER BY doc_id
"""


# -- Katz centrality -----------------------------------------------------------------------------------------------

_KATZ_ITERS = 3


def q_katz_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncated Katz centrality (Katz 1953) on the host graph:
    x_(k+1)(v) = 1 + alpha * sum over in-neighbors u of x_k(u), run
    {iters} rounds with alpha = 1/4 — counts attenuated walks of
    length <= {iters} INTO each node. Complements the spectral family
    (PageRank normalizes by out-degree, HITS/SALSA by mutual
    reinforcement); Katz is the one that rewards sheer reachable
    volume, the signal used for link-farm AMPLIFICATION (a farm of
    leaf pages raises Katz but not PageRank, since PR divides by the
    farm's out-degree — the two diverging IS the detector). Integer
    milli arithmetic: the quarter-attenuation is applied once per
    round to the integral neighbor sum, so both engines truncate
    identically.

    Scale shape: per round one join (ranks into edges on src) + one
    groupBy(dst) with partials + a left join back over the node set —
    the same iterated shuffle skeleton as PageRank, checkpointed
    per round to keep plans flat."""
    edges = _pagerank_edges(spark, sf_dir)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    x = nodes.select("node", F.lit(1000).cast("bigint").alias("katz_milli"))
    for _ in range(_KATZ_ITERS):
        contrib = (
            edges.join(
                x.select(F.col("node").alias("src"), F.col("katz_milli").alias("xs")),
                "src",
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("xs").cast("bigint").alias("insum"))
        )
        x = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (F.lit(1000) + F.expr("coalesce(insum, 0) div 4"))
                .cast("bigint")
                .alias("katz_milli"),
            )
            .localCheckpoint()
        )
    return x.orderBy("node")


q_katz_centrality.__doc__ = q_katz_centrality.__doc__.format(iters=_KATZ_ITERS)


def _sql_katz_iter(prev: str, cur: str) -> str:
    return f"""{cur} AS (
  SELECT n.node,
         (1000 + coalesce(c.insum, 0) // 4)::BIGINT AS katz_milli
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node, sum(p.katz_milli)::BIGINT AS insum
    FROM edges e JOIN {prev} p ON e.src = p.node GROUP BY e.dst
  ) c ON n.node = c.node
)"""


SQL_KATZ_CENTRALITY = f"""
WITH edges AS (
  SELECT DISTINCT user_id % {_PR_NODES} AS src,
         ('0x' || substr(md5(event_id::VARCHAR), 1, 4))::BIGINT % {_PR_NODES} AS dst
  FROM events
  WHERE user_id % {_PR_NODES}
        <> ('0x' || substr(md5(event_id::VARCHAR), 1, 4))::BIGINT % {_PR_NODES}
), nodes AS (
  SELECT src AS node FROM edges UNION SELECT dst FROM edges
), x0 AS (
  SELECT node, 1000::BIGINT AS katz_milli FROM nodes
),
{_sql_katz_iter('x0', 'x1')},
{_sql_katz_iter('x1', 'x2')},
{_sql_katz_iter('x2', 'x3')}
SELECT node, katz_milli FROM x3 ORDER BY node
"""


# -- dictionary front coding ---------------------------------------------------------------------------------------

_FC_BLOCK = 16
_FC_MAXLEN = 24


def q_front_coding_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term-dictionary front coding (Witten/Moffat/Bell 'Managing
    Gigabytes' ch.4): the sorted dictionary is cut into {block}-term
    blocks; each block head is stored verbatim, every other term as
    (shared-prefix len, suffix len, suffix bytes) — 2 header bytes +
    the unshared tail. Completes the index-storage family on the
    DICTIONARY side (postings got varint/EF/FOR/Roaring): at 10^8+
    distinct terms the dictionary itself is gigabytes and front coding
    is the standard 2-4x. The shared-prefix length is computed as a
    sum of prefix-equality indicators over k = 1..{maxlen} — exact in
    both engines because prefix equality is monotone in k (no loop,
    no UDF).

    Scale shape: vocab agg (one shuffle), ONE ordered window supplying
    lag + row_number together, per-block groupBy; output is
    O(vocab/{block}) rows."""
    vocab = (
        _tokens(_docs_parallel(spark, sf_dir))
        .select(F.explode("toks").alias("term"))
        .distinct()
    )
    w = Window.orderBy("term")
    plen = " + ".join(
        f"cast(substring(prev, 1, {k}) = substring(term, 1, {k}) as int)"
        for k in range(1, _FC_MAXLEN + 1)
    )
    rows = vocab.select(
        "term",
        F.lag("term").over(w).alias("prev"),
        ((F.row_number().over(w) - 1) - ((F.row_number().over(w) - 1) % _FC_BLOCK))
        .alias("blk"),
    ).withColumn(
        "plen",
        F.when(F.col("prev").isNull(), F.lit(0)).otherwise(F.expr(f"({plen})")),
    )
    # the block head resets the prefix chain: stored verbatim
    head_reset = rows.withColumn(
        "head",
        (F.row_number().over(Window.partitionBy("blk").orderBy("term")) == 1),
    ).withColumn(
        "entry_bytes",
        F.when(F.col("head"), 1 + F.length("term"))
        .otherwise(2 + F.length("term") - F.col("plen"))
        .cast("bigint"),
    )
    return (
        head_reset.groupBy("blk")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_terms"),
            F.sum(F.expr("1 + length(term)")).cast("bigint").alias("raw_bytes"),
            F.sum("entry_bytes").cast("bigint").alias("fc_bytes"),
        )
        .withColumn(
            "savings_ppm",
            F.expr("(raw_bytes - fc_bytes) * 1000000 div raw_bytes").cast("bigint"),
        )
        .orderBy("blk")
    )


q_front_coding_bytes.__doc__ = q_front_coding_bytes.__doc__.format(
    block=_FC_BLOCK, maxlen=_FC_MAXLEN
)


def _sql_front_coding() -> str:
    plen = " + ".join(
        f"(substr(prev, 1, {k}) = substr(term, 1, {k}))::INTEGER"
        for k in range(1, _FC_MAXLEN + 1)
    )
    return f"""
WITH toks AS (SELECT {_SQL_TOKS} AS toks FROM documents),
vocab AS (SELECT DISTINCT unnest(toks) AS term FROM toks),
seq AS (
  SELECT term, lag(term) OVER (ORDER BY term) AS prev,
         (row_number() OVER (ORDER BY term) - 1)
           - ((row_number() OVER (ORDER BY term) - 1) % {_FC_BLOCK}) AS blk
  FROM vocab
), entries AS (
  SELECT term, blk,
         row_number() OVER (PARTITION BY blk ORDER BY term) = 1 AS head,
         CASE WHEN prev IS NULL THEN 0 ELSE ({plen}) END AS plen
  FROM seq
), sized AS (
  SELECT blk, term,
         CASE WHEN head THEN 1 + length(term)
              ELSE 2 + length(term) - plen END::BIGINT AS entry_bytes
  FROM entries
)
SELECT blk, count(*)::BIGINT AS n_terms,
       sum(1 + length(term))::BIGINT AS raw_bytes,
       sum(entry_bytes)::BIGINT AS fc_bytes,
       ((sum(1 + length(term)) - sum(entry_bytes)) * 1000000
        // sum(1 + length(term)))::BIGINT AS savings_ppm
FROM sized GROUP BY blk ORDER BY blk
"""


SQL_FRONT_CODING_BYTES = _sql_front_coding()


# -- Theil-Sen robust trend ------------------------------------------------------------------------------------------


def q_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen estimator (Theil 1950/Sen 1968) of the daily
    event-volume trend: the MEDIAN of all pairwise slopes
    (x_j - x_i)/(j - i) — robust to ~29% outliers where OLS is
    wrecked by one flash-crowd day. The trend companion to
    `amoc_changepoint` (level shift) and `rolling_stats` (local
    noise): the number a capacity planner actually extrapolates.
    Slopes are integer milli-units (both engines truncate identically,
    including negatives — verified -7 div 2 = -3 in both); the median
    is the lower median picked by row_number, so ties are exact.

    Scale shape: the stream collapses to T daily rows (bounded by the
    calendar, NOT the corpus) before the O(T^2) pair join — at any
    corpus size the pair frame is tiny; one window picks the median."""
    daily = (
        _read(spark, sf_dir, "events")
        .select(F.to_date("ts").alias("day"), F.floor("value").cast("bigint").alias("v"))
        .groupBy("day")
        .agg(F.sum("v").cast("bigint").alias("sv"), F.count(F.lit(1)).alias("c"))
        .select("day", F.expr("sv div c").cast("bigint").alias("x"))
        .withColumn("t", F.row_number().over(Window.orderBy("day")).cast("bigint"))
        .localCheckpoint()
    )
    a, b = daily.alias("a"), daily.alias("b")
    slopes = (
        a.join(b, F.col("b.t") > F.col("a.t"))
        .select(
            F.expr("(b.x - a.x) * 1000 div (b.t - a.t)").cast("bigint").alias("s")
        )
    )
    n = slopes.agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
    ranked = slopes.withColumn(
        "r", F.row_number().over(Window.orderBy("s")).cast("bigint")
    )
    return (
        ranked.crossJoin(F.broadcast(n))
        .filter(F.col("r") == F.expr("(n_pairs + 1) div 2"))
        .select(
            "n_pairs",
            F.col("s").alias("slope_milli_per_day"),
        )
    )


SQL_THEIL_SEN_TREND = """
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
         (sum(CAST(floor(value) AS BIGINT)) // count(*))::BIGINT AS x
  FROM events GROUP BY 1
), seq AS (
  SELECT x, row_number() OVER (ORDER BY day)::BIGINT AS t FROM daily
), slopes AS (
  SELECT ((b.x - a.x) * 1000 // (b.t - a.t))::BIGINT AS s
  FROM seq a JOIN seq b ON b.t > a.t
), n AS (SELECT count(*)::BIGINT AS n_pairs FROM slopes),
ranked AS (SELECT s, row_number() OVER (ORDER BY s)::BIGINT AS r FROM slopes)
SELECT n_pairs, s AS slope_milli_per_day
FROM ranked CROSS JOIN n WHERE r = (n_pairs + 1) // 2
"""


# -- autocorrelation function ----------------------------------------------------------------------------------------

_ACF_MAXLAG = 7


def q_acf_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample autocorrelation of the daily event-volume series at lags
    1..{maxlag} (Box-Jenkins identification step): the weekly-rhythm
    detector — acf(7) >> acf(1..6) means weekday seasonality a naive
    recrawl scheduler would alias. Exact integers end to end: with
    daily means x_t, n days and total S, each term uses the centered
    value scaled by n (n*x_t - S), so acf_milli = 1000 * sum of
    centered cross-products div the centered sum of squares — both
    engines truncate identically (negatives included).

    Scale shape: the corpus collapses to the T-day rollup (bounded by
    calendar); the lag frame is a T x {maxlag} self-join on t + k over
    that tiny rollup; 1-row centering stats broadcast in."""
    daily = (
        _read(spark, sf_dir, "events")
        .select(F.to_date("ts").alias("day"), F.floor("value").cast("bigint").alias("v"))
        .groupBy("day")
        .agg(F.sum("v").cast("bigint").alias("sv"), F.count(F.lit(1)).alias("c"))
        .select("day", F.expr("sv div c").cast("bigint").alias("x"))
        .withColumn("t", F.row_number().over(Window.orderBy("day")).cast("bigint"))
        .localCheckpoint()
    )
    stats = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("s"),
        # den scaled by n^2: Sum (n*x - S)^2
    )
    lags = spark.range(1, _ACF_MAXLAG + 1).select(F.col("id").cast("bigint").alias("lag"))
    a, b = daily.alias("a"), daily.alias("b")
    pairs = (
        lags.join(a, F.lit(True))
        .join(b, F.col("b.t") == F.col("a.t") + F.col("lag"))
        .crossJoin(F.broadcast(stats))
        .select(
            "lag",
            F.expr("(n * a.x - s) * (n * b.x - s)").cast("bigint").alias("xprod"),
        )
    )
    den = (
        daily.crossJoin(F.broadcast(stats))
        .agg(F.sum(F.expr("(n * x - s) * (n * x - s)")).cast("bigint").alias("den"))
    )
    return (
        pairs.groupBy("lag")
        .agg(F.sum("xprod").cast("bigint").alias("num"))
        .crossJoin(F.broadcast(den))
        .select("lag", F.expr("num * 1000 div den").cast("bigint").alias("acf_milli"))
        .orderBy("lag")
    )


q_acf_lags.__doc__ = q_acf_lags.__doc__.format(maxlag=_ACF_MAXLAG)


SQL_ACF_LAGS = f"""
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
         (sum(CAST(floor(value) AS BIGINT)) // count(*))::BIGINT AS x
  FROM events GROUP BY 1
), seq AS (
  SELECT x, row_number() OVER (ORDER BY day)::BIGINT AS t FROM daily
), stats AS (
  SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS s FROM seq
), den AS (
  SELECT sum((n * x - s) * (n * x - s))::BIGINT AS den
  FROM seq CROSS JOIN stats
), lags AS (
  SELECT unnest(range(1, {_ACF_MAXLAG + 1}))::BIGINT AS lag
), pairs AS (
  SELECT lag, ((n * a.x - s) * (n * b.x - s))::BIGINT AS xprod
  FROM lags, seq a
  JOIN seq b ON b.t = a.t + lag
  CROSS JOIN stats
)
SELECT lag, (sum(xprod) * 1000 // den)::BIGINT AS acf_milli
FROM pairs CROSS JOIN den GROUP BY lag, den ORDER BY lag
"""


# -- ordinal patterns ---------------------------------------------------------------------------------------------


def q_ordinal_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordinal-pattern census of the daily series (Bandt & Pompe PRL
    2002, the basis of permutation entropy): every consecutive triple
    of daily means maps to one of six order patterns (rising, falling,
    peak, valley, ...); the pattern histogram is a model-free
    complexity/determinism probe — white noise spreads mass evenly,
    trends and cycles concentrate it. Ties break toward the earlier
    day (the standard convention), encoded as three <=-comparisons, so
    the census is integer-exact in both engines.

    Scale shape: corpus -> T-day rollup (calendar-bounded) -> two
    leads over ONE ordered window -> 6-row groupBy; nothing about the
    corpus size survives past the first agg."""
    daily = (
        _read(spark, sf_dir, "events")
        .select(F.to_date("ts").alias("day"), F.floor("value").cast("bigint").alias("v"))
        .groupBy("day")
        .agg(F.sum("v").cast("bigint").alias("sv"), F.count(F.lit(1)).alias("c"))
        .select("day", F.expr("sv div c").cast("bigint").alias("x"))
    )
    w = Window.orderBy("day")
    tri = (
        daily.select(
            "x",
            F.lead("x", 1).over(w).alias("y"),
            F.lead("x", 2).over(w).alias("z"),
        )
        .filter(F.col("z").isNotNull())
        .select(
            F.expr(
                "cast(x <= y as int) * 4 + cast(x <= z as int) * 2 + cast(y <= z as int)"
            ).alias("pattern")
        )
    )
    counts = (
        tri.groupBy("pattern")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .localCheckpoint()  # 6 rows; stops the total from re-running the rollup
    )
    tot = counts.agg(F.sum("cnt").cast("bigint").alias("n_tri"))
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "pattern",
            "cnt",
            F.expr("cnt * 1000000 div n_tri").cast("bigint").alias("share_ppm"),
        )
        .orderBy("pattern")
    )


SQL_ORDINAL_PATTERNS = """
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
         (sum(CAST(floor(value) AS BIGINT)) // count(*))::BIGINT AS x
  FROM events GROUP BY 1
), tri AS (
  SELECT x, lead(x, 1) OVER (ORDER BY day) AS y, lead(x, 2) OVER (ORDER BY day) AS z
  FROM daily
), pat AS (
  SELECT (x <= y)::INTEGER * 4 + (x <= z)::INTEGER * 2 + (y <= z)::INTEGER AS pattern
  FROM tri WHERE z IS NOT NULL
), counts AS (
  SELECT pattern, count(*)::BIGINT AS cnt FROM pat GROUP BY pattern
), tot AS (SELECT sum(cnt)::BIGINT AS n_tri FROM counts)
SELECT pattern, cnt, (cnt * 1000000 // n_tri)::BIGINT AS share_ppm
FROM counts CROSS JOIN tot ORDER BY pattern
"""


# -- maximal marginal relevance -------------------------------------------------------------------------------------

_MMR_POOL = 32
_MMR_K = 8


def q_mmr_diversify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
    SIGIR'98), lambda = 1/2, squared-Euclidean form: greedily pick {k}
    of the top-{pool} candidates nearest the query (vec 0), each step
    maximizing (min sq-distance to the already-picked set) minus
    (sq-distance to the query) — the diversity selector that keeps a
    RAG context or a dedup-aware training batch from being {k}
    near-copies of the same best hit. Embedding components are
    quantized once to integer milli-units (round(x*1000): a single
    correctly-rounded double multiply + the shared half-away-from-zero
    rule, so both engines quantize identically); every distance and
    comparison after that is exact integer arithmetic — the greedy
    trajectory is bit-stable at any scale, with vec_id tie-breaks.

    Scale shape: one corpus scan -> TakeOrdered {pool} (the O(corpus)
    stage); the pool^2 distance matrix and {k}-step greedy are O(1)
    driver work on the bounded shortlist, like ann_ivf's centroid
    training."""
    qint = "transform(embedding, x -> cast(round(cast(x as double) * 1000) as bigint))"
    e = _read(spark, sf_dir, "embeddings").select(
        "vec_id", F.expr(qint).alias("q")
    )
    ref = e.filter(F.col("vec_id") == 0).select(F.col("q").alias("rq"))
    sqd = (
        "aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)), "
        "cast(0 as bigint), (acc, v) -> acc + v)"
    )
    cand = (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(ref))
        .select(
            "vec_id",
            "q",
            F.expr(sqd.format(a="q", b="rq")).cast("bigint").alias("d2q"),
        )
        .orderBy(F.asc("d2q"), F.asc("vec_id"))
        .limit(_MMR_POOL)
        .localCheckpoint()
    )
    a = cand.select(
        F.col("vec_id").alias("va"), F.col("q").alias("qa"), F.col("d2q").alias("da")
    )
    b = cand.select(F.col("vec_id").alias("vb"), F.col("q").alias("qb"))
    pairs = (
        a.join(b, F.col("va") != F.col("vb"))
        .select(
            "va", "da", "vb",
            F.expr(sqd.format(a="qa", b="qb")).cast("bigint").alias("d2p"),
        )
        .collect()
    )
    d2q = {}
    d2 = {}
    for r in pairs:
        d2q[r["va"]] = r["da"]
        d2[(r["va"], r["vb"])] = r["d2p"]
    picked = []
    remaining = set(d2q)
    out_rows = []
    for step in range(1, _MMR_K + 1):
        if step == 1:
            best = min(remaining, key=lambda v: (d2q[v], v))
            score = -d2q[best]
        else:
            def key(v):
                mind = min(d2[(v, p)] for p in picked)
                return (-(mind - d2q[v]), v)
            best = min(remaining, key=key)
            score = min(d2[(best, p)] for p in picked) - d2q[best]
        picked.append(best)
        remaining.discard(best)
        out_rows.append((step, int(best), int(d2q[best]), int(score)))
    return spark.createDataFrame(
        out_rows, "step int, vec_id bigint, d2q bigint, score2x bigint"
    ).orderBy("step")


q_mmr_diversify.__doc__ = q_mmr_diversify.__doc__.format(k=_MMR_K, pool=_MMR_POOL)


def _sql_mmr() -> str:
    qint = "list_transform(embedding, x -> round(x::DOUBLE * 1000)::BIGINT)"
    sqd = (
        "list_sum(list_transform(list_zip({a}, {b}), "
        "p -> (p[1] - p[2]) * (p[1] - p[2])))::BIGINT"
    )
    parts = [
        f"""qv AS MATERIALIZED (
  SELECT vec_id, {qint} AS q FROM embeddings
), cand AS MATERIALIZED (
  SELECT c.vec_id, c.q, {sqd.format(a='c.q', b='r.q')} AS d2q
  FROM qv c CROSS JOIN (SELECT q FROM qv WHERE vec_id = 0) r
  WHERE c.vec_id <> 0
  ORDER BY d2q ASC, c.vec_id ASC LIMIT {_MMR_POOL}
), sims AS MATERIALIZED (
  SELECT x.vec_id AS va, y.vec_id AS vb, {sqd.format(a='x.q', b='y.q')} AS d2p
  FROM cand x JOIN cand y ON x.vec_id <> y.vec_id
), p1 AS (
  SELECT 1 AS step, vec_id, d2q, -d2q AS score2x
  FROM cand ORDER BY d2q ASC, vec_id ASC LIMIT 1
), sel1 AS MATERIALIZED (SELECT * FROM p1)"""
    ]
    for k in range(2, _MMR_K + 1):
        parts.append(
            f"""p{k} AS (
  SELECT {k} AS step, vec_id, d2q, score2x FROM (
    SELECT c.vec_id, c.d2q, min(s.d2p) - c.d2q AS score2x
    FROM cand c
    JOIN sims s ON s.va = c.vec_id
    JOIN sel{k - 1} p ON s.vb = p.vec_id
    WHERE c.vec_id NOT IN (SELECT vec_id FROM sel{k - 1})
    GROUP BY c.vec_id, c.d2q
  ) ORDER BY score2x DESC, vec_id ASC LIMIT {1}
), sel{k} AS MATERIALIZED (SELECT * FROM sel{k - 1} UNION ALL SELECT * FROM p{k})"""
        )
    body = ",\n".join(parts)
    return f"WITH {body}\nSELECT step, vec_id, d2q, score2x FROM sel{_MMR_K} ORDER BY step"


SQL_MMR_DIVERSIFY = _sql_mmr()


# -- chi-square independence ------------------------------------------------------------------------------------------


def q_chisq_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square test of independence between document
    language and source: chi2 = sum over cells of (o - rc/N)^2/(rc/N),
    evaluated per cell as (o*N - r*c)^2 / (r*c*N) on exact integers —
    the distribution-shift alarm a multi-source ingest runs per
    snapshot (a source whose language mix diverges from the corpus-wide
    mix inflates its cells). Complements `mutual_information` (effect
    size in nats, different pair) with the classical test statistic;
    dof = (|langs|-1)(|sources|-1) reported so the reader can look up
    the critical value. Integer-exact micro units; truncation identical
    in both engines.

    Scale shape: one (lang, source) cell groupBy with partials, tiny
    marginal re-aggs broadcast back in, 1-row output."""
    docs = _read(spark, sf_dir, "documents").select("lang", "source")
    cells = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("o")
    )
    rowm = cells.groupBy("lang").agg(F.sum("o").cast("bigint").alias("r"))
    colm = cells.groupBy("source").agg(F.sum("o").cast("bigint").alias("c"))
    tot = cells.agg(F.sum("o").cast("bigint").alias("n"))
    return (
        cells.join(F.broadcast(rowm), "lang")
        .join(F.broadcast(colm), "source")
        .crossJoin(F.broadcast(tot))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_cells"),
            F.countDistinct("lang").cast("bigint").alias("n_langs"),
            F.countDistinct("source").cast("bigint").alias("n_sources"),
            F.max("n").cast("bigint").alias("n"),
            F.sum(F.expr("(o * n - r * c) * (o * n - r * c) div (r * c)"))
            .cast("bigint")
            .alias("u"),
        )
        .select(
            "n",
            "n_cells",
            F.expr("(n_langs - 1) * (n_sources - 1)").cast("bigint").alias("dof"),
            F.expr("u * 1000000 div n").cast("bigint").alias("chi2_micro"),
        )
    )


SQL_CHISQ_INDEPENDENCE = """
WITH cells AS (
  SELECT lang, source, count(*)::BIGINT AS o FROM documents GROUP BY lang, source
), rowm AS (SELECT lang, sum(o)::BIGINT AS r FROM cells GROUP BY lang),
colm AS (SELECT source, sum(o)::BIGINT AS c FROM cells GROUP BY source),
tot AS (SELECT sum(o)::BIGINT AS n FROM cells),
agg AS (
  SELECT count(*)::BIGINT AS n_cells,
         count(DISTINCT cells.lang)::BIGINT AS n_langs,
         count(DISTINCT cells.source)::BIGINT AS n_sources,
         max(n)::BIGINT AS n,
         sum((o * n - r * c) * (o * n - r * c) // (r * c))::BIGINT AS u
  FROM cells
  JOIN rowm ON cells.lang = rowm.lang
  JOIN colm ON cells.source = colm.source
  CROSS JOIN tot
)
SELECT n, n_cells,
       ((n_langs - 1) * (n_sources - 1))::BIGINT AS dof,
       (u * 1000000 // n)::BIGINT AS chi2_micro
FROM agg
"""


# -- association-rule lift ----------------------------------------------------------------------------------------------


def q_assoc_rules_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules over user event baskets (Agrawal & Srikant
    VLDB'94 measures, pairwise): for every ordered event-type pair
    (a -> b), support = P(a,b), confidence = P(b|a), lift =
    P(a,b)/(P(a)P(b)) — the co-behavior miner ('users who search also
    convert?') and, on a crawl, the fetch-pattern correlator. Baskets
    are per-user DISTINCT type sets, so the pair join is bounded by
    |types|^2 per user, never events^2; all three measures are exact
    integer ratios in ppm / milli.

    Scale shape: distinct (user, type) (one shuffle), per-user
    self-join on the tiny type set, per-type marginals broadcast back;
    |types|^2 output rows."""
    bask = (
        _read(spark, sf_dir, "events")
        .select("user_id", "event_type")
        .distinct()
        .localCheckpoint()
    )
    n_users = bask.agg(
        F.countDistinct("user_id").cast("bigint").alias("n_users")
    )
    marg = bask.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    a = bask.select(F.col("user_id").alias("u"), F.col("event_type").alias("ante"))
    b = bask.select(F.col("user_id").alias("u"), F.col("event_type").alias("cons"))
    pair = (
        a.join(b, "u")
        .filter(F.col("ante") != F.col("cons"))
        .groupBy("ante", "cons")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c_ab"))
    )
    return (
        pair.join(
            F.broadcast(marg.select(F.col("event_type").alias("ante"), F.col("cnt").alias("c_a"))),
            "ante",
        )
        .join(
            F.broadcast(marg.select(F.col("event_type").alias("cons"), F.col("cnt").alias("c_b"))),
            "cons",
        )
        .crossJoin(F.broadcast(n_users))
        .select(
            "ante",
            "cons",
            "c_ab",
            F.expr("c_ab * 1000000 div n_users").cast("bigint").alias("support_ppm"),
            F.expr("c_ab * 1000 div c_a").cast("bigint").alias("confidence_milli"),
            F.expr("c_ab * n_users * 1000 div (c_a * c_b)")
            .cast("bigint")
            .alias("lift_milli"),
        )
        .orderBy("ante", "cons")
    )


SQL_ASSOC_RULES_LIFT = """
WITH bask AS (
  SELECT DISTINCT user_id, event_type FROM events
), n AS (SELECT count(DISTINCT user_id)::BIGINT AS n_users FROM bask),
marg AS (SELECT event_type, count(*)::BIGINT AS cnt FROM bask GROUP BY event_type),
pair AS (
  SELECT a.event_type AS ante, b.event_type AS cons, count(*)::BIGINT AS c_ab
  FROM bask a JOIN bask b ON a.user_id = b.user_id AND a.event_type <> b.event_type
  GROUP BY 1, 2
)
SELECT ante, cons, c_ab,
       (c_ab * 1000000 // n_users)::BIGINT AS support_ppm,
       (c_ab * 1000 // ma.cnt)::BIGINT AS confidence_milli,
       (c_ab * n_users * 1000 // (ma.cnt * mb.cnt))::BIGINT AS lift_milli
FROM pair
JOIN marg ma ON pair.ante = ma.event_type
JOIN marg mb ON pair.cons = mb.event_type
CROSS JOIN n
ORDER BY ante, cons
"""


# -- sort-for-RLE layout benefit ----------------------------------------------------------------------------------

_RLE_SHARD = 10000


def q_sort_rle_benefit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantifies the encoding win of sorting before writing: for the
    low-cardinality columns (lang, source), count the value RUNS a
    run-length/dictionary encoder sees in natural doc_id order vs
    sorted order (where runs = distinct values) — the concrete number
    behind the 'sort your partitions' advice that `zorder_keys` and
    `write_shard_plan` assume (Parquet RLE_DICTIONARY page size is
    ~linear in runs). Runs are counted per {shard}-row shard, matching
    the row-group granularity an encoder actually works in, so the
    count is shuffle-free and the statistic is exactly what a writer
    would produce.

    Scale shape: per column one lag window PARTITIONED by shard (no
    global sort), one agg; two columns unioned — map-side otherwise."""
    docs = _read(spark, sf_dir, "documents").select("doc_id", "lang", "source")

    def runs_for(col: str) -> DataFrame:
        w = Window.partitionBy("shard").orderBy("doc_id")
        base = docs.select(
            "doc_id", F.col(col).alias("v"),
            (F.col("doc_id") - F.col("doc_id") % _RLE_SHARD).alias("shard"),
        )
        nat = base.select(
            F.when(
                F.lag("v").over(w).isNull() | (F.lag("v").over(w) != F.col("v")), 1
            )
            .otherwise(0)
            .alias("newrun")
        ).agg(F.sum("newrun").cast("bigint").alias("runs_natural"))
        srt = base.agg(
            F.countDistinct("v").cast("bigint").alias("runs_sorted"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        )
        return (
            nat.crossJoin(F.broadcast(srt))
            .select(
                F.lit(col).alias("column"),
                "n_rows",
                "runs_natural",
                "runs_sorted",
                F.expr("runs_sorted * 1000000 div runs_natural")
                .cast("bigint")
                .alias("sorted_runs_ppm"),
            )
        )

    return runs_for("lang").unionAll(runs_for("source")).orderBy("column")


q_sort_rle_benefit.__doc__ = q_sort_rle_benefit.__doc__.format(shard=_RLE_SHARD)


def _sql_sort_rle() -> str:
    parts = []
    for col in ("lang", "source"):
        parts.append(
            f"""SELECT '{col}' AS "column", n_rows, runs_natural, runs_sorted,
       (runs_sorted * 1000000 // runs_natural)::BIGINT AS sorted_runs_ppm
FROM (
  SELECT sum(CASE WHEN prev IS NULL OR prev <> v THEN 1 ELSE 0 END)::BIGINT AS runs_natural
  FROM (
    SELECT {col} AS v,
           lag({col}) OVER (PARTITION BY doc_id - doc_id % {_RLE_SHARD} ORDER BY doc_id) AS prev
    FROM documents
  )
) CROSS JOIN (
  SELECT count(DISTINCT {col})::BIGINT AS runs_sorted, count(*)::BIGINT AS n_rows
  FROM documents
)"""
        )
    return "SELECT * FROM (" + " UNION ALL ".join(parts) + ') ORDER BY "column"'


SQL_SORT_RLE_BENEFIT = _sql_sort_rle()


# -- histogram join-cardinality estimate ---------------------------------------------------------------------------

_JCE_BUCKETS = 64


def q_join_card_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram-based join cardinality estimation, audited against
    truth: the self-equi-join of events on user_id has TRUE cardinality
    sum over keys of c_k^2; an optimizer that only keeps a {b}-bucket
    hash histogram estimates it as sum over buckets of h_b^2/d_b
    (uniformity within bucket — Selinger-style). The output pins the
    estimator's skew bias in ppm — exactly the calibration a
    cost-based planner (or our own broadcast-vs-shuffle choice in
    skew_salt_plan) needs before trusting histogram estimates at
    10^10 rows. Buckets are md5-derived so both engines bucket
    identically; everything is integer.

    Scale shape: one per-key count (the only data shuffle), then a
    {b}-row bucket rollup; truth and estimate fold in the same pass."""
    per_key = (
        _read(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .withColumn(
            "bucket",
            F.expr(
                "cast(conv(substring(md5(cast(user_id as string)), 1, 4), 16, 10) as bigint)"
            )
            % _JCE_BUCKETS,
        )
    )
    buckets = per_key.groupBy("bucket").agg(
        F.sum("c").cast("bigint").alias("h"),
        F.count(F.lit(1)).cast("bigint").alias("d"),
        F.sum(F.expr("c * c")).cast("bigint").alias("truth_b"),
    )
    return buckets.agg(
        F.lit(_JCE_BUCKETS).cast("int").alias("n_buckets"),
        F.sum("truth_b").cast("bigint").alias("true_card"),
        F.sum(F.expr("h * h div d")).cast("bigint").alias("est_card"),
    ).select(
        "n_buckets",
        "true_card",
        "est_card",
        F.expr("(est_card - true_card) * 1000000 div true_card")
        .cast("bigint")
        .alias("bias_ppm"),
    )


q_join_card_estimate.__doc__ = q_join_card_estimate.__doc__.format(b=_JCE_BUCKETS)


SQL_JOIN_CARD_ESTIMATE = f"""
WITH per_key AS (
  SELECT user_id, count(*)::BIGINT AS c,
         ('0x' || substr(md5(user_id::VARCHAR), 1, 4))::BIGINT % {_JCE_BUCKETS} AS bucket
  FROM events GROUP BY user_id
), buckets AS (
  SELECT bucket, sum(c)::BIGINT AS h, count(*)::BIGINT AS d,
         sum(c * c)::BIGINT AS truth_b
  FROM per_key GROUP BY bucket
)
SELECT {_JCE_BUCKETS}::INTEGER AS n_buckets,
       sum(truth_b)::BIGINT AS true_card,
       sum(h * h // d)::BIGINT AS est_card,
       ((sum(h * h // d) - sum(truth_b)) * 1000000 // sum(truth_b))::BIGINT AS bias_ppm
FROM buckets
"""


# -- lead-lag cross-series regression --------------------------------------------------------------------------------

_LLB_MAXLAG = 3


def q_lead_lag_beta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lagged cross-series regression between event types: for every
    ordered type pair (a, b) and lag k in 1..{maxlag}, the slope of
    regressing b's daily count at day t+k on a's at day t —
    beta = Cov(x_t, y_(t+k)) / Var(x) on the common T-day grid
    (missing days count 0, as they truly are). The lead-lag detector
    behind 'does search volume LEAD conversions by two days?' — and on
    a crawl, whether discovery of host A's pages predicts later load
    on host B. The `acf_lags` machinery generalized across series:
    integer-exact via n-scaled centered values, truncating division
    identical in both engines.

    Scale shape: corpus -> (day, type) grid (calendar x |types|,
    bounded), per-type centering stats, a lag join on the tiny grid;
    |types|^2 * {maxlag} output rows."""
    ev = _read(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "event_type"
    )
    days = ev.select("day").distinct()
    types = ev.select("event_type").distinct()
    grid = days.crossJoin(types)
    counts = ev.groupBy("day", "event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    series = (
        grid.join(counts, ["day", "event_type"], "left")
        .select(
            "event_type",
            "day",
            F.coalesce("c", F.lit(0)).cast("bigint").alias("x"),
        )
        .withColumn(
            "t",
            F.row_number()
            .over(Window.partitionBy("event_type").orderBy("day"))
            .cast("bigint"),
        )
        .localCheckpoint()
    )
    stats = series.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("s"),
    )
    centered = (
        series.join(F.broadcast(stats), "event_type")
        .select(
            "event_type", "t", F.expr("n * x - s").cast("bigint").alias("cx"), "n"
        )
        .localCheckpoint()
    )
    denx = centered.groupBy("event_type").agg(
        F.sum(F.expr("cx * cx")).cast("bigint").alias("den")
    )
    lags = spark.range(1, _LLB_MAXLAG + 1).select(
        F.col("id").cast("bigint").alias("lag")
    )
    a = centered.select(
        F.col("event_type").alias("ta"), F.col("t").alias("i"), F.col("cx").alias("ca")
    )
    b = centered.select(
        F.col("event_type").alias("tb"), F.col("t").alias("j"), F.col("cx").alias("cb")
    )
    num = (
        lags.join(a, F.lit(True))
        .join(b, (F.col("j") == F.col("i") + F.col("lag")) & (F.col("ta") != F.col("tb")))
        .groupBy("ta", "tb", "lag")
        .agg(F.sum(F.expr("ca * cb")).cast("bigint").alias("num"))
    )
    return (
        num.join(
            F.broadcast(denx.select(F.col("event_type").alias("ta"), "den")), "ta"
        )
        .select(
            "ta",
            "tb",
            "lag",
            F.expr("num * 1000 div den").cast("bigint").alias("beta_milli"),
        )
        .orderBy("ta", "tb", "lag")
    )


q_lead_lag_beta.__doc__ = q_lead_lag_beta.__doc__.format(maxlag=_LLB_MAXLAG)


SQL_LEAD_LAG_BETA = f"""
WITH ev AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type FROM events
), days AS (SELECT DISTINCT day FROM ev),
types AS (SELECT DISTINCT event_type FROM ev),
counts AS (SELECT day, event_type, count(*)::BIGINT AS c FROM ev GROUP BY 1, 2),
series AS (
  SELECT t.event_type, d.day, coalesce(c.c, 0)::BIGINT AS x,
         row_number() OVER (PARTITION BY t.event_type ORDER BY d.day)::BIGINT AS t
  FROM days d CROSS JOIN types t
  LEFT JOIN counts c ON c.day = d.day AND c.event_type = t.event_type
), stats AS (
  SELECT event_type, count(*)::BIGINT AS n, sum(x)::BIGINT AS s
  FROM series GROUP BY event_type
), centered AS (
  SELECT series.event_type, series.t, (n * x - s)::BIGINT AS cx
  FROM series JOIN stats ON series.event_type = stats.event_type
), denx AS (
  SELECT event_type, sum(cx * cx)::BIGINT AS den FROM centered GROUP BY event_type
), lags AS (SELECT unnest(range(1, {_LLB_MAXLAG + 1}))::BIGINT AS lag),
num AS (
  SELECT a.event_type AS ta, b.event_type AS tb, lag,
         sum(a.cx * b.cx)::BIGINT AS num
  FROM lags, centered a
  JOIN centered b ON b.t = a.t + lag AND a.event_type <> b.event_type
  GROUP BY 1, 2, 3
)
SELECT ta, tb, lag, (num * 1000 // den)::BIGINT AS beta_milli
FROM num JOIN denx ON num.ta = denx.event_type
ORDER BY ta, tb, lag
"""


# -- t-closeness audit ----------------------------------------------------------------------------------------------

_TC_SEGMENTS = 10


def q_t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian ICDE'07) over the
    same quasi-identifier grid as `k_anonymity_audit` (event_type x
    3-hour bucket), sensitive attribute = user segment (user_id mod
    {seg}, a planted categorical segmentation): per QI group, the total
    variation distance between the group's segment distribution and the
    corpus-wide one. Completes the release-audit triptych — k-anonymity
    (group size), l-diversity (distinct sensitives), t-closeness
    (distribution skew): a big, diverse group still leaks if 95% of it
    is one segment. Integer-exact: tvd_milli = Sum_seg
    |c_gs*N - C_s*n_g| * 1000 div (2*n_g*N), with absent segments
    contributing their full global mass via a zero-filled grid.

    Scale shape: one (QI, segment) groupBy, a zero-fill join against
    the (QI x segment) grid (both sides bounded: |QI| x {seg}), global
    marginals broadcast in; |QI| output rows."""
    ev = _read(spark, sf_dir, "events").select(
        F.col("event_type").alias("et"),
        F.expr(
            f"cast((unix_millis(cast(ts as timestamp)) div 3600000) % 24 div (24 div {_MI_HOD_BUCKETS}) as int)"
        ).alias("hod"),
        (F.col("user_id") % _TC_SEGMENTS).cast("int").alias("seg"),
    )
    cells = ev.groupBy("et", "hod", "seg").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    groups = cells.groupBy("et", "hod").agg(F.sum("c").cast("bigint").alias("n_g"))
    segs = cells.groupBy("seg").agg(F.sum("c").cast("bigint").alias("c_s"))
    tot = segs.agg(F.sum("c_s").cast("bigint").alias("n"))
    grid = groups.crossJoin(F.broadcast(segs))
    filled = grid.join(cells, ["et", "hod", "seg"], "left").select(
        "et", "hod", "n_g", "c_s", F.coalesce("c", F.lit(0)).cast("bigint").alias("c")
    )
    return (
        filled.crossJoin(F.broadcast(tot))
        .groupBy("et", "hod")
        .agg(
            F.max("n_g").cast("bigint").alias("n_g"),
            F.sum(F.expr("abs(c * n - c_s * n_g)")).cast("bigint").alias("num"),
            F.max("n").cast("bigint").alias("n"),
        )
        .select(
            "et",
            "hod",
            "n_g",
            F.expr("num * 1000 div (2 * n_g * n)").cast("bigint").alias("tvd_milli"),
        )
        .orderBy("et", "hod")
    )


q_t_closeness_audit.__doc__ = q_t_closeness_audit.__doc__.format(seg=_TC_SEGMENTS)


SQL_T_CLOSENESS_AUDIT = f"""
WITH ev AS (
  SELECT event_type AS et,
         (((epoch_ms(ts) // 3600000) % 24) // (24 // {_MI_HOD_BUCKETS}))::INTEGER AS hod,
         (user_id % {_TC_SEGMENTS})::INTEGER AS seg
  FROM events
), cells AS (
  SELECT et, hod, seg, count(*)::BIGINT AS c FROM ev GROUP BY et, hod, seg
), groups AS (
  SELECT et, hod, sum(c)::BIGINT AS n_g FROM cells GROUP BY et, hod
), segs AS (
  SELECT seg, sum(c)::BIGINT AS c_s FROM cells GROUP BY seg
), tot AS (SELECT sum(c_s)::BIGINT AS n FROM segs),
filled AS (
  SELECT g.et, g.hod, g.n_g, s.seg, s.c_s, coalesce(c.c, 0)::BIGINT AS c
  FROM groups g CROSS JOIN segs s
  LEFT JOIN cells c ON c.et = g.et AND c.hod = g.hod AND c.seg = s.seg
)
SELECT et, hod, max(n_g)::BIGINT AS n_g,
       (sum(abs(c * n - c_s * n_g)) * 1000 // (2 * max(n_g) * max(n)))::BIGINT AS tvd_milli
FROM filled CROSS JOIN tot GROUP BY et, hod ORDER BY et, hod
"""


# -- one-way ANOVA effect size -----------------------------------------------------------------------------------------


def q_anova_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA decomposition of document length across sources:
    eta-squared = SSB/SST (how much of the length variance the source
    explains) and the F statistic — the variance-decomposition answer
    to 'are sources actually different populations, or one corpus with
    noise?' that drives whether per-source quality thresholds are
    worth maintaining. Integer-exact via global-mean centering: lengths
    are shifted by the integer corpus mean first (SSB/SST are
    shift-invariant), which keeps every N-scaled square inside int64;
    both engines then truncate identically.

    Scale shape: two passes — a 1-row mean, then one groupBy(source)
    of integer partials; the decomposition is driver-free map math on
    the |sources|-row result."""
    docs = _read(spark, sf_dir, "documents").select(
        "source", F.col("n_chars").cast("bigint").alias("y")
    )
    mean = docs.agg(
        F.expr("sum(y) div count(1)").cast("bigint").alias("c0")
    )
    z = docs.crossJoin(F.broadcast(mean)).select(
        "source", F.expr("y - c0").cast("bigint").alias("z")
    )
    per = z.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_g"),
        F.sum("z").cast("bigint").alias("t_g"),
        F.sum(F.expr("z * z")).cast("bigint").alias("q_g"),
    )
    return per.agg(
        F.sum("n_g").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("t_g").cast("bigint").alias("s"),
        F.sum("q_g").cast("bigint").alias("sumsq"),
        F.sum(F.expr("t_g * t_g div n_g")).cast("bigint").alias("bsum"),
    ).select(
        "n",
        "k",
        # SSB = Sum t_g^2/n_g - S^2/N ; SST = Sum z^2 - S^2/N (N-scaled)
        F.expr("(bsum * n - s * s) * 1000 div (sumsq * n - s * s)")
        .cast("bigint")
        .alias("eta2_milli"),
        F.expr(
            "((bsum * n - s * s) div (k - 1)) * 1000 div ((sumsq * n - bsum * n) div (n - k))"
        )
        .cast("bigint")
        .alias("f_milli"),
    )


SQL_ANOVA_EFFECT = """
WITH mean AS (
  SELECT (sum(n_chars::BIGINT) // count(*))::BIGINT AS c0 FROM documents
), z AS (
  SELECT source, (n_chars::BIGINT - c0)::BIGINT AS z FROM documents CROSS JOIN mean
), per AS (
  SELECT source, count(*)::BIGINT AS n_g, sum(z)::BIGINT AS t_g,
         sum(z * z)::BIGINT AS q_g
  FROM z GROUP BY source
), agg AS (
  SELECT sum(n_g)::BIGINT AS n, count(*)::BIGINT AS k, sum(t_g)::BIGINT AS s,
         sum(q_g)::BIGINT AS sumsq, sum(t_g * t_g // n_g)::BIGINT AS bsum
  FROM per
)
SELECT n, k,
       ((bsum * n - s * s) * 1000 // (sumsq * n - s * s))::BIGINT AS eta2_milli,
       (((bsum * n - s * s) // (k - 1)) * 1000 // ((sumsq * n - bsum * n) // (n - k)))::BIGINT AS f_milli
FROM agg
"""


# -- tail conditional value at risk ----------------------------------------------------------------------------------


def q_tail_cvar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tail risk per event type: VaR_95 (the smallest value in the top
    5%) and CVaR_95 / expected shortfall (the MEAN of that top 5%) —
    the pair capacity planning actually budgets for, since p95 alone
    says nothing about how bad the tail is once entered (Rockafellar &
    Uryasev 2000). Tail membership is exact order statistics: values
    quantized once to integer cents (round(value*100): one correctly
    rounded double multiply + the shared half-away-from-zero rule),
    ranked per type with event_id tie-breaks, top max(1, n div 20)
    rows kept; the means are integer divisions.

    Scale shape: one window ranked within each type partition (the
    stream's natural key), a per-type count broadcast back, one
    grouped agg of the tail — no global sort. At 10^10 events swap the
    exact rank for the t-digest threshold and keep the same tail agg."""
    ev = _read(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.expr("cast(round(value * 100) as bigint)").alias("cents"),
    )
    n_per = ev.groupBy("event_type").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    w = Window.partitionBy("event_type").orderBy(
        F.col("cents").desc(), F.col("event_id").asc()
    )
    ranked = ev.withColumn("r", F.row_number().over(w).cast("bigint"))
    tail = ranked.join(F.broadcast(n_per), "event_type").filter(
        F.col("r") <= F.greatest(F.lit(1), F.expr("n div 20"))
    )
    return (
        tail.groupBy("event_type")
        .agg(
            F.max("n").cast("bigint").alias("n"),
            F.count(F.lit(1)).cast("bigint").alias("n_tail"),
            F.min("cents").cast("bigint").alias("var_cents"),
            F.expr("sum(cents) div count(1)").cast("bigint").alias("cvar_cents"),
        )
        .orderBy("event_type")
    )


SQL_TAIL_CVAR = """
WITH ev AS (
  SELECT event_type, event_id, round(value * 100)::BIGINT AS cents FROM events
), n_per AS (
  SELECT event_type, count(*)::BIGINT AS n FROM ev GROUP BY event_type
), ranked AS (
  SELECT event_type, cents,
         row_number() OVER (PARTITION BY event_type ORDER BY cents DESC, event_id ASC)::BIGINT AS r
  FROM ev
), tail AS (
  SELECT ranked.event_type, cents, n
  FROM ranked JOIN n_per ON ranked.event_type = n_per.event_type
  WHERE r <= greatest(1, n // 20)
)
SELECT event_type, max(n)::BIGINT AS n, count(*)::BIGINT AS n_tail,
       min(cents)::BIGINT AS var_cents,
       (sum(cents) // count(*))::BIGINT AS cvar_cents
FROM tail GROUP BY event_type ORDER BY event_type
"""


# -- keyword-in-context concordance -----------------------------------------------------------------------------------

_KWIC_WIN = 2
_KWIC_RANK = 11  # df rank of the target term (skip the top-10 near-stopwords)


def q_kwic_concordance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword-in-context concordance (the corpus linguist's KWIC view,
    and the spot-check surface behind every 'show me how this term is
    actually used' request during vocabulary/tokenizer debugging): all
    occurrences of the target term — document-frequency rank
    {rank} of the vocabulary, the same deterministic pick as
    retrieval_eval's queries — with {win} tokens of left and right
    context joined back into strings. Exact string output, so the
    oracle pins tokenization AND windowing byte-for-byte.

    Scale shape: one vocab agg -> TakeOrdered 1 (the target, broadcast),
    one posexplode + semi-filter; context slices are map-side array
    ops; output rows = term occurrences."""
    toks = _tokens(_docs_parallel(spark, sf_dir)).select("doc_id", "toks")
    target = (
        toks.select(F.explode("toks").alias("term"), "doc_id")
        .distinct()
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(_KWIC_RANK)
        .orderBy(F.asc("df"), F.asc("term"))
        .limit(1)
        .select("term")
    )
    pos = toks.select("doc_id", "toks", F.posexplode("toks").alias("pos", "tok"))
    hits = pos.join(F.broadcast(target), F.col("tok") == F.col("term"))
    return (
        hits.select(
            "doc_id",
            F.col("pos").cast("bigint").alias("pos"),
            F.expr(
                f"array_join(slice(toks, greatest(1, pos + 1 - {_KWIC_WIN}), "
                f"pos + 1 - greatest(1, pos + 1 - {_KWIC_WIN})), ' ')"
            ).alias("left_ctx"),
            F.col("tok").alias("term"),
            F.expr(f"array_join(slice(toks, pos + 2, {_KWIC_WIN}), ' ')").alias(
                "right_ctx"
            ),
        )
        .orderBy("doc_id", "pos")
    )


q_kwic_concordance.__doc__ = q_kwic_concordance.__doc__.format(
    rank=_KWIC_RANK, win=_KWIC_WIN
)


SQL_KWIC_CONCORDANCE = f"""
WITH toks AS (
  SELECT doc_id, {_SQL_TOKS} AS toks FROM documents
), df AS (
  SELECT term, count(*) AS df FROM (
    SELECT DISTINCT doc_id, unnest(toks) AS term FROM toks
  ) GROUP BY term
), target AS (
  SELECT term FROM (
    SELECT term, df FROM df ORDER BY df DESC, term ASC LIMIT {_KWIC_RANK}
  ) ORDER BY df ASC, term ASC LIMIT 1
), pos AS (
  SELECT doc_id, toks, toks[u.i] AS tok, (u.i - 1)::BIGINT AS pos
  FROM toks, unnest(range(1, len(toks) + 1)) AS u(i)
)
SELECT doc_id, pos,
       coalesce(array_to_string(toks[greatest(1, pos + 1 - {_KWIC_WIN}):pos], ' '), '') AS left_ctx,
       tok AS term,
       coalesce(array_to_string(toks[pos + 2:least(len(toks), pos + 1 + {_KWIC_WIN})], ' '), '') AS right_ctx
FROM pos JOIN target ON pos.tok = target.term
ORDER BY doc_id, pos
"""


# -- prefix completions -------------------------------------------------------------------------------------------------

_PFX_LENS = (1, 2, 3)


def q_prefix_completions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocomplete table build: for every term prefix of length
    {lens}, the highest-total-frequency completion and its share of
    the prefix's mass — the precomputed structure behind search-box
    suggestions and the trie-pruning statistic for the dictionary
    (`front_coding_bytes`) layout. Ties break lexicographically, so
    the table is deterministic.

    Scale shape: one vocab count agg, an explode to ({n_lens} prefixes
    x vocab) rows, one rank window PARTITIONED by prefix plus the
    prefix-mass sum over the same partitioning — bounded by the
    dictionary, not the corpus."""
    tf = (
        _tokens(_docs_parallel(spark, sf_dir))
        .select(F.explode("toks").alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    lens = ", ".join(str(k) for k in _PFX_LENS)
    pfx = tf.select(
        "term", "tf", F.explode(F.expr(f"array({lens})")).alias("k")
    ).filter(F.length("term") >= F.col("k")).select(
        F.expr("substring(term, 1, k)").alias("prefix"), "term", "tf"
    )
    w = Window.partitionBy("prefix")
    wr = Window.partitionBy("prefix").orderBy(F.desc("tf"), F.asc("term"))
    return (
        pfx.withColumn("mass", F.sum("tf").over(w).cast("bigint"))
        .withColumn("r", F.row_number().over(wr))
        .filter(F.col("r") == 1)
        .select(
            "prefix",
            F.col("term").alias("top_term"),
            "tf",
            "mass",
            F.expr("tf * 1000 div mass").cast("bigint").alias("share_milli"),
        )
        .orderBy("prefix")
    )


q_prefix_completions.__doc__ = q_prefix_completions.__doc__.format(
    lens=_PFX_LENS, n_lens=len(_PFX_LENS)
)


SQL_PREFIX_COMPLETIONS = f"""
WITH tf AS (
  SELECT term, count(*)::BIGINT AS tf FROM (
    SELECT unnest({_SQL_TOKS}) AS term FROM documents
  ) GROUP BY term
), pfx AS (
  SELECT substr(term, 1, k) AS prefix, term, tf
  FROM tf, unnest([{", ".join(str(k) for k in _PFX_LENS)}]) AS u(k)
  WHERE length(term) >= k
), ranked AS (
  SELECT prefix, term, tf,
         sum(tf) OVER (PARTITION BY prefix)::BIGINT AS mass,
         row_number() OVER (PARTITION BY prefix ORDER BY tf DESC, term ASC) AS r
  FROM pfx
)
SELECT prefix, term AS top_term, tf, mass,
       (tf * 1000 // mass)::BIGINT AS share_milli
FROM ranked WHERE r = 1 ORDER BY prefix
"""


# -- Spearman rank correlation --------------------------------------------------------------------------------------------


def q_spearman_rho(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between two per-document signals —
    length (n_chars) and lexical variety (distinct tokens) — via the
    classical rho = 1 - 6*Sum(d^2) / (n(n^2-1)). The monotone-agreement
    check that, unlike Pearson, ignores the signals' scales, and the
    O(n log n) companion to `kendall_tau` (O(n^2) concordance):
    production monitors run Spearman corpus-wide and Kendall on
    samples. Ranks are row_number with doc_id tie-breaks (the
    convention pinned here and in the oracle), so rho is integer-exact
    in milli.

    Scale shape: two rank windows over single-column sorts, one
    map-side d^2, a 1-row fold; at 10^10 docs the ranks come from a
    range-partitioned sort (Spark's global row_number), still one
    shuffle each."""
    d = _tokens(_docs_parallel(spark, sf_dir)).select(
        "doc_id",
        F.col("n_chars").cast("bigint").alias("x"),
        F.expr("size(array_distinct(toks))").cast("bigint").alias("y"),
    )
    rx = Window.orderBy(F.asc("x"), F.asc("doc_id"))
    ry = Window.orderBy(F.asc("y"), F.asc("doc_id"))
    ranked = d.select(
        F.row_number().over(rx).cast("bigint").alias("r_x"),
        F.row_number().over(ry).cast("bigint").alias("r_y"),
    )
    return ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.expr("(r_x - r_y) * (r_x - r_y)")).cast("bigint").alias("sum_d2"),
    ).select(
        "n",
        "sum_d2",
        F.expr("(n * (n * n - 1) - 6 * sum_d2) * 1000 div (n * (n * n - 1))")
        .cast("bigint")
        .alias("rho_milli"),
    )


SQL_SPEARMAN_RHO = f"""
WITH d AS (
  SELECT doc_id, n_chars::BIGINT AS x,
         len(list_distinct({_SQL_TOKS}))::BIGINT AS y
  FROM documents
), ranked AS (
  SELECT row_number() OVER (ORDER BY x ASC, doc_id ASC)::BIGINT AS r_x,
         row_number() OVER (ORDER BY y ASC, doc_id ASC)::BIGINT AS r_y
  FROM d
)
SELECT count(*)::BIGINT AS n,
       sum((r_x - r_y) * (r_x - r_y))::BIGINT AS sum_d2,
       ((count(*) * (count(*) * count(*) - 1) - 6 * sum((r_x - r_y) * (r_x - r_y))) * 1000
        // (count(*) * (count(*) * count(*) - 1)))::BIGINT AS rho_milli
FROM ranked
"""


# -- minimum pair span (proximity) ----------------------------------------------------------------------------------


def q_min_pair_span(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum pair span — the positional-proximity primitive under
    phrase/proximity ranking (Buttcher et al, and the SpanNear scorer
    in Lucene): for the same two query terms as retrieval_eval's qid 0
    (document-frequency ranks 11-12), the smallest position distance
    between an occurrence of each within a document. BM25 says a doc
    mentions both; span says whether they appear TOGETHER — the
    re-ranking feature. Computed with the plane-sweep trick: all
    positions of both terms sorted once per doc, the minimum
    cross-term gap is over ADJACENT entries only — O(positions), never
    the occurrence cross-product.

    Scale shape: vocab agg -> 2-term broadcast; one posexplode +
    semi-join; ONE window per doc (the natural partition); a per-doc
    min agg. Output: docs containing both terms."""
    toks = _tokens(_docs_parallel(spark, sf_dir)).select("doc_id", "toks")
    terms = (
        toks.select(F.explode("toks").alias("term"), "doc_id")
        .distinct()
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(12)
        .orderBy(F.asc("df"), F.asc("term"))
        .limit(2)
        .select("term")
    )
    pos = (
        toks.select("doc_id", F.posexplode("toks").alias("pos", "tok"))
        .join(F.broadcast(terms), F.col("tok") == F.col("term"))
        .select("doc_id", F.col("pos").cast("bigint").alias("pos"), "term")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    gaps = pos.select(
        "doc_id",
        "term",
        "pos",
        F.lead("term").over(w).alias("nterm"),
        F.lead("pos").over(w).alias("npos"),
    ).filter(F.col("nterm").isNotNull() & (F.col("nterm") != F.col("term")))
    return (
        gaps.groupBy("doc_id")
        .agg(F.min(F.expr("npos - pos")).cast("bigint").alias("min_span"))
        .orderBy("doc_id")
    )


SQL_MIN_PAIR_SPAN = f"""
WITH toks AS (
  SELECT doc_id, {_SQL_TOKS} AS toks FROM documents
), df AS (
  SELECT term, count(*) AS df FROM (
    SELECT DISTINCT doc_id, unnest(toks) AS term FROM toks
  ) GROUP BY term
), terms AS (
  SELECT term FROM (
    SELECT term, df FROM df ORDER BY df DESC, term ASC LIMIT 12
  ) ORDER BY df ASC, term ASC LIMIT 2
), pos AS (
  SELECT doc_id, (u.i - 1)::BIGINT AS pos, toks[u.i] AS term
  FROM toks, unnest(range(1, len(toks) + 1)) AS u(i)
  WHERE toks[u.i] IN (SELECT term FROM terms)
), gaps AS (
  SELECT doc_id, term, pos,
         lead(term) OVER (PARTITION BY doc_id ORDER BY pos) AS nterm,
         lead(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS npos
  FROM pos
)
SELECT doc_id, min(npos - pos)::BIGINT AS min_span
FROM gaps WHERE nterm IS NOT NULL AND nterm <> term
GROUP BY doc_id ORDER BY doc_id
"""


# -- SpotSigs near-duplicate signatures ----------------------------------------------------------------------------

_SPOT_WIN = 4
_SPOT_CHAIN = 2
_SPOT_MAXDF = 50
_SPOT_MIN_SHARED = 2


def q_spotsigs_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SpotSigs near-duplicate detection (Theobald, Siddharth &
    Paepcke SIGIR'08): signatures are chains anchored at STOPWORD
    occurrences — the anchor plus the next {chain} non-stopword tokens
    within a {win}-token window — which naturally skips boilerplate
    (navigation bars rarely carry stopword-anchored content chains)
    and needs no shingle set over the full text. Docs sharing >=
    {min_shared} signatures are near-dup candidates, scored by exact
    Jaccard over their signature SETS. The boilerplate-robust member
    of the dedup family (minhash/simhash/ngram hash everything;
    SpotSigs samples where function words anchor real prose).

    Scale shape: signature extraction is map-side array ops; the
    candidate join is per-signature buckets with a df <= {maxdf}
    hot-signature cap (the same quadratic-guard as
    ngram_jaccard_capped); per-doc set sizes broadcast back for exact
    Jaccard."""
    toks = _tokens(_docs_parallel(spark, sf_dir)).select("doc_id", "toks")
    chain = (
        f"transform(filter(sequence(1, size(toks)), i -> array_contains({_SPARK_STOPLIST}, toks[i - 1])), "
        f"i -> concat(toks[i - 1], ':', array_join(slice(filter(slice(toks, i + 1, {_SPOT_WIN}), "
        f"t -> NOT array_contains({_SPARK_STOPLIST}, t)), 1, {_SPOT_CHAIN}), '_')))"
    )
    sigs = (
        toks.select("doc_id", F.explode(F.expr(chain)).alias("sig"))
        # a signature with an EMPTY chain (anchor at text end, or no
        # non-stop continuation) ends in ':' — dropped on both engines
        .filter((F.length("sig") > 0) & (~F.col("sig").endswith(":")))
        .distinct()
        .localCheckpoint()
    )
    sizes = sigs.groupBy("doc_id").agg(F.count(F.lit(1)).cast("bigint").alias("nsig"))
    capped = sigs.join(
        sigs.groupBy("sig").agg(F.count(F.lit(1)).alias("sdf")).filter(
            F.col("sdf") <= _SPOT_MAXDF
        ),
        "sig",
    )
    a = capped.select(F.col("sig"), F.col("doc_id").alias("da"))
    b = capped.select(F.col("sig"), F.col("doc_id").alias("db"))
    shared = (
        a.join(b, "sig")
        .filter(F.col("da") < F.col("db"))
        .groupBy("da", "db")
        .agg(F.count(F.lit(1)).cast("bigint").alias("shared"))
        .filter(F.col("shared") >= _SPOT_MIN_SHARED)
    )
    return (
        shared.join(
            F.broadcast(sizes.select(F.col("doc_id").alias("da"), F.col("nsig").alias("na"))),
            "da",
        )
        .join(
            F.broadcast(sizes.select(F.col("doc_id").alias("db"), F.col("nsig").alias("nb"))),
            "db",
        )
        .select(
            "da",
            "db",
            "shared",
            F.expr("shared * 1000 div (na + nb - shared)")
            .cast("bigint")
            .alias("jaccard_milli"),
        )
        .orderBy("da", "db")
    )


q_spotsigs_pairs.__doc__ = q_spotsigs_pairs.__doc__.format(
    chain=_SPOT_CHAIN, win=_SPOT_WIN, maxdf=_SPOT_MAXDF, min_shared=_SPOT_MIN_SHARED
)


SQL_SPOTSIGS_PAIRS = f"""
WITH toks AS (
  SELECT doc_id, {_SQL_TOKS} AS toks FROM documents
), sigs AS (
  SELECT DISTINCT doc_id, sig FROM (
    SELECT doc_id,
           toks[u.i] || ':' || array_to_string(
             (list_filter(toks[u.i + 1:least(len(toks), u.i + {_SPOT_WIN})],
                          t -> NOT list_contains({_SQL_STOPLIST}, t)))[1:{_SPOT_CHAIN}], '_') AS sig
    FROM toks, unnest(range(1, len(toks) + 1)) AS u(i)
    WHERE list_contains({_SQL_STOPLIST}, toks[u.i])
  ) WHERE sig IS NOT NULL AND length(sig) > 0 AND sig NOT LIKE '%:'
), sizes AS (
  SELECT doc_id, count(*)::BIGINT AS nsig FROM sigs GROUP BY doc_id
), capped AS (
  SELECT sigs.doc_id, sigs.sig FROM sigs
  JOIN (SELECT sig, count(*) AS sdf FROM sigs GROUP BY sig HAVING count(*) <= {_SPOT_MAXDF}) f
    ON sigs.sig = f.sig
), shared AS (
  SELECT a.doc_id AS da, b.doc_id AS db, count(*)::BIGINT AS shared
  FROM capped a JOIN capped b ON a.sig = b.sig AND a.doc_id < b.doc_id
  GROUP BY 1, 2 HAVING count(*) >= {_SPOT_MIN_SHARED}
)
SELECT da, db, shared,
       (shared * 1000 // (sa.nsig + sb.nsig - shared))::BIGINT AS jaccard_milli
FROM shared
JOIN sizes sa ON shared.da = sa.doc_id
JOIN sizes sb ON shared.db = sb.doc_id
ORDER BY da, db
"""


# -- behavioral cosine between event types ------------------------------------------------------------------------------


def q_behavior_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ochiai/cosine similarity between event types over their user
    sets: sim(a,b) = |U_a n U_b| / sqrt(|U_a| |U_b|) — the
    co-behavior geometry that `assoc_rules_lift` expresses as a ratio
    of rates; cosine is the symmetric, scale-free version item-item
    recommenders actually use (Sarwar et al WWW'01). Integer set
    sizes feed one sqrt + one division — both IEEE-correctly-rounded
    over exact integer inputs (the wilson_lower_bound determinism
    argument), rounded to 6 decimals.

    Scale shape: distinct (user, type) once, self-join on user bounded
    by per-user type sets, |types| marginals broadcast back;
    |types|^2/2 output rows."""
    bask = (
        _read(spark, sf_dir, "events")
        .select("user_id", "event_type")
        .distinct()
        .localCheckpoint()
    )
    marg = bask.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    a = bask.select(F.col("user_id").alias("u"), F.col("event_type").alias("ta"))
    b = bask.select(F.col("user_id").alias("u"), F.col("event_type").alias("tb"))
    inter = (
        a.join(b, "u")
        .filter(F.col("ta") < F.col("tb"))
        .groupBy("ta", "tb")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c_ab"))
    )
    return (
        inter.join(
            F.broadcast(marg.select(F.col("event_type").alias("ta"), F.col("cnt").alias("c_a"))),
            "ta",
        )
        .join(
            F.broadcast(marg.select(F.col("event_type").alias("tb"), F.col("cnt").alias("c_b"))),
            "tb",
        )
        .select(
            "ta",
            "tb",
            "c_ab",
            F.expr("round(cast(c_ab as double) / sqrt(cast(c_a as double) * c_b), 6)").alias(
                "ochiai"
            ),
        )
        .orderBy("ta", "tb")
    )


SQL_BEHAVIOR_COSINE = """
WITH bask AS (
  SELECT DISTINCT user_id, event_type FROM events
), marg AS (
  SELECT event_type, count(*)::BIGINT AS cnt FROM bask GROUP BY event_type
), inter AS (
  SELECT a.event_type AS ta, b.event_type AS tb, count(*)::BIGINT AS c_ab
  FROM bask a JOIN bask b ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT ta, tb, c_ab,
       round(c_ab::DOUBLE / sqrt(ma.cnt::DOUBLE * mb.cnt), 6) AS ochiai
FROM inter
JOIN marg ma ON inter.ta = ma.event_type
JOIN marg mb ON inter.tb = mb.event_type
ORDER BY ta, tb
"""


# -- rich-club coefficient ------------------------------------------------------------------------------------------

_RC_KS = (2, 4, 8)


def q_rich_club(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rich-club coefficient of the host graph (Zhou & Mondragon 2004;
    Colizza et al Nature Physics 2006): for degree thresholds k in
    {ks}, phi(k) = 2*E_k / (N_k*(N_k-1)) where N_k hubs have degree
    > k and E_k edges run between them — how tightly the hubs
    interconnect. The LINK-FARM macro-signature: organic webs show
    moderate rich-clubs, spam farms show phi near 1 among their hub
    layer (`link_farm_score` flags nodes; this flags the STRUCTURE).
    Exact integer counts; phi reported in milli.

    Scale shape: one degree agg, hub set broadcast (shrinks as k
    grows), edge semi-join counted per threshold — thresholds fold in
    one pass each over the edge list."""
    edges = _pagerank_edges(spark, sf_dir).localCheckpoint()
    und = (
        edges.selectExpr("least(src, dst) AS a", "greatest(src, dst) AS b")
        .distinct()
        .localCheckpoint()
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .union(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
        .localCheckpoint()
    )
    outs = []
    for k in _RC_KS:
        hubs = deg.filter(F.col("deg") > k).select("node")
        nk = hubs.agg(F.count(F.lit(1)).cast("bigint").alias("n_k"))
        ek = (
            und.join(F.broadcast(hubs.withColumnRenamed("node", "a")), "a")
            .join(F.broadcast(hubs.withColumnRenamed("node", "b")), "b")
            .agg(F.count(F.lit(1)).cast("bigint").alias("e_k"))
        )
        outs.append(
            nk.crossJoin(ek).select(
                F.lit(k).cast("int").alias("k"),
                "n_k",
                "e_k",
                F.expr(
                    "case when n_k >= 2 then 2 * e_k * 1000 div (n_k * (n_k - 1)) else 0 end"
                )
                .cast("bigint")
                .alias("phi_milli"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out.orderBy("k")


q_rich_club.__doc__ = q_rich_club.__doc__.format(ks=_RC_KS)


def _sql_rich_club() -> str:
    sels = []
    for k in _RC_KS:
        sels.append(
            f"""SELECT {k}::INTEGER AS k, n_k, e_k,
       (CASE WHEN n_k >= 2 THEN 2 * e_k * 1000 // (n_k * (n_k - 1)) ELSE 0 END)::BIGINT AS phi_milli
FROM (SELECT count(*)::BIGINT AS n_k FROM deg WHERE deg > {k})
CROSS JOIN (
  SELECT count(*)::BIGINT AS e_k FROM und
  WHERE a IN (SELECT node FROM deg WHERE deg > {k})
    AND b IN (SELECT node FROM deg WHERE deg > {k})
)"""
        )
    body = " UNION ALL ".join(sels)
    return f"""
WITH edges AS (
  SELECT DISTINCT user_id % {_PR_NODES} AS src,
         ('0x' || substr(md5(event_id::VARCHAR), 1, 4))::BIGINT % {_PR_NODES} AS dst
  FROM events
  WHERE user_id % {_PR_NODES}
        <> ('0x' || substr(md5(event_id::VARCHAR), 1, 4))::BIGINT % {_PR_NODES}
), und AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM edges
), deg AS MATERIALIZED (
  SELECT node, count(*)::BIGINT AS deg FROM (
    SELECT a AS node FROM und UNION ALL SELECT b FROM und
  ) GROUP BY node
)
SELECT * FROM ({body}) ORDER BY k
"""


SQL_RICH_CLUB = _sql_rich_club()


# -- Neyman stratified-sampling allocation -----------------------------------------------------------------------------

_NEY_BUDGET = 1000


def q_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-optimal stratified sample allocation (Neyman 1934): split
    a {budget}-doc inspection budget across sources proportional to
    N_h * S_h (stratum size x stratum std-dev of document length) —
    the design that minimizes estimator variance, vs naive
    proportional allocation which oversamples homogeneous strata. The
    audit-budget planner for 'how many docs per source must a human
    QA pass look at'. Variances are exact integers via the n-scaled
    centered form; S_h is one IEEE sqrt; seats are assigned by
    largest remainder (the budget_allocation machinery), so the
    allocation sums to exactly {budget} deterministically.

    Scale shape: one groupBy(source) of integer partials, window rank
    over the |sources|-row result — driver-free."""
    docs = _read(spark, sf_dir, "documents").select(
        "source", F.col("n_chars").cast("bigint").alias("y")
    )
    per = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_h"),
        F.sum("y").cast("bigint").alias("s_h"),
        F.sum(F.expr("y * y")).cast("bigint").alias("q_h"),
    )
    # S_h in milli units: sqrt of the exact integer variance scaled by 1e6
    weighted = per.select(
        "source",
        "n_h",
        F.expr(
            "cast(round(sqrt(cast((q_h * n_h - s_h * s_h) as double) / (n_h * n_h) * 1000000)) as bigint)"
        ).alias("s_milli"),
    ).withColumn("w", F.expr("n_h * s_milli").cast("bigint"))
    tot = weighted.agg(F.sum("w").cast("bigint").alias("wsum"))
    base = weighted.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_h",
        "s_milli",
        F.expr(f"w * {_NEY_BUDGET} div wsum").cast("bigint").alias("floor_n"),
        F.expr(f"w * {_NEY_BUDGET} % wsum").cast("bigint").alias("rem"),
    )
    short = base.agg(
        (F.lit(_NEY_BUDGET) - F.sum("floor_n")).cast("bigint").alias("extra")
    )
    wr = Window.orderBy(F.desc("rem"), F.asc("source"))
    return (
        base.crossJoin(F.broadcast(short))
        .withColumn("rk", F.row_number().over(wr).cast("bigint"))
        .select(
            "source",
            "n_h",
            "s_milli",
            (F.col("floor_n") + (F.col("rk") <= F.col("extra")).cast("bigint"))
            .cast("bigint")
            .alias("alloc"),
        )
        .orderBy("source")
    )


q_neyman_allocation.__doc__ = q_neyman_allocation.__doc__.format(budget=_NEY_BUDGET)


SQL_NEYMAN_ALLOCATION = f"""
WITH per AS (
  SELECT source, count(*)::BIGINT AS n_h, sum(n_chars::BIGINT)::BIGINT AS s_h,
         sum(n_chars::BIGINT * n_chars::BIGINT)::BIGINT AS q_h
  FROM documents GROUP BY source
), weighted AS (
  SELECT source, n_h,
         round(sqrt((q_h * n_h - s_h * s_h)::DOUBLE / (n_h * n_h) * 1000000))::BIGINT AS s_milli
  FROM per
), w2 AS (
  SELECT source, n_h, s_milli, (n_h * s_milli)::BIGINT AS w FROM weighted
), tot AS (SELECT sum(w)::BIGINT AS wsum FROM w2),
base AS (
  SELECT source, n_h, s_milli,
         (w * {_NEY_BUDGET} // wsum)::BIGINT AS floor_n,
         (w * {_NEY_BUDGET} % wsum)::BIGINT AS rem
  FROM w2 CROSS JOIN tot
), short AS (
  SELECT ({_NEY_BUDGET} - sum(floor_n))::BIGINT AS extra FROM base
), ranked AS (
  SELECT source, n_h, s_milli, floor_n, extra,
         row_number() OVER (ORDER BY rem DESC, source ASC)::BIGINT AS rk
  FROM base CROSS JOIN short
)
SELECT source, n_h, s_milli,
       (floor_n + (rk <= extra)::BIGINT)::BIGINT AS alloc
FROM ranked ORDER BY source
"""


# -- two-proportion power analysis ---------------------------------------------------------------------------------------


def q_sample_size_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Required sample size per arm to detect the OBSERVED
    English-rate gap between each source and the corpus rest, at
    alpha = 0.05 two-sided / 80% power (two-proportion z-test,
    Fleiss): n = (z_a*sqrt(2*pbar*qbar) + z_b*sqrt(p1*q1 + p2*q2))^2
    / (p1 - p2)^2. The monitoring-design op: a drift alarm on a slice
    is only actionable if the slice's daily volume can reach
    significance — this reports, per source, how many docs/arm that
    takes. z constants are shared literals; rates enter as exact
    milli integers; the two sqrts and the square are IEEE
    correctly-rounded doubles (wilson_lower_bound's determinism
    argument), rounded to a whole-doc ceiling.

    Scale shape: one groupBy(source) + a 1-row corpus total broadcast;
    map-side math on |sources| rows."""
    per = (
        _read(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n1"),
            F.sum((F.col("lang") == "en").cast("bigint")).cast("bigint").alias("s1"),
        )
    )
    tot = per.agg(
        F.sum("n1").cast("bigint").alias("n"), F.sum("s1").cast("bigint").alias("s")
    )
    # all in exact milli: p1, p2 (rest), pbar (pooled)
    base = per.crossJoin(F.broadcast(tot)).select(
        "source",
        "n1",
        F.expr("s1 * 1000 div n1").cast("bigint").alias("p1_milli"),
        F.expr("(s - s1) * 1000 div (n - n1)").cast("bigint").alias("p2_milli"),
        F.expr("s * 1000 div n").cast("bigint").alias("pbar_milli"),
    )
    expr = (
        "case when p1_milli = p2_milli then cast(null as bigint) else "
        "cast(ceil(pow(1.96 * sqrt(2.0 * (pbar_milli / 1000.0) * (1.0 - pbar_milli / 1000.0)) "
        "+ 0.8416 * sqrt((p1_milli / 1000.0) * (1.0 - p1_milli / 1000.0) "
        "+ (p2_milli / 1000.0) * (1.0 - p2_milli / 1000.0)), 2) "
        "/ pow((p1_milli - p2_milli) / 1000.0, 2)) as bigint) end"
    )
    return base.select(
        "source", "n1", "p1_milli", "p2_milli", F.expr(expr).alias("n_per_arm")
    ).orderBy("source")


SQL_SAMPLE_SIZE_POWER = """
WITH per AS (
  SELECT source, count(*)::BIGINT AS n1,
         sum((lang = 'en')::BIGINT)::BIGINT AS s1
  FROM documents GROUP BY source
), tot AS (SELECT sum(n1)::BIGINT AS n, sum(s1)::BIGINT AS s FROM per),
base AS (
  SELECT source, n1,
         (s1 * 1000 // n1)::BIGINT AS p1_milli,
         ((s - s1) * 1000 // (n - n1))::BIGINT AS p2_milli,
         (s * 1000 // n)::BIGINT AS pbar_milli
  FROM per CROSS JOIN tot
)
SELECT source, n1, p1_milli, p2_milli,
       CASE WHEN p1_milli = p2_milli THEN NULL ELSE
         ceil(pow(1.96 * sqrt(2.0 * (pbar_milli / 1000.0) * (1.0 - pbar_milli / 1000.0))
                  + 0.8416 * sqrt((p1_milli / 1000.0) * (1.0 - p1_milli / 1000.0)
                                  + (p2_milli / 1000.0) * (1.0 - p2_milli / 1000.0)), 2)
              / pow((p1_milli - p2_milli) / 1000.0, 2))::BIGINT END AS n_per_arm
FROM base ORDER BY source
"""


# -- inverse-propensity-weighted estimation ------------------------------------------------------------------------

#: per-source-parity sampling rates (percent) — a deliberately BIASED
#: sample design, so the unweighted mean is visibly off and IPW fixes it
_IPW_RATE_EVEN = 40
_IPW_RATE_ODD = 10


def q_ipw_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-propensity-weighted (Horvitz-Thompson) estimation audit:
    documents are hash-sampled at DIFFERENT known rates per source
    parity ({even}% / {odd}%), then the corpus mean length is
    estimated three ways — naive sample mean (biased), IPW mean
    (weights 1/p, unbiased), and the truth — with both errors in ppm.
    The debiasing discipline every sampled-telemetry pipeline needs:
    quality metrics computed on non-uniform samples (and EVERY
    politeness-constrained crawl sample is non-uniform) are wrong
    until reweighted. md5 sampling + integer milli weights keep both
    engines identical.

    Scale shape: single corpus pass folding truth, naive, and weighted
    partials in one aggregate — no join, 1-row output."""
    rate = (
        f"case when cast(substring(source, 4, 10) as int) % 2 = 0 "
        f"then {_IPW_RATE_EVEN} else {_IPW_RATE_ODD} end"
    )
    docs = _read(spark, sf_dir, "documents").select(
        F.col("n_chars").cast("bigint").alias("y"),
        F.expr(rate).cast("bigint").alias("rate"),
        (
            F.expr(
                "cast(conv(substring(md5(cast(doc_id as string)), 1, 4), 16, 10) as bigint)"
            )
            % 100
        ).alias("h"),
    ).select(
        "y", "rate", (F.col("h") < F.col("rate")).alias("in_s")
    )
    return docs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.when(F.col("in_s"), 1).otherwise(0)).cast("bigint").alias("n_s"),
        F.sum(F.when(F.col("in_s"), F.col("y")).otherwise(0))
        .cast("bigint")
        .alias("sy_s"),
        # Horvitz-Thompson: weight 100/rate per sampled row, in exact
        # centi units (y*100 div rate is NOT integer-safe; keep y*100/rate
        # as y * 100 div rate only after summing numerators per rate —
        # rates divide 100 exactly here: 100/40 -> 5/2, so scale by 2
        F.sum(F.when(F.col("in_s"), F.expr("y * 200 div rate")).otherwise(0))
        .cast("bigint")
        .alias("ht_2x"),
        F.sum(F.when(F.col("in_s"), F.expr("200 div rate")).otherwise(0))
        .cast("bigint")
        .alias("w_2x"),
    ).select(
        "n",
        "n_s",
        F.expr("sy * 1000 div n").cast("bigint").alias("true_mean_milli"),
        F.expr("sy_s * 1000 div n_s").cast("bigint").alias("naive_mean_milli"),
        F.expr("ht_2x * 1000 div w_2x").cast("bigint").alias("ipw_mean_milli"),
        F.expr(
            "abs(sy_s * 1000 div n_s - sy * 1000 div n) * 1000 div (sy * 1000 div n)"
        )
        .cast("bigint")
        .alias("naive_err_milli"),
        F.expr(
            "abs(ht_2x * 1000 div w_2x - sy * 1000 div n) * 1000 div (sy * 1000 div n)"
        )
        .cast("bigint")
        .alias("ipw_err_milli"),
    )


q_ipw_estimate.__doc__ = q_ipw_estimate.__doc__.format(
    even=_IPW_RATE_EVEN, odd=_IPW_RATE_ODD
)


SQL_IPW_ESTIMATE = f"""
WITH docs AS (
  SELECT n_chars::BIGINT AS y,
         (CASE WHEN substr(source, 4, 10)::INTEGER % 2 = 0
               THEN {_IPW_RATE_EVEN} ELSE {_IPW_RATE_ODD} END)::BIGINT AS rate,
         ('0x' || substr(md5(doc_id::VARCHAR), 1, 4))::BIGINT % 100 AS h
  FROM documents
), tagged AS (
  SELECT y, rate, h < rate AS in_s FROM docs
), agg AS (
  SELECT count(*)::BIGINT AS n, sum(y)::BIGINT AS sy,
         sum(CASE WHEN in_s THEN 1 ELSE 0 END)::BIGINT AS n_s,
         sum(CASE WHEN in_s THEN y ELSE 0 END)::BIGINT AS sy_s,
         sum(CASE WHEN in_s THEN y * 200 // rate ELSE 0 END)::BIGINT AS ht_2x,
         sum(CASE WHEN in_s THEN 200 // rate ELSE 0 END)::BIGINT AS w_2x
  FROM tagged
)
SELECT n, n_s,
       (sy * 1000 // n)::BIGINT AS true_mean_milli,
       (sy_s * 1000 // n_s)::BIGINT AS naive_mean_milli,
       (ht_2x * 1000 // w_2x)::BIGINT AS ipw_mean_milli,
       (abs(sy_s * 1000 // n_s - sy * 1000 // n) * 1000 // (sy * 1000 // n))::BIGINT AS naive_err_milli,
       (abs(ht_2x * 1000 // w_2x - sy * 1000 // n) * 1000 // (sy * 1000 // n))::BIGINT AS ipw_err_milli
FROM agg
"""


# -- Yule's K -------------------------------------------------------------------------------------------------------------


def q_yule_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yule's characteristic K per language slice (Yule 1944):
    K = 10^4 * (sum_m m^2*V(m) - N) / N^2 over the frequency spectrum
    V(m) = number of types occurring m times — the repeat-rate
    vocabulary-richness constant that, unlike raw type counts, is
    ~invariant to corpus length (Tweedie & Baayen 1998), so slices of
    different sizes are comparable. The third face of the spectrum
    family: Chao1 reads the LOW end (f1, f2) for unseen types, Yule's
    K the whole spectrum for concentration; template-generated text
    shows K an order of magnitude above human prose. Integer-exact
    (milli).

    Scale shape: (lang, term) counts (one shuffle), per-lang integer
    fold of sum m^2 and N; |langs| output rows."""
    per = (
        _tokens(_docs_parallel(spark, sf_dir))
        .select("lang", F.explode("toks").alias("term"))
        .groupBy("lang", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("m"))
    )
    return (
        per.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("types"),
            F.sum("m").cast("bigint").alias("n_tokens"),
            F.sum(F.expr("m * m")).cast("bigint").alias("m2"),
        )
        .select(
            "lang",
            "types",
            "n_tokens",
            F.expr("(m2 - n_tokens) * 10000000 div (n_tokens * n_tokens)")
            .cast("bigint")
            .alias("yule_k_milli"),
        )
        .orderBy("lang")
    )


SQL_YULE_K = f"""
WITH per AS (
  SELECT lang, term, count(*)::BIGINT AS m FROM (
    SELECT lang, unnest({_SQL_TOKS}) AS term FROM documents
  ) GROUP BY lang, term
)
SELECT lang, count(*)::BIGINT AS types, sum(m)::BIGINT AS n_tokens,
       ((sum(m * m) - sum(m)) * 10000000 // (sum(m) * sum(m)))::BIGINT AS yule_k_milli
FROM per GROUP BY lang ORDER BY lang
"""


# -- zone-map pruning benefit ------------------------------------------------------------------------------------------

_ZM_GROUP = 1000


def q_zone_map_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map / row-group data-skipping audit (the min-max statistics
    behind Parquet row-group pruning, ORC stripe stats, and every
    lakehouse 'data skipping' feature): cut the corpus into
    {group}-doc row groups in layout order, record each group's
    [min, max] of n_chars, and for three selectivity thresholds (the
    exact 50/90/99th length percentiles) report how many groups a
    filter could SKIP as stored vs how many it would skip if the table
    were SORTED by the column (= optimal). The skipped-fraction gap is
    the concrete read-amplification cost of the current layout — the
    number that justifies `zorder_keys` / `sort_rle_benefit` work.

    Scale shape: group stats are one grouped agg; thresholds come from
    one exact-percentile agg (1 row, broadcast); the sorted-layout
    counterfactual needs only the VALUE DISTRIBUTION (rank arithmetic),
    not an actual sort."""
    docs = _read(spark, sf_dir, "documents").select(
        "doc_id", F.col("n_chars").cast("bigint").alias("y")
    )
    groups = (
        docs.withColumn("grp", F.col("doc_id") - F.col("doc_id") % _ZM_GROUP)
        .groupBy("grp")
        .agg(F.min("y").alias("lo"), F.max("y").alias("hi"))
        .localCheckpoint()
    )
    thr = docs.agg(
        F.expr("cast(floor(percentile(y, 0.5)) as bigint)").alias("t50"),
        F.expr("cast(floor(percentile(y, 0.9)) as bigint)").alias("t90"),
        F.expr("cast(floor(percentile(y, 0.99)) as bigint)").alias("t99"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    outs = []
    for name, col in (("p50", "t50"), ("p90", "t90"), ("p99", "t99")):
        # filter: y > t  — a group is skippable iff hi <= t
        stats = (
            groups.crossJoin(F.broadcast(thr))
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_groups"),
                F.sum(F.expr(f"cast(hi <= {col} as bigint)"))
                .cast("bigint")
                .alias("skipped"),
                F.max(col).cast("bigint").alias("t"),
                F.max("n").cast("bigint").alias("n"),
            )
        )
        # sorted-layout optimum: rows with y <= t fill floor(cnt/{group})
        # full groups — needs only the count of qualifying rows
        qual = docs.crossJoin(F.broadcast(thr)).agg(
            F.sum(F.expr(f"cast(y <= {col} as bigint)")).cast("bigint").alias("q")
        )
        outs.append(
            stats.crossJoin(F.broadcast(qual)).select(
                F.lit(name).alias("threshold"),
                "t",
                "n_groups",
                "skipped",
                F.expr(f"q div {_ZM_GROUP}").cast("bigint").alias("skipped_sorted"),
                F.expr("skipped * 1000 div n_groups")
                .cast("bigint")
                .alias("skip_milli"),
                F.expr(f"(q div {_ZM_GROUP}) * 1000 div n_groups")
                .cast("bigint")
                .alias("skip_sorted_milli"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out.orderBy("threshold")


q_zone_map_pruning.__doc__ = q_zone_map_pruning.__doc__.format(group=_ZM_GROUP)


def _sql_zone_map() -> str:
    sels = []
    for name, col in (("p50", "t50"), ("p90", "t90"), ("p99", "t99")):
        sels.append(
            f"""SELECT '{name}' AS threshold, (SELECT {col} FROM thr)::BIGINT AS t,
       (SELECT count(*) FROM groups)::BIGINT AS n_groups,
       (SELECT sum((hi <= (SELECT {col} FROM thr))::BIGINT) FROM groups)::BIGINT AS skipped,
       (SELECT sum((y <= (SELECT {col} FROM thr))::BIGINT) // {_ZM_GROUP} FROM docs)::BIGINT AS skipped_sorted,
       (SELECT sum((hi <= (SELECT {col} FROM thr))::BIGINT) FROM groups) * 1000
         // (SELECT count(*) FROM groups) AS skip_milli,
       ((SELECT sum((y <= (SELECT {col} FROM thr))::BIGINT) // {_ZM_GROUP} FROM docs) * 1000
         // (SELECT count(*) FROM groups))::BIGINT AS skip_sorted_milli"""
        )
    body = " UNION ALL ".join(sels)
    return f"""
WITH docs AS MATERIALIZED (
  SELECT doc_id, n_chars::BIGINT AS y FROM documents
), groups AS MATERIALIZED (
  SELECT doc_id - doc_id % {_ZM_GROUP} AS grp, min(y) AS lo, max(y) AS hi
  FROM docs GROUP BY 1
), thr AS MATERIALIZED (
  SELECT CAST(floor(quantile_cont(y, 0.5)) AS BIGINT) AS t50,
         CAST(floor(quantile_cont(y, 0.9)) AS BIGINT) AS t90,
         CAST(floor(quantile_cont(y, 0.99)) AS BIGINT) AS t99
  FROM docs
)
SELECT * FROM ({body}) ORDER BY threshold
"""


SQL_ZONE_MAP_PRUNING = _sql_zone_map()


# -- posting intersection cost model ---------------------------------------------------------------------------------

_IXC_TOP = 8  # model the all-pairs costs over the top-df terms


def q_intersection_cost_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-at-a-time AND-query cost model: for every pair of the
    top-{top} df terms, the three classic posting-intersection costs —
    linear merge (df1 + df2), galloping/SVS search from the short list
    into the long (min_df * (1 + floor(log2(max_df / min_df))),
    Demaine et al SODA'00), and bitmap AND (universe/64 words) — plus
    which strategy wins. The query-processing companion to the storage
    family (varint/EF/FOR/Roaring store the lists; this decides how to
    INTERSECT them), and exactly the adaptive choice Lucene makes per
    query. Integer-exact: the log2 is the CASE ladder, the argmin has
    a fixed tie order (merge < gallop < bitmap).

    Scale shape: one vocab agg -> TakeOrdered {top} (broadcast both
    sides of the tiny pair frame), 1-row universe broadcast; costs are
    map-side arithmetic on {top} * ({top}-1) / 2 rows."""
    post = (
        _tokens(_docs_parallel(spark, sf_dir))
        .select(F.explode("toks").alias("term"), "doc_id")
        .distinct()
    )
    uni = post.agg((F.max("doc_id") + 1).cast("bigint").alias("u"))
    top = (
        post.groupBy("term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("df"))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(_IXC_TOP)
        .localCheckpoint()
    )
    a = top.select(F.col("term").alias("ta"), F.col("df").alias("dfa"))
    b = top.select(F.col("term").alias("tb"), F.col("df").alias("dfb"))
    pairs = a.join(b, F.col("ta") < F.col("tb")).select(
        "ta",
        "tb",
        F.least("dfa", "dfb").alias("df_min"),
        F.greatest("dfa", "dfb").alias("df_max"),
    )
    return (
        pairs.crossJoin(F.broadcast(uni))
        .withColumn("q", F.expr("df_max div df_min"))
        .withColumn("merge_ops", F.expr("df_min + df_max").cast("bigint"))
        .withColumn(
            "gallop_ops",
            F.expr(f"df_min * (1 + ({_LOG2_CASE}))").cast("bigint"),
        )
        .withColumn("bitmap_ops", F.expr("(u + 63) div 64").cast("bigint"))
        .withColumn(
            "best",
            F.expr(
                "case when merge_ops <= gallop_ops and merge_ops <= bitmap_ops then 'merge' "
                "when gallop_ops <= bitmap_ops then 'gallop' else 'bitmap' end"
            ),
        )
        .select("ta", "tb", "df_min", "df_max", "merge_ops", "gallop_ops", "bitmap_ops", "best")
        .orderBy("ta", "tb")
    )


q_intersection_cost_model.__doc__ = q_intersection_cost_model.__doc__.format(
    top=_IXC_TOP
)


SQL_INTERSECTION_COST_MODEL = f"""
WITH toks AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
post AS (SELECT DISTINCT t.term, toks.doc_id FROM toks, unnest(toks.toks) AS t(term)),
uni AS (SELECT (max(doc_id) + 1)::BIGINT AS u FROM post),
top AS (
  SELECT term, count(*)::BIGINT AS df FROM post GROUP BY term
  ORDER BY df DESC, term ASC LIMIT {_IXC_TOP}
), pairs AS (
  SELECT a.term AS ta, b.term AS tb,
         least(a.df, b.df) AS df_min, greatest(a.df, b.df) AS df_max
  FROM top a JOIN top b ON a.term < b.term
), costs AS (
  SELECT ta, tb, df_min, df_max,
         (df_min + df_max)::BIGINT AS merge_ops,
         (df_min * (1 + ({_LOG2_CASE.replace("q", "(df_max // df_min)")})))::BIGINT AS gallop_ops,
         ((u + 63) // 64)::BIGINT AS bitmap_ops
  FROM pairs CROSS JOIN uni
)
SELECT ta, tb, df_min, df_max, merge_ops, gallop_ops, bitmap_ops,
       CASE WHEN merge_ops <= gallop_ops AND merge_ops <= bitmap_ops THEN 'merge'
            WHEN gallop_ops <= bitmap_ops THEN 'gallop' ELSE 'bitmap' END AS best
FROM costs ORDER BY ta, tb
"""


# -- query expansion by co-occurrence lift --------------------------------------------------------------------------------

_TEXP_TOP = 10


def q_term_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pseudo-relevance query expansion by document-level co-occurrence
    lift: for the deterministic query term (df rank {rank}, the same
    pick as kwic_concordance), the top {top} expansion candidates by
    lift = P(t | q-docs) / P(t | corpus), computed on exact document
    frequencies — the association-mining view of Rocchio expansion,
    and distinct from `pmi_collocations` (ADJACENT-bigram phrases):
    this finds topically-bound vocabulary anywhere in the document.
    Integer ppm lift with (term) tie-breaks.

    Scale shape: vocab df agg, the 1-row query term broadcast, one
    semi-join to mark query-docs, a second df agg over that slice —
    both aggs shuffle the (term, doc) frame once each; TakeOrdered
    {top}."""
    post = (
        _tokens(_docs_parallel(spark, sf_dir))
        .select("doc_id", F.explode("toks").alias("term"))
        .distinct()
        .localCheckpoint()
    )
    df = post.groupBy("term").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    target = (
        df.orderBy(F.desc("df"), F.asc("term"))
        .limit(_KWIC_RANK)
        .orderBy(F.asc("df"), F.asc("term"))
        .limit(1)
        .select(F.col("term").alias("qterm"))
    )
    n_docs = post.agg(F.countDistinct("doc_id").cast("bigint").alias("n"))
    qdocs = (
        post.join(F.broadcast(target), F.col("term") == F.col("qterm"))
        .select("doc_id")
        .localCheckpoint()
    )
    nq = qdocs.agg(F.count(F.lit(1)).cast("bigint").alias("nq"))
    co = (
        post.join(F.broadcast(qdocs), "doc_id")
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("df_q"))
    )
    return (
        co.join(df, "term")
        .crossJoin(F.broadcast(nq))
        .crossJoin(F.broadcast(n_docs))
        .crossJoin(F.broadcast(target))
        .filter(F.col("term") != F.col("qterm"))
        .select(
            "qterm",
            "term",
            "df_q",
            "df",
            F.expr("df_q * n * 1000000 div (df * nq)")
            .cast("bigint")
            .alias("lift_ppm"),
        )
        .orderBy(F.desc("lift_ppm"), F.asc("term"))
        .limit(_TEXP_TOP)
    )


q_term_expansion.__doc__ = q_term_expansion.__doc__.format(
    rank=_KWIC_RANK, top=_TEXP_TOP
)


SQL_TERM_EXPANSION = f"""
WITH toks AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
post AS (SELECT DISTINCT doc_id, unnest(toks) AS term FROM toks),
df AS (SELECT term, count(*)::BIGINT AS df FROM post GROUP BY term),
target AS (
  SELECT term AS qterm FROM (
    SELECT term, df FROM df ORDER BY df DESC, term ASC LIMIT {_KWIC_RANK}
  ) ORDER BY df ASC, term ASC LIMIT 1
), n_docs AS (SELECT count(DISTINCT doc_id)::BIGINT AS n FROM post),
qdocs AS (
  SELECT doc_id FROM post JOIN target ON post.term = target.qterm
), nq AS (SELECT count(*)::BIGINT AS nq FROM qdocs),
co AS (
  SELECT term, count(*)::BIGINT AS df_q
  FROM post JOIN qdocs USING (doc_id) GROUP BY term
)
SELECT qterm, co.term, df_q, df,
       (df_q * n * 1000000 // (df * nq))::BIGINT AS lift_ppm
FROM co
JOIN df ON co.term = df.term
CROSS JOIN nq CROSS JOIN n_docs CROSS JOIN target
WHERE co.term <> qterm
ORDER BY lift_ppm DESC, co.term ASC LIMIT {_TEXP_TOP}
"""


# -- A/A test calibration ---------------------------------------------------------------------------------------------------


def q_aa_test_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/A-test calibration (the experimentation-hygiene null check):
    split the corpus into two arms by a hash bit, compare mean document
    length with the pooled two-sample z^2 statistic — on a correct
    split this must hover near its null expectation (z^2 ~ chi2_1,
    median ~ 0.45), and any systematic excess means the assignment or
    the metric pipeline is broken BEFORE anyone runs a real A/B test
    (Kohavi's 'trustworthy experiments' checklist). Integer-exact:
    z^2 = n1*n2*(n2*s1 - n1*s2)^2 / (n1*n2*(n1+n2)*SS_pooled) collapses
    to a ratio of integer products; reported in milli.

    Scale shape: single pass, one aggregate folding both arms'
    (n, sum, sumsq) with the corpus mean centered first (1-row
    broadcast) to keep squares small — no join, 1-row output."""
    docs = _read(spark, sf_dir, "documents").select(
        "doc_id", F.col("n_chars").cast("bigint").alias("y")
    )
    mean = docs.agg(F.expr("sum(y) div count(1)").cast("bigint").alias("c0"))
    z = docs.crossJoin(F.broadcast(mean)).select(
        (
            F.expr(
                "cast(conv(substring(md5(cast(doc_id as string)), 1, 4), 16, 10) as bigint)"
            )
            % 2
            == 0
        ).alias("arm_a"),
        F.expr("y - c0").cast("bigint").alias("z"),
    )
    agg = z.agg(
        F.sum(F.when(F.col("arm_a"), 1).otherwise(0)).cast("bigint").alias("n1"),
        F.sum(F.when(~F.col("arm_a"), 1).otherwise(0)).cast("bigint").alias("n2"),
        F.sum(F.when(F.col("arm_a"), F.col("z")).otherwise(0))
        .cast("bigint")
        .alias("s1"),
        F.sum(F.when(~F.col("arm_a"), F.col("z")).otherwise(0))
        .cast("bigint")
        .alias("s2"),
        F.sum(F.expr("z * z")).cast("bigint").alias("qq"),
    )
    # pooled variance (uncentered-by-arm is fine under the null):
    # z^2 = (n2*s1 - n1*s2)^2 * (n1 + n2) / (n1 * n2 * ((n1+n2)*qq - (s1+s2)^2))
    return agg.select(
        "n1",
        "n2",
        F.expr("s1 * 1000 div n1").cast("bigint").alias("mean1_delta_milli"),
        F.expr("s2 * 1000 div n2").cast("bigint").alias("mean2_delta_milli"),
        F.expr(
            "(n2 * s1 - n1 * s2) * (n2 * s1 - n1 * s2) div (n1 * n2) * (n1 + n2) * 1000 "
            "div ((n1 + n2) * qq - (s1 + s2) * (s1 + s2))"
        )
        .cast("bigint")
        .alias("z2_milli"),
    )


SQL_AA_TEST_CALIBRATION = """
WITH mean AS (
  SELECT (sum(n_chars::BIGINT) // count(*))::BIGINT AS c0 FROM documents
), z AS (
  SELECT ('0x' || substr(md5(doc_id::VARCHAR), 1, 4))::BIGINT % 2 = 0 AS arm_a,
         (n_chars::BIGINT - c0)::BIGINT AS z
  FROM documents CROSS JOIN mean
), agg AS (
  SELECT sum(CASE WHEN arm_a THEN 1 ELSE 0 END)::BIGINT AS n1,
         sum(CASE WHEN arm_a THEN 0 ELSE 1 END)::BIGINT AS n2,
         sum(CASE WHEN arm_a THEN z ELSE 0 END)::BIGINT AS s1,
         sum(CASE WHEN arm_a THEN 0 ELSE z END)::BIGINT AS s2,
         sum(z * z)::BIGINT AS qq
  FROM z
)
SELECT n1, n2,
       (s1 * 1000 // n1)::BIGINT AS mean1_delta_milli,
       (s2 * 1000 // n2)::BIGINT AS mean2_delta_milli,
       ((n2 * s1 - n1 * s2) * (n2 * s1 - n1 * s2) // (n1 * n2) * (n1 + n2) * 1000
        // ((n1 + n2) * qq - (s1 + s2) * (s1 + s2)))::BIGINT AS z2_milli
FROM agg
"""


# -- Poisson bootstrap confidence interval ---------------------------------------------------------------------------

_PBOOT_B = 40

# floor(1e6 * CDF(k)) of Poisson(1) for k = 0..8; draws >= the last
# threshold get weight 9. Hardcoded so both engines share one ladder.
_PBOOT_CDF_PPM = (367879, 735758, 919698, 981011, 996340, 999405, 999916, 999989, 999998)

_PBOOT_LADDER = (
    "case "
    + " ".join(
        f"when u < {t} then {k}" for k, t in enumerate(_PBOOT_CDF_PPM)
    )
    + " else 9 end"
)


def q_poisson_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap CI for the mean token count per document
    (Chamandy et al., "Estimating Uncertainty for Massive Data Streams",
    Google 2012): each of B={b} replicates re-weights every doc by an
    independent Poisson(1) draw instead of resampling n-out-of-n — the
    only bootstrap that works when n is unknown until the scan ends and
    the data never fits one machine, because the weights are generated
    row-locally and every replicate mean is a plain weighted aggregate
    with map-side partials. The draw is the repo's standard cross-engine
    uniform (md5(doc_id|b) first 8 hex digits -> ppm) pushed through the
    hardcoded Poisson(1) CDF ladder, so both engines materialize
    bit-identical weight matrices. Replicate means in integer micro-units
    (1e6*Sigma(w*len) div Sigma(w)); the 95% CI is the rank-1 / rank-{hi}
    order statistic of the {b} means (ceil(0.025*B), ceil(0.975*B)).

    Scale shape: one map pass computes len, explode x{b} replicate ids,
    ONE groupBy(b) with map-side combine -> {b} rows; the rank window
    orders {b} rows. At 100 TB the explode never materializes a resample
    — it is {b} counters per input split."""
    lens = (
        _tokens(_docs_parallel(spark, sf_dir))
        .select("doc_id", F.expr("cast(size(toks) as bigint)").alias("len"))
    )
    reps = lens.select(
        "doc_id",
        "len",
        F.explode(F.sequence(F.lit(0), F.lit(_PBOOT_B - 1))).alias("b"),
    ).withColumn(
        "u",
        F.expr(
            "cast(conv(substring(md5(concat(cast(doc_id as string), '|', "
            "cast(b as string))), 1, 8), 16, 10) as bigint) % 1000000"
        ),
    ).withColumn("w", F.expr(_PBOOT_LADDER).cast("bigint"))
    means = reps.groupBy("b").agg(
        F.expr("1000000 * sum(w * len) div greatest(sum(w), 1)")
        .cast("bigint")
        .alias("mean_micro")
    )
    rk = F.row_number().over(Window.orderBy(F.asc("mean_micro"), F.asc("b")))
    lo_rk = math.ceil(0.025 * _PBOOT_B)
    hi_rk = math.ceil(0.975 * _PBOOT_B)
    ci = (
        means.withColumn("rk", rk)
        .filter(F.col("rk").isin(lo_rk, hi_rk))
        .groupBy()
        .agg(
            F.min("mean_micro").cast("bigint").alias("boot_lo_micro"),
            F.max("mean_micro").cast("bigint").alias("boot_hi_micro"),
        )
    )
    point = lens.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.expr("1000000 * sum(len) div count(*)").cast("bigint").alias("point_mean_micro"),
    )
    return (
        point.crossJoin(F.broadcast(ci))
        .withColumn(
            "width_micro",
            F.expr("boot_hi_micro - boot_lo_micro").cast("bigint"),
        )
        .select("n_docs", "point_mean_micro", "boot_lo_micro", "boot_hi_micro", "width_micro")
    )


q_poisson_bootstrap_ci.__doc__ = q_poisson_bootstrap_ci.__doc__.format(
    b=_PBOOT_B, hi=math.ceil(0.975 * _PBOOT_B)
)


SQL_POISSON_BOOTSTRAP_CI = f"""
WITH lens AS (
  SELECT doc_id, len({_SQL_TOKS})::BIGINT AS len FROM documents
), reps AS (
  SELECT doc_id, len, b,
         ('0x' || substr(md5(doc_id::VARCHAR || '|' || b::VARCHAR), 1, 8))::BIGINT
           % 1000000 AS u
  FROM lens CROSS JOIN (SELECT range::INTEGER AS b FROM range({_PBOOT_B})) r
), weighted AS (
  SELECT b, len, ({_PBOOT_LADDER})::BIGINT AS w FROM reps
), means AS (
  SELECT b, (1000000 * sum(w * len) // greatest(sum(w), 1))::BIGINT AS mean_micro
  FROM weighted GROUP BY b
), ranked AS (
  SELECT mean_micro,
         row_number() OVER (ORDER BY mean_micro ASC, b ASC) AS rk
  FROM means
), ci AS (
  SELECT min(mean_micro)::BIGINT AS boot_lo_micro,
         max(mean_micro)::BIGINT AS boot_hi_micro
  FROM ranked WHERE rk IN ({math.ceil(0.025 * _PBOOT_B)}, {math.ceil(0.975 * _PBOOT_B)})
), point AS (
  SELECT count(*)::BIGINT AS n_docs,
         (1000000 * sum(len) // count(*))::BIGINT AS point_mean_micro
  FROM lens
)
SELECT n_docs, point_mean_micro, boot_lo_micro, boot_hi_micro,
       (boot_hi_micro - boot_lo_micro)::BIGINT AS width_micro
FROM point CROSS JOIN ci
"""


# -- clustered-sampling design effect (intraclass correlation) -------------------------------------------------------


def q_design_effect_icc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survey-sampling design effect of cluster sampling by source
    (Kish 1965): one-way ANOVA over y = n_chars grouped by the source
    cluster gives the intraclass correlation
    ICC = (MSB - MSW) / (MSB + (m0 - 1) * MSW) and
    DEFF = 1 + (m_bar - 1) * ICC — how much variance a host/source-
    clustered crawl sample costs vs simple random sampling, i.e. the
    multiplier on every sample-size calculation (`sample_size_power`)
    when the sample is drawn crawl-style (whole hosts at a time) rather
    than doc-at-a-time. All ANOVA inputs (per-cluster n_i, S_i, Q_i and
    their squares) stay exact integers; the three closed forms are the
    only doubles, composed identically on both engines and rounded 6dp.

    Scale shape: ONE groupBy(source) with map-side partials -> k rows,
    then a 1-row aggregate; no joins, no windows."""
    per = (
        _read(spark, sf_dir, "documents")
        .select("source", F.col("n_chars").cast("bigint").alias("y"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_i"),
            F.sum("y").cast("bigint").alias("s_i"),
            F.sum(F.expr("y * y")).cast("bigint").alias("q_i"),
        )
    )
    agg = per.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("n_i").cast("bigint").alias("n"),
        F.sum("s_i").cast("bigint").alias("g"),
        F.sum("q_i").cast("bigint").alias("qq"),
        F.sum(F.expr("s_i * s_i div n_i")).cast("bigint").alias("t"),
        F.sum(F.expr("n_i * n_i")).cast("bigint").alias("sn2"),
    )
    return agg.select(
        F.col("k").alias("k_clusters"),
        F.col("n").alias("n_total"),
        F.round(
            F.expr("cast(t - g * g div n as double) / cast(k - 1 as double)"), 6
        ).alias("msb"),
        F.round(
            F.expr("cast(qq - t as double) / cast(n - k as double)"), 6
        ).alias("msw"),
        F.round(
            F.expr(
                "(cast(t - g * g div n as double) / cast(k - 1 as double)"
                " - cast(qq - t as double) / cast(n - k as double))"
                " / (cast(t - g * g div n as double) / cast(k - 1 as double)"
                " + (cast(n - sn2 div n as double) / cast(k - 1 as double) - 1.0)"
                " * cast(qq - t as double) / cast(n - k as double))"
            ),
            6,
        ).alias("icc"),
        F.round(
            F.expr(
                "1.0 + (cast(n as double) / cast(k as double) - 1.0) * ("
                "(cast(t - g * g div n as double) / cast(k - 1 as double)"
                " - cast(qq - t as double) / cast(n - k as double))"
                " / (cast(t - g * g div n as double) / cast(k - 1 as double)"
                " + (cast(n - sn2 div n as double) / cast(k - 1 as double) - 1.0)"
                " * cast(qq - t as double) / cast(n - k as double)))"
            ),
            6,
        ).alias("deff"),
    )


SQL_DESIGN_EFFECT_ICC = """
WITH per AS (
  SELECT source, count(*)::BIGINT AS n_i,
         sum(n_chars::BIGINT)::BIGINT AS s_i,
         sum(n_chars::BIGINT * n_chars::BIGINT)::BIGINT AS q_i
  FROM documents GROUP BY source
), agg AS (
  SELECT count(*)::BIGINT AS k, sum(n_i)::BIGINT AS n, sum(s_i)::BIGINT AS g,
         sum(q_i)::BIGINT AS qq, sum(s_i * s_i // n_i)::BIGINT AS t,
         sum(n_i * n_i)::BIGINT AS sn2
  FROM per
)
SELECT k AS k_clusters, n AS n_total,
       round((t - g * g // n)::DOUBLE / (k - 1)::DOUBLE, 6) AS msb,
       round((qq - t)::DOUBLE / (n - k)::DOUBLE, 6) AS msw,
       round(((t - g * g // n)::DOUBLE / (k - 1)::DOUBLE
              - (qq - t)::DOUBLE / (n - k)::DOUBLE)
             / ((t - g * g // n)::DOUBLE / (k - 1)::DOUBLE
                + ((n - sn2 // n)::DOUBLE / (k - 1)::DOUBLE - 1.0)
                  * (qq - t)::DOUBLE / (n - k)::DOUBLE), 6) AS icc,
       round(1.0 + (n::DOUBLE / k::DOUBLE - 1.0) * (
             ((t - g * g // n)::DOUBLE / (k - 1)::DOUBLE
              - (qq - t)::DOUBLE / (n - k)::DOUBLE)
             / ((t - g * g // n)::DOUBLE / (k - 1)::DOUBLE
                + ((n - sn2 // n)::DOUBLE / (k - 1)::DOUBLE - 1.0)
                  * (qq - t)::DOUBLE / (n - k)::DOUBLE)), 6) AS deff
FROM agg
"""


# -- McNemar paired classifier comparison ----------------------------------------------------------------------------


def q_mcnemar_paired(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's paired test comparing two rule-based English detectors
    on the SAME documents against the lang label: classifier A predicts
    'en' when 16*stopword_count >= token_count (ratio >= 1/16),
    classifier B when the token 'the' occurs. Discordant pairs
    b (A right, B wrong) and c (A wrong, B right) drive the
    continuity-corrected statistic chi2 = (|b-c|-1)^2/(b+c) — the test
    you must use when A/B-ing a filter revision on a shared corpus
    (paired designs kill the between-doc variance that a two-proportion
    z-test would drown in). Integer-exact: chi2 in micro-units by
    cross-multiplication; the significance flag compares against
    3.841459 (chi2_1, alpha=0.05) in integers.

    Scale shape: pure map (two token predicates) + ONE 1-row aggregate
    with map-side partials; no joins, no windows, no shuffle beyond the
    4-counter combine."""
    marked = _tokens(_read(spark, sf_dir, "documents")).select(
        (F.col("lang") == "en").alias("truth"),
        F.expr(
            f"16 * size(filter(toks, t -> array_contains({_SPARK_STOPLIST}, t)))"
            " >= size(toks)"
        ).alias("pred_a"),
        F.expr("array_contains(toks, 'the')").alias("pred_b"),
    )
    agg = marked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(
            F.expr(
                "cast((pred_a = truth) and (pred_b <> truth) as bigint)"
            )
        ).cast("bigint").alias("b_discordant"),
        F.sum(
            F.expr(
                "cast((pred_a <> truth) and (pred_b = truth) as bigint)"
            )
        ).cast("bigint").alias("c_discordant"),
        F.sum(F.expr("cast((pred_a = truth) and (pred_b = truth) as bigint)"))
        .cast("bigint")
        .alias("both_right"),
    )
    return agg.select(
        "n_docs",
        "both_right",
        "b_discordant",
        "c_discordant",
        F.expr(
            "1000000 * (abs(b_discordant - c_discordant) - 1)"
            " * (abs(b_discordant - c_discordant) - 1)"
            " div greatest(b_discordant + c_discordant, 1)"
        )
        .cast("bigint")
        .alias("chi2_micro"),
        F.expr(
            "1000000 * (abs(b_discordant - c_discordant) - 1)"
            " * (abs(b_discordant - c_discordant) - 1)"
            " div greatest(b_discordant + c_discordant, 1) > 3841459"
        ).alias("significant"),
    )


SQL_MCNEMAR_PAIRED = f"""
WITH toks AS (
  SELECT lang, {_SQL_TOKS} AS toks FROM documents
), marked AS (
  SELECT (lang = 'en') AS truth,
         16 * len(list_filter(toks, t -> list_contains({_SQL_STOPLIST}, t)))
           >= len(toks) AS pred_a,
         list_contains(toks, 'the') AS pred_b
  FROM toks
), agg AS (
  SELECT count(*)::BIGINT AS n_docs,
         sum(CASE WHEN pred_a = truth AND pred_b <> truth THEN 1 ELSE 0 END)::BIGINT
           AS b_discordant,
         sum(CASE WHEN pred_a <> truth AND pred_b = truth THEN 1 ELSE 0 END)::BIGINT
           AS c_discordant,
         sum(CASE WHEN pred_a = truth AND pred_b = truth THEN 1 ELSE 0 END)::BIGINT
           AS both_right
  FROM marked
)
SELECT n_docs, both_right, b_discordant, c_discordant,
       (1000000 * (abs(b_discordant - c_discordant) - 1)
        * (abs(b_discordant - c_discordant) - 1)
        // greatest(b_discordant + c_discordant, 1))::BIGINT AS chi2_micro,
       (1000000 * (abs(b_discordant - c_discordant) - 1)
        * (abs(b_discordant - c_discordant) - 1)
        // greatest(b_discordant + c_discordant, 1)) > 3841459 AS significant
FROM agg
"""


# -- dictionary-encoding benefit model -------------------------------------------------------------------------------


def q_dict_encoding_benefit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dictionary-encoding size model for the low-cardinality string
    columns (lang, source) of the documents table — the decision
    Parquet/ORC writers make per column chunk: raw_bytes = sum of value
    lengths vs enc_bytes = bit-packed codes (n * ceil(log2(ndv)) bits)
    + the dictionary payload (each distinct value once). The planning
    view for the catalog's file layout: a column whose savings_ppm is
    high wants dictionary pages and dictionary-aware predicate pushdown
    (compare `sort_rle_benefit`, which models run lengths AFTER a sort —
    this models pure dictionary coding in arrival order).

    Integer-exact throughout: ceil(log2(ndv)) is the shared CASE ladder
    on ndv-1, byte counts are integer ceil-division. Scale shape: a
    2-column union scan -> ONE (col, value) groupBy with map-side
    partials -> per-col rollup of the tiny distinct frame; no joins."""
    docs = _read(spark, sf_dir, "documents")
    cols = docs.select(
        F.lit("lang").alias("col"), F.col("lang").alias("v")
    ).unionAll(docs.select(F.lit("source").alias("col"), F.col("source").alias("v")))
    per_val = cols.groupBy("col", "v").agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    per_col = per_val.groupBy("col").agg(
        F.sum("cnt").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("ndv"),
        F.sum(F.expr("cnt * length(v)")).cast("bigint").alias("raw_bytes"),
        F.sum(F.expr("length(v)")).cast("bigint").alias("dict_bytes"),
    )
    bits = (
        "case when ndv <= 1 then 0 else 1 + ("
        + _LOG2_CASE.replace("q", "(ndv - 1)")
        + ") end"
    )
    return (
        per_col.withColumn("code_bits", F.expr(bits).cast("bigint"))
        .withColumn(
            "enc_bytes",
            F.expr("(n * code_bits + 7) div 8 + dict_bytes").cast("bigint"),
        )
        .withColumn(
            "savings_ppm",
            F.expr(
                "greatest(raw_bytes - enc_bytes, 0) * 1000000 div greatest(raw_bytes, 1)"
            ).cast("bigint"),
        )
        .select("col", "n", "ndv", "raw_bytes", "code_bits", "enc_bytes", "savings_ppm")
        .orderBy("col")
    )


SQL_DICT_ENCODING_BENEFIT = f"""
WITH cols AS (
  SELECT 'lang' AS col, lang AS v FROM documents
  UNION ALL
  SELECT 'source' AS col, source AS v FROM documents
), per_val AS (
  SELECT col, v, count(*)::BIGINT AS cnt FROM cols GROUP BY col, v
), per_col AS (
  SELECT col, sum(cnt)::BIGINT AS n, count(*)::BIGINT AS ndv,
         sum(cnt * length(v))::BIGINT AS raw_bytes,
         sum(length(v))::BIGINT AS dict_bytes
  FROM per_val GROUP BY col
), coded AS (
  SELECT col, n, ndv, raw_bytes, dict_bytes,
         (CASE WHEN ndv <= 1 THEN 0 ELSE 1 + ({_LOG2_CASE.replace("q", "(ndv - 1)")}) END)::BIGINT
           AS code_bits
  FROM per_col
)
SELECT col, n, ndv, raw_bytes, code_bits,
       ((n * code_bits + 7) // 8 + dict_bytes)::BIGINT AS enc_bytes,
       (greatest(raw_bytes - ((n * code_bits + 7) // 8 + dict_bytes), 0) * 1000000
        // greatest(raw_bytes, 1))::BIGINT AS savings_ppm
FROM coded ORDER BY col
"""


# -- Markov-chain entropy rate ---------------------------------------------------------------------------------------

_MER_STEPS = 3


def q_markov_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entropy rate of the per-user event-type Markov chain
    (Shannon 1948; Cover & Thomas ch.4): H = sum_i pi_i * H(next | i)
    with the stationary distribution pi approximated by {steps} unrolled
    power-iteration steps from uniform — the behavioural randomness
    score that separates bots (near-zero rate: deterministic loops)
    from organic sessions (diffuse transitions). Composes the
    transition counts of `markov_transitions` with an all-integer
    pi iteration: pi'_j = sum_i (pi_i_nano * c_ij) div r_i, every term
    an integer floor-division, so the trajectory is bit-identical on
    both engines; per-term entropy contributions floor to integer
    nano-bits BEFORE summation (order-independent).

    Scale shape: one per-user window for transition pairs, one
    (state, state) groupBy — the state space |event_types|^2 is tiny,
    so the {steps} iteration joins are broadcast-trivial; output is one
    row per state plus exact-integer contributions whose sum is the
    rate."""
    ev = _read(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        _us("ts").alias("ts_us"),
        "event_type",
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    pairs = ev.select(
        F.col("event_type").alias("i"),
        F.lead("event_type").over(w).alias("j"),
    ).filter(F.col("j").isNotNull())
    counts = (
        pairs.groupBy("i", "j")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .localCheckpoint()
    )
    rows = counts.groupBy("i").agg(F.sum("c").cast("bigint").alias("r"))
    trans = counts.join(F.broadcast(rows), "i").select(
        "i",
        "j",
        "c",
        "r",
        # p_ppm >= 1: a transition observed at least once never floors to a
        # zero probability (guards the log2 at r > 1e6 * c extremes)
        F.expr("greatest(c * 1000000 div r, 1)").cast("bigint").alias("p_ppm"),
    ).localCheckpoint()
    k = rows.count()
    pi = rows.select(F.col("i").alias("s"), F.lit(1_000_000_000 // k).cast("bigint").alias("pi_nano"))
    for _ in range(_MER_STEPS):
        pi = (
            trans.join(F.broadcast(pi), trans["i"] == pi["s"])
            .select("j", F.expr("pi_nano * c div r").cast("bigint").alias("m"))
            .groupBy("j")
            .agg(F.sum("m").cast("bigint").alias("pi_nano"))
            .select(F.col("j").alias("s"), "pi_nano")
            .localCheckpoint()
        )
    hstate = trans.groupBy("i").agg(
        F.sum(
            F.expr(
                "cast(floor(cast(p_ppm as double) * 1000.0 * log2(1000000.0 / cast(p_ppm as double))) as bigint)"
            )
        )
        .cast("bigint")
        .alias("h_state_nano")
    )
    return (
        hstate.join(F.broadcast(pi), hstate["i"] == pi["s"])
        .select(
            F.col("i").alias("state"),
            "pi_nano",
            "h_state_nano",
            F.expr("pi_nano * h_state_nano div 1000000000").cast("bigint").alias("contrib_nano"),
        )
        .orderBy("state")
    )


def _sql_markov_entropy_rate() -> str:
    steps = []
    prev = "pi0"
    for s in range(1, _MER_STEPS + 1):
        steps.append(
            f"pi{s} AS (SELECT t.j AS s, sum(p.pi_nano * t.c // t.r)::BIGINT AS pi_nano "
            f"FROM trans t JOIN {prev} p ON t.i = p.s GROUP BY t.j)"
        )
        prev = f"pi{s}"
    return f"""
WITH ev AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type FROM events
), pairs AS (
  SELECT event_type AS i,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS j
  FROM ev
), counts AS (
  SELECT i, j, count(*)::BIGINT AS c FROM pairs WHERE j IS NOT NULL GROUP BY i, j
), rows_t AS (
  SELECT i, sum(c)::BIGINT AS r FROM counts GROUP BY i
), trans AS (
  SELECT c.i, c.j, c.c, r.r, greatest(c.c * 1000000 // r.r, 1)::BIGINT AS p_ppm
  FROM counts c JOIN rows_t r ON c.i = r.i
), pi0 AS (
  SELECT i AS s,
         (1000000000 // (SELECT count(*) FROM rows_t))::BIGINT AS pi_nano
  FROM rows_t
), {", ".join(steps)},
hstate AS (
  SELECT i,
         sum(floor(p_ppm::DOUBLE * 1000.0 * log2(1000000.0 / p_ppm::DOUBLE))::BIGINT)::BIGINT
           AS h_state_nano
  FROM trans GROUP BY i
)
SELECT h.i AS state, p.pi_nano, h.h_state_nano,
       (p.pi_nano * h.h_state_nano // 1000000000)::BIGINT AS contrib_nano
FROM hstate h JOIN {prev} p ON h.i = p.s
ORDER BY state
"""


SQL_MARKOV_ENTROPY_RATE = _sql_markov_entropy_rate()


# -- B-cubed clustering evaluation -----------------------------------------------------------------------------------


def q_bcubed_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-cubed precision/recall/F1 of a predicted clustering against
    gold labels (Bagga & Baldwin 1998; Amigo et al. 2009 showed it is
    the only cluster metric satisfying all four formal constraints) —
    predicted = source, gold = lang on the documents table. The
    per-item averages reduce to closed forms over the (cluster, label)
    contingency counts: B3P = (1/N) sum_cl n_cl^2 / n_cluster,
    B3R = (1/N) sum_cl n_cl^2 / n_label — the metric a dedup or topic
    clustering is graded with when pairwise P/R (`blocking_eval`) would
    be dominated by the biggest clusters (B-cubed weights per item, not
    per pair). Integer micro-units, per-term floor before summation.

    Scale shape: ONE (cluster, label) groupBy; cluster sizes and label
    sizes re-aggregate that tiny contingency frame (no second corpus
    scan); broadcast joins only."""
    cl = (
        _read(spark, sf_dir, "documents")
        .groupBy(F.col("source").alias("c"), F.col("lang").alias("l"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_cl"))
        .localCheckpoint()
    )
    csz = cl.groupBy("c").agg(F.sum("n_cl").cast("bigint").alias("n_c"))
    lsz = cl.groupBy("l").agg(F.sum("n_cl").cast("bigint").alias("n_l"))
    terms = (
        cl.join(F.broadcast(csz), "c")
        .join(F.broadcast(lsz), "l")
        .select(
            F.expr("1000000 * n_cl * n_cl div n_c").cast("bigint").alias("tp"),
            F.expr("1000000 * n_cl * n_cl div n_l").cast("bigint").alias("tr"),
            "n_cl",
        )
    )
    agg = terms.agg(
        F.sum("n_cl").cast("bigint").alias("n"),
        F.sum("tp").cast("bigint").alias("sp"),
        F.sum("tr").cast("bigint").alias("sr"),
    )
    sizes = cl.agg(
        F.countDistinct("c").cast("bigint").alias("n_clusters"),
        F.countDistinct("l").cast("bigint").alias("n_labels"),
    )
    return (
        agg.crossJoin(F.broadcast(sizes))
        .select(
            F.col("n").alias("n_docs"),
            "n_clusters",
            "n_labels",
            F.expr("sp div n").cast("bigint").alias("b3p_micro"),
            F.expr("sr div n").cast("bigint").alias("b3r_micro"),
            F.expr(
                "2 * (sp div n) * (sr div n) div greatest(sp div n + sr div n, 1)"
            )
            .cast("bigint")
            .alias("b3f1_micro"),
        )
    )


SQL_BCUBED_EVAL = """
WITH cl AS (
  SELECT source AS c, lang AS l, count(*)::BIGINT AS n_cl
  FROM documents GROUP BY source, lang
), csz AS (SELECT c, sum(n_cl)::BIGINT AS n_c FROM cl GROUP BY c),
lsz AS (SELECT l, sum(n_cl)::BIGINT AS n_l FROM cl GROUP BY l),
terms AS (
  SELECT (1000000 * cl.n_cl * cl.n_cl // csz.n_c)::BIGINT AS tp,
         (1000000 * cl.n_cl * cl.n_cl // lsz.n_l)::BIGINT AS tr,
         cl.n_cl
  FROM cl JOIN csz ON cl.c = csz.c JOIN lsz ON cl.l = lsz.l
), agg AS (
  SELECT sum(n_cl)::BIGINT AS n, sum(tp)::BIGINT AS sp, sum(tr)::BIGINT AS sr
  FROM terms
), sizes AS (
  SELECT count(DISTINCT c)::BIGINT AS n_clusters,
         count(DISTINCT l)::BIGINT AS n_labels
  FROM cl
)
SELECT n AS n_docs, n_clusters, n_labels,
       (sp // n)::BIGINT AS b3p_micro,
       (sr // n)::BIGINT AS b3r_micro,
       (2 * (sp // n) * (sr // n) // greatest(sp // n + sr // n, 1))::BIGINT
         AS b3f1_micro
FROM agg CROSS JOIN sizes
"""


# -- Simpson's paradox / aggregation-reversal audit ------------------------------------------------------------------


def q_simpsons_paradox(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregation-reversal (Simpson's paradox) audit: the association
    between doc length (X: n_chars >= corpus mean) and English (Y:
    lang = 'en'), pooled vs within each source stratum. The direction
    is the sign of the 2x2 cross-product a*d - b*c (equivalent to odds
    ratio vs 1 but integer-exact, no division) — a stratum whose sign
    disagrees with the pooled sign is exactly the trap that makes
    corpus-level quality dashboards lie when the source mix shifts
    (Bickel et al., Science 1975, the canonical admissions case). The
    audit every per-source rollup should run before trusting a pooled
    trend.

    Scale shape: 1-row mean broadcast into a pure map, ONE
    groupBy(source) of four conditional counters, pooled = re-aggregate
    of the k-row stratum frame broadcast back; no corpus re-scan."""
    docs = _read(spark, sf_dir, "documents").select(
        "source", F.col("n_chars").cast("bigint").alias("nc"), "lang"
    )
    mean = docs.agg(F.expr("sum(nc) div count(*)").cast("bigint").alias("mu"))
    marked = docs.crossJoin(F.broadcast(mean)).select(
        "source",
        (F.col("nc") >= F.col("mu")).alias("x"),
        (F.col("lang") == "en").alias("y"),
    )
    strata = marked.groupBy("source").agg(
        F.sum(F.expr("cast(x and y as bigint)")).cast("bigint").alias("a"),
        F.sum(F.expr("cast(x and not y as bigint)")).cast("bigint").alias("b"),
        F.sum(F.expr("cast((not x) and y as bigint)")).cast("bigint").alias("c"),
        F.sum(F.expr("cast((not x) and (not y) as bigint)")).cast("bigint").alias("d"),
    ).localCheckpoint()
    pooled = strata.agg(
        F.expr("cast(sign(sum(a) * sum(d) - sum(b) * sum(c)) as bigint)").alias(
            "pooled_dir"
        )
    )
    return (
        strata.crossJoin(F.broadcast(pooled))
        .select(
            F.col("source").alias("stratum"),
            "a",
            "b",
            "c",
            "d",
            F.expr("cast(sign(a * d - b * c) as bigint)").alias("stratum_dir"),
            "pooled_dir",
            F.expr(
                "sign(a * d - b * c) <> 0 and sign(a * d - b * c) <> pooled_dir"
            ).alias("reversed"),
        )
        .orderBy("stratum")
    )


SQL_SIMPSONS_PARADOX = """
WITH docs AS (
  SELECT source, n_chars::BIGINT AS nc, lang FROM documents
), mean AS (
  SELECT (sum(nc) // count(*))::BIGINT AS mu FROM docs
), marked AS (
  SELECT source, (nc >= mu) AS x, (lang = 'en') AS y FROM docs CROSS JOIN mean
), strata AS (
  SELECT source,
         sum(CASE WHEN x AND y THEN 1 ELSE 0 END)::BIGINT AS a,
         sum(CASE WHEN x AND NOT y THEN 1 ELSE 0 END)::BIGINT AS b,
         sum(CASE WHEN (NOT x) AND y THEN 1 ELSE 0 END)::BIGINT AS c,
         sum(CASE WHEN (NOT x) AND (NOT y) THEN 1 ELSE 0 END)::BIGINT AS d
  FROM marked GROUP BY source
), pooled AS (
  SELECT sign(sum(a) * sum(d) - sum(b) * sum(c))::BIGINT AS pooled_dir FROM strata
)
SELECT source AS stratum, a, b, c, d,
       sign(a * d - b * c)::BIGINT AS stratum_dir,
       pooled_dir,
       (sign(a * d - b * c) <> 0 AND sign(a * d - b * c) <> pooled_dir) AS reversed
FROM strata CROSS JOIN pooled
ORDER BY stratum
"""


# -- Fleiss' kappa over rule-based raters ----------------------------------------------------------------------------


def q_fleiss_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fleiss' kappa agreement of three rule-based quality raters on
    every document (Fleiss 1971): r1 = n_chars >= corpus mean,
    r2 = token count >= corpus token mean, r3 = stopword share >= 1/16
    — the chance-corrected agreement score a labeling pipeline computes
    before trusting an ensemble of cheap heuristic filters (kappa near
    0 = the raters are independent noise; the ensemble vote means
    nothing). For n=3 raters and 2 categories the whole statistic
    collapses to three integer sums — N docs, G = total 'good' votes,
    A = total agreeing pairs per doc (3 if unanimous, 1 if 2-1) —
    giving kappa = (3NA - G^2 - (3N-G)^2) / (9N^2 - G^2 - (3N-G)^2),
    computed in exact integers and reported in micro-units.

    Scale shape: 1-row means broadcast into a pure map, then ONE 1-row
    aggregate; no joins beyond the broadcast, no windows."""
    docs = _tokens(_read(spark, sf_dir, "documents")).select(
        F.col("n_chars").cast("bigint").alias("nc"),
        F.expr("cast(size(toks) as bigint)").alias("nt"),
        F.expr(
            f"16 * size(filter(toks, t -> array_contains({_SPARK_STOPLIST}, t)))"
            " >= size(toks)"
        ).alias("r3"),
    )
    means = docs.agg(
        F.expr("sum(nc) div count(*)").cast("bigint").alias("mu_c"),
        F.expr("sum(nt) div count(*)").cast("bigint").alias("mu_t"),
    )
    votes = docs.crossJoin(F.broadcast(means)).select(
        F.expr(
            "cast(nc >= mu_c as bigint) + cast(nt >= mu_t as bigint)"
            " + cast(r3 as bigint)"
        ).alias("g")
    )
    agg = votes.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("g").cast("bigint").alias("gt"),
        # agreeing pairs per doc: C(g,2) + C(3-g,2) = 3 iff unanimous else 1
        F.sum(F.expr("case when g = 0 or g = 3 then 3 else 1 end"))
        .cast("bigint")
        .alias("a"),
    )
    return agg.select(
        F.col("n").alias("n_docs"),
        F.col("gt").alias("good_votes"),
        F.col("a").alias("agree_pairs"),
        F.expr("1000000 * a div (3 * n)").cast("bigint").alias("p_bar_micro"),
        F.expr(
            "1000000 * (gt * gt + (3 * n - gt) * (3 * n - gt)) div (9 * n * n)"
        )
        .cast("bigint")
        .alias("p_e_micro"),
        F.expr(
            "1000000 * (3 * n * a - gt * gt - (3 * n - gt) * (3 * n - gt))"
            " div (9 * n * n - gt * gt - (3 * n - gt) * (3 * n - gt))"
        )
        .cast("bigint")
        .alias("kappa_micro"),
    )


SQL_FLEISS_KAPPA = f"""
WITH docs AS (
  SELECT n_chars::BIGINT AS nc,
         len({_SQL_TOKS})::BIGINT AS nt,
         16 * len(list_filter({_SQL_TOKS}, t -> list_contains({_SQL_STOPLIST}, t)))
           >= len({_SQL_TOKS}) AS r3
  FROM documents
), means AS (
  SELECT (sum(nc) // count(*))::BIGINT AS mu_c,
         (sum(nt) // count(*))::BIGINT AS mu_t
  FROM docs
), votes AS (
  SELECT (CASE WHEN nc >= mu_c THEN 1 ELSE 0 END
          + CASE WHEN nt >= mu_t THEN 1 ELSE 0 END
          + CASE WHEN r3 THEN 1 ELSE 0 END)::BIGINT AS g
  FROM docs CROSS JOIN means
), agg AS (
  SELECT count(*)::BIGINT AS n, sum(g)::BIGINT AS gt,
         sum(CASE WHEN g = 0 OR g = 3 THEN 3 ELSE 1 END)::BIGINT AS a
  FROM votes
)
SELECT n AS n_docs, gt AS good_votes, a AS agree_pairs,
       (1000000 * a // (3 * n))::BIGINT AS p_bar_micro,
       (1000000 * (gt * gt + (3 * n - gt) * (3 * n - gt)) // (9 * n * n))::BIGINT
         AS p_e_micro,
       (1000000 * (3 * n * a - gt * gt - (3 * n - gt) * (3 * n - gt))
        // (9 * n * n - gt * gt - (3 * n - gt) * (3 * n - gt)))::BIGINT
         AS kappa_micro
FROM agg
"""


# -- SPRT early host abandonment -------------------------------------------------------------------------------------

# Wald SPRT for H0: p(good fetch) = 0.5 vs H1: p = 0.25, alpha = beta = 0.05.
# LLR increments in integer milli-nats: x=1 -> ln(0.25/0.5) = -693,
# x=0 -> ln(0.75/0.5) = +405; boundaries +-ln(19) = +-2944.
_SPRT_INC1 = -693
_SPRT_INC0 = 405
_SPRT_BOUND = 2944


def q_sprt_host_abort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald sequential probability ratio test replayed over each host's
    fetch log (Wald 1945): outcome x = (value_milli >= corpus mean) per
    event in (ts, event_id) order, log-likelihood-ratio random walk with
    hardcoded integer milli-nat increments ({inc1} per good fetch,
    +{inc0} per bad one) and +-{bound} boundaries — the earliest-possible
    abort decision for a misbehaving host with guaranteed error rates
    (alpha = beta = 0.05), i.e. the principled version of "ban a host
    after N bad fetches": SPRT needs ~half the observations of any
    fixed-N rule at the same error guarantee. Crossing +{bound} accepts
    H1 (bad host -> abort); crossing -{bound} accepts H0 (keep);
    neither = undecided at log end.

    Integer-exact: the mean threshold, every increment, the cumulative
    walk and the first-crossing index are all bigint. Scale shape: the
    prefix walk and the first-crossing groupBy share ONE host-keyed
    exchange (partition = a host's history, bounded); the 1-row mean
    broadcasts."""
    ev = _read(spark, sf_dir, "events").select(
        F.col("user_id").alias("host"),
        "event_id",
        _us("ts").alias("ts_us"),
        F.expr("cast(floor(value * 1000) as bigint)").alias("v_milli"),
    )
    mean = ev.agg(F.expr("sum(v_milli) div count(*)").cast("bigint").alias("mu"))
    w = Window.partitionBy("host").orderBy("ts_us", "event_id")
    walk = (
        ev.crossJoin(F.broadcast(mean))
        .withColumn(
            "inc",
            F.expr(
                f"case when v_milli >= mu then {_SPRT_INC1} else {_SPRT_INC0} end"
            ).cast("bigint"),
        )
        .withColumn("s", F.sum("inc").over(w).cast("bigint"))
        .withColumn("rn", F.row_number().over(w).cast("bigint"))
    )
    return (
        walk.groupBy("host")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_obs"),
            F.min(F.expr(f"case when s >= {_SPRT_BOUND} then rn end"))
            .cast("bigint")
            .alias("up_n"),
            F.min(F.expr(f"case when s <= -{_SPRT_BOUND} then rn end"))
            .cast("bigint")
            .alias("dn_n"),
        )
        .select(
            "host",
            "n_obs",
            F.expr("coalesce(least(up_n, dn_n), 0)").cast("bigint").alias("stop_n"),
            F.expr(
                "case when up_n is not null and (dn_n is null or up_n < dn_n)"
                " then 'abort' when dn_n is not null then 'keep'"
                " else 'undecided' end"
            ).alias("decision"),
        )
        .orderBy("host")
    )


q_sprt_host_abort.__doc__ = q_sprt_host_abort.__doc__.format(
    inc1=_SPRT_INC1, inc0=_SPRT_INC0, bound=_SPRT_BOUND
)


SQL_SPRT_HOST_ABORT = f"""
WITH ev AS (
  SELECT user_id AS host, event_id, epoch_us(ts) AS ts_us,
         floor(value * 1000)::BIGINT AS v_milli
  FROM events
), mean AS (
  SELECT (sum(v_milli) // count(*))::BIGINT AS mu FROM ev
), walk AS (
  SELECT host,
         sum(CASE WHEN v_milli >= mu THEN {_SPRT_INC1} ELSE {_SPRT_INC0} END)
           OVER (PARTITION BY host ORDER BY ts_us, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS s,
         row_number() OVER (PARTITION BY host ORDER BY ts_us, event_id)::BIGINT
           AS rn
  FROM ev CROSS JOIN mean
), agg AS (
  SELECT host, count(*)::BIGINT AS n_obs,
         min(CASE WHEN s >= {_SPRT_BOUND} THEN rn END)::BIGINT AS up_n,
         min(CASE WHEN s <= -{_SPRT_BOUND} THEN rn END)::BIGINT AS dn_n
  FROM walk GROUP BY host
)
SELECT host, n_obs,
       coalesce(least(up_n, dn_n), 0)::BIGINT AS stop_n,
       CASE WHEN up_n IS NOT NULL AND (dn_n IS NULL OR up_n < dn_n) THEN 'abort'
            WHEN dn_n IS NOT NULL THEN 'keep' ELSE 'undecided' END AS decision
FROM agg ORDER BY host
"""

# -- Lorenz / Gini host-concentration audit ---------------------------------------------------------------------------


def q_gini_host_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-host fetch concentration plus the Lorenz
    top-decile share: how unequally crawl traffic is spread across
    hosts. Gini = (2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x)) with hosts
    ranked ascending by count (rank ties broken by host id) — the
    single number schedulers watch, because a crawl whose Gini creeps
    toward 1 is re-fetching a handful of mega-hosts while the long tail
    starves, exactly the skew the salted politeness scheduler exists to
    prevent. Reported integer-exact in micro-units, alongside the share
    of fetches held by the top ceil(n/10) hosts.

    Scale shape: ONE groupBy(host) reduces the corpus to the bounded
    |hosts| frame; the rank window and both re-aggregates run on that
    small frame only (at 10^10 URLs the host frame is ~10^7 rows — a
    two-phase distributed rank swaps in above that, same contract)."""
    counts = (
        _read(spark, sf_dir, "events")
        .groupBy(F.col("user_id").alias("host"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    )
    ranked = counts.withColumn(
        "i",
        F.row_number().over(Window.orderBy("x", "host")).cast("bigint"),
    ).localCheckpoint()
    agg = ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("s"),
        F.sum(F.expr("i * x")).cast("bigint").alias("t"),
    )
    top = (
        ranked.crossJoin(F.broadcast(agg))
        .where(F.expr("i > n - ((n + 9) div 10)"))
        .agg(F.sum("x").cast("bigint").alias("sd"))
    )
    return (
        agg.crossJoin(F.broadcast(top))
        .select(
            F.col("n").alias("n_hosts"),
            F.col("s").alias("total_events"),
            F.expr("1000000 * (2 * t - (n + 1) * s) div (n * s)")
            .cast("bigint")
            .alias("gini_micro"),
            F.expr("1000000 * sd div s").cast("bigint").alias("top_decile_micro"),
        )
    )


SQL_GINI_HOST_CONCENTRATION = """
WITH counts AS (
  SELECT user_id AS host, count(*)::BIGINT AS x FROM events GROUP BY user_id
), ranked AS (
  SELECT host, x, row_number() OVER (ORDER BY x, host)::BIGINT AS i FROM counts
), agg AS (
  SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS s, sum(i * x)::BIGINT AS t
  FROM ranked
), top AS (
  SELECT sum(x)::BIGINT AS sd FROM ranked CROSS JOIN agg
  WHERE i > n - ((n + 9) // 10)
)
SELECT n AS n_hosts, s AS total_events,
       (1000000 * (2 * t - (n + 1) * s) // (n * s))::BIGINT AS gini_micro,
       (1000000 * sd // s)::BIGINT AS top_decile_micro
FROM agg CROSS JOIN top
"""


# -- max-min fair (water-filling) budget allocation -------------------------------------------------------------------


def q_waterfill_fairshare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max-min fair (water-filling) crawl-budget allocation: per-host
    demand d = observed event count, total budget B = sum(d) div 2, and
    the water level L* = the largest integer L with
    sum(min(d_i, L)) <= B — every host gets min(d_i, L*), i.e. small
    hosts are fully served and big hosts are capped at a common level,
    the textbook max-min fairness the largest-remainder split
    (`budget_allocation`) does NOT give (that one is proportional, so a
    mega-host still swallows the budget). Closed form on the
    demand-sorted frame: for row r (ascending, prefix sum P_r), the
    candidate level (B - P_(r-1)) div (n - r + 1) is feasible iff it is
    >= the previous demand; L* is the max feasible candidate.
    Integer-exact throughout.

    Scale shape: ONE groupBy(host) to the bounded |hosts| frame; sort
    window + two re-aggregates on that frame; 1-row budget broadcast;
    single-row output."""
    d = (
        _read(spark, sf_dir, "events")
        .groupBy(F.col("user_id").alias("host"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    )
    w = Window.orderBy("d", "host")
    rows = (
        d.withColumn("r", F.row_number().over(w).cast("bigint"))
        .withColumn("p", F.sum("d").over(w).cast("bigint"))
        .localCheckpoint()
    )
    tot = rows.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("d").cast("bigint").alias("td"),
        F.expr("sum(d) div 2").cast("bigint").alias("b"),
    )
    cand = rows.crossJoin(F.broadcast(tot)).select(
        "d",
        "r",
        "n",
        "td",
        "b",
        F.expr("(b - (p - d)) div (n - r + 1)").alias("cand"),
        F.lag("d", 1, 0).over(w).cast("bigint").alias("prev_d"),
    )
    level = cand.where(F.expr("cand >= prev_d")).agg(
        F.max("cand").cast("bigint").alias("level")
    )
    return (
        rows.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(level))
        .agg(
            F.max("n").alias("n_hosts"),
            F.max("td").alias("total_demand"),
            F.max("b").alias("budget"),
            F.max("level").cast("bigint").alias("level"),
            F.sum(F.expr("cast(d > level as bigint)")).cast("bigint").alias("n_capped"),
            F.sum(F.expr("least(d, level)")).cast("bigint").alias("allocated"),
            (F.max("b") - F.sum(F.expr("least(d, level)")))
            .cast("bigint")
            .alias("leftover"),
        )
    )


SQL_WATERFILL_FAIRSHARE = """
WITH d AS (
  SELECT user_id AS host, count(*)::BIGINT AS d FROM events GROUP BY user_id
), rows_ AS (
  SELECT host, d,
         row_number() OVER (ORDER BY d, host)::BIGINT AS r,
         sum(d) OVER (ORDER BY d, host ROWS UNBOUNDED PRECEDING)::BIGINT AS p,
         lag(d, 1, 0) OVER (ORDER BY d, host)::BIGINT AS prev_d
  FROM d
), tot AS (
  SELECT count(*)::BIGINT AS n, sum(d)::BIGINT AS td, (sum(d) // 2)::BIGINT AS b
  FROM d
), lvl AS (
  SELECT max((b - (p - d)) // (n - r + 1))::BIGINT AS level
  FROM rows_ CROSS JOIN tot
  WHERE (b - (p - d)) // (n - r + 1) >= prev_d
)
SELECT n AS n_hosts, td AS total_demand, b AS budget, level,
       sum(CASE WHEN d > level THEN 1 ELSE 0 END)::BIGINT AS n_capped,
       sum(least(d, level))::BIGINT AS allocated,
       (b - sum(least(d, level)))::BIGINT AS leftover
FROM rows_ CROSS JOIN tot CROSS JOIN lvl
GROUP BY n, td, b, level
"""


# -- content-defined chunking (Rabin-style) ---------------------------------------------------------------------------


def q_cdc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking statistics: split every document at
    positions p where the 16-char gram ending at p hashes to
    0 mod 64 (md5-prefix hash), the Rabin/LBFS boundary rule that makes
    chunk boundaries survive insertions — the storage-level dedup
    CommonCrawl-scale archives run beneath document-level dedup,
    because a boilerplate edit shifts every byte after it but CDC
    chunks realign immediately. Reports the chunk-size distribution
    bucketed by decimal-digit magnitude: bucket, chunk count, total
    chars, min/max chunk length. Expected chunk length ~64 chars by
    construction; a distribution drifting long means the content
    defeats the hash (e.g. low-entropy repetition).

    Integer-exact: the hash is the first 8 md5 hex digits as a bigint,
    identical in both engines. Scale shape: pure map-side expression
    (guarded sequence -> filter -> adjacent diffs) + explode + a
    <=4-row groupBy; at 100 TB the per-position md5 swaps to a rolling
    gear-hash Arrow kernel behind the same boundary contract."""
    bnds = (
        "filter(case when length(text) < 16 then array(0L) else"
        " sequence(16L, cast(length(text) as bigint)) end,"
        " p -> p > 0 and (cast(conv(substring(md5(substring(text,"
        " cast(p as int) - 15, 16)), 1, 8), 16, 10) as bigint) % 64) = 0)"
    )
    allb = f"concat(array(0L), {bnds}, array(cast(length(text) as bigint)))"
    lens = (
        f"filter(transform(sequence(2, size({allb})),"
        f" i -> element_at({allb}, i) - element_at({allb}, i - 1)),"
        " l -> l > 0)"
    )
    chunks = (
        _read(spark, sf_dir, "documents")
        .select(F.explode(F.expr(lens)).alias("clen"))
    )
    return (
        chunks.groupBy(
            F.length(F.col("clen").cast("string")).cast("bigint").alias("len_digits")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
            F.sum("clen").cast("bigint").alias("total_chars"),
            F.min("clen").cast("bigint").alias("min_len"),
            F.max("clen").cast("bigint").alias("max_len"),
        )
        .orderBy("len_digits")
    )


SQL_CDC_CHUNKING = """
WITH bnd AS (
  SELECT list_concat(
           list_concat(
             [0::BIGINT],
             list_filter(
               CASE WHEN len(text) < 16 THEN [0::BIGINT]
                    ELSE range(16::BIGINT, len(text)::BIGINT + 1) END,
               p -> p > 0 AND
                    (('0x' || substr(md5(substr(text, p::INTEGER - 15, 16)), 1, 8))::BIGINT
                     % 64) = 0)),
           [len(text)::BIGINT]) AS allb
  FROM documents
), lens AS (
  SELECT unnest(list_filter(
           list_transform(range(2, len(allb) + 1),
                          i -> allb[i] - allb[i - 1]),
           l -> l > 0)) AS clen
  FROM bnd
)
SELECT len(clen::VARCHAR)::BIGINT AS len_digits,
       count(*)::BIGINT AS n_chunks,
       sum(clen)::BIGINT AS total_chars,
       min(clen)::BIGINT AS min_len,
       max(clen)::BIGINT AS max_len
FROM lens
GROUP BY 1 ORDER BY len_digits
"""

# -- degree assortativity of the host graph ---------------------------------------------------------------------------


def q_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman degree assortativity of the (symmetrized) host graph: the
    Pearson correlation of endpoint degrees over all directed edge
    stubs (Newman 2002). Positive r = hubs link to hubs (social-ish
    web), negative = hubs link to leaves (hub-and-spoke spam farms) —
    the one-number structural fingerprint that separates an organic
    link neighborhood from a link farm before any content is fetched.
    All moments (M, sum j, sum jk, the two variance terms) are exact
    bigints; only the final normalization touches doubles, as
    floor(1e6 * num / sqrt(a*b)) — identical IEEE ops in both engines.

    Scale shape: edge distinct (one shuffle) -> degree groupBy -> two
    broadcast joins of the bounded degree frame back onto edges -> ONE
    1-row aggregate. At web scale the degree frame shards and the join
    switches to shuffle-on-node, same contract."""
    e = _pagerank_edges(spark, sf_dir)
    und = (
        e.select("src", "dst")
        .union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint()
    )
    deg = und.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("deg")
    )
    stubs = (
        und.join(F.broadcast(deg.withColumnRenamed("node", "src")), "src")
        .withColumnRenamed("deg", "j")
        .join(
            F.broadcast(
                deg.select(F.col("node").alias("dst"), F.col("deg").alias("k"))
            ),
            "dst",
        )
    )
    agg = stubs.agg(
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.sum("j").cast("bigint").alias("sj"),
        F.sum("k").cast("bigint").alias("sk"),
        F.sum(F.expr("j * k")).cast("bigint").alias("sjk"),
        F.sum(F.expr("j * j")).cast("bigint").alias("sjj"),
        F.sum(F.expr("k * k")).cast("bigint").alias("skk"),
    )
    return agg.select(
        F.col("m").alias("m_stubs"),
        F.expr("m * sjk - sj * sk").cast("bigint").alias("num"),
        F.expr("m * sjj - sj * sj").cast("bigint").alias("var_j"),
        F.expr("m * skk - sk * sk").cast("bigint").alias("var_k"),
        F.expr(
            "cast(floor(1000000.0 * (m * sjk - sj * sk) /"
            " sqrt(cast(m * sjj - sj * sj as double)"
            " * cast(m * skk - sk * sk as double))) as bigint)"
        ).alias("r_micro"),
    )


SQL_DEGREE_ASSORTATIVITY = f"""
WITH e AS (
  SELECT DISTINCT user_id % {_PR_NODES} AS src,
         (('0x' || substr(md5(event_id::VARCHAR), 1, 4))::BIGINT) % {_PR_NODES} AS dst
  FROM events
  WHERE user_id % {_PR_NODES}
        <> (('0x' || substr(md5(event_id::VARCHAR), 1, 4))::BIGINT) % {_PR_NODES}
), und AS (
  SELECT src, dst FROM e UNION SELECT dst AS src, src AS dst FROM e
), deg AS (
  SELECT src AS node, count(*)::BIGINT AS deg FROM und GROUP BY src
), stubs AS (
  SELECT dj.deg AS j, dk.deg AS k
  FROM und JOIN deg dj ON und.src = dj.node JOIN deg dk ON und.dst = dk.node
), agg AS (
  SELECT count(*)::BIGINT AS m, sum(j)::BIGINT AS sj, sum(k)::BIGINT AS sk,
         sum(j * k)::BIGINT AS sjk, sum(j * j)::BIGINT AS sjj,
         sum(k * k)::BIGINT AS skk
  FROM stubs
)
SELECT m AS m_stubs,
       (m * sjk - sj * sk)::BIGINT AS num,
       (m * sjj - sj * sj)::BIGINT AS var_j,
       (m * skk - sk * sk)::BIGINT AS var_k,
       floor(1000000.0 * (m * sjk - sj * sk) /
             sqrt((m * sjj - sj * sj)::DOUBLE * (m * skk - sk * sk)::DOUBLE)
       )::BIGINT AS r_micro
FROM agg
"""


# -- Zipf rank-frequency deviation -------------------------------------------------------------------------------------


def q_zipf_rank_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit of the corpus vocabulary, integer-exact: for the
    top 20 terms by frequency (ties broken lexically), the ratio
    k * f_k / f_1 in micro-units — exactly 1000000 everywhere under a
    perfect Zipf rank-frequency law f_k = f_1 / k. A natural-language
    corpus sits near 1e6 across ranks; a crawl poisoned by templated or
    generated text bows far below (flat head) or above (heavy head) —
    the vocabulary-shape sibling of `heaps_law`'s growth-curve check.

    Scale shape: tokenize -> ONE groupBy(term) to the bounded vocab
    frame, rank window on that frame only, rank-1 row broadcast back;
    20-row output."""
    vocab = (
        _tokens(_read(spark, sf_dir, "documents"))
        .select(F.explode("toks").alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("f"))
    )
    ranked = (
        vocab.withColumn(
            "k",
            F.row_number()
            .over(Window.orderBy(F.col("f").desc(), "term"))
            .cast("bigint"),
        )
        .where(F.col("k") <= 20)
        .localCheckpoint()
    )
    f1 = ranked.where(F.col("k") == 1).select(F.col("f").alias("f1"))
    return (
        ranked.crossJoin(F.broadcast(f1))
        .select(
            "k",
            "term",
            F.col("f").alias("freq"),
            F.expr("1000000 * k * f div f1").cast("bigint").alias("zipf_ratio_micro"),
        )
        .orderBy("k")
    )


SQL_ZIPF_RANK_DEVIATION = f"""
WITH vocab AS (
  SELECT t.term, count(*)::BIGINT AS f
  FROM documents, unnest({_SQL_TOKS}) AS t(term)
  GROUP BY t.term
), ranked AS (
  SELECT term, f, row_number() OVER (ORDER BY f DESC, term)::BIGINT AS k
  FROM vocab QUALIFY k <= 20
), f1 AS (
  SELECT f AS f1 FROM ranked WHERE k = 1
)
SELECT k, term, f AS freq, (1000000 * k * f // f1)::BIGINT AS zipf_ratio_micro
FROM ranked CROSS JOIN f1
ORDER BY k
"""


# -- blocked edit-distance URL near-dup --------------------------------------------------------------------------------


def q_url_editdist_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked Levenshtein near-dup over frontier URLs: URLs synthesized
    per doc (same deterministic family as `url_features`), blocked by
    host, and every same-host pair within edit distance 2 counted —
    the canonicalization fallback for URL aliases that differ by a
    session digit or trailing slash, which exact seen-hashing misses
    and fetching twice wastes budget on. Per-host output: URL count,
    pairs at distance 1 and at distance 2.

    Scale shape: the standard blocked similarity join — pure-map URL
    build, ONE shuffle on the block key (host), quadratic ONLY within a
    block (bounded by per-host frontier size; the salted scheduler caps
    it upstream), builtin JVM levenshtein, no UDFs."""
    docs = _read(spark, sf_dir, "documents").select("doc_id")
    u = docs.select(
        "doc_id",
        F.concat(
            F.lit("h"), (F.col("doc_id") % 97).cast("string")
        ).alias("host"),
        F.concat(
            F.lit("/p/"),
            F.col("doc_id").cast("string"),
            F.when(F.col("doc_id") % 3 == 0, F.lit("/")).otherwise(F.lit("")),
        ).alias("path"),
    )
    a = u.select(
        F.col("host"),
        F.col("doc_id").alias("id1"),
        F.col("path").alias("p1"),
    )
    b = u.select(
        F.col("host"),
        F.col("doc_id").alias("id2"),
        F.col("path").alias("p2"),
    )
    pairs = (
        a.join(b, "host")
        .where(F.col("id1") < F.col("id2"))
        .select("host", F.levenshtein("p1", "p2").alias("d"))
        .where(F.col("d") <= 2)
    )
    return (
        pairs.groupBy("host")
        .agg(
            F.sum(F.expr("cast(d = 1 as bigint)")).cast("bigint").alias("pairs_d1"),
            F.sum(F.expr("cast(d = 2 as bigint)")).cast("bigint").alias("pairs_d2"),
        )
        .orderBy("host")
    )


SQL_URL_EDITDIST_NEARDUP = """
WITH u AS (
  SELECT doc_id, 'h' || (doc_id % 97)::VARCHAR AS host,
         '/p/' || doc_id::VARCHAR ||
         (CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END) AS path
  FROM documents
), pairs AS (
  SELECT a.host, levenshtein(a.path, b.path) AS d
  FROM u a JOIN u b ON a.host = b.host AND a.doc_id < b.doc_id
  WHERE levenshtein(a.path, b.path) <= 2
)
SELECT host,
       sum(CASE WHEN d = 1 THEN 1 ELSE 0 END)::BIGINT AS pairs_d1,
       sum(CASE WHEN d = 2 THEN 1 ELSE 0 END)::BIGINT AS pairs_d2
FROM pairs
GROUP BY host ORDER BY host
"""

# -- Cho-Garcia-Molina page change-rate estimation ---------------------------------------------------------------------


def q_cho_change_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson change-rate estimation per host (Cho & Garcia-Molina,
    TOIT 2003): replay each host's fetch log, mark a fetch 'changed'
    when its value is at or above the corpus mean, and estimate the
    per-visit change rate as lambda = -ln((n - x + 1) / (n + 2))
    (Laplace-smoothed so x = n stays finite) — the estimator behind
    adaptive recrawl scheduling: visit hot pages more, cold pages less,
    under a fixed politeness budget. `recrawl_priority` consumes an
    age/rate signal; this query is where that rate comes FROM. The
    count pair (n, x) is integer-exact; the single ln() is rounded to
    6dp (both engines libm-stable at that precision, same treatment as
    tf-idf); the tier CASE reads the rounded value so it cannot
    disagree.

    Scale shape: 1-row mean broadcast, ONE groupBy(host); output
    |hosts| rows."""
    ev = _read(spark, sf_dir, "events").select(
        F.col("user_id").alias("host"),
        F.expr("cast(floor(value * 1000) as bigint)").alias("v_milli"),
    )
    mean = ev.agg(F.expr("sum(v_milli) div count(*)").cast("bigint").alias("mu"))
    per = (
        ev.crossJoin(F.broadcast(mean))
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_obs"),
            F.sum(F.expr("cast(v_milli >= mu as bigint)"))
            .cast("bigint")
            .alias("n_changed"),
        )
    )
    lam = F.round(
        -F.log(
            (F.col("n_obs") - F.col("n_changed") + 1).cast("double")
            / (F.col("n_obs") + 2).cast("double")
        ),
        6,
    )
    return (
        per.select(
            "host",
            "n_obs",
            "n_changed",
            lam.alias("lambda_6"),
            F.when(lam >= 0.9, F.lit("hot"))
            .when(lam >= 0.5, F.lit("warm"))
            .otherwise(F.lit("cold"))
            .alias("tier"),
        )
        .orderBy("host")
    )


SQL_CHO_CHANGE_RATE = """
WITH ev AS (
  SELECT user_id AS host, floor(value * 1000)::BIGINT AS v_milli FROM events
), mean AS (
  SELECT (sum(v_milli) // count(*))::BIGINT AS mu FROM ev
), per AS (
  SELECT host, count(*)::BIGINT AS n_obs,
         sum(CASE WHEN v_milli >= mu THEN 1 ELSE 0 END)::BIGINT AS n_changed
  FROM ev CROSS JOIN mean GROUP BY host
)
SELECT host, n_obs, n_changed,
       round(-ln((n_obs - n_changed + 1)::DOUBLE / (n_obs + 2)::DOUBLE), 6)
         AS lambda_6,
       CASE WHEN round(-ln((n_obs - n_changed + 1)::DOUBLE
                           / (n_obs + 2)::DOUBLE), 6) >= 0.9 THEN 'hot'
            WHEN round(-ln((n_obs - n_changed + 1)::DOUBLE
                           / (n_obs + 2)::DOUBLE), 6) >= 0.5 THEN 'warm'
            ELSE 'cold' END AS tier
FROM per ORDER BY host
"""


# -- bloom-filter sizing audit ----------------------------------------------------------------------------------------


def q_bloom_sizing_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seen-filter sizing audit: for the crawl's actual distinct-URL
    count n (the deterministic URL family) and a grid of candidate
    bloom sizes m in {2^20, 2^24, 2^28} bits, the optimal hash count
    k* = round((m/n) ln 2) — computed integer-exact with ln 2 as the
    literal 693147/1000000 — and the resulting false-positive rate
    (1 - e^(-kn/m))^k in parts-per-million. This is the capacity
    planning for `bloom.py`'s partitioned seen filter: the judge of
    when a wave's filter must grow a shard before FPR starts wasting
    politeness budget on re-fetch checks. bits_per_url and k* are exact
    bigints; only the final exp/pow is float, rounded to 3dp ppm.

    Scale shape: ONE distinct-count aggregate (the corpus reduce),
    broadcast into a 3-row literal grid; constant output."""
    docs = _read(spark, sf_dir, "documents").select("doc_id")
    u = docs.select(
        F.concat(
            F.lit("http://h"),
            (F.col("doc_id") % 97).cast("string"),
            F.lit(".example.com/p/"),
            F.col("doc_id").cast("string"),
        ).alias("url")
    )
    n = u.agg(F.countDistinct("url").cast("bigint").alias("n"))
    grid = spark.createDataFrame(
        [(1 << 20,), (1 << 24,), (1 << 28,)], "m bigint"
    )
    j = grid.crossJoin(F.broadcast(n))
    k = F.expr("greatest(1L, (m * 693147 + n * 500000) div (n * 1000000))")
    return (
        j.select(
            "m",
            "n",
            F.expr("m div n").cast("bigint").alias("bits_per_url"),
            k.cast("bigint").alias("k_opt"),
            F.round(
                F.expr(
                    "1000000.0 * power(1.0 - exp(-(cast(greatest(1L,"
                    " (m * 693147 + n * 500000) div (n * 1000000)) as double)"
                    " * cast(n as double)) / cast(m as double)),"
                    " cast(greatest(1L, (m * 693147 + n * 500000)"
                    " div (n * 1000000)) as double))"
                ),
                3,
            ).alias("fpr_ppm_3"),
        )
        .orderBy("m")
    )


SQL_BLOOM_SIZING_AUDIT = """
WITH u AS (
  SELECT DISTINCT 'http://h' || (doc_id % 97)::VARCHAR || '.example.com/p/'
         || doc_id::VARCHAR AS url
  FROM documents
), n AS (
  SELECT count(*)::BIGINT AS n FROM u
), grid AS (
  SELECT unnest([1048576::BIGINT, 16777216::BIGINT, 268435456::BIGINT]) AS m
), k AS (
  SELECT m, n, (m // n)::BIGINT AS bits_per_url,
         greatest(1, (m * 693147 + n * 500000) // (n * 1000000))::BIGINT AS k_opt
  FROM grid CROSS JOIN n
)
SELECT m, n, bits_per_url, k_opt,
       round(1000000.0 * pow(1.0 - exp(-(k_opt::DOUBLE * n::DOUBLE) / m::DOUBLE),
                             k_opt::DOUBLE), 3) AS fpr_ppm_3
FROM k ORDER BY m
"""


# -- URL-template entropy (crawl-trap detection) ----------------------------------------------------------------------


def q_url_template_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-trap detection via URL-template entropy: collapse every
    digit run in the synthesized URL path to 'N' (the template), then
    per host report url count, distinct templates, template fan-out
    (urls per template, exact), and the Shannon entropy of the template
    distribution in integer nano-nats — a host minting thousands of
    URLs from a handful of templates at low entropy is a calendar/
    session-id trap that will eat the frontier unless throttled
    (`url_features` flags known trap patterns; this catches the unknown
    ones). Per-template entropy contributions floor to integer
    nano-nats BEFORE summation (the `markov_entropy_rate` treatment) so
    the sum is order-independent and bit-identical across engines.

    Scale shape: pure-map template build, groupBy(host, template),
    per-host totals re-aggregated from that bounded frame and joined
    back broadcast; |hosts| output rows."""
    docs = _read(spark, sf_dir, "documents").select("doc_id")
    u = docs.select(
        F.concat(F.lit("h"), (F.col("doc_id") % 23).cast("string")).alias("host"),
        F.regexp_replace(
            F.concat(
                F.lit("/"),
                F.when(F.col("doc_id") % 5 == 0, F.lit("cal/2026/01/")).otherwise(
                    F.lit("p/")
                ),
                F.col("doc_id").cast("string"),
            ),
            "[0-9]+",
            "N",
        ).alias("template"),
    )
    per_t = u.groupBy("host", "template").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    tot = per_t.groupBy("host").agg(
        F.sum("c").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("n_templates"),
    )
    contrib = per_t.join(F.broadcast(tot), "host").select(
        "host",
        "n",
        "n_templates",
        F.expr(
            "c * cast(floor(1000000000.0 * ln(cast(n as double)"
            " / cast(c as double))) as bigint)"
        ).alias("term"),
    )
    return (
        contrib.groupBy("host")
        .agg(
            F.max("n").alias("n_urls"),
            F.max("n_templates").alias("n_templates"),
            F.expr("max(n) div max(n_templates)")
            .cast("bigint")
            .alias("fanout"),
            F.expr("sum(term) div max(n)").cast("bigint").alias("entropy_nano"),
        )
        .orderBy("host")
    )


SQL_URL_TEMPLATE_ENTROPY = """
WITH u AS (
  SELECT 'h' || (doc_id % 23)::VARCHAR AS host,
         regexp_replace('/' ||
           (CASE WHEN doc_id % 5 = 0 THEN 'cal/2026/01/' ELSE 'p/' END) ||
           doc_id::VARCHAR, '[0-9]+', 'N', 'g') AS template
  FROM documents
), per_t AS (
  SELECT host, template, count(*)::BIGINT AS c FROM u GROUP BY host, template
), tot AS (
  SELECT host, sum(c)::BIGINT AS n, count(*)::BIGINT AS n_templates
  FROM per_t GROUP BY host
), contrib AS (
  SELECT p.host, t.n, t.n_templates,
         p.c * floor(1000000000.0 * ln(t.n::DOUBLE / p.c::DOUBLE))::BIGINT AS term
  FROM per_t p JOIN tot t ON p.host = t.host
)
SELECT host, max(n)::BIGINT AS n_urls, max(n_templates)::BIGINT AS n_templates,
       (max(n) // max(n_templates))::BIGINT AS fanout,
       (sum(term) // max(n))::BIGINT AS entropy_nano
FROM contrib GROUP BY host ORDER BY host
"""

# -- asymmetric shingle containment near-dup ---------------------------------------------------------------------------


def q_ngram_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric 3-gram shingle CONTAINMENT near-dup (Broder 1997's
    second resemblance measure): for candidate pairs from the same
    shingle-bucket join as `ngram_jaccard_pairs`, report
    c(A in B) = |A ∩ B| / |A| and c(B in A) = |A ∩ B| / |B|, keeping
    pairs whose larger direction is >= 0.8 — the quote-inclusion /
    page-wrapper case Jaccard structurally misses: a short doc fully
    embedded in a long one has tiny Jaccard but containment 1.0, and
    for training data the contained doc is the one to drop. Counts are
    exact integers; the two ratios round at 4dp.

    Scale shape: identical to the Jaccard path (distinct shingles, ONE
    bucket self-join, groupBy pair) — same max_df stop-shingle knob
    applies upstream at web scale; the extra direction is a second
    division on the already-reduced pair frame, zero extra shuffles."""
    docs = _tokens(_docs_parallel(spark, sf_dir)).filter(F.expr("size(toks) >= 3"))
    sh = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks) - 2), i -> "
                "concat_ws(' ', element_at(toks, i), element_at(toks, i+1),"
                " element_at(toks, i+2)))"
            )
        ).alias("shingle"),
    ).distinct()
    counts = sh.groupBy("doc_id").agg(F.count("*").cast("bigint").alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
        .agg(F.count("*").cast("bigint").alias("i"))
    )
    ca = counts.select(F.col("doc_id").alias("a_id"), F.col("n").alias("na"))
    cb = counts.select(F.col("doc_id").alias("b_id"), F.col("n").alias("nb"))
    return (
        inter.join(ca, "a_id")
        .join(cb, "b_id")
        .select(
            "a_id",
            "b_id",
            F.round(F.expr("i / na"), 4).alias("cont_a_in_b"),
            F.round(F.expr("i / nb"), 4).alias("cont_b_in_a"),
        )
        .filter(
            (F.col("cont_a_in_b") >= 0.8) | (F.col("cont_b_in_a") >= 0.8)
        )
    )


SQL_NGRAM_CONTAINMENT = f"""
WITH toks AS (
  SELECT doc_id, {_SQL_TOKS} AS toks FROM documents
), sh AS (
  SELECT DISTINCT doc_id, unnest(list_transform(range(len(toks) - 2),
    i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])) AS shingle
  FROM toks WHERE len(toks) >= 3
), counts AS (
  SELECT doc_id, count(*)::BIGINT AS n FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*)::BIGINT AS i
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT a_id, b_id,
       round(i / ca.n, 4) AS cont_a_in_b,
       round(i / cb.n, 4) AS cont_b_in_a
FROM inter JOIN counts ca ON a_id = ca.doc_id JOIN counts cb ON b_id = cb.doc_id
WHERE round(i / ca.n, 4) >= 0.8 OR round(i / cb.n, 4) >= 0.8
"""


# -- cross-source duplicate overlap matrix -----------------------------------------------------------------------------


def q_cross_source_dup_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplicate overlap matrix: duplicate pairs under the
    40-char-prefix fingerprint (md5 of the text head — the standard
    header/boilerplate dedup key, which unlike `dedup_exact`'s
    full-text key actually clusters on a synthetic corpus) tallied per
    unordered source pair — the data-mixing diagnostic that answers
    'how much of source B is already inside source A' BEFORE a mixture
    weight is chosen; feeding two heavily-overlapping sources at full
    weight silently doubles their shared content's effective epoch
    count. Diagonal rows are within-source duplication.

    Scale shape: ONE groupBy(fingerprint) collects each dup cluster;
    pair counts come from per-cluster per-source counts (k*(k+1)/2
    arithmetic on the bounded cluster x source frame), never a
    fingerprint self-join; output is |sources|^2 rows max."""
    per = (
        _read(spark, sf_dir, "documents")
        .select(F.md5(F.substring("text", 1, 40)).alias("fp"), "source")
        .groupBy("fp", "source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    per = per.localCheckpoint()
    within = per.where(F.col("c") >= 2).select(
        F.col("source").alias("source_a"),
        F.col("source").alias("source_b"),
        F.expr("c * (c - 1) div 2").cast("bigint").alias("pairs"),
    )
    x = per.alias("x")
    y = per.alias("y")
    across = (
        x.join(y, "fp")
        .where(F.col("x.source") < F.col("y.source"))
        .select(
            F.col("x.source").alias("source_a"),
            F.col("y.source").alias("source_b"),
            F.expr("x.c * y.c").cast("bigint").alias("pairs"),
        )
    )
    return (
        within.union(across)
        .groupBy("source_a", "source_b")
        .agg(F.sum("pairs").cast("bigint").alias("dup_pairs"))
        .orderBy("source_a", "source_b")
    )


SQL_CROSS_SOURCE_DUP_MATRIX = """
WITH per AS (
  SELECT md5(substr(text, 1, 40)) AS fp, source, count(*)::BIGINT AS c
  FROM documents GROUP BY 1, 2
), within AS (
  SELECT source AS source_a, source AS source_b,
         (c * (c - 1) // 2)::BIGINT AS pairs
  FROM per WHERE c >= 2
), across AS (
  SELECT x.source AS source_a, y.source AS source_b, (x.c * y.c)::BIGINT AS pairs
  FROM per x JOIN per y ON x.fp = y.fp AND x.source < y.source
)
SELECT source_a, source_b, sum(pairs)::BIGINT AS dup_pairs
FROM (SELECT * FROM within UNION ALL SELECT * FROM across)
GROUP BY 1, 2 ORDER BY source_a, source_b
"""


# -- per-label embedding centroid drift --------------------------------------------------------------------------------


def q_embedding_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroid drift between two corpus halves
    (vec_id parity stands in for the before/after snapshot split): each
    dimension quantizes to integer micro-units per row FIRST, so the
    distributed sums are exact bigints regardless of aggregation order
    — then the squared L2 distance between half-centroids per label, in
    squared-micro units. The embedding-space sibling of `psi_drift`:
    a label whose centroid moves is a topic whose representation
    changed between crawls, and a retrieval index trained on the old
    half is stale for it.

    Scale shape: posexplode to (label, half, dim) -> ONE exact-integer
    groupBy on the bounded |labels| x 2 x dims frame -> halves self-join
    on that tiny frame -> per-label sum; no float crosses a shuffle."""
    e = _read(spark, sf_dir, "embeddings").select(
        "label",
        (F.col("vec_id") % 2).cast("bigint").alias("half"),
        F.posexplode("embedding").alias("pos", "v"),
    ).select(
        "label",
        "half",
        "pos",
        F.expr("cast(floor(1000000.0 * cast(v as double)) as bigint)").alias("q"),
    )
    cent = e.groupBy("label", "half", "pos").agg(
        F.sum("q").cast("bigint").alias("s"),
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
    ).withColumn("m", F.expr("s div cnt").cast("bigint"))
    a = cent.where(F.col("half") == 0).select(
        "label", "pos", F.col("m").alias("ma"), F.col("cnt").alias("na")
    )
    b = cent.where(F.col("half") == 1).select(
        "label", "pos", F.col("m").alias("mb"), F.col("cnt").alias("nb")
    )
    return (
        a.join(b, ["label", "pos"])
        .groupBy("label")
        .agg(
            F.max("na").alias("n_a"),
            F.max("nb").alias("n_b"),
            F.sum(F.expr("(ma - mb) * (ma - mb)"))
            .cast("bigint")
            .alias("l2_sq_micro2"),
        )
        .orderBy("label")
    )


SQL_EMBEDDING_CENTROID_DRIFT = """
WITH q AS (
  SELECT label, (vec_id % 2)::BIGINT AS half, pos,
         floor(1000000.0 * embedding[pos + 1]::DOUBLE)::BIGINT AS qv
  FROM (SELECT label, vec_id, embedding,
               unnest(range(0, len(embedding))) AS pos
        FROM embeddings)
), cent AS (
  SELECT label, half, pos, (sum(qv) // count(*))::BIGINT AS m,
         count(*)::BIGINT AS cnt
  FROM q GROUP BY 1, 2, 3
)
SELECT a.label, max(a.cnt)::BIGINT AS n_a, max(b.cnt)::BIGINT AS n_b,
       sum((a.m - b.m) * (a.m - b.m))::BIGINT AS l2_sq_micro2
FROM cent a JOIN cent b ON a.label = b.label AND a.pos = b.pos
WHERE a.half = 0 AND b.half = 1
GROUP BY a.label ORDER BY a.label
"""

# -- per-host content-yield curve --------------------------------------------------------------------------------------


def q_host_yield_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host content-yield ranking — crawl economics: for each host,
    fetches (docs), unique content under the 40-char-prefix fingerprint
    (`cross_source_dup_matrix`'s key), the yield in parts-per-thousand
    (unique/fetches), and the host's rank by yield — the marginal-value
    signal a budget re-allocator reads every wave: a host whose yield
    decays toward 0 is serving mirrored/templated content and its
    politeness budget should flow to the long tail instead. Integer
    ratios throughout.

    Scale shape: ONE groupBy(host, fp) -> ONE groupBy(host) (both keyed
    reductions, no joins on the corpus), rank window on the bounded
    |hosts| frame; |hosts| output rows."""
    docs = _read(spark, sf_dir, "documents").select(
        F.concat(F.lit("h"), (F.col("doc_id") % 23).cast("string")).alias("host"),
        F.md5(F.substring("text", 1, 40)).alias("fp"),
    )
    per_fp = docs.groupBy("host", "fp").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    per_host = per_fp.groupBy("host").agg(
        F.sum("c").cast("bigint").alias("fetches"),
        F.count(F.lit(1)).cast("bigint").alias("unique_content"),
    )
    return (
        per_host.select(
            "host",
            "fetches",
            "unique_content",
            F.expr("1000 * unique_content div fetches")
            .cast("bigint")
            .alias("yield_milli"),
        )
        .withColumn(
            "yield_rank",
            F.row_number()
            .over(
                Window.orderBy(
                    F.expr("1000 * unique_content div fetches").desc(),
                    F.col("host"),
                )
            )
            .cast("bigint"),
        )
        .orderBy("host")
    )


SQL_HOST_YIELD_CURVE = """
WITH docs AS (
  SELECT 'h' || (doc_id % 23)::VARCHAR AS host,
         md5(substr(text, 1, 40)) AS fp
  FROM documents
), per_fp AS (
  SELECT host, fp, count(*)::BIGINT AS c FROM docs GROUP BY 1, 2
), per_host AS (
  SELECT host, sum(c)::BIGINT AS fetches, count(*)::BIGINT AS unique_content
  FROM per_fp GROUP BY host
)
SELECT host, fetches, unique_content,
       (1000 * unique_content // fetches)::BIGINT AS yield_milli,
       row_number() OVER (ORDER BY (1000 * unique_content // fetches) DESC, host
       )::BIGINT AS yield_rank
FROM per_host ORDER BY host
"""


# -- frontier branching factor (crawl R0) -------------------------------------------------------------------------------


def q_frontier_branching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl reproduction number R0 per source shard: on the host link
    graph, the mean distinct out-degree of nodes (new frontier links
    minted per fetched page) discounted by the already-seen fraction —
    branching-process theory says a crawl wavefront with effective
    R > 1000 milli grows geometrically (supercritical: the frontier
    explodes and scheduling dominates) and R < 1000 milli dies out
    (subcritical: seeds exhaust; widen the allowlist). Per src-shard
    (src mod 5) output: nodes, edges, mean out-degree milli, seen
    discount milli (the graph's back-edge fraction standing in for the
    bloom hit rate), effective R milli, and the regime CASE — all
    integer-exact.

    Scale shape: the distinct edge reduce, ONE groupBy(src), one
    shard-level re-aggregate of the bounded degree frame; a broadcast
    back-edge semi-join computes the seen fraction."""
    e = _pagerank_edges(spark, sf_dir).localCheckpoint()
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    back = e.intersect(rev).select("src", "dst", F.lit(1).alias("is_back"))
    marked = e.join(
        F.broadcast(back), ["src", "dst"], "left"
    ).select("src", "dst", F.coalesce("is_back", F.lit(0)).alias("is_back"))
    deg = marked.groupBy("src").agg(
        F.count(F.lit(1)).cast("bigint").alias("outdeg"),
        F.sum("is_back").cast("bigint").alias("back_edges"),
    )
    shard = deg.groupBy((F.col("src") % 5).cast("bigint").alias("shard")).agg(
        F.count(F.lit(1)).cast("bigint").alias("nodes"),
        F.sum("outdeg").cast("bigint").alias("edges"),
        F.sum("back_edges").cast("bigint").alias("back_edges"),
    )
    return (
        shard.select(
            "shard",
            "nodes",
            "edges",
            F.expr("1000 * edges div nodes").cast("bigint").alias("mean_outdeg_milli"),
            F.expr("1000 * back_edges div edges")
            .cast("bigint")
            .alias("seen_frac_milli"),
            F.expr(
                "(1000 * edges div nodes) * (1000 - 1000 * back_edges div edges)"
                " div 1000"
            )
            .cast("bigint")
            .alias("r_eff_milli"),
            F.expr(
                "case when (1000 * edges div nodes)"
                " * (1000 - 1000 * back_edges div edges) div 1000 > 1000"
                " then 'supercritical' else 'subcritical' end"
            ).alias("regime"),
        )
        .orderBy("shard")
    )


SQL_FRONTIER_BRANCHING = f"""
WITH e AS (
  SELECT DISTINCT user_id % {_PR_NODES} AS src,
         (('0x' || substr(md5(event_id::VARCHAR), 1, 4))::BIGINT) % {_PR_NODES} AS dst
  FROM events
  WHERE user_id % {_PR_NODES}
        <> (('0x' || substr(md5(event_id::VARCHAR), 1, 4))::BIGINT) % {_PR_NODES}
), marked AS (
  SELECT e.src, e.dst,
         CASE WHEN r.src IS NOT NULL THEN 1 ELSE 0 END AS is_back
  FROM e LEFT JOIN e r ON e.src = r.dst AND e.dst = r.src
), deg AS (
  SELECT src, count(*)::BIGINT AS outdeg, sum(is_back)::BIGINT AS back_edges
  FROM marked GROUP BY src
), shard AS (
  SELECT (src % 5)::BIGINT AS shard, count(*)::BIGINT AS nodes,
         sum(outdeg)::BIGINT AS edges, sum(back_edges)::BIGINT AS back_edges
  FROM deg GROUP BY 1
)
SELECT shard, nodes, edges,
       (1000 * edges // nodes)::BIGINT AS mean_outdeg_milli,
       (1000 * back_edges // edges)::BIGINT AS seen_frac_milli,
       ((1000 * edges // nodes) * (1000 - 1000 * back_edges // edges)
        // 1000)::BIGINT AS r_eff_milli,
       CASE WHEN (1000 * edges // nodes)
                 * (1000 - 1000 * back_edges // edges) // 1000 > 1000
            THEN 'supercritical' ELSE 'subcritical' END AS regime
FROM shard ORDER BY shard
"""


# -- per-label embedding dispersion ------------------------------------------------------------------------------------


def q_embedding_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding dispersion: the mean squared distance of a
    label's vectors from their own centroid, computed exactly as
    E[|x|^2] - |E[x]|^2 over integer micro-quantized dimensions (the
    `embedding_centroid_drift` quantization, so distributed sums stay
    order-independent). The companion diagnostic to centroid drift: a
    label whose centroid holds still but whose dispersion balloons is a
    topic label that stopped meaning anything — IVF cells trained on it
    (`ann_ivf`) degrade to random probes. Reported per label in squared
    micro units with an over-dispersion flag vs the corpus median
    (exact: median of a bounded |labels| frame).

    Scale shape: posexplode -> ONE exact-integer groupBy(label, dim)
    carrying sum(q) and sum(q^2) -> per-label re-aggregate; the global
    median broadcasts from the bounded label frame; |labels| rows."""
    q = _read(spark, sf_dir, "embeddings").select(
        "label",
        F.posexplode("embedding").alias("pos", "v"),
    ).select(
        "label",
        "pos",
        F.expr("cast(floor(1000000.0 * cast(v as double)) as bigint)").alias("q"),
    )
    per_dim = q.groupBy("label", "pos").agg(
        F.sum("q").cast("bigint").alias("s"),
        F.sum(F.expr("q * q")).cast("bigint").alias("s2"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    per_label = per_dim.groupBy("label").agg(
        F.max("n").alias("n_vecs"),
        # sum over dims of (s2/n - (s/n)^2), kept exact by scaling with n^2
        F.sum(F.expr("n * s2 - s * s")).cast("bigint").alias("num"),
        F.max(F.expr("n * n")).cast("bigint").alias("den"),
    ).select(
        "label",
        "n_vecs",
        F.expr("num div den").cast("bigint").alias("dispersion_micro2"),
    ).localCheckpoint()
    med = per_label.agg(
        F.expr(
            "cast(percentile(dispersion_micro2, 0.5) as bigint)"
        ).alias("med")
    )
    return (
        per_label.crossJoin(F.broadcast(med))
        .select(
            "label",
            "n_vecs",
            "dispersion_micro2",
            F.expr("dispersion_micro2 > med + med div 4").alias("over_dispersed"),
        )
        .orderBy("label")
    )


SQL_EMBEDDING_DISPERSION = """
WITH q AS (
  SELECT label, pos, floor(1000000.0 * embedding[pos + 1]::DOUBLE)::BIGINT AS q
  FROM (SELECT label, embedding, unnest(range(0, len(embedding))) AS pos
        FROM embeddings)
), per_dim AS (
  SELECT label, pos, sum(q)::BIGINT AS s, sum(q * q)::BIGINT AS s2,
         count(*)::BIGINT AS n
  FROM q GROUP BY 1, 2
), per_label AS (
  SELECT label, max(n)::BIGINT AS n_vecs,
         (sum(n * s2 - s * s) // max(n * n))::BIGINT AS dispersion_micro2
  FROM per_dim GROUP BY label
), med AS (
  SELECT floor(median(dispersion_micro2))::BIGINT AS med FROM per_label
)
SELECT label, n_vecs, dispersion_micro2,
       dispersion_micro2 > med + med // 4 AS over_dispersed
FROM per_label CROSS JOIN med
ORDER BY label
"""

# -- Dunning log-likelihood keyness ------------------------------------------------------------------------------------


def q_dunning_llr_keyness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dunning log-likelihood keyness (Dunning 1993), the canonical
    corpus-comparison statistic: token counts of slice A (the lexically
    first source) vs slice B (the rest), per-term
    G2 = 2*(a*ln(a/E_a) + b*ln(b/E_b)) with expectations from the
    pooled rate — unlike `odds_ratio_keyness` (document-frequency odds)
    this is frequency-weighted, so it surfaces high-volume divergent
    terms instead of rare-but-lopsided ones; together they are the
    standard pair. Counts and expectations are exact integers/rationals
    pushed into the ln() at the last step; per-term G2 never crosses a
    row boundary, so 6dp rounding is engine-stable (tf-idf treatment).
    Top 20 by G2.

    Scale shape: tokenize -> ONE groupBy(term, in_a) with partials ->
    pivot to (a, b) per term -> 1-row totals broadcast; top-k via
    TakeOrderedAndProject on the bounded vocab frame."""
    toks = _tokens(_read(spark, sf_dir, "documents"))
    first_src = _read(spark, sf_dir, "documents").agg(
        F.min("source").alias("src_a")
    )
    t = (
        toks.crossJoin(F.broadcast(first_src))
        .select(
            F.explode("toks").alias("term"),
            (F.col("source") == F.col("src_a")).alias("in_a"),
        )
        .groupBy("term")
        .agg(
            F.sum(F.expr("cast(in_a as bigint)")).cast("bigint").alias("a"),
            F.sum(F.expr("cast(not in_a as bigint)")).cast("bigint").alias("b"),
        )
    )
    tot = t.agg(
        F.sum("a").cast("bigint").alias("na"),
        F.sum("b").cast("bigint").alias("nb"),
    )
    g2 = F.round(
        F.expr(
            "2.0 * ((case when a > 0 then a * ln(cast(a as double) * (na + nb)"
            " / (cast(na as double) * (a + b))) else 0.0 end)"
            " + (case when b > 0 then b * ln(cast(b as double) * (na + nb)"
            " / (cast(nb as double) * (a + b))) else 0.0 end))"
        ),
        6,
    )
    return (
        t.crossJoin(F.broadcast(tot))
        .select("term", "a", "b", g2.alias("g2_6"))
        .orderBy(F.col("g2_6").desc(), "term")
        .limit(20)
    )


SQL_DUNNING_LLR_KEYNESS = f"""
WITH src AS (
  SELECT min(source) AS src_a FROM documents
), t AS (
  SELECT tok.term,
         sum(CASE WHEN source = src_a THEN 1 ELSE 0 END)::BIGINT AS a,
         sum(CASE WHEN source <> src_a THEN 1 ELSE 0 END)::BIGINT AS b
  FROM documents CROSS JOIN src, unnest({_SQL_TOKS}) AS tok(term)
  GROUP BY tok.term
), tot AS (
  SELECT sum(a)::BIGINT AS na, sum(b)::BIGINT AS nb FROM t
)
SELECT term, a, b,
       round(2.0 * ((CASE WHEN a > 0 THEN a * ln(a::DOUBLE * (na + nb)
                      / (na::DOUBLE * (a + b))) ELSE 0.0 END)
                  + (CASE WHEN b > 0 THEN b * ln(b::DOUBLE * (na + nb)
                      / (nb::DOUBLE * (a + b))) ELSE 0.0 END)), 6) AS g2_6
FROM t CROSS JOIN tot
ORDER BY g2_6 DESC, term LIMIT 20
"""


# -- quality-classifier calibration (ECE bins) -------------------------------------------------------------------------


def q_quality_calibration_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration audit of a cheap quality signal, binned expected-
    calibration-error style (Naeini et al. 2015): confidence =
    stopword-share-derived English score in milli (capped at 1000),
    label = (lang = 'en'), docs split into 10 equal-rank bins by
    n_chars. Per bin: count, mean confidence (milli), empirical
    accuracy (milli), and the |acc - conf| gap — the table that says
    WHERE the cheap filter lies (a classifier can rank perfectly and
    still be badly calibrated, which poisons any threshold chosen on
    its raw scores). All integer arithmetic: milli units, ntile
    binning with a total order, truncating division.

    Scale shape: pure-map scores, ONE ntile window (total order on
    (n_chars, doc_id) — at web scale swaps to the two-phase distributed
    rank), ONE groupBy(bin); 10 output rows."""
    d = _tokens(_read(spark, sf_dir, "documents")).select(
        "doc_id",
        "n_chars",
        (F.col("lang") == "en").alias("y"),
        F.expr(
            f"least(1000L, 6000 * size(filter(toks,"
            f" t -> array_contains({_SPARK_STOPLIST}, t))) div"
            " greatest(1, size(toks)))"
        ).cast("bigint").alias("conf_milli"),
    )
    binned = d.withColumn(
        "bin",
        F.ntile(10).over(Window.orderBy("n_chars", "doc_id")).cast("bigint"),
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.expr("sum(conf_milli) div count(*)").cast("bigint").alias("conf"),
            F.expr("1000 * sum(cast(y as bigint)) div count(*)")
            .cast("bigint")
            .alias("acc"),
        )
        .select(
            "bin",
            "n",
            F.col("conf").alias("conf_milli"),
            F.col("acc").alias("acc_milli"),
            F.expr("abs(acc - conf)").cast("bigint").alias("gap_milli"),
        )
        .orderBy("bin")
    )


SQL_QUALITY_CALIBRATION_ECE = f"""
WITH d AS (
  SELECT doc_id, n_chars, (lang = 'en') AS y,
         least(1000, 6000 * len(list_filter({_SQL_TOKS},
               t -> list_contains({_SQL_STOPLIST}, t)))
               // greatest(1, len({_SQL_TOKS})))::BIGINT AS conf_milli
  FROM documents
), binned AS (
  SELECT *, ntile(10) OVER (ORDER BY n_chars, doc_id)::BIGINT AS bin FROM d
), agg AS (
  SELECT bin, count(*)::BIGINT AS n,
         (sum(conf_milli) // count(*))::BIGINT AS conf,
         (1000 * sum(CASE WHEN y THEN 1 ELSE 0 END) // count(*))::BIGINT AS acc
  FROM binned GROUP BY bin
)
SELECT bin, n, conf AS conf_milli, acc AS acc_milli,
       abs(acc - conf)::BIGINT AS gap_milli
FROM agg ORDER BY bin
"""


# -- discovery half-life -----------------------------------------------------------------------------------------------


def q_discovery_halflife(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discovery half-life of the crawl replay: each event_type stands
    for a distinct discoverable entity, its first-seen time is min(ts),
    and the query reports how front-loaded discovery is — the exact
    interpolated 50th and 90th percentiles of first-seen times,
    normalized into milli-progress through the [min, max] event-time
    span. A crawl whose t50 sits early (say < 200 milli) has exhausted
    its seed neighborhood and is coasting; t50 near 500 means discovery
    is still linear — the curve that tells an operator whether to stop
    the wave loop or widen the allowlist. Percentile interpolation
    follows the same quantile_cont contract as `value_quantiles`
    (engine-identical on exact integer microseconds); normalization is
    integer milli.

    Scale shape: ONE groupBy(event_type).min(ts) to the bounded entity
    frame; percentile + span on that frame; single-row output."""
    first = (
        _read(spark, sf_dir, "events")
        .select("event_type", _us("ts").alias("ts_us"))
        .groupBy("event_type")
        .agg(F.min("ts_us").cast("bigint").alias("first_us"))
    )
    return first.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_entities"),
        F.expr(
            "cast(1000 * (cast(floor(percentile(first_us, 0.5)) as bigint)"
            " - min(first_us)) div (max(first_us) - min(first_us)) as bigint)"
        ).alias("t50_milli"),
        F.expr(
            "cast(1000 * (cast(floor(percentile(first_us, 0.9)) as bigint)"
            " - min(first_us)) div (max(first_us) - min(first_us)) as bigint)"
        ).alias("t90_milli"),
    )


SQL_DISCOVERY_HALFLIFE = """
WITH first AS (
  SELECT event_type, min(epoch_us(ts))::BIGINT AS first_us
  FROM events GROUP BY event_type
)
SELECT count(*)::BIGINT AS n_entities,
       (1000 * (floor(quantile_cont(first_us, 0.5))::BIGINT - min(first_us))
        // (max(first_us) - min(first_us)))::BIGINT AS t50_milli,
       (1000 * (floor(quantile_cont(first_us, 0.9))::BIGINT - min(first_us))
        // (max(first_us) - min(first_us)))::BIGINT AS t90_milli
FROM first
"""

# -- politeness makespan / drain-time audit ----------------------------------------------------------------------------


def q_politeness_makespan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Politeness makespan audit: with per-host queue lengths from the
    replay and a deterministic per-host crawl delay (100 + 200*(host%5)
    ms, the robots crawl-delay tier), each host's queue drains in
    queue*delay ms NO MATTER how many executors exist — politeness
    serializes within a host. The binding bound on wall time at H=32
    fetch slots is max(slowest host, ceil(total/H)) (the LPT two-sided
    bound); utilization is total/(H*makespan). The one-row answer to
    'will more executors make this wave faster?': if the regime column
    says host-bound, NO — only more hosts (or smaller per-host queues)
    will, which is exactly why the frontier scheduler caps per-host
    batch size.

    Scale shape: ONE groupBy(host); every bound re-aggregates the
    bounded host frame; single-row output."""
    per = (
        _read(spark, sf_dir, "events")
        .groupBy(F.col("user_id").alias("host"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("queue"))
        .select(
            "host",
            "queue",
            F.expr("queue * (100 + 200 * (host % 5))").cast("bigint").alias("drain_ms"),
        )
    )
    return per.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hosts"),
        F.sum("queue").cast("bigint").alias("n_urls"),
        F.sum("drain_ms").cast("bigint").alias("total_work_ms"),
        F.max("drain_ms").cast("bigint").alias("max_host_ms"),
    ).select(
        "n_hosts",
        "n_urls",
        "total_work_ms",
        "max_host_ms",
        F.expr("greatest(max_host_ms, (total_work_ms + 31) div 32)")
        .cast("bigint")
        .alias("makespan_lb_ms"),
        F.expr(
            "1000 * total_work_ms div"
            " (32 * greatest(max_host_ms, (total_work_ms + 31) div 32))"
        )
        .cast("bigint")
        .alias("utilization_milli"),
        F.expr(
            "case when max_host_ms > (total_work_ms + 31) div 32"
            " then 'host-bound' else 'capacity-bound' end"
        ).alias("regime"),
    )


SQL_POLITENESS_MAKESPAN = """
WITH per AS (
  SELECT user_id AS host, count(*)::BIGINT AS queue,
         (count(*) * (100 + 200 * (user_id % 5)))::BIGINT AS drain_ms
  FROM events GROUP BY user_id
), agg AS (
  SELECT count(*)::BIGINT AS n_hosts, sum(queue)::BIGINT AS n_urls,
         sum(drain_ms)::BIGINT AS total_work_ms,
         max(drain_ms)::BIGINT AS max_host_ms
  FROM per
)
SELECT n_hosts, n_urls, total_work_ms, max_host_ms,
       greatest(max_host_ms, (total_work_ms + 31) // 32)::BIGINT
         AS makespan_lb_ms,
       (1000 * total_work_ms //
        (32 * greatest(max_host_ms, (total_work_ms + 31) // 32)))::BIGINT
         AS utilization_milli,
       CASE WHEN max_host_ms > (total_work_ms + 31) // 32
            THEN 'host-bound' ELSE 'capacity-bound' END AS regime
FROM agg
"""


# -- compaction planner (streaming next-fit bins) ----------------------------------------------------------------------


def q_compaction_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction plan, the catalog maintenance job behind
    `catalog.py`'s compact(): data files (size = summed n_chars per
    (source, doc_id div 64) write group) packed size-descending into
    target bins of 65536 chars by the streaming next-fit rule — a file
    opens in the bin where the running total left off (bin id =
    (cumsum - size) div target), which is exactly what a single-pass
    packer over a sorted manifest does and stays a pure window
    expression (true first-fit-decreasing is inherently sequential; at
    planner scale the difference is <= 1 bin per oversized file). Per
    bin: file count, fill, fill ratio milli, overflow flag. The audit
    that says when a wave's delta commits have fragmented a partition
    badly enough that compaction pays for itself.

    Scale shape: ONE groupBy to the file frame (bounded: one row per
    write group), ONE prefix-sum window on it (size-desc total order —
    manifests are small; this is planner-side), ONE groupBy(bin)."""
    files = (
        _read(spark, sf_dir, "documents")
        .groupBy(
            F.col("source").alias("src"),
            F.expr("doc_id div 64").cast("bigint").alias("grp"),
        )
        .agg(F.sum("n_chars").cast("bigint").alias("sz"))
    )
    w = Window.orderBy(F.col("sz").desc(), "src", "grp")
    binned = files.withColumn("cum", F.sum("sz").over(w).cast("bigint")).select(
        "src",
        "grp",
        "sz",
        F.expr("(cum - sz) div 65536").cast("bigint").alias("bin"),
        "cum",
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_files"),
            F.sum("sz").cast("bigint").alias("fill"),
        )
        .select(
            "bin",
            "n_files",
            "fill",
            F.expr("1000 * fill div 65536").cast("bigint").alias("fill_milli"),
            (F.col("fill") > 65536).alias("overflow"),
        )
        .orderBy("bin")
    )


SQL_COMPACTION_PLANNER = """
WITH files AS (
  SELECT source AS src, (doc_id // 64)::BIGINT AS grp,
         sum(n_chars)::BIGINT AS sz
  FROM documents GROUP BY 1, 2
), binned AS (
  SELECT src, grp, sz,
         ((sum(sz) OVER (ORDER BY sz DESC, src, grp ROWS UNBOUNDED PRECEDING)
           - sz) // 65536)::BIGINT AS bin
  FROM files
)
SELECT bin, count(*)::BIGINT AS n_files, sum(sz)::BIGINT AS fill,
       (1000 * sum(sz) // 65536)::BIGINT AS fill_milli,
       sum(sz) > 65536 AS overflow
FROM binned GROUP BY bin ORDER BY bin
"""


# -- LSH S-curve tuning table ------------------------------------------------------------------------------------------


def q_lsh_s_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH S-curve tuning table: for every observed near-dup similarity
    level in THIS corpus (the `ngram_jaccard_pairs` output, rounded to
    1dp and deduplicated) and a (bands, rows) grid {(4,4), (8,8),
    (16,4), (8,16)}, the probability 1 - (1 - j^r)^b that minhash LSH
    surfaces the pair as a candidate — the table you read BEFORE
    picking `minhash_lsh_candidates`' band config: it shows which
    observed similarity levels a config would drop (p << 1) versus
    flood (p ~ 1 at low j). Collision probability in ppm at 3dp; the
    closed form stays in doubles only for the final pow (the
    `bloom_sizing_audit` treatment).

    Scale shape: the Jaccard pair frame reduces to <= 6 distinct
    levels; the 4-row config grid cross-joins that bounded frame —
    everything after candidate generation is constant-size."""
    pairs = ngram_jaccard(_docs_parallel(spark, sf_dir))
    levels = (
        pairs.select(F.round("jaccard", 1).alias("j"))
        .distinct()
    )
    grid = spark.createDataFrame(
        [(4, 4), (8, 8), (16, 4), (8, 16)], "b int, r int"
    )
    return (
        levels.crossJoin(F.broadcast(grid))
        .select(
            F.col("b").cast("bigint").alias("bands"),
            F.col("r").cast("bigint").alias("rows_per_band"),
            "j",
            F.round(
                F.expr(
                    "1000000.0 * (1.0 - power(1.0 - power(j, cast(r as double)),"
                    " cast(b as double)))"
                ),
                3,
            ).alias("collision_ppm_3"),
        )
        .orderBy("bands", "rows_per_band", "j")
    )


SQL_LSH_S_CURVE = f"""
WITH toks AS (
  SELECT doc_id, {_SQL_TOKS} AS toks FROM documents
), sh AS (
  SELECT DISTINCT doc_id, unnest(list_transform(range(len(toks) - 2),
    i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])) AS shingle
  FROM toks WHERE len(toks) >= 3
), counts AS (
  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS i
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), levels AS (
  SELECT DISTINCT round(round(i / (ca.n + cb.n - i), 4), 1) AS j
  FROM inter JOIN counts ca ON a_id = ca.doc_id JOIN counts cb ON b_id = cb.doc_id
  WHERE round(i / (ca.n + cb.n - i), 4) >= 0.5
), grid AS (
  SELECT * FROM (VALUES (4, 4), (8, 8), (16, 4), (8, 16)) AS t(b, r)
)
SELECT b::BIGINT AS bands, r::BIGINT AS rows_per_band, j,
       round(1000000.0 * (1.0 - pow(1.0 - pow(j, r::DOUBLE), b::DOUBLE)), 3)
         AS collision_ppm_3
FROM levels CROSS JOIN grid
ORDER BY bands, rows_per_band, j
"""

# -- dedup survivorship policy audit -----------------------------------------------------------------------------------


def q_dedup_survivorship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup survivorship policy audit: within each duplicate cluster
    (40-char-prefix fingerprint, `cross_source_dup_matrix`'s key),
    compare the two canonical-survivor policies — keep-first (min
    doc_id, what `dedup_exact` does) vs keep-best-quality (max
    stopword-confidence, ties to the smaller id) — and report how often
    they disagree plus the total quality left on the table by
    keep-first. The policy choice is invisible at dedup time and
    irreversible afterward; this is the one-row audit that says whether
    it matters on THIS corpus. Integer milli throughout.

    Scale shape: ONE groupBy(fp) for cluster stats, a semi-join back on
    the clustered fingerprints only (dup clusters are a tiny fraction
    of the corpus) to resolve the best-quality member, single-row
    output."""
    d = _tokens(_read(spark, sf_dir, "documents")).select(
        "doc_id",
        F.md5(F.substring("text", 1, 40)).alias("fp"),
        F.expr(
            f"least(1000L, 6000 * size(filter(toks,"
            f" t -> array_contains({_SPARK_STOPLIST}, t))) div"
            " greatest(1, size(toks)))"
        ).cast("bigint").alias("qual"),
    ).localCheckpoint()
    cl = (
        d.groupBy("fp")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("c"),
            F.min("doc_id").cast("bigint").alias("first_id"),
            F.max("qual").cast("bigint").alias("best_qual"),
        )
        .where(F.col("c") >= 2)
    )
    best = (
        d.join(cl.select("fp", "best_qual"), "fp")
        .where(F.col("qual") == F.col("best_qual"))
        .groupBy("fp")
        .agg(F.min("doc_id").cast("bigint").alias("best_id"))
    )
    firstq = d.select(F.col("doc_id").alias("first_id"), F.col("qual").alias("first_qual"))
    j = cl.join(best, "fp").join(firstq, "first_id")
    return j.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_clusters"),
        F.sum("c").cast("bigint").alias("n_dup_docs"),
        F.sum(F.expr("cast(best_id <> first_id as bigint)"))
        .cast("bigint")
        .alias("disagree_clusters"),
        F.sum(F.expr("best_qual - first_qual"))
        .cast("bigint")
        .alias("uplift_milli_sum"),
    )


SQL_DEDUP_SURVIVORSHIP = f"""
WITH d AS (
  SELECT doc_id, md5(substr(text, 1, 40)) AS fp,
         least(1000, 6000 * len(list_filter({_SQL_TOKS},
               t -> list_contains({_SQL_STOPLIST}, t)))
               // greatest(1, len({_SQL_TOKS})))::BIGINT AS qual
  FROM documents
), cl AS (
  SELECT fp, count(*)::BIGINT AS c, min(doc_id)::BIGINT AS first_id,
         max(qual)::BIGINT AS best_qual
  FROM d GROUP BY fp HAVING count(*) >= 2
), best AS (
  SELECT d.fp, min(d.doc_id)::BIGINT AS best_id
  FROM d JOIN cl ON d.fp = cl.fp AND d.qual = cl.best_qual
  GROUP BY d.fp
)
SELECT count(*)::BIGINT AS n_clusters, sum(c)::BIGINT AS n_dup_docs,
       sum(CASE WHEN best_id <> first_id THEN 1 ELSE 0 END)::BIGINT
         AS disagree_clusters,
       sum(best_qual - fq.qual)::BIGINT AS uplift_milli_sum
FROM cl JOIN best ON cl.fp = best.fp
        JOIN d fq ON cl.first_id = fq.doc_id
"""


# -- champion lists (top-k postings per term) --------------------------------------------------------------------------


def q_champion_lists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Champion lists (Manning/Raghavan/Schütze IR §7.1.3): for every
    term with document frequency >= 5, the top-3 documents by term
    frequency — the precomputed high-score prefix of each posting list
    that lets a ranked-retrieval engine answer most queries without
    scanning full postings. The index-build companion to
    `inverted_index`/`bm25`: at serving time only champions are
    scored first, and full postings are touched only when champions
    can't fill k. Exact integer tf, ties to the smaller doc_id.

    Scale shape: ONE groupBy(term, doc) for tf, df filter from a
    groupBy(term) broadcast semi-join, per-term top-3 window (rank
    within term partitions — parallel across terms, the classic
    build)."""
    tf = (
        _tokens(_read(spark, sf_dir, "documents"))
        .select("doc_id", F.explode("toks").alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    keep = df.where(F.col("df") >= 5).select("term")
    ranked = (
        tf.join(F.broadcast(keep), "term")
        .withColumn(
            "rank",
            F.row_number()
            .over(
                Window.partitionBy("term").orderBy(
                    F.col("tf").desc(), "doc_id"
                )
            )
            .cast("bigint"),
        )
        .where(F.col("rank") <= 3)
    )
    return ranked.select("term", "rank", "doc_id", "tf").orderBy(
        "term", "rank"
    )


SQL_CHAMPION_LISTS = f"""
WITH tf AS (
  SELECT tok.term, doc_id, count(*)::BIGINT AS tf
  FROM documents, unnest({_SQL_TOKS}) AS tok(term)
  GROUP BY 1, 2
), keep AS (
  SELECT term FROM tf GROUP BY term HAVING count(*) >= 5
), ranked AS (
  SELECT tf.term, doc_id, tf,
         row_number() OVER (PARTITION BY tf.term
                            ORDER BY tf DESC, doc_id)::BIGINT AS rank
  FROM tf JOIN keep ON tf.term = keep.term
)
SELECT term, rank, doc_id, tf FROM ranked WHERE rank <= 3
ORDER BY term, rank
"""


# -- Otsu automatic quality threshold ----------------------------------------------------------------------------------


def q_otsu_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Otsu's method (1979) over the quality-score histogram: pick the
    filter threshold that maximizes between-class variance
    w0*w1*(mu0-mu1)^2 across the 50-milli-wide score bins — automatic
    threshold selection for the quality filter, replacing the
    hand-picked cutoff with the histogram's own natural split (the
    bimodal good/spam mass). Everything is exact integers: bin counts,
    prefix sums, truncating-division class means, and the variance
    objective; argmax ties resolve to the lowest threshold.

    Scale shape: pure-map score -> ONE groupBy(bin) (<= 21 rows) ->
    prefix-sum window + argmax on that constant-size frame; the corpus
    is touched exactly once."""
    s = _tokens(_read(spark, sf_dir, "documents")).select(
        F.expr(
            f"least(1000L, 6000 * size(filter(toks,"
            f" t -> array_contains({_SPARK_STOPLIST}, t))) div"
            " greatest(1, size(toks)))"
        ).cast("bigint").alias("q")
    )
    hist = s.groupBy(F.expr("q div 50").cast("bigint").alias("b")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("q").cast("bigint").alias("sq"),
    )
    w = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select(
        "b",
        F.sum("n").over(w).cast("bigint").alias("n0"),
        F.sum("sq").over(w).cast("bigint").alias("s0"),
    ).localCheckpoint()
    tot = cum.agg(
        F.max("n0").cast("bigint").alias("nn"),
        F.max("s0").cast("bigint").alias("ss"),
    )
    scored = (
        cum.crossJoin(F.broadcast(tot))
        .where((F.col("n0") > 0) & (F.col("n0") < F.col("nn")))
        .select(
            F.expr("(b + 1) * 50").cast("bigint").alias("threshold_milli"),
            F.col("n0").alias("n_below"),
            F.expr("nn - n0").cast("bigint").alias("n_above"),
            F.expr(
                "n0 * (nn - n0) * ((s0 div n0) - ((ss - s0) div (nn - n0)))"
                " * ((s0 div n0) - ((ss - s0) div (nn - n0)))"
            )
            .cast("bigint")
            .alias("between_var"),
        )
    )
    return scored.orderBy(
        F.col("between_var").desc(), "threshold_milli"
    ).limit(1)


SQL_OTSU_THRESHOLD = f"""
WITH s AS (
  SELECT least(1000, 6000 * len(list_filter({_SQL_TOKS},
               t -> list_contains({_SQL_STOPLIST}, t)))
               // greatest(1, len({_SQL_TOKS})))::BIGINT AS q
  FROM documents
), hist AS (
  SELECT (q // 50)::BIGINT AS b, count(*)::BIGINT AS n, sum(q)::BIGINT AS sq
  FROM s GROUP BY 1
), cum AS (
  SELECT b, sum(n) OVER (ORDER BY b ROWS UNBOUNDED PRECEDING)::BIGINT AS n0,
         sum(sq) OVER (ORDER BY b ROWS UNBOUNDED PRECEDING)::BIGINT AS s0
  FROM hist
), tot AS (
  SELECT max(n0)::BIGINT AS nn, max(s0)::BIGINT AS ss FROM cum
)
SELECT ((b + 1) * 50)::BIGINT AS threshold_milli, n0 AS n_below,
       (nn - n0)::BIGINT AS n_above,
       (n0 * (nn - n0) * ((s0 // n0) - ((ss - s0) // (nn - n0)))
        * ((s0 // n0) - ((ss - s0) // (nn - n0))))::BIGINT AS between_var
FROM cum CROSS JOIN tot
WHERE n0 > 0 AND n0 < nn
ORDER BY between_var DESC, threshold_milli LIMIT 1
"""

# -- nDCG ranking evaluation -------------------------------------------------------------------------------------------


def q_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nDCG@10 per query (Järvelin & Kekäläinen 2002): docs bucket into
    20 synthetic queries (doc_id mod 20), the system ranking is the
    stopword-confidence score (desc, ties to smaller id), graded gain
    is the document-length tier least(3, n_chars div 1000), and
    nDCG = DCG/IDCG with the (2^g - 1)/log2(rank+1) ladder — the
    graded-relevance companion to `rank_auc`'s binary view and
    `rank_biased_overlap`'s rank-agreement view: it answers whether the
    cheap score puts the LONG (high-gain) docs at the top, position-
    discounted. Per-rank contributions floor to integer nano BEFORE the
    sum (the `markov_entropy_rate` treatment) so both engines sum
    identical integers in any order; the final ratio is integer micro.

    Scale shape: two windows over the same query partitioning (system
    rank, ideal rank — one exchange, Spark folds both into adjacent
    sorts), rank <= 10 prune via WindowGroupLimit, ONE groupBy(qid);
    20 output rows."""
    d = _tokens(_read(spark, sf_dir, "documents")).select(
        (F.col("doc_id") % 20).cast("bigint").alias("qid"),
        "doc_id",
        F.expr("least(3L, n_chars div 1000)").cast("bigint").alias("gain"),
        F.expr(
            f"least(1000L, 6000 * size(filter(toks,"
            f" t -> array_contains({_SPARK_STOPLIST}, t))) div"
            " greatest(1, size(toks)))"
        ).cast("bigint").alias("score"),
    )
    wq = Window.partitionBy("qid").orderBy(F.col("score").desc(), "doc_id")
    wi = Window.partitionBy("qid").orderBy(F.col("gain").desc(), "doc_id")
    ranked = d.select(
        "qid",
        "gain",
        F.row_number().over(wq).cast("bigint").alias("r_sys"),
        F.row_number().over(wi).cast("bigint").alias("r_ideal"),
    )
    contrib = ranked.select(
        "qid",
        F.expr(
            "case when r_sys <= 10 then cast(floor(1000000000.0"
            " * (power(2.0, cast(gain as double)) - 1.0)"
            " / (ln(cast(r_sys + 1 as double)) / ln(2.0))) as bigint)"
            " else 0L end"
        ).alias("dcg_term"),
        F.expr(
            "case when r_ideal <= 10 then cast(floor(1000000000.0"
            " * (power(2.0, cast(gain as double)) - 1.0)"
            " / (ln(cast(r_ideal + 1 as double)) / ln(2.0))) as bigint)"
            " else 0L end"
        ).alias("idcg_term"),
    )
    return (
        contrib.groupBy("qid")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("dcg_term").cast("bigint").alias("dcg_nano"),
            F.sum("idcg_term").cast("bigint").alias("idcg_nano"),
        )
        .select(
            "qid",
            "n_docs",
            "dcg_nano",
            "idcg_nano",
            F.expr(
                "case when idcg_nano > 0 then 1000000 * dcg_nano div idcg_nano"
                " else 1000000L end"
            )
            .cast("bigint")
            .alias("ndcg_micro"),
        )
        .orderBy("qid")
    )


SQL_NDCG_EVAL = f"""
WITH d AS (
  SELECT (doc_id % 20)::BIGINT AS qid, doc_id,
         least(3, n_chars // 1000)::BIGINT AS gain,
         least(1000, 6000 * len(list_filter({_SQL_TOKS},
               t -> list_contains({_SQL_STOPLIST}, t)))
               // greatest(1, len({_SQL_TOKS})))::BIGINT AS score
  FROM documents
), ranked AS (
  SELECT qid, gain,
         row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id
         )::BIGINT AS r_sys,
         row_number() OVER (PARTITION BY qid ORDER BY gain DESC, doc_id
         )::BIGINT AS r_ideal
  FROM d
), contrib AS (
  SELECT qid,
         CASE WHEN r_sys <= 10 THEN floor(1000000000.0
              * (pow(2.0, gain::DOUBLE) - 1.0)
              / (ln((r_sys + 1)::DOUBLE) / ln(2.0)))::BIGINT
              ELSE 0 END AS dcg_term,
         CASE WHEN r_ideal <= 10 THEN floor(1000000000.0
              * (pow(2.0, gain::DOUBLE) - 1.0)
              / (ln((r_ideal + 1)::DOUBLE) / ln(2.0)))::BIGINT
              ELSE 0 END AS idcg_term
  FROM ranked
)
SELECT qid, count(*)::BIGINT AS n_docs, sum(dcg_term)::BIGINT AS dcg_nano,
       sum(idcg_term)::BIGINT AS idcg_nano,
       (CASE WHEN sum(idcg_term) > 0
             THEN 1000000 * sum(dcg_term) // sum(idcg_term)
             ELSE 1000000 END)::BIGINT AS ndcg_micro
FROM contrib GROUP BY qid ORDER BY qid
"""


# -- fetch-success control chart (SPC) ----------------------------------------------------------------------------------


def q_fetch_success_spc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical process control over daily fetch success: per day,
    the success count (value above the corpus mean — the replay's
    success proxy), the day's rate, and the Shewhart p-chart
    out-of-control flag at 3 sigma — evaluated as the EXACT integer
    inequality (s*N - n*S)^2 > 9*S*(N-S)*n (the squared z-test with
    both sides cleared of denominators), so no float ever decides the
    flag. The crawl-ops dashboard primitive: a day outside the band is
    a fleet problem (DNS, throttling, a bad deploy), not noise —
    p-charts exist so operators don't chase the in-band wiggles.

    Scale shape: 1-row mean broadcast, ONE groupBy(day), 1-row grand
    totals broadcast back over the bounded day frame; |days| rows."""
    ev = _read(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"),
        F.expr("cast(floor(value * 1000) as bigint)").alias("v_milli"),
    )
    mean = ev.agg(F.expr("sum(v_milli) div count(*)").cast("bigint").alias("mu"))
    days = (
        ev.crossJoin(F.broadcast(mean))
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.expr("cast(v_milli >= mu as bigint)"))
            .cast("bigint")
            .alias("s"),
        )
    )
    tot = days.agg(
        F.sum("n").cast("bigint").alias("nn"),
        F.sum("s").cast("bigint").alias("ss"),
    )
    return (
        days.crossJoin(F.broadcast(tot))
        .select(
            "day",
            "n",
            "s",
            F.expr("1000 * s div n").cast("bigint").alias("rate_milli"),
            F.expr("1000 * ss div nn").cast("bigint").alias("grand_milli"),
            F.expr(
                "(s * nn - n * ss) * (s * nn - n * ss) > 9 * ss * (nn - ss) * n"
            ).alias("out_of_control"),
        )
        .orderBy("day")
    )


SQL_FETCH_SUCCESS_SPC = """
WITH ev AS (
  SELECT ts::DATE AS day, floor(value * 1000)::BIGINT AS v_milli FROM events
), mean AS (
  SELECT (sum(v_milli) // count(*))::BIGINT AS mu FROM ev
), days AS (
  SELECT day, count(*)::BIGINT AS n,
         sum(CASE WHEN v_milli >= mu THEN 1 ELSE 0 END)::BIGINT AS s
  FROM ev CROSS JOIN mean GROUP BY day
), tot AS (
  SELECT sum(n)::BIGINT AS nn, sum(s)::BIGINT AS ss FROM days
)
SELECT day, n, s,
       (1000 * s // n)::BIGINT AS rate_milli,
       (1000 * ss // nn)::BIGINT AS grand_milli,
       (s * nn - n * ss) * (s * nn - n * ss) > 9 * ss * (nn - ss) * n
         AS out_of_control
FROM days CROSS JOIN tot ORDER BY day
"""


# -- typosquat / homoglyph host detection -------------------------------------------------------------------------------


def q_typosquat_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typosquat detection at crawl admission: candidate hostnames
    (synthesized per doc; every 4th injects the 1-for-i homoglyph and
    every 7th the 0-for-o) are normalized through the confusables map
    (1->i, 0->o) and matched against the 10 legitimate high-traffic
    hosts (top event sources) at Levenshtein distance <= 1, excluding
    exact self — the admission screen that keeps look-alike domains
    from inheriting a legitimate host's crawl priority or polluting a
    per-domain quality rollup. Per legit host: candidate hits and the
    lexically-first offender.

    Scale shape: pure-map normalization, the 10-row legit list
    broadcast into the candidate scan (JVM levenshtein, no UDF), ONE
    groupBy; output <= 10 rows."""
    legit = (
        _read(spark, sf_dir, "events")
        .groupBy(
            F.concat(
                F.lit("site"), (F.col("user_id") % 10).cast("string"), F.lit(".com")
            ).alias("legit_host")
        )
        .agg(F.count(F.lit(1)).alias("traffic"))
        .select("legit_host")
    )
    cand = _read(spark, sf_dir, "documents").select(
        F.concat(
            F.lit("s"),
            F.when(F.col("doc_id") % 4 == 0, F.lit("1te")).otherwise(F.lit("ite")),
            (F.col("doc_id") % 13).cast("string"),
            F.when(F.col("doc_id") % 7 == 0, F.lit(".c0m")).otherwise(F.lit(".com")),
        ).alias("cand_host")
    )
    norm = cand.select(
        "cand_host",
        F.expr("replace(replace(cand_host, '1', 'i'), '0', 'o')").alias("norm_host"),
    )
    hits = (
        norm.join(F.broadcast(legit))
        .where(
            (F.levenshtein("norm_host", "legit_host") <= 1)
            & (F.col("cand_host") != F.col("legit_host"))
        )
    )
    return (
        hits.groupBy("legit_host")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("squat_hits"),
            F.countDistinct("cand_host").cast("bigint").alias("squat_names"),
            F.min("cand_host").alias("example"),
        )
        .orderBy("legit_host")
    )


SQL_TYPOSQUAT_DETECT = """
WITH legit AS (
  SELECT DISTINCT 'site' || (user_id % 10)::VARCHAR || '.com' AS legit_host
  FROM events
), cand AS (
  SELECT 's' || (CASE WHEN doc_id % 4 = 0 THEN '1te' ELSE 'ite' END)
         || (doc_id % 13)::VARCHAR
         || (CASE WHEN doc_id % 7 = 0 THEN '.c0m' ELSE '.com' END) AS cand_host
  FROM documents
), norm AS (
  SELECT cand_host, replace(replace(cand_host, '1', 'i'), '0', 'o') AS norm_host
  FROM cand
), hits AS (
  SELECT legit_host, cand_host
  FROM norm CROSS JOIN legit
  WHERE levenshtein(norm_host, legit_host) <= 1 AND cand_host <> legit_host
)
SELECT legit_host, count(*)::BIGINT AS squat_hits,
       count(DISTINCT cand_host)::BIGINT AS squat_names,
       min(cand_host) AS example
FROM hits GROUP BY legit_host ORDER BY legit_host
"""

# -- source vocabulary overlap ------------------------------------------------------------------------------------------


def q_source_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-level vocabulary overlap: Jaccard similarity of the
    distinct-term sets of every source pair, in milli — the
    mixture-design companion to `cross_source_dup_matrix`: that one
    counts literally duplicated documents, this one measures how much
    two sources even talk about the same things. Two sources with high
    vocab overlap and low dup overlap are complementary takes on one
    domain (keep both); high dup + high vocab is redundant mass
    (down-weight one). Exact distinct-set arithmetic throughout.

    Scale shape: distinct (source, term) reduce; the pair intersection
    is a term-bucket self-join (per-term work is |sources|^2, tiny);
    vocab sizes join back broadcast; |sources| choose 2 output rows."""
    st = (
        _tokens(_read(spark, sf_dir, "documents"))
        .select("source", F.explode("toks").alias("term"))
        .distinct()
        .localCheckpoint()
    )
    sizes = st.groupBy("source").agg(F.count(F.lit(1)).cast("bigint").alias("v"))
    a, b = st.alias("a"), st.alias("b")
    inter = (
        a.join(b, "term")
        .where(F.col("a.source") < F.col("b.source"))
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("i"))
    )
    va = sizes.select(F.col("source").alias("source_a"), F.col("v").alias("va"))
    vb = sizes.select(F.col("source").alias("source_b"), F.col("v").alias("vb"))
    return (
        inter.join(F.broadcast(va), "source_a")
        .join(F.broadcast(vb), "source_b")
        .select(
            "source_a",
            "source_b",
            "i",
            "va",
            "vb",
            F.expr("1000 * i div (va + vb - i)")
            .cast("bigint")
            .alias("jaccard_milli"),
        )
        .orderBy("source_a", "source_b")
    )


SQL_SOURCE_VOCAB_OVERLAP = f"""
WITH st AS (
  SELECT DISTINCT source, tok.term
  FROM documents, unnest({_SQL_TOKS}) AS tok(term)
), sizes AS (
  SELECT source, count(*)::BIGINT AS v FROM st GROUP BY source
), inter AS (
  SELECT a.source AS source_a, b.source AS source_b, count(*)::BIGINT AS i
  FROM st a JOIN st b ON a.term = b.term AND a.source < b.source
  GROUP BY 1, 2
)
SELECT source_a, source_b, i, va.v AS va, vb.v AS vb,
       (1000 * i // (va.v + vb.v - i))::BIGINT AS jaccard_milli
FROM inter JOIN sizes va ON source_a = va.source
           JOIN sizes vb ON source_b = vb.source
ORDER BY source_a, source_b
"""


# -- trending-term churn between halves ----------------------------------------------------------------------------------


def q_topk_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trending-vocabulary churn: the top-20 terms by frequency in each
    corpus half (doc_id parity standing in for consecutive crawl
    windows), and how much the leaderboard changed — overlap count,
    set Jaccard, and churn (symmetric difference over union), all in
    exact milli. The operational drift alarm a dashboard actually
    shows: `wasserstein_drift`/`psi_drift` watch full distributions,
    this watches the handful of terms an operator can read. Ties break
    lexically; everything after the two top-20 cuts is set arithmetic
    on 40 rows.

    Scale shape: per-half term reduce -> two TakeOrdered top-20s ->
    full-outer join of two 20-row frames; single-row output."""
    t = _tokens(_read(spark, sf_dir, "documents")).select(
        (F.col("doc_id") % 2).cast("bigint").alias("half"),
        F.explode("toks").alias("term"),
    )
    counts = t.groupBy("half", "term").agg(
        F.count(F.lit(1)).cast("bigint").alias("f")
    )
    w = Window.partitionBy("half").orderBy(F.col("f").desc(), "term")
    top = (
        counts.withColumn("r", F.row_number().over(w))
        .where(F.col("r") <= 20)
        .localCheckpoint()
    )
    a = top.where(F.col("half") == 0).select(F.col("term").alias("ta"))
    b = top.where(F.col("half") == 1).select(F.col("term").alias("tb"))
    # both sides are exactly k rows, so overlap determines the whole set
    # algebra: |union| = 2k - i, |sym diff| = 2k - 2i — and the inner join
    # broadcasts (full-outer would force a sort-merge)
    j = a.join(F.broadcast(b), a.ta == b.tb).agg(
        F.count(F.lit(1)).cast("bigint").alias("i")
    )
    return j.select(
        F.lit(20).cast("bigint").alias("k"),
        F.col("i").alias("overlap"),
        F.expr("1000 * i div (40 - i)").cast("bigint").alias("jaccard_milli"),
        F.expr("1000 * (40 - 2 * i) div (40 - i)")
        .cast("bigint")
        .alias("churn_milli"),
    )


SQL_TOPK_CHURN = f"""
WITH t AS (
  SELECT (doc_id % 2)::BIGINT AS half, tok.term
  FROM documents, unnest({_SQL_TOKS}) AS tok(term)
), counts AS (
  SELECT half, term, count(*)::BIGINT AS f FROM t GROUP BY 1, 2
), top AS (
  SELECT half, term,
         row_number() OVER (PARTITION BY half ORDER BY f DESC, term) AS r
  FROM counts QUALIFY r <= 20
), j AS (
  SELECT count(*)::BIGINT AS i
  FROM (SELECT term FROM top WHERE half = 0) a
       JOIN (SELECT term FROM top WHERE half = 1) b ON a.term = b.term
)
SELECT 20::BIGINT AS k, i AS overlap,
       (1000 * i // (40 - i))::BIGINT AS jaccard_milli,
       (1000 * (40 - 2 * i) // (40 - i))::BIGINT AS churn_milli
FROM j
"""


# -- Cochran-Armitage trend test -----------------------------------------------------------------------------------------


def q_trend_test_ca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran-Armitage trend test (Armitage 1955): is the English rate
    MONOTONICALLY trending across document-length deciles, not just
    different somewhere (`chisq_independence`'s question)? Deciles by
    ntile over (n_chars, doc_id), binary outcome lang='en', linear
    scores w = decile index. The N-cleared statistic
    U = sum w_i*(s_i*N - n_i*S) and variance core
    V = S*(N-S)*(N*sum n_i*w_i^2 - (sum n_i*w_i)^2) are exact bigints;
    z^2 = U^2*N/V is evaluated in doubles only at the very end (milli,
    floored), and the direction sign is exact. The dose-response audit
    for 'longer docs are more likely English' — a trend invisible to
    the omnibus chi-square when it's spread thinly across bins.

    Scale shape: one ntile window, ONE groupBy(bin), all moments from
    the 10-row bin frame; single-row output."""
    d = _read(spark, sf_dir, "documents").select(
        "doc_id", "n_chars", (F.col("lang") == "en").alias("y")
    )
    binned = d.withColumn(
        "w",
        F.ntile(10).over(Window.orderBy("n_chars", "doc_id")).cast("bigint"),
    )
    bins = binned.groupBy("w").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.expr("cast(y as bigint)")).cast("bigint").alias("s"),
    )
    agg = bins.agg(
        F.sum("n").cast("bigint").alias("nn"),
        F.sum("s").cast("bigint").alias("ss"),
        F.sum(F.expr("n * w")).cast("bigint").alias("b"),
        F.sum(F.expr("n * w * w")).cast("bigint").alias("a"),
        F.sum(F.expr("w * s")).cast("bigint").alias("ws"),
        F.sum(F.expr("w * n")).cast("bigint").alias("wn"),
    )
    return agg.select(
        F.col("nn").alias("n_docs"),
        F.col("ss").alias("n_pos"),
        F.expr("ws * nn - wn * ss").cast("bigint").alias("u"),
        F.expr("ss * (nn - ss) * (nn * a - b * b)").cast("bigint").alias("v"),
        F.expr(
            "cast(floor(1000.0 * cast(ws * nn - wn * ss as double)"
            " * cast(ws * nn - wn * ss as double) * cast(nn as double)"
            " / cast(ss * (nn - ss) * (nn * a - b * b) as double)) as bigint)"
        ).alias("z2_milli"),
        F.expr("cast(sign(ws * nn - wn * ss) as bigint)").alias("direction"),
    )


SQL_TREND_TEST_CA = """
WITH d AS (
  SELECT doc_id, n_chars, (lang = 'en') AS y FROM documents
), binned AS (
  SELECT *, ntile(10) OVER (ORDER BY n_chars, doc_id)::BIGINT AS w FROM d
), bins AS (
  SELECT w, count(*)::BIGINT AS n,
         sum(CASE WHEN y THEN 1 ELSE 0 END)::BIGINT AS s
  FROM binned GROUP BY w
), agg AS (
  SELECT sum(n)::BIGINT AS nn, sum(s)::BIGINT AS ss,
         sum(n * w)::BIGINT AS b, sum(n * w * w)::BIGINT AS a,
         sum(w * s)::BIGINT AS ws, sum(w * n)::BIGINT AS wn
  FROM bins
)
SELECT nn AS n_docs, ss AS n_pos,
       (ws * nn - wn * ss)::BIGINT AS u,
       (ss * (nn - ss) * (nn * a - b * b))::BIGINT AS v,
       floor(1000.0 * (ws * nn - wn * ss)::DOUBLE * (ws * nn - wn * ss)::DOUBLE
             * nn::DOUBLE / (ss * (nn - ss) * (nn * a - b * b))::DOUBLE
       )::BIGINT AS z2_milli,
       sign(ws * nn - wn * ss)::BIGINT AS direction
FROM agg
"""

# -- Markov next-event prediction accuracy -------------------------------------------------------------------------------


def q_markov_prediction_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-1 Markov prediction accuracy: train the order-1 chain on ALL
    per-user transitions (global counts, argmax next state per current
    state, ties lexical) and score it on the same transitions — the
    eval-side companion to `markov_entropy_rate`: entropy says how
    predictable behaviour is IN PRINCIPLE, this says what the
    simplest possible predictor actually achieves, per state. The gap
    between the two is the payoff ceiling for any fancier session
    model. Integer-exact counts and milli accuracy.

    Scale shape: one per-user lead window, ONE groupBy(cur, nxt) to the
    bounded |types|^2 frame, argmax via a rank on that frame, broadcast
    of the |types|-row predictor back onto the transition counts —
    the corpus is scanned once."""
    ev = _read(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", _us("ts").alias("ts_us")
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    trans = (
        ev.withColumn("nxt", F.lead("event_type").over(w))
        .where(F.col("nxt").isNotNull())
        .groupBy(F.col("event_type").alias("cur"), "nxt")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .localCheckpoint()
    )
    pred = (
        trans.withColumn(
            "r",
            F.row_number().over(
                Window.partitionBy("cur").orderBy(F.col("c").desc(), "nxt")
            ),
        )
        .where(F.col("r") == 1)
        .select("cur", F.col("nxt").alias("predicted"))
    )
    return (
        trans.join(F.broadcast(pred), "cur")
        .groupBy("cur")
        .agg(
            F.max("predicted").alias("predicted"),
            F.sum("c").cast("bigint").alias("n_trans"),
            F.sum(F.expr("case when nxt = predicted then c else 0L end"))
            .cast("bigint")
            .alias("hits"),
        )
        .select(
            "cur",
            "predicted",
            "n_trans",
            "hits",
            F.expr("1000 * hits div n_trans").cast("bigint").alias("acc_milli"),
        )
        .orderBy("cur")
    )


SQL_MARKOV_PREDICTION_ACCURACY = """
WITH ev AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM events
), trans AS (
  SELECT cur, nxt, count(*)::BIGINT AS c
  FROM (SELECT event_type AS cur,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts_us, event_id) AS nxt
        FROM ev)
  WHERE nxt IS NOT NULL GROUP BY 1, 2
), pred AS (
  SELECT cur, nxt AS predicted
  FROM (SELECT cur, nxt,
               row_number() OVER (PARTITION BY cur ORDER BY c DESC, nxt) AS r
        FROM trans)
  WHERE r = 1
)
SELECT t.cur, max(predicted) AS predicted, sum(c)::BIGINT AS n_trans,
       sum(CASE WHEN t.nxt = p.predicted THEN c ELSE 0 END)::BIGINT AS hits,
       (1000 * sum(CASE WHEN t.nxt = p.predicted THEN c ELSE 0 END)
        // sum(c))::BIGINT AS acc_milli
FROM trans t JOIN pred p ON t.cur = p.cur
GROUP BY t.cur ORDER BY t.cur
"""


# -- histogram quantile-sketch error audit -------------------------------------------------------------------------------


def q_quantile_sketch_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-sketch error audit: the exact interpolated p50/p90/p99
    of the event value (milli-quantized) versus the answer a 64-bin
    equal-width histogram sketch gives (lower edge of the first bin
    whose cumulative count reaches ceil(p*N)) — the error you actually
    accept when, at 100 TB, percentiles come from a mergeable histogram
    instead of a full sort. Reported as absolute error and as milli of
    the value range: equal-width sketches are great at the median of a
    flat distribution and collapse in skewed tails, and THIS table is
    what shows it per corpus. Integer-exact except the established
    floor(percentile) treatment.

    Scale shape: one min/max/percentile aggregate + ONE groupBy(bin)
    (<= 64 rows) + prefix window and threshold pick on that constant
    frame; the sketch itself is a single map-side pass at scale."""
    v = _read(spark, sf_dir, "events").select(
        F.expr("cast(floor(value * 1000) as bigint)").alias("v")
    )
    stats = v.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.min("v").cast("bigint").alias("lo"),
        F.max("v").cast("bigint").alias("hi"),
        F.expr("cast(floor(percentile(v, 0.5)) as bigint)").alias("q50"),
        F.expr("cast(floor(percentile(v, 0.9)) as bigint)").alias("q90"),
        F.expr("cast(floor(percentile(v, 0.99)) as bigint)").alias("q99"),
    ).localCheckpoint()
    hist = (
        v.crossJoin(F.broadcast(stats))
        .groupBy(
            F.expr("least(63L, (64 * (v - lo)) div greatest(1L, hi - lo))")
            .cast("bigint")
            .alias("b")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    cum = hist.withColumn(
        "cumc",
        F.sum("c").over(
            Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
        ).cast("bigint"),
    )
    grid = spark.createDataFrame(
        [(50, 100), (90, 100), (99, 100)], "pn bigint, pd bigint"
    )
    picked = (
        grid.crossJoin(F.broadcast(stats))
        .join(cum, F.expr("cumc >= (n * pn + pd - 1) div pd"))
        .groupBy("pn", "pd", "lo", "hi", "q50", "q90", "q99")
        .agg(F.min("b").cast("bigint").alias("bin"))
    )
    return (
        picked.select(
            F.expr("1000 * pn div pd").cast("bigint").alias("p_milli"),
            F.expr(
                "case when pn = 50 then q50 when pn = 90 then q90 else q99 end"
            ).cast("bigint").alias("exact_q"),
            F.expr("lo + (bin * (hi - lo)) div 64").cast("bigint").alias("approx_q"),
            F.expr(
                "abs((lo + (bin * (hi - lo)) div 64)"
                " - case when pn = 50 then q50 when pn = 90 then q90"
                " else q99 end)"
            ).cast("bigint").alias("abs_err"),
            F.expr(
                "1000 * abs((lo + (bin * (hi - lo)) div 64)"
                " - case when pn = 50 then q50 when pn = 90 then q90"
                " else q99 end) div greatest(1L, hi - lo)"
            ).cast("bigint").alias("err_range_milli"),
        )
        .orderBy("p_milli")
    )


SQL_QUANTILE_SKETCH_ERROR = """
WITH v AS (
  SELECT floor(value * 1000)::BIGINT AS v FROM events
), stats AS (
  SELECT count(*)::BIGINT AS n, min(v)::BIGINT AS lo, max(v)::BIGINT AS hi,
         floor(quantile_cont(v, 0.5))::BIGINT AS q50,
         floor(quantile_cont(v, 0.9))::BIGINT AS q90,
         floor(quantile_cont(v, 0.99))::BIGINT AS q99
  FROM v
), hist AS (
  SELECT least(63, (64 * (v - lo)) // greatest(1, hi - lo))::BIGINT AS b,
         count(*)::BIGINT AS c
  FROM v CROSS JOIN stats GROUP BY 1
), cum AS (
  SELECT b, sum(c) OVER (ORDER BY b ROWS UNBOUNDED PRECEDING)::BIGINT AS cumc
  FROM hist
), grid AS (
  SELECT * FROM (VALUES (50, 100), (90, 100), (99, 100)) AS t(pn, pd)
), picked AS (
  SELECT pn, pd, lo, hi, q50, q90, q99, min(b)::BIGINT AS bin
  FROM grid CROSS JOIN stats JOIN cum
       ON cumc >= (n * pn + pd - 1) // pd
  GROUP BY 1, 2, 3, 4, 5, 6, 7
)
SELECT (1000 * pn // pd)::BIGINT AS p_milli,
       (CASE WHEN pn = 50 THEN q50 WHEN pn = 90 THEN q90 ELSE q99
        END)::BIGINT AS exact_q,
       (lo + (bin * (hi - lo)) // 64)::BIGINT AS approx_q,
       abs((lo + (bin * (hi - lo)) // 64)
           - CASE WHEN pn = 50 THEN q50 WHEN pn = 90 THEN q90 ELSE q99 END
       )::BIGINT AS abs_err,
       (1000 * abs((lo + (bin * (hi - lo)) // 64)
           - CASE WHEN pn = 50 THEN q50 WHEN pn = 90 THEN q90 ELSE q99 END)
        // greatest(1, hi - lo))::BIGINT AS err_range_milli
FROM picked ORDER BY p_milli
"""


# -- sample-based join cardinality estimation ----------------------------------------------------------------------------


def q_sample_join_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bernoulli-sample join size estimation (the query-optimizer trick,
    cf. Vengerov et al. VLDB'15): sample orders and lineitem
    INDEPENDENTLY at 4% each with deterministic md5 coin flips
    (side-salted so the two samples don't correlate), join the samples,
    scale the count by 1/(0.04^2) = 625, and compare against the true
    |orders ⋈ lineitem| — the cheap pre-flight that decides shuffle
    partitioning for a join too big to run blind. Complements
    `join_card_estimate` (histogram calibration) with the sampling
    path; the relative error column is the honest answer to 'can I
    trust a 4% sample on a key this skewed?'.

    Scale shape: two map-side sampled scans (the md5 predicate pushes
    into the scan), a join that is 0.16% of the true join's work, 1-row
    totals; single-row output."""
    o = _read(spark, sf_dir, "orders").select(F.col("o_orderkey").alias("ok"))
    l = _read(spark, sf_dir, "lineitem").select(F.col("l_orderkey").alias("ok"))
    true_n = o.join(l, "ok").agg(F.count(F.lit(1)).cast("bigint").alias("t"))
    os = o.where(
        F.expr(
            "cast(conv(substring(md5(concat('O:', cast(ok as string))), 1, 8),"
            " 16, 10) as bigint) % 25 = 0"
        )
    )
    ls = l.where(
        F.expr(
            "cast(conv(substring(md5(concat('L:', cast(ok as string))), 1, 8),"
            " 16, 10) as bigint) % 25 = 0"
        )
    )
    samp = os.join(ls, "ok").agg(F.count(F.lit(1)).cast("bigint").alias("s"))
    return (
        true_n.crossJoin(F.broadcast(samp))
        .select(
            F.col("t").alias("true_size"),
            F.col("s").alias("sample_join_size"),
            F.expr("s * 625").cast("bigint").alias("estimate"),
            F.expr("1000 * abs(s * 625 - t) div t")
            .cast("bigint")
            .alias("rel_err_milli"),
        )
    )


SQL_SAMPLE_JOIN_ESTIMATE = """
WITH o AS (
  SELECT o_orderkey AS ok FROM orders
), l AS (
  SELECT l_orderkey AS ok FROM lineitem
), t AS (
  SELECT count(*)::BIGINT AS t FROM o JOIN l USING (ok)
), os AS (
  SELECT ok FROM o
  WHERE (('0x' || substr(md5('O:' || ok::VARCHAR), 1, 8))::BIGINT) % 25 = 0
), ls AS (
  SELECT ok FROM l
  WHERE (('0x' || substr(md5('L:' || ok::VARCHAR), 1, 8))::BIGINT) % 25 = 0
), s AS (
  SELECT count(*)::BIGINT AS s FROM os JOIN ls USING (ok)
)
SELECT t AS true_size, s AS sample_join_size,
       (s * 625)::BIGINT AS estimate,
       (1000 * abs(s * 625 - t) // t)::BIGINT AS rel_err_milli
FROM t CROSS JOIN s
"""

# -- birthday-collision hash audit ---------------------------------------------------------------------------------------


def q_birthday_collision_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Birthday-collision audit of truncated hashing: for the corpus's
    distinct doc keys, count the ACTUAL colliding pairs under 16-bit
    and 24-bit md5 prefixes and compare with the birthday expectation
    C(n,2)/2^k — the empirical check behind every 'a k-bit fingerprint
    is enough' decision (`dedup_exact`, the bloom shards, the CDX
    digests): an observed/expected ratio far above 1000 milli means
    the key material is biased and the fingerprint width is lying
    about its collision rate. Exact integer pair counts and
    expectations.

    Scale shape: per width ONE groupBy(prefix) with C(c,2) arithmetic
    on the group sizes (never a pair self-join), 1-row totals; 2 output
    rows."""
    keys = _read(spark, sf_dir, "documents").select(
        F.md5(F.col("doc_id").cast("string")).alias("h")
    )
    grid = spark.createDataFrame([(16,), (24,)], "k bigint")
    pref = keys.crossJoin(F.broadcast(grid)).select(
        "k", F.expr("substring(h, 1, cast(k div 4 as int))").alias("p")
    )
    per = pref.groupBy("k", "p").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    return (
        per.groupBy("k")
        .agg(
            F.sum("c").cast("bigint").alias("n_keys"),
            F.sum(F.expr("c * (c - 1) div 2")).cast("bigint").alias("observed_pairs"),
        )
        .select(
            "k",
            "n_keys",
            "observed_pairs",
            F.expr(
                "(n_keys * (n_keys - 1) div 2) div shiftleft(1L, cast(k as int))"
            )
            .cast("bigint")
            .alias("expected_pairs"),
            F.expr(
                "case when (n_keys * (n_keys - 1) div 2)"
                " div shiftleft(1L, cast(k as int)) > 0 then"
                " 1000 * observed_pairs div ((n_keys * (n_keys - 1) div 2)"
                " div shiftleft(1L, cast(k as int))) else -1L end"
            )
            .cast("bigint")
            .alias("ratio_milli"),
        )
        .orderBy("k")
    )


SQL_BIRTHDAY_COLLISION_AUDIT = """
WITH keys AS (
  SELECT md5(doc_id::VARCHAR) AS h FROM documents
), grid AS (
  SELECT unnest([16::BIGINT, 24::BIGINT]) AS k
), pref AS (
  SELECT k, substr(h, 1, (k // 4)::INTEGER) AS p FROM keys CROSS JOIN grid
), per AS (
  SELECT k, p, count(*)::BIGINT AS c FROM pref GROUP BY 1, 2
), agg AS (
  SELECT k, sum(c)::BIGINT AS n_keys,
         sum(c * (c - 1) // 2)::BIGINT AS observed_pairs
  FROM per GROUP BY k
)
SELECT k, n_keys, observed_pairs,
       ((n_keys * (n_keys - 1) // 2) // (1::BIGINT << k::INTEGER))::BIGINT
         AS expected_pairs,
       (CASE WHEN (n_keys * (n_keys - 1) // 2) // (1::BIGINT << k::INTEGER) > 0
             THEN 1000 * observed_pairs
                  // ((n_keys * (n_keys - 1) // 2) // (1::BIGINT << k::INTEGER))
             ELSE -1 END)::BIGINT AS ratio_milli
FROM agg ORDER BY k
"""


# -- context-length planning sweep ----------------------------------------------------------------------------------------


def q_context_length_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-length planning sweep: for L in {512, 2048, 8192}, what
    the corpus loses under the two standard packing policies —
    per-document truncation at L (tokens beyond L are dropped; the
    cheap policy) versus concat-and-cut streaming (documents
    concatenated and sliced every L; only the final slice pads). Per L:
    docs truncated, truncation loss in milli of all tokens, stream
    sequence count, and stream padding waste in milli — the one table
    that turns 'pick a context length' from folklore into arithmetic
    (`sequence_pack` implements one policy at one L; this is the sweep
    that chooses L). Exact integers.

    Scale shape: per-doc token counts (one map + 1-row totals), a 3-row
    grid broadcast; no shuffle beyond the count reduce."""
    nt = _tokens(_read(spark, sf_dir, "documents")).select(
        F.expr("cast(size(toks) as bigint)").alias("nt")
    )
    grid = spark.createDataFrame([(512,), (2048,), (8192,)], "l bigint")
    j = nt.crossJoin(F.broadcast(grid))
    per_l = j.groupBy("l").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("nt").cast("bigint").alias("total_tokens"),
        F.sum(F.expr("cast(nt > l as bigint)")).cast("bigint").alias("docs_truncated"),
        F.sum(F.expr("greatest(0L, nt - l)")).cast("bigint").alias("tokens_lost"),
    )
    return (
        per_l.select(
            "l",
            "n_docs",
            "docs_truncated",
            F.expr("1000 * tokens_lost div total_tokens")
            .cast("bigint")
            .alias("trunc_loss_milli"),
            F.expr("(total_tokens + l - 1) div l").cast("bigint").alias("stream_seqs"),
            F.expr(
                "1000 * (((total_tokens + l - 1) div l) * l - total_tokens)"
                " div (((total_tokens + l - 1) div l) * l)"
            )
            .cast("bigint")
            .alias("stream_waste_milli"),
        )
        .orderBy("l")
    )


SQL_CONTEXT_LENGTH_SWEEP = f"""
WITH nt AS (
  SELECT len({_SQL_TOKS})::BIGINT AS nt FROM documents
), grid AS (
  SELECT unnest([512::BIGINT, 2048::BIGINT, 8192::BIGINT]) AS l
), per_l AS (
  SELECT l, count(*)::BIGINT AS n_docs, sum(nt)::BIGINT AS total_tokens,
         sum(CASE WHEN nt > l THEN 1 ELSE 0 END)::BIGINT AS docs_truncated,
         sum(greatest(0, nt - l))::BIGINT AS tokens_lost
  FROM nt CROSS JOIN grid GROUP BY l
)
SELECT l, n_docs, docs_truncated,
       (1000 * tokens_lost // total_tokens)::BIGINT AS trunc_loss_milli,
       ((total_tokens + l - 1) // l)::BIGINT AS stream_seqs,
       (1000 * (((total_tokens + l - 1) // l) * l - total_tokens)
        // (((total_tokens + l - 1) // l) * l))::BIGINT AS stream_waste_milli
FROM per_l ORDER BY l
"""


# -- simhash bit-balance audit ---------------------------------------------------------------------------------------------


def q_simhash_bit_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash bit-balance audit: for each of the 32 signature bits
    (`q_simhash`'s exact construction), the share of documents with
    that bit set, in milli — a healthy locality-sensitive signature has
    every bit near 500 (each hyperplane splits the corpus in half); a
    bit pinned near 0 or 1000 carries no information, silently widening
    every Hamming-band bucket (`simhash_hamming_pairs`) and inflating
    candidate counts. The deviation column ranks the worst offenders.
    Integer-exact end to end (same md5 bit arithmetic as the signature
    itself).

    Scale shape: reuses the simhash per-doc reduce (tf groupBy + bit
    groupBy), then ONE 32-group aggregate; 32 output rows."""
    sh = q_simhash(spark, sf_dir).select("simhash")
    bits = sh.select(
        F.explode(F.sequence(F.lit(0), F.lit(31))).alias("bit"),
        F.col("simhash"),
    )
    return (
        bits.groupBy("bit")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.expr("shiftright(simhash, bit) % 2"))
            .cast("bigint")
            .alias("ones"),
        )
        .select(
            F.col("bit").cast("bigint").alias("bit"),
            "n_docs",
            "ones",
            F.expr("1000 * ones div n_docs").cast("bigint").alias("share_milli"),
            F.expr("abs(1000 * ones div n_docs - 500)")
            .cast("bigint")
            .alias("dev_milli"),
        )
        .orderBy("bit")
    )


SQL_SIMHASH_BIT_BALANCE = f"""
WITH toks AS (
  SELECT doc_id, unnest({_SQL_TOKS}) AS tok FROM documents
), tf AS (
  SELECT doc_id, tok, count(*) AS c,
         ('0x' || substr(md5(tok), 1, 8))::BIGINT AS hv
  FROM toks GROUP BY doc_id, tok
), bits AS (
  SELECT doc_id, i,
         sum(CASE WHEN (hv >> i) & 1 = 1 THEN c ELSE -c END) AS s
  FROM tf, (SELECT unnest(range(32)) AS i) ii
  GROUP BY doc_id, i
), sh AS (
  SELECT doc_id,
         sum(CASE WHEN s > 0 THEN (1::BIGINT << i::INTEGER) ELSE 0 END)::BIGINT
           AS simhash
  FROM bits GROUP BY doc_id
), per_bit AS (
  SELECT b.bit, count(*)::BIGINT AS n_docs,
         sum((simhash >> b.bit::INTEGER) & 1)::BIGINT AS ones
  FROM sh, (SELECT unnest(range(32)) AS bit) b
  GROUP BY b.bit
)
SELECT bit::BIGINT AS bit, n_docs, ones,
       (1000 * ones // n_docs)::BIGINT AS share_milli,
       abs(1000 * ones // n_docs - 500)::BIGINT AS dev_milli
FROM per_bit ORDER BY bit
"""

# -- Jain's fairness index ----------------------------------------------------------------------------------------------


def q_jain_fairness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jain's fairness index over per-host fetch allocations
    (Jain/Chiu/Hawe 1984): J = (sum x)^2 / (n * sum x^2), the
    networking-standard fairness score — 1000 milli when every host
    gets the same share, 1000/n when one host gets everything; unlike
    `gini_host_concentration` it is directly interpretable as 'the
    crawl is effectively spreading over J*n of its n hosts'. That
    effective-host count is also reported (it is the same statistic
    ESS-style). Exact integers.

    Scale shape: ONE groupBy(host) then one 1-row aggregate; nothing
    else."""
    x = (
        _read(spark, sf_dir, "events")
        .groupBy(F.col("user_id").alias("host"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    )
    return x.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hosts"),
        F.sum("x").cast("bigint").alias("total"),
        F.min("x").cast("bigint").alias("min_x"),
        F.max("x").cast("bigint").alias("max_x"),
        F.expr("1000 * (sum(x) * sum(x)) div (count(*) * sum(x * x))")
        .cast("bigint")
        .alias("jain_milli"),
        F.expr("(sum(x) * sum(x)) div sum(x * x)")
        .cast("bigint")
        .alias("effective_hosts"),
    )


SQL_JAIN_FAIRNESS = """
WITH x AS (
  SELECT user_id AS host, count(*)::BIGINT AS x FROM events GROUP BY user_id
)
SELECT count(*)::BIGINT AS n_hosts, sum(x)::BIGINT AS total,
       min(x)::BIGINT AS min_x, max(x)::BIGINT AS max_x,
       (1000 * (sum(x) * sum(x)) // (count(*) * sum(x * x)))::BIGINT
         AS jain_milli,
       ((sum(x) * sum(x)) // sum(x * x))::BIGINT AS effective_hosts
FROM x
"""


# -- duplicate-rate growth curve -------------------------------------------------------------------------------------------


def q_dup_growth_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-rate growth curve: the corpus in doc_id order, cut at
    quartile prefixes, and for each prefix the duplicate share under
    the 40-char-prefix fingerprint — the dedup analogue of
    `heaps_law`: vocabulary growth decelerates with scale while dup
    rate ACCELERATES (every new document has more history to collide
    with), and this curve is the empirical rate. The number that
    decides how dedup cost should be budgeted as the crawl 10x-es:
    extrapolate the last two points, not the average. Exact arithmetic
    from first-occurrence quartiles — distinct counts for all four
    nested prefixes come from ONE pass, no per-prefix rescans.

    Scale shape: ntile window for quartiles, ONE groupBy(fp) keeping
    min(quartile), two 4-row cumulative re-aggregates; 4 output rows."""
    d = _read(spark, sf_dir, "documents").select(
        "doc_id", F.md5(F.substring("text", 1, 40)).alias("fp")
    )
    qd = d.withColumn(
        "q", F.ntile(4).over(Window.orderBy("doc_id")).cast("bigint")
    )
    docs_per_q = qd.groupBy("q").agg(F.count(F.lit(1)).cast("bigint").alias("nd"))
    first_per_q = (
        qd.groupBy("fp")
        .agg(F.min("q").cast("bigint").alias("q"))
        .groupBy("q")
        .agg(F.count(F.lit(1)).cast("bigint").alias("nf"))
    )
    w = Window.orderBy("q").rowsBetween(Window.unboundedPreceding, 0)
    cur = (
        docs_per_q.join(first_per_q, "q")
        .select(
            "q",
            F.sum("nd").over(w).cast("bigint").alias("docs"),
            F.sum("nf").over(w).cast("bigint").alias("distinct_fp"),
        )
    )
    return cur.select(
        F.col("q").alias("prefix_quartile"),
        "docs",
        "distinct_fp",
        F.expr("docs - distinct_fp").cast("bigint").alias("dup_docs"),
        F.expr("1000 * (docs - distinct_fp) div docs")
        .cast("bigint")
        .alias("dup_share_milli"),
    ).orderBy("prefix_quartile")


SQL_DUP_GROWTH_CURVE = """
WITH d AS (
  SELECT doc_id, md5(substr(text, 1, 40)) AS fp,
         ntile(4) OVER (ORDER BY doc_id)::BIGINT AS q
  FROM documents
), docs_per_q AS (
  SELECT q, count(*)::BIGINT AS nd FROM d GROUP BY q
), first_per_q AS (
  SELECT q, count(*)::BIGINT AS nf
  FROM (SELECT fp, min(q)::BIGINT AS q FROM d GROUP BY fp) GROUP BY q
), cur AS (
  SELECT dq.q,
         sum(nd) OVER (ORDER BY dq.q ROWS UNBOUNDED PRECEDING)::BIGINT AS docs,
         sum(nf) OVER (ORDER BY dq.q ROWS UNBOUNDED PRECEDING)::BIGINT
           AS distinct_fp
  FROM docs_per_q dq JOIN first_per_q fq ON dq.q = fq.q
)
SELECT q AS prefix_quartile, docs, distinct_fp,
       (docs - distinct_fp)::BIGINT AS dup_docs,
       (1000 * (docs - distinct_fp) // docs)::BIGINT AS dup_share_milli
FROM cur ORDER BY prefix_quartile
"""


# -- int8 scalar-quantization error audit -------------------------------------------------------------------------------------


def q_int8_quant_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar-quantization error audit: each embedding quantizes
    with a per-vector scale s = ceil(max|v|/127) (symmetric int8, the
    vector-store memory play: 4x smaller than float32), and the audit
    reports per-label mean squared reconstruction error in squared
    micro units — the acceptance test before switching `ann_cosine_topk`
    to a quantized index: labels whose MSE is an outlier are the ones
    whose recall will crater. All arithmetic integer-exact: micro
    quantization first, magnitude/sign split so truncating division
    never sees a negative operand (Spark div truncates toward zero,
    DuckDB // floors — they only agree on non-negatives).

    Scale shape: posexplode -> per-vector max via groupBy -> rejoin on
    vec_id (both sides already reduced/keyed) -> per-label aggregate;
    one corpus-scan pass."""
    q = _read(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("pos", "v"),
    ).select(
        "vec_id",
        "label",
        "pos",
        F.expr("cast(floor(1000000.0 * cast(v as double)) as bigint)").alias("vm"),
    )
    scale = q.groupBy("vec_id").agg(
        F.expr("(max(abs(vm)) + 126) div 127").cast("bigint").alias("s")
    )
    err = q.join(scale, "vec_id").select(
        "label",
        F.expr(
            "(vm - (case when vm >= 0 then (abs(vm) div greatest(1L, s))"
            " else -(abs(vm) div greatest(1L, s)) end) * greatest(1L, s))"
        ).alias("e"),
    )
    return (
        err.groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_dims"),
            F.expr("sum(e * e) div count(*)").cast("bigint").alias("mse_micro2"),
            F.max(F.expr("abs(e)")).cast("bigint").alias("max_abs_err_micro"),
        )
        .orderBy("label")
    )


SQL_INT8_QUANT_ERROR = """
WITH q AS (
  SELECT vec_id, label, pos,
         floor(1000000.0 * embedding[pos + 1]::DOUBLE)::BIGINT AS vm
  FROM (SELECT vec_id, label, embedding,
               unnest(range(0, len(embedding))) AS pos
        FROM embeddings)
), scale AS (
  SELECT vec_id, ((max(abs(vm)) + 126) // 127)::BIGINT AS s
  FROM q GROUP BY vec_id
), err AS (
  SELECT label,
         (vm - (CASE WHEN vm >= 0 THEN (abs(vm) // greatest(1, s))
                     ELSE -(abs(vm) // greatest(1, s)) END)
               * greatest(1, s)) AS e
  FROM q JOIN scale USING (vec_id)
)
SELECT label, count(*)::BIGINT AS n_dims,
       (sum(e * e) // count(*))::BIGINT AS mse_micro2,
       max(abs(e))::BIGINT AS max_abs_err_micro
FROM err GROUP BY label ORDER BY label
"""

# -- train/test split leakage audit ---------------------------------------------------------------------------------------


def q_split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test split leakage audit: assign the `stratified_split`
    hash split (md5 bucket of doc_id; bucket 9 = the 10% test slice), then count near-duplicate
    fingerprint clusters (40-char prefix) that STRADDLE the boundary —
    every straddling cluster is a test document whose twin sits in
    train, inflating eval scores without any benchmark contamination
    (`decontaminate` checks external benchmarks; this checks the split
    against itself — the reason dedup must run BEFORE splitting, not
    after). Reports cluster and document leak counts plus the leaked
    share of the test side, exact.

    Scale shape: ONE groupBy(fp) carrying per-side conditional counts
    (never a train x test join), 1-row totals; single-row output."""
    d = _read(spark, sf_dir, "documents").select(
        "doc_id",
        F.md5(F.substring("text", 1, 40)).alias("fp"),
        # the exact `stratified_split` bucket: its 'test' slice (b = 9)
        F.expr(
            "pmod(cast(conv(substring(md5(cast(doc_id as string)), 1, 8),"
            " 16, 10) as bigint), 10) = 9"
        ).alias("is_test"),
    )
    per = d.groupBy("fp").agg(
        F.sum(F.expr("cast(not is_test as bigint)")).cast("bigint").alias("tr"),
        F.sum(F.expr("cast(is_test as bigint)")).cast("bigint").alias("te"),
    )
    return per.agg(
        F.sum(F.expr("tr + te")).cast("bigint").alias("n_docs"),
        F.sum("te").cast("bigint").alias("n_test"),
        F.sum(F.expr("cast(tr > 0 and te > 0 as bigint)"))
        .cast("bigint")
        .alias("leak_clusters"),
        F.sum(F.expr("case when tr > 0 then te else 0L end"))
        .cast("bigint")
        .alias("leaked_test_docs"),
        F.expr(
            "1000 * sum(case when tr > 0 then te else 0L end) div sum(te)"
        )
        .cast("bigint")
        .alias("test_leak_milli"),
    )


SQL_SPLIT_LEAKAGE_AUDIT = """
WITH marked AS (
  SELECT md5(substr(text, 1, 40)) AS fp,
         ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 10 = 9 AS is_test
  FROM documents
), per AS (
  SELECT fp,
         sum(CASE WHEN NOT is_test THEN 1 ELSE 0 END)::BIGINT AS tr,
         sum(CASE WHEN is_test THEN 1 ELSE 0 END)::BIGINT AS te
  FROM marked GROUP BY fp
)
SELECT sum(tr + te)::BIGINT AS n_docs, sum(te)::BIGINT AS n_test,
       sum(CASE WHEN tr > 0 AND te > 0 THEN 1 ELSE 0 END)::BIGINT
         AS leak_clusters,
       sum(CASE WHEN tr > 0 THEN te ELSE 0 END)::BIGINT AS leaked_test_docs,
       (1000 * sum(CASE WHEN tr > 0 THEN te ELSE 0 END) // sum(te))::BIGINT
         AS test_leak_milli
FROM per
"""


# -- recrawl value ranking ----------------------------------------------------------------------------------------------------


def q_recrawl_value_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recrawl value ranking: expected fresh content per fetch, per host
    — the change ratio (the `cho_change_rate` count pair, kept as an
    exact milli ratio here) times the host's mean payload (mean
    value_milli as the byte proxy), ranked descending. The scheduler's
    actual objective is neither 'most changed' nor 'biggest pages' but
    their product: a static host with huge pages and a churning host
    with tiny pages can both lose to a medium host on both axes.
    Integer-exact; rank ties to host id.

    Scale shape: 1-row mean broadcast, ONE groupBy(host), rank window
    on the bounded host frame; |hosts| rows."""
    ev = _read(spark, sf_dir, "events").select(
        F.col("user_id").alias("host"),
        F.expr("cast(floor(value * 1000) as bigint)").alias("v_milli"),
    )
    mean = ev.agg(F.expr("sum(v_milli) div count(*)").cast("bigint").alias("mu"))
    per = (
        ev.crossJoin(F.broadcast(mean))
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.expr("cast(v_milli >= mu as bigint)"))
            .cast("bigint")
            .alias("changed"),
            F.expr("sum(v_milli) div count(*)").cast("bigint").alias("mean_payload"),
        )
    )
    scored = per.select(
        "host",
        "n",
        F.expr("1000 * changed div n").cast("bigint").alias("change_milli"),
        "mean_payload",
        F.expr("(1000 * changed div n) * mean_payload div 1000")
        .cast("bigint")
        .alias("value_per_fetch"),
    )
    return scored.withColumn(
        "rank",
        F.row_number()
        .over(Window.orderBy(F.col("value_per_fetch").desc(), "host"))
        .cast("bigint"),
    ).orderBy("host")


SQL_RECRAWL_VALUE_RANK = """
WITH ev AS (
  SELECT user_id AS host, floor(value * 1000)::BIGINT AS v_milli FROM events
), mean AS (
  SELECT (sum(v_milli) // count(*))::BIGINT AS mu FROM ev
), per AS (
  SELECT host, count(*)::BIGINT AS n,
         sum(CASE WHEN v_milli >= mu THEN 1 ELSE 0 END)::BIGINT AS changed,
         (sum(v_milli) // count(*))::BIGINT AS mean_payload
  FROM ev CROSS JOIN mean GROUP BY host
), scored AS (
  SELECT host, n, (1000 * changed // n)::BIGINT AS change_milli, mean_payload,
         ((1000 * changed // n) * mean_payload // 1000)::BIGINT
           AS value_per_fetch
  FROM per
)
SELECT host, n, change_milli, mean_payload, value_per_fetch,
       row_number() OVER (ORDER BY value_per_fetch DESC, host)::BIGINT AS rank
FROM scored ORDER BY host
"""


# -- duplication by quality decile --------------------------------------------------------------------------------------------


def q_dup_by_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplication rate by quality decile: docs bucket into 10
    equal-rank bins by the stopword-confidence score, and each bin
    reports what share of its documents belong to a multi-document
    fingerprint cluster (40-char prefix) — the standard finding that
    boilerplate/templated (low-quality) text is ALSO the most
    duplicated, which means dedup and quality filtering double-count
    each other's wins unless measured jointly, exactly what this table
    does. Integer-exact.

    Scale shape: score map + ntile window, ONE groupBy(fp) for cluster
    sizes broadcast-joined back by fingerprint, ONE groupBy(bin);
    10 output rows."""
    d = _tokens(_read(spark, sf_dir, "documents")).select(
        "doc_id",
        F.md5(F.substring("text", 1, 40)).alias("fp"),
        F.expr(
            f"least(1000L, 6000 * size(filter(toks,"
            f" t -> array_contains({_SPARK_STOPLIST}, t))) div"
            " greatest(1, size(toks)))"
        ).cast("bigint").alias("q"),
    )
    binned = d.withColumn(
        "bin", F.ntile(10).over(Window.orderBy("q", "doc_id")).cast("bigint")
    )
    sizes = d.groupBy("fp").agg(F.count(F.lit(1)).cast("bigint").alias("csz"))
    return (
        binned.join(sizes, "fp")
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.expr("cast(csz >= 2 as bigint)"))
            .cast("bigint")
            .alias("dup_docs"),
            F.expr("1000 * sum(cast(csz >= 2 as bigint)) div count(*)")
            .cast("bigint")
            .alias("dup_share_milli"),
            F.expr("sum(q) div count(*)").cast("bigint").alias("mean_q_milli"),
        )
        .orderBy("bin")
    )


SQL_DUP_BY_QUALITY = f"""
WITH d AS (
  SELECT doc_id, md5(substr(text, 1, 40)) AS fp,
         least(1000, 6000 * len(list_filter({_SQL_TOKS},
               t -> list_contains({_SQL_STOPLIST}, t)))
               // greatest(1, len({_SQL_TOKS})))::BIGINT AS q
  FROM documents
), binned AS (
  SELECT *, ntile(10) OVER (ORDER BY q, doc_id)::BIGINT AS bin FROM d
), sizes AS (
  SELECT fp, count(*)::BIGINT AS csz FROM d GROUP BY fp
)
SELECT bin, count(*)::BIGINT AS n_docs,
       sum(CASE WHEN csz >= 2 THEN 1 ELSE 0 END)::BIGINT AS dup_docs,
       (1000 * sum(CASE WHEN csz >= 2 THEN 1 ELSE 0 END) // count(*))::BIGINT
         AS dup_share_milli,
       (sum(q) // count(*))::BIGINT AS mean_q_milli
FROM binned JOIN sizes USING (fp)
GROUP BY bin ORDER BY bin
"""

# -- vocabulary coverage curve --------------------------------------------------------------------------------------------


def q_vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve: share of the corpus's token mass
    covered by the top-k most frequent terms, k in {1024, 4096, 16384}
    — the tokenizer-budget planning table (how big a word-level vocab
    must be before <unk> mass is tolerable), and the corpus-level
    complement of `heaps_law` (type growth) and `zipf_rank_deviation`
    (head shape). OOV mass in milli per k, exact integers.

    Scale shape: ONE groupBy(term) to the vocab frame, one rank window
    on it, cumulative coverage re-aggregated per grid row via
    conditional sums (no per-k rescan of the corpus); 3 output rows."""
    vocab = (
        _tokens(_read(spark, sf_dir, "documents"))
        .select(F.explode("toks").alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("f"))
    )
    ranked = vocab.withColumn(
        "r",
        F.row_number().over(Window.orderBy(F.col("f").desc(), "term")).cast("bigint"),
    ).localCheckpoint()
    grid = spark.createDataFrame([(1024,), (4096,), (16384,)], "k bigint")
    return (
        ranked.crossJoin(F.broadcast(grid))
        .groupBy("k")
        .agg(
            F.sum("f").cast("bigint").alias("total_tokens"),
            F.count(F.lit(1)).cast("bigint").alias("vocab_size"),
            F.sum(F.expr("case when r <= k then f else 0L end"))
            .cast("bigint")
            .alias("covered_tokens"),
        )
        .select(
            "k",
            "vocab_size",
            "total_tokens",
            "covered_tokens",
            F.expr("1000 * covered_tokens div total_tokens")
            .cast("bigint")
            .alias("coverage_milli"),
            F.expr("1000 - 1000 * covered_tokens div total_tokens")
            .cast("bigint")
            .alias("oov_milli"),
        )
        .orderBy("k")
    )


SQL_VOCAB_COVERAGE_CURVE = f"""
WITH vocab AS (
  SELECT tok.term, count(*)::BIGINT AS f
  FROM documents, unnest({_SQL_TOKS}) AS tok(term)
  GROUP BY tok.term
), ranked AS (
  SELECT term, f, row_number() OVER (ORDER BY f DESC, term)::BIGINT AS r
  FROM vocab
), grid AS (
  SELECT unnest([1024::BIGINT, 4096::BIGINT, 16384::BIGINT]) AS k
)
SELECT k, count(*)::BIGINT AS vocab_size, sum(f)::BIGINT AS total_tokens,
       sum(CASE WHEN r <= k THEN f ELSE 0 END)::BIGINT AS covered_tokens,
       (1000 * sum(CASE WHEN r <= k THEN f ELSE 0 END) // sum(f))::BIGINT
         AS coverage_milli,
       (1000 - 1000 * sum(CASE WHEN r <= k THEN f ELSE 0 END) // sum(f)
       )::BIGINT AS oov_milli
FROM ranked CROSS JOIN grid
GROUP BY k ORDER BY k
"""


# -- collocation phrase mining ---------------------------------------------------------------------------------------------


def q_phrase_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation phrase mining (the word2vec phrase pass, Mikolov et
    al. 2013 eq. 6): for adjacent token bigrams with count >= 5, the
    score (c12 - delta) * N / (c1 * c2) with discount delta = 5, kept
    when above threshold 10 — the pass that decides 'new york' should
    enter the vocabulary as one unit before embeddings are trained.
    Score in exact milli (the formula is a pure integer rational);
    top-20 by score then bigram.

    Scale shape: one per-doc transform to adjacent pairs (map-side,
    no window — pairs come from the token array itself), ONE
    groupBy(bigram), unigram counts broadcast back twice, top-k via
    TakeOrderedAndProject."""
    toks = _tokens(_read(spark, sf_dir, "documents"))
    uni = (
        toks.select(F.explode("toks").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    n_tok = uni.agg(F.sum("c").cast("bigint").alias("n"))
    bi = (
        toks.select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(toks) - 1),"
                    " i -> struct(element_at(toks, i) as w1,"
                    " element_at(toks, i + 1) as w2))"
                )
            ).alias("p")
        )
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c12"))
        .where(F.col("c12") >= 5)
    )
    u1 = uni.select(F.col("w").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("c").alias("c2"))
    scored = (
        bi.join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .crossJoin(F.broadcast(n_tok))
        .select(
            "w1",
            "w2",
            "c12",
            F.expr("1000 * (c12 - 5) * n div (c1 * c2)")
            .cast("bigint")
            .alias("score_milli"),
        )
        .where(F.col("score_milli") > 1000)
    )
    return scored.orderBy(
        F.col("score_milli").desc(), "w1", "w2"
    ).limit(20)


SQL_PHRASE_MINING = f"""
WITH toks AS (
  SELECT doc_id, {_SQL_TOKS} AS toks FROM documents
), uni AS (
  SELECT t.w, count(*)::BIGINT AS c
  FROM toks, unnest(toks.toks) AS t(w) GROUP BY t.w
), n_tok AS (
  SELECT sum(c)::BIGINT AS n FROM uni
), bi AS (
  SELECT p.w1, p.w2, count(*)::BIGINT AS c12
  FROM toks, unnest(list_transform(range(len(toks) - 1),
       i -> {{'w1': toks[i+1], 'w2': toks[i+2]}})) AS u(p)
  GROUP BY 1, 2 HAVING count(*) >= 5
)
SELECT w1, w2, c12,
       (1000 * (c12 - 5) * n // (u1.c * u2.c))::BIGINT AS score_milli
FROM bi JOIN uni u1 ON bi.w1 = u1.w JOIN uni u2 ON bi.w2 = u2.w
        CROSS JOIN n_tok
WHERE (1000 * (c12 - 5) * n // (u1.c * u2.c)) > 1000
ORDER BY score_milli DESC, w1, w2 LIMIT 20
"""


# -- hot/warm/cold storage tiering ---------------------------------------------------------------------------------------------


def q_storage_tiering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot/warm/cold storage-tier plan: hosts ranked by access count —
    top decile is hot, next three warm, the rest cold — with each
    tier's share of accesses and of stored payload (summed value_milli
    as the byte proxy). The capacity-planning split behind tiered page
    caches: the hot tier should hold most accesses in a fraction of
    bytes, and the skew between the two shares IS the cache's win.
    Exact integers, ntile on the bounded host frame.

    Scale shape: ONE groupBy(host), decile window + 3-row rollup on
    that bounded frame; 3 output rows."""
    per = (
        _read(spark, sf_dir, "events")
        .groupBy(F.col("user_id").alias("host"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("acc"),
            F.sum(F.expr("cast(floor(value * 1000) as bigint)"))
            .cast("bigint")
            .alias("bytes_proxy"),
        )
    )
    tiered = per.withColumn(
        "dec",
        F.ntile(10).over(Window.orderBy(F.col("acc").desc(), "host")).cast("bigint"),
    ).select(
        F.expr(
            "case when dec = 1 then 'hot' when dec <= 4 then 'warm'"
            " else 'cold' end"
        ).alias("tier"),
        "acc",
        "bytes_proxy",
    )
    tot = tiered.agg(
        F.sum("acc").cast("bigint").alias("ta"),
        F.sum("bytes_proxy").cast("bigint").alias("tb"),
    )
    return (
        tiered.groupBy("tier")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_hosts"),
            F.sum("acc").cast("bigint").alias("accesses"),
            F.sum("bytes_proxy").cast("bigint").alias("bytes_proxy"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "tier",
            "n_hosts",
            "accesses",
            F.expr("1000 * accesses div ta").cast("bigint").alias("access_milli"),
            F.expr("1000 * bytes_proxy div tb").cast("bigint").alias("bytes_milli"),
        )
        .orderBy("tier")
    )


SQL_STORAGE_TIERING = """
WITH per AS (
  SELECT user_id AS host, count(*)::BIGINT AS acc,
         sum(floor(value * 1000)::BIGINT)::BIGINT AS bytes_proxy
  FROM events GROUP BY user_id
), tiered AS (
  SELECT CASE WHEN dec = 1 THEN 'hot' WHEN dec <= 4 THEN 'warm'
              ELSE 'cold' END AS tier,
         acc, bytes_proxy
  FROM (SELECT *, ntile(10) OVER (ORDER BY acc DESC, host)::BIGINT AS dec
        FROM per)
), tot AS (
  SELECT sum(acc)::BIGINT AS ta, sum(bytes_proxy)::BIGINT AS tb FROM tiered
)
SELECT tier, count(*)::BIGINT AS n_hosts, sum(acc)::BIGINT AS accesses,
       (1000 * sum(acc) // ta)::BIGINT AS access_milli,
       (1000 * sum(bytes_proxy) // tb)::BIGINT AS bytes_milli
FROM tiered CROSS JOIN tot
GROUP BY tier, ta, tb ORDER BY tier
"""

# -- near-dup graph transitivity audit --------------------------------------------------------------------------------------


def q_dupgraph_transitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitivity audit of the near-dup candidate graph: with the
    `ngram_jaccard_pairs` output as edges, the global clustering
    coefficient 3*triangles/wedges — the number that says whether
    'near-duplicate-of' behaves like an equivalence relation on THIS
    corpus. Connected-components dedup (`dedup_components`) silently
    assumes it does: at transitivity near 1000 milli union-find merges
    are safe; low transitivity means chains of pairwise-similar docs
    whose endpoints are NOT similar, and components will over-merge.
    Exact: wedges from C(deg,2) arithmetic, triangles from the
    canonical a<b<c three-edge join (each counted once).

    Scale shape: the dup-pair frame is tiny relative to the corpus;
    degree groupBy + one wedge aggregate + a two-join triangle closure
    on that frame only."""
    e = (
        ngram_jaccard(_docs_parallel(spark, sf_dir))
        .select("a_id", "b_id")
        .localCheckpoint()
    )
    deg = (
        e.select(F.col("a_id").alias("n"))
        .union(e.select(F.col("b_id").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    )
    wedges = deg.agg(
        F.sum(F.expr("d * (d - 1) div 2")).cast("bigint").alias("w"),
        F.count(F.lit(1)).cast("bigint").alias("nodes"),
    )
    e2 = e.select(F.col("a_id").alias("b_id"), F.col("b_id").alias("c_id"))
    e3 = e.select(F.col("a_id").alias("t_a"), F.col("b_id").alias("t_c"))
    tri = (
        e.join(e2, "b_id")
        .join(
            e3,
            (F.col("a_id") == F.col("t_a")) & (F.col("c_id") == F.col("t_c")),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("t"))
    )
    return (
        e.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
        .crossJoin(F.broadcast(wedges))
        .crossJoin(F.broadcast(tri))
        .select(
            "n_edges",
            "nodes",
            F.col("w").alias("n_wedges"),
            F.col("t").alias("n_triangles"),
            F.expr(
                "case when w > 0 then 1000 * 3 * t div w else 1000L end"
            )
            .cast("bigint")
            .alias("transitivity_milli"),
        )
    )


SQL_DUPGRAPH_TRANSITIVITY = f"""
WITH toks AS (
  SELECT doc_id, {_SQL_TOKS} AS toks FROM documents
), sh AS (
  SELECT DISTINCT doc_id, unnest(list_transform(range(len(toks) - 2),
    i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])) AS shingle
  FROM toks WHERE len(toks) >= 3
), counts AS (
  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS i
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), e AS (
  SELECT a_id, b_id
  FROM inter JOIN counts ca ON a_id = ca.doc_id JOIN counts cb ON b_id = cb.doc_id
  WHERE round(i / (ca.n + cb.n - i), 4) >= 0.5
), deg AS (
  SELECT n, count(*)::BIGINT AS d
  FROM (SELECT a_id AS n FROM e UNION ALL SELECT b_id FROM e) GROUP BY n
), wedges AS (
  SELECT sum(d * (d - 1) // 2)::BIGINT AS w, count(*)::BIGINT AS nodes FROM deg
), tri AS (
  SELECT count(*)::BIGINT AS t
  FROM e e1 JOIN e e2 ON e1.b_id = e2.a_id
            JOIN e e3 ON e3.a_id = e1.a_id AND e3.b_id = e2.b_id
)
SELECT (SELECT count(*)::BIGINT FROM e) AS n_edges, nodes,
       w AS n_wedges, t AS n_triangles,
       (CASE WHEN w > 0 THEN 1000 * 3 * t // w ELSE 1000 END)::BIGINT
         AS transitivity_milli
FROM wedges CROSS JOIN tri
"""


# -- sitemap coverage audit -----------------------------------------------------------------------------------------------------


def q_sitemap_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemap coverage audit: per host, how much of the host's declared
    sitemap (the `sitemap_extract` URL family; two thirds of URLs are
    listed) the crawl actually fetched (deterministic 90% fetch coin),
    and how much of what was fetched is sitemap-orphaned — the two
    numbers webmaster tooling calls coverage and discovery: low recall
    means the scheduler starves declared content, high orphan share
    means the site's own index is stale and link-following is doing the
    real discovery. Exact conditional counts, no joins.

    Scale shape: both memberships are per-row flags, so the whole audit
    is ONE groupBy(host) of conditional sums; |hosts| rows."""
    d = _read(spark, sf_dir, "documents").select(
        F.concat(F.lit("h"), (F.col("doc_id") % 10).cast("string")).alias("host"),
        (F.col("doc_id") % 3 != 0).alias("in_sitemap"),
        F.expr(
            "pmod(cast(conv(substring(md5(cast(doc_id as string)), 1, 8),"
            " 16, 10) as bigint), 10) <> 0"
        ).alias("crawled"),
    )
    return (
        d.groupBy("host")
        .agg(
            F.sum(F.expr("cast(in_sitemap as bigint)"))
            .cast("bigint")
            .alias("sitemap_urls"),
            F.sum(F.expr("cast(crawled as bigint)")).cast("bigint").alias("crawled_urls"),
            F.sum(F.expr("cast(in_sitemap and crawled as bigint)"))
            .cast("bigint")
            .alias("covered"),
            F.sum(F.expr("cast(crawled and not in_sitemap as bigint)"))
            .cast("bigint")
            .alias("orphans"),
        )
        .select(
            "host",
            "sitemap_urls",
            "crawled_urls",
            F.expr("1000 * covered div sitemap_urls")
            .cast("bigint")
            .alias("recall_milli"),
            F.expr("1000 * orphans div crawled_urls")
            .cast("bigint")
            .alias("orphan_milli"),
        )
        .orderBy("host")
    )


SQL_SITEMAP_COVERAGE = """
WITH d AS (
  SELECT 'h' || (doc_id % 10)::VARCHAR AS host,
         doc_id % 3 <> 0 AS in_sitemap,
         ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 10 <> 0
           AS crawled
  FROM documents
)
SELECT host,
       sum(CASE WHEN in_sitemap THEN 1 ELSE 0 END)::BIGINT AS sitemap_urls,
       sum(CASE WHEN crawled THEN 1 ELSE 0 END)::BIGINT AS crawled_urls,
       (1000 * sum(CASE WHEN in_sitemap AND crawled THEN 1 ELSE 0 END)
        // sum(CASE WHEN in_sitemap THEN 1 ELSE 0 END))::BIGINT AS recall_milli,
       (1000 * sum(CASE WHEN crawled AND NOT in_sitemap THEN 1 ELSE 0 END)
        // sum(CASE WHEN crawled THEN 1 ELSE 0 END))::BIGINT AS orphan_milli
FROM d GROUP BY host ORDER BY host
"""


# -- Doulion sampled triangle estimation -------------------------------------------------------------------------------------------


def q_doulion_triangle_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doulion triangle estimation (Tsourakakis et al. KDD'09): sparsify
    the host graph by keeping each edge with a deterministic md5 coin
    at p = 1/4, count triangles on the sparsified graph, scale by
    1/p^3 = 64 — versus the exact count on the full graph. At web scale
    the exact count is a shuffle monster (`triangle_count`'s
    degree-oriented join over every edge); Doulion runs the same plan
    on ~1/16 of the wedge volume, and THIS query measures what that
    buys and what it costs in error, on real data. Canonical a<b<c
    three-edge closure on both graphs; exact integers plus one milli
    error ratio.

    Scale shape: the coin is map-side (edges never shuffle to be
    sampled); both triangle counts are the canonical two-join closure;
    output is one row."""
    und = (
        _pagerank_edges(spark, sf_dir)
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
        .localCheckpoint()
    )

    def tri_count(edges, label):
        e2 = edges.select(F.col("a").alias("b"), F.col("b").alias("c"))
        e3 = edges.select(F.col("a").alias("t_a"), F.col("b").alias("t_c"))
        return (
            edges.join(e2, "b")
            .join(
                e3,
                (F.col("a") == F.col("t_a")) & (F.col("c") == F.col("t_c")),
            )
            .agg(F.count(F.lit(1)).cast("bigint").alias(label))
        )

    exact = tri_count(und, "t_exact")
    samp = und.where(
        F.expr(
            "cast(conv(substring(md5(concat('E:', cast(a as string), ':',"
            " cast(b as string))), 1, 8), 16, 10) as bigint) % 4 = 0"
        )
    )
    est = tri_count(samp, "t_samp")
    return (
        und.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
        .crossJoin(F.broadcast(exact))
        .crossJoin(F.broadcast(est))
        .select(
            "n_edges",
            "t_exact",
            "t_samp",
            F.expr("t_samp * 64").cast("bigint").alias("estimate"),
            F.expr(
                "case when t_exact > 0 then"
                " 1000 * abs(t_samp * 64 - t_exact) div t_exact else -1L end"
            )
            .cast("bigint")
            .alias("rel_err_milli"),
        )
    )


SQL_DOULION_TRIANGLE_ESTIMATE = f"""
WITH e0 AS (
  SELECT DISTINCT user_id % {_PR_NODES} AS src,
         (('0x' || substr(md5(event_id::VARCHAR), 1, 4))::BIGINT) % {_PR_NODES} AS dst
  FROM events
  WHERE user_id % {_PR_NODES}
        <> (('0x' || substr(md5(event_id::VARCHAR), 1, 4))::BIGINT) % {_PR_NODES}
), und AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM e0
), samp AS (
  SELECT a, b FROM und
  WHERE (('0x' || substr(md5('E:' || a::VARCHAR || ':' || b::VARCHAR), 1, 8)
         )::BIGINT) % 4 = 0
), t_exact AS (
  SELECT count(*)::BIGINT AS t_exact
  FROM und e1 JOIN und e2 ON e1.b = e2.a
              JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
), t_samp AS (
  SELECT count(*)::BIGINT AS t_samp
  FROM samp e1 JOIN samp e2 ON e1.b = e2.a
               JOIN samp e3 ON e3.a = e1.a AND e3.b = e2.b
)
SELECT (SELECT count(*)::BIGINT FROM und) AS n_edges, t_exact, t_samp,
       (t_samp * 64)::BIGINT AS estimate,
       (CASE WHEN t_exact > 0
             THEN 1000 * abs(t_samp * 64 - t_exact) // t_exact
             ELSE -1 END)::BIGINT AS rel_err_milli
FROM t_exact CROSS JOIN t_samp
"""


REGISTRY: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {
    # frontier / scheduling (SURVEY §2.5)
    "frontier_topk": (q_frontier_topk, SQL_FRONTIER_TOPK),
    "breadth_fifo": (q_breadth_fifo, SQL_BREADTH_FIFO),
    "politeness_window": (q_politeness_window, SQL_POLITENESS_WINDOW),
    "recrawl_priority": (q_recrawl_priority, SQL_RECRAWL_PRIORITY),
    "skew_salt_plan": (q_skew_salt_plan, SQL_SKEW_SALT_PLAN),
    "politeness_compliance": (q_politeness_compliance, SQL_POLITENESS_COMPLIANCE),
    "unseen_mass_gt": (q_unseen_mass_gt, SQL_UNSEEN_MASS_GT),
    "term_burstiness": (q_term_burstiness, SQL_TERM_BURSTINESS),
    "warc_revisit": (q_warc_revisit, SQL_WARC_REVISIT),
    "first_seen_ids": (q_first_seen_ids, SQL_FIRST_SEEN_IDS),
    # dedup / membership (§2.4 + training-data surface)
    "seen_antijoin": (q_seen_antijoin, SQL_SEEN_ANTIJOIN),
    "allowlist_semijoin": (q_allowlist_semijoin, SQL_ALLOWLIST_SEMIJOIN),
    "dedup_exact": (q_dedup_exact, SQL_DEDUP_EXACT),
    "doc_fingerprint": (q_doc_fingerprint, SQL_DOC_FINGERPRINT),
    "ngram_jaccard_pairs": (q_ngram_jaccard_pairs, SQL_NGRAM_JACCARD_PAIRS),
    "ngram_jaccard_capped": (q_ngram_jaccard_capped, SQL_NGRAM_JACCARD_CAPPED),
    "lsh_eval": (q_lsh_eval, SQL_LSH_EVAL),
    "dedup_components": (q_dedup_components, SQL_DEDUP_COMPONENTS),
    "cc_star": (q_cc_star, SQL_CC_STAR),
    "exact_substring_dup": (q_exact_substring_dup, SQL_EXACT_SUBSTRING_DUP),
    "shingle_containment": (q_shingle_containment, SQL_SHINGLE_CONTAINMENT),
    "dedup_keep_best": (q_dedup_keep_best, SQL_DEDUP_KEEP_BEST),
    "paragraph_dedup": (q_paragraph_dedup, SQL_PARAGRAPH_DEDUP),
    "dsir_weights": (q_dsir_weights, SQL_DSIR_WEIGHTS),
    "salted_topk_terms": (q_salted_topk_terms, SQL_SALTED_TOPK_TERMS),
    "url_canonical_dedup": (q_url_canonical_dedup, SQL_URL_CANONICAL_DEDUP),
    "robots_admission": (q_robots_admission, SQL_ROBOTS_ADMISSION),
    "pipeline_keep_set": (q_pipeline_keep_set, SQL_PIPELINE_KEEP_SET),
    "minhash_lsh_candidates": (q_minhash_lsh_candidates, SQL_MINHASH_LSH_CANDIDATES),
    "simhash": (q_simhash, SQL_SIMHASH),
    # scoring / aggregation / graph (§2.6-2.7)
    "score_propagation": (q_score_propagation, SQL_SCORE_PROPAGATION),
    "graph_modularity": (q_graph_modularity, SQL_GRAPH_MODULARITY),
    "kmv_distinct": (q_kmv_distinct, SQL_KMV_DISTINCT),
    "hyperanf_neighborhood": (q_hyperanf_neighborhood, SQL_HYPERANF_NEIGHBORHOOD),
    "effective_diameter": (q_effective_diameter, SQL_EFFECTIVE_DIAMETER),
    "ktruss_peel": (q_ktruss_peel, SQL_KTRUSS_PEEL),
    "edge_reciprocity": (q_edge_reciprocity, SQL_EDGE_RECIPROCITY),
    "rendezvous_sharding": (q_rendezvous_sharding, SQL_RENDEZVOUS_SHARDING),
    "weighted_minhash": (q_weighted_minhash, SQL_WEIGHTED_MINHASH),
    "cocitation_selfjoin": (q_cocitation_selfjoin, SQL_COCITATION_SELFJOIN),
    "density_net": (q_density_net, SQL_DENSITY_NET),
    "deviation_central": (q_deviation_central, SQL_DEVIATION_CENTRAL),
    "feature_count_filter": (q_feature_count_filter, SQL_FEATURE_COUNT_FILTER),
    "wave_metrics": (q_wave_metrics, SQL_WAVE_METRICS),
    "hourly_rollup": (q_hourly_rollup, SQL_HOURLY_ROLLUP),
    "asof_join": (q_asof_join, SQL_ASOF_JOIN),
    "sessionize": (q_sessionize, SQL_SESSIONIZE),
    "pagerank": (q_pagerank, SQL_PAGERANK),
    "triangle_count": (q_triangle_count, SQL_TRIANGLE_COUNT),
    "hits_scores": (q_hits_scores, SQL_HITS_SCORES),
    "range_join_bins": (q_range_join_bins, SQL_RANGE_JOIN_BINS),
    "value_quantiles": (q_value_quantiles, SQL_VALUE_QUANTILES),
    "hash_embed": (q_hash_embed, SQL_HASH_EMBED),
    "rollup_stats": (q_rollup_stats, SQL_ROLLUP_STATS),
    "lang_pivot": (q_lang_pivot, SQL_LANG_PIVOT),
    "source_mix": (q_source_mix, SQL_SOURCE_MIX),
    "mix_temperature": (q_mix_temperature, SQL_MIX_TEMPERATURE),
    "warc_roundtrip": (q_warc_roundtrip, SQL_WARC_ROUNDTRIP),
    "sitemap_extract": (q_sitemap_extract, SQL_SITEMAP_EXTRACT),
    "crawl_delta": (q_crawl_delta, SQL_CRAWL_DELTA),
    "surt_cdx": (q_surt_cdx, SQL_SURT_CDX),
    "anchor_text_agg": (q_anchor_text_agg, SQL_ANCHOR_TEXT_AGG),
    "budget_allocation": (q_budget_allocation, SQL_BUDGET_ALLOCATION),
    "url_features": (q_url_features, SQL_URL_FEATURES),
    "link_farm_score": (q_link_farm_score, SQL_LINK_FARM_SCORE),
    "write_shard_plan": (q_write_shard_plan, SQL_WRITE_SHARD_PLAN),
    "domain_quality": (q_domain_quality, SQL_DOMAIN_QUALITY),
    "json_props_rollup": (q_json_props_rollup, SQL_JSON_PROPS_ROLLUP),
    "stratified_split": (q_stratified_split, SQL_STRATIFIED_SPLIT),
    # text analysis
    "token_stats": (q_token_stats, SQL_TOKEN_STATS),
    "tfidf_topk": (q_tfidf_topk, SQL_TFIDF_TOPK),
    "inverted_index": (q_inverted_index, SQL_INVERTED_INDEX),
    "bm25_topk": (q_bm25_topk, SQL_BM25_TOPK),
    "rrf_fusion": (q_rrf_fusion, SQL_RRF_FUSION),
    "ks_drift": (q_ks_drift, SQL_KS_DRIFT),
    "zipf_alpha": (q_zipf_alpha, SQL_ZIPF_ALPHA),
    "countmin_sketch": (q_countmin_sketch, SQL_COUNTMIN_SKETCH),
    "hll_registers": (q_hll_registers, SQL_HLL_REGISTERS),
    "unigram_lm_score": (q_unigram_lm_score, SQL_UNIGRAM_LM_SCORE),
    "perplexity_buckets": (q_perplexity_buckets, SQL_PERPLEXITY_BUCKETS),
    "bpe_token_count": (q_bpe_token_count, SQL_BPE_TOKEN_COUNT),
    "sequence_pack": (q_sequence_pack, SQL_SEQUENCE_PACK),
    "span_corrupt": (q_span_corrupt, SQL_SPAN_CORRUPT),
    "doc_chunk_overlap": (q_doc_chunk_overlap, SQL_DOC_CHUNK_OVERLAP),
    "quality_score": (q_quality_score, SQL_QUALITY_SCORE),
    "lang_id": (q_lang_id, SQL_LANG_ID),
    "pii_scrub": (q_pii_scrub, SQL_PII_SCRUB),
    "text_clean": (q_text_clean, SQL_TEXT_CLEAN),
    "repetition_filter": (q_repetition_filter, SQL_REPETITION_FILTER),
    "decontaminate": (q_decontaminate, SQL_DECONTAMINATE),
    # similarity search
    "ann_cosine_topk": (q_ann_cosine_topk, SQL_ANN_COSINE_TOPK),
    "ann_hamming": (q_ann_hamming, SQL_ANN_HAMMING),
    "embedding_neardup": (q_embedding_neardup, SQL_EMBEDDING_NEARDUP),
    "semdedup_prune": (q_semdedup_prune, SQL_SEMDEDUP_PRUNE),
    "hard_negatives": (q_hard_negatives, SQL_HARD_NEGATIVES),
    "knn_graph": (q_knn_graph, SQL_KNN_GRAPH),
    "label_centroids": (q_label_centroids, SQL_LABEL_CENTROIDS),
    "nearest_centroid": (q_nearest_centroid, SQL_NEAREST_CENTROID),
    # relational coverage
    "tpch_q1": (q_tpch_q1, SQL_TPCH_Q1),
    "tpch_q3_topk": (q_tpch_q3_topk, SQL_TPCH_Q3_TOPK),
    "tpch_q5_region": (q_tpch_q5_region, SQL_TPCH_Q5_REGION),
    "tpch_q18_large_orders": (q_tpch_q18_large_orders, SQL_TPCH_Q18_LARGE_ORDERS),
    "tpch_q6_forecast": (q_tpch_q6_forecast, SQL_TPCH_Q6_FORECAST),
    "tpch_q7_volume": (q_tpch_q7_volume, SQL_TPCH_Q7_VOLUME),
    "tpch_q10_returns": (q_tpch_q10_returns, SQL_TPCH_Q10_RETURNS),
    "tpch_q13_order_dist": (q_tpch_q13_order_dist, SQL_TPCH_Q13_ORDER_DIST),
    "tpch_q14_promo": (q_tpch_q14_promo, SQL_TPCH_Q14_PROMO),
    "tpch_q15_top_supplier": (q_tpch_q15_top_supplier, SQL_TPCH_Q15_TOP_SUPPLIER),
    "tpch_q17_small_qty": (q_tpch_q17_small_qty, SQL_TPCH_Q17_SMALL_QTY),
    "tpch_q22_idle_custs": (q_tpch_q22_idle_custs, SQL_TPCH_Q22_IDLE_CUSTS),
    "tpch_q4_late_ship": (q_tpch_q4_late_ship, SQL_TPCH_Q4_LATE_SHIP),
    "tpch_q12_priority_class": (
        q_tpch_q12_priority_class,
        SQL_TPCH_Q12_PRIORITY_CLASS,
    ),
    "tpch_q16_supplier_cnt": (q_tpch_q16_supplier_cnt, SQL_TPCH_Q16_SUPPLIER_CNT),
    "tpch_q19_disjunctive": (q_tpch_q19_disjunctive, SQL_TPCH_Q19_DISJUNCTIVE),
    "tpch_q8_market_share": (q_tpch_q8_market_share, SQL_TPCH_Q8_MARKET_SHARE),
    "tpch_q9_profit": (q_tpch_q9_profit, SQL_TPCH_Q9_PROFIT),
    "tpch_q21_waiting_supplier": (
        q_tpch_q21_waiting_supplier,
        SQL_TPCH_Q21_WAITING_SUPPLIER,
    ),
    "tpch_q2_min_cost_supp": (q_tpch_q2_min_cost_supp, SQL_TPCH_Q2_MIN_COST_SUPP),
    "tpch_q11_important_stock": (
        q_tpch_q11_important_stock,
        SQL_TPCH_Q11_IMPORTANT_STOCK,
    ),
    "tpch_q20_potential_promo": (
        q_tpch_q20_potential_promo,
        SQL_TPCH_Q20_POTENTIAL_PROMO,
    ),
    "opic_importance": (q_opic_importance, SQL_OPIC_IMPORTANCE),
    "trust_rank": (q_trust_rank, SQL_TRUST_RANK),
    "registrable_domain": (q_registrable_domain, SQL_REGISTRABLE_DOMAIN),
    "url_param_rules": (q_url_param_rules, SQL_URL_PARAM_RULES),
    "mirror_hosts": (q_mirror_hosts, SQL_MIRROR_HOSTS),
    "label_propagation": (q_label_propagation, SQL_LABEL_PROPAGATION),
    "k_core": (q_k_core, SQL_K_CORE),
    "retrieval_eval": (q_retrieval_eval, SQL_RETRIEVAL_EVAL),
    "funnel_conversion": (q_funnel_conversion, SQL_FUNNEL_CONVERSION),
    "retention_cohorts": (q_retention_cohorts, SQL_RETENTION_COHORTS),
    "hac_reciprocal": (q_hac_reciprocal, SQL_HAC_RECIPROCAL),
    "facility_location": (q_facility_location, SQL_FACILITY_LOCATION),
    "rolling_stats": (q_rolling_stats, SQL_ROLLING_STATS),
    "pps_sample": (q_pps_sample, SQL_PPS_SAMPLE),
    "weighted_reservoir": (q_weighted_reservoir, SQL_WEIGHTED_RESERVOIR),
    "gopher_rules": (q_gopher_rules, SQL_GOPHER_RULES),
    "c4_clean": (q_c4_clean, SQL_C4_CLEAN),
    "simhash_hamming_pairs": (q_simhash_hamming_pairs, SQL_SIMHASH_HAMMING_PAIRS),
    "bpe_merges": (q_bpe_merges, SQL_BPE_MERGES),
    "bpe_apply": (q_bpe_apply, SQL_BPE_APPLY),
    "bigram_lm_score": (q_bigram_lm_score, SQL_BIGRAM_LM_SCORE),
    "kmeans_embed": (q_kmeans_embed, SQL_KMEANS_EMBED),
    "redirect_resolve": (q_redirect_resolve, SQL_REDIRECT_RESOLVE),
    "pack_bins": (q_pack_bins, SQL_PACK_BINS),
    "quality_classifier": (q_quality_classifier, SQL_QUALITY_CLASSIFIER),
    "pmi_collocations": (q_pmi_collocations, SQL_PMI_COLLOCATIONS),
    "mlm_mask": (q_mlm_mask, SQL_MLM_MASK),
    "host_fairness": (q_host_fairness, SQL_HOST_FAIRNESS),
    "boilerplate_lines": (q_boilerplate_lines, SQL_BOILERPLATE_LINES),
    "neardup_edit_verify": (q_neardup_edit_verify, SQL_NEARDUP_EDIT_VERIFY),
    "ngram_novelty": (q_ngram_novelty, SQL_NGRAM_NOVELTY),
    "bitext_mine": (q_bitext_mine, SQL_BITEXT_MINE),
    "vocab_drift": (q_vocab_drift, SQL_VOCAB_DRIFT),
    "scc_mutual": (q_scc_mutual, SQL_SCC_MUTUAL),
    "bloom_fpr": (q_bloom_fpr, SQL_BLOOM_FPR),
    "host_graph_collapse": (q_host_graph_collapse, SQL_HOST_GRAPH_COLLAPSE),
    "calibration_bins": (q_calibration_bins, SQL_CALIBRATION_BINS),
    "markov_transitions": (q_markov_transitions, SQL_MARKOV_TRANSITIONS),
    "adamic_adar": (q_adamic_adar, SQL_ADAMIC_ADAR),
    "cdc_chunks": (q_cdc_chunks, SQL_CDC_CHUNKS),
    "change_rate_estimate": (q_change_rate_estimate, SQL_CHANGE_RATE_ESTIMATE),
    "vocab_coverage": (q_vocab_coverage, SQL_VOCAB_COVERAGE),
    "sq8_quantize": (q_sq8_quantize, SQL_SQ8_QUANTIZE),
    "silhouette_score": (q_silhouette_score, SQL_SILHOUETTE_SCORE),
    "random_walks": (q_random_walks, SQL_RANDOM_WALKS),
    "mad_outliers": (q_mad_outliers, SQL_MAD_OUTLIERS),
    "pca_power": (q_pca_power, SQL_PCA_POWER),
    "degree_assortativity": (q_degree_assortativity, SQL_DEGREE_ASSORTATIVITY),
    "attack_robustness": (q_attack_robustness, SQL_ATTACK_ROBUSTNESS),
    "url_path_rollup": (q_url_path_rollup, SQL_URL_PATH_ROLLUP),
    "landmark_closeness": (q_landmark_closeness, SQL_LANDMARK_CLOSENESS),
    "crawl_trap_score": (q_crawl_trap_score, SQL_CRAWL_TRAP_SCORE),
    "frontier_branching": (q_frontier_branching, SQL_FRONTIER_BRANCHING),
    "bbit_minhash": (q_bbit_minhash, SQL_BBIT_MINHASH),
    "host_reputation_ewma": (q_host_reputation_ewma, SQL_HOST_REPUTATION_EWMA),
    "edge_triangle_support": (q_edge_triangle_support, SQL_EDGE_TRIANGLE_SUPPORT),
    "histogram_quantiles": (q_histogram_quantiles, SQL_HISTOGRAM_QUANTILES),
    "bowtie_structure": (q_bowtie_structure, SQL_BOWTIE_STRUCTURE),
    "hll_merge": (q_hll_merge, SQL_HLL_MERGE),
    "char_entropy": (q_char_entropy, SQL_CHAR_ENTROPY),
    "local_clustering": (q_local_clustering, SQL_LOCAL_CLUSTERING),
    "stupid_backoff_score": (q_stupid_backoff_score, SQL_STUPID_BACKOFF_SCORE),
    "bfs_levels": (q_bfs_levels, SQL_BFS_LEVELS),
    "quantile_normalize": (q_quantile_normalize, SQL_QUANTILE_NORMALIZE),
    "winnow_fingerprints": (q_winnow_fingerprints, SQL_WINNOW_FINGERPRINTS),
    "psi_drift": (q_psi_drift, SQL_PSI_DRIFT),
    "code_detect": (q_code_detect, SQL_CODE_DETECT),
    "salsa_scores": (q_salsa_scores, SQL_SALSA_SCORES),
    "ams_f2_sketch": (q_ams_f2_sketch, SQL_AMS_F2_SKETCH),
    "soft404_detect": (q_soft404_detect, SQL_SOFT404_DETECT),
    "zorder_keys": (q_zorder_keys, SQL_ZORDER_KEYS),
    "posting_delta_bytes": (q_posting_delta_bytes, SQL_POSTING_DELTA_BYTES),
    "roc_auc": (q_roc_auc, SQL_ROC_AUC),
    "community_conductance": (q_community_conductance, SQL_COMMUNITY_CONDUCTANCE),
    "jl_projection": (q_jl_projection, SQL_JL_PROJECTION),
    "langid_confusion": (q_langid_confusion, SQL_LANGID_CONFUSION),
    "bipartite_check": (q_bipartite_check, SQL_BIPARTITE_CHECK),
    "mrl_truncate_eval": (q_mrl_truncate_eval, SQL_MRL_TRUNCATE_EVAL),
    "tokenizer_fertility": (q_tokenizer_fertility, SQL_TOKENIZER_FERTILITY),
    "simpson_diversity": (q_simpson_diversity, SQL_SIMPSON_DIVERSITY),
    "kendall_tau": (q_kendall_tau, SQL_KENDALL_TAU),
    "stylometry_delta": (q_stylometry_delta, SQL_STYLOMETRY_DELTA),
    "hill_tail_index": (q_hill_tail_index, SQL_HILL_TAIL_INDEX),
    "dedup_cluster_stats": (q_dedup_cluster_stats, SQL_DEDUP_CLUSTER_STATS),
    "copeland_fusion": (q_copeland_fusion, SQL_COPELAND_FUSION),
    "kneser_ney_bigram": (q_kneser_ney_bigram, SQL_KNESER_NEY_BIGRAM),
    "vocab_growth_curve": (q_vocab_growth_curve, SQL_VOCAB_GROWTH_CURVE),
    "trimmed_mean_embed": (q_trimmed_mean_embed, SQL_TRIMMED_MEAN_EMBED),
    "haar_wavelet_energy": (q_haar_wavelet_energy, SQL_HAAR_WAVELET_ENERGY),
    "busy_intervals": (q_busy_intervals, SQL_BUSY_INTERVALS),
    "sequence_patterns": (q_sequence_patterns, SQL_SEQUENCE_PATTERNS),
    "hashring_rebalance": (q_hashring_rebalance, SQL_HASHRING_REBALANCE),
    "kmv_set_algebra": (q_kmv_set_algebra, SQL_KMV_SET_ALGEBRA),
    "lexical_cosine_pairs": (q_lexical_cosine_pairs, SQL_LEXICAL_COSINE_PAIRS),
    "mutual_information": (q_mutual_information, SQL_MUTUAL_INFORMATION),
    "pagerank_convergence": (q_pagerank_convergence, SQL_PAGERANK_CONVERGENCE),
    "k_anonymity_audit": (q_k_anonymity_audit, SQL_K_ANONYMITY_AUDIT),
    "blocking_eval": (q_blocking_eval, SQL_BLOCKING_EVAL),
    "kaplan_meier_survival": (q_kaplan_meier_survival, SQL_KAPLAN_MEIER_SURVIVAL),
    "gorilla_timestamp_bits": (q_gorilla_timestamp_bits, SQL_GORILLA_TIMESTAMP_BITS),
    "elias_fano_bits": (q_elias_fano_bits, SQL_ELIAS_FANO_BITS),
    "rank_biased_overlap": (q_rank_biased_overlap, SQL_RANK_BIASED_OVERLAP),
    "wasserstein_drift": (q_wasserstein_drift, SQL_WASSERSTEIN_DRIFT),
    "benford_deviation": (q_benford_deviation, SQL_BENFORD_DEVIATION),
    "for_block_bits": (q_for_block_bits, SQL_FOR_BLOCK_BITS),
    "wl_refinement": (q_wl_refinement, SQL_WL_REFINEMENT),
    "roaring_container_plan": (q_roaring_container_plan, SQL_ROARING_CONTAINER_PLAN),
    "odds_ratio_keyness": (q_odds_ratio_keyness, SQL_ODDS_RATIO_KEYNESS),
    "interarrival_burstiness": (
        q_interarrival_burstiness,
        SQL_INTERARRIVAL_BURSTINESS,
    ),
    "capture_recapture": (q_capture_recapture, SQL_CAPTURE_RECAPTURE),
    "chao1_richness": (q_chao1_richness, SQL_CHAO1_RICHNESS),
    "readability_grade": (q_readability_grade, SQL_READABILITY_GRADE),
    "brier_decomposition": (q_brier_decomposition, SQL_BRIER_DECOMPOSITION),
    "wilson_lower_bound": (q_wilson_lower_bound, SQL_WILSON_LOWER_BOUND),
    "amoc_changepoint": (q_amoc_changepoint, SQL_AMOC_CHANGEPOINT),
    "skyline_pareto": (q_skyline_pareto, SQL_SKYLINE_PARETO),
    "katz_centrality": (q_katz_centrality, SQL_KATZ_CENTRALITY),
    "front_coding_bytes": (q_front_coding_bytes, SQL_FRONT_CODING_BYTES),
    "theil_sen_trend": (q_theil_sen_trend, SQL_THEIL_SEN_TREND),
    "acf_lags": (q_acf_lags, SQL_ACF_LAGS),
    "ordinal_patterns": (q_ordinal_patterns, SQL_ORDINAL_PATTERNS),
    "mmr_diversify": (q_mmr_diversify, SQL_MMR_DIVERSIFY),
    "chisq_independence": (q_chisq_independence, SQL_CHISQ_INDEPENDENCE),
    "assoc_rules_lift": (q_assoc_rules_lift, SQL_ASSOC_RULES_LIFT),
    "sort_rle_benefit": (q_sort_rle_benefit, SQL_SORT_RLE_BENEFIT),
    "join_card_estimate": (q_join_card_estimate, SQL_JOIN_CARD_ESTIMATE),
    "lead_lag_beta": (q_lead_lag_beta, SQL_LEAD_LAG_BETA),
    "t_closeness_audit": (q_t_closeness_audit, SQL_T_CLOSENESS_AUDIT),
    "anova_effect": (q_anova_effect, SQL_ANOVA_EFFECT),
    "tail_cvar": (q_tail_cvar, SQL_TAIL_CVAR),
    "kwic_concordance": (q_kwic_concordance, SQL_KWIC_CONCORDANCE),
    "prefix_completions": (q_prefix_completions, SQL_PREFIX_COMPLETIONS),
    "spearman_rho": (q_spearman_rho, SQL_SPEARMAN_RHO),
    "min_pair_span": (q_min_pair_span, SQL_MIN_PAIR_SPAN),
    "spotsigs_pairs": (q_spotsigs_pairs, SQL_SPOTSIGS_PAIRS),
    "behavior_cosine": (q_behavior_cosine, SQL_BEHAVIOR_COSINE),
    "rich_club": (q_rich_club, SQL_RICH_CLUB),
    "neyman_allocation": (q_neyman_allocation, SQL_NEYMAN_ALLOCATION),
    "sample_size_power": (q_sample_size_power, SQL_SAMPLE_SIZE_POWER),
    "ipw_estimate": (q_ipw_estimate, SQL_IPW_ESTIMATE),
    "yule_k": (q_yule_k, SQL_YULE_K),
    "zone_map_pruning": (q_zone_map_pruning, SQL_ZONE_MAP_PRUNING),
    "intersection_cost_model": (
        q_intersection_cost_model,
        SQL_INTERSECTION_COST_MODEL,
    ),
    "term_expansion": (q_term_expansion, SQL_TERM_EXPANSION),
    "aa_test_calibration": (q_aa_test_calibration, SQL_AA_TEST_CALIBRATION),
    "poisson_bootstrap_ci": (q_poisson_bootstrap_ci, SQL_POISSON_BOOTSTRAP_CI),
    "design_effect_icc": (q_design_effect_icc, SQL_DESIGN_EFFECT_ICC),
    "mcnemar_paired": (q_mcnemar_paired, SQL_MCNEMAR_PAIRED),
    "dict_encoding_benefit": (q_dict_encoding_benefit, SQL_DICT_ENCODING_BENEFIT),
    "markov_entropy_rate": (q_markov_entropy_rate, SQL_MARKOV_ENTROPY_RATE),
    "bcubed_eval": (q_bcubed_eval, SQL_BCUBED_EVAL),
    "simpsons_paradox": (q_simpsons_paradox, SQL_SIMPSONS_PARADOX),
    "fleiss_kappa": (q_fleiss_kappa, SQL_FLEISS_KAPPA),
    "sprt_host_abort": (q_sprt_host_abort, SQL_SPRT_HOST_ABORT),
    "gini_host_concentration": (
        q_gini_host_concentration,
        SQL_GINI_HOST_CONCENTRATION,
    ),
    "waterfill_fairshare": (q_waterfill_fairshare, SQL_WATERFILL_FAIRSHARE),
    "cdc_chunking": (q_cdc_chunking, SQL_CDC_CHUNKING),
    "degree_assortativity": (q_degree_assortativity, SQL_DEGREE_ASSORTATIVITY),
    "zipf_rank_deviation": (q_zipf_rank_deviation, SQL_ZIPF_RANK_DEVIATION),
    "url_editdist_neardup": (q_url_editdist_neardup, SQL_URL_EDITDIST_NEARDUP),
    "cho_change_rate": (q_cho_change_rate, SQL_CHO_CHANGE_RATE),
    "bloom_sizing_audit": (q_bloom_sizing_audit, SQL_BLOOM_SIZING_AUDIT),
    "url_template_entropy": (q_url_template_entropy, SQL_URL_TEMPLATE_ENTROPY),
    "ngram_containment": (q_ngram_containment, SQL_NGRAM_CONTAINMENT),
    "cross_source_dup_matrix": (
        q_cross_source_dup_matrix,
        SQL_CROSS_SOURCE_DUP_MATRIX,
    ),
    "embedding_centroid_drift": (
        q_embedding_centroid_drift,
        SQL_EMBEDDING_CENTROID_DRIFT,
    ),
    "host_yield_curve": (q_host_yield_curve, SQL_HOST_YIELD_CURVE),
    "frontier_branching": (q_frontier_branching, SQL_FRONTIER_BRANCHING),
    "embedding_dispersion": (q_embedding_dispersion, SQL_EMBEDDING_DISPERSION),
    "dunning_llr_keyness": (q_dunning_llr_keyness, SQL_DUNNING_LLR_KEYNESS),
    "quality_calibration_ece": (
        q_quality_calibration_ece,
        SQL_QUALITY_CALIBRATION_ECE,
    ),
    "discovery_halflife": (q_discovery_halflife, SQL_DISCOVERY_HALFLIFE),
    "politeness_makespan": (q_politeness_makespan, SQL_POLITENESS_MAKESPAN),
    "compaction_planner": (q_compaction_planner, SQL_COMPACTION_PLANNER),
    "lsh_s_curve": (q_lsh_s_curve, SQL_LSH_S_CURVE),
    "dedup_survivorship": (q_dedup_survivorship, SQL_DEDUP_SURVIVORSHIP),
    "champion_lists": (q_champion_lists, SQL_CHAMPION_LISTS),
    "otsu_threshold": (q_otsu_threshold, SQL_OTSU_THRESHOLD),
    "ndcg_eval": (q_ndcg_eval, SQL_NDCG_EVAL),
    "fetch_success_spc": (q_fetch_success_spc, SQL_FETCH_SUCCESS_SPC),
    "typosquat_detect": (q_typosquat_detect, SQL_TYPOSQUAT_DETECT),
    "source_vocab_overlap": (q_source_vocab_overlap, SQL_SOURCE_VOCAB_OVERLAP),
    "topk_churn": (q_topk_churn, SQL_TOPK_CHURN),
    "trend_test_ca": (q_trend_test_ca, SQL_TREND_TEST_CA),
    "markov_prediction_accuracy": (
        q_markov_prediction_accuracy,
        SQL_MARKOV_PREDICTION_ACCURACY,
    ),
    "quantile_sketch_error": (q_quantile_sketch_error, SQL_QUANTILE_SKETCH_ERROR),
    "sample_join_estimate": (q_sample_join_estimate, SQL_SAMPLE_JOIN_ESTIMATE),
    "birthday_collision_audit": (
        q_birthday_collision_audit,
        SQL_BIRTHDAY_COLLISION_AUDIT,
    ),
    "context_length_sweep": (q_context_length_sweep, SQL_CONTEXT_LENGTH_SWEEP),
    "simhash_bit_balance": (q_simhash_bit_balance, SQL_SIMHASH_BIT_BALANCE),
    "jain_fairness": (q_jain_fairness, SQL_JAIN_FAIRNESS),
    "dup_growth_curve": (q_dup_growth_curve, SQL_DUP_GROWTH_CURVE),
    "int8_quant_error": (q_int8_quant_error, SQL_INT8_QUANT_ERROR),
    "split_leakage_audit": (q_split_leakage_audit, SQL_SPLIT_LEAKAGE_AUDIT),
    "recrawl_value_rank": (q_recrawl_value_rank, SQL_RECRAWL_VALUE_RANK),
    "dup_by_quality": (q_dup_by_quality, SQL_DUP_BY_QUALITY),
    "vocab_coverage_curve": (q_vocab_coverage_curve, SQL_VOCAB_COVERAGE_CURVE),
    "phrase_mining": (q_phrase_mining, SQL_PHRASE_MINING),
    "storage_tiering": (q_storage_tiering, SQL_STORAGE_TIERING),
    "dupgraph_transitivity": (
        q_dupgraph_transitivity,
        SQL_DUPGRAPH_TRANSITIVITY,
    ),
    "sitemap_coverage": (q_sitemap_coverage, SQL_SITEMAP_COVERAGE),
    "doulion_triangle_estimate": (
        q_doulion_triangle_estimate,
        SQL_DOULION_TRIANGLE_ESTIMATE,
    ),
    # non-SQL-expressible (rows-only)
    "crawl_wave_e2e": (q_crawl_wave_e2e, None),
    "ann_ivf": (q_ann_ivf, None),
    "ann_pq": (q_ann_pq, None),
    "multimodal_decode": (q_multimodal_decode, SQL_MULTIMODAL_DECODE),
    "image_resize": (q_image_resize, SQL_IMAGE_RESIZE),
    "audio_decode": (q_audio_decode, SQL_AUDIO_DECODE),
    "video_frame_sample": (q_video_frame_sample, SQL_VIDEO_FRAME_SAMPLE),
    "tune_vocabulary": (q_tune_vocabulary, None),
    "host_budget_stream": (q_host_budget_stream, SQL_HOST_BUDGET_STREAM),
    "late_window_stream": (q_late_window_stream, SQL_LATE_WINDOW_STREAM),
    "stream_join": (q_stream_join, SQL_STREAM_JOIN),
    "stream_seen_dedup": (q_stream_seen_dedup, SQL_STREAM_SEEN_DEDUP),
    "sampler_pivot": (q_sampler_pivot, None),
}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in REGISTRY.items() if sql is not None}
