"""Coverage extensions: statistical aggregates, pivot, range-frame
windows, BPE-ish tokenization — operators inside the reference's permitted
SQL envelope (SURVEY.md §2C 'delegated' rows) or named by the north-star
extension list, each with a DuckDB oracle twin."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cloudfloe_spark.queries.catalog import register
from cloudfloe_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# BPE-ish tokenization (north-star: "token counting — whitespace + a
# BPE-ish regex"). Pattern kept to RE2∩Java-regex common ground: letter
# runs, digit runs, punctuation runs — the GPT-2 pretokenizer's shape
# without lookarounds.
# ---------------------------------------------------------------------------

_BPE_RE = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]+"


@register(
    "text_bpe_tokens",
    oracle=f"""
        SELECT doc_id,
               CAST(LEN(regexp_extract_all(text, '{_BPE_RE}')) AS INT)
                   AS n_bpe_tokens,
               CAST(LEN(LIST_DISTINCT(regexp_extract_all(text, '{_BPE_RE}')))
                   AS INT) AS n_unique_bpe_tokens
        FROM documents
    """,
    tags=("text", "tokenize"),
)
def text_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-word-style token counting with a BPE-ish pretokenizer regex
    (letter/digit/punctuation runs) — pure regexp_extract_all projection,
    JVM-side, shuffle-free."""
    d = load_table(spark, sf_dir, "documents")
    # NB: F.regexp_extract_all with a lit pattern, not F.expr — a SQL
    # string literal would eat the \s escape and silently match spaces.
    toks = F.regexp_extract_all(F.col("text"), F.lit(_BPE_RE), F.lit(0))
    return d.select(
        "doc_id",
        F.size(toks).alias("n_bpe_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique_bpe_tokens"),
    )


# ---------------------------------------------------------------------------
# Statistical aggregates
# ---------------------------------------------------------------------------


@register(
    "agg_percentiles",
    oracle="""
        SELECT l_returnflag,
               ROUND(quantile_cont(l_quantity, 0.5), 6) AS p50_qty,
               ROUND(quantile_cont(l_quantity, 0.9), 6) AS p90_qty,
               ROUND(quantile_cont(l_extendedprice, 0.99), 6) AS p99_price
        FROM lineitem
        GROUP BY l_returnflag
    """,
    tags=("agg", "percentile"),
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous percentiles per group (Spark ``percentile`` ≡
    DuckDB ``quantile_cont``). Exact percentile sorts within groups —
    at 100 TB swap in ``approx_percentile`` (t-digest, mergeable
    map-side) and accept the documented error bound. The two quantity
    percentiles share ONE array-argument aggregate buffer (each scalar
    ``percentile`` call would otherwise build its own per-group value
    map — measured ~1.8x slower)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_quantity, array(0.5, 0.9))").alias("q"),
            F.round(F.expr("percentile(l_extendedprice, 0.99)"), 6).alias(
                "p99_price"
            ),
        )
        .select(
            "l_returnflag",
            F.round(F.col("q")[0], 6).alias("p50_qty"),
            F.round(F.col("q")[1], 6).alias("p90_qty"),
            "p99_price",
        )
    )


@register(
    "agg_corr_stddev",
    oracle="""
        SELECT l_returnflag,
               ROUND(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
               ROUND(stddev_samp(l_discount), 6) AS discount_stddev,
               ROUND(var_samp(l_tax), 6) AS tax_var,
               ROUND(covar_samp(l_quantity, l_discount), 6) AS qty_disc_covar
        FROM lineitem
        GROUP BY l_returnflag
    """,
    tags=("agg", "stats"),
)
def agg_corr_stddev(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-moment aggregates (corr/stddev/var/covar) — all mergeable,
    partial-aggregated map-side like any sum."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias(
            "qty_price_corr"
        ),
        F.round(F.stddev_samp("l_discount"), 6).alias("discount_stddev"),
        F.round(F.var_samp("l_tax"), 6).alias("tax_var"),
        F.round(F.covar_samp("l_quantity", "l_discount"), 6).alias(
            "qty_disc_covar"
        ),
    )


# ---------------------------------------------------------------------------
# Pivot
# ---------------------------------------------------------------------------

_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


@register(
    "pivot_priority_by_year",
    oracle="""
        SELECT CAST(YEAR(o_orderdate) AS INT) AS order_year,
               CAST(COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS BIGINT) AS urgent,
               CAST(COUNT(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS BIGINT) AS high,
               CAST(COUNT(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS BIGINT) AS medium,
               CAST(COUNT(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS BIGINT) AS not_specified,
               CAST(COUNT(*) FILTER (WHERE o_orderpriority = '5-LOW') AS BIGINT) AS low
        FROM orders
        GROUP BY 1
    """,
    tags=("grouping", "pivot"),
)
def pivot_priority_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide counts per priority by order year). Pivot values are
    DECLARED, not discovered — the discovery pass is an extra full scan
    and nondeterministic column order at scale."""
    o = load_table(spark, sf_dir, "orders")
    aliases = ["urgent", "high", "medium", "not_specified", "low"]
    out = (
        o.groupBy(F.year("o_orderdate").alias("order_year"))
        .pivot("o_orderpriority", _PRIORITIES)
        .count()
    )
    for val, alias in zip(_PRIORITIES, aliases):
        out = out.withColumnRenamed(val, alias)
    # pivot emits NULL for empty cells; counts should read 0
    return out.select(
        "order_year",
        *[F.coalesce(F.col(a), F.lit(0)).alias(a) for a in aliases],
    )


# ---------------------------------------------------------------------------
# Range-frame window (value-range frames, not row counts)
# ---------------------------------------------------------------------------


@register(
    "window_range_90d_revenue",
    oracle="""
        SELECT o_custkey, o_orderkey,
               ROUND(SUM(o_totalprice) OVER (
                   PARTITION BY o_custkey
                   ORDER BY DATEDIFF('day', DATE '1970-01-01',
                                     CAST(o_orderdate AS DATE))
                   RANGE BETWEEN 90 PRECEDING AND CURRENT ROW
               ), 2) AS revenue_90d
        FROM orders
    """,
    tags=("window", "range-frame"),
)
def window_range_90d_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-90-day revenue per customer: a RANGE frame over day
    numbers (value-based, handles gaps/duplicate dates correctly where a
    ROWS frame would not). One shuffle on o_custkey."""
    o = load_table(spark, sf_dir, "orders")
    day = F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(day.cast("long"))
        .rangeBetween(-90, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("revenue_90d"),
    )


# ---------------------------------------------------------------------------
# Deterministic sampling (training-pipeline reproducibility)
# ---------------------------------------------------------------------------
# rand()-based sampling is nondeterministic across retries/engines; hash-mod
# sampling gives the same sample on every engine and every re-run, and it's
# stable under repartitioning — the property training pipelines need to make
# "the 1% eval split" a fact about the data, not about one job execution.

from cloudfloe_spark.functions.text import portable_hash64, portable_hash_sql  # noqa: E402


@register(
    "sample_documents_hash",
    oracle=f"""
        SELECT doc_id, lang
        FROM documents
        WHERE ({portable_hash_sql("CAST(doc_id AS VARCHAR)")}) % 100 < 10
    """,
    tags=("sampling",),
)
def sample_documents_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible 10% document sample via portable md5-hash-mod on the
    key — same rows every run, every engine, any partitioning. Pure
    filter: pushdown-friendly, no shuffle."""
    d = load_table(spark, sf_dir, "documents")
    h = portable_hash64(F.col("doc_id").cast("string"))
    return d.filter(h % 100 < 10).select("doc_id", "lang")


@register(
    "sample_events_stratified",
    oracle=f"""
        WITH rates(event_type, pct) AS (
            VALUES ('purchase', 100), ('error', 50), ('click', 5),
                   ('view', 5), ('signup', 100)
        )
        SELECT e.event_type, CAST(COUNT(*) AS BIGINT) AS n_sampled
        FROM events e JOIN rates r ON e.event_type = r.event_type
        WHERE ({portable_hash_sql("CAST(event_id AS VARCHAR)")}) % 100 < r.pct
        GROUP BY e.event_type
    """,
    tags=("sampling", "events"),
)
def sample_events_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sampling: per-class keep rates (keep all
    rare classes, downsample dominant ones — the class-balance shape of
    training-data curation), as a broadcast join of the rate table plus a
    hash-mod filter. No shuffle of the fact side."""
    ev = load_table(spark, sf_dir, "events")
    rates = ev.sparkSession.createDataFrame(
        [("purchase", 100), ("error", 50), ("click", 5), ("view", 5),
         ("signup", 100)],
        "event_type string, pct int",
    )
    h = portable_hash64(F.col("event_id").cast("string"))
    return (
        ev.join(F.broadcast(rates), "event_type")
        .filter(h % 100 < F.col("pct"))
        .groupBy("event_type")
        .agg(F.count("*").alias("n_sampled"))
    )


@register(
    "unpivot_priority_counts",
    oracle="""
        WITH wide AS (
            SELECT CAST(YEAR(o_orderdate) AS INT) AS order_year,
                   CAST(COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS BIGINT) AS urgent,
                   CAST(COUNT(*) FILTER (WHERE o_orderpriority = '5-LOW') AS BIGINT) AS low
            FROM orders GROUP BY 1
        )
        SELECT order_year, p.priority, p.n FROM wide,
            LATERAL (SELECT UNNEST(['urgent', 'low']) AS priority,
                            UNNEST([urgent, low]) AS n) p
    """,
    tags=("grouping", "unpivot"),
)
def unpivot_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT/melt: wide per-year counts back to long (year, priority, n)
    via ``DataFrame.unpivot`` — the inverse of the pivot entry. Pure
    reshape after a small agg; no extra shuffle beyond the groupBy."""
    o = load_table(spark, sf_dir, "orders")
    wide = o.groupBy(F.year("o_orderdate").alias("order_year")).agg(
        F.count(F.when(F.col("o_orderpriority") == "1-URGENT", 1)).alias("urgent"),
        F.count(F.when(F.col("o_orderpriority") == "5-LOW", 1)).alias("low"),
    )
    return wide.unpivot(
        ids=["order_year"],
        values=["urgent", "low"],
        variableColumnName="priority",
        valueColumnName="n",
    )


@register(
    "split_train_val_test",
    oracle=f"""
        WITH assigned AS (
            SELECT lang, n_chars,
                   CASE WHEN ({portable_hash_sql("CAST(doc_id AS VARCHAR)", seed=7)}) % 100 < 80
                        THEN 'train'
                        WHEN ({portable_hash_sql("CAST(doc_id AS VARCHAR)", seed=7)}) % 100 < 90
                        THEN 'val'
                        ELSE 'test' END AS split
            FROM documents
        )
        SELECT split, lang,
               COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM assigned
        GROUP BY split, lang
    """,
    tags=("sampling", "split"),
)
def split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment via seeded
    portable hash-mod on the document key — stable across engines, runs,
    partitionings, and data appends (a doc never changes split when new
    docs arrive, unlike percent_rank-based splits). Pure projection +
    aggregation; the assignment itself never shuffles."""
    d = load_table(spark, sf_dir, "documents")
    bucket = portable_hash64(F.col("doc_id").cast("string"), seed=7) % 100
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return (
        d.select(split.alias("split"), "lang", "n_chars")
        .groupBy("split", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
    )


@register(
    "class_balanced_cap",
    oracle=f"""
        WITH ranked AS (
            SELECT label, vec_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY label
                       ORDER BY ({portable_hash_sql("CAST(vec_id AS VARCHAR)", seed=3)}), vec_id
                   ) AS rnk
            FROM embeddings
        )
        SELECT label,
               COUNT(*) AS n_kept,
               CAST(MIN(vec_id) AS BIGINT) AS min_kept_id
        FROM ranked
        WHERE rnk <= 30
        GROUP BY label
    """,
    tags=("sampling", "balance"),
)
def class_balanced_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-balanced downsampling: cap every label at 30 examples chosen
    by seeded-hash order (deterministic, unbiased by storage order). The
    per-label row_number plans as WindowGroupLimit under the rnk<=30
    filter, so oversized classes never fully sort."""
    e = load_table(spark, sf_dir, "embeddings")
    h = portable_hash64(F.col("vec_id").cast("string"), seed=3)
    w = Window.partitionBy("label").orderBy(h.asc(), F.col("vec_id").asc())
    return (
        e.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 30)
        .groupBy("label")
        .agg(
            F.count("*").alias("n_kept"),
            F.min("vec_id").cast("bigint").alias("min_kept_id"),
        )
    )


@register(
    "sample_to_mixture",
    # Equal-weight target mixture over sources: per-source keep-rate in
    # basis points = min(10000, target_share/current_share * 10000),
    # applied with the portable hash so every engine keeps the same rows.
    oracle=f"""
        WITH counts AS (
            SELECT source, COUNT(*) AS n FROM documents GROUP BY source
        ),
        rates AS (
            SELECT source,
                   LEAST(10000, CAST(
                       10000.0 * (SELECT SUM(n) FROM counts)
                       / ((SELECT COUNT(*) FROM counts) * n) AS BIGINT))
                       AS rate_bp
            FROM counts
        )
        SELECT d.source,
               CAST(COUNT(*) AS BIGINT) AS n_sampled,
               MIN(r.rate_bp) AS rate_bp
        FROM documents d JOIN rates r ON d.source = r.source
        WHERE ({portable_hash_sql("CAST(doc_id AS VARCHAR)")}) % 10000 < r.rate_bp
        GROUP BY d.source
    """,
    tags=("sampling", "pipeline"),
)
def sample_to_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture re-weighting (Pile/Dolma-style): compute the per-source
    keep-rate that moves the corpus toward an equal-share source mixture
    (never upsampling, rate capped at 1), then apply it with the portable
    deterministic hash — identical kept-row sets on every engine/replica.

    Scale shape: the rate table is one tiny aggregate joined back on
    ``source`` (AQE broadcasts it); the sample itself is a pure filter,
    so the corpus scan never shuffles."""
    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(F.count("*").alias("n"))
    totals = counts.agg(
        F.sum("n").alias("total"), F.count("*").alias("n_sources")
    )
    rates = counts.crossJoin(totals).select(
        "source",
        F.least(
            F.lit(10000),
            (10000.0 * F.col("total") / (F.col("n_sources") * F.col("n")))
            .cast("bigint"),
        ).alias("rate_bp"),
    )
    h = portable_hash64(F.col("doc_id").cast("string"))
    return (
        d.join(rates, "source")
        .filter(h % 10000 < F.col("rate_bp"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_sampled"),
            F.min("rate_bp").alias("rate_bp"),
        )
    )


@register(
    "profile_numeric_columns",
    oracle="""
        SELECT 'l_quantity' AS col, COUNT(*) AS n,
               COUNT(*) - COUNT(l_quantity) AS n_null,
               COUNT(DISTINCT l_quantity) AS n_distinct,
               ROUND(MIN(l_quantity), 4) AS min_v,
               ROUND(MAX(l_quantity), 4) AS max_v,
               ROUND(AVG(l_quantity), 4) AS mean_v
        FROM lineitem
        UNION ALL
        SELECT 'l_discount', COUNT(*), COUNT(*) - COUNT(l_discount),
               COUNT(DISTINCT l_discount),
               ROUND(MIN(l_discount), 4), ROUND(MAX(l_discount), 4),
               ROUND(AVG(l_discount), 4)
        FROM lineitem
        UNION ALL
        SELECT 'l_tax', COUNT(*), COUNT(*) - COUNT(l_tax),
               COUNT(DISTINCT l_tax),
               ROUND(MIN(l_tax), 4), ROUND(MAX(l_tax), 4),
               ROUND(AVG(l_tax), 4)
        FROM lineitem
    """,
    tags=("quality", "profiling"),
)
def profile_numeric_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling — the data-quality fingerprint step (null counts,
    cardinality, range, mean per column) a pipeline records before
    training ingestion.

    Scale shape: ONE pass over the fact table computing every column's
    aggregates side by side (a single partial-aggregated global agg), then
    a tiny unpivot of the 1-row result — not one scan per column, which is
    what the naive UNION ALL oracle spells and what a 100-TB profile
    cannot afford."""
    li = load_table(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_discount", "l_tax"]
    aggs = []
    for c in cols:
        aggs += [
            F.count("*").alias(f"{c}__n"),
            (F.count("*") - F.count(c)).alias(f"{c}__n_null"),
            F.countDistinct(c).alias(f"{c}__n_distinct"),
            F.round(F.min(c), 4).alias(f"{c}__min_v"),
            F.round(F.max(c), 4).alias(f"{c}__max_v"),
            F.round(F.avg(c), 4).alias(f"{c}__mean_v"),
        ]
    one = li.agg(*aggs)
    per_col = [
        F.struct(
            F.lit(c).alias("col"),
            F.col(f"{c}__n").alias("n"),
            F.col(f"{c}__n_null").alias("n_null"),
            F.col(f"{c}__n_distinct").alias("n_distinct"),
            F.col(f"{c}__min_v").alias("min_v"),
            F.col(f"{c}__max_v").alias("max_v"),
            F.col(f"{c}__mean_v").alias("mean_v"),
        )
        for c in cols
    ]
    return one.select(
        F.explode(F.array(*per_col)).alias("p")
    ).select("p.*")


@register(
    "dq_referential_checks",
    oracle="""
        SELECT 'orders_nonempty' AS check_name,
               COUNT(*) > 0 AS passed,
               COUNT(*) AS measured
        FROM orders
        UNION ALL
        SELECT 'orders_custkey_fk',
               COUNT(*) = 0,
               COUNT(*)
        FROM orders o
        LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE c.c_custkey IS NULL
        UNION ALL
        SELECT 'lineitem_orderkey_fk',
               COUNT(*) = 0,
               COUNT(*)
        FROM lineitem l
        LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderkey IS NULL
        UNION ALL
        SELECT 'orders_totalprice_positive',
               COUNT(*) = 0,
               COUNT(*)
        FROM orders WHERE o_totalprice <= 0
    """,
    tags=("quality", "dq"),
)
def dq_referential_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality gate: named assertions (non-empty, two foreign-key
    orphan checks, a domain check) as rows of (check, passed, measured) —
    the shape a pipeline writes to its quality ledger before promoting a
    snapshot.

    Scale shape: each FK check is an ANTI join (orphans only — no row
    multiplication), counted with a partial aggregate; the union of four
    1-row results is free. AQE picks broadcast vs shuffle per check."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")

    def one(name, cnt_df, pass_when_zero=True):
        agg = cnt_df.agg(F.count("*").alias("measured"))
        passed = (
            (F.col("measured") == 0)
            if pass_when_zero
            else (F.col("measured") > 0)
        )
        return agg.select(
            F.lit(name).alias("check_name"),
            passed.alias("passed"),
            F.col("measured"),
        )

    checks = one("orders_nonempty", o, pass_when_zero=False)
    checks = checks.unionByName(
        one(
            "orders_custkey_fk",
            o.join(c, o.o_custkey == c.c_custkey, "left_anti"),
        )
    )
    checks = checks.unionByName(
        one(
            "lineitem_orderkey_fk",
            li.join(o, li.l_orderkey == o.o_orderkey, "left_anti"),
        )
    )
    return checks.unionByName(
        one("orders_totalprice_positive", o.filter(F.col("o_totalprice") <= 0))
    )


_ES_SEED = 11
_ES_TOPK = 30


@register(
    "sample_weighted_orders",
    oracle=f"""
        WITH keyed AS (
            SELECT o_orderkey, o_totalprice,
                   LN(({portable_hash_sql("CAST(o_orderkey AS VARCHAR)", seed=_ES_SEED)}
                       % 1000000 + 1) / 1000001.0) / o_totalprice AS es_key
            FROM orders
        )
        SELECT o_orderkey, o_totalprice, ROUND(es_key * 1e6, 6) AS es_key_micros
        FROM keyed
        ORDER BY es_key DESC, o_orderkey
        LIMIT {_ES_TOPK}
    """,
    tags=("sampling", "weighted"),
)
def sample_weighted_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement, A-ES style (Efraimidis &
    Spirakis 2006): each row draws u ~ Uniform(0,1) from the portable
    seeded hash of its key and scores ln(u)/weight (equivalent to the
    paper's u^(1/w) in log space — monotone, overflow-free); the top-k
    scores ARE a weighted sample without replacement, price-weighted here.
    Deterministic across engines, runs, and partitionings because u comes
    from the md5 hash, not an RNG.

    Scale shape: the score is a zero-shuffle projection; top-k plans as
    TakeOrderedAndProject (per-partition heaps + driver merge of k·P
    rows), never a global sort — the same pattern the top_k_orders plan
    audit pins. At 100 TB the reduce side sees k rows per partition."""
    o = load_table(spark, sf_dir, "orders")
    u = (
        (portable_hash64(F.col("o_orderkey").cast("string"), seed=_ES_SEED) % 1000000)
        + 1
    ) / 1000001.0
    keyed = o.select(
        "o_orderkey",
        "o_totalprice",
        (F.log(u) / F.col("o_totalprice")).alias("es_key"),
    )
    return (
        keyed.orderBy(F.col("es_key").desc(), F.col("o_orderkey"))
        .limit(_ES_TOPK)
        .select(
            "o_orderkey",
            "o_totalprice",
            F.round(F.col("es_key") * 1e6, 6).alias("es_key_micros"),
        )
    )


@register(
    "robust_outliers_mad",
    oracle="""
        WITH med AS (
            SELECT l_returnflag, QUANTILE_CONT(l_extendedprice, 0.5) AS m
            FROM lineitem GROUP BY l_returnflag
        ),
        dev AS (
            SELECT l.l_returnflag, l.l_extendedprice,
                   ABS(l.l_extendedprice - med.m) AS d, med.m
            FROM lineitem l JOIN med USING (l_returnflag)
        ),
        mad AS (
            SELECT l_returnflag, QUANTILE_CONT(d, 0.5) AS mad
            FROM dev GROUP BY l_returnflag
        )
        SELECT d.l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               ROUND(ANY_VALUE(d.m), 4) AS median_price,
               ROUND(ANY_VALUE(mad.mad), 4) AS mad,
               CAST(COUNT(*) FILTER (
                   d.d > 3.0 * 1.4826 * mad.mad) AS BIGINT) AS n_outliers
        FROM dev d JOIN mad USING (l_returnflag)
        GROUP BY d.l_returnflag
    """,
    tags=("stats", "robust"),
)
def robust_outliers_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection via the Median Absolute Deviation
    (Hampel's rule: |x − median| > 3·1.4826·MAD, the consistency constant
    making MAD estimate sigma under normality) — the outlier gate that,
    unlike z-scores, is not itself corrupted by the outliers it hunts.
    Reports per-group medians, MAD, and outlier counts.

    Scale shape: two exact-percentile passes over the group key (each a
    sort-agg partial-aggregated within its hash partition) and one
    counting join back — three shuffles on the same low-cardinality key.
    At 100 TB swap QUANTILE_CONT for approx_percentile on both sides and
    the construction is one pass cheaper; exact is kept here so the
    differential stays bit-for-bit."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    med = li.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", F.lit(0.5)).alias("m")
    )
    dev = li.join(med, "l_returnflag").select(
        "l_returnflag",
        "m",
        F.abs(F.col("l_extendedprice") - F.col("m")).alias("d"),
    )
    mad = dev.groupBy("l_returnflag").agg(
        F.percentile("d", F.lit(0.5)).alias("mad")
    )
    return (
        dev.join(mad, "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.round(F.any_value("m"), 4).alias("median_price"),
            F.round(F.any_value("mad"), 4).alias("mad"),
            F.sum(
                (F.col("d") > 3.0 * 1.4826 * F.col("mad")).cast("bigint")
            ).cast("bigint").alias("n_outliers"),
        )
    )


@register(
    "grouped_price_regression",
    oracle="""
        SELECT l_returnflag,
               ROUND(REGR_SLOPE(l_extendedprice, l_quantity), 4) AS slope,
               ROUND(REGR_INTERCEPT(l_extendedprice, l_quantity), 4)
                   AS intercept,
               ROUND(REGR_R2(l_extendedprice, l_quantity), 6) AS r2,
               CAST(REGR_COUNT(l_extendedprice, l_quantity) AS BIGINT)
                   AS n_pairs
        FROM lineitem
        GROUP BY l_returnflag
    """,
    tags=("stats", "regression"),
)
def grouped_price_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group OLS of extended price on quantity (slope, intercept, R²,
    pair count) — the grouped-regression primitive behind price-curve
    monitoring and elasticity dashboards, entirely in single-pass moment
    aggregates (regr_* maintain sums/products map-side; no residual pass,
    no collect). At 100 TB this is one map-side-combinable aggregation —
    the same cost envelope as agg_stats."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 4).alias("slope"),
        F.round(
            F.regr_intercept("l_extendedprice", "l_quantity"), 4
        ).alias("intercept"),
        F.round(F.regr_r2("l_extendedprice", "l_quantity"), 6).alias("r2"),
        F.regr_count("l_extendedprice", "l_quantity").cast("bigint").alias(
            "n_pairs"
        ),
    )


@register(
    "agg_salted_user_stats",
    # The oracle is the PLAIN group-by: salting is an execution strategy,
    # not a semantics change — the two-phase salted aggregation must be
    # bit-equal (after the stated rounding) to the direct aggregate.
    oracle="""
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               ROUND(CAST(SUM(CAST(value AS DECIMAL(28,14))) AS DOUBLE), 6)
                   AS total_value,
               ROUND(MAX(value), 6) AS max_value
        FROM events
        GROUP BY user_id
    """,
    tags=("agg", "skew"),
)
def agg_salted_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event stats through the SALTED two-phase aggregation
    (operators/skew.salted_agg) — the hot-key execution path SCALING.md
    measures under 90% key skew — proven semantics-preserving against the
    plain GROUP BY oracle. The salt spreads each key across 16 reducers in
    phase 1; phase 2 merges the mergeable partials (sum/count/max), so the
    result is identical while no single reducer ever receives a whole hot
    key.

    Sum determinism: values are summed as DECIMAL(28,14) on the oracle
    side and the salted partial order differs from a direct scan, so the
    compared total is rounded at 6 — per-user groups are small enough that
    double summation agrees to far finer than that."""
    from cloudfloe_spark.operators.skew import salted_agg

    ev = load_table(spark, sf_dir, "events")
    out = salted_agg(
        ev,
        ["user_id"],
        [
            ("value", "count", "n_events"),
            ("value", "sum", "total_value"),
            ("value", "max", "max_value"),
        ],
        spread_col="event_id",
    )
    return out.select(
        "user_id",
        F.col("n_events").cast("bigint").alias("n_events"),
        F.round("total_value", 6).alias("total_value"),
        F.round("max_value", 6).alias("max_value"),
    )
