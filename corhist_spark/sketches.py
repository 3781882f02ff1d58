"""Mergeable one-pass sketches for corpus profiling at 100-TB scale:
count-min heavy hitters and a deterministic HyperLogLog-style distinct
estimator.

At 10^12 documents you cannot afford "groupBy token" / "COUNT(DISTINCT
shingle)" as a routine profiling step — the profile itself must be a
constant-size, mergeable summary built in one pass (Cormode &
Muthukrishnan 2005 for count-min; Flajolet et al. 2007 for HLL).  Both
sketches here are exact-deterministic (md5-keyed hashing, integer
register math) so their results are cross-engine transcribable into
DuckDB oracles — unlike Spark's built-in approx_count_distinct, whose
HLL++ internals are not reproducible SQL.

Scale shape:
- The CMS build explodes depth rows per token occurrence and
  immediately groupBy(row, bucket)-aggregates — map-side partial
  aggregation collapses each partition to <= depth*width rows before
  the (single) shuffle, so the sketch costs one linear pass whatever
  the corpus size.  Querying the sketch needs a CANDIDATE set (the
  sketch answers point queries, it does not enumerate) — the standard
  two-pass pattern; candidates here come from a deterministic document
  sample, and any true heavy hitter appears in a large-enough sample
  with overwhelming probability.
- The HLL build is one groupBy(bucket).max over the token stream —
  again one map-side-combined shuffle to m rows.  Registers are
  derived from the md5 hex digits with pure integer/bit-length
  arithmetic (no float log2, no per-row regexp on the hot path) so
  Spark and DuckDB produce bit-identical registers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CMS_DEPTH = 4
CMS_WIDTH = 1024
CMS_CAND_MOD = 16  # candidate sample: doc_id % CMS_CAND_MOD == 0
CMS_MIN_PPM = 500  # heavy-hitter threshold, parts-per-million
HLL_BUCKETS = 256  # 2 hex chars; sigma = 1.04/sqrt(256) = 6.5%
# alpha_m for m >= 128 (Flajolet et al. 2007, Fig. 3)
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_BUCKETS)


def _hex13(col):
    """First 13 md5 hex chars as a 52-bit BIGINT — the repo-wide
    deterministic hash (same decode as textops.hexval_sql)."""
    return F.expr(f"CAST(conv(substr(md5({col}), 1, 13), 16, 10) AS BIGINT)")


# the tiny-input guard for explode-amplified scans lives in textops
# (shared with the MinHash signature build, which hit the same
# 2-of-32-cores starvation at the sf1 tier)
from corhist_spark.textops import spread_small_input as _spread


def doc_tokens(docs: DataFrame) -> DataFrame:
    """(doc_id, tok) — whitespace tokens, empties dropped."""
    return docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).filter(F.col("tok") != "")


def cms_build(tokens: DataFrame, depth: int = CMS_DEPTH, width: int = CMS_WIDTH) -> DataFrame:
    """Count-min sketch of the ``tok`` column: (row, bucket, cnt) with
    depth*width cells.  Row r's hash is md5("r:" || tok) — independent
    salted hashes, one md5 per (token occurrence, row)."""
    rows = tokens.select(
        "tok", F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("r")
    )
    return (
        rows.withColumn(
            "bucket",
            _hex13("concat(CAST(r AS STRING), ':', tok)") % width,
        )
        .groupBy("r", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_heavy_hitters(
    docs: DataFrame,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    candidate_mod: int = CMS_CAND_MOD,
    min_ppm: int = CMS_MIN_PPM,
) -> DataFrame:
    """Tokens whose count-min ESTIMATE is >= min_ppm parts-per-million
    of the total token stream -> (token, est_count).

    est_count = min over the depth rows of the addressed cell (the CM
    upper bound: est >= true count always, with overestimation bounded
    by e*N/width per row).  Candidates are the distinct tokens of the
    deterministic doc_id % candidate_mod == 0 document sample; the
    threshold compare is pure integer math (est * 1e6 >= total *
    min_ppm) so both engines decide identically."""
    toks = doc_tokens(_spread(docs))
    sketch = cms_build(toks, depth, width)
    total = toks.agg(F.count(F.lit(1)).alias("total"))
    cand = (
        doc_tokens(docs.filter(F.col("doc_id") % candidate_mod == 0))
        .select("tok")
        .distinct()
    )
    cand_cells = cand.select(
        "tok", F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("r")
    ).withColumn(
        "bucket", _hex13("concat(CAST(r AS STRING), ':', tok)") % width
    )
    est = (
        cand_cells.join(sketch, ["r", "bucket"])
        .groupBy("tok")
        .agg(F.min("cnt").alias("est_count"))
    )
    return (
        est.crossJoin(F.broadcast(total))  # single-row totals frame
        .filter(F.col("est_count") * 1_000_000 >= F.col("total") * min_ppm)
        .select(F.col("tok").alias("token"), "est_count")
    )


def hll_registers(values: DataFrame, col: str = "s") -> DataFrame:
    """(bucket, reg) HLL registers over the ``col`` column: bucket =
    first 2 md5 hex chars (256 buckets), reg = max rho of the next 13
    hex chars (52 bits).  One map-side-combined shuffle to <= 256
    rows; registers merge across partitions/files by max.

    rho(v) = 1 + leading-zero-bits of the 52-bit tail value =
    53 - bit_length(v), with bit_length read as the LENGTH of the
    unpadded base-2 string (Spark conv(v,10,2) == DuckDB bin(v)
    char-for-char on non-negative inputs) — pure integer/length
    arithmetic on the hot path: float log2 would misround near exact
    powers of two, and per-row regexps cost ~2us each at 10^8-shingle
    scale (measured 30% of the sf1 wall before this formulation)."""
    h = values.select(F.md5(F.col(col)).alias("h"))
    return (
        h.select(
            F.expr("CAST(conv(substr(h, 1, 2), 16, 10) AS INT)").alias("bucket"),
            F.expr("CAST(conv(substr(h, 3, 13), 16, 10) AS BIGINT)").alias("v"),
        )
        .select(
            "bucket",
            F.expr(
                "CASE WHEN v = 0 THEN 53"
                " ELSE CAST(53 - length(conv(v, 10, 2)) AS INT) END"
            ).alias("rho"),
        )
        .groupBy("bucket")
        .agg(F.max("rho").alias("reg"))
    )


def hll_estimate(registers: DataFrame, m: int = HLL_BUCKETS) -> DataFrame:
    """One-row (hll_estimate BIGINT, zero_registers INT) from a
    register table.  Raw estimate alpha*m^2 / sum(2^-reg) with absent
    buckets contributing 2^0 = 1; small-range linear counting
    m*ln(m/zeros) when raw <= 2.5m and zeros > 0 (Flajolet et al.'s
    standard correction).  The 256-term double sum is order-dependent
    only at ~1e-15 relative — rounding the ~N-sized estimate to an
    integer is far outside that noise."""
    agg = registers.agg(
        F.sum(F.pow(F.lit(2.0), -F.col("reg"))).alias("s_present"),
        F.count(F.lit(1)).alias("n_present"),
    ).select(
        (F.col("s_present") + (F.lit(m) - F.col("n_present"))).alias("s"),
        (F.lit(m) - F.col("n_present")).cast("int").alias("zero_registers"),
    )
    raw = F.lit(HLL_ALPHA * m * m) / F.col("s")
    est = F.when(
        (raw <= 2.5 * m) & (F.col("zero_registers") > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("zero_registers")),
    ).otherwise(raw)
    return agg.select(
        F.round(est, 0).cast("bigint").alias("hll_estimate"),
        "zero_registers",
    )


def hll_distinct_shingles(docs: DataFrame, n: int = 16) -> DataFrame:
    """One-row HLL distinct-count estimate of the corpus's n-char
    shingle population (the minhash shingle universe — the cardinality
    a dedup planner needs, at 10^12 docs far too large to COUNT
    (DISTINCT)).  Same shingle extraction as textops.minhash_signatures."""
    sh = _spread(docs).select(
        F.explode(
            F.sequence(F.lit(1), F.greatest(F.length("text") - (n - 1), F.lit(1)))
        ).alias("i"),
        "text",
    ).select(F.expr(f"substr(text, i, {n})").alias("s"))
    return hll_estimate(hll_registers(sh))


QUANT_BIN_WIDTH = 8  # token-count bin width (docs cluster at O(100) tokens)
QUANT_QS = (50, 90, 99)  # integer percents — exact cross-engine compares


def binned_quantiles(values: DataFrame, col: str = "v", bin_width: int = QUANT_BIN_WIDTH, qs=QUANT_QS) -> DataFrame:
    """Fixed-width-binned quantile summary of the integer ``col``
    column -> one row per requested percentile q: (q, bin_lo, bin_hi,
    cum_count, total_count), where [bin_lo, bin_hi] is the FIRST bin
    whose cumulative count covers q percent of the population
    (cum * 100 >= total * q — pure integer compare, both engines
    decide identically).

    This is the mergeable-histogram member of the sketch family
    (Greenwald-Khanna / t-digest solve the same problem with adaptive
    bins; fixed-width bins trade a bounded value-resolution error of
    bin_width for EXACT determinism and a trivial merge = cell-wise
    add).  At 10^12 documents an exact percentile is a full sort;
    this is one map-side-combined groupBy to <= range/bin_width rows,
    then a window over that constant-size histogram."""
    hist = (
        # integer division (Spark `div` == DuckDB `//` on the
        # non-negative counts here) — NOT a double divide + cast,
        # whose rounding direction differs between the engines
        values.select(F.expr(f"{col} div {bin_width}").alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    from pyspark.sql import Window

    # the ordered window runs over the CONSTANT-SIZE histogram
    # (<= value_range/bin_width rows), never the corpus; the total is
    # a broadcast single-row aggregate, same pattern as every other
    # totals frame in the repo
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    total = hist.agg(F.sum("n").alias("total"))
    cum = hist.select("bin", F.sum("n").over(w).alias("cum")).crossJoin(
        F.broadcast(total)
    )
    from .localframe import local_df

    q_rows = cum.crossJoin(
        F.broadcast(
            local_df(values.sparkSession, [(q,) for q in qs], "q INT")
        )
    ).filter(F.col("cum") * 100 >= F.col("total") * F.col("q"))
    first = (
        q_rows.withColumn(
            "rn", F.row_number().over(Window.partitionBy("q").orderBy("bin"))
        )
        .filter(F.col("rn") == 1)
    )
    return first.select(
        "q",
        (F.col("bin") * bin_width).alias("bin_lo"),
        (F.col("bin") * bin_width + bin_width - 1).alias("bin_hi"),
        F.col("cum").alias("cum_count"),
        F.col("total").alias("total_count"),
    )


def token_count_quantiles(docs: DataFrame, bin_width: int = QUANT_BIN_WIDTH, qs=QUANT_QS) -> DataFrame:
    """Percentiles of the per-document token count through the binned
    quantile sketch — the length-distribution profile a packing /
    curation planner reads before choosing sequence lengths, costed
    as one linear pass + a constant-size histogram instead of a full
    sort.  Token definition = the repo-wide whitespace split with
    empties dropped (textops._token_array)."""
    from corhist_spark.textops import _token_array

    counts = docs.select(F.size(_token_array()).alias("v"))
    return binned_quantiles(counts, "v", bin_width, qs)


KMV_K = 256


def kmv_distinct_shingles(docs: DataFrame, k: int = KMV_K, n: int = 16) -> DataFrame:
    """K-minimum-values distinct-count sketch (Bar-Yossef et al. 2002;
    the theta-sketch family's simplest member) of the corpus's n-char
    shingle population -> one row (k_used, kth_min, est_distinct):
    keep the k smallest DISTINCT 52-bit shingle hashes; the k-th
    smallest value h_k estimates the cardinality as
    (k - 1) * 2^52 / h_k.

    The HLL sibling (hll_distinct_shingles) answers the same question
    with constant 256-register space but float rho/harmonic math kept
    deliberately integer-only; KMV's estimate here is EXACT integer
    arithmetic end to end ((k-1) * 2^52 fits BIGINT for k = 256, and
    the division truncates identically — Spark `div` == DuckDB `//`
    on non-negative operands), and the sketch is mergeable by
    union + re-truncation to k, so per-partition sketches combine
    associatively at any cluster size.

    Scale shape: one shingle explode + hash map pass, a distinct on
    the hash (map-side combined), then a distributed top-k
    (TakeOrdered — never a global sort) down to k rows on the
    driver-side of a constant-size result."""
    sh = _spread(docs).select(
        F.explode(
            F.sequence(F.lit(1), F.greatest(F.length("text") - (n - 1), F.lit(1)))
        ).alias("i"),
        "text",
    ).select(F.expr(f"substr(text, i, {n})").alias("s"))
    hashes = sh.select(
        F.expr(f"CAST(conv(substr(md5(s), 1, 13), 16, 10) AS BIGINT)").alias("h")
    ).distinct()
    mins = hashes.orderBy("h").limit(k)
    return mins.agg(
        F.count(F.lit(1)).alias("k_used"),
        F.max("h").alias("kth_min"),
    ).select(
        "k_used",
        "kth_min",
        # fewer than k distinct values observed = the sketch HOLDS the
        # whole universe -> answer exactly; only a full sketch estimates
        F.when(
            (F.col("k_used") >= k) & (F.col("kth_min") > 0),
            F.expr(f"((k_used - 1) * {1 << 52}) div kth_min"),
        )
        .otherwise(F.col("k_used").cast("long"))
        .alias("est_distinct"),
    )


def kmv_source_sketches(docs: DataFrame, k: int = KMV_K, n: int = 16) -> DataFrame:
    """(source, h): per-source KMV sketch — the k smallest distinct
    52-bit shingle hashes of each source's documents.

    Scale shape: the top-k is TWO-LEVEL — level 1 keeps k smallest per
    (source, h % 64) salt shard, so no single task ever sorts a whole
    source's distinct-hash stream (sources are few and huge: the
    naive per-source window IS the skewed-partition anti-pattern);
    level 2 re-truncates the <= 64k survivors per source.  Both
    levels are plain window row_number over integer keys — exact and
    deterministic (distinct hashes, no ties)."""
    from pyspark.sql import Window

    sh = _spread(docs).select(
        "source",
        F.explode(
            F.sequence(F.lit(1), F.greatest(F.length("text") - (n - 1), F.lit(1)))
        ).alias("i"),
        "text",
    ).select("source", F.expr(f"substr(text, i, {n})").alias("s"))
    hashes = sh.select(
        "source", _hex13("s").alias("h")
    ).distinct()
    lvl1 = (
        hashes.withColumn("shard", F.col("h") % 64)
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("source", "shard").orderBy("h")
            ),
        )
        .filter(F.col("rn") <= k)
        .drop("shard", "rn")
    )
    return (
        lvl1.withColumn(
            "rn", F.row_number().over(Window.partitionBy("source").orderBy("h"))
        )
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def kmv_source_overlap(docs: DataFrame, k: int = KMV_K, n: int = 16) -> DataFrame:
    """Pairwise cross-source content overlap from per-source KMV
    sketches (the theta-sketch set-operation pattern, Beyer et al.
    2007): for each source pair, the k smallest hashes of the UNION of
    the two sketches estimate the union cardinality, and the fraction
    of those present in BOTH sketches estimates Jaccard —
    (source_a, source_b, k_used, n_common, est_jaccard, est_union,
    est_intersection).

    The whole pair stage runs on sketches (<= k rows per source), so
    after the one linear sketch-build pass the overlap matrix costs
    O(|sources|^2 * k) — constant in corpus size.  All arithmetic is
    integer except the final round(n_common/k_used, 6); the
    under-full branch (union sketch holds the whole universe) answers
    exactly, mirroring kmv_distinct_shingles."""
    from pyspark.sql import Window

    sk = kmv_source_sketches(docs, k=k, n=n)
    srcs = sk.select("source").distinct()
    pairs = (
        srcs.select(F.col("source").alias("source_a"))
        .join(
            srcs.select(F.col("source").alias("source_b")),
            F.col("source_a") < F.col("source_b"),
        )
    )
    ska = sk.select(F.col("source").alias("source_a"), "h")
    skb = sk.select(F.col("source").alias("source_b"), "h")
    u = (
        pairs.join(ska, "source_a").withColumn("in_a", F.lit(1)).withColumn("in_b", F.lit(0))
        .unionByName(
            pairs.join(skb, "source_b")
            .withColumn("in_a", F.lit(0))
            .withColumn("in_b", F.lit(1))
            .select("source_a", "source_b", "h", "in_a", "in_b")
        )
        .groupBy("source_a", "source_b", "h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    topu = (
        u.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("source_a", "source_b").orderBy("h")
            ),
        )
        .filter(F.col("rn") <= k)
    )
    agg = topu.groupBy("source_a", "source_b").agg(
        F.count(F.lit(1)).alias("k_used"),
        F.max("h").alias("kth_min"),
        F.sum((F.col("in_a") * F.col("in_b"))).alias("n_common"),
    )
    est_union = (
        F.when(
            (F.col("k_used") >= k) & (F.col("kth_min") > 0),
            F.expr(f"((k_used - 1) * {1 << 52}) div kth_min"),
        )
        .otherwise(F.col("k_used").cast("long"))
    )
    return agg.select(
        "source_a",
        "source_b",
        "k_used",
        "n_common",
        F.round(F.col("n_common") / F.col("k_used"), 6).alias("est_jaccard"),
        est_union.alias("est_union"),
        F.expr(
            f"(n_common * (CASE WHEN k_used >= {k} AND kth_min > 0"
            f" THEN ((k_used - 1) * {1 << 52}) div kth_min"
            " ELSE CAST(k_used AS BIGINT) END)) div k_used"
        ).alias("est_intersection"),
    )
