"""Mergeable sketch operators with engine-reproducible hashing.

Spark ships HLL++ (approx_count_distinct) and KLL-ish percentile_approx —
both used by the sketch_* contract entries. This module adds the classic
COUNT-MIN SKETCH (Cormode & Muthukrishnan 2005) for heavy-hitter /
frequency estimation, built from the repo's cross-engine md5-derived
64-bit hash so an external engine (the DuckDB oracles here, or any SQL
system) can reproduce the sketch — and therefore the ESTIMATES —
bit-for-bit. That turns the usual "trust the bound" sketch check into an
exact value-hash contract.

Scale shape: the sketch is a single groupBy over (depth x occurrences)
hash rows into depth*width cells — fixed-size state (e.g. 4 x 1024
counters), perfectly map-side combinable, merge = cell-wise sum. At
100 TB the counter table is KBs regardless of corpus size; estimates
join the tiny counter table broadcast-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from vivace_graph_v3_spark.pipeline.dedup import md5_hash64


def cms_bucket(col, j: int, width: int):
    """Row-j bucket of a value: pmod(md5_64('j|' || value), width). The
    'j|' prefix derives depth independent-enough hash functions from one
    base hash, identically reproducible in SQL."""
    return F.pmod(md5_hash64(F.concat(F.lit(f"{j}|"), col)), F.lit(width))


def cms_build(df: DataFrame, col: str, *, depth: int = 4,
              width: int = 1024) -> DataFrame:
    """Build the counter table (j, bucket, cnt) over every row of ``col``
    (one occurrence = one increment per hash row). depth*width cells total;
    absent cells mean 0."""
    hashes = F.array(*[
        F.struct(F.lit(j).alias("j"),
                 cms_bucket(F.col(col), j, width).alias("bucket"))
        for j in range(depth)])
    return (df.select(F.explode(hashes).alias("h"))
            .groupBy(F.col("h.j").alias("j"), F.col("h.bucket").alias("bucket"))
            .agg(F.count(F.lit(1)).alias("cnt")))


def cms_estimate(cms: DataFrame, items: DataFrame, col: str, *,
                 depth: int = 4, width: int = 1024) -> DataFrame:
    """Point-estimate every row of ``items[col]`` against a built sketch:
    est = min over hash rows j of cnt[j][bucket_j(item)]. Returns the
    items frame plus an ``est`` column (BIGINT; never underestimates).
    The counter table is depth*width rows — broadcast it."""
    probes = items.select(
        F.col(col),
        F.explode(F.array(*[
            F.struct(F.lit(j).alias("j"),
                     cms_bucket(F.col(col), j, width).alias("bucket"))
            for j in range(depth)])).alias("h"))
    joined = probes.join(F.broadcast(cms),
                         (probes["h.j"] == cms["j"])
                         & (probes["h.bucket"] == cms["bucket"]), "left")
    return (joined.groupBy(col)
            .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est")))


# ---------------------------------------------------------------------------
# Bloom filter (Bloom 1970) with engine-reproducible integer hashing
# ---------------------------------------------------------------------------

_BLOOM_MULTS = (2654435761, 2246822519, 3266489917, 668265263, 374761393)
_BLOOM_PRIME = 2147483647  # 2^31 - 1


def bloom_positions(col, k: int, m_bits: int) -> list:
    """The k bit positions of an integer key: h_j(x) = ((x+1) * A_j mod P)
    mod m with Knuth/xxhash multiplicative constants and P = 2^31-1 —
    pure integer arithmetic any engine reproduces exactly. Keys are
    shifted +1 so key 0 doesn't map every hash to 0.

    BIGINT bound: (x+1)*A_j must stay under 2^63, i.e. keys below ~2.8e9;
    wider key domains should pre-fold with a 64-bit hash (md5_hash64)
    before entering — noted rather than silently widened because the
    narrow form keeps the whole contract in one multiply."""
    if k > len(_BLOOM_MULTS):
        raise ValueError(f"k <= {len(_BLOOM_MULTS)} supported")
    x = F.col(col) if isinstance(col, str) else col
    return [(((x + 1) * F.lit(a)) % F.lit(_BLOOM_PRIME)) % F.lit(m_bits)
            for a in _BLOOM_MULTS[:k]]


def bloom_build(df: DataFrame, col: str, *, k: int = 3,
                m_bits: int = 4096) -> DataFrame:
    """Build the bloom bit set of an integer key column: the DISTINCT bit
    positions hit by any member — at most ``m_bits`` rows regardless of
    input size (one map-side-combined distinct), so the result broadcasts
    anywhere. Returns a single column (pos)."""
    x = F.col(col) if isinstance(col, str) else col
    pos = F.explode(F.array(*bloom_positions(col, k, m_bits))).alias("pos")
    # NULL keys hash to NULL positions, which would add a phantom NULL
    # row to the bit set (inflating bits_set) while never matching any
    # probe — drop them; membership of NULL is meaningless in a bloom
    return df.filter(x.isNotNull()).select(pos).distinct()


def bloom_probe(bits: DataFrame, probes: DataFrame, col: str, *,
                k: int = 3, m_bits: int = 4096,
                id_cols: list[str] | None = None) -> DataFrame:
    """Probe the filter: a key is 'maybe present' iff ALL k of its
    positions are set. The bit set (<= m_bits rows) is broadcast, so the
    probe side — the 100 TB side — is never shuffled: explode each probe
    into its k positions, broadcast-semi-count the hits, keep rows where
    hits == k. Returns the probe rows plus a boolean ``maybe``."""
    id_cols = id_cols or [col]
    pos = F.explode(F.array(*bloom_positions(col, k, m_bits))).alias("pos")
    hit = (probes.select(*[F.col(c) for c in id_cols], pos)
           .join(F.broadcast(bits.withColumn("__set", F.lit(1))),
                 "pos", "left")
           .groupBy(*id_cols)
           .agg((F.sum(F.coalesce(F.col("__set"), F.lit(0)))
                 == F.lit(k)).alias("maybe")))
    return hit


def bloom_fpr_audit(members: DataFrame, probes: DataFrame, col: str, *,
                    k: int = 3, m_bits: int = 4096) -> DataFrame:
    """End-to-end bloom audit: build the filter from ``members``, probe
    with ``probes`` (which must carry a boolean ``is_member`` ground
    truth), and report the single-row summary
    (m_bits, k, bits_set, n_probes, n_members, n_false_pos, fpr_ppm):
    fpr = false positives / true negatives, integer round-half-up ppm.
    The join-side asymmetry is the point at scale: the filter is
    O(m_bits) state broadcast to the probe scan — the standard semi-join
    pruning pattern (partition pruning's runtime cousin)."""
    bits = bloom_build(members, col, k=k, m_bits=m_bits)
    probed = bloom_probe(bits, probes, col, k=k, m_bits=m_bits,
                         id_cols=[col, "is_member"])
    summary = (probed.agg(
        F.count(F.lit(1)).alias("n_probes"),
        F.sum(F.when(F.col("is_member"), 1).otherwise(0))
        .cast("long").alias("n_members"),
        F.sum(F.when(F.col("maybe") & ~F.col("is_member"), 1)
              .otherwise(0)).cast("long").alias("n_false_pos"),
        F.sum(F.when(~F.col("maybe") & F.col("is_member"), 1)
              .otherwise(0)).cast("long").alias("n_false_neg"))
        .crossJoin(F.broadcast(
            bits.agg(F.count(F.lit(1)).cast("long").alias("bits_set")))))
    fpr = F.expr("CASE WHEN n_probes > n_members THEN"
                 " (n_false_pos * 2000000 + (n_probes - n_members))"
                 " div ((n_probes - n_members) * 2) ELSE 0 END")
    return summary.select(
        F.lit(m_bits).cast("long").alias("m_bits"),
        F.lit(k).cast("long").alias("k"),
        "bits_set", "n_probes", "n_members", "n_false_pos", "n_false_neg",
        fpr.cast("long").alias("fpr_ppm"))


def hll_registers(df: DataFrame, col: str, *, m: int = 64,
                  rho_cap: int = 40) -> DataFrame:
    """HyperLogLog register table (Flajolet et al. 2007) with
    engine-reproducible hashing: register j = pmod(md5h(v), 2^62) % m,
    rank rho = 1 + index of the lowest set bit of the remaining hash
    bits (the lowest-set-bit isolate ``w & -w`` is an exact power of
    two, so ``log2`` of it is IEEE-exact in any engine — no bit-scan
    loop). rho caps at ``rho_cap`` so downstream 2^(K - M) sums stay in
    BIGINT; the cap binds with probability 2^-rho_cap per item — never,
    below ~2^35 distinct.

    Fixed-size mergeable state: one groupBy into m cells (map-side
    combined; merge = cell-wise max), KBs at any corpus size. Returns
    all m rows (register, m_rho), zero for never-hit registers."""
    spark = df.sparkSession
    hh = F.pmod(md5_hash64(F.col(col).cast("string")),
                F.lit(4611686018427387904))  # 2^62
    hits = (df.select(hh.alias("hh"))
            .select(F.expr(f"hh % {m}").alias("register"),
                    F.expr(f"hh div {m}").alias("w"))
            .select("register",
                    F.when(F.col("w") == 0, F.lit(rho_cap))
                    .otherwise(F.least(
                        F.round(F.log2(F.expr("w & -w"))).cast("int") + 1,
                        F.lit(rho_cap))).alias("rho"))
            .groupBy("register").agg(F.max("rho").alias("m_rho")))
    full = spark.range(m).select(F.col("id").cast("long").alias("register"))
    return (full.join(hits, "register", "left")
            .select("register",
                    F.coalesce(F.col("m_rho"), F.lit(0)).cast("long")
                    .alias("m_rho")))


def hll_estimate_audit(df: DataFrame, col: str, *, m: int = 64,
                       rho_cap: int = 40) -> DataFrame:
    """HLL estimate vs EXACT distinct count, cross-engine exact: from
    the register table above, K = max register rank, S = sum of
    2^(K - M_j) over all m registers (exact BIGINT — this is the
    harmonic-mean denominator scaled by 2^K), and the raw HLL estimate
    alpha_m * m^2 * 2^K / S as one fixed-order double expression —
    the "is approx_count_distinct trustworthy at this cardinality"
    audit, where the oracle reproduces every register bit. Returns one
    row (m, n_exact, n_zero, k_max, s_scaled, est)."""
    regs = hll_registers(df, col, m=m, rho_cap=rho_cap)
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))
    exact = df.select(F.countDistinct(F.col(col)).alias("n_exact"))
    summary = (regs.agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.sum(F.when(F.col("m_rho") == 0, 1).otherwise(0)).cast("long")
        .alias("n_zero"),
        F.max("m_rho").cast("long").alias("k_max"))
        .crossJoin(F.broadcast(
            regs.select(F.col("m_rho"))
            .crossJoin(regs.agg(F.max("m_rho").alias("k")))
            .select(F.expr("cast(pow(2.0, k - m_rho) as long)").alias("t"))
            .agg(F.sum("t").cast("long").alias("s_scaled")))))
    est = (F.round(F.lit(alpha * m * m)
                   * F.pow(F.lit(2.0), F.col("k_max").cast("double"))
                   / F.col("s_scaled").cast("double"), 6).alias("est"))
    return (summary.crossJoin(F.broadcast(exact))
            .select("m", "n_exact", "n_zero", "k_max", "s_scaled", est))
