"""Data-governance query family — declarative constraint auditing and
privacy pseudonymization.

The reference's only "validation" is dtype coercion and inf→NULL
cleanup (SURVEY.md §2.2 P4); a production engine fronting a 100 TB
training corpus needs the two governance passes every ingest runs:

- ``constraint_audit`` — a Deequ/dbt-test-style constraint suite
  evaluated as ONE fused aggregate pass (each rule is a conditional
  count inside the same scan; N rules cost one pass, not N).
- ``pseudonymize_users`` — GDPR-style keyed pseudonymization of user
  identifiers (salted SHA-256), with injectivity (no pseudonym
  collision) and exact pseudonym bytes pinned in-oracle.  SHA-256 is
  bit-identical across engines, so the check rides the normal value
  hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_lab_three_spark.queries import register
from big_data_lab_three_spark.sources import table

#: Fixed demo salt — a real deployment injects this from a secret
#: store; the VALUE is irrelevant to the machinery, determinism is.
_SALT = "corpus-v1|"


@register(
    "constraint_audit",
    ids="quality: Deequ/dbt-style declarative constraint suite, one fused pass",
    oracle="""
SELECT c.constraint_name,
       c.n_violations,
       c.n_violations = 0 AS passed
FROM (
    SELECT 'orderkey_not_null' AS constraint_name,
           CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_violations
    FROM lineitem
    UNION ALL
    SELECT 'quantity_in_1_50',
           CAST(sum(CASE WHEN l_quantity < 1 OR l_quantity > 50
                         THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'price_positive',
           CAST(sum(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END)
                AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'discount_in_0_to_10pct',
           CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 0.1
                         THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'returnflag_in_domain',
           CAST(sum(CASE WHEN l_returnflag NOT IN ('A', 'N', 'R')
                         THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'shipdate_in_range',
           CAST(sum(CASE WHEN l_shipdate < TIMESTAMP '1992-01-01'
                           OR l_shipdate >= TIMESTAMP '1999-01-01'
                         THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem
) c
ORDER BY c.constraint_name
""",
)
def constraint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-contract audit over lineitem: key completeness,
    numeric ranges, a categorical domain, and a date window — the
    Deequ / dbt-tests suite an ingest job gates on before admitting a
    batch.

    Scale shape: the oracle spells each rule as its own scan for
    SQL clarity, but the Spark plan evaluates ALL rules as conditional
    sums inside ONE aggregate over ONE scan (the fused-profile
    technique of ``null_profile``/``summary_stats``) and then unpivots
    the 1×N result — adding a rule costs one more codegen expression,
    never another pass.  At 100 TB: one scan, a 6-value reduce."""
    li = table(spark, sf_dir, "lineitem")
    rules: list[tuple[str, F.Column]] = [
        ("orderkey_not_null", F.col("l_orderkey").isNull()),
        (
            "quantity_in_1_50",
            (F.col("l_quantity") < 1) | (F.col("l_quantity") > 50),
        ),
        ("price_positive", F.col("l_extendedprice") <= 0),
        (
            "discount_in_0_to_10pct",
            (F.col("l_discount") < 0) | (F.col("l_discount") > 0.1),
        ),
        (
            "returnflag_in_domain",
            ~F.col("l_returnflag").isin("A", "N", "R"),
        ),
        (
            "shipdate_in_range",
            (F.col("l_shipdate") < F.lit("1992-01-01").cast("timestamp"))
            | (
                F.col("l_shipdate")
                >= F.lit("1999-01-01").cast("timestamp")
            ),
        ),
    ]
    # NULL-safe: a NULL predicate result (NULL operand in a range rule)
    # coalesces to 0 — NOT a violation — exactly the oracle's
    # CASE WHEN <null> THEN 1 ELSE 0 fall-through; completeness rules
    # catch NULLs explicitly via isNull.
    wide = li.agg(
        *[
            F.sum(F.coalesce(cond.cast("long"), F.lit(0))).alias(name)
            for name, cond in rules
        ]
    )
    tall = wide.select(
        F.inline(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("constraint_name"),
                        F.col(name).alias("n_violations"),
                    )
                    for name, _ in rules
                ]
            )
        )
    )
    return tall.select(
        "constraint_name",
        "n_violations",
        (F.col("n_violations") == 0).alias("passed"),
    ).orderBy("constraint_name")


@register(
    "pseudonymize_users",
    ids="privacy: salted-SHA-256 pseudonymization with in-oracle injectivity proof",
    oracle="""
WITH p AS (
    SELECT event_type,
           user_id,
           sha256('corpus-v1|' || CAST(user_id AS VARCHAR)) AS pseudo
    FROM events
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(count(DISTINCT pseudo) AS BIGINT) AS n_pseudonyms,
       count(DISTINCT user_id) = count(DISTINCT pseudo) AS injective,
       CAST(bit_xor(CAST(('0x' || substr(pseudo, 1, 15)) AS BIGINT))
           AS BIGINT) AS pseudo_checksum
FROM p
GROUP BY event_type
ORDER BY event_type
""",
)
def pseudonymize_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GDPR-style pseudonymization of the event stream's user ids: the
    identifier is replaced by a salted SHA-256 (consistent across every
    table keyed by the same id, irreversible without the salt), which
    keeps sessionization/retention joins working on the pseudonym.

    In-oracle proofs, not promises: ``injective`` pins that the mapping
    collided nowhere (distinct users == distinct pseudonyms), and
    ``pseudo_checksum`` (order-insensitive xor of truncated digests)
    pins the EXACT pseudonym bytes — SHA-256 is engine-portable, so a
    salt or encoding drift between runs fails the value hash.  Scale
    shape: the hash is a map-side projection; the census is one
    ~|event_types|-group aggregate with distinct-count expands bounded
    by the user dimension."""
    ev = table(spark, sf_dir, "events").select(
        "event_type",
        "user_id",
        F.sha2(
            F.concat(F.lit(_SALT), F.col("user_id").cast("string")), 256
        ).alias("pseudo"),
    )
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.countDistinct("pseudo").alias("n_pseudonyms"),
            (
                F.countDistinct("user_id") == F.countDistinct("pseudo")
            ).alias("injective"),
            F.expr(
                "bit_xor(cast(conv(substring(pseudo, 1, 15), 16, 10)"
                " as bigint))"
            ).alias("pseudo_checksum"),
        )
        .orderBy("event_type")
    )


@register(
    "k_anonymity_census",
    ids="privacy: k-anonymity equivalence-class census over quasi-identifiers (re-identification risk audit)",
    oracle="""
WITH classes AS (
    SELECT c_nationkey, c_mktsegment,
           CAST(floor(c_acctbal / 2000) AS BIGINT) AS acctbal_band,
           CAST(count(*) AS BIGINT) AS class_size
    FROM customer
    GROUP BY 1, 2, 3
)
SELECT CASE WHEN class_size = 1 THEN '1'
            WHEN class_size <= 4 THEN '2-4'
            WHEN class_size <= 9 THEN '5-9'
            ELSE '10+' END AS size_band,
       CAST(count(*) AS BIGINT) AS n_classes,
       CAST(sum(class_size) AS BIGINT) AS n_records,
       CAST(min(class_size) AS BIGINT) AS min_class_size
FROM classes
GROUP BY 1
ORDER BY size_band
""",
)
def k_anonymity_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit (Sweeney 2002) over the quasi-identifier tuple
    (nation, market segment, account-balance band): every record in an
    equivalence class of size k is re-identifiable to 1-in-k, so the
    class-size distribution IS the re-identification risk profile — the
    '1' band is the set of uniquely-identifiable records a release
    policy must suppress or generalize.

    Scale shape: one partial-aggregating shuffle keyed by the QI tuple
    (bounded by the QI domain, not the record count), then a ~4-row
    band rollup.  The acctbal band uses ``floor(x / 2000)`` — exact in
    IEEE doubles on both engines — so class membership is
    engine-portable without rounding conventions."""
    c = table(spark, sf_dir, "customer")
    classes = c.groupBy(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 2000).cast("long").alias(
            "acctbal_band"
        ),
    ).agg(F.count(F.lit(1)).alias("class_size"))
    band = (
        F.when(F.col("class_size") == 1, "1")
        .when(F.col("class_size") <= 4, "2-4")
        .when(F.col("class_size") <= 9, "5-9")
        .otherwise("10+")
    )
    return (
        classes.groupBy(band.alias("size_band"))
        .agg(
            F.count(F.lit(1)).alias("n_classes"),
            F.sum("class_size").alias("n_records"),
            F.min("class_size").alias("min_class_size"),
        )
        .orderBy("size_band")
    )


@register(
    "dp_count_release",
    ids="privacy: differentially-private count release — seeded Laplace noise via md5 inverse-CDF (deterministic, engine-portable)",
    oracle="""
WITH agg AS (
    SELECT c_nationkey,
           CAST(count(*) AS BIGINT) AS n_true
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_nationkey
), seeded AS (
    SELECT c_nationkey, n_true,
           CAST(('0x' || substr(md5('dp-v1|' || CAST(c_nationkey AS VARCHAR)),
                                1, 13)) AS BIGINT)
               / 4503599627370496.0 AS u
    FROM agg
)
SELECT c_nationkey, n_true,
       round(n_true - sign(u - 0.5)
             * ln(greatest(1 - 2 * abs(u - 0.5), 1e-15)), 4) AS dp_count
FROM seeded
ORDER BY c_nationkey
""",
)
def dp_count_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private per-nation order counts: Laplace(b=1/ε,
    ε=1) noise via the inverse-CDF transform ``−b·sign(u−½)·
    ln(1−2|u−½|)``, with u drawn from a SEEDED md5 of the release key —
    deterministic, so the release is reproducible AND value-oracle
    checkable, exactly how a production pipeline derives per-key noise
    from a release-version seed (new release ⇒ new seed ⇒ fresh draw).
    n_true rides along for audit; a real release drops it.

    Engine portability: the md5-hex → BIGINT → [0,1) uniform is
    bit-identical on both engines (the established fingerprint idiom);
    ``ln`` is the one transcendental — same class as BM25's idf, where
    round(4) has held across every SF and round.  The ``greatest(...,
    1e-15)`` guard caps the one-in-2⁵² u≈0 draw instead of emitting
    ±inf.

    Scale shape: the noise math is a pure projection on an
    ~|nations|-row aggregate; the only real work is the orders⊳customer
    join, which broadcasts nothing here but partial-aggregates the
    count before the exchange."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    agg = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_true"))
    )
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("dp-v1|"),
                        F.col("c_nationkey").cast("string"),
                    )
                ),
                1,
                13,
            ),
            16,
            10,
        ).cast("double")
        / F.lit(4503599627370496.0)
    )
    centered = u - F.lit(0.5)
    noise = -F.signum(centered) * F.log(
        F.greatest(F.lit(1.0) - 2 * F.abs(centered), F.lit(1e-15))
    )
    return agg.select(
        "c_nationkey",
        "n_true",
        F.round(F.col("n_true") + noise, 4).alias("dp_count"),
    ).orderBy("c_nationkey")
