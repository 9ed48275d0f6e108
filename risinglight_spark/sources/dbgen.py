"""Distributed dbgen-faithful TPC-H generator (full original schema).

The reference's flagship corpus is real dbgen output: its CI replays
q1-q22 goldens over the checked-in SF-0.0001 .tbl slice
(reference: tests/sql/tpch/tbl, tests/sql/tpch/tpch.slt) and
tests/tpch-full.sh drives dbgen at SF1.  dbgen itself is not in this
container and the driver's parquet fixtures use a simplified schema
(no partsupp, fewer columns, synthetic value domains), so the
unadapted reference queries (notably q2/q11/q16/q20) cannot run on
them.  This module regenerates the corpus the Spark way:

- **Value distributions follow the public TPC-H specification**
  (clause 4.2): sparse order keys (8 of every 32), customers skipping
  every third key, the retail-price polynomial, the partsupp supplier
  rotation formula, date windows (orderdate in [1992-01-01,
  1998-08-02], ship/commit/receipt offsets), return-flag/line-status
  derivation against the 1995-06-17 current date, order status and
  total price aggregated from line items, spec word lists for types,
  containers, segments, priorities, ship modes/instructions, the
  92-color part-name vocabulary, and the 25 nations with their real
  region mapping.  Text comments are drawn from the spec's grammar
  vocabulary (so q13's '%special%requests%' and q9's '%green%'
  predicates hit realistic fractions), and supplier comments inject
  'Customer ... Complaints' / 'Recommends' at the spec rate of 5 per
  10,000 suppliers (q16's NOT-IN subquery).

- **Deterministic at any parallelism**: every "random" value is a
  pure function of the row key via xxhash64 (JVM-side, whole-stage
  codegen) — no RNG state, so regeneration on 1 core or 1000
  executors produces byte-identical tables.

- **Distributed**: each table is a spark.range() projection; only
  orders' status/total-price aggregation shuffles (one key-local
  groupBy of its own line items).  At SF1000 this is exactly how
  you'd burst-generate 100 TB of test data onto a cluster.
"""

from __future__ import annotations

import os
from datetime import date

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# --- spec word lists (TPC-H v3 clause 4.2.2.13 / appendix) -----------------

TYPE_S1 = ["STANDARD", "SMALL", "MEDIUM", "LARGE", "ECONOMY", "PROMO"]
TYPE_S2 = ["ANODIZED", "BURNISHED", "PLATED", "POLISHED", "BRUSHED"]
TYPE_S3 = ["TIN", "NICKEL", "BRASS", "STEEL", "COPPER"]
CONTAINER_S1 = ["SM", "LG", "MED", "JUMBO", "WRAP"]
CONTAINER_S2 = ["CASE", "BOX", "BAG", "JAR", "PKG", "PACK", "CAN", "DRUM"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "MACHINERY", "HOUSEHOLD"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
INSTRUCTIONS = ["DELIVER IN PERSON", "COLLECT COD", "NONE", "TAKE BACK RETURN"]
MODES = ["REG AIR", "AIR", "RAIL", "SHIP", "TRUCK", "MAIL", "FOB"]

# 92 part-name words (spec P_NAME list; includes 'green' for q9's
# '%green%' and 'forest' for q20's 'forest%').
NAME_WORDS = """almond antique aquamarine azure beige bisque black blanched
blue blush brown burlywood burnished chartreuse chiffon chocolate coral
cornflower cornsilk cream cyan dark deep dim dodger drab firebrick floral
forest frosted gainsboro ghost goldenrod green grey honeydew hot indian
ivory khaki lace lavender lawn lemon light lime linen magenta maroon medium
metallic midnight mint misty moccasin navajo navy olive orange orchid pale
papaya peach peru pink plum powder puff purple red rose rosy royal saddle
salmon sandy seashell sienna sky slate smoke snow spring steel tan thistle
tomato turquoise violet wheat white yellow""".split()

# Comment grammar vocabulary (spec 4.2.2.14 word classes, abridged but
# real): includes 'special' + 'requests' (q13), 'pending', 'express'.
COMMENT_WORDS = """the of to and in special pending unusual express furiously
carefully quickly blithely slyly regular final ironic even bold silent
daring brave quiet busy idle requests accounts asymptotes attainments
deposits dependencies excuses foxes ideas instructions packages pinto beans
platelets realms sentiments theodolites waters dolphins sheaves sauternes
warhorses orbits braids grouches escapades sleep wake cajole haggle nag
boost detect integrate print sublate solve affix dazzle wait among above
against along beneath beside""".split()

NATIONS = [  # (name, regionkey) — spec's 25 nations
    ("ALGERIA", 0), ("ARGENTINA", 1), ("BRAZIL", 1), ("CANADA", 1),
    ("EGYPT", 4), ("ETHIOPIA", 0), ("FRANCE", 3), ("GERMANY", 3),
    ("INDIA", 2), ("INDONESIA", 2), ("IRAN", 4), ("IRAQ", 4),
    ("JAPAN", 2), ("JORDAN", 4), ("KENYA", 0), ("MOROCCO", 0),
    ("MOZAMBIQUE", 0), ("PERU", 1), ("CHINA", 2), ("ROMANIA", 3),
    ("SAUDI ARABIA", 4), ("VIETNAM", 2), ("RUSSIA", 3),
    ("UNITED KINGDOM", 3), ("UNITED STATES", 1),
]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]

START_DATE = date(1992, 1, 1)
ORDER_DATE_SPAN = 2405  # ENDDATE - STARTDATE - 151 days (spec 4.2.3)


def _u(key: Column, salt: str, lo: int, hi: int) -> Column:
    """Deterministic uniform integer in [lo, hi]: a pure function of
    (key, salt) via xxhash64 — distributed-safe, no RNG state."""
    return (
        F.pmod(F.xxhash64(key.cast("long"), F.lit(salt)), F.lit(hi - lo + 1))
        + F.lit(lo)
    ).cast("long")


def _pick(key: Column, salt: str, words: list[str]) -> Column:
    arr = F.array(*[F.lit(w) for w in words])
    return F.element_at(arr, (_u(key, salt, 0, len(words) - 1) + 1).cast("int"))


def _comment(key: Column, salt: str, n_words: int) -> Column:
    return F.concat_ws(
        " ",
        *[
            _pick(key, f"{salt}_w{j}", COMMENT_WORDS)
            for j in range(n_words)
        ],
    )


def _vstring(key: Column, salt: str) -> Column:
    """Address-style pseudo-random string: base-36 of two hashes."""
    return F.concat(
        F.conv(F.abs(F.xxhash64(key.cast("long"), F.lit(salt))).cast("string"), 10, 36),
        F.lit(" "),
        F.conv(F.abs(F.xxhash64(key.cast("long"), F.lit(salt + "2"))).cast("string"), 10, 36),
    )


def _phone(nationkey: Column, key: Column, salt: str) -> Column:
    """Spec phone format: CC-XXX-XXX-XXXX with CC = nationkey + 10."""
    return F.format_string(
        "%d-%d-%d-%d",
        (nationkey + 10).cast("int"),
        _u(key, salt + "a", 100, 999).cast("int"),
        _u(key, salt + "b", 100, 999).cast("int"),
        _u(key, salt + "c", 1000, 9999).cast("int"),
    )


def _retailprice(partkey: Column) -> Column:
    # spec: (90000 + ((partkey/10) mod 20001) + 100*(partkey mod 1000))/100
    return (
        F.lit(90000)
        + F.pmod(F.floor(partkey / 10), F.lit(20001))
        + 100 * F.pmod(partkey, F.lit(1000))
    ).cast("double") / 100.0


def _ps_suppkey(partkey: Column, j, n_supp: int) -> Column:
    # spec partsupp rotation: ((p + j*(S/4 + (p-1)/S)) mod S) + 1
    s4 = max(n_supp // 4, 1)
    jcol = j if isinstance(j, Column) else F.lit(j)
    return (
        F.pmod(
            partkey + jcol * (F.lit(s4) + F.floor((partkey - 1) / n_supp)),
            F.lit(n_supp),
        )
        + 1
    ).cast("long")


def _money(key: Column, salt: str, lo_cents: int, hi_cents: int) -> Column:
    return _u(key, salt, lo_cents, hi_cents).cast("double") / 100.0


def _part_name(key: Column) -> Column:
    """5 DISTINCT words from the 92-word list: start index + stride
    coprime to 92 (odd, not a multiple of 23) walks 5 distinct slots."""
    n = len(NAME_WORDS)
    start = _u(key, "pname_s", 0, n - 1)
    stride_raw = _u(key, "pname_t", 0, 44) * 2 + 1  # odd in [1, 89]
    stride = F.when(F.pmod(stride_raw, F.lit(23)) == 0, stride_raw + 2).otherwise(
        stride_raw
    )
    arr = F.array(*[F.lit(w) for w in NAME_WORDS])
    return F.concat_ws(
        " ",
        *[
            F.element_at(
                arr, (F.pmod(start + j * stride, F.lit(n)) + 1).cast("int")
            )
            for j in range(5)
        ],
    )


def _sizes(sf: float) -> dict[str, int]:
    return {
        "supplier": max(int(10_000 * sf), 4),
        "part": max(int(200_000 * sf), 20),
        "customer": max(int(150_000 * sf), 15),
        "orders": max(int(1_500_000 * sf), 150),
        "clerks": max(int(1_000 * sf), 1),
    }


TPCH_TABLES = (
    "region", "nation", "supplier", "part",
    "partsupp", "customer", "orders", "lineitem",
)


def generate(
    spark: SparkSession,
    out_dir: str,
    sf: float,
    partitions: int | None = None,
    reuse: bool = False,
) -> dict[str, str]:
    """Generate all 8 TPC-H tables (full original schema) at scale
    factor ``sf`` into ``out_dir/{table}.parquet``; returns the path
    map.  Deterministic: same sf -> identical data, any parallelism.
    With ``reuse=True``, a fully-written prior corpus at ``out_dir``
    (every table dir carrying its _SUCCESS marker) is returned as-is —
    generation is deterministic per sf, so repeat bench runs skip the
    minutes of corpus I/O."""
    if reuse:
        paths = {
            t: os.path.join(out_dir, f"{t}.parquet") for t in TPCH_TABLES
        }
        if all(
            os.path.exists(os.path.join(p, "_SUCCESS"))
            for p in paths.values()
        ):
            return paths
    n = _sizes(sf)
    parts = partitions or max(
        int(spark.conf.get("spark.sql.shuffle.partitions", "32")), 4
    )
    os.makedirs(out_dir, exist_ok=True)
    paths: dict[str, str] = {}

    def write(name: str, df: DataFrame, n_parts: int) -> None:
        p = os.path.join(out_dir, f"{name}.parquet")
        # coalesce, never repartition: every table is a spark.range
        # projection (already evenly partitioned, values pure functions
        # of key), so the only thing a full shuffle bought here was the
        # output file count — at SF100 that shuffle spills ~2x the
        # corpus (~70 GB) to local disk and killed the stretch probe.
        # coalesce bounds the file count with zero shuffle I/O and
        # leaves row values and hash-checked content identical.
        df.coalesce(n_parts).write.mode("overwrite").parquet(p)
        paths[name] = p

    region = spark.createDataFrame(
        [(i, r, f"spec region {r.lower()}") for i, r in enumerate(REGIONS)],
        "r_regionkey int, r_name string, r_comment string",
    )
    write("region", region, 1)

    nation = spark.createDataFrame(
        [
            (i, nm, rk, f"spec nation {nm.lower()}")
            for i, (nm, rk) in enumerate(NATIONS)
        ],
        "n_nationkey int, n_name string, n_regionkey int, n_comment string",
    )
    write("nation", nation, 1)

    sk = F.col("id") + 1
    supplier = spark.range(n["supplier"]).select(
        sk.alias("s_suppkey"),
        F.format_string("Supplier#%09d", sk.cast("int")).alias("s_name"),
        _vstring(sk, "saddr").alias("s_address"),
        _u(sk, "snat", 0, 24).cast("int").alias("s_nationkey"),
        _phone(_u(sk, "snat", 0, 24), sk, "sphone").alias("s_phone"),
        _money(sk, "sbal", -99999, 999999).alias("s_acctbal"),
        # spec 4.2.3: 5 per 10,000 suppliers carry Complaints, 5
        # Recommends, embedded mid-comment
        F.when(
            F.pmod(sk, F.lit(2000)) == 17,
            F.concat(
                _comment(sk, "scom_a", 3),
                F.lit(" Customer unusual Complaints "),
                _comment(sk, "scom_b", 3),
            ),
        )
        .when(
            F.pmod(sk, F.lit(2000)) == 1013,
            F.concat(
                _comment(sk, "scom_a", 3),
                F.lit(" Customer bold Recommends "),
                _comment(sk, "scom_b", 3),
            ),
        )
        .otherwise(_comment(sk, "scom", 8))
        .alias("s_comment"),
    )
    write("supplier", supplier, 1)

    pk = F.col("id") + 1
    mfgr = _u(pk, "pmfgr", 1, 5)
    part = spark.range(n["part"]).select(
        pk.alias("p_partkey"),
        _part_name(pk).alias("p_name"),
        F.format_string("Manufacturer#%d", mfgr.cast("int")).alias("p_mfgr"),
        F.format_string(
            "Brand#%d%d", mfgr.cast("int"), _u(pk, "pbrand", 1, 5).cast("int")
        ).alias("p_brand"),
        F.concat_ws(
            " ",
            _pick(pk, "pt1", TYPE_S1),
            _pick(pk, "pt2", TYPE_S2),
            _pick(pk, "pt3", TYPE_S3),
        ).alias("p_type"),
        _u(pk, "psize", 1, 50).cast("int").alias("p_size"),
        F.concat_ws(
            " ", _pick(pk, "pc1", CONTAINER_S1), _pick(pk, "pc2", CONTAINER_S2)
        ).alias("p_container"),
        _retailprice(pk).alias("p_retailprice"),
        _comment(pk, "pcom", 5).alias("p_comment"),
    )
    write("part", part, max(parts // 4, 1))

    psk = F.col("p_partkey")
    partsupp = (
        part.select("p_partkey")
        .withColumn("j", F.explode(F.array(*[F.lit(i) for i in range(4)])))
        .select(
            psk.alias("ps_partkey"),
            _ps_suppkey(psk, F.col("j"), n["supplier"]).alias("ps_suppkey"),
            _u(psk * 4 + F.col("j"), "psavail", 1, 9999)
            .cast("int")
            .alias("ps_availqty"),
            _money(psk * 4 + F.col("j"), "pscost", 100, 100000).alias(
                "ps_supplycost"
            ),
            _comment(psk * 4 + F.col("j"), "pscom", 12).alias("ps_comment"),
        )
    )
    write("partsupp", partsupp, max(parts // 4, 1))

    ck = F.col("id") + 1
    cnat = _u(ck, "cnat", 0, 24)
    customer = spark.range(n["customer"]).select(
        ck.alias("c_custkey"),
        F.format_string("Customer#%09d", ck.cast("int")).alias("c_name"),
        _vstring(ck, "caddr").alias("c_address"),
        cnat.cast("int").alias("c_nationkey"),
        _phone(cnat, ck, "cphone").alias("c_phone"),
        _money(ck, "cbal", -99999, 999999).alias("c_acctbal"),
        _pick(ck, "cseg", SEGMENTS).alias("c_mktsegment"),
        _comment(ck, "ccom", 9).alias("c_comment"),
    )
    write("customer", customer, max(parts // 4, 1))

    # orders base: sparse keys (8 of every 32), custkey never
    # divisible by 3 (spec 4.2.3)
    oi = F.col("id")  # 0-based order index
    ok = (F.floor(oi / 8) * 32 + F.pmod(oi, F.lit(8)) + 1).cast("long")
    n_cust_used = (n["customer"] // 3) * 2
    cu = _u(ok, "ocust", 0, max(n_cust_used - 1, 0))
    ocust = (3 * F.floor(cu / 2) + F.pmod(cu, F.lit(2)) + 1).cast("long")
    obase = spark.range(n["orders"]).select(
        ok.alias("o_orderkey"),
        ocust.alias("o_custkey"),
        F.date_add(
            F.lit(START_DATE), _u(ok, "odate", 0, ORDER_DATE_SPAN).cast("int")
        ).alias("o_orderdate"),
        _pick(ok, "oprio", PRIORITIES).alias("o_orderpriority"),
        F.format_string(
            "Clerk#%09d", _u(ok, "oclerk", 1, n["clerks"]).cast("int")
        ).alias("o_clerk"),
        F.lit(0).alias("o_shippriority"),
        _comment(ok, "ocom", 7).alias("o_comment"),
    )

    # lineitem: 1-7 lines per order; part/supplier via the partsupp
    # rotation so every (l_partkey, l_suppkey) exists in partsupp
    lk = F.col("o_orderkey")
    li = obase.select("o_orderkey", "o_orderdate").withColumn(
        "l_linenumber",
        F.explode(
            F.sequence(F.lit(1), _u(lk, "lcnt", 1, 7).cast("int"))
        ),
    )
    lid = lk * 8 + F.col("l_linenumber")  # per-line hash key
    lpart = _u(lid, "lpart", 1, n["part"])
    lqty = _u(lid, "lqty", 1, 50)
    lship = F.date_add(F.col("o_orderdate"), _u(lid, "lsdate", 1, 121).cast("int"))
    lineitem = li.select(
        F.col("o_orderkey").alias("l_orderkey"),
        lpart.alias("l_partkey"),
        _ps_suppkey(lpart, _u(lid, "lsupp", 0, 3), n["supplier"]).alias(
            "l_suppkey"
        ),
        F.col("l_linenumber").cast("int"),
        lqty.cast("double").alias("l_quantity"),
        (lqty.cast("double") * _retailprice(lpart)).alias("l_extendedprice"),
        (_u(lid, "ldisc", 0, 10).cast("double") / 100.0).alias("l_discount"),
        (_u(lid, "ltax", 0, 8).cast("double") / 100.0).alias("l_tax"),
        lship.alias("l_shipdate"),
        F.date_add(F.col("o_orderdate"), _u(lid, "lcdate", 30, 90).cast("int")).alias(
            "l_commitdate"
        ),
        F.date_add(lship, _u(lid, "lrdate", 1, 30).cast("int")).alias(
            "l_receiptdate"
        ),
        _pick(lid, "linstr", INSTRUCTIONS).alias("l_shipinstruct"),
        _pick(lid, "lmode", MODES).alias("l_shipmode"),
        _comment(lid, "lcom", 6).alias("l_comment"),
    )
    current = F.lit(date(1995, 6, 17))
    lineitem = lineitem.select(
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
        F.when(
            F.col("l_receiptdate") <= current,
            F.when(F.pmod(F.xxhash64("l_orderkey", F.col("l_linenumber"), F.lit("lrf")), F.lit(2)) == 0, "R").otherwise("A"),
        )
        .otherwise("N")
        .alias("l_returnflag"),
        F.when(F.col("l_shipdate") > current, "O").otherwise("F").alias(
            "l_linestatus"
        ),
        "l_shipdate",
        "l_commitdate",
        "l_receiptdate",
        "l_shipinstruct",
        "l_shipmode",
        "l_comment",
    )
    write("lineitem", lineitem, parts)

    # orders closes over its line items: status + total price
    # (spec: O_TOTALPRICE = sum(extprice * (1+tax) * (1-discount)))
    lagg = (
        spark.read.parquet(paths["lineitem"])
        .groupBy("l_orderkey")
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 + F.col("l_tax"))
                    * (1 - F.col("l_discount"))
                ),
                2,
            ).alias("o_totalprice"),
            F.count(F.when(F.col("l_linestatus") == "F", 1)).alias("nf"),
            F.count("*").alias("nl"),
        )
        .select(
            F.col("l_orderkey").alias("o_orderkey"),
            "o_totalprice",
            F.when(F.col("nf") == F.col("nl"), "F")
            .when(F.col("nf") == 0, "O")
            .otherwise("P")
            .alias("o_orderstatus"),
        )
    )
    orders = obase.join(lagg, "o_orderkey").select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
        "o_clerk",
        "o_shippriority",
        "o_comment",
    )
    write("orders", orders, max(parts // 2, 1))
    return paths


def main() -> None:
    import sys

    from risinglight_spark.session import get_spark

    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 0.01
    out = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/dbgen_sf{sf}"
    spark = get_spark(app_name="dbgen_spark")
    paths = generate(spark, out, sf)
    for t, p in paths.items():
        print(t, p)


if __name__ == "__main__":
    main()
