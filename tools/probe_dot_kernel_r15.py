"""Round-15 kernel probe: what does one 64-term pinned-order cosine cost
per row, and do cheaper evaluation shapes stay BITWISE identical?

Variants, over the exact dedup_embedding_bucketed verify shape at sf0.1
(candidate id pairs joined back to embeddings, cosine >= theta):

  chain   — status quo: dot_expr/norm_expr unrolled 64-term chains
  hof     — F.aggregate(zip_with(...)) left fold, seeded with term 1
            (exactly the chain's association: ((t1+t2)+t3)+...)
  proj    — chain, but norms precomputed per SIDE before the join
            (already the case in the verify; matters for ivf_assign)

plus the ivf_assign_fixed shape (n x k cross join) with per-row norms
(status quo) vs per-side projected norms vs HOF.

Every variant's output is collected and compared BIT-FOR-BIT (struct
pack of every double) against the status quo before its timing counts.
"""

from __future__ import annotations

import struct
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from realtimevotingdataengineer_spark.functions import dot_expr, norm_expr
from realtimevotingdataengineer_spark.operators.similarity import (
    EMB_DIM,
    codebook_rung,
    probe_rung,
)
from realtimevotingdataengineer_spark.sources.tables import Tables

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def dot_hof(a: str, b: str) -> F.Column:
    """((t1 + t2) + t3) + ... — the chain's exact association, as an
    O(1)-size expression tree: zip_with products, aggregate seeded with
    element 1 over the tail (seed 0.0 would flip -0.0 sums to +0.0)."""
    z = F.zip_with(
        F.col(a), F.col(b), lambda x, y: x.cast("double") * y.cast("double")
    )
    return F.aggregate(
        F.slice(z, 2, EMB_DIM - 1), F.element_at(z, 1), lambda acc, v: acc + v
    )


def norm_hof(a: str) -> F.Column:
    return F.sqrt(dot_hof(a, a))


def bits(rows, cols):
    out = []
    for r in sorted(rows, key=lambda r: tuple(r[c] for c in cols if "id" in c)):
        key = []
        for c in cols:
            v = r[c]
            key.append(struct.pack(">d", v).hex() if isinstance(v, float) else v)
        out.append(tuple(key))
    return out


def timed(df, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    spark = (
        SparkSession.builder.appName("probe_dot_kernel")
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "4m")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    t = Tables(spark, SF_DIR)
    emb = t.embeddings

    n = emb.count()
    k, p = codebook_rung(n), probe_rung(n)
    print(f"n={n} k={k} p={p}")

    # ---- shape 1: ivf_assign cross join (n x k cosine rank) ----------
    cent = emb.filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cent_emb")
    )

    def assign_statusquo():
        c = emb.alias("c")
        cos = dot_expr("c.embedding", "cent_emb", EMB_DIM) / (
            norm_expr("c.embedding", EMB_DIM) * norm_expr("cent_emb", EMB_DIM)
        )
        return (
            c.crossJoin(F.broadcast(cent))
            .select(F.col("c.vec_id").alias("vec_id"), "cent_id", cos.alias("cos"))
        )

    def assign_proj():
        c = emb.withColumn("nrm_c", norm_expr("embedding", EMB_DIM)).alias("c")
        ct = cent.withColumn("nrm_q", norm_expr("cent_emb", EMB_DIM))
        cos = dot_expr("c.embedding", "cent_emb", EMB_DIM) / (
            F.col("nrm_c") * F.col("nrm_q")
        )
        return (
            c.crossJoin(F.broadcast(ct))
            .select(F.col("c.vec_id").alias("vec_id"), "cent_id", cos.alias("cos"))
        )

    def assign_hof():
        c = emb.withColumn("nrm_c", norm_hof("embedding")).alias("c")
        ct = cent.withColumn("nrm_q", norm_hof("cent_emb"))
        cos = dot_hof("embedding", "cent_emb") / (F.col("nrm_c") * F.col("nrm_q"))
        return (
            c.crossJoin(F.broadcast(ct))
            .select(F.col("c.vec_id").alias("vec_id"), "cent_id", cos.alias("cos"))
        )

    base = bits(assign_statusquo().collect(), ["vec_id", "cent_id", "cos"])
    for name, fn in [("proj", assign_proj), ("hof", assign_hof)]:
        got = bits(fn().collect(), ["vec_id", "cent_id", "cos"])
        print(f"assign/{name}: bitwise_equal={got == base}")
    for name, fn in [
        ("statusquo", assign_statusquo),
        ("proj", assign_proj),
        ("hof", assign_hof),
    ]:
        print(f"assign/{name}: best={timed(fn()):.3f}s  ({n}x{k} cosines)")

    # ---- shape 2: pair-verify join (candidate pairs -> cosine) -------
    # synthetic candidate pairs: every vec against the next SPAN ids —
    # ~n*SPAN pairs, the verify-join shape without the assign stage.
    SPAN = 200
    ids = emb.select(F.col("vec_id").alias("id_a"))
    pairs = (
        ids.withColumn("off", F.explode(F.sequence(F.lit(1), F.lit(SPAN))))
        .select("id_a", (F.col("id_a") + F.col("off")).alias("id_b"))
        .filter(F.col("id_b") < n)
        .repartition(32)
        .localCheckpoint(eager=True)
    )
    npairs = pairs.count()
    print(f"pairs={npairs}")

    def verify_chain():
        a = emb.withColumn("nrm", norm_expr("embedding", EMB_DIM)).alias("a")
        b = emb.withColumn("nrm", norm_expr("embedding", EMB_DIM)).alias("b")
        cos = dot_expr("a.embedding", "b.embedding", EMB_DIM) / (
            F.col("a.nrm") * F.col("b.nrm")
        )
        return (
            pairs.join(a, F.col("id_a") == F.col("a.vec_id"))
            .join(b, F.col("id_b") == F.col("b.vec_id"))
            .select("id_a", "id_b", cos.alias("cosine"))
        )

    def verify_hof():
        a = emb.withColumn("nrm", norm_hof("embedding")).alias("a")
        b = emb.withColumn("nrm", norm_hof("embedding")).alias("b")
        z = F.zip_with(
            F.col("a.embedding"),
            F.col("b.embedding"),
            lambda x, y: x.cast("double") * y.cast("double"),
        )
        cos = F.aggregate(
            F.slice(z, 2, EMB_DIM - 1), F.element_at(z, 1), lambda acc, v: acc + v
        ) / (F.col("a.nrm") * F.col("b.nrm"))
        return (
            pairs.join(a, F.col("id_a") == F.col("a.vec_id"))
            .join(b, F.col("id_b") == F.col("b.vec_id"))
            .select("id_a", "id_b", cos.alias("cosine"))
        )

    vb = bits(verify_chain().collect(), ["id_a", "id_b", "cosine"])
    vh = bits(verify_hof().collect(), ["id_a", "id_b", "cosine"])
    print(f"verify/hof: bitwise_equal={vh == vb}")
    for name, fn in [("chain", verify_chain), ("hof", verify_hof)]:
        print(f"verify/{name}: best={timed(fn()):.3f}s  ({npairs} cosines)")


if __name__ == "__main__":
    main()
