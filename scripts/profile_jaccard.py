"""Stage-level profile of the dedup_jaccard gate row at sf0.1 (r10
directive 1): where do the ~31 Spark-side seconds go — docs
materialization, candidate generation, or exact verify?"""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from rayforce_spark.session import get_spark
from rayforce_spark.datapipe.dedup import with_shingle_hashes

SF = "/root/testdata/sf0.1"

spark = get_spark("profile_jaccard")
d = spark.read.parquet(f"{SF}/documents.parquet")

threshold = 0.8
num = int(threshold * 1_000_000)
den = 1_000_000

t0 = time.time()
toks = with_shingle_hashes(
    d.select(F.col("doc_id").alias("__id"), F.col("text").alias("__t")),
    "__t", 1, "__sh",
).select("__id", F.explode("__sh").alias("tok"))
dfreq = toks.groupBy("tok").agg(F.count("*").alias("__df"))
docs = (
    toks.join(dfreq, "tok")
    .groupBy("__id")
    .agg(F.array_sort(F.collect_list(F.struct("__df", "tok"))).alias("__st"))
    .select(
        "__id",
        F.transform("__st", lambda s: s["tok"]).alias("__toks"),
        F.size("__st").cast("long").alias("sz"),
    )
)
docs = docs.localCheckpoint(eager=True)
t1 = time.time()
print(f"stage1 docs materialize: {t1-t0:.1f}s  rows={docs.count()}")

plen = (F.col("sz")
        - F.floor((F.lit(num) * F.col("sz") + F.lit(den - 1))
                  / F.lit(den)).cast("long") + 1).cast("int")
pref = (
    docs.select("__id", "sz", F.posexplode(
        F.slice("__toks", 1, plen)).alias("__p0", "tok"))
    .select("__id", "sz", (F.col("__p0") + 1).alias("pos"), "tok")
)
size_ok = (F.least("a.sz", "b.sz") * den
           >= F.greatest("a.sz", "b.sz") * num)
pos_ok = (
    (F.lit(1) + F.least(F.col("a.sz") - F.col("a.pos"),
                        F.col("b.sz") - F.col("b.pos")))
    * F.lit(num + den)
    >= (F.col("a.sz") + F.col("b.sz")) * F.lit(num)
)
cand = (
    pref.alias("a")
    .join(
        pref.alias("b"),
        (F.col("a.tok") == F.col("b.tok"))
        & (F.col("a.__id") < F.col("b.__id"))
        & size_ok & pos_ok,
    )
    .select(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
    .distinct()
)
cand = cand.localCheckpoint(eager=True)
t2 = time.time()
print(f"stage2 candidates: {t2-t1:.1f}s  rows={cand.count()}")

out = (
    cand
    .join(docs.select(F.col("__id").alias("id_a"),
                      F.col("__toks").alias("__ta"),
                      F.col("sz").alias("sz_a")), "id_a")
    .join(docs.select(F.col("__id").alias("id_b"),
                      F.col("__toks").alias("__tb"),
                      F.col("sz").alias("sz_b")), "id_b")
    .withColumn("inter", F.size(F.array_intersect("__ta", "__tb")))
    .withColumn(
        "jaccard",
        F.try_divide(F.col("inter"),
                     F.col("sz_a") + F.col("sz_b") - F.col("inter")),
    )
    .filter(F.col("jaccard") >= threshold)
    .select("id_a", "id_b", "jaccard")
)
n = out.count()
t3 = time.time()
print(f"stage3 verify: {t3-t2:.1f}s  rows={n}")
print(f"total {t3-t0:.1f}s")
