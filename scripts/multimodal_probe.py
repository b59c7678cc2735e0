"""Time extract_features (the multimodal_features building block) in
isolation: fake tier over the full documents text bytes + the two stdlib
tiers over synthesized BMP/WAV, noop sink. Usage:
    python scripts/multimodal_probe.py [sf_dir] [reps]
Defaults to /tmp/sf1 (10x documents) where the Python-boundary cost is
measurable; the gate row itself is benched at sf0.1 elsewhere.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from pyspark.sql import functions as F

    from rayforce_spark.session import get_spark, load_tables

    spark = get_spark("multimodal_probe")
    tables = load_tables(spark, sf_dir)
    from rayforce_spark.datapipe.multimodal import (
        attach_binary, extract_features, synthesize_media)

    d = tables["documents"]
    ids = d.select("doc_id")
    legs = {
        "fake_dim8": lambda: extract_features(
            attach_binary(d, "text", kind="image", id_col="doc_id"),
            dim=8),
        "stdlib_bmp": lambda: extract_features(
            synthesize_media(ids, "doc_id", kind="image"),
            id_col="doc_id", dim=3, decoder="stdlib"),
        "stdlib_wav": lambda: extract_features(
            synthesize_media(ids, "doc_id", kind="audio"),
            id_col="doc_id", dim=3, decoder="stdlib"),
    }
    for name, build in legs.items():
        secs = []
        for i in range(reps):
            spark.sparkContext.setJobDescription(f"{name} rep {i}")
            t0 = time.time()
            build().write.format("noop").mode("overwrite").save()
            secs.append(round(time.time() - t0, 3))
        print(f"{name}: {secs}")
    # checksum of the fake-tier features for before/after bit-identity
    chk = (extract_features(
        attach_binary(d, "text", kind="image", id_col="doc_id"), dim=8)
        .select(F.xxhash64(
            F.col("media_id"), F.col("n_bytes"),
            F.concat_ws(",", F.transform(
                "features", lambda x: F.format_string("%.17g", x))))
            .alias("rh"))
        .select(F.expr("bit_xor(rh)").alias("h"))
        .collect()[0]["h"])
    print(f"fake_dim8 feature checksum: {chk}")


if __name__ == "__main__":
    main()
