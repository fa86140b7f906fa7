"""Scale-up generator: replicate a testdata sf directory N× with key remaps.

Usage: python tools/gen_sf.py [src_dir] [dst_dir] [factor] [tables] [vary]
Defaults: /root/testdata/sf0.1 /tmp/sf1 10 (all tables)
``tables`` is an optional comma-separated subset (e.g. ``documents``)
for scale points that only exercise part of the schema. ``vary`` (any
non-empty 5th arg) appends a per-copy marker to documents.text so
copies are NEAR-duplicates instead of exact ones — the HARD input for
the dedup paths: exact pre-collapse can absorb nothing and LSH sees
factor-sized near-dup groups (the sketching caps do the bounding).

Each copy i shifts every entity key by i·STRIDE (consistently across
fact/dim tables, so joins stay referentially intact: copy i's lineitem
rows join copy i's orders/part/supplier rows). region/nation stay fixed
(TPC-H semantics). Timestamps keep their range — scale-up means more
events per hour, not a longer history. Document texts are unchanged, so
dedup operators see factor× duplicate multiplicity — deliberately a
*harder* input for the sketching paths than organic scale.
"""

from __future__ import annotations

import os
import sys

STRIDE = 10_000_000

# table -> columns that carry entity keys to shift per copy
KEY_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
FIXED = ["region", "nation"]


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    only = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None
    # explicit parse: bool('0') is True, so the old bool(argv[5]) made
    # '0'/'false'/'no' silently ENABLE variation
    if len(sys.argv) > 5:
        arg = sys.argv[5].lower()
        if arg in ("1", "true", "vary", "yes"):
            vary = True
        elif arg in ("0", "false", "no", ""):
            vary = False
        else:
            raise SystemExit(f"gen_sf: unrecognized vary flag {sys.argv[5]!r}")
    else:
        vary = False

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pyspark.sql import functions as F

    from diagnosisextraction_ml_spark import get_spark
    from diagnosisextraction_ml_spark.sources.readers import load_table

    spark = get_spark("gen-sf")
    os.makedirs(dst, exist_ok=True)
    for t in FIXED:
        if only is not None and t not in only:
            continue
        spark.read.parquet(f"{src}/{t}.parquet").write.mode("overwrite").parquet(
            f"{dst}/{t}.parquet"
        )
        print(f"{t}: copied")
    int_max = {"integer": 2**31 - 1, "long": 2**63 - 1, "short": 2**15 - 1}
    for t, keys in KEY_COLS.items():
        if only is not None and t not in only:
            continue
        # load_table normalizes events' TIMESTAMP(NANOS) to micros —
        # the generated copy is then plainly readable
        base = load_table(spark, src, t)
        # Guard the shifted keys against silent non-ANSI cast wraparound:
        # an int32 key column overflows past factor ~214 and collides
        # across copies with no error. Fail loudly instead.
        maxes = base.agg(*[F.max(F.col(k)).alias(k) for k in keys]).collect()[0]
        for k in keys:
            dtype = base.schema[k].dataType.typeName()
            cap = int_max.get(dtype)
            if cap is not None and (factor - 1) * STRIDE + (maxes[k] or 0) > cap:
                raise SystemExit(
                    f"{t}.{k} ({dtype}): shifted key (factor-1)*STRIDE + max "
                    f"= {(factor - 1) * STRIDE + (maxes[k] or 0)} overflows {dtype} "
                    f"(max {cap}) — reduce factor or promote the key to bigint"
                )
            # Guard against CROSS-COPY collisions: if the SOURCE was
            # itself gen_sf output, its keys already span multiples of
            # STRIDE, and shifting by i*STRIDE again would land copies
            # on top of each other — keys stop being unique, joins
            # explode (measured: a sf1→sf10 regeneration inflated a
            # 9.2M-row orderkey join to 61M rows and the decade ratio
            # 5×). Always scale up from the ORIGINAL sf directory with
            # a bigger factor instead.
            if (maxes[k] or 0) >= STRIDE:
                raise SystemExit(
                    f"{t}.{k}: source max {maxes[k]} >= STRIDE {STRIDE} — "
                    f"the source looks like gen_sf output; re-run from the "
                    f"original testdata dir with factor={factor}x its "
                    f"multiplier so shifted key ranges stay disjoint"
                )
        copies = []
        for i in range(factor):
            c = base
            for k in keys:
                c = c.withColumn(k, (F.col(k) + F.lit(i * STRIDE)).cast(base.schema[k].dataType))
            if vary and t == "documents" and i > 0:
                c = c.withColumn("text", F.concat(F.col("text"), F.lit(f" variantcopy{i}")))
            copies.append(c)
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        n_part = max(4, out.rdd.getNumPartitions() // 2)
        out.repartition(n_part).write.mode("overwrite").parquet(f"{dst}/{t}.parquet")
        print(f"{t}: x{factor}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
