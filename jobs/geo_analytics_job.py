"""spark-submit entry point: the geospatial analytics tier end to end
(north_rule packaging — ships as --py-files modules).

Run (local sandbox; on a cluster swap the master and add executor confs):

    cd /root/repo && python tools/package_pyfiles.py && \\
    spark-submit --master 'local[8]' \\
        --py-files dist/mbrngq_spark.zip \\
        jobs/geo_analytics_job.py \\
        --sf-dir /root/testdata/sf0.01 --out /tmp/geo_out

One pass over the derived corpus produces the session's analytics
artifacts: the Gi* hotspot raster, Moran's I, density contours with
assembled curve ids, the convex hull + diameter + skyline, and a
count-balanced Morton layout of the corpus — each written as parquet
under --out.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--res", type=int, default=4)
    ap.add_argument("--kde-h", type=float, default=10.0)
    ap.add_argument("--contour-t", type=int, default=5_000_000_000)
    ap.add_argument("--n-parts", type=int, default=8)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from mbrngq_spark import harness as H
    from mbrngq_spark.index import write_balanced
    from mbrngq_spark.operators.hull import convex_hull, hull_diameter, \
        skyline
    from mbrngq_spark.operators.tiles import (contour_components,
                                              hotspot_gi, moran_i)

    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    dg = H.load_docs_geo(spark, args.sf_dir)

    hotspot_gi(dg, args.res).write.mode("overwrite") \
        .parquet(f"{args.out}/hotspot")
    moran = moran_i(dg, args.res).collect()[0]
    contour_components(dg, args.kde_h, args.res, args.contour_t) \
        .write.mode("overwrite").parquet(f"{args.out}/contours")
    convex_hull(dg).write.mode("overwrite").parquet(f"{args.out}/hull")
    diam = hull_diameter(dg).collect()[0]
    skyline(dg).write.mode("overwrite").parquet(f"{args.out}/skyline")
    plan = write_balanced(dg, f"{args.out}/balanced", args.res,
                          args.n_parts)
    n_cells = plan.count()

    print(json.dumps({
        "moran_i": float(moran.moran),
        "diameter": float(diam.dist),
        "diameter_pair": [int(diam.a_id), int(diam.b_id)],
        "n_plan_cells": int(n_cells),
        "n_parts": int(args.n_parts),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
