"""Time one registered query with the bench's methodology (warm at
sf0.001, then N noop-sink passes at the target SF; prints each pass and
the min).  Usage: python tools/ab_one.py <query_name> [passes]"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from pypgcdc_spark.session import get_spark


def main():
    name = sys.argv[1]
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab-one", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    qs = entrymod.extended_queries()
    fn = qs[name]
    # Warm pass at the small SF (JIT/codegen/python pools), as bench.py does.
    try:
        fn(spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()
    except Exception as e:
        print(f"warm failed: {e}", file=sys.stderr)
    spark.catalog.clearCache()
    spark._jvm.System.gc()  # noqa: SLF001
    walls = []
    for i in range(passes):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        w = time.perf_counter() - t0
        walls.append(w)
        print(f"pass{i} {w:.3f}s", flush=True)
        spark._jvm.System.gc()  # noqa: SLF001
    print(f"RESULT {name} min={min(walls):.3f} all={[round(w,3) for w in walls]}")


if __name__ == "__main__":
    main()
