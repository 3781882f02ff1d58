"""Per-kernel timing of the multi-constraint pipeline at sf1.

Profiles each MULTI_CONSTRAINTS entry alone through
run_correction_pipeline (kernel + expansion + still-applied), then the
full 8-at-once plan, to locate the sf1 hotspot.  Writes one JSON line
per measurement to stdout.

Usage: python tools/profile_multi_sf1.py [only1 only2 ...]
  with no args: every constraint + the full set.
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from corhist_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/repo/.sf1"


def main():
    only = set(sys.argv[1:])
    spark = get_spark()
    import __spark_entry__ as E

    # warm the memoized state build once so timings are kernel-only
    t0 = time.time()
    E._hist(spark, SF_DIR)
    print(json.dumps({"step": "_hist_warm", "sec": round(time.time() - t0, 1)}), flush=True)

    for c in E.MULTI_CONSTRAINTS:
        cid = c["constraint_id"]
        if only and cid not in only and "all" not in only:
            continue
        t0 = time.time()
        n = E._kernel_query(spark, SF_DIR, [c]).count()
        print(json.dumps({"step": cid, "rows": n, "sec": round(time.time() - t0, 1)}), flush=True)

    if not only or "full" in only:
        t0 = time.time()
        n = E.q_multi_constraint_corrections(spark, SF_DIR).count()
        print(json.dumps({"step": "full_8", "rows": n, "sec": round(time.time() - t0, 1)}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
