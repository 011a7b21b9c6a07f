"""Isolate where the 32-core engine time goes: kernel-only vs full job,
warm vs steady, optional extra JVM conf via OBLATE_EXP_CONF (k=v,k=v).

Usage: python tools/hi_core_experiment.py <cores> [kernel|full]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    import bench
    from oblate_spark.session import get_spark

    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    mode = sys.argv[2] if len(sys.argv) > 2 else "full"
    extra = {}
    for kv in os.environ.get("OBLATE_EXP_CONF", "").split(","):
        if "=" in kv:
            k, v = kv.split("=", 1)
            extra[k] = v
    spark = get_spark(cores=cores, app_name=f"exp_{cores}_{mode}", extra_conf=extra)
    path = bench.IMAGES_PATH

    def job():
        if mode == "kernel":
            from oblate_spark.operators.images import image_payload_report_from_files

            return image_payload_report_from_files(spark, path).count()
        return bench.validate_images_job(spark, path)

    t0 = time.time()
    job()
    warm = time.time() - t0
    times = []
    for _ in range(2):
        spark.catalog.clearCache()
        t0 = time.time()
        job()
        times.append(round(time.time() - t0, 3))
    print(
        json.dumps(
            {"cores": cores, "mode": mode, "warm": round(warm, 3), "runs": times, "conf": extra}
        )
    )


if __name__ == "__main__":
    main()
